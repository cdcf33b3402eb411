"""JSON-Schema entity model -> (Spark StructType, SQL expectations).

Behavioural parity target: /root/reference/waterbear/convertor.py (whole
file). Same capability surface — ``allOf`` supertype flattening, cross-file
``$ref`` field inlining, nested objects, arrays of simple and object types,
atomic typing with format dispatch, column ``description`` carried into
``StructField.metadata['comment']`` with parent precedence — but a different
construction:

* the compile is **stateless per call** — constraints accumulate in a local
  ``_Compilation`` context, so compiling two entities with one compiler never
  merges their expectation dicts (the reference leaks instance state,
  convertor.py:11);
* referenced files are **memoised** per compiler instead of re-read from disk
  at every ``$ref`` occurrence (convertor.py:100-101,165-166 re-read);
* ``anyOf``/``oneOf`` remain deliberately unsupported (schema consistency
  cannot be guaranteed — same stance as convertor.py:60) and raise instead of
  being silently ignored.

Array elements never contribute value constraints (only the array's own
NULLABLE/SIZE are emitted), matching convertor.py:258-269; the quality
engine exposes a native opt-in for element domains.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass, field
from typing import Mapping

from pyspark.sql.types import ArrayType, DataType, StructField, StructType

from waterbear_spark.schema import constraints as C
from waterbear_spark.schema.types import UnsupportedTypeError, spark_type_for


class SchemaError(ValueError):
    """Invalid model directory, entity file, or schema construct."""


@dataclass(frozen=True)
class CompiledEntity:
    """Output of one entity compile: enforced read schema + expectations."""

    name: str
    schema: StructType
    constraints: dict[str, str]

    def as_tuple(self) -> tuple[StructType, dict[str, str]]:
        """Reference-shaped ``(StructType, constraints)`` pair
        (convertor.py:42-45)."""
        return self.schema, self.constraints


@dataclass
class _Compilation:
    """Per-compile accumulator; guarantees call-local constraint state."""

    constraints: dict[str, str] = field(default_factory=dict)

    def add(self, new: Mapping[str, str]) -> None:
        self.constraints.update(new)


class SchemaCompiler:
    """Compiles JSON-Schema entity files from a model directory.

    >>> compiled = SchemaCompiler("model_dir").compile("employee")
    >>> compiled.schema      # pyspark StructType
    >>> compiled.constraints # {"[`id`] NULLABLE": "`id` IS NOT NULL", ...}
    """

    def __init__(self, model_dir: str):
        if not os.path.isdir(model_dir):
            raise SchemaError(f"path {model_dir} is not a valid directory")
        self.model_dir = model_dir
        self._file_cache: dict[str, dict] = {}

    # -- public API --------------------------------------------------------

    def compile(self, entity_name: str) -> CompiledEntity:
        filename = (
            entity_name if entity_name.endswith(".json") else f"{entity_name}.json"
        )
        entity = self._load(filename)
        if entity.get("type") != "object":
            raise SchemaError("Can only process JSON entities of type object")
        ctx = _Compilation()
        fields = self._object_fields(entity, ctx, parent=None, with_constraints=True)
        return CompiledEntity(
            name=entity_name.removesuffix(".json"),
            schema=StructType(fields),
            constraints=ctx.constraints,
        )

    # -- model file access -------------------------------------------------

    def _load(self, filename: str) -> dict:
        """Load (and memoise) a JSON file from the model directory."""
        if filename not in self._file_cache:
            path = os.path.join(self.model_dir, filename)
            if not os.path.isfile(path):
                raise SchemaError(f"File {path} is not a valid file")
            with open(path) as handle:
                self._file_cache[filename] = json.load(handle)
        return self._file_cache[filename]

    # -- recursive descent -------------------------------------------------

    def _object_fields(
        self,
        entity: Mapping,
        ctx: _Compilation,
        parent: str | None,
        with_constraints: bool,
    ) -> list[StructField]:
        """Properties of one object level -> StructFields.

        ``allOf`` supertypes are flattened in place and, as in the reference
        (convertor.py:62-65), replace the level's own property list.
        """
        if "anyOf" in entity or "oneOf" in entity:
            raise SchemaError(
                "anyOf/oneOf are unsupported: schema consistency cannot be "
                "guaranteed with alternative attribute sets"
            )

        if "allOf" in entity:
            fields: list[StructField] = []
            for ref in entity["allOf"]:
                supertype = self._load(ref["$ref"].split("/")[-1])
                fields.extend(
                    self._object_fields(supertype, ctx, parent, with_constraints)
                )
            return fields

        required = set(entity.get("required") or ())
        return [
            self._field(
                name,
                props,
                ctx,
                parent=parent,
                nullable=name not in required,
                inherited_desc=None,
                with_constraints=with_constraints,
            )
            for name, props in entity.get("properties", {}).items()
        ]

    def _field(
        self,
        name: str,
        props: Mapping,
        ctx: _Compilation,
        parent: str | None,
        nullable: bool,
        inherited_desc: str | None,
        with_constraints: bool,
    ) -> StructField:
        """Dispatch one property to the reference / object / array / atomic
        handler (convertor.py:104-143)."""
        path = C.field_path(name, parent)
        # the parent's description is more specific than a referenced
        # definition's, so it takes precedence (util.py:225-236)
        desc = inherited_desc or props.get("description")

        if "$ref" in props:
            resolved = self._resolve_ref(props["$ref"])
            return self._field(
                name, resolved, ctx, parent, nullable, desc, with_constraints
            )

        json_type = props.get("type")
        if json_type == "object":
            return self._object_field(
                name, path, props, ctx, nullable, desc, with_constraints
            )
        if json_type == "array":
            return self._array_field(name, path, props, ctx, nullable, desc)
        return self._atomic_field(
            name, path, props, ctx, nullable, desc, with_constraints
        )

    def _resolve_ref(self, ref: str) -> Mapping:
        """``file.json#/prop`` -> the referenced property dict
        (convertor.py:145-172)."""
        filename = ref.split("#")[0].split("/")[-1]
        prop = ref.split("/")[-1]
        model = self._load(filename)
        if prop not in model:
            raise SchemaError(f"Referencing non existing property {prop}")
        return model[prop]

    def _object_field(
        self, name, path, props, ctx, nullable, desc, with_constraints
    ) -> StructField:
        if with_constraints:
            ctx.add(C.nullable_constraint(path, nullable))
        # nested objects do not inherit the parent description
        # (convertor.py:77-79): children start with inherited_desc=None
        inner = StructType(
            self._object_fields(props, ctx, parent=path, with_constraints=with_constraints)
        )
        return StructField(name, inner, nullable, metadata={"comment": desc})

    def _array_field(self, name, path, props, ctx, nullable, desc) -> StructField:
        ctx.add(C.nullable_constraint(path, nullable))
        ctx.add(C.array_constraints(path, props))
        element = self._array_element_type(props["items"], ctx)
        return StructField(name, ArrayType(element), nullable, metadata={"comment": desc})

    def _array_element_type(self, items: Mapping, ctx: _Compilation) -> DataType:
        """Element DataType; object elements recurse with constraints off
        (convertor.py:250-274)."""
        if items.get("type") == "object":
            required = set(items.get("required") or ())
            fields = [
                self._field(
                    fname,
                    fprops,
                    ctx,
                    parent=None,
                    nullable=fname not in required,
                    inherited_desc=None,
                    with_constraints=False,
                )
                for fname, fprops in items["properties"].items()
            ]
            return StructType(fields)
        try:
            return spark_type_for(items.get("type"), items.get("format"))
        except UnsupportedTypeError as err:
            raise SchemaError(str(err)) from err

    def _atomic_field(
        self, name, path, props, ctx, nullable, desc, with_constraints
    ) -> StructField:
        json_type = props.get("type")
        json_format = props.get("format")
        try:
            data_type = spark_type_for(json_type, json_format)
        except UnsupportedTypeError:
            raise SchemaError(
                f"Unsupported type {json_type} for field {path}"
            ) from None

        if with_constraints:
            ctx.add(C.nullable_constraint(path, nullable))
            if json_type in ("number", "integer"):
                ctx.add(C.number_constraints(path, props))
            elif json_type == "string":
                if json_format in ("date", "date-time"):
                    ctx.add(C.date_constraints(path, props))
                else:
                    ctx.add(C.string_constraints(path, props))
            # booleans carry no value constraints (util.py:186-196)

        return StructField(name, data_type, nullable, metadata={"comment": desc})
