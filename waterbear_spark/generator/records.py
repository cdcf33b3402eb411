"""Synthetic record generation for an entity model.

Parity target: the reference's driver-side generator
(/root/reference/waterbear/generator.py:6-103, utils/util.py:17-83): N
random JSON strings conforming to an entity, with optional fields dropped
at ``nullable_rate``, ``pattern`` not supported, and per-type samplers
(uniform ints/doubles, date/timestamp ranges, uuid, ISO-8601-ish duration,
lowercase ascii strings, enum picks).

Two modes:

* :meth:`RecordGenerator.generate` — driver-side ``list[str]`` of JSON,
  API-compatible with the reference (fine for unit fixtures, O(n) driver
  memory).
* :meth:`RecordGenerator.frame` — the 100 TB redesign: ``spark.range(n)``
  plus seedable native column expressions (``rand(seed)``, ``uuid()``,
  ``make_date`` arithmetic, ``element_at`` enum picks), so generation is
  distributed, linearly scalable, and never materialises on the driver.
  A billion-row corpus is a 1-stage codegen job with no shuffle.
"""

from __future__ import annotations

import datetime
import json
import random
import string as _string
import uuid as _uuid
from typing import Mapping

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from waterbear_spark.schema.compiler import SchemaCompiler

_EPOCH_DATE = "1970-01-01"
_DEFAULT_MAX_DATE = "2025-01-01"


class RecordGenerator:
    """Generates synthetic records conforming to a JSON-Schema entity."""

    def __init__(self, model_dir: str, nullable_rate: float = 0.0, seed: int = 42):
        self.compiler = SchemaCompiler(model_dir)
        self.nullable_rate = float(nullable_rate)
        self.seed = seed

    # ------------------------------------------------------------------
    # driver-side JSON-string mode (reference API parity)
    # ------------------------------------------------------------------

    def generate(self, entity_name: str, n: int) -> list[str]:
        """N random JSON strings for the entity (generator.py:13-15)."""
        rng = random.Random(self.seed)
        entity = self._entity(entity_name)
        return [json.dumps(self._gen_object(entity, rng)) for _ in range(n)]

    def _entity(self, entity_name: str) -> Mapping:
        filename = (
            entity_name if entity_name.endswith(".json") else f"{entity_name}.json"
        )
        return self.compiler._load(filename)

    def _resolved(self, props: Mapping) -> Mapping:
        if "$ref" in props:
            return self.compiler._resolve_ref(props["$ref"])
        return props

    def _gen_object(self, entity: Mapping, rng: random.Random) -> dict:
        if "allOf" in entity:
            record: dict = {}
            for ref in entity["allOf"]:
                supertype = self.compiler._load(ref["$ref"].split("/")[-1])
                record.update(self._gen_object(supertype, rng))
            return record
        required = set(entity.get("required") or ())
        record = {}
        for name, props in entity.get("properties", {}).items():
            if name not in required and rng.random() < self.nullable_rate:
                continue  # optional field dropped (generator.py:47-48)
            record[name] = self._gen_value(self._resolved(props), rng)
        return record

    def _gen_value(self, props: Mapping, rng: random.Random):
        json_type = props.get("type")
        if json_type == "object":
            return self._gen_object(props, rng)
        if json_type == "array":
            lo = int(props.get("minItems") or 1)
            hi = int(props.get("maxItems") or max(lo, 3))
            items = self._resolved(props["items"])
            return [self._gen_value(items, rng) for _ in range(rng.randint(lo, hi))]
        if json_type == "boolean":
            return rng.random() < 0.5
        if json_type == "integer":
            return rng.randint(int(props.get("minimum", 0)), int(props.get("maximum", 9999)))
        if json_type == "number":
            return rng.uniform(float(props.get("minimum", 0.0)), float(props.get("maximum", 1.0)))
        if json_type == "string":
            return self._gen_string(props, rng)
        raise ValueError(f"Unsupported type {json_type}")

    def _gen_string(self, props: Mapping, rng: random.Random):
        fmt = props.get("format")
        if fmt == "date":
            lo, hi = self._date_bounds(props)
            day = rng.randrange(max((hi - lo).days, 1))
            return (lo + datetime.timedelta(days=day)).strftime("%Y-%m-%d")
        if fmt == "date-time":
            lo, hi = self._date_bounds(props)
            sec = rng.randrange(max(int((hi - lo).total_seconds()), 1))
            return (lo + datetime.timedelta(seconds=sec)).strftime("%Y-%m-%dT%H:%M:%S")
        if fmt == "uuid":
            return str(_uuid.UUID(int=rng.getrandbits(128), version=4))
        if fmt == "duration":
            designators = "YMWD" if rng.random() < 0.5 else "HMS"
            prefix = "P" if designators == "YMWD" else "T"
            return f"{prefix}{rng.randint(1, 10)}{rng.choice(designators)}"
        if props.get("enum"):
            return rng.choice(props["enum"])
        lo = max(int(props.get("minLength") or 1), 1)
        hi = max(int(props.get("maxLength") or 25), lo)
        return "".join(
            rng.choice(_string.ascii_lowercase) for _ in range(rng.randint(lo, hi))
        )

    @staticmethod
    def _date_bounds(props: Mapping) -> tuple[datetime.datetime, datetime.datetime]:
        def parse(value: str | None, default: str) -> datetime.datetime:
            raw = value or default
            return datetime.datetime.strptime(raw[:10], "%Y-%m-%d")

        return parse(props.get("min"), _EPOCH_DATE), parse(props.get("max"), _DEFAULT_MAX_DATE)

    # ------------------------------------------------------------------
    # distributed mode: spark.range(n) + native column expressions
    # ------------------------------------------------------------------

    def frame(
        self, spark: SparkSession, entity_name: str, n: int, partitions: int | None = None
    ) -> DataFrame:
        """Distributed typed DataFrame of N synthetic rows.

        Fully native: one ``Range`` scan, per-field ``rand(seed_i)``
        expression trees, zero Python execution on the hot path.
        """
        entity = self._entity(entity_name)
        rng = spark.range(0, n, 1, partitions) if partitions else spark.range(n)
        counter = [self.seed]
        cols = self._frame_object(entity, counter, top_level=True)
        return rng.select(*cols)

    def _next_seed(self, counter: list[int]) -> int:
        counter[0] += 1
        return counter[0]

    def _frame_object(self, entity: Mapping, counter: list[int], top_level=False):
        if "allOf" in entity:
            cols = []
            for ref in entity["allOf"]:
                supertype = self.compiler._load(ref["$ref"].split("/")[-1])
                cols.extend(self._frame_object(supertype, counter, top_level))
            return cols
        required = set(entity.get("required") or ())
        cols = []
        for name, props in entity.get("properties", {}).items():
            col = self._frame_value(self._resolved(props), counter)
            if name not in required and self.nullable_rate > 0:
                col = F.when(
                    F.rand(self._next_seed(counter)) < self.nullable_rate,
                    F.lit(None),
                ).otherwise(col)
            cols.append(col.alias(name))
        return cols

    def _frame_value(self, props: Mapping, counter: list[int]) -> Column:
        json_type = props.get("type")
        seed = self._next_seed(counter)
        if json_type == "object":
            return F.struct(*self._frame_object(props, counter))
        if json_type == "array":
            lo = int(props.get("minItems") or 1)
            hi = int(props.get("maxItems") or max(lo, 3))
            items = self._resolved(props["items"])
            elements = [self._frame_value(items, counter) for _ in range(hi)]
            length = (F.floor(F.rand(seed) * (hi - lo + 1)) + lo).cast("int")
            return F.slice(F.array(*elements), 1, length)
        if json_type == "boolean":
            return F.rand(seed) < 0.5
        if json_type == "integer":
            lo = float(props.get("minimum", 0))
            hi = float(props.get("maximum", 9999))
            return (F.floor(F.rand(seed) * (hi - lo + 1)) + lo).cast("int")
        if json_type == "number":
            lo = float(props.get("minimum", 0.0))
            hi = float(props.get("maximum", 1.0))
            return F.rand(seed) * (hi - lo) + lo
        if json_type == "string":
            return self._frame_string(props, counter, seed)
        raise ValueError(f"Unsupported type {json_type}")

    def _frame_string(self, props: Mapping, counter: list[int], seed: int) -> Column:
        fmt = props.get("format")
        if fmt == "date":
            lo, hi = self._date_bounds(props)
            days = max((hi - lo).days, 1)
            return F.date_add(
                F.to_date(F.lit(lo.strftime("%Y-%m-%d"))),
                (F.floor(F.rand(seed) * days)).cast("int"),
            )
        if fmt == "date-time":
            lo, hi = self._date_bounds(props)
            secs = max(int((hi - lo).total_seconds()), 1)
            return F.timestamp_seconds(
                F.lit(int(lo.timestamp())) + F.floor(F.rand(seed) * secs).cast("long")
            )
        if fmt == "uuid":
            # F.uuid() draws a fresh plan-time seed, breaking run-to-run
            # determinism; shape a seeded md5 into a v4-style uuid instead
            hex32 = F.md5(F.rand(seed).cast("string"))
            return F.concat_ws(
                "-",
                F.substring(hex32, 1, 8),
                F.substring(hex32, 9, 4),
                F.concat(F.lit("4"), F.substring(hex32, 14, 3)),
                F.substring(hex32, 17, 4),
                F.substring(hex32, 21, 12),
            )
        if fmt == "duration":
            date_pick = F.concat(
                F.lit("P"),
                F.floor(F.rand(seed) * 10 + 1).cast("int").cast("string"),
                F.element_at(
                    F.array(*[F.lit(c) for c in "YMWD"]),
                    (F.floor(F.rand(seed + 1) * 4) + 1).cast("int"),
                ),
            )
            time_pick = F.concat(
                F.lit("T"),
                F.floor(F.rand(seed) * 10 + 1).cast("int").cast("string"),
                F.element_at(
                    F.array(*[F.lit(c) for c in "HMS"]),
                    (F.floor(F.rand(seed + 2) * 3) + 1).cast("int"),
                ),
            )
            return F.when(F.rand(seed + 3) < 0.5, date_pick).otherwise(time_pick)
        enum = props.get("enum")
        if enum:
            return F.element_at(
                F.array(*[F.lit(v) for v in enum]),
                (F.floor(F.rand(seed) * len(enum)) + 1).cast("int"),
            )
        lo = max(int(props.get("minLength") or 1), 1)
        hi = max(int(props.get("maxLength") or 25), lo)
        # deterministic pseudo-random lowercase text: repeated md5 hex of a
        # seeded random, trimmed to a random in-bounds length (hex chars are
        # a-f0-9; no Python execution, stays in codegen)
        pool = F.repeat(F.md5(F.rand(seed).cast("string")), (hi // 32) + 1)
        length = (F.floor(F.rand(seed + 1) * (hi - lo + 1)) + lo).cast("int")
        return F.substring(pool, 1, 64).substr(F.lit(1), length)
