"""Property-based tests (hypothesis) for the schema compiler — coverage
the reference never had (SURVEY.md §5: "No property-based tests").

Strategy: generate arbitrary flat entity models across the supported
type lattice and assert structural invariants of the compile:
  * every field appears exactly once, in declaration order;
  * nullability == absence from `required`;
  * every emitted value-level constraint is null-tolerant;
  * constraint paths are backtick-qualified and reference a real field;
  * generated records (driver mode) satisfy every bound the compiler
    derives from the same properties.
"""

import json

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from waterbear_spark.schema.compiler import SchemaCompiler

_NAMES = st.from_regex(r"[a-z][a-z0-9_]{0,10}", fullmatch=True)

def _numeric(json_type: str, lo, delta):
    """Optional bounds; when both present, maximum = minimum + delta."""
    props = {"type": json_type}
    if lo is not None:
        props["minimum"] = lo
        if delta is not None:
            props["maximum"] = lo + delta
    elif delta is not None:
        props["maximum"] = delta
    return props


_ATOMIC = st.one_of(
    st.builds(
        _numeric,
        st.just("integer"),
        st.one_of(st.none(), st.integers(-1000, 1000)),
        st.one_of(st.none(), st.integers(1, 1000)),
    ),
    st.builds(
        _numeric,
        st.just("number"),
        st.one_of(st.none(), st.integers(-100, 100)),
        st.one_of(st.none(), st.integers(1, 100)),
    ),
    st.just({"type": "boolean"}),
    st.builds(
        lambda minlen, extra, enum: {
            "type": "string",
            **({"minLength": minlen} if minlen else {}),
            **({"maxLength": minlen + extra} if minlen and extra else {}),
            **({"enum": enum} if enum else {}),
        },
        st.one_of(st.none(), st.integers(1, 10)),
        st.one_of(st.none(), st.integers(0, 10)),
        st.one_of(st.none(), st.lists(st.sampled_from(["A", "B", "C"]), min_size=1, unique=True)),
    ),
    st.just({"type": "string", "format": "date", "min": "2000-01-01"}),
    st.just({"type": "string", "format": "uuid"}),
)


@st.composite
def entities(draw):
    fields = draw(
        st.dictionaries(_NAMES, _ATOMIC, min_size=1, max_size=6)
    )
    required = draw(st.sets(st.sampled_from(sorted(fields)), max_size=len(fields)))
    return {
        "type": "object",
        "properties": fields,
        "required": sorted(required),
    }


@settings(max_examples=60, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(entities())
def test_compile_invariants(tmp_path_factory, entity):
    model_dir = tmp_path_factory.mktemp("model")
    (model_dir / "thing.json").write_text(json.dumps(entity))
    compiled = SchemaCompiler(str(model_dir)).compile("thing")

    declared = list(entity["properties"])
    assert [f.name for f in compiled.schema.fields] == declared

    required = set(entity["required"])
    for field in compiled.schema.fields:
        assert field.nullable == (field.name not in required)

    field_paths = {f"`{name}`" for name in declared}
    for cname, expr in compiled.constraints.items():
        path = cname[1 : cname.rindex("]")]
        assert path in field_paths, f"constraint {cname} references unknown field"
        kind = cname.rsplit(" ", 1)[1]
        assert kind in {"NULLABLE", "VALUE", "LENGTH", "MATCH", "SIZE"}
        if kind != "NULLABLE":
            assert expr.startswith(f"{path} IS NULL OR "), (
                f"value constraint not null-tolerant: {expr}"
            )
        else:
            assert expr == f"{path} IS NOT NULL"


@settings(max_examples=25, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(entities(), st.integers(0, 2**31 - 1))
def test_generated_records_respect_bounds(tmp_path_factory, entity, seed):
    from waterbear_spark.generator.records import RecordGenerator

    model_dir = tmp_path_factory.mktemp("model")
    (model_dir / "thing.json").write_text(json.dumps(entity))
    generator = RecordGenerator(str(model_dir), nullable_rate=0.0, seed=seed)
    records = [json.loads(r) for r in generator.generate("thing", 5)]

    for record in records:
        for name, props in entity["properties"].items():
            value = record[name]
            if props["type"] == "integer":
                if "minimum" in props:
                    assert value >= props["minimum"]
                if "maximum" in props:
                    assert value <= props["maximum"]
            elif props["type"] == "string" and props.get("enum"):
                assert value in props["enum"]
            elif props["type"] == "string" and props.get("format") == "date":
                assert value >= props["min"]
