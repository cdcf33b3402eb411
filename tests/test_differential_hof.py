"""Differential fuzzing of the array higher-order-function surface:
hypothesis-generated lambda pipelines run over the tokenized documents
on both engines. Unlike test_differential.py (one ANSI text), HOF names
differ by dialect (``transform`` vs ``list_transform``), so each case is
a SPEC rendered into two dialect texts whose semantics must coincide —
the same spec-twin discipline the oracle catalog uses, now fuzzed.

All generated expressions are integer-valued or lexicographic (no float
folds), so agreement is exact."""

import duckdb
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from tests.conftest import SF_SMOKE
from waterbear_spark.testing import compare_frames
pytestmark = pytest.mark.smoke  # <10-min certification subset


@pytest.fixture(scope="module")
def engines(spark):
    spark.read.parquet(f"{SF_SMOKE}/documents.parquet").createOrReplaceTempView(
        "docs_hof"
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW docs_hof AS SELECT * FROM '{SF_SMOKE}/documents.parquet'"
    )
    yield spark, con
    con.close()
    spark.catalog.dropTempView("docs_hof")


# tokens array, identical semantics: split on single spaces, drop empties
_ARR_SPARK = "filter(split(lower(text), ' '), x -> x <> '')"
_ARR_DUCK = "list_filter(string_split(lower(text), ' '), x -> x <> '')"


def _render(spec, dialect: str) -> str:
    """Render a spec tuple into the dialect's HOF expression."""
    arr = _ARR_SPARK if dialect == "spark" else _ARR_DUCK
    kind = spec[0]
    if kind == "count_len_ge":
        n = spec[1]
        if dialect == "spark":
            return f"size(filter({arr}, x -> length(x) >= {n}))"
        return f"len(list_filter({arr}, x -> length(x) >= {n}))"
    if kind == "count_prefix":
        ch = spec[1]
        if dialect == "spark":
            return f"size(filter({arr}, x -> x LIKE '{ch}%'))"
        return f"len(list_filter({arr}, x -> x LIKE '{ch}%'))"
    if kind == "sum_lengths_capped":
        cap = spec[1]
        if dialect == "spark":
            return (
                f"aggregate(transform({arr}, x -> least(length(x), {cap})),"
                f" 0, (a, x) -> a + x)"
            )
        return (
            f"list_aggregate(list_transform({arr},"
            f" x -> least(length(x), {cap})), 'sum')"
        )
    if kind == "nth_sorted":
        n = spec[1]
        if dialect == "spark":
            return f"try_element_at(array_sort({arr}), {n})"
        return f"list_sort({arr})[{n}]"
    if kind == "distinct_count":
        if dialect == "spark":
            return f"size(array_distinct({arr}))"
        return f"len(list_distinct({arr}))"
    if kind == "max_token":
        if dialect == "spark":
            return f"array_max({arr})"
        return f"list_max({arr})"
    raise AssertionError(kind)


_specs = st.one_of(
    st.tuples(st.just("count_len_ge"), st.integers(min_value=1, max_value=12)),
    st.tuples(
        st.just("count_prefix"),
        st.sampled_from(list("abcdefghijklmnopqrstuvwxyz")),
    ),
    st.tuples(
        st.just("sum_lengths_capped"), st.integers(min_value=1, max_value=20)
    ),
    st.tuples(st.just("nth_sorted"), st.integers(min_value=1, max_value=5)),
    st.tuples(st.just("distinct_count")),
    st.tuples(st.just("max_token")),
)


@settings(
    max_examples=30,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(spec=_specs)
def test_spark_and_duckdb_agree_on_array_hofs(engines, spec):
    spark, con = engines
    q_spark = (
        f"SELECT doc_id, {_render(spec, 'spark')} AS v"
        " FROM docs_hof ORDER BY doc_id"
    )
    q_duck = (
        f"SELECT doc_id, {_render(spec, 'duck')} AS v"
        " FROM docs_hof ORDER BY doc_id"
    )
    sdf = spark.sql(q_spark)
    s_rows = [tuple(r) for r in sdf.collect()]
    res = con.execute(q_duck)
    d_cols = [d[0] for d in res.description]
    assert (
        compare_frames(sdf.columns, s_rows, d_cols, res.fetchall()) == []
    ), f"divergence on spec: {spec}"
