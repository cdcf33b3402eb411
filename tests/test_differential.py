"""Differential fuzzing: hypothesis-generated filter/aggregate SQL runs
verbatim on both Spark and DuckDB over the same parquet ``orders`` table;
results must hash-match. This closes the gap the hand-written oracle
catalog can't: arbitrary predicate combinations, including the ANSI-mode
edge cases (modulo, NOT, nested boolean structure) nobody thought to
write down.

Determinism: aggregates follow the catalog's decimal-sum rule (exact
DECIMAL(20,6) accumulation, one final ROUND + CAST to DOUBLE), and the
whole query text is engine-portable ANSI, so any mismatch is a real
semantics divergence, not float noise.
"""

import duckdb
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from tests.conftest import SF_SMOKE
from waterbear_spark.testing import compare_frames
pytestmark = pytest.mark.smoke  # <10-min certification subset

_STATUSES = ["O", "F", "P"]
_PRIORITIES = [
    "1-URGENT",
    "2-HIGH",
    "3-MEDIUM",
    "4-NOT SPECIFIED",
    "5-LOW",
]


@pytest.fixture(scope="module")
def engines(spark):
    spark.read.parquet(f"{SF_SMOKE}/orders.parquet").createOrReplaceTempView(
        "orders_diff"
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW orders_diff AS SELECT * FROM '{SF_SMOKE}/orders.parquet'"
    )
    yield spark, con
    con.close()
    spark.catalog.dropTempView("orders_diff")


_comparisons = st.one_of(
    st.tuples(
        st.just("o_totalprice"),
        st.sampled_from([">", "<", ">=", "<="]),
        st.integers(min_value=1_000, max_value=400_000),
    ).map(lambda t: f"{t[0]} {t[1]} {t[2]}"),
    st.tuples(
        st.just("o_custkey"),
        st.integers(min_value=2, max_value=13),
        st.integers(min_value=0, max_value=12),
    ).map(lambda t: f"{t[0]} % {t[1]} = {t[2] % t[1]}"),
    st.lists(
        st.sampled_from(_STATUSES), min_size=1, max_size=3, unique=True
    ).map(lambda xs: "o_orderstatus IN (%s)" % ", ".join(f"'{x}'" for x in xs)),
    st.lists(
        st.sampled_from(_PRIORITIES), min_size=1, max_size=4, unique=True
    ).map(
        lambda xs: "o_orderpriority IN (%s)" % ", ".join(f"'{x}'" for x in xs)
    ),
    st.tuples(
        st.sampled_from([">=", "<"]),
        st.integers(min_value=1992, max_value=1998),
        st.integers(min_value=1, max_value=12),
    ).map(
        lambda t: f"o_orderdate {t[0]} TIMESTAMP '{t[1]}-{t[2]:02d}-01 00:00:00'"
    ),
)


@st.composite
def _predicates(draw) -> str:
    n = draw(st.integers(min_value=1, max_value=3))
    parts = [draw(_comparisons) for _ in range(n)]
    out = parts[0]
    for p in parts[1:]:
        op = draw(st.sampled_from(["AND", "OR", "AND NOT"]))
        out = f"({out}) {op} ({p})"
    return out


_QUERY = """
SELECT o_orderstatus,
       COUNT(*) AS n,
       CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(20,6))), 2) AS DOUBLE)
           AS total
FROM orders_diff
WHERE {where}
GROUP BY o_orderstatus
ORDER BY o_orderstatus
"""


@settings(
    max_examples=30,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(where=_predicates())
def test_spark_and_duckdb_agree_on_generated_predicates(engines, where):
    spark, con = engines
    sql = _QUERY.format(where=where)
    sdf = spark.sql(sql)
    s_rows = [tuple(r) for r in sdf.collect()]
    res = con.execute(sql)
    d_cols = [d[0] for d in res.description]
    assert (
        compare_frames(sdf.columns, s_rows, d_cols, res.fetchall()) == []
    ), f"divergence on: {where}"


@pytest.fixture(scope="module")
def join_engines(spark):
    for t in ("orders", "customer"):
        spark.read.parquet(f"{SF_SMOKE}/{t}.parquet").createOrReplaceTempView(
            f"{t}_jd"
        )
    con = duckdb.connect()
    for t in ("orders", "customer"):
        con.execute(f"CREATE VIEW {t}_jd AS SELECT * FROM '{SF_SMOKE}/{t}.parquet'")
    yield spark, con
    con.close()
    for t in ("orders", "customer"):
        spark.catalog.dropTempView(f"{t}_jd")


_JOIN_QUERY = """
SELECT c_mktsegment,
       COUNT(*) AS n,
       CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(20,6))), 2) AS DOUBLE)
           AS total
FROM orders_jd JOIN customer_jd ON o_custkey = c_custkey
WHERE {where}
GROUP BY c_mktsegment
ORDER BY c_mktsegment
"""

_SEGMENTS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]

_join_comparisons = st.one_of(
    _comparisons,
    st.lists(st.sampled_from(_SEGMENTS), min_size=1, max_size=3, unique=True).map(
        lambda xs: "c_mktsegment IN (%s)" % ", ".join(f"'{x}'" for x in xs)
    ),
    st.tuples(
        st.just("c_acctbal"),
        st.sampled_from([">", "<="]),
        st.integers(min_value=-900, max_value=9000),
    ).map(lambda t: f"{t[0]} {t[1]} {t[2]}"),
)


@st.composite
def _join_predicates(draw) -> str:
    n = draw(st.integers(min_value=1, max_value=3))
    parts = [draw(_join_comparisons) for _ in range(n)]
    out = parts[0]
    for p in parts[1:]:
        op = draw(st.sampled_from(["AND", "OR", "AND NOT"]))
        out = f"({out}) {op} ({p})"
    return out


@settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(where=_join_predicates())
def test_spark_and_duckdb_agree_on_join_predicates(join_engines, where):
    spark, con = join_engines
    sql = _JOIN_QUERY.format(where=where)
    sdf = spark.sql(sql)
    s_rows = [tuple(r) for r in sdf.collect()]
    res = con.execute(sql)
    d_cols = [d[0] for d in res.description]
    assert (
        compare_frames(sdf.columns, s_rows, d_cols, res.fetchall()) == []
    ), f"divergence on: {where}"


_WINDOW_FNS = ["ROW_NUMBER", "RANK", "DENSE_RANK"]
_PART_KEYS = ["o_orderstatus", "o_orderpriority"]
_ORDER_KEYS = ["o_totalprice", "o_orderdate", "o_custkey"]

_WINDOW_QUERY = """
SELECT {pk} AS pk, o_orderkey, rk
FROM (
    SELECT {pk}, o_orderkey,
           {fn}() OVER (
               PARTITION BY {pk} ORDER BY {ok} {dir}{tie}
           ) AS rk
    FROM orders_diff
    WHERE {where}
)
WHERE rk <= {top}
ORDER BY pk, rk, o_orderkey
"""

_RUNNING_QUERY = """
SELECT {pk} AS pk, o_orderkey,
       CAST(ROUND(run, 2) AS DOUBLE) AS running_total
FROM (
    SELECT {pk}, o_orderkey,
           SUM(CAST(o_totalprice AS DECIMAL(20,6))) OVER (
               PARTITION BY {pk} ORDER BY {ok} {dir}, o_orderkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS run,
           ROW_NUMBER() OVER (
               PARTITION BY {pk} ORDER BY {ok} {dir}, o_orderkey
           ) AS rn
    FROM orders_diff
    WHERE {where}
)
WHERE rn <= {top}
ORDER BY pk, o_orderkey
"""


@st.composite
def _window_cases(draw):
    fn = draw(st.sampled_from(_WINDOW_FNS))
    pk = draw(st.sampled_from(_PART_KEYS))
    ok = draw(st.sampled_from(_ORDER_KEYS))
    direction = draw(st.sampled_from(["ASC", "DESC"]))
    # ROW_NUMBER needs a total order; RANK/DENSE_RANK are value-determined
    # and exercise tie handling when left without the unique tiebreak
    tie = ", o_orderkey" if fn == "ROW_NUMBER" else ""
    top = draw(st.integers(min_value=1, max_value=8))
    where = draw(_predicates())
    return fn, pk, ok, direction, tie, top, where


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(case=_window_cases())
def test_spark_and_duckdb_agree_on_window_functions(engines, case):
    fn, pk, ok, direction, tie, top, where = case
    spark, con = engines
    sql = _WINDOW_QUERY.format(
        fn=fn, pk=pk, ok=ok, dir=direction, tie=tie, top=top, where=where
    )
    sdf = spark.sql(sql)
    s_rows = [tuple(r) for r in sdf.collect()]
    res = con.execute(sql)
    d_cols = [d[0] for d in res.description]
    assert (
        compare_frames(sdf.columns, s_rows, d_cols, res.fetchall()) == []
    ), f"divergence on: {sql}"


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(case=_window_cases())
def test_spark_and_duckdb_agree_on_running_sums(engines, case):
    _fn, pk, ok, direction, _tie, top, where = case
    spark, con = engines
    sql = _RUNNING_QUERY.format(
        pk=pk, ok=ok, dir=direction, top=top, where=where
    )
    sdf = spark.sql(sql)
    s_rows = [tuple(r) for r in sdf.collect()]
    res = con.execute(sql)
    d_cols = [d[0] for d in res.description]
    assert (
        compare_frames(sdf.columns, s_rows, d_cols, res.fetchall()) == []
    ), f"divergence on: {sql}"


# --- scalar string/date expression family -----------------------------------
# Generated engine-portable scalar expressions used as GROUP BY keys: any
# divergence in SUBSTR indexing, REPLACE, concat, or EXTRACT semantics
# shows up as a key-set mismatch immediately.

_scalar_exprs = st.one_of(
    st.tuples(
        st.integers(min_value=1, max_value=5),
        st.integers(min_value=1, max_value=6),
    ).map(lambda t: f"SUBSTR(o_orderpriority, {t[0]}, {t[1]})"),
    st.sampled_from(["UPPER(o_orderpriority)", "LOWER(o_orderstatus)"]),
    st.tuples(
        st.sampled_from(["-", " ", "E", "1"]),
        st.sampled_from(["_", "", "xx"]),
    ).map(lambda t: f"REPLACE(o_orderpriority, '{t[0]}', '{t[1]}')"),
    st.just("o_orderstatus || '-' || SUBSTR(o_orderpriority, 1, 1)"),
    st.sampled_from(
        [
            "EXTRACT(YEAR FROM o_orderdate)",
            "EXTRACT(MONTH FROM o_orderdate)",
            "EXTRACT(DAY FROM o_orderdate)",
            "LENGTH(TRIM(o_orderpriority))",
        ]
    ),
)

_SCALAR_QUERY = (
    "SELECT {expr} AS k, COUNT(*) AS n "
    "FROM orders_diff GROUP BY k ORDER BY k"
)


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(expr=_scalar_exprs)
def test_spark_and_duckdb_agree_on_scalar_expressions(engines, expr):
    spark, con = engines
    sql = _SCALAR_QUERY.format(expr=expr)
    sdf = spark.sql(sql)
    s_rows = [tuple(r) for r in sdf.collect()]
    res = con.execute(sql)
    d_cols = [d[0] for d in res.description]
    assert (
        compare_frames(sdf.columns, s_rows, d_cols, res.fetchall()) == []
    ), f"divergence on: {expr}"


# --- aggregate-function family ------------------------------------------------
# Generated combinations of engine-portable aggregates + HAVING: COUNT,
# COUNT(DISTINCT), exact MIN/MAX on doubles and timestamps, and the
# house decimal-sum — any divergence in DISTINCT handling, null
# treatment, or HAVING evaluation order shows up immediately.

_agg_exprs = st.sampled_from(
    [
        "COUNT(*)",
        "COUNT(DISTINCT o_custkey)",
        "MIN(o_totalprice)",
        "MAX(o_totalprice)",
        "MIN(o_orderdate)",
        "MAX(o_orderdate)",
        "CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(20,6))), 2) AS DOUBLE)",
        "CAST(COUNT(DISTINCT o_orderpriority) AS BIGINT)",
    ]
)

_AGG_QUERY = """
SELECT o_orderpriority AS pk, {a1} AS agg1, {a2} AS agg2
FROM orders_diff
WHERE {where}
GROUP BY o_orderpriority
HAVING COUNT(*) > {h}
ORDER BY pk
"""


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    a1=_agg_exprs,
    a2=_agg_exprs,
    where=_predicates(),
    h=st.integers(min_value=0, max_value=50),
)
def test_spark_and_duckdb_agree_on_aggregates(engines, a1, a2, where, h):
    spark, con = engines
    sql = _AGG_QUERY.format(a1=a1, a2=a2, where=where, h=h)
    sdf = spark.sql(sql)
    s_rows = [tuple(r) for r in sdf.collect()]
    res = con.execute(sql)
    d_cols = [d[0] for d in res.description]
    assert (
        compare_frames(sdf.columns, s_rows, d_cols, res.fetchall()) == []
    ), f"divergence on: {sql}"
