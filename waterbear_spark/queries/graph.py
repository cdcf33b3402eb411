"""Graph analytics over relational data: PageRank via power iteration.

Complements the connected-components clustering in ``llm.py`` (both are
the iterative driver-loop pattern: a small state DataFrame refined by a
fixed number of join+aggregate rounds — each round one shuffle, state
linear in nodes, never in edges).

Determinism: ranks are fixed-point BIGINTs (1e12 units) and every update
is integer arithmetic (``div`` floor division, exact sums), so five
iterations are bit-identical between Spark and the DuckDB chained-CTE
oracle — no float summation-order hazard.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from waterbear_spark.queries.tables import table

_SCALE = 10**12  # rank fixed-point unit
_SUPP_OFF = 1_000_000  # supplier node-id offset (disjoint from custkeys)
_DAMP_NUM, _DAMP_DEN = 85, 100  # damping 0.85 as a ratio
_ITERS = 5


def pagerank_bipartite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank on the customer↔supplier interaction graph (an edge per
    distinct trading pair, both directions), 5 power iterations; returns
    the 25 most central suppliers.

    Scale: edges shuffle once to build; each iteration joins the rank
    vector (|nodes| rows — tiny, broadcastable) onto the edge list and
    aggregates contributions by destination: one shuffle per round over
    data proportional to |edges|, with AQE free to broadcast the rank
    side. State never exceeds one row per node — this is the same loop
    discipline GraphX/Pregel uses, expressed in plain DataFrame ops.
    """
    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    orders = table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    pairs = (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .select("o_custkey", "l_suppkey")
        .distinct()
    )
    fwd = pairs.select(
        F.col("o_custkey").alias("src"),
        (F.col("l_suppkey") + _SUPP_OFF).alias("dst"),
    )
    rev = pairs.select(
        (F.col("l_suppkey") + _SUPP_OFF).alias("src"),
        F.col("o_custkey").alias("dst"),
    )
    edges = fwd.unionAll(rev)
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    # degree is static: attach it to the edge list ONCE, not per round
    edges_deg = edges.join(deg, "src").persist()
    # deg has exactly one row per node (symmetrized edges: every node is
    # a src), so it doubles as the node list
    deg.persist()
    n_nodes = deg.count()
    base = _SCALE * (_DAMP_DEN - _DAMP_NUM) // _DAMP_DEN // n_nodes

    # the rank vector is one row per NODE (not per edge) — broadcast it
    # onto the partitioned edge list each round, so the only shuffle per
    # iteration is the contribution aggregate on dst. Symmetry also means
    # every node receives contributions, so the aggregate output IS the
    # next rank vector — no join back onto a node list. (On a graph whose
    # rank vector outgrows a broadcast, drop the hint and AQE falls back
    # to a shuffle join — the loop shape is unchanged.)
    ranks = deg.select(F.col("src").alias("node"), F.lit(_SCALE // n_nodes).alias("r"))
    for _ in range(_ITERS):
        ranks = (
            edges_deg.join(F.broadcast(ranks), F.col("src") == F.col("node"))
            .select("dst", F.expr("r div deg").alias("c"))
            .groupBy("dst")
            .agg(
                (
                    F.lit(base)
                    + F.expr(f"sum(c) * {_DAMP_NUM} div {_DAMP_DEN}")
                ).alias("r")
            )
            .withColumnRenamed("dst", "node")
        )
    return (
        ranks.filter(F.col("node") >= _SUPP_OFF)
        .select((F.col("node") - _SUPP_OFF).alias("supp_id"), F.col("r").alias("rank_fp"))
        .orderBy(F.col("rank_fp").desc(), "supp_id")
        .limit(25)
    )


def _pagerank_sql() -> str:
    iter_ctes = []
    prev = "r0"
    for i in range(1, _ITERS + 1):
        iter_ctes.append(
            f"""r{i} AS (
    SELECT dst AS node,
           (SELECT ({_SCALE} * {_DAMP_DEN - _DAMP_NUM}) // {_DAMP_DEN} // c FROM n)
           + (SUM({prev}.r // deg.deg) * {_DAMP_NUM}) // {_DAMP_DEN} AS r
    FROM edges
    JOIN {prev} ON edges.src = {prev}.node
    JOIN deg ON edges.src = deg.src
    GROUP BY dst
)"""
        )
        prev = f"r{i}"
    return f"""
WITH pairs AS (
    SELECT DISTINCT o_custkey, l_suppkey
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
),
edges AS (
    SELECT o_custkey AS src, l_suppkey + {_SUPP_OFF} AS dst FROM pairs
    UNION ALL
    SELECT l_suppkey + {_SUPP_OFF} AS src, o_custkey AS dst FROM pairs
),
deg AS (SELECT src, COUNT(*) AS deg FROM edges GROUP BY src),
nodes AS (SELECT DISTINCT src AS node FROM edges),
n AS (SELECT COUNT(*) AS c FROM nodes),
r0 AS (SELECT node, {_SCALE} // (SELECT c FROM n) AS r FROM nodes),
{",".join(iter_ctes)}
SELECT node - {_SUPP_OFF} AS supp_id, r AS rank_fp
FROM {prev}
WHERE node >= {_SUPP_OFF}
ORDER BY rank_fp DESC, supp_id
LIMIT 25
"""


QUERIES = {"pagerank_bipartite": pagerank_bipartite}
ORACLES = {"pagerank_bipartite": _pagerank_sql()}
