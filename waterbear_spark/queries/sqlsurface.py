"""SQL-surface parity queries: operators expressed through ``spark.sql``
with the SAME SQL text running on both engines.

Spark 4 closed two long-standing SQL gaps — recursive CTEs
(``WITH RECURSIVE``) and correlated ``LATERAL`` subqueries — so these
two queries exercise them natively and share one dialect-neutral SQL
string per query with the DuckDB oracle (byte-identical modulo nothing:
the strings ARE the oracle). This is the strongest possible cross-engine
check: any divergence is an engine-semantics difference, not a
translation artifact.

Note [[bom_rollup_cost]] predates this: its docstring's "Spark has no
recursive CTE" was true of Spark 3.x; its closed-form ancestor expansion
remains the right SCALE answer (one pass vs depth rounds), while
``recursive_org_rollup`` here proves the genuine iterative surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from waterbear_spark.queries.tables import table

# Implicit supplier forest: parent(k) = k div 10, roots are the one-digit
# keys — every key >= 1 reaches a root in <= ceil(log10 n) steps, so the
# recursion depth is 7 at a trillion suppliers. FLOOR(x / 10.0) is the
# dialect-neutral integer division (Spark `div` vs DuckDB `//` differ).
RECURSIVE_ORG_SQL = """
WITH RECURSIVE chain AS (
    SELECT s_suppkey AS root, s_suppkey AS node, 0 AS depth
    FROM supplier WHERE s_suppkey < 10
  UNION ALL
    SELECT c.root, s.s_suppkey AS node, c.depth + 1 AS depth
    FROM chain c
    JOIN supplier s
      ON CAST(FLOOR(s.s_suppkey / 10.0) AS BIGINT) = c.node
    WHERE s.s_suppkey >= 10
)
SELECT c.root AS root_suppkey,
       COUNT(*) AS n_nodes,
       MAX(c.depth) AS max_depth,
       CAST(ROUND(SUM(CAST(s.s_acctbal AS DECIMAL(20,6))), 2) AS DOUBLE)
           AS subtree_acctbal
FROM chain c JOIN supplier s ON s.s_suppkey = c.node
GROUP BY c.root
ORDER BY root_suppkey
"""


def recursive_org_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Genuine ``WITH RECURSIVE`` hierarchy closure (new in Spark 4):
    per-root subtree size, depth, and exact-decimal balance rollup over
    the implicit supplier forest. The recursion is the real engine
    feature — Spark's UnionLoop — not a rewrite.

    Scale: each iteration is one equi-join of the frontier against the
    (broadcastable-after-pruning) parent map; depth is log10-bounded by
    construction, so the loop runs <= 7 rounds at any scale. For an
    arithmetic-coded hierarchy the closed form of [[bom_rollup_cost]]
    is still one pass and preferred; this entry certifies the recursive
    SURFACE against an engine that has had it for years.
    """
    table(spark, sf_dir, "supplier").createOrReplaceTempView("supplier")
    return spark.sql(RECURSIVE_ORG_SQL)


# Correlated LATERAL subquery with ORDER BY + LIMIT: per-key top-k as a
# user would actually write it. Spark decorrelates this into a ranked
# window join; DuckDB executes it directly — same rows either way.
LATERAL_TOP_ORDERS_SQL = """
SELECT c.c_custkey, t.o_orderkey, t.o_totalprice
FROM customer c, LATERAL (
    SELECT o.o_orderkey, o.o_totalprice
    FROM orders o
    WHERE o.o_custkey = c.c_custkey
    ORDER BY o.o_totalprice DESC, o.o_orderkey
    LIMIT 3
) t
WHERE c.c_custkey % 100 = 0
ORDER BY c.c_custkey, t.o_totalprice DESC, t.o_orderkey
"""


def lateral_top_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated ``LATERAL`` subquery (new in Spark 4): each sampled
    customer's three largest orders, written as the per-row subquery a
    SQL user reaches for first.

    Scale: Catalyst decorrelates the LIMIT-ed lateral into a
    rank-window over one (custkey) shuffle — the same physical plan as
    the hand-written [[top_n_orders]] — so the friendly surface costs
    nothing over the expert formulation; ``.explain`` shows no
    nested-loop operator.
    """
    table(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(LATERAL_TOP_ORDERS_SQL)


QUERIES = {
    "recursive_org_rollup": recursive_org_rollup,
    "lateral_top_orders": lateral_top_orders,
}

ORACLES = {
    "recursive_org_rollup": RECURSIVE_ORG_SQL,
    "lateral_top_orders": LATERAL_TOP_ORDERS_SQL,
}
