"""Round-3 wave-4 operators: bit/bool aggregate surface, hypothetical-set
rank, semi-additive balance ledger, the feature-hashing trick, and
value-change streak detection.

Operator families the catalog didn't cover yet:

* ``bool_bit_aggs`` — the BOOL_AND/BOOL_OR and BIT_AND/BIT_OR/BIT_XOR
  aggregate family (flag roll-ups and bitmask folds; XOR is the
  checksum fold used by set-reconciliation protocols).
* ``hypothetical_rank`` — hypothetical-set functions (``RANK(v) WITHIN
  GROUP``): the rank / percent_rank / cume_dist a probe value WOULD get
  in each group, computed from conditional counts without inserting it.
* ``semi_additive_balance`` — the OLAP semi-additive measure: monthly
  closing balance per segment over a dense month spine (months with no
  activity carry the balance forward), summable across segments but NOT
  across time.
* ``feature_hashing`` — the hashing trick (Weinberger et al., ICML'09):
  categorical features folded into a fixed bucket space with a signed
  hash, with the collision census made explicit.
* ``status_streaks`` — value-change gaps-and-islands: maximal runs of
  identical order status per customer in date order, the streak/RLE
  primitive behind "N consecutive failures" monitors.

Float determinism follows the house rules in ``tables.py``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from waterbear_spark.queries.tables import DEC, table


# ---------------------------------------------------------------------------
# BOOL_* / BIT_* aggregate family
# ---------------------------------------------------------------------------

_BIG_ORDER = 200_000.0


def bool_bit_aggs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BOOL_AND / BOOL_OR over a price-threshold flag and BIT_AND /
    BIT_OR / BIT_XOR over an 8-bit key digest, per order priority.

    The bit folds are the bitmask roll-up surface (capability-flag
    intersection/union) and the XOR fold is the order-insensitive
    checksum used by set-reconciliation; all five are
    commutative-associative single-pass aggregates, so partial
    (map-side) combine applies and the result is scale-invariant.
    """
    o = table(spark, sf_dir, "orders")
    byte = (F.col("o_orderkey") % 256).cast("int")
    return (
        o.groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.bool_and(F.col("o_totalprice") > _BIG_ORDER).alias("all_big"),
            F.bool_or(F.col("o_totalprice") > _BIG_ORDER).alias("any_big"),
            F.bit_and(byte).alias("key_bit_and"),
            F.bit_or(byte).alias("key_bit_or"),
            F.bit_xor(byte).alias("key_bit_xor"),
        )
        .orderBy("o_orderpriority")
    )


BOOL_BIT_AGGS_SQL = f"""
SELECT o_orderpriority,
       COUNT(*) AS n,
       BOOL_AND(o_totalprice > {_BIG_ORDER}) AS all_big,
       BOOL_OR(o_totalprice > {_BIG_ORDER}) AS any_big,
       BIT_AND(CAST(o_orderkey % 256 AS INT)) AS key_bit_and,
       BIT_OR(CAST(o_orderkey % 256 AS INT)) AS key_bit_or,
       BIT_XOR(CAST(o_orderkey % 256 AS INT)) AS key_bit_xor
FROM orders
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


# ---------------------------------------------------------------------------
# Hypothetical-set rank
# ---------------------------------------------------------------------------

_HYP_PRICE = 150_000.0


def hypothetical_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypothetical-set functions — ``RANK({v}) WITHIN GROUP (ORDER BY
    o_totalprice)`` and friends, per order priority: the rank,
    percent_rank, and cume_dist a probe price WOULD receive if inserted
    into each group.

    Neither engine ships the SQL:2003 hypothetical-set aggregates, so
    both sides compute them from their conditional-count definitions
    (rank = 1 + |x < v|, cume_dist = (|x <= v| + 1) / (n + 1),
    percent_rank = |x < v| / n) — exact integer counts and one IEEE
    division each, bit-identical across engines. One pass, map-side
    combinable.
    """
    o = table(spark, sf_dir, "orders")
    lt = F.sum(F.when(F.col("o_totalprice") < _HYP_PRICE, 1).otherwise(0))
    le = F.sum(F.when(F.col("o_totalprice") <= _HYP_PRICE, 1).otherwise(0))
    n = F.count(F.lit(1))
    return (
        o.groupBy("o_orderpriority")
        .agg(
            n.alias("n"),
            (lt + 1).alias("hyp_rank"),
            F.round(lt.cast("double") / n, 6).alias("hyp_percent_rank"),
            F.round((le + 1).cast("double") / (n + 1), 6).alias("hyp_cume_dist"),
        )
        .orderBy("o_orderpriority")
    )

hypothetical_rank.__doc__ = hypothetical_rank.__doc__.format(v=_HYP_PRICE)


HYPOTHETICAL_RANK_SQL = f"""
SELECT o_orderpriority,
       COUNT(*) AS n,
       CAST(SUM(CASE WHEN o_totalprice < {_HYP_PRICE} THEN 1 ELSE 0 END) + 1 AS BIGINT) AS hyp_rank,
       ROUND(CAST(SUM(CASE WHEN o_totalprice < {_HYP_PRICE} THEN 1 ELSE 0 END) AS DOUBLE)
             / COUNT(*), 6) AS hyp_percent_rank,
       ROUND(CAST(SUM(CASE WHEN o_totalprice <= {_HYP_PRICE} THEN 1 ELSE 0 END) + 1 AS DOUBLE)
             / (COUNT(*) + 1), 6) AS hyp_cume_dist
FROM orders
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


# ---------------------------------------------------------------------------
# Semi-additive monthly balance ledger
# ---------------------------------------------------------------------------

def semi_additive_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-additive closing-balance ledger: treat each order as a
    deposit into its customer's market segment and report, for EVERY
    month of the data's span (dense spine), the segment's monthly
    inflow and month-end closing balance — carried forward through
    months with no activity, the defining semi-additive behavior
    (additive across segments, last-value across time).

    The month spine is ``sequence()`` between the global min/max months
    cross-joined with the 5 segments — a broadcast of a few hundred
    rows at ANY fact scale, so the densification never shuffles the
    fact table; inflows aggregate once on (segment, month) and the
    carry-forward is a cumulative exact-decimal window over month-grain
    rows (#segments x #months of state, independent of fact count).
    """
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    month = F.date_trunc("month", F.col("o_orderdate").cast("timestamp_ntz"))
    inflow = (
        o.join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
        .groupBy(
            F.col("c_mktsegment").alias("segment"), month.alias("month")
        )
        .agg(F.sum(F.col("o_totalprice").cast(DEC)).alias("inflow_dec"))
    )
    bounds = o.select(
        F.date_trunc("month", F.min("o_orderdate").cast("timestamp_ntz")).alias("lo"),
        F.date_trunc("month", F.max("o_orderdate").cast("timestamp_ntz")).alias("hi"),
    )
    spine = (
        bounds.select(
            F.explode(
                F.sequence("lo", "hi", F.expr("interval 1 month"))
            ).alias("month")
        )
        .crossJoin(
            F.broadcast(c.select(F.col("c_mktsegment").alias("segment")).distinct())
        )
    )
    w = (
        Window.partitionBy("segment")
        .orderBy("month")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    dense = spine.join(inflow, ["segment", "month"], "left").select(
        "segment",
        "month",
        F.coalesce(F.col("inflow_dec"), F.lit(0).cast(DEC)).alias("inflow_dec"),
    )
    return dense.select(
        "segment",
        F.date_format("month", "yyyy-MM").alias("month"),
        F.round(F.col("inflow_dec"), 2).cast("double").alias("inflow"),
        F.round(F.sum("inflow_dec").over(w), 2)
        .cast("double")
        .alias("closing_balance"),
    ).orderBy("segment", "month")


SEMI_ADDITIVE_BALANCE_SQL = """
WITH inflow AS (
    SELECT c.c_mktsegment AS segment,
           DATE_TRUNC('month', o.o_orderdate) AS month,
           SUM(CAST(o.o_totalprice AS DECIMAL(20,6))) AS inflow_dec
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    GROUP BY 1, 2
),
bounds AS (
    SELECT DATE_TRUNC('month', MIN(o_orderdate)) AS lo,
           DATE_TRUNC('month', MAX(o_orderdate)) AS hi
    FROM orders
),
spine AS (
    SELECT s.segment, m.month
    FROM (SELECT DISTINCT c_mktsegment AS segment FROM customer) s
    CROSS JOIN (
        SELECT UNNEST(generate_series(lo, hi, INTERVAL 1 MONTH)) AS month
        FROM bounds
    ) m
),
dense AS (
    SELECT sp.segment, sp.month,
           COALESCE(i.inflow_dec, CAST(0 AS DECIMAL(20,6))) AS inflow_dec
    FROM spine sp LEFT JOIN inflow i
      ON sp.segment = i.segment AND sp.month = i.month
)
SELECT segment,
       STRFTIME(month, '%Y-%m') AS month,
       CAST(ROUND(inflow_dec, 2) AS DOUBLE) AS inflow,
       CAST(ROUND(SUM(inflow_dec) OVER (
           PARTITION BY segment ORDER BY month
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS DOUBLE)
           AS closing_balance
FROM dense
ORDER BY segment, month
"""


# ---------------------------------------------------------------------------
# Feature hashing (the hashing trick)
# ---------------------------------------------------------------------------

_FH_BUCKETS = 64


def _fh_hash(tok, mod: int):
    """First 12 hex chars of md5 as bigint — the shared deterministic
    hash both engines compute identically (house trick, tables.py)."""
    return F.conv(F.substring(F.md5(tok), 1, 12), 16, 10).cast("bigint") % mod


def feature_hashing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The hashing trick over categorical order features: each
    ``name=value`` token is folded into a {b}-bucket space by one hash
    and given a +/-1 sign by a second (the signed variant that makes
    collisions cancel in expectation, Weinberger et al.). Output per
    bucket: token occurrences, DISTINCT tokens (the collision census —
    buckets with > 1 distinct token are collisions), and the signed sum
    that would land in a hashed feature vector.

    Scale: map-side token explode (3 tokens/row, no shuffle until the
    {b}-key aggregate), bounded output. This is the schema-free
    featurizer used when the category vocabulary is unbounded.
    """
    o = table(spark, sf_dir, "orders")
    price_band = F.concat(
        F.lit("band="), (F.col("o_totalprice") / 50_000).cast("int").cast("string")
    )
    toks = o.select(
        F.explode(
            F.array(
                F.concat(F.lit("status="), "o_orderstatus"),
                F.concat(F.lit("priority="), "o_orderpriority"),
                price_band,
            )
        ).alias("tok")
    )
    hashed = toks.select(
        "tok",
        _fh_hash(F.col("tok"), _FH_BUCKETS).alias("bucket"),
        (_fh_hash(F.concat(F.lit("sign|"), F.col("tok")), 2) * 2 - 1).alias("sign"),
    )
    return (
        hashed.groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.countDistinct("tok").alias("n_distinct"),
            F.sum("sign").alias("signed_sum"),
        )
        .orderBy("bucket")
    )

feature_hashing.__doc__ = feature_hashing.__doc__.format(b=_FH_BUCKETS)


FEATURE_HASHING_SQL = f"""
WITH toks AS (
    SELECT UNNEST([
        'status=' || o_orderstatus,
        'priority=' || o_orderpriority,
        'band=' || CAST(CAST(FLOOR(o_totalprice / 50000) AS INT) AS VARCHAR)
    ]) AS tok
    FROM orders
),
hashed AS (
    SELECT tok,
           CAST(('0x' || SUBSTR(MD5(tok), 1, 12)) AS UBIGINT)::BIGINT
               % {_FH_BUCKETS} AS bucket,
           CAST(('0x' || SUBSTR(MD5('sign|' || tok), 1, 12)) AS UBIGINT)::BIGINT
               % 2 * 2 - 1 AS sign
    FROM toks
)
SELECT bucket,
       COUNT(*) AS n_tokens,
       COUNT(DISTINCT tok) AS n_distinct,
       CAST(SUM(sign) AS BIGINT) AS signed_sum
FROM hashed
GROUP BY bucket
ORDER BY bucket
"""


# ---------------------------------------------------------------------------
# Value-change streaks (gaps-and-islands on equal runs)
# ---------------------------------------------------------------------------

def status_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximal runs of identical order status per customer in
    (date, key) order — the value-change flavor of gaps-and-islands
    (cf. [[key_islands]], which stitches on key adjacency instead).
    A run starts wherever the status differs from the previous row's;
    run ids are the running count of starts; per status the report
    gives how many runs exist, the longest, and the mean length.

    Scale: one shuffle on customer (window partition), then a bounded
    aggregate; the two windows share the same partitioning so Catalyst
    plans a single Exchange. The 'N consecutive failures' monitor is
    this operator with a HAVING on max_len.
    """
    o = table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    runs = o.select(
        "o_custkey",
        "o_orderstatus",
        F.sum(
            F.when(
                F.lag("o_orderstatus").over(w).isNull()
                | (F.lag("o_orderstatus").over(w) != F.col("o_orderstatus")),
                1,
            ).otherwise(0)
        )
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .alias("run_id"),
    )
    lens = runs.groupBy("o_custkey", "run_id", "o_orderstatus").agg(
        F.count(F.lit(1)).alias("len")
    )
    return (
        lens.groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_runs"),
            F.max("len").alias("max_len"),
            F.round(
                F.sum("len").cast("double") / F.count(F.lit(1)), 6
            ).alias("avg_len"),
        )
        .orderBy("o_orderstatus")
    )


STATUS_STREAKS_SQL = """
WITH marked AS (
    SELECT o_custkey, o_orderstatus,
           CASE WHEN LAG(o_orderstatus) OVER w IS NULL
                  OR LAG(o_orderstatus) OVER w <> o_orderstatus
                THEN 1 ELSE 0 END AS is_start
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
),
runs AS (
    SELECT o_custkey, o_orderstatus,
           SUM(is_start) OVER (PARTITION BY o_custkey
                               ORDER BY o_orderdate, o_orderkey
                               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS run_id
    FROM (
        SELECT o_custkey, o_orderstatus, o_orderdate, o_orderkey,
               CASE WHEN LAG(o_orderstatus) OVER w IS NULL
                      OR LAG(o_orderstatus) OVER w <> o_orderstatus
                    THEN 1 ELSE 0 END AS is_start
        FROM orders
        WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    )
),
lens AS (
    SELECT o_custkey, run_id, o_orderstatus, COUNT(*) AS len
    FROM runs GROUP BY 1, 2, 3
)
SELECT o_orderstatus,
       COUNT(*) AS n_runs,
       MAX(len) AS max_len,
       ROUND(CAST(SUM(len) AS DOUBLE) / COUNT(*), 6) AS avg_len
FROM lens
GROUP BY o_orderstatus
ORDER BY o_orderstatus
"""


QUERIES = {
    "bool_bit_aggs": bool_bit_aggs,
    "hypothetical_rank": hypothetical_rank,
    "semi_additive_balance": semi_additive_balance,
    "feature_hashing": feature_hashing,
    "status_streaks": status_streaks,
}

ORACLES = {
    "bool_bit_aggs": BOOL_BIT_AGGS_SQL,
    "hypothetical_rank": HYPOTHETICAL_RANK_SQL,
    "semi_additive_balance": SEMI_ADDITIVE_BALANCE_SQL,
    "feature_hashing": FEATURE_HASHING_SQL,
    "status_streaks": STATUS_STREAKS_SQL,
}
