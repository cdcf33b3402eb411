"""Unified query registry: every implemented operator from SURVEY.md §2
-> (Spark callable, DuckDB oracle SQL). ``__spark_entry__.py`` re-exports
this for the driver harness.
"""

from __future__ import annotations

from waterbear_spark.functions import udfs
from waterbear_spark.queries import (
    behavior,
    graph,
    llm,
    quality_queries,
    reconcile,
    relational,
    relational_ext,
    textops,
    tpch_more,
    tpch_rest,
)

QUERIES = {
    **relational.QUERIES,
    **behavior.QUERIES,
    **relational_ext.QUERIES,
    **tpch_more.QUERIES,
    **tpch_rest.QUERIES,
    **graph.QUERIES,
    **llm.QUERIES,
    **textops.QUERIES,
    **quality_queries.QUERIES,
    **reconcile.QUERIES,
    # pandas_* queries intentionally exercise the Arrow/pandas UDF surface
    # (everything else in the catalog is UDF-free by policy)
    **udfs.QUERIES,
}

ORACLE_SQL = {
    **relational.ORACLES,
    **behavior.ORACLES,
    **relational_ext.ORACLES,
    **tpch_more.ORACLES,
    **tpch_rest.ORACLES,
    **graph.ORACLES,
    **llm.ORACLES,
    **textops.ORACLES,
    **quality_queries.ORACLES,
    **reconcile.ORACLES,
    **udfs.ORACLES,
}

# every oracle key must have a query twin (the reverse may lag for
# non-SQL-expressible ops, which get rows-only checks)
assert set(ORACLE_SQL) <= set(QUERIES), "oracle without query"
