"""Unified query registry: every implemented operator from SURVEY.md §2
-> (Spark callable, DuckDB oracle SQL). ``__spark_entry__.py`` re-exports
this for the driver harness.
"""

from __future__ import annotations

from waterbear_spark.queries import llm, relational

QUERIES = {**relational.QUERIES, **llm.QUERIES}

ORACLE_SQL = {**relational.ORACLES, **llm.ORACLES}

# every oracle key must have a query twin (the reverse may lag for
# non-SQL-expressible ops, which get rows-only checks)
assert set(ORACLE_SQL) <= set(QUERIES), "oracle without query"
