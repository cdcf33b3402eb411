"""The reference's core capability inside the correctness harness: compile
a JSON-Schema entity, evaluate its expectations over a real table, and
produce the per-rule violation report — with a DuckDB oracle generated
from the SAME compiled constraint dict (single source of truth).

The `customer` entity (waterbear_spark/models/customer.json) is designed
so real testdata rows violate it: negative account balances breach the
``minimum: 0`` expectation and the HOUSEHOLD segment is outside the
declared enum — i.e. the quarantine path actually fires.
"""

from __future__ import annotations

import os
import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

import waterbear_spark
from waterbear_spark.quality.expectations import Expectations
from waterbear_spark.schema.compiler import SchemaCompiler
from waterbear_spark.queries.tables import table

MODELS_DIR = os.path.join(os.path.dirname(waterbear_spark.__file__), "models")


def _compiled_customer():
    return SchemaCompiler(MODELS_DIR).compile("customer")


def quality_report_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Violation count per expectation over the customer table (R19-R23
    pipeline, native evaluation)."""
    compiled = _compiled_customer()
    df = table(spark, sf_dir, "customer")
    return (
        Expectations.for_entity(compiled)
        .report(df)
        .orderBy("constraint")
    )


def quality_quarantine_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quarantined rows (the DLT-gate semantics, R26): key + the violated
    rule names, exploded one row per breached rule for determinism."""
    compiled = _compiled_customer()
    df = table(spark, sf_dir, "customer")
    flagged = Expectations.for_entity(compiled).with_violations(df)
    return (
        flagged.filter(F.size("violations") > 0)
        .select("c_custkey", F.explode("violations").alias("violated"))
        .orderBy("c_custkey", "violated")
    )


def _to_duckdb(expr: str) -> str:
    """Translate a flat-path Spark constraint expression to DuckDB SQL:
    strip backtick quoting, rewrite RLIKE to regexp_matches (all compiler
    regexes are fully anchored, so partial-match == full-match)."""
    out = expr.replace("`", "")
    out = re.sub(
        r"(\w+) RLIKE '([^']*)'",
        lambda m: f"regexp_matches({m.group(1)}, '{m.group(2)}')",
        out,
    )
    return out


def _report_oracle() -> str:
    compiled = _compiled_customer()
    branches = " UNION ALL ".join(
        f"SELECT '{name.replace(chr(39), chr(39) * 2)}' AS \"constraint\","
        f" COUNT(*) FILTER (WHERE NOT ({_to_duckdb(expr)})) AS violations"
        f" FROM customer"
        for name, expr in compiled.constraints.items()
    )
    return (
        f'SELECT "constraint", violations FROM ({branches}) '
        'WHERE violations > 0 ORDER BY "constraint"'
    )


def _quarantine_oracle() -> str:
    compiled = _compiled_customer()
    branches = " UNION ALL ".join(
        f"SELECT c_custkey, '{name.replace(chr(39), chr(39) * 2)}' AS violated"
        f" FROM customer WHERE NOT ({_to_duckdb(expr)})"
        for name, expr in compiled.constraints.items()
    )
    return f"SELECT * FROM ({branches}) ORDER BY c_custkey, violated"


QUERIES = {
    "quality_report_customer": quality_report_customer,
    "quality_quarantine_customer": quality_quarantine_customer,
}

ORACLES = {
    "quality_report_customer": _report_oracle(),
    "quality_quarantine_customer": _quarantine_oracle(),
}
