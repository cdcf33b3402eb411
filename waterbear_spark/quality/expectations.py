"""Expectation evaluation, quarantine split, and violation reporting.

The reference evaluates constraints by packing N boolean columns and N names
into two arrays and filtering them with a **row-at-a-time Python UDF**
(/root/reference/tests/tests_convertor.py:361-374) — which breaks
whole-stage codegen and pays a JVM<->Python round trip per batch. This
engine keeps the whole pipeline in Catalyst: each constraint becomes one
entry of an ``array<struct<name,ok>>`` built with ``F.struct``/``F.expr``,
and the violated names are extracted with the higher-order functions
``filter`` + ``transform``. At 100 TB this is the difference between a
single codegen stage over the scan and a Python worker bottleneck.

DLT's ``@dlt.expect_all`` gating (reference README.md:104-109) maps here to
:meth:`Expectations.split` (quarantine) and :meth:`Expectations.report`
(per-rule violation counts) without any DLT dependency.
"""

from __future__ import annotations

from typing import Iterable, Mapping

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from waterbear_spark.schema.compiler import CompiledEntity


class Expectations:
    """A named set of boolean SQL expectations evaluated natively.

    >>> exp = Expectations(compiled.constraints)
    >>> valid, quarantined = exp.split(df)
    >>> exp.report(df).show()   # violations per constraint name
    """

    def __init__(self, constraints: Mapping[str, str]):
        self.constraints = dict(constraints)

    @classmethod
    def for_entity(cls, compiled: CompiledEntity) -> "Expectations":
        return cls(compiled.constraints)

    # -- columns -----------------------------------------------------------

    def checks(self) -> Column:
        """``array<struct<name string, ok boolean>>`` — one entry per rule.

        Every rule is null-tolerant by construction (``X IS NULL OR ...``),
        so ``ok`` is a real boolean, never NULL.
        """
        return F.array(
            *[
                F.struct(F.lit(name).alias("name"), F.expr(expr).alias("ok"))
                for name, expr in self.constraints.items()
            ]
        )

    def violations(self) -> Column:
        """``array<string>`` of violated constraint names — pure Catalyst
        (replaces the reference's Python UDF, tests_convertor.py:364-366)."""
        failed = F.filter(self.checks(), lambda c: ~c["ok"])
        return F.transform(failed, lambda c: c["name"])

    def is_valid(self) -> Column:
        return F.size(self.violations()) == 0

    # -- dataframe-level operations ---------------------------------------

    def with_violations(self, df: DataFrame, col: str = "violations") -> DataFrame:
        return df.withColumn(col, self.violations())

    def split(self, df: DataFrame, col: str = "violations") -> tuple[DataFrame, DataFrame]:
        """(valid, quarantined) — quarantined rows keep the list of violated
        rule names for triage. The flagged frame is computed once so Spark
        can reuse the scan across both branches under AQE."""
        flagged = self.with_violations(df, col)
        valid = flagged.filter(F.size(F.col(col)) == 0).drop(col)
        quarantined = flagged.filter(F.size(F.col(col)) > 0)
        return valid, quarantined

    def report(self, df: DataFrame) -> DataFrame:
        """Violation count per constraint name.

        Parity with the reference's explode -> groupBy -> count report
        (tests_convertor.py:372-374); the groupBy key cardinality is bounded
        by the number of rules, so the shuffle is trivially small and the
        heavy lifting happens map-side in whole-stage codegen.
        """
        return (
            df.select(F.explode(self.violations()).alias("constraint"))
            .groupBy("constraint")
            .agg(F.count(F.lit(1)).alias("violations"))
        )


def array_element_enum(path: str, values: Iterable[str]) -> dict[str, str]:
    """Native array-element domain check the reference could not express
    without exploding or a UDF (util.py:422-425): higher-order ``forall``
    keeps it inside codegen. Opt-in — not emitted by the compiler, to
    preserve reference parity.
    """
    domain = ", ".join(f"'{v}'" for v in values)
    return {
        f"[{path}] ELEMENT": (
            f"{path} IS NULL OR forall({path}, x -> x IN ({domain}))"
        )
    }
