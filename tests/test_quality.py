"""End-to-end quality engine test on a hand-corrupted corpus — mirrors the
reference's SparkTest (tests_convertor.py:353-391) with native evaluation."""

import os

from tests.conftest import DATA_DIR, MODEL_DIR
from waterbear_spark import Expectations, SchemaCompiler
from waterbear_spark.quality.expectations import array_element_enum
from waterbear_spark.sources import read_entity
import pytest

pytestmark = pytest.mark.smoke  # <10-min certification subset

CORPUS = os.path.join(DATA_DIR, "staff.jsonl")

EXPECTED_VIOLATIONS = {
    "[`id`] NULLABLE": 1,
    "[`id`] VALUE": 1,
    "[`contact`] NULLABLE": 1,
    "[`contact`.`given_name`] NULLABLE": 2,   # missing contact + missing field
    "[`contact`.`family_name`] NULLABLE": 1,  # via missing contact
    "[`contact`.`born_on`] NULLABLE": 1,      # via missing contact
    "[`contact`.`born_on`] VALUE": 1,
    "[`contact`.`handle`] MATCH": 1,
    "[`started_on`] VALUE": 1,
    "[`kudos`] VALUE": 1,
    "[`languages`] SIZE": 1,
    "[`grade`] VALUE": 1,
    "[`badge`] MATCH": 1,
}


def _load(spark):
    compiled = SchemaCompiler(MODEL_DIR).compile("staff")
    df = read_entity(spark, CORPUS, compiled.schema, fmt="json")
    return compiled, df


def test_schema_enforced_read(spark):
    _, df = _load(spark)
    assert df.count() == 13


def test_schema_enforced_csv_read(spark, tmp_path):
    """R17 CSV variant: schema-on-read coerces types and nulls missing
    fields for CSV just as for JSON (nested structs are JSON-only, so a
    flat projection is used)."""
    csv_path = str(tmp_path / "flat.csv")
    with open(csv_path, "w") as fh:
        fh.write("1,2019-03-01,12,SR\n")          # clean row
        fh.write(",2018-07-15,50,STAFF\n")         # missing id -> NULL
        fh.write("3,2020-01-01,notanum,JR\n")      # bad int -> NULL (permissive)
    from pyspark.sql.types import (
        DateType, IntegerType, StringType, StructField, StructType,
    )

    flat_schema = StructType(
        [
            StructField("id", IntegerType(), False),
            StructField("started_on", DateType(), True),
            StructField("kudos", IntegerType(), True),
            StructField("grade", StringType(), True),
        ]
    )
    df = read_entity(spark, csv_path, flat_schema, fmt="csv")
    rows = {r["grade"]: r for r in df.collect()}
    assert df.count() == 3
    assert rows["STAFF"]["id"] is None
    assert rows["JR"]["kudos"] is None
    assert str(rows["SR"]["started_on"]) == "2019-03-01"


def test_corrupt_record_modes(spark, tmp_path):
    """Schema-on-read strictness surface (R17 options): PERMISSIVE with
    corrupt-record capture, DROPMALFORMED, FAILFAST."""
    import pytest
    from pyspark.sql.types import StringType

    path = str(tmp_path / "mixed.jsonl")
    with open(path, "w") as fh:
        fh.write('{"id": 1, "grade": "SR"}\n')
        fh.write("this is not json at all\n")
        fh.write('{"id": 3, "grade": "JR"}\n')

    from pyspark.sql.types import StructField, StructType

    compiled = SchemaCompiler(MODEL_DIR).compile("staff")
    # copy — StructType.add mutates in place (see udfs.zscore_by_group)
    capture_schema = StructType(
        list(compiled.schema.fields) + [StructField("_corrupt", StringType())]
    )

    captured = read_entity(
        spark, path, capture_schema, fmt="json",
        mode="PERMISSIVE", columnNameOfCorruptRecord="_corrupt",
    ).cache()
    assert captured.count() == 3
    bad = captured.filter(captured["_corrupt"].isNotNull())
    assert bad.count() == 1
    assert "not json" in bad.first()["_corrupt"]

    dropped = read_entity(
        spark, path, compiled.schema, fmt="json", mode="DROPMALFORMED"
    )
    assert dropped.count() == 2

    with pytest.raises(Exception) as err:
        read_entity(
            spark, path, compiled.schema, fmt="json", mode="FAILFAST"
        ).count()
    assert "MALFORMED_RECORD" in str(err.value) or "FAILFAST" in str(err.value)


def test_violation_report(spark):
    compiled, df = _load(spark)
    report = Expectations.for_entity(compiled).report(df)
    actual = {row["constraint"]: row["violations"] for row in report.collect()}
    assert actual == EXPECTED_VIOLATIONS


def test_quarantine_split(spark):
    compiled, df = _load(spark)
    valid, quarantined = Expectations.for_entity(compiled).split(df)
    assert valid.count() == 2
    assert quarantined.count() == 11
    assert "violations" in quarantined.columns
    assert "violations" not in valid.columns


def test_report_plan_has_no_python_udf(spark):
    # the whole evaluation must stay in Catalyst (no BatchEvalPython /
    # ArrowEvalPython nodes), unlike the reference's filter_array UDF
    compiled, df = _load(spark)
    plan = (
        Expectations.for_entity(compiled)
        .report(df)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "EvalPython" not in plan


def test_array_element_enum_opt_in(spark):
    compiled, df = _load(spark)
    exp = Expectations(
        array_element_enum("`languages`", ["SCALA", "PYTHON", "SQL", "R"])
    )
    # corpus has no out-of-domain array elements, so no violations
    assert exp.report(df).count() == 0
    bad = spark.createDataFrame([(["SCALA", "COBOL"],)], "languages array<string>")
    actual = {r["constraint"]: r["violations"] for r in exp.report(bad).collect()}
    assert actual == {"[`languages`] ELEMENT": 1}
