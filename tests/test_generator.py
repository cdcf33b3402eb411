"""Generator round-trip tests — driver-side JSON mode (reference parity,
tests_generator.py:14-37) and the distributed spark.range mode."""

import json

from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, DateType, IntegerType, StringType, StructType

from tests.conftest import MODEL_DIR
from waterbear_spark import RecordGenerator, SchemaCompiler
import pytest

pytestmark = pytest.mark.smoke  # <10-min certification subset


def test_driver_mode_roundtrip(spark, tmp_path):
    generator = RecordGenerator(MODEL_DIR, nullable_rate=0.5)
    records = generator.generate("staff", 100)
    assert len(records) == 100

    target = tmp_path / "staff_gen.jsonl"
    target.write_text("\n".join(records))

    compiled = SchemaCompiler(MODEL_DIR).compile("staff")
    df = spark.read.format("json").schema(compiled.schema).load(str(target))
    assert df.count() == 100
    # required fields are never dropped
    assert df.filter(F.col("id").isNull() | F.col("contact").isNull()).count() == 0


def test_driver_mode_respects_bounds():
    generator = RecordGenerator(MODEL_DIR, nullable_rate=0.0)
    for raw in generator.generate("staff", 50):
        record = json.loads(raw)
        assert record["id"] >= 1
        assert 1 <= record["kudos"] <= 300
        assert record["grade"] in {"JR", "SR", "STAFF", "PRINCIPAL"}
        assert len(record["languages"]) >= 1
        assert set(record["languages"]) <= {"SCALA", "PYTHON", "SQL", "R"}
        assert record["started_on"] >= "2016-01-01"
        assert "1970-01-01" <= record["contact"]["born_on"] <= "2002-01-01"


def test_distributed_mode_schema_and_determinism(spark):
    generator = RecordGenerator(MODEL_DIR, nullable_rate=0.2, seed=7)
    df = generator.frame(spark, "staff", 500, partitions=4)
    assert df.count() == 500

    by_name = {f.name: f for f in df.schema.fields}
    assert by_name["id"].dataType == IntegerType()
    assert isinstance(by_name["contact"].dataType, StructType)
    assert by_name["started_on"].dataType == DateType()
    assert by_name["languages"].dataType == ArrayType(StringType(), False)
    assert by_name["grade"].dataType == StringType()

    # seedable: the same generator spec yields the same data
    again = RecordGenerator(MODEL_DIR, nullable_rate=0.2, seed=7).frame(
        spark, "staff", 500, partitions=4
    )
    assert df.exceptAll(again).count() == 0

    # bounds hold distributed too
    assert df.filter((F.col("kudos") < 1) | (F.col("kudos") > 300)).count() == 0
    assert df.filter(F.size("languages") < 1).count() == 0


def test_distributed_mode_stays_native(spark):
    generator = RecordGenerator(MODEL_DIR, nullable_rate=0.0)
    plan = (
        generator.frame(spark, "staff", 10)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "EvalPython" not in plan
