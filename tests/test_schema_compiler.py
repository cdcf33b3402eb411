"""Compiler unit tests — parity with the reference semantics
(/root/reference/tests/tests_convertor.py) on our own fixture model."""

import pytest
from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    DateType,
    DoubleType,
    IntegerType,
    StringType,
    StructType,
    TimestampType,
)

from tests.conftest import MODEL_DIR
from waterbear_spark.schema.compiler import SchemaCompiler, SchemaError
from waterbear_spark.schema.constraints import (
    array_constraints,
    date_constraints,
    field_path,
    nullable_constraint,
    number_constraints,
    string_constraints,
)
from waterbear_spark.schema.types import UnsupportedTypeError, spark_type_for
pytestmark = pytest.mark.smoke  # <10-min certification subset


class TestTypeMap:
    def test_atomics(self):
        assert spark_type_for("number") == DoubleType()
        assert spark_type_for("integer") == IntegerType()
        assert spark_type_for("boolean") == BooleanType()
        assert spark_type_for("string") == StringType()

    def test_string_formats(self):
        assert spark_type_for("string", "date") == DateType()
        assert spark_type_for("string", "date-time") == TimestampType()
        # exotic formats stay strings; enforced by regex constraint instead
        for fmt in ("uuid", "duration", "ipv4", "ipv6", "hostname", "time"):
            assert spark_type_for("string", fmt) == StringType()

    def test_unsupported(self):
        with pytest.raises(UnsupportedTypeError):
            spark_type_for("map")


class TestConstraintBuilders:
    def test_field_path(self):
        assert field_path("a") == "`a`"
        assert field_path("b", "`a`") == "`a`.`b`"

    def test_nullable(self):
        assert nullable_constraint("`x`", False) == {"[`x`] NULLABLE": "`x` IS NOT NULL"}
        assert nullable_constraint("`x`", True) == {}

    def test_numbers_both_bounds_render_as_floats(self):
        got = number_constraints("`n`", {"minimum": 1, "maximum": 300})
        assert got == {"[`n`] VALUE": "`n` IS NULL OR `n` BETWEEN 1.0 AND 300.0"}

    def test_numbers_one_sided_and_zero(self):
        assert number_constraints("`n`", {"minimum": 0}) == {
            "[`n`] VALUE": "`n` IS NULL OR `n` >= 0.0"
        }
        assert number_constraints("`n`", {"maximum": 10}) == {
            "[`n`] VALUE": "`n` IS NULL OR `n` <= 10.0"
        }
        assert number_constraints("`n`", {}) == {}

    def test_string_length(self):
        got = string_constraints("`s`", {"minLength": 2, "maxLength": 5})
        assert got == {"[`s`] LENGTH": "`s` IS NULL OR LENGTH(`s`) BETWEEN 2 AND 5"}

    def test_string_pattern_and_enum(self):
        got = string_constraints("`s`", {"pattern": "^[a-z0-9]{8}$", "enum": ["A", "B"]})
        assert got["[`s`] MATCH"] == "`s` IS NULL OR `s` RLIKE '^[a-z0-9]{8}$'"
        assert got["[`s`] VALUE"] == "`s` IS NULL OR `s` IN ('A', 'B')"

    def test_string_format_uuid(self):
        got = string_constraints("`s`", {"format": "uuid"})
        assert got["[`s`] MATCH"].startswith("`s` IS NULL OR `s` RLIKE '^[0-9a-fA-F]{8}-")

    def test_string_format_duration_regex_is_valid(self):
        # conscious fix: the reference emits \d{+} which matches nothing
        got = string_constraints("`s`", {"format": "duration"})
        assert (
            got["[`s`] MATCH"]
            == "`s` IS NULL OR `s` RLIKE '^P\\d+[YMWD]$' OR `s` RLIKE '^T\\d+[HMS]$'"
        )

    def test_dates_nonstandard_min_max_keys(self):
        got = date_constraints("`d`", {"min": "1970-01-01", "max": "2002-01-01"})
        assert got == {
            "[`d`] VALUE": "`d` IS NULL OR `d` BETWEEN '1970-01-01' AND '2002-01-01'"
        }
        got = date_constraints("`d`", {"min": "2019-01-01T00:00:00"})
        assert got == {"[`d`] VALUE": "`d` IS NULL OR `d` >= '2019-01-01T00:00:00'"}

    def test_arrays(self):
        assert array_constraints("`a`", {"minItems": 1}) == {
            "[`a`] SIZE": "`a` IS NULL OR SIZE(`a`) >= 1"
        }
        assert array_constraints("`a`", {"minItems": 1, "maxItems": 4}) == {
            "[`a`] SIZE": "`a` IS NULL OR SIZE(`a`) BETWEEN 1 AND 4"
        }


class TestCompiler:
    def test_schema_structure(self):
        compiled = SchemaCompiler(MODEL_DIR).compile("staff")
        schema = compiled.schema
        assert [f.name for f in schema.fields] == [
            "id", "contact", "started_on", "kudos", "languages", "grade", "badge",
        ]
        by_name = {f.name: f for f in schema.fields}
        assert by_name["id"].dataType == IntegerType()
        assert not by_name["id"].nullable
        assert isinstance(by_name["contact"].dataType, StructType)
        assert not by_name["contact"].nullable
        assert by_name["started_on"].dataType == DateType()
        assert by_name["languages"].dataType == ArrayType(StringType())
        assert by_name["badge"].dataType == StringType()

        contact = by_name["contact"].dataType
        assert [f.name for f in contact.fields] == [
            "given_name", "family_name", "born_on", "handle",
        ]
        assert not contact["given_name"].nullable
        assert contact["born_on"].dataType == DateType()
        assert contact["handle"].nullable

    def test_descriptions_carried_as_comment_metadata(self):
        compiled = SchemaCompiler(MODEL_DIR).compile("staff")
        by_name = {f.name: f for f in compiled.schema.fields}
        assert by_name["id"].metadata["comment"] == "Staff identifier"
        contact = by_name["contact"].dataType
        # $ref without sibling description inherits the referenced definition's
        assert contact["given_name"].metadata["comment"] == "A short human-readable name"
        # sibling description takes precedence over the referenced one
        assert contact["family_name"].metadata["comment"] == "Family name of the person"

    def test_golden_constraints(self):
        compiled = SchemaCompiler(MODEL_DIR).compile("staff")
        expected = {
            "[`id`] NULLABLE": "`id` IS NOT NULL",
            "[`id`] VALUE": "`id` IS NULL OR `id` >= 1.0",
            "[`contact`] NULLABLE": "`contact` IS NOT NULL",
            "[`contact`.`given_name`] NULLABLE": "`contact`.`given_name` IS NOT NULL",
            "[`contact`.`family_name`] NULLABLE": "`contact`.`family_name` IS NOT NULL",
            "[`contact`.`born_on`] NULLABLE": "`contact`.`born_on` IS NOT NULL",
            "[`contact`.`born_on`] VALUE": (
                "`contact`.`born_on` IS NULL OR `contact`.`born_on` "
                "BETWEEN '1970-01-01' AND '2002-01-01'"
            ),
            "[`contact`.`handle`] MATCH": (
                "`contact`.`handle` IS NULL OR `contact`.`handle` RLIKE '^[a-z0-9]{8}$'"
            ),
            "[`started_on`] VALUE": "`started_on` IS NULL OR `started_on` >= '2016-01-01'",
            "[`kudos`] VALUE": "`kudos` IS NULL OR `kudos` BETWEEN 1.0 AND 300.0",
            "[`languages`] SIZE": "`languages` IS NULL OR SIZE(`languages`) >= 1",
            "[`grade`] VALUE": "`grade` IS NULL OR `grade` IN ('JR', 'SR', 'STAFF', 'PRINCIPAL')",
            "[`badge`] MATCH": (
                "`badge` IS NULL OR `badge` RLIKE "
                "'^[0-9a-fA-F]{8}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{12}$'"
            ),
        }
        assert compiled.constraints == expected

    def test_stateless_between_compiles(self):
        # the reference leaks constraints across convert() calls
        # (convertor.py:11); ours must not
        compiler = SchemaCompiler(MODEL_DIR)
        first = compiler.compile("contact").constraints
        compiler.compile("staff")
        again = compiler.compile("contact").constraints
        assert first == again
        assert all(key.startswith("[`") for key in first)
        assert not any("`id`" in key for key in first)

    def test_empty_entity(self):
        compiled = SchemaCompiler(MODEL_DIR).compile("empty")
        assert compiled.schema == StructType([])
        assert compiled.constraints == {}

    def test_errors(self):
        with pytest.raises(SchemaError):
            SchemaCompiler("/nonexistent/dir")
        with pytest.raises(SchemaError):
            SchemaCompiler(MODEL_DIR).compile("missing_entity")
        with pytest.raises(SchemaError):
            # shared.json is not an object-typed entity
            SchemaCompiler(MODEL_DIR).compile("shared")
