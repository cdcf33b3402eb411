"""DDL generation + skew-mitigation operator tests."""

from pyspark.sql import functions as F

from tests.conftest import MODEL_DIR, SF_SMOKE
from waterbear_spark import SchemaCompiler
from waterbear_spark.operators.skew import salted_agg, salted_join
from waterbear_spark.queries.tables import table
from waterbear_spark.schema.ddl import check_constraint_ddl, create_table_ddl


def test_create_table_ddl_comments_and_not_null():
    compiled = SchemaCompiler(MODEL_DIR).compile("staff")
    ddl = create_table_ddl(compiled, "staff", using="PARQUET")
    assert "`id` INT NOT NULL COMMENT 'Staff identifier'" in ddl
    assert "`kudos` INT COMMENT" in ddl  # nullable -> no NOT NULL
    assert ddl.startswith("CREATE TABLE staff (")
    assert "USING PARQUET" in ddl


def test_create_table_ddl_runs_in_catalog(spark):
    compiled = SchemaCompiler(MODEL_DIR).compile("staff")
    spark.sql("DROP TABLE IF EXISTS staff_ddl_test")
    spark.sql(create_table_ddl(compiled, "staff_ddl_test", using="PARQUET"))
    described = {
        r["col_name"]: r["comment"]
        for r in spark.sql("DESCRIBE TABLE staff_ddl_test").collect()
    }
    assert described["id"] == "Staff identifier"
    assert described["grade"] == "Job grade"
    spark.sql("DROP TABLE staff_ddl_test")


def test_check_constraint_ddl():
    compiled = SchemaCompiler(MODEL_DIR).compile("staff")
    stmts = check_constraint_ddl(compiled, "staff")
    joined = "\n".join(stmts)
    # value checks become CHECK constraints with identifier-safe names
    assert (
        "ALTER TABLE staff ADD CONSTRAINT id_value CHECK "
        "(`id` IS NULL OR `id` >= 1.0)" in joined
    )
    # top-level NOT NULL handled by CREATE, not re-emitted...
    assert "id_nullable" not in joined
    # ...but nested nullability still needs a CHECK
    assert "contact_given_name_nullable" in joined


def test_salted_join_matches_plain_join(spark):
    orders = table(spark, SF_SMOKE, "orders")
    cust = table(spark, SF_SMOKE, "customer")
    plain = orders.join(cust, orders.o_custkey == cust.c_custkey).select(
        "o_orderkey", "c_mktsegment"
    )
    salted = salted_join(orders, cust, "o_custkey", "c_custkey", salt=8).select(
        "o_orderkey", "c_mktsegment"
    )
    assert salted.count() == plain.count()
    assert salted.exceptAll(plain).count() == 0
    assert plain.exceptAll(salted).count() == 0


def test_salted_agg_matches_plain_agg(spark):
    li = table(spark, SF_SMOKE, "lineitem")
    plain = {
        (r["l_returnflag"],): (r["s"], r["n"], r["mx"])
        for r in li.groupBy("l_returnflag")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("s"),
            F.count(F.lit(1)).alias("n"),
            F.max("l_quantity").alias("mx"),
        )
        .collect()
    }
    salted = salted_agg(
        li,
        ["l_returnflag"],
        {"l_quantity": "sum", "l_orderkey": "count", "l_extendedprice": "max"},
        salt=8,
    )
    got = {
        (r["l_returnflag"],): (
            round(r["sum_l_quantity"], 2),
            r["count_l_orderkey"],
        )
        for r in salted.collect()
    }
    for key, (s, n, _) in plain.items():
        gs, gn = got[key]
        assert abs(gs - s) < 0.01
        assert gn == n
