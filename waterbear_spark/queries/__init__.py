from waterbear_spark.queries.catalog import ORACLE_SQL, QUERIES

__all__ = ["QUERIES", "ORACLE_SQL"]
