from waterbear_spark.generator.records import RecordGenerator

__all__ = ["RecordGenerator"]
