from waterbear_spark.schema.compiler import CompiledEntity, SchemaCompiler

__all__ = ["SchemaCompiler", "CompiledEntity"]
