from waterbear_spark.sources.readers import read_entity, read_entity_stream

__all__ = ["read_entity", "read_entity_stream"]
