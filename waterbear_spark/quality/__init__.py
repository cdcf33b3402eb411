from waterbear_spark.quality.expectations import Expectations, array_element_enum

__all__ = ["Expectations", "array_element_enum"]
