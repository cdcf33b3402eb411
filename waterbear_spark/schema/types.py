"""JSON-Schema atomic type -> Spark DataType mapping.

Parity target: the reference's single mapping function
(/root/reference/waterbear/utils/util.py:199-222). Semantics preserved:

* ``number``  -> DoubleType
* ``integer`` -> IntegerType (32-bit, as the reference chose)
* ``boolean`` -> BooleanType
* ``string`` + format ``date`` -> DateType, ``date-time`` -> TimestampType
* ``string`` with any other format (uuid, duration, ipv4, ipv6, hostname,
  time, ...) -> StringType; the format is enforced via a regex *constraint*,
  never via the type.
* anything else -> UnsupportedTypeError
"""

from __future__ import annotations

from pyspark.sql.types import (
    BooleanType,
    DataType,
    DateType,
    DoubleType,
    IntegerType,
    StringType,
    TimestampType,
)


class UnsupportedTypeError(ValueError):
    """Raised for JSON types outside the supported lattice."""


_STRING_FORMATS = {
    "date": DateType,
    "date-time": TimestampType,
}

_ATOMIC = {
    "number": DoubleType,
    "integer": IntegerType,
    "boolean": BooleanType,
}


def spark_type_for(json_type: str | None, json_format: str | None = None) -> DataType:
    """Map a JSON-Schema (type, format) pair onto a Spark DataType."""
    if json_type == "string":
        factory = _STRING_FORMATS.get(json_format, StringType)
        return factory()
    try:
        return _ATOMIC[json_type]()
    except KeyError:
        raise UnsupportedTypeError(f"Unsupported JSON type {json_type!r}") from None
