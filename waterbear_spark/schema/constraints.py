"""SQL expectation builders.

Each builder returns ``{constraint_name: boolean_sql_expression}`` where the
name follows the reference's interop contract ``"[<path>] <KIND>"`` with KIND
in {NULLABLE, VALUE, LENGTH, MATCH, SIZE}, and every value-level check is
null-tolerant by construction (``X IS NULL OR <cond>``) so that a nullability
violation is reported exactly once.

Parity target: /root/reference/waterbear/utils/util.py:255-443. Conscious
fixes (documented deviations from the reference):

* bound presence is tested with ``is not None`` instead of Python truthiness,
  so ``minimum=0 AND maximum=0`` emits a proper BETWEEN (the reference
  collapses that corner to a one-sided check, util.py:283-295);
* the ISO-8601 duration regexes are valid (``\\d+``; the reference's
  ``\\d{+}`` at util.py:326-327 matches nothing);
* the reference's second, unreachable uuid branch (util.py:344-347) is
  dropped.

Preserved quirks (golden tests encode them): numeric bounds are rendered as
floats even for integer fields; date/timestamp ranges read the non-standard
``min``/``max`` keys and compare as strings; the ``time`` format regex is
12-hour; array *element* domains are not enforced here (see
`waterbear_spark.quality.expectations.array_element_enum` for the native
fix the reference couldn't express without a UDF).
"""

from __future__ import annotations

from typing import Callable, Mapping

# Built-in regexes for JSON-Schema string formats that map to StringType.
FORMAT_PATTERNS: Mapping[str, str] = {
    "uuid": "^[0-9a-fA-F]{8}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{12}$",
    "ipv4": "^(?:[0-9]{1,3}\\.){3}[0-9]{1,3}$",
    "ipv6": "^(?:[A-F0-9]{1,4}:){7}[A-F0-9]{1,4}$",
    "hostname": (
        "^(([a-zA-Z0-9]|[a-zA-Z0-9][a-zA-Z0-9\\-]*[a-zA-Z0-9])\\.)*"
        "([A-Za-z0-9]|[A-Za-z0-9][A-Za-z0-9\\-]*[A-Za-z0-9])$"
    ),
    "time": "^(0?[1-9]|1[012]):[0-5][0-9]:[0-5][0-9]$",
}

DURATION_PATTERNS = ("^P\\d+[YMWD]$", "^T\\d+[HMS]$")


def field_path(name: str, parent: str | None = None) -> str:
    """Backtick-qualified absolute SQL path for a (possibly nested) field.

    Parity: util.py:239-252.
    """
    quoted = f"`{name}`"
    return f"{parent}.{quoted}" if parent else quoted


def _range_check(
    path: str,
    lo,
    hi,
    render: Callable[[object], str],
    operand: str | None = None,
) -> str | None:
    """Shared BETWEEN / >= / <= shape for value, length, size and date checks."""
    operand = operand or path
    if lo is not None and hi is not None:
        cond = f"{operand} BETWEEN {render(lo)} AND {render(hi)}"
    elif lo is not None:
        cond = f"{operand} >= {render(lo)}"
    elif hi is not None:
        cond = f"{operand} <= {render(hi)}"
    else:
        return None
    return f"{path} IS NULL OR {cond}"


def nullable_constraint(path: str, is_nullable: bool) -> dict[str, str]:
    """Required field -> ``IS NOT NULL`` expectation (util.py:255-268)."""
    if is_nullable:
        return {}
    return {f"[{path}] NULLABLE": f"{path} IS NOT NULL"}


def number_constraints(path: str, properties: Mapping) -> dict[str, str]:
    """``minimum``/``maximum`` -> inclusive range check; bounds rendered as
    floats even for integer fields (util.py:271-296)."""
    expr = _range_check(
        path,
        properties.get("minimum"),
        properties.get("maximum"),
        lambda v: str(float(v)),
    )
    return {f"[{path}] VALUE": expr} if expr else {}


def string_constraints(path: str, properties: Mapping) -> dict[str, str]:
    """minLength/maxLength, pattern, enum and format regexes for plain
    strings (util.py:299-380). An explicit ``pattern`` overrides a format
    regex (same MATCH key, last writer wins — as in the reference where
    ``pattern`` is processed after ``format``)."""
    constraints: dict[str, str] = {}

    fmt = properties.get("format")
    if fmt == "duration":
        p1, p2 = DURATION_PATTERNS
        constraints[f"[{path}] MATCH"] = (
            f"{path} IS NULL OR {path} RLIKE '{p1}' OR {path} RLIKE '{p2}'"
        )
    elif fmt in FORMAT_PATTERNS:
        constraints[f"[{path}] MATCH"] = (
            f"{path} IS NULL OR {path} RLIKE '{FORMAT_PATTERNS[fmt]}'"
        )

    pattern = properties.get("pattern")
    if pattern:
        constraints[f"[{path}] MATCH"] = f"{path} IS NULL OR {path} RLIKE '{pattern}'"

    enum = properties.get("enum")
    if enum:
        domain = ", ".join(f"'{value}'" for value in enum)
        constraints[f"[{path}] VALUE"] = f"{path} IS NULL OR {path} IN ({domain})"

    length_expr = _range_check(
        path,
        properties.get("minLength"),
        properties.get("maxLength"),
        lambda v: str(int(v)),
        operand=f"LENGTH({path})",
    )
    if length_expr:
        constraints[f"[{path}] LENGTH"] = length_expr

    return constraints


def date_constraints(path: str, properties: Mapping) -> dict[str, str]:
    """Non-standard ``min``/``max`` keys -> quoted string-compare range
    (util.py:383-409); applies to both date and date-time formats."""
    expr = _range_check(
        path,
        properties.get("min"),
        properties.get("max"),
        lambda v: f"'{v}'",
    )
    return {f"[{path}] VALUE": expr} if expr else {}


def array_constraints(path: str, properties: Mapping) -> dict[str, str]:
    """``minItems``/``maxItems`` -> SIZE() range (util.py:412-443).

    Element-level domains are intentionally not emitted here for parity;
    the quality engine offers an opt-in native check instead.
    """
    expr = _range_check(
        path,
        properties.get("minItems"),
        properties.get("maxItems"),
        lambda v: str(int(v)),
        operand=f"SIZE({path})",
    )
    return {f"[{path}] SIZE": expr} if expr else {}
