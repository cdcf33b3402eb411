"""DDL generation from a compiled entity: CREATE TABLE with column
comments + NOT NULL, and ALTER TABLE ... ADD CONSTRAINT CHECK statements.

Parity target: the reference's documented Delta posture — column
``description`` carried as table metadata and expectations enforceable as
Delta CHECK constraints (SURVEY.md §1 "Engine mapping decision";
reference README.md:39-111). CREATE TABLE works against any catalog
format; CHECK constraints are Delta-specific, so they are emitted as
statements for the caller to run where Delta is available.
"""

from __future__ import annotations

import re

from pyspark.sql.types import StructField

from waterbear_spark.schema.compiler import CompiledEntity


def _identifier(name: str) -> str:
    """Constraint-dict key -> SQL-identifier-safe constraint name:
    "[`contact`.`born_on`] VALUE" -> "contact_born_on_value"."""
    return re.sub(r"[^a-z0-9]+", "_", name.lower()).strip("_")


def _column_ddl(field: StructField) -> str:
    parts = [f"`{field.name}`", field.dataType.simpleString().upper()]
    if not field.nullable:
        parts.append("NOT NULL")
    comment = (field.metadata or {}).get("comment")
    if comment:
        escaped = comment.replace("'", "''")
        parts.append(f"COMMENT '{escaped}'")
    return " ".join(parts)


def create_table_ddl(
    compiled: CompiledEntity,
    table_name: str,
    using: str = "DELTA",
    location: str | None = None,
    partition_by: list[str] | None = None,
) -> str:
    """CREATE TABLE DDL with per-column COMMENT and NOT NULL derived from
    the entity model."""
    cols = ",\n  ".join(_column_ddl(f) for f in compiled.schema.fields)
    ddl = f"CREATE TABLE {table_name} (\n  {cols}\n) USING {using}"
    if partition_by:
        ddl += "\nPARTITIONED BY (" + ", ".join(partition_by) + ")"
    if location:
        ddl += f"\nLOCATION '{location}'"
    return ddl


def check_constraint_ddl(compiled: CompiledEntity, table_name: str) -> list[str]:
    """One ALTER TABLE ... ADD CONSTRAINT ... CHECK per expectation.

    NULLABLE expectations for top-level columns are already enforced by
    NOT NULL in the CREATE; they are still emitted here for nested paths
    (struct members can't be NOT NULL in DDL).
    """
    statements = []
    top_level_not_null = {
        f"[`{f.name}`] NULLABLE" for f in compiled.schema.fields if not f.nullable
    }
    for name, expr in compiled.constraints.items():
        if name in top_level_not_null:
            continue
        statements.append(
            f"ALTER TABLE {table_name} ADD CONSTRAINT {_identifier(name)} "
            f"CHECK ({expr})"
        )
    return statements
