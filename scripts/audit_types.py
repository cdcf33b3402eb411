#!/usr/bin/env python
"""Audit output types of every oracle SQL (DuckDB side) and Spark query.

The driver's correctness harness may collect DuckDB results via pandas /
arrow, where HUGEINT (any SUM over integers) and DECIMAL surface as
float64 / decimal128 instead of int64 — normalizing "5" into "5.0" and
breaking the value hash even when the data is identical. This sweep flags
any declared query whose oracle output column is not a clean
int/double/varchar/date/timestamp, and any Spark output that is a
decimal, so both sides always collect to the same primitive types.

Usage: python scripts/audit_types.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

from waterbear_spark.queries.catalog import ORACLE_SQL, QUERIES
from waterbear_spark.queries.tables import TABLES

CLEAN_DUCK = {
    "BIGINT", "INTEGER", "SMALLINT", "TINYINT", "DOUBLE", "FLOAT",
    "VARCHAR", "DATE", "TIMESTAMP", "TIMESTAMP_NS", "BOOLEAN",
    "TIMESTAMP WITH TIME ZONE",
}


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    flagged = []
    for name in sorted(QUERIES):
        sql = ORACLE_SQL.get(name)
        if sql is None:
            continue
        try:
            rel = con.sql(sql)
            cols, types = rel.columns, [str(t) for t in rel.types]
        except Exception as err:
            flagged.append((name, f"oracle error: {err}"))
            continue
        bad = [
            f"{c}:{t}" for c, t in zip(cols, types)
            if t not in CLEAN_DUCK and not t.startswith("VARCHAR")
            and not t.startswith("LIST") and not t.startswith("STRUCT")
        ]
        if bad:
            flagged.append((name, "duck types " + ", ".join(bad)))

    for name, msg in flagged:
        print(f"FLAG  {name}: {msg}")
    print(f"\n{len(flagged)} flagged of {len(ORACLE_SQL)} oracles")
    sys.exit(1 if flagged else 0)


if __name__ == "__main__":
    main()
