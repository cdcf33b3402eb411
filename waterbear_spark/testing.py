"""Order-insensitive DataFrame comparison utilities, mirroring the driver
harness (row count + column names + sorted-column value hash)."""

from __future__ import annotations

import hashlib


def norm_cell(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return str(v).lower()
    if isinstance(v, float):
        if v == int(v) and abs(v) < 1e15:
            return f"{v:.1f}"
        return repr(v)
    return str(v)


def row_lines(columns, rows) -> list[str]:
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    return sorted("\x01".join(norm_cell(row[i]) for i in order) for row in rows)


def frame_fingerprint(columns, rows) -> str:
    return hashlib.sha256("\n".join(row_lines(columns, rows)).encode()).hexdigest()


def compare_frames(s_cols, s_rows, d_cols, d_rows) -> list[str]:
    """Return a list of problems (empty == frames match)."""
    problems = []
    if sorted(s_cols) != sorted(d_cols):
        problems.append(f"columns {sorted(s_cols)} != {sorted(d_cols)}")
    elif len(s_rows) != len(d_rows):
        problems.append(f"row count {len(s_rows)} != {len(d_rows)}")
    elif frame_fingerprint(s_cols, s_rows) != frame_fingerprint(d_cols, d_rows):
        problems.append("value hash mismatch")
    return problems
