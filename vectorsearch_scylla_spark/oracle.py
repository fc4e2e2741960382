"""Shared oracle-comparison helpers — the ONE normalization used by
every local replica of the external driver's correctness gate (the
pytest parity suite and the CLI ``--check`` flag), so the two gates
can never drift apart.

Gate semantics (mirrors the driver): compare column-name sets, row
counts, and an order-insensitive multiset of rows with columns sorted
by name and floats normalized (NaN sentinel, -0.0 collapsed, rounded
to 9 places to absorb 1-ulp printing differences).
"""

from __future__ import annotations

import math
from collections.abc import Sequence


def norm_value(v):
    """Normalize one cell for comparison across engines."""
    # bool before float: bool is not a float but keep the explicit
    # branch so bools never fall into numeric normalization if an
    # engine returns numpy.bool_ (which IS comparable to bool)
    if isinstance(v, bool):
        return bool(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # collapse -0.0 and re-round to absorb 1-ulp printing differences
        return round(v + 0.0, 9)
    return v


def _sort_key(row: tuple) -> tuple:
    # None is not orderable against floats/strs in Python 3 — a nullable
    # column with mixed None/value rows would make plain sorted() raise
    # TypeError instead of reporting a mismatch.  Likewise the "NaN"
    # string sentinel norm_value emits is unorderable against the
    # floats in a column's other rows.  Sort None last and the NaN
    # sentinel just before it via tags; non-tagged ordering (and row
    # EQUALITY, which uses the rows themselves) is unchanged.
    def key(v):
        if v is None:
            return (2, "")
        # isinstance FIRST: a value whose __eq__ returns a non-bool
        # (e.g. a numpy array leaking into a collected row) must fall
        # through to the mismatch report, not raise here
        if isinstance(v, str) and v == "NaN":
            return (1, "")
        return (0, v)

    return tuple(key(v) for v in row)


def row_multiset(rows: Sequence[tuple], colnames: Sequence[str]) -> list[tuple]:
    """Sorted multiset of rows with columns reordered by column name."""
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    return sorted(
        (tuple(norm_value(r[i]) for i in order) for r in rows), key=_sort_key
    )


def compare_results(
    spark_cols: Sequence[str],
    spark_rows: Sequence[tuple],
    duck_cols: Sequence[str],
    duck_rows: Sequence[tuple],
) -> tuple[bool, str]:
    """Full gate: (ok, reason).  reason is '' when ok."""
    if sorted(spark_cols) != sorted(duck_cols):
        return False, f"column mismatch: {sorted(spark_cols)} vs {sorted(duck_cols)}"
    if len(spark_rows) != len(duck_rows):
        return False, f"row count: spark {len(spark_rows)} vs oracle {len(duck_rows)}"
    ms = row_multiset(spark_rows, spark_cols)
    md = row_multiset(duck_rows, duck_cols)
    if ms != md:
        diffs = [(a, b) for a, b in zip(ms, md) if a != b][:5]
        return False, f"value mismatch, first diffs: {diffs}"
    return True, ""
