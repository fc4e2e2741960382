"""The driver captures only the last ~2,000 chars of bench stdout; the
FINAL stdout line is its parse target.  r5 and r7 both lost the round's
machine-readable bench row (BENCH parsed=null) when that line outgrew
the window as the registry added queries.  Pin the budget at the LIVE
registry size with worst-case field values, so adding queries can never
silently break the driver contract again."""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)
import bench  # noqa: E402

from vectorsearch_scylla_spark.plans.registry import REGISTRY  # noqa: E402

TAIL_BUDGET = 1_800  # driver window is ~2,000; leave headroom


def _worst_case_line() -> str:
    # every headline query present, wide float values, the longest
    # names winning the top-N slots, retry_absorbed_top fully populated
    names = sorted(
        [n for n in bench.HEADLINE if n in REGISTRY],
        key=len,
        reverse=True,
    )
    times = {n: 9999.999 - i for i, n in enumerate(names)}
    retry_top = {n: 9999.999 for n in names[:5]}
    return bench.final_line(
        total=999999.999,
        value_canary_normalized=99999.999,
        times=times,
        retry_delta=99999.999,
        retry_top=retry_top,
        canary=[999.999, 999.999],
        sf=0.1,
        retry_stall=99999.999,
        retry_warmup=99999.999,
        canary_skew=999.999,
        degraded_window=True,
    )


def test_bench_final_line_fits_tail():
    line = _worst_case_line()
    assert len(line) < TAIL_BUDGET, (
        f"bench final line is {len(line)} chars at the live registry "
        f"size — shrink FINAL_LINE_TOP_N or drop a field before the "
        f"driver's ~2,000-char tail capture truncates it again"
    )
    assert "\n" not in line


def test_bench_final_line_parses_with_required_fields():
    d = json.loads(_worst_case_line())
    for key in ("metric", "value", "unit", "queries", "sf"):
        assert key in d, key
    assert d["unit"] == "sec"
    assert d["metric"] == "headline_query_wall_time"
    assert len(d["queries"]) <= bench.FINAL_LINE_TOP_N
    assert "value_canary_normalized" in d  # r7 judge item #6


def test_headline_names_resolve():
    """Every headline entry must exist in the registry — a renamed
    query silently vanishing from the bench is a coverage hole."""
    missing = [n for n in bench.HEADLINE if n not in REGISTRY]
    assert not missing, missing
