"""Guard-rail tests for tools/rotate_window.py --write (r5 ADVICE):
a bad stamp silently rewrites the rotation manifest, so every refusal
path must fire BEFORE any file is touched."""

from __future__ import annotations

import json
import os
import shutil
import sys

import pytest

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools")
)
import rotate_window  # noqa: E402

from vectorsearch_scylla_spark.plans import registry  # noqa: E402


@pytest.fixture()
def tmp_manifest(tmp_path, monkeypatch):
    """Point the tool at a COPY of the real manifest so no test can
    ever touch the committed rotation history."""
    dst = tmp_path / "window_history.json"
    shutil.copy(rotate_window.MANIFEST, dst)
    monkeypatch.setattr(rotate_window, "MANIFEST", str(dst))
    with open(dst) as f:
        return str(dst), json.load(f)


def _run(monkeypatch, *argv) -> int:
    monkeypatch.setattr(sys, "argv", ["rotate_window.py", *argv])
    return rotate_window.main()


def test_write_rejects_non_successor_round(tmp_manifest, monkeypatch, capsys):
    path, hist = tmp_manifest
    before = open(path).read()
    for bad in (hist["round"], hist["round"] - 1, hist["round"] + 2):
        assert _run(monkeypatch, "--write", str(bad)) == 1
        assert "refusing --write" in capsys.readouterr().out
        assert open(path).read() == before  # untouched


def test_write_rejects_missized_window(tmp_manifest, monkeypatch, capsys):
    path, hist = tmp_manifest
    before = open(path).read()
    monkeypatch.setattr(registry, "DRIVER_WINDOW", registry.DRIVER_WINDOW[:49])
    assert _run(monkeypatch, "--write", str(hist["round"] + 1)) == 1
    assert "49 entries" in capsys.readouterr().out
    assert open(path).read() == before


def test_write_rejects_new_query_outside_window(tmp_manifest, monkeypatch, capsys):
    """A brand-new registered query not placed in DRIVER_WINDOW used to
    get a fabricated 'checked last round' stamp (last.get(n, rnd-1)),
    silently defeating the new-query-must-enter-window rule."""
    path, hist = tmp_manifest
    before = open(path).read()
    trimmed = dict(hist)
    trimmed["last_in_window"] = {
        n: r
        for n, r in hist["last_in_window"].items()
        if n not in registry.DRIVER_WINDOW[:1]
    }
    # drop one in-window query from the manifest: it is "new" AND in
    # the window — allowed.  Then ALSO pretend an out-of-window query
    # is new — must refuse.
    out_of_window = next(
        n for n in registry.REGISTRY if n not in registry.DRIVER_WINDOW
    )
    trimmed["last_in_window"] = {
        n: r for n, r in trimmed["last_in_window"].items() if n != out_of_window
    }
    with open(path, "w") as f:
        json.dump(trimmed, f)
    before = open(path).read()
    assert _run(monkeypatch, "--write", str(hist["round"] + 1)) == 1
    out = capsys.readouterr().out
    assert "MUST enter the window" in out and out_of_window in out
    assert open(path).read() == before


def test_report_mode_never_writes(tmp_manifest, monkeypatch):
    path, _ = tmp_manifest
    before = open(path).read()
    _run(monkeypatch)  # report mode, no --write
    assert open(path).read() == before


def test_sort_key_survives_exotic_eq():
    """oracle._sort_key must not raise when a cell's __eq__ returns a
    non-bool (e.g. a numpy array leaking into a collected row) — the
    isinstance check must run before the NaN-sentinel equality."""
    import numpy as np

    from vectorsearch_scylla_spark.oracle import _sort_key, compare_results

    row = (np.array([1.0, 2.0]), 1)
    key = _sort_key(row)  # must not raise TypeError
    assert key[1] == (0, 1)
    # and the full gate reports a mismatch instead of raising
    ok, reason = compare_results(
        ["a", "b"], [(np.array([1.0]), 1)], ["a", "b"], [("x", 1)]
    )
    assert not ok and "mismatch" in reason
