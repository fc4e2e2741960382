"""Shared retrain-report contract across index families (r13 VERDICT
task 7).

``maybe_retrain`` (IVF, ``operators/ivf.py``) and ``maybe_retrain_pq``
(``operators/pq.py``) historically emitted structurally different
report dicts, so any tool comparing maintenance days across families —
or even across two deployments of the same family — needed per-family
key maps before it could refuse an apples-to-oranges comparison.  This
module is the one report contract both triggers now emit:

================  ======  ==============================================
key               type    meaning
================  ======  ==============================================
``fired``         bool    a retrain executed this day (and, unless
                          ``rolled_back``, was adopted)
``rolled_back``   bool    the rollback rail rejected the retrain — the
                          pre-day model stands; ``metric_after`` carries
                          the REJECTED measurement
``budget``        float   the trigger threshold, in ``audit_metric``
                          units
``audit_metric``  str     what ``metric_before``/``metric_after``
                          measure: ``"id_set"`` (id-set recall@k) or
                          ``"tie_aware"`` (tie-tolerant precision) —
                          the two modes of ``pq_recall_audit`` /
                          ``ivf_recall_audit``'s single mode
``metric_before`` float?  the entry audit (None: audit drew no pairs)
``metric_after``  float?  the post-retrain audit (None: not audited —
                          ``audit_after=False`` deployments audit the
                          persisted artifact instead)
================  ======  ==============================================

Family diagnostics ride alongside under their own names (``nprobe`` /
``k_before``/``k_after`` for IVF, ``m``/``ksub`` for PQ, ``k``,
``n_audit_pairs``, ``n_corpus``) — useful, but NOT the contract.  The
pre-r14 family spellings (``retrained``, ``recall_budget``,
``recall_before``, ``recall_after``) remain as read-only aliases for
existing consumers; writers must keep alias and contract key in sync
(both trigger functions set them pairwise at the same line).

Mechanical comparability (the ``tools/compare_bench.py`` rule extended
to maintenance days): :func:`check_reports_comparable` refuses mixed
``audit_metric`` or mixed ``k`` — averaging a recall with a precision,
or recall@5 with recall@10, is a unit error a dashboard must refuse
rather than silently blend (the r12 tie-domination lesson: the two
metrics disagree by 0.16 ABSOLUTE on the same healthy state).
"""

from __future__ import annotations


def retrain_report(
    *,
    fired: bool,
    budget: float,
    audit_metric: str,
    metric_before: float | None,
    metric_after: float | None = None,
    rolled_back: bool = False,
    **extras,
) -> dict:
    """Build a contract-conforming retrain report.  ``extras`` are the
    family diagnostics; legacy aliases are derived here so every
    report is born consistent (mutating callers must update alias and
    contract key together)."""
    return {
        "fired": bool(fired),
        "rolled_back": bool(rolled_back),
        "budget": float(budget),
        "audit_metric": str(audit_metric),
        "metric_before": metric_before,
        "metric_after": metric_after,
        # legacy family spellings (pre-r14 consumers)
        "retrained": bool(fired),
        "recall_budget": float(budget),
        "recall_before": metric_before,
        "recall_after": metric_after,
        **extras,
    }


def check_reports_comparable(reports) -> None:
    """Refuse a cross-report comparison whose members measured
    different things — mixed ``audit_metric`` (recall vs tie-tolerant
    precision) or mixed ``k`` (recall@5 vs recall@10).  Raises
    ``ValueError`` naming the offending mixture; returns None when the
    set is comparable.  Budgets MAY differ (thresholds are policy, not
    units)."""
    reports = list(reports)
    metrics = {r.get("audit_metric") for r in reports}
    if len(metrics) > 1:
        raise ValueError(
            f"retrain reports are not comparable: mixed audit_metric "
            f"{sorted(map(str, metrics))} — a recall and a tie-tolerant "
            "precision are different units (they disagree by ~0.16 "
            "absolute on the same state; see BENCH_SCALE 'In-stream PQ "
            "refresh day')"
        )
    ks = {r.get("k") for r in reports if r.get("k") is not None}
    if len(ks) > 1:
        raise ValueError(
            f"retrain reports are not comparable: mixed audit k "
            f"{sorted(ks)} — recall@{min(ks)} and recall@{max(ks)} are "
            "different units"
        )
