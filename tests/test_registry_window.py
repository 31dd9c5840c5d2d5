"""The driver's correctness card holds only the FIRST 50 registered
queries (registration order). Pin the budget so a new registration can
never silently push a gate off the card again (this happened in rounds
5 AND 6 — VERDICT r6 'What's wrong' #3)."""

from __future__ import annotations

from distributed_stream_processing_spark.plans import load_all

CARD_ROWS = 50


def test_registry_within_card_window():
    specs = load_all()
    assert len(specs) <= CARD_ROWS, (
        f"{len(specs)} queries registered but the driver cards only the "
        f"first {CARD_ROWS}; retire or merge a subsumed query "
        "(see relational.py q03-q06/q08 retirement comments)"
    )


def test_newest_gates_on_card():
    # the queries that fell off the card in rounds 5-6, plus round 7's
    # DP-segmenter gate — all must be registered (and, by the budget
    # above, inside the window)
    specs = load_all()
    for name in (
        "q56_dedup_clusters",
        "q57_dedup_spans",
        "q58_repetition_signals",
        "q59_subseq_match_dp",
        "q60_stream_watermark_late_data",
    ):
        assert name in specs, f"{name} missing from registry"
        assert specs[name].oracle, f"{name} must carry an exact oracle"
