"""Dump physical-plan quality features for the headline queries.

Usage: PYTHONPATH=. python tools/explain_plans.py > PLANS.md

Checks the properties the engine's scale design promises: dimension
joins broadcast, filters pushed to the parquet scan, columns pruned,
no accidental nested-loop or sort-merge joins.
"""

from __future__ import annotations

import re
import sys

from distributed_stream_processing_spark.plans import load_all
from distributed_stream_processing_spark.session import get_spark

SF_DIR = "/root/testdata/sf0.01"

# every registered query (PLANS.md rows == the registry card,
# VERDICT r10 task 5); queries that drain internally (semi-stream
# pipelines, streaming sinks) show the plan of their RESULT — their
# per-batch actions get their own section below


def features(plan: str) -> dict:
    reads = re.findall(r"ReadSchema: struct<([^>]*)>", plan)
    return {
        "broadcast_hash_joins": plan.count("BroadcastHashJoin"),
        "sort_merge_joins": plan.count("SortMergeJoin"),
        "nested_loop_joins": plan.count("BroadcastNestedLoopJoin"),
        "exchanges": plan.count("Exchange"),
        "pushed_filters": "PushedFilters: [" in plan
        and "PushedFilters: []" not in plan,
        "scan_widths": [len(s.split(",")) for s in reads if s],
    }


def plan_texts(df) -> tuple[str, str]:
    """(per_run, cached) node text of the EXECUTED plan.

    ``executedPlan().toString()`` is the wrong thing to count features
    on: inner AdaptiveSparkPlans print their Initial plan next to the
    Final one (double-counting every exchange), and InMemoryRelation
    prints its full build plan — work that executed ONCE at cache
    time, not per run (r11 read q59 as '27 exchanges / 18 scans' when
    its per-run plan has 3 exchanges and 2 cached-index scans; VERDICT
    r11 task 6 chased a plan shape that never executes). This walks
    the final executed tree only, descends AQE stages to their final
    plans, does NOT re-expand ReusedExchange (it executes once), and
    routes InMemoryTableScan's cached build subtree into the separate
    ``cached`` text."""
    root = df._jdf.queryExecution().executedPlan()
    per_run: list[str] = []
    cached: list[str] = []
    stack = [(root, False)]
    while stack:
        node, in_cache = stack.pop()
        name = node.nodeName()
        buf = cached if in_cache else per_run
        # scans carry PushedFilters/ReadSchema in their simpleString;
        # ReusedExchange executes no per-run shuffle work, and its
        # literal name would inflate the substring-based exchange
        # count — record it under a non-matching label
        if name.startswith("Scan"):
            buf.append(node.simpleString(25))
        elif name == "ReusedExchange":
            buf.append("ReusedXchg")
        else:
            buf.append(name)
        if name == "AdaptiveSparkPlan":
            stack.append((node.executedPlan(), in_cache))
            continue
        if name.endswith("QueryStage"):
            stack.append((node.plan(), in_cache))
            continue
        if name == "ReusedExchange":
            continue
        if name == "InMemoryTableScan":
            stack.append((node.relation().cachedPlan(), True))
            continue
        ch = node.children()
        for i in range(ch.length()):
            stack.append((ch.apply(i), in_cache))
    return "\n".join(per_run), "\n".join(cached)


def _captured_batch_plans(spark, specs, name: str) -> list[str]:
    """Run a semi-stream pipeline and capture each micro-batch's
    combined-action executed plan at the attribution seam — the only
    place the per-batch plan is reachable (same mechanism as
    tests/test_plan_invariants.py)."""
    from distributed_stream_processing_spark.streaming.plan_timing import (
        PlanTimeAttributor,
    )

    plans: list[str] = []
    orig = PlanTimeAttributor.attribute

    def capture(self, df, *a, **k):
        plans.append(df._jdf.queryExecution().executedPlan().toString())
        return None

    PlanTimeAttributor.attribute = capture
    try:
        specs[name].fn(spark, SF_DIR)
    finally:
        PlanTimeAttributor.attribute = orig
    return plans


def main() -> None:
    spark = get_spark("explain_plans")
    specs = load_all()
    print("# PLANS — physical-plan quality of headline queries (sf0.01)\n")
    print(
        "Counts cover PER-RUN work only (final AQE plans; cached-build "
        "subtrees — executed once at cache time — are the separate "
        "`cached exch` column).\n"
    )
    print(
        "| query | broadcast HJ | sort-merge | nested-loop | exchanges | "
        "pushdown | scan col counts | cached exch |"
    )
    print("|---|---|---|---|---|---|---|---|")
    for name in specs:
        try:
            df = specs[name].fn(spark, SF_DIR)
            per_run, cached_txt = plan_texts(df)
        except Exception as e:
            print(f"| {name} | ERROR: {type(e).__name__} | | | | | | |")
            continue
        f = features(per_run)
        cached_exch = cached_txt.count("Exchange")
        print(
            f"| {name} | {f['broadcast_hash_joins']} | {f['sort_merge_joins']} "
            f"| {f['nested_loop_joins']} | {f['exchanges']} "
            f"| {'yes' if f['pushed_filters'] else '-'} | {f['scan_widths']} "
            f"| {cached_exch or '-'} |"
        )
    # the semi-stream pipelines' plans only exist per batch, INSIDE
    # process_batch (the static rows above can't see them); capture
    # every batch's one combined action through the attribution seam
    print(
        "\n## Per-batch combined actions (semi-stream pipelines)\n\n"
        "| pipeline batch | broadcast HJ | shuffled HJ | sort-merge | "
        "left-semi fetch | in-memory store scan |"
    )
    print("|---|---|---|---|---|---|")
    for name in (
        "q33_semi_stream_cached_join",
        "q48_semi_stream_similarity",
    ):
        for i, plan in enumerate(_captured_batch_plans(spark, specs, name)):
            print(
                f"| {name.split('_')[0]} batch {i} "
                f"| {plan.count('BroadcastHashJoin')} "
                f"| {plan.count('ShuffledHashJoin')} "
                f"| {plan.count('SortMergeJoin')} "
                f"| {'yes' if 'LeftSemi' in plan else '-'} "
                f"| {'yes' if ('InMemoryTableScan' in plan or 'TableCacheQueryStage' in plan) else '-'} |"
            )
    print(
        "\nNotes: q26's nested-loop is the intended broadcast cross-score "
        "(queries × corpus); every dimension join is broadcast; lineitem "
        "scans are column-pruned (5 of 11 columns in q02, 3 in q07). "
        "Similarity/dedup candidate joins shuffle (id, size) rows only; "
        "the token-payload verify joins show up as broadcast HJs (the "
        "per-corpus payload table broadcasts under the 64 MB threshold "
        "at test scale; at 100 TB it becomes a shuffled hash join on the "
        "deduped pair ids, never on signature rows). No sort-merge join "
        "appears in any registered plan or per-batch action. The "
        "per-batch BHJ count GROWS by ~2 per pending batch (r15): the "
        "state is a flat union of the base checkpoint and per-batch "
        "checkpoint-leaf deltas, and Catalyst pushes the hit/miss "
        "semi-joins through the union into each leg (the broadcast "
        "exchange is shared across legs); the growth is BOUNDED by the "
        "compaction cadence min(compact_every=8, controller window), "
        "which folds the legs back into one base.\n\n"
        "State-plan join ladder (operators/skew.bounded_broadcast): the "
        "per-batch state plans compile AQE-off (lazy_local_checkpoint), "
        "so joins against checkpointed state (unknown stats) carry "
        "explicit hints gated on driver-tracked row counts — broadcast "
        "when the set is provably small, SHUFFLE_HASH in the mid tier "
        "(same shuffle bytes as sort-merge, no sorts), and UNHINTED "
        "(spillable sort-merge) above the hash-build bound or when the "
        "bound is unknown, because a shuffled-hash build side cannot "
        "spill. Unhinted unknown-stats joins otherwise compile to "
        "sort-merge — the silent q48 miss-detect SMJ that "
        "tests/test_plan_invariants.py now pins against.\n\n"
        "Width of compute-heavy stages over bytes-small inputs (the "
        "MinHash fold, the prefix join's candidate generation) is kept "
        "by the session's "
        "`spark.sql.adaptive.coalescePartitions.minPartitionSize=64k` "
        "floor rather than explicit repartitions, so those exchanges "
        "stay AQE-managed and skew-join splitting still applies "
        "(round 6; see session.py). q21's remaining extra exchanges are "
        "the round-robin `fan_out` before the signature fold (not on a "
        "join key — no skew impact) plus the band-bucket join's own "
        "exchange."
    )
    sys.stdout.flush()


if __name__ == "__main__":
    main()
