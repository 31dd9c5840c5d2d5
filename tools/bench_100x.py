"""The bench protocol's 100x store-scale sections, extracted from
bench.py (VERDICT r16 task 7 / r17 task 6: bench.py must stay
auditable as it grows protocol). These are the committed measurement
procedures for the three 100x points — q48_100x (DSim similarity
pipeline at a 350k-doc store), q33_100x (DS-Join equi pipeline at a
2M-row store), dedup_100x (LSH pair generation + clustering at 500k
docs) — imported and re-exported by bench.py, so ``bench._q48_100x``
etc. remain the stable entry points (tools/judge_repro.py and the
isolated-subprocess code strings use them).

All protocol history and committed envelopes: BASELINE.md r11-r18.
No module-level ``import bench`` (bench imports this module at load
time); each function imports it lazily for the shared probe/cache
helpers.
"""

from __future__ import annotations

import json
import os
import sys
import time

def _q48_100x(
    spark, d100: str, deadline: float | None = None, reduced: bool = False
) -> dict:
    """One steady-state batch of the semi-stream similarity pipeline
    against a 100x store (350k stored docs, the dedup_100x corpus)
    with the HEADLINE's per-batch probe volume (~500 docs): the
    reference's own scaling claim is that its cached design's
    advantage grows with DB size while per-batch query volume stays
    fixed (DSim-Join/README.md:14), so this is the axis a 100x audit
    must measure. The store build is timed separately (the amortized
    one-time cost); batch_s is the MIN of two steady batches — a
    single batch is one host hiccup away from garbage (r11) — and
    batch 0 primes cache state, JIT, and the attributor baseline."""
    from fractions import Fraction

    from pyspark.sql import functions as F

    from distributed_stream_processing_spark.functions.text import tokens
    from distributed_stream_processing_spark.operators import (
        semi_stream_similarity as sss,
    )

    t = Fraction(3, 4)
    docs = spark.read.parquet(os.path.join(d100, "documents.parquet"))
    base = docs.select(F.col("doc_id").alias("id"), tokens("text").alias("tokens"))
    stored = base.filter(F.col("id") % 10 >= 3)  # ~350k docs
    # probe batches of ~500 docs each (the sf0.1 headline's per-batch
    # volume), DISJOINT id classes so every timed batch is fresh
    # misses (re-probing a used class times the warm hit path —
    # ADVICE r14): warm-up ≡0; timed steady ≡1 (excluding the b10
    # ids < 10,000) and ≡501 — both planted-exact-dup classes, so
    # every probe doc verifies a stored match; retry batches (>30%
    # disagreement only) ≡50/≡550 — planted NEAR-dup slots (J≈0.9 ≥
    # the 0.75 threshold), same candidate volume, real output.
    # Class map rationale: BASELINE.md r14/r15.
    def _probe_batch(cls: int, lo: int = 0):
        return base.filter(
            (F.col("id") % 10 < 3)
            & (F.col("id") % 1000 == cls)
            & (F.col("id") >= lo)
        )

    probes = [
        _probe_batch(0),
        _probe_batch(1, lo=10_000),
        _probe_batch(501),
        _probe_batch(50),
        _probe_batch(550),
    ]
    # the index build is the amortized one-time cost (the reference
    # holds its signature collection in a durable store and never
    # re-indexes per run) — persist it beside the fixture so only the
    # FIRST bench run on a host pays the ~146s build; later runs load
    # parquet (~15s) and the section fits the budget
    store_path = os.path.join(d100, "q48store")
    t0 = time.monotonic()
    j = None
    # gate on groups/ — save_similarity_store writes it LAST, so its
    # presence is the completion sentinel (a run killed mid-save
    # leaves sigs/ without groups/ — r15 hit exactly that)
    if os.path.isdir(os.path.join(store_path, "groups")):
        try:
            # (r15: no sig_store count — the flat store is no longer
            # cached; kv/rep/freq are materialized inside the load)
            j = sss.load_similarity_store(spark, store_path, t)
            built = False
        except Exception as e:
            # layout mismatch OR partial/corrupt store — rebuild below
            # (and drop the stale store + its derived cand cache)
            print(f"# q48 100x saved store stale: {e}", file=sys.stderr)
            import shutil

            shutil.rmtree(store_path, ignore_errors=True)
            j = None
    if j is None:
        # build_similarity_store derives the directory + pricing
        # artifacts and unpersists the flat store (r15) — re-cache it
        # around the ONE-TIME save + first-run cand audit, or both
        # would re-run the full signature emission; the finally block
        # unpersists it again
        store = sss.build_similarity_store(stored, t)
        store.sig_store.cache()
        j = sss.SemiStreamSimilarityJoin(
            stored=None, threshold=t, artifacts=store
        )
        sss.save_similarity_store(j, store_path)
        built = True
    index_s = round(time.monotonic() - t0, 3)
    try:
        j.process_batch(probes[0], 0).write.mode("overwrite").format(
            "noop"
        ).save()
        j.flush_attribution()
        batch_runs, n_outs = [], []
        # min-of-2 with the dedup-style >30% disagreement retry
        # (VERDICT r14 task 6: [7.19, 12.90] published a 2.4x-span
        # envelope because one of two runs rode a session-pressure
        # spike); retries burn the ≡50/≡550 near-dup batches
        b = 1
        while len(batch_runs) < 2 or (
            len(batch_runs) < 4
            and b < len(probes)
            and abs(batch_runs[-1] - batch_runs[-2])
            > 0.3 * min(batch_runs[-2:])
            and (
                deadline is None
                or time.monotonic() < deadline
                # the FIRST retry ignores the (soft) deadline: a point
                # that can afford 2 batches can afford a third on a
                # >30% disagreement — r17's reduced point published
                # min-of-2 over legs disagreeing 4x ([6.04, 25.05])
                # because the squeezed deadline suppressed exactly
                # this retry (VERDICT r17 item 2)
                or len(batch_runs) == 2
            )
        ):
            t0 = time.monotonic()
            out = j.process_batch(probes[b], b)
            n_outs.append(out.count())
            j.flush_attribution()
            batch_runs.append(round(time.monotonic() - t0, 3))
            b += 1
        # EVERY timed batch must verify pairs (the probe sets carry
        # planted exact or near dups) — a zero means fixture drift and
        # the published batch_s would be timing a match-free workload
        assert min(n_outs) > 0, (
            f"timed probe batch verified no pairs (fixture drift?): {n_outs}"
        )
        if reduced:
            # budget-squeezed rotation tail (r17): publish the steady
            # batch pair WITHOUT the b10 pair + cand audit — those are
            # judge-reproduced maintenance that returns on the next
            # even round — instead of shedding the whole point
            return {
                ("build_s" if built else "load_s"): index_s,
                "batch_s": min(batch_runs),
                "batch_runs": batch_runs,
                "out_rows": min(n_outs),
                "reduced": 1,
            }
        # deduped candidate-pair count for the steady batch's probe —
        # the workload-growth denominator for reading batch_s. It is
        # DETERMINISTIC on the fixed fixture, so it is computed once
        # per host and cached beside the store (one extra job on the
        # first run only, outside the timed window either way)
        # v2: batch 1's probe set changed in r15 (the b10 ids are
        # excluded so the reference-regime point has real misses —
        # ADVICE r14) and the fp key only covers engine files, so the
        # old cache name must not be reused
        cand_cache = os.path.join(store_path, "cand_v2.json")
        import bench  # shared fp-cache helpers

        cached = bench._load_fp_cache(cand_cache)
        if cached is not None:
            n_cand = cached["cand"]
        else:
            # the pipeline's ACTUAL probe path (V-selection + b_kind
            # targeting), not the raw signature join — the published
            # workload denominator must describe the engine as run
            probe_rows = j._probe_rows(probes[1])
            n_cand = (
                j.sig_store.join(F.broadcast(probe_rows), sss._KEY + ["b_kind"])
                .filter(j._pair_filter)
                .select("a_id", "b_id")
                .dropDuplicates(["a_id", "b_id"])
                .count()
            )
            with open(cand_cache, "w") as f:
                json.dump(
                    {"fp": bench._code_fingerprint(), "cand": n_cand}, f
                )
        # the REFERENCE-REGIME batch: DSim's claim is fixed SMALL
        # per-batch query volume against a growing DB (~10 queries/
        # batch, DSim-Join/README.md:14 + its shipped log). Min-of-2
        # over two FRESH-miss ~10-doc classes untouched by every
        # other batch: exact-dup ≡1 mod 1000 (<10k) and near-dup
        # ≡150 mod 1000 (<10k) — so both runs genuinely miss and
        # exercise the key-directory fetch, not the warm hit path
        # (defect history: ADVICE r14 medium, VERDICT r15 item 4).
        b10_runs = []
        for i, cls in enumerate((1, 150)):
            small = base.filter(
                (F.col("id") % 10 < 3)
                & (F.col("id") % 1000 == cls)
                & (F.col("id") < 10_000)
            )
            t0 = time.monotonic()
            n_small = j.process_batch(small, b + i).count()
            j.flush_attribution()
            b10_runs.append(round(time.monotonic() - t0, 3))
            assert n_small > 0, "reference-regime batch verified no pairs"
        b10_s = min(b10_runs)
        # stored_docs / probe_docs re-emitted as measured counts
        # (ADVICE r13: the 100x blocks dropped the r11 schema's keys);
        # cand is batch 1's probe; the two timed probe sets are
        # symmetric (500 planted exact dups each), so it describes
        # both batches' workload — out_rows (min over the batches)
        # pins that symmetry.
        return {
            ("build_s" if built else "load_s"): index_s,
            "batch_s": min(batch_runs),
            "batch_runs": batch_runs,
            "b10_s": b10_s,
            "b10_runs": b10_runs,
            "cand": n_cand,
            "out_rows": min(n_outs),
            "stored_docs": stored.count(),
            "probe_docs": probes[1].count(),
        }
    finally:
        j.close()  # releases cache/LRU state pins (r15)
        for df in (j.sig_store, j.kv_store, j.rep_store, j.sig_freq):
            if df is not None:
                df.unpersist()


def _q33_100x(spark, deadline: float | None = None) -> dict:
    """Steady-state batches of the DS-Join equi pipeline against a
    100x store (2M part-like rows vs sf0.1's 20k) at the HEADLINE's
    per-batch probe volume (150k rows): the reference's central claim
    axis is that the cached design's advantage grows with DB size
    while per-batch query volume stays fixed (DS-Join/README.md:13-14,
    the axis the r14 verdict marked q33 weak for lacking). Probes are
    key-arithmetic, no stream fixture: 70% of each batch draws the
    same 200k-key hot working set (cache hits from batch 1 on), 30%
    comes from a batch-disjoint fresh band (guaranteed misses) — so a
    steady batch exercises hit join, miss detect, store fetch, and
    state upkeep in one measured window. The published batch_s is
    min-of-2 with the dedup-style >30% disagreement retry (retries use
    further fresh bands — a repeat of a used band would re-probe
    cached keys and time the hit path instead). b1k_s is the
    fixed-small-volume point (1k fresh keys — the reference's own
    ~per-batch regime); fetch_share is the controller's MEASURED
    store-fetch fraction over the timed batches."""
    from pyspark.sql import functions as F

    from distributed_stream_processing_spark.operators.semi_stream_join import (
        SemiStreamJoin,
    )
    from tools.gen_stress_sf1 import ensure_q33_100x

    d = ensure_q33_100x()
    t0 = time.monotonic()
    store = (
        spark.read.parquet(os.path.join(d, "part_100x.parquet"))
        .withColumnRenamed("p_partkey", "k")
        .cache()
    )
    n_store = store.count()
    load_s = round(time.monotonic() - t0, 3)
    HOT, FRESH, HOT_SET = 105_000, 45_000, 200_000

    def probe(b: int):
        hot = spark.range(HOT).select(
            (F.col("id") * 2654435761 % HOT_SET).alias("k")
        )
        fresh = spark.range(FRESH).select(
            (HOT_SET + b * FRESH + F.col("id")).alias("k")
        )
        return hot.unionByName(fresh).withColumn("v", F.lit(1))

    j = SemiStreamJoin(store=store, key="k")
    try:
        # warm-up batch: fetches the hot set, primes JIT + the
        # attributor's accumulator baseline (batch 0's split is the
        # estimate by design)
        j.process_batch(probe(0), 0).count()
        j.flush_attribution()
        batch_runs, n_outs = [], []
        b = 1
        while len(batch_runs) < 2 or (
            len(batch_runs) < 4
            and abs(batch_runs[-1] - batch_runs[-2])
            > 0.3 * min(batch_runs[-2:])
            and (deadline is None or time.monotonic() < deadline)
        ):
            t0 = time.monotonic()
            out = j.process_batch(probe(b), b)
            n_outs.append(out.count())
            j.flush_attribution()
            batch_runs.append(round(time.monotonic() - t0, 3))
            b += 1
        # every probe key exists in the store — a zero-output batch
        # means the probe arithmetic drifted off the key space
        assert min(n_outs) == HOT + FRESH, f"unexpected out rows {n_outs}"
        # measured fetch share over the timed batches (the controller
        # history is the engine's own phase split; batch 0 excluded —
        # its split is the designed estimate)
        hist = [t for t in j.controller.history if t.batch_id >= 1 and t.measured]
        fetch_share = None
        if hist:
            tot = sum(t.store_fetch_s + t.cache_maintain_s + t.join_s for t in hist)
            if tot > 0:
                fetch_share = round(
                    sum(t.store_fetch_s for t in hist) / tot, 3
                )
        # the reference-regime fixed-volume point: 1k fresh keys
        # (misses, directory-less store fetch) — the marginal batch
        # cost at small volume against the 100x store
        small = spark.range(1_000).select(
            (HOT_SET + 20 * FRESH + F.col("id")).alias("k")
        ).withColumn("v", F.lit(1))
        t0 = time.monotonic()
        n_small = j.process_batch(small, b).count()
        j.flush_attribution()
        b1k_s = round(time.monotonic() - t0, 3)
        assert n_small == 1_000
        return {
            "load_s": load_s,
            "batch_s": min(batch_runs),
            "batch_runs": batch_runs,
            "b1k_s": b1k_s,
            "fetch_share": fetch_share,
            "store_rows": n_store,
            "probe_rows": HOT + FRESH,
            "miss_keys": FRESH,
        }
    finally:
        j.close()
        store.unpersist()


def _dedup_100x(
    spark,
    deadline: float | None = None,
    reduced: bool = False,
    partial_emit: bool = False,
) -> dict:
    """100x dedup posture: LSH pair generation + duplicate clustering
    on 500k docs (100x the bench corpus, linear-output fixture) —
    confirms near-linear LSH scaling and logs the label-propagation
    round count (pointer jumping keeps it O(log component diameter)).

    Published numbers are MIN-OF-2 with a settle+GC before each timed
    run (single cold runs carried session-position noise spanning 4x —
    band history: BASELINE.md r14 + the r17 page-cache-bimodality
    addendum). The second run is dropped (not the point) when the
    tail budget is short.

    ``reduced`` (r18, VERDICT r17 task 2): pairs-only min-of-2 — the
    cluster stage is skipped and the dict carries ``reduced: 1`` —
    the degraded-window fallback q48_100x already had. Three rounds
    ran without a diffable dedup number (r15 throttled, r16
    budget-skipped, r17 attempted-but-timeout); the warm pairs floor
    is ~25 s, which fits any window that can run q48_100x.

    ``partial_emit`` (r18): after EVERY completed timed run, print a
    flushed ``DEDUP_JSON=...`` line with the numbers so far (tagged
    ``partial: 1``). The isolated-subprocess wrapper salvages the
    LAST such line from a timed-out subprocess's captured stdout —
    the r18 dry runs showed a squeezed cap discarding a subprocess
    that had already finished a valid pairs run, publishing a fourth
    {attempted, timeout} instead of the number it measured."""
    from fractions import Fraction

    from pyspark.sql import functions as F

    from distributed_stream_processing_spark.functions.text import tokens
    from distributed_stream_processing_spark.operators.dedup import (
        duplicate_clusters,
        minhash_lsh_dedup,
    )
    from tools.gen_stress_sf1 import ensure_dedup_100x

    import bench  # shared GC/settle helper

    d100 = ensure_dedup_100x()
    docs = spark.read.parquet(os.path.join(d100, "documents.parquet"))
    toks = docs.select(
        F.col("doc_id").alias("id"), tokens("text").alias("tokens")
    )
    n_docs = docs.count()
    pair_runs: list[float] = []
    cluster_runs: list[float] = []
    n_pairs = n_keep = rounds = None

    def _emit_partial() -> None:
        # progress checkpoint for the isolated wrapper's timeout
        # salvage: the LAST flushed line wins, so each emission
        # supersedes the previous. A pairs-only checkpoint is a
        # reduced-shape point; once a cluster run lands it upgrades
        # to the full shape (still tagged partial until the final
        # return-path line replaces it).
        if not partial_emit:
            return
        part: dict = {
            "pairs_s": min(pair_runs),
            "pairs_runs": list(pair_runs),
            "n_pairs": n_pairs,
            "n_docs": n_docs,
            "partial": 1,
        }
        if cluster_runs:
            part["cluster_s"] = min(cluster_runs)
            part["rounds"] = rounds
            part["kept"] = n_keep
        else:
            part["reduced"] = 1
        print("DEDUP_JSON=" + json.dumps(part), flush=True)

    for run in range(2):
        time.sleep(2)
        bench._gc_level(spark)
        t0 = time.monotonic()
        pairs = minhash_lsh_dedup(toks, Fraction(4, 5)).localCheckpoint(
            eager=False
        )
        n_pairs_run = pairs.count()
        pair_runs.append(round(time.monotonic() - t0, 3))
        assert n_pairs is None or n_pairs == n_pairs_run  # deterministic
        n_pairs = n_pairs_run
        _emit_partial()
        if not reduced:
            stats: dict = {}
            t0 = time.monotonic()
            clusters = duplicate_clusters(
                docs.select(F.col("doc_id").alias("id")), pairs, stats=stats
            )
            n_keep = clusters.filter("keep").count()
            cluster_runs.append(round(time.monotonic() - t0, 3))
            rounds = stats.get("rounds")
            assert n_keep > 0
            _emit_partial()
        if run == 0 and deadline is not None and time.monotonic() > deadline:
            break
    # convergence retry (same rule as the stress points): a >30%
    # disagreement between the two timed runs is a session-pressure
    # spike on one of them, not steady state — buy one more run when
    # the budget allows (probe-blind pressure slows multi-second jobs
    # 2-5x while 1 s probes read clean)
    while (
        len(pair_runs) >= 2
        and len(pair_runs) < 4
        and abs(pair_runs[-1] - pair_runs[-2]) > 0.3 * min(pair_runs[-2:])
        and (deadline is None or time.monotonic() < deadline)
    ):
        time.sleep(2)
        bench._gc_level(spark)
        t0 = time.monotonic()
        pairs = minhash_lsh_dedup(toks, Fraction(4, 5)).localCheckpoint(
            eager=False
        )
        assert pairs.count() == n_pairs
        pair_runs.append(round(time.monotonic() - t0, 3))
        _emit_partial()
    # the SAME disagreement rule for the cluster stage (ADVICE r14:
    # cluster_s was min-of-2 with no retry, so a pressure spike
    # hitting both timed cluster runs published an unconverged number
    # against the committed band) — re-clusters the already-verified
    # pair set, so each retry is one label-propagation run
    while (
        len(cluster_runs) >= 2
        and len(cluster_runs) < 4
        and abs(cluster_runs[-1] - cluster_runs[-2])
        > 0.3 * min(cluster_runs[-2:])
        and (deadline is None or time.monotonic() < deadline)
    ):
        time.sleep(2)
        bench._gc_level(spark)
        t0 = time.monotonic()
        clusters = duplicate_clusters(
            docs.select(F.col("doc_id").alias("id")), pairs, stats={}
        )
        assert clusters.filter("keep").count() == n_keep
        cluster_runs.append(round(time.monotonic() - t0, 3))
        _emit_partial()
    # n_docs/kept re-emitted (ADVICE r13: the 100x blocks dropped the
    # r11 schema's keys; programmatic readers saw missing fields)
    if reduced:
        return {
            "pairs_s": min(pair_runs),
            "pairs_runs": pair_runs,
            "n_pairs": n_pairs,
            "n_docs": n_docs,
            "reduced": 1,
        }
    return {
        "pairs_s": min(pair_runs),
        "pairs_runs": pair_runs,
        "n_pairs": n_pairs,
        "cluster_s": min(cluster_runs),
        "rounds": rounds,
        "n_docs": n_docs,
        "kept": n_keep,
    }


def _parse_dedup_stdout(out) -> dict | None:
    """Extract the LAST ``DEDUP_JSON=`` line from a dedup subprocess's
    stdout — the subprocess emits a checkpoint after every completed
    timed run and a final line on the return path, each superseding
    the previous, so last-wins is the most-complete point available.
    ``out`` may be ``bytes`` (subprocess.TimeoutExpired captures raw
    output even under ``text=True``) or ``None`` (nothing captured
    before the kill)."""
    if out is None:
        return None
    if isinstance(out, bytes):
        out = out.decode("utf-8", errors="replace")
    best = None
    for ln in out.splitlines():
        if ln.startswith("DEDUP_JSON="):
            try:
                best = json.loads(ln.split("=", 1)[1])
            except ValueError:
                pass  # a line truncated by the kill — keep the prior
    return best


def _dedup_100x_isolated(budget_s: float, reduced: bool = False) -> dict | None:
    """dedup_100x in a FRESH subprocess session (VERDICT r14 task 4):
    the committed [14, 42] band was bimodal purely by session position
    — isolated runs land ≤ ~18 s, runs after the stress audits ride
    the parent session's ContextCleaner backlog into 25-42 s. A fresh
    process measures the point itself, the same isolation the closing
    calibration already uses. Returns the protocol dict, or None if
    the subprocess failed (caller falls back to the in-session run,
    flagged by the published "isolated" key)."""
    import subprocess

    import bench

    # cap 200: a window that can't finish the full protocol inside
    # ~200 s will not produce the full-speed reading the point exists
    # for (calm-window runs measure 60-130 s incl. session startup),
    # and the r16 trial showed a timed-out attempt's budget is simply
    # burned — the cap bounds the waste so the A/B, the 10x trio, and
    # the 100x points survive a degraded window
    budget_s = max(60.0, min(200.0, budget_s))
    code = (
        "import sys,json,time;"
        f"sys.path.insert(0,{bench.REPO!r});"
        "import bench;"
        "from distributed_stream_processing_spark.session import get_spark;"
        "spark=get_spark('bench-dedup');"
        f"r=bench._dedup_100x(spark, deadline=time.monotonic()+{budget_s - 45:.0f}, "
        f"reduced={reduced}, partial_emit=True);"
        "print('DEDUP_JSON='+json.dumps(r))"
    )
    try:
        r = subprocess.run(
            [sys.executable, "-c", code],
            capture_output=True,
            text=True,
            timeout=budget_s,
            env=dict(os.environ),
        )
        out = _parse_dedup_stdout(r.stdout)
        if out is not None:
            return out
        print(
            f"# dedup subprocess gave no DEDUP_JSON (rc={r.returncode}): "
            f"{(r.stderr or '')[-300:]}",
            file=sys.stderr,
        )
    except subprocess.TimeoutExpired as e:
        # TIMEOUT SALVAGE (r18): the subprocess emits a flushed
        # DEDUP_JSON checkpoint after every completed timed run, so a
        # cap kill no longer discards measurements it already took —
        # the r18 dry runs lost a finished pairs run this way twice.
        # The salvaged (partial-tagged) point keeps its raw runs and
        # the window context the caller attaches.
        out = _parse_dedup_stdout(e.stdout)
        if out is not None:
            print(
                f"# dedup subprocess hit its {budget_s:.0f}s cap; "
                "salvaged last partial checkpoint",
                file=sys.stderr,
            )
            return out
        print(f"# dedup subprocess failed: {e}", file=sys.stderr)
    except Exception as e:
        print(f"# dedup subprocess failed: {e}", file=sys.stderr)
    return None

