"""Set-similarity join (Jaccard): the engine's DSim-Join equivalent.

The reference implements the Dima (ICDE'17) signature scheme over a
per-partition sort-merge join with a distributed cache
(DSim-Join/src/main/scala/ds_join/DS_SimJoin_stream.scala:701-731,
BuildSig.scala:60-200). This engine keeps the same *semantics*
(exact Jaccard join at threshold t) but plans it Spark-first:

1. candidate generation = prefix-filter explode + equi-join on the
   prefix token (AllPairs/PPJoin family: for ANY global token order,
   two sets with J >= t must share one of each other's first
   ``len - ceil(t*len) + 1`` tokens) — plus the length filter
   t*|x| <= |y| <= |x|/t (same pruning role as the reference's
   multigroup length ranges, BuildSig.scala:125-137);
2. verification = exact integer Jaccard via ``array_intersect``
   (JVM-side, codegen) replacing the reference's verify2 merge count
   (DS_SimJoin_stream.scala:128-250).

Catalyst plans the explode->shuffle->join; AQE handles skewed hot
tokens (the reference needed a custom load-aware partitioner for
this, SimilarityQueryPartitioner.scala).

At 100 TB the candidate join shuffles only (token, id, tokens-array)
rows whose token is in a record *prefix* — with frequency-ascending
token order this is the standard scalable plan; token frequency
ordering is available via ``order="freq"``.
"""

from __future__ import annotations

from fractions import Fraction

import pandas as pd
from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F

from distributed_stream_processing_spark.functions.text import jaccard_parts


def _prefix_len(size_col, t: Fraction):
    # prefix length = |x| - ceil(t*|x|) + 1; ceil(a/b * n) = -floor(-a*n/b)
    return size_col - (-F.floor((-t.numerator * size_col) / F.lit(t.denominator)).cast("int")) + 1


def _token_freq(*dfs: DataFrame) -> DataFrame:
    """One shared token-frequency table over ALL join inputs: prefix-
    filter completeness needs both sides sorted under the same global
    order, so per-side frequencies would silently drop pairs."""
    vocab = dfs[0].select(F.explode("tokens").alias("tok"))
    for d in dfs[1:]:
        vocab = vocab.unionByName(d.select(F.explode("tokens").alias("tok")))
    return vocab.groupBy("tok").count().withColumnRenamed("count", "tok_freq")


def _with_prefix(
    df: DataFrame, t: Fraction, order: str, freq: DataFrame | None = None
) -> DataFrame:
    """Attach sorted token array + exploded prefix tokens."""
    toks = F.col("tokens")
    if order == "freq":
        # global frequency-ascending order: rare tokens first minimizes
        # candidate pairs; any SHARED total order preserves completeness
        # (the caller passes one freq table covering both sides).
        if freq is None:
            freq = _token_freq(df)
        exploded = df.select("id", F.posexplode("tokens").alias("_", "tok")).join(
            F.broadcast(freq), "tok"
        )
        ordered = exploded.groupBy("id").agg(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct(F.col("tok_freq"), F.col("tok")))
                ),
                lambda s: s.tok,
            ).alias("tokens_ord")
        )
        df = df.join(ordered, "id").drop("tokens").withColumnRenamed(
            "tokens_ord", "tokens"
        )
    plen = _prefix_len(F.size(toks), t)
    return df.withColumn("ptok", F.explode(F.slice(toks, 1, plen)))


# plan-build vocab probes memoized per (SparkContext lifetime, input
# plan, max_vocab) — ADVICE r18: the probe is a driver-blocking full
# scan of its inputs, and every non-candidates-only join re-ran it per
# plan build (3 dima queries x several bench runs each). The key uses
# the ANALYZED plan's semanticHash, so the same corpus expression memos
# across plan builds while different corpora never collide; stale
# contexts are evicted via session_key (same regime as _SIM_STORE_MEMO,
# which the r18 verdict reviewed as corpus-level index state, not
# result caching — the probe re-runs from parquet on every fresh
# session/process).
_VOCAB_MEMO: dict[tuple, dict[str, int] | None] = {}


def token_bitmask_dict(*dfs: DataFrame, max_vocab: int = 62) -> dict[str, int] | None:
    """Dictionary-encode the token vocabulary as single-long bitmasks
    when it is small (<= 62 distinct tokens across all inputs).

    On low-cardinality token domains (category tags, controlled
    vocabularies) this turns per-pair set intersection into one
    bit_count(a & b) — O(1) instead of O(|set|) hash-set work — and
    shrinks the candidate shuffle from string arrays to 8 bytes.
    Returns None when the vocabulary is too large (caller keeps the
    general array path).

    Cost control (ADVICE r18): a SAMPLED pre-screen runs first — if
    the first ~20k exploded tokens of the first input already exceed
    ``max_vocab`` distinct values, the exact full-corpus distinct scan
    is skipped entirely (the common big-vocabulary case answers None
    from one tiny job; a skewed sample under the limit just falls
    through to the exact scan, so the result is unchanged). Probes are
    memoized per (context, analyzed plans, max_vocab).
    """
    from distributed_stream_processing_spark.session import (
        evict_stale_sessions,
        session_key,
    )

    sk = session_key(dfs[0].sparkSession)
    evict_stale_sessions(_VOCAB_MEMO, sk)
    try:
        key = (
            sk,
            max_vocab,
            tuple(
                int(d._jdf.queryExecution().analyzed().semanticHash())
                for d in dfs
            ),
        )
    except Exception:
        key = None
    if key is not None and key in _VOCAB_MEMO:
        return _VOCAB_MEMO[key]
    screen = (
        dfs[0]
        .select(F.explode("tokens").alias("tok"))
        .limit(20_000)
        .distinct()
        .limit(max_vocab + 1)
        .collect()
    )
    if len(screen) > max_vocab:
        result: dict[str, int] | None = None
    else:
        vocab = dfs[0].select(F.explode("tokens").alias("tok"))
        for d in dfs[1:]:
            vocab = vocab.unionByName(
                d.select(F.explode("tokens").alias("tok"))
            )
        toks = [r.tok for r in vocab.distinct().limit(max_vocab + 1).collect()]
        result = (
            None
            if len(toks) > max_vocab
            else {tok: 1 << i for i, tok in enumerate(sorted(toks))}
        )
    if key is not None:
        _VOCAB_MEMO[key] = result
    return result


def _mask_col(mapping: dict[str, int]):
    entries = []
    for tok, bit in mapping.items():
        entries += [F.lit(tok), F.lit(bit).cast("bigint")]
    m = F.create_map(*entries)
    return F.aggregate(
        F.col("tokens"),
        F.lit(0).cast("bigint"),
        lambda acc, tk: acc.bitwiseOR(F.coalesce(m[tk], F.lit(0).cast("bigint"))),
    )


def expand_collapsed_pairs(
    grouped: DataFrame, rep_pairs: DataFrame, t: Fraction
) -> DataFrame:
    """Expand representative pairs back to member pairs after an
    exact-duplicate collapse (identical token arrays are
    interchangeable for any set-similarity measure).

    ``grouped``: (id = min member, tokens, members ARRAY<BIGINT>
    sorted); ``rep_pairs``: (a_id, b_id, inter, uni) over
    representatives. Cross-group pairs inherit (inter, uni); intra-
    group pairs (identical arrays) are generated in-row from the
    member list. The member table is one row per distinct array —
    broadcast-sized relative to the corpus.
    """
    memb = grouped.select(F.col("id").alias("gid"), "members")
    ma = F.broadcast(
        memb.select(F.col("gid").alias("a_id"), F.col("members").alias("a_members"))
    )
    mb = F.broadcast(
        memb.select(F.col("gid").alias("b_id"), F.col("members").alias("b_members"))
    )
    cross = (
        rep_pairs.join(ma, "a_id")
        .join(mb, "b_id")
        .select(F.explode("a_members").alias("x"), "b_members", "inter", "uni")
        .select("x", F.explode("b_members").alias("y"), "inter", "uni")
        .select(
            F.least("x", "y").alias("a_id"),
            F.greatest("x", "y").alias("b_id"),
            "inter",
            "uni",
        )
    )
    # intra-group pairs: identical arrays, so inter/uni are the same
    # expressions both verify paths reduce to on an identical pair;
    # the threshold still applies (J < 1 iff the array has duplicates)
    d = F.size(F.array_distinct("tokens")).cast("bigint")
    u = (2 * F.size("tokens") - d).cast("bigint")
    intra = (
        grouped.filter(F.size("members") > 1)
        .filter(t.denominator * d >= t.numerator * u)
        .select(
            F.explode(
                F.flatten(
                    F.transform(
                        "members",
                        lambda x, i: F.transform(
                            F.slice(F.col("members"), i + 2, F.size("members")),
                            lambda y: F.struct(x.alias("a_id"), y.alias("b_id")),
                        ),
                    )
                )
            ).alias("p"),
            d.alias("inter"),
            u.alias("uni"),
        )
        .select("p.a_id", "p.b_id", "inter", "uni")
    )
    return cross.unionByName(intra)


def collapse_group_by_tokens(df: DataFrame) -> DataFrame:
    """(id = min member, tokens, members) — one row per distinct array.

    localCheckpoint'ed: every consumer (signature/prefix emission for
    both join sides, the payload verify join, member expansion) would
    otherwise re-run the upstream scan + tokenization per branch —
    q21's plan showed 7 parquet scans of the same corpus. One
    materialization serves all branches; at a scale where even the
    collapsed table shouldn't persist, drop the checkpoint and let the
    branches recompute."""
    return (
        df.groupBy("tokens")
        .agg(
            F.min("id").alias("id"),
            F.sort_array(F.collect_list("id")).alias("members"),
        )
        .localCheckpoint(eager=False)
    )


def similarity_join(
    left: DataFrame,
    right: DataFrame | None,
    threshold: Fraction | float,
    order: str = "lex",
    collapse_duplicates: bool = True,
) -> DataFrame:
    """Exact Jaccard join of token-set tables at ``threshold``.

    Inputs must have columns ``(id BIGINT, tokens ARRAY<STRING>)``
    with tokens distinct + sorted (see functions.text.tokens).
    ``right=None`` -> self-join emitting each unordered pair once
    (a_id < b_id). Output: (a_id, b_id, inter BIGINT, uni BIGINT)
    with q*inter >= p*uni, threshold = p/q exactly.

    Self-joins collapse exact-duplicate arrays first (the prefix join
    and verification run on one representative per distinct array;
    member pairs are expanded after — identical output, candidate
    work shrunk by the duplication factor squared on dup-heavy
    corpora). Verification auto-switches to dictionary bitmasks for
    small vocabularies (see token_bitmask_dict) — exact either way.
    """
    t = Fraction(threshold).limit_denominator(1_000_000)
    self_join = right is None
    if self_join and collapse_duplicates:
        grouped = collapse_group_by_tokens(left)
        rep_pairs = similarity_join(
            grouped.select("id", "tokens"),
            None,
            t,
            order,
            collapse_duplicates=False,
        )
        return expand_collapsed_pairs(grouped, rep_pairs, t)
    right = left if self_join else right

    mapping = token_bitmask_dict(left) if self_join else token_bitmask_dict(left, right)
    freq = None
    if order == "freq":
        freq = _token_freq(left) if self_join else _token_freq(left, right)
        freq = freq.localCheckpoint(eager=False)

    def rep(df: DataFrame, prefix: str) -> DataFrame:
        out = _with_prefix(df, t, order, freq)
        cols = [
            F.col("id").alias(f"{prefix}_id"),
            F.size("tokens").alias(f"{prefix}_sz"),
            # the candidate join keys on the HASH of the prefix token,
            # not the token string: a long equi-key joins measurably
            # faster than per-row string hashing/comparison (the r14
            # semi-stream finding: composite/string keys dominated a
            # 74M-row join 13x). A hash collision only admits a
            # spurious candidate pair that exact verification removes.
            F.xxhash64("ptok").alias("pk"),
        ]
        if mapping is not None:
            # single-long bitmask: 8 bytes, cheaper to carry through the
            # prefix join than to join back afterwards
            cols.insert(2, _mask_col(mapping).alias(f"{prefix}_rep"))
        return out.select(*cols)

    a, b = rep(left, "a"), rep(right, "b")

    pair_filter = (
        # length filter: t*|a| <= |b| <= |a|/t (integer-exact both ways)
        (t.denominator * F.col("b_sz") >= t.numerator * F.col("a_sz"))
        & (t.denominator * F.col("a_sz") >= t.numerator * F.col("b_sz"))
    )
    if self_join:
        pair_filter = pair_filter & (F.col("a_id") < F.col("b_id"))

    # The prefix-row tables are BYTES-small (ids + one token), but the
    # join OUTPUT is the candidate-pair set (quadratic in bucket
    # density): AQE's default size-based coalescing merged this
    # exchange to 1-2 partitions and serialized candidate generation
    # (measured 3s single-task at sf0.1). The session's
    # coalescePartitions.minPartitionSize floor (session.py) keeps the
    # exchange wide while leaving it AQE-managed — deliberately NOT an
    # explicit repartition, which would exempt the shuffle from AQE's
    # skew-join splitting exactly where a hot prefix token needs it.
    cands = a.join(b, "pk").filter(pair_filter)

    if mapping is not None:
        inter = F.bit_count(F.col("a_rep").bitwiseAND(F.col("b_rep"))).cast("bigint")
        uni = (F.col("a_sz") + F.col("b_sz") - inter).cast("bigint")
        out = (
            cands.withColumn("inter", inter)
            .withColumn("uni", uni)
            .filter(t.denominator * F.col("inter") >= t.numerator * F.col("uni"))
            .select("a_id", "b_id", "inter", "uni")
            # bitmask verify is O(1): cheaper to verify duplicated
            # candidate instances and dedupe the qualifying output after
            .dropDuplicates(["a_id", "b_id"])
        )
        return out

    # general path: the prefix join shuffles IDS ONLY — candidate pairs
    # are deduped first and the token arrays joined back just for
    # verification. Carrying each doc's full token array on every
    # prefix-token row (the round-2 layout) multiplies the shuffle by
    # the prefix length; at 100 TB the candidate shuffle must be ids,
    # not payloads.
    pair_ids = cands.select("a_id", "b_id").dropDuplicates(["a_id", "b_id"])
    averify = left.select(F.col("id").alias("a_id"), F.col("tokens").alias("a_rep"))
    bverify = right.select(F.col("id").alias("b_id"), F.col("tokens").alias("b_rep"))
    pairs = pair_ids.join(averify, "a_id").join(bverify, "b_id")
    i_c, u_c = jaccard_parts(F.col("a_rep"), F.col("b_rep"))
    return (
        pairs.withColumn("inter", i_c.cast("bigint"))
        .withColumn("uni", u_c.cast("bigint"))
        .filter(t.denominator * F.col("inter") >= t.numerator * F.col("uni"))
        .select("a_id", "b_id", "inter", "uni")
    )


def choose_signature_schemes(
    index_side: DataFrame,
    groups: list[tuple[int, int]],
    threshold: Fraction,
    h_eq: dict[int, int],
    h_del: dict[int, int],
    eliminate_ratio: float | None = None,
    material_frac: float | None = None,
) -> dict[int, bool]:
    """Frequency-adaptive scheme choice per length group (T5): the
    engine's analogue of Dima's per-signature V-selection
    (DimaJoin.scala:330-479), which prices probe strategies from the
    index's signature frequency table. Group granularity here — the
    emitted signature layout must be fixed before the join — with the
    same measured inputs: one pass over the index side builds the
    segment-frequency table at BOTH candidate segment counts, and the
    per-group cost compares

        cost_eq  = rows_eq  + sum(cnt^2)_eq      (shuffle + collisions)
        cost_del = rows_del + n_rec*avg_tokens + sum(cnt^2)_del
                   (shuffle + deletion-row emission + collisions)

    choosing deletion for a group iff cost_del < cost_eq — i.e. when
    hot equality buckets make collision volume dominate emission.
    Returns {group: use_deletion}.

    ``eliminate_ratio`` (optional) additionally requires
    c2_del <= ratio * c2_eq: deletion must ELIMINATE the collision
    mass, not merely compress it. Collisions that persist under the
    halved-H layout are true near-pairs that get verified either way
    (the layouts only re-shape their instance multiplicity), while
    accidental single-token-segment collisions vanish. Measured on
    the bench fixtures: a dense similar-doc corpus keeps
    c2_del/c2_eq ~ 0.3 and runs FASTER on equality (deletion's
    per-batch probe re-emission outweighs the instance savings),
    while a sparse random corpus drops to ~0.03 and deletion cuts
    deduped candidates 14x. The batch-replayed semi-stream pipeline
    passes 0.1; the one-shot join keeps the pure cost comparison.

    ``material_frac`` (optional) gates whether the per-record pricing
    MACHINERY engages at all: the V-selection layout only turns on
    when at least one otherwise-flipping group carries a material
    share of the corpus's total equality collision mass
    (c2_eq[g] >= material_frac * sum_g(c2_eq)); once engaged, every
    eliminable group joins the layout. Measured basis (r13/r14): the
    pricing cost is per-BATCH fixed (hot-table broadcast + the Arrow
    greedy pass), so on the dense sf0.1 fixture — whose only
    eliminable groups hold 0.1%/0.5% of mass — engaging the machinery
    for them cost 2x end-to-end for a 0.8% candidate cut (r13: 14.1 s
    vs 6.7 s pipeline), while on the sparse stress corpus the material
    groups repay it 10-35x AND the immaterial-but-eliminable groups
    then ride the already-paid machinery for free: at the 10x stress
    corpus they hold 1.3% of store mass but dominated the residual
    candidate volume once the big groups flipped — including them
    cuts deduped candidates a further 3.5x (727k -> ~207k, r14
    measured) at neutral wall time. A PER-GROUP materiality gate
    (the r13 form) misreads exactly that regime.
    """
    from distributed_stream_processing_spark.functions.signatures import (
        segment_signatures,
    )

    t = threshold
    # ONE scan of the index side for ALL (group, mode) combinations:
    # records explode over their compatible (g, mode) pairs and a
    # CASE picks that combination's segment count (the per-group
    # filter+union shape re-scanned the corpus 2 x n_groups times —
    # the same read amplification _emit_sigs avoids)
    sz = F.size("tokens")
    memberships = []
    for g, (lo, hi) in enumerate(groups):
        lo_len = -(-t.numerator * lo // t.denominator)
        hi_len = hi * t.denominator // t.numerator
        cond = (sz >= lo_len) & (sz <= hi_len)
        for mode in (0, 1):
            memberships.append(
                F.when(
                    cond,
                    F.struct(
                        F.lit(g).cast("int").alias("g"),
                        F.lit(mode).cast("int").alias("mode"),
                        # the (g, mode) segment count rides IN the
                        # struct so ONE signature expression serves
                        # every combination — a per-(g, mode) CASE
                        # over signature subtrees grows past janino's
                        # method limits and drops this scan to
                        # interpreted eval (~100x; see _sig_exprs)
                        F.lit(h_eq[g] if mode == 0 else h_del[g])
                        .cast("int")
                        .alias("h"),
                    ),
                )
            )
    base = index_side.select(
        sz.alias("sz"),
        F.col("tokens"),
        F.explode(F.array_compact(F.array(*memberships))).alias("gm"),
    )
    u = base.select(
        F.col("gm.g").alias("g"),
        F.col("gm.mode").alias("mode"),
        F.explode(segment_signatures(F.col("tokens"), F.col("gm.h"))).alias("s"),
        "sz",
    )
    freq = u.groupBy("g", "mode", "s.seg", "s.sig").agg(
        F.count(F.lit(1)).alias("c"), F.sum("sz").alias("sz_sum")
    )
    stats = {
        (r.g, r.mode): (int(r.rows), int(r.c2), float(r.sz_sum))
        for r in freq.groupBy("g", "mode")
        .agg(
            F.sum("c").alias("rows"),
            F.sum(F.col("c") * F.col("c")).alias("c2"),
            F.sum("sz_sum").alias("sz_sum"),
        )
        .collect()
    }
    tot_c2_eq = sum(stats.get((g, 0), (0, 0, 0.0))[1] for g in range(len(groups)))
    out: dict[int, bool] = {}
    material: dict[int, bool] = {}
    for g in range(len(groups)):
        rows_eq, c2_eq, _ = stats.get((g, 0), (0, 0, 0.0))
        rows_del, c2_del, sz_sum = stats.get((g, 1), (0, 0, 0.0))
        n_rec = rows_del / max(1, h_del[g])
        avg_tok = (sz_sum / rows_del) if rows_del else 0.0
        cost_eq = rows_eq + c2_eq
        cost_del = rows_del + n_rec * avg_tok + c2_del
        use_del = cost_del < cost_eq
        if use_del and eliminate_ratio is not None:
            use_del = c2_del <= eliminate_ratio * c2_eq
        out[g] = use_del
        material[g] = c2_eq >= (material_frac or 0.0) * tot_c2_eq
    if material_frac is not None and not any(
        out[g] and material[g] for g in out
    ):
        # no material group wants the layout: the per-batch pricing
        # machinery cannot repay its fixed cost — stay on equality
        # everywhere (once ANY material group engages it, the
        # immaterial eliminable groups ride along; see docstring)
        out = {g: False for g in out}
    return out


def _vsl_greedy(c1: list[int], c2x: list[int], units: int) -> list[int]:
    """Dima's per-record probe-unit distribution (DimaJoin.scala:
    434-479): a min-heap greedily assigns exactly ``units`` probe
    units over segments by marginal candidate cost — unit 1 of
    segment i costs its equality-bucket frequency c1[i], unit 2 its
    deletion-tolerance extra c2x[i]. v_i ∈ {0,1,2}. (The reference
    adds reducer-load terms priced for its hand-rolled partitioner;
    its weight(0)=0 zeroes the mode-1 term and AQE owns balance here,
    so the engine prices candidate volume only.)"""
    import heapq

    heap = [(c, 0, i) for i, c in enumerate(c1)]
    heapq.heapify(heap)
    v = [0] * len(c1)
    for _ in range(units):
        _, _, i = heapq.heappop(heap)
        v[i] += 1
        if v[i] == 1:
            heapq.heappush(heap, (c2x[i], 1, i))
    return v


def signature_frequencies(b: DataFrame) -> DataFrame:
    """Per-(g, seg, sig) index-side signature frequencies, split by
    kind: f0 = equality-bucket size, f1 = deletion-row count. The
    measured input of probe V-selection (Dima collects this map to
    the driver, DimaJoin.scala:330-360; here it stays a DataFrame —
    corpus-sized state never lands on the driver)."""
    return b.groupBy("g", "seg", "sig").agg(
        F.sum(F.when(F.col("b_kind") == 0, 1).otherwise(0)).alias("f0"),
        F.sum(F.when(F.col("b_kind") == 1, 1).otherwise(0)).alias("f1"),
    )


def _vsl_flush(pdf, hs: dict[int, int], out_cols, out_dtypes):
    """Vectorized per-record probe-unit allocation over one pandas
    chunk of costed probe rows (columns a_id, a_sz, g, seg, sig,
    a_kind, f0, f1; rows of a record contiguous is NOT required here —
    only same-chunk).

    Equivalent to running ``_vsl_greedy`` per record, restated so the
    whole chunk is sorts + merges (the per-record Python heap loop
    measured 2.5 s/batch on a 15k-record stress batch). A second unit
    enters the heap only when its segment's first unit pops, so its
    position in the global ascending pop order linearizes to:

    * concave pair (c2x_i < c1_i): it pops IMMEDIATELY after its
      first unit (everything still in the heap costs >= c1_i) —
      effective key (c1_i, initial-tier, seg_i, just-after);
    * otherwise: it pops at its own cost, after every equal-cost
      initial unit — effective key (c2x_i, second-tier, seg_i).

    The taken set is the h cheapest items per record under that key.
    Total allocated cost equals the heap's exactly (pinned by
    test_vsl_vectorized_matches_heap); tie-broken sets may differ,
    which is harmless — ANY exact-h allocation is complete.
    """
    import numpy as np

    seg = pdf[pdf["a_kind"] == 0]
    dels = pdf[pdf["a_kind"] == 1]
    n = len(seg)
    c1 = seg["f0"].to_numpy("int64")
    c2x = seg["f1"].to_numpy("int64")
    if len(dels):
        # own deletion signatures vs index segments: their equality
        # mass is part of the segment's tolerance (second-unit) cost
        dm = (
            dels.groupby(["a_id", "seg"], sort=False)["f0"]
            .sum()
            .rename("dmass")
            .reset_index()
        )
        merged = seg[["a_id", "seg"]].merge(dm, on=["a_id", "seg"], how="left")
        c2x = c2x + merged["dmass"].fillna(0).to_numpy("int64")
    concave = c2x < c1
    eff2 = np.where(concave, c1, c2x)
    tier2 = np.where(concave, 0, 1).astype("int8")
    sub2 = concave.astype("int8")  # just-after-its-first within the tie
    h = seg["g"].map(hs).to_numpy("int64")
    zeros8 = np.zeros(n, "int8")
    items = pd.DataFrame(
        {
            "a_id": np.tile(seg["a_id"].to_numpy(), 2),
            "cost": np.concatenate([c1, eff2]),
            "tier": np.concatenate([zeros8, tier2]),
            "seg": np.tile(seg["seg"].to_numpy(), 2),
            "sub": np.concatenate([zeros8, sub2]),
            "typ": np.repeat(np.array([0, 1], "int8"), n),
            "row": np.tile(np.arange(n), 2),
            "h": np.tile(h, 2),
        }
    )
    items.sort_values(
        ["a_id", "cost", "tier", "seg", "sub"], kind="stable", inplace=True
    )
    taken = items[items.groupby("a_id", sort=False).cumcount() < items["h"]]
    v1 = taken.loc[taken["typ"] == 0, "row"].to_numpy()  # v_i >= 1
    v2 = taken.loc[taken["typ"] == 1, "row"].to_numpy()  # v_i == 2
    cols = ["a_id", "a_sz", "g", "seg", "sig"]
    e1 = seg.iloc[v1][cols].assign(b_kind=0)  # segment sig vs index segs
    e2 = seg.iloc[v2][cols].assign(b_kind=1)  # segment sig vs index dels
    parts = [e1, e2]
    if len(dels) and len(v2):
        # own deletion sigs of tolerance segments vs index segments
        parts.append(
            dels.merge(
                seg.iloc[v2][["a_id", "seg"]], on=["a_id", "seg"], how="inner"
            )[cols].assign(b_kind=0)
        )
    out = pd.concat(parts, ignore_index=True)
    return out[out_cols].astype(out_dtypes)


def _vsl_probe_rows(
    a: DataFrame,
    freq: DataFrame | None,
    hs: dict[int, int],
    broadcast_freq: bool = False,
    clustered: bool = False,
    join_key: list[str] | None = None,
    freq_bc=None,
) -> DataFrame:
    """Per-signature probe V-selection (T5 at the reference's true
    granularity, DimaJoin.scala:330-479): for every probe record,
    price each segment's probe level from the measured index-side
    signature frequencies and keep only the chosen probe rows.

    v_i = 1 probes segment i by equality (its segment signature vs
    index segment signatures); v_i = 2 adds 1-diff tolerance (segment
    signature vs index DELETION signatures + own deletion signatures
    vs index segment signatures); v_i = 0 skips the segment. Exactly
    H_g units are distributed (greedy min-heap on marginal candidate
    counts, _vsl_greedy), and any qualifying pair in group g has
    |x Δ y| <= H_g - 1 diffs, so if no chosen probe caught it then
    diffs >= sum(v_i) = H_g — contradiction: the scheme stays exact
    (pigeonhole, as the all-ones/equality scheme it generalizes).

    ``freq`` is the index frequency table (signature_frequencies) —
    the caller decides its lifetime (one-shot joins derive it inline;
    the semi-stream pipeline builds it once per corpus and reuses it
    every batch). The frequency table stays distributed — an ids-only
    equi-join prices the probe rows, and the per-record greedy runs
    PARTITION-WISE in one Arrow pass per partition (mapInPandas over
    a_id-clustered rows with a carry buffer for records split across
    Arrow batches; one Arrow group per record was pure fixed cost).
    ``broadcast_freq``: hint when the caller pre-restricted freq to
    the probe's own keys (per-batch pricing) — keeps the pricing join
    BHJ instead of letting a checkpointed no-stats side fall to SMJ.
    ``clustered``: the caller guarantees ``a``'s rows are already
    record-contiguous within partitions (true straight out of the
    signature emitter: explode preserves input order, and a BHJ
    pricing join streams the left side) — the a_id exchange + sort is
    skipped, which removes the whole-shuffle fixed cost from small
    per-batch probes (measured 2.4 s/batch of pure 32-task overhead
    on a 6k-row probe). Emitted rows name the index kind they target
    (b_kind), so deletion x deletion never joins.
    ``join_key``: pricing-join key columns (default the signature
    triple); the semi-stream pipeline passes ["sk"] — its freq table
    is keyed by the hashed key, making the pricing lookup a
    single-long broadcast join (a collision only mis-prices one key,
    never drops coverage).
    ``freq_bc``: a SparkContext broadcast of sorted numpy pricing
    arrays ((sk, f0, f1), see semi_stream_similarity's
    _freq_broadcast) — replaces the pricing JOIN entirely: the
    mapInPandas pass looks frequencies up via searchsorted inside the
    same Arrow batch that runs the greedy. A DataFrame broadcast hint
    re-collects and re-ships the (bounded but ~1M-row) hot table on
    EVERY batch's plan — measured as the dominant per-batch fixed
    cost at the 100x VSL store (1.4-2.5 s empty batches, VERDICT r15
    task 6) — while an sc.broadcast ships once per executor for the
    corpus lifetime. Requires ``a`` to carry the ``sk`` column; rows
    stay clustered (no exchange at all on this path).
    """
    if freq_bc is not None:
        costed = a.select("a_id", "a_sz", "g", "seg", "sig", "a_kind", "sk")
    else:
        if broadcast_freq:
            freq = F.broadcast(freq)
        costed = (
            a.join(freq, join_key or ["g", "seg", "sig"], "left")
            .fillna({"f0": 0, "f1": 0})
            .select("a_id", "a_sz", "g", "seg", "sig", "a_kind", "f0", "f1")
        )
    out_cols = ["a_id", "a_sz", "g", "seg", "sig", "b_kind"]
    out_dtypes = {
        "a_id": "int64",
        "a_sz": "int32",
        "g": "int32",
        "seg": "int32",
        "sig": "int64",
        "b_kind": "int32",
    }

    def pick_stream(batches):
        def flush(pdf):
            if freq_bc is not None:
                import numpy as np

                sks, f0s, f1s = freq_bc.value
                sk_v = pdf["sk"].to_numpy("int64")
                if len(sks):
                    idx = np.clip(
                        np.searchsorted(sks, sk_v), 0, len(sks) - 1
                    )
                    hit = sks[idx] == sk_v
                    pdf = pdf.assign(
                        f0=np.where(hit, f0s[idx], 0).astype("int64"),
                        f1=np.where(hit, f1s[idx], 0).astype("int64"),
                    )
                else:
                    pdf = pdf.assign(
                        f0=np.zeros(len(pdf), "int64"),
                        f1=np.zeros(len(pdf), "int64"),
                    )
            return _vsl_flush(pdf, hs, out_cols, out_dtypes)

        # rows are clustered by a_id within the partition; a record's
        # rows can still straddle an Arrow batch boundary, so the last
        # a_id run of each batch is carried into the next
        carry = None
        for pdf in batches:
            if carry is not None and len(carry):
                pdf = pd.concat([carry, pdf], ignore_index=True)
            if not len(pdf):
                carry = None
                continue
            last = pdf["a_id"].iloc[-1]
            tail = pdf["a_id"] == last
            carry = pdf[tail]
            done = pdf[~tail]
            if len(done):
                yield flush(done)
        if carry is not None and len(carry):
            yield flush(carry)

    schema = "a_id long, a_sz int, g int, seg int, sig long, b_kind int"
    if clustered:
        return costed.mapInPandas(pick_stream, schema=schema)
    n_part = int(a.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    return (
        costed.repartition(n_part, "a_id")
        .sortWithinPartitions("a_id")
        .mapInPandas(pick_stream, schema=schema)
    )


def dima_similarity_join(
    left: DataFrame,
    right: DataFrame | None,
    threshold: Fraction | float,
    max_len: int | None = None,
    scheme: str = "equality",
    candidates_only: bool = False,
) -> DataFrame:
    """Exact Jaccard join via Dima-style segment signatures with
    length-grouped segment counts (reference parity path; scheme and
    completeness in functions.signatures).

    Records are bucketed into geometric length groups
    (multigroup, BuildSig.scala:125-137); each group g probes with its
    own H_g = floor((1-t)*hi_g/t)+1 segments. Hash segmentation is
    set-stable (a token's segment never depends on the rest of the
    record), so for any qualifying pair |x Δ y| <= (1-t)*min(|x|,|y|)
    / t <= H_g - 1 — at least one segment matches by equality; no
    deletion-signature probing is required for completeness. Probe
    side emits signatures for its own group; index side emits for
    every group its length is compatible with (t*lo_g <= |y| <=
    hi_g/t). Candidates = equi-join on (g, seg, sig); verification
    exact. Same output contract as similarity_join.

    ``scheme="deletion"`` is the reference's low-H mode
    (BuildSig.scala:187-200 createDeletion, probe selection
    DimaJoin.scala:481-574): HALF the segments, with both sides also
    emitting per-segment single-token-deletion signatures. If every
    segment of a qualifying pair held >= 2 symmetric-difference
    tokens we'd need |x Δ y| >= 2H', so some segment holds <= 1 —
    matched by segment equality (0 diffs) or by one side's deletion
    signature equaling the other's segment signature (1 diff).
    Candidates come from one equi-join on (g, seg, sig) over the
    union of both kinds, excluding deletion x deletion matches
    (2 diffs prove nothing). Fewer segment rows shuffle at the cost
    of O(tokens) deletion rows per record — the trade the reference's
    V-selection arbitrates per signature; ``scheme="adaptive"`` makes
    that choice per length group from the measured index signature
    frequencies (choose_signature_schemes), the engine's T5 analogue,
    and ``scheme="vsl"`` makes it at the reference's true granularity:
    per probe record per segment (v_i ∈ {0,1,2}, _vsl_probe_rows) —
    skipping hot equality buckets entirely by paying 1-diff tolerance
    on cheap segments, with the index carrying both signature kinds.

    ``candidates_only=True`` returns the deduped candidate id pairs
    before verification (the reference's candidate-count statistic;
    used by the V-selection pruning tests).
    """
    from distributed_stream_processing_spark.functions.signatures import (
        deletion_signatures,
        multigroup,
        seg_count_dima,
        segment_signatures,
    )

    if scheme not in ("equality", "deletion", "adaptive", "vsl"):
        raise ValueError(f"unknown scheme {scheme!r}")
    t = Fraction(threshold).limit_denominator(1_000_000)
    self_join = right is None
    right = left if self_join else right
    sizes = left.agg(
        F.min(F.size("tokens")).alias("lo"), F.max(F.size("tokens")).alias("hi")
    ).first()
    lmin, lmax = sizes.lo or 1, sizes.hi or 1
    if not self_join:
        s2 = right.agg(
            F.min(F.size("tokens")).alias("lo"), F.max(F.size("tokens")).alias("hi")
        ).first()
        lmin, lmax = min(lmin, s2.lo or 1), max(lmax, s2.hi or 1)
    if max_len is not None:
        lmax = max(lmax, max_len)
    groups = multigroup(max(1, lmin), lmax, t)
    h_eq = {g: max(1, seg_count_dima(t, hi)) for g, (lo, hi) in enumerate(groups)}
    h_del = {
        g: max(1, (seg_count_dima(t, hi) + 1) // 2)
        for g, (lo, hi) in enumerate(groups)
    }
    if scheme == "adaptive":
        group_deletion = choose_signature_schemes(right, groups, t, h_eq, h_del)
    elif scheme == "vsl":
        # Dima's true layout: FULL segment count per group, both kinds
        # on both sides; the probe side then prunes per signature
        group_deletion = {g: True for g in range(len(groups))}
    else:
        group_deletion = {g: scheme == "deletion" for g in range(len(groups))}
    if scheme == "vsl":
        hs = dict(h_eq)
    else:
        hs = {g: h_del[g] if group_deletion[g] else h_eq[g] for g in group_deletion}
    any_deletion = any(group_deletion.values())

    def sigs(df: DataFrame, prefix: str, own_group_only: bool) -> DataFrame:
        # ONE scan: explode over compatible group structs (g, h, del);
        # a single group-uniform expression reads the layout from the
        # struct (per-group filter+union would re-scan the corpus once
        # per group per side, and a per-group CASE over signature
        # subtrees falls out of codegen — see _sig_exprs in
        # semi_stream_similarity for the same shape)
        sz = F.size("tokens")
        memberships = []
        for g, (lo, hi) in enumerate(groups):
            if own_group_only:
                cond = (sz >= lo) & (sz <= hi)
            else:
                lo_len = -(-t.numerator * lo // t.denominator)  # ceil(t*lo)
                hi_len = hi * t.denominator // t.numerator  # floor(hi/t)
                cond = (sz >= lo_len) & (sz <= hi_len)
            memberships.append(
                F.when(
                    cond,
                    F.struct(
                        F.lit(g).cast("int").alias("g"),
                        F.lit(hs[g]).cast("int").alias("h"),
                        F.lit(1 if group_deletion[g] else 0)
                        .cast("int")
                        .alias("del"),
                    ),
                )
            )
        base = df.select(
            F.col("id").alias(f"{prefix}_id"),
            sz.alias(f"{prefix}_sz"),
            F.col("tokens"),
            F.explode(F.array_compact(F.array(*memberships))).alias("gm"),
        )
        h = F.col("gm.h")
        segs = F.transform(
            segment_signatures(F.col("tokens"), h),
            lambda s: F.struct(
                s.seg.alias("seg"), s.sig.alias("sig"), F.lit(0).alias("kind")
            ),
        )
        if any_deletion:
            dels = F.transform(
                deletion_signatures(F.col("tokens"), h),
                lambda s: F.struct(
                    s.seg.alias("seg"), s.sig.alias("sig"), F.lit(1).alias("kind")
                ),
            )
            sig_expr = F.when(
                F.col("gm.del") == 1, F.concat(segs, dels)
            ).otherwise(segs)
        else:
            sig_expr = segs
        return (
            base.select(
                f"{prefix}_id",
                f"{prefix}_sz",
                F.col("gm.g").alias("g"),
                F.explode(sig_expr).alias("s"),
            )
            .select(
                f"{prefix}_id",
                f"{prefix}_sz",
                "g",
                "s.seg",
                "s.sig",
                F.col("s.kind").alias(f"{prefix}_kind"),
            )
            # candidate joins key on the signature-triple HASH (same
            # r14 finding as the semi-stream pipeline: a single long
            # equi-key beats the 3-column composite 13x on big scans;
            # collisions only add verification-killed candidates)
            .withColumn("sk", F.xxhash64("g", "seg", "sig"))
        )

    a = sigs(left, "a", own_group_only=True)
    b = sigs(right, "b", own_group_only=False)
    pair_filter = (
        (t.denominator * F.col("b_sz") >= t.numerator * F.col("a_sz"))
        & (t.denominator * F.col("a_sz") >= t.numerator * F.col("b_sz"))
    )
    if self_join:
        pair_filter = pair_filter & (F.col("a_id") < F.col("b_id"))

    if scheme == "vsl":
        probe = _vsl_probe_rows(a, signature_frequencies(b), hs).withColumn(
            "sk", F.xxhash64("g", "seg", "sig")
        )
        # probe rows already name the index kind they target (deletion
        # x deletion is never emitted), so the join is a plain
        # (hashed-key, kind) equi-join
        pair_ids = (
            probe.join(b, ["sk", "b_kind"])
            .filter(pair_filter)
            .select("a_id", "b_id")
            .dropDuplicates(["a_id", "b_id"])
        )
    else:
        if any_deletion:
            # deletion x deletion collisions prove nothing (2 diffs)
            pair_filter = pair_filter & (
                (F.col("a_kind") == 0) | (F.col("b_kind") == 0)
            )

        # signature rows shuffle (id, sz) only; token arrays join back
        # onto the deduped candidate pairs for verification
        # (ids-not-payloads — the layout that survives a 100x corpus;
        # see similarity_join)
        pair_ids = (
            a.join(b, ["sk"])
            .filter(pair_filter)
            .select("a_id", "b_id")
            .dropDuplicates(["a_id", "b_id"])
        )
    if candidates_only:
        return pair_ids
    # verification payload: dictionary bitmasks when the vocabulary is
    # small (same auto-switch similarity_join and minhash_lsh_dedup
    # use — exact either way). The general array path's per-pair
    # array_intersect over string arrays is ~40 CPU-ms-scale work x
    # 1.4M candidates on the dense sf0.1 fixture AND is the codegen
    # span this round measured sporadically deoptimizing (identical
    # runs at 27 s vs 1,216 s stage CPU); one bit_count(a&b) per pair
    # is ~100x cheaper and shuffles 8 bytes instead of the arrays
    # (r18 optimization round; guide §2.3 narrower types).
    mapping = (
        token_bitmask_dict(left)
        if self_join
        else token_bitmask_dict(left, right)
    )
    if mapping is not None:
        rep = _mask_col(mapping)
        averify = left.select(
            F.col("id").alias("a_id"),
            F.size("tokens").alias("a_vsz"),
            rep.alias("a_rep"),
        )
        bverify = right.select(
            F.col("id").alias("b_id"),
            F.size("tokens").alias("b_vsz"),
            rep.alias("b_rep"),
        )
        cands = pair_ids.join(averify, "a_id").join(bverify, "b_id")
        inter = F.bit_count(F.col("a_rep").bitwiseAND(F.col("b_rep"))).cast(
            "bigint"
        )
        uni = (F.col("a_vsz") + F.col("b_vsz") - inter).cast("bigint")
    else:
        averify = left.select(
            F.col("id").alias("a_id"), F.col("tokens").alias("a_tokens")
        )
        bverify = right.select(
            F.col("id").alias("b_id"), F.col("tokens").alias("b_tokens")
        )
        cands = pair_ids.join(averify, "a_id").join(bverify, "b_id")
        inter, uni = jaccard_parts(F.col("a_tokens"), F.col("b_tokens"))
    return (
        cands.withColumn("inter", inter.cast("bigint"))
        .withColumn("uni", uni.cast("bigint"))
        .filter(t.denominator * F.col("inter") >= t.numerator * F.col("uni"))
        .select("a_id", "b_id", "inter", "uni")
    )


def brute_force_similarity_join(
    left: DataFrame, right: DataFrame | None, threshold: Fraction | float
) -> DataFrame:
    """O(n*m) cross-join reference (the reference's sequentialScan,
    ds_join/JaccardIndex.scala:211-231) — for tests and tiny sides only."""
    t = Fraction(threshold).limit_denominator(1_000_000)
    self_join = right is None
    right = left if self_join else right
    a = left.select(F.col("id").alias("a_id"), F.col("tokens").alias("a_tokens"))
    b = right.select(F.col("id").alias("b_id"), F.col("tokens").alias("b_tokens"))
    pairs = a.crossJoin(b)
    if self_join:
        pairs = pairs.filter(F.col("a_id") < F.col("b_id"))
    inter, uni = jaccard_parts(F.col("a_tokens"), F.col("b_tokens"))
    return (
        pairs.withColumn("inter", inter.cast("bigint"))
        .withColumn("uni", uni.cast("bigint"))
        .filter(t.denominator * F.col("inter") >= t.numerator * F.col("uni"))
        .select("a_id", "b_id", "inter", "uni")
    )
