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

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F

from distributed_stream_processing_spark.functions.text import jaccard_parts


def _prefix_len(size_col, t: Fraction):
    # prefix length = |x| - ceil(t*|x|) + 1; ceil(a/b * n) = -floor(-a*n/b)
    return size_col - (-F.floor((-t.numerator * size_col) / F.lit(t.denominator)).cast("int")) + 1


def _with_prefix(df: DataFrame, t: Fraction, order: str) -> DataFrame:
    """Attach sorted token array + exploded prefix tokens."""
    toks = F.col("tokens")
    if order == "freq":
        # global frequency-ascending order: rare tokens first minimizes
        # candidate pairs; any total order preserves completeness.
        freq = (
            df.select(F.explode("tokens").alias("tok"))
            .groupBy("tok")
            .count()
            .withColumnRenamed("count", "tok_freq")
        )
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


def similarity_join(
    left: DataFrame,
    right: DataFrame | None,
    threshold: Fraction | float,
    order: str = "lex",
) -> DataFrame:
    """Exact Jaccard join of token-set tables at ``threshold``.

    Inputs must have columns ``(id BIGINT, tokens ARRAY<STRING>)``
    with tokens distinct + sorted (see functions.text.tokens).
    ``right=None`` -> self-join emitting each unordered pair once
    (a_id < b_id). Output: (a_id, b_id, inter BIGINT, uni BIGINT)
    with q*inter >= p*uni, threshold = p/q exactly.
    """
    t = Fraction(threshold).limit_denominator(1_000_000)
    self_join = right is None
    right = left if self_join else right

    a = _with_prefix(left, t, order).select(
        F.col("id").alias("a_id"), F.col("tokens").alias("a_tokens"), "ptok"
    )
    b = _with_prefix(right, t, order).select(
        F.col("id").alias("b_id"), F.col("tokens").alias("b_tokens"), "ptok"
    )

    pair_filter = (
        # length filter: t*|a| <= |b| <= |a|/t (integer-exact both ways)
        (t.denominator * F.size("b_tokens") >= t.numerator * F.size("a_tokens"))
        & (t.denominator * F.size("a_tokens") >= t.numerator * F.size("b_tokens"))
    )
    if self_join:
        pair_filter = pair_filter & (F.col("a_id") < F.col("b_id"))

    cands = (
        a.join(b, "ptok")
        .filter(pair_filter)
        .select("a_id", "b_id", "a_tokens", "b_tokens")
        .dropDuplicates(["a_id", "b_id"])
    )

    inter, uni = jaccard_parts(F.col("a_tokens"), F.col("b_tokens"))
    return (
        cands.withColumn("inter", inter.cast("bigint"))
        .withColumn("uni", uni.cast("bigint"))
        .filter(t.denominator * F.col("inter") >= t.numerator * F.col("uni"))
        .select("a_id", "b_id", "inter", "uni")
    )


def dima_similarity_join(
    left: DataFrame,
    right: DataFrame | None,
    threshold: Fraction | float,
    max_len: int | None = None,
) -> DataFrame:
    """Exact Jaccard join via Dima-style segment signatures
    (reference parity path; see functions.signatures for the scheme
    and the completeness argument).

    Candidates = equi-join on (seg, sig); verification identical to
    ``similarity_join``. Same output contract.
    """
    from distributed_stream_processing_spark.functions.signatures import (
        seg_count_for,
        segment_signatures,
    )

    t = Fraction(threshold).limit_denominator(1_000_000)
    self_join = right is None
    right = left if self_join else right
    if max_len is None:
        lmax = max(
            left.agg(F.max(F.size("tokens"))).first()[0],
            right.agg(F.max(F.size("tokens"))).first()[0],
        )
    else:
        lmax = max_len
    h = seg_count_for(t, lmax)

    def sigs(df: DataFrame, prefix: str) -> DataFrame:
        return df.select(
            F.col("id").alias(f"{prefix}_id"),
            F.col("tokens").alias(f"{prefix}_tokens"),
            F.explode(segment_signatures(F.col("tokens"), h)).alias("s"),
        ).select(f"{prefix}_id", f"{prefix}_tokens", "s.seg", "s.sig")

    a, b = sigs(left, "a"), sigs(right, "b")
    pair_filter = (
        (t.denominator * F.size("b_tokens") >= t.numerator * F.size("a_tokens"))
        & (t.denominator * F.size("a_tokens") >= t.numerator * F.size("b_tokens"))
    )
    if self_join:
        pair_filter = pair_filter & (F.col("a_id") < F.col("b_id"))

    cands = (
        a.join(b, ["seg", "sig"])
        .filter(pair_filter)
        .select("a_id", "b_id", "a_tokens", "b_tokens")
        .dropDuplicates(["a_id", "b_id"])
    )
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
