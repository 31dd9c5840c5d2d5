"""Dima-style segment/deletion signatures (reference parity path).

The reference's similarity join indexes records by segment signatures
and deletion signatures (DSim-Join ds_join/BuildSig.scala:60-95
createInverse, :187-200 createDeletion; probe-side selection
ds_join/DimaJoin.scala:481-574). This module re-derives the scheme on
Spark columns:

* tokens are hashed into ``H`` disjoint segments (xxhash64 mod H);
* a segment signature is the hash of the segment's sorted content;
* a deletion signature is the hash of the segment content with one
  token removed.

Completeness (pigeonhole): two sets x,y segmented with the same H
differ in at most ``|x Δ y|`` segments, and J(x,y) >= t implies
``|x Δ y| <= (1-t)/(1+t) * (|x|+|y|)``; choosing
``H = floor((1-t)/(1+t) * (Lmax + Lmax/t)) + 1`` therefore
guarantees at least one *identical* segment (possibly empty), so
matching on segment-signature equality alone finds every qualifying
pair and the exact-Jaccard verification makes the join exact.
The reference additionally probes deletion signatures so it can run
with fewer segments (H = floor((1-t)*l/t)+1, BuildSig.scala:55-58);
we expose both but default to the equality-only scheme, letting AQE
absorb the skew that Dima's load-aware partitioner handled by hand.
"""

from __future__ import annotations

from fractions import Fraction

from pyspark.sql import Column
from pyspark.sql import functions as F


def seg_count_for(threshold: Fraction | float, max_len: int) -> int:
    """H large enough that any qualifying pair shares one equal segment."""
    t = Fraction(threshold).limit_denominator(1_000_000)
    worst_sym_diff = (1 - t) / (1 + t) * (max_len + max_len / t)
    return int(worst_sym_diff) + 1


def seg_count_dima(threshold: Fraction | float, length: int) -> int:
    """The reference's per-length-group H (BuildSig.scala:55-58)."""
    t = Fraction(threshold).limit_denominator(1_000_000)
    return int((1 - t) * length / t) + 1


def multigroup(lmin: int, lmax: int, threshold: Fraction | float) -> list[tuple[int, int]]:
    """Geometric length ranges [l, floor(l/t)] (BuildSig.scala:125-137).

    Only pairs with t*|x| <= |y| <= |x|/t can qualify, so records need
    only join within/adjacent-to their own range at scale.
    """
    t = Fraction(threshold).limit_denominator(1_000_000)
    groups = []
    lo = max(1, lmin)
    while lo <= lmax:
        hi = max(lo, int(lo / t))
        groups.append((lo, hi))
        lo = hi + 1
    return groups


def _h_col(h: int | Column) -> Column:
    """``h`` as a column: the signature emitters accept the segment
    count either as a Python int (one fixed layout) or as a COLUMN
    (data-driven layout). The column form is what keeps multi-group
    emission inside whole-stage codegen: a per-group CASE over
    full signature expressions grows past janino's method limits and
    silently drops the whole Generate to interpreted eval (~100x
    slower — the r10 100x store build spent 5 min/task in
    CaseWhen.eval), while one expression with h read from the
    exploded group struct stays small and uniform."""
    return F.lit(h) if isinstance(h, int) else h


def _segment_content(tokens: Column, seg: Column | int, h: int | Column) -> Column:
    """Sorted tokens of one hash segment, as a canonical string."""
    hc = _h_col(h)
    return F.concat_ws(
        " ",
        F.array_sort(
            F.filter(tokens, lambda x: F.pmod(F.xxhash64(x), hc) == seg)
        ),
    )


def segment_signatures(tokens: Column, h: int | Column) -> Column:
    """ARRAY<STRUCT<seg INT, sig BIGINT>>: one signature per segment
    (empty segments included — required for completeness)."""
    hc = _h_col(h)
    return F.transform(
        F.sequence(F.lit(0), (hc - F.lit(1)).cast("int")),
        lambda seg: F.struct(
            seg.cast("int").alias("seg"),
            F.xxhash64(_segment_content(tokens, seg, hc)).alias("sig"),
        ),
    )


def deletion_signatures(tokens: Column, h: int | Column) -> Column:
    """ARRAY<STRUCT<seg INT, sig BIGINT>>: per segment, the hash of the
    segment content with each single token removed (createDeletion,
    BuildSig.scala:187-200).

    Contract: ``tokens`` is treated as a SET. The segment content is
    deduplicated (array_distinct) before splicing, so dropping by
    position equals dropping by value even for callers that pass a
    multiset token array — [a, a, b] minus a is [b], matching the
    value-based filter this splice form replaced (the engine's own
    tokenizer, functions.text.tokens, already emits distinct tokens,
    for which array_distinct is the identity).

    Each segment's sorted content array is materialized ONCE, then
    every deletion is an O(s) array splice over it — the naive form
    re-filtered the whole record (one membership hash per token) per
    deletion, O(s * |record|) hashing per deletion row. The
    per-element index lambda makes empty segments contribute nothing
    (a 1..size sequence would emit a descending [1, 0] for them).
    """
    hc = _h_col(h)
    seg_arrs = F.transform(
        F.sequence(F.lit(0), (hc - F.lit(1)).cast("int")),
        lambda seg: F.struct(
            seg.cast("int").alias("seg"),
            F.array_sort(
                F.array_distinct(
                    F.filter(
                        tokens, lambda x: F.pmod(F.xxhash64(x), hc) == seg
                    )
                )
            ).alias("arr"),
        ),
    )
    return F.flatten(
        F.transform(
            seg_arrs,
            lambda s: F.transform(
                s.arr,
                lambda _tok, i: F.struct(
                    s.seg.alias("seg"),
                    F.xxhash64(
                        F.concat_ws(
                            " ",
                            F.concat(
                                F.slice(s.arr, F.lit(1), i),
                                F.slice(s.arr, i + 2, F.size(s.arr)),
                            ),
                        )
                    ).alias("sig"),
                ),
            ),
        )
    )
