"""Pluggable keyed remote-fetch seam for the semi-stream pipelines
(SURVEY S7 batched remote point-lookup; VERDICT r15 task 5).

Both cached pipelines fetch the rows of MISSED keys from the backing
store once per batch. The default implementation is a scan-side
semi-join of the in-session store (equi pipeline) or key directory
(similarity pipeline) against the broadcast missed-key set — measured
cheap at the 100x stores (q33 fetch share 0.29; q48 directory scan
~0.6 s/batch) but LINEAR in store size: at a genuine 100 TB store the
honest answer is a keyed EXTERNAL fetch, pushing the (batch-bounded)
key set into the source as a ``WHERE key IN (...)`` predicate — the
reference's own miss path is exactly that shape (per-partition Mongo
``in()`` lookups, ds_join/DS_SimJoin_stream.scala:774-832; DS-Join's
indexed fetch, DS_join_step4 streaming.scala:343-377).

The seam is one method: ``fetch(missed_keys: DataFrame) ->
DataFrame``. A pipeline given a ``fetcher`` routes every miss fetch
through it; the returned frame must carry the pipeline's fetch
layout (the equi pipeline: the store's columns; the similarity
pipeline: ``sk, b_id, b_sz, b_kind``). Implementations here:

* ``SemiScanFetcher`` — the default semantics as an explicit object
  (store ⋉ broadcast(missed_keys)); what both pipelines inline when
  no fetcher is given.
* ``PushdownKeyedFetcher`` — the external-store shape: collects the
  batch-bounded key set to the driver and issues
  ``source.filter(col(key).isin(keys))``, which Spark pushes into the
  scan as an ``In`` filter (``PushedFilters: [In(key, ...)]`` on a
  parquet source — asserted by tests/test_fetch_seam.py) and a JDBC
  source compiles to ``WHERE key IN (...)``. The driver collect is
  bounded by the per-batch miss count, the same bound the reference's
  ``in()`` batches rely on.

When to flip the default (measured at the 100x store, 75.4M-row sigs
collection — tools/exp_fetch_pushdown.py, table in BASELINE.md r17):
pushdown is O(misses) ONLY when the source is physically CLUSTERED on
the key (sk-range-partitioned files: 0.09 s at 10 keys vs the ~0.7-
0.9 s warm O(store) scan floor, converging at ~300k fetched rows
where output volume dominates); against an unclustered source the
pushed In filter prunes nothing and still reads the whole store. So:
stay with the default scan while the store fits cluster memory;
switch to ``PushdownKeyedFetcher`` over a key-clustered/indexed
source when the store outgrows page cache (the scan floor becomes
disk-bound and store-size-linear: 5.75-22 s measured cold at 1 GB)
or when batches are small relative to the store (<=1k misses: 3-7x
under the warm scan). Both conditions hold in the 100 TB regime.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass
class SemiScanFetcher:
    """Default fetch semantics as a seam object: one scan of the
    in-session ``source``, semi-joined against the broadcast missed
    keys — no shuffle at any source size, but the scan is O(source)
    per batch (fine while the source is cluster-resident; see module
    docstring for the 100 TB shape)."""

    source: DataFrame
    key: str

    def fetch(self, missed_keys: DataFrame) -> DataFrame:
        return self.source.join(F.broadcast(missed_keys), self.key, "left_semi")


@dataclass
class PushdownKeyedFetcher:
    """Keyed external fetch: the missed keys become a source-side
    ``IN`` predicate, so only the matching rows are read — O(misses)
    per batch, independent of source size when the source is indexed
    or partition/row-group pruned on ``key``.

    ``max_keys`` bounds the driver collect (the pipelines' miss sets
    are batch-bounded by construction; a miss set above the bound is
    a caller bug, and failing loudly beats an unbounded collect).
    ``pushed_counts`` records each batch's key count for tests and
    diagnostics."""

    source: DataFrame
    key: str
    max_keys: int = 1_000_000
    pushed_counts: list = field(default_factory=list)

    def fetch(self, missed_keys: DataFrame) -> DataFrame:
        rows = missed_keys.select(self.key).limit(self.max_keys + 1).collect()
        if len(rows) > self.max_keys:
            raise ValueError(
                f"PushdownKeyedFetcher: miss set exceeds max_keys="
                f"{self.max_keys} — not a batch-bounded key set"
            )
        keys = [r[0] for r in rows]
        self.pushed_counts.append(len(keys))
        if not keys:
            # isin() rejects an empty list; a statically-false filter
            # keeps the schema and lets the optimizer prune the branch
            return self.source.filter(F.lit(False))
        return self.source.filter(F.col(self.key).isin(keys))
