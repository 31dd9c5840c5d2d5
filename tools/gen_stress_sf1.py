"""Deterministic stress tables for the 10x scaling audit.

TESTDATA.md caps the driver-generated data at sf0.1; the scale audit
needs a clean 10x experiment to catch constant-factor surprises the
design review can't. Two directories with the SAME distribution at
1x and 10x rows (``.stressdata/stress1x`` / ``stress10x``), so the
runtime ratio between them isolates ENGINE scaling:

* documents: large vocab (~2k words) -> background Jaccard is tiny,
  with planted near-dups (2%, one-word swap) and exact dups — output
  pair volume grows ~linearly with the corpus, the realistic dedup
  regime. (The driver's sf0.1 documents draw from a ~34-word vocab,
  where >20% of ALL pairs qualify at 0.8 — output is inherently
  quadratic there, so a naive sf0.1-vs-10x ratio would read as a
  superlinear engine even for a perfectly linear one.)
* events: iid 2-decimal gamma values (q29's series contract).
* embeddings: unit-norm gaussian vectors.

Seeded per table+scale; idempotent (skips existing files). Pure
numpy/pyarrow. Usage:
PYTHONPATH=/root/repo python3 tools/gen_stress_sf1.py [base_dir]
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

BASE_DIR = "/root/repo/.stressdata"
SCALES = {"stress1x": 1, "stress10x": 10}
N_DOCS, N_EVENTS, N_VECS = 5_000, 100_000, 2_000  # 1x = the sf0.1 shape

# pyarrow's default writes ONE row group per table; Spark splits
# parquet by byte ranges but cannot split inside a row group, so a
# single-row-group 100 MB file gives 24 empty tasks and one task
# holding every row — the whole scan-side pipeline (signature
# emission, LSH shingling) ran single-threaded on the 100x fixtures
# (r10 finding: a 350k-doc store build pinned one core for ~6 min
# while 31 idled). Bounded row groups make the fixture behave like
# real warehouse data, where files/row groups are sized for splits.
ROW_GROUP_ROWS = 20_000


def _splittable(path: str) -> bool:
    """True when an existing fixture file has bounded row groups.

    The r10 row-group fix only applies when files are (re)generated;
    hosts carrying pre-r10 fixtures would silently keep the
    single-row-group files and the single-threaded 100x scan
    pathology (ADVICE r10) — so existence checks validate the layout
    and force a regenerate when any row group exceeds the bound.
    Unreadable/corrupt files also regenerate."""
    try:
        md = pq.ParquetFile(path).metadata
    except Exception:
        return False
    return md.num_row_groups > 0 and all(
        md.row_group(i).num_rows <= ROW_GROUP_ROWS
        for i in range(md.num_row_groups)
    )

_BASE = (
    "batch part spark line column order small sort fast value scan hash "
    "slow group agg filter query big key window row table stream merge "
    "data join shuffle stage task broadcast skew limit index cache"
).split()
VOCAB = np.array([f"{w}{i}" for w in _BASE for i in range(60)])
LANGS = ["en", "zh", "de", "fr", "es"]
EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]


def gen_documents(path: str, rng: np.random.RandomState, n: int) -> None:
    lens = rng.randint(8, 101, size=n)
    texts = [
        " ".join(VOCAB[rng.randint(0, len(VOCAB), k)]) for k in lens
    ]
    # ~2% near-dups (one word swapped -> Jaccard ~0.9+) and sparse
    # exact dups; dup volume scales LINEARLY with the corpus
    for i in range(0, n, 50):
        src = int(rng.randint(0, n))
        toks = texts[src].split()
        toks[int(rng.randint(0, len(toks)))] = str(
            VOCAB[int(rng.randint(0, len(VOCAB)))]
        )
        texts[i] = " ".join(toks)
    for i in range(1, n, 500):
        texts[i] = texts[(i + 17) % n]
    tbl = pa.table(
        {
            "doc_id": pa.array(range(n), pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array([LANGS[i % len(LANGS)] for i in range(n)]),
            "source": pa.array([f"src{i % 20}" for i in range(n)]),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }
    )
    pq.write_table(tbl, path, row_group_size=ROW_GROUP_ROWS)


def gen_events(path: str, rng: np.random.RandomState, n: int) -> None:
    base = np.datetime64("2024-01-01T00:00:00.000000")
    gaps = rng.exponential(2.6e6, size=n).astype("int64")  # ~usec
    ts = base + np.cumsum(gaps).astype("timedelta64[us]")
    value = np.round(np.abs(rng.gamma(2.0, 25.0, size=n)), 2)
    tbl = pa.table(
        {
            "event_id": pa.array(range(n), pa.int64()),
            "ts": pa.array(ts, pa.timestamp("us")),
            "user_id": pa.array(rng.randint(0, 15_000, size=n), pa.int64()),
            "event_type": pa.array(
                [EVENT_TYPES[i] for i in rng.randint(0, 5, size=n)]
            ),
            "value": pa.array(value, pa.float64()),
            "props": pa.array(
                [json.dumps({"k": int(k)}) for k in rng.randint(0, 100, size=n)]
            ),
        }
    )
    pq.write_table(tbl, path, row_group_size=ROW_GROUP_ROWS)


def gen_embeddings(path: str, rng: np.random.RandomState, n: int) -> None:
    mat = rng.randn(n, 64)
    mat /= np.linalg.norm(mat, axis=1, keepdims=True)
    tbl = pa.table(
        {
            "vec_id": pa.array(range(n), pa.int64()),
            "embedding": pa.array(
                [row.astype(np.float32) for row in mat],
                pa.list_(pa.float32()),
            ),
            "label": pa.array(rng.randint(0, 16, size=n), pa.int32()),
        }
    )
    pq.write_table(tbl, path, row_group_size=ROW_GROUP_ROWS)


def ensure_dedup_100x(base_dir: str = BASE_DIR) -> str:
    """100x documents-only point (500k docs, same distribution) for
    the dedup posture audit: LSH near-linearity + label-propagation
    round count at two orders of magnitude above the bench corpus.
    Components here are star-ish (each near-dup copies a random
    source), so convergence is fast; the O(log diameter)
    pointer-jumping worst case is pinned separately by the 200-node
    chain pytest."""
    d = os.path.join(base_dir, "stress100x")
    os.makedirs(d, exist_ok=True)
    path = os.path.join(d, "documents.parquet")
    if not os.path.exists(path) or not _splittable(path):
        gen_documents(path, np.random.RandomState(42 + 10 * 100), N_DOCS * 100)
    return d


def gen_part_100x(path: str, rng: np.random.RandomState, n: int) -> None:
    """A part-like stored dimension at 100x sf0.1 (2M rows, same
    schema/width as testdata's part table) for the q33_100x point:
    the DS-Join pipeline's store side, big enough that per-batch
    store-side work is measurable and any accidental store shuffle
    or broadcast would dominate."""
    nouns = ["ring", "bolt", "washer", "gear", "cam", "rod", "pin", "nut"]
    adjs = ["large", "hot", "small", "cold", "round", "flat", "long", "dim"]
    names = np.array(
        [f"{adjs[i % 8]} {nouns[(i // 8) % 8]}" for i in range(64)]
    )
    types = np.array(["LARGE", "ECONOMY", "STANDARD", "SMALL", "PROMO"])
    keys = np.arange(n, dtype=np.int64)
    tbl = pa.table(
        {
            "p_partkey": pa.array(keys),
            "p_name": pa.array(names[keys % 64]),
            "p_brand": pa.array([f"Brand#{int(k)}" for k in keys % 25]),
            "p_type": pa.array(types[keys % 5]),
            "p_size": pa.array((keys % 50 + 1).astype(np.int32)),
            "p_retailprice": pa.array(
                np.round(900.0 + (keys % 20000) * 0.1, 2)
            ),
        }
    )
    pq.write_table(tbl, path, row_group_size=ROW_GROUP_ROWS)


def ensure_q33_100x(base_dir: str = BASE_DIR) -> str:
    """100x equi-join store (2M part rows ≈ 100x sf0.1's 20k) for the
    q33_100x bench point — the DS-Join scaling axis (advantage grows
    with DB size at fixed per-batch query volume, DS-Join/README.md).
    Probe batches are derived arithmetically in bench.py from the key
    space, so only the store is a fixture."""
    d = os.path.join(base_dir, "q33_100x")
    os.makedirs(d, exist_ok=True)
    path = os.path.join(d, "part_100x.parquet")
    if not os.path.exists(path) or not _splittable(path):
        gen_part_100x(path, np.random.RandomState(42 + 33), 2_000_000)
    return d


def ensure_stress(base_dir: str = BASE_DIR) -> dict[str, str]:
    """Generate (if missing) both scale points; returns {name: dir}."""
    out = {}
    for name, mult in SCALES.items():
        d = os.path.join(base_dir, name)
        os.makedirs(d, exist_ok=True)
        # per-table+scale seeds: any one file regenerates identically
        for i, (tbl, fn, n1x) in enumerate(
            (
                ("documents", gen_documents, N_DOCS),
                ("events", gen_events, N_EVENTS),
                ("embeddings", gen_embeddings, N_VECS),
            )
        ):
            path = os.path.join(d, f"{tbl}.parquet")
            if not os.path.exists(path) or not _splittable(path):
                fn(path, np.random.RandomState(42 + 10 * mult + i), n1x * mult)
        out[name] = d
    return out


if __name__ == "__main__":
    dirs = ensure_stress(sys.argv[1] if len(sys.argv) > 1 else BASE_DIR)
    for name, d in dirs.items():
        print(name, d)
