"""Deterministic sf1 stress tables (10x the bench scale).

TESTDATA.md caps the driver-generated data at sf0.1; the scale audit
needs one 10x point to catch constant-factor surprises the design
review can't. This generator writes schema-compatible `documents`,
`events`, and `embeddings` parquet (the three tables the stress bench
reads — q21/q48 on documents, q29 on events) to
``/root/repo/.stressdata/sf1`` with seed 42. Idempotent: skips tables
that already exist. Pure numpy/pyarrow, ~seconds for 1M events.

Usage: PYTHONPATH=/root/repo python3 tools/gen_stress_sf1.py [out_dir]
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SF1_DIR = "/root/repo/.stressdata/sf1"
N_DOCS = 50_000
N_EVENTS = 1_000_000
N_VECS = 20_000

VOCAB = (
    "batch part spark line column order small sort fast value scan hash "
    "slow group agg filter query big key window row table stream merge "
    "data join shuffle stage task broadcast skew limit index cache"
).split()
LANGS = ["en", "zh", "de", "fr", "es"]
EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]


def gen_documents(path: str, rng: np.random.RandomState) -> None:
    lens = rng.randint(8, 101, size=N_DOCS)
    texts = []
    for n in lens:
        texts.append(" ".join(np.array(VOCAB)[rng.randint(0, len(VOCAB), n)]))
    # plant near-dups (~2%: one word swapped) and a few exact dups,
    # mirroring the sf0.1 fixture's duplicate structure at 10x
    for i in range(0, N_DOCS, 50):
        src = int(rng.randint(0, N_DOCS))
        toks = texts[src].split()
        toks[int(rng.randint(0, len(toks)))] = VOCAB[int(rng.randint(0, len(VOCAB)))]
        texts[i] = " ".join(toks)
    for i in range(1, N_DOCS, 5000):
        texts[i] = texts[(i + 17) % N_DOCS]
    tbl = pa.table(
        {
            "doc_id": pa.array(range(N_DOCS), pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array([LANGS[i % len(LANGS)] for i in range(N_DOCS)]),
            "source": pa.array([f"src{i % 20}" for i in range(N_DOCS)]),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }
    )
    pq.write_table(tbl, path)


def gen_events(path: str, rng: np.random.RandomState) -> None:
    base = np.datetime64("2024-01-01T00:00:00.000000")
    gaps = rng.exponential(2.6e6, size=N_EVENTS).astype("int64")  # ~usec
    ts = base + np.cumsum(gaps).astype("timedelta64[us]")
    value = np.round(np.abs(rng.gamma(2.0, 25.0, size=N_EVENTS)), 2)
    tbl = pa.table(
        {
            "event_id": pa.array(range(N_EVENTS), pa.int64()),
            "ts": pa.array(ts, pa.timestamp("us")),
            "user_id": pa.array(
                rng.randint(0, 15_000, size=N_EVENTS), pa.int64()
            ),
            "event_type": pa.array(
                [EVENT_TYPES[i] for i in rng.randint(0, 5, size=N_EVENTS)]
            ),
            "value": pa.array(value, pa.float64()),
            "props": pa.array(
                [json.dumps({"k": int(k)}) for k in rng.randint(0, 100, size=N_EVENTS)]
            ),
        }
    )
    pq.write_table(tbl, path)


def gen_embeddings(path: str, rng: np.random.RandomState) -> None:
    mat = rng.randn(N_VECS, 64)
    mat /= np.linalg.norm(mat, axis=1, keepdims=True)
    tbl = pa.table(
        {
            "vec_id": pa.array(range(N_VECS), pa.int64()),
            "embedding": pa.array(
                [row.astype(np.float32) for row in mat],
                pa.list_(pa.float32()),
            ),
            "label": pa.array(rng.randint(0, 16, size=N_VECS), pa.int32()),
        }
    )
    pq.write_table(tbl, path)


def ensure_sf1(out_dir: str = SF1_DIR) -> str:
    os.makedirs(out_dir, exist_ok=True)
    # per-table seeds: regeneration of any one table is deterministic
    # even when the others already exist
    for i, (name, fn) in enumerate(
        (
            ("documents", gen_documents),
            ("events", gen_events),
            ("embeddings", gen_embeddings),
        )
    ):
        path = os.path.join(out_dir, f"{name}.parquet")
        if not os.path.exists(path):
            fn(path, np.random.RandomState(42 + i))
    return out_dir


if __name__ == "__main__":
    d = ensure_sf1(sys.argv[1] if len(sys.argv) > 1 else SF1_DIR)
    print(d)
