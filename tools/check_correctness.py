"""Local stand-in for the driver's correctness gate.

Runs every registered query at sf0.01 through Spark AND its DuckDB
oracle, then compares row count, column names, and order-insensitive
values (columns sorted by name, rows sorted by all columns). Exact
equality — stricter than a hash, so passing here should pass there.

Usage: python tools/check_correctness.py [name_filter ...]
"""

from __future__ import annotations

import math
import os
import sys
import time

import duckdb

from distributed_stream_processing_spark.catalog import TABLES
from distributed_stream_processing_spark.plans import load_all
from distributed_stream_processing_spark.session import get_spark

SF_DIR = os.environ.get("CHECK_SF_DIR", "/root/testdata/sf0.01")


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def normalize(rows: list[tuple], cols: list[str]) -> list[tuple]:
    """Sort columns by name and rows by value, normalizing scalars."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])

    def norm(v):
        if v is None:
            return None
        if isinstance(v, bool):
            return bool(v)
        if isinstance(v, float):
            if math.isnan(v):
                return "NaN"
            return float(v)
        if isinstance(v, int):
            return int(v)
        return str(v)

    out = [tuple(norm(r[i]) for i in order) for r in rows]
    out.sort(key=lambda t: tuple((x is None, str(type(x)), str(x)) for x in t))
    return out


def main() -> int:
    filters = sys.argv[1:]
    specs = load_all()
    spark = get_spark("check_correctness")
    con = duck_connection(SF_DIR)

    n_pass = n_fail = n_skip = 0
    for name, spec in sorted(specs.items()):
        if filters and not any(f in name for f in filters):
            continue
        t0 = time.time()
        try:
            sdf = spec.fn(spark, SF_DIR)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: spark error: {e}")
            n_fail += 1
            continue
        if spec.oracle is None:
            print(f"skip  {name}: rows-only ({len(srows)} rows, {time.time()-t0:.1f}s)")
            n_skip += 1
            continue
        try:
            res = con.execute(spec.oracle)
            dcols = [d[0] for d in res.description]
            drows = res.fetchall()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: duckdb error: {e}")
            n_fail += 1
            continue

        problems = []
        if len(srows) != len(drows):
            problems.append(f"rowcount spark={len(srows)} duck={len(drows)}")
        if sorted(scols) != sorted(dcols):
            problems.append(f"cols spark={sorted(scols)} duck={sorted(dcols)}")
        if not problems:
            ns, nd = normalize(srows, scols), normalize(drows, dcols)
            if ns != nd:
                diffs = [i for i, (a, b) in enumerate(zip(ns, nd)) if a != b]
                ex = ""
                if diffs:
                    i = diffs[0]
                    ex = f" first@{i}: spark={ns[i]} duck={nd[i]}"
                problems.append(f"values differ in {len(diffs)} rows{ex}")
        if problems:
            print(f"FAIL  {name}: {'; '.join(problems)}")
            n_fail += 1
        else:
            print(f"PASS  {name} ({len(srows)} rows, {time.time()-t0:.1f}s)")
            n_pass += 1

    print(f"\n{n_pass} pass, {n_fail} fail, {n_skip} rows-only")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
