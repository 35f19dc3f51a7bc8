"""Local replica of the driver's correctness gate.

Runs every `queries()` entry at sf0.01 on Spark, runs the matching
`oracle_sql()` through DuckDB on the same parquet tables, and compares
row count + schema (column names) + order-insensitive values.

The comparison deliberately mirrors the driver's pandas-based
canonicalizer, which is STRICTER than a tolerant stringify:

* both sides are materialized as pandas DataFrames (``toPandas()`` /
  ``fetchdf()``), so dtype artifacts are preserved — e.g. DuckDB's
  HUGEINT windowed sums arrive as float64 ``11.0`` while Spark emits
  int64 ``11``; those must NOT compare equal (they hash-mismatch on
  the driver — seen in round 2's ``sessionize_events``),
* list/array-typed output columns are rejected LOUDLY: the driver's
  ``sort_values`` over all columns cannot factorize list cells
  (round 2's ``extract_spans``: ``unhashable type: 'list'``), so we
  raise the same way instead of stringifying them.

Usage: python tools/check_oracles.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("SPARK_LOCAL_IP", "127.0.0.1")

import duckdb  # noqa: E402

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


class UnsortableOutput(Exception):
    """A query projected a column the driver's canonicalizer rejects."""


def _cell_str(v):
    """Dtype-preserving cell canonicalization (no float collapsing)."""
    import numpy as np

    if v is None:
        return "\x00NULL"
    if isinstance(v, float) and math.isnan(v):
        return "\x00NULL"
    if isinstance(v, (list, tuple, dict, set, np.ndarray)):
        # mirror the driver: pandas sort_values raises on list cells
        raise UnsortableOutput(
            f"unhashable type: {type(v).__name__!r} — project scalars only "
            "(e.g. concat_ws the array); the driver's canonicalizer "
            "cannot sort list-typed columns"
        )
    if isinstance(v, np.bool_):
        return str(bool(v))
    # str() keeps the dtype visible: float64 11.0 -> '11.0', int64 11
    # -> '11' (exactly the distinction the driver's hash sees)
    return str(v)


def canon_pandas(pdf):
    """Sorted-columns, sorted-rows, dtype-preserving canonical rows.

    Replicates the driver: sort columns by name, pandas ``sort_values``
    over all columns (which raises on list cells), then stringify each
    cell without dtype collapsing.
    """
    cols = sorted(pdf.columns)
    pdf = pdf[cols]
    rows = []
    for tup in pdf.itertuples(index=False, name=None):
        rows.append(tuple(_cell_str(v) for v in tup))
    rows.sort()
    return cols, rows


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entrymod
    from content_extractor_spark.session import get_spark

    spark = get_spark(
        master="local[8]",
        shuffle_partitions=8,
        extra_conf={"spark.driver.host": "127.0.0.1"},
    )
    con = duckdb.connect()
    for t in TABLES:
        path = f"{sf_dir}/{t}.parquet"
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.monotonic()
        try:
            sdf = fn(spark, sf_dir)
            spdf = sdf.toPandas()
        except Exception as exc:
            failures.append(name)
            print(f"FAIL {name}: spark error: {exc}")
            continue
        spark_sec = time.monotonic() - t0
        try:
            sc, sr = canon_pandas(spdf)
        except UnsortableOutput as exc:
            failures.append(name)
            print(f"FAIL {name}: spark output not canonicalizable: {exc}")
            continue
        if name not in oracles:
            print(
                f"SKIP-ORACLE {name}: rows={len(sr)} "
                f"({spark_sec:.1f}s, rows-only check)"
            )
            if len(sr) == 0:
                failures.append(name)
                print(f"FAIL {name}: zero rows from spark")
            continue
        try:
            dpdf = con.execute(oracles[name]).fetchdf()
            dc, dr = canon_pandas(dpdf)
        except UnsortableOutput as exc:
            failures.append(name)
            print(f"FAIL {name}: oracle output not canonicalizable: {exc}")
            continue
        except Exception as exc:
            failures.append(name)
            print(f"FAIL {name}: duckdb error: {exc}")
            continue
        status = []
        if len(sr) != len(dr):
            status.append(f"rowcount {len(sr)} vs {len(dr)}")
        if sc != dc:
            status.append(f"schema {sc} vs {dc}")
        if not status and sr != dr:
            diffs = [i for i, (a, b) in enumerate(zip(sr, dr)) if a != b][:3]
            msg = "; ".join(
                f"row{i}: spark={sr[i]} duck={dr[i]}" for i in diffs
            )
            status.append(f"values differ ({msg})")
        if status:
            failures.append(name)
            print(f"FAIL {name}: {'; '.join(status)}")
        else:
            print(f"OK   {name}: rows={len(sr)} ({spark_sec:.1f}s)")
    spark.stop()
    print(f"\n{len(failures)} failures: {failures}" if failures else "\nall green")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
