"""Extra benchmarks for optimization work (guide §1.4): per-query noop
isolation with warm repetitions, so compile/plan overhead and per-row
cost can be told apart. Does NOT replace bench.py (frozen for the
driver); cite numbers from here in OPTIMIZATION_r07.md.

Usage: python bench_extra.py <query> [query ...] [--sf-dir DIR] [--reps N]
       python bench_extra.py --all
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
os.environ.setdefault("SPARK_LOCAL_IP", "127.0.0.1")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="*")
    ap.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--all", action="store_true")
    ap.add_argument("--explain", action="store_true",
                    help="also dump .explain('formatted') to stdout")
    args = ap.parse_args()

    from bench import BENCH_QUERIES, _session
    import __spark_entry__ as entrymod

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = _session(cpus)
    qs = entrymod.queries()
    names = BENCH_QUERIES if args.all else args.queries
    print(f"# sf_dir={args.sf_dir} cpus={cpus} load={os.getloadavg()[0]:.1f}")
    for name in names:
        fn = qs[name]
        times = []
        for _ in range(args.reps):
            t0 = time.monotonic()
            df = fn(spark, args.sf_dir)
            df.write.format("noop").mode("overwrite").save()
            times.append(round(time.monotonic() - t0, 3))
        print(f"{name}: min={min(times)} all={times}")
        if args.explain:
            df = fn(spark, args.sf_dir)
            print(df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"))
    spark.stop()


if __name__ == "__main__":
    main()
