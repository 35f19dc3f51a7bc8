"""spark-submit entry point for the extraction pipeline.

Usage (cluster):
    zip -r pipeline.zip content_extractor_spark/
    spark-submit --py-files pipeline.zip jobs/extract_job.py \
        --input  <iceberg table or parquet path of documents(doc_id, spans, ...)> \
        --output <output root: spans_out/ metrics/ ledger/> \
        --profiles <dir of *.json/*.conf page profiles> \
        --mode all|new|existing --now 2021-07-01T00:00:00Z \
        --buckets 1024 --run-id run-2021-07-01

The job is resumable: re-submitting with the same --output continues
from the completed-bucket ledger (failed/straggler buckets only).

Scale guidance (north rule):
  * --buckets ≈ 2-4× total executor cores; buckets are both the resume
    unit and the skew spread (pmod(xxhash64(doc_id))) — hot hosts from
    a Zipfian distribution even out automatically.
  * documents at 10^12 rows: store Iceberg, partitioned by
    days(crawl_ts) + bucket(1024, doc_id); the mode filters (S2/S3)
    then prune partitions server-side.
  * AQE is on by default from session.get_spark(); skew-join splitting
    covers the dedup window's rare hot hashes (empty-content pages).
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--input", required=True)
    p.add_argument("--output", required=True)
    p.add_argument("--profiles", required=True, help="profile dir (*.json/*.conf)")
    p.add_argument("--mode", default="all", choices=["all", "new", "existing"])
    p.add_argument("--now", default="2021-07-01T00:00:00Z",
                   help="clock parameter (never wall-clock: determinism)")
    p.add_argument("--reanalysis-hours", type=int, default=48)
    p.add_argument("--buckets", type=int, default=256)
    p.add_argument("--run-id", default="run-0")
    p.add_argument("--entries", default=None,
                   help="existing entries table/path for dup-disable + ETag skip")
    args = p.parse_args(argv)

    from pyspark.sql import SparkSession

    from content_extractor_spark.kernel.profiles import load_profiles
    from content_extractor_spark.operators.scans import etag_unchanged_skip
    from content_extractor_spark.pipeline import PipelineConfig, run_extraction
    from content_extractor_spark.session import get_spark

    preexisting = SparkSession.getActiveSession() is not None
    spark = get_spark(app_name=f"content-extract-{args.run_id}")
    docs = (
        spark.read.table(args.input)
        if "/" not in args.input
        else spark.read.parquet(args.input)
    )
    profiles = load_profiles(args.profiles)
    existing = None
    if args.entries:
        existing = (
            spark.read.table(args.entries)
            if "/" not in args.entries
            else spark.read.parquet(args.entries)
        )
        docs = etag_unchanged_skip(docs, existing)

    summary = run_extraction(
        spark, docs, profiles, args.output,
        PipelineConfig(
            num_buckets=args.buckets, mode=args.mode, now_iso=args.now,
            reanalysis_interval_hours=args.reanalysis_hours, run_id=args.run_id,
        ),
        existing_entries=existing,
    )
    print(json.dumps(summary))
    if not preexisting:
        spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
