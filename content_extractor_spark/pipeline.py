"""End-to-end extraction pipeline with checkpointed resume + metrics.

Dataflow (SURVEY §3.2 Spark equivalent):

    documents ──filter(P5,P1, phase mode)──►
      ──[resume: anti-join completed-bucket ledger]──►
      ──mapInArrow(extract, broadcast profiles)──►
      ──window dedup on content_hash (A2)──►
      ──[optional: change detection vs existing entries (A3-A6)]──►
      spans_out sink (+ metrics table, + ledger commit)

Scale notes (north rule):
  * extraction itself is shuffle-free: scan splits are sized by
    spark.sql.files.maxPartitionBytes and the UDF is map-only;
  * the only shuffles are the dedup window (content_hash ~unique →
    uniform) and the resume bucket assignment (pmod(xxhash64(doc_id)))
    which doubles as explicit skew neutralization: hot hosts spread
    evenly over buckets regardless of the Zipfian host distribution;
  * resume: work is partitioned into `num_buckets` deterministic
    buckets; each bucket commits its output and a ledger row
    atomically-enough (parquet dir per bucket; Iceberg snapshot per
    bucket when available). A re-run anti-joins the ledger and only
    processes missing buckets — lineage preserved, no dup/loss.
  * metrics: per-bucket docs parsed, spans emitted, status counts,
    profile hit/miss (mirrors the reference's timing/err logging,
    Analyzer.scala:228-253, ExtractionSupervisor.scala:399-404).
"""

from __future__ import annotations

import os
import time
from dataclasses import dataclass
from typing import Dict, Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .kernel.profiles import ProfileConfig
from .operators.changes import plan_actions
from .operators.dedup import mark_duplicates
from .operators.extract import extract_entries
from .operators.scans import scannable_documents
from .sources.io import apply_entry_actions


@dataclass
class PipelineConfig:
    num_buckets: int = 64
    mode: str = "all"  # all | new | existing
    now_iso: str = "2021-07-01T00:00:00Z"
    reanalysis_interval_hours: int = 48
    run_id: str = "run-0"
    # reference TARGET_DATE_TIME_PATTERN / TARGET_TIME_ZONE
    # (Config.scala:61-62, defaults :74-75)
    target_date_pattern: str = "yyyy-MM-dd'T'HH:mm:ssXXX"
    target_zone: str = "UTC"


def with_bucket(df: DataFrame, num_buckets: int) -> DataFrame:
    """Deterministic work bucket; also the resume + skew-spread unit."""
    return df.withColumn(
        "bucket", F.pmod(F.xxhash64(F.col("doc_id")), F.lit(num_buckets)).cast("int")
    )


def completed_buckets(spark: SparkSession, ledger_path: str) -> Optional[DataFrame]:
    try:
        ledger = spark.read.parquet(ledger_path)
        return ledger.where(F.col("status") == "done").select("bucket").distinct()
    except Exception:
        return None  # no ledger yet


def run_extraction(
    spark: SparkSession,
    documents: DataFrame,
    profiles: Dict[str, ProfileConfig],
    output_path: str,
    cfg: Optional[PipelineConfig] = None,
    existing_entries: Optional[DataFrame] = None,
) -> dict:
    """Run the full pipeline; returns summary metrics (a plain dict).

    Writes:
      {output_path}/spans_out/   extracted spans (partitioned by bucket)
      {output_path}/metrics/     per-bucket metrics rows
      {output_path}/ledger/      completed-bucket ledger
    """
    cfg = cfg or PipelineConfig()
    t0 = time.monotonic()
    docs = scannable_documents(
        documents, cfg.mode, cfg.now_iso, cfg.reanalysis_interval_hours
    )
    docs = with_bucket(docs, cfg.num_buckets)

    ledger_path = os.path.join(output_path, "ledger")
    done = completed_buckets(spark, ledger_path)
    resumed_buckets = 0
    if done is not None:
        resumed_buckets = done.count()
        docs = docs.join(F.broadcast(done), "bucket", "left_anti")

    # Extraction is map-only over scan splits: no shuffle of raw HTML.
    # derive_spans=False: the spans array is a full duplicate of
    # title/summary/content/tags, and the pipeline has two exchanges
    # ahead (dedup window on content_hash, bucket repartition for the
    # partitioned write) — assembling it only AFTER the last exchange
    # roughly halves the bytes both shuffles carry (guide §2.3/§8);
    # the assembly itself is a pure codegen projection either way.
    extracted = extract_entries(
        docs, profiles,
        target_pattern=cfg.target_date_pattern, target_zone=cfg.target_zone,
        derive_spans=False,
    )
    # re-derive the bucket on the compact output, shuffle THAT (not the
    # input) for the partitioned write; the dedup window adds its own
    # content_hash shuffle.
    extracted = with_bucket(extracted, cfg.num_buckets)

    spans_path = os.path.join(output_path, "spans_out")
    # dedup also against rows committed by PRIOR runs of this output
    # (resume case): hashes already on disk disable this run's copies
    dedup_baseline = existing_entries
    if done is not None:
        try:
            prior = spark.read.parquet(spans_path).select(
                "content_hash", F.coalesce(F.col("disabled"), F.lit(False)).alias("disabled")
            )
            dedup_baseline = (
                prior
                if dedup_baseline is None
                else dedup_baseline.select("content_hash", "disabled").unionByName(prior)
            )
        except Exception:
            pass  # ledger existed but no spans written yet
    deduped = mark_duplicates(extracted, dedup_baseline)
    # span assembly AFTER the last exchange: the repartition below is
    # the final shuffle, so the heavy derived column never crosses the
    # network. n_spans is materialized at write time so the metrics
    # pass never re-reads the heavy spans array column (column pruning
    # makes the read-back scan footers + small ints only).
    from .operators.extract import EXTRACT_SCHEMA, derive_spans_col

    deduped = (
        deduped.repartition(cfg.num_buckets, "bucket")
        .withColumn("spans", derive_spans_col())
        .withColumn(
            "n_spans", F.size(F.coalesce(F.col("spans"), F.array())).cast("int")
        )
        # written column order identical to the pre-r7 layout
        .select(
            *[f.name for f in EXTRACT_SCHEMA.fields],
            "bucket", "disabled", "n_spans",
        )
    )
    (
        deduped.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("bucket")
        .parquet(spans_path)
    )

    # metrics per bucket, for the buckets processed in THIS run only.
    # mergeSchema: a resumed output may mix bucket files written by an
    # older code version (without n_spans) with this run's files — the
    # merged schema guarantees the column resolves (old buckets are
    # excluded from the aggregate by the anti-join below anyway)
    try:
        out_df = spark.read.option("mergeSchema", "true").parquet(spans_path)
    except Exception:
        # zero-row input: nothing was written (no parquet footers to read)
        return {
            "docs_parsed": 0, "spans_emitted": 0, "ok": 0, "profile_miss": 0,
            "no_title": 0, "errors": 0, "disabled_dups": 0,
            "wall_sec": time.monotonic() - t0, "resumed_buckets": resumed_buckets,
        }
    new_out = (
        out_df
        if done is None
        else out_df.join(F.broadcast(done), "bucket", "left_anti")
    )
    metrics = (
        new_out.groupBy("bucket")
        .agg(
            F.count("*").alias("docs_parsed"),
            F.sum("n_spans").alias("spans_emitted"),
            F.sum((F.col("status") == "ok").cast("long")).alias("ok"),
            F.sum((F.col("status") == "profile_miss").cast("long")).alias("profile_miss"),
            F.sum((F.col("status") == "no_title").cast("long")).alias("no_title"),
            F.sum((F.col("status") == "error").cast("long")).alias("errors"),
            F.sum(F.coalesce(F.col("disabled").cast("long"), F.lit(0))).alias("disabled_dups"),
        )
        .withColumn("run_id", F.lit(cfg.run_id))
        .cache()  # tiny (one row per bucket); reused for the ledger
    )
    metrics.write.mode("append").parquet(os.path.join(output_path, "metrics"))

    # commit ledger rows for the buckets processed in this run — derived
    # from the cached metrics, NOT a second scan of the output
    processed = metrics.select("bucket").distinct()
    (
        processed.withColumn("status", F.lit("done"))
        .withColumn("run_id", F.lit(cfg.run_id))
        .write.mode("append")
        .parquet(ledger_path)
    )
    metrics.unpersist()

    summary_rows = (
        spark.read.parquet(os.path.join(output_path, "metrics"))
        .groupBy()
        .agg(
            F.sum("docs_parsed").alias("docs_parsed"),
            F.sum("spans_emitted").alias("spans_emitted"),
            F.sum("ok").alias("ok"),
            F.sum("profile_miss").alias("profile_miss"),
            F.sum("no_title").alias("no_title"),
            F.sum("errors").alias("errors"),
            F.sum("disabled_dups").alias("disabled_dups"),
        )
        .collect()[0]
        .asDict()
    )
    # change detection + entries upsert (A3-A6 + S7): when an existing
    # entries table is supplied, plan create/update/skip per url and
    # write the next entries-table state (set-based MERGE)
    if existing_entries is not None:
        planned = plan_actions(
            spark.read.parquet(spans_path).where(F.col("status") == "ok"),
            existing_entries,
        )
        action_counts = {
            r["action"]: r["n"]
            for r in planned.groupBy("action").agg(F.count("*").alias("n")).collect()
        }
        next_entries = apply_entry_actions(
            existing_entries,
            planned,
            clock=cfg.now_iso,
            reanalysis_interval_hours=cfg.reanalysis_interval_hours,
        )
        next_entries.write.mode("overwrite").parquet(
            os.path.join(output_path, "entries_next")
        )
        summary_rows["actions"] = action_counts

    summary_rows["wall_sec"] = time.monotonic() - t0
    summary_rows["resumed_buckets"] = resumed_buckets
    return summary_rows
