"""Incremental extraction as a Structured Streaming job.

The reference's re-analysis loop (phase 2, SURVEY §2.5 O6) is a batch
predicate in our engine; for continuously-arriving documents the same
extraction stage runs under Structured Streaming instead:

    readStream(file source over the documents table/landing dir)
      → scan filters (P1/P5)
      → mapInArrow extraction (same kernel, same broadcast profiles)
      → writeStream parquet sink, checkpointed

Checkpointing gives exactly-once file-source progress tracking — the
streaming analog of the batch pipeline's bucket ledger. The extraction
operator is reused verbatim: mapInArrow works identically on streaming
DataFrames (stateless map).

Stateful aggregation (e.g. windowed per-host counts with late data)
is provided by `host_rates` using event-time watermarks.
"""

from __future__ import annotations

from typing import Dict, Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..kernel.profiles import ProfileConfig
from ..operators.extract import extract_entries
from ..operators.scans import file_ending_exclusion, url_is_valid
from ..synth import DOCUMENTS_DDL


def streaming_extract(
    spark: SparkSession,
    input_path: str,
    profiles: Dict[str, ProfileConfig],
    schema_ddl: str = DOCUMENTS_DDL,
    max_files_per_trigger: Optional[int] = None,
) -> DataFrame:
    """documents landing dir -> streaming DataFrame of extracted entries."""
    reader = (
        spark.readStream.schema(schema_ddl)
        .format("parquet")
    )
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    docs = reader.load(input_path)
    docs = docs.filter(url_is_valid()).filter(file_ending_exclusion())
    return extract_entries(docs, profiles)


def run_available_now(
    extracted: DataFrame, output_path: str, checkpoint_path: str
) -> None:
    """Drain everything currently available, then stop (batch-like run
    with streaming checkpoint semantics — resumable by re-invoking)."""
    q = (
        extracted.writeStream.format("parquet")
        .option("path", output_path)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .outputMode("append")
        .start()
    )
    q.awaitTermination()


def host_rates(docs: DataFrame, window: str = "1 minute",
               watermark: str = "2 minutes") -> DataFrame:
    """Windowed per-host document counts with late-data watermarking —
    the observability analog of the reference's per-host rate limiting
    (UrlHandlingSupport.scala:582-642), as a monitoring aggregate."""
    return (
        docs.withColumn("event_time", F.to_timestamp(F.col("last_crawl")))
        .withWatermark("event_time", watermark)
        .groupBy(F.window("event_time", window), F.col("host"))
        .agg(F.count("*").alias("docs"))
    )
