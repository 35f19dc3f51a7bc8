"""Full re-analysis flow: extraction + change detection + entries upsert
(SURVEY §3.3: docs ⟕ entries → extract → changed-filter → MERGE)."""

import pytest
from pyspark.sql import functions as F

from content_extractor_spark import synth
from content_extractor_spark.pipeline import PipelineConfig, run_extraction


def test_reanalysis_updates_entries(spark, tmp_path):
    docs = synth.documents_df(spark, 120, n_hosts=4, seed=21, partitions=2).cache()
    profiles = synth.all_profiles(4)

    # first run: no existing entries -> everything is a create
    out1 = str(tmp_path / "run1")
    entries0 = spark.createDataFrame(
        [],
        "entry_id string, url_id string, title string, summary string, "
        "content string, date string, tags array<string>, etag string, "
        "image_url string, content_hash long, disabled boolean",
    )
    s1 = run_extraction(
        spark, docs, profiles, out1, PipelineConfig(num_buckets=4, run_id="r1"),
        existing_entries=entries0,
    )
    assert s1["actions"].get("create", 0) == s1["ok"]
    assert "update" not in s1["actions"] and "skip" not in s1["actions"]
    entries1 = spark.read.parquet(f"{out1}/entries_next")
    assert entries1.count() == s1["ok"]

    # second run over the SAME docs with entries1 -> everything unchanged
    out2 = str(tmp_path / "run2")
    s2 = run_extraction(
        spark, docs, profiles, out2, PipelineConfig(num_buckets=4, run_id="r2"),
        existing_entries=entries1,
    )
    assert s2["actions"].get("skip", 0) == s2["ok"]
    assert "update" not in s2["actions"] and "create" not in s2["actions"]
    entries2 = spark.read.parquet(f"{out2}/entries_next")
    assert entries2.count() == entries1.count()

    # third run with tampered stored titles -> every row becomes an update
    tampered = entries1.withColumn("title", F.concat(F.lit("OLD::"), F.col("title")))
    out3 = str(tmp_path / "run3")
    s3 = run_extraction(
        spark, docs, profiles, out3, PipelineConfig(num_buckets=4, run_id="r3"),
        existing_entries=tampered,
    )
    assert s3["actions"].get("update", 0) == s3["ok"]
    entries3 = spark.read.parquet(f"{out3}/entries_next")
    # updated rows carry the fresh titles again
    assert entries3.where(F.col("title").startswith("OLD::")).count() == 0
