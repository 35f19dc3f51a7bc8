"""End-to-end pipeline tests: span-for-span equality vs the kernel,
resume-from-ledger, metrics, and the relational tail on Spark."""

import pytest
from pyspark.sql import functions as F

from content_extractor_spark import synth
from content_extractor_spark.kernel.analyzer import analyze
from content_extractor_spark.kernel.spans import entry_to_spans, spans_to_html
from content_extractor_spark.operators.extract import extract_entries
from content_extractor_spark.operators.scans import (
    file_ending_exclusion,
    is_new,
    needs_reanalysis,
)
from content_extractor_spark.pipeline import PipelineConfig, run_extraction

N_DOCS = 240
N_HOSTS = 8


@pytest.fixture(scope="module")
def corpus(spark):
    df = synth.documents_df(spark, N_DOCS, n_hosts=N_HOSTS, seed=7, partitions=4)
    df.cache()
    assert df.count() == N_DOCS
    return df


@pytest.fixture(scope="module")
def profiles():
    return synth.all_profiles(N_HOSTS)


def test_extract_matches_kernel_row_for_row(spark, corpus, profiles):
    """Pipeline output spans must equal the kernel's spans per document."""
    out = extract_entries(corpus, profiles)
    got = {r["doc_id"]: r for r in out.collect()}
    rows = corpus.collect()
    assert len(got) == len(rows)
    checked_ok = 0
    for row in rows:
        d = row.asDict(recursive=True)
        res = analyze(
            d["url"], spans_to_html(d["spans"]),
            profiles.get(d["host"].replace("www.", "www.")) or profiles.get(d["host"]),
            d["etag"],
        ) if d["host"] in profiles else None
        g = got[d["doc_id"]]
        if res is None:
            assert g["status"] == "profile_miss"
            continue
        assert g["status"] == res.status, d["doc_id"]
        if res.status == "ok":
            expected_spans = entry_to_spans(res.entry)
            actual = [s.asDict() for s in (g["spans"] or [])]
            assert actual == expected_spans, d["doc_id"]
            assert g["content_hash"] == res.entry.content_hash()
            checked_ok += 1
    assert checked_ok > N_DOCS // 2  # most docs extract successfully


def test_status_mix_present(spark, corpus, profiles):
    out = extract_entries(corpus, profiles)
    counts = dict(
        out.groupBy("status").count().collect()
    )
    counts = {r: c for r, c in [(row["status"], row["count"]) for row in out.groupBy("status").count().collect()]}
    assert counts.get("ok", 0) > 0
    assert counts.get("profile_miss", 0) > 0  # unknown hosts in corpus


def test_scan_filters(spark, corpus):
    base = corpus.count()
    kept = corpus.filter(file_ending_exclusion()).count()
    assert 0 < kept < base  # some .pdf/.jpg urls excluded
    new = corpus.filter(is_new()).count()
    existing = corpus.filter(needs_reanalysis("2021-07-01T00:00:00Z", 48)).count()
    assert new + existing == base  # two-phase split covers the corpus


def test_full_pipeline_with_resume(spark, corpus, profiles, tmp_path):
    out_dir = str(tmp_path / "out")
    cfg = PipelineConfig(num_buckets=8, mode="all", run_id="r1")
    s1 = run_extraction(spark, corpus, profiles, out_dir, cfg)
    assert s1["docs_parsed"] > 0
    assert s1["ok"] > 0
    assert s1["spans_emitted"] > 0
    assert s1["resumed_buckets"] == 0
    total_first = s1["docs_parsed"]

    # resume: second run must find the ledger complete and add nothing
    s2 = run_extraction(
        spark, corpus, profiles, out_dir, PipelineConfig(num_buckets=8, run_id="r2")
    )
    assert s2["resumed_buckets"] == 8
    assert s2["docs_parsed"] == total_first  # no dup, no loss

    spans_out = spark.read.parquet(f"{out_dir}/spans_out")
    assert spans_out.count() == total_first
    assert spans_out.select("doc_id").distinct().count() == total_first


def test_partial_ledger_resume_no_dup_no_loss(spark, corpus, profiles, tmp_path):
    """Simulate a crash after k buckets: pre-seed a partial ledger, run,
    verify every doc appears exactly once."""
    out_dir = str(tmp_path / "out2")
    cfg = PipelineConfig(num_buckets=8, run_id="full")
    run_extraction(spark, corpus, profiles, out_dir, cfg)
    full = spark.read.parquet(f"{out_dir}/spans_out")
    full_ids = {r["doc_id"] for r in full.select("doc_id").collect()}

    # new output dir with a fake partial state: keep buckets 0-3 only
    out_dir2 = str(tmp_path / "out3")
    partial = full.where(F.col("bucket") < 4)
    partial.write.partitionBy("bucket").parquet(f"{out_dir2}/spans_out")
    spark.createDataFrame(
        [(b, "done", "crashed-run") for b in range(4)], "bucket int, status string, run_id string"
    ).write.parquet(f"{out_dir2}/ledger")
    partial.groupBy("bucket").agg(
        F.count("*").alias("docs_parsed"),
        F.sum(F.size(F.coalesce(F.col("spans"), F.array()))).alias("spans_emitted"),
        F.sum((F.col("status") == "ok").cast("long")).alias("ok"),
        F.sum((F.col("status") == "profile_miss").cast("long")).alias("profile_miss"),
        F.sum((F.col("status") == "no_title").cast("long")).alias("no_title"),
        F.sum((F.col("status") == "error").cast("long")).alias("errors"),
        F.sum(F.coalesce(F.col("disabled").cast("long"), F.lit(0))).alias("disabled_dups"),
    ).withColumn("run_id", F.lit("crashed-run")).write.parquet(f"{out_dir2}/metrics")

    s = run_extraction(
        spark, corpus, profiles, out_dir2, PipelineConfig(num_buckets=8, run_id="resume")
    )
    assert s["resumed_buckets"] == 4
    resumed = spark.read.parquet(f"{out_dir2}/spans_out")
    resumed_ids = [r["doc_id"] for r in resumed.select("doc_id").collect()]
    assert len(resumed_ids) == len(set(resumed_ids))  # no dups
    assert set(resumed_ids) == full_ids  # no loss
