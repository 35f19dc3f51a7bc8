"""ETag short-circuit operator + the spark-submit job entry point."""

import json

from pyspark.sql import functions as F

from content_extractor_spark import synth
from content_extractor_spark.operators.scans import etag_unchanged_skip


class TestEtagSkip:
    def test_unchanged_rows_skipped(self, spark):
        docs = spark.createDataFrame(
            [
                ("d1", "u1", 'W/"a"'),   # matches stored etag -> skipped
                ("d2", "u2", 'W/"new"'),  # etag changed -> kept
                ("d3", "u3", None),       # no etag -> kept (must re-fetch)
                ("d4", "u4", 'W/"x"'),    # no stored entry -> kept
            ],
            "doc_id string, url_id string, etag string",
        )
        entries = spark.createDataFrame(
            [("e1", "u1", 'W/"a"'), ("e2", "u2", 'W/"old"'), ("e3", "u3", 'W/"b"')],
            "entry_id string, url_id string, etag string",
        )
        kept = {r["doc_id"] for r in etag_unchanged_skip(docs, entries).collect()}
        assert kept == {"d2", "d3", "d4"}


class TestJobCli:
    def test_extract_job_end_to_end(self, spark, tmp_path, capsys):
        # input corpus + profile dir on disk, run via the job's main()
        in_dir = str(tmp_path / "docs")
        out_dir = str(tmp_path / "out")
        prof_dir = tmp_path / "profiles"
        prof_dir.mkdir()
        synth.write_documents(spark, in_dir, 80, n_hosts=3, seed=5, partitions=2)
        for i in range(3):
            (prof_dir / f"host{i}.json").write_text(
                json.dumps(synth.make_host_profile(i)), encoding="utf-8"
            )

        from jobs.extract_job import main

        rc = main(
            [
                "--input", in_dir,
                "--output", out_dir,
                "--profiles", str(prof_dir),
                "--buckets", "4",
                "--run-id", "cli-test",
            ]
        )
        assert rc == 0
        printed = capsys.readouterr().out.strip().splitlines()[-1]
        summary = json.loads(printed)
        assert summary["docs_parsed"] > 0 and summary["ok"] > 0
        spans = spark.read.parquet(f"{out_dir}/spans_out")
        assert spans.where("status = 'ok'").count() == summary["ok"]
        ledger = spark.read.parquet(f"{out_dir}/ledger")
        assert ledger.where("status = 'done'").count() == 4
