"""Table IO with Iceberg-first, parquet-fallback semantics.

The reference writes through GraphQL mutations (create/update/disable,
Mutator.scala:342-449; S7/S8/S10 in SURVEY §2.1). Set-based
equivalents:

  * create  -> append
  * update  -> MERGE INTO ... WHEN MATCHED UPDATE (Iceberg), or the
    parquet fallback: anti-join old ∪ new overwrite
  * disable -> MERGE ... SET disabled = true

`apply_entry_actions` applies a planned action column (see
operators/changes.plan_actions) to an entries table in one pass. With
an Iceberg catalog (`spark.sql.catalog.*` configured and the runtime
jar present) the MERGE path is used; otherwise the pure-DataFrame
rewrite produces the same final table state (full-rewrite cost —
acceptable for tests, Iceberg on clusters).
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def iceberg_available(spark: SparkSession) -> bool:
    try:
        spark._jvm.org.apache.iceberg.Snapshot  # noqa: SLF001
        return True
    except Exception:
        return False


def read_table(spark: SparkSession, ref: str) -> DataFrame:
    """Read a table by catalog name or filesystem path."""
    if "/" in ref:
        return spark.read.parquet(ref)
    return spark.read.table(ref)


def write_table(df: DataFrame, ref: str, mode: str = "append") -> None:
    if "/" in ref:
        df.write.mode(mode).parquet(ref)
    elif mode == "append":
        df.writeTo(ref).append()
    else:
        df.writeTo(ref).createOrReplace()


_ENTRY_FIELDS = (
    "title", "summary", "content", "date", "tags", "etag", "image_url",
    "content_hash",
)


def apply_entry_actions(
    entries: Optional[DataFrame], planned: DataFrame
) -> DataFrame:
    """Produce the next entries-table state from planned actions.

    planned: output of operators.changes.plan_actions (+ `disabled`
    from operators.dedup.mark_duplicates); actions: create | update |
    skip | error. Returns the new full entries DataFrame:

      * create: new row (deterministic entry_id from url_id)
      * update: existing row's fields replaced
      * skip/error: existing row untouched
      * rows in `entries` with no planned row: untouched

    This is the set-based MERGE; on Iceberg the same `planned` frame
    drives `MERGE INTO entries USING planned ON url_id` (S7).
    """
    cols = ["url_id", *(_ENTRY_FIELDS)]
    creates = planned.where(F.col("action") == "create").select(
        F.concat(F.lit("entry-"), F.col("url_id")).alias("entry_id"),
        *[F.col(c) for c in cols],
        F.coalesce(F.col("disabled"), F.lit(False)).alias("disabled"),
    )
    updates = planned.where(F.col("action") == "update").select(
        F.col("entry_id"),
        *[F.col(c) for c in cols],
        F.coalesce(F.col("disabled"), F.lit(False)).alias("disabled"),
    )
    if entries is None:
        return creates
    untouched = entries.join(
        updates.select("entry_id"), "entry_id", "left_anti"
    )
    return untouched.unionByName(updates).unionByName(creates)


def disable_entries(entries: DataFrame, entry_ids: DataFrame) -> DataFrame:
    """S10: set disabled=true for the given entry ids (404 handling)."""
    marked = entry_ids.select(F.col("entry_id").alias("_d_id")).distinct()
    return (
        entries.join(marked, entries["entry_id"] == marked["_d_id"], "left")
        .withColumn(
            "disabled",
            F.when(F.col("_d_id").isNotNull(), F.lit(True)).otherwise(
                F.coalesce(F.col("disabled"), F.lit(False))
            ),
        )
        .drop("_d_id")
    )
