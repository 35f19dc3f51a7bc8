"""Tag-dimension consolidation (A7) — the classic dimension upsert.

Reference: a singleton actor serializes tag creation so the dimension
stays globally distinct case-insensitively
(DistinctTagHandler.scala:44-76; name_i lookup
GraphQLHelper.scala:609-616; connect with disconnectAll=true,
Mutator.scala:546-562). Set-based equivalent:

    explode(tags) → normalize (lower) → dropDuplicates
      → left-anti join tags dim → new-tag rows (deterministic ids)
      → union into dim; entries connect via join back + collect_list.

Two shuffles total (distinct + join); the dim side is broadcast-sized
in practice (global distinct tag names), so the join back is a
broadcast hash join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def distinct_scraped_tags(extracted: DataFrame) -> DataFrame:
    """All distinct scraped tag names (first spelling wins per lower-key)."""
    return (
        extracted.select(F.explode_outer("tags").alias("tag"))
        .where(F.col("tag").isNotNull() & (F.col("tag") != ""))
        .withColumn("tag_key", F.lower(F.col("tag")))
        .groupBy("tag_key")
        .agg(F.min("tag").alias("name"))
    )


def new_tags(scraped: DataFrame, tag_dim: DataFrame) -> DataFrame:
    """Tags not yet in the dimension (case-insensitive identity).

    Deterministic tag_id = 'tag-' + hex(xxhash64(lower(name))): content
    addressed, so re-runs and retries produce identical ids (no
    monotonically_increasing_id non-determinism).
    """
    dim_keys = tag_dim.select(F.lower(F.col("name")).alias("tag_key")).dropDuplicates()
    return (
        scraped.join(dim_keys, "tag_key", "left_anti")
        .withColumn("tag_id", F.concat(F.lit("tag-"), F.hex(F.xxhash64(F.col("tag_key")))))
        .select("tag_id", "name", "tag_key")
    )


def upsert_tag_dim(extracted: DataFrame, tag_dim: DataFrame) -> DataFrame:
    """Return the updated tag dimension (existing ∪ new)."""
    scraped = distinct_scraped_tags(extracted)
    created = new_tags(scraped, tag_dim).select("tag_id", "name")
    return tag_dim.select("tag_id", "name").unionByName(created)


def connect_entries_to_tags(extracted: DataFrame, tag_dim: DataFrame) -> DataFrame:
    """(doc_id → array of tag ids), disconnectAll+connect semantics:
    the produced array fully replaces any previous linkage."""
    # NO forced broadcast: the tag dimension is corpus-derived
    # (distinct tags grow with the corpus) — AQE broadcasts it when it
    # is actually small, and falls back to a shuffle join when not
    # (same policy as the robots blocked-set fix)
    dim = tag_dim.select(
        F.lower(F.col("name")).alias("tag_key"), F.col("tag_id")
    ).dropDuplicates(["tag_key"])
    exploded = extracted.select(
        "doc_id", F.explode("tags").alias("tag")
    ).withColumn("tag_key", F.lower(F.col("tag")))
    return (
        exploded.join(dim, "tag_key", "left")
        .groupBy("doc_id")
        .agg(F.array_sort(F.collect_list("tag_id")).alias("tag_ids"))
    )
