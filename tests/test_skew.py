"""Skew-handling operators: salted aggregation/join equal their naive
counterparts while spreading hot keys."""

from pyspark.sql import functions as F

from content_extractor_spark.operators.skew import hot_keys, salted_agg, salted_join


def _skewed_df(spark, n=2000):
    # Zipf-ish: ~half the rows share one hot key
    return spark.range(n).select(
        F.when(F.col("id") % 2 == 0, F.lit("hot")).otherwise(
            F.concat(F.lit("k"), (F.col("id") % 37).cast("string"))
        ).alias("key"),
        F.col("id"),
        (F.col("id") % 100).alias("v"),
    )


def test_salted_agg_equals_plain_groupby(spark):
    df = _skewed_df(spark)
    plain = {
        r["key"]: (r["n"], r["s"], r["mn"], r["mx"])
        for r in df.groupBy("key")
        .agg(
            F.count("*").alias("n"), F.sum("v").alias("s"),
            F.min("v").alias("mn"), F.max("v").alias("mx"),
        )
        .collect()
    }
    salted = {
        r["key"]: (r["n"], r["s"], r["mn"], r["mx"])
        for r in salted_agg(
            df, ["key"],
            {"n": ("count", None), "s": ("sum", "v"),
             "mn": ("min", "v"), "mx": ("max", "v")},
            salt=8, id_col="id",
        ).collect()
    }
    assert salted == plain


def test_salted_join_equals_plain_join(spark):
    big = _skewed_df(spark, 1000)
    small = spark.createDataFrame(
        [("hot", "H")] + [(f"k{i}", f"d{i}") for i in range(37)],
        "key string, label string",
    )
    plain = sorted(
        (r["id"], r["label"]) for r in big.join(small, "key").collect()
    )
    salted = sorted(
        (r["id"], r["label"]) for r in salted_join(big, small, "key", salt=4).collect()
    )
    assert salted == plain


def test_hot_keys_histogram(spark):
    df = _skewed_df(spark, 4000)
    top = hot_keys(df, "key", top_k=3, sample_fraction=1.0).collect()
    assert top[0]["key"] == "hot"
    assert top[0]["sampled_rows"] > top[1]["sampled_rows"]


def test_connected_components(spark):
    from content_extractor_spark.operators.components import (
        connected_components,
        dedup_groups,
    )

    # two chains + an isolated pair: {1-2-3-4}, {10-11}, {7-8}
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (8, 7)], "a long, b long"
    )
    comps = {r["node"]: r["comp"] for r in connected_components(edges).collect()}
    assert comps == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 7: 7, 8: 7}
    groups = {r["comp"]: (r["members"], r["keep"]) for r in dedup_groups(edges).collect()}
    assert groups == {1: (4, 1), 10: (2, 10), 7: (2, 7)}


def test_connected_components_deep_chain(spark):
    from content_extractor_spark.operators.components import connected_components

    # a 12-node path exercises multiple propagation rounds
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(12)], "a long, b long"
    )
    comps = {r["node"]: r["comp"] for r in connected_components(edges).collect()}
    assert set(comps.values()) == {0}
    assert len(comps) == 13
