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
