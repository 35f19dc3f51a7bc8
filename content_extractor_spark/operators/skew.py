"""Explicit skew handling (north rule): salting + hot-key isolation.

A Zipfian host distribution makes naive groupBy(host)/join(host) plans
straggle at 10^12 docs: the hottest host's partition is orders of
magnitude larger than the median. Three standard remedies, as reusable
operators:

  * `salted_agg` — two-phase aggregation: group by (key, salt) first
    (map-side + uniform shuffle), then re-aggregate by key. For
    algebraic aggregates (count/sum/min/max) this bounds any single
    reducer's input to ~1/salt of the hot key. (Plain count/sum are
    already partially aggregated by Spark; salting matters for
    size-accumulating aggregates like collect_list/set and for
    high-cardinality-combining ones.)
  * `salted_join` — replicate the small side `salt` times and salt the
    big side's key: hot keys spread over `salt` reducers. Use when the
    dim is too big to broadcast but the fact side is skewed.
  * `hot_keys` — cheap sampled histogram to decide the salt factor /
    isolate the top-k keys (process hot keys via broadcast, the long
    tail via ordinary shuffle).

AQE's skew-join splitting (enabled in session.py) covers sort-merge
joins automatically; these operators cover aggregations and the cases
where the split decision must be explicit and deterministic.
"""

from __future__ import annotations

from typing import List, Optional, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def with_salt(df: DataFrame, key_col: str, salt: int,
              salt_col: str = "_salt") -> DataFrame:
    """Deterministic per-row salt (no rand(): retries stay stable)."""
    return df.withColumn(
        salt_col,
        F.pmod(F.xxhash64(F.col(key_col), F.monotonically_increasing_id()),
               F.lit(salt)).cast("int"),
    )


def salted_agg(
    df: DataFrame,
    key_cols: Sequence[str],
    aggs: dict,
    salt: int = 16,
    id_col: Optional[str] = None,
) -> DataFrame:
    """Two-phase skew-safe aggregation.

    aggs: {out_name: (agg_fn_name, in_col)} with agg_fn in
    {count, sum, min, max} (algebraic — re-aggregatable).
    `id_col` (any roughly-unique column) seeds the salt; falls back to
    a per-partition counter.
    """
    salt_expr = (
        F.pmod(F.xxhash64(*[F.col(c) for c in ([id_col] if id_col else key_cols)],
                          F.monotonically_increasing_id() if not id_col else F.lit(0)),
               F.lit(salt))
    )
    phase1_aggs: List[Column] = []
    phase2_aggs: List[Column] = []
    for out, (fn, col) in aggs.items():
        if fn == "count":
            phase1_aggs.append(F.count(col if col else "*").alias(f"_p_{out}"))
            phase2_aggs.append(F.sum(f"_p_{out}").alias(out))
        elif fn == "sum":
            phase1_aggs.append(F.sum(col).alias(f"_p_{out}"))
            phase2_aggs.append(F.sum(f"_p_{out}").alias(out))
        elif fn == "min":
            phase1_aggs.append(F.min(col).alias(f"_p_{out}"))
            phase2_aggs.append(F.min(f"_p_{out}").alias(out))
        elif fn == "max":
            phase1_aggs.append(F.max(col).alias(f"_p_{out}"))
            phase2_aggs.append(F.max(f"_p_{out}").alias(out))
        else:
            raise ValueError(f"non-algebraic aggregate '{fn}' cannot be salted")
    partial = (
        df.withColumn("_salt", salt_expr)
        .groupBy(*key_cols, "_salt")
        .agg(*phase1_aggs)
    )
    return partial.groupBy(*key_cols).agg(*phase2_aggs)


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    salt: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skew-safe equi-join: salt the big side, replicate the small side."""
    big_s = with_salt(big, key, salt)
    small_s = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
    )
    out = big_s.join(small_s, [key, "_salt"], how)
    return out.drop("_salt")


def hot_keys(df: DataFrame, key_col: str, top_k: int = 10,
             sample_fraction: float = 0.01) -> DataFrame:
    """Sampled key histogram: the inputs to a salt-factor decision."""
    sample = df.sample(fraction=sample_fraction, seed=42) if sample_fraction < 1.0 else df
    return (
        sample.groupBy(key_col)
        .agg(F.count("*").alias("sampled_rows"))
        .orderBy(F.col("sampled_rows").desc(), F.col(key_col))
        .limit(top_k)
    )
