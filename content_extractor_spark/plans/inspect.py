"""Physical-plan inspection: verify the plan we *want* is the plan we got.

Used by tests and ops tooling to assert scale-critical properties
(SURVEY §4): filters pushed into the parquet/Iceberg scan, projections
pruned, broadcast joins where dims are small, whole-stage codegen
around the relational stages, and exactly one Python stage (the
extraction UDF).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def _formatted(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
        df._jdf.queryExecution(), "formatted"
    )


def plan_report(df: DataFrame) -> dict:
    """Summarize scale-relevant plan facts."""
    try:
        text = _formatted(df)
    except Exception:
        text = df._jdf.queryExecution().explainString(  # noqa: SLF001
            df._sc._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
    import re

    # count physical operators once via their "(n) OpName" detail headers
    def n_ops(*names) -> int:
        return len(re.findall(rf"^\(\d+\) (?:{'|'.join(names)})\b", text, re.M))

    return {
        "pushed_filters": "PushedFilters: [" in text
        and "PushedFilters: []" not in text,
        "has_broadcast_join": "BroadcastHashJoin" in text,
        "has_sort_merge_join": "SortMergeJoin" in text,
        # formatted mode annotates codegen'd operators with [codegen id : n]
        "wholestage_codegen_spans": len(
            set(re.findall(r"\[codegen id : (\d+)\]", text))
        ),
        "python_stages": n_ops(
            "ArrowEvalPython", "MapInArrow", "MapInPandas", "FlatMapGroupsInPandas"
        ),
        "exchanges": n_ops("Exchange"),
        "aqe": "AdaptiveSparkPlan" in text,
        "text": text,
    }
