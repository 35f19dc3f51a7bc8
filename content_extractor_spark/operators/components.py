"""Connected components over candidate-duplicate pairs.

Near-dup pipelines end with clustering: LSH/Jaccard emit PAIRS, but
dedup policy needs GROUPS ("keep one representative per component").
This is min-label propagation (the dataframe-native form of the
large-star/small-star CC algorithm): every node repeatedly takes the
minimum component id among itself and its neighbors until fixpoint.

Scale notes:
  * each iteration is one join + one aggregate on (node, comp) pairs —
    shuffle keys are node ids (uniform);
  * iteration count is bounded by the graph diameter of the largest
    component; near-dup graphs are shallow (clusters are cliques-ish),
    so 3-5 iterations typically converge;
  * `localCheckpoint` truncates the lineage each round so plans don't
    grow exponentially (mandatory for iterative DataFrame algorithms).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    a_col: str = "a",
    b_col: str = "b",
    max_iter: int = 25,
) -> DataFrame:
    """(node, comp): comp = min node id reachable from node.

    Nodes are the union of both edge endpoints; isolated nodes (absent
    from `edges`) are absent from the result by construction.
    """
    # both edge directions from ONE pass over `edges`: the former
    # unionByName of two selects restated the whole upstream pair
    # pipeline (LSH banding, signature aggregation) once per branch —
    # the explode derives (a->b, b->a) per input row map-side, so the
    # edge subtree is evaluated exactly once (r7; values identical)
    adj = (
        edges.select(
            F.explode(
                F.array(
                    F.struct(
                        F.col(a_col).alias("src"), F.col(b_col).alias("dst")
                    ),
                    F.struct(
                        F.col(b_col).alias("src"), F.col(a_col).alias("dst")
                    ),
                )
            ).alias("e")
        )
        .select("e.src", "e.dst")
        .distinct()
        .localCheckpoint(eager=True)
    )
    # initial labels stay LAZY: one shallow agg over the checkpointed
    # adjacency — the first round's checkpoint materializes it, saving
    # a whole driver job (r7; these are all sub-second jobs whose cost
    # is scheduling, not data)
    labels = (
        adj.select(F.col("src").alias("node"), F.col("src").alias("comp"))
        .groupBy("node")
        .agg(F.min("comp").alias("comp"))
    )

    from pyspark.sql import Observation

    for _ in range(max_iter):
        neigh = (
            adj.join(labels, adj["dst"] == labels["node"])
            .groupBy("src")
            .agg(F.min("comp").alias("ncomp"))
        )
        # convergence detection is folded into the label update AND
        # into the checkpoint job itself: an Observation on the frame
        # collects the changed count while the eager checkpoint
        # materializes it, so each iteration is exactly ONE driver job
        # (the former any-changed probe was a second job per round).
        # (r7 note: batching two propagation steps per checkpoint was
        # tried and A/B-measured SLOWER here — the deeper per-round
        # plan costs more than the saved driver jobs on shallow
        # near-dup graphs.)
        obs = Observation()
        new_labels = (
            labels.join(neigh, labels["node"] == neigh["src"], "left")
            .select(
                "node",
                F.least(
                    F.col("comp"), F.coalesce(F.col("ncomp"), F.col("comp"))
                ).alias("comp"),
                (
                    F.coalesce(F.col("ncomp"), F.col("comp")) < F.col("comp")
                ).alias("_changed"),
            )
            .observe(obs, F.sum(F.col("_changed").cast("long")).alias("n"))
            .localCheckpoint(eager=True)
        )
        labels = new_labels.drop("_changed")
        # sum over an empty frame surfaces as None — converged either way
        if not obs.get["n"]:
            break
    return labels


def dedup_groups(
    edges: DataFrame, a_col: str = "a", b_col: str = "b"
) -> DataFrame:
    """Cluster candidate pairs: (comp, members, keep) — keep = min id."""
    comps = connected_components(edges, a_col, b_col)
    return (
        comps.groupBy("comp")
        .agg(
            F.count("*").alias("members"),
            F.min("node").alias("keep"),
        )
    )
