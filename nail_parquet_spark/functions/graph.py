"""Connected components over candidate-pair lists, and cluster dedup.

Beyond the reference surface: near-duplicate detection (minhash LSH,
simhash, embedding LSH — functions/dedup.py, functions/similarity.py)
emits PAIRS; a training-data pipeline needs CLUSTERS (keep one doc per
duplicate group, even when A~B and B~C but A!~C). This closes that gap
with a pure-DataFrame min-label propagation — no driver-side union-find,
no graph library.

Scale shape: each iteration is one equi-join (edges ⨝ labels) + one
groupBy-min + one convergence count, all keyed shuffles; lineage is cut
every iteration with localCheckpoint so plans stay O(1) deep. Iterations
needed = graph diameter. Duplicate clusters are near-cliques (diameter
2-3 in practice); the ``max_iter`` guard RAISES rather than returning
half-merged labels if a pathological chain exceeds it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def connected_components(pairs: DataFrame, id_a: str = "id_a",
                         id_b: str = "id_b", max_iter: int = 30) -> DataFrame:
    """(id, component) for every id appearing in ``pairs``; component is the
    smallest id reachable through the undirected pair graph (deterministic,
    engine-independent — a SQL recursive closure computes the same thing).
    """
    edges = (
        pairs.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst"))
        .unionAll(pairs.select(F.col(id_b).alias("src"), F.col(id_a).alias("dst")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    labels = (
        edges.select(F.col("src").alias("id"))
        .distinct()
        .withColumn("comp", F.col("id"))
        .localCheckpoint(eager=True)
    )
    for _ in range(max_iter):
        nbr_min = (
            edges.join(labels, edges["dst"] == labels["id"])
            .groupBy("src").agg(F.min("comp").alias("nbr_comp"))
        )
        merged = (
            labels.join(nbr_min, labels["id"] == nbr_min["src"], "left")
            .select(
                labels["id"],
                labels["comp"].alias("old_comp"),
                F.least(labels["comp"], F.col("nbr_comp")).alias("comp"),
            )
        ).localCheckpoint(eager=True)
        changed = merged.filter(F.col("comp") != F.col("old_comp")).count()
        labels = merged.select("id", "comp")
        if changed == 0:
            return labels
    raise ValueError(
        f"connected_components did not converge in {max_iter} iterations — "
        f"the pair graph has a path longer than max_iter; raise max_iter"
    )


def dedup_by_components(df: DataFrame, id_col: str, pairs: DataFrame,
                        id_a: str = "id_a", id_b: str = "id_b",
                        max_iter: int = 30) -> DataFrame:
    """Keep ONE row per duplicate cluster (the smallest id) plus every row
    not in any pair — the standard keep-canonical dedup over transitive
    near-duplicate pairs."""
    labels = connected_components(pairs, id_a, id_b, max_iter)
    drop = labels.filter(F.col("id") != F.col("comp")).select("id")
    return df.join(drop, df[id_col] == drop["id"], "left_anti")
