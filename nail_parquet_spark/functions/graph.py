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


def keep_best_in_cluster(df: DataFrame, id_col: str, score_col: str,
                         pairs: DataFrame, id_a: str = "id_a",
                         id_b: str = "id_b", max_iter: int = 30) -> DataFrame:
    """Cluster dedup with a QUALITY policy: within each transitive
    near-duplicate cluster keep the row with the HIGHEST ``score_col``
    (ties broken by smallest id — fully deterministic); rows in no pair
    are kept unchanged.

    This is the curation-grade variant of :func:`dedup_by_components` —
    real pipelines keep the best-quality copy of a duplicated page (e.g. a
    Gopher quality score), not an arbitrary canonical id.

    Scale shape: labels come from min-label propagation (keyed joins
    only); the per-cluster winner is ONE groupBy over (comp) rows carrying
    just (score, id) — ``max_by`` via struct ordering, no window, no
    driver pull; winners semi-join back against the full rows. Requires
    unique ids and a non-null numeric score (nulls sort lowest via
    coalesce to -inf).
    """
    labels = connected_components(pairs, id_a, id_b, max_iter)
    scored = df.select(
        F.col(id_col).alias("__sid"),
        F.coalesce(F.col(score_col).cast("double"),
                   F.lit(float("-inf"))).alias("__score"),
    )
    member = labels.join(scored, labels["id"] == scored["__sid"]).select(
        "comp", "__score", "id"
    )
    # max by (score asc, id desc) struct => highest score, then SMALLEST id
    # (negate id ordering by sorting on the struct of (score, -id) is not
    # type-safe for non-numeric ids, so use min over (-score, id) instead)
    winners = (
        member.select("comp", F.struct((-F.col("__score")).alias("ns"),
                                       F.col("id").alias("wid")).alias("__k"))
        .groupBy("comp").agg(F.min("__k").alias("__k"))
        .select(F.col("__k.wid").alias("__win"))
    )
    losers = labels.join(winners, labels["id"] == winners["__win"],
                         "left_anti").select("id")
    return df.join(losers, df[id_col] == losers["id"], "left_anti")


def pagerank(edges: DataFrame, src_col: str, dst_col: str,
             weight_col: str | None = None, iterations: int = 10,
             damping: float = 0.85, checkpoint_every: int = 5) -> DataFrame:
    """PageRank over a directed (optionally weighted) edge table —
    ``(node, rank)`` for every node appearing as a source or destination.
    The crawl-prioritization signal a web pipeline computes over the
    domain link graph (``html_links`` → ``registered_domain`` edges).

    Pinned contract (engine-independent, mirrored by the oracle's
    unrolled SQL): parallel edges first collapse to one edge with summed
    weight (count when ``weight_col`` is None); every node starts at
    ``1/N``; each of the fixed ``iterations`` steps computes

        rank(v) = (1-d)/N + d * sum over in-edges (rank(u) * w/outw(u))

    Dangling-node mass is NOT redistributed (the simple published
    variant) — with a fixed iteration count the result is a deterministic
    rational function of the edge weights, so two engines agree to
    floating-point associativity.

    Scale shape: the per-edge transition probability ``w/outw`` is
    computed ONCE and persisted; each iteration is one src-keyed equi-join
    (ranks ⨝ edges) + one dst-keyed groupBy-sum — both partial-aggregating
    keyed shuffles, no windows, no driver state beyond the node count. A
    hot destination (everyone links to wikipedia.org) is a single reduce
    key whose sum combines map-side. Lineage is cut every
    ``checkpoint_every`` iterations with localCheckpoint so plans stay
    O(1) deep at any iteration count.
    """
    if iterations < 0:
        raise ValueError("iterations must be >= 0")
    w = (F.sum(F.col(weight_col).cast("double")) if weight_col
         else F.count("*").cast("double"))
    e = (edges.groupBy(F.col(src_col).alias("__src"),
                       F.col(dst_col).alias("__dst"))
         .agg(w.alias("__w")))
    nodes = (e.select(F.col("__src").alias("node"))
             .unionAll(e.select(F.col("__dst").alias("node")))
             .distinct().localCheckpoint(eager=True))
    n = nodes.count()
    if n == 0:
        return nodes.withColumn("rank", F.lit(0.0))
    deg = e.groupBy("__src").agg(F.sum("__w").alias("__outw"))
    trans = (e.join(deg, "__src")
             .select("__src", "__dst",
                     (F.col("__w") / F.col("__outw")).alias("__p"))
             .localCheckpoint(eager=True))
    base = (1.0 - damping) / n
    ranks = nodes.withColumn("rank", F.lit(1.0 / n))
    for i in range(iterations):
        contrib = (ranks.join(trans, ranks["node"] == trans["__src"])
                   .groupBy("__dst")
                   .agg(F.sum(F.col("rank") * F.col("__p")).alias("__c")))
        ranks = (nodes.join(contrib, nodes["node"] == contrib["__dst"], "left")
                 .select("node",
                         (F.lit(base) + F.lit(damping)
                          * F.coalesce(F.col("__c"), F.lit(0.0))).alias("rank")))
        if (i + 1) % checkpoint_every == 0:
            ranks = ranks.localCheckpoint(eager=True)
    return ranks
