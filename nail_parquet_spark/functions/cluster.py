"""Distributed k-means over embedding columns, and SemDeDup-style
semantic dedup (Abbas et al. 2023: cluster the corpus' embeddings, then
drop near-identical members within each cluster).

Both are beyond-reference training-pipeline operators (the reference's
scope ends at tabular ops — see ``/root/reference/src/commands``); they
compose with the existing ANN/near-dup stack in
:mod:`nail_parquet_spark.functions.similarity`.

Pinned numeric contract (engine-independent, so a SQL oracle reproduces
it bit-for-bit):

- vectors are cast element-wise to ``double`` before any arithmetic;
- the initial centroids are the vectors of the ``k`` SMALLEST ids
  (deterministic and layout-independent — unlike a partition-head
  sample);
- assignment: ``cosine`` is rounded to 6 decimals FIRST, then the row
  joins the lowest-index centroid among the maxima;
- update: each centroid component is the arithmetic mean of its
  members' components, rounded to 6 decimals; a cluster that lost all
  members keeps its previous centroid;
- ``iters`` full (assign -> update) passes run, then one final assign.

Scale shape: every assign is ONE streaming pass of pure column
expressions (centroids ride along as literals — whole-stage codegen, no
UDF); the update shuffles only ``(cluster, pos, partial-sum)`` after
map-side combine, i.e. O(k * dim * partitions) bytes, and the driver
pulls k*dim rounded doubles per iteration. Nothing else ever reaches
the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from nail_parquet_spark.functions.similarity import _dot_expr, _norm_expr


def _cast_double(col):
    return F.transform(col, lambda x: x.cast("double"))


def kmeans_assign(df: DataFrame, vec_col: str,
                  centroids: list[list[float]],
                  out_col: str = "cluster",
                  cosine_col: str | None = None) -> DataFrame:
    """Attach the pinned-contract cluster id (0-based; rounded-cosine
    argmax, lowest index on ties) and optionally the winning cosine.

    Staged for one-pass cost: the row vector's double cast and norm are
    computed ONCE per row (Catalyst does not CSE multi-referenced
    subexpressions), and each centroid's norm is a driver-computed
    literal — bit-identical to the engine fold (same sequential IEEE
    adds over the same literal doubles), so per row the work is k dot
    products instead of k*(dot + two norms)."""
    import math

    # same sequential 0.0 + x*x fold the engine's _norm_expr performs,
    # over the exact literal doubles -> identical IEEE result
    cnorms = [math.sqrt(sum(x * x for x in c)) for c in centroids]
    cents = F.array(*[
        F.struct(
            F.array(*[F.lit(float(x)) for x in c]).alias("c"),
            F.lit(float(n)).alias("n"),
        )
        for c, n in zip(centroids, cnorms)
    ])
    s1 = df.withColumn("__ka_v", _cast_double(F.col(vec_col)))
    s2 = s1.withColumn("__ka_n", _norm_expr(F.col("__ka_v")))
    sims = F.transform(
        cents,
        lambda cn: F.round(
            _dot_expr(F.col("__ka_v"), cn["c"]) / (F.col("__ka_n") * cn["n"]),
            6,
        ),
    )
    out = s2.withColumn("__sims", sims).withColumn(
        out_col,
        (F.array_position(F.col("__sims"), F.array_max("__sims")) - 1)
        .cast("int"),
    )
    if cosine_col is not None:
        out = out.withColumn(cosine_col, F.array_max("__sims"))
    return out.drop("__ka_v", "__ka_n", "__sims")


def kmeans_centroids(df: DataFrame, id_col: str, vec_col: str,
                     k: int = 8, iters: int = 1) -> list[list[float]]:
    """Lloyd's k-means under the module's pinned contract; returns the
    centroids AFTER ``iters`` update passes (components rounded to 6).

    The k smallest-id seed rows plan as TakeOrderedAndProject (no global
    sort materializes); each update is one (cluster, pos)-keyed groupBy
    over posexploded member components — partial aggregation makes the
    exchange O(k * dim * partitions) regardless of row count.
    """
    if k < 1:
        raise ValueError("kmeans_centroids: k must be >= 1")
    seeds = (
        df.select(
            F.col(id_col).alias("__id"),
            # HALF_UP decimal rounding happens ENGINE-side (F.round) so the
            # seed values match a SQL oracle's round() exactly — Python's
            # round() is banker's and would diverge at .5e-6 ties
            F.transform(F.col(vec_col),
                        lambda x: F.round(x.cast("double"), 6)).alias("__v"),
        )
        .filter(F.col("__v").isNotNull())
        .orderBy("__id")
        .limit(k)
        .collect()
    )
    if not seeds:
        raise ValueError("kmeans_centroids: no non-null vectors")
    cents = [[float(x) for x in r["__v"]] for r in seeds]
    for _ in range(iters):
        assigned = kmeans_assign(
            df.select(_cast_double(F.col(vec_col)).alias("__v")).filter(
                F.col("__v").isNotNull()
            ),
            "__v", cents,
        )
        means = (
            assigned.select("cluster", F.posexplode("__v").alias("pos", "x"))
            .groupBy("cluster", "pos")
            .agg(F.round(F.avg("x"), 6).alias("m"))
            .collect()
        )
        upd: dict[int, dict[int, float]] = {}
        for r in means:
            upd.setdefault(r["cluster"], {})[r["pos"]] = r["m"]
        cents = [
            [upd[i][p] for p in sorted(upd[i])] if i in upd else cents[i]
            for i in range(len(cents))
        ]
    return cents


def kmeans(df: DataFrame, id_col: str, vec_col: str, k: int = 8,
           iters: int = 1, out_col: str = "cluster",
           cosine_col: str | None = None) -> DataFrame:
    """Fit + final assign in one call: ``df`` plus the cluster id (and
    optionally the rounded cosine to the winning centroid)."""
    cents = kmeans_centroids(df, id_col, vec_col, k=k, iters=iters)
    return kmeans_assign(df, vec_col, cents, out_col=out_col,
                         cosine_col=cosine_col)


def semantic_dedup(df: DataFrame, id_col: str, vec_col: str, k: int = 8,
                   iters: int = 1, tau: float = 0.95,
                   score_col: str | None = None,
                   transitive: bool = False) -> DataFrame:
    """SemDeDup: k-means-cluster the embeddings, then inside each cluster
    drop rows whose rounded cosine to another member is ``>= tau``.

    Keep policy (pinned): without ``score_col``, keep-first — a row is
    dropped iff a SMALLER-id member of its cluster sits within ``tau``
    (matches the paper's "keep one representative per epsilon-ball",
    made deterministic by id order; NOT transitive — a chain a~b~c with
    cos(a,c) < tau keeps a and drops b, c only if each is within tau of
    some smaller id). With ``score_col``, pairs feed
    :func:`nail_parquet_spark.functions.graph.keep_best_in_cluster`
    (transitive closure, highest score wins). ``transitive=True``
    without a score keeps the smallest id per connected component.

    Scale shape: assignment is the streaming pass above; candidate pairs
    come from ONE cluster-keyed self-join, so the pair space is
    sum_c(|c| choose 2) — the SemDeDup contract is that ``k`` scales
    with n to bound cluster sizes (the paper uses ~100k clusters); AQE
    skew-split handles imbalance, and for pathological hot clusters the
    LSH near-dup path (`functions.similarity.near_dup_pairs_lsh`) is
    the right tool instead. Only (id, cluster, vector) columns enter
    the join, and the final keep is a left_anti on ids.
    """
    cents = kmeans_centroids(df, id_col, vec_col, k=k, iters=iters)
    assigned = kmeans_assign(
        df.select(F.col(id_col).alias("__kid"),
                  _cast_double(F.col(vec_col)).alias("__kv")),
        "__kv", cents,
    )
    # stage each row's norm ONCE before the pair join (the join would
    # otherwise recompute both O(dim) norms per PAIR); same fold, same
    # IEEE result
    assigned = assigned.withColumn("__kn", _norm_expr(F.col("__kv")))
    a = assigned.select(F.col("__kid").alias("id_a"),
                        F.col("__kv").alias("__va"),
                        F.col("__kn").alias("__na"), "cluster")
    b = assigned.select(F.col("__kid").alias("id_b"),
                        F.col("__kv").alias("__vb"),
                        F.col("__kn").alias("__nb"), "cluster")
    cos = F.round(
        _dot_expr(F.col("__va"), F.col("__vb"))
        / (F.col("__na") * F.col("__nb")),
        6,
    )
    pairs = (
        a.join(b, "cluster")
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("cosine", cos)
        .filter(F.col("cosine") >= tau)
        .select("id_a", "id_b")
    )
    if score_col is not None:
        from nail_parquet_spark.functions.graph import keep_best_in_cluster

        return keep_best_in_cluster(df, id_col, score_col, pairs)
    if transitive:
        from nail_parquet_spark.functions.graph import dedup_by_components

        return dedup_by_components(df, id_col, pairs)
    drop = pairs.select(F.col("id_b").alias("__drop")).distinct()
    return df.join(drop, df[id_col] == F.col("__drop"), "left_anti")
