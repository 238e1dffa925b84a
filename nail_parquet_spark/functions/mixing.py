"""Deterministic corpus mixing: per-group downsampling to a target blend.

Training mixtures re-weight a corpus by source/language/domain (The Pile,
Dolma, RefinedWeb all ship a mixing table). At 100 TB the sampler must be
a pure per-row predicate — no shuffle, no state, reproducible across reruns
and engines — so the keep rule is pinned to an md5 threshold:

    keep row  <=>  substr(md5(<id> || '|' || <group>), 1, 8) < hex8(rate)

Fixed-width lowercase hex compares lexicographically as the number it
spells, and ``md5`` produces identical strings in Spark and DuckDB, so the
oracle reproduces the EXACT row set (no float rounding at the boundary).
Salting the digest with the group means changing one group's rate never
perturbs another group's kept set.

Only downsampling (rate <= 1) — without-replacement upsampling does not
exist; groups needing more than 1.0 are capped and reported so the caller
can add epochs/repeats downstream.

Temperature mixing: target proportions p_g ~ n_g^(1/T) (T=1 keeps the
natural mix, T→inf approaches uniform). Rates are derived from group
counts in ONE aggregate, then applied as a broadcast map — the data
table is scanned once and never shuffled.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

HEX_SPACE = 1 << 32


def rate_to_hex8(rate: float) -> str:
    """Pinned rate -> 8-hex-digit threshold. rate>=1 returns 'g', which
    sorts above every hex digest prefix (all-keep). NOTE: any >=9-char
    numeric string would compare LEXICOGRAPHICALLY here ('100000000' <
    'f...'), so the threshold must stay exactly 8 hex chars or 'g'."""
    n = int(rate * HEX_SPACE)
    if n >= HEX_SPACE:
        return "g"
    return format(max(0, n), "08x")


def keep_predicate(id_col: str, group_col: str, threshold_hex: "F.Column | str"):
    """The pinned md5-prefix keep rule as a Catalyst boolean."""
    digest = F.md5(F.concat(F.col(id_col).cast("string"), F.lit("|"),
                            F.col(group_col).cast("string")))
    thr = threshold_hex if not isinstance(threshold_hex, str) else F.lit(threshold_hex)
    return F.substring(digest, 1, 8) < thr


def corpus_mix(df: DataFrame, group_col: str, rates: dict, id_col: str,
               default_rate: float = 1.0) -> DataFrame:
    """Downsample each group to its rate with the pinned deterministic
    rule. ``rates`` maps group value -> keep fraction; unlisted groups use
    ``default_rate``. One no-shuffle projection+filter."""
    for g, r in rates.items():
        if r < 0:
            raise ValueError(f"rate for {g!r} is negative: {r}")
    thr = F.lit(rate_to_hex8(default_rate))
    for g, r in rates.items():
        thr = F.when(F.col(group_col) == F.lit(g),
                     F.lit(rate_to_hex8(float(r)))).otherwise(thr)
    return df.filter(keep_predicate(id_col, group_col, thr))


def temperature_rates(df: DataFrame, group_col: str, temperature: float,
                      target_rows: "int | None" = None) -> dict:
    """Per-group keep rates for a temperature-T mixture.

    p_g ~ n_g^(1/T) normalized; rate_g = min(1, p_g * N / n_g) with
    N = ``target_rows`` (default: the largest N at which no group needs
    upsampling, i.e. the natural scale of the flattened mix). Returns
    {group: rate} — driver-side, O(#groups)."""
    if temperature <= 0:
        raise ValueError(f"temperature must be positive, got {temperature}")
    counts = {r[0]: r[1] for r in
              df.groupBy(group_col).agg(F.count(F.lit(1))).collect()}
    if not counts:
        return {}
    weights = {g: n ** (1.0 / temperature) for g, n in counts.items()}
    wsum = sum(weights.values())
    props = {g: w / wsum for g, w in weights.items()}
    if target_rows is None:
        # largest N with every rate <= 1: N = min_g n_g / p_g
        target_rows = int(min(counts[g] / props[g] for g in counts))
    return {g: min(1.0, props[g] * target_rows / counts[g]) for g in counts}


def weighted_sample(df: DataFrame, id_col: str, weight_col: str,
                    target_frac: float, power: float = 1.0) -> DataFrame:
    """Deterministic weight-PROPORTIONAL downsampling: keep each row with
    probability p_i = min(1, target_frac * w_i^power / mean(w^power)) —
    quality-weighted corpus skimming (a DSIR-style importance sample with
    the score column as the importance), reproducible across reruns and
    engines.

    The keep rule is a pure per-row predicate like ``corpus_mix``'s:
    u_i = first-8-hex of md5(id) as an integer in [0, 2^32); keep iff
    u_i < p_i * 2^32. Negative/NULL weights clamp to 0 (never kept).
    Expected kept fraction = ``target_frac`` exactly when no p_i clips at
    1; heavier rows are proportionally more likely to survive.

    Scale shape: the scalar mean rides a 1-row in-plan aggregate
    (broadcast) feeding one no-shuffle projection/filter — a single
    action, one corpus pass. Pinned for oracle exactness: the mean is
    rounded to 6 dp and p_i to 9 dp before the compare, so engines whose
    float summation order differs in the last ulp still keep the identical
    row set.
    """
    if not 0 <= target_frac:
        raise ValueError(f"target_frac must be >= 0, got {target_frac}")
    w = F.greatest(F.coalesce(F.col(weight_col).cast("double"), F.lit(0.0)),
                   F.lit(0.0))
    # The mean rides a 1-row in-plan aggregate (broadcast crossJoin), NOT
    # a driver collect: the collect was its own action — a second full
    # corpus pass before the filter pass. Same rounded-6dp double, same
    # division. The when() guard reproduces the old driver-side
    # "mu NULL or <= 0 -> empty result" branch exactly (when's condition
    # on a NULL mu falls to otherwise(False); a plain least() would
    # silently skip the NULL and keep everything).
    mu_row = df.agg(
        F.round(F.avg(F.pow(w, F.lit(power))), 6).alias("__mu"))
    p = F.least(
        F.round(F.lit(target_frac) * F.pow(w, F.lit(power)) / F.col("__mu"), 9),
        F.lit(1.0))
    u = F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 8), 16, 10) \
         .cast("double")
    keep = F.when(F.col("__mu") > 0,
                  u < p * F.lit(float(HEX_SPACE))).otherwise(F.lit(False))
    return (df.crossJoin(F.broadcast(mu_row))
            .filter(keep)
            .select(*[F.col(c) for c in df.columns]))


def mix_stats(df: DataFrame, mixed: DataFrame, group_col: str) -> DataFrame:
    """Before/after counts + achieved rate per group (two aggregates on
    the group key, joined on ~#groups rows)."""
    before = df.groupBy(group_col).agg(F.count(F.lit(1)).alias("n_before"))
    after = mixed.groupBy(group_col).agg(F.count(F.lit(1)).alias("n_after"))
    return (
        before.join(after, group_col, "left")
        .fillna(0, subset=["n_after"])
        .withColumn("rate", F.round(F.col("n_after") / F.col("n_before"), 6))
    )
