"""Deterministic sampling operators for training-data pipelines.

Spark's built-in ``df.sample`` is seeded per-partition, so its output
changes with the physical split layout — useless for a reproducible
100 TB corpus snapshot or for a DuckDB differential oracle. Every
operator here derives the sampling decision from a *content hash of the
row key* (md5, engine-portable), so the sample is:

- stable under repartitioning, AQE re-planning, and cluster size;
- identical across engines (the DuckDB oracle recomputes it exactly) —
  which is why keys are restricted to integer/string types: float,
  decimal and timestamp keys stringify differently per engine, so the
  operators reject them instead of silently diverging from the oracle;
- refreshable by salt: a new ``salt`` draws an independent sample.

Scale shape: every operator is a map-side filter or a per-group window —
no collect, no global sort. ``hash_topk_per_group`` shuffles once on the
group key (WindowGroupLimit prunes to k per group before the final
window at scale).

Reference parity: the reference has no sampling surface (SURVEY §2 —
absent); these are part of the beyond-reference training-pipeline set
named by the project brief.
"""

from __future__ import annotations

from micromegas_spark.flightsql.errors import InvalidArgument
from micromegas_spark.cachereg import track

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# 16^15 = 2^60: 15 hex chars fit an int64 with headroom; dividing by the
# exact power of two is lossless in binary floating point.
_HASH_DENOM = float(16**15)


def _check_key_type(df: DataFrame, key_col: str) -> None:
    from pyspark.sql.types import ByteType, IntegerType, LongType, ShortType, StringType

    dt = df.schema[key_col].dataType
    if not isinstance(dt, (ByteType, ShortType, IntegerType, LongType, StringType)):
        raise InvalidArgument(
            f"sampling key {key_col!r} has type {dt}; only integer/string keys "
            "stringify identically across engines (float/timestamp formats "
            "differ, which would silently break oracle reproducibility)"
        )


def sample_unit(key: Column, salt: str = "") -> Column:
    """u ∈ [0,1) derived from md5(salt ‖ key) — the portable PRNG.

    DuckDB spelling (identical doubles, so comparisons agree exactly):
    ``('0x' || substr(md5(salt || CAST(key AS VARCHAR)), 1, 15))::BIGINT
    / 1152921504606846976.0``"""
    h = F.conv(
        F.substring(F.md5(F.concat(F.lit(salt), key.cast("string"))), 1, 15), 16, 10
    ).cast("bigint")
    return h / F.lit(_HASH_DENOM)


def hash_sample(
    df: DataFrame, fraction: float, key_col: str, salt: str = ""
) -> DataFrame:
    """Uniform deterministic sample: keep rows with u(key) < fraction.
    A pure map-side filter — pushes below shuffles, costs one md5/row."""
    _check_key_type(df, key_col)
    return df.where(sample_unit(F.col(key_col), salt) < F.lit(float(fraction)))


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    fractions: dict[str, float],
    key_col: str,
    default_fraction: float = 0.0,
    salt: str = "",
) -> DataFrame:
    """Per-stratum rates (e.g. language rebalancing for a training mix):
    the stratum picks the rate, the key hash picks the rows. Still one
    map-side filter — no per-stratum job, no shuffle."""
    _check_key_type(df, key_col)
    rate: Column = F.lit(float(default_fraction))
    for value, frac in sorted(fractions.items()):
        rate = F.when(F.col(strata_col) == F.lit(value), F.lit(float(frac))).otherwise(
            rate
        )
    return df.where(sample_unit(F.col(key_col), salt) < rate)


def hash_topk_per_group(
    df: DataFrame, group_col: str, k: int, key_col: str, salt: str = ""
) -> DataFrame:
    """Deterministic k-per-group cap (per-source document quotas, the
    fixed-size analogue of reservoir sampling): rank rows inside each
    group by (u(key), key) and keep the k smallest. Uniform without
    replacement, reproducible, and a single shuffle on the group key;
    the (u, key) ordering is collision-proof because the key breaks ties."""
    _check_key_type(df, key_col)
    u = sample_unit(F.col(key_col), salt)
    w = Window.partitionBy(group_col).orderBy(u.asc(), F.col(key_col).asc())
    return (
        df.withColumn("_srn", F.row_number().over(w))
        .where(F.col("_srn") <= k)
        .drop("_srn")
    )


def weighted_sample(
    df: DataFrame, weight_col: str, k: int, key_col: str, salt: str = "ws"
) -> DataFrame:
    """Efraimidis-Spirakis weighted sampling WITHOUT replacement (PPS):
    each row draws an exponential clock key = -ln(u)/w from the portable
    md5 PRNG; the k smallest keys are a probability-proportional-to-size
    sample (the Gumbel/exponential-race identity — equivalent to the
    classic u^(1/w) max-k formulation, but the smallest-k form composes
    with TakeOrderedAndProject: no global sort, map-side partial top-k).
    THE training-mix primitive: sample documents proportional to a
    quality/importance score, reproducibly, in one pass. u is nudged by
    2^-60 (one PRNG step) so a zero hash cannot produce ln(0).

    The ln() crossing is the one engine-libm dependence (ulp-level);
    selection differs only if two keys collide within error — the same
    accepted risk as the unigram-LM/perplexity queries."""
    _check_key_type(df, key_col)
    u = sample_unit(F.col(key_col), salt)
    key = -F.log(u + F.lit(2.0**-60)) / F.col(weight_col)
    return (
        df.withColumn("es_key", key)
        .orderBy(F.col("es_key").asc(), F.col(key_col).asc())
        .limit(k)
    )


def mixture_sample(
    df: DataFrame,
    domain_col: str,
    key_col: str,
    temperature: float = 0.5,
    target_fraction: float = 0.5,
    weight_col: str | None = None,
    salt: str = "",
) -> DataFrame:
    """Temperature-flattened domain mixture — the multilingual/multi-source
    LM training mix rule (sampling probability ∝ n_d^T, T<1 upsampling
    rare domains). Derives per-domain keep rates from the corpus itself:

        w_d    = n_d^T / Σ_e n_e^T
        rate_d = min(1, target_fraction · N · w_d / n_d)

    so the expected output size is ≈ target_fraction·N with domain shares
    following the tempered distribution. ``weight_col`` switches n_d from
    row counts to a per-row weight sum (token-budget mixing). Row
    selection is the content-hash PRNG (``sample_unit``) — reproducible
    under any partitioning and in the DuckDB oracle.

    Scale shape: one aggregation to #domains rows, one scalar reduce,
    then a broadcast join + map-side filter over the corpus — the corpus
    is scanned once and never shuffled. T=0.5 uses sqrt (IEEE-exact, so
    oracle doubles match bit-for-bit); other temperatures use pow, whose
    last-ulp behavior is libm-specific — rates are rounded to 12 dp on
    both engines to keep the comparison stable either way."""
    _check_key_type(df, key_col)
    n_src = F.col(weight_col) if weight_col else F.lit(1)
    counts = df.groupBy(domain_col).agg(
        F.sum(n_src).cast("double").alias("_n")
    )
    w = F.sqrt(F.col("_n")) if temperature == 0.5 else F.pow(F.col("_n"), F.lit(float(temperature)))
    weights = counts.select(domain_col, "_n", w.alias("_w"))
    tot = weights.agg(F.sum("_w").alias("_zsum"), F.sum("_n").alias("_ntot"))
    rates = weights.crossJoin(F.broadcast(tot)).select(
        domain_col,
        F.round(
            F.least(
                F.lit(1.0),
                (F.lit(float(target_fraction)) * F.col("_ntot") * (F.col("_w") / F.col("_zsum")))
                / F.col("_n"),
            ),
            12,
        ).alias("_rate"),
    )
    return (
        df.join(F.broadcast(rates), domain_col)
        .where(sample_unit(F.col(key_col), salt) < F.col("_rate"))
        .drop("_rate")
    )


def dsir_log_weights(
    df: DataFrame,
    target: Column,
    n_buckets: int = 1024,
    text_col: str = "text",
    id_col: str = "doc_id",
    cache: bool = True,
) -> DataFrame:
    """DSIR-style importance weights (Xie et al. 2023, "Data Selection
    for Language Models via Importance Resampling"): score every document
    by how target-like its hashed n-gram profile is, for weighted
    resampling toward a target distribution (e.g. wiki-like text).

    Features are lowercased unigrams + bigrams hashed into ``n_buckets``
    (md5-based, engine-portable). With add-one-smoothed bag-of-buckets
    models p_t (rows matching ``target``) and p_s (the whole corpus),

        log w(doc) = Σ_feature-occurrences  ln p_t[f] − ln p_s[f]

    Output: (id, n_feats, log_weight). Resample by ``log_weight`` (e.g.
    keep rows where sample_unit(key) < exp(log_weight - max)).

    Scale shape: one explode feeds a single (bucket)-keyed aggregate that
    counts source and target occurrences together (map-side combinable;
    ≤ n_buckets result rows), totals ride in as a broadcast single-row
    aggregate, and scoring is a broadcast join of the ≤ n_buckets
    log-ratio table against the re-exploded features followed by one
    per-doc aggregation. Nothing shuffles at corpus volume except the
    doc-id aggregation."""
    from micromegas_spark.operators.text import _let, token_hash32, tokens
    from micromegas_spark.operators.util import spread as _spr

    # the feature explode is CPU-bound; a single-split scan at test scale
    # would serialize it on one core (no-op at real split counts)
    df = _spr(df)

    def feats(c: Column) -> Column:
        # _let binds the lowered token array ONCE: a lambda body indexing
        # into the token EXPRESSION would re-evaluate the split per element
        # access — the quadratic n-gram trap (see text._let)
        def _grams(toks: Column) -> Column:
            bigrams = F.when(
                F.size(toks) >= 2,
                F.transform(
                    F.sequence(F.lit(1), F.size(toks) - 1),
                    lambda i: F.concat_ws(
                        " ", F.try_element_at(toks, i), F.try_element_at(toks, i + 1)
                    ),
                ),
            ).otherwise(F.array().cast("array<string>"))
            return F.concat(toks, bigrams)

        return _let(F.transform(tokens(c), lambda t: F.lower(t)), _grams)

    from pyspark import StorageLevel

    # cache=True persists the (id, bucket) feature stream, which feeds
    # BOTH the model counts and the scoring join — without the cache the
    # bigram+md5 pass runs twice (the same materialized-signature trade
    # as dedup.minhash_near_duplicates; ~13 B/occurrence,
    # MEMORY_AND_DISK so a 100 TB corpus spills instead of evicting).
    # The cache lives until the session unpersists or clears it — pass
    # cache=False for one-shot callers that prefer the recompute; a
    # production selection run would write this stream to a table once.
    ex = df.select(
        F.col(id_col),
        target.cast("int").alias("_t"),
        F.explode(feats(F.col(text_col))).alias("_g"),
    ).select(id_col, "_t", (token_hash32(F.col("_g")) % n_buckets).alias("bucket"))
    if cache:
        ex = track(ex.persist(StorageLevel.MEMORY_AND_DISK))
        # EAGER: the model chain reaches ex through broadcast subqueries
        # on concurrent driver threads that race the lazy cache's first
        # materialization — measured THREE identical full feature-stream
        # executions in one docs_dsir_weights run (the nb_classify race).
        ex.count()
    counts = ex.groupBy("bucket").agg(
        F.count("*").alias("c_s"),
        F.sum("_t").alias("c_t"),
    )
    totals = counts.agg(
        F.sum("c_s").cast("double").alias("_ns"),
        F.sum("c_t").cast("double").alias("_nt"),
    )
    lam = counts.crossJoin(F.broadcast(totals)).select(
        "bucket",
        (
            F.log((F.col("c_t") + F.lit(1)).cast("double") / (F.col("_nt") + F.lit(float(n_buckets))))
            - F.log((F.col("c_s") + F.lit(1)).cast("double") / (F.col("_ns") + F.lit(float(n_buckets))))
        ).alias("_lam"),
    )
    return (
        ex.join(F.broadcast(lam), "bucket")
        .groupBy(id_col)
        .agg(
            F.count("*").cast("bigint").alias("n_feats"),
            F.round(F.sum("_lam"), 6).alias("log_weight"),
        )
    )
