"""Scale smoke: a larger synthetic corpus through the full pipeline —
materialization ticks, merge, thread-span building across many streams.
Guards against accidental driver-side loops / per-row JVM crossings that
small fixtures would hide (no timing asserts: correctness + completion)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from micromegas_spark.materialize import LOG_STATS, Lakehouse
from micromegas_spark.operators.spans import build_thread_spans
from micromegas_spark.sources.synthetic import generate

HOUR = 3_600 * 10**9


@pytest.fixture(scope="module")
def big(spark):
    data = generate(
        seed=99, n_processes=6, streams_per_process=3, blocks_per_stream=30, events_per_block=600
    )
    return data


def test_scale_materialize_and_merge(spark, big, tmp_path):
    data = big
    assert len(data["log_entries"]) > 100_000
    spark.createDataFrame(data["blocks"]).join(
        spark.createDataFrame(data["streams"]).select("stream_id", "tags"), "stream_id"
    ).createOrReplaceTempView("blocks")
    spark.createDataFrame(data["log_entries"]).repartition(32).createOrReplaceTempView(
        "log_entries"
    )
    lake = Lakehouse(spark, str(tmp_path / "wh"))
    ins = [b["insert_time_ns"] for b in data["blocks"]]
    lo = min(ins) - min(ins) % HOUR
    hi = max(ins) - max(ins) % HOUR + HOUR
    stats = lake.materialize_range(LOG_STATS, lo, hi, HOUR)
    assert stats.get("created", 0) >= 1
    lake.merge_partitions(LOG_STATS, lo, hi)
    total = lake.read("log_stats").agg(F.sum("count")).collect()[0][0]
    assert total == len(data["log_entries"])


def test_scale_thread_spans_many_streams(spark):
    from tests.test_spans import _gen_stream_events

    events = []
    for i in range(24):
        events.extend(_gen_stream_events(f"s{i}", seed=1000 + i, n_frames=1500))
    df = spark.createDataFrame(events).repartition(32, "stream_id")
    spans = build_thread_spans(df, 0, 10**12)
    n = spans.count()
    n_begins = sum(1 for e in events if e["event_type"] == "begin")
    assert n == n_begins
    # invariant spot check distributed: no negative durations, depths sane
    bad = spans.where((F.col("duration") < 0) | (F.col("depth") < 0) | (F.col("depth") > 10)).count()
    assert bad == 0


def test_scale_dedup_and_selection_pipeline(spark):
    """MinHash near-dup + DSIR weights over a 4x-cloned corpus (20k docs):
    every clone pair must be discovered through the LSH path (identical
    signatures land in the same bucket), weights cover every doc, and the
    pipeline completes without driver-side loops."""
    from micromegas_spark.operators.dedup import minhash_near_duplicates
    from micromegas_spark.operators.sampling import dsir_log_weights
    from micromegas_spark.sources.tables import load_table

    base = load_table(spark, "/root/testdata/sf0.1", "documents").select(
        "doc_id", "text", "lang"
    )
    n = base.count()
    # clone the corpus 4x with offset ids: 0..n-1 originals, k*n+i clones
    d = base
    for k in (1, 2, 3):
        d = d.unionByName(
            base.select(
                (F.col("doc_id") + k * n).alias("doc_id"), "text", "lang"
            )
        )
    pairs = minhash_near_duplicates(d, threshold=0.99)
    # every doc has 3 clones → at least 4-choose-2 pairs per distinct text
    # (near-dups between distinct texts may add more; never fewer)
    assert pairs.count() >= 6 * n
    exact = pairs.where(F.col("jaccard") == 1.0)
    # each original participates in its clone clique via id_a=min
    assert exact.where(F.col("id_a") < n).count() >= 3 * n * 0.99
    w = dsir_log_weights(d, target=F.col("lang") == "en")
    assert w.count() == 4 * n


def test_scale_nb_and_semdedup(spark):
    """NB classifier over a 4x corpus and SemDeDup over a 4x embedding
    table: one tokenize pass + sparse scoring must classify every doc
    (clones classify identically), and every planted clone clique must
    lose exactly 3 of its 4 members to the gram-matrix pruning."""
    from micromegas_spark.operators.clustering import semdedup
    from micromegas_spark.operators.text import nb_classify
    from micromegas_spark.sources.tables import load_table

    base = load_table(spark, "/root/testdata/sf0.1", "documents").select(
        "doc_id", "text", "source"
    )
    n = base.count()
    d = base
    for k in (1, 2, 3):
        d = d.unionByName(
            base.select((F.col("doc_id") + k * n).alias("doc_id"), "text", "source")
        )
    out = nb_classify(d)
    assert out.count() == 4 * n
    # clones carry identical text → identical predictions as the original
    clone_diff = (
        out.select((F.col("doc_id") % n).alias("k"), "pred")
        .groupBy("k")
        .agg(F.countDistinct("pred").alias("np"))
        .where(F.col("np") > 1)
        .count()
    )
    assert clone_diff == 0

    ebase = load_table(spark, "/root/testdata/sf0.1", "embeddings").select(
        "vec_id", "embedding"
    )
    m = ebase.count()
    e = ebase
    for k in (1, 2, 3):
        e = e.unionByName(
            ebase.select((F.col("vec_id") + k * m).alias("vec_id"), "embedding")
        )
    marked = semdedup(e, k=8, threshold=0.999999, max_iter=2)
    assert marked.count() == 4 * m
    # identical vectors share a cluster (equal distances) and cos == 1:
    # exactly one member of each 4-clique survives
    kept = marked.where(F.col("keep")).count()
    assert kept == m


def test_scale_capped_dedup_survives_boilerplate_corpus(spark):
    """Round-3 guards under adversarial scale: 120k docs sharing one
    boilerplate template (the worst case for banded/inverted-index
    dedup). Every capped operator must COMPLETE with bounded candidate
    volume — before the caps, each of these was an O(n²)-pair plan that
    would never finish."""
    from micromegas_spark.operators import dedup

    n = 120_000
    docs = spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat(
            F.lit("terms of service apply to all pages of this site contact "
                  "support for assistance unique tail "),
            F.col("id").cast("string"),
            F.lit(" suffix"),
            (F.col("id") % 97).cast("string"),
        ).alias("text"),
    )
    # SimHash: the shared template makes most docs near-identical; capped
    # buckets keep the pair space bounded and the job finishes
    pairs = dedup.simhash_near_duplicates(
        docs, max_hamming=3, max_bucket_size=50
    ).count()
    assert pairs < 50 * 50 * 4 * 70_000 / 1000  # sane bound, not O(n²)

    # exact-substring: every doc shares the boilerplate windows; the df
    # cap drops them so candidates come only from sub-cap windows
    overlaps = dedup.exact_substring_overlaps(
        docs, window=8, max_doc_freq=50
    ).count()
    # all truly-shared windows are boilerplate (df = 120k > cap → dropped);
    # the residue is 32-bit window-hash birthday collisions (~500k hashes),
    # nowhere near the 7×10⁹ quadratic pair space the cap prevents
    assert overlaps < 100

    # cross-corpus: training vs a 1k benchmark slice of the same template;
    # the bench-side bucket cap keeps the A×B join bounded
    bench = docs.where(F.col("doc_id") < 1_000)
    train = docs.where(F.col("doc_id") >= 1_000)
    flagged = dedup.cross_near_duplicates(
        train, bench, threshold=0.9, max_bucket_size=100
    ).count()
    assert flagged >= 0  # completion is the assertion; volume bounded by cap

    # blocked Jaccard: 120k near-equal-length docs land in a handful of
    # length blocks — the retired block self-join was O(block²) (~7×10⁹
    # pairs); the prefix-filter index caps boilerplate shingles
    # (df = 120k > cap → dropped) while every tail shingle contains the
    # doc id (df = 1), so candidates are only hash-collision residue
    jac = dedup.blocked_jaccard_pairs(
        docs.withColumn("n_chars", F.length("text")), threshold=0.5, max_doc_freq=50
    ).count()
    assert jac < 100
    # release the session-lifetime persisted shingle relations so the rest
    # of the (shared-session) suite does not inherit the memory pressure
    spark.catalog.clearCache()


def test_scale_fuzzy_join_dense_corpus(spark):
    """120k strings sharing one boilerplate template: every boilerplate
    segment bucket is corpus-sized, so without the df cap the candidate
    join would be ~1.4x10^10 pairs. The cap drops those buckets
    (df = 120k > cap) — which also surrenders pairs that differ ONLY
    inside their high-entropy region (the documented lossy-cap contract
    every sibling dedup operator shares) — while pairs that share any
    sub-cap segment are still found: 1k planted single-char mutants keep
    their id-bearing segment (df = 2) and all surface at distance 1.
    The assertion is bounded completion + exact planted recall, not a
    quadratic stall."""
    from micromegas_spark.operators.fuzzyjoin import edit_distance_pairs

    n = 120_000
    base = spark.range(n).select(
        F.col("id"),
        F.concat(
            F.lit("customer record for account number "),
            F.format_string("%07d", F.col("id")),
            F.lit(" status active tier gold region north"),
        ).alias("t"),
    )
    # 1k mutants: one boilerplate char replaced ('north' -> 'norxh'),
    # id-digit segment untouched
    mutants = base.where(F.col("id") < 1_000).select(
        (F.col("id") + n).alias("id"),
        F.regexp_replace(F.col("t"), "north$", "norxh").alias("t"),
    )
    docs = base.unionByName(mutants).repartition(32)
    pairs = edit_distance_pairs(docs, "t", "id", k=2, max_bucket_size=100)
    rows = pairs.collect()
    planted = {(r.id_a, r.id_b) for r in rows if r.id_b >= n}
    # every planted (i, i+n) mutant pair is recovered, at distance 1
    assert planted == {(i, i + n) for i in range(1_000)}
    assert all(r.dist == 1 for r in rows if r.id_b >= n)
    # and the un-capped boilerplate pair space never materializes
    assert len(rows) < 3_000_000


def test_scale_winnow_survives_boilerplate_corpus(spark):
    """Winnowing under the adversarial template corpus: the shared
    boilerplate's fingerprints have document frequency = corpus size,
    far above max_doc_freq — the cap must drop them so candidate volume
    stays bounded by genuinely-shared rare fingerprints, not O(n²)
    template pairs."""
    from micromegas_spark.operators import dedup

    n = 60_000
    docs = spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat(
            F.lit("terms of service apply to all pages of this site contact "
                  "support for assistance unique tail "),
            F.col("id").cast("string"),
            F.lit(" suffix"),
            (F.col("id") % 97).cast("string"),
        ).alias("text"),
    )
    pairs = dedup.winnow_overlap_pairs(
        docs, min_shared=1, max_doc_freq=100
    ).count()
    # boilerplate fps have df=60k >> 100 → dropped; survivors are the
    # short unique tails, whose buckets are tiny
    assert pairs < 2_000_000


def test_session_env_knobs_resolve(monkeypatch):
    """The two cluster-profile env overrides (SCALE.md round-9 octave):
    shuffle partitions and parquet split size resolve from the env when
    set and fall back to the local-profile defaults when absent."""
    from micromegas_spark.session import _max_partition_bytes, _shuffle_partitions

    monkeypatch.delenv("SPARK_GRAFT_SHUFFLE_PARTITIONS", raising=False)
    monkeypatch.delenv("SPARK_GRAFT_MAX_PARTITION_BYTES", raising=False)
    assert _shuffle_partitions("32") == "256"
    assert _max_partition_bytes() == str(2 * 1024 * 1024)
    monkeypatch.setenv("SPARK_GRAFT_SHUFFLE_PARTITIONS", "1024")
    monkeypatch.setenv("SPARK_GRAFT_MAX_PARTITION_BYTES", str(128 * 1024 * 1024))
    assert _shuffle_partitions("32") == "1024"
    assert _max_partition_bytes() == str(128 * 1024 * 1024)
