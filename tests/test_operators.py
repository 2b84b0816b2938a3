"""Semantic tests for the operator layer — properties the duckdb oracle
can't express (recall of approximate algorithms, struct-UDAF invariants,
pandas-UDF paths)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from micromegas_spark.functions import histogram as H
from micromegas_spark.functions import jsonb as J
from micromegas_spark.operators import dedup, similarity, text
from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def docs(spark):
    from micromegas_spark.sources.tables import load_table

    return load_table(spark, SF_SMOKE, "documents").cache()


def test_dedup_exact_keeps_min_id(spark):
    df = spark.createDataFrame(
        [(1, "hello  world"), (2, "HELLO WORLD"), (3, "other doc"), (4, "hello world")],
        ["doc_id", "text"],
    )
    kept = sorted(r.doc_id for r in dedup.dedup_exact(df).collect())
    # 1, 2, 4 canonicalize identically (lowercase, whitespace collapsed)
    assert kept == [1, 3]


def test_minhash_lsh_recall_against_ground_truth(spark, docs):
    """Every pair with true Jaccard ≥ 0.9 must be caught by 4x2 banding
    (P(miss) = (1-j²)⁴ ≤ 0.001 at j=0.9; the fixture near-dups are ≥0.9)."""
    truth = {
        (r.id_a, r.id_b): r.jaccard
        for r in dedup.blocked_jaccard_pairs(docs, threshold=0.9, block_width=10**9).collect()
    }
    assert truth, "fixture should contain planted near-duplicates"
    found = {
        (r.id_a, r.id_b) for r in dedup.minhash_near_duplicates(docs, threshold=0.8).collect()
    }
    missed = set(truth) - found
    assert not missed, f"LSH missed high-similarity pairs: {missed}"


def test_simhash_near_duplicates_pigeonhole_complete(spark, docs):
    """The banded join's guarantee: with 4 chunks, EVERY pair at true
    Hamming distance ≤ 3 is found (pigeonhole: ≤3 differing bits can't
    touch all 4 chunks). Ground truth via brute-force simhash cross-join."""
    sh = dedup.simhash64(docs).cache()
    a = sh.select(F.col("doc_id").alias("id_a"), F.col("simhash").alias("ha"))
    b = sh.select(F.col("doc_id").alias("id_b"), F.col("simhash").alias("hb"))
    truth = {
        (r.id_a, r.id_b): r.ham
        for r in a.crossJoin(b)
        .where(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a", "id_b", F.bit_count(F.col("ha").bitwiseXOR(F.col("hb"))).alias("ham")
        )
        .where(F.col("ham") <= 3)
        .collect()
    }
    assert truth, "fixture should contain close simhash pairs"
    found = {
        (r.id_a, r.id_b): r.hamming
        for r in dedup.simhash_near_duplicates(docs, max_hamming=3).collect()
    }
    assert found == truth
    # chunks=5 does not divide 64: the last chunk absorbs the remainder
    # bits (12,12,12,12,16) so ALL 64 signature bits key the buckets — a
    # uniform 12-bit layout kept full recall (uncovered-bit diffs leave
    # every chunk key equal, and the exact Hamming verify still filters)
    # but let docs differing only in bits 60-63 collide into one bucket;
    # pigeonhole guarantees recall at max_hamming ≤ chunks-1 either way,
    # so the output must be identical
    found5 = {
        (r.id_a, r.id_b): r.hamming
        for r in dedup.simhash_near_duplicates(docs, max_hamming=3, chunks=5).collect()
    }
    assert found5 == truth
    # discriminative sanity: only a minority of all pairs are this close
    # (the synthetic corpus shares one small vocabulary, so simhashes are
    # globally similar — ~13% of pairs sit within distance 3; real corpora
    # are far sparser)
    n_docs = sh.count()
    assert len(found) < 0.2 * (n_docs * (n_docs - 1) / 2)


def test_cosine_topk_matches_numpy(spark):
    import numpy as np

    rng = np.random.RandomState(7)
    vecs = rng.randn(50, 8).astype("float32")
    df = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(50)], ["vec_id", "embedding"]
    )
    got = [r.vec_id for r in similarity.cosine_topk(df, query_id=0, k=5).collect()]
    q = vecs[0]
    sims = vecs @ q / (np.linalg.norm(vecs, axis=1) * np.linalg.norm(q))
    sims[0] = -2
    want = list(np.argsort(-np.round(sims, 6), kind="stable")[:5])
    assert got == [int(w) for w in want]


def test_lsh_ann_subset_of_bucket(spark):
    from micromegas_spark.sources.tables import load_table

    emb = load_table(spark, SF_SMOKE, "embeddings")
    ann = similarity.lsh_ann_topk(emb, query_id=0, k=10).collect()
    assert 0 < len(ann) <= 10
    # every ANN result must be a true member of the query's sign bucket
    b = emb.select(
        "vec_id", similarity.sign_bucket(F.col("embedding"), similarity.DEFAULT_LSH_DIMS).alias("bkt")
    )
    qb = b.where(F.col("vec_id") == 0).collect()[0].bkt
    members = {r.vec_id for r in b.where(F.col("bkt") == qb).collect()}
    assert {r.vec_id for r in ann} <= members


# ---------------------------------------------------------------------------
# histogram struct aggregate
# ---------------------------------------------------------------------------


def test_histogram_agg_struct_fields(spark):
    df = spark.createDataFrame([(float(v),) for v in [1, 2, 2, 3, 9, 15, -5]], ["v"])
    h = df.agg(H.histogram_agg(F.col("v"), 0.0, 10.0, 5).alias("h")).collect()[0].h
    assert h["count"] == 7
    assert h["min"] == -5 and h["max"] == 15
    assert h["sum"] == 27
    # values: -5(clamp→bin0), 1(bin0), 2,2,3(bin1), 9(bin4), 15(clamp→bin4)
    assert list(h["bins"]) == [2, 3, 0, 0, 2]


def test_histogram_quantile_matches_reference_formula(spark):
    # uniform values 0..99 in [0,100) with 10 bins: p50 → exactly 50.0
    df = spark.createDataFrame([(float(v),) for v in range(100)], ["v"])
    hdf = df.agg(H.histogram_agg(F.col("v"), 0.0, 100.0, 10).alias("h"))
    row = hdf.select(
        H.quantile_from_histogram(F.col("h"), 0.5).alias("p50"),
        H.quantile_from_histogram(F.col("h"), 0.95).alias("p95"),
        H.variance_from_histogram(F.col("h")).alias("var"),
        H.count_from_histogram(F.col("h")).alias("cnt"),
    ).collect()[0]
    assert row.p50 == 50.0
    assert row.p95 == 95.0
    assert row.cnt == 100
    # sample variance of 0..99 = 841.66...
    assert abs(row.var - 841.6666666) < 1e-4


def test_sum_histograms_aggregate_expression(spark):
    """The single-expression merge (A5) equals the direct global histogram."""
    data = [(i % 5, float(i % 17)) for i in range(300)]
    df = spark.createDataFrame(data, ["part", "v"])
    direct = df.agg(H.histogram_agg(F.col("v"), 0.0, 20.0, 4).alias("h")).collect()[0].h
    partial = df.groupBy("part").agg(H.histogram_agg(F.col("v"), 0.0, 20.0, 4).alias("h"))
    merged = partial.agg(H.sum_histograms(F.col("h"), 4).alias("h")).collect()[0].h
    assert list(merged["bins"]) == list(direct["bins"])
    assert merged["count"] == direct["count"]
    assert merged["min"] == direct["min"] and merged["max"] == direct["max"]
    assert abs(merged["sum"] - direct["sum"]) < 1e-9


def test_histogram_merge_equals_direct(spark):
    """Composable-aggregate contract (sql_batch_view.rs:170-175): building
    per-partition histograms then merging equals one global histogram."""
    data = [(i % 7, float(i % 23)) for i in range(500)]
    df = spark.createDataFrame(data, ["part", "v"])
    direct = df.agg(H.histogram_agg(F.col("v"), 0.0, 25.0, 5).alias("h")).collect()[0].h
    partial = df.groupBy("part").agg(H.histogram_agg(F.col("v"), 0.0, 25.0, 5).alias("h"))
    merged = H.merge_histograms(partial.withColumn("g", F.lit(1)), "h", ["g"]).collect()[0].h
    assert list(merged["bins"]) == list(direct["bins"])
    assert merged["count"] == direct["count"]
    assert abs(merged["sum"] - direct["sum"]) < 1e-9


def test_expand_histogram(spark):
    df = spark.createDataFrame([(float(v),) for v in range(10)], ["v"])
    hdf = df.agg(H.histogram_agg(F.col("v"), 0.0, 10.0, 5).alias("h"))
    rows = H.expand_histogram(hdf, "h").collect()
    assert [(r.bin_center, r["count"]) for r in rows] == [
        (1.0, 2), (3.0, 2), (5.0, 2), (7.0, 2), (9.0, 2),
    ]


# ---------------------------------------------------------------------------
# jsonb family
# ---------------------------------------------------------------------------


def test_jsonb_scalars(spark):
    df = spark.createDataFrame(
        [('{"a": 1, "b": "x", "c": [1, 2, 3]}',), ("not json",), (None,)], ["j"]
    )
    out = df.select(
        J.jsonb_get(F.col("j"), "a").alias("a"),
        J.jsonb_as_i64(J.jsonb_get(F.col("j"), "a")).alias("a_i"),
        J.jsonb_object_keys(F.col("j")).alias("keys"),
        J.jsonb_array_length(J.jsonb_get(F.col("j"), "c")).alias("clen"),
    ).collect()
    assert out[0].a == "1" and out[0].a_i == 1
    assert list(out[0].keys) == ["a", "b", "c"] and out[0].clen == 3
    assert out[1].a is None and out[2].a is None


def test_jsonb_path_query_filter_predicate(spark):
    """The JSONPath filter form the reference supports
    (functions-reference.md:349-392): $[*] ? (@.f == "x")."""
    df = spark.createDataFrame(
        [('[{"name":"a","v":1},{"name":"b","v":2},{"name":"a","v":3}]',)], ["j"]
    )
    out = df.select(
        J.jsonb_path_query(F.col("j"), '$[*] ? (@.name == "a")').alias("m"),
        J.jsonb_path_query_first(F.col("j"), "$[1].name").alias("first"),
    ).collect()[0]
    assert out.m == '[{"name":"a","v":1},{"name":"a","v":3}]'
    assert out.first == '"b"'


def test_jsonb_each_and_array_elements(spark):
    df = spark.createDataFrame([(1, '{"x": 1, "y": "s"}'), (2, '["p", "q"]')], ["id", "j"])
    each = {(r.id, r.key): r.value for r in J.jsonb_each(df, "j", ["id"]).collect()}
    assert each[(1, "x")] == "1" and each[(1, "y")] == "s"
    assert each[(2, "0")] == "p" and each[(2, "1")] == "q"
    arr = [r.value for r in J.jsonb_array_elements(df, "j", ["id"]).collect()]
    assert arr == ["p", "q"]


# ---------------------------------------------------------------------------
# text analysis
# ---------------------------------------------------------------------------


def test_lang_id_markers(spark):
    df = spark.createDataFrame(
        [
            ("the cat of the house and a dog",),
            ("der hund und die katze ist das",),
            ("le chat et la maison est les",),
        ],
        ["text"],
    )
    out = [r.lang for r in df.select(text.lang_id(F.col("text")).alias("lang")).collect()]
    assert out == ["en", "de", "fr"]


def test_quality_features_consistency(spark, docs):
    feats = text.quality_features(F.col("text"))
    row = docs.select(
        feats["n_tokens"].alias("nt"),
        feats["n_uniq_tokens"].alias("nu"),
        feats["stopword_ratio"].alias("sr"),
        feats["avg_token_len"].alias("al"),
    ).agg(
        F.min("nt"), F.min(F.col("nu") <= F.col("nt")), F.min("sr"), F.max("sr"), F.min("al")
    ).collect()[0]
    assert row[0] >= 1  # every doc tokenizes
    assert row[1] is True  # uniq ≤ total
    assert 0.0 <= row[2] <= row[3] <= 1.0
    assert row[4] > 0


def test_containment_prefix_filter_boundary(spark):
    """A doc missing exactly n*(1-t) shingles sits AT the containment
    threshold; the prefix filter must still surface it (the integral-
    boundary case where floor((1-t)*n)+1 under float arithmetic comes up
    one element short). Also: containment is directional."""
    from micromegas_spark.operators.dedup import containment_pairs

    # 12 tokens -> 10 word-trigram shingles; b = a with the LAST trigram
    # region changed -> 9/10 shared shingles = containment exactly 0.9
    words = [f"w{i}" for i in range(12)]
    a_text = " ".join(words)
    b_text = " ".join(words[:-1] + ["zz"])
    big = " ".join(words + ["tail1", "tail2", "tail3", "tail4"])
    df = spark.createDataFrame(
        [(1, a_text), (2, b_text), (3, big)], "doc_id bigint, text string"
    )
    got = {(r["id_a"], r["id_b"]): r["containment"]
           for r in containment_pairs(df, threshold=0.9).collect()}
    # 1 vs 2: 9/10 shared = 0.9 both directions (equal sizes)
    assert got[(1, 2)] == 0.9 and got[(2, 1)] == 0.9
    # 1 is fully contained in 3; 3 is NOT contained in 1 (directional)
    assert got[(1, 3)] == 1.0
    assert (3, 1) not in got


def test_exact_substring_overlaps_planted_quote(spark):
    """A 20-token quote copied into an otherwise-different doc is found
    with the exact window count; unrelated docs share nothing."""
    from micromegas_spark.operators.dedup import exact_substring_overlaps

    quote = " ".join(f"q{i}" for i in range(22))  # 22 tokens → 3 windows
    a = "intro words here " + quote + " closing remarks"
    b = "completely different opening " + quote + " and another tail"
    c = " ".join(f"z{i}" for i in range(40))
    df = spark.createDataFrame(
        [(1, a), (2, b), (3, c)], "doc_id bigint, text string"
    )
    got = {(r["id_a"], r["id_b"]): r["n_shared_windows"]
           for r in exact_substring_overlaps(df, window=20).collect()}
    assert (1, 2) in got and got[(1, 2)] == 3  # the quote's 3 windows
    assert all(k == (1, 2) for k in got)  # c shares nothing


def test_exact_substring_ignores_short_docs(spark):
    """Identical docs SHORTER than the window share no window-length run
    and must produce no pair (the whole-text n-gram fallback would
    otherwise fabricate one)."""
    from micromegas_spark.operators.dedup import exact_substring_overlaps

    df = spark.createDataFrame(
        [(1, "tiny identical doc"), (2, "tiny identical doc")],
        "doc_id bigint, text string",
    )
    assert exact_substring_overlaps(df, window=20).count() == 0


def test_frequent_gram_cap_bounds_boilerplate_corpus(spark):
    """A gram shared by every doc (license-header boilerplate) must be
    dropped from the inverted indexes by the df cap, keeping candidate
    counts bounded — while grams under the cap still match."""
    from micromegas_spark.operators.dedup import (
        containment_pairs,
        exact_substring_overlaps,
    )

    boiler = "this license header appears verbatim on every single page of the site " * 3
    rows = [(i, boiler + f" unique tail {i} aa{i} bb{i} cc{i}") for i in range(40)]
    # two genuine near-dups sharing a sub-cap window on top of boilerplate
    rows += [(100, boiler + " shared quoted paragraph " + " ".join(f"q{j}" for j in range(25))),
             (101, boiler + " shared quoted paragraph " + " ".join(f"q{j}" for j in range(25)))]
    df = spark.createDataFrame(rows, ["doc_id", "text"])

    # cap below the boilerplate df (42 docs) -> boilerplate grams dropped;
    # the planted pair still matches through its sub-cap shared windows
    pairs = exact_substring_overlaps(df, window=20, max_doc_freq=10).collect()
    found = {(r.id_a, r.id_b) for r in pairs}
    assert (100, 101) in found
    # every surviving pair owes its windows to sub-cap grams: the pure
    # boilerplate docs (0..39) may pair only via windows spanning into
    # their unique tails, never the quadratic all-pairs explosion
    assert len(pairs) < 42 * 41 / 2 / 4

    cpairs = containment_pairs(df, threshold=0.9, max_doc_freq=10)
    # with the boilerplate index rows dropped, candidate generation is
    # bounded; correctness: uncapped run finds a superset
    capped = {(r.id_a, r.id_b) for r in cpairs.collect()}
    uncapped = {(r.id_a, r.id_b)
                for r in containment_pairs(df, threshold=0.9, max_doc_freq=10**9).collect()}
    assert capped <= uncapped


def test_jsonb_path_query_reference_doc_examples(spark):
    """The reference's documented SQL/JSON-path examples
    (functions-reference.md:349-392) verbatim, plus the widened surface:
    nested filters, && / || with parens, navigation past a filter,
    recursive descent, and parse-error -> NULL."""
    rows = [
        (1, '{"items": [{"type": "active", "id": 1}, {"type": "inactive", "id": 2}]}'),
    ]
    df = spark.createDataFrame(rows, ["i", "j"])

    def q(path, col="j"):
        return df.select(J.jsonb_path_query(F.col(col), path).alias("m")).collect()[0].m

    assert q('$.items[*] ? (@.type == "active")') == '[{"type":"active","id":1}]'
    teams = spark.createDataFrame(
        [(1, '{"teams": [{"players": [{"type":"human","n":1},{"type":"bot","n":2}]},'
             '{"players": [{"type":"human","n":3}]}]}')],
        ["i", "j"],
    )
    got = teams.select(
        J.jsonb_path_query(F.col("j"), '$.teams[*].players[*] ? (@.type == "human")').alias("m"),
        J.jsonb_path_query(F.col("j"), '$.teams[*].players[*] ? (@.type == "human").n').alias("ns"),
        J.jsonb_path_query(F.col("j"), "$..n").alias("rec"),
        J.jsonb_path_query(
            F.col("j"), '$.teams[*].players[*] ? (@.n > 1 && @.type == "bot")'
        ).alias("b"),
        J.jsonb_path_query(
            F.col("j"), '$.teams[*].players[*] ? ((@.n == 1 || @.n == 3) && @.type == "human")'
        ).alias("orr"),
        J.jsonb_path_query(F.col("j"), '$.teams[?(@.x==1)]').alias("bad"),
    ).collect()[0]
    assert got.m == '[{"type":"human","n":1},{"type":"human","n":3}]'
    assert got.ns == "[1,3]"
    assert got.rec == "[1,2,3]"
    assert got.b == '[{"type":"bot","n":2}]'
    assert got.orr == '[{"type":"human","n":1},{"type":"human","n":3}]'
    assert got.bad is None  # JavaScript-style filter: parse error -> NULL


def test_cross_near_duplicates_flags_only_cross_matches(spark):
    """Decontamination: a training doc is flagged iff it near-dups a
    BENCHMARK doc — train-train duplicates stay, and the flag carries the
    match count and best Jaccard."""
    t = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"
    train = spark.createDataFrame(
        [(1, t), (2, t), (3, "completely different training words here today")],
        ["doc_id", "text"],
    )
    bench = spark.createDataFrame(
        [(100, t), (101, "unrelated benchmark content nothing matches this")],
        ["doc_id", "text"],
    )
    got = {r.doc_id: (r.n_bench_matches, r.max_jaccard)
           for r in dedup.cross_near_duplicates(train, bench, threshold=0.8).collect()}
    assert set(got) == {1, 2}  # both copies flagged; doc 3 clean
    assert got[1] == (1, 1.0) and got[2] == (1, 1.0)


def test_cdc_chunks_edit_locality(spark):
    """The CDC property fixed-width blocking lacks: an insertion early in
    a document moves only boundaries whose windows overlap it, so chunks
    of the unchanged suffix keep identical hashes and still dedup across
    the two versions."""
    import random
    import string

    rng = random.Random(42)
    base = "".join(rng.choice(string.ascii_lowercase) for _ in range(600))
    edited = base[:10] + "XYZ" + base[10:]
    df = spark.createDataFrame([(1, base), (2, edited)], ["doc_id", "text"])
    rows = dedup.cdc_chunks(df).collect()
    h1 = {r.chunk_md5 for r in rows if r.doc_id == 1}
    h2 = {r.chunk_md5 for r in rows if r.doc_id == 2}
    assert len(h1) >= 3, "corpus should produce several chunks"
    shared = h1 & h2
    # only chunks whose windows overlap the edit can differ (≤3 with the
    # edit inside the first chunk region); the suffix re-aligns by content
    assert len(shared) >= len(h1) - 3, (len(h1), len(h2), len(shared))
    # chunk geometry invariants: chunks tile the document exactly
    for doc_id, txt in ((1, base), (2, edited)):
        cs = sorted(
            (r.chunk_start, r.chunk_len) for r in rows if r.doc_id == doc_id
        )
        assert cs[0][0] == 1
        for (s0, l0), (s1, _) in zip(cs, cs[1:]):
            assert s0 + l0 == s1
        assert cs[-1][0] + cs[-1][1] == len(txt) + 1

    # short doc (< window+1): exactly one chunk spanning the whole text
    one = dedup.cdc_chunks(
        spark.createDataFrame([(9, "tiny doc")], ["doc_id", "text"])
    ).collect()
    assert len(one) == 1 and one[0].chunk_len == 8 and one[0].chunk_start == 1


def test_gapfill_linear_basic(spark):
    """Interior gaps lerp between neighbors; observed bins pass through;
    single-point series densify to themselves."""
    from micromegas_spark.operators.timeseries import gapfill_linear

    rows = [
        ("a", 10, 1.0), ("a", 13, 7.0), ("a", 14, 2.0),
        ("b", 5, 4.0),
    ]
    df = spark.createDataFrame(rows, "s string, b long, v double")
    got = {
        (r.s, r.b): (round(r.v, 9), r.interpolated)
        for r in gapfill_linear(df, "s", "b", "v").collect()
    }
    assert got == {
        ("a", 10): (1.0, 0),
        ("a", 11): (3.0, 1),   # 1 + (7-1)*(1/3)
        ("a", 12): (5.0, 1),
        ("a", 13): (7.0, 0),
        ("a", 14): (2.0, 0),
        ("b", 5): (4.0, 0),
    }


def test_funnel_counts_order_and_window(spark):
    """Earliest-anchor greedy funnel: order matters (click before view
    doesn't count) and the window bounds completion."""
    from micromegas_spark.operators.funnel import funnel_counts

    rows = [
        # u1 completes in order within window
        (1, "view", 100), (1, "click", 200), (1, "buy", 300),
        # u2 clicks BEFORE viewing -> stops at view
        (2, "click", 50), (2, "view", 100),
        # u3 completes but outside the window
        (3, "view", 100), (3, "click", 200), (3, "buy", 5000),
    ]
    df = spark.createDataFrame(rows, "user_id INT, event_type STRING, ts BIGINT")
    got = {
        (r["step"], r["event_type"]): r["n"]
        for r in funnel_counts(df, ["view", "click", "buy"], window=1000).collect()
    }
    assert got == {(1, "view"): 3, (2, "click"): 2, (3, "buy"): 1}
    # unwindowed: u3's late buy now counts
    got2 = {
        r["step"]: r["n"]
        for r in funnel_counts(df, ["view", "click", "buy"]).collect()
    }
    assert got2 == {1: 3, 2: 2, 3: 2}


def test_histogram_sql_spellings_match_python_accessors(spark):
    """Round-8: the functions-reference SQL spellings (count/sum/
    variance/quantile _from_histogram) are SQL macros that must agree
    bit-for-bit with the Column-level accessors, including quantile's
    rank interpolation, empty-bin skip, and `end` fallback."""
    from pyspark.sql import functions as F

    from micromegas_spark.functions import register_all
    from micromegas_spark.functions.histogram import (
        count_from_histogram,
        histogram_agg,
        quantile_from_histogram,
        sum_from_histogram,
        variance_from_histogram,
    )

    register_all(spark)
    vals = [float(v) for v in [1, 2, 2, 3, 5, 8, 13, 21, 34, 55, 89, 89, 90]]
    df = spark.createDataFrame([(v,) for v in vals], ["v"])
    h = df.agg(histogram_agg(F.col("v"), 0.0, 100.0, 10).alias("h"))
    h.createOrReplaceTempView("hist_tbl")
    for ratio in (0.0, 0.25, 0.5, 0.9, 0.999, 1.0):
        py = h.select(
            count_from_histogram(F.col("h")).alias("c"),
            sum_from_histogram(F.col("h")).alias("s"),
            variance_from_histogram(F.col("h")).alias("var"),
            quantile_from_histogram(F.col("h"), ratio).alias("q"),
        ).collect()[0]
        sql = spark.sql(
            "SELECT count_from_histogram(h) AS c, sum_from_histogram(h) AS s, "
            "variance_from_histogram(h) AS var, "
            f"quantile_from_histogram(h, {ratio}d) AS q FROM hist_tbl"
        ).collect()[0]
        assert (py["c"], py["s"]) == (sql["c"], sql["s"])
        assert abs(py["var"] - sql["var"]) < 1e-9
        assert abs(py["q"] - sql["q"]) < 1e-9, (ratio, py["q"], sql["q"])
    # degenerate: all values in one bin; ratio beyond any bin -> end
    one = spark.createDataFrame([(50.0,)], ["v"]).agg(
        histogram_agg(F.col("v"), 0.0, 100.0, 4).alias("h")
    )
    one.createOrReplaceTempView("hist_one")
    py_q = one.select(quantile_from_histogram(F.col("h"), 1.0).alias("q")).collect()[0]["q"]
    sql_q = spark.sql("SELECT quantile_from_histogram(h, 1.0d) AS q FROM hist_one").collect()[0]["q"]
    assert abs(py_q - sql_q) < 1e-9
