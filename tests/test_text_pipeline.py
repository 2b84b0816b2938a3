"""Unit tests for the training-data hygiene operators: repetition
metrics, PII detection/redaction, benchmark-contamination overlap.

The synthetic documents table is PII-free, so the driver-contract
`docs_pii_scan` query only proves plumbing; the detection semantics are
pinned here on seeded rows."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from micromegas_spark.operators import pii
from micromegas_spark.operators.contamination import ngram_overlap
from micromegas_spark.operators.text import repetition_features, word_ngrams


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_word_ngrams_counts_and_fallback(spark):
    df = _docs(spark, [(1, "a b c d"), (2, "a")])
    out = {
        r.doc_id: r.g
        for r in df.select("doc_id", word_ngrams(F.col("text"), 2).alias("g")).collect()
    }
    assert out[1] == ["a b", "b c", "c d"]  # non-distinct, order preserved
    assert out[2] == ["a"]  # short-doc fallback: whole trimmed text


def test_repetition_features_extremes(spark):
    df = _docs(
        spark,
        [
            (1, "x x x x x x"),  # one token repeated: every share is 1.0
            (2, "a b c d e f"),  # all distinct: no repetition at all
            (3, "a b a b a b"),  # alternating: top bigram 'a b' dominates
        ],
    )
    got = {r.doc_id: r for r in repetition_features(df).collect()}
    assert got[1].top_token_share == 1.0
    assert got[1].top_bigram_share == 1.0
    assert got[1].dup_trigram_frac == pytest.approx(3 / 4)
    assert got[2].top_token_share == pytest.approx(1 / 6)
    assert got[2].dup_trigram_frac == 0.0
    # doc 3: tokens a×3 b×3 → top token 3/6; bigrams: 'a b'×3, 'b a'×2 → 3/5
    assert got[3].top_token_share == pytest.approx(3 / 6)
    assert got[3].top_bigram_share == pytest.approx(3 / 5)


def test_pii_counts_and_redact(spark):
    df = _docs(
        spark,
        [
            (1, "mail me at jane.doe+x@example.co.uk or call 555-123-4567"),
            (2, "server at 10.0.0.1 leaked ssn 123-45-6789"),
            (3, "clean text with no identifiers at all"),
        ],
    )
    c = pii.pii_counts(F.col("text"))
    got = {
        r.doc_id: r
        for r in df.select(
            "doc_id",
            c["email"].alias("email"),
            c["phone"].alias("phone"),
            c["ipv4"].alias("ipv4"),
            c["ssn"].alias("ssn"),
            pii.has_pii(F.col("text")).alias("hit"),
            pii.redact(F.col("text")).alias("red"),
        ).collect()
    }
    assert (got[1].email, got[1].phone) == (1, 1) and got[1].hit
    assert (got[2].ipv4, got[2].ssn) == (1, 1) and got[2].hit
    assert not got[3].hit
    assert got[3].red == "clean text with no identifiers at all"  # unchanged
    assert "[EMAIL]" in got[1].red and "[PHONE]" in got[1].red
    assert "[IPV4]" in got[2].red and "[SSN]" in got[2].red
    assert "jane" not in got[1].red and "6789" not in got[2].red


def test_redact_ssn_wins_over_phone(spark):
    # an SSN is also three digit groups; the typed placeholder must be SSN
    df = _docs(spark, [(1, "ssn 123-45-6789 end")])
    red = df.select(pii.redact(F.col("text")).alias("r")).collect()[0].r
    assert red == "ssn [SSN] end"


def test_ngram_overlap_basic(spark):
    corpus = _docs(
        spark,
        [
            (10, "the quick brown fox jumps over the lazy dog"),
            (11, "completely unrelated text with different words entirely"),
        ],
    )
    bench = _docs(spark, [(1, "a quick brown fox jumps over a fence")])
    got = {r.doc_id: r for r in ngram_overlap(corpus, bench, n=5).collect()}
    # shared 5-gram: 'quick brown fox jumps over' — exactly one
    assert set(got) == {10}
    assert got[10].n_shared_grams == 1 and got[10].n_bench_docs == 1


def test_ngram_overlap_shuffle_fallback_matches(spark):
    corpus = _docs(spark, [(1, "one two three four five six"), (2, "x y z")])
    bench = _docs(spark, [(9, "zero one two three four five")])
    a = sorted(ngram_overlap(corpus, bench, n=5, broadcast_bench=True).collect())
    b = sorted(ngram_overlap(corpus, bench, n=5, broadcast_bench=False).collect())
    assert a == b and len(a) == 1


def test_boilerplate_coverage_edges(spark):
    import pandas as pd

    from micromegas_spark.operators.text import boilerplate_coverage

    # 5 docs sharing one template trigram + unique tails
    rows = [(i, f"shared boiler plate unique{i} tail{i} end{i}") for i in range(5)]
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "text"]))
    out = {r["doc_id"]: r for r in boilerplate_coverage(df, min_df=5).collect()}
    for i in range(5):
        r = out[i]
        assert r["n_frequent"] == 1  # only 'shared boiler plate' hits df>=5
        assert r["n_shingles"] == 4
        assert abs(r["coverage"] - 0.25) < 1e-9
    # raise the threshold → nothing is frequent
    out2 = boilerplate_coverage(df, min_df=6).collect()
    assert all(r["n_frequent"] == 0 for r in out2)


def test_token_entropy_known_values(spark):
    import math

    import pandas as pd

    from micromegas_spark.operators.text import token_entropy

    rows = [
        (1, "a b c d"),          # uniform over 4 → H = 2
        (2, "a a a a"),          # constant → H = 0
        (3, "a a b b b b"),      # p = 1/3, 2/3
    ]
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "text"]))
    out = {r["doc_id"]: r["entropy"] for r in token_entropy(df).collect()}
    assert abs(out[1] - 2.0) < 1e-6
    assert abs(out[2] - 0.0) < 1e-6
    expect = -(1 / 3) * math.log2(1 / 3) - (2 / 3) * math.log2(2 / 3)
    assert abs(out[3] - expect) < 1e-6


def test_unigram_logprob_known_values(spark):
    import math

    from micromegas_spark.operators.text import unigram_logprob

    # corpus: 'a' x3, 'b' x2, 'c' x1 → N=6, V=3; smoothed logp:
    #   a: ln(4/9), b: ln(3/9), c: ln(2/9)
    df = _docs(spark, [(1, "a a b"), (2, "a b c")])
    got = {r.doc_id: r for r in unigram_logprob(df).collect()}
    lp = {t: math.log((c + 1) / 9.0) for t, c in {"a": 3, "b": 2, "c": 1}.items()}
    assert got[1].n_tokens == 3
    assert got[1].cross_entropy == pytest.approx(
        -(2 * lp["a"] + lp["b"]) / 3, abs=1e-6
    )
    assert got[2].n_tokens == 3
    assert got[2].cross_entropy == pytest.approx(
        -(lp["a"] + lp["b"] + lp["c"]) / 3, abs=1e-6
    )
    # the rare-token doc reads as higher cross-entropy (the filter signal)
    assert got[2].cross_entropy > got[1].cross_entropy


def test_dsir_weights_rank_target_like_docs_higher(spark):
    from micromegas_spark.operators.sampling import dsir_log_weights

    rows = [
        # target-distribution docs (flag 1): fruit vocabulary
        (1, "apple banana apple banana", 1),
        (2, "banana apple banana apple", 1),
        # source-only docs: unrelated vocabulary
        (3, "xylo qwerty zorb xylo", 0),
        (4, "qwerty zorb qwerty xylo", 0),
        # the probe: target-like text NOT flagged as target
        (5, "apple banana apple apple", 0),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string, tgt int")
    got = {
        r.doc_id: r.log_weight
        for r in dsir_log_weights(df, target=F.col("tgt") == 1).collect()
    }
    # target-like docs (flagged or probe) outrank source-only docs
    assert got[5] > got[3] and got[5] > got[4]
    assert got[1] > got[3]
    # every doc got one weight, features counted with multiplicity
    assert len(got) == 5


def test_bm25_ranking_and_length_normalization(spark):
    from micromegas_spark.operators.text import bm25_topk

    df = _docs(
        spark,
        [
            (1, "apple apple apple"),           # 3 hits, short doc
            (2, "apple pear plum grape melon"), # 1 hit, longer doc
            (3, "pear plum grape melon berry"), # 0 hits — must not appear
            (4, "apple apple pear plum grape melon berry fig date kiwi"),
        ],
    )
    out = bm25_topk(df, ["apple"], k=10).collect()
    ids = [r.doc_id for r in out]
    assert 3 not in ids and set(ids) == {1, 2, 4}
    scores = {r.doc_id: r.score for r in out}
    # more hits in a shorter doc wins; 2 hits in a long doc beats 1 hit
    # in a mid-length doc under b=0.75 length normalization
    assert scores[1] > scores[4] > scores[2]
    assert ids == sorted(ids, key=lambda i: (-scores[i], i))


def test_rrf_fuse_combines_and_orders(spark):
    from micromegas_spark.operators.similarity import rrf_fuse

    r1 = spark.createDataFrame([(1, 1), (2, 2), (3, 3)], "doc_id bigint, rank int")
    r2 = spark.createDataFrame([(2, 1), (4, 2)], "doc_id bigint, rank int")
    out = rrf_fuse([r1, r2]).collect()
    got = {r.doc_id: (r.n_lists, r.rrf_score) for r in out}
    # doc 2 is in both lists → highest fused score
    assert got[2][0] == 2 and out[0].doc_id == 2
    assert got[2][1] == pytest.approx(1 / 62 + 1 / 61, abs=1e-6)
    # single-list docs keep one contribution each; ordering is score desc
    assert got[1] == (1, pytest.approx(1 / 61, abs=1e-6))
    scores = [r.rrf_score for r in out]
    assert scores == sorted(scores, reverse=True)


def test_bpe_train_matches_reference_algorithm(spark):
    from collections import Counter

    from micromegas_spark.operators.text import bpe_train

    # Sennrich-style corpus: word frequencies drive the merge order
    vocab = {"low": 5, "lower": 2, "newest": 6, "widest": 3}
    text = " ".join(w for w, c in vocab.items() for _ in range(c))

    def ref_bpe(vocab, n):
        segs = {w: list(w) + ["</w>"] for w in vocab}
        out = []
        for _ in range(n):
            counts = Counter()
            for w, c in vocab.items():
                s = segs[w]
                for i in range(len(s) - 1):
                    counts[(s[i], s[i + 1])] += c
            if not counts:
                break
            # max count, ties by lexicographic smallest "left right"
            best = min(counts.items(), key=lambda kv: (-kv[1], f"{kv[0][0]} {kv[0][1]}"))
            (a, b), n_ = best
            out.append((a, b, n_))
            for w in vocab:
                s, i, ns = segs[w], 0, []
                while i < len(s):
                    if i + 1 < len(s) and s[i] == a and s[i + 1] == b:
                        ns.append(a + b)
                        i += 2
                    else:
                        ns.append(s[i])
                        i += 1
                segs[w] = ns
        return out

    expected = ref_bpe(vocab, 6)
    df = spark.createDataFrame([(1, text)], "doc_id bigint, text string")
    got = bpe_train(df, n_merges=6)
    assert got == expected
    # sanity on the classic example: ('e','s') with count 9 merges first
    assert got[0] == ("e", "s", 9)


def test_bpe_segment_applies_trained_merges(spark):
    from micromegas_spark.operators.text import bpe_segment, bpe_train

    vocab = {"low": 5, "lower": 2, "newest": 6, "widest": 3}
    text = " ".join(w for w, c in vocab.items() for _ in range(c))
    corpus = spark.createDataFrame([(1, text)], "doc_id bigint, text string")
    merges = bpe_train(corpus, n_merges=10)

    probe = spark.createDataFrame(
        [(1, "lowest low"), (2, "")], "doc_id bigint, text string"
    )
    got = {
        r.doc_id: r.pieces
        for r in probe.select(
            "doc_id", bpe_segment(F.col("text"), merges).alias("pieces")
        ).collect()
    }
    # training words segment to their fully-merged forms; 'lowest' reuses
    # the 'est</w>' and 'lo'/'low' merges learned from the corpus
    flat = got[1]
    assert "".join(flat).replace("</w>", "") == "lowestlow"
    assert got[2] == []
    # every piece is either a learned merge product or a single char+marker
    learned = {a + b for a, b, _ in merges}
    for p in flat:
        assert p in learned or len(p.replace("</w>", "")) <= 1


def test_nb_classify_separable_toy_corpus(spark):
    from micromegas_spark.operators.text import nb_classify

    rows = [
        (1, "goal match striker goal", "sport"),
        (2, "match referee goal pitch", "sport"),
        (3, "stock market shares fund", "finance"),
        (4, "market fund bond shares", "finance"),
        (5, "goal goal striker pitch", "sport"),
        (6, "bond stock market fund", "finance"),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string, source string")
    out = {r.doc_id: r for r in nb_classify(df).collect()}
    assert len(out) == 6
    # self-train on a separable corpus recovers every label
    for i, (_, _, y) in zip(range(1, 7), rows):
        assert out[i].pred == out[i].source == y
    # scores are finite log-probs (negative)
    assert all(r.score < 0 for r in out.values())


def test_bpe_batched_equals_sequential_on_disjoint_corpus(spark):
    """On a corpus whose top pairs are symbol-disjoint (distinct letter
    pairs with distinct frequencies), batched induction must equal the
    sequential schedule merge-for-merge, counts included."""
    from micromegas_spark.operators.text import bpe_train

    rows = [("abx " * 5 + "aby " * 4 + "cdx " * 3 + "cdy " * 2,)]
    df = spark.createDataFrame(rows, ["text"])
    # round-1 pair counts: (a,b)=9, (x,</w>)=8, (y,</w>)=6, (b,x)=5 ... —
    # the top-2 are symbol-disjoint and merging (a,b) does not change
    # (x,</w>)'s count, so the 2-at-once batch equals two sequential rounds
    seq = bpe_train(df, n_merges=2, merges_per_round=1)
    bat = bpe_train(df, n_merges=2, merges_per_round=2)
    assert seq == bat == [("a", "b", 9), ("x", "</w>", 8)]


def test_bpe_greedy_batch_filter_skips_conflicts(spark):
    """Within one batch, a candidate sharing a symbol with a KEPT
    higher-ranked candidate is skipped; later disjoint candidates are
    still kept (greedy, not conservative, selection)."""
    from micromegas_spark.operators.text import select_disjoint_merges

    ranked = [("t", "h", 10), ("h", "e", 9), ("e", "r", 8), ("x", "y", 7)]
    # (h,e) conflicts with kept (t,h); (e,r) only conflicts with the
    # REJECTED (h,e), so greedy keeps it; (x,y) disjoint -> kept
    assert select_disjoint_merges(ranked) == [
        ("t", "h", 10), ("e", "r", 8), ("x", "y", 7),
    ]


def test_perplexity_buckets_approx_path_is_a_monotone_tercile_partition(spark):
    """The bounded-memory cutoff path (approx_percentile returns a DATA
    value where exact percentile interpolates, so boundary docs may
    legitimately flip bucket) must still produce a monotone three-way
    partition agreeing with the exact path away from the cutoffs."""
    from micromegas_spark.operators.text import perplexity_buckets

    rows = [
        (i, "common shared tokens " * (1 + i % 5) + " ".join(f"rare{i}x{j}" for j in range(i % 9)))
        for i in range(60)
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    exact = {r.doc_id: r.bucket for r in perplexity_buckets(df).collect()}
    rows_a = perplexity_buckets(df, exact_cutoffs=False).collect()
    approx = {r.doc_id: r.bucket for r in rows_a}
    ce = {r.doc_id: r.cross_entropy for r in rows_a}
    assert set(exact.values()) == set(approx.values()) == {"head", "middle", "tail"}
    # monotone: every head ce <= every middle ce <= every tail ce
    for b_lo, b_hi in (("head", "middle"), ("middle", "tail")):
        lo = [ce[i] for i, b in approx.items() if b == b_lo]
        hi = [ce[i] for i, b in approx.items() if b == b_hi]
        assert max(lo) <= min(hi)
    # agreement away from the boundary: >=85% identical labels
    same = sum(exact[i] == approx[i] for i in exact)
    assert same >= 0.85 * len(exact), (same, len(exact))


def test_winnow_guarantee_and_density(spark):
    """Winnowing's core guarantee (Schleimer et al. 2003 §2): documents
    sharing a substring of length >= k+w-1 share at least one selected
    fingerprint; and density is far below full k-gram hashing."""
    from micromegas_spark.operators.dedup import winnow_fingerprints

    k, w = 16, 8
    shared = "x" * 0 + "the quick brown fox jumps over the lazy dog"  # 43 chars >= 23
    rows = [
        (1, "AAAA unique prefix one " + shared + " tail alpha"),
        (2, "totally different start " + shared + " other ending here"),
        (3, "no overlap with the others at all, separate content entirely"),
    ]
    df = spark.createDataFrame(rows, "doc_id INT, text STRING")
    out = {
        r["doc_id"]: set(r["fps"])
        for r in df.select(
            "doc_id", winnow_fingerprints(F.col("text"), k, w).alias("fps")
        ).collect()
    }
    assert out[1] & out[2], "shared 43-char substring must share a fingerprint"
    # density: selected fingerprints << number of k-grams
    n_grams = len(rows[0][1]) - k + 1
    assert len(out[1]) < n_grams / 2


def test_winnow_overlap_pairs_counts(spark):
    from micromegas_spark.operators.dedup import winnow_overlap_pairs

    core = "one two three four five six seven eight nine ten eleven twelve"
    rows = [
        (1, "intro " + core + " outro"),
        (2, "different " + core + " closing"),
        (3, "unrelated words entirely disjoint from everything else here now"),
    ]
    df = spark.createDataFrame(rows, "doc_id INT, text STRING")
    got = winnow_overlap_pairs(df, min_shared=1).collect()
    pairs = {(r["id_a"], r["id_b"]): r["n_shared"] for r in got}
    assert (1, 2) in pairs and pairs[(1, 2)] >= 1
    assert all(p == (1, 2) for p in pairs)


def test_tfidf_keywords_ranks_rare_terms(spark):
    from micromegas_spark.operators.text import tfidf_keywords

    rows = [
        (1, "common common common zebra zebra quagga"),
        (2, "common common words words words words"),
        (3, "common filler filler filler text text"),
    ]
    df = spark.createDataFrame(rows, "doc_id INT, text STRING")
    out = tfidf_keywords(df, top_k=2).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r["tok"])
    # 'zebra' (tf=2, df=1) must outrank 'common' (tf=3, df=3) in doc 1
    assert by_doc[1][0] == "zebra"
    assert len(by_doc[1]) == 2 and by_doc[2][0] == "words"
