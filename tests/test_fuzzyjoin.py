"""Tests for the edit-distance similarity join (operators/fuzzyjoin):
exhaustive brute-force comparison on an adversarial short-string corpus
(the PassJoin pigeonhole must find EVERY pair), the short-string
exclusion contract, and the degenerate-segment bucket cap.
"""

import itertools
import random

import pytest
from pyspark.sql import functions as F

from micromegas_spark.operators.fuzzyjoin import edit_distance_pairs


def _lev(a: str, b: str) -> int:
    m, n = len(a), len(b)
    d = list(range(n + 1))
    for i in range(1, m + 1):
        prev, d[0] = d[0], i
        for j in range(1, n + 1):
            cur = min(d[j] + 1, d[j - 1] + 1, prev + (a[i - 1] != b[j - 1]))
            prev, d[j] = d[j], cur
    return d[n]


def _corpus(n_random=200, n_mut=50, seed=0):
    rng = random.Random(seed)
    strs = []
    for i in range(n_random):
        strs.append((i, "".join(rng.choice("abcd") for _ in range(rng.randint(3, 12)))))
    for i in range(n_random, n_random + n_mut):
        base = strs[i - n_random][1]
        p = rng.randrange(len(base))
        strs.append((i, base[:p] + rng.choice("abcd") + base[p + 1 :]))
    return strs


@pytest.mark.parametrize("k", [1, 2])
def test_complete_vs_bruteforce(spark, k):
    strs = _corpus()
    df = spark.createDataFrame(strs, "id int, t string")
    got = {(r.id_a, r.id_b, r.dist) for r in edit_distance_pairs(df, "t", "id", k=k).collect()}
    want = {
        (min(ia, ib), max(ia, ib), _lev(ta, tb))
        for (ia, ta), (ib, tb) in itertools.combinations(strs, 2)
        if len(ta) >= k + 1 and len(tb) >= k + 1 and _lev(ta, tb) <= k
    }
    assert got == want


def test_short_strings_excluded(spark):
    df = spark.createDataFrame([(1, "ab"), (2, "ab"), (3, "abc"), (4, "abd")], "id int, t string")
    got = {(r.id_a, r.id_b) for r in edit_distance_pairs(df, "t", "id", k=2).collect()}
    # length < k+1 rows never appear, even as exact duplicates
    assert got == {(3, 4)}


def test_bucket_cap_drops_degenerate_segment(spark):
    # 50 identical strings: every segment bucket holds all 50 ids; a cap
    # below that drops ALL candidates (degenerate-corpus guard), while
    # the default cap finds the full clique
    rows = [(i, "aaaaaaaaaa") for i in range(50)]
    df = spark.createDataFrame(rows, "id int, t string")
    full = edit_distance_pairs(df, "t", "id", k=1).count()
    assert full == 50 * 49 // 2
    capped = edit_distance_pairs(df, "t", "id", k=1, max_bucket_size=10).count()
    assert capped == 0


def test_distance_values_exact(spark):
    rows = [(1, "kitten"), (2, "sitten"), (3, "sittin")]
    df = spark.createDataFrame(rows, "id int, t string")
    got = {(r.id_a, r.id_b): r.dist for r in edit_distance_pairs(df, "t", "id", k=2).collect()}
    assert got == {(1, 2): 1, (2, 3): 1, (1, 3): 2}
