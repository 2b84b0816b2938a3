"""Generate an sf1-scale test corpus by 10x replication of sf0.1.

The driver ships sf0.001/0.01/0.1 (TESTDATA.md); the judge asked for one
scale-factor step up (VERDICT r3 "Next round" #4) to expose quadratic
residue or skew stalls the sf0.1 numbers are too small to show. /root/
testdata is read-only, so the scaled corpus lands in a scratch dir
(default /tmp/sf1) and only the artifacts (SELFCHECK_sf1.log,
BENCH_sf1.json) are committed.

Replication preserves referential integrity and distributions: every
replica i offsets its keys by i * stride (stride = 10^ceil(log10(max+1))
so key spaces never collide) consistently across fact and dimension
tables — lineitem replica i joins orders/part/supplier replica i, so join
selectivities and group cardinalities scale linearly like real TPC-H sf
steps. region/nation stay fixed (they are fixed-size in TPC-H). Document
texts get a per-replica tail token so exact-dup structure does not
explode 10x (each original near-dup cluster stays a cluster; replicas do
not all collapse into one), mirroring how a bigger real corpus has more
clusters, not bigger ones. Timestamps/events keep their time range —
time-bucketed aggregations grow per-bucket rows, not bucket count, which
is the hard direction for group-by scaling.

Usage: python scripts/make_sf1.py [out_dir] [factor] [cluster_cap] [only]

`only` is an optional comma-separated table subset (e.g. `embeddings`)
for regenerating single tables of an existing corpus in place.

cluster_cap (round 9): at factor > ~100 the plain replication makes every
near-dup clone group `factor` members wide, so pair-output dedup queries
grow O(factor²) BY CORPUS CONSTRUCTION — at sf30 that is ~9x sf10's pair
space and ENOSPCs the shared scratch volume without telling us anything
about the operators (a 300-wide clone group is a property of this
replicator, not of bigger corpora; real corpora grow by adding clusters).
With cluster_cap=C (e.g. 100), document replicas are split into groups of
C; group g > 0 gets a deterministic per-group token salt
(token -> token||'~'||g, EVERY token), which (a) preserves every
within-group pairwise similarity EXACTLY (both docs of a pair are
salted identically, token-for-token — the per-group map is a bijection
on the vocabulary), (b) keeps doc length in tokens and the shingle-df
profile per group identical to the uncapped corpus, and (c) makes
cross-group shingle overlap exactly ZERO, so the capped inverted-index
candidate space grows exactly linearly in the number of groups. The
result: factor=300, cap=100 is exactly 3 disjoint isomorphic copies of
the factor=100 corpus — clone groups stay 100 wide, cluster COUNT grows
3x, pair outputs grow linearly, which is the scaling direction a real
3x-bigger corpus exhibits. Non-document tables are unaffected (their
replication is already linear).

Why every token and not a hash(token)%k subset: the dedup operators
shingle at n=3 (operators/dedup.py hashed_shingles), so salting 1/k of
tokens leaves (1-1/k)^3 of 3-gram shingles intact ACROSS groups — 42%
at k=4. Those survivors' document frequency multiplies by the group
count while staying under the df cap, and candidate generation is
quadratic in df, so the candidate space grows ~(groups^2 * 0.42 +
groups * 0.58)x — measured in round 9 as a scratch-disk blowup at
factor=300 (>70 GB draw vs ~56 GB for linear; the run was killed at
5 GB free). Full salting removes the cross-group term exactly.

Embeddings get the same treatment under cluster_cap, with a geometric
salt instead of a lexical one: group g's vectors have their DIMENSIONS
permuted by the stride map j -> (j * (2g+1)) mod D (a bijection for any
g because D=64 is a power of two and 2g+1 is odd; g=0 is the identity).
A shared permutation preserves every within-group dot product and norm
EXACTLY (so within-group cosine structure is bit-identical to the
uncapped corpus), while cross-group cosines become those of
independently scrambled coordinates — noise around zero, the organic
level a real corpus has between unrelated clusters. Labels are offset
per group so label-defined clusters stay geometrically coherent.
Measured effect (round 9, emb_dedup_clusters @ sf30 = 3 groups): exact
replicas gave 381 s (7.3x sf10's 52.5 s — the pair stage is quadratic
in clone-group width BY CONSTRUCTION); permuted groups restore linear
cluster-count growth.
"""

from __future__ import annotations

import os
import sys

import duckdb

SRC = "/root/testdata/sf0.1"


def stride_for(con, table: str, key: str) -> int:
    mx = con.sql(f"SELECT MAX({key}) FROM src_{table}").fetchone()[0]
    s = 1
    while s <= mx:
        s *= 10
    return s


def main(
    out_dir: str = "/tmp/sf1",
    factor: int = 10,
    cluster_cap: int = 0,
    only: list[str] | None = None,
) -> None:
    os.makedirs(out_dir, exist_ok=True)
    con = duckdb.connect()
    tables = [
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings",
    ]
    for t in tables:
        con.execute(
            f"CREATE VIEW src_{t} AS SELECT * FROM read_parquet('{SRC}/{t}.parquet')"
        )
    ko = stride_for(con, "orders", "o_orderkey")
    kc = stride_for(con, "customer", "c_custkey")
    kp = stride_for(con, "part", "p_partkey")
    ks = stride_for(con, "supplier", "s_suppkey")
    ke = stride_for(con, "events", "event_id")
    ku = stride_for(con, "events", "user_id")
    kd = stride_for(con, "documents", "doc_id")
    kv = stride_for(con, "embeddings", "vec_id")
    kl = stride_for(con, "embeddings", "label")
    emb_dim = con.sql("SELECT MAX(len(embedding)) FROM src_embeddings").fetchone()[0]
    # The stride permutation needs gcd(2g+1, D) = 1; every odd multiplier
    # is coprime with a power-of-two D, which the source corpus satisfies.
    assert emb_dim & (emb_dim - 1) == 0, f"embedding dim {emb_dim} not a power of 2"

    con.execute(f"CREATE TABLE reps AS SELECT UNNEST(RANGE({factor})) AS i")

    sel = {
        "region": "SELECT * FROM src_region",
        "nation": "SELECT * FROM src_nation",
        "customer": f"""
            SELECT c_custkey + i * {kc} AS c_custkey,
                   c_name || '#' || i AS c_name,
                   c_nationkey, c_acctbal, c_mktsegment
            FROM src_customer, reps""",
        "supplier": f"""
            SELECT s_suppkey + i * {ks} AS s_suppkey,
                   s_name || '#' || i AS s_name, s_nationkey, s_acctbal
            FROM src_supplier, reps""",
        "part": f"""
            SELECT p_partkey + i * {kp} AS p_partkey,
                   p_name || '#' || i AS p_name, p_brand, p_type, p_size,
                   p_retailprice
            FROM src_part, reps""",
        "orders": f"""
            SELECT o_orderkey + i * {ko} AS o_orderkey,
                   o_custkey + i * {kc} AS o_custkey,
                   o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
            FROM src_orders, reps""",
        "lineitem": f"""
            SELECT l_orderkey + i * {ko} AS l_orderkey,
                   l_partkey + i * {kp} AS l_partkey,
                   l_suppkey + i * {ks} AS l_suppkey,
                   l_linenumber, l_quantity, l_extendedprice, l_discount,
                   l_tax, l_returnflag, l_linestatus, l_shipdate
            FROM src_lineitem, reps""",
        "events": f"""
            SELECT event_id + i * {ke} AS event_id, ts,
                   user_id + i * {ku} AS user_id,
                   event_type, value, props
            FROM src_events, reps""",
        "documents": (
            f"""
            SELECT doc_id + i * {kd} AS doc_id,
                   CASE WHEN i = 0 THEN text
                        ELSE text || ' rep' || i END AS text,
                   lang, source,
                   n_chars + CASE WHEN i = 0 THEN 0
                                  ELSE 4 + LENGTH(CAST(i AS VARCHAR)) END AS n_chars
            FROM src_documents, reps"""
            if not cluster_cap
            else f"""
            WITH salted AS (
                SELECT doc_id + i * {kd} AS doc_id,
                       CASE WHEN i // {cluster_cap} = 0 THEN
                           CASE WHEN i = 0 THEN text
                                ELSE text || ' rep' || i END
                       ELSE array_to_string(list_transform(
                           string_split(text || ' rep' || i, ' '),
                           t -> t || '~' || (i // {cluster_cap})), ' ')
                       END AS text,
                       lang, source
                FROM src_documents, reps)
            SELECT doc_id, text, lang, source, LENGTH(text) AS n_chars
            FROM salted"""
        ),
        "embeddings": (
            f"""
            SELECT vec_id + i * {kv} AS vec_id, embedding, label
            FROM src_embeddings, reps"""
            if not cluster_cap
            else f"""
            SELECT vec_id + i * {kv} AS vec_id,
                   CASE WHEN i // {cluster_cap} = 0 THEN embedding
                   ELSE list_select(embedding, list_transform(
                        range({emb_dim}),
                        j -> ((j * (1 + 2 * (i // {cluster_cap}))) % {emb_dim}) + 1))
                   END AS embedding,
                   label + (i // {cluster_cap}) * {kl} AS label
            FROM src_embeddings, reps"""
        ),
    }
    for t in tables if only is None else [t for t in tables if t in only]:
        out = os.path.join(out_dir, f"{t}.parquet")
        con.execute(f"COPY ({sel[t]}) TO '{out}' (FORMAT PARQUET)")
        n = con.sql(f"SELECT COUNT(*) FROM read_parquet('{out}')").fetchone()[0]
        print(f"{t}: {n} rows -> {out}")


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1"
    factor = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    cap = int(sys.argv[3]) if len(sys.argv) > 3 else 0
    only = sys.argv[4].split(",") if len(sys.argv) > 4 else None
    main(out, factor, cap, only)
