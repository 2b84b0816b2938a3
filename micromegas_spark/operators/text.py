"""Text analysis operators for large-scale training-data pipelines:
tokenization, token counting, quality scoring, language identification,
document fingerprinting, shingling.

All pure Column expressions (JVM-side, codegen) — the deterministic
definitions below are mirrored 1:1 in the DuckDB oracle SQL of
queries/llm.py, so both engines produce byte-identical results:

- tokens      : split(trim(text), '\\s+')  (no empty tokens on trimmed text)
- token hash  : first 8 hex chars of md5 → 32-bit unsigned int
- fingerprint : md5 of whitespace-collapsed lowercased text
- shingles    : distinct character k-grams of the raw text
"""

from __future__ import annotations

from micromegas_spark.flightsql.errors import InvalidArgument
from micromegas_spark.cachereg import track

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F

STOPWORDS = ["the", "a", "of", "and", "to", "in", "is", "it"]

# marker tokens per language for the n-gram/stopword language-ID heuristic;
# ties resolve in this order (first wins)
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "of", "and", "a", "is"],
    "de": ["der", "die", "und", "das", "ist"],
    "fr": ["le", "la", "et", "les", "est"],
    "es": ["el", "los", "y", "las", "es"],
    "zh": ["的", "了", "是"],
}


def tokens(text: Column) -> Column:
    """Whitespace tokenization; trimmed first so no empty tokens appear."""
    return F.split(F.trim(text), r"\s+")


def token_count(text: Column) -> Column:
    return F.size(tokens(text))


# BPE-style pre-tokenizer classes (GPT-2-like, simplified to an RE2-safe
# subset so the DuckDB oracle matches: letter runs / digit runs /
# punctuation runs — no lookahead, ASCII classes)
BPE_PRETOKEN_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]+"


def bpe_token_count(text: Column) -> Column:
    """Token count under a BPE-ish pre-tokenization (the unit LLM data
    budgets are measured in): splits letter runs, digit runs and
    punctuation runs as separate tokens, whitespace elided. A real BPE
    vocab only merges within these pre-tokens, so this upper-bounds and
    tracks BPE token counts closely."""
    return F.size(F.regexp_extract_all(text, F.lit(BPE_PRETOKEN_RE), 0))


def token_hash32(tok: Column) -> Column:
    """Deterministic 32-bit token hash: int(md5(token)[0:8], 16). Used by
    simhash and minhash so the oracle can recompute it exactly."""
    return F.conv(F.substring(F.md5(tok), 1, 8), 16, 10).cast("bigint")


def fingerprint(text: Column) -> Column:
    """Document fingerprint: md5 over the canonicalized text (lowercase,
    whitespace collapsed). The reference has no doc-level dedup — this is
    part of the training-data-pipeline surface."""
    return F.md5(F.regexp_replace(F.lower(F.trim(text)), r"\s+", " "))


def shingles(text: Column, k: int = 5) -> Column:
    """Distinct character k-grams."""
    n = F.greatest(F.length(text) - (k - 1), F.lit(1))
    return F.array_distinct(
        F.transform(F.sequence(F.lit(1), n), lambda i: F.substring(text, i, k))
    )


def _let(val: Column, body) -> Column:
    """Bind ``val`` once and pass the bound value to ``body``.

    Spark SQL has no let-expression, and a lambda body that indexes into an
    outer array EXPRESSION (``try_element_at(split(...), i)``) re-evaluates
    that expression for every element access — an O(tokens) split per gram
    access turned n-gram construction quadratic (measured 4x on the bench
    corpus). A single-element array + ``transform`` evaluates ``val`` once
    and the lambda variable is a bound VALUE."""
    return F.element_at(F.transform(F.array(val), body), 1)


def _ngram_array(text: Column, toks: Column, n: int) -> Column:
    """Word n-grams (with multiplicity) from a BOUND token-array value."""
    k = F.size(toks)
    grams = F.transform(
        F.sequence(F.lit(1), F.greatest(k - (n - 1), F.lit(1))),
        lambda i: F.concat_ws(" ", *[F.try_element_at(toks, i + j) for j in range(n)]),
    )
    return F.when(k >= n, grams).otherwise(F.array(F.trim(text)))


def word_shingles(text: Column, n: int = 3) -> Column:
    """Distinct word n-grams — the preferred MinHash/Jaccard input set.

    Char k-grams over a small vocabulary make *every* doc pair ~50% similar
    (all docs share most 5-char fragments), which floods LSH banding with
    false candidates; word n-grams key on n-token *sequences*, so unrelated
    docs sit near Jaccard 0 and true near-dups stay ≥0.8. Docs with fewer
    than n tokens use the whole trimmed text as their single shingle."""
    return F.array_distinct(
        _let(tokens(text), lambda tk: _ngram_array(text, tk, n))
    )


def word_ngrams(text: Column, n: int) -> Column:
    """NON-distinct word n-grams (repetition metrics need multiplicities —
    ``word_shingles`` deduplicates, which would hide exactly the signal the
    Gopher-style repetition filters measure). Docs with fewer than n tokens
    fall back to the whole trimmed text as their single gram."""
    return _let(tokens(text), lambda tk: _ngram_array(text, tk, n))


def stopword_ratio(text: Column, stopwords: list[str] | None = None) -> Column:
    toks = tokens(text)
    sw = stopwords or STOPWORDS
    hits = F.size(F.filter(toks, lambda t: t.isin(*sw)))
    return hits.cast("double") / F.size(toks).cast("double")


def avg_token_len(text: Column) -> Column:
    """Mean token length = non-whitespace chars / token count."""
    nonws = F.length(F.regexp_replace(F.trim(text), r"\s+", ""))
    return nonws.cast("double") / token_count(text).cast("double")


def quality_features(text: Column) -> dict[str, Column]:
    """Quality-scoring feature bundle (length / punctuation / stopword
    ratios) — the standard cheap pre-filters of LLM data pipelines."""
    length = F.length(text)
    punct = length - F.length(F.regexp_replace(text, r"[.,;:!?]", ""))
    return {
        "n_chars_measured": length.cast("bigint"),
        "n_tokens": token_count(text).cast("bigint"),
        "n_uniq_tokens": F.size(F.array_distinct(tokens(text))).cast("bigint"),
        "avg_token_len": avg_token_len(text),
        "stopword_ratio": stopword_ratio(text),
        "punct_ratio": punct.cast("double") / length.cast("double"),
    }


def lang_scores(text: Column) -> dict[str, Column]:
    """Marker-token occurrence counts per language over the token stream."""
    toks = tokens(text)

    def _count(markers: list[str]):
        # note: HOF lambdas must be unary — bind the marker list via closure
        return F.size(F.filter(toks, lambda t: t.isin(*markers))).cast("bigint")

    return {lang: _count(markers) for lang, markers in LANG_MARKERS.items()}


def lang_id(text: Column) -> Column:
    """Predicted language = argmax of marker scores via a deterministic
    CASE cascade — earlier language wins ties (mirrored 1:1 in SQL):

        CASE WHEN s_en >= greatest(s_de, s_fr, s_es, s_zh) THEN 'en'
             WHEN s_de >= greatest(s_fr, s_es, s_zh)       THEN 'de'
             ... ELSE 'zh' END
    """
    scores = lang_scores(text)
    langs = list(LANG_MARKERS.keys())
    expr = F.lit(langs[-1])
    for i in range(len(langs) - 2, -1, -1):
        rest = [scores[o] for o in langs[i + 1 :]]
        rest_max = rest[0] if len(rest) == 1 else F.greatest(*rest)
        expr = F.when(scores[langs[i]] >= rest_max, F.lit(langs[i])).otherwise(expr)
    return expr


def repetition_features(
    df, id_col: str = "doc_id", text_col: str = "text"
):
    """Gopher-style repetition metrics (Rae et al. 2021 §A1.1 use the same
    family of filters): per document,

    - ``top_token_share``   — occurrences of the most frequent token / all
      tokens (a doc that is one word repeated scores 1.0);
    - ``top_bigram_share``  — same for word bigrams;
    - ``dup_trigram_frac``  — fraction of word trigram *occurrences* that
      are repeats of an earlier trigram, ``(n - n_distinct) / n``.

    Shape at scale: ONE explode over a (n, gram) struct array and one
    partial-aggregated shuffle keyed on (doc, n, gram) — Spark's map-side
    combine collapses each document's gram multiset before the exchange, so
    shuffle volume is bounded by distinct grams, not text length. The
    per-n rollup and the 3-way pivot are tiny follow-on aggs on the same
    key prefix."""
    from micromegas_spark.operators.util import spread

    df = spread(df)
    col = F.col(text_col)

    def _tag(n: int):
        # NB: must be a 1-arg lambda — a `lambda g, n=n:` would be treated
        # by F.transform as an (element, index) callback and n would
        # silently become the array index
        return lambda g: F.struct(F.lit(n).alias("n"), g.alias("g"))

    # one outer _let: the token split happens ONCE per row and feeds all
    # three gram sizes (three word_ngrams calls would split three times)
    grams = _let(
        tokens(col),
        lambda tk: F.flatten(
            F.array(
                *[F.transform(_ngram_array(col, tk, n), _tag(n)) for n in (1, 2, 3)]
            )
        ),
    )
    exploded = df.select(F.col(id_col), F.explode(grams).alias("t")).select(
        id_col, F.col("t.n").alias("n"), F.col("t.g").alias("g")
    )

    def _if(n: int, col: Column) -> Column:
        return F.when(F.col("n") == n, col)

    # two exchanges total: (doc, n, gram) counting, then one conditional
    # rollup straight to the per-doc row (no per-(doc,n) stage, no pivot)
    wide = (
        exploded.groupBy(id_col, "n", "g")
        .agg(F.count("*").alias("c"))
        .groupBy(id_col)
        .agg(
            F.max(_if(1, F.col("c"))).alias("max1"),
            F.sum(_if(1, F.col("c"))).alias("ng1"),
            F.max(_if(2, F.col("c"))).alias("max2"),
            F.sum(_if(2, F.col("c"))).alias("ng2"),
            F.sum(_if(3, F.col("c"))).alias("ng3"),
            F.count(_if(3, F.lit(1))).alias("nd3"),
        )
    )
    d = lambda c: F.col(c).cast("double")  # noqa: E731
    return wide.select(
        id_col,
        (d("max1") / d("ng1")).alias("top_token_share"),
        (d("max2") / d("ng2")).alias("top_bigram_share"),
        ((d("ng3") - d("nd3")) / d("ng3")).alias("dup_trigram_frac"),
    )


def tf_idf_top_terms(
    df,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
):
    """Per-document top-k terms with tf-idf scores — the vocabulary /
    keyword-extraction pass of a training-data pipeline.

    Plan shape (all JVM-side): explode(tokens) → groupBy (doc, term) for
    tf (map-side combinable) → groupBy term for document frequency → join
    back on term → corpus size via a broadcast single-row aggregate
    (never a window over ()). The doc-frequency step is deliberately a
    groupBy + join rather than COUNT OVER (PARTITION BY term): stopword
    terms appear in nearly every document, and a term-partitioned window
    would pin each hot term's rows to ONE task with no mitigation,
    whereas the aggregate is map-side combinable and the join gets AQE
    skew-split at runtime.

    Ranking is by (tf DESC, term ASC) — integer-only, so the top-k cut is
    deterministic across engines even though the idf score itself is
    floating point (ln differs in the last ulp between libms; it is only
    REPORTED, rounded, never compared). idf = ln((N+1)/(df+1)) + 1
    (smoothed, sklearn-style)."""
    from pyspark.sql import Window

    toks = df.select(F.col(id_col), F.explode(tokens(F.col(text_col))).alias("tok"))
    tf = (
        toks.select(F.col(id_col), F.lower(F.col("tok")).alias("term"))
        .groupBy(id_col, "term")
        .agg(F.count("*").alias("tf"))
    )
    dfreq = tf.groupBy("term").agg(F.count("*").alias("doc_freq"))
    n_docs = df.select(F.count("*").alias("_n"))
    scored = (
        tf.join(dfreq, "term")
        .crossJoin(F.broadcast(n_docs))
        .select(
            F.col(id_col),
            "term",
            "tf",
            "doc_freq",
            F.round(
                F.col("tf")
                * (
                    F.log(
                        (F.col("_n") + 1).cast("double")
                        / (F.col("doc_freq") + 1).cast("double")
                    )
                    + F.lit(1.0)
                ),
                6,
            ).alias("tfidf"),
        )
    )
    w = Window.partitionBy(id_col).orderBy(F.col("tf").desc(), F.col("term").asc())
    return (
        scored.withColumn("_rk", F.row_number().over(w))
        .where(F.col("_rk") <= k)
        .drop("_rk")
    )


def chunk_spans(
    df,
    text_col: str = "text",
    id_col: str = "doc_id",
    chunk_tokens: int = 64,
    overlap: int = 16,
):
    """Context-window chunking: split each document's token stream into
    fixed-size chunks with overlap (the pre-tokenization pass that turns
    a corpus into training windows). Emits (id, chunk_idx, token_start,
    token_end) — positions only, so the output stays narrow and the text
    slice is reconstructed on demand.

    Pure JVM arithmetic: chunk count is integer math on token_count,
    chunk rows come from explode(sequence(...)) — no Python, no shuffle
    (a per-row Generate). chunk count = ceil((n - overlap) / stride),
    min 1, with stride = chunk_tokens - overlap."""
    if overlap >= chunk_tokens:
        raise InvalidArgument("overlap must be smaller than chunk_tokens")
    stride = chunk_tokens - overlap
    n = token_count(F.col(text_col)).cast("bigint")
    n_chunks = F.greatest(
        F.floor((n - overlap + stride - 1) / F.lit(stride)).cast("bigint"), F.lit(1)
    )
    out = df.select(
        F.col(id_col),
        n.alias("_n"),
        F.explode(F.sequence(F.lit(0), n_chunks - 1)).alias("chunk_idx"),
    )
    start = F.col("chunk_idx") * stride
    return out.select(
        F.col(id_col),
        F.col("chunk_idx").cast("bigint").alias("chunk_idx"),
        start.cast("bigint").alias("token_start"),
        F.least(start + chunk_tokens, F.col("_n")).cast("bigint").alias("token_end"),
    )


def sequence_packing(
    df,
    budget: int = 512,
    text_col: str = "text",
    id_col: str = "doc_id",
    part_col: str = "source",
):
    """Greedy first-fit-by-order sequence packing: documents are laid out
    in (part_col, id) order and assigned to the training sequence where
    their first token lands (seq boundary every ``budget`` tokens of
    cumulative length). The contiguous-fill approximation every large
    packing pipeline uses — exact bin packing is NP-hard and
    order-dependent packing is reproducible.

    One shuffle on ``part_col`` (the shard key — packing never crosses
    shards, which also keeps the window partitioned instead of global);
    the running sum is a frame-bounded window, deterministic via the id
    tie-break."""
    from pyspark.sql import Window

    n = token_count(F.col(text_col)).cast("bigint")
    w = (
        Window.partitionBy(part_col)
        .orderBy(F.col(id_col))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    toks = df.select(F.col(id_col), F.col(part_col), n.alias("n_tokens"))
    cum = toks.withColumn("_cum", F.sum("n_tokens").over(w))
    return cum.select(
        F.col(id_col),
        F.col(part_col),
        F.col("n_tokens"),
        F.floor((F.col("_cum") - F.col("n_tokens")) / F.lit(budget))
        .cast("bigint")
        .alias("seq_id"),
    )


def boilerplate_coverage(
    df: DataFrame,
    min_df: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 3,
) -> DataFrame:
    """Corpus-frequent n-gram coverage per document — the repeated-span
    signal behind cross-document boilerplate removal (headers, license
    blocks, templates): a shingle occurring in ≥ ``min_df`` documents is
    'corpus-frequent'; a document's coverage is the fraction of its
    distinct shingles that are corpus-frequent. Output:
    (id, n_shingles, n_frequent, coverage).

    Scale shape: one explode + one (shingle → doc-frequency) aggregation,
    then the frequent-shingle set joins back per doc. The frequent set is
    duplicate-density-bound (and hash-joinable on the shingle); per-doc
    re-aggregation shuffles on the doc id. No quadratic pair space — this
    is the linear-cost cousin of pairwise near-dup detection, which is
    why production pipelines run it corpus-wide."""
    from micromegas_spark.operators.util import spread as _spr

    df = _spr(df)
    from micromegas_spark.operators.dedup import hashed_shingles

    sh = df.select(
        F.col(id_col),
        F.explode(hashed_shingles(F.col(text_col), shingle_n)).alias("shingle"),
    )
    # shingles are distinct per doc by construction, so COUNT(*) per
    # shingle IS the document frequency
    freq = (
        sh.groupBy("shingle")
        .agg(F.count("*").alias("df"))
        .where(F.col("df") >= min_df)
        .select("shingle", F.lit(1).alias("_freq"))
    )
    return (
        sh.join(freq, "shingle", "left")
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_shingles"),
            F.sum(F.coalesce(F.col("_freq"), F.lit(0))).alias("n_frequent"),
        )
        .select(
            id_col,
            "n_shingles",
            "n_frequent",
            F.round(F.col("n_frequent") / F.col("n_shingles"), 6).alias("coverage"),
        )
    )


def token_entropy(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document Shannon entropy (log2) of the token distribution —
    the cheap lexical-diversity quality signal (low entropy ⇒ repetitive
    or template text; pairs with repetition_features for Gopher-style
    filtering). Output: (id, n_tokens, entropy).

    One explode + two aggregations, all map-side combinable."""
    from micromegas_spark.operators.util import spread as _spr

    df = _spr(df)
    tok = df.select(F.col(id_col), F.explode(tokens(F.col(text_col))).alias("tok"))
    counts = tok.groupBy(id_col, "tok").agg(F.count("*").alias("c"))
    return (
        counts.groupBy(id_col)
        .agg(
            F.sum("c").alias("n_tokens"),
            # H = log2(n) - (Σ c·log2 c)/n  — one pass, no p=c/n division
            # inside the sum, so the float op order is trivially mirrored
            # by the oracle
            F.round(
                F.log2(F.sum("c"))
                - F.sum(F.col("c") * F.log2("c")) / F.sum("c"),
                6,
            ).alias("entropy"),
        )
        .select(id_col, "n_tokens", "entropy")
    )


def unigram_logprob(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document cross-entropy under the corpus's own unigram language
    model — the CCNet-style perplexity-proxy quality filter (Wenzek et
    al. 2020 rank documents by LM perplexity; a unigram model over the
    corpus itself is the self-contained, engine-portable version). High
    cross-entropy ⇒ rare-token-heavy text (noise, encoding junk); low ⇒
    common-token boilerplate. Output: (id, n_tokens, cross_entropy) with

        logp(t) = ln((c(t) + 1) / (N + V))       (add-one smoothing)
        cross_entropy = -avg over token occurrences of logp(t)

    Scale shape: one explode feeds (a) the vocab count aggregate
    (map-side combinable; vocab is Zipf-bounded, millions of rows at
    100 TB — joinable by hash, broadcast when it fits) and (b) the
    scoring join back on the term; corpus totals (N, V) ride in as a
    broadcast single-row aggregate, never a window over (). Per-doc
    re-aggregation shuffles on the doc id."""
    from micromegas_spark.operators.util import spread as _spr

    df = _spr(df)
    toks = df.select(
        F.col(id_col), F.explode(tokens(F.col(text_col))).alias("tok")
    ).select(id_col, F.lower(F.col("tok")).alias("term"))
    freq = toks.groupBy("term").agg(F.count("*").alias("c"))
    totals = freq.agg(
        F.sum("c").cast("double").alias("_n"),
        F.count("*").cast("double").alias("_v"),
    )
    scored = (
        toks.join(freq, "term")
        .crossJoin(F.broadcast(totals))
        .select(
            id_col,
            F.log((F.col("c") + F.lit(1)).cast("double") / (F.col("_n") + F.col("_v"))).alias(
                "_logp"
            ),
        )
    )
    return scored.groupBy(id_col).agg(
        F.count("*").cast("bigint").alias("n_tokens"),
        F.round(-F.avg("_logp"), 6).alias("cross_entropy"),
    )


def bm25_topk(
    df: DataFrame,
    terms: list[str],
    k: int = 20,
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """BM25 keyword retrieval: top-``k`` documents for a bag of query
    ``terms`` (Robertson/Spärck Jones; the Lucene-style idf variant that
    stays positive):

        idf(t)      = ln(1 + (N − df(t) + 0.5) / (df(t) + 0.5))
        score(d)    = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1−b+b·len/avglen))

    Output: (id, n_hits, score) for the k best-scoring documents,
    deterministic via the (score DESC, id) tiebreak.

    Scale shape: the token explode is filtered to the query terms BEFORE
    any shuffle (a map-side isin over the literal list), so the (doc,
    term) tf aggregation only carries matching occurrences; document
    length stats come from a separate lengths projection joined back on
    the id; per-term df and the corpus stats (N, avglen) ride in as
    broadcast aggregates. Final ranking is TakeOrderedAndProject — no
    global sort."""
    # NOT spread, deliberately (r11 cross-tree A/B): widening the
    # single-split corpus scan measured WORSE here (bm25 1.20 -> 1.33 s,
    # hybrid_rrf 1.60 -> 1.84 s min-of-6) — the query-term isin filter
    # makes the explode cheap enough that the full-text repartition
    # exchange dominates, unlike the kmv/HOF map stages where the
    # per-row work is heavy. At 100 TB the scan has >= cores splits
    # natively and needs no help.
    lterms = [t.lower() for t in terms]
    toks = df.select(
        F.col(id_col), F.explode(tokens(F.col(text_col))).alias("tok")
    ).select(id_col, F.lower(F.col("tok")).alias("term"))
    hits = toks.where(F.col("term").isin(*lterms))
    tf = hits.groupBy(id_col, "term").agg(F.count("*").alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count("*").alias("df"))
    lens = df.select(F.col(id_col), token_count(F.col(text_col)).alias("dl"))
    stats = lens.agg(
        F.count("*").cast("double").alias("_n"),
        F.avg(F.col("dl").cast("double")).alias("_avgdl"),
    )
    scored = (
        tf.join(F.broadcast(dfreq), "term")
        .join(lens, id_col)
        .crossJoin(F.broadcast(stats))
        .select(
            id_col,
            "tf",
            (
                F.log(
                    F.lit(1.0)
                    + (F.col("_n") - F.col("df") + F.lit(0.5))
                    / (F.col("df") + F.lit(0.5))
                )
                * (F.col("tf") * F.lit(k1 + 1.0))
                / (
                    F.col("tf")
                    + F.lit(k1)
                    * (F.lit(1.0 - b) + F.lit(b) * F.col("dl") / F.col("_avgdl"))
                )
            ).alias("_s"),
        )
    )
    return (
        scored.groupBy(id_col)
        .agg(
            F.sum("tf").cast("bigint").alias("n_hits"),
            F.round(F.sum("_s"), 6).alias("score"),
        )
        .orderBy(F.col("score").desc(), id_col)
        .limit(k)
    )


def select_disjoint_merges(
    ranked: "list[tuple[str, str, int]]",
) -> "list[tuple[str, str, int]]":
    """Greedy non-overlap filter for batched BPE: walk the ranked window,
    keep a candidate iff it shares no symbol with an already-KEPT
    candidate. Applying a symbol-disjoint batch in one rewrite pass is
    order-independent, so the batch is well-defined; because the window
    size k is fixed at plan time, the DuckDB oracle unrolls the greedy
    chain into k kept-flag expressions (queries/llm._bpe_oracle) —
    engine-portable despite the sequential dependency."""
    kept: list[tuple[str, str, int]] = []
    for left, right, n in ranked:
        if not any(left in (a, b) or right in (a, b) for a, b, _ in kept):
            kept.append((left, right, n))
    return kept


def bpe_train(
    df: DataFrame,
    n_merges: int = 8,
    text_col: str = "text",
    merges_per_round: int = 1,
) -> "list[tuple[str, str, int]]":
    """Byte-pair-encoding merge training over a corpus (Sennrich et al.
    2016 — the vocabulary-induction step of an LLM data pipeline),
    distributed: returns the ordered merge list
    ``[(left_sym, right_sym, pair_count), ...]``.

    Classic word-internal BPE: every distinct word becomes a symbol
    sequence of its characters plus a ``</w>`` end marker; each round
    counts adjacent symbol pairs weighted by word frequency, merges the
    most frequent pair(s) (ties: lexicographic smallest pair —
    deterministic on any engine), and rewrites the sequences.

    ``merges_per_round`` batches the induction (the standard
    distributed-BPE optimization): each round takes the top-k pairs by
    (count desc, pair), keeps the symbol-disjoint subset
    (``select_disjoint_merges``), and applies them all in one rewrite
    pass — ceil(n_merges/k) rounds instead of one Spark job per merge,
    which is what makes a real 30k-merge vocabulary tenable (30k/k
    sequential jobs). k=1 reduces exactly to sequential Sennrich BPE.
    Counts are snapshots of the round's pair table, so batched output
    can differ from sequential where selected merges interact; on
    non-overlapping corpora they coincide (pinned in
    tests/test_text_pipeline.py).

    Symbol sequences are stored as a padded double-space string
    (``' a  b  </w> '``): a pair match ``' a  b '`` consumes one
    boundary space per side and its replacement ``' ab '`` restores it,
    so plain left-to-right literal ``replace`` implements the
    whole-symbol greedy merge with NO lookaround regex — the same
    replace() semantics exist in DuckDB, which is what lets the
    docs_bpe_merges oracle mirror every round as an unrolled
    MATERIALIZED CTE chain (queries/llm.py).

    Scale shape (the kmeans-style driver loop of declarative jobs): the
    corpus collapses ONCE to distinct (word, count) — vocabulary-bound,
    not token-bound, the same reduction every BPE trainer relies on —
    and each round is one explode + one weighted count + one top-k
    collect of ≤ k rows, then a map-side literal rewrite. Lineage is
    cut by a LAZY localCheckpoint each round (the plan would otherwise
    double per round); laziness folds the rewrite materialization into
    the next round's count job — one job per round."""
    import math as _math

    words = (
        df.select(F.explode(tokens(F.col(text_col))).alias("w"))
        .where(F.col("w") != "")
        .groupBy("w")
        .agg(F.count("*").alias("cnt"))
        .select(
            F.concat(
                F.lit(" "),
                F.concat_ws("  ", F.split(F.col("w"), "")),
                F.lit("  </w> "),
            ).alias("syms"),
            "cnt",
        )
        .localCheckpoint(eager=False)
    )
    merges: list[tuple[str, str, int]] = []
    cur = words
    rounds = _math.ceil(n_merges / merges_per_round)
    for _ in range(rounds):
        arr = F.split(F.trim(F.col("syms")), "  ")
        pairs = cur.select(
            "cnt",
            F.explode(
                F.zip_with(
                    F.slice(arr, 1, F.size(arr) - 1),
                    F.slice(arr, 2, F.size(arr) - 1),
                    lambda a, b: F.concat_ws(" ", a, b),
                )
            ).alias("pair"),
        )
        top = (
            pairs.groupBy("pair")
            .agg(F.sum("cnt").alias("n"))
            .orderBy(F.col("n").desc(), F.col("pair"))
            .limit(merges_per_round)
            .collect()
        )
        if not top:
            break
        ranked = [
            (r["pair"].split(" ")[0], r["pair"].split(" ")[1], int(r["n"]))
            for r in top
        ]
        selected = select_disjoint_merges(ranked)
        merges.extend(selected)
        col = F.col("syms")
        for left, right, _n in selected:
            col = F.replace(
                col, F.lit(f" {left}  {right} "), F.lit(f" {left}{right} ")
            )
        cur = cur.select(col.alias("syms"), "cnt").localCheckpoint(eager=False)
    # the last round can overshoot when n_merges % merges_per_round != 0:
    # honor the requested vocabulary size (collision-dropped candidates may
    # still leave the list short — rounds are fixed so the schedule stays
    # deterministic and oracle-mirrorable)
    return merges[:n_merges]


def bpe_segment(
    text: Column, merges: "list[tuple[str, str, int]]"
) -> Column:
    """Apply trained BPE merges (``bpe_train`` output) to a text column →
    array of sub-word pieces — the tokenize-the-corpus step that actually
    runs at 100 TB once the vocabulary exists.

    The merge table rides to executors inside the UDF closure (it is
    vocabulary-sized — KBs to low MBs); encoding is the classic
    rank-greedy loop per word, vectorized over Arrow batches with a
    pandas UDF (the per-word merge loop is inherently imperative — this
    is the sanctioned Python crossing, same class as the call-tree stack
    machine)."""
    ranks = {(a, b): i for i, (a, b, _n) in enumerate(merges)}

    def encode_word(word: str) -> list[str]:
        syms = list(word) + ["</w>"]
        while len(syms) >= 2:
            best_i, best_r = -1, None
            for i in range(len(syms) - 1):
                r = ranks.get((syms[i], syms[i + 1]))
                if r is not None and (best_r is None or r < best_r):
                    best_i, best_r = i, r
            if best_r is None:
                break
            # merge ALL occurrences of the best pair, left to right
            a, b = syms[best_i], syms[best_i + 1]
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            syms = out
        return syms

    @F.pandas_udf("array<string>")
    def seg(col: pd.Series) -> pd.Series:
        return col.map(
            lambda t: [
                p
                for w in (t or "").split()
                for p in encode_word(w)
            ]
        )

    return seg(text)


def _nb_materialize(df):
    """Eager materialization point for nb_classify's model relations.
    localCheckpoint, NOT persist: an interleaved A/B (r12) measured the
    stat-preserving persist+count variant 1.52x SLOWER overall (two extra
    blocking jobs + columnar cache reads for four row-oriented consumers
    outweigh the planner's better join-side statistics)."""
    return df.localCheckpoint(eager=True)


def nb_classify(
    df: DataFrame,
    label_col: str = "source",
    text_col: str = "text",
    id_col: str = "doc_id",
    alpha: float = 1.0,
) -> DataFrame:
    """Multinomial Naive Bayes document classifier, trained and applied
    in one declarative plan — the domain/quality classifier stage of LLM
    data pipelines (fastText-style supervised filtering, linear-model
    flavor; e.g. the GPT-3/CCNet quality classifiers), here with the
    closed-form generative model so training is pure aggregation:

        prior(c)   = ln(docs_c / N_docs)
        loglik(t|c)= ln((count(t,c) + alpha) / (tokens_c + alpha * V))
        score(d,c) = prior(c) + sum_t tf(d,t) * loglik(t|c)
        pred(d)    = argmax_c score(d,c)   (ties: smallest label)

    Output: (id, label, pred, score) per document — actual label kept so
    the self-train confusion is one groupBy away.

    Scale shape — SPARSE scoring, no vocab x classes densification: an
    absent (term, class) pair contributes the per-class constant
    base(c) = ln(alpha / (tokens_c + alpha*V)), so

        score(d,c) = prior(c) + len_d * base(c)
                     + sum_{(t,c) observed} tf(d,t) * ln((count(t,c)+alpha)/alpha)

    (the adjusted weight ln((ctc+alpha)/alpha) is what remains after
    factoring base(c) out of loglik). One token explode feeds the
    (term, class) count aggregate and the per-doc tf aggregate — both
    map-side combinable; the scoring join then carries ONLY observed
    (term, class) stats (Zipf-bounded model rows, broadcast when small,
    hash-shuffle on the term otherwise) instead of |V| x |C| dense rows.
    Per-class scalars (prior, base) ride as one broadcast table; doc
    length is a map-side expression. The argmax is a per-id window over
    |classes| rows. Unseen-at-train terms (train/apply splits) fall into
    the same smoothing mass via the length term."""
    from micromegas_spark.operators.util import spread as _spr

    df = _spr(df)
    from pyspark.sql import Window

    lbl = F.col(label_col)
    docs = df.select(F.col(id_col), lbl.alias("_y"), F.col(text_col))
    toks = docs.select(
        F.col(id_col), "_y", F.explode(tokens(F.col(text_col))).alias("tok")
    ).select(id_col, "_y", F.lower(F.col("tok")).alias("term"))

    # ONE tokenize/explode pass: the (doc, term) frequency relation is the
    # pipeline's natural materialization point (each doc has one class, so
    # the class rides along), and every model table derives from it by
    # re-aggregation — without this the corpus is tokenized and exploded
    # once per consumer (exchange reuse across differently-projected
    # subtrees is not guaranteed; measured 3 scans).
    # CAVEAT (ADVICE r11 #3): localCheckpoint blocks are executor-local and
    # non-reliable — an executor loss makes the query fail unrecoverably
    # (same trade pagerank documents). Fine for a per-query driver; a
    # production 100 TB run should set a reliable checkpoint dir and use
    # checkpoint()/persist instead. Applies to every eager localCheckpoint
    # in this module (nb_classify g/tc, tfidf_keywords tf, bigram bi).
    # EAGER: the model tables below reach g through broadcast-exchange
    # subqueries, which Spark launches on concurrent driver threads — with
    # a lazy checkpoint they race its first materialization and each
    # recomputes the full tokenize/explode/aggregate lineage (measured:
    # four identical 49-task jobs at ~0.65 s each in one run). Blocking
    # once here makes every consumer read the materialized blocks.
    g = _nb_materialize(
        toks.groupBy(id_col, "_y", "term").agg(F.count("*").alias("tf"))
    )
    tf = g.select(id_col, "term", "tf")
    # the model table: (term, class) occurrence counts — vocab-bound
    # (Zipf), not corpus-bound; aggregated from the materialized g.
    # EAGER too: ctot, the scalars' distinct-term count and the scoring
    # join all consume tc, and each reached it through its own broadcast
    # subquery thread — with no checkpoint the (read g → re-aggregate)
    # lineage ran once PER consumer (measured: four identical 15-task
    # ~0.4 s job pairs per run). The materialized tc is the model itself,
    # vocab x classes rows.
    tc = _nb_materialize(g.groupBy("term", "_y").agg(F.sum("tf").alias("ctc")))
    classes = docs.groupBy("_y").agg(F.count("*").alias("n_docs"))
    ctot = tc.groupBy("_y").agg(F.sum("ctc").alias("t_c"))
    scalars = tc.select("term").distinct().agg(
        F.count("*").cast("double").alias("_v")
    ).crossJoin(docs.agg(F.count("*").cast("double").alias("_nd")))

    # per-class scalar table: prior + the absent-pair base weight
    stats = (
        classes.join(ctot, "_y")
        .crossJoin(F.broadcast(scalars))
        .select(
            "_y",
            F.log(F.col("n_docs").cast("double") / F.col("_nd")).alias("_lp"),
            F.log(
                F.lit(alpha) / (F.col("t_c") + F.lit(alpha) * F.col("_v"))
            ).alias("_base"),
        )
    )

    # observed-pair contributions only: tf ⨝ tc on the term.
    # EXPLICIT broadcast of the model side (r12): the checkpointed inputs
    # carry no size statistics, and the planner assigned the 155-row model
    # relation as the PROBE side at its pinned 1-partition checkpoint
    # width — the whole scoring join + partial aggregate ran as ONE
    # 970 ms task (SQL-tab node metrics at sf0.1; job profile showed the
    # recurring 1.2-1.6 s single-task job). Shipping the model to the data
    # is the standard classifier-scoring shape; tc is vocabulary-bounded
    # (Zipf), x |classes| — far under the broadcast cap for any pruned
    # production vocabulary. With the hint, tf probes at checkpoint width
    # and the partial aggregate is map-side parallel (83-task job, no
    # single-task stage).
    partial = (
        tf.join(
            F.broadcast(
                tc.select(
                    "term", "_y",
                    F.log((F.col("ctc") + F.lit(alpha)) / F.lit(alpha)).alias("_w"),
                )
            ),
            "term",
        )
        .groupBy(id_col, "_y")
        .agg(F.sum(F.col("tf") * F.col("_w")).alias("_s"))
    )

    # doc length = sum(tf) over the materialized (doc, term) relation —
    # NOT a second token_count() pass, which would re-tokenize the whole
    # corpus text a second time (guide §1.2: don't recompute what a prior
    # pass already produced). Docs whose text tokenizes to [] have no g
    # rows, so a left join + 0.0 default keeps them scored (lp + 0*base),
    # identical to token_count's 0.
    lens = g.groupBy(id_col).agg(F.sum("tf").cast("double").alias("_dl"))
    scored = (
        docs.select(F.col(id_col))
        .join(lens, [id_col], "left")
        .select(F.col(id_col), F.coalesce(F.col("_dl"), F.lit(0.0)).alias("_dl"))
        .crossJoin(F.broadcast(stats))
        .join(partial, [id_col, "_y"], "left")
        .select(
            id_col,
            "_y",
            (
                F.col("_lp")
                + F.col("_dl").cast("double") * F.col("_base")
                + F.coalesce(F.col("_s"), F.lit(0.0))
            ).alias("_score"),
        )
    )
    w = Window.partitionBy(id_col).orderBy(F.col("_score").desc(), F.col("_y"))
    best = scored.withColumn("_rn", F.row_number().over(w)).where(F.col("_rn") == 1)
    return (
        docs.select(id_col, F.col("_y").alias(label_col))
        .join(best.select(id_col, F.col("_y").alias("pred"), "_score"), id_col)
        .select(
            id_col,
            label_col,
            "pred",
            F.round("_score", 6).alias("score"),
        )
    )


def perplexity_buckets(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    exact_cutoffs: bool = True,
) -> DataFrame:
    """CCNet-style perplexity bucketing (Wenzek et al. 2020 §4.3): score
    every document with the corpus-unigram cross-entropy
    (``unigram_logprob``), cut the distribution at its terciles, and
    label head / middle / tail — the partition CCNet uses to keep the
    head (clean), sample the middle, and drop the tail of a crawl.

    Scale shape: tercile CUTOFFS come from one exact-percentile
    aggregate over the (already per-doc) score relation and ride in as a
    broadcast single-row relation; labeling is a map-side CASE — no
    global window/NTILE (a rank over the corpus would serialize on one
    partition). At 100 TB the only change is estimating the cutoffs with
    approx_percentile over a sample, exactly like CCNet trains its
    bucketing on a corpus sample. Cutoffs and scores are both rounded to
    6 decimals so threshold comparisons are engine-portable
    (DuckDB quantile_cont mirrors Spark's interpolated percentile).

    The scored relation is persisted: the cutoff aggregate and the
    labeling scan are two independent consumers in one plan, and without
    the persist the whole unigram-LM subtree (tokenize + corpus freq
    join + per-doc agg) would execute twice."""
    from pyspark import StorageLevel

    ce_cached = track(
        unigram_logprob(df, text_col, id_col).persist(StorageLevel.MEMORY_AND_DISK)
    )
    # (r11 A/B: an eager count here — the nb_classify race pattern —
    # measured FLAT-to-slightly-worse interleaved; the two racing
    # consumers mostly block on the same in-flight cache blocks rather
    # than recompute, so the extra materialization job buys nothing.)
    # post-cache coalesce to core width (see simhash_near_duplicates): the
    # per-doc score agg keeps the scale shuffle partitioning through the
    # persist, so the cutoff aggregate and the labeling scan each launched
    # one task per shuffle partition (measured 291-task jobs at bench
    # scale); shuffle-free block merge for the consumers only.
    ce = ce_cached.coalesce(df.sparkSession.sparkContext.defaultParallelism)
    # exact percentile buffers values per partition — right for the
    # oracle-checked path at test scale; at 100 TB pass
    # exact_cutoffs=False for the sketch-based estimate (bounded memory,
    # same bucketing semantics), as CCNet itself estimates cutoffs from a
    # sample
    pfn = "percentile" if exact_cutoffs else "approx_percentile"
    # ONE aggregate with an array of percentages: both cutoffs share one
    # value buffer (exact) / one sketch (approx) instead of two
    cuts = ce.agg(
        F.expr(f"{pfn}(cross_entropy, array(1.0D/3, 2.0D/3))").alias("_cs")
    ).select(
        F.round(F.element_at("_cs", 1), 6).alias("_c1"),
        F.round(F.element_at("_cs", 2), 6).alias("_c2"),
    )
    return ce.crossJoin(F.broadcast(cuts)).select(
        F.col(id_col),
        "cross_entropy",
        F.when(F.col("cross_entropy") <= F.col("_c1"), F.lit("head"))
        .when(F.col("cross_entropy") <= F.col("_c2"), F.lit("middle"))
        .otherwise(F.lit("tail"))
        .alias("bucket"),
    )


def tfidf_keywords(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    top_k: int = 3,
) -> DataFrame:
    """Per-document keyword extraction by smoothed tf-idf:
    score = tf · (ln((N+1)/(df+1)) + 1), top_k terms per document
    (ties broken by token asc). Terms are lowercase [a-z0-9]+ runs —
    engine-portable, mirrored 1:1 by the DuckDB oracle.

    Scale shape: tf is one (doc, tok) groupBy; document frequency is a
    second aggregation over the *already-distinct* (doc, tok) pairs
    (count, not countDistinct — no Expand); N joins in as a broadcast
    1-row aggregate rather than a driver-side count, so the whole plan
    stays one declarative job. The per-doc top-k is a row_number window
    partitioned by doc_id — Spark plans a WindowGroupLimit, pushing the
    rank filter below the final sort."""
    from pyspark.sql import Window

    terms = df.select(
        F.col(id_col),
        F.explode(
            F.regexp_extract_all(F.lower(F.col(text_col)), F.lit("[a-z0-9]+"), 0)
        ).alias("tok"),
    )
    tf = terms.groupBy(id_col, "tok").agg(F.count("*").alias("tf"))
    # EAGER materialization: doc_freq reaches tf through a broadcast
    # subquery on its own driver thread and the scoring join is the other
    # consumer — with NO cache both re-ran the whole tokenize+explode+agg
    # (measured: two identical 0.45 s jobs per docs_tfidf_keywords run,
    # guide §1.2). The (doc, tok, tf) relation is the aggregated, Zipf-
    # bounded materialization point (the nb_classify pattern); rows are
    # unchanged so scores and the oracle hash are bit-identical.
    tf = tf.localCheckpoint(eager=True)
    doc_freq = tf.groupBy("tok").agg(F.count("*").alias("df_t"))
    n_total = df.agg(F.count("*").alias("n_total"))
    win = Window.partitionBy(id_col).orderBy(F.desc("score"), F.asc("tok"))
    return (
        tf.join(doc_freq, "tok")
        .crossJoin(F.broadcast(n_total))
        .withColumn(
            "score",
            F.round(
                F.col("tf")
                * (
                    F.log((F.col("n_total") + F.lit(1.0)) / (F.col("df_t") + F.lit(1.0)))
                    + F.lit(1.0)
                ),
                6,
            ),
        )
        .withColumn("rk", F.row_number().over(win))
        .where(F.col("rk") <= top_k)
        .select(id_col, "tok", "score", F.col("rk").cast("bigint").alias("rk"))
    )


def bigram_logprob(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document cross-entropy under the corpus's own add-one BIGRAM
    language model — one order up from unigram_logprob, closer to the
    n-gram LM CCNet actually ranks with (Wenzek et al. 2020 use a 5-gram
    KenLM; conditioning on one predecessor already separates fluent text
    from shuffled-token junk that unigram statistics cannot see):

        logp(w2|w1) = ln((c(w1 w2) + 1) / (c1(w1) + V))
        cross_entropy = -avg over bigram occurrences

    where c1 counts w1's occurrences AS A HISTORY (bigrams starting with
    w1) and V is the unigram vocabulary size. Docs with fewer than 2
    tokens have no bigrams and drop out (mirrored by the oracle).

    Scale shape: identical to unigram_logprob — one bigram explode feeds
    the two count aggregates and the scoring joins (hash joins on the
    Zipf-bounded bigram/history vocabularies), V rides in as a broadcast
    1-row aggregate, per-doc re-aggregation shuffles on the doc id."""
    from micromegas_spark.operators.util import spread as _spr

    df = _spr(df)
    low = F.transform(tokens(F.col(text_col)), lambda t: F.lower(t))
    bi = (
        df.select(
            F.col(id_col),
            F.explode(
                _let(
                    low,
                    lambda tk: F.when(
                        F.size(tk) >= 2,
                        F.transform(
                            F.sequence(F.lit(1), F.size(tk) - 1),
                            lambda i: F.struct(
                                F.element_at(tk, i).alias("w1"),
                                F.concat_ws(
                                    " ", F.element_at(tk, i), F.element_at(tk, i + 1)
                                ).alias("bg"),
                            ),
                        ),
                    ).otherwise(F.array()),
                )
            ).alias("s"),
        )
        .select(id_col, "s.w1", "s.bg")
    )
    # EAGER materialization of the bigram explode: freq2, freq1 and the
    # scoring join all reach `bi`, and the model-table branches are
    # evaluated as concurrent broadcast/shuffle stages that each re-ran
    # the whole tokenize+explode lineage (measured on docs_bigram_logprob:
    # four escalating 0.2-0.75 s corpus jobs in one run — the nb_classify
    # race, guide §1.2). One checkpoint; every consumer reads the blocks.
    # Rows are unchanged, so the scoring/aggregation results (and the
    # oracle hash) are bit-identical.
    bi = bi.localCheckpoint(eager=True)
    freq2 = bi.groupBy("bg").agg(F.count("*").alias("c2"))
    freq1 = bi.groupBy("w1").agg(F.count("*").alias("c1"))
    vocab = (
        df.select(F.explode(tokens(F.col(text_col))).alias("t"))
        .select(F.lower(F.col("t")).alias("t"))
        .agg(F.countDistinct("t").cast("double").alias("_v"))
    )
    scored = (
        bi.join(freq2, "bg")
        .join(freq1, "w1")
        .crossJoin(F.broadcast(vocab))
        .select(
            id_col,
            F.log(
                (F.col("c2") + F.lit(1)).cast("double") / (F.col("c1") + F.col("_v"))
            ).alias("_lp"),
        )
    )
    return scored.groupBy(id_col).agg(
        F.count("*").cast("bigint").alias("n_bigrams"),
        F.round(-F.avg("_lp"), 6).alias("cross_entropy"),
    )


def sequence_pack_bins(
    docs,
    window_tokens: int,
    group_col: str = "source",
    order_col: str = "doc_id",
    text_col: str = "text",
):
    """Training-sequence packing accounting (concat-and-chunk): documents
    are concatenated in a deterministic order within each group and the
    token stream is cut into fixed ``window_tokens`` windows — the standard
    way LLM pipelines pack variable-length documents into fixed context
    windows. Returns per-(group, seq_id) packing stats: how many documents
    the window touches, how many of those straddle a window boundary, the
    exact token count, and the fill ratio (1.0 for every window but each
    group's last).

    Scale shape: ONE window shuffle per group key for the running token
    sum, a map-side ``sequence`` explode bounded by each doc's own window
    span (a doc of n tokens lands in at most n/W + 1 windows, so total
    exploded rows ≈ total_tokens / W + n_docs), and one final aggregation.
    No pair space, no driver state — linear at any corpus size; group
    skew is bounded by the per-source token mass, and the running sum is
    the only order-sensitive step."""
    from pyspark.sql import Window

    w = Window.partitionBy(group_col).orderBy(order_col)
    W = int(window_tokens)
    d = (
        docs.where(F.length(F.trim(F.col(text_col))) > 0)
        .select(
            F.col(group_col),
            F.col(order_col),
            token_count(F.col(text_col)).cast("bigint").alias("n"),
        )
        .where(F.col("n") > 0)
    )
    c = d.withColumn("cum_end", F.sum("n").over(w)).withColumn(
        "cum_before", F.col("cum_end") - F.col("n")
    )
    # integer `div`, not float `/`: double rounding near 2^53 cumulative
    # tokens (or a non-power-of-two W) can land a boundary token in the
    # wrong window; the oracle's `//` is exact at any scale
    b = c.withColumn("b0", F.expr(f"cum_before div {W}")).withColumn(
        "b1", F.expr(f"(cum_end - 1) div {W}")
    )
    e = b.select(
        group_col,
        "cum_before",
        "cum_end",
        "b0",
        "b1",
        F.explode(F.sequence("b0", "b1")).alias("seq_id"),
    )
    lo = F.col("seq_id") * W
    hi = (F.col("seq_id") + 1) * W
    tokens_in = F.least(F.col("cum_end"), hi) - F.greatest(F.col("cum_before"), lo)
    return (
        e.withColumn("_tok", tokens_in)
        .groupBy(group_col, "seq_id")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum((F.col("b1") > F.col("b0")).cast("bigint"))
            .cast("bigint")
            .alias("n_split_docs"),
            F.sum("_tok").cast("bigint").alias("n_tokens"),
            (F.sum("_tok") / F.lit(float(W))).alias("fill_ratio"),
        )
    )
