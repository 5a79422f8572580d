"""Corpus vocabulary / document-frequency statistics.

The tokenizer-training side of an LLM data pipeline: BPE/unigram vocab
construction starts from exactly this corpus-wide (token, tf, df) table,
and IDF feeds retrieval-style quality weighting. Reference analog: the
archive-wide keyword lookup tables built from holdings
(/root/reference/gemProc2caom2/main_app.py:135-181).

Scale shape: one explode + one groupBy — the canonical wordcount
shuffle. tf uses map-side partial aggregation; df(token) is an exact
distinct-doc count, which Spark executes as a two-phase aggregate
((token, doc) pre-distinct, then count) — both key on the token, so a
hot token ("the") is the skew bound. At 10^12 docs the pre-distinct
first groupBy (token, doc) — a near-unique composite key that salts the
hot token across partitions — keeps that bounded; Catalyst plans
count(distinct) exactly this way (Expand + two-phase agg).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def vocabulary(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 1000,
) -> DataFrame:
    """Top-``k`` corpus vocabulary: (token, tf, df, idf_r6).

    Tokens are the whitespace tokens of the lowercased text (the same
    tokenization as functions.text.words / token_count_ws). ``tf`` is
    total occurrences, ``df`` the number of distinct documents
    containing the token, ``idf_r6`` = round(ln(N / df), 6) with N the
    number of documents that have at least one token. Deterministic
    order: tf desc, then token asc; ties at the k-boundary resolve by
    that order.
    """
    t = F.trim(F.lower(F.col(text_col)))
    base = df.where(F.col(text_col).isNotNull() & (t != ""))
    toks = base.select(F.col(id_col), F.explode(F.split(t, r"\s+")).alias("token"))
    # N from the PRE-explode frame, as a lazy broadcast scalar: distinct
    # over one thin id column (identical value — every doc passing the
    # filter contributes >= 1 token), cross-joined so composing this
    # operator stays a single lazy plan with no build-time action
    n_docs = base.select(
        F.count_distinct(id_col).cast("double").alias("_n_docs")
    )
    out = (
        toks.groupBy("token")
        .agg(
            F.count("*").alias("tf"),
            F.count_distinct(id_col).alias("df"),
        )
        .crossJoin(F.broadcast(n_docs))
        .select(
            "token",
            "tf",
            "df",
            F.round(F.log(F.col("_n_docs") / F.col("df")), 6).alias("idf_r6"),
        )
        .orderBy(F.desc("tf"), F.asc("token"))
        .limit(k)
    )
    return out


def doc_keywords(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
) -> DataFrame:
    """Top-``k`` TF-IDF keywords per document — the tagging/labeling
    step of a curation pipeline (and the classic retrieval weighting):
    token tf within the doc times ln(N/df) from the corpus, ranked per
    doc. Scores are rounded to 6 dp BEFORE ranking so the ordering is
    engine-stable (a 1-ulp ln() difference must not flip ranks); ties
    break by token ascending. Returns (id, token, tfidf_r6, rank).

    Scale shape: the exploded (doc, token) counts shuffle once on the
    composite key, join the thin per-token df frame (token-keyed — the
    hot-token skew bound, broadcast when the vocab is small), and the
    per-doc top-k window sorts only each doc's own distinct tokens.
    """
    t = F.trim(F.lower(F.col(text_col)))
    base = df.where(F.col(text_col).isNotNull() & (t != ""))
    toks = base.select(F.col(id_col), F.explode(F.split(t, r"\s+")).alias("token"))
    tf = toks.groupBy(id_col, "token").agg(F.count("*").alias("tf"))
    docfreq = toks.groupBy("token").agg(F.count_distinct(id_col).alias("df"))
    n_docs = base.select(
        F.count_distinct(id_col).cast("double").alias("_n_docs")
    )
    scored = (
        tf.join(docfreq, on="token")
        .crossJoin(F.broadcast(n_docs))
        .select(
            id_col,
            "token",
            F.round(
                F.col("tf") * F.log(F.col("_n_docs") / F.col("df")), 6
            ).alias("tfidf_r6"),
        )
    )
    from pyspark.sql import Window

    w = Window.partitionBy(id_col).orderBy(
        F.desc("tfidf_r6"), F.asc("token")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .withColumn("rank", F.col("rank").cast("bigint"))
    )


def inverted_index(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_df: int = 50,
    ngram: int = 1,
) -> DataFrame:
    """Term -> sorted posting list over the corpus, for terms with
    document frequency <= ``max_df`` — the retrieval/audit index built
    from the same whitespace tokenization as :func:`vocabulary`.
    ``ngram`` > 1 indexes space-joined n-token phrases instead of
    single tokens (a phrase index is the useful granularity when the
    unigram vocabulary is small relative to the corpus and every
    single token would blow the df cap).

    Output: (token, df BIGINT, postings STRING — comma-joined sorted
    doc ids). Postings are a joined string, not an array, so external
    verifiers compare byte-for-byte.

    Scale shape, deliberately TWO-PHASE: phase 1 computes df per token
    (map-side-combined groupBy over distinct (token, doc) pairs) and
    keeps only tokens under the cap; phase 2 collects postings ONLY
    for surviving tokens via a token-keyed join. Collecting first and
    filtering after would materialize the posting list of every
    stopword — 'the' at 10^12 docs is a single 10^12-element
    aggregation state on one reducer. The df cap is therefore a
    correctness-of-scale bound, not a tuning knob: hot tokens are
    excluded BEFORE any list state exists, so per-reducer state is
    bounded by max_df elements per token. Both shuffles hash on
    token, so AQE plans the join from co-partitioned exchanges. The
    term explode runs twice (df phase + collect phase) by the same
    two-scans-over-corpus-sized-cache trade mark_span_overlap and
    frequency_resample document.
    """
    t = F.trim(F.lower(F.col(text_col)))
    base = df.where(F.col(text_col).isNotNull() & (t != ""))
    if ngram <= 1:
        terms = F.explode(F.split(t, r"\s+"))
    else:
        # O(n) shifted-slice zip_with composition (the word_shingles
        # form): the previous transform(sequence(i), concat_ws(slice))
        # closed over the outer token array inside the lambda, so the
        # interpreted HOF re-evaluated the split PER INDEX — O(n^2)
        # per doc (the exact trap functions/text.word_shingles
        # documents). concat(a, ' ', b) chains produce the identical
        # space-joined phrase (split never yields null elements).
        toks = F.split(t, r"\s+")
        n = F.size(toks)
        m = F.greatest(n - (ngram - 1), F.lit(0))
        sh = F.slice(toks, 1, m)
        for i in range(1, ngram):
            sh = F.zip_with(
                sh,
                F.slice(toks, 1 + i, m),
                lambda a, b: F.concat(a, F.lit(" "), b),
            )
        terms = F.explode(
            F.when(n >= ngram, sh).otherwise(F.array().cast("array<string>"))
        )
    pairs = base.select(F.col(id_col), terms.alias("token")).distinct()
    dfreq = (
        pairs.groupBy("token")
        .agg(F.count(F.lit(1)).alias("df"))
        .where(F.col("df") <= max_df)
    )
    return (
        pairs.join(dfreq, on="token", how="inner")
        .groupBy("token", "df")
        .agg(
            F.array_join(
                F.transform(
                    F.sort_array(F.collect_list(F.col(id_col))),
                    lambda x: x.cast("string"),
                ),
                ",",
            ).alias("postings")
        )
    )
