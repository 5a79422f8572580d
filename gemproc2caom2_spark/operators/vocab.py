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
