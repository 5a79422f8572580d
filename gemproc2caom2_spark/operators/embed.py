"""Text -> embedding: deterministic feature-hashed term-frequency
vectors, the stage that lets the similarity/ANN tier (sim1-sim4, dd5)
compose from raw text end-to-end instead of requiring a pre-built
``embeddings`` table.

Vector definition (the classic hashing trick, Weinberger et al. 2009):
``vec[i] = count of words w with hex15(w) % dim == i`` over the
whitespace words of ``lower(text)``. Counts are exact integers, the
hash is the cross-engine hex15 (md5-derived), so the vector — and any
cosine computed from it — is bit-identical in Spark and an external SQL
oracle; the reference's derived-score pattern (F5,
/root/reference/gemProc2caom2/main_app.py:339-372) applied to
vectorization.

Two execution paths, identical outputs (pinned by pytest):

- Column-expression path: ``transform(sequence(0, dim-1), i ->
  size(filter(idxs, x -> x = i)))`` — pure JVM, but higher-order
  lambdas evaluate interpreted per element, so cost is O(dim * words)
  per doc. Right for small dims / oracle replication.
- Arrow path (the 100-TB hot path): the per-word hashing stays JVM-side
  (``transform(words, hex15 % dim)``); only the O(words) scatter-add
  crosses to numpy as one ``np.bincount`` per batch row. Same split as
  the bigram-LM trainer (functions/perplexity.py): hash on the JVM,
  count in vectorized numpy.

Scale shape: map-side only — no shuffle, no state; the embedding column
adds 8*dim bytes/doc downstream, so project it late (after keep/drop
gates) exactly as ``plans.pipeline.curate`` orders its stages.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, DoubleType

from gemproc2caom2_spark.functions.hashing import hex15_hash
from gemproc2caom2_spark.functions.text import words


def hashed_word_indices_expr(text: Column | str, dim: int) -> Column:
    """array<bigint> of per-word feature indices: hex15(word) % dim over
    whitespace words of lower(text). Duplicates kept (term frequency)."""
    t = F.col(text) if isinstance(text, str) else text
    return F.transform(words(F.lower(t)), lambda w: hex15_hash(w) % dim)


def hashed_tf_expr(text: Column | str, dim: int) -> Column:
    """array<double> hashed-TF vector, pure Column expressions.

    The null gate keeps parity with the Arrow path: a null index array
    (null text) yields a null VECTOR, not a vector of null counts."""
    idxs = hashed_word_indices_expr(text, dim)
    counts = F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda i: F.size(F.filter(idxs, lambda x: x == i.cast("bigint"))).cast(
            "double"
        ),
    )
    return F.when(idxs.isNotNull(), counts)


def make_hashed_tf_udf(dim: int):
    """Arrow scale path: array<bigint> indices in, array<double> counts
    out — one np.bincount per row, no per-word Python."""

    @F.pandas_udf(ArrayType(DoubleType()))
    def _tf(idxs: pd.Series) -> pd.Series:
        out = []
        for arr in idxs:
            if arr is None:
                out.append(None)
                continue
            out.append(
                np.bincount(
                    np.asarray(arr, dtype=np.int64), minlength=dim
                ).astype(np.float64)
            )
        return pd.Series(out)

    return _tf


def with_text_embedding(
    df: DataFrame,
    text_col: str = "text",
    out_col: str = "embedding",
    dim: int = 64,
    use_udf: bool = True,
) -> DataFrame:
    """Add the hashed-TF embedding column. Empty word lists produce a
    zero vector (callers filtering for similarity should drop rows with
    a zero norm); null text produces null."""
    if use_udf:
        vec = make_hashed_tf_udf(dim)(hashed_word_indices_expr(text_col, dim))
    else:
        vec = hashed_tf_expr(text_col, dim)
    return df.withColumn(out_col, vec)


def with_centered_vector(
    df: DataFrame,
    vec_col: str = "embedding",
    out_col: str = "cvec",
    dim: int = 64,
) -> DataFrame:
    """Add the EXACT-INTEGER centered vector ``N*v - S`` (N = row
    count, S = per-dimension sums): sign-equivalent to ``v - mean`` for
    every hyperplane (N > 0 scales, never flips, a dot product), but
    computed entirely in int64 so Spark and any SQL engine agree to the
    bit — a float mean could flip a near-zero plane sign between
    engines and silently change LSH candidate sets.

    Why center at all: TF-style vectors share a dominant direction
    (stopword mass), so sign(<w, v>) is nearly doc-independent and
    hyperplane buckets collapse toward one cell per table. Centering
    removes the shared component and restores sign entropy.

    Scale shape: one single-row partial aggregate (count + dim sums,
    map-side combined) broadcast back — the vocabulary()/n_docs
    pattern; overflow bound: N * max_count < 2^63, fine past 10^12
    docs of web text.
    """
    v = F.col(vec_col)
    stats = df.groupBy().agg(
        F.count("*").alias("_n"),
        *[
            F.sum(v[i]).cast("bigint").alias(f"_s{i}")
            for i in range(dim)
        ],
    )
    cvec = F.array(
        *[
            F.col("_n") * v[i].cast("bigint") - F.col(f"_s{i}")
            for i in range(dim)
        ]
    )
    return (
        df.crossJoin(F.broadcast(stats))
        .withColumn(out_col, cvec)
        .drop("_n", *[f"_s{i}" for i in range(dim)])
    )


def l2_normalized_expr(vec: Column | str) -> Column:
    """array<double> -> unit-norm array<double> (null if the norm is 0):
    the form cosine-threshold consumers expect when they pre-normalize."""
    v = F.col(vec) if isinstance(vec, str) else vec
    nrm = F.sqrt(F.aggregate(v, F.lit(0.0), lambda a, x: a + x * x))
    return F.when(nrm > 0, F.transform(v, lambda x: x / nrm))
