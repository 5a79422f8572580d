"""Text -> hashed-TF embedding: the two execution paths (pure-Column
higher-order lambdas vs Arrow np.bincount) must be bit-identical, and
the vectors must compose with the similarity tier.

Mirrors the reference's fixture-pinned derived-value tests
(/root/reference/gemProc2caom2/tests/test_main_app.py:171-186) for the
F5 derived-score pattern applied to vectorization.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from gemproc2caom2_spark.functions.hashing import hex15_hash
from gemproc2caom2_spark.operators.embed import (
    l2_normalized_expr,
    with_text_embedding,
)

DOCS = [
    (0, "the quick brown fox jumps over the lazy dog"),
    (1, "the quick brown fox jumps over the lazy dog"),  # exact dup of 0
    (2, "The  Quick   brown fox leaps over the lazy dog"),  # near dup
    (3, "completely unrelated text about spark shuffles and parquet"),
    (4, ""),  # empty -> zero vector
    (5, None),  # null text -> null vector
]


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def _vecs(df, **kw):
    rows = with_text_embedding(df, dim=32, **kw).select("doc_id", "embedding").collect()
    return {r.doc_id: r.embedding for r in rows}


def test_udf_and_column_paths_identical(docs_df):
    a = _vecs(docs_df, use_udf=True)
    b = _vecs(docs_df, use_udf=False)
    assert a == b


def test_vector_semantics(spark, docs_df):
    v = _vecs(docs_df, use_udf=True)
    # exact duplicate text -> identical vector
    assert v[0] == v[1]
    # counts are exact term frequencies: total mass == word count
    assert sum(v[0]) == 9.0 and v[0].count(2.0) >= 1  # "the" x2
    # empty text -> all-zero vector of the right dim
    assert v[4] == [0.0] * 32
    # null text -> null vector
    assert v[5] is None
    # manual recompute of one doc via the same hex15 % dim rule
    hashed = (
        spark.createDataFrame([(w,) for w in DOCS[3][1].split()], "w string")
        .select((hex15_hash("w") % 32).alias("i"))
        .collect()
    )
    expect = [0.0] * 32
    for r in hashed:
        expect[r.i] += 1.0
    assert v[3] == expect


def test_near_dup_cosine_separates(docs_df):
    v = _vecs(docs_df, use_udf=True)

    def cos(a, b):
        dot = sum(x * y for x, y in zip(a, b))
        na, nb = math.sqrt(sum(x * x for x in a)), math.sqrt(sum(x * x for x in b))
        return dot / (na * nb)

    assert cos(v[0], v[2]) > 0.85  # near-dup pair scores high
    assert cos(v[0], v[3]) < 0.5  # unrelated pair scores low


def test_l2_normalized(spark, docs_df):
    out = (
        with_text_embedding(docs_df, dim=32)
        .select("doc_id", l2_normalized_expr("embedding").alias("u"))
        .collect()
    )
    by_id = {r.doc_id: r.u for r in out}
    nrm = math.sqrt(sum(x * x for x in by_id[0]))
    assert abs(nrm - 1.0) < 1e-12
    # zero vector and null text both normalize to null (no NaN/div-zero)
    assert by_id[4] is None and by_id[5] is None


def test_centered_vector_exact_integer(spark, docs_df):
    from gemproc2caom2_spark.operators.embed import with_centered_vector

    emb = with_text_embedding(
        docs_df.where(F.col("text").isNotNull()), dim=32
    )
    rows = with_centered_vector(emb, vec_col="embedding", dim=32).collect()
    vs = {r.doc_id: r.embedding for r in rows}
    cs = {r.doc_id: r.cvec for r in rows}
    n = len(rows)
    sums = [sum(vs[d][i] for d in vs) for i in range(32)]
    for d in vs:
        # exact definition: cvec = N*v - S, in int64
        assert cs[d] == [n * int(vs[d][i]) - int(sums[i]) for i in range(32)]
        assert all(isinstance(x, int) for x in cs[d])
    # per-dimension zero sum: centering removed the shared component
    assert all(sum(cs[d][i] for d in cs) == 0 for i in range(32))
    # sign-equivalent to v - mean for every dimension (N > 0 scale)
    for d in vs:
        for i in range(32):
            fm = vs[d][i] - sums[i] / n
            assert (cs[d][i] > 0) == (fm > 1e-12) or abs(fm) <= 1e-12
