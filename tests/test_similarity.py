"""Similarity-search tests: exact top-k sanity vs a numpy oracle, and
LSH-ANN recall against the exact results."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from gemproc2caom2_spark.operators.similarity import brute_force_topk, lsh_ann_topk


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def test_brute_force_matches_numpy(spark, emb):
    rows = emb.collect()
    vecs = {r.vec_id: np.array(r.embedding, dtype=np.float64) for r in rows}
    q = emb.where(F.col("vec_id") == 0)
    out = brute_force_topk(emb, q, k=5).collect()
    got = [(r.vec_id, r.cosine) for r in sorted(out, key=lambda r: r.rank)]

    qv = vecs[0]
    sims = {}
    for vid, v in vecs.items():
        if vid == 0:
            continue
        sims[vid] = round(float(qv @ v / (np.linalg.norm(qv) * np.linalg.norm(v))), 6)
    want = sorted(sims.items(), key=lambda kv: (-kv[1], kv[0]))[:5]
    assert [g[0] for g in got] == [w[0] for w in want]
    for g, w in zip(got, want):
        assert g[1] == pytest.approx(w[1], abs=2e-6)


def test_ivf_recall(spark, emb):
    """IVF with 16 cells / 4 probes must recover >= 40% of exact top-5
    neighbors for the 10 test queries, with exact cosines on overlaps."""
    from gemproc2caom2_spark.operators.similarity import ivf_topk

    q = emb.where(F.col("vec_id") < 10)
    exact = brute_force_topk(emb, q, k=5).collect()
    approx = ivf_topk(emb, q, k=5, n_centroids=16, n_probe=4).collect()
    exact_set = {(r.query_id, r.vec_id) for r in exact}
    approx_set = {(r.query_id, r.vec_id) for r in approx}
    assert approx_set, "IVF returned nothing"
    recall = len(exact_set & approx_set) / len(exact_set)
    assert recall >= 0.4, recall
    ex = {(r.query_id, r.vec_id): r.cosine for r in exact}
    for r in approx:
        if (r.query_id, r.vec_id) in ex:
            assert r.cosine == ex[(r.query_id, r.vec_id)]


def test_trained_ivf_recall_and_persistence(spark, emb, tmp_path):
    """MLlib-trained quantizer: training is deterministic for a fixed
    seed, the persisted (cid, cvec) parquet round-trips exactly, and
    probing the stored model clears the same recall bar as the seeded
    quantizer (>= 40% of exact top-5 for 10 queries, exact cosines on
    overlaps)."""
    from gemproc2caom2_spark.operators.similarity import (
        ivf_topk,
        load_ivf_model,
        save_ivf_model,
        train_ivf_centroids,
    )

    centers = train_ivf_centroids(emb, k=16, seed=42)
    assert centers == train_ivf_centroids(emb, k=16, seed=42)

    path = str(tmp_path / "ivf_model")
    save_ivf_model(spark, centers, path)
    assert load_ivf_model(spark, path) == centers

    q = emb.where(F.col("vec_id") < 10)
    exact = brute_force_topk(emb, q, k=5).collect()
    approx = ivf_topk(
        emb, q, k=5, n_centroids=16, n_probe=4, centroids=centers
    ).collect()
    exact_set = {(r.query_id, r.vec_id) for r in exact}
    approx_set = {(r.query_id, r.vec_id) for r in approx}
    assert approx_set, "trained IVF returned nothing"
    recall = len(exact_set & approx_set) / len(exact_set)
    assert recall >= 0.4, recall
    ex = {(r.query_id, r.vec_id): r.cosine for r in exact}
    for r in approx:
        if (r.query_id, r.vec_id) in ex:
            assert r.cosine == ex[(r.query_id, r.vec_id)]


def test_embedding_near_dup_exactness(spark, emb):
    """Every pair the bucketed near-dup op returns must be a true pair
    (cosine computed exactly, id1 < id2, above threshold); recall vs the
    numpy all-pairs truth must clear the multi-table union bound."""
    import numpy as np

    from gemproc2caom2_spark.operators.similarity import embedding_near_dup_pairs

    got = embedding_near_dup_pairs(emb, threshold=0.35, bits=4, tables=8).collect()
    assert got, "no near-dup pairs found"
    rows = emb.collect()
    vecs = {r.vec_id: np.array(r.embedding, dtype=np.float64) for r in rows}
    for r in got:
        assert r.id1 < r.id2
        a, b = vecs[r.id1], vecs[r.id2]
        true_cos = float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))
        assert abs(r.cosine - true_cos) < 2e-6
        assert r.cosine >= 0.35
    truth = sum(
        1
        for i in vecs
        for j in vecs
        if i < j
        and float(vecs[i] @ vecs[j]
                  / (np.linalg.norm(vecs[i]) * np.linalg.norm(vecs[j]))) >= 0.35
    )
    assert len(got) >= 0.2 * truth, (len(got), truth)


def test_lsh_ann_recall(spark, emb):
    """Bucketed ANN must agree with exact top-5 on >= 40% of neighbors
    at 4 bits (1/16 of corpus scored) for the 10 test queries combined —
    and every returned neighbor's cosine must be computed exactly."""
    q = emb.where(F.col("vec_id") < 10)
    exact = brute_force_topk(emb, q, k=5).collect()
    approx = lsh_ann_topk(emb, q, k=5, bits=4).collect()
    exact_set = {(r.query_id, r.vec_id) for r in exact}
    approx_set = {(r.query_id, r.vec_id) for r in approx}
    assert approx_set, "ANN returned nothing"
    recall = len(exact_set & approx_set) / len(exact_set)
    assert recall >= 0.4, recall
    # cosine values for overlapping pairs must match exactly
    ex = {(r.query_id, r.vec_id): r.cosine for r in exact}
    for r in approx:
        if (r.query_id, r.vec_id) in ex:
            assert r.cosine == ex[(r.query_id, r.vec_id)]


def test_seq_kernels_bit_identical_to_column_folds(spark, emb):
    """The float-vector Arrow kernels (np_seq_cosine_udf /
    np_seq_bucket_udf) must reproduce the interpreted Column folds
    BIT-FOR-BIT — not approximately: a last-ulp difference could flip a
    near-zero hyperplane sign (changing candidate sets) or a
    round()-boundary value (breaking SQL-oracle hash parity). Asserted
    with exact == over every vector / every dense pair sample of the
    real embeddings table, un-rounded."""
    from gemproc2caom2_spark.operators.similarity import (
        dot_expr,
        hyperplane_bucket_expr,
        norm_expr,
        np_seq_bucket_udf,
        np_seq_cosine_udf,
    )

    bits, tables, dim = 6, 8, 64

    # buckets: fold vs kernel over every vector
    fold_buckets = F.array(
        *[
            hyperplane_bucket_expr(F.col("embedding"), bits, t, dim)
            + F.lit(t << 60)
            for t in range(tables)
        ]
    )
    kern_buckets = np_seq_bucket_udf(bits, tables, dim)(F.col("embedding"))
    mismatch = (
        emb.select(fold_buckets.alias("f"), kern_buckets.alias("k"))
        .where(F.col("f") != F.col("k"))
        .count()
    )
    assert mismatch == 0

    # cosine: fold vs kernel over a dense pair sample (~50^2/2 pairs),
    # compared un-rounded so rounding can't mask a ulp difference
    sub = emb.where(F.col("vec_id") < 50)
    a = sub.select(F.col("vec_id").alias("id1"), F.col("embedding").alias("_v1"))
    b = sub.select(F.col("vec_id").alias("id2"), F.col("embedding").alias("_v2"))
    pairs = a.crossJoin(b).where(F.col("id1") < F.col("id2"))
    fold_cos = dot_expr(F.col("_v1"), F.col("_v2")) / (
        norm_expr(F.col("_v1")) * norm_expr(F.col("_v2"))
    )
    kern_cos = np_seq_cosine_udf()(F.col("_v1"), F.col("_v2"))
    bad = (
        pairs.select(fold_cos.alias("f"), kern_cos.alias("k"))
        .where(F.col("f") != F.col("k"))
        .count()
    )
    assert bad == 0


def test_ivf_cells_kernel_bit_identical_to_struct_sort(spark, emb):
    """np_seq_ivf_cells_udf must reproduce the interpreted Column
    semantics it replaced inside ivf_topk — per-cell cosine as
    dot / (norm_expr(vec) * lit(python_cnorm)), ranked by
    array_max / reverse(array_sort) over (c, -cid) structs — exactly,
    over every vector of the real table."""
    import math

    from gemproc2caom2_spark.operators.similarity import (
        norm_expr,
        np_seq_ivf_cells_udf,
    )

    rows = emb.where(F.col("vec_id") < 16).select("vec_id", "embedding").collect()
    centroids = {int(r[0]): [float(x) for x in r[1]] for r in rows}

    def cos_to_centroid(vec, cvec):
        cnorm = math.sqrt(sum(x * x for x in cvec))
        arr = F.array(*[F.lit(x) for x in cvec])
        dot = F.aggregate(
            F.zip_with(vec, arr, lambda a, b: a.cast("double") * b),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        return dot / (norm_expr(vec) * F.lit(cnorm))

    cells = F.array(
        *[
            F.struct(
                cos_to_centroid(F.col("embedding"), cvec).alias("c"),
                F.lit(-cid).alias("ni"),
                F.lit(cid).alias("cid"),
            )
            for cid, cvec in sorted(centroids.items())
        ]
    )
    fold_assign = F.array_max(cells).getField("cid")
    fold_probes = F.transform(
        F.slice(F.reverse(F.array_sort(cells)), 1, 4),
        lambda s: s.getField("cid"),
    )
    kern_assign = np_seq_ivf_cells_udf(centroids, 1)(F.col("embedding"))[0]
    kern_probes = np_seq_ivf_cells_udf(centroids, 4)(F.col("embedding"))

    bad = (
        emb.select(
            fold_assign.alias("fa"),
            kern_assign.alias("ka"),
            fold_probes.cast("array<int>").alias("fp"),
            kern_probes.alias("kp"),
        )
        .where((F.col("fa") != F.col("ka")) | (F.col("fp") != F.col("kp")))
        .count()
    )
    assert bad == 0


def test_bucket_pair_kernel_matches_pair_join_form(spark, emb):
    """The r6 per-bucket group kernel must reproduce the r5 pair-join
    plan (explode buckets -> self-join -> distinct -> two vector joins
    -> scalar cosine kernel) row-for-row and bit-for-bit, on both the
    float (sequential-order) and int-exact paths."""
    from gemproc2caom2_spark.operators.embed import (
        with_centered_vector,
        with_text_embedding,
    )
    from gemproc2caom2_spark.operators.similarity import (
        embedding_near_dup_pairs,
        np_bucket_udf,
        np_int_cosine_udf,
        np_seq_bucket_udf,
        np_seq_cosine_udf,
    )

    def old_pairs(corpus, threshold, bits, tables, dim, bucket_vec_col, int_exact):
        bucket_arr = (np_bucket_udf if int_exact else np_seq_bucket_udf)(
            bits, tables, dim
        )(F.col(bucket_vec_col or "embedding"))
        cb = corpus.select(F.col("vec_id"), F.explode(bucket_arr).alias("_b"))
        cand = (
            cb.select(F.col("vec_id").alias("id1"), "_b")
            .join(cb.select(F.col("vec_id").alias("id2"), "_b"), on="_b")
            .where(F.col("id1") < F.col("id2"))
            .select("id1", "id2")
            .distinct()
        )
        cos = (np_int_cosine_udf if int_exact else np_seq_cosine_udf)()
        e1 = corpus.select(F.col("vec_id").alias("id1"), F.col("embedding").alias("_v1"))
        e2 = corpus.select(F.col("vec_id").alias("id2"), F.col("embedding").alias("_v2"))
        return (
            cand.join(e1, on="id1")
            .join(e2, on="id2")
            .select("id1", "id2", F.round(cos(F.col("_v1"), F.col("_v2")), 6).alias("cosine"))
            .where(F.col("cosine") >= threshold)
        )

    # float path over the embeddings table
    new_f = embedding_near_dup_pairs(emb, threshold=0.35, bits=4, tables=8).collect()
    old_f = old_pairs(emb, 0.35, 4, 8, 64, None, False).collect()
    assert sorted(map(tuple, new_f)) == sorted(map(tuple, old_f))
    assert len(new_f) > 0

    # int path over text-derived centered-bucket TF vectors
    docs = spark.createDataFrame(
        [(i, ("spam ham " * (i % 5 + 1)) + f"tail {i % 7}") for i in range(80)],
        "doc_id long, text string",
    )
    corpus = with_text_embedding(docs, dim=16, use_udf=True).select(
        F.col("doc_id").alias("vec_id"), "embedding"
    )
    corpus = with_centered_vector(corpus, dim=16)
    new_i = embedding_near_dup_pairs(
        corpus, threshold=0.9, bits=4, tables=4, dim=16,
        bucket_vec_col="cvec", int_exact=True,
    ).collect()
    old_i = old_pairs(corpus, 0.9, 4, 4, 16, "cvec", True).collect()
    assert sorted(map(tuple, new_i)) == sorted(map(tuple, old_i))
    assert len(new_i) > 0


def test_ann_recall_bounds_and_exact_match(spark):
    from gemproc2caom2_spark.operators.similarity import ann_recall

    exact = spark.createDataFrame(
        [(0, 10), (0, 11), (0, 12), (1, 20), (1, 21)],
        ["query_id", "vec_id"],
    )
    # query 0: ann recovered 2 of 3; query 1: all; extra ann-only row
    # must not inflate recall
    ann = spark.createDataFrame(
        [(0, 10), (0, 12), (0, 99), (1, 20), (1, 21)],
        ["query_id", "vec_id"],
    )
    out = {r["query_id"]: r for r in ann_recall(exact, ann).collect()}
    assert (out[0]["k"], out[0]["n_hit"], out[0]["recall_r6"]) == (3, 2, 0.666667)
    assert (out[1]["k"], out[1]["n_hit"], out[1]["recall_r6"]) == (2, 2, 1.0)
