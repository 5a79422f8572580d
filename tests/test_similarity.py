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
