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
