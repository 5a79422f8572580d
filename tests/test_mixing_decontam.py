"""Decontamination + domain-quota operators: edge semantics and
determinism (the driver queries dec1/mix1 pin oracle parity; these pin
the operator contracts directly)."""

from __future__ import annotations

from pyspark.sql import functions as F

from gemproc2caom2_spark.operators.decontaminate import mark_contaminated
from gemproc2caom2_spark.operators.mixing import domain_quota

WORDS8 = "alpha beta gamma delta epsilon zeta eta theta"


def test_mark_contaminated_semantics(spark):
    corpus = spark.createDataFrame(
        [
            (1, f"intro {WORDS8} outro words here"),       # shares the 8-gram
            (2, "completely different text with eight plus words in it"),
            (3, "short doc"),                               # < 8 words: never
            (4, None),                                      # null: excluded
            (5, WORDS8.upper()),                            # case-folds to hit
        ],
        "doc_id bigint, text string",
    )
    bench = spark.createDataFrame(
        [(100, f"benchmark prefix {WORDS8} benchmark suffix")],
        "doc_id bigint, text string",
    )
    out = {
        r.doc_id: r.contaminated
        for r in mark_contaminated(
            corpus.where(F.col("text").isNotNull()), bench, k=8
        ).collect()
    }
    assert out == {1: True, 2: False, 3: False, 5: True}


def test_domain_quota_deterministic_and_capped(spark):
    rows = [(i, f"src{i % 3}") for i in range(90)]
    df = spark.createDataFrame(rows, "doc_id bigint, source string")

    def pick(frame):
        out = domain_quota(frame, quota=7).collect()
        per = {}
        for r in out:
            per.setdefault(r.source, []).append((r.sample_rank, r.doc_id))
        return {k: sorted(v) for k, v in per.items()}

    a = pick(df.repartition(1))
    b = pick(df.repartition(11))
    assert a == b
    for src, picks in a.items():
        assert len(picks) == 7
        assert [r for r, _ in picks] == list(range(1, 8)), src


def test_sequence_packing_budget_and_determinism(spark):
    """Each sequence's token total stays within budget + one overflow
    doc; assignment is contiguous per group and partition-invariant."""
    from gemproc2caom2_spark.operators.mixing import sequence_packing

    rows = [
        (i, "src" + str(i % 2), " ".join(["tok"] * (5 + (i * 7) % 40)))
        for i in range(60)
    ] + [(100, "src0", " ".join(["tok"] * 300))]   # over-budget doc
    df = spark.createDataFrame(rows, "doc_id bigint, source string, text string")

    def packed(frame):
        return sorted(
            (r.doc_id, r.source, r.n_tokens, r.seq_id)
            for r in sequence_packing(frame, budget=100).collect()
        )

    a = packed(df.repartition(1))
    assert a == packed(df.repartition(9))

    per_seq: dict = {}
    for _, src, n, seq in a:
        per_seq.setdefault((src, seq), []).append(n)
    for (src, seq), toks in per_seq.items():
        # a sequence may only exceed the budget via its LAST-started doc
        assert sum(toks) - max(toks) < 100, (src, seq, toks)


def test_sequence_packing_exclusive_prefix_boundary(spark):
    """A doc whose tokens exactly fill the budget closes its sequence:
    the NEXT doc starts seq 1 while the filler itself stays in seq 0 —
    pins the exclusive (not inclusive) prefix-sum frame."""
    from gemproc2caom2_spark.operators.mixing import sequence_packing

    rows = [(1, "g", " ".join(["t"] * 100)), (2, "g", "small doc here")]
    df = spark.createDataFrame(rows, "doc_id bigint, source string, text string")
    out = {r.doc_id: r.seq_id for r in sequence_packing(df, budget=100).collect()}
    # md5('1') < md5('2') -> doc 1 first
    import hashlib
    assert hashlib.md5(b"1").hexdigest() < hashlib.md5(b"2").hexdigest()
    assert out == {1: 0, 2: 1}


def test_doc_keywords_semantics(spark):
    """Rare-but-frequent-within-doc terms outrank common terms; ubiquitous
    terms score idf=0; rank is deterministic and capped at k."""
    from gemproc2caom2_spark.operators.vocab import doc_keywords

    rows = [
        (1, "shared shared zebra zebra zebra common"),
        (2, "shared common unique"),
        (3, "shared common filler words"),
        (4, None),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    out = doc_keywords(df, k=2).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append((r.rank, r.token, r.tfidf_r6))
    for d in by_doc.values():
        d.sort()
    # 'shared'/'common' appear in all 3 docs -> idf 0 -> never a top keyword
    # when any distinctive token exists
    assert by_doc[1][0][1] == "zebra"
    assert by_doc[2][0][1] == "unique"
    assert all(len(v) <= 2 for v in by_doc.values())
    assert 4 not in by_doc


def test_domain_quota_sharded_bound_and_b1_identity(spark):
    from gemproc2caom2_spark.operators.mixing import sequence_packing

    # one mega-group: every row in the same source
    rows = [(i, "hot", f"word{i} filler text here") for i in range(400)]
    df = spark.createDataFrame(rows, "doc_id bigint, source string, text string")

    # B=1 is bit-identical to the unsharded operator
    a = sorted(
        (r.doc_id, r.sample_rank)
        for r in domain_quota(df, quota=60, shards_per_group=1).collect()
    )
    b = sorted(
        (r.doc_id, r.sample_rank) for r in domain_quota(df, quota=60).collect()
    )
    assert a == b

    # sharded: exactly quota rows total, per-shard rank bounded by
    # ceil(quota/B) — the per-task sort bound the salt exists for
    B = 8
    out = domain_quota(df, quota=60, shards_per_group=B).collect()
    assert len(out) == 60
    assert max(r.sample_rank for r in out) <= (60 + B - 1) // B
    # deterministic across runs
    out2 = domain_quota(df, quota=60, shards_per_group=B).collect()
    assert sorted(r.doc_id for r in out) == sorted(r.doc_id for r in out2)

    # sequence packing: B=1 identity, sharded ids disjoint-by-residue
    p1 = {r.doc_id: r.seq_id for r in sequence_packing(df, budget=16).collect()}
    p1b = {
        r.doc_id: r.seq_id
        for r in sequence_packing(df, budget=16, shards_per_group=1).collect()
    }
    assert p1 == p1b
    pB = sequence_packing(df, budget=16, shards_per_group=4).collect()
    assert len(pB) == 400
    # seq_id = local*B + shard: residue class identifies the shard, and
    # every doc of one sequence shares the residue (sequences never
    # span shards)
    assert {r.seq_id % 4 for r in pB} == {0, 1, 2, 3}
    # per-shard token conservation: each shard's window indices cover
    # its docs' exclusive prefix sums (total tokens / budget windows)
    import collections

    by_shard = collections.defaultdict(list)
    for r in pB:
        by_shard[r.seq_id % 4].append(r)
    for s, rs in by_shard.items():
        total = sum(r.n_tokens for r in rs)
        max_local = max(r.seq_id // 4 for r in rs)
        assert max_local <= total // 16


def test_weighted_sample_semantics(spark):
    from gemproc2caom2_spark.operators.mixing import weighted_sample

    rows = [
        (i, ["keep_all", "drop_all", "half", "unknown"][i % 4], "t")
        for i in range(2000)
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, source string, text string")
    rates = {"keep_all": 1.0, "drop_all": 0.0, "half": 0.5}

    out = weighted_sample(df, rates=rates, default_rate=0.25).collect()
    by_src = {}
    for r in out:
        by_src.setdefault(r.source, set()).add(r.doc_id)

    assert len(by_src.get("keep_all", ())) == 500       # rate 1.0: everything
    assert "drop_all" not in by_src                     # rate 0.0: nothing
    kept_half = len(by_src.get("half", ()))
    assert 175 < kept_half < 325                        # ~50% of 500
    kept_dflt = len(by_src.get("unknown", ()))
    assert 75 < kept_dflt < 175                         # default 25% of 500

    # deterministic: identical subset on rerun
    out2 = weighted_sample(df, rates=rates, default_rate=0.25).collect()
    assert sorted(r.doc_id for r in out) == sorted(r.doc_id for r in out2)

    # the draw is independent of other hex15-of-id uses: sampling at 0.5
    # then quota-ranking keeps composition unbiased (smoke: subset of ids)
    ids = {r.doc_id for r in out}
    assert ids <= {r[0] for r in rows}


def test_token_budget_selection_exclusive_prefix_and_shards(spark):
    """Selection takes best-quality docs while the tokens BEFORE a doc
    are under the budget (so it overshoots by at most one doc); the
    sharded variant bounds per-shard budgets and B=1 is bit-identical
    to the unsharded plan."""
    from pyspark.sql import functions as F

    from gemproc2caom2_spark.operators.mixing import token_budget_selection

    rows = [(i, "a", 10, float(100 - i)) for i in range(1, 21)]  # best = low id
    df = spark.createDataFrame(
        rows, "doc_id long, source string, tokens long, quality double"
    )
    out = token_budget_selection(
        df, "tokens", "quality", group_col="source", budget=55
    ).collect()
    sel = sorted(r.doc_id for r in out if r.selected)
    # docs 1..5 have cum_before 0..40 < 55; doc 6 has 50 < 55 (overshoot
    # by part of doc 6); doc 7 has 60 >= 55
    assert sel == [1, 2, 3, 4, 5, 6]
    total = sum(r.tokens for r in out if r.selected)
    assert 55 <= total <= 55 + 10  # overshoot bounded by one doc

    # B=1 identity
    out_b1 = token_budget_selection(
        df, "tokens", "quality", group_col="source", budget=55, shards_per_group=1
    ).collect()
    assert sorted(map(tuple, out_b1)) == sorted(map(tuple, out))

    # sharded: per-shard budgets sum to the budget (DIV split + remainder)
    out_sh = token_budget_selection(
        df, "tokens", "quality", group_col="source", budget=55, shards_per_group=4
    ).collect()
    total_sh = sum(r.tokens for r in out_sh if r.selected)
    # each shard overshoots by at most one 10-token doc
    assert 55 <= total_sh <= 55 + 4 * 10


def test_blocklist_filter_semantics(spark):
    from gemproc2caom2_spark.operators.filters import blocklist_filter

    df = spark.createDataFrame(
        [
            (1, "badhost.com", "clean text here"),
            (2, "good.org", "win at the casino tonight"),
            (3, "good.org", "duplicate is not the badword dup is"),
            (4, None, "null domain passes the domain gate"),
            (5, "good.org", "CASINO uppercase still hits"),
            (6, "good.org", "scasino embedded does not hit"),
        ],
        "doc_id bigint, source string, text string",
    )
    out = {
        r.doc_id: (r.blocked_domain, r.has_badword, r.keep)
        for r in blocklist_filter(
            df, blocked_domains=["badhost.com"], badwords=["casino", "dup"]
        ).collect()
    }
    assert out[1] == (True, False, False)       # domain gate
    assert out[2] == (False, True, False)       # badword gate
    # \b boundary: "duplicate" must NOT match "dup", bare "dup" must
    assert out[3] == (False, True, False)
    assert out[4] == (False, False, True)       # null domain not blocked
    assert out[5] == (False, True, False)       # case-insensitive
    assert out[6] == (False, False, True)       # substring not a word


def test_training_order_permutation_and_determinism(spark):
    from gemproc2caom2_spark.operators.mixing import training_order

    df = spark.range(0, 200).withColumnRenamed("id", "doc_id")
    a = training_order(df, shards=4).collect()
    b = training_order(df, shards=4).collect()
    assert sorted((r.doc_id, r.shard, r.pos) for r in a) == sorted(
        (r.doc_id, r.shard, r.pos) for r in b
    )  # rerun-deterministic
    # (shard, pos) is a bijection: every doc exactly once, positions
    # contiguous 1..n within each shard
    pairs = [(r.shard, r.pos) for r in a]
    assert len(set(pairs)) == 200
    by_shard: dict[int, list[int]] = {}
    for s, p in pairs:
        by_shard.setdefault(s, []).append(p)
    assert set(by_shard) == {0, 1, 2, 3}
    for poss in by_shard.values():
        assert sorted(poss) == list(range(1, len(poss) + 1))
    # a different tag draws a different permutation
    c = training_order(df, shards=4, tag="epoch2").collect()
    assert {(r.doc_id, r.shard, r.pos) for r in c} != {
        (r.doc_id, r.shard, r.pos) for r in a
    }


def test_frequency_resample_levels_buckets(spark):
    from gemproc2caom2_spark.operators.mixing import frequency_resample

    # bucket 'rare' has 20 rows, 'hot' has 400 -> hot downsampled ~20
    rows = [(i, "rare") for i in range(20)] + [
        (1000 + i, "hot") for i in range(400)
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, bucket string")
    out = frequency_resample(df, bucket_col="bucket").collect()
    kept = {}
    for r in out:
        kept.setdefault(r.bucket, []).append(r.doc_id)
    # rarest bucket: accept_bp = 10^6 -> kept in full
    assert sorted(kept["rare"]) == list(range(20))
    # hot bucket: expected 20, binomial sd ~4.4 — assert a wide band
    assert 5 <= len(kept["hot"]) <= 40
    # deterministic rerun
    out2 = frequency_resample(df, bucket_col="bucket").collect()
    assert sorted((r.doc_id, r.bucket) for r in out) == sorted(
        (r.doc_id, r.bucket) for r in out2
    )
