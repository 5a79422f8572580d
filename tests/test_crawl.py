"""Crawl-maintenance operators: URL canonicalization, recrawl
latest-version collapse, deterministic holdout split.

Reference parity model: entry-name repair (builder.py:149-153) and
only-reprocess-changed todo diffing (composable.py:119-133).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from gemproc2caom2_spark.operators.crawl import (
    canonicalize_url,
    latest_crawl_wins,
)
from gemproc2caom2_spark.operators.mixing import holdout_split


def _canon(spark, urls: list[str]) -> list[str]:
    df = spark.createDataFrame([(u,) for u in urls], ["url"])
    rows = df.select(canonicalize_url("url").alias("c")).collect()
    return [r["c"] for r in rows]


def test_canonicalize_url_cases(spark):
    got = _canon(
        spark,
        [
            # case fold + www strip + fragment strip + default port
            "HTTP://WWW.Example.COM:80/Page/1#frag",
            # tracking params dropped, survivors sorted
            "https://example.com/p?utm_source=feed&b=2&a=1",
            "https://example.com/p?b=2&a=1&utm_campaign=x",
            "https://example.com/p?a=1&b=2&gclid=abc",
            # all params tracking => query gone entirely
            "https://example.com/p?utm_medium=email",
            # no query: untouched beyond normalization
            "https://example.com/Page/2/",
            # https on port 80 is a DISTINCT origin: port must survive
            "https://example.com:80/p",
        ],
    )
    assert got == [
        "http://example.com/Page/1",
        "https://example.com/p?a=1&b=2",
        "https://example.com/p?a=1&b=2",
        "https://example.com/p?a=1&b=2",
        "https://example.com/p",
        "https://example.com/Page/2",
        "https://example.com:80/p",
    ]


def test_canonicalize_url_idempotent(spark):
    raw = [
        "HTTP://WWW.Example.COM:80/Page/1#frag",
        "https://example.com/p?utm_source=feed&b=2&a=1",
        "https://sub.example.com/A/B?z=9&y=8&ref",
    ]
    once = _canon(spark, raw)
    twice = _canon(spark, once)
    assert once == twice


def test_latest_crawl_wins_semantics(spark):
    rows = [
        # url A: 3 fetches, content changes at the last fetch
        (1, "A", 100, "h1"),
        (2, "A", 200, "h1"),
        (3, "A", 300, "h2"),
        # url B: 2 fetches, unchanged
        (4, "B", 100, "h9"),
        (5, "B", 250, "h9"),
        # url C: single fetch => changed=false by convention
        (6, "C", 50, "h5"),
        # url D: timestamp tie => higher doc_id wins deterministically
        (7, "D", 80, "x1"),
        (8, "D", 80, "x2"),
    ]
    df = spark.createDataFrame(
        rows, ["doc_id", "url_key", "crawl_ts", "fingerprint"]
    )
    out = {
        r["url_key"]: r
        for r in latest_crawl_wins(df).collect()
    }
    assert len(out) == 4
    assert (out["A"]["doc_id"], out["A"]["n_crawls"], out["A"]["changed"]) == (
        3, 3, True,
    )
    assert (out["B"]["doc_id"], out["B"]["n_crawls"], out["B"]["changed"]) == (
        5, 2, False,
    )
    assert (out["C"]["doc_id"], out["C"]["n_crawls"], out["C"]["changed"]) == (
        6, 1, False,
    )
    # tie broken on doc_id desc; fingerprints differ => changed
    assert (out["D"]["doc_id"], out["D"]["changed"]) == (8, True)


def test_holdout_split_stable_and_disjoint(spark):
    df = spark.range(0, 2000).withColumnRenamed("id", "doc_id")
    out = holdout_split(df).groupBy("split").count().collect()
    counts = {r["split"]: r["count"] for r in out}
    assert set(counts) == {"train", "val", "test"}
    # 90/5/5 split with binomial slack
    assert 1700 < counts["train"] < 1900
    assert 50 < counts["val"] < 150
    assert 50 < counts["test"] < 150
    # growth-stability: the assignment of doc 0..99 is unchanged when
    # computed over a 20x smaller corpus
    small = holdout_split(
        spark.range(0, 100).withColumnRenamed("id", "doc_id")
    ).collect()
    big = {
        r["doc_id"]: r["split"]
        for r in holdout_split(df).filter(F.col("doc_id") < 100).collect()
    }
    assert all(big[r["doc_id"]] == r["split"] for r in small)


def test_sliding_chunks_cover_and_overlap(spark):
    from gemproc2caom2_spark.operators.mixing import sliding_chunks

    rows = [(1, "a" * 10), (2, "x" * 25), (3, ""), (4, "short")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = sliding_chunks(df, size=10, stride=8).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], {})[r["chunk_id"]] = r["chunk"]
    # exactly-size doc: one chunk
    assert by_doc[1] == {0: "a" * 10}
    # 25 chars, size 10 stride 8: chunks at 0,8,16 => 3 chunks,
    # last truncated to 9; reassembling strides covers every char
    assert by_doc[2] == {0: "x" * 10, 1: "x" * 10, 2: "x" * 9}
    assert by_doc[3] == {0: ""}
    assert by_doc[4] == {0: "short"}


def test_inverted_index_cap_and_postings(spark):
    from gemproc2caom2_spark.operators.vocab import inverted_index

    rows = [
        (3, "alpha beta"),
        (1, "alpha beta beta"),
        (2, "alpha gamma"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r["token"]: r for r in inverted_index(df, max_df=2).collect()}
    # 'alpha' df=3 > cap => excluded BEFORE any posting state
    assert "alpha" not in out
    # within-doc repeats collapse (distinct pairs); postings sorted
    assert (out["beta"]["df"], out["beta"]["postings"]) == (2, "1,3")
    assert (out["gamma"]["df"], out["gamma"]["postings"]) == (1, "2")


def test_inverted_index_trigram_phrases(spark):
    from gemproc2caom2_spark.operators.vocab import inverted_index

    rows = [
        (1, "the quick brown fox"),
        (2, "a quick brown fox too"),
        (3, "hi"),  # < 3 tokens: contributes nothing
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r["token"]: r for r in inverted_index(df, max_df=50, ngram=3).collect()}
    assert out["quick brown fox"]["postings"] == "1,2"
    assert out["quick brown fox"]["df"] == 2
    assert out["the quick brown"]["postings"] == "1"
    assert "hi" not in out


def test_asof_join_backward_semantics(spark):
    import datetime as dt

    from gemproc2caom2_spark.operators.asof import asof_join_backward

    T = lambda s: dt.datetime.fromisoformat(s)
    events = spark.createDataFrame(
        [
            (1, T("2024-01-01T10:00:00"), 100, 5.0),
            (1, T("2024-01-01T12:00:00"), 101, 7.0),
            # key 2: two events at the SAME instant -> tiebreak wins
            (2, T("2024-01-01T10:00:00"), 200, 1.0),
            (2, T("2024-01-01T10:00:00"), 201, 2.0),
        ],
        ["k", "ts", "event_id", "value"],
    )
    probes = spark.createDataFrame(
        [
            (1, T("2024-01-01T09:00:00")),  # before any event -> nulls
            (1, T("2024-01-01T11:00:00")),  # between -> event 100
            (1, T("2024-01-01T12:00:00")),  # coincident -> INCLUSIVE
            (2, T("2024-01-01T10:30:00")),  # tie -> higher event_id
        ],
        ["k", "probe_ts"],
    )
    out = {
        (r["k"], r["probe_ts"].hour): r
        for r in asof_join_backward(
            probes, events, "k", "probe_ts", "ts",
            ["event_id", "value"], tiebreak_col="event_id",
        ).collect()
    }
    assert out[(1, 9)]["event_id"] is None and out[(1, 9)]["value"] is None
    assert out[(1, 11)]["event_id"] == 100
    assert out[(1, 12)]["event_id"] == 101  # <= is inclusive
    assert out[(2, 10)]["event_id"] == 201  # deterministic tie winner


def test_range_join_buckets_matches_naive(spark):
    import datetime as dt

    from gemproc2caom2_spark.operators.asof import range_join_time_buckets

    T = lambda s: dt.datetime.fromisoformat(s)
    events = spark.createDataFrame(
        [
            (1, T("2024-01-01T10:15:00")),
            (2, T("2024-01-01T11:59:59")),
            (3, T("2024-01-01T12:00:00")),  # == end: EXCLUSIVE
            (4, T("2024-01-01T09:29:59")),  # just before start
            (5, T("2024-01-01T09:30:00")),  # == start: INCLUSIVE
        ],
        ["event_id", "ts"],
    )
    iv = spark.createDataFrame(
        [("w1", T("2024-01-01T09:30:00"), T("2024-01-01T12:00:00"))],
        ["incident_id", "t_start", "t_end"],
    )
    got = sorted(
        r["event_id"]
        for r in range_join_time_buckets(
            events, iv, "ts", "t_start", "t_end"
        ).collect()
    )
    assert got == [1, 2, 5]


def test_asof_join_tolerance_nulls_stale_matches(spark):
    import datetime as dt

    from gemproc2caom2_spark.operators.asof import asof_join_backward

    T = lambda s: dt.datetime.fromisoformat(s)
    events = spark.createDataFrame(
        [(1, T("2024-01-01T00:00:00"), 100, 5.0)],
        ["k", "ts", "event_id", "value"],
    )
    probes = spark.createDataFrame(
        [
            (1, T("2024-01-01T01:00:00")),  # 1h old: fresh
            (1, T("2024-01-01T02:00:00")),  # exactly 2h: inclusive bound
            (1, T("2024-01-01T02:00:01")),  # 1s past: stale -> null
        ],
        ["k", "probe_ts"],
    )
    out = {
        r["probe_ts"].minute * 60 + r["probe_ts"].second + r["probe_ts"].hour * 3600:
            r["event_id"]
        for r in asof_join_backward(
            probes, events, "k", "probe_ts", "ts",
            ["event_id", "value"], tolerance_seconds=7200,
        ).collect()
    }
    assert out[3600] == 100
    assert out[7200] == 100
    assert out[7201] is None


def test_canonicalize_url_fuzz_invariants(spark):
    import random

    rng = random.Random(42)
    schemes = ["http://", "https://", "HTTP://", "HtTpS://"]
    hosts = ["Example.com", "WWW.Example.com", "sub.Site.ORG", "a.b.c.net"]
    ports = ["", ":80", ":443", ":8080"]
    paths = ["", "/", "/A/b", "/Page/9/", "/x%20y"]
    params = ["a=1", "b=2", "utm_source=x", "gclid=zz", "ref", "z=9&y=8"]
    frags = ["", "#f", "#Sec-2"]
    urls = []
    for _ in range(200):
        q = ""
        if rng.random() < 0.7:
            chosen = rng.sample(params, rng.randint(1, 4))
            q = "?" + "&".join(chosen)
        urls.append(
            rng.choice(schemes) + rng.choice(hosts) + rng.choice(ports)
            + rng.choice(paths) + q + rng.choice(frags)
        )
    once = _canon(spark, urls)
    twice = _canon(spark, once)
    assert once == twice  # idempotent over the whole fuzz corpus
    for c in once:
        assert "#" not in c
        assert "utm_" not in c and "gclid" not in c
        scheme_host = c.split("://")[0] + "://" + c.split("://")[1].split("/")[0]
        assert scheme_host == scheme_host.lower()
        assert "://www." not in c
        if "?" in c:
            ps = c.split("?", 1)[1].split("&")
            assert ps == sorted(ps) and all(ps)
