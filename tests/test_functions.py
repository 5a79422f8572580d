"""Kernel unit tests: identity/url kernels (the StorageName-style
exact-value tables, /root/reference/gemProc2caom2/tests/
test_storage_name.py:89-157), cross-engine hash parity, extraction
edge cases, scrub byte-exactness across three engines."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from gemproc2caom2_spark.functions.hashing import hex15_hash, hex15_hash_sql, url_host, url_normalize
from gemproc2caom2_spark.functions.scrub import scrub_expr, scrub_python, scrub_sql
from gemproc2caom2_spark.operators.extract import extract_text_scalar

# exact-value table, the test_storage_name.py pattern
URL_CASES = [
    ("https://Example.COM/Path/Page#frag", "https://example.com/Path/Page", "example.com"),
    ("https://example.com:443/a/", "https://example.com/a", "example.com"),
    ("http://example.com:80/", "http://example.com", "example.com"),
    ("https://sub.host.example/x?q=1", "https://sub.host.example/x?q=1", "sub.host.example"),
    ("not-a-url", "not-a-url", ""),
]


@pytest.mark.parametrize("raw,norm,host", URL_CASES)
def test_url_kernels(spark, raw, norm, host):
    r = spark.range(1).select(
        url_normalize(F.lit(raw)).alias("n"), url_host(F.lit(raw)).alias("h")
    ).collect()[0]
    assert r.n == norm
    assert r.h == host


def test_hex15_cross_engine_parity(spark):
    samples = ["", "abc", "héé 中文 😀", "the quick brown fox", "a" * 1000]
    got = spark.createDataFrame([(s,) for s in samples], "s string").select(
        hex15_hash("s").alias("h")
    ).collect()
    want = [duckdb.sql(f"select {hex15_hash_sql('?')}", params=None).df() for s in []]
    con = duckdb.connect()
    for row, s in zip(got, samples):
        w = con.execute(
            f"select {hex15_hash_sql('$s')}", {"s": s}
        ).fetchone()[0]
        assert row.h == w, s


EXTRACT_CASES = [
    (b"<html><body><p>Hello</p><p>World</p></body></html>", "Hello\nWorld"),
    (b"<p>a &amp; b &lt;c&gt;</p>", "a & b <c>"),
    (b"<script>bad()</script><p>ok</p>", "ok"),
    (b"<nav>Home</nav><p>Body</p><footer>Privacy Policy</footer>", "Body"),
    (b"", ""),
    (None, None),
    # invalid utf-8 -> U+FFFD, multibyte preserved byte-identically
    (b"<p>a\xff b \xe4\xb8\xad</p>", "a� b 中"),
]


@pytest.mark.parametrize("html,want", EXTRACT_CASES)
def test_extract_scalar(html, want):
    assert extract_text_scalar(html) == want


SCRUB_CASES = [
    "mail me at a.b+c@ex-ample.org now",
    "call +1-555-123-4567 or (555) 123 4567.",
    "ssn 123-45-6789 ip 10.0.0.1 what the hell",
    "no pii here",
    "edge a@b.co end",
]


def test_scrub_three_engine_byte_parity(spark):
    """Spark regexp_replace chain == DuckDB chain == Python re chain."""
    con = duckdb.connect()
    spark_out = spark.createDataFrame([(s,) for s in SCRUB_CASES], "t string").select(
        scrub_expr("t").alias("o")
    ).collect()
    for row, s in zip(spark_out, SCRUB_CASES):
        py = scrub_python(s)
        dk = con.execute(f"select {scrub_sql('$t')}", {"t": s}).fetchone()[0]
        assert row.o == py == dk, s


def test_scrub_gated_equals_ungated(spark):
    """The r4 gated scrub (byte-level no-op detectors skipping regex
    passes) must be byte-identical to the plain five-pass chain on
    adversarial boundary cases AND on the full datagen corpus."""
    from gemproc2caom2_spark.functions.scrub import scrub_expr_ungated
    from gemproc2caom2_spark.sources.datagen import generate_corpus

    edge = [
        None,                           # null stays null through the gates
        "",                             # empty
        "dam user@x.com n",             # '@' gate without profanity
        "damuser@x.comn",               # replacement splice: no 'damn' created
        "he123-45-6789l",               # ssn splice: no 'hell' created
        "damnation shellfish scrape",   # gate superset: words inside words
        "1.2.3.4",                      # ipv4 with single-digit octets
        "no trigger characters at all",
        "digits 123 but no pii",
        "<EMAIL> literal token damn",   # token already present + profanity
    ]
    df = spark.createDataFrame([(s,) for s in edge], "t string")
    corpus = generate_corpus(spark, 120).select(F.col("text").alias("t"))
    for frame in (df, corpus):
        bad = (
            frame.select(
                scrub_expr("t").alias("a"), scrub_expr_ungated("t").alias("b")
            )
            .where("a IS DISTINCT FROM b")
            .count()
        )
        assert bad == 0


def test_repetition_struct_semantics(spark):
    from pyspark.sql import functions as F

    from gemproc2caom2_spark.operators.heuristics import repetition_struct

    rows = [
        # "buy now" repeated 10x: 19 bigrams, only 2 distinct -> heavy dup
        (0, " ".join(["buy now"] * 10)),
        (1, "each word here appears exactly once in this sentence"),
        (2, "one"),        # < 2 words: no n-grams, null fracs, no flag
        (3, ""),           # empty
        (4, None),         # null
        (5, "Tick TOCK tick tock tick tock tick tock"),  # case-folds
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r.doc_id: r
        for r in df.select(
            "doc_id", repetition_struct("text").alias("r")
        ).select("doc_id", "r.*").collect()
    }

    assert out[0].n_2grams == 19 and out[0].dup_2gram_frac > 0.85
    assert out[0].is_repetitive is True
    assert out[1].dup_2gram_frac == 0.0 and out[1].is_repetitive is False
    for d in (2, 3, 4):
        r = out[d]
        assert r.n_2grams == 0 and r.dup_2gram_frac is None
        assert r.n_3grams == 0 and r.n_4grams == 0
        assert r.is_repetitive is False      # guard: nulls never flag
    # lowercased tokenization: "Tick TOCK" == "tick tock"
    assert out[5].dup_2gram_frac > 0.5 and out[5].is_repetitive is True


def test_repetition_arrow_matches_column(spark):
    """The Arrow repetition kernel (tx10's scale path) must equal the
    Column-expression form field-for-field — including whitespace /
    empty-token edge cases of Spark's trim+split semantics — on edge
    rows and a generated corpus."""
    from pyspark.sql import functions as F

    from gemproc2caom2_spark.operators.heuristics import (
        repetition_struct,
        repetition_struct_arrow,
    )
    from gemproc2caom2_spark.sources.datagen import generate_corpus

    rows = [
        (0, " ".join(["buy now"] * 10)),
        (1, "each word here appears exactly once in this sentence"),
        (2, "one"),
        (3, ""),
        (4, None),
        (5, "Tick TOCK tick tock tick tock tick tock"),
        (6, "\t"),                      # trim keeps \t: split -> ["", ""]
        (7, "  spaced   out\twords \n lines  "),
        (8, "a b a b a b a b a b a b a b"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    corpus = generate_corpus(spark, 120).select(
        F.col("url").alias("doc_id"), F.col("text")
    )
    for frame in (df, corpus):
        bad = (
            frame.select(
                repetition_struct("text").alias("a"),
                repetition_struct_arrow("text").alias("b"),
            )
            .where("a IS DISTINCT FROM b")
            .count()
        )
        assert bad == 0


def test_compression_ratio_orders_repetition(spark):
    """Repetitive boilerplate compresses far below diverse prose; null
    and empty text yield null."""
    from pyspark.sql import functions as F

    from gemproc2caom2_spark.operators.heuristics import (
        make_compression_ratio_udf,
    )

    rows = [
        (1, "click here click here click here " * 200),
        (2, "The quarterly hydrology report details sediment transport "
            "variance across nineteen alpine catchments, comparing "
            "isotope tracer methods with distributed runoff models."),
        (3, None),
        (4, ""),
    ]
    df = spark.createDataFrame(rows, "id long, text string")
    out = {
        r.id: r.ratio
        for r in df.select(
            "id", make_compression_ratio_udf()(F.col("text")).alias("ratio")
        ).collect()
    }
    assert out[3] is None and out[4] is None
    assert 0 < out[1] < 0.1          # boilerplate collapses
    assert 0.4 < out[2] <= 1.0       # prose stays incompressible
    assert out[1] < out[2]
