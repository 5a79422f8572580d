"""BPE merge-loop training: distributed Spark trainer vs the
independent pure-Python mirror (tests/oracle.py), plus encode
round-trip — the fixture-generation parity this operator's driver
oracle (bpe1) relies on.
"""

from __future__ import annotations

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from gemproc2caom2_spark.operators.bpe import (
    EOW,
    encode_bpe,
    train_bpe,
    word_frequencies,
)
from tests.oracle import bpe_train_python, bpe_word_freq_python


@pytest.fixture(scope="module")
def toy(spark):
    rows = [
        (0, "low low low low low lower lower"),
        (1, "newest newest newest newest newest newest"),
        (2, "widest widest widest"),
        (3, None),
        (4, "   "),
        (5, "\ttab-led line\nwith newlines\n"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_word_frequencies_parity(toy):
    got = {r.word: r.freq for r in word_frequencies(toy).collect()}
    texts = [r.text for r in toy.select("text").collect()]
    assert got == bpe_word_freq_python(texts)


def test_train_matches_python_mirror_toy(toy):
    texts = [r.text for r in toy.select("text").collect()]
    expect = bpe_train_python(bpe_word_freq_python(texts), num_merges=20)
    # both execution paths of the hybrid: driver-local loop (default
    # threshold) and the forced distributed loop (threshold=0)
    got_local = train_bpe(toy, num_merges=20)
    got_dist = train_bpe(toy, num_merges=20, driver_vocab_threshold=0)
    assert got_local == expect
    assert got_dist == expect
    # classic Sennrich example head: ('e','s') then ('es','t</w>')
    assert got_local[0][1:3] == ("e", "s")
    assert got_local[1][1:3] == ("es", "t" + EOW)


def test_train_matches_python_mirror_corpus(spark, sf_dir):
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    texts = pq.read_table(f"{sf_dir}/documents.parquet", columns=["text"])[
        "text"
    ].to_pylist()
    expect = bpe_train_python(bpe_word_freq_python(texts), num_merges=40)
    assert train_bpe(d, num_merges=40) == expect
    # the distributed loop derives the identical merge list
    assert train_bpe(d, num_merges=40, driver_vocab_threshold=0) == expect


def test_early_stop_when_no_repeating_pair(spark):
    df = spark.createDataFrame([(0, "ab cd ef")], "doc_id long, text string")
    assert train_bpe(df, num_merges=10, min_pair_freq=2) == []


def test_encode_roundtrip_and_greedy_rank(toy):
    merges = train_bpe(toy, num_merges=20)
    out = encode_bpe(toy, merges).select("text", "bpe_tokens").collect()
    for r in out:
        if r.text is None:
            assert r.bpe_tokens is None
            continue
        # rebuild: tokens concatenated per word (EOW marks boundaries)
        # must equal the tokenizer's view of the text
        rebuilt = "".join(r.bpe_tokens).replace(EOW, " ").split()
        expect = [w for w in r.text.strip(" ").lower().split() if w != ""]
        assert rebuilt == expect
    # a fully-merged frequent word collapses to a single token
    enc = {r.text: r.bpe_tokens for r in out}
    assert "newest" + EOW in enc[
        "newest newest newest newest newest newest"
    ]
