"""Deterministic synthetic web-page corpus (the fixture generator).

The reference tests against a small set of hand-curated inputs with
per-branch coverage (3 .fits.header fixtures covering OBJECT / FLAT /
ARC / moving-target branches,
/root/reference/gemProc2caom2/tests/data/, branch dispatch at
preview_augmentation.py:96-122). This module generates the web analog:
a seeded corpus over the exact ``input_hint`` schema

    (url string, warc_ts timestamp, html binary, text string, lang string)

with every verdict branch represented (see CATEGORIES). Same seed ->
byte-identical corpus, at any scale — used for golden tests (n~60) and
for the two-parallelism-level scaling benchmark (n~50k+). No external
data.

Host names are zipf-skewed: a few hot hosts exercise the salted
partitioning exactly like a real crawl would.
"""

from __future__ import annotations

import random
from datetime import datetime, timedelta, timezone

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

INPUT_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("warc_ts", T.TimestampType(), True),
        T.StructField("html", T.BinaryType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("lang", T.StringType(), True),
    ]
)

# vocabulary for fluent English (overlaps the perplexity seed corpus's
# letter statistics, so clean docs score low)
_EN_WORDS = (
    "the quick brown fox jumps over lazy dog a web page usually contains "
    "title and several paragraphs of prose with links to other pages high "
    "quality documents are written in complete sentences that read well "
    "data pipelines filter rows join keys and write results back to storage "
    "language models assign low perplexity to fluent natural text"
).split()

_DE_WORDS = (
    "der die und das nicht ist ein mit seite enthält mehrere absätze von "
    "text die qualität der dokumente ist wichtig für das training"
).split()

_FR_WORDS = (
    "le les des est une dans que pour page contient plusieurs paragraphes "
    "de texte la qualité des documents est importante pour le filtrage"
).split()

_ES_WORDS = (
    "los las por una para con del texto página contiene varios párrafos "
    "la calidad de los documentos es importante para el filtrado"
).split()

_ZH_CHARS = "网页包含多个段落文字质量对训练很重要语言模型给流利的文本打低分数据管道读取表格过滤行连接键写回存储"

CATEGORIES = (
    "clean_en",        # keep
    "clean_en_pii",    # keep, scrubbed (emails/phones/profanity)
    "non_english",     # drop: langid
    "cjk",             # drop: langid (zh)
    "gibberish",       # drop: perplexity (or rare_chars)
    "too_short",       # drop: min_length
    "too_long",        # drop: max_length
    "symbol_heavy",    # drop: symbol_ratio
    "repeated_lines",  # drop: repeated_lines
    "placeholder",     # drop: placeholder (lorem ipsum sentinel)
    "near_dup_a",      # keep (canonical of a near-dup pair)
    "near_dup_b",      # drop: duplicate (LSH catches the pair)
    "null_text_html",  # text null -> extracted from html
    "empty_html",      # drop: empty (null text + empty html)
    "invalid_utf8",    # html has invalid bytes; extraction replaces
)

_HOT_HOSTS = ["big-portal.example", "news-hub.example", "mega-forum.example"]


def _host(rng: random.Random, i: int) -> str:
    # zipf-ish: ~40% of docs on 3 hot hosts
    if rng.random() < 0.4:
        return _HOT_HOSTS[i % len(_HOT_HOSTS)]
    return f"site-{rng.randrange(500):03d}.example"


def _sentence(rng: random.Random, words: list[str], n: int) -> str:
    toks = [rng.choice(words) for _ in range(n)]
    s = " ".join(toks)
    return s[0].upper() + s[1:] + "."


def _paragraphs(rng: random.Random, words: list[str], n_sent: int) -> str:
    sents = [_sentence(rng, words, rng.randrange(8, 18)) for _ in range(n_sent)]
    lines, cur = [], []
    for s in sents:
        cur.append(s)
        if len(cur) >= 3:
            lines.append(" ".join(cur))
            cur = []
    if cur:
        lines.append(" ".join(cur))
    return "\n".join(lines)


def _gen_text(rng: random.Random, category: str, i: int) -> str | None:
    if category in ("clean_en", "near_dup_a", "null_text_html"):
        return _paragraphs(rng, _EN_WORDS, rng.randrange(10, 25))
    if category == "clean_en_pii":
        base = _paragraphs(rng, _EN_WORDS, 12)
        return (
            base
            + f"\nContact us at user{i}@example.com or call +1-555-123-{4000 + i % 1000:04d}."
            + "\nWhat the hell is a damn disclaimer anyway."
        )
    if category == "non_english":
        words = [_DE_WORDS, _FR_WORDS, _ES_WORDS][i % 3]
        return _paragraphs(rng, words, rng.randrange(10, 20))
    if category == "cjk":
        # short runs separated by spaces so whitespace tokenization sees
        # enough "words" and the LANGID gate (zh) is the one that fires
        chunks = [
            "".join(rng.choice(_ZH_CHARS) for _ in range(rng.randrange(4, 9)))
            for _ in range(rng.randrange(30, 50))
        ]
        return " ".join(chunks)
    if category == "gibberish":
        # stopwords injected so langid says 'en' and the PERPLEXITY gate
        # is the one that fires (per-branch coverage, FIXTURES.md §1)
        alphabet = "abcdefghijklmnopqrstuvwxyz"
        toks = []
        for j in range(rng.randrange(60, 100)):
            if j % 6 == 0:
                toks.append(rng.choice(["the", "and", "of", "is", "that", "with"]))
            else:
                toks.append(
                    "".join(rng.choice(alphabet) for _ in range(rng.randrange(4, 12)))
                )
        return " ".join(toks)
    if category == "too_short":
        return "Tiny page."
    if category == "too_long":
        return _paragraphs(rng, _EN_WORDS, 30) * 100  # ~220KB: over max_doc_len
    if category == "symbol_heavy":
        base = _sentence(rng, _EN_WORDS, 30)
        junk = "".join(rng.choice("@#$%^&*<>{}[]|\\~`") for _ in range(len(base)))
        return base + " " + junk
    if category == "repeated_lines":
        line = _sentence(rng, _EN_WORDS, 10)
        uniq = [_sentence(rng, _EN_WORDS, 10) for _ in range(3)]
        return "\n".join(uniq + [line] * 12)
    if category == "placeholder":
        return "Lorem ipsum dolor sit amet. " * 20
    if category == "near_dup_b":
        return None  # filled from its near_dup_a partner
    if category in ("empty_html", "invalid_utf8"):
        return None
    return None


def _wrap_html(text: str | None, title: str) -> bytes | None:
    if text is None:
        return None
    body = "\n".join(f"<p>{line}</p>" for line in text.split("\n"))
    page = (
        f"<html><head><title>{title}</title>"
        "<script>var x = 1;</script><style>.a{color:red}</style></head>"
        "<body><nav>Home</nav><div>Menu</div>\n"
        f"{body}\n"
        "<footer>Privacy Policy</footer><footer>All rights reserved</footer>"
        "</body></html>"
    )
    return page.encode("utf-8")


def generate_pandas(n_docs: int = 60, seed: int = 42, offset: int = 0) -> pd.DataFrame:
    """Deterministic corpus as a pandas frame (driver-side; for golden
    fixtures and createDataFrame). Row i's category = CATEGORIES[i %
    len], so every branch appears >= 3x once n_docs >= 45. ``offset``
    shifts doc numbering (unique urls across generation batches)."""
    rng = random.Random(seed + offset)
    t0 = datetime(2025, 7, 1, tzinfo=timezone.utc)
    rows = []
    pending_dup: str | None = None
    for i in range(offset, offset + n_docs):
        category = CATEGORIES[i % len(CATEGORIES)]
        host = _host(rng, i)
        url = f"https://{host}/page/{i:06d}"
        ts = t0 + timedelta(seconds=i * 37)
        if category == "near_dup_a":
            text = _gen_text(rng, category, i)
            pending_dup = text
        elif category == "near_dup_b" and pending_dup is not None:
            words = pending_dup.split(" ")
            # perturb ~2% of words -> jaccard stays high
            for j in range(0, len(words), 50):
                words[j] = "changed"
            text = " ".join(words)
        else:
            text = _gen_text(rng, category, i)

        if category == "null_text_html":
            html = _wrap_html(text, f"Doc {i}")
            text_col = None
        elif category == "empty_html":
            html, text_col = b"", None
        elif category == "invalid_utf8":
            html = (
                b"<html><body><p>Broken \xff\xfe bytes and emoji \xf0\x9f\x98\x80 "
                b"plus \xe4\xb8\xad\xe6\x96\x87 text that keeps going on about "
                b"the data and the web and the page and the text of the filter "
                b"and the model and the join and the storage system for a while "
                b"so that it is long enough to pass the minimum length and word "
                b"count rules that the verdict stage applies to every document "
                b"in the corpus with normal punctuation and spacing."
                b"</p></body></html>"
            )
            text_col = None
        else:
            html = _wrap_html(text, f"Doc {i}")
            text_col = text

        claimed_lang = {
            "non_english": ["de", "fr", "es"][i % 3],
            "cjk": "zh",
        }.get(category, "en" if rng.random() > 0.1 else None)
        rows.append((url, ts, html, text_col, claimed_lang, category))
    pdf = pd.DataFrame(
        rows, columns=["url", "warc_ts", "html", "text", "lang", "category"]
    )
    return pdf


def generate_corpus(
    spark: SparkSession, n_docs: int = 60, seed: int = 42, with_category: bool = False
) -> DataFrame:
    pdf = generate_pandas(n_docs, seed)
    if not with_category:
        pdf = pdf.drop(columns=["category"])
        return spark.createDataFrame(pdf, schema=INPUT_SCHEMA)
    schema = T.StructType(
        INPUT_SCHEMA.fields + [T.StructField("category", T.StringType())]
    )
    return spark.createDataFrame(pdf, schema=schema)


def write_corpus_parquet(
    path: str, n_docs: int, seed: int = 42, n_files: int = 64,
) -> None:
    """Write a large deterministic corpus for benchmarks (pure pyarrow,
    no SparkSession needed) as a DIRECTORY of ``n_files`` parquet files.

    Many files, not one: Spark splits parquet inputs by byte ranges of
    at most spark.sql.files.maxPartitionBytes — a single 55 MB file is
    ONE input split, serializing every pre-shuffle stage onto one core.
    Real crawl dumps arrive as thousands of files; the bench input must
    have the same shape.
    """
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    # micros, not pyarrow's default nanos: Spark rejects TIMESTAMP(NANOS)
    schema = pa.schema(
        [
            pa.field("url", pa.string(), False),
            pa.field("warc_ts", pa.timestamp("us", tz="UTC")),
            pa.field("html", pa.binary()),
            pa.field("text", pa.string()),
            pa.field("lang", pa.string()),
        ]
    )
    os.makedirs(path, exist_ok=True)
    per_file = max(1, (n_docs + n_files - 1) // n_files)
    file_idx = 0
    for start in range(0, n_docs, per_file):
        n = min(per_file, n_docs - start)
        pdf = generate_pandas(n, seed=seed, offset=start).drop(columns=["category"])
        tbl = pa.Table.from_pandas(pdf, preserve_index=False).cast(schema)
        pq.write_table(tbl, os.path.join(path, f"part-{file_idx:05d}.parquet"))
        file_idx += 1
