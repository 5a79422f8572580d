"""Corpus-level blocklist filtering — domain blocklist + lexicon filter.

Web-pipeline stage every production corpus runs before any expensive
kernel (C4 drops pages from a host blocklist and pages containing any
"bad word"; RefinedWeb/FineWeb keep URL-level blocklists of millions of
hosts). Reinterpreted from the reference's known-bad suppression: a
rejected-name table consulted before processing
(/root/reference/gemProc2caom2/composable.py:119-133) — here the
"names" are domains, and the text-lexicon gate is the same V4 drop-rule
shape (main_app.py:221-224) driven by a broadcast dimension instead of
per-file metadata.

Scale shape: the domain blocklist is a DIMENSION table (even 10M hosts
is ~500 MB of strings — broadcastable after dedup to a hash set; at
that extreme, switch the hint off and let AQE pick), so the flag is a
broadcast LEFT join with no corpus shuffle. The lexicon gate compiles
to ONE JVM regex pass per document (word-boundary alternation, rlike,
whole-stage codegen) — no explode, no per-word scans, no Python. Both
gates are map-side: this operator adds ZERO shuffles to a 100 TB scan,
which is exactly why production pipelines order it first.
"""

from __future__ import annotations

import re
from typing import Iterable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def badword_pattern(words: Iterable[str]) -> str:
    """Word-boundary alternation over the lexicon, case-insensitive.

    One regex instead of N contains() passes: the JVM regex engine
    scans each document once regardless of lexicon size. Words are
    regex-escaped so lexicon entries are always literals.
    """
    alts = "|".join(sorted(re.escape(w.lower()) for w in words))
    return rf"(?i)\b({alts})\b"


def blocklist_filter(
    df: DataFrame,
    blocked_domains: DataFrame | Iterable[str],
    badwords: Iterable[str],
    domain_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Flag documents from blocked domains or containing lexicon words.

    Adds three columns:
      ``blocked_domain`` — domain appears in the blocklist (broadcast
        left-join flag; null-domain docs are NOT blocked),
      ``has_badword``    — text matches the word-boundary lexicon regex,
      ``keep``           — neither gate fired.

    Rows are flagged, not dropped, so the caller can audit the verdict
    split (the reference's keep/drop-with-reason contract, V4) before
    filtering on ``keep``.
    """
    if not isinstance(blocked_domains, DataFrame):
        spark = SparkSession.getActiveSession() or df.sparkSession
        blocked_domains = spark.createDataFrame(
            [(d,) for d in sorted(set(blocked_domains))], f"{domain_col} string"
        )
    dim = (
        blocked_domains.select(F.col(domain_col).alias("_blk_domain"))
        .distinct()
        .withColumn("_blk", F.lit(True))
    )
    flagged = (
        df.join(
            F.broadcast(dim),
            on=df[domain_col] == dim["_blk_domain"],
            how="left",
        )
        .drop("_blk_domain")
        .withColumn("blocked_domain", F.coalesce(F.col("_blk"), F.lit(False)))
        .drop("_blk")
    )
    pat = badword_pattern(badwords)
    flagged = flagged.withColumn(
        "has_badword", F.coalesce(F.col(text_col).rlike(pat), F.lit(False))
    )
    return flagged.withColumn(
        "keep", ~F.col("blocked_domain") & ~F.col("has_badword")
    )
