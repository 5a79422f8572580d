"""Benchmark decontamination — n-gram collision against a held-out set.

Training corpora must not contain evaluation data: the standard check
(GPT-3 appendix C, PaLM, Llama) flags any training document sharing a
k-word shingle with a benchmark document. This is the reference's
known-bad-list suppression (rejected.yml, config.yml:58-62) generalized
from exact ids to content n-grams.

Scale shape: the benchmark side is small (benchmarks are thousands of
documents — a dimension table), so its DISTINCT shingle hashes
broadcast; the corpus side explodes its per-doc distinct shingles and
LEFT SEMI joins — no pair materialization, no shuffle of the corpus
beyond the explode, and the hit set folds back as a thin (id) frame.
Shingles travel as 60-bit hex15 hashes (SQL-replicable), never strings.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from gemproc2caom2_spark.functions.hashing import hex15_hash
from gemproc2caom2_spark.functions.text import word_shingles


def _shingle_hashes(
    df: DataFrame, text_col: str, id_col: str, k: int
) -> DataFrame:
    return (
        df.where(F.col(text_col).isNotNull())
        .select(
            F.col(id_col),
            F.explode(F.array_distinct(word_shingles(F.col(text_col), k))).alias(
                "_sh"
            ),
        )
        .select(id_col, hex15_hash("_sh").alias("_shh"))
    )


def mark_contaminated(
    corpus: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 8,
) -> DataFrame:
    """Append ``contaminated`` (bool): true iff the doc shares at least
    one k-word shingle (lowercased, whitespace-tokenized) with any
    benchmark document. Docs with null text or fewer than ``k`` words
    have no shingles and are never flagged."""
    bench_hashes = (
        _shingle_hashes(benchmark, text_col, id_col, k).select("_shh").distinct()
    )
    hits = (
        _shingle_hashes(corpus, text_col, id_col, k)
        .join(F.broadcast(bench_hashes), on="_shh", how="left_semi")
        .select(id_col)
        .distinct()
        .withColumn("_contam", F.lit(True))
    )
    return (
        corpus.join(hits, on=id_col, how="left")
        .withColumn("contaminated", F.coalesce(F.col("_contam"), F.lit(False)))
        .drop("_contam")
    )
