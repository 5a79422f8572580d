"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard.

New capability with no reference analog (the reference's only dedup is
set-typed accumulation, TypedSet at
/root/reference/gemProc2caom2/provenance_augmentation.py:112-135); the
design constraint comes from the survey's scale analysis: band-bucketed
groupBy with per-bucket caps, NEVER a pairwise cartesian across the
corpus.

Shuffle budget per operator (the thing that matters at 10^12 rows):
- exact:        1 shuffle (groupBy fingerprint).
- minhash LSH:  signature map-side (UDF or Column exprs), explode bands,
                1 shuffle (window over band buckets) + 1 shuffle
                (groupBy url) — no join, no pairs.
- simhash:      map-side signature; candidate pairing via band buckets
                like minhash.
- ngram-jaccard: explode shingles, self-join on shingle with a
                document-frequency cap so a stop-shingle cannot create
                a quadratic bucket.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, LongType

from gemproc2caom2_spark.functions.hashing import (
    MERSENNE_61,
    hex15_hash,
    minhash_signature_sql,
)
from gemproc2caom2_spark.functions.text import word_shingles

# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------


def normalized_fingerprint(text: Column | str) -> Column:
    """md5 of lowercased, whitespace-collapsed text — the exact-dup key.
    md5 (not xxhash64) so external SQL oracles reproduce it exactly."""
    c = F.col(text) if isinstance(text, str) else text
    return F.md5(F.lower(F.regexp_replace(F.trim(c), r"\s+", " ")))


def mark_exact_duplicates(
    df: DataFrame, key_col: str, text_col: str, out_col: str = "is_exact_dup"
) -> DataFrame:
    """Keep the row with the smallest key per fingerprint group; flag the
    rest. One shuffle (window over fingerprint)."""
    fp = normalized_fingerprint(text_col)
    w = Window.partitionBy("_fp")
    return (
        df.withColumn("_fp", fp)
        .withColumn(out_col, F.col(key_col) > F.min(key_col).over(w))
        .drop("_fp")
    )


# ---------------------------------------------------------------------------
# minhash signatures
# ---------------------------------------------------------------------------

_PERM_CACHE: dict[int, tuple[np.ndarray, np.ndarray]] = {}


def _perm_params(num_perms: int) -> tuple[np.ndarray, np.ndarray]:
    """Deterministic (a, b) universal-hash parameters, matching
    functions.hashing.minhash_perm exactly (shared constants)."""
    if num_perms not in _PERM_CACHE:
        # Python-int math (arbitrary precision), then down to int64 —
        # identical to the constants in functions.hashing.minhash_perm.
        a = np.array(
            [(2 * i + 1) * 0x9E3779B97F4A7C15 % MERSENNE_61 % ((1 << 31) - 1)
             for i in range(num_perms)],
            dtype=np.int64,
        )
        b = np.array(
            [(i * 0xC2B2AE3D27D4EB4F + 0x165667B19E3779F9) % MERSENNE_61
             for i in range(num_perms)],
            dtype=np.int64,
        )
        _PERM_CACHE[num_perms] = (a, b)
    return _PERM_CACHE[num_perms]


def make_minhash_udf(num_perms: int = 128, shingle_k: int = 3):
    """Scale-path signature kernel: numpy over Arrow batches.

    Input: array<bigint> of shingle hashes (computed JVM-side by
    xxhash64 so the UDF only does the permutation math — the Python
    boundary carries longs, not strings).
    Output: array<bigint> signature, empty input -> null.
    """
    a, b = _perm_params(num_perms)
    p = np.int64(MERSENNE_61)
    m31 = np.int64((1 << 31) - 1)

    @F.pandas_udf(ArrayType(LongType()))
    def _sig(hashes: pd.Series) -> pd.Series:
        out = []
        for arr in hashes:
            if arr is None or len(arr) == 0:
                out.append(None)
                continue
            # np.mod on int64 matches Spark's pmod (sign of divisor);
            # after folding to 31 bits, h*a <= 2^62 + b < 2^63: no overflow
            h = np.mod(np.mod(np.asarray(arr, dtype=np.int64), p), m31)
            perm = (h[:, None] * a[None, :] + b[None, :]) % p
            out.append(perm.min(axis=0))
        return pd.Series(out, dtype="object")

    return _sig


def shingle_hashes_expr(text: Column | str, k: int = 3) -> Column:
    """Distinct xxhash64 hashes of word k-gram shingles (JVM-side)."""
    return F.transform(
        F.array_distinct(word_shingles(text, k)), lambda s: F.xxhash64(s)
    )


def with_minhash_signature(
    df: DataFrame,
    text_col: str = "text_extracted",
    out_col: str = "minhash_sig",
    num_perms: int = 128,
    shingle_k: int = 3,
    use_udf: bool = True,
) -> DataFrame:
    """Add array<bigint> minhash signature. use_udf=True is the numpy
    Arrow path (default; vectorized perms matrix); False composes
    built-in higher-order functions only — same values either way
    (pinned by tests)."""
    hashes = shingle_hashes_expr(text_col, shingle_k)
    if use_udf:
        sig = make_minhash_udf(num_perms, shingle_k)(hashes)
    else:
        sig = F.when(
            F.size(hashes) > 0, minhash_signature_sql(hashes, num_perms)
        )
    return df.withColumn(out_col, sig)


# ---------------------------------------------------------------------------
# LSH band marking
# ---------------------------------------------------------------------------


def band_keys_expr(sig: Column | str, bands: int, rows_per_band: int) -> Column:
    """array<bigint> of per-band bucket keys: xxhash64 of the
    ','-joined band slice (band index baked in so bands don't collide)."""
    s = F.col(sig) if isinstance(sig, str) else sig
    return F.transform(
        F.sequence(F.lit(0), F.lit(bands - 1)),
        lambda b: F.xxhash64(
            F.concat_ws(
                ",",
                F.transform(
                    F.slice(s, b * rows_per_band + 1, rows_per_band),
                    lambda x: x.cast("string"),
                ),
            ),
            b,
        ),
    )


def mark_lsh_duplicates(
    df: DataFrame,
    key_col: str = "url_hash",
    sig_col: str = "minhash_sig",
    bands: int = 16,
    rows_per_band: int = 8,
    out_col: str = "is_duplicate",
) -> DataFrame:
    """Flag docs that share any LSH band bucket with a smaller-keyed doc.

    No pairs are ever materialized: a window-min per (band, bucket),
    then a groupBy per key. Keeps exactly one representative (the min
    key) per near-dup cluster component discovered through shared
    buckets.
    """
    other_cols = [c for c in df.columns]
    exploded = (
        df.select(key_col, sig_col)
        .where(F.col(sig_col).isNotNull())
        .select(
            key_col,
            F.posexplode(band_keys_expr(sig_col, bands, rows_per_band)).alias(
                "_band", "_bucket"
            ),
        )
    )
    w = Window.partitionBy("_band", "_bucket")
    dup_flags = (
        exploded.withColumn("_min_key", F.min(key_col).over(w))
        .groupBy(key_col)
        .agg(F.max(F.col("_min_key") < F.col(key_col)).alias(out_col))
    )
    return df.join(dup_flags, on=key_col, how="left").select(
        *other_cols, F.coalesce(F.col(out_col), F.lit(False)).alias(out_col)
    )


# ---------------------------------------------------------------------------
# simhash
# ---------------------------------------------------------------------------


def make_simhash_udf(bits: int = 60):
    """numpy simhash over pre-hashed word arrays (array<bigint> in,
    bigint out). Bit b of the result = 1 iff the sum of ±1 votes from
    each word's bit b is >= 0. 60 bits so the value is reproducible from
    hex15 hashes in external SQL."""
    nbits = bits

    @F.pandas_udf(LongType())
    def _simhash(hashes: pd.Series) -> pd.Series:
        out = np.full(len(hashes), np.nan, dtype="object")
        for i, arr in enumerate(hashes):
            if arr is None or len(arr) == 0:
                out[i] = None
                continue
            h = np.asarray(arr, dtype=np.uint64)
            bitmat = (h[:, None] >> np.arange(nbits, dtype=np.uint64)[None, :]) & np.uint64(1)
            votes = np.where(bitmat == 1, 1, -1).sum(axis=0)
            val = np.uint64(0)
            for b in range(nbits):
                if votes[b] >= 0:
                    val |= np.uint64(1) << np.uint64(b)
            out[i] = int(val)
        return pd.Series(out, dtype="object")

    return _simhash


def word_hex15_hashes_expr(text: Column | str) -> Column:
    """Per-word 60-bit md5 hashes (duplicates kept: simhash weights by
    term frequency)."""
    from gemproc2caom2_spark.functions.text import words

    return F.transform(
        words(F.lower(F.col(text) if isinstance(text, str) else text)), hex15_hash
    )


def with_simhash(
    df: DataFrame, text_col: str = "text_extracted", out_col: str = "simhash"
) -> DataFrame:
    return df.withColumn(out_col, make_simhash_udf()(word_hex15_hashes_expr(text_col)))


# ---------------------------------------------------------------------------
# n-gram Jaccard pairs
# ---------------------------------------------------------------------------


def ngram_jaccard_pairs(
    df: DataFrame,
    key_col: str,
    text_col: str,
    k: int = 3,
    threshold: float = 0.5,
    max_doc_freq: int = 1000,
) -> DataFrame:
    """Near-duplicate pairs by exact word-k-gram Jaccard similarity.

    explode distinct shingles -> drop shingles whose document frequency
    exceeds ``max_doc_freq`` (stop-shingle cap: bounds the self-join
    bucket size, the never-a-cartesian rule) -> self-join on shingle
    with key1 < key2 -> intersection counts -> Jaccard.

    Returns (key1, key2, jaccard) with jaccard >= threshold.
    """
    sh = (
        df.select(
            F.col(key_col).alias("_k"),
            F.explode(F.array_distinct(word_shingles(text_col, k))).alias("_s"),
        )
    )
    sizes = sh.groupBy("_k").agg(F.count("*").alias("_n"))
    freq_ok = sh.groupBy("_s").agg(F.count("*").alias("_df")).where(
        F.col("_df") <= max_doc_freq
    )
    sh_capped = sh.join(freq_ok.select("_s"), "_s")
    pairs = (
        sh_capped.alias("a")
        .join(sh_capped.alias("b"), on="_s")
        .where(F.col("a._k") < F.col("b._k"))
        .groupBy(F.col("a._k").alias("key1"), F.col("b._k").alias("key2"))
        .agg(F.count("*").alias("_inter"))
    )
    return (
        pairs.join(sizes.withColumnRenamed("_k", "key1").withColumnRenamed("_n", "_n1"), "key1")
        .join(sizes.withColumnRenamed("_k", "key2").withColumnRenamed("_n", "_n2"), "key2")
        .withColumn(
            "jaccard", F.col("_inter") / (F.col("_n1") + F.col("_n2") - F.col("_inter"))
        )
        .where(F.col("jaccard") >= threshold)
        .select("key1", "key2", F.round("jaccard", 6).alias("jaccard"))
    )
