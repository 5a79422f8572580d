"""A/B microbenchmark for the langid and scrub kernel variants.

Usage: python scripts/kernel_ab.py [n_docs] [cores]

Times each variant over the deterministic bench corpus with a cheap
consuming aggregate (sum of lengths / verdict counts) so the kernel
dominates; min of N reps, all reps printed. Also asserts the variants
agree row-for-row before timing (a fast A/B must still be the same
function).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from gemproc2caom2_spark.functions.langid import langid_expr, LANG_PROFILES, CJK_RE
from gemproc2caom2_spark.functions.scrub import scrub_expr, scrub_expr_ungated
from gemproc2caom2_spark.operators.heuristics import LANGID_CAP
from gemproc2caom2_spark.session import build_session
from gemproc2caom2_spark.sources.datagen import write_corpus_parquet


def langid_union(text, min_hits: int = 2):
    """Single-scan candidate (measured 44% SLOWER than langid_expr's
    five-scan shape at the 2 KB prefix — per-match allocation dominates;
    kept here for re-measurement if LANGID_CAP ever grows)."""
    union_pat = (
        r"\b(?:"
        + "|".join(w for sw in LANG_PROFILES.values() for w in sw)
        + r")\b|"
        + CJK_RE
    )
    t_lc = F.array_join(
        F.regexp_extract_all(
            F.lower(F.coalesce(text, F.lit(""))), F.lit(union_pat), F.lit(0)
        ),
        " ",
    )
    cjk_hits = F.regexp_count(t_lc, F.lit(CJK_RE))
    scores = F.array(
        *[
            F.struct(
                F.regexp_count(
                    t_lc, F.lit(r"\b(?:" + "|".join(sw) + r")\b")
                ).alias("s"),
                F.lit(-i).alias("ni"),
                F.lit(lang).alias("l"),
            )
            for i, (lang, sw) in enumerate(LANG_PROFILES.items())
        ]
    )
    best = F.array_max(scores)
    best_lang = F.when(best.getField("s") >= min_hits, best.getField("l")).otherwise(
        F.lit("und")
    )
    return F.when(cjk_hits >= 5, F.lit("zh")).otherwise(best_lang)


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 24000
    cores = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    reps = int(os.environ.get("AB_REPS", "3"))
    path = f"/tmp/gemproc_bench_corpus_{n_docs}"
    if not os.path.exists(path):
        write_corpus_parquet(path, n_docs)

    spark = build_session(master=f"local[{cores}]", shuffle_partitions=2 * cores)
    df = spark.read.parquet(path).select(
        F.coalesce("text", F.lit("")).alias("text")
    )
    df = df.persist()
    df.count()

    prefix = F.substring(F.col("text"), 1, LANGID_CAP)

    variants = {
        "langid_multiscan": lambda: df.select(
            langid_expr(prefix).alias("l")
        ).groupBy("l").count(),
        "langid_union": lambda: df.select(
            langid_union(prefix).alias("l")
        ).groupBy("l").count(),
        "scrub_ungated": lambda: df.select(
            F.sum(F.length(scrub_expr_ungated(F.col("text")))).alias("s")
        ),
        "scrub_gated": lambda: df.select(
            F.sum(F.length(scrub_expr(F.col("text")))).alias("s")
        ),
    }

    # equivalence gates before timing
    mism = df.select(
        langid_union(prefix).alias("a"), langid_expr(prefix).alias("b")
    ).where("a <> b").count()
    assert mism == 0, f"langid variants disagree on {mism} rows"
    mism = df.select(
        scrub_expr_ungated(F.col("text")).alias("a"),
        scrub_expr(F.col("text")).alias("b"),
    ).where("a <> b").count()
    assert mism == 0, f"scrub variants disagree on {mism} rows"
    print("equivalence: OK")

    for name, fn in variants.items():
        fn().collect()  # warm
        times = []
        for _ in range(reps):
            t0 = time.monotonic()
            fn().collect()
            times.append(round(time.monotonic() - t0, 3))
        print(f"{name:20s} min={min(times):7.3f}  reps={times}")
    spark.stop()


if __name__ == "__main__":
    main()
