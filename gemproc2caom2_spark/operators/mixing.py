"""Dataset mixing — deterministic per-domain quota sampling.

Training mixtures cap each source/domain's contribution (C4 caps hosts,
Gopher re-weights subsets, Llama mixes by source proportion). The quota
selector keeps the first ``quota`` documents per group under a
DETERMINISTIC pseudo-random order (md5 of the doc id) so reruns,
resumes and the SQL oracle all select the identical subset — the
reference's todo-list determinism requirement applied to sampling.

Scale shape: one row_number window per group. A window sorts each
group on one task, so a hot domain is the straggler bound — for
quota << group size the right production shape is this window AFTER a
cheap pre-filter (e.g. keep=true only), which this operator composes
with; the alternative min_by-array fold materializes quota rows per
group in one struct and loses to the window beyond small quotas.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def domain_quota(
    df: DataFrame,
    group_col: str = "source",
    id_col: str = "doc_id",
    quota: int = 100,
) -> DataFrame:
    """Keep at most ``quota`` docs per ``group_col``, selected by the
    deterministic md5-of-id order (uniform over insertion order,
    engine-independent). Adds ``sample_rank`` (1-based within group)."""
    order = F.md5(F.col(id_col).cast("string"))
    w = Window.partitionBy(group_col).orderBy(order)
    return (
        df.withColumn("sample_rank", F.row_number().over(w))
        .where(F.col("sample_rank") <= quota)
    )


def sequence_packing(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    group_col: str = "source",
    budget: int = 2048,
) -> DataFrame:
    """Assign documents to token-budget training sequences — the
    pretraining 'pack short docs together' step, doc boundaries
    respected: within each group (shard), docs are taken in the
    deterministic md5-of-id order and ``seq_id`` is the budget-window
    index of the doc's START position in the group's concatenated token
    stream (exclusive prefix-sum of token counts, integer-divided by
    the budget). Consequences a consumer must size for: docs sharing a
    seq_id total at most budget-1 tokens PLUS the full length of the
    window's last-started doc (which may itself exceed the budget and
    span windows whose ids then hold no other docs). Returns
    (id, group, n_tokens, seq_id).

    Deterministic by construction — reruns, resumes and the SQL oracle
    assign identical sequences (the todo-list determinism requirement
    applied to batch assembly). Scale shape: one running-sum window per
    group — groups are shards you choose (host, source, bucket-of-hash),
    so per-group volume is bounded by the sharding, exactly the
    domain_quota note above.
    """
    from gemproc2caom2_spark.functions.text import token_count_ws

    tok = token_count_ws(F.col(text_col))
    order = F.md5(F.col(id_col).cast("string"))
    w = (
        Window.partitionBy(group_col)
        .orderBy(order)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum_excl = F.coalesce(F.sum(tok).over(w), F.lit(0).cast("long"))
    # exact long division (DIV), not floor(double /): doubles lose
    # integer exactness past 2^53, which a 10^12-doc group's cumulative
    # token sum can reach
    return df.where(F.col(text_col).isNotNull()).select(
        F.col(id_col),
        F.col(group_col),
        tok.alias("n_tokens"),
        cum_excl.alias("_ce"),
    ).select(
        id_col,
        group_col,
        "n_tokens",
        F.expr(f"_ce DIV {int(budget)}").cast("bigint").alias("seq_id"),
    )
