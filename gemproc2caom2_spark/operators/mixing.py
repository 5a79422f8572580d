"""Dataset mixing — deterministic per-domain quota sampling.

Training mixtures cap each source/domain's contribution (C4 caps hosts,
Gopher re-weights subsets, Llama mixes by source proportion). The quota
selector keeps the first ``quota`` documents per group under a
DETERMINISTIC pseudo-random order (md5 of the doc id) so reruns,
resumes and the SQL oracle all select the identical subset — the
reference's todo-list determinism requirement applied to sampling.

Scale shape: one row_number window per group. A window sorts each
group on one task, so a hot domain is the straggler bound — either
compose AFTER a cheap pre-filter (e.g. keep=true only), or pass
``shards_per_group`` > 1: the group salts into B deterministic
sub-shards (md5-of-id derived, so still rerun/oracle-stable), each
windowed on its own task, and the quota/budget splits across shards.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _shard_of(id_col: str, shards: int) -> Column:
    """Deterministic sub-shard of a doc id: first 8 hex chars of the
    SAME md5 that orders the sample, mod B — engine-independent and
    independent of the order rank (different hex ranges)."""
    return F.conv(
        F.substring(F.md5(F.col(id_col).cast("string")), 25, 8), 16, 10
    ).cast("bigint") % shards


def domain_quota(
    df: DataFrame,
    group_col: str = "source",
    id_col: str = "doc_id",
    quota: int = 100,
    shards_per_group: int = 1,
) -> DataFrame:
    """Keep at most ``quota`` docs per ``group_col``, selected by the
    deterministic md5-of-id order (uniform over insertion order,
    engine-independent). Adds ``sample_rank`` (1-based within group).

    ``shards_per_group`` = B > 1 bounds the per-task sort for hot
    groups: each group salts into B md5-derived sub-shards, shard s
    keeps ``quota DIV B`` (+1 for s < quota mod B) rows — exactly
    ``quota`` total for groups with enough rows per shard. The SELECTED
    SUBSET differs from B=1 (it is a stratified variant of the same
    uniform order); B=1 is bit-identical to the unsharded operator, so
    oracles pin B=1 and the sharded path is covered by its own bound
    tests."""
    order = F.md5(F.col(id_col).cast("string"))
    if shards_per_group <= 1:
        w = Window.partitionBy(group_col).orderBy(order)
        return (
            df.withColumn("sample_rank", F.row_number().over(w))
            .where(F.col("sample_rank") <= quota)
        )
    b = shards_per_group
    shard = _shard_of(id_col, b)
    w = Window.partitionBy(group_col, "_shard").orderBy(order)
    shard_quota = F.lit(quota // b) + F.when(
        F.col("_shard") < quota % b, F.lit(1)
    ).otherwise(F.lit(0))
    return (
        df.withColumn("_shard", shard)
        .withColumn("sample_rank", F.row_number().over(w))
        .where(F.col("sample_rank") <= shard_quota)
        .drop("_shard")
    )


def sequence_packing(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    group_col: str = "source",
    budget: int = 2048,
    shards_per_group: int = 1,
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
    group — either pick groups that ARE shards (host, source,
    bucket-of-hash), or pass ``shards_per_group`` = B > 1: each group
    salts into B md5-derived sub-shards, each packed independently on
    its own task, and ``seq_id`` becomes ``local_seq * B + shard`` so
    ids stay disjoint across a group's shards (sequences never span
    shards — B=1 keeps the original single-stream ids and is
    bit-identical to the unsharded operator, which is what oracles
    pin).
    """
    from gemproc2caom2_spark.functions.text import token_count_ws

    tok = token_count_ws(F.col(text_col))
    order = F.md5(F.col(id_col).cast("string"))
    b = max(int(shards_per_group), 1)
    part = [group_col] if b == 1 else [group_col, "_shard"]
    w = (
        Window.partitionBy(*part)
        .orderBy(order)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum_excl = F.coalesce(F.sum(tok).over(w), F.lit(0).cast("long"))
    base = df.where(F.col(text_col).isNotNull())
    if b > 1:
        base = base.withColumn("_shard", _shard_of(id_col, b))
    # exact long division (DIV), not floor(double /): doubles lose
    # integer exactness past 2^53, which a 10^12-doc group's cumulative
    # token sum can reach
    local_seq = F.expr(f"_ce DIV {int(budget)}").cast("bigint")
    seq_id = (
        local_seq if b == 1 else local_seq * b + F.col("_shard").cast("bigint")
    )
    return base.select(
        F.col(id_col),
        F.col(group_col),
        tok.alias("n_tokens"),
        cum_excl.alias("_ce"),
        *([F.col("_shard")] if b > 1 else []),
    ).select(
        id_col,
        group_col,
        "n_tokens",
        seq_id.alias("seq_id"),
    )


def token_budget_selection(
    df: DataFrame,
    tokens_col: str,
    quality_col: str,
    group_col: str = "source",
    id_col: str = "doc_id",
    budget: int = 100_000,
    selected_col: str = "selected",
    shards_per_group: int = 1,
) -> DataFrame:
    """Select each group's best-quality documents up to a token budget —
    the 'take the top N tokens per source' step every mixture spec ends
    with (FineWeb/Dolma publish per-source token counts, not doc
    counts). Docs are taken in (quality DESC, id ASC) order; a doc is
    selected iff the tokens taken BEFORE it are under the budget, so
    the selection overshoots by at most the last doc's length (the same
    exclusive-prefix convention as ``sequence_packing``) and is a
    deterministic function of the input — reruns, resumes and the SQL
    oracle pick the identical subset.

    Adds ``cum_before`` (exclusive prefix sum, exact long arithmetic)
    and ``selected``. Scale shape: one running-sum window per group;
    for a hot group pass ``shards_per_group`` = B > 1 — md5-derived
    sub-shards each select against ``budget DIV B`` (+1 for the first
    ``budget mod B`` shards), bounding the per-task sort while keeping
    the total within one shard-doc of the budget; B=1 is bit-identical
    to the unsharded operator (what oracles pin)."""
    b = max(int(shards_per_group), 1)
    part = [group_col] if b == 1 else [group_col, "_shard"]
    w = (
        Window.partitionBy(*part)
        .orderBy(F.col(quality_col).desc(), F.col(id_col).asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    base = df if b == 1 else df.withColumn("_shard", _shard_of(id_col, b))
    shard_budget = (
        F.lit(int(budget))
        if b == 1
        else F.lit(budget // b)
        + (F.col("_shard") < budget % b).cast("long")
    )
    cum = F.coalesce(
        F.sum(F.col(tokens_col)).over(w), F.lit(0).cast("long")
    )
    return base.withColumn("cum_before", cum).withColumn(
        selected_col, F.col("cum_before") < shard_budget
    ).drop(*(["_shard"] if b > 1 else []))


def weighted_sample(
    df: DataFrame,
    rates: dict[str, float],
    group_col: str = "source",
    id_col: str = "doc_id",
    default_rate: float = 0.0,
) -> DataFrame:
    """Deterministic per-group Bernoulli sampling at mixture rates —
    the proportional counterpart of ``domain_quota``'s hard cap (Llama/
    Gopher-style source re-weighting: keep 100% of books, 3% of CC).

    A doc is kept iff ``hex15(md5-order-independent id hash) % 10^6 <
    rate * 10^6`` — a pure Column predicate, no RNG state, so reruns,
    resumes and SQL oracles select the identical subset and the sample
    composes with the todo-list checkpoint protocol. ``rates`` rides
    into the plan as a literal CASE chain (the broadcast-rule-table
    pattern: small config, inlined, JVM-evaluated; the reference's
    keyword->model maps, main_app.py:135-181).

    Scale shape: map-side only — no shuffle, no window; skew-immune
    because the predicate is per-row. Basis points are exact: a rate of
    0.031415 keeps ids whose hash residue < 31415 of 10^6.
    """
    from gemproc2caom2_spark.functions.hashing import hex15_hash

    # hash the ID (salted with a fixed tag so this draw is independent
    # of other hex15-of-id uses like the quota order)
    draw = hex15_hash(F.concat(F.lit("wsample:"), F.col(id_col).cast("string"))) % 1000000
    rate_col = None
    for src, rate in sorted(rates.items()):
        bp = F.lit(int(round(rate * 1000000)))
        rate_col = (
            F.when(F.col(group_col) == src, bp)
            if rate_col is None
            else rate_col.when(F.col(group_col) == src, bp)
        )
    default_bp = F.lit(int(round(default_rate * 1000000)))
    rate_col = default_bp if rate_col is None else rate_col.otherwise(default_bp)
    return df.where(draw < rate_col)


def training_order(
    df: DataFrame,
    id_col: str = "doc_id",
    shards: int = 1024,
    tag: str = "torder",
) -> DataFrame:
    """Deterministic global shuffle for training order: assign every
    document a shard and a position so that reading shards 0..S-1 each
    in position order visits the corpus in a fixed pseudo-random
    permutation. The 'shuffle the corpus before training' step — at
    100 TB you cannot materialize a permutation in memory, so the
    distributed idiom is keyed-hash ordering: ``shard = h(id) mod S``,
    ``pos = rank of h(id) within the shard`` (id as tie-break so the
    order is total even under hash collisions).

    Deterministic by construction: reruns, resumes and the SQL oracle
    produce the identical (shard, pos) for every doc — a training job
    can be restarted mid-epoch and resume at an exact (shard, pos)
    offset, the todo-list resume contract applied to data ordering.
    Vary ``tag`` to draw a fresh independent permutation per epoch.

    Scale shape: ONE shuffle on ``shard`` (S reduce tasks), then one
    sort of corpus/S rows per task. Size S so a shard is a few GB
    (100 TB / 32k shards ≈ 3 GB per sort — comfortably in-memory);
    the hash is uniform so there is no skew by design.
    """
    from gemproc2caom2_spark.functions.hashing import hex15_hash

    draw = hex15_hash(
        F.concat(F.lit(f"{tag}:"), F.col(id_col).cast("string"))
    )
    s = max(int(shards), 1)
    w = Window.partitionBy("shard").orderBy(
        F.col("_draw").asc(), F.col(id_col).asc()
    )
    return (
        df.withColumn("_draw", draw)
        .withColumn("shard", (F.col("_draw") % s).cast("int"))
        .withColumn("pos", F.row_number().over(w).cast("long"))
        .drop("_draw")
    )


def frequency_resample(
    df: DataFrame,
    bucket_col: str,
    id_col: str = "doc_id",
    tag: str = "qres",
) -> DataFrame:
    """Level the corpus across buckets by downsampling over-represented
    ones to the rarest bucket's count — importance resampling toward a
    uniform bucket distribution (the DSIR/DoReMi move of re-weighting
    by target/actual frequency, with the target fixed at uniform and
    weights clamped to <=1 so it is a pure subsample: no duplication,
    no fractional weights for the trainer to carry).

    A doc is kept iff ``hex15(tag:id) % 10^6 < accept_bp(bucket)``
    where ``accept_bp = (min_count * 10^6) DIV count`` — exact long
    arithmetic, so reruns and the SQL oracle keep the identical subset,
    and the expected kept size per bucket is min_count with binomial
    concentration. Adds ``accept_bp`` alongside the bucket for audit.

    Scale shape: one partial-aggregated groupBy over bucket ids (the
    count table is #buckets rows — a broadcast dimension), the min
    taken by a window over that TINY frame (single-partition by design:
    #buckets rows, not corpus rows — a cross-joined 1-row aggregate
    would instead fork the plan and re-scan the corpus for the min),
    then a broadcast join back and a map-side residue predicate. No
    corpus-sized shuffle: the corpus is touched by exactly two scans
    (count + mark) or one if the caller caches upstream.
    """
    from gemproc2caom2_spark.functions.hashing import hex15_hash

    counts = df.groupBy(bucket_col).agg(F.count(F.lit(1)).alias("_bc"))
    rates = (
        counts.withColumn("_minc", F.min("_bc").over(Window.partitionBy()))
        .withColumn(
            "accept_bp",
            F.expr("(_minc * 1000000) DIV _bc").cast("bigint"),
        )
        .select(bucket_col, "accept_bp")
    )
    draw = hex15_hash(
        F.concat(F.lit(f"{tag}:"), F.col(id_col).cast("string"))
    ) % 1000000
    return (
        df.join(F.broadcast(rates), on=bucket_col, how="inner")
        .where(draw < F.col("accept_bp"))
    )


def holdout_split(
    df: DataFrame,
    id_col: str = "doc_id",
    train_bp: int = 9000,
    val_bp: int = 9500,
    tag: str = "split",
) -> DataFrame:
    """Deterministic train/val/test assignment by keyed hash residue.

    A training corpus needs a holdout that is (a) disjoint, (b) stable
    under reruns and corpus growth — a doc's split NEVER changes when
    other docs are added or removed — and (c) reproducible by an
    external auditor. Random splits fail (b) and (c); this one assigns
    ``split`` from ``hex15(tag:id) % 10000``: ``train`` below
    ``train_bp`` basis points, ``val`` below ``val_bp``, else
    ``test``. The same hex15 keyed-hash family as every other sampling
    operator, so the SQL oracle reproduces the assignment exactly.

    The reference's analog is the fixed todo/rejected partition of its
    work list (composable.py:119-133): membership is a pure function
    of the entry id, not of execution order.

    Map-only: a residue + two comparisons inside whole-stage codegen.
    No shuffle, no state — the 100-TB version is exactly this plan.
    """
    draw = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit(f"{tag}:"), F.col(id_col).cast("string"))),
                1,
                15,
            ),
            16,
            10,
        ).cast("bigint")
        % 10000
    )
    return df.withColumn(
        "split",
        F.when(draw < train_bp, F.lit("train"))
        .when(draw < val_bp, F.lit("val"))
        .otherwise(F.lit("test")),
    )


def sliding_chunks(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    size: int = 2048,
    stride: int = 1536,
) -> DataFrame:
    """Split documents into fixed-size overlapping character windows —
    the context-window chunking step that turns curated documents into
    trainable sequences (size > stride gives ``size - stride`` overlap
    so no boundary content is ever lost to truncation).

    Chunk count is exact long arithmetic
    (``1 + ceil((len - size) / stride)`` via DIV), generated as a
    ``sequence`` + ``explode`` and sliced with ``substring`` — all
    JVM-side, so the fan-out never leaves whole-stage codegen and the
    SQL oracle reproduces it with ``range``/``unnest``. Adds
    ``chunk_id`` (0-based) and ``chunk`` (the window; the final one may
    be shorter).

    Scale shape: map-side explode — output rows ~ corpus_chars /
    stride, no shuffle. The explode multiplies bytes by the overlap
    factor only (size/stride); partition sizing is governed by
    ``spark.sql.files.maxPartitionBytes`` on the upstream scan exactly
    as for the unchunked corpus.
    """
    n = F.length(F.col(text_col))
    n_chunks = F.when(n <= size, F.lit(1).cast("bigint")).otherwise(
        F.expr(
            f"1 + (length({text_col}) - {size} + {stride} - 1) DIV {stride}"
        ).cast("bigint")
    )
    idx = F.explode(F.sequence(F.lit(0).cast("bigint"), n_chunks - 1))
    return (
        df.withColumn("chunk_id", idx)
        .withColumn(
            "chunk",
            F.substring(
                F.col(text_col),
                (F.col("chunk_id") * stride + 1).cast("int"),
                F.lit(size),
            ),
        )
    )
