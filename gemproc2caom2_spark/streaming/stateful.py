"""Custom stateful streaming operator (ST2/ST4 scale path): cross-batch
first-occurrence filter over an unbounded stream.

The reference suppresses already-processed and known-bad work between
invocations with ledger FILES (todo/success/rejected,
/root/reference/config/config.yml:30-62); the batch engine replicates
that with the keys-ledger anti-join (plans/checkpoint.py). On a live
stream the same contract — "each url is processed at most once, ever" —
needs per-key state that survives micro-batches: Spark's state store
via ``applyInPandasWithState``, the sanctioned custom-stateful-operator
hook (Arrow-batched; state is per-key and partitioned by the shuffle,
so 10^12 keys shard across executors and checkpoint with the query).

Within one batch the earliest row by ``order_col`` wins (deterministic);
across batches the first batch wins — identical winner semantics to the
checkpoint ledger's "committed doc is canonical".
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def first_occurrence_stream(
    src: DataFrame,
    key_col: str = "url_hash",
    order_col: str | None = "warc_ts",
) -> DataFrame:
    """Keep only the FIRST row ever seen per ``key_col`` across the
    whole life of the stream; every later occurrence (same batch or any
    later batch) is dropped.

    State per key is a single boolean — ~1 byte/key in the state store,
    the same compact-ledger discipline as checkpoint keys. No timeout:
    'processed' never expires (the success-ledger contract). Callers
    that want re-crawl-after-N-days semantics can rebuild with a
    processing-time timeout clearing the flag.
    """
    out_schema = src.schema
    cols = [f.name for f in out_schema.fields]

    def fn(
        key: Any, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            # drain the iterator (required by the contract) and emit nothing
            for _ in pdfs:
                pass
        else:
            # fold the iterator to ONE running-min row: a hot key that
            # floods a micro-batch must never materialize its whole
            # group in executor memory (pd.concat of the iterator would
            # hold every chunk at once); peak held state is one chunk +
            # one row regardless of group size
            ordered = bool(order_col) and order_col in cols
            best: pd.DataFrame | None = None
            for chunk in pdfs:
                if not len(chunk):
                    continue
                if ordered:
                    # first index label of the chunk minimum (idxmin ==
                    # stable-sort + head(1), and unlike nsmallest it
                    # works for ANY orderable dtype — strings arrive as
                    # object after Arrow conversion); nulls are skipped,
                    # all-null chunks fall back to the chunk head so a
                    # null-ordered row can still win an otherwise-empty
                    # group
                    nn = chunk[order_col].dropna()
                    cand = chunk.loc[[nn.idxmin()]] if len(nn) else chunk.head(1)
                else:
                    cand = chunk.head(1)
                if best is None:
                    best = cand.copy()
                elif ordered:
                    bv = best.iloc[0][order_col]
                    cv = cand.iloc[0][order_col]
                    # earlier timestamp wins; any value beats null; ties
                    # keep the earlier-seen row (matches stable sort)
                    if (pd.isna(bv) and not pd.isna(cv)) or (
                        not pd.isna(cv) and not pd.isna(bv) and cv < bv
                    ):
                        best = cand.copy()
            if best is not None:
                yield best[cols]
            state.update((True,))

    return src.groupBy(key_col).applyInPandasWithState(
        fn,
        outputStructType=out_schema,
        stateStructType="seen boolean",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def near_dup_stream(
    src: DataFrame,
    key_col: str = "url_hash",
    bands_col: str = "lsh_bands",
) -> DataFrame:
    """Cross-batch NEAR-duplicate suppression on a live stream — the
    streaming twin of the checkpoint ledger's cross-run LSH dedup
    (plans/checkpoint.py cross_run_dedup): a doc sharing ANY band bucket
    with a doc from an earlier micro-batch is a duplicate (the earlier
    doc is canonical); within a batch the smallest ``key_col`` per
    bucket survives, exactly the batch operator's flag semantics
    (is_duplicate == any bucket holds a smaller key).

    Input needs a precomputed ``bands_col`` (array<bigint> of LSH band
    bucket keys, e.g. ``band_keys_expr`` over the minhash signature).
    State is keyed by BUCKET (one boolean per bucket ever seen — the
    same compact-ledger discipline as the batch keys ledger), so 10^12
    buckets shard across executors with the state-store shuffle.

    Output: the exploded (doc x band) rows with a ``_bucket_dup`` flag.
    A doc is a duplicate iff ANY of its bucket rows is flagged — fold
    with ``fold_bucket_verdicts`` inside the caller's foreachBatch sink
    (chaining a second stateful aggregation after
    applyInPandasWithState in one streaming plan is not supported; the
    fold is batch-local anyway because every doc's bucket rows land in
    the same micro-batch).

    Bounded memory on the first-seen path: the batch-local min key is
    folded chunk by chunk — a row strictly above the running min is
    already a certain duplicate (the min only decreases) and is emitted
    immediately; only rows EQUAL to the running min are held (the same
    doc can reach one bucket through several bands, so ties are bounded
    by the band count, not the group size). A boilerplate storm
    flooding one bucket in one micro-batch therefore peaks at one Arrow
    chunk + ≤ bands held rows, the first_occurrence_stream discipline.

    Docs with a null or empty ``bands_col`` (no signature — e.g. docs a
    cheap gate already dropped) are NOT dedup candidates but must not
    vanish from the stream: they pass through with a null ``_bucket``
    and ``_bucket_dup=false``, so ``fold_bucket_verdicts`` keeps them
    with is_duplicate=false — the same keep-with-false contract as the
    batch ``mark_lsh_duplicates``.
    """
    from pyspark.sql import functions as F
    from pyspark.sql.types import BooleanType, StructField, StructType

    has_bands = F.col(bands_col).isNotNull() & (F.size(bands_col) > 0)
    exploded = (
        src.where(has_bands)
        .withColumn("_bucket", F.explode(bands_col))
        .drop(bands_col)
    )
    passthrough = (
        src.where(~F.coalesce(has_bands, F.lit(False)))
        .drop(bands_col)
        .withColumn("_bucket", F.lit(None).cast("bigint"))
        .withColumn("_bucket_dup", F.lit(False))
    )
    out_schema = StructType(
        exploded.schema.fields + [StructField("_bucket_dup", BooleanType())]
    )
    cols = [f.name for f in exploded.schema.fields]

    def fn(
        key: Any, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            # bucket committed by an earlier batch: every current doc
            # sharing it is a near-dup (streamed chunk by chunk — no
            # group buffering on the already-seen path)
            for chunk in pdfs:
                if len(chunk):
                    out = chunk[cols].copy()
                    out["_bucket_dup"] = True
                    yield out
        else:
            # single-pass fold to the batch-local min: emit certain
            # duplicates (key > running min) per chunk, hold only the
            # current min-key ties (same doc via several bands)
            held: pd.DataFrame | None = None
            best_key = None
            for chunk in pdfs:
                if not len(chunk):
                    continue
                cmin = chunk[key_col].min()
                if best_key is None or cmin < best_key:
                    if held is not None and len(held):
                        out = held[cols].copy()
                        out["_bucket_dup"] = True
                        yield out
                    best_key = cmin
                    held = chunk[chunk[key_col] == cmin].copy()
                else:
                    eq = chunk[chunk[key_col] == best_key]
                    if len(eq):
                        held = pd.concat([held, eq], ignore_index=True)
                dups = chunk[chunk[key_col] > best_key]
                if len(dups):
                    out = dups[cols].copy()
                    out["_bucket_dup"] = True
                    yield out
            if held is not None and len(held):
                out = held[cols].copy()
                out["_bucket_dup"] = False
                yield out
            state.update((True,))

    flagged = exploded.groupBy("_bucket").applyInPandasWithState(
        fn,
        outputStructType=out_schema,
        stateStructType="seen boolean",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    return flagged.unionByName(passthrough.select(*[f.name for f in out_schema.fields]))


def fold_bucket_verdicts(batch_df: DataFrame, key_col: str = "url_hash") -> DataFrame:
    """Fold ``near_dup_stream`` bucket verdicts back to one row per doc
    (use inside foreachBatch): is_duplicate = ANY bucket flagged. The
    payload columns are required to be identical across a doc's bucket
    rows (they are copies of the same source row), so a deterministic
    representative works: min_by on ``_bucket`` picks bucket-0's copy
    and — unlike max — never mixes values across rows and accepts
    non-orderable payload types (map, struct-of-map)."""
    from pyspark.sql import functions as F

    payload = [c for c in batch_df.columns if c not in (key_col, "_bucket", "_bucket_dup")]
    return batch_df.groupBy(key_col).agg(
        *[F.min_by(c, "_bucket").alias(c) for c in payload],
        F.max("_bucket_dup").alias("is_duplicate"),
    )
