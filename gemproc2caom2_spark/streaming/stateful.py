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
            batch = pd.concat(list(pdfs), ignore_index=True)
            if len(batch):
                if order_col and order_col in batch.columns:
                    batch = batch.sort_values(order_col, kind="mergesort")
                yield batch.head(1)[cols]
            state.update((True,))

    return src.groupBy(key_col).applyInPandasWithState(
        fn,
        outputStructType=out_schema,
        stateStructType="seen boolean",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
