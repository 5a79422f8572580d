"""Column-expression kernels (the per-record compute functions).

The reference implements these as per-record Python methods resolved by
name from a blueprint table (/root/reference/gemProc2caom2/main_app.py:
135-181, 287-432). Here each kernel is a pure ``pyspark.sql.Column``
expression factory so Catalyst can codegen, push down and reorder them
-- UDFs only where a model (perplexity) genuinely needs numpy.
"""

from gemproc2caom2_spark.functions.hashing import (
    hex15_hash,
    minhash_signature_sql,
    salted_partition_key,
    url_host,
    url_normalize,
)
from gemproc2caom2_spark.functions.text import (
    char_ngrams,
    line_stats,
    repeated_line_frac,
    symbol_ratio,
    token_count_bpeish,
    token_count_ws,
    word_shingles,
)

__all__ = [
    "hex15_hash",
    "minhash_signature_sql",
    "salted_partition_key",
    "url_host",
    "url_normalize",
    "char_ngrams",
    "line_stats",
    "repeated_line_frac",
    "symbol_ratio",
    "token_count_bpeish",
    "token_count_ws",
    "word_shingles",
]
