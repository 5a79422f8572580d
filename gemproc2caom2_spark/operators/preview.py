"""Preview / thumbnail side-output (K3).

The reference renders a JPEG preview + thumbnail per observation and
attaches them as extra artifacts
(/root/reference/gemProc2caom2/preview_augmentation.py:88-133, names
built at builder.py:100-106: ``<id>.jpg`` / ``<id>_th.jpg``). The web
analog is a side TABLE of human-inspectable excerpts per kept document
— a preview (leading excerpt of the scrubbed text) and a thumbnail (a
shorter one) plus the size metadata a reviewer sorts by. Emitted from
the curated output in the same pass (one projection, no extra scan),
written by the checkpoint protocol alongside results.

Excerpts cut on a word boundary where possible, mirroring the
reference's derived-artifact naming discipline: deterministic,
derivable from the row alone.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

PREVIEW_CHARS = 280
THUMB_CHARS = 64


def preview_excerpt(text: Column | str, limit: int = PREVIEW_CHARS) -> Column:
    """First ``limit`` chars, backed off to the last space so the cut
    lands on a word boundary (no space in range -> hard cut); text
    shorter than the limit passes through untouched. Pure Column
    expression, SQL-replicable."""
    t = F.col(text) if isinstance(text, str) else text
    head = F.substring(t, 1, limit)
    # position of the last space within the head: length - position of
    # the first space in the reversed head
    rev_pos = F.instr(F.reverse(head), " ")
    trimmed = F.substring(head, 1, F.length(head) - rev_pos)
    return F.when(F.length(t) <= limit, t).otherwise(
        F.when(rev_pos > 0, trimmed).otherwise(head)
    )


def preview_rows(
    curated: DataFrame,
    text_col: str = "scrubbed_text",
    key_col: str = "url",
) -> DataFrame:
    """Side-output table: one preview row per KEPT doc.

    (url, preview, thumbnail, n_chars, n_preview_chars) — the preview/
    thumbnail artifact pair. Dropped docs produce no artifacts, exactly
    as the reference only renders previews for science products."""
    kept = curated.where(F.col("keep"))
    t = F.col(text_col)
    return kept.select(
        F.col(key_col).alias("url"),
        preview_excerpt(t, PREVIEW_CHARS).alias("preview"),
        preview_excerpt(t, THUMB_CHARS).alias("thumbnail"),
        F.length(t).cast("long").alias("n_chars"),
        F.length(preview_excerpt(t, PREVIEW_CHARS)).cast("long").alias("n_preview_chars"),
    )
