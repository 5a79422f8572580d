"""Lineage / provenance enrichment operators (J3 + J5).

The reference's PROVENANCE BINTABLE flow: iterate the extension table's
(Filename, Type) rows, resolve each name against the archive, add every
resolved entry to ``plane.provenance.inputs`` and rows typed 'member'
also to ``observation.members``
(/root/reference/gemProc2caom2/provenance_augmentation.py:184-199,
240-258); then take the FIRST member and copy its proposal/target
metadata onto the observation (:264-302).

Spark-first shapes:

- J5 ``fold_lineage``: explode the per-doc lineage array -> equi-join
  the referenced keys against a dimension (the archive-lookup analog;
  unresolved refs are skipped, as the reference logs-and-continues on a
  TAP miss) -> collect_set back per doc, with the member/input split as
  a conditional second aggregate. Shuffle budget: one explode-side
  shuffle for the join + one groupBy fold-back, both on the dimension
  key — never a per-row loop.
- J3 ``propagate_first_member``: min_by(attrs, order) per group — a
  full map-side-combining aggregation (NOT a window sort) — joined back
  onto the group's rows.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def fold_lineage(
    df: DataFrame,
    key_col: str,
    lineage_col: str,
    dim: DataFrame,
    dim_key: str,
    attr_col: str,
    ref_field: str = "ref",
    rel_field: str = "rel",
    member_rel: str = "member",
) -> DataFrame:
    """Explode ``lineage_col`` (array<struct<ref, rel>>), resolve each
    ``ref`` against ``dim[dim_key]``, fold back per ``key_col``:

    - ``inputs``:  sorted distinct ``attr_col`` of ALL resolved entries
      (every provenance row -> provenance.inputs);
    - ``members``: sorted distinct ``attr_col`` of entries whose rel ==
      ``member_rel`` (the members split);
    - ``n_inputs`` / ``n_members``: the member-count semantics the
      reference branches on (provenance_augmentation.py:134-143).

    Docs with no resolved entries are absent (inner join), matching the
    reference's skip-on-miss behavior.
    """
    entry = F.col("_e")
    exploded = df.select(
        F.col(key_col), F.explode(F.col(lineage_col)).alias("_e")
    ).select(
        key_col,
        entry.getField(ref_field).alias("_ref"),
        entry.getField(rel_field).alias("_rel"),
    )
    resolved = exploded.join(
        dim.select(F.col(dim_key).alias("_ref"), F.col(attr_col).alias("_attr")),
        on="_ref",
        how="inner",
    )
    is_member = F.col("_rel") == member_rel
    return resolved.groupBy(key_col).agg(
        F.sort_array(F.collect_set("_attr")).alias("inputs"),
        F.sort_array(F.collect_set(F.when(is_member, F.col("_attr")))).alias(
            "members"
        ),
        F.count("*").alias("n_inputs"),
        F.sum(is_member.cast("long")).alias("n_members"),
    )


def propagate_first_member(
    df: DataFrame,
    group_col: str,
    order_col: str,
    attr_cols: list[str],
    prefix: str = "first_",
) -> DataFrame:
    """Copy the FIRST group member's attributes onto every row of the
    group (first = min ``order_col``; deterministic).

    min_by over a struct — partial aggregation combines map-side, so a
    hot group never concentrates on one task — then a join back on the
    group key (broadcast when the group count is small, left to AQE).
    """
    firsts = df.groupBy(group_col).agg(
        F.min(order_col).alias(f"{prefix}{order_col}"),
        *[
            F.min_by(c, order_col).alias(f"{prefix}{c}")
            for c in attr_cols
        ],
    )
    return df.join(firsts, on=group_col, how="left")
