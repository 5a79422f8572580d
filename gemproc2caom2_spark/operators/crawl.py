"""Web-crawl corpus maintenance: full URL canonicalization and
recrawl versioning (latest-crawl-wins + change detection).

The reference keys every pipeline decision on a repaired, canonical
entry name (``GemProcName`` repair + prefix logic,
/root/reference/gemProc2caom2/builder.py:90-155) and reprocesses a
file only when its content differs from the stored version (todo-list
diffing, composable.py:119-133). The web-scale analogs:

- **URL canonicalization**: the dedup/join key for a trillion-row
  crawl is the canonical URL, not the raw one. Raw crawl URLs differ
  in case, default ports, fragments, trailing slashes, ``www.`` and
  tracking parameters (``utm_*``, click ids) while naming the same
  resource; canonicalizing before keying is what makes exact URL
  dedup and recrawl joins mean anything.
- **Recrawl versioning**: successive crawls re-fetch the same URL;
  the corpus wants exactly one row per canonical URL (the newest
  fetch) plus a changed/unchanged flag so downstream stages can skip
  re-curating unchanged documents — the reference's "only process
  entries whose content changed" resume semantics.

Scale shape: canonicalization is a pure chain of JVM Column
expressions (regex + array ops inside whole-stage codegen) — zero
shuffles, zero Python. Latest-crawl-wins is ONE hash shuffle on the
canonical-url key; each window holds only that URL's fetch history
(bounded by the recrawl count, single digits for real crawls), so
there is no skew amplification — a hot HOST is many distinct URLs and
spreads across partitions by construction.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from gemproc2caom2_spark.functions.hashing import url_normalize

# Query parameters that never change the resource: analytics /
# click-tracking ids. Prefix family + exact names, both matched
# against the leading ``name=`` of each param.
TRACKING_PREFIXES: tuple[str, ...] = ("utm_",)
TRACKING_PARAMS: tuple[str, ...] = ("gclid", "fbclid", "msclkid", "ref")


def canonicalize_url(
    url: Column | str,
    tracking_prefixes: Sequence[str] = TRACKING_PREFIXES,
    tracking_params: Sequence[str] = TRACKING_PARAMS,
) -> Column:
    """Full canonical form of a raw crawl URL, as one codegen'd
    Column expression.

    Builds on :func:`~gemproc2caom2_spark.functions.hashing.url_normalize`
    (lowercase scheme+host, strip fragment / matching default port /
    trailing slash) and adds the crawl-dedup steps:

    - strip a leading ``www.`` from the host (SURT-style host folding),
    - drop tracking query parameters (``utm_*`` prefixes + exact
      click-id names),
    - sort the surviving query parameters so equivalent orderings
      collapse to one key (``?b=2&a=1`` == ``?a=1&b=2``).

    Every step is an engine-portable string/array primitive
    (``split`` / ``filter`` / ``array_sort`` / ``array_join``), so a
    SQL oracle can reproduce the result bit-for-bit with
    ``string_split`` / ``list_filter`` / ``list_sort`` /
    ``array_to_string``.
    """
    base = url_normalize(url)
    base = F.regexp_replace(base, r"^(https?://)www\.", r"$1")

    # split once at the first '?': path part + raw query string
    path = F.substring_index(base, "?", 1)
    query = F.substring(base, F.length(path) + 2, F.length(base))

    params = F.split(query, "&")

    def _keep(p: Column) -> Column:
        drop = F.lit(False)
        for pref in tracking_prefixes:
            drop = drop | p.startswith(pref)
        for name in tracking_params:
            drop = drop | p.startswith(name + "=") | (p == name)
        return ~drop

    kept = F.array_sort(F.filter(params, _keep))
    # dropping the whole query can expose a trailing slash that
    # url_normalize left alone (it was followed by '?'), e.g.
    # '/Page/9/?gclid=x' -> '/Page/9/': re-strip so the result is a
    # fixed point (idempotence pinned by the fuzz test)
    bare_path = F.regexp_replace(path, r"(.)/$", r"$1")
    rebuilt = F.when(F.size(kept) == 0, bare_path).otherwise(
        F.concat(path, F.lit("?"), F.array_join(kept, "&"))
    )
    return F.when(base.contains("?"), rebuilt).otherwise(base)


def canonicalize_url_sql(
    expr: str,
    tracking_prefixes: Sequence[str] = TRACKING_PREFIXES,
    tracking_params: Sequence[str] = TRACKING_PARAMS,
) -> str:
    """DuckDB rendering of :func:`canonicalize_url` over a *normalized*
    url expression ``expr`` (the oracle replicates ``url_normalize``
    separately; this covers the www-strip + param-filter + sort).
    """
    drops = [f"starts_with(p, '{pref}')" for pref in tracking_prefixes]
    drops += [
        f"starts_with(p, '{name}=') OR p = '{name}'"
        for name in tracking_params
    ]
    drop_pred = " OR ".join(f"({d})" for d in drops)
    base = f"regexp_replace({expr}, '^(https?://)www\\.', '\\1')"
    path = f"split_part({base}, '?', 1)"
    query = f"substring({base}, length({path}) + 2)"
    kept = (
        f"list_sort(list_filter(string_split({query}, '&'),"
        f" p -> NOT ({drop_pred})))"
    )
    bare_path = f"regexp_replace({path}, '(.)/$', '\\1')"
    rebuilt = (
        f"CASE WHEN len({kept}) = 0 THEN {bare_path}"
        f" ELSE {path} || '?' || array_to_string({kept}, '&') END"
    )
    return (
        f"CASE WHEN strpos({base}, '?') > 0 THEN {rebuilt} ELSE {base} END"
    )


def latest_crawl_wins(
    df: DataFrame,
    url_col: str = "url_key",
    ts_col: str = "crawl_ts",
    fp_col: str = "fingerprint",
    tiebreak_col: str = "doc_id",
) -> DataFrame:
    """Collapse a multi-crawl corpus to one row per URL: the newest
    fetch, annotated with the fetch count and whether its content
    changed vs the previous fetch.

    Output columns (plus every input column of the winning row):
    ``n_crawls`` (BIGINT fetches seen for the url) and ``changed``
    (true iff a previous fetch exists and its ``fp_col`` differs —
    first-seen urls are ``false``, the "nothing to diff against"
    convention of the reference's todo diffing).

    One shuffle on ``url_col``; ``lead`` over the per-url descending
    time order reads the previous fetch without a self-join. Ties on
    ``ts_col`` (same-second refetch) break on ``tiebreak_col`` so the
    winner is deterministic across reruns and engines.
    """
    w = Window.partitionBy(url_col).orderBy(
        F.col(ts_col).desc(), F.col(tiebreak_col).desc()
    )
    prev_fp = F.lead(fp_col).over(w)
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .withColumn("n_crawls", F.count(F.lit(1)).over(Window.partitionBy(url_col)))
        .withColumn(
            "changed",
            F.coalesce(F.col(fp_col) != prev_fp, F.lit(False)),
        )
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
