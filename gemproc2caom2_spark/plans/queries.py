"""Operator-coverage queries + ANSI-SQL oracles (the driver contract).

One entry per implemented operator family from SURVEY.md §2, each as
(spark_fn, oracle_sql) where the oracle runs on DuckDB over the same
parquet tables. Column names and rounding are aligned on both sides so
the driver's order-insensitive value-hash matches.

Cross-engine gotchas handled here:
- DuckDB sum(INTEGER) returns HUGEINT -> always ::BIGINT in oracles;
- doubles rounded to 6 dp on BOTH sides;
- word-boundary regexes restricted to the Java∩RE2 ASCII subset;
- the only cross-engine hash is hex15 (md5-derived, functions/hashing).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from gemproc2caom2_spark.functions import text as TX
from gemproc2caom2_spark.functions.hashing import hex15_hash, hex15_hash_sql
from gemproc2caom2_spark.functions.langid import langid_expr, langid_sql
from gemproc2caom2_spark.functions.scrub import scrub_expr, scrub_sql

QueryFn = Callable[[SparkSession, str], DataFrame]

_REGISTRY: dict[str, tuple[QueryFn, str | None]] = {}


def register(name: str, oracle: str | None):
    def deco(fn: QueryFn) -> QueryFn:
        _REGISTRY[name] = (fn, oracle)
        return fn
    return deco


def load(
    spark: SparkSession, sf_dir: str, table: str, spread: bool = False
) -> DataFrame:
    """Read a testdata table. ``spread=True`` repartitions right after
    the scan: these tables are single sub-megabyte parquet files = ONE
    input split, so without it a kernel-heavy map (shingling, minhash,
    regex metrics) runs serially no matter how many cores exist. At
    real scale the file count dwarfs the core count and the repartition
    is pure overhead — hence opt-in per query, not a reader default."""
    df = spark.read.parquet(f"{sf_dir}/{table}.parquet")
    if spread:
        df = df.repartition(2 * spark.sparkContext.defaultParallelism)
    return df


def queries() -> dict[str, QueryFn]:
    return {k: v[0] for k, v in _REGISTRY.items()}


def oracles() -> dict[str, str]:
    return {k: v[1] for k, v in _REGISTRY.items() if v[1] is not None}


# ===========================================================================
# Headline relational queries (bench drivers; exercise agg/join/window)
# ===========================================================================


@register(
    "q1_pricing_summary",
    """
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 4) AS sum_qty,
           round(sum(l_extendedprice), 4) AS sum_base_price,
           round(sum(l_extendedprice * (1 - l_discount)), 4) AS sum_disc_price,
           round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 4) AS sum_charge,
           round(avg(l_quantity), 6) AS avg_qty,
           round(avg(l_extendedprice), 6) AS avg_price,
           round(avg(l_discount), 6) AS avg_disc,
           count(*)::BIGINT AS count_order
    FROM lineitem
    WHERE l_shipdate <= DATE '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape (A-family aggregations, SURVEY §2.6). Partial
    aggregation map-side; one shuffle on the 2 group keys."""
    li = load(spark, sf_dir, "lineitem")
    return (
        li.where(F.col("l_shipdate") <= F.lit("1998-09-02").cast("date"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 4).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 4).alias("sum_base_price"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4).alias("sum_disc_price"),
            F.round(
                F.sum(
                    F.col("l_extendedprice")
                    * (1 - F.col("l_discount"))
                    * (1 + F.col("l_tax"))
                ),
                4,
            ).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 6).alias("avg_price"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


@register(
    "q3_top_revenue",
    """
    SELECT o.o_orderkey AS orderkey,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 4) AS revenue,
           o.o_orderdate AS orderdate
    FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING' AND o.o_orderdate < DATE '1995-03-15'
    GROUP BY o.o_orderkey, o.o_orderdate
    ORDER BY revenue DESC, orderkey ASC
    LIMIT 10
    """,
)
def q3_top_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: selective dim filter -> join -> agg -> top-k.
    The customer side is small after the segment filter -> broadcast.
    Join order (r6, same move as j1): orders reduce through the
    broadcast customer filter FIRST, and the surviving (orderkey,
    custkey, orderdate) list broadcasts onto lineitem — the fact table
    is never shuffled (the r5 order sort-merge-joined all of lineitem
    against the date-filtered orders before the segment filter cut)."""
    c = load(spark, sf_dir, "customer").where(F.col("c_mktsegment") == "BUILDING")
    o = load(spark, sf_dir, "orders").where(
        F.col("o_orderdate") < F.lit("1995-03-15").cast("date")
    )
    li = load(spark, sf_dir, "lineitem")
    oc = o.join(F.broadcast(c), o.o_custkey == c.c_custkey).select(
        "o_orderkey", "o_orderdate"
    )
    return (
        li.join(F.broadcast(oc), li.l_orderkey == F.col("o_orderkey"))
        .groupBy(F.col("o_orderkey").alias("orderkey"), F.col("o_orderdate").alias("orderdate"))
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4).alias("revenue")
        )
        .orderBy(F.col("revenue").desc(), F.col("orderkey").asc())
        .limit(10)
        .select("orderkey", "revenue", "orderdate")
    )


# ===========================================================================
# SURVEY §2.2/2.3 — projections & scalar kernels
# ===========================================================================


@register(
    "p1_p2_blueprint_projection",
    """
    SELECT p_partkey AS part_id,
           'science' AS product_type,
           2 AS calibration_level,
           p_brand AS brand,
           p_retailprice AS retail_price
    FROM part WHERE p_size > 20
    """,
)
def p1_p2_blueprint_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P1 constant + P2 keyword-rename projections (the blueprint
    bp.set/add_attribute analog, main_app.py:135-181)."""
    return (
        load(spark, sf_dir, "part")
        .where(F.col("p_size") > 20)
        .select(
            F.col("p_partkey").alias("part_id"),
            F.lit("science").alias("product_type"),
            F.lit(2).alias("calibration_level"),
            F.col("p_brand").alias("brand"),
            F.col("p_retailprice").alias("retail_price"),
        )
    )


@register(
    "f2_intent_from_prefix",
    """
    SELECT doc_id,
           CASE WHEN source LIKE '%1%' THEN 'calibration' ELSE 'science' END AS intent
    FROM documents
    """,
)
def f2_intent_from_prefix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F2: obs-intent from name prefix ('g' in prefix => CALIBRATION,
    main_app.py:290-301) -> substring-dispatch rule."""
    return load(spark, sf_dir, "documents").select(
        "doc_id",
        F.when(F.col("source").contains("1"), F.lit("calibration"))
        .otherwise(F.lit("science"))
        .alias("intent"),
    )


@register(
    "f3_decision_table",
    """
    SELECT o_orderkey,
           CASE WHEN o_orderstatus = 'F' AND o_orderpriority LIKE '1%' THEN 'urgent_done'
                WHEN o_orderstatus = 'F' THEN 'done'
                WHEN o_orderpriority LIKE '1%' THEN 'urgent_open'
                ELSE 'open' END AS order_class
    FROM orders
    """,
)
def f3_decision_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F3: two-level dispatch decision table (OBSTYPE x INSTRUME,
    main_app.py:303-318)."""
    o = load(spark, sf_dir, "orders")
    urgent = F.col("o_orderpriority").startswith("1")
    done = F.col("o_orderstatus") == "F"
    return o.select(
        "o_orderkey",
        F.when(done & urgent, "urgent_done")
        .when(done, "done")
        .when(urgent, "urgent_open")
        .otherwise("open")
        .alias("order_class"),
    )


@register(
    "f8_f9_string_kernels",
    """
    SELECT doc_id,
           split_part(source, 'c', 1) AS prefix,
           source || '/' || doc_id::VARCHAR || '.jpg' AS preview_name,
           replace(lang, 'en', 'eng') AS lang_long,
           upper(substring(source, 1, 3)) AS source_code
    FROM documents
    """,
)
def f8_f9_string_kernels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F8 filter-name split + F9 name-synthesis kernels
    (main_app.py:226-228, builder.py:92-117)."""
    return load(spark, sf_dir, "documents").select(
        "doc_id",
        F.split(F.col("source"), "c")[0].alias("prefix"),
        F.concat(
            F.col("source"), F.lit("/"), F.col("doc_id").cast("string"), F.lit(".jpg")
        ).alias("preview_name"),
        F.regexp_replace("lang", "en", "eng").alias("lang_long"),
        F.upper(F.substring("source", 1, 3)).alias("source_code"),
    )


@register(
    "f10_f11_regex_kernels",
    """
    SELECT doc_id,
           coalesce(regexp_extract(text, '([0-9]+)', 1), '') AS first_number,
           length(regexp_extract_all(text, 'the')) ::BIGINT AS the_count,
           trim(regexp_replace(text, '\\s+', ' ', 'g')) AS text_norm_ws
    FROM documents WHERE doc_id < 100
    """,
)
def f10_f11_regex_kernels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F10 regex repair + F11 section-string parse analogs
    (builder.py:149-153, preview_augmentation.py:113-117)."""
    return (
        load(spark, sf_dir, "documents")
        .where(F.col("doc_id") < 100)
        .select(
            "doc_id",
            F.regexp_extract("text", r"([0-9]+)", 1).alias("first_number"),
            F.size(F.regexp_extract_all(F.col("text"), F.lit("the"), F.lit(0)))
            .cast("bigint")
            .alias("the_count"),
            F.trim(F.regexp_replace("text", r"\s+", " ")).alias("text_norm_ws"),
        )
    )


@register(
    "f12_unit_conversions",
    """
    SELECT event_id,
           trunc(value)::INTEGER AS value_int, -- Spark double->int cast truncates; DuckDB :: rounds
           round(value / 86400.0, 6) AS value_days,
           floor(epoch(ts))::BIGINT AS ts_epoch
    FROM events WHERE event_type = 'purchase'
    """,
)
def f12_unit_conversions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F12: to_int / convert_to_days unit kernels (main_app.py:199,427)."""
    return (
        load(spark, sf_dir, "events")
        .where(F.col("event_type") == "purchase")
        .select(
            "event_id",
            F.col("value").cast("int").alias("value_int"),
            F.round(F.col("value") / 86400.0, 6).alias("value_days"),
            F.unix_timestamp("ts").alias("ts_epoch"),
        )
    )


# ===========================================================================
# SURVEY §2.4 — validation gates
# ===========================================================================


@register(
    "v3_extname_dispatch",
    """
    SELECT event_id,
           CASE WHEN event_type = 'view' THEN 'science'
                WHEN event_type IN ('click', 'purchase') THEN 'noise'
                ELSE 'auxiliary' END AS part_class
    FROM events
    """,
)
def v3_extname_dispatch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """V3: EXTNAME dispatch ('SCI'->science, DQ/VAR->noise, else aux;
    main_app.py:214-219)."""
    return load(spark, sf_dir, "events").select(
        "event_id",
        F.when(F.col("event_type") == "view", "science")
        .when(F.col("event_type").isin("click", "purchase"), "noise")
        .otherwise("auxiliary")
        .alias("part_class"),
    )


@register(
    "v5_v6_sentinel_nullout",
    """
    SELECT event_id,
           CASE WHEN value = 0.0 THEN NULL ELSE round(value, 6) END AS value_clean,
           CASE WHEN value = 0.0 THEN NULL ELSE event_type END AS type_consistent
    FROM events
    """,
)
def v5_v6_sentinel_nullout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """V5 sentinel null-out (delta==1.0 -> time=None, main_app.py:251-259)
    + V6 cross-column consistency repair (:244-249)."""
    ev = load(spark, sf_dir, "events")
    is_sentinel = F.col("value") == 0.0
    return ev.select(
        "event_id",
        F.when(is_sentinel, F.lit(None)).otherwise(F.round("value", 6)).alias("value_clean"),
        F.when(is_sentinel, F.lit(None).cast("string"))
        .otherwise(F.col("event_type"))
        .alias("type_consistent"),
    )


@register(
    "v10_cardinality_guard",
    """
    SELECT o_custkey AS custkey, count(*)::BIGINT AS n_orders
    FROM orders GROUP BY o_custkey HAVING count(*) > 10
    """,
)
def v10_cardinality_guard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """V10: 'Too many rows' cardinality assert on a lookup
    (provenance_augmentation.py:220-221) -> HAVING-count audit."""
    return (
        load(spark, sf_dir, "orders")
        .groupBy(F.col("o_custkey").alias("custkey"))
        .agg(F.count("*").alias("n_orders"))
        .where(F.col("n_orders") > 10)
    )


# ===========================================================================
# SURVEY §2.5 — joins / lookups
# ===========================================================================


@register(
    "j1_threeway_like_join",
    """
    SELECT c.c_custkey AS custkey,
           count(*)::BIGINT AS n_lineitems,
           round(sum(l.l_extendedprice), 4) AS total_price
    FROM customer c
    JOIN orders o ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_name LIKE '%7'
    GROUP BY c.c_custkey
    """,
)
def j1_threeway_like_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1: the reference's only true relational query — 3-way equi-join
    with a LIKE-suffix filter (the TAP/ADQL query,
    provenance_augmentation.py:203-210). Suffix-LIKE kept as a filter on
    the small side (broadcast), not a theta-join.

    Join order (r6): reduce orders through the selective customer
    filter FIRST (~10% of customers), then broadcast the surviving
    (orderkey, custkey) pairs onto lineitem — the fact table is never
    shuffled at all (guide §2.4/§3.1; the r5 order sort-merge-joined
    all of lineitem against all of orders before the customer filter
    applied). The broadcast side is the post-filter order list — the
    same keep-the-filtered-side-small condition the broadcast(c) hint
    already assumed."""
    c = load(spark, sf_dir, "customer").where(F.col("c_name").endswith("7"))
    o = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    oc = o.join(F.broadcast(c), o.o_custkey == c.c_custkey).select(
        "o_orderkey", "c_custkey"
    )
    return (
        li.join(F.broadcast(oc), li.l_orderkey == F.col("o_orderkey"))
        .groupBy(F.col("c_custkey").alias("custkey"))
        .agg(
            F.count("*").alias("n_lineitems"),
            F.round(F.sum("l_extendedprice"), 4).alias("total_price"),
        )
    )


@register(
    "j2_priority_coalesce_lookup",
    """
    SELECT c.c_custkey AS custkey,
           coalesce(n1.n_name, n2.n_name, 'UNKNOWN') AS nation_name
    FROM customer c
    LEFT JOIN (SELECT * FROM nation WHERE n_regionkey < 2) n1
           ON n1.n_nationkey = c.c_nationkey
    LEFT JOIN nation n2 ON n2.n_nationkey = c.c_nationkey
    """,
)
def j2_priority_coalesce_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2: prioritized fallback lookup — try the cheap source first,
    coalesce with the second (provenance_augmentation.py:223-238)."""
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    n1 = n.where(F.col("n_regionkey") < 2).select(
        F.col("n_nationkey").alias("k1"), F.col("n_name").alias("name1")
    )
    n2 = n.select(F.col("n_nationkey").alias("k2"), F.col("n_name").alias("name2"))
    return (
        c.join(F.broadcast(n1), c.c_nationkey == F.col("k1"), "left")
        .join(F.broadcast(n2), c.c_nationkey == F.col("k2"), "left")
        .select(
            F.col("c_custkey").alias("custkey"),
            F.coalesce("name1", "name2", F.lit("UNKNOWN")).alias("nation_name"),
        )
    )


@register(
    "j4_broadcast_dim_fill",
    """
    SELECT c.c_custkey AS custkey, c.c_acctbal AS acctbal,
           n.n_name AS nation_name, r.r_name AS region_name
    FROM customer c
    JOIN nation n ON n.n_nationkey = c.c_nationkey
    JOIN region r ON r.r_regionkey = n.n_regionkey
    """,
)
def j4_broadcast_dim_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J4: PI-metadata fill from a small dimension (main_app.py:266-276)
    -> snowflake broadcast joins (no shuffle on the fact side)."""
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select(
            F.col("c_custkey").alias("custkey"),
            F.col("c_acctbal").alias("acctbal"),
            F.col("n_name").alias("nation_name"),
            F.col("r_name").alias("region_name"),
        )
    )


@register(
    "s1_anti_join_resume",
    """
    SELECT o_orderkey FROM orders o
    WHERE NOT EXISTS (
      SELECT 1 FROM lineitem l
      WHERE l.l_orderkey = o.o_orderkey AND l.l_shipdate > DATE '1997-01-01')
    """,
)
def s1_anti_join_resume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left ANTI join — the resume/todo-minus-done primitive (ledger
    semantics, config.yml:30-39; used by plans/checkpoint.py)."""
    o = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") > F.lit("1997-01-01").cast("date")
    )
    return o.join(li, o.o_orderkey == li.l_orderkey, "left_anti").select("o_orderkey")


# ===========================================================================
# SURVEY §2.6/2.7 — aggregations, sorts, windows
# ===========================================================================


@register(
    "a1_a3_member_semantics",
    """
    SELECT o_custkey AS custkey,
           array_to_string(list_sort(list_distinct(list(o_orderstatus))), ',') AS status_set,
           (count(DISTINCT o_orderstatus) > 1) AS is_derived
    FROM orders GROUP BY o_custkey
    """,
)
def a1_a3_member_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1 set accumulation (TypedSet.update) + A3 member-count
    classification (>1 member => derived observation,
    provenance_augmentation.py:112-143)."""
    return (
        load(spark, sf_dir, "orders")
        .groupBy(F.col("o_custkey").alias("custkey"))
        .agg(
            F.array_join(F.array_sort(F.collect_set("o_orderstatus")), ",").alias("status_set"),
            (F.size(F.collect_set("o_orderstatus")) > 1).alias("is_derived"),
        )
    )


@register(
    "a4_a5_median_minmax",
    """
    SELECT l_returnflag,
           round(quantile_cont(l_quantity, 0.5), 6) AS median_qty,
           round(min(l_extendedprice), 4) AS min_price,
           round(max(l_extendedprice), 4) AS max_price,
           round(avg((l_extendedprice - mn) / nullif(mx - mn, 0)), 6) AS avg_norm_price
    FROM (SELECT *, min(l_extendedprice) OVER (PARTITION BY l_returnflag) mn,
                    max(l_extendedprice) OVER (PARTITION BY l_returnflag) mx
          FROM lineitem)
    GROUP BY l_returnflag
    """,
)
def a4_a5_median_minmax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4 median reduce (np.median, preview_augmentation.py:101-104) +
    A5 min/max interval normalization (:95-102).

    The per-flag min/max come from a 3-row pre-aggregate broadcast back
    onto the fact rows — the r5 form computed them with a window over
    l_returnflag, which has 3 distinct values: every window partition
    was a multi-million-row single-task SORT (the low-cardinality
    window skew; guide §2.5), for values a map-side-combined groupBy
    produces without any sort. Same numbers: min/max are exact, and the
    normalized-average's summation was already partial-aggregated in
    arbitrary order before rounding."""
    li = load(spark, sf_dir, "lineitem")
    mm = li.groupBy("l_returnflag").agg(
        F.min("l_extendedprice").alias("mn"),
        F.max("l_extendedprice").alias("mx"),
    )
    li = li.join(F.broadcast(mm), on="l_returnflag")
    norm = (F.col("l_extendedprice") - F.col("mn")) / F.nullif(
        F.col("mx") - F.col("mn"), F.lit(0)
    )
    return li.groupBy("l_returnflag").agg(
        F.round(F.expr("percentile(l_quantity, 0.5)"), 6).alias("median_qty"),
        F.round(F.min("l_extendedprice"), 4).alias("min_price"),
        F.round(F.max("l_extendedprice"), 4).alias("max_price"),
        F.round(F.avg(norm), 6).alias("avg_norm_price"),
    )


@register(
    "a6_sorted_concat",
    """
    SELECT o_custkey AS custkey,
           string_agg(o_orderkey::VARCHAR, ',' ORDER BY o_orderdate, o_orderkey) AS orders_by_date
    FROM orders GROUP BY o_custkey
    """,
)
def a6_sorted_concat(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A6: sort-by-key then concatenate (NSCUTSEC-sorted HDU concat,
    preview_augmentation.py:111-119) — array_sort over (key, value)
    structs, JVM-side, no per-group Python."""
    o = load(spark, sf_dir, "orders")
    return (
        o.groupBy(F.col("o_custkey").alias("custkey"))
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("o_orderdate", "o_orderkey"))
                    ),
                    lambda s: s.getField("o_orderkey").cast("string"),
                ),
                ",",
            ).alias("orders_by_date")
        )
    )


@register(
    "w1_topk_per_group",
    """
    SELECT event_type, event_id, round(value, 6) AS value
    FROM (SELECT event_type, event_id, value,
                 row_number() OVER (PARTITION BY event_type
                                    ORDER BY value DESC, event_id ASC) rn
          FROM events) t
    WHERE rn <= 3
    """,
)
def w1_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k per group — window ranking with deterministic tie-break
    (take-first semantics, provenance_augmentation.py:285-289)."""
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy(
        F.col("value").desc(), F.col("event_id").asc()
    )
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 3)
        .select("event_type", "event_id", F.round("value", 6).alias("value"))
    )


@register(
    "w2_sessionization",
    """
    WITH g AS (
      SELECT user_id, ts,
             CASE WHEN epoch(ts) - epoch(lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id))
                       > 1800 OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                  THEN 1 ELSE 0 END AS new_session
      FROM events)
    SELECT user_id, sum(new_session)::BIGINT AS n_sessions, count(*)::BIGINT AS n_events
    FROM g GROUP BY user_id
    """,
)
def w2_sessionization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization: lag + gap>threshold session starts — the
    time-boxed incremental-interval analog (config.yml:69-73)."""
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w))
    new_session = F.when(
        gap.isNull() | (gap > 1800), F.lit(1)
    ).otherwise(F.lit(0))
    return (
        ev.withColumn("new_session", new_session)
        .groupBy("user_id")
        .agg(
            F.sum("new_session").cast("bigint").alias("n_sessions"),
            F.count("*").alias("n_events"),
        )
    )


@register(
    "st1_tumbling_window",
    """
    SELECT date_trunc('hour', ts) AS window_start, event_type,
           count(*)::BIGINT AS n, round(sum(value), 6) AS total_value
    FROM events GROUP BY 1, 2
    """,
)
def st1_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling-window agg — the batch twin of the streaming path
    (streaming/incremental.py uses the same plan via readStream)."""
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.window("ts", "1 hour").getField("start").alias("window_start"),
            "event_type",
        )
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 6).alias("total_value"))
    )


# ===========================================================================
# Lineage / provenance enrichment (J3, J5) + remaining gates (V11, A7)
# ===========================================================================


@register(
    "j5_lineage_fold",
    """
    WITH l AS (
      SELECT doc_id, doc_id - 1 AS ref,
             CASE WHEN doc_id % 2 = 0 THEN 'member' ELSE 'input' END AS rel
      FROM documents
      UNION ALL
      SELECT doc_id, doc_id - 2 AS ref, 'input' AS rel FROM documents),
    r AS (
      SELECT l.doc_id, l.rel, d.source AS attr
      FROM l JOIN documents d ON d.doc_id = l.ref)
    SELECT doc_id,
           array_to_string(list_sort(list_distinct(list(attr))), ',') AS inputs,
           coalesce(array_to_string(list_sort(list_distinct(
               list(attr) FILTER (rel = 'member'))), ','), '') AS members,
           count(*)::BIGINT AS n_inputs,
           sum(CASE WHEN rel = 'member' THEN 1 ELSE 0 END)::BIGINT AS n_members
    FROM r GROUP BY doc_id
    """,
)
def j5_lineage_fold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J5: explode per-doc lineage array -> resolve refs against the
    docs dimension -> collect_set fold-back with the member/input split
    (the PROVENANCE-BINTABLE flow,
    provenance_augmentation.py:184-199,240-258). The lineage array is
    synthesized deterministically (refs = doc_id-1, doc_id-2) so the
    operator is oracle-checkable on the shared tables."""
    from gemproc2caom2_spark.operators.lineage import fold_lineage

    d = load(spark, sf_dir, "documents")
    did = F.col("doc_id")
    lineage = F.array(
        F.struct(
            (did - 1).alias("ref"),
            F.when(did % 2 == 0, "member").otherwise("input").alias("rel"),
        ),
        F.struct((did - 2).alias("ref"), F.lit("input").alias("rel")),
    )
    folded = fold_lineage(
        d.withColumn("lineage", lineage),
        key_col="doc_id",
        lineage_col="lineage",
        dim=d,
        dim_key="doc_id",
        attr_col="source",
    )
    return folded.select(
        "doc_id",
        F.array_join("inputs", ",").alias("inputs"),
        F.array_join("members", ",").alias("members"),
        "n_inputs",
        "n_members",
    )


@register(
    "j3_member_propagation",
    """
    WITH f AS (
      SELECT source, min(doc_id) AS first_doc_id,
             arg_min(lang, doc_id) AS first_lang
      FROM documents GROUP BY source)
    SELECT d.doc_id, d.source, f.first_doc_id, f.first_lang
    FROM documents d JOIN f USING (source)
    """,
)
def j3_member_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J3: take the FIRST group member (min doc_id per source) and copy
    its attributes onto every row of the group — min_by aggregation +
    join back, never a window sort
    (provenance_augmentation.py:264-302, first-pick at :285-289)."""
    from gemproc2caom2_spark.operators.lineage import propagate_first_member

    d = load(spark, sf_dir, "documents")
    out = propagate_first_member(
        d, group_col="source", order_col="doc_id", attr_cols=["lang"]
    )
    return out.select("doc_id", "source", "first_doc_id", "first_lang")


@register(
    "v11_conditional_overwrite",
    """
    SELECT doc_id,
           CASE WHEN length(text) > 300 THEN 'derived' ELSE 'simple' END AS obs_class,
           CASE WHEN length(text) > 300 THEN 'composite' ELSE 'exposure' END AS algorithm
    FROM documents
    """,
)
def v11_conditional_overwrite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """V11: conditional overwrite by record class — the
    reset-algorithm-for-SimpleObservation rule (main_app.py:278-281):
    classify, then overwrite a derived attribute for one class only."""
    d = load(spark, sf_dir, "documents")
    obs_class = F.when(F.length("text") > 300, "derived").otherwise("simple")
    d = d.select("doc_id", obs_class.alias("obs_class"), F.lit("composite").alias("algorithm"))
    # the overwrite: simple observations get their algorithm reset
    return d.withColumn(
        "algorithm",
        F.when(F.col("obs_class") == "simple", F.lit("exposure")).otherwise(
            F.col("algorithm")
        ),
    )


@register(
    "a7_audit_totals",
    """
    SELECT 'probe' AS stage,
           count(*)::BIGINT AS n_in,
           sum(CASE WHEN length(text) >= 120 THEN 1 ELSE 0 END)::BIGINT AS n_kept,
           sum(CASE WHEN length(text) >= 120 THEN 0 ELSE 1 END)::BIGINT AS n_dropped
    FROM documents
    """,
)
def a7_audit_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A7: the per-partition execution-metrics operator
    (observe_execution analog, config.yml:53-56) — mapInPandas rows
    rolled up to totals, which ARE SQL-checkable: partition counts must
    sum to the table-level truth regardless of partitioning."""
    from gemproc2caom2_spark.operators.audit import partition_metrics

    d = load(spark, sf_dir, "documents").withColumn(
        "keep", F.length("text") >= 120
    )
    m = partition_metrics(d, run_id="probe", stage="probe")
    return m.groupBy("stage").agg(
        F.sum("n_in").alias("n_in"),
        F.sum("n_kept").alias("n_kept"),
        F.sum("n_dropped").alias("n_dropped"),
    )
