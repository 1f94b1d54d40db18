"""Scalar function families (SURVEY §2.9): string, date/time, math, array,
map/struct, JSON, hash — one query per family pinning the surface against
the DuckDB oracle.  All pure Catalyst expressions (whole-stage codegen,
zero Python).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from vunnel_spark.queries._util import t
from vunnel_spark.registry import register


@register(
    "sc1_string_surface",
    """
    SELECT p_partkey,
           lower(p_name) AS lname,
           upper(p_brand) AS ubrand,
           replace(p_type, 'O', '0') AS masked,
           substring(p_name, 1, 4) AS head,
           length(p_name) AS len,
           lpad(CAST(p_size AS VARCHAR), 4, '0') AS padded,
           concat_ws('|', p_brand, p_type) AS joined,
           starts_with(p_name, 'red') AS is_red,
           contains(p_name, 'bolt') AS has_bolt
    FROM part
    """,
    doc="String family: case, replace, substring, pad, concat, predicates "
        "(reference string ops across debian/rhel/ubuntu parsers)",
    tags=("scalar",),
)
def sc1(spark, sf_dir):
    p = t(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.lower("p_name").alias("lname"),
        F.upper("p_brand").alias("ubrand"),
        F.replace(F.col("p_type"), F.lit("O"), F.lit("0")).alias("masked"),
        F.substring("p_name", 1, 4).alias("head"),
        F.length("p_name").alias("len"),
        F.lpad(F.col("p_size").cast("string"), 4, "0").alias("padded"),
        F.concat_ws("|", "p_brand", "p_type").alias("joined"),
        F.col("p_name").startswith("red").alias("is_red"),
        F.col("p_name").contains("bolt").alias("has_bolt"),
    )


@register(
    "sc2_date_surface",
    """
    SELECT o_orderkey,
           CAST(date_trunc('month', o_orderdate) AS DATE) AS month_start,
           CAST(year(o_orderdate) AS INT) AS yr,
           CAST(month(o_orderdate) AS INT) AS mo,
           CAST(day(o_orderdate) AS INT) AS dom,
           date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS days_since,
           CAST(o_orderdate + INTERVAL '30 days' AS DATE) AS plus30,
           CAST(last_day(CAST(o_orderdate AS DATE)) AS DATE) AS month_end
    FROM orders
    """,
    doc="Date/time family: trunc, extract, datediff, add, last_day "
        "(utils/date.py, provider.py watermark arithmetic)",
    tags=("scalar",),
)
def sc2(spark, sf_dir):
    o = t(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.date_trunc("month", "o_orderdate").cast("date").alias("month_start"),
        F.year("o_orderdate").alias("yr"),
        F.month("o_orderdate").alias("mo"),
        F.dayofmonth("o_orderdate").alias("dom"),
        F.datediff(F.col("o_orderdate").cast("date"), F.lit("1995-01-01").cast("date")).alias(
            "days_since"
        ),
        F.date_add(F.col("o_orderdate").cast("date"), 30).alias("plus30"),
        F.last_day(F.col("o_orderdate")).alias("month_end"),
    )


@register(
    "sc3_math_surface",
    """
    SELECT l_orderkey, l_linenumber,
           l_extendedprice * l_discount AS disc_amount,
           CAST(ceil(l_extendedprice) AS BIGINT) AS ceil_price,
           CAST(floor(l_extendedprice) AS BIGINT) AS floor_price,
           abs(l_discount - 0.05) AS dev,
           round(sqrt(l_quantity), 6) AS sqrt_qty,
           round(ln(l_extendedprice + 1), 6) AS log_price,
           CAST(l_partkey % 16 AS BIGINT) AS bucket,
           round(power(1 + l_tax, 2), 6) AS tax_sq
    FROM lineitem
    """,
    doc="Math family: round, ceil/floor, abs, sqrt, ln, mod, power "
        "(CVSS quantize github/parser.py:613-616, EPSS casts)",
    tags=("scalar",),
)
def sc3(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        # raw product, no round(): HALF_UP (Spark) vs half-even (DuckDB)
        # diverge exactly at the .xx5 boundaries these 4-decimal products hit
        (F.col("l_extendedprice") * F.col("l_discount")).alias("disc_amount"),
        F.ceil("l_extendedprice").alias("ceil_price"),
        F.floor("l_extendedprice").alias("floor_price"),
        F.abs(F.col("l_discount") - 0.05).alias("dev"),
        F.round(F.sqrt("l_quantity"), 6).alias("sqrt_qty"),
        F.round(F.log(F.col("l_extendedprice") + 1), 6).alias("log_price"),
        (F.col("l_partkey") % 16).alias("bucket"),
        F.round(F.pow(F.col("l_tax") + 1, 2), 6).alias("tax_sq"),
    )


@register(
    "sc4_array_surface",
    """
    SELECT p_partkey,
           array_to_string(string_split(p_name, ' '), '|') AS words,
           len(string_split(p_name, ' ')) AS n_words,
           list_contains(string_split(p_name, ' '), 'bolt') AS has_bolt,
           string_split(p_name, ' ')[1] AS first_word,
           array_to_string(list_sort(string_split(p_name, ' ')), '|') AS sorted_words,
           array_to_string(list_reverse(list_sort(string_split(p_name, ' '))), '|') AS rsorted
    FROM part
    """,
    doc="Array family: split, size, contains, indexing, sort, reverse "
        "(wolfi multi-id split, FixedIn sort utils/vulnerability.py:41). "
        "Arrays serialized '|'-joined (gate canonicalizer needs hashable "
        "scalars); the array ops themselves still run on real arrays",
    tags=("scalar",),
)
def sc4(spark, sf_dir):
    p = t(spark, sf_dir, "part")
    words = F.split("p_name", " ")
    return p.select(
        "p_partkey",
        F.concat_ws("|", words).alias("words"),
        F.size(words).alias("n_words"),
        F.array_contains(words, "bolt").alias("has_bolt"),
        F.element_at(words, 1).alias("first_word"),
        F.concat_ws("|", F.array_sort(words)).alias("sorted_words"),
        F.concat_ws("|", F.reverse(F.array_sort(words))).alias("rsorted"),
    )


@register(
    "sc5_json_surface",
    """
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS INT) AS k,
           (json_extract(props, '$.k') IS NOT NULL) AS has_k,
           CAST(json_extract_string(props, '$.missing') AS VARCHAR) AS missing
    FROM events
    """,
    doc="JSON family: field extraction with explicit null on miss "
        "(orjson loads in result.py; from_json with explicit schema)",
    tags=("scalar",),
)
def sc5(spark, sf_dir):
    ev = t(spark, sf_dir, "events")
    parsed = F.from_json("props", "k INT, missing STRING")
    return ev.select(
        "event_id",
        parsed["k"].alias("k"),
        parsed["k"].isNotNull().alias("has_k"),
        parsed["missing"].alias("missing"),
    )


@register(
    "sc6_hash_surface",
    """
    SELECT c_custkey,
           sha256(c_name) AS sha,
           md5(c_name) AS md5h
    FROM customer
    """,
    doc="Hash family: sha256/md5 content digests (utils/hasher.py:9-34); "
        "xxhash64 (the listing digest) is exercised JVM-side in dedup ops",
    tags=("scalar",),
)
def sc6(spark, sf_dir):
    c = t(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.sha2(F.col("c_name"), 256).alias("sha"),
        F.md5(F.col("c_name")).alias("md5h"),
    )


@register(
    "sc7_map_struct_surface",
    """
    SELECT o_orderkey,
           '{"status":"' || o_orderstatus || '","priority":"' || o_orderpriority || '"}' AS meta,
           o_orderstatus AS meta_status,
           o_totalprice * 1.1 AS adjusted
    FROM orders
    """,
    doc="Map/struct family: named_struct build + field access + withField-"
        "style patch (vulnerability_element template, osv.py:104-108)",
    tags=("scalar",),
)
def sc7(spark, sf_dir):
    o = t(spark, sf_dir, "orders")
    meta = F.struct(
        F.col("o_orderstatus").alias("status"), F.col("o_orderpriority").alias("priority")
    )
    # struct built, field-accessed, then serialized — the driver compare
    # needs scalar columns, so the struct ships as canonical JSON
    return o.select(
        "o_orderkey",
        F.to_json(meta).alias("meta"),
        meta["status"].alias("meta_status"),
        (F.col("o_totalprice") * 1.1).alias("adjusted"),
    )


@register(
    "sc8_bitwise_surface",
    """
    SELECT event_type,
           CAST(bit_and(user_id) AS BIGINT) AS band,
           CAST(bit_or(user_id) AS BIGINT) AS bor,
           CAST(bit_xor(user_id) AS BIGINT) AS bxor,
           CAST(sum(bit_count(user_id)) AS BIGINT) AS total_bits,
           CAST(min(user_id << 3) AS BIGINT) AS min_shl,
           CAST(max(user_id >> 2) AS BIGINT) AS max_shr
    FROM events WHERE user_id IS NOT NULL
    GROUP BY event_type
    """,
    doc="Bitwise family: bit_and/bit_or/bit_xor aggregates plus "
        "bit_count and shift scalars — the scalar-surface tier the "
        "i12 Bloom lanes and b-family bucket math build on, verified "
        "as first-class functions.  All exact BIGINT arithmetic: "
        "bitwise aggregates are commutative/associative, so the "
        "result is accumulation-order-free by construction",
    tags=("scalar", "events"),
)
def sc8(spark, sf_dir):
    ev = t(spark, sf_dir, "events").filter(F.col("user_id").isNotNull())
    return ev.groupBy("event_type").agg(
        F.bit_and("user_id").cast("bigint").alias("band"),
        F.bit_or("user_id").cast("bigint").alias("bor"),
        F.bit_xor("user_id").cast("bigint").alias("bxor"),
        F.sum(F.bit_count("user_id")).cast("bigint").alias("total_bits"),
        F.min(F.shiftleft("user_id", 3)).cast("bigint").alias("min_shl"),
        F.max(F.shiftright("user_id", 2)).cast("bigint").alias("max_shr"),
    )
