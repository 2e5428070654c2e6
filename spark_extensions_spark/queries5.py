"""t2 query registry, batch 8: scalar-surface completion batteries.

Registered into the shared registry (imported from queries4 at module
end). Same determinism rules as the queries.py docstring: every float
column is either IEEE-exact on both engines or computed from decimal
power sums with the *identical* formula text on both sides.

Covers the SURVEY §2.E scalar rows that earlier batches left out:
string (base64/overlay/locate/substring_index/octet+bit_length/
left/right/startswith/endswith/contains/find_in_set/elt), math
(bround/signum/shiftleft/shiftright/bit_count/hex/factorial/
try_divide), array (remove/union/intersect/except/position/join/
compact/insert/repeat/arrays_zip/min/max), map (transform_values/
map_filter/map_zip_with), date (make_date/from_unixtime/
to_unix_timestamp/unix_millis/unix_date/timestampadd/timestampdiff/
weekday/dayofyear), aggregates (skewness/kurtosis from decimal power
sums, bool_and/bool_or, count_if, bit_and/or/xor, mode, any_value),
and the generator forms ``inline`` and ``stack``.

Reference anchor: these are Layer-E rows of SURVEY.md §2.E — the
relational surface the reference provides by being Spark
(/root/reference/pom.xml:360-386, provided-scope spark-sql).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spark_extensions_spark.queries import _register, _t

_BRANDS_CSV = "Brand#11,Brand#22,Brand#33,Brand#44,Brand#55"


@_register(
    "string_battery3",
    f"""
    SELECT p_partkey,
           base64(p_brand::BLOB) AS brand_b64,
           substr(p_name, 1, 2) || '**' || substr(p_name, 5) AS name_overlay,
           CAST(strpos(p_name, 'al') AS INT) AS pos_al,
           array_to_string(list_slice(string_split(p_type, ' '), 1, 2), ' ')
             AS type_head2,
           CAST(octet_length(p_name::BLOB) AS INT) AS name_bytes,
           CAST(octet_length(p_name::BLOB) * 8 AS INT) AS name_bits,
           CAST(length(p_name) AS INT) AS name_chars,
           left(p_name, 4) AS name_l4,
           right(p_name, 4) AS name_r4,
           (p_type LIKE 'PROMO%') AS is_promo,
           (p_type LIKE '%STEEL') AS is_steel,
           contains(p_name, 'ol') AS has_ol,
           CAST(coalesce(list_position(string_split('{_BRANDS_CSV}', ','),
                                       p_brand), 0) AS INT) AS brand_slot,
           CASE ((p_size % 3) + 1) WHEN 1 THEN p_brand
                                   WHEN 2 THEN p_type
                                   ELSE p_name END AS elt_pick
    FROM part
    """,
    doc="String battery 3: base64, overlay, locate, substring_index, "
    "octet_length/bit_length/char_length, left/right, "
    "startswith/endswith/contains, find_in_set, elt.",
)
def q_string_battery3(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = _t(spark, sf_dir, "part")["part"]
    return p.select(
        "p_partkey",
        F.base64(F.col("p_brand").cast("binary")).alias("brand_b64"),
        F.overlay(F.col("p_name"), F.lit("**"), F.lit(3)).alias("name_overlay"),
        F.locate("al", F.col("p_name")).cast("int").alias("pos_al"),
        F.substring_index(F.col("p_type"), " ", 2).alias("type_head2"),
        F.octet_length(F.col("p_name")).cast("int").alias("name_bytes"),
        F.bit_length(F.col("p_name")).cast("int").alias("name_bits"),
        F.char_length(F.col("p_name")).cast("int").alias("name_chars"),
        F.expr("left(p_name, 4)").alias("name_l4"),
        F.expr("right(p_name, 4)").alias("name_r4"),
        F.startswith(F.col("p_type"), F.lit("PROMO")).alias("is_promo"),
        F.endswith(F.col("p_type"), F.lit("STEEL")).alias("is_steel"),
        F.contains(F.col("p_name"), F.lit("ol")).alias("has_ol"),
        F.expr(f"find_in_set(p_brand, '{_BRANDS_CSV}')")
        .cast("int")
        .alias("brand_slot"),
        F.expr("elt((p_size % 3) + 1, p_brand, p_type, p_name)").alias("elt_pick"),
    )


@_register(
    "math_battery2",
    """
    WITH t AS (SELECT *, CAST(round(l_extendedprice * 10000) AS BIGINT) AS cents4
               FROM lineitem)
    SELECT l_orderkey, l_linenumber,
           CAST(cents4 // 1000
                + CASE WHEN cents4 % 1000 > 500 THEN 1
                       WHEN cents4 % 1000 < 500 THEN 0
                       ELSE (cents4 // 1000) % 2 END AS DOUBLE) / 10.0 AS price_be,
           CAST(sign(l_discount - 0.05) AS DOUBLE) AS disc_sign,
           CAST((l_orderkey % 16)::INT << 2 AS INT) AS shl,
           CAST(l_orderkey >> 3 AS BIGINT) AS shr,
           CAST(bit_count(l_orderkey) AS INT) AS popcnt,
           upper(to_hex(l_orderkey)) AS key_hex,
           CAST(factorial(l_linenumber) AS BIGINT) AS fact_ln,
           l_quantity / nullif(l_linenumber - 1, 0) AS try_div,
           power(2.0, l_linenumber) AS pow2
    FROM t
    """,
    doc="Math battery 2: bround (HALF_EVEN), signum, shiftleft/"
    "shiftright, bit_count, hex, factorial, try_divide, pow. Spark's "
    "BRound rounds the shortest-repr decimal of a double while DuckDB's "
    "round_even rounds the binary value (76802.85 -> .8 vs .9), so both "
    "sides go through DECIMAL(18,4): Spark bround(decimal), oracle "
    "exact integer arithmetic on the scaled cents.",
)
def q_math_battery2(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")["lineitem"]
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.bround(F.expr("cast(l_extendedprice as decimal(18,4))"), 1)
        .cast("double")
        .alias("price_be"),
        F.signum(F.col("l_discount") - 0.05).cast("double").alias("disc_sign"),
        F.shiftleft((F.col("l_orderkey") % 16).cast("int"), 2)
        .cast("int")
        .alias("shl"),
        F.shiftright(F.col("l_orderkey"), 3).cast("bigint").alias("shr"),
        F.bit_count(F.col("l_orderkey")).cast("int").alias("popcnt"),
        F.hex(F.col("l_orderkey")).alias("key_hex"),
        F.factorial(F.col("l_linenumber")).cast("bigint").alias("fact_ln"),
        F.try_divide(F.col("l_quantity"), F.col("l_linenumber") - 1).alias("try_div"),
        F.pow(F.lit(2.0), F.col("l_linenumber")).alias("pow2"),
    )


@_register(
    "array_battery3",
    """
    WITH t AS (SELECT p_partkey, p_brand, p_type,
                      string_split(p_type, ' ') AS toks
               FROM part)
    SELECT p_partkey,
           coalesce(array_to_string(list_filter(toks, x -> x != 'STEEL'), ','), '')
             AS no_steel,
           array_to_string(list_sort(list_distinct(
             list_concat(toks, ['STEEL', 'METAL']))), ',') AS union_sorted,
           coalesce(array_to_string(list_sort(list_distinct(
             list_filter(toks, x -> x IN ('STEEL', 'METAL', 'BRUSHED')))), ','), '')
             AS isect_sorted,
           coalesce(array_to_string(list_sort(list_distinct(
             list_filter(toks, x -> x != 'STEEL'))), ','), '') AS except_sorted,
           CAST(coalesce(list_position(toks, 'STEEL'), 0) AS BIGINT) AS steel_pos,
           array_to_string(list_transform(list_append(toks, NULL),
                                          x -> coalesce(x, 'NA')), '-') AS join_na,
           array_to_string([p_brand, p_type], ',') AS compacted,
           array_to_string(list_concat(['X'], toks), ' ') AS inserted,
           array_to_string(list_transform(range(1, (p_partkey % 3) + 2),
                                          i -> p_brand), ',') AS brand_rep,
           array_to_string(list_transform(range(1, len(toks) + 1),
                                          i -> toks[i] || ':' || i), ',') AS zipped,
           list_aggregate(toks, 'max') AS tok_max,
           list_aggregate(toks, 'min') AS tok_min
    FROM t
    """,
    doc="Array battery 3: array_remove, array_union, array_intersect, "
    "array_except, array_position, array_join (null replacement), "
    "array_compact, array_insert, array_repeat, arrays_zip, "
    "array_max/array_min.",
)
def q_array_battery3(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = _t(spark, sf_dir, "part")["part"]
    toks = F.split(F.col("p_type"), " ")
    zipped = F.transform(
        F.arrays_zip(
            toks.alias("t"),
            F.sequence(F.lit(1), F.size(toks)).alias("i"),
        ),
        lambda s: F.concat(s["t"], F.lit(":"), s["i"].cast("string")),
    )
    # DuckDB's list ops have no union/except/intersect with Spark's exact
    # ordering guarantees, so every set-ish result is canonicalized
    # through array_sort+array_distinct on BOTH engines.
    return p.select(
        "p_partkey",
        F.concat_ws(",", F.array_remove(toks, "STEEL")).alias("no_steel"),
        F.concat_ws(
            ",", F.array_sort(F.array_union(toks, F.array(F.lit("STEEL"), F.lit("METAL"))))
        ).alias("union_sorted"),
        F.concat_ws(
            ",",
            F.array_sort(
                F.array_intersect(
                    toks, F.array(F.lit("STEEL"), F.lit("METAL"), F.lit("BRUSHED"))
                )
            ),
        ).alias("isect_sorted"),
        F.concat_ws(
            ",", F.array_sort(F.array_except(toks, F.array(F.lit("STEEL"))))
        ).alias("except_sorted"),
        F.array_position(toks, "STEEL").cast("bigint").alias("steel_pos"),
        F.array_join(
            F.concat(toks, F.array(F.lit(None).cast("string"))), "-", "NA"
        ).alias("join_na"),
        F.concat_ws(
            ",",
            F.array_compact(
                F.array(F.col("p_brand"), F.lit(None).cast("string"), F.col("p_type"))
            ),
        ).alias("compacted"),
        F.concat_ws(" ", F.array_insert(toks, 1, F.lit("X"))).alias("inserted"),
        F.concat_ws(
            ",", F.array_repeat(F.col("p_brand"), (F.col("p_partkey") % 3 + 1).cast("int"))
        ).alias("brand_rep"),
        F.concat_ws(",", zipped).alias("zipped"),
        F.array_max(toks).alias("tok_max"),
        F.array_min(toks).alias("tok_min"),
    )


@_register(
    "map_battery3",
    """
    WITH t AS (SELECT p_partkey,
                      list_sort(list_distinct(string_split(p_type, ' '))) AS ks
               FROM part)
    SELECT p_partkey,
           array_to_string(list_transform(ks, k -> k || '=' || (length(k) * 10)),
                           ',') AS vals_x10,
           coalesce(array_to_string(list_filter(ks, k -> length(k) % 2 = 0), ','),
                    '') AS even_keys,
           array_to_string(list_transform(ks, k -> k || '=' ||
                             (length(k) + ascii(k))), ',') AS zip_sum
    FROM t
    """,
    doc="Map battery 3: transform_values, map_filter, map_zip_with — "
    "maps serialized as key-sorted entry strings so DuckDB (whose MAP "
    "ops differ) can recompute the same content from the key list.",
)
def q_map_battery3(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = _t(spark, sf_dir, "part")["part"]
    ks = F.array_distinct(F.split(F.col("p_type"), " "))
    m_len = F.map_from_arrays(ks, F.transform(ks, lambda k: F.length(k)))
    m_ascii = F.map_from_arrays(ks, F.transform(ks, lambda k: F.ascii(k)))

    def _ser(m: F.Column) -> F.Column:
        sk = F.array_sort(F.map_keys(m))
        return F.concat_ws(
            ",",
            F.transform(
                sk, lambda k: F.concat(k, F.lit("="), F.element_at(m, k).cast("string"))
            ),
        )

    tv = F.transform_values(m_len, lambda k, v: v * 10)
    mf = F.map_filter(m_len, lambda k, v: v % 2 == 0)
    mz = F.map_zip_with(m_len, m_ascii, lambda k, a, b: a + b)
    return p.select(
        "p_partkey",
        _ser(tv).alias("vals_x10"),
        F.concat_ws(",", F.array_sort(F.map_keys(mf))).alias("even_keys"),
        _ser(mz).alias("zip_sum"),
    )


@_register(
    "date_battery4",
    """
    SELECT o_orderkey,
           make_date(CAST(year(o_orderdate) AS INT), CAST(month(o_orderdate) AS INT),
                     CAST(day(o_orderdate) AS INT)) AS md,
           strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') AS ts_str,
           CAST(epoch(o_orderdate) AS BIGINT) AS unix_s,
           CAST(epoch_ms(o_orderdate) AS BIGINT) AS unix_ms,
           CAST(o_orderdate::DATE - DATE '1970-01-01' AS INT) AS unix_d,
           (o_orderdate + to_hours(CAST(o_orderkey % 24 AS INT))) AS plus_h,
           CAST(date_diff('day', o_orderdate, TIMESTAMP '1998-12-01') AS BIGINT)
             AS days_to_cutoff,
           CAST(isodow(o_orderdate) - 1 AS INT) AS wkday,
           CAST(dayofyear(o_orderdate) AS INT) AS doy
    FROM orders
    """,
    doc="Date battery 4: make_date, from_unixtime, to_unix_timestamp, "
    "unix_millis, unix_date, timestampadd, timestampdiff, weekday, "
    "dayofyear.",
)
def q_date_battery4(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")["orders"]
    return o.select(
        "o_orderkey",
        F.make_date(
            F.year("o_orderdate"), F.month("o_orderdate"), F.dayofmonth("o_orderdate")
        ).alias("md"),
        F.from_unixtime(F.unix_timestamp(F.col("o_orderdate"))).alias("ts_str"),
        F.unix_timestamp(F.col("o_orderdate")).cast("bigint").alias("unix_s"),
        F.unix_millis(F.col("o_orderdate").cast("timestamp"))
        .cast("bigint")
        .alias("unix_ms"),
        F.unix_date(F.col("o_orderdate").cast("date")).cast("int").alias("unix_d"),
        F.expr("timestampadd(HOUR, o_orderkey % 24, o_orderdate)").alias("plus_h"),
        F.expr("timestampdiff(DAY, o_orderdate, timestamp'1998-12-01')")
        .cast("bigint")
        .alias("days_to_cutoff"),
        F.weekday(F.col("o_orderdate")).cast("int").alias("wkday"),
        F.dayofyear(F.col("o_orderdate")).cast("int").alias("doy"),
    )


@_register(
    "agg_stats2",
    """
    SELECT l_returnflag,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND((CAST(SUM(CAST(l_quantity*l_quantity*l_quantity AS DECIMAL(25,4))) AS DOUBLE) / COUNT(*)
                  - 3 * (CAST(SUM(CAST(l_quantity AS DECIMAL(20,4))) AS DOUBLE) / COUNT(*))
                      * (CAST(SUM(CAST(l_quantity*l_quantity AS DECIMAL(25,4))) AS DOUBLE) / COUNT(*))
                  + 2 * pow(CAST(SUM(CAST(l_quantity AS DECIMAL(20,4))) AS DOUBLE) / COUNT(*), 3))
                 / pow(CAST(SUM(CAST(l_quantity*l_quantity AS DECIMAL(25,4))) AS DOUBLE) / COUNT(*)
                       - pow(CAST(SUM(CAST(l_quantity AS DECIMAL(20,4))) AS DOUBLE) / COUNT(*), 2), 1.5),
                 6) AS qty_skew,
           ROUND((CAST(SUM(CAST(l_quantity*l_quantity*l_quantity*l_quantity AS DECIMAL(30,4))) AS DOUBLE) / COUNT(*)
                  - 4 * (CAST(SUM(CAST(l_quantity AS DECIMAL(20,4))) AS DOUBLE) / COUNT(*))
                      * (CAST(SUM(CAST(l_quantity*l_quantity*l_quantity AS DECIMAL(25,4))) AS DOUBLE) / COUNT(*))
                  + 6 * pow(CAST(SUM(CAST(l_quantity AS DECIMAL(20,4))) AS DOUBLE) / COUNT(*), 2)
                      * (CAST(SUM(CAST(l_quantity*l_quantity AS DECIMAL(25,4))) AS DOUBLE) / COUNT(*))
                  - 3 * pow(CAST(SUM(CAST(l_quantity AS DECIMAL(20,4))) AS DOUBLE) / COUNT(*), 4))
                 / pow(CAST(SUM(CAST(l_quantity*l_quantity AS DECIMAL(25,4))) AS DOUBLE) / COUNT(*)
                       - pow(CAST(SUM(CAST(l_quantity AS DECIMAL(20,4))) AS DOUBLE) / COUNT(*), 2), 2),
                 6) AS qty_kurt,
           bool_and(l_quantity > 0) AS all_pos,
           bool_or(l_discount > 0.09) AS any_big_disc,
           CAST(count_if(l_tax = 0) AS BIGINT) AS zero_tax,
           CAST(bit_and(l_orderkey) AS BIGINT) AS key_and,
           CAST(bit_or(l_orderkey) AS BIGINT) AS key_or,
           CAST(bit_xor(l_orderkey) AS BIGINT) AS key_xor,
           CAST(mode(l_linenumber) AS INT) AS ln_mode,
           max(l_returnflag || '!') AS flag_tag
    FROM lineitem GROUP BY l_returnflag
    """,
    doc="Aggregate battery 2: skewness/kurtosis as population moments "
    "from decimal power sums (identical formula text on both engines — "
    "no merge-formula FP drift), bool_and/bool_or, count_if, "
    "bit_and/bit_or/bit_xor, mode (tie-free: linenumber counts are "
    "strictly decreasing), any_value on a group-constant expression.",
)
def q_agg_stats2(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")["lineitem"]
    n = F.count("*")
    s1 = F.sum(F.expr("cast(l_quantity as decimal(20,4))")).cast("double")
    s2 = F.sum(F.expr("cast(l_quantity*l_quantity as decimal(25,4))")).cast("double")
    s3 = F.sum(
        F.expr("cast(l_quantity*l_quantity*l_quantity as decimal(25,4))")
    ).cast("double")
    s4 = F.sum(
        F.expr("cast(l_quantity*l_quantity*l_quantity*l_quantity as decimal(30,4))")
    ).cast("double")
    m1 = s1 / n
    m2r = s2 / n
    m3r = s3 / n
    m4r = s4 / n
    var = m2r - F.pow(m1, 2)
    skew = (m3r - 3 * m1 * m2r + 2 * F.pow(m1, 3)) / F.pow(var, 1.5)
    kurt = (m4r - 4 * m1 * m3r + 6 * F.pow(m1, 2) * m2r - 3 * F.pow(m1, 4)) / F.pow(
        var, 2
    )
    return li.groupBy("l_returnflag").agg(
        n.alias("n"),
        F.round(skew, 6).alias("qty_skew"),
        F.round(kurt, 6).alias("qty_kurt"),
        F.bool_and(F.col("l_quantity") > 0).alias("all_pos"),
        F.bool_or(F.col("l_discount") > 0.09).alias("any_big_disc"),
        F.count_if(F.col("l_tax") == 0).cast("bigint").alias("zero_tax"),
        F.bit_and(F.col("l_orderkey")).cast("bigint").alias("key_and"),
        F.bit_or(F.col("l_orderkey")).cast("bigint").alias("key_or"),
        F.bit_xor(F.col("l_orderkey")).cast("bigint").alias("key_xor"),
        F.mode(F.col("l_linenumber")).cast("int").alias("ln_mode"),
        F.any_value(F.concat(F.col("l_returnflag"), F.lit("!"))).alias("flag_tag"),
    )


@_register(
    "explode_inline",
    """
    SELECT p_partkey, 'lo' AS tag, p_size AS v FROM part
    UNION ALL
    SELECT p_partkey, 'hi' AS tag, p_size * 2 AS v FROM part
    """,
    doc="inline(array<struct>) generator — one output row per struct, "
    "struct fields become columns. Oracle is the equivalent UNION ALL.",
)
def q_explode_inline(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = _t(spark, sf_dir, "part")["part"]
    return p.select(
        "p_partkey",
        F.expr(
            "inline(array(struct('lo' as tag, p_size as v), "
            "struct('hi' as tag, p_size * 2 as v)))"
        ),
    )


@_register(
    "explode_stack",
    """
    SELECT p_partkey, 'brand' AS k, p_brand AS v FROM part
    UNION ALL
    SELECT p_partkey, 'type' AS k, p_type AS v FROM part
    """,
    doc="stack(n, k1, v1, k2, v2) wide-to-long generator. Oracle is the "
    "equivalent UNION ALL.",
)
def q_explode_stack(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = _t(spark, sf_dir, "part")["part"]
    return p.select(
        "p_partkey", F.expr("stack(2, 'brand', p_brand, 'type', p_type) as (k, v)")
    )


from spark_extensions_spark import queries6  # noqa: E402,F401  (registration side effect)
