"""Scalar-function-family catalog queries (SURVEY.md §2.2 "Scalar
functions"): one oracle-checked entry per family — string, date/time, math/
conditional, array (incl. higher-order), map, hash — plus the filter-
predicate shapes (IN / LIKE / IS NULL / BETWEEN), arbitrary GROUPING SETS,
and an order-verified global sort. JSON functions live in events_q.py
(the ``events.props`` column exists for them).

These are the reference's map-binary space (R2, ``mr-bins/map/map.cpp``):
every entry is a per-record transform the reference would express as a map
binary, here a Catalyst expression inside whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from irio_mapreduce_spark.io import read_table
from irio_mapreduce_spark.queries.catalog import register


@register(
    "fn_string_family",
    oracle="""
    SELECT c_custkey,
           upper(c_mktsegment) AS seg_upper,
           concat_ws('|', c_mktsegment, c_name) AS tagged,
           lpad(CAST(c_custkey AS VARCHAR), 8, '0') AS padded_key,
           regexp_extract(c_name, '([0-9]+)', 1) AS name_digits,
           regexp_replace(c_name, '[0-9]', '#', 'g') AS name_masked,
           substring(c_name, 1, 8) AS name_prefix,
           translate(c_mktsegment, 'AEIOU', 'aeiou') AS seg_folded,
           length(c_name) AS name_len,
           strpos(c_name, '#') AS hash_pos
    FROM customer
    WHERE c_custkey % 61 = 0
    """,
)
def fn_string_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String family: upper, concat_ws, lpad, regexp_extract/replace,
    substring, translate, length, instr."""
    c = read_table(spark, sf_dir, "customer").filter(F.col("c_custkey") % 61 == 0)
    return c.select(
        "c_custkey",
        F.upper("c_mktsegment").alias("seg_upper"),
        F.concat_ws("|", "c_mktsegment", "c_name").alias("tagged"),
        F.lpad(F.col("c_custkey").cast("string"), 8, "0").alias("padded_key"),
        F.regexp_extract("c_name", r"([0-9]+)", 1).alias("name_digits"),
        F.regexp_replace("c_name", r"[0-9]", "#").alias("name_masked"),
        F.substring("c_name", 1, 8).alias("name_prefix"),
        F.translate("c_mktsegment", "AEIOU", "aeiou").alias("seg_folded"),
        F.length("c_name").alias("name_len"),
        F.instr("c_name", "#").alias("hash_pos"),
    )


@register(
    "fn_datetime_family",
    oracle="""
    SELECT year(ts) AS y, month(ts) AS m,
           strftime(date_trunc('week', ts), '%Y-%m-%d') AS week_start,
           count(*) AS n,
           min(CAST(floor(epoch(ts)) AS BIGINT)) AS min_epoch,
           max(hour(ts)) AS max_hour,
           max(dayofweek(ts)) AS max_dow
    FROM events
    GROUP BY 1, 2, 3
    """,
)
def fn_datetime_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time family: year/month/hour/dayofweek extraction, date_trunc
    to week, unix epoch seconds — grouped so the output is a compact
    calendar rollup. (DuckDB dayofweek is 0=Sunday; Spark's matching
    function for that convention is ``dayofweek``-1.)"""
    e = read_table(spark, sf_dir, "events")
    return (
        e.select(
            F.year("ts").alias("y"),
            F.month("ts").alias("m"),
            F.date_format(F.date_trunc("week", F.col("ts")), "yyyy-MM-dd").alias(
                "week_start"
            ),
            F.unix_timestamp("ts").alias("epoch_s"),
            F.hour("ts").alias("h"),
            (F.dayofweek("ts") - 1).alias("dow"),
        )
        .groupBy("y", "m", "week_start")
        .agg(
            F.count("*").alias("n"),
            F.min("epoch_s").alias("min_epoch"),
            F.max("h").alias("max_hour"),
            F.max("dow").alias("max_dow"),
        )
    )


@register(
    "fn_math_conditional",
    oracle="""
    SELECT p_brand,
           round(CAST(sum(CAST(abs(p_retailprice - 1000.0) AS DECIMAL(38,10)))
                      AS DOUBLE), 2) AS sum_abs_dev,
           CAST(sum(CAST(floor(p_retailprice) + ceil(p_size / 10.0) AS BIGINT))
                AS BIGINT) AS sum_floors,
           round(CAST(sum(CAST(sqrt(p_retailprice) AS DECIMAL(38,10)))
                      AS DOUBLE), 4) AS sum_sqrt,
           CAST(sum(CAST(pow(p_size, 2) AS BIGINT)) AS BIGINT) AS sum_sq,
           CAST(sum(p_partkey % 7) AS BIGINT) AS sum_pmod,
           CAST(sum(CASE WHEN p_size > 25 THEN 1 ELSE 0 END) AS BIGINT) AS n_large,
           count(coalesce(nullif(p_type, 'STANDARD'), NULL)) AS n_nonstandard
    FROM part
    GROUP BY p_brand
    """,
)
def fn_math_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math + conditional/null family: abs/floor/ceil/sqrt/pow/pmod,
    when/otherwise, coalesce + nullif.

    Hash-stability conventions (see catalog.py docstring): double sums
    accumulate as DECIMAL(38,10) — decimal addition is exact and
    partition-order-insensitive, unlike ``round(sum(double))`` which can
    straddle a rounding boundary depending on merge order; integer-valued
    sums are summed as BIGINT on both sides (DuckDB integer ``sum()`` is
    HUGEINT, which pandas materializes as float64 -> hash mismatch vs
    Spark's long)."""
    p = read_table(spark, sf_dir, "part")
    dec = "decimal(38,10)"
    return p.groupBy("p_brand").agg(
        F.round(
            F.sum(F.abs(F.col("p_retailprice") - 1000.0).cast(dec)).cast("double"), 2
        ).alias("sum_abs_dev"),
        F.sum(
            (F.floor("p_retailprice") + F.ceil(F.col("p_size") / 10.0)).cast("long")
        ).alias("sum_floors"),
        F.round(F.sum(F.sqrt("p_retailprice").cast(dec)).cast("double"), 4).alias(
            "sum_sqrt"
        ),
        F.sum(F.pow("p_size", F.lit(2)).cast("long")).alias("sum_sq"),
        F.sum(F.pmod("p_partkey", F.lit(7))).alias("sum_pmod"),
        F.sum(F.when(F.col("p_size") > 25, 1).otherwise(0)).alias("n_large"),
        F.count(F.coalesce(F.nullif("p_type", F.lit("STANDARD")), F.lit(None))).alias(
            "n_nonstandard"
        ),
    )


@register(
    "fn_array_higher_order",
    oracle="""
    WITH t AS (SELECT doc_id,
                      list_filter(string_split_regex(lower(trim(text)), '\\s+'),
                                  w -> w <> '') AS toks
               FROM documents WHERE doc_id % 47 = 0)
    SELECT doc_id,
           len(toks) AS n_tokens,
           len(list_filter(toks, w -> length(w) > 4)) AS n_long,
           CAST(list_sum(list_transform(toks, w -> length(w))) AS BIGINT)
               AS total_chars,
           array_to_string(list_sort(list_distinct(toks))[1:3], ',') AS first3_sorted,
           toks[1] AS first_tok,
           list_contains(toks, 'the') AS has_the
    FROM t
    """,
)
def fn_array_higher_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array family incl. higher-order: split -> filter(lambda),
    transform(lambda) + aggregate (sum of lengths), sort_array,
    array_distinct, slice, array_join, element_at, array_contains."""
    d = read_table(spark, sf_dir, "documents").filter(F.col("doc_id") % 47 == 0)
    toks = F.filter(
        F.split(F.lower(F.trim(F.col("text"))), r"\s+"), lambda w: w != ""
    )
    return d.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        F.size(F.filter(toks, lambda w: F.length(w) > 4)).alias("n_long"),
        F.aggregate(
            F.transform(toks, lambda w: F.length(w).cast("long")),
            F.lit(0).cast("long"),
            lambda a, x: a + x,
        ).alias("total_chars"),
        F.array_join(
            F.slice(F.sort_array(F.array_distinct(toks)), 1, 3), ","
        ).alias("first3_sorted"),
        F.element_at(toks, 1).alias("first_tok"),
        F.array_contains(toks, "the").alias("has_the"),
    )


@register(
    "fn_map_family",
    oracle="""
    SELECT o_orderpriority AS k, count(*) AS n, round(sum(o_totalprice), 2) AS total
    FROM orders WHERE o_orderkey % 31 = 0
    GROUP BY k
    """,
)
def fn_map_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map family: create_map -> map_keys/map_values -> explode(map).
    The map is built from columns, exploded back to key/value rows, and
    aggregated — the round-trip proves the type plumbing; the oracle states
    the equivalent relational semantics."""
    o = read_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 31 == 0)
    mapped = o.select(
        F.create_map(F.lit("priority"), F.col("o_orderpriority")).alias("m"),
        "o_totalprice",
    )
    # demonstrate map_keys / map_values / element access, then explode
    exploded = mapped.select(
        F.explode("m").alias("k_name", "k"),
        F.map_keys("m").alias("_keys"),
        F.map_values("m").alias("_vals"),
        "o_totalprice",
    ).filter(F.size("_keys") == 1)
    return exploded.groupBy("k").agg(
        F.count("*").alias("n"), F.round(F.sum("o_totalprice"), 2).alias("total")
    )


@register(
    "fn_hash_family",
    oracle="""
    SELECT p_partkey,
           md5(p_name) AS name_md5,
           sha256(p_brand) AS brand_sha256,
           length(sha256(p_name)) AS sha_len
    FROM part WHERE p_partkey % 97 = 0
    """,
)
def fn_hash_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash family: md5 + sha2(256) (engine-portable digests, oracle-
    checked byte-for-byte). Spark-specific xxhash64/hash are exercised
    throughout the LSH operators (llm/dedup.py) where cross-engine parity
    is impossible by nature."""
    p = read_table(spark, sf_dir, "part").filter(F.col("p_partkey") % 97 == 0)
    return p.select(
        "p_partkey",
        F.md5("p_name").alias("name_md5"),
        F.sha2("p_brand", 256).alias("brand_sha256"),
        F.length(F.sha2("p_name", 256)).alias("sha_len"),
    )


@register(
    "filter_in_like_between",
    oracle="""
    SELECT o_orderpriority, count(*) AS n, round(sum(o_totalprice), 2) AS total
    FROM orders
    WHERE o_orderpriority IN ('1-URGENT', '3-MEDIUM', '5-LOW')
      AND o_orderstatus LIKE 'F%'
      AND o_totalprice BETWEEN 1000 AND 200000
      AND o_orderdate IS NOT NULL
    GROUP BY o_orderpriority
    """,
)
def filter_in_like_between(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filter-predicate shapes: IN-list, LIKE prefix, BETWEEN, IS NOT NULL
    — all plain scan predicates, so every one reaches parquet as a pushed
    filter (asserted in tests/test_plans.py)."""
    o = read_table(spark, sf_dir, "orders")
    return (
        o.filter(
            F.col("o_orderpriority").isin("1-URGENT", "3-MEDIUM", "5-LOW")
            & F.col("o_orderstatus").like("F%")
            & F.col("o_totalprice").between(1000, 200000)
            & F.col("o_orderdate").isNotNull()
        )
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum("o_totalprice"), 2).alias("total"),
        )
    )


@register(
    "agg_grouping_sets",
    oracle="""
    SELECT o_orderpriority, o_orderstatus,
           grouping(o_orderpriority, o_orderstatus) AS gid,
           count(*) AS n, round(sum(o_totalprice), 2) AS total
    FROM orders
    GROUP BY GROUPING SETS ((o_orderpriority), (o_orderstatus), ())
    """,
)
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arbitrary GROUPING SETS (not expressible as rollup/cube): priority
    totals, status totals, and the grand total in one pass."""
    o = read_table(spark, sf_dir, "orders")
    o.createOrReplaceTempView("_gs_orders")
    return spark.sql(
        """
        SELECT o_orderpriority, o_orderstatus,
               grouping_id(o_orderpriority, o_orderstatus) AS gid,
               count(*) AS n, round(sum(o_totalprice), 2) AS total
        FROM _gs_orders
        GROUP BY GROUPING SETS ((o_orderpriority), (o_orderstatus), ())
        """
    )


@register(
    "sort_global_total_order",
    oracle="""
    SELECT o_orderkey, o_totalprice,
           row_number() OVER (ORDER BY o_totalprice DESC, o_orderkey) AS pos
    FROM orders
    WHERE o_custkey % 211 = 0
    """,
)
def sort_global_total_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global total-order sort made observable: each row carries its global
    position, so the oracle comparison actually verifies the ORDER, not
    just the set. ``orderBy`` range-partitions (sampled boundaries) — the
    position stamp here uses a single-partition window, acceptable on the
    filtered subset; at full scale the equivalent is zipWithIndex over the
    range-partitioned sort."""
    o = read_table(spark, sf_dir, "orders").filter(F.col("o_custkey") % 211 == 0)
    from pyspark.sql import Window

    w = Window.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
    return o.select("o_orderkey", "o_totalprice").withColumn(
        "pos", F.row_number().over(w)
    )


@register(
    "profile_documents_columns",
    oracle="""
    SELECT 'doc_id' AS col,
           CAST(count(*) - count(doc_id) AS BIGINT) AS n_nulls,
           CAST(count(DISTINCT doc_id) AS BIGINT) AS n_distinct,
           CAST(min(doc_id) AS VARCHAR) AS min_str,
           CAST(max(doc_id) AS VARCHAR) AS max_str
    FROM documents
    UNION ALL
    SELECT 'lang', CAST(count(*) - count(lang) AS BIGINT),
           CAST(count(DISTINCT lang) AS BIGINT),
           CAST(min(lang) AS VARCHAR), CAST(max(lang) AS VARCHAR)
    FROM documents
    UNION ALL
    SELECT 'source', CAST(count(*) - count(source) AS BIGINT),
           CAST(count(DISTINCT source) AS BIGINT),
           CAST(min(source) AS VARCHAR), CAST(max(source) AS VARCHAR)
    FROM documents
    UNION ALL
    SELECT 'n_chars', CAST(count(*) - count(n_chars) AS BIGINT),
           CAST(count(DISTINCT n_chars) AS BIGINT),
           CAST(min(n_chars) AS VARCHAR), CAST(max(n_chars) AS VARCHAR)
    FROM documents
    """,
)
def profile_documents_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column-profiling surface (the ANALYZE/stats-collection step that
    feeds CBO and data-quality monitoring): per column, null count, exact
    distinct count, and min/max rendered as strings so one schema carries
    every type. Computed in ONE pass over the table — a single aggregate
    evaluates all per-column expressions simultaneously (count_distinct
    per column partial-aggregates map-side), then the wide row unpivots to
    the (col, stat...) shape. The oracle computes each column's profile
    independently; a hash match proves the fused single-pass form equals
    the per-column truth. At 100 TB: one scan, no joins; distinct counts
    are the only shuffle-bearing state (swap in approx_count_distinct when
    exactness isn't required — the catalog's sketch entries cover that
    trade)."""
    docs = read_table(spark, sf_dir, "documents")
    cols = ["doc_id", "lang", "source", "n_chars"]
    aggs = []
    for c in cols:
        aggs += [
            (F.count(F.lit(1)) - F.count(c)).cast("long").alias(f"{c}__nulls"),
            F.count_distinct(F.col(c)).cast("long").alias(f"{c}__distinct"),
            F.min(c).cast("string").alias(f"{c}__min"),
            F.max(c).cast("string").alias(f"{c}__max"),
        ]
    wide = docs.agg(*aggs)
    stack_expr = ", ".join(
        f"'{c}', {c}__nulls, {c}__distinct, {c}__min, {c}__max" for c in cols
    )
    return wide.select(
        F.expr(
            f"stack({len(cols)}, {stack_expr}) AS "
            "(col, n_nulls, n_distinct, min_str, max_str)"
        )
    )


@register(
    "fn_bitwise_family",
    oracle="""
    SELECT l_linenumber,
           CAST(bit_and(CAST(l_quantity AS BIGINT)) AS BIGINT) AS q_and,
           CAST(bit_or(CAST(l_quantity AS BIGINT)) AS BIGINT) AS q_or,
           CAST(bit_xor(CAST(l_quantity AS BIGINT)) AS BIGINT) AS q_xor,
           CAST(sum(CAST(l_quantity AS BIGINT) & 7) AS BIGINT) AS low3_sum,
           CAST(sum(CAST(l_quantity AS BIGINT) >> 2) AS BIGINT) AS hi_sum,
           CAST(sum(xor(CAST(l_quantity AS BIGINT), 21)) AS BIGINT) AS xor21_sum
    FROM lineitem GROUP BY l_linenumber
    """,
)
def fn_bitwise_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise family — scalar ops (&, >>, xor) and the bit_and / bit_or /
    bit_xor aggregates (the machinery behind the Bloom word table and flag
    packing generally). Integer-exact everywhere; grouped by line number
    so the aggregates fold across a real distribution of values."""
    li = read_table(spark, sf_dir, "lineitem").select(
        "l_linenumber", F.col("l_quantity").cast("long").alias("q")
    )
    return li.groupBy("l_linenumber").agg(
        F.bit_and("q").cast("long").alias("q_and"),
        F.bit_or("q").cast("long").alias("q_or"),
        F.bit_xor("q").cast("long").alias("q_xor"),
        F.sum(F.col("q").bitwiseAND(F.lit(7))).cast("long").alias("low3_sum"),
        F.sum(F.shiftright("q", 2)).cast("long").alias("hi_sum"),
        F.sum(F.col("q").bitwiseXOR(F.lit(21))).cast("long").alias("xor21_sum"),
    )


@register(
    "fn_binary_family",
    oracle="""
    SELECT p_partkey,
           to_base64(encode(p_name)) AS name_b64,
           hex(encode(p_brand)) AS brand_hex,
           CAST(octet_length(encode(p_name)) AS BIGINT) AS name_bytes,
           CAST(decode(from_base64(to_base64(encode(p_name)))) = p_name
                AS INTEGER) AS b64_roundtrip,
           CAST(decode(unhex(hex(encode(p_brand)))) = p_brand
                AS INTEGER) AS hex_roundtrip
    FROM part WHERE p_partkey % 89 = 0
    """,
)
def fn_binary_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary/encoding scalar family — the byte-level plumbing functions a
    multimodal pipeline leans on around its payload columns: base64 and
    hex transcodes (oracle-checked byte-for-byte against DuckDB's
    ``to_base64``/``hex``), UTF-8 ``encode`` octet lengths, and both
    decode roundtrips as hash-checked booleans. All JVM built-ins, no
    shuffle — a pure scan-side projection."""
    p = read_table(spark, sf_dir, "part").filter(F.col("p_partkey") % 89 == 0)
    name_bin = F.encode(F.col("p_name"), "UTF-8")
    brand_bin = F.encode(F.col("p_brand"), "UTF-8")
    return p.select(
        "p_partkey",
        F.base64(name_bin).alias("name_b64"),
        F.hex(brand_bin).alias("brand_hex"),
        F.octet_length(F.col("p_name")).cast("long").alias("name_bytes"),
        (
            F.decode(F.unbase64(F.base64(name_bin)), "UTF-8")
            == F.col("p_name")
        )
        .cast("int")
        .alias("b64_roundtrip"),
        (
            F.decode(F.unhex(F.hex(brand_bin)), "UTF-8") == F.col("p_brand")
        )
        .cast("int")
        .alias("hex_roundtrip"),
    )


@register(
    "fn_crypto_family",
    oracle="""
    SELECT p_partkey,
           1 AS aes_roundtrip,
           CAST(16 * (length(p_name) // 16 + 1) AS BIGINT) AS ct_bytes,
           1 AS tamper_nulls
    FROM part WHERE p_partkey % 101 = 0
    """,
)
def fn_crypto_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column-level encryption family (``aes_encrypt``/``aes_decrypt`` —
    the at-rest PII-protection primitive): deterministic AES-128-ECB per
    row, hash-checked through an identity-style oracle (DuckDB has no
    AES): the decrypt(encrypt(x)) == x roundtrip as a flag, the exact
    PKCS#7 ciphertext length (16·(⌊len/16⌋+1) — a wrong padding mode or
    key size breaks it), and ``try_aes_decrypt`` returning NULL (flag 1)
    on a tampered ciphertext instead of a mid-job crash. ECB is used
    PRECISELY because it is deterministic (hash-comparable); the
    production mode for real data is GCM, whose random IV is the point —
    documented, not hash-checkable."""
    key = "0123456789abcdef"
    p = read_table(spark, sf_dir, "part").filter(F.col("p_partkey") % 101 == 0)
    ct = F.expr(f"aes_encrypt(p_name, '{key}', 'ECB')")
    rt = F.expr(
        f"cast(aes_decrypt(aes_encrypt(p_name, '{key}', 'ECB'), '{key}', 'ECB') as string)"
    )
    tampered = F.expr(
        f"try_aes_decrypt(concat(aes_encrypt(p_name, '{key}', 'ECB'), X'00'), '{key}', 'ECB')"
    )
    return p.select(
        "p_partkey",
        (rt == F.col("p_name")).cast("int").alias("aes_roundtrip"),
        F.length(ct).cast("long").alias("ct_bytes"),
        tampered.isNull().cast("int").alias("tamper_nulls"),
    )


@register(
    "fn_url_family",
    oracle="""
    SELECT p_partkey,
           'parts.example.com' AS u_host,
           '/catalog/' || CAST(p_size AS VARCHAR) AS u_path,
           p_type AS u_type_decoded,
           CAST(p_size AS BIGINT) AS u_size
    FROM part WHERE p_partkey % 79 = 0
    """,
)
def fn_url_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL scalar family (``parse_url`` HOST/PATH/QUERY-param forms +
    ``url_encode``/``url_decode``): each row builds a URL in-query with
    its type percent-encoded into a query parameter, then parses every
    component back — the oracle states the expected components directly
    from the raw columns, so the hash match proves build → encode →
    parse → decode is the identity (spaces round-tripping through '+' is
    the classic breakage). Complements ``text_url_canonicalize``, which
    deliberately avoids parse_url to stay shuffle-free on the Java∩RE2
    regex subset."""
    p = read_table(spark, sf_dir, "part").filter(F.col("p_partkey") % 79 == 0)
    url = F.concat(
        F.lit("https://parts.example.com/catalog/"),
        F.col("p_size").cast("string"),
        F.lit("?type="),
        F.expr("url_encode(p_type)"),
        F.lit("&size="),
        F.col("p_size").cast("string"),
    )
    return p.select(
        "p_partkey",
        F.parse_url(url, F.lit("HOST")).alias("u_host"),
        F.parse_url(url, F.lit("PATH")).alias("u_path"),
        F.expr(
            "url_decode(parse_url(concat('https://parts.example.com/catalog/', "
            "cast(p_size as string), '?type=', url_encode(p_type), '&size=', "
            "cast(p_size as string)), 'QUERY', 'type'))"
        ).alias("u_type_decoded"),
        F.parse_url(url, F.lit("QUERY"), F.lit("size")).cast("long").alias("u_size"),
    )


@register(
    "fn_csv_scalar_family",
    oracle="""
    SELECT o_orderkey,
           CAST(o_orderkey AS VARCHAR) || ',' || o_orderpriority AS csv_line,
           o_orderpriority AS rt_priority,
           CAST(o_orderkey AS BIGINT) AS rt_key,
           1 AS price_roundtrip
    FROM orders WHERE o_orderkey % 997 = 0
    """,
)
def fn_csv_scalar_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CSV SCALAR family (``to_csv`` / ``from_csv`` / ``schema_of_csv``'s
    runtime kin): rows serialize to CSV strings in-query and parse back to
    typed structs — the per-row form of the file-level roundtrip entry
    (embedded CSV in message payloads). Integer/string fields compare
    directly against the oracle's string concatenation; the double field
    round-trips through text as an equality FLAG (Java's shortest-repr
    double formatting is engine-specific text, but parse(format(x)) == x
    is exact)."""
    o = read_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 997 == 0)
    line = F.to_csv(F.struct(F.col("o_orderkey"), F.col("o_orderpriority")))
    back = F.from_csv(line, F.lit("k BIGINT, pri STRING"))
    price_line = F.to_csv(F.struct(F.col("o_totalprice")))
    price_back = F.from_csv(price_line, F.lit("v DOUBLE"))
    return o.select(
        "o_orderkey",
        line.alias("csv_line"),
        back["pri"].alias("rt_priority"),
        back["k"].cast("long").alias("rt_key"),
        (price_back["v"] == F.col("o_totalprice")).cast("int").alias("price_roundtrip"),
    )


@register(
    "fn_collation_family",
    oracle="""
    WITH mixed AS (
      SELECT CASE WHEN p_partkey % 2 = 0 THEN upper(p_type)
                  ELSE lower(p_type) END AS t
      FROM part)
    SELECT lower(t) AS type_lc,
           CAST(count(*) AS BIGINT) AS n,
           CAST(count(DISTINCT t) AS BIGINT) AS n_case_variants
    FROM mixed GROUP BY lower(t)
    """,
)
def fn_collation_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COLLATION-aware grouping (Spark 4's collation support, headline
    SQL-surface feature): part types are case-mangled in-query, then
    grouped under ``COLLATE UTF8_LCASE`` — the collation makes 'STANDARD
    X' and 'standard x' ONE group without rewriting the data through
    lower(). The oracle states the equivalent lower()-keyed grouping, so
    the hash match proves the collated GROUP BY produces exactly the
    case-insensitive partition (group keys are emitted lower-cased:
    which case variant a collated group displays is engine-internal,
    the partition itself is the semantics). ``n_case_variants`` counts
    the binary-distinct spellings each collated group absorbed (2 for
    every type present under both parities)."""
    p = read_table(spark, sf_dir, "part")
    mixed = p.select(
        F.when(
            F.col("p_partkey") % 2 == 0, F.upper(F.col("p_type"))
        )
        .otherwise(F.lower(F.col("p_type")))
        .alias("t")
    )
    mixed.createOrReplaceTempView("mixed_types_v")
    return spark.sql(
        """
        SELECT lower(t) AS type_lc,
               CAST(count(*) AS BIGINT) AS n,
               CAST(count(DISTINCT t COLLATE UTF8_BINARY) AS BIGINT)
                 AS n_case_variants
        FROM mixed_types_v
        GROUP BY t COLLATE UTF8_LCASE, lower(t)
        """
    )


@register(
    "fn_try_family",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           CASE WHEN l_discount = 0 THEN NULL
                ELSE CAST(floor(CAST(CAST(floor(l_extendedprice * 100 + 0.5)
                                          AS BIGINT) AS DOUBLE)
                                / CAST(CAST(round(l_discount * 100)
                                            AS BIGINT) AS DOUBLE))
                          AS BIGINT) END AS safe_div_fp,
           CAST(NULL AS BIGINT) AS overflow_add,
           CAST(NULL AS INTEGER) AS bad_cast,
           CAST(l_quantity AS BIGINT) AS parsed_qty,
           CAST(NULL AS BIGINT) AS oob_element
    FROM lineitem WHERE l_orderkey % 499 = 0 AND l_linenumber = 1
    """,
)
def fn_try_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ``try_*`` error-safe family — load-bearing under Spark 4's
    ANSI-on default, where a single bad row otherwise kills a 100 TB job
    mid-stage: ``try_divide`` (NULL on zero — exactly DuckDB's ``/``
    via the CASE in the oracle), ``try_add`` at BIGINT max (overflow →
    NULL, never a wrapped value), ``try_cast`` on unparseable text,
    ``try_to_number`` with a format, and ``try_element_at`` out of
    bounds. Each column's expected value is stated directly by the
    oracle, so this family is hash-checked rather than merely
    crash-free. l_discount is 0 for some rows — the divide column
    exercises BOTH branches on real data."""
    li = read_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_orderkey") % 499 == 0) & (F.col("l_linenumber") == 1)
    )
    return li.select(
        "l_orderkey",
        "l_linenumber",
        # floor of ONE correctly-rounded double division over exact
        # integer operands — cross-engine exact; round(double-quotient, 2)
        # is the banned q11 half-boundary pattern
        F.floor(
            F.try_divide(
                F.floor(F.col("l_extendedprice") * 100 + 0.5).cast("long"),
                F.round(F.col("l_discount") * 100, 0).cast("long"),
            )
        )
        .cast("long")
        .alias("safe_div_fp"),
        F.try_add(
            F.lit(9223372036854775807), F.col("l_orderkey") + 1
        ).alias("overflow_add"),  # key+1 >= 1, so the add ALWAYS overflows
        F.expr("try_cast(concat('x', l_returnflag) AS INT)").alias("bad_cast"),
        F.expr("CAST(try_to_number(cast(cast(l_quantity as bigint) as string), '999999') AS BIGINT)").alias("parsed_qty"),
        F.try_element_at(F.array(F.col("l_orderkey")), F.lit(5)).alias("oob_element"),
    )


@register(
    "fn_listagg_family",
    oracle="""
    SELECT r_name,
           string_agg(n_name, ',' ORDER BY n_name) AS nations_csv,
           string_agg(CAST(n_nationkey AS VARCHAR), '|' ORDER BY n_nationkey)
             AS keys_piped,
           CAST(count(*) AS BIGINT) AS n_nations
    FROM nation JOIN region ON n_regionkey = r_regionkey
    GROUP BY r_name
    """,
)
def fn_listagg_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL:2023 ``listagg ... WITHIN GROUP (ORDER BY ...)`` (new in Spark
    4): ordered string aggregation — the ONLY deterministic form (an
    unordered listagg is partition-merge-order-dependent and could never
    hash-match across engines; the within-group sort with a unique key is
    what makes the output exact). DuckDB spells it ``string_agg(expr,
    sep ORDER BY ...)``; both sides produce identical CSV/piped strings.
    At scale listagg is a single grouped aggregate — the per-group sort
    happens inside the aggregate buffer, no global sort."""
    read_table(spark, sf_dir, "nation").createOrReplaceTempView("nation_la_v")
    read_table(spark, sf_dir, "region").createOrReplaceTempView("region_la_v")
    return spark.sql(
        """
        SELECT r_name,
               listagg(n_name, ',') WITHIN GROUP (ORDER BY n_name)
                 AS nations_csv,
               listagg(CAST(n_nationkey AS STRING), '|')
                 WITHIN GROUP (ORDER BY n_nationkey) AS keys_piped,
               CAST(count(*) AS BIGINT) AS n_nations
        FROM nation_la_v JOIN region_la_v ON n_regionkey = r_regionkey
        GROUP BY r_name
        """
    )


@register(
    "fn_sql_scripting",
    oracle="""
    WITH pc AS (
      SELECT o_orderpriority AS p, count(*) AS c
      FROM orders GROUP BY o_orderpriority),
    r AS (SELECT c, row_number() OVER (ORDER BY p) AS rn FROM pc)
    SELECT CAST(count(*) AS BIGINT) AS n_priorities,
           CAST(sum(c * rn) AS BIGINT) AS rank_weighted_total
    FROM r
    """,
)
def fn_sql_scripting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL SCRIPTING (SQL/PSM compound statements, new in Spark 4.1):
    DECLARE'd session variables, a FOR cursor loop over a query result,
    and SET accumulation — the procedural surface a migrating stored-
    procedure user needs. The block walks the order-priority counts in
    ORDER BY order accumulating a rank-weighted total; the oracle states
    the same computation declaratively (row_number + sum), proving the
    imperative loop and the declarative form agree exactly.

    Scale note: scripting is DRIVER-side control flow — each statement
    inside the block is still a full distributed query; the loop here
    iterates over a 5-row AGGREGATE, never raw data. Anything per-row
    imperative at 100 TB belongs in an expression, not a cursor."""
    read_table(spark, sf_dir, "orders").createOrReplaceTempView(
        "orders_script_v"
    )
    return spark.sql(
        """
        BEGIN
          DECLARE total BIGINT DEFAULT 0;
          DECLARE n INT DEFAULT 0;
          FOR rec AS SELECT o_orderpriority AS p,
                            CAST(count(*) AS BIGINT) AS c
                     FROM orders_script_v
                     GROUP BY o_orderpriority ORDER BY o_orderpriority DO
            SET n = n + 1;
            SET total = total + rec.c * n;
          END FOR;
          SELECT CAST(n AS BIGINT) AS n_priorities,
                 CAST(total AS BIGINT) AS rank_weighted_total;
        END
        """
    )


@register(
    "fn_pipe_sql_syntax",
    oracle="""
    SELECT n_name,
           CAST(count(*) AS BIGINT) AS n_customers,
           CAST(sum(CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT)) AS BIGINT)
             AS acctbal_cents
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    WHERE c_mktsegment = 'BUILDING'
    GROUP BY n_name
    HAVING count(*) >= 2
    """,
)
def fn_pipe_sql_syntax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL PIPE SYNTAX (Spark 4's ``|>`` operators, the linear query
    form from the SQL-has-problems line of work): scan |> join |> filter
    |> aggregate |> filter-on-aggregate, each stage reading top-to-
    bottom instead of inside-out. Catalyst compiles it to the SAME plan
    as the nested form — the oracle IS that nested form, so the hash
    match proves pipe syntax is surface, not semantics. Money in exact
    cents per the half-boundary convention."""
    read_table(spark, sf_dir, "customer").createOrReplaceTempView(
        "customer_pipe_v"
    )
    read_table(spark, sf_dir, "nation").createOrReplaceTempView(
        "nation_pipe_v"
    )
    return spark.sql(
        """
        FROM customer_pipe_v
        |> JOIN nation_pipe_v ON c_nationkey = n_nationkey
        |> WHERE c_mktsegment = 'BUILDING'
        |> AGGREGATE CAST(count(*) AS BIGINT) AS n_customers,
                     CAST(sum(CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT))
                          AS BIGINT) AS acctbal_cents
           GROUP BY n_name
        |> WHERE n_customers >= 2
        """
    )


@register(
    "fn_session_variables",
    oracle="""
    SELECT o_orderpriority,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
                AS BIGINT) AS total_cents
    FROM orders
    WHERE o_totalprice >= 150000 AND o_custkey % 3 = 0
    GROUP BY o_orderpriority
    """,
)
def fn_session_variables(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL SESSION VARIABLES (SQL:2016 / Spark 4 ``DECLARE VARIABLE`` /
    ``SET VARIABLE``): typed, session-scoped scalars referenced directly
    in queries — the parameterization surface for SQL-only users (no
    string interpolation, no injection, constant-folded into the plan so
    predicate pushdown still sees a literal). The entry declares a price
    threshold and a cohort modulus, updates one with SET, and filters
    through both; the oracle inlines the final values."""
    read_table(spark, sf_dir, "orders").createOrReplaceTempView(
        "orders_var_v"
    )
    spark.sql(
        "DECLARE OR REPLACE VARIABLE price_floor DOUBLE DEFAULT 100000.0"
    )
    spark.sql("DECLARE OR REPLACE VARIABLE cohort_mod BIGINT DEFAULT 3")
    spark.sql("SET VARIABLE price_floor = 150000.0")
    return spark.sql(
        """
        SELECT o_orderpriority,
               CAST(count(*) AS BIGINT) AS n_orders,
               CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
                    AS BIGINT) AS total_cents
        FROM orders_var_v
        WHERE o_totalprice >= price_floor AND o_custkey % cohort_mod = 0
        GROUP BY o_orderpriority
        """
    )


@register(
    "fn_interval_family",
    oracle="""
    SELECT o_orderkey,
           strftime(o_orderdate + to_days(90), '%Y-%m-%d') AS due_90d,
           strftime(o_orderdate + to_months(CAST(o_orderkey % 12 AS INTEGER)),
                    '%Y-%m-%d') AS staggered_month,
           datediff('day', o_orderdate, o_orderdate + to_days(90))
             AS days_to_due,
           strftime(last_day(o_orderdate), '%Y-%m-%d') AS month_end,
           strftime(date_trunc('quarter', o_orderdate), '%Y-%m-%d')
             AS quarter_start
    FROM orders WHERE o_orderkey % 101 = 0
    """,
)
def fn_interval_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERVAL-arithmetic family: timestamp ± day/month intervals
    (``make_interval`` with a COLUMN month count — the per-row interval
    case), day differences, ``last_day``, quarter truncation. The
    treacherous semantics this entry pins cross-engine: month addition
    CLAMPS to month end (Jan 31 + 1 month = Feb 29 in 2020 — probed
    identical in both engines), and day intervals preserve time-of-day.
    Outputs formatted to strings per the no-raw-timestamp convention."""
    o = read_table(spark, sf_dir, "orders").filter(
        F.col("o_orderkey") % 101 == 0
    )
    fmt = "yyyy-MM-dd"
    return o.select(
        "o_orderkey",
        F.date_format(
            F.col("o_orderdate") + F.expr("make_interval(0, 0, 0, 90)"), fmt
        ).alias("due_90d"),
        F.date_format(
            F.col("o_orderdate")
            + F.expr("make_interval(0, CAST(o_orderkey % 12 AS INT))"),
            fmt,
        ).alias("staggered_month"),
        F.datediff(
            F.col("o_orderdate") + F.expr("make_interval(0, 0, 0, 90)"),
            F.col("o_orderdate"),
        ).cast("long").alias("days_to_due"),
        F.date_format(F.last_day("o_orderdate"), fmt).alias("month_end"),
        F.date_format(F.date_trunc("quarter", F.col("o_orderdate")), fmt).alias(
            "quarter_start"
        ),
    )


@register(
    "fn_sql_udf_family",
    oracle="""
    SELECT s.sz,
           CAST(count(p.p_partkey) AS BIGINT) AS n_parts,
           CAST(coalesce(sum(CAST(floor(p.p_retailprice * 100 + 0.5)
                                  AS BIGINT)), 0) AS BIGINT) AS retail_cents,
           CAST(count(p.p_partkey) * 2 AS BIGINT) AS double_parts
    FROM (VALUES (1), (2), (3)) s(sz)
      LEFT JOIN part p ON p.p_size = s.sz
    GROUP BY s.sz
    """,
)
def fn_sql_udf_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL-DEFINED functions (SQL:2016 / Spark 4 ``CREATE FUNCTION ...
    RETURN``) — the catalog-resident UDF tier BELOW Python: a scalar SQL
    UDF (exact cents), a SQL TABLE function whose body parameterizes a
    real table scan (through an ``IDENTIFIER()`` constant-string table
    reference — the SQL-injection-safe dynamic-name clause), the table
    function consumed via correlated LATERAL, and a LATERAL COLUMN ALIAS
    (``double_parts`` references the ``n_parts`` alias defined in the
    same SELECT). Everything here stays INSIDE Catalyst — SQL UDFs
    inline into the plan (the cents expression reaches codegen; nothing
    crosses to Python), which is exactly why they beat Python UDFs as
    the first resort for reusable logic at 100 TB. The oracle restates
    the whole composition as one declarative join, so the hash match
    proves inlining preserves semantics."""
    read_table(spark, sf_dir, "part").createOrReplaceTempView(
        "fn_sqludf_part_v"
    )
    spark.sql(
        """
        CREATE OR REPLACE TEMPORARY FUNCTION fn_sqludf_cents(x DOUBLE)
        RETURNS BIGINT RETURN CAST(floor(x * 100 + 0.5) AS BIGINT)
        """
    )
    spark.sql(
        """
        CREATE OR REPLACE TEMPORARY FUNCTION fn_sqludf_parts_of_size(sz INT)
        RETURNS TABLE(p_partkey BIGINT, p_retailprice DOUBLE)
        RETURN SELECT p_partkey, p_retailprice
               FROM IDENTIFIER('fn_sqludf_part_v') WHERE p_size = sz
        """
    )
    return spark.sql(
        """
        SELECT s.sz,
               t.n_parts AS n_parts,
               t.retail_cents,
               n_parts * 2 AS double_parts
        FROM (VALUES (1), (2), (3)) s(sz),
          LATERAL (
            SELECT CAST(count(*) AS BIGINT) AS n_parts,
                   CAST(coalesce(sum(fn_sqludf_cents(p_retailprice)), 0)
                        AS BIGINT) AS retail_cents
            FROM fn_sqludf_parts_of_size(s.sz)
          ) t
        """
    )


@register(
    "fn_variant_family",
    oracle="""
    WITH src AS (
      SELECT o_orderkey,
             '{"k":' || o_orderkey || ',"pri":"' || o_orderpriority ||
             '","arr":[' || o_custkey || ',' || (o_orderkey % 7) ||
             '],"nul":null}' AS j
      FROM orders WHERE o_orderkey % 101 = 0)
    SELECT o_orderkey,
           CAST(json_extract(j, '$.k') AS BIGINT) AS got_k,
           json_extract_string(j, '$.pri') AS got_pri,
           CAST(json_extract(j, '$.arr[1]') AS BIGINT) AS got_arr1,
           json_extract(j, '$.missing') IS NULL AS miss_null,
           coalesce(json_type(j, '$.nul') = 'NULL', false) AS nul_is_null
    FROM src
    """,
)
def fn_variant_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4's VARIANT type — the engine-native semi-structured column
    (binary-encoded, shredded access paths; the open-table-format answer
    to schemaless JSON at 100 TB: parse ONCE at ingest, then every
    downstream path extraction skips string re-parsing). Surface pinned:
    ``parse_json`` -> VARIANT, typed ``variant_get`` path extraction
    (scalar, string, array index), ``try_variant_get`` returning NULL on
    a missing path (vs the throwing form), and ``is_variant_null``
    distinguishing a JSON ``null`` VALUE from an absent path — the
    classic JSON tri-state. The JSON text is built engine-identically by
    string concatenation from ``orders`` columns; the oracle walks the
    same documents with DuckDB's json_extract family (json_type(...) =
    'NULL' is its spelling of the value-vs-absent distinction). The
    VARIANT binary itself never appears in the output (engine-internal
    encoding); ``schema_of_variant`` is asserted in-entry instead —
    inference must type the document OBJECT with a BIGINT array."""
    o = read_table(spark, sf_dir, "orders").filter(
        F.col("o_orderkey") % 101 == 0
    )
    j = F.concat(
        F.lit('{"k":'),
        F.col("o_orderkey").cast("string"),
        F.lit(',"pri":"'),
        F.col("o_orderpriority"),
        F.lit('","arr":['),
        F.col("o_custkey").cast("string"),
        F.lit(","),
        (F.col("o_orderkey") % 7).cast("string"),
        F.lit('],"nul":null}'),
    )
    v = F.parse_json(j)
    out = o.select(
        "o_orderkey",
        F.variant_get(v, "$.k", "long").alias("got_k"),
        F.variant_get(v, "$.pri", "string").alias("got_pri"),
        F.variant_get(v, "$.arr[1]", "long").alias("got_arr1"),
        F.try_variant_get(v, "$.missing", "long").isNull().alias("miss_null"),
        F.is_variant_null(F.variant_get(v, "$.nul", "variant")).alias(
            "nul_is_null"
        ),
        F.schema_of_variant(v).alias("_sch"),
    )
    schemas = [r["_sch"] for r in out.select("_sch").distinct().collect()]
    if not all("OBJECT<" in s and "ARRAY<BIGINT>" in s for s in schemas):
        raise RuntimeError(
            f"schema_of_variant inferred unexpected shapes: {schemas}"
        )
    return out.drop("_sch")


@register(
    "fn_execute_immediate",
    oracle="""
    SELECT CAST(p_size AS BIGINT) AS size_band,
           CAST(count(*) AS BIGINT) AS n_parts,
           (SELECT CAST(count(*) AS BIGINT) FROM part WHERE p_size <= 10)
             AS total_all
    FROM part WHERE p_size <= 10
    GROUP BY p_size
    """,
)
def fn_execute_immediate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DYNAMIC SQL surface — ``EXECUTE IMMEDIATE`` (Spark 4): a statement
    held in a SESSION VARIABLE runs with positional parameter markers
    (``?`` bound via USING), its scalar form captures INTO a second
    session variable, and the table name itself is late-bound through
    ``IDENTIFIER(?)`` — SQL-injection-safe dynamic identifiers, the
    pattern metadata-driven pipelines use instead of driver-side string
    splicing. The INTO-captured total rides every output row (the same
    value the oracle recomputes as a scalar subquery), so the driver
    hash covers both the grouped EXECUTE IMMEDIATE result and the
    variable round-trip."""
    read_table(spark, sf_dir, "part").createOrReplaceTempView("fn_ei_part_v")
    spark.sql("DECLARE OR REPLACE VARIABLE fn_ei_stmt STRING")
    spark.sql("DECLARE OR REPLACE VARIABLE fn_ei_total BIGINT")
    spark.sql(
        """SET VAR fn_ei_stmt =
           'SELECT CAST(p_size AS BIGINT) AS size_band,
                   CAST(count(*) AS BIGINT) AS n_parts
            FROM IDENTIFIER(?) WHERE p_size <= ? GROUP BY p_size'"""
    )
    spark.sql(
        """EXECUTE IMMEDIATE
           'SELECT CAST(count(*) AS BIGINT) FROM IDENTIFIER(?)
            WHERE p_size <= ?'
           INTO fn_ei_total USING 'fn_ei_part_v', 10"""
    )
    return spark.sql(
        "EXECUTE IMMEDIATE fn_ei_stmt USING 'fn_ei_part_v', 10"
    ).withColumn("total_all", F.expr("fn_ei_total"))


@register(
    "fn_group_by_all",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty,
           CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT))
                AS BIGINT) AS cents
    FROM lineitem GROUP BY ALL
    """,
)
def fn_group_by_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``GROUP BY ALL`` — Spark 4's infer-the-keys grouping (every
    non-aggregate select item becomes a key): the analyst-SQL surface
    item that kills the classic copy-the-select-list-into-GROUP-BY
    drift bug (add a column, forget the GROUP BY, silently change the
    grain). Catalyst resolves it at ANALYSIS time into the ordinary
    grouping — the physical plan is identical to the explicit form, so
    there is no scale cost to the sugar. DuckDB implements the same
    clause, so the oracle uses it verbatim — both engines must infer
    the SAME key set, which is itself the contract under test."""
    read_table(spark, sf_dir, "lineitem").createOrReplaceTempView(
        "lineitem_gba_v"
    )
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus,
               CAST(count(*) AS BIGINT) AS n,
               CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty,
               CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT))
                    AS BIGINT) AS cents
        FROM lineitem_gba_v GROUP BY ALL
        """
    )


@register(
    "fn_parameterized_sql",
    oracle="""
    SELECT o_orderpriority,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
                AS BIGINT) AS cents
    FROM orders
    WHERE o_totalprice >= 150000.0 AND o_orderstatus IN ('F', 'O')
    GROUP BY o_orderpriority
    """,
)
def fn_parameterized_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PARAMETERIZED SQL (Spark 4 ``spark.sql(..., args=...)``): named
    parameter markers ``:name`` for VALUES and the ``IDENTIFIER()``
    clause for the TABLE NAME — the injection-safe templating surface
    (string-splicing user input into SQL is the classic hole; parameter
    markers bind as literals in the parser, and IDENTIFIER restricts the
    spliced token to a resolvable identifier). The entry binds a price
    floor, an IN-list as an array parameter, and the source view name,
    all through markers; the oracle is the same query with literals
    inlined, so the hash proves the bound plan equals the literal one.
    Zero runtime cost at any scale — binding happens at parse time and
    the resulting plan is the plain filtered aggregate (filters still
    push to the scan)."""
    view = "fn_param_orders_v"
    read_table(spark, sf_dir, "orders").createOrReplaceTempView(view)
    return spark.sql(
        """
        SELECT o_orderpriority,
               CAST(count(*) AS BIGINT) AS n,
               CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
                    AS BIGINT) AS cents
        FROM IDENTIFIER(:tbl)
        WHERE o_totalprice >= :min_price
          AND array_contains(:statuses, o_orderstatus)
        GROUP BY o_orderpriority
        """,
        args={
            "tbl": view,
            "min_price": 150000.0,
            "statuses": ["F", "O"],
        },
    )


@register(
    "fn_regexp_family",
    oracle="""
    WITH per_doc AS (
      SELECT lang, source,
             CAST(len(regexp_extract_all(text, '[bs][a-z]+')) AS BIGINT)
               AS n_matches,
             CASE WHEN regexp_matches(text, 'vector.* vector')
                  THEN 1 ELSE 0 END AS has_pair,
             CASE WHEN regexp_matches(text, '[bs][a-z]+')
                  THEN CAST(strpos(text, regexp_extract(text,
                         '[bs][a-z]+')) AS BIGINT) END AS first_pos,
             CASE WHEN regexp_matches(text, '[bs][a-z]+')
                  THEN regexp_extract(text, '[bs][a-z]+') END
               AS first_match
      FROM documents)
    SELECT lang, source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_matches) AS BIGINT) AS total_matches,
           CAST(sum(has_pair) AS BIGINT) AS n_with_pair,
           CAST(min(first_pos) AS BIGINT) AS min_first_pos,
           CAST(max(first_pos) AS BIGINT) AS max_first_pos,
           min(first_match) AS min_first_match
    FROM per_doc GROUP BY 1, 2
    """,
)
def fn_regexp_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REGEXP scalar family — the Spark-3.5 regexp quartet the string
    family entry predates: ``regexp_count`` (match cardinality),
    ``regexp_instr`` (1-based first-match position), ``regexp_substr``
    (first matched literal, NULL on miss — mirrored in DuckDB by
    guarding its ''-on-miss ``regexp_extract`` with ``regexp_matches``)
    and ``regexp_like``, rolled up per (lang, source). Engine-parity
    care: DuckDB has no ``regexp_instr``, so the oracle derives the
    position as ``strpos(text, regexp_extract(text, pat))`` — valid
    precisely because the pattern ('[bs][a-z]+', char-classes only, no
    anchors/boundaries/lookarounds) re-matches wherever its matched
    literal occurs, so an earlier literal occurrence would contradict
    leftmost-match; the docstring carries the proof obligation and the
    pattern choice stays inside both engines' common RE2/Java subset.

    Scale: pure per-row codegen'd expressions (the reference's map-
    binary space, mr-bins/map/map.cpp) + one map-side-combinable
    rollup; regex state machines run scan-local, nothing shuffles but
    the (lang × source) grid."""
    pat = "[bs][a-z]+"
    has = F.regexp_like(F.col("text"), F.lit(pat))
    per_doc = read_table(spark, sf_dir, "documents").select(
        "lang",
        "source",
        F.regexp_count(F.col("text"), F.lit(pat))
        .cast("long")
        .alias("n_matches"),
        F.when(
            F.regexp_like(F.col("text"), F.lit("vector.* vector")), 1
        )
        .otherwise(0)
        .alias("has_pair"),
        F.when(
            has,
            F.regexp_instr(F.col("text"), F.lit(pat)).cast("long"),
        ).alias("first_pos"),
        F.when(has, F.regexp_substr(F.col("text"), F.lit(pat))).alias(
            "first_match"
        ),
    )
    return per_doc.groupBy("lang", "source").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("n_matches").cast("long").alias("total_matches"),
        F.sum("has_pair").cast("long").alias("n_with_pair"),
        F.min("first_pos").cast("long").alias("min_first_pos"),
        F.max("first_pos").cast("long").alias("max_first_pos"),
        F.min("first_match").alias("min_first_match"),
    )
