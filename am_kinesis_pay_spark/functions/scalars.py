"""Scalar-function surface (SURVEY.md §2.8).

Every scalar operation the reference performs, grouped into themed
oracle-checked queries. All pure Catalyst expressions — whole-stage
codegen, zero shuffles, and at 100 TB these are map-only pipelines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from am_kinesis_pay_spark.registry import register
from am_kinesis_pay_spark.tables import load

# The reference masks its secret token in logged payloads
# (kinesis-pay.php:459); fixed stand-in secret for determinism.
_SECRET = "s3cr3t-t0k3n"


@register(
    "fn_money_pipeline",
    oracle="""
SELECT o_orderkey,
  CAST(round(CAST(o_totalprice AS DECIMAL(18,2)) * CAST(0.85 AS DECIMAL(4,2)), 2) AS DOUBLE) AS adj_2dp,
  CAST(round(CAST(o_totalprice AS DECIMAL(18,2)) / CAST(73.5 AS DECIMAL(6,1)), 5) AS DOUBLE) AS metal_5dp,
  CAST(abs(-85) AS DOUBLE) / 100 AS pct_multiplier,
  CASE WHEN o_orderstatus = 'O' THEN CAST(o_totalprice AS DOUBLE) ELSE 0.0 END AS first_or_second,
  CAST(o_totalprice AS DOUBLE) AS as_double,
  concat(printf('%.2f', CAST(o_totalprice AS DOUBLE)), ' ', 'USD') AS amount_label
FROM orders
""",
    tags=("scalar",),
)
def fn_money_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Money arithmetic: number_format 2dp/5dp half-up
    (kinesis-pay.php:140,147-148), abs(pct)/100 (:137), ternary total
    pick (:138), doubleval cast (:124), amount+currency label (:509)."""
    o = load(spark, sf_dir, "orders")
    price_dec = F.col("o_totalprice").cast("decimal(18,2)")
    return o.select(
        "o_orderkey",
        F.round(price_dec * F.lit("0.85").cast("decimal(4,2)"), 2)
        .cast("double")
        .alias("adj_2dp"),
        # 5-dp metal conversion: amount / rate (kinesis-pay.php:147-148)
        F.round(price_dec / F.lit("73.5").cast("decimal(6,1)"), 5)
        .cast("double")
        .alias("metal_5dp"),
        (F.abs(F.lit(-85)).cast("double") / 100).alias("pct_multiplier"),
        F.when(F.col("o_orderstatus") == "O", F.col("o_totalprice").cast("double"))
        .otherwise(0.0)
        .alias("first_or_second"),
        F.col("o_totalprice").cast("double").alias("as_double"),
        F.concat(
            F.format_string("%.2f", F.col("o_totalprice").cast("double")),
            F.lit(" "),
            F.lit("USD"),
        ).alias("amount_label"),
    )


@register(
    "fn_json_ops",
    oracle=f"""
SELECT event_id,
  CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_value,
  COALESCE(json_extract_string(props, '$.missing'), 'default') AS k_missing,
  printf('{{"nonce":%d,"method":"%s","path":"%s"}}', epoch_ms(ts), 'GET', '/api/merchants/payment') AS request_json,
  COALESCE(NULLIF(props, ''), '{{}}') AS payload_or_empty
FROM events
""",
    tags=("scalar", "json"),
)
def fn_json_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON point-get with NULL fallback (kinesis-pay.php:172,501 —
    `?? null` / getConfig default), JSON construction with `{}` empty
    fallback (:423,441). printf keeps the byte layout oracle-exact."""
    ev = load(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("bigint").alias("k_value"),
        F.coalesce(
            F.get_json_object("props", "$.missing"), F.lit("default")
        ).alias("k_missing"),
        F.format_string(
            '{"nonce":%d,"method":"%s","path":"%s"}',
            F.unix_millis("ts"),
            F.lit("GET"),
            F.lit("/api/merchants/payment"),
        ).alias("request_json"),
        F.coalesce(F.nullif("props", F.lit("")), F.lit("{}")).alias(
            "payload_or_empty"
        ),
    )


@register(
    "fn_datetime_ops",
    oracle="""
SELECT event_id,
  epoch_ms(ts) AS nonce_millis,
  CAST(ceil((epoch_ms(TIMESTAMP '2024-02-01 00:00:00') - epoch_ms(ts)) / 60000.0) AS BIGINT) AS minutes_left,
  CASE WHEN CAST(ceil((epoch_ms(TIMESTAMP '2024-02-01 00:00:00') - epoch_ms(ts)) / 60000.0) AS BIGINT) = 1
       THEN 'minute' ELSE 'minutes' END AS unit_label,
  CAST(strptime(strftime(ts, '%Y-%m-%d %H:%M:%S'), '%Y-%m-%d %H:%M:%S') AS TIMESTAMP) AS reparsed_ts
FROM events
""",
    tags=("scalar", "datetime"),
)
def fn_datetime_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Epoch-millis nonce (kinesis-pay.php:422), ceil minutes-to-expiry
    countdown (:252-254), pluralize (:255), ISO parse round-trip
    (:252)."""
    ev = load(spark, sf_dir, "events")
    deadline = F.lit("2024-02-01 00:00:00").cast("timestamp")
    minutes = F.ceil(
        (F.unix_millis(deadline) - F.unix_millis("ts")) / F.lit(60000.0)
    ).alias("minutes_left")
    return ev.select(
        "event_id",
        F.unix_millis("ts").alias("nonce_millis"),
        minutes,
        F.when(
            F.ceil((F.unix_millis(deadline) - F.unix_millis("ts")) / F.lit(60000.0))
            == 1,
            "minute",
        )
        .otherwise("minutes")
        .alias("unit_label"),
        F.to_timestamp(
            F.date_format("ts", "yyyy-MM-dd HH:mm:ss"), "yyyy-MM-dd HH:mm:ss"
        ).alias("reparsed_ts"),
    )


@register(
    "fn_string_ops",
    oracle=f"""
SELECT event_id,
  concat(CAST(epoch_ms(ts) AS VARCHAR), 'GET', '/api/payment/status', COALESCE(props, '{{}}')) AS signing_message,
  concat_ws('_', 'KAU', 'USD') AS pair,
  concat('https://api.example.com/v1/status?id=', CAST(event_id AS VARCHAR), '&seq=', CAST(user_id AS VARCHAR)) AS status_url,
  upper(event_type) AS event_type_upper,
  replace(concat('token=', '{_SECRET}', '&type=', event_type), '{_SECRET}', '***secret_token***') AS masked_payload
FROM events
""",
    tags=("scalar", "string"),
)
def fn_string_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Signing-message concat nonce.method.path.payload
    (kinesis-pay.php:423), pair key concat (:470), URL building
    (:179,236,306), strtoupper (:424), and literal secret masking
    (:459 — replace, NOT regexp, so regex metachars in a secret can't
    break the redaction)."""
    ev = load(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.concat(
            F.unix_millis("ts").cast("string"),
            F.lit("GET"),
            F.lit("/api/payment/status"),
            F.coalesce("props", F.lit("{}")),
        ).alias("signing_message"),
        F.concat_ws("_", F.lit("KAU"), F.lit("USD")).alias("pair"),
        F.concat(
            F.lit("https://api.example.com/v1/status?id="),
            F.col("event_id").cast("string"),
            F.lit("&seq="),
            F.col("user_id").cast("string"),
        ).alias("status_url"),
        F.upper("event_type").alias("event_type_upper"),
        F.expr(
            f"replace(concat('token=', '{_SECRET}', '&type=', event_type),"
            f" '{_SECRET}', '***secret_token***')"
        ).alias("masked_payload"),
    )


@register(
    "fn_map_ops",
    oracle="""
SELECT event_id,
  CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_via_map,
  1 AS n_keys,
  CAST(json_extract_string(props, '$.k') AS BIGINT) IS NOT NULL AS has_k
FROM events
WHERE props IS NOT NULL
""",
    tags=("scalar", "map"),
)
def fn_map_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MapType surface — the invoice KV data bag (SURVEY §1.1 #2,
    kinesis-pay.php:15-16): parse the JSON bag into MAP<STRING,BIGINT>,
    then element_at / map_keys / containment. The oracle reads the same
    facts via JSON point lookups (DuckDB has no MAP-from-JSON)."""
    from pyspark.sql import types as T

    ev = load(spark, sf_dir, "events").filter(F.col("props").isNotNull())
    bag = F.from_json("props", T.MapType(T.StringType(), T.LongType()))
    return ev.select(
        "event_id",
        F.element_at(bag, "k").alias("k_via_map"),
        F.size(F.map_keys(bag)).alias("n_keys"),
        F.array_contains(F.map_keys(bag), "k").alias("has_k"),
    )


@register(
    "fn_date_parts",
    oracle="""
SELECT o_orderkey,
  CAST(year(o_orderdate) AS INTEGER) AS yr,
  CAST(month(o_orderdate) AS INTEGER) AS mon,
  CAST(quarter(o_orderdate) AS INTEGER) AS qtr,
  CAST(dayofmonth(o_orderdate) AS INTEGER) AS dom,
  CAST(dayofweek(o_orderdate) + 1 AS INTEGER) AS dow,
  CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start
FROM orders
""",
    tags=("scalar", "datetime"),
)
def fn_date_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar extraction over order dates. Convention trap made
    explicit: Spark dayofweek is 1=Sunday..7, DuckDB dayofweek is
    0=Sunday..6 — the oracle shifts by +1."""
    o = load(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("yr"),
        F.month("o_orderdate").alias("mon"),
        F.quarter("o_orderdate").alias("qtr"),
        F.dayofmonth("o_orderdate").alias("dom"),
        F.dayofweek("o_orderdate").alias("dow"),
        F.date_trunc("month", "o_orderdate").alias("month_start"),
    )


@register(
    "filter_hash_sample",
    oracle="""
SELECT doc_id, lang, source
FROM documents
WHERE CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4)) AS INTEGER) % 10 = 0
""",
    tags=("filter", "sample"),
)
def filter_hash_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic ~10% sample by key hash — the reproducible
    experiment-split pattern (TABLESAMPLE is engine-nondeterministic,
    hash-mod is stable across engines, runs, and cluster sizes)."""
    docs = load(spark, sf_dir, "documents")
    bucket = F.conv(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 4), 16, 10
    ).cast("long")
    return docs.filter(bucket % 10 == 0).select("doc_id", "lang", "source")


@register(
    "fn_floor_mod",
    oracle="""
SELECT event_id,
  CAST(floor(CAST(json_extract_string(props, '$.k') AS INTEGER) / 10.0) AS BIGINT) AS code_class,
  event_id % 10 AS poll_mod,
  CAST(CAST(json_extract_string(props, '$.k') AS INTEGER) // 10 AS BIGINT) AS int_div
FROM events
""",
    tags=("scalar",),
)
def fn_floor_mod(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(int) floor(status/100) HTTP-class bucketing
    (kinesis-pay.php:153) and the % 10 sampling modulus (:303)."""
    ev = load(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    return ev.select(
        "event_id",
        F.floor(k / F.lit(10.0)).cast("bigint").alias("code_class"),
        (F.col("event_id") % 10).alias("poll_mod"),
        k.cast("long").alias("_k"),
    ).select(
        "event_id",
        "code_class",
        "poll_mod",
        F.expr("_k div 10").alias("int_div"),
    )


@register(
    "fn_array_ops",
    oracle="""
SELECT user_id,
  list_sort(list(DISTINCT event_type)) AS event_types,
  len(list(DISTINCT event_type)) AS n_types,
  list_contains(list(DISTINCT event_type), 'purchase') AS has_purchase
FROM events
GROUP BY user_id
""",
    tags=("scalar", "array"),
)
def fn_array_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ArrayType surface: collect-distinct into a SORTED array (an
    unsorted collect_list is order-nondeterministic across engines and
    runs — never hash-compare one), plus size and containment."""
    ev = load(spark, sf_dir, "events")
    arr = F.array_sort(F.collect_set("event_type"))
    return ev.groupBy("user_id").agg(
        arr.alias("event_types"),
        F.size(F.collect_set("event_type")).cast("bigint").alias("n_types"),
        F.array_contains(arr, "purchase").alias("has_purchase"),
    )


@register(
    "sample_stratified",
    oracle="""
SELECT doc_id, lang, source
FROM documents
WHERE CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4)) AS INTEGER) % 100
      < CASE WHEN lang = 'en' THEN 10 ELSE 50 END
""",
    tags=("filter", "sample"),
)
def sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified deterministic sampling: per-language rates (10% of
    the dominant 'en' stratum, 50% of the rest — the rebalancing move
    when downsampling an overrepresented language). Same hash-mod
    mechanism as filter_hash_sample, so membership is stable across
    engines, runs, and repartitioning."""
    docs = load(spark, sf_dir, "documents")
    bucket = F.conv(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 4), 16, 10
    ).cast("long")
    rate = F.when(F.col("lang") == "en", 10).otherwise(50)
    return docs.filter(bucket % 100 < rate).select("doc_id", "lang", "source")


@register(
    "sample_reservoir",
    oracle="""
SELECT doc_id, lang, rn FROM (
  SELECT doc_id, lang,
    CAST(ROW_NUMBER() OVER (
      PARTITION BY lang
      ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS INT) AS rn
  FROM documents) t
WHERE rn <= 5
""",
    tags=("filter", "sample"),
)
def sample_reservoir(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic fixed-k per-group sample (reservoir sampling's
    batch equivalent): exactly k=5 docs per language, chosen by
    hash-of-id order so membership is stable across engines, runs,
    and repartitioning — unlike true reservoir sampling, whose draw
    depends on encounter order. Plans as one shuffle on lang + a
    per-partition top-k sort; at 100 TB, k rows per group survive
    regardless of group size, so the output never grows with the
    input (the "inspect a few examples per stratum" primitive)."""
    from pyspark.sql import Window as W

    docs = load(spark, sf_dir, "documents")
    w = W.partitionBy("lang").orderBy(
        F.md5(F.col("doc_id").cast("string")), F.col("doc_id")
    )
    return (
        docs.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 5)
        .select("doc_id", "lang", "rn")
    )


@register(
    "fn_variant_ops",
    oracle="""
SELECT event_type,
  COUNT(*) AS n,
  CAST(SUM(CAST(props ->> 'k' AS BIGINT)) AS BIGINT) AS sum_k,
  CAST(MIN(CAST(props ->> 'k' AS BIGINT)) AS BIGINT) AS min_k,
  CAST(MAX(CAST(props ->> 'k' AS BIGINT)) AS BIGINT) AS max_k
FROM events
WHERE CAST(props ->> 'k' AS BIGINT) IS NOT NULL
GROUP BY event_type
""",
    tags=("scalar", "json"),
)
def fn_variant_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured VARIANT path (Spark 4): parse the JSON side-bag
    ONCE into a binary variant, then do typed point extractions —
    unlike get_json_object (fn_json_ops), which re-parses the string
    per extraction. try_parse_json / try_variant_get reproduce the
    reference's fail-open treatment of non-JSON payloads
    (kinesis-pay.php:158-162): malformed rows become NULL and drop at
    the filter, never error. At 100 TB the single-parse shape halves
    scan CPU whenever two or more fields are extracted, and variant
    columns shred to parquet for pushdown in newer table formats."""
    ev = load(spark, sf_dir, "events")
    k = F.try_variant_get(F.try_parse_json("props"), "$.k", "long")
    return (
        ev.select("event_type", k.alias("k"))
        .filter(F.col("k").isNotNull())
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("k").alias("sum_k"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
        )
    )


@register(
    "fn_collation_group",
    oracle="""
WITH mixed AS (
  SELECT CASE WHEN event_id % 2 = 0 THEN upper(event_type)
              ELSE event_type END AS et_mixed,
         value
  FROM events
)
SELECT lower(et_mixed) AS event_type_ci,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
FROM mixed
GROUP BY lower(et_mixed)
""",
    tags=("scalar", "collation"),
)
def fn_collation_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 collations: grouping under UTF8_LCASE treats 'CLICK'
    and 'click' as ONE key at the comparison level — no lower()
    rewrite of the data, and unlike the rewrite the collation also
    drives comparisons/joins/sort order engine-wide. Input case is
    deterministically mixed (even ids uppercased) to make the
    case-insensitive semantics observable; the projected key is
    canonicalized with lower() so output values are engine-portable
    (the DuckDB oracle groups by lower() — same partition of rows).
    At scale a LCASE-collated column beats lower()-wrapping because
    the collation participates in pushdown and avoids materializing a
    second string."""
    ev = load(spark, sf_dir, "events")
    mixed = ev.select(
        F.when(F.col("event_id") % 2 == 0, F.upper("event_type"))
        .otherwise(F.col("event_type"))
        .alias("et_mixed"),
        "value",
    )
    ci = F.collate(F.col("et_mixed"), "UTF8_LCASE")
    return (
        mixed.groupBy(ci.alias("et_ci"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)"))
            .cast("double")
            .alias("sum_value"),
        )
        .select(
            F.lower(F.col("et_ci")).alias("event_type_ci"),
            "n_events",
            "sum_value",
        )
    )


@register(
    "fn_sql_udf",
    oracle="""
SELECT l_orderkey, l_linenumber,
  CAST(round(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(abs(90) / 100.0 AS DECIMAL(8,4)), 2) AS DOUBLE) AS adjusted,
  CAST(round(CAST(round(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(abs(90) / 100.0 AS DECIMAL(8,4)), 2) AS DECIMAL(18,2)) / CAST(0.012345 AS DECIMAL(10,6)), 5) AS DOUBLE) AS metal_amount
FROM lineitem
WHERE l_linenumber = 1
""",
    tags=("scalar", "udf"),
)
def fn_sql_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 SQL UDFs (CREATE FUNCTION ... RETURN): the reference's
    price-adjustment arithmetic (abs(pct)/100 x total, round half-up
    2dp — kinesis-pay.php:137-140) and metal-amount conversion
    (5dp, :147-148) packaged as named, reusable SQL functions. Unlike
    Python UDFs these inline into the Catalyst plan (no serialization
    boundary, codegen-compatible, pushdown-transparent) — the right
    extension mechanism for scalar logic at 100 TB; the catalog entry
    replaces the reference's copy-pasted arithmetic. The oracle inlines
    the same expressions."""
    # arithmetic in exact DECIMAL, DOUBLE only at the boundary — the
    # compat.py convention, INSIDE the function body. The pct multiplier
    # is pre-divided and cast to DECIMAL(8,4): decimal x decimal is
    # exact in both engines, while decimal / decimal goes through
    # DOUBLE in DuckDB and hits .xx5 edges differently than Spark's
    # exact decimal division.
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION kpay_adjust(total DOUBLE, pct DOUBLE) "
        "RETURNS DOUBLE RETURN CAST(round(CAST(total AS DECIMAL(18,2)) "
        "* CAST(abs(pct) / 100.0 AS DECIMAL(8,4)), 2) AS DOUBLE)"
    )
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION kpay_metal(amount DOUBLE, rate DOUBLE) "
        "RETURNS DOUBLE RETURN CAST(round(CAST(amount AS DECIMAL(18,2)) "
        "/ CAST(rate AS DECIMAL(10,6)), 5) AS DOUBLE)"
    )
    load(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem_vudf")
    return spark.sql(
        """
        SELECT l_orderkey, l_linenumber,
               kpay_adjust(l_extendedprice, 90) AS adjusted,
               kpay_metal(kpay_adjust(l_extendedprice, 90), 0.012345) AS metal_amount
        FROM lineitem_vudf
        WHERE l_linenumber = 1
        """
    )


@register(
    "fn_try_arithmetic",
    oracle="""
SELECT event_id,
  CAST(round(CAST(round(value, 3) AS DECIMAL(18,6))
             / CAST(event_id % 7 AS DECIMAL(18,6)), 6) AS DOUBLE) AS div_safe,
  CAST(CASE WHEN event_id % 1000 = 999 THEN NULL
            ELSE 9223372036854775807 END AS BIGINT) AS add_safe,
  CAST(CASE WHEN event_id % 1000 = 500 THEN NULL
            ELSE 4611686018427387904 * (event_id % 2) END AS BIGINT)
    AS mul_safe,
  TRY_CAST(CASE WHEN event_id % 3 = 0 THEN '42' ELSE event_type END AS INT)
    AS cast_safe
FROM events
""",
    tags=("scalar", "ansi"),
)
def fn_try_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANSI-mode error-safe arithmetic — the try_* family that keeps a
    100 TB batch job from dying on row 3,000,000,001: Spark 4 is
    ANSI-by-default, so overflow / division-by-zero / bad casts THROW
    unless the expression opts into NULL-on-error via
    ``try_add / try_multiply / try_divide / try_cast``. One column per
    failure class, each with rows on BOTH sides of the error boundary:
    decimal divide-by-zero (event_id % 7 == 0 -> NULL), bigint
    overflow in + and * on 0.1% of rows (guarded CASE in the oracle —
    DuckDB has no try_add, so the oracle states the expected semantics
    explicitly), and a failing string->int cast (TRY_CAST on both
    engines). Cost model (measured): a FAILING try_add/try_multiply
    row pays a JVM exception throw+catch — ~10x a clean row — so
    NULL-on-error is for the rare-corruption tail, not for columns
    that mostly overflow; divide-by-zero and cast failures return NULL
    without unwinding and stay cheap at any failure rate. This is
    the fail-open row-level counterpart of `source_corrupt_records`'s
    record-level triage: corrupt VALUES degrade to NULL and flow on,
    exactly the reference's fail-open posture (kinesis-pay.php:158-162)
    at expression granularity. Map-only; nothing shuffles."""
    ev = load(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.round(
            F.try_divide(
                F.round("value", 3).cast("decimal(18,6)"),
                (F.col("event_id") % 7).cast("decimal(18,6)"),
            ),
            6,
        )
        .cast("double")
        .alias("div_safe"),
        F.try_add(
            F.lit(9223372036854775807).cast("long"),
            F.when(F.col("event_id") % 1000 == 999, 1)
            .otherwise(0)
            .cast("long"),
        ).alias("add_safe"),
        F.try_multiply(
            F.lit(4611686018427387904).cast("long"),
            F.when(F.col("event_id") % 1000 == 500, 4)
            .otherwise(F.col("event_id") % 2)
            .cast("long"),
        ).alias("mul_safe"),
        F.when(F.col("event_id") % 3 == 0, "42")
        .otherwise(F.col("event_type"))
        .try_cast("int")
        .alias("cast_safe"),
    )


@register(
    "fn_sql_params",
    oracle="""
SELECT event_type,
  COUNT(*) AS n,
  CAST(SUM(CASE WHEN value >= 250.0 THEN 1 ELSE 0 END) AS BIGINT) AS n_over
FROM events
WHERE event_id % 11 = 3
GROUP BY event_type
""",
    tags=("scalar", "sql"),
)
def fn_sql_params(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parameterized SQL (Spark 4 named parameters): the query text
    carries :mod / :rem / :threshold markers and values bind at
    execution — the injection-safe templating surface the reference's
    PHP layer does with prepared statements (kinesis-pay.php uses
    $wpdb->prepare throughout). Parameter markers bind as literals
    BEFORE Catalyst optimizes, so pushdown/pruning see constants —
    same plan as hand-inlined literals, which is exactly what the
    plain-literal DuckDB oracle checks."""
    load(spark, sf_dir, "events").createOrReplaceTempView("events_v_params")
    return spark.sql(
        """
        SELECT event_type,
          COUNT(*) AS n,
          CAST(SUM(CASE WHEN value >= :threshold THEN 1 ELSE 0 END) AS BIGINT)
            AS n_over
        FROM events_v_params
        WHERE event_id % :mod = :rem
        GROUP BY event_type
        """,
        args={"mod": 11, "rem": 3, "threshold": 250.0},
    )


@register(
    "fn_sql_pipe",
    oracle="""
SELECT o_orderpriority,
  COUNT(*) AS n_orders,
  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
FROM orders
WHERE o_orderstatus = 'F'
GROUP BY o_orderpriority
ORDER BY o_orderpriority
""",
    tags=("scalar", "sql"),
)
def fn_sql_pipe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL pipe syntax (Spark 4 `|>`, SPARK-49555): the same
    filter -> aggregate -> order pipeline written as sequential pipe
    stages instead of nested clauses. Pipe stages desugar to the
    identical logical plan Catalyst sees from classic SQL — the DuckDB
    oracle is the classic form, so this entry pins that desugaring
    end-to-end (same groupBy shuffle, same pushed filter). Money sums
    go through DECIMAL per the repo's fixed-point discipline."""
    load(spark, sf_dir, "orders").createOrReplaceTempView("orders_v_pipe")
    return spark.sql(
        """
        FROM orders_v_pipe
        |> WHERE o_orderstatus = 'F'
        |> AGGREGATE COUNT(*) AS n_orders,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
               AS total_price
           GROUP BY o_orderpriority
        |> ORDER BY o_orderpriority
        """
    )


@register(
    "fn_luhn_validate",
    oracle="""
WITH pans AS (
  SELECT user_id,
    concat('4', right(concat('00000000000000', CAST(user_id AS VARCHAR)), 14))
      AS pan14
  FROM (SELECT DISTINCT user_id FROM events)
), digits AS (
  SELECT user_id, pan14, i,
    CAST(substr(pan14, CAST(i AS INT), 1) AS BIGINT) AS d,
    -- position from the RIGHT of the full 16-digit PAN: the 15
    -- payload digits occupy right-positions 2..16, so digit i (1-based
    -- from the left of pan14||check) doubles when (16 - i) is odd
    CASE WHEN (15 - i) % 2 = 0 THEN 2 ELSE 1 END AS w
  FROM pans, unnest(range(1, 16)) t(i)
), summed AS (
  SELECT user_id, pan14,
    CAST(SUM(CASE WHEN d * w > 9 THEN d * w - 9 ELSE d * w END) AS BIGINT)
      AS s
  FROM digits GROUP BY user_id, pan14
)
SELECT user_id,
  concat(pan14, CAST((10 - s % 10) % 10 AS VARCHAR)) AS pan,
  CAST((10 - s % 10) % 10 AS INT) AS check_digit,
  TRUE AS luhn_valid
FROM summed
""",
    tags=("scalar", "validation"),
)
def fn_luhn_validate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Luhn mod-10 check-digit generation/validation (ISO/IEC 7812 —
    the checksum on every payment-card PAN): per user a deterministic
    15-digit payload ('4' + zero-padded user id) gets its Luhn check
    digit computed set-based — doubling every second digit from the
    right, folding >9 to digit-sum-minus-9, complementing the total
    mod 10 — entirely with array/aggregate expressions (no UDF; the
    digit walk is a transform over a position sequence inside the
    row). The emitted PAN re-validates by construction (luhn_valid),
    which is the gateway-side input check the reference's validator
    chain performs on payment payloads (kinesis-pay.php:520-537)
    before anything signs or settles. Map-only over distinct users;
    both engines compute the identical integer arithmetic, so the
    oracle hash-matches the full PAN strings."""
    ev = load(spark, sf_dir, "events")
    users = ev.select("user_id").distinct()
    pan14 = F.concat(
        F.lit("4"), F.lpad(F.col("user_id").cast("string"), 14, "0")
    )
    weighted = F.aggregate(
        F.transform(
            F.sequence(F.lit(1), F.lit(15)),
            lambda i: F.when(
                ((F.lit(15) - i) % 2 == 0),
                pan14.substr(i, F.lit(1)).cast("bigint") * 2,
            ).otherwise(pan14.substr(i, F.lit(1)).cast("bigint")),
        ),
        F.lit(0).cast("bigint"),
        lambda s, x: s + F.when(x > 9, x - 9).otherwise(x),
    )
    check = (10 - weighted % 10) % 10
    return users.select(
        "user_id",
        F.concat(pan14, check.cast("string")).alias("pan"),
        check.cast("int").alias("check_digit"),
        F.lit(True).alias("luhn_valid"),
    )


@register(
    "fn_pan_mask",
    oracle="""
WITH users AS (
  SELECT DISTINCT user_id FROM events
), cand AS (
  SELECT user_id,
    concat('4', lpad(CAST(user_id AS VARCHAR), 14, '0')) AS pan15
  FROM users
), luhn AS (
  SELECT user_id, pan15,
    CAST(list_sum(list_transform(generate_series(1, 15),
      i -> CASE WHEN (15 - i) % 2 = 0 THEN
             CASE WHEN CAST(substr(pan15, i, 1) AS BIGINT) * 2 > 9
                  THEN CAST(substr(pan15, i, 1) AS BIGINT) * 2 - 9
                  ELSE CAST(substr(pan15, i, 1) AS BIGINT) * 2 END
           ELSE CAST(substr(pan15, i, 1) AS BIGINT) END))
      AS BIGINT) AS wsum
  FROM cand
), pans AS (
  SELECT user_id,
    concat(pan15, CAST(CASE WHEN user_id % 2 = 0
      THEN (10 - wsum % 10) % 10
      ELSE ((10 - wsum % 10) % 10 + 1) % 10 END AS VARCHAR)) AS candidate,
    user_id % 2 = 0 AS luhn_valid
  FROM luhn
)
SELECT user_id, candidate, luhn_valid,
  CASE WHEN luhn_valid
       THEN concat('**** **** **** ', substr(candidate, 13, 4))
       ELSE candidate END AS masked
FROM pans
""",
    tags=("function", "dq"),
)
def fn_pan_mask(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Luhn-GATED card-number masking — the reference's audit-log card
    redaction (kinesis-pay.php:302-304,446-462 masks payment
    references before logging) with the false-positive protection a
    bare digit-run regex lacks: a 16-digit candidate is masked to
    '**** **** **** 1234' ONLY if its Luhn mod-10 checksum validates
    (ISO/IEC 7812); a non-validating digit run is NOT a PAN and passes
    through untouched — exactly how production log scrubbers avoid
    destroying order ids and timestamps. The fixture makes the gate
    observable: each user gets a deterministic candidate whose check
    digit is correct for even user ids and off-by-one for odd ones, so
    the oracle hash-proves both branches (mask applied / withheld) on
    every row, not just the happy path. Validation is the same
    set-based digit walk as fn_luhn_validate (double every second
    digit from the right, fold >9, sum mod 10) — array expressions
    inside the row, no UDF, map-only over distinct users; at 100 TB
    this composes into any scan as a projection."""
    ev = load(spark, sf_dir, "events")
    users = ev.select("user_id").distinct()
    pan15 = F.concat(
        F.lit("4"), F.lpad(F.col("user_id").cast("string"), 14, "0")
    )
    wsum = F.aggregate(
        F.transform(
            F.sequence(F.lit(1), F.lit(15)),
            lambda i: F.when(
                ((F.lit(15) - i) % 2 == 0),
                pan15.substr(i, F.lit(1)).cast("bigint") * 2,
            ).otherwise(pan15.substr(i, F.lit(1)).cast("bigint")),
        ),
        F.lit(0).cast("bigint"),
        lambda s, x: s + F.when(x > 9, x - 9).otherwise(x),
    )
    good_check = (10 - wsum % 10) % 10
    check = F.when(F.col("user_id") % 2 == 0, good_check).otherwise(
        (good_check + 1) % 10
    )
    candidate = F.concat(pan15, check.cast("string"))
    # re-validate the emitted candidate set-based: the mask decision
    # consumes ONLY the candidate string, never the construction flag
    wsum16 = F.aggregate(
        F.transform(
            F.sequence(F.lit(1), F.lit(16)),
            lambda i: F.when(
                ((F.lit(16) - i) % 2 == 1),
                candidate.substr(i, F.lit(1)).cast("bigint") * 2,
            ).otherwise(candidate.substr(i, F.lit(1)).cast("bigint")),
        ),
        F.lit(0).cast("bigint"),
        lambda s, x: s + F.when(x > 9, x - 9).otherwise(x),
    )
    luhn_valid = (wsum16 % 10) == 0
    return users.select(
        "user_id",
        candidate.alias("candidate"),
        luhn_valid.alias("luhn_valid"),
        F.when(
            luhn_valid,
            F.concat(F.lit("**** **** **** "), candidate.substr(13, 4)),
        )
        .otherwise(candidate)
        .alias("masked"),
    )


@register(
    "fn_sql_recursive",
    oracle="""
WITH RECURSIVE bounds AS (
  SELECT CAST(date_trunc('month', MIN(o_orderdate)) AS DATE) AS lo,
         CAST(date_trunc('month', MAX(o_orderdate)) AS DATE) AS hi
  FROM orders
), months(m, hi) AS (
  SELECT lo, hi FROM bounds
  UNION ALL
  SELECT CAST(m + INTERVAL 1 MONTH AS DATE), hi FROM months
  WHERE m < hi
), monthly AS (
  SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS m,
    CAST(COUNT(*) AS BIGINT) AS n_orders,
    CAST(SUM(CAST(round(o_totalprice, 2) AS DECIMAL(18,2))) AS DOUBLE)
      AS revenue
  FROM orders GROUP BY 1
)
SELECT months.m, COALESCE(monthly.n_orders, 0) AS n_orders,
  COALESCE(monthly.revenue, 0.0) AS revenue
FROM months LEFT JOIN monthly ON months.m = monthly.m
""",
    tags=("scalar", "sql", "recursive"),
)
def fn_sql_recursive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RECURSIVE CTE surface (Spark 4's WITH RECURSIVE, SPARK-24497 —
    Catalyst's UnionLoop operator): the calendar month spine from the
    first to the last order month is generated BY THE ENGINE'S OWN
    recursion (anchor row + one UNION ALL step per month), then
    monthly order counts and DECIMAL-summed revenue left-join onto it
    so missing months would surface as explicit zero rows — the
    recursive twin of events_gapfill_daily's sequence() spine. Both
    engines execute their native recursive evaluation of the same
    query shape, so the oracle pins Spark's recursion semantics
    (step-wise evaluation, termination on empty step) against an
    independent implementation, not just the arithmetic.

    Scale/termination: the recursion depth is the MONTH SPAN of the
    data — a calendar domain (~80 for the fixture's 1995-2001 span),
    constant in row count, far under Spark's recursion level limit
    (default 100 via spark.sql.cte.recursion.level.limit; a wider
    span raises the limit, not the design). Each step is a 1-row
    projection; all row-scale work happens once in the monthly hash
    aggregation. UNION ALL termination is safe because the spine is
    strictly increasing (acyclic by construction) — the shape Spark's
    UNION-distinct-less recursion requires."""
    load(spark, sf_dir, "orders").createOrReplaceTempView("orders_v_rec")
    return spark.sql(
        """
        WITH RECURSIVE bounds AS (
          SELECT CAST(date_trunc('month', MIN(o_orderdate)) AS DATE) AS lo,
                 CAST(date_trunc('month', MAX(o_orderdate)) AS DATE) AS hi
          FROM orders_v_rec
        ), months(m, hi) AS (
          SELECT lo, hi FROM bounds
          UNION ALL
          SELECT CAST(m + INTERVAL 1 MONTH AS DATE), hi FROM months
          WHERE m < hi
        ), monthly AS (
          SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS m,
            CAST(COUNT(*) AS BIGINT) AS n_orders,
            CAST(SUM(CAST(round(o_totalprice, 2) AS DECIMAL(18,2)))
                 AS DOUBLE) AS revenue
          FROM orders_v_rec GROUP BY 1
        )
        SELECT months.m, COALESCE(monthly.n_orders, 0) AS n_orders,
          COALESCE(monthly.revenue, 0.0) AS revenue
        FROM months LEFT JOIN monthly ON months.m = monthly.m
        """
    )


@register(
    "fn_bitwise_ops",
    oracle="""
WITH b AS (
  SELECT CAST(bit_count(CAST(l_orderkey AS BIGINT)) AS INTEGER) AS pop,
    l_orderkey & 255 AS masked,
    xor(l_partkey, l_suppkey) & 1023 AS x,
    (l_linenumber << 4) | ((l_orderkey >> 8) & 15) AS packed
  FROM lineitem
)
SELECT pop, CAST(COUNT(*) AS BIGINT) AS n,
  CAST(SUM(masked) AS BIGINT) AS sum_masked,
  CAST(MIN(x) AS BIGINT) AS min_xor, CAST(MAX(x) AS BIGINT) AS max_xor,
  CAST(SUM(packed) AS BIGINT) AS sum_packed
FROM b GROUP BY pop
""",
    tags=("function", "scalar"),
)
def fn_bitwise_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BITWISE scalar surface (SURVEY §2.8's integer-op family beyond
    floor/mod): AND-masking, OR, XOR, shifts, and popcount — the flag
    packing / low-bit bucketing idioms every partition-key or
    bitmap-ish layout uses (the reference packs status flags the same
    way a `& 255` bucket does). Spark side uses the Column bitwise
    operators + shiftleft/shiftright/bit_count (all JVM codegen);
    DuckDB spells XOR as xor() and shifts as <<//>>, the one §2.8
    family where the two engines' SYNTAX diverges while semantics are
    bit-identical — which is exactly what the oracle hash proves.
    Pure map + one hash agg on the ~15-value popcount domain."""
    li = load(spark, sf_dir, "lineitem")
    ok = F.col("l_orderkey").cast("bigint")
    b = li.select(
        F.bit_count(ok).alias("pop"),
        ok.bitwiseAND(F.lit(255)).alias("masked"),
        F.col("l_partkey")
        .bitwiseXOR(F.col("l_suppkey"))
        .bitwiseAND(F.lit(1023))
        .alias("x"),
        F.shiftleft(F.col("l_linenumber"), 4)
        .bitwiseOR(F.shiftright(ok, 8).bitwiseAND(F.lit(15)))
        .alias("packed"),
    )
    return b.groupBy("pop").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("masked").cast("bigint").alias("sum_masked"),
        F.min("x").cast("bigint").alias("min_xor"),
        F.max("x").cast("bigint").alias("max_xor"),
        F.sum("packed").cast("bigint").alias("sum_packed"),
    )
