"""Scalar function families (SURVEY.md §2.8: F1–F8).

Each family gets one declared query that exercises several functions over
the relevant table. All expressions are built-in pyspark.sql.functions —
JVM-side, whole-stage-codegen'd; no Python UDFs anywhere in these paths.

Cross-engine numeric notes: sqrt/round/abs/floor/ceil are IEEE-exact and
match DuckDB bit-for-bit; log/exp are libm-dependent and therefore always
rounded before output.
"""

from __future__ import annotations

import datetime

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pyspark_for_ebook_classification_spark.functions.numeric import davg, sql_davg
from pyspark_for_ebook_classification_spark.plans.registry import query
from pyspark_for_ebook_classification_spark.sources.io import load


@query(
    "fn_string_suite",
    survey_ref="F1",
    oracle="""
        SELECT
            doc_id,
            upper(substring(text, 1, 10)) AS head_upper,
            length(text) AS text_len,
            CAST(length(string_split(text, ' ')) AS INT) AS n_tokens,
            concat_ws('|', lang, source) AS lang_source,
            trim(regexp_replace(substring(text, 1, 30), '[aeiou]', '', 'g')) AS devoweled_head,
            regexp_extract(text, '([a-z]+) sort', 1) AS before_sort,
            levenshtein(string_split(text, ' ')[1], 'merge') AS lev_to_merge
        FROM documents
        WHERE doc_id % 20 = 0
    """,
)
def fn_string_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String family: case, substring, length, split, concat_ws,
    regexp_replace/extract, levenshtein."""
    d = load(spark, sf_dir, "documents")
    tokens = F.split(F.col("text"), " ")
    return d.filter(F.col("doc_id") % 20 == 0).select(
        "doc_id",
        F.upper(F.substring("text", 1, 10)).alias("head_upper"),
        F.length("text").cast("bigint").alias("text_len"),
        F.size(tokens).alias("n_tokens"),
        F.concat_ws("|", "lang", "source").alias("lang_source"),
        F.trim(F.regexp_replace(F.substring("text", 1, 30), "[aeiou]", "")).alias(
            "devoweled_head"
        ),
        F.regexp_extract("text", "([a-z]+) sort", 1).alias("before_sort"),
        F.levenshtein(F.element_at(tokens, 1), F.lit("merge")).alias("lev_to_merge"),
    )


@query(
    "fn_date_suite",
    survey_ref="F2",
    oracle="""
        SELECT
            o_orderkey,
            CAST(year(o_orderdate) AS INT) AS y,
            CAST(month(o_orderdate) AS INT) AS m,
            CAST(day(o_orderdate) AS INT) AS d,
            date_trunc('month', o_orderdate) AS month_start,
            CAST(o_orderdate + INTERVAL 30 DAY AS TIMESTAMP) AS due_date,
            CAST(date_diff('day', TIMESTAMP '1995-01-01 00:00:00', o_orderdate) AS INT) AS days_since_epoch_start,
            CAST(date_part('epoch', o_orderdate) AS BIGINT) AS unix_sec,
            CAST(CAST(o_orderdate AS DATE) AS TIMESTAMP) AS order_date
        FROM orders
        WHERE o_orderkey % 100 = 0
    """,
)
def fn_date_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time family: extract, trunc, interval add, diff, epoch, cast."""
    o = load(spark, sf_dir, "orders")
    return o.filter(F.col("o_orderkey") % 100 == 0).select(
        "o_orderkey",
        F.year("o_orderdate").cast("int").alias("y"),
        F.month("o_orderdate").cast("int").alias("m"),
        F.dayofmonth("o_orderdate").cast("int").alias("d"),
        F.date_trunc("month", "o_orderdate").alias("month_start"),
        (F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS")).alias("due_date"),
        F.datediff(F.col("o_orderdate"), F.lit("1995-01-01").cast("date"))
        .cast("int")
        .alias("days_since_epoch_start"),
        F.unix_timestamp("o_orderdate").alias("unix_sec"),
        # DATE round-trip, emitted as midnight TIMESTAMP: pandas conversion
        # of a bare DATE differs between engines (date object vs datetime64)
        F.col("o_orderdate").cast("date").cast("timestamp").alias("order_date"),
    )


@query(
    "fn_math_suite",
    survey_ref="F3",
    oracle="""
        SELECT
            l_orderkey,
            l_linenumber,
            round(l_extendedprice * (1 - l_discount), 4) AS net_rounded,
            abs(l_discount - l_tax) AS rate_gap,
            CAST(ceil(l_quantity / 10.0) AS BIGINT) AS qty_decile,
            CAST(floor(l_extendedprice / 1000.0) AS BIGINT) AS price_k,
            sqrt(l_extendedprice) AS price_sqrt,
            l_quantity * l_quantity AS qty_sq,
            greatest(l_discount, l_tax) AS max_rate,
            least(l_discount, l_tax) AS min_rate,
            CASE WHEN l_discount > 0.05 THEN 'high' WHEN l_discount > 0.02 THEN 'mid'
                 ELSE 'low' END AS disc_class
        FROM lineitem
        WHERE l_orderkey % 1000 = 0
    """,
)
def fn_math_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math family — IEEE-exact ops only (sqrt not pow, x*x not pow(x,2)),
    so values are bit-identical to the oracle with no rounding crutch
    except the explicit round() under test."""
    li = load(spark, sf_dir, "lineitem")
    return li.filter(F.col("l_orderkey") % 1000 == 0).select(
        "l_orderkey",
        "l_linenumber",
        # scale 4, NOT 2: the products have exactly 4 true decimal digits
        # (2-digit prices × 2-digit rates), so scale-4 rounding is the
        # identity in both engines, while scale-2 hits true x.xx5 ties where
        # Spark (shortest-repr, half-up) and DuckDB (exact-expansion) split.
        F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4).alias("net_rounded"),
        F.abs(F.col("l_discount") - F.col("l_tax")).alias("rate_gap"),
        F.ceil(F.col("l_quantity") / 10.0).alias("qty_decile"),
        F.floor(F.col("l_extendedprice") / 1000.0).alias("price_k"),
        F.sqrt("l_extendedprice").alias("price_sqrt"),
        (F.col("l_quantity") * F.col("l_quantity")).alias("qty_sq"),
        F.greatest("l_discount", "l_tax").alias("max_rate"),
        F.least("l_discount", "l_tax").alias("min_rate"),
        F.when(F.col("l_discount") > 0.05, "high")
        .when(F.col("l_discount") > 0.02, "mid")
        .otherwise("low")
        .alias("disc_class"),
    )


@query(
    "fn_array_suite",
    survey_ref="F4",
    oracle="""
        SELECT
            vec_id,
            CAST(length(embedding) AS INT) AS dim,
            CAST(embedding[1] AS DOUBLE) AS first_val,
            CAST(embedding[64] AS DOUBLE) AS last_val,
            CAST(list_min(embedding) AS DOUBLE) AS min_val,
            CAST(list_max(embedding) AS DOUBLE) AS max_val,
            CAST(length(list_filter(embedding, x -> x > 0)) AS INT) AS n_positive,
            CAST(list_sum(list_transform(embedding,
                 x -> CAST(CAST(x AS DOUBLE) AS DECIMAL(38,6)))) AS DOUBLE)
                AS sum_decimal
        FROM embeddings
        WHERE vec_id % 25 = 0
    """,
)
def fn_array_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array family over the embedding column: size, element_at,
    array_min/max, filter, and a decimal-stable fold (F.aggregate)."""
    e = load(spark, sf_dir, "embeddings")
    emb = F.col("embedding")
    return e.filter(F.col("vec_id") % 25 == 0).select(
        "vec_id",
        F.size(emb).alias("dim"),
        F.element_at(emb, 1).cast("double").alias("first_val"),
        F.element_at(emb, 64).cast("double").alias("last_val"),
        F.array_min(emb).cast("double").alias("min_val"),
        F.array_max(emb).cast("double").alias("max_val"),
        F.size(F.filter(emb, lambda x: x > 0)).alias("n_positive"),
        # float → DOUBLE first (exact), THEN decimal: DuckDB's direct
        # float→decimal cast rounds in float arithmetic and drifts 1 ulp.
        F.aggregate(
            emb,
            F.lit(0).cast("decimal(38,6)"),
            lambda acc, x: (acc + x.cast("double").cast("decimal(38,6)")).cast(
                "decimal(38,6)"
            ),
        )
        .cast("double")
        .alias("sum_decimal"),
    )


@query(
    "fn_explode_tokens",
    survey_ref="F4,L4",
    oracle="""
        SELECT token, COUNT(*) AS n
        FROM (
            SELECT unnest(string_split(text, ' ')) AS token
            FROM documents WHERE doc_id % 50 = 0
        )
        WHERE token <> ''
        GROUP BY token
    """,
)
def fn_explode_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """explode(split()) — the row-generating path that feeds every text
    operator; generator output never materializes, it streams straight
    into the partial aggregation."""
    d = load(spark, sf_dir, "documents")
    return (
        d.filter(F.col("doc_id") % 50 == 0)
        .select(F.explode(F.split("text", " ")).alias("token"))
        .filter(F.col("token") != "")
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@query(
    "fn_json_map_suite",
    survey_ref="F5,F6",
    oracle=f"""
        SELECT
            event_type,
            COUNT(*) AS n_events,
            {sql_davg("CAST(json_extract_string(props, '$.k') AS INT)", 'avg_k')},
            CAST(MIN(CAST(json_extract_string(props, '$.k') AS INT)) AS INT) AS min_k,
            CAST(MAX(CAST(json_extract_string(props, '$.k') AS INT)) AS INT) AS max_k
        FROM events
        GROUP BY event_type
    """,
)
def fn_json_map_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON family: schema'd from_json over events.props (never
    schema-inferring JSON at scale), then map access via getItem."""
    ev = load(spark, sf_dir, "events")
    k = F.from_json("props", "k INT").getItem("k")
    return (
        ev.withColumn("k", k)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            davg("k", "avg_k"),
            F.min("k").cast("int").alias("min_k"),
            F.max("k").cast("int").alias("max_k"),
        )
    )


@query(
    "fn_map_suite",
    survey_ref="F5",
    oracle="""
        SELECT
            event_type,
            COUNT(*) AS n,
            CAST(MIN(map {'k': CAST(json_extract_string(props, '$.k') AS INT),
                          'len': length(props)}['k'][1]) AS INT) AS min_k_via_map,
            CAST(MAX(map {'k': CAST(json_extract_string(props, '$.k') AS INT),
                          'len': length(props)}['len'][1]) AS INT) AS max_len_via_map
        FROM events
        GROUP BY event_type
    """,
)
def fn_map_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map family: create_map + element_at round-trip (values emitted as
    scalars — raw MAP columns don't compare portably across drivers)."""
    ev = load(spark, sf_dir, "events")
    m = F.create_map(
        F.lit("k"),
        F.from_json("props", "k INT").getItem("k"),
        F.lit("len"),
        F.length("props").cast("int"),
    )
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.min(F.element_at(m, "k")).cast("int").alias("min_k_via_map"),
        F.max(F.element_at(m, "len")).cast("int").alias("max_len_via_map"),
    )


@query(
    "fn_hash_suite",
    survey_ref="F7",
    oracle="""
        SELECT
            doc_id,
            md5(text) AS text_md5,
            sha256(text) AS text_sha256,
            md5(concat(lang, ':', text)) AS keyed_md5
        FROM documents
        WHERE doc_id % 50 = 0
    """,
)
def fn_hash_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash family: md5 / sha2-256 hex digests are engine-portable (unlike
    xxhash64, which is Spark-internal — used only for in-engine salting)."""
    d = load(spark, sf_dir, "documents")
    return d.filter(F.col("doc_id") % 50 == 0).select(
        "doc_id",
        F.md5("text").alias("text_md5"),
        F.sha2(F.col("text"), 256).alias("text_sha256"),
        F.md5(F.concat_ws(":", "lang", "text")).alias("keyed_md5"),
    )


@query(
    "fn_null_suite",
    survey_ref="F8",
    oracle="""
        SELECT
            o_orderkey,
            COALESCE(NULLIF(o_orderstatus, 'P'), 'PENDING') AS status_resolved,
            NULLIF(o_orderpriority, '4-NOT SPECIFIED') IS NULL AS is_unspecified,
            CAST(COALESCE(CASE WHEN o_totalprice > 100000 THEN o_totalprice END, 0.0)
                 AS DOUBLE) AS big_price_or_zero,
            o_orderstatus IS NOT DISTINCT FROM 'F' AS is_finished_nullsafe,
            isnan(CAST('NaN' AS DOUBLE) * o_totalprice) AS nan_detected
        FROM orders
        WHERE o_orderkey % 200 = 0
    """,
)
def fn_null_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NULL family: coalesce, nullif, null predicates, null-safe equality."""
    o = load(spark, sf_dir, "orders")
    return o.filter(F.col("o_orderkey") % 200 == 0).select(
        "o_orderkey",
        F.coalesce(F.nullif("o_orderstatus", F.lit("P")), F.lit("PENDING")).alias(
            "status_resolved"
        ),
        F.nullif("o_orderpriority", F.lit("4-NOT SPECIFIED")).isNull().alias(
            "is_unspecified"
        ),
        F.coalesce(
            F.when(F.col("o_totalprice") > 100000, F.col("o_totalprice")), F.lit(0.0)
        )
        .cast("double")
        .alias("big_price_or_zero"),
        F.col("o_orderstatus").eqNullSafe(F.lit("F")).alias("is_finished_nullsafe"),
        F.isnan(F.lit(float("nan")) * F.col("o_totalprice")).alias("nan_detected"),
    )


@query(
    "fn_posexplode_positions",
    survey_ref="F4,L4",
    oracle="""
        WITH toks AS (
            SELECT doc_id, list_filter(string_split(text, ' '), t -> t <> '') AS tokens
            FROM documents WHERE doc_id % 100 = 0
        )
        SELECT doc_id, CAST(u.i - 1 AS INT) AS pos, tokens[u.i] AS token
        FROM toks,
             LATERAL (SELECT unnest(range(1, length(tokens) + 1)) AS i) u
    """,
)
def fn_posexplode_positions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """posexplode: token stream WITH positions (0-based in both engines
    after the oracle's i-1) — the chunker/windowing primitive that plain
    explode loses."""
    d = load(spark, sf_dir, "documents").filter(F.col("doc_id") % 100 == 0)
    tokens = F.filter(F.split("text", " "), lambda t: t != "")
    return d.select("doc_id", tokens.alias("tokens")).select(
        "doc_id", F.posexplode("tokens").alias("pos", "token")
    )


@query(
    "fn_bitwise_suite",
    survey_ref="F3,F7",
    oracle="""
        SELECT
            o_orderkey,
            o_orderkey & 255 AS key_and,
            o_orderkey | 4096 AS key_or,
            xor(o_orderkey, 1365) AS key_xor,
            o_orderkey << 3 AS key_shl,
            o_orderkey >> 2 AS key_shr,
            CAST(bit_count(o_orderkey) AS INT) AS key_popcount,
            ~o_orderkey AS key_not
        FROM orders
        WHERE o_orderkey % 500 = 0
    """,
)
def fn_bitwise_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise family: AND/OR/XOR/NOT, shifts, popcount — the primitives
    behind bitmap indexes, bloom membership words, and simhash banding.
    All integer-exact, hence bit-identical across engines."""
    o = load(spark, sf_dir, "orders")
    k = F.col("o_orderkey")
    return o.filter(k % 500 == 0).select(
        "o_orderkey",
        k.bitwiseAND(F.lit(255)).alias("key_and"),
        k.bitwiseOR(F.lit(4096)).alias("key_or"),
        k.bitwiseXOR(F.lit(1365)).alias("key_xor"),
        F.shiftleft(k, 3).cast("bigint").alias("key_shl"),
        F.shiftright(k, 2).cast("bigint").alias("key_shr"),
        F.bit_count(k).alias("key_popcount"),
        F.expr("~o_orderkey").alias("key_not"),
    )


@query(
    "fn_struct_suite",
    survey_ref="F5,F6",
    oracle="""
        SELECT
            n_nationkey,
            struct_pack(name := n_name, region := n_regionkey).name AS packed_name,
            to_json(struct_pack(key := n_nationkey, name := n_name)) AS as_json,
            CAST(struct_pack(a := n_nationkey, b := n_regionkey).b
                 + struct_pack(a := n_nationkey, b := n_regionkey).a AS BIGINT) AS field_sum
        FROM nation
    """,
)
def fn_struct_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Struct family: named_struct construction, field access, struct →
    JSON serialization. Structs are how multimodal metadata rides along
    relational rows (SURVEY §1.2); output is scalar fields/JSON strings so
    the cross-engine hash compares primitives, not engine-native nesting."""
    n = load(spark, sf_dir, "nation")
    packed = F.struct(
        F.col("n_nationkey").alias("key"), F.col("n_name").alias("name")
    )
    ab = F.struct(F.col("n_nationkey").alias("a"), F.col("n_regionkey").alias("b"))
    return n.select(
        "n_nationkey",
        F.struct(F.col("n_name").alias("name"), F.col("n_regionkey").alias("region"))
        .getField("name")
        .alias("packed_name"),
        F.to_json(packed).alias("as_json"),
        (ab.getField("b") + ab.getField("a")).cast("bigint").alias("field_sum"),
    )


@query(
    "fn_variant_suite",
    survey_ref="F6,F5",
    oracle="""
        SELECT
            event_type,
            COUNT(*) AS n_events,
            CAST(MIN(CAST(json_extract_string(props, '$.k') AS INT)) AS INT)
                AS min_k,
            CAST(MAX(CAST(json_extract_string(props, '$.k') AS INT) * 2) AS INT)
                AS max_k2,
            CAST(SUM(CASE WHEN json_extract_string(props, '$.missing') IS NULL
                          THEN 1 ELSE 0 END) AS BIGINT) AS n_missing
        FROM events
        GROUP BY event_type
    """,
)
def fn_variant_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 VARIANT path for semi-structured data: ``parse_json`` into
    an open VARIANT value (no up-front schema — the shredded binary
    encoding scales to heterogeneous payloads where a fixed ``from_json``
    struct can't), field access via ``variant_get`` with a target type,
    and ``try_variant_get`` for absent paths (NULL, never an error). The
    DuckDB twin expresses the same accesses over its native JSON type."""
    ev = load(spark, sf_dir, "events")
    v = F.parse_json("props")
    k = F.variant_get(v, "$.k", "int")
    missing = F.try_variant_get(v, "$.missing", "string")
    return (
        ev.select("event_type", k.alias("k"), missing.alias("missing"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("k").cast("int").alias("min_k"),
            F.max(F.col("k") * 2).cast("int").alias("max_k2"),
            F.sum(F.when(F.col("missing").isNull(), 1).otherwise(0))
            .cast("bigint")
            .alias("n_missing"),
        )
    )


@query(
    "fn_try_suite",
    survey_ref="F8,F3",
    oracle="""
        SELECT
            o_orderkey,
            o_totalprice / nullif(o_orderkey % 3, 0) AS safe_ratio,
            TRY_CAST(substring(o_orderpriority, 1, 1) AS INT) AS prio_digit,
            TRY_CAST(o_orderstatus AS INT) IS NULL AS status_not_numeric,
            TRY_CAST(o_orderpriority AS TIMESTAMP) IS NULL AS prio_not_ts
        FROM orders
        WHERE o_orderkey % 150 = 0
    """,
)
def fn_try_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANSI-safe ``try_*`` family — Spark 4 runs under ANSI mode, where a
    bad cast or division by zero THROWS mid-job; at 100 TB one malformed
    row a billion rows in must yield NULL, not kill the stage. try_divide
    for /0, try_cast for lossy casts, try_to_timestamp for unparseable
    dates. Per-row doubles are IEEE-identical cross-engine, so safe_ratio
    needs no rounding."""
    o = load(spark, sf_dir, "orders")
    return o.filter(F.col("o_orderkey") % 150 == 0).select(
        "o_orderkey",
        F.try_divide(
            "o_totalprice", F.nullif(F.col("o_orderkey") % 3, F.lit(0))
        ).alias("safe_ratio"),
        F.expr("try_cast(substring(o_orderpriority, 1, 1) AS INT)").alias(
            "prio_digit"
        ),
        F.expr("try_cast(o_orderstatus AS INT)").isNull().alias(
            "status_not_numeric"
        ),
        F.try_to_timestamp("o_orderpriority").isNull().alias("prio_not_ts"),
    )


@query(
    "fn_higher_order_suite",
    survey_ref="F4,F1",
    oracle="""
        WITH tok AS (
            SELECT doc_id,
                   list_filter(string_split(text, ' '), t -> t <> '') AS tokens
            FROM documents
            WHERE doc_id % 7 = 0
        )
        SELECT
            doc_id,
            CAST(length(list_filter(tokens, t -> length(t) > 5)) AS INT)
                AS n_long,
            length(list_filter(tokens, t -> t = 'the')) > 0 AS has_the,
            length(list_filter(tokens, t -> NOT regexp_matches(t, '^[a-z]+$')))
                = 0 AS all_lower_alpha,
            array_to_string(list_transform(tokens[1:3], t -> upper(t)), '-')
                AS sig3,
            CAST(COALESCE(list_position(tokens, 'the'), 0) AS BIGINT)
                AS pos_the
        FROM tok
        WHERE length(tokens) > 0
    """,
)
def fn_higher_order_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order lambda functions over token arrays: filter, exists,
    forall, transform (on a slice), and array_position. All evaluate
    inside codegen'd JVM expressions — the declarative alternative to a
    Python UDF for per-element logic, which is exactly what keeps
    per-token work scan-speed at 100 TB."""
    d = load(spark, sf_dir, "documents")
    tokens = F.filter(F.split("text", " "), lambda t: t != "")
    return (
        d.filter(F.col("doc_id") % 7 == 0)
        .select("doc_id", tokens.alias("tokens"))
        .filter(F.size("tokens") > 0)
        .select(
            "doc_id",
            F.size(F.filter("tokens", lambda t: F.length(t) > 5)).alias("n_long"),
            F.exists("tokens", lambda t: t == "the").alias("has_the"),
            F.forall("tokens", lambda t: t.rlike("^[a-z]+$")).alias(
                "all_lower_alpha"
            ),
            F.concat_ws(
                "-", F.transform(F.slice("tokens", 1, 3), lambda t: F.upper(t))
            ).alias("sig3"),
            F.array_position("tokens", "the").alias("pos_the"),
        )
    )


@query(
    "fn_xml_parse_suite",
    survey_ref="F6,F1",
    oracle="""
        SELECT
            s_suppkey,
            '<supplier><k>' || CAST(s_suppkey AS VARCHAR) || '</k><n>'
                || s_name || '</n><b>' || CAST(s_nationkey AS VARCHAR)
                || '</b></supplier>' AS xml_doc,
            s_suppkey AS parsed_key,
            s_name AS parsed_name,
            CAST(s_nationkey AS INT) AS parsed_nation
        FROM supplier
        WHERE s_suppkey % 4 = 0
    """,
)
def fn_xml_parse_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """from_xml (Spark-4 scalar XML parsing): rows are serialized to XML
    strings in-plan, then parsed back with an explicit struct schema and
    the fields re-extracted — the XML analogue of the from_json path for
    feeds that arrive as markup. The oracle never touches XML: it knows
    the parse must be the identity on what was serialized."""
    s = load(spark, sf_dir, "supplier").filter(F.col("s_suppkey") % 4 == 0)
    xml = F.concat(
        F.lit("<supplier><k>"),
        F.col("s_suppkey").cast("string"),
        F.lit("</k><n>"),
        F.col("s_name"),
        F.lit("</n><b>"),
        F.col("s_nationkey").cast("string"),
        F.lit("</b></supplier>"),
    )
    parsed = F.from_xml(xml, "k BIGINT, n STRING, b INT")
    return s.select(
        "s_suppkey",
        xml.alias("xml_doc"),
        parsed.getField("k").alias("parsed_key"),
        parsed.getField("n").alias("parsed_name"),
        parsed.getField("b").alias("parsed_nation"),
    )


@query(
    "fn_explode_outer_preserves_rows",
    survey_ref="F4,F8",
    oracle="""
        WITH docs AS (
            SELECT doc_id,
                   list_filter(string_split(text, ' '),
                               t -> t <> '' AND length(t) >= 8) AS long_toks
            FROM documents
            WHERE doc_id % 6 = 0
        )
        SELECT doc_id, u.tok AS long_token
        FROM docs
        CROSS JOIN unnest(
            CASE WHEN length(long_toks) = 0
                 THEN [CAST(NULL AS VARCHAR)] ELSE long_toks END
        ) AS u(tok)
    """,
)
def fn_explode_outer_preserves_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """explode_outer: rows whose array is EMPTY survive with a NULL
    element instead of vanishing — the null-preserving explode a
    left-join-shaped pipeline needs (e.g. every doc keeps a row even
    when it has no qualifying tokens, so downstream counts don't silently
    drop docs). The oracle emulates it by substituting [NULL] for empty
    lists before unnesting."""
    d = load(spark, sf_dir, "documents")
    long_toks = F.filter(
        F.split("text", " "), lambda t: (t != "") & (F.length(t) >= 8)
    )
    return (
        d.filter(F.col("doc_id") % 6 == 0)
        .select("doc_id", long_toks.alias("long_toks"))
        .select("doc_id", F.explode_outer("long_toks").alias("long_token"))
    )


@query(
    "fn_string_suite2",
    survey_ref="F1",
    oracle="""
        SELECT
            doc_id,
            split_part(text, ' ', 2) AS second_token,
            CAST(strpos(text, 'the') AS INT) AS first_the_pos,
            left(text, 5) AS head5,
            right(text, 5) AS tail5,
            contains(text, 'data') AS has_data,
            starts_with(text, 'the ') AS starts_the,
            ends_with(text, '.') AS ends_period,
            COALESCE(array_to_string(regexp_extract_all(text, '[0-9]+'), '|'), '') AS numbers,
            repeat('ab', 3) AS abab,
            reverse(split_part(text, ' ', 1)) AS first_tok_rev
        FROM documents
        WHERE doc_id % 15 = 0
    """,
)
def fn_string_suite2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Second string family: split_part, instr/strpos, left/right,
    contains/starts_with/ends_with, regexp_extract_all, repeat, reverse.
    All JVM codegen; DuckDB names differ (instr→strpos) but semantics are
    1-based and identical. The regexp_extract_all array is flattened to a
    '|'-joined string in BOTH engines — the driver's canonicalizer sorts
    raw pandas columns and cannot hash list cells (r3 driver failure), so
    every registered query emits scalar columns only (guard:
    tests/test_oracle_parity.py::test_no_nested_output_columns). On docs
    with ZERO matches, Spark's array_join([], '|') is '' while DuckDB's
    array_to_string (string_agg) is NULL — the oracle COALESCEs to ''
    so both engines agree on the empty-match case (r4 verdict item 2)."""
    d = load(spark, sf_dir, "documents")
    return d.filter(F.col("doc_id") % 15 == 0).select(
        "doc_id",
        F.expr("split_part(text, ' ', 2)").alias("second_token"),
        F.instr("text", "the").cast("int").alias("first_the_pos"),
        F.expr("left(text, 5)").alias("head5"),
        F.expr("right(text, 5)").alias("tail5"),
        F.col("text").contains("data").alias("has_data"),
        F.col("text").startswith("the ").alias("starts_the"),
        F.col("text").endswith(".").alias("ends_period"),
        F.array_join(F.expr("regexp_extract_all(text, '[0-9]+', 0)"), "|").alias("numbers"),
        F.repeat(F.lit("ab"), 3).alias("abab"),
        F.reverse(F.expr("split_part(text, ' ', 1)")).alias("first_tok_rev"),
    )


@query(
    "fn_binary_string_suite",
    survey_ref="F1,F7",
    doc="Binary↔string interop: base64/hex/encode, octet vs char length, pads and slices.",
    oracle="""
        SELECT
            doc_id,
            to_base64(encode(substring(text, 1, 30))) AS b64_head,
            hex(substring(text, 1, 8)) AS hex_head,
            CAST(strlen(text) AS INT) AS octet_len,
            CAST(length(text) AS INT) AS char_len,
            ascii(substring(text, 1, 1)) AS first_cp,
            left(text, 5) AS head5,
            right(text, 5) AS tail5,
            reverse(substring(text, 1, 12)) AS rev_head,
            lpad(CAST(doc_id AS VARCHAR), 8, '0') AS padded_id,
            translate(substring(text, 1, 20), 'aeiou', 'AEIOU') AS shouted_head
        FROM documents
        WHERE doc_id % 25 = 0
    """,
)
def fn_binary_string_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1/F7 binary↔string interop — the codec-boundary functions a corpus
    store round-trips payloads through: base64 of UTF-8-encoded text, hex
    of leading bytes, octet vs character length (equal on ASCII, split on
    multibyte — both engines count identically either way), code-point of
    the first char, fixed-width id padding, and slice/reverse/translate.
    All JVM-side codegen'd projections — one scan, no shuffle."""
    d = load(spark, sf_dir, "documents").filter(F.col("doc_id") % 25 == 0)
    return d.select(
        "doc_id",
        F.base64(F.encode(F.substring("text", 1, 30), "utf-8")).alias("b64_head"),
        F.hex(F.substring("text", 1, 8)).alias("hex_head"),
        F.octet_length("text").cast("int").alias("octet_len"),
        F.char_length("text").cast("int").alias("char_len"),
        F.ascii(F.substring("text", 1, 1)).alias("first_cp"),
        F.expr("left(text, 5)").alias("head5"),
        F.expr("right(text, 5)").alias("tail5"),
        F.reverse(F.substring("text", 1, 12)).alias("rev_head"),
        F.lpad(F.col("doc_id").cast("string"), 8, "0").alias("padded_id"),
        F.translate(F.substring("text", 1, 20), "aeiou", "AEIOU").alias(
            "shouted_head"
        ),
    )


@query(
    "fn_date_suite2",
    survey_ref="F2",
    doc="Calendar arithmetic: last_day/make_date/add_months clamp, ISO week/dow, week trunc.",
    oracle="""
        SELECT o_orderkey,
               CAST(last_day(CAST(o_orderdate AS DATE)) AS TIMESTAMP)
                   AS month_end,
               CAST(make_date(CAST(year(o_orderdate) AS BIGINT),
                              CAST(month(o_orderdate) AS BIGINT), 1)
                    AS TIMESTAMP) AS month_start,
               CAST(quarter(o_orderdate) AS INT) AS qtr,
               CAST(weekofyear(o_orderdate) AS INT) AS iso_week,
               CAST(isodow(o_orderdate) AS INT) AS iso_dow,
               CAST(CAST(o_orderdate AS DATE) + INTERVAL 2 MONTH AS TIMESTAMP)
                   AS plus_2_months,
               CAST(date_trunc('week', o_orderdate) AS TIMESTAMP) AS week_start,
               CAST(date_diff('day', CAST(o_orderdate AS DATE),
                              CAST('2001-01-01' AS DATE)) AS INT)
                   AS days_to_2001
        FROM orders WHERE o_orderkey % 100 = 0
    """,
)
def fn_date_suite2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F2 calendar depth beyond the first date suite: month-end snapping
    (last_day), date construction (make_date), end-of-month-clamped month
    arithmetic (Spark add_months ≡ DuckDB +INTERVAL MONTH — both clamp
    Jan 31 + 1mo to Feb 28), ISO week number and ISO day-of-week (Spark's
    weekday() is 0=Monday, so +1 ≡ DuckDB isodow — NEVER dayofweek, whose
    Sunday origin differs between engines), Monday-aligned week truncation,
    and day differences. All map-side projections; date outputs are cast
    to TIMESTAMP because the driver compares pandas frames and a DATE
    column renders differently per engine."""
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 100 == 0)
    d = F.col("o_orderdate").cast("date")
    return o.select(
        "o_orderkey",
        F.last_day(d).cast("timestamp").alias("month_end"),
        F.make_date(F.year(d), F.month(d), F.lit(1))
        .cast("timestamp")
        .alias("month_start"),
        F.quarter(d).cast("int").alias("qtr"),
        F.weekofyear(d).cast("int").alias("iso_week"),
        (F.weekday(d) + 1).cast("int").alias("iso_dow"),
        F.add_months(d, 2).cast("timestamp").alias("plus_2_months"),
        F.date_trunc("week", "o_orderdate").cast("timestamp").alias("week_start"),
        F.datediff(F.lit("2001-01-01").cast("date"), d).cast("int").alias(
            "days_to_2001"
        ),
    )


@query(
    "fn_time_suite",
    survey_ref="F2",
    doc="Time-of-day functions: extraction, epoch seconds, 15-min buckets, interval shift, formatting.",
    oracle="""
        SELECT event_id,
               CAST(hour(CAST(ts AS TIMESTAMP)) AS INT) AS hr,
               CAST(minute(CAST(ts AS TIMESTAMP)) AS INT) AS mins,
               CAST(second(CAST(ts AS TIMESTAMP)) AS INT) AS secs,
               CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT) AS epoch_s,
               time_bucket(INTERVAL 15 MINUTE, CAST(ts AS TIMESTAMP))
                   AS bucket_15m,
               CAST(ts AS TIMESTAMP) + INTERVAL 90 MINUTE AS plus_90m,
               strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d %H:%M:%S') AS formatted
        FROM events WHERE event_id % 200 = 0
    """,
)
def fn_time_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F2 sub-day time math on the event stream: h/m/s extraction, whole
    epoch seconds (unix_timestamp truncation ≡ floor(epoch()) for
    post-1970 data), 15-minute epoch-aligned bucketing (window().start ≡
    DuckDB time_bucket — the same alignment contract the streaming twins
    rely on), interval shifting, and locale-free timestamp formatting.
    The ns→µs normalization comes from the shared events loader; all
    projections are map-side codegen."""
    ev = load(spark, sf_dir, "events").filter(F.col("event_id") % 200 == 0)
    return ev.select(
        "event_id",
        F.hour("ts").cast("int").alias("hr"),
        F.minute("ts").cast("int").alias("mins"),
        F.second("ts").cast("int").alias("secs"),
        F.unix_timestamp("ts").cast("bigint").alias("epoch_s"),
        F.window("ts", "15 minutes").start.alias("bucket_15m"),
        (F.col("ts") + F.expr("INTERVAL 90 MINUTE")).alias("plus_90m"),
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("formatted"),
    )


@query(
    "fn_url_suite",
    survey_ref="F1,F4",
    doc="URL decomposition (host / path / query / single param / "
    "registrable label) with Spark's parse_url vs a regexp oracle.",
    oracle="""
        WITH urls AS (
            SELECT doc_id,
                   'https://' || source || '.example.org/docs/'
                       || CAST(doc_id AS VARCHAR) || '?lang=' || lang
                       || '&n=' || CAST(n_chars AS VARCHAR) AS url
            FROM documents
        )
        SELECT doc_id,
               url,
               regexp_extract(url, 'https://([^/]+)/', 1) AS host,
               regexp_extract(url, 'https://[^/]+(/[^?]*)', 1) AS path,
               regexp_extract(url, '\\?(.*)$', 1) AS query,
               regexp_extract(url, '[?&]lang=([^&]*)', 1) AS lang_param,
               split_part(regexp_extract(url, 'https://([^/]+)/', 1), '.', 1)
                   AS domain_label
        FROM urls
    """,
)
def fn_url_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """parse_url (HOST / PATH / QUERY / QUERY:key) over synthesized
    well-formed URLs. The oracle decomposes the same URLs with regexps —
    on RFC-shaped input the two definitions coincide, which is the
    point: the suite pins Spark's parse_url semantics against an
    engine-independent specification. All map-side, codegen'd; at scale
    this is the per-record URL normalization pass of a web-corpus
    pipeline (composes with dedup/quality gates upstream)."""
    d = load(spark, sf_dir, "documents")
    url = F.concat(
        F.lit("https://"),
        F.col("source"),
        F.lit(".example.org/docs/"),
        F.col("doc_id").cast("string"),
        F.lit("?lang="),
        F.col("lang"),
        F.lit("&n="),
        F.col("n_chars").cast("string"),
    )
    u = d.select("doc_id", url.alias("url"))
    return u.select(
        "doc_id",
        "url",
        F.parse_url("url", F.lit("HOST")).alias("host"),
        F.parse_url("url", F.lit("PATH")).alias("path"),
        F.parse_url("url", F.lit("QUERY")).alias("query"),
        F.parse_url("url", F.lit("QUERY"), F.lit("lang")).alias("lang_param"),
        F.substring_index(F.parse_url("url", F.lit("HOST")), ".", 1).alias(
            "domain_label"
        ),
    )


@query(
    "fn_sql_udf_suite",
    survey_ref="F3,F1,P2,§3-EP3",
    doc="Spark 4 SQL UDFs: a scalar CREATE FUNCTION and a table-valued "
    "one (RETURNS TABLE) composed in a single query.",
    oracle="""
        SELECT doc_id, n_chars,
               round(CAST(n_chars AS DOUBLE) * (1 - 0.1) * (1 + 0.05), 6)
                   AS adj_chars,
               upper(substring(lang, 1, 1)) || lower(substring(source, 1, 1))
                   AS tag
        FROM documents
        WHERE n_chars >= 300
    """,
)
def fn_sql_udf_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL-defined functions (Spark 4 `CREATE FUNCTION ... RETURN`):
    logic registered ONCE in the catalog as declarative SQL, reused
    across queries — the engine's answer to shared business expressions
    without Python UDF overhead. Catalyst INLINES the bodies at analysis
    time (both functions below compile into the scan's projection and
    the TVF's predicate pushes into the parquet read — there is no
    function-call boundary at runtime, unlike every Python UDF tier in
    operators/udfs.py). The scalar function applies a rate adjustment;
    the table-valued function parameterizes a filtered projection of
    documents; the oracle inlines both bodies, which is exactly what
    Catalyst does."""
    load(spark, sf_dir, "documents").createOrReplaceTempView("documents")
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION adj_rate(x DOUBLE, disc DOUBLE,"
        " tax DOUBLE) RETURNS DOUBLE RETURN x * (1 - disc) * (1 + tax)"
    )
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION lang_tag(l STRING, s STRING)"
        " RETURNS STRING RETURN upper(substring(l, 1, 1)) ||"
        " lower(substring(s, 1, 1))"
    )
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION long_docs(min_chars INT)"
        " RETURNS TABLE(doc_id BIGINT, n_chars BIGINT, lang STRING,"
        " source STRING)"
        " RETURN SELECT doc_id, n_chars, lang, source FROM documents"
        " WHERE n_chars >= min_chars"
    )
    return spark.sql(
        """
        SELECT doc_id, n_chars,
               round(adj_rate(CAST(n_chars AS DOUBLE), 0.1, 0.05), 6)
                   AS adj_chars,
               lang_tag(lang, source) AS tag
        FROM long_docs(300)
        """
    )


@query(
    "sql_parameterized_markers",
    survey_ref="P2,P3,A1,§3-EP3",
    doc="Parameterized SQL (named markers + IDENTIFIER clause): the "
    "injection-safe query-template surface.",
    oracle="""
        SELECT o_orderpriority,
               CAST(COUNT(*) AS BIGINT) AS n_orders,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(28,6))) AS DOUBLE)
                   AS total_price
        FROM orders
        WHERE o_orderdate >= DATE '1996-01-01'
          AND o_totalprice > 150000.0
        GROUP BY o_orderpriority
    """,
)
def sql_parameterized_markers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`spark.sql(text, args={...})` with named parameter markers plus
    `IDENTIFIER(:tbl)` for the table reference — the safe way to
    template queries (markers bind as typed literals AFTER parsing, so
    user values can never re-shape the query, and IDENTIFIER turns a
    string into a validated identifier rather than spliced SQL). The
    markers fold to constants at analysis time: the date and price
    predicates still reach the parquet scan as pushed filters, exactly
    as if they were written inline — parameterization costs nothing at
    execution. The oracle is the same query with the literals inlined,
    which is precisely post-binding equivalence."""
    load(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT o_orderpriority,
               COUNT(*) AS n_orders,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(28,6))) AS DOUBLE)
                   AS total_price
        FROM IDENTIFIER(:tbl)
        WHERE o_orderdate >= :cutoff
          AND o_totalprice > :min_price
        GROUP BY o_orderpriority
        """,
        args={
            "tbl": "orders",
            "cutoff": datetime.date(1996, 1, 1),
            "min_price": 150000.0,
        },
    )


@query(
    "fn_collation_suite",
    survey_ref="F1,A2,A1,§3-EP3",
    doc="Spark 4 collations: UTF8_LCASE grouping, distinct-counting and "
    "equality over deliberately case-mangled keys.",
    oracle="""
        WITH t AS (
            SELECT CASE WHEN doc_id % 2 = 0 THEN upper(lang) ELSE lang END
                       AS k,
                   CASE WHEN doc_id % 3 = 0 THEN upper(source) ELSE source END
                       AS s
            FROM documents
        )
        SELECT lower(k) AS lang_ci,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(COUNT(DISTINCT lower(s)) AS BIGINT) AS n_sources_ci,
               CAST(COUNT(DISTINCT s) AS BIGINT) AS n_sources_raw
        FROM t
        GROUP BY lower(k)
    """,
)
def fn_collation_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collated semantics WITHOUT rewriting every expression through
    lower(): the UTF8_LCASE collation changes comparison/grouping/
    distinct behavior of the COLUMN TYPE, so the query text stays
    `GROUP BY k` / `COUNT(DISTINCT s)` while matching
    case-insensitively — the Spark 4 way to make an entire pipeline
    case-insensitive at the schema level rather than per-call. On this
    ASCII corpus UTF8_LCASE coincides with lower()-normalization, which
    is exactly what the oracle does; n_sources_raw (binary collation)
    sits alongside to show the two collations genuinely diverge on the
    mangled keys. Hash aggregates on collated strings still partial-agg
    map-side (the collation key is computed into the grouping hash)."""
    d = load(spark, sf_dir, "documents")
    k = F.when(F.col("doc_id") % 2 == 0, F.upper("lang")).otherwise(F.col("lang"))
    src = F.when(F.col("doc_id") % 3 == 0, F.upper("source")).otherwise(
        F.col("source")
    )
    t = d.select(
        F.collate(k, "UTF8_LCASE").alias("k"),
        src.alias("s"),
        F.collate(src, "UTF8_LCASE").alias("s_ci"),
    )
    return t.groupBy("k").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.countDistinct("s_ci").cast("bigint").alias("n_sources_ci"),
        F.countDistinct("s").cast("bigint").alias("n_sources_raw"),
    ).select(
        F.lower(F.col("k").cast("string")).alias("lang_ci"),
        "n_docs",
        "n_sources_ci",
        "n_sources_raw",
    )


@query(
    "fn_map_hof_suite",
    survey_ref="F5,F4,A1",
    doc="Map higher-order functions: map_from_entries / map_zip_with / "
    "transform_keys / transform_values / map_filter composed over "
    "per-user event profiles, verified by exploding back to rows.",
    oracle="""
        WITH per AS (
            SELECT user_id, upper(event_type) AS etype,
                   CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(CAST(value AS DECIMAL(28,6))) AS DOUBLE) AS sv
            FROM events WHERE user_id % 25 = 0
            GROUP BY user_id, upper(event_type)
        )
        SELECT user_id,
               etype,
               n,
               round(sv, 6) AS sum_value,
               round(CAST(n AS DOUBLE)
                     / SUM(n) OVER (PARTITION BY user_id), 6) AS share,
               CAST(n >= 10 AS BOOLEAN) AS is_frequent
        FROM per
    """,
)
def fn_map_hof_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full map-HOF surface in one pipeline: per-user profiles are
    materialized AS MAPS (map_from_entries over grouped counts/sums),
    then map_zip_with merges the two maps key-wise, transform_keys
    re-tags the keys (an INJECTIVE transform — upper-casing inside
    transform_keys would throw Spark's duplicate-map-key error the moment
    two raw event types collide after normalization, e.g. 'buy'/'Buy';
    case normalization therefore happens at AGGREGATION time in both
    engines, where colliding raws merge into one group, pinned by
    tests/test_regressions.py::test_map_hof_suite_mixed_case_keys),
    transform_values derives shares against the user total, and
    map_filter marks frequent types — finally exploded back to rows
    because relational rows, not map columns, are what the driver's
    value hash (and any downstream join) wants. The oracle never touches
    a map: it computes the identical rows with plain aggregation + a
    window share, which is the semantic contract — map HOFs are a LAYOUT
    choice (entries stay one row-object per user, useful when profiles
    ride along wide rows), not new semantics. Lookups into
    share_map/freq_map use the key carried through the zipped struct, so
    they survive any re-tagging of the outer map's keys. All lambdas
    execute in codegen; no Python."""
    ev = load(spark, sf_dir, "events").filter(F.col("user_id") % 25 == 0)
    per = ev.groupBy(
        "user_id", F.upper("event_type").alias("etype_norm")
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.col("value").cast("decimal(28,6)")).cast("double").alias("sv"),
    )
    maps = per.groupBy("user_id").agg(
        F.map_from_entries(F.collect_list(F.struct("etype_norm", "n"))).alias("cm"),
        F.map_from_entries(F.collect_list(F.struct("etype_norm", "sv"))).alias("sm"),
        F.sum("n").alias("total"),
    )
    # carry the map key through the zipped struct: after transform_keys
    # re-tags the outer keys, share_map/freq_map (keyed by the untagged
    # etype) are still looked up with the exact original key
    z = F.map_zip_with(
        "cm",
        "sm",
        lambda k, c, s: F.struct(c.alias("n"), s.alias("sv"), k.alias("orig_key")),
    )
    zk = F.transform_keys(z, lambda k, v: F.concat(F.lit("evt:"), k))
    shares = F.transform_values(
        "cm", lambda k, v: F.round(v.cast("double") / F.col("total"), 6)
    )
    freq = F.map_filter("cm", lambda k, v: v >= 10)
    composed = maps.select(
        "user_id",
        F.explode(zk).alias("tagged_etype", "cs"),
        shares.alias("share_map"),
        freq.alias("freq_map"),
    )
    return composed.select(
        "user_id",
        F.col("cs.orig_key").alias("etype"),
        F.col("cs.n").alias("n"),
        F.round(F.col("cs.sv"), 6).alias("sum_value"),
        F.element_at(F.col("share_map"), F.col("cs.orig_key")).alias("share"),
        F.map_contains_key(F.col("freq_map"), F.col("cs.orig_key")).alias(
            "is_frequent"
        ),
    )
