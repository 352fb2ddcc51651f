"""Scalar-function surface (SURVEY.md §2B B37-B43).

All expressions here are built-in ``pyspark.sql.functions`` — JVM-side,
whole-stage-codegen'd, zero Python in the hot path. Per-row IEEE double
arithmetic is bit-deterministic across engines, so no decimal armor is
needed outside aggregation; the only gotchas handled explicitly:

- transcendentals (``ln``) may differ by 1 ulp between libm
  implementations → rounded to 6 decimals on both sides;
- day-of-week numbering differs (Spark ``weekday`` Mon=0 vs DuckDB
  ``isodow`` Mon=1) → aligned in the oracle;
- timestamps compared/derived at second granularity where the ns-parquet
  column is involved.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

from asyncdatapipeline_spark.registry import query
from asyncdatapipeline_spark.sources.tables import load_table


@query(
    "q_fn_string",
    oracle="""
SELECT
  p_partkey,
  upper(p_name) AS name_upper,
  lower(p_brand) AS brand_lower,
  concat(p_type, ':', p_brand) AS type_brand,
  substring(p_name, 1, 4) AS name_prefix,
  length(p_name) AS name_len,
  trim('  ' || p_name || ' ') AS name_trimmed,
  regexp_extract(p_brand, 'Brand#(\\d+)', 1) AS brand_num,
  split_part(p_name, ' ', 1) AS first_word,
  replace(p_type, 'ECONOMY', 'ECO') AS type_short,
  contains(p_name, 'widget') AS is_widget
FROM part
""",
)
def q_fn_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String functions: case/concat/substring/trim/regexp/split (B37)."""
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.upper("p_name").alias("name_upper"),
        F.lower("p_brand").alias("brand_lower"),
        F.concat(F.col("p_type"), F.lit(":"), F.col("p_brand")).alias("type_brand"),
        F.substring("p_name", 1, 4).alias("name_prefix"),
        F.length("p_name").alias("name_len"),
        F.trim(F.concat(F.lit("  "), F.col("p_name"), F.lit(" "))).alias(
            "name_trimmed"
        ),
        F.regexp_extract("p_brand", r"Brand#(\d+)", 1).alias("brand_num"),
        F.split("p_name", " ").getItem(0).alias("first_word"),
        F.replace(F.col("p_type"), F.lit("ECONOMY"), F.lit("ECO")).alias("type_short"),
        F.contains(F.col("p_name"), F.lit("widget")).alias("is_widget"),
    )


@query(
    "q_fn_date",
    oracle="""
SELECT
  o_orderkey,
  year(o_orderdate) AS order_year,
  month(o_orderdate) AS order_month,
  day(o_orderdate) AS order_day,
  date_trunc('month', o_orderdate) AS order_month_start,
  CAST(CAST(o_orderdate + INTERVAL 30 DAY AS DATE) AS TIMESTAMP) AS due_date,
  date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS days_since_epoch_start,
  isodow(o_orderdate) - 1 AS order_weekday,
  CAST(last_day(CAST(o_orderdate AS DATE)) AS TIMESTAMP) AS month_end
FROM orders
""",
)
def q_fn_date(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time functions: extract/trunc/add/diff/weekday (B38)."""
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("order_year"),
        F.month("o_orderdate").alias("order_month"),
        F.dayofmonth("o_orderdate").alias("order_day"),
        F.date_trunc("month", "o_orderdate").alias("order_month_start"),
        # DATE results are emitted as midnight timestamps: pandas has no
        # date dtype, so DATE columns round-trip inconsistently between
        # Spark's toPandas (object of datetime.date) and DuckDB's .df()
        # (datetime64) — timestamps compare cleanly.
        F.date_add(F.col("o_orderdate").cast("date"), 30)
        .cast("timestamp")
        .alias("due_date"),
        F.datediff(F.col("o_orderdate").cast("date"), F.lit("1995-01-01").cast("date")).alias(
            "days_since_epoch_start"
        ),
        F.weekday("o_orderdate").alias("order_weekday"),
        F.last_day(F.col("o_orderdate").cast("date")).cast("timestamp").alias("month_end"),
    )


@query(
    "q_fn_math",
    oracle="""
SELECT
  l_orderkey,
  l_linenumber,
  abs(l_extendedprice - 30000.0) AS price_dev,
  round(l_extendedprice * 1.1, 4) AS price_bumped,
  power(l_quantity, 2) AS qty_sq,
  sqrt(l_extendedprice) AS price_sqrt,
  CAST(floor(l_discount * 100) AS BIGINT) AS disc_pct_floor,
  CAST(ceil(l_discount * 100) AS BIGINT) AS disc_pct_ceil,
  l_orderkey % 7 AS key_mod,
  CAST(sign(l_extendedprice - 30000.0) AS INTEGER) AS price_side,
  round(ln(l_extendedprice), 6) AS price_ln,
  CAST(l_quantity AS INTEGER) AS qty_int,
  CAST(CAST(l_extendedprice AS DECIMAL(18,2)) AS DOUBLE) AS price_dec
FROM lineitem
WHERE l_linenumber = 1
""",
)
def q_fn_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math functions: abs/round/pow/sqrt/floor/ceil/mod/sign/ln/casts
    (B39). sqrt is IEEE-exact; ln is rounded (libm may differ 1 ulp)."""
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_linenumber") == 1)
    price = F.col("l_extendedprice")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.abs(price - 30000.0).alias("price_dev"),
        F.round(price * 1.1, 4).alias("price_bumped"),
        F.pow("l_quantity", F.lit(2)).alias("qty_sq"),
        F.sqrt(price).alias("price_sqrt"),
        F.floor(F.col("l_discount") * 100).alias("disc_pct_floor"),
        F.ceil(F.col("l_discount") * 100).alias("disc_pct_ceil"),
        (F.col("l_orderkey") % 7).alias("key_mod"),
        F.signum(price - 30000.0).cast("int").alias("price_side"),
        F.round(F.log(price), 6).alias("price_ln"),
        F.col("l_quantity").cast("int").alias("qty_int"),
        # decimal round-trip emitted as double: pandas renders Spark
        # decimals as Decimal objects but DuckDB decimals as float64
        price.cast("decimal(18,2)").cast("double").alias("price_dec"),
    )


@query(
    "q_fn_array",
    oracle="""
SELECT
  vec_id,
  label,
  len(embedding) AS dim,
  embedding[1] AS first_component,
  array_to_string(list_transform(embedding[1:4],
        x -> CAST(CAST(round(CAST(x AS DOUBLE) * 1000000) AS BIGINT) AS VARCHAR)),
        ',') AS head4,
  array_to_string(list_transform(embedding[1:4],
        x -> CAST(CAST(round(CAST(x AS DOUBLE) * 2 * 1000000) AS BIGINT) AS VARCHAR)),
        ',') AS head4_doubled,
  len(list_filter(embedding, x -> x > 0)) AS n_positive,
  round(sqrt(list_sum(list_transform(embedding,
        x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))), 6) AS norm,
  list_contains(list_transform(embedding, x -> x > 0.5), true) AS has_large
FROM embeddings
""",
)
def q_fn_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array + higher-order functions on the embedding column (B40):
    size/element_at/slice/transform/filter/aggregate.

    The fold casts each float to double before multiplying so both
    engines run the identical sequential double accumulation; the norm is
    rounded to 6 decimals as belt-and-suspenders against summation-order
    differences in DuckDB's list_sum.

    The sliced/transformed arrays are emitted as strings (each element
    scaled by 1e6 and rounded to bigint, then joined) — the driver's
    pandas canonicalizer cannot hash ndarray cells, and integer
    formatting is identical across engines while float-to-string is not.
    Raw slice/transform output stays covered in
    tests/test_properties.py::test_fn_array_raw_arrays.
    """
    e = load_table(spark, sf_dir, "embeddings")
    emb = F.col("embedding")
    dx = lambda x: x.cast("double")  # noqa: E731
    as_fixed = lambda x: F.round(x * 1_000_000).cast("bigint").cast("string")  # noqa: E731
    return e.select(
        "vec_id",
        "label",
        F.size(emb).alias("dim"),
        F.element_at(emb, 1).alias("first_component"),
        F.array_join(
            F.transform(F.slice(emb, 1, 4), lambda x: as_fixed(dx(x))), ","
        ).alias("head4"),
        F.array_join(
            F.transform(F.slice(emb, 1, 4), lambda x: as_fixed(dx(x) * 2)), ","
        ).alias("head4_doubled"),
        F.size(F.filter(emb, lambda x: x > 0)).alias("n_positive"),
        F.round(
            F.sqrt(
                F.aggregate(emb, F.lit(0.0), lambda acc, x: acc + dx(x) * dx(x))
            ),
            6,
        ).alias("norm"),
        F.array_contains(F.transform(emb, lambda x: x > 0.5), True).alias("has_large"),
    )


@query(
    "q_fn_map",
    # The map is constructed from known columns, so the oracle states the
    # extracted ground truth directly — no engine-specific MAP syntax.
    oracle="""
SELECT
  event_id,
  event_type AS type_from_map,
  value AS value_from_map,
  'type,value' AS mkeys,
  2 AS msize
FROM events
""",
)
def q_fn_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map functions: create_map / element_at / map_keys / size (B41).

    Build a map from columns, then extract — the oracle asserts the
    round-trip recovers the source columns exactly. ``map_keys`` is
    emitted joined to a string (driver canonicalizer is scalar-only);
    raw map-typed output is covered in
    tests/test_properties.py::test_fn_map_raw_map.
    """
    e = load_table(spark, sf_dir, "events")
    m = F.create_map(
        F.lit("type"), F.col("event_type").cast("string"),
        F.lit("value"), F.col("value").cast("string"),
    )
    return e.select(
        "event_id",
        F.element_at(m, "type").alias("type_from_map"),
        F.element_at(m, "value").cast("double").alias("value_from_map"),
        F.array_join(F.map_keys(m), ",").alias("mkeys"),
        F.size(m).alias("msize"),
    )


@query(
    "q_fn_json",
    oracle="""
SELECT
  event_id,
  json_extract_string(props, '$.k') AS k_str,
  CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_int,
  CAST(json_extract_string(props, '$.k') AS INTEGER) % 10 AS k_bucket,
  json_extract_string(props, '$.nope') IS NULL AS missing_is_null
FROM events
""",
)
def q_fn_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON parsing of the ``events.props`` string column (B42):
    ``get_json_object`` path extraction and ``from_json`` to a typed
    struct (the scale-correct way: parse once, then columnar access)."""
    e = load_table(spark, sf_dir, "events")
    parsed = F.from_json("props", T.StructType([T.StructField("k", T.IntegerType())]))
    return e.select(
        "event_id",
        F.get_json_object("props", "$.k").alias("k_str"),
        parsed.getField("k").alias("k_int"),
        (parsed.getField("k") % 10).alias("k_bucket"),
        F.get_json_object("props", "$.nope").isNull().alias("missing_is_null"),
    )


@query(
    "q_fn_cond",
    oracle="""
SELECT
  o_orderkey,
  CASE
    WHEN o_totalprice >= 300000 THEN 'platinum'
    WHEN o_totalprice >= 150000 THEN 'gold'
    WHEN o_totalprice >= 50000 THEN 'silver'
    ELSE 'bronze'
  END AS tier,
  coalesce(nullif(o_orderstatus, 'O'), 'open') AS status_label,
  least(o_totalprice, 200000.0) AS capped_price,
  greatest(o_totalprice, 1000.0) AS floored_price,
  o_totalprice >= 150000 AND o_orderstatus = 'F' AS big_and_final
FROM orders
""",
)
def q_fn_cond(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional expressions: CASE WHEN / coalesce / least / greatest /
    boolean algebra (B43)."""
    o = load_table(spark, sf_dir, "orders")
    tp = F.col("o_totalprice")
    return o.select(
        "o_orderkey",
        F.when(tp >= 300000, "platinum")
        .when(tp >= 150000, "gold")
        .when(tp >= 50000, "silver")
        .otherwise("bronze")
        .alias("tier"),
        F.coalesce(F.nullif(F.col("o_orderstatus"), F.lit("O")), F.lit("open")).alias(
            "status_label"
        ),
        F.least(tp, F.lit(200000.0)).alias("capped_price"),
        F.greatest(tp, F.lit(1000.0)).alias("floored_price"),
        ((tp >= 150000) & (F.col("o_orderstatus") == "F")).alias("big_and_final"),
    )


@query(
    "q_fn_struct",
    oracle="""
SELECT c_nationkey,
  (max(struct_pack(bal := c_acctbal, name := c_name))).bal AS top_bal,
  (max(struct_pack(bal := c_acctbal, name := c_name))).name AS top_name
FROM customer
GROUP BY c_nationkey
ORDER BY c_nationkey
""",
)
def q_fn_struct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Struct construction, lexicographic struct comparison, and field
    access (B41 family): argmax-by-struct-max — ``max(struct(bal,
    name))`` orders lexicographically, giving the top customer per
    nation in ONE two-phase aggregation (no window, no self-join; the
    struct max combines map-side like any max, so the shuffle is
    |groups| rows at any scale). Struct fields are projected back to
    scalars so the oracle compares engine-neutral columns.
    """
    c = load_table(spark, sf_dir, "customer")
    m = F.max(F.struct(F.col("c_acctbal").alias("bal"), F.col("c_name").alias("name")))
    return (
        c.groupBy("c_nationkey")
        .agg(m.alias("m"))
        .select(
            "c_nationkey",
            F.col("m.bal").alias("top_bal"),
            F.col("m.name").alias("top_name"),
        )
        .orderBy("c_nationkey")
    )


@query(
    "q_fn_bitwise",
    oracle="""
SELECT o_orderkey,
       o_orderkey & 255 AS key_and,
       o_orderkey | 4096 AS key_or,
       xor(o_orderkey, o_custkey) AS key_xor,
       o_orderkey << 2 AS key_shl,
       o_orderkey >> 3 AS key_shr
FROM orders
WHERE o_orderkey < 1000
""",
)
def q_fn_bitwise(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise function surface (B39 family): AND/OR/XOR/shifts —
    the workhorses of hash mixing, bucket masks, and bitmap flags.
    All JVM-codegen'd row-local expressions; map-only."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 1000)
    k = F.col("o_orderkey")
    return o.select(
        "o_orderkey",
        k.bitwiseAND(F.lit(255)).alias("key_and"),
        k.bitwiseOR(F.lit(4096)).alias("key_or"),
        k.bitwiseXOR(F.col("o_custkey")).alias("key_xor"),
        F.shiftleft(k, 2).alias("key_shl"),
        F.shiftright(k, 3).alias("key_shr"),
    )


@query(
    "q_json_flatten",
    oracle="""
WITH kv AS (
  SELECT event_id, props, unnest(json_keys(props)) AS prop_key
  FROM events
)
SELECT event_id, prop_key,
       json_extract_string(props, '$.' || prop_key) AS prop_value,
       TRY_CAST(json_extract_string(props, '$.' || prop_key) AS BIGINT)
         AS prop_int
FROM kv
ORDER BY event_id, prop_key
""",
)
def q_json_flatten(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured flatten (B42b): explode each event's JSON props
    object into one (event_id, key, value) row per property — the
    1→N ETL step that turns a schemaless payload column into a
    queryable long table (q_fn_json is its scalar 1→1 sibling).

    ``from_json`` to ``map<string,string>`` parses each payload ONCE,
    then ``explode`` emits the pairs — map-only, no shuffle at any
    size, and the string-typed value column is the honest contract for
    schemaless input (typed projection is a `try_cast` after the
    flatten, exactly as here). At 100 TB the flatten runs at ingest
    and lands partitioned by key for per-property analytics.
    """
    e = load_table(spark, sf_dir, "events")
    kv = F.explode(F.from_json("props", "map<string,string>"))
    return (
        e.select("event_id", kv.alias("prop_key", "prop_value"))
        .select(
            "event_id",
            "prop_key",
            "prop_value",
            F.expr("try_cast(prop_value AS bigint)").alias("prop_int"),
        )
        .orderBy("event_id", "prop_key")
    )


@query(
    "q_fn_variant",
    oracle="""
SELECT
  event_id,
  CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_int,
  json_extract_string(props, '$.nope') IS NULL AS missing_null,
  'OBJECT<k: BIGINT>' AS vschema,
  CAST(json_extract_string(props, '$.k') AS INTEGER) % 10 AS k_bucket
FROM events
ORDER BY event_id
""",
)
def q_fn_variant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VARIANT semi-structured access (Spark 4's open-schema type —
    q_fn_json's successor): ``parse_json`` once into a binary VARIANT,
    then typed ``try_variant_get`` path access and
    ``schema_of_variant`` introspection.

    Why this beats string-JSON at 100 TB: VARIANT parses each payload
    ONCE into a binary encoding at ingest (in parquet it persists as a
    shredded binary column), and every subsequent path access is a
    binary walk, not a re-parse — get_json_object re-tokenizes the
    string per call. try_variant_get with a type returns NULL on
    missing paths / type mismatches instead of failing mid-scan (the
    semi-structured equivalent of try_cast ingest armor). The oracle
    replays the typed extraction through DuckDB's JSON functions; the
    per-row schema introspection is asserted against the literal
    object shape every fixture payload shares.
    """
    e = load_table(spark, sf_dir, "events")
    # let-bind the parsed variant through a 1-element struct array so
    # the plan parses each payload once, not once per extraction
    # (the CollapseProject re-reference rule — SCALING.md)
    b = F.element_at(
        F.transform(
            F.array(F.struct(F.parse_json("props").alias("v"))),
            lambda t: F.struct(
                F.try_variant_get(t["v"], "$.k", "int").alias("k_int"),
                F.try_variant_get(t["v"], "$.nope", "int")
                .isNull()
                .alias("missing_null"),
                F.schema_of_variant(t["v"]).alias("vschema"),
            ),
        ),
        1,
    )
    return (
        e.select("event_id", b.alias("b"))
        .select(
            "event_id",
            F.col("b.k_int").alias("k_int"),
            F.col("b.missing_null").alias("missing_null"),
            F.col("b.vschema").alias("vschema"),
            (F.col("b.k_int") % 10).alias("k_bucket"),
        )
        .orderBy("event_id")
    )


@query(
    "q_fn_collation",
    oracle="""
WITH mixed AS (
  SELECT p_partkey,
         CASE WHEN p_partkey % 2 = 0 THEN lower(p_brand) ELSE upper(p_brand) END
           AS brand_mixed
  FROM part
)
SELECT lower(brand_mixed) AS brand, count(*) AS n_parts,
       count(DISTINCT brand_mixed) AS n_case_variants
FROM mixed
GROUP BY lower(brand_mixed)
ORDER BY brand
""",
)
def q_fn_collation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String collations (Spark 4): case-insensitive grouping via
    ``COLLATE UTF8_LCASE`` — the engine-native alternative to wrapping
    every comparison in lower().

    The fixture's strings are uniform-case, so a deterministic mixed-
    case column is derived first (even keys lower, odd keys upper);
    grouping on the UTF8_LCASE-collated column then merges the case
    variants, which the oracle replays as GROUP BY lower(). At 100 TB
    the collation is declared once on the column (table DDL), and every
    comparison/join/group on it is collation-aware inside codegen —
    no per-row lower() allocation, and equality stays sargable.
    `n_case_variants` (counted BINARY-collated) proves the groups
    really merged two case forms, not one.
    """
    p = load_table(spark, sf_dir, "part")
    mixed = p.select(
        F.when(F.col("p_partkey") % 2 == 0, F.lower("p_brand"))
        .otherwise(F.upper("p_brand"))
        .alias("brand_mixed")
    )
    ci = F.collate(F.col("brand_mixed"), "UTF8_LCASE")
    return (
        mixed.groupBy(ci.alias("brand_ci"))
        .agg(
            F.count(F.lit(1)).alias("n_parts"),
            F.countDistinct(
                F.collate(F.col("brand_mixed"), "UTF8_BINARY")
            ).alias("n_case_variants"),
        )
        .select(
            F.lower(F.col("brand_ci")).alias("brand"),
            "n_parts",
            "n_case_variants",
        )
        .orderBy("brand")
    )


@query(
    "q_fn_xml",
    # The XML payload is deterministically BUILT from fixture columns,
    # so the oracle verifies the parse by reconstructing the extracted
    # values straight from those columns — round-trip equality, without
    # needing an XML parser in DuckDB.
    oracle="""
SELECT event_id,
       event_id AS xml_id,
       CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_val,
       event_type AS type_attr
FROM events
ORDER BY event_id
""",
)
def q_fn_xml(spark: SparkSession, sf_dir: str) -> DataFrame:
    """XML parsing (Spark 4's ``from_xml``): typed struct extraction
    from XML payloads — web crawls and feed dumps arrive as XML/HTML
    as often as JSON.

    The payload is derived deterministically from fixture columns
    (id/type attributes, a nested ``<k>`` element), parsed back with an
    explicit schema — never inference, which at 100 TB is an extra full
    pass (the q_scan_csv rule) — and the extractions must round-trip to
    the source values, which is exactly what the oracle asserts.
    ``from_xml`` is JVM-side (plan-audited: no Python eval), so the
    parse rides whole-stage codegen like from_json.
    """
    e = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    xml = F.concat(
        F.lit('<event id="'), F.col("event_id"),
        F.lit('" type="'), F.col("event_type"),
        F.lit('"><k>'), k, F.lit("</k></event>"),
    )
    schema = T.StructType(
        [
            T.StructField("_id", T.LongType()),
            T.StructField("_type", T.StringType()),
            T.StructField("k", T.LongType()),
        ]
    )
    parsed = F.from_xml(xml, schema)
    return (
        e.select("event_id", parsed.alias("x"))
        .select(
            "event_id",
            F.col("x._id").alias("xml_id"),
            F.col("x.k").alias("k_val"),
            F.col("x._type").alias("type_attr"),
        )
        .orderBy("event_id")
    )


@query(
    "q_fn_url",
    # Same reconstruct-from-source oracle pattern as q_fn_xml: the URL
    # is built from fixture columns, so each parse_url extraction must
    # equal the column expression it was built from.
    oracle="""
SELECT event_id,
       'src-' || lower(event_type) || '.example.com' AS host,
       '/u/' || CAST(user_id AS VARCHAR) AS path,
       CAST(event_id AS VARCHAR) AS eid_param,
       'https' AS scheme
FROM events
ORDER BY event_id
""",
)
def q_fn_url(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL parsing (``parse_url``): host / path / query-parameter
    extraction — referrer and source-URL analysis is a standard crawl
    curation signal (per-domain dedup keys, domain quality tiers).

    URLs are derived deterministically from fixture columns and parsed
    back; every extraction must round-trip (oracle-asserted). JVM-side
    expression, codegen-friendly; the per-domain aggregate a real
    curation pass runs next is a plain groupBy(host).
    """
    e = load_table(spark, sf_dir, "events")
    url = F.concat(
        F.lit("https://src-"), F.lower("event_type"),
        F.lit(".example.com/u/"), F.col("user_id"),
        F.lit("?eid="), F.col("event_id"), F.lit("&v=1"),
    )
    return (
        e.select("event_id", url.alias("url"))
        .select(
            "event_id",
            F.parse_url("url", F.lit("HOST")).alias("host"),
            F.parse_url("url", F.lit("PATH")).alias("path"),
            F.parse_url("url", F.lit("QUERY"), F.lit("eid")).alias("eid_param"),
            F.parse_url("url", F.lit("PROTOCOL")).alias("scheme"),
        )
        .orderBy("event_id")
    )


@query(
    "q_fn_try",
    # DuckDB lacks try_* names but the SEMANTICS are replayable: NULL
    # on division-by-zero via nullif, NULL on unparseable casts via
    # TRY_CAST, NULL on out-of-range months / bigint overflow via
    # explicit range CASEs — each expression is the exact NULL contract
    # the Spark side's try_ function implements.
    oracle="""
SELECT o_orderkey,
  o_totalprice / nullif(o_orderkey % 7, 0) AS price_per,
  TRY_CAST(o_orderpriority AS INTEGER) AS prio_whole,
  TRY_CAST(substr(o_orderpriority, 1, 1) AS INTEGER) AS prio_digit,
  CASE WHEN o_orderkey % 15 BETWEEN 1 AND 12
       THEN '2024-' || lpad(CAST(o_orderkey % 15 AS VARCHAR), 2, '0') || '-01'
  END AS month_start,
  CASE WHEN o_orderkey <= 1000 THEN 9223372036854774807 + o_orderkey
  END AS near_overflow
FROM orders
ORDER BY o_orderkey
""",
)
def q_fn_try(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANSI-mode ingest armor: the ``try_*`` function family (B43
    sibling). Spark 4 runs ANSI SQL by default — division by zero,
    overflow, and bad casts THROW mid-scan instead of silently
    corrupting; ``try_divide``/``try_cast``/``try_to_date``/``try_add``
    are the per-expression opt-outs that turn a poison row into a NULL
    the pipeline can quarantine (the relational q_scan_evolution /
    q_fn_variant philosophy: absorb malformed input as NULLs, never
    abort a 100 TB job at row 10^12, never disable ANSI globally).

    Each output exercises a distinct failure class on real fixture
    values — zero denominators (every 7th key), unparseable casts (the
    whole priority string fails, its leading digit parses), calendar
    range (months 0/13/14 → NULL), and bigint overflow (keys past the
    headroom NULL out). All row-local codegen; the oracle replays the
    NULL contracts with nullif/TRY_CAST/range CASEs.
    """
    o = load_table(spark, sf_dir, "orders")
    month = F.col("o_orderkey") % 15
    return (
        o.select(
            "o_orderkey",
            F.try_divide(
                F.col("o_totalprice"),
                (F.col("o_orderkey") % 7).cast("double"),
            ).alias("price_per"),
            F.expr("try_cast(o_orderpriority AS INT)").alias("prio_whole"),
            F.expr(
                "try_cast(substr(o_orderpriority, 1, 1) AS INT)"
            ).alias("prio_digit"),
            F.date_format(
                F.try_to_date(
                    F.concat(F.lit("2024-"), month, F.lit("-01")),
                    "yyyy-M-dd",
                ),
                "yyyy-MM-dd",
            ).alias("month_start"),
            F.try_add(
                F.lit(9223372036854774807), F.col("o_orderkey")
            ).alias("near_overflow"),
        )
        .orderBy("o_orderkey")
    )


@query(
    "q_fn_mask",
    oracle="""
SELECT c_custkey,
  regexp_replace(regexp_replace(regexp_replace(c_name,
    '[A-Z]', 'X', 'g'), '[a-z]', 'x', 'g'), '[0-9]', 'n', 'g') AS name_masked,
  repeat('*', greatest(length(CAST(c_custkey AS VARCHAR)) - 4, 0))
    || CASE WHEN length(CAST(c_custkey AS VARCHAR)) >= 4
            THEN substr(CAST(c_custkey AS VARCHAR),
                        length(CAST(c_custkey AS VARCHAR)) - 3, 4)
            ELSE CAST(c_custkey AS VARCHAR) END AS acct_last4,
  c_mktsegment
FROM customer
ORDER BY c_custkey
""",
)
def q_fn_mask(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data masking (B37 governance sibling): Spark's ``mask()``
    character-class redaction (upper→X, lower→x, digit→n, punctuation
    kept — shape-preserving, so formats stay validatable) plus the
    keep-last-4 partial-mask idiom — the column-level de-identification
    every governed share/export applies, complementing q_text_scrub's
    pattern-level PII redaction inside free text.

    Both are pure codegen string expressions (map-only at any scale);
    the oracle replays mask() as the equivalent character-class
    regex chain and last-4 as repeat+substr.
    """
    c = load_table(spark, sf_dir, "customer")
    key_s = F.col("c_custkey").cast("string")
    last4 = F.concat(
        F.expr("repeat('*', greatest(length(cast(c_custkey as string)) - 4, 0))"),
        F.when(
            F.length(key_s) >= 4, F.substring(key_s, -4, 4)
        ).otherwise(key_s),
    )
    return (
        c.select(
            "c_custkey",
            F.mask("c_name").alias("name_masked"),
            last4.alias("acct_last4"),
            "c_mktsegment",
        )
        .orderBy("c_custkey")
    )


@query(
    "q_fn_timezone",
    # Fixed-offset zones only: a fixed offset is pure interval
    # arithmetic, identical in any engine. NAMED zones (America/...)
    # are deliberately out of the oracle contract — they depend on the
    # engines' bundled tzdata editions agreeing on historical DST
    # rules, which is an operational fact, not an engine semantic.
    oracle="""
SELECT event_id, ts,
       ts + INTERVAL 330 MINUTE AS ist_ts,
       ts - INTERVAL 480 MINUTE AS pst_ts,
       CAST(hour(ts + INTERVAL 330 MINUTE) AS INTEGER) AS ist_hour,
       strftime(ts + INTERVAL 330 MINUTE, '%Y-%m-%d') AS ist_date,
       CAST(hour(ts + INTERVAL 330 MINUTE) BETWEEN 9 AND 17 AS BOOLEAN)
         AS ist_business_hours
FROM events
""",
)
def q_fn_timezone(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Timezone conversion (`from_utc_timestamp`): UTC event time
    shifted to fixed-offset local zones (+05:30, -08:00), with
    local-hour / local-date extraction and a business-hours flag — the
    "when did the user actually see it" layer every regional dashboard
    and SLA report needs on top of UTC storage.

    Map-only codegen; the conversion is one interval shift per row.
    Date/hour extraction happens AFTER the shift (extract-then-shift is
    the classic local-midnight bug). The oracle performs the identical
    shifts as plain interval arithmetic — for FIXED offsets the two are
    definitionally equal; named DST zones are excluded from the
    cross-engine contract (tzdata-edition-dependent) and belong in
    runtime tests against the platform's own tzdata, not in an oracle.
    """
    e = load_table(spark, sf_dir, "events")
    ist = F.from_utc_timestamp("ts", "+05:30")
    pst = F.from_utc_timestamp("ts", "-08:00")
    return e.select(
        "event_id",
        "ts",
        ist.alias("ist_ts"),
        pst.alias("pst_ts"),
        F.hour(ist).cast("int").alias("ist_hour"),
        F.date_format(ist, "yyyy-MM-dd").alias("ist_date"),
        F.hour(ist).between(9, 17).alias("ist_business_hours"),
    )


@query(
    "q_fn_calendar",
    # Verified convention-identical across engines: month addition
    # CLAMPS at month end (Jan 31 + 1mo = Feb 29) in both; last_day
    # and quarter truncation agree; month distance uses pure integer
    # (year*12+month) arithmetic because months_between conventions
    # (fractional vs count) differ between engines.
    oracle="""
SELECT DISTINCT CAST(CAST(o_orderdate AS DATE) AS VARCHAR) AS d,
  CAST(CAST(CAST(o_orderdate AS DATE) + INTERVAL 1 MONTH AS DATE) AS VARCHAR)
    AS next_month,
  CAST(CAST(CAST(o_orderdate AS DATE) + INTERVAL 3 MONTH AS DATE) AS VARCHAR)
    AS next_quarter_same_day,
  CAST(last_day(CAST(o_orderdate AS DATE)) AS VARCHAR) AS month_end,
  CAST(CAST(date_trunc('quarter', CAST(o_orderdate AS DATE)) AS DATE)
       AS VARCHAR) AS quarter_start,
  CAST(quarter(CAST(o_orderdate AS DATE)) AS INTEGER) AS q,
  CAST(year(CAST(o_orderdate AS DATE)) * 12
       + month(CAST(o_orderdate AS DATE)) - 1 AS BIGINT) AS month_idx,
  CAST(o_orderdate AS DATE) = last_day(CAST(o_orderdate AS DATE))
    AS is_month_end
FROM orders ORDER BY d
""",
)
def q_fn_calendar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar-edge function surface (B38 family): month addition on
    month-end dates (Jan 31 + 1 month = Feb 29 — CLAMPED, the fiscal
    convention both engines share, probed and pinned by the planted
    test), last_day, quarter truncation/number, a pure-integer month
    index (year·12+month — months_between is deliberately ABSENT:
    Spark's fractional convention and DuckDB's month-count convention
    disagree, so cross-engine month distances must be integer
    arithmetic), and the is-month-end flag every fiscal rollup gates
    on.

    Row-local codegen over the DISTINCT dates frame — calendar
    functions are dimension work; at scale this materializes once as
    the date dimension every mart joins, not per-fact-row.
    """
    d = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderdate").cast("date").alias("d")
    ).distinct()
    return d.select(
        F.col("d").cast("string").alias("d"),
        F.add_months("d", 1).cast("string").alias("next_month"),
        F.add_months("d", 3).cast("string").alias("next_quarter_same_day"),
        F.last_day("d").cast("string").alias("month_end"),
        F.date_trunc("quarter", "d")
        .cast("date")
        .cast("string")
        .alias("quarter_start"),
        F.quarter("d").cast("int").alias("q"),
        (F.year("d") * 12 + F.month("d") - 1).cast("long").alias("month_idx"),
        (F.col("d") == F.last_day("d")).alias("is_month_end"),
    ).orderBy("d")


@query(
    "q_fn_crypto",
    # sha2-256 and md5 are standards — both engines emit identical hex;
    # the AES round-trip is asserted as a BOOLEAN property (GCM uses a
    # random IV, so ciphertext is not comparable — the recoverability
    # contract is).
    oracle="""
SELECT p_partkey,
       md5(p_name) AS name_md5,
       sha256(p_name) AS name_sha256,
       length(md5(p_name)) = 32 AS md5_hex_len_ok,
       true AS aes_roundtrip_ok
FROM part
WHERE p_partkey <= 20
ORDER BY p_partkey
""",
)
def q_fn_crypto(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cryptographic function surface (B37 extension): md5 / sha2-256
    content digests — the standards both engines (and every data
    platform) share byte-for-byte, which is WHY the engine's whole
    dedup/split/resampling doctrine is built on them — plus an
    aes_encrypt/aes_decrypt round-trip asserted as a boolean property:
    GCM ciphertext carries a random IV (deliberately non-deterministic,
    the secure default), so the testable contract is recoverability,
    not ciphertext equality. Column-level envelope encryption before a
    sink, verified in-plan.

    Scale shape: map-only codegen projections; the digest cost is the
    row's bytes, no shuffle anywhere.
    """
    p = load_table(spark, sf_dir, "part")
    key = F.lit("0123456789abcdef")  # 16-byte demo key (AES-128)
    return (
        p.filter(F.col("p_partkey") <= 20)
        .select(
            "p_partkey",
            F.md5(F.col("p_name").cast("binary")).alias("name_md5"),
            F.sha2(F.col("p_name").cast("binary"), 256).alias(
                "name_sha256"
            ),
            (
                F.length(F.md5(F.col("p_name").cast("binary"))) == 32
            ).alias("md5_hex_len_ok"),
            (
                F.aes_decrypt(
                    F.aes_encrypt(F.col("p_name").cast("binary"), key),
                    key,
                ).cast("string")
                == F.col("p_name")
            ).alias("aes_roundtrip_ok"),
        )
        .orderBy("p_partkey")
    )


@query(
    "q_json_schema_infer",
    # Key extraction and typed-pattern checks are engine-shared (map
    # parse / json_keys + extract, same regexes); all outputs are
    # exact integers or one division; min/max ride the integer cast.
    oracle="""
WITH kv AS (
  SELECT e.event_id, t.k AS key,
         json_extract_string(e.props, '$.' || t.k) AS val
  FROM events e CROSS JOIN LATERAL
    unnest(json_keys(e.props)) AS t(k)
  WHERE e.props IS NOT NULL
),
tot AS (SELECT CAST(count(*) AS BIGINT) AS n_rows FROM events
        WHERE props IS NOT NULL),
p AS (
  SELECT key,
         CAST(count(*) AS BIGINT) AS n_present,
         CAST(count(DISTINCT val) AS BIGINT) AS n_distinct,
         bool_and(regexp_matches(val, '^-?[0-9]+$')) AS all_int,
         bool_and(regexp_matches(val, '^-?[0-9]+(\\.[0-9]+)?$'))
           AS all_num,
         min(CASE WHEN regexp_matches(val, '^-?[0-9]+$')
                  THEN CAST(val AS BIGINT) END) AS min_int,
         max(CASE WHEN regexp_matches(val, '^-?[0-9]+$')
                  THEN CAST(val AS BIGINT) END) AS max_int
  FROM kv GROUP BY key
)
SELECT key, n_present,
       round(n_present * 1.0 / tot.n_rows, 6) AS present_share,
       n_distinct,
       CASE WHEN all_int THEN 'integer'
            WHEN all_num THEN 'number'
            ELSE 'string' END AS inferred_type,
       min_int, max_int
FROM p CROSS JOIN tot ORDER BY key
""",
)
def q_json_schema_infer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema inference over the semi-structured event payload: per
    JSON key, presence share, distinct-value count, an inferred type
    (integer / number / string) and the integer value range — the
    ingestion-time discovery pass that turns an unbounded payload
    namespace into a typed column plan ("key k is a dense integer
    0-99: promote it to a real column; key session_tag is 90% absent:
    leave it in the variant"). q_fn_json/q_fn_variant access KNOWN
    paths; this is how you learn which paths exist and deserve
    promotion.

    Scale shape: one generic map parse + explode to (key, value) —
    JVM-side from_json, no Python — feeding a key-grained
    map-combinable aggregate; output is |keys| rows. The typed-pattern
    checks are per-row regexes folded by bool_and, so the type verdict
    merges across partitions without a second pass.
    """
    e = load_table(spark, sf_dir, "events").filter(
        F.col("props").isNotNull()
    )
    kv = e.select(
        F.explode(
            F.from_json("props", "map<string,string>")
        ).alias("key", "val")
    )
    tot = F.broadcast(
        e.agg(F.count(F.lit(1)).cast("long").alias("n_rows"))
    )
    is_int = F.col("val").rlike("^-?[0-9]+$")
    is_num = F.col("val").rlike("^-?[0-9]+(\\.[0-9]+)?$")
    p = kv.groupBy("key").agg(
        F.count(F.lit(1)).cast("long").alias("n_present"),
        F.count_distinct("val").cast("long").alias("n_distinct"),
        F.bool_and(is_int).alias("all_int"),
        F.bool_and(is_num).alias("all_num"),
        F.min(F.when(is_int, F.col("val").cast("long"))).alias("min_int"),
        F.max(F.when(is_int, F.col("val").cast("long"))).alias("max_int"),
    )
    return (
        p.crossJoin(tot)
        .select(
            "key",
            "n_present",
            F.round(F.col("n_present") * 1.0 / F.col("n_rows"), 6).alias(
                "present_share"
            ),
            "n_distinct",
            F.when(F.col("all_int"), "integer")
            .when(F.col("all_num"), "number")
            .otherwise("string")
            .alias("inferred_type"),
            "min_int",
            "max_int",
        )
        .orderBy("key")
    )
