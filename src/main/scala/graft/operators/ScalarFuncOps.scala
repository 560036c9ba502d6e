package graft.operators

import graft.{OpGroup, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scalar function surface (SURVEY.md §2.F): string / base64 / json /
  * time / date-parse / array / map / math / url, each mirroring a concrete
  * reference behavior (cites into /root/reference):
  *   - F1 f-string URL building (app.py:140,147,154,174)
  *   - F2 base64 client-credentials header (app.py:68)
  *   - F3 response.json() key-path access (app.py:75-77,143)
  *   - F4 json.dumps staging render (app.py:89)
  *   - F5 token-expiry epoch arithmetic (app.py:65,77,135,213)
  *   - F6 variable-precision release_date parse (albums_schema.json:22-31)
  *   - F7 id-list array manipulation (app.py:164,170,193)
  *   - F8 dict-shaped request params (app.py:137,141)
  *   - F9 exponential backoff 2^attempt (app.py:111,124)
  *   - F10 URL-encoded artist-name routes (README.md:167, app.py:229)
  *
  * All codegen'd built-ins — no UDFs — so every expression stays inside
  * WholeStageCodegen and predicate pushdown is never blocked.
  */
object ScalarFuncOps extends OpGroup {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // F1 — concat / concat_ws / lpad string building.
    "str_concat_format" -> ((s, d) =>
      Tables.customer(s, d)
        .select(col("c_custkey"),
          concat(lit("https://api.example.com/artists/"),
            col("c_custkey").cast("string")).as("url"),
          concat_ws(":", col("c_mktsegment"), col("c_name")).as("joined"),
          concat(lit("Customer#"),
            lpad(col("c_custkey").cast("string"), 9, "0")).as("padded"))
        .orderBy("c_custkey")),

    // F2 — base64 encode/decode round trip (auth header).
    "base64_auth" -> ((s, d) =>
      Tables.customer(s, d)
        .select(col("c_custkey"),
          base64(encode(concat_ws(":", col("c_name"), lit("secret")), "UTF-8"))
            .as("auth_header"),
          decode(unbase64(base64(encode(col("c_name"), "UTF-8"))), "UTF-8")
            .as("roundtrip"))
        .orderBy("c_custkey")),

    // F3 — JSON key-path extraction, both string-path and declared-schema
    // forms, over events.props.
    "json_extract" -> ((s, d) =>
      Tables.events(s, d)
        .select(col("event_id"),
          get_json_object(col("props"), "$.k").cast("long").as("k_path"),
          from_json(col("props"),
            org.apache.spark.sql.types.StructType.fromDDL("k LONG"))
            .getField("k").as("k_schema"))
        .orderBy("event_id")),

    // F4 — to_json staging render (app.py:89). Compact JSON matches
    // DuckDB's to_json for simple structs; key order is ours to declare.
    "to_json_render" -> ((s, d) =>
      Tables.events(s, d)
        .select(col("event_id"),
          to_json(struct(col("event_id").as("id"), col("event_type").as("t")))
            .as("doc"))
        .orderBy("event_id")),

    // F5 — epoch arithmetic: token expiry = now + expires_in - 60.
    "epoch_time_math" -> ((s, d) =>
      Tables.orders(s, d)
        .select(col("o_orderkey"),
          unix_timestamp(col("o_orderdate")).as("epoch_s"),
          (unix_timestamp(col("o_orderdate")) + 3600L - 60L).as("expires_at"),
          round(col("o_totalprice"), 2).as("price_2dp"))
        .orderBy("o_orderkey")),

    // F6 — variable-precision date strings ("1995" / "1995-03" /
    // "1995-03-12") parsed through a try_to_timestamp coalesce chain —
    // exactly the release_date + release_date_precision pattern.
    "parse_release_date" -> ((s, d) =>
      Tables.orders(s, d)
        .withColumn("rd",
          when(col("o_orderkey") % 3 === 0, date_format(col("o_orderdate"), "yyyy"))
            .when(col("o_orderkey") % 3 === 1, date_format(col("o_orderdate"), "yyyy-MM"))
            .otherwise(date_format(col("o_orderdate"), "yyyy-MM-dd")))
        .select(col("o_orderkey"), col("rd"),
          when(col("o_orderkey") % 3 === 0, "year")
            .when(col("o_orderkey") % 3 === 1, "month")
            .otherwise("day").as("rd_precision"),
          expr("""CAST(coalesce(try_to_timestamp(rd, 'yyyy-MM-dd'),
                 |               try_to_timestamp(rd, 'yyyy-MM'),
                 |               try_to_timestamp(rd, 'yyyy')) AS DATE)""".stripMargin)
            .as("parsed"),
          year(col("o_orderdate")).as("y"))
        .orderBy("o_orderkey")),

    // F7 — array ops over word lists (id-list manipulation analog).
    "array_ops" -> ((s, d) =>
      Tables.part(s, d)
        .withColumn("words", split(col("p_name"), " "))
        .select(col("p_partkey"),
          size(col("words")).as("n_words"),
          size(array_distinct(col("words"))).as("n_distinct"),
          array_contains(col("words"), "green").as("has_green"),
          concat_ws(",", slice(col("words"), 1, 2)).as("first2"),
          concat_ws(",", sort_array(array_distinct(col("words")))).as("sorted_distinct"))
        .orderBy("p_partkey")),

    // F8 — map-shaped request params; oracle is the identity projection
    // (DuckDB map access semantics differ across versions, values don't).
    "map_kv_config" -> ((s, d) =>
      Tables.customer(s, d)
        .withColumn("params",
          map(lit("q"), col("c_name"), lit("type"), lit("artist")))
        .select(col("c_custkey"),
          element_at(col("params"), "q").as("q"),
          element_at(col("params"), "type").as("type"),
          size(map_keys(col("params"))).as("n_params"))
        .orderBy("c_custkey")),

    // F9 — exponential backoff 2^attempt with a clamp.
    "math_pow_backoff" -> ((s, d) =>
      s.range(0, 4).toDF("attempt")
        .select(col("attempt"),
          pow(lit(2.0), col("attempt")).as("backoff_s"),
          least(pow(lit(2.0), col("attempt")), lit(5.0)).as("clamped_s"),
          greatest(pow(lit(2.0), col("attempt")), lit(1.0)).as("floored_s"))
        .orderBy("attempt")),

    // F10 — URL encode/decode round trip (Led%20Zeppelin routes).
    "url_encode_path" -> ((s, d) =>
      Tables.customer(s, d)
        .select(col("c_custkey"),
          url_encode(col("c_name")).as("encoded"),
          url_decode(url_encode(col("c_name"))).as("decoded"))
        .orderBy("c_custkey")),

    // F11 — NULL-algebra surface (the reference's defensive `.get(...)`
    // chains, app.py:143,156-157, as declarative null handling):
    // nullif/coalesce masking, null-aware routing, clamp floors.
    "null_semantics_funcs" -> ((s, d) =>
      Tables.customer(s, d)
        .select(col("c_custkey"),
          expr("nullif(c_mktsegment, 'BUILDING')").as("seg_or_null"),
          coalesce(expr("nullif(c_mktsegment, 'BUILDING')"), lit("(masked)"))
            .as("seg_masked"),
          when(expr("nullif(c_mktsegment, 'BUILDING')").isNotNull, "other")
            .otherwise("building").as("route"),
          greatest(col("c_acctbal"), lit(0.0)).as("bal_floor"),
          least(col("c_acctbal"), lit(0.0)).as("bal_neg"))
        .orderBy("c_custkey")),
  )

  val oracleSql: Map[String, String] = Map(
    "str_concat_format" ->
      """SELECT c_custkey,
        |       'https://api.example.com/artists/' || CAST(c_custkey AS VARCHAR) AS url,
        |       concat_ws(':', c_mktsegment, c_name) AS joined,
        |       'Customer#' || lpad(CAST(c_custkey AS VARCHAR), 9, '0') AS padded
        |FROM customer ORDER BY c_custkey""".stripMargin,
    "base64_auth" ->
      """SELECT c_custkey,
        |       to_base64(encode(c_name || ':' || 'secret')) AS auth_header,
        |       c_name AS roundtrip
        |FROM customer ORDER BY c_custkey""".stripMargin,
    "json_extract" ->
      """SELECT event_id,
        |       CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_path,
        |       CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_schema
        |FROM events ORDER BY event_id""".stripMargin,
    "to_json_render" ->
      """SELECT event_id,
        |       '{"id":' || CAST(event_id AS VARCHAR) || ',"t":"' || event_type || '"}' AS doc
        |FROM events ORDER BY event_id""".stripMargin,
    "epoch_time_math" ->
      """SELECT o_orderkey,
        |       CAST(epoch(o_orderdate) AS BIGINT) AS epoch_s,
        |       CAST(epoch(o_orderdate) AS BIGINT) + 3600 - 60 AS expires_at,
        |       round(o_totalprice, 2) AS price_2dp
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "parse_release_date" ->
      """SELECT o_orderkey,
        |       CASE WHEN o_orderkey % 3 = 0 THEN strftime(o_orderdate, '%Y')
        |            WHEN o_orderkey % 3 = 1 THEN strftime(o_orderdate, '%Y-%m')
        |            ELSE strftime(o_orderdate, '%Y-%m-%d') END AS rd,
        |       CASE WHEN o_orderkey % 3 = 0 THEN 'year'
        |            WHEN o_orderkey % 3 = 1 THEN 'month'
        |            ELSE 'day' END AS rd_precision,
        |       CAST(coalesce(
        |         try_strptime(CASE WHEN o_orderkey % 3 = 0 THEN strftime(o_orderdate, '%Y')
        |                           WHEN o_orderkey % 3 = 1 THEN strftime(o_orderdate, '%Y-%m')
        |                           ELSE strftime(o_orderdate, '%Y-%m-%d') END, '%Y-%m-%d'),
        |         try_strptime(CASE WHEN o_orderkey % 3 = 0 THEN strftime(o_orderdate, '%Y')
        |                           WHEN o_orderkey % 3 = 1 THEN strftime(o_orderdate, '%Y-%m')
        |                           ELSE strftime(o_orderdate, '%Y-%m-%d') END, '%Y-%m'),
        |         try_strptime(CASE WHEN o_orderkey % 3 = 0 THEN strftime(o_orderdate, '%Y')
        |                           WHEN o_orderkey % 3 = 1 THEN strftime(o_orderdate, '%Y-%m')
        |                           ELSE strftime(o_orderdate, '%Y-%m-%d') END, '%Y')) AS DATE) AS parsed,
        |       CAST(year(o_orderdate) AS BIGINT) AS y
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "array_ops" ->
      """SELECT p_partkey,
        |       CAST(len(string_split(p_name, ' ')) AS INTEGER) AS n_words,
        |       CAST(len(list_distinct(string_split(p_name, ' '))) AS INTEGER) AS n_distinct,
        |       list_contains(string_split(p_name, ' '), 'green') AS has_green,
        |       array_to_string(string_split(p_name, ' ')[1:2], ',') AS first2,
        |       array_to_string(list_sort(list_distinct(string_split(p_name, ' '))), ',') AS sorted_distinct
        |FROM part ORDER BY p_partkey""".stripMargin,
    "map_kv_config" ->
      """SELECT c_custkey, c_name AS q, 'artist' AS type, 2 AS n_params
        |FROM customer ORDER BY c_custkey""".stripMargin,
    "math_pow_backoff" ->
      """SELECT range AS attempt, pow(2.0, range) AS backoff_s,
        |       least(pow(2.0, range), 5.0) AS clamped_s,
        |       greatest(pow(2.0, range), 1.0) AS floored_s
        |FROM range(0, 4) ORDER BY attempt""".stripMargin,
    "url_encode_path" ->
      """SELECT c_custkey,
        |       replace(c_name, '#', '%23') AS encoded,
        |       c_name AS decoded
        |FROM customer ORDER BY c_custkey""".stripMargin,
    "null_semantics_funcs" ->
      """SELECT c_custkey,
        |       nullif(c_mktsegment, 'BUILDING') AS seg_or_null,
        |       coalesce(nullif(c_mktsegment, 'BUILDING'), '(masked)') AS seg_masked,
        |       CASE WHEN nullif(c_mktsegment, 'BUILDING') IS NOT NULL
        |            THEN 'other' ELSE 'building' END AS route,
        |       greatest(c_acctbal, CAST(0 AS DOUBLE)) AS bal_floor,
        |       least(c_acctbal, CAST(0 AS DOUBLE)) AS bal_neg
        |FROM customer ORDER BY c_custkey""".stripMargin,
  )
}
