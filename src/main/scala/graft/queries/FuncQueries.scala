package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.io.Tables

/** Scalar-function batteries (SURVEY.md §2-B "Scalar functions"): string,
  * date/time, math, conditional, JSON, hash/encode, array. All per-row
  * codegen'd expressions — map-side only, no shuffle except the final
  * presentation sort.
  */
object FuncQueries {
  type Q = (SparkSession, String) => DataFrame

  def qFuncString(spark: SparkSession, dir: String): DataFrame = {
    val p = Tables.part(spark, dir)
    p.select(
        col("p_partkey"),
        lower(col("p_name")).as("name_lower"),
        upper(col("p_brand")).as("brand_upper"),
        substring(col("p_name"), 1, 8).as("name_prefix"),
        length(col("p_name")).cast("long").as("name_len"),
        concat_ws("-", col("p_brand"), col("p_type")).as("brand_type"),
        regexp_replace(col("p_type"), " ", "_").as("type_snake"),
        lpad(col("p_size").cast("string"), 4, "0").as("size_padded"),
        element_at(split(col("p_type"), " "), 1).as("type_first_word"),
        regexp_extract(col("p_type"), "(\\S+)$", 1).as("type_last_word"),
        col("p_name").like("%a%").as("has_a"),
        col("p_name").startsWith("b").as("starts_b"))
      .orderBy(col("p_partkey"))
  }

  /** URL parsing + canonicalization battery — the normalization pass a
    * web-scrape dedup pipeline runs before URL-level exact dedup
    * (lowercase host, strip tracking params, keep host+path as the
    * canonical key): deterministic URLs synthesized from order fields,
    * then `parse_url` extraction (HOST / PATH / per-key QUERY — Spark's
    * codegen'd built-in) and the canonical key. The DuckDB twin parses
    * with anchored regexes — the values, not the parser, are the
    * contract. Sampled to every 101st order; map-side only.
    */
  def qFuncUrl(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir).filter(col("o_orderkey") % 101 === 0)
    val url = concat(lit("https://Shop.Example.COM/orders/"),
      col("o_orderkey").cast("string"), lit("?utm_source="),
      regexp_replace(col("o_orderpriority"), " ", ""),
      lit("&page="), (col("o_orderkey") % 7).cast("string"))
    o.select(col("o_orderkey"), url.as("url"))
      .select(
        col("o_orderkey"), col("url"),
        lower(parse_url(col("url"), lit("HOST"))).as("host"),
        parse_url(col("url"), lit("PATH")).as("path"),
        parse_url(col("url"), lit("QUERY"), lit("utm_source"))
          .as("utm_source"),
        parse_url(col("url"), lit("QUERY"), lit("page")).cast("long")
          .as("page"),
        concat(lower(parse_url(col("url"), lit("HOST"))),
          parse_url(col("url"), lit("PATH"))).as("canonical"))
      .orderBy(col("o_orderkey"))
  }

  def qFuncDate(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    o.select(
        col("o_orderkey"),
        year(col("o_orderdate")).as("yr"),
        month(col("o_orderdate")).as("mo"),
        dayofmonth(col("o_orderdate")).as("dom"),
        quarter(col("o_orderdate")).as("qtr"),
        date_trunc("month", col("o_orderdate")).as("month_start"),
        date_add(col("o_orderdate").cast("date"), 30).as("due_date"),
        last_day(col("o_orderdate")).as("month_end"),
        datediff(col("o_orderdate").cast("date"),
          lit("1995-01-01").cast("date")).as("days_since_95"),
        unix_timestamp(col("o_orderdate")).as("epoch_s"))
      .orderBy(col("o_orderkey"))
  }

  def qFuncMath(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    li.select(
        col("l_orderkey"), col("l_linenumber"),
        abs(col("l_discount") - 0.05).as("disc_dev"),
        ceil(col("l_extendedprice")).as("price_ceil"),
        floor(col("l_extendedprice")).as("price_floor"),
        round(col("l_extendedprice"), -2).as("price_hundreds"),
        sqrt(col("l_quantity")).as("qty_sqrt"),
        signum(col("l_quantity") - 25).as("qty_sign"),
        (col("l_linenumber") % 3).as("ln_mod3"),
        greatest(col("l_tax"), col("l_discount")).as("max_rate"),
        least(col("l_tax"), col("l_discount")).as("min_rate"),
        round(log(col("l_extendedprice")), 6).as("price_ln"))
      // (l_orderkey, l_linenumber) is NOT unique in this fixture
      // (sf0.01: 60000 rows / 45832 distinct pairs), so the ordering
      // must be made TOTAL: without the value tiebreakers the
      // within-tie row order is whatever the scan happened to feed the
      // sort — it matched DuckDB only while both engines read the file
      // in one task. The extra keys pin ties so any remaining tie is a
      // row identical in every output column (same row SET, now
      // deterministically ordered; the twin orders identically).
      .orderBy(col("l_orderkey"), col("l_linenumber"), col("disc_dev"),
        col("price_ceil"), col("price_floor"), col("price_hundreds"),
        col("price_ln"), col("qty_sqrt"), col("max_rate"), col("min_rate"))
  }

  def qFuncCase(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    o.select(
        when(col("o_totalprice") < 100000, "small")
          .when(col("o_totalprice") < 300000, "medium")
          .otherwise("large").as("bucket"),
        coalesce(nullif(col("o_orderstatus"), lit("O")), lit("OPEN"))
          .as("status_display"))
      .groupBy(col("bucket"), col("status_display"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("bucket"), col("status_display"))
  }

  /** JSON extraction over events.props via from_json (schema'd parse).
    * Parses each row ONCE (the from_json/get_json_object agreement check
    * lives in FuncEdgeSpec, not the hot path), and repartitions after the
    * scan: events.parquet is a single row group, so without the explicit
    * exchange the whole parse would run in one task regardless of cores.
    */
  def qFuncJson(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir).repartition(col("event_id"))
    ev.select(
        from_json(col("props"),
          org.apache.spark.sql.types.StructType.fromDDL("k INT"))
          .getField("k").as("k"))
      .groupBy((col("k") % 10).as("k_mod"))
      .agg(count(lit(1)).as("n"), min(col("k")).as("min_k"),
        max(col("k")).as("max_k"))
      .orderBy(col("k_mod"))
  }

  /** JSON serialization + prefix extraction: to_json of a built struct
    * (both engines emit the identical compact rendering) and
    * substring_index (DuckDB twin: split_part — equivalent at count 1,
    * including the no-separator and leading-separator edges).
    */
  def qFuncJson2(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir).repartition(col("event_id"))
      .select(col("event_id"),
        to_json(struct(col("event_type").as("t"),
          get_json_object(col("props"), "$.k").cast("int").as("k")))
          .as("j"),
        substring_index(col("event_type"), "c", 1).as("pfx"))
      .orderBy(col("event_id")).limit(1000)

  def qFuncHash(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir)
    c.select(col("c_custkey"),
        md5(col("c_name")).as("name_md5"),
        sha2(col("c_name"), 256).as("name_sha256"),
        base64(col("c_name").cast("binary")).as("name_b64"))
      .orderBy(col("c_custkey"))
  }

  /** Array ops over the embedding column: size, head, min/max, exact
    * sequential Σx² (see VectorFunctions numeric discipline).
    */
  def qFuncArray(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(spark, dir)
    e.select(col("vec_id"),
        size(col("embedding")).as("dim"),
        element_at(col("embedding"), 1).as("head"),
        array_min(col("embedding")).as("vmin"),
        array_max(col("embedding")).as("vmax"),
        graft.functions.VectorFunctions.norm2(col("embedding")).as("norm2"))
      .orderBy(col("vec_id"))
  }

  /** Array manipulation battery over document tokens: join, slice,
    * sort, membership, position (0 when absent — Spark array_position and
    * DuckDB list_position share that convention), flatten. Array-typed
    * outputs are rendered via array_join on BOTH engines: the driver's
    * pandas-side sort cannot hash list cells, so list columns must leave
    * the query as strings (same information, hashable).
    */
  def qFuncArray2(spark: SparkSession, dir: String): DataFrame = {
    val toks = split(col("text"), "\\s+")
    Tables.documents(spark, dir)
      .select(col("doc_id"),
        array_join(slice(toks, 1, 3), "-").as("first3"),
        array_join(sort_array(slice(toks, 1, 4)), " ").as("sorted4"),
        array_contains(toks, "spark").as("has_spark"),
        array_position(toks, "spark").as("spark_pos"),
        array_join(flatten(array(slice(toks, 1, 2), slice(toks, 3, 2))), " ")
          .as("flat4"))
      .orderBy(col("doc_id"))
  }

  /** ANSI error-safe `try_*` battery — the ingestion-hardening
    * surface: arithmetic overflow, division by zero, malformed casts
    * and out-of-bounds array access all degrade to NULL instead of
    * failing the job (the PERMISSIVE-mode contract for expressions,
    * complementing q_ingest_quarantine's row-level one). Each column
    * exercises a distinct failure lane; the twin replays the NULL
    * semantics with guards since DuckDB errors eagerly on overflow
    * and division by zero.
    */
  def qFuncTry(spark: SparkSession, dir: String): DataFrame = {
    val p = Tables.part(spark, dir)
    p.select(col("p_partkey"),
        expr("try_divide(100, p_partkey % 3)").as("div3"),
        expr("try_add(9223372036854775807L, p_partkey % 2)")
          .as("ovf"),
        expr("try_cast(concat('1', case when p_partkey % 5 = 0 " +
          "then 'x' else '2' end) as int)").as("parsed"),
        // index cycles 2,3,4,1 — 3/4 exercise the OOB→NULL lane
        // (index 0 is an argument error even for try_element_at)
        expr("try_element_at(array('a', 'b'), " +
          "cast(p_partkey % 4 as int) + 1)").as("elem"))
      .orderBy(col("p_partkey"))
  }

  /** Higher-order-function battery — the lambda surface as a direct
    * subject (exists / forall / zip_with / aggregate-with-finish),
    * complementing the array/map batteries that use HOFs incidentally.
    * All integer arithmetic; the fold is left-assoc in both engines.
    */
  def qFuncHof(spark: SparkSession, dir: String): DataFrame = {
    val p = Tables.part(spark, dir)
    p.select(col("p_partkey"),
        expr("array(cast(p_size as bigint), " +
          "cast(length(p_name) as bigint), " +
          "cast(length(p_type) as bigint))").as("arr"))
      .select(col("p_partkey"),
        expr("exists(arr, x -> x > 20)").as("has_big"),
        expr("forall(arr, x -> x > 0)").as("all_pos"),
        expr("aggregate(zip_with(arr, reverse(arr), (a, b) -> a * b)," +
          " cast(0 as bigint), (a, x) -> a + x)").as("rev_dot"),
        expr("aggregate(arr, cast(0 as bigint), (a, x) -> a + x," +
          " a -> a * 2)").as("doubled_sum"))
      .orderBy(col("p_partkey"))
  }

  /** Bitwise scalar battery — popcount, AND/OR/XOR/NOT, shifts, and
    * the lowest-set-bit trick (k & −k, the Fenwick-tree step) over the
    * integer key columns. Everything stays in whole-stage codegen;
    * BIGINT in both engines (DuckDB's `^` is POWER — its xor is the
    * xor() function, Spark's is `^`; DuckDB bit_count returns TINYINT
    * — both pinned to BIGINT).
    */
  def qFuncBits(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    li.select(
        col("l_orderkey"), col("l_linenumber"),
        expr("cast(bit_count(l_orderkey) as bigint)").as("popcnt"),
        expr("l_orderkey & l_partkey").as("band"),
        expr("l_orderkey | l_partkey").as("bor"),
        expr("l_orderkey ^ l_partkey").as("bxor"),
        expr("~l_orderkey").as("bnot"),
        expr("shiftleft(cast(l_linenumber as bigint), 3)").as("shl"),
        expr("shiftright(l_orderkey, 2)").as("shr"),
        expr("l_orderkey & -l_orderkey").as("lowbit"))
      // non-unique (l_orderkey, l_linenumber) in this fixture — bxor
      // (= l_orderkey ^ l_partkey) pins l_partkey given l_orderkey, so
      // the ordering is total up to fully-identical rows (see
      // qFuncMath); the twin orders identically
      .orderBy(col("l_orderkey"), col("l_linenumber"), col("bxor"))
  }

  val defs: Map[String, Q] = Map(
    "q_func_bits" -> (qFuncBits(_, _)),
    "q_func_hof" -> (qFuncHof(_, _)),
    "q_func_try" -> (qFuncTry(_, _)),
    "q_func_array2" -> (qFuncArray2(_, _)),
    "q_func_string" -> (qFuncString(_, _)),
    "q_func_url" -> (qFuncUrl(_, _)),
    "q_func_date" -> (qFuncDate(_, _)),
    "q_func_math" -> (qFuncMath(_, _)),
    "q_func_case" -> (qFuncCase(_, _)),
    "q_func_json" -> (qFuncJson(_, _)),
    "q_func_json2" -> (qFuncJson2(_, _)),
    "q_func_hash" -> (qFuncHash(_, _)),
    "q_func_array" -> (qFuncArray(_, _))
  )

  val oracles: Map[String, String] = Map(
    "q_func_bits" ->
      """SELECT l_orderkey, l_linenumber,
        |  CAST(bit_count(l_orderkey) AS BIGINT) AS popcnt,
        |  l_orderkey & l_partkey AS band,
        |  l_orderkey | l_partkey AS bor,
        |  xor(l_orderkey, l_partkey) AS bxor,
        |  ~l_orderkey AS bnot,
        |  CAST(l_linenumber AS BIGINT) << 3 AS shl,
        |  l_orderkey >> 2 AS shr,
        |  l_orderkey & -l_orderkey AS lowbit
        |FROM lineitem
        |ORDER BY l_orderkey, l_linenumber, bxor""".stripMargin,
    // exists/forall via list_filter; zip_with via list_zip; the fold
    // via list_reduce with a prepended identity
    "q_func_hof" ->
      """WITH a AS (SELECT p_partkey,
        |    [CAST(p_size AS BIGINT), CAST(length(p_name) AS BIGINT),
        |     CAST(length(p_type) AS BIGINT)] AS arr
        |  FROM part)
        |SELECT p_partkey,
        |  len(list_filter(arr, x -> x > 20)) > 0 AS has_big,
        |  len(list_filter(arr, x -> NOT (x > 0))) = 0 AS all_pos,
        |  CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
        |    list_transform(list_zip(arr, list_reverse(arr)),
        |      s -> s[1] * s[2])), (a, x) -> a + x) AS BIGINT)
        |    AS rev_dot,
        |  CAST(2 * list_reduce(list_prepend(CAST(0 AS BIGINT), arr),
        |    (a, x) -> a + x) AS BIGINT) AS doubled_sum
        |FROM a
        |ORDER BY p_partkey""".stripMargin,
    // NULL-on-error semantics replayed with guards (DuckDB raises on
    // overflow and x/0; try_cast it has natively)
    "q_func_try" ->
      """SELECT p_partkey,
        |  CASE WHEN p_partkey % 3 = 0 THEN NULL
        |       ELSE 100.0 / (p_partkey % 3) END AS div3,
        |  CASE WHEN p_partkey % 2 = 0
        |       THEN CAST(9223372036854775807 AS BIGINT)
        |       ELSE NULL END AS ovf,
        |  try_cast('1' || CASE WHEN p_partkey % 5 = 0 THEN 'x'
        |       ELSE '2' END AS INT) AS parsed,
        |  CASE CAST(p_partkey % 4 AS INT) + 1 WHEN 1 THEN 'a'
        |       WHEN 2 THEN 'b' ELSE NULL END AS elem
        |FROM part
        |ORDER BY p_partkey""".stripMargin,
    "q_func_url" ->
      """WITH u AS (
        |  SELECT o_orderkey,
        |    'https://Shop.Example.COM/orders/' || o_orderkey ||
        |    '?utm_source=' || replace(o_orderpriority, ' ', '') ||
        |    '&page=' || (o_orderkey % 7) AS url
        |  FROM orders WHERE o_orderkey % 101 = 0)
        |SELECT o_orderkey, url,
        |  lower(regexp_extract(url, '^[a-zA-Z]+://([^/?#]+)', 1))
        |    AS host,
        |  regexp_extract(url, '^[a-zA-Z]+://[^/?#]+([^?#]*)', 1)
        |    AS path,
        |  regexp_extract(url, '[?&]utm_source=([^&#]*)', 1)
        |    AS utm_source,
        |  CAST(regexp_extract(url, '[?&]page=([^&#]*)', 1) AS BIGINT)
        |    AS page,
        |  lower(regexp_extract(url, '^[a-zA-Z]+://([^/?#]+)', 1)) ||
        |    regexp_extract(url, '^[a-zA-Z]+://[^/?#]+([^?#]*)', 1)
        |    AS canonical
        |FROM u ORDER BY o_orderkey""".stripMargin,
    "q_func_array2" ->
      """SELECT doc_id,
        |  array_to_string(toks[1:3], '-') AS first3,
        |  array_to_string(list_sort(toks[1:4]), ' ') AS sorted4,
        |  list_contains(toks, 'spark') AS has_spark,
        |  CAST(list_position(toks, 'spark') AS BIGINT) AS spark_pos,
        |  array_to_string(flatten([toks[1:2], toks[3:4]]), ' ') AS flat4
        |FROM (SELECT doc_id, string_split_regex(text, '\s+') AS toks
        |      FROM documents)
        |ORDER BY doc_id""".stripMargin,
    "q_func_string" ->
      """SELECT p_partkey,
        |  lower(p_name) AS name_lower,
        |  upper(p_brand) AS brand_upper,
        |  substring(p_name, 1, 8) AS name_prefix,
        |  CAST(length(p_name) AS BIGINT) AS name_len,
        |  concat_ws('-', p_brand, p_type) AS brand_type,
        |  replace(p_type, ' ', '_') AS type_snake,
        |  lpad(CAST(p_size AS VARCHAR), 4, '0') AS size_padded,
        |  string_split(p_type, ' ')[1] AS type_first_word,
        |  regexp_extract(p_type, '(\S+)$', 1) AS type_last_word,
        |  p_name LIKE '%a%' AS has_a,
        |  starts_with(p_name, 'b') AS starts_b
        |FROM part ORDER BY p_partkey""".stripMargin,
    "q_func_date" ->
      """SELECT o_orderkey,
        |  CAST(EXTRACT(year FROM o_orderdate) AS INTEGER) AS yr,
        |  CAST(EXTRACT(month FROM o_orderdate) AS INTEGER) AS mo,
        |  CAST(EXTRACT(day FROM o_orderdate) AS INTEGER) AS dom,
        |  CAST(EXTRACT(quarter FROM o_orderdate) AS INTEGER) AS qtr,
        |  date_trunc('month', o_orderdate) AS month_start,
        |  CAST(o_orderdate AS DATE) + 30 AS due_date,
        |  last_day(CAST(o_orderdate AS DATE)) AS month_end,
        |  CAST(CAST(o_orderdate AS DATE) - DATE '1995-01-01' AS INTEGER)
        |    AS days_since_95,
        |  CAST(epoch(o_orderdate) AS BIGINT) AS epoch_s
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "q_func_math" ->
      """SELECT l_orderkey, l_linenumber,
        |  abs(l_discount - 0.05) AS disc_dev,
        |  CAST(ceil(l_extendedprice) AS BIGINT) AS price_ceil,
        |  CAST(floor(l_extendedprice) AS BIGINT) AS price_floor,
        |  round(l_extendedprice, -2) AS price_hundreds,
        |  sqrt(l_quantity) AS qty_sqrt,
        |  CAST(sign(l_quantity - 25) AS DOUBLE) AS qty_sign,
        |  l_linenumber % 3 AS ln_mod3,
        |  greatest(l_tax, l_discount) AS max_rate,
        |  least(l_tax, l_discount) AS min_rate,
        |  round(ln(l_extendedprice), 6) AS price_ln
        |FROM lineitem ORDER BY l_orderkey, l_linenumber, disc_dev,
        |  price_ceil, price_floor, price_hundreds, price_ln, qty_sqrt,
        |  max_rate, min_rate""".stripMargin,
    "q_func_case" ->
      """SELECT CASE WHEN o_totalprice < 100000 THEN 'small'
        |  WHEN o_totalprice < 300000 THEN 'medium' ELSE 'large' END AS bucket,
        |  COALESCE(NULLIF(o_orderstatus, 'O'), 'OPEN') AS status_display,
        |  COUNT(*) AS n
        |FROM orders GROUP BY bucket, status_display
        |ORDER BY bucket, status_display""".stripMargin,
    "q_func_json" ->
      """SELECT CAST(json_extract_string(props, '$.k') AS INTEGER) % 10
        |    AS k_mod,
        |  COUNT(*) AS n,
        |  MIN(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS min_k,
        |  MAX(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS max_k
        |FROM events GROUP BY k_mod ORDER BY k_mod""".stripMargin,
    "q_func_json2" ->
      """SELECT event_id,
        |  to_json(struct_pack(t := event_type,
        |    k := CAST(json_extract_string(props, '$.k') AS INTEGER)))
        |    AS j,
        |  split_part(event_type, 'c', 1) AS pfx
        |FROM events ORDER BY event_id LIMIT 1000""".stripMargin,
    "q_func_hash" ->
      """SELECT c_custkey,
        |  md5(c_name) AS name_md5,
        |  sha256(c_name) AS name_sha256,
        |  to_base64(encode(c_name)) AS name_b64
        |FROM customer ORDER BY c_custkey""".stripMargin,
    "q_func_array" ->
      """SELECT vec_id,
        |  CAST(len(embedding) AS INTEGER) AS dim,
        |  embedding[1] AS head,
        |  list_min(embedding) AS vmin,
        |  list_max(embedding) AS vmax,
        |  list_sum(list_transform(embedding,
        |    x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))) AS norm2
        |FROM embeddings ORDER BY vec_id""".stripMargin
  )
}
