package graft.ops

import org.apache.spark.sql.{DataFrame, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import graft.{Canon, Tables}

/** Scalar-function families, explode, and the UDF/UDAF extension
  * surface (SURVEY §2 B3, B35–B41, B48, B49).
  *
  * Scale posture: everything here is a narrow per-row projection (no
  * shuffle) except the final canon ORDER BY and the explode
  * aggregations — and all built-ins stay inside whole-stage codegen.
  * The one scalar UDF (b48) and UDAF (b49) exist to prove the
  * extension surface; every other operator deliberately uses
  * `org.apache.spark.sql.functions` built-ins, which codegen and
  * vectorize (SURVEY §4: functions-not-UDFs).
  */
object Functions {
  import Canon._

  type Q = (SparkSession, String) => DataFrame

  /** b3 — JSON-in-string scan: parse `events.props` with an explicit
    * schema (`from_json`), aggregate on the extracted key.
    */
  def jsonExtract(spark: SparkSession, sfDir: String): DataFrame =
    Tables.t(spark, sfDir, "events")
      .withColumn("k", from_json(col("props"), lit("k INT")).getField("k"))
      .groupBy(col("k"))
      .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_value"))
      .orderBy("k")

  /** b40 — map-function family: parse `events.props` into a real
    * MapType (`from_json` with a MAP schema — b3's struct parse is the
    * sibling for fixed keys), build a derived map with
    * `map_from_entries`, then exercise `map_keys` / `map_values` /
    * `element_at` / `size`. Final schema is all-scalar: keys flattened
    * via sorted `concat_ws`, values via an `aggregate` fold (§5.3
    * rule 5 — no MapType leaves the operator). Pure per-row
    * projection, no shuffle beyond the canon ORDER BY.
    */
  def mapFuncs(spark: SparkSession, sfDir: String): DataFrame =
    Tables.t(spark, sfDir, "events")
      .withColumn("pm", from_json(col("props"), lit("map<string,int>")))
      .withColumn("m", map_from_entries(array(
        struct(lit("k").as("key"), element_at(col("pm"), "k").as("value")),
        struct(lit("type_len").as("key"), length(col("event_type")).as("value")),
        struct(lit("uid_mod").as("key"), (col("user_id") % 10).cast("int").as("value")))))
      .select(
        col("event_id"),
        element_at(col("pm"), "k").cast("long").as("prop_k"),
        size(col("m")).cast("long").as("n_keys"),
        concat_ws(",", sort_array(map_keys(col("m")))).as("keys_sorted"),
        aggregate(map_values(col("m")), lit(0L), (acc, v) => acc + v).as("vals_sum"),
        element_at(col("m"), "uid_mod").cast("long").as("uid_mod"))
      .transform(graft.Canon.barrierSort(_, "event_id"))

  /** b35 — string-function family over part. Integer-returning
    * functions cast to BIGINT to match DuckDB's return types.
    */
  def stringFuncs(spark: SparkSession, sfDir: String): DataFrame =
    Tables.t(spark, sfDir, "part").select(
      col("p_partkey"),
      upper(col("p_name")).as("up_name"),
      lower(col("p_type")).as("lo_type"),
      length(col("p_name")).cast("long").as("name_len"),
      substring(col("p_name"), 1, 4).as("name_pre"),
      concat_ws("-", col("p_brand"), col("p_type")).as("brand_type"),
      element_at(split(col("p_name"), " "), 1).as("first_tok"),
      regexp_extract(col("p_brand"), "(\\d+)", 1).as("brand_num"),
      regexp_replace(col("p_name"), "e", "E").as("name_repl"),
      lpad(col("p_size").cast("string"), 5, "0").as("size_pad"),
      instr(col("p_name"), "e").cast("long").as("e_pos"),
      trim(concat(lit("  "), col("p_brand"), lit("  "))).as("brand_trim"),
      levenshtein(col("p_name"), lit("widget")).cast("long").as("lev_widget"))
      .orderBy("p_partkey")

  /** b36 — date/time family over orders. Cross-dialect notes baked
    * into the oracle: DuckDB dayofweek is 0-based (Sunday=0) vs
    * Spark's 1-based; DuckDB datediff takes (unit, start, end).
    */
  def datetimeFuncs(spark: SparkSession, sfDir: String): DataFrame =
    Tables.t(spark, sfDir, "orders").select(
      col("o_orderkey"),
      year(col("o_orderdate")).cast("long").as("yr"),
      quarter(col("o_orderdate")).cast("long").as("qtr"),
      month(col("o_orderdate")).cast("long").as("mon"),
      dayofweek(col("o_orderdate")).cast("long").as("dow"),
      date_trunc("month", col("o_orderdate")).cast("timestamp_ntz").as("month_start"),
      datediff(col("o_orderdate").cast("date"), lit("1995-01-01").cast("date"))
        .cast("long").as("days_since_95"),
      add_months(col("o_orderdate"), 3).as("plus_3m"),
      (unix_micros(col("o_orderdate").cast("timestamp")) / lit(1000000L))
        .cast("long").as("epoch_s"),
      make_date(year(col("o_orderdate")), lit(1), lit(1)).as("year_start"))
      .orderBy("o_orderkey")

  /** b37 — math family over part. Transcendentals (exp/ln/log10/pow)
    * are canon-rounded: libm vs java.lang.Math can differ in the last
    * ulp (§5.3 rule 2); sqrt is IEEE-exact so stays raw.
    */
  def mathFuncs(spark: SparkSession, sfDir: String): DataFrame =
    Tables.t(spark, sfDir, "part").select(
      col("p_partkey"),
      round(col("p_retailprice"), 1).as("price_r1"),
      abs(col("p_retailprice") - 1000).as("abs_dev"),
      ceil(col("p_retailprice")).as("price_ceil"),
      floor(col("p_retailprice")).as("price_floor"),
      r4(pow(col("p_size"), 2)).as("size_sq"),
      sqrt(col("p_retailprice")).as("price_sqrt"),
      r4(exp(col("p_size") / lit(100.0))).as("size_exp"),
      r4(log(col("p_retailprice"))).as("price_ln"),
      r4(log10(col("p_retailprice"))).as("price_log10"),
      signum(col("p_retailprice") - 1000).as("price_sign"),
      greatest(col("p_size"), lit(25)).cast("long").as("size_hi"),
      least(col("p_size"), lit(25)).cast("long").as("size_lo"),
      pmod(col("p_size"), lit(7)).as("size_mod7"))
      .orderBy("p_partkey")

  /** b39 — array higher-order functions over embeddings: lambda
    * transform/filter/aggregate (fold). Elements cast float→double
    * before arithmetic in BOTH engines (§5.3 rule 7).
    */
  def arrayFuncs(spark: SparkSession, sfDir: String): DataFrame =
    Tables.t(spark, sfDir, "embeddings").select(
      col("vec_id"),
      size(col("embedding")).cast("long").as("dim"),
      r4(expr("sqrt(aggregate(transform(embedding, x -> cast(x as double) * cast(x as double)), 0D, (acc, x) -> acc + x))")).as("l2_norm"),
      r4(expr("cast(array_max(embedding) as double)")).as("max_elem"),
      expr("size(filter(embedding, x -> x > 0))").cast("long").as("n_pos"),
      r4(expr("aggregate(slice(transform(embedding, x -> cast(x as double)), 1, 8), 0D, (acc, x) -> acc + x)")).as("head8_sum"))
      .orderBy("vec_id")

  /** b41 — explode/generator (UDTF-shape): tokenize documents, global
    * token frequencies.
    */
  def explodeTokens(spark: SparkSession, sfDir: String): DataFrame =
    Tables.t(spark, sfDir, "documents")
      .select(explode(split(col("text"), " ")).as("word"))
      .groupBy(col("word"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("word"))

  /** b48 — the scalar-UDF extension point. One deliberately simple,
    * SQL-replicable UDF (distinct-token ratio) — real engines should
    * prefer built-ins (codegen), which every other operator here does.
    */
  def scalarUdf(spark: SparkSession, sfDir: String): DataFrame = {
    val tokenRatio = udf { s: String =>
      val ws = s.split(" ")
      if (ws.isEmpty) 0.0 else ws.distinct.length.toDouble / ws.length
    }
    Tables.t(spark, sfDir, "documents")
      .select(col("doc_id"), round(tokenRatio(col("text")), 4).as("token_ratio"))
      .orderBy("doc_id")
  }

  /** b49 — the UDAF extension point: geometric mean as a typed
    * `Aggregator` (log-space sum buffer, mergeable across partitions —
    * the 100 TB-safe commutative-monoid shape).
    */
  object GeoMean extends Aggregator[Double, (Double, Long), Double] {
    def zero: (Double, Long) = (0.0, 0L)
    def reduce(b: (Double, Long), x: Double): (Double, Long) =
      (b._1 + math.log(x), b._2 + 1)
    def merge(a: (Double, Long), b: (Double, Long)): (Double, Long) =
      (a._1 + b._1, a._2 + b._2)
    def finish(b: (Double, Long)): Double =
      if (b._2 == 0) 0.0 else math.exp(b._1 / b._2)
    def bufferEncoder = Encoders.product[(Double, Long)]
    def outputEncoder = Encoders.scalaDouble
  }

  def udafGeomean(spark: SparkSession, sfDir: String): DataFrame = {
    val geomean = udaf(GeoMean, Encoders.scalaDouble)
    Tables.t(spark, sfDir, "orders")
      .groupBy(col("o_orderstatus"))
      .agg(round(geomean(col("o_totalprice")), 2).as("geomean_price"),
        count(lit(1)).as("n"))
      .orderBy("o_orderstatus")
  }

  val queries: Map[String, Q] = Map(
    "b3_json_extract" -> (jsonExtract(_, _)),
    "b40_map_funcs" -> (mapFuncs(_, _)),
    "b35_string_funcs" -> (stringFuncs(_, _)),
    "b36_datetime_funcs" -> (datetimeFuncs(_, _)),
    "b37_math_funcs" -> (mathFuncs(_, _)),
    "b39_array_funcs" -> (arrayFuncs(_, _)),
    "b41_explode_tokens" -> (explodeTokens(_, _)),
    "b48_scalar_udf" -> (scalarUdf(_, _)),
    "b49_udaf_geomean" -> (udafGeomean(_, _))
  )

  val oracle: Map[String, String] = Map(
    "b3_json_extract" ->
      s"""SELECT CAST(json_extract(props, '$$.k') AS INTEGER) AS k,
         |  COUNT(*) AS n, ${oDsum("value")} AS sum_value
         |FROM events
         |GROUP BY 1
         |ORDER BY k ASC NULLS FIRST""".stripMargin,

    "b40_map_funcs" ->
      """SELECT event_id,
        |  CAST(CAST(json_extract(props, '$.k') AS INTEGER) AS BIGINT) AS prop_k,
        |  CAST(cardinality(m) AS BIGINT) AS n_keys,
        |  array_to_string(list_sort(map_keys(m)), ',') AS keys_sorted,
        |  CAST(list_sum(map_values(m)) AS BIGINT) AS vals_sum,
        |  CAST(map_extract(m, 'uid_mod')[1] AS BIGINT) AS uid_mod
        |FROM (
        |  SELECT event_id,
        |    map {'k': CAST(json_extract(props, '$.k') AS INTEGER),
        |         'type_len': CAST(length(event_type) AS INTEGER),
        |         'uid_mod': CAST(user_id % 10 AS INTEGER)} AS m,
        |    props
        |  FROM events)
        |ORDER BY event_id ASC NULLS FIRST""".stripMargin,

    "b35_string_funcs" ->
      """SELECT p_partkey,
        |  upper(p_name) AS up_name,
        |  lower(p_type) AS lo_type,
        |  length(p_name) AS name_len,
        |  substring(p_name, 1, 4) AS name_pre,
        |  concat_ws('-', p_brand, p_type) AS brand_type,
        |  string_split(p_name, ' ')[1] AS first_tok,
        |  regexp_extract(p_brand, '(\d+)', 1) AS brand_num,
        |  regexp_replace(p_name, 'e', 'E', 'g') AS name_repl,
        |  lpad(CAST(p_size AS VARCHAR), 5, '0') AS size_pad,
        |  instr(p_name, 'e') AS e_pos,
        |  trim('  ' || p_brand || '  ') AS brand_trim,
        |  CAST(levenshtein(p_name, 'widget') AS BIGINT) AS lev_widget
        |FROM part
        |ORDER BY p_partkey ASC NULLS FIRST""".stripMargin,

    "b36_datetime_funcs" ->
      """SELECT o_orderkey,
        |  year(o_orderdate) AS yr,
        |  quarter(o_orderdate) AS qtr,
        |  month(o_orderdate) AS mon,
        |  dayofweek(o_orderdate) + 1 AS dow,
        |  CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start,
        |  datediff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS days_since_95,
        |  CAST(o_orderdate + INTERVAL 3 MONTH AS DATE) AS plus_3m,
        |  CAST(epoch(o_orderdate) AS BIGINT) AS epoch_s,
        |  make_date(CAST(year(o_orderdate) AS INTEGER), 1, 1) AS year_start
        |FROM orders
        |ORDER BY o_orderkey ASC NULLS FIRST""".stripMargin,

    "b37_math_funcs" ->
      """SELECT p_partkey,
        |  round(p_retailprice, 1) AS price_r1,
        |  abs(p_retailprice - 1000) AS abs_dev,
        |  CAST(ceil(p_retailprice) AS BIGINT) AS price_ceil,
        |  CAST(floor(p_retailprice) AS BIGINT) AS price_floor,
        |  ROUND(pow(p_size, 2), 4) AS size_sq,
        |  sqrt(p_retailprice) AS price_sqrt,
        |  ROUND(exp(p_size / 100.0), 4) AS size_exp,
        |  ROUND(ln(p_retailprice), 4) AS price_ln,
        |  ROUND(log10(p_retailprice), 4) AS price_log10,
        |  CAST(sign(p_retailprice - 1000) AS DOUBLE) AS price_sign,
        |  greatest(p_size, 25) AS size_hi,
        |  least(p_size, 25) AS size_lo,
        |  p_size % 7 AS size_mod7
        |FROM part
        |ORDER BY p_partkey ASC NULLS FIRST""".stripMargin,

    "b39_array_funcs" ->
      """SELECT vec_id,
        |  CAST(len(embedding) AS BIGINT) AS dim,
        |  ROUND(sqrt(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))), 4) AS l2_norm,
        |  ROUND(CAST(list_max(embedding) AS DOUBLE), 4) AS max_elem,
        |  CAST(len(list_filter(embedding, x -> x > 0)) AS BIGINT) AS n_pos,
        |  ROUND(list_sum(list_transform(embedding[1:8], x -> CAST(x AS DOUBLE))), 4) AS head8_sum
        |FROM embeddings
        |ORDER BY vec_id ASC NULLS FIRST""".stripMargin,

    "b41_explode_tokens" ->
      """SELECT word, COUNT(*) AS n FROM (
        |  SELECT unnest(string_split(text, ' ')) AS word FROM documents
        |) GROUP BY word
        |ORDER BY n DESC NULLS LAST, word ASC NULLS FIRST""".stripMargin,

    "b48_scalar_udf" ->
      """SELECT doc_id,
        |  ROUND(CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
        |        / len(string_split(text, ' ')), 4) AS token_ratio
        |FROM documents
        |ORDER BY doc_id ASC NULLS FIRST""".stripMargin,

    "b49_udaf_geomean" ->
      """SELECT o_orderstatus,
        |  ROUND(EXP(AVG(LN(o_totalprice))), 2) AS geomean_price,
        |  COUNT(*) AS n
        |FROM orders
        |GROUP BY o_orderstatus
        |ORDER BY o_orderstatus ASC NULLS FIRST""".stripMargin
  )
}
