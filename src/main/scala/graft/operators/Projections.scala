package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables

/** Projection / column-op / scalar-function coverage (SURVEY §2 B-rows).
  *
  * Everything here is a narrow projection over a single scan — Catalyst
  * prunes the parquet read to exactly the referenced columns, so at 100 TB
  * these are IO-bound column scans with zero shuffle (except the final
  * oracle-determinism ORDER BY, which TakeOrderedAndProject/TopK handles or
  * the harness re-sorts anyway).
  */
object Projections {

  type Q = (SparkSession, String) => DataFrame

  /** select/alias + arithmetic + coalesce + lit + cast (B1,B2,B3,B6,B7,B8).
    * Reference shape: derived-column ETL at 00-etl-rwd.py:79 and model
    * metadata stamping at 03-work with ML models.py:148-152.
    */
  def projectArith(spark: SparkSession, sfDir: String): DataFrame =
    Tables(spark, sfDir).orders
      .select(
        col("o_orderkey"),
        // round at 4: the product of a 2-decimal price and 0.95 is exact at
        // 4 decimals, so no decimal-vs-binary rounding-tie divergence vs the
        // oracle (rounding it at 2 hits ties like x.xx5).
        round(col("o_totalprice") * (lit(1.0) - lit(0.05)), 4).as("disc_price"),
        coalesce(col("o_orderpriority"), lit("NA")).as("priority"),
        (col("o_orderpriority") === "1-URGENT").cast("int").as("urgent")
      )
      .orderBy(col("o_orderkey"))

  /** withColumnRenamed + drop (B4,B5). Reference shape: ingest renames at
    * 00-etl-rwd.py:96-119, nested-col drop at 03:183.
    */
  def renameDrop(spark: SparkSession, sfDir: String): DataFrame =
    Tables(spark, sfDir).part
      .withColumnRenamed("p_name", "part_name")
      .withColumnRenamed("p_retailprice", "price")
      .drop("p_type", "p_size")
      .select(col("p_partkey"), col("part_name"), col("p_brand"), col("price"))
      .orderBy(col("p_partkey"))

  /** lower() + LIKE contains (B10,B11,C4). Reference: case-insensitive
    * condition match, 01-rwe-dashboard.r:63-64.
    */
  def likeLower(spark: SparkSession, sfDir: String): DataFrame =
    Tables(spark, sfDir).part
      .where(lower(col("p_type")).like("%romo%"))
      .groupBy(col("p_brand"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("p_brand"))

  /** NOT LIKE exclusion (B12). Reference: comorbidity exclusion,
    * 01-rwe-dashboard.r:84.
    */
  def notLike(spark: SparkSession, sfDir: String): DataFrame =
    Tables(spark, sfDir).part
      .where(!lower(col("p_type")).like("%romo%"))
      .groupBy(col("p_type"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("p_type"))

  /** datediff + date_format over a join (B13,B15,D1). Reference: day-index /
    * age derivation at 02-patient-trajectory.py:114-115.
    */
  def shipDelayByMonth(spark: SparkSession, sfDir: String): DataFrame = {
    val t = Tables(spark, sfDir)
    t.lineitem
      .join(t.orders, col("l_orderkey") === col("o_orderkey"))
      .select(
        date_format(col("o_orderdate"), "yyyy-MM").as("month"),
        datediff(col("l_shipdate"), col("o_orderdate")).as("delay")
      )
      .groupBy(col("month"))
      .agg(round(avg(col("delay")), 4).as("avg_delay"), count(lit(1)).as("n"))
      .orderBy(col("month"))
  }

  /** Hash de-identification (B16), reference 00-etl-rwd.py:62-79: the
    * reference uses a *Python UDF* sha1 over coalesce(col,'null'); we use the
    * codegen'd built-in hash family instead (no serialization boundary).
    * sha256 here because the DuckDB oracle lacks sha1; the sha1 path is
    * [[graft.functions.Deidentify]] and is pinned by ScalaTest instead.
    */
  def deidHash(spark: SparkSession, sfDir: String): DataFrame =
    Tables(spark, sfDir).customer
      .select(
        col("c_custkey"),
        sha2(coalesce(col("c_name"), lit("null")), 256).as("name_hash")
      )
      .orderBy(col("c_custkey"))

  /** JSON-in-string extraction (B9-shape / M5), events.props = {"k": n}. */
  def jsonProps(spark: SparkSession, sfDir: String): DataFrame =
    Tables(spark, sfDir).eventsRaw
      .select(
        col("event_type"),
        get_json_object(col("props"), "$.k").cast("bigint").as("k")
      )
      .groupBy(col("event_type"))
      .agg(sum(col("k")).as("sum_k"), count(lit(1)).as("n"))
      .orderBy(col("event_type"))

  /** Unpivot / melt (wide -> long reshape): part measures to (key,
    * measure, value) rows via `Dataset.unpivot` — a Generate (expand)
    * node, no shuffle, so it streams at scan speed at any scale.
    */
  def unpivotMeasures(spark: SparkSession, sfDir: String): DataFrame =
    Tables(spark, sfDir).part
      .select(col("p_partkey"),
        col("p_size").cast("double").as("p_size"), col("p_retailprice"))
      .unpivot(
        ids = Array(col("p_partkey")),
        values = Array(col("p_size"), col("p_retailprice")),
        variableColumnName = "measure",
        valueColumnName = "value")
      .orderBy(col("p_partkey"), col("measure"))

  /** String-function breadth in one codegen'd projection (B-row
    * extension): case, padding, token extraction (split_part /
    * regexp_extract), reverse, multi-column concat, replace — all
    * built-ins (no UDFs), all evaluated inside one WholeStageCodegen
    * span over the scan.
    */
  def stringFunctions(spark: SparkSession, sfDir: String): DataFrame =
    Tables(spark, sfDir).part
      .select(
        col("p_partkey"),
        upper(col("p_name")).as("uname"),
        lpad(col("p_brand"), 10, "#").as("padded"),
        expr("split_part(p_name, ' ', 1)").as("first_word"),
        regexp_extract(col("p_name"), "([a-z]+)$", 1).as("last_word"),
        reverse(col("p_type")).as("rtype"),
        concat_ws("|", col("p_brand"), col("p_type")).as("tag"),
        regexp_replace(col("p_name"), " ", "_").as("snake")
      )
      .orderBy(col("p_partkey"))

  /** Collection aggregation (array surface): per-order sorted line-number
    * list and distinct-flag count. The list is emitted as a joined string
    * — engine-agnostic (array hashing differs across engines) and
    * deterministic via sort_array. collect_list here is bounded by
    * lines-per-order (~7), not data size — safe at any scale; unbounded
    * collect_list aggregations are the anti-pattern.
    */
  def arrayAgg(spark: SparkSession, sfDir: String): DataFrame =
    Tables(spark, sfDir).lineitem
      .groupBy(col("l_orderkey"))
      .agg(
        array_join(sort_array(collect_list(col("l_linenumber"))), ",").as("lines"),
        size(collect_set(col("l_returnflag"))).cast("bigint").as("n_flags")
      )
      .orderBy(col("l_orderkey"))

  /** Temporal-function breadth (B13/B15 extension): calendar decomposition,
    * month-end snapping, day shifting — all codegen'd built-ins on the
    * scan, no shuffle until the final aggregate-free projection. dayofweek
    * is emitted 0-based (Sunday=0) to share semantics across engines.
    */
  def dateFunctions(spark: SparkSession, sfDir: String): DataFrame =
    Tables(spark, sfDir).orders
      .select(
        col("o_orderkey"),
        to_date(col("o_orderdate")).cast("string").as("d"),
        year(col("o_orderdate")).cast("bigint").as("y"),
        quarter(col("o_orderdate")).cast("bigint").as("q"),
        month(col("o_orderdate")).cast("bigint").as("m"),
        dayofmonth(col("o_orderdate")).cast("bigint").as("dom"),
        (dayofweek(col("o_orderdate")) - 1).cast("bigint").as("dow"),
        last_day(col("o_orderdate")).cast("string").as("month_end"),
        date_add(to_date(col("o_orderdate")), 30).cast("string").as("due")
      )
      .orderBy(col("o_orderkey"))

  /** Higher-order array functions — transform / filter / aggregate /
    * zip_with lambdas over the embedding vectors. These stay inside
    * Catalyst (LambdaFunction expressions, no UDF serialization), so the
    * whole projection is codegen'd; `reverse` + `zip_with` gives an
    * order-reversed dot product without ever exploding the array.
    */
  def arrayHof(spark: SparkSession, sfDir: String): DataFrame = {
    val emb = col("embedding").cast("array<double>")
    Tables(spark, sfDir).embeddings
      .select(
        col("vec_id"),
        round(aggregate(transform(emb, x => least(x, lit(0.1))),
          lit(0.0), (acc, x) => acc + x), 6).as("clipped_sum"),
        size(filter(emb, x => x > lit(0.2))).cast("bigint").as("n_big"),
        round(aggregate(zip_with(emb, reverse(emb), (a, b) => a * b),
          lit(0.0), (acc, x) => acc + x), 6).as("rev_dot"))
      .orderBy(col("vec_id"))
  }

  /** Generator surface: `posexplode` flattens each document's token
    * array WITH its position — the lateral-join shape loaders use to
    * turn corpus rows into (doc, offset, token) training triples. The
    * generator runs inside the projection (GenerateExec), no join.
    */
  def posExplodeTokens(spark: SparkSession, sfDir: String): DataFrame =
    Tables(spark, sfDir).documents
      .where(col("doc_id") < 20)
      .select(col("doc_id"),
        posexplode(split(trim(lower(col("text"))), "\\s+")).as(Seq("pos", "tok")))
      .select(col("doc_id"), col("pos").cast("bigint").as("pos"), col("tok"))
      .orderBy(col("doc_id"), col("pos"))

  def queries: Map[String, Q] = Map(
    "q_posexplode" -> (posExplodeTokens _),
    "q_array_hof" -> (arrayHof _),
    "q_date_funcs" -> (dateFunctions _),
    "q_string_funcs" -> (stringFunctions _),
    "q_array_agg" -> (arrayAgg _),
    "q_project_arith" -> (projectArith _),
    "q_unpivot" -> (unpivotMeasures _),
    "q_rename_drop" -> (renameDrop _),
    "q_like_lower" -> (likeLower _),
    "q_not_like" -> (notLike _),
    "q_ship_delay_month" -> (shipDelayByMonth _),
    "q_deid_hash" -> (deidHash _),
    "q_json_props" -> (jsonProps _)
  )

  def oracles: Map[String, String] = Map(
    // generate_subscripts + unnest expand in lockstep (the Postgres
    // idiom); DuckDB's range() table function rejects lateral column refs
    "q_posexplode" ->
      """WITH t AS (
        |  SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS ts
        |  FROM documents WHERE doc_id < 20)
        |SELECT doc_id, generate_subscripts(ts, 1) - 1 AS pos, unnest(ts) AS tok
        |FROM t ORDER BY doc_id, pos""".stripMargin,
    "q_array_hof" ->
      """SELECT vec_id,
        | round(list_sum(list_transform(embedding::DOUBLE[], x -> least(x, 0.1))), 6)
        |   AS clipped_sum,
        | len(list_filter(embedding::DOUBLE[], x -> x > 0.2)) AS n_big,
        | round(list_dot_product(embedding::DOUBLE[], list_reverse(embedding::DOUBLE[])), 6)
        |   AS rev_dot
        |FROM embeddings ORDER BY vec_id""".stripMargin,
    "q_date_funcs" ->
      """SELECT o_orderkey,
        | strftime(o_orderdate::DATE, '%Y-%m-%d') AS d,
        | year(o_orderdate) AS y,
        | quarter(o_orderdate) AS q,
        | month(o_orderdate) AS m,
        | dayofmonth(o_orderdate) AS dom,
        | dayofweek(o_orderdate) AS dow,
        | strftime(last_day(o_orderdate::DATE), '%Y-%m-%d') AS month_end,
        | strftime(o_orderdate::DATE + INTERVAL 30 DAY, '%Y-%m-%d') AS due
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "q_string_funcs" ->
      """SELECT p_partkey,
        | upper(p_name) AS uname,
        | lpad(p_brand, 10, '#') AS padded,
        | split_part(p_name, ' ', 1) AS first_word,
        | regexp_extract(p_name, '([a-z]+)$', 1) AS last_word,
        | reverse(p_type) AS rtype,
        | concat_ws('|', p_brand, p_type) AS tag,
        | regexp_replace(p_name, ' ', '_', 'g') AS snake
        |FROM part ORDER BY p_partkey""".stripMargin,
    "q_array_agg" ->
      """SELECT l_orderkey,
        | array_to_string(list_sort(list(l_linenumber)), ',') AS lines,
        | count(DISTINCT l_returnflag) AS n_flags
        |FROM lineitem GROUP BY l_orderkey ORDER BY l_orderkey""".stripMargin,
    // engine-agnostic melt: UNION ALL of one branch per measure
    "q_unpivot" ->
      """SELECT p_partkey, 'p_size' AS measure, CAST(p_size AS DOUBLE) AS value FROM part
        |UNION ALL
        |SELECT p_partkey, 'p_retailprice', p_retailprice FROM part
        |ORDER BY p_partkey, measure""".stripMargin,
    "q_project_arith" ->
      """SELECT o_orderkey, round(o_totalprice * 0.95, 4) AS disc_price,
        | ifnull(o_orderpriority, 'NA') AS priority,
        | CAST(o_orderpriority = '1-URGENT' AS INT) AS urgent
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "q_rename_drop" ->
      """SELECT p_partkey, p_name AS part_name, p_brand, p_retailprice AS price
        |FROM part ORDER BY p_partkey""".stripMargin,
    "q_like_lower" ->
      """SELECT p_brand, count(*) AS n FROM part
        |WHERE lower(p_type) LIKE '%romo%'
        |GROUP BY p_brand ORDER BY p_brand""".stripMargin,
    "q_not_like" ->
      """SELECT p_type, count(*) AS n FROM part
        |WHERE lower(p_type) NOT LIKE '%romo%'
        |GROUP BY p_type ORDER BY p_type""".stripMargin,
    "q_ship_delay_month" ->
      """SELECT strftime(o_orderdate, '%Y-%m') AS month,
        | round(avg(datediff('day', o_orderdate, l_shipdate)), 4) AS avg_delay,
        | count(*) AS n
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_deid_hash" ->
      """SELECT c_custkey, sha256(ifnull(c_name, 'null')) AS name_hash
        |FROM customer ORDER BY c_custkey""".stripMargin,
    "q_json_props" ->
      """SELECT event_type, CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
        | count(*) AS n
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin
  )
}
