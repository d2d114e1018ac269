package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.lexicon.Lexicon

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` carries one entry per implemented operator from SURVEY.md §2;
  * `oracleSql` carries the DuckDB-equivalent SQL for everything
  * SQL-expressible (same column names/aliases — the driver's compare sorts
  * columns by name before hashing values).
  *
  * Oracle-parity rules used throughout:
  *  - double sums are only order-independent when the addends are exactly
  *    representable; prices here have 2 decimals, so money aggregates go
  *    through `CAST(... AS DECIMAL(18,2))` on BOTH sides, then back to
  *    DOUBLE for a stable hash.
  *  - every query has a total ORDER BY on a unique key combination.
  */
object SparkEntry {

  private def tbl(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** Flagship query (≙ reference `lexicon` command, LexiconCommand.cs:14-58):
    * build the identity-angle lexicon over the documents corpus. */
  def entry(spark: SparkSession): DataFrame = {
    val docs = tbl(spark, "/root/testdata/sf0.001", "documents")
    Lexicon.build(docs, "text").toDF()
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // --- reference flagship: lexicon build + validate (non-SQL-expressible,
    //     rows-only driver check) -----------------------------------------
    "lexicon_build" -> ((s, dir) => {
      Lexicon.build(tbl(s, dir, "documents"), "text").toDF()
        .select("angle", "label").orderBy("angle")
    }),

    // --- relational operator coverage (DuckDB-oracled) -------------------
    // Aggregation with grouped sums/averages (≙ S11 scan + §2.8 aggregations)
    "q1_pricing_summary" -> ((s, dir) => {
      val li = tbl(s, dir, "lineitem")
      li.filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(col("l_quantity")).as("sum_qty"),
          sum(col("l_extendedprice").cast("decimal(18,2)")).cast("double").as("sum_base_price"),
          sum((col("l_extendedprice") * (lit(1) - col("l_discount")))
            .cast("decimal(18,4)")).cast("double").as("sum_disc_price"),
          avg(col("l_quantity")).as("avg_qty"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    }),

    // Multi-way join with broadcast dims + group + top-k
    "q3_top_revenue_orders" -> ((s, dir) => {
      val c = tbl(s, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
      val o = tbl(s, dir, "orders")
      val l = tbl(s, dir, "lineitem")
      l.join(o, l("l_orderkey") === o("o_orderkey"))
        .join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .groupBy(col("l_orderkey"), col("o_orderdate"))
        .agg(sum((col("l_extendedprice") * (lit(1) - col("l_discount")))
          .cast("decimal(18,4)")).cast("double").as("revenue"))
        .orderBy(desc("revenue"), col("l_orderkey"))
        .limit(10)
    }),

    // Window function: rank orders per customer by totalprice
    "q_window_top_orders" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val o = tbl(s, dir, "orders")
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(desc("o_totalprice"), col("o_orderkey"))
      o.withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 2)
        .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"), col("rn"))
        .orderBy(col("o_custkey"), col("rn"), col("o_orderkey"))
    }),

    // Set semantics: key-set intersection/difference across columns
    // (≙ README.md:52 "columns are sets of keys, enabling set operations")
    "q_keyset_ops" -> ((s, dir) => {
      val o = tbl(s, dir, "orders")
      val highValue = o.filter(col("o_totalprice") > 150000).select(col("o_custkey"))
      val urgent = o.filter(col("o_orderpriority") === "1-URGENT").select(col("o_custkey"))
      highValue.intersect(urgent)
        .withColumnRenamed("o_custkey", "custkey")
        .orderBy("custkey")
    }),

    // Anti-join membership probe (≙ S12 KeyExists / T12 FindMissingAngles)
    "q_orders_without_lineitems" -> ((s, dir) => {
      val o = tbl(s, dir, "orders")
      val l = tbl(s, dir, "lineitem").select(col("l_orderkey"))
      o.join(l, o("o_orderkey") === l("l_orderkey"), "left_anti")
        .select(col("o_orderkey"), col("o_orderstatus"))
        .orderBy("o_orderkey")
    }),

    // Exact dedup by content hash (training-data pipeline op; md5 is
    // bit-identical across engines)
    "doc_exact_dedup" -> ((s, dir) => {
      tbl(s, dir, "documents")
        .groupBy(md5(col("text")).as("text_hash"))
        .agg(min(col("doc_id")).as("doc_id"), count(lit(1)).as("n_copies"))
        .orderBy("doc_id")
        .select("doc_id", "text_hash", "n_copies")
    })
  )

  def oracleSql: Map[String, String] = Map(
    "q1_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |  sum(l_quantity) AS sum_qty,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        |  CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS sum_disc_price,
        |  avg(l_quantity) AS avg_qty,
        |  count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q3_top_revenue_orders" ->
      """SELECT l_orderkey, o_orderdate,
        |  CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'BUILDING'
        |GROUP BY l_orderkey, o_orderdate
        |ORDER BY revenue DESC, l_orderkey
        |LIMIT 10""".stripMargin,
    "q_window_top_orders" ->
      """SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    row_number() OVER (PARTITION BY o_custkey
        |      ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |  FROM orders) t
        |WHERE rn <= 2
        |ORDER BY o_custkey, rn, o_orderkey""".stripMargin,
    "q_keyset_ops" ->
      """SELECT custkey FROM (
        |  SELECT o_custkey AS custkey FROM orders WHERE o_totalprice > 150000
        |  INTERSECT
        |  SELECT o_custkey AS custkey FROM orders WHERE o_orderpriority = '1-URGENT') t
        |ORDER BY custkey""".stripMargin,
    "q_orders_without_lineitems" ->
      """SELECT o_orderkey, o_orderstatus FROM orders
        |WHERE o_orderkey NOT IN (SELECT l_orderkey FROM lineitem)
        |ORDER BY o_orderkey""".stripMargin,
    "doc_exact_dedup" ->
      """SELECT doc_id, text_hash, n_copies FROM (
        |  SELECT md5(text) AS text_hash, min(doc_id) AS doc_id, count(*) AS n_copies
        |  FROM documents GROUP BY md5(text)) t
        |ORDER BY doc_id""".stripMargin
  )
}
