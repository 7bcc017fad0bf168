package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Relational operator coverage over the driver's TPC-H-ish tables
  * (SURVEY.md §2.2 checklist rows that the KG pipeline itself does not
  * exercise): filtered aggregation with pushdown, broadcast vs sort-merge
  * joins, semi/anti joins, ranking windows, rollup, set ops, JSON access,
  * range (interval) self-join, date math.
  *
  * Float-parity note: money aggregates go through DECIMAL (exact, engine
  * independent) and only the final value is cast to double — summation-order
  * float drift can never flip the DuckDB comparison.
  */
object Relational {

  private def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  private def dsum(c: String) =
    sum(col(c).cast("decimal(18,2)")).cast("double")

  def aggFilter(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem")
      .where(col("l_shipdate") < lit(java.sql.Timestamp.valueOf("1997-01-01 00:00:00")))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n"),
        dsum("l_quantity").as("sum_qty"),
        dsum("l_extendedprice").as("sum_price"),
        countDistinct(col("l_orderkey")).as("n_orders"))

  def joinBroadcast(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "orders")
      .join(broadcast(t(spark, dir, "customer")), col("o_custkey") === col("c_custkey"))
      .join(broadcast(t(spark, dir, "nation")), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(count(lit(1)).as("n_orders"), dsum("o_totalprice").as("sum_price"))

  def joinSortMerge(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "orders").hint("merge")
      .join(t(spark, dir, "lineitem"), col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n"), dsum("l_quantity").as("sum_qty"))

  def semiAnti(spark: SparkSession, dir: String): DataFrame = {
    val c = t(spark, dir, "customer")
    val o = t(spark, dir, "orders")
    val withO = c.join(o, col("c_custkey") === col("o_custkey"), "left_semi")
      .groupBy(col("c_mktsegment")).agg(count(lit(1)).as("n_with_orders"))
    val withoutO = c.join(o, col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy(col("c_mktsegment")).agg(count(lit(1)).as("n_without_orders"))
    withO.join(withoutO, Seq("c_mktsegment"), "full_outer")
      .select(col("c_mktsegment"),
        coalesce(col("n_with_orders"), lit(0L)).as("n_with_orders"),
        coalesce(col("n_without_orders"), lit(0L)).as("n_without_orders"))
  }

  def windowTopK(spark: SparkSession, dir: String, k: Int = 3): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    t(spark, dir, "orders")
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("o_custkey"), col("rank").cast("long").as("rank"), col("o_orderkey"))
  }

  def rollupStatus(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "orders")
      .rollup(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n"), dsum("o_totalprice").as("sum_price"))
      .select(coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
        coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
        col("n"), col("sum_price"))

  def setOps(spark: SparkSession, dir: String): DataFrame = {
    val c = t(spark, dir, "customer")
    val building = c.where(col("c_mktsegment") === "BUILDING").select(col("c_custkey"))
    val rich = c.where(col("c_acctbal") > 5000).select(col("c_custkey"))
    val nation3 = c.where(col("c_nationkey") === 3).select(col("c_custkey"))
    building.union(rich).distinct().except(nation3)
  }

  def jsonEvents(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "events")
      .withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("k")).as("sum_k"), max(col("k")).as("max_k"))

  /** Range/interval self-join: event pairs of the same user within 1 hour.
    * Equi on user_id + range residual — the heading-proximity join shape of
    * SURVEY.md §2.2.
    */
  def rangeJoin(spark: SparkSession, dir: String): DataFrame = {
    val e = t(spark, dir, "events")
      // ts is TIMESTAMP_NTZ in the parquet; session tz is UTC, so this cast
      // matches DuckDB's epoch_ms of the naive timestamp
      .select(col("user_id"), col("event_id"), unix_millis(col("ts").cast("timestamp")).as("ms"))
    e.as("x").join(e.as("y"),
        col("x.user_id") === col("y.user_id") &&
          col("x.event_id") < col("y.event_id") &&
          abs(col("x.ms") - col("y.ms")) <= 3600000L)
      .groupBy(col("x.user_id").as("user_id"))
      .agg(count(lit(1)).as("n_pairs"))
  }

  def dateMath(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "orders")
      .groupBy(date_format(col("o_orderdate"), "yyyy-MM").as("month"))
      .agg(count(lit(1)).as("n"), dsum("o_totalprice").as("sum_price"))
}
