package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.Num
import graft.sources.Tables

/** Scratch experiment for round 7 (deleted before round end):
  * fin_statement plan variants × input layouts. */
object FinExp {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"

    // staged multi-file copies
    val stage = "/tmp/finexp_stage"
    val li8 = s"$stage/lineitem8"
    val ord8 = s"$stage/orders8"
    if (!new java.io.File(li8).exists()) {
      Tables.load(spark, dir, "lineitem").repartition(8)
        .write.mode("overwrite").parquet(li8)
      Tables.load(spark, dir, "orders").repartition(8)
        .write.mode("overwrite").parquet(ord8)
    }
    def liOf(staged: Boolean) =
      if (staged) spark.read.schema(Tables.lineitem).parquet(li8)
      else Tables.load(spark, dir, "lineitem")
    def ordOf(staged: Boolean) =
      if (staged) spark.read.schema(Tables.orders).parquet(ord8)
      else Tables.load(spark, dir, "orders")

    // A: current pre-agg form
    def vA(staged: Boolean): DataFrame = {
      val liAgg = liOf(staged).groupBy("l_orderkey").agg(
        sum((col("l_extendedprice") * (lit(1d) - col("l_discount")))
          .cast(Num.Dec)).as("rev_part"),
        sum((col("l_extendedprice") * col("l_tax")).cast(Num.Dec)).as("tax_part"),
        sum(col("l_quantity").cast(Num.Dec)).as("qty_part"),
        count(lit(1)).as("line_part"))
      liAgg.join(ordOf(staged), col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_custkey").as("ticker_id"))
        .agg(sum(col("rev_part")).cast("double").as("total_revenue"),
          sum(col("tax_part")).cast("double").as("total_tax"),
          sum(col("qty_part")).cast("double").as("total_qty"),
          sum(col("line_part")).as("line_cnt"),
          count(lit(1)).as("order_cnt"))
        .orderBy("ticker_id")
    }

    // B: direct join + one agg with distinct order count
    def vB(staged: Boolean): DataFrame =
      liOf(staged)
        .join(ordOf(staged), col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_custkey").as("ticker_id"))
        .agg(sum((col("l_extendedprice") * (lit(1d) - col("l_discount")))
            .cast(Num.Dec)).cast("double").as("total_revenue"),
          sum((col("l_extendedprice") * col("l_tax")).cast(Num.Dec))
            .cast("double").as("total_tax"),
          sum(col("l_quantity").cast(Num.Dec)).cast("double").as("total_qty"),
          count(lit(1)).as("line_cnt"),
          countDistinct(col("o_orderkey")).as("order_cnt"))
        .orderBy("ticker_id")

    // C: pre-agg with an explicit repartition to parallelize the
    // partial aggregation when the scan is a single row group
    def vC(staged: Boolean): DataFrame = {
      val liAgg = liOf(staged).repartition(32, col("l_orderkey"))
        .groupBy("l_orderkey").agg(
          sum((col("l_extendedprice") * (lit(1d) - col("l_discount")))
            .cast(Num.Dec)).as("rev_part"),
          sum((col("l_extendedprice") * col("l_tax")).cast(Num.Dec)).as("tax_part"),
          sum(col("l_quantity").cast(Num.Dec)).as("qty_part"),
          count(lit(1)).as("line_part"))
      liAgg.join(ordOf(staged), col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_custkey").as("ticker_id"))
        .agg(sum(col("rev_part")).cast("double").as("total_revenue"),
          sum(col("tax_part")).cast("double").as("total_tax"),
          sum(col("qty_part")).cast("double").as("total_qty"),
          sum(col("line_part")).as("line_cnt"),
          count(lit(1)).as("order_cnt"))
        .orderBy("ticker_id")
    }

    def time(name: String, f: => DataFrame): Unit = {
      f.collect() // warmup
      val ts = (1 to 5).map { _ =>
        val t0 = System.nanoTime(); f.collect(); (System.nanoTime() - t0) / 1e9
      }
      println(f"[finexp] $name min=${ts.min}%.3f reps=${ts.map(t => f"$t%.3f").mkString(",")}")
    }

    for (staged <- Seq(false, true)) {
      val tag = if (staged) "staged8" else "single "
      time(s"A-preagg   $tag", vA(staged))
      time(s"B-direct   $tag", vB(staged))
      time(s"C-repart   $tag", vC(staged))
    }
    // sanity: same results
    val a = vA(false).collect().map(_.toString).toSeq
    val b = vB(false).collect().map(_.toString).toSeq
    println(s"[finexp] A==B: ${a == b} (${a.length} rows)")
    spark.stop()
  }
}
