package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch probe (round 7, deleted before round end): decompose the
  * per-query floor at bench SF into plan/schedule/scan/sort/collect
  * components. */
object FloorExp {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = graft.Bench.stage(spark, "/root/testdata/sf0.1", 8)

    def time(name: String)(f: => Unit): Unit = {
      f // warmup
      val ts = (1 to 7).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"[floor] $name%-34s min=${ts.min}%.3f med=${ts.sorted.apply(3)}%.3f")
    }

    time("range1_collect") { spark.range(1).collect() }
    time("range10M_agg") { spark.range(10000000L).agg(sum("id")).collect() }
    val cust = graft.sources.Tables.load(spark, dir, "customer")
    time("customer_scan_collect") { cust.collect() }
    time("customer_scan_sort_collect") { cust.orderBy("c_custkey").collect() }
    time("customer_groupby") {
      cust.groupBy("c_mktsegment").count().collect() }
    time("customer_groupby_sort") {
      cust.groupBy("c_mktsegment").count().orderBy("c_mktsegment").collect() }
    val ev = graft.sources.Tables.load(spark, dir, "events")
    time("events_scan_count") { ev.count() }
    time("events_groupby_sort") {
      ev.groupBy("event_type").count().orderBy("event_type").collect() }
    // plan-only cost: fresh DataFrame construction + analysis
    time("plan_only_1000") {
      (1 to 1000).foreach { _ =>
        cust.groupBy("c_mktsegment").count().orderBy("c_mktsegment")
          .queryExecution.executedPlan
      }
    }
    spark.stop()
  }
}
