package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val p = "/root/testdata/sf0.1/lineitem.parquet"
    def q1(paths: Seq[String]) = spark.read
      .schema(graft.sources.Tables.lineitem).parquet(paths: _*)
      .filter(col("l_shipdate") <= lit("1998-09-02 00:00:00"))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(graft.operators.Num.dsum(col("l_quantity")).as("sq"),
        count(lit(1)).as("n"))
    for (mult <- Seq(1, 10, 50)) {
      val paths = Seq.fill(mult)(p)
      q1(paths).collect() // warmup
      val t0 = System.nanoTime(); q1(paths).collect()
      val t = (System.nanoTime() - t0) / 1e9
      println(f"SCALE $mult%3dx (${mult * 600}%5dk rows): $t%7.3f s")
    }
    spark.stop()
  }
}
