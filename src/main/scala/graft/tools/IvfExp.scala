package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators.Similarity

/** Scratch experiment (round 7, deleted before round end): IVF recall
  * with the tuned defaults across all three SF corpora. */
object IvfExp {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01",
        "/root/testdata/sf0.1")) {
      val brute = Similarity.annBrute(spark, dir)
        .select("q_id", "cand_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      def recall(df: DataFrame): Double = {
        val got = df.select("q_id", "cand_id").collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSet
        (brute intersect got).size.toDouble / brute.size
      }
      println(f"[ivfexp] $dir tuned-default recall=${recall(Similarity.annIvf(spark, dir))}%.3f")
    }
    spark.stop()
  }
}
