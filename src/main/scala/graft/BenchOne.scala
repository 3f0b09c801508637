package graft

import org.apache.spark.sql.SparkSession

/** Profiling harness for a single query (or a few): repeats each named
  * SparkEntry query after a warmup and prints per-iteration wall
  * times, so a Bench outlier can be separated into plan cost vs
  * co-tenant noise. Usage:
  *   SPARK_GRAFT_SF_DIR=... runMain graft.BenchOne <query> [query ...]
  */
object BenchOne {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "5").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    args.foreach { name =>
      val fn = SparkEntry.queries(name)
      fn(spark, sfDir).collect() // warmup
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).collect() // full result, like Bench and the DuckDB fetchall
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[benchone] $name reps=${times.map(t => f"$t%.3f").mkString(",")} min=${times.min}%.3f")
    }
    spark.stop()
  }
}
