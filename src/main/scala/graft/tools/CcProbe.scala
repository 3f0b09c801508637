package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Scratch probe: where does dedup_components spend its time —
  * edge materialization, per-round shuffles, or round count? */
object CcProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val runDir = graft.Bench.stage(spark, sfDir, 8)
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[ccprobe] $label: ${(System.nanoTime() - t0) / 1e9}%.3f s"); r
    }
    (1 to 2).foreach { rep =>
      println(s"=== rep $rep")
      val docs = graft.sources.Tables.load(spark, runDir, "documents")
      val edges = graft.operators.Dedup.ngramJaccardPairs(docs)
        .filter(col("jac") >= 0.5).select("a", "b")
      val nodes = docs.select(col("doc_id").as("id"))
      val sym = edges.select(col("a").as("src"), col("b").as("dst"))
        .union(edges.select(col("b").as("src"), col("a").as("dst")))
        .union(nodes.select(col("id").as("src"), col("id").as("dst")))
        .persist(StorageLevel.MEMORY_AND_DISK)
      t("edge materialize")(sym.count())
      var labels = t("init checkpoint")(
        nodes.select(col("id"), col("id").as("comp")).localCheckpoint())
      def labelSum(df: org.apache.spark.sql.DataFrame) =
        df.agg(sum(col("comp").cast("decimal(38,0)"))).head.getDecimal(0)
      var prev = t("init sum")(labelSum(labels))
      var done = false; var it = 0
      while (!done && it < 25) {
        val stepped = t(s"r$it step")(
          sym.join(labels.withColumnRenamed("id", "src"), "src")
            .groupBy(col("dst").as("id")).agg(min(col("comp")).as("comp"))
            .localCheckpoint())
        val next = (1 to 2).foldLeft(stepped) { (cur, j) =>
          t(s"r$it jump$j")(
            cur.join(cur.select(col("id").as("cid"), col("comp").as("ccomp")),
                col("comp") === col("cid"))
              .select(col("id"), least(col("comp"), col("ccomp")).as("comp"))
              .localCheckpoint())
        }
        val cur = t(s"r$it sum")(labelSum(next))
        done = cur.compareTo(prev) == 0
        prev = cur; labels = next; it += 1
      }
      println(s"[ccprobe] rounds = $it")
      t("final join+collect") {
        val sizes = labels.groupBy("comp").agg(count(lit(1)).as("comp_size"))
        labels.join(sizes, "comp").orderBy("id").collect().length
      }
      sym.unpersist()
    }
    spark.stop()
  }
}
