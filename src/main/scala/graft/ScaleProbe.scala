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
    // fact⋈dim join + group + top-k (the topk_revenue shape)
    def topk(paths: Seq[String]) = {
      val ord = graft.sources.Tables.load(spark, "/root/testdata/sf0.1",
        "orders").select("o_orderkey", "o_custkey")
      spark.read.schema(graft.sources.Tables.lineitem).parquet(paths: _*)
        .select(col("l_orderkey"),
          (col("l_extendedprice") * (lit(1d) - col("l_discount")))
            .cast(graft.operators.Num.Dec).as("rev"))
        .join(ord, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_custkey").as("cust_id"))
        .agg(sum(col("rev")).cast("double").as("revenue"))
        .orderBy(col("revenue").desc, col("cust_id").asc).limit(10)
    }
    for (mult <- Seq(1, 10, 50)) {
      val paths = Seq.fill(mult)(p)
      q1(paths).collect() // warmup
      val t0 = System.nanoTime(); q1(paths).collect()
      val t = (System.nanoTime() - t0) / 1e9
      topk(paths).collect() // warmup
      val t1 = System.nanoTime(); topk(paths).collect()
      val tj = (System.nanoTime() - t1) / 1e9
      println(f"SCALE $mult%3dx (${mult * 600}%5dk rows): agg $t%7.3f s  join-topk $tj%7.3f s")
    }
    // minhash-LSH near-dup at N× corpus size, worst-case duplication
    // structure: every doc gains N-1 exact copies (distinct ids), so
    // candidate volume grows ~N² per bucket — the stress regime the
    // BucketCap + banded design must survive
    val docs = graft.sources.Tables
      .load(spark, "/root/testdata/sf0.1", "documents")
      .select(col("doc_id"), col("text"))
    for (mult <- Seq(1, 5, 20)) {
      val big = (0 until mult).map(i =>
        docs.select((col("doc_id") + lit(i * 10000000L)).as("doc_id"),
          col("text"))).reduce(_ unionByName _)
      val t0 = System.nanoTime()
      val n = graft.operators.Dedup.minhashPairs(big)
        .filter(col("est_jaccard") >= 0.9).count()
      val t = (System.nanoTime() - t0) / 1e9
      println(f"SCALE-DEDUP $mult%3dx (${mult * 5}%3dk docs): $t%7.3f s, $n%9d near-dup pairs")
    }
    // decontamination at N× corpus size: the benchmark side stays
    // fixed (an eval suite is bounded), the corpus side multiplies —
    // shingle-hash explode + broadcast join should scale linearly in
    // corpus rows with a constant benchmark set
    for (mult <- Seq(1, 5, 20)) {
      val big = (0 until mult).map(i =>
        docs.select((col("doc_id") + lit(i * 10000000L) + lit(graft.operators.TextOps.BenchDocMax)).as("doc_id"),
          col("text"))).reduce(_ unionByName _)
      val bench = docs.filter(col("doc_id") < graft.operators.TextOps.BenchDocMax)
        .select(graft.functions.TextFunctions
          .shingleHashes(col("text"), graft.operators.TextOps.ShingleWidth).as("hs"))
        .select(explode(col("hs")).as("sh")).distinct()
      def run(): Long = big
        .select(col("doc_id"), explode(graft.functions.TextFunctions
          .shingleHashes(col("text"), graft.operators.TextOps.ShingleWidth)).as("sh"))
        .join(broadcast(bench), "sh")
        .groupBy("doc_id").count().count()
      run() // warmup
      val t0 = System.nanoTime(); val n = run()
      val t = (System.nanoTime() - t0) / 1e9
      println(f"SCALE-CONTAM $mult%3dx (${mult * 5}%3dk docs): $t%7.3f s, $n%6d contaminated docs")
    }
    spark.stop()
  }
}
