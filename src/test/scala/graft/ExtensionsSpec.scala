package graft

import org.apache.spark.sql.functions._
import graft.operators.Skew
import graft.sources.{CsvIngest, Tables}

/** SQL function registration, salted aggregation, and CSV ingest
  * (SURVEY.md §2 #32-33 + the SQL surface). */
class ExtensionsSpec extends SparkTestBase {
  import spark.implicits._

  test("registered SQL functions evaluate like the Column API") {
    GraftFunctions.register(spark)
    Seq((Seq(1.0, 2.0), Seq(2.0, 4.0), "hello world"))
      .toDF("a", "b", "s").createOrReplaceTempView("ext_t")
    val r = spark.sql(
      """SELECT cosine_sim(a, b) AS c, dot_product(a, b) AS d,
        |  fnv64(s) AS f, simhash64(s) AS sh,
        |  size(minhash_sig(s, 8, 2)) AS mk,
        |  size(char_ngrams(s, 3)) AS ng
        |FROM ext_t""".stripMargin).collect()(0)
    assert(math.abs(r.getDouble(0) - 1.0) < 1e-12)
    assert(r.getDouble(1) === 10.0)
    val viaColumnApi = Seq("hello world").toDF("s")
      .select(graft.functions.VectorFunctions.fnv64(col("s")))
      .as[Long].collect()(0)
    assert(r.getLong(2) === viaColumnApi)
    assert(r.getInt(4) === 8)
    assert(r.getInt(5) === 9) // "hello world" has 9 distinct trigrams
  }

  test("salted aggregate is bit-identical to the direct aggregate") {
    val ev = Tables.load(spark, SfDir, "events")
    val direct = ev.groupBy("event_type")
      .agg(count(lit(1)).as("n_events"),
        graft.operators.Num.dsum(col("value")).as("sum_value"))
      .orderBy("event_type").collect().toSeq
    val salted = Skew.skewAgg(spark, SfDir).collect().toSeq
    assert(salted === direct)
  }

  test("csv ingest quarantines corrupt rows instead of dropping silently") {
    val dir = java.nio.file.Files.createTempDirectory("graft_csv_bad").toString
    val lines = Seq(
      "event_id,ts,user_id,event_type,value",
      "1,2024-01-01 00:00:00.000001,10,click,1.5",
      "oops,not,a,valid,row,extra",
      "2,2024-01-02 03:04:05.123456,11,purchase,2.5")
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "part.csv"),
      String.join("\n", lines: _*).getBytes)
    val batch = CsvIngest.readEvents(spark, dir)
    assert(batch.clean.count() === 2)
    assert(batch.quarantined.select("event_id", "_corrupt")
      .collect().length === 1)
    val ts = batch.clean.orderBy("event_id").select("ts").collect()
    assert(ts(0).getTimestamp(0).toString === "2024-01-01 00:00:00.000001")
    batch.release()
  }
}
