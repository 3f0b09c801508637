package graft

import org.apache.spark.sql.functions._
import graft.functions.expressions.BloomFilter

/** Bloom sketch tests (SURVEY.md §2 #83): the no-false-negative
  * guarantee, the false-positive rate against the formula, OR-merge
  * associativity, the SQL surface, and the accelerated
  * decontamination's answer-identity. */
class BloomSpec extends SparkTestBase {
  import spark.implicits._

  private val rnd = new scala.util.Random(7)

  test("no false negatives; FP rate tracks the formula") {
    val bits = BloomFilter.normalizeBits(1 << 16)
    val k = 5
    val n = 2000
    val inserted = Seq.fill(n)(rnd.nextLong()).distinct
    val buf = new Array[Long](bits / 64)
    inserted.foreach(x => BloomFilter.set(buf, k, x))
    val ser = BloomFilter.serialize(buf, k)
    assert(inserted.forall(BloomFilter.mightContain(ser, _)),
      "every inserted key must probe true")
    val absent = Seq.fill(20000)(rnd.nextLong())
      .filterNot(inserted.contains)
    val fp = absent.count(BloomFilter.mightContain(ser, _)).toDouble /
      absent.size
    val expected = math.pow(1 - math.exp(-k.toDouble * n / bits), k)
    info(f"fp=$fp%.5f expected=$expected%.5f")
    assert(fp <= math.max(3 * expected, 0.01), s"FP rate $fp too high")
  }

  test("OR-merge of partial filters equals the single build") {
    val bits = 1 << 10; val k = 3
    val xs = Seq.fill(500)(rnd.nextLong())
    val full = new Array[Long](bits / 64)
    xs.foreach(BloomFilter.set(full, k, _))
    val (l, r) = xs.splitAt(xs.size / 2)
    val a = new Array[Long](bits / 64); l.foreach(BloomFilter.set(a, k, _))
    val b = new Array[Long](bits / 64); r.foreach(BloomFilter.set(b, k, _))
    val merged = a.zip(b).map { case (x, y) => x | y }
    assert(merged.sameElements(full), "merge must equal the one-pass build")
  }

  test("bloom_agg / bloom_might_contain on the SQL surface") {
    GraftFunctions.register(spark)
    Seq(1L, 2L, 3L).toDF("h").createOrReplaceTempView("bloom_in")
    val bf = spark.sql(
      "SELECT bloom_agg(h, 1024, 3) AS bf FROM bloom_in")
    bf.createOrReplaceTempView("bloom_built")
    val got = spark.sql(
      """SELECT h, bloom_might_contain((SELECT bf FROM bloom_built), h) AS m
        |FROM VALUES (1L), (2L), (3L) AS t(h)""".stripMargin)
      .as[(Long, Boolean)].collect().toMap
    assert(got == Map(1L -> true, 2L -> true, 3L -> true))
  }

  test("bloom-prefiltered contamination equals the exact operator") {
    val exact = graft.operators.TextOps.contaminationCheck(spark, SfDir)
      .as[(Long, Long)].collect().toSeq
    val bloom = graft.operators.TextOps.contaminationBloom(spark, SfDir)
      .as[(Long, Long)].collect().toSeq
    assert(bloom == exact, "sketch acceleration must not change answers")
    assert(exact.nonEmpty, "test corpus must have contaminated docs")
  }

  test("design-regime contamination: bloom path answer-identical, no broadcast of the reference side") {
    val exact = graft.operators.TextOps
      .contaminationAtScale(spark, SfDir, useBloom = false)
    val bloom = graft.operators.TextOps
      .contaminationAtScale(spark, SfDir, useBloom = true)
    val e = exact.as[(Long, Long)].collect().toSeq
    val b = bloom.as[(Long, Long)].collect().toSeq
    assert(b == e, "bloom prefilter must not change answers")
    assert(e.nonEmpty, "the half-corpus reference must hit something")
    // the reference-side join must be a SHUFFLE join in BOTH variants
    // (at 100 TB that side cannot broadcast — that is the regime);
    // the only broadcast allowed in the bloom plan is the 8 MiB filter
    def planOf(df: org.apache.spark.sql.DataFrame): String =
      df.queryExecution.executedPlan.toString
    val exactPlan = planOf(exact)
    assert(exactPlan.contains("ShuffledHashJoin"),
      "exact variant must shuffle the reference join")
    val bloomPlan = planOf(bloom)
    assert(bloomPlan.contains("ShuffledHashJoin"),
      "bloom variant's verification join must shuffle too")
    val bcastJoins = "BroadcastHashJoin".r
      .findAllIn(bloomPlan.replace("BroadcastNestedLoopJoin", "BNLJ"))
      .size
    assert(bcastJoins === 0,
      s"reference side must never broadcast-hash-join, found $bcastJoins")
  }
}
