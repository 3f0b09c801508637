package graft

import org.apache.spark.sql.functions._

import graft.operators.LmFilter
import graft.sources.Tables

/** Statistical quality gates (SURVEY §2 #152-#153): rule arithmetic
  * self-consistency, verdict precedence, and the bigram-count
  * identity tying the LM's denominator to the token stream. The
  * value-level gate is the DuckDB oracle (both queries hash-exact);
  * these specs pin the invariants the oracle can't see. */
class LmFilterSpec extends SparkTestBase {

  test("gopher_rules covers every document and verdicts are self-consistent") {
    val out = LmFilter.gopherRules(spark, SfDir).collect()
    val nDocs = Tables.load(spark, SfDir, "documents").count()
    assert(out.length.toLong === nDocs)
    out.foreach { r =>
      val nTok = r.getAs[Long]("n_tok")
      val sumLen = r.getAs[Long]("sum_len")
      val maxTf = r.getAs[Long]("max_tf")
      val nStop = r.getAs[Long]("n_stop")
      val expected =
        if (nTok < LmFilter.MinWords || nTok > LmFilter.MaxWords) "word_count"
        else if (sumLen < LmFilter.MinMeanLen * nTok ||
          sumLen > LmFilter.MaxMeanLen * nTok) "word_length"
        else if (nStop < LmFilter.MinStopHits) "stopword"
        else if (maxTf * LmFilter.RepMul > nTok) "repetition"
        else "kept"
      assert(r.getAs[String]("verdict") === expected,
        s"doc ${r.getAs[Long]("doc_id")}")
    }
    // the gate must discriminate: kept and at least one drop reason
    val verdicts = out.map(_.getAs[String]("verdict")).toSet
    assert(verdicts.contains("kept") && verdicts.size >= 2)
  }

  test("gopher_rules stats match an independent token recount") {
    val docs = Tables.load(spark, SfDir, "documents")
      .select(col("doc_id"), filter(
        split(lower(trim(col("text"))), "\\s+"), t => t =!= "").as("toks"))
      .select(col("doc_id"), size(col("toks")).as("n"),
        aggregate(col("toks"), lit(0L),
          (acc, t) => acc + length(t).cast("long")).as("chars"))
      .collect().map(r => r.getLong(0) -> (r.getInt(1).toLong, r.getLong(2)))
      .toMap
    LmFilter.gopherRules(spark, SfDir).collect().foreach { r =>
      val (n, chars) = docs(r.getAs[Long]("doc_id"))
      assert(r.getAs[Long]("n_tok") === n)
      assert(r.getAs[Long]("sum_len") === chars)
    }
  }

  test("lm_perplexity: n_big = n_tok - 1, scores bounded, gate consistent") {
    val nTok = LmFilter.gopherRules(spark, SfDir)
      .select("doc_id", "n_tok").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val out = LmFilter.lmPerplexity(spark, SfDir).collect()
    assert(out.length === nTok.size)
    out.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      assert(r.getAs[Long]("n_big") === nTok(id) - 1, s"doc $id")
      val nll = r.getAs[Double]("avg_nll")
      // add-one bigram NLL over a closed vocab: > 0 and < ln of a
      // generous vocab bound (no degenerate zero/overflow scores)
      assert(nll > 0.0 && nll < 20.0, s"doc $id nll=$nll")
      val kept = r.getAs[Int]("kept")
      assert((kept == 1) === (nll <= LmFilter.NllKeepMax), s"doc $id")
    }
  }

  test("lm_perplexity is invariant to input partitioning") {
    // exact decimal sums of 9 dp-quantized terms: any partition count
    // must yield identical rounded scores
    val a = LmFilter.lmPerplexity(spark, SfDir).collect()
      .map(r => (r.getLong(0), r.getDouble(2))).toMap
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    try {
      spark.conf.set("spark.sql.shuffle.partitions", "1")
      val b = LmFilter.lmPerplexity(spark, SfDir).collect()
        .map(r => (r.getLong(0), r.getDouble(2))).toMap
      assert(a === b)
    } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
  }

  test("lm_perplexity ships the model broadcast below the type gate") {
    // this corpus' bigram-type count is far under LmBroadcastMaxTypes,
    // so the scoring join must be a broadcast hash join — the
    // corpus-scale instance stream is scored inside its scan stage,
    // with no exchange carrying (w1, w2)
    val plan = planOf(LmFilter.lmPerplexity(spark, SfDir))
    assert(plan.contains("BroadcastHashJoin"),
      s"scoring join must broadcast the model:\n${plan.take(1500)}")
    val streamShuffles = plan.linesIterator.count(l =>
      l.contains("hashpartitioning") && l.contains("w1") &&
        l.contains("w2"))
    assert(streamShuffles === 0,
      s"no exchange may carry the bigram instance stream, got $streamShuffles")
  }
}
