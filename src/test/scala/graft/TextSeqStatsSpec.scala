package graft

import org.apache.spark.sql.functions._
import graft.operators.{LmFilter, Sessions, TimeSeries}

/** Round-15 batch B (SURVEY.md §2 #180-182, #185): Zipf fit, lexical
  * diversity, the session entry/exit matrix and CUSUM changepoint
  * alerts — reference recomputations in plain Scala plus
  * conservation checks against the operators they must agree with. */
class TextSeqStatsSpec extends SparkTestBase {
  import spark.implicits._

  private def tokens(text: String): Seq[String] =
    text.trim.toLowerCase.split("\\s+").filter(_.nonEmpty).toSeq

  test("zipf_fit matches a plain-Scala OLS over the ranked counts") {
    val docs = spark.read.parquet(s"$SfDir/documents.parquet")
      .select("lang", "text").as[(String, String)].collect()
    val out = LmFilter.zipfFit(spark, SfDir).collect()
      .map(r => r.getAs[String]("lang") -> r).toMap
    docs.groupBy(_._1).foreach { case (lang, ds) =>
      val counts = ds.flatMap(d => tokens(d._2))
        .groupBy(identity).view.mapValues(_.length.toLong).toMap
      val ranked = counts.toSeq
        .sortBy { case (tok, cnt) => (-cnt, tok) }
        .take(LmFilter.ZipfTopRanks.toInt)
      def q6(x: Double): Long = BigDecimal(x)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP)
        .bigDecimal.movePointRight(6).longValueExact()
      val xy = ranked.zipWithIndex.map { case ((_, cnt), i) =>
        (q6(math.log(i + 1.0)), q6(math.log(cnt.toDouble)))
      }
      val n = BigInt(xy.length)
      val sx = xy.map(p => BigInt(p._1)).sum
      val sy = xy.map(p => BigInt(p._2)).sum
      val sxy = xy.map(p => BigInt(p._1) * p._2).sum
      val sx2 = xy.map(p => BigInt(p._1) * p._1).sum
      val slope = BigDecimal((n * sxy - sx * sy).toDouble
        / (n * sx2 - sx * sx).toDouble)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      val r = out(lang)
      assert(r.getAs[Long]("n_tokens") === counts.values.sum, lang)
      assert(r.getAs[Long]("n_types") === counts.size.toLong, lang)
      assert(r.getAs[Double]("slope") === slope, lang)
      // sanity: frequency falls (weakly) with rank; r² well-formed.
      // (the synthetic sf0.001 corpus is near-flat in some languages,
      // so no lower bound on fit quality — the slope exactness above
      // is the real check)
      assert(r.getAs[Double]("slope") <= 0, lang)
      assert(r.getAs[Double]("r2") >= 0.0 && r.getAs[Double]("r2") <= 1.0,
        lang)
    }
  }

  test("lexical_diversity matches a per-doc recompute") {
    val docs = spark.read.parquet(s"$SfDir/documents.parquet")
      .select("doc_id", "text").as[(Long, String)].collect().toMap
    val out = LmFilter.lexicalDiversity(spark, SfDir).collect()
    assert(out.length === docs.count { case (_, t) => tokens(t).nonEmpty })
    out.take(50).foreach { r =>
      val tf = tokens(docs(r.getAs[Long]("doc_id")))
        .groupBy(identity).view.mapValues(_.length.toLong).toMap
      val nTok = tf.values.sum
      assert(r.getAs[Long]("n_tok") === nTok)
      assert(r.getAs[Long]("n_types") === tf.size.toLong)
      assert(r.getAs[Long]("hapax") === tf.values.count(_ == 1L).toLong)
      assert(r.getAs[Long]("ttr_ppm") === tf.size * 1000000L / nTok)
      val tf2 = tf.values.map(v => v * v).sum
      val k = BigDecimal(10000.0 * (tf2 - nTok) / (nTok.toDouble * nTok))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(r.getAs[Double]("yule_k") === k)
    }
  }

  test("LexStats kernel ≡ the built-in split+explode form on " +
    "adversarial whitespace/unicode inputs") {
    import org.apache.spark.sql.functions._
    // the contract: Java regex \s = the six ASCII whitespace bytes.
    // NBSP ( ), EM SPACE ( ) and IDEOGRAPHIC SPACE
    // (　) are Character.isWhitespace-ish but NOT \s — they must
    // JOIN tokens, not split them; multibyte tokens, case folding,
    // repeated tokens, tabs/CR/LF/VT/FF runs and boundary whitespace
    // all exercise the byte scanner against the Pattern split.
    val texts = Seq(
      "The the THE the",
      "a\tb\rc\ndef  g",
      "café CAFÉ naïve 世界 世界",
      "join ed em spaced wide　space",
      "  leading and trailing  ",
      "\t\n", "single", "")
    val df = texts.zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val kernel = df.select(col("doc_id"),
        graft.functions.TextFunctions.lexStats(col("text")).as("s"))
      .select(col("doc_id"), col("s.n_tok"), col("s.n_types"),
        col("s.hapax"), col("s.tf2"))
      .collect().map(_.toString).toSet
    val builtin = df.select(col("doc_id"),
        explode_outer(filter(split(lower(trim(col("text"))), "\\s+"),
          t => t =!= "")).as("tok"))
      // count(tok), not count(1): explode_outer's null row for an
      // empty doc must contribute tf 0, not a phantom token
      .groupBy("doc_id", "tok").agg(count(col("tok")).as("tf"))
      .groupBy("doc_id")
      .agg(coalesce(sum(col("tf")), lit(0L)).as("n_tok"),
        count(col("tok")).as("n_types"),
        coalesce(sum((col("tf") === 1L).cast("long")), lit(0L))
          .as("hapax"),
        coalesce(sum(col("tf") * col("tf")), lit(0L)).as("tf2"))
      .collect().map(_.toString).toSet
    assert(kernel === builtin)
  }

  test("session entry/exit matrix conserves the sessionize partition") {
    val matrix = Sessions.sessionEntryExit(spark, SfDir).collect()
    val sessions = Sessions.sessionize(spark, SfDir).collect()
    assert(matrix.map(_.getAs[Long]("n_sessions")).sum
      === sessions.length.toLong)
    assert(matrix.map(_.getAs[Long]("total_events")).sum
      === sessions.map(_.getAs[Long]("n_events")).sum)
    assert(matrix.map(_.getAs[Long]("n_bounces")).sum
      === sessions.count(_.getAs[Long]("n_events") == 1L).toLong)
    matrix.foreach { r =>
      assert(r.getAs[Long]("n_bounces") <= r.getAs[Long]("n_sessions"))
    }
  }

  test("cusum fold matches a plain-Scala recurrence") {
    val perDay = graft.sources.Tables.load(spark, SfDir, "events")
      .groupBy(col("user_id"),
        expr("unix_micros(ts) div 86400000000").as("day"))
      .agg(count(lit(1)).as("cnt"))
      .as[(Long, Long, Long)].collect()
      .groupBy(_._1).view
      .mapValues(_.map(t => (t._2, t._3)).sortBy(_._1)).toMap
    val out = TimeSeries.cusumAlerts(spark, SfDir).collect()
    assert(out.length === perDay.size)
    out.foreach { r =>
      val days = perDay(r.getAs[Long]("user_id"))
      val n = days.length.toLong
      val t = days.map(_._2).sum
      var s = 0L; var mx = 0L; var alerts = 0L
      var first: Option[Long] = None
      days.foreach { case (day, cnt) =>
        s = math.max(0L, s + (n * cnt - t) - t / 4)
        mx = math.max(mx, s)
        if (s > t) { alerts += 1; if (first.isEmpty) first = Some(day) }
      }
      assert(r.getAs[Long]("n_days") === n)
      assert(r.getAs[Long]("total") === t)
      assert(r.getAs[Long]("max_cusum") === mx)
      assert(r.getAs[Long]("n_alerts") === alerts)
      assert(Option(r.getAs[java.lang.Long]("first_alert_day"))
        .map(_.longValue) === first)
    }
  }
}
