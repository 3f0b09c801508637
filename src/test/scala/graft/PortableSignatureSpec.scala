package graft

import org.apache.spark.sql.functions._

import graft.functions.TextFunctions
import graft.operators.Dedup

/** Portable-hash signature tests (SURVEY.md §2 #20-21, round 11):
  * the single-pass kernels must be BIT-IDENTICAL to the SQL-built
  * forms the DuckDB oracle mirrors, and the estimates they feed must
  * track exact Jaccard. */
class PortableSignatureSpec extends SparkTestBase {
  import spark.implicits._

  private def docs = graft.sources.Tables.load(spark, SfDir, "documents")

  test("portable minhash kernel == SQL-built signatures, every doc") {
    val viaKernel = docs.filter(col("text").isNotNull)
      .select(col("doc_id"),
        TextFunctions.portableMinhashSig(col("text"), Dedup.PortableK)
          .as("sig"))
      .filter(size(col("sig")) === Dedup.PortableK)
    val viaSql = Dedup.minhashPortableSigsSql(docs)
    assert(viaKernel.count() === viaSql.count())
    assert(viaKernel.join(viaSql.withColumnRenamed("sig", "sig2"), "doc_id")
      .filter(col("sig") =!= col("sig2")).count() === 0L,
      "kernel and SQL-built minhash signatures must agree bit-for-bit")
  }

  test("portable simhash kernel == SQL-built signatures, every doc") {
    val viaKernel = docs
      .select(col("doc_id"),
        TextFunctions.portableSimhash32(col("text")).as("sig"))
      .filter(col("sig").isNotNull)
    val viaSql = Dedup.simhashPortableSigsSql(docs)
    assert(viaKernel.count() === viaSql.count())
    assert(viaKernel.join(viaSql.withColumnRenamed("sig", "sig2"), "doc_id")
      .filter(col("sig") =!= col("sig2")).count() === 0L,
      "kernel and SQL-built simhash signatures must agree bit-for-bit")
  }

  test("portable hash edge semantics: trim/split/empty mirror the SQL form") {
    // SQL trim strips spaces only; tabs/newlines are split boundaries
    val rows = Seq(
      (1L, "  Hello  World  "),
      (2L, "\tHello\nWorld\t"),
      (3L, "one-token"),
      (4L, "   "),
      (5L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val mh = rows.select(col("doc_id"),
      TextFunctions.portableMinhashSig(col("text"), 4).as("sig"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) null else r.getSeq[Long](1))).toMap
    assert(mh(1L).length === 4, "two tokens make a shingle")
    assert(mh(1L) === mh(2L), "whitespace class and case fold identically")
    assert(mh(3L).isEmpty, "one token: no 2-shingle")
    assert(mh(4L).isEmpty, "whitespace-only: no tokens")
    assert(mh(5L) === null, "null text stays null")
    val sh = rows.select(col("doc_id"),
      TextFunctions.portableSimhash32(col("text")).as("sig"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) null else java.lang.Long.valueOf(r.getLong(1))))
      .toMap
    assert(sh(1L) === sh(2L))
    assert(sh(3L) !== null, "single token still simhashes")
    assert(sh(4L) === null, "no tokens: NULL, like the SQL group dropout")
    assert(sh(5L) === null)
  }

  test("portable minhash estimates track exact 2-shingle Jaccard") {
    val pairs = Dedup.minhashLshPortable(spark, SfDir).limit(20).collect()
    assert(pairs.nonEmpty, "corpus has planted near-dups")
    val texts = docs.filter(col("text").isNotNull)
      .select("doc_id", "text").as[(Long, String)].collect().toMap
    def shingles(s: String): Set[String] = {
      val t = s.toLowerCase.trim.split("\\s+").filter(_.nonEmpty)
      t.sliding(2).filter(_.length == 2).map(_.mkString(" ")).toSet
    }
    pairs.foreach { r =>
      val (a, b) = (r.getAs[Long]("a"), r.getAs[Long]("b"))
      val est = r.getAs[Double]("est_jaccard")
      val (sa, sb) = (shingles(texts(a)), shingles(texts(b)))
      val exact = sa.intersect(sb).size.toDouble / sa.union(sb).size
      // K=16 hashes: σ = sqrt(j(1-j)/16) ≤ 0.125; allow 3σ
      assert(math.abs(est - exact) <= 0.38,
        s"pair ($a,$b): est $est vs exact $exact")
    }
  }

  test("portable sign-band kernel == SQL-built keys, every vector") {
    import org.apache.spark.sql.types.{ArrayType, DoubleType}
    val bands = 8; val bits = 5; val dim = 64
    val e = graft.sources.Tables.load(spark, SfDir, "embeddings")
      .select(col("vec_id"),
        col("embedding").cast(ArrayType(DoubleType)).as("v"))
    val viaKernel = e.select(col("vec_id"),
        posexplode(graft.functions.VectorFunctions
          .portableSignBandKeys(col("v"), bands, bits, dim)))
      .select(col("vec_id"), col("pos").as("band"), col("col").as("kb"))
    // the SQL form the DuckDB oracle mirrors: md5-derived integer
    // planes, floor(x*1e6+0.5) quantization, integer dots
    val planes = spark.range(bands * bits).select(col("id").as("p"))
      .crossJoin(spark.range(dim).select(col("id").as("j")))
      .select(col("p"), col("j"),
        (conv(substring(md5(concat(lit("hp|"), col("p").cast("string"),
          lit("|"), col("j").cast("string"))), 25, 8), 16, 10)
          .cast("long") - 2147483648L).as("w"))
    val qc = e.select(col("vec_id"), posexplode(col("v")))
      .select(col("vec_id"), col("pos").cast("long").as("j"),
        floor(col("col") * lit(1e6) + lit(0.5)).cast("long").as("qc"))
    val dots = qc.join(planes, "j")
      .groupBy("vec_id", "p").agg(sum(col("qc") * col("w")).as("dot"))
    val viaSql = dots
      .groupBy(col("vec_id"), expr(s"p div $bits").as("band"))
      .agg(expr(s"sum(CASE WHEN dot > 0 THEN shiftleft(1L, " +
        s"cast(p % $bits AS int)) ELSE 0L END)").as("kb"))
    assert(viaKernel.count() === 500L * bands)
    // both sides must be TOTAL (ADVICE r13): an inner join alone
    // would pass if the SQL derivation silently dropped (vec_id,
    // band) rows — equal cardinality + zero inner-join mismatches
    // together pin full bijective agreement
    assert(viaSql.count() === 500L * bands)
    assert(viaKernel.join(viaSql.withColumnRenamed("kb", "kb2"),
        Seq("vec_id", "band"))
      .filter(col("kb") =!= col("kb2")).count() === 0L,
      "kernel and SQL-built band keys must agree bit-for-bit")
  }
}
