package graft

import graft.operators.TextOps
import graft.sources.Tables

/** Reference-implementation checks for the chunking / repetition /
  * decontamination operators (SURVEY.md §2 #69-71): recompute each
  * result in plain Scala from the raw corpus and compare exactly —
  * an oracle independent of both Spark SQL and DuckDB. */
class TextPipelineSpec extends SparkTestBase {

  private def toks(s: String): Vector[String] =
    s.trim.toLowerCase.split("\\s+").filter(_.nonEmpty).toVector

  private lazy val docs: Seq[(Long, String)] =
    Tables.load(spark, SfDir, "documents").select("doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq

  test("chunk_docs matches a plain-Scala reference chunker") {
    val expected = docs.flatMap { case (id, text) =>
      val t = toks(text)
      if (t.isEmpty) Nil
      else {
        val n = math.ceil(math.max(t.size - TextOps.ChunkOverlap, 1) /
          (TextOps.ChunkTokens - TextOps.ChunkOverlap).toDouble).toInt
        (0 until n).map { ci =>
          val start = ci * (TextOps.ChunkTokens - TextOps.ChunkOverlap)
          (id, ci.toLong,
            math.min(t.size - start, TextOps.ChunkTokens).toLong,
            t.slice(start, start + TextOps.ChunkTokens).mkString(" "))
        }
      }
    }.sorted
    val got = TextOps.chunkDocs(spark, SfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
      .toSeq.sorted
    assert(got === expected)
    assert(got.nonEmpty)
    // overlap invariant: consecutive chunks of a doc share their
    // boundary tokens
    got.groupBy(_._1).values.filter(_.size > 1).foreach { cs =>
      cs.sortBy(_._2).sliding(2).foreach { case Seq(a, b) =>
        val at = a._4.split(" ").toSeq
        val bt = b._4.split(" ").toSeq
        assert(at.takeRight(TextOps.ChunkOverlap) ===
          bt.take(TextOps.ChunkOverlap), s"doc ${a._1} overlap broken")
      }
    }
  }

  test("repetition_score matches a plain-Scala reference") {
    val expected = docs.map { case (id, text) =>
      val t = toks(text)
      val tg = if (t.size < 3) Vector.empty[String]
        else (0 to t.size - 3).map(i => t.slice(i, i + 3).mkString(" "))
      val nDup = (tg.size - tg.distinct.size).toLong
      val ratio = if (tg.nonEmpty) nDup.toDouble / tg.size else 0.0
      (id, tg.size.toLong, nDup, ratio)
    }.sorted
    val got = TextOps.repetitionScore(spark, SfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toSeq.sorted
    assert(got === expected)
  }

  test("corpus_stats: one scan, one kernel evaluation each, sane totals") {
    val df = TextOps.corpusStats(spark, SfDir)
    val plan = planOf(df)
    // each scan appears twice in formatted plans (tree + detail)
    assert("\\(\\d+\\) Scan parquet".r.findAllIn(plan).size === 1,
      "must be ONE scan")
    assert("sentimentcounts\\(".r.findAllIn(plan).size === 1)
    assert(plan.contains("partial_count"), "aggregate must be partial (map-side)")
    val rows = df.collect()
    assert(rows.map(_.getLong(2)).sum === docs.size, "n_docs must cover corpus")
    val expTokens = docs.map(d => toks(d._2).size.toLong).sum
    assert(rows.map(_.getLong(3)).sum === expTokens, "token totals disagree")
  }

  test("contamination matches a plain-Scala reference") {
    def shingles(t: Vector[String]): Set[String] =
      if (t.size < TextOps.ShingleWidth) Set.empty
      else (0 to t.size - TextOps.ShingleWidth)
        .map(i => t.slice(i, i + TextOps.ShingleWidth).mkString(" ")).toSet
    val bench = docs.filter(_._1 < TextOps.BenchDocMax)
      .flatMap(d => shingles(toks(d._2))).toSet
    val expected = docs.filter(_._1 >= TextOps.BenchDocMax)
      .map(d => (d._1, shingles(toks(d._2)).count(bench.contains).toLong))
      .filter(_._2 > 0).sorted
    val got = TextOps.contaminationCheck(spark, SfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
    assert(got === expected)
    assert(got.forall(_._1 >= TextOps.BenchDocMax))
  }
}
