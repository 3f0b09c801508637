package graft

import org.apache.spark.sql.functions._
import graft.functions.expressions.BpeTokenCount
import graft.operators.{Bpe, Packing}

/** Learned-BPE tokenizer tests (SURVEY.md §2 #106): the kernel encode
  * against an independent reference implementation, training-loop
  * invariants, and the packing composition. */
class BpeSpec extends SparkTestBase {
  import spark.implicits._

  /** Independent reference encode: functional, list-based — repeatedly
    * applies the single lowest-rank pair present until fixpoint. */
  private def refEncode(word: List[Int], merges: Seq[Long]): List[Int] = {
    val rank = merges.zipWithIndex.toMap
    def step(w: List[Int]): Option[List[Int]] = {
      val present = w.zip(w.tail).map { case (a, b) =>
        BpeTokenCount.pack(a, b)
      }.filter(rank.contains)
      if (present.isEmpty) None
      else {
        val best = present.minBy(rank)
        val id = 256 + rank(best)
        val a = (best >> 32).toInt
        val b = (best & 0xffffffffL).toInt
        def fuse(xs: List[Int]): List[Int] = xs match {
          case x :: y :: rest if x == a && y == b => id :: fuse(rest)
          case x :: rest => x :: fuse(rest)
          case Nil => Nil
        }
        Some(fuse(w))
      }
    }
    Iterator.iterate(Option(word))(_.flatMap(step))
      .takeWhile(_.isDefined).map(_.get).reduceLeft((_, b) => b)
  }

  private def refCount(text: String, merges: Seq[Long]): Long =
    Bpe.pretokens(text.getBytes("UTF-8"))
      .map(w => refEncode(w.toList, merges).length.toLong).sum

  test("kernel encode equals the reference encoder on random strings") {
    val merges = Bpe.trainedMerges(spark, SfDir)
    assert(merges.nonEmpty)
    val rnd = new scala.util.Random(7)
    val alphabets = Seq("ab", "abc ", "the quick brown fox., ",
      "aaaaab ", "0123 abc !?")
    val samples = (1 to 200).map { i =>
      val al = alphabets(i % alphabets.size)
      (1 to (1 + rnd.nextInt(40))).map(_ => al(rnd.nextInt(al.length)))
        .mkString
    } ++ Seq("", " ", "   ", "日本語 テスト", "a", "ab ab ab")
    val ranks = BpeTokenCount.rankMap(merges)
    samples.foreach { s =>
      val got = BpeTokenCount.count(
        org.apache.spark.unsafe.types.UTF8String.fromString(s), ranks)
      val want = refCount(s, merges)
      assert(got === want, s"mismatch on '$s'")
    }
  }

  /** Independent reference TRAINER (SURVEY §6 oracle endgame): plain
    * functional Scala — its own whitespace pretokenizer, tuple-keyed
    * pair counting, lexicographic tie-break, recursive rewrite.
    * Shares nothing with Bpe.train but the published Sennrich
    * algorithm. */
  private def refTrain(docs: Seq[Array[Byte]], n: Int): Seq[(Int, Int)] = {
    def isWs(b: Int) = b == ' ' || b == '\t' || b == '\n' ||
      b == 0x0B || b == '\f' || b == '\r'
    def splitTokens(xs: List[Int]): List[List[Int]] = {
      val rest = xs.dropWhile(isWs)
      if (rest.isEmpty) Nil
      else {
        val (tok, tail) = rest.span(x => !isWs(x))
        tok :: splitTokens(tail)
      }
    }
    var words: List[List[Int]] =
      docs.toList.flatMap(d => splitTokens(d.map(_ & 0xff).toList))
    val out = scala.collection.mutable.ListBuffer[(Int, Int)]()
    var id = 256
    var exhausted = false
    while (out.size < n && !exhausted) {
      val counts = words.flatMap(w => w.zip(w.drop(1)))
        .groupBy(identity).view.mapValues(_.size.toLong)
        .filter(_._2 >= 2) // a pair must repeat to earn a merge
      if (counts.isEmpty) exhausted = true
      else {
        val best = counts.toSeq
          .minBy { case ((a, b), c) => (-c, a.toLong, b.toLong) }._1
        out += best
        def fuse(w: List[Int]): List[Int] = w match {
          case a :: b :: rest if (a, b) == best => id :: fuse(rest)
          case x :: rest => x :: fuse(rest)
          case Nil => Nil
        }
        words = words.map(fuse)
        id += 1
      }
    }
    out.toList
  }

  test("corpus merge table: sample selection pinned, trainer equals " +
    "an independent reference on a corpus subsample") {
    // 1. trainedMerges == train(sample recomputed here): pins the
    //    deterministic hashed-id sample selection end-to-end
    val sample = graft.sources.Tables.load(spark, SfDir, "documents")
      .filter(col("text").isNotNull)
      .select(col("doc_id"), col("text"), xxhash64(col("doc_id")).as("h"))
      .orderBy(col("h"), col("doc_id")).limit(Bpe.SampleDocs)
      .select("text").as[String].collect()
      .map(_.getBytes("UTF-8")).toSeq
    assert(Bpe.trainedMerges(spark, SfDir) ===
      Bpe.train(sample, Bpe.NumMerges))
    // 2. merge-table equality vs the independent reference trainer on
    //    real corpus text (subsample keeps the O(rounds x tokens)
    //    list-based reference affordable)
    val sub = sample.take(64)
    val got = Bpe.train(sub, 64)
      .map(p => ((p >> 32).toInt, (p & 0xffffffffL).toInt))
    assert(got === refTrain(sub, 64))
  }

  test("training merges are deterministic, repeat-justified, and compress") {
    val m1 = Bpe.train(Seq("the cat sat on the mat", "the mat sat")
      .map(_.getBytes("UTF-8")), 50)
    val m2 = Bpe.train(Seq("the cat sat on the mat", "the mat sat")
      .map(_.getBytes("UTF-8")), 50)
    assert(m1 === m2, "same sample, same merges")
    assert(m1.nonEmpty)
    // 'th' ('t'=116,'h'=104) or 'at' must be learned early: they repeat most
    val ranks = BpeTokenCount.rankMap(m1)
    val c = BpeTokenCount.count(
      org.apache.spark.unsafe.types.UTF8String.fromString("the the the"),
      ranks)
    assert(c < 9, s"learned merges must compress 'the the the', got $c")
    // zero merges → every non-ws byte is a token
    val c0 = BpeTokenCount.count(
      org.apache.spark.unsafe.types.UTF8String.fromString("ab cd"),
      BpeTokenCount.rankMap(Seq.empty))
    assert(c0 === 4L)
  }

  test("bpe_stats: learned tokens compress the corpus vs raw bytes") {
    val got = Bpe.bpeStats(spark, SfDir).collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val bytes = r.getAs[Long]("sum_bytes")
      val bpe = r.getAs[Long]("bpe_tokens")
      val ws = r.getAs[Long]("ws_tokens")
      assert(bpe > 0 && bpe <= bytes, "token count bounded by bytes")
      assert(bpe >= ws, "BPE splits at least at whitespace granularity")
      assert(r.getAs[Double]("bytes_per_tok") > 1.0,
        "learned merges must compress the corpus it trained on")
      assert(r.getAs[Long]("n_seqs_bpe") ===
        (bpe + Packing.SeqBudget - 1) / Packing.SeqBudget)
    }
  }

  test("pack_sequences under the BPE metric: offsets are exact prefix sums") {
    val packed = Packing.packSequencesBy(spark, SfDir,
        Bpe.bpeTokens(spark, SfDir, col("text")))
      .collect()
    val merges = Bpe.trainedMerges(spark, SfDir)
    val counts = graft.sources.Tables.load(spark, SfDir, "documents")
      .select("doc_id", "source", "text").collect()
      .map(r => (r.getLong(0), r.getString(1),
        Option(r.getString(2)).map(refCount(_, merges)).getOrElse(0L)))
    // per source, walking docs in id order reproduces every offset
    counts.groupBy(_._2).foreach { case (src, docs) =>
      var off = 0L
      docs.sortBy(_._1).foreach { case (id, _, n) =>
        val row = packed.find(r => r.getAs[Long]("doc_id") == id).get
        assert(row.getAs[Long]("n_tok") === n, s"doc $id count")
        assert(row.getAs[Long]("tok_offset") === off, s"doc $id offset")
        assert(row.getAs[Long]("seq_id") === off / Packing.SeqBudget)
        off += n
      }
    }
  }
}
