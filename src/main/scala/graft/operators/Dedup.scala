package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables
import graft.functions.TextFunctions

/** Deduplication operators over `documents` (SURVEY.md §2 #19-22).
  *
  * Scale design (§5): every near-dup variant is banded LSH — compute
  * a per-doc signature in one projection pass, explode ×bands,
  * hash-shuffle on (band, key), generate pairs only inside buckets,
  * with a per-bucket cap (frequent-bucket pruning, the standard
  * guard against degenerate buckets at web scale). Shuffled bytes are
  * O(rows × bands), never O(rows²); no crossJoin anywhere.
  */
object Dedup {

  /** #19 Exact dedup: group on content hash, keep the smallest id.
    * One shuffle on the 256-bit hash — at 100 TB this shuffles ~40
    * bytes/doc, not the documents themselves. */
  def exact(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "documents")
      .groupBy(sha2(col("text"), 256).as("content_hash"))
      .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("dup_count"))
      .select("content_hash", "keep_id", "dup_count")
      .orderBy("keep_id")

  /** Distinct word w-shingles of the lowercased text. */
  def shingles(text: Column, w: Int): Column = {
    val toks = TextFunctions.tokens(text)
    val m = size(toks) - (w - 1)
    when(m >= 1,
      array_distinct(transform(sequence(lit(1), m),
        i => concat_ws(" ", slice(toks, i, lit(w))))))
      .otherwise(array().cast("array<string>"))
  }

  // MinHash parameters: K independent seeded xxhash64 permutations
  // (g_j(s) = xxhash64(s, j) — wrap-free under ANSI arithmetic, unlike
  // Kirsch-Mitzenmacher h1+j·h2 which overflows), banded b×r = K.
  val MinhashK = 32
  val MinhashBands = 16
  val MinhashR = 2 // rows per band
  val BucketCap = 64 // frequent-bucket pruning bound
  val TopPairs = 1000

  /** Per-doc MinHash signature column (array<bigint>, length K):
    * min over shingles of the j-seeded hash, all inside codegen. */
  def minhashSignature(shingleCol: Column): Column =
    transform(sequence(lit(0), lit(MinhashK - 1)),
      j => array_min(transform(shingleCol, s => xxhash64(s, j))))

  /** Banded bucket keys for an array signature: murmur3 of each
    * r-slice, tagged with the band index. */
  private def sigBands(sig: Column, bands: Int, r: Int): Column =
    transform(sequence(lit(0), lit(bands - 1)),
      j => struct(j.as("band"), hash(slice(sig, j * r + 1, lit(r)), j).as("key")))

  /** Candidate pairs from banded buckets: explode bands, shuffle on
    * (band, key), emit a<b pairs inside buckets of size [2, cap]. */
  private def bucketPairs(withSig: DataFrame, bands: Int, r: Int): DataFrame = {
    val banded = withSig
      .select(col("doc_id"), explode(sigBands(col("sig"), bands, r)).as("bk"))
      .select(col("doc_id"), col("bk.band").as("band"), col("bk.key").as("key"))
    banded.groupBy("band", "key")
      .agg(sort_array(collect_list(col("doc_id"))).as("ids"))
      .filter(size(col("ids")).between(2, BucketCap))
      .select(explode(col("ids")).as("a"), col("ids"))
      .select(col("a"), explode(col("ids")).as("b"))
      .filter(col("a") < col("b"))
      .select("a", "b").distinct()
  }

  /** #20 MinHash+LSH near-dup: top candidate pairs by estimated
    * Jaccard (signature agreement fraction). Output is the ranked
    * candidate list (deterministic total order) — thresholding is a
    * caller policy; MinhashSpec verifies estimates against exact
    * Jaccard on a slice. */
  def minhashLsh(spark: SparkSession, dir: String): DataFrame = {
    val withSig = Tables.load(spark, dir, "documents")
      .select(col("doc_id"), minhashSignature(shingles(col("text"), 2)).as("sig"))
      .filter(size(col("sig")) === MinhashK)
    val pairs = bucketPairs(withSig, MinhashBands, MinhashR)
    val sa = withSig.select(col("doc_id").as("a"), col("sig").as("sig_a"))
    val sb = withSig.select(col("doc_id").as("b"), col("sig").as("sig_b"))
    pairs.join(sa, "a").join(sb, "b")
      .withColumn("est_jaccard",
        aggregate(zip_with(col("sig_a"), col("sig_b"),
          (x, y) => when(x === y, 1).otherwise(0)),
          lit(0), (acc, v) => acc + v).cast("double") / MinhashK)
      .select("a", "b", "est_jaccard")
      .orderBy(col("est_jaccard").desc, col("a"), col("b"))
      .limit(TopPairs)
  }

  // SimHash parameters: 64-bit signature, 4×16-bit bands.
  val SimhashBits = 64
  val SimhashBands = 4
  private val BitMasks: Seq[Long] = (0 until SimhashBits).map(1L << _)

  /** 64-bit SimHash as an array<int> of bits (deterministic: tie
    * counts round to bit 1). */
  def simhashBits(text: Column): Column = {
    val tokh = transform(TextFunctions.tokens(text), t => xxhash64(t))
    val counts = aggregate(tokh,
      typedLit(Seq.fill(SimhashBits)(0)),
      (acc, h) => zip_with(acc,
        transform(typedLit(BitMasks),
          m => when(h.bitwiseAND(m) =!= 0, 1).otherwise(-1)),
        (a, d) => a + d))
    transform(counts, v => when(v >= 0, 1).otherwise(0))
  }

  /** #21 SimHash near-dup: band on 16-bit chunks, rank candidate
    * pairs by Hamming distance (asc). */
  def simhashNearDup(spark: SparkSession, dir: String): DataFrame = {
    val chunkLen = SimhashBits / SimhashBands
    val withBits = Tables.load(spark, dir, "documents")
      .select(col("doc_id"), simhashBits(col("text")).as("bits"))
    val withSig = withBits.withColumn("sig",
      transform(sequence(lit(0), lit(SimhashBands - 1)),
        c => aggregate(slice(col("bits"), c * chunkLen + 1, lit(chunkLen)),
          lit(0L), (a, bit) => a * 2 + bit)))
    val pairs = bucketPairs(withSig, SimhashBands, 1)
    val ba = withBits.select(col("doc_id").as("a"), col("bits").as("bits_a"))
    val bb = withBits.select(col("doc_id").as("b"), col("bits").as("bits_b"))
    pairs.join(ba, "a").join(bb, "b")
      .withColumn("hamming",
        lit(SimhashBits) - aggregate(zip_with(col("bits_a"), col("bits_b"),
          (x, y) => when(x === y, 1).otherwise(0)), lit(0), (acc, v) => acc + v))
      .select("a", "b", "hamming")
      .orderBy(col("hamming").asc, col("a"), col("b"))
      .limit(500)
  }

  /** #22 N-gram Jaccard over blocked candidate pairs: block on
    * (lang, source, n_chars/20 bucket) — never all-pairs — then exact
    * trigram-set Jaccard, ranked. SQL-expressible, so this one has a
    * full DuckDB oracle. */
  def ngramJaccard(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.load(spark, dir, "documents")
      .select(col("doc_id"), col("lang"), col("source"), col("n_chars"),
        floor(col("n_chars") / lit(20)).as("blk"),
        TextFunctions.charNgrams(col("text"), 3).as("grams"))
    val a = d.select(col("doc_id").as("a"), col("lang"), col("source"),
      col("blk"), col("n_chars").as("nc_a"), col("grams").as("grams_a"))
    val b = d.select(col("doc_id").as("b"), col("lang"), col("source"),
      col("blk"), col("n_chars").as("nc_b"), col("grams").as("grams_b"))
    a.join(b, Seq("lang", "source", "blk"))
      .filter(col("a") < col("b") && abs(col("nc_a") - col("nc_b")) <= 20)
      .withColumn("jac", TextFunctions.jaccard(col("grams_a"), col("grams_b")))
      .select("a", "b", "jac")
      .orderBy(col("jac").desc, col("a"), col("b"))
      .limit(200)
  }
}
