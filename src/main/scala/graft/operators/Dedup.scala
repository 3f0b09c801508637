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

  // MinHash parameters: K seeded XXH64 permutations computed by the
  // codegen'd MinHashSig kernel, banded b×r = K.
  val MinhashK = 32
  val MinhashBands = 16
  val MinhashR = 2 // rows per band
  val BucketCap = 64 // frequent-bucket pruning bound
  val TopPairs = 1000

  /** Candidate pairs from banded buckets. Input must have columns
    * (doc_id, band, key) — one row per doc per band. Shuffle on
    * (band, key); emit a<b pairs inside buckets of size [2, cap]
    * (frequent-bucket pruning); distinct because a pair can collide
    * in several bands. Shuffled bytes = O(rows × bands × 24B). */
  private def bucketPairs(banded: DataFrame): DataFrame =
    banded.groupBy("band", "key")
      .agg(sort_array(collect_list(col("doc_id"))).as("ids"))
      .filter(size(col("ids")).between(2, BucketCap))
      .select(explode(col("ids")).as("a"), col("ids"))
      .select(col("a"), explode(col("ids")).as("b"))
      .filter(col("a") < col("b"))
      .select("a", "b").distinct()

  /** Band keys for a minhash signature row: band j's key is the hash
    * of the j-th r-slice. `sig` must be a concrete (already projected)
    * column so the kernel runs once per doc, not once per band. */
  private def bandedMinhash(withSig: DataFrame): DataFrame =
    withSig
      .select(col("doc_id"), col("sig"),
        explode(sequence(lit(0), lit(MinhashBands - 1))).as("band"))
      .select(col("doc_id"), col("band"),
        hash(slice(col("sig"), col("band") * MinhashR + 1, lit(MinhashR)))
          .as("key"))

  /** #20 MinHash+LSH near-dup: top candidate pairs by estimated
    * Jaccard (signature agreement fraction). Signatures come from the
    * single-pass MinHashSig kernel; candidate generation shuffles only
    * (doc_id, band, key) and the two signature join-backs shuffle one
    * signature row per doc — at 100 TB the signature table would be
    * persisted/checkpointed instead of recomputed per use. Output is
    * the ranked candidate list (deterministic total order);
    * thresholding is caller policy; MinhashSpec verifies estimates
    * against exact Jaccard. */
  def minhashLsh(spark: SparkSession, dir: String): DataFrame =
    minhashLshOn(Tables.load(spark, dir, "documents"))

  /** #20 ranked candidate list (bounded output for inspection). */
  def minhashLshOn(docs: DataFrame): DataFrame =
    minhashPairs(docs)
      .orderBy(col("est_jaccard").desc, col("a"), col("b"))
      .limit(TopPairs)

  /** All LSH candidate pairs with estimated Jaccard — unbounded,
    * for apply-dedup and threshold policies. */
  def minhashPairs(docs: DataFrame): DataFrame = {
    val withSig = docs
      .select(col("doc_id"),
        TextFunctions.minhashSig(col("text"), MinhashK, 2).as("sig"))
      .filter(size(col("sig")) === MinhashK)
    val pairs = bucketPairs(bandedMinhash(withSig))
    val sa = withSig.select(col("doc_id").as("a"), col("sig").as("sig_a"))
    val sb = withSig.select(col("doc_id").as("b"), col("sig").as("sig_b"))
    pairs.join(sa, "a").join(sb, "b")
      .withColumn("est_jaccard",
        aggregate(zip_with(col("sig_a"), col("sig_b"),
          (x, y) => when(x === y, 1).otherwise(0)),
          lit(0), (acc, v) => acc + v).cast("double") / MinhashK)
      .select("a", "b", "est_jaccard")
  }

  /** End-to-end near-dedup: drop every doc that near-duplicates
    * (est_jaccard ≥ threshold) ANY doc with a smaller id. One
    * anti-join of the corpus against the drop-set; no transitive
    * closure pass. Note this is stricter than a sequential greedy
    * keep-first scan: for a chain a~b, b~c (no a~c pair) greedy would
    * re-admit c after dropping b, whereas this policy drops both b and
    * c. The one-shot set-difference is the scalable choice — greedy
    * re-admission is inherently sequential (each verdict depends on
    * all prior verdicts) and cannot be expressed as a bounded number
    * of shuffles. */
  def applyNearDedup(docs: DataFrame, threshold: Double): DataFrame = {
    val drops = minhashPairs(docs)
      .filter(col("est_jaccard") >= threshold)
      .select(col("b").as("doc_id")).distinct()
    docs.join(drops, Seq("doc_id"), "left_anti")
  }

  // SimHash parameters: 64-bit signature, 4×16-bit bands.
  val SimhashBits = 64
  val SimhashBands = 4

  /** #21 SimHash near-dup: 64-bit SimHash64 kernel, band on 16-bit
    * chunks, rank candidate pairs by Hamming distance (asc) via
    * bit_count(xor). The 8-byte signature is cheap enough to carry
    * everywhere; Hamming re-rank joins back one long per doc. */
  def simhashNearDup(spark: SparkSession, dir: String): DataFrame = {
    val chunkBits = SimhashBits / SimhashBands
    val mask = (1L << chunkBits) - 1
    val withSig = Tables.load(spark, dir, "documents")
      .select(col("doc_id"), TextFunctions.simhash64(col("text")).as("sig"))
    val banded = withSig
      .select(col("doc_id"), col("sig"),
        explode(sequence(lit(0), lit(SimhashBands - 1))).as("band"))
      .select(col("doc_id"), col("band"),
        expr(s"shiftrightunsigned(sig, band * $chunkBits) & ${mask}L").as("key"))
    val pairs = bucketPairs(banded)
    val sa = withSig.select(col("doc_id").as("a"), col("sig").as("sig_a"))
    val sb = withSig.select(col("doc_id").as("b"), col("sig").as("sig_b"))
    pairs.join(sa, "a").join(sb, "b")
      .withColumn("hamming",
        bit_count(col("sig_a").bitwiseXOR(col("sig_b"))).cast("int"))
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
