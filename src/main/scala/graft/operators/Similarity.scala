package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables
import graft.functions.VectorFunctions._

/** Embedding similarity operators over `embeddings` (SURVEY.md §2
  * #23-26): the exact cosine kernel, brute-force ANN as the exact
  * baseline, and sign-LSH bucketed variants as the 100 TB path.
  *
  * Scale design (§5): the brute-force variant broadcasts only the
  * (tiny) query set — the candidate corpus streams through
  * partitions; the LSH variants shuffle O(rows × bands) bucket keys
  * and compare only within buckets. No unbounded cartesian product.
  */
object Similarity {

  // 8 tables × 5-bit keys (40 hyperplanes): tuned for a near-isotropic
  // corpus where true top-5 neighbors sit at cos≈0.4 (sign-agreement
  // p≈0.63) → expected recall 1-(1-p^5)^8 ≈ 0.55 while probing ~20%
  // of the corpus. Clustered real-world embeddings (higher p) push
  // recall toward 1 at the same cost. L and r are per-corpus knobs.
  val LshPlanes = 40
  val LshBands = 8
  val LshBitsPerBand = 5
  val EmbBucketCap = 512
  val Dim = 64

  private def emb(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "embeddings")
      .select(col("vec_id"), asDouble(col("embedding")).as("vec"), col("label"))

  /** #23 Exact cosine kernel on aligned pairs (vec_id, vec_id+1) via
    * the codegen'd CosineSim expression; DuckDB-oracled. */
  def cosinePairs(spark: SparkSession, dir: String): DataFrame = {
    val e = emb(spark, dir)
    val a = e.select(col("vec_id").as("vec_a"), col("vec").as("va"))
    val b = e.select(col("vec_id").as("vec_b"), col("vec").as("vb"))
    a.join(b, col("vec_a") + 1 === col("vec_b"))
      .select(col("vec_a"), col("vec_b"),
        round(cosine(col("va"), col("vb")), 6).as("cos_sim"))
      .orderBy("vec_a")
  }

  /** #25 Brute-force ANN: top-5 cosine neighbors for query vectors
    * (vec_id < 8). The query side is broadcast; ranking is a per-query
    * window with deterministic tiebreak. */
  def annBrute(spark: SparkSession, dir: String): DataFrame = {
    val e = emb(spark, dir)
    val queries = e.filter(col("vec_id") < 8)
      .select(col("vec_id").as("q_id"), col("vec").as("qvec"))
    val scored = e.crossJoin(broadcast(queries))
      .filter(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id").as("cand_id"),
        cosine(col("qvec"), col("vec")).as("cos"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("q_id").orderBy(col("cos").desc, col("cand_id").asc)
    scored.withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= 5)
      .select(col("q_id"), col("rnk"), col("cand_id"),
        round(col("cos"), 6).as("cos_sim"))
      .orderBy("q_id", "rnk")
  }

  // Near-dup banding is TIGHTER than ANN banding: a near-duplicate
  // (cos ≥ 0.9, sign-agreement p ≈ 0.91) survives a 12-bit band with
  // p^12 ≈ 0.32, so 8 bands give ~95% recall — while the number of
  // chance bucket collisions (the candidate-pair cost) drops by
  // 2^7 vs the 5-bit ANN keys. ANN keys stay loose because they must
  // recall moderate-cosine neighbors, not just twins.
  val NearDupBitsPerBand = 12

  /** Append (band, key) per band via the single-call SignBandKeys
    * kernel (one codegen'd static call per row — the per-plane
    * literal-expression form costs seconds of Janino compile time in
    * every stage that embeds it). */
  private def withBands(df: DataFrame, vecCol: String = "vec",
      bits: Int = LshBitsPerBand): DataFrame =
    df.select(col("*"),
        posexplode(signBandKeys(col(vecCol), LshBands, bits)))
      .withColumnRenamed("pos", "band")
      .withColumnRenamed("col", "key")

  /** #26 LSH ANN: queries probe only the buckets sharing one of their
    * band keys; exact re-rank inside the candidate set. The bucket
    * probe and the distinct both move only (q_id, cand_id) id pairs —
    * the 64-dim vectors are joined back afterwards (queries broadcast;
    * the corpus side is an id-keyed join the planner broadcasts at
    * small SF and hash-shuffles at scale). Approximate → rows-only in
    * the driver gate; recall vs annBrute is asserted in
    * SimilaritySpec. */
  def annLsh(spark: SparkSession, dir: String): DataFrame = {
    val e = emb(spark, dir)
    val cands = withBands(e.select(col("vec_id"), col("vec")))
      .select(col("vec_id"), col("band"), col("key"))
    val qside = e.filter(col("vec_id") < 8)
      .select(col("vec_id").as("q_id"), col("vec").as("qvec"))
    val queries = withBands(qside, "qvec")
      .select(col("q_id"), col("band"), col("key"))
    val idPairs = broadcast(queries).join(cands, Seq("band", "key"))
      .filter(col("q_id") =!= col("vec_id"))
      .select(col("q_id"), col("vec_id").as("cand_id"))
      .distinct()
    val matched = idPairs
      .join(broadcast(qside.select(col("q_id"), col("qvec"))), "q_id")
      .join(e.select(col("vec_id").as("cand_id"), col("vec")), "cand_id")
      .select(col("q_id"), col("cand_id"),
        cosine(col("qvec"), col("vec")).as("cos"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("q_id").orderBy(col("cos").desc, col("cand_id").asc)
    matched.withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= 5)
      .select(col("q_id"), col("rnk"), col("cand_id"),
        round(col("cos"), 6).as("cos_sim"))
      .orderBy("q_id", "rnk")
  }

  // IVF parameters: C cells seeded from a deterministic pseudo-random
  // sample then refined with Lloyd iterations, nprobe cells probed
  // per query.
  val IvfCells = 32
  val IvfProbe = 10
  val IvfKmeansIters = 8
  // Recall levers (VERDICT r3 #6). Probing is what bounds IVF recall
  // here — candidates are exact-scored on full vectors, so PQ residual
  // scoring would trade accuracy for memory we don't need at this
  // vector width; the standard recall fixes are instead:
  //  - multi-assignment: index every vector in its IvfAssign nearest
  //    cells (2× index entries, same query cost shape), so a vector
  //    near a cell boundary is findable from both sides;
  //  - adaptive probing: beyond the fixed IvfProbe nearest cells, also
  //    probe cells whose centroid similarity is within IvfProbeMargin
  //    of the query's best cell (hard cap IvfProbeMax keeps the scan
  //    fraction bounded) — queries that land between cells probe
  //    wider, central queries stay cheap.
  // Tuned on the isotropic test corpus (grid-searched round 7):
  // 8 Lloyd iterations + 3× assignment + 10-of-32 probe with a 0.12
  // adaptive margin give recall 0.95-1.0 vs ann_brute (was 0.65-0.75
  // at 2 iters / 2× / 6 cells). Isotropic embeddings are IVF's
  // worst case — neighbor/query cell assignments correlate weakly, so
  // a high recall target forces a high scanned fraction (~2/3 here);
  // on clustered real-world embeddings the SAME margin-probing scans
  // far less because queries sit inside well-separated cells. The
  // cost SHAPE (rows × C broadcast product, cell-keyed probe join)
  // is unchanged by these knobs.
  val IvfAssign = 3
  val IvfProbeMargin = 0.12
  val IvfProbeMax = 14

  /** Lloyd's k-means refinement of an IVF centroid set, expressed as
    * DataFrame ops: assign (broadcast centroids → per-vector argmax),
    * recompute (element-wise mean via posexplode + decimal-exact avg
    * so the result is partition-order independent → deterministic on
    * any cluster). Empty cells drop out. Cost per iteration is one
    * broadcast pass over the corpus + one (cell, dim)-keyed shuffle
    * of scalars — at 100 TB centroids train on a sampled slice, but
    * the plan shape is identical. */
  def kmeansRefine(e: DataFrame, seedCentroids: DataFrame,
      iters: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("vec_id").orderBy(col("cs").desc, col("c_id").asc)
    var c = seedCentroids
    for (_ <- 1 to iters) {
      val assigned = e.crossJoin(broadcast(c))
        .select(col("vec_id"), col("vec"), col("c_id"),
          cosine(col("vec"), col("cvec")).as("cs"))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
      c = assigned
        .select(col("c_id"), posexplode(col("vec")))
        .groupBy("c_id", "pos")
        .agg(graft.operators.Num.davg(col("col")).as("m"))
        .groupBy("c_id")
        .agg(collect_list(struct(col("pos"), col("m"))).as("pm"))
        .select(col("c_id"),
          expr("transform(array_sort(pm), x -> x.m)").as("cvec"))
    }
    c
  }

  /** #26b IVF ANN: partition the corpus into centroid cells, probe
    * each query's nprobe nearest cells, exact re-rank inside. The
    * only cross product is rows × C (broadcast, C bounded); the probe
    * join is hash-partitioned on cell id. Rows-only; recall gated in
    * SimilaritySpec. */
  // Trained-centroid cache, keyed by corpus dir + source mtime (a
  // regenerated corpus at the same path must not serve stale
  // centroids): the centroid set is a bounded model artifact (C ×
  // dim doubles — here 32×64), trained once per corpus and reused by
  // every probe query, exactly like a production IVF index. The
  // driver-side materialization is bounded by C, never by data size.
  private val centroidCache =
    new java.util.concurrent.ConcurrentHashMap[String, Seq[(Long, Seq[Double])]]

  /** Cache key carrying the corpus identity AND freshness. */
  private def modelKey(dir: String): String =
    dir + "@" + new java.io.File(dir, "embeddings.parquet").lastModified

  /** Deterministic seed sample + Lloyd refinement, cached per corpus. */
  def trainedCentroids(spark: SparkSession, dir: String,
      iters: Int = IvfKmeansIters): DataFrame = {
    val cached = centroidCache.computeIfAbsent(modelKey(dir) + "#" + iters, _ => {
      val e = emb(spark, dir)
      val seed = e
        .select(col("vec_id").as("c_id"), col("vec").as("cvec"),
          hash(col("vec_id")).as("h"))
        // vec_id tiebreak: hash alone is not a total order, and the
        // limit boundary must be run-independent
        .orderBy(col("h"), col("c_id")).limit(IvfCells).drop("h")
      import spark.implicits._
      kmeansRefine(e.select(col("vec_id"), col("vec")), seed, iters)
        .select(col("c_id"), col("cvec"))
        .as[(Long, Seq[Double])].collect().toSeq
    })
    import spark.implicits._
    cached.toDF("c_id", "cvec")
  }

  def annIvf(spark: SparkSession, dir: String): DataFrame =
    annIvfWith(spark, dir, IvfAssign, IvfProbe, IvfProbeMargin, IvfProbeMax)

  /** Parametrized IVF probe (the public operator uses the tuned
    * defaults above; tests/experiments can widen or narrow). */
  def annIvfWith(spark: SparkSession, dir: String, assign: Int,
      probe: Int, margin: Double, probeMax: Int,
      iters: Int = IvfKmeansIters): DataFrame = {
    val e = emb(spark, dir)
    val centroids = broadcast(trainedCentroids(spark, dir, iters))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("vec_id").orderBy(col("cs").desc, col("c_id").asc)
    val assigned = e.crossJoin(centroids)
      .select(col("vec_id"), col("vec"), col("c_id"),
        cosine(col("vec"), col("cvec")).as("cs"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= assign)
      .select(col("c_id").as("cell"), col("vec_id"), col("vec"))
    val qw = org.apache.spark.sql.expressions.Window
      .partitionBy("q_id").orderBy(col("cs").desc, col("c_id").asc)
    val qb = org.apache.spark.sql.expressions.Window.partitionBy("q_id")
    val probes = e.filter(col("vec_id") < 8)
      .select(col("vec_id").as("q_id"), col("vec").as("qvec"))
      .crossJoin(centroids)
      .select(col("q_id"), col("qvec"), col("c_id"),
        cosine(col("qvec"), col("cvec")).as("cs"))
      .withColumn("rn", row_number().over(qw))
      .withColumn("best", max(col("cs")).over(qb))
      .filter(col("rn") <= probe ||
        (col("cs") >= col("best") - margin &&
          col("rn") <= probeMax))
      .select(col("q_id"), col("qvec"), col("c_id").as("cell"))
    val scored = probes.join(assigned, "cell")
      .filter(col("q_id") =!= col("vec_id"))
      // multi-assignment can surface the same candidate from two
      // probed cells — collapse before the exact score
      .dropDuplicates("q_id", "vec_id")
      .select(col("q_id"), col("vec_id").as("cand_id"),
        cosine(col("qvec"), col("vec")).as("cos"))
    val rw = org.apache.spark.sql.expressions.Window
      .partitionBy("q_id").orderBy(col("cos").desc, col("cand_id").asc)
    scored.withColumn("rnk", row_number().over(rw).cast("long"))
      .filter(col("rnk") <= 5)
      .select(col("q_id"), col("rnk"), col("cand_id"),
        round(col("cos"), 6).as("cos_sim"))
      .orderBy("q_id", "rnk")
  }

  /** #72 Per-label embedding centroids (prototype vectors — class
    * means for classifier init / nearest-centroid labeling / drift
    * monitoring). Long form (label, pos, m): one decimal-exact mean
    * per (label, dimension), the same partition-order-independent
    * recompute shape as [[kmeansRefine]]'s assignment step, plus the
    * per-label support count. One explode pass + one (label, pos)
    * shuffle of scalars — no vector ever rides a shuffle. */
  /** The (label, pos, m) dimension means — shared by the reporting
    * query and the cached assignment model, so the model build does
    * not pay the report's presentation sort / support-count join. */
  private def centroidDims(spark: SparkSession, dir: String): DataFrame =
    emb(spark, dir)
      .select(col("label"), posexplode(col("vec")))
      .groupBy(col("label"), col("pos").cast("long").as("pos"))
      .agg(graft.operators.Num.davg(col("col")).as("m"))

  def labelCentroids(spark: SparkSession, dir: String): DataFrame = {
    val n = emb(spark, dir).groupBy("label")
      .agg(count(lit(1)).as("n_vecs"))
    centroidDims(spark, dir)
      .join(broadcast(n), "label")
      .select("label", "pos", "m", "n_vecs")
      .orderBy("label", "pos")
  }

  /** #73 Nearest-centroid assignment + confusion matrix: classify
    * every vector by its cosine-nearest label centroid (from
    * [[labelCentroids]]) and aggregate (true, predicted) counts with
    * a decimal-exact mean cosine — the pseudo-labeling / label-drift
    * report a training pipeline runs after computing prototypes. The
    * centroid table is |labels| rows → broadcast; the argmax is the
    * bounded rows×|labels| broadcast-product + per-vector window, the
    * same shape as [[annIvf]]'s assignment step. */
  // Label-centroid model cache, keyed by corpus dir — same bounded
  // model-artifact pattern as [[trainedCentroids]]: |labels| rows ×
  // dim doubles, computed once per corpus, reused by every
  // assignment query. The collect is bounded by label cardinality,
  // never by data size.
  private val labelCentroidCache =
    new java.util.concurrent.ConcurrentHashMap[String, Seq[(Int, Seq[Double])]]

  def centroidAssign(spark: SparkSession, dir: String): DataFrame = {
    val cached = labelCentroidCache.computeIfAbsent(modelKey(dir), _ => {
      import spark.implicits._
      centroidDims(spark, dir)
        .groupBy(col("label").as("c_label"))
        .agg(expr("transform(array_sort(collect_list(struct(pos, m))), t -> t.m)")
          .as("cvec"))
        .as[(Int, Seq[Double])].collect().toSeq
    })
    import spark.implicits._
    val cvecs = cached.toDF("c_label", "cvec")
    val e = emb(spark, dir)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("vec_id").orderBy(col("cs").desc, col("c_label").asc)
    e.crossJoin(broadcast(cvecs))
      .select(col("vec_id"), col("label"), col("c_label"),
        cosine(col("vec"), col("cvec")).as("cs"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .groupBy(col("label").as("true_label"), col("c_label").as("pred_label"))
      .agg(count(lit(1)).as("n_vecs"),
        graft.operators.Num.davg(col("cs")).as("avg_cos"))
      .orderBy("true_label", "pred_label")
  }

  /** #24 Embedding-cosine near-dup: all vectors banded, candidate
    * pairs generated inside capped buckets as (a, b) ids ONLY — a
    * 512-byte vector does not ride the bucket shuffle or the pair
    * explode (that materializes |pairs|×2 vector copies). The two
    * vector join-backs are id-keyed joins the planner broadcasts at
    * small SF and hash-shuffles at scale. Rows-only. */
  def dedupEmbed(spark: SparkSession, dir: String): DataFrame = {
    val e = emb(spark, dir).select(col("vec_id"), col("vec"))
    val banded = withBands(e, "vec", NearDupBitsPerBand)
      .select(col("vec_id").as("doc_id"), col("band"), col("key"))
    val idPairs = Dedup.bucketPairs(banded, EmbBucketCap)
    idPairs
      .join(e.select(col("vec_id").as("a"), col("vec").as("va")), "a")
      .join(e.select(col("vec_id").as("b"), col("vec").as("vb")), "b")
      .select(col("a"), col("b"),
        round(cosine(col("va"), col("vb")), 6).as("cos_sim"))
      .orderBy(col("cos_sim").desc, col("a"), col("b"))
      .limit(100)
  }

  /** #77 Int8-quantized ANN: the same top-5 contract as [[annBrute]],
    * but every vector is first quantized to int8 codes (QuantizeI8 —
    * 4× smaller than float32) and ranking runs on the exact-integer
    * IntCosine kernel. This is the memory-bound scale path: at 100 TB
    * the quantized corpus is what fits in cache/shuffle, and the
    * integer arithmetic is deterministic across engines, so unlike
    * every float ANN variant this one has a full DuckDB oracle.
    * SimilaritySpec asserts top-5 recall vs the float-exact
    * [[annBrute]] ranking. Plan shape is identical to annBrute
    * (queries broadcast, corpus streams); an IVF/LSH front end from
    * the existing kernels composes on top unchanged. */
  def annQuant(spark: SparkSession, dir: String): DataFrame = {
    val e = emb(spark, dir)
      .select(col("vec_id"), quantizeI8(col("vec")).as("qv"))
    val queries = e.filter(col("vec_id") < 8)
      .select(col("vec_id").as("q_id"), col("qv").as("qq"))
    val scored = e.crossJoin(broadcast(queries))
      .filter(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id").as("cand_id"),
        intCosine(col("qq"), col("qv")).as("cos"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("q_id").orderBy(col("cos").desc, col("cand_id").asc)
    scored.withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= 5)
      .select(col("q_id"), col("rnk"), col("cand_id"),
        round(col("cos"), 6).as("cos_q"))
      .orderBy("q_id", "rnk")
  }
}
