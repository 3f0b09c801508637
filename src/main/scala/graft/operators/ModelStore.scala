package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Persisted build-once model tables (round 17, VERDICT r16 #5).
  *
  * The corpus-keyed model caches (IVF centroids, PQ sub-codebooks,
  * label centroids) amortize Lloyd training WITHIN a session; the
  * bench's cold mode measures what a fresh session pays per corpus —
  * and 60%+ of that 142 s floor is exactly this training
  * (ann_ivfpq +28.6 s, ann_ivf +13.5, ann_pq +9.2, semantic_dedup
  * +8.3 per the BASELINE cold inventory). In production a trained
  * model is a COMMITTED TABLE (the `ann_indexed` build-once /
  * query-many precedent, reference behavior: the DAGs re-read their
  * appended warehouse tables rather than refetching,
  * /root/reference/dags/stock_data_to_gcp.py:123-136): a fresh
  * service LOADS it instead of retraining. This store is that table
  * — each model persists once as parquet under a corpus-keyed root,
  * mtime-guarded against corpus regeneration (the indexRoot marker
  * discipline), and any later session with the store enabled reads
  * it back bit-identically (model vectors are doubles, lossless
  * through parquet; ArtifactSpec pins persisted ≡ trained and proves
  * the load path actually reads the table).
  *
  * OFF by default: the plain cold floor must keep measuring honest
  * retraining. Enable with SPARK_GRAFT_MODEL_STORE=1 (env, the bench
  * path) or -Dgraft.modelstore=1 (tests). Model row ORDER is not part
  * of the contract — every consumer joins or argmaxes with explicit
  * tiebreaks.
  */
object ModelStore {

  def enabled: Boolean =
    sys.props.get("graft.modelstore")
      .orElse(sys.env.get("SPARK_GRAFT_MODEL_STORE")).contains("1")

  /** Corpus-keyed store root (one directory per corpus path). */
  def root(dir: String): java.io.File =
    new java.io.File(sys.props("java.io.tmpdir"),
      s"graft_models_${graft.sources.StagePath.key(dir)}")

  /** The model table `name` for corpus `dir`: when the store is
    * enabled and fresh versus `dir/srcTable.parquet`, READ the
    * persisted parquet; otherwise run `train` (persisting the result
    * when the store is enabled — the re-read guarantees consumers use
    * exactly the bytes a later session will load). Models are bounded
    * artifacts (k·dim centroids, M×K codebooks), so the single-file
    * coalesce is free. */
  def table(spark: SparkSession, dir: String, name: String,
      srcTable: String)(train: => DataFrame): DataFrame = {
    if (!enabled) return train
    val r = root(dir)
    val f = new java.io.File(r, s"$name.parquet")
    val marker = new java.io.File(r, s"_BUILT_$name")
    val srcM = new java.io.File(dir, s"$srcTable.parquet").lastModified
    if (!(marker.exists() && marker.lastModified() >= srcM && f.exists())) {
      r.mkdirs()
      train.coalesce(1).write.mode("overwrite").parquet(f.getPath)
      marker.createNewFile()
      marker.setLastModified(System.currentTimeMillis())
    }
    spark.read.parquet(f.getPath)
  }
}
