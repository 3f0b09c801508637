package graft.operators

import java.nio.file.{Files, StandardCopyOption}

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Persisted build-once model tables (round 17, VERDICT r16 #5;
  * hardened round 18, ADVICE r17 #2).
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
  * — each model persists once as parquet under a corpus-keyed,
  * version-stamped root, mtime-guarded against corpus regeneration,
  * and any later session with the store enabled reads it back
  * bit-identically (model vectors are doubles, lossless through
  * parquet; ArtifactSpec pins persisted ≡ trained, proves the load
  * path actually reads the table, and proves a stale marker forces a
  * retrain).
  *
  * Store root: `graft.modelstore.root` / SPARK_GRAFT_MODEL_ROOT when
  * set — in production that points next to the corpus / into the
  * warehouse, the same trust domain as the data itself. The fallback
  * (this sandbox) is a PER-USER 0700 directory under java.io.tmpdir,
  * so another local user can neither plant nor doctor a model table.
  *
  * Versioning: [[FormatVersion]] is part of the per-corpus directory
  * name. A store written by older training code is thereby INVISIBLE
  * to newer code (retrain, not silently serve) — bump it whenever any
  * `train` derivation or model schema changes.
  *
  * Crash/concurrency contract — WRITE, PUBLISH, THEN MARK:
  *  1. the model parquet is written to a writer-private temp dir;
  *  2. it is published under the final name with an ATOMIC rename —
  *     readers only ever see a complete table, and of two concurrent
  *     writers one wins the rename while the loser discards its temp
  *     and reads the winner's (equivalent by determinism: same
  *     corpus + same code version ⇒ same model);
  *  3. the `_BUILT_<name>` marker is touched LAST, so marker-exists
  *     implies table-complete. A crash between (2) and (3) just
  *     retrains — safe, idempotent.
  *
  * OFF by default: the plain cold floor must keep measuring honest
  * retraining. Enable with SPARK_GRAFT_MODEL_STORE=1 (env, the bench
  * path) or -Dgraft.modelstore=1 (tests). Model row ORDER is not part
  * of the contract — every consumer joins or argmaxes with explicit
  * tiebreaks.
  *
  * Known single-writer window (STALE rebuilds only): when the corpus
  * was REGENERATED, the rebuild deletes the published table before
  * moving the new one in, so a reader concurrent with that rebuild
  * can glimpse a missing table (fresh-corpus publish races are fully
  * closed by the atomic rename). Production posture: corpus
  * regeneration and the model rebuild it forces are one pipeline
  * step in the warehouse trust domain — a single writer by
  * construction; readers arrive after the step commits.
  */
object ModelStore {

  /** Model-format/code version, baked into the store path. Bump when
    * any training derivation or persisted schema changes so stale
    * stores are skipped rather than served. */
  val FormatVersion = 2

  def enabled: Boolean =
    sys.props.get("graft.modelstore")
      .orElse(sys.env.get("SPARK_GRAFT_MODEL_STORE")).contains("1")

  private def configuredRoot: Option[String] =
    sys.props.get("graft.modelstore.root")
      .orElse(sys.env.get("SPARK_GRAFT_MODEL_ROOT"))

  /** Configurable store base; per-user 0700 tmpdir fallback. */
  def storeBase: java.io.File =
    configuredRoot
      .map(new java.io.File(_))
      .getOrElse(new java.io.File(sys.props("java.io.tmpdir"),
        s"graft_models_${sys.props.getOrElse("user.name", "anon")}"))

  /** Corpus-keyed, version-stamped store root. */
  def root(dir: String): java.io.File =
    new java.io.File(storeBase,
      s"${graft.sources.StagePath.key(dir)}_v$FormatVersion")

  private def mkdirsPrivate(d: java.io.File): Unit = {
    d.mkdirs()
    // owner-only ONLY on the default tmpdir fallback (the
    // world-writable-tmpdir risk); an explicitly configured root is
    // the operator's trust domain — possibly shared with other
    // services — so its permissions are left untouched (ADVICE r18 #2)
    if (configuredRoot.isEmpty) {
      val own = java.nio.file.attribute.PosixFilePermissions
        .fromString("rwx------")
      try {
        Files.setPosixFilePermissions(storeBase.toPath, own)
        Files.setPosixFilePermissions(d.toPath, own)
      } catch { case _: UnsupportedOperationException => () }
    }
  }

  /** Fails LOUDLY when a delete returns false while the path still
    * exists (ADVICE r18 #1): a half-deleted stale table must surface
    * as an error, never fall through to the publish-race catch where
    * the marker would re-certify the stale bytes as fresh. A false
    * return with the path gone is a concurrent deleter — fine. */
  private def deleteRecursively(f: java.io.File): Unit = {
    val cs = f.listFiles()
    if (cs != null) cs.foreach(deleteRecursively)
    if (!f.delete() && f.exists())
      throw new java.io.IOException(
        s"ModelStore: could not delete ${f.getPath}")
  }

  /** The model table `name` for corpus `dir`: when the store is
    * enabled and fresh versus `dir/srcTable.parquet`, READ the
    * persisted parquet; otherwise run `train` and publish the result
    * per the write-publish-mark contract above (the re-read
    * guarantees consumers use exactly the bytes a later session will
    * load). Models are bounded artifacts (k·dim centroids, M×K
    * codebooks), so the single-file coalesce is free. */
  def table(spark: SparkSession, dir: String, name: String,
      srcTable: String)(train: => DataFrame): DataFrame = {
    if (!enabled) return train
    val r = root(dir)
    val f = new java.io.File(r, s"$name.parquet")
    val marker = new java.io.File(r, s"_BUILT_$name")
    val srcM = new java.io.File(dir, s"$srcTable.parquet").lastModified
    if (!(marker.exists() && marker.lastModified() >= srcM && f.exists())) {
      mkdirsPrivate(r)
      val tmp = new java.io.File(r, s".$name.tmp_" +
        s"${ProcessHandle.current().pid()}_${System.nanoTime()}")
      train.coalesce(1).write.mode("overwrite").parquet(tmp.getPath)
      // Stale-table removal happens OUTSIDE the race catch: a failed
      // delete throws (see deleteRecursively) before any move, so the
      // catch below can only be reached with f either absent at move
      // time or atomically replaced by a concurrent publisher — never
      // with our half-deleted stale table (ADVICE r18 #1).
      if (f.exists()) deleteRecursively(f) // stale per the marker check
      try {
        Files.move(tmp.toPath, f.toPath, StandardCopyOption.ATOMIC_MOVE)
      } catch {
        // lost the publish race: the winner trained against the same
        // (current) corpus + code version, so its table is equivalent
        case e: java.nio.file.FileSystemException =>
          if (f.exists()) deleteRecursively(tmp) else throw e
      }
      marker.createNewFile()
      marker.setLastModified(System.currentTimeMillis())
    }
    spark.read.parquet(f.getPath)
  }
}
