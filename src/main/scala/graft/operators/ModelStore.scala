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
  * Crash/concurrency contract — IMMUTABLE GENERATIONS + ATOMIC
  * POINTER (round 20, ADVICE r19 #1/#2; replaces the r18/r19
  * delete-in-place protocol, whose concurrent-rebuilder race the
  * ArtifactSpec two-publisher test reproduced live):
  *  1. each publish trains into a fresh writer-private GENERATION
  *     dir `<name>_g<pid>_<nanos>.parquet` — never written to by
  *     anyone else, complete when Spark's `_SUCCESS` lands;
  *  2. the `_BUILT_<name>` POINTER file names the current generation
  *     and is replaced with an ATOMIC rename of a whole tmp pointer
  *     file (POSIX rename(2) — readers always resolve EITHER the old
  *     complete generation or the new one, never a partial table and
  *     never a missing path). Pointer mtime is the freshness marker
  *     versus the corpus parquet's mtime;
  *  3. a writer that finds the pointer already fresh AFTER training
  *     (it lost a publish race) discards its own generation and
  *     serves the winner's — equivalent by determinism: same corpus
  *     + same code version ⇒ same model;
  *  4. superseded generations are reclaimed by a GRACE-window GC at
  *     the start of a later rebuild: only non-pointed, `_SUCCESS`-
  *     complete generation dirs untouched for [[GcGraceMs]] are
  *     deleted, so in-flight writers and in-flight readers of a
  *     just-superseded generation are never yanked. A crash mid-train
  *     leaks at most its own incomplete generation until a post-grace
  *     rebuild reclaims it.
  *
  * OFF by default: the plain cold floor must keep measuring honest
  * retraining. Enable with SPARK_GRAFT_MODEL_STORE=1 (env, the bench
  * path) or -Dgraft.modelstore=1 (tests). Model row ORDER is not part
  * of the contract — every consumer joins or argmaxes with explicit
  * tiebreaks.
  *
  * Concurrency posture: fresh publishes AND stale rebuilds are both
  * glimpse-free for readers (the pointer never dangles, and a
  * superseded generation outlives its readers by the grace window).
  * The residual cost of lock-free directory GC is a BOUNDED leak:
  * a generation superseded in the swap window between a racer's
  * publish and re-check sticks around until a later rebuild's grace
  * GC — one same-content dir per lost race, reclaimed on the next
  * corpus regeneration. Production posture stays single-writer per
  * pipeline step (corpus regeneration and the model rebuild it
  * forces are one step in the warehouse trust domain), where none of
  * these races arise.
  */
object ModelStore {

  /** Model-format/code version, baked into the store path. Bump when
    * any training derivation or persisted schema changes so stale
    * stores are skipped rather than served. v3: the
    * generation+pointer store layout (a v2 fixed-name store is
    * invisible to it and vice versa — no migration path needed). */
  val FormatVersion = 3

  /** Grace before a non-pointed complete generation is GC-eligible:
    * long enough that any reader or racing writer of a superseded
    * generation has finished (training + a full suite read are
    * minutes), short enough that rebuild-time GC actually reclaims
    * crash leftovers. */
  val GcGraceMs: Long = 60L * 60 * 1000

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
    // services — so its permissions are left untouched (ADVICE r18 #2).
    if (configuredRoot.isEmpty) {
      val own = java.nio.file.attribute.PosixFilePermissions
        .fromString("rwx------")
      try {
        Files.setPosixFilePermissions(storeBase.toPath, own)
        Files.setPosixFilePermissions(d.toPath, own)
      } catch { case _: UnsupportedOperationException => () }
    } else {
      // A configured root keeps its permissions, but its OWNERSHIP is
      // verified (ADVICE r19 #3): the pre-fix chmod failed loudly on
      // a root pre-created by another local user, and dropping it
      // silently turned "hostile pre-created root under a shared
      // directory" into "planted model tables get served". Restore
      // the loud failure without touching the directory: owner must
      // be the current user. Non-POSIX filesystems (no owner
      // attribute) skip the check, same as the chmod path always did.
      try {
        val owner = Files.getOwner(storeBase.toPath).getName
        val me = sys.props.getOrElse("user.name", "")
        if (owner != me)
          throw new SecurityException(
            s"ModelStore: configured root ${storeBase.getPath} is owned " +
              s"by '$owner', not the current user '$me' — refusing to " +
              "serve model tables from a directory another user controls")
      } catch { case _: UnsupportedOperationException => () }
    }
  }

  /** Fails LOUDLY when a delete returns false while the path still
    * exists (ADVICE r18 #1): a half-deleted table must surface as an
    * error, never silently pass. A false return with the path gone is
    * a concurrent deleter — fine. */
  private def deleteRecursively(f: java.io.File): Unit = {
    val cs = f.listFiles()
    if (cs != null) cs.foreach(deleteRecursively)
    if (!f.delete() && f.exists())
      throw new java.io.IOException(
        s"ModelStore: could not delete ${f.getPath}")
  }

  /** The pointer file for model `name` — its CONTENT is the current
    * generation dir's simple name, its MTIME the freshness stamp. */
  private def pointer(r: java.io.File, name: String): java.io.File =
    new java.io.File(r, s"_BUILT_$name")

  /** The currently published generation dir for `name`, if the
    * pointer resolves to an existing directory (spec hook + the read
    * path's resolution step). */
  def currentTable(dir: String, name: String): Option[java.io.File] = {
    val r = root(dir)
    val p = pointer(r, name)
    if (!p.exists()) None
    else {
      val gen = new java.io.File(r,
        new String(Files.readAllBytes(p.toPath), "UTF-8").trim)
      // only a child of the store root is ever served (the pointer is
      // inside the trust domain, but a corrupt one must not escape it)
      if (gen.getParentFile == null ||
          gen.getParentFile.getCanonicalFile != r.getCanonicalFile ||
          !gen.isDirectory) None
      else Some(gen)
    }
  }

  /** The model table `name` for corpus `dir`: when the store is
    * enabled and the pointer is fresh versus `dir/srcTable.parquet`,
    * READ the pointed generation; otherwise run `train` into a new
    * generation and publish it per the generation+pointer contract
    * above (the re-read guarantees consumers use exactly the bytes a
    * later session will load). Models are bounded artifacts (k·dim
    * centroids, M×K codebooks), so the single-file coalesce is free. */
  def table(spark: SparkSession, dir: String, name: String,
      srcTable: String)(train: => DataFrame): DataFrame = {
    if (!enabled) return train
    val r = root(dir)
    val p = pointer(r, name)
    val srcM = new java.io.File(dir, s"$srcTable.parquet").lastModified
    def fresh: Option[java.io.File] =
      if (p.exists() && p.lastModified() >= srcM) currentTable(dir, name)
      else None
    fresh match {
      case Some(gen) => spark.read.parquet(gen.getPath)
      case None =>
        mkdirsPrivate(r)
        gcStale(r, name)
        val uniq = s"${ProcessHandle.current().pid()}_${System.nanoTime()}"
        val gen = new java.io.File(r, s"${name}_g$uniq.parquet")
        // Every failure path from here reclaims the writer-private
        // generation (ADVICE r19 #1: its unique name means no later
        // run ever overwrites a leaked copy) — hence the catch-all.
        try {
          train.coalesce(1).write.mode("overwrite").parquet(gen.getPath)
          // lost-race check AFTER the (minutes-long) train: a racer
          // that published a fresh model meanwhile trained against
          // the same corpus + code version ⇒ equivalent table. Serve
          // theirs, reclaim ours — our generation was never pointed,
          // so nobody can be reading it.
          fresh match {
            case Some(winner) =>
              deleteRecursively(gen)
              spark.read.parquet(winner.getPath)
            case None =>
              val tmpPtr = new java.io.File(r, s".${name}.ptr_$uniq")
              Files.write(tmpPtr.toPath, gen.getName.getBytes("UTF-8"))
              // POSIX rename(2): replaces any existing pointer in one
              // atomic step — a reader resolves either the previous
              // complete generation or this one, never neither
              Files.move(tmpPtr.toPath, p.toPath,
                StandardCopyOption.REPLACE_EXISTING,
                StandardCopyOption.ATOMIC_MOVE)
              p.setLastModified(System.currentTimeMillis())
              spark.read.parquet(gen.getPath)
          }
        } catch {
          case e: Throwable =>
            // best-effort reclaim, never masking the real failure —
            // but ONLY while unpublished (a published generation has
            // readers; the pointer must keep resolving)
            try {
              if (currentTable(dir, name).forall(_ != gen) && gen.exists())
                deleteRecursively(gen)
            } catch { case _: Throwable => () }
            throw e
        }
    }
  }

  /** Grace-window GC, run when a REBUILD starts: reclaims generation
    * dirs for `name` that are (a) not the currently pointed one,
    * (b) `_SUCCESS`-complete — an in-flight writer's dir is never
    * touched — and (c) untouched for [[GcGraceMs]], so a reader
    * mid-scan of a just-superseded generation is never yanked.
    * Best-effort and delete-race-tolerant by design. */
  private def gcStale(r: java.io.File, name: String): Unit = {
    val pointed = Option(pointer(r, name))
      .filter(_.exists())
      .map(f => new String(
        try Files.readAllBytes(f.toPath) catch { case _: Exception => Array[Byte]() },
        "UTF-8").trim)
    val cutoff = System.currentTimeMillis() - GcGraceMs
    val gens = Option(r.listFiles()).getOrElse(Array.empty)
      .filter { d =>
        d.getName.startsWith(s"${name}_g") &&
        d.getName.endsWith(".parquet") &&
        !pointed.contains(d.getName) &&
        d.isDirectory &&
        new java.io.File(d, "_SUCCESS").exists() &&
        d.lastModified() < cutoff
      }
    gens.foreach { d =>
      try deleteRecursively(d)
      catch { case e: Exception =>
        System.err.println(s"[modelstore] gc skipped ${d.getName}: " +
          e.getMessage)
      }
    }
    // stale tmp pointer files from crashed publishers age out too
    Option(r.listFiles()).getOrElse(Array.empty)
      .filter(f => f.getName.startsWith(s".$name.ptr_") &&
        f.lastModified() < cutoff)
      .foreach(f => try f.delete() catch { case _: Exception => () })
  }
}
