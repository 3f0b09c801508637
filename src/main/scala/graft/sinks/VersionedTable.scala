package graft.sinks

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Versioned-manifest table commits (SURVEY.md §2 #105): snapshot
  * isolation for a parquet table under CONCURRENT writers — the
  * multi-writer ACID guarantee the reference outsources to BigQuery's
  * `WRITE_APPEND` (/root/reference/dags/stock_data_to_gcp.py:123-136),
  * re-expressed as a filesystem commit log in the public
  * Delta/Iceberg shape:
  *
  *  - `root/_graft_log/v<20-digit>.json` — one immutable action file
  *    per version: the data files this commit adds and removes
  *    (paths relative to root). The TABLE STATE at version N is the
  *    replay of actions 1..N; data files themselves are never listed
  *    by directory.
  *  - Data files land under `root/data/<uuid>/` BEFORE their commit
  *    references them — an uncommitted (or crashed) write is plain
  *    unreferenced bytes, invisible to every reader.
  *  - Commit = publish version R+1 by atomically CREATING the next
  *    log file: `Files.createLink(v{R+1}, tmp)` fails if the name
  *    exists, so of two racing writers exactly one wins the version
  *    (the POSIX twin of an object store's if-none-match conditional
  *    PUT). The loser re-reads the log, checks for a LOGICAL
  *    conflict, and retries on top of the winner.
  *  - Conflict rule: appends add fresh uuid-named files — they
  *    commute with everything, so a losing append just re-commits.
  *    A compaction's `removes` must all still be live; if an
  *    intervening commit removed any of them (another compaction
  *    won), the whole rewrite restarts from the new snapshot.
  *  - Readers pin a snapshot: `snapshot()` resolves the latest
  *    contiguous version once, and the DataFrame reads exactly those
  *    files for its whole lifetime — a concurrent compaction commit
  *    does not make a running query see half-old half-new data.
  *    `vacuum()` deletes unreferenced files and is the only
  *    destructive step; it must lag the longest-running reader (same
  *    retention contract as Delta's VACUUM).
  *
  * At 100 TB the log stays tiny (file LISTS, not data), state replay
  * is O(versions) driver-side metadata work, and the data path is
  * identical to any parquet table — scans, pushdown, partitioning all
  * unchanged. Snapshot resolution is the only listing of `_graft_log`;
  * no data directory is ever listed on the read path.
  */
object VersionedTable {

  private val LogDir = "_graft_log"

  final case class Snapshot(version: Long, files: Seq[String]) {
    def isEmpty: Boolean = files.isEmpty
  }

  private def logDir(root: String) = new java.io.File(root, LogDir)

  private def versionFile(root: String, v: Long) =
    new java.io.File(logDir(root), f"v$v%020d.json")

  private val VersionRe = "v(\\d{20})\\.json".r

  /** Quote a JSON string (paths are uuid/part names — conservative
    * escaping anyway). */
  private def q(s: String): String =
    "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""

  private def unq(s: String): String =
    s.replace("\\\"", "\"").replace("\\\\", "\\")

  private def writeActions(f: java.io.File, adds: Seq[String],
      removes: Seq[String], txn: Option[(String, Long)] = None): Unit = {
    val txnPart = txn.map { case (w, e) =>
      s""","writer":${q(w)},"epoch":$e""" }.getOrElse("")
    val body = s"""{"adds":[${adds.map(q).mkString(",")}],""" +
      s""""removes":[${removes.map(q).mkString(",")}]$txnPart}"""
    java.nio.file.Files.write(f.toPath,
      body.getBytes(java.nio.charset.StandardCharsets.UTF_8))
  }

  private val StrListRe = """"([^"\\]*(?:\\.[^"\\]*)*)"""".r

  private def readActions(f: java.io.File): (Seq[String], Seq[String]) = {
    val s = new String(java.nio.file.Files.readAllBytes(f.toPath),
      java.nio.charset.StandardCharsets.UTF_8)
    def list(key: String): Seq[String] = {
      val m = (s""""$key"\\s*:\\s*\\[([^\\]]*)\\]""").r.findFirstMatchIn(s)
      m.map(g => StrListRe.findAllMatchIn(g.group(1))
        .map(mm => unq(mm.group(1))).toSeq).getOrElse(Seq.empty)
    }
    (list("adds"), list("removes"))
  }

  /** The (writer, epoch) transaction tag of a committed version, if
    * it was an [[appendOnce]] commit. */
  private def readTxn(f: java.io.File): Option[(String, Long)] = {
    val s = new String(java.nio.file.Files.readAllBytes(f.toPath),
      java.nio.charset.StandardCharsets.UTF_8)
    for {
      w <- """"writer"\s*:\s*"([^"\\]*(?:\\.[^"\\]*)*)"""".r
        .findFirstMatchIn(s).map(m => unq(m.group(1)))
      e <- """"epoch"\s*:\s*(-?\d+)""".r.findFirstMatchIn(s)
        .map(_.group(1).toLong)
    } yield (w, e)
  }

  /** Committed versions present in the log, ascending. */
  private def versions(root: String): Seq[Long] =
    Option(logDir(root).listFiles()).getOrElse(Array.empty).toSeq
      .flatMap(f => f.getName match {
        case VersionRe(v) => Some(v.toLong)
        case _ => None
      }).sorted

  /** Resolve the current snapshot: replay the longest CONTIGUOUS
    * version prefix (a gap can only be a listing race with a
    * by-now-committed writer; stopping at it keeps the view a true
    * prefix of history). Version 0 = empty table. */
  def snapshot(root: String): Snapshot = snapshotAt(root, Long.MaxValue)

  /** TIME TRAVEL: the table as of version `asOf` — replay of the
    * contiguous log prefix capped there. Old versions stay readable
    * until [[vacuum]] reclaims their files (the retention window IS
    * the time-travel horizon, as in Delta/Iceberg). */
  def snapshotAt(root: String, asOf: Long): Snapshot = {
    val vs = versions(root)
    val live = new scala.collection.mutable.LinkedHashSet[String]
    var v = 0L
    for (next <- vs) {
      if (next == v + 1 && next <= asOf) {
        val (adds, removes) = readActions(versionFile(root, next))
        removes.foreach(live -= _)
        adds.foreach(live += _)
        v = next
      }
    }
    Snapshot(v, live.toSeq)
  }

  /** DataFrame over a pinned snapshot (the caller's `snap` keeps
    * serving the same files regardless of later commits).
    * SCHEMA EVOLUTION: the snapshot's schema is the UNION of its
    * files' schemas (mergeSchema), so a batch appended with an added
    * column widens the table and older files read the new column as
    * NULL — the additive-evolution contract (Delta's default).
    * Incompatible type changes fail loudly at read, as they should:
    * the log records files, not casts. */
  def read(spark: SparkSession, root: String, snap: Snapshot): DataFrame = {
    require(!snap.isEmpty, s"version ${snap.version} of $root is empty")
    spark.read.option("mergeSchema", "true").parquet(snap.files.map(f =>
      new java.io.File(root, f).getAbsolutePath): _*)
  }

  /** Read the latest committed snapshot. */
  def read(spark: SparkSession, root: String): DataFrame =
    read(spark, root, snapshot(root))

  /** Atomically publish version `v` with the given actions. True iff
    * this writer won the version (hard-link creation is the
    * linearization point — it FAILS if v was already committed). */
  private def tryCommit(root: String, v: Long, adds: Seq[String],
      removes: Seq[String], txn: Option[(String, Long)] = None): Boolean = {
    logDir(root).mkdirs()
    val tmp = new java.io.File(logDir(root),
      s".v$v-${java.util.UUID.randomUUID()}.tmp")
    writeActions(tmp, adds, removes, txn)
    try {
      java.nio.file.Files.createLink(versionFile(root, v).toPath, tmp.toPath)
      true
    } catch {
      case _: java.nio.file.FileAlreadyExistsException => false
    } finally {
      java.nio.file.Files.deleteIfExists(tmp.toPath)
    }
  }

  /** Stage `df` as fresh uuid-named data files (NOT yet visible). */
  private def stage(df: DataFrame, root: String): Seq[String] = {
    val uuid = java.util.UUID.randomUUID().toString
    val dir = new java.io.File(new java.io.File(root, "data"), uuid)
    df.write.parquet(dir.getAbsolutePath)
    Option(dir.listFiles()).getOrElse(Array.empty).toSeq
      .filter(f => f.isFile && f.getName.endsWith(".parquet"))
      .map(f => s"data/$uuid/${f.getName}")
      .sorted
  }

  /** Transactional append: stage the batch, then claim the next
    * version (retrying past concurrent committers — appends commute,
    * so no re-staging is ever needed). `statsCols` names numeric
    * columns whose per-file min/max are recorded next to the staged
    * files ([[readRange]] then skips files from metadata alone — the
    * Delta data-skipping shape). Returns the committed version. */
  def append(df: DataFrame, root: String,
      statsCols: Seq[String] = Seq.empty): Long = {
    val adds = stage(df, root)
    if (statsCols.nonEmpty) writeStats(df.sparkSession, root, adds, statsCols)
    var v = snapshot(root).version + 1
    while (!tryCommit(root, v, adds, Seq.empty)) {
      v = math.max(v + 1, snapshot(root).version + 1)
    }
    v
  }

  /** Per-file [min,max] of `statsCols` (as doubles — exact for the
    * long/double id-and-measure domains stats serve), written as ONE
    * `_stats.json` sidecar in the staged uuid dir. The sidecar lives
    * and dies with its data files: staged before the commit link, so
    * a crashed write leaves only unreferenced bytes, and immutable
    * after (uuid dirs are never rewritten). One extra scan of the
    * JUST-WRITTEN batch — bounded by the batch, not the table. */
  private def writeStats(spark: SparkSession, root: String,
      adds: Seq[String], statsCols: Seq[String]): Unit = {
    import org.apache.spark.sql.functions._
    val uuidDirs = adds.map(f => f.split("/").dropRight(1).mkString("/"))
      .distinct
    uuidDirs.foreach { d =>
      val dir = new java.io.File(root, d)
      val aggs = statsCols.flatMap(c => Seq(
        min(col(c).cast("double")).as(s"min_$c"),
        max(col(c).cast("double")).as(s"max_$c")))
      val rows = spark.read.parquet(dir.getAbsolutePath)
        .groupBy(input_file_name().as("_f"))
        .agg(aggs.head, aggs.tail: _*)
        .collect()
      val body = rows.map { r =>
        val fname = r.getString(0).split("/").last
        val cols = statsCols.map { c =>
          val mn = r.getAs[Any](s"min_$c")
          val mx = r.getAs[Any](s"max_$c")
          s"${q(c)}:[${mn},${mx}]"
        }.mkString(",")
        s"${q(fname)}:{$cols}"
      }.mkString("{", ",", "}")
      java.nio.file.Files.write(
        new java.io.File(dir, "_stats.json").toPath,
        body.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    }
  }

  /** The [min,max] recorded for (file, col), if its uuid dir carries
    * a stats sidecar naming both. */
  private def fileStats(root: String, file: String,
      colName: String): Option[(Double, Double)] = {
    val dir = new java.io.File(root, file).getParentFile
    val sidecar = new java.io.File(dir, "_stats.json")
    if (!sidecar.exists()) return None
    val s = new String(java.nio.file.Files.readAllBytes(sidecar.toPath),
      java.nio.charset.StandardCharsets.UTF_8)
    val fname = file.split("/").last
    val fileRe = (java.util.regex.Pattern.quote(q(fname)) +
      """\s*:\s*\{([^}]*)\}""").r
    for {
      block <- fileRe.findFirstMatchIn(s).map(_.group(1))
      m <- (java.util.regex.Pattern.quote(q(colName)) +
        """\s*:\s*\[([^,\]]+),([^\]]+)\]""").r.findFirstMatchIn(block)
      // an all-NULL file records "null" bounds — unparseable → kept
      mn <- m.group(1).toDoubleOption
      mx <- m.group(2).toDoubleOption
    } yield (mn, mx)
  }

  /** DATA-SKIPPING READ: the snapshot restricted to `lo <= col <= hi`,
    * with files whose recorded [min,max] cannot intersect the range
    * skipped FROM METADATA ALONE — no footer is opened for a skipped
    * file, which at 100 TB is the difference between a metadata
    * lookup and a million file opens. Files without stats (appended
    * without `statsCols`, or a column the writer didn't record) are
    * conservatively read; the residual predicate is applied either
    * way, so pruning is a pure optimization, never a correctness
    * dependence. NULL semantics: a NULL never satisfies the range,
    * and min/max aggregates ignore NULLs, so an all-NULL file
    * (stats NULL → unparseable → kept) still filters correctly. */
  def readRange(spark: SparkSession, root: String, colName: String,
      lo: Double, hi: Double): DataFrame = {
    import org.apache.spark.sql.functions._
    val snap = snapshot(root)
    require(!snap.isEmpty, s"readRange on empty table $root")
    val keep = snap.files.filter(f => fileStats(root, f, colName) match {
      case Some((mn, mx)) => mx >= lo && mn <= hi
      case None => true
    })
    val df =
      if (keep.isEmpty) read(spark, root, snap).limit(0)
      else spark.read.parquet(keep.map(f =>
        new java.io.File(root, f).getAbsolutePath): _*)
    df.filter(col(colName).cast("double") >= lo &&
      col(colName).cast("double") <= hi)
  }

  /** Files [[readRange]] would open (exposed for the pruning spec). */
  private[graft] def rangeFiles(root: String, colName: String,
      lo: Double, hi: Double): Seq[String] =
    snapshot(root).files.filter(f => fileStats(root, f, colName) match {
      case Some((mn, mx)) => mx >= lo && mn <= hi
      case None => true
    })

  /** Per-column [lo,hi] bounds provable from the TOP-LEVEL AND
    * conjuncts of `pred`: `c >= 5 && c < 9 && f(x)` yields
    * `c -> [5, 9]`. Sound for pruning because a conjunct false over a
    * whole file makes the conjunction false there — unrecognized
    * conjuncts (UDFs, ORs, arithmetic) are simply ignored, they can
    * only narrow the match set further. Numeric literals only, the
    * domain [[writeStats]] records (doubles are exact there). */
  private[graft] def predicateRanges(
      pred: org.apache.spark.sql.Column): Map[String, (Double, Double)] =
    org.apache.spark.sql.GraftSqlBridge.predicateRanges(pred)

  /** `files` minus those whose recorded stats PROVE no row can satisfy
    * `ranges` (statless files/columns are kept — same conservative
    * contract as [[readRange]]). */
  private[graft] def statsCandidates(root: String, files: Seq[String],
      ranges: Map[String, (Double, Double)]): Seq[String] =
    files.filter { f =>
      ranges.forall { case (c, (lo, hi)) =>
        fileStats(root, f, c) match {
          case Some((mn, mx)) => mx >= lo && mn <= hi
          case None => true
        }
      }
    }

  /** The version committed by `(writer, epoch)`, if any — scans the
    * contiguous log prefix (driver-side metadata, O(versions)).
    * Public as the "has this batch landed?" probe a scheduler uses to
    * skip completed partitions without recomputing them. */
  def committedEpoch(root: String, writer: String,
      epoch: Long): Option[Long] =
    versions(root).find(v =>
      readTxn(versionFile(root, v)).contains((writer, epoch)))

  /** EXACTLY-ONCE append for replayable sources: the commit carries a
    * `(writer, epoch)` transaction tag, and a replay of an
    * already-committed epoch (a restarted streaming query re-running
    * its last microbatch — the foreachBatch at-least-once contract)
    * is detected in the log and becomes a no-op, its staged files
    * left unreferenced for [[vacuum]]. One writer never runs the same
    * epoch concurrently with itself (Structured Streaming serializes
    * a query's microbatches), so the check-then-commit here needs no
    * extra fencing: a lost race on the VERSION number is re-checked
    * against the log before every retry. Returns the committed
    * version (the original one on replay). */
  def appendOnce(df: DataFrame, root: String, writer: String,
      epoch: Long): Long = {
    committedEpoch(root, writer, epoch) match {
      case Some(v) => v
      case None =>
        val adds = stage(df, root)
        var v = snapshot(root).version + 1
        var done = -1L
        while (done < 0) {
          if (tryCommit(root, v, adds, Seq.empty, Some((writer, epoch))))
            done = v
          else committedEpoch(root, writer, epoch) match {
            case Some(prior) => // replayed concurrently-visible commit
              adds.foreach(f => java.nio.file.Files.deleteIfExists(
                new java.io.File(root, f).toPath))
              done = prior
            case None => v = math.max(v + 1, snapshot(root).version + 1)
          }
        }
        done
    }
  }

  /** CHANGES FEED: the rows added by append commits in
    * `(sinceVersion, snapshot.version]` — the incremental input a
    * downstream training-data pass reads instead of the whole table
    * ("every document since my last checkpoint"). Rewrite commits
    * (non-empty `removes` — compactions) move bytes, not data, so
    * they never surface here; the feed is exactly the appended
    * batches. Files are served from the original append commits, so
    * the feed for a version range is valid until [[vacuum]] reclaims
    * files a later compaction superseded — the same retention
    * contract as the snapshot readers'. Returns an empty DataFrame
    * (correct schema) when nothing changed. */
  def changes(spark: SparkSession, root: String,
      sinceVersion: Long): DataFrame = {
    val snap = snapshot(root)
    val added = versions(root)
      .filter(v => v > sinceVersion && v <= snap.version)
      .flatMap { v =>
        val (adds, removes) = readActions(versionFile(root, v))
        if (removes.isEmpty) adds else Seq.empty
      }
    if (added.isEmpty) {
      require(!snap.isEmpty,
        s"changes($sinceVersion) on empty table $root: no schema to serve")
      read(spark, root, snap).limit(0)
    } else
      spark.read.option("mergeSchema", "true").parquet(added.map(f =>
        new java.io.File(root, f).getAbsolutePath): _*)
  }

  /** Transactional compaction: rewrite the current snapshot into
    * ceil(bytes/target) right-sized files and commit
    * {adds=new, removes=old snapshot files}. If a concurrent commit
    * REMOVED any file this rewrite read (a racing compaction won),
    * the rewrite is stale — its output is discarded and the whole
    * step restarts from the fresh snapshot. Concurrent APPENDs
    * commute (their files are not in `removes`) and stay live.
    * `statsCols` re-records data-skipping stats on the rewrite —
    * AND range-clusters the output on those columns first
    * (repartitionByRange), so each rewritten file covers a tight
    * value slice and [[readRange]] keeps pruning after compaction
    * instead of falling back to read-everything. Returns the
    * committed version, or -1 if the table was empty. */
  def compact(spark: SparkSession, root: String,
      targetBytes: Long = 128L * 1024 * 1024,
      statsCols: Seq[String] = Seq.empty): Long = {
    var committed = -1L
    var done = false
    while (!done) {
      val snap = snapshot(root)
      if (snap.isEmpty) return -1L
      val bytes = snap.files
        .map(f => new java.io.File(root, f).length()).sum
      val nFiles = math.max(1, ((bytes + targetBytes - 1) / targetBytes).toInt)
      val content = read(spark, root, snap)
      val shaped =
        if (statsCols.isEmpty) content.coalesce(nFiles)
        else content.repartitionByRange(nFiles,
          statsCols.map(org.apache.spark.sql.functions.col): _*)
      val adds = stage(shaped, root)
      if (statsCols.nonEmpty) writeStats(spark, root, adds, statsCols)
      var v = snap.version + 1
      var stale = false
      while (!done && !stale) {
        if (tryCommit(root, v, adds, snap.files)) {
          committed = v
          done = true
        } else {
          // someone committed v first: if they removed any of OUR
          // inputs, this rewrite no longer covers the table — restart
          val newer = versions(root).filter(_ > snap.version)
          stale = newer.exists { nv =>
            val (_, removes) = readActions(versionFile(root, nv))
            removes.exists(snap.files.contains)
          }
          if (!stale) v = math.max(v + 1, snapshot(root).version + 1)
          else adds.foreach(f =>
            java.nio.file.Files.deleteIfExists(
              new java.io.File(root, f).toPath))
        }
      }
    }
    committed
  }

  /** #105 driver-gate query: two day-batches committed as versions,
    * then a compaction commit and a vacuum — the read-back aggregate
    * proves the whole protocol preserves exactly-once content (the
    * oracle aggregates the same two days straight from the source).
    * The ScalaTest suite covers what SQL can't see: concurrent
    * writers, crash windows, pinned snapshots. */
  def versionedCommits(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val root = new java.io.File(sys.props("java.io.tmpdir"),
      s"graft_vtable_${graft.sources.StagePath.key(dir)}").getPath
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
    append(graft.sources.Tables.loadEventsRange(spark, dir,
      "2024-01-01 00:00:00", "2024-01-02 00:00:00"), root)
    append(graft.sources.Tables.loadEventsRange(spark, dir,
      "2024-01-02 00:00:00", "2024-01-03 00:00:00"), root)
    compact(spark, root)
    vacuum(root, retentionMs = 0L) // single-writer table, quiesced here
    read(spark, root)
      .groupBy(to_date(col("ts")).as("batch_date"))
      .agg(count(lit(1)).as("n_events"),
        graft.operators.Num.dsum(col("value")).as("sum_value"))
      .orderBy("batch_date")
  }

  /** COPY-ON-WRITE DELETE: remove the rows matching `predicate` —
    * the opt-out/right-to-be-forgotten pass a training corpus must
    * support. One job finds the files that CONTAIN matches
    * (`input_file_name` over the pinned snapshot, predicate pushed to
    * the scan, so row-group stats prune untouched files before they
    * are read); ONLY those files are rewritten without their matching
    * rows — at 100 TB the rewrite is proportional to the files hit,
    * not the table. Commit = {adds = rewrites, removes = touched};
    * the conflict rule is compaction's (every removed file must still
    * be live), retried from a fresh snapshot on loss — concurrent
    * APPENDS commute (their rows were not in the snapshot this
    * delete read; the semantics are snapshot-scoped, as in Delta).
    * SQL DELETE semantics: rows where the predicate is NULL are
    * KEPT. Returns the committed version, or -1 if nothing matched.
    * The changes feed is an APPEND feed — deletes, like compactions,
    * never surface there; deleted rows disappear from snapshots. */
  def deleteWhere(spark: SparkSession, root: String,
      predicate: org.apache.spark.sql.Column): Long = {
    import org.apache.spark.sql.functions._
    val ranges = predicateRanges(predicate)
    while (true) {
      val snap = snapshot(root)
      if (snap.isEmpty) return -1L
      // metadata prune FIRST: files whose _stats.json [min,max] cannot
      // satisfy the predicate's provable bounds are never opened by
      // the discovery scan — on a range-clustered 100 TB table a
      // narrow delete touches a handful of files, and this keeps the
      // discovery cost (and the collected file set) proportional to
      // the candidates, not the table
      val candidates =
        if (ranges.isEmpty) snap.files
        else statsCandidates(root, snap.files, ranges)
      if (candidates.isEmpty) return -1L
      val pruned = spark.read.option("mergeSchema", "true")
        .parquet(candidates.map(f =>
          new java.io.File(root, f).getAbsolutePath): _*)
      // schema evolution guard: a predicate column carried only by
      // non-candidate files cannot resolve over the pruned read
      // (classic Datasets analyze eagerly, so the failure is here,
      // not at the action) — fall back to the full snapshot
      val discovery =
        try pruned.filter(predicate)
        catch {
          case _: org.apache.spark.sql.AnalysisException =>
            read(spark, root, snap).filter(predicate)
        }
      val touchedAbs = discovery
        .select(input_file_name().as("f")).distinct()
        .collect().map(_.getString(0)).toSet
      // uuid-named rel paths are unique — suffix-match the URI forms
      // input_file_name reports
      val touched = snap.files.filter(f =>
        touchedAbs.exists(_.endsWith("/" + f)))
      if (touched.isEmpty) return -1L
      val kept = spark.read.option("mergeSchema", "true")
        .parquet(touched.map(f =>
          new java.io.File(root, f).getAbsolutePath): _*)
        .filter(coalesce(predicate, lit(false)) === false)
      val adds = stage(kept, root)
      var v = snap.version + 1
      var stale = false
      while (!stale) {
        if (tryCommit(root, v, adds, touched)) return v
        val newer = versions(root).filter(_ > snap.version)
        stale = newer.exists { nv =>
          val (_, removes) = readActions(versionFile(root, nv))
          removes.exists(touched.contains)
        }
        if (!stale) v = math.max(v + 1, snapshot(root).version + 1)
        else adds.foreach(f => java.nio.file.Files.deleteIfExists(
          new java.io.File(root, f).toPath))
      }
    }
    -1L // unreachable
  }

  /** #107 driver-gate query: three day-batches appended as versions
    * with a compaction in between, then the CHANGES FEED read from
    * the first version — the incremental-consumer contract (new data
    * only, rewrites invisible). The oracle aggregates days 2-3
    * straight from the source: feed content == appended batches. */
  def versionedChanges(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val root = new java.io.File(sys.props("java.io.tmpdir"),
      s"graft_vtable_cdc_${graft.sources.StagePath.key(dir)}").getPath
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
    val mark = append(graft.sources.Tables.loadEventsRange(spark, dir,
      "2024-01-01 00:00:00", "2024-01-02 00:00:00"), root)
    append(graft.sources.Tables.loadEventsRange(spark, dir,
      "2024-01-02 00:00:00", "2024-01-03 00:00:00"), root)
    compact(spark, root) // rewrite only: must NOT surface in the feed
    append(graft.sources.Tables.loadEventsRange(spark, dir,
      "2024-01-03 00:00:00", "2024-01-04 00:00:00"), root)
    changes(spark, root, mark)
      .groupBy(to_date(col("ts")).as("batch_date"))
      .agg(count(lit(1)).as("n_events"),
        graft.operators.Num.dsum(col("value")).as("sum_value"))
      .orderBy("batch_date")
  }

  /** #109 driver-gate query: an INCREMENTALLY MAINTAINED aggregate
    * over the changes feed — the "don't rescan 100 TB for yesterday's
    * rows" pattern. Two CDC pulls (pinned at call time, so each pull
    * serves exactly the appends it saw) are reduced to MERGEABLE
    * partials (counts + exact decimal sums) and merged; a compaction
    * between the pulls proves rewrites contribute nothing. The oracle
    * recomputes the same aggregate from scratch over the source —
    * incremental == full recompute, bit-exact, because the partials
    * re-sum exactly. */
  def incrementalCdcAgg(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val root = new java.io.File(sys.props("java.io.tmpdir"),
      s"graft_vtable_inc_${graft.sources.StagePath.key(dir)}").getPath
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
    append(graft.sources.Tables.loadEventsRange(spark, dir,
      "2024-01-01 00:00:00", "2024-01-02 00:00:00"), root)
    append(graft.sources.Tables.loadEventsRange(spark, dir,
      "2024-01-02 00:00:00", "2024-01-03 00:00:00"), root)
    def partial(feed: DataFrame): DataFrame = feed
      .groupBy(to_date(col("ts")).as("batch_date"))
      .agg(count(lit(1)).as("n"),
        graft.operators.Num.dsumExact(col("value")).as("p"))
    val pull1 = partial(changes(spark, root, 0L)) // file list pinned NOW
    val mark = snapshot(root).version
    compact(spark, root) // rewrite between the pulls: invisible to CDC
    append(graft.sources.Tables.loadEventsRange(spark, dir,
      "2024-01-03 00:00:00", "2024-01-04 00:00:00"), root)
    val pull2 = partial(changes(spark, root, mark))
    pull1.unionByName(pull2)
      .groupBy("batch_date")
      .agg(sum(col("n")).as("n_events"),
        sum(col("p")).cast("double").as("sum_value"))
      .orderBy("batch_date")
  }

  /** Default vacuum retention: 7 days, the Delta VACUUM default. Any
    * honest writer stages and commits within this horizon, so files
    * younger than it may belong to an in-flight commit and must not
    * be swept. */
  val DefaultRetentionMs: Long = 7L * 24 * 60 * 60 * 1000

  /** Delete data files the LATEST snapshot does not list (superseded
    * by compaction, or staged by a writer that crashed before its
    * commit) AND older than `retentionMs` (mtime-based, the Delta
    * VACUUM contract). The retention window is the correctness
    * guard, not a convenience: every writer stages its files BEFORE
    * publishing the commit link, so an unreferenced-but-recent file
    * may be a live writer mid-commit — sweeping it would make the
    * subsequent commit reference missing files. With the default
    * window, concurrent vacuum is safe against any writer that
    * commits within 7 days of staging. `retentionMs = 0` force-sweeps
    * everything unreferenced (tests / known-quiesced tables ONLY).
    * Destructive for time travel — breaks readers pinned to older
    * snapshots. Returns the deleted count. */
  def vacuum(root: String, retentionMs: Long = DefaultRetentionMs): Int = {
    val live = snapshot(root).files.toSet
    val sweepBefore = System.currentTimeMillis() - retentionMs
    val dataRoot = new java.io.File(root, "data")
    var n = 0
    for {
      uuidDir <- Option(dataRoot.listFiles()).getOrElse(Array.empty)
      if uuidDir.isDirectory
      // "_"-prefixed metadata sidecars (stats) live and die with
      // their dir's DATA files: kept while any is referenced, swept
      // with the last one
      dirLive = live.exists(_.startsWith(s"data/${uuidDir.getName}/"))
      f <- Option(uuidDir.listFiles()).getOrElse(Array.empty)
      if f.isFile && !f.getName.startsWith(".")
      if !(f.getName.startsWith("_") && dirLive)
      rel = s"data/${uuidDir.getName}/${f.getName}"
      if f.getName.startsWith("_") || !live.contains(rel)
      if f.lastModified() < sweepBefore
    } {
      if (f.delete()) n += 1
      uuidDir.delete() // succeeds only once empty — harmless otherwise
    }
    n
  }
}
