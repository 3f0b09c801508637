package graft

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Discipline for the corpus-keyed build-once/query-many caches
  * (centroid models, graph fixed points, probe scalars, percentile
  * geometry). Two hazards the raw `computeIfAbsent` pattern leaves
  * open (ADVICE r14):
  *
  *  - **unbounded growth**: keys carry corpus mtimes, so every corpus
  *    regeneration mints new entries forever. Every cache is capped at
  *    [[MaxEntries]] with a full clear() — the `Dimensional.chainCache`
  *    precedent; entries are cheap to rebuild (one bounded probe), so
  *    eviction precision isn't worth per-entry bookkeeping.
  *  - **dead-session DataFrames**: a cached `localCheckpoint`'d
  *    DataFrame is pinned to the SparkSession (and executor blocks)
  *    that created it; a session restart in the same JVM would be
  *    served a dead plan. [[df]] re-validates the cached frame's
  *    session against the caller's before reuse and recomputes on
  *    mismatch. Driver-value caches (scalars, collected geometry,
  *    model Seqs) are session-independent and need only the cap.
  */
object CorpusCache {

  /** Entries per cache before a full clear — generous for real use
    * (a long-lived service sees a handful of live corpora) while
    * bounding a corpus-regeneration loop. */
  val MaxEntries = 64

  // Registry of every cache map that has passed through value()/df()
  // or register(), identity-keyed — lets clearAll() drop all
  // corpus-keyed artifacts at once (the bench's cold mode, VERDICT
  // r15 #6: the build-once cost must be measurable, not silently
  // amortized into the floor). MUST be IDENTITY-based: java.util.Map
  // hashCode/equals are content-based, so a hash-keyed set treats
  // every empty cache as the same element (maps registered while
  // empty silently dropped — caught live by a ×100 cold BenchOne
  // whose first rep read a cache clearAll never reached) and a
  // mutated key's bucket goes stale.
  private val registry = java.util.Collections.synchronizedSet(
    java.util.Collections.newSetFromMap(
      new java.util.IdentityHashMap[ConcurrentHashMap[_, _],
        java.lang.Boolean]))

  /** Enroll a module-private artifact cache that manages its own
    * computeIfAbsent (the Similarity model caches, Pctl geometry,
    * the BPE merge table) so [[clearAll]] reaches it too. */
  def register[M <: ConcurrentHashMap[_, _]](m: M): M = {
    registry.add(m)
    m
  }

  /** Drop every registered corpus-keyed artifact (cold-start state:
    * the next call of each operator pays its build-once probe).
    * Iteration over a synchronizedSet requires holding its monitor. */
  def clearAll(): Unit = registry.synchronized {
    registry.forEach(m => m.clear())
  }

  /** Capped computeIfAbsent for session-independent driver values. */
  def value[V](m: ConcurrentHashMap[String, V], k: String)(
      compute: => V): V = {
    registry.add(m)
    if (m.size > MaxEntries) m.clear()
    m.computeIfAbsent(k, _ => compute)
  }

  /** Capped computeIfAbsent for cached DataFrames, re-validated
    * against the active session (a dead session's frame is replaced,
    * not served). */
  def df(m: ConcurrentHashMap[String, DataFrame], k: String,
      spark: SparkSession)(compute: => DataFrame): DataFrame = {
    registry.add(m)
    if (m.size > MaxEntries) m.clear()
    val cur = m.get(k)
    if (cur != null && (cur.sparkSession eq spark) &&
        !spark.sparkContext.isStopped) cur
    else {
      val v = compute
      m.put(k, v)
      v
    }
  }
}
