package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables
import graft.functions.AggFunctions

/** Heavy-hitters reporting (SURVEY.md §2 #91): the most frequent
  * keys of a stream via the mergeable Misra-Gries sketch — the
  * hot-key report (top tickers by activity, dominant crawl domains)
  * that a plain groupBy-count answers only by shuffling the FULL key
  * domain. The sketch aggregation is a single reduce of
  * O(capacity) state: at 100 TB the shuffle carries one bounded
  * sketch per task, not one row per distinct key.
  *
  * With [[Capacity]] above the observed key domain the counts are
  * exact and `max_err` = 0 — that regime is DuckDB-oracled; past
  * capacity the MG bounds hold (est ≤ true ≤ est+max_err, no heavy
  * key missing), property-tested in FrequencySpec.
  */
object Frequency {

  /** Tracked-candidate budget: ~128 KB of sketch state per task —
    * far above the testdata's key domain (exact regime) and still
    * O(1) in the row count at any scale. */
  val Capacity = 8192

  /** Report keys with est+err ≥ rows/HitFraction — the MG superset
    * rule, which can never drop a qualifying key. */
  val HitFraction = 200L

  /** #91 Heavy hitters over the event stream's ticker key. One
    * sketch aggregate + one bounded explode; the threshold derives
    * from the same single-row aggregate (no second scan). */
  def heavyHitters(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "events")
      .agg(AggFunctions.freqSketch(col("user_id"), Capacity).as("sk"),
        count(lit(1)).as("n_total"))
      .select(col("n_total"), col("sk.max_err").as("max_err"),
        explode(col("sk.items")).as("it"))
      .filter(col("it.est") + col("max_err") >=
        expr(s"n_total DIV $HitFraction"))
      .select(col("it.item").as("item"), col("it.est").as("est_count"),
        col("max_err"))
      .orderBy("item")
}
