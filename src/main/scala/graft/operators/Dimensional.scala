package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Warehouse dimension/journey operators (SURVEY.md §2 #87-88):
  * SCD Type-2 history construction and a staged conversion funnel —
  * the two classic "table you actually ship" shapes a warehouse
  * builds on top of the reference's appended event stream
  * (`WRITE_APPEND`, /root/reference/dags/stock_data_to_gcp.py:123-136).
  *
  * Scale notes (§5): both operators shuffle once on the entity key;
  * SCD change-compression windows are per-key ordered scans with
  * O(1) state, and the funnel's stage joins are user-keyed equi-joins
  * (broadcast at small SF, hash at scale — never inequality-only).
  */
object Dimensional {

  /** #87 SCD Type-2 dimension build: compress each ticker's price
    * stream to its CHANGE points (drop no-op updates — the defining
    * SCD2 move), then version the survivors with
    * [effective_from, effective_to) validity ranges; the open row is
    * `is_current`. Two windows over the same (user, ts, event_id)
    * order — Catalyst shares one sort/shuffle. */
  def scd2Dim(spark: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy("user_id")
      .orderBy(col("ts"), col("event_id"))
    val changes = Tables.load(spark, dir, "events")
      .filter(col("event_type") === "purchase")
      .withColumn("prev_value", lag(col("value"), 1).over(byUser))
      .filter(col("prev_value").isNull ||
        col("value") =!= col("prev_value"))
    val byChange = Window.partitionBy("user_id")
      .orderBy(col("ts"), col("event_id"))
    changes
      .withColumn("version", row_number().over(byChange).cast("long"))
      .withColumn("effective_to", lead(col("ts"), 1).over(byChange))
      .select(col("user_id").as("ticker_id"), col("version"),
        col("ts").as("effective_from"), col("effective_to"),
        col("value").as("price"),
        col("effective_to").isNull.cast("long").as("is_current"))
      .orderBy("ticker_id", "version")
  }

  /** #94 Cohort retention triangle: users cohorted by first-seen
    * day; each (cohort, day-offset) cell counts distinct users active
    * that many days after joining, with the rate against the cohort
    * size — the standard retention report. Two user-keyed aggregates
    * + one broadcast of per-cohort sizes (|days| rows); the activity
    * distinct is (user, day), never raw events. */
  def retentionCohorts(spark: SparkSession, dir: String): DataFrame = {
    // ONE user-keyed aggregate carries both the cohort day (min) and
    // the distinct active-day set (bounded by the calendar, not the
    // event count) — no separate distinct/cohort/size passes over the
    // events. The cohort size IS the offset-0 cell (a user is always
    // active on their first day), read back with a tiny window over
    // the |cohorts|×|offsets| cell table.
    val perUser = Tables.load(spark, dir, "events")
      .select(col("user_id"), col("ts").cast("date").as("day"))
      .groupBy("user_id")
      .agg(min(col("day")).as("cohort_day"), collect_set(col("day")).as("days"))
    val cells = perUser
      .select(col("cohort_day"), explode(col("days")).as("day"))
      .groupBy(col("cohort_day"),
        datediff(col("day"), col("cohort_day")).cast("long").as("day_offset"))
      .agg(count(lit(1)).as("n_active"))
    val byCohort = Window.partitionBy("cohort_day")
    cells
      .withColumn("cohort_size",
        max(when(col("day_offset") === 0L, col("n_active"))).over(byCohort))
      .select(col("cohort_day"), col("day_offset"), col("n_active"),
        col("cohort_size"),
        round(col("n_active").cast("double") /
          col("cohort_size").cast("double"), 6).as("retention"))
      .orderBy("cohort_day", "day_offset")
  }

  /** #88 Conversion funnel: signup → first click after signup →
    * first purchase after that click, per user; one summary row per
    * stage with reach and decimal-exact mean hours-from-signup.
    * Stage timestamps are mins under an order constraint, so the
    * chain is two user-keyed join+agg rounds — no per-user event
    * sorting, no window over the raw stream. */
  def funnelStages(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.load(spark, dir, "events")
      .select(col("user_id"), col("event_type"), col("ts"))
    val s1 = ev.filter(col("event_type") === "signup")
      .groupBy("user_id").agg(min(col("ts")).as("t1"))
    val s2 = ev.filter(col("event_type") === "click")
      .join(s1, "user_id").filter(col("ts") >= col("t1"))
      .groupBy("user_id").agg(min(col("ts")).as("t2"), min(col("t1")).as("t1"))
    val s3 = ev.filter(col("event_type") === "purchase")
      .join(s2, "user_id").filter(col("ts") >= col("t2"))
      .groupBy("user_id").agg(min(col("ts")).as("t3"), min(col("t1")).as("t1"))
    def stage(df: DataFrame, name: String, tCol: String): DataFrame =
      df.agg(count(lit(1)).as("n_users"),
          Num.dsum((unix_micros(col(tCol)) - unix_micros(col("t1")))
            .cast("double") / lit(3600e6)).as("sum_h"))
        .select(lit(name).as("stage"), col("n_users"),
          round(col("sum_h") / col("n_users").cast("double"), 6)
            .as("avg_hours_from_signup"))
    stage(s1, "1_signup", "t1")
      .unionByName(stage(s2, "2_click", "t2"))
      .unionByName(stage(s3, "3_purchase", "t3"))
      .orderBy("stage")
  }
}
