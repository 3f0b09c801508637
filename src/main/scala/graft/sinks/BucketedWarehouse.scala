package graft.sinks

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.Num
import graft.sources.Tables

/** Bucketed warehouse tables (SURVEY.md §2 #36): persist the two fact
  * tables bucketed AND sorted by their join key, so every subsequent
  * fact⋈fact join is co-located — no exchange on either side, the
  * sort-merge join reads pre-sorted buckets. This is the canonical
  * 100 TB join strategy: the shuffle is paid once at ingest, not on
  * every query (re-expresses the reference's "storing and querying"
  * warehouse purpose, /root/reference/README.md:3, as a Spark
  * datasource-bucketed table).
  */
object BucketedWarehouse {

  val Buckets = 8

  /** Write lineitem + orders as bucketed tables; returns the table
    * names. The ingest shuffle is paid ONCE per source dir and
    * session — re-invocations reuse the registered tables, which is
    * the operational model bucketing exists for. */
  def build(spark: SparkSession, dir: String): (String, String) = {
    // MD5-derived key, NOT dir.hashCode: two source dirs colliding on
    // the 32-bit hashCode would silently serve each other's warehouse
    // (same reasoning as StagePath / ZOrderLayout).
    val suffix = graft.sources.StagePath.key(dir)
    val li = s"graft_lineitem_b_$suffix"
    val ord = s"graft_orders_b_$suffix"
    if (spark.catalog.tableExists(li) && spark.catalog.tableExists(ord))
      return (li, ord)
    // A fresh session has an empty in-memory catalog, but a previous
    // session's managed-table directory may survive in the warehouse
    // dir — drop both the entry and the location before rewriting.
    Seq(li, ord).foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val wh = spark.conf.get("spark.sql.warehouse.dir")
        .stripPrefix("file:")
      org.apache.commons.io.FileUtils.deleteQuietly(
        new java.io.File(wh, t))
    }
    Tables.load(spark, dir, "lineitem")
      .write.mode("overwrite")
      .bucketBy(Buckets, "l_orderkey").sortBy("l_orderkey")
      .saveAsTable(li)
    Tables.load(spark, dir, "orders")
      .write.mode("overwrite")
      .bucketBy(Buckets, "o_orderkey").sortBy("o_orderkey")
      .saveAsTable(ord)
    (li, ord)
  }

  /** §2 #36 `bucketed_join`: revenue per order priority over the
    * bucketed tables. The merge hint keeps the join sort-merge (the
    * point is the exchange-free join, not a broadcast); the only
    * shuffle in the whole query is the final tiny groupBy. */
  def bucketedJoin(spark: SparkSession, dir: String): DataFrame = {
    val (li, ord) = build(spark, dir)
    // another process rebuilding the same warehouse dir invalidates
    // this session's cached file listing (observed as FILE_NOT_EXIST
    // mid-scan); a metadata refresh per call is cheap insurance
    Seq(li, ord).foreach(spark.catalog.refreshTable)
    val l = spark.table(li)
    val o = spark.table(ord)
    l.hint("merge").join(o, l("l_orderkey") === o("o_orderkey"))
      .groupBy("o_orderpriority")
      .agg(Num.dsum(col("l_extendedprice") * (lit(1d) - col("l_discount")))
        .as("revenue"),
        count(lit(1)).as("n_lines"))
      .orderBy("o_orderpriority")
  }
}
