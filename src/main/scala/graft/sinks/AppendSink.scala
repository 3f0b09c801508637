package graft.sinks

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Typed append write with idempotent-replay semantics
  * (SURVEY.md §2 #4), re-expressing the reference's
  * `write_disposition='WRITE_APPEND'` warehouse loads combined with
  * its retry/`depends_on_past` scheduling
  * (/root/reference/dags/stock_data_to_gcp.py:85-91,123-136): a batch
  * that reruns must replace its own rows, never duplicate them.
  *
  * Spark-first: the table is parquet partitioned by a batch column;
  * plain appends are `mode=append`; idempotent re-runs use dynamic
  * partition overwrite so only the partitions present in the incoming
  * batch are rewritten. At 100 TB this is a metadata swap of the
  * affected partitions — no read-modify-write of the whole table.
  */
object AppendSink {

  /** Blind append (the reference's WRITE_APPEND). */
  def append(df: DataFrame, path: String, partitionCols: Seq[String]): Unit =
    df.write.mode("append").partitionBy(partitionCols: _*).parquet(path)

  /** Idempotent append: re-running the same batch replaces exactly the
    * partitions it writes. */
  def idempotentAppend(df: DataFrame, path: String,
      partitionCols: Seq[String]): Unit = {
    val spark = df.sparkSession
    val prev = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try df.write.mode("overwrite").partitionBy(partitionCols: _*).parquet(path)
    finally prev match {
      case Some(v) => spark.conf.set("spark.sql.sources.partitionOverwriteMode", v)
      case None => spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
    }
  }

  def readBack(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)
}
