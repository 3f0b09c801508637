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

  /** #56b Compaction for the streaming warehouse layout
    * ((batch_date, _batch_id) partitions, see
    * `EventStream.writeToWarehouse`): rewrite a whole day's
    * micro-batch partitions into a single `_batch_id=-1` compacted
    * partition — Hive-style directory swap, since dynamic partition
    * overwrite can only replace partitions present in the incoming
    * data and therefore cannot collapse sub-partitions. Re-running
    * re-compacts (idempotent); a production deployment would wrap
    * the swap in a table format's commit protocol. */
  def compactDay(spark: SparkSession, path: String, day: String,
      targetBytes: Long = 128L * 1024 * 1024): Unit = {
    import org.apache.spark.sql.functions.{col, lit}
    val dayDir = new java.io.File(s"$path/batch_date=$day")
    if (dayDir.isDirectory) {
      val bytes = org.apache.commons.io.FileUtils.sizeOfDirectory(dayDir)
      val nFiles = math.max(1, ((bytes + targetBytes - 1) / targetBytes).toInt)
      val tmp = path + ".compact_tmp"
      spark.read.parquet(path)
        .filter(col("batch_date") === day)
        .withColumn("_batch_id", lit(-1L))
        .coalesce(nFiles)
        .write.mode("overwrite").parquet(tmp)
      org.apache.commons.io.FileUtils.deleteDirectory(dayDir)
      idempotentAppend(spark.read.parquet(tmp), path,
        Seq("batch_date", "_batch_id"))
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(tmp))
    }
  }

  /** #56 Small-file compaction: rewrite one partition's many
    * micro-batch files into ceil(bytes/target) right-sized files via
    * dynamic partition overwrite of just that partition. High-cadence
    * appends (the reference's 2-minute DAG) accrete thousands of tiny
    * files per day; at 100 TB the resulting open()/footer overhead
    * dominates scans, so compaction is part of the sink contract, not
    * an afterthought. Safe to re-run (idempotent overwrite). */
  def compactPartition(spark: SparkSession, path: String,
      partitionCol: String, partitionValue: String,
      targetBytes: Long = 128L * 1024 * 1024): Unit = {
    val part = new java.io.File(s"$path/$partitionCol=$partitionValue")
    val bytes = Option(part.listFiles()).map(_.filter(_.isFile)
      .map(_.length()).sum).getOrElse(0L)
    if (bytes > 0) {
      val nFiles = math.max(1, ((bytes + targetBytes - 1) / targetBytes).toInt)
      // stage the compacted slice OUTSIDE the table root (Spark
      // refuses to overwrite a path it is reading, correctly), then
      // swap it in via dynamic partition overwrite
      val tmp = path + s".compact_tmp"
      spark.read.parquet(path)
        .filter(org.apache.spark.sql.functions.col(partitionCol) ===
          partitionValue)
        .coalesce(nFiles)
        .write.mode("overwrite").parquet(tmp)
      // tmp carries partitionCol as a data column (typed as the
      // original partition), so the overwrite lands in the same
      // directory it came from
      idempotentAppend(spark.read.parquet(tmp), path, Seq(partitionCol))
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(tmp))
    }
  }
}
