package graft

import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession
import scala.collection.mutable

/** Per-query job/stage breakdown without the UI (disabled in bench
  * sessions): runs each named SparkEntry query once warm, then one
  * profiled rep with a SparkListener capturing per-job wall time and
  * per-stage task totals (task time, shuffle read/write bytes, input
  * bytes). Prints jobs slowest-first so the dominant action (a
  * localCheckpoint materialization, a broadcast build, the final
  * collect) is identifiable — the guide §1 "which stage is slow"
  * loop, headless. Measurement harness only; never on a query path. */
object JobProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val stageFiles = sys.env.getOrElse("SPARK_GRAFT_STAGE_FILES", "8").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled",
        sys.env.getOrElse("SPARK_GRAFT_AQE_COALESCE", "true"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // deliberate bounded single-partition windows log a generic
    // WindowExec warning per execution (see Bench.scala) — quiet it
    org.apache.logging.log4j.core.config.Configurator.setLevel(
      "org.apache.spark.sql.execution.window.WindowExec",
      org.apache.logging.log4j.Level.ERROR)
    val runDir =
      if (stageFiles > 0) Bench.stage(spark, sfDir, stageFiles) else sfDir

    final case class StageAgg(var taskMs: Long = 0L, var tasks: Int = 0,
      var shufReadB: Long = 0L, var shufWriteB: Long = 0L,
      var inputB: Long = 0L, var name: String = "")
    final case class JobAgg(var t0: Long = 0L, var t1: Long = 0L,
      stages: mutable.ArrayBuffer[Int] = mutable.ArrayBuffer.empty,
      var desc: String = "")
    val jobs = mutable.LinkedHashMap[Int, JobAgg]()
    val stages = mutable.HashMap[Int, StageAgg]()
    @volatile var capture = false
    val listener = new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit =
        if (capture) {
          val j = JobAgg(t0 = e.time)
          j.stages ++= e.stageIds
          j.desc = Option(e.properties)
            .flatMap(p => Option(p.getProperty("spark.job.description")))
            .getOrElse("")
          jobs.synchronized { jobs(e.jobId) = j }
        }
      override def onJobEnd(e: SparkListenerJobEnd): Unit =
        if (capture) jobs.synchronized {
          jobs.get(e.jobId).foreach(_.t1 = e.time)
        }
      override def onTaskEnd(e: SparkListenerTaskEnd): Unit =
        if (capture && e.taskMetrics != null) stages.synchronized {
          val s = stages.getOrElseUpdate(e.stageId, StageAgg())
          s.taskMs += e.taskMetrics.executorRunTime
          s.tasks += 1
          s.shufReadB += e.taskMetrics.shuffleReadMetrics.totalBytesRead
          s.shufWriteB += e.taskMetrics.shuffleWriteMetrics.bytesWritten
          s.inputB += e.taskMetrics.inputMetrics.bytesRead
        }
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit =
        if (capture) stages.synchronized {
          stages.getOrElseUpdate(e.stageInfo.stageId, StageAgg())
            .name = e.stageInfo.name.takeWhile(_ != '\n').take(60)
        }
    }
    spark.sparkContext.addSparkListener(listener)
    args.foreach { name =>
      val fn = SparkEntry.queries(name)
      fn(spark, runDir).collect() // warmup (JIT, codegen, artifacts)
      fn(spark, runDir).collect() // settle
      jobs.clear(); stages.clear()
      capture = true
      val t0 = System.nanoTime()
      fn(spark, runDir).collect()
      val wall = (System.nanoTime() - t0) / 1e9
      capture = false
      Thread.sleep(300) // drain listener bus
      println(f"== $name wall=$wall%.3f s, jobs=${jobs.size}")
      val js = jobs.synchronized { jobs.toSeq }
      js.sortBy(j => -(j._2.t1 - j._2.t0)).foreach { case (id, j) =>
        val jms = j.t1 - j.t0
        val st = stages.synchronized {
          j.stages.flatMap(stages.get).toSeq }
        val taskMs = st.map(_.taskMs).sum
        val sr = st.map(_.shufReadB).sum / 1024
        val sw = st.map(_.shufWriteB).sum / 1024
        val in = st.map(_.inputB).sum / 1024
        println(f"  job $id%3d ${jms}%6d ms  taskMs=$taskMs%7d  " +
          f"in=${in}K shufR=${sr}K shufW=${sw}K  ${j.desc.take(50)}")
        st.sortBy(-_.taskMs).take(3).foreach { s =>
          println(f"      stage taskMs=${s.taskMs}%7d tasks=${s.tasks}%4d " +
            f"${s.name}")
        }
      }
    }
    spark.stop()
  }
}
