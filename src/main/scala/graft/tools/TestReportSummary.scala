package graft.tools

/** STREAMING/spec-only gate artifact (round 20, VERDICT r19 #6).
  *
  * 23 of SURVEY §2's operators are spec-only by design (streaming
  * twins, versioned-table protocol contracts, extensions/pruning plan
  * assertions) — their correctness evidence is named ScalaTest suites
  * rather than the driver's DuckDB gate. This tool lifts that
  * evidence out of sbt's output into a committed artifact: it parses
  * the JUnit XML under `target/test-reports/` and writes
  * `STREAMING_full.json` with per-suite pass counts for the suites
  * backing the spec-only rows, plus the whole-run totals, so the
  * round gate can read streaming health mechanically (the same
  * posture as BENCH_full.json / SKEW_full.json).
  *
  * Run AFTER `sbt test`: `sbt "runMain graft.tools.TestReportSummary"`.
  * Regex-parses only the one-line `<testsuite …>` header — no XML
  * library dependency.
  */
object TestReportSummary {

  /** The suites SURVEY §6 names as the spec-only operators' gate. */
  val SpecOnlySuites: Seq[String] = Seq(
    "graft.EventStreamSpec", "graft.ExtensionsSpec",
    "graft.VersionedTableSpec")

  private val Header =
    """<testsuite[^>]*\bname="([^"]+)"[^>]*\btests="(\d+)"[^>]*\berrors="(\d+)"[^>]*\bfailures="(\d+)"""".r

  def main(args: Array[String]): Unit = {
    val dir = new java.io.File(
      args.headOption.getOrElse("target/test-reports"))
    val reports = Option(dir.listFiles()).getOrElse(Array.empty)
      .filter(_.getName.endsWith(".xml")).sortBy(_.getName)
    require(reports.nonEmpty, s"no JUnit reports under ${dir.getPath} — " +
      "run sbt test first")
    val rows = reports.flatMap { f =>
      val head = {
        val src = scala.io.Source.fromFile(f, "UTF-8")
        try src.getLines().take(5).mkString(" ") finally src.close()
      }
      Header.findFirstMatchIn(head).map { m =>
        (m.group(1), m.group(2).toInt, m.group(3).toInt, m.group(4).toInt,
          f.lastModified())
      }
    }
    val (tests, errors, failures) =
      (rows.map(_._2).sum, rows.map(_._3).sum, rows.map(_._4).sum)
    val newest = rows.map(_._5).max
    def cell(r: (String, Int, Int, Int, Long)) =
      s""""${r._1}":{"tests":${r._2},"errors":${r._3},"failures":${r._4}}"""
    val spec = rows.filter(r => SpecOnlySuites.contains(r._1))
    require(spec.map(_._1).toSet == SpecOnlySuites.toSet,
      s"missing spec-only suite reports: " +
        (SpecOnlySuites.toSet -- spec.map(_._1)).mkString(","))
    val json =
      s"""{"metric":"streaming_gate",""" +
      s""""spec_only_suites":{${spec.map(cell).mkString(",")}},""" +
      s""""all_suites":{"n_suites":${rows.length},"tests":$tests,""" +
      s""""errors":$errors,"failures":$failures},""" +
      s""""green":${errors == 0 && failures == 0},""" +
      s""""newest_report_ms":$newest}"""
    println(json)
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get("STREAMING_full.json"), json + "\n")
  }
}
