package graft

/** Driver-contract meta-tests: the things the round harness assumes
  * (every oracle key has a query, every query traces to a SURVEY §2
  * row, the flagship entry returns rows) stay true by construction. */
class SparkEntrySpec extends SparkTestBase {

  test("every oracleSql key has a matching queries entry") {
    val orphan = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphan.isEmpty, s"oracles without queries: $orphan")
  }

  test("every queries key appears in SURVEY.md §2") {
    val survey = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("SURVEY.md")))
    val missing = SparkEntry.queries.keySet
      .filterNot(k => survey.contains(s"`$k`"))
    assert(missing.isEmpty, s"queries missing from SURVEY.md §2: $missing")
  }

  test("flagship entry returns rows on the smallest SF") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every query runs and yields at least one row at sf0.001") {
    val empty = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        val n = fn(spark, SfDir).count()
        if (n == 0) Some(name) else None
    }
    assert(empty.isEmpty, s"queries with empty results: $empty")
  }
}
