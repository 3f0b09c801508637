package graft

/** Round-21 adaptive-plan gate for #41 sessionize and #182
  * session_entry_exit: the blocked two-level session assembly and
  * the classic one-window-per-user form must agree row-for-row on
  * the real corpus (same-instant ties, multi-day sessions,
  * single-event bounces all present), so the Rank.SingleWindowMax
  * gate can never change what either query computes. The value gate
  * stays the hash-exact oracles. */
class SessionTwoLevelSpec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.001"

  test("two-level sessionize equals the single-window form") {
    val a = graft.operators.Sessions
      .sessionizeImpl(spark, dir, twoLevel = true).collect().toSeq
    val b = graft.operators.Sessions
      .sessionizeImpl(spark, dir, twoLevel = false).collect().toSeq
    assert(a === b)
    assert(a.nonEmpty)
  }

  test("two-level session entry/exit equals the single-window form") {
    val a = graft.operators.Sessions
      .sessionEntryExitImpl(spark, dir, twoLevel = true).collect().toSeq
    val b = graft.operators.Sessions
      .sessionEntryExitImpl(spark, dir, twoLevel = false).collect().toSeq
    assert(a === b)
    assert(a.nonEmpty)
  }
}
