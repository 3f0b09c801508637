package graft

/** Round-21 adaptive-plan gate for #134 attribution: the blocked
  * two-level form and the textbook one-window-per-user form must
  * agree row-for-row — on the testdata corpus (whatever side of the
  * Rank.SingleWindowMax gate it falls on, BOTH forms are compared
  * directly here) so the gate can never change what the query
  * computes. The value gate is the attribution oracle (hash-exact);
  * this spec pins the two forms to each other on the real corpus,
  * which carries same-instant touch ties and purchase-only days. */
class AttributionTwoLevelSpec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.001"

  test("two-level attribution equals the single-window form") {
    val a = graft.operators.Dimensional
      .attributionImpl(spark, dir, twoLevel = true).collect().toSeq
    val b = graft.operators.Dimensional
      .attributionImpl(spark, dir, twoLevel = false).collect().toSeq
    assert(a === b)
    assert(a.nonEmpty)
  }
}
