package graft

import org.scalacheck.{Gen, rng}
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.catalyst.util.GenericArrayData
import graft.functions.expressions.{Combinations3, SortedLongIntersect, SortedLongIntersectCount}

/** Round-22 kernel properties: the array-returning sorted-merge
  * intersect (triangle_count's closing step) and the basket-local
  * C(n,3) generator (itemset_3) against their reference semantics. */
class R22KernelSpec extends AnyFunSuite {

  private def samples[A](g: Gen[A], n: Int): Seq[A] = {
    val seed0 = rng.Seed(42L)
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default,
      seed0.reseed(i.toLong)))
  }

  private val sortedDistinct: Gen[Array[Long]] =
    Gen.listOf(Gen.chooseNum(-50L, 50L))
      .map(_.distinct.sorted.toArray)

  test("SortedLongIntersect equals reference set intersection, sorted") {
    samples(Gen.zip(sortedDistinct, sortedDistinct), 200).foreach {
      case (a, b) =>
        val out = SortedLongIntersect.compute(
          new GenericArrayData(a), new GenericArrayData(b))
        val ref = a.filter(b.toSet) // first-array (sorted) order
        assert(out.toLongArray().toSeq === ref.toSeq)
        // and the count kernel agrees with the array kernel
        val cnt = SortedLongIntersectCount.compute(
          new GenericArrayData(a), new GenericArrayData(b))
        assert(cnt === ref.length)
    }
  }

  test("Combinations3 equals reference combinations, in order") {
    samples(sortedDistinct.map(_.take(12)), 120).foreach { xs =>
      val out = Combinations3.compute(new GenericArrayData(xs))
      val ref = xs.toSeq.combinations(3).toSeq
      assert(out.numElements() === ref.length)
      (0 until out.numElements()).foreach { i =>
        val row = out.getStruct(i, 3)
        assert(Seq(row.getLong(0), row.getLong(1), row.getLong(2))
          === ref(i))
      }
    }
  }
}
