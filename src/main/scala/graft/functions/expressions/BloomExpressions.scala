package graft.functions.expressions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** Distributed Bloom-filter sketch (SURVEY.md §2 #83): a mergeable
  * aggregate builds the filter over 64-bit hashes (partial bitsets
  * OR-combine map-side like any sum — no driver-side build, unlike
  * `DataFrameStatFunctions.bloomFilter` which collects), and a
  * codegen'd membership probe tests it per row. The filter is
  * self-describing binary: [numHashes int][bitset longs], so the
  * probe needs no out-of-band parameters.
  *
  * Guarantees: NO false negatives ever; false-positive rate
  * ≈ (1 - e^(-k·n/m))^k for n inserts, m bits, k hashes. Positions
  * come from double hashing (h2 forced odd, so the probe sequence
  * covers the power-of-two bit space) — the standard Kirsch-
  * Mitzenmacher construction.
  *
  * The 100 TB use: pre-filter a corpus-sized probe stream against a
  * bounded reference set (benchmark shingles, seen-url sets, index
  * membership) with a broadcast filter of a few MB, so the exact
  * join — which removes the false positives — only receives the
  * ~FP-rate fraction of rows instead of the whole corpus.
  */
object BloomFilter {
  /** Bits rounded UP to a power of two in [64, 2^30] (cheap
    * masking; rounding up never raises the false-positive rate). */
  def normalizeBits(requested: Int): Int = {
    val r = math.min(math.max(64, requested), 1 << 30)
    val h = Integer.highestOneBit(r)
    if (h == r) r else h << 1
  }

  /** Second hash for Kirsch-Mitzenmacher double hashing: a strong
    * odd remix of the input (odd → step generates the full cyclic
    * group mod the power-of-two size). */
  @inline def h2(x: Long): Long = {
    var h = x * 0x9e3779b97f4a7c15L
    h ^= (h >>> 32)
    h | 1L
  }

  def set(bits: Array[Long], numHashes: Int, x: Long): Unit = {
    val mask = bits.length.toLong * 64L - 1L // size is a power of two
    val step = h2(x)
    var i = 0
    while (i < numHashes) {
      val pos = (x + i.toLong * step) & mask
      bits((pos >>> 6).toInt) |= (1L << (pos & 63L))
      i += 1
    }
  }

  /** Probe a serialized filter ([numHashes int][longs]). A malformed
    * filter (fewer than header + one word — constructible only by
    * hand-crafting the binary, never by [[BloomAgg]]) answers false
    * rather than reading out of bounds. */
  def mightContain(bytes: Array[Byte], x: Long): Boolean = {
    if (bytes.length < 12) return false
    val bb = ByteBuffer.wrap(bytes)
    val k = bb.getInt
    val nLongs = (bytes.length - 4) / 8
    val mask = nLongs.toLong * 64L - 1L // size is a power of two
    val step = h2(x)
    var i = 0
    while (i < k) {
      val pos = (x + i.toLong * step) & mask
      val word = bb.getLong(4 + (pos >>> 6).toInt * 8)
      if ((word & (1L << (pos & 63L))) == 0L) return false
      i += 1
    }
    true
  }

  def serialize(bits: Array[Long], numHashes: Int): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + bits.length * 8)
    bb.putInt(numHashes)
    bits.foreach(bb.putLong)
    bb.array()
  }
}

/** Aggregate: Bloom filter over a LONG hash column. `numBits` is
  * rounded up to a power of two; state is the raw bitset, merged by
  * OR. Output: the self-describing binary [[BloomFilter]] format. */
case class BloomAgg(child: Expression, numBits: Int, numHashes: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] {
  require(numHashes > 0 && numHashes <= 16, "numHashes in [1,16]")
  private val bits = BloomFilter.normalizeBits(numBits)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult._
    if (child.dataType == LongType) TypeCheckSuccess
    else TypeCheckFailure(
      s"bloom_agg requires a bigint input, got ${child.dataType.simpleString}")
  }

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType

  override def createAggregationBuffer(): Array[Long] =
    new Array[Long](bits / 64)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) BloomFilter.set(buf, numHashes, v.asInstanceOf[Long])
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) |= b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Long]): Any =
    BloomFilter.serialize(buf, numHashes)

  override def serialize(buf: Array[Long]): Array[Byte] =
    BloomFilter.serialize(buf, numHashes)

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    bb.getInt // numHashes is constant per operator instance
    val out = new Array[Long]((bytes.length - 4) / 8)
    var i = 0
    while (i < out.length) { out(i) = bb.getLong(4 + i * 8); i += 1 }
    out
  }

  override def withNewMutableAggBufferOffset(o: Int): BloomAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): BloomAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren(0))
}

/** Membership probe: `BloomMightContain(filterBinary, hash)` — true
  * iff the hash MAY be in the set (no false negatives). Codegen'd to
  * one static call. PASS THE FILTER AS A LITERAL (finish the
  * aggregate, then `lit(bytes)`): a literal is hoisted to one object
  * reference in the generated class, while a filter arriving as a
  * row COLUMN (e.g. crossJoined from a broadcast 1-row aggregate) is
  * re-materialized by `UnsafeRow.getBinary` — an m-bit memcpy PER
  * PROBED ROW, which turns an 8 MiB filter into a CPU wall at corpus
  * scale. The finished-sketch-to-driver hop this implies is the same
  * one Spark's injected runtime bloom filters make (scalar subquery
  * → literal); the build itself stays distributed. */
case class BloomMightContain(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = BooleanType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult._
    if (left.dataType == BinaryType && right.dataType == LongType)
      TypeCheckSuccess
    else TypeCheckFailure(
      "bloom_might_contain requires (binary, bigint), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }

  override def nullSafeEval(f: Any, x: Any): Any =
    BloomFilter.mightContain(f.asInstanceOf[Array[Byte]],
      x.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (f, x) =>
      s"${ev.value} = graft.functions.expressions.BloomFilter" +
        s".mightContain($f, $x);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
