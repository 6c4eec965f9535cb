package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge.{column, expression}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.GraftBridge.{oneOf, AbstractType}
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types.{ByteType, DataType, IntegerType, LongType, ShortType}

/** Growable fixed-stride bitset over a dense non-negative id domain.
  * One bit per id: 1500 users = 192 bytes, 10M users = 1.25 MB. Buffers
  * merge with a word-wise OR, so partial aggregation works map-side and
  * the shuffle carries one bitmap per (group × partition) instead of
  * one row per distinct value — the bitmap analogue of ClickHouse /
  * Doris `groupBitmap`. */
final class LongBitmap(private var words: Array[Long]) {
  def this() = this(new Array[Long](16))

  def add(v: Long): Unit = {
    require(v >= 0 && v < LongBitmap.MaxBits,
      s"bitmap_distinct supports ids in [0, ${LongBitmap.MaxBits}); got $v" +
        " — for sparse/unbounded domains use approx_count_distinct or a" +
        " two-phase distinct")
    val w = (v >>> 6).toInt
    if (w >= words.length) {
      val grown = new Array[Long](
        java.lang.Integer.highestOneBit(w) * 2 max 16)
      System.arraycopy(words, 0, grown, 0, words.length)
      words = grown
    }
    words(w) |= 1L << (v & 63)
  }

  def or(o: LongBitmap): LongBitmap = {
    if (o.words.length > words.length) {
      val grown = new Array[Long](o.words.length)
      System.arraycopy(words, 0, grown, 0, words.length)
      words = grown
    }
    var i = 0
    while (i < o.words.length) { words(i) |= o.words(i); i += 1 }
    this
  }

  def cardinality: Long = {
    var n = 0L
    var i = 0
    while (i < words.length) { n += java.lang.Long.bitCount(words(i)); i += 1 }
    n
  }

  /** Words after the last set bit are trimmed so an almost-empty group
    * serializes to a few bytes regardless of the largest id seen by
    * sibling groups. */
  def toBytes: Array[Byte] = {
    var last = words.length - 1
    while (last >= 0 && words(last) == 0L) last -= 1
    val bb = java.nio.ByteBuffer.allocate(4 + 8 * (last + 1))
    bb.putInt(last + 1)
    var i = 0
    while (i <= last) { bb.putLong(words(i)); i += 1 }
    bb.array()
  }
}

object LongBitmap {
  /** 2^28 ids = 32 MB/group worst case — the dense-domain contract. */
  val MaxBits: Long = 1L << 28

  def fromBytes(bytes: Array[Byte]): LongBitmap = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt()
    val words = new Array[Long](n max 16)
    var i = 0
    while (i < n) { words(i) = bb.getLong(); i += 1 }
    new LongBitmap(words)
  }
}

/** Exact COUNT(DISTINCT) as a single-pass mergeable aggregate. The
  * built-in COUNT(DISTINCT x) under GROUP BY expands to a two-shuffle
  * dedup (`Expand` + re-aggregate) because counting needs each value
  * once per group; over a DENSE id domain a bitmap does the dedup in
  * O(1) bits per value, partial-aggregates map-side, and merges with
  * OR — one shuffle, no row explosion, exact answer. Null inputs are
  * ignored (COUNT(DISTINCT) semantics). Ids must be non-negative and
  * below [[LongBitmap.MaxBits]]; for sparse/unbounded domains use
  * `approx_count_distinct` (HLL) or `Skew.countDistinctSkewSafe`.
  */
case class BitmapDistinct(child: Expression,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[LongBitmap] with UnaryLike[Expression]
    with ExpectsInputTypes {

  // analysis-time contract like every expression in Expressions.scala:
  // a non-integral id column must fail BEFORE the job launches, not as
  // a per-row IllegalArgumentException on an executor after retries
  override def inputTypes: Seq[AbstractType] =
    Seq(oneOf(ByteType, ShortType, IntegerType, LongType))
  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def createAggregationBuffer(): LongBitmap = new LongBitmap()

  override def update(b: LongBitmap, input: InternalRow): LongBitmap = {
    val v = child.eval(input)
    if (v != null) v match {
      case i: java.lang.Integer => b.add(i.longValue())
      case l: java.lang.Long => b.add(l.longValue())
      case s: java.lang.Short => b.add(s.longValue())
      case by: java.lang.Byte => b.add(by.longValue())
      case other => throw new IllegalArgumentException(
        "bitmap_distinct needs an integral id column, got " +
          s"${other.getClass.getName} ($other)")
    }
    b
  }

  override def merge(b: LongBitmap, o: LongBitmap): LongBitmap = b.or(o)
  override def eval(b: LongBitmap): Any = b.cardinality
  override def serialize(b: LongBitmap): Array[Byte] = b.toBytes
  override def deserialize(bytes: Array[Byte]): LongBitmap =
    LongBitmap.fromBytes(bytes)

  override def withNewMutableAggBufferOffset(n: Int): BitmapDistinct =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): BitmapDistinct =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildInternal(c: Expression): BitmapDistinct =
    copy(child = c)
  override def prettyName: String = "graft_bitmap_distinct"
}

object BitmapDistinct {
  /** Column surface: `df.agg(bitmap_distinct(col("user_id")))`. */
  def bitmap_distinct(c: Column): Column =
    column(BitmapDistinct(expression(c)).toAggregateExpression())
}
