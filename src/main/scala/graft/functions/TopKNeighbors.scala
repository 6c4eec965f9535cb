package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge.{column, expression, oneOf, AbstractType}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded top-k buffer: at most k (sim, id) entries, deduplicated by
  * id (multi-probe LSH scores the same pair from several buckets), the
  * worst entry evicted on overflow. Ordering: higher sim wins, ties go
  * to the lower id — exactly `ORDER BY sim DESC, neighbor_id`. O(k)
  * per update; k is small (10-100), so linear scans beat heap
  * bookkeeping. */
final class TopKBuffer(val k: Int) {
  val sims = new Array[Double](k)
  val ids = new Array[Long](k)
  var n = 0

  // java.lang.Double.compare is a TOTAL order (NaN greatest, -0.0 <
  // 0.0) — the same order Spark's window sort uses; a naive `>` is not
  // transitive under NaN and corrupts both eviction and the final sort
  private def better(s1: Double, i1: Long, s2: Double, i2: Long): Boolean = {
    val c = java.lang.Double.compare(s1, s2)
    c > 0 || (c == 0 && i1 < i2)
  }

  def add(sim: Double, id: Long): Unit = {
    var j = 0
    while (j < n) {
      if (ids(j) == id) {
        // duplicate id (multi-probe rescoring): keep the BEST sim, not
        // the first-seen one — merge order must not leak into results
        if (java.lang.Double.compare(sim, sims(j)) > 0) sims(j) = sim
        return
      }
      j += 1
    }
    if (n < k) { sims(n) = sim; ids(n) = id; n += 1 }
    else if (n > 0) {
      var w = 0
      j = 1
      while (j < n) { if (better(sims(w), ids(w), sims(j), ids(j))) w = j; j += 1 }
      if (better(sim, id, sims(w), ids(w))) { sims(w) = sim; ids(w) = id }
    }
  }

  def merge(o: TopKBuffer): TopKBuffer = {
    var j = 0
    while (j < o.n) { add(o.sims(j), o.ids(j)); j += 1 }
    this
  }

  /** Entry indices best-first. */
  def ranked: Array[Int] = (0 until n).toArray.sortWith { (a, bI) =>
    better(sims(a), ids(a), sims(bI), ids(bI))
  }
}

/** Exact per-group top-k as a single mergeable aggregate. The
  * window-rank formulation (`row_number().over(partitionBy(query))`
  * then `rk <= k`) exchanges EVERY scored row before dropping all but
  * k of them — on an ANN corpus scan that is the full corpus × queries
  * cross product through the shuffle. This aggregate keeps a bounded
  * buffer per (partition, group) map-side, so the exchange carries at
  * most `k` entries per partition per group — the shuffle volume is
  * `numPartitions × k`, independent of corpus size. Returns the top-k
  * as an array of (neighbor_id, sim) structs best-first; explode +
  * position for the ranked row form. */
case class TopKNeighbors(sim: Expression, id: Expression, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[TopKBuffer] with BinaryLike[Expression]
    with ExpectsInputTypes {
  require(k > 0, "top-k needs k > 0")

  // analysis-time contract (the Expressions.scala convention): a wrong
  // sim/id column type fails before the job launches instead of as a
  // per-row executor exception
  override def inputTypes: Seq[AbstractType] =
    Seq(oneOf(FloatType, DoubleType), oneOf(IntegerType, LongType))

  override def left: Expression = sim
  override def right: Expression = id
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("neighbor_id", LongType, nullable = false),
    StructField("sim", DoubleType, nullable = false))), containsNull = false)
  override def nullable: Boolean = false
  override def createAggregationBuffer(): TopKBuffer = new TopKBuffer(k)

  override def update(b: TopKBuffer, input: InternalRow): TopKBuffer = {
    val s = sim.eval(input)
    val i = id.eval(input)
    if (s != null && i != null) {
      val sv = s match {
        case d: java.lang.Double => d.doubleValue()
        case f: java.lang.Float => f.doubleValue()
        case other => throw new IllegalArgumentException(
          s"top_k_neighbors: sim must be float/double, got $other")
      }
      val iv = i match {
        case l: java.lang.Long => l.longValue()
        case n: java.lang.Integer => n.longValue()
        case other => throw new IllegalArgumentException(
          s"top_k_neighbors: id must be int/long, got $other")
      }
      b.add(sv, iv)
    }
    b
  }

  override def merge(b: TopKBuffer, o: TopKBuffer): TopKBuffer = b.merge(o)

  override def eval(b: TopKBuffer): Any =
    new GenericArrayData(b.ranked.map { j =>
      InternalRow(b.ids(j), b.sims(j))
    }.toArray[Any])

  override def serialize(b: TopKBuffer): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(8 + 16 * b.n)
    bb.putInt(b.k)
    bb.putInt(b.n)
    var j = 0
    while (j < b.n) { bb.putDouble(b.sims(j)); bb.putLong(b.ids(j)); j += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKBuffer = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val b = new TopKBuffer(bb.getInt())
    val n = bb.getInt()
    var j = 0
    while (j < n) {
      val s = bb.getDouble()
      val i = bb.getLong()
      b.sims(j) = s
      b.ids(j) = i
      j += 1
    }
    b.n = n
    b
  }

  override def withNewMutableAggBufferOffset(n: Int): TopKNeighbors =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): TopKNeighbors =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): TopKNeighbors =
    copy(sim = newLeft, id = newRight)
  override def prettyName: String = "graft_top_k_neighbors"
}

object TopKNeighbors {
  /** Column surface: `df.groupBy("query_id").agg(top_k_neighbors(...))`. */
  def top_k_neighbors(sim: Column, id: Column, k: Int): Column =
    column(TopKNeighbors(expression(sim), expression(id), k)
      .toAggregateExpression())
}
