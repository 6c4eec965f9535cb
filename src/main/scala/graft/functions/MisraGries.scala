package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge.{column, expression, AbstractType}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Bounded Misra–Gries frequency summary: at most `k` (item, count)
  * entries. The streaming update is the classical MG step (counted if
  * present, inserted while room, otherwise EVERY stored count decays by
  * one and zeros evict); the merge is the mergeable-summaries rule
  * (Agarwal et al., PODS'12): combine counts, then subtract the
  * (k+1)-th largest combined count from every entry and evict what
  * falls to zero or below. Under any merge tree over any partitioning,
  * every item whose true global count exceeds N/(k+1) is GUARANTEED to
  * survive in the final summary — the superset contract
  * [[graft.ops.HeavyHitters]] builds its exact second pass on. Stored
  * counts are lower bounds and merge-order dependent; only the
  * membership guarantee is deterministic, which is why the summary
  * itself is never a query result.
  *
  * Mutable cells (single-element arrays) keep decay/merge free of
  * structural HashMap churn; eviction goes through the entry iterator,
  * the one mutation java.util.HashMap allows mid-walk. */
final class MGBuffer(val k: Int) {
  val m = new java.util.HashMap[String, Array[Long]](k * 2)

  def add(item: String): Unit = {
    val cell = m.get(item)
    if (cell != null) cell(0) += 1L
    else if (m.size < k) m.put(item, Array(1L))
    else {
      val it = m.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        e.getValue()(0) -= 1L
        if (e.getValue()(0) == 0L) it.remove()
      }
    }
  }

  def merge(o: MGBuffer): MGBuffer = {
    val oit = o.m.entrySet().iterator()
    while (oit.hasNext) {
      val e = oit.next()
      val cell = m.get(e.getKey)
      if (cell != null) cell(0) += e.getValue()(0)
      else m.put(e.getKey, Array(e.getValue()(0)))
    }
    if (m.size > k) {
      // subtract the (k+1)-th largest count: at most k entries can be
      // strictly above it, so the survivor set fits the bound again
      val counts = new Array[Long](m.size)
      var j = 0
      val cit = m.values().iterator()
      while (cit.hasNext) { counts(j) = cit.next()(0); j += 1 }
      java.util.Arrays.sort(counts)
      val cut = counts(counts.length - 1 - k) // (k+1)-th largest
      val it = m.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        e.getValue()(0) -= cut
        if (e.getValue()(0) <= 0L) it.remove()
      }
    }
    this
  }

  /** Entries count-desc then item-asc — deterministic given the map's
    * CONTENT (which is itself merge-order dependent; see class doc). */
  def ranked: Array[(String, Long)] = {
    val arr = new Array[(String, Long)](m.size)
    var j = 0
    val it = m.entrySet().iterator()
    while (it.hasNext) { val e = it.next(); arr(j) = (e.getKey, e.getValue()(0)); j += 1 }
    arr.sortWith { case ((i1, c1), (i2, c2)) => c1 > c2 || (c1 == c2 && i1 < i2) }
  }
}

/** The buffer/serde/eval shape shared by the two MG aggregates (build
  * from items, merge of built sketches) — the guarantee lives in
  * [[MGBuffer]], these are the Spark plumbing around it. */
private[functions] trait MGAggShape extends TypedImperativeAggregate[MGBuffer] {
  def k: Int

  override def dataType: DataType = MisraGriesSketch.sketchType
  override def nullable: Boolean = false
  override def createAggregationBuffer(): MGBuffer = new MGBuffer(k)
  override def merge(b: MGBuffer, o: MGBuffer): MGBuffer = b.merge(o)

  override def eval(b: MGBuffer): Any =
    new GenericArrayData(b.ranked.map { case (i, c) =>
      InternalRow(UTF8String.fromString(i), c)
    }.toArray[Any])

  override def serialize(b: MGBuffer): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.writeInt(b.k)
    out.writeInt(b.m.size)
    val it = b.m.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val bytes = e.getKey.getBytes("UTF-8")
      out.writeInt(bytes.length)
      out.write(bytes)
      out.writeLong(e.getValue()(0))
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): MGBuffer = {
    val in = new java.io.DataInputStream(
      new java.io.ByteArrayInputStream(bytes))
    val b = new MGBuffer(in.readInt())
    val n = in.readInt()
    var j = 0
    while (j < n) {
      val len = in.readInt()
      val sb = new Array[Byte](len)
      in.readFully(sb)
      b.m.put(new String(sb, "UTF-8"), Array(in.readLong()))
      j += 1
    }
    b
  }
}

/** Mergeable Misra–Gries heavy-hitter candidate summary as a single
  * aggregate: `mg_sketch(item, k)` keeps a bounded k-entry buffer per
  * (partition, group) map-side, so the exchange carries at most `k`
  * entries per partition per group — shuffle volume is
  * `numPartitions × k`, independent of how many DISTINCT items the
  * corpus holds. The full `groupBy(item).count()` alternative shuffles
  * one row per distinct item (billions at 100 TB: typos, ids, URLs);
  * this aggregate is how the frequency question stays bounded. Returns
  * array<struct<item, cnt>> count-desc; `cnt` is a lower bound, only
  * MEMBERSHIP carries the guarantee (true count > N/(k+1) ⇒ present). */
case class MisraGriesSketch(item: Expression, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends MGAggShape with UnaryLike[Expression] with ExpectsInputTypes {
  require(k > 0, "mg_sketch needs k > 0")

  override def inputTypes: Seq[AbstractType] = Seq(StringType)
  override def child: Expression = item

  override def update(b: MGBuffer, input: InternalRow): MGBuffer = {
    val v = item.eval(input)
    // UTF8String may alias a reused scan buffer — copy to a String key
    if (v != null) b.add(v.asInstanceOf[UTF8String].toString)
    b
  }

  override def withNewMutableAggBufferOffset(n: Int): MisraGriesSketch =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): MisraGriesSketch =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildInternal(
      newChild: Expression): MisraGriesSketch = copy(item = newChild)
  override def prettyName: String = "graft_mg_sketch"
}

/** Merge of ALREADY-BUILT sketches: `mg_merge(sketchCol, k)` folds rows
  * of `array<struct<item,cnt>>` (mg_sketch output) into one summary via
  * the same mergeable-summaries rule. This is the second level of a
  * two-level merge tree: level 1 pre-merges partition partials into
  * ~√P salt lanes, level 2 merges the √P lane sketches — no single
  * reducer ever sees more than ~√P×k entries, where the single global
  * `agg(mg_sketch(...))` funnels P×k into one task. The membership
  * guarantee is merge-tree independent (Agarwal et al.), so any
  * lane count yields the same candidate superset contract. Also the
  * horizon-merge step for persisted per-batch partial sketches
  * (streaming heavy hitters). */
case class MisraGriesMerge(sketch: Expression, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends MGAggShape with UnaryLike[Expression] with ExpectsInputTypes {
  require(k > 0, "mg_merge needs k > 0")

  override def inputTypes: Seq[AbstractType] = Seq(MisraGriesSketch.sketchType)
  override def child: Expression = sketch

  override def update(b: MGBuffer, input: InternalRow): MGBuffer = {
    val v = sketch.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      val o = new MGBuffer(k)
      var i = 0
      while (i < arr.numElements()) {
        val r = arr.getStruct(i, 2)
        o.m.put(r.getUTF8String(0).toString, Array(r.getLong(1)))
        i += 1
      }
      b.merge(o)
    }
    b
  }

  override def withNewMutableAggBufferOffset(n: Int): MisraGriesMerge =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): MisraGriesMerge =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildInternal(
      newChild: Expression): MisraGriesMerge = copy(sketch = newChild)
  override def prettyName: String = "graft_mg_merge"
}

object MisraGriesSketch {
  /** array<struct<item string, cnt long>> — the sketch's row form. */
  val sketchType: DataType = ArrayType(StructType(Seq(
    StructField("item", StringType, nullable = false),
    StructField("cnt", LongType, nullable = false))), containsNull = false)

  /** Column surface: `df.agg(mg_sketch(col, k))` or per-group via
    * groupBy. */
  def mg_sketch(item: Column, k: Int): Column =
    column(MisraGriesSketch(expression(item), k).toAggregateExpression())

  /** Column surface for the sketch-of-sketches merge level. */
  def mg_merge(sketch: Column, k: Int): Column =
    column(MisraGriesMerge(expression(sketch), k).toAggregateExpression())
}
