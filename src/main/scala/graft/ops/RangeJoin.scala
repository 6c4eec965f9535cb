package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Range (interval) join: match each point row to every interval row whose
  * half-open range `[start, end)` contains the point — with NO equi-key to
  * save the plan. Naively expressed (`p.pt >= i.start AND p.pt < i.end`)
  * Spark can only pick BroadcastNestedLoopJoin / cartesian: O(|P|·|I|)
  * comparisons and a broadcast of a whole side, which dies at 100 TB.
  *
  * The scalable composition bucketizes the domain:
  *
  *   - every interval is exploded to the buckets it overlaps
  *     (`sequence(start/B, (end-1)/B)` — `ceil(span/B)` rows each);
  *   - every point belongs to exactly ONE bucket (`pt/B`);
  *   - equi-join on the bucket id (hash exchange, AQE-skew-splittable),
  *     then the exact residual predicate filters false bucket-mates.
  *
  * Because a point has one bucket, no dedup is needed. Replication factor
  * is `avg(span)/B + 1` per interval — pick `bucketSize` near the median
  * interval length so each interval lands in ~2 buckets. This is the
  * standard binning rewrite range-join optimizers apply (Databricks range
  * join hints, postgres GiST time joins) expressed as a plain Catalyst
  * plan, so AQE and codegen apply untouched.
  */
object RangeJoin {

  /** Exact integral floor-division bucket id — double math
    * (`floor(x / B)`) drifts one bucket off beyond 2^53 (ns epochs,
    * hashed keys) and silently drops the matches on the boundary. The
    * leading `floor` admits fractional coordinates: it rounds toward
    * -infinity (a bare long cast truncates toward zero, putting -0.7 in
    * bucket 0 instead of -1) and is a no-op on integral inputs. */
  private def bucketOf(c: Column, bucketSize: Long): Column =
    org.apache.spark.sql.GraftBridge.column(
      graft.ext.FloorDivBucket(
        org.apache.spark.sql.catalyst.expressions.Cast(
          org.apache.spark.sql.GraftBridge.expression(floor(c)),
          org.apache.spark.sql.types.LongType), bucketSize))

  /** @param points    side with a single numeric coordinate `ptCol`
    * @param intervals side with numeric `[startCol, endCol)` ranges
    * @param bucketSize domain width per bucket (same unit as the cols)
    * Output: every (point × containing interval) pair, all columns of
    * both inputs (names must be disjoint). */
  def rangeJoin(points: DataFrame, intervals: DataFrame,
                ptCol: String, startCol: String, endCol: String,
                bucketSize: Long): DataFrame = {
    require(bucketSize > 0, "bucketSize must be positive")
    Reserved.requireAbsent(points, "rangeJoin", Seq("_bucket"))
    Reserved.requireAbsent(intervals, "rangeJoin", Seq("_bucket"))
    // last covered bucket holds the largest p with p < end: ceil(end)-1
    // (== end-1 for integral ends, floor(end) for fractional ones)
    val iv = intervals
      .filter(col(endCol) > col(startCol)) // empty ranges match nothing
      .withColumn("_bucket",
        explode(sequence(bucketOf(col(startCol), bucketSize),
                         bucketOf(ceil(col(endCol)) - lit(1), bucketSize))))
    val pt = points.withColumn("_bucket", bucketOf(col(ptCol), bucketSize))
    pt.join(iv, Seq("_bucket"))
      .filter(col(ptCol) >= col(startCol) && col(ptCol) < col(endCol))
      .drop("_bucket")
  }

  /** Interval × interval overlap join: every (a, b) pair whose half-open
    * ranges `[aLo, aHi)` and `[bLo, bHi)` intersect — the session-vs-
    * session / validity-window shape the point-in-interval join can't
    * express. Same bucketization: BOTH sides are exploded to the buckets
    * they cover and equi-joined on the bucket id, with the exact overlap
    * predicate as the residual filter.
    *
    * An overlapping pair co-occurs in every bucket its overlap region
    * spans, so naive emission duplicates pairs. Instead of a dedup
    * shuffle, each pair is emitted only from the bucket containing the
    * overlap's START (`max(aLo, bLo)` — always inside both sides'
    * bucket ranges when the overlap is non-empty): exactly-once output
    * straight off the joined stream, no extra exchange.
    *
    * Replication is `span/B + 1` per row on both sides: pick
    * `bucketSize` near the median span. Route open-ended sentinel rows
    * (e.g. `hi = Long.MaxValue`) to a separate plan — here they would
    * explode the generated sequence (the automatic
    * [[graft.ext.RangeJoinRule]] guards this per row; this explicit
    * helper trusts its caller). */
  def intervalOverlapJoin(a: DataFrame, b: DataFrame,
                          aLo: String, aHi: String, bLo: String, bHi: String,
                          bucketSize: Long): DataFrame = {
    require(bucketSize > 0, "bucketSize must be positive")
    Reserved.requireAbsent(a, "intervalOverlapJoin", Seq("_bucket"))
    Reserved.requireAbsent(b, "intervalOverlapJoin", Seq("_bucket"))
    val ab = a.filter(col(aHi) > col(aLo))
      .withColumn("_bucket",
        explode(sequence(bucketOf(col(aLo), bucketSize),
                         bucketOf(ceil(col(aHi)) - lit(1), bucketSize))))
    val bb = b.filter(col(bHi) > col(bLo))
      .withColumn("_bucket",
        explode(sequence(bucketOf(col(bLo), bucketSize),
                         bucketOf(ceil(col(bHi)) - lit(1), bucketSize))))
    ab.join(bb, Seq("_bucket"))
      .filter(col(aLo) < col(bHi) && col(bLo) < col(aHi))
      .filter(col("_bucket") ===
        bucketOf(greatest(col(aLo), col(bLo)), bucketSize))
      .drop("_bucket")
  }
}
