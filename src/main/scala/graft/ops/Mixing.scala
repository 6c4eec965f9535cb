package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.PortableHash.hashMod

/** Domain mixing — the corpus re-weighting step of LLM data prep: given
  * target proportions per source, downsample every source so the kept
  * corpus matches the target mix at the largest achievable size (the
  * binding source — the one whose supply runs out first under its
  * target share — is kept whole; every other source is thinned to
  * ratio).
  *
  * Selection is a HASH THRESHOLD, not a rank: keep a doc iff
  * `hashMod(id, M) < floor(rate_s * M)`. A per-source rank (window)
  * would funnel each source through one sorted partition — the
  * biggest source becomes the straggler at 100 TB — while the hash
  * draw is map-side, embarrassingly parallel, replay-stable, and
  * hits the target proportions to hash-uniformity accuracy. The
  * per-source counts are one tiny aggregate collected to the driver;
  * rates fold into the plan as a literal CASE over sources.
  *
  * Sources absent from `weights` are dropped (weight 0). All driver
  * arithmetic is plain IEEE double in a fixed order so an oracle can
  * reproduce the thresholds bit-for-bit. */
object Mixing {

  private val M = 1000000L

  def downsampleToWeights(df: DataFrame, sourceCol: String, idCol: String,
                          weights: Map[String, Double]): DataFrame = {
    require(weights.nonEmpty && weights.values.forall(_ > 0),
      "mixing: weights must be positive")
    require(df.schema(sourceCol).dataType ==
        org.apache.spark.sql.types.StringType,
      s"mixing: source column '$sourceCol' must be STRING, got " +
        df.schema(sourceCol).dataType)
    val counts = df.groupBy(col(sourceCol)).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val present = weights.filter { case (s, _) => counts.getOrElse(s, 0L) > 0 }
    require(present.nonEmpty, "mixing: no weighted source present")
    // largest total preserving the ratios: the binding source caps it
    val total = present.map { case (s, w) => counts(s) / w }.min
    val thr = present.map { case (s, w) =>
      // the BINDING source (n/w == total) keeps threshold M exactly:
      // floor(w * (n/w) / n * M) can round-trip to M-1 through IEEE
      // ulps, silently dropping one hash bucket of the source the
      // contract says is kept whole
      s -> (if (counts(s) / w == total) M
            else math.floor(w * total / counts(s) * M).toLong)
    }
    val thrCol = thr.foldLeft(lit(-1L)) { case (acc, (s, t)) =>
      when(col(sourceCol) === s, lit(t)).otherwise(acc)
    }
    df.filter(hashMod(col(idCol), M) < thrCol)
  }
}
