package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.{col, lit}
import graft.functions.Expressions.bloom_might_contain

/** Pre-shuffle join pruning. In a selective join (fact table vs a
  * filtered dimension that matches 1% of fact keys) the dominant cost
  * at 100 TB is shuffling fact rows that will never find a partner —
  * the join discards them AFTER the network paid for them.
  *
  * `bloomPrunedJoin` builds a Bloom filter over the small side's keys
  * (one aggregate job, sketch collected to the driver — ~1.2 MB per
  * million keys at 1% fpp, fine for sides far too big to broadcast as
  * rows), ships it with the plan, and filters the big side BEFORE its
  * exchange. Bloom filters have no false negatives, so no real match
  * is lost; false positives just ride the shuffle and fall out of the
  * join — results are row-identical to the plain join (PruneSpec).
  *
  * This is exactly what Spark's own runtime-filter injection
  * (`spark.sql.optimizer.runtimeFilter.bloomFilter.enabled`) does when
  * its size/selectivity thresholds approve; the explicit operator is
  * for when the pipeline author knows the selectivity (incremental
  * loads joining a day's keys against a full history) and wants the
  * pruning guaranteed, not heuristic. */
object Prune {

  /** Inner-join `big` ⋈ `small` on integral `key`, bloom-pruning the
    * big side's shuffle. The small side is ALWAYS locally checkpointed
    * so its plan runs ONCE for the bloom aggregate and the join build:
    * with a nondeterministic small plan (sample, limit), two
    * evaluations would build the bloom from one row set and join
    * another — keys in the join evaluation but not the bloom would be
    * filtered off `big`, silently dropping real matches. Pass
    * `expectedItems` to skip only the sizing count. */
  def bloomPrunedJoin(big: DataFrame, small: DataFrame, key: String,
                      expectedItems: Long = 0L, fpp: Double = 0.01): DataFrame = {
    // the probe-side filter expression only evaluates int/long keys —
    // reject anything else at plan time, not mid-stage
    val kt = small.schema(key).dataType
    require(kt == org.apache.spark.sql.types.LongType ||
      kt == org.apache.spark.sql.types.IntegerType,
      s"bloomPrunedJoin: key '$key' must be int/long, got $kt")
    val s = small.localCheckpoint(true)
    val n = if (expectedItems > 0) expectedItems else s.count()
    // an empty small side has no sketch to build (Spark's bloomFilter
    // aggregate returns a null buffer and NPEs on deserialize) and no
    // rows to match: the join result is definitionally empty. Keep the
    // same plan shape minus the probe so callers still get the joined
    // schema. The sizing count already answers emptiness on the
    // default path; only an expectedItems caller pays the one-job
    // isEmpty probe (which also guards an over-trusting estimate on
    // data that turned out empty).
    val empty = if (expectedItems > 0) s.isEmpty else n == 0
    if (empty) return big.filter(lit(false)).join(s, Seq(key))
    val bloom = s.stat.bloomFilter(key, math.max(n, 1L), fpp)
    big.filter(bloom_might_contain(col(key), bloom)).join(s, Seq(key))
  }
}
