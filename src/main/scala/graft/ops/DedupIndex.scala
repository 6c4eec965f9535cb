package graft.ops

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Incremental near-duplicate detection against a PERSISTED MinHash
  * band index — the operator that makes corpus dedup O(batch) instead
  * of O(corpus): a daily crawl batch is checked against the full
  * history without re-reading or re-hashing a single historical
  * document.
  *
  * The index stores exactly [[DedupOps.bandSignatures]]'s layout —
  * (band, bkey, id, sig), one row per band per doc, partitioned by
  * `band` — so batch-mode and incremental-mode banding are the same
  * code path and produce identical candidates.
  *
  * Scale story (100 TB corpus, daily batches):
  *  - The batch's band keys (|batch| × bands rows of 12 bytes) are
  *    BROADCAST against the index scan, so only index rows whose
  *    (band, bkey) bucket is touched by the batch survive the scan
  *    map-side — the index is never shuffled, and the matched subset
  *    is proportional to the batch, not the history.
  *  - Pairs where both sides are historical are skipped: they were
  *    emitted when the younger of the two docs was itself the batch.
  *    Each call therefore emits exactly the NEW pairs, and the union
  *    of all calls equals the full-batch [[DedupOps.minhashDupPairs]]
  *    over the accumulated corpus (asserted in DedupIndexSpec).
  *  - The append writes only the batch's bands (partitioned by band, so
  *    each of the `bands` partitions accretes small files — run
  *    [[Layout.compactPartitions]] as steady-state maintenance).
  *
  * Contract: doc ids are globally unique across batches. Replay safety
  * comes in two modes:
  *  - `batchTag = None` (one-shot/orchestrated): a batch is appended
  *    once; replaying it re-pairs its docs against the now-indexed copy
  *    of themselves (self-pairs are dropped, but cross pairs
  *    duplicate). Guard retries one level up.
  *  - `batchTag = Some(tag)` (streaming/retryable): the batch's bands
  *    land in (band, batch_tag) partitions via DYNAMIC partition
  *    overwrite — a replay with the same tag overwrites exactly its own
  *    partitions, so the index never double-counts and the returned
  *    pairs are identical (the pair set is deterministic given the same
  *    batch and surviving index state). An index is either all-tagged
  *    or all-untagged; mixing the two layouts breaks partition
  *    discovery.
  */
object DedupIndex {

  /** Find near-dup pairs of `batch` against the index ∪ the batch
    * itself, then append the batch's bands to the index. Returns
    * (id_a, id_b, est_jaccard), materialized BEFORE the append so the
    * lazy plan can never read the batch's own freshly-written rows. */
  def appendAndFindDups(spark: SparkSession, batch: DataFrame,
                        indexPath: String, text: String, id: String,
                        shingleWidth: Int = 3, k: Int = 64, bands: Int = 16,
                        threshold: Double = 0.5, maxBucket: Int = 200,
                        batchTag: Option[String] = None): DataFrame = {
    require(k % bands == 0, "bands must divide signature length")
    val newBands = DedupOps.bandSignatures(batch, text, id, shingleWidth, k, bands)
      .withColumn("is_new", lit(true))
    newBands.persist()
    try {
      // empty batch (or all-empty signatures): nothing to pair, nothing
      // to append — and never CREATE a schema-less index directory that
      // would wedge the next call's parquet read
      if (newBands.isEmpty)
        return DedupOps.minhashPairsFromBanded(newBands, id, k, threshold,
          maxBucket)
      val p = new Path(indexPath)
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val all =
        if (!fs.exists(p)) newBands
        else {
          // map-side pruning of the historical index: broadcast the
          // batch's touched bucket keys, keep only matching index rows
          val newKeys = newBands.select("band", "bkey").distinct()
          val oldHits = spark.read.parquet(indexPath)
            .join(broadcast(newKeys), Seq("band", "bkey"), "left_semi")
            .select(col(id), col("sig"), col("band"), col("bkey"))
            .withColumn("is_new", lit(false))
          newBands.unionByName(oldHits)
        }
      val pairs = DedupOps
        .minhashPairsFromBanded(all, id, k, threshold, maxBucket)
        .localCheckpoint(true) // pin results before the index mutates
      batchTag match {
        case Some(tag) =>
          newBands
            .select(col("band"), lit(tag).as("batch_tag"), col("bkey"),
              col(id), col("sig"))
            .write.mode(SaveMode.Overwrite)
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("band", "batch_tag").parquet(indexPath)
        case None =>
          newBands.select(col("band"), col("bkey"), col(id), col("sig"))
            .write.mode(SaveMode.Append).partitionBy("band").parquet(indexPath)
      }
      pairs
    } finally { newBands.unpersist(); () }
  }
}
