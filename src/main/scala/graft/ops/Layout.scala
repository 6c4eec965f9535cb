package graft.ops

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions.col

/** Write-side data layout for read-side skipping. At 100 TB the fastest
  * scan is the one that never happens: parquet keeps min/max stats per
  * row group and per file, and Spark's scan prunes row groups whose
  * stats exclude the pushed-down predicate — but only if the data is
  * clustered so the stats are tight. A table written in arrival order
  * has every file spanning the whole key domain (min≈global min,
  * max≈global max) and nothing ever skips.
  *
  * `writeRangeClustered` produces the layout that makes skipping real:
  * a range repartition on the cluster keys (one contiguous key slice
  * per output file — Spark samples the distribution, so skewed keys
  * still split evenly) plus an in-file sort (tight per-row-group stats
  * and run-length/dictionary-friendly pages). A point or range filter
  * on the leading cluster key then touches `1/numFiles` of the data.
  * LayoutSpec asserts the contract: per-file key ranges are pairwise
  * disjoint, so any key predicate selects at most one file per slice.
  */
object Layout {

  /** @param clusterCols leading column(s) queries filter on
    * @param numFiles    target file count (≈ table_bytes / 1 GB at scale) */
  def writeRangeClustered(df: DataFrame, path: String,
                          clusterCols: Seq[String], numFiles: Int,
                          mode: SaveMode = SaveMode.Overwrite): Unit = {
    require(clusterCols.nonEmpty && numFiles > 0)
    df.repartitionByRange(numFiles, clusterCols.map(col): _*)
      .sortWithinPartitions(clusterCols.map(col): _*)
      .write.mode(mode).parquet(path)
  }

  /** Two-dimensional clustering via the Morton curve: range-partition +
    * sort on `z_order(a, b)` so per-file min/max stats are tight on
    * BOTH columns — a lexicographic sort on (a, b) leaves b spanning
    * its whole domain in every file, so only filters on `a` ever skip.
    * Columns must be non-negative integers (bucket/offset first); the
    * z key is dropped before writing. */
  def writeZOrdered(df: DataFrame, path: String,
                    colA: String, colB: String, numFiles: Int,
                    mode: SaveMode = SaveMode.Overwrite): Unit = {
    require(numFiles > 0)
    val z = graft.functions.Expressions.z_order(col(colA), col(colB))
    df.withColumn("_graft_z", z)
      .repartitionByRange(numFiles, col("_graft_z"))
      .sortWithinPartitions(col("_graft_z"))
      .drop("_graft_z")
      .write.mode(mode).parquet(path)
  }

  /** Small-file compaction. Incremental/streaming writers accrete
    * files; at 100 TB a table of 4 KB files dies on driver file-listing
    * and per-file open cost long before any byte is scanned. Rewrites
    * the table into `ceil(bytes / targetFileBytes)` files and swaps it
    * in with CHECKED renames (write aside → old aside → new in place →
    * drop old): a crash at any point leaves either the old or the new
    * complete table at `path`, never neither. Hadoop `FileSystem`
    * throughout, so the same call works on HDFS/S3A. For a
    * dt-partitioned table, compact per partition directory.
    * Returns the file count written. */
  def compact(spark: SparkSession, path: String,
              targetFileBytes: Long = 512L << 20): Int = {
    require(targetFileBytes > 0)
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val bytes = fs.getContentSummary(p).getLength
    val nFiles = math.max(1L, (bytes + targetFileBytes - 1) / targetFileBytes).toInt
    val tmp = new Path(path + ".compact_tmp")
    val old = new Path(path + ".compact_old")
    spark.read.parquet(path).repartition(nFiles)
      .write.mode(SaveMode.Overwrite).parquet(tmp.toString)
    require(fs.rename(p, old), s"compact: could not move $p aside")
    if (!fs.rename(tmp, p)) { // restore and fail loudly, nothing lost
      fs.rename(old, p)
      sys.error(s"compact: could not move $tmp into place; original restored")
    }
    fs.delete(old, true)
    nFiles
  }
}
