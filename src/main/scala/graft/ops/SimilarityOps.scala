package graft.ops

import org.apache.spark.sql.{DataFrame, Column}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.Expressions.{cosine_sim, hyperplane_lsh}
import graft.functions.Rounding.roundHalfUp

/** Approximate-nearest-neighbor search over an embedding column
  * (north-star extension, SURVEY §7.4).
  *
  * Two paths:
  *  - [[bruteForceTopK]]: exact — broadcast the (small) query set against
  *    the full corpus; one map-side pass, per-query top-k via window
  *    rank. The corpus is never shuffled; at 100 TB the cost is one scan.
  *    Cosine is a native codegen'd Catalyst expression
  *    ([[graft.functions.Expressions.CosineSim]]) — primitive float loop,
  *    no HOF boxing.
  *  - [[lshTopK]]: the scale path — random-hyperplane LSH buckets both
  *    sides; queries only compare against same-bucket candidates
  *    (expected corpus_fraction ~ 2^-bits per bucket). Recall < 1 by
  *    construction; verified against brute force in tests. Multi-probe
  *    (flipping one bit) widens recall at 1+bits probes per query.
  */
object SimilarityOps {

  /** Exact top-k neighbors for each query vector. */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, vec: String,
                     id: String, k: Int): DataFrame = {
    val q = queries.select(col(id).as("query_id"), col(vec).as("qvec"))
    val c = corpus.select(col(id).as("neighbor_id"), col(vec).as("nvec"))
    val scored = c.crossJoin(broadcast(q))
      .withColumn("sim", roundHalfUp(cosine_sim(col("qvec"), col("nvec")), 6))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("neighbor_id"))
    scored.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select("query_id", "neighbor_id", "sim", "rk")
  }

  /** IVF (inverted-file) ANN: k-means centroids partition the corpus;
    * a query searches only the `nprobe` clusters whose centroids are
    * nearest. The standard billion-scale ANN layout (FAISS IVF-Flat):
    * at 100 TB the cluster assignment is a one-off batch job and each
    * query touches corpus_size * nprobe / nlist vectors. Deterministic
    * via fixed k-means seed.
    */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, vec: String,
              id: String, k: Int, nlist: Int = 16, nprobe: Int = 4): DataFrame = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    val spark = corpus.sparkSession
    val c = corpus.select(col(id).as("neighbor_id"), col(vec).as("nvec"))
      .withColumn("fvec", array_to_vector(col("nvec")))
    val km = new KMeans().setK(nlist).setSeed(42L).setMaxIter(10)
      .setFeaturesCol("fvec").setPredictionCol("cluster")
    val model = km.fit(c)
    val assigned = model.transform(c).select(col("neighbor_id"), col("nvec"),
      col("cluster"))
    // centroids -> a small broadcast table of (cluster, centroid array<float>)
    import spark.implicits._
    val cents = model.clusterCenters.zipWithIndex
      .map { case (v, i) => (i, v.toArray.map(_.toFloat)) }
      .toSeq.toDF("cluster", "centroid")
    val q = queries.select(col(id).as("query_id"), col(vec).as("qvec"))
    // nprobe nearest centroids per query
    val qProbes = q.crossJoin(broadcast(cents))
      .withColumn("csim", cosine_sim(col("qvec"), col("centroid")))
      .withColumn("crk", row_number().over(
        Window.partitionBy(col("query_id")).orderBy(col("csim").desc, col("cluster"))))
      .filter(col("crk") <= nprobe)
      .select("query_id", "qvec", "cluster")
    val scored = assigned.join(broadcast(qProbes), Seq("cluster"))
      .withColumn("sim", roundHalfUp(cosine_sim(col("qvec"), col("nvec")), 6))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("neighbor_id"))
    scored.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select("query_id", "neighbor_id", "sim", "rk")
  }

  /** LSH-bucketed ANN: compare only within matching hyperplane buckets
    * (plus one-bit-flip multi-probe on the query side for recall). */
  def lshTopK(corpus: DataFrame, queries: DataFrame, vec: String,
              id: String, k: Int, bits: Int = 8): DataFrame = {
    val c = corpus.select(col(id).as("neighbor_id"), col(vec).as("nvec"),
      hyperplane_lsh(col(vec), bits).as("bucket"))
    val base = hyperplane_lsh(col("qvec"), bits)
    val probes = array((0 to bits).map { j =>
      if (j == 0) base else base.bitwiseXOR(lit(1 << (j - 1)))
    }: _*)
    val q = queries.select(col(id).as("query_id"), col(vec).as("qvec"))
      .withColumn("bucket", explode(array_distinct(probes)))
    val scored = c.join(broadcast(q), Seq("bucket"))
      .withColumn("sim", roundHalfUp(cosine_sim(col("qvec"), col("nvec")), 6))
      .dropDuplicates("query_id", "neighbor_id")
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("neighbor_id"))
    scored.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select("query_id", "neighbor_id", "sim", "rk")
  }
}
