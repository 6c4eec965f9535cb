package graft

/** Controlled interleaved A/B of the scan-parallelism floor
  * ([[graft.io.Tables.read]]): for each key, alternate the
  * `spark.graft.scanParallelismFloor` runtime conf between reps in ONE
  * JVM, so both arms share every ambient factor (JIT state, block
  * manager, host load). Rep 1 per arm excluded (codegen compile).
  * Run: sbt "Test/runMain graft.FloorAB [sfDir] [reps] [k1,k2,...]" */
object FloorAB {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(1).map(_.toInt).getOrElse(6)
    require(reps >= 2,
      "FloorAB: reps must be >= 2 — rep 1 is excluded as warm-up, so " +
        "reps=1 would measure nothing and fail only after the full loop")
    val keys = args.lift(2).map(_.split(',').toSeq).getOrElse(Seq(
      "q_novelty", "q_decontam_matrix", "q_repeated_ngrams",
      "q_exact_substr", "q_kmeans_pp", "q_ann_pq", "q_quantile_sketch",
      "q_join_enrich", "q_rollup_read", "q_curate", "q_bpe_encode"))
    keys.foreach(k => require(SparkEntry.queries.contains(k),
      s"FloorAB: unknown key $k"))
    val spark = Graft.harnessSession(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    graft.io.Tables.names.foreach { t =>
      try graft.io.Tables.read(spark, sfDir, t).count()
      catch { case _: Throwable => }
    }
    // fixture prelude for incremental keys under test
    for (k <- Seq("q_scan_json_bars", "q_dedup_incremental",
        "q_rollup_read", "q_ann_index", "q_exact_substr_incremental",
        "q_dedup_embed_incremental", "q_quality_classifier",
        "q_curate_full", "q_filter_ab") if keys.contains(k))
      try SparkEntry.queries(k)(spark, sfDir).count()
      catch { case _: Throwable => }
    def hygiene(): Unit = { spark.catalog.clearCache(); System.gc() }
    val acc = scala.collection.mutable.Map.empty[(String, Boolean), List[Double]]
      .withDefaultValue(Nil)
    for (rep <- 1 to reps; name <- keys; floor <- Seq(true, false)) {
      hygiene()
      spark.conf.set("spark.graft.scanParallelismFloor", floor.toString)
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir).count()
      val s = (System.nanoTime() - t0) / 1e9
      if (rep > 1) acc((name, floor)) ::= s
    }
    for (name <- keys) {
      def stats(fl: Boolean) = {
        val ts = acc((name, fl)).sorted
        (ts.head, ts(ts.size / 2))
      }
      val (minOn, medOn) = stats(true)
      val (minOff, medOff) = stats(false)
      println(f"FLOORAB $name%-36s ON min=$minOn%.2f med=$medOn%.2f | " +
        f"OFF min=$minOff%.2f med=$medOff%.2f")
    }
    spark.stop()
  }
}
