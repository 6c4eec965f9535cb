package graft

/** Controlled interleaved A/B over the top-3 bench keys — the
  * BpeEncodeAB pattern applied to the r13 question: the driver record
  * moved q_pagerank 3.57 → 5.79 s with Graph.scala untouched, and the
  * "ambient host band" explanation was an inference. This harness
  * measures it: ≥7 interleaved reps per key in ONE JVM (interleaving
  * spreads any ambient drift across all keys instead of billing it to
  * whichever ran last), rep 1 excluded (codegen compile + fixture
  * build), min and median reported. Run:
  *   sbt "Test/runMain graft.TopKeysAB [sfDir] [reps] [k1,k2,...]"
  * Interpretation: if a key's controlled MIN sits at its r12 level,
  * the r13 driver number was ambient; if the min reproduces the r13
  * level, the key genuinely regressed and needs a root cause. */
object TopKeysAB {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(1).map(_.toInt).getOrElse(8)
    val keys = args.lift(2).map(_.split(',').toSeq).getOrElse(
      Seq("q_pagerank", "q_curate_incremental",
        "q_dedup_components_star"))
    keys.foreach(k => require(SparkEntry.queries.contains(k),
      s"TopKeysAB: unknown key $k"))
    val spark = Graft.harnessSession(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    // Bench's warm-up stance: tables + window/broadcast machinery
    graft.io.Tables.names.foreach { t =>
      try graft.io.Tables.read(spark, sfDir, t).count()
      catch { case _: Throwable => }
    }
    def hygiene(): Unit = { spark.catalog.clearCache(); System.gc() }
    val acc = scala.collection.mutable.Map.empty[String, List[Double]]
      .withDefaultValue(Nil)
    for (rep <- 1 to reps; name <- keys) {
      hygiene()
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir).count()
      val s = (System.nanoTime() - t0) / 1e9
      println(f"AB rep$rep $name: $s%.3f s")
      if (rep > 1) acc(name) ::= s
    }
    for (name <- keys) {
      val ts = acc(name).sorted
      println(f"AB RESULT $name min=${ts.head}%.3f " +
        f"med=${ts(ts.size / 2)}%.3f max=${ts.last}%.3f n=${ts.size}")
    }
    spark.stop()
  }
}
