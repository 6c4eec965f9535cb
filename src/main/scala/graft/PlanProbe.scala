package graft

/** Dev tool: print shuffle-Exchange counts for named keys (the
  * PlanSpec counting rule) at the given sf dir — run via
  * `scripts/run_main.sh graft.PlanProbe <sfDir> k1,k2` to size a new
  * key's exchange budget before pinning it in PlanSpec. */
object PlanProbe {
  def main(args: Array[String]): Unit = {
    val spark = Graft.harnessSession("8")
    val dir = args(0)
    for (k <- args(1).split(",")) {
      val p = SparkEntry.queries(k)(spark, dir)
        .queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
      val n = p.linesIterator
        .count(_.matches(raw"\(\d+\) Exchange( .*)?"))
      println(s"PLANPROBE $k exchanges=$n")
      if (sys.env.contains("PLANPROBE_FULL")) println(p)
    }
    spark.stop()
  }
}
