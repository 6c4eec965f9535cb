package graft

import org.apache.spark.sql.SparkSession

/** Plan-hygiene dump: formatted physical plans for every query key, for
  * eyeballing pushdown / broadcast / codegen / exchange counts.
  * Usage: runMain graft.Explain [sfDir] [outFile] [keys...]
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val out = args.lift(1).getOrElse("/tmp/plans.txt")
    val keys = if (args.length > 2) args.drop(2).toSeq
      else SparkEntry.queries.keys.toSeq.sorted
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sb = new StringBuilder
    keys.foreach { k =>
      val plan = SparkEntry.queries(k)(spark, sfDir)
        .queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
      sb.append(s"\n===== $k =====\n").append(plan)
    }
    java.nio.file.Files.writeString(java.nio.file.Paths.get(out), sb.toString)
    println(s"[explain] wrote ${keys.size} plans to $out")
    spark.stop()
  }
}
