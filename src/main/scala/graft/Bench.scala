package graft
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Graft.harnessSession(cpus)
    // warm-up: JIT, codegen compiler, parquet footers — so the first
    // timed query is not charged for session startup
    graft.io.Tables.names.foreach { t =>
      try graft.io.Tables.read(spark, sfDir, t).count()
      catch { case _: Throwable => }
    }
    // ... and the window / broadcast-join / codegen machinery, which
    // otherwise bills its one-time init to the alphabetically-first key
    try {
      import spark.implicits._
      import org.apache.spark.sql.functions._
      import org.apache.spark.sql.expressions.Window
      (1 to 100).toDF("x")
        .withColumn("r", row_number().over(
          Window.partitionBy($"x" % 7).orderBy("x")))
        .join(broadcast((1 to 10).toDF("x")), "x")
        .groupBy("r").count().count()
    } catch { case _: Throwable => }
    // optional comma-separated key filter for targeted perf iteration
    val keyFilter = sys.env.get("SPARK_GRAFT_KEYS")
      .map(_.split(",").map(_.trim).toSet)
    val results = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => keyFilter.forall(_.contains(n)) }
      .map { case (name, fn) =>
      val t0 = System.nanoTime()
      // a failure must never masquerade as a fast success: report -1
      // for the key and shout on stderr so a broken build can't read
      // as a perf win
      val ok = try { fn(spark, sfDir).count(); true } catch {
        case e: Throwable =>
          System.err.println(s"[bench] $name FAILED: $e")
          false
      }
      name -> (if (ok) (System.nanoTime() - t0) / 1e9 else -1.0)
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    // failed keys carry -1 markers; they must not deflate the total
    val total = results.map(_._2).filter(_ >= 0).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
