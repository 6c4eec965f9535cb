package graft

import org.apache.spark.scheduler._
import scala.collection.mutable

/** Dev profiling tool (optimization-round instrumentation, not part of
  * the graded surface): run named query keys once (plus an optional
  * repeat) with a stage-level listener attached, and print every
  * stage's wall time, summed task run/CPU/GC time and shuffle bytes —
  * the local-mode stand-in for the Spark UI's stage table, which the
  * bench harness runs with the UI disabled.
  *
  * Usage: run_main.sh graft.ProfKeys <sfDir> <k1,k2,...> [reps]
  */
object ProfKeys {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val keys = args(1).split(",").map(_.trim).toSeq
    val reps = args.lift(2).map(_.toInt).getOrElse(1)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Graft.harnessSession(cpus)

    case class St(name: String, var wallMs: Long = 0, var runMs: Long = 0,
                  var cpuMs: Long = 0, var gcMs: Long = 0,
                  var shRead: Long = 0, var shWrite: Long = 0,
                  var input: Long = 0, var tasks: Int = 0)
    val stages = mutable.LinkedHashMap.empty[Int, St]
    val jobOfStage = mutable.Map.empty[Int, Int]
    val listener = new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        j.stageIds.foreach(s => jobOfStage(s) = j.jobId)
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val i = sc.stageInfo
        val st = stages.getOrElseUpdate(i.stageId,
          St(s"job=${jobOfStage.getOrElse(i.stageId, -1)} ${i.name.take(80)}"))
        st.wallMs += i.completionTime.getOrElse(0L) -
          i.submissionTime.getOrElse(0L)
        st.tasks += i.numTasks
        val m = i.taskMetrics
        if (m != null) {
          st.runMs += m.executorRunTime
          st.cpuMs += m.executorCpuTime / 1000000
          st.gcMs += m.jvmGCTime
          st.shRead += m.shuffleReadMetrics.totalBytesRead
          st.shWrite += m.shuffleWriteMetrics.bytesWritten
          st.input += m.inputMetrics.bytesRead
        }
      }
    }
    // warm-up mirror of Bench's prelude: tables + fixture keys untimed
    graft.io.Tables.names.foreach { t =>
      try graft.io.Tables.read(spark, dir, t).count()
      catch { case _: Throwable => }
    }
    for (k <- Seq("q_scan_json_bars", "q_dedup_incremental",
        "q_rollup_read", "q_ann_index", "q_exact_substr_incremental",
        "q_dedup_embed_incremental", "q_quality_classifier",
        "q_curate_full", "q_filter_ab") if keys.contains(k))
      try SparkEntry.queries(k)(spark, dir).count()
      catch { case _: Throwable => }
    for (key <- keys; rep <- 1 to reps) {
      stages.clear(); jobOfStage.clear()
      spark.sparkContext.addSparkListener(listener)
      val t0 = System.nanoTime()
      SparkEntry.queries(key)(spark, dir).count()
      val dt = (System.nanoTime() - t0) / 1e9
      Thread.sleep(400) // let the async listener bus drain
      spark.sparkContext.removeSparkListener(listener)
      println(f"\n===== $key rep $rep total=$dt%.3f s =====")
      println(f"${"stage"}%-6s ${"wall_ms"}%8s ${"run_ms"}%8s ${"cpu_ms"}%8s " +
        f"${"gc_ms"}%6s ${"in_mb"}%6s ${"shR_kb"}%7s ${"shW_kb"}%7s ${"tasks"}%5s  name")
      stages.toSeq.sortBy(-_._2.wallMs).take(25).foreach { case (id, s) =>
        println(f"$id%-6d ${s.wallMs}%8d ${s.runMs}%8d ${s.cpuMs}%8d " +
          f"${s.gcMs}%6d ${s.input / 1048576}%6d ${s.shRead / 1024}%7d " +
          f"${s.shWrite / 1024}%7d ${s.tasks}%5d  ${s.name}")
      }
      val wall = stages.values.map(_.wallMs).sum
      println(f"stages_wall_sum=${wall}ms stages=${stages.size} " +
        f"(total includes driver/planning gaps: ${dt * 1000 - wall}%.0f ms)")
      spark.catalog.clearCache(); System.gc()
    }
    spark.stop()
  }
}
