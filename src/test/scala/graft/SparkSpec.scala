package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local session for all suites (one JVM-wide session; suites are
  * forked into a single test JVM by sbt). */
object TestSpark {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.warehouse.dir",
      java.nio.file.Files.createTempDirectory("graft-warehouse").toString)
    .config("spark.ui.enabled", "false")
    // suites pin the AT-SCALE plan shapes (PlanSpec exchange budgets):
    // the scan-parallelism floor is a small-single-file layout
    // adaptation that is a no-op on production inputs, so keep it out
    // of the pinned plans; TablesScanFloorSpec flips it on explicitly
    // to cover the floor itself
    .config("spark.graft.scanParallelismFloor", "false")
    .getOrCreate()
}

abstract class SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = {
    val s = TestSpark.spark
    s.sparkContext.setLogLevel("WARN")
    s
  }
  def tmpDir(): String = {
    val d = java.nio.file.Files.createTempDirectory("graft-test").toFile
    d.deleteOnExit()
    d.toString
  }
}
