package graft
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    // optional 3rd arg: comma-separated key list — dump (and emit oracle
    // SQL for) just those keys, for fast single-key iteration with
    // check.py; the driver always passes 2 args and gets the full run
    val (sfDir, outDir, only) = args match {
      case Array(s, o)       => (s, o, None)
      case Array(s, o, keys) => (s, o, Some(keys.split(',').toSet))
    }
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Graft.harnessSession(cpus)
    run(spark, sfDir, outDir, only)
    spark.stop()
  }

  /** The whole dump pass minus session ownership — what main wraps and
    * the merge-semantics regression spec drives with the suite session. */
  def run(spark: org.apache.spark.sql.SparkSession, sfDir: String,
          outDir: String, only: Option[Set[String]]): Unit = {
    // a typo'd key must fail loudly here — silently matching nothing
    // would dump zero queries AND overwrite a previous full run's
    // oracle_sql.json with {}, turning the next check.py into a
    // vacuous pass
    only.foreach { keys =>
      val unknown = keys -- SparkEntry.queries.keySet
      require(unknown.isEmpty,
        s"Verify: unknown key(s) ${unknown.toSeq.sorted.mkString(", ")}")
    }
    def wanted(name: String) = only.forall(_.contains(name))
    new java.io.File(outDir).mkdirs()
    SparkEntry.queries.foreach { case (name, fn) =>
      if (wanted(name))
        try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
          .parquet(s"$outDir/$name")
        catch { case e: Throwable =>
          System.err.println(s"[verify] $name failed: ${e.getMessage}")
        }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    // A key-filtered run MERGES into an existing oracle_sql.json rather
    // than replacing it: the other keys' parquet dumps from the previous
    // full run are still sitting in outDir, so shrinking the json would
    // make the next check.py silently validate a subset that still looks
    // like a full pass.
    val path = Paths.get(s"$outDir/oracle_sql.json")
    val subset = SparkEntry.oracleSql.filter(kv => wanted(kv._1))
    val merged: Map[String, String] =
      if (only.isDefined && Files.exists(path)) {
        import scala.jdk.CollectionConverters._
        val prev = new com.fasterxml.jackson.databind.ObjectMapper()
          .readTree(Files.readString(path))
        prev.fields().asScala
          .map(e => e.getKey -> e.getValue.asText).toMap ++ subset
      } else subset
    val json = merged
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(path, json)
    ()
  }
}
