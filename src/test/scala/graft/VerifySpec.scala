package graft

/** Regression pins for Verify's subset ("only") mode: a key-filtered
  * run must MERGE its oracle SQL into an existing oracle_sql.json
  * (never shrink it — the other keys' parquet dumps are still in
  * outDir, so a shrunken json would turn the next check.py into a
  * vacuous subset pass that looks full), and a typo'd key must fail
  * loudly instead of silently dumping nothing. */
class VerifySpec extends SparkSpec {

  test("subset runs merge into oracle_sql.json; full runs replace it") {
    val out = tmpDir()
    def keysIn(path: String): Set[String] = {
      val node = new com.fasterxml.jackson.databind.ObjectMapper()
        .readTree(java.nio.file.Files.readString(
          java.nio.file.Paths.get(path)))
      import scala.jdk.CollectionConverters._
      node.fieldNames().asScala.toSet
    }
    val sf = "/root/testdata/sf0.001"
    Verify.run(spark, sf, out, Some(Set("q_count_rows")))
    assert(keysIn(s"$out/oracle_sql.json") == Set("q_count_rows"))
    // a second, disjoint subset must ADD, not replace
    Verify.run(spark, sf, out, Some(Set("q_filter_eq")))
    assert(keysIn(s"$out/oracle_sql.json") ==
      Set("q_count_rows", "q_filter_eq"),
      "key-filtered run overwrote the previous run's oracle entries")
    // both parquet dumps coexist — the merge matches what's on disk
    assert(new java.io.File(s"$out/q_count_rows").exists())
    assert(new java.io.File(s"$out/q_filter_eq").exists())
  }

  test("unknown keys fail loudly before anything is written") {
    val out = tmpDir()
    val e = intercept[IllegalArgumentException] {
      Verify.run(spark, "/root/testdata/sf0.001", out,
        Some(Set("q_count_rows", "q_typo_no_such_key")))
    }
    assert(e.getMessage.contains("q_typo_no_such_key"))
    assert(!new java.io.File(s"$out/oracle_sql.json").exists(),
      "failed run left a partial oracle_sql.json behind")
  }
}
