package graft

import org.apache.spark.sql.functions._

/** Contract tests for the content-keyed fixture helper: build-once
  * reuse, half-built residue rejection, scratch isolation, and the
  * memoized content key's guard semantics. */
class FixturesSpec extends SparkSpec with org.scalatest.BeforeAndAfterAll {
  import spark.implicits._

  private def freshKey(): String =
    "spec_" + java.util.UUID.randomUUID().toString.take(8)

  // fresh UUID keys can never be reused, so this suite's fixture dirs
  // (and .lock siblings) are pure garbage — clean them up, or every run
  // leaks parquet trees into java.io.tmpdir forever
  override def afterAll(): Unit = {
    try {
      val tmp = new java.io.File(System.getProperty("java.io.tmpdir"))
      tmp.listFiles().filter(_.getName.startsWith("graft_fx_fxspec_"))
        .foreach(f =>
          if (f.isDirectory)
            new scala.reflect.io.Directory(f).deleteRecursively()
          else f.delete())
    } finally super.afterAll()
  }

  test("ensure builds once, reuses thereafter, and keys isolate") {
    var builds = 0
    val key = freshKey()
    def go(k: String) = Fixtures.ensure("fxspec", k) { p =>
      builds += 1
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(p, "state.txt"), s"build-$builds")
    }
    val p1 = go(key)
    val p2 = go(key)
    assert(p1 == p2 && builds == 1, "same key must not rebuild")
    assert(java.nio.file.Files.readString(
      java.nio.file.Paths.get(p1, "state.txt")) == "build-1")
    go(freshKey())
    assert(builds == 2, "a different key is a different fixture")
  }

  test("half-built residue (no OK marker) is wiped and rebuilt; a failed build is never trusted") {
    val key = freshKey()
    intercept[RuntimeException] {
      Fixtures.ensure("fxspec", key) { p =>
        java.nio.file.Files.writeString(
          java.nio.file.Paths.get(p, "partial.txt"), "half")
        throw new RuntimeException("crash mid-build")
      }
    }
    // retry: the residue from the crashed build must be gone afterwards
    var sawPartial = false
    val p = Fixtures.ensure("fxspec", key) { dir =>
      sawPartial = java.nio.file.Files.exists(
        java.nio.file.Paths.get(dir, "partial.txt"))
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(dir, "good.txt"), "ok")
    }
    assert(!sawPartial, "crashed residue visible to the rebuild")
    assert(java.nio.file.Files.exists(
      java.nio.file.Paths.get(p, "good.txt")))
    assert(!java.nio.file.Files.exists(
      java.nio.file.Paths.get(p, "partial.txt")))
  }

  test("scratchCopy isolates mutation from the pristine fixture; drop removes it") {
    val key = freshKey()
    val fx = Fixtures.ensure("fxspec", key) { p =>
      spark.range(10).toDF("id").write.parquet(p + "/tbl")
    }
    val scratch = Fixtures.scratchCopy(fx + "/tbl")
    assert(spark.read.parquet(scratch).count() == 10)
    // mutate the scratch; the fixture must not move
    spark.range(5).toDF("id").write.mode("overwrite").parquet(scratch)
    assert(spark.read.parquet(scratch).count() == 5)
    assert(spark.read.parquet(fx + "/tbl").count() == 10,
      "scratch mutation leaked into the fixture")
    Fixtures.drop(scratch)
    assert(!new java.io.File(scratch).exists())
  }

  test("drop refuses any path that is not a scratchCopy result") {
    // drop deletes the PARENT dir (scratchCopy nests one level inside
    // its temp dir) — pointed at an arbitrary path it would silently
    // delete unrelated siblings, so the guard must reject it untouched
    val outside = java.nio.file.Files.createTempDirectory("fx_not_scratch")
    val victim = outside.resolve("data")
    java.nio.file.Files.createDirectory(victim)
    java.nio.file.Files.writeString(outside.resolve("sibling.txt"), "keep")
    intercept[IllegalArgumentException] { Fixtures.drop(victim.toString) }
    assert(java.nio.file.Files.exists(victim) &&
      java.nio.file.Files.exists(outside.resolve("sibling.txt")),
      "guard rejected the path but something was deleted")
  }

  test("contentKey: memoized per tag; count+xor key distinguishes content") {
    val tag1 = "fxspec_" + freshKey()
    val df1 = Seq((1L, 2.0), (3L, 4.0)).toDF("event_id", "value")
    val k1 = Fixtures.contentKey(tag1, df1, "event_id", "value")
    // memo: a DIFFERENT frame under the SAME tag returns the cached key
    // (the guard scan runs once per process — testdata never changes
    // mid-JVM)
    val df2 = Seq((9L, 9.0)).toDF("event_id", "value")
    assert(Fixtures.contentKey(tag1, df2, "event_id", "value") == k1)
    // fresh tags: differing content -> differing keys; xor's blind spot
    // (a duplicated row PAIR cancels) is covered by the count component
    val kOther = Fixtures.contentKey("fxspec_" + freshKey(), df2,
      "event_id", "value")
    assert(kOther != k1)
    val dupPair = df1.unionByName(df1.filter(col("event_id") === 1L))
      .unionByName(df1.filter(col("event_id") === 1L))
    val kDup = Fixtures.contentKey("fxspec_" + freshKey(), dupPair,
      "event_id", "value")
    assert(kDup != k1, "duplicated-pair corpus must not collide")
    // empty input: null bit_xor coalesces instead of NPE-ing
    val kEmpty = Fixtures.contentKey("fxspec_" + freshKey(),
      df1.filter(lit(false)), "event_id", "value")
    assert(kEmpty.startsWith("0_"))
  }
}
