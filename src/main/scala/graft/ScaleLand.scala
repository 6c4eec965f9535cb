package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Land a key-consistent N× copy of a testdata sf directory — the
  * order-of-magnitude ORACLE gate the per-round sf0.01 verify can't
  * give: `ScaleLand src dest mult` writes every table with per-copy
  * key offsets applied consistently across FK pairs (o_custkey ↔
  * c_custkey, l_orderkey ↔ o_orderkey, l_partkey ↔ p_partkey,
  * l_suppkey ↔ s_suppkey, event/user ids, doc/vec ids), so every
  * declared query runs at ~sf1 shape and `Verify dest out` +
  * `check.py dest out` still DuckDB-checks it exactly — catching
  * size-dependent breakage (bucket-cap crossings, codegen limits,
  * overflow) that small-sf parity structurally can't.
  *
  * Text copies follow the ScaleProbe crawl-shape policy (every token
  * suffixed `_k`, so copies are not cross-copy near-dups and dup
  * density stays constant); embeddings get the same per-copy
  * deterministic perturbation. region/nation are fixed dimensions and
  * stay single-copy (copies reference them unchanged).
  *
  * Usage: runMain graft.ScaleLand [srcSfDir] [destDir] [mult]
  */
object ScaleLand {

  private val OFF = 10000000L // > every base key domain, < fixture probe offsets×copies

  private def copies(mult: Int)(one: Int => DataFrame): DataFrame =
    (0 until mult).map(one).reduce(_ unionByName _)

  def scaleTables(spark: SparkSession, src: String, dest: String,
                  mult: Int): Unit = {
    def t(name: String) = graft.io.Tables.read(spark, src, name)
    def land(df: DataFrame, name: String): Unit =
      df.write.mode("overwrite").parquet(s"$dest/$name.parquet")

    def off(df: DataFrame, k: Int, cols: String*): DataFrame =
      cols.foldLeft(df)((d, c) =>
        d.withColumn(c, col(c) + lit(k * OFF)))

    land(t("region"), "region")
    land(t("nation"), "nation")
    land(copies(mult)(k => off(t("customer"), k, "c_custkey")), "customer")
    land(copies(mult)(k => off(t("supplier"), k, "s_suppkey")), "supplier")
    land(copies(mult)(k => off(t("part"), k, "p_partkey")), "part")
    land(copies(mult)(k =>
      off(t("orders"), k, "o_orderkey", "o_custkey")), "orders")
    land(copies(mult)(k =>
      off(t("lineitem"), k, "l_orderkey", "l_partkey", "l_suppkey")),
      "lineitem")
    // ts lands as TIMESTAMP_NTZ: Tables.read surfaces the source's
    // TIMESTAMP(NANOS) as an LTZ µs timestamp, but writing LTZ would
    // hand DuckDB a TIMESTAMPTZ where the real testdata reads naive —
    // keep the landed dir the same flavor the oracles were built for
    land(copies(mult)(k =>
      off(t("events"), k, "event_id", "user_id")
        .withColumn("ts", col("ts").cast("timestamp_ntz"))), "events")
    land(copies(mult) { k =>
      val d = off(t("documents"), k, "doc_id")
      if (k == 0) d
      // null text must STAY null in every copy: concat_ws never returns
      // null, so an unguarded rewrite would turn copy-k nulls into ""
      // — a spurious cross-copy exact-dup group that copy 0 lacks
      else d.withColumn("text",
        when(col("text").isNotNull,
          concat_ws(" ", transform(split(col("text"), " "),
            tk => concat(tk, lit(s"_$k"))))))
    }, "documents")
    land(copies(mult) { k =>
      val e = off(t("embeddings"), k, "vec_id")
      if (k == 0) e
      else e.withColumn("embedding",
        transform(col("embedding"), (x, i) =>
          (x + lit(0.001f) * (i % 7 - 3) * lit(k)).cast("float")))
    }, "embeddings")
  }

  def main(args: Array[String]): Unit = {
    val src = args.headOption.getOrElse("/root/testdata/sf0.1")
    val dest = args.lift(1).getOrElse("/tmp/graft_sf1")
    val mult = args.lift(2).map(_.toInt).getOrElse(10)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    scaleTables(spark, src, dest, mult)
    println(s"""{"metric":"scale_land","src":"$src","dest":"$dest","mult":$mult}""")
    spark.stop()
  }
}
