package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.io.Tables
import graft.ops.{Enrich, Restructure, Upsert, Windows}
import graft.functions.Rounding.{roundHalfUp, sqlRound}

/** The SURVEY §7.5 core query-key inventory: each key is the Spark
  * implementation of one reference operator (§2) over the driver
  * testdata, paired with DuckDB oracle SQL computing the identical
  * result (same column names, same deterministic ORDER BY, bit-exact
  * rounding via [[graft.functions.Rounding]]).
  *
  * Determinism rules (SURVEY §2.5 caveat): every window spec orders by
  * (ts, event_id) — event_id is unique — and every query ends in a
  * canonical ORDER BY covering a unique key or the full output row.
  */
object CoreQueries {
  type Q = (SparkSession, String) => DataFrame

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.read(s, dir, name)

  // -- shared fragments of the analysis chain (events plays stock_bars:
  //    event_type->stock, ts->timestamp (tie event_id), value->close) --

  private def withPrev(df: DataFrame): DataFrame =
    Windows.withPrev(df.select("event_type", "event_id", "ts", "value"),
      "event_type", "ts", "event_id", "value")

  private def withReturn(df: DataFrame): DataFrame =
    withPrev(df).withColumn("daily_return",
      Windows.dailyReturn(col("value"), col("prev_value")))

  private val orderedKeys = Seq("event_type", "ts", "event_id")

  // ---------------------------------------------------------------- queries

  val queries: Map[String, Q] = Map(
    // Flagship: the reference's full stock_bars_analysis CTAS body (W6).
    "q_full_analysis" -> ((s, dir) =>
      Windows.barAnalysis(t(s, dir, "events")
        .select("event_type", "event_id", "ts", "value"),
        "event_type", "ts", "event_id", "value")),

    // S3: table scan.
    "q_scan_table" -> ((s, dir) =>
      t(s, dir, "supplier").orderBy("s_suppkey")),

    // S2: single-column projection (the CSV Symbol-list read; real CSV
    // parsing is unit-tested against the 10-row dimension fixture).
    "q_scan_csv_project" -> ((s, dir) =>
      t(s, dir, "nation").select("n_name").orderBy("n_name")),

    // S1: the JSON bars-payload scan — events are shaped into the
    // reference's raw API payload {"bars": {sym: [bar...]}} and landed as
    // a JSON file, then read back through the real source path
    // (schema-pinned json scan -> map explode -> rename;
    // reference: alpaca_api.py:25-38 + assets.py:54-91). The oracle
    // recomputes the same rows straight from events, so the whole JSON
    // round-trip is value-checked without the oracle seeing the file.
    "q_scan_json_bars" -> ((s, dir) => {
      val bar = struct(
        (col("value") + lit(1.0)).as("c"),
        (col("value") * lit(2.0)).as("h"),
        (col("value") / lit(2.0)).as("l"),
        col("event_id").as("n"),
        col("value").as("o"),
        date_format(col("ts"), "yyyy-MM-dd'T'HH:mm:ss.SSSSSS'Z'").as("t"),
        col("user_id").as("v"),
        col("value").as("vw"))
      val ev = t(s, dir, "events")
      // payload file is keyed by (dir, content, session timezone) via
      // the shared Fixtures helper and reused when already landed — the
      // operator under test is the read path; building the fixture is
      // one-time setup. The tz is in the key because the 't' strings
      // are rendered with the session zone: a fixture landed under
      // another zone would poison a later UTC-verified run. The content
      // hash guards regenerated testdata: a stale payload would
      // mismatch the oracle (recomputed from the new table) — or worse,
      // false-pass against half-updated data.
      val tz = s.conf.get("spark.sql.session.timeZone", "local")
      val fx = graft.Fixtures.ensure("bars_json",
        dir.replaceAll("[^A-Za-z0-9]", "_") + "_" +
          graft.Fixtures.contentKey(s"bars_json|$dir", ev, "event_id", "value") +
          "_" + tz.replaceAll("[^A-Za-z0-9]", "_")) { p =>
        ev.groupBy(col("event_type")).agg(collect_list(bar).as("arr"))
          .agg(map_from_entries(collect_list(struct(col("event_type"), col("arr"))))
            .as("bars"))
          .select(to_json(struct(col("bars"))).as("payload"))
          .coalesce(1).write.mode("overwrite").text(p + "/payload")
      }
      graft.io.JsonSource.readBars(s, fx + "/payload")
        .orderBy("stock", "number_of_trades")
    }),

    // F2/F6: bulk rename + canonical projection.
    "q_project_rename" -> ((s, dir) =>
      Restructure.project(
        Restructure.renameAll(t(s, dir, "lineitem"), Map(
          "l_orderkey" -> "order_key", "l_linenumber" -> "line_no",
          "l_partkey" -> "part_key", "l_quantity" -> "qty",
          "l_extendedprice" -> "price")),
        Seq("order_key", "line_no", "part_key", "qty", "price"))
        // full-row sort: (order_key, line_no) is not unique here
        .orderBy("order_key", "line_no", "part_key", "qty", "price")),

    // F3: string -> timestamp round-trip (ISO text is the reference's
    // storage type for timestamps).
    "q_cast_ts" -> ((s, dir) =>
      t(s, dir, "events")
        .select(col("event_id"),
          date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("ts_str"))
        .withColumn("ts_parsed", to_timestamp(col("ts_str"), "yyyy-MM-dd HH:mm:ss"))
        .orderBy("event_id")),

    // F4: timestamp -> date.
    "q_cast_date" -> ((s, dir) =>
      t(s, dir, "events")
        .select(col("event_id"), to_date(col("ts")).as("dt"))
        .orderBy("event_id")),

    // F7: equality filter (checkpoint-row lookup shape).
    "q_filter_eq" -> ((s, dir) =>
      Restructure.filterEq(t(s, dir, "events"), "event_type", "purchase")
        .select("event_id", "ts", "user_id", "value")
        .orderBy("event_id")),

    // F8: incremental watermark filter (>= checkpoint, inclusive).
    "q_filter_incremental" -> ((s, dir) =>
      Restructure.filterFrom(t(s, dir, "events"), "ts",
        lit("2024-01-20 00:00:00").cast("timestamp"))
        .select("event_id", "ts", "event_type", "value")
        .orderBy("event_id")),

    // F1: flatten nested collection -> rows (Generate / UNNEST).
    "q_flatten_explode" -> ((s, dir) =>
      t(s, dir, "part")
        .select(col("p_partkey"),
          explode(split(col("p_name"), " ")).as("word"))
        .orderBy("p_partkey", "word")),

    // J1: fact ⋈ broadcast dimension, drop key, project.
    "q_join_enrich" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      val part = t(s, dir, "part")
      Enrich.enrich(li, part, "l_partkey", "p_partkey",
        dropDimCols = Seq("p_retailprice", "p_size", "p_type"))
        .select("l_orderkey", "l_linenumber", "l_quantity", "p_name", "p_brand")
        // (l_orderkey, l_linenumber) is NOT unique in the synthetic
        // lineitem — without the full-row tie-break the dumped order of
        // tied rows rests on both engines stable-sorting in file order
        .orderBy("l_orderkey", "l_linenumber", "l_quantity", "p_name",
          "p_brand")
    }),

    // W1: LAG.
    "q_lag_prev" -> ((s, dir) =>
      withPrev(t(s, dir, "events")).orderBy(orderedKeys.map(col): _*)),

    // W2: arithmetic + NULLIF + ROUND.
    "q_daily_return" -> ((s, dir) =>
      withReturn(t(s, dir, "events")).orderBy(orderedKeys.map(col): _*)),

    // W4: framed AVG (5-row trailing).
    "q_moving_avg_5" -> ((s, dir) =>
      t(s, dir, "events").select("event_type", "event_id", "ts", "value")
        .withColumn("moving_avg_5",
          roundHalfUp(avg(col("value")).over(
            Windows.trailing5(col("event_type"), col("ts"), col("event_id"))), 2))
        .orderBy(orderedKeys.map(col): _*)),

    // W5: framed STDDEV_SAMP over the rounded returns.
    "q_stddev_5" -> ((s, dir) =>
      withReturn(t(s, dir, "events"))
        .withColumn("stddev_5",
          roundHalfUp(stddev_samp(col("daily_return")).over(
            Windows.trailing5(col("event_type"), col("ts"), col("event_id"))), 2))
        .select("event_type", "event_id", "ts", "value", "daily_return", "stddev_5")
        .orderBy(orderedKeys.map(col): _*)),

    // A1: ungrouped MAX over the ISO-string timestamp (the watermark is a
    // lexicographic string max, == chronological for ISO-8601).
    "q_max_checkpoint" -> ((s, dir) =>
      t(s, dir, "events")
        .select(date_format(col("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("ts_str"))
        .agg(max(col("ts_str")).as("latest_timestamp"))),

    // A2: COUNT(*).
    "q_count_rows" -> ((s, dir) =>
      t(s, dir, "lineitem").agg(count(lit(1)).as("n"))),

    // L1: INSERT == unionByName of disjoint halves.
    "q_union_insert" -> ((s, dir) => {
      val e = t(s, dir, "events").select("event_id", "ts", "user_id", "event_type", "value")
      Upsert.insert(
        e.filter(col("event_id") % 2 === 0),
        e.filter(col("event_id") % 2 === 1))
        .orderBy("event_id")
    }),

    // L3: upsert == union + newest-wins dedup on the PK.
    "q_upsert_dedup" -> ((s, dir) => {
      val e = t(s, dir, "events").select("event_id", "ts", "user_id", "event_type", "value")
      val incoming = e.filter(col("event_id") % 7 === 0)
        .withColumn("value", col("value") + lit(100.0))
      Upsert.upsert(e, incoming, Seq("event_id")).orderBy("event_id")
    }),

    // Grouped aggregation (build-plan generalization of §2.4). Money sums
    // go through DECIMAL so Spark and DuckDB agree bit-exactly regardless
    // of partial-aggregation order, then surface as DOUBLE.
    "q_groupby_agg" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .filter(col("l_shipdate") <= lit("2000-12-01 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          sum(col("l_quantity").cast("decimal(18,2)")).cast("double").as("sum_qty"),
          sum(col("l_extendedprice").cast("decimal(18,2)")).cast("double").as("sum_base_price"),
          sum(col("l_extendedprice").cast("decimal(18,2)") *
            (lit(1).cast("decimal(18,2)") - col("l_discount").cast("decimal(18,2)")))
            .cast("double").as("sum_disc_price"),
          (sum(col("l_quantity").cast("decimal(18,2)")).cast("double") /
            count(lit(1))).as("avg_qty"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")),

    // Top-k: global sort + limit -> TakeOrderedAndProject (no full sort
    // materialization at scale; per-partition heaps + driver merge).
    "q_topk" -> ((s, dir) =>
      t(s, dir, "orders")
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(100))
  )

  // ------------------------------------------------------------ oracle SQL

  private val retSql = sqlRound("(value - prev_value) / nullif(prev_value, 0.0)", 3)

  // events.ts is TIMESTAMP_NS in the raw parquet; the Spark side reads it
  // as µs (Tables.read), so every oracle query goes through this µs-cast CTE.
  private[graft] val evCte =
    """ev AS (
      |  SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id, event_type, value
      |  FROM events)""".stripMargin

  private val prevCte =
    s"""WITH $evCte,
      |prev AS (
      |  SELECT event_type, event_id, ts, value,
      |         LAG(value, 1) OVER (PARTITION BY event_type ORDER BY ts, event_id) AS prev_value
      |  FROM ev)""".stripMargin

  val oracle: Map[String, String] = Map(
    "q_full_analysis" ->
      s"""$prevCte,
         |ret AS (
         |  SELECT event_type, event_id, ts, CAST(ts AS DATE) AS dt, value, prev_value,
         |         $retSql AS daily_return
         |  FROM prev)
         |SELECT event_type, event_id, dt, value, prev_value, daily_return,
         |       ${sqlRound("daily_return * 100", 1)} AS daily_return_pct,
         |       ${sqlRound("AVG(value) OVER w", 2)} AS moving_avg_5,
         |       ${sqlRound("STDDEV_SAMP(daily_return) OVER w", 2)} AS stddev_5
         |FROM ret
         |WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id
         |             ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)
         |ORDER BY event_type, ts, event_id""".stripMargin,

    "q_scan_table" ->
      "SELECT * FROM supplier ORDER BY s_suppkey",

    "q_scan_csv_project" ->
      "SELECT n_name FROM nation ORDER BY n_name",

    "q_scan_json_bars" ->
      s"""WITH $evCte
         |SELECT event_type AS stock,
         |  strftime(ts, '%Y-%m-%dT%H:%M:%S.%fZ') AS "timestamp",
         |  value AS open, value * 2.0 AS high, value / 2.0 AS low,
         |  value + 1.0 AS close, user_id AS volume,
         |  value AS volume_weighted_avg_price,
         |  event_id AS number_of_trades
         |FROM ev ORDER BY stock, number_of_trades""".stripMargin,

    "q_project_rename" ->
      """SELECT l_orderkey AS order_key, l_linenumber AS line_no,
        |       l_partkey AS part_key, l_quantity AS qty, l_extendedprice AS price
        |FROM lineitem
        |ORDER BY order_key, line_no, part_key, qty, price""".stripMargin,

    "q_cast_ts" ->
      s"""WITH $evCte
        |SELECT event_id, strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_str,
        |       strptime(strftime(ts, '%Y-%m-%d %H:%M:%S'), '%Y-%m-%d %H:%M:%S') AS ts_parsed
        |FROM ev ORDER BY event_id""".stripMargin,

    "q_cast_date" ->
      s"WITH $evCte SELECT event_id, CAST(ts AS DATE) AS dt FROM ev ORDER BY event_id",

    "q_filter_eq" ->
      s"""WITH $evCte
        |SELECT event_id, ts, user_id, value FROM ev
        |WHERE event_type = 'purchase' ORDER BY event_id""".stripMargin,

    "q_filter_incremental" ->
      s"""WITH $evCte
        |SELECT event_id, ts, event_type, value FROM ev
        |WHERE ts >= TIMESTAMP '2024-01-20 00:00:00' ORDER BY event_id""".stripMargin,

    "q_flatten_explode" ->
      """SELECT p_partkey, u.word FROM part,
        |UNNEST(string_split(p_name, ' ')) AS u(word)
        |ORDER BY p_partkey, word""".stripMargin,

    "q_join_enrich" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, p_name, p_brand
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |ORDER BY l_orderkey, l_linenumber, l_quantity, p_name, p_brand""".stripMargin,

    "q_lag_prev" ->
      s"$prevCte SELECT * FROM prev ORDER BY event_type, ts, event_id",

    "q_daily_return" ->
      s"""$prevCte
         |SELECT event_type, event_id, ts, value, prev_value,
         |       $retSql AS daily_return
         |FROM prev ORDER BY event_type, ts, event_id""".stripMargin,

    "q_moving_avg_5" ->
      s"""WITH $evCte
         |SELECT event_type, event_id, ts, value,
         |       ${sqlRound("AVG(value) OVER w", 2)} AS moving_avg_5
         |FROM ev
         |WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id
         |             ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)
         |ORDER BY event_type, ts, event_id""".stripMargin,

    "q_stddev_5" ->
      s"""$prevCte,
         |ret AS (
         |  SELECT event_type, event_id, ts, value, $retSql AS daily_return
         |  FROM prev)
         |SELECT event_type, event_id, ts, value, daily_return,
         |       ${sqlRound("STDDEV_SAMP(daily_return) OVER w", 2)} AS stddev_5
         |FROM ret
         |WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id
         |             ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)
         |ORDER BY event_type, ts, event_id""".stripMargin,

    "q_max_checkpoint" ->
      s"WITH $evCte SELECT max(strftime(ts, '%Y-%m-%d %H:%M:%S.%f')) AS latest_timestamp FROM ev",

    "q_count_rows" ->
      "SELECT count(*) AS n FROM lineitem",

    "q_union_insert" ->
      s"""WITH $evCte
        |SELECT event_id, ts, user_id, event_type, value FROM ev WHERE event_id % 2 = 0
        |UNION ALL
        |SELECT event_id, ts, user_id, event_type, value FROM ev WHERE event_id % 2 = 1
        |ORDER BY event_id""".stripMargin,

    "q_upsert_dedup" ->
      s"""WITH $evCte,
        |unioned AS (
        |  SELECT event_id, ts, user_id, event_type, value, 0 AS _src FROM ev
        |  UNION ALL
        |  SELECT event_id, ts, user_id, event_type, value + 100.0, 1 AS _src
        |  FROM ev WHERE event_id % 7 = 0),
        |ranked AS (
        |  SELECT *, row_number() OVER (PARTITION BY event_id ORDER BY _src DESC) AS rn
        |  FROM unioned)
        |SELECT event_id, ts, user_id, event_type, value FROM ranked
        |WHERE rn = 1 ORDER BY event_id""".stripMargin,

    "q_groupby_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |       (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_qty,
        |  count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '2000-12-01 00:00:00'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q_topk" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""".stripMargin
  )
}
