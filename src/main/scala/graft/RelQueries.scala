package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.io.Tables
import graft.functions.Rounding.{roundHalfUp, sqlRound}

/** Relational-completeness query keys beyond the reference's literal
  * surface (SURVEY §2.3/§2.8 build-plan generalizations): outer/semi/
  * anti joins, set ops, DISTINCT, ranking windows, sessionization,
  * pivot, rollup, JSON extraction, and the literal-SQL (S4) path.
  * All oracle-checked.
  */
object RelQueries {
  import CoreQueries.Q

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.read(s, dir, name)

  private val evTypes = Seq("click", "error", "purchase", "signup", "view")

  /** Epoch-day coordinate shared by the range-join keys; their oracles
    * mirror it with date_diff('day', DATE '1970-01-01', ...). */
  private val epochDay = (c: Column) =>
    datediff(to_date(c), lit("1970-01-01")).cast("long")

  /** Wall-clock epoch micros, session-timezone-independent. Routing
    * through TIMESTAMP_NTZ (NTZ input: no-op cast; LTZ input: UTC
    * sessions — every session in this repo — convert identically)
    * keeps sessionize/range-frame gap arithmetic byte-stable even if a
    * caller ever drives these builders from a DST-observing session,
    * where `cast("timestamp")` + `unix_micros` would reinterpret NTZ
    * values per-wall-clock (ADVICE r10; TsDriftSpec pins the edge). */
  private val wallMicros = (c: Column) =>
    timestamp_diff("MICROSECOND",
      lit("1970-01-01 00:00:00").cast("timestamp_ntz"),
      c.cast("timestamp_ntz"))

  val queries: Map[String, Q] = Map(
    // LEFT OUTER: orders against a truncated customer dim -> null company
    // columns for unmatched orders.
    "q_join_left" -> ((s, dir) => {
      val o = t(s, dir, "orders")
      val c = t(s, dir, "customer").filter(col("c_custkey") < 500)
      o.join(broadcast(c), o("o_custkey") === c("c_custkey"), "left")
        .select(col("o_orderkey"), col("o_totalprice"), col("c_name"))
        .orderBy("o_orderkey")
    }),

    // LEFT SEMI (EXISTS): orders having at least one max-quantity line.
    "q_join_semi" -> ((s, dir) => {
      val o = t(s, dir, "orders")
      val li = t(s, dir, "lineitem").filter(col("l_quantity") >= 49)
      o.join(li, o("o_orderkey") === li("l_orderkey"), "left_semi")
        .select("o_orderkey", "o_totalprice")
        .orderBy("o_orderkey")
    }),

    // LEFT ANTI (NOT EXISTS).
    "q_join_anti" -> ((s, dir) => {
      val o = t(s, dir, "orders")
      val li = t(s, dir, "lineitem").filter(col("l_quantity") >= 49)
      o.join(li, o("o_orderkey") === li("l_orderkey"), "left_anti")
        .select("o_orderkey", "o_totalprice")
        .orderBy("o_orderkey")
    }),

    // DISTINCT over a projection.
    "q_distinct" -> ((s, dir) =>
      t(s, dir, "events").select("event_type", "user_id").distinct()
        .orderBy("event_type", "user_id")),

    // UNION (set semantics) of two overlapping slices == the whole table.
    "q_union_distinct" -> ((s, dir) => {
      val e = t(s, dir, "events").select("event_id", "event_type", "value")
      e.filter(col("event_id") < 600)
        .union(e.filter(col("event_id") >= 400)).distinct()
        .orderBy("event_id")
    }),

    // Exact COUNT(DISTINCT) per group (expand + two-phase agg in Spark).
    "q_count_distinct" -> ((s, dir) =>
      t(s, dir, "events").groupBy("event_type")
        .agg(countDistinct(col("user_id")).as("n_users"),
          count(lit(1)).as("n_events"))
        .orderBy("event_type")),

    // Ranking windows: row_number / rank / dense_rank per group.
    "q_window_rank" -> ((s, dir) => {
      val w = Window.partitionBy(col("o_orderpriority"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      t(s, dir, "orders")
        .select(col("o_orderpriority"), col("o_orderkey"), col("o_totalprice"),
          row_number().over(w).cast("long").as("rn"),
          rank().over(w).cast("long").as("rk"),
          dense_rank().over(w).cast("long").as("drk"))
        .filter(col("rn") <= 20)
        .orderBy("o_orderpriority", "rn")
    }),

    // Gap-based sessionization: new session when idle > 30 min.
    "q_sessionize" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      t(s, dir, "events")
        .withColumn("prev_ts", lag(col("ts"), 1).over(w))
        .withColumn("is_new",
          when(col("prev_ts").isNull, 1L)
            .when(wallMicros(col("ts")) - wallMicros(col("prev_ts")) >
              lit(1800L * 1000000L), 1L)
            .otherwise(0L))
        .withColumn("session_id",
          sum(col("is_new")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
        .select("user_id", "event_id", "session_id")
        .orderBy("user_id", "event_id")
    }),

    // PIVOT: per-user-bucket sums by event type (decimal-exact sums).
    "q_pivot" -> ((s, dir) =>
      t(s, dir, "events")
        .withColumn("bucket", col("user_id") % 10)
        .groupBy("bucket")
        .pivot("event_type", evTypes)
        .agg(sum(col("value").cast("decimal(18,2)")).cast("double"))
        .orderBy("bucket")),

    // ROLLUP with grouping indicators (decimal-exact sums).
    "q_rollup" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .rollup("l_returnflag", "l_linestatus")
        .agg(count(lit(1)).as("n"),
          sum(col("l_quantity").cast("decimal(18,2)")).cast("double").as("sum_qty"),
          grouping(col("l_returnflag")).cast("long").as("g_flag"),
          grouping(col("l_linestatus")).cast("long").as("g_status"))
        .orderBy(asc_nulls_first("l_returnflag"), asc_nulls_first("l_linestatus"))),

    // Distribution windows: percent_rank / cume_dist / ntile share the
    // one (priority) exchange and sort with the row_number tie-breaker.
    "q_window_dist" -> ((s, dir) => {
      val w = Window.partitionBy(col("o_orderpriority"))
        .orderBy(col("o_totalprice"), col("o_orderkey"))
      t(s, dir, "orders")
        .select(col("o_orderpriority"), col("o_orderkey"),
          roundHalfUp(percent_rank().over(w), 6).as("pct_rank"),
          roundHalfUp(cume_dist().over(w), 6).as("cume"),
          ntile(4).over(w).cast("long").as("quartile"))
        .orderBy("o_orderpriority", "o_orderkey")
    }),

    // Multi-hop star join (the TPC-H shape): the fact chain
    // lineitem ⋈ orders, then the customer -> nation -> region
    // dimension chain — every dim broadcast, so after the one fact-fact
    // exchange the row flows through a shuffle-free chain of
    // BroadcastHashJoins. Revenue in exact DECIMAL arithmetic so
    // partial-aggregation order can't shift a bit.
    "q_star_join" -> ((s, dir) => {
      val money = (c: Column) => c.cast("decimal(18,2)")
      val li = t(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_extendedprice"), col("l_discount"))
      val o = t(s, dir, "orders").select("o_orderkey", "o_custkey")
      val c = t(s, dir, "customer").select("c_custkey", "c_nationkey")
      val n = t(s, dir, "nation").select("n_nationkey", "n_name", "n_regionkey")
      val r = t(s, dir, "region").select("r_regionkey", "r_name")
      li.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(c), col("o_custkey") === col("c_custkey"))
        .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
        .groupBy("r_name", "n_name")
        .agg(count(lit(1)).as("n_items"),
          sum(money(col("l_extendedprice")) *
            (lit(java.math.BigDecimal.ONE) - money(col("l_discount"))))
            .cast("double").as("revenue"))
        .orderBy("r_name", "n_name")
    }),

    // GROUPING SETS (the general form ROLLUP/CUBE sugar over): exactly
    // the chosen combinations — here (status), (priority), and () —
    // one Expand, one exchange. SQL path: the DataFrame API has no
    // grouping-sets verb.
    "q_grouping_sets" -> ((s, dir) => {
      t(s, dir, "orders").createOrReplaceTempView("gs_orders")
      s.sql("""SELECT o_orderstatus, o_orderpriority, count(*) AS n,
              |  CAST(grouping(o_orderstatus) AS BIGINT) AS g_status,
              |  CAST(grouping(o_orderpriority) AS BIGINT) AS g_prio
              |FROM gs_orders
              |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
              |ORDER BY o_orderstatus ASC NULLS FIRST,
              |         o_orderpriority ASC NULLS FIRST""".stripMargin)
    }),

    // CUBE: all four grouping combinations in one pass (Expand feeds a
    // single aggregate exchange); grouping() disambiguates real NULLs.
    "q_cube" -> ((s, dir) =>
      t(s, dir, "orders")
        .cube("o_orderstatus", "o_orderpriority")
        .agg(count(lit(1)).as("n"),
          sum(col("o_totalprice").cast("decimal(18,2)")).cast("double")
            .as("sum_price"),
          grouping(col("o_orderstatus")).cast("long").as("g_status"),
          grouping(col("o_orderpriority")).cast("long").as("g_prio"))
        .orderBy(asc_nulls_first("o_orderstatus"),
          asc_nulls_first("o_orderpriority"))),

    // Semi-structured: JSON field extraction from the props column.
    "q_json_extract" -> ((s, dir) =>
      t(s, dir, "events")
        .select(col("event_id"),
          get_json_object(col("props"), "$.k").cast("long").as("k"))
        .orderBy("event_id")),

    // As-of join: each purchase matched with the user's latest click at
    // or before it (single-shuffle carry-forward composition; DuckDB's
    // native ASOF JOIN is the oracle).
    "q_asof_join" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      val purchases = ev.filter(col("event_type") === "purchase")
        .select("user_id", "event_id", "ts")
      val clicks = ev.filter(col("event_type") === "click")
        .groupBy("user_id", "ts").agg(max("value").as("click_value"))
      graft.ops.AsofJoin.asofJoin(purchases, clicks, "user_id", "ts", "ts",
        Seq("click_value"))
        .select(col("user_id"), col("event_id"), col("asof_click_value"))
        .orderBy("user_id", "event_id")
    }),

    // Incrementally-maintained rollup under the oracle gate: two
    // batches (split by a hash of event_id) fold into a date-
    // partitioned rollup via IncrementalAgg.maintain; the finalized
    // read must equal a from-scratch aggregation — DuckDB computes the
    // latter directly. The batch-0 rollup is landed ONCE under a
    // content-keyed fixture path (a deployment pays the initial load
    // once); each run copies it to a scratch dir (the merge MUTATES the
    // table) and times only the batch-1 merge + finalized read. Scratch
    // dirs are local demo plumbing; the operator takes any Hadoop path.
    "q_rollup_read" -> ((s, dir) => {
      import graft.pipeline.IncrementalAgg
      val ev = t(s, dir, "events")
        .select(to_date(col("ts")).as("d"), col("event_type"),
          col("value"), col("event_id"))
      val split = graft.functions.PortableHash.hashMod(col("event_id"), 2L)
      val fx = graft.Fixtures.ensure("rollup_b0",
        dir.replaceAll("[^A-Za-z0-9]", "_") + "_" +
          graft.Fixtures.contentKey(s"rollup_b0|$dir", ev,
            "d", "event_type", "value", "event_id")) { p =>
        IncrementalAgg.maintain(s, ev.filter(split === 0), p + "/rollup",
          "d", Seq("event_type"), "value")
        ()
      }
      val agg = graft.Fixtures.scratchCopy(fx + "/rollup")
      IncrementalAgg.maintain(s, ev.filter(split === 1), agg, "d",
        Seq("event_type"), "value")
      val out = IncrementalAgg.finalized(s.read.parquet(agg))
        .select(col("dt"), col("event_type"), col("n"),
          roundHalfUp(col("sum_v").cast("double"), 4).as("sum_v"),
          col("min_v"), col("max_v"),
          roundHalfUp(col("avg_v"), 6).as("avg_v"))
        .orderBy("dt", "event_type")
        .localCheckpoint(true) // materialize before the scratch dir goes
      graft.Fixtures.drop(agg)
      out
    }),

    // Nearest as-of: whichever click is closer in time, backward
    // winning ties (pandas merge_asof semantics; oracle: two DuckDB
    // ASOF joins + the same interval-compared CASE).
    "q_asof_nearest" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      val purchases = ev.filter(col("event_type") === "purchase")
        .select("user_id", "event_id", "ts")
      val clicks = ev.filter(col("event_type") === "click")
        .groupBy("user_id", "ts").agg(max("value").as("click_value"))
      graft.ops.AsofJoin.asofJoin(purchases, clicks, "user_id", "ts", "ts",
        Seq("click_value"), direction = "nearest")
        .select(col("user_id"), col("event_id"), col("asof_click_value"))
        .orderBy("user_id", "event_id")
    }),

    // Forward as-of: earliest click at or after each purchase (the
    // next-touch attribution direction; oracle: DuckDB ASOF with <=).
    "q_asof_forward" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      val purchases = ev.filter(col("event_type") === "purchase")
        .select("user_id", "event_id", "ts")
      val clicks = ev.filter(col("event_type") === "click")
        .groupBy("user_id", "ts").agg(max("value").as("click_value"))
      graft.ops.AsofJoin.asofJoin(purchases, clicks, "user_id", "ts", "ts",
        Seq("click_value"), direction = "forward")
        .select(col("user_id"), col("event_id"), col("asof_click_value"))
        .orderBy("user_id", "event_id")
    }),

    // OHLC resampling: the bar-builder the reference's domain runs on —
    // tumbling 10-minute buckets, open/close picked by deterministic
    // (ts, event_id) row order. Both window sorts share the one
    // (type, bucket) exchange.
    "q_ohlc_resample" -> ((s, dir) => {
      val ev = t(s, dir, "events")
        .select(col("event_type"), col("ts"), col("value"), col("event_id"))
        .withColumn("bucket", window(col("ts"), "10 minutes").getField("start"))
      val part = Window.partitionBy("event_type", "bucket")
      ev.withColumn("rn_a",
          row_number().over(part.orderBy(col("ts"), col("event_id"))))
        .withColumn("rn_d",
          row_number().over(part.orderBy(col("ts").desc, col("event_id").desc)))
        .groupBy("event_type", "bucket")
        .agg(max(when(col("rn_a") === 1, col("value"))).as("open"),
          max("value").as("high"), min("value").as("low"),
          max(when(col("rn_d") === 1, col("value"))).as("close"),
          count(lit(1)).as("n"))
        .orderBy("bucket", "event_type")
    }),

    // Funnel analysis: strictly-ordered view -> click -> purchase per
    // user; users counted at their deepest reached stage. ONE exchange:
    // the three stage timestamps are sequential full-partition windows
    // over the same user_id partitioning (c1's predicate reads v1, which
    // is per-user constant, so each stage is still a plain MIN), the
    // per-user stage reuses that partitioning for its groupBy, and only
    // the tiny per-stage count re-shuffles. The old form (3 filtered
    // groupBys + 3 joins + a distinct) exchanged the events table 5x.
    "q_funnel" -> ((s, dir) => {
      val wu = Window.partitionBy("user_id")
      t(s, dir, "events").select("user_id", "event_type", "ts")
        .withColumn("v1",
          min(when(col("event_type") === "view", col("ts"))).over(wu))
        .withColumn("c1",
          min(when(col("event_type") === "click" && col("ts") > col("v1"),
            col("ts"))).over(wu))
        .withColumn("p1",
          min(when(col("event_type") === "purchase" && col("ts") > col("c1"),
            col("ts"))).over(wu))
        .groupBy("user_id")
        .agg(max(when(col("p1").isNotNull, 3L).when(col("c1").isNotNull, 2L)
          .when(col("v1").isNotNull, 1L).otherwise(0L)).as("funnel_stage"))
        .groupBy("funnel_stage").agg(count(lit(1)).as("n_users"))
        .orderBy("funnel_stage")
    }),

    // UNPIVOT/melt: wide metric columns to (metric, val) rows.
    "q_unpivot" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .select("l_orderkey", "l_linenumber", "l_quantity",
          "l_extendedprice", "l_discount")
        .unpivot(Array(col("l_orderkey"), col("l_linenumber")),
          Array(col("l_quantity"), col("l_extendedprice"), col("l_discount")),
          "metric", "val")
        // val completes the sort: (l_orderkey, l_linenumber) ties exist
        .orderBy("l_orderkey", "l_linenumber", "metric", "val")),

    // Skew-safe COUNT(DISTINCT): same answer as q_count_distinct via
    // the two-phase plan whose both exchanges spread hot groups.
    "q_distinct_skewsafe" -> ((s, dir) =>
      graft.ops.Skew.countDistinctSkewSafe(
          t(s, dir, "events"), Seq("event_type"), "user_id")
        .withColumnRenamed("n_distinct", "n_users")
        .orderBy("event_type")),

    // Exact COUNT(DISTINCT) via the custom mergeable-bitmap aggregate
    // (TypedImperativeAggregate): one shuffle carrying one bitmap per
    // (group x partition) instead of the built-in's Expand + re-agg.
    "q_bitmap_distinct" -> ((s, dir) =>
      t(s, dir, "events").groupBy("event_type")
        .agg(graft.functions.BitmapDistinct.bitmap_distinct(col("user_id"))
          .as("n_users"))
        .orderBy("event_type")),

    // Snapshot diff: orders vs a deterministically mutated copy —
    // added/removed/changed per PK via one full-outer co-partitioned
    // join (graft.ops.Diff).
    "q_snapshot_diff" -> ((s, dir) => {
      val old = t(s, dir, "orders")
        .select("o_orderkey", "o_custkey", "o_totalprice")
      val k = col("o_orderkey")
      val mutated = old.filter(k % 100 =!= 0)
        .withColumn("o_totalprice",
          when(k % 13 === 0, col("o_totalprice") + 1)
            .otherwise(col("o_totalprice")))
        .unionByName(old.filter(k % 97 === 0)
          .withColumn("o_orderkey", k + 100000000L))
      graft.ops.Diff.snapshotDiff(old, mutated, Seq("o_orderkey"))
        .orderBy("o_orderkey", "change_type")
    }),

    // SCD Type-2 dimension merge: an update batch closes changed keys'
    // open rows at the effective date and opens new versions; history
    // rows pass through untouched (graft.ops.Scd2, one key exchange).
    // Fixture: customer as the dim; every 3rd key gets an update (every
    // 6th actually changes, the rest are no-ops), every 97th key also
    // arrives as a brand-new key, every 10th key carries a pre-existing
    // closed history row.
    "q_scd2" -> ((s, dir) => {
      val c = t(s, dir, "customer")
        .select(col("c_custkey").as("k"), col("c_mktsegment").as("seg"),
          col("c_nationkey").cast("long").as("nat"))
      val open = c
        .withColumn("valid_from", to_date(lit("2020-01-01")))
        .withColumn("valid_to", lit(null).cast("date"))
        .withColumn("is_current", lit(true))
      val hist = c.filter(col("k") % 10 === 0)
        .withColumn("seg", lit("HISTORIC"))
        .withColumn("valid_from", to_date(lit("2019-01-01")))
        .withColumn("valid_to", to_date(lit("2020-01-01")))
        .withColumn("is_current", lit(false))
      val updates = c.filter(col("k") % 3 === 0)
        .withColumn("seg", when(col("k") % 6 === 0,
          concat(lit("X-"), col("seg"))).otherwise(col("seg")))
        .unionByName(c.filter(col("k") % 97 === 0)
          .withColumn("k", col("k") + 1000000L)
          .withColumn("seg", lit("NEW")))
        .withColumn("effective_date", to_date(lit("2021-06-01")))
      graft.ops.Scd2.merge(open.unionByName(hist), updates, Seq("k"))
        .orderBy("k", "valid_from", "is_current")
    }),

    // Cohort retention: users bucketed by first-seen week, distinct
    // users per (cohort week, week offset). Cohort assignment via a
    // per-user window min — ONE shuffle serves both the cohort and the
    // final aggregation.
    "q_cohort_retention" -> ((s, dir) => {
      val ev = t(s, dir, "events")
        .select(col("user_id"),
          to_date(date_trunc("week", col("ts"))).as("wk"))
      val w = Window.partitionBy("user_id")
      ev.withColumn("cohort_wk", min("wk").over(w))
        .withColumn("week_offset",
          (datediff(col("wk"), col("cohort_wk")) / 7).cast("long"))
        .groupBy("cohort_wk", "week_offset")
        .agg(countDistinct("user_id").as("n_users"))
        .orderBy("cohort_wk", "week_offset")
    }),

    // Skew-salted join: orders (skewed side) joined to customer with the
    // key salted across 8 reducers, then rolled up by market segment.
    // Salt never escapes, so the oracle is the plain join.
    "q_join_salted" -> ((s, dir) =>
      graft.ops.Skew.saltedJoin(
          t(s, dir, "orders").select("o_custkey", "o_totalprice"),
          t(s, dir, "customer").withColumnRenamed("c_custkey", "o_custkey")
            .select("o_custkey", "c_mktsegment"),
          Seq("o_custkey"), salt = 8)
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n_orders"),
          sum(col("o_totalprice").cast("decimal(18,2)")).cast("double")
            .as("sum_price"))
        .orderBy("c_mktsegment")),

    // Bloom-pruned selective join (the explicit runtime-filter pattern,
    // ops/Prune): the dimension is a ~1%-of-keys slice of orders; its
    // bloom prefilters the lineitem side MAP-SIDE, before the join
    // exchange — at 100 TB that is the difference between shuffling the
    // whole fact table and shuffling ~1% of it. Bloom filters have no
    // false negatives and the join discards false positives, so the
    // result is row-identical to the plain join: the oracle IS the
    // plain join.
    "q_bloom_join" -> ((s, dir) => {
      val fact = t(s, dir, "lineitem")
        .select(col("l_orderkey").as("k"), col("l_quantity"))
      val dim = t(s, dir, "orders")
        .filter(col("o_orderpriority") === "1-URGENT" &&
          col("o_orderkey") % 97 === 0)
        .select(col("o_orderkey").as("k"), col("o_totalprice"))
      graft.ops.Prune.bloomPrunedJoin(fact, dim, "k")
        .orderBy("k", "l_quantity")
    }),

    // Link-graph centrality (ops/Graph): fixed-point integer PageRank,
    // 5 iterations, over the undirected customer–supplier interaction
    // graph for one trade year (curation link graphs are always
    // windowed; the shipdate predicate reaches the parquet scan).
    // Supplier ids are offset into their own key space. Symmetrization
    // is a map-side explode — a union of two selects would evaluate
    // the join subtree twice (union branches share no subplan) — and
    // dedup is left to pagerank's own edge distinct. Integer
    // arithmetic makes the ranks bit-exact under ANY partitioning —
    // the oracle replays the identical div/sum ops in unrolled SQL
    // (pagerankOracleSql).
    //
    // Bench note: this is launch-bound, not plan-bound. The
    // fixed-iteration path chains all rounds between lineage cuts into
    // ONE lazy job (graph build + one batched job + final orderBy);
    // measured floor for ANY exchange-bearing job on this 32-thread
    // local session is ~0.3-0.8 s even on a 16k-row cache, so the
    // key's remaining wall time is mostly fixed launch/codegen tax
    // that amortizes away on a cluster where each round does minutes
    // of real shuffle work. The per-round plan is the right one: edge
    // cache hash-partitioned on src and scanned once, rank side the
    // co-partitioned shuffle-hash build, exactly one |V|-row exchange
    // per round.
    "q_pagerank" -> ((s, dir) => {
      val o = t(s, dir, "orders").select("o_orderkey", "o_custkey")
      val li = t(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1995-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1996-01-01").cast("timestamp"))
        .select("l_orderkey", "l_suppkey")
      // the 1e9 offset keeps supplier ids disjoint from customer keys
      // up to sf ~6600 (TPC-H custkey max = 150k x sf); a collision
      // would alias two distinct nodes AND break oracle parity (the
      // operator dedups symmetrized edges, the oracle's UNION ALL
      // assumes the directed pair sets are disjoint by construction)
      val und = li.join(o, col("l_orderkey") === col("o_orderkey"))
        .select(col("o_custkey").as("src"),
          (col("l_suppkey") + lit(1000000000L)).as("dst"))
        .select(explode(array(
          struct(col("src"), col("dst")),
          struct(col("dst").as("src"), col("src").as("dst")))).as("e"))
        .select(col("e.src"), col("e.dst"))
      val ranks = graft.ops.Graph.pagerank(und, "src", "dst", iters = 5)
      ranks.orderBy("node")
    }),

    // Range (interval) join with no equi-key: lineitems shipped within
    // 7 days of a sampled order's date, counted per interval. The naive
    // inequality join is a nested-loop; RangeJoin bucketizes to an
    // equi-join (oracle: DuckDB's native inequality join).
    "q_range_join" -> ((s, dir) => {
      val epoch = epochDay
      val intervals = t(s, dir, "orders")
        .filter(col("o_orderkey") % 997 === 0)
        .select(col("o_orderkey"), epoch(col("o_orderdate")).as("iv_start"),
          (epoch(col("o_orderdate")) + 7).as("iv_end"))
      val points = t(s, dir, "lineitem")
        .select(epoch(col("l_shipdate")).as("ship_day"))
      graft.ops.RangeJoin.rangeJoin(points, intervals,
          "ship_day", "iv_start", "iv_end", bucketSize = 7L)
        .groupBy("o_orderkey").agg(count(lit(1)).as("n_shipped"))
        .orderBy("o_orderkey")
    }),

    // Interval × interval OVERLAP join (validity windows, session
    // overlap): two order samples with 14-day windows, every pair whose
    // windows intersect. Bucketized on both sides with exactly-once
    // emission from the overlap-start bucket — no dedup shuffle
    // (oracle: DuckDB's native inequality join).
    "q_interval_overlap" -> ((s, dir) => {
      val epoch = epochDay
      def win(modulus: Int, p: String) = t(s, dir, "orders")
        .filter(col("o_orderkey") % modulus === 0)
        .select(col("o_orderkey").as(s"${p}_key"),
          epoch(col("o_orderdate")).as(s"${p}_lo"),
          (epoch(col("o_orderdate")) + 14).as(s"${p}_hi"))
      graft.ops.RangeJoin.intervalOverlapJoin(win(97, "a"), win(89, "b"),
          "a_lo", "a_hi", "b_lo", "b_hi", bucketSize = 16L)
        .select("a_key", "b_key")
        .orderBy("a_key", "b_key")
    }),

    // INTERSECT (set semantics): customers active in both 1994 and 1995.
    "q_intersect" -> ((s, dir) => {
      def active(y: Int) = t(s, dir, "orders")
        .filter(year(col("o_orderdate")) === y).select("o_custkey")
      active(1994).intersect(active(1995)).orderBy("o_custkey")
    }),

    // EXCEPT (set semantics): customers active in 1994 but not 1995.
    "q_except" -> ((s, dir) => {
      def active(y: Int) = t(s, dir, "orders")
        .filter(year(col("o_orderdate")) === y).select("o_custkey")
      active(1994).except(active(1995)).orderBy("o_custkey")
    }),

    // §2.7 scalar-function breadth: string / conditional / date scalar
    // functions over the part+orders tables, every one oracle-matched.
    "q_scalar_funcs" -> ((s, dir) =>
      t(s, dir, "part")
        .select(col("p_partkey"),
          upper(col("p_brand")).as("brand_u"),
          lower(col("p_type")).as("type_l"),
          substring(col("p_name"), 1, 8).as("name_pfx"),
          length(col("p_name")).cast("long").as("name_len"),
          concat_ws("|", col("p_brand"), col("p_type")).as("brand_type"),
          regexp_extract(col("p_name"), "([a-z]+)", 1).as("first_word"),
          coalesce(nullif(col("p_type"), lit("ECONOMY")), lit("OTHER"))
            .as("type_or_other"),
          when(col("p_size") >= 25, "big")
            .when(col("p_size") >= 10, "mid")
            .otherwise("small").as("size_class"),
          (col("p_retailprice") * 2).as("price_x2"))
        .orderBy("p_partkey")),

    // Date/interval arithmetic (cast chain + add/diff/extract).
    "q_date_arith" -> ((s, dir) =>
      t(s, dir, "orders")
        .select(col("o_orderkey"),
          to_date(col("o_orderdate")).as("d"),
          date_add(to_date(col("o_orderdate")), 30).as("d_plus30"),
          datediff(lit("1998-12-31").cast("date"), to_date(col("o_orderdate")))
            .cast("long").as("days_to_end"),
          year(col("o_orderdate")).cast("long").as("yr"),
          month(col("o_orderdate")).cast("long").as("mo"),
          dayofmonth(col("o_orderdate")).cast("long").as("dom"),
          date_trunc("month", col("o_orderdate")).cast("date").as("month_start"))
        .orderBy("o_orderkey")),

    // RANGE-framed window: rolling 1-hour event sum per user — the
    // time-based frame the ROWS-framed analysis chain can't express.
    "q_range_frame" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts_us"))
        .rangeBetween(-3600L * 1000000L, Window.currentRow)
      t(s, dir, "events")
        .withColumn("ts_us", wallMicros(col("ts")))
        .withColumn("hour_sum",
          sum(col("value").cast("decimal(18,2)")).over(w).cast("double"))
        .withColumn("hour_n", count(lit(1)).over(w))
        .select("user_id", "event_id", "hour_sum", "hour_n")
        .orderBy("user_id", "event_id")
    }),

    // LEAD / FIRST_VALUE / LAST_VALUE / NTH_VALUE with explicit frames.
    "q_lead_first_last" -> ((s, dir) => {
      val w = Window.partitionBy(col("event_type")).orderBy(col("ts"), col("event_id"))
      val wf = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      t(s, dir, "events")
        .select(col("event_type"), col("event_id"), col("ts"), col("value"),
          lead(col("value"), 1).over(w).as("next_value"),
          first_value(col("value")).over(wf).as("first_v"),
          last_value(col("value")).over(wf).as("last_v"),
          nth_value(col("value"), 2).over(wf).as("second_v"))
        .drop("ts")
        .orderBy("event_type", "event_id")
    }),

    // Correlated scalar subquery (decorrelated by Catalyst into a join).
    "q_scalar_subquery" -> ((s, dir) => {
      t(s, dir, "orders").createOrReplaceTempView("ssq_orders")
      t(s, dir, "lineitem").createOrReplaceTempView("ssq_lineitem")
      s.sql(
        """SELECT o_orderkey, o_totalprice,
          |  (SELECT max(l_quantity) FROM ssq_lineitem
          |   WHERE l_orderkey = o_orderkey) AS max_qty
          |FROM ssq_orders ORDER BY o_orderkey""".stripMargin)
    }),

    // §2.7 statistical aggregates: Pearson correlation + sample
    // covariance per group. Both engines stream doubles in different
    // partial-merge orders; shared HALF_UP rounding canonicalizes the
    // last-ulp divergence.
    "q_corr_covar" -> ((s, dir) =>
      t(s, dir, "lineitem").groupBy("l_returnflag")
        .agg(
          roundHalfUp(corr(col("l_quantity"), col("l_extendedprice")), 6)
            .as("corr_qp"),
          roundHalfUp(covar_samp(col("l_quantity"), col("l_extendedprice")), 4)
            .as("covar_qp"))
        .orderBy("l_returnflag")),

    // Row-level quarantine: rows violating any DQ rule are routed aside
    // with the violated rule names (map-side tag, one scan).
    "q_quarantine" -> ((s, dir) => {
      val rules = Seq(
        "qty_high" -> (col("l_quantity") > 45),
        "disc_high" -> (col("l_discount") > 0.08),
        "tax_high" -> (col("l_tax") > 0.06))
      val (_, bad) = graft.ops.Quarantine.split(t(s, dir, "lineitem"), rules)
      // (l_orderkey, l_linenumber) is not unique in the synthetic
      // testdata — reasons joins the sort key to pin tied rows
      bad.select(col("l_orderkey"), col("l_linenumber"), col("reasons"))
        .orderBy("l_orderkey", "l_linenumber", "reasons")
    }),

    // Robust outlier detection per group (median absolute deviation):
    // median -> MAD -> count of |x - median| > 3 * MAD. Three passes by
    // definition (each statistic conditions the next); the per-group
    // statistics broadcast back, so the detail table never shuffles —
    // at 100 TB the cost is three scans, zero exchanges of the data.
    "q_anomaly_mad" -> ((s, dir) => {
      val li = t(s, dir, "lineitem").select("l_returnflag", "l_extendedprice")
      val dev = abs(col("l_extendedprice") - col("med"))
      // med and mad are ROUNDED before any comparison consumes them:
      // the discrete outlier count thresholds on them, and an unrounded
      // percentile differing by an engine ulp would flip boundary rows
      val med = li.groupBy("l_returnflag")
        .agg(roundHalfUp(percentile(col("l_extendedprice"), lit(0.5)), 4)
          .as("med"))
      val mad = li.join(broadcast(med), "l_returnflag")
        .groupBy("l_returnflag")
        .agg(roundHalfUp(percentile(dev, lit(0.5)), 4).as("mad"))
      li.join(broadcast(med), "l_returnflag")
        .join(broadcast(mad), "l_returnflag")
        .groupBy("l_returnflag")
        .agg(first(col("med")).as("median"), first(col("mad")).as("mad"),
          count(when(dev > lit(3) * col("mad"), 1)).as("n_outliers"),
          count(lit(1)).as("n"))
        .orderBy("l_returnflag")
    }),

    // MODE with a pinned tie-break (most-frequent segment per nation,
    // ties to the lexically smallest). Deliberately NOT the builtin
    // mode() aggregate — its tie choice is engine-defined on both Spark
    // and DuckDB, and a per-group value map doesn't partial-aggregate.
    // Two-level shape instead: (nat, seg) counts combine map-side, then
    // the winner is a row_number over the already-tiny count table.
    "q_mode" -> ((s, dir) => {
      val c = t(s, dir, "customer")
        .groupBy(col("c_nationkey").cast("long").as("nat"),
          col("c_mktsegment").as("seg"))
        .agg(count(lit(1)).as("n"))
      c.withColumn("rk", row_number().over(
          Window.partitionBy("nat").orderBy(col("n").desc, col("seg"))))
        .filter(col("rk") === 1)
        .select(col("nat"), col("seg").as("mode_seg"), col("n"))
        .orderBy("nat")
    }),

    // Linear-regression aggregates per group (slope/intercept/r2/count)
    // — single partial-aggregated exchange; rounding absorbs the
    // accumulation-order ulps between engines.
    "q_regr" -> ((s, dir) =>
      t(s, dir, "lineitem").groupBy("l_returnflag")
        .agg(
          regr_count(col("l_extendedprice"), col("l_quantity")).as("n"),
          roundHalfUp(regr_slope(col("l_extendedprice"), col("l_quantity")), 4)
            .as("slope"),
          roundHalfUp(
            regr_intercept(col("l_extendedprice"), col("l_quantity")), 2)
            .as("icept"),
          roundHalfUp(regr_r2(col("l_extendedprice"), col("l_quantity")), 6)
            .as("r2"))
        .orderBy("l_returnflag")),

    // Ordered string aggregation (LISTAGG WITHIN GROUP): each user's
    // event-type journey in event-time order — the SQL-standard form,
    // deterministic via the (ts, event_id) sort inside the group.
    "q_string_agg" -> ((s, dir) => {
      t(s, dir, "events").select("user_id", "event_type", "ts", "event_id")
        .createOrReplaceTempView("ev_sagg")
      s.sql("""SELECT user_id,
              |  listagg(event_type, '|')
              |    WITHIN GROUP (ORDER BY ts, event_id) AS journey
              |FROM ev_sagg GROUP BY user_id ORDER BY user_id""".stripMargin)
    }),

    // S4: the flagship analysis as literal SQL through spark.sql over a
    // temp view — same semantics, same oracle as q_full_analysis.
    "q_full_analysis_sql" -> ((s, dir) => {
      t(s, dir, "events").select("event_type", "event_id", "ts", "value")
        .createOrReplaceTempView("ev_sql")
      s.sql(AnalysisSql.flagshipSql("ev_sql"))
    }),

    // Gap fill / densify: per-user daily value series with missing days
    // synthesized and forward-filled (ops.Windows.gapFill). Daily sums
    // go through DECIMAL(18,2) so partial-aggregation order cannot
    // shift a bit vs the oracle.
    "q_gap_fill" -> ((s, dir) => {
      val daily = t(s, dir, "events")
        .groupBy(col("user_id"), to_date(col("ts")).as("d"))
        .agg(sum(col("value").cast("decimal(18,2)")).cast("double").as("v"))
      graft.ops.Windows.gapFill(daily, "user_id", "d", "v")
        .orderBy("user_id", "d")
    }),

    // §2.7 FILTER-clause conditional aggregation: one pass computing
    // differently-predicated aggregates per group — the pivot-free form
    // of per-category rollups (no Expand, one exchange).
    "q_cond_agg" -> ((s, dir) =>
      t(s, dir, "events").groupBy(col("user_id"))
        .agg(
          count(lit(1)).as("n_events"),
          count(when(col("event_type") === "purchase", lit(1))).as("n_purchase"),
          sum(when(col("event_type") === "purchase",
            col("value").cast("decimal(18,2)"))).cast("double").as("purchase_value"),
          max(when(col("event_type") === "click", col("ts"))).as("last_click"))
        .orderBy("user_id")),

    // RSI-14 (simple-average form) over each event_type series: classic
    // momentum oscillator from the reference's stock domain. Gains and
    // losses via explicit CASE (not `greatest`) because greatest's
    // null-handling differs across engines; a 14-row trailing frame
    // keeps the window constant-memory streaming.
    "q_rsi" -> ((s, dir) =>
      graft.ops.Windows.rsi(t(s, dir, "events"),
          "event_type", "ts", "event_id", "value", n = 14)
        .select("event_type", "event_id", "rsi")
        .orderBy("event_type", "event_id")),

    // Running-peak drawdown per series: unbounded-preceding MAX frame
    // (exact, no FP accumulation) then the relative drop, NULLIF-guarded.
    "q_drawdown" -> ((s, dir) =>
      graft.ops.Windows.drawdown(t(s, dir, "events"),
          "event_type", "ts", "event_id", "value")
        .select("event_type", "event_id", "value", "peak", "drawdown")
        .orderBy("event_type", "event_id")),

    // Volume-weighted average price per (flag, ship month). Both sums
    // run in exact DECIMAL so partial-aggregation order cannot shift a
    // bit; the ratio is taken in double and HALF_UP-rounded.
    "q_vwap" -> ((s, dir) => {
      val money = (c: Column) => c.cast("decimal(18,2)")
      t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"),
          trunc(to_date(col("l_shipdate")), "month").as("ship_month"))
        .agg(
          sum(money(col("l_extendedprice")) * money(col("l_quantity")))
            .cast("double").as("pq"),
          sum(money(col("l_quantity"))).cast("double").as("total_qty"))
        .select(col("l_returnflag"), col("ship_month"),
          roundHalfUp(col("pq") / col("total_qty"), 4).as("vwap"),
          col("total_qty"))
        .orderBy("l_returnflag", "ship_month")
    }),

    // MAX_BY/MIN_BY (argmax/argmin aggregates): first/last value per
    // group keyed on the globally-unique event_id, so the arg ordering
    // has no ties and the result is deterministic under any merge order.
    "q_argminmax" -> ((s, dir) =>
      t(s, dir, "events").groupBy("event_type")
        .agg(
          min_by(col("value"), col("event_id")).as("first_value"),
          max_by(col("value"), col("event_id")).as("last_value"),
          min(col("value")).as("min_value"),
          max(col("value")).as("max_value"))
        .orderBy("event_type")),

    // Fixed-width histogram: width_bucket-style binning via a manual
    // floor-div so both engines evaluate the identical double
    // expression (builtin width_bucket boundary semantics differ).
    "q_histogram" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .groupBy(floor(col("l_extendedprice") / lit(5000.0)).cast("long").as("bucket"))
        .agg(count(lit(1)).as("n"))
        .withColumn("bucket_lo", (col("bucket") * lit(5000L)).cast("double"))
        .select("bucket", "bucket_lo", "n")
        .orderBy("bucket")),

    // Null-handling surface: na.fill (constant imputation) + na.drop
    // (row filtering on null), over columns nullified by NULLIF-style
    // guards — the DataFrameNaFunctions face of F9.
    "q_na_fill" -> ((s, dir) => {
      val withNulls = t(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"),
          when(col("l_discount") === 0.0, lit(null).cast("double"))
            .otherwise(col("l_discount")).as("disc_filled"),
          when(col("l_tax") === 0.0, lit(null).cast("double"))
            .otherwise(col("l_tax")).as("tax_kept"))
      withNulls.na.fill(Map("disc_filled" -> 0.05))
        .na.drop(Seq("tax_kept"))
        // full-row sort: (l_orderkey, l_linenumber) is not unique in
        // the synthetic lineitem (post-fill/drop, no nulls remain)
        .orderBy("l_orderkey", "l_linenumber", "disc_filled", "tax_kept")
    }),

    // Bollinger bands: 20-row moving average ± 2 sample stddevs per
    // series, plus the breach flag — the band-breakout signal built
    // from the same one-exchange framed-window machinery as the
    // flagship (all three window columns share the sort).
    "q_bollinger" -> ((s, dir) => {
      val w20 = Window.partitionBy(col("event_type"))
        .orderBy(col("ts"), col("event_id")).rowsBetween(-19, Window.currentRow)
      t(s, dir, "events")
        .withColumn("mavg", avg(col("value")).over(w20))
        .withColumn("sd", stddev_samp(col("value")).over(w20))
        // breach thresholds on the ROUNDED bands: engines' stddev
        // recurrences differ in the last ulp, and a value within an ulp
        // of the raw band would flip the discrete flag between engines
        // while every rounded column still matched
        .withColumn("band_lo", roundHalfUp(col("mavg") - lit(2.0) * col("sd"), 4))
        .withColumn("band_hi", roundHalfUp(col("mavg") + lit(2.0) * col("sd"), 4))
        .select(col("event_type"), col("event_id"),
          roundHalfUp(col("mavg"), 4).as("mavg"),
          col("band_lo"), col("band_hi"),
          when(col("sd").isNull, lit(null).cast("long"))
            .when(col("value") > col("band_hi"), 1L)
            .when(col("value") < col("band_lo"), -1L)
            .otherwise(0L).as("breach"))
        .orderBy("event_type", "event_id")
    }),

    // Per-group z-score normalization: the feature-scaling pass of a
    // training pipeline, as analytic window aggregates (group mean and
    // stddev joined implicitly by the window — no separate agg+join).
    "q_zscore" -> ((s, dir) => {
      val w = Window.partitionBy(col("event_type"))
      t(s, dir, "events")
        .withColumn("mu", avg(col("value")).over(w))
        .withColumn("sd", stddev_samp(col("value")).over(w))
        .select(col("event_type"), col("event_id"),
          roundHalfUp((col("value") - col("mu")) / nullif(col("sd"), lit(0.0)), 4)
            .as("zscore"))
        .orderBy("event_type", "event_id")
    }),

    // Rolling cross-series correlation: daily click/purchase value
    // totals aligned by date (decimal-exact daily sums), then corr over
    // a trailing 30-day ROWS frame — the rolling-correlation-matrix
    // primitive of quant analytics. The single unpartitioned window is
    // deliberate: the frame is over the DATE axis (~hundreds of rows
    // after aggregation); per-symbol variants partition by symbol.
    "q_rolling_corr" -> ((s, dir) => {
      val daily = t(s, dir, "events")
        .filter(col("event_type").isin("click", "purchase"))
        .groupBy(to_date(col("ts")).as("d"), col("event_type"))
        .agg(sum(col("value").cast("decimal(18,2)")).cast("double").as("v"))
      val wide = daily.groupBy("d")
        .pivot("event_type", Seq("click", "purchase")).agg(max(col("v")))
      val w = Window.orderBy(col("d")).rowsBetween(-29, Window.currentRow)
      wide.withColumn("corr_cp",
          roundHalfUp(corr(col("click"), col("purchase")).over(w), 4))
        .select("d", "click", "purchase", "corr_cp")
        .orderBy("d")
    }),

    // L6 schema reflection as a first-class operator: the table's
    // column inventory (name, 1-based ordinal) as rows. Metadata is
    // inherently driver-side — this reads the parquet footer schema,
    // never data.
    "q_schema_reflect" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "lineitem").schema.fields.toSeq.zipWithIndex
        .map { case (f, i) => (f.name, (i + 1).toLong) }
        .toDF("column_name", "pos").orderBy("pos")
    })
  )

  // ------------------------------------------------------------ oracle SQL

  // the ns->us cast CTE every events oracle depends on — ONE definition
  // (CoreQueries'); a drifted private copy would silently split the two
  // files' oracle semantics
  private val evCte = CoreQueries.evCte

  /** [[graft.ops.Graph.pagerank]] replayed in SQL: the directed-edge
    * CTE is symmetrized, degree-joined, and the fixed-point iteration
    * unrolled (`iters` CTEs), every step in the SAME exact integer
    * arithmetic as the operator — per-edge `pr // outdeg`, exact sum,
    * `base + (damp * Σ) // 100`. `base` is computed HERE in Scala long
    * arithmetic and emitted as a literal so the two sides cannot
    * disagree on its rounding. Positive operands throughout, where
    * DuckDB `//` and Spark `div` coincide. Mirrors Graph.pagerank;
    * change together. */
  private def pagerankOracleSql(edgeCte: String, iters: Int, scale: Long,
                                damp: Int): String = {
    val base = (100L - damp) * scale / 100L
    val steps = (1 to iters).map { i =>
      s"""p$i AS (
         |  SELECT n.node,
         |    $base + CAST(($damp * COALESCE(s.c, 0)) // 100 AS BIGINT) AS pr
         |  FROM nodes n LEFT JOIN (
         |    SELECT e.dst AS node, SUM(p.pr // e.d) AS c
         |    FROM ewd e JOIN p${i - 1} p ON p.node = e.src
         |    GROUP BY e.dst) s ON s.node = n.node)""".stripMargin
    }.mkString(",\n")
    s"""WITH e0 AS (
       |  $edgeCte),
       |edges AS (
       |  SELECT src, dst FROM e0 UNION ALL SELECT dst, src FROM e0),
       |nodes AS (
       |  SELECT src AS node FROM edges UNION SELECT dst FROM edges),
       |ewd AS (
       |  SELECT e.src, e.dst, d.d
       |  FROM edges e JOIN (
       |    SELECT src, count(*) AS d FROM edges GROUP BY src) d
       |  ON d.src = e.src),
       |p0 AS (SELECT node, CAST($scale AS BIGINT) AS pr FROM nodes),
       |$steps
       |SELECT node, pr FROM p$iters ORDER BY node""".stripMargin
  }

  val oracle: Map[String, String] = Map(
    "q_corr_covar" ->
      s"""SELECT l_returnflag,
         |  ${sqlRound("corr(l_quantity, l_extendedprice)", 6)} AS corr_qp,
         |  ${sqlRound("covar_samp(l_quantity, l_extendedprice)", 4)} AS covar_qp
         |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_quarantine" ->
      """SELECT l_orderkey, l_linenumber,
        |  concat_ws(',',
        |    CASE WHEN l_quantity > 45 THEN 'qty_high' END,
        |    CASE WHEN l_discount > 0.08 THEN 'disc_high' END,
        |    CASE WHEN l_tax > 0.06 THEN 'tax_high' END) AS reasons
        |FROM lineitem
        |WHERE l_quantity > 45 OR l_discount > 0.08 OR l_tax > 0.06
        |ORDER BY l_orderkey, l_linenumber, reasons""".stripMargin,

    "q_anomaly_mad" ->
      s"""WITH med AS (
         |  SELECT l_returnflag,
         |    ${sqlRound("quantile_cont(l_extendedprice, 0.5)", 4)} AS med
         |  FROM lineitem GROUP BY 1),
         |mad AS (
         |  SELECT l.l_returnflag,
         |    ${sqlRound("quantile_cont(abs(l_extendedprice - med), 0.5)", 4)} AS mad
         |  FROM lineitem l JOIN med USING (l_returnflag) GROUP BY 1)
         |SELECT l.l_returnflag,
         |  any_value(med) AS median,
         |  any_value(mad) AS mad,
         |  CAST(count(CASE WHEN abs(l_extendedprice - med) > 3 * mad
         |    THEN 1 END) AS BIGINT) AS n_outliers,
         |  count(*) AS n
         |FROM lineitem l JOIN med USING (l_returnflag)
         |  JOIN mad USING (l_returnflag)
         |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_mode" ->
      """WITH c AS (
        |  SELECT CAST(c_nationkey AS BIGINT) AS nat, c_mktsegment AS seg,
        |    count(*) AS n
        |  FROM customer GROUP BY 1, 2),
        |r AS (SELECT nat, seg, n, row_number() OVER (
        |    PARTITION BY nat ORDER BY n DESC, seg) AS rk FROM c)
        |SELECT nat, seg AS mode_seg, n FROM r WHERE rk = 1
        |ORDER BY nat""".stripMargin,

    "q_regr" ->
      s"""SELECT l_returnflag,
         |  CAST(regr_count(l_extendedprice, l_quantity) AS BIGINT) AS n,
         |  ${sqlRound("regr_slope(l_extendedprice, l_quantity)", 4)} AS slope,
         |  ${sqlRound("regr_intercept(l_extendedprice, l_quantity)", 2)} AS icept,
         |  ${sqlRound("regr_r2(l_extendedprice, l_quantity)", 6)} AS r2
         |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_string_agg" ->
      s"""WITH $evCte
         |SELECT user_id,
         |  string_agg(event_type, '|' ORDER BY ts, event_id) AS journey
         |FROM ev GROUP BY user_id ORDER BY user_id""".stripMargin,

    "q_join_left" ->
      """SELECT o_orderkey, o_totalprice, c_name
        |FROM orders LEFT JOIN (SELECT * FROM customer WHERE c_custkey < 500) c
        |  ON o_custkey = c_custkey
        |ORDER BY o_orderkey""".stripMargin,

    "q_join_semi" ->
      """SELECT o_orderkey, o_totalprice FROM orders
        |WHERE EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_orderkey = o_orderkey AND l_quantity >= 49)
        |ORDER BY o_orderkey""".stripMargin,

    "q_join_anti" ->
      """SELECT o_orderkey, o_totalprice FROM orders
        |WHERE NOT EXISTS (SELECT 1 FROM lineitem
        |                  WHERE l_orderkey = o_orderkey AND l_quantity >= 49)
        |ORDER BY o_orderkey""".stripMargin,

    "q_distinct" ->
      """SELECT DISTINCT event_type, user_id FROM events
        |ORDER BY event_type, user_id""".stripMargin,

    "q_union_distinct" ->
      s"""WITH $evCte
         |SELECT event_id, event_type, value FROM ev WHERE event_id < 600
         |UNION
         |SELECT event_id, event_type, value FROM ev WHERE event_id >= 400
         |ORDER BY event_id""".stripMargin,

    "q_count_distinct" ->
      """SELECT event_type, count(DISTINCT user_id) AS n_users,
        |       count(*) AS n_events
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q_bitmap_distinct" ->
      """SELECT event_type, count(DISTINCT user_id) AS n_users
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q_window_rank" ->
      """SELECT * FROM (
        |  SELECT o_orderpriority, o_orderkey, o_totalprice,
        |    row_number() OVER w AS rn, rank() OVER w AS rk,
        |    dense_rank() OVER w AS drk
        |  FROM orders
        |  WINDOW w AS (PARTITION BY o_orderpriority
        |               ORDER BY o_totalprice DESC, o_orderkey))
        |WHERE rn <= 20 ORDER BY o_orderpriority, rn""".stripMargin,

    "q_sessionize" ->
      s"""WITH $evCte,
         |p AS (
         |  SELECT user_id, event_id, ts,
         |         LAG(ts, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
         |  FROM ev),
         |f AS (
         |  SELECT user_id, event_id, ts,
         |         CASE WHEN prev_ts IS NULL THEN 1
         |              WHEN epoch_us(ts) - epoch_us(prev_ts) > 1800 * 1000000 THEN 1
         |              ELSE 0 END AS is_new
         |  FROM p)
         |SELECT user_id, event_id,
         |       CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
         |                              ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
         |FROM f ORDER BY user_id, event_id""".stripMargin,

    "q_pivot" -> {
      val cells = evTypes.map(t =>
        s"CAST(sum(CASE WHEN event_type = '$t' THEN CAST(value AS DECIMAL(18,2)) END) AS DOUBLE) AS \"$t\"")
        .mkString(",\n  ")
      s"""SELECT user_id % 10 AS bucket,
         |  $cells
         |FROM events GROUP BY 1 ORDER BY bucket""".stripMargin
    },

    "q_rollup" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS n,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  CAST(grouping(l_returnflag) AS BIGINT) AS g_flag,
        |  CAST(grouping(l_linestatus) AS BIGINT) AS g_status
        |FROM lineitem
        |GROUP BY ROLLUP(l_returnflag, l_linestatus)
        |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin,

    "q_window_dist" ->
      s"""SELECT o_orderpriority, o_orderkey,
         |  ${sqlRound("percent_rank() OVER w", 6)} AS pct_rank,
         |  ${sqlRound("cume_dist() OVER w", 6)} AS cume,
         |  CAST(ntile(4) OVER w AS BIGINT) AS quartile
         |FROM orders
         |WINDOW w AS (PARTITION BY o_orderpriority
         |             ORDER BY o_totalprice, o_orderkey)
         |ORDER BY o_orderpriority, o_orderkey""".stripMargin,

    "q_star_join" ->
      """SELECT r_name, n_name, count(*) AS n_items,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |           (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q_grouping_sets" ->
      """SELECT o_orderstatus, o_orderpriority, count(*) AS n,
        |  CAST(grouping(o_orderstatus) AS BIGINT) AS g_status,
        |  CAST(grouping(o_orderpriority) AS BIGINT) AS g_prio
        |FROM orders
        |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        |ORDER BY o_orderstatus ASC NULLS FIRST,
        |         o_orderpriority ASC NULLS FIRST""".stripMargin,

    "q_cube" ->
      """SELECT o_orderstatus, o_orderpriority, count(*) AS n,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
        |  CAST(grouping(o_orderstatus) AS BIGINT) AS g_status,
        |  CAST(grouping(o_orderpriority) AS BIGINT) AS g_prio
        |FROM orders
        |GROUP BY CUBE(o_orderstatus, o_orderpriority)
        |ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""".stripMargin,

    "q_json_extract" ->
      """SELECT event_id,
        |  CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
        |FROM events ORDER BY event_id""".stripMargin,

    "q_asof_join" ->
      s"""WITH $evCte,
         |p AS (SELECT user_id, event_id, ts FROM ev WHERE event_type = 'purchase'),
         |c AS (SELECT user_id, ts, max(value) AS click_value FROM ev
         |      WHERE event_type = 'click' GROUP BY 1, 2)
         |SELECT p.user_id, p.event_id, c.click_value AS asof_click_value
         |FROM p ASOF LEFT JOIN c
         |  ON p.user_id = c.user_id AND p.ts >= c.ts
         |ORDER BY p.user_id, p.event_id""".stripMargin,

    "q_rollup_read" ->
      s"""WITH $evCte
         |SELECT CAST(ts AS DATE) AS dt, event_type,
         |  count(*) AS n,
         |  ${sqlRound("sum(value)", 4)} AS sum_v,
         |  min(value) AS min_v, max(value) AS max_v,
         |  ${sqlRound("sum(value) / count(*)", 6)} AS avg_v
         |FROM ev GROUP BY 1, 2
         |ORDER BY 1, 2""".stripMargin,

    "q_asof_nearest" ->
      s"""WITH $evCte,
         |p AS (SELECT user_id, event_id, ts FROM ev WHERE event_type = 'purchase'),
         |c AS (SELECT user_id, ts, max(value) AS click_value FROM ev
         |      WHERE event_type = 'click' GROUP BY 1, 2),
         |b AS (SELECT p.user_id, p.event_id, p.ts, c.ts AS bts, c.click_value AS bval
         |      FROM p ASOF LEFT JOIN c
         |        ON p.user_id = c.user_id AND p.ts >= c.ts),
         |f AS (SELECT p.event_id, c.ts AS fts, c.click_value AS fval
         |      FROM p ASOF LEFT JOIN c
         |        ON p.user_id = c.user_id AND p.ts <= c.ts)
         |SELECT b.user_id, b.event_id,
         |  CASE WHEN f.fts IS NULL
         |         OR (b.bts IS NOT NULL AND (b.ts - b.bts) <= (f.fts - b.ts))
         |       THEN b.bval ELSE f.fval END AS asof_click_value
         |FROM b JOIN f ON b.event_id = f.event_id
         |ORDER BY b.user_id, b.event_id""".stripMargin,

    "q_asof_forward" ->
      s"""WITH $evCte,
         |p AS (SELECT user_id, event_id, ts FROM ev WHERE event_type = 'purchase'),
         |c AS (SELECT user_id, ts, max(value) AS click_value FROM ev
         |      WHERE event_type = 'click' GROUP BY 1, 2)
         |SELECT p.user_id, p.event_id, c.click_value AS asof_click_value
         |FROM p ASOF LEFT JOIN c
         |  ON p.user_id = c.user_id AND p.ts <= c.ts
         |ORDER BY p.user_id, p.event_id""".stripMargin,

    "q_ohlc_resample" ->
      s"""WITH $evCte,
         |b AS (
         |  SELECT event_type, time_bucket(INTERVAL 10 MINUTE, ts) AS bucket,
         |    ts, value, event_id
         |  FROM ev),
         |r AS (
         |  SELECT *,
         |    ROW_NUMBER() OVER (PARTITION BY event_type, bucket
         |      ORDER BY ts, event_id) AS rn_a,
         |    ROW_NUMBER() OVER (PARTITION BY event_type, bucket
         |      ORDER BY ts DESC, event_id DESC) AS rn_d
         |  FROM b)
         |SELECT event_type, bucket,
         |  max(CASE WHEN rn_a = 1 THEN value END) AS open,
         |  max(value) AS high, min(value) AS low,
         |  max(CASE WHEN rn_d = 1 THEN value END) AS close,
         |  count(*) AS n
         |FROM r GROUP BY 1, 2 ORDER BY bucket, event_type""".stripMargin,

    "q_funnel" ->
      s"""WITH $evCte,
         |v AS (SELECT user_id, min(ts) AS v1 FROM ev
         |      WHERE event_type = 'view' GROUP BY 1),
         |c AS (SELECT ev.user_id, min(ev.ts) AS c1 FROM ev JOIN v USING (user_id)
         |      WHERE ev.event_type = 'click' AND ev.ts > v.v1 GROUP BY 1),
         |p AS (SELECT ev.user_id, min(ev.ts) AS p1 FROM ev JOIN c USING (user_id)
         |      WHERE ev.event_type = 'purchase' AND ev.ts > c.c1 GROUP BY 1),
         |u AS (SELECT DISTINCT user_id FROM ev)
         |SELECT CAST(CASE WHEN p.p1 IS NOT NULL THEN 3
         |            WHEN c.c1 IS NOT NULL THEN 2
         |            WHEN v.v1 IS NOT NULL THEN 1 ELSE 0 END AS BIGINT) AS funnel_stage,
         |  count(*) AS n_users
         |FROM u LEFT JOIN v USING (user_id) LEFT JOIN c USING (user_id)
         |  LEFT JOIN p USING (user_id)
         |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_unpivot" ->
      """SELECT l_orderkey, l_linenumber, metric, val FROM (
        |  SELECT l_orderkey, l_linenumber, 'l_quantity' AS metric,
        |    l_quantity AS val FROM lineitem
        |  UNION ALL
        |  SELECT l_orderkey, l_linenumber, 'l_extendedprice', l_extendedprice
        |  FROM lineitem
        |  UNION ALL
        |  SELECT l_orderkey, l_linenumber, 'l_discount', l_discount
        |  FROM lineitem)
        |ORDER BY l_orderkey, l_linenumber, metric, val""".stripMargin,

    "q_distinct_skewsafe" ->
      s"""WITH $evCte
         |SELECT event_type, count(DISTINCT user_id) AS n_users
         |FROM ev GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_snapshot_diff" ->
      """WITH o AS (SELECT o_orderkey, o_custkey, o_totalprice FROM orders),
        |n AS (
        |  SELECT o_orderkey, o_custkey,
        |    CASE WHEN o_orderkey % 13 = 0 THEN o_totalprice + 1
        |         ELSE o_totalprice END AS o_totalprice
        |  FROM o WHERE o_orderkey % 100 <> 0
        |  UNION ALL
        |  SELECT o_orderkey + 100000000, o_custkey, o_totalprice
        |  FROM o WHERE o_orderkey % 97 = 0),
        |j AS (
        |  SELECT coalesce(o.o_orderkey, n.o_orderkey) AS o_orderkey,
        |    CASE WHEN o.o_orderkey IS NULL THEN 'added'
        |         WHEN n.o_orderkey IS NULL THEN 'removed'
        |         WHEN o.o_custkey IS DISTINCT FROM n.o_custkey
        |           OR o.o_totalprice IS DISTINCT FROM n.o_totalprice THEN 'changed'
        |         ELSE 'unchanged' END AS change_type
        |  FROM o FULL OUTER JOIN n ON o.o_orderkey = n.o_orderkey)
        |SELECT o_orderkey, change_type FROM j
        |WHERE change_type <> 'unchanged' ORDER BY o_orderkey, change_type""".stripMargin,

    "q_scd2" ->
      """WITH c AS (SELECT c_custkey AS k, c_mktsegment AS seg,
        |  CAST(c_nationkey AS BIGINT) AS nat FROM customer),
        |op AS (SELECT k, seg, nat, DATE '2020-01-01' AS valid_from,
        |  CAST(NULL AS DATE) AS valid_to, TRUE AS is_current FROM c),
        |hist AS (SELECT k, 'HISTORIC' AS seg, nat,
        |  DATE '2019-01-01' AS valid_from, DATE '2020-01-01' AS valid_to,
        |  FALSE AS is_current FROM c WHERE k % 10 = 0),
        |upd AS (
        |  SELECT k, CASE WHEN k % 6 = 0 THEN 'X-' || seg ELSE seg END AS seg,
        |    nat, DATE '2021-06-01' AS eff FROM c WHERE k % 3 = 0
        |  UNION ALL
        |  SELECT k + 1000000, 'NEW', nat, DATE '2021-06-01'
        |  FROM c WHERE k % 97 = 0),
        |j AS (SELECT coalesce(o.k, u.k) AS k, o.seg AS oseg, o.nat AS onat,
        |    o.valid_from AS ovf, u.seg AS useg, u.nat AS unat, u.eff,
        |    o.k IS NOT NULL AS has_open, u.k IS NOT NULL AS has_upd,
        |    (o.seg IS DISTINCT FROM u.seg)
        |      OR (o.nat IS DISTINCT FROM u.nat) AS changed
        |  FROM op o FULL OUTER JOIN upd u ON o.k = u.k)
        |SELECT * FROM hist
        |UNION ALL
        |SELECT k, oseg, onat, ovf, CAST(NULL AS DATE), TRUE FROM j
        |WHERE has_open AND (NOT has_upd OR NOT changed)
        |UNION ALL
        |SELECT k, oseg, onat, ovf, eff, FALSE FROM j
        |WHERE has_open AND has_upd AND changed
        |UNION ALL
        |SELECT k, useg, unat, eff, CAST(NULL AS DATE), TRUE FROM j
        |WHERE has_upd AND (NOT has_open OR changed)
        |ORDER BY k, valid_from, is_current""".stripMargin,

    "q_cohort_retention" ->
      s"""WITH $evCte,
         |wk AS (
         |  SELECT user_id, CAST(date_trunc('week', ts) AS DATE) AS wk FROM ev),
         |c AS (
         |  SELECT user_id, wk, min(wk) OVER (PARTITION BY user_id) AS cohort_wk
         |  FROM wk)
         |SELECT cohort_wk,
         |  CAST(date_diff('day', cohort_wk, wk) / 7 AS BIGINT) AS week_offset,
         |  count(DISTINCT user_id) AS n_users
         |FROM c GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q_join_salted" ->
      """SELECT c_mktsegment, count(*) AS n_orders,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    // Bloom prefilter is transparent (no false negatives; join drops
    // false positives) — the oracle is the plain selective join.
    "q_bloom_join" ->
      """SELECT l_orderkey AS k, l_quantity, o_totalprice
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE o_orderpriority = '1-URGENT' AND o_orderkey % 97 = 0
        |ORDER BY k, l_quantity""".stripMargin,

    "q_pagerank" -> pagerankOracleSql(
      """SELECT DISTINCT CAST(o_custkey AS BIGINT) AS src,
        |    CAST(l_suppkey AS BIGINT) + 1000000000 AS dst
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |  WHERE l_shipdate >= TIMESTAMP '1995-01-01'
        |    AND l_shipdate < TIMESTAMP '1996-01-01'""".stripMargin,
      iters = 5, scale = 1000000000L, damp = 85),

    "q_range_join" ->
      """WITH iv AS (
        |  SELECT o_orderkey,
        |    date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) AS iv_start,
        |    date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) + 7 AS iv_end
        |  FROM orders WHERE o_orderkey % 997 = 0),
        |p AS (
        |  SELECT date_diff('day', DATE '1970-01-01', CAST(l_shipdate AS DATE)) AS ship_day
        |  FROM lineitem)
        |SELECT iv.o_orderkey, count(*) AS n_shipped
        |FROM p JOIN iv ON p.ship_day >= iv.iv_start AND p.ship_day < iv.iv_end
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_interval_overlap" ->
      """WITH a AS (
        |  SELECT o_orderkey AS a_key,
        |    date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) AS a_lo,
        |    date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) + 14 AS a_hi
        |  FROM orders WHERE o_orderkey % 97 = 0),
        |b AS (
        |  SELECT o_orderkey AS b_key,
        |    date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) AS b_lo,
        |    date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) + 14 AS b_hi
        |  FROM orders WHERE o_orderkey % 89 = 0)
        |SELECT a_key, b_key FROM a JOIN b ON a_lo < b_hi AND b_lo < a_hi
        |ORDER BY 1, 2""".stripMargin,

    "q_intersect" ->
      """SELECT o_custkey FROM orders WHERE year(CAST(o_orderdate AS DATE)) = 1994
        |INTERSECT
        |SELECT o_custkey FROM orders WHERE year(CAST(o_orderdate AS DATE)) = 1995
        |ORDER BY o_custkey""".stripMargin,

    "q_except" ->
      """SELECT o_custkey FROM orders WHERE year(CAST(o_orderdate AS DATE)) = 1994
        |EXCEPT
        |SELECT o_custkey FROM orders WHERE year(CAST(o_orderdate AS DATE)) = 1995
        |ORDER BY o_custkey""".stripMargin,

    "q_scalar_funcs" ->
      """SELECT p_partkey,
        |  upper(p_brand) AS brand_u,
        |  lower(p_type) AS type_l,
        |  substring(p_name, 1, 8) AS name_pfx,
        |  CAST(length(p_name) AS BIGINT) AS name_len,
        |  concat_ws('|', p_brand, p_type) AS brand_type,
        |  regexp_extract(p_name, '([a-z]+)', 1) AS first_word,
        |  coalesce(nullif(p_type, 'ECONOMY'), 'OTHER') AS type_or_other,
        |  CASE WHEN p_size >= 25 THEN 'big'
        |       WHEN p_size >= 10 THEN 'mid'
        |       ELSE 'small' END AS size_class,
        |  p_retailprice * 2 AS price_x2
        |FROM part ORDER BY p_partkey""".stripMargin,

    "q_date_arith" ->
      """SELECT o_orderkey,
        |  CAST(o_orderdate AS DATE) AS d,
        |  CAST(CAST(o_orderdate AS DATE) + INTERVAL 30 DAY AS DATE) AS d_plus30,
        |  datediff('day', CAST(o_orderdate AS DATE), DATE '1998-12-31') AS days_to_end,
        |  CAST(year(o_orderdate) AS BIGINT) AS yr,
        |  CAST(month(o_orderdate) AS BIGINT) AS mo,
        |  CAST(day(o_orderdate) AS BIGINT) AS dom,
        |  CAST(date_trunc('month', o_orderdate) AS DATE) AS month_start
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    "q_range_frame" ->
      s"""WITH $evCte,
         |b AS (SELECT user_id, event_id, epoch_us(ts) AS ts_us,
         |             CAST(value AS DECIMAL(18,2)) AS dv
         |      FROM ev)
         |SELECT user_id, event_id,
         |  CAST(sum(dv) OVER w AS DOUBLE) AS hour_sum,
         |  CAST(count(*) OVER w AS BIGINT) AS hour_n
         |FROM b
         |WINDOW w AS (PARTITION BY user_id ORDER BY ts_us
         |             RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
         |ORDER BY user_id, event_id""".stripMargin,

    "q_lead_first_last" ->
      s"""WITH $evCte
         |SELECT event_type, event_id, value,
         |  lead(value, 1) OVER w AS next_value,
         |  first_value(value) OVER wf AS first_v,
         |  last_value(value) OVER wf AS last_v,
         |  nth_value(value, 2) OVER wf AS second_v
         |FROM ev
         |WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id),
         |       wf AS (PARTITION BY event_type ORDER BY ts, event_id
         |              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         |ORDER BY event_type, event_id""".stripMargin,

    "q_scalar_subquery" ->
      """SELECT o_orderkey, o_totalprice,
        |  (SELECT max(l_quantity) FROM lineitem
        |   WHERE l_orderkey = o_orderkey) AS max_qty
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    "q_full_analysis_sql" -> CoreQueries.oracle("q_full_analysis"),

    "q_gap_fill" ->
      s"""WITH $evCte,
         |daily AS (
         |  SELECT user_id, CAST(ts AS DATE) AS d,
         |    CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS v
         |  FROM ev GROUP BY 1, 2),
         |spans AS (
         |  SELECT user_id, min(d) AS lo, max(d) AS hi FROM daily GROUP BY 1),
         |dense AS (
         |  SELECT user_id,
         |    CAST(unnest(generate_series(CAST(lo AS TIMESTAMP),
         |      CAST(hi AS TIMESTAMP), INTERVAL 1 DAY)) AS DATE) AS d
         |  FROM spans)
         |SELECT dense.user_id, dense.d,
         |  last_value(daily.v IGNORE NULLS) OVER (
         |    PARTITION BY dense.user_id ORDER BY dense.d
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS v_filled,
         |  CAST(CASE WHEN daily.d IS NULL THEN 1 ELSE 0 END AS BIGINT) AS is_filled
         |FROM dense LEFT JOIN daily
         |  ON dense.user_id = daily.user_id AND dense.d = daily.d
         |ORDER BY dense.user_id, dense.d""".stripMargin,

    "q_cond_agg" ->
      s"""WITH $evCte
         |SELECT user_id,
         |  count(*) AS n_events,
         |  count(*) FILTER (WHERE event_type = 'purchase') AS n_purchase,
         |  CAST(sum(CAST(value AS DECIMAL(18,2)))
         |    FILTER (WHERE event_type = 'purchase') AS DOUBLE) AS purchase_value,
         |  max(ts) FILTER (WHERE event_type = 'click') AS last_click
         |FROM ev GROUP BY user_id ORDER BY user_id""".stripMargin,

    "q_rsi" ->
      s"""WITH $evCte,
         |p AS (
         |  SELECT event_type, event_id, ts, value,
         |    lag(value, 1) OVER (PARTITION BY event_type
         |                        ORDER BY ts, event_id) AS prev
         |  FROM ev),
         |g AS (
         |  SELECT event_type, event_id, ts,
         |    CASE WHEN value IS NULL OR prev IS NULL THEN NULL
         |         WHEN value > prev THEN value - prev ELSE 0.0 END AS gain,
         |    CASE WHEN value IS NULL OR prev IS NULL THEN NULL
         |         WHEN value < prev THEN prev - value ELSE 0.0 END AS loss
         |  FROM p),
         |a AS (
         |  SELECT event_type, event_id,
         |    avg(gain) OVER w AS avg_gain, avg(loss) OVER w AS avg_loss
         |  FROM g
         |  WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id
         |               ROWS BETWEEN 13 PRECEDING AND CURRENT ROW))
         |SELECT event_type, event_id,
         |  ${sqlRound(
             "CASE WHEN avg_loss = 0.0 THEN 100.0 " +
             "ELSE 100.0 - 100.0 / (1.0 + avg_gain / avg_loss) END", 4)} AS rsi
         |FROM a ORDER BY event_type, event_id""".stripMargin,

    "q_drawdown" ->
      s"""WITH $evCte,
         |p AS (
         |  SELECT event_type, event_id, value,
         |    max(value) OVER (PARTITION BY event_type ORDER BY ts, event_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS peak
         |  FROM ev)
         |SELECT event_type, event_id, value, peak,
         |  ${sqlRound("(value - peak) / NULLIF(abs(peak), 0.0)", 6)} AS drawdown
         |FROM p ORDER BY event_type, event_id""".stripMargin,

    "q_vwap" ->
      s"""WITH g AS (
         |  SELECT l_returnflag,
         |    CAST(date_trunc('month', l_shipdate) AS DATE) AS ship_month,
         |    CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
         |             CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS pq,
         |    CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty
         |  FROM lineitem GROUP BY 1, 2)
         |SELECT l_returnflag, ship_month,
         |  ${sqlRound("pq / total_qty", 4)} AS vwap, total_qty
         |FROM g ORDER BY l_returnflag, ship_month""".stripMargin,

    "q_argminmax" ->
      """SELECT event_type,
        |  arg_min(value, event_id) AS first_value,
        |  arg_max(value, event_id) AS last_value,
        |  min(value) AS min_value,
        |  max(value) AS max_value
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q_histogram" ->
      """SELECT CAST(floor(l_extendedprice / 5000.0) AS BIGINT) AS bucket,
        |  CAST(CAST(floor(l_extendedprice / 5000.0) AS BIGINT) * 5000
        |    AS DOUBLE) AS bucket_lo,
        |  count(*) AS n
        |FROM lineitem GROUP BY 1, 2 ORDER BY bucket""".stripMargin,

    "q_na_fill" ->
      """SELECT l_orderkey, l_linenumber,
        |  COALESCE(NULLIF(l_discount, 0.0), 0.05) AS disc_filled,
        |  NULLIF(l_tax, 0.0) AS tax_kept
        |FROM lineitem
        |WHERE NULLIF(l_tax, 0.0) IS NOT NULL
        |ORDER BY l_orderkey, l_linenumber, disc_filled, tax_kept""".stripMargin,

    "q_bollinger" ->
      s"""WITH $evCte,
         |b AS (
         |  SELECT event_type, event_id, value,
         |    avg(value) OVER w AS mavg, stddev_samp(value) OVER w AS sd
         |  FROM ev
         |  WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id
         |               ROWS BETWEEN 19 PRECEDING AND CURRENT ROW))
         |SELECT event_type, event_id,
         |  ${sqlRound("mavg", 4)} AS mavg,
         |  ${sqlRound("mavg - 2.0 * sd", 4)} AS band_lo,
         |  ${sqlRound("mavg + 2.0 * sd", 4)} AS band_hi,
         |  CAST(CASE WHEN sd IS NULL THEN NULL
         |       WHEN value > ${sqlRound("mavg + 2.0 * sd", 4)} THEN 1
         |       WHEN value < ${sqlRound("mavg - 2.0 * sd", 4)} THEN -1
         |       ELSE 0 END AS BIGINT) AS breach
         |FROM b ORDER BY event_type, event_id""".stripMargin,

    "q_zscore" ->
      s"""WITH $evCte,
         |g AS (
         |  SELECT event_type, event_id, value,
         |    avg(value) OVER w AS mu, stddev_samp(value) OVER w AS sd
         |  FROM ev
         |  WINDOW w AS (PARTITION BY event_type))
         |SELECT event_type, event_id,
         |  ${sqlRound("(value - mu) / NULLIF(sd, 0.0)", 4)} AS zscore
         |FROM g ORDER BY event_type, event_id""".stripMargin,

    "q_rolling_corr" ->
      s"""WITH $evCte,
         |daily AS (
         |  SELECT CAST(ts AS DATE) AS d, event_type,
         |    CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS v
         |  FROM ev WHERE event_type IN ('click', 'purchase')
         |  GROUP BY 1, 2),
         |wide AS (
         |  SELECT d,
         |    max(CASE WHEN event_type = 'click' THEN v END) AS click,
         |    max(CASE WHEN event_type = 'purchase' THEN v END) AS purchase
         |  FROM daily GROUP BY d)
         |SELECT d, click, purchase,
         |  ${sqlRound(
             "corr(click, purchase) OVER (ORDER BY d " +
             "ROWS BETWEEN 29 PRECEDING AND CURRENT ROW)", 4)} AS corr_cp
         |FROM wide ORDER BY d""".stripMargin,

    "q_schema_reflect" ->
      """SELECT column_name, CAST(ordinal_position AS BIGINT) AS pos
        |FROM information_schema.columns WHERE table_name = 'lineitem'
        |ORDER BY pos""".stripMargin
  )
}
