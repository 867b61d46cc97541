package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** SURVEY §2 relational core, expressed over the driver's TPC-H-ish
  * testdata with DuckDB oracles.
  *
  * Determinism rules (QueryPack scaladoc): total ORDER BY on a unique
  * key; double sums routed through DECIMAL(18,2) then cast back to
  * double so partial-agg order can't change low bits; aliases match
  * the oracle exactly.
  */
object RelationalPack extends QueryPack {

  /** Decimal-routed deterministic sum of a double column. */
  private def dsum(c: String): org.apache.spark.sql.Column =
    sum(col(c).cast("decimal(18,2)")).cast("double")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // A2/O1/D4: the reference's flagship summary query
    // (tests/test_ExtractCCLinks.py:236): counts + distinct counts per
    // group, top-k by total. Hash aggregate + TakeOrderedAndProject.
    // Two-level distinct aggregates via the SHARED
    // graft.Aggregates.withDistinctCounts (one definition for this
    // query, WatExtract.topDomains, the spec, and the bench arm —
    // the shape cannot drift between its copies): the single-agg
    // double countDistinct plans an Expand x3 that is measured DEAD
    // at 600M rows on an 8 GB heap; full matrix + null semantics in
    // the helper's scaladoc and PERF.md item 10.
    "q_a2_top_domains" -> ((s, d) =>
      graft.Aggregates.withDistinctCounts(Tables.lineitem(s, d),
          "l_suppkey", "total",
          Seq("l_partkey" -> "parts", "l_orderkey" -> "orders_d"))
        .orderBy(desc("total"), asc("l_suppkey"))
        .limit(100)),

    // A10-style global aggregation with decimal-routed money sums.
    "q_q1_pricing" -> ((s, d) => {
      Tables.lineitem(s, d)
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(dsum("l_quantity").as("sum_qty"),
          dsum("l_extendedprice").as("sum_base_price"),
          // exact integer-cents math: price and discount are 2-decimal
          // values, so price*(1-disc) sits ON .005 rounding boundaries
          // where engines' double->decimal rounding modes disagree;
          // cents*(100-disc_cents) is exact in int64 in any engine.
          (sum(round(col("l_extendedprice") * 100).cast("long") *
            (lit(100L) - round(col("l_discount") * 100).cast("long")))
            .cast("double") / 10000.0).as("sum_disc_price"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    }),

    // Skew.saltedAgg under the oracle: the two-phase (key, salt) ->
    // key aggregation must produce EXACTLY the plain GROUP BY totals.
    // Sum routed through integer cents so partial re-aggregation
    // order can't move a double ulp.
    "q_salted_rollup" -> ((s, d) => {
      graft.maintain.Skew.saltedAgg(
        Tables.lineitem(s, d).select(col("l_returnflag"), col("l_quantity")),
        "l_returnflag", saltBuckets = 8,
        partialAggs = Seq(
          count(lit(1)).as("c"),
          sum(round(col("l_quantity") * 100).cast("long")).as("qc")),
        finalAggs = Seq(
          sum(col("c")).as("n_items"),
          (sum(col("qc")).cast("double") / 100.0).as("sum_qty")))
        .orderBy(col("l_returnflag"))
    }),

    // Sketches.frequentItems under the oracle via its exactness
    // regime: with key cardinality <= k the Misra-Gries buffer never
    // overflows, no counts are ever subtracted, and the summary IS the
    // exact GROUP BY — checkable bit-for-bit. (The approximate regime's
    // guarantee is SketchesSpec's job; this row pins the whole
    // Aggregator/udaf machinery against DuckDB.)
    "q_freq_items_exact" -> ((s, d) => {
      graft.maintain.Sketches.frequentItems(
        Tables.events(s, d), "event_type", k = 64)
    }),

    // W1/D3: row_number dedupe — newest order per customer
    // (mirror of util/loader/sql.py:171-182's last-wins dedupe).
    "q_w1_newest_order" -> ((s, d) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate").desc, col("o_orderkey").desc)
      Tables.orders(s, d)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("o_custkey"), col("o_orderkey").as("newest_orderkey"),
          col("o_orderdate").as("newest_orderdate"))
        .orderBy(col("o_custkey"))
    }),

    // A5/W2: exact discrete percentile per group
    // (util/popularity/sql.py:146-167).
    "q_a5_percentile" -> ((s, d) => {
      Tables.events(s, d)
        .select(col("event_type"), col("value").as("__m"))
        .groupBy(col("event_type"))
        .agg(expr("percentile_disc(0.85) WITHIN GROUP (ORDER BY __m)").as("p85"))
        .orderBy(col("event_type"))
    }),

    // A6: newest-non-null collapse per key (migration replay,
    // openledger_sql/02_migrate_to_new_image.sql) — 'error' events
    // stand in for null-valued rows.
    "q_a6_last_non_null" -> ((s, d) => {
      val ev = Tables.events(s, d)
      val users = ev.select(col("user_id")).distinct()
      val nn = ev.filter(col("event_type") =!= "error")
        .groupBy(col("user_id"))
        .agg(max_by(col("value"), col("ts")).as("latest_value"))
      users.join(nn, Seq("user_id"), "left_outer").orderBy(col("user_id"))
    }),

    // J3/J8/A3: two broadcast equi-joins up a dim hierarchy + rollup.
    "q_j3_region_rollup" -> ((s, d) => {
      Tables.customer(s, d)
        .join(broadcast(Tables.nation(s, d)),
          col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(Tables.region(s, d)),
          col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("r_name"))
        .agg(count(lit(1)).as("members"), dsum("c_acctbal").as("acctbal_sum"))
        .orderBy(col("r_name"))
    }),

    // J4: containment theta join (jsonb `?` analog,
    // util/loader/sql.py:513-527) — BroadcastNestedLoopJoin on an
    // array_contains predicate against a tiny dim.
    "q_j4_containment" -> ((s, d) => {
      import s.implicits._
      val dim = Seq("blue", "green", "hot", "red", "small").toDF("w")
      Tables.part(s, d)
        .join(broadcast(dim),
          array_contains(split(col("p_name"), " "), col("w")))
        .groupBy(col("w"))
        .agg(count(lit(1)).as("parts_n"), dsum("p_retailprice").as("retail_sum"))
        .orderBy(col("w"))
    }),

    // U2: set difference, both directions
    // (util/loader/smithsonian_unit_codes.py:57-76).
    "q_u2_set_diff" -> ((s, d) => {
      val ordered = Tables.orders(s, d)
        .select(col("o_custkey").as("custkey")).distinct()
      val building = Tables.customer(s, d)
        .filter(col("c_mktsegment") === "BUILDING")
        .select(col("c_custkey").as("custkey"))
      ordered.except(building).withColumn("dir", lit("ordered_not_building"))
        .union(building.except(ordered).withColumn("dir", lit("building_not_ordered")))
        .orderBy(col("dir"), col("custkey"))
    }),

    // U3: bag UNION ALL then aggregate (TSV append semantics,
    // Provider.py:317).
    "q_u3_union_all" -> ((s, d) => {
      val o = Tables.orders(s, d)
      o.filter(col("o_orderstatus") === "F")
        .unionAll(o.filter(col("o_totalprice") > 100000.0))
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n"), dsum("o_totalprice").as("total_price"))
        .orderBy(col("o_orderstatus"))
    }),

    // P10: per-provider staleness expiration (util/loader/
    // sql.py:636-645) with a fixed "now" for determinism.
    "q_p10_expiration" -> ((s, d) => {
      implicit val sp: SparkSession = s
      val now = lit("2024-04-01 00:00:00").cast("timestamp")
      graft.maintain.Maintenance.expired(
        Tables.events(s, d), "event_type", "ts",
        Map("click" -> 30, "view" -> 45, "error" -> 10,
          "purchase" -> 60, "signup" -> 90), now)
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("expired_n"), max(col("ts")).as("newest_expired"))
        .orderBy(col("event_type"))
    }),

    // D5/D6/U1: tag-set dedupe + sort + cap 20
    // (Provider.py:107-116, flickr.py:367-381).
    "q_d5_tag_norm" -> ((s, d) => {
      Tables.documents(s, d)
        .select(col("doc_id"),
          concat_ws(",",
            slice(array_sort(array_distinct(split(col("text"), " "))), 1, 20))
            .as("tags"))
        .orderBy(col("doc_id"))
    }),

    // O2: global sort desc + take(3) (tests/test_deeds.py:125-128).
    "q_o2_top3" -> ((s, d) => {
      Tables.supplier(s, d)
        .select(col("s_suppkey"), col("s_name"), col("s_acctbal"))
        .orderBy(desc("s_acctbal"), asc("s_suppkey"))
        .limit(3)
    }),

    // P11 + md5: hex-prefix range slice of a table
    // (util/pg_cleaner.py:172-194).
    "q_p11_md5_slice" -> ((s, d) => {
      Tables.documents(s, d)
        .withColumn("h", md5(col("text")))
        .filter(col("h") >= "0" && col("h") < "40")
        .select(col("doc_id"), col("h"))
        .orderBy(col("doc_id"))
    }),

    // O4: oldest-first pick via min_by (util/loader/paths.py:74-100).
    "q_o4_oldest_order" -> ((s, d) => {
      Tables.orders(s, d)
        .groupBy(col("o_custkey"))
        .agg(min_by(col("o_orderkey"),
          struct(col("o_orderdate"), col("o_orderkey"))).as("oldest_orderkey"),
          min(col("o_orderdate")).as("oldest_date"))
        .orderBy(col("o_custkey"))
    }),

    // D1: plain distinct projection (Provider.py:264's URL dedupe).
    "q_d1_distinct" -> ((s, d) => {
      Tables.lineitem(s, d)
        .select(col("l_returnflag"), col("l_linestatus")).distinct()
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    }),

    // O5: creator-type preference order (smithsonian.py:42-101) —
    // lowest-rank creator wins among synthesized candidates.
    "q_o5_creator_pref" -> ((s, d) => {
      val ctype1 = element_at(
        array(lit("artist"), lit("publisher"), lit("unknown")),
        (col("doc_id") % 3 + 1).cast("int"))
      val ctype2 = element_at(array(lit("maker"), lit("collector")),
        (col("doc_id") % 2 + 1).cast("int"))
      val cands = array(
        struct(ctype1.as("ctype"), lit("n1").as("name")),
        struct(ctype2.as("ctype"), lit("n2").as("name")))
      Tables.documents(s, d)
        .select(col("doc_id"),
          graft.crawl.Extractors.preferredCreator(cands).as("creator"))
        .orderBy(col("doc_id"))
    }),

    // A9 + §2.9 json `->>`: per-user page-merge-style collect —
    // distinct event types (sorted canonical) and the sum of the
    // JSON-extracted props.k metric (wikimedia_commons.py:214-222's
    // globalusage accumulation + popularity's ->> reads).
    "q_a9_json_collect" -> ((s, d) => {
      Tables.events(s, d)
        .select(col("user_id"), col("event_type"),
          get_json_object(col("props"), "$.k").cast("long").as("k"))
        .groupBy(col("user_id"))
        .agg(concat_ws(",", array_sort(collect_set(col("event_type"))))
          .as("types"),
          sum(col("k")).as("k_sum"),
          count(lit(1)).as("n_events"))
        .orderBy(col("user_id"))
    }),

    // Gap sessionization: one row per (user, >30-min-gap session)
    // with bounds and counts — one shuffle on user_id, the running
    // session counter shares the window Exchange.
    "q_sessionize" -> ((s, d) => {
      graft.streaming.EventStream.sessionize(Tables.events(s, d), 30)
        .select(col("user_id"), col("session_seq"), col("n_events"),
          unix_timestamp(col("t_start")).as("start_epoch"),
          unix_timestamp(col("t_end")).as("end_epoch"))
        .orderBy(col("user_id"), col("session_seq"))
    }),

    // The analytic window family in one windowed pass (one Exchange,
    // one Sort, all five functions over the same frame): lag/lead
    // neighbors, quartile ntile, percent_rank. Ordering key includes
    // o_orderkey so every function is total-order deterministic;
    // percent_rank's double is IEEE-identical across engines (same
    // (rank-1)/(n-1) operands).
    "q_window_funcs" -> ((s, d) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
      Tables.orders(s, d)
        .select(col("o_custkey"), col("o_orderkey"),
          row_number().over(w).as("rn"),
          lag(col("o_totalprice"), 1).over(w).as("prev_price"),
          lead(col("o_totalprice"), 1).over(w).as("next_price"),
          ntile(4).over(w).as("quartile"),
          percent_rank().over(w).as("pr"))
        .orderBy(col("o_custkey"), col("rn"))
    }),

    // Multi-level aggregate (ROLLUP): per-(flag,status) totals, per-
    // flag subtotals, and the grand total in ONE pass — Spark plans a
    // single Expand + hash aggregate, not three scans. Explicit
    // grouping() math (not grouping_id()) so the oracle computes the
    // identical gid; subtotal rows order by gid + coalesced keys
    // because engines disagree on default NULL sort order.
    "q_rollup" -> ((s, d) => {
      Tables.lineitem(s, d)
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg((grouping(col("l_returnflag")) * 2 +
            grouping(col("l_linestatus"))).cast("int").as("gid"),
          count(lit(1)).as("n"),
          dsum("l_quantity").as("sum_qty"))
        .orderBy(col("gid"), coalesce(col("l_returnflag"), lit("")),
          coalesce(col("l_linestatus"), lit("")))
    }),

    // Pivot: one row per returnflag, one column pair per linestatus —
    // compiles to conditional aggregation (no shuffle beyond the
    // groupBy), which is exactly what the oracle spells out.
    "q_pivot" -> ((s, d) => {
      Tables.lineitem(s, d)
        .groupBy(col("l_returnflag"))
        .pivot("l_linestatus", Seq("F", "O"))
        .agg(count(lit(1)).as("n"), dsum("l_quantity").as("qty"))
        .orderBy(col("l_returnflag"))
    }),

    // Backward as-of join: every purchase matched to the user's most
    // recent prior view (<= 7 days back) — the temporal-lookup join,
    // implemented as ONE equi shuffle + window (graft.joins.Temporal),
    // never a range theta join. All math in exact epoch µs. The
    // oracle recomputes it from the direct "max view ts at or before
    // purchase ts" semantics — a deliberately different formulation,
    // so a bug in the window trick cannot hide in a shared shape.
    "q_asof_join" -> ((s, d) => {
      val ev = Tables.events(s, d)
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"),
          unix_micros(col("ts")).as("purchase_us"))
      // unique per (user, µs): ties broken by max event_id — the
      // asOfJoin contract requires one right row per instant
      val views = ev.filter(col("event_type") === "view")
        .groupBy(col("user_id"), unix_micros(col("ts")).as("t_us"))
        .agg(max_by(col("value"), col("event_id")).as("view_value"))
      graft.joins.Temporal.asOfJoin(purchases, views, "user_id",
          "purchase_us", "t_us", Seq("view_value"),
          tolerance = Some(604800000000L))
        .withColumnRenamed("asof_ts", "view_us")
        .orderBy(col("event_id"))
    }),

    // Interval (range) join: clicks inside the half-hour window
    // before each purchase — bucketed equi join on (user, ts div 30
    // min), residual interval filter; no nested-loop stage in the
    // plan (TemporalSpec asserts). Click sums integer-cents routed.
    "q_range_join" -> ((s, d) => {
      val ev = Tables.events(s, d)
      val iv = ev.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"),
          (unix_micros(col("ts")) - 1800000000L).as("lo"),
          unix_micros(col("ts")).as("hi"))
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id"), unix_micros(col("ts")).as("t_us"),
          col("value"))
      val counts = graft.joins.Temporal
        .rangeJoinBucketed(iv, clicks, "user_id", "lo", "hi", "t_us",
          bucketWidth = 1800000000L)
        .groupBy(col("event_id"))
        .agg(count(lit(1)).as("n_clicks"),
          (sum(round(col("value") * 100).cast("long")).cast("double")
            / 100.0).as("click_val_sum"))
      iv.select(col("event_id"), col("user_id"))
        .join(counts, Seq("event_id"), "left")
        .select(col("event_id"), col("user_id"),
          coalesce(col("n_clicks"), lit(0L)).as("n_clicks"),
          col("click_val_sum"))
        .orderBy(col("event_id"))
    }),

    // Date/time: 30-minute tumbling windows (flickr.py:95-122's
    // half-hour windowing) as epoch buckets.
    "q_windows_30min" -> ((s, d) => {
      Tables.events(s, d)
        .groupBy((floor(unix_timestamp(col("ts")) / 1800) * 1800)
          .cast("long").as("wstart"))
        .agg(count(lit(1)).as("n"), dsum("value").as("val_sum"))
        .orderBy(col("wstart"))
    }),

    // Z-order write key (io/Layout.zorderKey): Morton interleave of
    // (user bucket, minute-of-day) — pure column bit math, recomputed
    // bit-for-bit by the DuckDB oracle's explicit shift/mask sum.
    "q_zorder_key" -> ((s, d) => {
      val x = pmod(col("user_id"), lit(2048)).cast("int")
      val y = expr("(cast(ts as long) div 60) % 1440").cast("int")
      Tables.events(s, d)
        .select(col("event_id"),
          graft.io.Layout.zorderKey(x, y, bits = 11).as("z"))
        .orderBy(col("event_id"))
    }),

    // N-dimensional Morton key (io/Layout.zorderKey Seq form): three
    // selective dimensions round-robin interleaved — same bit-exact
    // oracle discipline as q_zorder_key, stride 3.
    "q_zorder3_key" -> ((s, d) => {
      val x = pmod(col("user_id"), lit(2048)).cast("int")
      val y = expr("(cast(ts as long) div 60) % 1440").cast("int")
      val w = pmod(col("event_id"), lit(2048)).cast("int")
      Tables.events(s, d)
        .select(col("event_id"),
          graft.io.Layout.zorderKey(Seq(x, y, w), bits = 11).as("z"))
        .orderBy(col("event_id"))
    }),
  )

  /** ((x>>i)&1)<<(stride*i+off) interleave terms, generated rather
    * than hand-typed — the oracle must mirror Layout.zorderKey
    * exactly (stride = number of interleaved dimensions). */
  private def zorderSql(
      expr: String, off: Int, bits: Int, stride: Int = 2): String =
    (0 until bits)
      // every term FULLY parenthesized: DuckDB gives |, &, << the same
      // flat left-associative precedence (PostgreSQL rules), so an
      // unwrapped `a << k | b << m` parses as ((a << k) | b) << m
      .map(i => s"(((($expr) >> $i) & 1) << ${stride * i + off})")
      .mkString(" | ")

  val oracles: Map[String, String] = Map(
    "q_a2_top_domains" ->
      """SELECT l_suppkey, count(*) AS total, count(DISTINCT l_partkey) AS parts,
        |  count(DISTINCT l_orderkey) AS orders_d
        |FROM lineitem GROUP BY l_suppkey
        |ORDER BY total DESC, l_suppkey LIMIT 100""".stripMargin,
    "q_salted_rollup" ->
      """SELECT l_returnflag, count(*) AS n_items,
        |  CAST(SUM(CAST(round(l_quantity * 100) AS BIGINT)) AS DOUBLE)
        |    / 100.0 AS sum_qty
        |FROM lineitem GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin,
    "q_q1_pricing" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        |  CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT) *
        |    (100 - CAST(round(l_discount * 100) AS BIGINT))) AS DOUBLE) / 10000.0 AS sum_disc_price,
        |  count(*) AS count_order
        |FROM lineitem GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q_w1_newest_order" ->
      """SELECT o_custkey, o_orderkey AS newest_orderkey, o_orderdate AS newest_orderdate
        |FROM (SELECT *, row_number() OVER (PARTITION BY o_custkey
        |        ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn FROM orders)
        |WHERE rn = 1 ORDER BY o_custkey""".stripMargin,
    "q_a5_percentile" ->
      """SELECT event_type, quantile_disc(value, 0.85) AS p85
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q_a6_last_non_null" ->
      """SELECT u.user_id, nn.latest_value
        |FROM (SELECT DISTINCT user_id FROM events) u
        |LEFT JOIN (SELECT user_id, arg_max(value, ts) AS latest_value
        |           FROM events WHERE event_type <> 'error' GROUP BY user_id) nn
        |USING (user_id) ORDER BY u.user_id""".stripMargin,
    "q_j3_region_rollup" ->
      """SELECT r_name, count(*) AS members,
        |  CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS acctbal_sum
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name ORDER BY r_name""".stripMargin,
    "q_j4_containment" ->
      """SELECT w, count(*) AS parts_n,
        |  CAST(SUM(CAST(p_retailprice AS DECIMAL(18,2))) AS DOUBLE) AS retail_sum
        |FROM part, (SELECT unnest(['blue','green','hot','red','small']) AS w) dim
        |WHERE list_contains(string_split(p_name, ' '), w)
        |GROUP BY w ORDER BY w""".stripMargin,
    "q_u2_set_diff" ->
      """SELECT custkey, 'ordered_not_building' AS dir FROM
        |  (SELECT DISTINCT o_custkey AS custkey FROM orders
        |   EXCEPT SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')
        |UNION ALL
        |SELECT custkey, 'building_not_ordered' AS dir FROM
        |  (SELECT c_custkey AS custkey FROM customer WHERE c_mktsegment = 'BUILDING'
        |   EXCEPT SELECT o_custkey FROM orders)
        |ORDER BY dir, custkey""".stripMargin,
    "q_u3_union_all" ->
      """WITH u AS (
        |  SELECT * FROM orders WHERE o_orderstatus = 'F'
        |  UNION ALL
        |  SELECT * FROM orders WHERE o_totalprice > 100000.0)
        |SELECT o_orderstatus, count(*) AS n,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
        |FROM u GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    "q_p10_expiration" ->
      """SELECT event_type, count(*) AS expired_n, max(ts) AS newest_expired
        |FROM events e JOIN (VALUES ('click',30),('view',45),('error',10),
        |  ('purchase',60),('signup',90)) d(et, days) ON e.event_type = d.et
        |WHERE e.ts < TIMESTAMP '2024-04-01 00:00:00' - to_days(days)
        |GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q_d5_tag_norm" ->
      """SELECT doc_id, array_to_string(
        |  list_sort(list_distinct(string_split(text, ' ')))[1:20], ',') AS tags
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q_o2_top3" ->
      """SELECT s_suppkey, s_name, s_acctbal FROM supplier
        |ORDER BY s_acctbal DESC, s_suppkey LIMIT 3""".stripMargin,
    "q_p11_md5_slice" ->
      """SELECT doc_id, md5(text) AS h FROM documents
        |WHERE md5(text) >= '0' AND md5(text) < '40' ORDER BY doc_id""".stripMargin,
    "q_o4_oldest_order" ->
      """SELECT o_custkey, o_orderkey AS oldest_orderkey, oldest_date FROM (
        |  SELECT o_custkey, o_orderkey,
        |    min(o_orderdate) OVER (PARTITION BY o_custkey) AS oldest_date,
        |    row_number() OVER (PARTITION BY o_custkey
        |      ORDER BY o_orderdate, o_orderkey) AS rn
        |  FROM orders)
        |WHERE rn = 1 ORDER BY o_custkey""".stripMargin,
    "q_d1_distinct" ->
      """SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q_o5_creator_pref" ->
      """SELECT doc_id,
        |  CASE WHEN doc_id % 3 = 0 THEN 'n1'
        |       WHEN doc_id % 3 = 1 AND doc_id % 2 = 0 THEN 'n2'
        |       WHEN doc_id % 3 = 1 THEN 'n1'
        |       ELSE 'n2' END AS creator
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q_a9_json_collect" ->
      """SELECT user_id,
        |  array_to_string(list_sort(list_distinct(list(event_type))), ',') AS types,
        |  CAST(SUM(TRY_CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS k_sum,
        |  count(*) AS n_events
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,
    "q_sessionize" ->
      """WITH marked AS (
        |  SELECT user_id, ts,
        |    CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
        |      OR floor(epoch(ts)) - floor(epoch(lag(ts)
        |        OVER (PARTITION BY user_id ORDER BY ts))) > 1800
        |      THEN 1 ELSE 0 END AS new_s
        |  FROM events),
        |sessions AS (
        |  SELECT user_id, ts,
        |    SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_seq
        |  FROM marked)
        |SELECT user_id, CAST(session_seq AS BIGINT) AS session_seq,
        |  count(*) AS n_events,
        |  CAST(floor(epoch(min(ts))) AS BIGINT) AS start_epoch,
        |  CAST(floor(epoch(max(ts))) AS BIGINT) AS end_epoch
        |FROM sessions GROUP BY user_id, session_seq
        |ORDER BY user_id, session_seq""".stripMargin,
    "q_window_funcs" ->
      """SELECT o_custkey, o_orderkey,
        |  row_number() OVER w AS rn,
        |  lag(o_totalprice, 1) OVER w AS prev_price,
        |  lead(o_totalprice, 1) OVER w AS next_price,
        |  ntile(4) OVER w AS quartile,
        |  percent_rank() OVER w AS pr
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        |ORDER BY o_custkey, rn""".stripMargin,
    "q_rollup" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(GROUPING(l_returnflag) * 2 + GROUPING(l_linestatus) AS INTEGER) AS gid,
        |  count(*) AS n,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
        |ORDER BY gid, coalesce(l_returnflag, ''), coalesce(l_linestatus, '')"""
        .stripMargin,
    // quoted aliases: DuckDB lowercases unquoted identifiers, and the
    // driver compare matches columns BY NAME against Spark's
    // {pivotValue}_{aggAlias} casing
    "q_pivot" ->
      """SELECT l_returnflag,
        |  count(*) FILTER (WHERE l_linestatus = 'F') AS "F_n",
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2)))
        |    FILTER (WHERE l_linestatus = 'F') AS DOUBLE) AS "F_qty",
        |  count(*) FILTER (WHERE l_linestatus = 'O') AS "O_n",
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2)))
        |    FILTER (WHERE l_linestatus = 'O') AS DOUBLE) AS "O_qty"
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""
        .stripMargin,
    // Deliberately a DIFFERENT formulation than the Spark side (direct
    // max-ts-at-or-before semantics vs union+window): a shared-shape
    // bug can't pass both.
    "q_asof_join" ->
      """WITH p AS (SELECT event_id, user_id, epoch_us(ts) AS purchase_us
        |           FROM events WHERE event_type = 'purchase'),
        |v AS (SELECT user_id, epoch_us(ts) AS t_us,
        |        arg_max(value, event_id) AS view_value
        |      FROM events WHERE event_type = 'view'
        |      GROUP BY user_id, epoch_us(ts)),
        |m AS (SELECT p.event_id, max(v.t_us) AS view_us
        |      FROM p JOIN v ON p.user_id = v.user_id
        |        AND v.t_us <= p.purchase_us
        |        AND v.t_us >= p.purchase_us - 604800000000
        |      GROUP BY p.event_id)
        |SELECT p.event_id, p.user_id, p.purchase_us, m.view_us, v.view_value
        |FROM p LEFT JOIN m USING (event_id)
        |LEFT JOIN v ON v.user_id = p.user_id AND v.t_us = m.view_us
        |ORDER BY p.event_id""".stripMargin,
    "q_range_join" ->
      """WITH p AS (SELECT event_id, user_id, epoch_us(ts) AS hi,
        |             epoch_us(ts) - 1800000000 AS lo
        |           FROM events WHERE event_type = 'purchase'),
        |c AS (SELECT user_id, epoch_us(ts) AS t_us, value
        |      FROM events WHERE event_type = 'click')
        |SELECT p.event_id, p.user_id, count(c.t_us) AS n_clicks,
        |  CAST(SUM(CAST(round(c.value * 100) AS BIGINT)) AS DOUBLE)
        |    / 100.0 AS click_val_sum
        |FROM p LEFT JOIN c ON p.user_id = c.user_id
        |  AND c.t_us > p.lo AND c.t_us <= p.hi
        |GROUP BY p.event_id, p.user_id ORDER BY p.event_id""".stripMargin,
    "q_windows_30min" ->
      """SELECT CAST(floor(epoch(ts) / 1800) * 1800 AS BIGINT) AS wstart,
        |  count(*) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS val_sum
        |FROM events GROUP BY 1 ORDER BY wstart""".stripMargin,
    "q_freq_items_exact" ->
      // WHERE event_type IS NOT NULL on BOTH the groups and the total:
      // the engine filters null keys before aggregating (a null can't
      // be a Catalyst map key), so the oracle must exclude DuckDB's
      // NULL group and count only non-null rows in err_bound too —
      // identical on the current testdata (no null event_type), but
      // the oracle should not depend on that.
      """SELECT event_type AS item, count(*) AS min_count,
        |  CAST((SELECT count(*) FROM events
        |        WHERE event_type IS NOT NULL) AS DOUBLE) / 65 AS err_bound
        |FROM events WHERE event_type IS NOT NULL
        |GROUP BY 1 ORDER BY min_count DESC, item""".stripMargin,
    "q_zorder_key" -> {
      // ((m % n) + n) % n, not plain %: DuckDB's % is sign-preserving
      // while the Spark side uses pmod — identical for the testdata's
      // non-negative ids, but the oracle should not depend on that.
      val x = "CAST(((user_id % 2048) + 2048) % 2048 AS BIGINT)"
      val y = "CAST((epoch_us(ts) // 60000000) % 1440 AS BIGINT)"
      s"""SELECT event_id,
         |  CAST(${zorderSql(x, 0, 11)} | ${zorderSql(y, 1, 11)} AS BIGINT) AS z
         |FROM events ORDER BY event_id""".stripMargin
    },
    "q_zorder3_key" -> {
      val x = "CAST(((user_id % 2048) + 2048) % 2048 AS BIGINT)"
      val y = "CAST((epoch_us(ts) // 60000000) % 1440 AS BIGINT)"
      val w = "CAST(((event_id % 2048) + 2048) % 2048 AS BIGINT)"
      s"""SELECT event_id,
         |  CAST(${zorderSql(x, 0, 11, 3)} | ${zorderSql(y, 1, 11, 3)} |
         |       ${zorderSql(w, 2, 11, 3)} AS BIGINT) AS z
         |FROM events ORDER BY event_id""".stripMargin
    },
  )
}
