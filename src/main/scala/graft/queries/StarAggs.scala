package graft.queries

import graft.{QDef, Tables}
import org.apache.spark.sql.functions._

/** Aggregations A1-A21, sorts/top-k T1-T4, and the collect-scalar /
  * banker's-rounding idioms S4/F2/C11 from SURVEY.md §2.5-2.6.
  *
  * Float determinism vs the DuckDB oracle: aggregates over integer-valued
  * doubles (l_quantity, counts) are bit-exact in any summation order, so they
  * are left unrounded; aggregates over arbitrary doubles (prices, event
  * values) are `round(x, N)` on BOTH sides because partial-aggregation order
  * differs between engines by design.
  */
object StarAggs {

  /** The reference's collect-scalar idiom (src/delayed_flights.py:29-36):
    * one-row aggregate → driver literal, with Python round() = banker's
    * rounding (HALF_EVEN — NOT Spark's round(), which is HALF_UP).
    * Kept as a 1-row `first()` — at 100 TB this collects 8 bytes, not data. */
  private def avgCountScalar(t: Tables): Double = {
    val counts = t.lineitem.filter(col("l_quantity") > 25)
      .join(broadcast(t.supplier), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(t.nation), col("s_nationkey") === col("n_nationkey"))
      .groupBy("n_name").agg(count(lit(1)).as("cnt"))
    val raw = counts.agg(avg(col("cnt"))).first().getDouble(0)
    BigDecimal(raw).setScale(0, BigDecimal.RoundingMode.HALF_EVEN).toDouble
  }

  private val CountsCte =
    """counts AS (
      |  SELECT n.n_name, count(*) AS cnt
      |  FROM lineitem l
      |  JOIN supplier s ON l.l_suppkey = s.s_suppkey
      |  JOIN nation n ON s.s_nationkey = n.n_nationkey
      |  WHERE l.l_quantity > 25
      |  GROUP BY n.n_name)""".stripMargin

  val defs: Seq[QDef] = Seq(

    // A2 — bare count() action as a 1-row result (ref: src/preprocessing.py:23).
    QDef("a2_count_star",
      "SELECT count(*) AS cnt FROM lineitem") {
      (s, d) => Tables(s, d).lineitem.agg(count(lit(1)).as("cnt"))
    },

    // A3 — count per group through a dim chain — the "count per CITY" shape
    // (ref: src/delayed_flights.py:25-26) on the customer leg.
    QDef("a3_count_per_city",
      """SELECT n.n_name, count(*) AS num_orders
        |FROM orders o
        |JOIN customer c ON o.o_custkey = c.c_custkey
        |JOIN nation n ON c.c_nationkey = n.n_nationkey
        |GROUP BY n.n_name""".stripMargin) { (s, d) =>
      val t = Tables(s, d)
      t.orders
        .join(broadcast(t.customer), col("o_custkey") === col("c_custkey"))
        .join(broadcast(t.nation), col("c_nationkey") === col("n_nationkey"))
        .groupBy("n_name").agg(count(lit(1)).as("num_orders"))
    },

    // A4 — global mean of per-group counts, 1 row (ref: src/delayed_flights.py:29-30).
    // Integer sum / integer count → bit-exact double.
    QDef("a4_global_mean_counts",
      s"""WITH ${CountsCte}
         |SELECT avg(cnt) AS avg_cnt FROM counts""".stripMargin) { (s, d) =>
      val t = Tables(s, d)
      t.lineitem.filter(col("l_quantity") > 25)
        .join(broadcast(t.supplier), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(t.nation), col("s_nationkey") === col("n_nationkey"))
        .groupBy("n_name").agg(count(lit(1)).as("cnt"))
        .agg(avg(col("cnt")).as("avg_cnt"))
    },

    // S4 + F2 + C11 — collect the 1-row mean, banker's-round it on the
    // driver, and filter groups above it (ref: src/delayed_flights.py:33-36).
    // Oracle note: avg fraction at this data is not a .5 boundary, so
    // DuckDB round() (half-away) == Python round() (half-even) here; the
    // boundary case itself is unit-tested in BankersRoundingSpec.
    QDef("s4_scalar_filter",
      s"""WITH ${CountsCte}
         |SELECT n_name, cnt FROM counts
         |WHERE cnt > (SELECT round(avg(cnt)) FROM counts)""".stripMargin) { (s, d) =>
      val t = Tables(s, d)
      val counts = t.lineitem.filter(col("l_quantity") > 25)
        .join(broadcast(t.supplier), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(t.nation), col("s_nationkey") === col("n_nationkey"))
        .groupBy("n_name").agg(count(lit(1)).as("cnt"))
      counts.filter(col("cnt") > lit(avgCountScalar(t))).select("n_name", "cnt")
    },

    // F2 decorrelated variant — same "groups above global mean" semantics but
    // fully distributed: cross-join the 1-row aggregate instead of collecting
    // (SURVEY §4.3 O1). No driver barrier, one broadcast of 8 bytes.
    QDef("f2_gt_scalar_decorrelated",
      """WITH c AS (SELECT l_suppkey, count(*) AS cnt FROM lineitem GROUP BY l_suppkey)
        |SELECT l_suppkey, cnt FROM c WHERE cnt > (SELECT avg(cnt) FROM c)""".stripMargin) { (s, d) =>
      val c = Tables(s, d).lineitem.groupBy("l_suppkey").agg(count(lit(1)).as("cnt"))
      val m = c.agg(avg(col("cnt")).as("avg_cnt"))
      c.crossJoin(broadcast(m)).filter(col("cnt") > col("avg_cnt")).select("l_suppkey", "cnt")
    },

    // C11 — the banker's-rounded scalar itself, exposed as a 1-row result.
    QDef("c11_bankers_round",
      s"""WITH ${CountsCte}
         |SELECT avg(cnt) AS raw_avg, round(avg(cnt)) AS rounded FROM counts""".stripMargin) { (s, d) =>
      val t = Tables(s, d)
      val raw = t.lineitem.filter(col("l_quantity") > 25)
        .join(broadcast(t.supplier), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(t.nation), col("s_nationkey") === col("n_nationkey"))
        .groupBy("n_name").agg(count(lit(1)).as("cnt"))
        .agg(avg(col("cnt")).as("raw_avg")).first().getDouble(0)
      val rounded = BigDecimal(raw).setScale(0, BigDecimal.RoundingMode.HALF_EVEN).toDouble
      import s.implicits._
      Seq((raw, rounded)).toDF("raw_avg", "rounded")
    },

    // A5 — per-group mean of two measures in one pass (ref: src/delayed_flights.py:42-44).
    QDef("a5_avg_two_measures",
      """SELECT n.n_name, avg(l.l_quantity) AS avg_qty, round(avg(l.l_extendedprice), 4) AS avg_price
        |FROM lineitem l
        |JOIN supplier s ON l.l_suppkey = s.s_suppkey
        |JOIN nation n ON s.s_nationkey = n.n_nationkey
        |GROUP BY n.n_name""".stripMargin) { (s, d) =>
      val t = Tables(s, d)
      t.lineitem
        .join(broadcast(t.supplier), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(t.nation), col("s_nationkey") === col("n_nationkey"))
        .groupBy("n_name")
        .agg(avg(col("l_quantity")).as("avg_qty"), round(avg(col("l_extendedprice")), 4).as("avg_price"))
    },

    // A6 — derived avg-of-avgs post-agg (ref: src/delayed_flights.py:46-49).
    QDef("a6_avg_of_avgs",
      """WITH a AS (
        |  SELECT n.n_name, avg(l.l_quantity) AS avg_qty, round(avg(l.l_extendedprice), 4) AS avg_price
        |  FROM lineitem l
        |  JOIN supplier s ON l.l_suppkey = s.s_suppkey
        |  JOIN nation n ON s.s_nationkey = n.n_nationkey
        |  GROUP BY n.n_name)
        |SELECT n_name, avg_qty, avg_price, (avg_qty + avg_price) / 2 AS total_avg FROM a""".stripMargin) { (s, d) =>
      val t = Tables(s, d)
      t.lineitem
        .join(broadcast(t.supplier), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(t.nation), col("s_nationkey") === col("n_nationkey"))
        .groupBy("n_name")
        .agg(avg(col("l_quantity")).as("avg_qty"), round(avg(col("l_extendedprice")), 4).as("avg_price"))
        .withColumn("total_avg", (col("avg_qty") + col("avg_price")) / 2)
    },

    // A7 — multi-key groupBy (ref: (CITY, AIRLINE) src/delayed_flights.py:112-113).
    QDef("a7_multikey_group",
      """SELECT n.n_name, l.l_returnflag, count(*) AS cnt, avg(l.l_quantity) AS avg_qty
        |FROM lineitem l
        |JOIN supplier s ON l.l_suppkey = s.s_suppkey
        |JOIN nation n ON s.s_nationkey = n.n_nationkey
        |GROUP BY n.n_name, l.l_returnflag""".stripMargin) { (s, d) =>
      val t = Tables(s, d)
      t.lineitem
        .join(broadcast(t.supplier), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(t.nation), col("s_nationkey") === col("n_nationkey"))
        .groupBy("n_name", "l_returnflag")
        .agg(count(lit(1)).as("cnt"), avg(col("l_quantity")).as("avg_qty"))
    },

    // A8 — count per dim name + percentage of global total (ref:
    // src/delayed_flights.py:143-152). Total via 1-row broadcast cross-join.
    QDef("a8_count_pct",
      """WITH c AS (
        |  SELECT s.s_name, count(*) AS cnt
        |  FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey
        |  GROUP BY s.s_name),
        |t AS (SELECT sum(cnt) AS total FROM c)
        |SELECT s_name, cnt, cnt / total * 100 AS pct FROM c, t""".stripMargin) { (s, d) =>
      val t = Tables(s, d)
      val c = t.lineitem.join(broadcast(t.supplier), col("l_suppkey") === col("s_suppkey"))
        .groupBy("s_name").agg(count(lit(1)).as("cnt"))
      val tot = c.agg(sum(col("cnt")).as("total"))
      c.crossJoin(broadcast(tot))
        .select(col("s_name"), col("cnt"), (col("cnt") / col("total") * 100).as("pct"))
    },

    // A9 — count per derived ROUTE key (ref: src/delayed_flights.py:178).
    QDef("a9_count_per_route",
      """SELECT concat_ws('-', l_returnflag, l_linestatus) AS route, count(*) AS cnt
        |FROM lineitem GROUP BY 1""".stripMargin) { (s, d) =>
      Tables(s, d).lineitem
        .groupBy(concat_ws("-", col("l_returnflag"), col("l_linestatus")).as("route"))
        .agg(count(lit(1)).as("cnt"))
    },

    // A10 — mean of two measures per ROUTE (ref: src/delayed_flights.py:193-196).
    QDef("a10_avg_per_route",
      """SELECT concat_ws('-', l_returnflag, l_linestatus) AS route,
        |  avg(l_quantity) AS avg_qty, round(avg(l_extendedprice), 4) AS avg_price
        |FROM lineitem GROUP BY 1""".stripMargin) { (s, d) =>
      Tables(s, d).lineitem
        .groupBy(concat_ws("-", col("l_returnflag"), col("l_linestatus")).as("route"))
        .agg(avg(col("l_quantity")).as("avg_qty"), round(avg(col("l_extendedprice")), 4).as("avg_price"))
    },

    // A11 — the reference computes count and mean as TWO aggregates + a join
    // (src/delayed_flights.py:224-232); fused here into ONE hash aggregate —
    // half the shuffles, identical result (SURVEY §4.2.4).
    QDef("a11_fused_count_avg",
      """SELECT l_suppkey, count(*) AS cnt, avg(l_quantity) AS avg_qty,
        |  round(avg(l_extendedprice), 4) AS avg_price
        |FROM lineitem GROUP BY l_suppkey""".stripMargin) { (s, d) =>
      Tables(s, d).lineitem
        .groupBy("l_suppkey")
        .agg(count(lit(1)).as("cnt"), avg(col("l_quantity")).as("avg_qty"),
          round(avg(col("l_extendedprice")), 4).as("avg_price"))
    },

    // A12 — sum per key on two independent key families (ref: per-origin /
    // per-dest sums src/delayed_flights.py:255-262), tagged union.
    QDef("a12_sum_per_keys",
      """SELECT 'supp' AS side, l_suppkey AS key, CAST(sum(l_quantity) AS DOUBLE) AS qty
        |FROM lineitem GROUP BY l_suppkey
        |UNION ALL
        |SELECT 'part' AS side, l_partkey % 150 AS key, CAST(sum(l_quantity) AS DOUBLE) AS qty
        |FROM lineitem GROUP BY 2""".stripMargin) { (s, d) =>
      val li = Tables(s, d).lineitem
      val a = li.groupBy(col("l_suppkey").as("key"))
        .agg(sum(col("l_quantity")).as("qty")).select(lit("supp").as("side"), col("key"), col("qty"))
      val b = li.groupBy((col("l_partkey") % 150).as("key"))
        .agg(sum(col("l_quantity")).as("qty")).select(lit("part").as("side"), col("key"), col("qty"))
      a.union(b)
    },

    // A13 — re-aggregation to city level after a dim join: three sums in one
    // pass (ref: src/delayed_flights.py:299-303).
    QDef("a13_rejoin_sums",
      """SELECT n.n_name, CAST(sum(l.l_quantity) AS DOUBLE) AS sum_qty,
        |  round(sum(l.l_extendedprice), 2) AS sum_price,
        |  round(sum(l.l_discount), 4) AS sum_disc
        |FROM lineitem l
        |JOIN supplier s ON l.l_suppkey = s.s_suppkey
        |JOIN nation n ON s.s_nationkey = n.n_nationkey
        |GROUP BY n.n_name""".stripMargin) { (s, d) =>
      val t = Tables(s, d)
      t.lineitem
        .join(broadcast(t.supplier), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(t.nation), col("s_nationkey") === col("n_nationkey"))
        .groupBy("n_name")
        .agg(sum(col("l_quantity")).as("sum_qty"),
          round(sum(col("l_extendedprice")), 2).as("sum_price"),
          round(sum(col("l_discount")), 4).as("sum_disc"))
    },

    // A14 — null-SKIPPING count(col) per hour — count(col) ≠ count(*) (ref:
    // count(DEPARTURE_DELAY) src/delayed_flights.py:373-375).
    QDef("a14_null_skip_count",
      """WITH e AS (SELECT *, CASE WHEN value < 1 THEN NULL ELSE value END AS value_n FROM events)
        |SELECT CAST(hour(ts) AS INT) AS h, count(value_n) AS cnt_nonnull, count(*) AS cnt_all
        |FROM e GROUP BY 1""".stripMargin) { (s, d) =>
      Tables(s, d).events
        .withColumn("value_n", when(col("value") < 1, lit(null)).otherwise(col("value")))
        .groupBy(hour(col("ts")).as("h"))
        .agg(count(col("value_n")).as("cnt_nonnull"), count(lit(1)).as("cnt_all"))
    },

    // A15 — count + means per category (ref: per-AIRLINE src/delayed_flights.py:406-412).
    QDef("a15_per_type_stats",
      """SELECT event_type, count(*) AS cnt, round(avg(value), 6) AS avg_value
        |FROM events GROUP BY event_type""".stripMargin) { (s, d) =>
      Tables(s, d).events
        .groupBy("event_type")
        .agg(count(lit(1)).as("cnt"), round(avg(col("value")), 6).as("avg_value"))
    },

    // A16 — two hourly means fused into one conditional aggregate instead of
    // the reference's two groupBys + join (src/delayed_flights.py:460-470).
    QDef("a16_hourly_avgs",
      """SELECT CAST(hour(ts) AS INT) AS h,
        |  round(avg(CASE WHEN event_type = 'click' THEN value END), 6) AS avg_click,
        |  round(avg(CASE WHEN event_type = 'view' THEN value END), 6) AS avg_view
        |FROM events GROUP BY 1""".stripMargin) { (s, d) =>
      Tables(s, d).events
        .groupBy(hour(col("ts")).as("h"))
        .agg(round(avg(when(col("event_type") === "click", col("value"))), 6).as("avg_click"),
          round(avg(when(col("event_type") === "view", col("value"))), 6).as("avg_view"))
    },

    // A17 — count per reason code on the filtered partition (ref:
    // CANCELLATION_REASON src/cancelled_flights.py:21-22).
    QDef("a17_count_per_reason",
      """SELECT o_orderpriority, count(*) AS cnt
        |FROM orders WHERE o_orderstatus = 'F' GROUP BY o_orderpriority""".stripMargin) { (s, d) =>
      Tables(s, d).orders.filter(col("o_orderstatus") === "F")
        .groupBy("o_orderpriority").agg(count(lit(1)).as("cnt"))
    },

    // A18 — counts per calendar MONTH and per DAY_OF_WEEK (ref:
    // src/cancelled_flights.py:109,143). Spark dayofweek(): 1=Sunday;
    // DuckDB isodow(): 1=Monday..7=Sunday → isodow % 7 + 1 matches.
    QDef("a18_month_dow",
      """SELECT CAST(month(o_orderdate) AS INT) AS mon,
        |  CAST(isodow(o_orderdate) % 7 + 1 AS INT) AS dow, count(*) AS cnt
        |FROM orders WHERE o_orderstatus = 'F' GROUP BY 1, 2""".stripMargin) { (s, d) =>
      Tables(s, d).orders.filter(col("o_orderstatus") === "F")
        .groupBy(month(col("o_orderdate")).as("mon"), dayofweek(col("o_orderdate")).as("dow"))
        .agg(count(lit(1)).as("cnt"))
    },

    // A19 — count per category on a filtered subset (ref: src/cancelled_flights.py:198).
    QDef("a19_count_filtered_type",
      """SELECT event_type, count(*) AS cnt FROM events WHERE value > 2 GROUP BY event_type""") {
      (s, d) => Tables(s, d).events.filter(col("value") > 2)
        .groupBy("event_type").agg(count(lit(1)).as("cnt"))
    },

    // A20 — counts per origin-side and dest-side keys of the same filtered
    // fact (ref: src/cancelled_flights.py:230-237), tagged union.
    QDef("a20_two_key_counts",
      """WITH f AS (SELECT l.* FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        |  WHERE o.o_orderstatus = 'F')
        |SELECT 'supp' AS side, l_suppkey AS key, count(*) AS cnt FROM f GROUP BY 2
        |UNION ALL
        |SELECT 'part' AS side, l_partkey % 150 AS key, count(*) AS cnt FROM f GROUP BY 2""".stripMargin) { (s, d) =>
      val t = Tables(s, d)
      val f = t.lineitem.join(t.orders.filter(col("o_orderstatus") === "F"),
        col("l_orderkey") === col("o_orderkey"))
      val a = f.groupBy(col("l_suppkey").as("key")).agg(count(lit(1)).as("cnt"))
        .select(lit("supp").as("side"), col("key"), col("cnt"))
      val b = f.groupBy((col("l_partkey") % 150).as("key")).agg(count(lit(1)).as("cnt"))
        .select(lit("part").as("side"), col("key"), col("cnt"))
      a.union(b)
    },

    // C13 + A21 — hour→time-slot bucketing (chained when, ref bucket edges
    // src/delayed_flights.py:500-511) + re-aggregation over the buckets.
    QDef("c13_timeslot_agg",
      """SELECT CASE
        |    WHEN hour(ts) BETWEEN 6 AND 11 THEN 'morning'
        |    WHEN hour(ts) BETWEEN 12 AND 18 THEN 'afternoon'
        |    WHEN hour(ts) BETWEEN 19 AND 23 THEN 'evening'
        |    ELSE 'night' END AS time_slot,
        |  count(*) AS cnt, round(sum(value), 4) AS sum_value, round(avg(value), 6) AS avg_value
        |FROM events GROUP BY 1""".stripMargin) { (s, d) =>
      val h = hour(col("ts"))
      Tables(s, d).events
        .withColumn("time_slot",
          when(h.between(6, 11), "morning")
            .when(h.between(12, 18), "afternoon")
            .when(h.between(19, 23), "evening")
            .otherwise("night"))
        .groupBy("time_slot")
        .agg(count(lit(1)).as("cnt"), round(sum(col("value")), 4).as("sum_value"),
          round(avg(col("value")), 6).as("avg_value"))
    },

    // C14 — wide→long melt/unpivot pulled into the engine (ref: pandas melt
    // src/delayed_flights.py:325-326 → Dataset.unpivot, Spark ≥3.4).
    QDef("c14_unpivot",
      """WITH a AS (
        |  SELECT n.n_name, avg(l.l_quantity) AS avg_qty, round(avg(l.l_extendedprice), 4) AS avg_price
        |  FROM lineitem l
        |  JOIN supplier s ON l.l_suppkey = s.s_suppkey
        |  JOIN nation n ON s.s_nationkey = n.n_nationkey
        |  GROUP BY n.n_name)
        |SELECT n_name, 'avg_qty' AS metric, avg_qty AS value FROM a
        |UNION ALL
        |SELECT n_name, 'avg_price' AS metric, avg_price AS value FROM a""".stripMargin) { (s, d) =>
      val t = Tables(s, d)
      t.lineitem
        .join(broadcast(t.supplier), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(t.nation), col("s_nationkey") === col("n_nationkey"))
        .groupBy("n_name")
        .agg(avg(col("l_quantity")).as("avg_qty"), round(avg(col("l_extendedprice")), 4).as("avg_price"))
        .unpivot(Array(col("n_name")), Array(col("avg_qty"), col("avg_price")), "metric", "value")
    },

    // PIVOT — c14's inverse (long→wide): per-user event counts spread into
    // one column per event type. Pivot values are given EXPLICITLY, which
    // both fixes the output schema at plan time (no extra distinct-values
    // pass over a 100 TB table) and makes the column set deterministic for
    // the oracle, which replays the pivot as conditional aggregation —
    // exactly the rewrite Spark's own pivot lowers to.
    QDef("x_pivot",
      """SELECT user_id,
        |  CAST(count(CASE WHEN event_type = 'click' THEN 1 END) AS BIGINT)
        |    AS click,
        |  CAST(count(CASE WHEN event_type = 'view' THEN 1 END) AS BIGINT)
        |    AS "view",
        |  CAST(count(CASE WHEN event_type = 'purchase' THEN 1 END) AS BIGINT)
        |    AS purchase
        |FROM events GROUP BY 1""".stripMargin) { (s, d) =>
      Tables(s, d).events
        .groupBy("user_id")
        .pivot("event_type", Seq("click", "view", "purchase"))
        .agg(count(lit(1)))
        .na.fill(0L, Seq("click", "view", "purchase"))
    },

    // SET OPERATIONS — INTERSECT and EXCEPT as first-class operators (both
    // lower to aggregate/anti-join shuffles on the full row, so they scale
    // like any distinct): customers who ordered in BOTH halves of the year
    // vs only the first half, tagged and unioned into one result.
    QDef("x_set_ops",
      """WITH h1 AS (SELECT DISTINCT o_custkey FROM orders
        |  WHERE month(o_orderdate) <= 6),
        |h2 AS (SELECT DISTINCT o_custkey FROM orders
        |  WHERE month(o_orderdate) > 6)
        |SELECT 'both' AS tag, o_custkey FROM (
        |  SELECT o_custkey FROM h1 INTERSECT SELECT o_custkey FROM h2)
        |UNION ALL
        |SELECT 'h1_only', o_custkey FROM (
        |  SELECT o_custkey FROM h1 EXCEPT SELECT o_custkey FROM h2)""".stripMargin) {
      (s, d) =>
        val o = Tables(s, d).orders
        val h1 = o.filter(month(col("o_orderdate")) <= 6)
          .select("o_custkey").distinct()
        val h2 = o.filter(month(col("o_orderdate")) > 6)
          .select("o_custkey").distinct()
        h1.intersect(h2).select(lit("both").as("tag"), col("o_custkey"))
          .unionByName(
            h1.except(h2).select(lit("h1_only").as("tag"), col("o_custkey")))
    },

    // T1 — full orderBy desc (ref: src/delayed_flights.py:44,51). The engine
    // exposes ordered output; downstream top-k callers should use T2's
    // orderBy.limit instead of sorting everything.
    QDef("t1_orderby_desc",
      """SELECT l_suppkey, CAST(sum(l_quantity) AS DOUBLE) AS sum_qty
        |FROM lineitem GROUP BY l_suppkey ORDER BY sum_qty DESC, l_suppkey""".stripMargin) { (s, d) =>
      Tables(s, d).lineitem
        .groupBy("l_suppkey").agg(sum(col("l_quantity")).as("sum_qty"))
        .orderBy(col("sum_qty").desc, col("l_suppkey"))
    },

    // T2 — true top-k via orderBy.limit → TakeOrderedAndProject, no global
    // sort (ref: src/delayed_flights.py:106,155-156). Unique tiebreak column
    // keeps the selected set deterministic.
    QDef("t2_topk",
      """SELECT s.s_name, s.s_suppkey, count(*) AS cnt
        |FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey
        |GROUP BY s.s_name, s.s_suppkey
        |ORDER BY cnt DESC, s.s_suppkey LIMIT 15""".stripMargin) { (s, d) =>
      val t = Tables(s, d)
      t.lineitem.join(broadcast(t.supplier), col("l_suppkey") === col("s_suppkey"))
        .groupBy("s_name", "s_suppkey").agg(count(lit(1)).as("cnt"))
        .orderBy(col("cnt").desc, col("s_suppkey"))
        .limit(15)
    },

    // T3 — ascending key sort; Spark default is nulls-first asc (ref:
    // src/cancelled_flights.py:110,146). Oracle pins NULLS FIRST (DuckDB
    // defaults to NULLS LAST).
    QDef("t3_asc_nulls_first",
      """WITH g AS (SELECT nullif(l_returnflag, 'A') AS flag_n, count(*) AS cnt
        |  FROM lineitem GROUP BY 1)
        |SELECT flag_n, cnt FROM g ORDER BY flag_n ASC NULLS FIRST""".stripMargin) { (s, d) =>
      Tables(s, d).lineitem
        .groupBy(nullif(col("l_returnflag"), lit("A")).as("flag_n"))
        .agg(count(lit(1)).as("cnt"))
        .orderBy(asc("flag_n"))
    },

    // T4 — the reference's pandas sort+head pulled into the engine as
    // orderBy.limit (ref: src/cancelled_flights.py:208,244).
    QDef("t4_sort_head",
      """SELECT concat_ws('-', l_returnflag, l_linestatus) AS route, count(*) AS cnt
        |FROM lineitem GROUP BY 1 ORDER BY cnt DESC, route LIMIT 10""".stripMargin) { (s, d) =>
      Tables(s, d).lineitem
        .groupBy(concat_ws("-", col("l_returnflag"), col("l_linestatus")).as("route"))
        .agg(count(lit(1)).as("cnt"))
        .orderBy(col("cnt").desc, col("route"))
        .limit(10)
    }
  )
}
