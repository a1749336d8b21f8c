package graft.queries

import graft.{QDef, Tables}
import org.apache.spark.sql.functions._

/** Completes table and function-family coverage: the snowflake chain through
  * region, the part dimension, JSON extraction over events.props, and date
  * arithmetic over the order/ship timestamps.
  */
object StarMisc {

  val defs: Seq[QDef] = Seq(

    // Full snowflake rollup: fact → supplier → nation → region (every level
    // broadcast; one fact-side shuffle for the final aggregate).
    QDef("q_region_rollup",
      """SELECT r.r_name, count(*) AS cnt, avg(l.l_quantity) AS avg_qty
        |FROM lineitem l
        |JOIN supplier s ON l.l_suppkey = s.s_suppkey
        |JOIN nation n ON s.s_nationkey = n.n_nationkey
        |JOIN region r ON n.n_regionkey = r.r_regionkey
        |GROUP BY r.r_name""".stripMargin) { (s, d) =>
      val t = Tables(s, d)
      t.lineitem
        .join(broadcast(t.supplier), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(t.nation), col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(t.region), col("n_regionkey") === col("r_regionkey"))
        .groupBy("r_name")
        .agg(count(lit(1)).as("cnt"), avg(col("l_quantity")).as("avg_qty"))
    },

    // Part-dimension stats: brand-level aggregate over the real part table.
    QDef("q_part_brand_stats",
      """SELECT p.p_brand, count(*) AS cnt, avg(l.l_quantity) AS avg_qty,
        |  round(avg(p.p_retailprice), 4) AS avg_retail
        |FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        |GROUP BY p.p_brand""".stripMargin) { (s, d) =>
      val t = Tables(s, d)
      t.lineitem.join(broadcast(t.part), col("l_partkey") === col("p_partkey"))
        .groupBy("p_brand")
        .agg(count(lit(1)).as("cnt"), avg(col("l_quantity")).as("avg_qty"),
          round(avg(col("p_retailprice")), 4).as("avg_retail"))
    },

    // Hierarchy rollup region → nation with subtotal + grand-total rows
    // (beyond the reference's flat groupBys; Spark rollup ≡ GROUP BY ROLLUP).
    QDef("q_rollup_hierarchy",
      """SELECT r.r_name, n.n_name, count(*) AS cnt
        |FROM supplier s
        |JOIN nation n ON s.s_nationkey = n.n_nationkey
        |JOIN region r ON n.n_regionkey = r.r_regionkey
        |GROUP BY ROLLUP (r.r_name, n.n_name)""".stripMargin) { (s, d) =>
      val t = Tables(s, d)
      // fresh aliases before rollup: Expand re-references the grouping
      // columns and trips the ambiguous-self-join detector otherwise
      t.supplier
        .join(broadcast(t.nation), col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(t.region), col("n_regionkey") === col("r_regionkey"))
        .select(col("r_name").as("rn"), col("n_name").as("nn"))
        .rollup(col("rn"), col("nn"))
        .agg(count(lit(1)).as("cnt"))
        .toDF("r_name", "n_name", "cnt")
    },

    // CUBE: every grouping-set combination of (returnflag, linestatus) in
    // one pass — subtotals along BOTH axes + grand total, distinguished by
    // grouping_id (rollup's generalization; Expand feeds one aggregation,
    // not 4 separate scans).
    QDef("x_cube_aggregates",
      """SELECT l_returnflag, l_linestatus,
        |  CAST(count(*) AS BIGINT) AS cnt,
        |  CAST(sum(l_quantity) AS DOUBLE) AS sum_qty,
        |  CAST(grouping(l_returnflag) * 2 + grouping(l_linestatus) AS BIGINT) AS gid
        |FROM lineitem
        |GROUP BY CUBE (l_returnflag, l_linestatus)""".stripMargin) { (s, d) =>
      Tables(s, d).lineitem
        .select(col("l_returnflag").as("rf"), col("l_linestatus").as("ls"),
          col("l_quantity"))
        .cube(col("rf"), col("ls"))
        .agg(count(lit(1)).as("cnt"),
          sum(col("l_quantity")).cast("double").as("sum_qty"),
          grouping_id(col("rf"), col("ls")).as("gid"))
        .toDF("l_returnflag", "l_linestatus", "cnt", "sum_qty", "gid")
    },

    // Window-analytics pack: quartile bucket, cumulative distribution,
    // and next-event gap per user — the ntile/cume_dist/lead family over
    // one shared (user_id, ts) window sort.
    QDef("x_window_analytics",
      """SELECT event_id, user_id,
        |  CAST(ntile(4) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS INT) AS quartile,
        |  round(cume_dist() OVER (PARTITION BY user_id ORDER BY ts, event_id), 6) AS cd,
        |  epoch_us(lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id))
        |    - epoch_us(ts) AS gap_us
        |FROM events WHERE user_id < 50""".stripMargin) { (s, d) =>
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      Tables(s, d).events.filter(col("user_id") < 50)
        .select(col("event_id"), col("user_id"),
          ntile(4).over(w).as("quartile"),
          round(cume_dist().over(w), 6).as("cd"),
          (graft.functions.TimeCols.eventMicros(lead(col("ts"), 1).over(w))
            - graft.functions.TimeCols.eventMicros(col("ts"))).as("gap_us"))
    },

    // Analytic windows over event sequences: per-user running sum and delta
    // vs the previous event (ordered by ts with a unique tiebreak).
    QDef("x_window_sequence",
      """SELECT event_id, user_id,
        |  round(sum(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4) AS running_value,
        |  value - lag(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS delta
        |FROM events WHERE user_id < 50""".stripMargin) { (s, d) =>
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      Tables(s, d).events.filter(col("user_id") < 50)
        .select(col("event_id"), col("user_id"),
          round(sum(col("value")).over(w.rowsBetween(Long.MinValue, 0)), 4).as("running_value"),
          (col("value") - lag(col("value"), 1).over(w)).as("delta"))
    },

    // JSON extraction from the events.props column (string JSON payloads).
    QDef("x_json_extract",
      """SELECT event_type, count(*) AS cnt,
        |  avg(CAST(json_extract_string(props, '$.k') AS INT)) AS avg_k
        |FROM events GROUP BY event_type""".stripMargin) { (s, d) =>
      Tables(s, d).events
        .withColumn("k", get_json_object(col("props"), "$.k").cast("int"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("cnt"), avg(col("k")).as("avg_k"))
    },

    // Date arithmetic: ship lag in days per order month (exact int measures).
    QDef("x_date_arith",
      """SELECT CAST(month(o.o_orderdate) AS INT) AS mon,
        |  count(*) AS cnt,
        |  avg(date_diff('day', o.o_orderdate, l.l_shipdate)) AS avg_ship_days
        |FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        |GROUP BY 1""".stripMargin) { (s, d) =>
      val t = Tables(s, d)
      t.lineitem.join(t.orders, col("l_orderkey") === col("o_orderkey"))
        .groupBy(month(col("o_orderdate")).as("mon"))
        .agg(count(lit(1)).as("cnt"),
          avg(datediff(col("l_shipdate"), col("o_orderdate"))).as("avg_ship_days"))
    },

    // Exact interpolated quantiles per group (data-quality staple). On the
    // integer-valued l_quantity the 2^-k interpolation fractions are exact
    // in binary, so Spark `percentile` == DuckDB `quantile_cont` bit-wise;
    // the arbitrary-double price median is rounded on both sides.
    QDef("x_quantiles",
      """SELECT l_returnflag,
        |  quantile_cont(l_quantity, 0.25) AS q25,
        |  quantile_cont(l_quantity, 0.5) AS q50,
        |  quantile_cont(l_quantity, 0.75) AS q75,
        |  round(quantile_cont(l_extendedprice, 0.5), 4) AS price_med
        |FROM lineitem GROUP BY 1""".stripMargin) { (s, d) =>
      Tables(s, d).lineitem.groupBy("l_returnflag")
        .agg(expr("percentile(l_quantity, 0.25)").as("q25"),
          expr("percentile(l_quantity, 0.5)").as("q50"),
          expr("percentile(l_quantity, 0.75)").as("q75"),
          round(expr("percentile(l_extendedprice, 0.5)"), 4).as("price_med"))
    },

    // Range (band) join: per order, how many OTHER orders the same customer
    // placed within the following 30 days. Equi-join on the customer key
    // carries the shuffle; the date band is a post-join filter — per-key
    // groups stay small, so the plan scales like any key join (AQE splits
    // hot customers). No crossJoin, no O(|orders|²).
    QDef("x_range_join",
      """SELECT o1.o_orderkey, CAST(count(*) AS BIGINT) AS repeats
        |FROM orders o1 JOIN orders o2
        |  ON o2.o_custkey = o1.o_custkey AND o2.o_orderkey <> o1.o_orderkey
        |  AND o2.o_orderdate >= o1.o_orderdate
        |  AND o2.o_orderdate <= o1.o_orderdate + INTERVAL 30 DAY
        |GROUP BY 1""".stripMargin) { (s, d) =>
      val orders = Tables(s, d).orders
      val o1 = orders.select(col("o_orderkey").as("k1"), col("o_custkey").as("c1"),
        col("o_orderdate").as("d1"))
      val o2 = orders.select(col("o_orderkey").as("k2"), col("o_custkey").as("c2"),
        col("o_orderdate").as("d2"))
      o1.join(o2, col("c1") === col("c2") && col("k1") =!= col("k2")
          && col("d2") >= col("d1") && col("d2") <= date_add(col("d1"), 30))
        .groupBy(col("k1").as("o_orderkey"))
        .agg(count(lit(1)).as("repeats"))
    },

    // Salted skew join, oracle-checked against the PLAIN equi-join: the salt
    // spreads a hot key over `buckets` tasks but must never change the match
    // set — lost or duplicated salt buckets are exactly what the count /
    // integer key-sum per segment would catch. (At sf the small side is
    // broadcastable anyway; the mechanism targets a skewed key joining a
    // medium dimension too big to broadcast.)
    QDef("x_salted_join",
      """SELECT c.c_mktsegment, count(*) AS cnt,
        |  CAST(sum(o.o_orderkey) AS BIGINT) AS key_sum,
        |  round(avg(o.o_totalprice), 4) AS avg_price
        |FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        |GROUP BY 1""".stripMargin) { (s, d) =>
      val t = Tables(s, d)
      val small = t.customer.withColumnRenamed("c_custkey", "o_custkey")
      graft.ops.ScaleJoins.saltedJoin(t.orders, small, "o_custkey", buckets = 8)
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("cnt"),
          sum(col("o_orderkey")).as("key_sum"),
          round(avg(col("o_totalprice")), 4).as("avg_price"))
    },

    // FUZZY JOIN (entity resolution): the clean part-name catalog joins a
    // deterministically corrupted feed (3rd character dropped) at edit
    // distance ≤ 1 — deletion-neighborhood blocking + levenshtein verify
    // on candidates only (ScaleJoins.fuzzyJoinLev1; blocked, never
    // all-pairs). The oracle brute-forces the same distance predicate —
    // identical pairs prove the blocking loses nothing.
    QDef("x_fuzzy_join",
      """WITH names AS (SELECT DISTINCT p_name FROM part),
        |noisy AS (SELECT DISTINCT substr(p_name, 1, 2) || substr(p_name, 4)
        |  AS q FROM names)
        |SELECT q, p_name AS matched FROM noisy JOIN names
        |ON levenshtein(q, p_name) <= 1""".stripMargin) { (s, d) =>
      val names = Tables(s, d).part.select(col("p_name")).distinct()
      val noisy = names.select(concat(substring(col("p_name"), 1, 2),
        expr("substring(p_name, 4, length(p_name))")).as("q")).distinct()
      graft.ops.ScaleJoins.fuzzyJoinLev1(noisy, "q", names, "p_name")
        .select(col("q"), col("p_name").as("matched"))
    },

    // DATA-QUALITY EXPECTATIONS (ops.Expectations): a declarative rule set
    // — not-null, range, unique, referential integrity — audited against a
    // deterministically corrupted orders feed (every o_orderkey ≡ 7 mod
    // 1000 re-appended with negative price and dangling custkey). All
    // scan-local + uniqueness rules run in ONE aggregate pass; only the FK
    // rule adds a broadcast anti-join. The oracle recomputes each rule's
    // violation count relationally; nonzero counts prove detection, the
    // not-null zero proves no false alarms.
    QDef("x_quality_expect",
      """WITH base AS (SELECT o_orderkey, o_custkey, o_totalprice FROM orders),
        |bad AS (SELECT o_orderkey, CAST(-999 AS BIGINT) AS o_custkey,
        |  -1.0 AS o_totalprice FROM base WHERE o_orderkey % 1000 = 7),
        |data AS (SELECT * FROM base UNION ALL SELECT * FROM bad)
        |SELECT rule, violations, violations = 0 AS passed FROM (
        |  SELECT 'o_custkey_not_null' AS rule,
        |    CAST(count(CASE WHEN o_custkey IS NULL THEN 1 END) AS BIGINT)
        |      AS violations FROM data
        |  UNION ALL
        |  SELECT 'o_totalprice_range',
        |    CAST(count(CASE WHEN o_totalprice IS NOT NULL
        |      AND (o_totalprice < 0 OR o_totalprice > 1000000000) THEN 1 END)
        |      AS BIGINT) FROM data
        |  UNION ALL
        |  SELECT 'o_orderkey_unique',
        |    CAST(count(*) - count(DISTINCT o_orderkey) AS BIGINT) FROM data
        |  UNION ALL
        |  SELECT 'o_custkey_ref',
        |    CAST((SELECT count(*) FROM data dd
        |      LEFT JOIN customer c ON c.c_custkey = dd.o_custkey
        |      WHERE c.c_custkey IS NULL) AS BIGINT))""".stripMargin) { (s, d) =>
      import graft.ops.Expectations._
      val t = Tables(s, d)
      val base = t.orders.select(col("o_orderkey"), col("o_custkey"),
        col("o_totalprice"))
      val bad = base.filter(col("o_orderkey") % 1000 === 7)
        .select(col("o_orderkey"), lit(-999L).as("o_custkey"),
          lit(-1.0).as("o_totalprice"))
      check(base.unionByName(bad), Seq(
        NotNull("o_custkey"),
        InRange("o_totalprice", 0.0, 1e9),
        Unique("o_orderkey"),
        RefIntegrity("o_custkey", t.customer, "c_custkey")))
    },

    // Interval-overlap join (incident correlation): 10-minute error windows
    // that intersect ACROSS users. The engine grid-buckets time and
    // equi-joins on the cell (cost = per-cell density, not corpus²); the
    // oracle states the overlap predicate directly as a theta join. Pairs
    // deduped (an overlap spanning several cells meets more than once) and
    // canonicalized a < b.
    QDef("x_interval_overlap",
      """WITH e AS (SELECT event_id, user_id, epoch_us(ts) AS s,
        |    epoch_us(ts) + 600000000 AS t
        |  FROM events WHERE event_type = 'error')
        |SELECT l.event_id AS a, r.event_id AS b
        |FROM e l JOIN e r ON l.event_id < r.event_id AND l.user_id <> r.user_id
        |  AND l.s <= r.t AND r.s <= l.t""".stripMargin) { (s, d) =>
      import graft.ops.IntervalJoin
      val iv = Tables(s, d).events
        .filter(col("event_type") === "error")
        .select(col("event_id"), col("user_id"),
          graft.functions.TimeCols.eventMicros(col("ts")).as("s"),
          (graft.functions.TimeCols.eventMicros(col("ts")) + 600000000L).as("t"))
      IntervalJoin.overlapPairs(iv, iv, "event_id", "s", "t",
        cellMicros = 600000000L,
        extraPred = col("l.event_id") < col("r.event_id") &&
          col("l.user_id") =!= col("r.user_id"))
    },

    // Per-group z-score normalization: the standard feature-prep pass —
    // group stats via one partial/final aggregate, broadcast back onto the
    // scan (the stats frame is |groups| rows). round(6) on BOTH sides: the
    // mean/stddev partial-merge order differs across engines.
    QDef("x_normalize",
      """WITH st AS (SELECT event_type, avg(value) AS m,
        |    stddev_samp(value) AS sd
        |  FROM events GROUP BY 1)
        |SELECT e.event_id, e.event_type, round((e.value - st.m) / st.sd, 6) AS z
        |FROM events e JOIN st USING (event_type)""".stripMargin) { (s, d) =>
      val ev = Tables(s, d).events
      val stats = ev.groupBy("event_type")
        .agg(avg("value").as("m"), stddev_samp(col("value")).as("sd"))
      ev.join(broadcast(stats), "event_type")
        .select(col("event_id"), col("event_type"),
          round((col("value") - col("m")) / col("sd"), 6).as("z"))
    },

    // Time-series resample with gap fill: hourly event counts per type on
    // a complete calendar spine — missing (hour, type) cells surface as
    // explicit zeros (the downstream-model contract: absence of data is a
    // 0 observation, not a missing row). The spine is generated from the
    // 1-row bounds aggregate crossed with the distinct types — KB-sized,
    // broadcast; the fact side pays one partial/final count aggregate.
    QDef("x_resample",
      """WITH ev AS (SELECT date_trunc('hour', ts) AS h, event_type FROM events),
        |agg AS (SELECT h, event_type, count(*) AS cnt FROM ev GROUP BY 1, 2),
        |b AS (SELECT min(h) AS lo, max(h) AS hi FROM ev),
        |spine AS (SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS h,
        |    t.event_type
        |  FROM b, (SELECT DISTINCT event_type FROM ev) t)
        |SELECT s.h, s.event_type, coalesce(a.cnt, 0) AS cnt
        |FROM spine s LEFT JOIN agg a
        |  ON a.h = s.h AND a.event_type = s.event_type""".stripMargin) { (s, d) =>
      val ev = Tables(s, d).events
        .select(date_trunc("hour", col("ts")).as("h"), col("event_type"))
      val agg = ev.groupBy("h", "event_type").agg(count(lit(1)).as("cnt"))
      val spine = ev.agg(min("h").as("lo"), max("h").as("hi"))
        .select(explode(sequence(col("lo"), col("hi"),
          expr("interval 1 hour"))).as("h"))
        .crossJoin(ev.select("event_type").distinct())
      spine.join(agg, Seq("h", "event_type"), "left")
        .na.fill(0L, Seq("cnt"))
    }
  )
}
