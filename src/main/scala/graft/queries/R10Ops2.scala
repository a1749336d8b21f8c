package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{QDef, Tables}
import graft.functions.TimeCols

/** Round-10 batch 6: operational analytics — join-skew audit, trimmed
  * mean, bandit allocation, funnel timing percentiles — each oracle-paired.
  */
object R10Ops2 {

  val defs: Seq[QDef] = Seq(

    // JOIN-SKEW AUDIT: the pre-flight check before any big-key join — the
    // top-10 hottest join keys with their share of the fact table, plus
    // the max/avg skew factor. Window top-k over the key-frequency frame:
    // the injected WindowTopKRewrite turns the row_number≤k formulation
    // into the bounded-heap aggregate, so no full sort of the key
    // histogram happens. Ties break by key — counts are integers, so the
    // cut is exact in both engines.
    QDef("x_skew_audit",
      """WITH freq AS (
        |  SELECT o_custkey AS key, CAST(count(*) AS BIGINT) AS cnt
        |  FROM orders GROUP BY 1),
        |stats AS (
        |  SELECT CAST(sum(cnt) AS DOUBLE) AS total,
        |    CAST(max(cnt) AS DOUBLE) AS mx,
        |    avg(cnt) AS av
        |  FROM freq),
        |ranked AS (
        |  SELECT key, cnt,
        |    row_number() OVER (ORDER BY cnt DESC, key) AS rk
        |  FROM freq)
        |SELECT rk, key, cnt, round(cnt / total, 6) AS share,
        |  round(mx / av, 6) AS skew_factor
        |FROM ranked, stats WHERE rk <= 10""".stripMargin) { (s, d) =>
      val freq = Tables(s, d).orders
        .groupBy(col("o_custkey").as("key"))
        .agg(count(lit(1)).as("cnt"))
      val stats = freq.agg(sum(col("cnt")).cast("double").as("total"),
        max(col("cnt")).cast("double").as("mx"), avg(col("cnt")).as("av"))
      freq.withColumn("rk",
          row_number().over(Window.orderBy(col("cnt").desc, col("key"))))
        .filter(col("rk") <= 10)
        .crossJoin(broadcast(stats))
        .select(col("rk"), col("key"), col("cnt"),
          round(col("cnt") / col("total"), 6).as("share"),
          round(col("mx") / col("av"), 6).as("skew_factor"))
    },

    // TRIMMED MEAN (5% both tails) per segment, histogram-compressed: a
    // distinct value contributes `overlap of [below, below+c) with
    // [lo, hi)` rows — pure integer arithmetic, so the trim boundary is
    // exact in both engines with NO float rank in sight. Same posture as
    // x_quantile_norm: the only windows run over per-segment distinct-value
    // frames.
    QDef("x_trimmed_mean",
      """WITH oc AS (
        |  SELECT c.c_mktsegment AS g, o.o_totalprice AS v
        |  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey),
        |hist AS (SELECT g, v, count(*) AS c FROM oc GROUP BY 1, 2),
        |cum AS (
        |  SELECT g, v, c,
        |    coalesce(sum(c) OVER (PARTITION BY g ORDER BY v
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS below,
        |    sum(c) OVER (PARTITION BY g) AS n
        |  FROM hist),
        |kept AS (
        |  SELECT g, v,
        |    greatest(0, least(below + c, n - CAST(floor(n * 5e0 / 1e2) AS BIGINT))
        |      - greatest(below, CAST(floor(n * 5e0 / 1e2) AS BIGINT))) AS k
        |  FROM cum)
        |SELECT g AS c_mktsegment, CAST(sum(k) AS BIGINT) AS n_kept,
        |  round(sum(k * v) / sum(k), 6) AS trimmed_mean
        |FROM kept WHERE k > 0 GROUP BY 1""".stripMargin) { (s, d) =>
      val t = Tables(s, d)
      val oc = t.orders
        .join(broadcast(t.customer.select("c_custkey", "c_mktsegment")),
          col("o_custkey") === col("c_custkey"))
        .select(col("c_mktsegment").as("g"), col("o_totalprice").as("v"))
      val wBelow = Window.partitionBy("g").orderBy("v")
        .rowsBetween(Window.unboundedPreceding, -1)
      val wAll = Window.partitionBy("g")
      val lo = floor(col("n") * lit(5.0) / lit(100.0)).cast("bigint")
      val kept = oc.groupBy("g", "v").agg(count(lit(1)).as("c"))
        .withColumn("below", coalesce(sum(col("c")).over(wBelow), lit(0L)))
        .withColumn("n", sum(col("c")).over(wAll))
        .select(col("g"), col("v"),
          greatest(lit(0L), least(col("below") + col("c"), col("n") - lo)
            - greatest(col("below"), lo)).as("k"))
      kept.filter(col("k") > 0)
        .groupBy(col("g").as("c_mktsegment"))
        .agg(sum(col("k")).as("n_kept"),
          round(sum(col("k") * col("v")) / sum(col("k")), 6).as("trimmed_mean"))
    },

    // BANDIT ALLOCATION: Beta(1,1)-posterior means per arm (order
    // priority), traffic shares proportional to the posterior — the
    // deterministic core of Thompson sampling (production swaps the mean
    // for a posterior DRAW; the aggregation shape is identical). Exact
    // integer counts; two broadcast-sized frames.
    QDef("x_bandit_allocate",
      """WITH arms AS (
        |  SELECT o_orderpriority AS arm,
        |    CAST(count(*) AS BIGINT) AS n,
        |    CAST(count(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS BIGINT)
        |      AS s
        |  FROM orders GROUP BY 1),
        |pm AS (
        |  SELECT arm, n, s, (s + 1e0) / (n + 2e0) AS post_mean FROM arms),
        |tot AS (SELECT sum(post_mean) AS z FROM pm)
        |SELECT arm, n, s, round(post_mean, 6) AS post_mean,
        |  round(post_mean / z, 6) AS traffic_share
        |FROM pm, tot""".stripMargin) { (s, d) =>
      val arms = Tables(s, d).orders
        .groupBy(col("o_orderpriority").as("arm"))
        .agg(count(lit(1)).as("n"),
          count(when(col("o_orderstatus") === "F", 1)).as("s"))
        .withColumn("post_mean", (col("s") + lit(1.0)) / (col("n") + lit(2.0)))
      val tot = arms.agg(sum(col("post_mean")).as("z"))
      arms.crossJoin(broadcast(tot))
        .select(col("arm"), col("n"), col("s"),
          round(col("post_mean"), 6).as("post_mean"),
          round(col("post_mean") / col("z"), 6).as("traffic_share"))
    },

    // FUNNEL TIMING: minutes from a user's first view to their first
    // subsequent purchase, released as exact type-1 percentiles (smallest
    // duration with cumulative count ≥ ⌈q·n⌉ — integer minutes, integer
    // cut, zero float rank). The duration histogram the percentile window
    // runs over is value-domain-bounded; user-level firsts are one
    // grouped aggregate each.
    QDef("x_funnel_timing", {
      val us = "CAST(floor((pu - vu) / 60000000e0) AS BIGINT)"
      s"""WITH fv AS (
         |  SELECT user_id, min(epoch_us(ts)) AS vu
         |  FROM events WHERE event_type = 'view' GROUP BY 1),
         |fp AS (
         |  SELECT e.user_id, min(epoch_us(e.ts)) AS pu
         |  FROM events e JOIN fv ON e.user_id = fv.user_id
         |  WHERE e.event_type = 'purchase' AND epoch_us(e.ts) >= fv.vu
         |  GROUP BY 1),
         |dur AS (
         |  SELECT $us AS mins
         |  FROM fp JOIN fv ON fp.user_id = fv.user_id),
         |hist AS (SELECT mins, count(*) AS c FROM dur GROUP BY 1),
         |cum AS (
         |  SELECT mins,
         |    sum(c) OVER (ORDER BY mins) AS cc,
         |    sum(c) OVER () AS n
         |  FROM hist)
         |SELECT q, min(mins) AS minutes FROM (
         |  SELECT 50 AS q, mins FROM cum WHERE cc >= CAST(ceil(n * 50e0 / 1e2) AS BIGINT)
         |  UNION ALL
         |  SELECT 90, mins FROM cum WHERE cc >= CAST(ceil(n * 90e0 / 1e2) AS BIGINT))
         |GROUP BY q""".stripMargin
    }) { (s, d) =>
      val ev = Tables(s, d).events
        .select(col("user_id"), col("event_type"),
          TimeCols.eventMicros(col("ts")).as("us"))
      val fv = ev.filter(col("event_type") === "view")
        .groupBy("user_id").agg(min(col("us")).as("vu"))
      val fp = ev.filter(col("event_type") === "purchase")
        .join(fv, "user_id")
        .filter(col("us") >= col("vu"))
        .groupBy("user_id").agg(min(col("us")).as("pu"), min(col("vu")).as("vu2"))
      val dur = fp.select(
        floor((col("pu") - col("vu2")) / lit(6.0E7)).cast("bigint").as("mins"))
      val cum = dur.groupBy("mins").agg(count(lit(1)).as("c"))
        .withColumn("cc", sum(col("c"))
          .over(Window.orderBy("mins").rowsBetween(Window.unboundedPreceding, 0)))
        .withColumn("n", sum(col("c")).over(Window.partitionBy(lit(1))))
      def cut(q: Int) = cum
        .filter(col("cc") >= ceil(col("n") * lit(q.toDouble) / lit(100.0)).cast("bigint"))
        .agg(min(col("mins")).as("minutes"))
        .select(lit(q).as("q"), col("minutes"))
      cut(50).unionByName(cut(90))
    }
  )
}
