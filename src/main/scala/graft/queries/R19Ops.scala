package graft.queries

import graft.{QDef, Tables}
import graft.ops.BinnedRank
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-19 batch: betweenness centrality (the missing centrality next
  * to closeness/PageRank/HITS), the Mann-Kendall trend and Pettitt
  * change-point tests (the rank-based complements of Theil-Sen and the
  * CUSUM family), mode/geometric/harmonic descriptive statistics, and
  * Lorenz-curve deciles. Graph state stays |V|²-bounded after one
  * fact-scale edge derivation; series tests ride the calendar frame;
  * monetary shares release from exact integer cents.
  */
object R19Ops {

  val defs: Seq[QDef] = Seq(

    // BETWEENNESS CENTRALITY on the high-value trade graph (the
    // x_graph_closeness sparsification): σ path counts by 8 layered
    // walk-count joins (walks of length = shortest distance ARE the
    // shortest paths, so min-layer counts are exact σ), then Brandes'
    // pair-dependency sum over a triple join of the |V|²-bounded
    // (dist, σ) table. The corpus contributes ONE edge-derivation pass;
    // every subsequent frame is nation-sized.
    QDef("x_graph_betweenness",
      """WITH e0 AS MATERIALIZED (
        |  SELECT DISTINCT s.s_nationkey AS src, c.c_nationkey AS dst
        |  FROM lineitem l
        |  JOIN orders o ON l.l_orderkey = o.o_orderkey
        |  JOIN customer c ON o.o_custkey = c.c_custkey
        |  JOIN supplier s ON l.l_suppkey = s.s_suppkey
        |  WHERE l.l_extendedprice > 104500),
        |e AS MATERIALIZED (SELECT src, dst FROM e0 WHERE src <> dst),
        |p1 AS (SELECT src AS s, dst AS v, CAST(1 AS BIGINT) AS c FROM e),
        |p2 AS (SELECT p.s, e.dst AS v, CAST(sum(p.c) AS BIGINT) AS c
        |  FROM p1 p JOIN e ON p.v = e.src GROUP BY 1, 2),
        |p3 AS (SELECT p.s, e.dst AS v, CAST(sum(p.c) AS BIGINT) AS c
        |  FROM p2 p JOIN e ON p.v = e.src GROUP BY 1, 2),
        |p4 AS (SELECT p.s, e.dst AS v, CAST(sum(p.c) AS BIGINT) AS c
        |  FROM p3 p JOIN e ON p.v = e.src GROUP BY 1, 2),
        |p5 AS (SELECT p.s, e.dst AS v, CAST(sum(p.c) AS BIGINT) AS c
        |  FROM p4 p JOIN e ON p.v = e.src GROUP BY 1, 2),
        |p6 AS (SELECT p.s, e.dst AS v, CAST(sum(p.c) AS BIGINT) AS c
        |  FROM p5 p JOIN e ON p.v = e.src GROUP BY 1, 2),
        |p7 AS (SELECT p.s, e.dst AS v, CAST(sum(p.c) AS BIGINT) AS c
        |  FROM p6 p JOIN e ON p.v = e.src GROUP BY 1, 2),
        |p8 AS (SELECT p.s, e.dst AS v, CAST(sum(p.c) AS BIGINT) AS c
        |  FROM p7 p JOIN e ON p.v = e.src GROUP BY 1, 2),
        |paths AS MATERIALIZED (
        |  SELECT 1 AS d, * FROM p1 UNION ALL SELECT 2, * FROM p2
        |  UNION ALL SELECT 3, * FROM p3 UNION ALL SELECT 4, * FROM p4
        |  UNION ALL SELECT 5, * FROM p5 UNION ALL SELECT 6, * FROM p6
        |  UNION ALL SELECT 7, * FROM p7 UNION ALL SELECT 8, * FROM p8),
        |dist AS MATERIALIZED (SELECT s, v, CAST(min(d) AS INTEGER) AS dist
        |  FROM paths WHERE s <> v GROUP BY 1, 2),
        |sig AS MATERIALIZED (SELECT p.s, p.v, dist.dist, CAST(sum(p.c) AS BIGINT)
        |    AS sigma
        |  FROM paths p JOIN dist ON p.s = dist.s AND p.v = dist.v
        |    AND p.d = dist.dist
        |  GROUP BY 1, 2, 3),
        |vtx AS (SELECT src AS id FROM e UNION SELECT dst FROM e),
        |bt AS (
        |  SELECT a.v AS id,
        |    sum(CAST(a.sigma AS DOUBLE) * b.sigma / st.sigma) AS btw
        |  FROM sig a
        |  JOIN sig b ON b.s = a.v
        |  JOIN sig st ON st.s = a.s AND st.v = b.v
        |  WHERE a.s <> b.v AND st.dist = a.dist + b.dist
        |  GROUP BY 1)
        |SELECT vtx.id AS node,
        |  round(coalesce(bt.btw, 0), 4) AS betweenness
        |FROM vtx LEFT JOIN bt ON vtx.id = bt.id""".stripMargin) { (s, d) =>
      val t = Tables(s, d)
      val e = t.lineitem.filter(col("l_extendedprice") > 104500)
        .join(t.orders, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(t.customer.select("c_custkey", "c_nationkey")),
          col("o_custkey") === col("c_custkey"))
        .join(broadcast(t.supplier.select("s_suppkey", "s_nationkey")),
          col("l_suppkey") === col("s_suppkey"))
        .select(col("s_nationkey").as("src"), col("c_nationkey").as("dst"))
        .filter(col("src") =!= col("dst"))
        .distinct()
        .localCheckpoint()
      var layer = e.select(col("src").as("s"), col("dst").as("v"),
        lit(1L).as("c"))
      var paths = layer.withColumn("d", lit(1))
      for (k <- 2 to 8) {
        layer = layer.join(broadcast(e), col("v") === col("src"))
          .groupBy(col("s"), col("dst").as("v2"))
          .agg(sum(col("c")).as("c"))
          .withColumnRenamed("v2", "v")
        paths = paths.union(layer.withColumn("d", lit(k)))
        if (k % 4 == 0) { layer = layer.localCheckpoint() }
      }
      val dist = paths.filter(col("s") =!= col("v"))
        .groupBy("s", "v").agg(min(col("d")).cast("int").as("dist"))
      val sig = paths.join(dist.withColumnRenamed("dist", "dmin"),
          Seq("s", "v"))
        .filter(col("d") === col("dmin"))
        .groupBy(col("s"), col("v"), col("dmin").as("dist"))
        .agg(sum(col("c")).as("sigma"))
        .localCheckpoint()
      val vtx = e.select(col("src").as("id"))
        .union(e.select(col("dst").as("id"))).distinct()
      val a = sig.select(col("s").as("sa"), col("v").as("va"),
        col("dist").as("da"), col("sigma").as("siga"))
      val b = sig.select(col("s").as("sb"), col("v").as("vb"),
        col("dist").as("db"), col("sigma").as("sigb"))
      val st = sig.select(col("s").as("ss"), col("v").as("vs"),
        col("dist").as("ds"), col("sigma").as("sigs"))
      val bt = a.join(b, col("sb") === col("va"))
        .filter(col("sa") =!= col("vb"))
        .join(st, col("ss") === col("sa") && col("vs") === col("vb")
          && col("ds") === col("da") + col("db"))
        .groupBy(col("va").as("id"))
        .agg(sum(col("siga").cast("double") * col("sigb") / col("sigs"))
          .as("btw"))
      vtx.join(bt, Seq("id"), "left")
        .select(col("id").as("node"),
          round(coalesce(col("btw"), lit(0)), 4).as("betweenness"))
    },

    // MANN-KENDALL TREND TEST on the daily mean event value — the
    // significance companion of x_theilsen_trend: S from the same
    // calendar-bounded broadcast pair frame, tie-corrected variance from
    // the value histogram, continuity-corrected z.
    QDef("x_mann_kendall",
      """WITH daily AS (
        |  SELECT CAST(ts AS DATE) AS dd, round(avg(value), 6) AS v
        |  FROM events GROUP BY 1),
        |n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM daily),
        |s AS (SELECT CAST(sum(CASE WHEN b.v > a.v THEN 1
        |    WHEN b.v < a.v THEN -1 ELSE 0 END) AS BIGINT) AS s
        |  FROM daily a JOIN daily b ON b.dd > a.dd),
        |ties AS (SELECT coalesce(sum(CAST(t AS DOUBLE) * (t - 1)
        |    * (2 * t + 5)), 0) AS tt
        |  FROM (SELECT CAST(count(*) AS BIGINT) AS t FROM daily
        |        GROUP BY v HAVING count(*) > 1)),
        |k AS (SELECT n.n, s.s,
        |  (CAST(n.n AS DOUBLE) * (n.n - 1) * (2 * n.n + 5) - ties.tt)
        |    / 18 AS var
        |  FROM n, s, ties)
        |SELECT n AS n_days, s AS s_stat,
        |  round(CASE WHEN s > 0 THEN (s - 1) / sqrt(var)
        |    WHEN s < 0 THEN (s + 1) / sqrt(var) ELSE 0 END, 4) AS z
        |FROM k""".stripMargin) { (s, d) =>
      val daily = Tables(s, d).events
        .groupBy(to_date(col("ts")).as("dd"))
        .agg(round(avg(col("value")), 6).as("v"))
      val n = daily.agg(count(lit(1)).as("n"))
      val a = daily.select(col("dd").as("da"), col("v").as("va"))
      val b = daily.select(col("dd").as("db"), col("v").as("vb"))
      val sdf = a.join(broadcast(b), col("db") > col("da"))
        .agg(sum(when(col("vb") > col("va"), 1L)
          .when(col("vb") < col("va"), -1L).otherwise(0L)).as("s"))
      val ties = daily.groupBy("v").agg(count(lit(1)).as("t"))
        .filter(col("t") > 1)
        .agg(coalesce(sum(col("t").cast("double") * (col("t") - lit(1))
          * (lit(2) * col("t") + lit(5))), lit(0.0)).as("tt"))
      val k = n.crossJoin(broadcast(sdf)).crossJoin(broadcast(ties))
        .withColumn("var",
          (col("n").cast("double") * (col("n") - lit(1))
            * (lit(2) * col("n") + lit(5)) - col("tt")) / lit(18))
      k.select(col("n").as("n_days"), col("s").as("s_stat"),
        round(when(col("s") > 0, (col("s") - lit(1)) / sqrt(col("var")))
          .when(col("s") < 0, (col("s") + lit(1)) / sqrt(col("var")))
          .otherwise(lit(0.0)), 4).as("z"))
    },

    // PETTITT CHANGE-POINT TEST on the daily event-count series: the
    // rank-based U_t statistic (kept in exact integers — 2·avg-rank is
    // integral even with ties) maximized over the calendar frame; the
    // first attaining day is the change point, with the standard
    // approximate p-value.
    QDef("x_pettitt",
      """WITH daily AS (
        |  SELECT CAST(ts AS DATE) AS dd, CAST(count(*) AS DOUBLE) AS c
        |  FROM events GROUP BY 1),
        |n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM daily),
        |vh AS (SELECT c AS val, CAST(count(*) AS BIGINT) AS cnt
        |  FROM daily GROUP BY 1),
        |rk AS (SELECT val, cnt,
        |  CAST(coalesce(sum(cnt) OVER (ORDER BY val
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |    AS BIGINT) AS below
        |  FROM vh),
        |r AS (SELECT daily.dd,
        |  2 * rk.below + rk.cnt + 1 AS r2
        |  FROM daily JOIN rk ON daily.c = rk.val),
        |u AS (SELECT dd,
        |  CAST(sum(r2) OVER (ORDER BY dd) AS BIGINT)
        |    - CAST(row_number() OVER (ORDER BY dd) AS BIGINT) * (n.n + 1)
        |    AS ut
        |  FROM r, n),
        |k AS (SELECT max(abs(ut)) AS kst FROM u),
        |cp AS (SELECT min(u.dd) AS change_day FROM u, k
        |  WHERE abs(u.ut) = k.kst)
        |SELECT n.n AS n_days, k.kst AS k_stat, cp.change_day,
        |  round(2 * exp(-6.0e0 * k.kst * k.kst
        |    / (CAST(n.n AS DOUBLE) * n.n * n.n
        |       + CAST(n.n AS DOUBLE) * n.n)), 6) AS p_approx
        |FROM n, k, cp""".stripMargin) { (s, d) =>
      val daily = Tables(s, d).events
        .groupBy(to_date(col("ts")).as("dd"))
        .agg(count(lit(1)).cast("double").as("c"))
      val n = daily.agg(count(lit(1)).as("n"))
      val vh = daily.groupBy(col("c").as("val"))
        .agg(count(lit(1)).as("cnt"))
      val wBelow = Window.orderBy("val")
        .rowsBetween(Window.unboundedPreceding, -1)
      val rk = vh.withColumn("below",
        coalesce(sum(col("cnt")).over(wBelow), lit(0L)))
      val r = daily.join(rk, col("c") === col("val"))
        .select(col("dd"),
          (lit(2) * col("below") + col("cnt") + lit(1)).as("r2"))
      val wPre = Window.orderBy("dd")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val u = r.crossJoin(broadcast(n))
        .withColumn("ut", sum(col("r2")).over(wPre)
          - row_number().over(Window.orderBy("dd")).cast("bigint")
            * (col("n") + lit(1)))
      val k = u.agg(max(abs(col("ut"))).as("kst"))
      val cp = u.crossJoin(broadcast(k))
        .filter(abs(col("ut")) === col("kst"))
        .agg(min(col("dd")).as("change_day"))
      n.crossJoin(broadcast(k)).crossJoin(broadcast(cp))
        .select(col("n").as("n_days"), col("kst").as("k_stat"),
          col("change_day"),
          round(lit(2) * exp(lit(-6.0) * col("kst") * col("kst")
            / (col("n").cast("double") * col("n") * col("n")
               + col("n").cast("double") * col("n"))), 6).as("p_approx"))
    },

    // MODE / GEOMETRIC / HARMONIC descriptive statistics of quantities
    // per return flag — the descriptive completeness row: mode from the
    // value-domain-bounded (flag, quantity) histogram (tie → smallest
    // value, deterministic), geometric and harmonic means from one
    // log/reciprocal aggregate (quantities ≥ 1), midrange from min/max.
    QDef("x_mode_stats",
      """WITH h AS (SELECT l_returnflag AS g, l_quantity AS q,
        |  CAST(count(*) AS BIGINT) AS c
        |  FROM lineitem GROUP BY 1, 2),
        |mx AS (SELECT g, max(c) AS mc FROM h GROUP BY 1),
        |md AS (SELECT h.g, min(h.q) AS mode_q
        |  FROM h JOIN mx ON h.g = mx.g AND h.c = mx.mc GROUP BY 1),
        |st AS (SELECT l_returnflag AS g, CAST(count(*) AS BIGINT) AS n,
        |  exp(avg(ln(l_quantity))) AS geo,
        |  count(*) / sum(1.0e0 / l_quantity) AS harm,
        |  (min(l_quantity) + max(l_quantity)) / 2 AS midrange
        |  FROM lineitem GROUP BY 1)
        |SELECT st.g AS flag, st.n, md.mode_q,
        |  round(st.geo, 4) AS geo_mean, round(st.harm, 4) AS harm_mean,
        |  st.midrange
        |FROM st JOIN md ON st.g = md.g""".stripMargin) { (s, d) =>
      val li = Tables(s, d).lineitem
      val h = li.groupBy(col("l_returnflag").as("g"),
          col("l_quantity").as("q"))
        .agg(count(lit(1)).as("c"))
      val mx = h.groupBy("g").agg(max(col("c")).as("mc"))
      val md = h.join(broadcast(mx), Seq("g"))
        .filter(col("c") === col("mc"))
        .groupBy("g").agg(min(col("q")).as("mode_q"))
      val st = li.groupBy(col("l_returnflag").as("g"))
        .agg(count(lit(1)).as("n"),
          exp(avg(log(col("l_quantity")))).as("geo"),
          (count(lit(1)) / sum(lit(1.0) / col("l_quantity"))).as("harm"),
          ((min(col("l_quantity")) + max(col("l_quantity"))) / lit(2))
            .as("midrange"))
      st.join(md, "g")
        .select(col("g").as("flag"), col("n"), col("mode_q"),
          round(col("geo"), 4).as("geo_mean"),
          round(col("harm"), 4).as("harm_mean"), col("midrange"))
    },

    // LORENZ CURVE DECILES of customer spend: cumulative spend share per
    // ascending-spend decile — the curve behind x_gini, through the
    // x_ntile_deciles closed form (BinnedRank, no global window) with
    // shares released from exact integer cents and the cumulative step
    // from a triangular 10-row join.
    QDef("x_lorenz_deciles",
      """WITH spend AS (
        |  SELECT o_custkey, round(sum(o_totalprice), 2) AS spend
        |  FROM orders GROUP BY 1),
        |d AS (SELECT o_custkey, spend,
        |  CAST(ntile(10) OVER (ORDER BY spend, o_custkey) AS INT) AS decile
        |  FROM spend),
        |t AS (SELECT decile, CAST(count(*) AS BIGINT) AS customers,
        |  CAST(sum(CAST(round(spend * 100) AS BIGINT)) AS BIGINT) AS cents
        |  FROM d GROUP BY 1),
        |tot AS (SELECT CAST(sum(cents) AS BIGINT) AS tc FROM t),
        |c AS (SELECT a.decile, a.customers, a.cents,
        |  CAST(sum(b.cents) AS BIGINT) AS cum_cents
        |  FROM t a JOIN t b ON b.decile <= a.decile GROUP BY 1, 2, 3)
        |SELECT c.decile, c.customers,
        |  round(c.cents / CAST(tot.tc AS DOUBLE), 6) AS spend_share,
        |  round(c.cum_cents / CAST(tot.tc AS DOUBLE), 6) AS cum_share
        |FROM c, tot""".stripMargin) { (s, d) =>
      val spend = Tables(s, d).orders.groupBy("o_custkey")
        .agg(round(sum(col("o_totalprice")), 2).as("spend"))
      val ranked = BinnedRank.belowAndN(spend, Seq.empty,
          floor(col("spend") / lit(5000)).cast("bigint"),
          Seq(col("spend"), col("o_custkey")), lit(1L))
        .withColumn("r", col("below") + lit(1L))
      val sSize = floor(col("n") / lit(10.0))
      val bRem = col("n") - sSize * lit(10.0)
      val cutoff = bRem * (sSize + lit(1.0))
      val decile = when(col("r") <= cutoff,
          floor((col("r") - lit(1.0)) / (sSize + lit(1.0))) + lit(1.0))
        .otherwise(lit(1.0) + bRem
          + floor((col("r") - cutoff - lit(1.0)) / greatest(sSize, lit(1.0))))
        .cast("int")
      val t = ranked.withColumn("decile", decile)
        .groupBy("decile")
        .agg(count(lit(1)).as("customers"),
          sum(round(col("spend") * 100).cast("bigint")).as("cents"))
      val tot = t.agg(sum(col("cents")).as("tc"))
      val a = t.select(col("decile"), col("customers"), col("cents"))
      val b = t.select(col("decile").as("db"), col("cents").as("cb"))
      a.join(broadcast(b), col("db") <= col("decile"))
        .groupBy("decile", "customers", "cents")
        .agg(sum(col("cb")).as("cum_cents"))
        .crossJoin(broadcast(tot))
        .select(col("decile"), col("customers"),
          round(col("cents") / col("tc").cast("double"), 6).as("spend_share"),
          round(col("cum_cents") / col("tc").cast("double"), 6)
            .as("cum_share"))
    }
  )
}
