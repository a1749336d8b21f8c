package graft.queries

import graft.{QDef, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-35 batch: errors-in-variables and outlier machinery — Deming
  * regression, HBOS (histogram-based outlier score), Mahalanobis
  * distance outliers, Dirichlet concentration (method of moments) of the
  * daily event-type mix, personalized PageRank, and Kendall's W
  * concordance across segment rankings.
  *
  * Scale posture: one grouped/moment corpus pass each; outlier scoring
  * folds the bounded histograms/precision matrix back into a scan-local
  * expression (no second shuffle); iterative PPR runs on the collected
  * 25-vertex trade graph (pinned-training pattern); rankings are
  * segment-partitioned windows, never global.
  */
object R35Ops {

  // ---- Deming regression ----

  /** Deming (errors-in-both-variables, λ = 1) regression as ONE portable
    * SQL text — oracle of `x_deming` and whole query of the
    * `x_sql_deming` twin. Closed form on the snapped moment frame:
    * b = (s_yy − s_xx + √((s_yy − s_xx)² + 4 s_xy²)) / (2 s_xy). */
  private[queries] val DemingSql =
    """WITH m AS (SELECT
      |  round(var_samp(l_quantity), 6) AS sxx,
      |  round(var_samp(l_extendedprice / 1000.0e0), 6) AS syy,
      |  round(covar_samp(l_quantity, l_extendedprice / 1000.0e0), 6)
      |    AS sxy,
      |  round(avg(l_quantity), 6) AS mx,
      |  round(avg(l_extendedprice / 1000.0e0), 6) AS my,
      |  CAST(count(*) AS BIGINT) AS n
      |  FROM lineitem),
      |b AS (SELECT n, mx, my, sxy, sxx,
      |  (syy - sxx + sqrt((syy - sxx) * (syy - sxx) + 4 * sxy * sxy))
      |    / (2 * sxy) AS bd
      |  FROM m)
      |SELECT n, round(bd, 6) AS slope_deming,
      |  round(my - bd * mx, 4) AS intercept_deming,
      |  round(sxy / sxx, 6) AS slope_ols
      |FROM b""".stripMargin

  // ---- HBOS: histogram-based outlier score ----

  /** HBOS as ONE portable SQL text — oracle of `x_hbos` and whole query
    * of the `x_sql_hbos` twin. Three per-feature histograms (25k$ price
    * bins / month / priority — all bounded domains), score =
    * Σ_f −ln P(bin_f) folded scan-local, top-10 by the ROUNDED score
    * with the order-key tiebreak. */
  private[queries] val HbosSql =
    """WITH base AS (SELECT o_orderkey,
      |  CAST(floor(o_totalprice / 25000) AS BIGINT) AS pb,
      |  month(o_orderdate) AS mo, o_orderpriority AS pri
      |  FROM orders),
      |tot AS (SELECT CAST(count(*) AS BIGINT) AS n FROM base),
      |hp AS (SELECT pb, CAST(count(*) AS BIGINT) AS c FROM base
      |  GROUP BY 1),
      |hm AS (SELECT mo, CAST(count(*) AS BIGINT) AS c FROM base
      |  GROUP BY 1),
      |hr AS (SELECT pri, CAST(count(*) AS BIGINT) AS c FROM base
      |  GROUP BY 1),
      |scored AS (SELECT base.o_orderkey,
      |  round(-ln(hp.c / CAST(tot.n AS DOUBLE))
      |    - ln(hm.c / CAST(tot.n AS DOUBLE))
      |    - ln(hr.c / CAST(tot.n AS DOUBLE)), 6) AS score
      |  FROM base
      |  JOIN hp ON hp.pb = base.pb
      |  JOIN hm ON hm.mo = base.mo
      |  JOIN hr ON hr.pri = base.pri
      |  CROSS JOIN tot)
      |SELECT o_orderkey, score FROM scored
      |ORDER BY score DESC, o_orderkey LIMIT 10""".stripMargin

  // ---- Mahalanobis outliers ----

  /** Mahalanobis oracle: snapped 3×3 covariance of (quantity,
    * 100·discount, 100·tax) → closed adjugate inverse → d² scan-local →
    * top-10 by the rounded d² with the (orderkey, linenumber) tiebreak. */
  private[queries] val MahalanobisSql =
    """WITH m AS (SELECT
      |  round(avg(l_quantity), 6) AS m1,
      |  round(avg(l_discount * 100), 6) AS m2,
      |  round(avg(l_tax * 100), 6) AS m3,
      |  round(var_samp(l_quantity), 6) AS s11,
      |  round(var_samp(l_discount * 100), 6) AS s22,
      |  round(var_samp(l_tax * 100), 6) AS s33,
      |  round(covar_samp(l_quantity, l_discount * 100), 6) AS s12,
      |  round(covar_samp(l_quantity, l_tax * 100), 6) AS s13,
      |  round(covar_samp(l_discount * 100, l_tax * 100), 6) AS s23
      |  FROM lineitem),
      |inv AS (SELECT m1, m2, m3,
      |  s11 * (s22 * s33 - s23 * s23) - s12 * (s12 * s33 - s23 * s13)
      |    + s13 * (s12 * s23 - s22 * s13) AS det,
      |  s22 * s33 - s23 * s23 AS a11, s13 * s23 - s12 * s33 AS a12,
      |  s12 * s23 - s13 * s22 AS a13, s11 * s33 - s13 * s13 AS a22,
      |  s12 * s13 - s11 * s23 AS a23, s11 * s22 - s12 * s12 AS a33
      |  FROM m),
      |sc AS (SELECT l_orderkey, l_linenumber,
      |  round((
      |    (l_quantity - m1) * (l_quantity - m1) * a11
      |    + (l_discount * 100 - m2) * (l_discount * 100 - m2) * a22
      |    + (l_tax * 100 - m3) * (l_tax * 100 - m3) * a33
      |    + 2 * (l_quantity - m1) * (l_discount * 100 - m2) * a12
      |    + 2 * (l_quantity - m1) * (l_tax * 100 - m3) * a13
      |    + 2 * (l_discount * 100 - m2) * (l_tax * 100 - m3) * a23
      |  ) / det, 6) AS d2
      |  FROM lineitem CROSS JOIN inv)
      |SELECT l_orderkey, l_linenumber, d2 FROM sc
      |ORDER BY d2 DESC, l_orderkey, l_linenumber LIMIT 10""".stripMargin

  // ---- Dirichlet concentration (method of moments) ----

  /** Dirichlet-MoM oracle: the daily event-type mix as draws from a
    * Dirichlet — per-type share moments over the dense (type × day)
    * spine (bounded × calendar-bounded, so the spine is KBs; zero cells
    * matter and are materialized HERE, unlike the corpus-scale
    * zero-inflation spine which is recovered algebraically), α₀ from the
    * averaged per-type precision, α_k = m_k·α₀. */
  private[queries] val DirichletSql =
    """WITH dt AS (SELECT CAST(date_trunc('day', ts) AS DATE) AS d,
      |  event_type AS t, CAST(count(*) AS BIGINT) AS c
      |  FROM events GROUP BY 1, 2),
      |spine AS (SELECT dd.d, tt.t FROM
      |  (SELECT DISTINCT d FROM dt) dd
      |  CROSS JOIN (SELECT DISTINCT t FROM dt) tt),
      |cells AS (SELECT spine.d, spine.t, coalesce(dt.c, 0) AS c
      |  FROM spine LEFT JOIN dt ON dt.d = spine.d AND dt.t = spine.t),
      |tot AS (SELECT d, CAST(sum(c) AS BIGINT) AS n FROM cells
      |  GROUP BY 1),
      |sh AS (SELECT cells.t, cells.c / CAST(tot.n AS DOUBLE) AS s
      |  FROM cells JOIN tot ON tot.d = cells.d WHERE tot.n > 0),
      |ms AS (SELECT t, round(avg(s), 6) AS m, round(var_samp(s), 6) AS v
      |  FROM sh GROUP BY 1),
      |a0 AS (SELECT round(avg(m * (1 - m) / v - 1), 6) AS alpha0
      |  FROM ms WHERE v > 0)
      |SELECT ms.t AS event_type, ms.m AS mean_share, ms.v AS var_share,
      |  round(ms.m * a0.alpha0, 4) AS alpha
      |FROM ms CROSS JOIN a0""".stripMargin

  // ---- personalized PageRank ----

  /** PPR oracle (DuckDB dialect, MATERIALIZED — the corpus edge chain is
    * read by every round): teleport-to-seed PageRank, d=0.85, 10
    * unrolled rounds on the 25-vertex trade graph, 9 dp snap per round.
    * Seed = the minimum vertex PRESENT in the graph (a fixed nation id
    * may drop out of the sparse sf0.001 graph, degenerating every score
    * to zero). */
  private[queries] val PprSql = {
    val rounds = (1 to 10).map { i =>
      s"""pi$i AS MATERIALIZED (
         |  SELECT nodes.u,
         |    round((CASE WHEN nodes.u = sd.s THEN 0.15e0 ELSE 0 END)
         |      + 0.85e0 * coalesce(sum(pi${i - 1}.pr / deg.deg), 0), 9)
         |      AS pr
         |  FROM nodes
         |  CROSS JOIN sd
         |  LEFT JOIN e ON e.v = nodes.u
         |  LEFT JOIN pi${i - 1} ON pi${i - 1}.u = e.u
         |  LEFT JOIN deg ON deg.u = e.u
         |  GROUP BY nodes.u, sd.s)""".stripMargin
    }.mkString(",\n")
    s"""WITH ${R34Ops.tradeEdgeCtes(mat = true)},
       |nodes AS MATERIALIZED (SELECT DISTINCT u FROM e),
       |sd AS MATERIALIZED (SELECT min(u) AS s FROM nodes),
       |pi0 AS MATERIALIZED (SELECT u,
       |  CASE WHEN u = (SELECT s FROM sd) THEN 1.0e0 ELSE 0.0e0 END AS pr
       |  FROM nodes),
       |$rounds
       |SELECT u AS nation, round(pr, 6) AS ppr FROM pi10""".stripMargin
  }

  // ---- Kendall's W ----

  /** Kendall's coefficient of concordance as ONE portable SQL text —
    * oracle of `x_kendall_w` and whole query of the `x_sql_kendallw`
    * twin. Five segment "raters" rank the 25 brands by revenue
    * (segment-partitioned row_numbers — never a global window);
    * W = 12·ΣD² / (m²(n³−n)). */
  private[queries] val KendallWSql =
    """WITH rev AS (
      |  SELECT c.c_mktsegment AS g, p.p_brand AS b,
      |    sum(l.l_extendedprice) AS rev
      |  FROM lineitem l
      |  JOIN orders o ON l.l_orderkey = o.o_orderkey
      |  JOIN customer c ON o.o_custkey = c.c_custkey
      |  JOIN part p ON l.l_partkey = p.p_partkey
      |  GROUP BY 1, 2),
      |rk AS (SELECT g, b,
      |  CAST(row_number() OVER (PARTITION BY g ORDER BY rev DESC, b)
      |    AS BIGINT) AS r
      |  FROM rev),
      |rs AS (SELECT b, CAST(sum(r) AS BIGINT) AS rsum,
      |  CAST(count(*) AS BIGINT) AS m FROM rk GROUP BY 1),
      |dims AS (SELECT CAST(count(*) AS BIGINT) AS n, max(m) AS m FROM rs),
      |w AS (SELECT dims.n, dims.m,
      |  sum((rs.rsum - dims.m * (dims.n + 1) / 2.0e0)
      |    * (rs.rsum - dims.m * (dims.n + 1) / 2.0e0)) AS ssd
      |  FROM rs CROSS JOIN dims GROUP BY dims.n, dims.m)
      |SELECT n AS n_items, m AS m_raters,
      |  round(12 * ssd / (m * m * (CAST(n AS DOUBLE) * n * n - n)), 6)
      |    AS w,
      |  round(m * (n - 1) * 12 * ssd
      |    / (m * m * (CAST(n AS DOUBLE) * n * n - n)), 4) AS chi2
      |FROM w""".stripMargin

  private def snap9(v: Double): Double =
    BigDecimal(v).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble

  val defs: Seq[QDef] = Seq(

    // DEMING REGRESSION: the errors-in-both-variables line (λ = 1) —
    // what OLS should have been when x is measured with noise too. ONE
    // moment pass, closed eigen-form on the snapped 1-row frame.
    QDef("x_deming", DemingSql) { (s, d) =>
      val m = Tables(s, d).lineitem.agg(
        round(var_samp(col("l_quantity")), 6).as("sxx"),
        round(var_samp(col("l_extendedprice") / 1000.0), 6).as("syy"),
        round(covar_samp(col("l_quantity"),
          col("l_extendedprice") / 1000.0), 6).as("sxy"),
        round(avg(col("l_quantity")), 6).as("mx"),
        round(avg(col("l_extendedprice") / 1000.0), 6).as("my"),
        count(lit(1)).as("n"))
      val bd = (col("syy") - col("sxx")
        + sqrt((col("syy") - col("sxx")) * (col("syy") - col("sxx"))
          + lit(4) * col("sxy") * col("sxy"))) / (lit(2) * col("sxy"))
      m.select(col("n"), round(bd, 6).as("slope_deming"),
        round(col("my") - bd * col("mx"), 4).as("intercept_deming"),
        round(col("sxy") / col("sxx"), 6).as("slope_ols"))
    },

    // Deming through Spark's SQL parser, same shared text.
    QDef("x_sql_deming", DemingSql) { (s, d) =>
      SqlSurface.viewed(s, d, "lineitem")
      s.sql(DemingSql)
    },

    // HBOS: the O(n) histogram outlier detector — rare (price-bin,
    // month, priority) combinations score high. Three bounded-domain
    // histograms fold back scan-local (AQE broadcasts them); top-10 by
    // the ROUNDED score with a full key tiebreak.
    QDef("x_hbos", HbosSql) { (s, d) =>
      val base = Tables(s, d).orders.select(col("o_orderkey"),
        floor(col("o_totalprice") / 25000).cast("bigint").as("pb"),
        month(col("o_orderdate")).as("mo"),
        col("o_orderpriority").as("pri"))
      val tot = base.agg(count(lit(1)).as("n"))
      val hp = base.groupBy("pb").agg(count(lit(1)).as("cp"))
      val hm = base.groupBy("mo").agg(count(lit(1)).as("cm"))
      val hr = base.groupBy("pri").agg(count(lit(1)).as("cr"))
      base.join(hp, Seq("pb")).join(hm, Seq("mo")).join(hr, Seq("pri"))
        .crossJoin(broadcast(tot))
        .select(col("o_orderkey"),
          round(-log(col("cp") / col("n").cast("double"))
            - log(col("cm") / col("n").cast("double"))
            - log(col("cr") / col("n").cast("double")), 6).as("score"))
        .orderBy(col("score").desc, col("o_orderkey"))
        .limit(10)
    },

    // HBOS through Spark's SQL parser, same shared text.
    QDef("x_sql_hbos", HbosSql) { (s, d) =>
      SqlSurface.viewed(s, d, "orders")
      s.sql(HbosSql)
    },

    // MAHALANOBIS OUTLIERS: covariance-aware multivariate distance on
    // (quantity, discount, tax). ONE snapped moment pass → closed 3×3
    // adjugate inverse → d² entirely scan-local → bounded top-10.
    QDef("x_mahalanobis", MahalanobisSql) { (s, d) =>
      val li = Tables(s, d).lineitem
      val x2 = col("l_discount") * 100
      val x3 = col("l_tax") * 100
      val m = li.agg(
        round(avg(col("l_quantity")), 6).as("m1"),
        round(avg(x2), 6).as("m2"), round(avg(x3), 6).as("m3"),
        round(var_samp(col("l_quantity")), 6).as("s11"),
        round(var_samp(x2), 6).as("s22"), round(var_samp(x3), 6).as("s33"),
        round(covar_samp(col("l_quantity"), x2), 6).as("s12"),
        round(covar_samp(col("l_quantity"), x3), 6).as("s13"),
        round(covar_samp(x2, x3), 6).as("s23"))
      val inv = m.select(col("m1"), col("m2"), col("m3"),
        (col("s11") * (col("s22") * col("s33") - col("s23") * col("s23"))
          - col("s12") * (col("s12") * col("s33") - col("s23") * col("s13"))
          + col("s13") * (col("s12") * col("s23") - col("s22") * col("s13")))
          .as("det"),
        (col("s22") * col("s33") - col("s23") * col("s23")).as("a11"),
        (col("s13") * col("s23") - col("s12") * col("s33")).as("a12"),
        (col("s12") * col("s23") - col("s13") * col("s22")).as("a13"),
        (col("s11") * col("s33") - col("s13") * col("s13")).as("a22"),
        (col("s12") * col("s13") - col("s11") * col("s23")).as("a23"),
        (col("s11") * col("s22") - col("s12") * col("s12")).as("a33"))
      val d1 = col("l_quantity") - col("m1")
      val d2c = x2 - col("m2")
      val d3 = x3 - col("m3")
      li.crossJoin(broadcast(inv))
        .select(col("l_orderkey"), col("l_linenumber"),
          round((d1 * d1 * col("a11") + d2c * d2c * col("a22")
            + d3 * d3 * col("a33") + lit(2) * d1 * d2c * col("a12")
            + lit(2) * d1 * d3 * col("a13")
            + lit(2) * d2c * d3 * col("a23")) / col("det"), 6).as("d2"))
        .orderBy(col("d2").desc, col("l_orderkey"), col("l_linenumber"))
        .limit(10)
    },

    // DIRICHLET CONCENTRATION: how peaked is the daily event-type mix —
    // the method-of-moments α for source-mixing decisions. Dense
    // (type × day) spine is bounded × calendar-bounded (zero cells
    // matter and are cheap HERE, unlike corpus-scale spines); the rest
    // is 5-row algebra.
    QDef("x_dirichlet_mom", DirichletSql) { (s, d) =>
      val dt = Tables(s, d).events
        .groupBy(date_trunc("day", col("ts")).cast("date").as("d"),
          col("event_type").as("t"))
        .agg(count(lit(1)).as("c"))
      val days = dt.select("d").distinct()
      val types = dt.select("t").distinct()
      val cells = days.crossJoin(broadcast(types))
        .join(dt, Seq("d", "t"), "left")
        .select(col("d"), col("t"), coalesce(col("c"), lit(0L)).as("c"))
      val tot = cells.groupBy("d").agg(sum(col("c")).as("n"))
      val sh = cells.join(tot, Seq("d")).filter(col("n") > 0)
        .select(col("t"), (col("c") / col("n").cast("double")).as("s"))
      val ms = sh.groupBy("t").agg(round(avg(col("s")), 6).as("m"),
        round(var_samp(col("s")), 6).as("v"))
      val a0 = ms.filter(col("v") > 0)
        .agg(round(avg(col("m") * (lit(1) - col("m")) / col("v") - 1), 6)
          .as("alpha0"))
      ms.crossJoin(broadcast(a0))
        .select(col("t").as("event_type"), col("m").as("mean_share"),
          col("v").as("var_share"),
          round(col("m") * col("alpha0"), 4).as("alpha"))
    },

    // PERSONALIZED PAGERANK: teleport-to-seed (nation 0) importance on
    // the high-value trade graph — "who matters from THIS vertex's point
    // of view". Corpus work = the one distinct-edge aggregate; 10 MM
    // rounds run driver-side on the collected 25-vertex frame (the
    // Bradley-Terry posture), 9 dp snap per round.
    QDef("x_ppr", PprSql) { (s, d) =>
      import s.implicits._
      val t = Tables(s, d)
      val e0 = t.lineitem.filter(col("l_extendedprice") > 104500)
        .join(t.orders, col("l_orderkey") === col("o_orderkey"))
        .join(t.customer, col("o_custkey") === col("c_custkey"))
        .join(t.supplier, col("l_suppkey") === col("s_suppkey"))
        .select(col("c_nationkey").cast("int").as("u"),
          col("s_nationkey").cast("int").as("v")).distinct()
      val edges = e0.union(e0.select(col("v").as("u"), col("u").as("v")))
        .distinct().filter(col("u") =!= col("v"))
        .collect().map(r => (r.getInt(0), r.getInt(1)))
      val deg = edges.groupBy(_._1).map { case (u, es) => u -> es.length }
      val nodes = edges.map(_._1).distinct.sorted
      val seed = nodes.min
      var pr = nodes.map(u => u -> (if (u == seed) 1.0 else 0.0)).toMap
      for (_ <- 1 to 10) {
        pr = nodes.map { u =>
          val in = edges.filter(_._2 == u)
            .map { case (src, _) => pr(src) / deg(src) }.sum
          u -> snap9((if (u == seed) 0.15 else 0.0) + 0.85 * in)
        }.toMap
      }
      nodes.map(u => (u, pr(u))).toSeq.toDF("nation", "pr")
        .select(col("nation"), round(col("pr"), 6).as("ppr"))
    },

    // KENDALL'S W: do the five market segments agree on the brand
    // revenue ranking. Segment-partitioned row_number ranks (never a
    // global window), rank sums on the 25-brand frame, closed W + the
    // χ² approximation.
    QDef("x_kendall_w", KendallWSql) { (s, d) =>
      val t = Tables(s, d)
      val rev = t.lineitem
        .join(t.orders, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(t.customer.select("c_custkey", "c_mktsegment")),
          col("o_custkey") === col("c_custkey"))
        .join(t.part.select("p_partkey", "p_brand"),
          col("l_partkey") === col("p_partkey"))
        .groupBy(col("c_mktsegment").as("g"), col("p_brand").as("b"))
        .agg(sum(col("l_extendedprice")).as("rev"))
      val rk = rev.select(col("g"), col("b"),
        row_number().over(Window.partitionBy("g")
          .orderBy(col("rev").desc, col("b"))).cast("long").as("r"))
      val rs = rk.groupBy("b").agg(sum(col("r")).as("rsum"),
        count(lit(1)).as("mb"))
      val dims = rs.agg(count(lit(1)).as("n"), max(col("mb")).as("m"))
      val w = rs.select("b", "rsum").crossJoin(broadcast(dims))
        .groupBy("n", "m")
        .agg(sum((col("rsum") - col("m") * (col("n") + 1) / lit(2.0))
          * (col("rsum") - col("m") * (col("n") + 1) / lit(2.0)))
          .as("ssd"))
      w.select(col("n").as("n_items"), col("m").as("m_raters"),
        round(lit(12) * col("ssd")
          / (col("m") * col("m")
            * (col("n").cast("double") * col("n") * col("n") - col("n"))),
          6).as("w"),
        round(col("m") * (col("n") - 1) * lit(12) * col("ssd")
          / (col("m") * col("m")
            * (col("n").cast("double") * col("n") * col("n") - col("n"))),
          4).as("chi2"))
    },

    // Kendall's W through Spark's SQL parser, same shared text.
    QDef("x_sql_kendallw", KendallWSql) { (s, d) =>
      SqlSurface.viewed(s, d, "lineitem", "orders", "customer", "part")
      s.sql(KendallWSql)
    }
  )
}
