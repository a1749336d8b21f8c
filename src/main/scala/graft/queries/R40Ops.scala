package graft.queries

import graft.{QDef, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-40 batch: time-series stationarity and complexity (KPSS,
  * sample entropy, spectral entropy of the periodogram), ordinal
  * association (Goodman-Kruskal gamma / tau-b / tau-c / Somers' D from
  * one contingency collapse), the Cochran-Armitage trend test, the
  * Ansari-Bradley rank scale test, and Katz centrality on the nation
  * trade graph.
  *
  * Scale posture: every series op collapses the corpus to the
  * calendar-bounded daily frame in ONE aggregate (the x_acf / x_coint
  * class); the ordinal tests collapse to a ≤20-cell contingency or the
  * ≤50-value quantity histogram before any pairwise algebra (pair
  * products in DOUBLE — exact below 2^53, identically rounded above);
  * Katz is the x_ppr posture (one distinct-edge aggregate, 8 driver
  * rounds on the collected ≤25-vertex frame, 9 dp snap per round).
  */
object R40Ops {

  private def snap9(v: Double): Double =
    BigDecimal(v).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** KPSS level-stationarity test as ONE portable text — oracle of
    * `x_kpss` and whole query of the `x_sql_kpss` twin. Demeaned daily
    * order counts (mean snapped 6 dp), partial sums via the running
    * window, Bartlett long-run variance at lag 4 (w_l = 1 − l/5), and
    * η = Σ S_t² / (n² σ̂²_lrv). Calendar-bounded frame throughout. */
  private[queries] val KpssSql =
    """WITH daily AS (
      |  SELECT CAST(o_orderdate AS DATE) AS d, CAST(count(*) AS DOUBLE)
      |    AS y
      |  FROM orders GROUP BY 1),
      |m AS (SELECT round(avg(y), 6) AS my, CAST(count(*) AS BIGINT) AS n
      |  FROM daily),
      |e AS (SELECT daily.d, daily.y - m.my AS e, m.n AS n
      |  FROM daily CROSS JOIN m),
      |s AS (SELECT d, e, n,
      |  sum(e) OVER (ORDER BY d
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS s,
      |  lag(e, 1) OVER (ORDER BY d) AS e1,
      |  lag(e, 2) OVER (ORDER BY d) AS e2,
      |  lag(e, 3) OVER (ORDER BY d) AS e3,
      |  lag(e, 4) OVER (ORDER BY d) AS e4
      |  FROM e),
      |g AS (SELECT max(n) AS n,
      |  sum(e * e) AS g0,
      |  sum(e * coalesce(e1, 0.0e0)) AS g1,
      |  sum(e * coalesce(e2, 0.0e0)) AS g2,
      |  sum(e * coalesce(e3, 0.0e0)) AS g3,
      |  sum(e * coalesce(e4, 0.0e0)) AS g4,
      |  sum(s * s) AS ss
      |  FROM s),
      |f AS (SELECT n, ss,
      |  (g0 + 2 * (0.8e0 * g1 + 0.6e0 * g2 + 0.4e0 * g3 + 0.2e0 * g4)) / n
      |    AS lrv
      |  FROM g)
      |SELECT n AS n_days, round(lrv, 4) AS long_run_var,
      |  round(ss / (CAST(n AS DOUBLE) * n * lrv), 4) AS kpss_stat
      |FROM f""".stripMargin

  /** Sample entropy (m = 2, r = 0.2·σ snapped) of the daily order-count
    * series as ONE portable text — oracle of `x_sample_entropy` and
    * whole query of the `x_sql_sampen` twin. Template index via
    * row_number over the observed calendar (portable where datediff
    * units are not); B / A count Chebyshev-matching template pairs of
    * length 2 / 3 over the i < j half — integer count differences
    * against one shared double radius, so the ≤-membership is
    * float-path-free. */
  private[queries] val SampEnSql =
    """WITH daily AS (
      |  SELECT CAST(o_orderdate AS DATE) AS d, CAST(count(*) AS DOUBLE)
      |    AS c
      |  FROM orders GROUP BY 1),
      |r AS (SELECT 0.2e0 * round(stddev_samp(c), 6) AS r FROM daily),
      |pts AS (SELECT row_number() OVER (ORDER BY d) AS i, c FROM daily),
      |tpl AS (SELECT i, c AS x1,
      |  lead(c, 1) OVER (ORDER BY i) AS x2,
      |  lead(c, 2) OVER (ORDER BY i) AS x3
      |  FROM pts),
      |pr AS (SELECT /*+ BROADCAST(b) */
      |  CAST(sum(CASE WHEN a.x2 IS NOT NULL AND b.x2 IS NOT NULL
      |    AND greatest(abs(a.x1 - b.x1), abs(a.x2 - b.x2)) <= r.r
      |    THEN 1 ELSE 0 END) AS BIGINT) AS bm,
      |  CAST(sum(CASE WHEN a.x3 IS NOT NULL AND b.x3 IS NOT NULL
      |    AND greatest(abs(a.x1 - b.x1), abs(a.x2 - b.x2),
      |      abs(a.x3 - b.x3)) <= r.r
      |    THEN 1 ELSE 0 END) AS BIGINT) AS am
      |  FROM tpl a JOIN tpl b ON b.i > a.i CROSS JOIN r)
      |SELECT bm AS template_pairs_m2, am AS template_pairs_m3,
      |  CASE WHEN am > 0
      |    THEN round(-ln(CAST(am AS DOUBLE) / bm), 6) END AS sampen
      |FROM pr""".stripMargin

  /** Spectral entropy + flatness over the 2 dp-snapped periodogram of
    * the daily order counts as ONE portable text — oracle of
    * `x_spectral_entropy` and whole query of the `x_sql_spectral` twin.
    * Powers at candidate periods 2-14 are rounded to 2 dp FIRST (the
    * x_periodogram convention — absorbs cos/sin libm ulps), then the
    * entropy/flatness algebra runs on the 13-row snapped frame, so both
    * engines share the exact same inputs. */
  private[queries] val SpectralSql = {
    val spine = (2 to 14).map(t =>
      if (t == 2) s"SELECT $t AS t" else s"UNION ALL SELECT $t")
      .mkString(" ")
    s"""WITH daily AS (
       |  SELECT CAST(o_orderdate AS DATE) AS d, CAST(count(*) AS DOUBLE)
       |    AS c
       |  FROM orders GROUP BY 1),
       |d0 AS (SELECT round(avg(c), 6) AS mc FROM daily),
       |pts AS (SELECT
       |  CAST(row_number() OVER (ORDER BY daily.d) AS BIGINT) - 1 AS i,
       |  daily.c - d0.mc AS cc
       |  FROM daily CROSS JOIN d0),
       |spine AS ($spine),
       |terms AS (SELECT spine.t,
       |  pts.cc * cos(6.283185307179586e0 * pts.i / spine.t) AS ct,
       |  pts.cc * sin(6.283185307179586e0 * pts.i / spine.t) AS st
       |  FROM pts CROSS JOIN spine),
       |pw AS (SELECT t,
       |  round(sum(ct) * sum(ct) + sum(st) * sum(st), 2) AS p
       |  FROM terms GROUP BY 1),
       |tot AS (SELECT sum(p) AS tp, CAST(count(*) AS BIGINT) AS k
       |  FROM pw),
       |sh AS (SELECT pw.t, pw.p / tot.tp AS q, tot.k
       |  FROM pw CROSS JOIN tot WHERE pw.p > 0)
       |SELECT max(k) AS n_periods,
       |  round(-sum(q * ln(q)) / ln(CAST(max(k) AS DOUBLE)), 6)
       |    AS spectral_entropy,
       |  round(exp(avg(ln(q))) / avg(q), 6) AS spectral_flatness
       |FROM sh""".stripMargin
  }

  /** Ordinal association battery as ONE portable text — oracle of
    * `x_ordinal_assoc` and whole query of the `x_sql_ordassoc` twin.
    * Priority rank (1-5) × price bucket (0-3) collapse to ≤20 cells;
    * concordant/discordant pair sums are an ordered cell × cell cross
    * (each unordered pair counted once via strict dominance), tie
    * corrections from the marginals. Pair products in DOUBLE. */
  private[queries] val OrdAssocSql =
    """WITH base AS (SELECT
      |  CAST(substr(o_orderpriority, 1, 1) AS INT) AS s,
      |  CAST(least(CAST(floor(o_totalprice / 100000) AS BIGINT), 3)
      |    AS BIGINT) AS p
      |  FROM orders),
      |cells AS (SELECT s, p, CAST(count(*) AS BIGINT) AS n
      |  FROM base GROUP BY 1, 2),
      |tots AS (SELECT CAST(sum(n) AS BIGINT) AS nn FROM cells),
      |marg_s AS (SELECT s, CAST(sum(n) AS BIGINT) AS r
      |  FROM cells GROUP BY 1),
      |marg_p AS (SELECT p, CAST(sum(n) AS BIGINT) AS c
      |  FROM cells GROUP BY 1),
      |t1 AS (SELECT sum(CAST(r AS DOUBLE) * (r - 1) / 2) AS n1,
      |  CAST(count(*) AS BIGINT) AS ks FROM marg_s),
      |t2 AS (SELECT sum(CAST(c AS DOUBLE) * (c - 1) / 2) AS n2,
      |  CAST(count(*) AS BIGINT) AS kp FROM marg_p),
      |pq AS (SELECT /*+ BROADCAST(b) */
      |  sum(CASE WHEN b.s > a.s AND b.p > a.p
      |    THEN CAST(a.n AS DOUBLE) * b.n ELSE 0.0e0 END) AS pc,
      |  sum(CASE WHEN b.s > a.s AND b.p < a.p
      |    THEN CAST(a.n AS DOUBLE) * b.n ELSE 0.0e0 END) AS qd
      |  FROM cells a CROSS JOIN cells b),
      |f AS (SELECT tots.nn, pq.pc, pq.qd, t1.n1, t2.n2,
      |  CAST(tots.nn AS DOUBLE) * (tots.nn - 1) / 2 AS n0,
      |  least(t1.ks, t2.kp) AS m
      |  FROM pq CROSS JOIN tots CROSS JOIN t1 CROSS JOIN t2)
      |SELECT nn AS n, CAST(pc AS BIGINT) AS concordant,
      |  CAST(qd AS BIGINT) AS discordant,
      |  round((pc - qd) / (pc + qd), 6) AS gamma,
      |  round((pc - qd) / sqrt((n0 - n1) * (n0 - n2)), 6) AS tau_b,
      |  round(2 * m * (pc - qd) / (CAST(nn AS DOUBLE) * nn * (m - 1)), 6)
      |    AS tau_c,
      |  round((pc - qd) / (n0 - n1), 6) AS somers_d
      |FROM f""".stripMargin

  /** Cochran-Armitage trend in proportions as ONE portable text —
    * oracle of `x_cochran_armitage` and whole query of the
    * `x_sql_catrend` twin. Does the fulfilled ('F') share trend across
    * the ordered priorities (scores 1-5)? One contingency collapse,
    * 5-row closed-form Z. */
  private[queries] val CaTrendSql =
    """WITH base AS (SELECT
      |  CAST(substr(o_orderpriority, 1, 1) AS INT) AS s,
      |  CASE WHEN o_orderstatus = 'F' THEN 1.0e0 ELSE 0.0e0 END AS y
      |  FROM orders),
      |g AS (SELECT s, CAST(count(*) AS BIGINT) AS n, sum(y) AS r
      |  FROM base GROUP BY 1),
      |tot AS (SELECT CAST(sum(n) AS BIGINT) AS nn,
      |  sum(r) / sum(n) AS pbar,
      |  sum(CAST(s AS DOUBLE) * r) AS sr,
      |  sum(CAST(s AS DOUBLE) * n) AS sn,
      |  sum(CAST(s AS DOUBLE) * s * n) AS ssn
      |  FROM g)
      |SELECT nn AS n, round(pbar, 6) AS pbar,
      |  round((sr - pbar * sn)
      |    / sqrt(pbar * (1 - pbar) * (ssn - sn * sn / nn)), 4) AS ca_z
      |FROM tot""".stripMargin

  /** Ansari-Bradley scale test as ONE portable text — oracle of
    * `x_ansari_bradley` and whole query of the `x_sql_ansari` twin.
    * Are 'F' and 'O' lineitems equally dispersed in quantity? Pooled
    * AB scores a(r) = min(r, N+1−r) with tie-averaging, computed
    * EXACTLY per tie run via two arithmetic series in integer space on
    * the ≤50-value quantity histogram (the x_brunner_munzel posture —
    * no corpus sort, no interpolation); z from the conditional
    * tie-corrected variance of the linear rank statistic. */
  private[queries] val AnsariSql =
    """WITH base AS (SELECT l_linestatus AS g, CAST(l_quantity AS BIGINT)
      |    AS v
      |  FROM lineitem),
      |h AS (SELECT v,
      |  CAST(sum(CASE WHEN g = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS ca,
      |  CAST(count(*) AS BIGINT) AS c
      |  FROM base GROUP BY 1),
      |cum AS (SELECT v, ca, c,
      |  CAST(coalesce(sum(c) OVER (ORDER BY v
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
      |    AS below,
      |  CAST(sum(c) OVER () AS BIGINT) AS nn,
      |  CAST(sum(ca) OVER () AS BIGINT) AS na
      |  FROM h),
      |sc AS (SELECT v, ca, c, nn, na,
      |  CAST(floor((nn + 1) / 2.0e0) AS BIGINT) AS th,
      |  below + 1 AS lo, below + c AS hi
      |  FROM cum),
      |s2 AS (SELECT v, ca, c, nn, na,
      |  (CASE WHEN least(hi, th) >= lo
      |     THEN CAST(least(hi, th) - lo + 1 AS DOUBLE)
      |       * (lo + least(hi, th)) / 2
      |     ELSE 0.0e0 END)
      |  + (CASE WHEN hi >= greatest(lo, th + 1)
      |     THEN CAST(hi - greatest(lo, th + 1) + 1 AS DOUBLE) * (nn + 1)
      |       - CAST(greatest(lo, th + 1) + hi AS DOUBLE)
      |         * (hi - greatest(lo, th + 1) + 1) / 2
      |     ELSE 0.0e0 END) AS ssum
      |  FROM sc),
      |ag AS (SELECT max(nn) AS nn, max(na) AS na,
      |  sum(ca * ssum / c) AS w,
      |  sum(ssum) AS sa,
      |  sum(ssum * ssum / c) AS sa2
      |  FROM s2)
      |SELECT nn AS n, na AS n_f, round(w, 4) AS ab_w,
      |  round(na * sa / nn, 4) AS e_w,
      |  round((w - na * sa / nn)
      |    / sqrt(CAST(na AS DOUBLE) * (nn - na) * (nn * sa2 - sa * sa)
      |      / (CAST(nn AS DOUBLE) * nn * (nn - 1))), 4) AS ab_z
      |FROM ag""".stripMargin

  /** Katz centrality oracle: x⁰ = 1; xⁱ(u) = 1 + α Σ_{v→u} xⁱ⁻¹(v),
    * α = 0.1, 8 rounds, 9 dp snap per round — the x_ppr shape on the
    * same trade-edge frame (every multiply-referenced CTE MATERIALIZED
    * for DuckDB's inliner). */
  private[queries] val KatzSql = {
    val rounds = (1 to 8).map { i =>
      s"""k$i AS MATERIALIZED (
         |  SELECT nodes.u,
         |    round(1 + 0.1e0 * coalesce(sum(k${i - 1}.x), 0), 9) AS x
         |  FROM nodes
         |  LEFT JOIN e ON e.v = nodes.u
         |  LEFT JOIN k${i - 1} ON k${i - 1}.u = e.u
         |  GROUP BY nodes.u)""".stripMargin
    }.mkString(",\n")
    s"""WITH ${R34Ops.tradeEdgeCtes(mat = true)},
       |nodes AS MATERIALIZED (SELECT DISTINCT u FROM e),
       |k0 AS MATERIALIZED (SELECT u, 1.0e0 AS x FROM nodes),
       |$rounds
       |SELECT u AS nation, round(x, 6) AS katz FROM k8""".stripMargin
  }

  val defs: Seq[QDef] = Seq(

    // KPSS: the null-of-stationarity complement to the Dickey-Fuller
    // side of x_coint_eg — trending daily volume shows up as partial
    // sums that grow faster than the long-run variance.
    QDef("x_kpss", KpssSql) { (s, d) =>
      val daily = Tables(s, d).orders
        .groupBy(col("o_orderdate").cast("date").as("d"))
        .agg(count(lit(1)).cast("double").as("y"))
      val m = daily.agg(round(avg(col("y")), 6).as("my"),
        count(lit(1)).as("n"))
      val e = daily.crossJoin(broadcast(m))
        .select(col("d"), (col("y") - col("my")).as("e"), col("n"))
      val w = Window.orderBy("d")
      val sFrame = e.select(col("d"), col("e"), col("n"),
        sum(col("e")).over(w.rowsBetween(Window.unboundedPreceding,
          Window.currentRow)).as("s"),
        lag(col("e"), 1).over(w).as("e1"),
        lag(col("e"), 2).over(w).as("e2"),
        lag(col("e"), 3).over(w).as("e3"),
        lag(col("e"), 4).over(w).as("e4"))
      val g = sFrame.agg(max(col("n")).as("n"),
        sum(col("e") * col("e")).as("g0"),
        sum(col("e") * coalesce(col("e1"), lit(0.0))).as("g1"),
        sum(col("e") * coalesce(col("e2"), lit(0.0))).as("g2"),
        sum(col("e") * coalesce(col("e3"), lit(0.0))).as("g3"),
        sum(col("e") * coalesce(col("e4"), lit(0.0))).as("g4"),
        sum(col("s") * col("s")).as("ss"))
      g.select(col("n"), col("ss"),
          ((col("g0") + lit(2) * (lit(0.8) * col("g1")
            + lit(0.6) * col("g2") + lit(0.4) * col("g3")
            + lit(0.2) * col("g4"))) / col("n")).as("lrv"))
        .select(col("n").as("n_days"), round(col("lrv"), 4)
          .as("long_run_var"),
          round(col("ss")
            / (col("n").cast("double") * col("n") * col("lrv")), 4)
            .as("kpss_stat"))
    },

    // KPSS through Spark's SQL parser — same shared text.
    QDef("x_sql_kpss", KpssSql) { (s, d) =>
      SqlSurface.viewed(s, d, "orders")
      s.sql(KpssSql)
    },

    // SAMPLE ENTROPY: regularity of the daily order-count series — low
    // SampEn = repetitive dynamics, high = noise. The pair count is a
    // calendar² non-equi join (≤2400² comparisons at EVERY sf — the
    // calendar, not the corpus, sets the cost).
    QDef("x_sample_entropy", SampEnSql) { (s, d) =>
      val daily = Tables(s, d).orders
        .groupBy(col("o_orderdate").cast("date").as("d"))
        .agg(count(lit(1)).cast("double").as("c"))
      val r = daily.agg(
        (lit(0.2) * round(stddev_samp(col("c")), 6)).as("r"))
      val w = Window.orderBy("d")
      val pts = daily.select(row_number().over(w).as("i"), col("c"))
      val wi = Window.orderBy("i")
      val tpl = pts.select(col("i"), col("c").as("x1"),
        lead(col("c"), 1).over(wi).as("x2"),
        lead(col("c"), 2).over(wi).as("x3"))
      val a = tpl.select(col("i").as("ai"), col("x1").as("ax1"),
        col("x2").as("ax2"), col("x3").as("ax3"))
      val b = tpl.select(col("i").as("bi"), col("x1").as("bx1"),
        col("x2").as("bx2"), col("x3").as("bx3"))
      val pr = a.join(broadcast(b), col("bi") > col("ai"))
        .crossJoin(broadcast(r))
        .agg(
          sum(when(col("ax2").isNotNull && col("bx2").isNotNull
            && greatest(abs(col("ax1") - col("bx1")),
              abs(col("ax2") - col("bx2"))) <= col("r"), 1L)
            .otherwise(0L)).as("bm"),
          sum(when(col("ax3").isNotNull && col("bx3").isNotNull
            && greatest(abs(col("ax1") - col("bx1")),
              abs(col("ax2") - col("bx2")),
              abs(col("ax3") - col("bx3"))) <= col("r"), 1L)
            .otherwise(0L)).as("am"))
      pr.select(col("bm").as("template_pairs_m2"),
        col("am").as("template_pairs_m3"),
        when(col("am") > 0,
          round(-log(col("am").cast("double") / col("bm")), 6))
          .as("sampen"))
    },

    // Sample entropy through Spark's SQL parser — same shared text.
    QDef("x_sql_sampen", SampEnSql) { (s, d) =>
      SqlSurface.viewed(s, d, "orders")
      s.sql(SampEnSql)
    },

    // SPECTRAL ENTROPY: how concentrated is the daily series' power
    // spectrum across periods 2-14 — the scalar summary of
    // x_periodogram (entropy ≈ 1 = white noise, ≈ 0 = one dominant
    // cycle). Powers snap at 2 dp before the entropy algebra, so the
    // 13-row frame both engines see is bit-identical.
    QDef("x_spectral_entropy", SpectralSql) { (s, d) =>
      val daily = Tables(s, d).orders
        .groupBy(col("o_orderdate").cast("date").as("d"))
        .agg(count(lit(1)).cast("double").as("c"))
      val d0 = daily.agg(round(avg(col("c")), 6).as("mc"))
      val w = Window.orderBy("d")
      val pts = daily.crossJoin(broadcast(d0))
        .select((row_number().over(w).cast("bigint") - 1).as("i"),
          (col("c") - col("mc")).as("cc"))
      val terms = pts
        .select(col("i"), col("cc"),
          explode(array((2 to 14).map(lit(_)): _*)).as("t"))
        .select(col("t"),
          (col("cc") * cos(lit(6.283185307179586) * col("i") / col("t")))
            .as("ct"),
          (col("cc") * sin(lit(6.283185307179586) * col("i") / col("t")))
            .as("st"))
      val pw = terms.groupBy("t")
        .agg(round(sum(col("ct")) * sum(col("ct"))
          + sum(col("st")) * sum(col("st")), 2).as("p"))
      val tot = pw.agg(sum(col("p")).as("tp"), count(lit(1)).as("k"))
      pw.crossJoin(broadcast(tot)).filter(col("p") > 0)
        .select(col("t"), (col("p") / col("tp")).as("q"), col("k"))
        .agg(max(col("k")).as("n_periods"),
          round(-sum(col("q") * log(col("q")))
            / log(max(col("k")).cast("double")), 6).as("spectral_entropy"),
          round(exp(avg(log(col("q")))) / avg(col("q")), 6)
            .as("spectral_flatness"))
    },

    // Spectral entropy through Spark's SQL parser — same shared text.
    QDef("x_sql_spectral", SpectralSql) { (s, d) =>
      SqlSurface.viewed(s, d, "orders")
      s.sql(SpectralSql)
    },

    // ORDINAL ASSOCIATION: gamma / tau-b / tau-c / Somers' D between
    // priority rank and price bucket — the ordered-categories
    // complement of x_cramers_v (nominal) and x_kendall_tau
    // (continuous). ONE contingency collapse; the pair algebra is a
    // 20-cell cross.
    QDef("x_ordinal_assoc", OrdAssocSql) { (s, d) =>
      val base = Tables(s, d).orders.select(
        substring(col("o_orderpriority"), 1, 1).cast("int").as("s"),
        least(floor(col("o_totalprice") / 100000).cast("bigint"), lit(3L))
          .as("p"))
      val cells = base.groupBy("s", "p").agg(count(lit(1)).as("n"))
      val tots = cells.agg(sum(col("n")).as("nn"))
      val margS = cells.groupBy("s").agg(sum(col("n")).as("r"))
      val margP = cells.groupBy("p").agg(sum(col("n")).as("c"))
      val t1 = margS.agg(
        sum(col("r").cast("double") * (col("r") - 1) / 2).as("n1"),
        count(lit(1)).as("ks"))
      val t2 = margP.agg(
        sum(col("c").cast("double") * (col("c") - 1) / 2).as("n2"),
        count(lit(1)).as("kp"))
      val a = cells.select(col("s").as("as_"), col("p").as("ap"),
        col("n").as("an"))
      val b = cells.select(col("s").as("bs"), col("p").as("bp"),
        col("n").as("bn"))
      val pq = a.crossJoin(broadcast(b)).agg(
        sum(when(col("bs") > col("as_") && col("bp") > col("ap"),
          col("an").cast("double") * col("bn")).otherwise(0.0)).as("pc"),
        sum(when(col("bs") > col("as_") && col("bp") < col("ap"),
          col("an").cast("double") * col("bn")).otherwise(0.0)).as("qd"))
      pq.crossJoin(broadcast(tots)).crossJoin(broadcast(t1))
        .crossJoin(broadcast(t2))
        .select(col("nn"), col("pc"), col("qd"), col("n1"), col("n2"),
          (col("nn").cast("double") * (col("nn") - 1) / 2).as("n0"),
          least(col("ks"), col("kp")).as("m"))
        .select(col("nn").as("n"),
          col("pc").cast("bigint").as("concordant"),
          col("qd").cast("bigint").as("discordant"),
          round((col("pc") - col("qd")) / (col("pc") + col("qd")), 6)
            .as("gamma"),
          round((col("pc") - col("qd"))
            / sqrt((col("n0") - col("n1")) * (col("n0") - col("n2"))), 6)
            .as("tau_b"),
          round(lit(2) * col("m") * (col("pc") - col("qd"))
            / (col("nn").cast("double") * col("nn") * (col("m") - 1)), 6)
            .as("tau_c"),
          round((col("pc") - col("qd")) / (col("n0") - col("n1")), 6)
            .as("somers_d"))
    },

    // Ordinal association through Spark's SQL parser — same shared text.
    QDef("x_sql_ordassoc", OrdAssocSql) { (s, d) =>
      SqlSurface.viewed(s, d, "orders")
      s.sql(OrdAssocSql)
    },

    // COCHRAN-ARMITAGE: monotone trend in the fulfilled share across
    // ordered priorities — the ordered alternative x_chi2_dow's
    // omnibus χ² has no power against. One collapse, closed-form Z.
    QDef("x_cochran_armitage", CaTrendSql) { (s, d) =>
      val base = Tables(s, d).orders.select(
        substring(col("o_orderpriority"), 1, 1).cast("int").as("s"),
        when(col("o_orderstatus") === "F", 1.0).otherwise(0.0).as("y"))
      val g = base.groupBy("s")
        .agg(count(lit(1)).as("n"), sum(col("y")).as("r"))
      g.agg(sum(col("n")).as("nn"),
          (sum(col("r")) / sum(col("n"))).as("pbar"),
          sum(col("s").cast("double") * col("r")).as("sr"),
          sum(col("s").cast("double") * col("n")).as("sn"),
          sum(col("s").cast("double") * col("s") * col("n")).as("ssn"))
        .select(col("nn").as("n"), round(col("pbar"), 6).as("pbar"),
          round((col("sr") - col("pbar") * col("sn"))
            / sqrt(col("pbar") * (lit(1) - col("pbar"))
              * (col("ssn") - col("sn") * col("sn") / col("nn"))), 4)
            .as("ca_z"))
    },

    // Cochran-Armitage through Spark's SQL parser — same shared text.
    QDef("x_sql_catrend", CaTrendSql) { (s, d) =>
      SqlSurface.viewed(s, d, "orders")
      s.sql(CaTrendSql)
    },

    // ANSARI-BRADLEY: do 'F' and 'O' lineitems differ in quantity
    // DISPERSION (x_mannwhitney tests location; this is the scale
    // sibling). Tie-averaged AB scores computed exactly in integer
    // space per run of the ≤50-value histogram.
    QDef("x_ansari_bradley", AnsariSql) { (s, d) =>
      val base = Tables(s, d).lineitem.select(
        col("l_linestatus").as("g"),
        col("l_quantity").cast("bigint").as("v"))
      val h = base.groupBy("v").agg(
        sum(when(col("g") === "F", 1L).otherwise(0L)).as("ca"),
        count(lit(1)).as("c"))
      val wv = Window.orderBy("v")
      val wAll = Window.orderBy("v")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      val cum = h.select(col("v"), col("ca"), col("c"),
        coalesce(sum(col("c")).over(wv.rowsBetween(
          Window.unboundedPreceding, -1)), lit(0L)).as("below"),
        sum(col("c")).over(wAll).as("nn"),
        sum(col("ca")).over(wAll).as("na"))
      val sc = cum.select(col("v"), col("ca"), col("c"), col("nn"),
        col("na"),
        floor((col("nn") + 1) / lit(2.0)).cast("bigint").as("th"),
        (col("below") + 1).as("lo"), (col("below") + col("c")).as("hi"))
      val lowEnd = least(col("hi"), col("th"))
      val upStart = greatest(col("lo"), col("th") + 1)
      val s2 = sc.select(col("v"), col("ca"), col("c"), col("nn"),
        col("na"),
        (when(lowEnd >= col("lo"),
          (lowEnd - col("lo") + 1).cast("double") * (col("lo") + lowEnd)
            / 2).otherwise(0.0)
        + when(col("hi") >= upStart,
          (col("hi") - upStart + 1).cast("double") * (col("nn") + 1)
            - (upStart + col("hi")).cast("double")
              * (col("hi") - upStart + 1) / 2).otherwise(0.0)).as("ssum"))
      val ag = s2.agg(max(col("nn")).as("nn"), max(col("na")).as("na"),
        sum(col("ca") * col("ssum") / col("c")).as("w"),
        sum(col("ssum")).as("sa"),
        sum(col("ssum") * col("ssum") / col("c")).as("sa2"))
      ag.select(col("nn").as("n"), col("na").as("n_f"),
        round(col("w"), 4).as("ab_w"),
        round(col("na") * col("sa") / col("nn"), 4).as("e_w"),
        round((col("w") - col("na") * col("sa") / col("nn"))
          / sqrt(col("na").cast("double") * (col("nn") - col("na"))
            * (col("nn") * col("sa2") - col("sa") * col("sa"))
            / (col("nn").cast("double") * col("nn") * (col("nn") - 1))),
          4).as("ab_z"))
    },

    // Ansari-Bradley through Spark's SQL parser — same shared text.
    QDef("x_sql_ansari", AnsariSql) { (s, d) =>
      SqlSurface.viewed(s, d, "lineitem")
      s.sql(AnsariSql)
    },

    // KATZ CENTRALITY: walk-counting influence on the trade graph —
    // unlike degree (x_ppr's teleport answers "from here", Katz answers
    // "from everywhere, damped by distance"). Corpus work = the one
    // distinct-edge aggregate; 8 rounds driver-side on the collected
    // ≤25-vertex frame, 9 dp snap per round (x_ppr posture).
    QDef("x_graph_katz", KatzSql) { (s, d) =>
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
      val nodes = edges.map(_._1).distinct.sorted
      var x = nodes.map(u => u -> 1.0).toMap
      for (_ <- 1 to 8) {
        x = nodes.map { u =>
          val in = edges.filter(_._2 == u).map { case (src, _) => x(src) }
            .sum
          u -> snap9(1.0 + 0.1 * in)
        }.toMap
      }
      nodes.map(u => (u, x(u))).toSeq.toDF("nation", "k")
        .select(col("nation"), round(col("k"), 6).as("katz"))
    }
  )
}
