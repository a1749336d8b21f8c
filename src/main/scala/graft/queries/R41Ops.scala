package graft.queries

import graft.{QDef, Tables}
import org.apache.spark.sql.functions._

/** Round-41 batch: causal inference II — instrumental variables (Wald /
  * 2SLS with one instrument), regression discontinuity at a price
  * cutoff, the one-way fixed-effects (within) panel estimator,
  * randomization inference via deterministic LCG pseudo-permutations,
  * and a Baron-Kenny / Sobel mediation decomposition.
  *
  * Scale posture: every operator collapses the corpus to a moment /
  * sufficient-statistic frame in ONE map-side-combined aggregate (the
  * x_cuped / x_ate_strat family); all remaining algebra is closed-form
  * on 1-25-row frames. The permutation test evaluates all 19
  * pseudo-assignments as conditional sums INSIDE the single corpus
  * pass — randomization inference without 19 scans (labels are integer
  * LCG arithmetic, so both engines replay identical assignments).
  */
object R41Ops {

  /** IV / Wald estimator as ONE portable text — oracle of `x_iv_wald`
    * and whole query of the `x_sql_iv` twin. Instrument z = URGENT
    * order, endogenous x = quantity, outcome y = extended price:
    * β_IV = cov(z,y)/cov(z,x) beside the OLS slope, with the
    * first-stage F = (n−2)·r²/(1−r²) that diagnoses weak
    * instruments. */
  private[queries] val IvSql =
    """WITH base AS (SELECT
      |  CASE WHEN o.o_orderpriority = '1-URGENT' THEN 1.0e0 ELSE 0.0e0
      |    END AS z,
      |  l.l_quantity AS x, l.l_extendedprice AS y
      |  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey),
      |m AS (SELECT CAST(count(*) AS BIGINT) AS n,
      |  covar_samp(z, y) AS szy, covar_samp(z, x) AS szx,
      |  covar_samp(x, y) AS sxy, var_samp(x) AS sxx,
      |  corr(z, x) AS r
      |  FROM base)
      |SELECT n, round(sxy / sxx, 6) AS beta_ols,
      |  round(szy / szx, 6) AS beta_iv,
      |  round((n - 2) * r * r / (1 - r * r), 4) AS first_stage_f
      |FROM m""".stripMargin

  /** Sharp regression discontinuity as ONE portable text — oracle of
    * `x_reg_disc` and whole query of the `x_sql_regdisc` twin. Running
    * variable = order price, cutoff 250 k$, bandwidth 100 k$; local
    * linear fit on each side from side-wise moments, jump = difference
    * of the intercepts AT the cutoff, z from the OLS intercept
    * variances. One grouped collapse to the 2-row side frame. */
  private[queries] val RegDiscSql =
    """WITH w AS (SELECT
      |  CASE WHEN o_totalprice >= 250000 THEN 1 ELSE 0 END AS side,
      |  o_totalprice - 250000.0e0 AS u,
      |  CASE WHEN o_orderstatus = 'F' THEN 1.0e0 ELSE 0.0e0 END AS y
      |  FROM orders
      |  WHERE o_totalprice >= 150000 AND o_totalprice < 350000),
      |m AS (SELECT side, CAST(count(*) AS BIGINT) AS n,
      |  avg(u) AS mu, avg(y) AS my,
      |  var_samp(u) * (count(*) - 1) AS sxx,
      |  covar_samp(u, y) * (count(*) - 1) AS sxy,
      |  var_samp(y) * (count(*) - 1) AS syy
      |  FROM w GROUP BY 1),
      |f AS (SELECT side, n, mu, my, sxy / sxx AS b, sxx, syy, sxy
      |  FROM m),
      |ab AS (SELECT side, n, my - b * mu AS a,
      |  (syy - b * sxy) / (n - 2) * (1.0e0 / n + mu * mu / sxx)
      |    AS var_a
      |  FROM f)
      |SELECT
      |  max(CASE WHEN side = 0 THEN n END) AS n_left,
      |  max(CASE WHEN side = 1 THEN n END) AS n_right,
      |  round(max(CASE WHEN side = 1 THEN a END)
      |    - max(CASE WHEN side = 0 THEN a END), 6) AS jump,
      |  round((max(CASE WHEN side = 1 THEN a END)
      |    - max(CASE WHEN side = 0 THEN a END))
      |    / sqrt(max(CASE WHEN side = 1 THEN var_a END)
      |      + max(CASE WHEN side = 0 THEN var_a END)), 4) AS rd_z
      |FROM ab""".stripMargin

  /** One-way fixed-effects (within) estimator as ONE portable text —
    * oracle of `x_panel_fe` and whole query of the `x_sql_panelfe`
    * twin. Entity = supplier nation; the within slope needs only
    * per-entity sufficient statistics (the centered cross-moments sum
    * across entities), so ONE grouped aggregate replaces the demeaned
    * second pass entirely. */
  private[queries] val PanelFeSql =
    """WITH base AS (SELECT s.s_nationkey AS e, l.l_quantity AS x,
      |  l.l_extendedprice / 1000.0e0 AS y
      |  FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey),
      |g AS (SELECT e, CAST(count(*) AS BIGINT) AS n,
      |  covar_samp(x, y) * (count(*) - 1) AS sxy,
      |  var_samp(x) * (count(*) - 1) AS sxx,
      |  var_samp(y) * (count(*) - 1) AS syy,
      |  sum(x) AS sx, sum(y) AS sy
      |  FROM base GROUP BY 1),
      |tot AS (SELECT CAST(count(*) AS BIGINT) AS k,
      |  CAST(sum(n) AS BIGINT) AS nn,
      |  sum(sxy) AS wxy, sum(sxx) AS wxx, sum(syy) AS wyy,
      |  sum(sx) AS tx, sum(sy) AS ty,
      |  sum(sx * sx / n) AS bxx2, sum(sx * sy / n) AS bxy2
      |  FROM g)
      |SELECT k AS n_entities, nn AS n,
      |  round((wxy + bxy2 - tx * ty / nn) / (wxx + bxx2 - tx * tx / nn),
      |    6) AS beta_pooled,
      |  round(wxy / wxx, 6) AS beta_within,
      |  round(wxy * wxy / (wxx * wyy), 6) AS r2_within
      |FROM tot""".stripMargin

  private val PermKs = 1 to 19

  /** Randomization inference as ONE portable text — oracle of
    * `x_permutation_ate` and whole query of the `x_sql_permate` twin.
    * 19 deterministic LCG pseudo-assignments
    * t_k = ((o_orderkey·(2k+3) + 5k+1) mod 97) < 48 are evaluated as
    * conditional sums inside ONE corpus aggregate; the permutation
    * p-value compares 9 dp-snapped diffs so the ≥-membership is
    * identical in both engines. */
  private[queries] val PermAteSql = {
    val condSums = PermKs.map(k =>
      s"""  sum(CASE WHEN (o_orderkey * ${2 * k + 3} + ${5 * k + 1}) % 97
         |    < 48 THEN y ELSE 0.0e0 END) AS s$k,
         |  CAST(sum(CASE WHEN (o_orderkey * ${2 * k + 3} + ${5 * k + 1})
         |    % 97 < 48 THEN 1 ELSE 0 END) AS BIGINT) AS c$k""".stripMargin)
      .mkString(",\n")
    val diffs = PermKs.map(k =>
      s"round(s$k / c$k - (sy - s$k) / (nn - c$k), 9) AS d$k")
      .mkString(",\n  ")
    val exceed = PermKs.map(k =>
      s"CASE WHEN abs(d$k) >= abs(d0) THEN 1 ELSE 0 END")
      .mkString(" + ")
    val maxAbs = PermKs.map(k => s"abs(d$k)").mkString(", ")
    s"""WITH base AS (SELECT o_orderkey,
       |  CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END AS t,
       |  o_totalprice / 1000.0e0 AS y
       |  FROM orders),
       |agg AS (SELECT CAST(count(*) AS BIGINT) AS nn, sum(y) AS sy,
       |  sum(CASE WHEN t = 1 THEN y ELSE 0.0e0 END) AS s0,
       |  CAST(sum(t) AS BIGINT) AS c0,
       |$condSums
       |  FROM base),
       |d AS (SELECT nn,
       |  round(s0 / c0 - (sy - s0) / (nn - c0), 9) AS d0,
       |  $diffs
       |  FROM agg)
       |SELECT nn AS n, round(d0, 6) AS obs_diff,
       |  round(greatest($maxAbs), 6) AS null_max_abs,
       |  round((1.0e0 + ($exceed)) / 20, 4) AS p_perm
       |FROM d""".stripMargin
  }

  /** Baron-Kenny mediation + Sobel as ONE portable text — oracle of
    * `x_mediation` and whole query of the `x_sql_mediation` twin.
    * x = quantity → m = extended price → y = discounted revenue; the
    * a/b/c' paths and both standard errors are closed-form in the
    * pairwise centered moments — ONE corpus aggregate, 1-row
    * algebra. The OLS identity c = ab + c' prices the mediated
    * share. */
  private[queries] val MediationSql =
    """WITH base AS (SELECT l_quantity AS x, l_extendedprice AS m,
      |  l_extendedprice * (1 - l_discount) AS y FROM lineitem),
      |mo AS (SELECT CAST(count(*) AS BIGINT) AS n,
      |  var_samp(x) * (count(*) - 1) AS sxx,
      |  var_samp(m) * (count(*) - 1) AS smm,
      |  var_samp(y) * (count(*) - 1) AS syy,
      |  covar_samp(x, m) * (count(*) - 1) AS sxm,
      |  covar_samp(x, y) * (count(*) - 1) AS sxy,
      |  covar_samp(m, y) * (count(*) - 1) AS smy
      |  FROM base),
      |fit AS (SELECT n, sxx, smm, syy, sxm, sxy, smy,
      |  sxm / sxx AS a,
      |  (smy * sxx - sxm * sxy) / (smm * sxx - sxm * sxm) AS b,
      |  (sxy * smm - sxm * smy) / (smm * sxx - sxm * sxm) AS cp
      |  FROM mo),
      |se AS (SELECT n, a, b, cp,
      |  (smm - sxm * sxm / sxx) / (n - 2) / sxx AS va,
      |  (syy - b * smy - cp * sxy) / (n - 3)
      |    * sxx / (smm * sxx - sxm * sxm) AS vb,
      |  sxy / sxx AS c
      |  FROM fit)
      |SELECT n, round(a, 6) AS a_path, round(b, 6) AS b_path,
      |  round(cp, 6) AS c_prime,
      |  round(a * b, 6) AS indirect,
      |  round(a * b / sqrt(a * a * vb + b * b * va), 4) AS sobel_z,
      |  round(a * b / c, 4) AS prop_mediated
      |FROM se""".stripMargin

  val defs: Seq[QDef] = Seq(

    // IV / WALD: when the regressor is endogenous, the instrumented
    // slope cov(z,y)/cov(z,x) replaces OLS — released beside the OLS
    // slope and the weak-instrument first-stage F. One moment pass.
    QDef("x_iv_wald", IvSql) { (s, d) =>
      val t = Tables(s, d)
      val base = t.lineitem
        .join(t.orders, col("l_orderkey") === col("o_orderkey"))
        .select(
          when(col("o_orderpriority") === "1-URGENT", 1.0).otherwise(0.0)
            .as("z"),
          col("l_quantity").as("x"), col("l_extendedprice").as("y"))
      base.agg(count(lit(1)).as("n"),
          covar_samp(col("z"), col("y")).as("szy"),
          covar_samp(col("z"), col("x")).as("szx"),
          covar_samp(col("x"), col("y")).as("sxy"),
          var_samp(col("x")).as("sxx"),
          corr(col("z"), col("x")).as("r"))
        .select(col("n"), round(col("sxy") / col("sxx"), 6).as("beta_ols"),
          round(col("szy") / col("szx"), 6).as("beta_iv"),
          round((col("n") - 2) * col("r") * col("r")
            / (lit(1) - col("r") * col("r")), 4).as("first_stage_f"))
    },

    // IV through Spark's SQL parser — same shared text.
    QDef("x_sql_iv", IvSql) { (s, d) =>
      SqlSurface.viewed(s, d, "lineitem", "orders")
      s.sql(IvSql)
    },

    // REGRESSION DISCONTINUITY: does the fulfilled share JUMP at the
    // 250 k$ price cutoff — local linear on both sides within the
    // 100 k$ bandwidth, closed-form from the 2-row side-moment frame.
    QDef("x_reg_disc", RegDiscSql) { (s, d) =>
      val w = Tables(s, d).orders
        .filter(col("o_totalprice") >= 150000 && col("o_totalprice") < 350000)
        .select(
          when(col("o_totalprice") >= 250000, 1).otherwise(0).as("side"),
          (col("o_totalprice") - lit(250000.0)).as("u"),
          when(col("o_orderstatus") === "F", 1.0).otherwise(0.0).as("y"))
      val m = w.groupBy("side").agg(count(lit(1)).as("n"),
        avg(col("u")).as("mu"), avg(col("y")).as("my"),
        (var_samp(col("u")) * (count(lit(1)) - 1)).as("sxx"),
        (covar_samp(col("u"), col("y")) * (count(lit(1)) - 1)).as("sxy"),
        (var_samp(col("y")) * (count(lit(1)) - 1)).as("syy"))
      val f = m.withColumn("b", col("sxy") / col("sxx"))
      val ab = f.select(col("side"), col("n"),
        (col("my") - col("b") * col("mu")).as("a"),
        ((col("syy") - col("b") * col("sxy")) / (col("n") - 2)
          * (lit(1.0) / col("n") + col("mu") * col("mu") / col("sxx")))
          .as("var_a"))
      ab.agg(
        max(when(col("side") === 0, col("n"))).as("n_left"),
        max(when(col("side") === 1, col("n"))).as("n_right"),
        max(when(col("side") === 1, col("a"))).as("ar"),
        max(when(col("side") === 0, col("a"))).as("al"),
        max(when(col("side") === 1, col("var_a"))).as("vr"),
        max(when(col("side") === 0, col("var_a"))).as("vl"))
        .select(col("n_left"), col("n_right"),
          round(col("ar") - col("al"), 6).as("jump"),
          round((col("ar") - col("al")) / sqrt(col("vr") + col("vl")), 4)
            .as("rd_z"))
    },

    // RD through Spark's SQL parser — same shared text.
    QDef("x_sql_regdisc", RegDiscSql) { (s, d) =>
      SqlSurface.viewed(s, d, "orders")
      s.sql(RegDiscSql)
    },

    // PANEL FIXED EFFECTS: the within estimator strips every
    // supplier-nation's level before the slope — computed WITHOUT a
    // demeaning second pass, because the within cross-moments are sums
    // of per-entity centered moments (one grouped aggregate, 25-row
    // frame).
    QDef("x_panel_fe", PanelFeSql) { (s, d) =>
      val t = Tables(s, d)
      val base = t.lineitem
        .join(broadcast(t.supplier.select("s_suppkey", "s_nationkey")),
          col("l_suppkey") === col("s_suppkey"))
        .select(col("s_nationkey").as("e"), col("l_quantity").as("x"),
          (col("l_extendedprice") / 1000.0).as("y"))
      val g = base.groupBy("e").agg(count(lit(1)).as("n"),
        (covar_samp(col("x"), col("y")) * (count(lit(1)) - 1)).as("sxy"),
        (var_samp(col("x")) * (count(lit(1)) - 1)).as("sxx"),
        (var_samp(col("y")) * (count(lit(1)) - 1)).as("syy"),
        sum(col("x")).as("sx"), sum(col("y")).as("sy"))
      g.agg(count(lit(1)).as("k"), sum(col("n")).as("nn"),
          sum(col("sxy")).as("wxy"), sum(col("sxx")).as("wxx"),
          sum(col("syy")).as("wyy"),
          sum(col("sx")).as("tx"), sum(col("sy")).as("ty"),
          sum(col("sx") * col("sx") / col("n")).as("bxx2"),
          sum(col("sx") * col("sy") / col("n")).as("bxy2"))
        .select(col("k").as("n_entities"), col("nn").as("n"),
          round((col("wxy") + col("bxy2") - col("tx") * col("ty") / col("nn"))
            / (col("wxx") + col("bxx2") - col("tx") * col("tx") / col("nn")),
            6).as("beta_pooled"),
          round(col("wxy") / col("wxx"), 6).as("beta_within"),
          round(col("wxy") * col("wxy") / (col("wxx") * col("wyy")), 6)
            .as("r2_within"))
    },

    // Panel FE through Spark's SQL parser — same shared text.
    QDef("x_sql_panelfe", PanelFeSql) { (s, d) =>
      SqlSurface.viewed(s, d, "lineitem", "supplier")
      s.sql(PanelFeSql)
    },

    // RANDOMIZATION INFERENCE: the URGENT price effect against its own
    // permutation null — 19 LCG pseudo-assignments evaluated inside ONE
    // corpus aggregate (no 19 scans), diffs snapped 9 dp before the
    // exceedance count so both engines agree on every membership.
    QDef("x_permutation_ate", PermAteSql) { (s, d) =>
      val base = Tables(s, d).orders.select(col("o_orderkey"),
        when(col("o_orderpriority") === "1-URGENT", 1).otherwise(0).as("t"),
        (col("o_totalprice") / 1000.0).as("y"))
      val condCols: Seq[org.apache.spark.sql.Column] = PermKs.flatMap { k =>
        val lbl = (col("o_orderkey") * (2 * k + 3) + (5 * k + 1)) % 97 < 48
        Seq(sum(when(lbl, col("y")).otherwise(0.0)).as(s"s$k"),
          sum(when(lbl, 1L).otherwise(0L)).as(s"c$k"))
      }
      val agg = base.agg(count(lit(1)).as("nn"), (Seq(
        sum(col("y")).as("sy"),
        sum(when(col("t") === 1, col("y")).otherwise(0.0)).as("s0"),
        sum(col("t").cast("bigint")).as("c0")) ++ condCols): _*)
      def diff(sCol: String, cCol: String) =
        round(col(sCol) / col(cCol)
          - (col("sy") - col(sCol)) / (col("nn") - col(cCol)), 9)
      val d0 = diff("s0", "c0")
      val dk = PermKs.map(k => diff(s"s$k", s"c$k"))
      val exceed = dk.map(dc =>
        when(abs(dc) >= abs(d0), 1).otherwise(0)).reduce(_ + _)
      agg.select(col("nn").as("n"), round(d0, 6).as("obs_diff"),
        round(greatest(dk.map(abs): _*), 6).as("null_max_abs"),
        round((lit(1.0) + exceed) / 20, 4).as("p_perm"))
    },

    // Permutation ATE through Spark's SQL parser — same shared text.
    QDef("x_sql_permate", PermAteSql) { (s, d) =>
      SqlSurface.viewed(s, d, "orders")
      s.sql(PermAteSql)
    },

    // MEDIATION: how much of quantity's revenue effect flows THROUGH
    // the line price — a/b/c' paths, Sobel z, and the mediated share,
    // all closed-form in one pairwise-moment aggregate.
    QDef("x_mediation", MediationSql) { (s, d) =>
      val base = Tables(s, d).lineitem.select(
        col("l_quantity").as("x"), col("l_extendedprice").as("m"),
        (col("l_extendedprice") * (lit(1) - col("l_discount"))).as("y"))
      val mo = base.agg(count(lit(1)).as("n"),
        (var_samp(col("x")) * (count(lit(1)) - 1)).as("sxx"),
        (var_samp(col("m")) * (count(lit(1)) - 1)).as("smm"),
        (var_samp(col("y")) * (count(lit(1)) - 1)).as("syy"),
        (covar_samp(col("x"), col("m")) * (count(lit(1)) - 1)).as("sxm"),
        (covar_samp(col("x"), col("y")) * (count(lit(1)) - 1)).as("sxy"),
        (covar_samp(col("m"), col("y")) * (count(lit(1)) - 1)).as("smy"))
      val fit = mo.select(col("n"), col("sxx"), col("smm"), col("syy"),
        col("sxm"), col("sxy"), col("smy"),
        (col("sxm") / col("sxx")).as("a"),
        ((col("smy") * col("sxx") - col("sxm") * col("sxy"))
          / (col("smm") * col("sxx") - col("sxm") * col("sxm"))).as("b"),
        ((col("sxy") * col("smm") - col("sxm") * col("smy"))
          / (col("smm") * col("sxx") - col("sxm") * col("sxm"))).as("cp"))
      val se = fit.select(col("n"), col("a"), col("b"), col("cp"),
        ((col("smm") - col("sxm") * col("sxm") / col("sxx"))
          / (col("n") - 2) / col("sxx")).as("va"),
        ((col("syy") - col("b") * col("smy") - col("cp") * col("sxy"))
          / (col("n") - 3) * col("sxx")
          / (col("smm") * col("sxx") - col("sxm") * col("sxm"))).as("vb"),
        (col("sxy") / col("sxx")).as("c"))
      se.select(col("n"), round(col("a"), 6).as("a_path"),
        round(col("b"), 6).as("b_path"),
        round(col("cp"), 6).as("c_prime"),
        round(col("a") * col("b"), 6).as("indirect"),
        round(col("a") * col("b")
          / sqrt(col("a") * col("a") * col("vb")
            + col("b") * col("b") * col("va")), 4).as("sobel_z"),
        round(col("a") * col("b") / col("c"), 4).as("prop_mediated"))
    },

    // Mediation through Spark's SQL parser — same shared text.
    QDef("x_sql_mediation", MediationSql) { (s, d) =>
      SqlSurface.viewed(s, d, "lineitem")
      s.sql(MediationSql)
    }
  )
}
