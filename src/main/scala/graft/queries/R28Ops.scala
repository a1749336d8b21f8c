package graft.queries

import graft.{QDef, Tables}
import graft.ops.BinnedRank
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-28 batch: effect sizes and post-hoc tests (Cliff's δ, Cohen's d,
  * Welch's ANOVA, Tukey-Kramer HSD, Friedman, Mood's median) plus robust
  * rolling diagnostics (Hampel filter, rolling quantile, Poisson
  * dispersion). Same posture as the R12-R18 statistics waves: corpus work
  * is ONE grouped/histogram aggregate; rank machinery rides BinnedRank
  * (the only unpartitioned window orders a value-domain-bounded bin
  * frame); moments snap at 6 dp before any bounded-frame algebra; rolling
  * windows order the calendar-bounded daily frame only.
  */
object R28Ops {

  /** Cliff's δ as ONE portable SQL text — oracle of `x_cliffs_delta` and
    * whole query of the `x_sql_cliffs` twin. δ = P(x₁>x₂) − P(x₁<x₂)
    * assembled in pure BIGINT from the joint distinct-price histogram:
    * gt = Σ c₁(v)·cum₂(<v), eq = Σ c₁·c₂, lt = n₁n₂ − gt − eq, so
    * δ = (2·gt + eq)/(n₁n₂) − 1 with ONE final division. The cumulative
    * is the MannWhitneySql two-level binned prefix (⌊v/1000⌋ bins). */
  private[queries] val CliffsSql =
    """WITH oc AS (
      |  SELECT c.c_mktsegment AS g, o.o_totalprice AS v
      |  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
      |  WHERE c.c_mktsegment IN ('BUILDING', 'MACHINERY')),
      |hist AS (
      |  SELECT v,
      |    CAST(sum(CASE WHEN g = 'BUILDING' THEN 1 ELSE 0 END) AS BIGINT)
      |      AS c1,
      |    CAST(sum(CASE WHEN g = 'MACHINERY' THEN 1 ELSE 0 END) AS BIGINT)
      |      AS c2
      |  FROM oc GROUP BY 1),
      |hb AS (SELECT v, c1, c2, CAST(floor(v / 1000) AS BIGINT) AS bin
      |  FROM hist),
      |binpre AS (
      |  SELECT bin,
      |    CAST(coalesce(sum(bc) OVER (ORDER BY bin
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
      |      AS bb
      |  FROM (SELECT bin, CAST(sum(c2) AS BIGINT) AS bc FROM hb GROUP BY 1)),
      |cum AS (
      |  SELECT hb.v, hb.c1, hb.c2,
      |    bp.bb + CAST(coalesce(sum(hb.c2) OVER (PARTITION BY hb.bin
      |      ORDER BY hb.v
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
      |      AS below2
      |  FROM hb JOIN binpre bp ON hb.bin = bp.bin),
      |st AS (
      |  SELECT CAST(sum(c1) AS BIGINT) AS n1, CAST(sum(c2) AS BIGINT) AS n2,
      |    CAST(sum(c1 * below2) AS BIGINT) AS gt,
      |    CAST(sum(c1 * c2) AS BIGINT) AS eq
      |  FROM cum)
      |SELECT n1, n2, gt, eq,
      |  round((2.0e0 * gt + eq) / (n1 * n2) - 1, 6) AS cliffs_delta
      |FROM st""".stripMargin

  /** Welch's heteroscedastic one-way ANOVA as ONE portable SQL text —
    * oracle of `x_welch_anova` and whole query of the `x_sql_welch` twin.
    * Per-group moments snap at 6 dp; everything after is 5-row algebra. */
  private[queries] val WelchSql =
    """WITH oc AS (
      |  SELECT c.c_mktsegment AS g, o.o_totalprice AS v
      |  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey),
      |st AS (SELECT g, CAST(count(*) AS BIGINT) AS n, round(avg(v), 6) AS m,
      |  round(var_samp(v), 6) AS s2 FROM oc GROUP BY 1),
      |w AS (SELECT g, n, m, s2, n / s2 AS wt FROM st),
      |tot AS (SELECT CAST(count(*) AS BIGINT) AS k, sum(wt) AS sw,
      |  sum(wt * m) / sum(wt) AS mbar FROM w),
      |parts AS (SELECT max(k) AS k,
      |  sum(wt * (m - mbar) * (m - mbar)) AS a,
      |  sum((1 - wt / sw) * (1 - wt / sw) / (n - 1)) AS b
      |  FROM w, tot)
      |SELECT CAST(k - 1 AS BIGINT) AS df1,
      |  round((k * k - 1) / (3.0e0 * b), 4) AS df2,
      |  round((a / (k - 1)) / (1 + 2.0e0 * (k - 2) * b / (k * k - 1)), 4)
      |    AS f_welch
      |FROM parts""".stripMargin


  /** Cohen's d / Hedges' g as ONE portable SQL text — oracle of
    * `x_cohens_d` and whole query of the `x_sql_cohens` twin. */
  private[queries] val CohensSql =
    """WITH oc AS (
      |  SELECT c.c_mktsegment AS g, o.o_totalprice AS v
      |  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey),
      |st AS (SELECT g, CAST(count(*) AS BIGINT) AS n, round(avg(v), 6) AS m,
      |  round(var_samp(v), 6) AS s2 FROM oc GROUP BY 1),
      |tot AS (SELECT CAST(sum(n) AS BIGINT) AS nn, sum(n * m) AS sv,
      |  sum((n - 1) * s2 + n * m * m) AS sq FROM st),
      |r AS (SELECT g, n, m, s2, nn,
      |  (sv - n * m) / (nn - n) AS mr,
      |  (sq - ((n - 1) * s2 + n * m * m)
      |    - (nn - n) * ((sv - n * m) / (nn - n))
      |      * ((sv - n * m) / (nn - n))) / (nn - n - 1) AS s2r
      |  FROM st, tot),
      |d AS (SELECT g, n, m - mr AS diff,
      |  (m - mr) / sqrt(((n - 1) * s2 + (nn - n - 1) * s2r) / (nn - 2))
      |    AS cd, nn
      |  FROM r)
      |SELECT g AS segment, n, round(diff, 4) AS mean_diff,
      |  round(cd, 4) AS cohens_d,
      |  round(cd * (1 - 3.0e0 / (4 * nn - 9)), 4) AS hedges_g
      |FROM d""".stripMargin


  /** Tukey-Kramer HSD as ONE portable SQL text — oracle of `x_tukey_hsd`
    * and whole query of the `x_sql_tukey` twin. */
  private[queries] val TukeySql =
    """WITH oc AS (
      |  SELECT c.c_mktsegment AS g, o.o_totalprice AS v
      |  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey),
      |st AS (SELECT g, CAST(count(*) AS BIGINT) AS n, round(avg(v), 6) AS m,
      |  round(var_samp(v), 6) AS s2 FROM oc GROUP BY 1),
      |msw AS (SELECT sum((n - 1) * s2) / (sum(n) - count(*)) AS msw
      |  FROM st)
      |SELECT /*+ BROADCAST(b) */ a.g AS seg_a, b.g AS seg_b,
      |  round(a.m - b.m, 4) AS mean_diff,
      |  round(abs(a.m - b.m)
      |    / sqrt(msw.msw / 2 * (1.0e0 / a.n + 1.0e0 / b.n)), 4) AS q_stat
      |FROM st a JOIN st b ON a.g < b.g, msw""".stripMargin


  /** Friedman test as ONE portable SQL text — oracle of `x_friedman`
    * and whole query of the `x_sql_friedman` twin. */
  private[queries] val FriedmanSql =
    """WITH oc AS (
      |  SELECT c.c_mktsegment AS g, CAST(month(o.o_orderdate) AS INT) AS b,
      |    o.o_totalprice AS v
      |  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey),
      |cells AS (SELECT b, g, round(avg(v), 6) AS m FROM oc GROUP BY 1, 2),
      |r AS (SELECT a.b, a.g,
      |  sum(CASE WHEN c2.m < a.m THEN 1.0e0
      |           WHEN c2.m = a.m THEN 0.5e0 ELSE 0 END) + 0.5e0 AS rk
      |  FROM cells a JOIN cells c2 ON a.b = c2.b GROUP BY 1, 2),
      |rs AS (SELECT g, sum(rk) AS rj FROM r GROUP BY 1),
      |dims AS (SELECT CAST(count(DISTINCT b) AS BIGINT) AS n,
      |  CAST(count(DISTINCT g) AS BIGINT) AS k FROM cells),
      |chi AS (SELECT max(n) AS n, max(k) AS k,
      |  round(12.0e0 / (max(n) * max(k) * (max(k) + 1)) * sum(rj * rj)
      |    - 3.0e0 * max(n) * (max(k) + 1), 4) AS chi2
      |  FROM rs, dims)
      |SELECT rs.g AS segment, round(rs.rj, 1) AS rank_sum,
      |  chi.n AS n_blocks, chi.k, chi.chi2
      |FROM rs, chi""".stripMargin


  /** Mood's median test as ONE portable SQL text — oracle of
    * `x_mood_median` and whole query of the `x_sql_mood` twin. */
  private[queries] val MoodSql =
    """WITH oc AS (
      |  SELECT c.c_mktsegment AS g, o.o_totalprice AS v
      |  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey),
      |hist AS (SELECT v, CAST(count(*) AS BIGINT) AS c FROM oc GROUP BY 1),
      |hb AS (SELECT v, c, CAST(floor(v / 1000) AS BIGINT) AS bin FROM hist),
      |binpre AS (
      |  SELECT bin,
      |    CAST(coalesce(sum(bc) OVER (ORDER BY bin
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
      |      AS bb
      |  FROM (SELECT bin, CAST(sum(c) AS BIGINT) AS bc FROM hb GROUP BY 1)),
      |cum AS (
      |  SELECT hb.v, hb.c,
      |    bp.bb + CAST(coalesce(sum(hb.c) OVER (PARTITION BY hb.bin
      |      ORDER BY hb.v
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
      |      AS below
      |  FROM hb JOIN binpre bp ON hb.bin = bp.bin),
      |tot AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM hist),
      |med AS (SELECT min(v) AS mv FROM cum, tot
      |  WHERE below + c >= CAST(floor((n + 1) / 2.0e0) AS BIGINT)),
      |cls AS (SELECT g,
      |  CAST(sum(CASE WHEN v > mv THEN 1 ELSE 0 END) AS BIGINT) AS above,
      |  CAST(count(*) AS BIGINT) AS n_g
      |  FROM oc, med GROUP BY 1),
      |mg AS (SELECT CAST(sum(above) AS BIGINT) AS a,
      |  CAST(sum(n_g) AS BIGINT) AS nn FROM cls),
      |chi AS (SELECT round(sum(
      |    (above - n_g * a / CAST(nn AS DOUBLE))
      |      * (above - n_g * a / CAST(nn AS DOUBLE))
      |      / (n_g * a / CAST(nn AS DOUBLE))
      |    + ((n_g - above) - n_g * (nn - a) / CAST(nn AS DOUBLE))
      |      * ((n_g - above) - n_g * (nn - a) / CAST(nn AS DOUBLE))
      |      / (n_g * (nn - a) / CAST(nn AS DOUBLE))), 4) AS chi2
      |  FROM cls, mg)
      |SELECT cls.g AS segment, cls.n_g, cls.above,
      |  round(cls.n_g * mg.a / CAST(mg.nn AS DOUBLE), 4) AS expected_above,
      |  chi.chi2
      |FROM cls, mg, chi""".stripMargin


  /** Poisson dispersion as ONE portable SQL text — oracle of
    * `x_poisson_dispersion` and whole query of the `x_sql_poisson` twin. */
  private[queries] val PoissonSql =
    """WITH dc AS (SELECT event_type,
      |  CAST(date_trunc('day', ts) AS DATE) AS d,
      |  CAST(count(*) AS BIGINT) AS c
      |  FROM events GROUP BY 1, 2),
      |st AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_days,
      |  round(avg(c), 6) AS m, round(var_samp(c), 6) AS s2
      |  FROM dc GROUP BY 1)
      |SELECT event_type, n_days, round(m, 4) AS mean_daily,
      |  round(s2, 4) AS var_daily, round(s2 / m, 4) AS dispersion,
      |  round((n_days - 1) * s2 / m, 4) AS chi2
      |FROM st""".stripMargin

  val defs: Seq[QDef] = Seq(

    // CLIFF'S DELTA: the ordinal effect size behind the Mann-Whitney z —
    // how often does a BUILDING order out-price a MACHINERY one. The
    // corpus does ONE joint histogram aggregate; gt/eq stay BIGINT through
    // the BinnedRank cumulative (x_mannwhitney's machinery with the
    // second measure's cumulative), one division at release.
    QDef("x_cliffs_delta", CliffsSql) { (s, d) =>
      val t = Tables(s, d)
      val oc = t.orders
        .join(broadcast(t.customer.select("c_custkey", "c_mktsegment")),
          col("o_custkey") === col("c_custkey"))
        .filter(col("c_mktsegment").isin("BUILDING", "MACHINERY"))
        .select(col("c_mktsegment").as("g"), col("o_totalprice").as("v"))
      val hist = oc.groupBy("v").agg(
        sum(when(col("g") === "BUILDING", 1L).otherwise(0L)).as("c1"),
        sum(when(col("g") === "MACHINERY", 1L).otherwise(0L)).as("c2"))
      val ranked = BinnedRank.belowAndN(hist, Seq.empty,
        floor(col("v") / lit(1000)).cast("bigint"), Seq(col("v")), col("c2"))
      val st = ranked.agg(
        sum(col("c1")).as("n1"), sum(col("c2")).as("n2"),
        sum(col("c1") * col("below")).as("gt"),
        sum(col("c1") * col("c2")).as("eq"))
      st.select(col("n1"), col("n2"), col("gt"), col("eq"),
        round((lit(2.0) * col("gt") + col("eq"))
          / (col("n1") * col("n2")) - 1, 6).as("cliffs_delta"))
    },

    // Cliff's δ through Spark's SQL parser — same shared text (the CcSql
    // twin contract; the parsed plan carries the oracle's bin windows).
    QDef("x_sql_cliffs", CliffsSql) { (s, d) =>
      SqlSurface.viewed(s, d, "orders", "customer")
      s.sql(CliffsSql)
    },

    // WELCH'S ANOVA: the unequal-variance F — does mean order price
    // differ across segments without x_anova_f's homoscedasticity
    // assumption. ONE map-side-combined moment pass; the weighted grand
    // mean, A, B, and both dfs are 5-row algebra on snapped moments.
    QDef("x_welch_anova", WelchSql) { (s, d) =>
      val t = Tables(s, d)
      val oc = t.orders
        .join(broadcast(t.customer.select("c_custkey", "c_mktsegment")),
          col("o_custkey") === col("c_custkey"))
        .select(col("c_mktsegment").as("g"), col("o_totalprice").as("v"))
      val st = oc.groupBy("g").agg(count(lit(1)).as("n"),
        round(avg(col("v")), 6).as("m"),
        round(var_samp(col("v")), 6).as("s2"))
      val w = st.withColumn("wt", col("n") / col("s2"))
      val tot = w.agg(count(lit(1)).as("k"), sum(col("wt")).as("sw"),
        (sum(col("wt") * col("m")) / sum(col("wt"))).as("mbar"))
      val parts = w.crossJoin(broadcast(tot)).agg(
        max(col("k")).as("k"),
        sum(col("wt") * (col("m") - col("mbar"))
          * (col("m") - col("mbar"))).as("a"),
        sum((lit(1) - col("wt") / col("sw"))
          * (lit(1) - col("wt") / col("sw")) / (col("n") - lit(1))).as("b"))
      parts.select(
        (col("k") - 1).cast("bigint").as("df1"),
        round((col("k") * col("k") - 1) / (lit(3.0) * col("b")), 4).as("df2"),
        round((col("a") / (col("k") - lit(1)))
          / (lit(1) + lit(2.0) * (col("k") - lit(2)) * col("b")
            / (col("k") * col("k") - lit(1))), 4).as("f_welch"))
    },

    // Welch through Spark's SQL parser, same shared text.
    QDef("x_sql_welch", WelchSql) { (s, d) =>
      SqlSurface.viewed(s, d, "orders", "customer")
      s.sql(WelchSql)
    },

    // COHEN'S D per segment (each vs the REST of the corpus), with the
    // Hedges' g small-sample correction: rest-side moments recovered in
    // closed form from the 5-row stats frame (Σv and Σv² reconstructed
    // from snapped n/m/s², never a second corpus pass), pooled SD over
    // both sides. The standardized-effect screen behind every A/B read.
    QDef("x_cohens_d", CohensSql) { (s, d) =>
      val t = Tables(s, d)
      val oc = t.orders
        .join(broadcast(t.customer.select("c_custkey", "c_mktsegment")),
          col("o_custkey") === col("c_custkey"))
        .select(col("c_mktsegment").as("g"), col("o_totalprice").as("v"))
      val st = oc.groupBy("g").agg(count(lit(1)).as("n"),
        round(avg(col("v")), 6).as("m"),
        round(var_samp(col("v")), 6).as("s2"))
      val tot = st.agg(sum(col("n")).as("nn"),
        sum(col("n") * col("m")).as("sv"),
        sum(((col("n") - lit(1)) * col("s2"))
          + (col("n") * col("m") * col("m"))).as("sq"))
      val mr = (col("sv") - col("n") * col("m")) / (col("nn") - col("n"))
      val sqg = ((col("n") - lit(1)) * col("s2")) +
        (col("n") * col("m") * col("m"))
      val s2r = (col("sq") - sqg - (col("nn") - col("n")) * mr * mr) /
        (col("nn") - col("n") - lit(1))
      val r = st.crossJoin(broadcast(tot))
        .select(col("g"), col("n"), col("nn"),
          (col("m") - mr).as("diff"),
          ((col("m") - mr) / sqrt(((col("n") - lit(1)) * col("s2")
            + (col("nn") - col("n") - lit(1)) * s2r)
            / (col("nn") - lit(2)))).as("cd"))
      r.select(col("g").as("segment"), col("n"),
        round(col("diff"), 4).as("mean_diff"),
        round(col("cd"), 4).as("cohens_d"),
        round(col("cd") * (lit(1) - lit(3.0)
          / (lit(4) * col("nn") - lit(9))), 4).as("hedges_g"))
    },

    // TUKEY-KRAMER HSD: all 10 pairwise studentized-range statistics
    // after the ANOVA — which segment pairs actually differ. MSW from the
    // same snapped 5-row moment frame; the pair expansion is a triangular
    // join of that frame (the x_lorenz_deciles posture).
    QDef("x_tukey_hsd", TukeySql) { (s, d) =>
      val t = Tables(s, d)
      val oc = t.orders
        .join(broadcast(t.customer.select("c_custkey", "c_mktsegment")),
          col("o_custkey") === col("c_custkey"))
        .select(col("c_mktsegment").as("g"), col("o_totalprice").as("v"))
      val st = oc.groupBy("g").agg(count(lit(1)).as("n"),
        round(avg(col("v")), 6).as("m"),
        round(var_samp(col("v")), 6).as("s2"))
      val msw = st.agg((sum((col("n") - lit(1)) * col("s2"))
        / (sum(col("n")) - count(lit(1)))).as("msw"))
      val b = st.select(col("g").as("gb"), col("n").as("nb"),
        col("m").as("mb"))
      st.join(broadcast(b), col("g") < col("gb"))
        .crossJoin(broadcast(msw))
        .select(col("g").as("seg_a"), col("gb").as("seg_b"),
          round(col("m") - col("mb"), 4).as("mean_diff"),
          round(abs(col("m") - col("mb"))
            / sqrt(col("msw") / lit(2)
              * (lit(1.0) / col("n") + lit(1.0) / col("nb"))), 4)
            .as("q_stat"))
    },

    // FRIEDMAN TEST: blocked nonparametric ANOVA — do segments keep the
    // same price ordering across order months (blocks)? Cell means (ONE
    // corpus aggregate, snapped 6 dp) rank WITHIN each 5-cell block by an
    // average-rank self-join of the 60-row cell frame (cnt_less +
    // (cnt_eq+1)/2 — ties exact in both engines); χ²_F from rank sums.
    QDef("x_friedman", FriedmanSql) { (s, d) =>
      val t = Tables(s, d)
      val oc = t.orders
        .join(broadcast(t.customer.select("c_custkey", "c_mktsegment")),
          col("o_custkey") === col("c_custkey"))
        .select(col("c_mktsegment").as("g"),
          month(col("o_orderdate")).as("b"), col("o_totalprice").as("v"))
      val cells = oc.groupBy("b", "g").agg(round(avg(col("v")), 6).as("m"))
      val c2 = cells.select(col("b").as("b2"), col("m").as("m2"))
      val r = cells.join(broadcast(c2), col("b") === col("b2"))
        .groupBy("b", "g")
        .agg((sum(when(col("m2") < col("m"), lit(1.0))
          .when(col("m2") === col("m"), lit(0.5))
          .otherwise(lit(0.0))) + lit(0.5)).as("rk"))
      val rs = r.groupBy("g").agg(sum(col("rk")).as("rj"))
      val dims = cells.agg(countDistinct(col("b")).as("n"),
        countDistinct(col("g")).as("k"))
      val chi = rs.crossJoin(broadcast(dims)).agg(
        max(col("n")).as("n"), max(col("k")).as("k"),
        round(lit(12.0) / (max(col("n")) * max(col("k"))
          * (max(col("k")) + lit(1))) * sum(col("rj") * col("rj"))
          - lit(3.0) * max(col("n")) * (max(col("k")) + lit(1)), 4)
          .as("chi2"))
      rs.crossJoin(broadcast(chi))
        .select(col("g").as("segment"), round(col("rj"), 1).as("rank_sum"),
          col("n").as("n_blocks"), col("k"), col("chi2"))
    },

    // MOOD'S MEDIAN TEST: the grand median from the binned distinct-price
    // cumulative (lower-median convention — pure integer selection, no
    // interpolation to diverge on), then a 5×2 above/at-or-below
    // contingency and its χ². Counts stay BIGINT; expecteds are exact
    // integer ratios.
    QDef("x_mood_median", MoodSql) { (s, d) =>
      val t = Tables(s, d)
      val oc = t.orders
        .join(broadcast(t.customer.select("c_custkey", "c_mktsegment")),
          col("o_custkey") === col("c_custkey"))
        .select(col("c_mktsegment").as("g"), col("o_totalprice").as("v"))
      val hist = oc.groupBy("v").agg(count(lit(1)).as("c"))
      val cum = BinnedRank.belowAndN(hist, Seq.empty,
        floor(col("v") / lit(1000)).cast("bigint"), Seq(col("v")), col("c"))
      val med = cum
        .filter(col("below") + col("c") >=
          floor((col("n") + lit(1)) / lit(2.0)).cast("bigint"))
        .agg(min(col("v")).as("mv"))
      val cls = oc.crossJoin(broadcast(med)).groupBy("g")
        .agg(sum(when(col("v") > col("mv"), 1L).otherwise(0L)).as("above"),
          count(lit(1)).as("n_g"))
      val mg = cls.agg(sum(col("above")).as("a"), sum(col("n_g")).as("nn"))
      val e1 = col("n_g") * col("a") / col("nn").cast("double")
      val e0 = col("n_g") * (col("nn") - col("a")) / col("nn").cast("double")
      val chi = cls.crossJoin(broadcast(mg)).agg(
        round(sum((col("above") - e1) * (col("above") - e1) / e1
          + ((col("n_g") - col("above")) - e0)
            * ((col("n_g") - col("above")) - e0) / e0), 4).as("chi2"))
      cls.crossJoin(broadcast(mg)).crossJoin(broadcast(chi))
        .select(col("g").as("segment"), col("n_g"), col("above"),
          round(e1, 4).as("expected_above"), col("chi2"))
    },

    // HAMPEL FILTER on the daily mean series: 7-day centered rolling
    // median + MAD, outlier when |x−med| > 3·1.4826·MAD — the robust
    // despiker run before any trend fit. ONE calendar-bounded window
    // collects the frame; median and MAD are in-row sorted-array picks
    // (lower-median convention, no interpolation), so both engines pick
    // identical elements of identical snapped arrays.
    QDef("x_hampel",
      """WITH dm AS (SELECT CAST(date_trunc('day', ts) AS DATE) AS d,
        |  round(avg(value), 6) AS x FROM events GROUP BY 1),
        |w AS (SELECT d, x,
        |  list(x) OVER (ORDER BY d
        |    ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS arr
        |  FROM dm),
        |m AS (SELECT d, x,
        |  list_sort(arr)[(len(arr) + 1) // 2] AS med, arr FROM w),
        |md AS (SELECT d, x, med,
        |  list_sort(list_transform(arr, v -> abs(v - med)))
        |    [(len(arr) + 1) // 2] AS mad
        |  FROM m)
        |SELECT d AS day, x AS day_mean, round(med, 6) AS roll_med,
        |  round(mad, 6) AS roll_mad,
        |  CAST(CASE WHEN abs(x - med) > 3 * 1.4826e0 * mad
        |    THEN 1 ELSE 0 END AS INT) AS is_outlier
        |FROM md""".stripMargin) { (s, d) =>
      val dm = Tables(s, d).events
        .groupBy(to_date(col("ts")).as("d"))
        .agg(round(avg(col("value")), 6).as("x"))
      val w = Window.orderBy("d").rowsBetween(-3, 3)
      val lowerMid = (c: org.apache.spark.sql.Column) =>
        floor((size(c) + lit(1)) / lit(2.0)).cast("int")
      val withArr = dm.withColumn("arr", collect_list(col("x")).over(w))
        .withColumn("med",
          element_at(sort_array(col("arr")), lowerMid(col("arr"))))
      val md = withArr.withColumn("mad",
        element_at(sort_array(transform(col("arr"),
          v => abs(v - col("med")))), lowerMid(col("arr"))))
      md.select(col("d").as("day"), col("x").as("day_mean"),
        round(col("med"), 6).as("roll_med"),
        round(col("mad"), 6).as("roll_mad"),
        when(abs(col("x") - col("med"))
          > lit(3) * lit(1.4826) * col("mad"), 1).otherwise(0)
          .cast("int").as("is_outlier"))
    },

    // ROLLING QUANTILE: trailing 14-day p90 of the daily mean — the
    // percentile band an ops dashboard draws. Same in-row sorted-array
    // pick (type-1 quantile: element ⌈0.9·n⌉, exact, no interpolation)
    // over the calendar-bounded window.
    QDef("x_rolling_quantile",
      """WITH dm AS (SELECT CAST(date_trunc('day', ts) AS DATE) AS d,
        |  round(avg(value), 6) AS x FROM events GROUP BY 1),
        |w AS (SELECT d, x,
        |  list(x) OVER (ORDER BY d
        |    ROWS BETWEEN 13 PRECEDING AND CURRENT ROW) AS arr
        |  FROM dm)
        |SELECT d AS day, x AS day_mean,
        |  list_sort(arr)[CAST(ceil(0.9e0 * len(arr)) AS INT)] AS p90
        |FROM w""".stripMargin) { (s, d) =>
      val dm = Tables(s, d).events
        .groupBy(to_date(col("ts")).as("d"))
        .agg(round(avg(col("value")), 6).as("x"))
      val w = Window.orderBy("d").rowsBetween(-13, 0)
      dm.withColumn("arr", collect_list(col("x")).over(w))
        .select(col("d").as("day"), col("x").as("day_mean"),
          element_at(sort_array(col("arr")),
            ceil(lit(0.9) * size(col("arr"))).cast("int")).as("p90"))
    },

    // POISSON DISPERSION per event type: is daily arrival count over-
    // dispersed vs Poisson (variance/mean ≈ 1)? Daily counts are exact
    // integers, so per-type moments over the (type × 30-day) frame derive
    // identical doubles; χ² = (n−1)·s²/m̄ is the classic dispersion test.
    QDef("x_poisson_dispersion", PoissonSql) { (s, d) =>
      val dc = Tables(s, d).events
        .groupBy(col("event_type"), to_date(col("ts")).as("d"))
        .agg(count(lit(1)).as("c"))
      val st = dc.groupBy("event_type").agg(count(lit(1)).as("n_days"),
        round(avg(col("c")), 6).as("m"),
        round(var_samp(col("c")), 6).as("s2"))
      st.select(col("event_type"), col("n_days"),
        round(col("m"), 4).as("mean_daily"),
        round(col("s2"), 4).as("var_daily"),
        round(col("s2") / col("m"), 4).as("dispersion"),
        round((col("n_days") - lit(1)) * col("s2") / col("m"), 4).as("chi2"))
    }
  )
}
