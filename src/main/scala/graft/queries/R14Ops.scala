package graft.queries

import graft.{QDef, Tables}
import graft.ops.BinnedRank
import org.apache.spark.sql.functions._

/** Round-14 batch: the hypothesis-test / diagnostic-statistics family
  * that rounds out R12/R13 — k-sample ranks (Kruskal-Wallis), ordinal
  * association (Kendall tau-b), survival comparison (log-rank),
  * whiteness (Ljung-Box) and normality (Jarque-Bera) — each built on
  * the shapes the repo already trusts at 100 TB: distinct-value
  * histograms through [[graft.ops.BinnedRank]], contingency frames that
  * are value-domain-bounded, calendar/horizon-bounded series frames,
  * and two-pass moment algebra with 6-dp snapped means so both engines
  * see identical doubles.
  */
object R14Ops {

  /** Kruskal-Wallis as ONE portable SQL text — the DuckDB oracle of
    * `x_kruskal_wallis` AND the whole Spark-SQL query of the
    * `x_sql_kruskal` twin. Like MannWhitneySql, the rank prefix is the
    * BINNED two-level form, so the parsed twin's only unpartitioned
    * window orders the bounded bin frame (the round-8 dynamic probe
    * rejected a first draft that ranked the raw distinct-price frame —
    * 15k → 150k rows through SinglePartition at 10×). */
  /** KruskalSql's corpus prefix (oc → gv), split out (r15) so the
    * x_sql_kruskal twin can materialize the multiply-referenced gv frame
    * once (the x_sql_mp from-birth rule) — Spark inlines every CTE
    * reference, so the unsplit twin re-ran the orders⋈customer collapse
    * per reference (28 scans in its plan). Concatenation below keeps
    * [[KruskalSql]] byte-identical to the pre-split text. */
  private[queries] val KruskalGvCtes =
    """oc AS (
      |  SELECT c.c_mktsegment AS g, o.o_totalprice AS v
      |  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey),
      |gv AS (SELECT g, v, CAST(count(*) AS BIGINT) AS c
      |  FROM oc GROUP BY 1, 2)""".stripMargin

  private[queries] val KruskalTailCtes =
    """vh AS (SELECT v, CAST(sum(c) AS BIGINT) AS cv FROM gv GROUP BY 1),
      |hb AS (SELECT v, cv, CAST(floor(v / 1000) AS BIGINT) AS bin
      |  FROM vh),
      |binpre AS (
      |  SELECT bin,
      |    CAST(coalesce(sum(bc) OVER (ORDER BY bin
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
      |      AS bb
      |  FROM (SELECT bin, CAST(sum(cv) AS BIGINT) AS bc FROM hb GROUP BY 1)),
      |r AS (SELECT hb.v, hb.cv,
      |  bp.bb + CAST(coalesce(sum(hb.cv) OVER (PARTITION BY hb.bin
      |    ORDER BY hb.v
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
      |    AS below
      |  FROM hb JOIN binpre bp ON hb.bin = bp.bin),
      |gr AS (SELECT gv.g, CAST(sum(gv.c) AS BIGINT) AS n_g,
      |  CAST(sum(gv.c * (2 * r.below + r.cv + 1)) AS BIGINT) AS two_r
      |  FROM gv JOIN r ON gv.v = r.v GROUP BY 1),
      |tt AS (SELECT CAST(sum(cv * cv * cv - cv) AS BIGINT) AS tie3,
      |  CAST(sum(cv) AS BIGINT) AS nn FROM vh),
      |h AS (SELECT
      |  (12.0e0 / (CAST(max(tt.nn) AS DOUBLE) * (max(tt.nn) + 1))
      |      * sum((two_r / 2.0e0) * (two_r / 2.0e0) / n_g)
      |    - 3.0e0 * (max(tt.nn) + 1))
      |   / (1 - max(tt.tie3)
      |        / (CAST(max(tt.nn) AS DOUBLE) * max(tt.nn) * max(tt.nn)
      |           - max(tt.nn))) AS hst
      |  FROM gr, tt)
      |SELECT gr.g AS segment, gr.n_g AS n,
      |  round(gr.two_r / 2.0e0, 1) AS rank_sum,
      |  round(h.hst, 4) AS h_stat
      |FROM gr, h""".stripMargin

  private[queries] val KruskalSql =
    s"WITH $KruskalGvCtes,\n$KruskalTailCtes"

  /** Jarque-Bera as ONE portable SQL text — oracle of `x_jarque_bera`
    * and whole query of the `x_sql_jb` twin. */
  private[queries] val JbSql =
    """WITH oc AS (
      |  SELECT c.c_mktsegment AS g, o.o_totalprice AS v
      |  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey),
      |m AS (SELECT g, CAST(count(*) AS BIGINT) AS n, round(avg(v), 6) AS mu
      |  FROM oc GROUP BY 1),
      |z AS (SELECT oc.g, oc.v - m.mu AS z, m.n
      |  FROM oc JOIN m ON oc.g = m.g),
      |st AS (SELECT g, max(n) AS n, avg(z * z) AS m2,
      |  avg(z * z * z) AS m3, avg(z * z * z * z) AS m4
      |  FROM z GROUP BY 1)
      |SELECT g AS segment, n,
      |  round(m3 / pow(m2, 1.5e0), 4) AS skewness,
      |  round(m4 / (m2 * m2) - 3, 4) AS kurtosis_ex,
      |  round(n / 6.0e0 * (pow(m3 / pow(m2, 1.5e0), 2)
      |    + pow(m4 / (m2 * m2) - 3, 2) / 4), 2) AS jb
      |FROM st""".stripMargin

  val defs: Seq[QDef] = Seq(

    // KRUSKAL-WALLIS H: do order-price DISTRIBUTIONS differ across the 5
    // market segments — the k-sample generalization of x_mannwhitney,
    // with the identical scale story: ONE distinct-price histogram
    // through BinnedRank (never a corpus sort), BIGINT doubled rank sums
    // (avg rank enters as 2·below + c + 1, so everything stays integer
    // until the final division), and the tie correction from the same
    // histogram. N(N+1) is evaluated in DOUBLE — at 100 TB the BIGINT
    // square would sit near overflow.
    QDef("x_kruskal_wallis", KruskalSql) { (s, d) =>
      val t = Tables(s, d)
      val oc = t.orders
        .join(broadcast(t.customer.select("c_custkey", "c_mktsegment")),
          col("o_custkey") === col("c_custkey"))
        .select(col("c_mktsegment").as("g"), col("o_totalprice").as("v"))
      val gv = oc.groupBy("g", "v").agg(count(lit(1)).as("c"))
      val vh = gv.groupBy("v").agg(sum(col("c")).as("cv"))
      val r = BinnedRank.belowAndN(vh, Seq.empty,
        floor(col("v") / lit(1000)).cast("bigint"), Seq(col("v")), col("cv"))
      val gr = gv.join(r.select("v", "cv", "below"), "v")
        .groupBy("g").agg(sum(col("c")).as("n_g"),
          sum(col("c") * (lit(2) * col("below") + col("cv") + lit(1)))
            .as("two_r"))
      val tt = vh.agg(
        sum(col("cv") * col("cv") * col("cv") - col("cv")).as("tie3"),
        sum(col("cv")).as("nn"))
      val h = gr.crossJoin(broadcast(tt)).agg(
        ((lit(12.0) / (max(col("nn")).cast("double") * (max(col("nn")) + lit(1)))
            * sum((col("two_r") / lit(2.0)) * (col("two_r") / lit(2.0)) / col("n_g"))
          - lit(3.0) * (max(col("nn")) + lit(1)))
          / (lit(1) - max(col("tie3"))
              / (max(col("nn")).cast("double") * max(col("nn")) * max(col("nn"))
                 - max(col("nn"))))).as("hst"))
      gr.crossJoin(broadcast(h))
        .select(col("g").as("segment"), col("n_g").as("n"),
          round(col("two_r") / lit(2.0), 1).as("rank_sum"),
          round(col("hst"), 4).as("h_stat"))
    },

    // KENDALL TAU-B between quantity and discount — EXACT concordant /
    // discordant pair counts from the (quantity × discount) contingency
    // frame: both columns are value-domain-bounded (~50 × 11 cells at any
    // sf), so the O(cells²) pair enumeration is a broadcast
    // nested-loop over ≤ 550 rows while the corpus contributes exactly
    // ONE 2-key hash aggregate. Pair counts are summed in DOUBLE (exact
    // integers below 2^53; a BIGINT would overflow near n ≈ 4.3e9 since
    // C, D ~ n²/4) and tau-b is released at 6 dp.
    QDef("x_kendall_tau",
      """WITH cells AS (
        |  SELECT l_quantity AS q, l_discount AS d,
        |    CAST(count(*) AS BIGINT) AS c
        |  FROM lineitem GROUP BY 1, 2),
        |pairs AS (SELECT
        |  sum(CASE WHEN b.d > a.d THEN CAST(a.c AS DOUBLE) * b.c
        |    ELSE 0 END) AS conc,
        |  sum(CASE WHEN b.d < a.d THEN CAST(a.c AS DOUBLE) * b.c
        |    ELSE 0 END) AS disc
        |  FROM cells a JOIN cells b ON b.q > a.q),
        |mq AS (SELECT CAST(sum(nq) AS BIGINT) AS n,
        |  sum(CAST(nq AS DOUBLE) * (nq - 1) / 2) AS tq
        |  FROM (SELECT q, CAST(sum(c) AS BIGINT) AS nq FROM cells GROUP BY 1)),
        |md AS (SELECT sum(CAST(nd AS DOUBLE) * (nd - 1) / 2) AS td
        |  FROM (SELECT d, CAST(sum(c) AS BIGINT) AS nd FROM cells GROUP BY 1))
        |SELECT mq.n, pairs.conc AS concordant, pairs.disc AS discordant,
        |  round((pairs.conc - pairs.disc)
        |    / sqrt((CAST(mq.n AS DOUBLE) * (mq.n - 1) / 2 - mq.tq)
        |         * (CAST(mq.n AS DOUBLE) * (mq.n - 1) / 2 - md.td)), 6)
        |    AS tau_b
        |FROM pairs, mq, md""".stripMargin) { (s, d) =>
      val cells = Tables(s, d).lineitem
        .groupBy(col("l_quantity").as("q"), col("l_discount").as("d"))
        .agg(count(lit(1)).as("c"))
      val a = cells.select(col("q").as("qa"), col("d").as("da"),
        col("c").as("ca"))
      val b = cells.select(col("q").as("qb"), col("d").as("db"),
        col("c").as("cb"))
      val pairs = a.join(broadcast(b), col("qb") > col("qa"))
        .agg(
          sum(when(col("db") > col("da"),
            col("ca").cast("double") * col("cb")).otherwise(lit(0.0)))
            .as("conc"),
          sum(when(col("db") < col("da"),
            col("ca").cast("double") * col("cb")).otherwise(lit(0.0)))
            .as("disc"))
      val mq = cells.groupBy("q").agg(sum(col("c")).as("nq"))
        .agg(sum(col("nq")).as("n"),
          sum(col("nq").cast("double") * (col("nq") - lit(1)) / lit(2))
            .as("tq"))
      val md = cells.groupBy("d").agg(sum(col("c")).as("nd"))
        .agg(sum(col("nd").cast("double") * (col("nd") - lit(1)) / lit(2))
          .as("td"))
      val n0 = col("n").cast("double") * (col("n") - lit(1)) / lit(2)
      pairs.crossJoin(broadcast(mq)).crossJoin(broadcast(md))
        .select(col("n"), col("conc").as("concordant"),
          col("disc").as("discordant"),
          round((col("conc") - col("disc"))
            / sqrt((n0 - col("tq")) * (n0 - col("td"))), 6).as("tau_b"))
    },

    // LOG-RANK TEST: does signup→purchase survival differ between the
    // even/odd user-id arms — the two-sample complement of
    // x_survival_km, on the identical duration-hours histogram (the
    // horizon-bounded at-risk frame; corpus work is the per-user min-ts
    // aggregates). O−E and the hypergeometric variance accumulate over
    // event times only; chi² = (ΣO−ΣE)²/ΣV released at 4 dp.
    QDef("x_logrank",
      """WITH s AS (SELECT user_id, min(ts) AS t0 FROM events
        |  WHERE event_type = 'signup' GROUP BY 1),
        |p AS (SELECT user_id, min(ts) AS t1 FROM events
        |  WHERE event_type = 'purchase' GROUP BY 1),
        |obs AS (SELECT max(ts) AS tmax FROM events),
        |su AS (SELECT s.user_id % 2 AS arm,
        |  CASE WHEN p.t1 IS NOT NULL AND p.t1 >= s.t0
        |    THEN CAST(date_diff('hour', s.t0, p.t1) AS BIGINT)
        |    ELSE CAST(date_diff('hour', s.t0, obs.tmax) AS BIGINT) END AS dur,
        |  CASE WHEN p.t1 IS NOT NULL AND p.t1 >= s.t0 THEN 1 ELSE 0 END AS ev
        |  FROM s LEFT JOIN p ON p.user_id = s.user_id, obs),
        |arms AS (SELECT
        |  CAST(sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
        |  CAST(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_b
        |  FROM su),
        |dt AS (SELECT dur AS t, CAST(sum(ev) AS BIGINT) AS d,
        |  CAST(sum(CASE WHEN arm = 0 THEN ev ELSE 0 END) AS BIGINT) AS d0,
        |  CAST(count(*) AS BIGINT) AS c,
        |  CAST(sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS c0
        |  FROM su GROUP BY 1),
        |r AS (SELECT t, d, d0,
        |  CAST(sum(c) OVER (ORDER BY t
        |    ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS BIGINT) AS n,
        |  CAST(sum(c0) OVER (ORDER BY t
        |    ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS BIGINT) AS n0
        |  FROM dt),
        |st AS (SELECT CAST(sum(d0) AS BIGINT) AS o_a,
        |  sum(n0 * d / CAST(n AS DOUBLE)) AS e_a,
        |  sum(CASE WHEN n > 1 THEN
        |    d * (n0 / CAST(n AS DOUBLE)) * (1 - n0 / CAST(n AS DOUBLE))
        |      * (n - d) / (n - 1.0e0) ELSE 0 END) AS v
        |  FROM r WHERE d > 0)
        |SELECT arms.n_a, arms.n_b, st.o_a AS observed_a,
        |  round(st.e_a, 4) AS expected_a,
        |  round((st.o_a - st.e_a) * (st.o_a - st.e_a) / st.v, 4) AS chi2
        |FROM st, arms""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val ev = Tables(s, d).events
      def hourOf(c: org.apache.spark.sql.Column) =
        graft.functions.TimeCols.eventMicros(date_trunc("hour", c)) / 3600000000L
      val s0 = ev.filter(col("event_type") === "signup")
        .groupBy("user_id").agg(min(col("ts")).as("t0"))
      val p1 = ev.filter(col("event_type") === "purchase")
        .groupBy("user_id").agg(min(col("ts")).as("t1"))
      val obs = ev.agg(max(col("ts")).as("tmax"))
      val converted = col("t1").isNotNull && col("t1") >= col("t0")
      val su = s0.join(p1, Seq("user_id"), "left")
        .crossJoin(broadcast(obs))
        .select((col("user_id") % 2).as("arm"),
          when(converted, hourOf(col("t1")) - hourOf(col("t0")))
            .otherwise(hourOf(col("tmax")) - hourOf(col("t0")))
            .cast("long").as("dur"),
          when(converted, 1).otherwise(0).as("ev"))
      val arms = su.agg(
        sum(when(col("arm") === 0, 1L).otherwise(0L)).as("n_a"),
        sum(when(col("arm") === 1, 1L).otherwise(0L)).as("n_b"))
      val dt = su.groupBy(col("dur").as("t")).agg(
        sum(col("ev")).as("d"),
        sum(when(col("arm") === 0, col("ev")).otherwise(0)).as("d0"),
        count(lit(1)).as("c"),
        sum(when(col("arm") === 0, 1L).otherwise(0L)).as("c0"))
      // duration-hours at-risk histogram — the x_survival_km horizon-
      // bounded frame; at any sf these windows order ≤ horizon-hours rows
      val atRisk = Window.orderBy("t")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
      val r = dt
        .withColumn("n", sum(col("c")).over(atRisk))
        .withColumn("n0", sum(col("c0")).over(atRisk))
      val frac = col("n0") / col("n").cast("double")
      val st = r.filter(col("d") > 0).agg(
        sum(col("d0")).as("o_a"),
        sum(col("n0") * col("d") / col("n").cast("double")).as("e_a"),
        sum(when(col("n") > 1,
          col("d") * frac * (lit(1) - frac)
            * (col("n") - col("d")) / (col("n") - lit(1.0)))
          .otherwise(lit(0.0))).as("v"))
      st.crossJoin(broadcast(arms))
        .select(col("n_a"), col("n_b"), col("o_a").as("observed_a"),
          round(col("e_a"), 4).as("expected_a"),
          round((col("o_a") - col("e_a")) * (col("o_a") - col("e_a"))
            / col("v"), 4).as("chi2"))
    },

    // LJUNG-BOX Q on the daily event-count series (lags 1-10): is the
    // series white noise once the mean is removed — the portmanteau
    // complement of x_acf/x_pacf. The lag products come from a DATE
    // self-join of the calendar-bounded daily frame (no variable-lag
    // window) and the cumulative Q from a triangular join of the 10-row
    // lag frame — NO single-partition window anywhere in the plan. ACF
    // here is the standard biased estimator ρ_k = Σz_i·z_{i+k} / Σz_i²
    // (denominator over the full series), mean snapped at 6 dp.
    QDef("x_ljung_box",
      """WITH daily AS (
        |  SELECT CAST(ts AS DATE) AS dd, CAST(count(*) AS DOUBLE) AS c
        |  FROM events GROUP BY 1),
        |m AS (SELECT round(avg(c), 6) AS mc, CAST(count(*) AS BIGINT) AS nn
        |  FROM daily),
        |z AS (SELECT dd, daily.c - m.mc AS z FROM daily, m),
        |den AS (SELECT sum(z * z) AS s0 FROM z),
        |lags AS (SELECT unnest([1,2,3,4,5,6,7,8,9,10]) AS k),
        |num AS (SELECT lags.k, sum(z0.z * z1.z) AS nk
        |  FROM lags CROSS JOIN z z0 JOIN z z1 ON z1.dd = z0.dd + lags.k
        |  GROUP BY 1),
        |rho AS (SELECT num.k, num.nk / den.s0 AS r, m.nn
        |  FROM num, den, m),
        |q AS (SELECT a.k, a.r, a.nn, sum(b.r * b.r / (a.nn - b.k)) AS sq
        |  FROM rho a JOIN rho b ON b.k <= a.k GROUP BY 1, 2, 3)
        |SELECT k AS lag_k, round(r, 6) AS rho,
        |  round(nn * (nn + 2.0e0) * sq, 4) AS q_stat
        |FROM q""".stripMargin) { (s, d) =>
      val daily = Tables(s, d).events
        .groupBy(to_date(col("ts")).as("dd"))
        .agg(count(lit(1)).cast("double").as("c"))
      val m = daily.agg(round(avg(col("c")), 6).as("mc"),
        count(lit(1)).as("nn"))
      val z = daily.crossJoin(broadcast(m))
        .select(col("dd"), (col("c") - col("mc")).as("z"), col("nn"))
      val den = z.agg(sum(col("z") * col("z")).as("s0"))
      val lagged = z
        .select(col("dd"), col("z").as("za"),
          explode(array((1 to 10).map(lit(_)): _*)).as("k"))
        .select(date_add(col("dd"), col("k")).as("dd2"), col("k"),
          col("za"))
      val num = lagged
        .join(broadcast(z.select(col("dd").as("dd2"), col("z").as("zb"))),
          "dd2")
        .groupBy("k").agg(sum(col("za") * col("zb")).as("nk"))
      val rho = num.crossJoin(broadcast(den))
        .crossJoin(broadcast(m.select(col("nn"))))
        .select(col("k"), (col("nk") / col("s0")).as("r"), col("nn"))
      val a = rho.select(col("k").as("ka"), col("r").as("ra"), col("nn"))
      val b = rho.select(col("k").as("kb"), col("r").as("rb"))
      a.join(broadcast(b), col("kb") <= col("ka"))
        .groupBy("ka", "ra", "nn")
        .agg(sum(col("rb") * col("rb") / (col("nn") - col("kb"))).as("sq"))
        .select(col("ka").as("lag_k"), round(col("ra"), 6).as("rho"),
          round(col("nn") * (col("nn") + lit(2.0)) * col("sq"), 4)
            .as("q_stat"))
    },

    // JARQUE-BERA normality screen per market segment: skewness and
    // excess kurtosis of order prices from the two-pass central-moment
    // shape (per-group mean snapped at 6 dp, broadcast back, then ONE
    // map-side-combined aggregate of z²/z³/z⁴) — both engines evaluate
    // the identical deviations, and the corpus never leaves the
    // executors. JB = n/6·(S² + K²/4) released at 2 dp.
    QDef("x_jarque_bera", JbSql) { (s, d) =>
      val t = Tables(s, d)
      val oc = t.orders
        .join(broadcast(t.customer.select("c_custkey", "c_mktsegment")),
          col("o_custkey") === col("c_custkey"))
        .select(col("c_mktsegment").as("g"), col("o_totalprice").as("v"))
      val m = oc.groupBy("g").agg(count(lit(1)).as("n"),
        round(avg(col("v")), 6).as("mu"))
      val z = oc.join(broadcast(m), "g")
        .select(col("g"), (col("v") - col("mu")).as("z"), col("n"))
      val st = z.groupBy("g").agg(max(col("n")).as("n"),
        avg(col("z") * col("z")).as("m2"),
        avg(col("z") * col("z") * col("z")).as("m3"),
        avg(col("z") * col("z") * col("z") * col("z")).as("m4"))
      val skew = col("m3") / pow(col("m2"), 1.5)
      val kurt = col("m4") / (col("m2") * col("m2")) - lit(3)
      st.select(col("g").as("segment"), col("n"),
        round(skew, 4).as("skewness"),
        round(kurt, 4).as("kurtosis_ex"),
        round(col("n") / lit(6.0) * (pow(skew, 2) + pow(kurt, 2) / lit(4)), 2)
          .as("jb"))
    }
  )
}
