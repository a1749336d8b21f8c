package graft.queries

import graft.{QDef, Tables}
import graft.ops.BinnedRank
import org.apache.spark.sql.functions._

/** Round-17 batch: market-basket triples (the 3-itemset extension of
  * x_basket_pairs), RFM customer segmentation on exact quintiles,
  * harmonic (weekly-cycle) regression by closed-form normal equations,
  * McNemar's paired test, and Cronbach's alpha — the same shapes as
  * R12-R16: in-row combination expansion instead of self-joins, ntile
  * closed forms over [[graft.ops.BinnedRank]] instead of global
  * windows, and 1-row algebra frames glued by broadcast.
  */
object R17Ops {

  val defs: Seq[QDef] = Seq(

    // FREQUENT 3-ITEMSETS (Eclat-style): brand triples co-bought in one
    // order, support ≥ 10 — the pair expansion of x_basket_pairs taken
    // one level deeper. Triples expand IN-ROW from the per-basket sorted
    // brand set (bounded by basket-size³ — baskets are ≤7 lines), never
    // by a 3-way basket self-join (the oracle's shape, O(items³) only on
    // the single-node replay); the only corpus exchanges are the basket
    // collapse and the (a,b,c)-keyed aggregate, both map-side-combined.
    QDef("x_eclat_triples",
      """WITH items AS (
        |  SELECT DISTINCT l.l_orderkey AS o, p.p_brand AS item
        |  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey),
        |n AS (SELECT CAST(count(DISTINCT o) AS DOUBLE) AS n_orders
        |  FROM items),
        |tri AS (
        |  SELECT a.item AS item_a, b.item AS item_b, c.item AS item_c,
        |    CAST(count(*) AS BIGINT) AS supp
        |  FROM items a
        |  JOIN items b ON a.o = b.o AND a.item < b.item
        |  JOIN items c ON a.o = c.o AND b.item < c.item
        |  GROUP BY 1, 2, 3)
        |SELECT item_a, item_b, item_c, supp AS support,
        |  round(supp / n.n_orders, 6) AS rel_support
        |FROM tri, n WHERE supp >= 10""".stripMargin) { (s, d) =>
      val t = Tables(s, d)
      val items = t.lineitem
        .join(broadcast(t.part), col("l_partkey") === col("p_partkey"))
        .select(col("l_orderkey").as("o"), col("p_brand").as("item"))
        .distinct()
      val n = items.agg(countDistinct(col("o")).cast("double").as("n_orders"))
      val tri = items
        .groupBy("o").agg(sort_array(collect_set(col("item"))).as("its"))
        .select(explode(expr(
          """flatten(flatten(transform(its, (x, i) ->
            |  transform(slice(its, i + 2, size(its)), (y, j) ->
            |    transform(slice(its, i + j + 3, size(its)),
            |              z -> struct(x AS item_a, y AS item_b,
            |                          z AS item_c))))))""".stripMargin))
          .as("p"))
        .select(col("p.item_a"), col("p.item_b"), col("p.item_c"))
        .groupBy("item_a", "item_b", "item_c")
        .agg(count(lit(1)).as("supp"))
        .filter(col("supp") >= 10)
      tri.crossJoin(broadcast(n))
        .select(col("item_a"), col("item_b"), col("item_c"),
          col("supp").as("support"),
          round(col("supp") / col("n_orders"), 6).as("rel_support"))
    },

    // RFM SEGMENTATION: recency / frequency / monetary quintile scores
    // per customer (5 = most recent / most frequent / highest spend),
    // each through the ntile closed form over a BinnedRank pass — the
    // recency and frequency bin frames are value-domain-bounded (days /
    // small counts), the spend frame is the x_ntile_deciles 5000-unit
    // bin; NO global ntile window anywhere. Output: customers + mean
    // spend per populated (r, f, m) cell.
    QDef("x_rfm_segments",
      """WITH cust AS (
        |  SELECT o_custkey,
        |    CAST(date_diff('day', max(o_orderdate),
        |      (SELECT max(o_orderdate) FROM orders)) AS BIGINT) AS rec_days,
        |    CAST(count(*) AS BIGINT) AS freq,
        |    round(sum(o_totalprice), 2) AS spend
        |  FROM orders GROUP BY 1),
        |sc AS (SELECT o_custkey, spend,
        |  CAST(ntile(5) OVER (ORDER BY rec_days DESC, o_custkey) AS INT)
        |    AS r_score,
        |  CAST(ntile(5) OVER (ORDER BY freq, o_custkey) AS INT) AS f_score,
        |  CAST(ntile(5) OVER (ORDER BY spend, o_custkey) AS INT) AS m_score
        |  FROM cust)
        |SELECT r_score, f_score, m_score,
        |  CAST(count(*) AS BIGINT) AS customers,
        |  round(sum(CAST(round(spend * 100) AS BIGINT))
        |    / CAST(count(*) AS DOUBLE)) / 100.0e0 AS avg_spend
        |FROM sc GROUP BY 1, 2, 3""".stripMargin) { (s, d) =>
      val orders = Tables(s, d).orders
      val mx = orders.agg(max(col("o_orderdate")).as("dmax"))
      val cust = orders.crossJoin(broadcast(mx))
        .groupBy("o_custkey")
        .agg(datediff(max(col("dmax")), max(col("o_orderdate")))
            .cast("bigint").as("rec_days"),
          count(lit(1)).as("freq"),
          round(sum(col("o_totalprice")), 2).as("spend"))
      // ntile(k) closed form on r = below + 1 (x_ntile_deciles)
      def tile(k: Int) = {
        val sSize = floor(col("n") / lit(k.toDouble))
        val bRem = col("n") - sSize * lit(k.toDouble)
        val cutoff = bRem * (sSize + lit(1.0))
        when(col("r") <= cutoff,
            floor((col("r") - lit(1.0)) / (sSize + lit(1.0))) + lit(1.0))
          .otherwise(lit(1.0) + bRem
            + floor((col("r") - cutoff - lit(1.0))
              / greatest(sSize, lit(1.0))))
          .cast("int")
      }
      def score(df: org.apache.spark.sql.DataFrame,
          bin: org.apache.spark.sql.Column,
          order: Seq[org.apache.spark.sql.Column],
          name: String) =
        BinnedRank.belowAndN(df, Seq.empty, bin, order, lit(1L))
          .withColumn("r", col("below") + lit(1L))
          .withColumn(name, tile(5))
          .select(col("o_custkey"), col(name))
      val rs = score(cust.select("o_custkey", "rec_days"),
        (-col("rec_days")).cast("bigint"),
        Seq(col("rec_days").desc, col("o_custkey")), "r_score")
      val fs = score(cust.select("o_custkey", "freq"),
        col("freq").cast("bigint"),
        Seq(col("freq"), col("o_custkey")), "f_score")
      val ms = score(cust.select("o_custkey", "spend"),
        floor(col("spend") / lit(5000)).cast("bigint"),
        Seq(col("spend"), col("o_custkey")), "m_score")
      cust.select("o_custkey", "spend")
        .join(rs, "o_custkey").join(fs, "o_custkey").join(ms, "o_custkey")
        .groupBy("r_score", "f_score", "m_score")
        // mean in integer cents, tie-rounded once: round(double, 2) ties
        // diverge between engines (the x_dsir_weights lesson); a single
        // integer division of exact cents cannot
        .agg(count(lit(1)).as("customers"),
          (round(sum(round(col("spend") * 100).cast("bigint"))
            / count(lit(1)).cast("double")) / lit(100.0)).as("avg_spend"))
    },

    // HARMONIC (WEEKLY) REGRESSION on daily event counts: OLS fit of
    // c ~ a0 + a·cos(2πi/7) + b·sin(2πi/7) by closed-form 3×3 normal
    // equations (Cramer's rule on the 1-row moment frame — the basis is
    // not orthogonal over a non-multiple-of-7 span, so the full solve is
    // required). Amplitude/phase expose the weekly cycle x_seasonal_dow
    // tabulates; R² from one fitted-residual repass against the
    // broadcast coefficients.
    QDef("x_harmonic_fit",
      """WITH daily AS (
        |  SELECT CAST(ts AS DATE) AS dd, CAST(count(*) AS DOUBLE) AS c
        |  FROM events GROUP BY 1),
        |d0 AS (SELECT min(dd) AS start FROM daily),
        |pts AS (SELECT datediff('day', d0.start, dd) AS i, c
        |  FROM daily, d0),
        |basis AS (SELECT i, c,
        |  cos(6.283185307179586e0 * i / 7) AS x1,
        |  sin(6.283185307179586e0 * i / 7) AS x2
        |  FROM pts),
        |mo AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |  sum(x1) AS s1, sum(x2) AS s2, sum(x1 * x1) AS s11,
        |  sum(x2 * x2) AS s22, sum(x1 * x2) AS s12,
        |  sum(c) AS sy, sum(c * x1) AS sy1, sum(c * x2) AS sy2,
        |  avg(c) AS ybar
        |  FROM basis),
        |sol AS (SELECT n, ybar,
        |  n * (s11 * s22 - s12 * s12) - s1 * (s1 * s22 - s12 * s2)
        |    + s2 * (s1 * s12 - s11 * s2) AS det,
        |  sy * (s11 * s22 - s12 * s12) - s1 * (sy1 * s22 - s12 * sy2)
        |    + s2 * (sy1 * s12 - s11 * sy2) AS det0,
        |  n * (sy1 * s22 - sy2 * s12) - sy * (s1 * s22 - s12 * s2)
        |    + s2 * (s1 * sy2 - sy1 * s2) AS det1,
        |  n * (s11 * sy2 - s12 * sy1) - s1 * (s1 * sy2 - sy1 * s2)
        |    + sy * (s1 * s12 - s11 * s2) AS det2
        |  FROM mo),
        |coef AS (SELECT n, ybar, round(det0 / det, 6) AS a0,
        |  round(det1 / det, 6) AS a, round(det2 / det, 6) AS b
        |  FROM sol),
        |fit AS (SELECT coef.n, coef.a0, coef.a, coef.b,
        |  sum(pow(basis.c - (coef.a0 + coef.a * basis.x1
        |    + coef.b * basis.x2), 2)) AS sse,
        |  sum(pow(basis.c - coef.ybar, 2)) AS sst
        |  FROM basis, coef GROUP BY 1, 2, 3, 4, coef.ybar)
        |SELECT n AS n_days, a0,
        |  round(sqrt(a * a + b * b), 4) AS amplitude,
        |  round(atan2(b, a) * 7 / 6.283185307179586e0, 4) AS phase_days,
        |  round(1 - sse / sst, 6) AS r2
        |FROM fit""".stripMargin) { (s, d) =>
      val daily = Tables(s, d).events
        .groupBy(to_date(col("ts")).as("dd"))
        .agg(count(lit(1)).cast("double").as("c"))
      val d0 = daily.agg(min(col("dd")).as("start"))
      val basis = daily.crossJoin(broadcast(d0))
        .select(datediff(col("dd"), col("start")).as("i"), col("c"))
        .withColumn("x1", cos(lit(6.283185307179586) * col("i") / lit(7)))
        .withColumn("x2", sin(lit(6.283185307179586) * col("i") / lit(7)))
      val mo = basis.agg(count(lit(1)).as("n"),
        sum(col("x1")).as("s1"), sum(col("x2")).as("s2"),
        sum(col("x1") * col("x1")).as("s11"),
        sum(col("x2") * col("x2")).as("s22"),
        sum(col("x1") * col("x2")).as("s12"),
        sum(col("c")).as("sy"), sum(col("c") * col("x1")).as("sy1"),
        sum(col("c") * col("x2")).as("sy2"), avg(col("c")).as("ybar"))
      val det = col("n") * (col("s11") * col("s22") - col("s12") * col("s12")) -
        col("s1") * (col("s1") * col("s22") - col("s12") * col("s2")) +
        col("s2") * (col("s1") * col("s12") - col("s11") * col("s2"))
      val det0 = col("sy") * (col("s11") * col("s22") - col("s12") * col("s12")) -
        col("s1") * (col("sy1") * col("s22") - col("s12") * col("sy2")) +
        col("s2") * (col("sy1") * col("s12") - col("s11") * col("sy2"))
      val det1 = col("n") * (col("sy1") * col("s22") - col("sy2") * col("s12")) -
        col("sy") * (col("s1") * col("s22") - col("s12") * col("s2")) +
        col("s2") * (col("s1") * col("sy2") - col("sy1") * col("s2"))
      val det2 = col("n") * (col("s11") * col("sy2") - col("s12") * col("sy1")) -
        col("s1") * (col("s1") * col("sy2") - col("sy1") * col("s2")) +
        col("sy") * (col("s1") * col("s12") - col("s11") * col("s2"))
      val coef = mo.select(col("n"), col("ybar"),
        round(det0 / det, 6).as("a0"), round(det1 / det, 6).as("a"),
        round(det2 / det, 6).as("b"))
      val fit = basis.crossJoin(broadcast(coef))
        .groupBy("n", "a0", "a", "b", "ybar")
        .agg(
          sum(pow(col("c") - (col("a0") + col("a") * col("x1")
            + col("b") * col("x2")), 2)).as("sse"),
          sum(pow(col("c") - col("ybar"), 2)).as("sst"))
      fit.select(col("n").as("n_days"), col("a0"),
        round(sqrt(col("a") * col("a") + col("b") * col("b")), 4)
          .as("amplitude"),
        round(atan2(col("b"), col("a")) * lit(7) / lit(6.283185307179586), 4)
          .as("phase_days"),
        round(lit(1) - col("sse") / col("sst"), 6).as("r2"))
    },

    // MCNEMAR'S PAIRED TEST on the x_cohens_kappa raters — do high-price
    // and high-priority flags disagree symmetrically? Chi² with the
    // continuity correction from the two discordant cells of ONE
    // indicator aggregate.
    QDef("x_mcnemar",
      """WITH r AS (SELECT
        |  CASE WHEN o_totalprice >= 150000 THEN 1 ELSE 0 END AS a,
        |  CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
        |    THEN 1 ELSE 0 END AS b
        |  FROM orders),
        |s AS (SELECT CAST(sum(a * (1 - b)) AS BIGINT) AS n10,
        |  CAST(sum((1 - a) * b) AS BIGINT) AS n01 FROM r)
        |SELECT n10, n01,
        |  round(pow(abs(n10 - n01) - 1, 2)
        |    / CAST(n10 + n01 AS DOUBLE), 4) AS chi2
        |FROM s""".stripMargin) { (s, d) =>
      val r = Tables(s, d).orders.select(
        when(col("o_totalprice") >= 150000, 1L).otherwise(0L).as("a"),
        when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L)
          .otherwise(0L).as("b"))
      val st = r.agg(sum(col("a") * (lit(1) - col("b"))).as("n10"),
        sum((lit(1) - col("a")) * col("b")).as("n01"))
      st.select(col("n10"), col("n01"),
        round(pow(abs(col("n10") - col("n01")) - lit(1), 2)
          / (col("n10") + col("n01")).cast("double"), 4).as("chi2"))
    },

    // CRONBACH'S ALPHA over three per-order "items" (quantity sum,
    // extended-price sum in k-units, discount-weighted price): internal
    // consistency α = k/(k−1)·(1 − Σσ²ᵢ/σ²_total) from ONE per-order
    // aggregate followed by ONE variance pass — no row-level data leaves
    // the executors twice (the x_ab_ttest posture).
    QDef("x_cronbach_alpha",
      """WITH it AS (
        |  SELECT l_orderkey, sum(l_quantity) AS i1,
        |    sum(l_extendedprice) / 1000 AS i2,
        |    sum(l_extendedprice * l_discount) / 100 AS i3
        |  FROM lineitem GROUP BY 1),
        |v AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |  var_samp(i1) AS v1, var_samp(i2) AS v2, var_samp(i3) AS v3,
        |  var_samp(i1 + i2 + i3) AS vt
        |  FROM it)
        |SELECT n AS n_orders,
        |  round(v1 + v2 + v3, 4) AS sum_item_var, round(vt, 4) AS total_var,
        |  round(1.5e0 * (1 - (v1 + v2 + v3) / vt), 6) AS alpha
        |FROM v""".stripMargin) { (s, d) =>
      val it = Tables(s, d).lineitem.groupBy("l_orderkey").agg(
        sum(col("l_quantity")).as("i1"),
        (sum(col("l_extendedprice")) / lit(1000)).as("i2"),
        (sum(col("l_extendedprice") * col("l_discount")) / lit(100)).as("i3"))
      val v = it.agg(count(lit(1)).as("n"),
        var_samp(col("i1")).as("v1"), var_samp(col("i2")).as("v2"),
        var_samp(col("i3")).as("v3"),
        var_samp(col("i1") + col("i2") + col("i3")).as("vt"))
      v.select(col("n").as("n_orders"),
        round(col("v1") + col("v2") + col("v3"), 4).as("sum_item_var"),
        round(col("vt"), 4).as("total_var"),
        round(lit(1.5) * (lit(1) - (col("v1") + col("v2") + col("v3"))
          / col("vt")), 6).as("alpha"))
    }
  )
}
