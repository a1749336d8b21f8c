package graft.queries

import graft.{QDef, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-11 batch: distribution-comparison statistics on the binned-CDF
  * machinery (the `ops/BinnedRank` posture: value-domain bin frames take
  * the only unpartitioned windows, the data sorts in per-bin slices).
  */
object R11Ops {

  /** Two-sample KS text — PORTABLE, the binned two-level CDF form (the
    * IsotonicSql/GiniSql posture: even the SQL-parsed plan's only
    * unpartitioned window orders the ⌊v/1000⌋ price-bin frame, never the
    * distinct-value frame). Shared verbatim by the `x_sql_ks` twin. */
  private[queries] val KsSql =
    """WITH oc AS (
      |  SELECT c.c_mktsegment AS g, o.o_totalprice AS v
      |  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
      |  WHERE c.c_mktsegment IN ('BUILDING', 'MACHINERY')),
      |hist AS (
      |  SELECT v,
      |    sum(CASE WHEN g = 'BUILDING' THEN 1 ELSE 0 END) AS c1,
      |    sum(CASE WHEN g = 'MACHINERY' THEN 1 ELSE 0 END) AS c2
      |  FROM oc GROUP BY 1),
      |hb AS (SELECT v, c1, c2, CAST(floor(v / 1000) AS BIGINT) AS bin
      |  FROM hist),
      |binpre AS (
      |  SELECT bin,
      |    coalesce(sum(bc1) OVER (ORDER BY bin
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS b1,
      |    coalesce(sum(bc2) OVER (ORDER BY bin
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS b2,
      |    sum(bc1) OVER () AS n1, sum(bc2) OVER () AS n2
      |  FROM (SELECT bin, sum(c1) AS bc1, sum(c2) AS bc2 FROM hb GROUP BY 1)),
      |cum AS (
      |  SELECT hb.v, bp.n1, bp.n2,
      |    bp.b1 + sum(hb.c1) OVER (PARTITION BY hb.bin ORDER BY hb.v) AS a1,
      |    bp.b2 + sum(hb.c2) OVER (PARTITION BY hb.bin ORDER BY hb.v) AS a2
      |  FROM hb JOIN binpre bp ON hb.bin = bp.bin),
      |d AS (
      |  SELECT v, n1, n2,
      |    round(abs(CAST(a1 AS DOUBLE) / n1 - CAST(a2 AS DOUBLE) / n2), 6)
      |      AS dv
      |  FROM cum)
      |SELECT CAST(n1 AS BIGINT) AS n1, CAST(n2 AS BIGINT) AS n2,
      |  dv AS d_stat, v AS at_value
      |FROM d ORDER BY dv DESC, v DESC LIMIT 1""".stripMargin

  val defs: Seq[QDef] = Seq(

    // TWO-SAMPLE KOLMOGOROV-SMIRNOV: D = max |F₁(v) − F₂(v)| between the
    // BUILDING and MACHINERY segments' order-price distributions —
    // distribution drift detection with an exact statistic. Both ECDFs
    // come from ONE joint distinct-value histogram carrying a count per
    // sample (values seen by only one sample get an explicit 0, so the
    // step functions align), prefix-summed with the binned two-level
    // pattern: the unpartitioned window runs over ⌊v/1000⌋ price bins
    // (≤500 rows), the per-value cumulative is (bin, v)-partitioned. The
    // divisions are integer/integer in IEEE doubles — bit-identical in
    // both engines — so the argmax tie-break on (rounded D, v) agrees.
    QDef("x_ks_test", KsSql) { (s, d) =>
      val t = Tables(s, d)
      val oc = t.orders
        .join(broadcast(t.customer.select("c_custkey", "c_mktsegment")),
          col("o_custkey") === col("c_custkey"))
        .filter(col("c_mktsegment").isin("BUILDING", "MACHINERY"))
        .select(col("c_mktsegment").as("g"), col("o_totalprice").as("v"))
      val hist = oc.groupBy("v").agg(
        sum(when(col("g") === "BUILDING", 1L).otherwise(0L)).as("c1"),
        sum(when(col("g") === "MACHINERY", 1L).otherwise(0L)).as("c2"))
        .withColumn("bin", floor(col("v") / lit(1000)).cast("bigint"))
      // bounded bin frame: prefix counts of both samples + the totals
      val wBinPre = Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, -1)
      val wAll = Window.partitionBy(lit(1))
      val binPre = hist.groupBy("bin")
        .agg(sum(col("c1")).as("bc1"), sum(col("c2")).as("bc2"))
        .withColumn("b1", coalesce(sum(col("bc1")).over(wBinPre), lit(0L)))
        .withColumn("b2", coalesce(sum(col("bc2")).over(wBinPre), lit(0L)))
        .withColumn("n1", sum(col("bc1")).over(wAll))
        .withColumn("n2", sum(col("bc2")).over(wAll))
        .select("bin", "b1", "b2", "n1", "n2")
      // per-value INCLUSIVE cumulative, (bin)-partitioned
      val wWithin = Window.partitionBy("bin").orderBy("v")
        .rowsBetween(Window.unboundedPreceding, 0)
      val d2 = hist
        .withColumn("w1", sum(col("c1")).over(wWithin))
        .withColumn("w2", sum(col("c2")).over(wWithin))
        .join(binPre, "bin")
        .select(col("v"), col("n1"), col("n2"),
          round(abs((col("b1") + col("w1")).cast("double") / col("n1")
            - (col("b2") + col("w2")).cast("double") / col("n2")), 6).as("dv"))
      d2.agg(
          max(struct(col("dv"), col("v"), col("n1"), col("n2"))).as("top"))
        .select(col("top.n1").as("n1"), col("top.n2").as("n2"),
          col("top.dv").as("d_stat"), col("top.v").as("at_value"))
    },

    // The KS statistic through Spark's SQL parser — ONE portable text
    // shared verbatim with the DuckDB oracle (the SQL-twin contract).
    QDef("x_sql_ks", KsSql) { (s, d) =>
      SqlSurface.viewed(s, d, "orders", "customer")
      s.sql(KsSql)
    },

    // CRAMÉR'S V: strength of association between two categoricals
    // (order priority × order status) — the normalized-χ² feature-
    // screening statistic. One contingency aggregate (map-side combined,
    // 15 cells), margins re-derived from the cell frame (KB), χ² summed
    // in a deterministic (priority, status) order via the rounded-term
    // trick so the two engines' float sums agree before the release.
    QDef("x_cramers_v",
      """WITH cells AS (
        |  SELECT o_orderpriority AS p, o_orderstatus AS st,
        |    CAST(count(*) AS DOUBLE) AS c
        |  FROM orders GROUP BY 1, 2),
        |tot AS (SELECT sum(c) AS n, count(DISTINCT p) AS r,
        |  count(DISTINCT st) AS k FROM cells),
        |rm AS (SELECT p, sum(c) AS rc FROM cells GROUP BY 1),
        |cm AS (SELECT st, sum(c) AS cc FROM cells GROUP BY 1),
        |terms AS (
        |  SELECT round((cells.c - rm.rc * cm.cc / tot.n)
        |      * (cells.c - rm.rc * cm.cc / tot.n) / (rm.rc * cm.cc / tot.n), 9)
        |      AS t2, tot.n AS n, tot.r AS r, tot.k AS k
        |  FROM cells
        |  JOIN rm ON cells.p = rm.p JOIN cm ON cells.st = cm.st
        |  CROSS JOIN tot)
        |SELECT CAST(n AS BIGINT) AS n_orders,
        |  round(sum(t2), 6) AS chi2,
        |  round(sqrt(sum(t2) / (n * (least(r, k) - 1))), 6) AS cramers_v
        |FROM terms GROUP BY n, r, k""".stripMargin) { (s, d) =>
      val cells = Tables(s, d).orders
        .groupBy(col("o_orderpriority").as("p"), col("o_orderstatus").as("st"))
        .agg(count(lit(1)).cast("double").as("c"))
      val tot = cells.agg(sum(col("c")).as("n"),
        countDistinct(col("p")).as("r"), countDistinct(col("st")).as("k"))
      val rm = cells.groupBy("p").agg(sum(col("c")).as("rc"))
      val cm = cells.groupBy("st").agg(sum(col("c")).as("cc"))
      val terms = cells
        .join(broadcast(rm), "p").join(broadcast(cm), "st")
        .crossJoin(broadcast(tot))
        .select(round(
            (col("c") - col("rc") * col("cc") / col("n"))
              * (col("c") - col("rc") * col("cc") / col("n"))
              / (col("rc") * col("cc") / col("n")), 9).as("t2"),
          col("n"), col("r"), col("k"))
      terms.groupBy("n", "r", "k")
        .agg(round(sum(col("t2")), 6).as("chi2"),
          round(sqrt(sum(col("t2")) / (col("n") * (least(col("r"), col("k")) - 1))), 6)
            .as("cramers_v"))
        .select(col("n").cast("bigint").as("n_orders"), col("chi2"),
          col("cramers_v"))
    }
  )
}
