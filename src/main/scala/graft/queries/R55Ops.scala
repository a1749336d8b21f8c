package graft.queries

import graft.{QDef, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-55 batch: two data-quality monitors that complete the SPC /
  * forensic family — the EWMA control chart, the small-persistent-shift detector
  * that Shewhart/I-MR charts miss (x_cusum_mean is its one-sided
  * cousin; x_benford in R10Ops already covers the forensic digit
  * screen).
  *
  * Scale posture: one corpus collapse (daily counts); all chart
  * statistics run on the bounded calendar frame. The EWMA
  * recursion is made portable by FINITE MEMORY: 60 lag terms whose
  * weights 0.8^k are precomputed in Scala and embedded as decimal
  * LITERALS in both texts, so neither engine ever calls pow() — the
  * weights are bit-identical by parsing, the tail below 0.8^60 ≈
  * 1.5e-6 is documented truncation, and the warm-up renormalizes by
  * the available-weight mass exactly like R5's x_ewma. */
object R55Ops {

  /** λ for the EWMA chart; weights embedded as literals. */
  private val Lam = 0.2
  private val EwK = 60
  private val W: IndexedSeq[Double] =
    (0 until EwK).map(k => math.pow(1.0 - Lam, k))

  /** A Double as a DOUBLE literal both engines parse identically —
    * e0-suffixed unless toString already carries an exponent (a bare
    * decimal like `0.8` would parse as DECIMAL in Spark SQL, the
    * x_sql_dsir dtype trap). */
  private def dl(v: Double): String = {
    val s = v.toString
    if (s.contains("E")) s else s + "e0"
  }

  /** Finite-memory EWMA control chart on daily order counts as ONE
    * portable text — oracle of `x_ewma_chart`. z_t = Σ w_k·y_{t−k} /
    * Σ w_k over available lags (w_k literal), μ and σ from exact
    * BIGINT sums, time-varying limits μ ± 3·σ·sqrt(λ/(2−λ)·
    * (1−(1−λ)^{2t̃})) with t̃ = min(t, 59) — the table lookup clamps to
    * its last index, W(59), so rows with t ≥ 60 all read W(59)² =
    * (1−λ)^118 ≈ 0 (the asymptotic-variance inflation factor has long
    * converged there); the (1−λ)^{2t̃} comes from the SAME literal
    * table (w_{t̃}²). Released: the 1-row chart summary. */
  private[queries] val EwmaChartSql = {
    val num = (1 until EwK).map(k =>
      s"coalesce(lag(y, $k) OVER w, 0) * ${dl(W(k))}")
      .mkString("y + ", " + ", "")
    val den = (1 until EwK).map(k =>
      s"CASE WHEN lag(y, $k) OVER w IS NOT NULL THEN ${dl(W(k))} ELSE 0 END")
      .mkString("1 + ", " + ", "")
    val wsq = (1 to EwK).map { t =>
      val tt = math.min(t, EwK - 1)
      s"WHEN $t THEN ${dl(W(tt) * W(tt))}"
    }.mkString(s"CASE least(t, $EwK) ", " ",
      s" ELSE ${dl(W(EwK - 1) * W(EwK - 1))} END")
    s"""WITH cal AS (SELECT CAST(o_orderdate AS DATE) AS d,
       |  CAST(count(*) AS BIGINT) AS y FROM orders GROUP BY 1),
       |mo AS (SELECT CAST(count(*) AS BIGINT) AS n,
       |  CAST(sum(y) AS BIGINT) AS s,
       |  CAST(sum(y * y) AS BIGINT) AS q FROM cal),
       |ms AS (SELECT n, CAST(s AS DOUBLE) / n AS mu,
       |  sqrt((CAST(n AS DOUBLE) * q - CAST(s AS DOUBLE) * s)
       |    / (CAST(n AS DOUBLE) * (n - 1))) AS sd FROM mo),
       |z AS (SELECT d, y,
       |  CAST(row_number() OVER w AS BIGINT) AS t,
       |  ($num) / ($den) AS zt
       |  FROM cal WINDOW w AS (ORDER BY d)),
       |fl AS (SELECT z.d, z.t, z.zt, ms.mu,
       |  3.0e0 * ms.sd * sqrt(${dl(Lam)} / ${dl(2.0 - Lam)}
       |    * (1.0e0 - ($wsq))) AS hw
       |  FROM z, ms)
       |SELECT CAST(count(*) AS BIGINT) AS n_days,
       |  round(max(mu), 6) AS center,
       |  CAST(sum(CASE WHEN zt > mu + hw OR zt < mu - hw
       |    THEN 1 ELSE 0 END) AS BIGINT) AS n_beyond,
       |  round(max(abs(zt - mu) / hw), 4) AS max_score
       |FROM fl""".stripMargin
  }

  val defs: Seq[QDef] = Seq(

    // EWMA CHART: the small-shift detector — 60 literal-weight lag
    // terms over the carved-out calendar frame, exact-integer μ/σ,
    // time-varying 3σ limits with the variance-inflation warm-up.
    QDef("x_ewma_chart", EwmaChartSql) { (s, d) =>
      val cal = Tables(s, d).orders
        .groupBy(col("o_orderdate").cast("date").as("d"))
        .agg(count(lit(1)).as("y"))
      val ms = cal
        .agg(count(lit(1)).as("n"), sum("y").as("s"),
          sum(col("y") * col("y")).as("q"))
        .select(col("n"),
          (col("s").cast("double") / col("n")).as("mu"),
          sqrt((col("n").cast("double") * col("q")
            - col("s").cast("double") * col("s"))
            / (col("n").cast("double") * (col("n") - 1))).as("sd"))
      val w = Window.orderBy("d")
      val num = (1 until EwK).foldLeft(col("y").cast("double")) {
        (acc, k) => acc + coalesce(lag("y", k).over(w), lit(0)) * W(k)
      }
      val den = (1 until EwK).foldLeft(lit(1.0)) { (acc, k) =>
        acc + when(lag("y", k).over(w).isNotNull, lit(W(k)))
          .otherwise(lit(0))
      }
      val z = cal.select(col("d"), col("y"),
        row_number().over(w).cast("bigint").as("t"),
        (num / den).as("zt"))
      val wsq = {
        val base = least(col("t"), lit(EwK.toLong))
        (1 to EwK).foldLeft(
          when(lit(false), lit(0.0))) { (acc, t) =>
          val tt = math.min(t, EwK - 1)
          acc.when(base === t, lit(W(tt) * W(tt)))
        }.otherwise(lit(W(EwK - 1) * W(EwK - 1)))
      }
      val fl = z.crossJoin(broadcast(ms))
        .select(col("d"), col("t"), col("zt"), col("mu"),
          (lit(3.0) * col("sd") * sqrt(lit(Lam) / lit(2.0 - Lam)
            * (lit(1.0) - wsq))).as("hw"))
      fl.agg(count(lit(1)).as("n_days"),
        round(max("mu"), 6).as("center"),
        sum(when(col("zt") > col("mu") + col("hw")
          || col("zt") < col("mu") - col("hw"), 1).otherwise(0))
          .cast("bigint").as("n_beyond"),
        round(max(abs(col("zt") - col("mu")) / col("hw")), 4)
          .as("max_score"))
    })
}
