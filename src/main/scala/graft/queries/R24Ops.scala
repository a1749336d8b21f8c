package graft.queries

import graft.{QDef, Tables}
import org.apache.spark.sql.functions._

/** Round-24 batch: four more SQL-surface twins on the shared portable
  * statistic texts (Kruskal-Wallis, Jarque-Bera, Cochran's Q, odds
  * ratio — the CcSql twin contract), plus Theil's U uncertainty
  * coefficient over the (priority × status) contingency.
  */
object R24Ops {

  /** Theil's U as ONE portable SQL text — oracle of `x_theil_u` and
    * whole query of the `x_sql_theilu` twin. */
  private[queries] val TheilUSql =
    """WITH cells AS (
      |  SELECT o_orderpriority AS p, o_orderstatus AS s,
      |    CAST(count(*) AS BIGINT) AS c
      |  FROM orders GROUP BY 1, 2),
      |n AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM cells),
      |hj AS (SELECT -sum((c / CAST(n.n AS DOUBLE))
      |    * ln(c / CAST(n.n AS DOUBLE))) AS hps
      |  FROM cells, n),
      |hp AS (SELECT -sum((cp / CAST(n.n AS DOUBLE))
      |    * ln(cp / CAST(n.n AS DOUBLE))) AS hp
      |  FROM (SELECT p, CAST(sum(c) AS BIGINT) AS cp FROM cells
      |        GROUP BY 1), n),
      |hs AS (SELECT -sum((cs / CAST(n.n AS DOUBLE))
      |    * ln(cs / CAST(n.n AS DOUBLE))) AS hs
      |  FROM (SELECT s, CAST(sum(c) AS BIGINT) AS cs FROM cells
      |        GROUP BY 1), n)
      |SELECT n.n, round(hs.hs, 6) AS h_status, round(hp.hp, 6)
      |    AS h_priority,
      |  round(hj.hps, 6) AS h_joint,
      |  round((hs.hs + hp.hp - hj.hps) / hs.hs, 6) AS theil_u
      |FROM n, hj, hp, hs""".stripMargin

  val defs: Seq[QDef] = Seq(

    // Kruskal-Wallis through Spark's SQL parser — same shared text. The
    // parsed plan carries the oracle's unpartitioned distinct-price
    // window (carved out like the x_sql_mannwhitney twin).
    QDef("x_sql_kruskal", R14Ops.KruskalSql) { (s, d) =>
      SqlSurface.viewed(s, d, "orders", "customer")
      // r15: the multiply-referenced gv collapse materialized once (the
      // x_sql_mp from-birth rule) — the one-string form re-ran the
      // orders⋈customer collapse per CTE reference (28 scans in
      // plans/r15/x_sql_kruskal_before.txt)
      s.sql(s"WITH ${R14Ops.KruskalGvCtes} SELECT g, v, c FROM gv")
        .transform(SqlSurface.materialized("gv"))
      s.sql(s"WITH ${R14Ops.KruskalTailCtes}")
    },

    // Jarque-Bera through Spark's SQL parser, same shared text.
    QDef("x_sql_jb", R14Ops.JbSql) { (s, d) =>
      SqlSurface.viewed(s, d, "orders", "customer")
      s.sql(R14Ops.JbSql)
    },

    // Cochran's Q through Spark's SQL parser, same shared text.
    QDef("x_sql_cochran", R22Ops.CochranSql) { (s, d) =>
      SqlSurface.viewed(s, d, "orders")
      s.sql(R22Ops.CochranSql)
    },

    // Odds ratio through Spark's SQL parser, same shared text.
    QDef("x_sql_odds", R22Ops.OddsSql) { (s, d) =>
      SqlSurface.viewed(s, d, "orders")
      s.sql(R22Ops.OddsSql)
    },

    // Theil's U through Spark's SQL parser, same shared text — the
    // SQL-surface twin the TheilUSql comment promises.
    QDef("x_sql_theilu", TheilUSql) { (s, d) =>
      SqlSurface.viewed(s, d, "orders")
      s.sql(TheilUSql)
    },

    // THEIL'S U (uncertainty coefficient): how much does knowing the
    // order priority reduce uncertainty about the status — the
    // ASYMMETRIC complement of x_cramers_v / x_mutual_info, U(status |
    // priority) = (H(S) + H(P) − H(P,S)) / H(S). ONE 15-cell contingency
    // aggregate; marginal entropies from exact integer ratios.
    QDef("x_theil_u", TheilUSql) { (s, d) =>
      val cells = Tables(s, d).orders
        .groupBy(col("o_orderpriority").as("p"),
          col("o_orderstatus").as("st"))
        .agg(count(lit(1)).as("c"))
      val n = cells.agg(sum(col("c")).as("n"))
      def ent(df: org.apache.spark.sql.DataFrame, cnt: String, out: String) =
        df.crossJoin(broadcast(n))
          .agg((-sum((col(cnt) / col("n").cast("double"))
            * log(col(cnt) / col("n").cast("double")))).as(out))
      val hj = ent(cells, "c", "hps")
      val hp = ent(cells.groupBy("p").agg(sum(col("c")).as("cp")), "cp", "hp")
      val hs = ent(cells.groupBy("st").agg(sum(col("c")).as("cs")), "cs", "hs")
      n.crossJoin(broadcast(hj)).crossJoin(broadcast(hp))
        .crossJoin(broadcast(hs))
        .select(col("n"), round(col("hs"), 6).as("h_status"),
          round(col("hp"), 6).as("h_priority"),
          round(col("hps"), 6).as("h_joint"),
          round((col("hs") + col("hp") - col("hps")) / col("hs"), 6)
            .as("theil_u"))
    }
  )
}
