package graft.queries

import graft.{QDef, Tables}
import graft.ops.BinnedRank
import org.apache.spark.sql.functions._

/** Round-21 batch: community quality (directed modularity by region),
  * edge reciprocity, eccentricity/diameter/radius (completing the
  * centrality family), ABC spend classification (the business cut of
  * the Lorenz machinery — prefix sums of CENTS through BinnedRank, not
  * counts), and two-sample QQ deciles. Graph state stays |V|²-bounded
  * after the one fact-scale edge pass; rank work stays binned.
  */
object R21Ops {

  private val EdgeSql =
    """WITH e0 AS (
      |  SELECT DISTINCT s.s_nationkey AS src, c.c_nationkey AS dst
      |  FROM lineitem l
      |  JOIN orders o ON l.l_orderkey = o.o_orderkey
      |  JOIN customer c ON o.o_custkey = c.c_custkey
      |  JOIN supplier s ON l.l_suppkey = s.s_suppkey
      |  WHERE l.l_extendedprice > 104500),
      |e AS (SELECT src, dst FROM e0 WHERE src <> dst)""".stripMargin

  private def edges(s: org.apache.spark.sql.SparkSession, d: String) = {
    val t = Tables(s, d)
    t.lineitem.filter(col("l_extendedprice") > 104500)
      .join(t.orders, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(t.customer.select("c_custkey", "c_nationkey")),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(t.supplier.select("s_suppkey", "s_nationkey")),
        col("l_suppkey") === col("s_suppkey"))
      .select(col("s_nationkey").as("src"), col("c_nationkey").as("dst"))
      .filter(col("src") =!= col("dst"))
      .distinct()
  }

  val defs: Seq[QDef] = Seq(

    // DIRECTED MODULARITY of the region partition on the high-value
    // trade graph: Q = Σ_c (e_cc/m − (out_c/m)(in_c/m)) — does trade
    // cluster within regions? The community assignment is the broadcast
    // nation→region dimension; all post-edge frames are region-sized.
    QDef("x_graph_modularity",
      EdgeSql + """,
        |r AS (SELECT n_nationkey AS id, n_regionkey AS reg FROM nation),
        |le AS (SELECT a.reg AS sreg, b.reg AS dreg FROM e
        |  JOIN r a ON e.src = a.id JOIN r b ON e.dst = b.id),
        |m AS (SELECT CAST(count(*) AS BIGINT) AS m FROM le),
        |byreg AS (SELECT reg,
        |  CAST(sum(CASE WHEN sreg = reg AND dreg = reg THEN 1 ELSE 0 END)
        |    AS BIGINT) AS internal,
        |  CAST(sum(CASE WHEN sreg = reg THEN 1 ELSE 0 END) AS BIGINT)
        |    AS out_deg,
        |  CAST(sum(CASE WHEN dreg = reg THEN 1 ELSE 0 END) AS BIGINT)
        |    AS in_deg
        |  FROM le CROSS JOIN (SELECT DISTINCT reg FROM r) regs(reg)
        |  GROUP BY 1),
        |q AS (SELECT round(sum(internal / CAST(m.m AS DOUBLE)
        |    - (out_deg / CAST(m.m AS DOUBLE))
        |      * (in_deg / CAST(m.m AS DOUBLE))), 6) AS modularity
        |  FROM byreg, m)
        |SELECT byreg.reg AS region, byreg.internal, byreg.out_deg,
        |  byreg.in_deg,
        |  round(internal / CAST(m.m AS DOUBLE)
        |    - (out_deg / CAST(m.m AS DOUBLE))
        |      * (in_deg / CAST(m.m AS DOUBLE)), 6) AS contribution,
        |  q.modularity
        |FROM byreg, m, q""".stripMargin) { (s, d) =>
      val t = Tables(s, d)
      val r = t.nation.select(col("n_nationkey").as("id"),
        col("n_regionkey").as("reg"))
      val le = edges(s, d)
        .join(broadcast(r.select(col("id"), col("reg").as("sreg"))),
          col("src") === col("id")).drop("id")
        .join(broadcast(r.select(col("id"), col("reg").as("dreg"))),
          col("dst") === col("id")).drop("id")
        .select("sreg", "dreg")
      val m = le.agg(count(lit(1)).as("m"))
      val regs = r.select(col("reg")).distinct()
      val byreg = le.crossJoin(broadcast(regs))
        .groupBy("reg").agg(
          sum(when(col("sreg") === col("reg") && col("dreg") === col("reg"),
            1L).otherwise(0L)).as("internal"),
          sum(when(col("sreg") === col("reg"), 1L).otherwise(0L))
            .as("out_deg"),
          sum(when(col("dreg") === col("reg"), 1L).otherwise(0L))
            .as("in_deg"))
      val contrib = col("internal") / col("m").cast("double") -
        ((col("out_deg") / col("m").cast("double"))
          * (col("in_deg") / col("m").cast("double")))
      val withM = byreg.crossJoin(broadcast(m))
      val q = withM.agg(round(sum(contrib), 6).as("modularity"))
      withM.crossJoin(broadcast(q))
        .select(col("reg").as("region"), col("internal"), col("out_deg"),
          col("in_deg"), round(contrib, 6).as("contribution"),
          col("modularity"))
    },

    // EDGE RECIPROCITY of the directed trade graph: the share of edges
    // whose reverse also exists — one bounded self-join of the
    // nation-sized edge list after the fact-scale derivation.
    QDef("x_graph_reciprocity",
      EdgeSql + """,
        |rec AS (SELECT CAST(count(*) AS BIGINT) AS r
        |  FROM e a JOIN e b ON a.src = b.dst AND a.dst = b.src),
        |m AS (SELECT CAST(count(*) AS BIGINT) AS m FROM e)
        |SELECT m.m AS n_edges, rec.r AS reciprocal_edges,
        |  round(rec.r / CAST(m.m AS DOUBLE), 6) AS reciprocity
        |FROM m, rec""".stripMargin) { (s, d) =>
      val e = edges(s, d).localCheckpoint()
      val b = e.select(col("src").as("bsrc"), col("dst").as("bdst"))
      val rec = e.join(broadcast(b),
          col("src") === col("bdst") && col("dst") === col("bsrc"))
        .agg(count(lit(1)).as("r"))
      val m = e.agg(count(lit(1)).as("m"))
      m.crossJoin(broadcast(rec))
        .select(col("m").as("n_edges"), col("r").as("reciprocal_edges"),
          round(col("r") / col("m").cast("double"), 6).as("reciprocity"))
    },

    // ECCENTRICITY / DIAMETER / RADIUS on the trade graph: per-source
    // max BFS distance from the same 8-round frontier iteration as
    // x_graph_closeness, with graph diameter and radius broadcast beside
    // each node — the remaining distance statistics of the family.
    QDef("x_graph_eccentricity",
      EdgeSql + """,
        |v AS (SELECT src AS id FROM e UNION SELECT dst FROM e),
        |rec AS (
        |  WITH RECURSIVE walk(s, v2, d) AS (
        |    SELECT id, id, 0 FROM v
        |    UNION
        |    SELECT w.s, e.dst, w.d + 1 FROM walk w JOIN e ON w.v2 = e.src
        |    WHERE w.d < 8)
        |  SELECT s, v2, min(d) AS dist FROM walk GROUP BY 1, 2),
        |ecc AS (SELECT s AS id, CAST(count(*) - 1 AS BIGINT) AS reachable,
        |  CAST(max(dist) AS INTEGER) AS eccentricity
        |  FROM rec GROUP BY 1),
        |g AS (SELECT CAST(max(eccentricity) AS INTEGER) AS diameter,
        |  CAST(min(eccentricity) AS INTEGER) AS radius FROM ecc)
        |SELECT ecc.id AS node, ecc.reachable, ecc.eccentricity,
        |  g.diameter, g.radius
        |FROM ecc, g""".stripMargin) { (s, d) =>
      val e = edges(s, d).localCheckpoint()
      val v = e.select(col("src").as("id"))
        .union(e.select(col("dst").as("id"))).distinct()
      var dist = v.select(col("id").as("s"), col("id").as("v2"),
        lit(0).as("d")).localCheckpoint()
      for (i <- 1 to 8) {
        val expanded = dist.join(broadcast(e), col("v2") === col("src"))
          .select(col("s"), col("dst").as("v2"), (col("d") + 1).as("d"))
        val next = dist.union(expanded)
          .groupBy("s", "v2").agg(min(col("d")).as("d"))
        dist = if (i % 2 == 0 || i == 8) next.localCheckpoint() else next
      }
      val ecc = dist.groupBy(col("s").as("id"))
        .agg((count(lit(1)) - 1).as("reachable"),
          max(col("d")).cast("int").as("eccentricity"))
      val g = ecc.agg(max(col("eccentricity")).cast("int").as("diameter"),
        min(col("eccentricity")).cast("int").as("radius"))
      ecc.crossJoin(broadcast(g))
        .select(col("id").as("node"), col("reachable"), col("eccentricity"),
          col("diameter"), col("radius"))
    },

    // ABC SPEND CLASSIFICATION: customers ranked by DESCENDING spend,
    // classified by the cumulative spend share BEFORE them (< 80% → A,
    // < 95% → B, else C) — the inventory-management cut of the Lorenz
    // machinery. The prefix sums run over CENTS through BinnedRank (the
    // cnt column is the customer's exact integer cents, so `below` IS
    // the preceding cumulative spend), keeping the classification exact
    // and the windows binned.
    QDef("x_abc_analysis",
      """WITH spend AS (
        |  SELECT o_custkey, round(sum(o_totalprice), 2) AS spend,
        |    CAST(round(sum(o_totalprice) * 100) AS BIGINT) AS cents
        |  FROM orders GROUP BY 1),
        |w AS (SELECT o_custkey, spend, cents,
        |  CAST(coalesce(sum(cents) OVER (ORDER BY spend DESC, o_custkey
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
        |    AS below,
        |  CAST(sum(cents) OVER () AS BIGINT) AS total
        |  FROM spend),
        |cl AS (SELECT spend, cents,
        |  CASE WHEN below / CAST(total AS DOUBLE) < 0.80e0 THEN 'A'
        |    WHEN below / CAST(total AS DOUBLE) < 0.95e0 THEN 'B'
        |    ELSE 'C' END AS abc_class,
        |  total
        |  FROM w)
        |SELECT abc_class, CAST(count(*) AS BIGINT) AS customers,
        |  round(sum(cents) / CAST(max(total) AS DOUBLE), 6) AS spend_share,
        |  round(min(spend), 2) AS min_spend, round(max(spend), 2) AS max_spend
        |FROM cl GROUP BY 1""".stripMargin) { (s, d) =>
      val spend = Tables(s, d).orders.groupBy("o_custkey")
        .agg(round(sum(col("o_totalprice")), 2).as("spend"),
          round(sum(col("o_totalprice")) * 100).cast("bigint").as("cents"))
      // BinnedRank over the CENTS measure: below = cumulative cents of
      // strictly-preceding (higher-spend) customers; n = total cents
      val ranked = BinnedRank.belowAndN(spend, Seq.empty,
        (-floor(col("spend") / lit(5000))).cast("bigint"),
        Seq(col("spend").desc, col("o_custkey")), col("cents"))
      val shareBefore = col("below") / col("n").cast("double")
      val cl = ranked.select(col("spend"), col("cents"), col("n"),
        when(shareBefore < 0.80, "A").when(shareBefore < 0.95, "B")
          .otherwise("C").as("abc_class"))
      cl.groupBy("abc_class")
        .agg(count(lit(1)).as("customers"),
          round(sum(col("cents")) / max(col("n")).cast("double"), 6)
            .as("spend_share"),
          round(min(col("spend")), 2).as("min_spend"),
          round(max(col("spend")), 2).as("max_spend"))
    },

    // TWO-SAMPLE QQ DECILES: interpolated decile quantiles of BUILDING
    // vs MACHINERY order prices side by side (the graphical companion of
    // x_ks_test / x_wasserstein) — 9 quantile_cont picks per segment
    // from ONE grouped BinnedRank histogram, pivoted on the 18-row
    // frame.
    QDef("x_qq_deciles",
      """WITH oc AS (
        |  SELECT c.c_mktsegment AS g, o.o_totalprice AS v
        |  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        |  WHERE c.c_mktsegment IN ('BUILDING', 'MACHINERY')),
        |hist AS (SELECT g, v, CAST(count(*) AS BIGINT) AS c
        |  FROM oc GROUP BY 1, 2),
        |r AS (SELECT g, v, c,
        |  CAST(coalesce(sum(c) OVER (PARTITION BY g ORDER BY v
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |    AS BIGINT) AS below,
        |  CAST(sum(c) OVER (PARTITION BY g) AS BIGINT) AS n
        |  FROM hist),
        |spine AS (SELECT unnest([1,2,3,4,5,6,7,8,9]) AS k),
        |qs AS (SELECT r.g, spine.k, max(r.n) AS n,
        |  max(CASE WHEN below < CAST(floor((n - 1) * k / 10.0e0 + 1)
        |      AS BIGINT)
        |    AND CAST(floor((n - 1) * k / 10.0e0 + 1) AS BIGINT) <= below + c
        |    THEN v END) AS vlo,
        |  max(CASE WHEN below < CAST(ceiling((n - 1) * k / 10.0e0 + 1)
        |      AS BIGINT)
        |    AND CAST(ceiling((n - 1) * k / 10.0e0 + 1) AS BIGINT)
        |      <= below + c
        |    THEN v END) AS vhi
        |  FROM r CROSS JOIN spine GROUP BY 1, 2),
        |qv AS (SELECT g, k,
        |  vlo + ((n - 1) * k / 10.0e0 + 1 - floor((n - 1) * k / 10.0e0 + 1))
        |    * (vhi - vlo) AS q
        |  FROM qs)
        |SELECT k AS decile,
        |  round(max(CASE WHEN g = 'BUILDING' THEN q END), 4) AS q_building,
        |  round(max(CASE WHEN g = 'MACHINERY' THEN q END), 4) AS q_machinery,
        |  round(max(CASE WHEN g = 'BUILDING' THEN q END)
        |    - max(CASE WHEN g = 'MACHINERY' THEN q END), 4) AS qq_diff
        |FROM qv GROUP BY 1""".stripMargin) { (s, d) =>
      val t = Tables(s, d)
      val oc = t.orders
        .join(broadcast(t.customer.select("c_custkey", "c_mktsegment")),
          col("o_custkey") === col("c_custkey"))
        .filter(col("c_mktsegment").isin("BUILDING", "MACHINERY"))
        .select(col("c_mktsegment").as("g"), col("o_totalprice").as("v"))
      val hist = oc.groupBy("g", "v").agg(count(lit(1)).as("c"))
      val r = BinnedRank.belowAndN(hist, Seq("g"),
        floor(col("v") / lit(1000)).cast("bigint"), Seq(col("v")), col("c"))
      val spine = (1 to 9).map(lit(_))
      val rs = r.withColumn("k", explode(array(spine: _*)))
      val p = (col("n") - lit(1)) * col("k") / lit(10.0) + lit(1)
      def pick(rank: org.apache.spark.sql.Column) =
        max(when(col("below") < rank && rank <= col("below") + col("c"),
          col("v")))
      val qs = rs.groupBy("g", "k").agg(max(col("n")).as("n2"),
        pick(floor(p).cast("bigint")).as("vlo"),
        pick(ceil(p).cast("bigint")).as("vhi"))
      val p2 = (col("n2") - lit(1)) * col("k") / lit(10.0) + lit(1)
      val qv = qs.select(col("g"), col("k"),
        (col("vlo") + (p2 - floor(p2)) * (col("vhi") - col("vlo"))).as("q"))
      qv.groupBy(col("k").as("decile"))
        .agg(round(max(when(col("g") === "BUILDING", col("q"))), 4)
          .as("q_building"),
          round(max(when(col("g") === "MACHINERY", col("q"))), 4)
            .as("q_machinery"),
          round(max(when(col("g") === "BUILDING", col("q")))
            - max(when(col("g") === "MACHINERY", col("q"))), 4)
            .as("qq_diff"))
    }
  )
}
