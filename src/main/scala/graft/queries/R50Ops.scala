package graft.queries

import graft.{QDef, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-50 batch: spatial statistics and economic structure — Moran's
  * I and Geary's C under a same-region contiguity weight matrix, the
  * Herfindahl-Hirschman concentration battery (with CR4), Theil's T/L
  * inequality decomposable entropy indexes, revealed comparative
  * advantage (the location quotient), and classical shift-share
  * decomposition of regional growth.
  *
  * Scale posture: each operator collapses the corpus in ONE aggregate
  * to a dim-bounded frame (25 nations / 25 brands / 125 region×brand
  * cells / a per-customer spend frame that GROUPS OUT at corpus scale
  * before a single global moment pass); spatial weights never
  * materialize — the same-region W folds into per-region grouped sums
  * ((Σz)² − Σz² for the cross term), so Moran/Geary cost no join at
  * all. Margins over the 125-cell frames use key-partitioned windows
  * (scale out); the only global windows order ≤25-row frames (carved
  * out + probed). */
object R50Ops {

  /** Moran's I of per-nation mean order value under the same-region
    * binary contiguity matrix, as ONE portable text — oracle of
    * `x_moran_i` and whole query of the `x_sql_moran` twin. The weight
    * matrix never materializes: with w_ij = 1 iff same region (i≠j),
    * ΣΣ w z_i z_j = Σ_regions[(Σz)² − Σz²] and the S₁/S₂ constants
    * collapse to region-size algebra. z-score under the normality
    * null (S₁ = 2S₀, S₂ = Σ 4(r−1)²). */
  private[queries] val MoranSql =
    """WITH nm AS (SELECT c.c_nationkey AS nk,
      |  round(avg(o.o_totalprice), 6) AS m
      |  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
      |  GROUP BY 1),
      |nr AS (SELECT nm.nk, n.n_regionkey AS rk, nm.m
      |  FROM nm JOIN nation n ON nm.nk = n.n_nationkey),
      |mu AS (SELECT round(avg(m), 6) AS mu,
      |  CAST(count(*) AS DOUBLE) AS n FROM nr),
      |z AS (SELECT nr.rk, nr.m - mu.mu AS z, mu.n FROM nr, mu),
      |reg AS (SELECT rk, max(n) AS n, CAST(count(*) AS DOUBLE) AS r,
      |  sum(z) AS sz, sum(z * z) AS szz FROM z GROUP BY 1),
      |gl AS (SELECT max(n) AS n,
      |  sum(r * (r - 1)) AS s0,
      |  sum(sz * sz - szz) AS cross_term,
      |  sum(szz) AS sz2,
      |  sum(r * 4 * (r - 1) * (r - 1)) AS s2 FROM reg),
      |i AS (SELECT n, s0, s2, sz2, cross_term,
      |  (n / s0) * cross_term / sz2 AS mi,
      |  -1.0e0 / (n - 1) AS ei FROM gl),
      |v AS (SELECT n, mi, ei,
      |  (n * n * (2 * s0) - n * s2 + 3.0e0 * s0 * s0)
      |    / (s0 * s0 * (n * n - 1)) - ei * ei AS vi
      |  FROM i)
      |SELECT CAST(n AS BIGINT) AS n_nations,
      |  round(mi, 6) AS moran_i, round(ei, 6) AS e_i,
      |  round((mi - ei) / sqrt(vi), 4) AS z_score
      |FROM v""".stripMargin

  /** Geary's C under the same weight matrix, as ONE portable text —
    * oracle of `x_geary_c` and whole query of the `x_sql_geary` twin.
    * ΣΣ w (z_i−z_j)² = Σ_regions 2(r·Σz² − (Σz)²); E[C] = 1; the
    * normality-null variance closes from the same S₀/S₁/S₂ algebra.
    * C < 1 ⇒ positive spatial association (Moran's mirror). */
  private[queries] val GearySql =
    """WITH nm AS (SELECT c.c_nationkey AS nk,
      |  round(avg(o.o_totalprice), 6) AS m
      |  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
      |  GROUP BY 1),
      |nr AS (SELECT nm.nk, n.n_regionkey AS rk, nm.m
      |  FROM nm JOIN nation n ON nm.nk = n.n_nationkey),
      |mu AS (SELECT round(avg(m), 6) AS mu,
      |  CAST(count(*) AS DOUBLE) AS n FROM nr),
      |z AS (SELECT nr.rk, nr.m - mu.mu AS z, mu.n FROM nr, mu),
      |reg AS (SELECT rk, max(n) AS n, CAST(count(*) AS DOUBLE) AS r,
      |  sum(z) AS sz, sum(z * z) AS szz FROM z GROUP BY 1),
      |gl AS (SELECT max(n) AS n,
      |  sum(r * (r - 1)) AS s0,
      |  sum(2 * (r * szz - sz * sz)) AS diff2,
      |  sum(szz) AS sz2,
      |  sum(r * 4 * (r - 1) * (r - 1)) AS s2 FROM reg),
      |c AS (SELECT n, s0, s2, sz2, diff2,
      |  ((n - 1) / (2.0e0 * s0)) * diff2 / sz2 AS gc FROM gl),
      |v AS (SELECT n, gc,
      |  ((2 * (2 * s0) + s2) * (n - 1) - 4.0e0 * s0 * s0)
      |    / (2.0e0 * (n + 1) * s0 * s0) AS vc
      |  FROM c)
      |SELECT CAST(n AS BIGINT) AS n_nations,
      |  round(gc, 6) AS geary_c,
      |  round((gc - 1.0e0) / sqrt(vc), 4) AS z_score
      |FROM v""".stripMargin

  /** Herfindahl-Hirschman concentration of brand revenue as ONE
    * portable text — oracle of `x_herfindahl` and whole query of the
    * `x_sql_hhi` twin. Revenue shares from one lineitem⋈part collapse
    * (cents-snapped); HHI on the 0-10000 scale, the normalized index,
    * the effective-competitor count 1/Σs², and CR4 via a top-4 rank
    * window over the 25-row share frame. */
  private[queries] val HhiSql =
    """WITH b AS (SELECT p.p_brand AS brand,
      |  round(sum(l.l_extendedprice), 2) AS rev
      |  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
      |  GROUP BY 1),
      |t AS (SELECT sum(rev) AS tot, CAST(count(*) AS DOUBLE) AS n
      |  FROM b),
      |s AS (SELECT b.brand, b.rev / t.tot AS sh, t.n,
      |  row_number() OVER (ORDER BY b.rev DESC, b.brand) AS rn
      |  FROM b, t),
      |h AS (SELECT max(n) AS n,
      |  sum(sh * sh) AS ss,
      |  sum(CASE WHEN rn <= 4 THEN sh ELSE 0 END) AS cr4 FROM s)
      |SELECT CAST(n AS BIGINT) AS n_brands,
      |  round(10000.0e0 * ss, 2) AS hhi,
      |  round((ss - 1.0e0 / n) / (1.0e0 - 1.0e0 / n), 6)
      |    AS hhi_normalized,
      |  round(1.0e0 / ss, 4) AS effective_competitors,
      |  round(cr4, 6) AS cr4
      |FROM h""".stripMargin

  /** Theil's T and L (mean log deviation) inequality of per-customer
    * total spend as ONE portable text — oracle of `x_theil_ineq` and
    * whole query of the `x_sql_theil_ineq` twin. The per-customer
    * frame GROUPS OUT of corpus scale (it shrinks with the key domain,
    * and partitions on it); one global moment pass collects n, Σx,
    * Σx·ln x, Σln x — both indexes close from those four sums
    * (T = Σx ln x/S − ln(S/n); L = ln(S/n) − Σln x/n). Spend
    * cents-snapped so both engines take ln of identical doubles. */
  private[queries] val TheilIneqSql =
    """WITH cs AS (SELECT o_custkey,
      |  round(sum(o_totalprice), 2) AS x FROM orders GROUP BY 1),
      |mo AS (SELECT CAST(count(*) AS DOUBLE) AS n, sum(x) AS s,
      |  sum(x * ln(x)) AS sxl, sum(ln(x)) AS sl FROM cs)
      |SELECT CAST(n AS BIGINT) AS n_customers,
      |  round(sxl / s - ln(s / n), 6) AS theil_t,
      |  round(ln(s / n) - sl / n, 6) AS theil_l
      |FROM mo""".stripMargin

  /** Revealed comparative advantage (location quotient) of brands
    * within regions as ONE portable text — oracle of `x_rca` and whole
    * query of the `x_sql_rca` twin. ONE four-way collapse (lineitem
    * ⋈ part for the brand axis, ⋈ orders ⋈ customer ⋈ nation for the
    * region axis — the x_als_factor join shape: one fact-fact orderkey
    * join, dims broadcast) to the 125-cell frame; margins via
    * key-partitioned windows (no global window anywhere); top-10
    * specialization cells released. */
  private[queries] val RcaSql =
    """WITH cell AS (SELECT n.n_regionkey AS rk, p.p_brand AS brand,
      |  round(sum(l.l_extendedprice), 2) AS rev
      |  FROM lineitem l
      |  JOIN part p ON l.l_partkey = p.p_partkey
      |  JOIN orders o ON l.l_orderkey = o.o_orderkey
      |  JOIN customer c ON o.o_custkey = c.c_custkey
      |  JOIN nation n ON c.c_nationkey = n.n_nationkey
      |  GROUP BY 1, 2),
      |m AS (SELECT rk, brand, rev,
      |  sum(rev) OVER (PARTITION BY rk) AS rev_r,
      |  sum(rev) OVER (PARTITION BY brand) AS rev_b,
      |  sum(rev) OVER (PARTITION BY 1=1) AS rev_t
      |  FROM cell),
      |q AS (SELECT rk, brand,
      |  round((rev / rev_r) / (rev_b / rev_t), 6) AS rca FROM m)
      |SELECT rk AS region, brand, rca FROM q
      |ORDER BY rca DESC, region, brand LIMIT 10""".stripMargin

  /** Shift-share decomposition of 1995→1996 regional revenue growth as
    * ONE portable text — oracle of `x_shift_share` and whole query of
    * the `x_sql_shift` twin. One (region × brand) collapse with
    * conditional year sums; national-growth, industry-mix, and
    * regional-shift components from broadcast-exempt global and
    * brand-partitioned marginal rates; the per-region identity
    * e₁ − e₀ = NS + IM + RS is spec-pinned. Cells empty in the base
    * year drop (matched-cell convention, like x_price_index). */
  private[queries] val ShiftSql =
    """WITH cell AS (SELECT n.n_regionkey AS rk, p.p_brand AS brand,
      |  round(sum(CASE WHEN year(o.o_orderdate) = 1995
      |    THEN l.l_extendedprice ELSE 0 END), 2) AS e0,
      |  round(sum(CASE WHEN year(o.o_orderdate) = 1996
      |    THEN l.l_extendedprice ELSE 0 END), 2) AS e1
      |  FROM lineitem l
      |  JOIN part p ON l.l_partkey = p.p_partkey
      |  JOIN orders o ON l.l_orderkey = o.o_orderkey
      |  JOIN customer c ON o.o_custkey = c.c_custkey
      |  JOIN nation n ON c.c_nationkey = n.n_nationkey
      |  GROUP BY 1, 2),
      |nz AS (SELECT * FROM cell WHERE e0 > 0),
      |g AS (SELECT rk, brand, e0, e1,
      |  (sum(e1) OVER (PARTITION BY 1=1)
      |    - sum(e0) OVER (PARTITION BY 1=1))
      |    / sum(e0) OVER (PARTITION BY 1=1) AS gn,
      |  (sum(e1) OVER (PARTITION BY brand)
      |    - sum(e0) OVER (PARTITION BY brand))
      |    / sum(e0) OVER (PARTITION BY brand) AS gb
      |  FROM nz),
      |r AS (SELECT rk,
      |  round(sum(e0), 2) AS e0, round(sum(e1), 2) AS e1,
      |  round(sum(e0 * gn), 2) AS national_share,
      |  round(sum(e0 * (gb - gn)), 2) AS industry_mix,
      |  round(sum(e1 - e0 * (1.0e0 + gb)), 2) AS regional_shift
      |  FROM g GROUP BY 1)
      |SELECT rk AS region, e0, e1, national_share, industry_mix,
      |  regional_shift
      |FROM r ORDER BY region""".stripMargin

  /** Per-nation mean order value joined to its region — the shared
    * corpus collapse of the Moran/Geary pair. */
  private def nationMeans(s: org.apache.spark.sql.SparkSession,
      d: String) = {
    val t = Tables(s, d)
    t.orders
      .join(broadcast(t.customer.select("c_custkey", "c_nationkey")),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_nationkey").as("nk"))
      .agg(round(avg("o_totalprice"), 6).as("m"))
      .join(broadcast(t.nation
        .select(col("n_nationkey"), col("n_regionkey").as("rk"))),
        col("nk") === col("n_nationkey"))
      .select(col("rk"), col("m"))
  }

  /** The shared per-region (n, r, Σz, Σz²) frame + S₀/S₂ constants. */
  private def spatialGl(nr: org.apache.spark.sql.DataFrame) = {
    val mu = nr.agg(round(avg("m"), 6).as("mu"),
      count(lit(1)).cast("double").as("n"))
    val z = nr.crossJoin(broadcast(mu))
      .select(col("rk"), (col("m") - col("mu")).as("z"), col("n"))
    z.groupBy("rk").agg(max("n").as("n"),
        count(lit(1)).cast("double").as("r"),
        sum("z").as("sz"), sum(col("z") * col("z")).as("szz"))
      .agg(max("n").as("n"),
        sum(col("r") * (col("r") - 1)).as("s0"),
        sum(col("sz") * col("sz") - col("szz")).as("cross_term"),
        sum((col("r") * col("szz") - col("sz") * col("sz")) * 2)
          .as("diff2"),
        sum("szz").as("sz2"),
        sum(col("r") * 4 * (col("r") - 1) * (col("r") - 1)).as("s2"))
  }

  val defs: Seq[QDef] = Seq(

    // MORAN'S I: spatial autocorrelation with the weight matrix folded
    // into per-region grouped sums — zero joins for the cross term.
    QDef("x_moran_i", MoranSql) { (s, d) =>
      val gl = spatialGl(nationMeans(s, d))
      val i = gl.select(col("n"), col("s0"), col("s2"), col("sz2"),
        ((col("n") / col("s0")) * col("cross_term") / col("sz2"))
          .as("mi"),
        (lit(-1.0) / (col("n") - 1)).as("ei"))
      val v = i.select(col("n"), col("mi"), col("ei"),
        ((col("n") * col("n") * (col("s0") * 2) - col("n") * col("s2")
          + lit(3.0) * col("s0") * col("s0"))
          / (col("s0") * col("s0") * (col("n") * col("n") - 1))
          - col("ei") * col("ei")).as("vi"))
      v.select(col("n").cast("bigint").as("n_nations"),
        round(col("mi"), 6).as("moran_i"),
        round(col("ei"), 6).as("e_i"),
        round((col("mi") - col("ei")) / sqrt(col("vi")), 4)
          .as("z_score"))
    },

    // Moran through Spark's SQL parser — same shared text.
    QDef("x_sql_moran", MoranSql) { (s, d) =>
      SqlSurface.viewed(s, d, "orders", "customer", "nation")
      s.sql(MoranSql)
    },

    // GEARY'S C: the difference-based mirror (sensitive to local
    // structure where Moran sees global covariance).
    QDef("x_geary_c", GearySql) { (s, d) =>
      val gl = spatialGl(nationMeans(s, d))
      val c = gl.select(col("n"), col("s0"), col("s2"),
        (((col("n") - 1) / (col("s0") * 2.0)) * col("diff2")
          / col("sz2")).as("gc"))
      val v = c.select(col("n"), col("gc"),
        (((col("s0") * 4 + col("s2")) * (col("n") - 1)
          - lit(4.0) * col("s0") * col("s0"))
          / (lit(2.0) * (col("n") + 1) * col("s0") * col("s0")))
          .as("vc"))
      v.select(col("n").cast("bigint").as("n_nations"),
        round(col("gc"), 6).as("geary_c"),
        round((col("gc") - 1.0) / sqrt(col("vc")), 4).as("z_score"))
    },

    // Geary through Spark's SQL parser — same shared text.
    QDef("x_sql_geary", GearySql) { (s, d) =>
      SqlSurface.viewed(s, d, "orders", "customer", "nation")
      s.sql(GearySql)
    },

    // HHI: the antitrust concentration battery — shares, normalized
    // index, effective competitors, CR4.
    QDef("x_herfindahl", HhiSql) { (s, d) =>
      val t = Tables(s, d)
      val b = t.lineitem
        .join(broadcast(t.part.select("p_partkey", "p_brand")),
          col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_brand").as("brand"))
        .agg(round(sum("l_extendedprice"), 2).as("rev"))
      val tt = b.agg(sum("rev").as("tot"),
        count(lit(1)).cast("double").as("n"))
      val sF = b.crossJoin(broadcast(tt))
        .select(col("brand"), (col("rev") / col("tot")).as("sh"),
          col("n"),
          row_number().over(
            Window.orderBy(col("rev").desc, col("brand"))).as("rn"))
      val h = sF.agg(max("n").as("n"),
        sum(col("sh") * col("sh")).as("ss"),
        sum(when(col("rn") <= 4, col("sh")).otherwise(0.0)).as("cr4"))
      h.select(col("n").cast("bigint").as("n_brands"),
        round(lit(10000.0) * col("ss"), 2).as("hhi"),
        round((col("ss") - lit(1.0) / col("n"))
          / (lit(1.0) - lit(1.0) / col("n")), 6).as("hhi_normalized"),
        round(lit(1.0) / col("ss"), 4).as("effective_competitors"),
        round(col("cr4"), 6).as("cr4"))
    },

    // HHI through Spark's SQL parser — same shared text.
    QDef("x_sql_hhi", HhiSql) { (s, d) =>
      SqlSurface.viewed(s, d, "lineitem", "part")
      s.sql(HhiSql)
    },

    // THEIL T/L: decomposable entropy inequality — four global sums
    // close both indexes; the per-customer frame partitions on its key.
    QDef("x_theil_ineq", TheilIneqSql) { (s, d) =>
      val cs = Tables(s, d).orders
        .groupBy("o_custkey")
        .agg(round(sum("o_totalprice"), 2).as("x"))
      val mo = cs.agg(count(lit(1)).cast("double").as("n"),
        sum("x").as("s"), sum(col("x") * log(col("x"))).as("sxl"),
        sum(log(col("x"))).as("sl"))
      mo.select(col("n").cast("bigint").as("n_customers"),
        round(col("sxl") / col("s") - log(col("s") / col("n")), 6)
          .as("theil_t"),
        round(log(col("s") / col("n")) - col("sl") / col("n"), 6)
          .as("theil_l"))
    },

    // Theil through Spark's SQL parser — same shared text.
    QDef("x_sql_theil_ineq", TheilIneqSql) { (s, d) =>
      SqlSurface.viewed(s, d, "orders")
      s.sql(TheilIneqSql)
    },

    // RCA: which regions over-index on which brands — margins via
    // key-partitioned windows, nothing global but the bounded release.
    QDef("x_rca", RcaSql) { (s, d) =>
      val t = Tables(s, d)
      val cell = t.lineitem
        .join(broadcast(t.part.select("p_partkey", "p_brand")),
          col("l_partkey") === col("p_partkey"))
        .join(t.orders.select("o_orderkey", "o_custkey"),
          col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(t.customer.select("c_custkey", "c_nationkey")),
          col("o_custkey") === col("c_custkey"))
        .join(broadcast(t.nation
          .select(col("n_nationkey"), col("n_regionkey"))),
          col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("n_regionkey").as("rk"),
          col("p_brand").as("brand"))
        .agg(round(sum("l_extendedprice"), 2).as("rev"))
      val m = cell.select(col("rk"), col("brand"), col("rev"),
        sum("rev").over(Window.partitionBy("rk")).as("rev_r"),
        sum("rev").over(Window.partitionBy("brand")).as("rev_b"),
        sum("rev").over(Window.partitionBy(lit(1)))
          .as("rev_t"))
      m.select(col("rk").as("region"), col("brand"),
          round((col("rev") / col("rev_r"))
            / (col("rev_b") / col("rev_t")), 6).as("rca"))
        .orderBy(col("rca").desc, col("region"), col("brand"))
        .limit(10)
    },

    // RCA through Spark's SQL parser — same shared text.
    QDef("x_sql_rca", RcaSql) { (s, d) =>
      SqlSurface.viewed(s, d,
        "lineitem", "part", "orders", "customer", "nation")
      s.sql(RcaSql)
    },

    // SHIFT-SHARE: the regional-economics growth decomposition — one
    // conditional-year collapse, brand-partitioned marginal rates,
    // exact additivity per region.
    QDef("x_shift_share", ShiftSql) { (s, d) =>
      val t = Tables(s, d)
      def yearSum(y: Int) = round(sum(when(
        year(col("o_orderdate")) === y, col("l_extendedprice"))
        .otherwise(0.0)), 2)
      val cell = t.lineitem
        .join(broadcast(t.part.select("p_partkey", "p_brand")),
          col("l_partkey") === col("p_partkey"))
        .join(t.orders.select("o_orderkey", "o_custkey", "o_orderdate"),
          col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(t.customer.select("c_custkey", "c_nationkey")),
          col("o_custkey") === col("c_custkey"))
        .join(broadcast(t.nation
          .select(col("n_nationkey"), col("n_regionkey"))),
          col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("n_regionkey").as("rk"),
          col("p_brand").as("brand"))
        .agg(yearSum(1995).as("e0"), yearSum(1996).as("e1"))
      val nz = cell.filter(col("e0") > 0)
      val wAll = Window.partitionBy(lit(1))
      val wB = Window.partitionBy("brand")
      val g = nz.select(col("rk"), col("brand"), col("e0"), col("e1"),
        ((sum("e1").over(wAll) - sum("e0").over(wAll))
          / sum("e0").over(wAll)).as("gn"),
        ((sum("e1").over(wB) - sum("e0").over(wB))
          / sum("e0").over(wB)).as("gb"))
      g.groupBy("rk").agg(
          round(sum("e0"), 2).as("e0"), round(sum("e1"), 2).as("e1"),
          round(sum(col("e0") * col("gn")), 2).as("national_share"),
          round(sum(col("e0") * (col("gb") - col("gn"))), 2)
            .as("industry_mix"),
          round(sum(col("e1") - col("e0") * (lit(1.0) + col("gb"))), 2)
            .as("regional_shift"))
        .select(col("rk").as("region"), col("e0"), col("e1"),
          col("national_share"), col("industry_mix"),
          col("regional_shift"))
        .orderBy("region")
    },

    // Shift-share through Spark's SQL parser — same shared text.
    QDef("x_sql_shift", ShiftSql) { (s, d) =>
      SqlSurface.viewed(s, d,
        "lineitem", "part", "orders", "customer", "nation")
      s.sql(ShiftSql)
    })
}
