package graft.queries

import graft.{QDef, Tables}
import org.apache.spark.sql.functions._

/** Round-23 batch: price-index economics (Laspeyres/Paasche/Fisher),
  * regression influence (Cook's distance), multicollinearity (VIF),
  * and two corpus-linguistics passes (Dunning G² keyness, word
  * burstiness) — bounded (brand × year) / vocabulary frames after one
  * fact-scale aggregate each, snapped-moment algebra, TakeOrdered
  * releases for the top-k views.
  */
object R23Ops {

  /** VIF as ONE portable SQL text — oracle of `x_vif` and whole query
    * of the `x_sql_vif` twin. */
  private[queries] val VifSql =
    """WITH c AS (SELECT
      |  round(corr(l_quantity, l_discount), 6) AS rqd,
      |  round(corr(l_quantity, l_tax), 6) AS rqt,
      |  round(corr(l_discount, l_tax), 6) AS rdt,
      |  CAST(count(*) AS BIGINT) AS n
      |  FROM lineitem),
      |r2 AS (SELECT n,
      |  (rqd * rqd + rqt * rqt - 2 * rqd * rqt * rdt) / (1 - rdt * rdt)
      |    AS r2q,
      |  (rqd * rqd + rdt * rdt - 2 * rqd * rdt * rqt) / (1 - rqt * rqt)
      |    AS r2d,
      |  (rqt * rqt + rdt * rdt - 2 * rqt * rdt * rqd) / (1 - rqd * rqd)
      |    AS r2t
      |  FROM c)
      |SELECT n, round(1 / (1 - r2q), 4) AS vif_quantity,
      |  round(1 / (1 - r2d), 4) AS vif_discount,
      |  round(1 / (1 - r2t), 4) AS vif_tax
      |FROM r2""".stripMargin

  val defs: Seq[QDef] = Seq(

    // LASPEYRES / PAASCHE / FISHER PRICE INDEX by ship year vs the 1995
    // base: per-(brand, year) unit prices (revenue/quantity, snapped)
    // and quantities from ONE fact aggregate; the index algebra runs on
    // the bounded (brand × year) frame joined to the base-year row.
    // Brands missing in either year drop (matched-basket convention).
    QDef("x_price_index",
      """WITH by AS (
        |  SELECT p.p_brand AS brand,
        |    CAST(year(l.l_shipdate) AS INTEGER) AS yr,
        |    round(sum(l.l_extendedprice) / sum(l.l_quantity), 6) AS price,
        |    round(sum(l.l_quantity), 2) AS qty
        |  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        |  GROUP BY 1, 2),
        |base AS (SELECT brand, price AS p0, qty AS q0 FROM by
        |  WHERE yr = 1995),
        |j AS (SELECT by.yr, by.brand, by.price AS pt, by.qty AS qt,
        |  base.p0, base.q0
        |  FROM by JOIN base ON by.brand = base.brand WHERE by.yr > 1995)
        |SELECT yr AS year, CAST(count(*) AS BIGINT) AS brands,
        |  round(sum(pt * q0) / sum(p0 * q0), 4) AS laspeyres,
        |  round(sum(pt * qt) / sum(p0 * qt), 4) AS paasche,
        |  round(sqrt((sum(pt * q0) / sum(p0 * q0))
        |    * (sum(pt * qt) / sum(p0 * qt))), 4) AS fisher
        |FROM j GROUP BY 1""".stripMargin) { (s, d) =>
      val t = Tables(s, d)
      val by = t.lineitem
        .join(broadcast(t.part.select("p_partkey", "p_brand")),
          col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_brand").as("brand"),
          year(col("l_shipdate")).cast("int").as("yr"))
        .agg(round(sum(col("l_extendedprice")) / sum(col("l_quantity")), 6)
          .as("price"), round(sum(col("l_quantity")), 2).as("qty"))
      val base = by.filter(col("yr") === 1995)
        .select(col("brand"), col("price").as("p0"), col("qty").as("q0"))
      val j = by.filter(col("yr") > 1995)
        .join(broadcast(base), "brand")
      j.groupBy(col("yr").as("year"))
        .agg(count(lit(1)).as("brands"),
          round(sum(col("price") * col("q0"))
            / sum(col("p0") * col("q0")), 4).as("laspeyres"),
          round(sum(col("price") * col("qty"))
            / sum(col("p0") * col("qty")), 4).as("paasche"),
          round(sqrt((sum(col("price") * col("q0"))
              / sum(col("p0") * col("q0")))
            * (sum(col("price") * col("qty"))
              / sum(col("p0") * col("qty")))), 4).as("fisher"))
    },

    // COOK'S DISTANCE on the daily-mean OLS trend: the five most
    // influential days, with leverage from the closed simple-regression
    // form h = 1/n + (i−ī)²/Sxx — regression diagnostics without any
    // matrix work. Moments snapped at 6 dp; the top-5 release is a
    // TakeOrdered, never a full sort.
    QDef("x_cooks_distance",
      """WITH daily AS (
        |  SELECT CAST(ts AS DATE) AS dd, round(avg(value), 6) AS v
        |  FROM events GROUP BY 1),
        |d0 AS (SELECT min(dd) AS start FROM daily),
        |idx AS (SELECT datediff('day', d0.start, dd) AS i, dd, v
        |  FROM daily, d0),
        |fit AS (SELECT round(regr_slope(v, i), 6) AS b1,
        |  round(regr_intercept(v, i), 6) AS b0,
        |  round(avg(i), 6) AS xbar,
        |  CAST(count(*) AS BIGINT) AS n FROM idx),
        |sxx AS (SELECT round(sum((i - fit.xbar) * (i - fit.xbar)), 6)
        |    AS sxx
        |  FROM idx, fit),
        |e AS (SELECT idx.dd, idx.i, idx.v - (fit.b0 + fit.b1 * idx.i) AS e,
        |  1.0e0 / fit.n + (idx.i - fit.xbar) * (idx.i - fit.xbar) / sxx.sxx
        |    AS h, fit.n
        |  FROM idx, fit, sxx),
        |s2 AS (SELECT round(sum(e * e), 6) AS sse, max(n) AS n FROM e),
        |cd AS (SELECT e.dd,
        |  e.e * e.e * e.h
        |    / (2 * (s2.sse / (s2.n - 2)) * (1 - e.h) * (1 - e.h)) AS d
        |  FROM e, s2)
        |SELECT dd AS day, round(d, 6) AS cooks_d
        |FROM cd ORDER BY cooks_d DESC, day LIMIT 5""".stripMargin) { (s, d) =>
      val daily = Tables(s, d).events
        .groupBy(to_date(col("ts")).as("dd"))
        .agg(round(avg(col("value")), 6).as("v"))
      val d0 = daily.agg(min(col("dd")).as("start"))
      val idx = daily.crossJoin(broadcast(d0))
        .select(datediff(col("dd"), col("start")).as("i"), col("dd"),
          col("v"))
      val fit = idx.agg(
        round(regr_slope(col("v"), col("i")), 6).as("b1"),
        round(regr_intercept(col("v"), col("i")), 6).as("b0"),
        round(avg(col("i")), 6).as("xbar"), count(lit(1)).as("n"))
      val sxx = idx.crossJoin(broadcast(fit))
        .agg(round(sum((col("i") - col("xbar"))
          * (col("i") - col("xbar"))), 6).as("sxx"))
      val e = idx.crossJoin(broadcast(fit)).crossJoin(broadcast(sxx))
        .select(col("dd"),
          (col("v") - (col("b0") + col("b1") * col("i"))).as("e"),
          (lit(1.0) / col("n") + (col("i") - col("xbar"))
            * (col("i") - col("xbar")) / col("sxx")).as("h"),
          col("n"))
      val s2 = e.agg(round(sum(col("e") * col("e")), 6).as("sse"),
        max(col("n")).as("n2"))
      e.crossJoin(broadcast(s2))
        .select(col("dd").as("day"),
          round(col("e") * col("e") * col("h")
            / (lit(2) * (col("sse") / (col("n2") - lit(2)))
              * (lit(1) - col("h")) * (lit(1) - col("h"))), 6)
            .as("cooks_d"))
        .orderBy(col("cooks_d").desc, col("day"))
        .limit(5)
    },

    // VARIANCE INFLATION FACTORS for the (quantity, discount, tax)
    // predictor set: R² of each predictor on the other two from the
    // 3×3 correlation matrix in closed form — ONE moment pass, snapped
    // r's, 1-row algebra. The multicollinearity screen before any
    // in-database regression.
    QDef("x_vif", VifSql) { (s, d) =>
      val c = Tables(s, d).lineitem.agg(
        round(corr(col("l_quantity"), col("l_discount")), 6).as("rqd"),
        round(corr(col("l_quantity"), col("l_tax")), 6).as("rqt"),
        round(corr(col("l_discount"), col("l_tax")), 6).as("rdt"),
        count(lit(1)).as("n"))
      def r2(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column,
          ab: org.apache.spark.sql.Column) =
        (a * a + b * b - lit(2) * a * b * ab) / (lit(1) - ab * ab)
      c.select(col("n"),
        round(lit(1) / (lit(1) - r2(col("rqd"), col("rqt"), col("rdt"))), 4)
          .as("vif_quantity"),
        round(lit(1) / (lit(1) - r2(col("rqd"), col("rdt"), col("rqt"))), 4)
          .as("vif_discount"),
        round(lit(1) / (lit(1) - r2(col("rqt"), col("rdt"), col("rqd"))), 4)
          .as("vif_tax"))
    },

    // DUNNING G² KEYNESS: which words distinguish the src0 documents
    // from the rest of the corpus — the log-likelihood-ratio keyword
    // extractor. One tokenize→(word, group) count pass (map-side
    // combined, vocabulary-bounded output); expected counts and the
    // two-cell G² on the word frame; top 20 by G², keyed deterministic.
    QDef("x_keyness",
      """WITH w AS (
        |  SELECT CASE WHEN source = 'src0' THEN 1 ELSE 0 END AS g,
        |    unnest(list_filter(string_split(text, ' '), x -> x <> ''))
        |      AS word
        |  FROM documents),
        |wc AS (SELECT word,
        |  CAST(sum(g) AS BIGINT) AS a,
        |  CAST(sum(1 - g) AS BIGINT) AS b
        |  FROM w GROUP BY 1),
        |tot AS (SELECT CAST(sum(a) AS BIGINT) AS c1,
        |  CAST(sum(b) AS BIGINT) AS c2 FROM wc),
        |g2 AS (SELECT word, a, b,
        |  round(2 * ((CASE WHEN a > 0 THEN a * ln(a / (c1
        |      * CAST(a + b AS DOUBLE) / (c1 + c2))) ELSE 0 END)
        |    + (CASE WHEN b > 0 THEN b * ln(b / (c2
        |      * CAST(a + b AS DOUBLE) / (c1 + c2))) ELSE 0 END)), 4) AS g2
        |  FROM wc, tot)
        |SELECT word, a AS count_src0, b AS count_rest, g2
        |FROM g2 ORDER BY g2 DESC, word LIMIT 20""".stripMargin) { (s, d) =>
      val w = Tables(s, d).documents
        .select(when(col("source") === "src0", 1L).otherwise(0L).as("g"),
          explode(split(col("text"), " ", -1)).as("word"))
        .filter(col("word") =!= "")
      val wc = w.groupBy("word")
        .agg(sum(col("g")).as("a"), sum(lit(1L) - col("g")).as("b"))
      val tot = wc.agg(sum(col("a")).as("c1"), sum(col("b")).as("c2"))
      val e1 = (col("c1") * (col("a") + col("b")).cast("double")) /
        (col("c1") + col("c2"))
      val e2 = (col("c2") * (col("a") + col("b")).cast("double")) /
        (col("c1") + col("c2"))
      val g2 = lit(2) * (when(col("a") > 0,
          col("a") * log(col("a") / e1)).otherwise(lit(0.0))
        + when(col("b") > 0, col("b") * log(col("b") / e2))
          .otherwise(lit(0.0)))
      wc.crossJoin(broadcast(tot))
        .select(col("word"), col("a").as("count_src0"),
          col("b").as("count_rest"), round(g2, 4).as("g2"))
        .orderBy(col("g2").desc, col("word"))
        .limit(20)
    },

    // WORD BURSTINESS: variance-to-mean ratio of per-document counts
    // (zeros included via the sum/sum-of-squares identity — the corpus
    // never materializes the zero cells). VMR ≈ 1 is Poisson scatter;
    // bursty words concentrate. Top 20 by VMR among words in ≥ 100
    // documents.
    QDef("x_burstiness",
      """WITH dc AS (
        |  SELECT doc_id, word, CAST(count(*) AS BIGINT) AS c
        |  FROM (SELECT doc_id,
        |    unnest(list_filter(string_split(text, ' '), x -> x <> ''))
        |      AS word
        |    FROM documents)
        |  GROUP BY 1, 2),
        |nd AS (SELECT CAST(count(*) AS BIGINT) AS n FROM documents),
        |ws AS (SELECT word, CAST(count(*) AS BIGINT) AS df,
        |  CAST(sum(c) AS BIGINT) AS s1, CAST(sum(c * c) AS BIGINT) AS s2
        |  FROM dc GROUP BY 1),
        |vm AS (SELECT word, df, s1,
        |  round((s2 - CAST(s1 AS DOUBLE) * s1 / nd.n) / (nd.n - 1)
        |    / (CAST(s1 AS DOUBLE) / nd.n), 4) AS vmr
        |  FROM ws, nd WHERE df >= 100)
        |SELECT word, df, s1 AS total_count, vmr
        |FROM vm ORDER BY vmr DESC, word LIMIT 20""".stripMargin) { (s, d) =>
      val docs = Tables(s, d).documents
      val dc = docs
        .select(col("doc_id"), explode(split(col("text"), " ", -1)).as("word"))
        .filter(col("word") =!= "")
        .groupBy("doc_id", "word").agg(count(lit(1)).as("c"))
      val nd = docs.agg(count(lit(1)).as("n"))
      val ws = dc.groupBy("word").agg(count(lit(1)).as("df"),
        sum(col("c")).as("s1"), sum(col("c") * col("c")).as("s2"))
      val vmr = ((col("s2") - col("s1").cast("double") * col("s1") / col("n"))
        / (col("n") - lit(1))) / (col("s1").cast("double") / col("n"))
      ws.crossJoin(broadcast(nd))
        .filter(col("df") >= 100)
        .select(col("word"), col("df"), col("s1").as("total_count"),
          round(vmr, 4).as("vmr"))
        .orderBy(col("vmr").desc, col("word"))
        .limit(20)
    }
  )
}
