package graft.queries

import graft.{QDef, Tables}
import org.apache.spark.sql.functions._

/** Round-32 batch: corpus evaluation operators — blocked Levenshtein
  * matching, association rules (support/confidence/lift), unseen-mass
  * vocabulary estimators (Chao1 + Good-Turing over bigram types),
  * Hellinger/Bhattacharyya/TV distribution distance, and the
  * precision-recall curve at fixed operating points.
  *
  * Scale posture: every corpus touch is one scan + one grouped aggregate
  * (map-side combined); candidate pairs come from blocked equi-joins
  * (never all-pairs); everything downstream runs on bounded frames
  * (≤ 25-brand contingencies, ≤ 9 thresholds, per-distance counts).
  */
object R32Ops {

  /** Lazy localCheckpoint — the Dedup.pin posture (materialize once on
    * first action, reuse across consumers). */
  private def pin(df: org.apache.spark.sql.DataFrame) =
    df.localCheckpoint(eager = false)

  /** Blocked Levenshtein profile as ONE portable SQL text — oracle of
    * `x_leven_match` and whole query of the `x_sql_leven` twin. The
    * corpus collapses to the DISTINCT-NAME histogram first (value-domain
    * bounded — 64 names at every SF), so each edit distance is computed
    * ONCE per distinct pair and row multiplicities multiply back in:
    * same-name pairs contribute C(c,2) at d = 0, cross pairs c_a·c_b —
    * bit-identical to the naive row-pair fold, which at sf0.1 would run
    * 7.8M levenshtein calls where this runs 48. Blocking = (first word,
    * exact length) equi-join, the x_jaro_entity ER posture. Spark and
    * DuckDB both ship native `levenshtein`/`split_part`, so one text
    * parses in both engines. */
  private[queries] val LevenSql =
    """WITH dn AS (
      |  SELECT split_part(p_name, ' ', 1) AS w1, length(p_name) AS ln,
      |    p_name AS nm, CAST(count(*) AS BIGINT) AS c
      |  FROM part GROUP BY 1, 2, 3),
      |self_pairs AS (
      |  SELECT 0 AS d, CAST(sum(c * (c - 1) / 2) AS BIGINT) AS n_pairs
      |  FROM dn),
      |cross_pairs AS (
      |  SELECT levenshtein(a.nm, b.nm) AS d,
      |    CAST(sum(a.c * b.c) AS BIGINT) AS n_pairs
      |  FROM dn a JOIN dn b ON b.w1 = a.w1 AND b.ln = a.ln AND b.nm > a.nm
      |  GROUP BY 1)
      |SELECT d, CAST(sum(n_pairs) AS BIGINT) AS n_pairs FROM (
      |  SELECT d, n_pairs FROM self_pairs WHERE n_pairs > 0
      |  UNION ALL SELECT d, n_pairs FROM cross_pairs) u
      |GROUP BY 1""".stripMargin

  /** Corpus half of the association rules: the distinct (order, brand)
    * basket frame — the one corpus-scale relation, referenced three
    * times downstream (why the twin materializes it once). */
  private[queries] val AssocObCtes =
    """ob AS (
      |  SELECT DISTINCT l_orderkey AS o, p.p_brand AS br
      |  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey)"""
      .stripMargin

  /** Rule half over a relation named `ob`: brand marginals, the order-
    * local pair join (per-order brand frames are ≤ 7 rows, so the
    * self-join shuffles once on the order key), and the bounded ≤ 25×24
    * rule frame with support/confidence/lift. Ordered by the ROUNDED
    * lift + full key tiebreak (the x_cooks_distance lesson: both engines
    * must sort on the released value, not an unrounded shadow). */
  private[queries] val AssocBody =
    """nord AS (SELECT CAST(count(DISTINCT o) AS BIGINT) AS nn FROM ob),
      |cnt AS (SELECT br, CAST(count(*) AS BIGINT) AS c FROM ob GROUP BY 1),
      |pair AS (
      |  SELECT a.br AS ante, b.br AS cons, CAST(count(*) AS BIGINT) AS cab
      |  FROM ob a JOIN ob b ON b.o = a.o AND b.br <> a.br
      |  GROUP BY 1, 2),
      |r AS (
      |  SELECT ante, cons, cab,
      |    cab / CAST(nn AS DOUBLE) AS supp,
      |    cab / CAST(ca.c AS DOUBLE) AS conf,
      |    cab * nn / (CAST(ca.c AS DOUBLE) * cb.c) AS lft
      |  FROM pair
      |  JOIN cnt ca ON ca.br = ante
      |  JOIN cnt cb ON cb.br = cons
      |  CROSS JOIN nord)
      |SELECT ante, cons, cab AS n_ab, round(supp, 6) AS support,
      |  round(conf, 6) AS confidence, round(lft, 6) AS lift
      |FROM r WHERE supp >= 0.001e0
      |ORDER BY lift DESC, ante, cons LIMIT 15""".stripMargin

  /** Association rules as ONE portable SQL text — oracle of
    * `x_assoc_rules` and whole query of the `x_sql_assoc` twin. */
  private[queries] val AssocSql =
    s"""WITH $AssocObCtes,
       |$AssocBody""".stripMargin

  /** Vocabulary-richness oracle (DuckDB dialect — tokenization is
    * engine-specific, the LmNllCtes posture): bigram TYPE frequencies per
    * language → Chao1 richness (bias-corrected) and Good-Turing coverage.
    * The unseen-mass estimate behind "how much more data until novelty
    * runs out" — per-language type frames are vocabulary-bounded. */
  private[queries] val VocabRichnessOracle =
    """WITH ft AS (
      |  SELECT lang, list_filter(string_split(text, ' '), x -> x <> '') AS t
      |  FROM documents),
      |bg AS (
      |  SELECT lang, t[CAST(i AS INT)] || ' ' || t[CAST(i AS INT)+1] AS w
      |  FROM ft, unnest(range(1, len(t))) u(i)),
      |wc AS (SELECT lang, w, CAST(count(*) AS BIGINT) AS c
      |  FROM bg GROUP BY 1, 2)
      |SELECT lang, CAST(sum(c) AS BIGINT) AS n_bigrams,
      |  CAST(count(*) AS BIGINT) AS types,
      |  CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS f1,
      |  CAST(sum(CASE WHEN c = 2 THEN 1 ELSE 0 END) AS BIGINT) AS f2,
      |  round(count(*)
      |    + sum(CASE WHEN c = 1 THEN 1.0e0 ELSE 0 END)
      |      * (sum(CASE WHEN c = 1 THEN 1.0e0 ELSE 0 END) - 1)
      |      / (2 * (sum(CASE WHEN c = 2 THEN 1.0e0 ELSE 0 END) + 1)), 4)
      |    AS chao1,
      |  round(1 - sum(CASE WHEN c = 1 THEN 1.0e0 ELSE 0 END) / sum(c), 6)
      |    AS gt_coverage
      |FROM wc GROUP BY 1""".stripMargin

  /** Hellinger/Bhattacharyya/TV as ONE portable SQL text — oracle of
    * `x_hellinger`. Distribution distance between the returned-item and
    * kept-item brand mixes: ONE grouped corpus pass to the 25-brand
    * contingency, distance algebra on the bounded frame. */
  private[queries] val HellingerSql =
    """WITH fb AS (
      |  SELECT l_returnflag AS f, p.p_brand AS br,
      |    CAST(count(*) AS BIGINT) AS c
      |  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
      |  WHERE l_returnflag IN ('R', 'N')
      |  GROUP BY 1, 2),
      |m AS (SELECT br,
      |  CAST(sum(CASE WHEN f = 'R' THEN c ELSE 0 END) AS BIGINT) AS cr,
      |  CAST(sum(CASE WHEN f = 'N' THEN c ELSE 0 END) AS BIGINT) AS cn
      |  FROM fb GROUP BY 1),
      |t AS (SELECT CAST(sum(cr) AS BIGINT) AS tr,
      |  CAST(sum(cn) AS BIGINT) AS tn FROM m),
      |d AS (SELECT
      |  sum(sqrt((cr / CAST(tr AS DOUBLE)) * (cn / CAST(tn AS DOUBLE))))
      |    AS bc,
      |  sum(abs(cr / CAST(tr AS DOUBLE) - cn / CAST(tn AS DOUBLE))) / 2
      |    AS tvd
      |  FROM m CROSS JOIN t)
      |SELECT round(bc, 6) AS bhattacharyya_coef,
      |  round(sqrt(1 - least(bc, 1.0e0)), 6) AS hellinger,
      |  round(tvd, 6) AS total_variation
      |FROM d""".stripMargin

  /** PR-curve oracle (DuckDB dialect for the threshold range): the
    * x_auc_rank score/label pair read at 9 fixed operating points. The
    * corpus collapses to a 1k$-bin histogram (thresholds are bin-aligned
    * multiples of 50k$, so the binning is exact); tp/flagged counts are
    * pure BIGINT; F1 via the 2tp/(flagged+npos) identity — one division
    * per released ratio. */
  private[queries] val PrCurveOracle =
    """WITH hist AS (
      |  SELECT CAST(floor(o_totalprice / 1000) AS BIGINT) AS b,
      |    CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END)
      |      AS BIGINT) AS p,
      |    CAST(count(*) AS BIGINT) AS c
      |  FROM orders GROUP BY 1),
      |tot AS (SELECT CAST(sum(p) AS BIGINT) AS npos FROM hist),
      |th AS (SELECT CAST(t AS BIGINT) * 50 AS tb
      |  FROM unnest(range(1, 10)) u(t)),
      |ag AS (
      |  SELECT th.tb,
      |    CAST(sum(CASE WHEN hist.b >= th.tb THEN hist.p ELSE 0 END)
      |      AS BIGINT) AS tp,
      |    CAST(sum(CASE WHEN hist.b >= th.tb THEN hist.c ELSE 0 END)
      |      AS BIGINT) AS flagged
      |  FROM th CROSS JOIN hist GROUP BY 1)
      |SELECT tb * 1000.0e0 AS threshold, tp, flagged,
      |  round(tp / CAST(flagged AS DOUBLE), 6) AS prec,
      |  round(tp / CAST(npos AS DOUBLE), 6) AS rec,
      |  round(2.0e0 * tp / (flagged + npos), 6) AS f1
      |FROM ag CROSS JOIN tot""".stripMargin

  val defs: Seq[QDef] = Seq(

    // BLOCKED LEVENSHTEIN MATCHING: the edit-distance complement of
    // x_jaro_entity, through Spark's native codegen'd `levenshtein`.
    // Candidates come from a (first-word, length) blocked equi-join; the
    // per-distance integer fold makes the released frame a handful of
    // rows with no top-k tie boundary at all.
    QDef("x_leven_match", LevenSql) { (s, d) =>
      val dn = Tables(s, d).part
        .groupBy(split_part(col("p_name"), lit(" "), lit(1)).as("w1"),
          length(col("p_name")).as("ln"), col("p_name").as("nm"))
        .agg(count(lit(1)).as("c"))
      val selfPairs = dn
        .agg(sum(col("c") * (col("c") - 1) / 2).cast("bigint").as("n_pairs"))
        .select(lit(0).as("d"), col("n_pairs"))
        .filter(col("n_pairs") > 0)
      val a = dn.select(col("w1"), col("ln"), col("nm").as("na"),
        col("c").as("ca"))
      val b = dn.select(col("w1"), col("ln"), col("nm").as("nb"),
        col("c").as("cb"))
      val crossPairs = a.join(b, Seq("w1", "ln"))
        .filter(col("nb") > col("na"))
        .groupBy(levenshtein(col("na"), col("nb")).as("d"))
        .agg(sum(col("ca") * col("cb")).as("n_pairs"))
      selfPairs.unionByName(crossPairs)
        .groupBy("d").agg(sum(col("n_pairs")).as("n_pairs"))
    },

    // Levenshtein through Spark's SQL parser — the whole shared text
    // parses in both engines (split_part/levenshtein are native in both).
    QDef("x_sql_leven", LevenSql) { (s, d) =>
      SqlSurface.viewed(s, d, "part")
      s.sql(LevenSql)
    },

    // ASSOCIATION RULES: support/confidence/lift over order baskets —
    // the market-basket statistics pass. The basket frame materializes
    // ONCE (pinned — it feeds the marginals AND both sides of the pair
    // join); pairs form order-locally; the rule frame is bounded at the
    // brand-vocabulary square. Top-15 ordered by the ROUNDED lift with a
    // full (ante, cons) tiebreak.
    QDef("x_assoc_rules", AssocSql) { (s, d) =>
      val t = Tables(s, d)
      val ob = pin(t.lineitem
        .join(t.part.select("p_partkey", "p_brand"),
          col("l_partkey") === col("p_partkey"))
        .select(col("l_orderkey").as("o"), col("p_brand").as("br"))
        .distinct())
      val nord = ob.agg(countDistinct(col("o")).as("nn"))
      val cnt = ob.groupBy("br").agg(count(lit(1)).as("c"))
      val pair = ob.select(col("o"), col("br").as("ante"))
        .join(ob.select(col("o"), col("br").as("cons")), Seq("o"))
        .filter(col("ante") =!= col("cons"))
        .groupBy("ante", "cons").agg(count(lit(1)).as("cab"))
      pair
        .join(broadcast(cnt.select(col("br").as("ante"), col("c").as("ca"))),
          Seq("ante"))
        .join(broadcast(cnt.select(col("br").as("cons"), col("c").as("cb"))),
          Seq("cons"))
        .crossJoin(broadcast(nord))
        .select(col("ante"), col("cons"), col("cab").as("n_ab"),
          round(col("cab") / col("nn").cast("double"), 6).as("support"),
          round(col("cab") / col("ca").cast("double"), 6).as("confidence"),
          round(col("cab") * col("nn")
            / (col("ca").cast("double") * col("cb")), 6).as("lift"))
        .filter(col("support") >= 0.001)
        .orderBy(col("lift").desc, col("ante"), col("cons"))
        .limit(15)
    },

    // Association rules through Spark's SQL parser — the basket frame
    // (`ob` is referenced by the marginals and both pair-join sides, and
    // Spark re-evaluates multiply-referenced CTEs) materializes once
    // behind a temp view; the rule half runs verbatim.
    QDef("x_sql_assoc", AssocSql) { (s, d) =>
      SqlSurface.viewed(s, d, "lineitem", "part")
      s.sql(s"""WITH ${R32Ops.AssocObCtes}
               |SELECT o, br FROM ob""".stripMargin)
        .transform(SqlSurface.materialized("ob"))
      s.sql(s"WITH ${R32Ops.AssocBody}")
    },

    // VOCABULARY RICHNESS: Chao1 + Good-Turing coverage over bigram
    // types per language — the unseen-mass estimate behind data-scaling
    // decisions ("how much novel text is left in this source"). One
    // corpus tokenize → bigram pass, one vocabulary-bounded type
    // aggregate, closed-form estimators on the 5-row language frame.
    QDef("x_vocab_richness", VocabRichnessOracle) { (s, d) =>
      val ft = Tables(s, d).documents.select(col("lang"),
        filter(split(col("text"), " "), x => x =!= "").as("t"))
      // consecutive-token bigrams via an in-row zip of the two shifted
      // views — scan-local, no positional explode+self-join
      val bg = ft.select(col("lang"),
        explode(zip_with(
          slice(col("t"), lit(1), greatest(size(col("t")) - 1, lit(0))),
          slice(col("t"), lit(2), greatest(size(col("t")) - 1, lit(0))),
          (x, y) => concat(x, lit(" "), y))).as("w"))
      val wc = bg.groupBy("lang", "w").agg(count(lit(1)).as("c"))
      wc.groupBy("lang").agg(
        sum(col("c")).as("n_bigrams"),
        count(lit(1)).as("types"),
        sum(when(col("c") === 1, 1L).otherwise(0L)).as("f1"),
        sum(when(col("c") === 2, 1L).otherwise(0L)).as("f2"),
        round(count(lit(1))
          + sum(when(col("c") === 1, 1.0).otherwise(0.0))
            * (sum(when(col("c") === 1, 1.0).otherwise(0.0)) - 1)
            / (lit(2) * (sum(when(col("c") === 2, 1.0).otherwise(0.0)) + 1)),
          4).as("chao1"),
        round(lit(1) - sum(when(col("c") === 1, 1.0).otherwise(0.0))
          / sum(col("c")), 6).as("gt_coverage"))
    },

    // HELLINGER / BHATTACHARYYA / TOTAL-VARIATION distance between the
    // returned-item and kept-item brand mixes — the bounded-support
    // distribution-drift triple (the √-affinity companion to x_drift_psi
    // and x_js_divergence). One grouped corpus pass; distance algebra on
    // the 25-row contingency.
    QDef("x_hellinger", HellingerSql) { (s, d) =>
      val t = Tables(s, d)
      val fb = t.lineitem
        .filter(col("l_returnflag").isin("R", "N"))
        .join(t.part.select("p_partkey", "p_brand"),
          col("l_partkey") === col("p_partkey"))
        .groupBy(col("l_returnflag").as("f"), col("p_brand").as("br"))
        .agg(count(lit(1)).as("c"))
      val m = fb.groupBy("br").agg(
        sum(when(col("f") === "R", col("c")).otherwise(0L)).as("cr"),
        sum(when(col("f") === "N", col("c")).otherwise(0L)).as("cn"))
      val tt = m.agg(sum(col("cr")).as("tr"), sum(col("cn")).as("tn"))
      m.crossJoin(broadcast(tt)).agg(
        sum(sqrt((col("cr") / col("tr").cast("double"))
          * (col("cn") / col("tn").cast("double")))).as("bc"),
        (sum(abs(col("cr") / col("tr").cast("double")
          - col("cn") / col("tn").cast("double"))) / 2).as("tvd"))
        .select(round(col("bc"), 6).as("bhattacharyya_coef"),
          round(sqrt(lit(1) - least(col("bc"), lit(1.0))), 6).as("hellinger"),
          round(col("tvd"), 6).as("total_variation"))
    },

    // PRECISION-RECALL CURVE at 9 fixed operating points for the
    // x_auc_rank score/label pair — the threshold-picking companion to
    // the threshold-free AUC. Corpus → exact 1k$-bin histogram (ONE
    // aggregate); the 9-threshold fold is bin-frame × literal grid, all
    // counts BIGINT until the three released ratios.
    QDef("x_pr_curve", PrCurveOracle) { (s, d) =>
      val hist = Tables(s, d).orders
        .groupBy(floor(col("o_totalprice") / 1000).cast("bigint").as("b"))
        .agg(sum(when(col("o_orderstatus") === "F", 1L).otherwise(0L))
          .as("p"), count(lit(1)).as("c"))
      val tot = hist.agg(sum(col("p")).as("npos"))
      val th = s.range(1, 10).select((col("id") * 50).as("tb"))
      hist.crossJoin(broadcast(th))
        .groupBy("tb")
        .agg(sum(when(col("b") >= col("tb"), col("p")).otherwise(0L))
          .as("tp"),
          sum(when(col("b") >= col("tb"), col("c")).otherwise(0L))
            .as("flagged"))
        .crossJoin(broadcast(tot))
        .select((col("tb") * 1000.0).as("threshold"), col("tp"),
          col("flagged"),
          round(col("tp") / col("flagged").cast("double"), 6).as("prec"),
          round(col("tp") / col("npos").cast("double"), 6).as("rec"),
          round(lit(2.0) * col("tp") / (col("flagged") + col("npos")), 6)
            .as("f1"))
    }
  )
}
