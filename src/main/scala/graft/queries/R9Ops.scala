package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{QDef, Tables}
import graft.llm.Dedup
import graft.ops.Skyline

/** Round-9 additions: market-basket association rules, Markov event
  * transitions, cohort retention matrices, an exact distribute-then-merge
  * 2-D skyline, and a one-pass correlation matrix — the classic OLAP
  * analytics shapes the surface didn't yet cover, each oracle-paired.
  */
object R9Ops {

  /** Unrolled 4-round k-core peel (k=5) over the brand co-occurrence graph
    * (edges = brand pairs appearing together in ≥ 2.5% of orders — a
    * RELATIVE support threshold, so the derivation is scale-invariant).
    * Round i keeps the vertices whose degree within round i−1's survivors
    * is ≥ k; the peel reaches its fixpoint in one round at sf0.01 and the
    * remaining unrolled rounds are no-ops (multi-round trajectories are
    * property-tested in GraphKCoreSpec).
    */
  private def peelRound(i: Int): String =
    s"""a$i AS (
       |  SELECT e.u FROM e JOIN a${i - 1} x ON x.u = e.u
       |  JOIN a${i - 1} y ON y.u = e.v
       |  GROUP BY e.u HAVING count(*) >= 5)""".stripMargin

  /** Association rules as ONE portable SQL text — the DuckDB oracle of
    * `x_basket_pairs` AND the whole Spark-SQL query of its `x_sql_basket`
    * twin (the CcSql twin contract). The self-join pair expansion is the
    * ORACLE shape; the Dataset engine path expands pairs in-row from one
    * basket collapse instead. */
  private[queries] val BasketSql =
    """WITH items AS (
      |  SELECT DISTINCT l.l_orderkey AS o, p.p_brand AS item
      |  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey),
      |n AS (SELECT CAST(count(DISTINCT o) AS DOUBLE) AS n_orders FROM items),
      |ic AS (SELECT item, CAST(count(*) AS DOUBLE) AS c FROM items GROUP BY 1),
      |pairs AS (
      |  SELECT a.item AS item_a, b.item AS item_b, count(*) AS supp
      |  FROM items a JOIN items b ON a.o = b.o AND a.item < b.item
      |  GROUP BY 1, 2)
      |SELECT item_a, item_b, CAST(supp AS BIGINT) AS support,
      |  round(supp / ca.c, 6) AS confidence,
      |  round((supp / ca.c) / (cb.c / n.n_orders), 6) AS lift
      |FROM pairs JOIN ic ca ON ca.item = pairs.item_a
      |JOIN ic cb ON cb.item = pairs.item_b, n
      |WHERE supp >= 40""".stripMargin

  /** Markov transitions as ONE portable SQL text — oracle of
    * `x_seq_transitions` and the whole query of `x_sql_transitions`. */
  private[queries] val TransitionsSql =
    """WITH s AS (
      |  SELECT user_id, event_type,
      |    lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
      |      AS nxt
      |  FROM events),
      |t AS (SELECT event_type AS src, nxt AS dst, count(*) AS c
      |      FROM s WHERE nxt IS NOT NULL GROUP BY 1, 2),
      |tot AS (SELECT src, CAST(sum(c) AS DOUBLE) AS n FROM t GROUP BY 1)
      |SELECT t.src, t.dst, CAST(c AS BIGINT) AS transitions,
      |  round(c / n, 6) AS p
      |FROM t JOIN tot ON tot.src = t.src""".stripMargin

  /** Corpus-scale half of the k-core text: one basket collapse → pair
    * support → relative-threshold edge list, symmetrized. Shared verbatim
    * by the oracle text AND the `x_sql_kcore` edge materialization, so the
    * two cannot drift. */
  private[queries] val KCoreEdgeCtes =
    """items AS (
      |  SELECT DISTINCT l.l_orderkey AS o, p.p_brand AS item
      |  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey),
      |n AS (SELECT CAST(count(DISTINCT o) AS DOUBLE) AS n_orders FROM items),
      |pr AS (
      |  SELECT a.item AS u, b.item AS v, count(*) AS supp
      |  FROM items a JOIN items b ON a.o = b.o AND a.item < b.item
      |  GROUP BY 1, 2),
      |e0 AS (SELECT u, v FROM pr, n WHERE supp / n_orders >= 0.025)""".stripMargin

  /** Peel half: 4 unrolled rounds over a relation named `e` (a CTE in the
    * oracle; a checkpointed temp view in the Spark twin). */
  private[queries] val KCorePeelBody =
    s"""a0 AS (SELECT DISTINCT u FROM e),
       |${peelRound(1)},
       |${peelRound(2)},
       |${peelRound(3)},
       |${peelRound(4)}
       |SELECT e.u AS id, CAST(count(*) AS BIGINT) AS deg
       |FROM e JOIN a4 x ON x.u = e.u JOIN a4 y ON y.u = e.v
       |GROUP BY 1""".stripMargin

  private[queries] val KCoreSql =
    s"""WITH $KCoreEdgeCtes,
       |e AS (SELECT u, v FROM e0 UNION SELECT v, u FROM e0),
       |$KCorePeelBody""".stripMargin

  /** CUSUM drift detection as ONE portable SQL text — oracle of
    * `x_cusum_drift` and the whole query of `x_sql_cusum`. The closed
    * window form of the max(0, S+y) recursion: S_t = C_t − min(0, running
    * min of C). Every window orders the 30-row daily aggregate. */
  private[queries] val CusumSql =
    """WITH dm AS (SELECT CAST(date_trunc('day', ts) AS DATE) AS d,
      |  avg(value) AS x FROM events GROUP BY 1),
      |st AS (SELECT avg(x) AS mu, stddev_samp(x) AS sd FROM dm),
      |y AS (SELECT d, x, x - mu - 0.25 * sd AS yv, sd FROM dm, st),
      |c AS (SELECT d, x, sd, sum(yv) OVER (ORDER BY d ROWS BETWEEN
      |  UNBOUNDED PRECEDING AND CURRENT ROW) AS cy FROM y),
      |s AS (SELECT d, x, sd, cy,
      |  cy - least(0, min(cy) OVER (ORDER BY d ROWS BETWEEN UNBOUNDED
      |    PRECEDING AND CURRENT ROW)) AS s
      |  FROM c)
      |SELECT d, round(x, 4) AS day_mean, round(s, 4) AS cusum,
      |  CAST(CASE WHEN s > 2 * sd THEN 1 ELSE 0 END AS INT) AS alert
      |FROM s""".stripMargin

  /** Column profiling as ONE portable SQL text (per-column UNION form) —
    * oracle of `x_profile_columns` (whose Dataset form pins the explicit
    * one-pass stacked aggregate) and the whole query of `x_sql_profile`. */
  private[queries] val ProfileSql =
    """SELECT 'l_quantity' AS col, CAST(count(*) AS BIGINT) AS n,
      |  CAST(sum(CASE WHEN l_quantity IS NULL THEN 1 ELSE 0 END) AS BIGINT)
      |    AS nulls,
      |  CAST(count(DISTINCT l_quantity) AS BIGINT) AS n_distinct,
      |  round(min(l_quantity), 4) AS min_v, round(max(l_quantity), 4) AS max_v,
      |  round(avg(l_quantity), 4) AS mean_v
      |FROM lineitem
      |UNION ALL
      |SELECT 'l_extendedprice', CAST(count(*) AS BIGINT),
      |  CAST(sum(CASE WHEN l_extendedprice IS NULL THEN 1 ELSE 0 END) AS BIGINT),
      |  CAST(count(DISTINCT l_extendedprice) AS BIGINT),
      |  round(min(l_extendedprice), 4), round(max(l_extendedprice), 4),
      |  round(avg(l_extendedprice), 4) FROM lineitem
      |UNION ALL
      |SELECT 'l_discount', CAST(count(*) AS BIGINT),
      |  CAST(sum(CASE WHEN l_discount IS NULL THEN 1 ELSE 0 END) AS BIGINT),
      |  CAST(count(DISTINCT l_discount) AS BIGINT),
      |  round(min(l_discount), 4), round(max(l_discount), 4),
      |  round(avg(l_discount), 4) FROM lineitem""".stripMargin

  /** Mutual information as ONE portable SQL text — oracle of
    * `x_mutual_info` and the whole query of `x_sql_mutual_info`. The
    * engines' dayofweek conventions differ (Sunday = 0 vs 1), but dow only
    * GROUPS here and never reaches the output, so MI is identical. */
  private[queries] val MutualInfoSql =
    """WITH c AS (
      |  SELECT event_type AS a, dayofweek(ts) AS b,
      |    CAST(count(*) AS DOUBLE) AS n
      |  FROM events GROUP BY 1, 2),
      |tot AS (SELECT sum(n) AS t FROM c),
      |pa AS (SELECT a, sum(n) AS na FROM c GROUP BY 1),
      |pb AS (SELECT b, sum(n) AS nb FROM c GROUP BY 1)
      |SELECT round(sum((n / t) * ln((n * t) / (na * nb))), 6) AS mi
      |FROM c JOIN pa USING (a) JOIN pb USING (b), tot""".stripMargin

  /** Shared CTE block for the banded-SRP queries. The fixture corpus has
    * no true near-dups (max pairwise cosine ≈ 0.5 — LSH's working regime
    * starts far above that), so the queries first AUGMENT it with
    * deterministic perturbed clones (the Multimodal synthetic-near-dup
    * precedent): 1 in 4 vectors gets a copy at vec_id+10⁶ with ±0.02-scale
    * integer-seeded jitter, float-rounded IDENTICALLY in both engines
    * (cast through REAL), landing at cosine ≈ 0.99 to its original.
    *
    * Then: ±1 hyperplane weights from a pure-integer xorshift-multiply
    * mix of the plane-dim index (round 12 — the raw LCG bit20 family was
    * nearly rank-deficient: see [[graft.llm.Similarity.srpSignatures]]),
    * projections over round(e·1000) integer quantizations (sign
    * determinism — a near-zero float dot can't flip between engines'
    * summation orders), 32 planes packed as 4×8-bit band signatures,
    * OR-across-bands candidates, exact-cosine verification at τ=0.9.
    * Mirrors [[graft.llm.Similarity.srpSignatures]] seed-for-seed.
    *
    * Parameterized over (planes, bandBits) since round 12 so the banded
    * default (32, 8 — x_dedup_srp) and the single-AND-bucket variant
    * (16, 16 — x_dedup_embedding) share one text generator, mirroring how
    * both engine bodies share [[graft.llm.Similarity.srpNearDups]]. */
  private[queries] def srpCteText(planes: Int, bandBits: Int): String =
    s"""ee0 AS (
       |  SELECT vec_id, CAST(j AS BIGINT) AS j,
       |    CAST(embedding[CAST(j AS INT)+1] AS DOUBLE) AS e
       |  FROM embeddings, unnest(range(0, 64)) t(j)),
       |pert AS (
       |  SELECT vec_id + 1000000 AS vec_id, j,
       |    CAST(CAST(e + ((vec_id * 64 + j) * 2654435761 % 21 - 10)
       |      * CAST(0.002 AS DOUBLE) AS REAL) AS DOUBLE) AS e
       |  FROM ee0 WHERE vec_id % 4 = 1),
       |ee AS (SELECT * FROM ee0 UNION ALL SELECT * FROM pert),
       |${StarExt.NormsCte},
       |eq AS (SELECT vec_id, j, CAST(round(e * 1000) AS BIGINT) AS q FROM ee),
       |proj AS (
       |  SELECT eq.vec_id, p // $bandBits AS band, p % $bandBits AS bit,
       |    sum(CASE WHEN xor(
       |          (1103515245 * (p * 64 + eq.j) + 12345) % 2147483648,
       |          (1103515245 * (p * 64 + eq.j) + 12345) % 2147483648 // 32768)
       |          * 2654435761 % 2147483648 // 1024 % 2 = 1
       |      THEN eq.q ELSE -eq.q END) AS dot
       |  FROM eq, unnest(range(0, $planes)) pp(p)
       |  GROUP BY 1, 2, 3),
       |sig AS (
       |  SELECT vec_id, band,
       |    CAST(sum(CASE WHEN dot >= 0 THEN 1 << CAST(bit AS INT) ELSE 0 END)
       |      AS BIGINT) AS s
       |  FROM proj GROUP BY 1, 2),
       |cand AS (
       |  SELECT DISTINCT l.vec_id AS d1, r.vec_id AS d2
       |  FROM sig l JOIN sig r
       |    ON l.band = r.band AND l.s = r.s AND l.vec_id < r.vec_id),
       |cdots AS (
       |  SELECT c.d1, c.d2, sum(e1.e * e2.e) AS dot
       |  FROM cand c JOIN ee e1 ON e1.vec_id = c.d1
       |  JOIN ee e2 ON e2.vec_id = c.d2 AND e2.j = e1.j
       |  GROUP BY 1, 2),
       |srp AS (
       |  SELECT cdots.d1, cdots.d2,
       |    round(dot / (sqrt(n1.n2) * sqrt(n2.n2)), 6) AS cos
       |  FROM cdots JOIN norms n1 ON n1.vec_id = cdots.d1
       |  JOIN norms n2 ON n2.vec_id = cdots.d2)""".stripMargin

  private[queries] val SrpCtes = srpCteText(32, 8)

  /** [[SrpCtes]] with (band, sig) buckets over 32 anti-joined away before
    * the self-join — capped-bucket semantics as string surgery on the
    * shared text, so the two tiers cannot drift (the requires fail the
    * build if the anchor text moves). Round 12: this is x_dedup_srp's AND
    * x_dedup_srp_recall's oracle — the capped pass is the REGISTERED
    * DEFAULT, because the uncapped banded baseline measured ×16 at a ×10
    * scale-up (BENCH_SF1_r11: fixed bandBits ⇒ bucket density grows with
    * the corpus, the builder's own Similarity.srpNearDups comment) while
    * the cap hard-bounds per-bucket pair expansion at 32²/2 (measured
    * ×8.0). The round-11 bridge query x_dedup_srp_capped is retired,
    * merged into the headline (the ItemCfSql retirement precedent). */
  private[queries] def srpCappedText(planes: Int, bandBits: Int): String = {
    val base = srpCteText(planes, bandBits)
    val anchor = "cand AS ("
    val joinAnchor = "FROM sig l JOIN sig r"
    require(base.contains(anchor) && base.contains(joinAnchor),
      "srpCteText anchors moved — update srpCappedText's surgery")
    base
      .replace(anchor,
        """hotsrp AS (SELECT band, s FROM sig GROUP BY band, s
          |  HAVING count(*) > 32),
          |ksig AS (SELECT g.vec_id, g.band, g.s FROM sig g
          |  LEFT JOIN hotsrp h ON g.band = h.band AND g.s = h.s
          |  WHERE h.band IS NULL),
          |cand AS (""".stripMargin)
      .replace(joinAnchor, "FROM ksig l JOIN ksig r")
  }

  private[queries] val SrpCtesCapped = srpCappedText(32, 8)

  /** The SRP test corpus: embeddings plus deterministic perturbed clones
    * (1 in 4 originals, vec_id+10⁶, integer-seeded jitter float-rounded
    * through FloatType so both engines hold bit-identical clones).
    * `offset` (default 10⁶, the value every registered oracle text
    * spells out) must exceed the corpus's max id — SrpSizingProbe
    * passes 10⁸ for its ×1000-replica fixtures whose ids reach 10⁷;
    * the jitter seed uses the ORIGINAL id, so clone geometry is
    * offset-independent. */
  private[queries] def srpAugmented(t: graft.Tables,
      offset: Long = 1000000L): org.apache.spark.sql.DataFrame = {
    val base = t.embeddings.select(col("vec_id"), col("embedding"))
    val clones = t.embeddings.filter(col("vec_id") % 4 === 1)
      .select((col("vec_id") + offset).as("vec_id"),
        expr(
          """transform(embedding, (x, k) ->
            |  CAST(CAST(x AS DOUBLE)
            |    + ((vec_id * 64 + k) * 2654435761 % 21 - 10) * 0.002D
            |    AS FLOAT))""".stripMargin).as("embedding"))
    base.union(clones)
  }

  /** Radius-bounded grid NN as ONE portable text — oracle of
    * `x_grid_knn`, and since round 14 the shared-semantics pipeline of
    * `x_grid_knn_auto`'s dispatch oracle (R60Ops turns the final SELECT
    * into a CTE by string surgery, so the registrations cannot
    * drift). */
  private[queries] val GridKnnSql =
    """WITH p AS (
      |  SELECT c_custkey AS id, CAST(c_custkey % 97 AS BIGINT) AS x,
      |    CAST((c_custkey * 31) % 89 AS BIGINT) AS y
      |  FROM customer),
      |cand AS (
      |  SELECT a.id, b.id AS nn,
      |    (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y) AS d2
      |  FROM p a JOIN p b ON a.id <> b.id
      |    AND abs(a.x - b.x) <= 5 AND abs(a.y - b.y) <= 5
      |  WHERE (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y) <= 25),
      |r AS (SELECT id, nn, d2,
      |  row_number() OVER (PARTITION BY id ORDER BY d2, nn) AS rn FROM cand)
      |SELECT id, nn, CAST(d2 AS BIGINT) AS d2 FROM r WHERE rn = 1""".stripMargin

  /** The deterministic integer point cloud of the grid family, pinned
    * (read by the position collapse AND both search branches — the
    * Dedup.pin lifecycle). */
  private[queries] def gridPoints(t: graft.Tables): org.apache.spark.sql.DataFrame =
    t.customer.select(col("c_custkey").as("id"),
        (col("c_custkey") % 97).cast("long").as("x"),
        ((col("c_custkey") * 31) % 89).cast("long").as("y"))
      .localCheckpoint(false)

  /** The CO-LOCATION SHORT-CIRCUIT formulation (round-11 fix — the full
    * sf1 sweep measured the naive all-points probe at ×117): integer
    * coordinates mean co-located points are EXACT ties at d2 = 0, so
    * every point that is not its position's min id has its answer in one
    * grouped aggregate — nn = (0, position min id), no join at all. Only
    * the ONE min-id representative per occupied position runs the 3×3
    * grid search (against all points, so co-located (0, second-min)
    * candidates are still seen). The probe side is bounded by the
    * coordinate DOMAIN (≤ 97×89 positions here), not the corpus, so
    * candidate volume is O(positions × 9 × density) = O(corpus) — linear
    * at ANY density, where the all-points probe was O(corpus × density)
    * = quadratic on a bounded domain. Measured at the ×10 sf1h scale-up:
    * 134 s (naive probe, ×117 vs sf0.1) → 6.2 s (×2.7) — BENCH_NOTES
    * round 11. */
  private[queries] def gridShortCircuit(
      pts: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val radius = 5
    // position collapse: min id per occupied integer coordinate —
    // the frame is coordinate-DOMAIN-bounded (≤ 97×89 rows)
    val pos = pts.groupBy("x", "y").agg(min(col("id")).as("m1"))
    val withM = pts.join(pos, Seq("x", "y"))
    // every non-representative point: nearest is co-located, d2 = 0,
    // nn = the position's min id (the oracle's (d2, nn) order picks
    // exactly this pair) — one join against the tiny pos frame
    val direct = withM.filter(col("id") =!= col("m1"))
      .select(col("id"), col("m1").as("nn"), lit(0L).as("d2"))
    // representatives (≤ one per position) run the 3×3 grid search
    // against ALL points — co-located (0, second-min) candidates
    // included via the same-position, id ≠ nn pairs
    val reps = withM.filter(col("id") === col("m1"))
      .select(col("id"), col("x"), col("y"))
    direct.union(gridCellSearch(reps, pts))
  }

  /** The 3×3 neighbor-cell search of `probe` points against ALL of
    * `pts`, cell width = radius (Euclid ≤ R ⟹ L∞ ≤ R, so the candidate
    * set is EXACT for radius-bounded NN); winner = lexicographic
    * min-struct (d2, nn) — a bounded-state aggregate, not a window.
    * Shared core of [[gridShortCircuit]] (probe = the per-position
    * representatives) and [[R60Ops]]'s direct formulation (probe = every
    * point — the low-density branch of the x_grid_knn_auto dispatch,
    * O(corpus × density): the right plan exactly when the density canary
    * reads linear). */
  private[queries] def gridCellSearch(probe: org.apache.spark.sql.DataFrame,
      pts: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val radius = 5
    val probes = probe
      .select(col("id"), col("x"), col("y"),
        floor(col("x") / radius).as("cx"), floor(col("y") / radius).as("cy"))
      .select(col("id"), col("x"), col("y"),
        explode(expr(
          """flatten(transform(sequence(-1, 1), dx ->
            |  transform(sequence(-1, 1), dy ->
            |    struct(cx + dx AS cx, cy + dy AS cy))))""".stripMargin)).as("nc"))
      .select(col("id"), col("x"), col("y"), col("nc.cx"), col("nc.cy"))
    val dx = col("x") - col("nx")
    val dy = col("y") - col("ny")
    probes
      .join(pts.select(col("id").as("nn"), col("x").as("nx"),
          col("y").as("ny"), floor(col("x") / radius).as("cx"),
          floor(col("y") / radius).as("cy")),
        Seq("cx", "cy"))
      .filter(col("id") =!= col("nn"))
      .withColumn("d2", dx * dx + dy * dy)
      .filter(col("d2") <= radius * radius)
      .groupBy("id")
      .agg(min(struct(col("d2"), col("nn"))).as("m"))
      .select(col("id"), col("m.nn").as("nn"), col("m.d2").cast("long").as("d2"))
  }

  def defs: Seq[QDef] = Seq(

    // Banded SRP-LSH embedding near-dup — the OR-amplified recall upgrade
    // of x_dedup_embedding's single AND-bucket (Similarity.srpNearDups):
    // 32 sign-hyperplanes as 4×8-bit bands, candidates = agree on ANY
    // band, exact cosine ≥ 0.9 verified within candidates only (for a
    // clone at cos 0.99, each band agrees w.p. ≈ 0.86⁸ ≈ 0.3 and the OR
    // over 4 bands lifts recall past 0.8 — measured by the companion
    // recall query). The whole signature computation is ONE scan-local
    // integer projection; false positives only cost the verify cosine.
    // Round 12: the CAPPED tier (maxBucket = 32, oracle carrying the
    // identical hot-bucket anti-join) is the registered default — fixed
    // bandBits means bucket DENSITY grows with the corpus (×16 uncapped
    // vs ×8.0 capped at the ×10 scale-up, BENCH_SF1_r11), the same flip
    // the text-side pipeline made in round 11. Where the cap binds —
    // measured via x_srp_band_density (round 13): at sf0.01 (625
    // augmented vectors) it never does (max bucket 13); at sf0.1 (2,500)
    // it binds MILDLY — 5 of ~1,016 buckets exceed 32 (max 37, bands 1
    // and 3), so the capped default does drop a small candidate slice at
    // the bench scale. The gates still match because the oracle carries
    // the identical cap semantics, and the recall harness prices the
    // cost: x_dedup_srp_recall reads 1.0 at both gate scales.
    QDef("x_dedup_srp",
      s"""WITH $SrpCtesCapped
         |SELECT d1, d2, cos FROM srp WHERE cos >= 0.9""".stripMargin) { (s, d) =>
      graft.llm.Similarity.srpNearDups(R9Ops.srpAugmented(Tables(s, d)),
        planes = 32, bandBits = 8, dims = 64, tau = 0.9, maxBucket = 32)
    },

    // Measured SRP recall against brute-force truth on a sub-universe:
    // 1 in 20 clone families UP TO AN ABSOLUTE CAP of 4000 base ids — a
    // fixed-fraction sample alone is sf-proportional, so the truth-side
    // broadcast (and the O(|sub|^2) exact pass) would grow with the
    // corpus; the id cap pins the probe set (round-9 two-decade probe
    // catch). Below the cap (all driver SFs) results are unchanged; the
    // brute pair join broadcasts the bounded probe set ->
    // BroadcastNestedLoopJoin, never a corpus cross product.
    QDef("x_dedup_srp_recall",
      s"""WITH $SrpCtesCapped,
         |sub AS (SELECT * FROM ee
         |  WHERE (vec_id % 1000000) % 20 = 1 AND (vec_id % 1000000) < 4000),
         |tdots AS (
         |  SELECT e1.vec_id AS d1, e2.vec_id AS d2, sum(e1.e * e2.e) AS dot
         |  FROM sub e1 JOIN sub e2 ON e2.j = e1.j AND e1.vec_id < e2.vec_id
         |  GROUP BY 1, 2),
         |truth AS (
         |  SELECT tdots.d1, tdots.d2 FROM tdots
         |  JOIN norms n1 ON n1.vec_id = tdots.d1
         |  JOIN norms n2 ON n2.vec_id = tdots.d2
         |  WHERE round(dot / (sqrt(n1.n2) * sqrt(n2.n2)), 6) >= 0.9),
         |found AS (
         |  SELECT srp.d1, srp.d2 FROM srp
         |  JOIN truth ON truth.d1 = srp.d1 AND truth.d2 = srp.d2
         |  WHERE cos >= 0.9),
         |nt AS (SELECT CAST(count(*) AS BIGINT) AS n_true FROM truth),
         |nf AS (SELECT CAST(count(*) AS BIGINT) AS n_found FROM found)
         |SELECT n_true, n_found,
         |  round(CASE WHEN n_true = 0 THEN NULL
         |    ELSE n_found / CAST(n_true AS DOUBLE) END, 6) AS recall
         |FROM nt, nf""".stripMargin) { (s, d) =>
      val aug = R9Ops.srpAugmented(Tables(s, d))
      val sub = aug.filter((col("vec_id") % 1000000) % 20 === 1
        && (col("vec_id") % 1000000) < 4000)
      val l = sub.select(col("vec_id").as("d1"), col("embedding").as("e1"))
      val r = sub.select(col("vec_id").as("d2"), col("embedding").as("e2"))
      val truth = l.join(broadcast(r), col("d1") < col("d2"))
        .select(col("d1"), col("d2"),
          graft.llm.Similarity.cosine(col("e1"), col("e2")).as("cos"))
        .filter(col("cos") >= 0.9)
        .select("d1", "d2")
      // measures the REGISTERED tier (capped, round 12) — when the cap
      // binds, its recall cost shows up in this number, which is the point
      val found = graft.llm.Similarity.srpNearDups(aug,
          planes = 32, bandBits = 8, dims = 64, tau = 0.9, maxBucket = 32)
        .join(truth, Seq("d1", "d2"), "left_semi")
      val nt = truth.agg(count(lit(1)).as("n_true"))
      val nf = found.agg(count(lit(1)).as("n_found"))
      nt.crossJoin(nf).select(col("n_true"), col("n_found"),
        round(when(col("n_true") === 0, lit(null))
          .otherwise(col("n_found") / col("n_true").cast("double")), 6)
          .as("recall"))
    },

    // Mutual information between event type and day-of-week from ONE
    // contingency aggregate: I(A;B) = Σ p_ab·ln(p_ab/(p_a·p_b)) over the
    // 35-cell grid, marginals broadcast back. The information-theoretic
    // dependence read feature-selection pipelines run; dow only GROUPS
    // here, so the Spark/DuckDB dayofweek offset can't matter.
    QDef("x_mutual_info", R9Ops.MutualInfoSql) { (s, d) =>
      val c = Tables(s, d).events
        .groupBy(col("event_type").as("a"), dayofweek(col("ts")).as("b"))
        .agg(count(lit(1)).cast("double").as("n"))
      val tot = c.agg(sum(col("n")).as("t"))
      val pa = c.groupBy("a").agg(sum(col("n")).as("na"))
      val pb = c.groupBy("b").agg(sum(col("n")).as("nb"))
      c.join(broadcast(pa), "a").join(broadcast(pb), "b")
        .crossJoin(broadcast(tot))
        .agg(round(sum((col("n") / col("t"))
          * log((col("n") * col("t")) / (col("na") * col("nb")))), 6).as("mi"))
    },

    // Rendezvous (highest-random-weight) sharding: each document goes to
    // the shard with the max deterministic weight, entirely in-row (an
    // 8-element argmax — zero shuffle for assignment). The output is the
    // 8→7 movement matrix, which EXHIBITS rendezvous's minimal-disruption
    // property as data: removing shard 7 moves ONLY shard 7's documents
    // (every off-diagonal row has shard8 = 7). Weights are made
    // collision-free per document (wt·8 + (7−s)) so the argmax order
    // (wt DESC, s ASC) is total in both engines.
    QDef("x_shard_rendezvous",
      """WITH w AS (
        |  SELECT doc_id, s,
        |    ((doc_id * 2654435761 + s * 40503) % 1000003) * 8 + (7 - s) AS wt
        |  FROM documents, unnest(range(0, 8)) t(s)),
        |a8 AS (SELECT doc_id, s AS shard8 FROM (
        |  SELECT doc_id, s,
        |    row_number() OVER (PARTITION BY doc_id ORDER BY wt DESC) AS rn
        |  FROM w) z WHERE rn = 1),
        |a7 AS (SELECT doc_id, s AS shard7 FROM (
        |  SELECT doc_id, s,
        |    row_number() OVER (PARTITION BY doc_id ORDER BY wt DESC) AS rn
        |  FROM w WHERE s <> 7) z WHERE rn = 1)
        |SELECT CAST(a8.shard8 AS INT) AS shard8, CAST(a7.shard7 AS INT) AS shard7,
        |  CAST(count(*) AS BIGINT) AS n
        |FROM a8 JOIN a7 ON a7.doc_id = a8.doc_id
        |GROUP BY 1, 2""".stripMargin) { (s, d) =>
      def assign(n: Int, excl: Int, as: String) = expr(
        s"""CAST(array_max(transform(
           |  filter(sequence(0, ${n - 1}), s -> s != $excl),
           |  s -> struct(
           |    ((doc_id * 2654435761 + s * 40503) % 1000003) * 8 + (7 - s) AS wt,
           |    s AS s))).s AS INT)""".stripMargin).as(as)
      Tables(s, d).documents
        .select(col("doc_id"), assign(8, -1, "shard8"), assign(8, 7, "shard7"))
        .groupBy("shard8", "shard7")
        .agg(count(lit(1)).as("n"))
    },

    // Binary-quantized retrieval (the 1-bit embedding mode modern vector
    // stores ship): 64 sign bits packed into two BIGINT halves in ONE
    // scan-local fold, Hamming = popcount(xor) — integer ops the whole
    // way — query top-10 via the bounded-heap TopKByScore (score = −hd ⇒
    // (hd ASC, id ASC), the window order exactly), then exact-cosine
    // rerank on just the k hits. 32× smaller vectors than float32 and a
    // 2-instruction distance, at recall the rerank restores.
    QDef("x_sim_binary_topk",
      s"""WITH ${StarExt.EmbExpl},
         |${StarExt.NormsCte},
         |sig AS (
         |  SELECT vec_id,
         |    CAST(sum(CASE WHEN embedding[CAST(j AS INT)+1] >= 0 AND j < 32
         |      THEN CAST(1 AS BIGINT) << CAST(j AS INT) ELSE 0 END) AS BIGINT) AS h0,
         |    CAST(sum(CASE WHEN embedding[CAST(j AS INT)+1] >= 0 AND j >= 32
         |      THEN CAST(1 AS BIGINT) << CAST(j - 32 AS INT) ELSE 0 END) AS BIGINT) AS h1
         |  FROM embeddings, unnest(range(0, 64)) t(j) GROUP BY 1),
         |q AS (SELECT * FROM sig WHERE vec_id < 5),
         |c AS (SELECT * FROM sig WHERE vec_id >= 5),
         |ham AS (
         |  SELECT q.vec_id AS qid, c.vec_id AS cid,
         |    bit_count(xor(q.h0, c.h0)) + bit_count(xor(q.h1, c.h1)) AS hd
         |  FROM q, c),
         |r AS (SELECT qid, cid, hd,
         |  row_number() OVER (PARTITION BY qid ORDER BY hd, cid) AS rn FROM ham),
         |hits AS (SELECT qid, cid, hd, rn FROM r WHERE rn <= 10),
         |dots AS (
         |  SELECT h.qid, h.cid, h.hd, h.rn, sum(e1.e * e2.e) AS dot
         |  FROM hits h JOIN ee e1 ON e1.vec_id = h.qid
         |  JOIN ee e2 ON e2.vec_id = h.cid AND e2.j = e1.j
         |  GROUP BY 1, 2, 3, 4)
         |SELECT qid, cid, CAST(hd AS BIGINT) AS hamming, CAST(rn AS INT) AS rank,
         |  round(dot / (sqrt(n1.n2) * sqrt(n2.n2)), 6) AS cos
         |FROM dots JOIN norms n1 ON n1.vec_id = dots.qid
         |JOIN norms n2 ON n2.vec_id = dots.cid""".stripMargin) { (s, d) =>
      val emb = Tables(s, d).embeddings
      val sig = emb.select(col("vec_id"), col("embedding"),
        expr("""aggregate(sequence(0, 31), 0L, (s, k) ->
                |  s + IF(embedding[k] >= 0, shiftleft(CAST(1 AS BIGINT), k), 0L))""".stripMargin).as("h0"),
        expr("""aggregate(sequence(32, 63), 0L, (s, k) ->
                |  s + IF(embedding[k] >= 0, shiftleft(CAST(1 AS BIGINT), k - 32), 0L))""".stripMargin).as("h1"))
      val q = sig.filter(col("vec_id") < 5)
        .select(col("vec_id").as("qid"), col("embedding").as("qe"),
          col("h0").as("q0"), col("h1").as("q1"))
      val ham = sig.filter(col("vec_id") >= 5)
        .crossJoin(broadcast(q))
        .select(col("qid"), col("vec_id").as("cid"), col("qe"), col("embedding"),
          (bit_count(col("q0").bitwiseXOR(col("h0")))
            + bit_count(col("q1").bitwiseXOR(col("h1")))).as("hd"))
      // bounded heap: score = −hd ⇒ best-first (hd asc, cid asc)
      val top = ham.groupBy("qid")
        .agg(graft.functions.TopKByScore.topKByScore(
          -col("hd").cast("double"), col("cid"), 10).as("top"))
        .select(col("qid"), posexplode(col("top")).as(Seq("i", "hit")))
        .select(col("qid"), col("hit.id").as("cid"),
          (-col("hit.score")).cast("long").as("hamming"),
          (col("i") + 1).cast("int").as("rank"))
      top
        .join(emb.select(col("vec_id").as("qid"), col("embedding").as("qe")), "qid")
        .join(emb.select(col("vec_id").as("cid"), col("embedding").as("ce")), "cid")
        .select(col("qid"), col("cid"), col("hamming"), col("rank"),
          graft.llm.Similarity.cosine(col("qe"), col("ce")).as("cos"))
    },

    // CUSUM sequential change detection over the daily mean: the
    // max(0, S+y) recursion in its closed window form S_t = C_t −
    // min(0, min_{i≤t} C_i) (cumsum minus its running minimum) — exact,
    // no recursion, day-cardinality frames only (the global windows order
    // the 30-row daily aggregate — the budget-select carve-out). Alert
    // when drift exceeds 2σ of the daily means.
    QDef("x_cusum_drift", R9Ops.CusumSql) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val dm = Tables(s, d).events
        .groupBy(to_date(date_trunc("day", col("ts"))).as("d"))
        .agg(avg(col("value")).as("x"))
      val st = dm.agg(avg(col("x")).as("mu"), stddev_samp(col("x")).as("sd"))
      val prefix = Window.orderBy("d")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      dm.crossJoin(broadcast(st))
        .withColumn("cy",
          sum(col("x") - col("mu") - lit(0.25) * col("sd")).over(prefix))
        .withColumn("s", col("cy") - least(lit(0.0), min(col("cy")).over(prefix)))
        .select(col("d"), round(col("x"), 4).as("day_mean"),
          round(col("s"), 4).as("cusum"),
          when(col("s") > lit(2.0) * col("sd"), 1).otherwise(0).as("alert"))
    },

    // CUSUM through Spark's SQL parser, same shared text.
    QDef("x_sql_cusum", R9Ops.CusumSql) { (s, d) =>
      SqlSurface.viewed(s, d, "events")
      s.sql(R9Ops.CusumSql)
    },

    // In-database linear regression per group: slope/intercept/R² from
    // Spark's regr_* aggregates — ONE pass of co-moment accumulation per
    // group (the same partial/final machinery as corr), no iteration, no
    // driver math. The per-segment trend read BI pipelines run.
    QDef("x_regr_by_group",
      """SELECT l_returnflag,
        |  round(regr_slope(l_extendedprice, l_quantity), 4) AS slope,
        |  round(regr_intercept(l_extendedprice, l_quantity), 4) AS intercept,
        |  round(regr_r2(l_extendedprice, l_quantity), 6) AS r2,
        |  CAST(count(*) AS BIGINT) AS n
        |FROM lineitem GROUP BY 1""".stripMargin) { (s, d) =>
      Tables(s, d).lineitem.groupBy("l_returnflag")
        .agg(round(regr_slope(col("l_extendedprice"), col("l_quantity")), 4)
            .as("slope"),
          round(regr_intercept(col("l_extendedprice"), col("l_quantity")), 4)
            .as("intercept"),
          round(regr_r2(col("l_extendedprice"), col("l_quantity")), 6).as("r2"),
          count(lit(1)).as("n"))
    },

    // t-closeness audit — the third leg of the privacy triad
    // (x_k_anonymity, x_l_diversity): per quasi-identifier group, the
    // earth-mover's distance between the group's sensitive-value
    // distribution and the global one, computed over ordered value bins
    // as max |cumulative difference|. The bin grid is built by a
    // group×bin cross of two KB aggregates — the corpus contributes two
    // grouped counts, every window orders bin-cardinality frames.
    QDef("x_t_closeness",
      """WITH b AS (
        |  SELECT c_mktsegment AS g, CAST(round(c_acctbal / 2000) AS BIGINT) AS bin
        |  FROM customer),
        |gb AS (SELECT g, bin, CAST(count(*) AS DOUBLE) AS n FROM b GROUP BY 1, 2),
        |gt AS (SELECT g, sum(n) AS ng FROM gb GROUP BY 1),
        |ob AS (SELECT bin, CAST(count(*) AS DOUBLE) AS n FROM b GROUP BY 1),
        |ot AS (SELECT sum(n) AS nt FROM ob),
        |grid AS (
        |  SELECT gt.g, ob.bin, coalesce(gb.n, 0) / gt.ng AS p, ob.n / ot.nt AS q
        |  FROM gt CROSS JOIN ob CROSS JOIN ot
        |  LEFT JOIN gb ON gb.g = gt.g AND gb.bin = ob.bin),
        |cum AS (
        |  SELECT g, bin, sum(p - q) OVER (PARTITION BY g ORDER BY bin
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cd
        |  FROM grid)
        |SELECT g AS segment, round(max(abs(cd)), 6) AS t_closeness
        |FROM cum GROUP BY 1""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val b = Tables(s, d).customer.select(col("c_mktsegment").as("g"),
        round(col("c_acctbal") / 2000).cast("long").as("bin"))
      val gb = b.groupBy("g", "bin").agg(count(lit(1)).cast("double").as("n"))
      val gt = gb.groupBy("g").agg(sum(col("n")).as("ng"))
      val ob = b.groupBy("bin").agg(count(lit(1)).cast("double").as("n2"))
      val ot = ob.agg(sum(col("n2")).as("nt"))
      val grid = broadcast(gt).crossJoin(broadcast(ob)).crossJoin(broadcast(ot))
        .join(gb, Seq("g", "bin"), "left")
        .select(col("g"), col("bin"),
          (coalesce(col("n"), lit(0.0)) / col("ng")).as("p"),
          (col("n2") / col("nt")).as("q"))
      val prefix = Window.partitionBy("g").orderBy("bin")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      grid.withColumn("cd", sum(col("p") - col("q")).over(prefix))
        .groupBy(col("g").as("segment"))
        .agg(round(max(abs(col("cd"))), 6).as("t_closeness"))
    },

    // Rank-percentile feature transform: percent_rank of retail price
    // within brand — the distribution-free normalization (rank → [0,1])
    // feature pipelines prefer over z-scores for heavy tails. One
    // brand-partitioned window; (price, partkey) total order makes ranks
    // engine-identical.
    QDef("x_rank_features",
      """SELECT p_partkey, p_brand,
        |  round(percent_rank() OVER (PARTITION BY p_brand
        |    ORDER BY p_retailprice, p_partkey), 6) AS price_pctile
        |FROM part""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("p_brand")
        .orderBy(col("p_retailprice"), col("p_partkey"))
      Tables(s, d).part.select(col("p_partkey"), col("p_brand"),
        round(percent_rank().over(w), 6).as("price_pctile"))
    },

    // TRAINED Naive Bayes language ID (the learned complement of
    // x_text_langid's n-gram heuristic): Laplace-smoothed per-(lang, term)
    // log-probs from one corpus aggregate, scored with the unseen-word
    // decomposition score = prior + miss·|doc| + Σ_hits tf·(logp − miss)
    // so the (lang × vocab) grid never materializes. All log-probs are
    // quantized to BIGINT nano-units (the x_quality_train discipline):
    // per-doc score sums are exact integers, so the argmax can't flip
    // between engines' float summation orders. Output: the confusion
    // matrix. Model and per-lang constants are KB broadcasts; corpus work
    // is two aggregates + one model join.
    QDef("x_nb_langid",
      """WITH w AS (
        |  SELECT doc_id, lang, term, CAST(count(*) AS BIGINT) AS tf FROM (
        |    SELECT doc_id, lang, unnest(string_split(text, ' ')) AS term
        |    FROM documents)
        |  WHERE len(term) >= 2 GROUP BY 1, 2, 3),
        |vocab AS (SELECT CAST(count(DISTINCT term) AS DOUBLE) AS v FROM w),
        |wc AS (SELECT lang, term, CAST(sum(tf) AS DOUBLE) AS c FROM w GROUP BY 1, 2),
        |ltot AS (SELECT lang, sum(c) AS n FROM wc GROUP BY 1),
        |nd AS (SELECT lang, CAST(count(*) AS DOUBLE) AS nd FROM documents GROUP BY 1),
        |ndt AS (SELECT sum(nd) AS t FROM nd),
        |langs AS (
        |  SELECT l.lang,
        |    CAST(round(ln(nd.nd / ndt.t) * 1e6) AS BIGINT) AS prior_n,
        |    CAST(round(ln(1 / (l.n + vocab.v)) * 1e6) AS BIGINT) AS miss_n
        |  FROM ltot l JOIN nd ON nd.lang = l.lang, ndt, vocab),
        |model AS (
        |  SELECT wc.lang, wc.term,
        |    CAST(round(ln((wc.c + 1) / (l.n + vocab.v)) * 1e6) AS BIGINT) AS logp_n
        |  FROM wc JOIN ltot l ON l.lang = wc.lang, vocab),
        |docstats AS (SELECT doc_id, lang AS actual, CAST(sum(tf) AS BIGINT) AS t
        |             FROM w GROUP BY 1, 2),
        |hits AS (
        |  SELECT w.doc_id, m.lang,
        |    CAST(sum(w.tf * (m.logp_n - lg.miss_n)) AS BIGINT) AS hit_n
        |  FROM w JOIN model m ON m.term = w.term
        |  JOIN langs lg ON lg.lang = m.lang
        |  GROUP BY 1, 2),
        |scores AS (
        |  SELECT ds.doc_id, ds.actual, lg.lang,
        |    lg.prior_n + lg.miss_n * ds.t + coalesce(h.hit_n, 0) AS score
        |  FROM docstats ds CROSS JOIN langs lg
        |  LEFT JOIN hits h ON h.doc_id = ds.doc_id AND h.lang = lg.lang),
        |pred AS (
        |  SELECT doc_id, actual, lang AS predicted,
        |    row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, lang) AS rn
        |  FROM scores)
        |SELECT actual, predicted, CAST(count(*) AS BIGINT) AS n
        |FROM pred WHERE rn = 1 GROUP BY 1, 2""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val w = Tables(s, d).documents
        .select(col("doc_id"), col("lang"),
          explode(split(col("text"), " ")).as("term"))
        .filter(length(col("term")) >= 2)
        .groupBy("doc_id", "lang", "term").agg(count(lit(1)).as("tf"))
        .localCheckpoint(false) // shared by train + score passes
      val vocab = w.agg(countDistinct(col("term")).cast("double").as("v"))
      val wc = w.groupBy("lang", "term").agg(sum(col("tf")).cast("double").as("c"))
      val ltot = wc.groupBy("lang").agg(sum(col("c")).as("n"))
      val nd = Tables(s, d).documents.groupBy("lang")
        .agg(count(lit(1)).cast("double").as("nd"))
      val ndt = nd.agg(sum(col("nd")).as("t"))
      def nano(c: org.apache.spark.sql.Column) = round(c * 1e6).cast("long")
      val langs = ltot.join(nd, "lang").crossJoin(ndt).crossJoin(vocab)
        .select(col("lang"), nano(log(col("nd") / col("t"))).as("prior_n"),
          nano(log(lit(1.0) / (col("n") + col("v")))).as("miss_n"))
      val model = wc.join(ltot, "lang").crossJoin(vocab)
        .select(col("lang"), col("term"),
          nano(log((col("c") + 1) / (col("n") + col("v")))).as("logp_n"))
      val docstats = w.groupBy(col("doc_id"), col("lang").as("actual"))
        .agg(sum(col("tf")).as("t"))
      val hits = w.select(col("doc_id"), col("term"), col("tf"))
        .join(broadcast(model.join(langs.select("lang", "miss_n"), "lang")), "term")
        .groupBy("doc_id", "lang")
        .agg(sum(col("tf") * (col("logp_n") - col("miss_n"))).as("hit_n"))
      val scores = docstats.crossJoin(broadcast(langs))
        .join(hits, Seq("doc_id", "lang"), "left")
        .select(col("doc_id"), col("actual"), col("lang"),
          (col("prior_n") + col("miss_n") * col("t")
            + coalesce(col("hit_n"), lit(0L))).as("score"))
      val rn = row_number().over(
        Window.partitionBy("doc_id").orderBy(col("score").desc, col("lang")))
      scores.withColumn("rn", rn).filter(col("rn") === 1)
        .groupBy(col("actual"), col("lang").as("predicted"))
        .agg(count(lit(1)).as("n"))
    },

    // Leakage-safe target encoding: each (category, fold)'s encoding is
    // the smoothed target mean over the OTHER folds — computed by
    // complement subtraction (category totals minus own fold), so the
    // out-of-fold statistic needs NO per-fold re-scan: one grouped
    // aggregate, category-sized frames, m=10 prior smoothing toward the
    // global mean. The feature-prep op that prevents target leakage in
    // gradient-boosting pipelines.
    QDef("x_target_encode",
      """WITH r AS (
        |  SELECT c.c_mktsegment AS cat, o.o_orderkey % 5 AS fold,
        |    o.o_totalprice AS y
        |  FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey),
        |cf AS (SELECT cat, fold, sum(y) AS s, CAST(count(*) AS DOUBLE) AS n
        |       FROM r GROUP BY 1, 2),
        |ct AS (SELECT cat, sum(s) AS st, sum(n) AS nt FROM cf GROUP BY 1),
        |g AS (SELECT sum(s) / sum(n) AS prior FROM cf)
        |SELECT cf.cat, CAST(cf.fold AS INT) AS fold,
        |  round(((ct.st - cf.s) + 10 * g.prior) / ((ct.nt - cf.n) + 10), 4)
        |    AS encoding
        |FROM cf JOIN ct ON ct.cat = cf.cat, g""".stripMargin) { (s, d) =>
      val t = Tables(s, d)
      val r = t.orders
        .join(broadcast(t.customer), col("c_custkey") === col("o_custkey"))
        .select(col("c_mktsegment").as("cat"),
          pmod(col("o_orderkey"), lit(5)).cast("int").as("fold"),
          col("o_totalprice").as("y"))
      val cf = r.groupBy("cat", "fold")
        .agg(sum(col("y")).as("s"), count(lit(1)).cast("double").as("n"))
      val ct = cf.groupBy("cat").agg(sum(col("s")).as("st"), sum(col("n")).as("nt"))
      val g = cf.agg((sum(col("s")) / sum(col("n"))).as("prior"))
      cf.join(broadcast(ct), "cat").crossJoin(broadcast(g))
        .select(col("cat"), col("fold"),
          round(((col("st") - col("s")) + lit(10) * col("prior"))
            / ((col("nt") - col("n")) + lit(10)), 4).as("encoding"))
    },

    // Tokenizer fertility per language — tokens emitted per whitespace
    // word under the 3-merge BPE model trained on this corpus (the
    // tokenizer-health metric multilingual pipelines track; fertility ≫ 1
    // flags under-trained scripts). Reuses the Bpe train→encode chain;
    // the model is the only driver traffic, encode is the zero-shuffle
    // scan pass, the rollup is language-cardinality.
    QDef("x_token_fertility",
      s"""WITH ${R8Ops.BpeCtes},
         |enc AS (
         |  SELECT d.doc_id, d.lang,
         |    CAST(coalesce(list_sum(list_transform(
         |      list_filter(string_split(d.text, ' '), w -> len(w) > 0),
         |      w -> len(string_split(replace(replace(replace(
         |        '(' || array_to_string(string_split(w, ''), ')(') || ')',
         |        m1.pair, replace(m1.pair, ')(', '')),
         |        m2.pair, replace(m2.pair, ')(', '')),
         |        m3.pair, replace(m3.pair, ')(', '')), ')(')))), 0) AS BIGINT)
         |      AS n_tokens,
         |    CAST(len(list_filter(string_split(d.text, ' '), w -> len(w) > 0))
         |      AS BIGINT) AS n_words
         |  FROM documents d, m1, m2, m3)
         |SELECT lang, CAST(sum(n_tokens) AS BIGINT) AS tokens,
         |  CAST(sum(n_words) AS BIGINT) AS words,
         |  round(sum(n_tokens) / CAST(sum(n_words) AS DOUBLE), 6) AS fertility
         |FROM enc GROUP BY 1""".stripMargin) { (s, d) =>
      val docs = Tables(s, d).documents
      val merges = graft.llm.Bpe.train(docs, "text", rounds = 3)
        .orderBy("round").collect().map(_.getString(1)).toSeq
      val enc = graft.llm.Bpe.encodeCounts(docs, "doc_id", "text", merges)
      enc.join(docs.select(col("doc_id"), col("lang"),
          size(expr("filter(split(text, ' '), w -> length(w) > 0)"))
            .cast("long").as("n_words")), "doc_id")
        .groupBy("lang")
        .agg(sum(col("n_tokens")).as("tokens"), sum(col("n_words")).as("words"),
          round(sum(col("n_tokens")) / sum(col("n_words")).cast("double"), 6)
            .as("fertility"))
    },

    // The k-core peel through Spark's SQL parser — both halves are the
    // SAME text the DuckDB oracle runs (the CcSql twin contract), but
    // Spark doesn't materialize multiply-referenced CTEs, so executing the
    // oracle text flat re-derives the corpus-scale edge CTE once per peel
    // round (6 references ⇒ ~6 corpus passes). Materialize the edge frame
    // ONCE (`localCheckpoint` — the iterative-graph pattern of
    // graph/GraphMetrics.scala) behind a temp view named `e`, then run the
    // peel half verbatim over it — the exact refactor a view/CTE
    // materialization pass would do, expressed at the API surface.
    QDef("x_sql_kcore", R9Ops.KCoreSql) { (s, d) =>
      SqlSurface.viewed(s, d, "lineitem", "part")
      s.sql(s"""WITH ${R9Ops.KCoreEdgeCtes}
               |SELECT u, v FROM e0 UNION SELECT v, u FROM e0""".stripMargin)
        .transform(SqlSurface.materialized("e"))
      s.sql(s"WITH ${R9Ops.KCorePeelBody}")
    },

    // Column profiling — the warehouse DESCRIBE/stats pass: count, nulls,
    // exact distinct, min/max/mean for each measure in ONE corpus scan
    // (a single aggregate computes every column's stats; count-distincts
    // expand map-side), pivoted to a row per column with stack(). The
    // oracle unions per-column scans instead — same numbers.
    QDef("x_profile_columns", R9Ops.ProfileSql) { (s, d) =>
      val cols = Seq("l_quantity", "l_extendedprice", "l_discount")
      val aggs = cols.zipWithIndex.flatMap { case (c, i) => Seq(
        count(lit(1)).as(s"n$i"),
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"nulls$i"),
        countDistinct(col(c)).as(s"nd$i"),
        round(min(col(c)), 4).as(s"mn$i"), round(max(col(c)), 4).as(s"mx$i"),
        round(avg(col(c)), 4).as(s"mean$i"))
      }
      val one = Tables(s, d).lineitem.agg(aggs.head, aggs.tail: _*)
      val stackArgs = cols.zipWithIndex
        .map { case (c, i) => s"'$c', n$i, nulls$i, nd$i, mn$i, mx$i, mean$i" }
        .mkString(", ")
      one.select(expr(
        s"stack(${cols.size}, $stackArgs) AS (col, n, nulls, n_distinct, min_v, max_v, mean_v)"))
    },

    // The profile through Spark's SQL parser — the portable per-column
    // UNION text shared verbatim with the DuckDB oracle (Catalyst still
    // collapses the three scans' aggregates; the Dataset form above pins
    // the explicit one-pass plan).
    QDef("x_sql_profile", R9Ops.ProfileSql) { (s, d) =>
      SqlSurface.viewed(s, d, "lineitem")
      s.sql(R9Ops.ProfileSql)
    },

    // Boilerplate phrase mining: the 20 most frequent 5-grams with their
    // document frequency — the corpus-wide repeated-phrase detector that
    // feeds template/boilerplate strip lists (the cross-document
    // complement of x_dedup_substring's per-pair spans). Explode → ONE
    // pair of aggregates → bounded-heap top-k (TakeOrderedAndProject);
    // (n DESC, gram) total order makes the cut engine-stable.
    QDef("x_text_boilerplate",
      """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        |g AS (
        |  SELECT doc_id, w[CAST(i AS INT)] || ' ' || w[CAST(i AS INT)+1] || ' '
        |    || w[CAST(i AS INT)+2] || ' ' || w[CAST(i AS INT)+3] || ' '
        |    || w[CAST(i AS INT)+4] AS gram
        |  FROM toks, unnest(range(1, len(w)-3)) t(i)),
        |c AS (SELECT gram, CAST(count(*) AS BIGINT) AS n,
        |        CAST(count(DISTINCT doc_id) AS BIGINT) AS df
        |      FROM g GROUP BY 1)
        |SELECT gram, n, df FROM c ORDER BY n DESC, gram LIMIT 20""".stripMargin) {
      (s, d) =>
        val toks = Tables(s, d).documents
          .select(col("doc_id"), split(col("text"), " ").as("w"))
        val grams = toks.select(col("doc_id"), explode(expr(
            """transform(sequence(1, size(w) - 4), i ->
              |  concat_ws(' ', w[i-1], w[i], w[i+1], w[i+2], w[i+3]))""".stripMargin))
            .as("gram"))
        grams.groupBy("gram")
          .agg(count(lit(1)).as("n"), countDistinct(col("doc_id")).as("df"))
          .orderBy(col("n").desc, col("gram"))
          .limit(20)
    },

    // PPMI word co-occurrence (window ≤ 2, the word2vec/GloVe statistics
    // pass): skip-gram pair counts from a position self-join keyed by
    // doc_id (per-doc bounded fanout), marginals broadcast, PMI =
    // ln(n·T/(n_x·n_y)), top-25 by (pmi DESC, x, y). The co-occurrence
    // matrix an embedding-pretraining pipeline materializes at corpus
    // scale — pair-keyed aggregates, never a vocabulary cross product.
    QDef("x_text_pmi",
      """WITH toks AS (SELECT doc_id,
        |  list_filter(string_split(text, ' '), x -> len(x) >= 2) AS w
        |  FROM documents),
        |tok AS (SELECT doc_id, CAST(i AS BIGINT) AS i, w[CAST(i AS INT)] AS t
        |        FROM toks, unnest(range(1, len(w)+1)) z(i)),
        |pairs AS (
        |  SELECT a.t AS x, b.t AS y, CAST(count(*) AS DOUBLE) AS n
        |  FROM tok a JOIN tok b
        |    ON a.doc_id = b.doc_id AND b.i > a.i AND b.i <= a.i + 2
        |  GROUP BY 1, 2),
        |tx AS (SELECT x, sum(n) AS nx FROM pairs GROUP BY 1),
        |ty AS (SELECT y, sum(n) AS ny FROM pairs GROUP BY 1),
        |tot AS (SELECT sum(n) AS t FROM pairs)
        |SELECT x, y, CAST(n AS BIGINT) AS n,
        |  round(ln((n * t) / (nx * ny)), 4) AS pmi
        |FROM pairs JOIN tx USING (x) JOIN ty USING (y), tot
        |WHERE n >= 30 ORDER BY pmi DESC, x, y LIMIT 25""".stripMargin) { (s, d) =>
      val toks = Tables(s, d).documents.select(col("doc_id"),
        expr("filter(split(text, ' '), x -> length(x) >= 2)").as("w"))
      val tok = toks.select(col("doc_id"),
          posexplode(col("w")).as(Seq("i0", "t")))
        .select(col("doc_id"), (col("i0") + 1).cast("long").as("i"), col("t"))
      val pairs = tok.as("a")
        .join(tok.as("b"), col("a.doc_id") === col("b.doc_id")
          && col("b.i") > col("a.i") && col("b.i") <= col("a.i") + 2)
        .groupBy(col("a.t").as("x"), col("b.t").as("y"))
        .agg(count(lit(1)).cast("double").as("n"))
      val tx = pairs.groupBy("x").agg(sum(col("n")).as("nx"))
      val ty = pairs.groupBy("y").agg(sum(col("n")).as("ny"))
      val tot = pairs.agg(sum(col("n")).as("t"))
      // tx/ty are vocabulary-sized marginals (Heaps' law — they grow with
      // the corpus): no forced broadcast; the x/y keys hash-distribute and
      // AQE still broadcasts while the vocab is actually small.
      pairs.join(tx, "x").join(ty, "y")
        .crossJoin(broadcast(tot))
        .filter(col("n") >= 30)
        .select(col("x"), col("y"), col("n").cast("long").as("n"),
          round(log((col("n") * col("t")) / (col("nx") * col("ny"))), 4).as("pmi"))
        .orderBy(col("pmi").desc, col("x"), col("y"))
        .limit(25)
    },

    // Mutual information through Spark's SQL parser, same shared text.
    QDef("x_sql_mutual_info", R9Ops.MutualInfoSql) { (s, d) =>
      SqlSurface.viewed(s, d, "events")
      s.sql(R9Ops.MutualInfoSql)
    },

    // Clickstream path mining: gap-sessionize (6 h), then the 15 most
    // common event-type TRIGRAMS within sessions — the navigation-path
    // read product analytics runs. All three windows (gap flag, running
    // session id, the two leads) share the user-keyed partitioning; the
    // path aggregate is trigram-cardinality; top-k is a bounded heap.
    QDef("x_path_trigrams",
      """WITH s AS (
        |  SELECT user_id, ts, event_id, event_type,
        |    CASE WHEN epoch_us(ts) - epoch_us(lag(ts) OVER w) > 21600000000
        |      OR lag(ts) OVER w IS NULL THEN 1 ELSE 0 END AS brk
        |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |sess AS (
        |  SELECT user_id, ts, event_id, event_type,
        |    sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        |  FROM s),
        |tri AS (
        |  SELECT event_type || '>' || lead(event_type, 1) OVER w2 || '>'
        |    || lead(event_type, 2) OVER w2 AS path
        |  FROM sess WINDOW w2 AS (PARTITION BY user_id, sid ORDER BY ts, event_id))
        |SELECT path, CAST(count(*) AS BIGINT) AS n FROM tri
        |WHERE path IS NOT NULL
        |GROUP BY 1 ORDER BY n DESC, path LIMIT 15""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val byUser = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      val micros = graft.functions.TimeCols.eventMicros(col("ts"))
      val brk = when(
        (micros - lag(micros, 1).over(byUser)) > 21600000000L
          || lag(micros, 1).over(byUser).isNull, 1).otherwise(0)
      val sess = Tables(s, d).events
        .select(col("user_id"), col("ts"), col("event_id"), col("event_type"),
          brk.as("brk"))
        .withColumn("sid", sum(col("brk"))
          .over(byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      val bySess = Window.partitionBy("user_id", "sid")
        .orderBy(col("ts"), col("event_id"))
      sess
        .select(concat(col("event_type"), lit(">"),
          lead(col("event_type"), 1).over(bySess), lit(">"),
          lead(col("event_type"), 2).over(bySess)).as("path"))
        .filter(col("path").isNotNull)
        .groupBy("path").agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("path"))
        .limit(15)
    },

    // Sparse TF-IDF cosine similarity via posting-list join — the sparse
    // complement of the dense-embedding cosine ops: documents as weighted
    // shingle vectors, pair dot products accumulated TERM-KEYED (each
    // shingle contributes |docs(term)|² pair terms, never an all-pairs
    // join), with the classic inverted-index pruning: shingles in > 2% of
    // docs are dropped (their idf ≈ 0 contributes noise at quadratic
    // cost — the hot-gram cap as a relevance statement).
    QDef("x_sparse_cosine",
      """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        |sh AS (
        |  SELECT doc_id, w[CAST(i AS INT)] || ' ' || w[CAST(i AS INT)+1]
        |    || ' ' || w[CAST(i AS INT)+2] AS term,
        |    CAST(count(*) AS DOUBLE) AS tf
        |  FROM toks, unnest(range(1, len(w)-1)) t(i)
        |  GROUP BY 1, 2),
        |nd AS (SELECT CAST(count(DISTINCT doc_id) AS DOUBLE) AS n FROM sh),
        |dfc AS (SELECT term, CAST(count(*) AS DOUBLE) AS df FROM sh GROUP BY 1),
        |idf AS (SELECT term, ln(n / df) AS idf FROM dfc, nd WHERE df <= n * 0.02),
        |wt AS (SELECT sh.doc_id, sh.term, sh.tf * idf.idf AS w
        |       FROM sh JOIN idf USING (term)),
        |nrm AS (SELECT doc_id, sqrt(sum(w * w)) AS nn FROM wt GROUP BY 1),
        |dots AS (
        |  SELECT a.doc_id AS d1, b.doc_id AS d2, sum(a.w * b.w) AS dot
        |  FROM wt a JOIN wt b ON a.term = b.term AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2)
        |SELECT d1, d2, round(dot / (n1.nn * n2.nn), 6) AS cos
        |FROM dots JOIN nrm n1 ON n1.doc_id = d1 JOIN nrm n2 ON n2.doc_id = d2
        |WHERE round(dot / (n1.nn * n2.nn), 6) >= 0.3""".stripMargin) { (s, d) =>
      val toks = Tables(s, d).documents
        .select(col("doc_id"), split(col("text"), " ").as("w"))
      val sh = toks.select(col("doc_id"), explode(expr(
          """transform(sequence(1, size(w) - 2), i ->
            |  concat_ws(' ', w[i-1], w[i], w[i+1]))""".stripMargin)).as("term"))
        .groupBy("doc_id", "term").agg(count(lit(1)).cast("double").as("tf"))
      val nd = sh.agg(countDistinct(col("doc_id")).cast("double").as("n"))
      val idf = sh.groupBy("term").agg(count(lit(1)).cast("double").as("df"))
        .crossJoin(broadcast(nd))
        .filter(col("df") <= col("n") * 0.02)
        .select(col("term"), log(col("n") / col("df")).as("idf"))
      val wt = sh.join(idf, "term")
        .select(col("doc_id"), col("term"), (col("tf") * col("idf")).as("w"))
        // pinned for both sides of the term self-join (the Dedup.pin
        // lifecycle: lazy checkpoint, blocks GC-reclaimed)
        .localCheckpoint(false)
      val nrm = wt.groupBy("doc_id").agg(sqrt(sum(col("w") * col("w"))).as("nn"))
      val dots = wt.select(col("term"), col("doc_id").as("d1"), col("w").as("w1"))
        .join(wt.select(col("term"), col("doc_id").as("d2"), col("w").as("w2")),
          Seq("term"))
        .filter(col("d1") < col("d2"))
        .groupBy("d1", "d2").agg(sum(col("w1") * col("w2")).as("dot"))
      dots
        .join(nrm.select(col("doc_id").as("d1"), col("nn").as("nn1")), "d1")
        .join(nrm.select(col("doc_id").as("d2"), col("nn").as("nn2")), "d2")
        .select(col("d1"), col("d2"),
          round(col("dot") / (col("nn1") * col("nn2")), 6).as("cos"))
        .filter(col("cos") >= 0.3)
    },

    // Poisson bootstrap confidence interval for the mean order value —
    // THE distributed bootstrap: instead of resampling rows (impossible
    // without global coordination), each row takes a Poisson(1) weight
    // per replicate from a deterministic integer hash, so B=100 resample
    // means come out of ONE corpus pass (the replicate explode is
    // map-side, aggregates are B-sized). CI = percentiles of the
    // replicate means.
    QDef("x_bootstrap_ci",
      """WITH k AS (
        |  SELECT b, o_totalprice,
        |    CASE WHEN h < 367879 THEN 0 WHEN h < 735759 THEN 1
        |      WHEN h < 919699 THEN 2 WHEN h < 980985 THEN 3 ELSE 4 END AS wt
        |  FROM (SELECT b, o_totalprice,
        |          (o_orderkey * 2654435761 + b * 40503) % 1000000 AS h
        |        FROM orders, unnest(range(0, 100)) t(b)) z),
        |m AS (SELECT b, sum(wt * o_totalprice) / sum(wt) AS mean_b
        |      FROM k GROUP BY 1)
        |SELECT round(quantile_cont(mean_b, 0.025), 4) AS lo,
        |  round(quantile_cont(mean_b, 0.5), 4) AS mid,
        |  round(quantile_cont(mean_b, 0.975), 4) AS hi
        |FROM m""".stripMargin) { (s, d) =>
      val k = Tables(s, d).orders
        .select(col("o_orderkey"), col("o_totalprice"),
          explode(expr("sequence(0, 99)")).as("b"))
        .withColumn("h",
          (col("o_orderkey") * 2654435761L + col("b") * 40503L) % 1000000L)
        .withColumn("wt",
          when(col("h") < 367879, 0).when(col("h") < 735759, 1)
            .when(col("h") < 919699, 2).when(col("h") < 980985, 3).otherwise(4))
      k.groupBy("b")
        .agg((sum(col("wt") * col("o_totalprice")) / sum(col("wt"))).as("mean_b"))
        .agg(round(expr("percentile(mean_b, 0.025D)"), 4).as("lo"),
          round(expr("percentile(mean_b, 0.5D)"), 4).as("mid"),
          round(expr("percentile(mean_b, 0.975D)"), 4).as("hi"))
    },

    // Market-basket association rules over orders: items = the DISTINCT
    // part brands in each order, rules = brand pairs with support ≥ 40
    // scored by confidence and lift. The scale shape: after the distinct,
    // ONE groupBy collapses each basket to its sorted item array and the
    // pair expansion happens IN-ROW (bounded by basket size squared — no
    // basket self-join shuffling the corpus twice); the item-frequency and
    // order-count frames are item-/1-row-sized broadcasts. At 100 TB the
    // only corpus exchanges are the basket collapse and the pair aggregate,
    // both map-side-combined; a hot item inflates no bucket because pairs
    // are keyed by (item_a, item_b), not by item.
    QDef("x_basket_pairs", R9Ops.BasketSql) { (s, d) =>
      val t = Tables(s, d)
      val items = t.lineitem
        .join(broadcast(t.part), col("l_partkey") === col("p_partkey"))
        .select(col("l_orderkey").as("o"), col("p_brand").as("item"))
        .distinct()
      val n = items.agg(countDistinct(col("o")).cast("double").as("n_orders"))
      val ic = items.groupBy("item").agg(count(lit(1)).cast("double").as("c"))
      val pairs = items
        .groupBy("o").agg(sort_array(collect_set(col("item"))).as("its"))
        .select(explode(expr(
          """flatten(transform(its, (x, i) ->
            |  transform(slice(its, i + 2, size(its)),
            |            y -> struct(x AS item_a, y AS item_b))))""".stripMargin))
          .as("p"))
        .select(col("p.item_a"), col("p.item_b"))
        .groupBy("item_a", "item_b").agg(count(lit(1)).as("supp"))
        .filter(col("supp") >= 40)
      pairs
        .join(broadcast(ic.select(col("item").as("item_a"), col("c").as("ca"))), "item_a")
        .join(broadcast(ic.select(col("item").as("item_b"), col("c").as("cb"))), "item_b")
        .crossJoin(broadcast(n))
        .select(col("item_a"), col("item_b"),
          col("supp").cast("long").as("support"),
          round(col("supp") / col("ca"), 6).as("confidence"),
          round((col("supp") / col("ca")) / (col("cb") / col("n_orders")), 6)
            .as("lift"))
    },

    // First-order Markov transitions over each user's event sequence:
    // lead() within (user_id ORDER BY ts, event_id) pairs every event with
    // its successor, then transition counts and per-source probabilities.
    // ONE corpus shuffle (the user-keyed window); the row-probability
    // normalizer is a 5-row broadcast. The event_id tie-break makes
    // same-timestamp ordering engine-identical.
    QDef("x_seq_transitions", R9Ops.TransitionsSql) { (s, d) =>
      val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      val seq = Tables(s, d).events
        .select(col("user_id"), col("event_type"),
          lead(col("event_type"), 1).over(w).as("nxt"))
      val trans = seq.filter(col("nxt").isNotNull)
        .groupBy(col("event_type").as("src"), col("nxt").as("dst"))
        .agg(count(lit(1)).as("c"))
      val tot = trans.groupBy("src").agg(sum(col("c")).cast("double").as("n"))
      trans.join(broadcast(tot), "src")
        .select(col("src"), col("dst"), col("c").cast("long").as("transitions"),
          round(col("c") / col("n"), 6).as("p"))
    },

    // Cohort retention matrix: cohort = each user's first active day,
    // cell (cohort, day_offset) = the share of the cohort active that many
    // days later. Two corpus aggregates (per-user first day; distinct
    // (cohort, offset, user) activity) — the first-day frame is user-sized
    // and joins back user-keyed (same partitioning, no extra exchange at
    // scale), cohort sizes are a date-cardinality broadcast.
    QDef("x_retention_cohorts",
      """WITH w AS (
        |  SELECT user_id, CAST(date_trunc('day', ts) AS DATE) AS d FROM events),
        |fst AS (SELECT user_id, min(d) AS cohort FROM w GROUP BY 1),
        |act AS (
        |  SELECT DISTINCT f.cohort,
        |    CAST(date_diff('day', f.cohort, w.d) AS INT) AS day_offset,
        |    w.user_id
        |  FROM w JOIN fst f ON f.user_id = w.user_id),
        |sz AS (SELECT cohort, CAST(count(*) AS DOUBLE) AS n0 FROM fst GROUP BY 1)
        |SELECT act.cohort, day_offset, CAST(count(*) AS BIGINT) AS n_active,
        |  round(count(*) / s.n0, 6) AS retention
        |FROM act JOIN sz s ON s.cohort = act.cohort
        |GROUP BY 1, 2, s.n0""".stripMargin) { (s, d) =>
      val w = Tables(s, d).events
        .select(col("user_id"), to_date(date_trunc("day", col("ts"))).as("d"))
      val fst = w.groupBy("user_id").agg(min(col("d")).as("cohort"))
      val act = w.join(fst, "user_id")
        .select(col("cohort"), datediff(col("d"), col("cohort")).as("day_offset"),
          col("user_id"))
        .distinct()
      val sz = fst.groupBy("cohort").agg(count(lit(1)).cast("double").as("n0"))
      act.groupBy("cohort", "day_offset").agg(count(lit(1)).as("n_active"))
        .join(broadcast(sz), "cohort")
        .select(col("cohort"), col("day_offset"),
          col("n_active").cast("long").as("n_active"),
          round(col("n_active") / col("n0"), 6).as("retention"))
    },

    // 2-D skyline of the part table: cheapest-for-the-size Pareto frontier
    // (minimize p_retailprice, maximize p_size). The oracle is the
    // textbook quadratic NOT-EXISTS; the engine runs the exact
    // distribute-then-merge staircase ([[graft.ops.Skyline]]): local
    // skylines over hash buckets in parallel windows, global pass over the
    // small survivor union, semi-join back — O(N log N), no self-join.
    QDef("x_skyline",
      """SELECT a.p_partkey, a.p_retailprice, a.p_size FROM part a
        |WHERE NOT EXISTS (
        |  SELECT 1 FROM part b
        |  WHERE b.p_retailprice <= a.p_retailprice AND b.p_size >= a.p_size
        |    AND (b.p_retailprice < a.p_retailprice OR b.p_size > a.p_size))""".stripMargin) {
      (s, d) =>
        Skyline.skyline2d(Tables(s, d).part, "p_retailprice", "p_size")
          .select("p_partkey", "p_retailprice", "p_size")
    },

    // Pairwise Pearson correlation matrix over the four lineitem measures,
    // in ONE corpus pass: a single aggregate computes all six co-moment
    // pairs (map-side combined), then stack() pivots the 1-row frame to
    // (col_a, col_b, r) rows driver-free. 4dp rounding absorbs partial-sum
    // order across engines.
    QDef("x_corr_matrix",
      """SELECT 'l_quantity' AS col_a, 'l_extendedprice' AS col_b,
        |  round(corr(l_quantity, l_extendedprice), 4) AS r FROM lineitem
        |UNION ALL SELECT 'l_quantity', 'l_discount',
        |  round(corr(l_quantity, l_discount), 4) FROM lineitem
        |UNION ALL SELECT 'l_quantity', 'l_tax',
        |  round(corr(l_quantity, l_tax), 4) FROM lineitem
        |UNION ALL SELECT 'l_extendedprice', 'l_discount',
        |  round(corr(l_extendedprice, l_discount), 4) FROM lineitem
        |UNION ALL SELECT 'l_extendedprice', 'l_tax',
        |  round(corr(l_extendedprice, l_tax), 4) FROM lineitem
        |UNION ALL SELECT 'l_discount', 'l_tax',
        |  round(corr(l_discount, l_tax), 4) FROM lineitem""".stripMargin) { (s, d) =>
      val pairsOf = Seq(
        ("l_quantity", "l_extendedprice"), ("l_quantity", "l_discount"),
        ("l_quantity", "l_tax"), ("l_extendedprice", "l_discount"),
        ("l_extendedprice", "l_tax"), ("l_discount", "l_tax"))
      val agg = Tables(s, d).lineitem.agg(
        pairsOf.head match { case (a, b) => round(corr(col(a), col(b)), 4).as(s"r0") },
        pairsOf.tail.zipWithIndex.map { case ((a, b), i) =>
          round(corr(col(a), col(b)), 4).as(s"r${i + 1}")
        }: _*)
      val stackArgs = pairsOf.zipWithIndex
        .map { case ((a, b), i) => s"'$a', '$b', r$i" }.mkString(", ")
      agg.select(expr(s"stack(6, $stackArgs) AS (col_a, col_b, r)"))
    },

    // Welch's two-sample t-test per event type: arms = a deterministic
    // user split (user_id parity — in production the experiment
    // assignment), statistic from per-arm (n, mean, var) ONLY. The corpus
    // does ONE grouped aggregate; the t/df algebra runs on the 10-row
    // stats frame — the A/B analysis shape where no row-level data ever
    // leaves the executors twice.
    QDef("x_ab_ttest",
      """WITH e AS (SELECT event_type, user_id % 2 AS arm, value FROM events),
        |st AS (SELECT event_type, arm, CAST(count(*) AS DOUBLE) AS n,
        |         avg(value) AS m, var_samp(value) AS v
        |       FROM e GROUP BY 1, 2)
        |SELECT a.event_type, CAST(a.n AS BIGINT) AS n_a, CAST(b.n AS BIGINT) AS n_b,
        |  round(a.m, 4) AS mean_a, round(b.m, 4) AS mean_b,
        |  round((a.m - b.m) / sqrt(a.v / a.n + b.v / b.n), 4) AS t_stat,
        |  round(pow(a.v / a.n + b.v / b.n, 2) /
        |        (pow(a.v / a.n, 2) / (a.n - 1) + pow(b.v / b.n, 2) / (b.n - 1)), 2)
        |    AS df
        |FROM st a JOIN st b
        |  ON a.event_type = b.event_type AND a.arm = 0 AND b.arm = 1""".stripMargin) {
      (s, d) =>
        val st = Tables(s, d).events
          .groupBy(col("event_type"), pmod(col("user_id"), lit(2)).as("arm"))
          .agg(count(lit(1)).cast("double").as("n"), avg(col("value")).as("m"),
            var_samp(col("value")).as("v"))
        val a = st.filter(col("arm") === 0)
          .select(col("event_type"), col("n").as("na"), col("m").as("ma"), col("v").as("va"))
        val b = st.filter(col("arm") === 1)
          .select(col("event_type"), col("n").as("nb"), col("m").as("mb"), col("v").as("vb"))
        val se2 = col("va") / col("na") + col("vb") / col("nb")
        a.join(b, "event_type").select(col("event_type"),
          col("na").cast("long").as("n_a"), col("nb").cast("long").as("n_b"),
          round(col("ma"), 4).as("mean_a"), round(col("mb"), 4).as("mean_b"),
          round((col("ma") - col("mb")) / sqrt(se2), 4).as("t_stat"),
          round(pow(se2, 2) / (pow(col("va") / col("na"), 2) / (col("na") - 1)
            + pow(col("vb") / col("nb"), 2) / (col("nb") - 1)), 2).as("df"))
    },

    // k-core decomposition (k=5) of the brand co-occurrence graph —
    // iterative peeling surfaced as a first-class graph operator
    // ([[graft.graph.GraphMetrics.kCore]]): per round one alive-filter of
    // the edge list + one vertex-keyed degree aggregate, frames shrinking
    // monotonically. Edges use RELATIVE support (≥ 2.5% of orders), so the
    // same query text is meaningful at every scale factor.
    QDef("x_graph_kcore", R9Ops.KCoreSql) { (s, d) =>
      val t = Tables(s, d)
      val items = t.lineitem
        .join(broadcast(t.part), col("l_partkey") === col("p_partkey"))
        .select(col("l_orderkey").as("o"), col("p_brand").as("item"))
        .distinct()
      val n = items.agg(countDistinct(col("o")).cast("double").as("n_orders"))
      val edges = items.as("a")
        .join(items.as("b"), col("a.o") === col("b.o") && col("a.item") < col("b.item"))
        .groupBy(col("a.item").as("src"), col("b.item").as("dst"))
        .agg(count(lit(1)).as("supp"))
        .crossJoin(broadcast(n))
        .filter(col("supp") / col("n_orders") >= 0.025)
        .select("src", "dst")
      graft.graph.GraphMetrics.kCore(edges, k = 5, rounds = 4)
    },

    // Incremental equi-join maintenance: (A ∪ ΔA) ⋈ (B ∪ ΔB) computed as
    // the FOUR delta terms — base⋈base, base⋈ΔB, ΔA⋈base, ΔA⋈Δb — each
    // aggregated partially, then combined by a final group-sum. The shape
    // incremental view maintenance runs every refresh: at 100 TB the three
    // delta terms touch only new date partitions (partition-pruned scans)
    // and the base⋈base term is the already-materialized view, so a
    // refresh costs O(Δ), not O(corpus). The oracle recomputes the full
    // join flat — same result by distributivity of ⋈ over ∪.
    QDef("x_incremental_join",
      """SELECT o_orderpriority, round(sum(l_quantity), 2) AS sum_qty,
        |  CAST(count(*) AS BIGINT) AS n
        |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        |GROUP BY 1""".stripMargin) { (s, d) =>
      val t = Tables(s, d)
      val pivot = lit("1998-01-01").cast("timestamp")
      val (oBase, oDelta) = (t.orders.filter(col("o_orderdate") < pivot),
        t.orders.filter(col("o_orderdate") >= pivot))
      val (lBase, lDelta) = (t.lineitem.filter(col("l_shipdate") < pivot),
        t.lineitem.filter(col("l_shipdate") >= pivot))
      def term(o: org.apache.spark.sql.DataFrame, l: org.apache.spark.sql.DataFrame) =
        o.join(l, col("o_orderkey") === col("l_orderkey"))
          .groupBy("o_orderpriority")
          .agg(sum(col("l_quantity")).as("sq"), count(lit(1)).as("c"))
      term(oBase, lBase).union(term(oBase, lDelta))
        .union(term(oDelta, lBase)).union(term(oDelta, lDelta))
        .groupBy("o_orderpriority")
        .agg(round(sum(col("sq")), 2).as("sum_qty"),
          sum(col("c")).cast("long").as("n"))
    },

    // Inverted-index build: term → document frequency + the head of the
    // sorted postings list. The head uses the bounded-heap TopKByScore
    // aggregate (score = −doc_id ⇒ the 8 SMALLEST ids), so a stopword's
    // postings never materialize beyond 8 entries per partition — the
    // hot-term state bound a corpus-scale index build needs; df rides the
    // same aggregate pass.
    QDef("x_text_postings",
      """WITH w AS (
        |  SELECT DISTINCT doc_id, term FROM (
        |    SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents)
        |  WHERE len(term) >= 2),
        |p AS (
        |  SELECT term, CAST(count(*) AS BIGINT) AS df,
        |    array_to_string(list_sort(list(doc_id))[1:8], ' ') AS postings_head
        |  FROM w GROUP BY 1)
        |SELECT term, df, postings_head FROM p WHERE df >= 50""".stripMargin) { (s, d) =>
      val w = Tables(s, d).documents
        .select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
        .filter(length(col("term")) >= 2)
        .distinct()
      w.groupBy("term")
        .agg(count(lit(1)).as("df"),
          graft.functions.TopKByScore.topKByScore(
            -col("doc_id").cast("double"), col("doc_id"), 8).as("top"))
        .filter(col("df") >= 50)
        .select(col("term"), col("df").cast("long").as("df"),
          concat_ws(" ", expr("transform(top, x -> cast(x.id AS string))"))
            .as("postings_head"))
    },

    // STREAMING exponential smoothing, batch twin: the SAME
    // EventStreams.ewmaStream body (buffered-maturity keyed state, FIR
    // arithmetic replayed term-for-term) matures everything in one
    // invocation under batch — sharing x_ewma's oracle text verbatim.
    // MemoryStream parity incl. cross-batch tail carry in EventStreamsSpec.
    // Grid-bucketed radius-bounded nearest neighbor — the spatial-join
    // shape: deterministic integer coordinates per customer, cell width =
    // the search radius R, candidates generated cell-keyed. Euclid ≤ R
    // implies L∞ ≤ R, so the 3×3 neighbor-cell candidate set is EXACT for
    // radius-bounded NN; the winner is a lexicographic min-struct
    // aggregate (bounded state), not a window.
    //
    // CO-LOCATION SHORT-CIRCUIT (round-11 fix — the full sf1 sweep
    // measured the naive all-points probe at ×117, this round's
    // imageNearDups-class catch): integer coordinates mean co-located
    // points are EXACT ties at d2 = 0, so every point that is not its
    // position's min id has its answer in one grouped aggregate —
    // nn = (0, position min id), no join at all. Only the ONE min-id
    // representative per occupied position runs the grid search (against
    // all points, so co-located (0, second-min) candidates are still
    // seen). The probe side is bounded by the coordinate DOMAIN (≤ 97×89
    // positions here), not the corpus, so candidate volume is
    // O(positions × 9 × density) = O(corpus) — linear at ANY density,
    // where the all-points probe was O(corpus × density) = quadratic on
    // a bounded domain. Measured at the ×10 sf1h scale-up: 134 s (naive
    // probe, ×117 vs sf0.1) → 6.2 s (×2.7) — BENCH_NOTES round 11.
    // x_grid_density is the one-pass canary that reads the density
    // regime (and the naive join's candidate bill) before committing.
    QDef("x_grid_knn", GridKnnSql) { (s, d) =>
      gridShortCircuit(gridPoints(Tables(s, d)))
    },

    // Kaplan-Meier survival: time from each user's first signup to first
    // purchase, right-censored at the observation horizon. Corpus work =
    // three grouped aggregates (first signup, first purchase, horizon);
    // the at-risk counts and the survival product run on the
    // duration-cardinality frame (bounded by the horizon in hours), with
    // the product computed as exp∘cumsum∘ln over the ordered event times
    // in BOTH engines so the float path is identical.
    QDef("x_survival_km",
      """WITH s AS (SELECT user_id, min(ts) AS t0 FROM events
        |  WHERE event_type = 'signup' GROUP BY 1),
        |p AS (SELECT user_id, min(ts) AS t1 FROM events
        |  WHERE event_type = 'purchase' GROUP BY 1),
        |obs AS (SELECT max(ts) AS tmax FROM events),
        |su AS (
        |  SELECT s.user_id,
        |    CASE WHEN p.t1 IS NOT NULL AND p.t1 >= s.t0
        |      THEN CAST(date_diff('hour', s.t0, p.t1) AS BIGINT)
        |      ELSE CAST(date_diff('hour', s.t0, obs.tmax) AS BIGINT) END AS dur,
        |    CASE WHEN p.t1 IS NOT NULL AND p.t1 >= s.t0 THEN 1 ELSE 0 END AS ev
        |  FROM s LEFT JOIN p ON p.user_id = s.user_id, obs),
        |d AS (SELECT dur AS t, CAST(sum(ev) AS DOUBLE) AS d,
        |      CAST(count(*) AS DOUBLE) AS c FROM su GROUP BY 1),
        |r AS (SELECT t, d,
        |  sum(c) OVER (ORDER BY t ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
        |    AS n FROM d),
        |km AS (SELECT t, d, n,
        |  round(exp(sum(ln(1 - d / n))
        |    OVER (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)), 6)
        |    AS surv
        |  FROM r WHERE d > 0)
        |SELECT t AS hours, CAST(d AS BIGINT) AS events,
        |  CAST(n AS BIGINT) AS at_risk, surv AS survival FROM km""".stripMargin) {
      (s, d) =>
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
          .select(
            // Column `-` keeps LongType here, but cast anyway so the
            // output dtype pins BIGINT like the oracle's date_diff
            when(converted, hourOf(col("t1")) - hourOf(col("t0")))
              .otherwise(hourOf(col("tmax")) - hourOf(col("t0")))
              .cast("long").as("dur"),
            when(converted, 1).otherwise(0).as("ev"))
        val byDur = su.groupBy(col("dur").as("t"))
          .agg(sum(col("ev")).cast("double").as("d"),
            count(lit(1)).cast("double").as("c"))
        // duration-cardinality frame: the global windows order ≤ horizon
        // hours rows (the x_budget_select histogram carve-out), never corpus
        val atRisk = Window.orderBy("t")
          .rowsBetween(Window.currentRow, Window.unboundedFollowing)
        val prefix = Window.orderBy("t")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        byDur
          .withColumn("n", sum(col("c")).over(atRisk))
          .filter(col("d") > 0)
          .withColumn("surv",
            round(exp(sum(log(lit(1.0) - col("d") / col("n"))).over(prefix)), 6))
          .select(col("t").as("hours"), col("d").cast("long").as("events"),
            col("n").cast("long").as("at_risk"), col("surv").as("survival"))
    },

    // Customer-value deciles: per-customer spend cut into ntile(10) with a
    // total (spend DESC, custkey) tie order. The engine never runs a
    // global one-partition ntile: ranks come from [[graft.ops.BinnedRank]]
    // (spend-domain bins, negated for the DESC order), and the tile falls
    // out of ntile's closed form — with n rows, b = n mod 10 leading tiles
    // of size s+1 = ⌊n/10⌋+1, so tile(r) = ⌈r/(s+1)⌉ for r ≤ b(s+1), else
    // b + ⌈(r − b(s+1))/s⌉ — pure arithmetic on (r, n), map-side. The
    // exact window form lives only in the oracle SQL.
    QDef("x_ntile_deciles",
      """WITH spend AS (
        |  SELECT o_custkey, round(sum(o_totalprice), 2) AS spend
        |  FROM orders GROUP BY 1),
        |d AS (SELECT o_custkey, spend,
        |  CAST(ntile(10) OVER (ORDER BY spend DESC, o_custkey) AS INT) AS decile
        |  FROM spend)
        |SELECT decile, CAST(count(*) AS BIGINT) AS n,
        |  round(sum(spend), 2) AS total_spend,
        |  round(min(spend), 2) AS min_spend, round(max(spend), 2) AS max_spend
        |FROM d GROUP BY 1""".stripMargin) { (s, d) =>
      val spend = Tables(s, d).orders.groupBy("o_custkey")
        .agg(round(sum(col("o_totalprice")), 2).as("spend"))
      val ranked = graft.ops.BinnedRank.belowAndN(spend, Seq.empty,
          (-floor(col("spend") / lit(5000))).cast("bigint"),
          Seq(col("spend").desc, col("o_custkey")), lit(1L))
        .withColumn("r", col("below") + lit(1L))
      // ntile(10) closed form; doubles are exact here (counts ≪ 2^53)
      val sSize = floor(col("n") / lit(10.0))
      val b = col("n") - sSize * lit(10.0)
      val cutoff = b * (sSize + lit(1.0))
      val decile = when(col("r") <= cutoff,
          floor((col("r") - lit(1.0)) / (sSize + lit(1.0))) + lit(1.0))
        .otherwise(lit(1.0) + b
          + floor((col("r") - cutoff - lit(1.0)) / greatest(sSize, lit(1.0))))
        .cast("int")
      ranked.withColumn("decile", decile)
        .groupBy("decile")
        .agg(count(lit(1)).as("n"), round(sum(col("spend")), 2).as("total_spend"),
          round(min(col("spend")), 2).as("min_spend"),
          round(max(col("spend")), 2).as("max_spend"))
    },

    // The association rules through Spark's SQL parser — ONE portable text
    // shared verbatim with the DuckDB oracle (the CcSql twin contract).
    QDef("x_sql_basket", R9Ops.BasketSql) { (s, d) =>
      SqlSurface.viewed(s, d, "lineitem", "part")
      s.sql(R9Ops.BasketSql)
    },

    // Markov transitions through Spark's SQL parser, same shared text.
    QDef("x_sql_transitions", R9Ops.TransitionsSql) { (s, d) =>
      SqlSurface.viewed(s, d, "events")
      s.sql(R9Ops.TransitionsSql)
    },

    // Day-of-week seasonal decomposition: the weekly baseline is a 7-row
    // broadcast (per-dow mean), residual = value − baseline, then per-day
    // residual means — the deseasonalization step before any trend or
    // anomaly read. Two corpus aggregates, zero corpus-sized joins.
    // (DuckDB dayofweek is Sunday=0; Spark's is Sunday=1 — normalized.)
    QDef("x_seasonal_dow",
      """WITH e AS (SELECT dayofweek(ts) AS dow,
        |  CAST(date_trunc('day', ts) AS DATE) AS d, value FROM events),
        |base AS (SELECT dow, avg(value) AS dow_mean FROM e GROUP BY 1),
        |resid AS (SELECT e.d, e.value - b.dow_mean AS r
        |          FROM e JOIN base b ON b.dow = e.dow)
        |SELECT d, CAST(count(*) AS BIGINT) AS n, round(avg(r), 4) AS mean_resid
        |FROM resid GROUP BY 1""".stripMargin) { (s, d) =>
      val e = Tables(s, d).events.select(
        (dayofweek(col("ts")) - 1).as("dow"),
        to_date(date_trunc("day", col("ts"))).as("d"), col("value"))
      val base = e.groupBy("dow").agg(avg(col("value")).as("dow_mean"))
      e.join(broadcast(base), "dow")
        .select(col("d"), (col("value") - col("dow_mean")).as("r"))
        .groupBy("d")
        .agg(count(lit(1)).as("n"), round(avg(col("r")), 4).as("mean_resid"))
    },

    // Time-weighted average (TWAP): each observation weighted by its
    // holding time (µs until the user's next event; the open last span is
    // dropped) — the correct mean for irregularly-sampled series, where a
    // plain avg() overweights bursts. One user-keyed window shuffle, then
    // a per-user aggregate on the same partitioning.
    QDef("x_time_weighted",
      """WITH s AS (
        |  SELECT user_id, value,
        |    epoch_us(lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id))
        |      - epoch_us(ts) AS w_us
        |  FROM events)
        |SELECT user_id, round(sum(value * w_us) / sum(w_us), 6) AS twap,
        |  CAST(count(*) AS BIGINT) AS n_spans
        |FROM s WHERE w_us IS NOT NULL GROUP BY 1""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      val micros = graft.functions.TimeCols.eventMicros(col("ts"))
      Tables(s, d).events
        .select(col("user_id"), col("value"),
          (lead(micros, 1).over(w) - micros).as("w_us"))
        .filter(col("w_us").isNotNull)
        .groupBy("user_id")
        .agg(round(sum(col("value") * col("w_us")) / sum(col("w_us")), 6).as("twap"),
          count(lit(1)).as("n_spans"))
    },

    // Link prediction by neighbor-set Jaccard: common neighbors via the
    // 2-hop self-join (bounded by degree, the triangle-count shape),
    // degrees broadcast back. The graph-mining complement of the text
    // n-gram Jaccard — same similarity, adjacency-set universe.
    QDef("x_graph_jaccard",
      """WITH e0 AS (
        |  SELECT DISTINCT c.c_nationkey AS u, s.s_nationkey AS v
        |  FROM lineitem l
        |  JOIN orders o ON l.l_orderkey = o.o_orderkey
        |  JOIN customer c ON o.o_custkey = c.c_custkey
        |  JOIN supplier s ON l.l_suppkey = s.s_suppkey),
        |e AS (SELECT u, v FROM (
        |  SELECT u, v FROM e0 UNION SELECT v, u FROM e0) t WHERE u <> v),
        |deg AS (SELECT u, CAST(count(*) AS DOUBLE) AS deg FROM e GROUP BY 1),
        |cn AS (
        |  SELECT a.u AS x, b.u AS y, CAST(count(*) AS DOUBLE) AS common
        |  FROM e a JOIN e b ON a.v = b.v AND a.u < b.u
        |  GROUP BY 1, 2)
        |SELECT x, y, CAST(common AS BIGINT) AS common_neighbors,
        |  round(common / (dx.deg + dy.deg - common), 6) AS jaccard
        |FROM cn JOIN deg dx ON dx.u = cn.x JOIN deg dy ON dy.u = cn.y
        |WHERE round(common / (dx.deg + dy.deg - common), 6) >= 0.5""".stripMargin) {
      (s, d) =>
        val t = Tables(s, d)
        val e0 = t.lineitem
          .join(t.orders, col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(t.customer), col("o_custkey") === col("c_custkey"))
          .join(broadcast(t.supplier), col("l_suppkey") === col("s_suppkey"))
          .select(col("c_nationkey").as("u"), col("s_nationkey").as("v"))
          .distinct()
        val e = e0.union(e0.select(col("v").as("u"), col("u").as("v")))
          .distinct().filter(col("u") =!= col("v"))
        val deg = e.groupBy("u").agg(count(lit(1)).cast("double").as("deg"))
        val cn = e.as("a")
          .join(e.as("b"), col("a.v") === col("b.v") && col("a.u") < col("b.u"))
          .groupBy(col("a.u").as("x"), col("b.u").as("y"))
          .agg(count(lit(1)).cast("double").as("common"))
        val jac = round(col("common") / (col("dx") + col("dy") - col("common")), 6)
        cn.join(broadcast(deg.select(col("u").as("x"), col("deg").as("dx"))), "x")
          .join(broadcast(deg.select(col("u").as("y"), col("deg").as("dy"))), "y")
          .select(col("x"), col("y"), col("common").cast("long").as("common_neighbors"),
            jac.as("jaccard"))
          .filter(col("jaccard") >= 0.5)
    },

    // Equi-width 2-D histogram (quantity × discount grid with per-cell
    // revenue) — the heatmap aggregate. Bin edges computed in INTEGER
    // space (discount scaled via round(×100), never floor of a float
    // product — 0.29·100 = 28.999… would mis-bin), one map-side-combined
    // aggregate, grid-cardinality output.
    QDef("x_hist2d",
      """SELECT CAST(l_quantity AS BIGINT) // 10 AS qty_bin,
        |  CAST(round(l_discount * 100) AS BIGINT) // 2 AS disc_bin,
        |  CAST(count(*) AS BIGINT) AS n,
        |  round(sum(l_extendedprice), 2) AS revenue
        |FROM lineitem GROUP BY 1, 2""".stripMargin) { (s, d) =>
      Tables(s, d).lineitem
        .groupBy(
          expr("CAST(l_quantity AS BIGINT) div 10").as("qty_bin"),
          expr("CAST(round(l_discount * 100) AS BIGINT) div 2").as("disc_bin"))
        .agg(count(lit(1)).as("n"), round(sum(col("l_extendedprice")), 2).as("revenue"))
    },

    // STREAMING volume-anomaly monitor, batch twin: tumbling per-type
    // day counts z-scored against the broadcast per-type baseline
    // (EventStreams.anomalyStream — one watermarked stateful aggregate +
    // a stream-static KB join). The oracle replays counts, stats, and the
    // 4dp-rounded z cut in SQL.
    QDef("x_stream_anomaly",
      """WITH c AS (
        |  SELECT CAST(date_trunc('day', ts) AS DATE) AS day, event_type,
        |    CAST(count(*) AS DOUBLE) AS cnt
        |  FROM events GROUP BY 1, 2),
        |st AS (SELECT event_type, avg(cnt) AS mu, stddev_samp(cnt) AS sigma
        |       FROM c GROUP BY 1)
        |SELECT c.day, c.event_type, CAST(cnt AS BIGINT) AS cnt,
        |  round((cnt - mu) / sigma, 4) AS z
        |FROM c JOIN st ON st.event_type = c.event_type
        |WHERE abs(round((cnt - mu) / sigma, 4)) > 1""".stripMargin) { (s, d) =>
      val ev = Tables(s, d).events
      graft.streaming.EventStreams.anomalyStream(ev,
        graft.streaming.EventStreams.anomalyBaseline(ev))
    },

    QDef("x_stream_ewma", R5Ops.EwmaSql) { (s, d) =>
      implicit val sp: org.apache.spark.sql.SparkSession = s
      import sp.implicits._
      graft.streaming.EventStreams.ewmaStream(
        Tables(s, d).events
          .select(col("event_id"), col("ts"), col("user_id"),
            col("event_type"), col("value"))
          .as[graft.streaming.EventRow],
        k = R5Ops.EwK, d = R5Ops.EwD)
        .toDF()
    }
  )
}
