package graft.queries

import graft.{QDef, Tables}
import graft.llm.Sampling
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-44 batch: the gaps-and-islands SQL classic, θ-sketch set
  * intersection on the KMV machinery, and in-database AdaBoost
  * (3 boosted depth-1 stumps) with integer-quantized weights so the
  * per-round argmin is EXACT in both engines.
  *
  * Scale posture: islands are user-partitioned windows over the
  * distinct (user, day) frame (the global calendar index is the ≤366-row
  * carve-out class); the KMV intersection ships 64 rows per segment
  * per partition through the bounded-heap aggregate — never the corpus;
  * AdaBoost is the GLM posture — ONE corpus collapse to the ≤100-cell
  * (quantity × label) histogram, 3 driver rounds on the collected
  * frame. */
object R44Ops {

  /** Gaps-and-islands as ONE portable text — oracle of
    * `x_gaps_islands` and whole query of the `x_sql_gaps` twin. A
    * user's consecutive-active-day runs share the constant
    * i − row_number() key (the classic trick); day index i comes from
    * the observed event calendar (portable where date arithmetic is
    * not). Released: the island-length histogram. */
  private[queries] val GapsSql =
    """WITH ud AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS d
      |  FROM events),
      |cal AS (SELECT d,
      |  CAST(row_number() OVER (ORDER BY d) AS BIGINT) AS i
      |  FROM (SELECT DISTINCT d FROM ud) t),
      |ui AS (SELECT ud.user_id, cal.i FROM ud JOIN cal ON ud.d = cal.d),
      |isl AS (SELECT user_id,
      |  i - CAST(row_number() OVER (PARTITION BY user_id ORDER BY i)
      |    AS BIGINT) AS grp
      |  FROM ui),
      |runs AS (SELECT user_id, grp, CAST(count(*) AS BIGINT) AS len
      |  FROM isl GROUP BY 1, 2)
      |SELECT len AS island_len, CAST(count(*) AS BIGINT) AS n_islands,
      |  CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
      |FROM runs GROUP BY 1""".stripMargin

  /** θ-sketch intersection oracle (DuckDB replays the exact portable
    * hash and the row_number-64 sketch): θ = min of the two 64th
    * minima; every hash < θ is necessarily IN its segment's sketch, so
    * the sketch-intersection below θ is a complete uniform sample of
    * A∩B with inclusion probability θ/2³². */
  private[queries] val KmvIntersectSql =
    s"""WITH b AS (
       |  SELECT DISTINCT c.c_mktsegment AS g, o.o_custkey AS id
       |  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
       |  WHERE c.c_mktsegment IN ('BUILDING', 'MACHINERY')),
       |h AS (SELECT g, id, ${Sampling.hashBucketSql("id")} AS hk FROM b),
       |r AS (SELECT g, id, hk,
       |  row_number() OVER (PARTITION BY g ORDER BY hk) AS rn FROM h),
       |kth AS (SELECT g, max(CASE WHEN rn = 64 THEN hk END) AS h64
       |  FROM r GROUP BY 1),
       |th AS (SELECT min(coalesce(h64, 4294967296)) AS theta FROM kth),
       |sk AS (SELECT g, hk FROM r CROSS JOIN th
       |  WHERE rn <= 64 AND hk < theta),
       |kin AS (SELECT CAST(count(*) AS BIGINT) AS k_in FROM sk a
       |  WHERE EXISTS (SELECT 1 FROM sk b2
       |    WHERE b2.g <> a.g AND b2.hk = a.hk)),
       |ex AS (SELECT CAST(count(*) AS BIGINT) AS exact_i FROM (
       |  SELECT id FROM b GROUP BY id HAVING count(DISTINCT g) = 2))
       |SELECT ex.exact_i AS exact_intersect,
       |  CAST(kin.k_in / 2 AS BIGINT) AS k_in,
       |  round(kin.k_in / 2.0e0 * 4294967296 / th.theta, 2)
       |    AS est_intersect,
       |  round(abs(kin.k_in / 2.0e0 * 4294967296 / th.theta - ex.exact_i)
       |    / greatest(ex.exact_i, 1), 4) AS rel_error
       |FROM ex CROSS JOIN kin CROSS JOIN th""".stripMargin

  private val Rounds = 3
  private val Scale = 1000L

  /** AdaBoost oracle: generated unrolled rounds. Weights start at the
    * integer cell counts and stay integer-valued (× Scale each round,
    * rounded), so every per-round weighted-error argmin is an EXACT
    * integer comparison in both engines; only α touches a float path
    * (ln of an exact integer ratio, snapped 9 dp before it re-enters
    * the weights). */
  private[queries] val AdaBoostSql = {
    def roundCtes(t: Int): String = {
      val w = s"w$t"
      s"""e$t AS MATERIALIZED (
         |  SELECT th.t AS th,
         |    sum(CASE WHEN ($w.v <= th.t AND $w.y = -1)
         |      OR ($w.v > th.t AND $w.y = 1) THEN $w.w ELSE 0 END)
         |      AS errpos,
         |    sum($w.w) AS tot
         |  FROM $w CROSS JOIN (SELECT unnest(range(1, 50)) AS t) th
         |  GROUP BY 1),
         |p$t AS MATERIALIZED (
         |  SELECT th,
         |    CASE WHEN errpos <= tot - errpos THEN errpos
         |      ELSE tot - errpos END AS err,
         |    CASE WHEN errpos <= tot - errpos THEN 1 ELSE -1 END AS dir,
         |    tot
         |  FROM e$t
         |  ORDER BY CASE WHEN errpos <= tot - errpos THEN errpos
         |      ELSE tot - errpos END, th LIMIT 1),
         |a$t AS MATERIALIZED (
         |  SELECT th, dir, err, tot,
         |    round(0.5e0 * ln((tot - err) / err), 9) AS alpha
         |  FROM p$t),
         |w${t + 1} AS MATERIALIZED (
         |  SELECT w$t.v, w$t.y,
         |    round(w$t.w * exp(-a$t.alpha * w$t.y
         |      * (a$t.dir * (CASE WHEN w$t.v <= a$t.th THEN 1 ELSE -1
         |        END))) * $Scale, 0) AS w
         |  FROM w$t CROSS JOIN a$t)""".stripMargin
    }
    val rounds = (1 to Rounds).map(roundCtes).mkString(",\n")
    val sel = (1 to Rounds).map(t =>
      s"""SELECT CAST($t AS BIGINT) AS round,
         |  CAST(th AS BIGINT) AS threshold, CAST(dir AS BIGINT)
         |    AS direction,
         |  round(err / tot, 6) AS weighted_err, round(alpha, 6) AS alpha
         |FROM a$t""".stripMargin).mkString("\nUNION ALL\n")
    s"""WITH cells AS (
       |  SELECT CAST(l_quantity AS BIGINT) AS v,
       |    CASE WHEN l_linestatus = 'F' THEN 1 ELSE -1 END AS y,
       |    CAST(count(*) AS DOUBLE) AS c
       |  FROM lineitem GROUP BY 1, 2),
       |w1 AS MATERIALIZED (SELECT v, y, c AS w FROM cells),
       |$rounds
       |$sel""".stripMargin
  }

  private def snap9(v: Double): Double =
    BigDecimal(v).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble

  val defs: Seq[QDef] = Seq(

    // GAPS AND ISLANDS: consecutive-active-day runs per user — the
    // i − row_number() constant-key classic, released as the
    // island-length histogram. All heavy windows partition by user.
    QDef("x_gaps_islands", GapsSql) { (s, d) =>
      val ud = Tables(s, d).events
        .select(col("user_id"), col("ts").cast("date").as("d")).distinct()
      val cal = ud.select("d").distinct()
        .select(col("d"),
          row_number().over(Window.orderBy("d")).cast("bigint").as("i"))
      val ui = ud.join(cal, "d").select("user_id", "i")
      val isl = ui.select(col("user_id"),
        (col("i") - row_number().over(
          Window.partitionBy("user_id").orderBy("i")).cast("bigint"))
          .as("grp"))
      val runs = isl.groupBy("user_id", "grp")
        .agg(count(lit(1)).as("len"))
      runs.groupBy(col("len").as("island_len"))
        .agg(count(lit(1)).as("n_islands"),
          countDistinct(col("user_id")).as("n_users"))
    },

    // Gaps-and-islands through Spark's SQL parser — same shared text.
    QDef("x_sql_gaps", GapsSql) { (s, d) =>
      SqlSurface.viewed(s, d, "events")
      s.sql(GapsSql)
    },

    // KMV θ-SKETCH INTERSECTION: |BUILDING ∩ MACHINERY| buyers from two
    // 64-entry sketches — the mergeable set-operation story beside
    // x_sketch_kmv's cardinality (union/intersection without touching
    // the corpus twice). Sketches via the bounded-heap TopKByScore; the
    // estimate is exact-sample algebra below θ.
    QDef("x_sketch_kmv_intersect", KmvIntersectSql) { (s, d) =>
      val t = Tables(s, d)
      val b = t.orders
        .join(broadcast(t.customer.select("c_custkey", "c_mktsegment")),
          col("o_custkey") === col("c_custkey"))
        .filter(col("c_mktsegment").isin("BUILDING", "MACHINERY"))
        .select(col("c_mktsegment").as("g"), col("o_custkey").as("id"))
        .distinct()
      val hk = b.select(col("g"), col("id"),
        Sampling.hashBucket(col("id")).as("hkv"))
      val sketch = hk.groupBy("g").agg(
        graft.functions.TopKByScore.topKByScore(
          -col("hkv").cast("double"), col("id"), 64).as("arr"))
        .select(col("g"), explode(col("arr")).as("e"))
        .select(col("g"), (-col("e").getField("score")).cast("bigint")
          .as("hk"))
      val kth = sketch.groupBy("g").agg(max(col("hk")).as("h64"),
        count(lit(1)).as("cnt"))
      val th = kth.agg(min(when(col("cnt") >= 64, col("h64"))
        .otherwise(lit(4294967296L))).as("theta"))
      val sk = sketch.crossJoin(broadcast(th))
        .filter(col("hk") < col("theta"))
      val kin = sk.alias("a").join(sk.alias("b2"),
          col("a.hk") === col("b2.hk") && col("a.g") =!= col("b2.g"),
          "left_semi")
        .agg(count(lit(1)).as("k_in"))
      val ex = b.groupBy("id").agg(countDistinct(col("g")).as("ng"))
        .filter(col("ng") === 2).agg(count(lit(1)).as("exact_i"))
      val est = col("k_in") / lit(2.0) * lit(4294967296L) / col("theta")
      ex.crossJoin(broadcast(kin)).crossJoin(broadcast(th))
        .select(col("exact_i").as("exact_intersect"),
          (col("k_in") / 2).cast("bigint").as("k_in"),
          round(est, 2).as("est_intersect"),
          round(abs(est - col("exact_i"))
            / greatest(col("exact_i"), lit(1L)), 4).as("rel_error"))
    },

    // IN-DATABASE ADABOOST: 3 boosted depth-1 stumps on quantity →
    // linestatus. ONE corpus collapse to ≤100 (v, y) cells; the
    // boosting loop runs driver-side on the collected frame (the GLM
    // posture) with integer-quantized weights — the argmin over the
    // 49 thresholds × 2 directions is an exact integer comparison, so
    // both engines pick identical stumps; α is the only float (ln of
    // an exact ratio, 9 dp-snapped before re-entering the weights).
    QDef("x_adaboost_stumps", AdaBoostSql) { (s, d) =>
      import s.implicits._
      val cells = Tables(s, d).lineitem
        .select(col("l_quantity").cast("bigint").as("v"),
          when(col("l_linestatus") === "F", 1).otherwise(-1).as("y"))
        .groupBy("v", "y").agg(count(lit(1)).cast("double").as("c"))
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(2)))
      var w = cells.map { case (v, y, c) => ((v, y), c) }.toMap
      val out = (1 to Rounds).map { t =>
        val tot = w.values.sum
        // err for the (v <= th -> +1) direction, per threshold
        val picks = (1 to 49).map { th =>
          val errpos = w.collect {
            case ((v, y), ww) if (v <= th && y == -1) || (v > th && y == 1)
              => ww
          }.sum
          val (err, dir) = if (errpos <= tot - errpos) (errpos, 1)
            else (tot - errpos, -1)
          (err, th, dir)
        }
        val (err, th, dir) = picks.minBy { case (e, t2, _) => (e, t2) }
        val alpha = snap9(0.5 * math.log((tot - err) / err))
        w = w.map { case ((v, y), ww) =>
          val h = dir * (if (v <= th) 1 else -1)
          ((v, y), BigDecimal(ww * math.exp(-alpha * y * h) * Scale)
            .setScale(0, BigDecimal.RoundingMode.HALF_UP).toDouble)
        }
        (t.toLong, th.toLong, dir.toLong,
          BigDecimal(err / tot).setScale(6,
            BigDecimal.RoundingMode.HALF_UP).toDouble,
          BigDecimal(alpha).setScale(6,
            BigDecimal.RoundingMode.HALF_UP).toDouble)
      }
      out.toDF("round", "threshold", "direction", "weighted_err", "alpha")
    }
  )
}
