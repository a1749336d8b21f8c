package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{QDef, Tables}
import graft.functions.JaroWinklerSim
import graft.llm.Sampling
import graft.ops.AsOfJoin

/** Round-10 additions: fuzzy entity-resolution scoring on a native
  * Jaro-Winkler expression, autocorrelation of a time series, linear
  * gap-fill interpolation, histogram-compressed quantile normalization,
  * differentially-private count release, and HITS hubs/authorities — each
  * oracle-paired.
  */
object R10Ops {

  /** Entity-resolution scoring as ONE portable SQL text — the DuckDB oracle
    * of `x_jaro_entity` AND the whole Spark-SQL query of its `x_sql_jaro`
    * twin (jaro_winkler_similarity is registered under its DuckDB spelling
    * for exactly this). Corruption = adjacent transposition of chars 3-4
    * (preserves the 2-char block prefix); candidates come from the prefix
    * BLOCK join, never all-pairs — blocking is part of the operator
    * contract, so the oracle applies the same block.
    */
  private[queries] val JaroEntitySql =
    """WITH names AS (
      |  SELECT DISTINCT p_name FROM part WHERE length(p_name) >= 4),
      |noisy AS (
      |  SELECT DISTINCT substr(p_name, 1, 2) || substr(p_name, 4, 1) ||
      |    substr(p_name, 3, 1) || substr(p_name, 5) AS q FROM names)
      |SELECT q, p_name AS matched,
      |  round(jaro_winkler_similarity(q, p_name), 6) AS score
      |FROM noisy JOIN names ON substr(q, 1, 2) = substr(p_name, 1, 2)
      |WHERE round(jaro_winkler_similarity(q, p_name), 6) >= 0.9""".stripMargin

  /** One HITS iteration, unrolled for the SQL oracle: authority = in-sum of
    * hubs, hub = out-sum of authorities, each L1-normalized and rounded to
    * 9dp (both engines round intermediates identically, so float-sum order
    * drift cannot accumulate across iterations). The normalizer is a
    * `sum(x) OVER ()` window — NOT a scalar subquery — so every CTE is
    * referenced exactly once downstream: DuckDB inlines CTEs per reference,
    * and a double reference per level would expand the 5-iteration chain
    * to 4^5 scans of the base tables (observed as "too many open files"). */
  private def hitsRound(i: Int): String =
    s"""ar$i AS (
       |  SELECT v.id, coalesce(s.x, 0.0) AS x FROM v LEFT JOIN (
       |    SELECT e.dst AS id, sum(h${i - 1}.h) AS x
       |    FROM e JOIN h${i - 1} ON e.src = h${i - 1}.id GROUP BY e.dst) s
       |  ON v.id = s.id),
       |a$i AS (SELECT id, round(x / sum(x) OVER (), 9) AS a FROM ar$i),
       |hr$i AS (
       |  SELECT v.id, coalesce(s.x, 0.0) AS x FROM v LEFT JOIN (
       |    SELECT e.src AS id, sum(a$i.a) AS x
       |    FROM e JOIN a$i ON e.dst = a$i.id GROUP BY e.src) s
       |  ON v.id = s.id),
       |h$i AS (SELECT id, round(x / sum(x) OVER (), 9) AS h FROM hr$i)""".stripMargin

  private[queries] val HitsSql = {
    val iters = (1 to 5).map(hitsRound).mkString(",\n")
    s"""WITH e AS (
       |  SELECT DISTINCT s.s_nationkey AS src, c.c_nationkey AS dst
       |  FROM lineitem l
       |  JOIN orders o ON l.l_orderkey = o.o_orderkey
       |  JOIN customer c ON o.o_custkey = c.c_custkey
       |  JOIN supplier s ON l.l_suppkey = s.s_suppkey),
       |v AS (SELECT src AS id FROM e UNION SELECT dst FROM e),
       |h0 AS (SELECT id, 1.0 AS h FROM v),
       |$iters
       |SELECT h5.id, round(h5.h, 6) AS hub, round(a5.a, 6) AS auth
       |FROM h5 JOIN a5 ON h5.id = a5.id""".stripMargin
  }

  /** HITS hubs/authorities, 5 fixed iterations, L1 normalization.
    * Scale design: the expensive step is the fact-scale edge DERIVATION
    * (three dim joins + distinct) — one shuffle each; the iteration loop
    * then touches only the nation-dim-sized collapsed edge list with
    * broadcast 1-row norm sums. Intermediates round to 9dp (mirrored in
    * the oracle) so cross-engine float-sum order cannot drift. */
  private def hits(s: SparkSession, d: String, iters: Int): DataFrame = {
    val t = Tables(s, d)
    val e = t.lineitem
      .join(t.orders, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(t.customer.select("c_custkey", "c_nationkey")),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(t.supplier.select("s_suppkey", "s_nationkey")),
        col("l_suppkey") === col("s_suppkey"))
      .select(col("s_nationkey").as("src"), col("c_nationkey").as("dst"))
      .distinct()
      .localCheckpoint()
    val v = e.select(col("src").as("id"))
      .union(e.select(col("dst").as("id"))).distinct().localCheckpoint()
    def l1Norm(df: DataFrame, c: String): DataFrame = {
      val tot = df.agg(sum(col(c)).as("_tot"))
      df.crossJoin(broadcast(tot))
        .select(col("id"), round(col(c) / col("_tot"), 9).as(c))
    }
    var h = v.withColumn("h", lit(1.0))
    var a: DataFrame = null
    for (i <- 1 to iters) {
      val aRaw = v.join(
          e.join(h, col("src") === col("id")).groupBy(col("dst"))
            .agg(sum(col("h")).as("x")).withColumnRenamed("dst", "_dst"),
          col("id") === col("_dst"), "left")
        .select(col("id"), coalesce(col("x"), lit(0.0)).as("a"))
      a = l1Norm(aRaw, "a")
      val hRaw = v.join(
          e.join(a, col("dst") === col("id")).groupBy(col("src"))
            .agg(sum(col("a")).as("x")).withColumnRenamed("src", "_src"),
          col("id") === col("_src"), "left")
        .select(col("id"), coalesce(col("x"), lit(0.0)).as("h"))
      h = if (i % 2 == 0 || i == iters) l1Norm(hRaw, "h").localCheckpoint()
          else l1Norm(hRaw, "h")
    }
    h.join(a.withColumnRenamed("id", "_aid"), col("id") === col("_aid"))
      .select(col("id"), round(col("h"), 6).as("hub"), round(col("a"), 6).as("auth"))
  }


  /** ACF oracle — dialect-neutral, shared verbatim by the `x_sql_acf`
    * Spark-SQL twin (the CcSql twin contract). */
  private[queries] val AcfSql =
    """WITH daily AS (
        |  SELECT CAST(ts AS DATE) AS d, CAST(count(*) AS DOUBLE) AS c
        |  FROM events GROUP BY 1),
        |lagged AS (
        |  SELECT c,
        |    lead(c, 1) OVER (ORDER BY d) AS c1,
        |    lead(c, 2) OVER (ORDER BY d) AS c2,
        |    lead(c, 3) OVER (ORDER BY d) AS c3,
        |    lead(c, 4) OVER (ORDER BY d) AS c4,
        |    lead(c, 5) OVER (ORDER BY d) AS c5,
        |    lead(c, 6) OVER (ORDER BY d) AS c6,
        |    lead(c, 7) OVER (ORDER BY d) AS c7
        |  FROM daily)
        |SELECT lag_k, round(corr(x, y), 6) AS acf FROM (
        |  SELECT 1 AS lag_k, c AS x, c1 AS y FROM lagged
        |  UNION ALL SELECT 2, c, c2 FROM lagged
        |  UNION ALL SELECT 3, c, c3 FROM lagged
        |  UNION ALL SELECT 4, c, c4 FROM lagged
        |  UNION ALL SELECT 5, c, c5 FROM lagged
        |  UNION ALL SELECT 6, c, c6 FROM lagged
        |  UNION ALL SELECT 7, c, c7 FROM lagged)
        |WHERE y IS NOT NULL GROUP BY lag_k""".stripMargin

  /** Rolling-correlation oracle — dialect-neutral, shared verbatim by the
    * `x_sql_rolling` twin. */
  private[queries] val RollingCorrSql =
    """WITH daily AS (
        |  SELECT CAST(ts AS DATE) AS d,
        |    CAST(count(CASE WHEN event_type = 'view' THEN 1 END) AS DOUBLE) AS v,
        |    CAST(count(CASE WHEN event_type = 'purchase' THEN 1 END) AS DOUBLE) AS p
        |  FROM events GROUP BY 1),
        |w AS (
        |  SELECT d,
        |    row_number() OVER (ORDER BY d) AS rn,
        |    round(corr(v, p) OVER (ORDER BY d
        |      ROWS BETWEEN 6 PRECEDING AND CURRENT ROW), 6) AS roll_corr
        |  FROM daily)
        |SELECT d, roll_corr FROM w WHERE rn >= 7""".stripMargin

  /** One power-iteration round, unrolled for the PCA oracle: project each
    * centered vector onto v (9dp snap), back-project per dimension, then
    * L2-normalize (9dp snap) — the rounding cadence both engines share. */
  private def pcaRound(i: Int): String =
    s"""p$i AS (
       |  SELECT e.vec_id, round(sum(e.x * v${i - 1}.val), 9) AS proj
       |  FROM e JOIN v${i - 1} ON e.dim = v${i - 1}.dim GROUP BY e.vec_id),
       |nv$i AS (
       |  SELECT e.dim, sum(e.x * p$i.proj) AS raw
       |  FROM e JOIN p$i ON e.vec_id = p$i.vec_id GROUP BY e.dim),
       |v$i AS (
       |  SELECT dim, round(raw / sqrt(sum(raw * raw) OVER ()), 9) AS val
       |  FROM nv$i)""".stripMargin

  private[queries] val PcaSql = {
    val iters = (1 to 5).map(pcaRound).mkString(",\n")
    s"""WITH e0 AS (
       |  SELECT vec_id, unnest(embedding) AS x,
       |    generate_subscripts(embedding, 1) - 1 AS dim
       |  FROM embeddings),
       |mu AS (SELECT dim, avg(x) AS m FROM e0 GROUP BY dim),
       |e AS (SELECT vec_id, e0.dim, x - m AS x FROM e0 JOIN mu ON e0.dim = mu.dim),
       |v0 AS (SELECT DISTINCT dim, 0.125 AS val FROM e0),
       |$iters,
       |sgn AS (
       |  SELECT CASE WHEN max(CASE WHEN dim = 0 THEN val END) >= 0
       |    THEN 1.0 ELSE -1.0 END AS sg
       |  FROM v5)
       |SELECT dim, round(sg * val, 6) AS loading FROM v5, sgn""".stripMargin
  }


  /** Isotonic-calibration text — PORTABLE (e-notation literals: a decimal
    * literal is DECIMAL in Spark SQL and would fail the dtype gate), shared
    * verbatim by the `x_sql_isotonic` twin. */
  private[queries] val IsotonicSql =
    """WITH h AS (
        |  SELECT o_totalprice AS v,
        |    CASE WHEN o_orderstatus = 'F' THEN 1e0 ELSE 0e0 END AS y
        |  FROM orders),
        |hist AS (SELECT v, count(*) AS c, sum(y) AS s FROM h GROUP BY 1),
        |hb AS (SELECT CAST(floor(v / 1000) AS BIGINT) AS bin, v, c, s
        |  FROM hist),
        |binpre AS (
        |  SELECT bin,
        |    coalesce(sum(bc) OVER (ORDER BY bin
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      AS bin_below,
        |    sum(bc) OVER () AS n
        |  FROM (SELECT bin, sum(c) AS bc FROM hb GROUP BY 1)),
        |cum AS (
        |  SELECT hb.v, hb.c, hb.s,
        |    bp.bin_below + coalesce(sum(hb.c) OVER (PARTITION BY hb.bin
        |      ORDER BY hb.v
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS below,
        |    bp.n
        |  FROM hb JOIN binpre bp ON hb.bin = bp.bin),
        |b AS (
        |  SELECT least(9, CAST(floor(below * 1e1 / n) AS INTEGER)) AS bucket,
        |    c, s
        |  FROM cum),
        |bs AS (
        |  SELECT bucket, CAST(sum(c) AS BIGINT) AS n_b, sum(s) AS pos
        |  FROM b GROUP BY 1),
        |pre AS (
        |  SELECT bucket, n_b, pos,
        |    sum(n_b) OVER (ORDER BY bucket) AS cn,
        |    sum(pos) OVER (ORDER BY bucket) AS cp
        |  FROM bs),
        |pre0 AS (SELECT bucket, cn, cp FROM pre
        |  UNION ALL SELECT -1, 0, 0e0),
        |avgs AS (
        |  SELECT j.bucket + 1 AS j, k.bucket AS k,
        |    (k.cp - j.cp) / (k.cn - j.cn) AS a
        |  FROM pre0 j JOIN pre0 k ON j.bucket < k.bucket),
        |mins AS (
        |  SELECT a.j, i.bucket AS i, min(a.a) AS mn
        |  FROM avgs a JOIN pre i ON a.j <= i.bucket AND a.k >= i.bucket
        |  GROUP BY 1, 2),
        |fit AS (SELECT i, max(mn) AS iso FROM mins GROUP BY 1)
        |SELECT f.i AS bucket, bs.n_b, round(bs.pos / bs.n_b, 6) AS raw_rate,
        |  round(f.iso, 6) AS iso_rate
        |FROM fit f JOIN bs ON bs.bucket = f.i""".stripMargin

  /** Gini text — portable, shared verbatim by the `x_sql_gini` twin.
    * Lorenz ranks come from the binned two-level prefix (bin offset +
    * within-bin row_number), so even the SQL-parsed plan sorts only
    * (segment, spend-bin) slices — the spend domain bounds the bin frame,
    * never the customer count. */
  private[queries] val GiniSql =
    """WITH spend AS (
        |  SELECT c.c_mktsegment AS g, c.c_custkey,
        |    sum(o.o_totalprice) AS x
        |  FROM customer c JOIN orders o ON o.o_custkey = c.c_custkey
        |  GROUP BY 1, 2),
        |sb AS (SELECT g, c_custkey, x,
        |  CAST(floor(x / 5000) AS BIGINT) AS bin FROM spend),
        |binpre AS (
        |  SELECT g, bin,
        |    coalesce(sum(bc) OVER (PARTITION BY g ORDER BY bin
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      AS bin_below
        |  FROM (SELECT g, bin, count(*) AS bc FROM sb GROUP BY 1, 2)),
        |ranked AS (
        |  SELECT sb.g, sb.x,
        |    bp.bin_below + row_number() OVER (PARTITION BY sb.g, sb.bin
        |      ORDER BY sb.x, sb.c_custkey) AS r
        |  FROM sb JOIN binpre bp ON sb.g = bp.g AND sb.bin = bp.bin)
        |SELECT g AS c_mktsegment, CAST(count(*) AS BIGINT) AS n_customers,
        |  round(2e0 * sum(r * x) / (count(*) * sum(x))
        |    - (count(*) + 1e0) / count(*), 6) AS gini
        |FROM ranked GROUP BY 1""".stripMargin

  /** Binary-segmentation changepoint text — portable, shared verbatim by
    * the `x_sql_changepoint` twin. One split of the daily value series at
    * the day maximizing the within-segment variance reduction, all from
    * prefix sums over the calendar-bounded frame (cumsum order is the
    * sequential window order in BOTH engines, so the doubles agree
    * exactly before the final rounding). */
  private[queries] val ChangepointSql =
    """WITH daily AS (
      |  SELECT CAST(ts AS DATE) AS d, round(avg(value), 6) AS v
      |  FROM events GROUP BY 1),
      |pre AS (
      |  SELECT d, v,
      |    row_number() OVER (ORDER BY d) AS i,
      |    sum(v) OVER (ORDER BY d) AS s,
      |    sum(v * v) OVER (ORDER BY d) AS q,
      |    count(*) OVER () AS n,
      |    sum(v) OVER () AS st,
      |    sum(v * v) OVER () AS qt
      |  FROM daily),
      |cand AS (
      |  SELECT d, i, n,
      |    (qt - st * st / n)
      |      - ((q - s * s / i) + ((qt - q) - (st - s) * (st - s) / (n - i)))
      |      AS red,
      |    s / i AS mean_left, (st - s) / (n - i) AS mean_right
      |  FROM pre WHERE i < n),
      |best AS (
      |  SELECT *, row_number() OVER (ORDER BY red DESC, d) AS rk FROM cand)
      |SELECT d AS last_day_left, round(mean_left, 6) AS mean_left,
      |  round(mean_right, 6) AS mean_right, round(red, 6) AS var_reduction
      |FROM best WHERE rk = 1""".stripMargin

  /** Degree-assortativity text — portable, shared verbatim by the
    * `x_sql_assortativity` twin. Pearson correlation of endpoint degrees
    * over the symmetrized sparse trade graph. */
  private[queries] val AssortSql =
    """WITH pc AS (
      |  SELECT s.s_nationkey AS src, c.c_nationkey AS dst, count(*) AS w
      |  FROM lineitem l
      |  JOIN orders o ON l.l_orderkey = o.o_orderkey
      |  JOIN customer c ON o.o_custkey = c.c_custkey
      |  JOIN supplier s ON l.l_suppkey = s.s_suppkey
      |  WHERE l.l_extendedprice > 100000 AND s.s_nationkey <> c.c_nationkey
      |  GROUP BY 1, 2),
      |e0 AS (
      |  SELECT src, dst FROM (
      |    SELECT src, dst,
      |      row_number() OVER (ORDER BY w DESC, src, dst) AS rk
      |    FROM pc)
      |  WHERE rk <= 60),
      |und AS (SELECT src AS u, dst AS v FROM e0
      |  UNION SELECT dst, src FROM e0),
      |deg AS (SELECT u, CAST(count(*) AS DOUBLE) AS k FROM und GROUP BY 1)
      |SELECT round(corr(du.k, dv.k), 6) AS assortativity,
      |  CAST(count(*) AS BIGINT) AS m_directed
      |FROM und JOIN deg du ON und.u = du.u JOIN deg dv ON und.v = dv.u""".stripMargin

  val defs: Seq[QDef] = Seq(

    // FUZZY ENTITY SCORING: a transposition-corrupted feed matched to the
    // clean catalog by native Jaro-Winkler (codegen'd BinaryExpression —
    // no UDF boxing), candidates from a 2-char-prefix equi-join block. The
    // expression is fuzz-pinned to DuckDB's jaro_winkler_similarity
    // semantics (JaroWinklerSpec), so the oracle verifies scores directly.
    QDef("x_jaro_entity", JaroEntitySql) { (s, d) =>
      val names = Tables(s, d).part
        .filter(length(col("p_name")) >= 4)
        .select(col("p_name")).distinct()
      val noisy = names.select(
        concat(substring(col("p_name"), 1, 2), substring(col("p_name"), 4, 1),
          substring(col("p_name"), 3, 1),
          expr("substring(p_name, 5, length(p_name))")).as("q")).distinct()
      val score = round(JaroWinklerSim.jaroWinkler(col("q"), col("p_name")), 6)
      noisy.join(names,
          substring(col("q"), 1, 2) === substring(col("p_name"), 1, 2))
        .select(col("q"), col("p_name").as("matched"), score.as("score"))
        .filter(col("score") >= 0.9)
    },

    // SQL-surface twin: the SAME portable text through spark.sql —
    // parser → analyzer (jaro_winkler_similarity from the injected
    // FunctionRegistry) → execution, held to the same DuckDB ground truth.
    QDef("x_sql_jaro", JaroEntitySql) { (s, d) =>
      SqlSurface.viewed(s, d, "part")
      s.sql(JaroEntitySql)
    },

    // AUTOCORRELATION: ACF of the daily event-count series at lags 1..7 —
    // the seasonality fingerprint (a weekly cycle shows as a lag-7 peak).
    // The series is CALENDAR-BOUNDED (one row per day regardless of corpus
    // size), so the unpartitioned lead() window runs over a KB frame; the
    // corpus-scale work is the one daily count aggregate.
    QDef("x_acf",
      AcfSql) { (s, d) =>
      val daily = Tables(s, d).events
        .groupBy(to_date(col("ts")).as("d"))
        .agg(count(lit(1)).cast("double").as("c"))
      val w = Window.orderBy("d") // KB frame: one row per calendar day
      val lagged = (1 to 7).foldLeft(daily) { (df, k) =>
        df.withColumn(s"c$k", lead(col("c"), k).over(w))
      }
      lagged.select(expr(
          "stack(7, 1, c, c1, 2, c, c2, 3, c, c3, 4, c, c4, " +
            "5, c, c5, 6, c, c6, 7, c, c7) AS (lag_k, x, y)"))
        .filter(col("y").isNotNull)
        .groupBy("lag_k").agg(round(corr(col("x"), col("y")), 6).as("acf"))
    },

    // GAP-FILL INTERPOLATION: per-type daily means with deterministically
    // knocked-out days (day-of-month ≡ 2 mod 5 — the "sensor outage"),
    // rebuilt on a dense date spine by linear interpolation between the
    // previous/next surviving observations. Windows partition BY SERIES
    // KEY and the spine is calendar-bounded, so per-partition state stays
    // KB at any corpus size; the corpus-scale work is the daily aggregate.
    QDef("x_interpolate",
      """WITH obs AS (
        |  SELECT event_type, CAST(ts AS DATE) AS d, round(avg(value), 6) AS v
        |  FROM events GROUP BY 1, 2),
        |kept AS (SELECT * FROM obs WHERE day(d) % 5 <> 2),
        |bounds AS (
        |  SELECT min(CAST(ts AS DATE)) AS d0, max(CAST(ts AS DATE)) AS d1
        |  FROM events),
        |types AS (SELECT DISTINCT event_type FROM events),
        |spine AS (
        |  SELECT event_type,
        |    CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE) AS d
        |  FROM bounds, types),
        |j AS (
        |  SELECT spine.event_type, spine.d, kept.v
        |  FROM spine LEFT JOIN kept
        |  ON spine.event_type = kept.event_type AND spine.d = kept.d),
        |w AS (
        |  SELECT event_type, d, v,
        |    last_value(v IGNORE NULLS) OVER (PARTITION BY event_type ORDER BY d
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pv,
        |    last_value(CASE WHEN v IS NOT NULL THEN d END IGNORE NULLS)
        |      OVER (PARTITION BY event_type ORDER BY d
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pd,
        |    first_value(v IGNORE NULLS) OVER (PARTITION BY event_type ORDER BY d
        |      ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS nv,
        |    first_value(CASE WHEN v IS NOT NULL THEN d END IGNORE NULLS)
        |      OVER (PARTITION BY event_type ORDER BY d
        |      ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS nd
        |  FROM j)
        |SELECT event_type, d,
        |  CASE WHEN v IS NOT NULL THEN v
        |    ELSE round(pv + (nv - pv) * (d - pd) / (nd - pd), 6) END AS filled,
        |  v IS NULL AS interpolated
        |FROM w""".stripMargin) { (s, d) =>
      val ev = Tables(s, d).events
      val obs = ev.groupBy(col("event_type"), to_date(col("ts")).as("d"))
        .agg(round(avg(col("value")), 6).as("v"))
      val kept = obs.filter(dayofmonth(col("d")) % 5 =!= 2)
      val bounds = ev.agg(min(to_date(col("ts"))).as("d0"),
        max(to_date(col("ts"))).as("d1"))
      val types = ev.select(col("event_type")).distinct()
      val spine = broadcast(bounds).crossJoin(types)
        .select(col("event_type"), explode(sequence(col("d0"), col("d1"))).as("d"))
      val j = spine.join(kept, Seq("event_type", "d"), "left")
      val prec = Window.partitionBy("event_type").orderBy("d")
        .rowsBetween(Window.unboundedPreceding, -1)
      val foll = Window.partitionBy("event_type").orderBy("d")
        .rowsBetween(1, Window.unboundedFollowing)
      val dWhenObs = when(col("v").isNotNull, col("d"))
      j.withColumn("pv", last(col("v"), ignoreNulls = true).over(prec))
        .withColumn("pd", last(dWhenObs, ignoreNulls = true).over(prec))
        .withColumn("nv", first(col("v"), ignoreNulls = true).over(foll))
        .withColumn("nd", first(dWhenObs, ignoreNulls = true).over(foll))
        .select(col("event_type"), col("d"),
          when(col("v").isNotNull, col("v"))
            .otherwise(round(col("pv") + (col("nv") - col("pv"))
              * datediff(col("d"), col("pd")) / datediff(col("nd"), col("pd")), 6))
            .as("filled"),
          col("v").isNull.as("interpolated"))
    },

    // QUANTILE NORMALIZATION: each segment's price distribution mapped onto
    // the GLOBAL distribution (segment percent-rank → global quantile
    // value) — the batch-effect correction recipe. Exact ranks come from
    // [[graft.ops.BinnedRank]] (price-domain-bounded bin frame + per-bin
    // slices; percent_rank = cum-count-below / (n−1) depends only on the
    // value, so the distinct-value histogram is lossless). The
    // rank→quantile as-of mapping is itself BINNED: rk ∈ [0, 1e6] splits
    // into 1001 rank bins, the within-bin as-of union-window partitions by
    // rank bin (1001-way, never one key), and a misses-the-bin lookup
    // falls back to a carry table built on the bounded bin frame. The
    // (n−1) divisor is guarded with greatest(·,1) in BOTH engines so a
    // single-distinct-value frame degrades identically instead of
    // NaN-diverging. Oracle = row-level percent_rank + DuckDB ASOF JOIN.
    QDef("x_quantile_norm",
      """WITH oc AS (
        |  SELECT c.c_mktsegment AS g, o.o_totalprice AS v
        |  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey),
        |seg AS (
        |  SELECT g, v,
        |    CAST(round((rank() OVER (PARTITION BY g ORDER BY v) - 1)
        |      / greatest(count(*) OVER (PARTITION BY g) - 1, 1) * 1000000)
        |      AS BIGINT) AS rk
        |  FROM oc),
        |segd AS (SELECT DISTINCT g, v, rk FROM seg),
        |gq AS (
        |  SELECT DISTINCT v AS gv,
        |    CAST(round((rank() OVER (ORDER BY v) - 1)
        |      / greatest(count(*) OVER () - 1, 1) * 1000000) AS BIGINT) AS rk
        |  FROM oc),
        |globd AS (SELECT rk, max(gv) AS gv FROM gq GROUP BY rk),
        |m AS (SELECT g, gv FROM segd ASOF JOIN globd ON segd.rk >= globd.rk)
        |SELECT g AS c_mktsegment, CAST(count(*) AS BIGINT) AS n_values,
        |  round(avg(gv), 6) AS avg_norm, round(min(gv), 6) AS min_norm,
        |  round(max(gv), 6) AS max_norm
        |FROM m GROUP BY g""".stripMargin) { (s, d) =>
      val t = Tables(s, d)
      val oc = t.orders
        .join(broadcast(t.customer.select("c_custkey", "c_mktsegment")),
          col("o_custkey") === col("c_custkey"))
        .select(col("c_mktsegment").as("g"), col("o_totalprice").as("v"))
      def rankKey(below: Column, n: Column): Column =
        round(below.cast("double") / greatest(n - lit(1), lit(1L))
          * lit(1000000)).cast("bigint")
      val priceBin = floor(col("v") / lit(1000)).cast("bigint")
      val seg = graft.ops.BinnedRank.belowAndN(
          oc.groupBy("g", "v").agg(count(lit(1)).as("c")),
          Seq("g"), priceBin, Seq(col("v")), col("c"))
        .select(col("g"), col("v"), rankKey(col("below"), col("n")).as("rk"))
      val glob = graft.ops.BinnedRank.belowAndN(
          oc.groupBy("v").agg(count(lit(1)).as("c")),
          Seq.empty, priceBin, Seq(col("v")), col("c"))
        .select(rankKey(col("below"), col("n")).as("rk"), col("v").as("gv"))
      // rank-binned as-of: globd collapsed per rk (max gv, the oracle's
      // tie-break), then looked up within each 1000-wide rank bin; a seg
      // row whose bin holds no earlier glob rk takes the previous bins'
      // carry (last max-rk gv, computed on the ≤1001-row bin frame).
      // rk 0 always exists (the global minimum), so bin 0 never misses.
      val rkBin = floor(col("rk") / lit(1000)).cast("bigint")
      val globd = glob.groupBy("rk").agg(max(col("gv")).as("gv"))
        .withColumn("rkbin", rkBin)
      // carry over the DENSE [0,1000] bin domain (a seg bin may hold no
      // glob row at all — it still needs the last earlier-bin value)
      val wCarry = Window.orderBy("rkbin")
        .rowsBetween(Window.unboundedPreceding, -1)
      val carry = s.range(0, 1001).select(col("id").as("rkbin"))
        .join(globd.groupBy("rkbin")
          .agg(max(struct(col("rk"), col("gv"))).as("lastg")),
          Seq("rkbin"), "left")
        .withColumn("prev", last(col("lastg"), ignoreNulls = true).over(wCarry))
        .select(col("rkbin"), col("prev").getField("gv").as("carry_gv"))
      val m = AsOfJoin.asofJoin(
          seg.withColumn("rkbin", rkBin), globd,
          key = "rkbin", ts = "rk", valueCol = "gv", valueAlias = "norm0")
        .join(broadcast(carry), Seq("rkbin"), "left")
        .withColumn("norm", coalesce(col("norm0"), col("carry_gv")))
      m.groupBy(col("g").as("c_mktsegment"))
        .agg(count(lit(1)).as("n_values"),
          round(avg(col("norm")), 6).as("avg_norm"),
          round(min(col("norm")), 6).as("min_norm"),
          round(max(col("norm")), 6).as("max_norm"))
    },

    // DIFFERENTIAL-PRIVACY COUNT RELEASE: per-type counts + Laplace(1/ε)
    // noise via the inverse CDF on a DETERMINISTIC uniform (the shared
    // portable group-hash — Sampling.groupHashBucket — so the oracle
    // replays the identical draw; swap in a real RNG for production
    // release). ε=1. Map-side combine does all corpus-scale work; the
    // noise arithmetic runs on the 5-row released frame.
    QDef("x_dp_counts", {
      val u = s"((${Sampling.groupHashBucketSql("event_type")}) + 0.5) / 4294967296.0"
      s"""WITH c AS (
         |  SELECT event_type, CAST(count(*) AS BIGINT) AS n
         |  FROM events GROUP BY 1),
         |uu AS (SELECT event_type, n, $u AS u FROM c)
         |SELECT event_type,
         |  round(n + -1.0 * sign(u - 0.5) * ln(1.0 - 2.0 * abs(u - 0.5)), 6)
         |    AS dp_count
         |FROM uu""".stripMargin
    }) { (s, d) =>
      val c = Tables(s, d).events
        .groupBy("event_type").agg(count(lit(1)).as("n"))
      val u = (Sampling.groupHashBucket(col("event_type")) + lit(0.5)) /
        lit(4294967296.0)
      c.withColumn("u", u)
        .select(col("event_type"),
          round(col("n") + lit(-1.0) * signum(col("u") - 0.5)
            * log(lit(1.0) - lit(2.0) * abs(col("u") - 0.5)), 6).as("dp_count"))
    },

    // HITS hubs/authorities over the supplier-nation → customer-nation
    // trade graph, 5 fixed iterations (see [[hits]] for the scale design).
    QDef("x_graph_hits", HitsSql) { (s, d) => hits(s, d, 5) },

    // EMBEDDING DIMENSION PROFILE: per-dimension mean / variance / label
    // correlation over the embedding column — the feature-selection +
    // drift-monitoring pass. posexplode THEN hash aggregate: partial
    // (map-side) aggregation collapses each partition to `dims` rows
    // before the shuffle, so the exchange is dims×partitions regardless
    // of corpus size — the row "explosion" never crosses the wire.
    QDef("x_embed_dimstats",
      """WITH e AS (
        |  SELECT unnest(embedding) AS x, generate_subscripts(embedding, 1) AS i,
        |    label
        |  FROM embeddings)
        |SELECT i - 1 AS dim, round(avg(x), 6) AS mean,
        |  round(var_pop(x), 6) AS variance,
        |  round(corr(x, label), 6) AS label_corr
        |FROM e GROUP BY 1""".stripMargin) { (s, d) =>
      Tables(s, d).embeddings
        .select(col("label"), posexplode(col("embedding")))
        .groupBy(col("pos").as("dim"))
        .agg(round(avg(col("col")), 6).as("mean"),
          round(var_pop(col("col")), 6).as("variance"),
          round(corr(col("col"), col("label")), 6).as("label_corr"))
    },

    // ROLLING CORRELATION: 7-day windowed Pearson correlation between the
    // view and purchase daily series — the co-movement monitor. The
    // window runs over the calendar-bounded daily frame (KB at any corpus
    // size); the corpus-scale work is the conditional daily aggregate.
    QDef("x_rolling_corr",
      RollingCorrSql) { (s, d) =>
      val daily = Tables(s, d).events
        .groupBy(to_date(col("ts")).as("d"))
        .agg(count(when(col("event_type") === "view", 1)).cast("double").as("v"),
          count(when(col("event_type") === "purchase", 1)).cast("double").as("p"))
      val ord = Window.orderBy("d") // KB frame: one row per calendar day
      daily
        .withColumn("rn", row_number().over(ord))
        .withColumn("roll_corr",
          round(corr(col("v"), col("p")).over(ord.rowsBetween(-6, 0)), 6))
        .filter(col("rn") >= 7)
        .select(col("d"), col("roll_corr"))
    },

    // READABILITY: Flesch reading ease per language — scan-local column
    // algebra only (three regex passes + counts), aggregated per lang.
    // Syllables ≈ maximal vowel runs; sentences = terminal-punctuation
    // count (floored at 1 — the corpus is unpunctuated word salad, which
    // exercises the formula, not English prosody).
    QDef("x_readability",
      """WITH d AS (
        |  SELECT lang,
        |    len(string_split(text, ' ')) AS words,
        |    greatest(1, length(regexp_replace(text, '[^.!?]', '', 'g'))) AS sents,
        |    length(regexp_replace(lower(text), '[aeiouy]+', '#', 'g'))
        |      - length(replace(regexp_replace(lower(text), '[aeiouy]+', '#', 'g'),
        |        '#', '')) AS sylls
        |  FROM documents)
        |SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
        |  round(avg(206.835 - 1.015 * (words * 1.0 / sents)
        |    - 84.6 * (sylls * 1.0 / words)), 6) AS avg_flesch
        |FROM d GROUP BY 1""".stripMargin) { (s, d) =>
      val collapsed = regexp_replace(lower(col("text")), "[aeiouy]+", "#")
      Tables(s, d).documents
        .select(col("lang"),
          size(split(col("text"), " ")).as("words"),
          greatest(lit(1), length(regexp_replace(col("text"), "[^.!?]", "")))
            .as("sents"),
          (length(collapsed) - length(regexp_replace(collapsed, "#", "")))
            .as("sylls"))
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"),
          round(avg(lit(206.835) - lit(1.015) * (col("words") * 1.0 / col("sents"))
            - lit(84.6) * (col("sylls") * 1.0 / col("words"))), 6).as("avg_flesch"))
    },

    // RAKE KEYPHRASES: candidate phrases = maximal stopword-free word runs
    // (gaps-and-islands: island id = pos − row_number over non-stop words),
    // capped at 4 words; word score = corpus degree/frequency over the
    // candidate set; phrase score = Σ word scores. Everything is word- or
    // phrase-keyed aggregation — no self-joins, no driver state; the
    // support≥5 cut keeps the output set closed under row-hash compare
    // (a top-k would tie-break on 6dp-rounded scores at the boundary).
    QDef("x_rake_keyphrases",
      """WITH toks AS (
        |  SELECT doc_id,
        |    string_split(regexp_replace(lower(text), '[^a-z ]', ' ', 'g'), ' ')
        |      AS ws
        |  FROM documents),
        |w0 AS (
        |  SELECT doc_id, unnest(ws) AS word, generate_subscripts(ws, 1) AS pos
        |  FROM toks),
        |w1 AS (SELECT * FROM w0 WHERE word <> ''),
        |ns AS (
        |  SELECT doc_id, word, pos,
        |    pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS grp
        |  FROM w1
        |  WHERE word NOT IN
        |    ('a','the','of','and','to','in','is','on','for','with')),
        |phr AS (
        |  SELECT doc_id, grp, string_agg(word, ' ' ORDER BY pos) AS phrase,
        |    count(*) AS len
        |  FROM ns GROUP BY 1, 2),
        |cand AS (SELECT * FROM phr WHERE len <= 4),
        |pw AS (
        |  SELECT doc_id, grp, phrase, len, unnest(string_split(phrase, ' '))
        |    AS word
        |  FROM cand),
        |ws AS (SELECT word, count(*) AS c, sum(len) AS deg FROM pw GROUP BY 1),
        |pscore AS (
        |  SELECT pw.doc_id, pw.grp, pw.phrase,
        |    sum(ws.deg * 1.0 / ws.c) AS score
        |  FROM pw JOIN ws ON pw.word = ws.word GROUP BY 1, 2, 3)
        |SELECT phrase, CAST(count(*) AS BIGINT) AS support,
        |  round(max(score), 6) AS rake_score
        |FROM pscore GROUP BY 1 HAVING count(*) >= 5""".stripMargin) { (s, d) =>
      val stop = Seq("a", "the", "of", "and", "to", "in", "is", "on", "for", "with")
      val words = Tables(s, d).documents
        .select(col("doc_id"),
          posexplode(split(regexp_replace(lower(col("text")), "[^a-z ]", " "), " ")))
        .withColumnRenamed("col", "word")
        .filter(col("word") =!= "")
      val ns = words.filter(!col("word").isInCollection(stop))
        .withColumn("grp", col("pos") -
          row_number().over(Window.partitionBy("doc_id").orderBy("pos")))
      // r15 pin: pw (derived from phr) feeds BOTH the word-stats aggregate
      // and the score join — unpinned, the words→window→phrase chain
      // replayed once per reference (guide §5 reuse-vs-recompute)
      val phr = ns.groupBy("doc_id", "grp")
        .agg(array_join(transform(
            array_sort(collect_list(struct(col("pos"), col("word")))),
            x => x.getField("word")), " ").as("phrase"),
          count(lit(1)).as("len"))
        .filter(col("len") <= 4)
        .localCheckpoint(false)
      val pw = phr.select(col("doc_id"), col("grp"), col("phrase"), col("len"),
        explode(split(col("phrase"), " ")).as("word"))
      val wstats = pw.groupBy("word")
        .agg(count(lit(1)).as("c"), sum(col("len")).as("deg"))
      val pscore = pw.join(wstats, "word")
        .groupBy("doc_id", "grp", "phrase")
        .agg(sum(col("deg") * lit(1.0) / col("c")).as("score"))
      pscore.groupBy("phrase")
        .agg(count(lit(1)).as("support"), round(max(col("score")), 6).as("rake_score"))
        .filter(col("support") >= 5)
    },

    // SQL-surface twins: the ACF and rolling-correlation oracle texts are
    // dialect-neutral, so they run verbatim through spark.sql against the
    // same DuckDB ground truth (the CcSql twin contract).
    QDef("x_sql_acf", AcfSql) { (s, d) =>
      SqlSurface.viewed(s, d, "events")
      s.sql(AcfSql)
    },

    QDef("x_sql_rolling", RollingCorrSql) { (s, d) =>
      SqlSurface.viewed(s, d, "events")
      s.sql(RollingCorrSql)
    },

    // BENFORD AUDIT: first-significant-digit distribution of order totals
    // vs Benford's law, with per-digit χ² contributions — the classic
    // fabricated-data screen. The digit comes from INTEGER formatting
    // (floor → BIGINT → string head), never float log-magnitude math,
    // so engines can't disagree at power-of-ten boundaries. One count
    // aggregate does all corpus-scale work; the law's expected shares are
    // 9-row constants.
    QDef("x_benford",
      """WITH digits AS (
        |  SELECT CAST(substr(CAST(CAST(floor(o_totalprice) AS BIGINT)
        |    AS VARCHAR), 1, 1) AS INTEGER) AS digit
        |  FROM orders),
        |n AS (SELECT CAST(count(*) AS DOUBLE) AS total FROM digits),
        |obs AS (
        |  SELECT digit, CAST(count(*) AS BIGINT) AS observed
        |  FROM digits GROUP BY 1)
        |SELECT obs.digit, observed,
        |  round(total * log10(1 + 1.0 / obs.digit), 4) AS expected,
        |  round(pow(observed - total * log10(1 + 1.0 / obs.digit), 2)
        |    / (total * log10(1 + 1.0 / obs.digit)), 6) AS chi2_term
        |FROM obs, n""".stripMargin) { (s, d) =>
      val digits = Tables(s, d).orders.select(
        substring(floor(col("o_totalprice")).cast("bigint").cast("string"), 1, 1)
          .cast("int").as("digit"))
      val n = digits.agg(count(lit(1)).cast("double").as("total"))
      val expShare = log10(lit(1) + lit(1.0) / col("digit"))
      digits.groupBy("digit").agg(count(lit(1)).as("observed"))
        .crossJoin(broadcast(n))
        .select(col("digit"), col("observed"),
          round(col("total") * expShare, 4).as("expected"),
          round(pow(col("observed") - col("total") * expShare, 2)
            / (col("total") * expShare), 6).as("chi2_term"))
    },

    // CLOSENESS CENTRALITY over the sparse high-value trade graph (the g4
    // sparsification family): all-pairs BFS by frontier iteration — per
    // round one frontier⋈edges join + a min-dist aggregate, rounds ≤
    // diameter (8-round contract; a round past the fixpoint is a no-op) —
    // then closeness = (reached−1)/Σdist per source. The state frame is
    // (source, vertex, dist): |V|²-bounded, NOT corpus-bounded — the
    // corpus-scale cost is the one edge-derivation pass. Oracle: bounded
    // recursive CTE, min depth per (source, vertex) — the g5 BFS shape.
    QDef("x_graph_closeness",
      """WITH e0 AS (
        |  SELECT DISTINCT s.s_nationkey AS src, c.c_nationkey AS dst
        |  FROM lineitem l
        |  JOIN orders o ON l.l_orderkey = o.o_orderkey
        |  JOIN customer c ON o.o_custkey = c.c_custkey
        |  JOIN supplier s ON l.l_suppkey = s.s_suppkey
        |  WHERE l.l_extendedprice > 104500),
        |e AS (SELECT src, dst FROM e0 WHERE src <> dst),
        |v AS (SELECT src AS id FROM e UNION SELECT dst FROM e),
        |rec AS (
        |  WITH RECURSIVE walk(s, v2, d) AS (
        |    SELECT id, id, 0 FROM v
        |    UNION
        |    SELECT w.s, e.dst, w.d + 1 FROM walk w JOIN e ON w.v2 = e.src
        |    WHERE w.d < 8)
        |  SELECT s, v2, min(d) AS dist FROM walk GROUP BY 1, 2),
        |cl AS (
        |  SELECT s AS id, CAST(count(*) - 1 AS DOUBLE) AS r,
        |    CAST(sum(dist) AS DOUBLE) AS sd
        |  FROM rec GROUP BY 1)
        |SELECT id, CASE WHEN sd > 0 THEN round(r / sd, 6) ELSE 0.0 END
        |  AS closeness
        |FROM cl""".stripMargin) { (s, d) =>
      val t = Tables(s, d)
      val e = t.lineitem.filter(col("l_extendedprice") > 104500)
        .join(t.orders, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(t.customer.select("c_custkey", "c_nationkey")),
          col("o_custkey") === col("c_custkey"))
        .join(broadcast(t.supplier.select("s_suppkey", "s_nationkey")),
          col("l_suppkey") === col("s_suppkey"))
        .select(col("s_nationkey").as("src"), col("c_nationkey").as("dst"))
        .filter(col("src") =!= col("dst"))
        .distinct()
        .localCheckpoint()
      val v = e.select(col("src").as("id"))
        .union(e.select(col("dst").as("id"))).distinct()
      var dist = v.select(col("id").as("s"), col("id").as("v2"),
        lit(0).as("d")).localCheckpoint()
      for (i <- 1 to 8) {
        val expanded = dist.join(e, col("v2") === col("src"))
          .select(col("s"), col("dst").as("v2"), (col("d") + 1).as("d"))
        val next = dist.union(expanded)
          .groupBy("s", "v2").agg(min(col("d")).as("d"))
        dist = if (i % 2 == 0 || i == 8) next.localCheckpoint() else next
      }
      dist.groupBy(col("s").as("id"))
        .agg((count(lit(1)) - 1).cast("double").as("r"),
          sum(col("d")).cast("double").as("sd"))
        .select(col("id"),
          when(col("sd") > 0, round(col("r") / col("sd"), 6))
            .otherwise(lit(0.0)).as("closeness"))
    },

    // PCA TOP COMPONENT by distributed power iteration: 5 rounds of
    // x→(x·v)→Σx(x·v), the two corpus passes per round being (a) an
    // IN-ROW dot product against the broadcast 64-double direction (no
    // explode crosses the wire) and (b) one posexplode aggregate whose
    // map-side partials bound the shuffle at dims×partitions. The 64-row
    // mean/direction frames collect to the driver between rounds — KB
    // planning barriers, the pinned-training-artifact pattern. Both
    // engines round projections and direction components to 9dp every
    // round, so float-sum order differences cannot accumulate; the sign
    // is fixed by dimension 0's loading.
    QDef("x_embed_pca", PcaSql) { (s, d) =>
      val emb = Tables(s, d).embeddings.select("vec_id", "embedding")
      val muRows = emb.select(posexplode(col("embedding")))
        .groupBy("pos").agg(avg(col("col")).as("m"))
        .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
      val dims = muRows.size
      val muLit = array((0 until dims).map(i => lit(muRows(i))): _*)
      val cent = emb.select(col("vec_id"),
          zip_with(col("embedding"), muLit,
            (x, m) => x.cast("double") - m).as("c"))
        .localCheckpoint()
      var v = Array.fill(dims)(0.125)
      for (_ <- 1 to 5) {
        val vLit = array(v.map(lit): _*)
        val proj = cent.withColumn("p",
          round(aggregate(zip_with(col("c"), vLit, (x, y) => x * y),
            lit(0.0), (acc, x) => acc + x), 9))
        val raw = proj.select(posexplode(col("c")), col("p"))
          .groupBy("pos").agg(sum(col("col") * col("p")).as("raw"))
          .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
        val norm = math.sqrt((0 until dims).map(i => raw(i) * raw(i)).sum)
        v = (0 until dims).map(i =>
          BigDecimal(raw(i) / norm)
            .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble).toArray
      }
      val sg = if (v(0) >= 0) 1.0 else -1.0
      val spark = emb.sparkSession
      import spark.implicits._
      v.zipWithIndex
        .map { case (x, i) =>
          (i, BigDecimal(sg * x).setScale(6, BigDecimal.RoundingMode.HALF_UP)
            .toDouble)
        }
        .toSeq.toDF("dim", "loading")
    },

    // ISOTONIC CALIBRATION (pool-adjacent-violators): nondecreasing fit of
    // the order-completion rate over price deciles, via the PAV minimax
    // closed form ŷᵢ = max_{j≤i} min_{k≥i} wavg(r[j..k]) — no sequential
    // pooling loop. Deciles come from the HISTOGRAM-COMPRESSED rank pass
    // (the x_quantile_norm pattern); the minimax triple join runs on the
    // 10-row bucket frame only. Outcome sums are 0/1 doubles — exact in
    // float arithmetic, so no rounding snaps are needed before the final
    // 6dp release.
    QDef("x_isotonic",
      IsotonicSql) { (s, d) =>
      val h = Tables(s, d).orders.select(col("o_totalprice").as("v"),
        when(col("o_orderstatus") === "F", 1.0).otherwise(0.0).as("y"))
      val hist = h.groupBy("v").agg(count(lit(1)).as("c"), sum(col("y")).as("s"))
      // decile assignment from the binned two-level prefix (BinnedRank):
      // the unpartitioned window runs over ≤500 price bins, and the
      // distinct-price frame sorts in per-bin slices
      val b = graft.ops.BinnedRank.belowAndN(hist, Seq.empty,
          floor(col("v") / lit(1000)).cast("bigint"), Seq(col("v")), col("c"))
        .select(least(lit(9), floor(col("below") * 10.0 / col("n")).cast("int"))
          .as("bucket"), col("c"), col("s"))
      val bs = b.groupBy("bucket")
        .agg(sum(col("c")).as("n_b"), sum(col("s")).as("pos"))
      val wB = Window.orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, 0)
      val pre = bs
        .withColumn("cn", sum(col("n_b")).over(wB))
        .withColumn("cp", sum(col("pos")).over(wB))
        .localCheckpoint() // 10-row calibration frame; every step below is KB
      val pre0 = pre.select(col("bucket"), col("cn"), col("cp"))
        .unionByName(s.range(1).select(lit(-1).cast("int").as("bucket"),
          lit(0L).as("cn"), lit(0.0).as("cp")))
      val avgs = pre0.as("j").join(pre0.as("k"),
          col("j.bucket") < col("k.bucket"))
        .select((col("j.bucket") + 1).as("j"), col("k.bucket").as("k"),
          ((col("k.cp") - col("j.cp")) / (col("k.cn") - col("j.cn"))).as("a"))
      val mins = avgs.join(pre.select(col("bucket").as("i")),
          col("j") <= col("i") && col("k") >= col("i"))
        .groupBy("j", "i").agg(min(col("a")).as("mn"))
      val fit = mins.groupBy("i").agg(max(col("mn")).as("iso"))
      fit.join(bs, col("i") === col("bucket"))
        .select(col("i").as("bucket"), col("n_b"),
          round(col("pos") / col("n_b"), 6).as("raw_rate"),
          round(col("iso"), 6).as("iso_rate"))
    },

    // GINI COEFFICIENT of customer spend per market segment (Lorenz-rank
    // form G = 2·Σ rank·x / (n·Σx) − (n+1)/n). Lorenz ranks via
    // [[graft.ops.BinnedRank]]: bin offset (spend-domain-bounded frame) +
    // within-(segment, bin) row_number — no task ever sorts a whole
    // segment's customers. Ties in spend break by custkey — Σ rank·x is
    // tie-order-invariant, so the choice only pins determinism. Spend sums
    // are exact-in-double cents.
    QDef("x_gini",
      GiniSql) { (s, d) =>
      val t = Tables(s, d)
      val spend = t.customer
        .join(t.orders, col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_mktsegment").as("g"), col("c_custkey"))
        .agg(sum(col("o_totalprice")).as("x"))
      val ranked = graft.ops.BinnedRank.belowAndN(spend, Seq("g"),
          floor(col("x") / lit(5000)).cast("bigint"),
          Seq(col("x"), col("c_custkey")), lit(1L))
        .withColumn("r", col("below") + lit(1L))
      ranked.groupBy(col("g").as("c_mktsegment"))
        .agg(count(lit(1)).as("n_customers"),
          round(lit(2.0) * sum(col("r") * col("x"))
            / (count(lit(1)) * sum(col("x")))
            - (count(lit(1)) + lit(1.0)) / count(lit(1)), 6).as("gini"))
    },

    // ZIPF FIT: log-log OLS slope of the rank-frequency curve. The corpus
    // contributes one word-count aggregate; vocabulary ranks (c DESC, word)
    // are then assembled WITHOUT a global vocab sort (vocab grows with the
    // corpus — Heaps' law) via two BinnedRank passes:
    //  level A  r0(c) = words with count > c, from the count histogram
    //           binned by -⌊log2 c⌋ (≤ ~40 bins; a log-bin holds
    //           ≤ min(2^k, vocab·2^-k) distinct counts — sub-√vocab each);
    //  level B  tie order within c, binned by the word's 2-char prefix
    //           (charset²-bounded) — the c=1 hapax mass spreads over
    //           (1, prefix) partitions instead of one tie run.
    // rnk = r0 + within-tie rank; the regression is then one map-side
    // combined regr_slope/regr_r2 aggregate in both engines.
    QDef("x_text_zipf",
      """WITH toks AS (
        |  SELECT unnest(string_split(text, ' ')) AS word FROM documents),
        |wf AS (
        |  SELECT word, CAST(count(*) AS DOUBLE) AS c
        |  FROM toks WHERE word <> '' GROUP BY 1),
        |r AS (
        |  SELECT c, row_number() OVER (ORDER BY c DESC, word) AS rnk FROM wf)
        |SELECT CAST(count(*) AS BIGINT) AS vocab,
        |  round(regr_slope(ln(c), ln(rnk)), 6) AS zipf_slope,
        |  round(regr_r2(ln(c), ln(rnk)), 6) AS fit_r2
        |FROM r""".stripMargin) { (s, d) =>
      val wf = Tables(s, d).documents
        .select(explode(split(col("text"), " ")).as("word"))
        .filter(col("word") =!= "")
        .groupBy("word").agg(count(lit(1)).cast("double").as("c"))
      val ch = wf.groupBy("c").agg(count(lit(1)).as("m"))
      val r0 = graft.ops.BinnedRank.belowAndN(ch, Seq.empty,
          (-floor(log2(col("c")))).cast("bigint"), Seq(col("c").desc), col("m"))
        .select(col("c"), col("below").as("r0"))
      // No forced broadcast on r0: distinct counts grow ~√(corpus tokens)
      // under Zipf, so at 100 TB the histogram is millions of rows — let
      // AQE pick broadcast while it is small and hash-join `c` once not.
      val ranked = graft.ops.BinnedRank.belowAndN(wf, Seq("c"),
          substring(col("word"), 1, 2), Seq(col("word")), lit(1L))
        .join(r0, "c")
        .withColumn("rnk", col("r0") + col("below") + lit(1L))
      ranked.agg(count(lit(1)).as("vocab"),
        round(regr_slope(log(col("c")), log(col("rnk"))), 6).as("zipf_slope"),
        round(regr_r2(log(col("c")), log(col("rnk"))), 6).as("fit_r2"))
    },

    // CENTROID-CLASSIFIER CONFUSION MATRIX: per-label centroids (one
    // partial-agg'd posexplode pass, label×dim rows) collect to the driver
    // as broadcast literals (KB training artifact), then assignment is an
    // IN-ROW argmin over label-count distance structs — array_min's
    // (dist, label) struct order ties to the smaller label, mirroring the
    // oracle's ORDER BY dist, cand. Distances snap to 9dp in both engines
    // (in-row ascending fold vs the oracle's join-sum order).
    QDef("x_embed_confusion",
      """WITH e AS (
        |  SELECT vec_id, label, unnest(embedding) AS x,
        |    generate_subscripts(embedding, 1) AS dim
        |  FROM embeddings),
        |cent AS (
        |  SELECT label AS cl, dim, round(avg(x), 6) AS cv FROM e GROUP BY 1, 2),
        |dists AS (
        |  SELECT e.vec_id, e.label AS true_label, c.cl AS cand,
        |    round(sum((CAST(e.x AS DOUBLE) - c.cv)
        |      * (CAST(e.x AS DOUBLE) - c.cv)), 9) AS dist
        |  FROM e JOIN cent c ON e.dim = c.dim
        |  GROUP BY 1, 2, 3),
        |pred AS (
        |  SELECT vec_id, true_label, cand AS pred_label,
        |    row_number() OVER (PARTITION BY vec_id ORDER BY dist, cand) AS rn
        |  FROM dists)
        |SELECT true_label, pred_label, CAST(count(*) AS BIGINT) AS cnt
        |FROM pred WHERE rn = 1 GROUP BY 1, 2""".stripMargin) { (s, d) =>
      val emb = Tables(s, d).embeddings
      val centRows = emb.select(col("label"), posexplode(col("embedding")))
        .groupBy("label", "pos").agg(round(avg(col("col")), 6).as("cv"))
        .collect()
      val dims = centRows.map(_.getInt(1)).max + 1
      val cents = centRows.groupBy(_.getInt(0)).map { case (l, rows) =>
        l -> {
          val a = new Array[Double](dims)
          rows.foreach(r => a(r.getInt(1)) = r.getDouble(2))
          a
        }
      }.toSeq.sortBy(_._1)
      val candidates = array(cents.map { case (l, c) =>
        val cLit = array(c.map(lit): _*)
        struct(
          round(aggregate(zip_with(col("embedding"), cLit,
              (x, cc) => (x.cast("double") - cc) * (x.cast("double") - cc)),
            lit(0.0), (acc, x) => acc + x), 9).as("dist"),
          lit(l).as("cand"))
      }: _*)
      emb.select(col("label").as("true_label"),
          array_min(candidates).getField("cand").as("pred_label"))
        .groupBy("true_label", "pred_label")
        .agg(count(lit(1)).as("cnt"))
    },

    // CHANGEPOINT (binary segmentation, one split): the day that maximizes
    // the within-segment variance reduction of the daily mean-value
    // series, from prefix sums over the calendar-bounded frame — cumsum
    // runs in the sequential window order in BOTH engines, so the doubles
    // agree exactly until the final rounding. Complements CUSUM (which
    // detects drift against a known baseline; this LOCATES the break).
    QDef("x_changepoint", ChangepointSql) { (s, d) =>
      val daily = Tables(s, d).events
        .groupBy(to_date(col("ts")).as("d"))
        .agg(round(avg(col("value")), 6).as("v"))
      val ord = Window.orderBy("d")
      val cum = ord.rowsBetween(Window.unboundedPreceding, 0)
      val all = Window.partitionBy(lit(1))
      val pre = daily
        .withColumn("i", row_number().over(ord))
        .withColumn("s", sum(col("v")).over(cum))
        .withColumn("q", sum(col("v") * col("v")).over(cum))
        .withColumn("n", count(lit(1)).over(all))
        .withColumn("st", sum(col("v")).over(all))
        .withColumn("qt", sum(col("v") * col("v")).over(all))
      val cand = pre.filter(col("i") < col("n"))
        .select(col("d"),
          ((col("qt") - col("st") * col("st") / col("n"))
            - ((col("q") - col("s") * col("s") / col("i"))
              + ((col("qt") - col("q"))
                - (col("st") - col("s")) * (col("st") - col("s"))
                  / (col("n") - col("i"))))).as("red"),
          (col("s") / col("i")).as("mean_left"),
          ((col("st") - col("s")) / (col("n") - col("i"))).as("mean_right"))
      cand.withColumn("rk",
          row_number().over(Window.orderBy(col("red").desc, col("d"))))
        .filter(col("rk") === 1)
        .select(col("d").as("last_day_left"),
          round(col("mean_left"), 6).as("mean_left"),
          round(col("mean_right"), 6).as("mean_right"),
          round(col("red"), 6).as("var_reduction"))
    },

    QDef("x_sql_changepoint", ChangepointSql) { (s, d) =>
      SqlSurface.viewed(s, d, "events")
      s.sql(ChangepointSql)
    },

    // DEGREE ASSORTATIVITY of the sparse trade graph: Pearson correlation
    // of endpoint degrees over the symmetrized edge list — do high-degree
    // nations trade with high-degree nations? Degrees frame is dim-sized;
    // the corpus cost is the one edge-derivation pass.
    QDef("x_graph_assortativity", AssortSql) { (s, d) =>
      val t = Tables(s, d)
      // top-60 edges by trade volume: a SCALE-STABLE sparsification — a
      // fixed price threshold saturates to the complete graph as the
      // corpus grows (zero degree variance → corr divides by zero); the
      // rank cut keeps the density, and the window runs on the
      // dim²-bounded pair-count frame
      val pc = t.lineitem.filter(col("l_extendedprice") > 100000)
        .join(t.orders, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(t.customer.select("c_custkey", "c_nationkey")),
          col("o_custkey") === col("c_custkey"))
        .join(broadcast(t.supplier.select("s_suppkey", "s_nationkey")),
          col("l_suppkey") === col("s_suppkey"))
        .filter(col("s_nationkey") =!= col("c_nationkey"))
        .groupBy(col("s_nationkey").as("src"), col("c_nationkey").as("dst"))
        .agg(count(lit(1)).as("w"))
      val e0 = pc.withColumn("rk", row_number().over(
          Window.orderBy(col("w").desc, col("src"), col("dst"))))
        .filter(col("rk") <= 60)
        .select("src", "dst")
      val und = e0.select(col("src").as("u"), col("dst").as("v"))
        .union(e0.select(col("dst"), col("src"))).distinct()
      val deg = und.groupBy("u").agg(count(lit(1)).cast("double").as("k"))
      und
        .join(deg.select(col("u").as("_u"), col("k").as("ku")), col("u") === col("_u"))
        .join(deg.select(col("u").as("_v"), col("k").as("kv")), col("v") === col("_v"))
        .agg(round(corr(col("ku"), col("kv")), 6).as("assortativity"),
          count(lit(1)).as("m_directed"))
    },

    QDef("x_sql_assortativity", AssortSql) { (s, d) =>
      SqlSurface.viewed(s, d, "lineitem", "orders", "customer", "supplier")
      s.sql(AssortSql)
    },

    // Portable-text twins of the isotonic and Gini queries (e-notation
    // literals keep Spark SQL's types DOUBLE — a decimal literal would
    // come out DECIMAL and fail the driver's dtype gate).
    QDef("x_sql_isotonic", IsotonicSql) { (s, d) =>
      SqlSurface.viewed(s, d, "orders")
      s.sql(IsotonicSql)
    },

    QDef("x_sql_gini", GiniSql) { (s, d) =>
      SqlSurface.viewed(s, d, "customer", "orders")
      s.sql(GiniSql)
    }
  )
}
