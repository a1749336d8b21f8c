package graft.queries

import org.apache.spark.sql.functions._

import graft.{QDef, Tables}
import graft.llm.{Sq8, TextOps}

/** Round-5 additions: ranked retrieval (BM25), entropy quality scoring,
  * semi/anti join forms, scalar int8 embedding quantization, windowed EWMA,
  * grouping sets, and the public typed-Aggregator extension point. */
object R5Ops {

  /** Shared CTE: exploded embeddings (vec_id, j, e) — see StarExt. */
  private val Ee = StarExt.EmbExpl

  /** EWMA geometry: last `EwK` events per user, decay `EwD` per step.
    * Shared with the streaming twin (`x_stream_ewma`, R9Ops), which
    * replays the same FIR arithmetic in its keyed state. */
  private[queries] val EwK = 8
  private[queries] val EwD = 0.7

  /** The x_ewma oracle text — also the oracle of its streaming twin. */
  private[queries] val EwmaSql: String = {
    val num = (1 until EwK).map(k =>
      s"coalesce(lag(value, $k) OVER w, 0) * power($EwD, $k)")
      .mkString("value + ", " + ", "")
    val den = (1 until EwK).map(k =>
      s"CASE WHEN lag(value, $k) OVER w IS NOT NULL THEN power($EwD, $k) ELSE 0 END")
      .mkString("1 + ", " + ", "")
    s"""SELECT event_id, user_id, round(($num) / ($den), 6) AS ewma
       |FROM events
       |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)""".stripMargin
  }

  val defs: Seq[QDef] = Seq(

    // BM25 top-10 against fixed probe terms: tf is an in-row token count on
    // the scan (NO explode — contrast x_text_tfidf), corpus stats (N,
    // avgdl, df) are ONE broadcast 1-row aggregate, top-k is a bounded
    // heap. The relevance filter of a targeted-corpus pipeline.
    QDef("x_text_bm25",
      """WITH base AS (
        |  SELECT doc_id,
        |    CAST(len(list_filter(string_split(text, ' '), x -> x <> '')) AS DOUBLE) AS dl,
        |    CAST(len(list_filter(string_split(text, ' '), x -> x = 'spark')) AS DOUBLE) AS tf0,
        |    CAST(len(list_filter(string_split(text, ' '), x -> x = 'window')) AS DOUBLE) AS tf1,
        |    CAST(len(list_filter(string_split(text, ' '), x -> x = 'hash')) AS DOUBLE) AS tf2
        |  FROM documents),
        |stats AS (
        |  SELECT CAST(count(*) AS DOUBLE) AS n_docs, avg(dl) AS avgdl,
        |    sum(CASE WHEN tf0 > 0 THEN 1.0 ELSE 0.0 END) AS df0,
        |    sum(CASE WHEN tf1 > 0 THEN 1.0 ELSE 0.0 END) AS df1,
        |    sum(CASE WHEN tf2 > 0 THEN 1.0 ELSE 0.0 END) AS df2
        |  FROM base),
        |scored AS (
        |  SELECT doc_id AS id, round(
        |      ln(1 + (n_docs - df0 + 0.5) / (df0 + 0.5))
        |        * (tf0 * 2.2) / (tf0 + 1.2 * (0.25 + 0.75 * dl / avgdl))
        |    + ln(1 + (n_docs - df1 + 0.5) / (df1 + 0.5))
        |        * (tf1 * 2.2) / (tf1 + 1.2 * (0.25 + 0.75 * dl / avgdl))
        |    + ln(1 + (n_docs - df2 + 0.5) / (df2 + 0.5))
        |        * (tf2 * 2.2) / (tf2 + 1.2 * (0.25 + 0.75 * dl / avgdl)), 6) AS score
        |  FROM base, stats)
        |SELECT id, score,
        |  CAST(row_number() OVER (ORDER BY score DESC, id) AS INT) AS rank
        |FROM scored WHERE score > 0
        |ORDER BY score DESC, id LIMIT 10""".stripMargin) { (s, d) =>
      TextOps.bm25TopK(Tables(s, d).documents, "doc_id", "text",
        Seq("spark", "window", "hash"), k = 10)
    },

    // Character-entropy quality score per document — the gibberish /
    // boilerplate detector. Entirely in-row (one log per DISTINCT char),
    // rides the scan with zero shuffle.
    QDef("x_text_entropy",
      """WITH ch AS (
        |  SELECT doc_id, unnest(string_split(text, '')) AS c FROM documents),
        |cc AS (
        |  SELECT doc_id, c, CAST(count(*) AS DOUBLE) AS cnt
        |  FROM ch GROUP BY 1, 2),
        |s AS (
        |  SELECT doc_id, sum(cnt * ln(cnt)) AS sclnc FROM cc GROUP BY 1)
        |SELECT d.doc_id,
        |  CASE WHEN len(d.text) > 0 THEN
        |    round((ln(len(d.text)) - coalesce(s.sclnc, 0) / len(d.text))
        |      / ln(2), 6)
        |  ELSE 0.0 END AS entropy
        |FROM documents d LEFT JOIN s ON s.doc_id = d.doc_id""".stripMargin) { (s, d) =>
      Tables(s, d).documents
        .select(col("doc_id"), TextOps.charEntropy(col("text")).as("entropy"))
    },

    // LEFT ANTI join — customers with NO high-value order, per nation (the
    // NOT EXISTS form; x_dedup_survivors uses the same join type on ids).
    // Anti joins shuffle only the keys; at scale the build side is the
    // filtered orders projection, never whole rows.
    QDef("x_anti_join",
      """SELECT c_nationkey, count(*) AS n_cust FROM customer c
        |WHERE NOT EXISTS (SELECT 1 FROM orders o
        |  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000)
        |GROUP BY 1""".stripMargin) { (s, d) =>
      val t = Tables(s, d)
      t.customer.join(
          t.orders.filter(col("o_totalprice") > 400000)
            .select(col("o_custkey").as("c_custkey")),
          Seq("c_custkey"), "left_anti")
        .groupBy("c_nationkey").agg(count(lit(1)).as("n_cust"))
    },

    // LEFT SEMI join — the EXISTS twin of x_anti_join (membership without
    // multiplying rows: a plain inner join would duplicate customers per
    // qualifying order and need a re-distinct).
    QDef("x_semi_join",
      """SELECT c_nationkey, count(*) AS n_cust FROM customer c
        |WHERE EXISTS (SELECT 1 FROM orders o
        |  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000)
        |GROUP BY 1""".stripMargin) { (s, d) =>
      val t = Tables(s, d)
      t.customer.join(
          t.orders.filter(col("o_totalprice") > 400000)
            .select(col("o_custkey").as("c_custkey")),
          Seq("c_custkey"), "left_semi")
        .groupBy("c_nationkey").agg(count(lit(1)).as("n_cust"))
    },

    // Scalar int8 quantization audit: one (qmin, qmax) range aggregate,
    // in-row encode/reconstruct, global error stats. The training-free 4×
    // compression tier below PQ; max error ≤ step/2 by construction,
    // surfaced as a checkable boolean.
    QDef("x_sq8_error",
      s"""WITH $Ee,
         |r AS (SELECT min(e) AS qmin, max(e) AS qmax FROM ee),
         |rec AS (
         |  SELECT e, qmin + round((e - qmin) / (qmax - qmin) * 255)
         |      * (qmax - qmin) / 255.0 AS recon,
         |    (qmax - qmin) / 255.0 AS step
         |  FROM ee, r)
         |SELECT count(*) AS n_values,
         |  round(avg(abs(e - recon)), 8) AS avg_abs_err,
         |  round(max(abs(e - recon)), 8) AS max_abs_err,
         |  max(abs(e - recon)) <= any_value(step) / 2 + 1e-12 AS within_half_step
         |FROM rec""".stripMargin) { (s, d) =>
      Sq8.sqError(Tables(s, d).embeddings, "embedding")
    },

    // Asymmetric SQ8 top-3: exact query vectors vs the reconstructed
    // corpus (the faiss SQ8/ADC search posture) — brute-force baseline
    // shape, per-query bounded top-k.
    QDef("x_sq8_topk",
      s"""WITH $Ee,
         |r AS (SELECT min(e) AS qmin, max(e) AS qmax FROM ee),
         |rec AS (
         |  SELECT vec_id, j, qmin + round((e - qmin) / (qmax - qmin) * 255)
         |      * (qmax - qmin) / 255.0 AS recon
         |  FROM ee, r),
         |d2 AS (
         |  SELECT q.vec_id AS qid, c.vec_id AS cid,
         |    round(sum((q.e - c.recon) * (q.e - c.recon)), 6) AS d2
         |  FROM ee q JOIN rec c ON c.j = q.j
         |  WHERE q.vec_id < 5 AND c.vec_id <> q.vec_id
         |  GROUP BY 1, 2)
         |SELECT qid, cid, d2, rank FROM (
         |  SELECT qid, cid, d2, CAST(row_number() OVER (
         |    PARTITION BY qid ORDER BY d2, cid) AS INT) AS rank FROM d2)
         |WHERE rank <= 3""".stripMargin) { (s, d) =>
      val emb = Tables(s, d).embeddings
      Sq8.sqTopK(emb.filter(col("vec_id") < 5), emb, "vec_id", "embedding", 3)
    },

    // Windowed EWMA (8-tap, decay 0.7) of event values per user — the
    // bounded-memory form of exponential smoothing: a fixed FIR of lag()
    // taps, renormalized over the taps that exist, so no running state and
    // no unbounded (1-α)^-t arithmetic. One shuffle on the partition key.
    QDef("x_ewma", EwmaSql) { (s, d) =>
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      val num = (1 until EwK).map(k =>
          coalesce(lag(col("value"), k).over(w), lit(0.0)) * math.pow(EwD, k))
        .foldLeft(col("value"))(_ + _)
      val den = (1 until EwK).map(k =>
          when(lag(col("value"), k).over(w).isNotNull, math.pow(EwD, k))
            .otherwise(0.0))
        .foldLeft(lit(1.0))(_ + _)
      Tables(s, d).events
        .select(col("event_id"), col("user_id"), round(num / den, 6).as("ewma"))
    },

    // GROUPING SETS with grouping_id — three rollup levels in ONE pass
    // over the fact (Spark plans a single Expand + aggregate, not three
    // scans), the form report pipelines use when ROLLUP's prefix lattice
    // isn't the set they want.
    QDef("x_grouping_sets",
      """SELECT l_returnflag, l_linestatus,
        |  CAST(sum(l_quantity) AS DOUBLE) AS sum_qty, count(*) AS n,
        |  CAST(GROUPING(l_returnflag, l_linestatus) AS INT) AS gid
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus),
        |  (l_returnflag), ())""".stripMargin) { (s, d) =>
      Tables(s, d).lineitem
        .groupingSets(
          Seq(Seq(col("l_returnflag"), col("l_linestatus")),
            Seq(col("l_returnflag")), Seq()),
          col("l_returnflag"), col("l_linestatus"))
        .agg(sum("l_quantity").as("sum_qty"), count(lit(1)).as("n"),
          grouping_id().cast("int").as("gid"))
    },

    // PIVOT through the SQL surface (Spark's SQL PIVOT clause — parser →
    // the same single-pass pivot aggregate as the Dataset API's
    // x_pivot, which shares this oracle's shape).
    QDef("x_sql_pivot",
      """SELECT user_id,
        |  CAST(count(CASE WHEN event_type = 'click' THEN 1 END) AS BIGINT)
        |    AS click,
        |  CAST(count(CASE WHEN event_type = 'view' THEN 1 END) AS BIGINT)
        |    AS "view",
        |  CAST(count(CASE WHEN event_type = 'purchase' THEN 1 END) AS BIGINT)
        |    AS purchase
        |FROM events GROUP BY 1""".stripMargin) { (s, d) =>
      SqlSurface.viewed(s, d, "events")
      s.sql("""
        SELECT user_id,
          coalesce(click, 0L) AS click, coalesce(view, 0L) AS view,
          coalesce(purchase, 0L) AS purchase
        FROM (SELECT user_id, event_type FROM events)
        PIVOT (count(1) FOR event_type IN ('click' click, 'view' view,
          'purchase' purchase))""")
    },

    // LATERAL correlated subquery (SQL surface): top-2 customers per
    // nation through a per-row subquery with ORDER BY + LIMIT — Catalyst
    // DECORRELATES it into a ranked window join (never per-row
    // re-execution, same as x_sql_correlated's scalar form).
    QDef("x_sql_lateral",
      """SELECT n.n_name, c.c_name, c.c_acctbal
        |FROM nation n, LATERAL (
        |  SELECT c_name, c_acctbal FROM customer
        |  WHERE c_nationkey = n.n_nationkey
        |  ORDER BY c_acctbal DESC, c_name LIMIT 2) c""".stripMargin) { (s, d) =>
      SqlSurface.viewed(s, d, "nation", "customer")
      s.sql("""
        SELECT n.n_name, c.c_name, c.c_acctbal
        FROM nation n, LATERAL (
          SELECT c_name, c_acctbal FROM customer
          WHERE c_nationkey = n.n_nationkey
          ORDER BY c_acctbal DESC, c_name LIMIT 2) c""")
    },

    // UNPIVOT through the SQL surface (Spark's SQL UNPIVOT clause — the
    // Dataset-API twin is c14_unpivot's melt; same Expand-based plan).
    QDef("x_sql_unpivot",
      """WITH a AS (
        |  SELECT n.n_name, avg(l.l_quantity) AS avg_qty,
        |    round(avg(l.l_extendedprice), 4) AS avg_price
        |  FROM lineitem l
        |  JOIN supplier s ON l.l_suppkey = s.s_suppkey
        |  JOIN nation n ON s.s_nationkey = n.n_nationkey
        |  GROUP BY n.n_name)
        |SELECT n_name, 'avg_qty' AS metric, avg_qty AS value FROM a
        |UNION ALL
        |SELECT n_name, 'avg_price' AS metric, avg_price AS value FROM a""".stripMargin) { (s, d) =>
      SqlSurface.viewed(s, d, "lineitem", "supplier", "nation")
      s.sql("""
        SELECT n_name, metric, value FROM (
          SELECT n.n_name, avg(l.l_quantity) AS avg_qty,
            round(avg(l.l_extendedprice), 4) AS avg_price
          FROM lineitem l
          JOIN supplier s ON l.l_suppkey = s.s_suppkey
          JOIN nation n ON s.s_nationkey = n.n_nationkey
          GROUP BY n.n_name)
        UNPIVOT (value FOR metric IN (avg_qty, avg_price))""")
    },

    // GROUPING SETS through the SQL surface (parser → Expand), same
    // oracle as the Dataset-API x_grouping_sets — both interfaces held to
    // one ground truth.
    QDef("x_sql_grouping_sets",
      """SELECT l_returnflag, l_linestatus,
        |  CAST(sum(l_quantity) AS DOUBLE) AS sum_qty, count(*) AS n,
        |  CAST(GROUPING(l_returnflag, l_linestatus) AS INT) AS gid
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus),
        |  (l_returnflag), ())""".stripMargin) { (s, d) =>
      SqlSurface.viewed(s, d, "lineitem")
      s.sql("""
        SELECT l_returnflag, l_linestatus,
          CAST(sum(l_quantity) AS DOUBLE) AS sum_qty, count(*) AS n,
          CAST(grouping_id(l_returnflag, l_linestatus) AS INT) AS gid
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag, l_linestatus),
          (l_returnflag), ())""")
    },

    // NULL-SAFE equi-join (<=> / IS NOT DISTINCT FROM): the NULL group
    // must MATCH its twin, not vanish — the semantics a plain `=` inner
    // join silently breaks. Null key synthesized with nullif (this corpus
    // has no natural null keys); still a hash-joinable equi-key, so the
    // plan stays BroadcastHashJoin/SMJ, not a nested loop.
    QDef("x_nullsafe_join",
      """WITH a AS (SELECT nullif(event_type, 'error') AS k, count(*) AS cnt
        |  FROM events GROUP BY 1),
        |b AS (SELECT nullif(event_type, 'error') AS k,
        |    CAST(round(sum(value), 4) AS DOUBLE) AS sv
        |  FROM events GROUP BY 1)
        |SELECT a.k, a.cnt, b.sv FROM a JOIN b
        |  ON a.k IS NOT DISTINCT FROM b.k""".stripMargin) { (s, d) =>
      val ev = Tables(s, d).events
        .withColumn("k", nullif(col("event_type"), lit("error")))
      val a = ev.groupBy("k").agg(count(lit(1)).as("cnt"))
      val b = ev.groupBy(col("k").as("bk"))
        .agg(round(sum("value"), 4).as("sv"))
      a.join(b, col("k") <=> col("bk")).select("k", "cnt", "sv")
    },

    // Correlated scalar subquery through the full SQL surface — Catalyst
    // DECORRELATES it into a left outer aggregate join (one shuffle),
    // never a per-row re-execution; the Dataset-API twin of this shape is
    // f2_gt_scalar_decorrelated.
    QDef("x_sql_correlated",
      """SELECT o_orderkey, o_totalprice,
        |  (SELECT max(l_quantity) FROM lineitem l
        |   WHERE l.l_orderkey = o.o_orderkey) AS max_qty
        |FROM orders o WHERE o_totalprice > 400000""".stripMargin) { (s, d) =>
      SqlSurface.viewed(s, d, "orders", "lineitem")
      s.sql("""
        SELECT o_orderkey, o_totalprice,
          (SELECT max(l_quantity) FROM lineitem l
           WHERE l.l_orderkey = o.o_orderkey) AS max_qty
        FROM orders o WHERE o_totalprice > 400000""")
    },

    // K-fold assignment (cross-validation): fold = hash(id) mod k — the
    // scan-local, join-free split contract of x_split_assign extended to
    // folds; reproducible across runs/clusters/corpus growth.
    QDef("x_split_kfold",
      s"""SELECT CAST(${graft.llm.Sampling.hashBucketSql("doc_id")} % 5 AS INT) AS fold,
         |  count(*) AS n FROM documents GROUP BY 1""".stripMargin) { (s, d) =>
      graft.llm.Sampling.kFold(Tables(s, d).documents, "doc_id", 5)
        .groupBy("fold").agg(count(lit(1)).as("n"))
    },

    // Class-balanced oversampling: minority labels replicated to the
    // majority count (integer-ratio). One broadcast counts frame, map-side
    // explode — the corpus never shuffles.
    QDef("x_sample_balance",
      """WITH c AS (SELECT label, count(*) AS n_before FROM embeddings GROUP BY 1),
        |m AS (SELECT max(n_before) AS mx FROM c)
        |SELECT label, n_before,
        |  CAST(ceil(mx / n_before) AS BIGINT) AS n_copies,
        |  n_before * CAST(ceil(mx / n_before) AS BIGINT) AS n_after
        |FROM c, m""".stripMargin) { (s, d) =>
      graft.llm.Sampling.balanceClasses(Tables(s, d).embeddings, "label")
        .groupBy("label")
        .agg(countDistinct(col("vec_id")).as("n_before"),
          max(col("copy")).as("n_copies"),
          count(lit(1)).as("n_after"))
    },

    // Winsorization: clamp a measure at per-group exact p01/p99 — the
    // outlier-robust normalization a feature pipeline runs before training.
    // Group stats are a broadcast frame glued onto the scan (same shape as
    // x_normalize); percentiles rounded BEFORE clamping so the boundary
    // comparisons are engine-stable.
    QDef("x_winsorize",
      """WITH st AS (
        |  SELECT o_orderpriority,
        |    round(quantile_cont(o_totalprice, 0.01), 6) AS p01,
        |    round(quantile_cont(o_totalprice, 0.99), 6) AS p99
        |  FROM orders GROUP BY 1)
        |SELECT o.o_orderpriority, st.p01, st.p99,
        |  round(avg(least(greatest(o.o_totalprice, st.p01), st.p99)), 4)
        |    AS avg_winsorized,
        |  CAST(sum(CASE WHEN o.o_totalprice < st.p01
        |    OR o.o_totalprice > st.p99 THEN 1 ELSE 0 END) AS BIGINT) AS n_clamped
        |FROM orders o JOIN st USING (o_orderpriority)
        |GROUP BY 1, 2, 3""".stripMargin) { (s, d) =>
      val o = Tables(s, d).orders
      val st = o.groupBy("o_orderpriority").agg(
        round(expr("percentile(o_totalprice, 0.01)"), 6).as("p01"),
        round(expr("percentile(o_totalprice, 0.99)"), 6).as("p99"))
      o.join(broadcast(st), "o_orderpriority")
        .groupBy("o_orderpriority", "p01", "p99")
        .agg(
          round(avg(least(greatest(col("o_totalprice"), col("p01")), col("p99"))), 4)
            .as("avg_winsorized"),
          sum(when(col("o_totalprice") < col("p01")
            || col("o_totalprice") > col("p99"), 1L).otherwise(0L)).as("n_clamped"))
    },

    // K-anonymity audit: quasi-identifier combos with fewer than k members
    // flagged — the re-identification check an anonymized release runs.
    // One partial/final aggregate; the flag is derived arithmetic.
    QDef("x_k_anonymity",
      """SELECT c_nationkey, c_mktsegment, count(*) AS group_size,
        |  count(*) < 10 AS risky
        |FROM customer GROUP BY 1, 2""".stripMargin) { (s, d) =>
      Tables(s, d).customer
        .groupBy("c_nationkey", "c_mktsegment")
        .agg(count(lit(1)).as("group_size"))
        .withColumn("risky", col("group_size") < 10)
    },

    // Geometric mean per event type through the PUBLIC typed-Aggregator
    // extension point (Aggregator + functions.udaf) — log-space buffer, so
    // partial aggregation is a plain commutative merge.
    QDef("x_typed_agg",
      """SELECT event_type,
        |  round(exp(avg(ln(1 + value))), 6) AS geo_mean_1p
        |FROM events GROUP BY 1""".stripMargin) { (s, d) =>
      Tables(s, d).events.groupBy("event_type")
        .agg(round(graft.functions.GeoMeanAggregator.geoMean1p(col("value")), 6)
          .as("geo_mean_1p"))
    }
  )
}
