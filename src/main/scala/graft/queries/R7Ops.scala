package graft.queries

import org.apache.spark.sql.functions._

import graft.{QDef, Tables}
import graft.graph.GraphMetrics
import graft.llm.TextOps

/** Round-7 additions: event-funnel analysis, CDC changelog apply, snapshot
  * diff, PSI distribution-drift, weighted single-source shortest paths,
  * a BPE merge step, reciprocal-rank fusion of two rankers, and exact
  * per-group percentiles — each oracle-paired.
  */
object R7Ops {

  /** BM25 probe-term sets for the two fused rankers ([[TextOps.bm25TopK]]).
    * Both draw from the fixture vocabulary (R5Ops uses set A already). */
  private val TermsA = Seq("spark", "window", "hash")
  private val TermsB = Seq("data", "join", "stream")

  /** DuckDB BM25 scoring for `terms`, matching TextOps.bm25TopK's constants
    * (k1=1.2, b=0.75 — the tf factor `tf·2.2/(tf+1.2·(0.25+0.75·dl/avgdl))`
    * and the +0.5-smoothed idf). Emits tf/df column suffixes from `tag` so
    * two term sets can share one `base`/`stats` pair. */
  private def bm25Tf(terms: Seq[String], tag: String): String =
    terms.zipWithIndex.map { case (t, i) =>
      s"CAST(len(list_filter(string_split(text, ' '), x -> x = '$t')) AS DOUBLE) AS tf$tag$i"
    }.mkString(",\n    ")
  private def bm25Df(terms: Seq[String], tag: String): String =
    terms.indices.map { i =>
      s"sum(CASE WHEN tf$tag$i > 0 THEN 1.0 ELSE 0.0 END) AS df$tag$i"
    }.mkString(",\n    ")
  private def bm25Score(terms: Seq[String], tag: String): String =
    terms.indices.map { i =>
      s"""ln(1 + (n_docs - df$tag$i + 0.5) / (df$tag$i + 0.5))
         |      * (tf$tag$i * 2.2) / (tf$tag$i + 1.2 * (0.25 + 0.75 * dl / avgdl))""".stripMargin
    }.mkString("\n    + ")

  /** The changelog-apply query as portable SQL — shared verbatim by the
    * DuckDB oracle (for both x_cdc_apply and its SQL twin) and the
    * `x_sql_cdc` Spark-SQL run. */
  private[queries] val CdcSql =
    """WITH log AS (
      |  SELECT user_id, event_id, ts, value,
      |    CASE WHEN event_type = 'error' THEN 'D' ELSE 'U' END AS op
      |  FROM events),
      |r AS (
      |  SELECT user_id, value, op,
      |    row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn,
      |    count(*) OVER (PARTITION BY user_id) AS n_ops
      |  FROM log)
      |SELECT user_id, value AS last_value, CAST(n_ops AS BIGINT) AS n_ops
      |FROM r WHERE rn = 1 AND op <> 'D'""".stripMargin

  /** Snapshot-diff as portable SQL — the oracle for `x_snapshot_diff`
    * (DataFrame form) and the whole query for its `x_sql_snapshot_diff`
    * twin. */
  private[queries] val SnapshotDiffSql =
    """WITH v1 AS (SELECT c_custkey AS k, c_acctbal AS bal FROM customer),
      |v2 AS (
      |  SELECT c_custkey AS k,
      |    CASE WHEN c_custkey % 7 = 3 THEN c_acctbal + 100.0
      |         ELSE c_acctbal END AS bal
      |  FROM customer WHERE c_custkey % 11 <> 0
      |  UNION ALL
      |  SELECT c_custkey + 1000000 AS k, c_acctbal - 50.0 AS bal
      |  FROM customer WHERE c_custkey % 13 = 5)
      |SELECT coalesce(v1.k, v2.k) AS k,
      |  CASE WHEN v1.k IS NULL THEN 'added'
      |       WHEN v2.k IS NULL THEN 'removed'
      |       ELSE 'changed' END AS status,
      |  v1.bal AS old_bal, v2.bal AS new_bal
      |FROM v1 FULL OUTER JOIN v2 ON v1.k = v2.k
      |WHERE v1.k IS NULL OR v2.k IS NULL OR v1.bal <> v2.bal""".stripMargin

  /** Binary-heap hierarchy walk + per-depth rollup — portable recursive
    * CTE text shared verbatim by the Spark query and the DuckDB oracle
    * (`CAST(floor(k / 2) AS BIGINT)` instead of the engines' differing
    * integer-division operators). */
  private[queries] val RecursiveSql =
    """WITH RECURSIVE chain(id, depth) AS (
      |  SELECT CAST(1 AS BIGINT) AS id, 0 AS depth
      |  UNION ALL
      |  SELECT c.c_custkey AS id, ch.depth + 1 AS depth
      |  FROM customer c JOIN chain ch
      |    ON CAST(floor(c.c_custkey / 2) AS BIGINT) = ch.id
      |  WHERE c.c_custkey > 1)
      |SELECT depth, count(*) AS n, round(sum(b.c_acctbal), 4) AS bal
      |FROM chain JOIN customer b ON b.c_custkey = chain.id
      |GROUP BY depth""".stripMargin

  /** Unrolled 3-iteration logistic-GD oracle for `x_quality_train` — the
    * DuckDB replay of [[graft.llm.Classifier.trainLogisticHashed]]'s exact
    * integer-nano trajectory (same hashing as the x_feature_hash oracle,
    * rational fast-sigmoid link, BIGINT gradient sums). */
  private val QualityTrainSql: String = {
    def iter(i: Int): String = {
      val prev = s"w${i - 1}"
      s"""s$i AS (
         |  SELECT c.doc_id, CAST(sum(c.cnt * w.wn) AS BIGINT) AS dot
         |  FROM c JOIN $prev w ON w.j = c.j GROUP BY 1),
         |p$i AS (
         |  SELECT doc_id, CAST(floor((0.5 + (dot/1e9) / (2.0*(1.0+abs(dot/1e9))))
         |    * 1e9 + 0.5) AS BIGINT) AS p
         |  FROM s$i),
         |g$i AS (
         |  SELECT c.j, sum((p.p - lab.y * 1000000000) * c.cnt) AS gs
         |  FROM c JOIN p$i p ON p.doc_id = c.doc_id
         |  JOIN lab ON lab.doc_id = c.doc_id GROUP BY 1),
         |w$i AS (
         |  SELECT w.j, CAST(w.wn - CAST(floor(coalesce(g.gs, 0)
         |      / (2.0 * (SELECT n FROM nn)) + 0.5) AS BIGINT) AS BIGINT) AS wn
         |  FROM w${i - 1} w LEFT JOIN g$i g ON g.j = w.j)""".stripMargin
    }
    s"""WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS t
       |  FROM documents),
       |hh AS (SELECT doc_id,
       |  ascii(substr(t || '___', 1, 1)) * 65536
       |    + ascii(substr(t || '___', 2, 1)) * 256
       |    + ascii(substr(t || '___', 3, 1)) + length(t) * 16777216 AS wh
       |  FROM tok),
       |c AS (SELECT doc_id, CAST(wh % 16 AS INT) AS j,
       |  CAST(count(*) AS BIGINT) AS cnt FROM hh GROUP BY 1, 2),
       |lab AS (SELECT doc_id,
       |  CASE WHEN len(list_filter(string_split(text, ' '), x -> x = 'spark')) > 0
       |       THEN 1 ELSE 0 END AS y
       |  FROM documents),
       |nn AS (SELECT count(*) AS n FROM documents),
       |w0 AS (SELECT CAST(j AS INT) AS j, CAST(0 AS BIGINT) AS wn
       |  FROM (SELECT unnest(range(0, 16)) AS j)),
       |${iter(1)},
       |${iter(2)},
       |${iter(3)},
       |sf AS (
       |  SELECT c.doc_id, CAST(sum(c.cnt * w.wn) AS BIGINT) AS dot
       |  FROM c JOIN w3 w ON w.j = c.j GROUP BY 1),
       |pf AS (
       |  SELECT doc_id, CAST(floor((0.5 + (dot/1e9) / (2.0*(1.0+abs(dot/1e9))))
       |    * 1e9 + 0.5) AS BIGINT) AS p
       |  FROM sf)
       |SELECT d.doc_id, coalesce(pf.p, 500000000) AS p_nano,
       |  coalesce(pf.p, 500000000) > 500000000 AS flagged
       |FROM (SELECT doc_id FROM documents) d
       |LEFT JOIN pf ON pf.doc_id = d.doc_id""".stripMargin
  }

  /** The funnel CTE chain (view → click → purchase, strictly ordered per
    * user) — portable SQL, shared verbatim by the DuckDB oracle and the
    * `x_sql_funnel` Spark-SQL twin. */
  private val FunnelSql =
    """WITH v AS (
      |  SELECT user_id, min(ts) AS v_ts FROM events
      |  WHERE event_type = 'view' GROUP BY user_id),
      |c AS (
      |  SELECT e.user_id, min(e.ts) AS c_ts
      |  FROM events e JOIN v ON v.user_id = e.user_id
      |  WHERE e.event_type = 'click' AND e.ts > v.v_ts GROUP BY e.user_id),
      |p AS (
      |  SELECT e.user_id, min(e.ts) AS p_ts
      |  FROM events e JOIN c ON c.user_id = e.user_id
      |  WHERE e.event_type = 'purchase' AND e.ts > c.c_ts GROUP BY e.user_id)
      |SELECT '1_view' AS stage, count(*) AS users FROM v
      |UNION ALL SELECT '2_click' AS stage, count(*) AS users FROM c
      |UNION ALL SELECT '3_purchase' AS stage, count(*) AS users FROM p""".stripMargin

  val defs: Seq[QDef] = Seq(

    // Conversion funnel with ORDER semantics: a click counts only after the
    // user's first view, a purchase only after that qualified click — the
    // sequential-pattern query behind every product-analytics engine, and
    // (for training pipelines) the shape of multi-step agreement filters.
    // Three stage aggregates chained by user-keyed joins: after the first
    // shuffle on user_id every later stage joins vertex-count-sized frames
    // on the SAME key (co-partitioned, no re-shuffle of the corpus; the
    // corpus is scanned once per stage type with the filter pushed down).
    QDef("x_funnel_steps", FunnelSql) { (s, d) =>
      val ev = Tables(s, d).events.select(col("user_id"), col("event_type"), col("ts"))
      val v = ev.filter(col("event_type") === "view")
        .groupBy("user_id").agg(min(col("ts")).as("v_ts"))
      val c = ev.filter(col("event_type") === "click")
        .join(v, "user_id").filter(col("ts") > col("v_ts"))
        .groupBy("user_id").agg(min(col("ts")).as("c_ts"))
      val p = ev.filter(col("event_type") === "purchase")
        .join(c, "user_id").filter(col("ts") > col("c_ts"))
        .groupBy("user_id").agg(min(col("ts")).as("p_ts"))
      v.agg(count(lit(1)).as("users")).select(lit("1_view").as("stage"), col("users"))
        .unionByName(c.agg(count(lit(1)).as("users"))
          .select(lit("2_click").as("stage"), col("users")))
        .unionByName(p.agg(count(lit(1)).as("users"))
          .select(lit("3_purchase").as("stage"), col("users")))
    },

    // The funnel as ONE Spark-SQL string over the events view — the same
    // portable text IS the DuckDB oracle, pinning parser/analyzer parity
    // on correlated CTE chains (the x_sql_* contract).
    QDef("x_sql_funnel", FunnelSql) { (s, d) =>
      SqlSurface.viewed(s, d, "events")
      s.sql(FunnelSql)
    },

    // STREAMING funnel (EventStreams.funnelStages): per-user stage
    // assignments finalized by watermark maturity and emitted exactly
    // once — batch run of the same flatMapGroupsWithState body for the
    // oracle (per-user stage rows instead of the aggregate counts);
    // MemoryStream parity incl. out-of-order retro-qualification in
    // EventStreamsSpec.
    QDef("x_stream_funnel",
      """WITH v AS (
        |  SELECT user_id, min(ts) AS v_ts FROM events
        |  WHERE event_type = 'view' GROUP BY user_id),
        |c AS (
        |  SELECT e.user_id, min(e.ts) AS c_ts
        |  FROM events e JOIN v ON v.user_id = e.user_id
        |  WHERE e.event_type = 'click' AND e.ts > v.v_ts GROUP BY e.user_id),
        |p AS (
        |  SELECT e.user_id, min(e.ts) AS p_ts
        |  FROM events e JOIN c ON c.user_id = e.user_id
        |  WHERE e.event_type = 'purchase' AND e.ts > c.c_ts GROUP BY e.user_id)
        |SELECT user_id, '1_view' AS stage, v_ts AS stage_ts FROM v
        |UNION ALL SELECT user_id, '2_click' AS stage, c_ts AS stage_ts FROM c
        |UNION ALL SELECT user_id, '3_purchase' AS stage, p_ts AS stage_ts FROM p""".stripMargin) {
      (s, d) =>
        implicit val sp = s
        import s.implicits._
        graft.streaming.EventStreams.funnelStages(
          Tables(s, d).events
            .select(col("event_id"), col("ts"), col("user_id"),
              col("event_type"), col("value"))
            .as[graft.streaming.EventRow]).toDF()
    },

    // CDC changelog apply — the materialize step of every change-data
    // pipeline: events replayed as a per-user changelog ('error' rows are
    // DELETEs, everything else UPSERTs with the new value), final state =
    // last op per key unless it deleted. ONE shuffle on the key, then a
    // per-key window (row_number + count) — the last-writer-wins merge that
    // at 100 TB runs per key-partition with AQE skew splitting; contrast
    // x_scd2_merge, which keeps the full history instead of the tip.
    QDef("x_cdc_apply", R7Ops.CdcSql) { (s, d) =>
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id").orderBy(col("ts").desc, col("event_id").desc)
      val wAll = org.apache.spark.sql.expressions.Window.partitionBy("user_id")
      Tables(s, d).events
        .select(col("user_id"), col("event_id"), col("ts"), col("value"),
          when(col("event_type") === "error", "D").otherwise("U").as("op"))
        .withColumn("rn", row_number().over(w))
        .withColumn("n_ops", count(lit(1)).over(wAll))
        .filter(col("rn") === 1 && col("op") =!= "D")
        .select(col("user_id"), col("value").as("last_value"), col("n_ops"))
    },

    // The changelog apply as ONE Spark-SQL string — same portable text IS
    // the oracle (the x_sql_* parser/analyzer-parity contract, here for
    // desc-ordered windows + frameless count over partition).
    QDef("x_sql_cdc", R7Ops.CdcSql) { (s, d) =>
      SqlSurface.viewed(s, d, "events")
      s.sql(R7Ops.CdcSql)
    },

    // Snapshot diff — added/removed/changed rows between two table
    // versions, the primitive behind incremental training-set refresh
    // ("which documents changed since the last crawl"). v2 is a
    // deterministic mutation of customer (drop %11, re-balance %7=3, add
    // %13=5 under shifted keys) replayed identically in both engines; the
    // diff itself is ONE full outer join co-partitioned on the key — at
    // 100 TB both snapshots shuffle once, and unchanged rows (the mass)
    // are filtered before any output materializes.
    QDef("x_snapshot_diff", R7Ops.SnapshotDiffSql) { (s, d) =>
      val cust = Tables(s, d).customer
      val v1 = cust.select(col("c_custkey").as("k"), col("c_acctbal").as("bal"))
      val v2 = cust.filter(col("c_custkey") % 11 =!= 0)
        .select(col("c_custkey").as("k2"),
          when(col("c_custkey") % 7 === 3, col("c_acctbal") + 100.0)
            .otherwise(col("c_acctbal")).as("bal2"))
        .unionByName(cust.filter(col("c_custkey") % 13 === 5)
          .select((col("c_custkey") + 1000000L).as("k2"),
            (col("c_acctbal") - 50.0).as("bal2")))
      v1.join(v2, col("k") === col("k2"), "full_outer")
        .filter(col("k").isNull || col("k2").isNull || col("bal") =!= col("bal2"))
        .select(coalesce(col("k"), col("k2")).as("k"),
          when(col("k").isNull, "added")
            .when(col("k2").isNull, "removed")
            .otherwise("changed").as("status"),
          col("bal").as("old_bal"), col("bal2").as("new_bal"))
    },

    // The snapshot diff as ONE portable SQL text (full outer + coalesce +
    // case classification are dialect-free) — shared verbatim with the
    // oracle, the same contract as x_sql_funnel/x_sql_cdc.
    QDef("x_sql_snapshot_diff", R7Ops.SnapshotDiffSql) { (s, d) =>
      SqlSurface.viewed(s, d, "customer")
      s.sql(R7Ops.SnapshotDiffSql)
    },

    // Population-stability-index drift between two event populations
    // (even user_id = reference, odd = current — a parity split so BOTH
    // populations are non-empty at every scale factor; a range split
    // empties one side at sf0.001's 15 users) per event_type — the
    // distribution-shift monitor a continuously-refreshed training corpus
    // needs before each ingest wave. Laplace-smoothed fixed bins
    // ((cnt+1)/(N+bins)) so empty bins stay finite in BOTH engines.
    // Corpus work is ONE count aggregate; everything after (bin grid,
    // smoothing, the PSI sum) runs over |types|×bins×2 rows — at 100 TB
    // the second phase is KB-sized regardless of corpus size.
    QDef("x_drift_psi",
      """WITH e AS (
        |  SELECT event_type,
        |    CASE WHEN user_id % 2 = 0 THEN 'ref' ELSE 'cur' END AS side,
        |    least(greatest(CAST(floor(value / 50) AS INT), 0), 9) AS bin
        |  FROM events),
        |cnt AS (
        |  SELECT event_type, side, bin, count(*) AS c FROM e GROUP BY 1, 2, 3),
        |tot AS (SELECT event_type, side, sum(c) AS n FROM cnt GROUP BY 1, 2),
        |grid AS (
        |  SELECT t.event_type, sd.side, b.bin
        |  FROM (SELECT DISTINCT event_type FROM e) t,
        |    (VALUES ('ref'), ('cur')) sd(side),
        |    unnest(generate_series(0, 9)) b(bin)),
        |pq AS (
        |  SELECT g.event_type, g.side, g.bin,
        |    (coalesce(cnt.c, 0) + 1.0) / (tot.n + 10.0) AS p
        |  FROM grid g
        |  JOIN tot ON tot.event_type = g.event_type AND tot.side = g.side
        |  LEFT JOIN cnt ON cnt.event_type = g.event_type
        |    AND cnt.side = g.side AND cnt.bin = g.bin)
        |SELECT r.event_type, round(sum((r.p - c.p) * ln(r.p / c.p)), 6) AS psi
        |FROM pq r JOIN pq c ON r.event_type = c.event_type AND r.bin = c.bin
        |  AND r.side = 'ref' AND c.side = 'cur'
        |GROUP BY r.event_type""".stripMargin) { (s, d) =>
      val e = Tables(s, d).events.select(col("event_type"),
        when(col("user_id") % 2 === 0, "ref").otherwise("cur").as("side"),
        least(greatest(floor(col("value") / 50).cast("int"), lit(0)), lit(9)).as("bin"))
      val cnt = e.groupBy("event_type", "side", "bin").agg(count(lit(1)).as("c"))
      val tot = cnt.groupBy("event_type", "side").agg(sum(col("c")).as("n"))
      // bin grid via explode, not crossJoin: |types|×2×10 rows
      val grid = e.select("event_type").distinct()
        .select(col("event_type"), explode(array(lit("ref"), lit("cur"))).as("side"))
        .select(col("event_type"), col("side"), explode(expr("sequence(0, 9)")).as("bin"))
      val pq = grid.join(tot, Seq("event_type", "side"))
        .join(cnt, Seq("event_type", "side", "bin"), "left")
        .select(col("event_type"), col("side"), col("bin"),
          ((coalesce(col("c"), lit(0L)) + lit(1.0)) / (col("n") + lit(10.0))).as("p"))
      val ref = pq.filter(col("side") === "ref")
        .select(col("event_type"), col("bin"), col("p").as("pr"))
      val cur = pq.filter(col("side") === "cur")
        .select(col("event_type").as("et2"), col("bin").as("b2"), col("p").as("pc"))
      ref.join(cur, col("event_type") === col("et2") && col("bin") === col("b2"))
        .groupBy("event_type")
        .agg(round(sum((col("pr") - col("pc")) * log(col("pr") / col("pc"))), 6).as("psi"))
    },

    // Weighted single-source shortest paths (GraphMetrics.sssp) over the
    // sparse nation graph, edge weight = min l_quantity per edge — the
    // weighted companion of x_graph_bfs. Engine: delta Bellman-Ford
    // (frontier-only relaxation, Pregel shape); oracle: a hop-bounded
    // recursive CTE whose min(dist) per vertex is Dijkstra-exact because
    // every shortest path is simple (< |V| hops, positive weights).
    QDef("x_graph_sssp",
      """WITH RECURSIVE edges AS (
        |  SELECT c.c_nationkey AS src, s.s_nationkey AS dst,
        |    CAST(l.l_quantity AS BIGINT) AS w
        |  FROM lineitem l
        |  JOIN orders o ON l.l_orderkey = o.o_orderkey
        |  JOIN customer c ON o.o_custkey = c.c_custkey
        |  JOIN supplier s ON l.l_suppkey = s.s_suppkey
        |  WHERE l.l_extendedprice > 100000),
        |ew AS (SELECT src, dst, min(w) AS w FROM edges GROUP BY 1, 2),
        |nv AS (SELECT count(*) AS n FROM (
        |  SELECT src AS v FROM ew UNION SELECT dst FROM ew)),
        |walk(id, dist, hops) AS (
        |  SELECT CAST(0 AS BIGINT) AS id, CAST(0 AS BIGINT) AS dist, 0 AS hops
        |  UNION
        |  SELECT CAST(e.dst AS BIGINT), wk.dist + e.w, wk.hops + 1
        |  FROM walk wk JOIN ew e ON e.src = wk.id
        |  WHERE wk.hops < (SELECT n FROM nv))
        |SELECT id, CAST(min(dist) AS BIGINT) AS dist FROM walk GROUP BY id""".stripMargin) {
      (s, d) =>
        val t = Tables(s, d)
        val edgesW = t.lineitem.filter(col("l_extendedprice") > 100000)
          .join(t.orders, col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(t.customer), col("o_custkey") === col("c_custkey"))
          .join(broadcast(t.supplier), col("l_suppkey") === col("s_suppkey"))
          .select(col("c_nationkey").as("src"), col("s_nationkey").as("dst"),
            col("l_quantity").as("w"))
        GraphMetrics.sssp(edgesW, source = 0L)
    },

    // One BPE merge step — the inner loop of byte-pair-encoding tokenizer
    // training: adjacent-character-pair frequencies weighted by word
    // frequency, top candidates ranked. The scale shape IS the point: the
    // corpus collapses to its VOCABULARY first (one word-count aggregate —
    // Zipf makes the vocab millions of rows where the corpus is billions),
    // and the pair explode + count runs over the vocab, not the corpus.
    // The final rank window sorts pair aggregates (bounded by charset²),
    // NOT corpus rows.
    QDef("x_bpe_pairs",
      """WITH w AS (
        |  SELECT unnest(string_split(text, ' ')) AS w FROM documents),
        |vocab AS (
        |  SELECT w, count(*) AS c FROM w WHERE len(w) >= 2 GROUP BY w),
        |pr AS (
        |  SELECT substr(w, i, 2) AS pair, c
        |  FROM vocab, unnest(generate_series(1, len(w) - 1)) t(i)),
        |pf AS (SELECT pair, CAST(sum(c) AS BIGINT) AS freq FROM pr GROUP BY pair)
        |SELECT pair, freq,
        |  CAST(row_number() OVER (ORDER BY freq DESC, pair) AS INT) AS rank
        |FROM pf ORDER BY freq DESC, pair LIMIT 20""".stripMargin) { (s, d) =>
      val vocab = Tables(s, d).documents
        .select(explode(split(col("text"), " ")).as("w"))
        .filter(length(col("w")) >= 2) // 1-char words pair with nothing; and
        // sequence(1, 0) would generate a DESCENDING [1, 0] in Spark
        .groupBy("w").agg(count(lit(1)).as("c"))
      val pairs = vocab
        .select(explode(expr(
          "transform(sequence(1, length(w) - 1), i -> substring(w, i, 2))")).as("pair"),
          col("c"))
        .groupBy("pair").agg(sum(col("c")).as("freq"))
      val wTop = org.apache.spark.sql.expressions.Window
        .orderBy(col("freq").desc, col("pair"))
      pairs.orderBy(col("freq").desc, col("pair")).limit(20)
        .withColumn("rank", row_number().over(wTop))
    },

    // Reciprocal-rank fusion of two BM25 rankers with different probe-term
    // sets — the standard hybrid-retrieval merge (in production: one
    // lexical + one vector ranker; the fusion algebra is identical and
    // only ever touches the k-sized rank lists, never the corpus).
    // score(d) = Σ_lists 1/(60 + rank_list(d)), absent lists contribute 0.
    QDef("x_rrf_fusion",
      s"""WITH base AS (
         |  SELECT doc_id,
         |    CAST(len(list_filter(string_split(text, ' '), x -> x <> '')) AS DOUBLE) AS dl,
         |    ${bm25Tf(TermsA, "a")},
         |    ${bm25Tf(TermsB, "b")}
         |  FROM documents),
         |stats AS (
         |  SELECT CAST(count(*) AS DOUBLE) AS n_docs, avg(dl) AS avgdl,
         |    ${bm25Df(TermsA, "a")},
         |    ${bm25Df(TermsB, "b")}
         |  FROM base),
         |s1 AS (SELECT doc_id AS id, ${bm25Score(TermsA, "a")} AS score
         |  FROM base, stats),
         |r1 AS (SELECT id, row_number() OVER (ORDER BY score DESC, id) AS rk
         |  FROM s1 WHERE score > 0 ORDER BY score DESC, id LIMIT 10),
         |s2 AS (SELECT doc_id AS id, ${bm25Score(TermsB, "b")} AS score
         |  FROM base, stats),
         |r2 AS (SELECT id, row_number() OVER (ORDER BY score DESC, id) AS rk
         |  FROM s2 WHERE score > 0 ORDER BY score DESC, id LIMIT 10),
         |f AS (
         |  SELECT coalesce(r1.id, r2.id) AS id,
         |    round(coalesce(1.0 / (60 + r1.rk), 0) + coalesce(1.0 / (60 + r2.rk), 0), 6) AS rrf
         |  FROM r1 FULL OUTER JOIN r2 ON r1.id = r2.id)
         |SELECT id, rrf,
         |  CAST(row_number() OVER (ORDER BY rrf DESC, id) AS INT) AS rank
         |FROM f ORDER BY rrf DESC, id LIMIT 10""".stripMargin) { (s, d) =>
      val docs = Tables(s, d).documents
      val r1 = TextOps.bm25TopK(docs, "doc_id", "text", TermsA, k = 10)
        .select(col("id"), col("rank").as("rk1"))
      val r2 = TextOps.bm25TopK(docs, "doc_id", "text", TermsB, k = 10)
        .select(col("id").as("id2"), col("rank").as("rk2"))
      val fused = r1.join(r2, col("id") === col("id2"), "full_outer")
        .select(coalesce(col("id"), col("id2")).as("id"),
          round(coalesce(lit(1.0) / (lit(60) + col("rk1")), lit(0.0))
            + coalesce(lit(1.0) / (lit(60) + col("rk2")), lit(0.0)), 6).as("rrf"))
      val wTop = org.apache.spark.sql.expressions.Window
        .orderBy(col("rrf").desc, col("id"))
      fused.orderBy(col("rrf").desc, col("id")).limit(10)
        .withColumn("rank", row_number().over(wTop))
    },

    // Gaps-and-islands: longest consecutive-DAY activity streak per user —
    // the canonical window-function idiom (distinct days → row_number →
    // day − rn = island key → island lengths). Distinct from sessionize
    // (calendar-day islands, not ts-gap sessions). All three phases are
    // user-partitioned: one shuffle on user_id, then window + two hash
    // aggregates on the same key — no global sort anywhere.
    QDef("x_streaks",
      """WITH days AS (
        |  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
        |r AS (
        |  SELECT user_id, day,
        |    CAST(row_number() OVER (PARTITION BY user_id ORDER BY day) AS INT) AS rn
        |  FROM days),
        |st AS (
        |  SELECT user_id, day - rn AS isl, count(*) AS len
        |  FROM r GROUP BY user_id, day - rn)
        |SELECT user_id, CAST(max(len) AS BIGINT) AS longest,
        |  CAST(sum(len) AS BIGINT) AS active_days
        |FROM st GROUP BY user_id""".stripMargin) { (s, d) =>
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id").orderBy("day")
      Tables(s, d).events
        .select(col("user_id"), to_date(col("ts")).as("day")).distinct()
        .withColumn("rn", row_number().over(w))
        .groupBy(col("user_id"), date_sub(col("day"), col("rn")).as("isl"))
        .agg(count(lit(1)).as("len"))
        .groupBy("user_id")
        .agg(max(col("len")).as("longest"), sum(col("len")).as("active_days"))
    },

    // The streaks query through Spark's SQL parser (date_sub has no DuckDB
    // counterpart, so the twin keeps its own text against the SAME oracle
    // as x_streaks — the usual twin contract when dialects diverge).
    QDef("x_sql_streaks",
      """WITH days AS (
        |  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
        |r AS (
        |  SELECT user_id, day,
        |    CAST(row_number() OVER (PARTITION BY user_id ORDER BY day) AS INT) AS rn
        |  FROM days),
        |st AS (
        |  SELECT user_id, day - rn AS isl, count(*) AS len
        |  FROM r GROUP BY user_id, day - rn)
        |SELECT user_id, CAST(max(len) AS BIGINT) AS longest,
        |  CAST(sum(len) AS BIGINT) AS active_days
        |FROM st GROUP BY user_id""".stripMargin) { (s, d) =>
      SqlSurface.viewed(s, d, "events")
      s.sql("""WITH days AS (
        |  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
        |r AS (
        |  SELECT user_id, day,
        |    row_number() OVER (PARTITION BY user_id ORDER BY day) AS rn
        |  FROM days),
        |st AS (
        |  SELECT user_id, date_sub(day, rn) AS isl, count(*) AS len
        |  FROM r GROUP BY user_id, date_sub(day, rn))
        |SELECT user_id, max(len) AS longest, sum(len) AS active_days
        |FROM st GROUP BY user_id""".stripMargin)
    },

    // Exact percentiles through the SQL parser: Spark's percentile() in a
    // SQL string vs DuckDB quantile_cont — the array-literal D-suffix trap
    // (a bare 0.5 in SQL text is DECIMAL) exercised on purpose.
    QDef("x_sql_percentile",
      """SELECT l_returnflag,
        |  round(quantile_cont(l_quantity, 0.5), 6) AS p50,
        |  round(quantile_cont(l_quantity, 0.9), 6) AS p90
        |FROM lineitem GROUP BY l_returnflag""".stripMargin) { (s, d) =>
      SqlSurface.viewed(s, d, "lineitem")
      s.sql("""SELECT l_returnflag,
        |  round(percentile(l_quantity, 0.5D), 6) AS p50,
        |  round(percentile(l_quantity, 0.9D), 6) AS p90
        |FROM lineitem GROUP BY l_returnflag""".stripMargin)
    },

    // RECURSIVE CTE through Spark's OWN SQL engine (WITH RECURSIVE landed
    // in Spark 4) — a binary-heap customer hierarchy (parent k = ⌊k/2⌋,
    // strictly decreasing → acyclic, so UNION ALL recursion terminates)
    // rolled up by depth. ONE portable SQL text serves as both the Spark
    // query and the DuckDB oracle, pinning the two engines' recursive-CTE
    // semantics against each other. round(,4) sums are tie-safe: acctbal
    // has 2 decimals, so no sum can land on a 4th-decimal rounding
    // boundary.
    QDef("x_sql_recursive", R7Ops.RecursiveSql) { (s, d) =>
      SqlSurface.viewed(s, d, "customer")
      s.sql(R7Ops.RecursiveSql)
    },

    // Streaming drift monitor, batch twin (EventStreams.driftPsiStream —
    // same code path; watermark is a no-op in batch): per-day PSI of each
    // window's value distribution against the whole corpus's reference
    // histogram. The chained agg→agg stateful pair where the SECOND agg
    // folds bin counts into a bounded map column and the PSI is scalar
    // algebra against the broadcast reference — no grid join, no third
    // stateful operator. MemoryStream parity in EventStreamsSpec.
    QDef("x_stream_psi",
      """WITH e AS (
        |  SELECT time_bucket(INTERVAL '1 day', ts) AS ws, event_type,
        |    least(greatest(CAST(floor(value / 50) AS INT), 0), 9) AS bin
        |  FROM events),
        |cnt AS (SELECT ws, event_type, bin, count(*) AS c FROM e GROUP BY 1, 2, 3),
        |n AS (SELECT ws, event_type, sum(c) AS n FROM cnt GROUP BY 1, 2),
        |rc AS (SELECT event_type, bin, count(*) AS c FROM e GROUP BY 1, 2),
        |rn AS (SELECT event_type, sum(c) AS rn FROM rc GROUP BY 1),
        |grid AS (
        |  SELECT n.ws, n.event_type, b.bin, n.n, rn.rn
        |  FROM n CROSS JOIN unnest(generate_series(0, 9)) b(bin)
        |  JOIN rn ON rn.event_type = n.event_type),
        |terms AS (
        |  SELECT g.ws, g.event_type,
        |    (coalesce(c.c, 0) + 1.0) / (g.n + 10.0) AS p,
        |    (coalesce(r.c, 0) + 1.0) / (g.rn + 10.0) AS q
        |  FROM grid g
        |  LEFT JOIN cnt c ON c.ws = g.ws AND c.event_type = g.event_type
        |    AND c.bin = g.bin
        |  LEFT JOIN rc r ON r.event_type = g.event_type AND r.bin = g.bin)
        |SELECT ws AS window_start, event_type,
        |  round(sum((p - q) * ln(p / q)), 6) AS psi
        |FROM terms GROUP BY 1, 2""".stripMargin) { (s, d) =>
      val ev = Tables(s, d).events
      graft.streaming.EventStreams.driftPsiStream(ev,
        graft.streaming.EventStreams.referenceHistogram(ev))
    },

    // Video scene-cut detection (Multimodal.sceneCuts) over a REAL MJPEG
    // decode of the scene fixture — frame grays are a pure function of
    // (id, frame index), so the oracle predicts the exact cut count
    // without decoding: a cut between frames i-1, i iff exactly one of
    // them is a bright frame, i.e. (id+i)%3==0 OR (id+i-1)%3==0 (consecutive
    // residues can't both be 0). 96-level jumps vs ±2 JPEG quantization
    // make threshold 16 deterministic.
    QDef("x_mm_scenes",
      """WITH p AS (
        |  SELECT doc_id, doc_id % 5 = 0 AS garbage,
        |    CAST(2 + doc_id % 4 AS BIGINT) AS n
        |  FROM documents),
        |cut AS (
        |  SELECT doc_id,
        |    sum(CASE WHEN ((doc_id + i) % 3 = 0) OR ((doc_id + i - 1) % 3 = 0)
        |        THEN 1 ELSE 0 END) AS cuts
        |  FROM p, unnest(generate_series(1, CAST(n - 1 AS INT))) t(i)
        |  WHERE NOT garbage GROUP BY doc_id)
        |SELECT p.doc_id AS media_id, NOT p.garbage AS decoded,
        |  CASE WHEN p.garbage THEN CAST(-1 AS BIGINT) ELSE p.n END AS n_frames,
        |  CASE WHEN p.garbage THEN CAST(-1 AS BIGINT)
        |       ELSE CAST(coalesce(cut.cuts, 0) AS BIGINT) END AS cuts
        |FROM p LEFT JOIN cut ON cut.doc_id = p.doc_id""".stripMargin) { (s, d) =>
      implicit val sp = s
      import graft.llm.Multimodal
      Multimodal.sceneCuts(Multimodal.synthSceneMjpegTable(
        Tables(s, d).documents.select(col("doc_id"))))
    },

    // Matryoshka-truncation recall@5: top-k over the FIRST 16 of 64
    // embedding dims (cosine is scale-invariant, so truncation needs no
    // renormalization for ranking) vs the full-dim brute-force truth —
    // the evaluation behind MRL-style "cheap first pass at 1/4 the
    // bytes". Same crossJoin-broadcast + bounded-window machinery as the
    // x_sim family; the hits join touches only two k-sized rank lists.
    QDef("x_sim_matryoshka",
      s"""WITH ${StarExt.EmbExpl},
         |${StarExt.NormsCte},
         |bdots AS (
         |  SELECT q.vec_id AS qid, c.vec_id AS cid, sum(q.e * c.e) AS dot
         |  FROM ee q JOIN ee c ON c.j = q.j AND q.vec_id < 10 AND c.vec_id <> q.vec_id
         |  GROUP BY 1, 2),
         |bscored AS (
         |  SELECT qid, cid, round(dot / (sqrt(nq.n2) * sqrt(nc.n2)), 6) AS cos
         |  FROM bdots JOIN norms nq ON nq.vec_id = qid JOIN norms nc ON nc.vec_id = cid),
         |brute AS (
         |  SELECT qid, cid FROM (
         |    SELECT qid, cid,
         |      row_number() OVER (PARTITION BY qid ORDER BY cos DESC, cid) AS rn
         |    FROM bscored) WHERE rn <= 5),
         |et AS (
         |  SELECT vec_id, CAST(j AS BIGINT) AS j,
         |    CAST(embedding[CAST(j AS INT)+1] AS DOUBLE) AS e
         |  FROM embeddings, unnest(range(0, 16)) t(j)),
         |tnorms AS (SELECT vec_id, sum(e * e) AS n2 FROM et GROUP BY vec_id),
         |tdots AS (
         |  SELECT q.vec_id AS qid, c.vec_id AS cid, sum(q.e * c.e) AS dot
         |  FROM et q JOIN et c ON c.j = q.j AND q.vec_id < 10 AND c.vec_id <> q.vec_id
         |  GROUP BY 1, 2),
         |tscored AS (
         |  SELECT qid, cid, round(dot / (sqrt(nq.n2) * sqrt(nc.n2)), 6) AS cos
         |  FROM tdots JOIN tnorms nq ON nq.vec_id = qid JOIN tnorms nc ON nc.vec_id = cid),
         |ttop AS (
         |  SELECT qid, cid FROM (
         |    SELECT qid, cid,
         |      row_number() OVER (PARTITION BY qid ORDER BY cos DESC, cid) AS rn
         |    FROM tscored) WHERE rn <= 5),
         |h AS (
         |  SELECT f.qid, count(*) AS hits
         |  FROM brute f JOIN ttop t ON t.qid = f.qid AND t.cid = f.cid
         |  GROUP BY f.qid)
         |SELECT q.qid, CAST(coalesce(h.hits, 0) AS BIGINT) AS hits,
         |  round(coalesce(h.hits, 0) / 5.0, 6) AS recall
         |FROM (SELECT DISTINCT qid FROM brute) q
         |LEFT JOIN h ON h.qid = q.qid""".stripMargin) { (s, d) =>
      import graft.llm.Similarity
      val emb = Tables(s, d).embeddings
      val q = emb.filter(col("vec_id") < 10)
      val full = Similarity.cosineTopK(q, emb, 5).select(col("qid"), col("cid"))
      val tq = q.select(col("vec_id"), expr("slice(embedding, 1, 16)").as("embedding"))
      val tc = emb.select(col("vec_id"), expr("slice(embedding, 1, 16)").as("embedding"))
      val trunc = Similarity.cosineTopK(tq, tc, 5)
        .select(col("qid").as("tqid"), col("cid").as("tcid"))
      val hits = full.join(trunc,
          col("qid") === col("tqid") && col("cid") === col("tcid"))
        .groupBy("qid").agg(count(lit(1)).as("h"))
      full.select("qid").distinct().join(hits, Seq("qid"), "left")
        .select(col("qid"), coalesce(col("h"), lit(0L)).as("hits"),
          round(coalesce(col("h"), lit(0L)) / 5.0, 6).as("recall"))
    },

    // l-diversity audit — k-anonymity's companion (x_k_anonymity counts
    // group SIZE; this counts DISTINCT sensitive values per
    // quasi-identifier group): a group can be large yet still leak if
    // everyone shares the sensitive attribute. floor-bucketed balance
    // brackets as the sensitive value (floor, not round — immune to the
    // engines' differing half-rounding modes). One partial/final
    // aggregate with distinct — no second shuffle.
    QDef("x_l_diversity",
      """SELECT c_nationkey, c_mktsegment,
        |  CAST(count(DISTINCT floor(c_acctbal / 100)) AS BIGINT) AS l,
        |  count(DISTINCT floor(c_acctbal / 100)) < 3 AS risky
        |FROM customer GROUP BY 1, 2""".stripMargin) { (s, d) =>
      Tables(s, d).customer
        .groupBy("c_nationkey", "c_mktsegment")
        .agg(countDistinct(floor(col("c_acctbal") / 100)).as("l"))
        .withColumn("risky", col("l") < 3)
    },

    // In-engine quality-classifier TRAINING (Classifier.trainLogisticHashed):
    // 3 full-batch logistic-GD iterations over hashed features, then score
    // every document — the filter-model step of a curation pipeline run as
    // DataFrame jobs. Integer-nano sums + a rational fast-sigmoid make the
    // whole trajectory bit-exact across engines (no exp, no order-dependent
    // float sums); the oracle unrolls the identical 3 iterations in SQL.
    QDef("x_quality_train", QualityTrainSql) { (s, d) =>
      graft.llm.Classifier.trainLogisticHashed(
        Tables(s, d).documents, "doc_id", "text",
        labelWord = "spark", dim = 16, iters = 3)._2
    },

    // MULTIMODAL curation composite — the image-side twin of the text
    // pipelines: decode → 64-bit aHash → banded near-dup → keep only
    // cluster representatives (rep == id) → join their caption documents
    // for downstream text stats. Proves the round's multimodal operators
    // COMPOSE; the oracle replays the whole chain through the shared
    // NearDupCtes block plus the survivor filter and the caption join.
    // Shape at 100 TB: payloads read once at the decode scan; everything
    // after moves 16-byte hash rows; the caption join is key-equi on the
    // id both sides are already partitioned by.
    QDef("x_pipeline_multimodal",
      s"""WITH ${StarExt.NearDupCtes}
         |SELECT f.media_id, d.lang, d.n_chars, f.n_nbrs
         |FROM folded f JOIN documents d ON d.doc_id = f.media_id
         |WHERE f.rep = f.media_id""".stripMargin) { (s, d) =>
      implicit val sp = s
      import graft.llm.Multimodal
      val docs = Tables(s, d).documents
      val nd = Multimodal.imageNearDups(
        Multimodal.synthNearDupPngTable(docs.select(col("doc_id"))), maxHamming = 3)
      nd.filter(col("rep") === col("media_id"))
        .join(docs, col("media_id") === col("doc_id"))
        .select(col("media_id"), col("lang"), col("n_chars"), col("n_nbrs"))
    },

    // Observable metrics (`df.observe`): the production data-quality hook —
    // named aggregate metrics computed DURING the pass (no second scan, no
    // separate count job) and delivered to QueryExecutionListeners /
    // StreamingQueryListeners. The observation rides the same physical
    // plan; the query's RESULT is unchanged (oracle-checked here), and
    // R7OpsSpec asserts the emitted metrics equal the aggregate's truth.
    // At 100 TB this is how a pipeline audits row counts and null rates
    // without doubling its scans.
    QDef("x_observe",
      """SELECT l_returnflag, CAST(count(*) AS BIGINT) AS cnt,
        |  round(sum(l_extendedprice), 2) AS revenue
        |FROM lineitem GROUP BY 1""".stripMargin) { (s, d) =>
      Tables(s, d).lineitem
        .observe("lineitem_audit",
          count(lit(1)).as("rows_seen"),
          sum(when(col("l_extendedprice").isNull, 1L).otherwise(0L)).as("null_prices"))
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("cnt"),
          round(sum(col("l_extendedprice")), 2).as("revenue"))
    },

    // EXACT per-group percentiles (Spark `percentile`, linear
    // interpolation), HISTOGRAM-COMPRESSED: l_quantity is integer-valued
    // with ~50 distinct values, so a (flag, quantity) pre-aggregate turns
    // the percentile's per-group buffer from O(N/groups) rows into
    // O(distinct) weighted entries — `percentile(v, p, freq)` interpolates
    // on the weighted histogram exactly as on the raw rows. Values with
    // genuinely unbounded domains take x_sketch_quantile's mergeable KLL
    // path instead. Over integer-valued l_quantity both engines
    // interpolate on exactly-representable doubles.
    QDef("x_percentile_exact",
      """SELECT l_returnflag,
        |  round(quantile_cont(l_quantity, 0.5), 6) AS p50,
        |  round(quantile_cont(l_quantity, 0.9), 6) AS p90
        |FROM lineitem GROUP BY l_returnflag""".stripMargin) { (s, d) =>
      Tables(s, d).lineitem
        .groupBy("l_returnflag", "l_quantity")
        .agg(count(lit(1)).as("freq"))
        .groupBy("l_returnflag")
        .agg(expr("percentile(l_quantity, array(0.5D, 0.9D), freq)").as("ps"))
        .select(col("l_returnflag"),
          round(element_at(col("ps"), 1), 6).as("p50"),
          round(element_at(col("ps"), 2), 6).as("p90"))
    }
  )
}
