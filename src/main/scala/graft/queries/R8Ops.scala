package graft.queries

import org.apache.spark.sql.functions._

import graft.{QDef, Tables}
import graft.graph.GraphMetrics
import graft.llm.{Bpe, Similarity, TextOps}
import graft.streaming.EventStreams

/** Round-8 additions: connected components as a first-class graph surface
  * (plus a portable SQL twin), iterative BPE tokenizer training, HTML/
  * boilerplate cleanup, MAD robust outlier detection, and the streaming
  * changelog-materialization formulation of CDC apply.
  */
object R8Ops {

  /** The supplier↔customer nation graph (same edge derivation as
    * `x_graph_sssp` / `g*`): one edge per distinct (customer-nation,
    * supplier-nation) trading pair. */
  private def nationEdges(t: Tables) =
    t.lineitem
      .join(t.orders, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(t.customer), col("o_custkey") === col("c_custkey"))
      .join(broadcast(t.supplier), col("l_suppkey") === col("s_suppkey"))
      .select(col("c_nationkey").as("src"), col("s_nationkey").as("dst"))

  /** Connected components as ONE portable SQL text — transitive closure by
    * REPEATED SQUARING (r_k covers paths of length 2^k; four squarings =
    * 16 hops, far past this graph's diameter), then min reachable id per
    * vertex. Pure joins + DISTINCT + GROUP BY, so the identical text is
    * both the DuckDB oracle of `x_graph_cc` and the whole Spark-SQL query
    * of its `x_sql_cc` twin. The squaring form is the ORACLE shape (closure
    * frames are fine at 25 vertices, quadratic at corpus scale); the engine
    * path ([[GraphMetrics.connectedComponents]]) is pointer-jumping
    * min-label propagation whose per-round frames stay edge/vertex-sized. */
  // Split so the x_sql_cc twin can materialize the corpus-derived edge
  // closure ONCE (the x_sql_kcore from-birth rule): every squaring
  // round references its predecessor twice, so the unsplit text's plan
  // tree doubles per round — e0's 3-join corpus derivation evaluated up
  // to 16× (measured 4.05 s vs the Dataset sibling's 1.18 s in
  // BENCH_LOCAL_r10). The DuckDB oracle parses the composed full text.
  private[queries] val CcEdgeCtes =
    """e0 AS (
      |  SELECT DISTINCT c.c_nationkey AS u, s.s_nationkey AS v
      |  FROM lineitem l
      |  JOIN orders o ON l.l_orderkey = o.o_orderkey
      |  JOIN customer c ON o.o_custkey = c.c_custkey
      |  JOIN supplier s ON l.l_suppkey = s.s_suppkey),
      |e AS (
      |  SELECT u, v FROM e0 UNION SELECT v, u FROM e0
      |  UNION SELECT u, u FROM e0 UNION SELECT v, v FROM e0)"""
      .stripMargin

  private[queries] val CcBody =
    """r1 AS (SELECT DISTINCT a.u, b.v FROM e a JOIN e b ON a.v = b.u),
      |r2 AS (SELECT DISTINCT a.u, b.v FROM r1 a JOIN r1 b ON a.v = b.u),
      |r3 AS (SELECT DISTINCT a.u, b.v FROM r2 a JOIN r2 b ON a.v = b.u),
      |r4 AS (SELECT DISTINCT a.u, b.v FROM r3 a JOIN r3 b ON a.v = b.u)
      |SELECT CAST(u AS BIGINT) AS id, CAST(min(v) AS BIGINT) AS comp
      |FROM r4 GROUP BY u""".stripMargin

  private[queries] val CcSql =
    s"WITH $CcEdgeCtes,\n$CcBody"

  /** Unrolled 4-round synchronous LPA oracle over the nation graph —
    * same edge derivation as [[CcSql]], self-loops excluded, each round
    * the (count DESC, label ASC) argmax of neighbor labels. */
  private def lpaRound(i: Int): String =
    s"""f$i AS (
       |  SELECT e.u AS id, l.lbl, count(*) AS c
       |  FROM e JOIN l${i - 1} l ON l.id = e.v GROUP BY 1, 2),
       |l$i AS (
       |  SELECT id, lbl FROM (
       |    SELECT id, lbl,
       |      row_number() OVER (PARTITION BY id ORDER BY c DESC, lbl) AS rn
       |    FROM f$i) t WHERE rn = 1)""".stripMargin

  private[queries] val LpaSql =
    s"""WITH e0 AS (
       |  SELECT DISTINCT c.c_nationkey AS u, s.s_nationkey AS v
       |  FROM lineitem l
       |  JOIN orders o ON l.l_orderkey = o.o_orderkey
       |  JOIN customer c ON o.o_custkey = c.c_custkey
       |  JOIN supplier s ON l.l_suppkey = s.s_suppkey),
       |e AS (
       |  SELECT u, v FROM (
       |    SELECT u, v FROM e0 UNION SELECT v, u FROM e0) t WHERE u <> v),
       |l0 AS (SELECT DISTINCT u AS id, u AS lbl FROM e),
       |${lpaRound(1)},
       |${lpaRound(2)},
       |${lpaRound(3)},
       |${lpaRound(4)}
       |SELECT CAST(id AS BIGINT) AS id, CAST(lbl AS BIGINT) AS lbl FROM l4""".stripMargin

  /** The BPE-training CTE block (corpus → v0 vocabulary → three
    * pair-count/top-1/merge rounds m1..m3) — shared by the `x_bpe_train`
    * oracle and the `x_bpe_encode` oracle, which re-derives the merges
    * before applying them. */
  private def bpeRound(i: Int): String = {
    val prev = if (i == 1) "v0" else s"v${i - 1}"
    s"""p$i AS (
       |  SELECT '(' || l[i] || ')(' || l[i + 1] || ')' AS pair,
       |    CAST(sum(c) AS BIGINT) AS freq
       |  FROM (SELECT string_split(substr(sym, 2, len(sym) - 2), ')(') AS l, c
       |        FROM $prev) t, unnest(generate_series(1, len(l) - 1)) ix(i)
       |  GROUP BY 1),
       |m$i AS (SELECT pair, freq FROM p$i ORDER BY freq DESC, pair LIMIT 1),
       |v$i AS (SELECT replace(sym, m.pair, replace(m.pair, ')(', '')) AS sym, c
       |       FROM $prev, m$i m)""".stripMargin
  }

  private[queries] val BpeCtes =
    s"""w AS (SELECT unnest(string_split(text, ' ')) AS w FROM documents),
       |v0 AS (
       |  SELECT regexp_replace(w, '(.)', '(\\1)', 'g') AS sym, count(*) AS c
       |  FROM w WHERE len(w) >= 2 GROUP BY 1),
       |${bpeRound(1)},
       |${bpeRound(2)},
       |${bpeRound(3)}""".stripMargin

  /** One greedy MMR step as SQL: argmax over the not-yet-selected pool of
    * `0.7·rel − 0.3·max(cos to selected)`, ties to the smaller vec_id —
    * the literal replay of [[graft.llm.Similarity.mmrSelect]]'s step. */
  private def mmrStep(i: Int): String = {
    val sel = (1 until i).map(j => s"SELECT vec_id FROM s$j").mkString(" UNION ALL ")
    s"""s$i AS (
       |  SELECT p.vec_id, p.rel,
       |    round(0.7 * p.rel - 0.3 * max(pc.c), 6) AS score,
       |    CAST($i AS INT) AS step
       |  FROM pool p JOIN pc ON pc.a = p.vec_id AND pc.b IN ($sel)
       |  WHERE p.vec_id NOT IN ($sel)
       |  GROUP BY 1, 2 ORDER BY score DESC, p.vec_id LIMIT 1)""".stripMargin
  }

  private[queries] val MmrSql =
    s"""WITH ${StarExt.EmbExpl},
       |${StarExt.NormsCte},
       |dots AS (
       |  SELECT c.vec_id, sum(q.e * c.e) AS dot
       |  FROM ee q JOIN ee c ON c.j = q.j AND q.vec_id = 0 AND c.vec_id <> 0
       |  GROUP BY 1),
       |pool0 AS (
       |  SELECT d.vec_id, round(d.dot / (sqrt(nq.n2) * sqrt(nc.n2)), 6) AS rel
       |  FROM dots d JOIN norms nq ON nq.vec_id = 0
       |  JOIN norms nc ON nc.vec_id = d.vec_id),
       |pool AS (SELECT vec_id, rel FROM pool0 ORDER BY rel DESC, vec_id LIMIT 12),
       |pe AS (
       |  SELECT ee.vec_id, ee.j, ee.e FROM ee
       |  JOIN pool ON pool.vec_id = ee.vec_id),
       |pd AS (
       |  SELECT ea.vec_id AS a, eb.vec_id AS b, sum(ea.e * eb.e) AS dot
       |  FROM pe ea JOIN pe eb ON eb.j = ea.j AND ea.vec_id <> eb.vec_id
       |  GROUP BY 1, 2),
       |pc AS (
       |  SELECT pd.a, pd.b, round(pd.dot / (sqrt(na.n2) * sqrt(nb.n2)), 6) AS c
       |  FROM pd JOIN norms na ON na.vec_id = pd.a
       |  JOIN norms nb ON nb.vec_id = pd.b),
       |s1 AS (
       |  SELECT vec_id, rel, round(0.7 * rel, 6) AS score, CAST(1 AS INT) AS step
       |  FROM pool ORDER BY score DESC, vec_id LIMIT 1),
       |${mmrStep(2)},
       |${mmrStep(3)},
       |${mmrStep(4)}
       |SELECT step, vec_id, rel, score FROM s1
       |UNION ALL SELECT step, vec_id, rel, score FROM s2
       |UNION ALL SELECT step, vec_id, rel, score FROM s3
       |UNION ALL SELECT step, vec_id, rel, score FROM s4""".stripMargin

  def defs: Seq[QDef] = Seq(

    // Connected components over the nation trading graph — the pointer-
    // jumping min-label propagation behind x_dedup_clusters surfaced as the
    // graph operator it is (GraphFrames connectedComponents semantics;
    // GraphX agreement property-tested in GraphCcSpec). Per round: one
    // edge-list join + one min aggregate + a label shortcut join, all
    // shuffle-partitioned by vertex id; rounds grow O(log diameter).
    QDef("x_graph_cc", R8Ops.CcSql) { (s, d) =>
      GraphMetrics.connectedComponents(nationEdges(Tables(s, d)))
    },

    // The same components through Spark's SQL parser — same shared
    // fragments, with the corpus-derived edge closure materialized ONCE
    // behind a localCheckpoint view (the x_sql_kcore from-birth rule)
    // instead of re-derived up to 16x by the squaring rounds' doubled
    // CTE references.
    QDef("x_sql_cc", R8Ops.CcSql) { (s, d) =>
      SqlSurface.viewed(s, d, "lineitem", "orders", "customer", "supplier")
      s.sql(s"WITH ${R8Ops.CcEdgeCtes} SELECT u, v FROM e")
        .transform(SqlSurface.materialized("e"))
      s.sql(s"WITH ${R8Ops.CcBody}")
    },

    // Iterative BPE tokenizer training: 3 merge rounds. The corpus
    // collapses to its vocabulary ONCE; each round is a vocab-sized pair
    // aggregate + a top-1 bounded heap + a map-side literal replace against
    // the 1-row broadcast winner (wrapped "(s1)(s2)" segmentations make
    // literal replace exactly BPE's greedy left-to-right merge). The oracle
    // unrolls the identical trajectory — same pair statistics, same
    // (freq DESC, pair ASC) tie-break, same merge application.
    QDef("x_bpe_train",
      s"""WITH $BpeCtes
         |SELECT CAST(1 AS INT) AS round, pair,
         |  trim(replace(pair, ')(', ''), '()') AS token, freq FROM m1
         |UNION ALL
         |SELECT CAST(2 AS INT), pair, trim(replace(pair, ')(', ''), '()'), freq FROM m2
         |UNION ALL
         |SELECT CAST(3 AS INT), pair, trim(replace(pair, ')(', ''), '()'), freq FROM m3""".stripMargin) {
      (s, d) => Bpe.train(Tables(s, d).documents, "text", rounds = 3)
    },

    // ENCODE under the trained tokenizer: per-document token counts with
    // the 3 learned merges applied in training order. The merge list is a
    // k-row model artifact — collected once (the Classifier precedent:
    // the model is the only driver traffic) and baked into a scan-local
    // projection, so corpus tokenization is ONE map-only pass: wrap,
    // replace ×3, count symbols, sum per doc. The oracle re-derives the
    // same merges from the shared CTE block and applies them in-lambda.
    QDef("x_bpe_encode",
      s"""WITH $BpeCtes
         |SELECT d.doc_id, CAST(coalesce(list_sum(list_transform(
         |    list_filter(string_split(d.text, ' '), w -> len(w) > 0),
         |    w -> len(string_split(replace(replace(replace(
         |      '(' || array_to_string(string_split(w, ''), ')(') || ')',
         |      m1.pair, replace(m1.pair, ')(', '')),
         |      m2.pair, replace(m2.pair, ')(', '')),
         |      m3.pair, replace(m3.pair, ')(', '')), ')(')))), 0) AS INT)
         |  AS n_tokens
         |FROM documents d, m1, m2, m3""".stripMargin) { (s, d) =>
      val docs = Tables(s, d).documents
      val pairs = Bpe.train(docs, "text", rounds = 3)
        .orderBy("round").collect().map(_.getString(1)).toSeq
      Bpe.encodeCounts(docs, "doc_id", "text", pairs)
    },

    // HTML/boilerplate cleanup — markup-strip stage of a crawl-curation
    // pipeline. The fixture corpus is clean prose, so the query first
    // DERIVES a deterministic noisy form (tags + a script element + XML
    // entities), then cleans it; the oracle replays both halves with the
    // identical regex chain ('g'-flagged in DuckDB — its regexp_replace is
    // first-match-only by default, Spark's is global). Scan-local, zero
    // shuffle, whole-stage codegen'd.
    QDef("x_text_clean",
      """WITH noisy AS (
        |  SELECT doc_id,
        |    '<html><script type="text/javascript">var x = 1;</script><body ' ||
        |    'class="main"><p>' ||
        |    replace(replace(text, 'spark', '&quot;spark&quot;'),
        |            'data', 'data &amp; more') ||
        |    '</p>  </body></html>' AS raw
        |  FROM documents),
        |clean AS (
        |  SELECT doc_id,
        |    trim(regexp_replace(
        |      replace(replace(replace(replace(replace(
        |        regexp_replace(
        |          regexp_replace(raw, '<(script|style)[^>]*>[^<]*</(script|style)>', ' ', 'g'),
        |          '<[^>]+>', ' ', 'g'),
        |        '&lt;', '<'), '&gt;', '>'), '&quot;', '"'), '&#39;', ''''),
        |        '&amp;', '&'),
        |      '[ \t\n\r]+', ' ', 'g')) AS clean_text
        |  FROM noisy)
        |SELECT doc_id, substr(clean_text, 1, 80) AS head,
        |  CAST(len(clean_text) AS INT) AS n_clean
        |FROM clean""".stripMargin) { (s, d) =>
      val noisy = Tables(s, d).documents.select(col("doc_id"),
        concat(
          lit("<html><script type=\"text/javascript\">var x = 1;</script><body " +
            "class=\"main\"><p>"),
          expr("replace(replace(text, 'spark', '&quot;spark&quot;'), " +
            "'data', 'data &amp; more')"),
          lit("</p>  </body></html>")).as("raw"))
      noisy.select(col("doc_id"), TextOps.stripHtml(col("raw")).as("clean_text"))
        .select(col("doc_id"), substring(col("clean_text"), 1, 80).as("head"),
          length(col("clean_text")).as("n_clean"))
    },

    // Robust outlier detection per group: median / MAD (median absolute
    // deviation) with the standard 3σ-equivalent 3·1.4826 cutoff — the
    // heavy-tail-safe complement of x_normalize's mean/stddev z-score.
    // Two exact-percentile aggregates; both medians broadcast back onto
    // the scan (KB stats frames), so the corpus shuffles only for the two
    // group aggregates. Medians rounded to 4dp BEFORE the cutoff compare —
    // engine-stable boundaries (the x_winsorize pattern).
    QDef("x_mad_outliers",
      """WITH li AS (SELECT l_returnflag AS g, l_extendedprice AS x FROM lineitem),
        |med AS (SELECT g, round(quantile_cont(x, 0.5), 4) AS med FROM li GROUP BY g),
        |dev AS (SELECT li.g, x, med, abs(x - med) AS ad
        |        FROM li JOIN med ON li.g = med.g),
        |st AS (SELECT g, min(med) AS med, round(quantile_cont(ad, 0.5), 4) AS mad
        |       FROM dev GROUP BY g)
        |SELECT d.g AS l_returnflag, st.med, st.mad,
        |  CAST(sum(CASE WHEN d.ad > 4.4478 * st.mad THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_out,
        |  CAST(count(*) AS BIGINT) AS n
        |FROM dev d JOIN st ON d.g = st.g
        |GROUP BY 1, 2, 3""".stripMargin) { (s, d) =>
      val li = Tables(s, d).lineitem
        .select(col("l_returnflag").as("g"), col("l_extendedprice").as("x"))
      val med = li.groupBy("g")
        .agg(round(expr("percentile(x, 0.5D)"), 4).as("med"))
      val dev = li.join(broadcast(med), "g")
        .withColumn("ad", abs(col("x") - col("med")))
      val st = dev.groupBy("g")
        .agg(min(col("med")).as("med"),
          round(expr("percentile(ad, 0.5D)"), 4).as("mad"))
      dev.join(broadcast(st.select(col("g"), col("mad"))), "g")
        .groupBy(col("g").as("l_returnflag"))
        .agg(min(col("med")).as("med"), min(col("mad")).as("mad"),
          sum(when(col("ad") > lit(4.4478) * col("mad"), 1L).otherwise(0L)).as("n_out"),
          count(lit(1)).as("n"))
    },

    // Directional containment near-dups: |grams(src) ∩ grams(ref)| /
    // |grams(src)| — catches excerpt/quote containment that symmetric
    // Jaccard misses (a short excerpt of a long source scores ~1.0 here,
    // ~0.0 there). Same inverted-index machinery and hot-gram cap as
    // x_dedup_ngram_jaccard; the unordered intersection fans out to both
    // directions in-row.
    QDef("x_dedup_containment",
      """WITH g AS (
        |  SELECT DISTINCT doc_id AS id,
        |    toks[CAST(i AS INT)] || ' ' || toks[CAST(i AS INT)+1] || ' ' || toks[CAST(i AS INT)+2] AS g
        |  FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
        |       unnest(range(1, len(toks)-1)) t(i)),
        |sizes AS (SELECT id, count(*) AS n FROM g GROUP BY id),
        |inter AS (
        |  SELECT l.id AS d1, r.id AS d2, count(*) AS i
        |  FROM g l JOIN g r ON l.g = r.g AND l.id < r.id
        |  GROUP BY 1, 2),
        |dirs AS (
        |  SELECT d1 AS src, d2 AS ref, i FROM inter
        |  UNION ALL SELECT d2, d1, i FROM inter)
        |SELECT b.src, b.ref, round(b.i / s.n, 6) AS containment
        |FROM dirs b JOIN sizes s ON s.id = b.src
        |WHERE round(b.i / s.n, 6) >= 0.6""".stripMargin) { (s, d) =>
      graft.llm.Dedup.containmentPairs(Tables(s, d).documents, "doc_id",
        "text", 0.6)
    },

    // Last-touch marketing attribution: each purchase credits its full
    // value to the user's LATEST preceding touchpoint (click/view/signup)
    // — the as-of join surfaced as the attribution operator it powers,
    // then credited value per channel. Money in integer cents so the
    // per-channel sums are order-exact; the one corpus shuffle is the
    // as-of's user-keyed window (AsOfJoin.asofJoin), credit rollup is a
    // channel-cardinality aggregate.
    QDef("x_attribution",
      """WITH p AS (
        |  SELECT event_id, user_id, ts, value FROM events
        |  WHERE event_type = 'purchase'),
        |t AS (
        |  SELECT user_id, ts, max(event_type) AS channel FROM events
        |  WHERE event_type IN ('click', 'view', 'signup') GROUP BY 1, 2),
        |a AS (
        |  SELECT p.value, t.channel FROM p ASOF LEFT JOIN t
        |  ON p.user_id = t.user_id AND p.ts >= t.ts)
        |SELECT channel, CAST(count(*) AS BIGINT) AS conversions,
        |  CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS credited_cents
        |FROM a WHERE channel IS NOT NULL GROUP BY 1""".stripMargin) { (s, d) =>
      val ev = Tables(s, d).events
      val purchases = ev.filter(col("event_type") === "purchase")
        .select("event_id", "user_id", "ts", "value")
      val touches = ev
        .filter(col("event_type").isin("click", "view", "signup"))
        .select(col("user_id"), col("ts"), col("event_type").as("channel"))
      graft.ops.AsOfJoin.asofJoin(purchases, touches, "user_id", "ts",
        "channel", "channel")
        .filter(col("channel").isNotNull)
        .groupBy("channel")
        .agg(count(lit(1)).as("conversions"),
          sum(expr("CAST(round(value * 100) AS BIGINT)")).as("credited_cents"))
    },

    // Synchronous label propagation (community detection), 4 fixed rounds
    // over the nation trading graph: each round every vertex adopts its
    // neighbors' most frequent label (ties → min), one edge join + one
    // count aggregate + one per-vertex argmax per round. The deterministic
    // tie order is what makes the unrolled oracle replay exact.
    QDef("x_graph_label_prop", R8Ops.LpaSql) { (s, d) =>
      GraphMetrics.labelPropagation(nationEdges(Tables(s, d)), iters = 4)
    },

    // STREAMING windowed top-k: the 3 most frequent event types per
    // event-time day, as a chained agg→agg stateful pair — the second
    // aggregate folds each window's counts into ONE k-sized sorted array
    // (negated-count structs make ascending sort = count DESC, type ASC),
    // so per-window state is bounded and the rank explode is stateless.
    // MemoryStream parity in EventStreamsSpec; batch twin here.
    QDef("x_stream_topk",
      """WITH c AS (
        |  SELECT time_bucket(INTERVAL '1 day', ts) AS ws, event_type,
        |    count(*) AS cnt
        |  FROM events GROUP BY 1, 2),
        |r AS (SELECT ws, event_type, cnt,
        |  CAST(row_number() OVER (PARTITION BY ws ORDER BY cnt DESC, event_type) AS INT)
        |    AS rank FROM c)
        |SELECT ws AS window_start, event_type, CAST(cnt AS BIGINT) AS cnt, rank
        |FROM r WHERE rank <= 3""".stripMargin) { (s, d) =>
      EventStreams.topKPerWindow(Tables(s, d).events, k = 3)
    },

    // Maximal-marginal-relevance diverse selection: greedy k=4 from a
    // top-12 relevance pool for query vector 0, score = 0.7·rel −
    // 0.3·max-sim-to-selected. The corpus does ONE scan (relevance
    // cosines vs the broadcast query) into a bounded-heap top-12; the
    // greedy chain then runs on the KB pool only (pairwise pool cosines +
    // k bounded argmax steps). Oracle unrolls the identical greedy
    // trajectory with the same 6dp rounding and id tie-breaks.
    QDef("x_select_mmr", R8Ops.MmrSql) { (s, d) =>
      Similarity.mmrSelect(Tables(s, d).embeddings, queryId = 0L,
        poolSize = 12, k = 4, lam = 0.7, mu = 0.3)
    },

    // Streaming changelog materialization, batch twin: the SAME
    // EventStreams.cdcMaterialize body runs under a MemoryStream in update
    // mode (parity spec in EventStreamsSpec) — one declarative max_by/count
    // aggregation per key instead of x_cdc_apply's sort+window, so state is
    // one struct per live key and every micro-batch upserts only touched
    // keys. Shares the CdcSql oracle verbatim: same last-writer-wins +
    // tombstone semantics, arrived at through incremental aggregation.
    QDef("x_stream_cdc", R7Ops.CdcSql) { (s, d) =>
      EventStreams.cdcMaterialize(Tables(s, d).events)
    }
  )
}
