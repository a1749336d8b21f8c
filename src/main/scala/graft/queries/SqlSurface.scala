package graft.queries

import graft.{QDef, Tables}
import graft.llm.Sampling

/** SQL-TEXT twins of flagship queries: each runs entirely as a
  * `spark.sql(...)` string over temp views, proving the engine's full SQL
  * interface — parser → analyzer (registered custom functions) → optimizer
  * (injected rules) → execution — carries the same semantics as the
  * Dataset-API formulations. Each twin shares its oracle with (or derives it
  * from) the Dataset-API original, so both interfaces are held to the same
  * DuckDB ground truth.
  */
object SqlSurface {

  /** Names RESERVED for the from-birth materialization rule (x_sql_kcore):
    * a SQL twin that must evaluate a multiply-referenced corpus-reaching
    * CTE exactly once materializes it behind a localCheckpoint temp view
    * with one of these names. The views are SESSION-GLOBAL and persist
    * after the twin runs, so no OTHER query may reference a bare reserved
    * name without defining it (as a CTE or by re-registering the view) —
    * a stale resolution would silently read the previous query's frame.
    * [[materialized]] enforces registration through this inventory, and
    * SqlViewHygieneSpec proves every registered query still constructs
    * when ALL shared view names are poisoned first, so an accidental
    * stale-view reference fails CI instead of shipping. */
  private[graft] val MaterializedViews: Set[String] =
    Set("e", "w", "hist", "bins", "daily", "p", "ix", "dist", "ob", "cal",
      "rm", "m", "bk", "gv", "gz")

  /** The one sanctioned way to register a from-birth materialization view
    * (`.transform(materialized("name"))`): pins the frame (localCheckpoint
    * — evaluated once, blocks GC-reclaimed with the frame) and registers
    * the PINNED frame under a RESERVED name, so the inventory above can't
    * drift from the call sites. */
  private[queries] def materialized(name: String)(
      df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    require(MaterializedViews(name),
      s"'$name' is not in SqlSurface.MaterializedViews — add it to the " +
        "reserved inventory (and mind the stale-resolution hazard its " +
        "scaladoc documents) before registering it")
    val pinned = df.localCheckpoint()
    pinned.createOrReplaceTempView(name)
    pinned
  }

  /** Table view names [[viewed]] can register, plus the table views
    * registered outside it (emb_sql, the Connectors *_v trio) — with
    * [[MaterializedViews]], the complete shared-view namespace
    * SqlViewHygieneSpec poisons. */
  private[graft] val TableViews: Set[String] =
    Set("lineitem", "supplier", "nation", "region", "customer", "documents",
      "orders", "part", "events", "emb_sql", "customer_v", "nation_v",
      "region_v")

  private[queries] def viewed(s: org.apache.spark.sql.SparkSession, d: String,
      names: String*): Unit = {
    val t = Tables(s, d)
    names.foreach {
      case n @ "lineitem" => t.lineitem.createOrReplaceTempView(n)
      case n @ "supplier" => t.supplier.createOrReplaceTempView(n)
      case n @ "nation" => t.nation.createOrReplaceTempView(n)
      case n @ "region" => t.region.createOrReplaceTempView(n)
      case n @ "customer" => t.customer.createOrReplaceTempView(n)
      case n @ "documents" => t.documents.createOrReplaceTempView(n)
      case n @ "orders" => t.orders.createOrReplaceTempView(n)
      case n @ "part" => t.part.createOrReplaceTempView(n)
      case n @ "events" => t.events.createOrReplaceTempView(n)
      case n => throw new IllegalArgumentException(s"no such view: $n")
    }
  }

  val defs: Seq[QDef] = Seq(

    // The flagship most_delay pipeline as ONE SQL string (scalar subquery
    // replaces the collect-scalar barrier; bround = the Scala side's
    // HALF_EVEN banker's rounding).
    QDef("x_sql_most_delay", StarFlights.MostDelaySql) { (s, d) =>
      viewed(s, d, "lineitem", "supplier", "nation")
      s.sql("""
        WITH detail AS (
          SELECT n.n_name, l.l_quantity, l.l_extendedprice
          FROM lineitem l
          JOIN supplier s ON l.l_suppkey = s.s_suppkey
          JOIN nation n ON s.s_nationkey = n.n_nationkey),
        counts AS (SELECT n_name, count(*) AS num_rows FROM detail GROUP BY n_name),
        popular AS (SELECT n_name FROM counts
          WHERE num_rows > (SELECT bround(avg(num_rows)) FROM counts))
        SELECT d.n_name, avg(d.l_quantity) AS avg_qty,
          round(avg(d.l_extendedprice), 4) AS avg_price,
          (avg(d.l_quantity) + round(avg(d.l_extendedprice), 4)) / 2 AS total_avg
        FROM detail d JOIN popular USING (n_name)
        GROUP BY d.n_name
        ORDER BY total_avg DESC, d.n_name""")
    },

    // Native minhash16() through SQL text: 16 signature minima per document,
    // exploded to columns; oracle recomputes them from the exploded shingle
    // set with DuckDB arithmetic.
    QDef("x_sql_minhash_sig", {
      val cols = (0 until 16).map(k => s"m$k").mkString(", ")
      s"""WITH ${StarExt.WordShCte},
         |${StarExt.MhCte}
         |SELECT id, $cols FROM mh""".stripMargin
    }) { (s, d) =>
      graft.functions.GraftFunctions.register(s) // any-session robustness
      viewed(s, d, "documents")
      val cols = (0 until 16).map(k => s"mh[$k] AS m$k").mkString(", ") // [] is 0-based in Spark SQL
      s.sql(s"""
        SELECT doc_id AS id, $cols
        FROM (SELECT doc_id, minhash16(text) AS mh FROM documents)
        WHERE mh IS NOT NULL""")
    },

    // Native simhash32_words() through SQL text vs the grouped bit-weight
    // oracle formulation.
    QDef("x_sql_simhash", {
      val weights = (0 until 32)
        .map(j => s"sum(((sh >> $j) & 1) * 2 - 1) AS w$j").mkString(", ")
      val value = (0 until 32)
        .map(j => s"CASE WHEN w$j > 0 THEN ${1L << j} ELSE 0 END").mkString(" + ")
      s"""WITH ${StarExt.WordShCte},
         |w AS (SELECT id, $weights FROM wsh GROUP BY id)
         |SELECT id, CAST($value AS BIGINT) AS simhash FROM w""".stripMargin
    }) { (s, d) =>
      graft.functions.GraftFunctions.register(s)
      viewed(s, d, "documents")
      // docs with < 3 tokens have no trigrams: no oracle row, null hash here
      s.sql("""
        SELECT doc_id AS id, simhash32_words(text) AS simhash
        FROM documents WHERE size(split(text, ' ')) >= 3""")
    },

    // GROUP BY ROLLUP through SQL text (subtotal + grand-total rows).
    QDef("x_sql_rollup",
      """SELECT r.r_name, n.n_name, count(*) AS cnt
        |FROM supplier s
        |JOIN nation n ON s.s_nationkey = n.n_nationkey
        |JOIN region r ON n.n_regionkey = r.r_regionkey
        |GROUP BY ROLLUP (r.r_name, n.n_name)""".stripMargin) { (s, d) =>
      viewed(s, d, "supplier", "nation", "region")
      s.sql("""
        SELECT r.r_name, n.n_name, count(*) AS cnt
        FROM supplier s
        JOIN nation n ON s.s_nationkey = n.n_nationkey
        JOIN region r ON n.n_regionkey = r.r_regionkey
        GROUP BY ROLLUP (r.r_name, n.n_name)""")
    },

    // Window top-k through SQL text — in sessions with GraftExtensions the
    // injected WindowTopKRewrite rule turns this parsed row_number/filter
    // shape into the bounded-heap TopKByScore aggregate, proving optimizer
    // injection reaches the SQL interface too.
    QDef("x_sql_window_topk",
      """WITH cnt AS (
        |  SELECT coalesce(c_nationkey, -1) AS nid,
        |    CAST(count(*) AS DOUBLE) AS cnt
        |  FROM customer GROUP BY 1),
        |j AS (
        |  SELECT c.nid, c.cnt, n.n_regionkey FROM cnt c
        |  JOIN nation n ON n.n_nationkey = c.nid),
        |r AS (
        |  SELECT nid, cnt, n_regionkey,
        |    CAST(row_number() OVER (
        |      PARTITION BY n_regionkey ORDER BY cnt DESC, nid) AS INT) AS rk
        |  FROM j)
        |SELECT nid, cnt, n_regionkey, rk FROM r WHERE rk <= 2""".stripMargin) { (s, d) =>
      viewed(s, d, "customer", "nation")
      s.sql("""
        WITH cnt AS (
          SELECT coalesce(c_nationkey, -1L) AS nid,
            CAST(count(*) AS DOUBLE) AS cnt
          FROM customer GROUP BY 1),
        j AS (
          SELECT c.nid, c.cnt, n.n_regionkey FROM cnt c
          JOIN nation n ON n.n_nationkey = c.nid),
        r AS (
          SELECT nid, cnt, n_regionkey,
            CAST(row_number() OVER (
              PARTITION BY n_regionkey ORDER BY cnt DESC, nid) AS INT) AS rk
          FROM j)
        SELECT nid, cnt, n_regionkey, rk FROM r WHERE rk <= 2""")
    },

    // The deterministic split assignment as pure SQL text — the sampling
    // surface is plain arithmetic, so a SQL-first user gets the identical
    // contamination-safe splits with no Scala API at all. Same hash, same
    // thresholds, same oracle family as x_split_assign.
    QDef("x_sql_split", {
      val b = graft.llm.Sampling.hashBucketSql("doc_id")
      s"""SELECT lang,
         |  CASE WHEN $b < ${4294967296L / 100 * 80} THEN 'train'
         |       WHEN $b < ${4294967296L / 100 * 90} THEN 'val'
         |       ELSE 'test' END AS split,
         |  count(*) AS docs
         |FROM documents GROUP BY 1, 2""".stripMargin }) { (s, d) =>
      viewed(s, d, "documents")
      val b = graft.llm.Sampling.hashBucketSql("doc_id")
      s.sql(s"""
        SELECT lang,
          CASE WHEN $b < ${4294967296L / 100 * 80} THEN 'train'
               WHEN $b < ${4294967296L / 100 * 90} THEN 'val'
               ELSE 'test' END AS split,
          count(*) AS docs
        FROM documents GROUP BY 1, 2""")
    },

    // Concat-and-chunk sequence packing as ONE SQL string through Spark's
    // parser/optimizer (same prefix-sum window the Dataset API plans);
    // shares the DuckDB oracle with x_pack_chunks, so both interfaces are
    // held to the same ground truth.
    QDef("x_sql_pack_chunks", TrainPrep.PackChunksOracle) { (s, d) =>
      viewed(s, d, "documents")
      s.sql("""
        WITH d AS (
          SELECT source AS shard, doc_id,
            CAST(size(split(text, ' ', -1)) AS BIGINT) AS toks
          FROM documents),
        c AS (
          SELECT shard, doc_id, toks,
            sum(toks) OVER (PARTITION BY shard ORDER BY doc_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS end_off
          FROM d)
        SELECT shard, doc_id, toks, end_off - toks AS start_off,
          (end_off - toks) div 128 AS first_window,
          (end_off - 1) div 128 AS last_window,
          (end_off - 1) div 128 > (end_off - toks) div 128 AS spans_boundary
        FROM c""")
    },

    // The FULL substring-dedup pipeline (windows → cross-doc dups → span
    // merge → interval-union cut) as ONE SQL string: lateral posexplode of
    // xxhash64 windows, min≠max duplicate aggregate, gaps-and-islands span
    // merge, and the same aggregate-HOF stitcher the Dataset API plans.
    // Shares StarExt.DedupCleanOracle with x_dedup_clean.
    QDef("x_sql_dedup_clean", StarExt.DedupCleanOracle) { (s, d) =>
      viewed(s, d, "documents")
      // The window-hash explode `w` feeds BOTH the duplicate aggregate
      // and the island join; their exchanges differ (partial-agg rows vs
      // raw rows), so nothing reuses and the posexplode+xxhash pass runs
      // twice — materialize it once (the x_sql_kcore from-birth rule).
      s.sql("""
        SELECT doc_id AS id, pos, wkey
        FROM documents
        LATERAL VIEW posexplode(transform(sequence(0, length(text) - 40),
          i -> xxhash64(substring(text, i + 1, 40)))) t AS pos, wkey
        WHERE length(text) >= 40""")
        .transform(materialized("w"))
      s.sql("""
        WITH dup AS (SELECT wkey FROM w GROUP BY wkey HAVING min(id) <> max(id)),
        isl AS (
          SELECT id, pos,
            pos - row_number() OVER (PARTITION BY id ORDER BY pos) AS grp
          FROM w JOIN dup USING (wkey)),
        sp AS (
          SELECT id, min(pos) AS s, max(pos) + 40 AS e
          FROM isl GROUP BY id, grp),
        lst AS (
          SELECT id, sort_array(collect_list(struct(s, e))) AS spl
          FROM sp GROUP BY id),
        stitched AS (
          SELECT d.doc_id, d.text,
            CASE WHEN l.spl IS NULL THEN d.text
            ELSE aggregate(l.spl, named_struct('cur', 0, 'acc', ''),
              (st, x) -> named_struct(
                'cur', greatest(st.cur, x.e),
                'acc', concat(st.acc,
                  substring(d.text, st.cur + 1, x.s - st.cur))),
              st -> concat(st.acc, substring(d.text, st.cur + 1)))
            END AS clean_text
          FROM documents d LEFT JOIN lst l ON d.doc_id = l.id)
        SELECT doc_id, clean_text,
          CAST(length(text) - length(clean_text) AS BIGINT) AS removed_chars
        FROM stitched""")
    },

    // Temperature sampling as ONE SQL string: the n^0.5 rate fit, the
    // round-9-then-floor integer thresholds, and the deterministic pmod
    // hash filter all through the parser — same DuckDB oracle as the
    // Dataset-API x_sample_temperature.
    QDef("x_sql_temperature", StarExt.TemperatureOracle) { (s, d) =>
      viewed(s, d, "documents")
      s.sql("""
        WITH tcnt AS (SELECT source AS g, count(*) AS n FROM documents GROUP BY 1),
        tz AS (SELECT sum(power(CAST(n AS DOUBLE), 0.5)) AS z FROM tcnt),
        tr AS (
          SELECT g, CAST(floor(round(least(1.0D,
            200 * power(CAST(n AS DOUBLE), 0.5) / (z * n)), 9)
            * 4294967296.0D) AS BIGINT) AS t
          FROM tcnt CROSS JOIN tz)
        SELECT d.doc_id, d.source FROM documents d
        JOIN tr ON tr.g = d.source
        WHERE pmod(pmod(d.doc_id, 2147483648L) * 2654435761L, 4294967296L) < t""")
    },

    // The CCNet bigram-LM quality score as ONE SQL string: token filter,
    // shifted-slice bigrams through HOFs (filter/zip_with/slice in SQL
    // text), the two count models, and the smoothed NLL — same DuckDB
    // oracle as the Dataset-API x_text_lm_score.
    QDef("x_sql_lm_score",
      s"""WITH ${StarExt.LmNllCtes}
         |SELECT doc_id, n_bigrams, nll FROM nlls""".stripMargin) { (s, d) =>
      viewed(s, d, "documents")
      s.sql("""
        WITH ft AS (
          SELECT doc_id, filter(split(text, ' '), x -> x != '') AS t
          FROM documents),
        toks AS (SELECT explode(t) AS w FROM ft),
        uni AS (SELECT w, count(1) AS cw FROM toks GROUP BY w),
        vs AS (SELECT count(1) AS v FROM uni),
        bg AS (
          SELECT doc_id, b.w1, b.w2 FROM (
            SELECT doc_id, explode(zip_with(
              slice(t, 1, greatest(size(t) - 1, 0)),
              slice(t, 2, greatest(size(t) - 1, 0)),
              (a, b) -> named_struct('w1', a, 'w2', b))) AS b FROM ft)),
        model AS (SELECT w1, w2, count(1) AS cb FROM bg GROUP BY w1, w2),
        docbg AS (SELECT doc_id, w1, w2, count(1) AS k
          FROM bg GROUP BY doc_id, w1, w2)
        SELECT doc_id, CAST(sum(k) AS BIGINT) AS n_bigrams,
          round(-sum(k * ln((cb + 1) / (cw + v))) / sum(k), 6) AS nll
        FROM docbg JOIN model USING (w1, w2)
        JOIN uni ON uni.w = docbg.w1
        CROSS JOIN vs
        GROUP BY doc_id""")
    },

    // DSIR importance weights as ONE SQL string: hashed unigram+bigram
    // features through nested HOF lambdas, the two add-one multinomials
    // with a sequence() bucket spine, nano-nat quantization, and the
    // integer-space nano->micro rounding — same DuckDB oracle as the
    // Dataset-API x_dsir_weights.
    QDef("x_sql_dsir", {
      s"""WITH ${TrainPrep.DsirCtes}
         |SELECT doc_id, logw FROM dwts""".stripMargin }) { (s, d) =>
      viewed(s, d, "documents")
      s.sql("""
        WITH ft AS (
          SELECT doc_id, source, filter(split(text, ' '), x -> x != '') AS t
          FROM documents),
        fb AS (
          SELECT doc_id, source = 'src0' AS is_t,
            concat(
              transform(t, tok ->
                (CAST(ascii(substr(concat(tok, '___'), 1, 1))*65536
                  + ascii(substr(concat(tok, '___'), 2, 1))*256
                  + ascii(substr(concat(tok, '___'), 3, 1)) AS BIGINT)
                  + CAST(length(tok) AS BIGINT)*16777216) % 64),
              zip_with(
                slice(t, 1, greatest(size(t) - 1, 0)),
                slice(t, 2, greatest(size(t) - 1, 0)),
                (a, b) ->
                  (((CAST(ascii(substr(concat(a, '___'), 1, 1))*65536
                    + ascii(substr(concat(a, '___'), 2, 1))*256
                    + ascii(substr(concat(a, '___'), 3, 1)) AS BIGINT)
                    + CAST(length(a) AS BIGINT)*16777216) * 1000003L
                   + (CAST(ascii(substr(concat(b, '___'), 1, 1))*65536
                    + ascii(substr(concat(b, '___'), 2, 1))*256
                    + ascii(substr(concat(b, '___'), 3, 1)) AS BIGINT)
                    + CAST(length(b) AS BIGINT)*16777216))
                   % 2147483647L) % 64)) AS buckets
          FROM ft),
        feats AS (SELECT doc_id, is_t, explode(buckets) AS j FROM fb),
        cnt AS (
          SELECT j, sum(CASE WHEN is_t THEN 1L ELSE 0L END) AS tc,
            sum(CASE WHEN is_t THEN 0L ELSE 1L END) AS rc
          FROM feats GROUP BY j),
        spine AS (SELECT explode(sequence(0L, 63L)) AS j),
        fill AS (
          SELECT s.j, coalesce(tc, 0L) AS tc, coalesce(rc, 0L) AS rc
          FROM spine s LEFT JOIN cnt ON cnt.j = s.j),
        tot AS (SELECT sum(tc) AS tn, sum(rc) AS rn FROM fill),
        lr AS (
          SELECT j, CAST(round((ln(CAST(tc + 1 AS DOUBLE) / (tn + 64))
            - ln(CAST(rc + 1 AS DOUBLE) / (rn + 64))) * 1e9) AS BIGINT) AS lrn
          FROM fill CROSS JOIN tot)
        SELECT d.doc_id,
          CAST(round(coalesce(sum(lrn), 0L) / 1000.0D) AS BIGINT) / 1000000.0D
            AS logw
        FROM documents d
        LEFT JOIN (SELECT doc_id, j FROM feats WHERE NOT is_t) f
          ON f.doc_id = d.doc_id
        LEFT JOIN lr ON lr.j = f.j
        WHERE NOT (d.source = 'src0')
        GROUP BY d.doc_id""")
    },

    // Group-aware split through the parser: the unrolled 31-ary string
    // hash + threshold CASE is dialect-portable SQL, so the SAME text that
    // serves as the DuckDB oracle runs as Spark SQL — the twin is literal.
    QDef("x_sql_split_group", {
      val b = Sampling.groupHashBucketSql("source")
      s"""SELECT source,
         |  CASE WHEN $b < ${4294967296L / 100 * 80} THEN 'train'
         |       WHEN $b < ${4294967296L / 100 * 90} THEN 'val'
         |       ELSE 'test' END AS split,
         |  count(*) AS docs
         |FROM documents GROUP BY 1, 2""".stripMargin }) { (s, d) =>
      viewed(s, d, "documents")
      val b = Sampling.groupHashBucketSql("source")
      s.sql(s"""SELECT source,
        CASE WHEN $b < ${4294967296L / 100 * 80} THEN 'train'
             WHEN $b < ${4294967296L / 100 * 90} THEN 'val'
             ELSE 'test' END AS split,
        count(*) AS docs
        FROM documents GROUP BY 1, 2""")
    },

    // Token-budget selection as ONE SQL string — the same two-pass
    // histogram shape as Curation.budgetSelect (bounded floor(score·1000)
    // bins, KB prefix-sum window, boundary-bin-only exact sort) pushed
    // through the parser: CTEs, window frames over the histogram, a
    // partitioned window inside the straddling bin, UNION ALL of the two
    // keep paths. Same DuckDB oracle (naive global cumsum) as
    // x_budget_select — the set equality is the point.
    QDef("x_sql_budget", TrainPrep.BudgetOracle) { (s, d) =>
      viewed(s, d, "documents")
      s.sql("""
        WITH sc AS (
          SELECT doc_id,
            round(CAST((length(text) - length(replace(text, ' the ', ''))) / 5 AS INT)
                / size(filter(split(text, ' '), x -> x != '')) * 0.5
              + least(CAST(length(text) AS DOUBLE) / 1000, 1.0D) * 0.5, 6) AS score,
            CAST(size(filter(split(text, ' '), x -> x != '')) AS BIGINT) AS toks
          FROM documents),
        d AS (
          SELECT doc_id, score, toks, CAST(floor(score * 1000) AS BIGINT) AS bin
          FROM sc WHERE score IS NOT NULL),
        h AS (SELECT bin, sum(toks) AS bt FROM d GROUP BY bin),
        v AS (
          SELECT bin, bt, coalesce(sum(bt) OVER (ORDER BY bin DESC
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0L) AS bef
          FROM h),
        m AS (
          SELECT bin, bef, bef + bt <= 9000 AS keep_all,
            bef < 9000 AND bef + bt > 9000 AS bnd
          FROM v)
        SELECT doc_id, score, toks FROM d JOIN m USING (bin) WHERE keep_all
        UNION ALL
        SELECT doc_id, score, toks FROM (
          SELECT d.doc_id, d.score, d.toks,
            bef + sum(toks) OVER (PARTITION BY bin ORDER BY score DESC, doc_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
          FROM d JOIN m USING (bin) WHERE bnd)
        WHERE cum <= 9000""")
    }
  )
}
