package graft.queries

import graft.{QDef, Tables}
import org.apache.spark.sql.functions._

/** Round-26 batch: training-corpus diagnostics — the dataset-card
  * summary, a curation threshold sweep, split n-gram novelty
  * (memorization risk), cross-source vocabulary overlap, and the
  * document-length power-law tail — one tokenize/aggregate corpus pass
  * each, with all post-aggregate frames source-/threshold-/bin-bounded.
  */
object R26Ops {

  val defs: Seq[QDef] = Seq(

    // DATASET CARD: the per-source summary block every corpus release
    // ships — docs, token statistics, language spread, short-doc share.
    // ONE scan-local token-count projection + one grouped pass.
    QDef("x_dataset_card",
      """WITH d AS (SELECT source, lang,
        |  CAST(len(list_filter(string_split(text, ' '), x -> x <> ''))
        |    AS BIGINT) AS toks, n_chars
        |  FROM documents)
        |SELECT source, CAST(count(*) AS BIGINT) AS docs,
        |  CAST(sum(toks) AS BIGINT) AS total_tokens,
        |  round(avg(toks), 4) AS avg_tokens,
        |  CAST(count(DISTINCT lang) AS BIGINT) AS langs,
        |  round(sum(CASE WHEN toks < 50 THEN 1 ELSE 0 END)
        |    / CAST(count(*) AS DOUBLE), 6) AS pct_short,
        |  round(avg(n_chars), 4) AS avg_chars
        |FROM d GROUP BY 1""".stripMargin) { (s, d) =>
      val dd = Tables(s, d).documents.select(col("source"), col("lang"),
        graft.llm.TextOps.tokenCount(col("text")).cast("bigint").as("toks"),
        col("n_chars"))
      dd.groupBy("source").agg(count(lit(1)).as("docs"),
        sum(col("toks")).as("total_tokens"),
        round(avg(col("toks")), 4).as("avg_tokens"),
        countDistinct(col("lang")).as("langs"),
        round(sum(when(col("toks") < 50, 1L).otherwise(0L))
          / count(lit(1)).cast("double"), 6).as("pct_short"),
        round(avg(col("n_chars")), 4).as("avg_chars"))
    },

    // LENGTH-FILTER THRESHOLD SWEEP: how much of the corpus (docs and
    // tokens) survives a minimum-token filter at each candidate
    // threshold — the curation dial chart. A 10-way threshold explode
    // over the per-doc token counts; one grouped pass.
    QDef("x_length_filter_sweep",
      """WITH d AS (SELECT
        |  CAST(len(list_filter(string_split(text, ' '), x -> x <> ''))
        |    AS BIGINT) AS toks
        |  FROM documents),
        |tot AS (SELECT CAST(count(*) AS BIGINT) AS nd,
        |  CAST(sum(toks) AS BIGINT) AS nt FROM d),
        |th AS (SELECT unnest([10,20,30,40,50,60,70,80,90,100]) AS min_toks)
        |SELECT th.min_toks,
        |  CAST(sum(CASE WHEN d.toks >= th.min_toks THEN 1 ELSE 0 END)
        |    AS BIGINT) AS surviving_docs,
        |  round(sum(CASE WHEN d.toks >= th.min_toks THEN 1 ELSE 0 END)
        |    / CAST(max(tot.nd) AS DOUBLE), 6) AS doc_share,
        |  round(sum(CASE WHEN d.toks >= th.min_toks THEN d.toks
        |    ELSE 0 END) / CAST(max(tot.nt) AS DOUBLE), 6) AS token_share
        |FROM d CROSS JOIN th, tot GROUP BY 1""".stripMargin) { (s, d) =>
      val dd = Tables(s, d).documents.select(
        graft.llm.TextOps.tokenCount(col("text")).cast("bigint").as("toks"))
      val tot = dd.agg(count(lit(1)).as("nd"), sum(col("toks")).as("nt"))
      dd.select(col("toks"),
          explode(array((1 to 10).map(i => lit(i * 10)): _*)).as("min_toks"))
        .crossJoin(broadcast(tot))
        .groupBy("min_toks")
        .agg(sum(when(col("toks") >= col("min_toks"), 1L).otherwise(0L))
          .as("surviving_docs"),
          round(sum(when(col("toks") >= col("min_toks"), 1L).otherwise(0L))
            / max(col("nd")).cast("double"), 6).as("doc_share"),
          round(sum(when(col("toks") >= col("min_toks"), col("toks"))
            .otherwise(0L)) / max(col("nt")).cast("double"), 6)
            .as("token_share"))
    },

    // SPLIT N-GRAM NOVELTY: what fraction of the test split's word
    // trigrams never occur in the train split — the memorization /
    // leakage meter for eval sets. Deterministic doc_id-mod split
    // (shared verbatim with the oracle), trigram explode (map-side),
    // distinct-trigram anti-join keyed on the trigram text.
    QDef("x_ngram_novelty",
      """WITH toks AS (
        |  SELECT doc_id, doc_id % 10 >= 8 AS is_test, g.tri
        |  FROM documents,
        |    LATERAL (SELECT concat_ws(' ', w1, w2, w3) AS tri
        |      FROM (SELECT unnest(words[1:len(words)-2]) AS w1,
        |                   unnest(words[2:len(words)-1]) AS w2,
        |                   unnest(words[3:len(words)]) AS w3
        |            FROM (SELECT list_filter(string_split(text, ' '),
        |                    x -> x <> '') AS words))) g),
        |train AS (SELECT DISTINCT tri FROM toks WHERE NOT is_test),
        |test AS (SELECT DISTINCT tri FROM toks WHERE is_test),
        |c AS (SELECT CAST(count(*) AS BIGINT) AS n_test,
        |  CAST(sum(CASE WHEN train.tri IS NULL THEN 1 ELSE 0 END)
        |    AS BIGINT) AS novel
        |  FROM test LEFT JOIN train ON test.tri = train.tri)
        |SELECT n_test AS test_trigrams, novel AS novel_trigrams,
        |  round(novel / CAST(n_test AS DOUBLE), 6) AS novelty_rate
        |FROM c""".stripMargin) { (s, d) =>
      val docs = Tables(s, d).documents
        .select(col("doc_id"), (col("doc_id") % 10 >= 8).as("is_test"),
          expr("filter(split(text, ' '), x -> x != '')").as("words"))
      val tris = docs.select(col("is_test"),
          explode(expr(
            """transform(slice(words, 1, greatest(size(words) - 2, 0)),
              |  (w, i) -> concat_ws(' ', w, words[i + 1], words[i + 2]))"""
              .stripMargin)).as("tri"))
      val train = tris.filter(!col("is_test")).select("tri").distinct()
      val test = tris.filter(col("is_test")).select("tri").distinct()
      val c = test.join(train.withColumnRenamed("tri", "tri2"),
          col("tri") === col("tri2"), "left")
        .agg(count(lit(1)).as("n_test"),
          sum(when(col("tri2").isNull, 1L).otherwise(0L)).as("novel"))
      c.select(col("n_test").as("test_trigrams"),
        col("novel").as("novel_trigrams"),
        round(col("novel") / col("n_test").cast("double"), 6)
          .as("novelty_rate"))
    },

    // CROSS-SOURCE VOCABULARY OVERLAP: Jaccard similarity of the word
    // vocabularies of every source pair — the redundancy screen before
    // mixing sources. One distinct (source, word) pass; the pair join is
    // keyed on the word (vocabulary-scale shuffle, source-pair-bounded
    // output); marginals broadcast.
    QDef("x_vocab_overlap",
      """WITH sw AS (SELECT DISTINCT source, word
        |  FROM (SELECT source,
        |    unnest(list_filter(string_split(text, ' '), x -> x <> ''))
        |      AS word
        |    FROM documents)),
        |m AS (SELECT source, CAST(count(*) AS BIGINT) AS v
        |  FROM sw GROUP BY 1),
        |inter AS (SELECT a.source AS src_a, b.source AS src_b,
        |  CAST(count(*) AS BIGINT) AS both
        |  FROM sw a JOIN sw b ON a.word = b.word AND a.source < b.source
        |  GROUP BY 1, 2)
        |SELECT inter.src_a, inter.src_b, ma.v AS vocab_a, mb.v AS vocab_b,
        |  inter.both,
        |  round(inter.both / CAST(ma.v + mb.v - inter.both AS DOUBLE), 6)
        |    AS jaccard
        |FROM inter JOIN m ma ON inter.src_a = ma.source
        |JOIN m mb ON inter.src_b = mb.source""".stripMargin) { (s, d) =>
      val sw = Tables(s, d).documents
        .select(col("source"),
          explode(split(col("text"), " ", -1)).as("word"))
        .filter(col("word") =!= "").distinct()
      val m = sw.groupBy("source").agg(count(lit(1)).as("v"))
      val b = sw.select(col("source").as("src_b"), col("word"))
      val inter = sw.select(col("source").as("src_a"), col("word"))
        .join(b, Seq("word"))
        .filter(col("src_a") < col("src_b"))
        .groupBy("src_a", "src_b").agg(count(lit(1)).as("both"))
      inter
        .join(broadcast(m.select(col("source").as("src_a"),
          col("v").as("vocab_a"))), "src_a")
        .join(broadcast(m.select(col("source").as("src_b"),
          col("v").as("vocab_b"))), "src_b")
        .select(col("src_a"), col("src_b"), col("vocab_a"), col("vocab_b"),
          col("both"),
          round(col("both")
            / (col("vocab_a") + col("vocab_b") - col("both")).cast("double"),
            6).as("jaccard"))
    },

    // DOCUMENT-LENGTH POWER-LAW TAIL: slope of ln(CCDF) vs ln(length)
    // over eighth-log-spaced length bins — does the corpus have the
    // heavy tail that length-capping policies assume? Bin histogram from
    // one pass; CCDF by a triangular join of the ≤60-row bin frame; the
    // fit is a 1-row regr_slope.
    QDef("x_doclen_powerlaw",
      """WITH d AS (SELECT
        |  CAST(len(list_filter(string_split(text, ' '), x -> x <> ''))
        |    AS BIGINT) AS toks
        |  FROM documents),
        |tot AS (SELECT CAST(count(*) AS BIGINT) AS nd FROM d),
        |b AS (SELECT CAST(floor(ln(toks) * 8) AS BIGINT) AS bin,
        |  CAST(count(*) AS BIGINT) AS c
        |  FROM d WHERE toks > 0 GROUP BY 1),
        |ccdf AS (SELECT a.bin, a.c,
        |  CAST(sum(b2.c) AS BIGINT) AS at_or_above
        |  FROM b a JOIN b b2 ON b2.bin >= a.bin GROUP BY 1, 2),
        |fit AS (SELECT CAST(max(tot.nd) AS BIGINT) AS n_docs,
        |  CAST(count(*) AS BIGINT) AS n_bins,
        |  round(regr_slope(ln(at_or_above / CAST(tot.nd AS DOUBLE)),
        |    bin / 8.0e0), 4) AS alpha
        |  FROM ccdf, tot)
        |SELECT n_docs, n_bins, alpha FROM fit""".stripMargin) { (s, d) =>
      val dd = Tables(s, d).documents.select(
        graft.llm.TextOps.tokenCount(col("text")).cast("bigint").as("toks"))
      val tot = dd.agg(count(lit(1)).as("nd"))
      val b = dd.filter(col("toks") > 0)
        .groupBy(floor(log(col("toks")) * lit(8)).cast("bigint").as("bin"))
        .agg(count(lit(1)).as("c"))
      val b2 = b.select(col("bin").as("bin2"), col("c").as("c2"))
      val ccdf = b.join(broadcast(b2), col("bin2") >= col("bin"))
        .groupBy("bin", "c").agg(sum(col("c2")).as("at_or_above"))
      ccdf.crossJoin(broadcast(tot))
        .agg(max(col("nd")).as("n_docs"),
          count(lit(1)).as("n_bins"),
          round(regr_slope(
            log(col("at_or_above") / col("nd").cast("double")),
            col("bin") / lit(8.0)), 4).as("alpha"))
        .select(col("n_docs"), col("n_bins"), col("alpha"))
    }
  )
}
