package graft.queries

import graft.{QDef, Tables}
import org.apache.spark.sql.functions._

/** Round-60 batch (round 14): the last two documented canary reads wired
  * to REGISTERED dispatches — the spatial-join formulation choice
  * (x_grid_knn_auto, the r13 "a human still acts on the grid read"
  * residual) and the IVF probe width (x_sim_ivf_auto, the r13 "extend
  * the dispatch pattern to one more tiered family" task). Both follow
  * the R59 recipe: the decision is an integer comparison computed
  * identically in the engine (bounded collects at plan build) and in the
  * oracle (the same counts in SQL), the chosen branch is an OUTPUT
  * column, and the oracle unions the REGISTERED tiers' own CTE pipelines
  * (string surgery on the shared texts, so dispatch and tiers cannot
  * drift), each guarded by the branch predicate.
  *
  * Scale shape: each dispatch adds only its canary to the dispatched
  * pass — the grid read is one grouped aggregate over the bounded
  * (≤360-cell) frame; the IVF read is the bounded-probe recall canary
  * (10 queries), the same measurement an ANN deployment runs before
  * serving.
  */
object R60Ops {

  /** The x_grid_knn_auto oracle: the x_grid_density bill decides the
    * formulation (2·pairs > 64·n — [[TierSelect.gridRegimeExact]]), the
    * REGISTERED x_grid_knn pipeline computes the answer (both engine
    * formulations are result-identical — the dispatch changes the PLAN,
    * not the semantics), and the choice rides the output as `mode`. */
  private[queries] val GridKnnAutoSql: String = {
    val dAnchor = "SELECT n_points"
    val dCut = R56Ops.GridDensitySql.lastIndexOf(dAnchor)
    require(dCut > 0 && R56Ops.GridDensitySql.startsWith("WITH "),
      "GridDensitySql anchors moved — update GridKnnAutoSql")
    val densityCtes = R56Ops.GridDensitySql.substring(5, dCut).trim
    val kAnchor = "SELECT id, nn, CAST(d2 AS BIGINT) AS d2 FROM r WHERE rn = 1"
    require(R9Ops.GridKnnSql.startsWith("WITH ")
      && R9Ops.GridKnnSql.endsWith(kAnchor),
      "GridKnnSql anchors moved — update GridKnnAutoSql")
    val knnCtes = R9Ops.GridKnnSql
      .substring(5, R9Ops.GridKnnSql.length - kAnchor.length).trim
    s"""WITH $densityCtes,
       |flag AS (SELECT CASE
       |    WHEN 2 * (pairs_same + pairs_cross) > 64 * n_points
       |    THEN 'short_circuit' ELSE 'direct' END AS m FROM sp, cp),
       |$knnCtes,
       |res AS ($kAnchor)
       |SELECT flag.m AS mode, id, nn, d2 FROM res, flag""".stripMargin
  }

  /** The x_sim_ivf_auto oracle: the nprobe=1 bounded-probe recall canary
    * (the REGISTERED x_sim_ivf_recall chain) decides the probe width
    * (10·Σhits ≥ 9·k·|probes| keeps nprobe=1, else the registered
    * nprobe=4 tier — [[TierSelect.ivfNprobe]]), then both tiers' chains
    * run, each branch guarded by the decision. */
  private[queries] val IvfAutoSql: String =
    s"""WITH ${StarExt.IvfRecallHead},
       |${StarExt.ivfSearchCtes(1, "")},
       |flag AS (SELECT CASE
       |    WHEN (SELECT 10 * sum(hits) FROM rec)
       |      >= (SELECT 9 * 3 * count(*) FROM rec) THEN 1
       |    ELSE 4 END AS np),
       |${StarExt.ivfSearchCtes(4, "4")}
       |SELECT CAST(1 AS INTEGER) AS nprobe, qid, hits, recall
       |FROM rec, flag WHERE flag.np = 1
       |UNION ALL
       |SELECT CAST(4 AS INTEGER) AS nprobe, qid, hits, recall
       |FROM rec4, flag WHERE flag.np = 4""".stripMargin

  val defs: Seq[QDef] = Seq(

    // AUTO-DISPATCHED GRID NN: TierSelect.gridRegime's documented
    // go/no-go read (2·candidate_pairs/n_points vs the 64/point budget —
    // an order of magnitude from both measured clusters: 1.9-35/pt at
    // sf0.001-0.01, 360-3.6e4/pt from sf0.1 up) chooses the FORMULATION:
    // "linear" keeps the direct cell-keyed probe (every point searches
    // its 3×3 neighborhood — O(corpus × density), the cheaper plan when
    // density is low: no position collapse, no second join); "quadratic"
    // commits the co-location short-circuit (position collapse + one
    // bounded-domain probe — O(corpus) at ANY density, measured 134 s →
    // 6.2 s at sf1h, BENCH_NOTES r11). Both formulations return the
    // IDENTICAL radius-bounded NN rows, so the oracle runs the one
    // registered pipeline and hash-gates the DECISION via the mode
    // column. Both branches run at the shipped gates: sf0.01 reads
    // 35/pt → direct, sf0.1 reads 360/pt → short_circuit.
    QDef("x_grid_knn_auto", GridKnnAutoSql) { (s, d) =>
      val t = Tables(s, d)
      val bill = R56Ops.gridDensityFrame(t.customer)
        .select(col("n_points"), col("candidate_pairs")).first()
      val regime = TierSelect.gridRegimeExact(
        bill.getLong(0), bill.getLong(1))
      val pts = R9Ops.gridPoints(t)
      val (mode, res) =
        if (regime == "quadratic")
          ("short_circuit", R9Ops.gridShortCircuit(pts))
        else
          ("direct", R9Ops.gridCellSearch(
            pts.select(col("id"), col("x"), col("y")), pts))
      res.select(lit(mode).as("mode"), col("id"), col("nn"), col("d2"))
    },

    // AUTO-DISPATCHED IVF PROBE WIDTH: the bounded-probe recall canary
    // (nprobe=1 floor over the 10-query probe set — the measurement an
    // ANN user runs anyway, cost bounded by the probe set, not the
    // corpus) decides nprobe mechanically: mean recall@3 ≥ 0.9 keeps the
    // single-cell probe; below it, the registered nprobe=4 tier (the
    // documented lever: 0.833 → 0.933 on this corpus, SCALE.md). The
    // chosen width is an output column; the oracle recomputes the
    // identical integer decision from the identical canary chain and
    // unions both tiers. At the shipped gates the canary reads 26/25/24
    // of 30 at sf0.001/sf0.01/sf0.1 — all below the 27 target, so the
    // escalated branch runs everywhere real; the stay branch is
    // exercised by R60OpsSpec on a written well-separated corpus. The
    // corpus side never re-shuffles at either width — only the
    // (broadcast-sized) query side fans out.
    QDef("x_sim_ivf_auto", IvfAutoSql) { (s, d) =>
      val emb = Tables(s, d).embeddings
      val queries = emb.filter(col("vec_id") < 10)
      val cents = emb.filter(col("vec_id") < 8)
      val canary = graft.llm.Similarity.ivfRecall(queries, emb, cents, 3)
        .agg(coalesce(sum("hits"), lit(0L)).cast("long").as("h"),
          count(lit(1)).as("nq")).first()
      val np = TierSelect.ivfNprobe(canary.getLong(0), canary.getLong(1))
      graft.llm.Similarity.ivfRecall(queries, emb, cents, 3, nprobe = np)
        .select(lit(np).as("nprobe"), col("qid"), col("hits"), col("recall"))
    })
}
