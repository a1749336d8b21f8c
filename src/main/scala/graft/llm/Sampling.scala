package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic sampling and dataset splitting for training-data curation.
  *
  * Everything here is a PURE FUNCTION of the row's id — never of `rand()`,
  * partitioning, or row order. That is the production requirement for
  * corpus work at scale:
  *
  *  - **Reproducible**: re-running the pipeline (or re-running after a
  *    task retry / different partition count / AQE re-plan) yields the
  *    identical sample. `rand()`-based sampling breaks on every one of
  *    those; `TABLESAMPLE` isn't even stable across scans.
  *  - **Stable under growth**: a document keeps its split assignment when
  *    the corpus around it grows — new docs land in splits without
  *    reshuffling old ones (critical: train/test contamination is
  *    forever, a doc must never migrate from test into train).
  *  - **Join-free and shuffle-free**: assignment is a scan-local
  *    projection; no sampled-id table to broadcast or join.
  *
  * The hash is a Knuth multiplicative mix over the low 31 id bits,
  * `(id & 0x7FFFFFFF) * 2654435761 mod 2^32` — chosen over xxhash64/crc32
  * ONLY because the correctness harness needs the exact same arithmetic on
  * the DuckDB side (no shared hash builtin exists); the operator shape is
  * hash-agnostic, swap in `xxhash64(id)` when cross-engine parity isn't
  * required. The product stays under 2^63 (no ANSI overflow), and the
  * bucket is uniform enough that split sizes land within ~1% of target on
  * the test corpora.
  */
object Sampling {

  /** 32-bit deterministic bucket in [0, 2^32) from an id column. */
  def hashBucket(id: Column): Column =
    pmod(pmod(id.cast("bigint"), lit(2147483648L)) * lit(2654435761L),
      lit(4294967296L))

  private val Full = 4294967296L // 2^32

  /** Add a `split` column: 'train'/'val'/'test' with the given percent
    * cut-points (e.g. 80, 10 → 80/10/10). Assignment is per-id and
    * threshold-based, so enlarging `trainPct` only MOVES the boundary:
    * docs promoted into train come exclusively from val — test membership
    * never changes (the contamination-safety property). */
  def assignSplit(df: DataFrame, idCol: String,
      trainPct: Int = 80, valPct: Int = 10): DataFrame = {
    val b = hashBucket(col(idCol))
    df.withColumn("split",
      when(b < lit(Full / 100 * trainPct), "train")
        .when(b < lit(Full / 100 * (trainPct + valPct)), "val")
        .otherwise("test"))
  }

  /** 31-ary polynomial hash of a STRING group key over its first 8 chars
    * + length, into [0, 2^31) — unrolled (no loops) so the identical
    * expression renders in DuckDB ([[groupHashBucketSql]]). 8 chars
    * disambiguates real group keys (sources, domains, languages); the
    * 3-char word hash used for shingles is too collision-prone to route
    * whole groups. Null groups hash like the empty string. */
  def groupHashBucket(g: Column): Column = {
    val padded = rpad(coalesce(g, lit("")), 8, "_")
    val poly = (1 to 8)
      .map(i => ascii(substring(padded, i, 1)).cast("bigint")
        * lit(math.pow(31, i - 1).toLong))
      .reduce(_ + _) + length(coalesce(g, lit(""))).cast("bigint") * lit(2147483659L)
    hashBucket(pmod(poly, lit(2147483648L)))
  }

  /** DuckDB rendering of [[groupHashBucket]] — kept beside the Scala so
    * the two can only drift in one place. */
  def groupHashBucketSql(gExpr: String): String = {
    val poly = (1 to 8)
      .map(i => s"CAST(ascii(substr(rpad(coalesce($gExpr, ''), 8, '_'), $i, 1))" +
        s" AS BIGINT) * ${math.pow(31, i - 1).toLong}")
      .mkString(" + ")
    hashBucketSql(s"(($poly + length(coalesce($gExpr, '')) * 2147483659) % 2147483648)")
  }

  /** GROUP-aware split assignment (the GroupKFold posture): every document
    * of a group lands in the SAME split, because the hash is taken over
    * the GROUP key, not the doc id. This is the leakage defense
    * [[assignSplit]] cannot give: near-duplicates concentrate within
    * sources/domains/crawl-snapshots, so id-hashed splits scatter a
    * duplicate cluster across train AND test — group-hashed splits can't.
    * Same scan-local, join-free, growth-stable contract as assignSplit
    * (a new doc of a known group joins its group's split; test membership
    * never changes when trainPct grows). */
  def assignSplitByGroup(df: DataFrame, groupCol: String,
      trainPct: Int = 80, valPct: Int = 10): DataFrame = {
    val b = groupHashBucket(col(groupCol))
    df.withColumn("split",
      when(b < lit(Full / 100 * trainPct), "train")
        .when(b < lit(Full / 100 * (trainPct + valPct)), "val")
        .otherwise("test"))
  }

  /** Per-stratum deterministic downsampling: keep a row iff its hash
    * bucket clears the stratum's fraction threshold. The scan-local form
    * of `df.stat.sampleBy`, minus the nondeterminism: same input → same
    * sample, any cluster, any day. Strata absent from `fractions` are
    * dropped (fraction 0). */
  def stratifiedSample(df: DataFrame, strataCol: String,
      fractions: Map[String, Double], idCol: String): DataFrame = {
    val b = hashBucket(col(idCol))
    val threshold = fractions.foldLeft(lit(0L)) { case (acc, (k, f)) =>
      when(col(strataCol) === lit(k), lit((f * Full).toLong)).otherwise(acc)
    }
    df.filter(b < threshold)
  }

  /** Cap each group at `k` rows, chosen uniformly-without-replacement by
    * hash order (ties broken by id) — "at most k docs per domain/language",
    * the standard anti-dominance cap before training. Deterministic for
    * the same reasons as above; the window shuffles once on the group key,
    * and Spark 4's InferWindowGroupLimit turns the rank filter into a
    * per-partition group limit (top-k pushed BELOW the exchange), so the
    * shuffle carries at most k rows per group per input partition — the
    * same partial-top-k discipline as [[graft.functions.TopKByScore]]. */
  def perKeyCap(df: DataFrame, keyCol: String, idCol: String, k: Int): DataFrame = {
    val w = Window.partitionBy(col(keyCol))
      .orderBy(hashBucket(col(idCol)), col(idCol))
    df.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .drop("rk")
  }

  /** DuckDB rendering of [[hashBucket]] — kept beside the Scala so the two
    * can only drift in one place. */
  def hashBucketSql(idExpr: String): String =
    s"(($idExpr % 2147483648) * 2654435761) % 4294967296"

  /** Per-row WEIGHTED sampling: keep a row with probability equal to its
    * weight (clamped to [0, 1]) — but deterministically, by comparing the
    * id's hash bucket against the weight-scaled threshold. The corpus-
    * curation form: pass a quality score as the weight and low-quality
    * documents survive in proportion to their score instead of a hard
    * cutoff (the soft-filter recipe), with the same reproducibility
    * guarantees as [[assignSplit]]. A row's fate depends only on (id,
    * weight), so re-runs and retries agree; raising a doc's weight can
    * only ever ADD it (its hash is fixed, the threshold moves). */
  def weightedSample(df: DataFrame, idCol: String, weight: Column): DataFrame =
    df.filter(hashBucket(col(idCol)).cast("double") <
      greatest(least(weight, lit(1.0)), lit(0.0)) * lit(4294967296.0))

  /** Deterministic NEGATIVE sampling for contrastive training: k pseudo-
    * random non-matching partners per anchor. The distributed analogue of
    * in-batch negatives — docs are hashed into `buckets`, ordered
    * pseudo-randomly (by hash) within each bucket, and each anchor takes
    * the next k docs around the ring as its negatives.
    *
    * Why this shape at scale:
    *  - A global `ORDER BY rand()` pairing is a single-partition sort AND
    *    nondeterministic; uniform random pairing via join needs a dense
    *    global index (another global sort). Here every window is
    *    PER-BUCKET — parallel, bounded by corpus/buckets — and the ring
    *    join is an equi-join on (bucket, position).
    *  - Hash order is pseudo-random with respect to any real attribute,
    *    so ring neighbors are as good as uniform draws for "random
    *    non-match" purposes, while staying reproducible run to run.
    *  - Every anchor gets EXACTLY k negatives (a ring has no edge cases),
    *    provided bucket sizes exceed k — size buckets ≥ 100·k.
    *
    * Output: (anchor_id, slot ∈ [1, k], neg_id), neg_id ≠ anchor_id. */
  def negativeSamples(df: DataFrame, idCol: String, k: Int, buckets: Int): DataFrame = {
    val base = df.select(col(idCol).cast("bigint").as("anchor_id"))
      .withColumn("bkt", pmod(hashBucket(col("anchor_id")), lit(buckets)))
    val ring = Window.partitionBy("bkt")
      .orderBy(hashBucket(col("anchor_id")), col("anchor_id"))
    // pinned: referenced by both sides of the ring self-join below —
    // without it the scan+window lineage executes twice
    val pos = Dedup.pin(base
      .withColumn("pos", row_number().over(ring) - 1)
      .withColumn("cnt", count(lit(1)).over(Window.partitionBy("bkt"))))
    val slots = pos
      .withColumn("slot", explode(sequence(lit(1), lit(k))))
      .withColumn("npos", pmod(col("pos") + col("slot"), col("cnt")))
    slots.alias("a")
      .join(pos.alias("n"),
        col("a.bkt") === col("n.bkt") && col("a.npos") === col("n.pos"))
      .filter(col("n.anchor_id") =!= col("a.anchor_id")) // tiny buckets only
      .select(col("a.anchor_id"), col("a.slot"), col("n.anchor_id").as("neg_id"))
  }

  /** TEMPERATURE-based group rebalancing — the multilingual-pretraining
    * recipe (mT5 / XLM-R: sample group g with probability ∝ n_g^α; α < 1
    * flattens the size distribution toward low-resource groups, α = 1 is
    * proportional, α = 0 is uniform-per-group). Given a document budget
    * B, group g's keep-rate is `min(1, B·n_g^α / (Z·n_g))` with
    * Z = Σ_h n_h^α, applied as the same deterministic hash-threshold
    * filter as [[stratifiedSample]] — membership is a pure function of
    * (id, group counts), so the sample replays and is monotone in B.
    *
    * Shape at scale: one group-count aggregate (map-side combined, KB
    * result, pinned — two consumers), rates broadcast back onto the scan,
    * per-row fate decided map-side. The float discipline: the rate is
    * rounded to 9 decimals THEN floored to an integer threshold in both
    * engines, so `pow`/sum ulp drift cannot move the integer boundary the
    * hash is compared against. */
  def temperatureSample(df: DataFrame, groupCol: String, idCol: String,
      alpha: Double, budget: Long): DataFrame = {
    val counts = Dedup.pin(
      df.groupBy(col(groupCol).as("__g")).agg(count(lit(1)).as("__n")))
    val z = counts.agg(sum(pow(col("__n"), alpha)).as("__z"))
    val rates = counts.crossJoin(broadcast(z))
      .select(col("__g"),
        floor(round(least(lit(1.0),
          lit(budget) * pow(col("__n"), alpha) / (col("__z") * col("__n"))), 9)
          * lit(4294967296.0d)).cast("bigint").as("__t"))
    df.join(broadcast(rates), col(groupCol) <=> col("__g"))
      .filter(hashBucket(col(idCol)) < col("__t"))
      .drop("__g", "__t")
  }

  /** K-FOLD assignment for cross-validation: `fold = hash(id) mod k` —
    * the same scan-local, join-free, growth-stable contract as
    * [[assignSplit]] (a doc's fold depends only on its id, so folds are
    * reproducible across runs, clusters, and corpus revisions; every doc
    * lands in exactly one fold). Train set for fold f = `fold =!= f`. */
  def kFold(df: DataFrame, idCol: String, k: Int): DataFrame =
    df.withColumn("fold", pmod(hashBucket(col(idCol)), lit(k.toLong)).cast("int"))

  /** CLASS-BALANCED oversampling: replicate every row of label L
    * `ceil(maxClassCount / count(L))` times so each class's total reaches
    * at least the majority class's (within one multiple — integer-ratio
    * oversampling, the deterministic form; fractional top-up would need a
    * per-row coin). Shape at scale: one small label-counts aggregate
    * broadcast back onto the scan, then `explode(sequence(...))` amplifies
    * rows MAP-SIDE — the corpus is never shuffled, and the output lands
    * already interleaved across partitions for downstream shuffles to mix.
    * Output: input columns + `copy` ∈ [1, n_copies]. */
  def balanceClasses(df: DataFrame, labelCol: String): DataFrame = {
    // null-safe join: a NULL label is a class like any other — a plain
    // equi-join would silently DROP every null-labeled row (NULL != NULL)
    val counts = df.groupBy(col(labelCol).as("__lbl"))
      .agg(count(lit(1)).as("__cnt"))
    val target = counts.agg(max(col("__cnt")).as("__max"))
    df.join(broadcast(counts), col(labelCol) <=> col("__lbl"))
      .crossJoin(broadcast(target))
      .withColumn("copy",
        explode(sequence(lit(1L), ceil(col("__max") / col("__cnt")).cast("bigint"))))
      .drop("__lbl", "__cnt", "__max")
  }
}
