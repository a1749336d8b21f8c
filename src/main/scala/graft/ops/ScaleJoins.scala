package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Join strategies for hostile data distributions at cluster scale.
  *
  * AQE (on by default in Spark 4) already splits skewed SHUFFLE partitions;
  * explicit salting still matters when one side must be replicated anyway
  * (skewed key ⋈ medium dimension too big to broadcast) or when AQE's
  * per-partition splitting can't help (single giant key). Bucketing removes
  * the shuffle entirely for stable fact-fact join keys — the layout decision
  * that matters most at 100 TB, where a lineitem⋈orders shuffle is the
  * dominant cost of every query that joins them.
  */
object ScaleJoins {

  /** Salted inner equi-join: the big (skewed) side gets a per-row salt in
    * [0, buckets); the small side is replicated `buckets` times; the join
    * key becomes (key, salt) so a hot key spreads over `buckets` tasks.
    * Result-identical to `big.join(small, key)` — salt only changes the
    * partitioning, never the matches. */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String, buckets: Int): DataFrame = {
    require(buckets > 0)
    // monotonically_increasing_id() is NOT stable across task retries — and
    // that is safe here by construction: the small side is FULLY replicated
    // over every salt value, so a row's salt only chooses WHICH replica it
    // matches, never WHETHER it matches. Result membership is retry-invariant.
    val salted = big.withColumn("__salt",
      pmod(monotonically_increasing_id(), lit(buckets.toLong)).cast("int"))
    val replicated = small.withColumn("__salt",
      explode(sequence(lit(0), lit(buckets - 1))))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }

  /** Semi-join accelerated by a bloom runtime filter — the standard 100 TB
    * join pattern (what Spark's own InjectRuntimeFilter plans when it
    * fires): build a KB-sized bloom over the (filtered) dim keys, probe it
    * as a PRE-FILTER on the fact side so non-matching fact rows die at the
    * scan instead of travelling through the join's exchange, then run the
    * exact semi-join to remove the bloom's false positives. Result is
    * hash-identical to the plain semi-join by construction (a bloom has no
    * false negatives); the win is the shuffle volume, proven in
    * ScaleJoinsSpec (survivors ≪ fact rows).
    *
    * The two driver actions (count to size the filter, first() to
    * materialize it) are KB-scalar barriers — the same build-once/broadcast
    * shape as the reference's collect-scalar S4, not a data collect. */
  def bloomSemiJoin(fact: DataFrame, dim: DataFrame,
      factKey: String, dimKey: String): DataFrame = {
    import graft.functions.GraftFunctions.{bloomFilterAgg, mightContain}
    import org.apache.spark.sql.functions.col
    val n = math.max(dim.count(), 1L)
    val bf = dim.agg(bloomFilterAgg(col(dimKey), n, n * 20L).as("f"))
      .first().getAs[Array[Byte]](0)
    fact.filter(mightContain(bf, col(factKey)))
      .join(dim.select(col(dimKey)), col(factKey) === col(dimKey), "left_semi")
  }

  /** Write a DataFrame as a bucketed+sorted table: co-located, pre-sorted
    * layout so later equi-joins/aggregations on `key` plan with NO shuffle
    * exchange (SortMergeJoin reads buckets directly). With `path` the table
    * is external (data at the given location); otherwise managed in the
    * session warehouse. */
  def writeBucketed(df: DataFrame, table: String, key: String, numBuckets: Int,
      path: Option[String] = None): Unit = {
    val w = df.write.mode("overwrite")
      .bucketBy(numBuckets, key).sortBy(key)
      .format("parquet")
    path.fold(w)(p => w.option("path", p)).saveAsTable(table)
  }

  /** FUZZY (edit-distance ≤ 1) equi-blocked join — entity resolution
    * without a cross join. Blocking is the DELETION NEIGHBORHOOD (the
    * FastSS family): each string's block keys are itself plus every
    * one-character deletion, so any two strings within edit distance 1
    * PROVABLY share a key (equal → the string itself; substitution at i →
    * both sides' deletion at i; insert/delete → the longer side's deletion
    * equals the shorter string). Sharing a key does NOT imply distance ≤ 1
    * (deletion at i meeting deletion at j ≠ i can be distance 2), so a
    * `levenshtein` verify runs on CANDIDATES only — the block-join +
    * verify shape every dedup operator here uses.
    *
    * Cost: O(rows · (len+1)) block keys per side, one equi-shuffle on the
    * keys, exact DP only on collisions. The all-pairs formulation this
    * replaces is O(|L|·|R|) distance computations — the thing that cannot
    * exist at 100 TB. Returns left ⋈ right with both columns, distinct
    * pairs. For k > 1, the same construction iterates deletions (key count
    * O(len^k)) — out of scope here. */
  def fuzzyJoinLev1(left: DataFrame, leftCol: String,
      right: DataFrame, rightCol: String): DataFrame = {
    def keyed(df: DataFrame, c: String, out: String) =
      df.select(col(c).as(out),
        explode(array_union(
          array(col(c)),
          expr(s"transform(sequence(0, length($c) - 1), " +
            s"i -> concat(substring($c, 1, i), substring($c, i + 2, length($c))))")))
          .as("__block"))
    keyed(left, leftCol, "__l").join(keyed(right, rightCol, "__r"), "__block")
      .select(col("__l").as(leftCol), col("__r").as(rightCol))
      .distinct()
      .filter(levenshtein(col(leftCol), col(rightCol)) <= 1)
  }
}
