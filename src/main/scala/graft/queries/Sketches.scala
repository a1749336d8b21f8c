package graft.queries

import graft.{QDef, Tables}
import org.apache.spark.sql.functions._
import graft.ops.{ScaleJoins, ScaleLayout}

/** Approximate-sketch operators (HyperLogLog cardinality, quantile sketch,
  * bloom filter) — the structures that replace exact distinct/percentile/
  * membership at 100 TB, where the exact forms need unbounded state.
  *
  * Sketch ESTIMATES can't be hash-compared across engines (Spark's HLL++ /
  * KLL / bloom implementations differ from DuckDB's), so each query outputs
  * the EXACT value (oracle-checkable bit-wise) plus a boolean asserting the
  * sketch landed within its documented error bound — the oracle expects
  * `true`, so a sketch drifting out of tolerance fails the round's
  * correctness gate, not just a unit test.
  */
object Sketches {

  /** One bucketed-table directory per JVM, reused across invocations (the
    * `overwrite` saveAsTable rewrites in place) and removed on exit — a
    * fresh temp dir per run would orphan the previous pair every bench
    * iteration. Table-write time is intentionally part of the query timing:
    * the materialization IS the operator being demonstrated. */
  lazy val bucketDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_buckets")
    Runtime.getRuntime.addShutdownHook(new Thread(() =>
      try {
        import scala.jdk.CollectionConverters._
        java.nio.file.Files.walk(dir).iterator().asScala.toSeq.reverse
          .foreach(p => java.nio.file.Files.deleteIfExists(p))
      } catch { case _: Exception => () }))
    dir.toString
  }

  /** Per-JVM partitioned-table directory, same lifecycle as [[bucketDir]]. */
  lazy val partDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_part")
    Runtime.getRuntime.addShutdownHook(new Thread(() =>
      try {
        import scala.jdk.CollectionConverters._
        java.nio.file.Files.walk(dir).iterator().asScala.toSeq.reverse
          .foreach(p => java.nio.file.Files.deleteIfExists(p))
      } catch { case _: Exception => () }))
    dir.toString
  }

  /** DuckDB replay of `ScaleLayout.zValue(16, l_partkey, l_suppkey)` —
    * the same interleave positions (bit i of partkey → 2i+1, suppkey → 2i);
    * `+` equals OR because the positions are disjoint. */
  private val ZExprSql: String = (0 until 16).flatMap(i => Seq(
    s"(((CAST(l_partkey AS BIGINT) >> $i) & 1) << ${2 * i + 1})",
    s"(((CAST(l_suppkey AS BIGINT) >> $i) & 1) << ${2 * i})")).mkString(" + ")

  val defs: Seq[QDef] = Seq(

    // Hive-partitioned layout + partition pruning: events land partitioned
    // by event_type, then the 'click' aggregate reads back through the
    // directory index — the predicate becomes a PartitionFilters entry
    // (files of other event types never open; asserted in ScaleLayoutSpec),
    // not a row-group PushedFilter. Oracle is the plain aggregate over the
    // unpartitioned source: layout must never change results. Write time is
    // intentionally inside the timing — materialization IS the operator.
    QDef("x_partition_pruned",
      """SELECT user_id, CAST(count(*) AS BIGINT) AS clicks,
        |  round(sum(value), 4) AS total_value
        |FROM events WHERE event_type = 'click'
        |GROUP BY 1""".stripMargin) { (s, d) =>
      val dir = s"$partDir/events"
      ScaleLayout.writePartitioned(Tables(s, d).events, dir, "event_type")
      ScaleLayout.readPartitioned(s, dir)
        .filter(col("event_type") === "click")
        .groupBy("user_id")
        .agg(count(lit(1)).as("clicks"), round(sum(col("value")), 4).as("total_value"))
    },

    // Sort-clustered layout: events land range-partitioned + sorted on
    // user_id, then a user-range aggregate reads back through tight
    // row-group footer stats (disjoint ranges asserted in ScaleLayoutSpec
    // — the skipping precondition for the reader). Oracle is the plain
    // aggregate: layout never changes results. Write inside the timing,
    // as with the other layout queries.
    QDef("x_sorted_scan",
      """SELECT event_type, CAST(count(*) AS BIGINT) AS cnt,
        |  round(sum(value), 4) AS total_value
        |FROM events WHERE user_id BETWEEN 40 AND 60
        |GROUP BY 1""".stripMargin) { (s, d) =>
      val dir = s"$partDir/events_sorted"
      ScaleLayout.writeSorted(Tables(s, d).events, dir, "user_id", 4)
      s.read.parquet(dir)
        .filter(col("user_id").between(40, 60))
        .groupBy("event_type")
        .agg(count(lit(1)).as("cnt"), round(sum(col("value")), 4).as("total_value"))
    },

    // Z-value (Morton code) itself, bit-for-bit: the oracle replays the
    // identical interleave arithmetic, so the layout key Z-ordering sorts
    // by is proven exact — not just "results unchanged".
    QDef("x_zorder_value",
      s"""SELECT l_orderkey, l_linenumber, CAST($ZExprSql AS BIGINT) AS z
         |FROM lineitem""".stripMargin) { (s, d) =>
      Tables(s, d).lineitem.select(col("l_orderkey"), col("l_linenumber"),
        ScaleLayout.zValue(16, col("l_partkey"), col("l_suppkey")).as("z"))
    },

    // Z-ordered layout + two-column box query: lineitem lands clustered on
    // interleave(l_partkey, l_suppkey), so the box predicate skips row
    // groups on BOTH columns (coverage ratios asserted in ScaleLayoutSpec —
    // a single-column sort leaves the other column unskippable). Oracle is
    // the plain aggregate over the original table: layout never changes
    // results. Write time inside the timing, as with the other layout
    // queries.
    QDef("x_zorder_scan",
      """SELECT l_returnflag, CAST(count(*) AS BIGINT) AS cnt,
        |  CAST(sum(l_quantity) AS DOUBLE) AS sum_qty
        |FROM lineitem
        |WHERE l_partkey BETWEEN 100 AND 300 AND l_suppkey BETWEEN 10 AND 30
        |GROUP BY 1""".stripMargin) { (s, d) =>
      val dir = s"$partDir/lineitem_z"
      ScaleLayout.writeZOrdered(Tables(s, d).lineitem, dir, 4, 16,
        "l_partkey", "l_suppkey")
      s.read.parquet(dir)
        .filter(col("l_partkey").between(100, 300) &&
          col("l_suppkey").between(10, 30))
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("cnt"), sum(col("l_quantity")).as("sum_qty"))
    },

    // File-level manifest skipping: build the min/max manifest over a
    // sorted layout, prune files against the predicate range BEFORE the
    // read (non-matching files are never opened — the level above
    // row-group skipping), scan only the survivors. Oracle is the plain
    // filtered aggregate: skipping files outside [lo, hi] can never change
    // results because the manifest has no false negatives by construction.
    // File-count pruning itself is asserted in ScaleLayoutSpec.
    QDef("x_manifest_skip",
      """SELECT event_type, CAST(count(*) AS BIGINT) AS cnt,
        |  round(sum(value), 4) AS total_value
        |FROM events WHERE user_id BETWEEN 40 AND 60
        |GROUP BY 1""".stripMargin) { (s, d) =>
      val dir = s"$partDir/events_manifest"
      ScaleLayout.writeSorted(Tables(s, d).events, dir, "user_id", 4)
      val manifest = ScaleLayout.buildManifest(s, dir, "user_id")
      ScaleLayout.readSkipping(s, dir, manifest, "user_id", 40L, 60L)
        .filter(col("user_id").between(40, 60)) // residual: exact semantics
        .groupBy("event_type")
        .agg(count(lit(1)).as("cnt"), round(sum(col("value")), 4).as("total_value"))
    },

    // Small-file compaction: shatter events into 64 tiny files, compact to
    // right-sized ones (count asserted in ScaleLayoutSpec), aggregate over
    // the compacted table. Oracle is the plain aggregate — compaction is
    // pure layout. Both writes sit inside the timing (materialization IS
    // the operator, as with the other layout queries).
    QDef("x_compact",
      """SELECT event_type, CAST(count(*) AS BIGINT) AS cnt,
        |  round(sum(value), 4) AS total_value
        |FROM events GROUP BY 1""".stripMargin) { (s, d) =>
      val small = s"$partDir/events_shattered"
      val compacted = s"$partDir/events_compacted"
      Tables(s, d).events.repartition(64).write.mode("overwrite").parquet(small)
      ScaleLayout.compact(s, small, compacted, targetBytes = 8L * 1024 * 1024,
        sortKey = Some("user_id"))
      s.read.parquet(compacted)
        .groupBy("event_type")
        .agg(count(lit(1)).as("cnt"), round(sum(col("value")), 4).as("total_value"))
    },

    // Multi-column manifest skipping over the z-ordered layout: the box
    // predicate prunes FILES on both columns at the manifest, then row
    // groups from the footers — the two skip levels composed (file-count
    // evidence in ScaleLayoutSpec). Oracle is the plain box aggregate.
    QDef("x_manifest_zorder",
      """SELECT l_returnflag, CAST(count(*) AS BIGINT) AS cnt,
        |  CAST(sum(l_quantity) AS DOUBLE) AS sum_qty
        |FROM lineitem
        |WHERE l_partkey BETWEEN 100 AND 300 AND l_suppkey BETWEEN 10 AND 30
        |GROUP BY 1""".stripMargin) { (s, d) =>
      val dir = s"$partDir/lineitem_z_manifest"
      ScaleLayout.writeZOrdered(Tables(s, d).lineitem, dir, 8, 16,
        "l_partkey", "l_suppkey")
      val m = ScaleLayout.buildManifest(s, dir, "l_partkey", "l_suppkey")
      ScaleLayout.readSkippingAll(s, dir, m,
        Seq(("l_partkey", 100L, 300L), ("l_suppkey", 10L, 30L)))
        .filter(col("l_partkey").between(100, 300) &&
          col("l_suppkey").between(10, 30))
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("cnt"), sum(col("l_quantity")).cast("double").as("sum_qty"))
    },

    // Bloom-manifest point probe on a NON-clustered column: events land
    // clustered on user_id, the probe hits event_id (scattered — min/max
    // prunes nothing), and only bloom-admitted files are opened (file-count
    // assertion in ScaleLayoutSpec). The residual equality filter makes
    // semantics exact (no false negatives by the bloom contract), so the
    // oracle is the plain point lookup.
    QDef("x_manifest_bloom",
      """SELECT event_id, user_id, event_type FROM events
        |WHERE event_id = 777""".stripMargin) { (s, d) =>
      val dir = s"$partDir/events_bloom"
      ScaleLayout.writeSorted(Tables(s, d).events, dir, "user_id", 4)
      val manifest = ScaleLayout.buildManifestWithBloom(s, dir, "user_id", "event_id")
      ScaleLayout.readSkippingBloom(s, dir, manifest, "event_id", 777L)
        .filter(col("event_id") === 777L)
        .select("event_id", "user_id", "event_type")
    },

    // Copy-on-write delete: land a sorted copy, erase a user range by
    // rewriting ONLY the overlapping files (locality + untouched-bytes
    // asserted in ScaleLayoutSpec), aggregate what remains. Oracle is the
    // complementary filter — CoW must remove exactly the targeted rows.
    QDef("x_cow_delete",
      """SELECT event_type, CAST(count(*) AS BIGINT) AS cnt,
        |  round(sum(value), 4) AS total_value
        |FROM events WHERE user_id NOT BETWEEN 40 AND 60
        |GROUP BY 1""".stripMargin) { (s, d) =>
      val dir = s"$partDir/events_cow"
      ScaleLayout.writeSorted(Tables(s, d).events, dir, "user_id", 4)
      ScaleLayout.deleteWhere(s, dir, "user_id", 40L, 60L)
      s.read.parquet(dir)
        .groupBy("event_type")
        .agg(count(lit(1)).as("cnt"), round(sum(col("value")), 4).as("total_value"))
    },

    // SNAPSHOT LOG + TIME TRAVEL: events land as version 0, a derived
    // backfill batch appends as version 1, a user range is (logically)
    // CoW-deleted as version 2 — then ALL THREE versions are read back
    // from the same directory and aggregated side by side. Deletes never
    // destroy files (the new version just omits them), which is the whole
    // mechanism behind table-format time travel; SnapshotsSpec proves
    // file sharing across versions + vacuum retention. The oracle replays
    // each version relationally.
    QDef("x_time_travel",
      """WITH base AS (
        |  SELECT user_id, CAST(round(value * 100) AS BIGINT) AS cents,
        |    event_type FROM events),
        |v1 AS (
        |  SELECT user_id, cents FROM base
        |  UNION ALL
        |  SELECT user_id + 1000, cents FROM base WHERE event_type = 'click'),
        |v2 AS (SELECT * FROM v1 WHERE user_id NOT BETWEEN 40 AND 60)
        |SELECT * FROM (
        |  SELECT 0 AS version, CAST(count(*) AS BIGINT) AS n_rows,
        |    CAST(sum(cents) AS BIGINT) AS total_cents FROM base
        |  UNION ALL SELECT 1, CAST(count(*) AS BIGINT),
        |    CAST(sum(cents) AS BIGINT) FROM v1
        |  UNION ALL SELECT 2, CAST(count(*) AS BIGINT),
        |    CAST(sum(cents) AS BIGINT) FROM v2)
        |ORDER BY version""".stripMargin) { (s, d) =>
      val dir = s"$partDir/events_snap"
      // fresh log each invocation: the table dir is rebuilt from scratch
      def rm(f: java.io.File): Unit = if (f.exists()) {
        Option(f.listFiles()).getOrElse(Array.empty).foreach(rm); f.delete()
      }
      rm(new java.io.File(dir))
      val base = Tables(s, d).events.select(col("user_id"),
        round(col("value") * 100, 0).cast("bigint").as("cents"),
        col("event_type"))
      ScaleLayout.writeSorted(base, dir, "user_id", 4)
      graft.ops.Snapshots.init(dir)
      graft.ops.Snapshots.append(s, dir,
        base.filter(col("event_type") === "click")
          .withColumn("user_id", col("user_id") + 1000))
      graft.ops.Snapshots.deleteWhere(s, dir, "user_id", 40L, 60L)
      val per = (0 to 2).map { v =>
        graft.ops.Snapshots.readVersion(s, dir, v)
          .agg(count(lit(1)).as("n_rows"), sum(col("cents")).as("total_cents"))
          .select(lit(v).as("version"), col("n_rows"), col("total_cents"))
      }
      per.reduce(_ unionByName _).orderBy("version")
    },

    // INCREMENTAL AGGREGATE MAINTENANCE over the snapshot log: the rollup
    // at version 1 is computed as merge(agg(version 0), agg(DELTA files
    // only)) — the standing-materialized-view refresh pattern, where each
    // commit's refresh cost follows the delta, never the table. Correct
    // for any decomposable aggregate (count/sum here; min/max/sketches
    // likewise); the oracle aggregates the full v1 content directly, so
    // equality proves merge(partials) == full recompute.
    QDef("x_incremental_agg",
      """WITH base AS (
        |  SELECT event_type, CAST(round(value * 100) AS BIGINT) AS cents
        |  FROM events),
        |delta AS (
        |  SELECT event_type, cents FROM base WHERE event_type = 'click'),
        |v1 AS (SELECT * FROM base UNION ALL SELECT * FROM delta)
        |SELECT event_type, CAST(count(*) AS BIGINT) AS n_rows,
        |  CAST(sum(cents) AS BIGINT) AS total_cents
        |FROM v1 GROUP BY 1""".stripMargin) { (s, d) =>
      val dir = s"$partDir/events_incr"
      def rm(f: java.io.File): Unit = if (f.exists()) {
        Option(f.listFiles()).getOrElse(Array.empty).foreach(rm); f.delete()
      }
      rm(new java.io.File(dir))
      val base = Tables(s, d).events.select(col("event_type"),
        round(col("value") * 100, 0).cast("bigint").as("cents"))
      ScaleLayout.writeSorted(base, dir, "cents", 4)
      graft.ops.Snapshots.init(dir)
      graft.ops.Snapshots.append(s, dir, base.filter(col("event_type") === "click"))
      def partial(df: org.apache.spark.sql.DataFrame) =
        df.groupBy("event_type")
          .agg(count(lit(1)).as("n_rows"), sum(col("cents")).as("total_cents"))
      // v0 rollup once, then refresh touching ONLY the delta files
      partial(graft.ops.Snapshots.readVersion(s, dir, 0))
        .unionByName(partial(graft.ops.Snapshots.readDelta(s, dir, 0, 1)))
        .groupBy("event_type")
        .agg(sum(col("n_rows")).as("n_rows"),
          sum(col("total_cents")).as("total_cents"))
    },

    // Copy-on-write MERGE (upsert): orders land clustered on o_orderkey,
    // then one CDC-style batch zeroes every 97th key's price (WHEN MATCHED
    // UPDATE) and re-inserts every 101st key shifted past max(o_orderkey)
    // (WHEN NOT MATCHED INSERT) — only manifest-overlapping files rewrite
    // (locality asserted in ScaleLayoutSpec). The oracle replays the merge
    // relationally: target rows not in the update key set, union the batch.
    // Price totals compare in exact integer cents.
    QDef("x_cow_merge",
      """WITH upd AS (
        |  SELECT o_orderkey, 0.0 AS price FROM orders WHERE o_orderkey % 97 = 0
        |  UNION ALL
        |  SELECT o_orderkey + (SELECT max(o_orderkey) FROM orders), o_totalprice
        |  FROM orders WHERE o_orderkey % 101 = 0),
        |merged AS (
        |  SELECT o_orderkey, o_totalprice AS price FROM orders
        |  WHERE o_orderkey NOT IN (SELECT o_orderkey FROM upd)
        |  UNION ALL SELECT * FROM upd)
        |SELECT CAST(count(*) AS BIGINT) AS n_rows,
        |  CAST(sum(o_orderkey) AS BIGINT) AS key_sum,
        |  CAST(sum(CAST(round(price * 100) AS BIGINT)) AS BIGINT) AS price_cents
        |FROM merged""".stripMargin) { (s, d) =>
      val t = Tables(s, d)
      val dir = s"$partDir/orders_merge"
      ScaleLayout.writeSorted(t.orders, dir, "o_orderkey", 8)
      // scalar barrier (reference S4 shape): the insert keys start past max
      val maxKey = t.orders.agg(max(col("o_orderkey"))).head.getLong(0)
      val mods = t.orders.filter(col("o_orderkey") % 97 === 0)
        .withColumn("o_totalprice", lit(0.0))
      val ins = t.orders.filter(col("o_orderkey") % 101 === 0)
        .withColumn("o_orderkey", col("o_orderkey") + lit(maxKey))
      ScaleLayout.mergeInto(s, dir, mods.unionByName(ins), "o_orderkey")
      s.read.parquet(dir).agg(
        count(lit(1)).as("n_rows"),
        sum(col("o_orderkey")).as("key_sum"),
        sum(round(col("o_totalprice") * 100, 0).cast("bigint")).as("price_cents"))
    },

    // INCREMENTAL DISTINCT COUNT via mergeable HLL sketches (Apache
    // DataSketches through hll_sketch_agg/hll_union): version 0's sketch
    // unions with a sketch built over ONLY the delta files, so a standing
    // distinct-count rollup never re-reads the table — the property
    // count(DISTINCT) fundamentally lacks (it is not decomposable; the
    // sketch is). The contract row proves the merged estimate lands within
    // 5% of exact AND equals the monolithic sketch over all data —
    // register-wise, union(sketch(A), sketch(B)) == sketch(A ∪ B).
    QDef("x_sketch_hll_merge",
      """WITH v1 AS (
        |  SELECT user_id FROM events
        |  UNION ALL
        |  SELECT user_id + 1000 FROM events WHERE event_type = 'click')
        |SELECT CAST(count(DISTINCT user_id) AS BIGINT) AS exact_nd,
        |  true AS merged_within_5pct,
        |  true AS merge_equals_monolithic
        |FROM v1""".stripMargin) { (s, d) =>
      val dir = s"$partDir/events_hll"
      def rm(f: java.io.File): Unit = if (f.exists()) {
        Option(f.listFiles()).getOrElse(Array.empty).foreach(rm); f.delete()
      }
      rm(new java.io.File(dir))
      val base = Tables(s, d).events.select(col("user_id"), col("event_type"))
      ScaleLayout.writeSorted(base, dir, "user_id", 4)
      graft.ops.Snapshots.init(dir)
      graft.ops.Snapshots.append(s, dir,
        base.filter(col("event_type") === "click")
          .withColumn("user_id", col("user_id") + 1000))
      val sk0 = graft.ops.Snapshots.readVersion(s, dir, 0)
        .agg(expr("hll_sketch_agg(user_id)").as("sk0"))
      val skD = graft.ops.Snapshots.readDelta(s, dir, 0, 1)
        .agg(expr("hll_sketch_agg(user_id)").as("skd"))
      val full = graft.ops.Snapshots.readVersion(s, dir, 1)
        .agg(countDistinct(col("user_id")).as("exact_nd"),
          expr("hll_sketch_agg(user_id)").as("skm"))
      full.crossJoin(sk0).crossJoin(skD)
        .select(col("exact_nd"),
          expr("hll_sketch_estimate(hll_union(sk0, skd))").as("merged"),
          // normalize the monolithic sketch through the SAME union path
          // (union(skm, skm) keeps its registers but densifies to HLL
          // mode): below ~k distinct a lone sketch still sits in sparse
          // SET mode whose estimator is near-exact, while any union is
          // dense — comparing estimates ACROSS modes breaks the
          // register-wise invariant at exactly the cardinalities where
          // sparse mode exists (caught by the sf0.1 oracle sweep)
          expr("hll_sketch_estimate(hll_union(skm, skm))").as("mono"))
        .select(col("exact_nd"),
          (abs(col("merged") - col("exact_nd")) <= col("exact_nd") * 0.05)
            .as("merged_within_5pct"),
          (col("merged") === col("mono")).as("merge_equals_monolithic"))
    },

    // HyperLogLog++ distinct-count estimate within 5% of exact (rsd 0.02).
    QDef("x_sketch_hll",
      """SELECT l_returnflag, CAST(count(DISTINCT l_partkey) AS BIGINT) AS exact_nd,
        |  true AS hll_within_5pct
        |FROM lineitem GROUP BY 1""".stripMargin) { (s, d) =>
      Tables(s, d).lineitem.groupBy("l_returnflag")
        .agg(countDistinct(col("l_partkey")).as("exact_nd"),
          approx_count_distinct(col("l_partkey"), 0.02).as("hll"))
        .select(col("l_returnflag"), col("exact_nd"),
          (abs(col("hll") - col("exact_nd")) <= col("exact_nd") * 0.05)
            .as("hll_within_5pct"))
    },

    // Quantile sketch (percentile_approx, accuracy 1000) within 2 units of
    // the exact interpolated median (rank error <= n/accuracy).
    QDef("x_sketch_quantile",
      """SELECT l_returnflag, quantile_cont(l_quantity, 0.5) AS exact_p50,
        |  true AS approx_within_2
        |FROM lineitem GROUP BY 1""".stripMargin) { (s, d) =>
      Tables(s, d).lineitem.groupBy("l_returnflag")
        .agg(expr("percentile(l_quantity, 0.5)").as("exact_p50"),
          expr("percentile_approx(l_quantity, 0.5, 1000)").as("p50a"))
        .select(col("l_returnflag"), col("exact_p50"),
          (abs(col("p50a") - col("exact_p50")) <= 2.0).as("approx_within_2"))
    },

    // Bloom filter over the customer keys probed by every order: zero false
    // negatives (guaranteed by construction — the oracle-checkable half) and
    // a low false-positive rate on known-absent keys (100 bits/item => ~0).
    // The sketch is materialized at the driver and probed as a constant —
    // the same build-once/broadcast shape Spark's InjectRuntimeFilter plans
    // (a ~25 KB scalar barrier, like the reference's S4 collect-scalar).
    QDef("x_sketch_bloom",
      """SELECT CAST(count(*) AS BIGINT) AS n_orders,
        |  true AS no_false_negatives, true AS fp_rate_low
        |FROM orders""".stripMargin) { (s, d) =>
      import graft.functions.GraftFunctions.{bloomFilterAgg, mightContain}
      val t = Tables(s, d)
      // Size the sketch from the ACTUAL build-side cardinality and pick the
      // known-absent probes beyond max(c_custkey), so the query is correct
      // at every scale factor (a fixed estItems under-sizes at large sf and
      // a fixed key offset can collide with real keys).
      val stats = t.customer
        .agg(count(lit(1)).as("n"), max(col("c_custkey")).as("mx")).first()
      val nCust = stats.getLong(0)
      val maxKey = stats.getLong(1)
      val bf = t.customer
        .agg(bloomFilterAgg(col("c_custkey"), nCust, nCust * 100L).as("f"))
        .first().getAs[Array[Byte]](0)
      t.orders
        .agg(count(lit(1)).as("n_orders"),
          (sum(when(mightContain(bf, col("o_custkey")), 1L).otherwise(0L))
            === count(lit(1))).as("no_false_negatives"),
          (avg(when(mightContain(bf, col("o_custkey") + lit(maxKey + 1L)), 1.0)
            .otherwise(0.0)) <= 0.05).as("fp_rate_low"))
    },

    // Count-min sketch frequency estimation: per-key estimates are
    // overestimates bounded by eps*N with the configured confidence. The
    // sketch (a few KB) is driver-materialized and probed for five fixed
    // keys; the oracle checks the EXACT counts bit-wise and expects the
    // CMS guarantee booleans to hold.
    QDef("x_sketch_cms",
      """SELECT l_suppkey, CAST(count(*) AS BIGINT) AS exact_cnt,
        |  true AS cms_lower_ok, true AS cms_upper_ok
        |FROM lineitem WHERE l_suppkey BETWEEN 1 AND 5
        |GROUP BY 1""".stripMargin) { (s, d) =>
      val t = Tables(s, d)
      val totalAndSketch = t.lineitem
        .agg(count(lit(1)).as("n"),
          expr("count_min_sketch(l_suppkey, 0.001d, 0.99d, 42)").as("cms"))
        .first()
      val n = totalAndSketch.getLong(0)
      val cms = org.apache.spark.util.sketch.CountMinSketch.readFrom(
        totalAndSketch.getAs[Array[Byte]](1))
      val eps = 0.001
      import s.implicits._
      val probes = (1L to 5L)
        .map(k => (k, cms.estimateCount(k)))
        .toDF("l_suppkey", "cms_est")
      t.lineitem.filter(col("l_suppkey").between(1, 5))
        .groupBy("l_suppkey").agg(count(lit(1)).as("exact_cnt"))
        .join(broadcast(probes), "l_suppkey")
        .select(col("l_suppkey"), col("exact_cnt"),
          (col("cms_est") >= col("exact_cnt")).as("cms_lower_ok"), // never underestimates
          (col("cms_est") <= col("exact_cnt") + lit((eps * n).toLong + 1))
            .as("cms_upper_ok"))
    },

    // Bloom runtime filter APPLIED to a fact scan (not just the sketch
    // contract): build on the keys of a filtered dim (customers of one
    // nation), probe as a pre-filter on the orders scan, exact semi-join
    // removes false positives. The oracle is the PLAIN semi-join — the two
    // are identical by construction (no false negatives); the pruning win
    // (bloom survivors ≪ fact rows) is asserted in ScaleJoinsSpec.
    QDef("x_bloom_semi_filter",
      """SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS cnt,
        |  CAST(sum(o_orderkey) AS BIGINT) AS key_sum
        |FROM orders
        |WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_nationkey = 1)
        |GROUP BY 1""".stripMargin) { (s, d) =>
      val t = Tables(s, d)
      val dim = t.customer.filter(col("c_nationkey") === 1)
      ScaleJoins.bloomSemiJoin(t.orders, dim, "o_custkey", "c_custkey")
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("cnt"), sum(col("o_orderkey")).as("key_sum"))
    },

    // Bucketed co-located join, oracle-checked against the plain join: both
    // sides land as bucketed+sorted tables on the SAME key/bucket count,
    // then the equi-join plans with NO shuffle exchange (asserted in
    // ScaleJoinsSpec) — the layout decision that kills the dominant
    // fact-fact shuffle at 100 TB. This row proves the bucketed path's
    // RESULTS, not just its plan.
    QDef("x_bucketed_join",
      """SELECT c.c_nationkey, CAST(count(*) AS BIGINT) AS cnt,
        |  CAST(sum(o.o_orderkey) AS BIGINT) AS key_sum
        |FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        |GROUP BY 1""".stripMargin) { (s, d) =>
      val t = Tables(s, d)
      val base = Sketches.bucketDir
      ScaleJoins.writeBucketed(
        t.orders, "graft_b_orders", "o_custkey", 8, Some(s"$base/orders"))
      ScaleJoins.writeBucketed(
        t.customer.withColumnRenamed("c_custkey", "o_custkey"),
        "graft_b_customer", "o_custkey", 8, Some(s"$base/customer"))
      s.table("graft_b_orders").join(s.table("graft_b_customer"), "o_custkey")
        .groupBy("c_nationkey")
        .agg(count(lit(1)).as("cnt"), sum(col("o_orderkey")).as("key_sum"))
    }
  )
}
