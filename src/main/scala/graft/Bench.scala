package graft
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = Sessions.local(cpus)
    spark.sparkContext.setLogLevel("WARN")
    // Warm-up outside the timed loop: pays the one-time JVM/codegen/scan
    // costs so the first alphabetical query isn't charged for them.
    try {
      val t = graft.Tables(spark, sfDir)
      t.lineitem.groupBy("l_returnflag").count()
        .write.format("noop").mode("overwrite").save()
      t.events.limit(1).write.format("noop").mode("overwrite").save()
    } catch { case _: Throwable => () }
    // noop sink executes the FULL physical plan (a bare count() would let
    // Catalyst prune every projection and under-measure — VERDICT r1 §9).
    val subset = args.toSet // optional query-name filter for local iteration
    // Decode-heavy queries (image/audio/video codecs + the synth fixture
    // generators) run LAST as their own family: two driver rounds in a row
    // showed 2-6× in-run inflation for mm-family queries landing mid-run
    // (residue from other queries' shuffle/broadcast refs the cleaner
    // hasn't collected yet competing with codec buffers — BENCH_NOTES r5/r6).
    // Alphabetical order within each family keeps run-over-run comparability.
    def family(name: String): Int = if (name.startsWith("x_mm_")) 1 else 0
    val ordered = SparkEntry.queries.toSeq
      .filter { case (name, _) => subset.isEmpty || subset(name) }
      .sortBy { case (n, _) => (family(n), n) }
    val firstMm = ordered.indexWhere { case (n, _) => family(n) == 1 }
    // Per-query JVM heap high-water mark: reset the heap pools' peak
    // before each query, read the max after — separates allocation-
    // pressure regressions (x_sim_ivfpq_recall, round-8 watch item) from
    // plan regressions without re-running anything under a profiler.
    import scala.jdk.CollectionConverters._
    def heapPools = java.lang.management.ManagementFactory
      .getMemoryPoolMXBeans.asScala
      .filter(_.getType == java.lang.management.MemoryType.HEAP)
    val buildSecs = scala.collection.mutable.LinkedHashMap.empty[String, Double]
    val peakMb = scala.collection.mutable.LinkedHashMap.empty[String, Long]
    val results = ordered
      .zipWithIndex.map { case ((name, fn), i) =>
      if (i == firstMm) {
        // family boundary: drop finished queries' shuffle/broadcast/
        // checkpoint refs NOW so the decode family starts from a clean
        // heap instead of paying earlier queries' collection debt
        System.gc()
        Thread.sleep(200) // let the ContextCleaner drain its ref queue
      }
      heapPools.foreach(_.resetPeakUsage())
      val t0 = System.nanoTime()
      // failed queries record -1 (and land in "failed") so a broken query
      // can never silently contribute a plausible-looking time to the total
      // Build and execute timed SEPARATELY: for most queries build is plan
      // construction (~ms), but the layout queries (x_partition_pruned,
      // x_sorted_scan, x_zorder_scan, x_dsv2_partitioned) materialize
      // their layout eagerly during build — splitting the phases keeps a
      // read-path plan regression visible under tmp-dir write IO variance.
      val ok =
        try {
          val df = fn(spark, sfDir)
          val tBuilt = System.nanoTime()
          df.write.format("noop").mode("overwrite").save()
          if ((tBuilt - t0) / 1e9 > 0.25)
            buildSecs(name) = (tBuilt - t0) / 1e9
          true
        }
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name: ${e.getMessage}"); false }
      val pk = heapPools.map(_.getPeakUsage.getUsed).sum / (1024 * 1024)
      if (pk > 1024) peakMb(name) = pk
      val dt = name -> (if (ok) (System.nanoTime() - t0) / 1e9 else -1.0)
      // outside the timed span. clearCache releases CacheManager entries
      // (the flights queries' cache()d CSV preprocessing); localCheckpoint
      // blocks (Dedup.pin/truncate) are RDD-level and invisible to it —
      // THOSE are reclaimed by the GC nudge below, which lets the
      // ContextCleaner drop checkpoint blocks, shuffle files, and
      // broadcasts of finished queries (driver refs only die at GC; the
      // report must not be skewed by which query happened to run after
      // 200 others — measured: x_zorder_scan 5.5 s isolated vs 13.9 s at
      // the tail)
      spark.catalog.clearCache()
      if (i % 32 == 31) System.gc()
      dt
    }.toMap
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val failed = results.collect { case (k, v) if v < 0 => "\"" + k + "\"" }
      .toSeq.sorted.mkString("[", ",", "]")
    val total = results.values.filter(_ >= 0).sum
    val builds = buildSecs.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val peaks = peakMb.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    // FULL record → file (the driver's stdout capture keeps only a ~2KB
    // tail, which a 723-entry map overflows — BENCH_r10.json's
    // `"parsed": null`); the stdout line below stays parseable by being
    // compact: totals + the slowest 30 + a pointer to this file.
    val fullJson =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"failed":$failed,"build_sec":$builds,"heap_peak_mb":$peaks,"sf":"$sfDir"}"""
    val outPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench_full.json")
    try java.nio.file.Files.write(java.nio.file.Paths.get(outPath),
      fullJson.getBytes("UTF-8"))
    catch { case e: Throwable =>
      System.err.println(s"[bench] could not write $outPath: ${e.getMessage}") }
    def r3(v: Double) = math.round(v * 1000) / 1000.0
    val top = results.filter(_._2 >= 0).toSeq.sortBy(-_._2).take(30)
      .map { case (k, v) => s"\"" + k + "\":" + r3(v) }
      .mkString("{", ",", "}")
    println(s"""{"metric":"total","value":${r3(total)},"unit":"sec","n_queries":${results.size},"queries":$top,"queries_omitted":${math.max(0, results.size - 30)},"failed":$failed,"full":"$outPath","sf":"$sfDir"}""")
    spark.stop()
  }
}
