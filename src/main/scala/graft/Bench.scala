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
    val results = ordered
      .zipWithIndex.map { case ((name, fn), i) =>
      if (i == firstMm) {
        // family boundary: drop finished queries' shuffle/broadcast/
        // checkpoint refs NOW so the decode family starts from a clean
        // heap instead of paying earlier queries' collection debt
        System.gc()
        Thread.sleep(200) // let the ContextCleaner drain its ref queue
      }
      val t0 = System.nanoTime()
      // failed queries record -1 (and land in "failed") so a broken query
      // can never silently contribute a plausible-looking time to the total
      val ok =
        try { fn(spark, sfDir).write.format("noop").mode("overwrite").save(); true }
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name: ${e.getMessage}"); false }
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
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"failed":$failed,"sf":"$sfDir"}""")
    spark.stop()
  }
}
