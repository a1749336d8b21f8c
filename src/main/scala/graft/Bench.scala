package graft
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = Sessions.local(cpus)
    spark.sparkContext.setLogLevel("WARN")
    // The WindowExec "No Partition Defined" WARNs (~30 lines, all from
    // frames the PlanInvariantsSpec boundedness audit already proves
    // driver-sized) interleaved with the stdout tail and broke the
    // BENCH_rN.json parse two rounds running — silence that one logger,
    // keep WARN everywhere else.
    org.apache.logging.log4j.core.config.Configurator.setLevel(
      "org.apache.spark.sql.execution.window",
      org.apache.logging.log4j.Level.ERROR)
    // The r13 record's tail carried a DAGScheduler stack trace from
    // updateAccumulators/handleTaskCompletion: "Failed to update
    // accumulator N (Unknown class) for task 0" — a task-completion
    // event processed after the query's SQLExecution was torn down and
    // its SQLMetric accumulators dropped from AccumulatorContext's
    // weak-reference map by a GC. Diagnosis (r14): NOT specific to this
    // file's explicit System.gc() nudges — the same trace appears in
    // Verify sweeps, which have none; any natural GC between two of the
    // ~738 sequential queries unregisters the finished execution's
    // metrics, and a straggling completion event then logs this at
    // ERROR level (so a level threshold cannot drop it without muting
    // real scheduler errors). rc=0, 0 failed, every query timed — the
    // known benign late-completion accounting race. Drop EXACTLY this
    // message with a message-specific DENY filter; stage failures,
    // aborts, and every other DAGScheduler ERROR still surface.
    locally {
      import org.apache.logging.log4j.LogManager
      import org.apache.logging.log4j.core.LoggerContext
      import org.apache.logging.log4j.core.filter.RegexFilter
      import org.apache.logging.log4j.core.Filter
      val ctx = LogManager.getContext(false).asInstanceOf[LoggerContext]
      val cfg = ctx.getConfiguration
      val name = "org.apache.spark.scheduler.DAGScheduler"
      val lc = Option(cfg.getLoggerConfig(name)).filter(_.getName == name)
        .getOrElse {
          val fresh = new org.apache.logging.log4j.core.config.LoggerConfig(
            name, org.apache.logging.log4j.Level.WARN, true)
          cfg.addLogger(name, fresh)
          fresh
        }
      lc.addFilter(RegexFilter.createFilter(
        "Failed to update accumulator.*", null, false,
        Filter.Result.DENY, Filter.Result.NEUTRAL))
      ctx.updateLoggers()
    }
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
    // Per-query GC wall-clock (ms): the shared VM's noise signature is an
    // absolute +multi-second inflation at scattered sub-second queries
    // (CPU-steal/GC bursts — BENCH_NOTES r8/r11); a query whose sec spikes
    // WITH gc_ms is allocation/collection debt, one whose sec spikes
    // WITHOUT it is steal or a genuine plan change. Recorded per query so
    // the record self-defends without manual percentile arguments.
    def gcMsNow: Long = java.lang.management.ManagementFactory
      .getGarbageCollectorMXBeans.asScala.map(_.getCollectionTime)
      .filter(_ >= 0).sum
    val gcMs = scala.collection.mutable.LinkedHashMap.empty[String, Long]
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
      val g0 = gcMsNow
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
      val gd = gcMsNow - g0
      if (gd > 0) gcMs(name) = gd
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
    // Self-defending outlier retries (r11 verdict task 3): any query
    // measuring >3× its committed reference time (the latest
    // BENCH_LOCAL_r*.json in cwd, or $SPARK_GRAFT_BENCH_REF) AND more
    // than 1 s over it is re-run ONCE after the sweep, both times kept.
    // A retry that lands back at the reference proves the first reading
    // was a host burst (the r11 driver run had four ×4.5-10 sub-second
    // outliers that cost a manual rebuttal); a retry that reproduces is
    // a real regression and says so in the record.
    val refPath: Option[String] =
      sys.env.get("SPARK_GRAFT_BENCH_REF").filter(_.nonEmpty).orElse {
        val re = "BENCH_LOCAL_r(\\d+)\\.json".r
        val here = new java.io.File(".").listFiles()
        Option(here).toSeq.flatten.flatMap(f => f.getName match {
          case re(n) => Some((n.toInt, f.getName)); case _ => None
        }).sortBy(_._1).lastOption.map(_._2)
      }
    val refTimes: Map[String, Double] = refPath.flatMap { p =>
      try {
        val om = new com.fasterxml.jackson.databind.ObjectMapper()
        val q = om.readTree(new java.io.File(p)).get("queries")
        Option(q).map(_.fields().asScala
          .map(e => e.getKey -> e.getValue.asDouble).toMap)
      } catch { case e: Throwable =>
        System.err.println(s"[bench] reference $p unreadable: ${e.getMessage}")
        None
      }
    }.getOrElse(Map.empty)
    val retrySecs = scala.collection.mutable.LinkedHashMap.empty[String, Double]
    val anyRetry = ordered.exists { case (name, _) =>
      val sec = results.getOrElse(name, -1.0)
      refTimes.get(name).exists(r => sec >= 0 && r > 0 && sec > 3 * r
        && sec - r > 1.0)
    }
    if (anyRetry) {
      // Retries run at the very tail of the sweep, where accumulated
      // shuffle/broadcast/checkpoint refs inflate readings (this file's
      // own evidence: x_zorder_scan 5.5 s isolated vs 13.9 s at tail) —
      // pay the same GC + ContextCleaner nudge the main loop applies
      // every 32 queries, so a host-burst outlier can't falsely
      // "reproduce" against end-of-sweep heap debt (ADVICE r12).
      System.gc()
      Thread.sleep(200)
    }
    ordered.foreach { case (name, fn) =>
      val sec = results.getOrElse(name, -1.0)
      refTimes.get(name).foreach { r =>
        if (sec >= 0 && r > 0 && sec > 3 * r && sec - r > 1.0) {
          val t0 = System.nanoTime()
          try {
            fn(spark, sfDir).write.format("noop").mode("overwrite").save()
            retrySecs(name) = (System.nanoTime() - t0) / 1e9
          } catch { case _: Throwable => () }
          spark.catalog.clearCache()
          // keep successive retries similarly unconfounded
          System.gc()
        }
      }
    }
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
    val gcs = gcMs.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val retries = retrySecs.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val refJson = refPath.map("\"" + _ + "\"").getOrElse("null")
    val fullJson =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"failed":$failed,"build_sec":$builds,"heap_peak_mb":$peaks,"gc_ms":$gcs,"retry_ref":$refJson,"retry_sec":$retries,"sf":"$sfDir"}"""
    // Per-run default filename (r14 verdict item 4): an 8-core scaling
    // sweep used to overwrite the 32-core record because both defaulted to
    // the same name. The stdout line's "full" pointer names whichever file
    // this run wrote, so consumers never guess.
    val outPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", {
      val ts = new java.text.SimpleDateFormat("yyyyMMdd_HHmmss")
        .format(new java.util.Date())
      s"bench_full_${ts}_c$cpus.json"
    })
    try java.nio.file.Files.write(java.nio.file.Paths.get(outPath),
      fullJson.getBytes("UTF-8"))
    catch { case e: Throwable =>
      System.err.println(s"[bench] could not write $outPath: ${e.getMessage}") }
    def r3(v: Double) = math.round(v * 1000) / 1000.0
    val top = results.filter(_._2 >= 0).toSeq.sortBy(-_._2).take(30)
      .map { case (k, v) => s"\"" + k + "\":" + r3(v) }
      .mkString("{", ",", "}")
    val retries3 = retrySecs.map { case (k, v) => s"\"" + k + "\":" + r3(v) }
      .mkString("{", ",", "}")
    // stop Spark BEFORE printing so the one-line record is the last thing
    // on stdout — the driver parses a ~2KB stdout tail (r11 verdict task 2)
    spark.stop()
    println(s"""{"metric":"total","value":${r3(total)},"unit":"sec","n_queries":${results.size},"queries":$top,"queries_omitted":${math.max(0, results.size - 30)},"failed":$failed,"retry_sec":$retries3,"full":"$outPath","sf":"$sfDir"}""")
    System.out.flush()
  }
}
