package graft
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Seq(sfDir, outDir, rest @ _*) = args.toSeq
    val subset = rest.toSet // optional query-name filter for local iteration
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = Sessions.local(cpus)
    spark.sparkContext.setLogLevel("WARN")
    // The WindowExec "No Partition Defined" WARNs sprayed dozens of
    // repeats through the r14 entry tail. Every unpartitioned window in
    // the repo runs over a bounded (bin/calendar/dimension) frame —
    // statically audited and dynamically growth-probed at three SFs by
    // PlanInvariantsSpec's single-partition carve-out tests (see the
    // boundedFrame map there and the audit table in OPTIMIZATION_r15.md)
    // — so the warning carries no signal here; same silence Bench applies.
    org.apache.logging.log4j.core.config.Configurator.setLevel(
      "org.apache.spark.sql.execution.window",
      org.apache.logging.log4j.Level.ERROR)
    new java.io.File(outDir).mkdirs()
    // A query that throws must show up as BROKEN, not silently vanish from
    // the correctness record (round-6 lesson: 5 crashed queries were only
    // discoverable by diffing bench vs correctness keys). Collect failures
    // and dump them as _errors.json beside oracle_sql.json.
    val errors = scala.collection.mutable.LinkedHashMap.empty[String, String]
    SparkEntry.queries
      .filter { case (name, _) => subset.isEmpty || subset(name) }
      .foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
        errors(name) = s"${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(500)}"
      }
      // release CacheManager entries between queries (cache()d frames such
      // as the flights CSV preprocessing); checkpoint blocks are RDD-level
      // and GC-reclaimed instead (see Dedup.pin and Bench's GC cadence)
      finally spark.catalog.clearCache()
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    // Canary battery as part of the standard gate (round 14, r13 verdict
    // task 6): on every FULL sweep, run the regime canaries over the
    // driver fixtures and assert the documented per-fixture selections —
    // a regression in a decision function or canary query fails the
    // verify gate, not an on-demand demo. A failure is recorded loudly
    // (stderr + _errors.json) rather than thrown, so a battery drift
    // can never zero the whole round's per-query correctness record.
    if (subset.isEmpty) {
      val fixtures = Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01",
          "/root/testdata/sf0.1").filter(p => new java.io.File(p).isDirectory)
      val lines = fixtures.flatMap { d =>
        try {
          val s = graft.queries.CanaryBattery.read(spark, d)
          graft.queries.CanaryBattery.assertDocumented(d, s)
          Some(s.json(d))
        } catch { case e: Throwable =>
          System.err.println(s"[verify] canary battery FAILED at $d: ${e.getMessage}")
          errors(s"_canary_battery:$d") =
            s"${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(500)}"
          None
        }
      }
      Files.writeString(Paths.get(s"$outDir/canary_battery.json"),
        lines.mkString("", "\n", "\n"))
    }
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    val errJson = errors.map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/_errors.json"), errJson)
    if (errors.nonEmpty) {
      System.err.println(s"[verify] ${errors.size} quer${if (errors.size == 1) "y" else "ies"} FAILED: ${errors.keys.mkString(", ")}")
    }
    spark.stop()
  }
}
