// Within-session query timing for A/B runs against a chosen classpath:
//   /opt/spark/bin/spark-shell --master local[32] \
//     --conf spark.sql.extensions=graft.functions.GraftExtensions \
//     --conf spark.sql.shuffle.partitions=32 ... \
//     --driver-class-path <classes dir> -I tools/time_queries.scala
// Queries come from $GRAFT_TIME_QUERIES (comma-separated), reps from
// $GRAFT_TIME_REPS (default 3), data dir from $SPARK_GRAFT_SF_DIR.
// Methodology (guide §1.4): noop sink, one warmup rep excluded, same
// ordering every rep. clearCache between queries (Bench parity).
{
  val names = sys.env.getOrElse("GRAFT_TIME_QUERIES", "x_fligner_killeen")
    .split(",").map(_.trim).filter(_.nonEmpty).toSeq
  val reps = sys.env.getOrElse("GRAFT_TIME_REPS", "3").toInt
  val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
  spark.sparkContext.setLogLevel("WARN")
  org.apache.logging.log4j.core.config.Configurator.setLevel(
    "org.apache.spark.sql.execution.window",
    org.apache.logging.log4j.Level.ERROR)
  // warmup: same shape Bench uses
  graft.Tables(spark, sf).lineitem.groupBy("l_returnflag").count()
    .write.format("noop").mode("overwrite").save()
  def once(n: String): Double = {
    val t0 = System.nanoTime()
    graft.SparkEntry.queries(n)(spark, sf)
      .write.format("noop").mode("overwrite").save()
    val dt = (System.nanoTime() - t0) / 1e9
    spark.catalog.clearCache()
    dt
  }
  for (r <- 0 to reps) {
    val tag = if (r == 0) "warm0" else s"rep$r"
    for (n <- names) {
      val dt = once(n)
      println(f"[time] $tag $n%-28s $dt%7.3f s")
    }
    System.gc()
  }
  println("[time] done")
}
System.exit(0)
