package graft.queries

import org.apache.spark.sql.functions._

import graft.QDef

/** Queries through the custom DataSource V2 connector
  * ([[graft.sources.GraftRangeSource]], format `"graft-range"`) — proving
  * the V2 read path end to end against DuckDB's `range()` table function.
  * Plan-level behavior (partition pruning, pushed filters, read schema) is
  * asserted separately in GraftRangeSourceSpec; these rows prove the
  * delivered DATA is right.
  */
object Connectors {

  /** Per-JVM output directory for the V2 write roundtrip, overwritten in
    * place each invocation and removed on exit (same lifecycle rationale as
    * Sketches.bucketDir). */
  lazy val tsvDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_tsv_out")
    Runtime.getRuntime.addShutdownHook(new Thread(() =>
      try {
        import scala.jdk.CollectionConverters._
        java.nio.file.Files.walk(dir).iterator().asScala.toSeq.reverse
          .foreach(p => java.nio.file.Files.deleteIfExists(p))
      } catch { case _: Exception => () }))
    dir.toString
  }

  val defs: Seq[QDef] = Seq(

    // Row-level scan through the connector: projection builds the payload
    // string in the reader; the id range comes from pushed filters.
    QDef("x_dsv2_scan",
      """SELECT range AS id, 'row-' || range AS payload
        |FROM range(250, 750)""".stripMargin) { (s, _) =>
      s.read.format("graft-range")
        .option("start", "0").option("end", "1000").option("slices", "8")
        .load()
        .filter(col("id") >= 250 && col("id") < 750)
    },

    // Aggregate over a pushdown-narrowed scan: 32 slices planned, only the
    // ~2 overlapping [2500, 7500) survive split pruning — the connector
    // analogue of partition pruning on a 100 TB source.
    QDef("x_dsv2_pushdown",
      """SELECT CAST(count(*) AS BIGINT) AS cnt,
        |  CAST(sum(range) AS BIGINT) AS total
        |FROM range(2500, 7500)""".stripMargin) { (s, _) =>
      s.read.format("graft-range")
        .option("start", "0").option("end", "100000").option("slices", "32")
        .load()
        .filter(col("id") >= 2500 && col("id") < 7500)
        .agg(count(lit(1)).as("cnt"), sum(col("id")).as("total"))
    },

    // AGGREGATE pushdown (SupportsPushDownAggregates, COMPLETE form): the
    // ungrouped count/min/max/sum over the filtered interval collapses to
    // a one-row, one-partition planning-time answer — no row generation,
    // no HashAggregate in the plan (asserted by GraftRangeSourceSpec).
    // The real-world shape: a warehouse connector answering count(*) from
    // catalog stats instead of scanning 100 TB.
    QDef("x_dsv2_agg_pushdown",
      """SELECT CAST(count(*) AS BIGINT) AS cnt,
        |  CAST(min(range) AS BIGINT) AS min_id,
        |  CAST(max(range) AS BIGINT) AS max_id,
        |  CAST(sum(range) AS BIGINT) AS total
        |FROM range(1000, 99000)""".stripMargin) { (s, _) =>
      s.read.format("graft-range")
        .option("start", "0").option("end", "1000000").option("slices", "64")
        .load()
        .filter(col("id") >= 1000 && col("id") < 99000)
        .agg(count(lit(1)).as("cnt"), min(col("id")).as("min_id"),
          max(col("id")).as("max_id"), sum(col("id")).as("total"))
    },

    // GROUP-BY aggregate pushdown (complete form): with the `buckets`
    // option the source exposes a derived `bucket` column (id % buckets)
    // and answers GROUP BY bucket in closed form — each residue class of
    // the pushed interval is an arithmetic progression, so the "scan" IS
    // |buckets| planning-time rows and Spark removes its aggregate
    // entirely (asserted by GraftRangeSourceSpec). The real-world shape:
    // a partitioned warehouse table answering per-partition counts from
    // catalog stats without touching data.
    QDef("x_dsv2_group_pushdown",
      """SELECT CAST(range % 16 AS INT) AS bucket,
        |  CAST(count(*) AS BIGINT) AS cnt,
        |  CAST(min(range) AS BIGINT) AS min_id,
        |  CAST(max(range) AS BIGINT) AS max_id,
        |  CAST(sum(range) AS BIGINT) AS total
        |FROM range(1000, 99000) GROUP BY 1""".stripMargin) { (s, _) =>
      s.read.format("graft-range")
        .option("start", "0").option("end", "1000000").option("slices", "64")
        .option("buckets", "16")
        .load()
        .filter(col("id") >= 1000 && col("id") < 99000)
        .groupBy(col("bucket"))
        .agg(count(lit(1)).as("cnt"), min(col("id")).as("min_id"),
          max(col("id")).as("max_id"), sum(col("id")).as("total"))
    },

    // WRITE path roundtrip through the V2 commit protocol
    // (graft.sources.GraftTsvSource): land a per-nation aggregate via
    // task-temp files + driver-side publish, then read it back through the
    // connector — including an escaping-hostile string column. The oracle
    // recomputes the aggregate directly; equality proves the sink landed
    // exactly the query result (no lost/duplicated/garbled rows).
    QDef("x_dsv2_write",
      """SELECT n.n_name, n.n_name || CHR(9) || 'x' AS tagged,
        |  CAST(count(*) AS BIGINT) AS customers,
        |  CAST(sum(CAST(round(c.c_acctbal * 100) AS BIGINT)) AS BIGINT) AS bal_cents
        |FROM customer c JOIN nation n ON n.n_nationkey = c.c_nationkey
        |GROUP BY 1, 2""".stripMargin) { (s, d) =>
      val t = graft.Tables(s, d)
      val agg = t.customer.join(broadcast(t.nation),
          col("n_nationkey") === col("c_nationkey"))
        .groupBy(col("n_name"))
        .agg(count(lit(1)).as("customers"),
          sum(round(col("c_acctbal") * 100, 0).cast("bigint")).as("bal_cents"))
        .select(col("n_name"), concat(col("n_name"), lit("\tx")).as("tagged"),
          col("customers"), col("bal_cents"))
      agg.write.format("graft-tsv").option("path", tsvDir)
        .mode("overwrite").save()
      s.read.format("graft-tsv").option("path", tsvDir).load()
    },

    // STORAGE-PARTITIONED JOIN: two connector tables declaring the SAME
    // bucket layout (`layout=grouped` → KeyGroupedPartitioning(bucket) +
    // per-split HasPartitionKey) join on (bucket, id) and group on bucket
    // with ZERO exchanges end to end — the plan Spark owes a warehouse
    // whose layout already co-partitions the join (asserted by
    // GraftRangeSourceSpec; `spark.sql.sources.v2.bucketing.enabled` +
    // subset co-partitioning in graft.Sessions). At 100 TB this is the
    // fact-to-fact join enabler: the ONE big shuffle in the plan is
    // replaced by the layout the storage already maintains. Ranges sized
    // past the broadcast threshold so the exchange-free plan is the SMJ
    // the assertion means, not a broadcast degenerate.
    QDef("x_dsv2_spj",
      """WITH a AS (
        |  SELECT i AS id, CAST(i % 8 AS INT) AS bucket
        |  FROM generate_series(0, 999999) t(i)),
        |b AS (SELECT i AS id FROM generate_series(500000, 1499999) t(i))
        |SELECT a.bucket, CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(a.id) AS BIGINT) AS sum_id
        |FROM a JOIN b ON a.id = b.id GROUP BY 1""".stripMargin) { (s, _) =>
      def grouped(start: Long, end: Long) = s.read.format("graft-range")
        .option("start", start.toString).option("end", end.toString)
        .option("slices", "8").option("buckets", "8").option("layout", "grouped")
        .load()
      val a = grouped(0, 1000000)
      val b = grouped(500000, 1500000)
      a.join(b, a("bucket") === b("bucket") && a("id") === b("id"))
        .groupBy(a("bucket")).agg(count(lit(1)).as("n"), sum(a("id")).as("sum_id"))
    },

    // The full catalog SQL surface (graft.sources.GraftCatalog): CTAS a
    // per-region customer rollup INTO the catalog, read it back with a
    // second SQL query over the catalog identifier. DDL → V2 commit →
    // catalog-resolved scan, end to end; the oracle recomputes the rollup.
    QDef("x_dsv2_catalog",
      """SELECT r.r_name,
        |  CAST(count(*) AS BIGINT) AS nations,
        |  CAST(sum(cust) AS BIGINT) AS customers
        |FROM (SELECT n_nationkey, n_regionkey,
        |        (SELECT count(*) FROM customer c WHERE c.c_nationkey = n.n_nationkey) AS cust
        |      FROM nation n) x
        |JOIN region r ON r.r_regionkey = x.n_regionkey
        |GROUP BY 1""".stripMargin) { (s, d) =>
      val t = graft.Tables(s, d)
      s.conf.set("spark.sql.catalog.graft", "graft.sources.GraftCatalog")
      s.conf.set("spark.sql.catalog.graft.base", s"$tsvDir-catalog")
      t.customer.createOrReplaceTempView("customer_v")
      t.nation.createOrReplaceTempView("nation_v")
      t.region.createOrReplaceTempView("region_v")
      s.sql("CREATE NAMESPACE IF NOT EXISTS graft.marts")
      s.sql("DROP TABLE IF EXISTS graft.marts.region_rollup")
      s.sql("""CREATE TABLE graft.marts.region_rollup AS
        |SELECT r.r_name,
        |  CAST(count(*) AS BIGINT) AS nations,
        |  CAST(sum(cust) AS BIGINT) AS customers
        |FROM (SELECT n.n_nationkey, n.n_regionkey,
        |        (SELECT count(*) FROM customer_v c
        |         WHERE c.c_custkey IS NOT NULL AND c.c_nationkey = n.n_nationkey) AS cust
        |      FROM nation_v n) x
        |JOIN region_v r ON r.r_regionkey = x.n_regionkey
        |GROUP BY 1""".stripMargin)
      s.sql("SELECT r_name, nations, customers FROM graft.marts.region_rollup")
    },

    // PARTITIONED catalog table: events land `PARTITIONED BY (event_type)`
    // through the connector's dynamic-partition write (tasks route rows to
    // hive-style `event_type=…/` dirs), then the read-back predicate is
    // consumed by the scan as a partition filter — non-matching dirs never
    // become splits (directory-index pruning, asserted plan-level in
    // GraftTsvPartitionSpec). Oracle recomputes from the parquet source:
    // layout + connector roundtrip must never change results.
    QDef("x_dsv2_partitioned",
      """SELECT user_id, CAST(count(*) AS BIGINT) AS views,
        |  CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS value_cents
        |FROM events WHERE event_type = 'view'
        |GROUP BY 1""".stripMargin) { (s, d) =>
      val t = graft.Tables(s, d)
      s.conf.set("spark.sql.catalog.graft", "graft.sources.GraftCatalog")
      s.conf.set("spark.sql.catalog.graft.base", s"$tsvDir-catalog")
      s.sql("CREATE NAMESPACE IF NOT EXISTS graft.marts")
      s.sql("DROP TABLE IF EXISTS graft.marts.events_p")
      s.sql(
        """CREATE TABLE graft.marts.events_p
          |  (user_id BIGINT, event_type STRING, cents BIGINT)
          |PARTITIONED BY (event_type)""".stripMargin)
      t.events.select(col("user_id"), col("event_type"),
          round(col("value") * 100, 0).cast("bigint").as("cents"))
        .writeTo("graft.marts.events_p").append()
      s.table("graft.marts.events_p")
        .filter(col("event_type") === "view")
        .groupBy("user_id")
        .agg(count(lit(1)).as("views"), sum(col("cents")).as("value_cents"))
    }
  )
}
