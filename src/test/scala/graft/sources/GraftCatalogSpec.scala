package graft.sources

import java.nio.file.Files

import graft.SparkSpec

class GraftCatalogSpec extends SparkSpec {

  private lazy val warehouse = Files.createTempDirectory("graft_catalog").toString

  private def sqlRows(q: String) = spark.sql(q).collect()

  // catalogs instantiate lazily on first reference, so setting the conf on
  // the shared session is enough — no session restart needed
  private lazy val registered: Unit = {
    spark.conf.set("spark.sql.catalog.graft", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.graft.base", warehouse)
  }

  test("full SQL DDL/DML lifecycle: create, insert, select, append, rename, drop") {
    registered
    spark.sql("CREATE NAMESPACE graft.lake")
    spark.sql("CREATE TABLE graft.lake.kv (id BIGINT, name STRING, score DOUBLE)")

    // typed-but-empty right after CREATE
    assert(sqlRows("SELECT * FROM graft.lake.kv").isEmpty)
    assert(spark.table("graft.lake.kv").schema.fieldNames.toSeq ===
      Seq("id", "name", "score"))

    spark.sql("INSERT INTO graft.lake.kv VALUES (1, 'a', 1.5), (2, 'b', -0.5)")
    assert(sqlRows("SELECT sum(id) FROM graft.lake.kv").head.getLong(0) === 3L)

    // a second INSERT appends — it must not clobber the first commit's parts
    spark.sql("INSERT INTO graft.lake.kv VALUES (3, 'c', 0.0)")
    assert(sqlRows("SELECT count(*) FROM graft.lake.kv").head.getLong(0) === 3L)
    assert(sqlRows("SELECT name FROM graft.lake.kv WHERE id = 1").head.getString(0) === "a")

    // catalog listing reflects the filesystem state
    assert(sqlRows("SHOW TABLES IN graft.lake").map(_.getString(1)).toSet === Set("kv"))

    spark.sql("ALTER TABLE graft.lake.kv RENAME TO lake.kv2")
    assert(sqlRows("SELECT count(*) FROM graft.lake.kv2").head.getLong(0) === 3L)

    spark.sql("DROP TABLE graft.lake.kv2")
    assert(sqlRows("SHOW TABLES IN graft.lake").isEmpty)
  }

  test("CTAS routes the query result through the connector write path") {
    registered
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.lake2")
    spark.sql("""CREATE TABLE graft.lake2.squares AS
      SELECT id, id * id AS sq FROM range(10)""")
    assert(sqlRows("SELECT sum(sq) FROM graft.lake2.squares").head.getLong(0) === 285L)
    // the warehouse directory holds committed TSV parts + schema + _SUCCESS
    // (resolved through the LIVE catalog instance: the session is shared
    // JVM-wide, so an earlier suite's registration wins the lazy init race
    // and this suite's `warehouse` value may not be the active base)
    val live = spark.sessionState.catalogManager.catalog("graft")
      .asInstanceOf[GraftCatalog].warehouseBase
    val dir = new java.io.File(live, "lake2/squares")
    val names = dir.listFiles().map(_.getName)
    assert(names.contains("_schema.json") && names.contains("_SUCCESS"))
    assert(names.exists(n => n.startsWith("part-") && n.endsWith(".tsv")))
    spark.sql("DROP TABLE graft.lake2.squares")
  }

  test("ALTER TABLE ADD COLUMN evolves the schema; pre-ALTER rows read the new column as NULL") {
    registered
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.lake3")
    spark.sql("CREATE TABLE graft.lake3.ev (id BIGINT, name STRING)")
    spark.sql("INSERT INTO graft.lake3.ev VALUES (1, 'old')")

    spark.sql("ALTER TABLE graft.lake3.ev ADD COLUMN score DOUBLE")
    // new writes carry the column; the old file was NOT rewritten
    spark.sql("INSERT INTO graft.lake3.ev VALUES (2, 'new', 9.5)")
    val rows = spark.sql("SELECT id, name, score FROM graft.lake3.ev")
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), if (r.isNullAt(2)) None else Some(r.getDouble(2))))).toMap
    assert(rows(1L) === (("old", None)))   // pre-ALTER row: NULL for the new column
    assert(rows(2L) === (("new", Some(9.5))))

    // non-nullable adds and non-ADD changes are rejected
    val e1 = intercept[Exception] {
      spark.sql("ALTER TABLE graft.lake3.ev ADD COLUMN strict BIGINT NOT NULL")
    }
    assert(e1.getMessage.contains("must be nullable"), e1.getMessage)
    intercept[Exception] { spark.sql("ALTER TABLE graft.lake3.ev DROP COLUMN name") }
    spark.sql("DROP TABLE graft.lake3.ev")
  }

  test("unsupported column types are rejected at CREATE") {
    registered
    val err = intercept[Exception] {
      spark.sql("CREATE TABLE graft.lake.bad (id BIGINT, xs ARRAY<INT>)")
    }
    assert(err.getMessage.contains("graft-tsv supports"))
  }
}
