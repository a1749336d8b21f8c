package graft.sources

import java.io.File
import java.util

import org.apache.spark.sql.catalyst.analysis.{NamespaceAlreadyExistsException, NoSuchNamespaceException, NoSuchTableException, TableAlreadyExistsException}
import org.apache.spark.sql.connector.catalog._
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** A DSv2 `TableCatalog` over [[GraftTsvSource]] tables — the piece that
  * turns the connector into a full SQL surface: `CREATE TABLE graft.ns.t`,
  * `INSERT INTO`, `SELECT`, `SHOW TABLES`, `DROP TABLE` all route through
  * here instead of path options. Register with
  *
  * {{{
  *   spark.sql.catalog.graft      = graft.sources.GraftCatalog
  *   spark.sql.catalog.graft.base = /path/to/warehouse
  * }}}
  *
  * Layout is the classic warehouse shape: `base/<namespace>/<table>/`, one
  * directory per table holding the committed TSV parts + `_schema.json`
  * (written at CREATE, so an empty table is still fully typed). All
  * catalog state IS the filesystem — no external metastore; at scale the
  * same interface is how engines swap in a real catalog (HMS, Glue,
  * REST) without touching query code, which is exactly the decoupling the
  * V2 catalog API exists for. Writes inherit the connector's two-phase
  * commit; reads its splits/pruning/statistics.
  */
class GraftCatalog extends TableCatalog with SupportsNamespaces {

  private var catalogName: String = _
  private var base: File = _

  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    val b = options.get("base")
    require(b != null, s"catalog $name requires option 'base' (warehouse dir)")
    base = new File(b)
    base.mkdirs()
  }
  override def name(): String = catalogName
  private[sources] def warehouseBase: File = base

  private def nsDir(namespace: Array[String]): File = {
    require(namespace.length == 1, "graft catalog uses single-level namespaces")
    new File(base, namespace.head)
  }
  private def tableDir(ident: Identifier): File =
    new File(nsDir(ident.namespace()), ident.name())

  // ---------------------------------------------------------- namespaces

  override def listNamespaces(): Array[Array[String]] =
    Option(base.listFiles()).getOrElse(Array.empty)
      .filter(_.isDirectory).map(d => Array(d.getName))

  override def listNamespaces(namespace: Array[String]): Array[Array[String]] =
    if (namespace.isEmpty) listNamespaces()
    else if (namespaceExists(namespace)) Array.empty
    else throw new NoSuchNamespaceException(namespace.toSeq)

  override def namespaceExists(namespace: Array[String]): Boolean =
    namespace.length == 1 && nsDir(namespace).isDirectory

  override def loadNamespaceMetadata(namespace: Array[String]): util.Map[String, String] =
    if (namespaceExists(namespace)) util.Collections.emptyMap()
    else throw new NoSuchNamespaceException(namespace.toSeq)

  override def createNamespace(namespace: Array[String],
      metadata: util.Map[String, String]): Unit = {
    if (namespaceExists(namespace))
      throw new NamespaceAlreadyExistsException(namespace)
    nsDir(namespace).mkdirs()
  }

  override def alterNamespace(namespace: Array[String],
      changes: NamespaceChange*): Unit =
    throw new UnsupportedOperationException("graft namespaces carry no metadata")

  override def dropNamespace(namespace: Array[String], cascade: Boolean): Boolean = {
    val d = nsDir(namespace)
    if (!d.isDirectory) false
    else {
      val tables = Option(d.listFiles()).getOrElse(Array.empty)
      if (tables.nonEmpty && !cascade)
        throw new IllegalStateException(s"namespace ${namespace.head} is not empty")
      def rm(f: File): Unit = {
        Option(f.listFiles()).getOrElse(Array.empty).foreach(rm); f.delete()
      }
      rm(d); true
    }
  }

  // -------------------------------------------------------------- tables

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    if (!namespaceExists(namespace)) throw new NoSuchNamespaceException(namespace.toSeq)
    Option(nsDir(namespace).listFiles()).getOrElse(Array.empty)
      .filter(_.isDirectory).map(d => Identifier.of(namespace, d.getName))
  }

  override def tableExists(ident: Identifier): Boolean =
    new File(tableDir(ident), "_schema.json").exists()

  override def loadTable(ident: Identifier): Table = {
    if (!tableExists(ident)) throw new NoSuchTableException(ident)
    val dir = tableDir(ident).getAbsolutePath
    new GraftTsvTable(dir, GraftTsv.readSchema(dir).get)
  }

  override def createTable(ident: Identifier, schema: StructType,
      partitions: Array[Transform], properties: util.Map[String, String]): Table = {
    if (tableExists(ident)) throw new TableAlreadyExistsException(ident)
    // `PARTITIONED BY (col, …)` arrives as identity Transforms; the layout
    // is hive-style `col=value/` directories (see GraftTsvSource). Bucket/
    // days/etc. transforms are rejected — this connector prunes by VALUE.
    val partCols = partitions.map { t =>
      require(t.name == "identity" && t.references.length == 1,
        s"graft-tsv supports only identity partitioning, got $t")
      val c = t.references.head.fieldNames.mkString(".")
      require(schema.fieldNames.contains(c), s"partition column '$c' not in schema")
      c
    }
    GraftTsv.checkSchema(schema)
    val dir = tableDir(ident)
    dir.mkdirs()
    // schema + partition spec land at CREATE: an empty table is fully
    // typed, and a crash between CREATE and first INSERT leaves a valid
    // (empty) table
    if (partCols.nonEmpty) GraftTsv.writePartCols(dir.getAbsolutePath, partCols.toSeq)
    GraftTsv.writeSchema(dir.getAbsolutePath, schema)
    new GraftTsvTable(dir.getAbsolutePath, schema)
  }

  /** `ALTER TABLE ... ADD COLUMN` — schema evolution WITHOUT rewriting
    * data: only `_schema.json` changes; files written before the ALTER
    * have fewer fields and their missing trailing columns read as NULL
    * (reader contract, spec-proven). New columns must be nullable — the
    * historical rows have no value to give. Other changes are rejected:
    * drops/renames/type changes would reinterpret existing bytes. */
  override def alterTable(ident: Identifier, changes: TableChange*): Table = {
    if (!tableExists(ident)) throw new NoSuchTableException(ident)
    val dir = tableDir(ident).getAbsolutePath
    val evolved = changes.foldLeft(GraftTsv.readSchema(dir).get) { (schema, ch) =>
      ch match {
        case add: TableChange.AddColumn =>
          require(add.fieldNames().length == 1, "graft-tsv has no nested columns")
          require(add.isNullable,
            s"new column '${add.fieldNames().head}' must be nullable: " +
              "pre-ALTER rows have no value for it")
          val next = schema.add(add.fieldNames().head, add.dataType(), nullable = true)
          GraftTsv.checkSchema(next)
          next
        case other =>
          throw new UnsupportedOperationException(
            s"graft-tsv supports only ADD COLUMN, got $other")
      }
    }
    GraftTsv.writeSchema(dir, evolved)
    new GraftTsvTable(dir, evolved)
  }

  override def dropTable(ident: Identifier): Boolean = {
    val d = tableDir(ident)
    if (!d.isDirectory) false
    else {
      def rm(f: File): Unit = {
        Option(f.listFiles()).getOrElse(Array.empty).foreach(rm); f.delete()
      }
      rm(d); !d.exists()
    }
  }

  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit = {
    // RENAME TO targets arrive un-normalized; a bare name renames in place
    val target = if (newIdent.namespace().isEmpty)
      Identifier.of(oldIdent.namespace(), newIdent.name()) else newIdent
    if (!tableExists(oldIdent)) throw new NoSuchTableException(oldIdent)
    if (tableExists(target)) throw new TableAlreadyExistsException(target)
    java.nio.file.Files.move(tableDir(oldIdent).toPath, tableDir(target).toPath)
  }
}