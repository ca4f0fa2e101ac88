package graft.sources

import java.nio.file.{Files, Paths}
import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.analysis.{NoSuchNamespaceException, NoSuchTableException, TableAlreadyExistsException}
import org.apache.spark.sql.connector.catalog.{Identifier, Table, TableCatalog, TableChange}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** DSv2 [[TableCatalog]] over manifest tables — the piece that turns the
  * sink from a path-addressed format into a NAMED SQL surface:
  *
  * {{{
  *   spark.sql.catalog.graft      = graft.sources.GraftCatalog
  *   spark.sql.catalog.graft.root = /data/graft
  *
  *   CREATE TABLE graft.db.t (id BIGINT, name STRING)
  *   INSERT INTO graft.db.t VALUES (1, 'a')
  *   SELECT * FROM graft.db.t
  *   DELETE FROM graft.db.t WHERE id = 1      -- SupportsDelete, 3VL exact
  * }}}
  *
  * Identifiers map to directories under `root` (namespace levels are
  * nested dirs), so every table keeps the full manifest feature set —
  * snapshots, time travel, deletion vectors, schema evolution, zone
  * maps — and the SQL layer and the path API see the SAME table.
  * `CREATE TABLE` publishes a schema-only manifest (commit 0), so an
  * empty table has a real schema immediately (the reference's CREATE
  * path makes the same move: DDL before data,
  * H2CsvCreateSink.scala:106–126). Partition transforms are refused —
  * layout belongs to `optimize`'s clustered rewrite, not to path
  * partitioning. Rename is a directory move (same-filesystem atomic);
  * drop recursively removes the table dir. */
class GraftCatalog extends TableCatalog {

  private var catalogName: String = _
  private var root: String = _

  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    root = Option(options.get("root")).getOrElse(
      throw new IllegalArgumentException(
        s"catalog $name needs spark.sql.catalog.$name.root=<dir>"))
  }

  override def name(): String = catalogName

  private def dir(ident: Identifier): java.nio.file.Path =
    Paths.get(root, (ident.namespace() :+ ident.name()): _*)

  private def exists(ident: Identifier): Boolean =
    ManifestFileSink.manifests(dir(ident).toString).nonEmpty

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    val ns = Paths.get(root, namespace: _*)
    if (!Files.isDirectory(ns)) throw new NoSuchNamespaceException(namespace)
    val out = Files.list(ns)
    try out.iterator().asScala
      .filter(p => Files.isDirectory(p) &&
        ManifestFileSink.manifests(p.toString).nonEmpty)
      .map(p => Identifier.of(namespace, p.getFileName.toString))
      .toArray
    finally out.close()
  }

  override def loadTable(ident: Identifier): Table = {
    if (!exists(ident)) throw new NoSuchTableException(ident)
    val path = dir(ident).toString
    val schema = ManifestFileSink.storedSchema(path, None)
      .getOrElse(new StructType())
    new ManifestTable(path, schema, acceptAnySchema = false)
  }

  /** SQL time travel: `SELECT … FROM graft.db.t VERSION AS OF <v>` where
    * `<v>` is a commit seq number or a manifest name. The returned table
    * is a read-only pin of that snapshot — repeatable no matter how many
    * commits land afterwards; writes and DELETE refuse. A seq retired by
    * compaction fails with the manifest layer's explicit expire-snapshots
    * error, never an empty answer. */
  override def loadTable(ident: Identifier, version: String): Table = {
    if (!exists(ident)) throw new NoSuchTableException(ident)
    val path = dir(ident).toString
    val manifest =
      if (version.forall(_.isDigit))
        ManifestFileSink.orderedManifests(path)
          .find(m => ManifestFileSink.readMeta(m).seq == version.toLong)
          .map(_.getName)
          .getOrElse(throw new IllegalArgumentException(
            s"no commit with seq $version in ${ident.name()} (retired by " +
              "compaction, or never published)"))
      else version
    val schema = ManifestFileSink.storedSchema(path, Some(manifest))
      .getOrElse(new StructType())
    new ManifestTable(path, schema, acceptAnySchema = false,
      pinnedAsOf = Some(manifest))
  }

  /** `TIMESTAMP AS OF` is deliberately unsupported: commit order is
    * defined by manifest seq (coarse local-fs mtimes order same-tick
    * commits arbitrarily — the reason the header exists), so a
    * wall-clock pin could resolve to the WRONG snapshot. Use
    * `VERSION AS OF <seq>`. */
  override def loadTable(ident: Identifier, timestamp: Long): Table =
    throw new UnsupportedOperationException(
      "TIMESTAMP AS OF is not supported (local-fs mtimes don't order " +
        "commits); use VERSION AS OF <seq|manifest>")

  override def createTable(
      ident: Identifier,
      schema: StructType,
      partitions: Array[Transform],
      properties: util.Map[String, String]): Table = {
    require(partitions.isEmpty,
      "graft tables do not take partition transforms; use optimize(clusterBy) for layout")
    if (exists(ident)) throw new TableAlreadyExistsException(ident)
    val path = dir(ident)
    Files.createDirectories(path)
    // Schema-only commit 0: the table exists, empty, with a real schema.
    ManifestFileSink.publish(path.toString,
      s"manifest-${java.util.UUID.randomUUID().toString}",
      ManifestFileSink.asNullable(schema), Array.empty)
    new ManifestTable(path.toString, ManifestFileSink.asNullable(schema),
      acceptAnySchema = false)
  }

  override def alterTable(ident: Identifier, changes: TableChange*): Table =
    throw new UnsupportedOperationException(
      "ALTER TABLE is not supported; schema evolves by-name on append, " +
        "and migrateSchema rewrites history")

  override def dropTable(ident: Identifier): Boolean = {
    val p = dir(ident)
    if (!exists(ident)) false
    else {
      val walk = Files.walk(p)
      try walk.sorted(java.util.Comparator.reverseOrder())
        .forEach(f => Files.deleteIfExists(f))
      finally walk.close()
      true
    }
  }

  override def renameTable(from: Identifier, to: Identifier): Unit = {
    if (!exists(from)) throw new NoSuchTableException(from)
    if (exists(to)) throw new TableAlreadyExistsException(to)
    Files.createDirectories(dir(to).getParent)
    Files.move(dir(from), dir(to))
  }
}
