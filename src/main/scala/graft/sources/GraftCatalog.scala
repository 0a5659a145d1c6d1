package graft.sources

import java.util.{Map => JMap}

import org.apache.spark.sql.catalyst.analysis.{
  NoSuchNamespaceException, NoSuchTableException
}
import org.apache.spark.sql.connector.catalog.{
  Identifier, NamespaceChange, SupportsNamespaces, Table, TableCatalog,
  TableChange
}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** A PATH catalog over the engine's stores — the last step to "any
  * Spark user can query an engine log": plain SQL, no Scala API, no
  * `format(...)` plumbing. Register once
  *
  * {{{ spark.conf.set("spark.sql.catalog.graft",
  *                    "graft.sources.GraftCatalog") }}}
  *
  * (or the equivalent `--conf`), then
  *
  * {{{
  * SELECT value.*, seq FROM graft.log.`/data/events-log`
  * SELECT * FROM graft.table.`/data/kv-index` WHERE k = 'x'
  * }}}
  *
  * The identifier IS the path (Iceberg's path-table convention:
  * namespace picks the connector, the backticked name is the store
  * dir, local or URI-schemed). Tables resolve to the SAME DSv2
  * tables the `format("graft-log"/"graft-table")` readers build —
  * pushed seq bounds, manifest statistics, exact-version snapshots
  * via `versionAsOf` all apply unchanged, because this class only
  * does name resolution.
  *
  * Deliberately read-path-only as a catalog: stores are CREATED by
  * their owning APIs ([[graft.storage.ParquetLog.open]],
  * [[graft.storage.TableStore.open]]) whose open-time contracts
  * (schema pinning, manifest init, fsck) a SQL `CREATE TABLE` would
  * bypass; writes keep riding the battle-tested
  * `df.write.format("graft-log")` leg. DDL is refused loudly. */
class GraftCatalog extends TableCatalog with SupportsNamespaces {

  private var catalogName: String = "graft"

  override def initialize(
      name: String, options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
  }

  override def name(): String = catalogName

  /** The two connector namespaces: `log` (dense-seq ParquetLog) and
    * `table` (versioned TableStore). */
  private val Namespaces = Seq("log", "table")

  override def loadTable(ident: Identifier): Table = {
    val ns = ident.namespace()
    if (ns.length != 1 || !Namespaces.contains(ns(0)))
      throw new NoSuchTableException(ident)
    val dir = ident.name()
    try ns(0) match {
      case "log" =>
        new GraftLogTable(dir, GraftLogSource.schemaOf(dir))
      case "table" =>
        new GraftTableTable(dir, GraftTableSource.schemaOf(dir))
    } catch {
      // no manifest at the path = no table; surface it as the
      // resolver error SQL users expect, not an internal require
      case _: IllegalArgumentException =>
        throw new NoSuchTableException(ident)
    }
  }

  /** Paths are not enumerable — a listing would have to walk the
    * filesystem root. Empty, like other path catalogs. */
  override def listTables(namespace: Array[String]): Array[Identifier] = {
    if (namespace.length != 1 || !Namespaces.contains(namespace(0)))
      throw new NoSuchNamespaceException(namespace)
    Array.empty
  }

  override def createTable(
      ident: Identifier,
      schema: StructType,
      partitions: Array[Transform],
      properties: JMap[String, String]): Table =
    throw new UnsupportedOperationException(
      "graft catalog is read-resolution only: create stores through " +
        "ParquetLog.open / TableStore.open (their open-time contracts " +
        "pin the schema and initialize the manifest)")

  override def alterTable(ident: Identifier, changes: TableChange*): Table =
    throw new UnsupportedOperationException(
      "graft stores pin their schema at creation; ALTER is refused")

  override def dropTable(ident: Identifier): Boolean =
    throw new UnsupportedOperationException(
      "dropping a store is a filesystem operation on its dir, not DDL " +
        "— refused here so a typo cannot delete a corpus")

  override def renameTable(old: Identifier, to: Identifier): Unit =
    throw new UnsupportedOperationException(
      "store identity IS its path; rename the directory instead")

  // ── SupportsNamespaces: the two fixed connector namespaces ──────
  override def listNamespaces(): Array[Array[String]] =
    Namespaces.map(Array(_)).toArray

  override def listNamespaces(
      namespace: Array[String]): Array[Array[String]] =
    if (namespace.isEmpty) listNamespaces()
    else if (namespace.length == 1 && Namespaces.contains(namespace(0)))
      Array.empty
    else throw new NoSuchNamespaceException(namespace)

  override def loadNamespaceMetadata(
      namespace: Array[String]): JMap[String, String] =
    if (namespace.length == 1 && Namespaces.contains(namespace(0)))
      java.util.Collections.emptyMap()
    else throw new NoSuchNamespaceException(namespace)

  override def createNamespace(
      namespace: Array[String],
      metadata: JMap[String, String]): Unit =
    throw new UnsupportedOperationException(
      "graft namespaces are fixed (log, table)")

  override def alterNamespace(
      namespace: Array[String], changes: NamespaceChange*): Unit =
    throw new UnsupportedOperationException(
      "graft namespaces are fixed (log, table)")

  override def dropNamespace(
      namespace: Array[String], cascade: Boolean): Boolean =
    throw new UnsupportedOperationException(
      "graft namespaces are fixed (log, table)")
}
