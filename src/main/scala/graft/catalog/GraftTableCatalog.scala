package graft.catalog

import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.classic.SparkSession
import org.apache.spark.sql.connector.catalog._
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.execution.datasources.v2.parquet.ParquetTable
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** DSv2 `TableCatalog` giving the reference's `catalog.schema.table` naming
  * surface to `spark.sql`: `SELECT … FROM graft.<project>.<collection>`
  * (SURVEY C1's "TableCatalog (DSv2) if full spark.sql naming is wanted").
  *
  * Register with
  * `spark.sql.catalog.graft = graft.catalog.GraftTableCatalog` and
  * `spark.sql.catalog.graft.root = <dir>`. Tables resolve to Spark's own
  * parquet DSv2 table, so filter/column pushdown, partition pruning and
  * vectorized reads are the native ones. Read-only by design, exactly like
  * the reference (`KafkaConnector.java:29-30,83-87`): every mutation throws.
  *
  * Layout: `<root>/<collection>.parquet` (the fixture layout) under a
  * single default project namespace; a (project, collection) metastore tree
  * maps the same way with `<root>/<project>/<collection>.parquet`.
  */
class GraftTableCatalog extends TableCatalog with SupportsNamespaces {

  private var catalogName: String = _
  private var root: String = _
  private var defaultProject: String = "tpch"

  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    root = Option(options.get("root")).getOrElse(
      throw new IllegalArgumentException(s"catalog $name needs option 'root'"))
    defaultProject = Option(options.get("project")).getOrElse(defaultProject)
  }

  override def name(): String = catalogName

  private def rejectDeepNamespace(namespace: Array[String]): Unit =
    if (namespace.length > 1) {
      throw new org.apache.spark.sql.catalyst.analysis.NoSuchNamespaceException(
        namespace.toSeq)
    }

  private def pathFor(ident: Identifier): java.nio.file.Path = {
    rejectDeepNamespace(ident.namespace())
    val base = java.nio.file.Paths.get(root)
    ident.namespace() match {
      case Array(p) =>
        // nested tree wins; the flat fixture layout only backs the default
        // project (so a REAL <root>/<defaultProject>/ dir is never shadowed)
        val nested = base.resolve(p).resolve(s"${ident.name}.parquet")
        if (java.nio.file.Files.exists(nested)) nested
        else if (p == defaultProject) base.resolve(s"${ident.name}.parquet")
        else nested
      case _ => base.resolve(s"${ident.name}.parquet")
    }
  }

  override def tableExists(ident: Identifier): Boolean =
    java.nio.file.Files.exists(pathFor(ident))

  override def loadTable(ident: Identifier): Table = {
    val p = pathFor(ident)
    if (!java.nio.file.Files.exists(p)) {
      // parity: TableNotFoundException (KafkaMetadata.java:159-161)
      throw new org.apache.spark.sql.catalyst.analysis.NoSuchTableException(ident)
    }
    ParquetTable(
      s"$catalogName.${ident.namespace().mkString(".")}.${ident.name}",
      SparkSession.active,
      CaseInsensitiveStringMap.empty(),
      Seq(p.toString),
      None,
      classOf[ParquetFileFormat])
  }

  private def parquetNames(dir: java.nio.file.Path): Seq[String] =
    graft.util.Fs.listDir(dir) {
      _.map(_.getFileName.toString).filter(_.endsWith(".parquet"))
        .map(_.stripSuffix(".parquet"))
    }

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    rejectDeepNamespace(namespace)
    val names = namespace match {
      case Array(p) if p == defaultProject =>
        (parquetNames(java.nio.file.Paths.get(root))
          ++ parquetNames(java.nio.file.Paths.get(root, p))).distinct.sorted
      case Array(p) => parquetNames(java.nio.file.Paths.get(root, p))
      case _ => parquetNames(java.nio.file.Paths.get(root))
    }
    names.map(Identifier.of(namespace, _)).toArray
  }

  // ---- read-only: reference parity (KafkaConnector.java:83-87) ----
  override def createTable(ident: Identifier, schema: StructType,
      partitions: Array[Transform], properties: util.Map[String, String]): Table =
    throw new UnsupportedOperationException("graft catalog is read-only")
  override def alterTable(ident: Identifier, changes: TableChange*): Table =
    throw new UnsupportedOperationException("graft catalog is read-only")
  override def dropTable(ident: Identifier): Boolean =
    throw new UnsupportedOperationException("graft catalog is read-only")
  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit =
    throw new UnsupportedOperationException("graft catalog is read-only")

  // ---- namespaces = projects ----
  override def listNamespaces(): Array[Array[String]] = {
    val nested = graft.util.Fs.listDir(java.nio.file.Paths.get(root)) {
      _.filter(java.nio.file.Files.isDirectory(_))
        .map(_.getFileName.toString)
        // Spark writes tables AS directories named <t>.parquet — those are
        // tables of the default project, not projects
        .filterNot(_.endsWith(".parquet"))
    }
    (defaultProject +: nested).distinct.map(Array(_)).toArray
  }

  override def listNamespaces(namespace: Array[String]): Array[Array[String]] =
    if (namespace.isEmpty) listNamespaces() else Array.empty

  override def namespaceExists(namespace: Array[String]): Boolean =
    listNamespaces().exists(_.sameElements(namespace))

  override def loadNamespaceMetadata(namespace: Array[String]): util.Map[String, String] = {
    if (!namespaceExists(namespace)) {
      throw new org.apache.spark.sql.catalyst.analysis.NoSuchNamespaceException(
        namespace.toSeq)
    }
    util.Collections.emptyMap()
  }

  override def createNamespace(namespace: Array[String],
      metadata: util.Map[String, String]): Unit =
    throw new UnsupportedOperationException("graft catalog is read-only")
  override def alterNamespace(namespace: Array[String], changes: NamespaceChange*): Unit =
    throw new UnsupportedOperationException("graft catalog is read-only")
  override def dropNamespace(namespace: Array[String], cascade: Boolean): Boolean =
    throw new UnsupportedOperationException("graft catalog is read-only")
}
