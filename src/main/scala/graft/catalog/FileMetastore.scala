package graft.catalog

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.types.{DataType, StructType}

import graft.util.Retry

/** Durable metastore over a directory: one schema file per collection at
  * `<root>/<project>/<collection>.json` holding the Spark DDL-JSON of the
  * user schema. Plays the role of the reference's JDBC/Postgres metastore
  * (`MetastoreModule.java:34-44` binding `JDBCMetastore`) — the store is a
  * pluggable `Metastore` impl, and a JDBC one is a drop-in behind the same
  * trait. Reads go through [[Retry]] like the reference wrapped its
  * control-plane calls (`RetryDriver` use at
  * `KafkaConnectorPageSource.java:202-204`).
  */
final class FileMetastore(root: String, retry: Retry.Policy = Retry.Policy(maxAttempts = 3))
    extends Metastore {

  private def dir(project: String): Path = Paths.get(root, project)
  private def file(project: String, collection: String): Path =
    dir(project).resolve(s"$collection.json")

  def createCollection(project: String, collection: String, fields: Seq[SchemaField]): Unit = {
    Files.createDirectories(dir(project))
    val st = StructType(fields.map(_.toStructField))
    Files.write(file(project, collection), st.json.getBytes(StandardCharsets.UTF_8))
  }

  override def getCollection(project: String, collection: String): Option[Seq[SchemaField]] =
    Retry(s"getCollection $project.$collection", retry) {
      val f = file(project, collection)
      if (!Files.exists(f)) None
      else {
        val st = DataType.fromJson(new String(Files.readAllBytes(f), StandardCharsets.UTF_8))
          .asInstanceOf[StructType]
        Some(SchemaField.fromStructType(st))
      }
    }

  override def listProjects: Seq[String] = graft.util.Fs.listDir(Paths.get(root)) {
    _.filter(Files.isDirectory(_)).map(_.getFileName.toString)
  }

  /** Fingerprint of (path, size, nanosecond mtime) over every schema file —
    * a control-plane directory walk, far cheaper than re-reading and
    * re-registering every schema. Size + nano mtime catch a same-millisecond
    * rewrite on filesystems with fine timestamps; on coarse-timestamp
    * filesystems a same-tick same-size rewrite is still invisible — callers
    * needing hard guarantees use [[JdbcMetastore]]'s transactional counter.
    * Non-negative by construction (see [[Metastore.generation]]).
    */
  override def generation: Long = {
    var h = 17L
    for {
      p <- listProjects.sorted
      c <- listCollections(p).sorted
    } {
      val f = file(p, c)
      val (sz, sec, nano) =
        try {
          val t = Files.getLastModifiedTime(f).toInstant
          (Files.size(f), t.getEpochSecond, t.getNano.toLong)
        } catch { case _: Exception => (-1L, -1L, -1L) }
      h = h * 31 + p.hashCode
      h = h * 31 + c.hashCode
      h = h * 31 + sz
      h = h * 31 + sec
      h = h * 31 + nano
    }
    h & Long.MaxValue
  }

  override def listCollections(project: String): Seq[String] =
    graft.util.Fs.listDir(dir(project)) {
      _.map(_.getFileName.toString).filter(_.endsWith(".json")).map(_.stripSuffix(".json"))
    }
}
