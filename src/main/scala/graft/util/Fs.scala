package graft.util

import java.nio.file.{Files, Path}

import scala.jdk.CollectionConverters._

/** Shared leak-free directory listing (`Files.list` holds a directory
  * handle until closed) — used by the file metastore and the DSv2 catalog.
  */
object Fs {
  def listDir(p: Path)(f: Iterator[Path] => Iterator[String]): Seq[String] = {
    if (!Files.exists(p)) return Nil
    val stream = Files.list(p)
    try f(stream.iterator().asScala).toSeq.sorted
    finally stream.close()
  }

  /** Best-effort recursive delete (deepest-first walk); used to clean up
    * per-invocation scratch directories. Missing paths are a no-op.
    */
  def deleteRecursively(p: Path): Unit = {
    if (!Files.exists(p)) return
    val stream = Files.walk(p)
    try stream.sorted(java.util.Comparator.reverseOrder[Path]())
      .forEach(f => Files.deleteIfExists(f))
    finally stream.close()
  }
}
