package graft.job

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths, StandardCopyOption}

import scala.jdk.CollectionConverters._

import graft.core.LineageRow

/** Processed-partition manifests (SURVEY.md §4.3, FIXTURES.md §4).
  *
  * One JSON file per completed logical partition, written AFTER that
  * partition's output commits. Resume = skip pids that have a manifest.
  * Idempotent because doc→pid is `pmod(murmur3(doc_id, Spec.Salt), P)` —
  * a pure function — and the spans sink overwrites dynamically per pid.
  *
  * Local-FS implementation (the sandbox has no object store); the layout
  * (a `_manifests/` dir of small JSON files next to the table) ports
  * directly to HDFS/S3 — on a real cluster swap Files.* for the Hadoop
  * FileSystem API behind this same interface.
  */
object Checkpoint {

  private def dir(outputPath: String): Path = Paths.get(outputPath, "_manifests")

  def manifestPath(outputPath: String, pid: Int): Path =
    dir(outputPath).resolve(f"p$pid%05d.json")

  def completedPids(outputPath: String): Set[Int] = {
    val d = dir(outputPath)
    if (!Files.isDirectory(d)) Set.empty
    else
      Files.list(d).iterator().asScala
        .map(_.getFileName.toString)
        .collect { case n if n.startsWith("p") && n.endsWith(".json") =>
          n.stripPrefix("p").stripSuffix(".json").toInt
        }
        .toSet
  }

  /** Write-tmp-then-move so a crash mid-write never leaves a torn manifest. */
  def write(outputPath: String, row: LineageRow): Unit = {
    val d = dir(outputPath)
    Files.createDirectories(d)
    val json =
      s"""{"run_id":"${row.run_id}","partition_id":${row.partition_id},""" +
        s""""docs_in":${row.docs_in},"docs_out":${row.docs_out},"checksum":"${row.checksum}"}"""
    val tmp = d.resolve(f"p${row.partition_id}%05d.json.tmp")
    Files.write(tmp, json.getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, manifestPath(outputPath, row.partition_id),
      StandardCopyOption.REPLACE_EXISTING, StandardCopyOption.ATOMIC_MOVE)
  }

  def clear(outputPath: String): Unit = {
    val d = dir(outputPath)
    if (Files.isDirectory(d))
      Files.list(d).iterator().asScala.toList.foreach(Files.deleteIfExists(_))
  }
}
