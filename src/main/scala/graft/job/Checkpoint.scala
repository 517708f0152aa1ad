package graft.job

import java.nio.charset.StandardCharsets

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}

import graft.core.LineageRow

/** Processed-partition manifests (SURVEY.md §4.3, FIXTURES.md §4).
  *
  * One JSON file per completed logical partition, written AFTER that
  * partition's output commits. Resume = skip pids that have a manifest.
  * Idempotent because doc→pid is `pmod(murmur3(doc_id, Spec.Salt), P)` —
  * a pure function — and the spans sink overwrites dynamically per pid.
  *
  * All I/O resolves through the Hadoop FileSystem of the output path's
  * scheme (`file:/`, `hdfs:`, `s3a:`, …) — the same seam
  * `TableIO.readSubtrees` uses. A `java.nio.Files` probe silently sees
  * nothing on a non-local URI, which for resume would mean a restart
  * against object-store output re-processes every partition (and a torn
  * mixed-scheme write corrupts accounting); the FileSystem API makes the
  * manifest layout (`_manifests/` of small JSON files next to the table)
  * portable as-is. Callers on a live session pass
  * `spark.sessionState.newHadoopConf()` so scheme credentials/config flow
  * through; the default `Configuration` handles local and `file:` paths.
  */
object Checkpoint {

  private def dir(outputPath: String): Path = new Path(outputPath, "_manifests")

  def manifestPath(outputPath: String, pid: Int): Path =
    new Path(dir(outputPath), f"p$pid%05d.json")

  def completedPids(outputPath: String,
      conf: Configuration = new Configuration()): Set[Int] = {
    val d = dir(outputPath)
    val fs: FileSystem = d.getFileSystem(conf)
    if (!fs.exists(d)) Set.empty
    else
      fs.listStatus(d).iterator
        .map(_.getPath.getName)
        .collect { case n if n.startsWith("p") && n.endsWith(".json") =>
          n.stripPrefix("p").stripSuffix(".json").toInt
        }
        .toSet
  }

  /** Write-tmp-then-rename so a crash mid-write never leaves a torn
    * manifest (rename is atomic on HDFS and local FS; a pre-existing
    * manifest is deleted first — only reachable on a non-resume overwrite
    * of an already-complete pid, where either version is valid). */
  def write(outputPath: String, row: LineageRow,
      conf: Configuration = new Configuration()): Unit = {
    val d = dir(outputPath)
    val fs = d.getFileSystem(conf)
    fs.mkdirs(d)
    val json =
      s"""{"run_id":"${row.run_id}","partition_id":${row.partition_id},""" +
        s""""docs_in":${row.docs_in},"docs_out":${row.docs_out},"checksum":"${row.checksum}"}"""
    val tmp = new Path(d, f"p${row.partition_id}%05d.json.tmp")
    val out = fs.create(tmp, true)
    try out.write(json.getBytes(StandardCharsets.UTF_8)) finally out.close()
    val dst = manifestPath(outputPath, row.partition_id)
    if (fs.exists(dst)) fs.delete(dst, false)
    if (!fs.rename(tmp, dst)) sys.error(s"manifest rename failed: $tmp -> $dst")
  }

  def clear(outputPath: String,
      conf: Configuration = new Configuration()): Unit = {
    val d = dir(outputPath)
    val fs = d.getFileSystem(conf)
    if (fs.exists(d)) fs.delete(d, true)
  }
}
