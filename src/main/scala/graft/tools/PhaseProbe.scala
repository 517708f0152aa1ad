package graft.tools

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.gen.CorpusWriter
import graft.job.ExtractJob

/** Breaks the extraction job into phases and times each at two core counts
  * to locate the non-scaling (Amdahl) component. Dev tool.
  * Phases: (a) read+shuffle+kernel only (count, no write); (b) full
  * ExtractJob.run (write + read-back + manifests). */
object PhaseProbe {

  private def time[T](body: => T): Double = {
    val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
  }

  private def session(cpus: Int): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }

  def main(args: Array[String]): Unit = {
    val nDocs = sys.env.getOrElse("PROBE_DOCS", "200000").toLong
    val parts = sys.env.getOrElse("PROBE_PARTS", "128").toInt
    val base = Files.createTempDirectory("phaseprobe").toString

    var s = session(32)
    CorpusWriter.write(s, nDocs, s"$base/corpus", parts)
    ExtractJob.run(s, s"$base/corpus", s"$base/deep1", "deep1", parts)
    ExtractJob.run(s, s"$base/corpus", s"$base/deep2", "deep2", parts)
    s.stop()

    def sync(): Unit = new ProcessBuilder("sync").inheritIO().start().waitFor()

    Seq(2, 8).foreach { c =>
      val sp = session(c)
      import sp.implicits._
      def kernelOnly(): Double = time {
        sp.read.parquet(s"$base/corpus")
          .select(col("doc_id"), col("spans"))
          .repartition(parts, col("doc_id"), lit(graft.core.Spec.Salt))
          .as[graft.core.Doc]
          .mapPartitions(_.map(d => graft.kernel.Extractor.extractDoc(d).spans.size.toLong))
          .reduce(_ + _)
      }
      def full(tag: String): Double =
        time(ExtractJob.run(sp, s"$base/corpus", s"$base/f_${c}_$tag", s"f$c$tag", parts))
      kernelOnly(); sync() // warm this level
      val k = (1 to 2).map { _ => val t = kernelOnly(); sync(); t }.min
      full("w"); sync()
      val f = (1 to 2).map { r => val t = full(s"m$r"); sync(); t }.min
      println(f"PHASE cores=$c kernel_only=$k%.2fs full_job=$f%.2fs overhead=${f - k}%.2fs")
      sp.stop()
    }
  }
}
