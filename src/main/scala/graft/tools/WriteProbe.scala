package graft.tools

import java.nio.file.Files

import org.apache.spark.sql.SparkSession

import graft.gen.CorpusWriter
import graft.job.ExtractJob

/** Times ExtractJob.run under parquet codec / layout variants to locate
  * the write-side cost PhaseProbe exposed (full_job ≈ 2× kernel_only at 8
  * cores). Dev measurement tool; env: WP_DOCS (default 300000), WP_CPUS
  * (default 8), WP_REPS (default 2). */
object WriteProbe {
  private def time[T](body: => T): Double = {
    val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
  }
  private def sync(): Unit =
    new ProcessBuilder("sync").inheritIO().start().waitFor()

  def main(args: Array[String]): Unit = {
    val nDocs = sys.env.getOrElse("WP_DOCS", "300000").toLong
    val cpus = sys.env.getOrElse("WP_CPUS", "8").toInt
    val reps = sys.env.getOrElse("WP_REPS", "2").toInt
    val shm = java.nio.file.Paths.get("/dev/shm")
    val base = (if (Files.isDirectory(shm)) Files.createTempDirectory(shm, "writeprobe")
      else Files.createTempDirectory("writeprobe")).toString
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    CorpusWriter.write(spark, nDocs, s"$base/corpus", 128)

    def run(tag: String): Double = {
      sync()
      val t = time(ExtractJob.run(spark, s"$base/corpus", s"$base/out_$tag", tag, 128))
      import scala.jdk.CollectionConverters._
      val p = java.nio.file.Paths.get(s"$base/out_$tag")
      val bytes = Files.walk(p).iterator().asScala.filter(Files.isRegularFile(_))
        .map(Files.size).sum
      println(f"WRITEPROBE $tag wall=$t%.2f out_bytes=${bytes / 1048576.0}%.1fMB")
      Files.walk(p).iterator().asScala.toSeq.reverse.foreach(x => Files.deleteIfExists(x))
      t
    }

    run("warm")
    Seq("snappy", "lz4", "zstd", "uncompressed").foreach { codec =>
      // TableIO.write sets the writer's compression option explicitly
      // (from spark.graft.parquet.codec), which overrides the session's
      // spark.sql.parquet.compression.codec — vary the graft conf or the
      // sweep silently measures zstd four times
      spark.conf.set("spark.graft.parquet.codec", codec)
      val ts = (1 to reps).map(r => run(s"${codec}_$r"))
      println(f"WRITEPROBE codec=$codec min=${ts.min}%.2f")
    }
    spark.conf.unset("spark.graft.parquet.codec")
    spark.stop()
    // free the memory-backed corpus (the Bench deleteRec doctrine —
    // leaked tmpfs shrinks memory for later bench children)
    import scala.jdk.CollectionConverters._
    Files.walk(java.nio.file.Paths.get(base)).iterator().asScala.toSeq
      .reverse.foreach(p => Files.deleteIfExists(p))
  }
}
