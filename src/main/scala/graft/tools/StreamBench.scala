package graft.tools

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.core.TableIO
import graft.gen.{CorpusWriter, SpanGen}
import graft.job.ExtractJob
import graft.streaming.StreamExtract

/** Streaming throughput at bench scale — StreamingSpec proves batch/stream
  * parity and exactly-once restart at test scale (hundreds of docs); this
  * drives the SAME StreamExtract surface over the bench corpus (default
  * 300k docs, the Bench extraction corpus size) and records:
  *
  *  1. batch reference: one ExtractJob over the corpus (docs/s);
  *  2. stream drain: StreamExtract AvailableNow over the same files
  *     (maxFilesPerTrigger=16 → parts/16 micro-batches), docs/s;
  *  3. restart-resume at scale: append a delta of new doc files, restart
  *     the stream on the SAME checkpoint — only the delta may process, and
  *     output rows == distinct doc_ids == corpus+delta (exactly-once).
  *
  * Working set on /dev/shm like Bench (single-disk writeback is not the
  * thing under test). Backs BASELINE.md's streaming-at-scale note.
  *
  * Env: STREAMBENCH_DOCS (300000), STREAMBENCH_PARTS (128),
  * STREAMBENCH_DELTA (10000), STREAMBENCH_CPUS (32).
  */
object StreamBench {

  private def time[T](body: => T): Double = {
    val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
  }

  def main(args: Array[String]): Unit = {
    val nDocs = sys.env.getOrElse("STREAMBENCH_DOCS", "300000").toLong
    val parts = sys.env.getOrElse("STREAMBENCH_PARTS", "128").toInt
    val delta = sys.env.getOrElse("STREAMBENCH_DELTA", "10000").toLong
    val cpus = sys.env.getOrElse("STREAMBENCH_CPUS", "32").toInt
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val shm = java.nio.file.Paths.get("/dev/shm")
    val base = (if (Files.isDirectory(shm)) Files.createTempDirectory(shm, "graftstream")
      else Files.createTempDirectory("graftstream")).toString
    val corpus = s"$base/corpus"
    CorpusWriter.write(spark, nDocs, corpus, parts)

    // 1. batch reference — the same job Bench times (warm pass first so
    // both paths are compared JIT-warm)
    ExtractJob.run(spark, corpus, s"$base/warm", "warm", parts)
    val batchSec = time(ExtractJob.run(spark, corpus, s"$base/batch", "batch", parts))
    println(f"STREAMBENCH batch docs=$nDocs%d sec=$batchSec%.1f " +
      f"docs_per_sec=${nDocs / batchSec}%.0f")

    // 2. stream drain over the same files
    val outDir = s"$base/stream_out"
    val ckpt = s"$base/ckpt"
    val streamSec = time {
      val q = StreamExtract.run(spark, corpus, outDir, ckpt)
      q.awaitTermination()
    }
    val drained = spark.read.parquet(outDir).count()
    println(f"STREAMBENCH stream docs=$drained%d sec=$streamSec%.1f " +
      f"docs_per_sec=${drained / streamSec}%.0f " +
      f"vs_batch=${streamSec / batchSec}%.2fx")
    require(drained == nDocs, s"stream drained $drained of $nDocs docs")

    // 3. restart-resume: append a delta, restart on the same checkpoint —
    // the checkpointed file-source offsets must skip the already-drained
    // corpus and process only the delta, exactly once
    TableIO.write(
      spark.range(nDocs, nDocs + delta).map(i => SpanGen.genDoc(SpanGen.docId(i))).toDF(),
      corpus, mode = "append")
    val resumeSec = time {
      val q = StreamExtract.run(spark, corpus, outDir, ckpt)
      q.awaitTermination()
    }
    val out = spark.read.parquet(outDir)
    val rows = out.count()
    val distinct = out.select(countDistinct(col("doc_id"))).head().getLong(0)
    println(f"STREAMBENCH resume delta=$delta%d sec=$resumeSec%.1f " +
      f"rows=$rows%d distinct=$distinct%d " +
      s"exactly_once=${rows == nDocs + delta && distinct == nDocs + delta}")
    require(rows == nDocs + delta && distinct == nDocs + delta,
      s"resume broke exactly-once: rows=$rows distinct=$distinct expected=${nDocs + delta}")
    require(resumeSec < streamSec / 2,
      f"resume took $resumeSec%.1fs — did the restart reprocess the drained corpus?")

    try {
      import scala.jdk.CollectionConverters._
      Files.walk(java.nio.file.Paths.get(base)).iterator().asScala
        .toSeq.reverse.foreach(p => Files.deleteIfExists(p))
    } catch { case _: Throwable => () }
    spark.stop()
  }
}
