package graft

import java.io.BufferedReader
import java.io.InputStreamReader

import org.apache.spark.sql.SparkSession

import graft.job.ExtractJob

/** One parallelism level of the extraction benchmark, run in its OWN JVM
  * (spawned by graft.Bench) so JVM-level resources scale with the level:
  * a single shared JVM gives the 2-core level the full 8 parallel GC
  * threads — ~20% "free" compute that deflates measured 2→8 scaling
  * (ScaleProbe: local[2] at 3,600 docs/s with 8 GC threads vs 2,820 with
  * 2). Each child gets `-XX:ParallelGCThreads=min(8,cores)` from the
  * parent — the per-executor proportionality a real N-vs-4N cluster has.
  *
  * Serve protocol (stdin/stdout): the parent keeps one child per level
  * ALIVE and alternates single measured runs between levels ("RUN <r>" →
  * one ExtractJob over the full corpus, reply `BENCH_LEVEL_RUN_SEC=<s>`;
  * "EXIT" → stop). Interleaving makes each efficiency sample a ratio of
  * two temporally-adjacent runs, so time-correlated host noise (shared-VM
  * steal comes in minutes-long waves here) cancels instead of landing on
  * whichever level ran last. JIT/codegen warmth persists inside each child
  * across passes; the warm-up runs use the small corpus (warmth is a
  * function of invocation counts, not data volume) and both criterion
  * levels get the identical warm protocol, so neither side is favored.
  */
object BenchLevel {

  private def time[T](body: => T): Double = {
    val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
  }

  private def sync(): Unit =
    new ProcessBuilder("sync").inheritIO().start().waitFor()

  // every run's output is deleted right after timing (untimed, before the
  // parent is told the run finished): the working set lives on /dev/shm —
  // RAM — and accumulating one output copy per warm+measured run (~12+
  // by pass 3 of a full bench) is exactly the monotonic memory growth that
  // OOM-killed the driver's round-5 child (rc=137)
  private def deleteRec(p: String): Unit = try {
    import scala.jdk.CollectionConverters._
    val path = java.nio.file.Paths.get(p)
    if (java.nio.file.Files.exists(path))
      java.nio.file.Files.walk(path).iterator().asScala.toSeq.reverse
        .foreach(x => java.nio.file.Files.deleteIfExists(x))
  } catch { case _: Throwable => () }

  def main(args: Array[String]): Unit = {
    val Array(corpus, warmCorpus, base, cpusS, partsS, warmsS, tag) = args
    val cpus = cpusS.toInt; val parts = partsS.toInt; val warms = warmsS.toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try {
      (1 to warms).foreach { w =>
        ExtractJob.run(spark, warmCorpus, s"$base/warm${w}_$tag", s"warm${w}_$tag", parts)
        deleteRec(s"$base/warm${w}_$tag")
      }
      sync()
      println("BENCH_LEVEL_READY")
      Console.out.flush()
      val in = new BufferedReader(new InputStreamReader(System.in))
      var line = in.readLine()
      while (line != null && !line.startsWith("EXIT")) {
        if (line.startsWith("RUN ")) {
          val r = line.stripPrefix("RUN ").trim
          // clear any partial output first: after a child death the parent
          // retries the SAME run id in a respawned child, and the job's
          // resume logic would otherwise skip the already-committed slice
          // of the dead child's run — a falsely fast timing
          deleteRec(s"$base/out_${tag}_$r")
          val t = time(ExtractJob.run(spark, corpus, s"$base/out_${tag}_$r", s"meas_${tag}_$r", parts))
          sync()
          deleteRec(s"$base/out_${tag}_$r")
          println(f"BENCH_LEVEL_RUN_SEC=$t%.3f")
          Console.out.flush()
        }
        line = in.readLine()
      }
    } finally spark.stop()
  }
}
