package graft.tools

import scala.collection.mutable

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Per-query job/stage profile: runs selected `SparkEntry.queries` entries
  * under a SparkListener and prints, per query, every job's wall time, its
  * stage count and task count, plus summed task metrics (executor run time,
  * shuffle bytes). Dev measurement tool (guide §1 — find WHERE the wall
  * goes before changing anything); the bench itself is untouched.
  *
  * Usage: runMain graft.tools.QProf <query...>
  * Env: QP_SF_DIR (default /root/testdata/sf0.1), QP_CPUS (default 32),
  * QP_REPS (default 2 — the profile prints for the LAST rep, so warehouse
  * builds in rep 1 don't pollute it).
  *
  * Known imprecision (acceptable for a dev profiler): a stage reused by
  * several jobs is credited to the job that registered it last, and
  * stage-completion events posting after the 300 ms drain window are
  * dropped — treat per-job numbers as indicative, sum-level numbers as
  * solid.
  */
object QProf {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: QProf <query name...>")
    val sfDir = sys.env.getOrElse("QP_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("QP_CPUS", "32").toInt
    val reps = sys.env.getOrElse("QP_REPS", "2").toInt
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    final case class JobRec(id: Int, var desc: String, var start: Long,
      var end: Long, var stages: Int, var tasks: Int,
      var execRunMs: Long, var shufReadB: Long, var shufWriteB: Long,
      val stageLines: mutable.ArrayBuffer[String] = mutable.ArrayBuffer.empty)
    val jobs = mutable.LinkedHashMap.empty[Int, JobRec]
    val stageToJob = mutable.HashMap.empty[Int, Int]
    val listener = new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = jobs.synchronized {
        val d = Option(e.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description"))).getOrElse("")
        jobs(e.jobId) = JobRec(e.jobId, d, e.time, 0L, e.stageIds.size, 0, 0L, 0L, 0L)
        e.stageIds.foreach(s => stageToJob(s) = e.jobId)
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit = jobs.synchronized {
        jobs.get(e.jobId).foreach(_.end = e.time)
      }
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = jobs.synchronized {
        val si = e.stageInfo
        for (j <- stageToJob.get(si.stageId); r <- jobs.get(j)) {
          r.tasks += si.numTasks
          r.execRunMs += si.taskMetrics.executorRunTime
          r.shufReadB += si.taskMetrics.shuffleReadMetrics.totalBytesRead
          r.shufWriteB += si.taskMetrics.shuffleWriteMetrics.bytesWritten
          if (si.taskMetrics.executorRunTime >= 200)
            r.stageLines += f"    stage=${si.stageId}%3d tasks=${si.numTasks}%4d " +
              f"execMs=${si.taskMetrics.executorRunTime}%6d cpuMs=${si.taskMetrics.executorCpuTime / 1000000}%6d " +
              f"deserMs=${si.taskMetrics.executorDeserializeTime}%5d gcMs=${si.taskMetrics.jvmGCTime}%5d " +
              si.name.take(90)
        }
      }
    }

    args.foreach { name =>
      val q = graft.SparkEntry.queries.getOrElse(name, sys.error(s"unknown query: $name"))
      var wall = 0.0
      (1 to reps).foreach { r =>
        if (r == reps) {
          jobs.clear(); stageToJob.clear()
          spark.sparkContext.addSparkListener(listener)
        }
        val t0 = System.nanoTime()
        q(spark, sfDir).write.mode("overwrite").format("noop").save()
        wall = (System.nanoTime() - t0) / 1e9
        if (r == reps) {
          Thread.sleep(300) // let the listener bus drain
          spark.sparkContext.removeSparkListener(listener)
        }
      }
      println(f"QPROF $name wall=$wall%.2f jobs=${jobs.size}")
      jobs.synchronized {
        jobs.values.foreach { j =>
          println(f"  job=${j.id}%3d ${(j.end - j.start) / 1000.0}%6.2fs stages=${j.stages}%2d " +
            f"tasks=${j.tasks}%4d execMs=${j.execRunMs}%6d " +
            f"shufR=${j.shufReadB / 1024}%7dK shufW=${j.shufWriteB / 1024}%7dK  ${j.desc.take(60)}")
          j.stageLines.foreach(println)
        }
      }
    }
    spark.stop()
  }
}
