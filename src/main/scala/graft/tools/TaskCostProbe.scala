package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.sum

/** Measures the FIXED per-task CPU cost of typed (Dataset-lambda) stages
  * vs codegen'd SQL stages at different partition counts — the datum
  * behind AdaptiveShuffle.spread's quarter-width choice: a typed-kernel
  * task pays encoder/codegen init plus interpreted execution until JIT
  * warms, so on a small input many short tasks burn more CPU than they
  * parallelize. Dev measurement tool.
  *
  * Measured on this box (local[32], steady state after warm, widest
  * stage per probe): sql stages ≈ 15 ms CPU/task fixed, typed stages ≈
  * 18–39 ms CPU/task — roughly 2× — and real doc kernels with wide
  * encoders measured 100–200 ms/task in QProf. Either way the fixed
  * cost swamps per-row work on a small input, which is why spread fans
  * out to parallelism/4 rather than full width.
  */
object TaskCostProbe {
  def main(args: Array[String]): Unit = {
    val s = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    import s.implicits._
    // record the WIDEST stage since the probe started, not the last one:
    // the SQL aggregate finishes with a 1-task final stage that would
    // otherwise mask the p-task scan+partial-agg stage being varied
    @volatile var bigCpu = 0L
    @volatile var bigTasks = 0
    s.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit =
        if (e.stageInfo.numTasks >= bigTasks) {
          bigTasks = e.stageInfo.numTasks
          bigCpu = e.stageInfo.taskMetrics.executorCpuTime / 1000000
        }
    })
    def probe(name: String)(body: => Unit): Unit = {
      bigCpu = 0L; bigTasks = 0
      val t0 = System.nanoTime(); body
      Thread.sleep(200) // listener drain
      println(f"TASKCOST $name wall=${(System.nanoTime() - t0) / 1e9}%.3f " +
        f"widestStage tasks=$bigTasks cpuMs=$bigCpu")
    }
    s.range(0, 1000000, 1, 32).toDF("x").agg(sum($"x")).collect() // warm
    Seq(32, 8, 4).foreach { p =>
      probe(s"sql_${p}p")(s.range(0, 100000, 1, p).toDF("x").agg(sum($"x")).collect())
      probe(s"typed_${p}p")(s.range(0, 100000, 1, p).map(_ + 1).reduce(_ + _))
    }
    // repeat for steady state (first typed pass pays the encoder codegen)
    Seq(32, 8, 4).foreach { p =>
      probe(s"typed_${p}p_b")(s.range(0, 100000, 1, p).map(_ + 1).reduce(_ + _))
    }
    s.stop()
  }
}
