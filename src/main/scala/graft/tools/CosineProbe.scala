package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** A/B micro-benchmark: native codegen cosine_sim vs the higher-order
  * function formulation over a large broadcast-cosine scan. Dev tool. */
object CosineProbe {
  def main(args: Array[String]): Unit = {
    val n = sys.env.getOrElse("PROBE_VECS", "400000").toInt
    val dim = sys.env.getOrElse("PROBE_DIM", "64").toInt
    val reps = sys.env.getOrElse("PROBE_REPS", "3").toInt
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    graft.functions.CosineSimExpr.register(spark)

    val emb = spark.range(0, n).map { i =>
      (i, Array.tabulate(dim)(d => math.sin(i * 0.31 + d * 1.7).toFloat))
    }.toDF("vec_id", "embedding")
    emb.write.mode("overwrite").parquet("/tmp/cosprobe")
    val t = spark.read.parquet("/tmp/cosprobe")
    val q = Array.tabulate(dim)(d => math.cos(d * 0.9).toFloat)

    def time(body: => Unit): Double = {
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }
    def run(label: String, c: org.apache.spark.sql.Column): Unit = {
      val f = () => t.select(sum(c).as("s")).collect()
      f() // warm
      val best = (1 to reps).map(_ => time(f())).min
      println(f"COSPROBE $label%-8s $best%.3f s (${n / best / 1e6}%.2f M cosines/s)")
    }
    val qc = typedLit(q)
    run("native", graft.functions.CosineSimExpr(col("embedding"), qc))
    run("hof", graft.queries.TrainingOps.cosineHof(col("embedding"), qc))
    spark.stop()
  }
}
