package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.queries.TrainingOps

/** Connected-components volume probe: rounds + wall time for
  * `TrainingOps.connectedComponents` on two adversarial graph families at
  * increasing sizes — evidence for the O(log n) round bound and for linear
  * work per round, not just the unit-test graphs. Backs BASELINE.md's
  * cluster-resolution table.
  *
  * Families (deterministic, no RNG):
  *  - CHAIN: one path 0-1-2-…-(n-1) — the diameter-maximal worst case.
  *    Plain min-propagation needs n rounds; hooked-min + pointer jump
  *    roughly doubles the labelled distance per round, so rounds ≈ log₂ n.
  *    Exact invariant: every node lands in component 0.
  *  - CLUSTERS: n/5 disjoint 5-cliques — the realistic near-dup shape
  *    (LSH components are band-cliques). Rounds stay O(1); exact
  *    invariant: n/5 components, each labelled by its minimum member.
  *
  * Env: CCSCALE_SIZES (csv, default "10000,100000"),
  * CCSCALE_CPUS (default 32).
  */
object CCScale {

  private def time[T](body: => T): (T, Double) = {
    val t0 = System.nanoTime()
    val r = body
    (r, (System.nanoTime() - t0) / 1e9)
  }

  def chain(spark: SparkSession, n: Long): DataFrame = {
    import spark.implicits._
    spark.range(0L, n - 1).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
  }

  def cliques(spark: SparkSession, n: Long): DataFrame = {
    import spark.implicits._
    // 10 edges per 5-clique {5c, …, 5c+4}
    spark.range(0L, n / 5).flatMap { c =>
      val base = c * 5
      for (i <- 0 until 5; j <- (i + 1) until 5)
        yield (base + i, base + j)
    }.toDF("doc_a", "doc_b")
  }

  def main(args: Array[String]): Unit = {
    val sizes = sys.env.getOrElse("CCSCALE_SIZES", "10000,100000")
      .split(",").map(_.trim.toLong).toSeq
    val cpus = sys.env.getOrElse("CCSCALE_CPUS", "32").toInt
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // warm codepaths so the smallest size isn't charged JVM/codegen startup
    TrainingOps.connectedComponents(spark, chain(spark, 500)).count()

    val rows = sizes.map { n =>
      val ((chainLbl, chainRounds), chainSec) =
        time(TrainingOps.connectedComponentsIter(spark, chain(spark, n)))
      val chainBad = chainLbl.where(col("comp") =!= 0L).count()
      chainLbl.unpersist()

      val ((clLbl, clRounds), clSec) =
        time(TrainingOps.connectedComponentsIter(spark, cliques(spark, n)))
      val nComps = clLbl.select(col("comp")).distinct().count()
      val clBad = clLbl.where(col("comp") =!= (col("node") - pmod(col("node"), lit(5L)))).count()
      clLbl.unpersist()

      println(f"CCSCALE n=$n%d chain_rounds=$chainRounds chain_sec=$chainSec%.1f " +
        f"chain_mislabeled=$chainBad cliques_rounds=$clRounds cliques_sec=$clSec%.1f " +
        f"cliques_components=$nComps (expect ${n / 5}) cliques_mislabeled=$clBad " +
        f"log2n=${(math.log(n.toDouble) / math.log(2))}%.1f")
      (n, chainRounds, chainSec, clRounds, clSec)
    }

    if (rows.size >= 2) {
      val (n0, _, cs0, _, ls0) = rows.head
      val (n1, _, cs1, _, ls1) = rows.last
      val r = math.log(n1.toDouble / n0)
      def alpha(a: Double, b: Double): String =
        if (a <= 0 || b <= 0 || r == 0) "n/a" else f"${math.log(b / a) / r}%.2f"
      println(s"CCSCALE growth n=$n0->$n1: chain_sec_alpha=${alpha(cs0, cs1)} " +
        s"cliques_sec_alpha=${alpha(ls0, ls1)} (1.0 = linear; chain carries " +
        "a log-factor from rounds, cliques should be ~flat-to-linear)")
    }
    spark.stop()
  }
}
