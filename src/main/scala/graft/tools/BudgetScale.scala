package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.queries.TrainingOps

/** Volume probe for T38 token-budget selection: the two-phase distributed
  * prefix sum ([[TrainingOps.budgetSelectFromBase]]) vs the naive
  * single-window form (one `PARTITION BY source` running sum — the oracle
  * face) at corpus sizes where the naive shape's weakness is measurable.
  *
  * Why this matters: with S sources the naive window stage runs S tasks
  * no matter how many cores exist — a mixture with 4 sources on 32 cores
  * leaves 28 cores idle while each task sorts-and-scans n/4 rows
  * serially; at 100 TB a whole source must stream through ONE partition,
  * which is not just slow but impossible. The two-phase form exchanges on
  * (source, ratio) — a quality-slice of a source — so its parallelism is
  * min(cores, sources × distinct ratios) and its biggest single-task
  * state is one slice.
  *
  * The probe synthesizes the pre-scored base table `(doc_id, source,
  * ratio, tokens)` directly (deterministic arithmetic — the textual
  * scoring in budgetBase is shared by both formulations and is pinned
  * bit-equal in OpsSpec; here only the selection shapes are under test),
  * caches it, and times each formulation to a 2-value aggregate sink.
  * Per size it ASSERTS result parity via full row checksums (sum of
  * murmur hash over all six columns + kept/cum totals) and, at the
  * smallest rung, an exact two-sided exceptAll.
  *
  * Env: BUDGETSCALE_SIZES (csv, default "250000,1000000,4000000"),
  * BUDGETSCALE_SOURCES (default 4), BUDGETSCALE_CPUS (default 32),
  * BUDGETSCALE_REPS (default 3, min taken, formulations interleaved).
  */
object BudgetScale {

  private def time[T](body: => T): (T, Double) = {
    val t0 = System.nanoTime()
    val r = body
    (r, (System.nanoTime() - t0) / 1e9)
  }

  /** Deterministic pre-scored base: ratio uniform over the 10⁴ 4-dp grid
    * (the parameter bound the group table is sized by), tokens 5..40. */
  def base(spark: SparkSession, n: Long, nSources: Int): DataFrame =
    spark.range(0L, n).select(
      col("id").as("doc_id"),
      concat(lit("src"), pmod(col("id"), lit(nSources.toLong))).as("source"),
      (pmod(col("id") * lit(2654435761L), lit(10001L)).cast("double") / 10000.0)
        .as("ratio"),
      (pmod(col("id") * lit(40503L), lit(36L)) + 5L).as("tokens"))

  private def checksum(df: DataFrame): (Long, Long, Long) = {
    val r = df.agg(
      sum(hash(col("doc_id"), col("source"), col("ratio"), col("tokens"),
        col("cum_tokens"), col("kept")).cast("long")).as("h"),
      sum(col("cum_tokens")).as("ct"),
      sum(when(col("kept"), 1L).otherwise(0L)).as("k")).collect()(0)
    (r.getLong(0), r.getLong(1), r.getLong(2))
  }

  def main(args: Array[String]): Unit = {
    val sizes = sys.env.getOrElse("BUDGETSCALE_SIZES", "250000,1000000,4000000")
      .split(",").map(_.trim.toLong).toSeq
    val nSources = sys.env.getOrElse("BUDGETSCALE_SOURCES", "4").toInt
    val cpus = sys.env.getOrElse("BUDGETSCALE_CPUS", "32").toInt
    val reps = sys.env.getOrElse("BUDGETSCALE_REPS", "3").toInt
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // warm both codepaths so the smallest size isn't charged JVM/codegen
    val warm = base(spark, 20000, nSources).cache(); warm.count()
    checksum(TrainingOps.budgetSelectFromBase(warm, 1000L))
    checksum(TrainingOps.budgetSelectNaiveFromBase(warm, 1000L))
    warm.unpersist()

    val rows = sizes.map { n =>
      val b = base(spark, n, nSources).cache(); b.count()
      // ~half the per-source token mass: E[tokens] = 22.5 per doc
      val budget = 22L * n / (nSources.toLong * 2L)
      var twoCk: (Long, Long, Long) = null
      var nvCk: (Long, Long, Long) = null
      var twoSec = Double.MaxValue
      var nvSec = Double.MaxValue
      // interleave formulations so a steal wave hits both equally
      (1 to reps).foreach { _ =>
        val (c1, s1) = time(checksum(TrainingOps.budgetSelectNaiveFromBase(b, budget)))
        nvCk = c1; nvSec = math.min(nvSec, s1)
        val (c2, s2) = time(checksum(TrainingOps.budgetSelectFromBase(b, budget)))
        twoCk = c2; twoSec = math.min(twoSec, s2)
      }
      require(twoCk == nvCk,
        s"parity broke at n=$n: two-phase $twoCk vs naive $nvCk")
      if (n == sizes.min) {
        val two = TrainingOps.budgetSelectFromBase(b, budget)
        val nv = TrainingOps.budgetSelectNaiveFromBase(b, budget)
        val diff = two.exceptAll(nv).count() + nv.exceptAll(two).count()
        require(diff == 0L, s"exceptAll found $diff differing rows at n=$n")
      }
      b.unpersist()
      println(f"BUDGETSCALE n=$n%-8d sources=$nSources kept=${twoCk._3}%-8d " +
        f"naive=${nvSec}%.2fs two_phase=${twoSec}%.2fs speedup=${nvSec / twoSec}%.2fx " +
        f"checksum_parity=ok")
      (n, nvSec, twoSec)
    }
    val (n0, nv0, tw0) = rows.head
    val (n1, nv1, tw1) = rows.last
    val g = math.log(n1.toDouble / n0)
    println(f"BUDGETSCALE alpha naive=${math.log(nv1 / nv0) / g}%.2f " +
      f"two_phase=${math.log(tw1 / tw0) / g}%.2f (sizes ${n0}->${n1}, 1.0=linear)")
    spark.stop()
  }
}
