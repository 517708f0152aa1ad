package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.queries.TrainingOps

/** Contamination-check + repetition-filter volume probe, the T23/T24
  * counterpart of [[DedupScale]]: wall time and output volume for
  * `contaminationCheck` and `repetitionStats` over the same adversarial
  * duplicate-heavy corpus at increasing sizes.
  *
  * What the corpus stresses (see [[DedupScale.corpus]]): every 20th doc is
  * IDENTICAL mirror boilerplate, so each of its word-8-grams occurs in
  * n/20 train documents — the hot-gram case where a naive eval×train gram
  * join fans out n/20 rows per eval gram. `contaminationCheck` reduces the
  * train side to DISTINCT grams before the join (fan-out exactly 1), so
  * output rows stay = eval docs and wall time grows ~linearly; a quadratic
  * bend here would falsify the fan-out claim. Eval docs (doc_id % 20 == 0)
  * are near-dup cluster members whose siblings sit in train — genuine
  * contamination the check must KEEP reporting while the boilerplate mass
  * is collapsed.
  *
  * Also audits the T30 Bloom pre-filter face per size: aggregate parity
  * with the exact path (must be identical) and the candidate-volume
  * reduction (eval grams admitted to the exact join = true overlaps + fpp
  * false positives — the measured check of both Bloom guarantees).
  *
  * Env: CONTAMSCALE_SIZES (csv, default "5000,20000,50000"),
  * CONTAMSCALE_CPUS (default 32).
  */
object ContamScale {

  private def time[T](body: => T): (T, Double) = {
    val t0 = System.nanoTime()
    val r = body
    (r, (System.nanoTime() - t0) / 1e9)
  }

  def main(args: Array[String]): Unit = {
    val sizes = sys.env.getOrElse("CONTAMSCALE_SIZES", "5000,20000,50000")
      .split(",").map(_.trim.toLong).toSeq
    val cpus = sys.env.getOrElse("CONTAMSCALE_CPUS", "32").toInt
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // warm codepaths so the smallest size isn't charged JVM/codegen startup
    TrainingOps.contaminationCheck(spark, DedupScale.corpus(spark, 2000)).count()
    TrainingOps.repetitionStats(spark, DedupScale.corpus(spark, 2000)).count()

    val rows = sizes.map { n =>
      val docs = DedupScale.corpus(spark, n).cache()
      docs.count()
      val (contam, cSec) = time {
        val r = TrainingOps.contaminationCheck(spark, docs)
          .agg(count(lit(1)).as("eval_docs"),
            sum(col("n_overlap")).as("overlap_sum"),
            sum(when(col("contaminated"), 1L).otherwise(0L)).as("contaminated_docs"))
          .collect()(0)
        (r.getLong(0), r.getLong(1), r.getLong(2))
      }
      val (flagged, rSec) = time(
        TrainingOps.repetitionStats(spark, docs).where(col("flagged")).count())
      // Bloom pre-filter face (T30): same aggregate must come back
      // identical (no false negatives + exact join kills false positives),
      // and the candidate audit quantifies the join-input reduction — the
      // fraction of eval grams the broadcast Bloom admits to the exact
      // join. The timed call and the audit share ONE set of parameters
      // (drift here would make the printed reduction describe a different
      // configuration than the path being timed); the audit's own train
      // build is materialized once and reused for sizing, Bloom, and count
      val (gramN, evalMod, fpp) = (8, 20, 0.01)
      val (bloom, bSec) = time {
        val r = TrainingOps.contaminationCheckBloom(spark, docs, gramN, evalMod, fpp)
          .agg(count(lit(1)).as("eval_docs"),
            sum(col("n_overlap")).as("overlap_sum"),
            sum(when(col("contaminated"), 1L).otherwise(0L)).as("contaminated_docs"))
          .collect()(0)
        (r.getLong(0), r.getLong(1), r.getLong(2))
      }
      val parity = bloom == contam
      val evalG = TrainingOps.gramsOf(spark,
        docs.where(pmod(col("doc_id").cast("long"), lit(evalMod)) === 0),
        gramN, hashed = true).localCheckpoint(true)
      val evalGrams = evalG.count()
      val trainG = TrainingOps.contaminationTrainGrams(spark, docs,
        gramN, evalMod, hashGrams = true).localCheckpoint(true)
      val bf = trainG.stat.bloomFilter("g", math.max(trainG.count(), 1L), fpp)
      val bbf = spark.sparkContext.broadcast(bf)
      val candidates = {
        import spark.implicits._
        evalG.as[(Long, Long)].filter(r => bbf.value.mightContainLong(r._2)).count()
      }
      // per-size hygiene: the audit builds its own Bloom + two checkpoint
      // tables each iteration — release them or block-manager memory grows
      // with every rung of the size ladder
      bbf.destroy()
      evalG.unpersist()
      trainG.unpersist()
      docs.unpersist()
      println(f"CONTAMSCALE n=$n%d eval_docs=${contam._1}%d " +
        f"overlap_sum=${contam._2}%d contaminated=${contam._3}%d contam_sec=$cSec%.1f " +
        f"repetition_flagged=$flagged%d repetition_sec=$rSec%.1f " +
        f"bloom_sec=$bSec%.1f bloom_parity=$parity%b " +
        f"eval_grams=$evalGrams%d bloom_candidates=$candidates%d " +
        f"join_input_kept=${candidates.toDouble / math.max(evalGrams, 1)}%.3f")
      (n, contam._1, cSec, rSec)
    }

    if (rows.size >= 2) {
      val (n0, e0, cs0, rs0) = rows.head
      val (n1, e1, cs1, rs1) = rows.last
      val r = math.log(n1.toDouble / n0)
      def alpha(a: Double, b: Double): String =
        if (a <= 0 || b <= 0 || r == 0) "n/a" else f"${math.log(b / a) / r}%.2f"
      println(s"CONTAMSCALE growth n=$n0->$n1: " +
        s"eval_docs_alpha=${alpha(e0.toDouble, e1.toDouble)} " +
        s"contam_sec_alpha=${alpha(cs0, cs1)} " +
        s"repetition_sec_alpha=${alpha(rs0, rs1)} (1.0 = linear, 2.0 = quadratic)")
    }
    spark.stop()
  }
}
