package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.queries.TrainingOps

/** Dedup/LSH volume probe: candidate-pair counts + wall time for
  * `minhashPairs` and `ngramJaccardPairs` over a duplicate-heavy corpus at
  * increasing sizes — evidence that the hot-bucket / df caps bound fan-out
  * at volume (sub-quadratic growth in corpus size), not just in the
  * 10k-identical-docs unit test. Backs BASELINE.md's dedup-at-scale table.
  *
  * Corpus mix (deterministic, no RNG): 5% ONE mega-cluster of identical
  * boilerplate (the caps' target — at web scale this is the mirror/
  * boilerplate mass whose pairs belong to exact dedup, not LSH), 25%
  * near-dup clusters of 5 (one word in 40 varies per member — the signal
  * the operators must keep), 70% unique docs. With the cap engaged the
  * mega-cluster is dropped and true-pair volume grows LINEARLY with n
  * (clusters/doc is constant), so measured growth ≈ n^1 proves the caps
  * hold; uncapped, the mega-cluster alone contributes (n/20)²/2 pairs.
  *
  * Env: DEDUPSCALE_SIZES (csv, default "5000,20000,50000"),
  * DEDUPSCALE_CAP (default 200 — must stay < 5% of the smallest size so
  * the mega-cluster is dropped at every probe size),
  * DEDUPSCALE_CPUS (default 32).
  */
object DedupScale {

  private def time[T](body: => T): (T, Double) = {
    val t0 = System.nanoTime()
    val r = body
    (r, (System.nanoTime() - t0) / 1e9)
  }

  // vocab draw MUST be murmur, not FNV-1a: an FNV state difference from a
  // differing prefix propagates near-affinely through a shared suffix, so
  // mod a small vocab two clusters' word sequences come out correlated
  // (observed: identical 30-word tails across clusters) — murmur's
  // avalanche finalization kills the structure
  private def vocabWord(key: String): String =
    s"w${math.floorMod(scala.util.hashing.MurmurHash3.stringHash(key, 9001), 5000)}"

  def corpus(spark: SparkSession, n: Long): DataFrame = {
    import spark.implicits._
    spark.range(0L, n).map { i =>
      val mod = i % 20
      val text =
        if (mod == 19)
          "mirror boilerplate " + (0 until 40).map(w => s"word${w % 7}").mkString(" ")
        else if (mod < 5) {
          val c = i / 20
          (0 until 40).map { w =>
            if (w == 17) s"member$mod" else vocabWord(s"c$c:$w")
          }.mkString(" ")
        } else
          (0 until 40).map(w => vocabWord(s"u$i:$w")).mkString(" ")
      (i, text)
    }.toDF("doc_id", "text")
  }

  def main(args: Array[String]): Unit = {
    val sizes = sys.env.getOrElse("DEDUPSCALE_SIZES", "5000,20000,50000")
      .split(",").map(_.trim.toLong).toSeq
    // default cap 200 < 5%·min(size): the mega-cluster is dropped at EVERY
    // probe size, so the growth curve measures the capped regime throughout
    val cap = sys.env.getOrElse("DEDUPSCALE_CAP", "200").toInt
    val cpus = sys.env.getOrElse("DEDUPSCALE_CPUS", "32").toInt
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // warm codepaths so the smallest size isn't charged JVM/codegen startup
    TrainingOps.minhashPairs(spark, corpus(spark, 2000), minSim = 0.5, maxBucket = cap).count()
    TrainingOps.ngramJaccardPairs(spark, corpus(spark, 2000), minJaccard = 0.5, maxDf = cap).count()

    val rows = sizes.map { n =>
      val docs = corpus(spark, n).cache()
      docs.count()
      val megaBuckets = TrainingOps.minhashDroppedBuckets(spark, docs, maxBucket = cap)
      val (mhPairs, mhSec) = time(
        TrainingOps.minhashPairs(spark, docs, minSim = 0.5, maxBucket = cap).count())
      val (ngPairs, ngSec) = time(
        TrainingOps.ngramJaccardPairs(spark, docs, minJaccard = 0.5, maxDf = cap).count())
      docs.unpersist()
      println(f"DEDUPSCALE n=$n%d cap=$cap dropped_buckets=$megaBuckets " +
        f"minhash_pairs=$mhPairs%d minhash_sec=$mhSec%.1f " +
        f"ngram_pairs=$ngPairs%d ngram_sec=$ngSec%.1f")
      (n, mhPairs, mhSec, ngPairs, ngSec)
    }

    if (rows.size >= 2) {
      val (n0, mh0, ms0, ng0, ns0) = rows.head
      val (n1, mh1, ms1, ng1, ns1) = rows.last
      val r = math.log(n1.toDouble / n0)
      // a zero head count (aggressive cap / high threshold leaves no pairs
      // at the smallest size) has no growth exponent — print n/a, not the
      // NaN/Infinity a log of 0 would produce
      def alpha(a: Double, b: Double): String =
        if (a <= 0 || b <= 0 || r == 0) "n/a" else f"${math.log(b / a) / r}%.2f"
      println(s"DEDUPSCALE growth n=$n0->$n1: " +
        s"minhash_pairs_alpha=${alpha(mh0.toDouble, mh1.toDouble)} " +
        s"minhash_sec_alpha=${alpha(ms0, ms1)} " +
        s"ngram_pairs_alpha=${alpha(ng0.toDouble, ng1.toDouble)} " +
        s"ngram_sec_alpha=${alpha(ns0, ns1)} (1.0 = linear, 2.0 = quadratic)")
    }
    spark.stop()
  }
}
