package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}

import scala.util.hashing.MurmurHash3

import graft.queries.TrainingOps

/** Embedding-family volume probe — the [[DedupScale]] companion for the
  * round-4 hyperplane-bucket cap (`embedCosinePairsLsh`) and the IVF index
  * (`annIvfTopK` / `ivfCellHistogram`): candidate-pair counts, wall time,
  * cap engagement, and cell balance over a duplicate-heavy adversarial
  * corpus at increasing sizes. Evidence that the caps bound LSH fan-out at
  * volume and that the nProbe/nCells cost model (probe cost ∝
  * corpus·nProbe/nCells) rests on measured occupancy, not just the balance
  * unit test. Backs BASELINE.md's embedding-at-scale table.
  *
  * Corpus mix (deterministic, no RNG — murmur-seeded components, the
  * avalanche lesson from DedupScale's FNV gotcha): 5% ONE mega-cluster of
  * IDENTICAL vectors (byte-identical media / mirrored pages — the cap's
  * target: one bucket of m identical vectors emits m²/2 candidates), 25%
  * near-dup clusters of 5 (one dimension nudged per member — cosine ≥ 0.99,
  * the signal the operator must keep), 70% unique quasi-random vectors
  * (pairwise cosine ≈ 0 — below any minSim). With the cap engaged the
  * mega-cluster is dropped and true-pair volume grows LINEARLY in n.
  *
  * Env: EMBEDSCALE_SIZES (csv, default "5000,20000,50000"),
  * EMBEDSCALE_CAP (default 200 — < 5% of the smallest size, so the
  * mega-bucket is dropped at every probe size), EMBEDSCALE_PLANES
  * (default 12 → 4096 buckets: the cap only isolates mega-clusters when
  * the MEAN bucket stays well under it, so the bucket count must scale
  * with the corpus — at 8 planes and 50k vectors the mean bucket is ~195
  * ≈ the cap and ordinary buckets start dropping; measured: 87 buckets
  * dropped, pair growth bent to α=0.67. That is the production tuning
  * rule this probe documents: nPlanes ≳ log2(n/cap) + margin),
  * EMBEDSCALE_CPUS (32).
  */
object EmbedScale {

  private def time[T](body: => T): (T, Double) = {
    val t0 = System.nanoTime()
    val r = body
    (r, (System.nanoTime() - t0) / 1e9)
  }

  private def comp(key: String): Float =
    (MurmurHash3.stringHash(key, 40503).toDouble / Int.MaxValue).toFloat

  /** Deterministic adversarial embedding corpus (vec_id, embedding). */
  def corpus(spark: SparkSession, n: Long, dims: Int = 64): DataFrame = {
    import spark.implicits._
    spark.range(0L, n).map { i =>
      val mod = i % 20
      val v =
        if (mod == 19) Array.tabulate(dims)(d => comp(s"mega:$d"))
        else if (mod < 5) {
          val c = i / 20
          val base = Array.tabulate(dims)(d => comp(s"c$c:$d"))
          // one nudged dimension per member: cosine(base, member) ≥ 0.99
          base(mod.toInt % dims) = base(mod.toInt % dims) + 0.05f
          base
        } else Array.tabulate(dims)(d => comp(s"u$i:$d"))
      (i, v)
    }.toDF("vec_id", "embedding")
  }

  def main(args: Array[String]): Unit = {
    val sizes = sys.env.getOrElse("EMBEDSCALE_SIZES", "5000,20000,50000")
      .split(",").map(_.trim.toLong).toSeq
    val cap = sys.env.getOrElse("EMBEDSCALE_CAP", "200").toInt
    val planes = sys.env.getOrElse("EMBEDSCALE_PLANES", "12").toInt
    val cpus = sys.env.getOrElse("EMBEDSCALE_CPUS", "32").toInt
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // warm codepaths so the smallest size isn't charged JVM/codegen startup
    TrainingOps.embedCosinePairsLsh(spark, corpus(spark, 2000),
      nPlanes = planes, maxBucket = cap).count()
    TrainingOps.annIvfTopK(spark, corpus(spark, 2000)).count()

    val rows = sizes.map { n =>
      val emb = corpus(spark, n).cache()
      emb.count()
      // exact cap-engagement audit: hyperplane buckets over the cap
      val droppedBuckets = TrainingOps.hotGroupDropCount(
        TrainingOps.hyperplaneBuckets(spark, emb, planes), Seq("bucket"), cap)
      val (lshPairs, lshSec) = time(
        TrainingOps.embedCosinePairsLsh(spark, emb, minSim = 0.95,
          nPlanes = planes, maxBucket = cap).count())
      val (ivfRows, ivfSec) = time(TrainingOps.annIvfTopK(spark, emb).count())
      emb.unpersist()
      println(f"EMBEDSCALE n=$n%d cap=$cap dropped_buckets=$droppedBuckets " +
        f"lsh_pairs=$lshPairs%d lsh_sec=$lshSec%.1f ivf_rows=$ivfRows%d ivf_sec=$ivfSec%.1f")
      (n, lshPairs, lshSec, ivfSec)
    }

    if (rows.size >= 2) {
      val (n0, p0, ls0, is0) = rows.head
      val (n1, p1, ls1, is1) = rows.last
      val r = math.log(n1.toDouble / n0)
      def alpha(a: Double, b: Double): String =
        if (a <= 0 || b <= 0 || r == 0) "n/a" else f"${math.log(b / a) / r}%.2f"
      println(s"EMBEDSCALE growth n=$n0->$n1: " +
        s"lsh_pairs_alpha=${alpha(p0.toDouble, p1.toDouble)} " +
        s"lsh_sec_alpha=${alpha(ls0, ls1)} " +
        s"ivf_sec_alpha=${alpha(is0, is1)} (1.0 = linear, 2.0 = quadratic)")
    }

    // SemDeDup (T37) volume: pairwise cosine only WITHIN a Lloyd cell.
    // nCells follows the √n rule (assignment costs n·nCells·d, the
    // within-cell triangles cost n²/nCells — balanced at nCells ≈ √n, so
    // total work grows n^1.5 instead of n²); the cap = 3× mean occupancy
    // isolates the 5% mega-cluster's cell (n/20 members ≥ 3.9× the cap at
    // every size) without touching ordinary cells. Every clusters-of-5
    // member pair sits at cosine ≥ 0.99, so expected true pairs = 10·n/20
    // = n/2 and sem_recall reads the within-cell recall of the planted
    // near-dups directly.
    val semRows = sizes.map { n =>
      val emb = corpus(spark, n).cache()
      emb.count()
      val k = math.ceil(math.sqrt(n.toDouble)).toInt
      val semCap = 3 * (n / k).toInt
      val droppedCells = TrainingOps.hotGroupDropCount(
        TrainingOps.semanticCells(spark, emb, nCells = k), Seq("cell"), semCap)
      val (pairs, sec) = time(TrainingOps.semanticDupPairs(spark, emb,
        nCells = k, minSim = 0.95, maxCell = semCap).count())
      emb.unpersist()
      println(f"SEMDEDUP n=$n%d nCells=$k cap=$semCap dropped_cells=$droppedCells " +
        f"pairs=$pairs%d expected_true=${n / 2}%d recall=${pairs.toDouble / (n / 2)}%.3f " +
        f"sec=$sec%.1f")
      (n, pairs, sec)
    }
    if (semRows.size >= 2) {
      val (n0, p0, s0) = semRows.head
      val (n1, p1, s1) = semRows.last
      val r = math.log(n1.toDouble / n0)
      def alpha(a: Double, b: Double): String =
        if (a <= 0 || b <= 0 || r == 0) "n/a" else f"${math.log(b / a) / r}%.2f"
      println(s"SEMDEDUP growth n=$n0->$n1: " +
        s"pairs_alpha=${alpha(p0.toDouble, p1.toDouble)} " +
        s"sec_alpha=${alpha(s0, s1)} (pairs 1.0 = linear; sec model = 1.5 at nCells=√n)")
    }

    // IVF cell-occupancy at the largest size: the balance evidence behind
    // the nProbe/nCells cost model (probe scans corpus·nProbe/nCells only
    // if cells are roughly even)
    val big = corpus(spark, sizes.last).cache()
    big.count()
    val hist = TrainingOps.ivfCellHistogram(spark, big, nCells = 16).collect()
      .map(r => (r.getInt(0), r.getLong(1)))
    big.unpersist()
    val counts = hist.map(_._2)
    val mean = counts.sum.toDouble / counts.length
    println("EMBEDSCALE ivf_histogram " +
      hist.map { case (c, k) => s"$c:$k" }.mkString(" "))
    println(f"EMBEDSCALE ivf_balance cells=${counts.length} mean=$mean%.0f " +
      f"max=${counts.max} max_over_mean=${counts.max / mean}%.2f")

    // operating-point curves at the largest size: recall@5 vs the index
    // knobs, against the exact cosineTopK ground truth — the knee a
    // production caller reads to trade scanned volume for recall (the
    // OpsSpec gates pin single points; this records the curve). Queries
    // are vec_id < 8: a mix of near-dup cluster members (the LSH regime)
    // and unique isotropic vectors (the IVF regime).
    big.cache(); big.count()
    def sets(df: DataFrame): Map[Long, Set[Long]] =
      df.select("query_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1)))
        .groupBy(_._1).map { case (q, a) => q -> a.map(_._2).toSet }
    val exact = sets(TrainingOps.cosineTopK(spark, big))
    def recall(approx: Map[Long, Set[Long]]): Double = {
      val per = exact.toSeq.map { case (q, e) =>
        approx.getOrElse(q, Set.empty[Long]).intersect(e).size.toDouble / e.size }
      per.sum / per.size
    }
    for (nProbe <- 1 to 8) {
      val r = recall(sets(TrainingOps.annIvfTopK(spark, big, nCells = 16, nProbe = nProbe)))
      println(f"EMBEDCURVE ivf n=${sizes.last}%d nCells=16 nProbe=$nProbe%d " +
        f"recall_at_5=$r%.3f scan_frac=${nProbe / 16.0}%.3f")
    }
    for (np <- Seq(8, 12, 16); ph <- 0 to 2) {
      val r = recall(sets(TrainingOps.annLshTopK(spark, big, nPlanes = np,
        probeHamming = ph)))
      println(f"EMBEDCURVE lsh n=${sizes.last}%d nPlanes=$np%d probeHamming=$ph%d " +
        f"recall_at_5=$r%.3f")
    }
    big.unpersist()
    spark.stop()
  }
}
