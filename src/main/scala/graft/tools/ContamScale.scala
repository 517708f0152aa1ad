package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
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

  /** Cumulative shuffle-WRITE bytes across completed stages — the
    * cluster-scale cost a single-box wall clock hides (local tmpfs shuffle
    * is nearly free here; on a real cluster exchanged bytes cross the
    * network). Listener events are async: callers settle briefly after the
    * timed action before reading a delta. */
  private final class ShuffleBytes extends SparkListener {
    val bytes = new java.util.concurrent.atomic.AtomicLong(0L)
    override def onStageCompleted(ev: SparkListenerStageCompleted): Unit =
      bytes.addAndGet(ev.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten)
  }

  private def timeWithShuffle[T](spark: SparkSession)(body: => T): (T, Double, Long) = {
    val l = new ShuffleBytes
    spark.sparkContext.addSparkListener(l)
    try {
      val t0 = System.nanoTime()
      val r = body
      val sec = (System.nanoTime() - t0) / 1e9
      Thread.sleep(800) // let the async listener bus drain stage events
      (r, sec, l.bytes.get())
    } finally spark.sparkContext.removeSparkListener(l)
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

    prodShape(spark)
    spark.stop()
  }

  /** One doc of 40 unique-vocab words; `plantOf` maps a doc index to the
    * planted-text id it copies (negative = unique). Planted texts are a
    * pure function of the plant id, so any two docs given the same plant
    * id share EVERY word 8-gram. */
  private def synthDocs(spark: SparkSession, n: Long, keyPrefix: String)(
      plantOf: Long => Long) = {
    import spark.implicits._
    spark.range(0L, n).map { i =>
      val p = plantOf(i)
      val text =
        if (p >= 0) (0 until 40).map(w => vocabWord(s"plant$p:$w")).mkString(" ")
        else (0 until 40).map(w => vocabWord(s"$keyPrefix$i:$w")).mkString(" ")
      (i, text)
    }.toDF("doc_id", "text")
  }

  private def vocabWord(key: String): String =
    s"w${math.floorMod(scala.util.hashing.MurmurHash3.stringHash(key, 9001), 5000)}"

  /** Production-decontamination measurements for the T30 Bloom face — the
    * two regimes the operator scaladoc claims, with overlap ≪ 1% (every
    * 250th checked doc copies a reference doc; everything else is unique
    * vocab, so join input ≈ true overlap + fpp):
    *
    * A. VERDICT-r6-prescribed shape — eval slice FIXED (~2.5k docs), train
    *    corpus grown. Here both paths pay the same dominant cost (shingle
    *    + distinct over every train gram) and the eval join is tiny, so
    *    the Bloom can only ADD its per-call build pass: bloom ≥ plain is
    *    the EXPECTED result, recorded to pin where the operator does NOT
    *    pay (pick the plain stored-gram path there).
    *
    * B. The decontamination sweep — reference-gram table FIXED (250k
    *    reference docs ⇒ ~8M distinct hashed grams), corpus being checked
    *    grown with evalMod=1 (ALL corpus docs are checked — corpus is the
    *    BIG side). The reference Bloom is built ONCE (the per-snapshot
    *    artifact, its cost and tree-agg exchange reported separately) and
    *    every sweep reuses it. Each rung runs BOTH paths under BOTH join
    *    regimes:
    *      - regime=broadcastable (default threshold): the engine
    *        broadcasts the exact ref-gram side, the corpus never shuffles
    *        in EITHER path — plain wins (the Bloom probe pass is pure
    *        overhead). This pins where NOT to pay for the Bloom.
    *      - regime=oversize (autoBroadcastJoinThreshold=-1 — simulates a
    *        reference-gram table past executor broadcast capacity, the
    *        actual 100 TB posture where benchmark suites × dedup against
    *        them produce multi-e9-gram reference sets): plain must shuffle
    *        EVERY corpus gram into a shuffled join; the Bloom face
    *        broadcasts ~10 MB, drops ~95% of corpus grams map-side, and
    *        only the admitted sliver reaches the exchange. Expect
    *        bloom < plain in both seconds and shuffled bytes, widening
    *        with corpus size.
    *
    * Env: CONTAMSCALE_FIXED_EVAL_SIZES (default "50000,200000,500000"),
    * CONTAMSCALE_SWEEP_SIZES (default "100000,400000"),
    * CONTAMSCALE_REF_DOCS (default 250000), CONTAMSCALE_SKIP_PROD=1 to
    * skip. */
  private def prodShape(spark: SparkSession): Unit = {
    if (sys.env.get("CONTAMSCALE_SKIP_PROD").contains("1")) return
    import spark.implicits._
    val fpp = 0.01

    // --- scenario A: fixed ~2.5k-doc eval slice, train grown
    val aSizes = sys.env.getOrElse("CONTAMSCALE_FIXED_EVAL_SIZES", "50000,200000,500000")
      .split(",").map(_.trim).filter(_.nonEmpty).map(_.toLong).toSeq
    for (n <- aSizes) {
      val evalMod = math.max(2L, n / 2500L).toInt
      // every 250th eval doc copies its train neighbor (doc_id + 1)
      val docs = synthDocs(spark, n, "a") { i =>
        val isEval = i % evalMod == 0
        val k = i / evalMod
        if (isEval && k % 250 == 0) k / 250
        else if (i % evalMod == 1 && k % 250 == 0) k / 250
        else -1L
      }.cache()
      docs.count()
      def agg3(df: org.apache.spark.sql.DataFrame) = {
        val r = df.agg(count(lit(1)), sum(col("n_overlap")),
          sum(when(col("contaminated"), 1L).otherwise(0L))).collect()(0)
        (r.getLong(0), r.getLong(1), r.getLong(2))
      }
      val (plain, pSec) = time(agg3(
        TrainingOps.contaminationCheck(spark, docs, 8, evalMod, hashGrams = true)))
      val (bloom, bSec) = time(agg3(
        TrainingOps.contaminationCheckBloom(spark, docs, 8, evalMod, fpp)))
      docs.unpersist()
      println(f"CONTAMPROD_A train_docs=${n - plain._1}%d eval_docs=${plain._1}%d " +
        f"contaminated=${plain._3}%d plain_sec=$pSec%.1f bloom_sec=$bSec%.1f " +
        f"parity=${plain == bloom}%b")
    }

    // --- scenario B: fixed large reference-gram table, corpus sweep grown
    val bSizes = sys.env.getOrElse("CONTAMSCALE_SWEEP_SIZES", "100000,400000")
      .split(",").map(_.trim).filter(_.nonEmpty).map(_.toLong).toSeq
    if (bSizes.isEmpty) return
    val refDocs = sys.env.getOrElse("CONTAMSCALE_REF_DOCS", "250000").toLong
    val ref = synthDocs(spark, refDocs, "r")(i => if (i % 250 == 0) i / 250 else -1L)
    val refGrams = TrainingOps.gramsOf(spark, ref, 8, hashed = true)
      .select(col("g")).distinct().localCheckpoint(true)
    val refGramCount = refGrams.count()
    // the per-snapshot Bloom artifact: built ONCE, reused by every sweep
    // (its tree-agg exchanges one ~10 MB partial per partition — a
    // cluster-width cost, constant in corpus size)
    val (bloom, buildSec, buildShuf) =
      timeWithShuffle(spark)(TrainingOps.trainGramBloom(refGrams, fpp))
    println(f"CONTAMPROD_BLOOM_BUILD ref_grams=$refGramCount%d fpp=$fpp%.2f " +
      f"bits=${bloom.bitSize()}%d build_sec=$buildSec%.1f " +
      f"build_shuffle_mb=${buildShuf / 1048576}%d")
    for (n <- bSizes) {
      // every 250th corpus doc copies a reference doc (plant ids cycle
      // through the reference's planted texts)
      val nPlants = refDocs / 250
      val corpus = synthDocs(spark, n, "c") { i =>
        if (i % 250 == 0) (i / 250) % nPlants else -1L
      }.cache()
      corpus.count()
      def agg3(df: org.apache.spark.sql.DataFrame) = {
        val r = df.agg(count(lit(1)), sum(col("n_overlap")),
          sum(when(col("contaminated"), 1L).otherwise(0L))).collect()(0)
        (r.getLong(0), r.getLong(1), r.getLong(2))
      }
      for (regime <- Seq("broadcastable", "oversize")) {
        val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        if (regime == "oversize")
          spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try {
          // evalMod=1: EVERY corpus doc is checked (the sweep direction)
          val (plain, pSec, pShuf) = timeWithShuffle(spark)(agg3(
            TrainingOps.contaminationFromTrainGrams(
              spark, corpus, refGrams, 8, evalMod = 1, hashGrams = true)))
          val (bl, bSec, bShuf) = timeWithShuffle(spark)(agg3(
            TrainingOps.contaminationBloomPrebuilt(
              spark, corpus, refGrams, bloom, 8, evalMod = 1)))
          println(f"CONTAMPROD_B regime=$regime%s ref_grams=$refGramCount%d " +
            f"corpus_docs=$n%d contaminated=${plain._3}%d " +
            f"plain_sec=$pSec%.1f bloom_sec=$bSec%.1f " +
            f"plain_shuffle_mb=${pShuf / 1048576}%d " +
            f"bloom_shuffle_mb=${bShuf / 1048576}%d parity=${plain == bl}%b")
        } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      }
      // join-input reduction audit: corpus grams admitted by the Bloom
      val bbf = spark.sparkContext.broadcast(bloom)
      val corpusG = TrainingOps.gramsOf(spark, corpus, 8, hashed = true)
        .localCheckpoint(true)
      val corpusGrams = corpusG.count()
      val admitted = corpusG.as[(Long, Long)]
        .filter(r => bbf.value.mightContainLong(r._2)).count()
      bbf.destroy()
      corpusG.unpersist()
      corpus.unpersist()
      println(f"CONTAMPROD_B_AUDIT corpus_docs=$n%d corpus_grams=$corpusGrams%d " +
        f"admitted=$admitted%d " +
        f"join_input_kept=${admitted.toDouble / math.max(corpusGrams, 1)}%.4f")
    }
    refGrams.unpersist()
  }
}
