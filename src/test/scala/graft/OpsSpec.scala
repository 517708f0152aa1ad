package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.kernel.Chunker
import graft.multimodal.MediaOps
import graft.queries.{EntityLink, TrainingOps}

/** Unit + small-cluster tests for the training-data / multimodal / linking
  * operators (the non-extraction half of the surface). */
class OpsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    // per-run warehouse: the store-read tests materialize the marker-gated
    // extraction/shingle stores, and a shared cwd warehouse would persist
    // them across test runs (stale-store confusion after a kernel change —
    // round-5 ADVICE; the fingerprinted srcTags also guard this, but test
    // isolation should not depend on it)
    .config("spark.sql.warehouse.dir",
      java.nio.file.Files.createTempDirectory("graft-opsspec-wh").toString)
    .getOrCreate()

  override def beforeAll(): Unit = spark.sparkContext.setLogLevel("ERROR")
  override def afterAll(): Unit = spark.stop()

  private def docsDf = {
    import spark.implicits._
    Seq(
      (0L, "the quick brown fox jumps over the lazy dog", "en", "src0"),
      (1L, "the quick brown fox jumps over the lazy cat", "en", "src1"),
      (2L, "el gato y el perro de la casa que ladra", "es", "src0"),
      (3L, "completely unrelated words here banana xylophone", "en", "src2"),
      (4L, "the quick brown fox jumps over the lazy dog", "en", "src3") // exact dup of 0
    ).toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")).cast("long"))
  }

  // ------------------------------------------------------------- chunker
  test("chunker: reference semantics (extract.py:215-237)") {
    assert(Chunker.chunk(null) == Vector.empty)
    // short-circuit: text within the cap is ONE chunk, verbatim (py:217-218)
    assert(Chunker.chunk("") == Vector(""))
    assert(Chunker.chunk("abc") == Vector("abc"))
    assert(Chunker.chunk("aaa\n\nbbb", 8) == Vector("aaa\n\nbbb"))
    // greedy pack with +2 accounting on EVERY paragraph incl. the first:
    // paras aa/bb/cc cost 4 each; aa(4)+bb(4)=8 not >8, +cc would be 12 >8
    assert(Chunker.chunk("aa\n\nbb\n\ncc", 8) == Vector("aa\n\nbb", "cc"))
    // first-paragraph accounting: len 3 and 4 paras with max=9 SPLIT in the
    // reference (5+6 > 9), they do not pack (the round-1 normalized packer
    // merged them — ADVICE.md low #1)
    assert(Chunker.chunk("aaa\n\nbbbb\n\nx", 9) == Vector("aaa", "bbbb\n\nx"))
    // oversize single paragraph becomes its own chunk, never split
    assert(Chunker.chunk("x" * 50, 10) == Vector("x" * 50))
    // empty/whitespace paragraphs are kept, untrimmed (py keeps them)
    assert(Chunker.chunk("aa\n\n   \n\nbb\n\n" + "y" * 12, 12) ==
      Vector("aa\n\n   ", "bb", "y" * 12))
  }

  // ------------------------------------------------------------ dedup ops
  test("exact dedup finds the duplicate") {
    val row = TrainingOps.dedupExactSummary(docsDf).collect().head
    assert(row.getLong(0) == 5 && row.getLong(1) == 4)
    val surv = TrainingOps.dedupExactSurvivors(docsDf).collect()
    assert(surv.length == 4)
    assert(surv.find(_.getLong(1) == 2L).map(_.getLong(0)).contains(0L)) // min doc_id kept
  }

  test("minhash LSH: exact dup has est_jaccard 1.0; near-dup found; unrelated absent") {
    val pairs = TrainingOps.minhashPairs(spark, docsDf, minSim = 0.05)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    val exact = pairs.find(p => p._1 == 0L && p._2 == 4L)
    assert(exact.exists(_._3 == 1.0), s"exact dup pair missing or <1.0: $pairs")
    assert(pairs.exists(p => p._1 == 0L && p._2 == 1L), "near-dup 0-1 not found")
    assert(!pairs.exists(p => p._2 == 3L || p._1 == 3L), "unrelated doc paired")
  }

  test("incremental near-dup: cross-set pairs only; admit = unmatched batch; == self-join restricted") {
    import spark.implicits._
    // docsDf: 0 == 4 exact dup, 0 ~ 1 near-dup, 3 unrelated. Batch = {0, 3},
    // store = {1, 2, 4}: 0 must match store docs 4 (sig-identical) and 1.
    val newIds = Set(0L, 3L)
    val batch = docsDf.where(col("doc_id").isin(newIds.toSeq: _*))
    val store = docsDf.where(!col("doc_id").isin(newIds.toSeq: _*))
    val storeSigs = TrainingOps.minhashSignatures(spark, store)
    val pairs = TrainingOps.minhashPairsAgainstStore(spark,
        TrainingOps.minhashSignatures(spark, batch), storeSigs, minSim = 0.05)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(pairs.forall(p => newIds.contains(p._1) && !newIds.contains(p._2)),
      s"orientation broke: $pairs")
    assert(pairs.exists(p => p._1 == 0L && p._2 == 4L && p._3 == 1.0))
    assert(pairs.exists(p => p._1 == 0L && p._2 == 1L))
    assert(!pairs.exists(_._1 == 3L), "unrelated batch doc matched the store")
    // cross-set slice of the full self-join == the incremental face
    val self = TrainingOps.minhashPairs(spark, docsDf, minSim = 0.05).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .filter(p => newIds.contains(p._1) != newIds.contains(p._2))
      .map(p => if (newIds.contains(p._1)) p else (p._2, p._1, p._3)).toSet
    assert(pairs.toSet == self)
    val adm = TrainingOps.incrementalAdmit(spark, batch, storeSigs, minSim = 0.05)
      .collect().map(_.getLong(0)).toSet
    assert(adm == Set(3L))
  }

  test("simhash: identical texts at hamming 0") {
    val pairs = TrainingOps.simhashPairs(spark, docsDf, maxHamming = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getAs[Number](2).intValue)).toSeq
    assert(pairs.contains((0L, 4L, 0)))
  }

  test("ngram jaccard: dup=1.0, near-dup high, unrelated excluded") {
    val pairs = TrainingOps.ngramJaccardPairs(spark, docsDf, minJaccard = 0.05)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(pairs.exists(p => p._1 == 0L && p._2 == 4L && p._3 == 1.0))
    val nd = pairs.find(p => p._1 == 0L && p._2 == 1L)
    assert(nd.exists(p => p._3 > 0.5 && p._3 < 1.0), s"near-dup: $nd")
  }

  test("minhash/simhash hot-bucket cap: default is a no-op; mega-cluster of 10k identical docs stays bounded") {
    import spark.implicits._
    // default cap (10000) can never trigger below 10k docs ⇒ identical output
    val mhCap = TrainingOps.minhashPairs(spark, docsDf, minSim = 0.05)
      .orderBy("doc_a", "doc_b").collect().map(_.toSeq).toSeq
    val mhOff = TrainingOps.minhashPairs(spark, docsDf, minSim = 0.05, maxBucket = 0)
      .orderBy("doc_a", "doc_b").collect().map(_.toSeq).toSeq
    assert(mhCap == mhOff && mhCap.nonEmpty)
    val shCap = TrainingOps.simhashPairs(spark, docsDf, maxHamming = 8)
      .orderBy("doc_a", "doc_b").collect().map(_.toSeq).toSeq
    val shOff = TrainingOps.simhashPairs(spark, docsDf, maxHamming = 8, maxBucket = 0)
      .orderBy("doc_a", "doc_b").collect().map(_.toSeq).toSeq
    assert(shCap == shOff && shCap.nonEmpty)

    // adversarial web-scale shape: 10k IDENTICAL docs → every band/chunk is
    // one bucket of 10k → uncapped would enumerate 16·10k²/2 (resp. 4·10k²/2)
    // candidates; the cap drops the hot buckets so the job completes with
    // zero pairs (identical docs are exact-dedup's job, not LSH's)
    val mega = spark.range(0, 10000)
      .select(col("id").as("doc_id"),
        lit("the same boilerplate mirror page body text").as("text"))
    assert(TrainingOps.minhashPairs(spark, mega, minSim = 0.05, maxBucket = 100).count() == 0)
    assert(TrainingOps.simhashPairs(spark, mega, maxHamming = 8, maxBucket = 100).count() == 0)

    // mixed corpus: the hot cluster is dropped, unrelated near-dup survives
    val mixed = docsDf.select(col("doc_id"), col("text"))
      .union(spark.range(100, 150).select(col("id").as("doc_id"),
        lit("an unrelated boilerplate footer repeated verbatim").as("text")))
    val pairs = TrainingOps.minhashPairs(spark, mixed, minSim = 0.05, maxBucket = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(pairs.contains((0L, 4L)), s"non-hot exact dup must survive the cap: $pairs")
    assert(!pairs.exists(p => p._1 >= 100 || p._2 >= 100),
      s"hot cluster must be dropped: $pairs")
  }

  test("stratified sampling: deterministic, dup-consistent across strata, boundary weights exact") {
    // weight 1.0 keeps every row of the stratum; 0.0 drops all; decisions
    // reproduce across calls (content-hashed, no RNG)
    val keepAll = TrainingOps.stratifiedSample(spark, docsDf,
      Map("src0" -> 1.0), defaultWeight = 0.0)
    assert(keepAll.collect().map(_.getAs[String]("source")).forall(_ == "src0"))
    assert(keepAll.count() == docsDf.where(col("source") === "src0").count())

    val a = TrainingOps.stratifiedSample(spark, docsDf,
      Map("src0" -> 0.5, "src1" -> 0.5), defaultWeight = 0.5)
      .collect().map(_.getAs[Long]("doc_id")).toSet
    val b = TrainingOps.stratifiedSample(spark, docsDf,
      Map("src0" -> 0.5, "src1" -> 0.5), defaultWeight = 0.5)
      .collect().map(_.getAs[Long]("doc_id")).toSet
    assert(a == b)
    // docs 0 and 4 share identical text but different sources: at equal
    // weights their keep decision MUST agree (dup-consistency — a dup can
    // never leak into a sample its twin was dropped from at the same weight)
    assert(a.contains(0L) == a.contains(4L))

    intercept[IllegalArgumentException] {
      TrainingOps.stratifiedSample(spark, docsDf, Map("src0" -> 1.5))
    }

    // contentCol needing quoting (dot would otherwise parse as a struct
    // field access) resolves as a plain column and matches the default
    val renamed = docsDf.withColumnRenamed("text", "doc.body")
    val viaQuoted = TrainingOps.stratifiedSample(spark, renamed,
        Map("src0" -> 0.5, "src1" -> 0.5), defaultWeight = 0.5, contentCol = "doc.body")
      .collect().map(_.getAs[Long]("doc_id")).toSet
    assert(viaQuoted == a)
  }

  test("materialized signature tables: pairs over a written-and-read-back table are identical") {
    // the 100 TB path: compute signatures ONCE (TableIO.write), run pair
    // generation over the stored table — no per-join-side recompute of the
    // narrow signature stage. Must be output-identical to the lazy
    // composition the single-query entries use.
    val tmp = java.nio.file.Files.createTempDirectory("graftsigmat").toString
    graft.core.TableIO.write(TrainingOps.minhashSignatures(spark, docsDf), s"$tmp/mh_sigs")
    val mStored = TrainingOps.minhashPairsFromSignatures(spark,
        graft.core.TableIO.read(spark, s"$tmp/mh_sigs"), minSim = 0.05)
      .orderBy("doc_a", "doc_b").collect().map(_.toSeq).toSeq
    val mLazy = TrainingOps.minhashPairs(spark, docsDf, minSim = 0.05)
      .orderBy("doc_a", "doc_b").collect().map(_.toSeq).toSeq
    assert(mStored == mLazy && mStored.nonEmpty)

    graft.core.TableIO.write(TrainingOps.simhashFingerprints(spark, docsDf), s"$tmp/sh_fps")
    val sStored = TrainingOps.simhashPairsFromFingerprints(spark,
        graft.core.TableIO.read(spark, s"$tmp/sh_fps"), maxHamming = 8)
      .orderBy("doc_a", "doc_b").collect().map(_.toSeq).toSeq
    val sLazy = TrainingOps.simhashPairs(spark, docsDf, maxHamming = 8)
      .orderBy("doc_a", "doc_b").collect().map(_.toSeq).toSeq
    assert(sStored == sLazy && sStored.nonEmpty)

    graft.core.TableIO.write(TrainingOps.ngramShingles(spark, docsDf), s"$tmp/ng_sh")
    val nStored = TrainingOps.ngramJaccardFromShingles(spark,
        graft.core.TableIO.read(spark, s"$tmp/ng_sh"), minJaccard = 0.02)
      .orderBy("doc_a", "doc_b").collect().map(_.toSeq).toSeq
    val nLazy = TrainingOps.ngramJaccardPairs(spark, docsDf, minJaccard = 0.02)
      .orderBy("doc_a", "doc_b").collect().map(_.toSeq).toSeq
    assert(nStored == nLazy && nStored.nonEmpty)
  }

  test("k-mismatched signature table fails fast instead of producing garbage candidates") {
    val sigs128 = TrainingOps.minhashSignatures(spark, docsDf, k = 128)
    val e = intercept[org.apache.spark.SparkException] {
      TrainingOps.minhashPairsFromSignatures(spark, sigs128, k = 64).collect()
    }
    assert(e.getMessage.contains("IllegalArgumentException") ||
      String.valueOf(e.getCause).contains("signature length") ||
      e.getMessage.contains("signature length"))
  }

  test("hotGroupDropCount: exact retry-safe audit — 0 at default cap, counts hot buckets when capped") {
    import spark.implicits._
    assert(TrainingOps.minhashDroppedBuckets(spark, docsDf) == 0L,
      "default cap must be a provable no-op on the test corpus")
    // 1000 identical docs: each of the 16 bands collapses to ONE bucket of
    // 1000 members — exactly 16 groups exceed cap=100
    val mega = spark.range(0, 1000)
      .select(col("id").as("doc_id"),
        lit("the same boilerplate mirror page body text").as("text"))
    assert(TrainingOps.minhashDroppedBuckets(spark, mega, maxBucket = 100) == 16L)
  }

  test("ngram jaccard df-cap: default is a no-op; low cap defuses a boilerplate shingle") {
    import spark.implicits._
    // default cap (10000) can never trigger below 10k docs ⇒ identical output
    val capped = TrainingOps.ngramJaccardPairs(spark, docsDf, minJaccard = 0.05)
      .orderBy("doc_a", "doc_b").collect().map(_.toSeq).toSeq
    val uncapped = TrainingOps.ngramJaccardPairs(spark, docsDf, minJaccard = 0.05, maxDf = 0)
      .orderBy("doc_a", "doc_b").collect().map(_.toSeq).toSeq
    assert(capped == uncapped)
    // adversarial: 40 otherwise-unique docs sharing one boilerplate trigram
    // → uncapped forms the full 40·39/2 quadratic bucket; df-cap kills it
    val boiler = (0 until 40).map(i =>
      (i.toLong, s"unique$i token$i word$i this footer repeats", "en", "src0"))
      .toDF("doc_id", "text", "lang", "source")
    val hot = TrainingOps.ngramJaccardPairs(spark, boiler, minJaccard = 0.0, maxDf = 0)
    assert(hot.count() == 40L * 39 / 2, "uncapped boilerplate goes quadratic")
    val cold = TrainingOps.ngramJaccardPairs(spark, boiler, minJaccard = 0.0, maxDf = 10)
    assert(cold.count() == 0, "df-capped index drops the hot shingle before the self-join")
  }

  test("connected components: chain, triangle, disjoint pair, reversed edge — min labels exact") {
    import spark.implicits._
    // chain 1-2-3-4-5 (diameter 4 — exercises multi-round convergence),
    // triangle {10,11,12}, pair {20,21}, and a reversed edge 31→30 (the
    // undirected expansion must label 31 with 30, not itself)
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L),
      (10L, 11L), (11L, 12L), (10L, 12L), (20L, 21L), (31L, 30L))
      .toDF("doc_a", "doc_b")
    val got = TrainingOps.connectedComponents(spark, edges)
      .orderBy("node").as[(Long, Long)].collect().toSeq
    assert(got == Seq(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L, 20L -> 20L, 21L -> 20L,
      30L -> 30L, 31L -> 30L))
    // empty graph: converges immediately to empty labels, no error
    assert(TrainingOps.connectedComponents(spark,
      Seq.empty[(Long, Long)].toDF("doc_a", "doc_b")).count() == 0)
  }

  test("connected components: reliable-checkpoint mode is row-identical to localCheckpoint") {
    import spark.implicits._
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L),
      (10L, 11L), (11L, 12L), (10L, 12L), (20L, 21L), (31L, 30L))
      .toDF("doc_a", "doc_b")
    // reliable mode without a checkpoint dir must fail loudly, not NPE
    // mid-iteration
    val err = intercept[IllegalArgumentException](
      TrainingOps.connectedComponents(spark, edges, reliableCheckpoint = true))
    assert(err.getMessage.contains("setCheckpointDir"))
    val ckptDir = java.nio.file.Files.createTempDirectory("graft-ccckpt").toString
    spark.sparkContext.setCheckpointDir(ckptDir)
    val reliable = TrainingOps.connectedComponents(spark, edges, reliableCheckpoint = true)
      .orderBy("node").as[(Long, Long)].collect().toSeq
    val local = TrainingOps.connectedComponents(spark, edges)
      .orderBy("node").as[(Long, Long)].collect().toSeq
    assert(reliable == local && reliable.nonEmpty)
    // per-round hygiene: unpersist() leaves checkpoint FILES behind, so the
    // loop must delete each superseded round's rdd-* dir — after the run
    // only the final label table's checkpoint may remain on disk
    val rddDirs = java.nio.file.Files.walk(java.nio.file.Paths.get(ckptDir))
      .filter(p => p.getFileName.toString.startsWith("rdd-"))
      .toArray.toSeq
    assert(rddDirs.size == 1,
      s"stale per-round checkpoints not reclaimed: ${rddDirs.mkString(", ")}")
  }

  test("connected components match driver-side union-find on pseudo-random graphs") {
    import spark.implicits._
    // deterministic generator (fixed seeds) — includes sparse (forest-like,
    // long chains) and denser regimes
    for ((seed, nNodes, nEdges) <- Seq((1, 60, 40), (2, 60, 90), (3, 200, 150))) {
      val rnd = new scala.util.Random(seed)
      val edges = Seq.fill(nEdges)((rnd.nextInt(nNodes).toLong, rnd.nextInt(nNodes).toLong))
        .filter { case (a, b) => a != b }
      // driver-side union-find ground truth (path-halving + min-root)
      val parent = Array.tabulate(nNodes)(identity)
      def find(x: Int): Int = {
        var r = x
        while (parent(r) != r) { parent(r) = parent(parent(r)); r = parent(r) }
        r
      }
      for ((a, b) <- edges) {
        val (ra, rb) = (find(a.toInt), find(b.toInt))
        if (ra != rb) { val (lo, hi) = (math.min(ra, rb), math.max(ra, rb)); parent(hi) = lo }
      }
      val touched = edges.flatMap { case (a, b) => Seq(a.toInt, b.toInt) }.distinct
      val expect = touched.map(n => n.toLong -> find(n).toLong).sortBy(_._1)
      val got = TrainingOps.connectedComponents(spark, edges.toDF("doc_a", "doc_b"))
        .orderBy("node").as[(Long, Long)].collect().toSeq
      assert(got == expect, s"seed=$seed")
    }
  }

  test("near-dup components: transitive cluster labeled by min doc id, singletons absent") {
    import spark.implicits._
    // docs 0/4 exact dups (jaccard 1.0), 1 near-dup of both (6/8 shingles
    // shared = 0.75 ≥ 0.5) ⇒ one component {0,1,4} labeled 0; docs 2/3
    // have no pair at 0.5 ⇒ absent (singletons are their own survivor)
    val got = TrainingOps.nearDupComponents(spark, docsDf)
      .orderBy("doc_id").as[(Long, Long)].collect().toSeq
    assert(got == Seq(0L -> 0L, 1L -> 0L, 4L -> 0L))
    // CC is pair-family agnostic: the minhash pair graph resolves to the
    // same cluster on this corpus (signature-estimated jaccard finds the
    // same {0,1,4} neighborhood at its own threshold)
    val viaMinhash = TrainingOps.connectedComponents(spark,
        TrainingOps.minhashPairs(spark, docsDf, minSim = 0.5).select("doc_a", "doc_b"))
      .orderBy("node").as[(Long, Long)].collect().toSeq
    assert(viaMinhash == Seq(0L -> 0L, 1L -> 0L, 4L -> 0L))
  }

  test("deterministic split: content-hashed, dup-leakage-safe, reproducible") {
    val a = TrainingOps.splitAssign(spark, docsDf).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val b = TrainingOps.splitAssign(spark, docsDf).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(a == b && a.size == 5)
    assert(a.values.forall(Set("train", "val", "test")))
    // exact duplicates (docs 0 and 4 share text) MUST land in the same
    // split — content hashing prevents dup leakage across splits
    assert(a(0L) == a(4L))
    // roughly proportional at corpus scale
    val big = TrainingOps.splitAssign(spark,
      spark.read.parquet("/root/testdata/sf0.001/documents.parquet"))
      .groupBy(col("split")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val n = big.values.sum.toDouble
    assert(big("train") / n > 0.6 && big("train") / n < 0.95, big.toString)
    assert(big.getOrElse("val", 0L) + big.getOrElse("test", 0L) > 0)
  }

  test("cluster split: near-dup components co-split by the canonical hash; empty pairs == splitAssign") {
    import spark.implicits._
    val plain = TrainingOps.splitAssign(spark, docsDf).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    // pair graph {0-1, 1-2}: all three co-split with doc 0's (canonical)
    // content hash even though their texts hash differently
    val pairs = Seq((0L, 1L), (1L, 2L)).toDF("doc_a", "doc_b")
    val cs = TrainingOps.clusterSplit(spark, docsDf, pairs).collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getString(2)))).toMap
    assert(Seq(0L, 1L, 2L).map(cs(_)).distinct ==
      List((0L, plain(0L))), "component members must share the rep and its split")
    // non-members keep their own hash's assignment
    assert(cs(3L) == ((3L, plain(3L))) && cs(4L) == ((4L, plain(4L))))
    // no pairs at all ⇒ exactly splitAssign
    val none = TrainingOps.clusterSplit(spark, docsDf,
        spark.emptyDataset[(Long, Long)].toDF("doc_a", "doc_b")).collect()
      .map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(none == plain)
  }

  test("repetition stats: hand-computed ratios, Gopher flag on the quantized value") {
    import spark.implicits._
    val docs = docsDf.select(col("doc_id"), col("text"))
      .union(Seq((10L, "spam spam spam spam")).toDF("doc_id", "text"))
    val r = TrainingOps.repetitionStats(spark, docs).collect()
      .map(x => x.getLong(0) -> x).toMap
    // doc 0: 9 words ("the" twice) -> dup_word 1/9; 8 distinct bigrams ->
    // top 1/8; 7 distinct trigrams -> dup 0
    assert(r(0L).getLong(1) == 9L)
    assert(r(0L).getDouble(2) == 0.1111)
    assert(r(0L).getDouble(3) == 0.125)
    assert(r(0L).getDouble(4) == 0.0)
    assert(!r(0L).getBoolean(5))
    // doc 10: pathological repetition -> dup_word 3/4, every bigram is
    // "spam spam" (top 3/3 = 1.0, flagged), trigram dup (2-1)/2
    assert(r(10L).getLong(1) == 4L)
    assert(r(10L).getDouble(2) == 0.75)
    assert(r(10L).getDouble(3) == 1.0)
    assert(r(10L).getDouble(4) == 0.5)
    assert(r(10L).getBoolean(5))
  }

  test("contamination check: eval grams matched against the distinct train-gram set") {
    // evalMod=2 -> eval {0,2,4}, train {1,3}; 3-gram shingles: doc 0 shares
    // 6 of its 7 grams with doc 1 ("the lazy dog" vs "...cat" differs),
    // doc 2 (Spanish) shares none, doc 4 duplicates doc 0
    // sorted: the operator contract is a row SET (the declared query adds
    // the orderBy); physical order shifted when spread() landed (r8)
    val r = TrainingOps.contaminationCheck(spark, docsDf, n = 3, evalMod = 2)
      .orderBy(col("doc_id"))
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2), x.getBoolean(4))).toList
    assert(r == List((0L, 7L, 6L, true), (2L, 8L, 0L, false), (4L, 7L, 6L, true)))
  }

  test("contamination with hashed grams (the scale form) equals the string-gram form") {
    val hashed = TrainingOps.contaminationCheck(spark, docsDf, n = 3, evalMod = 2,
      hashGrams = true).collect().map(_.toSeq).toSeq
    val strings = TrainingOps.contaminationCheck(spark, docsDf, n = 3, evalMod = 2)
      .collect().map(_.toSeq).toSeq
    assert(hashed == strings && hashed.nonEmpty)
  }

  test("contamination from a stored train-gram table equals the lazy composition") {
    // the production path: DISTINCT train grams written once, eval sets
    // join the store — must be row-identical to contaminationCheck
    val grams = TrainingOps.contaminationTrainGrams(spark, docsDf, n = 3, evalMod = 2)
    val dir = java.nio.file.Files.createTempDirectory("graft-traingrams").toString
    graft.core.TableIO.write(grams, dir)
    val stored = TrainingOps.contaminationFromTrainGrams(spark, docsDf,
        graft.core.TableIO.read(spark, dir), n = 3, evalMod = 2)
      .collect().map(_.toSeq).toSeq
    val lazyPath = TrainingOps.contaminationCheck(spark, docsDf, n = 3, evalMod = 2)
      .collect().map(_.toSeq).toSeq
    assert(stored == lazyPath && stored.nonEmpty)
  }

  test("Bloom contamination from a stored train-gram table equals the plain stored path") {
    // the production decontamination shape: reference grams (hashed form)
    // materialized once, the corpus sweep runs the Bloom face against the
    // store — must be row-identical to the plain stored-gram join
    val grams = TrainingOps.contaminationTrainGrams(spark, docsDf, n = 3, evalMod = 2,
      hashGrams = true)
    val dir = java.nio.file.Files.createTempDirectory("graft-bloomgrams").toString
    graft.core.TableIO.write(grams, dir)
    val store = graft.core.TableIO.read(spark, dir)
    val bloomStored = TrainingOps.contaminationBloomFromTrainGrams(spark, docsDf,
        store, n = 3, evalMod = 2)
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    val plainStored = TrainingOps.contaminationFromTrainGrams(spark, docsDf,
        store, n = 3, evalMod = 2, hashGrams = true)
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    assert(bloomStored == plainStored && bloomStored.nonEmpty)
  }

  test("contamination with the Bloom pre-filter equals the exact hashed-gram path") {
    // no false negatives (Bloom guarantee) + the exact join removes false
    // positives ⇒ bit-identical output to the plain distinct-gram join
    val bloom = TrainingOps.contaminationCheckBloom(spark, docsDf, n = 3, evalMod = 2)
      .orderBy(col("doc_id")).collect().map(_.toSeq).toSeq
    val exact = TrainingOps.contaminationCheck(spark, docsDf, n = 3, evalMod = 2,
      hashGrams = true).orderBy(col("doc_id")).collect().map(_.toSeq).toSeq
    assert(bloom == exact && bloom.nonEmpty)
    // and at a deliberately terrible fpp the exact join still wins
    val sloppy = TrainingOps.contaminationCheckBloom(spark, docsDf, n = 3,
      evalMod = 2, fpp = 0.5).orderBy(col("doc_id")).collect().map(_.toSeq).toSeq
    assert(sloppy == exact)
  }

  test("unigram log-prob: hand-computed nats/token, flag on the quantized value") {
    import spark.implicits._
    // corpus counts: a=2 b=2 c=1, total=5
    // doc 0 (a a b): -(2·ln(2/5) + ln(2/5))/3 = ln(5/2)          = 0.9163
    // doc 1 (b c):   -(ln(2/5) + ln(1/5))/2   = (ln2.5 + ln5)/2 = 1.2629
    val docs = Seq((0L, "a a b"), (1L, "b c")).toDF("doc_id", "text")
    val r = TrainingOps.unigramLogProb(docs, flagThreshold = 1.0)
      .orderBy(col("doc_id")).collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getDouble(2), x.getBoolean(3))).toList
    assert(r == List((0L, 3L, 0.9163, false), (1L, 2L, 1.2629, true)))
  }

  test("held-out-LM log-prob: stored vocab, OOV at the Laplace floor, no self-scoring") {
    import spark.implicits._
    // reference vocab from TRAIN docs only: a=2 b=2 c=1, total=5
    val train = Seq((1L, "a a b"), (2L, "b c")).toDF("doc_id", "text")
    val vocab = TrainingOps.unigramVocab(train)
    // eval doc (a z): z is OOV → count 1 (Laplace floor), and z must NOT
    // enter the vocabulary (the self-scoring bias the held-out mode
    // removes): -(ln(2/5) + ln(1/5))/2 = 1.2629
    val eval_ = Seq((0L, "a z")).toDF("doc_id", "text")
    val r = TrainingOps.unigramLogProbFromVocab(spark, eval_, vocab,
        flagThreshold = 1.0).collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getDouble(2), x.getBoolean(3))).toList
    assert(r == List((0L, 2L, 1.2629, true)))
    // round-trip through a stored vocab table (the production artifact)
    val dir = java.nio.file.Files.createTempDirectory("graft-uvocab").toString
    graft.core.TableIO.write(vocab, dir)
    val stored = TrainingOps.unigramLogProbFromVocab(spark, eval_,
        graft.core.TableIO.read(spark, dir), flagThreshold = 1.0).collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getDouble(2), x.getBoolean(3))).toList
    assert(stored == r)
  }

  test("sequence packing: greedy first-fit per shard, oversize doc overflows its own bin") {
    import spark.implicits._
    def doc(id: Long, n: Int) = (id, Seq.fill(n)("w").mkString(" "))
    // shard 0 = ids {0,2,4} with 4/5/3 tokens: 4+5=9 ≤ 10 pack, +3 overflows
    // shard 1 = ids {1,3,5} with 12/2/9: 12 overflows bin 0 alone, then 2,
    // then 2+9 = 11 > 10 opens a third bin
    val docs = Seq(doc(0, 4), doc(1, 12), doc(2, 5), doc(3, 2), doc(4, 3), doc(5, 9))
      .toDF("doc_id", "text")
    val expect = List((0L, 0L, 0L, 4L), (1L, 1L, 0L, 12L), (2L, 0L, 0L, 5L),
      (3L, 1L, 1L, 2L), (4L, 0L, 1L, 3L), (5L, 1L, 2L, 9L))
    val r = TrainingOps.sequencePack(spark, docs, capacity = 10, nShards = 2)
      .orderBy("doc_id")
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2), x.getLong(3))).toList
    assert(r == expect)
    // input partitioning must not leak into the assignment (the shard
    // repartition + in-shard sort fully determine the scan order)
    val r7 = TrainingOps.sequencePack(spark, docs.repartition(7), capacity = 10,
      nShards = 2).orderBy("doc_id").collect().map(x => (x.getLong(0), x.getLong(1),
      x.getLong(2), x.getLong(3))).toList
    assert(r7 == expect)
  }

  test("epoch shuffle: dense shard-local ranks, full coverage per epoch, order varies by epoch") {
    val r = TrainingOps.epochShuffle(spark, docsDf, epochs = 2, nShards = 2)
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2), x.getLong(3)))
    // every doc exactly once per epoch
    assert(r.groupBy(_._1).view.mapValues(_.map(_._4).sorted.toList).toMap ==
      Map(0L -> List(0L, 1L, 2L, 3L, 4L), 1L -> List(0L, 1L, 2L, 3L, 4L)))
    // ranks dense 1..count within each (epoch, shard)
    r.groupBy(x => (x._1, x._2)).foreach { case (_, g) =>
      assert(g.map(_._3).sorted.toList == (1L to g.size).toList)
    }
    // the schedule is a function of (epoch, doc_id) only: input partitioning
    // must not change it, and epochs must not repeat the same order
    val r7 = TrainingOps.epochShuffle(spark, docsDf.repartition(7),
      epochs = 2, nShards = 2).collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getLong(2), x.getLong(3)))
    assert(r7.toList == r.toList)
    def order(e: Long) = r.filter(_._1 == e).sortBy(x => (x._2, x._3)).map(_._4).toList
    assert(order(0L) != order(1L))
  }

  test("sequence packing invariants on a varied corpus: contiguous bins, capacity respected, scan order") {
    import spark.implicits._
    // 150 docs with token counts cycling 1..30 plus oversize spikes (cap+5
    // every 13th) — exercises fits, overflows, and oversize-own-bin cases
    val docs = (0L until 150L).map { i =>
      val n = if (i % 13 == 0) 25 else 1 + (i % 30).toInt
      (i, Seq.fill(n)("w").mkString(" "))
    }.toDF("doc_id", "text")
    val cap = 20
    val r = TrainingOps.sequencePack(spark, docs, capacity = cap, nShards = 5)
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2), x.getLong(3)))
    assert(r.length == 150)
    r.groupBy(_._2).foreach { case (_, shard) =>
      val inOrder = shard.sortBy(_._1) // doc_id order = scan order
      // bins contiguous from 0, non-decreasing along the scan
      assert(inOrder.head._3 == 0L)
      inOrder.sliding(2).foreach { case Array(a, b) =>
        assert(b._3 == a._3 || b._3 == a._3 + 1)
      case _ => }
      // a bin's token total respects capacity unless it is a single
      // oversize document
      inOrder.groupBy(_._3).foreach { case (_, bin) =>
        val tot = bin.map(_._4).sum
        assert(tot <= cap || bin.length == 1)
      }
      // greedy: a new bin only opens because the next doc did not fit
      inOrder.sliding(2).foreach { case Array(a, b) =>
        if (b._3 == a._3 + 1) {
          val fillBefore = inOrder.filter(x => x._3 == a._3).map(_._4).sum
          assert(fillBefore + b._4 > cap)
        }
      case _ => }
    }
  }

  test("epoch shuffle matches an independent reimplementation of the schedule") {
    import spark.implicits._
    val docs = (0L until 100L).map(i => (i, s"text $i")).toDF("doc_id", "text")
    val got = TrainingOps.epochShuffle(spark, docs, epochs = 3, nShards = 4)
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2), x.getLong(3))).toList
    // reference schedule computed directly from the definition
    val want = (for {
      e <- 0L until 3L
      id <- 0L until 100L
      k = TrainingOps.fnv1a64(s"$e:$id")
    } yield (e, ((k % 4) + 4) % 4, k, id))
      .groupBy(x => (x._1, x._2)).toList
      .flatMap { case ((e, sh), g) =>
        g.sortBy(x => (x._3, x._4)).zipWithIndex
          .map { case (x, i) => (e, sh, (i + 1).toLong, x._4) }
      }.sortBy(x => (x._1, x._2, x._3))
    assert(got == want)
  }

  test("unigram log-prob orders stereotypical below rare-token documents") {
    import spark.implicits._
    // doc 0 repeats the corpus-common token; doc 1 is all-unique tokens
    val docs = (Seq((0L, Seq.fill(10)("common").mkString(" ")),
      (1L, (1 to 10).map(i => s"rare$i").mkString(" "))) ++
      (2L until 20L).map(i => (i, "common filler words")))
      .toDF("doc_id", "text")
    val r = TrainingOps.unigramLogProb(docs).collect()
      .map(x => x.getLong(0) -> x.getDouble(2)).toMap
    assert(r(0L) < r(1L))
    // and the per-doc token totals agree with the ws tokenizer
    val n = TrainingOps.unigramLogProb(docs).collect()
      .map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(n(0L) == 10L && n(1L) == 10L && n(5L) == 3L)
  }

  test("mixing weights are invariant to uniform corpus duplication") {
    import spark.implicits._
    val doubled = docsDf.select(col("doc_id"), col("text"), col("source"))
      .union(docsDf.select(col("doc_id") + 100L, col("text"), col("source")))
    val w1 = TrainingOps.sourceMixWeights(docsDf).collect()
      .map(x => x.getString(0) -> x.getDouble(3)).toMap
    val w2 = TrainingOps.sourceMixWeights(doubled).collect()
      .map(x => x.getString(0) -> x.getDouble(3)).toMap
    // every source's token mass scales by the same factor, so τ-powered
    // shares cancel it; quantization allows ±1 ulp of the 4dp grid
    assert(w1.keySet == w2.keySet)
    w1.foreach { case (s, w) => assert(math.abs(w - w2(s)) <= 1e-4 + 1e-9) }
  }

  test("quality calibration percentiles are ordered and are actual data values") {
    import spark.implicits._
    val docs = (0L until 97L).map { i =>
      val stops = Seq.fill((i % 7).toInt)("the")
      val rest = Seq.fill(10)(s"w$i")
      (i, (stops ++ rest).mkString(" "), "en", s"src${i % 3}")
    }.toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")).cast("long"))
    val ratios = TrainingOps.qualityScore(docs).collect()
      .map(x => x.getLong(0) -> x.getDouble(3)).toMap
    val bySource = (0L until 97L).groupBy(i => s"src${i % 3}")
      .view.mapValues(_.map(ratios).toSet).toMap
    TrainingOps.qualityCalibration(docs).collect().foreach { x =>
      val (s, p10, p50, p90) = (x.getString(0), x.getDouble(2), x.getDouble(3), x.getDouble(4))
      assert(p10 <= p50 && p50 <= p90)
      assert(Set(p10, p50, p90).subsetOf(bySource(s)))
    }
  }

  test("quality calibration: type-1 discrete percentiles per source via integer ranks") {
    // src0 = docs {0,2}: stopword ratios {0.2222 ("the"×2 / 9), 0.0} →
    // ranks for n=2: p10/p50 at ⌈.2⌉/⌈1⌉ = 1 (0.0), p90 at ⌈1.8⌉ = 2
    // (0.2222); single-doc sources return their own value at every p
    val r = TrainingOps.qualityCalibration(docsDf).collect()
      .map(x => (x.getString(0), x.getLong(1), x.getDouble(2), x.getDouble(3),
        x.getDouble(4))).toList
    assert(r == List(
      ("src0", 2L, 0.0, 0.0, 0.2222), ("src1", 1L, 0.2222, 0.2222, 0.2222),
      ("src2", 1L, 0.0, 0.0, 0.0), ("src3", 1L, 0.2222, 0.2222, 0.2222)))
  }

  test("source mixing weights: τ-powered token shares, quantized, ordered by source") {
    val r = TrainingOps.sourceMixWeights(docsDf, temperature = 0.5).collect()
      .map(x => (x.getString(0), x.getLong(1), x.getLong(2), x.getDouble(3))).toList
    // src0 = docs {0,2} (9+10 tokens), src1 = {1} (9), src2 = {3} (6), src3 = {4} (9)
    val toks = Map("src0" -> 19L, "src1" -> 9L, "src2" -> 6L, "src3" -> 9L)
    val z = toks.values.map(n => math.pow(n.toDouble, 0.5)).sum
    def w(n: Long) = math.floor(math.pow(n.toDouble, 0.5) / z * 1e4 + 0.5) / 1e4
    assert(r == List(("src0", 2L, 19L, w(19)), ("src1", 1L, 9L, w(9)),
      ("src2", 1L, 6L, w(6)), ("src3", 1L, 9L, w(9))))
    // weights form a distribution (within the 4dp quantization)
    assert(math.abs(r.map(_._4).sum - 1.0) <= 4 * 1e-4)
  }

  test("budget selection: two-phase prefix sum == naive window, ties included; inclusive keep rule") {
    import spark.implicits._
    // tie-heavy corpus: identical texts share a (source, ratio) group, so
    // the budget boundary lands INSIDE a tie run — the case where a wrong
    // frame (RANGE vs ROWS) or tie-break would diverge from the naive form
    val docs = Seq(
      (0L, "the a of to in is and", "s0"), // ratio 1.0, 7 tokens
      (1L, "the a of to in is and", "s0"), // exact tie with doc 0
      (2L, "alpha beta the gamma", "s0"),  // ratio 0.25, 4 tokens
      (3L, "alpha beta gamma delta", "s0"),
      (4L, "the the the", "s1"),
      (5L, "zed", "s1"),
      (6L, "the queue", "s1")
    ).toDF("doc_id", "text", "source")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("doc_id").collect().map(_.toSeq).toSeq
    for (b <- Seq(0L, 7L, 10L, 1000L))
      assert(rows(TrainingOps.budgetSelect(docs, b)) ==
        rows(TrainingOps.budgetSelectNaive(docs, b)), s"budget $b")
    assert(TrainingOps.budgetSelect(docs, 1000L).collect().forall(_.getBoolean(5)))
    assert(TrainingOps.budgetSelect(docs, 0L).collect().forall(!_.getBoolean(5)))
    // inclusive cum ≤ budget across a tie: s0's 1.0-ratio run is docs {0,1}
    // at 7 tokens each — budget 7 keeps the first (cum 7), drops the second
    // (cum 14), doc_id ascending inside the tie
    val b7 = TrainingOps.budgetSelect(docs, 7L).collect()
      .map(r => (r.getLong(0), r.getBoolean(5))).toMap
    assert(b7(0L) && !b7(1L))
  }

  test("vocab top-k: exact counts, count-desc token-asc order, tie at the k boundary deterministic") {
    import spark.implicits._
    val docs = Seq((0L, "b b b a a c"), (1L, "A a d c")).toDF("doc_id", "text")
    // counts: a=4, b=3, c=2, d=1 — at k=3 the c/d boundary picks c (higher n)
    val got = TrainingOps.vocabTopK(docs, k = 3).as[(String, Long)].collect().toSeq
    assert(got == Seq("a" -> 4L, "b" -> 3L, "c" -> 2L))
    // tie ties broken by token asc: c and d both 1 → c first
    val tied = Seq((0L, "x x d c")).toDF("doc_id", "text")
    assert(TrainingOps.vocabTopK(tied, k = 2).as[(String, Long)].collect().toSeq ==
      Seq("x" -> 2L, "c" -> 1L))
  }

  test("approx aggregates: HLL count-distinct and approx percentile within tolerance of exact") {
    import spark.implicits._
    // the 100 TB forms of a11_distinct / exact percentiles: sketches are
    // engine-specific (no cross-engine hash oracle possible), so pin them
    // against the exact answers on a deterministic 100k-row, 7919-key table
    val df = spark.range(0L, 100000L).select(pmod(col("id"), lit(7919L)).as("k"))
    val exact = df.select(countDistinct(col("k"))).as[Long].head()
    assert(exact == 7919L)
    // rsd is a standard deviation, not a bound — assert at 3x the
    // requested rsd (observed: rsd=0.05 sat at a 1.5-sigma 7.6% error)
    val approx = df.select(approx_count_distinct(col("k"), 0.02)).as[Long].head()
    assert(math.abs(approx - exact).toDouble / exact < 0.06,
      s"HLL estimate $approx vs exact $exact exceeds 3x rsd")
    val p50 = df.select(percentile_approx(col("k"), lit(0.5), lit(1000))).as[Long].head()
    // occupancy is NOT uniform (100000 = 7919*12 + 4972: values below 4972
    // appear 13x) — compare against the exact percentile, not a guess
    val p50exact = df.select(expr("percentile(k, 0.5)")).as[Double].head()
    assert(math.abs(p50 - p50exact) / p50exact < 0.01,
      s"approx median $p50 vs exact $p50exact exceeds 1% relative error")
  }

  test("pii scrub: emails and phones masked, counts and scrubbed hash exact") {
    import spark.implicits._
    val docs = Seq(
      (0L, "reach records.desk@epa.gov or (202) 555-0147 now"),
      (1L, "no pii here")).toDF("doc_id", "text")
    val r = TrainingOps.piiScrub(docs).collect()
    assert(r(0).getLong(1) == 1L && r(0).getLong(2) == 1L)
    assert(r(1).getLong(1) == 0L && r(1).getLong(2) == 0L)
    val expected = java.security.MessageDigest.getInstance("MD5")
      .digest("reach [EMAIL] or [PHONE] now".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    assert(r(0).getString(3) == expected)
    // non-vacuous over the real corpus: the generated docs carry inline
    // emails/phones in their surviving text spans (spec §3)
    import graft.gen.SpanGen
    import graft.kernel.Extractor
    val spans = spark.range(0L, 50L)
      .map(i => Extractor.extractDoc(SpanGen.genDoc(SpanGen.docId(i)))).toDF()
    val agg = TrainingOps.piiScrub(graft.job.CurationJob.docText(spans))
      .agg(sum(col("n_emails")), sum(col("n_phones"))).collect()(0)
    assert(agg.getLong(0) + agg.getLong(1) > 0L)
  }

  // ------------------------------------------------------------ embeddings
  private def embDf = {
    import spark.implicits._
    // vec 0 ≈ vec 1 (same direction), vec 2 orthogonal, vec 3 opposite
    Seq(
      (0L, Array(1f, 0f, 0f, 0f)),
      (1L, Array(0.99f, 0.1f, 0f, 0f)),
      (2L, Array(0f, 1f, 0f, 0f)),
      (3L, Array(-1f, 0f, 0f, 0f))
    ).toDF("vec_id", "embedding")
  }

  test("embedding cosine pairs: exact math on known vectors") {
    val pairs = TrainingOps.embedCosinePairs(spark, embDf, minSim = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(pairs.map(p => (p._1, p._2)) == Seq((0L, 1L)))
    // cos = 0.99 / sqrt(0.99² + 0.1²) = 0.99493847… → 4dp 0.9949
    assert(math.abs(pairs.head._3 - 0.9949) < 1e-9)
  }

  test("blocked all-pairs is block-count invariant (routing covers every pair exactly once)") {
    import spark.implicits._
    // 30 deterministic vectors spread over many directions
    val vecs = (0 until 30).map { i =>
      (i.toLong, Array.tabulate(8)(d => math.sin(i * 0.7 + d * 1.3).toFloat))
    }.toDF("vec_id", "embedding")
    def pairs(b: Int) = TrainingOps.embedCosinePairs(spark, vecs, minSim = 0.5, nBlocks = b)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val one = pairs(1) // single diagonal group = plain triangular scan
    assert(one.nonEmpty)
    assert(pairs(4) == one && pairs(7) == one)
  }

  test("LSH-pruned cosine pairs are a subset of exact pairs; co-directional pair recalled") {
    val exact = TrainingOps.embedCosinePairs(spark, embDf, minSim = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = TrainingOps.embedCosinePairsLsh(spark, embDf, minSim = 0.9, nPlanes = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh.subsetOf(exact))
    assert(lsh.contains((0L, 1L)), "near-identical directions must share every bucket")
  }

  test("embed-LSH hot-bucket cap: default is a no-op; mega-cluster of identical vectors stays bounded") {
    import spark.implicits._
    val capped = TrainingOps.embedCosinePairsLsh(spark, embDf, minSim = 0.9, nPlanes = 8)
      .collect().map(_.toSeq).toSeq
    val off = TrainingOps.embedCosinePairsLsh(spark, embDf, minSim = 0.9, nPlanes = 8,
        maxBucket = 0)
      .collect().map(_.toSeq).toSeq
    assert(capped == off && capped.nonEmpty)

    // 5k IDENTICAL embeddings all share one hyperplane bucket → uncapped
    // would enumerate 5k²/2 candidates; the cap drops the bucket entirely
    // (byte-identical media is exact dedup's job, same doctrine as T2/T3)
    val mega = spark.range(0, 5000)
      .select(col("id").as("vec_id"),
        typedLit(Array(0.5f, 0.5f, 0.5f, 0.5f)).as("embedding"))
    assert(TrainingOps.embedCosinePairsLsh(spark, mega, minSim = 0.9,
      maxBucket = 100).count() == 0)
    assert(TrainingOps.hotGroupDropCount(
      TrainingOps.hyperplaneBuckets(spark, mega, 8), Seq("bucket"), 100) == 1L)
  }

  test("brute-force cosine top-k ranks by similarity") {
    val top = TrainingOps.cosineTopK(spark, embDf, nQueries = 1, k = 3).collect()
    assert(top.map(_.getLong(1)).toSeq == Seq(1L, 2L, 3L)) // by sim desc
  }

  test("IVF ANN returns ranked neighbors from probed cells") {
    val r = TrainingOps.annIvfTopK(spark, embDf, nCells = 2, nProbe = 2, nQueries = 1, k = 3)
      .collect()
    assert(r.nonEmpty && r.forall(_.getLong(0) == 0L))
    assert(r.map(_.getLong(2)).toSeq == (1L to r.length).toSeq) // dense ranks
  }

  test("semantic dedup pairs are within-cell exact-cosine pairs; co-directional pair recalled") {
    val exact = TrainingOps.embedCosinePairs(spark, embDf, minSim = 0.9)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    val sem = TrainingOps.semanticDupPairs(spark, embDf, nCells = 2, minSim = 0.9)
      .collect().map(r => ((r.getLong(1), r.getLong(2)), r.getDouble(3))).toMap
    assert(sem.keySet.subsetOf(exact.keySet), "within-cell pairs must be a subset of all pairs")
    assert(sem.contains((0L, 1L)), "near-identical directions must land in the same cell")
    sem.foreach { case (k, s) => assert(s == exact(k), s"sim mismatch at $k") }
  }

  test("semantic dedup clusters: pair graph through CC, min vec_id is the survivor label") {
    val cc = TrainingOps.connectedComponents(spark,
        TrainingOps.semanticDupPairs(spark, embDf, nCells = 2, minSim = 0.9)
          .select(col("vec_a"), col("vec_b"))).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(cc == Set((0L, 0L), (1L, 0L)))
  }

  test("semantic dedup hot-cell cap: default no-op; mega-cluster of identical embeddings dropped") {
    val capped = TrainingOps.semanticDupPairs(spark, embDf, nCells = 2, minSim = 0.9,
        maxCell = 3).collect().map(_.toSeq).toSet
    val off = TrainingOps.semanticDupPairs(spark, embDf, nCells = 2, minSim = 0.9)
      .collect().map(_.toSeq).toSet
    assert(capped == off && capped.nonEmpty, "cap above the largest cell must be a no-op")

    // 5k IDENTICAL embeddings collapse into one Lloyd cell → uncapped would
    // enumerate 5k²/2 pairs; the cap drops the cell, and the assignment
    // audit counts exactly that one dropped cell (same doctrine as T2/T3/T5)
    val mega = spark.range(0, 5000)
      .select(col("id").as("vec_id"),
        typedLit(Array(0.5f, 0.5f, 0.5f, 0.5f)).as("embedding"))
    assert(TrainingOps.semanticDupPairs(spark, mega, minSim = 0.9, maxCell = 100).count() == 0)
    assert(TrainingOps.hotGroupDropCount(
      TrainingOps.semanticCells(spark, mega), Seq("cell"), 100) == 1L)
  }

  // real driver-generated embeddings (500 vecs × 64 dims) — the recall gate
  // runs against the same table the driver verifies on
  private lazy val realEmb =
    spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")

  private def topKSets(df: org.apache.spark.sql.DataFrame): Map[Long, Set[Long]] =
    df.collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap

  private def recallAt(exact: Map[Long, Set[Long]], ann: Map[Long, Set[Long]]): Double =
    exact.map { case (q, t) => ann.getOrElse(q, Set.empty).intersect(t).size.toDouble / t.size }
      .sum / exact.size

  test("ANN recall gate: IVF recall@5 >= 0.8 on the unstructured driver embeddings") {
    // the driver's embeddings are isotropic (true top-5 at cosine ≈ 0.3) —
    // the hard regime; IVF still reaches the gate at defaults because the
    // Lloyd cells bend toward the data and nProbe/nCells scans 1/4 of it
    val exact = topKSets(TrainingOps.cosineTopK(spark, realEmb))
    val rIvf = recallAt(exact, topKSets(TrainingOps.annIvfTopK(spark, realEmb)))
    val rLsh = recallAt(exact, topKSets(TrainingOps.annLshTopK(spark, realEmb)))
    info(f"recall@5 at defaults on isotropic data: ivf=$rIvf%.3f (gated), lsh=$rLsh%.3f (FYI)")
    assert(rIvf >= 0.8, f"IVF recall@5 $rIvf%.3f below gate")
  }

  test("ANN recall gate: LSH recall@5 >= 0.8 in its high-cosine (near-dup) regime") {
    // hyperplane LSH's collision probability is (1 − θ/π)^nPlanes — it is
    // the HIGH-similarity tool; over isotropic data no sublinear hash can
    // beat the scanned-volume fraction (measured ~0.05 at defaults, see the
    // FYI above), which is why this gate plants real near-duplicates:
    // 5 jittered copies (cosine ≥ 0.99) of each of the 8 query vectors on
    // top of the 500 driver embeddings
    import spark.implicits._
    val base = realEmb.select(col("vec_id").cast("long"), col("embedding"))
      .as[(Long, Array[Float])].collect()
    val planted = base.flatMap { case (id, v) =>
      val copies =
        if (id < 8) (0 until 5).map { j =>
          val w = v.zipWithIndex.map { case (x, d) =>
            val h = scala.util.hashing.MurmurHash3.productHash((id, j, d))
            x * (1f + 0.02f * ((h % 1000) / 1000f))
          }
          (1000L + id * 5 + j, w)
        }
        else Seq.empty
      (id, v) +: copies
    }.toSeq.toDF("vec_id", "embedding")
    val exact = topKSets(TrainingOps.cosineTopK(spark, planted))
    // sanity: the planted copies ARE the true top-5 of each query
    assert(exact.forall { case (q, t) => t == (0 until 5).map(j => 1000L + q * 5 + j).toSet })
    val rLsh = recallAt(exact, topKSets(TrainingOps.annLshTopK(spark, planted)))
    info(f"LSH recall@5 on planted near-dups: $rLsh%.3f")
    assert(rLsh >= 0.8, f"LSH recall@5 $rLsh%.3f below gate")
  }

  test("IVF Lloyd centroids: deterministic, all cells occupied, occupancy balanced") {
    val h1 = TrainingOps.ivfCellHistogram(spark, realEmb, nCells = 8)
      .orderBy("cell").collect().map(r => (r.getInt(0), r.getLong(1))).toSeq
    val h2 = TrainingOps.ivfCellHistogram(spark, realEmb, nCells = 8)
      .orderBy("cell").collect().map(r => (r.getInt(0), r.getLong(1))).toSeq
    assert(h1 == h2, "fixed-point sums must make k-means order-independent")
    info(s"cell occupancy: $h1")
    assert(h1.map(_._1) == (0 until 8), "every cell must be occupied")
    val counts = h1.map(_._2)
    val mean = counts.sum.toDouble / counts.length
    assert(counts.max <= 4 * mean,
      s"cell skew breaks the nProbe/nCells cost model: max=${counts.max} mean=$mean")
  }

  // ------------------------------------------------------------ multimodal
  test("media table schema + decode plumbing (binary in, typed meta out)") {
    val media = MediaOps.mediaTable(docsDf)
    assert(media.schema("content").dataType.typeName == "binary")
    val meta = MediaOps.decodeMeta(spark, media).collect().sortBy(_.media_id)
    assert(meta.length == 5)
    assert(meta.map(_.kind).toSeq == Seq("image", "audio", "video", "image", "audio"))
    // n_bytes == utf-8 length of the source text (content IS the text bytes)
    assert(meta(0).n_bytes == "the quick brown fox jumps over the lazy dog".length)
    // decode determinism: same bytes (docs 0 and 4 have identical text) but
    // kinds differ → image fields for 0, audio duration for 4
    assert(meta(0).width > 0 && meta(0).height > 0 && meta(0).duration_ms == 0)
    assert(meta(1).sample_rate == 16000 && meta(1).duration_ms > 0)
    assert(meta(2).width > 0 && meta(2).duration_ms == meta(2).n_bytes * 40)
  }

  test("dark ratio: bytes < 0x30 over total, half-up 4dp") {
    // "ab .," → dark = {' '(0x20),'.'(0x2e),','(0x2c)} = 3 of 5
    assert(MediaOps.FakeCodec.darkRatio("ab .,".getBytes("UTF-8")) == 0.6)
    assert(MediaOps.FakeCodec.darkRatio(Array.empty[Byte]) == 0.0)
  }

  test("resize plan preserves aspect ratio and never upsizes") {
    val plans = MediaOps.resizePlan(spark, MediaOps.mediaTable(docsDf), maxEdge = 100)
      .collect()
    plans.foreach { r =>
      val (w, h, ow, oh) = (r.getInt(2), r.getInt(3), r.getInt(4), r.getInt(5))
      assert(ow <= 100 && oh <= 100 && ow <= w && oh <= h && ow >= 1 && oh >= 1)
      // the max edge lands exactly on the bound (or is untouched if smaller)
      assert(math.max(ow, oh) == math.min(100, math.max(w, h)), s"max edge: $r")
    }
  }

  test("frame sampling: every 1000ms from 0 to duration") {
    val frames = MediaOps.frameSample(spark, MediaOps.mediaTable(docsDf), everyMs = 1000L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(frames.nonEmpty)
    frames.groupBy(_._1).foreach { case (_, fs) =>
      val dur = fs.head._2
      val times = fs.map(_._3).sorted.toSeq
      assert(times == (0L until dur by 1000L).toSeq)
    }
  }

  test("feature extraction emits fixed-dim vectors consumable by ANN") {
    val feats = MediaOps.featureExtract(spark, MediaOps.mediaTable(docsDf))
    val rows = feats.collect()
    assert(rows.forall(_.getSeq[Float](1).length == 16))
    // deterministic: same bytes → same features (docs 0 and 4)
    val byId = rows.map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    assert(byId(0L) == byId(4L))
    val ann = TrainingOps.cosineTopK(spark,
      feats.withColumnRenamed("media_id", "vec_id"), nQueries = 1, k = 2)
    assert(ann.collect().head.getLong(1) == 4L) // identical bytes rank first
  }

  // ------------------------------------------------------- mail ingest (S3)
  test("mail ingest: MIME walk skips body + containers, decodes attachment payloads") {
    import graft.sources.MailIngest
    val text = "a" * 60
    val atts = MailIngest.walkParts(5L, MailIngest.buildMessage(5L, text))
    assert(atts.length == 3) // 5 % 3 + 1
    assert(atts.map(_.att_index) == Seq(0, 1, 2))
    // payload i = chars [i*11, i*11+50) clipped to len 60
    assert(atts.map(_.n_bytes) == Seq(50L, 49L, 38L))
    // mime cycles by (msgId + i) % 3: 5→txt, 6→pdf, 7→png
    assert(atts.map(_.mime) == Seq("text/plain", "application/pdf", "image/png"))
    assert(atts.map(_.filename) == Seq("att_0.txt", "att_1.pdf", "att_2.png"))
    // the text/plain BODY part (no Content-Disposition) must not appear
    assert(atts.forall(_.n_bytes <= 50))
    // distributed face over the docs fixture
    val per = MailIngest.perMessage(spark, docsDf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(per == Map(0L -> 1L, 1L -> 2L, 2L -> 3L, 3L -> 1L, 4L -> 2L))
  }

  // ------------------------------------------------------- ocr pages
  test("ocr pages: fixed-width pagination, confidence ratio, level bucketing") {
    import spark.implicits._
    import graft.queries.OcrOps
    val docs = Seq(
      (0L, "ab" * 325, "en", "src0"), // 650 chars → pages 300/300/50
      (1L, "zz!!", "en", "src0"), // conf = 2/4 = 0.5 → possible
      (2L, "", "en", "src0") // empty → no pages, no doc row
    ).toDF("doc_id", "text", "lang", "source")
    val p = OcrOps.pages(docs).collect()
    assert(p.count(_.getLong(0) == 0L) == 3)
    assert(p.filter(_.getLong(0) == 0L).map(_.getString(2).length).sorted.toSeq == Seq(50, 300, 300))
    val d = OcrOps.docConfidence(docs).collect().map(r =>
      r.getLong(0) -> (r.getLong(1), r.getDouble(2), r.getString(4))).toMap
    assert(!d.contains(2L))
    assert(d(0L) == ((3L, 1.0, "confirmed"))) // all lowercase letters
    assert(d(1L) == ((1L, 0.5, "possible")))
  }

  // ---------------------------------------------------------- entity link
  test("entity linking: exact tier groups case variants; containment tier clusters substrings") {
    import spark.implicits._
    val mentions = Seq(
      ("d1", "PERSON", "Mr. James Smith", "mr. james smith"),
      ("d2", "PERSON", "MR. JAMES SMITH", "mr. james smith"), // exact-tier merge
      ("d3", "ORGANIZATION", "Records Agency", "records agency"),
      ("d4", "ORGANIZATION", "Federal Records Agency", "federal records agency"), // containment
      ("d5", "ORGANIZATION", "Justice Bureau", "justice bureau")
    ).toDF("doc_id", "entity_type", "raw", "norm")
    val canon = EntityLink.exactCanonicals(mentions)
    assert(canon.count() == 4) // two PERSON rows merged
    val links = EntityLink.containmentLinks(spark, canon).collect()
    // "records agency" ⊂ "federal records agency" → both link to min() = the longer...
    // min("records agency","federal records agency") = "federal records agency"
    assert(links.length == 2)
    assert(links.forall(_.getString(2) == "federal records agency"))
  }

  test("4-gram-blocked containment tier equals the all-pairs NLJ formulation") {
    val canon = EntityLink.exactCanonicals(EntityLink.mentions(spark, 120))
    // reference formulation: quadratic nested-loop join (test-only oracle)
    val slim = canon.select(col("entity_type"), col("norm")).where(length(col("norm")) > 3)
    val nlj = slim.as("a")
      .join(slim.as("b"),
        col("a.entity_type") === col("b.entity_type") &&
          col("a.norm") =!= col("b.norm") &&
          (col("a.norm").contains(col("b.norm")) || col("b.norm").contains(col("a.norm"))))
      .groupBy(col("a.entity_type").as("entity_type"), col("a.norm").as("norm"))
      .agg(min(least(col("a.norm"), col("b.norm"))).as("canonical_norm"))
      .collect().map(_.toSeq).toSet
    val blocked = EntityLink.containmentLinks(spark, canon)
      .collect().map(_.toSeq).toSet
    assert(blocked == nlj)
    assert(blocked.nonEmpty, "fixture must actually exercise the tier")
  }

  test("entity link stats over generated corpus are deterministic and non-empty") {
    val a = EntityLink.linkStats(spark, 50).collect().map(_.toSeq).toSeq
    val b = EntityLink.linkStats(spark, 50).collect().map(_.toSeq).toSeq
    assert(a == b && a.nonEmpty)
    assert(a.forall(r => r(1).asInstanceOf[Long] >= r(2).asInstanceOf[Long])) // canonicals >= clusters
  }

  test("store-read linking (SparkEntry j4/j6/j7) equals the kernel-recompute path") {
    // the graded queries read the materialized extraction-spans store;
    // they must stay row-identical to computing from the kernel directly
    val fromStore = SparkEntry.queries("j4_entity_link")(spark, "unused")
      .collect().map(_.toSeq).toSeq
    val fromKernel = EntityLink.linkStats(spark, 300)
      .orderBy("entity_type").collect().map(_.toSeq).toSeq
    assert(fromStore == fromKernel)
    val cooStore = SparkEntry.queries("j6_cooccurrence")(spark, "unused")
      .collect().map(_.toSeq).toSeq
    val cooKernel = EntityLink.cooccurrence(spark, 300, minDocs = 2)
      .orderBy(col("n_docs").desc, col("type_a"), col("norm_a"),
        col("type_b"), col("norm_b"))
      .limit(100).collect().map(_.toSeq).toSeq
    assert(cooStore == cooKernel && cooStore.nonEmpty)
  }

  test("alias sets + confidence bucketing per canonical (extract.py:363-377, models.py:95-99)") {
    import spark.implicits._
    val mentions = Seq(
      ("d1", "PERSON", "Mr. James Smith", "mr. james smith"),
      ("d2", "PERSON", "MR. JAMES SMITH", "mr. james smith"),
      ("d2", "PERSON", "mr. james smith", "mr. james smith"),
      ("d3", "ORGANIZATION", "Records Agency", "records agency")
    ).toDF("doc_id", "entity_type", "raw", "norm")
    val canon = EntityLink.exactCanonicals(mentions).collect()
      .map(r => r.getString(1) -> r.getAs[Long]("n_aliases")).toMap
    assert(canon("mr. james smith") == 3) // three distinct raw surface forms
    assert(canon("records agency") == 1)
    // confidence stand-in 0.5 + 0.1·n_docs: 2 docs → 0.7 probable; link
    // output carries the bucket + alias counts over the generated corpus
    val linked = EntityLink.linked(spark, 50)
    val levels = linked.select(col("confidence_level")).distinct()
      .collect().map(_.getString(0)).toSet
    assert(levels.subsetOf(Set("confirmed", "probable", "possible", "unresolved")))
    val stats = EntityLink.aliasStats(spark, 50).collect()
    assert(stats.nonEmpty)
    assert(stats.forall(r => r.getAs[Long]("total_aliases") >= r.getAs[Long]("n_canonicals")))
    // the array-typed export face stays available to library users
    val aliases = EntityLink.aliasSets(spark, 50)
    assert(aliases.schema("aliases").dataType.typeName == "array")
  }

  test("co-occurrence edges carry the reference entity_links shape: relation + evidence") {
    val edges = EntityLink.cooccurrence(spark, 60, minDocs = 1)
    assert(edges.columns.toSeq ==
      Seq("type_a", "norm_a", "type_b", "norm_b", "relation", "n_docs", "evidence_doc"))
    val rows = edges.collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getAs[String]("relation") == "co_mentioned"))
    // evidence_doc is a real witnessing doc id from the generated corpus
    assert(rows.forall(_.getAs[String]("evidence_doc").nonEmpty))
  }

  // ----------------------------------------------------- driver contract
  test("entry() returns non-empty kind histogram (driver smoke contract)") {
    val rows = SparkEntry.entry(spark).collect()
    assert(rows.nonEmpty)
    assert(rows.map(_.getString(0)).contains("text"))
  }

  test("j5_golden_compare reports zero mismatches across 300 docs") {
    val r = SparkEntry.queries("j5_golden_compare")(spark, "").collect().head
    assert(r.getLong(0) == 300L, "full outer join covers every doc")
    assert(r.getLong(1) == 0L, "kernel == golden through the Spark surface")
  }

  // ------------------------------------------------------------- lang id
  test("language id picks marker-heavy language, und on no signal") {
    val out = TrainingOps.langId(docsDf).collect()
      .map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(out(0L) == "en" && out(2L) == "es")
    assert(out(3L) == "und" || out(3L) == "en") // 'here' has no markers; 'banana…' none either
  }

  // --------------------------------------- cross-doc substring dedup (T34)
  test("substringDupStats: hand case — canonical exempt, covered positions distinct") {
    import spark.implicits._
    val docs = Seq(
      (0L, "a b c d e"), // canonical home of both shared windows
      (1L, "a b c d x"), // shares "a b c"@0 and "b c d"@1 → covers pos 0..3
      (2L, "z z z")      // windows unique (single doc) → clean
    ).toDF("doc_id", "text")
    val out = TrainingOps.substringDupStats(spark, docs, n = 3).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getBoolean(4)))).toMap
    assert(out(0L) == ((5L, 0L, 0.0, false)), "min-doc_id copy keeps its text")
    // overlapping windows cover {0,1,2} ∪ {1,2,3} = 4 DISTINCT positions
    assert(out(1L) == ((5L, 4L, 0.8, true)))
    assert(out(2L) == ((3L, 0L, 0.0, false)), "intra-doc repetition is not cross-doc dup")
  }

  test("substringDupStats: exact dup fully covered at default n; flag is ≥20% integer compare") {
    val out = TrainingOps.substringDupStats(spark, docsDf).collect()
      .map(r => r.getLong(0) -> ((r.getLong(2), r.getBoolean(4)))).toMap
    assert(out(0L) == ((0L, false)), "doc 0 is the canonical copy")
    assert(out(4L) == ((9L, true)), "exact dup of doc 0: all 9 tokens covered")
    // doc 1 shares exactly the 8-token prefix window with docs 0/4
    assert(out(1L) == ((8L, true)))
    assert(out(2L) == ((0L, false)) && out(3L) == ((0L, false)))
  }

  test("substringDupStats: hashed windows are row-identical to string windows") {
    val a = TrainingOps.substringDupStats(spark, docsDf).orderBy("doc_id").collect().toSeq
    val b = TrainingOps.substringDupStats(spark, docsDf, hashWindows = true)
      .orderBy("doc_id").collect().toSeq
    assert(a == b)
  }
  test("substringRewrite: canonical keeps text, copies lose covered spans; kept+dup=total; faces agree") {
    import spark.implicits._
    val docs = Seq(
      (0L, "a b c d e"), // canonical home of both shared windows
      (1L, "a b c d x"), // covered pos 0..3 → only "x" survives
      (2L, "z z z")      // no cross-doc window → untouched
    ).toDF("doc_id", "text")
    val out = TrainingOps.substringRewrite(spark, docs, n = 3).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(out(0L) == ((5L, 5L, "a b c d e")))
    assert(out(1L) == ((5L, 1L, "x")))
    assert(out(2L) == ((3L, 3L, "z z z")))
    // audit identity across the whole fixture corpus: n_tok - n_kept ==
    // the stats face's n_dup_tok, per document
    val stats = TrainingOps.substringDupStats(spark, docsDf).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    val rew = TrainingOps.substringRewrite(spark, docsDf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1) - r.getLong(2))).toMap
    assert(rew == stats)
    // hashed-window face is row-identical (incl. the rebuilt text)
    val a = TrainingOps.substringRewrite(spark, docsDf).orderBy("doc_id").collect().toSeq
    val b = TrainingOps.substringRewrite(spark, docsDf, hashWindows = true)
      .orderBy("doc_id").collect().toSeq
    assert(a == b)
  }
  test("bigramStupidBackoff: seen bigram = ln(bc/uc); unseen backs off to 0.4·laplace-unigram") {
    import spark.implicits._
    // train (pmod 5 != 0): "a b", "a b", "b c", "c d" → N=8 tokens,
    // V=4, B(a,b)=2, U(a)=2; holdout doc 0 "a b" scores ln(2/2)=0,
    // holdout doc 5 "a c" has no B(a,c) → ln(0.4·(U(c)+1)/(N+V)) =
    // ln(0.4·3/12) = ln(0.1) → -2.3026 at 4dp
    val docs = Seq(
      (0L, "a b"), (1L, "a b"), (2L, "a b"), (3L, "b c"), (4L, "c d"),
      (5L, "a c")
    ).toDF("doc_id", "text")
    val out = TrainingOps.bigramStupidBackoff(spark, docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2), r.getDouble(3)))).toMap
    assert(out(0L) == ((1L, 0.0, 1.0)), s"got ${out(0L)}")
    assert(out(5L) == ((1L, -2.3026, 0.0)), s"got ${out(5L)}")
    // train doc 4 "c d": B(c,d)=1, U(c)=2 → ln(0.5) = -0.6931
    assert(out(4L) == ((1L, -0.6931, 1.0)), s"got ${out(4L)}")
  }
  test("nbClassify: separable vocab classified correctly on the unseen holdout; argmax ties label-asc") {
    import spark.implicits._
    // two classes with disjoint vocab; doc_ids 0,5,10,15 are holdout
    // (pmod 5 == 0) and must be classified by the model trained on the rest
    val docs = (0L until 20L).map { i =>
      val lang = if (i % 2 == 0) "aa" else "bb"
      val text = if (lang == "aa") "alpha beta gamma alpha" else "delta eps zeta zeta"
      (i, text, lang)
    }.toDF("doc_id", "text", "lang")
    val out = TrainingOps.nbClassify(spark, docs).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getBoolean(4),
        r.getBoolean(5)))
    assert(out.length == 20)
    assert(out.forall(_._4), s"misclassified: ${out.filterNot(_._4).toSeq}")
    assert(out.count(_._5) == 4 && out.filter(_._5).forall(r => r._1 % 5 == 0))
    // a doc whose tokens the model never saw scores both classes on the
    // smoothing floor -> equal quantized scores -> label-ascending tie
    val tie = TrainingOps.nbClassify(spark,
        docs.union(Seq((20L, "unseen tokens only here", "bb")).toDF("doc_id", "text", "lang")))
      .where(col("doc_id") === 20L).collect().head
    assert(tie.getString(2) == "aa", "tie must break label-ascending")
  }

  // --------------------------------------------- DSIR importance weights (T35)
  test("dsirWeights: target-like docs outscore off-target; identical texts tie; empty doc zero") {
    import spark.implicits._
    val docs = docsDf.union(Seq((9L, "", "en", "src2")).toDF(
      "doc_id", "text", "lang", "source").withColumn("n_chars", lit(0L))
      .select(docsDf.columns.map(col): _*))
    val out = TrainingOps.dsirWeights(spark, docs,
        docs.where(col("source") === "src0")).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2), r.getBoolean(3)))).toMap
    assert(out.size == 6)
    // doc 4 is an exact text dup of doc 0 — identical feature bag, identical score
    assert(out(4L)._2 == out(0L)._2)
    // doc 2 IS in the target slice; doc 3 shares no tokens with it
    assert(out(2L)._2 > out(3L)._2)
    assert(out(9L) == ((0L, 0.0, false)), "token-less doc scores 0, not kept")
    // keep is exactly the sign of the quantized score
    out.values.foreach { case (_, w, k) => assert(k == (w > 0)) }
  }

  // ------------------------------------------------ BPE tokenizer faces (T36)
  test("bpePairCounts: frequency-weighted adjacent pairs, count-desc (l,r)-asc") {
    import spark.implicits._
    val docs = Seq((0L, "aa ab"), (1L, "aa")).toDF("doc_id", "text")
    val out = TrainingOps.bpePairCounts(spark, docs).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq
    assert(out == Seq(("a", "a", 2L), ("a", "b", 1L)))
  }

  test("bpeMerges: greedy loop merges consecutive occurrences and stops when dry") {
    import spark.implicits._
    val docs = Seq((0L, "abab cd"), (1L, "abab")).toDF("doc_id", "text")
    val out = TrainingOps.bpeMerges(spark, docs, nMerges = 5).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq
      .sortBy(_._1)
    // iter 1: (a,b) at 2 positions × freq 2 = 4 — and the merge must take
    // BOTH occurrences in a single word (the symbol+separator encoding)
    // iter 2: (ab,ab) = 2; iter 3: (c,d) = 1; iter 4: vocabulary is dry
    assert(out == Seq((1, "a", "b", 4L), (2, "ab", "ab", 2L), (3, "c", "d", 1L)))
  }

  test("bpeTokenCount: merges replay in training order, left-to-right non-overlapping") {
    assert(TrainingOps.bpeTokenCount(Seq(), "abc") == 3L)
    // greedy left-to-right: ababa → [ab][ab]a
    assert(TrainingOps.bpeTokenCount(Seq(("a", "b")), "ababa") == 3L)
    // order matters: merge 2 only exists because merge 1 ran first
    assert(TrainingOps.bpeTokenCount(Seq(("a", "b"), ("ab", "ab")), "ababab") == 2L)
  }

  test("bpeEncodeCounts: hand-computed counts; vocab fold == per-occurrence encode") {
    import spark.implicits._
    val docs = Seq((0L, "abab abab cdcd"), (1L, "abab cdcd cdcd z")).toDF("doc_id", "text")
    // 2 merges: (a,b) at 6 beats (c,d) tie-ascending, then (c,d) at 6 —
    // abab/cdcd each encode to 2 tokens, z to 1
    val out2 = TrainingOps.bpeEncodeCounts(spark, docs, nMerges = 2).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(out2 == Set((0L, 3L, 6L), (1L, 4L, 7L)))
    // 4 merges collapse both words to single whole-word tokens
    val out4 = TrainingOps.bpeEncodeCounts(spark, docs, nMerges = 4).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    assert(out4 == Set((0L, 3L), (1L, 4L)))
    // the vocab-sized fold must equal the naive per-occurrence encode
    val merges = TrainingOps.bpeMerges(spark, docsDf, nMerges = 4).collect()
      .map(r => (r.getString(1), r.getString(2))).toSeq
    val naive = docsDf
      .select(col("doc_id"), explode(split(lower(col("text")), "\\s+")).as("w"))
      .where(col("w") =!= "").collect()
      .groupBy(_.getLong(0))
      .map { case (id, rows) => (id, rows.length.toLong,
        rows.map(r => TrainingOps.bpeTokenCount(merges, r.getString(1))).sum) }
      .toSet
    val got = TrainingOps.bpeEncodeCounts(spark, docsDf, nMerges = 4).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == naive)
  }

  test("ngramContainmentPairs: full embedding scores 1.0 asymmetrically; disjoint pairs absent") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b c d e"),                  // 3 tri-shingles, all inside doc 2
      (2L, "a b c d e f g h i j"),        // 8 tri-shingles
      (3L, "x y z w v u t")).toDF("doc_id", "text")
    val got = graft.queries.TrainingOps.ngramContainmentPairs(spark, docs).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> ((r.getDouble(2), r.getDouble(3)))).toMap
    assert(got == Map((1L, 2L) -> ((1.0, 0.375)))) // c(A,B)=3/3, c(B,A)=3/8; doc 3 disjoint
    // the same pair's Jaccard is only 3/8 — containment sees what Jaccard misses
    val j = graft.queries.TrainingOps.ngramJaccardPairs(spark, docs, minJaccard = 0.0)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(j((1L, 2L)) == 0.375)
  }

  // ---------------------------------------------- BM25 retrieval (T45)

  /** Independent plain-Scala BM25 with the operator's exact expression
    * order (term scores summed left-to-right, 4dp floor-half-up). */
  private def refBm25(docs: Seq[(Long, String)], terms: Seq[String],
      k1: Double = 1.2, b: Double = 0.75): Map[Long, (Long, Long, Double)] = {
    val toks = docs.map { case (id, t) =>
      id -> t.toLowerCase.split("\\s+").filter(_.nonEmpty).toSeq }
    val n = docs.size.toLong
    val avgdl = toks.map(_._2.length.toLong).sum.toDouble / n
    val dfs = terms.map(t => toks.count(_._2.contains(t)).toLong)
    toks.flatMap { case (id, ws) =>
      val dl = ws.length.toLong
      val tfs = terms.map(t => ws.count(_ == t).toLong)
      val nHit = tfs.count(_ > 0).toLong
      if (nHit == 0) None
      else {
        val score = terms.indices.map { i =>
          if (tfs(i) == 0) 0.0
          else {
            val idf = math.log(1.0 + (n - dfs(i) + 0.5) / (dfs(i) + 0.5))
            idf * (tfs(i).toDouble * (k1 + 1.0) /
              (tfs(i).toDouble + k1 * ((1.0 - b) + b * dl.toDouble / avgdl)))
          }
        }.reduce(_ + _)
        Some(id -> ((dl, nHit, math.floor(score * 1e4 + 0.5) / 1e4)))
      }
    }.toMap
  }

  test("bm25TopK matches an independent reference; no-hit docs excluded; k truncates") {
    import spark.implicits._
    val rows = Seq(
      (0L, "the quick brown fox jumps over the lazy dog"),
      (1L, "the quick brown fox jumps over the lazy cat"),
      (2L, "el gato y el perro de la casa que ladra"),
      (3L, "completely unrelated words here banana xylophone"),
      (4L, "the quick brown fox jumps over the lazy dog"))
    val docs = rows.toDF("doc_id", "text")
    val terms = Seq("fox", "banana")
    val exp = refBm25(rows, terms)
    val got = graft.queries.RetrievalOps.bm25TopK(docs, terms, k = 20).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(got == exp)             // doc 2 matches nothing → absent from both
    assert(!got.contains(2L))
    // banana is the rarer term (df 1 vs 3) → doc 3 must out-score the fox docs
    assert(got(3L)._3 > got(0L)._3)
    // k truncation keeps the highest quantized scores, doc_id tie-break
    val top2 = graft.queries.RetrievalOps.bm25TopK(docs, terms, k = 2).collect()
      .map(_.getLong(0)).toSeq
    val order = exp.toSeq.sortBy { case (id, (_, _, s)) => (-s, id) }.map(_._1)
    assert(top2 == order.take(2))
  }

  // ------------------------------------------------- PageRank (T46)

  /** Independent integer PageRank with the operator's exact arithmetic;
    * `seed` restricts the start/teleport mass (uniform = every node). */
  private def refPageRank(edges: Seq[(String, String)], iters: Int,
      seed: String => Boolean = _ => true): Map[String, Long] = {
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct
    val n = nodes.count(seed)
    val od = edges.groupBy(_._1).map { case (k, v) => k -> v.size.toLong }
    val base = math.floor(1.5e8 / n).toLong
    var r = nodes.map(nd => nd -> (if (seed(nd)) math.floor(1e9 / n).toLong else 0L)).toMap
    for (_ <- 0 until iters) {
      val sh = r.map { case (k, v) => k -> math.floor(v.toDouble / od(k)).toLong }
      val c = edges.groupBy(_._2).map { case (d, es) => d -> es.map(e => sh(e._1)).sum }
      r = nodes.map(nd => nd ->
        ((if (seed(nd)) base else 0L) +
          math.floor(c.getOrElse(nd, 0L).toDouble * 85.0 / 100.0).toLong)).toMap
    }
    r
  }

  test("pageRank matches the integer reference on a path graph; clique stays uniform") {
    import spark.implicits._
    // undirected path a-b-c, symmetrized distinct edges
    val path = Seq(("a", "b"), ("b", "a"), ("b", "c"), ("c", "b"))
    val got = graft.queries.GraphOps.pageRank(spark, path.toDF("src", "dst"), iters = 4)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == refPageRank(path, 4))
    assert(got("b") > got("a") && got("a") == got("c")) // the hub wins, leaves tie
    // 3-clique: regular graph → uniform ranks every round
    val k3 = for { x <- Seq("x", "y", "z"); y <- Seq("x", "y", "z") if x != y } yield (x, y)
    val kr = graft.queries.GraphOps.pageRank(spark, k3.toDF("src", "dst"), iters = 4)
      .collect().map(_.getLong(1)).toSet
    assert(kr.size == 1)
    assert(kr == refPageRank(k3, 4).values.toSet)
    // empty graph → empty result, no crash
    assert(graft.queries.GraphOps.pageRank(spark,
      Seq.empty[(String, String)].toDF("src", "dst")).count() == 0L)
  }

  test("pageRankSeeded: seed-gated teleport matches the reference; seedless components drain to 0") {
    import spark.implicits._
    // path a-b plus a disjoint pair x-y; seed = names starting with 'a'
    val edges = Seq(("a", "b"), ("b", "a"), ("x", "y"), ("y", "x"))
    val got = graft.queries.GraphOps.pageRankSeeded(spark,
        edges.toDF("src", "dst"), col("node").startsWith("a"), iters = 4)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == refPageRank(edges, 4, _.startsWith("a")))
    assert(got("x") == 0L && got("y") == 0L) // no seed in the component → no mass
    assert(got("a") > 0L && got("b") > 0L)
    // no seed node in the graph → loud failure, not a silent zero table
    val ex = intercept[IllegalArgumentException] {
      graft.queries.GraphOps.pageRankSeeded(spark,
        edges.toDF("src", "dst"), col("node").startsWith("zzz"))
    }
    assert(ex.getMessage.contains("no seed node"))
  }

  test("triangleStats: triangle+pendant hand case; K4 counts; hub wedge orientation") {
    import spark.implicits._
    def sym(pairs: Seq[(String, String)]) =
      (pairs ++ pairs.map(_.swap)).toDF("src", "dst")
    // triangle a-b-c with pendant d on c
    val g1 = graft.queries.GraphOps.triangleStats(spark,
        sym(Seq(("a", "b"), ("a", "c"), ("b", "c"), ("c", "d"))))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(g1 == Map("a" -> ((2L, 1L)), "b" -> ((2L, 1L)),
      "c" -> ((3L, 1L)), "d" -> ((1L, 0L))))
    // K4: every node degree 3, and every node sits in C(3,2) = 3 triangles
    val k4 = for { x <- Seq("p", "q", "r", "s"); y <- Seq("p", "q", "r", "s")
      if x < y } yield (x, y)
    val g2 = graft.queries.GraphOps.triangleStats(spark, sym(k4))
      .collect().map(r => (r.getLong(1), r.getLong(2))).toSet
    assert(g2 == Set((3L, 3L)))
    // star (no triangles): hub degree n, all triangle counts 0 — the
    // degree-ordered orientation keeps the hub wedge-free
    val star = (0 until 6).map(i => ("hub", s"leaf$i"))
    val g3 = graft.queries.GraphOps.triangleStats(spark, sym(star))
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(g3.values.forall(_ == 0L))
    assert(g3.size == 7)
  }

  test("pageRankWeighted: equal weights are bit-identical to uniform; heavy edges pull mass") {
    import spark.implicits._
    val path = Seq(("a", "b"), ("b", "a"), ("b", "c"), ("c", "b"))
    val uni = graft.queries.GraphOps.pageRank(spark, path.toDF("src", "dst"), iters = 4)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val w1 = graft.queries.GraphOps.pageRankWeighted(spark,
        path.map { case (s, d) => (s, d, 1L) }.toDF("src", "dst", "w"), iters = 4)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(w1 == uni) // ⌊r·1/W⌋ == ⌊r/od⌋ exactly
    // b splits 3:1 toward a — a must out-rank c (uniform ties them)
    val wEdges = Seq(("a", "b", 3L), ("b", "a", 3L), ("b", "c", 1L), ("c", "b", 1L))
    val w2 = graft.queries.GraphOps.pageRankWeighted(spark,
        wEdges.toDF("src", "dst", "w"), iters = 4)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(w2("a") > w2("c"))
    assert(uni("a") == uni("c"))
    // independent exact reference with per-edge floored shares
    val nodes = Seq("a", "b", "c"); val n = nodes.size
    val wt = wEdges.groupBy(_._1).map { case (k, es) => k -> es.map(_._3).sum }
    val base = math.floor(1.5e8 / n).toLong
    var r = nodes.map(_ -> math.floor(1e9 / n).toLong).toMap
    for (_ <- 0 until 4) {
      val c = wEdges.groupBy(_._2).map { case (d, es) =>
        d -> es.map(e => math.floor(r(e._1).toDouble * e._3 / wt(e._1)).toLong).sum }
      r = nodes.map(nd => nd ->
        (base + math.floor(c.getOrElse(nd, 0L).toDouble * 85.0 / 100.0).toLong)).toMap
    }
    assert(w2 == r)
  }

  // -------------------------------------- snapshot diff (T48)

  test("snapshotDiff labels added/removed/changed/unchanged; source coalesces to the surviving side") {
    import spark.implicits._
    val old = Seq((1L, "one", "s1"), (2L, "two", "s2"), (3L, "three", "s3"))
      .toDF("doc_id", "text", "source")
    val neu = Seq((2L, "two", "s2"), (3L, "THREE", "s3"), (4L, "four", "s4"))
      .toDF("doc_id", "text", "source")
    val got = TrainingOps.snapshotDiff(spark, old, neu).collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getString(2)))).toMap
    assert(got == Map(
      1L -> (("s1", "removed")), 2L -> (("s2", "unchanged")),
      3L -> (("s3", "changed")), 4L -> (("s4", "added"))))
    // identical snapshots → all unchanged
    val same = TrainingOps.snapshotDiff(spark, old, old).collect()
      .map(_.getString(2)).toSet
    assert(same == Set("unchanged"))
    // NULL text must not masquerade as row absence: present-in-both with
    // NULL text on both sides is unchanged, NULL-vs-text is changed, and
    // an old-only NULL-text doc is removed (presence comes from a marker
    // column, not the hash)
    val oN = Seq((1L, null.asInstanceOf[String], "s1"), (2L, null.asInstanceOf[String], "s2"),
      (3L, "t", "s3")).toDF("doc_id", "text", "source")
    val nN = Seq((2L, null.asInstanceOf[String], "s2"), (3L, null.asInstanceOf[String], "s3"))
      .toDF("doc_id", "text", "source")
    val gotN = TrainingOps.snapshotDiff(spark, oN, nN).collect()
      .map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(gotN == Map(1L -> "removed", 2L -> "unchanged", 3L -> "changed"))
  }

  test("confidenceAuc equals the brute-force pairwise Mann-Whitney on the holdout") {
    import spark.implicits._
    // 40 docs, two separable languages, a few deliberately confusable
    val rows = (0L until 40L).map { i =>
      val (txt, lang) =
        if (i % 2 == 0) ("the quick brown fox and the lazy dog", "en")
        else ("el gato y el perro de la casa", "es")
      // make some holdout docs hard: mixed-language text keeps its label
      if (i % 10 == 5) ("the fox y el gato of la casa", "es") match {
        case (t, l) => (i, t, l, s"src${i % 3}")
      }
      else (i, txt, lang, s"src${i % 3}")
    }
    val docs = rows.toDF("doc_id", "text", "lang", "source")
    val h = TrainingOps.nbClassify(spark, docs).where(col("holdout"))
      .select(col("score"), col("correct")).collect()
      .map(r => (r.getDouble(0), r.getBoolean(1)))
    val pos = h.filter(_._2).map(_._1); val neg = h.filterNot(_._2).map(_._1)
    val got = TrainingOps.confidenceAuc(spark, docs).collect().head
    assert(got.getLong(0) == pos.length.toLong && got.getLong(1) == neg.length.toLong)
    if (pos.nonEmpty && neg.nonEmpty) {
      val num2 = pos.map(p => 2L * neg.count(p > _) + neg.count(p == _)).map(_.toLong).sum
      val exp = math.floor(num2.toDouble / (2L * pos.length * neg.length) * 1e6 + 0.5) / 1e6
      assert(got.getDouble(2) == exp)
    }
    // degenerate slice (single class) → null AUC, not a crash or a fake 0.5
    val easy = (0L until 10L).map(i =>
      (i, if (i % 2 == 0) "the the the" else "el el el",
        if (i % 2 == 0) "en" else "es", "s")).toDF("doc_id", "text", "lang", "source")
    val deg = TrainingOps.confidenceAuc(spark, easy).collect().head
    assert(deg.getLong(0) + deg.getLong(1) == 2L) // ids 0,5 are held out
    assert(deg.getLong(1) == 0L && deg.isNullAt(2)) // perfectly separable → no negatives → null
  }

  // -------------------------------------- source divergence (T47)

  test("sourceDivergence: single source == corpus → zero; symmetric split ties; JS bounded") {
    import spark.implicits._
    // one source IS the corpus: smoothed p == q bucket-for-bucket → KL = JS = 0
    val solo = Seq((0L, "alpha beta gamma alpha", "en", "srcA"),
      (1L, "beta gamma delta", "en", "srcA")).toDF("doc_id", "text", "lang", "source")
    val s1 = TrainingOps.sourceDivergence(spark, solo).collect()
    assert(s1.length == 1)
    assert(s1.head.getLong(1) == 7L)
    assert(s1.head.getDouble(2) == 0.0 && s1.head.getDouble(3) == 0.0)
    // equal-mass disjoint sources diverge from the mixture symmetrically
    val pair = Seq((0L, "aa aa aa aa", "en", "srcA"),
      (1L, "bb bb bb bb", "en", "srcB")).toDF("doc_id", "text", "lang", "source")
    val s2 = TrainingOps.sourceDivergence(spark, pair).collect()
      .map(r => r.getString(0) -> ((r.getDouble(2), r.getDouble(3)))).toMap
    assert(s2("srcA") == s2("srcB"))
    assert(s2("srcA")._1 > 0.0)
    // a dominant source sits closer to the mixture than a tiny divergent one
    val skew = Seq((0L, "cc cc cc cc cc cc cc cc cc cc cc cc cc cc cc cc", "en", "srcBig"),
      (1L, "dd", "en", "srcTiny")).toDF("doc_id", "text", "lang", "source")
    val s3 = TrainingOps.sourceDivergence(spark, skew).collect()
      .map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(s3("srcBig") < s3("srcTiny"))
    // JS is bounded by ln 2 on every row
    (s1.map(_.getDouble(3)) ++ s2.values.map(_._2)).foreach { js =>
      assert(js >= 0.0 && js <= 0.6932)
    }
  }
}
