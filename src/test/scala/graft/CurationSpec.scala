package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.core.Doc
import graft.gen.SpanGen
import graft.job.{CurationJob, ExtractJob}

/** End-to-end curation funnel: extract → quality gate → dedup, with
  * injected duplicates to prove deterministic survivor selection. */
class CurationSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def beforeAll(): Unit = spark.sparkContext.setLogLevel("ERROR")
  override def afterAll(): Unit = spark.stop()

  test("funnel is monotone; duplicates collapse to the smallest doc_id") {
    import spark.implicits._
    val base = Files.createTempDirectory("curation").toString
    val originals = (0L until 200L).map(i => SpanGen.genDoc(SpanGen.docId(i)))
    // two byte-identical clones of doc 0 under larger ids
    val docs = originals ++ Seq(
      Doc("x_clone1", originals.head.spans),
      Doc("x_clone2", originals.head.spans))
    spark.createDataset(docs).write.mode("overwrite").parquet(s"$base/in")

    ExtractJob.run(spark, s"$base/in", s"$base/ex", "cur", 8)
    val f = CurationJob.run(spark, s"$base/ex", s"$base/out")

    assert(f.docsIn == 202)
    assert(f.docsIn >= f.extracted && f.extracted >= f.qualityPass &&
      f.qualityPass >= f.curated)
    assert(f.curated < f.qualityPass, "clones should have been deduped")

    val curated = spark.read.parquet(s"$base/out/curated")
      .as[(String, String, Long)].collect().map(r => r._1 -> r._3).toMap
    assert(!curated.contains("x_clone1") && !curated.contains("x_clone2"))
    assert(curated.get(SpanGen.docId(0)).forall(_ == 3L),
      s"doc 0 should survive with 3 copies if it passed quality: ${curated.get(SpanGen.docId(0))}")
    // copies conserve the gated population
    assert(curated.values.sum == f.qualityPass)
  }

  test("single-pass funnelCounts equals the stage-by-stage pipeline counts") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val spans = spark.range(0L, 150L)
      .map(i => graft.kernel.Extractor.extractDoc(SpanGen.genDoc(SpanGen.docId(i)))).toDF()
    val texts = CurationJob.docText(spans)
    val one = CurationJob.funnelCounts(texts).head()
    val gated = CurationJob.qualityGate(texts)
    assert(one.getLong(0) == texts.count(), "docs_in")
    assert(one.getLong(1) == gated.count(), "quality_pass")
    assert(one.getLong(2) == CurationJob.dedup(gated).count(), "curated")
    assert(one.getLong(3) ==
      CurationJob.dedup(gated).agg(sum(col("copies"))).head().getLong(0), "copies_sum")
  }
}
