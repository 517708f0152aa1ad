package graft.tools

import org.apache.spark.sql.SparkSession

import graft.core.{Doc, Span}
import graft.gen.SpanGen
import graft.golden.GoldenExtractor
import graft.kernel.Extractor

/** Dev drive: exercises the extraction kernel end-to-end through the Spark
  * Dataset surface (the way ExtractJob consumes it), with malformed-input
  * probes. Not part of the driver contract. */
object Drive {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val docs = spark.range(0, 200).map(i => SpanGen.genDoc(SpanGen.docId(i)))
    val out = docs.mapPartitions(_.map(Extractor.extractDoc)).collect()
    println(s"DRIVE docs=${out.length} totalSpans=${out.map(_.spans.size).sum}")
    val sample = out.find(_.doc_id == "d000000003").get
    println("DRIVE sample kinds: " + sample.spans.take(8).map(_.kind).mkString(","))
    println("DRIVE sample text0: " + sample.spans.headOption.map(_.text.take(120)))

    val golden = (0L until 200L).map { i =>
      val d = GoldenExtractor.extract(SpanGen.genDoc(SpanGen.docId(i)))
      d.doc_id -> d.spans
    }.toMap
    val mismatches = out.count(d => golden(d.doc_id) != d.spans)
    println(s"DRIVE mismatches=$mismatches")

    val weird = Seq(
      Doc("w1", Vector(Span("pdf_block", null, null, 0), Span("alien_kind", "x", "", 1))),
      Doc("w2", Vector.empty))
    val wout = spark.createDataset(weird).mapPartitions(_.map(Extractor.extractDoc))
      .collect().sortBy(_.doc_id)
    println("DRIVE weird: " + wout.map(d => d.doc_id + "=" + d.spans.size).mkString(" "))
    println("DRIVE w1 spans: " + wout(0).spans.mkString(";"))
    spark.stop()
  }
}
