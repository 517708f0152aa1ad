package graft.tools

import java.nio.file.Files

import org.apache.spark.sql.{SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.{Doc, Spec}
import graft.gen.CorpusWriter
import graft.kernel.Extractor

/** Pinpoints the serial fraction of the extraction job at high core counts:
  * kernel+noop vs plain write vs partitioned dynamic-overwrite write vs
  * lineage read-back. Dev tool. */
object Probe2 {
  private def time[T](label: String, body: => T): T = {
    val t0 = System.nanoTime()
    val r = body
    println(f"PROBE2 $label: ${(System.nanoTime() - t0) / 1e9}%.2fs")
    r
  }

  def main(args: Array[String]): Unit = {
    val nDocs = sys.env.getOrElse("PROBE_DOCS", "100000").toLong
    val parts = sys.env.getOrElse("PROBE_PARTS", "128").toInt
    val cpus = sys.env.getOrElse("PROBE_CPUS", "32").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.sources.partitionOverwriteMode", "dynamic")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val base = Files.createTempDirectory("probe2").toString
    CorpusWriter.write(spark, nDocs, s"$base/corpus", parts)

    def pipeline = spark.read.parquet(s"$base/corpus")
      .select(col("doc_id"), col("spans"),
        pmod(hash(col("doc_id"), lit(Spec.Salt)), lit(parts)).cast("int").as("pid"))
      .repartition(parts, col("doc_id"), lit(Spec.Salt))
      .as[(String, Seq[graft.core.Span], Int)]
      .mapPartitions(_.map { case (id, spans, pid) =>
        val d = Extractor.extractDoc(Doc(id, spans))
        (pid, d.doc_id, d.spans)
      })
      .toDF("pid", "doc_id", "spans")

    // warm everything twice
    (1 to 2).foreach(i => time(s"warm$i noop", pipeline.write.mode("overwrite").format("noop").save()))

    time("A kernel+noop        ", pipeline.write.mode("overwrite").format("noop").save())
    time("B plain parquet write", pipeline.write.mode(SaveMode.Overwrite).parquet(s"$base/plain"))
    time("C partitionBy(pid)   ", pipeline.write.mode(SaveMode.Overwrite)
      .partitionBy("pid").parquet(s"$base/bypid"))
    time("D read-back lineage-shaped agg over C",
      spark.read.parquet(s"$base/bypid").groupBy("pid").count().collect())
    time("E read corpus only   ", spark.read.parquet(s"$base/corpus")
      .select(col("doc_id"), col("spans")).write.mode("overwrite").format("noop").save())
    time("F gen-equivalent kernel, no read",
      spark.range(0, nDocs, 1, parts)
        .map(i => Extractor.extractDoc(graft.gen.SpanGen.genDoc(graft.gen.SpanGen.docId(i))).spans.length.toLong)
        .reduce(_ + _))
    spark.stop()
  }
}
