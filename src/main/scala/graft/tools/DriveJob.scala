package graft.tools

import java.nio.file.Files

import org.apache.spark.sql.SparkSession

import graft.gen.{CorpusWriter, SpanGen}
import graft.golden.GoldenExtractor
import graft.job.{Checkpoint, ExtractJob}

/** Dev drive of the full ExtractJob: corpus → job → lineage/manifests →
  * golden parity → resume. Prints DRIVEJOB lines. */
object DriveJob {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val base = Files.createTempDirectory("drivejob").toString
    val in = s"$base/in"; val out = s"$base/out"
    val nDocs = 3000L; val p = 16

    CorpusWriter.write(spark, nDocs, in, 8)
    println(s"DRIVEJOB corpus=${spark.read.parquet(in).count()}")

    val rep = ExtractJob.run(spark, in, out, "run1", p)
    println(s"DRIVEJOB report in=${rep.docsIn} out=${rep.docsOut} quar=${rep.quarantined} " +
      s"pids=${rep.processedPids.size} skipped=${rep.skippedPids.size}")

    val lineage = ExtractJob.readLineage(spark, out).collect().sortBy(_.partition_id)
    println(s"DRIVEJOB lineage rows=${lineage.length} sumIn=${lineage.map(_.docs_in).sum} " +
      s"sumOut=${lineage.map(_.docs_out).sum}")
    println(s"DRIVEJOB manifests=${Checkpoint.completedPids(out).size}")

    // physical placement diagnostics: pids per task partition
    val dist = spark.read.parquet(in)
      .selectExpr(s"pmod(hash(doc_id, ${graft.core.Spec.Salt}), $p) as pid")
      .repartition(p, org.apache.spark.sql.functions.col("doc_id"),
        org.apache.spark.sql.functions.lit(graft.core.Spec.Salt))
      .mapPartitions { it =>
        val pids = it.map(_.getInt(0)).toSet
        Iterator.single((org.apache.spark.TaskContext.getPartitionId(), pids.toSeq.sorted))
      }.collect().sortBy(_._1)
    val identity = dist.forall { case (phys, pids) => pids.forall(_ == phys) }
    println(s"DRIVEJOB identityMapping=$identity maxPidsPerTask=${dist.map(_._2.size).max}")

    // golden parity on a sample
    val got = ExtractJob.readSpans(spark, out)
      .filter($"doc_id" < SpanGen.docId(300)).collect().map(d => d.doc_id -> d.spans).toMap
    var bad = 0
    (0L until 300L).foreach { i =>
      val g = GoldenExtractor.extract(SpanGen.genDoc(SpanGen.docId(i)))
      if (got.get(g.doc_id).isEmpty || got(g.doc_id) != g.spans) bad += 1
    }
    println(s"DRIVEJOB goldenMismatches=$bad")

    // resume: fresh output, run half the waves, then resume; compare
    val out2 = s"$base/out2"
    val r1 = ExtractJob.run(spark, in, out2, "runA", p, waveSize = 4, maxWaves = 2)
    println(s"DRIVEJOB partial pids=${r1.processedPids.size} manifests=${Checkpoint.completedPids(out2).size}")
    val r2 = ExtractJob.run(spark, in, out2, "runB", p, resume = true, waveSize = 4)
    println(s"DRIVEJOB resumed newPids=${r2.processedPids.size} skipped=${r2.skippedPids.size}")
    val full = ExtractJob.readSpans(spark, out).collect().map(d => d.doc_id -> d.spans).toMap
    val resumed = ExtractJob.readSpans(spark, out2).collect().map(d => d.doc_id -> d.spans).toMap
    println(s"DRIVEJOB resumeEqual=${full == resumed} docs=${resumed.size}")

    spark.stop()
  }
}
