package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.core.Doc
import graft.gen.SpanGen
import graft.kernel.Extractor
import graft.queries.TrainingOps
import graft.streaming.{StreamAdmit, StreamExtract}

/** Streaming surface tests: batch/stream kernel parity, exactly-once
  * file-stream resume, watermarked windowed aggregation. */
class StreamingSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def beforeAll(): Unit = spark.sparkContext.setLogLevel("ERROR")
  override def afterAll(): Unit = spark.stop()

  test("stream kernel output == batch kernel output (MemoryStream)") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    val docs = (0L until 40L).map(i => SpanGen.genDoc(SpanGen.docId(i)))

    val mem = MemoryStream[Doc]
    val q = StreamExtract.extract(mem.toDS())
      .writeStream.format("memory").queryName("stream_out").outputMode("append").start()
    mem.addData(docs.take(20): _*)
    q.processAllAvailable()
    mem.addData(docs.drop(20): _*)
    q.processAllAvailable()
    q.stop()

    val streamed = spark.table("stream_out").as[Doc].collect()
      .map(d => d.doc_id -> d.spans).toMap
    val batch = docs.map(d => { val e = Extractor.extractDoc(d); e.doc_id -> e.spans }).toMap
    assert(streamed == batch)
  }

  test("file-stream extraction is exactly-once across restart (checkpointed)") {
    import spark.implicits._
    val base = Files.createTempDirectory("streamspec").toString
    val in = s"$base/in"; val out = s"$base/out"; val ck = s"$base/ck"

    spark.range(0L, 30L).map(i => SpanGen.genDoc(SpanGen.docId(i)))
      .write.mode("append").parquet(in)
    StreamExtract.run(spark, in, out, ck).awaitTermination()
    val n1 = spark.read.parquet(out).count()
    assert(n1 == 30L)

    // second wave of files, same checkpoint → only the delta is processed
    spark.range(30L, 50L).map(i => SpanGen.genDoc(SpanGen.docId(i)))
      .write.mode("append").parquet(in)
    StreamExtract.run(spark, in, out, ck).awaitTermination()

    val all = spark.read.parquet(out).as[Doc].collect()
    assert(all.length == 50L, "each doc exactly once across restarts")
    assert(all.map(_.doc_id).distinct.length == 50)
    // parity with batch kernel
    val got = all.map(d => d.doc_id -> d.spans).toMap
    (0L until 50L).foreach { i =>
      val e = Extractor.extractDoc(SpanGen.genDoc(SpanGen.docId(i)))
      assert(got(e.doc_id) == e.spans, s"doc ${e.doc_id}")
    }
  }

  test("watermarked windowed span rates drop late data, emit closed windows") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    val mem = MemoryStream[(Timestamp, String)]
    val rates = StreamExtract.spanRates(
      mem.toDF().toDF("event_time", "kind"), watermark = "10 seconds", window_ = "1 minute")
    val q = rates.writeStream.format("memory").queryName("rates").outputMode("append").start()

    def ts(s: Long) = new Timestamp(s * 1000L)
    // window [0,60): 3 text + 1 media
    mem.addData((ts(5), "text"), (ts(20), "text"), (ts(30), "media"), (ts(50), "text"))
    q.processAllAvailable()
    // advance event time far past watermark so the first window closes
    mem.addData((ts(200), "text"))
    q.processAllAvailable()
    // this late row is > 10s behind the watermark (190s) → dropped
    mem.addData((ts(40), "text"))
    q.processAllAvailable()
    // close everything out
    mem.addData((ts(400), "media"))
    q.processAllAvailable()
    q.stop()

    val rows = spark.table("rates").collect()
      .map(r => (r.getTimestamp(0).getTime / 1000, r.getString(1), r.getLong(2))).toSet
    assert(rows.contains((0L, "text", 3L)), s"rows=$rows")   // late (40,"text") NOT counted
    assert(rows.contains((0L, "media", 1L)))
    assert(rows.contains((180L, "text", 1L)))
  }

  test("streaming near-dup matches vs static store == batch pairs (stream-static, stateless)") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    // store: 1 is a near-copy of what will stream as 0; 2 unrelated
    val store = Seq(
      (1L, "alpha beta gamma delta eps zeta eta theta iota kappa"),
      (2L, "one two three four five six seven eight nine ten")
    ).toDF("doc_id", "text")
    val storeSigs = TrainingOps.minhashSignatures(spark, store)
    val banded = StreamAdmit.bandedStore(spark, storeSigs)
    val mem = MemoryStream[(Long, String)]
    val q = StreamAdmit.matchesAgainstStore(spark,
        mem.toDS().toDF("doc_id", "text"), banded, minSim = 0.05)
      .writeStream.format("memory").queryName("admit_matches")
      .outputMode("append").start()
    mem.addData((0L, "alpha beta gamma delta eps zeta eta theta iota kappa"))
    mem.addData((3L, "unrelated words only in this new document here now"))
    q.processAllAvailable()
    q.stop()
    // streaming emits per-band multiplicity; the batch face distincts —
    // compare as sets
    val streamed = spark.table("admit_matches").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val batch = TrainingOps.minhashPairsAgainstStore(spark,
        TrainingOps.minhashSignatures(spark, Seq(
          (0L, "alpha beta gamma delta eps zeta eta theta iota kappa"),
          (3L, "unrelated words only in this new document here now")
        ).toDF("doc_id", "text")),
        storeSigs, minSim = 0.05)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(streamed == batch, s"stream=$streamed batch=$batch")
    assert(streamed.exists(p => p._1 == 0L && p._2 == 1L && p._3 == 1.0))
    assert(!streamed.exists(_._1 == 3L))
  }

  test("foreachBatch admission across micro-batches == one-shot batch admission") {
    import spark.implicits._
    val base = Files.createTempDirectory("streamadmit").toString
    val in = s"$base/in"; val out = s"$base/out"; val ck = s"$base/ck"
    val store = Seq(
      (1L, "alpha beta gamma delta eps zeta eta theta iota kappa"),
      (2L, "one two three four five six seven eight nine ten")
    ).toDF("doc_id", "text")
    val storeSigs = TrainingOps.minhashSignatures(spark, store)
    val newDocs = Seq(
      (10L, "alpha beta gamma delta eps zeta eta theta iota kappa"), // dup of 1
      (11L, "completely fresh content that matches nothing stored"),
      (12L, "one two three four five six seven eight nine ten"),     // dup of 2
      (13L, "another brand new document with unique words entirely")
    )
    // two waves → two micro-batches through the same checkpoint
    newDocs.take(2).toDF("doc_id", "text").write.mode("append").parquet(in)
    StreamAdmit.admitStream(spark,
      spark.readStream.schema("doc_id LONG, text STRING").parquet(in),
      storeSigs, out, ck, minSim = 0.05).awaitTermination()
    newDocs.drop(2).toDF("doc_id", "text").write.mode("append").parquet(in)
    StreamAdmit.admitStream(spark,
      spark.readStream.schema("doc_id LONG, text STRING").parquet(in),
      storeSigs, out, ck, minSim = 0.05).awaitTermination()

    val streamed = spark.read.parquet(out).collect().map(_.getLong(0)).toSet
    val batch = TrainingOps.incrementalAdmit(spark,
        newDocs.toDF("doc_id", "text"), storeSigs, minSim = 0.05)
      .collect().map(_.getLong(0)).toSet
    assert(streamed == batch && streamed == Set(11L, 13L),
      s"stream=$streamed batch=$batch")
  }
}
