package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Fnv1a64Expr
import graft.streaming.StatefulDedup

/** Native-expression + stateful-streaming coverage. */
class FunctionsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def beforeAll(): Unit = spark.sparkContext.setLogLevel("ERROR")
  override def afterAll(): Unit = spark.stop()

  test("fnv1a64 native expression: codegen path matches reference impl and TrainingOps") {
    import spark.implicits._
    Fnv1a64Expr.register(spark)
    val inputs = Seq("", "a", "hello world", "ünïcode ∆", "the quick brown fox")
    val got = inputs.toDF("s").selectExpr("s", "fnv1a64(s) AS h")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    inputs.foreach { s =>
      assert(got(s) == Fnv1a64Expr.hash(s), s"codegen vs reference for '$s'")
    }
    assert(got("hello world") == Fnv1a64Expr.hash("hello world"))
  }

  test("fnv1a64 usable from spark.sql with nulls and grouping") {
    import spark.implicits._
    Fnv1a64Expr.register(spark)
    Seq(Some("x"), None, Some("x"), Some("y")).toDF("s").createOrReplaceTempView("fnv_in")
    val rows = spark.sql(
      "SELECT fnv1a64(s) AS h, count(*) AS n FROM fnv_in GROUP BY 1 ORDER BY n DESC, h")
      .collect()
    assert(rows.length == 3) // x (2), null, y
    assert(rows.head.getLong(1) == 2)
    assert(rows.exists(_.isNullAt(0))) // null in → null out
  }

  test("GraftExtensions injects fnv1a64 into a SparkSessionExtensions instance") {
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new graft.functions.GraftExtensions().apply(ext)
    // registerFunctions is private[sql]; invoke it the way session build does
    val registry = org.apache.spark.sql.catalyst.analysis.FunctionRegistry.builtin.clone()
    val m = ext.getClass.getMethod("registerFunctions",
      classOf[org.apache.spark.sql.catalyst.analysis.FunctionRegistry])
    m.invoke(ext, registry)
    assert(registry.functionExists(org.apache.spark.sql.catalyst.FunctionIdentifier("fnv1a64")))
  }

  test("stateful streaming dedup: first-seen wins across micro-batches") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    val mem = MemoryStream[StatefulDedup.HashedDoc]
    val out = StatefulDedup.firstSeen(spark, mem.toDS())
    val q = out.writeStream.format("memory").queryName("dedup_out")
      .outputMode("append").start()

    mem.addData(
      StatefulDedup.HashedDoc("d2", 100L), StatefulDedup.HashedDoc("d1", 100L),
      StatefulDedup.HashedDoc("d3", 200L))
    q.processAllAvailable()
    mem.addData(
      StatefulDedup.HashedDoc("d4", 100L), // dup of batch-1 hash
      StatefulDedup.HashedDoc("d5", 300L))
    q.processAllAvailable()
    q.stop()

    val got = spark.table("dedup_out").as[StatefulDedup.HashedDoc].collect()
      .map(h => h.h -> h.doc_id).toMap
    assert(got == Map(100L -> "d1", 200L -> "d3", 300L -> "d5"))
  }
}
