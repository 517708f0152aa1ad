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

  test("cosine_sim native expression == HOF formulation == kernel loop, bit for bit") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    import graft.functions.CosineSimExpr
    CosineSimExpr.register(spark)
    // deterministic vectors incl. length mismatch, empty, negatives
    val vecs: Seq[(Array[Float], Array[Float])] = Seq(
      (Array(1f, 2f, 3f), Array(4f, 5f, 6f)),
      (Array(0.1f, -0.2f, 0.3f, 0.4f), Array(-0.4f, 0.3f, 0.2f)), // len mismatch
      (Array.tabulate(64)(i => math.sin(i * 0.7).toFloat),
        Array.tabulate(64)(i => math.cos(i * 1.3).toFloat)),
      (Array(1e-8f, 1e8f), Array(1e8f, 1e-8f)))
    val df = vecs.toDF("a", "b")
    val rows = df.select(
        CosineSimExpr(col("a"), col("b")).as("native"),
        graft.queries.TrainingOps.cosineHof(col("a"), col("b")).as("hof"))
      .collect()
    rows.zip(vecs).foreach { case (r, (a, b)) =>
      val native = r.getDouble(0)
      val kernel = graft.queries.TrainingOps.cosineF(a, b)
      // the native expression IS the kernel formula (min-length dot)
      assert(native == kernel || (native.isNaN && kernel.isNaN),
        s"native=$native kernel=$kernel for ${a.toSeq}/${b.toSeq}")
      if (a.length == b.length) {
        // on equal dims (every real embedding table) all three agree bit
        // for bit; on mismatched dims zip_with nulls the padded tail, so
        // the HOF column is NULL there — a latent asymmetry the native
        // expression removes by matching the kernel loop
        val hof = r.getDouble(1)
        assert(native == hof || (native.isNaN && hof.isNaN),
          s"native=$native hof=$hof for ${a.toSeq}/${b.toSeq}")
      } else assert(r.isNullAt(1))
    }
    // null propagation through the SQL surface
    val n = Seq((Some(Array(1f, 2f)), Option.empty[Array[Float]]))
      .toDF("a", "b").selectExpr("cosine_sim(a, b) AS s").collect()
    assert(n.head.isNullAt(0))
    // zero vector: native yields NaN (0/0 in Java) where the HOF Column
    // division would raise under ANSI mode — strictly more robust
    val z = Seq((Array(0f, 0f), Array(1f, 2f)))
      .toDF("a", "b").selectExpr("cosine_sim(a, b) AS s").collect()
    assert(z.head.getDouble(0).isNaN)
    assert(graft.queries.TrainingOps.cosineF(Array(0f, 0f), Array(1f, 2f)).isNaN)
  }

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
