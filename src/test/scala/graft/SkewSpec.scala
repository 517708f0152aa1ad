package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.SkewJoin

/** Skewed fact-fact join handling (SURVEY.md §4.2, join flavor): the
  * explicit salted rewrite is row-identical to the plain join and its
  * shuffle partitions on (key, salt) so a hot key cannot serialize one
  * reducer; AQE's OptimizeSkewedJoin is pinned as the runtime alternative
  * for skew that is NOT known ahead of time. */
class SkewSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def beforeAll(): Unit = spark.sparkContext.setLogLevel("ERROR")
  override def afterAll(): Unit = spark.stop()

  private def withConf[T](pairs: (String, String)*)(body: => T): T = {
    val prev = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    try { pairs.foreach { case (k, v) => spark.conf.set(k, v) }; body }
    finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("saltedInner is row-identical to the plain join on a 50%-hot-key corpus") {
    import spark.implicits._
    // hot key 0 holds half the left side; right side key-unique
    val left = spark.range(0, 20000)
      .select(col("id"),
        when(pmod(col("id"), lit(2)) === 0, lit(0L)).otherwise(col("id")).as("k"),
        (col("id") * 3).as("payload"))
    val right = spark.range(0, 20000).select(col("id").as("rk"), (col("id") + 7).as("rv"))

    val plain = left.join(right, col("k") === col("rk"))
      .select(col("id"), col("k"), col("payload"), col("rk"), col("rv"))
      .collect().map(_.toSeq).sortBy(_.toString).toSeq
    val salted = SkewJoin.saltedInner(left, "k", col("id"), right, "rk", nSalts = 8)
      .select(col("id"), col("k"), col("payload"), col("rk"), col("rv"))
      .collect().map(_.toSeq).sortBy(_.toString).toSeq
    assert(salted == plain && salted.size == 20000)
  }

  test("j9_skew_join: shuffle partitions on (key, salt) — the hot key spans salts; result matches plain join") {
    withConf("spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      val df = SparkEntry.queries("j9_skew_join")(spark, "/root/testdata/sf0.001")
      val rows = df.collect()
      assert(rows.nonEmpty)
      val plan = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
      // both join inputs exchange on (join key, __salt): the hot key's rows
      // spread over nSalts reducers instead of serializing one task
      assert(plan.contains("__salt"), s"salt column missing from the plan:\n$plan")
      val exchanges = plan.split("\n").filter(l => l.contains("Exchange hashpartitioning"))
      assert(exchanges.exists(l => l.contains("fk") && l.contains("__salt")),
        s"left exchange not salted:\n${exchanges.mkString("\n")}")
      assert(exchanges.exists(l => l.contains("o_orderkey") && l.contains("__salt")),
        s"right exchange not salted:\n${exchanges.mkString("\n")}")

      // equivalence vs the unsalted formulation in-engine (the driver's
      // DuckDB oracle independently checks the same plain join)
      val d = "/root/testdata/sf0.001"
      val fact = spark.read.parquet(s"$d/lineitem.parquet")
        .withColumn("fk", when(pmod(col("l_orderkey"), lit(10)) < 3, lit(1L))
          .otherwise(col("l_orderkey")))
      val dim = spark.read.parquet(s"$d/orders.parquet")
        .select(col("o_orderkey"), col("o_orderpriority"))
      val plain = fact.join(dim, col("fk") === col("o_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n"), round(sum(col("l_quantity")), 2).as("sum_qty"))
        .orderBy(col("o_orderpriority"))
        .collect().map(_.toSeq).toSeq
      assert(rows.map(_.toSeq).toSeq == plain)
    }
  }

  test("AQE OptimizeSkewedJoin splits the hot partition at runtime (the unknown-skew path)") {
    import spark.implicits._
    // ~60% of left rows on one key; thresholds lowered so the test corpus
    // crosses the same relative bar a hot key crosses at 100 TB
    withConf(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "65536",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "32768") {
      val left = spark.range(0, 200000)
        .select(col("id"),
          when(pmod(col("id"), lit(5)) < 3, lit(0L)).otherwise(col("id")).as("k"))
        .withColumn("pad", lpad(col("id").cast("string"), 32, "x"))
      val right = spark.range(0, 200000).select(col("id").as("rk"))
      // 120k hot rows all match rk=0; the 80k cold rows match their own key.
      // Action via the join's OWN queryExecution (count() would plan a fresh
      // aggregate execution and leave this adaptive plan un-finalized).
      val j = left.join(right, col("k") === col("rk"))
      assert(j.collect().length === 200000)
      val plan = j.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
      assert(plan.contains("skew=true"),
        s"AQE did not mark the join skewed:\n$plan")
    }
  }
}
