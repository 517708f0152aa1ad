package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Co-located join via bucketing (SURVEY.md §4.2 / PLANS.md scale
  * checklist): two tables bucketed+sorted on the join key join with NO
  * shuffle exchange — the mechanism a 100 TB deployment uses to make
  * repeated fact-fact joins cheap. */
class BucketingSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def beforeAll(): Unit = spark.sparkContext.setLogLevel("ERROR")
  override def afterAll(): Unit = spark.stop()

  test("bucketed tables join without a shuffle exchange") {
    import spark.implicits._
    spark.sql("DROP TABLE IF EXISTS bkt_a")
    spark.sql("DROP TABLE IF EXISTS bkt_b")
    spark.range(0, 1000).withColumn("va", col("id") * 2)
      .write.mode("overwrite").bucketBy(8, "id").sortBy("id").saveAsTable("bkt_a")
    spark.range(0, 1000).withColumn("vb", col("id") + 7)
      .write.mode("overwrite").bucketBy(8, "id").sortBy("id").saveAsTable("bkt_b")

    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val j = spark.table("bkt_a").join(spark.table("bkt_b"), "id")
      assert(j.count() == 1000)
      val plan = j.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"expected SMJ:\n$plan")
      assert(!plan.contains("Exchange"), s"bucketing failed to co-locate:\n$plan")

      // control: the same join over non-bucketed data DOES shuffle
      val p2 = spark.range(0, 1000).toDF("id")
        .join(spark.range(0, 1000).toDF("id"), "id")
      p2.count()
      assert(p2.queryExecution.executedPlan.toString.contains("Exchange"))
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS bkt_a")
      spark.sql("DROP TABLE IF EXISTS bkt_b")
    }
  }

  test("j8_bucketed_join query: merge join over bucketed facts has no shuffle on the join key") {
    val df = SparkEntry.queries("j8_bucketed_join")(spark, "/root/testdata/sf0.001")
    val rows = df.collect()
    assert(rows.nonEmpty)
    // keep only the FINAL adaptive plan — AQE appends an "Initial Plan"
    // echo that would re-print the aggregation exchanges below the join
    val plan = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    val smj = plan.indexOf("SortMergeJoin")
    assert(smj >= 0, s"expected a merge join:\n$plan")
    // the plan prints parents above children: exchanges for the post-join
    // aggregation appear BEFORE the join node; nothing below the join (its
    // scan-side subtree) may shuffle — bucketing co-located both sides
    assert(!plan.substring(smj).contains("Exchange"),
      s"bucketed join still shuffles its inputs:\n$plan")
    assert(plan.substring(smj).contains("SelectedBucketsCount"),
      s"scan is not bucket-aware:\n$plan")
    spark.sql("DROP TABLE IF EXISTS graft_bkt_lineitem")
    spark.sql("DROP TABLE IF EXISTS graft_bkt_orders")
  }

  test("j8 materialize-once: dropped catalog entries re-register the existing " +
      "bucketed files (no rebuild) and the join stays shuffle-free") {
    val first = SparkEntry.queries("j8_bucketed_join")(spark, "/root/testdata/sf0.001")
    val want = first.collect().toSeq
    // the tables are EXTERNAL: dropping the catalog entries models a fresh
    // session against a warehouse that already holds the bucketed files +
    // marker — the query must take the register-only DDL branch, not rewrite
    spark.sql("DROP TABLE IF EXISTS graft_bkt_lineitem")
    spark.sql("DROP TABLE IF EXISTS graft_bkt_orders")
    val loc = graft.core.Materialize.warehousePath(spark, "graft_bkt_lineitem")
    val fs = loc.getFileSystem(spark.sessionState.newHadoopConf())
    assert(fs.exists(new org.apache.hadoop.fs.Path(loc, "_graft_src")),
      "marker must survive DROP TABLE (external table)")
    val mtime = fs.listStatus(loc).map(_.getModificationTime).max

    val again = SparkEntry.queries("j8_bucketed_join")(spark, "/root/testdata/sf0.001")
    assert(again.collect().toSeq == want)
    val plan = again.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    val smj = plan.indexOf("SortMergeJoin")
    assert(smj >= 0 && !plan.substring(smj).contains("Exchange"),
      s"re-registered bucketed join shuffles:\n$plan")
    assert(fs.listStatus(loc).map(_.getModificationTime).max == mtime,
      "register-only path must not rewrite the bucketed files")
    spark.sql("DROP TABLE IF EXISTS graft_bkt_lineitem")
    spark.sql("DROP TABLE IF EXISTS graft_bkt_orders")
  }
}
