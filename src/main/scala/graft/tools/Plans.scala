package graft.tools

import org.apache.spark.sql.SparkSession

/** Prints `explain("formatted")` for selected queries so plan properties
  * (filter/column pushdown into parquet, broadcast joins, whole-stage
  * codegen spans, single-exchange extraction) can be audited. Dev tool.
  *
  * Usage: runMain graft.tools.Plans [queryName ...]  (default: audit set)
  */
object Plans {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val names =
      if (args.nonEmpty) args.toSeq
      else Seq("q1_agg", "q3_top_orders", "j1_fk_navigation", "p2_eq_filter",
        "s1_ingest_checksum", "w1_topk_docs", "dd_minhash_pairs", "sim_cosine_topk")

    names.foreach { n =>
      graft.SparkEntry.queries.get(n) match {
        case Some(fn) =>
          println(s"===== PLAN $n =====")
          fn(spark, sfDir).explain("formatted")
        case None => println(s"===== PLAN $n: no such query =====")
      }
    }
    spark.stop()
  }
}
