package graft.tools

import org.apache.spark.sql.SparkSession

/** Dumps hyperplane LSH buckets for oracle cross-validation. Dev tool. */
object BucketDump {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val out = if (args.length > 1) args(1) else "/tmp/bucket_dump"
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.queries.TrainingOps.hyperplaneBuckets(spark,
        spark.read.parquet(s"$sfDir/embeddings.parquet"), 12)
      .coalesce(1).write.mode("overwrite").parquet(out)
    spark.stop()
  }
}
