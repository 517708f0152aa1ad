package graft.tools

import org.apache.spark.sql.SparkSession

/** Dumps Lloyd centroids + cell assignments for oracle cross-validation.
  * Dev tool. */
object IvfDump {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val cents = graft.queries.TrainingOps.lloydCentroids(spark, emb, 16)
    cents.toSeq.map { case (c, v) => (c, v.toSeq) }.toDF("cell", "centroid")
      .coalesce(1).write.mode("overwrite").parquet("/tmp/ivf_cents")
    spark.stop()
  }
}
