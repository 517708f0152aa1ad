package graft.tools

import org.apache.spark.sql.SparkSession

/** Times selected SparkEntry queries (noop-write forced, 1 warm + median of
  * 3) at all cores over SPARK_GRAFT_SF_DIR. Dev tool for before/after
  * comparisons of individual operators without running the full Bench.
  *
  * Usage: runMain graft.tools.QTime <queryName ...>
  */
object QTime {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time(body: => Unit): Double = {
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }
    args.foreach { n =>
      val fn = graft.SparkEntry.queries(n)
      def once() = time(fn(spark, sfDir).write.mode("overwrite").format("noop").save())
      once() // warm
      val ts = (1 to 3).map(_ => once()).sorted
      println(f"QTIME $n%-24s median=${ts(1)}%.3f s  (${ts.mkString(" ")})")
    }
    spark.stop()
  }
}
