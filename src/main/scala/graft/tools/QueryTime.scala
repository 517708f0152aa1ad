package graft.tools

import org.apache.spark.sql.SparkSession

/** Time individual `SparkEntry.queries` entries without a whole-bench run:
  * `sbt "runMain graft.tools.QueryTime q1_agg gr_triangles"`.
  * Env: QT_SF_DIR (default /root/testdata/sf0.1), QT_CPUS (default 32),
  * QT_REPS (default 2 — prints every rep; first rep pays warehouse builds).
  */
object QueryTime {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: QueryTime <query name...>")
    val sfDir = sys.env.getOrElse("QT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("QT_CPUS", "32").toInt
    val reps = sys.env.getOrElse("QT_REPS", "2").toInt
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import org.apache.spark.sql.functions.{col, count, lit, sum, xxhash64}
    args.foreach { name =>
      val q = graft.SparkEntry.queries.getOrElse(name,
        sys.error(s"unknown query: $name"))
      val secs = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        // force EVERY value column (a bare count() lets ColumnPruning
        // delete the expensive projections and understate the wall; the
        // driver materializes and hashes all values) — xxhash64 over the
        // full column list defeats pruning at negligible cost
        val d = q(spark, sfDir)
        val row = d.select(xxhash64(d.columns.map(col): _*).as("h"))
          .agg(count(lit(1)).as("n"),
            sum(col("h").cast("decimal(38,0)"))).collect().head // no ANSI long overflow
        val s = (System.nanoTime() - t0) / 1e9
        (s, row.getLong(0))
      }
      println(f"QUERYTIME $name rows=${secs.head._2} " +
        secs.map(x => f"${x._1}%.2f").mkString("secs=", ",", ""))
    }
    spark.stop()
  }
}
