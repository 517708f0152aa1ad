package graft.core

import org.apache.spark.sql.{DataFrame, DataFrameReader, DataFrameWriter, SparkSession}

/** The single read/write seam between the engine and table storage
  * (SURVEY.md §7.1 step 2, §7.3).
  *
  * The north rule targets Iceberg tables; this sandbox ships no Iceberg
  * jars (verified: none under /opt/spark/jars), so the default
  * implementation is partitioned Parquet with an Iceberg-compatible schema
  * — switching a real cluster to Iceberg is a one-line `format` change
  * HERE (plus catalog config), nowhere else: every job and query reads and
  * writes through these two calls.
  *
  * `GRAFT_TABLE_FORMAT=iceberg` flips the format at runtime when the jars
  * and a catalog are present; identifiers then resolve as catalog tables
  * rather than paths.
  */
object TableIO {

  val format: String = sys.env.getOrElse("GRAFT_TABLE_FORMAT", "parquet")

  private def pathBased: Boolean = format == "parquet" || format == "orc"

  def read(spark: SparkSession, table: String): DataFrame = {
    val r: DataFrameReader = spark.read.format(format)
    if (pathBased) r.load(table) else r.table(table)
  }

  def write(df: DataFrame, table: String, mode: String = "overwrite",
      partitionBy: Seq[String] = Nil): Unit = {
    val w: DataFrameWriter[org.apache.spark.sql.Row] =
      df.write.format(format).mode(mode)
    val wp = if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w
    if (pathBased) wp.save(table) else wp.saveAsTable(table)
  }
}
