package graft.gen

import org.apache.spark.sql.SparkSession

import graft.core.TableIO

/** Writes the deterministic corpus as the `docs_input` parquet table
  * (FIXTURES.md §1). Generation is distributed and seeded per doc_id, so
  * the table contents are identical at any parallelism. */
object CorpusWriter {
  def write(spark: SparkSession, nDocs: Long, path: String, partitions: Int): Unit = {
    import spark.implicits._
    TableIO.write(spark.range(0L, nDocs, 1L, partitions)
      .map(i => SpanGen.genDoc(SpanGen.docId(i))).toDF(), path)
  }
}
