package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Scale-adaptive shuffle sizing for the iterative operators (guide
  * §2.2/§2.4): partition counts are derived from MEASURED row counts —
  * never from the local core count — and session confs touched for the
  * eager region are restored before the operator returns.
  */
private[graft] object AdaptiveShuffle {

  /** Partition count for `rows` rows at `spark.graft.rowsPerPartition`
    * rows per partition (default 1,000,000 — a few tens of MB of narrow
    * rows per task, inside the guide §2.2 100 MB–1 GB band once join
    * state is counted). Scales to thousands of partitions at corpus size
    * and to 1 on the bench faces. */
  def parts(spark: SparkSession, rows: Long): Int = {
    val perPart = spark.conf.getOption("spark.graft.rowsPerPartition")
      .map(_.toLong).getOrElse(1000000L)
    math.max(1L, (rows + perPart - 1) / perPart).min(200000L).toInt
  }

  /** Spread a SMALL scan across the available slots before a CPU-dense
    * per-document kernel (typed flatMap or regex-heavy projection).
    * Parquet split planning floors split size at
    * `spark.sql.files.openCostInBytes` (4 MB), so a sub-MB documents
    * table plans 1 scan task and the kernel runs serial while the other
    * cores idle. Scale-adaptive by construction: when the scan already
    * carries at least half the default parallelism (any real corpus),
    * this is the identity — no shuffle is ever added at scale, where
    * repartitioning raw text before a map-only kernel would be waste
    * (guide §8: move heavy bytes as little as possible). Round-robin
    * repartition is deterministic under retry via Spark's
    * sort-before-repartition (guide §2.5). */
  def spread(df: DataFrame): DataFrame = {
    // Quarter of the slots, not all of them: a typed-kernel task carries
    // ~25–150 ms of fixed CPU (encoder/codegen init + interpreted
    // execution until JIT warms — measured: a trivial typed map costs
    // ~25 ms/task steady-state where the SQL equivalent costs ~0.3 ms),
    // so on a small input many short tasks burn more than they
    // parallelize. Width parallelism/4 keeps each task long enough to
    // JIT while still covering the kernel.
    val target = math.max(2, df.sparkSession.sparkContext.defaultParallelism / 4)
    val parts = try df.rdd.getNumPartitions catch { case _: Throwable => target }
    if (parts * 2 < target) df.repartition(target) else df
  }

  /** Scoped session confs for an iterative op: from construction, AQE may
    * re-partition cached plans (`canChangeCachedPlanOutputPartitioning` —
    * helper caches get sized by data instead of inheriting
    * `spark.sql.shuffle.partitions` map-side); `pin(p)` pins the shuffle
    * partition count once the edge/pair count is measured. `restore()`
    * (call in a finally) puts both confs back — every eager action runs
    * inside the scope and the returned DataFrames are
    * checkpoint-truncated, so no lazy work escapes it. */
  final class Scope(spark: SparkSession) {
    private val kShuf = "spark.sql.shuffle.partitions"
    private val kCache = "spark.sql.optimizer.canChangeCachedPlanOutputPartitioning"
    private val oldShuf = spark.conf.getOption(kShuf)
    private val oldCache = spark.conf.getOption(kCache)
    spark.conf.set(kCache, "true")
    def pin(p: Int): Unit = spark.conf.set(kShuf, p.toString)
    def restore(): Unit = {
      oldShuf.fold(spark.conf.unset(kShuf))(spark.conf.set(kShuf, _))
      oldCache.fold(spark.conf.unset(kCache))(spark.conf.set(kCache, _))
    }
  }
}
