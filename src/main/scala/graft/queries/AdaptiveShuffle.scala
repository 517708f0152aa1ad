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
    // Gate on the optimizer's SIZE estimate, not on df.rdd: under AQE,
    // .rdd materializes every upstream exchange as real jobs at
    // plan-construction time (duplicating a composed caller's joins),
    // while logical-plan stats are free. A small estimate means the scan
    // planned few tasks (split size floors at files.openCostInBytes);
    // composed/streaming inputs estimate large and pass through
    // untouched, as does any real corpus — no shuffle is ever added
    // where it would move real bytes.
    //
    // Width is a QUARTER of the slots, not all of them: every task pays
    // ~15–40 ms of fixed CPU (codegen/encoder init + interpreted
    // execution until JIT warms — tools/TaskCostProbe; 100–200 ms for
    // wide-encoder doc kernels in QProf), so on a small input many short
    // tasks burn more than they parallelize.
    val maxBytes = df.sparkSession.conf
      .getOption("spark.graft.spread.maxBytes").map(_.toLong).getOrElse(8L << 20)
    val sizeEst =
      try df.queryExecution.optimizedPlan.stats.sizeInBytes
      catch { case scala.util.control.NonFatal(_) => BigInt(Long.MaxValue) }
    val target = math.max(2, df.sparkSession.sparkContext.defaultParallelism / 4)
    if (sizeEst <= maxBytes) df.repartition(target) else df
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
