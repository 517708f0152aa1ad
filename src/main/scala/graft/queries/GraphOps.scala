package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Graph centrality over the extraction's entity graph.
  *
  * Reference behavior: openfoia renders the entity co-occurrence graph as
  * a JSON export (S8 sink) and leaves ranking to the UI; at corpus scale
  * the graph itself is the analysis surface — PageRank over co-mention
  * edges is the standard "which entities anchor this corpus" query
  * (Page et al. 1999, "The PageRank Citation Ranking").
  */
object GraphOps {

  /** PageRank in EXACT integer arithmetic, damping 0.85, fixed iteration
    * count. Ranks are scaled to 1e9 "rank units"; every division is a
    * `floor` over magnitudes far below 2^53, so double division is exact
    * at the floor boundary (a quotient's distance from an integer is
    * ≥ 1/denominator ≫ one ulp at 1e9 scale, and exact-integer quotients
    * are exactly representable) — both engines land on identical longs,
    * with no floating-point quantization caveat anywhere in the operator.
    * The floor drops < 1 unit per node per round (the classic integer-
    * PageRank mass leak, bounded by iters·N units of 1e9·N total — ~1e-7
    * relative); no dangling-mass term because co-occurrence edges are
    * symmetrized, so every node has out-degree ≥ 1.
    *
    * Scale shape: per round, ONE fan-out-1 join of the node-sized rank
    * table against out-degrees (narrow floor projection), ONE edge join +
    * map-side-combinable sum shuffled on dst, ONE left join back to the
    * node table. Edges and degrees are computed once and persisted; the
    * rank lineage is truncated every `cpEvery` rounds (localCheckpoint —
    * the [[TrainingOps.connectedComponents]] plan-size doctrine), so the
    * plan stays bounded at any iteration count.
    *
    * `edges` must be DISTINCT directed (src, dst) string pairs — pass
    * both directions for an undirected graph; multi-edges would
    * double-count contributions.
    */
  def pageRank(spark: SparkSession, edges: DataFrame, iters: Int = 4,
      cpEvery: Int = 8): DataFrame = {
    require(iters >= 0, s"iters must be >= 0, got $iters")
    val e = edges.select(col("src").cast("string").as("src"),
      col("dst").cast("string").as("dst")).persist()
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct().persist()
    val n = nodes.count() // scalar action — node count, never row data
    if (n == 0) {
      e.unpersist(); nodes.unpersist()
      return nodes.select(col("node"), lit(0L).as("rank_units"))
    }
    val deg = e.groupBy(col("src").as("node"))
      .agg(count(lit(1)).as("od")).persist()
    val base = math.floor(1.5e8 / n).toLong // (1-d)·SCALE/N, d = 0.85
    var ranks = nodes.select(col("node"),
      lit(math.floor(1e9 / n).toLong).as("r"))
    var i = 0
    while (i < iters) {
      val shares = ranks.join(deg, "node")
        .select(col("node"), floor(col("r").cast("double") / col("od")).as("s"))
      val contrib = e.join(shares.withColumnRenamed("node", "src"), "src")
        .groupBy(col("dst").as("node")).agg(sum(col("s")).as("c"))
      val next = nodes.join(contrib, Seq("node"), "left")
        .select(col("node"), (lit(base) +
          floor(coalesce(col("c"), lit(0L)).cast("double") * 85.0 / 100.0)).as("r"))
      ranks = if ((i + 1) % cpEvery == 0) next.localCheckpoint(true) else next
      i += 1
    }
    // eager-truncate the result so the helper tables can be released NOW
    // (the round-6 ADVICE reclaim doctrine); node-sized, so the extra
    // materialization is O(N) rows, and the CC localCheckpoint
    // executor-loss caveat applies (fail-retry, never silent corruption)
    val out = ranks.select(col("node"), col("r").cast("long").as("rank_units"))
      .localCheckpoint(true)
    e.unpersist(); nodes.unpersist(); deg.unpersist()
    out
  }
}
