package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Graph centrality over the extraction's entity graph.
  *
  * Reference behavior: openfoia renders the entity co-occurrence graph as
  * a JSON export (S8 sink) and leaves ranking to the UI; at corpus scale
  * the graph itself is the analysis surface — PageRank over co-mention
  * edges is the standard "which entities anchor this corpus" query
  * (Page et al. 1999, "The PageRank Citation Ranking").
  *
  * Round-8 shuffle doctrine (guide §2.2/§2.4): every iterative operator
  * here (a) derives its partition count from the MEASURED edge count
  * (`spark.graft.graph.rowsPerPartition`, default 1M edge rows ≈ tens of
  * MB per task — never a constant tuned to one box), (b) persists the
  * edge table HASH-PARTITIONED on the per-round join key so the edge-sized
  * shuffle happens once per run instead of once per round, and (c) opens
  * AQE into cached-plan materialization
  * (`canChangeCachedPlanOutputPartitioning`) so helper caches are sized by
  * data, not by `spark.sql.shuffle.partitions`. Session confs touched are
  * restored in a finally — callers see no conf drift.
  */
object GraphOps {

  private def adaptiveParts(spark: SparkSession, rows: Long): Int =
    AdaptiveShuffle.parts(spark, rows)

  private type GraphConfScope = AdaptiveShuffle.Scope

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
      cpEvery: Int = 8): DataFrame =
    run(spark, edges, iters, cpEvery, seedPred = None)

  /** Personalized PageRank: the teleport mass lands ONLY on the seed
    * nodes selected by `seedPred` (a predicate over the `node` column),
    * so ranks measure importance RELATIVE to the seed topic (Page et al.
    * 1999 §6's personalized vector, restricted to a uniform seed set —
    * e.g. "which entities anchor this corpus as seen from its PERSON
    * mentions"). Same exact integer arithmetic and per-round shape as
    * [[pageRank]]: r₀ = ⌊1e9/|S|⌋ on seeds else 0, and each round adds
    * ⌊1.5e8/|S|⌋ on seeds else 0 plus the floored damped in-mass.
    * Non-seed components drain toward 0 — rank mass cannot enter a
    * component with no seed, which is the semantics a topic-conditioned
    * ranking wants. Requires at least one seed node in the graph. */
  def pageRankSeeded(spark: SparkSession, edges: DataFrame, seedPred: Column,
      iters: Int = 4, cpEvery: Int = 8): DataFrame =
    run(spark, edges, iters, cpEvery, seedPred = Some(seedPred))

  /** Weight-proportional PageRank: each node's out-mass splits across
    * its out-edges ∝ integer edge weight (here: co-mention support
    * `n_docs`) instead of uniformly — share(e) = ⌊r(u)·w(e) / W(u)⌋ with
    * W(u) = Σ out-weights. Same exact-integer doctrine as [[pageRank]]:
    * r·w ≤ 1e9·maxW stays far below 2^53 (products exact), the quotient's
    * distance from an integer is ≥ 1/W(u) ≫ one ulp of a ≤ 1e9-scale
    * result, so both engines land on identical longs; with all weights
    * equal the result is BIT-IDENTICAL to [[pageRank]] (pinned in
    * OpsSpec). Per round: one fan-out-1 join of ranks onto the weighted
    * edge list (shares are per-EDGE now), one map-side-combinable sum on
    * dst, one node left join — same shuffle count as the uniform
    * operator.
    *
    * `edges` must be DISTINCT symmetric (src, dst, w) rows with integer
    * w ≥ 1. */
  def pageRankWeighted(spark: SparkSession, edges: DataFrame, iters: Int = 4,
      cpEvery: Int = 8): DataFrame = {
    require(iters >= 0, s"iters must be >= 0, got $iters")
    require(cpEvery > 0, s"cpEvery must be > 0, got $cpEvery")
    val scope = new GraphConfScope(spark)
    try {
      val eRaw = edges.select(col("src").cast("string").as("src"),
        col("dst").cast("string").as("dst"), col("w").cast("long").as("w"))
        .persist()
      val nEdges = eRaw.count()
      val p = adaptiveParts(spark, nEdges)
      scope.pin(p)
      // W(u) = Σ out-weights rides EVERY edge row as a constant across
      // rounds — join it ONCE here instead of once per round (the r7 form
      // re-joined wtot inside the loop: one extra node-sized join and its
      // sort, × iters). `ew` is hash-partitioned on the per-round join key
      // src, so the per-round rank join never re-shuffles the edge table.
      val e = eRaw.repartition(p, col("src")).persist()
      // distinct() under the pinned conf already exchanges hash(node, p)
      val nodes = e.select(col("src").as("node"))
        .union(e.select(col("dst").as("node"))).distinct().persist()
      val n = nodes.count()
      eRaw.unpersist() // e and nodes are materialized now — drop the raw copy
      if (n == 0) {
        e.unpersist(); nodes.unpersist()
        return nodes.select(col("node"), lit(0L).as("rank_units"))
      }
      val wtot = e.groupBy(col("src")).agg(sum(col("w")).as("wt"))
      val ew = e.join(wtot, "src")
        .select(col("src"), col("dst"), col("w"), col("wt")).persist()
      val base = math.floor(1.5e8 / n).toLong
      var ranks = nodes.select(col("node"),
        lit(math.floor(1e9 / n).toLong).as("r"))
      var i = 0
      while (i < iters) {
        val contrib = ew
          .join(ranks.withColumnRenamed("node", "src").hint("shuffle_hash"), "src")
          .select(col("dst"),
            floor(col("r").cast("double") * col("w") / col("wt")).as("s"))
          .groupBy(col("dst").as("node")).agg(sum(col("s")).as("c"))
        val next = nodes.join(contrib.hint("shuffle_hash"), Seq("node"), "left")
          .select(col("node"), (lit(base) +
            floor(coalesce(col("c"), lit(0L)).cast("double") * 85.0 / 100.0)).as("r"))
        ranks = if ((i + 1) % cpEvery == 0) next.localCheckpoint(true) else next
        i += 1
      }
      val out = ranks.select(col("node"), col("r").cast("long").as("rank_units"))
        .localCheckpoint(true)
      e.unpersist(); nodes.unpersist(); ew.unpersist()
      out
    } finally scope.restore()
  }

  /** Per-node triangle counts + degree via the degree-ordered
    * node-iterator (Suri & Vassilvitskii 2011, "Counting Triangles and the
    * Curse of the Last Reducer" — the MapReduce-optimal shape): each
    * undirected edge is oriented from its (degree, node)-smaller endpoint,
    * wedges are pairs of ORIENTED out-neighbors, and a wedge closes iff
    * its (v1 < v2) endpoints are a canonical edge — every triangle counted
    * exactly once at its lowest-degree corner. Wedge volume is
    * Σ outdeg² ≤ O(E^{3/2}) for ANY graph (the orientation caps outdeg at
    * ~√(2E)) — the hot-node quadratic blowup a naive neighbor self-join
    * has on co-mention hubs cannot happen. Output is all exact longs
    * (node, degree, triangles) — the local clustering coefficient is
    * 2·triangles/(degree·(degree−1)), left rational for the caller so no
    * fp enters the operator.
    *
    * `edges` must be DISTINCT symmetric directed (src, dst) string pairs
    * (the [[pageRank]] contract). */
  def triangleStats(spark: SparkSession, edges: DataFrame): DataFrame = {
    // persist the INPUT edge build first: canon and deg both consume it,
    // and without this the upstream build (e.g. the co-mention self-join)
    // re-executed once per consumer — measured 2× on the bench face
    val scope = new GraphConfScope(spark)
    try {
      val e = edges.select(col("src").cast("string").as("src"),
        col("dst").cast("string").as("dst")).persist()
      val nEdges = e.count()
      val p = adaptiveParts(spark, nEdges)
      scope.pin(p)
      // canon feeds the orientation AND the closure join, deg feeds the
      // orientation twice plus the output, o self-joins — persist each or
      // the edge scan re-executes once per consumer
      val canon = e.where(col("src") < col("dst"))
        .select(col("src").as("a"), col("dst").as("b")).persist()
      val deg = e.groupBy(col("src").as("node")).agg(count(lit(1)).as("d"))
        .persist()
      val withDeg = canon
        .join(deg.select(col("node").as("a"), col("d").as("da")), "a")
        .join(deg.select(col("node").as("b"), col("d").as("db")), "b")
      val lowFirst = col("da") < col("db") ||
        (col("da") === col("db") && col("a") < col("b"))
      val o = withDeg.select(
        when(lowFirst, col("a")).otherwise(col("b")).as("u"),
        when(lowFirst, col("b")).otherwise(col("a")).as("v")).persist()
      val w = o.as("e1").join(o.as("e2"),
          col("e1.u") === col("e2.u") && col("e1.v") < col("e2.v"))
        .select(col("e1.u").as("u"), col("e1.v").as("v1"), col("e2.v").as("v2"))
      val tri = w.join(canon, col("v1") === col("a") && col("v2") === col("b"))
        .select(col("u"), col("v1"), col("v2"))
      val perNode = tri
        .select(explode(array(col("u"), col("v1"), col("v2"))).as("node"))
        .groupBy(col("node")).agg(count(lit(1)).as("triangles"))
      // eager-truncate, then release the helpers (the pageRank doctrine)
      val out = deg.join(perNode, Seq("node"), "left")
        .select(col("node"), col("d").cast("long").as("degree"),
          coalesce(col("triangles"), lit(0L)).cast("long").as("triangles"))
        .localCheckpoint(true)
      e.unpersist(); canon.unpersist(); deg.unpersist(); o.unpersist()
      out
    } finally scope.restore()
  }

  private def run(spark: SparkSession, edges: DataFrame, iters: Int,
      cpEvery: Int, seedPred: Option[Column]): DataFrame = {
    require(iters >= 0, s"iters must be >= 0, got $iters")
    require(cpEvery > 0, s"cpEvery must be > 0, got $cpEvery")
    val scope = new GraphConfScope(spark)
    try {
      val eRaw = edges.select(col("src").cast("string").as("src"),
        col("dst").cast("string").as("dst")).persist()
      val nEdges = eRaw.count() // materializes the edge build once; sizes p
      val p = adaptiveParts(spark, nEdges)
      scope.pin(p)
      // Edge table hash-partitioned on src ONCE: the per-round rank join
      // reuses this partitioning every round, so the only per-round
      // exchange left is the fundamental contribution reduce on dst
      // (guide §2.4 "two operations keyed the same way share one
      // exchange"; the r7 form re-exchanged edges every round).
      val e = eRaw.repartition(p, col("src")).persist()
      // distinct() under the pinned conf already exchanges hash(node, p) —
      // an explicit repartition would just add a second exchange
      val nodes = e.select(col("src").as("node"))
        .union(e.select(col("dst").as("node"))).distinct().persist()
      val isSeed = seedPred.getOrElse(lit(true))
      val n = nodes.where(isSeed).count() // scalar action — seed/node count
      eRaw.unpersist() // e and nodes are materialized now — drop the raw copy
      if (n == 0) {
        e.unpersist(); nodes.unpersist()
        require(seedPred.isEmpty, "pageRankSeeded: no seed node is in the graph")
        return nodes.select(col("node"), lit(0L).as("rank_units"))
      }
      // deg inherits e's (src, p) partitioning — a complete per-partition
      // aggregation, zero exchange (all out-edges of a node co-reside)
      val deg = e.groupBy(col("src").as("node"))
        .agg(count(lit(1)).as("od")).persist()
      // ⌊SCALE/|S|⌋ start mass and ⌊(1-d)·SCALE/|S|⌋ per-round teleport,
      // landing on seeds only (uniform PageRank: every node is a seed)
      val r0 = math.floor(1e9 / n).toLong
      val base = math.floor(1.5e8 / n).toLong
      var ranks = nodes.select(col("node"),
        when(isSeed, lit(r0)).otherwise(lit(0L)).as("r"))
      var i = 0
      while (i < iters) {
        // shuffle_hash hints: build the hash map on the node-sized side
        // and STREAM the edge side — a sort-merge join would re-sort the
        // edge partitions every round (guide §3.1)
        val shares = ranks.join(deg.hint("shuffle_hash"), "node")
          .select(col("node"), floor(col("r").cast("double") / col("od")).as("s"))
        val contrib = e.join(shares.withColumnRenamed("node", "src")
            .hint("shuffle_hash"), "src")
          .groupBy(col("dst").as("node")).agg(sum(col("s")).as("c"))
        val next = nodes.join(contrib.hint("shuffle_hash"), Seq("node"), "left")
          .select(col("node"), (when(isSeed, lit(base)).otherwise(lit(0L)) +
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
    } finally scope.restore()
  }
}
