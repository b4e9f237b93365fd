package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Graph analytics over edge tables — the diagnostics a dedup/link graph
  * needs beyond [[MinHashDedup.dupGroups]]' connected components.
  */
object Graph {

  /** Bounded-iteration PageRank (Page et al. 1999) over a directed edge
    * table `(src, dst)` — centrality for the graphs a data pipeline
    * actually builds: near-dup link graphs (which document is the hub of
    * a template family), citation/reference graphs, co-purchase graphs.
    *
    * Semantics: standard damped PageRank with uniform teleport and
    * DANGLING-MASS redistribution (a node with no out-edges donates its
    * rank to everyone — dropping it would leak mass and the ranks would
    * no longer sum to 1). `iters` is a bounded driver loop over one
    * join+aggregate per round, the same contract as
    * [[Similarity.kmeansStep]] and [[MinHashDedup.dupGroups]]: each
    * iteration is one job, no driver-side data.
    *
    * Determinism (the oracle contract): per-edge contributions divide in
    * double (same operands every engine), but SUMS run through a
    * `DECIMAL(38,12)` accumulator — addition order cannot change the
    * result, so the final doubles are bit-identical however Spark
    * partitions the shuffle. Same trick as the q119 centroid means.
    *
    * Scale shape: ranks and degrees are node-keyed DataFrames; each
    * iteration shuffles edge contributions once on `dst` (map-side
    * combinable decimal sum) and joins ranks to edges on `src` — both
    * hash-partitioned equi-joins that AQE sizes. The dangling term is a
    * one-row aggregate broadcast into the update. Nothing driver-side
    * grows with the graph.
    *
    * @return one row per node: (node, rank) — ranks sum to ~1
    */
  def pageRank(edges: DataFrame, iters: Int,
               damping: Double = 0.85): DataFrame = {
    require(iters >= 1, "pageRank: at least one iteration")
    val dec = DecimalType(38, 12)
    // the loop re-reads all three every round — pin them once or the edge
    // derivation (often a join+distinct) re-executes per iteration
    val e = graft.util.Caches.cache(edges.select(col("src"), col("dst")))
    val nodes = graft.util.Caches.cache(e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct())
    val outdeg = graft.util.Caches.cache(e.groupBy(col("src").as("node"))
      .agg(count(lit(1)).as("deg")))
    // N is a scalar the plan needs everywhere; one tiny aggregate joined
    // in by cross-joining a single row (broadcast by size) keeps it
    // in-plan — no driver collect
    val nRow = nodes.agg(count(lit(1)).as("n"))
    var ranks = nodes.crossJoin(broadcast(nRow))
      .select(col("node"), (lit(1.0) / col("n")).as("rank"))
    for (_ <- 0 until iters) {
      val withDeg = ranks.join(outdeg, Seq("node"), "left")
      // dangling nodes donate their whole rank to the uniform pool
      val dangling = withDeg.filter(col("deg").isNull)
        .agg(coalesce(sum(col("rank").cast(dec)), lit(0).cast(dec))
          .as("dangle"))
      val contribs = withDeg.filter(col("deg").isNotNull)
        .join(e, withDeg("node") === e("src"))
        .select(col("dst").as("node"),
          (col("rank") / col("deg")).cast(dec).as("c"))
        .groupBy(col("node"))
        .agg(sum(col("c")).as("in_mass"))
      ranks = nodes
        .join(contribs, Seq("node"), "left")
        .crossJoin(broadcast(nRow))
        .crossJoin(broadcast(dangling))
        .select(col("node"),
          ((lit(1.0) - lit(damping)) / col("n") +
            lit(damping) *
              (coalesce(col("in_mass"), lit(0).cast(dec)).cast("double") +
                col("dangle").cast("double") / col("n"))).as("rank"))
        // lineage CUT per round — the iterated plan would otherwise grow
        // ~2× per iteration (the dupGroups lesson at MinHashDedup.scala:110;
        // swap for checkpoint() against a fault-tolerant dir on a cluster)
        .localCheckpoint(true)
    }
    ranks.select(col("node"), round(col("rank"), 10).as("rank"))
  }
}
