package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Iterative graph analytics over edge lists — the companion to
  * [[Dedup.connectedComponents]] for the near-dup graph and any other
  * id-keyed relation (link graphs, citation graphs, user-item bipartite).
  */
object Graph {

  /** PageRank by power iteration over an UNDIRECTED edge list (each edge
    * contributes both directions; self-loops dropped; duplicate edges
    * collapse). Nodes outside the edge list aren't ranked — same
    * convention as [[Dedup.connectedComponents]] (an isolated node's rank
    * is the uniform (1−d)/N floor; union it back if a total ranking is
    * needed).
    *
    * Engine-exact by construction, so a fixed iteration count is
    * restatable on any engine (the gate replays all rounds in DuckDB):
    * per-edge contributions pr(u)/deg(u) are computed in double with an
    * identical expression tree, rounded to 9 dp, and summed as
    * DECIMAL(38,9) — exact and order-independent, so the unordered
    * distributed reduce cannot jitter the result; the damping update
    * (1−d)/N + d·Σ is again a per-row double tree re-rounded to 9 dp.
    * The 9-dp quantization perturbs each iterate by ≤ 5e-10 — far below
    * anything a ranking consumer can see — and buys bit-for-bit
    * reproducibility run-over-run regardless of partitioning.
    *
    * Scale: each iteration is one equi-join of the edge list with the
    * O(|V|)-row rank table plus one groupBy on the destination — shuffles
    * carry 8-byte keys and one decimal, never payloads. Like
    * [[Dedup.connectedComponents]], long chains of iterations on a real
    * cluster should re-materialize the rank table every few rounds
    * (localCheckpoint/parquet stage) to keep lineage flat; at a gated
    * 3-5 iterations the plain plan is fine.
    */
  def pageRank(edges: DataFrame, aCol: String, bCol: String,
               iterations: Int, damping: Double = 0.85): DataFrame = {
    require(iterations >= 1, s"iterations must be >= 1, got $iterations")
    def pr9(c: Column): Column =
      graft.functions.fast_round(c, 9).cast("decimal(38,9)")
    val ed = edges.select(col(aCol).cast("long").as("u"), col(bCol).cast("long").as("v"))
      .where(col("u") =!= col("v"))
    // materialize the symmetrized edge list ONCE: every iteration joins
    // against it, and without the barrier the upstream pair derivation
    // (e.g. the whole SimHash pipeline) would re-execute per round. Same
    // tradeoff as Dedup's LocalCheckpoint barrier: executor block
    // storage, lineage truncated; blocks are reclaimed by the context
    // cleaner once the result is unreferenced. On a multi-executor
    // cluster swap for a reliable checkpoint / parquet stage.
    val sym = ed.unionAll(ed.select(col("v").as("u"), col("u").as("v")))
      .distinct().localCheckpoint()
    val deg = sym.groupBy("u").agg(count(lit(1)).as("deg"))
    val nNodes = deg.agg(count(lit(1)).as("n"))
    // every node starts at 1/N; n rides along as a constant column so the
    // damping update stays a single declarative projection per iteration
    var pr = deg.crossJoin(broadcast(nNodes))
      .select(col("u").as("node"), pr9(lit(1.0) / col("n")).as("pr"), col("n"))
    for (_ <- 1 to iterations) {
      val contrib = sym
        .join(pr.withColumnRenamed("node", "u"), "u")
        .join(deg, "u")
        .select(col("v").as("node"),
          pr9(col("pr").cast("double") / col("deg")).as("c"), col("n"))
      // symmetric edges mean every node has in-edges, so the groupBy
      // covers exactly the node set — no dangling-mass term needed
      pr = contrib.groupBy("node", "n").agg(sum(col("c")).as("s"))
        .select(col("node"),
          pr9((lit(1.0) - lit(damping)) / col("n")
            + lit(damping) * col("s").cast("double")).as("pr"),
          col("n"))
    }
    pr.select(col("node"), col("pr").cast("double").as("pagerank"))
  }
}
