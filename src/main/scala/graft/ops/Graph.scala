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

  /** Exact per-node triangle counts on an undirected edge list — the
    * clustering-coefficient numerator and the standard "dense pocket"
    * signal on near-dup graphs. Uses the forward/degree-orientation
    * algorithm: orient every edge from its lower (deg, id) endpoint to
    * the higher, enumerate wedges from each pivot's OUT-neighbors, and
    * keep wedges that close into an oriented edge. Each triangle has
    * exactly one node with out-edges to both others, so it is found
    * exactly once.
    *
    * Scale: the wedge fan-out is Σ outdeg², and degree orientation bounds
    * every out-degree by O(√m) regardless of skew (a hub's edges orient
    * INTO it) — the join stays output-proportional where a naive
    * neighbor-join squares the hub degree. Three equi-joins on 8-byte
    * keys; no payload ever shuffles.
    *
    * Output: (node, n_triangles) for nodes in ≥ 1 triangle.
    */
  def triangles(edges: DataFrame, aCol: String, bCol: String): DataFrame = {
    val canon = edges.select(
        least(col(aCol), col(bCol)).cast("long").as("u"),
        greatest(col(aCol), col(bCol)).cast("long").as("v"))
      .where(col("u") =!= col("v")).distinct()
    val deg = canon.select(col("u").as("n")).unionAll(canon.select(col("v").as("n")))
      .groupBy("n").agg(count(lit(1)).as("d"))
    // orient by (deg, id): src = the smaller endpoint under that order
    val oriented = canon
      .join(deg.select(col("n").as("u"), col("d").as("du")), "u")
      .join(deg.select(col("n").as("v"), col("d").as("dv")), "v")
      .select(
        when(col("du") < col("dv") || (col("du") === col("dv") && col("u") < col("v")),
          struct(col("u").as("s"), col("v").as("t")))
          .otherwise(struct(col("v").as("s"), col("u").as("t"))).as("e"))
      .select(col("e.s").as("s"), col("e.t").as("t"))
    // wedges (s -> t1, s -> t2) with a consistent t1 < t2 arbitration so
    // each unordered out-pair appears once, closed by an oriented edge in
    // EITHER direction between t1 and t2
    val w1 = oriented.select(col("s"), col("t").as("t1"))
    val w2 = oriented.select(col("s"), col("t").as("t2"))
    val wedges = w1.join(w2, "s").where(col("t1") < col("t2"))
    val closing = oriented.select(
      least(col("s"), col("t")).as("t1"), greatest(col("s"), col("t")).as("t2"))
    val tri = wedges.join(closing, Seq("t1", "t2"))
    tri.select(explode(array(col("s"), col("t1"), col("t2"))).as("node"))
      .groupBy("node").agg(count(lit(1)).as("n_triangles"))
  }

  /** Synchronous label-propagation community detection (Raghavan et al.
    * 2007) over an undirected edge list: every node starts labeled with
    * its own id; each round a node adopts the label most frequent among
    * its neighbors, ties to the SMALLEST label — the deterministic
    * variant (classic LPA breaks ties randomly; a min-label tiebreak
    * makes a fixed round count restatable on any engine, same move as
    * [[pageRank]]'s 9-dp quantization). Near-dup graphs resolve into
    * boilerplate families in a handful of rounds; unlike
    * [[Dedup.connectedComponents]] the result splits weakly-bridged
    * clusters instead of flooding through every transitive link.
    *
    * Scale: per round, one equi-join of the edge list with the
    * O(|V|)-row label table and one (node, label)-keyed count — 8-byte
    * keys only; the window ranks within a node's neighbor-label set
    * (bounded by its degree). The symmetrized edge list sits behind the
    * usual localCheckpoint barrier; swap for a reliable checkpoint on a
    * cluster, and re-materialize the label table every few rounds for
    * long chains.
    */
  def labelPropagation(edges: DataFrame, aCol: String, bCol: String,
                       iterations: Int): DataFrame = {
    require(iterations >= 1, s"iterations must be >= 1, got $iterations")
    val ed = edges.select(col(aCol).cast("long").as("u"), col(bCol).cast("long").as("v"))
      .where(col("u") =!= col("v"))
    val sym = ed.unionAll(ed.select(col("v").as("u"), col("u").as("v")))
      .distinct().localCheckpoint()
    var labels = sym.select(col("u").as("node")).distinct()
      .select(col("node"), col("node").as("label"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("node")).orderBy(col("cnt").desc, col("label"))
    for (_ <- 1 to iterations) {
      labels = sym
        .join(labels.select(col("node").as("u"), col("label")), "u")
        .groupBy(col("v").as("node"), col("label")).agg(count(lit(1)).as("cnt"))
        .withColumn("rn", row_number().over(w))
        .where(col("rn") === 1)
        .select(col("node"), col("label"))
    }
    labels
  }

  /** HITS hubs and authorities (Kleinberg 1999) by power iteration over
    * a DIRECTED edge list — the web-graph companion to [[pageRank]]:
    * authorities are the pages good hubs point AT, hubs the pages that
    * point at good authorities. For a crawl corpus this is the classic
    * seed-quality / link-spam lens (a link farm's members score as
    * mutual hubs with no outside authority), and the authority score is
    * a natural input to the frontier's evidence ranking
    * (`FrontierConfig.useInlinks` counts voters; HITS weighs them).
    *
    * Per iteration: auth(v) = Σ_{u→v} hub(u) then L1-normalize;
    * hub(u) = Σ_{u→v} auth'(v) then L1-normalize (the standard
    * synchronous update; L1 instead of L2 keeps the arithmetic a
    * rational tree with no sqrt). Engine-exact by the [[pageRank]]
    * construction: scores live as 9-dp DECIMAL(38,9), the per-edge sums
    * are exact order-independent decimal adds, and each normalization is
    * one double division re-rounded to 9 dp — a fixed iteration count
    * replays bit-for-bit on any SQL engine. Self-loops drop, duplicate
    * edges collapse; nodes with no out-edges hold hub 0, no in-edges
    * auth 0 (they still appear in the output — the node set is the edge
    * list's endpoint union).
    *
    * Scale: the distinct edge list materializes once
    * (localCheckpoint); each iteration is two edge↔score equi-joins +
    * two groupBys shuffling 8-byte node keys and one decimal, plus two
    * broadcast scalar totals — no payload ever enters an exchange.
    */
  def hits(edges: DataFrame, srcCol: String, dstCol: String,
           iterations: Int): DataFrame = {
    require(iterations >= 1, s"iterations must be >= 1, got $iterations")
    def r9(c: Column): Column =
      graft.functions.fast_round(c, 9).cast("decimal(38,9)")
    val zero = lit(0.0).cast("decimal(38,9)")
    val ed = edges.select(col(srcCol).cast("long").as("u"),
        col(dstCol).cast("long").as("v"))
      .where(col("u") =!= col("v")).distinct().localCheckpoint()
    val nodes = ed.select(col("u").as("node"))
      .union(ed.select(col("v").as("node"))).distinct()
    var sc = nodes.select(col("node"),
      lit(1.0).cast("decimal(38,9)").as("hub"),
      lit(1.0).cast("decimal(38,9)").as("auth"))
    for (_ <- 1 to iterations) {
      val aSum = ed.join(sc.select(col("node").as("u"), col("hub")), "u")
        .groupBy(col("v").as("node")).agg(sum(col("hub")).as("s"))
      val aTot = aSum.agg(sum(col("s")).as("t"))
      val auth = aSum.crossJoin(broadcast(aTot))
        .select(col("node"),
          r9(col("s").cast("double") / col("t").cast("double")).as("auth"))
      val hSum = ed.join(auth.select(col("node").as("v"),
          col("auth").as("av")), "v")
        .groupBy(col("u").as("node")).agg(sum(col("av")).as("s"))
      val hTot = hSum.agg(sum(col("s")).as("t"))
      val hub = hSum.crossJoin(broadcast(hTot))
        .select(col("node"),
          r9(col("s").cast("double") / col("t").cast("double")).as("hub"))
      sc = nodes.join(hub, Seq("node"), "left")
        .join(auth, Seq("node"), "left")
        .select(col("node"), coalesce(col("hub"), zero).as("hub"),
          coalesce(col("auth"), zero).as("auth"))
    }
    sc.select(col("node"), col("hub").cast("double").as("hub"),
      col("auth").cast("double").as("authority"))
  }
}
