package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.kernels.Quantize

/** Corpus-level embedding analysis: the top principal component by
  * distributed power iteration — the workhorse behind all-but-the-top
  * embedding postprocessing (Mu & Viswanath, ICLR 2018: subtracting the
  * dominant direction measurably improves similarity search), isotropy
  * audits, and drift detection between embedding model versions.
  *
  * The engine never materializes the dim×dim covariance: each power
  * iteration computes C·v as Σ_rows (x−μ)·⟨x−μ, v⟩ in ONE corpus scan —
  * a per-row dot against broadcast literals (μ, v), then per-lane sums.
  * The per-round shuffle is dim DECIMAL(38,9) partials per partition
  * (map-side combine), nothing row-shaped; the driver normalizes and
  * feeds the next round, exactly the kmeans_iter2 loop shape.
  *
  * Exactness contract (so an independent engine replays it bit for bit):
  * μ is the fixed-point `vector_avg` mean rounded to 6 dp; v₀ is the
  * uniform direction rounded to 9 dp; every per-row lane term
  * (x_i−μ_i)·⟨x−μ, v⟩ is one double tree rounded to 9 dp and summed as
  * DECIMAL(38,9) (order-independent reduce); normalization divides by
  * the sequential-index-order L2 norm and re-rounds each lane to 9 dp —
  * the per-round handoff. Power iteration's sign and convergence are
  * then deterministic functions of the data.
  */
object Embeddings {

  /** Fixed-point corpus mean, each lane rounded to 6 dp (the restatable
    * handoff). Null vectors are skipped; an empty corpus yields zeros.
    */
  def meanVector(df: DataFrame, vecCol: String, dim: Int): Array[Double] = {
    val row = df.where(col(vecCol).isNotNull)
      .agg(graft.functions.vector_avg(col(vecCol), dim).as("m")).head()
    if (row.isNullAt(0)) Array.fill(dim)(0.0)
    else row.getSeq[Double](0).map(Quantize.roundHalfUp(_, 6)).toArray
  }

  /** `rounds` power iterations for the top principal component.
    * Returns (unit loading vector (9 dp lanes), eigenvalue estimate
    * ‖C·v‖ from the last round, 6 dp). Degenerate corpora (empty, or a
    * point mass where C·v = 0) return the zero vector with eigenvalue 0.
    */
  def pcaTopComponent(df: DataFrame, vecCol: String, dim: Int,
                      rounds: Int = 3): (Seq[Double], Double) = {
    require(dim > 0, s"dim must be > 0, got $dim")
    require(rounds >= 1, s"rounds must be >= 1, got $rounds")
    val base = df.where(col(vecCol).isNotNull)
    val n = base.count()
    if (n == 0L) return (Seq.fill(dim)(0.0), 0.0)
    val mu = meanVector(base, vecCol, dim)
    val v = Array.fill(dim)(Quantize.roundHalfUp(1.0 / math.sqrt(dim.toDouble), 9))
    var eig = 0.0
    var r = 0
    while (r < rounds) {
      // one codegen'd pass per row computes the dot AND all dim rounded
      // lane terms (graft.kernels.Embed — bit-identical to the previous
      // interpreted HOF tree; the gates' hash equality is the proof)
      val w = base
        .select(posexplode(graft.functions.pca_lane_terms(col(vecCol), mu, v.clone()))
          .as(Seq("p0", "t0")))
        .select((col("p0") + 1).as("i"), col("t0").cast("decimal(38,9)").as("t"))
        .groupBy(col("i")).agg(sum(col("t")).as("w"))
        .collect()
        .map(row => row.getInt(0) -> row.getDecimal(1).doubleValue()).toMap
      val raw = Array.tabulate(dim)(i => w.getOrElse(i + 1, 0.0) / n.toDouble)
      var s2 = 0.0
      var i = 0
      while (i < dim) { s2 += raw(i) * raw(i); i += 1 }
      val norm = math.sqrt(s2)
      eig = norm
      if (norm == 0.0) return (raw.toSeq, 0.0)
      i = 0
      while (i < dim) { v(i) = Quantize.roundHalfUp(raw(i) / norm, 9); i += 1 }
      r += 1
    }
    (v.toSeq, Quantize.roundHalfUp(eig, 6))
  }

  /** Top-D principal components by power iteration WITH DEFLATION —
    * the general form all-but-the-top actually prescribes (Mu &
    * Viswanath remove the top D ≈ dim/100 directions, not one): after
    * each component converges, subsequent iterations orthogonalize the
    * iterate against every previously-found direction (classical
    * Gram-Schmidt on the driver — a D×dim handful of dot products),
    * re-round to the 9-dp handoff, and continue on the SAME corpus
    * scans. Cost: D × rounds scans, each the [[pcaTopComponent]] plan
    * (dim decimal partials per partition, nothing row-shaped moves).
    * Degenerate directions (deflated corpus collapses to zero) end the
    * list early. Returns (components (each 9-dp unit rows), eigenvalue
    * estimates (6 dp)).
    */
  def pcaTopComponents(df: DataFrame, vecCol: String, dim: Int, d: Int,
                       rounds: Int = 2): (Seq[Seq[Double]], Seq[Double]) = {
    require(d >= 1 && d <= dim, s"d must be in [1, $dim], got $d")
    require(rounds >= 1, s"rounds must be >= 1, got $rounds")
    val base = df.where(col(vecCol).isNotNull)
    val n = base.count()
    if (n == 0L) return (Seq.empty, Seq.empty)
    val mu = meanVector(base, vecCol, dim)
    val comps = scala.collection.mutable.ArrayBuffer[Seq[Double]]()
    val eigs = scala.collection.mutable.ArrayBuffer[Double]()
    var c = 0
    while (c < d) {
      // start from the uniform direction deflated against found comps
      var v = deflate(
        Array.fill(dim)(Quantize.roundHalfUp(1.0 / math.sqrt(dim.toDouble), 9)),
        comps.toSeq)
      if (v == null) return (comps.toSeq, eigs.toSeq)
      var eig = 0.0
      var r = 0
      var dead = false
      while (r < rounds && !dead) {
        val w = base
          .select(posexplode(graft.functions.pca_lane_terms(col(vecCol), mu, v.clone()))
            .as(Seq("p0", "t0")))
          .select((col("p0") + 1).as("i"), col("t0").cast("decimal(38,9)").as("t"))
          .groupBy(col("i")).agg(sum(col("t")).as("w"))
          .collect()
          .map(row => row.getInt(0) -> row.getDecimal(1).doubleValue()).toMap
        val raw = Array.tabulate(dim)(i => w.getOrElse(i + 1, 0.0) / n.toDouble)
        // deflation happens INSIDE the loop: C·v has components along
        // found directions (numerical leakage); remove them before the
        // normalize so each iterate stays in the orthogonal complement
        val defl = deflate(raw, comps.toSeq)
        if (defl == null) dead = true
        else {
          var s2 = 0.0
          var i = 0
          while (i < dim) { s2 += defl(i) * defl(i); i += 1 }
          val norm = math.sqrt(s2)
          eig = norm
          if (norm == 0.0) dead = true
          else {
            i = 0
            while (i < dim) { v(i) = Quantize.roundHalfUp(defl(i) / norm, 9); i += 1 }
          }
        }
        r += 1
      }
      if (dead) return (comps.toSeq, eigs.toSeq)
      comps += v.toSeq
      eigs += Quantize.roundHalfUp(eig, 6)
      c += 1
    }
    (comps.toSeq, eigs.toSeq)
  }

  /** Gram-Schmidt removal of `against` directions from `x`, 9-dp
    * re-rounded; null when the residual is numerically zero. Sequential
    * index-order dot products — the restatable tree.
    */
  private def deflate(x: Array[Double], against: Seq[Seq[Double]]): Array[Double] = {
    val out = x.clone()
    against.foreach { u =>
      var dot = 0.0
      var i = 0
      while (i < out.length) { dot += out(i) * u(i); i += 1 }
      i = 0
      while (i < out.length) { out(i) = out(i) - dot * u(i); i += 1 }
    }
    var i = 0
    var nz = false
    while (i < out.length) {
      out(i) = Quantize.roundHalfUp(out(i), 9)
      if (out(i) != 0.0) nz = true
      i += 1
    }
    if (nz) out else null
  }

  /** Semantic decontamination: flag corpus rows whose embedding sits
    * within `tau` (metric distance, default cosine) of ANY benchmark
    * vector — the embedding-space companion to n-gram `decontamOverlap`,
    * which catches paraphrased or reformatted eval leakage that exact
    * n-grams miss. The benchmark matrix rides along as a broadcast
    * literal (eval sets are small by definition); the scan is a pure
    * projection — per-row distances via the same codegen'd kernels as
    * k-NN, min, 6-dp round, threshold on the ROUNDED value (round-
    * before-decision) — so at 100 TB this is one shuffle-free pass.
    * Output: (id, min_dist, contaminated).
    */
  def semanticDecontam(df: DataFrame, idCol: String, vecCol: String,
                       bench: Seq[Seq[Float]], tau: Double,
                       metric: String = "cosine"): DataFrame = {
    require(bench.nonEmpty, "semanticDecontam needs at least one benchmark vector")
    val bLit = typedlit(bench)
    val dists = transform(bLit, b => graft.functions.vector_distance(col(vecCol), b, metric))
    df.where(col(vecCol).isNotNull)
      .withColumn("min_dist", graft.functions.fast_round(array_min(dists), 6))
      .withColumn("contaminated", col("min_dist") <= tau)
      .select(col(idCol), col("min_dist"), col("contaminated"))
  }

  /** All-but-the-top postprocessing (Mu & Viswanath 2018): center each
    * embedding and remove its projection on the dominant direction —
    * x′_i = (x_i − μ_i) − ⟨x−μ, v⟩·v_i, emitted as (id, pos, component)
    * rows with 6-dp components. A pure map over literals (μ, v): no
    * join, no shuffle — one codegen-friendly scan at any corpus size.
    */
  def removeTopComponent(df: DataFrame, idCol: String, vecCol: String, dim: Int,
                         mu: Array[Double], v: Seq[Double]): DataFrame = {
    require(mu.length == dim && v.length == dim, "mu/v must match dim")
    val muLit = array(mu.map(lit(_)): _*)
    val vLit = array(v.map(lit(_)): _*)
    val d = graft.functions.centered_dot(col(vecCol), mu, v.toArray)
    df.where(col(vecCol).isNotNull)
      .select(col(idCol), d.as("_d"), posexplode(col(vecCol)).as(Seq("p0", "x")))
      .select(col(idCol), col("p0").cast("long").as("pos"),
        graft.functions.fast_round(
          (col("x").cast("double") - element_at(muLit, col("p0") + 1))
            - col("_d") * element_at(vLit, col("p0") + 1), 6).as("component"))
  }

  /** Hard-negative mining for contrastive training: for every anchor
    * vector, the k nearest corpus vectors carrying a DIFFERENT label —
    * the examples a contrastive objective (InfoNCE, triplet) learns the
    * most from, and the standard retrieval-training companion to the
    * positive pairs a labeled corpus already gives.
    *
    * Plan shape (the [[graft.ops.Knn]] batch idiom): the anchor side —
    * bounded by construction, it is a training batch or a sampled probe
    * set — BROADCASTS; the corpus streams through ONE scan computing
    * every anchor×corpus distance into per-anchor bounded top-k heaps
    * (the `knn_topk` partial aggregate), so no corpus shuffle, no pair
    * materialization, memory `O(anchors · k)` per task. Anchor×corpus
    * distances ARE the workload; the pair space is bounded by the
    * broadcast side, never corpus².
    *
    * `roundDp ≥ 0` rounds the distance before the heap — the
    * deterministic tie-break grid (round, then id-ordered ties) the
    * correctness gate needs to hash-match an independent engine; -1
    * (default) keeps raw doubles. Output: (anchor_id, rank, neg_id,
    * distance), rank 1-based by (distance asc, neg_id asc).
    */
  def hardNegatives(anchors: DataFrame, aId: String, aVec: String, aLabel: String,
                    corpus: DataFrame, cId: String, cVec: String, cLabel: String,
                    k: Int, metric: String = "l2", roundDp: Int = -1,
                    maxAnchors: Long = 100000L): DataFrame = {
    require(k >= 1 && k <= 1000, s"k must be in [1, 1000], got $k")
    require(maxAnchors >= 1, s"maxAnchors must be >= 1, got $maxAnchors")
    val aRows = anchors.where(col(aVec).isNotNull)
      .select(col(aId).as("anchor_id"), col(aVec).as("_av"), col(aLabel).as("_al"))
    // the broadcast-boundedness contract, ENFORCED like every other
    // broadcast-literal op here (oovRate's topN cap, unimaxAllocation's
    // maxDomains): an unbounded anchor frame would OOM the broadcast,
    // and per-task heap memory is O(anchors · k). One count of the
    // (small) anchor side, never the corpus.
    val nAnchors = aRows.count()
    require(nAnchors <= maxAnchors,
      s"hardNegatives: $nAnchors anchors exceed maxAnchors=$maxAnchors; " +
        "the anchor side broadcasts and holds O(anchors * k) heap state per " +
        "task - sample the anchors or raise the knob consciously")
    val a = broadcast(aRows)
    val d0 = graft.functions.vector_distance(col(cVec), col("_av"), metric)
    val d = if (roundDp >= 0) round(d0, roundDp) else d0
    corpus.where(col(cVec).isNotNull)
      .crossJoin(a)
      .where(col(cLabel) =!= col("_al"))
      .select(col("anchor_id"), col(cId).as("neg_id"), d.as("distance"))
      .groupBy("anchor_id")
      .agg(graft.functions.knn_topk(col("distance"), col("neg_id"), k).as("tk"))
      .select(col("anchor_id"), posexplode(col("tk")))
      .select(col("anchor_id"), (col("pos") + 1).cast("long").as("rank"),
        col("col.id").as("neg_id"), col("col.distance").as("distance"))
  }
}
