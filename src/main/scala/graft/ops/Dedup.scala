package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.functions.minhash_signature

/** Deduplication operators for large-scale training-data pipelines.
  *
  * Scale design: NO variant materializes an unblocked O(n²) pair space.
  * Exact dedup is a hash groupBy (one shuffle on the key). MinHash-LSH,
  * n-gram Jaccard (which rides the same candidate machinery) and SimHash
  * shuffle on small bucket keys (band hashes / hamming chunks) so candidate
  * pairs are generated per-bucket, cheaply estimated from signatures, and
  * only then exactly verified. Shingle sets are hashed to 8-byte longs
  * before anything shuffles — at 100 TB the shuffled payloads are ids,
  * band keys and fixed-width signatures, never document text.
  *
  * Degenerate-duplicate hardening: byte-identical boilerplate is the
  * COMMON case in web-scale dedup, and naive LSH re-quadratizes on it
  * (10⁵ identical docs land in the same bucket in every band). The
  * MinHash pipeline therefore groups identical shingle sets FIRST
  * (one `groupBy` on the content key), runs all pairwise machinery over
  * distinct contents only, and expands group pairs at the end — within a
  * content group every pair has Jaccard exactly 1.0, and across groups the
  * representatives' Jaccard is every member pair's Jaccard (identical
  * sets), so the expansion is exact and its cost is proportional to the
  * emitted pair set, which is the output's inherent size.
  */
object Dedup {

  /** A materializable LSH dedup result plus deterministic cache release.
    * `pairs` is lazy like any DataFrame; call `release()` after the
    * consuming action so repeated dedup runs in a long-lived session don't
    * accrete cached projections. `overCapBuckets()` reports how many
    * band buckets the size cap excluded from candidate generation (an
    * eager action — run it on demand, not in the hot path).
    */
  final case class LshRun(pairs: DataFrame, release: () => Unit, overCapBuckets: () => Long)

  /** Exact dedup: one row per distinct key, keeping the smallest id —
    * `groupBy(key).agg(min(id), count)`.
    */
  def exact(df: DataFrame, idCol: String, keyCols: Seq[String]): DataFrame =
    df.groupBy(keyCols.map(col): _*)
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("dup_count"))

  // ---------- shared text prep ----------

  /** Shingle set hashed to distinct longs in one codegen'd pass
    * ([[graft.expressions.ShingleHashes]]) — the only shingle
    * representation that ever leaves the row: 8 bytes per shingle instead
    * of the string, and exact-verification set ops run on longs.
    */
  def shingleHashes(text: Column, n: Int = 3): Column =
    graft.functions.shingle_hashes(text, n)

  // ---------- MinHash + LSH candidates → exact verification ----------

  /** MinHash-LSH near-dup pairs, the 100 TB-shaped pipeline:
    *
    *  1. per-row hashed shingle set, then ONE `groupBy` on the content key
    *     (the full hashed shingle set): identical documents collapse to a
    *     representative + member list before any pairwise machinery — a
    *     10⁵-identical-doc cluster contributes ONE row to LSH instead of
    *     quadratizing a bucket;
    *  2. MinHash signature per distinct content (`numHashes` longs, one
    *     codegen'd pass) — cached once;
    *  3. band → bucket-join on (band index, band hash) → distinct (a, b)
    *     candidates with a < b — the only wide shuffles carry band keys and
    *     8-byte ids. Buckets larger than `maxBucket` are excluded from
    *     candidate generation (see below);
    *  4. cheap estimate: matching-signature fraction, filtered with a 4σ
    *     margin below `threshold` (the margin makes THIS step lossless for
    *     true ≥threshold pairs; overall recall is bounded by step 3);
    *  5. exact Jaccard on hashed shingle sets for the survivors only;
    *  6. expansion: within-group pairs (jaccard exactly 1.0) plus
    *     representative pairs mapped onto their members (identical sets ⇒
    *     identical jaccard) — output-proportional, streamed via explode.
    *
    * Recall is probabilistic, as with any LSH banding: a pair with true
    * jaccard j is generated as a candidate with probability
    * 1−(1−j^r)^bands (r = numHashes/bands). At the default 16×8 geometry
    * that is ≈ 0.947 at j = 0.80 (pairs exactly at the threshold can be
    * missed ~5% of the time), ≈ 1−1e-4 at j = 0.90, and ≈ 1−1e-11 at
    * j = 0.95 — tune bands up (shorter rows) if near-threshold recall
    * matters more than candidate volume. Identical-content pairs
    * (jaccard = 1.0) are exempt: the content grouping finds them
    * deterministically. Emitted values are always exact.
    *
    * `maxBucket` bounds every bucket-join input: a band bucket holding
    * more than `maxBucket` DISTINCT contents (near-identical but unequal
    * boilerplate — identical content never reaches LSH) is dropped from
    * candidate generation. Pairs in a dropped bucket usually survive via
    * their other bands; `LshRun.overCapBuckets()` reports what was capped
    * so the caller can widen the cap or shorten bands deliberately rather
    * than discover a quadratic stage at runtime.
    *
    * Columns out: (a, b, jaccard) with exact jaccard ≥ threshold.
    */
  def minhashLshRun(df: DataFrame, idCol: String, textCol: String,
                    numHashes: Int = 128, bands: Int = 16,
                    shingleN: Int = 3, threshold: Double = 0.8,
                    maxBucket: Int = 1 << 16): LshRun = {
    require(numHashes % bands == 0, "numHashes must divide into bands")
    require(threshold > 0.0 && threshold <= 1.0, s"threshold must be in (0,1], got $threshold")
    val rowsPerBand = numHashes / bands

    // one cached projection per distinct content carries the content key
    // (sh), the representative id, the member list and the signature — all
    // four later stages (banding, two enrichment joins, expansion) reuse it
    val grouped = df.select(col(idCol).as("id"), shingleHashes(col(textCol), shingleN).as("sh"))
      .groupBy(col("sh"))
      .agg(min(col("id")).as("rep"), sort_array(collect_list(col("id"))).as("members"))
      .withColumn("sig", minhash_signature(col("sh"), numHashes))
      .persist(StorageLevel.MEMORY_AND_DISK)

    val banded = grouped.select(col("rep").as("id"),
        posexplode(array((0 until bands).map(b =>
          xxhash64(slice(col("sig"), b * rowsPerBand + 1, rowsPerBand))): _*)))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "bandHash")

    // bucket-size cap: one window count over the bucket key (the shuffle is
    // reused by the bucket join below, which partitions on the same key)
    val bucketW = Window.partitionBy(col("band"), col("bandHash"))
    val withN = banded.withColumn("bucket_n", count(lit(1)).over(bucketW))
    val capped = withN.where(col("bucket_n") <= maxBucket).drop("bucket_n")

    val l = capped.select(col("band"), col("bandHash"), col("id").as("a"))
    val r = capped.select(col("band"), col("bandHash"), col("id").as("b"))
    val candidates = l.join(r, Seq("band", "bandHash")).where(col("a") < col("b"))
      .select(col("a"), col("b")).distinct()

    // cheap estimate first (codegen'd agreement count; the 4σ margin below
    // the threshold makes this step lossless for true ≥threshold pairs),
    // then exact verification: shingle arrays are sorted, so intersection
    // is a codegen'd merge scan (no per-row hash sets)
    val margin = 4.0 * math.sqrt(threshold * (1 - threshold) / numHashes)
    val repPairs = candidates
      .join(grouped.select(col("rep").as("a"), col("sh").as("sha"), col("sig").as("siga")), "a")
      .join(grouped.select(col("rep").as("b"), col("sh").as("shb"), col("sig").as("sigb")), "b")
      .where(graft.functions.sig_match_count(col("siga"), col("sigb")).cast("double") / numHashes
        >= threshold - margin)
      .withColumn("inter", graft.functions.sorted_intersect_count(col("sha"), col("shb")).cast("double"))
      .withColumn("union", (size(col("sha")) + size(col("shb"))).cast("double") - col("inter"))
      .withColumn("jaccard", round(col("inter") / greatest(col("union"), lit(1.0)), 6))
      .where(col("jaccard") >= threshold)
      .select(col("a").as("ra"), col("b").as("rb"), col("jaccard"))

    // expansion. Within-group: every member pair of an identical-content
    // group, jaccard exactly 1.0 — posexplode + slice streams each member's
    // partners instead of materializing the whole pair array in one row.
    val within = grouped.where(size(col("members")) >= 2)
      .select(posexplode(col("members")).as(Seq("i", "a")), col("members"))
      .select(col("a"),
        explode(slice(col("members"), col("i") + lit(2), size(col("members")))).as("b"))
      .select(col("a"), col("b"), lit(1.0).as("jaccard"))

    // Cross-group: a representative pair's jaccard is every member pair's
    // jaccard (identical shingle sets); groups are disjoint so least/
    // greatest restores a < b.
    val cross = repPairs
      .join(grouped.select(col("rep").as("ra"), col("members").as("ma")), "ra")
      .join(grouped.select(col("rep").as("rb"), col("members").as("mb")), "rb")
      .select(explode(col("ma")).as("a0"), col("mb"), col("jaccard"))
      .select(col("a0"), explode(col("mb")).as("b0"), col("jaccard"))
      .select(least(col("a0"), col("b0")).as("a"), greatest(col("a0"), col("b0")).as("b"),
        col("jaccard"))

    LshRun(
      pairs = within.unionByName(cross),
      release = () => { grouped.unpersist(); () },
      overCapBuckets = () =>
        withN.where(col("bucket_n") > maxBucket)
          .select(col("band"), col("bandHash")).distinct().count())
  }

  /** [[minhashLshRun]] without the release handle — callers that run one
    * dedup per session (or clear the cache themselves) can keep the plain
    * DataFrame shape.
    */
  def minhashLsh(df: DataFrame, idCol: String, textCol: String,
                 numHashes: Int = 128, bands: Int = 16,
                 shingleN: Int = 3, threshold: Double = 0.8): DataFrame =
    minhashLshRun(df, idCol, textCol, numHashes, bands, shingleN, threshold).pairs

  // ---------- N-gram Jaccard (exact, LSH-prefiltered) ----------

  /** N-gram Jaccard near-dup pairs at scale: MinHash-LSH candidate
    * generation followed by exact verification — the same pipeline as
    * [[minhashLsh]] parameterized by shingle width (including its banding
    * recall bound; emitted jaccard values are exact, candidate recall near
    * the threshold is probabilistic). Replaces the former blocked all-pairs
    * form, whose O(n²/blocks) pair space was quadratic at any fixed block
    * cardinality.
    * Columns out: (a, b, jaccard) with exact jaccard ≥ threshold.
    */
  def ngramJaccard(df: DataFrame, idCol: String, textCol: String,
                   n: Int = 4, threshold: Double = 0.8): DataFrame =
    minhashLsh(df, idCol, textCol, numHashes = 128, bands = 16,
      shingleN = n, threshold = threshold)

  /** Blocked exact all-pairs Jaccard — only safe when every block is known
    * to be small (e.g. pre-grouped micro-batches); kept for completeness,
    * NOT the scale path ([[ngramJaccard]] is).
    */
  def ngramJaccardBlocked(df: DataFrame, idCol: String, textCol: String,
                          blockCol: String, n: Int = 3): DataFrame = {
    val base = df.select(col(blockCol).as("blk"), col(idCol).as("id"),
      shingleHashes(col(textCol), n).as("sh"))
    val l = base.select(col("blk"), col("id").as("a"), col("sh").as("sha"))
    val r = base.select(col("blk"), col("id").as("b"), col("sh").as("shb"))
    l.join(r, Seq("blk")).where(col("a") < col("b"))
      .withColumn("inter", graft.functions.sorted_intersect_count(col("sha"), col("shb")).cast("double"))
      .withColumn("union", (size(col("sha")) + size(col("shb"))).cast("double") - col("inter"))
      .select(col("a"), col("b"),
        round(col("inter") / greatest(col("union"), lit(1.0)), 6).as("jaccard"))
  }

  // ---------- SimHash ----------

  /** 61-bit token hash from two polynomial rolling hashes (bases 31/131,
    * moduli 1e9+7 and 2^31−1): h1·2³¹ | h2. Every step is exact BIGINT
    * arithmetic, so the whole SimHash below is restatable in ANSI SQL —
    * the correctness oracle recomputes it independently.
    */
  def tokenHash61(t: String): Long = {
    var h1 = 0L; var h2 = 0L; var i = 0
    while (i < t.length) {
      val c = t.charAt(i).toInt
      h1 = (h1 * 31 + c) % 1000000007L
      h2 = (h2 * 131 + c) % 2147483647L
      i += 1
    }
    (h1 << 31) | h2
  }

  /** Per-row SimHash over whitespace tokens (duplicates weighted, in-row,
    * no shuffle): bit b of the output is set iff more token hashes have bit
    * b set than clear.
    */
  val simhash64: Seq[String] => Long = { toks =>
    val acc = new Array[Int](64)
    toks.foreach { t =>
      val h = tokenHash61(t)
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) acc(b) += 1 else acc(b) -= 1
        b += 1
      }
    }
    var out = 0L
    var b = 0
    while (b < 64) { if (acc(b) > 0) out |= (1L << b); b += 1 }
    out
  }

  /** ASCII-only, empty-filtered whitespace tokens — the canonical SimHash
    * token stream, identical to the SQL restatement's.
    */
  def simhashTokens(text: Column): Column =
    filter(TextAnalysis.tokens(TextAnalysis.asciiOnly(text)), t => t =!= "")

  /** SimHash near-dup candidate pairs: hamming distance ≤ maxHamming.
    * Blocking: split the 64-bit hash into (maxHamming+1) chunks — by
    * pigeonhole, any pair within distance maxHamming shares at least one
    * exact chunk — bucket-join on (chunk index, chunk value). The blocking
    * is exact (zero false negatives), unlike MinHash banding.
    *
    * Scale envelope: with maxHamming=3 the chunk space is 2^16 per chunk
    * index; expected bucket occupancy is n/65536, so the per-bucket join
    * stays linear-ish up to n ≈ 10^8-10^9 docs. Beyond that, lower
    * maxHamming (wider chunks) or recurse the pigeonhole (split each chunk
    * again and require two matches) to keep buckets bounded.
    */
  def simhashPairs(df: DataFrame, idCol: String, textCol: String,
                   maxHamming: Int = 3): DataFrame = {
    // maxHamming=0 would give bitsPer=64 and (1L<<64)-1 == 0 (Java shifts
    // mod 64), silently collapsing all rows into one bucket; require >= 1
    // (exact duplicates are a plain groupBy on the full hash, not blocking).
    require(maxHamming >= 1 && maxHamming <= 15, s"maxHamming must be in [1,15], got $maxHamming")
    val chunks = maxHamming + 1
    val bitsPer = 64 / chunks
    val shUdf = udf(simhash64)
    val hashed = df.select(col(idCol).as("id"),
      shUdf(simhashTokens(col(textCol))).as("sh"))

    val banded = hashed.select(col("id"), col("sh"),
        posexplode(array((0 until chunks).map(c =>
          shiftright(col("sh"), c * bitsPer).bitwiseAND(lit((1L << bitsPer) - 1))): _*)))
      .withColumnRenamed("pos", "chunk").withColumnRenamed("col", "chunkVal")

    val l = banded.select(col("chunk"), col("chunkVal"), col("id").as("a"), col("sh").as("sha"))
    val r = banded.select(col("chunk"), col("chunkVal"), col("id").as("b"), col("sh").as("shb"))
    l.join(r, Seq("chunk", "chunkVal")).where(col("a") < col("b"))
      .select(col("a"), col("b"), bit_count(col("sha").bitwiseXOR(col("shb"))).cast("long").as("hamming"))
      .dropDuplicates("a", "b")
      .where(col("hamming") <= maxHamming)
  }

  // ---------- Embedding cosine near-dup ----------

  /** Near-duplicate detection on an embedding column via cosine similarity,
    * exact within LSH buckets: candidate pairs share a `bucketCol` value
    * (use [[graft.functions.hyperplane_signature]] — at scale the table is
    * written `partitionBy(bucket)` so the join never leaves a partition),
    * then exact cosine ≥ minSim.
    *
    * Size nBits to the corpus: expected occupancy is n/2^nBits and the
    * per-bucket join is quadratic in occupancy, so pick
    * nBits ≈ log2(n) − 10..14 (e.g. 24-30 bits for 10^9-10^10 rows; more
    * bits trade recall for speed like any sign-LSH).
    * Columns out: (a, b, cosine_sim).
    */
  def cosineNearDup(df: DataFrame, idCol: String, vecCol: String,
                    bucketCol: Column, minSim: Double): DataFrame = {
    val base = df.select(bucketCol.as("bkt"), col(idCol).as("id"), col(vecCol).as("v"))
    val l = base.select(col("bkt"), col("id").as("a"), col("v").as("va"))
    val r = base.select(col("bkt"), col("id").as("b"), col("v").as("vb"))
    l.join(r, Seq("bkt")).where(col("a") < col("b"))
      .select(col("a"), col("b"),
        round(lit(1.0) - graft.functions.vector_distance(col("va"), col("vb"), "cosine"), 6)
          .as("cosine_sim"))
      .where(col("cosine_sim") >= minSim)
      .dropDuplicates("a", "b")
  }
}
