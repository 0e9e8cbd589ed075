package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import scala.util.hashing.MurmurHash3

/** Deduplication operators for large-scale training-data pipelines.
  *
  * Scale design: every variant avoids the O(n²) cross join. Exact dedup is
  * a hash groupBy (one shuffle on the key). MinHash-LSH and SimHash shuffle
  * on small bucket keys (band hashes / hamming chunks) so candidate pairs
  * are generated per-bucket, then verified. N-gram Jaccard uses a blocking
  * key to bound the pair space. At 100 TB the only shuffles are on compact
  * signatures — never on document text.
  */
object Dedup {

  /** Exact dedup: one row per distinct key, keeping the smallest id —
    * `groupBy(key).agg(min(id), count)`.
    */
  def exact(df: DataFrame, idCol: String, keyCols: Seq[String]): DataFrame =
    df.groupBy(keyCols.map(col): _*)
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("dup_count"))

  // ---------- shared text prep ----------

  /** Character n-gram shingles of lowercased printable-ASCII text, distinct. */
  def shingles(text: Column, n: Int = 3): Column = {
    val clean = lower(TextAnalysis.asciiOnly(text))
    array_distinct(
      when(length(clean) < n, array(clean)).otherwise(
        transform(sequence(lit(1), length(clean) - (n - 1)),
          i => substring(clean, i, lit(n)))))
  }

  /** Deterministic 64-bit hash of a string under a seed (MurmurHash3-based,
    * pure JVM, stable across runs/partitions).
    */
  def hash64(s: String, seed: Int): Long = {
    val h1 = MurmurHash3.stringHash(s, seed)
    val h2 = MurmurHash3.stringHash(s, h1 ^ 0x9e3779b9)
    (h1.toLong << 32) | (h2.toLong & 0xffffffffL)
  }

  // ---------- MinHash + LSH ----------

  /** SplitMix64 finalizer — derives a family of cheap independent hash
    * functions from one strong per-shingle hash (standard one-hash MinHash).
    */
  @inline private def mix64(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** Per-row MinHash signature: minima of `numHashes` derived hash
    * functions over the shingle set. One string hash per shingle + cheap
    * mixing per function; computed in-row (no explode, no shuffle).
    */
  def minhashSignature(numHashes: Int): Seq[String] => Array[Long] = { sh =>
    val sig = Array.fill(numHashes)(Long.MaxValue)
    sh.foreach { s =>
      val base = hash64(s, 0)
      var i = 0
      while (i < numHashes) {
        val h = mix64(base ^ (i.toLong * 0xc2b2ae3d27d4eb4fL))
        if (h < sig(i)) sig(i) = h
        i += 1
      }
    }
    sig
  }

  /** MinHash-LSH near-dup pairs, the 100 TB-shaped pipeline:
    *
    *  1. per-row signature (`numHashes` longs) — map-only;
    *  2. band → bucket-join on (band index, band hash) → distinct (a, b)
    *     candidates with a < b — the only shuffles carry signatures and
    *     8-byte ids, never text or shingle sets;
    *  3. cheap verification: estimated Jaccard = matching signature
    *     fraction, filtered with a 4σ margin below `threshold`;
    *  4. exact shingle Jaccard only for the survivors (a small join back
    *     to the shingle sets).
    *
    * Columns out: (a, b, jaccard) with exact jaccard ≥ threshold.
    */
  def minhashLsh(df: DataFrame, idCol: String, textCol: String,
                 numHashes: Int = 64, bands: Int = 16,
                 shingleN: Int = 3, threshold: Double = 0.7): DataFrame = {
    require(numHashes % bands == 0, "numHashes must divide into bands")
    val rowsPerBand = numHashes / bands
    val sigUdf = udf(minhashSignature(numHashes))

    val base = df.select(col(idCol).as("id"), shingles(col(textCol), shingleN).as("sh"))
    val sigs = base.select(col("id"), sigUdf(col("sh")).as("sig"))

    val banded = sigs.select(col("id"), col("sig"),
        posexplode(array((0 until bands).map(b =>
          xxhash64(slice(col("sig"), b * rowsPerBand + 1, rowsPerBand))): _*)))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "bandHash")

    val l = banded.select(col("band"), col("bandHash"), col("id").as("a"))
    val r = banded.select(col("band"), col("bandHash"), col("id").as("b"))
    val pairs = l.join(r, Seq("band", "bandHash")).where(col("a") < col("b"))
      .select(col("a"), col("b")).distinct()

    // cheap estimate from signatures; 4σ ≈ 4·sqrt(t(1-t)/H) margin
    val margin = 4.0 * math.sqrt(threshold * (1 - threshold) / numHashes)
    val withSigs = pairs
      .join(sigs.select(col("id").as("a"), col("sig").as("siga")), "a")
      .join(sigs.select(col("id").as("b"), col("sig").as("sigb")), "b")
      .withColumn("est",
        size(filter(zip_with(col("siga"), col("sigb"), (x, y) => x === y), p => p))
          .cast("double") / numHashes)
      .where(col("est") >= threshold - margin)
      .select(col("a"), col("b"))

    // exact verification only for estimate survivors
    withSigs
      .join(base.select(col("id").as("a"), col("sh").as("sha")), "a")
      .join(base.select(col("id").as("b"), col("sh").as("shb")), "b")
      .withColumn("inter", size(array_intersect(col("sha"), col("shb"))).cast("double"))
      .withColumn("union", (size(col("sha")) + size(col("shb"))).cast("double") - col("inter"))
      .withColumn("jaccard", round(col("inter") / greatest(col("union"), lit(1.0)), 6))
      .where(col("jaccard") >= threshold)
      .select(col("a"), col("b"), col("jaccard"))
  }

  // ---------- SimHash ----------

  /** Per-row 64-bit SimHash over whitespace tokens (in-row, no shuffle). */
  val simhash64: Seq[String] => Long = { toks =>
    val acc = new Array[Int](64)
    toks.foreach { t =>
      val h = hash64(t, 0x5151)
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

  /** SimHash near-dup candidate pairs: hamming distance ≤ maxHamming.
    * Blocking: split the 64-bit hash into (maxHamming+1) chunks — by
    * pigeonhole, any pair within distance maxHamming shares at least one
    * exact chunk — bucket-join on (chunk index, chunk value).
    * Columns out: (a, b, hamming).
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
      shUdf(TextAnalysis.tokens(col(textCol))).as("sh"))

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

  // ---------- N-gram Jaccard (blocked exact) ----------

  /** Exact n-gram Jaccard similarity for all pairs within a blocking key
    * (e.g. `source`), built entirely from codegen'd array built-ins.
    * Columns out: (a, b, jaccard).
    */
  def ngramJaccard(df: DataFrame, idCol: String, textCol: String,
                   blockCol: String, n: Int = 3): DataFrame = {
    val base = df.select(col(blockCol).as("blk"), col(idCol).as("id"),
      shingles(col(textCol), n).as("sh"))
    val l = base.select(col("blk"), col("id").as("a"), col("sh").as("sha"))
    val r = base.select(col("blk"), col("id").as("b"), col("sh").as("shb"))
    l.join(r, Seq("blk")).where(col("a") < col("b"))
      .withColumn("inter", size(array_intersect(col("sha"), col("shb"))).cast("double"))
      .withColumn("union", (size(col("sha")) + size(col("shb"))).cast("double") - col("inter"))
      .select(col("a"), col("b"),
        round(col("inter") / greatest(col("union"), lit(1.0)), 6).as("jaccard"))
  }

  // ---------- Embedding cosine near-dup ----------

  /** Near-duplicate detection on an embedding column via cosine similarity.
    * Exact within LSH buckets (see [[Ann.hyperplaneBuckets]]) at scale; this
    * entry point is the blocked-exact form over a bucket column.
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
