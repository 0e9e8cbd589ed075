package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import scala.util.Random

import graft.functions.{vectorLit, vector_distance}

/** Approximate nearest-neighbor search over an embedding column.
  *
  * Baseline: brute-force cosine/L2 top-k ([[Knn.fullScan]]) — one codegen'd
  * scan + TakeOrderedAndProject, the exact path.
  *
  * Scale path: random-hyperplane LSH bucketing. Each vector gets a
  * `nBits`-bit signature (sign of dot with seeded random hyperplanes);
  * probes search only their own bucket (plus multi-probe neighbors within
  * hamming 1), turning a 100 TB scan into a pruned partition-local scan.
  * Buckets are a plain column → the table can be written
  * `partitionBy("bucket")` so Parquet partition pruning skips everything
  * else on disk.
  */
object Ann {

  /** Deterministic random hyperplanes (unit-free; sign only). */
  def hyperplanes(nBits: Int, dim: Int, seed: Long = 42L): Array[Array[Float]] = {
    val rnd = new Random(seed)
    Array.fill(nBits)(Array.fill(dim)(rnd.nextGaussian().toFloat))
  }

  /** Signature column: bit b set iff dot(v, plane_b) > 0. Built from
    * codegen'd built-ins (aggregate over zip_with), no UDF.
    */
  def signature(vecCol: Column, planes: Array[Array[Float]]): Column = {
    planes.zipWithIndex.map { case (p, b) =>
      val dot = aggregate(zip_with(vecCol, vectorLit(p), (x, y) => x * y),
        lit(0.0), (acc, x) => acc + x)
      when(dot > 0.0, lit(1L << b)).otherwise(lit(0L))
    }.reduce(_ + _)
  }

  /** Add an LSH bucket column to a vector table. */
  def withBuckets(df: DataFrame, vecCol: String, nBits: Int, dim: Int, seed: Long = 42L): DataFrame =
    df.withColumn("bucket", signature(col(vecCol), hyperplanes(nBits, dim, seed)))

  def hyperplaneBuckets(vecCol: String, nBits: Int, dim: Int, seed: Long = 42L): Column =
    signature(col(vecCol), hyperplanes(nBits, dim, seed))

  /** ANN top-k: score only rows whose bucket is within hamming distance 1
    * of the probe's bucket (multi-probe LSH), then exact-rank the survivors.
    * The bucket filter is a plain integer IN-list → pushed to the scan.
    */
  def lshTopK(df: DataFrame, idCol: String, vecCol: String, probe: Array[Float],
              k: Int, metric: String, nBits: Int = 8, seed: Long = 42L): DataFrame = {
    val planes = hyperplanes(nBits, probe.length, seed)
    var sig = 0L
    planes.zipWithIndex.foreach { case (p, b) =>
      var dot = 0.0; var i = 0
      while (i < probe.length) { dot += probe(i).toDouble * p(i); i += 1 }
      if (dot > 0.0) sig |= (1L << b)
    }
    val probeBuckets = sig +: (0 until nBits).map(b => sig ^ (1L << b))
    val bucketed = if (df.columns.contains("bucket")) df else withBuckets(df, vecCol, nBits, probe.length, seed)
    Knn.topK(
      bucketed.where(col("bucket").isin(probeBuckets: _*))
        .select(col(idCol), vector_distance(col(vecCol), vectorLit(probe), metric).as("distance")),
      col("distance"), col(idCol), k)
  }
}
