package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Pipeline

/** Structural invariants of the end-to-end crawl → shards composition
  * ([[graft.ops.Pipeline.curateCrawl]]) on a small synthetic crawl.
  * Value-level correctness is the `pipeline_e2e` gate's staged-replay
  * oracle; this spec pins the contract surface: schema, stage-drop
  * classes reaching the output, the per-domain cap, the packing prefix
  * sum and the shard partitioning — cheap enough to run in `sbt test`.
  */
class PipelineSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkTestSession.spark

  private def crawl(n: Int): DataFrame = {
    val did = col("doc_id")
    val body = concat(
      lit("the quick brown fox number "), did.cast("string"),
      lit(" jumps over one lazy dog. it runs near marker m"), did.cast("string"),
      lit("a and m"), did.cast("string"), lit("b then m"), did.cast("string"),
      lit("c every single day with speed."))
    val url = concat(lit("https://site"), (did % 3).cast("string"), lit(".com"),
      when(did % 5 === 4, lit("/blocked/")).otherwise(lit("/ok/")),
      did.cast("string"))
    val html = concat(lit("<html><body><article><p>"), body,
      lit("</p></article></body></html>"))
    val warc = concat(
      lit("WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: "), url,
      lit("\r\nContent-Length: "), length(html).cast("string"),
      lit("\r\n\r\n"), html, lit("\r\n\r\n"))
    spark.range(n).select(col("id").as("doc_id"), warc.as("warc"))
  }

  test("curateCrawl: schema, robots drops, cap, pack prefix sum, shard range") {
    val out = java.nio.file.Files.createTempDirectory("graft_pspec").toString + "/shards"
    val robots = spark.range(3).select(
      concat(lit("site"), col("id").cast("string"), lit(".com")).as("host"),
      lit("user-agent: *\ndisallow: /blocked/\n").as("txt"))
    val bench = spark.range(1).select(lit("completely unrelated benchmark sentence").as("text"))
    val res = Pipeline.curateCrawl(crawl(60), "doc_id", "warc",
      robots, "host", "txt", bench, "text", out,
      Pipeline.CurateConfig(capPerDomain = 12, packBudget = 128,
        nShards = 2, shardBuckets = 8)).cache()

    assert(res.columns.toSeq === Seq("doc_id", "domain", "text", "n_tokens",
      "start_offset", "pack_id", "crosses", "shuffle_pos", "shard"))

    val rows = res.orderBy("doc_id").collect()
    assert(rows.nonEmpty)
    // robots: every doc_id ≡ 4 (mod 5) hit the /blocked/ path (lowercase
    // field names + the literal-prefix rule) and must be absent
    assert(rows.forall(_.getLong(0) % 5 != 4))
    // per-domain cap
    val perDomain = res.groupBy("domain").count().collect()
    assert(perDomain.forall(_.getLong(1) <= 12))
    // packing: start_offset is the exact prefix sum of n_tokens in id order
    var cum = 0L
    rows.foreach { r =>
      assert(r.getLong(4) === cum, s"offset mismatch at doc ${r.getLong(0)}")
      cum += r.getLong(3)
      assert(r.getLong(5) === r.getLong(4) / 128) // pack_id = offset div budget
    }
    // shards: ids in [0, nShards), every shard non-empty at this size,
    // and shuffle_pos is a permutation of 0..n-1
    val shards = rows.map(_.getInt(8)).toSet
    assert(shards.subsetOf(Set(0, 1)) && shards.size === 2)
    assert(rows.map(_.getLong(7)).sorted.toSeq === (0L until rows.length).toSeq)
    res.unpersist()
  }
}
