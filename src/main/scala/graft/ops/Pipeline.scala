package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The end-to-end crawl → training-shards composition as ONE library
  * call — the product claim the per-operator surface adds up to. A user
  * hands in raw WARC captures, per-host robots.txt, and a benchmark
  * corpus; out come curated, packed, shard-written documents.
  *
  * Fourteen stages, every one an operator with its own correctness gate:
  * WARC ingest → robots.txt policy → main-content extraction → mojibake
  * repair → C4 line cleaning → language gate → URL dedup → MinHash
  * near-dup → sentence-level dedup → benchmark decontamination →
  * quality filter → per-site (eTLD+1) cap → sequence packing → shard
  * write with readback. The composition itself is gated end-to-end
  * (`pipeline_e2e`, staged-replay oracle).
  *
  * Scale shape: each stage keeps its own documented shape (zero-shuffle
  * per-row chains, narrow-keyed exchanges, bounded heaps); the chain
  * MATERIALIZES at five boundaries so downstream self-joins (sentence
  * dedup, minhash banding) and the multi-action shard write never replay
  * the upstream lineage. Local runs use `localCheckpoint` (executor
  * block storage); on a multi-executor cluster swap the barrier for
  * parquet stages — the stage list is the natural restart boundary set.
  */
object Pipeline {

  /** Tuning knobs, one per stage that has any. Defaults match the
    * operators' own defaults except where the composition changes the
    * regime: `minhashShingleN` = 12 because post-cleaning documents
    * that share boilerplate STRUCTURE (same template, different
    * entities) sit near char-3-shingle jaccard 0.8 — 12-char windows
    * keep entity-level differences visible to the banding.
    */
  final case class CurateConfig(
      keepLangs: Set[String] = Set("en"),
      c4MinWords: Int = 5,
      minhashNumHashes: Int = 128,
      minhashBands: Int = 16,
      minhashShingleN: Int = 12,
      minhashThreshold: Double = 0.9,
      decontamNgram: Int = 3,
      qualityMinWords: Int = 10,
      qualityMaxWords: Int = 100000,
      domainSuffixes: Seq[String] = Seq("com", "org", "net"),
      capPerDomain: Int = 25,
      packBudget: Long = 2048L,
      nShards: Int = 8,
      shardBuckets: Int = 1024)

  /** [[curateCrawlAudited]]'s result pair: the curated per-document
    * frame and the stage FUNNEL — one row per drop stage with the
    * surviving document count, the audit artifact a production run logs
    * (a stage that silently eats the corpus shows up as a cliff here
    * long before anyone reads shard sizes).
    */
  final case class Curated(docs: DataFrame, funnel: DataFrame)

  /** Run the full chain. `captures` is (idCol, warcCol: WARC text
    * blob); `robots` is (hostCol, txtCol: robots.txt body); `bench` is
    * the benchmark corpus (benchTextCol). Training shards land under
    * `shardDir` (Hive-partitioned by shard, deterministic membership —
    * see [[Curation.writeTrainingShards]]); the returned frame is the
    * per-document result read BACK from that store: (idCol, domain,
    * text, n_tokens, start_offset, pack_id, crosses, shuffle_pos,
    * shard). The frame is materialized before return, so the internal
    * minhash resources are already released.
    */
  def curateCrawl(captures: DataFrame, idCol: String, warcCol: String,
                  robots: DataFrame, robotsHostCol: String, robotsTxtCol: String,
                  bench: DataFrame, benchTextCol: String,
                  shardDir: String,
                  cfg: CurateConfig = CurateConfig()): DataFrame =
    curateCrawlAudited(captures, idCol, warcCol, robots, robotsHostCol,
      robotsTxtCol, bench, benchTextCol, shardDir, cfg).docs

  /** [[curateCrawl]] plus the stage funnel: (stage_idx, stage, n_docs)
    * for the eight document-dropping stages. Counts run against the
    * stage-boundary frames (checkpointed or one scan deep), so the
    * audit costs a handful of count jobs, never a lineage replay.
    */
  def curateCrawlAudited(captures: DataFrame, idCol: String, warcCol: String,
                         robots: DataFrame, robotsHostCol: String, robotsTxtCol: String,
                         bench: DataFrame, benchTextCol: String,
                         shardDir: String,
                         cfg: CurateConfig = CurateConfig()): Curated = {
    val spark = captures.sparkSession

    // S1: WARC ingest — response records only
    val recs = Warc.warcRecords(captures, idCol, warcCol)
      .where(col("warc_type") === "response")
      .select(col(idCol), col("target_uri").as("url"), col("payload"))

    // S2: robots.txt policy (fail-open for hosts without rules)
    val withHp = recs
      .withColumn("host", regexp_extract(col("url"), "https?://([^/]+)", 1))
      .withColumn("path",
        when(regexp_extract(col("url"), "https?://[^/]+(/.*)$", 1) === "", "/")
          .otherwise(regexp_extract(col("url"), "https?://[^/]+(/.*)$", 1)))
    val rules = Robots.parseRules(robots.select(
      col(robotsHostCol).as("host"), col(robotsTxtCol).as("txt")), "host", "txt")
    val verdicts = Robots.robotsFilter(
      withHp.select(col(idCol), col("host"), col("path")),
      idCol, "host", "path", rules, "host")
    val allowed = withHp.join(verdicts.where(col("allowed")).select(idCol), idCol)

    // S3+S4: main-content extraction, mojibake repair
    val extracted = allowed.select(col(idCol), col("url"), col("host"),
      TextAnalysis.fixMojibake(
        TextAnalysis.extractMainContent(col("payload"))).as("t1"))

    // S5: sentence-line rendering + C4 line cleaning. extractMainContent
    // joins blocks with single spaces, so line structure is re-derived
    // at sentence boundaries before the line rules apply.
    val lined = extracted.withColumn("t1",
      regexp_replace(col("t1"), "([.!?]) +", "$1\n"))
    val c4 = Curation.c4LineFilter(lined, idCol, "t1", cfg.c4MinWords)
      .select(col(idCol), col("clean_text").as("text"))
      .join(extracted.select(idCol, "url", "host"), idCol)
      .localCheckpoint()

    // S6: language gate
    val en = c4.where(TextAnalysis.langIdScript(col("text"))
        .isin(cfg.keepLangs.toSeq: _*))
      .localCheckpoint()

    // S7: URL-level keep-first dedup
    val urld = TextAnalysis.dedupByCanonicalUrl(en, idCol, "url").drop("canon_url")

    // S8: document-level near-dup — drop every verified pair's b side
    val run = Dedup.minhashLshRun(urld, idCol, "text",
      numHashes = cfg.minhashNumHashes, bands = cfg.minhashBands,
      shingleN = cfg.minhashShingleN, threshold = cfg.minhashThreshold)
    val nd = urld.join(run.pairs.select(col("b").as(idCol)).distinct(),
      Seq(idCol), "left_anti").localCheckpoint()

    // S9: sentence-level exact dedup (keep-first corpus-wide)
    val sd = Dedup.sentenceDedup(nd, idCol, "text")
      .drop("n_sentences", "n_removed").localCheckpoint()

    // S10: benchmark decontamination
    val dec = sd.join(
      Curation.decontaminate(sd, bench.select(col(benchTextCol).as("text")),
          idCol, "text", cfg.decontamNgram)
        .where(!col("contaminated")).select(idCol), idCol)

    // S11: quality filter
    val q = dec.join(
      Curation.qualityFilter(dec, idCol, "text",
          cfg.qualityMinWords, cfg.qualityMaxWords)
        .where(col("keep")).select(idCol), idCol)

    // S12: per-site (eTLD+1) cap
    val dom = q.withColumn("domain",
      TextAnalysis.registeredDomain(col("host"), cfg.domainSuffixes)
        .getField("registered_domain"))
    val capped = dom.join(
      Curation.capPerKey(dom, "domain", idCol, cfg.capPerDomain)
        .select(idCol), idCol)

    // S13: sequence packing
    val packed = capped.join(
      Curation.packSequences(capped, idCol, "text", budget = cfg.packBudget),
      idCol).localCheckpoint()

    // S14: shard write + READBACK — the output's shard/pos certify what
    // landed on disk, not what the plan intended
    Curation.writeTrainingShards(packed, idCol, col("n_tokens"), shardDir,
      cfg.nShards, nBuckets = cfg.shardBuckets)
    val onDisk = spark.read.parquet(shardDir)
      .select(col(idCol), col("shuffle_pos"), col("shard"))
    val result = packed.join(onDisk, idCol)
      .select(col(idCol), col("domain"), col("text"), col("n_tokens"),
        col("start_offset"), col("pack_id"), col("crosses"),
        col("shuffle_pos").cast("long").as("shuffle_pos"),
        col("shard").cast("int").as("shard"))
      .localCheckpoint()
    run.release()

    val funnelRows = Seq(
      ("ingest", recs.count()), ("robots", allowed.count()),
      ("lang", en.count()), ("url_dedup", urld.count()),
      ("near_dup", nd.count()), ("decontam", dec.count()),
      ("quality", q.count()), ("domain_cap", result.count()))
    import spark.implicits._
    val funnel = funnelRows.zipWithIndex
      .map { case ((st, n), i) => (i.toLong, st, n) }
      .toDF("stage_idx", "stage", "n_docs")
    Curated(result, funnel)
  }
}
