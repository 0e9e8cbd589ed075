package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Relational join patterns for the shapes that break at 100 TB.
  *
  * Catalyst already picks broadcast-hash for a small side and AQE splits
  * skewed SORT-MERGE partitions at runtime (spec-asserted in
  * SparkOpsSpec's "AQE splits a skewed join partition") — use those
  * first. This module covers the cases AQE misses:
  *  - a downstream aggregate keyed on the JOIN key: the skew rule
  *    declines to split rather than break the shared partitioning and
  *    insert an extra exchange (observed, spec-documented), so the hot
  *    partition survives exactly when the query shape is
  *    join-then-group-on-key — salting re-keys both stages;
  *  - both sides too big to broadcast with a key so hot (a handful of
  *    users/domains owning a double-digit share of rows) that even
  *    split replicas of its probe side all wait on one build-side
  *    partition.
  */
object Joins {

  /** Salted equi-join for hot keys: the big (probe) side gets a
    * deterministic salt in [0, saltFactor) hashed from its unique id, the
    * small-but-unbroadcastable (build) side replicates each row
    * `saltFactor` times, and the join runs EQUI on (key, salt) — the hot
    * key's rows spread over `saltFactor` shuffle partitions instead of
    * one, at the price of a `saltFactor`× build-side blowup. Exactly the
    * classic skew-salting recipe, packaged so callers don't hand-roll the
    * replication (and so the salt is DETERMINISTIC — `rand()` salts make
    * retried tasks emit different rows under speculative execution;
    * xxhash64 of the row id keeps recomputation idempotent).
    *
    * Result = `big ⋈ build` on `keyCol` exactly (inner), every big column
    * then every `payload` column of `build`. Pick `saltFactor` ≈ the
    * hot-key share × target parallelism; 8–32 covers most skew without a
    * meaningful build-side cost.
    */
  def saltedJoin(big: DataFrame, bigIdCol: String, build: DataFrame,
                 keyCol: String, saltFactor: Int,
                 payload: Seq[String]): DataFrame = {
    require(saltFactor > 0, s"saltFactor must be positive, got $saltFactor")
    val b = big.withColumn("__salt", pmod(xxhash64(col(bigIdCol)), lit(saltFactor.toLong)))
    val r = build.select(
      Seq(col(keyCol).as("__rk"),
        explode(sequence(lit(0L), lit(saltFactor - 1L))).as("__salt")) ++
        payload.map(p => col(p).as("__p_" + p)): _*)
    b.join(r, b(keyCol) === r("__rk") && b("__salt") === r("__salt"))
      .select(big.columns.map(b(_)) ++ payload.map(p => r("__p_" + p).as(p)): _*)
  }

  /** Star join against a Hive-partitioned fact store, shaped so Catalyst
    * inserts DYNAMIC partition pruning: the dim side's filter runs first
    * and its surviving keys become a runtime `IN` filter on the fact
    * scan's PARTITION column, so only matching partition directories are
    * listed and read — the partitions a static planner cannot prune
    * because the qualifying keys are data (in the dim table), not
    * literals in the query.
    *
    * The 100 TB economics: a type/date-partitioned event log joined to a
    * filtered dimension ("conversion event types", "holiday dates") reads
    * only the qualifying partitions' bytes; with the dim side broadcast
    * (it is, at dim size), the pruning subquery REUSES the broadcast
    * result, so the filter is free. This is the third file-skipping lever
    * after static partition filters (events_partitioned_agg) and bucket
    * pruning — and the only one driven by a JOIN.
    *
    * Constraints that make or break the insertion (all checked by the
    * dpp spec's plan assertion, which requires `dynamicpruningexpression`
    * in the fact scan's PartitionFilters and fewer files read than the
    * store holds):
    *  - `partitionKey` must be a PARTITION column of the fact store —
    *    pruning a data column prunes nothing at listing time;
    *  - `dim` must carry a SELECTIVE predicate that survives to the
    *    optimized plan: a filtered datasource scan qualifies, but a
    *    filtered in-memory `createDataFrame` does NOT (Catalyst folds the
    *    filter into the LocalRelation and the pruning rule no longer sees
    *    a predicate to push) — keep dims on storage, where they live at
    *    scale anyway.
    */
  def dimPrunedFactJoin(fact: DataFrame, partitionKey: String,
                        dim: DataFrame, dimKey: String): DataFrame = {
    require(fact.columns.contains(partitionKey),
      s"dimPrunedFactJoin: fact has no column $partitionKey")
    require(dim.columns.contains(dimKey),
      s"dimPrunedFactJoin: dim has no column $dimKey")
    fact.join(dim, fact(partitionKey) === dim(dimKey))
  }

  /** Bucketed table write — the PRE-SHUFFLED layout for repeated big-big
    * joins. `bucketBy(n, key)` hash-partitions rows into n files per
    * write-task group and records the bucket spec in the catalog;
    * a later join of two tables bucketed on the same key with the same n
    * plans WITHOUT a shuffle on either side (zero Exchange — asserted in
    * SparkOpsSpec): each bucket pair joins independently, the sort is
    * per-bucket (sortBy pre-orders the files).
    *
    * The 100 TB economics: a fact table joined every run pays its shuffle
    * ONCE at write time, not per query — this is Spark's answer to the
    * co-located join, and the reason the write goes through the catalog
    * (`saveAsTable` with an explicit `path`): pure path-based parquet has
    * nowhere to carry the bucket spec.
    */
  def writeBucketed(df: DataFrame, table: String, path: String,
                    keyCol: String, buckets: Int): Unit =
    df.write.mode("overwrite").format("parquet")
      .option("path", path)
      .bucketBy(buckets, keyCol).sortBy(keyCol)
      .saveAsTable(table)
}
