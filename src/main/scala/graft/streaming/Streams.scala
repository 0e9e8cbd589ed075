package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Dataset, Encoder}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Event-time operators for the streaming half of a training-data pipeline.
  *
  * The reference's `_stream` scan vtabs are pull-based lazy iteration, not
  * event-time streaming (SURVEY §2.6) — those map to the non-limited
  * projections in [[graft.ops.Knn]]/[[graft.ops.Quantizer]], which compose
  * with `readStream` unchanged (stateless projections). This module covers
  * what a LARGE-SCALE INGEST actually needs beyond them: event-time
  * windowed aggregation under a watermark, and streaming exact
  * deduplication with bounded state.
  *
  * Every operator here is declarative (built-in `window`, `withWatermark`,
  * `dropDuplicatesWithinWatermark`) or a single
  * `flatMapGroupsWithState` — Catalyst plans the state store, so the same
  * code runs on a 1000-executor cluster with RocksDB state backends
  * without change.
  */
object Streams {

  /** Nanosecond epoch (the `TIMESTAMP(NANOS)` parquet encoding read with
    * `spark.sql.legacy.parquet.nanosAsLong=true`) → proper timestamp.
    * Integral microsecond division — no double rounding.
    */
  def nanosToTimestamp(nanos: Column): Column =
    // decimal division: a double intermediate would round 2024-era epoch
    // nanos (~1.7e18 > 2^53) before truncating to micros
    timestamp_micros(floor(nanos.cast("decimal(38,0)") / lit(1000L)).cast("long"))

  /** The `events.ts` column as a proper timestamp, whatever physical
    * encoding the parquet writer chose. Generators have shipped it both as
    * TIMESTAMP(NANOS) (loads as nanosecond-epoch LONG under
    * `spark.sql.legacy.parquet.nanosAsLong=true`) and as TIMESTAMP(MICROS)
    * (loads as timestamp / timestamp_ntz directly) — dispatch on the
    * resolved schema so operators are storage-encoding-agnostic.
    */
  def eventTime(df: DataFrame, tsCol: String = "ts"): Column =
    df.schema(tsCol).dataType match {
      case org.apache.spark.sql.types.LongType => nanosToTimestamp(col(tsCol))
      // ntz → timestamp is exact under the pinned-UTC session timezone and
      // keeps downstream window/epoch casts on one type
      case _ => col(tsCol).cast("timestamp")
    }

  /** Same dispatch, to a microsecond-epoch LONG — the exact integral form
    * the as-of / interval join gates compare on (DuckDB sees parquet
    * timestamps at micro precision, so comparing at micros is lossless for
    * both engines; session timezone is pinned UTC everywhere, making the
    * ntz→timestamp cast exact).
    */
  def eventEpochUs(df: DataFrame, tsCol: String = "ts"): Column =
    df.schema(tsCol).dataType match {
      case org.apache.spark.sql.types.LongType =>
        floor(col(tsCol).cast("decimal(38,0)") / lit(1000L)).cast("long")
      case _ => unix_micros(col(tsCol).cast("timestamp"))
    }

  /** Tumbling event-time aggregation: (window start, key) → count + exact
    * decimal-accumulated sum. Identical semantics in batch and streaming —
    * in batch this is a plain `groupBy(window(...))`; on a stream apply
    * [[withEventTime]] first so the watermark bounds state.
    *
    * The per-value cast is decimal(38,4): the aggregate buffer then holds
    * 34 integer digits, so a window sum cannot overflow (and silently NULL
    * under non-ANSI defaults) at any realistic ingest volume — 18 digits
    * would cap a window at ~10^14, plausible at 100 TB/day scale. Exact
    * decimal accumulation costs the same either way; only the final value
    * is rounded to double.
    *
    * Output: (w_start: long epoch seconds, key, n, sum_value).
    */
  def windowedAgg(df: DataFrame, tsCol: Column, keyCol: String,
                  windowDuration: String, valueCol: String): DataFrame =
    df.groupBy(window(tsCol, windowDuration).as("w"), col(keyCol))
      .agg(count(lit(1)).as("n"),
        sum(col(valueCol).cast("decimal(38,4)")).cast("double").as("sum_value"))
      .select(col("w.start").cast("long").as("w_start"), col(keyCol),
        col("n"), col("sum_value"))

  /** Watermarked event-time column for streaming inputs: attaches the
    * event-time column and the lateness bound that lets Spark finalize
    * windows and evict state. Compose: `withEventTime(stream, $"ts",
    * "10 minutes")` → [[windowedAgg]] on `col("event_time")`.
    *
    * Dispatches on the column's RESOLVED type (same rule as [[eventTime]]):
    * a LONG is nanosecond epoch (the `nanosAsLong` parquet read), anything
    * else casts through timestamp — so a MICROS-generation source does NOT
    * get divided by 1000 into ~1970 event times.
    */
  def withEventTime(df: DataFrame, ts: Column, maxLateness: String): DataFrame = {
    val tsTyped = df.select(ts.as("_g_ts")).schema.head.dataType match {
      case org.apache.spark.sql.types.LongType => nanosToTimestamp(ts)
      case _ => ts.cast("timestamp")
    }
    df.withColumn("event_time", tsTyped)
      .withWatermark("event_time", maxLateness)
  }

  /** Gap-based sessionization: a user's consecutive events merge into one
    * session while each gap is at most `gap` (an event landing exactly on
    * the close time still merges); a gap > `gap` starts a new session. Built-in `session_window`, so the same declarative plan runs
    * batch or streaming (state-store-backed window merge under a
    * watermark). One shuffle on the user key, per-user merge — no global
    * sort, so a 100 TB event log sessionizes as user-partitioned local
    * work.
    *
    * Output: (user, s_start = first event epoch s, s_end = last event +
    * gap epoch s, n, sum_value as exact-decimal-accumulated double) —
    * session_window's `end` is CLOSE time (last event + gap), per Spark's
    * definition.
    */
  def sessionize(df: DataFrame, tsCol: Column, userCol: String,
                 gap: String, valueCol: String): DataFrame =
    df.groupBy(session_window(tsCol, gap).as("w"), col(userCol))
      .agg(count(lit(1)).as("n"),
        sum(col(valueCol).cast("decimal(38,4)")).cast("double").as("sum_value"))
      .select(col(userCol), col("w.start").cast("long").as("s_start"),
        col("w.end").cast("long").as("s_end"), col("n"), col("sum_value"))

  /** Point-in-time (as-of) join: each left row picks up the payload of the
    * most recent right row with `right.ts` STRICTLY before `left.ts` for
    * the same key — the time-series join (kdb `aj`, pandas `merge_asof`,
    * DuckDB `ASOF JOIN`) that Spark has no native operator for. Left rows
    * with no prior right row survive with NULL payload (left-join
    * semantics).
    *
    * Spark-first shape: NOT a range join — Catalyst would plan
    * `l.key = r.key AND r.ts < l.ts` as an equi-join exploding every
    * (left, all-prior-right) pair before a per-row argmax, O(n·m) per key.
    * Instead the two sides union with a side tag, one window per key
    * ordered by (ts, side) carries a running `last(payload,
    * ignoreNulls)`, and left rows are kept. ONE shuffle of n+m rows on
    * the key and a per-partition sort — linear, skew-bounded by the
    * hottest key, and identical in shape on a 1000-executor cluster.
    * Sorting right AFTER left at equal ts (side 0 = left < 1 = right)
    * makes the "strictly before" contract exact: a same-timestamp right
    * row is outside the left row's running frame.
    *
    * Output: every `left` column, then one `<prefix><p>` column per
    * payload column `p` of `right`. `tsCol` may be any orderable type
    * (the nanos-long encoding of the events table compares exactly).
    */
  def asofJoin(left: DataFrame, right: DataFrame, keyCol: String,
               tsCol: String, payload: Seq[String],
               prefix: String = "asof_"): DataFrame = {
    val lStruct = struct(left.columns.map(col).toIndexedSeq: _*)
    val lType = left.select(lStruct).schema.head.dataType
    val lSide = left.select(
      Seq(lStruct.as("__l"), col(keyCol).as("__k"), col(tsCol).as("__t"),
        lit(0).as("__side")) ++
        payload.map(p => lit(null).cast(right.schema(p).dataType).as(prefix + p)): _*)
    val rSide = right.select(
      Seq(lit(null).cast(lType).as("__l"), col(keyCol).as("__k"),
        col(tsCol).as("__t"), lit(1).as("__side")) ++
        payload.map(p => col(p).as(prefix + p)): _*)
    val w = Window.partitionBy(col("__k"))
      .orderBy(col("__t").asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    lSide.unionByName(rSide)
      .select(Seq(col("__l"), col("__side")) ++
        payload.map(p => last(col(prefix + p), ignoreNulls = true).over(w).as(prefix + p)): _*)
      .where(col("__side") === 0)
      .select(col("__l.*") +: payload.map(p => col(prefix + p)): _*)
  }

  /** Bucketed interval (range) join: every (point, interval) pair with the
    * same key and `start <= ts <= end` — the other time-series join shape
    * Spark has no scalable native plan for. A naive
    * `l.key = r.key AND l.ts BETWEEN r.start AND r.end` plans as an
    * equi-join on the key that explodes every (point × interval) pair per
    * key before filtering — quadratic in the hottest key. Here both sides
    * map onto fixed-width time buckets first: a point lands in exactly
    * one bucket, an interval replicates to the ⌈len/width⌉+1 buckets it
    * covers, and the join is EQUI on (key, bucket) with the BETWEEN as a
    * residual — each qualifying pair meets in exactly one bucket (the
    * point's), so no dedup pass is needed. Cost: interval-side blowup of
    * ~len/width rows; pick `bucketWidth` near the typical interval length
    * so the replication factor stays single-digit while buckets stay
    * selective. Catalyst broadcasts the exploded interval side when it is
    * small; otherwise both sides shuffle on (key, bucket) — either way
    * linear, and the same plan at 100 TB.
    *
    * Timestamps are compared as exact integral values (the nanos-long
    * events encoding); bucket math goes through decimal(38,0) because a
    * double quotient of 2024-era epoch nanos (~1.7e18 > 2^53) would round
    * before flooring. Output: every `points` column, then one
    * `<prefix><p>` per payload column of `intervals`; points matching
    * nothing are dropped (inner-join semantics).
    */
  def intervalJoin(points: DataFrame, intervals: DataFrame, keyCol: String,
                   tsCol: String, startCol: String, endCol: String,
                   bucketWidth: Long, payload: Seq[String],
                   prefix: String = "iv_"): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive, got $bucketWidth")
    def bucket(c: Column): Column =
      floor(c.cast("decimal(38,0)") / lit(bucketWidth)).cast("long")
    val p = points.withColumn("__b", bucket(col(tsCol)))
    val iv = intervals.select(
      Seq(col(keyCol).as("__ik"), col(startCol).as("__s"), col(endCol).as("__e"),
        explode(sequence(bucket(col(startCol)), bucket(col(endCol)))).as("__b")) ++
        payload.map(pc => col(pc).as(prefix + pc)): _*)
    p.join(iv,
        p(keyCol) === iv("__ik") && p("__b") === iv("__b") &&
          col(tsCol) >= col("__s") && col(tsCol) <= col("__e"))
      .select(points.columns.map(p(_)) ++ payload.map(pc => iv(prefix + pc)): _*)
  }

  /** Streaming exact dedup, declarative form: first occurrence of each key
    * within the watermark horizon survives; Spark manages and evicts the
    * seen-key state. The streaming analogue of [[graft.ops.Dedup.exact]]
    * for the at-least-once ingest path (duplicate events within the
    * lateness bound collapse; the watermark bounds state size — at 100 TB/
    * day the state is keys-per-horizon, not keys-ever).
    */
  def dedupWithinWatermark(df: DataFrame, keyCols: Seq[String],
                           ts: Column, maxLateness: String): DataFrame =
    withEventTime(df, ts, maxLateness)
      .dropDuplicatesWithinWatermark(keyCols)

  /** Streaming exact dedup, custom-state form (`flatMapGroupsWithState`):
    * emits the FIRST row seen per key and suppresses the rest — within a
    * micro-batch, across micro-batches, and across query restarts (the
    * boolean per-key state lives in the checkpointed state store). Use
    * when the emitted-row choice must differ from what
    * `dropDuplicatesWithinWatermark` hard-codes, or when keys carry no
    * event time. State is unbounded by design — size it for key spaces
    * that fit the state store (e.g. 16-byte content fingerprints over a
    * backfill window); for at-least-once ingest with a lateness bound,
    * [[dedupWithinWatermark]] is the production path, where Spark evicts
    * seen-key state at the watermark. (A processing-time TTL is
    * deliberately NOT used here: `ProcessingTimeTimeout` keeps scheduling
    * no-data micro-batches against pending deadlines, which breaks
    * drain-and-stop semantics — `Trigger.AvailableNow` never terminates.)
    * Works identically on a batch Dataset (plain first-per-key).
    */
  def dedupFirstSeen[T, K](ds: Dataset[T], key: T => K)(
      implicit kEnc: Encoder[K], tEnc: Encoder[T]): Dataset[T] = {
    implicit val boolEnc: Encoder[Boolean] = org.apache.spark.sql.Encoders.scalaBoolean
    ds.groupByKey(key)
      .flatMapGroupsWithState[Boolean, T](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (_: K, rows: Iterator[T], state: GroupState[Boolean]) =>
          if (state.exists) Iterator.empty
          else {
            state.update(true)
            rows.take(1)
          }
      }
  }

  /** Stream-static enrichment: each streaming row picks up the matching
    * row of a static dimension snapshot. Stateless (no watermark); the
    * static side is re-resolved per micro-batch, so swapping the dim
    * table's files is picked up on the next batch. The broadcast hint is
    * the 100 TB strategy for dimension-sized sides — each executor joins
    * its stream partition locally, zero stream-side shuffle; drop the
    * hint for a huge static side and Spark shuffles both on the key.
    */
  def enrich(stream: DataFrame, dim: DataFrame, keyCol: String,
             joinType: String = "left_outer"): DataFrame =
    stream.join(broadcast(dim), Seq(keyCol), joinType)

  /** Watermarked stream-stream equi-join with a time bound — the
    * impressions⋈clicks shape: a right event joins a left event with the
    * same key when it lands within `[left time, left time + bound]`.
    * Both sides carry watermarks and the join condition carries the
    * explicit event-time range, which is what lets Spark's
    * stream-stream join EVICT state (without the bound, both sides'
    * state grows forever — the classic unbounded-state footgun). Inner
    * join: a left event with no right match within the bound simply
    * never emits; use the outer variants once the watermark proves
    * absence. At scale the state store holds only the bound's worth of
    * per-key events — ingest-rate × bound, independent of stream length.
    *
    * `leftTsCol`/`rightTsCol` name TIMESTAMP columns already present on
    * each side (route through [[withEventTime]]'s casting first if the
    * source carries epoch numbers); they must be DISTINCT names so the
    * range predicate can reference both unambiguously.
    */
  def streamStreamJoin(left: DataFrame, right: DataFrame, keyCol: String,
                       leftTsCol: String, rightTsCol: String,
                       maxLateness: String, bound: String): DataFrame = {
    require(leftTsCol != rightTsCol,
      s"leftTsCol and rightTsCol must differ, both were '$leftTsCol'")
    val l = left.withWatermark(leftTsCol, maxLateness)
    val r = right.withColumnRenamed(keyCol, s"${keyCol}_r")
      .withWatermark(rightTsCol, maxLateness)
    l.join(r, expr(
        s"$keyCol = ${keyCol}_r AND " +
        s"$rightTsCol >= $leftTsCol AND $rightTsCol <= $leftTsCol + INTERVAL $bound"))
      .drop(s"${keyCol}_r")
  }

  /** EXACTLY-ONCE parquet sink for `foreachBatch` — the replay-safe write
    * every custom streaming sink needs: Structured Streaming guarantees
    * at-least-once delivery of each (batchId, data) pair across restarts
    * (a batch that crashed mid-write REPLAYS with the same id), so an
    * `append` inside `foreachBatch` duplicates whatever the crashed
    * attempt already flushed. Writing each batch to its own
    * `batch_id=<id>` partition directory with a dynamic-partition
    * OVERWRITE makes the replay idempotent: the second attempt replaces
    * the first's partial files byte-for-byte instead of adding to them,
    * and untouched batch directories are left alone. Readers just scan
    * `path` (batch_id is an ordinary partition column they may prune on
    * or drop).
    *
    * Usage: `.writeStream.foreachBatch { (df, id) =>
    * Streams.idempotentBatchWrite(df, id, path) }`. The overwrite is
    * scoped by `partitionOverwriteMode=dynamic` session-locally via the
    * writer option, so no global conf leaks.
    */
  def idempotentBatchWrite(batch: DataFrame, batchId: Long, path: String): Unit =
    batch.withColumn("batch_id", lit(batchId))
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("batch_id")
      .parquet(path)
}
