package graft.ops

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession

/** Crash-safe directory swap for store compaction — the durability half
  * of the reference's BEGIN/COMMIT-atomic rebuild transaction
  * (sqlite-vector.c:1418-1453), restated for a filesystem where the only
  * atomic primitive is a single directory rename.
  *
  * The naive `delete(store); rename(tmp, store)` has a fatal window: a
  * crash between the two calls loses the live store (the compacted copy
  * survives only under the staging name, invisible to readers). The
  * protocol here never has zero complete copies reachable by name:
  *
  *   1. stage: write the full new store (data + any sidecar files) to
  *      `tmp`. A crash here leaves the live store untouched.
  *   2. `rename(store, store_old)` — the old store steps aside whole.
  *   3. `rename(tmp, store)` — the new store takes the name whole.
  *   4. `delete(store_old)` — garbage collection, nothing depends on it.
  *
  * Every crash point leaves a complete store recoverable by name, and
  * [[recover]] resolves each one deterministically:
  *   - after 2, before 3: `store` absent, `tmp` complete → roll FORWARD
  *     (finish the swap; the staged copy was fully written before step 2).
  *   - after 3, before 4: `store` live, `store_old` leftover → delete it.
  *   - crash during the stage write (partial `tmp`, no `_SUCCESS`
  *     marker): the live store never moved → delete the partial.
  *
  * [[recover]] is idempotent and cheap (a few `exists` probes), so read
  * paths call it unconditionally before opening a swappable store.
  */
object StoreSwap {

  /** The step-aside name: `<store>_old`, sibling of the store. */
  def oldPath(store: Path): Path =
    new Path(store.getParent, store.getName + "_old")

  /** A directory is a COMPLETE staged store iff its job-commit marker
    * exists — Spark's FileOutputCommitter writes `_SUCCESS` last, so a
    * crashed stage write can never pass this check.
    */
  private def isCommitted(fs: FileSystem, dir: Path): Boolean =
    fs.exists(new Path(dir, "_SUCCESS"))

  /** Steps 2–4: promote the fully-written staging dir `tmp` to `store`.
    * Pre-cleans a `store_old` leftover from a prior crash-after-step-3
    * (the live store exists, so the leftover is garbage by definition).
    * Each rename's failure is checked — a false return (e.g. a dest that
    * popped into existence) must abort, not silently fall through.
    */
  def commit(fs: FileSystem, store: Path, tmp: Path): Unit = {
    require(fs.exists(tmp), s"StoreSwap.commit: staged store $tmp does not exist")
    val old = oldPath(store)
    if (fs.exists(store)) {
      if (fs.exists(old)) fs.delete(old, true)
      require(fs.rename(store, old), s"StoreSwap.commit: rename $store -> $old failed")
    }
    require(fs.rename(tmp, store), s"StoreSwap.commit: rename $tmp -> $store failed")
    if (fs.exists(old)) fs.delete(old, true)
  }

  /** Resolve any crash window left by an interrupted [[commit]] (or an
    * interrupted stage write). Idempotent; returns true iff something
    * was repaired. Read paths call this before opening the store.
    */
  def recover(fs: FileSystem, store: Path, tmp: Path): Boolean = {
    val old = oldPath(store)
    if (fs.exists(store)) {
      // swap completed or never ran; anything under the side names is garbage
      val leftoverOld = fs.exists(old)
      val leftoverTmp = fs.exists(tmp)
      if (leftoverOld) fs.delete(old, true)
      if (leftoverTmp) fs.delete(tmp, true)
      leftoverOld || leftoverTmp
    } else if (fs.exists(tmp) && isCommitted(fs, tmp)) {
      // crashed between the two renames: the staged copy is complete — roll forward
      require(fs.rename(tmp, store), s"StoreSwap.recover: rename $tmp -> $store failed")
      if (fs.exists(old)) fs.delete(old, true)
      true
    } else if (fs.exists(old)) {
      // staged copy absent or partial but the old store stepped aside whole — roll back
      if (fs.exists(tmp)) fs.delete(tmp, true)
      require(fs.rename(old, store), s"StoreSwap.recover: rename $old -> $store failed")
      true
    } else false
  }

  /** Path-string convenience used by the read paths. */
  def recover(spark: SparkSession, storePath: String, tmpPath: String): Boolean = {
    val store = new Path(storePath)
    val fs = store.getFileSystem(spark.sessionState.newHadoopConf())
    recover(fs, store, new Path(tmpPath))
  }
}
