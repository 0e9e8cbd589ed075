package graft.expressions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpectsInputTypes}
import org.apache.spark.sql.catalyst.expressions.aggregate.{ImperativeAggregate, TypedImperativeAggregate}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Grouped top-k: a bounded-heap aggregate with map-side partial
  * aggregation — the distributed, *grouped* generalization of the
  * reference's k-slot scan loop (sqlite-vector.c:2022-2113 keeps k best in
  * a flat slot array with worst-replacement; `TakeOrderedAndProject` is
  * that shape for ONE query).
  *
  * `knn_topk(distance, id, k)` in a `groupBy(probe_id)` answers N probes
  * in one corpus scan: each task folds its partition into an O(k) heap per
  * group (partial aggregation), and only N×k×(12 bytes) cross the shuffle
  * — against the window-function alternative (`row_number() OVER
  * (PARTITION BY probe ORDER BY dist)`) which shuffles and SORTS the full
  * N×corpus distance set. At 100 TB that is the difference between a
  * shuffle of kilobytes and a shuffle of the corpus.
  *
  * Ordering is lexicographic on (value, id) — strictly deterministic, same
  * tie-break the single-probe gates use. Result: `array<struct<distance,
  * id>>` sorted ascending, fewer than k entries if the group is smaller.
  * Null distance or id rows are skipped (the reference skips NULL vectors,
  * :2093).
  */
case class TopKPairs(valueExpr: Expression, idExpr: Expression, k: Int,
                     mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[TopKHeap] with ExpectsInputTypes {

  require(k > 0, s"knn_topk requires k > 0, got $k")

  override def children: Seq[Expression] = Seq(valueExpr, idExpr)
  override def inputTypes: Seq[DataType] = Seq(DoubleType, LongType)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("distance", DoubleType, nullable = false),
                   StructField("id", LongType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "knn_topk"

  override def createAggregationBuffer(): TopKHeap = new TopKHeap(k)

  override def update(buffer: TopKHeap, input: InternalRow): TopKHeap = {
    val v = valueExpr.eval(input)
    val id = idExpr.eval(input)
    // NaN is skipped, not ranked: it is incomparable, so it could neither
    // be evicted from the heap nor ordered in the output (±Inf is fine —
    // the reference's L2 yields +Inf on Inf lanes and orders normally)
    if (v != null && id != null && !v.asInstanceOf[Double].isNaN)
      buffer.insert(v.asInstanceOf[Double], id.asInstanceOf[Long])
    buffer
  }

  override def merge(buffer: TopKHeap, other: TopKHeap): TopKHeap = {
    var i = 0
    while (i < other.size) { buffer.insert(other.dists(i), other.ids(i)); i += 1 }
    buffer
  }

  override def eval(buffer: TopKHeap): Any = {
    val (ds, is) = buffer.sortedAscending()
    val rows = new Array[Any](ds.length)
    var i = 0
    while (i < ds.length) {
      rows(i) = InternalRow(ds(i), is(i))
      i += 1
    }
    new GenericArrayData(rows)
  }

  override def serialize(buffer: TopKHeap): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 16 * buffer.size)
    bb.putInt(buffer.size)
    var i = 0
    while (i < buffer.size) { bb.putDouble(buffer.dists(i)); bb.putLong(buffer.ids(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKHeap = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val h = new TopKHeap(k)
    var i = 0
    while (i < n) { h.insert(bb.getDouble, bb.getLong); i += 1 }
    h
  }

  override def withNewMutableAggBufferOffset(offset: Int): ImperativeAggregate =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): ImperativeAggregate =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
    copy(valueExpr = c(0), idExpr = c(1))
}

/** Bounded binary max-heap over (value, id) pairs, lexicographic order —
  * the root is the WORST kept pair, so `insert` is O(log k) replace-worst
  * exactly like the reference's slot-array argmax replacement, minus the
  * linear rescan.
  */
final class TopKHeap(k: Int) {
  val dists = new Array[Double](k)
  val ids = new Array[Long](k)
  var size = 0

  @inline private def worse(d1: Double, i1: Long, d2: Double, i2: Long): Boolean =
    d1 > d2 || (d1 == d2 && i1 > i2)

  def insert(d: Double, id: Long): Unit = {
    if (size < k) {
      var i = size
      dists(i) = d; ids(i) = id; size += 1
      // sift up
      while (i > 0 && worse(dists(i), ids(i), dists((i - 1) / 2), ids((i - 1) / 2))) {
        swap(i, (i - 1) / 2); i = (i - 1) / 2
      }
    } else if (worse(dists(0), ids(0), d, id)) {
      dists(0) = d; ids(0) = id
      siftDown(0)
    }
  }

  private def swap(a: Int, b: Int): Unit = {
    val td = dists(a); dists(a) = dists(b); dists(b) = td
    val ti = ids(a); ids(a) = ids(b); ids(b) = ti
  }

  private def siftDown(start: Int): Unit = {
    var i = start
    var done = false
    while (!done) {
      val l = 2 * i + 1; val r = 2 * i + 2
      var m = i
      if (l < size && worse(dists(l), ids(l), dists(m), ids(m))) m = l
      if (r < size && worse(dists(r), ids(r), dists(m), ids(m))) m = r
      if (m == i) done = true else { swap(i, m); i = m }
    }
  }

  /** Destructive heap-sort: extract worst-first into the tail → ascending. */
  def sortedAscending(): (Array[Double], Array[Long]) = {
    val n = size
    val ds = new Array[Double](n); val is = new Array[Long](n)
    var out = n - 1
    while (size > 0) {
      ds(out) = dists(0); is(out) = ids(0)
      size -= 1
      dists(0) = dists(size); ids(0) = ids(size)
      siftDown(0)
      out -= 1
    }
    (ds, is)
  }
}

/** Per-group vector centroid in exact fixed-point: each lane is scaled by
  * 10⁶ and rounded half-away-from-zero to a Long (NaN and null lanes
  * contribute 0 — the same convention the quantizer's rounding uses,
  * sqlite-vector.c:495-515), summed as integers, divided back at eval.
  *
  * Integer accumulation makes the result PARTITION-ORDER INDEPENDENT —
  * a plain double sum is not associative, so its low bits vary run to run
  * and can never hash-match an oracle. The fixed-point's ±5e-7 per-lane
  * quantization is far below the float32 input precision.
  *
  * Scale shape: one `Array[Long](dim+1)` buffer per group per task
  * (map-side partial aggregation), so the shuffle carries
  * groups × (dim+1) × 8 bytes — NOT the corpus. The SemDeDup-style
  * building block: cluster centroids for embedding-space dedup in one
  * aggregation pass.
  *
  * Overflow bound: a lane sum saturates Long at 2⁶³/10⁶ ≈ 9.2×10¹² in
  * absolute value — with unit-normalized lanes (|x| ≤ 1) that is ~9×10¹²
  * rows in ONE group, three orders of magnitude beyond a 10¹⁰-vector
  * (100 TB) corpus collapsing into a single cluster. Division at eval is
  * exact as long as the lane sum stays below 2⁵³ (it does by the same
  * margin).
  */
case class VectorAvgFixed(child: Expression, dim: Int,
                          mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] with ExpectsInputTypes {

  require(dim > 0, s"vector_avg requires dim > 0, got $dim")

  override def children: Seq[Expression] = Seq(child)
  override def inputTypes: Seq[DataType] = Seq(ArrayType(FloatType))
  override def nullable: Boolean = true
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "vector_avg"

  // slot dim holds the row count
  override def createAggregationBuffer(): Array[Long] = new Array[Long](dim + 1)

  override def update(buffer: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      require(arr.numElements() == dim,
        s"vector_avg: expected dim $dim, got ${arr.numElements()}")
      var i = 0
      while (i < dim) {
        if (!arr.isNullAt(i)) buffer(i) += fixedPoint(arr.getFloat(i))
        i += 1
      }
      buffer(dim) += 1
    }
    buffer
  }

  @inline private def fixedPoint(x: Float): Long = {
    val d = x.toDouble * 1e6
    if (d.isNaN) 0L
    else if (d >= 0) math.floor(d + 0.5).toLong
    else math.ceil(d - 0.5).toLong
  }

  override def merge(buffer: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i <= dim) { buffer(i) += other(i); i += 1 }
    buffer
  }

  override def eval(buffer: Array[Long]): Any = {
    val n = buffer(dim)
    if (n == 0) null
    else {
      val out = new Array[Any](dim)
      var i = 0
      while (i < dim) { out(i) = buffer(i).toDouble / (n.toDouble * 1e6); i += 1 }
      new GenericArrayData(out)
    }
  }

  override def serialize(buffer: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * (dim + 1))
    var i = 0
    while (i <= dim) { bb.putLong(buffer(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = new Array[Long](dim + 1)
    var i = 0
    while (i <= dim) { buf(i) = bb.getLong; i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(offset: Int): ImperativeAggregate =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): ImperativeAggregate =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
    copy(child = c(0))
}
