package graft

/** Core type system mirroring the reference's enums.
  *
  * Reference: `vector_type` (distance-cpu.h:36-43), `vector_distance`
  * aliases (sqlite-vector.c:798-808), `vector_qtype` (distance-cpu.h:45-49).
  */
sealed abstract class ElemType(val name: String, val bytesPerElem: Int)
object ElemType {
  case object F32  extends ElemType("FLOAT32", 4)
  case object F16  extends ElemType("FLOAT16", 2)
  case object BF16 extends ElemType("FLOATB16", 2)
  case object I8   extends ElemType("INT8", 1)
  case object U8   extends ElemType("UINT8", 1)

  val all: Seq[ElemType] = Seq(F32, F16, BF16, I8, U8)

  /** Parse per sqlite-vector.c:772-779 (case-insensitive). */
  def parse(s: String): ElemType = s.trim.toUpperCase match {
    case "FLOAT32" | "F32"       => F32
    case "FLOAT16" | "F16"       => F16
    case "FLOATB16" | "BF16"     => BF16
    case "INT8" | "I8"           => I8
    case "UINT8" | "U8"          => U8
    case other => throw new IllegalArgumentException(s"unknown vector type: $other")
  }
}

sealed abstract class Metric(val name: String)
object Metric {
  case object L2        extends Metric("L2")
  case object SquaredL2 extends Metric("SQUARED_L2")
  case object Cosine    extends Metric("COSINE")
  case object Dot       extends Metric("DOT")
  case object L1        extends Metric("L1")

  val all: Seq[Metric] = Seq(L2, SquaredL2, Cosine, Dot, L1)

  /** Aliases per sqlite-vector.c:798-808. */
  def parse(s: String): Metric = s.trim.toUpperCase match {
    case "L2" | "EUCLIDEAN"      => L2
    case "SQUARED_L2" | "SQ_L2"  => SquaredL2
    case "COSINE"                => Cosine
    case "DOT" | "INNER"         => Dot
    case "L1" | "MANHATTAN"      => L1
    case other => throw new IllegalArgumentException(s"unknown distance metric: $other")
  }
}

sealed abstract class QType(val name: String)
object QType {
  case object Auto extends QType("AUTO")
  case object U8   extends QType("UINT8")
  case object I8   extends QType("INT8")

  def parse(s: String): QType = s.trim.toUpperCase match {
    case "AUTO"          => Auto
    case "UINT8" | "U8"  => U8
    case "INT8" | "I8"   => I8
    case other => throw new IllegalArgumentException(s"unknown quantization type: $other")
  }
}

/** Per-(table, column) vector configuration.
  *
  * Mirrors `vector_options` + `table_context` (sqlite-vector.c:126-142);
  * defaults F32 / L2 / 30MB / AUTO per sqlite-vector.c:1100-1106.
  */
final case class VectorConfig(
    dim: Int,
    elemType: ElemType = ElemType.F32,
    metric: Metric = Metric.L2,
    normalized: Boolean = false,
    qType: QType = QType.Auto,
    maxMemory: Long = 30L * 1024 * 1024,
    idCol: String = "id",
    // where SQL-driven `vector_quantize` writes the shadow store; empty →
    // <spark.sql.warehouse.dir>/graft_vector_stores (the Spark analogue of
    // the reference's shadow table living inside the database file)
    storeDir: String = ""
) {
  require(dim > 0, s"dimension must be > 0, got $dim")
}

object VectorConfig {

  /** Parse the reference's `key=value,key=value` option grammar
    * (parse_keyvalue_string, sqlite-vector.c:878-914; callback :935-992).
    * Unknown keys are ignored, like the reference. `max_memory` accepts
    * KB/MB/GB suffixes (human_to_number, :916-933).
    */
  def fromOptions(opts: String): VectorConfig = {
    var dim = -1
    var et: ElemType = ElemType.F32
    var metric: Metric = Metric.L2
    var normalized = false
    var qt: QType = QType.Auto
    var maxMem = 30L * 1024 * 1024
    var idCol = "id"
    var storeDir = ""
    opts.split(",").map(_.trim).filter(_.nonEmpty).foreach { kv =>
      val i = kv.indexOf('=')
      if (i > 0) {
        val k = kv.substring(0, i).trim.toLowerCase
        val v = kv.substring(i + 1).trim
        k match {
          case "dimension" | "dim" => dim = v.toInt
          case "type"              => et = ElemType.parse(v)
          case "distance"          => metric = Metric.parse(v)
          case "normalized"        => normalized = v == "1" || v.equalsIgnoreCase("true")
          case "qtype"             => qt = QType.parse(v)
          case "max_memory"        => maxMem = humanToNumber(v)
          // our explicit analogue of the reference's rowid/pk resolution
          // (sqlite-vector.c:1079-1088): Spark tables have no implicit rowid
          case "id_column"         => idCol = v
          case "store_dir"         => storeDir = v
          case _                   => // unknown keys ignored (reference behavior)
        }
      }
    }
    require(dim > 0, "dimension is mandatory (sqlite-vector.c:2508-2516)")
    VectorConfig(dim, et, metric, normalized, qt, maxMem, idCol, storeDir)
  }

  /** sqlite-vector.c:916-933 */
  def humanToNumber(s: String): Long = {
    val t = s.trim.toUpperCase
    val (num, mult) =
      if (t.endsWith("GB")) (t.dropRight(2), 1024L * 1024 * 1024)
      else if (t.endsWith("MB")) (t.dropRight(2), 1024L * 1024)
      else if (t.endsWith("KB")) (t.dropRight(2), 1024L)
      else (t, 1L)
    num.trim.toLong * mult
  }
}

/** Quantization parameters persisted per (table, column) — the sidecar
  * equivalent of the `_sqliteai_vector` metadata table
  * (sqlite-vector.c:114, :419-491, :1440-1445).
  */
final case class QuantParams(qType: QType, scale: Double, offset: Double, rows: Long)
