package graft.sql

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.{UnresolvedAttribute, UnresolvedRelation}
import org.apache.spark.sql.catalyst.expressions.{Alias, Ascending, Expression, ExpressionInfo, IsNotNull, Literal, SortOrder}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, Limit, LogicalPlan, Project, Sort}
import org.apache.spark.sql.types.{ArrayType, BinaryType, FloatType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

import graft.catalog.VectorCatalog
import graft.codec.VectorCodec
import graft.expressions.{CodeDistance, VectorDistance}
import graft.ops.Quantizer
import graft.QType

/** The reference's table-valued-function query surface in SQL
  * (`FROM vector_full_scan('t','c',probe,k)` — sqlite-vector.c:2377-2487,
  * API.md:212-261), realized as Catalyst table functions that expand to a
  * declarative plan: Project(distance) → Sort → Limit over the registered
  * table. Catalyst then plans the usual TakeOrderedAndProject +
  * codegen'd scan — the TVF adds SQL ergonomics, not a new physical path.
  *
  * Like the reference, the (table, column) pair must be registered first
  * (`vector_init` ≙ VectorCatalog.init, which also resolves the id column
  * the way the reference resolves rowid/pk), and `vector_quantize_scan`
  * additionally requires quantization metadata and the shadow store — a
  * view named `vector0_<table>_<column>`, the reference's shadow-table
  * naming (sqlite-vector.c:1000-1002).
  */
object GraftTableFunctions {

  private def strArg(e: Expression, what: String): String = e match {
    case Literal(s: UTF8String, StringType) => s.toString
    case other => throw new IllegalArgumentException(s"$what must be a string literal, got $other")
  }

  private def intArg(e: Expression, what: String): Int = e match {
    case Literal(i: Int, IntegerType) => i
    case Literal(l: Long, LongType)   => l.toInt
    case other => throw new IllegalArgumentException(s"$what must be an integer literal, got $other")
  }

  /** Probe argument: a JSON text array (the reference's JSON input path,
    * sqlite-vector.c:1528-1653), dimension-checked against the config.
    */
  private def probeArg(e: Expression, dim: Int): Array[Float] = {
    val parsed = VectorCodec.parseJson(strArg(e, "probe vector"), dim)
    parsed
  }

  private def config(table: String, column: String) =
    VectorCatalog.get(table, column).getOrElse(throw new IllegalArgumentException(
      s"vector_init('$table','$column',...) must be called before scanning (sqlite-vector.c:1760-1765)"))

  /** `vector_full_scan(tbl, col, probeJson, k)` → rows (id, distance). */
  def fullScanBuilder(args: Seq[Expression]): LogicalPlan = args match {
    case Seq(t, c, probeE, kE) =>
      val table = strArg(t, "table name")
      val column = strArg(c, "column name")
      val cfg = config(table, column)
      val probe = probeArg(probeE, cfg.dim)
      val k = intArg(kE, "k")
      val dist = Alias(
        VectorDistance(UnresolvedAttribute(column), Literal.create(probe, ArrayType(FloatType)), cfg.metric),
        "distance")()
      val proj = Project(
        Seq(Alias(UnresolvedAttribute(cfg.idCol), "id")(), dist),
        Filter(IsNotNull(UnresolvedAttribute(column)), UnresolvedRelation(Seq(table))))
      topK(proj, k)
    case other =>
      throw new IllegalArgumentException(s"vector_full_scan expects (table, column, probe, k), got ${other.size} args")
  }

  /** `vector_quantize_scan(tbl, col, probeJson, k)` → rows (id, distance)
    * over the quant store, distance in i8/u8 code space (NOT dequantized,
    * sqlite-vector.c:2198-2200) with the probe quantized via the stored
    * scale/offset (Q3, :2159-2177).
    */
  def quantScanBuilder(args: Seq[Expression]): LogicalPlan = args match {
    case Seq(t, c, probeE, kE) =>
      val table = strArg(t, "table name")
      val column = strArg(c, "column name")
      val cfg = config(table, column)
      val p = VectorCatalog.quantParams(table, column).getOrElse(throw new IllegalArgumentException(
        s"vector_quantize('$table','$column') must run before a quantized scan (sqlite-vector.c:1780-1787)"))
      val qprobe = Quantizer.quantizeProbe(probeArg(probeE, cfg.dim), p)
      val k = intArg(kE, "k")
      val dist = Alias(
        CodeDistance(UnresolvedAttribute("code"), Literal(qprobe, BinaryType), cfg.metric,
          signed = p.qType == QType.I8),
        "distance")()
      val proj = Project(
        Seq(Alias(UnresolvedAttribute("id"), "id")(), dist),
        UnresolvedRelation(Seq(s"vector0_${table}_$column")))
      topK(proj, k)
    case other =>
      throw new IllegalArgumentException(s"vector_quantize_scan expects (table, column, probe, k), got ${other.size} args")
  }

  private def topK(proj: LogicalPlan, k: Int): LogicalPlan =
    Limit(Literal(math.max(k, 0)), Sort(
      Seq(SortOrder(UnresolvedAttribute("distance"), Ascending),
          SortOrder(UnresolvedAttribute("id"), Ascending)),
      global = true, proj))

  private val builders: Seq[(String, Seq[Expression] => LogicalPlan)] = Seq(
    "vector_full_scan" -> (fullScanBuilder _),
    "vector_quantize_scan" -> (quantScanBuilder _))

  /** Runtime registration on a live session (the `CREATE FUNCTION` path). */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.tableFunctionRegistry
    builders.foreach { case (name, b) =>
      reg.createOrReplaceTempFunction(name, b, "scala_udf")
    }
  }

  /** `SparkSessionExtensions` injection — enable with
    * `spark.sql.extensions=graft.sql.GraftExtensions`.
    */
  def inject(ext: SparkSessionExtensions): Unit =
    builders.foreach { case (name, b) =>
      ext.injectTableFunction((FunctionIdentifier(name),
        new ExpressionInfo(GraftTableFunctions.getClass.getCanonicalName, name), b))
    }
}

/** Session extension entry point: registers the vector table functions at
  * session build time (`--conf spark.sql.extensions=graft.sql.GraftExtensions`).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = GraftTableFunctions.inject(ext)
}
