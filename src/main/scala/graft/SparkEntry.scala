package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The reference's documented idiom (README.md:96-99): exact cosine k-NN
    * over the embedding table, ids broadcast-joined back to documents.
    */
  def entry(spark: SparkSession): DataFrame = {
    val dir = "/root/testdata/sf0.001"
    val knn = ops.Knn.fullScan(
      Queries.emb(spark, dir), "vec_id", "embedding", Queries.probe, 10, "cosine")
    ops.Knn.joinBack(knn, Queries.docs(spark, dir), "vec_id", "doc_id")
      .select(col("doc_id"), col("distance"), col("text"))
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Queries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Queries.oracleSql
}
