package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries.QueryRegistry

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Every operator in SURVEY §2 (plus the training-data-pipeline ops) is
  * exposed as a named query over the driver's TPC-H-ish tables; each one
  * that is exactly SQL-expressible also carries a DuckDB oracle.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    QueryRegistry.byName("q04_join3_revenue").fn(spark, "/root/testdata/sf0.001")
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    QueryRegistry.all.map { q =>
      q.name -> { (s: SparkSession, dir: String) =>
        graft.functions.GraftFunctions.register(s)
        q.fn(s, dir)
      }
    }.toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for ops whose algorithm is not
    * exactly SQL-expressible (sketch-based dedup/ANN) — those get the
    * driver's rows-only check plus ScalaTest oracles of their own.
    */
  def oracleSql: Map[String, String] =
    QueryRegistry.all.flatMap(q => q.oracle.map(o => q.name -> o.trim)).toMap
}
