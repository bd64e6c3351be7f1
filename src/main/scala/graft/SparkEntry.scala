package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
import graft.queries.Registry

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Dual-pol wind inversion — the reference's flagship operator (SURVEY §3.1):
    * broadcast-LUT argmin kernel + phi-ambiguity + dualpol blend.
    */
  def entry(spark: SparkSession): DataFrame =
    queries("q16_invert_dualpol")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Registry.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Registry.oracles
}
