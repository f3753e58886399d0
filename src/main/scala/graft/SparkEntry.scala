package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * The engine itself lives in:
  *   - graft.api.GroupByReduce / GroupByScan  (flox core surface)
  *   - graft.keys.Binning / ExpectedGroups    (key machinery)
  *   - graft.ops.*                            (pipeline operators)
  * `queries` + `oracleSql` (hash-checked against DuckDB by the driver)
  * are assembled from the per-area catalogs.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * A representative multi-reduction in one pass: partial agg → single
    * shuffle → final agg, all whole-stage-codegen.
    */
  def entry(spark: SparkSession): DataFrame =
    api.GroupByReduce.multi(
      Tables(spark, "/root/testdata/sf0.001", "lineitem"),
      Seq("l_returnflag", "l_linestatus"),
      Seq(
        ("l_quantity", "sum", "sum_qty"),
        ("l_quantity", "mean", "avg_qty"),
        ("l_extendedprice", "mean", "avg_price"),
        ("l_quantity", "count", "n")))

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    CoreQueries.queries ++ PipelineQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    CoreQueries.oracleSql ++ PipelineQueries.oracleSql
}
