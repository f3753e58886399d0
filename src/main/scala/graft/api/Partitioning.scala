package graft.api

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** Partitioning advice — the Spark-native residue of flox's rechunking
  * surface (`rechunk_for_blockwise`, flox/rechunk.py:158-223): align
  * the physical layout to the group keys ONCE so that every subsequent
  * reduction on those keys aggregates without its own shuffle
  * (Catalyst's EnsureRequirements sees the child partitioning already
  * satisfies the aggregation's distribution). flox's cohort/blockwise
  * machinery exists to avoid moving data per-reduction; on Spark the
  * same economics are "pay one repartition, amortize it across the
  * query batch".
  */
object Partitioning {

  /** Hash-partition by the group keys. Downstream `GroupByReduce`/
    * `groupBy` on the same keys (or a superset-compatible layout) runs
    * shuffle-free; `GroupByScan` windows on the same keys skip their
    * exchange too (sort-only within partitions). */
  def byGroups(df: DataFrame, by: Seq[String],
               numPartitions: Option[Int] = None): DataFrame =
    numPartitions match {
      case Some(n) => df.repartition(n, by.map(col): _*)
      case None    => df.repartition(by.map(col): _*)
    }
}
