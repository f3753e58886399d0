package graft.aggs

import org.apache.spark.sql.Column

/** User-defined grouped-scan extension point — the Spark-native analog
  * of flox's custom `Scan` dataclass (reference:
  * flox/aggregations.py:715-737: scan kernel + binary_op carry +
  * identity + optional reverse preprocess/finalize, e.g. bfill =
  * reversed ffill).
  *
  * On Spark the whole contract collapses into "an aggregate expression
  * over a window frame": the running frame plays the scan kernel, the
  * shuffle-and-sort of WindowExec plays the Blelloch carry
  * (flox/dask.py:576-663), and `reverse` selects the backward frame
  * (current row → unbounded following) instead of flipping the data.
  *
  * {{{
  *   CustomScans.register("cummax", CustomScans.ScanSpec(v => max(v)))
  *   CustomScans.register("cumfraction", CustomScans.ScanSpec(
  *     agg = v => sum(v), finish = (run, tot) => run / tot))
  *   GroupByScan(df, Seq("k"), "v", "cummax", order = "idx")
  * }}}
  */
object CustomScans {

  /** @param agg      running aggregate over the scan frame (flox `scan`
    *                  kernel / `binary_op` carry combine — one and the
    *                  same under a window frame)
    * @param reverse   scan from the end of the group (flox `reverse`
    *                  preprocess+finalize, used by bfill)
    * @param finish   post-transform of (running value, whole-group
    *                  value) — identity-on-first by default; the second
    *                  argument lets normalizing scans (running fraction
    *                  of total) stay single-pass
    */
  case class ScanSpec(
      agg: Column => Column,
      reverse: Boolean = false,
      finish: (Column, Column) => Column = (run, _) => run)

  private val registry =
    scala.collection.concurrent.TrieMap.empty[String, ScanSpec]

  def register(name: String, spec: ScanSpec): Unit = registry.put(name, spec)

  // Standard extra scans pre-registered (numpy ufunc.accumulate family
  // beyond flox's fixed four): available to GroupByScan by name.
  locally {
    import org.apache.spark.sql.functions.{count, max, min, product}
    register("cummax", ScanSpec(v => max(v)))
    register("cummin", ScanSpec(v => min(v)))
    register("cumprod", ScanSpec(v => product(v)))
    register("cumcount", ScanSpec(v => count(v)))
  }

  def lookup(name: String): Option[ScanSpec] = registry.get(name)

  def isRegistered(name: String): Boolean = registry.contains(name)
}
