package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

class ExtensionsSpec extends SparkTestBase {
  import spark.implicits._

  test("RangeJoinRewrite turns a naive keyless interval join into a " +
    "bucketed equi-join with identical results") {
    val left = (0L until 400L).map(i => (i, i * 37 % 10000)).toDF("lid", "lts")
    val right = (0L until 400L).map(i => (i, i * 91 % 10000)).toDF("rid", "rts")
    def naive = left.join(right,
      col("lts") >= col("rts") - 100 && col("lts") <= col("rts") + 100)
    val before = naive.queryExecution.executedPlan.toString
    assert(before.contains("BroadcastNestedLoopJoin") ||
      before.contains("CartesianProduct"), before)
    val expected = naive.collect().map(r =>
      (r.getLong(0), r.getLong(2))).toSet
    val prev = spark.experimental.extraOptimizations
    spark.experimental.extraOptimizations = prev :+ graft.plans.RangeJoinRewrite
    try {
      val after = naive.queryExecution.executedPlan.toString
      assert(!after.contains("BroadcastNestedLoopJoin") &&
        !after.contains("CartesianProduct"), after)
      assert(after.contains("SortMergeJoin") || after.contains("HashJoin"), after)
      val got = naive.collect().map(r => (r.getLong(0), r.getLong(2))).toSet
      assert(got === expected)
      assert(got.nonEmpty)
    } finally spark.experimental.extraOptimizations = prev
  }

  test("RangeJoinRewrite leaves equi-key joins and non-matching " +
    "conditions alone") {
    val a = Seq((1L, 10L, "x"), (2L, 20L, "y")).toDF("ak", "ats", "ap")
    val b = Seq((1L, 12L), (2L, 300L)).toDF("bk", "bts")
    val prev = spark.experimental.extraOptimizations
    spark.experimental.extraOptimizations = prev :+ graft.plans.RangeJoinRewrite
    try {
      // equi key present: untouched (hash join on the key), same rows
      val keyed = a.join(b, col("ak") === col("bk") &&
        col("ats") >= col("bts") - 5 && col("ats") <= col("bts") + 5)
      assert(keyed.collect().map(_.getLong(0)).toSeq === Seq(1L))
      // a one-sided (non-between) condition is not rewritten but still
      // answers correctly
      val oneSided = a.join(b, col("ats") >= col("bts"))
      assert(oneSided.count() === 1) // only (20 >= 12)
    } finally spark.experimental.extraOptimizations = prev
  }

  test("GraftExtensions installs SQL functions and the rewrite rule in " +
    "a session built with spark.sql.extensions semantics") {
    val base = spark
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s2 = SparkSession.builder()
        .master("local[4]")
        .withExtensions(new GraftExtensions)
        .getOrCreate()
      assert(s2 ne base) // a genuinely new session over the same context
      // kernels reachable from plain SQL, no imports, no registration
      val dot = s2.sql(
        "SELECT graft_dot(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d")
        .collect().head.getDouble(0)
      assert(dot === 11.0)
      val sh = s2.sql(
        "SELECT graft_shingles(array('a','b','c'), 2) AS s")
        .collect().head.getSeq[String](0)
      assert(sh === Seq("a b", "b c"))
      // the optimizer rule rides along: a naive SQL interval join plans
      // without a nested-loop join
      import s2.implicits._
      (0L until 50L).map(i => (i, i * 13 % 300)).toDF("lid", "lts")
        .createOrReplaceTempView("ext_l")
      (0L until 50L).map(i => (i, i * 29 % 300)).toDF("rid", "rts")
        .createOrReplaceTempView("ext_r")
      val q = s2.sql("SELECT lid, rid FROM ext_l JOIN ext_r " +
        "ON lts >= rts - 10 AND lts <= rts + 10")
      val plan = q.queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastNestedLoopJoin") &&
        !plan.contains("CartesianProduct"), plan)
      assert(q.count() > 0)
    } finally {
      SparkSession.setActiveSession(base)
      SparkSession.setDefaultSession(base)
    }
  }
}
