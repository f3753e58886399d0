package graft

/** Fleet-wide physical-plan audit: NO certified query may plan a
  * CartesianProduct, and BroadcastNestedLoopJoin is allowed only where
  * a query DECLARES a broadcast-side-bounded non-equi join (the
  * brute-force / bounded-verify paths). This is the 100 TB contract in
  * executable form — a regression that turns an equi-join into a
  * product fails here before it ever reaches a cluster.
  *
  * Plans are built against sf0.001 (plan shape is scale-independent for
  * these queries: no AQE runtime re-plan is consulted, we read the
  * statically planned tree). Iterative operators (connected components,
  * Lloyd) EXECUTE jobs at plan-build time by design; their inner loops
  * are separately plan-pinned in their own specs.
  */
class PlanAuditSpec extends SparkTestBase {

  private val sfDir = "/root/testdata/sf0.001"

  /** Queries that legitimately contain a BroadcastNestedLoopJoin: each
    * broadcasts a DECLARED-small side (query batch, centroid set,
    * domain grid) into a non-equi or free-form join — the documented
    * bounded patterns, not data×data products. */
  private val bnlAllowed = Set(
    "q_embed_topk",          // corpus vs BROADCAST query batch, =!= condition
    "q_embed_neardup_exact", // declared bounded-corpus O(n²) verify step
    "q_ivf_topk",            // probe candidates vs broadcast centroid table
    "q_ivf_refined_topk",
    "q_embed_centroids",
    "q_semantic_neardup",    // broadcast centroid assignment (SemDeDup)
    "q_incremental_semantic", // the same k-bounded broadcast centroid
                              // assignment, on both the index build and
                              // the batch side (r17 incremental family)
    "q_incremental_semantic_probe2", // ditto, top-2 window branch (r18
                                     // multi-probe recall dial)
    "q_ann_serve",           // ditto on the index build + probe sides
                             // (r18 serving vs the persisted PQ index)
    "q_cluster_sample",      // broadcast centroid assignment (ivfAssign)
    "q_dense_grid",          // crossJoin of two declared expected-domain DFs
    "q_partial_axis",
    "q_source_shift",        // scalar total joined onto per-source rows
    "q_tfidf",               // scalar corpus doc-count (1-row broadcast)
    "q_perplexity",          // scalar smoothing V (1-row broadcast)
    "q_perplexity_kn",       // scalar (B, n1, n2, V) KN totals (1-row broadcast)
    "q_ppl_buckets",         // same scoreDocs scalar V (1-row broadcast)
    "q_dsir",                // scalar (tt, tr) model totals (1-row broadcast)
    "q_collocations",        // scalar corpus token total T (1-row broadcast)
    "q_pq_topk",             // corpus codes vs BROADCAST query LUTs, =!= condition
    "q_ivf_pq_topk",         // broadcast centroid assignment + broadcast probe LUTs
    "q_shard",               // scalar corpus token total (1-row broadcast)
    "q_curation_e2e",        // DSIR model totals + shard token total (1-row broadcasts)
    "q_crawl_budget",        // temperature normalizer Z (1-row broadcast, r19 crawlBudgetsDf)
    "q_crawl_schedule"       // same Z inside the full scheduling loop
  )

  /** Queries allowed to plan a SortAggregateExec. Deliberately EMPTY:
    * every aggregation in the fleet must plan hash-based (HashAggregate
    * for mutable buffers, ObjectHashAggregate for ExtremumBy /
    * collect-based / typed-Aggregator buffers). A SortAggregate is an
    * extra per-partition sort of the raw input on every affected query
    * at scale — the r8 verdict's lead finding (q_string_aggs): struct/
    * string aggregation buffers silently sink the whole Aggregate out
    * of hash aggregation. */
  private val sortAggAllowed = Set.empty[String]

  /** Queries allowed an `Exchange SinglePartition`: ONLY the global
    * scalar-aggregate shape (map-side partial aggregation feeding a
    * 1-row final — the exchange carries #partitions partial rows, not
    * data). Anything else funneling rows through one partition is the
    * canonical local-mode-passes / cluster-falls-over trap — a
    * partition-less Window cannot plan without one, so this check also
    * pins "no global windows" fleet-wide (GlobalScan's two-pass prefix
    * sums exist precisely to avoid them). */
  private val singlePartAllowed = Set(
    "q_source_shift", // corpus-total token count -> 1 scalar
    "q_tfidf",        // corpus doc-count -> 1 scalar
    "q_perplexity",   // distinct-token count V -> 1 scalar
    "q_perplexity_kn",// KN count-of-counts totals -> 1 scalar
    "q_ppl_buckets",  // same scoreDocs distinct-token count V -> 1 scalar
    "q_dsir",         // hashed-bag model totals -> 1 scalar
    "q_collocations", // corpus token total T -> 1 scalar
    "q_shard",        // corpus token total -> 1 scalar (shard width)
    "q_curation_e2e", // DSIR model totals + shard total -> 1-row scalars
    // Catalyst's OWN InjectRuntimeFilter on the sliver re-verify join:
    // partial_bloom_filter_agg sketches (map-side) -> one merged bloom
    // row pushed into the probe-side scan — the allowed shape (the
    // exchange carries #partitions sketch blobs, never data rows), and
    // an optimization FOR the join this audit exists to protect
    "q_incremental_semantic_pq",
    "q_funnel",       // cumulative-gate counts -> k+1 scalar rows
    "q_crawl_budget", // temperature normalizer Z -> 1 scalar (r19)
    "q_crawl_schedule" // same Z inside the scheduling loop
  )

  /** Build every certified query's physical plan EXACTLY ONCE and feed
    * both laws from it (r22: the r21 driver's test run timed out inside
    * this spec — each law independently re-planned all 199 queries, and
    * iterative operators plus the r21 band-table pins execute real
    * Spark jobs at DataFrame-construction time, so the spec paid every
    * plan-build-time job twice). Built with codegen fallback OFF so
    * plan-build-time jobs that fail codegen throw here (the
    * q_domain_rank r19 class) instead of silently interpreting. */
  private lazy val plannedOnce: Seq[(String,
      Either[String, org.apache.spark.sql.execution.SparkPlan])] = {
    val prevFallback = spark.conf.get("spark.sql.codegen.fallback")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val built =
        try Right(fn(spark, sfDir).queryExecution.executedPlan)
        catch { case e: Throwable => Left(s"PLAN-BUILD-ERROR: $e") }
      name -> built
    } finally spark.conf.set("spark.sql.codegen.fallback", prevFallback)
  }

  test("codegen health: every WholeStageCodegen stage of every certified " +
    "query COMPILES — no silent interpreted fallback") {
    // The r19 lead finding survived a full round because nothing
    // audited compilation: the link-extraction chain blew Janino's
    // 64 KB method cap, Spark logged an ERROR and fell back to
    // interpreted evaluation, and every plan-STRING law still passed.
    // This law compiles each generated stage directly (the exact code
    // WholeStageCodegenExec would hand Janino at runtime) so the next
    // blowup fails loudly. At the pre-fix r19 HEAD it fails on
    // q_outlinks/q_anchors/q_crawl_edges/q_crawl_graph/
    // q_crawl_schedule; compile-only, so it adds seconds, not a
    // second Verify run.
    import org.apache.spark.sql.execution.WholeStageCodegenExec
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    import org.apache.spark.sql.catalyst.expressions.codegen.CodeGenerator
    val failures = scala.collection.mutable.ListBuffer.empty[String]
    plannedOnce.foreach {
      case (name, Left(err)) => failures += s"$name: $err"
      case (name, Right(planned)) =>
        val root = planned match {
          case a: AdaptiveSparkPlanExec => a.initialPlan
          case p                        => p
        }
        // stages below exchanges/subqueries are separate codegen units;
        // collect sees them all (they are ordinary children in the
        // static tree)
        root.collect { case w: WholeStageCodegenExec => w }.foreach { w =>
          try {
            val (_, code) = w.doCodeGen()
            CodeGenerator.compile(code)
          } catch { case e: Throwable =>
            failures += s"$name: stage ${w.codegenStageId} failed to " +
              s"compile: ${e.getMessage.linesIterator.take(2).mkString(" | ")}"
          }
        }
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }

  test("no certified query plans a CartesianProduct; BNL only where declared; " +
    "no SortAggregate fallback") {
    val failures = scala.collection.mutable.ListBuffer.empty[String]
    plannedOnce.foreach { case (name, built) =>
      val plan = built.fold(identity, _.toString)
      if (plan.startsWith("PLAN-BUILD-ERROR"))
        failures += s"$name: $plan"
      else {
        if (plan.contains("CartesianProduct"))
          failures += s"$name: CartesianProduct in plan"
        if (plan.contains("BroadcastNestedLoopJoin") && !bnlAllowed(name))
          failures += s"$name: undeclared BroadcastNestedLoopJoin"
        if (plan.contains("SortAggregate") && !sortAggAllowed(name))
          failures += s"$name: SortAggregate fallback in plan"
        if (plan.contains("Exchange SinglePartition") && !singlePartAllowed(name))
          failures += s"$name: undeclared Exchange SinglePartition"
      }
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }
}
