package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.LocalSpark.{sfDir, spark}

/** Static plan audit over the whole query surface (SURVEY §6): no
  * query may plan a CartesianProduct — every pairwise operator must
  * get its candidates from an equi-join. Streaming queries are
  * skipped (calling them executes a stream, and their plans are
  * window aggregates by construction).
  */
class PlanAuditSpec extends AnyFunSuite {

  // streaming queries execute a full stream on call; the format
  // round-trip / partitioned-sink / training-driver entries perform
  // filesystem writes (and EM training) at DataFrame-construction
  // time — none belong in a static audit.
  private val skip = Set(
    "stream_session_agg", "stream_dedup", "stream_sessionize",
    "stream_enrich", "stream_join", "stream_session_window",
    "format_roundtrip", "sink_partitioned", "bucketed_join", "compact_files",
    "csv_badrecords", "schema_evolution",
    "hmm_train_cli", "hmm_checkpoint_resume",
    // constructing these plans runs eager jobs (k-means cell build /
    // label-propagation fixpoint loop / BPE merge loop)
    "dedup_embedding", "dedup_groups", "bpe_train", "curate_corpus",
    "kmeans_clusters")

  test("no query plans a cartesian product") {
    // a poisoned shared session (broadcast disabled by an earlier suite)
    // makes bounded-grid crossJoins plan as "genuine" cartesians — fail
    // here with the offending conf keys instead of a phantom plan report
    LocalSpark.assertSessionHygiene("PlanAuditSpec")
    val offenders = SparkEntry.queries.collect {
      case (name, fn) if !skip(name) =>
        val plan = fn(spark, sfDir).queryExecution.executedPlan.toString
        name -> plan.contains("CartesianProduct")
    }.filter(_._2).map(_._1)
    assert(offenders.isEmpty, s"cartesian products in: $offenders")
  }

  test("bucketed join plans with ZERO exchanges (bucket-local sort-merge)") {
    val plan = graft.sources.Formats.bucketedJoin(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin"), s"expected a sort-merge join:\n$plan")
    // the join itself must be exchange-free: the only exchange allowed
    // in the whole plan is the single-partition one for the final
    // bounded groupBy(o_orderpriority) rollup
    val joinPart = plan.split("SortMergeJoin").last
    assert(!joinPart.contains("Exchange"),
      s"bucketed join still shuffles its inputs:\n$plan")
  }

  test("distributed-ntile queries plan no single-partition exchange (no global window sort)") {
    // the r6 scale fix: rank-based bucketing must never funnel the
    // relation through one task. A global Window.orderBy plans
    // `Exchange SinglePartition` + Window — assert it's gone from
    // every distributedNtile consumer.
    for (name <- Seq("rfm_segment", "equi_depth_hist", "zorder_layout")) {
      val plan = SparkEntry.queries(name)(spark, sfDir)
        .queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange SinglePartition"),
        s"$name still plans a single-partition exchange:\n$plan")
    }
  }

  test("headline scans push filters and prune columns") {
    val q1 = graft.operators.Relational.q1Agg(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(q1.contains("PushedFilters: [IsNotNull(l_shipdate)"), "q1 filter not pushed")
    assert(!q1.contains("l_comment"), "q1 reads more columns than projected")
  }
}
