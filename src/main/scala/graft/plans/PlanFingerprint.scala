package graft.plans

import org.apache.spark.sql.DataFrame

/** Structural fingerprint of a query's physical plan: counts of the
  * scale-relevant operator classes (shuffles, join strategies,
  * aggregates, sorts, windows, scans, pushed-filter scans, codegen
  * spans). Two plans with the same fingerprint have the same shuffle
  * and join shape — a silent regression (a broadcast join degrading to
  * sort-merge, a new single-partition exchange, a filter no longer
  * reaching the scan) changes the fingerprint.
  *
  * The counts are token counts over `executedPlan.toString` rather
  * than a tree walk: AdaptiveSparkPlanExec is a leaf node (its initial
  * plan is not reachable via `collect`), but toString prints the full
  * initial plan, which is deterministic for a fixed dataset + session
  * conf. Expression ids (#123) and partition counts never enter the
  * fingerprint, so it is stable across parallelism levels.
  *
  * Used by PlanAuditSpec to diff every SparkEntry query against the
  * committed snapshot in src/test/resources/graft/plan_fingerprints.tsv
  * (regenerate with GRAFT_PLAN_FP_REGEN=1 — see the verify skill).
  */
object PlanFingerprint {

  /** (key, token regex) in output order. Lookbehinds disambiguate
    * overlapping operator names (BroadcastExchange / ReusedExchange vs
    * Exchange, ObjectHashAggregate vs HashAggregate). */
  private val tokens: Seq[(String, scala.util.matching.Regex)] = Seq(
    "shuffle"      -> raw"(?<!Broadcast)(?<!Reused)\bExchange ".r,
    "singlePart"   -> raw"\bExchange SinglePartition".r,
    "broadcast"    -> raw"\bBroadcastExchange\b".r,
    "bhj"          -> raw"\bBroadcastHashJoin\b".r,
    "smj"          -> raw"\bSortMergeJoin\b".r,
    "shj"          -> raw"\bShuffledHashJoin\b".r,
    "bnlj"         -> raw"\bBroadcastNestedLoopJoin\b".r,
    "cartesian"    -> raw"\bCartesianProduct\b".r,
    "hashAgg"      -> raw"(?<!Object)\bHashAggregate\b".r,
    "objHashAgg"   -> raw"\bObjectHashAggregate\b".r,
    "sortAgg"      -> raw"\bSortAggregate\b".r,
    "sort"         -> raw"\bSort \[".r,
    "window"       -> raw"\bWindow \[".r,
    "winGroupLim"  -> raw"\bWindowGroupLimit\b".r,
    "topK"         -> raw"\bTakeOrderedAndProject\b".r,
    "fileScan"     -> raw"\bFileScan ".r,
    "memScan"      -> raw"\bInMemoryTableScan\b".r,
    "pushedScan"   -> raw"PushedFilters: \[(?!\])".r)

  /** Canonical `key=count` rendering (zero counts omitted). */
  def of(df: DataFrame): String = ofPlanString(df.queryExecution.executedPlan.toString)

  private val codegenSpan = raw"\*\((\d+)\) ".r

  def ofPlanString(plan: String): String = {
    val counts = tokens.flatMap { case (key, re) =>
      val n = re.findAllMatchIn(plan).size
      if (n == 0) None else Some(s"$key=$n")
    }
    // treeString renders whole-stage codegen as `*(id)` node prefixes,
    // not WholeStageCodegen blocks — count distinct span ids
    val spans = codegenSpan.findAllMatchIn(plan).map(_.group(1)).toSet.size
    val all = if (spans == 0) counts else counts :+ s"codegen=$spans"
    if (all.isEmpty) "empty" else all.mkString(";")
  }
}
