package graft.plans

import org.apache.spark.sql.catalyst.plans.physical.SinglePartition
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.{CoalesceExec, GlobalLimitExec, LocalLimitExec, SortExec, TakeOrderedAndProjectExec}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec}
import org.apache.spark.sql.execution.window.WindowExec

/** WARN-class scale-signal detector shared by the CI plan audit
  * (`PlanAuditSpec`) and the benchmark main (`graft.Bench`) — one
  * source of truth for "which queries are ALLOWED to plan a dense join
  * or an unpartitioned window", so the bench record stays self-auditing
  * as the inventory grows: a new corpus-sized Cartesian product or
  * single-partition window fails the suite AND annotates the driver's
  * BENCH_r*.json instead of scrolling past as a log WARN.
  */
object PlanGuard {

  /** Deliberate dense pairings, documented in their operators: the
    * exact and int8-scan ANN baselines score every (query, candidate)
    * pair by definition (query side broadcast); everything else in the
    * set crosses only a ONE-ROW aggregate or a collected constant array
    * into a bounded stream — the scalar-broadcast idiom, not a pairing
    * of two relations (see PlanAuditSpec's per-query rationale).
    */
  val denseByDesign: Set[String] =
    Set("s_ann_bruteforce", "s_ann_ivf", "s_ann_int8", "s_ann_pq",
      "d_decontaminate_bloom", "d_resample_temp", "s_bm25",
      "s_hybrid_rrf", "p_pagerank", "t_perplexity", "d_mixture",
      "p_rag", "d_dsir", "p_kmeans", "t_pmi", "t_keywords",
      "s_mmr", "p_triangles", "q_tpch_q11", "q_tpch_q22",
      "t_bpe_apply", "q_skew_salted", "q_skew_preagg")

  /** Queries allowed to plan an unpartitioned WindowExec — each one's
    * window sits above a bounded relation (a LIMIT or an aggregate that
    * reduced the stream to keys-sized: the top-100 vocab rank, the
    * top-100 fused ranking, pack-manifest's N/1000 bucket offsets).
    * Membership IS the human-argued bound: growing this set requires
    * re-arguing boundedness in PlanAuditSpec — `bounded()` deliberately
    * does NOT count grouped aggregates as bounds (a groupBy on a
    * corpus-cardinality key like doc_id is corpus-sized), so the
    * automatic check cannot be fooled into waving a non-allowlisted
    * window through.
    */
  val boundedWindowAllow: Set[String] =
    Set("t_vocab_topk", "s_hybrid_rrf", "t_pack_manifest",
      "p_rag", "q_sql_qualify_order",
      // tok-id assignment ranks the top-100 vocab slice (above LIMIT)
      "t_tokenize_ids",
      // DSIR's corpus totals: the window input is the hashed-unigram
      // bucket model — a groupBy on pmod(h32(w), 1024), whose
      // cardinality is bounded by the pmod DOMAIN (the literal bucket
      // count), never the corpus. The window replaced a nested
      // broadcast scalar that re-ran the tokenize pipeline (round-17
      // optimization, OPTIMIZATION_r17.md §d_dsir).
      "d_dsir")

  /** Queries allowed to plan a sort whose input is a SINGLE partition
    * of an unbounded relation. EMPTY since round 17: substring dedup's
    * suffix sort — the set's one historical member — was reshaped into
    * the partitioned window-hash occurrence count (Dedup.repeatedSpans)
    * and its plan now carries no single-partition stage at any measured
    * scale (probed through the AQE final plan at sf0.1 and sf10).
    * Anything that would re-enter this set is a scale-killer — all
    * corpus rows through one task — and needs a re-argued boundedness
    * case in PlanAuditSpec. */
  val singlePartitionSortAllow: Set[String] = Set.empty

  /** Every node of the plan, descending THROUGH adaptive wrappers: a
    * vanilla `plan.collect` treats AdaptiveSparkPlanExec/QueryStageExec
    * as leaves (their working plan is a field, not a child), so any
    * detector built on it is silently vacuous whenever AQE is on —
    * which in Spark 4 is the default. */
  def allNodes(p: SparkPlan): Seq[SparkPlan] = p +: (p match {
    case a: AdaptiveSparkPlanExec => allNodes(a.inputPlan)
    case s: QueryStageExec => allNodes(s.plan)
    case other => other.children.flatMap(allNodes)
  })

  /** True iff the subtree contains a node that HARD-bounds its output
    * size: a limit, a top-k, or an aggregate with NO grouping keys
    * (one row). A grouped aggregate is deliberately NOT a bound — its
    * cardinality is its grouping keys', which for a corpus-keyed
    * groupBy (doc_id, user_id) is the corpus itself (ADVICE round 11:
    * the old any-aggregate rule let such a plan pass as "bounded"). */
  def bounded(p: SparkPlan): Boolean = allNodes(p).exists {
    case _: GlobalLimitExec | _: LocalLimitExec => true
    case _: TakeOrderedAndProjectExec => true
    case a: BaseAggregateExec => a.groupingExpressions.isEmpty
    case _ => false
  }

  /** True iff this subtree feeds its parent from a single partition —
    * an explicit shuffle/coalesce to one partition, or any node whose
    * declared output partitioning is SinglePartition. Descends through
    * AQE wrappers to the first concrete node. */
  def singlePartitionFeed(p: SparkPlan): Boolean = {
    val concrete = p match {
      case a: AdaptiveSparkPlanExec => a.inputPlan
      case s: QueryStageExec => s.plan
      case other => other
    }
    concrete match {
      case e: ShuffleExchangeExec => e.outputPartitioning == SinglePartition
      case c: CoalesceExec => c.numPartitions == 1
      case other =>
        try other.outputPartitioning == SinglePartition
        catch { case _: Throwable => false }
    }
  }

  /** WARN-class scale signals in a physical plan, as short tags.
    * Empty = the plan is clean for `name` under the audited allowlists.
    */
  def scaleWarnings(name: String, plan: SparkPlan): Seq[String] = {
    val nodes = allNodes(plan)
    val tags = scala.collection.mutable.ArrayBuffer[String]()
    if (!denseByDesign(name) && nodes.exists {
        case _: CartesianProductExec | _: BroadcastNestedLoopJoinExec => true
        case _ => false
      })
      tags += "dense_join"
    val unpartitioned = nodes.collect {
      case w: WindowExec if w.partitionSpec.isEmpty => w
    }
    // every unpartitioned window outside the allowlist is a finding:
    // "unbounded_window" when no hard bound sits below it,
    // "unlisted_window" when the child merely LOOKS bounded (e.g. a
    // grouped aggregate) — either way allowlist membership, i.e. a
    // reviewed boundedness argument, is required to silence it
    if (unpartitioned.nonEmpty && !boundedWindowAllow(name))
      tags += (if (unpartitioned.exists(w => !bounded(w.child)))
        "unbounded_window" else "unlisted_window")
    // a sort fed by ONE partition of an unbounded stream pushes the
    // whole corpus through a single task (the sibling failure mode of
    // the unpartitioned window)
    if (!singlePartitionSortAllow(name) && nodes.exists {
        case s: SortExec => singlePartitionFeed(s.child) && !bounded(s.child)
        case _ => false
      })
      tags += "single_partition_sort"
    tags.toSeq
  }
}
