package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.ExplainMode
import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan assertions — the scale-readiness properties SURVEY §4/§6
  * call out are pinned here so a regression (lost pushdown, lost broadcast,
  * a surprise cartesian) fails CI, not the 100 TB run.
  */
class PlanSpec extends AnyFunSuite {
  import TestSpark._

  private def plan(name: String): String = {
    val df: DataFrame = SparkEntry.queries(name)(spark, sf)
    df.queryExecution.explainString(ExplainMode.fromString("formatted"))
  }

  /** Simple-mode plan: shows `*(n)` whole-stage-codegen stage markers and
    * inline Exchange arguments, which formatted mode elides.
    */
  private def simplePlan(name: String): String = {
    val df: DataFrame = SparkEntry.queries(name)(spark, sf)
    df.queryExecution.explainString(ExplainMode.fromString("simple"))
  }

  test("op_filter predicates reach the parquet scan (PushedFilters)") {
    val p = plan("op_filter")
    assert(p.contains("PushedFilters"), "no pushdown section in scan")
    assert(p.contains("GreaterThanOrEqual(o_orderdate"),
      "timestamp range predicate not pushed to parquet")
    assert(p.contains("In(o_orderpriority"),
      "IN-list predicate not pushed to parquet")
  }

  test("op_project prunes the scan to referenced columns only") {
    val p = plan("op_project")
    val readSchema = p.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(readSchema.contains("p_partkey") && readSchema.contains("p_name"))
    assert(!readSchema.contains("p_brand") && !readSchema.contains("p_type"),
      s"scan reads unused columns: $readSchema")
  }

  test("join_broadcast uses a BroadcastHashJoin") {
    assert(plan("join_broadcast").contains("BroadcastHashJoin"))
  }

  test("join_inner_equi is a shuffle join, never a nested loop") {
    val p = plan("join_inner_equi")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"))
  }

  test("agg_hash does partial (map-side) aggregation before the shuffle") {
    val p = simplePlan("agg_hash")
    assert("HashAggregate\\(keys=".r.findAllIn(p).size >= 2,
      "expected partial+final HashAggregate pair")
    assert(p.contains("partial_sum"), "no map-side partial aggregation")
    val codegen = SparkEntry.queries("agg_hash")(spark, sf)
      .queryExecution.explainString(ExplainMode.fromString("codegen"))
    assert(codegen.contains("WholeStageCodegen subtrees"),
      "aggregation fell out of whole-stage codegen")
  }

  test("llm_dedup_fuzzy candidate generation is equi-join based (no cartesian)") {
    // The registered query returns a checkpointed pair set; assert on the
    // underlying lazy pipeline plan, where the joins are still visible.
    val (_, verified) = graft.operators.Llm.nearDupPairsPlan(spark, sf)
    val p = verified.queryExecution.explainString(ExplainMode.fromString("formatted"))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "LSH candidate generation degenerated into an all-pairs join")
  }

  test("llm_dedup_substring never materializes a pair join and scans the " +
      "corpus exactly once") {
    val p = plan("llm_dedup_substring")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "exact-substring dedup degenerated into an all-pairs join")
    // round 20: the single-pass shape — (anchor, doc) hash-agg + one
    // window verdict — replaced the hash-agg + left-semi probe, which
    // re-ran the explode + md5 corpus scan three times. Pin ONE scan.
    // formatted mode prints each operator in the tree AND the details
    // list — count the numbered detail headers (the old 3-subtree shape
    // showed (1)/(9)/(14) Scan parquet)
    assert("""\(\d+\) Scan parquet""".r.findAllIn(p).size == 1,
      "exact-substring dedup must read the corpus exactly once")
  }

  test("llm_semdedup pairs are cluster-bounded equi-joins, never a cartesian") {
    val p = plan("llm_semdedup")
    // the K=16 centroid broadcast legitimately plans as a nested-loop
    // over a 16-row build side (and appears once per reuse of the
    // assignment subtree); what must NEVER appear is an unbounded
    // cartesian, and the PAIRWISE stage must join on the cluster id
    assert(!p.contains("CartesianProduct"))
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin") ||
      p.contains("BroadcastHashJoin"),
      "the pairwise stage must be an equi-join on the cluster id")
  }

  test("llm_dedup_embed candidates come from the LSH bucket equi-join, not all pairs") {
    val p = plan("llm_dedup_embed")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "embedding near-dup degenerated into an all-pairs nested-loop join")
  }

  test("llm_simsearch_topk broadcasts the query side") {
    assert(plan("llm_simsearch_topk").contains("BroadcastExchange"))
  }

  test("join_bucketed: bucket layout feeds the merge join with no exchange") {
    // Assert on the lazy join plan; the bucketed tables are session-memoized
    // fixtures now (dropBucketedTables owns their lifecycle, not callers).
    val (_, joined) = graft.operators.Relational.joinBucketedPlan(spark, sf)
    val p = joined.queryExecution.explainString(ExplainMode.fromString("simple"))
    assert(p.contains("SortMergeJoin"))
    // The only hash exchange allowed is the groupBy on o_orderpriority —
    // the join itself must be satisfied by the bucket layout.
    val shuffles = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(shuffles == 1,
      s"bucketed join should not shuffle on the join key; found $shuffles hash exchanges")
    assert(!p.contains("Exchange hashpartitioning(l_orderkey") &&
           !p.contains("Exchange hashpartitioning(o_orderkey"),
      "join key exchange present despite bucketing")
  }

  test("join_salted: shuffle join keyed on (event_type, salt), not event_type alone") {
    val p = simplePlan("join_salted")
    assert(p.contains("SortMergeJoin"), "salted join demo lost its shuffle_merge hint")
    val joinLine = p.linesIterator.find(_.contains("SortMergeJoin")).get
    assert(joinLine.contains("salt"), s"salt missing from join keys: $joinLine")
  }

  test("join_asof_native plans the custom AsOfJoin operator with merge requirements") {
    val p = plan("join_asof_native")
    assert(p.contains("AsOfJoin"), "custom strategy did not plan AsOfJoinExec")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"))
    // EnsureRequirements must satisfy the operator's declared distribution
    // and ordering: a hash exchange on the key and a (key, ts) sort per side.
    assert("Exchange hashpartitioning\\(user_id".r.findFirstIn(
      simplePlan("join_asof_native")).isDefined ||
      p.contains("hashpartitioning(user_id"),
      "fact side not hash-partitioned on the as-of key")
  }

  test("op_lateral decorrelates into a join — no per-row subquery, no cartesian") {
    val p = plan("op_lateral")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "LATERAL subquery was not decorrelated into an aggregate + join")
  }

  test("op_sql_subquery rewrites EXISTS / NOT IN into semi/anti joins") {
    val p = plan("op_sql_subquery")
    assert(p.contains("LeftSemi") || p.contains("ExistenceJoin"),
      "EXISTS did not become a semi join")
    assert(p.contains("LeftAnti"), "NOT IN did not become an anti join")
    assert(!p.contains("CartesianProduct"))
  }

  test("join_range_bucketed: interval join is a bucket equi-join, not a nested loop") {
    val p = plan("join_range_bucketed")
    assert(p.contains("BroadcastHashJoin"),
      "bucket-expanded interval join should be a (broadcast) hash equi-join")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      "interval join degenerated into a nested loop")
  }

  test("llm_dedup_apply broadcasts the non-keeper set against the corpus scan") {
    val p = plan("llm_dedup_apply")
    assert(p.contains("BroadcastHashJoin"),
      "non-keeper anti/semi join should broadcast, not shuffle the corpus")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"))
  }

  test("op_macro_subst: resolved macro literals push down to the scans") {
    val p = plan("op_macro_subst")
    assert(p.contains("EqualTo(o_orderstatus,O)"),
      "resolved ${orderStatus} macro did not reach the orders scan")
    assert(p.contains("EqualTo(r_name,ASIA)"),
      "resolved ${targetRegion} macro did not reach the region scan")
  }

  test("win_topk_per_group plans exactly one shuffle for partitioning") {
    val p = simplePlan("win_topk_per_group")
    val shuffles = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(shuffles == 1, s"expected 1 hash exchange, found $shuffles")
  }

  test("llm_decontaminate broadcasts the benchmark side, corpus never shuffles pre-join") {
    val p = plan("llm_decontaminate")
    assert(p.contains("BroadcastHashJoin"),
      "benchmark shingle join should broadcast the tiny benchmark side")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"))
  }

  test("join_dpp injects a dynamic-partition-pruning subquery on the fact scan") {
    val p = plan("join_dpp")
    assert(p.contains("dynamicpruning"),
      "no DPP subquery — the fact scan would read every partition directory")
  }

  test("llm_embed_quantize broadcasts the 64-row per-dim stats back") {
    val p = plan("llm_embed_quantize")
    assert(p.contains("BroadcastHashJoin"),
      "per-dim min/max should broadcast, not shuffle the exploded corpus")
  }

  test("llm_knn_graph is a bucket equi-join, never all-pairs") {
    val p = plan("llm_knn_graph")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "kNN graph must join on the LSH bucket key, not enumerate all pairs")
  }

  test("op_dq_profile reads the orders file exactly once") {
    // simple mode prints one `FileScan` token per physical scan node
    // (formatted mode repeats each node in its details section).
    val p = simplePlan("op_dq_profile")
    val scans = "FileScan parquet".r.findAllIn(p).size
    assert(scans == 1, s"profile must be single-scan, found $scans scans")
    assert(p.contains("Expand"),
      "multi-countDistinct should plan via Expand, not repeated scans")
  }

  test("op_funnel_events shuffles on user_id at every stage (key reuse)") {
    val p = simplePlan("op_funnel_events")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"))
    assert("Exchange hashpartitioning\\(user_id".r.findAllIn(p).nonEmpty,
      "funnel stages must partition by user_id")
  }

  test("op_tpch_q3: dim broadcasts, dates push down, top-k is TakeOrdered") {
    val p = plan("op_tpch_q3")
    assert(p.contains("BroadcastHashJoin"),
      "filtered BUILDING customer set must broadcast")
    assert(p.contains("LessThan(o_orderdate") && p.contains("GreaterThan(l_shipdate"),
      "date predicates must reach both fact scans")
    assert(p.contains("TakeOrderedAndProject"),
      "top-10 must plan as TakeOrdered, not a global sort")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"))
  }

  test("op_tpch_q10: nation broadcasts, returnflag+window push down, TakeOrdered") {
    val p = plan("op_tpch_q10")
    assert(p.contains("BroadcastHashJoin"), "nation dim must broadcast")
    assert(p.contains("EqualTo(l_returnflag,R)"),
      "returnflag predicate must reach the lineitem scan")
    assert(p.contains("GreaterThanOrEqual(o_orderdate"),
      "quarter window must reach the orders scan")
    assert(p.contains("TakeOrderedAndProject"))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"))
  }

  test("op_tpch_q18: the big-order agg broadcasts back against orders") {
    val p = simplePlan("op_tpch_q18")
    assert(p.contains("BroadcastHashJoin"),
      "batch-sized big-order set must broadcast, not shuffle orders")
    assert("HashAggregate\\(keys=\\[l_orderkey".r.findAllIn(p).size >= 2,
      "per-order quantity agg must have a map-side partial")
    assert(p.contains("TakeOrderedAndProject"))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"))
  }

  test("llm_gopher_rules is one narrow map — no shuffle before the output sort") {
    val p = simplePlan("llm_gopher_rules")
    // exactly the final-order exchange: the rule columns are scan-speed maps
    assert(p.sliding("Exchange".length).count(_ == "Exchange") == 1,
      s"gopher rules grew an extra shuffle:\n$p")
    assert(!p.contains("Join"), "rule evaluation must not join")
  }

  test("llm_dedup_bloom prefilters with might_contain before any join") {
    val p = plan("llm_dedup_bloom")
    assert(p.toLowerCase.contains("might_contain"),
      "bloom prefilter missing from the corpus scan side")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "decontamination degenerated into an all-pairs join")
    assert(p.contains("LeftSemi"), "exact verify must be a semi-join")
  }

  test("llm_multimodal_dedup aggregates with map-side partials on the digest") {
    val p = plan("llm_multimodal_dedup")
    assert(p.contains("partial_"), "digest agg must have a map-side partial")
    assert(!p.contains("Join"), "binary dedup is a pure hash agg")
  }
}
