package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import graft.{SparkEntry, TestSpark}

/** Plan-shape regressions for the flagship queries: these are the
  * properties `.explain` reviews verified once (PLANS.md) — asserting
  * them keeps a refactor from silently trading a broadcast for a 100 TB
  * shuffle or widening a scan.
  */
class PlanShapeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, dir).queryExecution.executedPlan.toString

  private def planFormatted(name: String): String =
    SparkEntry.queries(name)(spark, dir).queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)

  test("q5 joins its dimension tables by broadcast, not shuffle") {
    val p = plan("q5_nation_revenue")
    assert(p.contains("BroadcastHashJoin"), p.take(2000))
  }

  test("q1 scans only the columns it aggregates") {
    val p = planFormatted("q1_pricing_summary")
    val read = "ReadSchema: struct<([^>]*)>".r.findFirstMatchIn(p).map(_.group(1)).getOrElse("")
    assert(read.nonEmpty)
    // pricing summary needs flags + 4 measures; the 11-column table must not be read whole
    assert(read.split(",").length <= 7, s"scan too wide: $read")
    assert(!read.contains("l_orderkey") && !read.contains("l_partkey"), read)
  }

  test("window_topk benefits from rank-limit pushdown (WindowGroupLimit)") {
    val p = plan("window_topk")
    assert(p.contains("WindowGroupLimit"), p.take(2000))
  }

  test("no query plans a cartesian product or nested-loop join") {
    for (name <- Seq("q3_top_revenue", "q5_nation_revenue", "asof_join",
        "range_join_events", "join_skew_salted", "dedup_ngram",
        "merge_upsert", "retention_cohorts", "interval_merge")) {
      val p = plan(name)
      assert(!p.contains("CartesianProduct"), s"$name: cartesian")
      // broadcast NLJ is tolerable only for tiny dims; none of these need it
      assert(!p.contains("BroadcastNestedLoopJoin"), s"$name: BNLJ")
    }
  }

  test("tfidf document frequencies join by broadcast (vocab ≪ corpus)") {
    val p = plan("tfidf_top_terms")
    assert(p.contains("BroadcastHashJoin"), p.take(2000))
  }

  test("merge_upsert is one key-partitioned join, no driver round-trip") {
    val p = plan("merge_upsert")
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin"), p.take(2000))
    assert(!p.contains("CollectLimit"), p.take(2000))
  }

  test("argmax queries plan as aggregates, not window sorts") {
    for (name <- Seq("latest_snapshot", "mode_per_group", "dedup_keep_best")) {
      val p = plan(name)
      assert(!p.contains("Window"), s"$name planned a window: ${p.take(1500)}")
    }
  }

  test("histogram bounds broadcast as a one-row frame (BNLJ is the right shape here)") {
    val p = plan("histogram_price")
    // the cross join against the 1-row bounds frame must be broadcast,
    // not a shuffled cartesian
    assert(p.contains("BroadcastNestedLoopJoin"), p.take(2000))
    assert(!p.contains("CartesianProduct"), p.take(2000))
  }

  test("bm25 ranks via TakeOrderedAndProject, never a global sort of the corpus") {
    val p = plan("bm25_score")
    assert(p.contains("TakeOrderedAndProject"), p.take(2000))
    assert(p.contains("BroadcastHashJoin"), p.take(2000)) // df/dl side frames
  }

  test("pareto_front joins the domain-sized frontier back by broadcast") {
    val p = plan("pareto_front")
    assert(p.contains("BroadcastHashJoin"), p.take(2000))
    assert(!p.contains("CartesianProduct"), p.take(2000))
  }

  test("iterative graph ops (label_prop, pagerank) stay equi-join keyed — " +
       "no cartesians, no nested loops, no driver collects") {
    for (name <- Seq("label_prop", "pagerank")) {
      val p = plan(name)
      assert(!p.contains("CartesianProduct"), s"$name: cartesian")
      assert(!p.contains("BroadcastNestedLoopJoin"), s"$name: BNLJ")
      assert(!p.contains("CollectLimit"), s"$name: driver collect")
    }
  }

  test("containment join verifies through hash equi-joins only") {
    val p = plan("dedup_contain")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      p.take(2000))
  }

  test("recall audits: gram cap stays a broadcast anti-join; pair joins are equi") {
    // Materialize hides its upstream subtree (incl. the cap anti-join)
    // behind a checkpoint scan; plan-only inspection wants the pure plan
    val key = graft.operators.Materialize.Key
    val prev = spark.conf.get(key, "eager")
    spark.conf.set(key, "none")
    try for (name <- Seq("minhash_recall", "simhash_recall")) {
      val p = plan(name)
      // capGramDocFreq removes hot grams without reshuffling the gram frame
      assert(p.contains("BroadcastHashJoin LeftAnti") ||
        p.contains("LeftAnti, BuildRight"), s"$name: cap not broadcast\n${p.take(2000)}")
      assert(!p.contains("CartesianProduct"), s"$name: cartesian")
      // the ONLY nested-loop joins allowed are the two one-row stat frames
      // (n_true x n_hit crossJoin); a third means a pair join degenerated
      val bnlj = "BroadcastNestedLoopJoin".r.findAllIn(p).length
      assert(bnlj <= 2, s"$name: $bnlj BNLJs, expected <= 2 one-row stat joins")
    } finally spark.conf.set(key, prev)
  }

  test("continuation graph/dedup ops stay equi-join keyed (no cartesian, " +
       "no data-path NLJ)") {
    val key = graft.operators.Materialize.Key
    val prev = spark.conf.get(key, "eager")
    spark.conf.set(key, "none")
    try for (name <- Seq("link_predict", "freq_triples", "bfs_hops",
        "novelty_rate", "doc_logprob2", "ts_forecast", "cdc_apply")) {
      val p = plan(name)
      assert(!p.contains("CartesianProduct"), s"$name: cartesian")
      assert(!p.contains("BroadcastNestedLoopJoin"), s"$name: BNLJ")
    } finally spark.conf.set(key, prev)
  }

  test("link_predict drops existing edges via an anti-join, not a filter " +
       "over a wider join") {
    val key = graft.operators.Materialize.Key
    val prev = spark.conf.get(key, "eager")
    spark.conf.set(key, "none")
    try assert(plan("link_predict").contains("LeftAnti"))
    finally spark.conf.set(key, prev)
  }

  test("cdc_apply folds as ONE aggregate: no window, no join") {
    val p = plan("cdc_apply")
    assert(!p.contains("Window"), p.take(2000))
    assert(!p.contains("Join"), p.take(2000))
  }

  test("rfm_segment scores via broadcast-joined thresholds") {
    assert(plan("rfm_segment").contains("BroadcastHashJoin"))
  }

  test("cond_entropy stays equi-join keyed over vocabulary-sized frames") {
    val p = plan("cond_entropy")
    assert(!p.contains("CartesianProduct"), p.take(2000))
    assert(!p.contains("BroadcastNestedLoopJoin"), p.take(2000))
  }

  test("bloom_prefilter probes the filter map-side: the bloom predicate " +
       "is a Filter, never a join; the exact verify joins by broadcast") {
    val p = plan("bloom_prefilter")
    assert(p.contains("might_contain"), p.take(3000))
    assert(!p.contains("CartesianProduct"), p.take(2000))
    // only the final one-row stat crossJoins may nest-loop: n_tg, n_exact,
    // n_missed, n_bloom fold onto the n_train row — 4 single-row joins
    val bnlj = "BroadcastNestedLoopJoin".r.findAllIn(p).length
    assert(bnlj <= 4, s"$bnlj BNLJs, expected <= 4 one-row stat joins")
  }

  test("margin_sample fans out by broadcast (labels-sized centroid bank) " +
       "and takes the bottom-20 via TakeOrderedAndProject, no global sort") {
    val p = plan("margin_sample")
    assert(p.contains("TakeOrderedAndProject"), p.take(2000))
    assert(!p.contains("CartesianProduct"), p.take(2000))
  }

  test("shard_plan and mix_temperature never shuffle more than the " +
       "aggregate frames (no cartesian on the data path)") {
    for (name <- Seq("shard_plan", "mix_temperature")) {
      val p = plan(name)
      assert(!p.contains("CartesianProduct"), s"$name: cartesian")
    }
  }

  /** The logical joins whose condition references EXACTLY {id, n_id} —
    * the exact-cosine re-rank join corpus⋈candidates in Similarity's
    * search tails (`exactCosOnCandidates`'s `id === n_id`). The ADC
    * scoring join also mentions n_id but carries the code/affinity
    * columns in its condition, and the qv join keys on q_id, so the
    * exact reference set isolates the re-rank.
    */
  private def rerankJoins(name: String) = {
    import org.apache.spark.sql.catalyst.plans.logical.Join
    SparkEntry.queries(name)(spark, dir).queryExecution.optimizedPlan
      .collect { case j: Join if j.condition.exists(
        _.references.map(_.name).toSet == Set("id", "n_id")) => j }
  }

  private def hasBroadcastHint(j: org.apache.spark.sql.catalyst.plans.logical.Join) = {
    import org.apache.spark.sql.catalyst.plans.logical.HintInfo
    def b(h: Option[HintInfo]) = h.exists(_.strategy.exists(
      _.toString.toUpperCase.contains("BROADCAST")))
    b(j.hint.leftHint) || b(j.hint.rightHint)
  }

  test("ε-ball re-rank joins by SHUFFLE (no broadcast hint on the " +
       "candidate side): the admitted set is a corpus fraction at the " +
       "loose margin, and a forced broadcast would OOM at scale " +
       "(round-16 fix, Similarity.rangeCore)") {
    for (name <- Seq("ann_range", "ann_range_filtered")) {
      val joins = rerankJoins(name)
      assert(joins.nonEmpty, s"$name: no n_id-keyed join found")
      joins.foreach { j =>
        assert(!hasBroadcastHint(j),
          s"$name: re-rank join regressed to a forced broadcast: $j")
      }
    }
  }

  test("bounded top-k re-rank (knn_pq / knn_ivfpq) keeps its BROADCAST " +
       "hint: candidates are nQ·rerank-bounded, and losing the hint " +
       "would shuffle the corpus against a model-sized list") {
    for (name <- Seq("knn_pq", "knn_ivfpq")) {
      val joins = rerankJoins(name)
      assert(joins.nonEmpty, s"$name: no n_id-keyed join found")
      assert(joins.exists(hasBroadcastHint),
        s"$name: bounded re-rank lost its broadcast hint")
    }
  }
}
