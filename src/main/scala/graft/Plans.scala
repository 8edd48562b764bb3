package graft
import org.apache.spark.sql.SparkSession

/** Dumps the physical plans of the flagship queries — the artifact behind
  * the "explain and iterate" loop. Writes PLANS.md itself (UTF-8;
  * redirecting stdout would mix in sbt log lines and the forked JVM's
  * platform charset mangles non-ASCII literals). Run:
  *   sbt "runMain graft.Plans"
  */
object Plans {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config(graft.sources.Tables.NanosFlag, "true")
      // plan-only consumer: operator-internal materialization stays lazy
      // (a checkpointed frame explains as an opaque LogicalRDD anyway —
      // `none` keeps the REAL upstream plan visible in PLANS.md)
      .config(graft.operators.Materialize.Key, "none")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.01"
    val picks = Seq(
      "moodle_normalize", "q1_pricing_summary", "q3_top_revenue",
      "q5_nation_revenue", "dedup_minhash", "knn_brute", "asof_join",
      "topk_agg", "range_join_events", "grouping_sets", "stats_moments",
      "merge_upsert", "interval_merge", "tfidf_top_terms",
      "latest_snapshot", "fingerprint_winnow",
      // round-6 additions: the planner-workout TPC-H shapes + new ops
      "q8_market_share", "q17_small_qty", "q21_late_suppliers",
      "q2_min_acct_supplier", "mix_sample", "agg_merge", "emb_project",
      "zorder_buckets",
      // round-6 continuation: retrieval/frontier/community flagships
      "bm25_score", "rrf_fusion", "dsir_weights", "pareto_front",
      "regr_per_group", "hll_rollup", "label_prop", "quantile_norm",
      // recall audits: shared rare-gram truth + sketch/ANN found sets
      "minhash_recall", "knn_lsh_recall",
      // round-6 late additions: KMV intersection + deflate signal
      "theta_intersect", "compress_ratio",
      // round-8 additions: BPE trainer, semantic dedup, high-recall IVF
      "bpe_merges", "sem_dedup", "knn_ivf_hi", "dedup_contain", "pagerank",
      // round-8 late additions: triplet miner (broadcast anchors, one
      // struct-agg exchange), CMS rollup (sketch merge in SQL), and the
      // chunk-dedup document rewrite
      "triplet_mine", "cms_rollup", "dedup_rewrite",
      // round-8 continuation: graph/warehouse/audit additions
      "link_predict", "freq_triples", "bfs_hops", "cdc_apply",
      "rfm_segment", "novelty_rate", "doc_logprob2",
      // round-8 second continuation: bloom probe (might_contain filter),
      // LPA+modularity, exact-moment graph audits, margin sampling,
      // entropy/χ² decimal-snap audits, edit-distance dedup
      "bloom_prefilter", "modularity", "assortativity", "hits_rank",
      "margin_sample", "cond_entropy", "chi2_assoc", "dedup_edit",
      "survival_km", "mix_waterfill", "skipgram_pairs",
      // batch-3 late additions: PQ codebooks, mutual-NN, family sizes
      "emb_pq", "mutual_nn", "dup_cluster_sizes",
      // round-12 additions: persisted-index search + filtered ANN +
      // consensus dedup (the early-round batch), the probe family's
      // scoring/gate shapes (training runs at construction, the plan
      // shown is the literal-folded deployment projection), the scatter
      // drift projection, the md5 MinHash parity pipeline, and the
      // k-center coverage aggregation
      "ann_index_search", "knn_filtered", "dedup_consensus",
      "linear_probe_score", "probe_pr_curve", "text_probe_eval",
      "label_scatter_project", "coreset_cover", "dedup_minhash_md5",
      // round-13 additions: the persisted near-dup ledger probe
      // (partition-pruned bucket scan), corpus-covariance pc1 (the
      // double-generator Gram pass), the codebook drift monitor, and
      // the audio fingerprint recall audit
      "dedup_ledger_probe", "emb_pca", "ann_index_health",
      "audio_neardup_recall",
      // round-13 continuation: the whitening certificate (literal-folded
      // transform + one moment aggregation), the JL distortion audit
      // (hash sample → partitioned lead window → fan-out distances),
      // the seeded-Laplace DP release, and the block-local mixing audit
      "emb_whiten_check", "emb_jl_check", "dp_release", "shuffle_audit",
      // round-13 close: private selection (TakeOrderedAndProject under
      // the Gumbel-max), the unigram encode broadcast join, the df-ranked
      // boilerplate report, and the soft-dedup weight join
      "dp_topk", "unigram_encode", "boilerplate_ngrams", "dedup_soft_weights",
      // round-14 additions: the contour-banded audio near-dup (melody
      // bands + Hamming verify join shape), its group-collapsed sibling,
      // and the full-rank whitening certificate (broadcast matvec +
      // Gram pass)
      "audio_neardup", "audio_neardup_groups", "emb_whiten_full_check",
      // round-15 additions: the row-local repetition-signal scan (one
      // projection + presentation sort — the no-shuffle shape is the
      // point) and the exact-substring dedup rewrite (window-hash keeper
      // ranking + per-doc interval merge + HOF reassembly, no pair join)
      "rep_signals", "span_dedup_text",
      // round-15 continuation: the fused suite-kernel scan (one
      // expression for all nine widths), the two new hygiene rule
      // families, and the denoiser preps (row-local rebuild shapes; the
      // UL2 mixture must show three branch projections over one scan,
      // unioned — no join)
      "gq_filter", "c4_clean", "span_corrupt", "ul2_mix",
      // the combined filter must show ONE scan feeding both signal
      // families and no extra exchange beyond the presentation sort
      "gopher_filter", "ccnet_buckets",
      // round-16 additions: the capacity-bounded enrolment plan (anti-
      // join on the enrolment ledger + broadcast catalog + per-course
      // seat window, no global ordering), the ε-ball range search
      // (partition-pruned codes scan → absolute ADC admission → exact
      // re-rank — must show PartitionFilters on c_id, no top-k window),
      // the distributed-prefix packing layout (range repartition +
      // bounded windows + partition-count offsets — no global data
      // window), and the contamination→sequence composition (broadcast
      // gram probe + left-semi on the offset map + span explode)
      "enrol_plan", "ann_range", "pack_offsets", "decon_chunks")
    val sb = new StringBuilder
    sb ++= "# PLANS - physical plans of flagship queries (sf0.01)\n\n"
    sb ++= "Generated by `sbt \"runMain graft.Plans\"`. What to look for:\n"
    sb ++= "- `PushedFilters` / narrow `ReadSchema` on every parquet scan;\n"
    sb ++= "- `BroadcastHashJoin` for dim/query-side smalls, shuffle joins only on fact-fact keys;\n"
    sb ++= "- `TakeOrderedAndProject` instead of global sorts under LIMIT;\n"
    sb ++= "- wide `WholeStageCodegen` spans (custom expressions included);\n"
    sb ++= "- exactly one Exchange per logical rendezvous.\n"
    // per-plan cap: with materialization off, the iterative operators
    // (bpe_merges: 6 unrolled vocab rounds) explain to 100s of KB of
    // repeated lineage; the structural signal is in the head
    val MaxPlanChars = 20000
    picks.foreach { name =>
      sb ++= s"\n## $name\n\n```\n"
      val plan = SparkEntry.queries(name)(spark, dir).queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      sb ++= (if (plan.length <= MaxPlanChars) plan
              else plan.take(MaxPlanChars) +
                s"\n... [truncated ${plan.length - MaxPlanChars} chars of repeated unrolled lineage]")
      sb ++= "\n```\n"
    }
    java.nio.file.Files.writeString(java.nio.file.Paths.get("PLANS.md"), sb.toString)
    println(s"wrote PLANS.md (${sb.length} chars)")
    spark.stop()
  }
}
