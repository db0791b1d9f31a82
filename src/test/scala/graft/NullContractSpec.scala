package graft

import org.apache.spark.sql.functions._

/** The null-text contract sweep (r13, verdict r12 #7): one planted
  * null-text document, EVERY registered operator classified — kept row,
  * deliberate exclusion, or not-per-doc — so no operator can silently
  * change its null contract again (r12 caught bpe/unigram encode
  * dropping null-text rows by accident; this pins the whole registry).
  *
  * The contract behind the `drop` class: md5(NULL) is NULL on both
  * engines and a NULL key never equi-joins, so every operator that keys
  * docs by their content hash (the th-join family: exact/incremental/
  * bloom dedup, members/clusters/split, the signature-serving scorers
  * and per-match outputs) excludes null-text docs BY DESIGN — the same
  * rows DuckDB's oracle drops, which is why the gate hash-matches. The
  * `keep` class is every per-doc operator whose output contract is "one
  * row per input doc" (metadata, quality scores, tokenizer encodes after
  * the r12 LEFT-join fix, packing — null text packs as zero tokens).
  */
class NullContractSpec extends SparkSpec {
  import spark.implicits._

  // keep  = the planted null-text doc MUST appear in the output
  // drop  = it MUST NOT (content-hash-keyed or per-unit-vacuous — the
  //         scaladoc'd deliberate exclusions)
  // any   = per-doc but sampling decides membership — no assertion
  // npd   = not per-doc over documents (other tables, aggregates,
  //         pair/retrieval outputs) — no assertion
  private val contract: Map[String, String] = Map(
    // marts / quality / analyses / elt / relational / events — TPC-H
    // tables, aggregates, or no doc_id column
    "q_stg_projection" -> "npd", "q_star_join" -> "npd",
    "q_enriched_library" -> "npd", "q_not_found" -> "npd",
    "q_mart_union" -> "npd", "q_found_agg" -> "npd",
    "q_reconcile" -> "npd", "q_sum_match" -> "npd",
    "q_count_match" -> "npd", "q_schema_tests" -> "npd",
    "q_top_groups" -> "npd", "q_dup_membership" -> "npd",
    "q_case_stats" -> "npd", "q_group_counts" -> "npd",
    "q_ratio_join" -> "npd", "q_having_agg" -> "npd",
    "q_normalize_title" -> "npd", "q_best_match" -> "npd",
    "q_iso8601" -> "npd", "q_found_predicate" -> "npd",
    "q_found_on_try" -> "npd", "q_found_by_stats" -> "npd",
    "q_found_on_try_stats" -> "npd", "q_collect_status" -> "npd",
    "q_topic_cleanup" -> "npd", "q1_pricing" -> "npd",
    "q3_topk" -> "npd", "q_topk_per_group" -> "npd",
    "q_rollup" -> "npd", "q_cube" -> "npd", "q_pivot" -> "npd",
    "q_distinct" -> "npd", "q_approx_distinct" -> "npd",
    "q_percentile" -> "npd", "q_approx_percentile" -> "npd",
    "q_rank_funcs" -> "npd", "q_exists_semi" -> "npd",
    "q_month_agg" -> "npd", "q_sql_surface" -> "npd",
    "q_salted_agg" -> "npd", "q_asof_join" -> "npd",
    "q_window_events" -> "npd", "q_sessionize" -> "npd",
    "q_range_join" -> "npd", "q_tz_rollup" -> "npd",
    "q_rolling_stats" -> "npd", "q_merge_upsert" -> "npd",
    "q_scd2" -> "npd", "q_window_funnel" -> "npd",
    "q_retention" -> "npd", "q_anomaly" -> "npd",
    "q_keep_newest" -> "npd", "q_histogram" -> "npd",
    "q_profile" -> "npd", "q_json_extract" -> "npd",
    // substring score runs over parts but carries a doc_id-named join
    // column in the probe corpus — observed keep, per-row contract
    "q_substring_score" -> "keep",
    // G family: per-doc keepers — one output row per input doc, null
    // text rides as null/zero features
    "q_token_count" -> "keep", "q_quality_score" -> "keep",
    "q_lang_id" -> "keep", "q_fingerprint" -> "keep",
    "q_pii_redact" -> "keep", "q_repetition_score" -> "keep",
    "q_lm_score" -> "keep", "q_corpus_funnel" -> "keep",
    "q_ccnet_bucket" -> "keep", "q_gopher_rules" -> "keep",
    "q_dsir_select" -> "keep", "q_dsir_weights" -> "keep",
    "q_decontaminate" -> "keep", "q_dedup_span" -> "keep",
    "q_dedup_paragraph" -> "keep", "q_multimodal_meta" -> "keep",
    "q_pack_sequences" -> "keep", "q_shuffle_order" -> "keep",
    "q_pack_shuffled" -> "keep", "q_epoch_sample" -> "keep",
    "q_grouped_sample" -> "keep",
    "q_bpe_encode" -> "keep", "q_unigram_encode" -> "keep",
    // G family: deliberate exclusions — content-hash (th) keyed: a NULL
    // key never equi-joins (both engines), so null-text docs are out of
    // the dedup id space by contract…
    "q_dedup_exact" -> "drop", "q_dedup_members" -> "drop",
    "q_dedup_clusters" -> "drop", "q_dedup_incremental" -> "drop",
    "q_dedup_bloom" -> "drop", "q_split_assign" -> "drop",
    "q_quality_classifier" -> "drop", // scores via the th-keyed features
    // …or per-UNIT outputs where a null doc has no units (vacuously
    // absent: no chunks, no terms, no fingerprints, no matches)
    "q_chunk_docs" -> "drop", "q_tfidf" -> "drop",
    "q_winnow" -> "drop", "q_phrase_search" -> "drop",
    // sampling decides membership — no assertion on one planted doc
    "q_sample_stratified" -> "any",
    // pair / rep / retrieval / aggregate / embedding-keyed outputs
    "q_dedup_ngram" -> "npd", "q_dedup_ngram_rep" -> "npd",
    "q_dedup_contain" -> "npd", "q_dedup_minhash" -> "npd",
    "q_dedup_minhash_rep" -> "npd", "q_dedup_simhash" -> "npd",
    "q_dedup_simhash_rep" -> "npd", "q_dedup_embed" -> "npd",
    "q_dedup_embed_rep" -> "npd", "q_dedup_embed_knn" -> "npd",
    "q_dedup_semantic" -> "npd",
    "q_ann_topk" -> "npd", "q_ann_lsh" -> "npd", "q_ann_ivf" -> "npd",
    "q_ann_pq" -> "npd", "q_ann_ivfpq" -> "npd",
    "q_rrf_hybrid" -> "npd", "q_mmr_rerank" -> "npd",
    "q_cluster_mix" -> "npd", "q_dedup_binary" -> "npd",
    "q_bm25" -> "npd", "q_heavy_hitters" -> "npd",
    "q_cooccur_pmi" -> "npd", "q_domain_stats" -> "npd",
    "q_dataset_card" -> "npd", "q_source_overlap" -> "npd",
    "q_source_divergence" -> "npd", "q_mix_weights" -> "npd",
    "q_pack_manifest" -> "npd", "q_bpe_train" -> "npd",
    "q_unigram_train" -> "npd", "q_vocab_coverage" -> "npd",
    "q_langid_eval" -> "npd")

  test("null-text contract: every registered operator is classified and behaves as declared") {
    val missing = SparkEntry.registry.map(_.name).filterNot(contract.contains)
    assert(missing.isEmpty,
      s"unclassified operators — declare their null-text contract here: $missing")
    val stale = contract.keySet -- SparkEntry.registry.map(_.name).toSet
    assert(stale.isEmpty, s"contract entries for retired operators: $stale")

    val src = "/root/testdata/sf0.001"
    val tmp = java.nio.file.Files.createTempDirectory("nullctr").toString
    val idxRoot = java.nio.file.Files.createTempDirectory("nullctr_idx").toString
    spark.conf.set("graft.ann.indexRoot", idxRoot)
    try {
      // the full table set: a few per-doc operators join other tables
      for (f <- new java.io.File(src).listFiles().map(_.getName))
        spark.read.parquet(s"$src/$f").write.mode("overwrite").parquet(s"$tmp/$f")
      Seq((999999L, null.asInstanceOf[String], "en", "probe", 0L))
        .toDF("doc_id", "text", "lang", "source", "n_chars")
        .repartition(1).write.mode("append").parquet(s"$tmp/documents.parquet")
      val perDoc = SparkEntry.registry
        .filter(q => Set("keep", "drop", "any")(contract(q.name)))
      for (q <- perDoc) {
        val present =
          try q.run(spark, tmp).where(col("doc_id") === 999999L).count() > 0
          finally CacheBag.release()
        contract(q.name) match {
          case "keep" => assert(present,
            s"${q.name}: the null-text doc must keep a row (declared keep)")
          case "drop" => assert(!present,
            s"${q.name}: the null-text doc must be excluded (declared drop)")
          case _ =>
            // `any` (sampling decides membership): the pin is
            // DETERMINISM, not a fixed verdict — the same corpus must
            // sample the same rows on every run (r14, verdict r13 #8:
            // no registry class is assertion-free)
            val again =
              try q.run(spark, tmp).where(col("doc_id") === 999999L).count() > 0
              finally CacheBag.release()
            assert(present == again,
              s"${q.name}: sampled membership of the probe doc must be deterministic")
        }
      }
    } finally {
      spark.conf.unset("graft.ann.indexRoot")
    }
  }
}
