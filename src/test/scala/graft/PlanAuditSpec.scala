package graft

import org.apache.spark.sql.execution.ExplainMode

/** Sweep audit over EVERY registered query's optimized physical plan.
  *
  * Two invariants:
  *  1. No query may plan a `CartesianProduct` — Spark only falls back
  *     to it when NEITHER side broadcasts, i.e. a genuine corpus×corpus
  *     product, which is never acceptable at 100 TB.
  *  2. `BroadcastNestedLoopJoin` stages are PINNED per query. The
  *     engine uses BNLJ in exactly two deliberate shapes — the
  *     fit-then-fold idiom (`crossJoin(broadcast(oneRowFitFrame))`:
  *     the broadcast side is a keyless aggregate's single row, so the
  *     "nested loop" degenerates to a constant fold) and the
  *     documented blocked/bounded all-pairs kernels (embedding
  *     near-dup cogroup, brute-force ANN ground truth). A refactor
  *     that introduces a NEW nested-loop stage — the classic silent
  *     cross-product regression — changes a count and fails here,
  *     forcing a conscious review instead of a cluster incident. */
class PlanAuditSpec extends SparkSpec {

  /** query → expected BroadcastNestedLoopJoin stages in its optimized
    * plan at sf0.001. Every entry is one of the two deliberate shapes
    * above; queries absent from the map must plan zero. */
  private val pinnedBnlj: Map[String, Int] = Map.empty ++ PlanAuditSpec.expected

  test("no CartesianProduct anywhere; nested-loop stages match the pinned census") {
    // the census is calibrated against CLEAN-session plans: a cached
    // frame left by an earlier suite substitutes an InMemoryRelation —
    // and an already-EXECUTED adaptive cached plan prints final+initial
    // trees in formatted explain, double-counting its nodes
    spark.catalog.clearCache()
    val drift = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        try {
          val p = fn(spark, sfDir).queryExecution
            .explainString(ExplainMode.fromString("formatted"))
          // count numbered node entries only — the formatted explain
          // prints each physical node once in the tree and once in the
          // "(n) NodeName" detail section
          val cart = """\(\d+\) CartesianProduct""".r.findAllIn(p).nonEmpty
          val bnlj = """\(\d+\) BroadcastNestedLoopJoin""".r.findAllIn(p).size
          val want = pinnedBnlj.getOrElse(name, 0)
          if (cart) Some(s"$name: CartesianProduct")
          else if (bnlj != want) Some(s"$name: $bnlj BNLJ (pinned $want)")
          else None
        } catch {
          case e: Throwable => Some(s"$name: failed to plan (${e.getClass.getSimpleName})")
        }
    }
    assert(drift.isEmpty, "plan-shape drift:\n  " + drift.mkString("\n  "))
  }

  test("string-payload argmax sites stay off the corpus SortAggregate path") {
    // min_by/max_by (and min/max) with a STRING payload have
    // non-UnsafeRow-mutable buffers, so Spark plans them as
    // SortAggregate — which SORTS every map partition of the input.
    // Two sites used to pay that over a full table scan and were
    // rewritten (the string siblings of the DoubleRawBits finding):
    //  - shingleReps: group-by-text + min(doc_id) — long-only buffer,
    //    pure HashAggregate; dedup_minhash_sig's whole plan must stay
    //    SortAggregate-free.
    //  - s2_latest_quote: narrow max(ts) hash agg + join-back; the
    //    only SortAggregate pair left sits ABOVE the join (the
    //    per-key tie dedup over one-ish row per key), never over the
    //    events scan, and no max_by remains anywhere.
    spark.catalog.clearCache()
    val sig = SparkEntry.queries("dedup_minhash_sig")(spark, sfDir)
      .queryExecution.explainString(ExplainMode.fromString("formatted"))
    assert("""\(\d+\) SortAggregate""".r.findAllIn(sig).isEmpty,
      "dedup_minhash_sig regained a SortAggregate:\n" + sig)
    val s2 = SparkEntry.queries("s2_latest_quote")(spark, sfDir)
      .queryExecution.explainString(ExplainMode.fromString("formatted"))
    assert(!s2.contains("max_by"), "s2 regained a string max_by:\n" + s2)
    // partial+final of the tiny post-join tie dedup — the pinned shape
    assert("""\(\d+\) SortAggregate""".r.findAllIn(s2).size == 2, s2)
    // the aggregate fed directly by a scan must be the hash one: in the
    // formatted tree the join's build side is "HashAggregate ... Scan"
    assert("""\(\d+\) HashAggregate""".r.findAllIn(s2).size == 2, s2)
  }
}

object PlanAuditSpec {
  /** The audited census. Fold-idiom entries broadcast a one-row fit
    * frame (stats row, census row, total row); kernel entries are the
    * documented bounded all-pairs stages. */
  val expected: Seq[(String, Int)] = Seq(
    // --- bounded all-pairs kernels (documented at their impl sites) --
    // dedup_embedding_cos and rank_ndcg serve memoized checkpoints
    // (plan = ExistingRDD scan, 0 joins); their BUILD shapes are
    // plan-asserted separately in PlanSpec
    "ann_brute_force" -> 1,     // broadcast query set over the corpus
    // SQ8 stage 1 is the same bounded kernel over the QUANTIZED
    // projection (broadcast 10-query set, `=!=` join); stage 2's
    // candidate fetch + query join are proper equi-joins
    "ann_sq8_search" -> 1,
    // the serve variant keeps the same single bounded kernel; the
    // stream side is the STORED int8 table instead of the inline
    // quantization (the build write happens before the plan measured
    // here — benchImpls points the warm pass at sq8ServeRead)
    "ann_sq8_serve" -> 1,
    // the append row reads the same kernel back over the append-staged
    // table: one bounded `=!=` stage-1 join, nothing else nested (the
    // day-0/batch writes happen before the measured read-back plan)
    "ann_sq8_append" -> 1,
    "ann_recall" -> 2,          // ground truth + LSH probe, both bounded
    // --- fit-then-fold one-row broadcasts (count = folds in the plan)
    "a7_normalize" -> 1, "ann_dot_expr" -> 1, "ann_ivf_assign" -> 1,
    // two-level IVF: centroid→super and vector→super routing each
    // broadcast the k1-row super set (k1 ≤ 2^12 at the 2^20-centroid
    // cap — always broadcastable, that is the point of the level)
    "ann_ivf2_assign" -> 2,
    // two-level IVF search: the same croute/vroute super-routing pair
    // PLUS query→super routing (10 queries × broadcast supers), and
    // croute plans TWICE — the shared `groups` frame is a lazy subtree
    // consumed by both the probe-list branch and the assignment
    // branch, so Catalyst plans it once under each (4 = 2·croute +
    // vroute + qsup). Every build side is the k1-row supers frame
    // (k1 ≤ 2^12) or the 10-row query set; stream side ≤ corpus.
    "ann_ivf2_search" -> 4,
    // IVF-SQ8 composes the ivf2 ROUTING (same 4 supers-broadcast
    // stages as ann_ivf2_search: 2·croute + vroute + qsup) with the
    // quantized list scan — which adds ZERO nested loops (the probe
    // join is an equi-join on cid, the stage-2 fetch on vec_id)
    "ann_ivfsq_search" -> 4,
    // the composed serve: routing tables AND the int8 corpus are
    // stored, so like ann_ivf2_serve only the 10-query × supers
    // routing broadcast remains — the 4-vs-1 delta is the point
    "ann_ivfsq_serve" -> 1,
    // the composed delete's measured plan is the post-delete search
    // over the two STAGED (written) tables: the corpus-sided
    // croute/vroute stages read staged parquet. r16: the serve routes
    // through the STORED supers/groups too, so the only nested-loop
    // left is the qsup query-routing broadcast (10 queries × supers)
    "ann_ivfsq_delete" -> 1,
    // same post-delete search shape for the merge-on-read variant and
    // its fold — the tombstone merge itself is a broadcast HASH
    // anti-join (MorDeleteSpec pins it), never nested-loop
    "ann_ivfsq_delete_mor" -> 1,
    "ann_ivfsq_mor_fold" -> 1,
    // the production serve shape: croute/vroute vanish into the
    // materialized index tables, leaving ONLY the 10-query × supers
    // routing broadcast — the 4-vs-1 delta IS the point of the row
    "ann_ivf2_serve" -> 1,
    // rebuild serves the stored live generation: the same one
    // routing-broadcast shape as ann_ivf2_serve (both generations'
    // build writes happen before the measured read plan)
    "ann_ivf2_rebuild" -> 1,
    // acceptance probe. r16: the ivf2 and ivfsq rows read the STORED
    // routing tables, so their croute/vroute nested-loop stages vanish
    // (the same 4-vs-1 delta ann_ivf2_serve documents) — each keeps
    // only its qsup query-routing broadcast. Remaining census (checked
    // against plans/r16/ann_recall2_after.txt): ivf2 qsup + ivfsq qsup
    // (condition-free supers broadcasts) + the sq8 and sq8_serve rows'
    // quantized stage-1 kernels (vec_id ≠ query_id). The ground truth
    // is the memoized brute checkpoint (zero in-plan); lsh_mp/pq/opq/
    // aniso rows are equi-joins.
    "ann_recall2" -> 4,
    // the 2-row epoch frame fanning the corpus out per epoch
    "epoch_shuffle" -> 1,
    "ann_ivf_search" -> 2, "assoc_rules" -> 1, "dataset_card" -> 1,
    // emb_pca_power dropped out of this list when its fit tail moved
    // driver-side (the 64-double iterate collects once; no fold joins)
    "dedup_funnel" -> 3, "dedup_semantic" -> 2,
    "f8_liquidity" -> 1, "feat_target_encode" -> 1,
    "imp_permutation" -> 1, "layout_zorder" -> 1,
    "pairs_contrastive" -> 1, "pipeline_full" -> 1, "qc_score" -> 1,
    "sample_dsir" -> 2, "sample_hardneg" -> 2, "sample_mixture" -> 3,
    "sample_temperature" -> 3, "search_hybrid_rrf" -> 2,
    "shard_balance" -> 1, "sk_hll_rollup" -> 1, "skew_census" -> 2,
    "split_time_folds" -> 1, "text_bm25_search" -> 1,
    "text_cluster_topics" -> 1, "text_quality_adaptive" -> 1,
    "text_tfidf_topterms" -> 1, "text_unigram_nll" -> 1,
    "ts_similar_windows" -> 1, "w3_sma_segmented" -> 2,
    "w4_ema_segmented" -> 2)
}
