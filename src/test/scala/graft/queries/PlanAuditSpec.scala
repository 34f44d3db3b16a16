package graft.queries

import graft.{SparkEntry, SparkTestSession}
import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
import org.apache.spark.sql.execution.joins.{BroadcastHashJoinExec, CartesianProductExec}
import org.scalatest.funsuite.AnyFunSuite

/** Structural audit of the scale-critical physical plans — the shapes
  * past verdicts had to check by hand, pinned as tests so a regression
  * fails loudly:
  *
  *  - q89/q40 (IVF): no FORCED broadcast of un-aggregated scan data.
  *    The r7 scale-killer was an explicit `broadcast()` hint on an
  *    O(N) query side — a hint overrides size statistics, so it stays
  *    a broadcast at any scale. Every broadcast HINT in the plan must
  *    sit on driver-local data (the k-row codebook) or above an
  *    aggregation (radii / the per-query kb bound). Stats-driven
  *    broadcasts are NOT flagged: the optimizer choosing to broadcast
  *    a side that happens to be small at this sf is exactly the
  *    size-adaptive behavior we want, and it disappears at scale.
  *  - q39/q85 (embedding near-dup): no cartesian product node; the
  *    pair join must go through the cluster-pair blocking.
  *  - q04 (star join): the dimension legs actually broadcast.
  *  - q02 (scan): predicates reach the parquet scan (PushedFilters).
  *
  * AQE is disabled for the audit session so the STATIC plan is
  * inspected — runtime re-planning can only narrow these choices
  * (e.g. swap a shuffle join to broadcast when a side is small).
  */
class PlanAuditSpec extends AnyFunSuite {

  private val sfDir = "/root/testdata/sf0.001"

  private lazy val spark = {
    val s = SparkTestSession.spark.newSession()
    s.conf.set("spark.sql.adaptive.enabled", "false")
    s.conf.set("spark.sql.shuffle.partitions", "4")
    s
  }

  private def plan(name: String): SparkPlan =
    SparkEntry.queries(name)(spark, sfDir).queryExecution.executedPlan

  /** A broadcast-HINTED side is scale-safe when nothing corpus-sized
    * can flow into it: either it reads no stored relation at all
    * (driver-local codebook), or an aggregation sits between the scan
    * and the join (k-row radii, one-row-per-query bounds). */
  private def hintedSideSafe(
      side: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): Boolean = {
    import org.apache.spark.sql.catalyst.plans.logical.Aggregate
    import org.apache.spark.sql.execution.datasources.LogicalRelation
    val scans = side.collect { case l: LogicalRelation => l }
    val aggs = side.collect { case a: Aggregate => a }
    scans.isEmpty || aggs.nonEmpty
  }

  test("q89/q40 IVF plans force no broadcast of un-aggregated scan data") {
    import org.apache.spark.sql.catalyst.plans.logical.{BROADCAST, Join}
    for (q <- Seq("q89_knn_classify", "q40_ann_ivf")) {
      val lp = SparkEntry.queries(q)(spark, sfDir)
        .queryExecution.optimizedPlan
      val hintedJoins = lp.collect { case j: Join => j }
      val bad = hintedJoins.flatMap { j =>
        Seq(j.hint.leftHint -> j.left, j.hint.rightHint -> j.right).collect {
          case (Some(h), side)
              if h.strategy.contains(BROADCAST) && !hintedSideSafe(side) =>
            side
        }
      }
      assert(bad.isEmpty,
        s"$q: forced broadcast of un-aggregated scan data:\n${bad.mkString("\n")}")
      // and the hints we DO rely on are present (codebook + radii legs)
      assert(hintedJoins.exists(j =>
        j.hint.leftHint.exists(_.strategy.contains(BROADCAST)) ||
          j.hint.rightHint.exists(_.strategy.contains(BROADCAST))),
        s"$q: expected the codebook broadcast hints in the plan")
    }
  }

  test("q39/q85 embedding near-dup plans contain no cartesian product") {
    for (q <- Seq("q39_embed_neardup", "q85_semantic_dedup")) {
      // q85's final one-row summary legitimately cross-joins two
      // single-row aggregates; a cartesian is only a scale bug when a
      // FILE SCAN feeds it un-aggregated
      val bad = plan(q).collect {
        case c: CartesianProductExec
            if c.collect { case f: FileSourceScanExec => f }.nonEmpty &&
              c.collect { case a: BaseAggregateExec => a }.isEmpty => c
      }
      assert(bad.isEmpty, s"$q: raw cartesian product in plan")
    }
  }

  test("q04 star join broadcasts its dimension legs") {
    val joins = plan("q04_region_revenue").collect {
      case j: BroadcastHashJoinExec => j
    }
    assert(joins.size >= 3,
      s"expected the region/nation/customer/orders star to broadcast, " +
        s"got ${joins.size} broadcast hash joins")
  }

  test("shuffle budgets: headline plans grow no extra exchanges") {
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    // ceilings measured from the r9 plans (AQE off). Every groupBy /
    // join / distinct / orderBy is an exchange; if a restructure adds
    // one, this fails and the diff must justify the new shuffle. The
    // single-digit numbers ARE the scale story: e.g. q01 is exactly
    // partial-agg exchange + result sort; q35's 10 span the whole
    // composed pipeline (dup-collapse, ONE bucket-keyed LSH posting
    // shuffle, gram join-back verify, member expansion, result sort).
    // q104's single exchange is the result sort (the scrub itself is
    // shuffle-free, PiiScrubSpec); q105 = cluster∘quality join + argmax
    // agg + sort on top of the checkpointed CC labels; q106 = the
    // (label, dim) partial-sum pair + per-label count + result sort.
    val budgets = Map(
      "q01_pricing_summary" -> 2,
      "q04_region_revenue" -> 2,
      "q30_dedup_exact" -> 2,
      "q31_ngram_jaccard" -> 4,
      "q35_minhash_lsh" -> 10,
      "q63_sequence_packing" -> 5,
      "q77_dedup_prune" -> 5,
      "q79_prefix_jaccard" -> 6,
      "q87_span_dedup" -> 4,
      "q91_containment_dup" -> 4,
      "q104_pii_redact" -> 1,
      // q337 = tiny truncate-set agg (broadcast build side) + final
      // event_type agg + result sort; the survivors join is broadcast,
      // so the big insert leg never shuffles before its partial agg
      "q337_truncate_replay" -> 3,
      // q338 = one (prefix, content) partial+final agg + result sort
      // over the op=MESSAGE filter — the envelope scan never shuffles
      "q338_logical_messages" -> 2,
      "q105_quality_dedup" -> 4,
      "q106_embed_diversity" -> 4,
      // q109 = the q31 posting shape exactly (fingerprinting itself is
      // row-local): wide fan-out + posting agg + pair agg + result
      // sort; q110 = one label-keyed partial+final agg + result sort —
      // the quantization math never shuffles.
      "q109_winnow_dup" -> 4,
      "q110_embed_quantize" -> 2,
      // q111 = token first-seen agg pair + doc join + the two-level
      // prefix-sum (bucket window + 32-row offset window) + result
      // sort — NO single-partition pass over the docs; q112 = two
      // heap-combine top-k aggs (exact + quantized legs) + the 50-row
      // recall join/agg + result sort.
      "q111_vocab_growth" -> 6,
      "q112_quantized_recall" -> 6,
      // q113 = the posting shuffle + per-doc weight-total agg + pair
      // agg + the doc-keyed totals join + result sort — df, weights,
      // and candidates all fall out of ONE gram-keyed exchange.
      "q113_weighted_jaccard" -> 5,
      // q114 = candidate pair agg + per-doc argmax + result sort,
      // plus the two stats-gated wide() fan-outs (corpus and bench
      // legs; no-ops on a lake-scale scan) — the benchmark probe
      // itself is a broadcast join, exchange-free on the corpus leg.
      "q114_fuzzy_decontam" -> 5,
      // q115 = lang-count agg pair (partial+final feeding quotas) +
      // the per-lang rank window + final agg + result sort; the quota
      // table rides back on broadcasts.
      "q115_temperature_mix" -> 5,
      // q116 = (label,dim) centroid agg + per-class array collect +
      // per-vec argmin-other agg + own/other join + top-5 window +
      // result sort; the full distance matrix itself is a row-local
      // decimal fold against broadcast centroid arrays (no exploded
      // distance shuffle).
      "q116_embed_outliers" -> 6,
      // q117 = wide() fan-out + token count agg + the top-20
      // TakeOrdered (per-partition heap, no global sort); totals ride
      // a 1-row broadcast.
      "q117_token_drift" -> 3,
      // q118 = the sample TakeOrdered + kb/probe top-k aggs + bucket
      // agg + result sort over the shared ivfTopK path (whose
      // no-forced-broadcast shape is audited via q89/q40).
      "q118_nn_cosine_hist" -> 4,
      // q119 = two wide() fan-outs (unigram + bigram legs) + the
      // uf/bf/cf count aggs + the TYPE-sized LM-consolidation join
      // exchanges + ONE instance-sized bigram join + doc agg + sort.
      // Only that one exchange is corpus-scaled; the rest carry LM
      // tables (types ≪ instances, broadcast at lake scale).
      "q119_bigram_logprob" -> 9,
      // q120 = the q77 prune pipeline (prefix postings + verify +
      // checkpoint-truncated CC) feeding a doc-keyed drop join +
      // O(buckets) agg + result sort; quality/bucket are row-local.
      "q120_dedup_quality_report" -> 6,
      // q121 = two wide() fan-outs (count leg + gram leg over the
      // shared shingle scan) + the gram count agg + the top-20
      // TakeOrdered heap; the doc total rides a 1-row broadcast.
      "q121_boilerplate_grams" -> 4,
      // q122 = the result sort ONLY — the projection is one row-local
      // nested decimal fold, no joins, no aggregates.
      "q122_jl_projection" -> 1,
      // q123 = wide() fan-out + the ONE instance-sized word-freq agg +
      // three type-sized pair aggs (one per merge iteration; the
      // argmaxes are 1-row TakeOrdered broadcasts) + result sort.
      "q123_bpe_merges" -> 6,
      // q125 = the 1-row bounds agg + tile agg + result sort; the
      // interleave itself is a row-local codegen kernel.
      "q125_zorder_layout" -> 3,
      // q126 = bucket-user distinct + per-bucket set agg + edge
      // distinct + degree agg + the O(nodes) adjacency agg + the two
      // edge⋈adjacency joins feeding the row-local sorted_overlap
      // count; one MORE exchange than the old wedge plan but an order
      // of magnitude less exchange VOLUME (adjacency rows, never the
      // Σd⁺² wedge set — 4.7 → 2.9 s at sf0.1). Count legs ride 1-row
      // broadcasts.
      "q126_triangle_count" -> 7,
      // q127 = the type-sized bigram agg (top phrase, 1-row broadcast)
      // + the two index-seek legs' adjacency join + per-doc agg +
      // top-20 TakeOrdered.
      "q127_phrase_search" -> 4,
      // q128 = q90's freq/total aggs + doc-NLL agg + the lang join +
      // per-lang ntile window + final agg/sort.
      "q128_ccnet_buckets" -> 5,
      // q129 = the 16-row codebook TakeOrdered + the two top-5 window
      // legs (ADC + exact, each over a 10-row broadcast against the
      // corpus) + recall join/agg + result sort; encode and both
      // distance computations are row-local decimal folds.
      "q129_pq_recall" -> 6,
      // q130 = lang-count agg + the two 1-row scalar aggs (totals,
      // min-factor) + the broadcast factor join + post-explode report
      // agg + result sort; the expansion itself is row-local.
      "q130_epoch_upsample" -> 6,
      // q131 = the full-outer join's two sides + status agg + result
      // sort; only md5 hashes cross the exchanges, never text.
      "q131_snapshot_diff" -> 4,
      // q133 = the (source, hash) distinct + the ONE bounded-heap
      // sketch agg + the exact-baseline gram join/agg legs + result
      // sort; the 190-pair estimate matrix itself is row-local on the
      // tiny sketch relation.
      "q133_kmv_overlap" -> 8,
      // q134 = the (day, user) distinct + daily partial agg + the two
      // spine-join legs' aggs (merged union, direct exact+apx) +
      // result sort — every exchange after the distinct carries
      // day-sized or sketch-sized rows.
      "q134_sliding_distinct" -> 8,
      // q135 = three stage min-aggs + the two user-keyed stage joins +
      // result sort — the sequence match is agg→join chained, never a
      // per-user ordered scan.
      "q135_funnel" -> 6,
      // q136 = (day, user) distinct + cohort min-agg + the user join +
      // matrix agg/sort — all user- or cohort-keyed.
      "q136_cohort_retention" -> 4,
      // q137 = bucket distinct/set-agg/edge distinct + degree agg +
      // the per-iteration dst-keyed rank aggs (edge joins ride the
      // same keys) + TakeOrdered — the Pregel shape at 5 rounds.
      "q137_pagerank" -> 9,
      // q141 = ONE user-keyed exchange shared by both window passes
      // (lag change-detect + lead interval-close keep the same
      // partitioning) + the result range sort.
      "q141_scd2_intervals" -> 2,
      // q142 = the full-outer diff join's two sides + the anti-join /
      // union legs + result sort — every exchange doc_id-keyed and
      // hash-width (the text never ships).
      "q142_cdc_invert" -> 6,
      // q143 = the ONE user-keyed exchange shared by all three window
      // passes + the transition agg + the O(types) totals agg +
      // result sort; totals ride back on a broadcast.
      "q143_markov_transitions" -> 4,
      // q144 = the line-keyed df agg (distinct-doc Expand pair) + the
      // doc-keyed reassembly agg + result sort; the boilerplate list
      // is BROADCAST back, so flagging adds no exchange.
      "q144_line_dedup" -> 4,
      // q146 = the two dim-keyed aggs (median pass + MAD pass, the
      // 64-row median table broadcast back) + the 64-row final join +
      // result sort.
      "q146_dim_robust_stats" -> 4,
      // q147 = the two type-sized aggs (bigram, unigram) + the
      // TakeOrdered tail; the totals ride a 1-row broadcast and the
      // unigram legs carry NO broadcast hint (vocabulary grows with
      // the corpus) — at this sf the optimizer still picks broadcast
      // from size stats, which is exactly the adaptive behavior we
      // want. The 5th exchange is the wide() fan-out pair.
      "q147_pmi_collocations" -> 5,
      // q148 = wide() fan-out + the ONE instance-sized word-freq agg +
      // three type-sized pair aggs (q123's learner, shared loop) + the
      // token-count agg + TakeOrdered — everything after the word agg
      // is vocabulary-sized.
      "q148_bpe_tokenize" -> 7,
      // q149 = the mean agg + MAD agg (both broadcast back) + the ONE
      // type-keyed window exchange (running sum + running min share
      // it) + final agg + result sort.
      "q149_cusum_drift" -> 5,
      // q150 = the vec_id-keyed resolve join's two sides + the
      // O(labels) report agg; the corpus count rides a 1-row
      // broadcast and sampling is row-local.
      "q150_negative_sampling" -> 3,
      // q151 = the view pre-dedup agg + the ONE AsOfJoin key-keyed
      // exchange (union rides inside it) + the per-user report agg;
      // no range-predicate pair join anywhere.
      "q151_last_touch_attribution" -> 3,
      // q152 = the key agg + TakeOrdered; the 1-row stats ride a
      // broadcast.
      "q152_key_skew_audit" -> 2,
      // q153 = q141's shared user-keyed interval exchange + the
      // O(states) dwell agg + result sort.
      "q153_state_dwell" -> 3,
      // q154 = the user-keyed running-max window exchange + the
      // O(types) report agg + result sort; the arrival jitter is
      // row-local.
      "q154_late_data_audit" -> 3,
      // q157 = the (user, type)-keyed session windows + interval agg
      // exchange + the type-keyed sweep window + the peak/first aggs
      // (5-row broadcasts) + result sort.
      "q157_peak_concurrency" -> 4,
      // q158 = the 1-row bounds agg + the 16-row tile agg + the exact
      // predicate-count agg + the 1-row report agg; probe and tile
      // stats ride broadcasts — the pruning decision itself scans no
      // corpus rows.
      "q158_zorder_skip_audit" -> 4,
      // q159 = the orders⋈customer key join (one side may broadcast
      // by stats) + quasi-id agg + per-nation rollup + result sort.
      "q159_k_anonymity" -> 3,
      // q160 = the order-keyed line agg exchange + result sort; the
      // orders⋈ag join rides the same order key (broadcast by stats
      // at this sf, key-keyed co-partitioned exchange at scale —
      // budget leaves room for the flip).
      "q160_doc_assembly" -> 3,
      // q161 = the (etype,day,hr) manifest agg + the (etype,day)
      // window exchange + result sort; both downstream groupBys reuse
      // the window's (etype,day) partitioning (subset key).
      "q161_compaction_plan" -> 3,
      // q162 = the heavy-count agg + final agg + result sort (3 at
      // this sf: the dim side broadcasts by stats); at scale the main
      // join shuffles both sides on (key, salt) — budget covers that
      // flip (+2). The heavy list's broadcast HINT sits above an
      // aggregation, so the hint audit already proves it scale-safe.
      "q162_salted_join" -> 5,
      // q163 = the two feature-series window exchanges (each leg's
      // running cum over its own filtered scan) + the shared user-
      // keyed as-of exchange the two chained AsOfJoins and their
      // (k,t) dedup aggs all reuse + result sort. Never a time-range
      // pair join.
      "q163_pit_features" -> 4,
      // q164 = the visible tail past the per-round localCheckpoints:
      // pop distinct + the pop⋈dist key join + the O(hops) report agg
      // / sort. Each checkpointed BFS round paid one edge join + one
      // min-agg exchange of frontier size (bounded lineage, q69's
      // pattern).
      "q164_bfs_reach" -> 3,
      // q165 = the (etype, arm) moment agg + the O(types) pivot agg +
      // result sort; everything after the first agg is ≤ 2·types rows.
      "q165_abtest" -> 3,
      // q166 = the per-user RFM agg + ONE SinglePartition exchange
      // both quintile windows and everything after share (input is
      // O(users) post-agg rows; at 1e8 users the exact ntile swaps for
      // broadcast QuantileLake cutoffs, same downstream plan).
      "q166_rfm_segments" -> 2,
      // q167 = the (user, day) LOCF window exchange + the day agg
      // (countDistinct adds its partial leg) + result sort.
      "q167_time_weighted_avg" -> 3,
      // q168 = the (user, day) dedup agg + the user window exchange
      // (streak grouping and the per-user rollup reuse it) + the
      // O(bins) histogram agg + result sort.
      "q168_streaks" -> 4,
      // q169 = the lang demand agg (the ONLY corpus-sized exchange) +
      // the O(groups) SinglePartition window + the waterline-row join
      // legs + result sort; tot/cv ride broadcasts above aggregations.
      "q169_fair_share" -> 4,
      // q170 = the checkpointed (lang, source) contingency agg + the
      // two margin aggs + the grid⋈counts join + the countDistinct
      // final agg — everything past the first agg is O(r·c) rows.
      "q170_chi2_independence" -> 5,
      // q171 = the doc_id label⋈prediction join + the (label, pred)
      // agg + the per-label window + result sort — everything past
      // the join is O(langs²) rows.
      "q171_langid_confusion" -> 4,
      // q172 = ONE checkpointed per-key agg; the stats legs (1-row
      // aggs, 2-row MCV heap) are metadata-sized and exchange-free.
      "q172_cbo_estimate_audit" -> 1,
      // q173 = the (user, day) journey window + the path agg feeding
      // the TakeOrdered top-20 heap — no result sort exchange.
      "q173_path_mining" -> 2,
      // q174 = the (mime) agg with countDistinct's expand leg + result
      // sort; frame explosion and hex digests are row-local.
      "q174_frame_sample" -> 3,
      // q175 = the (etype, v) support agg + the etype window (margin
      // agg reuses its partitioning via the join) + the O(types)
      // rollup + result sort — the CDF itself never divides.
      "q175_ks_test" -> 4,
      // Late additions pinning the rest of the scale-critical set
      // (measured from the r9 plans, AQE off): q36 = sketch agg +
      // band-posting agg + sort; q39 = the visible tail past the
      // IVF checkpoints (cluster-pair blocking lives before them);
      // q50 = the full simhash near-dup composition; q69 = the
      // visible tail past the per-round CC localCheckpoints; q85 =
      // blocked pair join + verify + summary; q99 = the BATCH side of
      // the bucketed index screen (history side pre-bucketed — only
      // the batch shuffles) + verify; q107 = posting + pair aggs +
      // the per-source matrix rollup chain.
      "q36_simhash" -> 3,
      "q39_embed_neardup" -> 1,
      "q50_simhash_neardup" -> 9,
      "q69_dup_clusters" -> 2,
      "q85_semantic_dedup" -> 6,
      "q99_lsh_index_screen" -> 3,
      "q107_source_dup_matrix" -> 7,
      // q176 = the base-leg and delta-leg segment aggs (dimension
      // broadcasts by stats; co-partitioned key join at scale) + the
      // O(segments) merge agg / sort; the merge itself never touches
      // fact rows.
      "q176_incremental_join" -> 3,
      // q177 = the 256-row feature-stats agg + its 1-row totals agg +
      // the per-doc score agg + the top-k sort, all downstream of the
      // ONE checkpointed doc×bucket support table; the λ table rides
      // a broadcast into the corpus-sized scoring join.
      "q177_dsir_weights" -> 4,
      // q178 = the one corpus-sized (label, epoch, dim) centroid agg;
      // the other four exchanges (epoch self-join pair, per-label
      // stats, counts, sort) all live on O(labels·dims) rows.
      "q178_embed_epoch_drift" -> 5,
      // q179 = six stages each ending in a 1-row count agg (6 tiny
      // single-partition exchanges) + the exact-dedup hash agg and
      // its key join + the decontam gram distinct + the anti-join
      // pair + the 6-row funnel window; the near-dup pair join and CC
      // live behind their localCheckpoints (counted in q77/q105).
      "q179_curation_funnel" -> 14,
      // q180 = the doc_id score⋈source join + the per-source rank
      // window partitioning + the O(sources) moments agg / sort.
      "q180_quality_trend" -> 3,
      // q182 = q175's shape: the (etype, v) support agg + the etype
      // rank window exchange + the O(types) rollup agg + result sort.
      "q182_mannwhitney" -> 4,
      // q183 = past the two localCheckpoints (hv scan, f first-seen):
      // the (user, cohort, wk) distinct agg + the (cohort, wk) cell
      // agg + the O(days) cohort-size agg + the m⋈siz join legs +
      // result sort — everything after `act` is O(days·weeks) rows.
      "q183_cohort_retention" -> 5,
      // q184 = the block-keyed self-join (both legs shuffle on the
      // blocking key at scale; broadcast by stats at this sf) + the
      // per-block agg + result sort.
      "q184_record_linkage" -> 4,
      // q185 = the (source, token) frequency agg + the per-source rank
      // window exchange + the O(vocab) moment agg; slope math is
      // row-local on O(sources) rows.
      "q185_zipf_slope" -> 3,
      // q186 = the visible tail past the per-half-iteration
      // localCheckpoints (which are load-bearing: an unchecked HITS
      // lineage doubles per rescale branch — 378 exchanges measured):
      // the final max agg + the two top-k legs. Each checkpointed
      // round paid one edge join + one node agg exchange (bounded
      // lineage, q69/q164's pattern).
      "q186_hits" -> 3,
      // q187 = the per-user score agg + result sort; the horizon is a
      // 1-row broadcast agg and the decay shift is row-local.
      "q187_decayed_engagement" -> 3,
      // q189 = past the checkpointed (source, token) vocabulary: the
      // token-keyed self-join legs + the (sa, sb) pair agg + the
      // O(sources) size agg; the size join rides broadcasts at any
      // scale (post-agg O(sources) rows).
      "q189_source_similarity" -> 4,
      // q190 = past the checkpointed (source, token) support: the
      // O(vocab) corpus-marginal agg + its token-keyed join legs +
      // the source marginal/total aggs (broadcast above aggregation)
      // + the O(sources) KL rollup.
      "q190_unigram_kl" -> 6,
      // q191 = the (etype, replicate) resample agg (map-side combined
      // out of the 32× expansion) + the O(types) spread agg + the
      // full-sample agg + result sort; the replicate join is O(types).
      "q191_bootstrap_se" -> 4,
      // q192 = the visible tail past the checkpointed O(tests) ranked
      // family: the suffix-min window + result sort (the corpus-sized
      // (etype, hr, arm) moment agg and the family rank window paid
      // before the checkpoint; 0 measured, headroom for a scale flip).
      "q192_fdr_bh" -> 2,
      // q193 = past the checkpointed (doc_id, source, n_chars)
      // projection: the per-source rank window exchange + the
      // O(distinct) support agg + its single-partition cum window
      // (post-agg, the q166 note) + the O(sources)/1-row size aggs;
      // the pooled lookup rides a broadcast above aggregation.
      "q193_quantile_normalize" -> 6,
      // q194 = the visible tail past the checkpointed O(types·hours)
      // centered series: the lag-join num agg + result sort (the
      // corpus-sized (etype, hour) count, the spine join, and the
      // bounds/sum aggs are paid before the checkpoint; den and both
      // self-join legs ride broadcasts above it).
      "q194_hourly_acf" -> 2,
      // q195 = the corpus-sized (lang, pred) cell agg feeding the
      // checkpoint + the O(classes) rm/cm marginal aggs + their join;
      // everything downstream is 1-row crossJoin broadcasts.
      "q195_langid_kappa" -> 4,
      // q196 = the corpus-sized (lang, source) char sum + the lang-
      // partitioned rank window exchange + the O(langs) Lorenz agg;
      // all post-agg rows from the first exchange on.
      "q196_source_concentration" -> 3,
      // q197 = the observed (etype, arm) agg + the (etype, perm) agg
      // (map-side combined out of the 64× expansion) + the O(types·64)
      // count agg + result sort; obs/cnt ride broadcasts.
      "q197_permutation_test" -> 4,
      // q198 = past the checkpointed O(users) lifetime table: the
      // horizon agg + the duration-support agg + its total + the two
      // single-partition cumulative windows + result sort — all on
      // O(users) → O(distinct durations) rows; the corpus is scanned
      // exactly once by the per-user agg before the checkpoint.
      "q198_kaplan_meier" -> 6,
      // q199 = the corpus-sized (source, token) count + the O(sources)
      // richness agg + result sort.
      "q199_chao1_richness" -> 3,
      // q200 = the corpus-sized (etype, digit) count + the O(types)
      // total agg + the O(types·9) chi² window + result sort; the
      // digit spine joins broadcast.
      "q200_benford_audit" -> 4,
      // q201 = every exchange past the checkpointed O(langs·sources)
      // cell table: the two marginal aggs + the total + the three
      // quantized-ln sum aggs and their single-partition finals —
      // all on cell/marginal-sized rows; the corpus is touched once
      // by the cell count before the checkpoint.
      "q201_lang_source_mi" -> 11,
      // q202 = the corpus-sized per-stratum moment agg + the visible
      // tail past the checkpointed O(strata) base table (total agg +
      // remainder rank + sort fold in).
      "q202_neyman_allocation" -> 2,
      // q203 = past the checkpointed (etype, value) support: the
      // type-partitioned cum window + the kk moment agg + the kept
      // agg + the two boundary probes' window reuse + result sort —
      // all on support-sized rows; the corpus is touched once by the
      // support count before the checkpoint.
      "q203_trimmed_winsor_mean" -> 7,
      // q204 = past the checkpointed (source, w1, w2) bigram-type
      // table: the c1 rollup + n2 + the two quantized-ln sum aggs +
      // result sort; the corpus-sized bigram explode pays exactly one
      // exchange before the checkpoint.
      "q204_bigram_entropy_rate" -> 7,
      // q206 = past the checkpointed (source, value) support: the
      // pooled support agg + its single-partition CDF window + the
      // total/size aggs + the source-PARTITIONED grid windows + the
      // term agg + result sort — all on O(sources·|support|) rows;
      // the corpus pays exactly one exchange before the checkpoint.
      "q206_wasserstein_drift" -> 8,
      // q207 = past the checkpointed (vec, dim) quantized stream: the
      // per-dimension moment agg + the distinct-count size agg and
      // their single-partition finals — O(dim) rows after the first
      // exchange.
      "q207_embedding_isotropy" -> 4,
      // q208 = past the checkpointed (source, x, y) projection: two
      // support aggs + their source-partitioned cum windows + the two
      // rank joins + the O(sources) moment agg + result sort — the
      // corpus is scored once before the checkpoint.
      "q208_quality_length_spearman" -> 10,
      // q209 = past the checkpointed keyed table: the 256-bucket
      // window scan + its global agg + the O(buckets) seam window +
      // the source counts + the two 1-row totals — no global sort of
      // N rows anywhere.
      "q209_shuffle_runs_test" -> 8,
      // q210 = the visible tail past the two checkpointed pair sets:
      // the three counts and the (doc1, doc2) intersection join — the
      // two sketch pipelines pay their own audited exchanges before
      // the checkpoints.
      "q210_dedup_recall_capture" -> 5,
      // q211 = the visible tail past the checkpointed centered
      // series: the lag-join pair agg + its sort fold in via AQE;
      // the corpus-sized hourly count and spine join pay before the
      // checkpoint, den/st ride broadcasts.
      "q211_crosscorr_leadlag" -> 1,
      // q212 = the visible tail past the checkpointed hour-of-day
      // projection (the grp/tot moment aggs coalesce over the tiny
      // checkpoint partitions); the hourly count pays before it.
      "q212_seasonality_strength" -> 1,
      // q213 = the corpus-sized (etype, hour) count + the spine join
      // + the type-partitioned cumulative/rank windows sharing one
      // exchange with the tot agg's reuse — all O(types·hours) past
      // the first exchange.
      "q213_changepoint_fit" -> 3,
      // q214 = the corpus-sized per-user agg before the checkpoint +
      // the visible O(users) tail: the θ moment agg and the per-arm
      // aggregate — 1-row legs ride broadcasts.
      "q214_cuped_adjustment" -> 3,
      // q215 = past the checkpointed pair set: the (src1, src2)
      // matrix agg + result sort. The doc→source lookups carry NO
      // hint (the r10 version force-broadcast the corpus side —
      // 100×-unsafe): here the stats-driven planner broadcasts them
      // (size-based, disappears at scale); at lake scale they become
      // shuffle joins or AQE broadcasts of the post-dedup pair side.
      "q215_crosssource_dups" -> 2,
      // q216 = the fold-size agg + its total + the O(pairs) count —
      // folds are re-derived per pair (pure md5 function of doc_id),
      // so NO fold-map join or broadcast exists in the plan at all.
      "q216_fold_leakage" -> 3,
      // q217 = ONE corpus exchange (the (source, value, epoch)
      // support, checkpointed) + a tail of support/cell-sized aggs,
      // windows, grids, and finals — 15 exchanges over O(distinct
      // values)+O(sources·bins) rows (bin checkpointed so its window
      // subtree is not re-expanded per consumer).
      "q217_psi_drift" -> 16,
      // q218 = the corpus-sized (etype, arm) moment agg + result
      // sort; everything else is per-row arithmetic on O(types) rows.
      "q218_power_planning" -> 2,
      // q219 = the corpus-sized hourly count + the spine join + the
      // O(types) moment agg with its sort folded in.
      "q219_fano_burstiness" -> 3,
      // q221 = the corpus-sized (user, type) distinct before the
      // checkpoint + the visible tail: the user-keyed self-join +
      // the O(types²) matrix agg + result sort; sizes broadcast.
      "q221_audience_overlap" -> 4,
      // q222 = the corpus-sized (user, type) cell agg before the
      // checkpoint + the O(users) per-user entropy agg + the O(k)
      // profile agg with its sort.
      "q222_user_entropy_profile" -> 3,
      // q223 = the (type, day)-partitioned lag window exchange + the
      // O(types) moment agg + result sort — no per-type serial scan.
      "q223_interarrival_cv2" -> 3,
      // q224 = two passes over the checkpointed quantized-ln column
      // (mean agg + centered-moment agg), both single-partition
      // finals over O(1) groups.
      "q224_loglength_moments" -> 2,
      // q225 = the corpus-sized token explode into the checkpoint +
      // the bucket totals, first-bucket rollup, and the two 10-row
      // cumulations + the 1-row fit.
      "q225_heaps_exponent" -> 4,
      // distinct + part-degree agg + pair-join agg + final agg
      // (TakeOrdered for the top-50 — no global sort exchange)
      "q226_ra_link_prediction" -> 4,
      // post-checkpoint legs only: edge degrees, perNode's orientation
      // degree + corner fold, the final deg⋈tri; the oriented edge
      // list and adjacency arrays are lineage-truncated in perNode
      "q227_local_clustering" -> 6,
      // one rank window per language + the output sort
      "q228_weighted_sample" -> 2,
      // QI-class agg + language agg + output sort
      "q229_k_anonymity" -> 3,
      // the multi-distinct expand agg (2-phase) — stack is map-side
      "q230_table_profile" -> 2,
      // two exact-percentile aggs + their re-join legs
      "q231_mad_outliers" -> 4,
      // daily integer fold + the slope-pair join + per-type median
      "q232_theilsen_slope" -> 3,
      // the per-language rank/sum window + grouped fold
      "q233_length_gini" -> 2,
      // per-user fold + the three ntile windows (one exchange to a
      // single partition — the q103 quantile-lake swap at scale) +
      // cell census
      "q234_rfm_cells" -> 3,
      // per-user sequence window + transition fold + row totals +
      // output sort
      "q235_markov_transitions" -> 4,
      // band-bucket candidate self-join + distinct + pair fold
      "q236_frame_phash_neardup" -> 3,
      // panel-bound (r14): the 500-query panel legs BROADCAST (panel
      // and its blk-exploded copies are O(panel·blocks) rows at any
      // corpus — broadcastable by construction, not just by stats),
      // so the corpus side never exchanges for the join; what remains
      // is the heap top-k final agg + result sort. Shuffle volume is
      // O(panel) heap partials — linear-corpus exact probe.
      "q237_hard_negatives" -> 2,
      // ε-pair blocking (checkpointed) + neighbor-count agg + core
      // joins + CC (internally checkpointed) + border fold
      "q238_dbscan" -> 9,
      // margin/label support agg + the O(distinct margins) cumulative
      // window (single partition, post-agg) + the 1-row rank-sum fold
      "q239_langid_auc" -> 3,
      // one user-partitioned lead window + the train and test O(types)
      // aggs off the checkpoint + the left join + output sort
      "q240_seq_calibration" -> 3,
      // three user-keyed stage legs (agg → join → agg, checkpointed) +
      // the four 1-row report aggs riding broadcasts
      "q241_windowed_funnel" -> 4,
      // the source-partitioned rank window into the checkpoint + the
      // per-source k agg + the x_(k+1) probe and top-k sum joins +
      // output sort
      "q242_hill_tail" -> 1,
      // the per-source moment agg + the 1-row fold
      "q243_anova_f" -> 2,
      // past the checkpointed cell/support tables: the per-source
      // rank-sum agg + the 1-row fold (the broadcast denominator
      // rides free)
      "q244_kruskal_wallis" -> 2,
      // the user-keyed score agg + the support-table agg; the curve
      // window and the 1-row total ride the checkpointed support
      "q245_gains_curve" -> 2,
      // all six run past the checkpointed O(cells) table: the cell²
      // fold, the two marginal agg pairs, and the 1-row count —
      // every exchange moves domain-bounded rows, never users
      "q246_kendall_tau" -> 6,
      // degree union-agg + the two user-keyed degree hops + the
      // 1-row moment fold over the checkpointed edge list
      "q247_assortativity" -> 5,
      // the scored pool is TakeOrdered (no exchange) and checkpointed;
      // the greedy walk runs on 20-row broadcast frames
      "q248_mmr_rerank" -> 0,
      // centroid explode agg (map-side combined to labels×dims) +
      // the two tiny assembly aggs + the O(labels) report agg; the
      // distance pass itself is exchange-free map-side array algebra
      "q249_silhouette" -> 5,
      // both retriever lists are TakeOrdered off the scored scan and
      // the fusion runs on checkpointed ≤30-row frames — no exchange
      "q250_rrf_fusion" -> 0,
      // one qid-keyed rank exchange per leg (dcg + idcg re-derive the
      // scored scan) + the tiny qid join of the two 10-row reports
      "q251_ndcg" -> 3,
      // the qid-keyed rank window + the qid groupBy over its output
      "q252_mrr" -> 2,
      // per-round Pregel shuffles hide behind localCheckpoint; the
      // visible plan is the community groupBy + the report sort
      "q253_label_propagation" -> 2,
      // the centroid explode agg (map-side combined) + the scatter
      // label agg; pairs/ratios ride broadcasts off checkpoints
      "q254_davies_bouldin" -> 2,
      // the ≤20-row depth/weight groupBy + the cumulative window
      "q255_rbo" -> 2,
      // both qid rank windows share one exchange + the qid groupBy
      "q256_matryoshka_recall" -> 2,
      // two 9-group map-side-combined aggs + the report sort; shard
      // assignment itself is exchange-free row algebra
      "q257_shard_rebalance" -> 3,
      // basket-keyed pair/triple joins + their type-sized counts off
      // the checkpointed basket table; rule assembly rides broadcasts
      "q258_assoc_rules" -> 6,
      // the user-keyed feature agg is the only corpus shuffle; the
      // support agg + 1-row total + two tiny windows are domain-sized
      "q259_decision_stump" -> 5,
      // the (user, bucket) banded interval join + the pid credit agg;
      // both channel reports run off the checkpointed credit table
      "q260_attribution" -> 3,
      // the (etype, hour) count agg + the spine join + the lag window
      // share the etype key; report agg is O(types)
      "q261_mase_forecast" -> 3,
      // the user-keyed lead window (train + test share it via the
      // checkpoint) + the O(bins) agg
      "q262_ece" -> 2,
      // the one corpus-sized QI groupBy + the 1-row total + the per-k
      // report agg over O(groups) rows
      "q263_k_anonymity" -> 3,
      // 7 independent edge audits: each pays its two 1-row count
      // folds (the lineitem->orders anti join is the only keyed one;
      // dimension parents broadcast)
      "q264_fk_integrity" -> 14,
      // wedge-join corners + degree agg + node-keyed lcc fold; the
      // histogram/mean run off the checkpointed O(nodes) table
      "q265_lcc_histogram" -> 3,
      // the (x, y) agg + per-x argmax (same key side) + the support
      // window; the dominance filter is row-local
      "q266_pareto_skyline" -> 3,
      // the pool is TakeOrdered off a row-local bigram projection and
      // checkpointed; every greedy round runs on broadcast frames
      "q267_max_coverage" -> 0,
      // off the checkpointed (user, day) cells: day agg + the 7×
      // window explode's distinct + window agg + the tiny day join
      "q268_dau_wau" -> 5,
      // the (user, bucket) banded interval join feeds one pid mask
      // agg; the 16-row game algebra rides broadcasts
      "q269_shapley_attribution" -> 2,
      // the (column, value) distinct + its value-keyed self-join +
      // cardinality agg + report sort; card tables ride broadcasts
      "q270_joinkey_discovery" -> 4,
      // 9 independent FD checks × (per-determinant groupBy + 1-row
      // fold) off each check's checkpointed (A, B) domain
      "q271_fd_audit" -> 18,
      // visible post-checkpoint plan: per-round dst aggs + teleport
      // joins (4 rounds) off the O(nodes) teleport table; the edge
      // derivation hides behind coocEdges' audited shape
      "q272_personalized_pagerank" -> 7,
      // one qid-keyed rank exchange; the vote table is checkpointed
      // and the margin/pick algebra runs on panel-sized frames
      "q274_uncertainty_sampling" -> 1,
      // trigram-keyed df agg + source totals + the type-sized left
      // join + report sort, all off the checkpointed domain table
      "q275_source_contribution" -> 4,
      // q170's shape: the two margin aggs + 1-row total + the grid
      // join + the final fold, all off the checkpointed contingency
      // table (the corpus is scanned once)
      "q276_g_test" -> 5,
      // q277 = the 1-row horizon agg (broadcast back) + the ONE
      // (user, valid_day)-keyed conditional-argmax agg (both cutoff
      // beliefs in a single shuffle) + the O(days) report agg + sort
      "q277_bitemporal_asof" -> 4,
      // q278 = every exchange is TYPE-sized (word-vocabulary rows):
      // the corpus is scanned once into the checkpointed (lang, w)
      // table; the 3 unrolled merge-learning rounds re-embed their
      // predecessors' pair aggs in the static plan (1+2+3 pair aggs +
      // a global-freq agg per round) and the per-lang apply tail adds
      // the fertility agg + sort — 16 exchanges, none corpus-sized
      "q278_tokenizer_fertility" -> 16,
      // q279 = the audited tail is the 9-row driver-built dendrogram
      // (1 sort); the corpus-sized work — the (label, dim) partial-sum
      // agg — executes inside the bounded collect at plan-build time
      // and is shaped identically to q116's audited centroid agg
      "q279_label_dendrogram" -> 1,
      // q280 = past the checkpointed dense series: the per-type
      // array/param agg; the island windows and count join ride the
      // same etype partitioning and the report is O(bursts)
      "q280_kleinberg_bursts" -> 1,
      // q281 = the corpus-sized lead window and the O(bins) cumulative
      // table are both checkpointed at build; the audited tail (the
      // O(B²) minimax grid + report) runs on ≤50-row frames whose
      // joins all broadcast — zero exchanges
      "q281_isotonic_calibration" -> 0,
      // q282 = past the checkpointed (etype, day) cell table: the
      // day/type/total margin aggs, the leave-one-out grid joins, and
      // the final report agg + sort — 8 exchanges over O(types·days)
      // rows; the corpus pays only the cell agg at checkpoint time
      "q282_jackknife_se" -> 8,
      // q283 = past the checkpointed O(panel) nn1 table (the panel
      // blockTopK runs at build; panel-bound since r14): the second
      // exact pass's heap final agg + the counterpart distinct + the
      // un-hinted label joins + result sort — nn1-sized legs
      // broadcast by stats at this sf and shuffle at scale
      "q283_mutual_nn" -> 3,
      // q285 = past the checkpointed O(users) lifetime table: q198's
      // exact exchange profile (horizon agg + duration support agg +
      // total + the single-partition support windows + result sort)
      "q285_nelson_aalen" -> 6,
      // q286 = ONE corpus-sized (day, item) count agg feeding the
      // checkpointed O(days·k) top-k table; sizes, intersection, and
      // the report all ride broadcasts off it + result sort
      "q286_topk_churn" -> 1,
      // q287 = past the checkpointed (etype, v) support: the etype
      // margin agg + the support window + the O(types·9) quantile agg
      // — q175's profile plus the decile grid (broadcast)
      "q287_quantile_effect" -> 3,
      // q288 = the user-keyed lag window + distinct-user/base agg
      // pair + the 4-threshold conditional-sum agg + result sort —
      // the sweep never re-sessionizes per threshold
      "q288_session_sweep" -> 5,
      // q289 = ONE corpus-sized (item) agg at checkpoint; the prior
      // agg + report sort run on the O(items) table
      "q289_rate_shrinkage" -> 2,
      // q290 = past the checkpointed O(types·days) daily table: the
      // pair-fold agg (the pair join itself broadcasts the aggregated
      // daily side), the n and tie aggs (2) + result sort — every
      // exchange calendar-, not corpus-, sized
      "q290_mann_kendall" -> 5,
      // q291 = past the checkpointed O(users) lifetime and O(durations)
      // support tables: the totals agg, the single-partition risk-set
      // window, and the final term agg — q198's profile minus the
      // result sort (one summary row)
      "q291_logrank_test" -> 3,
      // q292 = the (source, token) agg + the frequency-of-frequencies
      // agg + the O(sources) margin agg + result sort; only the first
      // is corpus-sized
      "q292_good_turing" -> 4,
      // q293 = past the checkpointed O(sources·lengths) cell table:
      // the grid distinct, the margin agg, the per-source cumulative
      // window, the pair-fold agg + result sort — ONE more exchange
      // than the old shape (the window), but every exchange is
      // domain-sized and the fold itself dropped from cells² to
      // cells·sources (r17: the cumulative-grid rewrite)
      "q293_cliffs_delta" -> 5,
      // q294 = past the checkpointed (lang, v, fold) count support
      // (shared with the q305 streaming twin): three lang-keyed fold
      // aggs + the O(langs·scores) support agg/window + the report
      // join exchanges + sort; every post-checkpoint exchange is
      // lang- or score-domain-sized (+1 vs the pre-twin shape: the
      // support agg itself moved inside the checkpoint)
      "q294_conformal_coverage" -> 8,
      // q295 = past the checkpointed (source, token) agg: the
      // token-keyed pair self-join (both legs) + the pair agg + the
      // margin agg + result sort — the join legs are the only
      // vocab-sized exchanges, and they ship aggregated counts
      "q295_js_divergence" -> 6,
      // q296 = past the checkpointed edge table and LPA's per-round
      // checkpoints: the intra-edge join/agg, the degree agg, the
      // member agg — the contrib table is checkpointed and the report
      // rides broadcasts off it + result sort (communities-sized)
      "q296_modularity" -> 3,
      // q297 = the 3x-fanned (unit, label) agg + the per-unit
      // disagreement agg pair + the category-marginal agg pair —
      // one summary row, no sort; only the first agg is corpus-sized
      "q297_krippendorff_alpha" -> 4,
      // q298 = ONE corpus-sized (QI, sensitive) agg + the QI-group
      // distinct-count agg + result sort; the l-grid and total ride
      // broadcasts off the checkpointed O(groups) table
      "q298_l_diversity" -> 3,
      // q299 = the planner proper is 2 exchanges (bin agg + result
      // sort) past the checkpointed histogram; the pair-count
      // pipeline pays q31's audited posting shape at checkpoint time
      "q299_lsh_operating_point" -> 2,
      // q300 = the (doc, term) tf agg pair + cf margin + the per-doc
      // score agg + top-k — corpus stats ride 1-row/3-row broadcasts
      "q300_dirichlet_ql" -> 5,
      // q302 = past the checkpointed duel/pair tables and the four
      // checkpointed MM rounds: the final strength join + result sort
      "q302_bradley_terry" -> 2,
      // q303 = the per-user agg + the O(users) rank window feeding
      // the dose cells; the 5-row algebra is exchange-free
      "q303_cochran_armitage" -> 2,
      // q304 = q303's exact profile: user agg + rank window; the
      // stratum fold and the HT sums are O(5) algebra
      "q304_ipw_ate" -> 2,
      // q306 = the corpus-sized work (partitioned lag window, the
      // 33-row boundary window, distincts) executes at checkpoint
      // build; the audited tail is the 6-row stack + spine fold +
      // sort (a per-column union re-ran every agg subtree 6x — 25
      // exchanges — before the single stats checkpoint)
      "q306_encoding_audit" -> 2,
      // q307 = the pair pipeline pays at checkpoint; each of the 3
      // threshold sweeps is a CC fixed point whose per-round joins
      // hide behind the operator's own checkpoints, leaving the
      // component-size aggs + the union/report assembly
      "q307_percolation_sweep" -> 10,
      // q308 = past the checkpointed (source, length) support: the
      // two margin aggs, the within-term agg, the report joins' legs
      // + result sort — all domain-sized
      "q308_theil_decomposition" -> 6,
      // q309 = past the checkpointed pair window: the train agg, the
      // per-state argmax window, the global-mode pair, the test agg +
      // sort — type-domain after the one corpus window pass
      "q309_markov_accuracy" -> 5,
      // q310 = the 3 IPF rounds (margin aggs + broadcast factor
      // joins) hide behind per-round checkpoints of the O(langs·
      // sources) cell table; the audited tail is the result sort
      "q310_raking_ipf" -> 1,
      // q311 = past the checkpointed gram fan-out: the train
      // distinct, the test support agg, the gram-keyed overlap join
      // legs + the 1-row report fold — all gram-keyed, pre-combined
      "q311_ngram_novelty" -> 5,
      // q312 = the per-lang ESS agg + report sort over q310's
      // checkpointed weight table (the rounds pay at build)
      "q312_weight_ess" -> 2,
      // q313 = the (length) support agg + the O(distinct lengths)
      // single-partition rank window; the bracket algebra broadcasts
      "q313_median_ci" -> 2,
      // q314 = q198's support spine without the fold: horizon agg +
      // duration-support agg + total + the single-partition risk
      // window + result sort, all past the checkpointed O(users) table
      "q314_survival_support" -> 6,
      // q315 = past the checkpointed 100-row pool+rank table: the
      // nDCG agg (τ legs and the final join ride stats broadcasts,
      // the weight spine is a literal); the corpus paid one scored
      // scan into the bounded per-query heap at build
      "q315_rerank_eval" -> 1,
      // q316 = past the checkpointed distinct type sets: exclusivity
      // count + per-source count + their join + result sort; the
      // 4-rung ladder explode collapses in the ONE distinct at build
      "q316_novelty_profile" -> 4,
      // q317 = every leg folds to a checkpointed 4-row gate table at
      // build (funnel CC, psiTerms, k-anon each pay their own audited
      // shapes there); the report itself is union + 5-row sort
      "q317_release_report" -> 0,
      // q318 = past the per-round checkpointed accumulator: the final
      // 8-row result sort (each round's pass paid its map-side cosine
      // + TakeOrdered at build)
      "q318_kcenter_select" -> 1,
      // q319 = past the checkpointed token prefix: the 4-rung sweep
      // agg + the totals agg + result sort
      "q319_packing_sweep" -> 3,
      // q320 = the per-source quality rank window + report agg +
      // result sort (quality scoring is scan-level projection)
      "q320_quota_shadow_price" -> 3,
      // q321 = past the checkpointed integer-Jaccard edge table: the
      // component-size agg + per-cluster edge agg + their join +
      // result sort (CC checkpoints internally)
      "q321_cluster_tightness" -> 5,
      // q322 = past the checkpointed O(labels·2·64) centroid table:
      // the per-label drift agg + result sort (the epoch self-join
      // rides stats broadcasts)
      "q322_embedding_drift" -> 2,
      // q323 = past the checkpointed (source, tokens, q4) projection:
      // the bucketed prefix windows + per-bucket totals + the report
      // agg + result sort — q63's two-level scheme on the quality key
      "q323_token_budget_fill" -> 6,
      // q325 = past the checkpointed assignment + candidate tables:
      // the per-(query,np) approx-top-5 window, the 10-query exact
      // window, hit/cost aggs and their join + result sort — all on
      // panel-sized frames (the N×8 assignment argmax map-side
      // combined at build)
      "q325_ivf_probe_sweep" -> 8,
      // q326 = ONE per-user count agg + the global rank window +
      // decile report agg (the rank's single partition is O(users)
      // post-agg — monster scale swaps in the q63 two-level scheme)
      "q326_winners_curse" -> 2,
      // q327 = past the checkpointed (source, length) counts: support
      // + margin aggs, the grid join + per-source CDF windows, the
      // argmax agg + result sort — all domain-sized (q217's shape)
      "q327_ks_drift" -> 5,
      // q329/q330 = past the checkpointed SRP-candidate / approx-NN /
      // exact-panel tables: the mutual (q329) reversed-key self-join,
      // the panel-audit join, and the 1-row count aggs feeding the
      // report row — every corpus-sized exchange (the (band, code)
      // candidate join, candidate rescoring into the bounded heap)
      // executes at checkpoint build
      "q329_mutual_nn_approx" -> 8,
      "q330_hard_negatives_approx" -> 6,
      // q331 = past the checkpointed type-set table: the (n, gr)
      // overlap join + per-cell agg, the grid join, result sort —
      // the corpus-sized distinct pays at checkpoint build
      "q331_contamination_matrix" -> 3,
      // q333 = the O(users) rank windows + result sort past the
      // checkpointed per-user split agg (single-partition post-agg —
      // monster scale swaps in the q63 two-level scheme)
      "q333_corrected_leaderboard" -> 2,
      // q334 = past the checkpointed code/candidate/exact-panel
      // tables: the per-(r, qid) top-5 window, hit/cost aggs, their
      // join + result sort — all panel-sized; the corpus pays one
      // map-side sketch + the broadcast panel-code join at build
      "q334_srp_operating_curve" -> 7)
    val over = budgets.toSeq.sortBy(_._1).flatMap { case (q, budget) =>
      val n = plan(q).collect { case s: ShuffleExchangeExec => s }.size
      if (n > budget) Some(s"$q: $n shuffle exchanges, budget $budget") else None
    }
    assert(over.isEmpty,
      s"new shuffles crept in:\n${over.mkString("\n")}")
  }

  test("q02 predicates reach the parquet scan") {
    val scans = plan("q02_filter_project").collect {
      case f: FileSourceScanExec => f
    }
    assert(scans.nonEmpty, "expected a parquet scan")
    val pushed = scans.map(_.metadata.getOrElse("PushedFilters", "[]"))
    assert(pushed.exists(s => s.contains("GreaterThan") ||
      s.contains("LessThan") || s.contains("IsNotNull")),
      s"no predicates pushed to the scan: $pushed")
    // column pruning: the scan must not read the full 16-column row
    val readSchema = scans.head.schema.fieldNames.toSet
    assert(readSchema.size <= 6,
      s"scan reads more columns than the query needs: $readSchema")
  }

  test("q162 salted join keeps both salting legs in-plan (non-vacuous)") {
    // The dim-replication leg is an explode over the salt sequence —
    // a Generate node; if a refactor ever simplifies it away, the
    // "salted" join silently degenerates to a plain one.
    val p = plan("q162_salted_join")
    val gens = p.collect { case g: org.apache.spark.sql.execution.GenerateExec => g }
    assert(gens.nonEmpty, "dim-side salt explode disappeared from the plan")
    // and the heavy list is derived from an aggregation (top-k over
    // counts), not a collected literal: a TakeOrdered node feeds it.
    val topk = p.collect {
      case t: org.apache.spark.sql.execution.TakeOrderedAndProjectExec => t }
    assert(topk.nonEmpty, "heavy-key top-k disappeared from the plan")
  }

  test("quantile-lake rollup: every exchange ships pre-combined data") {
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import graft.operators.QuantileLake
    val li = graft.Tables.load(spark, sfDir, "lineitem")
    val p = QuantileLake.rollup(
      QuantileLake.partials(li, Seq("l_returnflag"), "l_shipdate",
        "l_extendedprice", Seq("l_orderkey", "l_linenumber")),
      Seq("l_returnflag"), Seq("p50" -> 0.5, "p95" -> 0.95))
      .queryExecution.executedPlan
    val exchanges = p.collect { case s: ShuffleExchangeExec => s }
    // partials agg + whole-row partial dedup + merge agg — the r9
    // restructure's point was that the MERGE exchange carries at most
    // k pairs per key per partition (top_k_min partial), not the full
    // exploded pair stream; a pair-level distinct would add a fourth,
    // full-width exchange
    assert(exchanges.size <= 3,
      s"rollup grew to ${exchanges.size} exchanges — a full-width " +
        "pair shuffle crept back in")
    for (ex <- exchanges) {
      val combined = ex.child.collect { case a: BaseAggregateExec => a }
      assert(combined.nonEmpty,
        s"exchange ships un-combined rows:\n${ex.child.treeString}")
    }
  }

  test("no query force-broadcasts a corpus-keyed frame (q215/q216 tripwire)") {
    // The same mistake shipped twice in r10 (q215/q216 pinned corpus-
    // sized doc→source / doc→fold maps as broadcasts) WHILE the r10
    // work was unpinning the identical shape in q147 — vigilance does
    // not scale; this rule does. Every BROADCAST-hinted join side in
    // every batch query must be provably bounded: it reads no stored
    // relation (driver-local literals), or only the FIXED-cardinality
    // TPC-H tables (region=5, nation=25 rows at every scale factor),
    // or an Aggregate / GlobalLimit sits between the scan and the
    // join (k-row codebooks, 1-row totals, top-k). Stats-driven
    // broadcasts are NOT flagged — they disappear at scale by
    // construction. Stream-driving queries (name contains "stream")
    // are skipped: constructing them runs a streaming job; their
    // shapes are audited by their own specs. Known limitation: a hint
    // INSIDE a localCheckpoint()ed subtree is invisible here (the
    // subtree is already an RDD scan by plan time).
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, BROADCAST,
      GlobalLimit, Join, LogicalPlan}
    import org.apache.spark.sql.execution.datasources.{HadoopFsRelation,
      LogicalRelation}
    val fixedSize = Set("region.parquet", "nation.parquet")
    def corpusScan(side: LogicalPlan): Boolean = side.collect {
      case l: LogicalRelation => l.relation match {
        case r: HadoopFsRelation =>
          r.location.rootPaths.exists(p => !fixedSize(p.getName))
        case _ => true
      }
    }.exists(identity)
    def bounded(side: LogicalPlan): Boolean =
      side.collect { case a: Aggregate => a }.nonEmpty ||
        side.collect { case l: GlobalLimit => l }.nonEmpty
    // Broadcast hints the rule flags but a human has adjudicated as
    // bounded for reasons a plan walk cannot see. Every entry must
    // still TRIP the rule (asserted below) so stale entries fail
    // loudly when the underlying hint is removed.
    val adjudicated = Map(
      // constant 10-row query panels: filter(vec_id < 10) is an
      // absolute literal bound, not a corpus fraction
      "q38_cosine_topk" -> "10-row query panel (vec_id < 10)",
      "q70_ann_srp_lsh" -> "10-row query panel (codes + vectors)",
      "q334_srp_operating_curve" ->
        "64-row query panel (codes + vectors, bounded at any SF)",
      "q112_quantized_recall" -> "10-row query panels (both legs)",
      "q251_ndcg" -> "10-row query panel",
      // the benchmark leg stands in for an external eval suite — a
      // fixed-size contract input, not a corpus fraction (the %31
      // filter only simulates it on the single-corpus fixture)
      "q114_fuzzy_decontam" -> "benchmark suite bounded by contract")
    val hits = SparkEntry.queries.keys.toSeq.sorted
      .filterNot(_.contains("stream")).flatMap { q =>
        val lp = SparkEntry.queries(q)(spark, sfDir)
          .queryExecution.optimizedPlan
        lp.collect { case j: Join => j }.flatMap { j =>
          Seq("left" -> (j.hint.leftHint, j.left),
            "right" -> (j.hint.rightHint, j.right)).collect {
            case (tag, (Some(h), side))
                if h.strategy.contains(BROADCAST) && corpusScan(side) &&
                  !bounded(side) =>
              q -> (s"$q: $tag side of a join is a FORCED broadcast of " +
                "an un-aggregated corpus scan")
          }
        }
      }
    val bad = hits.collect { case (q, msg) if !adjudicated.contains(q) => msg }
    assert(bad.isEmpty,
      s"forced corpus-sized broadcasts (OOM at lake scale):\n${bad.mkString("\n")}")
    val stale = adjudicated.keySet -- hits.map(_._1).toSet
    assert(stale.isEmpty,
      s"adjudicated entries no longer trip the rule — remove them: $stale")
  }
}
