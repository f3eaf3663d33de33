package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FormattedMode

/** Physical-plan shape assertions for the scale-critical queries: the
  * claims PERF.md makes about these plans (pushdown, no global sorts,
  * group-limit before exchange, broadcast placement, no skew windows) are
  * pinned here so a plan regression fails the suite rather than only
  * showing up as a benchmark drift.
  *
  * Static plans (AQE re-plans at runtime, but the static shape is what the
  * optimizer committed to); sf0.001 keeps planning fast — shapes are
  * data-size-independent at these scales except where noted.
  */
class PlanShapeSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  private def planOf(name: String): String = {
    val df: DataFrame = SparkEntry.queries(name)(spark, sf)
    df.queryExecution.explainString(FormattedMode)
  }

  test("q02 top-revenue: TakeOrderedAndProject (no global sort) and filter pushdown") {
    val p = planOf("q02_top_revenue")
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(!p.contains("GlobalSort"))
    assert(p.contains("PushedFilters: [IsNotNull"), p)
  }

  test("q08 top-k window: partial WindowGroupLimit runs below the exchange") {
    val p = planOf("q08_topk_window")
    assert(p.contains("WindowGroupLimit"), p)
    // Partial mode = each map task forwards only its local top-k
    assert(p.contains("Partial"), p)
  }

  test("q59 tf-idf: no full-frame window on word; df arrives by broadcast join") {
    val p = planOf("q59_tfidf")
    // exactly one Window (the per-doc top-k), never one keyed on `word`
    val windowSections = p.split("\n").count(_.matches(".*\\)\\s+Window\\s*(\\[codegen.*)?"))
    assert(windowSections <= 1, s"expected at most one Window operator:\n$p")
    assert(!p.contains("windowspecdefinition(word"), p)
    assert(p.contains("BroadcastHashJoin"), p)
    // the explode feeding tf happens inside the cached relation build only
    assert(p.contains("InMemoryRelation"), p)
  }

  test("q65: the optimizer rule plans the bucketed equality join, not a nested loop") {
    val p = planOf("q65_range_join_rewrite")
    assert(p.contains("__graft_bucket"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q75: the similarity rule plans the element equality join, not a nested loop") {
    val p = planOf("q75_sim_join_rewrite")
    assert(p.contains("__graft_sim_elem"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q77: winnow minima via Window over exploded hashes, not in-row lambdas") {
    val p = planOf("q77_winnow_fingerprints")
    // the 97.8s regression shape was a single Project of nested lambdas
    // (hash array rebuilt per window position) — no Window, no explode.
    // The fixed plan explodes shingles (hash once per row) and slides the
    // minimum with a Window operator.
    assert(p.contains("Window"), p)
    assert(p.contains("posexplode"), p)
    // the md5 hash must be computed in the exploded row projection, not
    // inside any window-position lambda: the only lambda left is the
    // per-doc shingle build feeding posexplode
    assert(!p.contains("array_min"), p)
  }

  test("q83: history joins via broadcasts only — no corpus-side shuffle join") {
    val p = planOf("q83_incremental_dedup")
    assert(p.contains("BroadcastHashJoin"), p)
    // both joins (semi filter on history, flag join on batch) must be
    // broadcast; a SortMergeJoin here would mean the history shuffled
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("q29 ANN brute force: query side broadcast, corpus streams once") {
    val p = planOf("q29_ann_bruteforce")
    assert(p.contains("BroadcastNestedLoopJoin"), p) // broadcast CROSS of tiny query set
    assert(p.contains("BroadcastExchange"), p)
  }

  test("q57 domain mix: rate table broadcast onto the scan — no corpus shuffle before the filter") {
    val p = planOf("q57_domain_mix")
    assert(p.contains("BroadcastHashJoin"), p)
    // the only Exchanges allowed are for the metadata-sized aggregates and
    // their broadcasts, never a corpus-partitioning hash exchange on doc_id
    assert(!p.contains("hashpartitioning(doc_id"), p)
  }

  test("q51 stratified sample: group-limit below the stratum exchange (skew-proof)") {
    val p = planOf("q51_stratified_sample")
    assert(p.contains("WindowGroupLimit"), p)
    assert(p.contains("Partial"), p)
  }

  test("q66 trained assignment: pinned codebook is a broadcast local relation") {
    val p = planOf("q66_ivf_trained_assign")
    assert(p.contains("LocalTableScan"), p)
    assert(p.contains("BroadcastExchange"), p)
  }

  test("q84 boilerplate scrub: flagged-chunk lookup is broadcast, not a corpus shuffle join") {
    val p = planOf("q84_boilerplate_scrub")
    assert(p.contains("BroadcastHashJoin"), p)
    // the only SortMergeJoin-free path: corpus text never shuffles for the
    // boilerplate membership probe
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("q73 prefix Jaccard: every join equality-keyed, shingle set cached once") {
    val p = planOf("q73_jaccard_prefix")
    // the whole point of prefix filtering: no all-pairs stage anywhere
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    // the distinct shingle set feeds df/prefix/verify branches from one
    // cached relation, not four parquet scans
    assert(p.contains("InMemoryRelation"), p)
  }

  test("q81 winnow pairs: fingerprint collision join is equality-keyed") {
    val p = planOf("q81_winnow_pairs")
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("q93 PQ ADC top-k: broadcast LUT, group-limit rank, no nested loop") {
    val p = planOf("q93_pq_topk")
    assert(p.contains("BroadcastExchange"), p) // the |q|·m·k LUT ships, codes stream
    assert(p.contains("WindowGroupLimit"), p)  // per-query rank never globally sorts
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q100 margin-gated pairs: candidate/estimate/verify joins all equality-keyed") {
    val p = planOf("q100_minhash_fast")
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("q108 zipf audit: vocabulary head cut via TakeOrderedAndProject, no global sort") {
    val p = planOf("q108_zipf_audit")
    assert(p.contains("TakeOrderedAndProject"), p)
    // the only Window runs over the k-row head (post-limit), never the vocab
    assert(!p.contains("windowspecdefinition(word"), p)
  }

  test("q102 repeated grams: window keyed on the composite (doc, gram), no cartesian") {
    val p = planOf("q102_repeated_grams")
    assert(p.contains("windowspecdefinition(doc_id"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q116 incremental near-dup: history meets batch via broadcasts, no sort-merge") {
    val p = planOf("q116_incremental_neardup")
    // the band semi-filter and the pairing join must both broadcast the
    // batch side — a SortMergeJoin before the verify means history shuffled
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q117 triplet mining: cell-blocked pair space, argmax by aggregation not window") {
    val p = planOf("q117_triplet_mining")
    assert(!p.contains("CartesianProduct"), p)
    // the only nested-loop allowed is the pinned 8-row codebook broadcast
    // cross of ivfAssignTrained (the q29/q66 pattern) — never a pair stage
    assert(!p.contains("BroadcastNestedLoopJoin Inner"), p)
    // the per-anchor argmax is max_by aggregation — no anchor-keyed window
    assert(!p.contains("windowspecdefinition(anchor"), p)
  }

  test("q118 excision: benchmark grams broadcast onto the token stream") {
    val p = planOf("q118_excise_contamination")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q87 score calibration: CDF windows over the histogram only, doc join-back is broadcast") {
    val p = planOf("q87_score_calibration")
    // one Window (the running sum over (source, bin) aggregates)
    val windowSections = p.split("\n").count(_.matches(".*\\)\\s+Window\\s*(\\[codegen.*)?"))
    assert(windowSections <= 1, s"expected at most one Window operator:\n$p")
    assert(!p.contains("windowspecdefinition(doc_id"), p)
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("q88 per-source cap: group-limit below the exchange (mega-domain-proof)") {
    val p = planOf("q88_top_quality_per_source")
    assert(p.contains("WindowGroupLimit"), p)
    assert(p.contains("Partial"), p)
  }

  test("q121 benchmark contamination: bench grams broadcast, no cartesian") {
    val p = planOf("q121_benchmark_contamination")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q107 decontam spans: gram stream shuffles on the hash key only") {
    val p = planOf("q107_decontam_spans")
    assert(p.contains("hashpartitioning(gram_h"), p)
    assert(!p.contains("hashpartitioning(gram#"), p)
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("q85 frequent n-grams: two-level aggregate into a k-heap, no window") {
    val p = planOf("q85_frequent_ngrams")
    assert(p.contains("TakeOrderedAndProject"), p)
    // (gram, doc) pre-aggregate spreads hot grams before the gram rollup
    assert(p.contains("hashpartitioning(gram"), p)
    assert(!p.contains("Window"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q115 projected near-dup: only broadcast crosses, every real join hashed") {
    val p = planOf("q115_projected_neardup")
    assert(!p.contains("CartesianProduct"), p)
    val bnlj = p.split("\n").count(_.matches("\\(\\d+\\) BroadcastNestedLoopJoin.*"))
    val crosses = p.split("Join type: Cross").length - 1
    assert(bnlj === crosses, s"non-cross nested loop present:\n$p")
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("q129 hybrid RRF: rankers end in k-heaps; rank windows sit above the limits") {
    val p = planOf("q129_hybrid_rrf")
    // both rankers cut to k via per-partition heaps, never a global sort
    assert(p.split("TakeOrderedAndProject").length >= 3, p)
    assert(!p.contains("CartesianProduct"), p)
    // the only nested loops are the broadcast one-row query-vector crosses
    val bnlj = p.split("\n").count(_.matches("\\(\\d+\\) BroadcastNestedLoopJoin.*"))
    val crosses = p.split("Join type: Cross").length - 1
    assert(bnlj === crosses, s"non-cross nested loop present:\n$p")
    // rank windows are bounded: they consume a TakeOrderedAndProject output
    assert(p.contains("Window"), p)
  }

  test("q134 triangles: wedge and closure joins all equality-keyed") {
    val p = planOf("q134_triangles")
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("NestedLoopJoin"), p)
  }

  test("q136 novelty: grams shuffle hashed, never as raw strings") {
    val p = planOf("q136_novelty")
    // every exchange keys on the 60-bit hash or doc_id — no raw gram key
    assert(p.contains("hashpartitioning"), p)
    assert(!p.contains("hashpartitioning(gram"), p)
  }

  test("q137 weighted sample: one map-side pass into a k-heap, no shuffle") {
    val p = planOf("q137_weighted_sample")
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(!p.contains("Exchange"), p)
    assert(!p.contains("Window"), p)
  }

  test("q165 stickiness: no range join; user-day windows keyed, grid window single") {
    val p = planOf("q165_stickiness")
    // the WAU side must NOT be a day-range join over user-days
    assert(!p.contains("NestedLoopJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
    // the per-user lag window is keyed on user_id; the only unkeyed
    // window is the date-grid running sum
    assert(p.contains("windowspecdefinition(user_id"), p)
    val unkeyed = p.split("\n").count(_.contains("SinglePartition"))
    assert(unkeyed >= 1, p)
  }

  test("q168 hubness: cell-blocked equality join and group-limit pruning") {
    val p = planOf("q168_knn_hubness")
    assert(!p.contains("CartesianProduct"), p)
    // the pair stage joins on cell equality (hashed), never all-pairs;
    // the only nested loops are broadcast crosses (zero-row arithmetic
    // and the pinned 8-row codebook)
    val bnlj = p.split("\n").count(_.matches("\\(\\d+\\) BroadcastNestedLoopJoin.*"))
    val crosses = p.split("Join type: Cross").length - 1
    assert(bnlj === crosses, s"non-cross nested loop present:\n$p")
    // per-anchor top-k prunes before the in-degree aggregate
    assert(p.contains("WindowGroupLimit"), p)
  }

  test("q170 skyline: no O(n^2) dominance join — aggregate, bounded window, broadcast back") {
    val p = planOf("q170_skyline_docs")
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("NestedLoopJoin"), p)
    // the skyline-length table joins back by broadcast hash
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("q171 isotropy: componentwise sums partial-aggregate before any exchange") {
    val p = planOf("q171_isotropy")
    // no joins except one-row broadcast crosses
    val bnlj = p.split("\n").count(_.matches("\\(\\d+\\) BroadcastNestedLoopJoin.*"))
    val crosses = p.split("Join type: Cross").length - 1
    assert(bnlj === crosses, s"non-cross nested loop present:\n$p")
    // the per-component aggregate map-side combines the exploded stream
    assert(p.contains("HashAggregate"), p)
    assert(p.contains("posexplode"), p)
  }

  test("q174 template scores: occurrence-frequency join equality-keyed on the chunk hash") {
    val p = planOf("q174_template_scores")
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("NestedLoopJoin"), p)
    // df meets occurrences by shuffled hash join on h (corpus-sized both
    // sides — correctly NOT broadcast)
    assert(p.contains("hashpartitioning(h"), p)
  }

  test("q188 pivot: pinned values compile to one static pivot aggregate, no second scan") {
    val p = planOf("q188_dow_pivot")
    // an open value set would need a driver-side distinct pass first;
    // pinned values plan as pivotfirst over one scan
    assert(p.contains("pivotfirst"), p)
    assert(p.split("\n").count(_.matches("\\(\\d+\\) Scan parquet\\s*")) === 1, p)
    assert(!p.contains("Expand"), p)
  }

  test("q191 revenue acf: day-grain collapse first, every join broadcast-hash on the day key") {
    val p = planOf("q191_revenue_acf")
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("NestedLoopJoin"), p)
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("q192 value moments: one map-side-combined aggregate, nothing else") {
    val p = planOf("q192_value_moments")
    val exchanges = p.split("\n").count(_.matches("\\(\\d+\\) Exchange\\s*"))
    assert(exchanges === 1, s"expected the single event_type exchange:\n$p")
    assert(!p.contains("Join"), p)
  }

  test("q193 adamic-adar: wedge and edge-flag joins all equality-keyed") {
    val p = planOf("q193_adamic_adar")
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("NestedLoopJoin"), p)
  }

  test("q195 lexical richness: in-row HOFs, at most the spread exchange") {
    val p = planOf("q195_lexical_richness")
    // r13: the one-split gate corpus routes through documentsSpread, so a
    // single PINNED repartition (REPARTITION_BY_NUM) may precede the map
    // work — it spreads the compute-bound token statistics and is skipped
    // at corpus scale (Tables.spreadBy). The map pipeline itself must stay
    // shuffle-free: no aggregate exchange, no join.
    val exchanges = p.split("\n").count(_.matches("\\(\\d+\\) Exchange\\s*"))
    assert(exchanges <= 1, s"expected at most the spread exchange:\n$p")
    if (exchanges == 1)
      assert(p.contains("REPARTITION_BY_NUM"),
        s"the only allowed exchange is the pinned spread repartition:\n$p")
    assert(!p.contains("Join"), p)
  }

  test("q196 pmi: positional join equality-keyed; only the one-row total crosses") {
    val p = planOf("q196_pmi_pairs")
    assert(!p.contains("CartesianProduct"), p)
    val bnlj = p.split("\n").count(_.matches("\\(\\d+\\) BroadcastNestedLoopJoin.*"))
    val crosses = p.split("Join type: Cross").length - 1
    assert(bnlj === crosses && bnlj <= 1, s"non-cross nested loop present:\n$p")
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("q210 kmv: the k-smallest filter plans as a WindowGroupLimit") {
    // rn <= k (not rn = k) so each input partition heaps down to k rows
    // per source before the window sort — the 'ALL' stratum would
    // otherwise single-thread-sort the whole distinct-shingle universe
    val p = planOf("q210_kmv_distinct")
    assert(p.contains("WindowGroupLimit"), p)
  }

  test("q217 mutual nn: cell-blocked equality joins only, top-1 group-limited") {
    val p = planOf("q217_mutual_nn")
    assert(!p.contains("CartesianProduct"), p)
    // the only nested-loop joins are the broadcast centroid-literal
    // crosses of the trained-cell assignment (16-row build side)
    val bnlj = p.split("\n").count(_.matches("\\(\\d+\\) BroadcastNestedLoopJoin.*"))
    val crosses = p.split("Join type: Cross").length - 1
    assert(bnlj === crosses, s"non-cross nested loop present:\n$p")
    assert(p.contains("WindowGroupLimit"), p)
  }

  test("q209 cms: sketch cells and estimates arrive by broadcast") {
    val p = planOf("q209_cms_audit")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(p.contains("TakeOrderedAndProject"), p) // top-k probe side
  }

  test("q238 hill tail: global top-(k+1) is a heap, never a full sort") {
    val p = planOf("q238_hill_tail")
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(!p.contains("GlobalSort"), p)
  }

  test("q240 vocab overlap: per-gram pair expansion, no gram-keyed self-join") {
    val p = planOf("q240_vocab_overlap")
    // the pair space must come from exploding each gram's holder list —
    // a join keyed on the shingle value would square on hot boilerplate
    assert(!p.toLowerCase.contains("sortmergejoin"), p)
    assert(!p.contains("CartesianProduct"), p)
    // only the two |sources|-sized size lookups join, and by hash
    assert(p.contains("BroadcastHashJoin"), p)
    assert(p.contains("Generate"), p) // the holder-list pair explode
  }

  test("q261: the hamming rule plans the pigeonhole equality join, not a nested loop") {
    val p = planOf("q261_hamming_join_rewrite")
    assert(p.contains("__graft_ham_idx"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q274 local supplier volume: dims broadcast, facts hash-join, no nested loop") {
    val p = planOf("q274_local_supplier_volume")
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
    // supplier/nation/region (and usually customer at this scale) ship
    // as broadcasts; at least the three declared hints must hold
    val bhj = p.split("\n").count(_.matches("\\(\\d+\\) BroadcastHashJoin.*"))
    assert(bhj >= 3, s"expected >= 3 broadcast joins:\n$p")
  }

  test("q243 split coverage: gram-keyed flag aggregates, no pair join") {
    val p = planOf("q243_split_coverage")
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    // the per-n stages aggregate (max of two flags); the only joins are
    // the doc_id split decorations
    assert(p.contains("HashAggregate"), p)
  }

  test("q239 haar: one day-grain aggregate feeds the pyramid; bounds broadcast") {
    val p = planOf("q239_haar_revenue")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
    // no window, no sort: the pyramid is pure (level, block) aggregation
    assert(!p.matches("(?s).*\\)\\s+Window\\s.*"), p)
  }

  test("q288 media ann: bounded query side broadcast, top-k group-limited") {
    val p = planOf("q288_media_feature_ann")
    // the q29 contract on the media features: the by-construction-bounded
    // query side is the broadcast build, candidates stream map-side
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"), p)
    // per-query top-k is a k-heap with the partial pass below the exchange
    assert(p.contains("WindowGroupLimit"), p)
    assert(p.contains("Partial"), p)
  }

  test("q287 frame dedup: one equality-keyed aggregate, no join, no window") {
    val p = planOf("q287_frame_dedup")
    // candidates come from the (len, checksum) group key alone — the LSH
    // discipline: nothing pairwise, nothing sorted, no join of any kind
    assert(!p.contains("Join"), p)
    assert(!p.matches("(?s).*\\)\\s+Window\\s.*"), p)
    assert(p.contains("MapPartitions"), p)
    assert(p.contains("HashAggregate"), p)
  }

  test("q290 fk integrity: one left join + one aggregate per relation, dims broadcast") {
    val p = planOf("q290_fk_integrity")
    // all child-side metrics (incl. orphans and referenced parents) come
    // from ONE LeftOuter join feeding one aggregate — no separate
    // anti/semi passes re-scanning the fact table
    assert(p.contains("BroadcastHashJoin"), p)
    assert(p.contains("LeftOuter"), p)
    assert(!p.contains("LeftAnti") && !p.contains("LeftSemi"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q294 postings audit: the gap window is sharded on (word, shard), never word alone") {
    val p = planOf("q294_postings_audit")
    // the q59 skew lesson: a hot word's postings must not funnel through
    // one reducer — the sort/window key carries the doc-shard column
    assert(p.contains("windowspecdefinition(word"), p)
    assert(p.contains("shard"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q295 phrase search: in-row bigrams, phrase table broadcast on both paths") {
    val p = planOf("q295_phrase_search")
    // no positional self-join of the token stream: adjacency comes from
    // zip_with inside the projection; the top-k phrase table broadcasts
    assert(p.contains("zip_with") || p.contains("zipwith") || p.contains("ZipWith"), p)
    assert(p.contains("BroadcastHashJoin"), p)
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("q298 capped sessions: both window passes share one user-keyed exchange") {
    val p = planOf("q298_capped_sessions")
    // lag + running-sum + row_number plan on the same hashpartitioning —
    // exactly one exchange keyed on user_id (plus the histogram shuffle)
    val userExchanges = p.split("\n")
      .count(l => l.contains("hashpartitioning(user_id"))
    assert(userExchanges == 1, s"expected exactly one user-keyed exchange:\n$p")
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q306 tpch-q6: every predicate reaches the parquet reader, no join") {
    val p = planOf("q306_tpch_q6_forecast")
    assert(p.contains("PushedFilters"), p)
    // the three residual predicates all push: date bound, discount band,
    // quantity cap (IsNotNull + comparison forms)
    assert(p.contains("l_shipdate"), p)
    assert(p.contains("l_discount"), p)
    assert(p.contains("l_quantity"), p)
    assert(!p.contains("Join"), p)
  }

  test("q310 tpch-q19: disjunctive predicate stays on a broadcast hash join") {
    val p = planOf("q310_tpch_q19_disjunctive")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"), p)
  }

  test("q311 OLS: one aggregate over the scan, no join, no window, no sort") {
    val p = planOf("q311_ols_normal_eq")
    // the whole regression is moment sums + O(1) Cramer projection —
    // anything else in the plan means the normal-equations shape broke
    assert(!p.contains("Join"), p)
    assert(!p.matches("(?s).*\\)\\s+Window\\s.*"), p)
    assert(!p.matches("(?s).*\\)\\s+Sort\\s.*"), p)
    assert(p.contains("HashAggregate"), p)
  }

  test("q313 attribution: bucketed equality join, no time-range nested loop") {
    val p = planOf("q313_linear_attribution")
    // the (user, hour-bucket) key makes the range join an equality join;
    // a BNLJ/cartesian here means the bucket residual-filter shape broke
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"), p)
    assert(p.contains("hashpartitioning") || p.contains("BroadcastHashJoin"), p)
  }

  test("q316 FS: the memoized pair table feeds one aggregate — no live pair join") {
    val p = planOf("q316_fellegi_sunter")
    // after the shared SessionMemo, the steady-state plan reads the
    // checkpointed pair rows; the quadratic blocked self-join must not
    // replan per query
    assert(p.contains("Scan ExistingRDD") || p.contains("LocalTableScan"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q299 rank kitchen: ONE window pass computes all five functions on one exchange") {
    val p = planOf("q299_rank_functions")
    // ntile/percent_rank/cume_dist need the whole partition, so group-limit
    // pruning is semantically impossible — the right plan is a single
    // Window operator evaluating all five functions over one nation-keyed
    // exchange + sort, then the rnk filter
    val windowOps = p.split("\n").count(_.matches("\\(\\d+\\) Window.*"))
    assert(windowOps === 1, s"expected exactly one Window operator:\n$p")
    val exchanges = p.split("\n").count(_.matches("\\(\\d+\\) Exchange.*"))
    assert(exchanges === 1, s"expected one exchange:\n$p")
    assert(!p.contains("CartesianProduct"), p)
  }
}
