package graft

import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan shape assertions — the scale contract, checked in CI:
  * filters reach the parquet scan, projections prune the read schema,
  * dimension lookups broadcast, top-k never global-sorts, aggregates combine
  * map-side, and the merge as-of join shuffles exactly once. A regression
  * here can stay invisible at sf0.01 and still be the bottleneck at 100 TB.
  */
class PlanQualitySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private def plan(name: String): String = {
    // plan-shape assertions must be order-independent: a SharedFrames
    // entry cached by an earlier suite in the same session turns a
    // parquet scan into an InMemoryTableScan whose pretty-print embeds
    // the cached subtree (and can double-count "Scan parquet"), so pin
    // every assertion to the uncached plan
    spark.catalog.clearCache()
    SparkEntry.queries(name)(spark, sf).queryExecution.executedPlan.toString
  }

  test("q01: projection pruned to the selected columns at the scan") {
    val p = plan("q01_scan_project")
    assert(p.contains("ReadSchema: struct<r_regionkey:int,r_name:string>"), p)
  }

  test("q11: predicate pushed into the parquet scan") {
    val p = plan("q11_filter_pushdown")
    assert(p.contains("PushedFilters:") && p.contains("GreaterThan(p_size,25"), p)
  }

  test("q25: surrogate-key lookup is a broadcast hash join (fact never shuffles for it)") {
    val p = plan("q25_fact_orders")
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("q08/q43: top-k plans TakeOrderedAndProject, not a global sort") {
    assert(plan("q08_topk").contains("TakeOrderedAndProject"))
    assert(plan("q43_vocab_topk").contains("TakeOrderedAndProject"))
  }

  test("q290: the heavy-hitter split is a TakeOrdered, never a rank window") {
    val p = plan("q290_join_cardinality")
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(!p.contains("row_number"), p)
  }

  test("q278/q292: winnow selection is a zero-shuffle map; lateness window keyed") {
    // q278's selection became the native winnow_select expression in r16 —
    // no window, no gram-stream exchange at all on the selection path
    // (the parity with the lag/lead window formulation is pinned in
    // DedupSpec); q292 keeps its user-keyed running max
    // the selection subtree is scratch-materialized inside q278, so probe
    // the kernel's own plan for the native expression + absence of any
    // window/exchange; the q278 plan itself must carry no window either
    val pSel = graft.queries.Corpus.winnowSelected(
      graft.Tables.load(spark, "/root/testdata/sf0.001", "documents")
        .select("doc_id", "text"))
      .queryExecution.executedPlan.toString
    assert(pSel.contains("winnow_select"), s"native selection missing:\n$pSel")
    assert(!pSel.contains("windowspecdefinition") && !pSel.contains("Exchange"),
      s"selection must be a zero-shuffle map:\n$pSel")
    assert(!plan("q278_winnow_fingerprint").contains("windowspecdefinition"),
      "q278 should carry no window at all")
    assert(plan("q292_watermark_sizing")
      .contains("windowspecdefinition(user_id"), "q292 window not user-keyed")
  }

  test("q286: the fp-dedup aggregate combines map-side before the shuffle") {
    val p = plan("q286_repeat_value")
    assert(p.contains("partial_max") || p.contains("partial_sum"), p)
  }

  test("q12: aggregation combines map-side (partial) before the shuffle") {
    val p = plan("q12_group_count")
    assert(p.contains("partial_count"), p)
  }

  test("q273: the sketch aggregate combines map-side and no Sort touches raw rows") {
    val p = plan("q273_quantile_sketch")
    // the sketch's whole point: ONE map-combined aggregate over the corpus
    // (every task collapses to <= ~40 rows per source), the window/sort
    // only ever over the |sources|x|buckets| sketch frame
    assert(p.contains("partial_count"), s"sketch must combine map-side:\n$p")
    // plans print top-down (scan last): everything below the map-side
    // partial aggregate — i.e., after its line — is the raw-row side, and
    // no Sort may live there (a Sort over raw rows would mean the
    // rank-window shape q273 exists to avoid); the window's sort and the
    // final ORDER BY both sit ABOVE the aggregate, over sketch-sized rows
    val belowPartial = p.substring(p.lastIndexOf("partial_count"))
    assert(!belowPartial.contains("Sort "),
      s"no Sort may touch raw rows below the partial aggregate:\n$p")
  }

  test("q46: tiny band table joins as BroadcastNestedLoopJoin (no shuffle)") {
    val p = plan("q46_range_band_join")
    assert(p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("q29: corpus self-join is a merge join — the corpus is never broadcast") {
    val p = plan("q29_ngram_jaccard")
    assert(p.contains("SortMergeJoin") && !p.contains("BroadcastHashJoin"), p)
    // the shingle transform is evaluated once per side — the pushed-down
    // row filter guards on token count, not on the expensive shingle array
    val shingleEvals = "array_distinct".r.findAllIn(p).length
    assert(shingleEvals == 2, s"expected 2 shingle evals, got $shingleEvals\n$p")
  }

  test("q45: merge as-of join shuffles the data exactly once (plus the output sort)") {
    val p = plan("q45_asof_join")
    val hashExchanges = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(hashExchanges == 1, s"expected 1 keyed shuffle, got $hashExchanges\n$p")
  }

  test("q134: forward as-of keeps the same single-shuffle merge shape") {
    val p = plan("q134_asof_forward")
    val hashExchanges = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(hashExchanges == 1, s"expected 1 keyed shuffle, got $hashExchanges\n$p")
  }

  test("q65: correlated EXISTS/NOT EXISTS decorrelate to semi + anti joins") {
    val p = plan("q65_exists_subquery")
    assert(p.contains("LeftSemi"), s"EXISTS must plan a left-semi join:\n$p")
    assert(p.contains("LeftAnti"), s"NOT EXISTS must plan a left-anti join:\n$p")
  }

  test("q66: the deterministic sample predicate is evaluated at the scan side") {
    // the md5-bucket filter is a row-local predicate: it must sit directly on
    // the scan (one narrow Filter), not behind any exchange
    val p = SparkEntry.queries("q66_stratified_sample")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!p.contains("Exchange hashpartitioning"),
      s"stratified sample must not shuffle:\n$p")
  }

  test("whole-stage codegen covers the scan-filter-project pipeline") {
    // AQE materializes codegen stages at execution; inspect the final plan
    val df = SparkEntry.queries("q03_derived_cents")(spark, sf)
    df.collect() // execute THIS plan so AQE finalizes its codegen stages
    val p = df.queryExecution.executedPlan.toString
    // compact plan notation marks whole-stage-codegen'd operators with *(id)
    assert(p.contains("*(") && p.contains("== Final Plan =="), p)
  }

  test("q71: blocked fuzzy join is an equi-join on the block key, never a cartesian") {
    val p = plan("q71_fuzzy_block_join")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
    assert(p.contains("Join") || p.contains("join"), p)
  }

  test("q159: banded candidates are equi-joins, unhinted — no cartesian anywhere") {
    // The whole point of the (label, band) blocking: every candidate pair
    // comes out of an equi-join on the band key, and the exact verify joins
    // candidates back to the corpus by key. A cartesian here is the
    // Σ label² scale bug again. Every side is corpus-derived, so no
    // broadcast may be FORCED (static stats legitimately broadcast the
    // tiny fixture; at 100 TB the same unhinted plan shuffles).
    val df = SparkEntry.queries("q159_semantic_dedup")(spark, sf)
    val logical = df.queryExecution.optimizedPlan.toString
    assert(!logical.contains("strategy=broadcast"),
      s"q159 must not force a broadcast hint:\n$logical")
    val p = plan("q159_semantic_dedup")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("q165/q166/q167: the new corpus passes are single-scan and join-free") {
    val p165 = plan("q165_flattened_sample")
    assert("Scan parquet".r.findAllIn(p165).length == 1, p165)
    assert(!p165.contains("Join"), s"flattening needs no join:\n$p165")
    val p166 = plan("q166_token_apportion")
    assert("Scan parquet".r.findAllIn(p166).length == 1, p166)
    assert(!p166.contains("Join"),
      s"apportionment must window the tiny aggregate, not re-join the corpus:\n$p166")
    val p167 = plan("q167_zipf_slope")
    assert("Scan parquet".r.findAllIn(p167).length == 1, p167)
    assert(!p167.contains("Join") && !p167.contains("Window"),
      s"the octave estimator needs neither a join nor a rank window:\n$p167")
  }

  test("q164: preference pairs read events ONCE — no self-join anywhere") {
    val p = plan("q164_preference_pairs")
    // the set-aggregate formulation replaces the pos/neg self-joins: one
    // corpus scan, one keyed shuffle, stateless explode fan-out
    assert("Scan parquet".r.findAllIn(p).length == 1,
      s"preference pairs must scan events exactly once:\n$p")
    assert(!p.contains("Join"), s"no join belongs in this plan:\n$p")
  }

  test("q73: typed UDAF aggregates in two phases (map-side partial + merge)") {
    val p = plan("q73_weighted_udaf")
    assert(p.contains("partial_weightedcents"), s"no partial aggregation:\n$p")
    val objAggs = "ObjectHashAggregate".r.findAllIn(p).length
    assert(objAggs == 2, s"expected partial+final ObjectHashAggregate, got $objAggs\n$p")
  }

  test("q75: session_window shuffles on user_id exactly once") {
    val p = plan("q75_session_window")
    val hashExchanges = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(hashExchanges == 1, s"expected 1 keyed shuffle, got $hashExchanges\n$p")
    assert(p.contains("partial_count"), s"session agg must combine map-side:\n$p")
  }

  test("q76: all three value functions share one Window node") {
    val p = plan("q76_value_window")
    val windows = "\\bWindow\\b".r.findAllIn(p).length
    assert(windows == 1, s"expected a single shared Window operator, got $windows\n$p")
  }

  test("q70: islands chain reuses partitioning — exactly two keyed shuffles") {
    // one exchange for the (user, day) distinct, one on user_id that the
    // window AND both aggregates all share (Catalyst exchange reuse)
    val p = plan("q70_islands")
    val hashExchanges = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(hashExchanges == 2, s"expected 2 keyed shuffles, got $hashExchanges\n$p")
  }

  test("q72: the generated date spine joins by broadcast (fact side never reshuffles for it)") {
    val p = plan("q72_date_spine")
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("q79: normalization aggregates in one keyed shuffle with map-side partials") {
    val p = plan("q79_text_normalize")
    val hashExchanges = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(hashExchanges == 1, s"expected 1 keyed shuffle, got $hashExchanges\n$p")
    assert(p.contains("partial_"), s"aggregate must combine map-side:\n$p")
  }

  test("q87: grouping sets plan one Expand + one scan, not a scan per set") {
    val p = plan("q87_grouping_sets")
    assert("Expand".r.findAllIn(p).length == 1, s"expected exactly 1 Expand:\n$p")
    assert("Scan parquet".r.findAllIn(p).length == 1,
      s"grouping sets must not rescan the table per set:\n$p")
  }

  test("q90: unigram joins are unhinted — AQE, not a forced hint, picks the strategy") {
    // Vocabulary is unbounded at 100 TB, so the plan must carry NO broadcast
    // hint (a forced broadcast OOMs the driver at 100× vocabulary); when the
    // aggregate measures small at runtime, AQE still converts to broadcast.
    val df = SparkEntry.queries("q90_bigram_assoc")(spark, sf)
    val logical = df.queryExecution.optimizedPlan.toString
    assert(!logical.contains("strategy=broadcast"),
      s"q90 must not force a broadcast hint:\n$logical")
    df.collect() // let AQE finalize with measured sizes
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin") || p.contains("SortMergeJoin"),
      s"unigram joins must plan a real join:\n$p")
    assert(p.contains("TakeOrderedAndProject"), s"top-20 must not global-sort:\n$p")
  }

  test("q123: part-support joins are unhinted — AQE picks the strategy") {
    val df = SparkEntry.queries("q123_association_lift")(spark, sf)
    val logical = df.queryExecution.optimizedPlan.toString
    // the only allowed hint is the 1-row n_orders scalar; per-part supports
    // are corpus-derived (unbounded item universe) and must stay unhinted
    val hints = "strategy=broadcast".r.findAllIn(logical).length
    assert(hints <= 1, s"q123 must not force part-support broadcasts:\n$logical")
  }

  test("q95: posting stats combine map-side and take-order the top-20") {
    val p = plan("q95_posting_stats")
    assert(p.contains("partial_"), s"df/tf must combine map-side:\n$p")
    assert(p.contains("TakeOrderedAndProject"), s"top-20 must not global-sort:\n$p")
  }

  test("q93: top-20 taken before the window — no vocab-wide single-partition window") {
    val p = plan("q93_vocab_coverage")
    assert(p.contains("TakeOrderedAndProject"),
      s"the top-20 must plan per-partition heaps, not a global sort:\n$p")
    // the rank/running-sum window must sit ABOVE the 20-row limit (parents
    // print first): a window whose input is the full aggregated vocabulary
    // moves 10⁸–10⁹ distinct tokens through one partition at corpus scale
    val wIdx = p.indexOf("Window")
    val tIdx = p.indexOf("TakeOrderedAndProject")
    assert(wIdx >= 0 && tIdx > wIdx,
      s"the window must consume the 20-row prefix, never the full vocabulary:\n$p")
  }

  test("q168: per-vector argmin is a partial-combining min_by aggregate, not a window") {
    val p = plan("q168_centroid_eval")
    assert(p.contains("partial_min_by"),
      s"the argmin must combine map-side before the vec_id shuffle:\n$p")
    assert(!p.contains("Window"),
      s"no window may consume the |corpus|×|classes| scored frame:\n$p")
  }

  test("q94: funnel stage joins reuse the user_id partitioning (no re-exchange per stage)") {
    val p = plan("q94_event_funnel")
    // one scan feeding three stage aggregates + joins on the same key: the
    // physical plan must not exceed one exchange per distinct input branch
    val hashExchanges = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(hashExchanges <= 5, s"funnel re-exchanges per stage ($hashExchanges):\n$p")
  }

  test("q106: passage detection is one explode + one combined aggregate + top-k") {
    val p = plan("q106_dup_passages")
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(p.contains("partial_count"), p)
    // the shingle expression is the native compiled loop, not the HOF chain
    assert(p.contains("word_shingles"), p)
    assert(!p.contains("transform("), p)
  }

  test("q107: interval union rides ONE hash partitioning on user_id end-to-end") {
    val p = plan("q107_interval_union")
    val hashExchanges = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(hashExchanges == 1, s"expected 1 keyed shuffle, got $hashExchanges\n$p")
  }

  test("q109: BM25 stats/df broadcast; top-10 is TakeOrderedAndProject") {
    val p = plan("q109_bm25_topk")
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(p.contains("BroadcastExchange"), p)
    // the term filter lands before the per-(doc,term) aggregate — the
    // inverted-index access path, not a full-vocabulary aggregate
    assert(p.contains("partial_count"), p)
  }

  test("q113: median+MAD+gate ride one partitioning (no per-statistic shuffle)") {
    val p = plan("q113_mad_outliers")
    val hashExchanges = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(hashExchanges == 1, s"expected 1 keyed shuffle, got $hashExchanges\n$p")
  }

  test("q28: simhash pipeline stays out of the interpreted HOF path") {
    // Since the r12 Manku compound-key redesign the fingerprint stage is an
    // EAGER scratch checkpoint (its corpus count picks the subset size j),
    // so the registered query's final plan reads `Scan ExistingRDD` and the
    // native expressions live in the signature stage's own plan — assert
    // each stage where it actually executes.
    val sig = graft.dedup.Dedup
      .simHashesPortable(Tables.load(spark, sf, "documents"))
      .queryExecution.executedPlan.toString
    // portable fingerprint: native md5 shingle hashing + native 60-bit
    // simhash, no interpreted lambda anywhere in the pipeline
    assert(sig.contains("portable_shingle_hashes"), sig)
    assert(sig.contains("portable_simhash60"), sig)
    assert(!sig.contains("lambdafunction"), sig)
    val p = plan("q28_dedup_simhash")
    assert(!p.contains("lambdafunction"), p)
  }

  test("q111: the full-corpus quality gate carries no interpreted HOF lambda") {
    val p = plan("q111_quality_logit")
    assert(!p.contains("lambdafunction"), p)
  }

  test("q114: chunking is a pure generator pipeline — zero keyed shuffles") {
    val p = plan("q114_chunk_documents")
    assert(p.contains("Generate"), p)
    val hashExchanges = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(hashExchanges == 0, s"expected 0 keyed shuffles, got $hashExchanges\n$p")
  }

  test("q119: duplicate filtering is a semi-join on the fingerprint, not a re-compare") {
    val p = plan("q119_chunk_dup_rate")
    assert(p.contains("LeftSemi"), p)
  }

  test("q117: byte-bucket rollup combines map-side before the shuffle") {
    val p = plan("q117_byte_histogram")
    assert(p.contains("partial_count"), p)
  }

  // an AQE-finalized plan prints Final AND Initial sections — node counts
  // must look at the final section only or every operator double-counts
  private def finalSection(p: String): String =
    p.split("== Initial Plan ==").head

  test("q125: the corpus side of batch kNN is never broadcast — only the batch is") {
    val df = SparkEntry.queries("q125_batch_knn")(spark, sf)
    df.collect()
    val p = finalSection(df.queryExecution.executedPlan.toString)
    // exactly one broadcast exchange: the parameter-sized query batch;
    // a second one would mean the corpus got shipped to every executor
    val b = "BroadcastExchange".r.findAllIn(p).length
    assert(b == 1, s"expected exactly 1 broadcast (the batch), got $b:\n$p")
    // the per-query top-10 pre-prunes map-side (rank-limit pushdown), so
    // only ≤ 10·|batch| rows per partition survive to the rnk window
    assert(p.contains("WindowGroupLimit"), s"rank-limit pushdown missing:\n$p")
  }

  test("q126: the whole regression is map-side-combined aggregates (no window, no sort-all)") {
    val p = plan("q126_trend_ols")
    assert(p.contains("partial_"), s"sufficient statistics must combine map-side:\n$p")
    assert(!p.contains("Window"), s"OLS must not need a window pass:\n$p")
  }

  test("q129: model training carries no global single-partition exchange") {
    // the temporal cut is a plain aggregate; a global rank statistic would
    // plan Exchange SinglePartition + a global Sort — the banned shape
    val p = finalSection(plan("q129_markov_eval"))
    // the only single-partition exchanges allowed are the 1-row temporal-cut
    // aggregate's finalize stages (map-combined partial_min/partial_max —
    // one per consumer branch); a global rank cut would instead plan a
    // single-partition SORT over the events, the banned shape
    val sp = "Exchange SinglePartition".r.findAllIn(p).length
    val scalarAggs = "partial_min\\(tms".r.findAllIn(p).length
    assert(sp == scalarAggs,
      s"single-partition exchanges ($sp) beyond the scalar cut aggregates ($scalarAggs):\n$p")
    assert(!p.contains("Sort [tms"), s"no global time sort may exist:\n$p")
  }

  test("q145: pair instances are semi-joined against frequent pairs before the third item") {
    val df = SparkEntry.queries("q145_triple_itemsets")(spark, sf)
    df.collect()
    val p = finalSection(df.queryExecution.executedPlan.toString)
    // the a-priori prune must plan as a LeftSemi, never materialize the
    // frequent-pair set as a column join
    assert(p.contains("LeftSemi"), s"a-priori semi-join missing:\n$p")
  }

  test("q149: path attribution is one window pass — no purchase×touch join anywhere") {
    val p = finalSection(plan("q149_path_attribution"))
    // the only join allowed is the converted-users LeftSemi gate; a
    // purchase×touch join would be the quadratic shape the design bans
    val joins = "Join".r.findAllIn(p).length
    val semis = "LeftSemi".r.findAllIn(p).length
    assert(semis >= 1 && joins == semis,
      s"expected only the converted-user semi gate, got $joins joins ($semis semi):\n$p")
    assert(p.contains("Window"), s"the ordinal window must exist:\n$p")
  }

  test("q144: the encoder is a narrow map — no join against a vocabulary table") {
    val df = SparkEntry.queries("q144_bpe_encode")(spark, sf)
    df.collect()
    val p = finalSection(df.queryExecution.executedPlan.toString)
    assert(!p.contains("Join"),
      s"the merge table must ride as literals, not join as data:\n$p")
    assert(p.contains("partial_"), s"token economics must combine map-side:\n$p")
  }

  test("q140/q142: rank statistics aggregate by value before any window pass") {
    // the scale contract of the evaluation family: the window input is the
    // grouped (value-domain) frame, so a HashAggregate must sit BELOW every
    // Window in the plan tree (textually: aggregate appears after/inside)
    Seq("q140_auc_ranksum", "q142_ks_distance").foreach { name =>
      val p = finalSection(plan(name))
      assert(p.contains("Window"), s"$name: window missing:\n$p")
      assert(p.contains("partial_sum") || p.contains("partial_count"),
        s"$name: value-domain pre-aggregation must combine map-side:\n$p")
    }
  }

  test("runtime bloom-filter pruning injects on a selective dim → fact shuffle join") {
    // At 100 TB a selective dimension filter should prune the fact scan
    // BEFORE the shuffle — Spark's runtime bloom filter does exactly that.
    // The fixture is far below the default application-side threshold
    // (10 GB), so lower it to prove the rewrite fires; production inputs
    // cross the default on their own.
    import org.apache.spark.sql.functions.col
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
      "spark.sql.autoBroadcastJoinThreshold").map(k => k -> conf.get(k))
    try {
      conf.set("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force a shuffle join
      val l = Tables.load(spark, sf, "lineitem")
      val p = Tables.load(spark, sf, "part").filter(col("p_size") > 48)
      val j = l.join(p, l("l_partkey") === p("p_partkey")).groupBy("p_brand").count()
      j.collect()
      val plan = j.queryExecution.executedPlan.toString
      assert(plan.contains("might_contain"),
        s"expected a runtime bloom filter on the fact side:\n$plan")
    } finally saved.foreach { case (k, v) => conf.set(k, v) }
  }

  test("q175: both RRF legs are TakeOrderedAndProject(50) with windows above the limits") {
    val p = plan("q175_rrf_fusion")
    assert(p.contains("TakeOrderedAndProject(limit=50"),
      s"each leg's top-50 must plan per-partition heaps:\n$p")
    // both rank windows must consume a 50-row prefix, never a corpus-sized
    // frame: every Window node must appear ABOVE (print before) some
    // TakeOrderedAndProject(limit=50)
    val lastWindow = p.lastIndexOf("Window")
    val lastTop50 = p.lastIndexOf("TakeOrderedAndProject(limit=50")
    assert(lastWindow >= 0 && lastTop50 > lastWindow,
      s"a rank window consumes an unlimited frame:\n$p")
    assert(p.contains("TakeOrderedAndProject(limit=10"),
      s"the fused top-10 must be a limit, not a global sort:\n$p")
  }

  test("q178: centroids broadcast; the E-step argmin combines map-side") {
    val p = plan("q178_kmeans_round")
    assert(p.contains("partial_min_by"),
      s"the assignment argmin must combine before the vec_id shuffle:\n$p")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"),
      s"the |classes|-row centroid frame must broadcast:\n$p")
    assert(!p.contains("Window"),
      s"no window may touch the |corpus|×|classes| scored frame:\n$p")
  }

  test("q180: the LIMIT-bounded vocabulary broadcasts against the token stream") {
    val p = plan("q180_oov_rate")
    assert(p.contains("TakeOrderedAndProject(limit=20"),
      s"the vocabulary cut must plan per-partition heaps:\n$p")
    assert(p.contains("BroadcastHashJoin"),
      s"the 20-row vocabulary must broadcast — never shuffle the token stream:\n$p")
  }

  test("q179: the closed 1024-bucket feature model broadcasts; no corpus-side broadcast") {
    val p = plan("q179_dsir_weights")
    assert(p.contains("BroadcastHashJoin"),
      s"the ≤1024-row count model must broadcast against the bigram stream:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"nothing in the scoring path may shuffle-join the corpus:\n$p")
  }

  test("q177/q181: intake audits are single-scan map-combined aggregates") {
    for (q <- Seq("q177_padding_waste", "q181_documents_audit")) {
      val p = plan(q)
      assert(p.contains("partial_count") || p.contains("partial count"),
        s"$q must combine map-side before its one shuffle:\n$p")
      assert(!p.contains("Join"), s"$q must not join anything:\n$p")
      assert(!p.contains("Window"), s"$q must not window anything:\n$p")
      val scans = p.split("Scan parquet").length - 1
      assert(scans == 1, s"$q must scan the corpus exactly once, saw $scans:\n$p")
    }
  }

  test("q182: windows run over the bounded bin frame, after the corpus collapses") {
    val p = plan("q182_score_percentiles")
    // parents print first: every Window must sit ABOVE the HashAggregate
    // that collapses documents into (source, bin) cells
    val aggIdx = p.lastIndexOf("HashAggregate")
    val winIdx = p.lastIndexOf("Window")
    assert(winIdx >= 0 && aggIdx > winIdx,
      s"a window consumes pre-aggregate (fact-scale) rows:\n$p")
    val scans = p.split("Scan parquet").length - 1
    assert(scans == 1, s"one corpus pass expected, saw $scans:\n$p")
  }

  test("q183: the survivor argmax is a partial-combining max_by, not a rank window") {
    val p = plan("q183_quality_dedup")
    assert(p.contains("partial_max_by"),
      s"the per-cluster argmax must combine map-side:\n$p")
    assert(!p.contains("Window"),
      s"no rank window may shuffle the full cluster membership:\n$p")
  }

  test("q186: the per-source top-3 plans a WindowGroupLimit map-side prune") {
    val p = plan("q186_boilerplate")
    assert(p.contains("WindowGroupLimit"),
      s"the rank-limited window must pre-prune per partition:\n$p")
    assert(p.contains("Partial") && p.contains("Final"),
      s"the group limit must run in both partial and final mode:\n$p")
  }

  test("q188/q194: corpus-health rollups are join-free single-scan aggregates") {
    for (q <- Seq("q188_dup_inflation", "q194_lexical_hhi")) {
      val p = plan(q)
      val scans = p.split("Scan parquet").length - 1
      assert(scans == 1, s"$q must scan the corpus exactly once, saw $scans:\n$p")
      assert(!p.contains("Join"), s"$q must not join anything:\n$p")
    }
  }

  test("q192/q198: skew profiles broadcast their 1-row population stats") {
    for (q <- Seq("q192_skew_profile", "q198_shard_balance")) {
      val p = plan(q)
      assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"),
        s"$q's population stats must broadcast, never shuffle-join:\n$p")
      assert(!p.contains("SortMergeJoin"),
        s"$q must not shuffle-join anything:\n$p")
    }
    // the top-10 key cut is a limit, not a global sort
    val p = plan("q192_skew_profile")
    assert(p.contains("TakeOrderedAndProject"),
      s"the hot-key cut must plan per-partition heaps:\n$p")
  }

  test("q199: rank windows consume the hourly aggregate, never raw events") {
    val p = plan("q199_hourly_anomaly")
    // parents print first: every Window must sit ABOVE the HashAggregate
    // that collapses events into hours
    val aggIdx = p.lastIndexOf("HashAggregate")
    val winIdx = p.lastIndexOf("Window")
    assert(winIdx >= 0 && aggIdx > winIdx,
      s"a window consumes pre-aggregate (event-scale) rows:\n$p")
  }

  test("q196: the survival rollup carries no window — conditional-min aggregates only") {
    val p = plan("q196_time_to_convert")
    assert(!p.contains("Window"),
      s"first-view/first-purchase must be min aggregates, not rank windows:\n$p")
    assert(p.contains("partial_min") || p.contains("partial min"),
      s"the conditional mins must combine map-side:\n$p")
  }

  test("q203/q204: repetition gate and int8 calibration are join-free single-scan stacks") {
    for (q <- Seq("q203_repetition_gate", "q204_int8_calibration")) {
      val p = plan(q)
      val scans = p.split("Scan parquet").length - 1
      assert(scans == 1, s"$q must scan the corpus exactly once, saw $scans:\n$p")
      assert(!p.contains("Join"), s"$q must not join anything:\n$p")
      assert(!p.contains("Window"),
        s"$q's maxima are aggregates, not rank windows:\n$p")
    }
  }

  test("q205: the rule sweep is one narrow map — no explode, no join, no window") {
    val p = plan("q205_quality_rules")
    val scans = p.split("Scan parquet").length - 1
    assert(scans == 1, s"one corpus scan, saw $scans:\n$p")
    assert(!p.contains("Generate"),
      s"per-doc flags must not explode the token stream:\n$p")
    assert(!p.contains("Join") && !p.contains("Window"), p)
  }

  test("q206: all water-filling rounds run above ONE corpus aggregate") {
    val p = plan("q206_capped_apportion")
    val scans = p.split("Scan parquet").length - 1
    assert(scans == 1, s"the corpus streams once (q166 contract), saw $scans:\n$p")
    // parents print first: every round's Window sits ABOVE the HashAggregate
    // that collapses the corpus into |sources| rows
    val aggIdx = p.lastIndexOf("HashAggregate")
    val winIdx = p.lastIndexOf("Window")
    assert(winIdx >= 0 && aggIdx > winIdx,
      s"a round's window consumes pre-aggregate (corpus-scale) rows:\n$p")
    assert(!p.contains("Join"), s"rounds are window arithmetic, not joins:\n$p")
  }

  test("q214: the leaderboard window is rank-only so WindowGroupLimit prunes map-side") {
    val p = plan("q214_top_purchases")
    assert(p.contains("WindowGroupLimit"),
      s"rank window must pre-prune to 3 rows per user before the shuffle:\n$p")
    assert(!p.contains("SortMergeJoin") || p.contains("HashAggregate"),
      s"the post-aggregate frames should join small:\n$p")
  }

  test("q215/q216: sketch builders are single-scan join-free bounded aggregates") {
    for (q <- Seq("q215_hll_registers", "q216_bloom_filter")) {
      val p = plan(q)
      val scans = p.split("Scan parquet").length - 1
      assert(scans == 1, s"$q must scan the corpus exactly once, saw $scans:\n$p")
      assert(!p.contains("Join"), s"$q is one map-combined aggregate:\n$p")
      assert(!p.contains("Window"), p)
      assert(p.contains("partial"), s"$q must combine map-side:\n$p")
    }
  }

  test("q232/q233: sketch merges are single-scan join-free bounded aggregates") {
    // the shard/hour stage and the merge are TWO aggregate levels over ONE
    // scan — a join, window, or second scan would mean the merge re-touched
    // data instead of merging sketch cells
    for (q <- Seq("q232_cms_shard_merge", "q233_hll_hour_merge")) {
      val p = plan(q)
      val scans = p.split("Scan parquet").length - 1
      assert(scans == 1, s"$q must scan the corpus exactly once, saw $scans:\n$p")
      assert(!p.contains("Join"), s"$q merges cells, it never joins data:\n$p")
      assert(!p.contains("Window"), p)
      assert(p.contains("partial"), s"$q must combine map-side:\n$p")
    }
  }

  test("q235: the per-vector top-5 is a rank-only window — WindowGroupLimit prunes map-side") {
    val p = plan("q235_knn_label_noise")
    assert(p.contains("WindowGroupLimit"),
      s"top-5 must pre-prune to 5 rows per vector before the shuffle:\n$p")
  }

  test("q234: ownership is one fp-keyed aggregate — no window over the chunk stream") {
    val p = plan("q234_passage_dedup")
    assert(!p.contains("Window"),
      s"the min-owner rule must be an aggregate, not a rank window:\n$p")
    assert(p.contains("partial_"), s"owner/spread must combine map-side:\n$p")
  }

  test("q236: shard-local top-20 prunes map-side; the merge is a bounded limit") {
    val p = plan("q236_topk_shard_merge")
    assert(p.contains("WindowGroupLimit"),
      s"the shard-local rank must pre-prune to 20 rows per shard:\n$p")
    assert(p.contains("TakeOrderedAndProject"),
      s"the global cut must be a limit over merged candidates, not a sort:\n$p")
  }

  test("q237: filtered kNN takes the top-10 as a limit with one query-vector broadcast") {
    val df = SparkEntry.queries("q237_filtered_knn")(spark, sf)
    df.collect()
    val p = finalSection(df.queryExecution.executedPlan.toString)
    assert(p.contains("TakeOrderedAndProject"), s"top-10 must not global-sort:\n$p")
    // the 1-row query vector must broadcast; the corpus-shaped candidate
    // gate is free to pick its own strategy at runtime
    assert(p.contains("BroadcastExchange"), s"query vector must broadcast:\n$p")
  }

  test("q211/q224: sketch probes ride broadcast joins, never shuffles") {
    for (q <- Seq("q211_count_min_sketch", "q224_bloom_ingest_gate")) {
      val p = plan(q)
      assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastExchange"),
        s"$q's bounded cell frame must broadcast:\n$p")
      assert(!p.contains("SortMergeJoin") || q == "q224_bloom_ingest_gate",
        s"$q must not shuffle-join the sketch:\n$p")
    }
  }

  test("q217: decay ranking plans per-partition heaps over one aggregate") {
    val p = plan("q217_decayed_popularity")
    assert(p.contains("TakeOrderedAndProject"),
      s"top-20 must be a limit, not a global sort:\n$p")
    assert(!p.contains("Window"), p)
  }

  test("q219: the burstiness lag window is keyed — no unpartitioned window") {
    val p = plan("q219_gap_burstiness")
    assert(p.contains("Window"), p)
    // every Window's partition spec names user_id or event_type — the raw
    // event stream is never funneled through a single partition
    val winLines = p.linesIterator.filter(_.contains("windowspecdefinition")).toSeq
    assert(winLines.nonEmpty &&
      winLines.forall(l => l.contains("user_id") || l.contains("event_type")),
      s"an unkeyed window over raw events:\n$p")
  }

  test("q220: boundary targets attach by broadcast, ECDF runs on the bin frame") {
    val p = plan("q220_range_boundaries")
    assert(p.contains("BroadcastNestedLoopJoin"),
      s"the >= target join must broadcast the literal-sized side:\n$p")
    assert(!p.contains("SortMergeJoin"), p)
    // parents print first: the cumulative Window sits above the bin
    // HashAggregate, never on raw orders
    val aggIdx = p.lastIndexOf("HashAggregate")
    val winIdx = p.lastIndexOf("Window")
    assert(winIdx >= 0 && aggIdx > winIdx,
      s"the ECDF window consumes pre-aggregate rows:\n$p")
  }

  test("AQE skew-join actually rewrites the hot-key support join (q123/q150 shape)") {
    // q123's docstring leaves the pair→per-part-support joins UNHINTED and
    // leans on AQE to split a hot key (and q150's syndication-hub gram is
    // the same case at corpus scale). This pins the claim in CI: a
    // skew-shaped fixture — one part carried by 50k pair rows vs a ~1k-key
    // tail — run under production-proportional thresholds must come back
    // with the skew-split marker in the FINAL adaptive plan, not merely
    // have the rule enabled. Thresholds are scaled to the fixture (64 KB
    // hub partition vs 256 MB default) because AQE's skew test is on
    // absolute shuffle-partition bytes; the factor-vs-median trigger is
    // the same code path at any scale.
    import org.apache.spark.sql.functions._
    val keys = Seq(
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.autoBroadcastJoinThreshold")
    val saved = keys.map(k => k -> spark.conf.getOption(k)).toMap
    try {
      spark.conf.set(keys(0), "65536")  // hub partition ≈ 1 MB ≫ 64 KB
      spark.conf.set(keys(1), "16384")  // split target: ~16 KB slices
      spark.conf.set(keys(2), "-1")     // force SMJ: a broadcast of the
      spark.conf.set(keys(3), "-1")     //   support side would hide skew
      val pairs = spark.range(60000).select(
        when(col("id") < 50000, lit(7L))
          .otherwise(col("id") % 997 + 10).as("part_a"),
        col("id").as("part_b"))
      val support = spark.range(1200)
        .select(col("id").as("part_a"), (col("id") * 5).as("n_a"))
      val joined = pairs.join(support, "part_a")
      // AQE decides from MEASURED sizes, so THIS queryExecution must run
      // (a .count() would execute a different QueryExecution and leave the
      // inspected one un-finalized)
      joined.queryExecution.toRdd.count()
      val p = joined.queryExecution.executedPlan.toString
      assert(p.contains("isFinalPlan=true"), p)
      assert(p.contains("skew=true"),
        s"hot-key join partition was not skew-split:\n$p")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("q207: each power-iteration round is one scan against a literal v — no join") {
    // the returned frame is round 3; rounds 1–2 ran as parameter fetches
    val p = plan("q207_power_iteration")
    val scans = p.split("Scan parquet").length - 1
    assert(scans == 1, s"M·v is one corpus pass, saw $scans:\n$p")
    assert(!p.contains("Join"),
      s"v must ride as a literal array, never a join:\n$p")
    // the normalization window consumes the |dims|-row aggregate only
    val aggIdx = p.lastIndexOf("HashAggregate")
    val winIdx = p.lastIndexOf("Window")
    assert(winIdx >= 0 && aggIdx > winIdx,
      s"normalization must sit above the per-dim aggregate:\n$p")
  }

  test("q241: CDC chunking shuffles only for the presentation sort") {
    val p = plan("q241_cdc_chunks")
    // allowed exchanges: the parallelized() round-robin read guard and the
    // ORDER BY's range partitioning — never a hash (data) shuffle
    assert(!p.contains("Exchange hashpartitioning"),
      s"chunking must be one narrow pass, saw a data shuffle:\n$p")
    val ranges = p.split("Exchange rangepartitioning").length - 1
    assert(ranges == 1,
      s"exactly one presentation sort expected, saw $ranges:\n$p")
  }

  test("q243: both width rankings ride ONE qid exchange; batch broadcasts") {
    val p = plan("q243_trunc_dim_recall")
    val qidShuffles = p.split("Exchange hashpartitioning\\(qid").length - 1
    assert(qidShuffles == 1,
      s"full+truncated rankings must share one qid shuffle, saw $qidShuffles:\n$p")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"),
      s"the parameter-sized batch must broadcast:\n$p")
  }

  test("q246: the rewrite survives a count-shaped plan (no join elimination)") {
    // the r12 lesson: count() references no output columns, and a left join
    // whose right keys are unique is then ELIMINATED — benching the docs
    // scan instead of the excision. The no-op fingerprint filter must keep
    // the span subtree in the optimized count plan.
    val counted = SparkEntry.queries("q246_dup_span_excision")(spark, sf)
      .groupBy().count()
    val p = counted.queryExecution.executedPlan.toString
    assert(p.contains("Join"),
      s"count() plan lost the excision join — bench would time the scan:\n$p")
    assert(p.split("Scan parquet").length - 1 >= 2,
      s"span pipeline missing from the counted plan:\n$p")
  }

  test("q244: span mining never cartesians and top-20 never global-sorts") {
    val p = plan("q244_max_dup_span")
    assert(!p.contains("CartesianProduct"),
      s"anchor pairing must stay fp-keyed:\n$p")
    assert(p.contains("TakeOrderedAndProject"),
      s"top-20 must not global-sort:\n$p")
  }

  test("q251: FK audit anti-joins stay key-only; dim parents broadcast") {
    val p = plan("q251_fk_integrity")
    assert(p.contains("LeftAnti"), s"orphan detection must be an anti-join:\n$p")
    assert(p.contains("BroadcastHashJoin"),
      s"dim-parent edges must broadcast:\n$p")
    assert(!p.contains("CartesianProduct"),
      s"only one-row aggregate combines may nest-loop:\n$p")
    // every child scan reads ONLY its fk column — the audit must never
    // drag full fact rows through the anti-join
    assert(p.contains("ReadSchema: struct<l_orderkey:bigint>") ||
      p.contains("ReadSchema: struct<l_orderkey:int>"),
      s"lineitem scan not pruned to the fk column:\n$p")
  }

  test("q28: band self-join is a pinned shuffle-hash — never a broadcast of the corpus-derived side") {
    // r13 optimizer-hazard pin: Generate does not scale size estimates, so
    // Catalyst statically broadcast the exploded side off the checkpointed
    // per-doc frame's stats. A corpus-derived build side must never
    // broadcast; the pinned SHUFFLE_HASH keeps the hash probe with the
    // co-partitioned scale shape.
    val p = plan("q28_dedup_simhash")
    assert(p.contains("ShuffledHashJoin"),
      s"band join must be the pinned shuffle-hash:\n$p")
    assert(!p.contains("BroadcastHashJoin"),
      s"no side of the band join is broadcast-safe at scale:\n$p")
  }

  test("q252: containment never cartesians; anchors gate the pair join") {
    val p = plan("q252_containment_dedup")
    assert(!p.contains("CartesianProduct"),
      s"candidate discovery must stay anchor-keyed:\n$p")
    assert(p.contains("TakeOrderedAndProject"),
      s"top-20 must not global-sort:\n$p")
  }

  test("q253: the diff is ONE doc_id-keyed full-outer join plus a combined rollup") {
    val p = plan("q253_snapshot_diff")
    assert(p.contains("FullOuter"), s"diff must be a full-outer join:\n$p")
    assert("FullOuter".r.findAllIn(p).length == 1,
      s"exactly one corpus-sized join belongs here:\n$p")
    assert(p.contains("partial_count"),
      s"the (source, status) rollup must combine map-side:\n$p")
  }

  test("q254: stage 1 is a candidate-bounded TakeOrderedAndProject, zero corpus shuffles") {
    // the two-stage rerank contract: the corpus-sized stage must be one
    // narrow scan + top-50, with the greedy loop on the bounded candidates
    val q = graft.ann.PortableAnn.quantized(
      Tables.load(spark, sf, "embeddings"))
    val (qv, qn) = graft.ann.PortableAnn.queryVec(q, 0L)
    val stage1 = q.filter(org.apache.spark.sql.functions.col("vec_id") =!= 0L)
      .withColumn("dot", org.apache.spark.sql.functions.call_function(
        "dot_i64", org.apache.spark.sql.functions.col("qv"),
        org.apache.spark.sql.functions.typedlit(qv.toSeq)))
      .withColumn("qn", org.apache.spark.sql.functions.lit(qn))
      .withColumn("rel", graft.ann.PortableAnn.cosPpmScore("dot", "nrm", "qn"))
      .orderBy(org.apache.spark.sql.functions.desc("rel"),
        org.apache.spark.sql.functions.col("vec_id"))
      .limit(50)
    val p = stage1.queryExecution.executedPlan.toString
    assert(p.contains("TakeOrderedAndProject"),
      s"candidate generation must not global-sort:\n$p")
    assert(!p.contains("Exchange hashpartitioning"),
      s"candidate generation must not shuffle the corpus:\n$p")
  }

  test("q249: LM joins broadcast, one doc-keyed shuffle, top-15 never global-sorts") {
    val p = plan("q249_lm_quality")
    // the trigram LM is charset^3-bounded — it must broadcast, never
    // shuffle the exploded corpus for the lookup
    assert(p.contains("BroadcastHashJoin"), s"LM lookup must broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"corpus-side trigram rows must never sort-merge:\n$p")
    // r12 verdict: the LM must never materialize on the driver — a
    // collected LM shows up as a LocalTableScan build side; the fixed plan
    // broadcasts the scratch-checkpointed LM frame instead
    assert(!p.contains("LocalTableScan"),
      s"LM must stay distributed (no driver collect):\n$p")
    // doc-keyed data shuffles: the scoring aggregation only (the LM build's
    // trigram-keyed agg is bounded-domain, not doc-keyed)
    val docShuffles = p.split("Exchange hashpartitioning\\(doc_id").length - 1
    assert(docShuffles == 1,
      s"scoring must aggregate on ONE doc_id exchange, saw $docShuffles:\n$p")
    assert(p.contains("partial_count"),
      s"per-doc aggregation must combine map-side:\n$p")
    assert(p.contains("TakeOrderedAndProject"),
      s"top-15 must not global-sort:\n$p")
    // the q241 generator lesson holds here: no inferred size()>0 filter may
    // re-evaluate the trigram array inside the scan
    assert(!p.contains("Filter (size(transform"),
      s"inferred generator filter de-vectorizes the scan:\n$p")
  }

  test("q297: refresh is pure map-combined aggregates — no join, no window, split filters at the scan") {
    val p = plan("q297_mv_refresh")
    assert(p.contains("partial_count") && p.contains("partial_sum"),
      s"MV legs must combine map-side:\n$p")
    assert(!p.contains("Join"), s"the merge is a union-aggregate, never a join:\n$p")
    assert(!p.contains("Window"), s"no window anywhere in a rollup refresh:\n$p")
    // the base/delta split predicates must reach the scans as data filters
    assert(p.contains("div 86400000) < 9862") &&
      p.contains("div 86400000) >= 9862"),
      s"split-day predicates must evaluate at the scan:\n$p")
  }

  test("q298: allocation broadcasts; the rank window sees only threshold survivors") {
    val p = plan("q298_stratified_sample")
    assert(p.contains("BroadcastHashJoin"),
      s"the |sources|-row allocation must broadcast:\n$p")
    // the scale shortcut: the survivor filter (h * n_s < 2^32 * 4 * k_s)
    // must exist, and the source-keyed rank window must sit ABOVE it in
    // the plan text (Spark prints consumers before producers)
    val filterAt = p.indexOf("* 17179869184)") // 2^32 * Oversample(4)
    val windowAt = p.indexOf("row_number()")
    assert(filterAt >= 0, s"survivor threshold filter missing:\n$p")
    assert(windowAt >= 0 && windowAt < filterAt,
      s"rank window must consume the filtered frame, not the corpus:\n$p")
  }

  test("q299: sketch cells and the probe aggregate combine map-side; the cell table broadcasts") {
    val p = plan("q299_countmin_audit")
    assert(p.contains("partial_sum"), s"cells must combine map-side:\n$p")
    assert(p.contains("BroadcastHashJoin"),
      s"the bounded d*w cell table must broadcast to the 20 probes:\n$p")
    assert(p.contains("TakeOrderedAndProject"),
      s"the exact top-20 must never global-sort:\n$p")
  }

  test("q300: the corpus-scaled word table is joined UNHINTED (no forced broadcast)") {
    // the word table is m/63 rows with m adaptive to the known-set size —
    // corpus-scaled at 100 TB. AQE may legitimately broadcast the tiny
    // fixture table; what must NOT appear is a PLANNED broadcast hint,
    // which would pin the strategy at every scale. The logical plan
    // carries hints verbatim — assert none.
    spark.catalog.clearCache()
    val lp = SparkEntry.queries("q300_bloom_gate")(spark, sf)
      .queryExecution.analyzed.toString
    assert(!lp.contains("UnresolvedHint") && !lp.contains("ResolvedHint"),
      s"q300 joins must stay unhinted:\n${lp.take(3000)}")
  }

  test("fallback sweep: no custom CodegenFallback; built-ins pinned to a whitelist") {
    // The de-vectorization pin (r14 verdict #1), in two legs:
    //
    // STATIC (this sweep): no CUSTOM (graft-package) expression anywhere in
    // any registered query's physical plan is a CodegenFallback node — the
    // class that embeds an interpreted eval call inside a generated stage
    // and silently boxes the hot path (the q288 Morton-expression lesson
    // class). Custom logic must ride expressions with real doGenCode
    // (plans/*Expressions.scala); for graft classes, zero means zero.
    // SPARK-BUILT-IN CodegenFallback expressions are a different matter:
    // Spark itself ships every higher-order function (transform/zip_with/
    // filter/aggregate — the idioms this engine is MANDATED to prefer over
    // UDFs) and every imperative aggregate (collect_list/collect_set/
    // percentile_approx/approx_count_distinct/pivot/typed Aggregator) as
    // CodegenFallback; they cannot be avoided without abandoning the
    // built-in operator set. Those are pinned by CLASS-set EQUALITY below,
    // so a new interpreted built-in cannot drift into the surface without
    // a conscious whitelist update here. (Until r16 this sweep ran on the
    // raw executedPlan, which under AQE is a leaf AdaptiveSparkPlanExec
    // wrapper — TreeNode.collect never descended, so the old "zero
    // CodegenFallback anywhere" claim was vacuous for every
    // exchange-containing query; ADVICE r16 #1. PlanWalk now unwraps AQE
    // and subquery plans, and this is what the real surface contains.)
    //
    // RUNTIME (the engine session): spark.sql.codegen.fallback=false in
    // Engine.session turns a janino compile failure on ANY query into a
    // hard error instead of a silent interpreted stage — QueriesSmokeSpec
    // executes every registered query under it, so a plan too large to
    // compile can no longer stay green while de-vectorized. The two
    // deliberately-interpreted HOF REFERENCE paths live in DedupSpec and
    // opt back in via TestSpark.withCodegenFallback.
    import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
    import org.apache.spark.sql.execution.SparkPlan
    assert(TestSpark.spark.conf.get("spark.sql.codegen.fallback") == "false",
      "the engine session must be strict — a compile failure must throw")
    spark.catalog.clearCache()
    // Spark-built-in interpreted expression classes this surface is ALLOWED
    // to contain, each with why it is irreducible:
    //  - lambda/HOF machinery (ArrayTransform, ArrayFilter, ArrayExists,
    //    ArrayAggregate, ArraySort, ZipWith, MapFilter, LambdaFunction,
    //    NamedLambdaVariable): Spark's higher-order functions — the
    //    mandated idiom for per-row array math (dot products, chunk maps);
    //    all extend CodegenFallback upstream. Hot ANN distance loops
    //    already ride custom codegen'd expressions; these remain on
    //    bounded per-row arrays.
    //  - imperative aggregates (CollectList, CollectSet, PivotFirst,
    //    ApproximatePercentile, HyperLogLogPlusPlus, ScalaAggregator):
    //    TypedImperativeAggregate subclasses — buffer-object aggregates
    //    Spark evaluates interpreted by design (ScalaAggregator is the
    //    declared §2.10 typed-Aggregator showcase, q73).
    val builtinFallbackWhitelist = Set(
      "ArrayAggregate", "ArrayExists", "ArrayFilter", "ArraySort",
      "ArrayTransform", "ZipWith", "MapFilter", "LambdaFunction",
      "NamedLambdaVariable",
      "CollectList", "CollectSet", "PivotFirst", "ApproximatePercentile",
      "HyperLogLogPlusPlus", "ScalaAggregator")
    // walk through the AQE wrapper AND into subquery plans: with AQE on
    // (the engine default) executedPlan is an AdaptiveSparkPlanExec LEAF —
    // TreeNode.collect sees only the wrapper, so a naive sweep passes
    // vacuously for every exchange-containing query (ADVICE r16 #1); and
    // Expression.collect does not walk a PlanExpression's embedded plan,
    // so a CodegenFallback inside a scalar/IN subquery would also escape
    // (review finding r15). PlanWalk descends through both.
    def fallbacks(plan: SparkPlan): Seq[(String, Boolean)] =
      graft.tools.PlanWalk.allNodes(plan).flatMap(
        _.expressions.flatMap(_.collect {
          case e: CodegenFallback =>
            (e.getClass.getSimpleName,
              e.getClass.getName.startsWith("graft."))
        }))
    // second pin riding the SAME construction pass: every SINGLE-PARTITION
    // window (empty or literal-only partition spec — both move all rows to
    // one partition) must belong to a declared bounded-frame query. The
    // whitelist is asserted by EQUALITY, so adding OR removing a global
    // window anywhere forces a conscious update here. Every entry's frame
    // is bounded by construction: dim tables (q15/q23/q24/q25),
    // LIMIT-bounded candidate lists (q93/q142/q153/q175/q218/q229),
    // |sources|/|types|/vocab-bounded rollups (q91/q116/q156/q166/q199/
    // q206/q209/q220/q281/q292/q298), |items|-bounded fits (q296), the
    // 64-cell bootstrap (q291), and the |dims|-row power iteration (q207).
    val globalWindowWhitelist = Set(
      "q116_share_of_total", "q142_ks_distance", "q153_ndcg",
      "q156_jackknife_langid", "q15_surrogate_key", "q166_token_apportion",
      "q175_rrf_fusion", "q199_hourly_anomaly", "q206_capped_apportion",
      "q207_power_iteration", "q209_heaps_growth", "q218_rerank_agreement",
      "q220_range_boundaries", "q229_retrieval_diversity",
      "q23_dim_category", "q24_dim_product", "q25_fact_orders",
      "q281_temperature_mix", "q291_ab_experiment", "q292_watermark_sizing",
      "q296_bt_convergence", "q298_stratified_sample", "q91_heavy_hitters",
      "q93_vocab_coverage")
    // third and fourth pins on the same pass: no CartesianProductExec
    // node and no ScalaUDF expression anywhere (custom logic must ride
    // native codegen'd expressions; parameter-frame crossJoins plan as
    // BroadcastNestedLoopJoin, never a shuffled cartesian)
    def badNodes(plan: SparkPlan): Seq[String] = {
      val nodes = graft.tools.PlanWalk.allNodes(plan)
      val cart = nodes.collect {
        case _: org.apache.spark.sql.execution.joins.CartesianProductExec =>
          "CartesianProduct"
      }
      val udfs = nodes.flatMap(_.expressions.flatMap(_.collect {
        case _: org.apache.spark.sql.catalyst.expressions.ScalaUDF =>
          "ScalaUDF"
      }))
      cart ++ udfs
    }
    val globalWindows = scala.collection.mutable.Set.empty[String]
    val builtinFallbacks = scala.collection.mutable.Set.empty[String]
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        val plan = fn(spark, sf).queryExecution.executedPlan
        if (graft.tools.GlobalWindowProbe.hasGlobalWindow(plan))
          globalWindows += name
        val (custom, builtin) = fallbacks(plan).distinct.partition(_._2)
        builtinFallbacks ++= builtin.map(_._1)
        val hits = (custom.map(_._1) ++ badNodes(plan)).distinct
        if (hits.isEmpty) Nil else Seq(s"$name -> ${hits.mkString(",")}")
    }
    assert(offenders.isEmpty,
      "custom CodegenFallback / CartesianProduct / ScalaUDF in registered " +
        s"plans:\n${offenders.mkString("\n")}")
    assert(builtinFallbacks.toSet == builtinFallbackWhitelist,
      "the set of Spark-built-in interpreted expression classes changed — " +
        "a new CodegenFallback built-in must be consciously declared (with " +
        "its why) and a vanished one removed:\n" +
        s"unexpected: ${(builtinFallbacks.toSet -- builtinFallbackWhitelist).toSeq.sorted}\n" +
        s"missing: ${(builtinFallbackWhitelist -- builtinFallbacks).toSeq.sorted}")
    assert(globalWindows.toSet == globalWindowWhitelist,
      "single-partition windows changed — new offenders must be " +
        "bounded-frame by construction and declared here; dropped ones " +
        "must leave the whitelist:\n" +
        s"unexpected: ${(globalWindows.toSet -- globalWindowWhitelist).toSeq.sorted}\n" +
        s"missing: ${(globalWindowWhitelist -- globalWindows).toSeq.sorted}")
  }
}
