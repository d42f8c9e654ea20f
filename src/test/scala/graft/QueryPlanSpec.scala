package graft

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.exchange.Exchange
import org.apache.spark.sql.execution.joins.{BroadcastHashJoinExec, BroadcastNestedLoopJoinExec}

/** Physical-plan contracts for the scale-sensitive queries: the plans
  * the scale notes promise are asserted here, so a regression that adds
  * a shuffle or drops a broadcast fails CI, not a cluster run. Uses the
  * pre-AQE sparkPlan (AQE wraps the executed tree). */
class QueryPlanSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def plan(name: String): SparkPlan =
    SparkEntry.queries(name)(spark, dir).queryExecution.sparkPlan

  /** Post-EnsureRequirements tree (sparkPlan has no exchanges yet);
    * unwraps the AQE shell. */
  private def executed(name: String): SparkPlan =
    SparkEntry.queries(name)(spark, dir).queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan
      case other => other
    }

  private def count(p: SparkPlan, pred: SparkPlan => Boolean): Int =
    p.collect { case n if pred(n) => n }.size

  test("q03: dimension join is broadcast (no shuffle of the fact side for the join)") {
    assert(count(plan("q03_broadcast_join"),
      _.isInstanceOf[BroadcastHashJoinExec]) === 1)
  }

  test("q53: df side of the tf/df join is broadcast") {
    assert(count(plan("q53_distinctive_terms"),
      _.isInstanceOf[BroadcastHashJoinExec]) === 1)
  }

  test("q56: vocab join is broadcast") {
    assert(count(plan("q56_vocab_oov"),
      _.isInstanceOf[BroadcastHashJoinExec]) === 1)
  }

  test("q59: interval join is broadcast nested-loop (tiny dim, non-equi)") {
    assert(count(plan("q59_interval_join"),
      _.isInstanceOf[BroadcastNestedLoopJoinExec]) === 1)
  }

  test("q60: native as-of exec with exactly one exchange per side + output sort") {
    val p = executed("q60_asof_native")
    assert(count(p, _.isInstanceOf[graft.plans.AsOfJoinExec]) === 1)
    // 2 key exchanges (one per side) + the final orderBy range exchange
    assert(count(p, _.isInstanceOf[Exchange]) === 3, p.toString)
  }

  test("q39: union+window as-of runs ONE key shuffle") {
    val p = executed("q39_asof_join")
    // 1 hash exchange for the window + 1 range exchange for the orderBy
    assert(count(p, _.isInstanceOf[Exchange]) === 2, p.toString)
  }

  test("q38: sessionize runs ONE key shuffle") {
    val p = executed("q38_sessionize")
    // window exchange + final orderBy range exchange; the two
    // aggregations after the window reuse the window partitioning
    assert(count(p, _.isInstanceOf[Exchange]) <= 3, p.toString)
  }

  test("q80: benchmark side broadcasts; the corpus side never shuffles for the join") {
    assert(count(plan("q80_decontamination"),
      _.isInstanceOf[BroadcastHashJoinExec]) === 1)
  }

  test("q89: both tiny aggregates broadcast back onto the corpus pass") {
    // target (1 row) joins per-source rates; rates join the doc scan
    assert(count(plan("q89_domain_mix"),
      p => p.isInstanceOf[BroadcastHashJoinExec] ||
        p.isInstanceOf[BroadcastNestedLoopJoinExec]) === 2)
  }

  test("q90: top-k UDAF aggregates partially (map-side) before the shuffle") {
    val p = executed("q90_topk_udaf")
    val aggs = p.collect {
      case a: org.apache.spark.sql.execution.aggregate.ObjectHashAggregateExec => a
      case a: org.apache.spark.sql.execution.aggregate.SortAggregateExec => a
    }
    // partial + final pair ⇒ shuffle carries ≤ k values per group,
    // not every row (the whole point of the bounded-buffer aggregate)
    assert(aggs.size >= 2, p.toString)
    assert(count(p, _.isInstanceOf[Exchange]) <= 2, p.toString)
  }

  test("q86: packing has NO window at all — keyed two-pass prefix sum") {
    // TrainPrep.pack's per-source cumsum is GlobalRank
    // .withKeyedPrefixSum (range-partition on (source, id) + broadcast
    // segment offsets): a PARTITION BY source window — the previous
    // shape — sorts each source's ENTIRE extent in one task, and the
    // corpus has only a handful of sources. The physical plan must
    // carry no WindowExec anywhere (the cumsum lives in the RDD
    // two-pass below the plan's LogicalRDD boundary).
    val p = executed("q86_seq_packing")
    assert(count(p,
      _.isInstanceOf[org.apache.spark.sql.execution.window.WindowExec]) === 0,
      p.toString)
  }

  test("pack/withKeyedPrefixSum: range shuffle only — no per-key one-task sort") {
    // the operator-level form of the q86 assertion: the sorted pass
    // under the keyed two-pass is a RANGE repartition on (key, id)
    // with local sorts — never a global sort, never a window
    val spark = this.spark
    import spark.implicits._
    val packed = graft.ext.TrainPrep.pack(
      queries.Tables.load(spark, dir, "documents"),
      "doc_id", "source", "text", tokenCap = 512)
    val p = packed.queryExecution.executedPlan
    assert(count(p,
      _.isInstanceOf[org.apache.spark.sql.execution.window.WindowExec]) === 0,
      p.toString)
    assert(count(p, {
      case s: org.apache.spark.sql.execution.SortExec => s.global
      case _ => false
    }) === 0, p.toString)
    // and the two-pass really distributes: the sorted RDD under pack
    // spreads the corpus across the session's shuffle partitions, with
    // every source spanning >1 partition (no per-key concentration)
    val parts = packed.rdd.getNumPartitions
    assert(parts > 1, s"keyed two-pass collapsed to $parts partition(s)")
  }

  test("q92: TWA runs ONE key shuffle (window + agg share the partitioning)") {
    val p = executed("q92_time_weighted_avg")
    // 1 hash exchange on user_id (window reuses it for the groupBy)
    // + 1 range exchange for the output orderBy
    assert(count(p, _.isInstanceOf[Exchange]) === 2, p.toString)
  }

  test("q100: training-prep keeps only the fp-keyed window; source cumsum is keyed two-pass") {
    // the md5-fingerprint dedup window stays windowed (high-cardinality
    // key — distributes fine); the per-SOURCE cumsum moved to
    // GlobalRank.withKeyedPrefixSum, so the final (post-RDD-boundary)
    // plan shows no window at all and just the agg + output-sort
    // exchanges. The fp window and the scan-side quality filter live
    // below the RDD boundary — their shapes are pinned by the q86/pack
    // operator specs and the fp window's own key cardinality.
    val p = executed("q100_training_prep")
    assert(count(p,
      _.isInstanceOf[org.apache.spark.sql.execution.window.WindowExec]) === 0,
      p.toString)
    assert(count(p, _.isInstanceOf[Exchange]) <= 2, p.toString)
  }

  test("q108: regression panel is ONE hash-agg pass — a single key shuffle") {
    val p = executed("q108_corr_regression")
    // partial agg before the exchange, final after; + output sort exchange
    assert(count(p, _.isInstanceOf[Exchange]) === 2, p.toString)
    val aggs = p.collect {
      case a: org.apache.spark.sql.execution.aggregate.HashAggregateExec => a
    }
    assert(aggs.size === 2, "partial+final hash agg expected")
  }

  test("q114: CDC merge is one full-outer sort-merge join, no extra shuffles") {
    val p = executed("q114_merge_cdc")
    val joins = p.collect {
      case j: org.apache.spark.sql.execution.joins.SortMergeJoinExec => j
      case j: org.apache.spark.sql.execution.joins.ShuffledHashJoinExec => j
    }
    assert(joins.size === 1, s"exactly one keyed join:\n$p")
    assert(joins.head.joinType.toString === "FullOuter")
  }

  test("q111: BM25 df and corpus stats broadcast onto the tf side") {
    val p = plan("q111_bm25")
    assert(count(p, _.isInstanceOf[BroadcastHashJoinExec]) >= 1, p.toString)
    assert(count(p, _.isInstanceOf[BroadcastNestedLoopJoinExec]) === 1,
      "1-row corpus stats join is a broadcast cross join")
  }

  test("q116: gap fill runs keyed windows only — one user shuffle") {
    val p = executed("q116_gap_fill")
    // user_id hash exchange (both window fns share it) + output sort
    assert(count(p, _.isInstanceOf[Exchange]) === 2, p.toString)
  }

  test("q158: no window exec and no global sort anywhere (prefix-sum AUC)") {
    // The AUC ranks come from GlobalRank.withPrefixSum — an unpartitioned
    // Window.orderBy cumsum (the first cut) moved the whole distinct-score
    // domain through ONE task; for real-valued classifier scores that
    // domain ≈ the row count. The physical plan must contain no WindowExec
    // at all and no global (cross-partition) sort.
    val p = executed("q158_exact_auc")
    assert(count(p,
      _.isInstanceOf[org.apache.spark.sql.execution.window.WindowExec]) === 0,
      p.toString)
    assert(count(p, {
      case s: org.apache.spark.sql.execution.SortExec => s.global
      case _ => false
    }) === 0, p.toString)
  }

  test("q99/q137: no window anywhere — ntile and per-bucket cumsum are GlobalRank") {
    // ntile(k) OVER (ORDER BY …) funnels the whole table through one
    // task; both equi-depth queries rank via GlobalRank.withNtile.
    // q137's per-bucket batch cumsum (10 buckets — low cardinality)
    // runs through withKeyedPrefixSum, so NO WindowExec remains at all.
    for (name <- Seq("q99_equidepth_hist", "q137_length_bucket_batching")) {
      val p = executed(name)
      assert(count(p,
        _.isInstanceOf[org.apache.spark.sql.execution.window.WindowExec]) === 0,
        s"$name:\n$p")
    }
  }

  test("q197: no single-task and no per-source window anywhere in the megapipe") {
    // stage 5's downsample rank runs through GlobalRank.withKeyedRank;
    // the remaining windows (if any stage plans one) must be keyed by
    // something with corpus-scale cardinality — never unpartitioned and
    // never partitioned SOLELY by the handful-valued source column,
    // the two shapes that funnel a 100 TB corpus into a few tasks.
    val p = executed("q197_megapipeline")
    val offenders = p.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec
        if w.partitionSpec.isEmpty ||
          w.partitionSpec.forall {
            case a: org.apache.spark.sql.catalyst.expressions.AttributeReference =>
              a.name == "source"
            case _ => false
          } => w
    }
    assert(offenders.isEmpty, s"q197:\n$p")
  }

  test("q161/q162: every window is keyed (doc/group partitionSpec)") {
    // dupSpans' islands windows are doc_id-keyed; weightedSample's
    // top-k window is group-keyed AND gets WindowGroupLimit partial
    // top-k pushed below the group shuffle. Neither may ever plan an
    // unpartitioned (one-task) window.
    for (name <- Seq("q161_dup_spans", "q162_weighted_sample")) {
      val p = executed(name)
      val unpartitioned = p.collect {
        case w: org.apache.spark.sql.execution.window.WindowExec
          if w.partitionSpec.isEmpty => w
      }
      assert(unpartitioned.isEmpty, s"$name:\n$p")
    }
    val limits = executed("q162_weighted_sample").collect {
      case w: org.apache.spark.sql.execution.window.WindowGroupLimitExec => w
    }
    assert(limits.nonEmpty, "q162 lost the WindowGroupLimit top-k pushdown")
  }

  test("q166: posting cap is a WindowGroupLimit below the token shuffle") {
    // the inverted index caps posting lists BEFORE collect_list via a
    // token-keyed row_number filter — the physical plan must carry the
    // WindowGroupLimit rewrite (map tasks forward <= cap rows/token)
    // and no unpartitioned window anywhere.
    val p = executed("q166_inverted_index")
    val limits = p.collect {
      case w: org.apache.spark.sql.execution.window.WindowGroupLimitExec => w
    }
    assert(limits.nonEmpty, s"q166 lost the WindowGroupLimit rewrite:\n$p")
    val unpartitioned = p.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec
        if w.partitionSpec.isEmpty => w
    }
    assert(unpartitioned.isEmpty, s"q166:\n$p")
  }

  test("q164: JL projection plans shuffle-free until the 16-group agg") {
    // quantize + sign-project are per-row expressions over the scan;
    // the ONLY exchanges allowed are the final tiny aggregations
    // (16-group agg + 1-row norm agg + broadcast), never a row-keyed
    // repartition of the embeddings themselves.
    val p = executed("q164_jl_projection")
    val exchanges = p.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
    }
    assert(exchanges.length <= 3,
      s"q164 grew unexpected shuffles (${exchanges.length}):\n$p")
  }

  test("q171: ONE exchange, no windows, no global sort (fused rank+prefix sum)") {
    // Rank and the relevance prefix sum both come from ONE
    // GlobalRank.withRankAndPrefixSum pass (range shuffle + zip in the
    // RDD layer); the only SQL-visible exchange is the final 1-row
    // aggregate's. A window-based AP would show a WindowExec and a
    // SinglePartition funnel here.
    val p = executed("q171_average_precision")
    assert(count(p,
      _.isInstanceOf[org.apache.spark.sql.execution.window.WindowExec]) === 0,
      p.toString)
    assert(count(p, {
      case s: org.apache.spark.sql.execution.SortExec => s.global
      case _ => false
    }) === 0, p.toString)
    assert(count(p, _.isInstanceOf[Exchange]) === 1, p.toString)
  }

  test("q174: only the bounded power-of-two frame funnels (1 exchange)") {
    // The corpus-sized token frame is ranked by GlobalRank (RDD layer);
    // the lone exchange is the SinglePartition feed of the ~log2(V)-row
    // sampled frame into the lag window. Ranking with a plain
    // row_number() window would add a second exchange and move the
    // WHOLE token frame through it.
    val p = executed("q174_zipf_profile")
    assert(count(p, _.isInstanceOf[Exchange]) === 1, p.toString)
    assert(count(p,
      _.isInstanceOf[org.apache.spark.sql.execution.window.WindowExec]) === 1,
      p.toString)
  }

  test("q173: pair grid broadcasts; no window anywhere in the JS matrix") {
    val p = executed("q173_source_js_divergence")
    assert(count(p, _.isInstanceOf[BroadcastNestedLoopJoinExec]) >= 1,
      p.toString)
    assert(count(p,
      _.isInstanceOf[org.apache.spark.sql.execution.window.WindowExec]) === 0,
      p.toString)
  }

  test("q183: bigram LM is joins+aggs only — no window anywhere") {
    // training counts, model expansion, and scoring are all keyed
    // aggs/joins on the bigram-type frame; a window appearing here
    // would mean someone reintroduced per-doc sequential scoring
    val p = executed("q183_bigram_lm")
    assert(count(p,
      _.isInstanceOf[org.apache.spark.sql.execution.window.WindowExec]) === 0,
      p.toString)
  }

  test("q184: bloom probes ride broadcast nested-loop joins (no fact shuffle to probe)") {
    // every mightContain probe crossJoins the ONE packed sketch row —
    // must plan as BroadcastNestedLoopJoin so the probe is evaluated
    // in the fact scan stage; only the maybe-subset anti join may
    // shuffle fact rows
    val p = executed("q184_bloom_prune")
    assert(count(p, _.isInstanceOf[BroadcastNestedLoopJoinExec]) >= 3,
      p.toString)
    assert(count(p,
      _.isInstanceOf[org.apache.spark.sql.execution.window.WindowExec]) === 0,
      p.toString)
  }

  test("q185: rank windows sit strictly above bounded (limited) inputs") {
    // rrfFuse assigns ranks with an unpartitioned window — legal ONLY
    // because its inputs are already top-k lists; assert every
    // WindowExec has a limit operator somewhere beneath it, so a
    // corpus-sized frame can never reach the single-task rank
    val p = executed("q185_rrf_hybrid")
    val windows = p.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }
    assert(windows.nonEmpty, "q185 lost its rank windows entirely")
    windows.foreach { w =>
      val bounded = w.find {
        case _: org.apache.spark.sql.execution.GlobalLimitExec => true
        case _: org.apache.spark.sql.execution.TakeOrderedAndProjectExec => true
        case _: org.apache.spark.sql.execution.LocalLimitExec => true
        case _ => false
      }
      assert(bounded.nonEmpty,
        s"q185 window over an unbounded input:\n$w")
    }
  }

  test("q192: DSIR selection is joins+aggs with a TakeOrdered top-k — no window, no global sort") {
    val p = executed("q192_dsir_selection")
    assert(count(p,
      _.isInstanceOf[org.apache.spark.sql.execution.window.WindowExec]) === 0,
      p.toString)
    assert(count(p,
      _.isInstanceOf[org.apache.spark.sql.execution.TakeOrderedAndProjectExec]) === 1,
      p.toString)
    assert(count(p, {
      case s: org.apache.spark.sql.execution.SortExec => s.global
      case _ => false
    }) === 0, p.toString)
  }

  test("q02: filter and projection reach the parquet scan") {
    val scans = plan("q02_filter_project").collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }
    assert(scans.nonEmpty)
    val scan = scans.head
    assert(scan.metadata("PushedFilters").contains("GreaterThan"),
      scan.metadata("PushedFilters"))
    assert(scan.schema.fieldNames.length <= 5,
      s"column pruning lost: ${scan.schema.fieldNames.mkString(",")}")
  }

  test("refineExact: shortlist broadcasts; corpus side never sort-merges") {
    import spark.implicits._
    val e = graft.queries.Tables.load(spark, dir, "embeddings")
    val qRow = e.filter($"vec_id" === 0)
      .select($"embedding").head().getSeq[Float](0).toArray
    val p = graft.ext.VectorIndex
      .refineExact(e.filter($"vec_id" < 20).select($"vec_id"), e,
        "embedding", "vec_id", qRow, k = 10)
      .queryExecution.sparkPlan
    assert(count(p, _.isInstanceOf[BroadcastHashJoinExec]) === 1, p.toString)
    assert(count(p,
      _.isInstanceOf[org.apache.spark.sql.execution.joins.SortMergeJoinExec])
      === 0, p.toString)
  }

  test("binarySearch: one pass, no exchange — scan straight into top-k") {
    import spark.implicits._
    val e = graft.queries.Tables.load(spark, dir, "embeddings")
    val qRow = e.filter($"vec_id" === 0)
      .select($"embedding").head().getSeq[Float](0).toArray
    val p = graft.ext.VectorIndex
      .binarySearch(e, "embedding", "vec_id", qRow, k = 10)
      .queryExecution.sparkPlan
    assert(count(p,
      _.isInstanceOf[org.apache.spark.sql.execution.TakeOrderedAndProjectExec])
      === 1, p.toString)
    assert(count(p, _.isInstanceOf[Exchange]) === 0, p.toString)
  }

  test("q210: datasheet's majority-language join broadcasts onto the summary") {
    assert(count(plan("q210_datasheet"),
      _.isInstanceOf[BroadcastHashJoinExec]) >= 1)
  }

  test("q244: Spearman's statistic plan never re-reads the corpus — " +
    "the one documents scan ran inside the eager pair-histogram " +
    "fold, so zero parquet scans (and no corpus-side join) remain") {
    val p = plan("q244_spearman_rho")
    assert(count(p,
      _.isInstanceOf[org.apache.spark.sql.execution.FileSourceScanExec])
      === 0, p.toString)
  }

  test("q253: MWU folds from the value histogram — NO join returns " +
    "to the corpus (the r15 broadcast-OOM dilemma is structural, " +
    "not gated)") {
    val p = plan("q253_mann_whitney")
    assert(count(p, _.isInstanceOf[BroadcastHashJoinExec]) === 0,
      p.toString)
    assert(!p.toString.contains("SortMergeJoin"), p.toString)
  }

  test("q256: the k-row coverage lookup broadcasts onto the ranked " +
    "type histogram") {
    assert(count(plan("q256_vocab_coverage"),
      _.isInstanceOf[BroadcastHashJoinExec]) >= 1)
  }

  test("q254: row/column marginals broadcast back onto the cell frame") {
    assert(count(plan("q254_chi2_homogeneity"),
      _.isInstanceOf[BroadcastHashJoinExec]) === 2)
  }

  test("q258: the bounded contingency self-join is broadcast " +
    "nested-loop (metadata, never a shuffle)") {
    assert(count(plan("q258_kendall_taub"),
      _.isInstanceOf[BroadcastNestedLoopJoinExec]) >= 1)
  }

  test("q259: the category frame (thresholds, seeds) broadcasts onto " +
    "the coin scan — the n·m·B explode never shuffles") {
    val p = plan("q259_bh_lang_drift")
    assert(count(p, _.isInstanceOf[BroadcastNestedLoopJoinExec]) >= 1,
      p.toString)
  }
}
