package graft

import org.scalatest.funsuite.AnyFunSuite

/** Plan-quality regression net: the properties that make these operators
  * scale are asserted on the actual plans, so a refactor that silently drops
  * a pushdown, broadcasts a fact table, or breaks codegen fails CI.
  */
class PlanSpec extends AnyFunSuite {
  import TestSpark._

  private def planOf(name: String): String = {
    // AQE wraps the plan until runtime; disable it for a static snapshot so
    // codegen/exchange structure is visible
    val prev = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try SparkEntry.queries(name)(spark, sf).queryExecution.executedPlan.toString()
    finally spark.conf.set("spark.sql.adaptive.enabled", prev)
  }
  private def explained(name: String): String = {
    val df = SparkEntry.queries(name)(spark, sf)
    df.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
  }

  test("sweep: no CartesianProduct anywhere; global windows only where bounded by construction") {
    // crossJoin(broadcast(...)) plans as BroadcastNestedLoopJoin (fine: a
    // 1-row total / tiny centroid frame); a true CartesianProduct means a
    // candidate generator lost its equi-key — the classic 100 TB killer.
    // A partition-less Window funnels its input into ONE task, so it is
    // allowed only where the input is bounded by construction (≤ bins /
    // buckets / months / k-row lists — the audited whitelist below); a
    // new query windowing a fact relation globally must fail here.
    // Planning every query also smoke-tests construction end to end.
    // the audited bounded-input global windows (≤ bins / buckets / months
    // / boundary events / k-row ranked lists by construction)
    val globalWindowOk = Set(
      "q73_quantile_sketch", "q77_quantile_sketch_auto", // ≤ bins histogram rows
      "q105_quantile_bucket", "q127_percentile_rank", // ≤ bins cum table
      "q106_skyline", // ≤ bucket suffix-max rows
      "q164_ks_test", // ≤ merged-bin CDF grid
      "q167_mom_growth", // ≤ #months
      "q185_pareto_take", // ≤ bins cum table (ABC boundary)
      "q219_open_orders_curve", // ≤ boundary-event rows
      "q80_hybrid_rrf", // ≤ k-row ranked lists
      "q235_curriculum_shards", // ≤ buckets bucket-offset rows (the data
        // relation itself windows per range-bucket, never globally)
      "q241_sorted_neighborhood", // same skeleton: ≤ #prefix-bucket offset rows
      "q261_neighborhood_pure_sql" // q241's SQL-text twin — the identical
        // bucket-offsets window over the ≤ #prefix-buckets count frame
    )
    // AQE's AdaptiveSparkPlanExec hides the real operators until runtime —
    // disable it so the collect actually sees joins/windows (planOf's rule).
    val prev = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    val offenders =
      try SparkEntry.queries.keys.toSeq.sorted.flatMap { name =>
        try {
          val plan = SparkEntry.queries(name)(spark, sf).queryExecution.executedPlan
          val cartesian = plan.collectWithSubqueries {
            case c: org.apache.spark.sql.execution.joins.CartesianProductExec => c
          }.nonEmpty
          val globalWin = plan.collectWithSubqueries {
            case w: org.apache.spark.sql.execution.window.WindowExec
                if w.partitionSpec.isEmpty => w
          }.nonEmpty
          (if (cartesian) Seq(s"$name: CartesianProduct") else Nil) ++
            (if (globalWin && !globalWindowOk(name))
              Seq(s"$name: partition-less Window outside the bounded whitelist")
            else Nil)
        } catch {
          case e: Throwable => Seq(s"$name: CONSTRUCTION FAILED: ${e.getMessage}")
        }
      } finally spark.conf.set("spark.sql.adaptive.enabled", prev)
    assert(offenders.isEmpty, offenders.mkString("\n"))
  }

  test("q03: filter is pushed to the parquet scan and aggregation is codegen'd") {
    val e = explained("q03_agg_tpch1")
    assert(e.contains("PushedFilters"), "expected PushedFilters section")
    assert(e.contains("LessThanOrEqual(l_shipdate"), "shipdate filter must reach the scan")
    val p = planOf("q03_agg_tpch1")
    // whole-stage codegen stages render as "*(n)" in the compact plan
    assert(p.contains("*(1)"), "agg pipeline must stay in whole-stage codegen")
    assert(p.contains("HashAggregate"), "expected hash aggregation")
    assert(p.contains("partial_sum"), "expected map-side partial aggregation")
  }

  test("q03: scan reads only the needed columns (pruning)") {
    val e = explained("q03_agg_tpch1")
    val readSchema = e.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(!readSchema.contains("l_orderkey"), s"unneeded column read: $readSchema")
    assert(readSchema.contains("l_quantity"))
  }

  test("q14: fixed-size dims are broadcast, never shuffled") {
    val p = planOf("q14_join_broadcast_star")
    assert(p.contains("BroadcastHashJoin"), "dims must broadcast")
  }

  test("q34/q35: near-dup candidate generation is equi-join, not cartesian") {
    Seq("q34_dedup_ngram_jaccard", "q35_dedup_minhash_lsh").foreach { q =>
      val p = planOf(q)
      assert(!p.contains("CartesianProduct"), s"$q must not build all-pairs")
    }
  }

  test("q67/q68: cross-corpus and within-cluster candidates are equi-joins, not cartesian") {
    // q67's pair join is equi on the cluster id, q68's on the LSH band key —
    // corpus×ref / cluster all-pairs must never materialize
    Seq("q67_semantic_dedup", "q68_minhash_against").foreach { q =>
      val p = planOf(q)
      assert(!p.contains("CartesianProduct"), s"$q must not build all-pairs")
    }
  }

  test("q37/q38: per-query top-k is a bounded aggregate, never a full-relation window") {
    // the scored candidate relation has ≤5 distinct query_ids — a
    // Window.partitionBy(query_id) would funnel it into ≤5 tasks (one task
    // sorts ~10⁹ rows at 100×). The plan must show ObjectHashAggregate with
    // map-side partials (the k-bounded TopKByScore buffers) and no window
    // over the scored relation.
    val p37 = planOf("q37_ann_brute")
    assert(!p37.contains("Window"), s"q37 must not window the scored relation:\n$p37")
    assert(p37.contains("ObjectHashAggregate"), "q37 top-k must be an object hash aggregate")
    assert(p37.contains("partial_topkbyscore"), "q37 top-k buffers must combine map-side")
    // q38's only window is probe selection over queries×centroids (≤50 rows
    // by construction); the candidate top-k must be the bounded aggregate
    val p38 = planOf("q38_ann_ivf")
    val w38 = p38.linesIterator.filter(_.contains("windowspecdefinition")).toList
    assert(w38.forall(_.contains("crank")),
      s"q38: only the centroid-probe window may remain:\n${w38.mkString("\n")}")
    assert(p38.contains("partial_topkbyscore"), "q38 top-k buffers must combine map-side")
  }

  test("q97: relational grouped top-k is the bounded aggregate, never a window") {
    // 3 groups over the whole fact table — the worst case for a
    // row_number window (3 tasks would sort everything); the plan must be
    // the same no-straggler shape as the ANN serving path
    val p = planOf("q97_topk_per_group")
    assert(!p.contains("Window"), s"q97 must not window the fact relation:\n$p")
    assert(p.contains("ObjectHashAggregate"), "q97 must be an object hash aggregate")
    assert(p.contains("partial_topkbyscore"), "q97 buffers must combine map-side")
  }

  test("q94: grouped heavy hitters = bounded sketch agg + broadcast recount") {
    val p = planOf("q94_heavy_hitters_grouped")
    assert(p.contains("ObjectHashAggregate"), "sketch pass must be an object hash agg")
    assert(p.contains("partial_misragriesagg"),
      s"sketch buffers must combine map-side:\n$p")
    assert(p.contains("BroadcastHashJoin"),
      "candidate recount must be a broadcast join, never a corpus shuffle")
    assert(!p.contains("Window"), s"no window anywhere in heavy hitters:\n$p")
  }

  test("q96: edit-distance candidates are an equi-join, never all-pairs") {
    val p = planOf("q96_dedup_edit_distance")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"blocked candidates must equi-join on the block key:\n$p")
  }

  test("q12: top-n plans as TakeOrderedAndProject (no full global sort)") {
    val p = planOf("q12_top_n")
    assert(p.contains("TakeOrderedAndProject"), "LIMIT after ORDER BY must avoid a full sort")
  }

  test("q53/q54: text aggregates avoid Expand and hot-key windows") {
    // q53: two-level agg, not countDistinct (whose Expand doubles every gram)
    val p53 = planOf("q53_repetition_ratio")
    assert(!p53.contains("Expand"), "q53 must not plan a distinct-Expand")
    assert(p53.contains("partial_count") || p53.contains("HashAggregate"),
      "q53 must aggregate map-side first")
    // q54: document frequency side must be combiner-friendly aggregates —
    // a Window.partitionBy(s) would land every instance of a hot
    // boilerplate shingle in ONE partition (straggler at corpus scale)
    // (gramRows' per-doc lead window is fine: doc-sized partitions)
    val p54 = planOf("q54_passage_overlap")
    val w54 = p54.linesIterator.filter(_.contains("windowspecdefinition")).toList
    assert(w54.forall(_.contains("doc_id")),
      s"q54 must not window by the shingle key:\n${w54.mkString("\n")}")
    assert(p54.contains("partial_count"),
      "q54 shingle counts must combine map-side")
  }

  test("q33/q49: dedup canonical/winner come from aggregates, not hot-key windows") {
    // q33: a page duplicated millions of times is the hot key; canonical +
    // copy count must be a map-side-combinable groupBy(md5(text)) +
    // join-back, never Window.partitionBy(content hash)
    val p33 = planOf("q33_dedup_exact")
    assert(!p33.contains("Window"), s"q33 must not window the content hash:\n$p33")
    assert(p33.contains("partial_min"), "q33 canonical must combine map-side")
    // q49: winner per near-dup cluster is a min_by aggregate + join-back; a
    // row_number window keyed on canonical_id would serialize a boilerplate
    // mega-cluster through one task. (gramRows' doc-keyed lead window is
    // fine: doc-sized partitions.)
    val p49 = planOf("q49_dedup_keep_best")
    val w49 = p49.linesIterator.filter(_.contains("windowspecdefinition")).toList
    assert(w49.forall(_.contains("doc_id")),
      s"q49 must not window by cluster id:\n${w49.mkString("\n")}")
    assert(p49.contains("partial_min_by"), "q49 winner must combine map-side")
  }

  test("q57: chunk doc frequency is pre-capped + aggregated, never windowed") {
    val p = planOf("q57_boilerplate_removal")
    // hot chunks certified from the doc sample must join back as a
    // broadcast (map-only over the corpus side)
    assert(p.contains("BroadcastHashJoin"), "hot-chunk flag must broadcast")
    // exact df is groupBy(chunk).countDistinct(doc_id) — map-side partials,
    // AQE-splittable join-back; a Window.partitionBy(chunk) would put every
    // copy of a corpus-wide boilerplate chunk in ONE partition
    assert(!p.contains("Window"), "q57 must not window the chunk relation")
  }

  test("q58: term document frequency is a broadcast join-back, not a window") {
    val p = planOf("q58_tfidf_topk")
    assert(p.contains("BroadcastHashJoin"),
      "vocab-sized df counts must broadcast back")
    // exactly one Window remains: the per-doc top-k (doc-sized partitions,
    // bounded); none over the (doc,term) relation partitioned by term alone
    val windows = p.linesIterator.filter(_.contains("Window [")).toList
    assert(windows.size == 1 && windows.head.contains("doc_id"),
      s"only the per-doc rank window may remain, got:\n${windows.mkString("\n")}")
  }

  test("q59: sequence packing is one window pass, no joins or extra shuffles") {
    val p = planOf("q59_pack_sequences")
    assert(!p.contains("Join"), "packing must not join")
    val n = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(n <= 1, s"q59 should shuffle once (per-shard window), got $n:\n$p")
  }

  test("q60: benchmark gram set broadcasts; corpus side never shuffles on grams") {
    val p = planOf("q60_decontaminate")
    assert(p.contains("BroadcastHashJoin"), "bench grams must broadcast")
    assert(!p.contains("SortMergeJoin"), "corpus must not shuffle on the gram key")
  }

  test("q62: quality filter is a pure map (no exchange before the sort)") {
    val p = planOf("q62_quality_filter")
    val n = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(n == 0, s"quality filter must not shuffle, got $n:\n$p")
  }

  test("q250/q251: ingest counters and HLL registers are single-aggregate plans") {
    // q250: map-only classification + ONE partial/final aggregate pair —
    // no join, no window, one exchange of ≤1 row per partition
    val p250 = planOf("q250_ingest_stats")
    assert(!p250.contains("Join") && !p250.contains("Window"),
      s"ingest stats must be a pure aggregate:\n$p250")
    assert("Exchange".r.findAllIn(p250).size == 1,
      s"ingest stats should shuffle exactly once:\n$p250")
    // q251: the scan must read ONLY the hashed column (pruning) and the
    // register build must be the combiner aggregate (partial rows ≤ 2^p
    // per partition), never a window or join
    val e251 = explained("q251_hll_registers")
    assert(e251.contains("ReadSchema: struct<l_orderkey:bigint>"),
      s"register scan must prune to the hashed column:\n$e251")
    val p251 = planOf("q251_hll_registers")
    assert(!p251.contains("Join") && !p251.contains("Window"),
      s"register build must be a pure aggregate:\n$p251")
    assert(p251.contains("HashAggregate"),
      s"register build must hash-aggregate (map-side partials):\n$p251")
  }

  test("q88/q90/q91: graph joins stay equi, unpivot stays map-only, windows are keyed") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // triangleCounts (lazy form): wedge build + closure must be equi-joins —
    // never cartesian/BNLJ — and counting must combine map-side
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (1L, 4L)).toDF("a", "b")
    val pt = operators.Graphs.triangleCounts(edges, "a", "b", materialize = false)
      .queryExecution.executedPlan.toString()
    assert(!pt.contains("Cartesian") && !pt.contains("BroadcastNestedLoop"),
      s"triangle joins must be equi-joins:\n$pt")
    assert(pt.contains("partial_count"), "per-node counts must combine map-side")
    // q90 unpivot: zero shuffles besides the gate's determinism sort
    val p90 = planOf("q90_unpivot")
    val exchanges = p90.linesIterator.count(_.trim.startsWith("+- Exchange"))
    assert(exchanges <= 1, s"unpivot must be map-only (1 sort exchange max):\n$p90")
    // q91: every window is keyed by user_id (calendar-bounded partitions)
    val p91 = planOf("q91_rolling_range")
    val w91 = p91.linesIterator.filter(_.contains("windowspecdefinition")).toList
    assert(w91.nonEmpty && w91.forall(_.contains("user_id")),
      s"rolling windows must partition by the key:\n${w91.mkString("\n")}")
  }

  test("bucketed tables join without any shuffle (co-located fact-fact join)") {
    // the 100 TB fact⋈fact answer: both sides bucketed+sorted on the join
    // key at write time → SortMergeJoin with zero Exchange in the plan
    import org.apache.spark.sql.functions._
    val prev = spark.conf.get("spark.sql.adaptive.enabled", "true")
    val prevBc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    // at test scale the dim side auto-broadcasts, which would hide the
    // bucketing; at fact-fact scale neither side broadcasts — model that
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val li = Tables.lineitem(spark, sf)
        .select(col("l_orderkey"), col("l_quantity"), col("l_extendedprice"))
      val o = Tables.orders(spark, sf)
        .select(col("o_orderkey"), col("o_totalprice"))
      li.write.mode("overwrite")
        .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .saveAsTable("li_bkt")
      o.write.mode("overwrite")
        .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .saveAsTable("o_bkt")
      val joined = spark.table("li_bkt")
        .join(spark.table("o_bkt"), col("l_orderkey") === col("o_orderkey"))
      val p = joined.queryExecution.executedPlan.toString()
      assert(p.contains("SortMergeJoin"), s"expected sort-merge join:\n$p")
      assert(!p.contains("Exchange"), s"bucketed join must not shuffle:\n$p")
      // and it computes the same rows as the shuffled join
      assert(joined.count() == li.join(o, col("l_orderkey") === col("o_orderkey")).count())
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", prev)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBc)
      spark.sql("DROP TABLE IF EXISTS li_bkt")
      spark.sql("DROP TABLE IF EXISTS o_bkt")
    }
  }

  test("partitioned star join prunes partitions dynamically (DPP)") {
    // the 100 TB star-schema answer beyond static pruning: a date/dim-
    // partitioned fact joined through a filtered dim scans only the
    // partitions the dim filter selects — Spark inserts a dynamicpruning
    // subquery on the partition column at planning time
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-dpp").toString
    val li = Tables.lineitem(spark, sf)
      .join(Tables.orders(spark, sf),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("l_orderkey"), col("l_extendedprice"),
        col("o_orderpriority").as("prio"))
    li.write.mode("overwrite").partitionBy("prio").parquet(s"$dir/fact")
    val fact = spark.read.parquet(s"$dir/fact")
    // dim must be a real source with a real filter — a LocalRelation
    // constant-folds its predicate away and DPP's selectivity check
    // never sees one
    Seq(("1-URGENT", 1), ("5-LOW", 5)).toDF("prio", "rank")
      .write.mode("overwrite").parquet(s"$dir/dim")
    val dim = spark.read.parquet(s"$dir/dim")
      .filter(col("rank") === 1) // selective dim filter → prune fact parts
    val joined = fact.join(broadcast(dim), Seq("prio"))
      .agg(sum(col("l_extendedprice")))
    val p = joined.queryExecution.executedPlan.toString()
    assert(p.toLowerCase.contains("dynamicpruning"),
      s"expected a dynamic partition pruning subquery on prio:\n$p")
    assert(joined.collect().nonEmpty)
  }

  test("q116/q120: robust stats join back broadcast; no data-keyed window") {
    for (q <- Seq("q116_outlier_mad", "q120_winsorize")) {
      val p = planOf(q)
      assert(p.contains("BroadcastHashJoin"),
        s"$q: group thresholds must broadcast, not shuffle the fact side:\n$p")
      // the only windows allowed are histQuantiles' bounded (group × bin)
      // cum-sums (absent in q116 entirely)
      if (q == "q116_outlier_mad")
        assert(!p.contains("Window"), s"$q: no window anywhere:\n$p")
    }
  }

  test("q117/q122: exact-moment stats are one partial→final aggregate, no join") {
    for (q <- Seq("q117_group_corr", "q122_group_linfit")) {
      val p = planOf(q)
      assert(p.contains("partial_"), s"$q: moments must combine map-side:\n$p")
      assert(!p.contains("Join"), s"$q: single aggregate, no join:\n$p")
      assert(!p.contains("Window"), s"$q: no window:\n$p")
    }
  }

  test("q118: TWA aggregate reuses the entity window's partitioning") {
    val p = planOf("q118_time_weighted_avg")
    // window (partitionBy user) then groupBy(user): the aggregate must not
    // re-shuffle — exactly one exchange before the final ordering sort
    // (the final orderBy legitimately adds one range exchange — the gate's
    // determinism sort)
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(exchanges == 1, s"expected one hash exchange (window+agg share it):\n$p")
  }

  test("q121: reference broadcasts; corpus argmax is an aggregate, not a window") {
    val p = planOf("q121_semantic_against")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"),
      s"reference set must broadcast:\n$p")
    assert(p.contains("partial_min_by") || p.contains("partial_"),
      s"argmax must combine map-side:\n$p")
    assert(!p.contains("Window"), s"no corpus-keyed window:\n$p")
  }

  test("q156/q173: target-encoding stats broadcast back; no window, map-side partials") {
    for (q <- Seq("q156_target_encode_loo", "q173_mestimate_encode")) {
      val p = planOf(q)
      assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastNestedLoopJoin"),
        s"$q: category stats must broadcast:\n$p")
      assert(p.contains("partial_"), s"$q: stats combine map-side:\n$p")
      assert(!p.contains("Window"), s"$q: no window anywhere:\n$p")
    }
  }

  test("q184: decay attribution is windowless combiner aggregates") {
    val p = planOf("q184_attribution_decay")
    assert(!p.contains("Window"), s"no window anywhere:\n$p")
    assert(p.contains("partial_"), s"credit sums combine map-side:\n$p")
  }

  test("q185: pareto prefix sum windows are bin-partitioned, never global over entities") {
    val p = planOf("q185_pareto_take")
    // the big within-bin window must carry the __bin partition key; the
    // only unpartitioned window is the ≤bins-row offset frame
    assert(p.contains("windowspecdefinition(__bin"),
      s"within-bin window must partition by __bin:\n$p")
  }

  test("q201: Q6 predicates all reach the scan; projection prunes to 4 columns") {
    val e = explained("q201_tpch6_forecast_revenue")
    assert(e.contains("PushedFilters"), "expected PushedFilters section")
    assert(e.contains("GreaterThanOrEqual(l_discount,0.05"),
      "discount lower bound must reach the scan")
    assert(e.contains("LessThan(l_quantity,24"),
      "quantity bound must reach the scan")
    val readSchema = e.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(!readSchema.contains("l_orderkey"), s"unneeded column read: $readSchema")
    val p = planOf("q201_tpch6_forecast_revenue")
    assert(p.contains("partial_sum"), "expected map-side partial aggregation")
  }

  test("q202/q209: Q2 eligible pipeline runs once; Q21 lone-late pass is all equi-joins, no windows") {
    Seq("q202_tpch2_min_cost_supplier", "q209_tpch21_waiting_suppliers").foreach { q =>
      val p = planOf(q)
      assert(!p.contains("CartesianProduct"), s"$q: cartesian product in plan")
    }
    // q202's per-part min is a window over ONE eligible pipeline (round-17
    // optimization: the groupBy-min + join-back shape ran the supplier/
    // nation/region join chain twice and shuffle-joined eligible to
    // itself). The window is l_partkey-keyed — bounded by the suppliers
    // of one part, never global — and every base table is scanned once.
    val q2 = planOf("q202_tpch2_min_cost_supplier")
    assert(q2.contains("Window"), "q202: per-part min must be a window, not join-back")
    assert(!q2.contains("SortMergeJoin"),
      s"q202: the eligible⋈best self-join is gone; dims broadcast:\n$q2")
    assert("Scan parquet".r.findAllIn(q2).size == 5,
      s"q202: every base table exactly once (5 scans):\n$q2")
    // Q21 stays the aggregate formulation — no window
    assert(!planOf("q209_tpch21_waiting_suppliers").contains("Window"),
      "q209: expected aggregate formulation, not a window")
    // Q21's final top-20 must not globally sort the full supplier set
    assert(planOf("q209_tpch21_waiting_suppliers").contains("TakeOrderedAndProject"),
      "q209 limit must plan as TakeOrderedAndProject")
  }

  test("q204: Q11 share threshold is a 1-row broadcast over the part rollup") {
    val p = planOf("q204_tpch11_important_stock")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"),
      "global total must broadcast back")
    assert(!p.contains("CartesianProduct"), "no cartesian: total side is broadcast")
  }

  test("q207: Q19 pushes the brand/size disjunction into the part scan") {
    val e = explained("q207_tpch19_disjunct_revenue")
    assert(e.contains("And(EqualTo(p_brand,Brand#12)"),
      "OR-of-brand/size conjunctions must reach the part scan as a pushed filter")
    assert(e.contains("And(GreaterThanOrEqual(l_quantity,1.0)"),
      "the quantity disjunction must reach the lineitem scan too")
  }

  test("q211/q216/q217: SCD2 as-of is one keyed pass; centroids aggregate map-side; FK audit anti-joins broadcast") {
    val asOf = planOf("q211_scd2_point_in_time")
    assert(!asOf.contains("CartesianProduct"), "q211: cartesian in plan")
    val cent = planOf("q216_group_centroids")
    assert(!cent.contains("Window") && !cent.contains("Join"),
      s"q216 must be explode → aggregate only:\n$cent")
    assert(cent.contains("partial_count") || cent.contains("partial_sum"),
      "q216: expected map-side partial aggregation")
    val fk = planOf("q217_fk_orphan_audit")
    assert(!fk.contains("SortMergeJoin"),
      s"q217: key-only audits must broadcast, not shuffle:\n$fk")
    // round-17 single-pass shape: one child scan per FK edge (left-outer
    // probe + conditional count), not COUNT(child) ⨯ COUNT(anti-join) —
    // 7 edges, each child + parent scanned exactly once = 14 scans total
    assert(!fk.contains("BroadcastNestedLoopJoin"),
      s"q217: the per-edge count crossJoins are gone:\n$fk")
    val fkScans = "Scan parquet".r.findAllIn(fk).size
    assert(fkScans <= 14,
      s"q217: at most one child + one parent scan per edge ($fkScans > 14; " +
        s"the old two-pass shape had 21):\n$fk")
  }

  test("q139/q162: both ranking metrics come from ONE materialized fact rollup") {
    // round-17: ranking golden and candidate from separate groupBys
    // aggregated lineitem once per consumer (3 passes); the shared
    // localCheckpoint'd rollup runs the fact pass exactly once — the
    // consumers must scan the snapped RDD, never lineitem again. (A
    // lazily shared aggregate does NOT lock this: column pruning splits
    // it back into per-metric aggregates — measured round 17.)
    Seq("q139_recall_at_k", "q162_mrr").foreach { q =>
      val p = planOf(q)
      assert(!p.contains("Scan parquet"),
        s"$q: consumers must read the materialized rollup, not re-scan the fact table:\n$p")
      assert(p.contains("Scan ExistingRDD"),
        s"$q: expected the localCheckpoint'd rollup scan:\n$p")
    }
  }

  test("q239: affinity stats and scoring share ONE materialized (doc, bucket) rollup") {
    // round-18: the bucket-stats and scoring consumers used to each
    // re-derive the corpus gram relation (two tokenize+hash passes; a
    // lazy shared aggregate gets split back by column pruning — verified
    // on the --exec final plan). The snapped per-(doc, bucket) rollup
    // runs the gram pass exactly once; both consumers read the snap.
    val p = planOf("q239_target_affinity")
    assert(!p.contains("Scan parquet"),
      s"q239: consumers must read the materialized rollup, not re-scan documents:\n$p")
    assert(p.contains("Scan ExistingRDD"),
      s"q239: expected the localCheckpoint'd rollup scan:\n$p")
  }

  test("q270/q271: tempered mix/epochs broadcast the class frame; corpus never shuffles pre-aggregate") {
    // q270: the threshold frame is a #classes-row BROADCAST join (round 16
    // replaced a folded CASE chain that blew up codegen at high class
    // cardinality) and the keep decision adds no window or corpus shuffle
    // before the summary aggregate
    val p270 = planOf("q270_temperature_mix")
    assert(p270.contains("BroadcastHashJoin"),
      s"q270: thresholds must broadcast-join:\n$p270")
    assert(!p270.contains("Window"), s"q270: no window:\n$p270")
    // q271: ONE corpus-wide class aggregate (shares) — the epoch plan
    // replays the collected stats as a LocalTableScan instead of paying a
    // second corpus aggregate — and the plan broadcasts into the map-only
    // epoch expansion
    val p271 = planOf("q271_tempered_epochs")
    assert(p271.contains("LocalTableScan"),
      s"q271: plan stats must come from the collected local frame:\n$p271")
    assert(p271.contains("BroadcastHashJoin"),
      s"q271: the epoch plan must broadcast into the corpus:\n$p271")
    // exactly ONE parquet scan of documents in the returned plan: the
    // shares/stats pass already ran at plan-build (the #classes-row
    // collect), so the materialization is the only remaining corpus read —
    // a second scan here would mean the epoch plan re-aggregated the
    // corpus instead of replaying the collected stats
    assert("documents\\.parquet".r.findAllIn(p271).size == 1,
      s"q271: materialize is the only corpus scan in the plan:\n$p271")
    assert(!p271.contains("Window"), s"q271: no window:\n$p271")
  }

  test("q163/q169: chi-square cells collapse map-side; joins are broadcasts") {
    for (q <- Seq("q163_chi_square", "q169_ab_test")) {
      val p = planOf(q)
      assert(p.contains("partial_"), s"$q: cell counts combine map-side:\n$p")
      assert(!p.contains("SortMergeJoin"),
        s"$q: tiny stat frames must broadcast, not SMJ:\n$p")
    }
  }
}
