package graft.plans

import graft.olist.SparkTestBase

/** Central plan-shape contracts: the physical-plan properties
  * SCALING.md claims for the engine's headline shapes, asserted so a
  * regression (a dropped broadcast hint, a pruning-defeating select,
  * a PrefixScan reverted to a global window) fails the suite instead
  * of silently shipping. Complements the per-feature specs
  * (TopKPerKeySpec, DotProductRewriteSpec, AqeOpsSpec) with the
  * engine-wide basics. */
class PlanContractsSpec extends SparkTestBase {

  import org.apache.spark.sql.execution.SparkPlan
  import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}

  private val sf = "/root/testdata/sf0.001"
  private def planOf(name: String): String =
    graft.SparkEntry.queries(name)(spark, sf).queryExecution.executedPlan.toString

  /** Collect matching nodes INCLUDING through adaptive and cache
    * wrappers: SparkPlan.collect does not descend into
    * AdaptiveSparkPlanExec / QueryStageExec, and an op that
    * sharedCache()s an intermediate hides that subtree behind an
    * InMemoryTableScanExec — a plain collect sees only the wrappers,
    * which turns "no WindowExec" assertions into vacuous passes and
    * "find the join" into List(). */
  private def deepCollect[T](p: SparkPlan)(pf: PartialFunction[SparkPlan, T]): Seq[T] = {
    val here = if (pf.isDefinedAt(p)) Seq(pf(p)) else Nil
    val kids = p match {
      case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
      case q: QueryStageExec => Seq(q.plan)
      case c: org.apache.spark.sql.execution.columnar.InMemoryTableScanExec =>
        Seq(c.relation.cachedPlan)
      case _ => p.children
    }
    here ++ kids.flatMap(deepCollect(_)(pf))
  }

  test("limit-topk: ORDER BY+LIMIT plans as TakeOrderedAndProject, no global sort") {
    val p = planOf("limit-topk")
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("agg-topk: column pruning reaches the lineitem scan") {
    // assert on the FileSourceScanExec node's requiredSchema, not the
    // rendered plan string — Spark truncates long lines ("... N more
    // fields"), which would let a pruning regression pass a ':'-count
    val df = graft.SparkEntry.queries("agg-topk")(spark, sf)
    val scans = deepCollect(df.queryExecution.executedPlan) {
      case s: org.apache.spark.sql.execution.FileSourceScanExec
          if s.relation.location.rootPaths.exists(_.toString.contains("lineitem")) => s
    }
    assert(scans.nonEmpty, df.queryExecution.executedPlan.toString)
    scans.foreach { s =>
      val n = s.requiredSchema.fields.length
      // 4 of lineitem's 11+ columns: the two grouping keys + price + discount
      assert(n <= 4, s"expected <=4 read columns, got $n: ${s.requiredSchema.simpleString}")
    }
  }

  test("layout-overlap-depth: zone computation leaves no unpartitioned WindowExec") {
    // r9's one defect: two full-corpus ntile(32) global sorts. Now ported
    // to PrefixScan (ntileSpans histogram spans + distributed rank); the
    // only window left is the sweepline over <=33 zone events per layout,
    // partitioned by layout.
    val df = graft.SparkEntry.queries("layout-overlap-depth")(spark, sf)
    val unpart = deepCollect(df.queryExecution.executedPlan) {
      case w: org.apache.spark.sql.execution.window.WindowExec
          if w.partitionSpec.isEmpty => w
    }
    assert(unpart.isEmpty,
      "layout-overlap-depth must compute zones via PrefixScan, not a global window")
  }

  test("join-left-translate: dim-sized side broadcasts") {
    val p = planOf("join-left-translate")
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("agg-bradford-zones: PrefixScan leaves no WindowExec in the plan") {
    val df = graft.SparkEntry.queries("agg-bradford-zones")(spark, sf)
    val wins = deepCollect(df.queryExecution.executedPlan) {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }
    assert(wins.isEmpty,
      "the supplier-frame prefix sum must run through PrefixScan, not a window")
  }

  test("dedup-minhash-lsh: pair generation is an equality join on (band, bk), never corpus²") {
    // THE scale claim the dedup family rests on: pairwise work is
    // confined to LSH bucket-mates, so the only self-join is keyed on
    // the band-bucket columns. A corpus² regression would appear as a
    // cartesian/nested-loop join or an equality join on other keys.
    import org.apache.spark.sql.execution.joins.{BaseJoinExec, BroadcastNestedLoopJoinExec, CartesianProductExec}
    val p = graft.SparkEntry.queries("dedup-minhash-lsh")(spark, sf).queryExecution.executedPlan
    val unbounded = deepCollect(p) {
      case j: BroadcastNestedLoopJoinExec => j
      case j: CartesianProductExec => j
    }
    assert(unbounded.isEmpty, s"corpus²-shaped join in the LSH plan:\n$p")
    // every join in the pipeline must be an EQUALITY join (bounded by
    // its hash keys), and the pair-generation join specifically must
    // key on exactly (band, bk). The walk descends cached subtrees, so
    // it also sees the upstream shingle build's content_hash keeper
    // join — an equality join, allowed; what it must never see is a
    // join whose keys are empty (theta/cross) or a pair join on
    // anything other than the band-bucket columns.
    val joins = deepCollect(p) { case j: BaseJoinExec => j }
    assert(joins.nonEmpty, p.toString)
    joins.foreach { j =>
      assert(j.leftKeys.nonEmpty,
        s"non-equality join in the LSH plan:\n$j")
    }
    val keySets = joins.map(_.leftKeys.flatMap(_.references).map(_.name).toSet)
    assert(keySets.contains(Set("band", "bk")),
      s"LSH pair join keyed on (band, bk) not found; joins key on $keySets:\n$p")
  }

  test("ann-ivf: probe join is centroid-bucketed with the query side broadcast") {
    // The IVF scale claim: probe work = per-cell candidates against a
    // BROADCAST query table, keyed on the centroid assignment — the
    // shuffle moves cell ids, never |queries| × |corpus|.
    import org.apache.spark.sql.execution.joins.BroadcastHashJoinExec
    val p = graft.SparkEntry.queries("ann-ivf")(spark, sf).queryExecution.executedPlan
    val probe = deepCollect(p) {
      case j: BroadcastHashJoinExec
          if j.leftKeys.flatMap(_.references).map(_.name).toSet == Set("centroid_id") => j
    }
    assert(probe.nonEmpty,
      s"expected a broadcast hash join keyed on centroid_id:\n$p")
  }

  test("dedup-semdedup: centroid assignment broadcasts, pair join keys on the cluster") {
    // The SemDeDup scale claim: assignment is a broadcast of the (tiny)
    // centroid table against the corpus — never a shuffle of the corpus
    // onto centroids — and pairwise pruning shuffles on the cluster key
    // only, so per-cell work is bounded by cell population.
    import org.apache.spark.sql.execution.joins.{BaseJoinExec, BroadcastNestedLoopJoinExec}
    val p = graft.SparkEntry.queries("dedup-semdedup")(spark, sf).queryExecution.executedPlan
    val bcast = deepCollect(p) { case j: BroadcastNestedLoopJoinExec => j }
    assert(bcast.nonEmpty, s"expected the broadcast centroid cross join:\n$p")
    val clusterKeyed = deepCollect(p) {
      case j: BaseJoinExec
          if j.leftKeys.flatMap(_.references).map(_.name).contains("cluster") => j
    }
    assert(clusterKeyed.nonEmpty,
      s"expected the pair join keyed on the cluster assignment:\n$p")
  }

  test("win-ewma-irregular: keyed window only, top-k merge instead of global sort") {
    val df = graft.SparkEntry.queries("win-ewma-irregular")(spark, sf)
    val unpart = deepCollect(df.queryExecution.executedPlan) {
      case w: org.apache.spark.sql.execution.window.WindowExec
          if w.partitionSpec.isEmpty => w
    }
    assert(unpart.isEmpty, "the max-date window must stay partitioned on the key")
    assert(df.queryExecution.executedPlan.toString.contains("TakeOrderedAndProject"),
      "the top-20 must merge per-partition heaps, not sort globally")
  }

  test("win-topk-per-key: the custom TopKPerKey physical operator is planned") {
    val p = planOf("win-topk-per-key")
    assert(p.contains("TopKPerKey"), p)
  }

  test("filt-range: predicate pushdown reaches the scan") {
    val p = planOf("filt-range")
    assert(p.contains("PushedFilters: [") && !p.contains("PushedFilters: []"), p)
  }

  test("sink-bucketed-join benchmark pair: SMB join is exchange-free, raw twin is not") {
    import org.apache.spark.sql.functions._
    import graft.ops.Tables._
    // bucketed side: building the op runs ensureBucketed, then joins the
    // bucketed tables with a merge hint. The join keys must arrive
    // pre-partitioned AND pre-sorted: no Exchange on either input.
    val p = planOf("sink-bucketed-join")
    assert(p.contains("SortMergeJoin"), p)
    assert(!p.contains("Exchange hashpartitioning(l_orderkey") &&
      !p.contains("Exchange hashpartitioning(o_orderkey"),
      s"bucketed join must not shuffle its inputs:\n$p")
    assert(p.contains("Bucketed: true"), p)

    // raw twin: the same merge join over the plain parquet MUST shuffle
    // both sides — this is the exchange the bucketing pays once to
    // delete from every subsequent join ("bucket once, join forever")
    val raw = lineitem(spark, sf).select(col("l_orderkey"), col("l_extendedprice"))
      .hint("merge")
      .join(orders(spark, sf).select(col("o_orderkey"), col("o_orderstatus")),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderstatus").agg(count(lit(1)).as("n"))
    val rawPlan = raw.queryExecution.executedPlan.toString
    assert(rawPlan.contains("Exchange hashpartitioning(l_orderkey") &&
      rawPlan.contains("Exchange hashpartitioning(o_orderkey"),
      s"raw merge join should shuffle both inputs:\n$rawPlan")
  }

  test("agg-mv-delta-refresh: split filters push to the scans, merge is full outer on the key") {
    val df = graft.SparkEntry.queries("agg-mv-delta-refresh")(spark, sf)
    val p = df.queryExecution.executedPlan
    // ONLY the delta agg may touch the orders fact at query time (with
    // the o_orderdate split pushed); the MV side reads its bucketed
    // store — an orders scan there means the refresh rescans the whole
    // fact, the exact thing IVM exists to avoid. (r12: was 2 scans when
    // the MV was recomputed per query; the bucketed store removed one.)
    val scans = deepCollect(p) {
      case s: org.apache.spark.sql.execution.FileSourceScanExec
          if s.relation.location.rootPaths.exists(p =>
            p.toString.contains("orders") &&
              !p.toString.contains("graft_mv_custstats")) => s
    }
    assert(scans.size == 1, p.toString)
    scans.foreach { s =>
      val pushed = s.metadata.getOrElse("PushedFilters", "[]")
      assert(pushed.contains("o_orderdate"),
        s"split predicate not pushed: $pushed")
    }
    assert(p.toString.contains("FullOuter"), p.toString)
  }

  test("agg-kmv-rolling-merge: partial merge range-joins a broadcast month dim, windows keyed") {
    val p = graft.SparkEntry.queries("agg-kmv-rolling-merge")(spark, sf)
      .queryExecution.executedPlan
    // the rolling merge must be partials × BROADCAST month dimension
    // (a non-equi range join → BroadcastNestedLoopJoin with the tiny
    // side as build) — never a shuffle of the fact-derived side
    val bnlj = deepCollect(p) {
      case j: org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec => j
    }
    assert(bnlj.nonEmpty, p.toString)
    // every rank window is month-partitioned
    val unpart = deepCollect(p) {
      case w: org.apache.spark.sql.execution.window.WindowExec
          if w.partitionSpec.isEmpty => w
    }
    assert(unpart.isEmpty, s"unpartitioned window in kmv plan:\n$p")
  }

  test("layout-manifest-prune: probe replay joins broadcast metadata, grid window keyed") {
    val p = graft.SparkEntry.queries("layout-manifest-prune")(spark, sf)
      .queryExecution.executedPlan
    val bcast = deepCollect(p) {
      case j: org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec => j
      case j: org.apache.spark.sql.execution.joins.BroadcastHashJoinExec => j
    }
    assert(bcast.nonEmpty, p.toString)
    val unpart = deepCollect(p) {
      case w: org.apache.spark.sql.execution.window.WindowExec
          if w.partitionSpec.isEmpty => w
    }
    assert(unpart.isEmpty, s"unpartitioned window in manifest-prune plan:\n$p")
  }

  test("agg-mv-delta-refresh: stored-MV side merges with no Exchange (SMB)") {
    // the scaladoc's claim, enforced: the MV is stored bucketed by
    // o_custkey, so the full-outer merge must read it shuffle-free —
    // no ShuffleExchangeExec may sit between the MV table scan and the
    // join. (The delta side SHOULD shuffle — to the bucket layout.)
    val df = graft.SparkEntry.queries("agg-mv-delta-refresh")(spark, sf)
    df.collect() // materialize through AQE so the final plan is real
    val plan = df.queryExecution.executedPlan
    def subtreeHasMvScan(p: SparkPlan): Boolean = deepCollect(p) {
      case s: org.apache.spark.sql.execution.FileSourceScanExec
          if s.relation.location.rootPaths.exists(_.toString.contains("graft_mv_custstats")) => s
    }.nonEmpty
    assert(subtreeHasMvScan(plan), s"no MV table scan found:\n$plan")
    val smj = deepCollect(plan) {
      case j: org.apache.spark.sql.execution.joins.SortMergeJoinExec => j
    }
    assert(smj.nonEmpty, s"expected a sort-merge join for the MV merge:\n$plan")
    // the join child that reads the MV must be Exchange-free BELOW the
    // join (the query's final ORDER BY legitimately shuffles above it)
    val mvSide = smj.head.children.filter(subtreeHasMvScan)
    assert(mvSide.nonEmpty, s"MV scan not under the merge join:\n$plan")
    val shufflesOverMv = mvSide.flatMap(deepCollect(_) {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
    })
    assert(shufflesOverMv.isEmpty,
      s"Exchange found on the bucketed MV side of the merge join:\n$plan")
  }

  test("join-bloom-prefilter: native might_contain probe, no ScalaUDF on the fact branch") {
    // r11's one weak_count: the bloom probe was a closure UDF, breaking
    // whole-stage codegen on the fact scan. Now bloom_filter_agg builds
    // the sketch and the injected BloomFilterMightContain predicate
    // probes it — assert the probe is present and NO ScalaUDF exists
    // anywhere in the physical plan (the fact branch is the only place
    // one could hide). sf0.01: at sf0.001 zero suppliers pass the
    // acctbal>9000 build filter, so the op correctly skips the probe
    // (null sketch) and there would be nothing to assert.
    val df = graft.SparkEntry.queries("join-bloom-prefilter")(spark, "/root/testdata/sf0.01")
    val plan = df.queryExecution.executedPlan
    val udfs = deepCollect(plan) {
      case p if p.expressions.exists(_.exists(
        _.isInstanceOf[org.apache.spark.sql.catalyst.expressions.ScalaUDF])) => p
    }
    assert(udfs.isEmpty, s"ScalaUDF found in bloom-prefilter plan:\n$plan")
    val probes = deepCollect(plan) {
      case p if p.expressions.exists(_.exists(
        _.isInstanceOf[org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain])) => p
    }
    assert(probes.nonEmpty, s"no might_contain probe in bloom-prefilter plan:\n$plan")
  }

  test("sink-bucket-prune: the point lookup reads a strict subset of buckets") {
    val df = graft.SparkEntry.queries("sink-bucket-prune")(spark, sf)
    val scans = deepCollect(df.queryExecution.executedPlan) {
      case s: org.apache.spark.sql.execution.FileSourceScanExec
          if s.relation.location.rootPaths.exists(_.toString.contains("graft_bucketed_orders")) => s
    }
    assert(scans.nonEmpty, df.queryExecution.executedPlan.toString)
    scans.foreach { s =>
      val sel = s.optionalBucketSet
      assert(sel.isDefined, "no bucket pruning on the bucketed scan")
      assert(sel.get.cardinality() < 8,
        s"expected <8 selected buckets, got ${sel.get.cardinality()}")
    }
  }

  test("func-ip-cidr-suite: only the key column is read from orders") {
    val df = graft.SparkEntry.queries("func-ip-cidr-suite")(spark, sf)
    val scans = deepCollect(df.queryExecution.executedPlan) {
      case s: org.apache.spark.sql.execution.FileSourceScanExec
          if s.relation.location.rootPaths.exists(_.toString.contains("orders")) => s
    }
    assert(scans.nonEmpty)
    scans.foreach(s => assert(s.requiredSchema.fields.length == 1,
      s.requiredSchema.simpleString))
  }
}
