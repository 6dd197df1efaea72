package graft.ops

import graft.olist.SparkTestBase
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Round-14 optimization invariants: the rewrites that changed an
  * operator's INTERNALS (not its declared output) hold against an
  * independent reference implementation on the fixture.
  *
  *  - emb-mmr-rerank moved the bounded 20-row argmax loop from chained
  *    frame algebra onto the driver; the spec replays the ORIGINAL
  *    frame-algebra loop and asserts row-for-row equality.
  *  - The TopKPerKey ports (emb-intrinsic-dim, ann-nndescent-round,
  *    knnExactStored, agg-brand-switching) replaced
  *    row_number-over-window cuts; the spec asserts the bounded-heap
  *    operator and the window produce the identical survivor set on
  *    the family's real pair frame.
  */
class Round14OptSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  test("emb-mmr-rerank: driver-side argmax equals the frame-algebra MMR loop") {
    graft.functions.DotProduct.register(spark)
    val vecs = spark.read.parquet(s"$sf/embeddings.parquet").select(col("vec_id"),
      expr("quantize_lattice(embedding, 1000000.0D)").as("v"))
    val q = vecs.filter(col("vec_id") === 1).select(col("v").as("qv"))
    // the pre-r14 frame-algebra implementation, verbatim shape
    val cands = vecs.crossJoin(broadcast(q))
      .filter(col("vec_id") =!= 1)
      .select(col("vec_id"), col("v"), expr("dot_product(v, qv)").as("rel"))
      .orderBy(col("rel").desc, col("vec_id").asc)
      .limit(20).persist()
    val sims = cands.select(col("vec_id").as("ia"), col("v").as("va"))
      .join(cands.select(col("vec_id").as("ib"), col("v").as("vb")),
        col("ia") =!= col("ib"))
      .select(col("ia"), col("ib"), expr("dot_product(va, vb)").as("sim"))
      .persist()
    var selected = cands.orderBy(col("rel").desc, col("vec_id").asc).limit(1)
      .select(col("vec_id"), col("rel"), lit(1).as("rank")).persist()
    for (i <- 2 to 5) {
      val next = cands.join(selected.select(col("vec_id")), Seq("vec_id"), "left_anti")
        .join(sims.join(selected.select(col("vec_id").as("ib")), Seq("ib"))
            .groupBy("ia").agg(max("sim").as("max_sim")),
          col("vec_id") === col("ia"))
        .select(col("vec_id"), col("rel"), (col("rel") - col("max_sim")).as("score"))
        .orderBy(col("score").desc, col("vec_id").asc).limit(1)
        .select(col("vec_id"), col("rel"), lit(i).as("rank"))
      selected = selected.unionAll(next).persist()
    }
    val reference = selected
      .select(col("rank"), col("vec_id"), col("rel").cast("long").as("rel_micro2"))
      .orderBy("rank").collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    val got = graft.SparkEntry.queries("emb-mmr-rerank")(spark, sf)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    spark.catalog.clearCache()
    assert(got.toSeq == reference.toSeq,
      s"driver-side MMR diverged from the frame-algebra loop:\n got=${got.toSeq}\n ref=${reference.toSeq}")
  }

  test("agg-markov-attribution: driver-side value iteration equals the frame-algebra loop") {
    // the pre-r14 frame-algebra implementation, verbatim shape: the
    // scenario column crossJoin + 13 chained join-aggs with per-round
    // round(·, 9)
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val ev = Tables.events(spark, sf).select(col("user_id"), col("ts"),
      col("event_id"), col("event_type").as("t"))
      .withColumn("nxt", lead("t", 1).over(w))
      .withColumn("prv", lag("t", 1).over(w))
    val mid = ev.filter(col("t") =!= "purchase")
      .select(col("t").as("src"),
        when(col("nxt").isNull, "NULL")
          .when(col("nxt") === "purchase", "CONV")
          .otherwise(col("nxt")).as("dst"))
    val starts = ev.filter(col("prv").isNull || col("prv") === "purchase")
      .select(lit("START").as("src"),
        when(col("t") === "purchase", "CONV").otherwise(col("t")).as("dst"))
    val cnt = mid.unionAll(starts).groupBy("src", "dst").agg(count(lit(1)).as("n"))
    val tot = cnt.groupBy("src").agg(sum("n").as("nt"))
    val trans = cnt.join(tot, Seq("src"))
      .select(col("src"), col("dst"),
        (col("n").cast("double") / col("nt").cast("double")).as("p"))
    import spark.implicits._
    val scen = trans.crossJoin(
        Seq("FULL", "click", "error", "signup", "view").toDF("scen"))
      .filter(col("src") =!= col("scen"))
      .select(col("scen"), col("src"),
        when(col("dst") === col("scen"), "NULL").otherwise(col("dst")).as("dst"),
        col("p"))
      .persist()
    var v = scen.groupBy(col("scen"), col("src").as("state"))
      .agg(round(sum(when(col("dst") === "CONV", col("p")).otherwise(0.0)), 9).as("v"))
    for (_ <- 2 to 14) {
      v = scen.join(v.select(col("scen"), col("state").as("dst"), col("v").as("vd")),
        Seq("scen", "dst"), "left")
        .groupBy(col("scen"), col("src").as("state"))
        .agg(round(sum(when(col("dst") === "CONV", col("p"))
          .otherwise(col("p") * coalesce(col("vd"), lit(0.0)))), 9).as("v"))
    }
    val pstart = v.filter(col("state") === "START").select(col("scen"), col("v"))
    val full = pstart.filter(col("scen") === "FULL").select(col("v").as("p_full"))
    val re = pstart.filter(col("scen") =!= "FULL")
      .crossJoin(broadcast(full))
      .select(col("scen").as("channel"), col("p_full"),
        col("v").as("p_removed"),
        greatest(lit(0.0), col("p_full") - col("v")).as("re"))
    val reTot = re.agg(sum("re").as("ret"))
    val reference = re.crossJoin(broadcast(reTot))
      .select(col("channel"), round(col("p_full"), 6).as("p_conv_full"),
        round(col("p_removed"), 6).as("p_conv_removed"),
        round(col("re"), 6).as("removal_effect"),
        round(col("re") / col("ret"), 4).as("attribution_share"))
      .orderBy("channel")
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4)))
    val got = graft.SparkEntry.queries("agg-markov-attribution")(spark, sf)
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4)))
    spark.catalog.clearCache()
    assert(got.toSeq == reference.toSeq,
      s"driver-side value iteration diverged from the frame-algebra loop:\n got=${got.toSeq}\n ref=${reference.toSeq}")
  }

  test("agg-bradley-terry: driver-side MM rounds equal the frame-algebra loop") {
    // the pre-r14 frame-algebra implementation, verbatim shape: three
    // MM rounds as checkpointed join-aggs with per-round round(·, 9)
    val mp = Tables.orders(spark, sf)
      .groupBy((year(col("o_orderdate")) * 12 + month(col("o_orderdate"))).as("mi"),
        col("o_orderpriority").as("pri"))
      .agg(sum(expr("CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)")).as("rev"))
    val duel = mp.select(col("mi"), col("pri").as("a"), col("rev").as("ra"))
      .join(mp.select(col("mi"), col("pri").as("b"), col("rev").as("rb")), Seq("mi"))
      .filter(col("a") =!= col("b"))
      .withColumn("awin", (col("ra") > col("rb") ||
        (col("ra") === col("rb") && col("a") < col("b"))).cast("int"))
    val nij = duel.groupBy("a", "b")
      .agg(count(lit(1)).as("n"), sum("awin").cast("long").as("w")).persist()
    val wins = nij.groupBy("a").agg(sum("w").as("wi"))
    var pi = wins.select(col("a"), lit(1.0).as("p")).persist()
    for (_ <- 1 to 3) {
      val den = nij
        .join(pi.select(col("a"), col("p").as("pa")), Seq("a"))
        .join(pi.select(col("a").as("b"), col("p").as("pb")), Seq("b"))
        .groupBy("a")
        .agg(sum(col("n").cast("double") / (col("pa") + col("pb"))).as("dn"))
      val upd = wins.join(den, Seq("a"))
        .select(col("a"), round(col("wi").cast("double") / col("dn"), 9).as("p"))
      val mean = upd.agg(avg("p").as("mp"))
      pi = upd.crossJoin(broadcast(mean))
        .select(col("a"), round(col("p") / col("mp"), 9).as("p")).persist()
      pi.count()
    }
    val reference = pi.join(wins, Seq("a"))
      .select(col("a").as("priority"), round(col("p"), 6).as("bt_strength"),
        col("wi").as("pair_wins"))
      .orderBy(col("bt_strength").desc, col("priority"))
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2)))
    val got = graft.SparkEntry.queries("agg-bradley-terry")(spark, sf)
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2)))
    spark.catalog.clearCache()
    assert(got.toSeq == reference.toSeq,
      s"driver-side MM diverged from the frame-algebra loop:\n got=${got.toSeq}\n ref=${reference.toSeq}")
  }

  test("TopKPerKey top-10 equals the row_number window cut on the exact pair frame") {
    val pairs = RelMore168.pairs(spark, sf).persist()
    val w = Window.partitionBy("i").orderBy(col("d2").asc, col("j").asc)
    val viaWindow = pairs.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 10).select("i", "j", "d2")
    val viaHeap = graft.plans.TopKPerKey.of(pairs,
      Seq("i"), Seq("d2" -> true, "j" -> true), 10).select("i", "j", "d2")
    assert(viaWindow.exceptAll(viaHeap).isEmpty && viaHeap.exceptAll(viaWindow).isEmpty,
      "TopKPerKey(k=10) and the row_number window disagree on the pair frame")
    spark.catalog.clearCache()
  }
}
