package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Shared O(log n) connected-components fixpoint — the Shiloach-Vishkin
  * SHORTCUTTING alternation graph-cc-pointer-doubling (RelMore221)
  * shipped in r12, hoisted (r13) so graph-cc-incremental's warm-start
  * refresh runs the same diameter-free convergence instead of pure
  * hash-min label propagation. Pure hash-min needs O(diameter) rounds —
  * exactly the bound RelMore212's own measurements hit when a delta
  * welds two giant components (warm refresh 11 rounds vs 11 cold: the
  * relabel wave crosses the merged giant regardless of the warm seed).
  * Alternating one hash-min round with one POINTER-JUMP round
  * (lbl ← min(lbl, lbl[lbl]) — every node adopts its label's label,
  * halving chain depth) caps rounds at O(log n) for ANY diameter.
  *
  * Each doubled round costs one E-sized shuffle join (the hash-min
  * half; edges arrive cached pre-partitioned on src at the call sites,
  * so only the label side moves) plus one V-sized equi-self-join (the
  * jump half — labels are node ids, so lbl[lbl] is a plain hash join,
  * no adjacency rescan). The hash-min state is localCheckpointed
  * because the jump half reads it twice.
  *
  * Convergence probe: both halves take minima, so labels only ever
  * decrease and an unchanged sum(lbl) is exactly "no label moved". The
  * combined fixpoint is a hash-min fixpoint (the hash-min half changed
  * nothing), i.e. the true min-id component labeling — which is why the
  * callers' recursive-CTE oracles stay fully independent of round
  * structure. */
object CcDoubling {

  /** Run the doubled fixpoint over `edges` (symmetric, self-loops
    * included so every node appears as dst) from `init` (node, lbl).
    *
    * `hashMinPerChunk` trades action overhead against propagation
    * granularity: each eager chunk chains that many LAZY hash-min
    * rounds (state read once each — the lazyChain criterion, no
    * per-round checkpoint) and then ONE pointer jump. The jump reads
    * its input twice (self-join), so only the chunk's last hash-min
    * state is checkpointed. One jump per chunk preserves the O(log n)
    * chain-halving guarantee regardless of the chunk width; wider
    * chunks (cc-incremental uses 3) just cover short distances with
    * cheap lazy E-joins instead of paying 3 driver actions per doubled
    * round — the r13 measurement that forced the knob: strict 1+1
    * alternation cost cc-incremental's nearly-converged warm refresh
    * +0.9 s/rep in probe/checkpoint actions it didn't need.
    *
    * Fails LOUDLY when `maxRounds` chunks don't converge — a
    * deeper-than-budget graph must not surface as an opaque oracle
    * mismatch downstream. */
  def converge(edges: DataFrame, init: DataFrame, maxRounds: Int,
               opName: String, hashMinPerChunk: Int = 1): DataFrame = {
    var lastSum = Long.MinValue
    var converged = false
    val out = graft.functions.IterativeFixpoint.eagerUntil(init, maxRounds) { (lbls, _) =>
      val hm = (1 to hashMinPerChunk).foldLeft(lbls) { (cur, _) =>
        edges
          .join(cur.withColumnRenamed("node", "src"), "src")
          .groupBy(col("dst").as("node"))
          .agg(min("lbl").as("lbl"))
      }.localCheckpoint()
      hm.as("x")
        .join(hm.as("y"), col("x.lbl") === col("y.node"), "left")
        .select(col("x.node"),
          least(col("x.lbl"), coalesce(col("y.lbl"), col("x.lbl"))).as("lbl"))
    } { (_, next, _) =>
      val sm = next.agg(sum("lbl")).head.getLong(0)
      converged = sm == lastSum
      lastSum = sm
      converged
    }
    require(converged,
      s"$opName: doubled fixpoint not reached in $maxRounds chunks " +
        s"($hashMinPerChunk hash-min + 1 jump each) — raise maxRounds")
    out
  }
}
