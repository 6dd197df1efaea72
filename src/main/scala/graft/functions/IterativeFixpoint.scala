package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.LogicalRDD

/** The canonical home of the engine's bounded-iteration lifecycle
  * (r9 verdict item 4). Every op that iterates a SINGLE state frame
  * `state = step(state)` a bounded number of rounds runs through this
  * helper: the seven graph ops (ktruss, kcore, label propagation,
  * hash-min CC, pagerank, BFS, HITS), bradley-terry (RelMore187),
  * BPE apply (RelMore30), power iteration (RelMore42), k-center
  * coreset (RelMore44), reach doubling (RelMore39), ppr-seed
  * (RelMore80), and the modularity label pass (RelMore46, lazyChain).
  * Before this helper each hand-rolled its own persist → count →
  * unpersist (or localCheckpoint) dance, and the one that got it
  * wrong (bradley-terry, r8: lazy chaining nested each round's whole
  * plan inside the next round's broadcast subtree, 65 s for 420 rows
  * of state) cost a round of bench triage.
  *
  * Four loops intentionally stay hand-rolled because their round
  * shape does not fit the single-state signature — each applies the
  * same per-round localCheckpoint discipline in place: RelMore29 (BPE
  * TRAINER: emits a side-log of one checkpointed merge row per round
  * alongside the corpus state), RelMore51 (random walk: logs every
  * step's frontier for the output union), RelMore106 (eigen
  * deflation: two sequential passes sharing helper fns, pass 2 reads
  * pass 1's pinned vector), RelMore172 (betweenness BFS: carries
  * frontier AND accumulated distance table as separate frames).
  * Porting those would mean threading multi-frame state through a
  * tuple-typed variant of [[eager]] — more machinery than the four
  * call sites justify; revisit if a fifth multi-state loop appears.
  *
  * Two disciplines, chosen per op — the choice criteria ARE the API
  * docs, so the next op picks deliberately:
  *
  *  - [[eager]]: each round's state is `localCheckpoint()`ed — the
  *    round executes NOW, its lineage truncates to a LogicalRDD leaf,
  *    and round r+1 plans against constant-size input instead of
  *    replaying rounds 1..r. Pick this when the step reads its state
  *    MORE THAN ONCE (degree pass + semi join; adjacency self-join),
  *    when rounds nest state inside broadcast subtrees (re-analysis
  *    per reference — the bradley-terry failure), or when depth is
  *    unbounded-ish (every plan-size cost is paid per round, so it
  *    must be O(1) per round). The helper releases round r's
  *    checkpoint storage once round r+1 is materialized, and asserts
  *    the NO-PLAN-GROWTH contract: every round's analyzed step plan
  *    must have the same node count (a growing count means state is
  *    leaking un-truncated lineage into the next round).
  *
  *  - [[lazyChain]]: rounds chain as one lazy plan; the final action
  *    runs each round's shuffle exactly once (per-stage shuffle
  *    materialization is the checkpointing). Pick this for FIXED
  *    SHALLOW depths whose step reads state once (hash-min CC,
  *    pagerank at 5 rounds): per-round actions would add job-submission
  *    overhead for nothing. The caller must still materialize the
  *    result inside any conf scope (sharedCache + count — see
  *    Tables.withShufflePartitions).
  *
  * On a real cluster, [[eager]]'s localCheckpoint becomes a RELIABLE
  * checkpoint for fault tolerance at the same call sites —
  * executor-local checkpoint blocks die with the executor. That switch
  * is a CONF, not a code change: set
  * `spark.graft.reliableCheckpoints=true` and a SparkContext
  * checkpoint dir (HDFS/object storage in production), and every
  * round's state goes through `Dataset.checkpoint()` instead —
  * same truncation, same release lifecycle, blocks survive executor
  * loss (ReliableCheckpointSpec proves result-identity and lineage
  * truncation on both paths). Checkpoint FILES of released rounds are
  * reclaimed by the ContextCleaner when
  * `spark.cleaner.referenceTracking.cleanCheckpoints=true`; otherwise
  * they age out with the checkpoint dir's retention.
  */
object IterativeFixpoint {

  /** Round snapshot: reliable checkpoint when the engine is configured
    * for it (conf flag + a checkpoint dir), executor-local otherwise. */
  private def snap(df: DataFrame): DataFrame = {
    val s = df.sparkSession
    val reliable =
      s.conf.getOption("spark.graft.reliableCheckpoints").contains("true") &&
        s.sparkContext.getCheckpointDir.isDefined
    if (reliable) df.checkpoint() else df.localCheckpoint()
  }

  /** Per-round eagerly-checkpointed iteration. `step(state, r)` for
    * r = 1..rounds; `state` passed to the first step is `init`
    * checkpointed. Returns the LAST round's checkpointed frame
    * (materialized; storage of all earlier rounds already released). */
  def eager(init: DataFrame, rounds: Int)
           (step: (DataFrame, Int) => DataFrame): DataFrame = {
    var state = snap(init)
    var planNodes = -1
    for (r <- 1 to rounds) {
      val built = step(state, r)
      val n = built.queryExecution.analyzed.collect { case p => p }.size
      if (planNodes < 0) planNodes = n
      else require(n == planNodes,
        s"IterativeFixpoint: step plan grew from $planNodes to $n nodes at " +
          s"round $r — state is leaking un-truncated lineage between rounds")
      val next = snap(built)
      releaseCheckpoint(state)
      state = next
    }
    state
  }

  /** [[eager]] with convergence: stops after `stop(prev, next, r)` is
    * true or at `maxRounds`. Both frames handed to `stop` are
    * materialized checkpoints, so count()-based convergence tests are
    * cheap cache reads. */
  def eagerUntil(init: DataFrame, maxRounds: Int)
                (step: (DataFrame, Int) => DataFrame)
                (stop: (DataFrame, DataFrame, Int) => Boolean): DataFrame = {
    var state = snap(init)
    var r = 1
    var done = false
    while (!done && r <= maxRounds) {
      val next = snap(step(state, r))
      done = stop(state, next, r)
      releaseCheckpoint(state)
      state = next
      r += 1
    }
    state
  }

  /** Lazily-chained fixed-depth iteration — a documented fold. See the
    * object scaladoc for when this beats [[eager]]. */
  def lazyChain(init: DataFrame, rounds: Int)
               (step: (DataFrame, Int) => DataFrame): DataFrame =
    (1 to rounds).foldLeft(init)(step)

  /** Free a checkpointed frame's storage. localCheckpoint persists the
    * materialized rows in the block manager; once the NEXT round is
    * materialized nothing references them, but the ContextCleaner only
    * reclaims on GC — explicit release keeps a deep loop's footprint
    * at two rounds of state. No-op on non-checkpointed frames. */
  def releaseCheckpoint(df: DataFrame): Unit =
    df.queryExecution.logical match {
      case l: LogicalRDD =>
        // Spark WARNs "lineage has been truncated and cannot be
        // recomputed" on every unpersist of a locally-checkpointed RDD.
        // Here that is the point — the round is dead by contract — so
        // silence that one logger (the concrete RDD class) for the
        // duration of the synchronous unpersist call, then RESTORE it:
        // the class (MapPartitionsRDD) covers nearly every RDD in the
        // app, and a permanent ERROR pin would swallow unrelated
        // WARN/INFO for the rest of the session (r10 ADVICE). The WARN
        // is emitted inside RDD.unpersist itself, before the async
        // block removal, so the scoped window is sufficient.
        val cls = l.rdd.getClass.getName
        val prev = org.apache.logging.log4j.LogManager.getLogger(cls).getLevel
        org.apache.logging.log4j.core.config.Configurator.setLevel(
          cls, org.apache.logging.log4j.Level.ERROR)
        try l.rdd.unpersist(blocking = false)
        finally org.apache.logging.log4j.core.config.Configurator.setLevel(cls, prev)
      case _ => ()
    }
}
