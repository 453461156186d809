package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Relational graph analytics: PageRank power iteration and triangle
  * counting, expressed as joins + aggregates so Catalyst partitions and
  * pipelines them like any other query (no graph runtime needed for the
  * join-shaped 80% of production graph work).
  */
object GraphOps {

  /** Node-count threshold under which the iterative loops ([[pagerank]],
    * [[labelPropagate]]) broadcast the per-round small side (rank/label
    * vector, winner frame) instead of shuffle-joining it against the edge
    * frame. Checkpointed frames report no size statistics, so Catalyst
    * would never pick the broadcast on its own; the loops count the node
    * frame once (cheap after materialization) and choose explicitly.
    * 1M nodes ≈ tens of MB serialized — comfortably under executor
    * broadcast budgets; above it the loops pre-shuffle the edge frame on
    * the join key once and let every round reuse that partitioning.
    * Overridable per call (`broadcastNodesMax`) — BandGraphOpsSpec forces
    * each regime on the same graph and pins identical results. */
  val BroadcastNodesMax: Long = 1L << 20

  /** One PageRank power-iteration step from the uniform vector, over a
    * weighted edge list `(srcCol, dstCol, wCol)` (out-edge weights w ≥ 0,
    * typically row-normalized like a Markov transition matrix):
    *
    *   r1(v) = (1-d)/N + d · Σ_{(u,v)∈E} w(u,v) · r0(u),   r0 = 1/N.
    *
    * Per-edge contributions quantize to `floor(w·r0·1e12)` longs so the
    * in-edge sum is order-exact under any partitioning (float sums
    * re-associate; the q100/q105 fixed-point discipline), and the final
    * rank does two IEEE ops on the agreed integer, rounded 6 dp. The
    * dangling-mass redistribution of full PageRank is deliberately not
    * modeled (this is the per-iteration kernel; loop it for the fixpoint).
    *
    * Shape at scale: node frame = one distinct over the edge endpoints;
    * the single-row N broadcasts; the contribution sum is ONE
    * map-side-combining aggregate keyed by dst; sink nodes return via one
    * left join. Nothing driver-sized. */
  def pagerankStep(edges: DataFrame, srcCol: String, dstCol: String,
      wCol: String, damping: Double = 0.85): DataFrame = {
    require(damping > 0 && damping < 1, s"damping in (0,1), got $damping")
    // endpoints explode in-row: the unionAll formulation planned the edge
    // subquery twice (expensive when edges is itself a join/aggregate)
    val nodes = edges
      .select(explode(array(col(srcCol), col(dstCol))).as("node")).distinct()
    val n = nodes.agg(count(lit(1)).as("__n"))
    // r0(u) = 1/N, folded into the quantized per-edge contribution
    val contrib = edges.crossJoin(broadcast(n))
      .withColumn("__fp",
        floor(col(wCol) * (lit(1.0) / col("__n")) * lit(1e12)).cast("long"))
      .groupBy(col(dstCol).as("node"))
      .agg(sum("__fp").as("__in"))
    nodes.join(contrib, Seq("node"), "left")
      .crossJoin(broadcast(n))
      .select(col("node"),
        round(lit(1.0 - damping) / col("__n") +
          lit(damping) * (coalesce(col("__in"), lit(0L)).cast("double") / 1e12),
          6).as("rank"))
  }

  /** One PageRank power-iteration step from an EXPLICIT rank vector —
    * the loop kernel behind [[pagerank]] (where [[pagerankStep]] is the
    * fixed from-uniform first step). `ranks` must hold the FULL node set
    * as `(node, rank)`; contributions quantize to `floor(w·r·1e12)` longs
    * (order-exact sums under any partitioning) and the output rank rounds
    * to 6 dp, so a chain of steps is engine-replayable layer by layer. */
  def pagerankIter(edges: DataFrame, ranks: DataFrame, srcCol: String,
      dstCol: String, wCol: String, damping: Double = 0.85): DataFrame =
    pagerankIterImpl(edges, ranks, srcCol, dstCol, wCol, damping,
      broadcastRanks = false)

  /** [[pagerankIter]] with the loop's regime choice threaded through:
    * `broadcastRanks` force-broadcasts the rank vector (identical result;
    * the checkpointed vector has no stats, so Catalyst cannot make the
    * call itself). */
  private def pagerankIterImpl(edges: DataFrame, ranks: DataFrame,
      srcCol: String, dstCol: String, wCol: String, damping: Double,
      broadcastRanks: Boolean, knownN: Long = -1L): DataFrame = {
    require(damping > 0 && damping < 1, s"damping in (0,1), got $damping")
    // the node count is loop-invariant — callers that know it skip a
    // per-round aggregate + broadcast job
    val n =
      if (knownN >= 0) ranks.sparkSession.range(1).select(lit(knownN).as("__n"))
      else ranks.agg(count(lit(1)).as("__n"))
    val rvec = ranks.select(col("node").as("__src"), col("rank").as("__r"))
    val contrib = edges
      .join(if (broadcastRanks) broadcast(rvec) else rvec,
        col(srcCol) === col("__src"))
      .withColumn("__fp", floor(col(wCol) * col("__r") * lit(1e12)).cast("long"))
      .groupBy(col(dstCol).as("node"))
      .agg(sum("__fp").as("__in"))
    ranks.select(col("node"))
      .join(if (broadcastRanks) broadcast(contrib) else contrib,
        Seq("node"), "left")
      .crossJoin(broadcast(n))
      .select(col("node"),
        round(lit(1.0 - damping) / col("__n") +
          lit(damping) * (coalesce(col("__in"), lit(0L)).cast("double") / 1e12),
          6).as("rank"))
  }

  /** PageRank to (approximate) convergence: up to `iterations` rounds of
    * [[pagerankIter]] from the uniform vector, stopping early when the
    * max |Δrank| of a round is <= `tol` (checked only when `tol > 0`;
    * `tol == 0` runs exactly `iterations` rounds, which keeps the result
    * layer-replayable in SQL — ranks are 6 dp fixed points, so a converged
    * chain is idempotent under extra layers and an oracle may replay the
    * full depth). Lineage is truncated with an eager localCheckpoint every
    * `checkpointEvery` rounds — the proven connected-components pattern;
    * without it each round's plan nests every earlier round and iterative
    * jobs die of planning/lineage overhead long before they die of data.
    * Returns `(node, rank)`. */
  def pagerank(edges: DataFrame, srcCol: String, dstCol: String,
      wCol: String, damping: Double = 0.85, iterations: Int = 20,
      tol: Double = 0.0, checkpointEvery: Int = 2,
      broadcastNodesMax: Long = BroadcastNodesMax): DataFrame = {
    require(iterations >= 1, s"iterations must be >= 1: $iterations")
    require(checkpointEvery >= 1, s"checkpointEvery must be >= 1: $checkpointEvery")
    require(tol >= 0, s"tol must be >= 0: $tol")
    // The edge frame is re-scanned EVERY round; if it is itself the
    // output of an expensive upstream query (a similarity graph, a
    // co-purchase join), each round would recompute that query from
    // scratch — materialize it once.
    val eChk = if (iterations > 1) edges.localCheckpoint(true) else edges
    // node frame computed once and pinned: every round rejoins against it
    // (endpoints explode in-row — one scan of the edge frame, not two)
    val nodes = eChk
      .select(explode(array(col(srcCol), col(dstCol))).as("node")).distinct()
      .localCheckpoint(true)
    val nNodes = nodes.count()
    // Checkpointed frames carry no size stats, so the per-round
    // rank-vector join would default to a full shuffle of the edge side
    // every round. Choose the regime once: small graphs broadcast the
    // rank vector (edge frame never shuffles); huge graphs pre-shuffle
    // the edge frame on the join key a single time and every round's
    // sort-merge join reuses that partitioning (localCheckpoint
    // preserves outputPartitioning).
    val small = nNodes <= broadcastNodesMax
    // Pre-shuffle ONCE so every round reuses the partitioning
    // (localCheckpoint preserves outputPartitioning): small graphs
    // partition the edge frame by dstCol — the per-round rank join is a
    // broadcast (stream side keeps the partitioning), so the contribution
    // aggregate groupBy(dstCol) plans with NO exchange and rounds are
    // shuffle-free; big graphs partition by srcCol, the per-round
    // sort-merge rank-join key (only the rank vector moves).
    val e =
      if (iterations > 1 && !small)
        eChk.repartition(col(srcCol)).localCheckpoint(true)
      else if (iterations > 1)
        eChk.repartition(col(dstCol)).localCheckpoint(true)
      else eChk
    val n = nodes.agg(count(lit(1)).as("__n"))
    var ranks = nodes.crossJoin(broadcast(n))
      .select(col("node"), (lit(1.0) / col("__n")).as("rank"))
    var iter = 0
    var done = false
    while (iter < iterations && !done) {
      val stepped = pagerankIterImpl(e, ranks, srcCol, dstCol, wCol,
        damping, broadcastRanks = small, knownN = nNodes)
      val next =
        if ((iter + 1) % checkpointEvery == 0 || tol > 0)
          stepped.localCheckpoint(true) // eager: the tol check reuses it
        else stepped
      if (tol > 0) {
        val delta = next.join(ranks.withColumnRenamed("rank", "__prev"), "node")
          .agg(max(abs(col("rank") - col("__prev"))).as("d"))
          .head().getDouble(0)
        done = delta <= tol
      }
      ranks = next
      iter += 1
    }
    ranks.localCheckpoint(true)
  }

  /** Label propagation to (approximate) convergence: up to `maxIter`
    * rounds of [[labelPropagationStep]], stopping early once a round
    * changes NO label (from there every further round is the identity, so
    * an oracle may replay the full `maxIter` depth regardless of where
    * the loop actually stopped). Same eager-localCheckpoint lineage
    * truncation as [[pagerank]]; the per-round convergence count is an
    * action, so rounds checkpoint eagerly and each is one bounded job.
    * Returns `(node, label)` — integer/string labels are exact, making
    * the whole loop engine-replayable. */
  def labelPropagate(edges: DataFrame, labels: DataFrame, srcCol: String,
      dstCol: String, wCol: String, nodeCol: String, labelCol: String,
      maxIter: Int = 10,
      broadcastNodesMax: Long = BroadcastNodesMax): DataFrame = {
    require(maxIter >= 1, s"maxIter must be >= 1: $maxIter")
    if (maxIter == 1)
      return labelPropagationStep(edges, labels, srcCol, dstCol, wCol,
        nodeCol, labelCol).select(col("node"), col("label"))
    // Loop-invariant heavy lifting happens ONCE: any expensive upstream
    // edge query (a similarity graph, a co-purchase join) materializes a
    // single time as the doubled edge frame, and the join regime is
    // chosen once from the node count (checkpointed frames have no size
    // stats, so Catalyst cannot): small graphs broadcast the label
    // vector every round — the edge frame NEVER shuffles; huge graphs
    // pre-shuffle the edge frame on the per-round join key (__v) —
    // localCheckpoint preserves outputPartitioning, so every round's
    // neighbor-label join reuses it and only the label frame moves.
    var cur = labels.select(col(nodeCol).as("node"), col(labelCol).as("label"))
      .localCheckpoint(true)
    val small = cur.count() <= broadcastNodesMax
    // one scan of the (possibly expensive) edge frame: explode each edge
    // into both directions in-row instead of a unionAll of two branches
    val dirdBase = edges
      .select(explode(array(
        struct(col(srcCol).as("__u"), col(dstCol).as("__v"),
          col(wCol).cast("long").as("__w")),
        struct(col(dstCol).as("__u"), col(srcCol).as("__v"),
          col(wCol).cast("long").as("__w")))).as("__e"))
      .select(col("__e.__u").as("__u"), col("__e.__v").as("__v"),
        col("__e.__w").as("__w"))
    // Pre-shuffle regimes (one exchange paid ONCE, reused every round —
    // localCheckpoint preserves outputPartitioning):
    //  - small: partition by __u. The per-round label join is a broadcast
    //    (stream side keeps the partitioning), so BOTH per-round aggregates
    //    — groupBy(__u, __nl) and groupBy(__u) — are satisfied by
    //    HashPartitioning(__u) and plan with ZERO exchanges: rounds are
    //    shuffle-free end to end (before: 2 exchanges per round).
    //  - big: partition by __v, the per-round sort-merge label-join key
    //    (only the label frame moves); the tally aggregates then pay their
    //    own exchanges, which is the right trade when labels can't
    //    broadcast.
    val dird = (if (small) dirdBase.repartition(col("__u"))
      else dirdBase.repartition(col("__v")))
      .localCheckpoint(true)
    var iter = 0
    var converged = false
    while (iter < maxIter && !converged) {
      // identical semantics to [[labelPropagationStep]] (spec-pinned):
      // weight-majority label, ties to smallest, isolated nodes keep own
      val lab = cur.select(col("node").as("__v"), col("label").as("__nl"))
      val tallies = dird.join(if (small) broadcast(lab) else lab, Seq("__v"))
        .groupBy(col("__u"), col("__nl")).agg(sum("__w").as("__t"))
      val winners = tallies
        .groupBy(col("__u"))
        .agg(min(struct((-col("__t")).as("__negw"), col("__nl").as("__l"))).as("__m"))
        .select(col("__u").as("node"), col("__m.__l").as("__win"))
      val next = cur.withColumnRenamed("label", "prev_label")
        .join(if (small) broadcast(winners) else winners, Seq("node"), "left")
        .select(col("node"),
          coalesce(col("__win"), col("prev_label")).as("label"),
          col("prev_label"))
        .localCheckpoint(true)
      // the last round's count only feeds an early stop that can no
      // longer happen — skip the job
      converged = iter < maxIter - 1 &&
        next.where(col("label") =!= col("prev_label")).count() == 0L
      cur = next.select(col("node"), col("label"))
      iter += 1
    }
    cur
  }

  /** Exact triangle count of an undirected simple graph given as an edge
    * list (either direction, duplicates/self-loops tolerated — the edge
    * set canonicalizes to distinct `a < b` pairs first).
    *
    * Algorithm: degree-ordered orientation (Suri & Vassilvitskii, WWW '11
    * — the MapReduce-era standard): direct each edge from its
    * lower-(degree, id) endpoint to the higher, so every node's
    * out-degree is O(√|E|) on any graph; each triangle then has exactly
    * one wedge `a→b→c` with a closing edge `a→c`, making the count TWO
    * equi-joins (wedge build + closure check) with no double counting
    * and no high-degree-hub blowup — the naive undirected two-hop join
    * explodes quadratically on hubs, the oriented one provably cannot.
    * Output: one row `(n_nodes, n_edges, n_triangles)`, exact integers. */
  def triangleCount(edges: DataFrame, srcCol: String, dstCol: String): DataFrame = {
    val e = edges
      .select(least(col(srcCol), col(dstCol)).as("a"),
        greatest(col(srcCol), col(dstCol)).as("b"))
      .where(col("a") < col("b")).distinct()
    val deg = e.select(explode(array(col("a"), col("b"))).as("node"))
      .groupBy("node").agg(count(lit(1)).as("deg"))
    // orient from lower (deg, id) to higher (deg, id)
    val withDeg = e
      .join(deg.select(col("node").as("a"), col("deg").as("__da")), "a")
      .join(deg.select(col("node").as("b"), col("deg").as("__db")), "b")
    val oriented = withDeg.select(
      when(col("__da") < col("__db") ||
        (col("__da") === col("__db") && col("a") < col("b")), col("a"))
        .otherwise(col("b")).as("u"),
      when(col("__da") < col("__db") ||
        (col("__da") === col("__db") && col("a") < col("b")), col("b"))
        .otherwise(col("a")).as("v"))
    val wedges = oriented.select(col("u").as("x"), col("v").as("y"))
      .join(oriented.select(col("u").as("y"), col("v").as("z")), "y")
    val closed = wedges.join(oriented
        .select(col("u").as("x"), col("v").as("z")), Seq("x", "z"), "left_semi")
    val nNodes = deg.agg(count(lit(1)).as("n_nodes"))
    val nEdges = e.agg(count(lit(1)).as("n_edges"))
    val nTri = closed.agg(count(lit(1)).as("n_triangles"))
    broadcast(nNodes).crossJoin(broadcast(nEdges)).crossJoin(broadcast(nTri))
  }

  /** DOULION approximate triangle count (Tsourakakis, Kang, Miller &
    * Faloutsos, KDD '09): sparsify the canonical edge set with a coin of
    * bias `p`, count triangles EXACTLY on the sparsified graph (the
    * degree-ordered [[triangleCount]]), scale the count by 1/p³ — an
    * unbiased estimator whose work shrinks ~p² on the wedge join. The
    * coin is a DETERMINISTIC salted hash of the canonical edge, so the
    * estimate is reproducible run to run AND engine-replayable (the q180
    * oracle replays the identical md5 coin); at `p == 1` the output
    * equals [[triangleCount]] with `est_triangles == n_triangles`.
    *
    * This is the scale regime for graphs whose exact count densifies
    * quadratically (the q126 band-graph watch item): estimator work
    * tracks the SAMPLED edge count while the exact count's wedge join
    * tracks the full one. Output one row:
    * `(n_nodes, n_edges, n_triangles, est_triangles)` — nodes/edges/count
    * of the SAMPLED graph, plus the scaled estimate (6 dp). */
  def triangleCountApprox(edges: DataFrame, srcCol: String, dstCol: String,
      p: Double, salt: String = "tri"): DataFrame = {
    require(p > 0 && p <= 1, s"sampling probability p must be in (0, 1]: $p")
    val canon = edges
      .select(least(col(srcCol), col(dstCol)).as("a"),
        greatest(col(srcCol), col(dstCol)).as("b"))
      .where(col("a") < col("b")).distinct()
    val thresh = (p * TextFunctions.HashMod).toLong
    val kept = canon.where(TextFunctions.tokenHashMod(
      concat(lit(s"$salt:"), col("a").cast("string"), lit(":"),
        col("b").cast("string"))) < thresh)
    triangleCount(kept, "a", "b")
      .withColumn("est_triangles",
        round(col("n_triangles").cast("double") / lit(p * p * p), 6))
  }

  /** One synchronous label-propagation step (Raghavan et al. 2007) over a
    * WEIGHTED undirected edge list: each node's next label is the
    * weight-majority label among its neighbors, ties to the SMALLEST
    * label, isolated nodes keep their own. Exact integer weight sums;
    * the argmax is `min(struct(-weight, label))` — lexicographic struct
    * order gives (weight desc, label asc), a total order, so the step is
    * deterministic and engine-replayable.
    *
    * Shape at scale: edges explode once into both directions (2|E| rows),
    * ONE equi-join tags each neighbor with its current label, one
    * map-side-combining aggregate per (node, label), and the per-node
    * argmax is a second map-side-combining HASH aggregate — no rank-1
    * window, so nothing sorts. Loop the step for the usual LPA
    * fixpoint/community sweep. Output: (node, label, prev_label). */
  def labelPropagationStep(edges: DataFrame, labels: DataFrame,
      srcCol: String, dstCol: String, wCol: String,
      nodeCol: String, labelCol: String): DataFrame = {
    // one scan of the (possibly expensive) edge frame: explode each edge
    // into both directions in-row — the unionAll formulation planned the
    // edge subquery TWICE (a co-purchase edge join paid its basket
    // aggregation once per branch; exchange reuse does not fire across
    // the two differently-projected branches)
    val dird = edges
      .select(explode(array(
        struct(col(srcCol).as("__u"), col(dstCol).as("__v"),
          col(wCol).cast("long").as("__w")),
        struct(col(dstCol).as("__u"), col(srcCol).as("__v"),
          col(wCol).cast("long").as("__w")))).as("__e"))
      .select(col("__e.__u").as("__u"), col("__e.__v").as("__v"),
        col("__e.__w").as("__w"))
    val lab = labels.select(col(nodeCol).as("__v"), col(labelCol).as("__nl"))
    val tallies = dird.join(lab, Seq("__v"))
      .groupBy(col("__u"), col("__nl")).agg(sum("__w").as("__t"))
    val winners = tallies
      .groupBy(col("__u"))
      .agg(min(struct((-col("__t")).as("__negw"), col("__nl").as("__l"))).as("__m"))
      .select(col("__u"), col("__m.__l").as("__win"))
    labels.select(col(nodeCol).as("node"), col(labelCol).as("prev_label"))
      .join(winners.withColumnRenamed("__u", "node"), Seq("node"), "left")
      .select(col("node"), coalesce(col("__win"), col("prev_label")).as("label"),
        col("prev_label"))
  }
}
