package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed graph reachability — the Spark-first replacement for the
  * reference's type-validation DFS (collection-templates
  * scripts/filter_articles2.py `has_path_rocksdb_subclass`, which walks
  * the `subclass_of` RocksDB map one key at a time).
  *
  * Semi-naive iteration: each round joins only the frontier (pairs
  * discovered last round) against the edge set, so work per round is
  * proportional to NEW paths, not the whole closure. Every round is one
  * shuffle on the join key; `localCheckpoint` truncates lineage so the
  * plan doesn't grow with iteration count (and AQE re-plans each round
  * from actual sizes — small frontiers get broadcast automatically).
  */
object Graph {

  private val log = org.slf4j.LoggerFactory.getLogger(getClass)

  /** Transitive closure of `edges` (columns `src`, `dst`): every pair
    * (a, b) with a path a → … → b of length ≥ 1. Terminates when a
    * round yields no new pairs, or after `maxIter` rounds (a cycle
    * guard for non-DAG inputs; the closure itself is cycle-safe because
    * known pairs are anti-joined away each round). Hitting `maxIter`
    * with a non-empty frontier means the closure is INCOMPLETE: a
    * warning is logged, or an `IllegalStateException` thrown when
    * `strict = true`.
    *
    * `uniquePaths = true` asserts every reachable pair has exactly one
    * path (PRECONDITION: the edge set is a tree/forest — every node has
    * at most one parent, e.g. a `subclass_of` taxonomy; violating it
    * yields duplicate pairs and, on cyclic inputs, non-termination
    * until `maxIter`). Then no pair can be rediscovered, so the
    * per-round `distinct` + anti-join (two extra shuffles) are skipped
    * and each round is a single join. `strict = true` additionally
    * verifies the precondition up front (one cheap aggregation).
    */
  def transitiveClosure(edges: DataFrame, maxIter: Int = 30,
                        uniquePaths: Boolean = false,
                        strict: Boolean = false): DataFrame = {
    val raw = edges.select(col("src"), col("dst"))
    val base = (if (uniquePaths) raw else raw.distinct()).localCheckpoint()
    if (uniquePaths && strict) {
      // Edges run child → parent; duplicate paths require some node
      // with MORE THAN ONE OUTGOING edge (two parents). Multiple
      // edges INTO a node are just siblings — legal in any forest.
      val multiParent = base.groupBy("src").count().filter(col("count") > 1).limit(1).count()
      if (multiParent > 0) throw new IllegalStateException(
        "transitiveClosure(uniquePaths = true) requires a tree/forest edge set, " +
          "but some src has more than one parent edge — rerun with uniquePaths = false")
    }
    // Rename once so the iterated self-join never has ambiguous columns.
    val hop = base.select(col("src").as("h_src"), col("dst").as("h_dst"))
    var closure = base
    var frontier = base
    var iter = 0
    var done = false
    while (!done && iter < maxIter) {
      val grown = frontier
        .join(hop, frontier("dst") === col("h_src"))
        .select(frontier("src"), col("h_dst").as("dst"))
      val novel =
        (if (uniquePaths) grown
         else grown.distinct().join(closure, Seq("src", "dst"), "left_anti"))
          .localCheckpoint()
      if (novel.isEmpty) done = true
      else {
        closure = closure.union(novel).localCheckpoint()
        frontier = novel
        iter += 1
      }
    }
    if (!done) {
      val msg = s"transitiveClosure stopped at maxIter = $maxIter with a non-empty " +
        "frontier — the returned closure is incomplete (deeper chains, or a cycle " +
        "under uniquePaths = true); raise maxIter"
      if (strict) throw new IllegalStateException(msg) else log.warn(msg)
    }
    closure
  }

  /** Transitive closure by pointer doubling: after round k the result
    * holds every pair connected by a path of length ≤ 2^k, so a
    * hierarchy of depth d closes in ⌈log2 d⌉ rounds instead of d —
    * the right variant for deep chains (each round is one self-join +
    * distinct). Trade-off vs semi-naive: a pair at distance n is
    * re-derived once per split point, so on shallow-but-bushy graphs
    * the duplicate volume (pruned by the per-round distinct) can exceed
    * the frontier approach; pick per workload.
    */
  def transitiveClosureDoubling(edges: DataFrame, maxIter: Int = 20): DataFrame = {
    var closure = edges.select(col("src"), col("dst")).distinct().localCheckpoint()
    var size = closure.count()
    var iter = 0
    var done = false
    while (!done && iter < maxIter) {
      val left = closure.select(col("src"), col("dst").as("mid"))
      val right = closure.select(col("src").as("mid"), col("dst"))
      val doubled = left.join(right, "mid").select(col("src"), col("dst"))
      closure = closure.union(doubled).distinct().localCheckpoint()
      val next = closure.count()
      if (next == size) done = true
      size = next
      iter += 1
    }
    closure
  }

  /** Reachability restricted to a target set: all (src, dst) with dst
    * ∈ `targets` and a path src →* dst — semi-naive BFS growing
    * BACKWARD from the targets, so work is proportional to the
    * targets' ancestor cone, never the full closure. This is the
    * 100 TB shape of the reference's validation (filter_articles2.py
    * checks paths to ONE collection type per member; a query's
    * distinct target set is tiny, so materializing the whole
    * subclass closure — O(V·depth) pairs — is pure waste).
    *
    * `targets` must have a single column named `dst`.
    *
    * `uniquePaths = true` — same precondition and payoff as
    * [[transitiveClosure]]: on a tree/forest edge set no (src, dst)
    * pair can be rediscovered, so each round drops the dedup
    * `distinct` + anti-join (two shuffles) and is a single join.
    * Violating the precondition yields DUPLICATE pairs (which inflate
    * any downstream join fan-out); `strict = true` verifies it up
    * front and turns the maxIter warning into an exception.
    */
  def reachableTo(edges: DataFrame, targets: DataFrame,
                  maxIter: Int = 30,
                  uniquePaths: Boolean = false,
                  strict: Boolean = false): DataFrame = {
    val raw = edges.select(col("src"), col("dst"))
    val e = (if (uniquePaths) raw else raw.distinct()).localCheckpoint()
    if (uniquePaths && strict) {
      val multiParent = e.groupBy("src").count().filter(col("count") > 1).limit(1).count()
      if (multiParent > 0) throw new IllegalStateException(
        "reachableTo(uniquePaths = true) requires a tree/forest edge set, " +
          "but some src has more than one outgoing edge — rerun with uniquePaths = false")
    }
    val seed = targets.select(col("dst")).distinct()
    // Pairs at distance 1 into the target set.
    var reach = e.join(seed, "dst").select(col("src"), col("dst"))
      .localCheckpoint()
    var frontier = reach
    var iter = 0
    var done = false
    while (!done && iter < maxIter) {
      // Walk one hop backward: predecessors of the current frontier.
      val hop = e.select(col("src").as("g_src"), col("dst").as("g_dst"))
        .join(frontier.select(col("src").as("f_src"), col("dst").as("f_dst")),
              col("g_dst") === col("f_src"))
        .select(col("g_src").as("src"), col("f_dst").as("dst"))
      val grown =
        (if (uniquePaths) hop
         else hop.distinct().join(reach, Seq("src", "dst"), "left_anti"))
          .localCheckpoint()
      if (grown.isEmpty) done = true
      else {
        reach = reach.union(grown).localCheckpoint()
        frontier = grown
        iter += 1
      }
    }
    if (!done) {
      val msg = s"reachableTo stopped at maxIter = $maxIter with a non-empty " +
        "frontier — the result is incomplete (deeper chains, or a cycle under " +
        "uniquePaths = true); raise maxIter"
      if (strict) throw new IllegalStateException(msg) else log.warn(msg)
    }
    reach
  }

  /** Reachability validation (filter_articles2.py main loop): a member
    * row is valid iff its `typeCol` node reaches the row's `targetCol`
    * node (or equals it). Returns the input plus a boolean `valid`.
    * Implemented as one left join against the closure — at cluster
    * scale this shuffles on (type, target); AQE broadcasts the closure
    * side when it is small.
    */
  def validateReachable(members: DataFrame, closure: DataFrame,
                        typeCol: String, targetCol: String): DataFrame = {
    val hit = closure
      .select(col("src").as("__vsrc"), col("dst").as("__vdst"), lit(1).as("__vhit"))
    members
      .join(hit, col(typeCol) === col("__vsrc") && col(targetCol) === col("__vdst"),
            "left_outer")
      .withColumn("valid", col("__vhit").isNotNull || col(typeCol) === col(targetCol))
      .drop("__vsrc", "__vdst", "__vhit")
  }
}
