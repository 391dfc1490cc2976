package graft

import graft.operators.Graph
import graft.sources.NTriples

class GraphSpec extends GraftSuite {
  private val ss = SparkTestBase.spark
  import ss.implicits._

  private def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.as[(Long, Long)].collect().toSet

  test("closure of a chain finds all ancestor pairs") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("src", "dst")
    assert(pairs(Graph.transitiveClosure(edges)) ===
      Set((1L, 2L), (2L, 3L), (3L, 4L), (1L, 3L), (2L, 4L), (1L, 4L)))
  }

  test("closure of a dag with diamond does not duplicate pairs") {
    // 1→2, 1→3, 2→4, 3→4 : (1,4) reachable two ways, must appear once
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 4L), (3L, 4L)).toDF("src", "dst")
    val c = Graph.transitiveClosure(edges)
    assert(c.count() === c.distinct().count())
    assert(pairs(c) === Set((1L, 2L), (1L, 3L), (2L, 4L), (3L, 4L), (1L, 4L)))
  }

  test("closure terminates on a cycle") {
    val edges = Seq((1L, 2L), (2L, 1L)).toDF("src", "dst")
    assert(pairs(Graph.transitiveClosure(edges)) ===
      Set((1L, 2L), (2L, 1L), (1L, 1L), (2L, 2L)))
  }

  test("uniquePaths closure matches general closure on a tree") {
    val edges = Seq((2L, 1L), (3L, 1L), (4L, 2L), (5L, 2L), (6L, 3L), (7L, 3L))
      .toDF("src", "dst")
    assert(pairs(Graph.transitiveClosure(edges, uniquePaths = true)) ===
      pairs(Graph.transitiveClosure(edges)))
  }

  test("reachableTo equals the target-filtered full closure") {
    // Binary-tree edges over sf0.001 part keys, targets 2..31 — the
    // exact shape b2 runs; seeded backward BFS must agree with the
    // full closure restricted to those destinations.
    val edges = Tables(spark, sfDir, "part")
      .filter($"p_partkey" >= 2)
      .selectExpr("p_partkey AS src", "p_partkey DIV 2 AS dst")
    val targets = spark.range(2, 32).select($"id".as("dst"))
    val full = pairs(Graph.transitiveClosureDoubling(edges)
      .join(targets, "dst").select("src", "dst"))
    assert(pairs(Graph.reachableTo(edges, targets)) === full)
    assert(pairs(Graph.reachableTo(edges, targets, uniquePaths = true)) === full)
    assert(full.nonEmpty)
  }

  test("stride > 1 closures equal the single-hop closure") {
    val chain = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 6L)).toDF("src", "dst")
    val want = pairs(Graph.transitiveClosure(chain))
    for (k <- 2 to 4)
      assert(pairs(Graph.transitiveClosure(chain, stride = k)) === want,
        s"stride $k diverged on the chain")
    // stride larger than the graph depth: seed alone covers everything.
    assert(pairs(Graph.transitiveClosure(chain, stride = 7)) === want)
    // forest fast path with stride
    assert(pairs(Graph.transitiveClosure(chain, uniquePaths = true, stride = 3)) === want)
    // diamond (multiple paths) and cycle still converge to the same set
    val diamond = Seq((1L, 2L), (1L, 3L), (2L, 4L), (3L, 4L), (4L, 5L)).toDF("src", "dst")
    assert(pairs(Graph.transitiveClosure(diamond, stride = 2)) ===
      pairs(Graph.transitiveClosure(diamond)))
    val cycle = Seq((1L, 2L), (2L, 1L)).toDF("src", "dst")
    assert(pairs(Graph.transitiveClosure(cycle, stride = 2)) ===
      pairs(Graph.transitiveClosure(cycle)))
  }

  test("stride reachableTo equals single-hop reachableTo (b2 shape)") {
    val edges = Tables(spark, sfDir, "part")
      .filter($"p_partkey" >= 2)
      .selectExpr("p_partkey AS src", "p_partkey DIV 2 AS dst")
    val targets = spark.range(2, 32).select($"id".as("dst"))
    val want = pairs(Graph.reachableTo(edges, targets))
    assert(pairs(Graph.reachableTo(edges, targets, stride = 4)) === want)
    assert(pairs(Graph.reachableTo(edges, targets, uniquePaths = true, stride = 4)) === want)
    assert(want.nonEmpty)
  }

  test("reachableTo handles cycles and disconnected targets") {
    val edges = Seq((1L, 2L), (2L, 1L), (3L, 4L)).toDF("src", "dst")
    val targets = Seq(Tuple1(1L), Tuple1(9L)).toDF("dst")
    assert(pairs(Graph.reachableTo(edges, targets)) ===
      Set((2L, 1L), (1L, 1L)))
  }

  test("strict uniquePaths accepts forests and rejects multi-parent graphs") {
    // A genuine forest: node 1 has two children — legal.
    val forest = Seq((2L, 1L), (3L, 1L), (4L, 2L)).toDF("src", "dst")
    assert(pairs(Graph.transitiveClosure(forest, uniquePaths = true, strict = true)) ===
      pairs(Graph.transitiveClosure(forest)))
    assert(pairs(Graph.reachableTo(forest, Seq(Tuple1(1L)).toDF("dst"),
      uniquePaths = true, strict = true)).nonEmpty)
    // Node 4 with two parents: multiple paths — must be rejected,
    // and the rejection must FREE the just-created edge cut (a
    // catch-and-retry serving loop must not leak one block set per
    // attempt — round-11 second review): the persisted-RDD map must
    // not grow across the throws. unpersist(blocking = false) removes
    // from the map synchronously; only the block drop is async.
    val diamond = Seq((4L, 2L), (4L, 3L), (2L, 1L), (3L, 1L)).toDF("src", "dst")
    val before = ss.sparkContext.getPersistentRDDs.keySet
    intercept[IllegalStateException] {
      Graph.transitiveClosure(diamond, uniquePaths = true, strict = true)
    }
    intercept[IllegalStateException] {
      Graph.reachableTo(diamond, Seq(Tuple1(1L)).toDF("dst"),
        uniquePaths = true, strict = true)
    }
    val leaked = ss.sparkContext.getPersistentRDDs.keySet -- before
    assert(leaked.isEmpty, s"strict throws leaked persisted RDDs: $leaked")
  }

  test("stride closure has no duplicate rows when a shortcut edge coexists with a longer path") {
    // (1,3) is connected at distance 1 (shortcut) AND distance 2
    // (1→2→3): the stride-2 seed must dedup across hop distances or
    // the pair leaks twice into the returned closure.
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L)).toDF("src", "dst")
    for (stride <- Seq(2, 3)) {
      val c = Graph.transitiveClosure(edges, stride = stride)
      assert(c.count() === c.distinct().count(),
        s"stride=$stride closure must be a set")
      val r = Graph.reachableTo(edges, Seq(Tuple1(3L)).toDF("dst"), stride = stride)
      assert(r.count() === r.distinct().count(),
        s"stride=$stride reachableTo must be a set")
    }
  }

  test("property: closures match an in-memory BFS oracle on random DAGs, all strides") {
    val rnd = new scala.util.Random(1234)
    for (trial <- 1 to 6) {
      // Random DAG: edges only src > dst, so acyclic by construction;
      // nodes 1..20, ~2 outgoing edges each (multi-parent allowed).
      val edgePairs = (2 to 20).flatMap { s =>
        Seq.fill(rnd.nextInt(3))((s.toLong, (rnd.nextInt(s - 1) + 1).toLong))
      }.distinct
      if (edgePairs.nonEmpty) {
        // Independent oracle: BFS closure over the collected edge set.
        val adj = edgePairs.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
        def reach(n: Long): Set[Long] = {
          var seen = Set.empty[Long]
          var frontier = adj.getOrElse(n, Set.empty)
          while (frontier.nonEmpty) {
            seen ++= frontier
            frontier = frontier.flatMap(adj.getOrElse(_, Set.empty)) -- seen
          }
          seen
        }
        val want = edgePairs.map(_._1).distinct
          .flatMap(s => reach(s).map(d => (s, d))).toSet
        val edges = edgePairs.toDF("src", "dst")
        for (stride <- Seq(1, 2, 4)) {
          val got = Graph.transitiveClosure(edges, stride = stride)
            .as[(Long, Long)].collect()
          assert(got.length === got.distinct.length,
            s"trial $trial stride $stride: closure emitted duplicates")
          assert(got.toSet === want, s"trial $trial stride $stride")
          val targets = want.map(_._2).take(3)
          if (targets.nonEmpty) {
            val r = Graph.reachableTo(edges, targets.toSeq.toDF("dst"),
              stride = stride).as[(Long, Long)].collect()
            assert(r.length === r.distinct.length,
              s"trial $trial stride $stride: reachableTo emitted duplicates")
            assert(r.toSet === want.filter(p => targets.contains(p._2)),
              s"trial $trial stride $stride reachableTo")
          }
        }
      }
    }
  }

  test("redirect fallback rescues members whose redirect target reaches (b3 shape)") {
    import org.apache.spark.sql.functions.{coalesce, col, lit}
    // 4→2, 5→2, 2→1, 3→1: type 3 does NOT reach 2, but its same_as
    // redirect 3→5 does — the member must be rescued.
    val edges = Seq((4L, 2L), (5L, 2L), (2L, 1L), (3L, 1L)).toDF("src", "dst")
    val closure = Graph.reachableTo(edges, Seq(Tuple1(2L)).toDF("dst"))
    val members = Seq((10L, 3L, 2L), (11L, 4L, 2L), (12L, 9L, 2L))
      .toDF("id", "typ", "target")
    val redirects = Seq((3L, 5L)).toDF("r_src", "r_dst")
    val withAlt = members.join(redirects, col("typ") === col("r_src"), "left")
    val v1 = Graph.validateReachable(withAlt, closure, "typ", "target")
      .withColumnRenamed("valid", "valid_orig")
    val got = Graph.validateReachable(v1, closure, "r_dst", "target")
      .withColumn("valid_any", col("valid_orig") || coalesce(col("valid"), lit(false)))
      .select("id", "valid_any").as[(Long, Boolean)].collect().toMap
    assert(got === Map(10L -> true, 11L -> true, 12L -> false))
  }

  test("connectedComponents labels chains, cliques and singleton pairs") {
    // Two components: a chain 1-2-3-4 (diameter 3, multiple rounds)
    // and the pair 10-11; self-loops and duplicate edges are noise.
    val p = Seq((2L, 1L), (2L, 3L), (4L, 3L), (10L, 11L), (11L, 10L), (5L, 5L))
      .toDF("id_a", "id_b")
    val got = Graph.connectedComponents(p)
      .as[(Long, Long)].collect().toMap
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L))
  }

  test("connectedComponents of an empty or self-pair-only set is empty") {
    val empty = Seq.empty[(Long, Long)].toDF("id_a", "id_b")
    assert(Graph.connectedComponents(empty).count() === 0)
    val selfOnly = Seq((3L, 3L)).toDF("id_a", "id_b")
    assert(Graph.connectedComponents(selfOnly).count() === 0)
  }

  test("reliable-checkpoint mode: identical results, files land under the dir") {
    // spark.graft.checkpointDir flips every operator lineage cut from
    // localCheckpoint (executor blocks — dies with any executor loss)
    // to reliable checkpoint() on the fault-tolerant FS. Results must
    // be identical and the files must actually land there.
    val dir = java.nio.file.Files.createTempDirectory("graft-ckpt")
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (1L, 3L)).toDF("src", "dst")
    val want = pairs(Graph.transitiveClosure(edges))
    spark.conf.set(graft.operators.Checkpoints.confKey, dir.toString)
    try {
      assert(pairs(Graph.transitiveClosure(edges, stride = 2)) === want)
      val cc = Graph.connectedComponents(
        Seq((2L, 1L), (2L, 3L), (10L, 11L)).toDF("id_a", "id_b"))
        .as[(Long, Long)].collect().toMap
      assert(cc === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L))
      val files = java.nio.file.Files.walk(dir).filter(
        java.nio.file.Files.isRegularFile(_)).count()
      assert(files > 0, "reliable mode must write checkpoint files")
    } finally spark.conf.unset(graft.operators.Checkpoints.confKey)
  }

  test("connectedComponents strict throws when maxIter is too small") {
    val chain = (1L until 12L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    intercept[IllegalStateException] {
      Graph.connectedComponents(chain, maxIter = 2, strict = true).count()
    }
  }

  test("property: connectedComponents matches an in-memory union-find") {
    val rnd = new scala.util.Random(17)
    for (trial <- 1 to 4) {
      val n = 30
      val edges = (1 to 40).map(_ => (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter { case (a, b) => a != b }
      // Union-find oracle.
      val parent = Array.tabulate(n)(identity)
      def find(x: Int): Int = if (parent(x) == x) x else { parent(x) = find(parent(x)); parent(x) }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a.toInt), find(b.toInt))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val present = edges.flatMap { case (a, b) => Seq(a, b) }.toSet
      val want = present.map(v => v -> {
        // canonical = min node of the component among PRESENT nodes
        val r = find(v.toInt)
        present.filter(u => find(u.toInt) == r).min
      }).toMap
      val got = Graph.connectedComponents(edges.toDF("id_a", "id_b"))
        .as[(Long, Long)].collect().toMap
      assert(got === want, s"trial $trial")
      // The pointer-jumping variant must land on the IDENTICAL
      // fixpoint — same min-id labels, just fewer rounds.
      val gotShortcut = Graph.connectedComponents(
          edges.toDF("id_a", "id_b"), shortcut = true)
        .as[(Long, Long)].collect().toMap
      assert(gotShortcut === want, s"trial $trial (shortcut)")
    }
  }

  test("reachesCycle: empty on DAGs, finds exactly the cycle-reaching set") {
    // A DAG (diamond) peels to nothing.
    val dag = Seq((1L, 2L), (1L, 3L), (2L, 4L), (3L, 4L)).toDF("src", "dst")
    assert(Graph.reachesCycle(dag, strict = true).count() === 0)
    // Tail → cycle → exit: 1 → 2 → 3 → 4 → 2 (cycle {2,3,4}), plus
    // 4 → 5 (an exit edge: 5 is REACHED FROM the cycle but reaches
    // nothing — must not be reported), plus a disconnected DAG edge.
    val g = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 2L), (4L, 5L), (8L, 9L))
      .toDF("src", "dst")
    val got = Graph.reachesCycle(g, strict = true).as[Long].collect().toSet
    assert(got === Set(1L, 2L, 3L, 4L))
  }

  test("property: reachesCycle matches an in-memory reachability oracle") {
    val rnd = new scala.util.Random(29)
    for (trial <- 1 to 4) {
      val n = 24
      val edges = (1 to 34).map(_ => (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter { case (a, b) => a != b }.distinct
      val adj = edges.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      // v reaches a cycle iff some node reachable from v (v included
      // via a non-empty walk) can reach itself.
      def reach(v: Long): Set[Long] = {
        var seen = Set.empty[Long]
        var frontier = adj.getOrElse(v, Set.empty)
        while (frontier.nonEmpty) {
          seen ++= frontier
          frontier = frontier.flatMap(u => adj.getOrElse(u, Set.empty)) -- seen
        }
        seen
      }
      val onCycle = edges.map(_._1).distinct.filter(v => reach(v).contains(v)).toSet
      val want = edges.map(_._1).distinct
        .filter(v => onCycle.contains(v) || reach(v).exists(onCycle.contains)).toSet
      val got = Graph.reachesCycle(edges.toDF("src", "dst"), strict = true)
        .as[Long].collect().toSet
      assert(got === want, s"trial $trial")
    }
  }

  test("shortcut converges in log rounds where plain propagation needs the diameter") {
    // A 200-link chain: plain min-label propagation moves the min one
    // hop per round, so maxIter = 12 is nowhere near enough (strict
    // throws); pointer jumping contracts label depth geometrically
    // and lands the same answer within those 12 rounds.
    val chain = (1L until 200L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    intercept[IllegalStateException] {
      Graph.connectedComponents(chain, maxIter = 12, strict = true).count()
    }
    val got = Graph.connectedComponents(chain, maxIter = 12, strict = true,
      shortcut = true).as[(Long, Long)].collect()
    assert(got.length == 200 && got.forall(_._2 == 1L))
  }

  test("property: componentsDelta upsert ≡ full recompute on random edge splits") {
    // The operator's whole contract: for any split of an edge set
    // into OLD (already folded into an assignment) and NEW (the
    // ingest slice), upsert(assignment, delta) equals a full
    // connectedComponents run over old ∪ new. Random graphs cover
    // the merge shapes: new-new pairs, new-old bridges, chains of
    // component merges through a slice, slices touching nothing.
    val rnd = new scala.util.Random(91)
    for (trial <- 1 to 6) {
      val n = 30
      val all = (1 to 45).map(_ => (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter { case (a, b) => a != b }
      val (oldE, newE) = all.partition(_ => rnd.nextInt(3) != 0)
      if (oldE.nonEmpty && newE.nonEmpty) {
        val oldAssign = Graph.connectedComponents(oldE.toDF("id_a", "id_b"))
        val delta = Graph.componentsDelta(oldAssign, newE.toDF("id_a", "id_b"),
          strict = true)
        val merged = oldAssign
          .join(delta, Seq("id"), "left_anti").unionByName(delta)
          .as[(Long, Long)].collect().toMap
        val want = Graph.connectedComponents(all.toDF("id_a", "id_b"))
          .as[(Long, Long)].collect().toMap
        assert(merged === want, s"trial $trial old=$oldE new=$newE")
        // Delta rows are genuine: none may repeat an unchanged label.
        val before = oldAssign.as[(Long, Long)].collect().toMap
        val d = delta.as[(Long, Long)].collect()
        assert(d.map(_._1).distinct.length === d.length,
          s"trial $trial: duplicate ids in delta")
        d.foreach { case (id, comp) =>
          assert(before.get(id) !== Some(comp),
            s"trial $trial: delta repeats unchanged ($id, $comp)") }
      }
    }
  }

  test("property: transitiveClosureDelta union ≡ full closure on random edge splits") {
    // For any split into OLD (already closed) and NEW edges:
    // closure(old) ∪ delta must equal closure(old ∪ new), delta rows
    // must all be genuinely new, and cycles (closure includes
    // self-pairs) must survive the fold. Random graphs cover new-new
    // chains, new edges bridging old cones, and no-op slices.
    val rnd = new scala.util.Random(47)
    for (trial <- 1 to 5) {
      val n = 14
      val all = (1 to 22).map(_ => (rnd.nextInt(n).toLong + 1, rnd.nextInt(n).toLong + 1))
        .filter { case (a, b) => a != b }.distinct
      val (oldE, newE) = all.partition(_ => rnd.nextInt(3) != 0)
      if (oldE.nonEmpty && newE.nonEmpty) {
        val c = Graph.transitiveClosure(oldE.toDF("src", "dst"))
        val delta = Graph.transitiveClosureDelta(c, newE.toDF("src", "dst"),
          strict = true)
        val got = pairs(c) ++ pairs(delta)
        val want = pairs(Graph.transitiveClosure(all.toDF("src", "dst")))
        assert(got === want, s"trial $trial old=$oldE new=$newE")
        assert((pairs(delta) & pairs(c)).isEmpty,
          s"trial $trial: delta repeats closure rows")
      }
    }
  }

  test("transitiveClosureDelta: empty slice yields empty delta") {
    val c = Graph.transitiveClosure(Seq((1L, 2L), (2L, 3L)).toDF("src", "dst"))
    assert(Graph.transitiveClosureDelta(c,
      Seq.empty[(Long, Long)].toDF("src", "dst")).count() === 0L)
  }

  test("delta operators: strict throws before returning incomplete results") {
    // A slice that CHAINS (12 new edges / 12 component merges) needs
    // more rounds than maxIter = 1 allows — strict must throw, never
    // hand back a silently-short delta.
    val chain = (1L until 13L).map(i => (i, i + 1))
    val emptyClosure = Seq((100L, 101L)).toDF("src", "dst")
    val e1 = intercept[IllegalStateException] {
      Graph.transitiveClosureDelta(
        Graph.transitiveClosure(emptyClosure),
        chain.toDF("src", "dst"), maxIter = 1, strict = true).count()
    }
    assert(e1.getMessage.startsWith("transitiveClosureDelta:"))
    // componentsDelta: pair up isolated two-node comps, then chain
    // them with a slice — rep-space diameter > 1.
    val asg = Graph.connectedComponents(
      (0L until 12L).map(i => (2 * i + 50, 2 * i + 51)).toDF("id_a", "id_b"))
    intercept[IllegalStateException] {
      Graph.componentsDelta(asg,
        (0L until 11L).map(i => (2 * i + 50, 2 * i + 52)).toDF("id_a", "id_b"),
        maxIter = 1, strict = true).count()
    }
  }

  test("componentsDelta strict rejects a non-canonical assignment loudly") {
    // The merge's precondition is the min-id label convention; a
    // perturbed assignment must FAIL under strict, never merge wrong.
    // (a) comp > id on a touched row:
    val badOrder = Seq((1L, 2L), (2L, 2L)).toDF("id", "comp")
    val e1 = intercept[IllegalArgumentException] {
      Graph.componentsDelta(badOrder,
        Seq((1L, 9L)).toDF("id_a", "id_b"), strict = true).count()
    }
    assert(e1.getMessage.contains("min-id"))
    // (b) a touched label that is absent from the assignment (3's
    // component rep 0 was never assigned — a migrated/truncated map):
    val missingRep = Seq((3L, 0L)).toDF("id", "comp")
    val e2 = intercept[IllegalArgumentException] {
      Graph.componentsDelta(missingRep,
        Seq((3L, 9L)).toDF("id_a", "id_b"), strict = true).count()
    }
    assert(e2.getMessage.contains("label itself"))
    // (c) a touched label that exists but does not label itself:
    val e3 = intercept[IllegalArgumentException] {
      Graph.componentsDelta(Seq((2L, 1L), (1L, 0L)).toDF("id", "comp"),
        Seq((2L, 9L)).toDF("id_a", "id_b"), strict = true).count()
    }
    assert(e3.getMessage.contains("label itself"))
    // The canonical form of the same inputs still merges fine.
    val ok = Graph.connectedComponents(Seq((1L, 2L)).toDF("id_a", "id_b"))
    assert(Graph.componentsDelta(ok,
      Seq((1L, 9L)).toDF("id_a", "id_b"), strict = true).count() === 1L)
  }

  test("componentsDelta: empty slice yields empty delta; untouched components stay put") {
    val oldAssign = Graph.connectedComponents(
      Seq((1L, 2L), (5L, 6L)).toDF("id_a", "id_b"))
    val empty = Seq.empty[(Long, Long)].toDF("id_a", "id_b")
    assert(Graph.componentsDelta(oldAssign, empty).count() === 0L)
    // A new pair bridging the two components relabels only 5 and 6
    // (onto min 1); a brand-new doc 9 pairing with 5 joins too.
    val delta = Graph.componentsDelta(oldAssign,
        Seq((2L, 5L), (9L, 5L)).toDF("id_a", "id_b"))
      .as[(Long, Long)].collect().toMap
    assert(delta === Map(5L -> 1L, 6L -> 1L, 9L -> 1L))
  }

  test("property: reachableToDelta ≡ closure delta restricted to targets, from cones only") {
    // The cone form must agree with the full-closure form
    // (transitiveClosureDelta filtered to the target set) on any
    // random DAG split — without ever being handed the closure. Also
    // pins the superset tolerance: passing the FULL closure as either
    // cone must change nothing.
    import org.apache.spark.sql.functions.col
    val rnd = new scala.util.Random(733)
    var ran = 0
    for (trial <- 1 to 5) {
      val n = 26
      val all = ((2 to n).map(k => (k.toLong, (k / 2).toLong)) ++
        (1 to 12).map { _ =>
          val a = rnd.nextInt(n - 1) + 2; (a.toLong, rnd.nextInt(a - 1).toLong + 1)
        }).distinct.filter { case (a, b) => a > b }
      val (oldE, newE) = all.partition(_ => rnd.nextInt(4) != 0)
      if (oldE.nonEmpty && newE.nonEmpty) {
        val targets = (1 to 6).map(_ => rnd.nextInt(n).toLong + 1)
          .distinct.toDF("dst")
        val oldDf = oldE.toDF("src", "dst")
        val newDf = newE.toDF("src", "dst")
        val coneT = Graph.reachableTo(oldDf, targets)
        val coneS = Graph.reachableTo(oldDf,
          newDf.select(col("src").as("dst")))
        val got = Graph.reachableToDelta(targets, coneT, coneS, newDf)
          .as[(Long, Long)].collect().toSet
        val want = Graph.transitiveClosureDelta(
            Graph.transitiveClosure(oldDf), newDf)
          .join(targets, Seq("dst"), "left_semi")
          .select("src", "dst").as[(Long, Long)].collect().toSet
        assert(got === want, s"trial $trial old=$oldE new=$newE")
        // Superset tolerance: the full closure works as either cone.
        val full = Graph.transitiveClosure(oldDf)
        val got2 = Graph.reachableToDelta(targets, full, full, newDf)
          .as[(Long, Long)].collect().toSet
        assert(got2 === want, s"trial $trial (full-closure cones)")
        ran += 1
      }
    }
    assert(ran > 0, "all randomized trials were skipped")
  }

  test("reachableToDelta edges: empty slice, already-known pairs, new-edge landing on a target") {
    import org.apache.spark.sql.functions.col
    val oldE = Seq((4L, 2L), (2L, 1L)).toDF("src", "dst")
    val targets = Seq(1L).toDF("dst")
    val coneT = Graph.reachableTo(oldE, targets)
    def coneS(n: org.apache.spark.sql.DataFrame) =
      Graph.reachableTo(oldE, n.select(col("src").as("dst")))
    // Empty slice → empty delta.
    val none = Seq.empty[(Long, Long)].toDF("src", "dst")
    assert(Graph.reachableToDelta(targets, coneT, coneS(none), none)
      .count() === 0L)
    // A new edge that only re-derives known reachability adds nothing.
    val redundant = Seq((4L, 1L)).toDF("src", "dst")
    assert(Graph.reachableToDelta(targets, coneT, coneS(redundant), redundant)
      .count() === 0L)
    // A new edge landing DIRECTLY on a target (no old suffix) and one
    // chained through the old graph both surface, restricted to T.
    val fresh = Seq((9L, 1L), (8L, 4L)).toDF("src", "dst")
    val got = Graph.reachableToDelta(targets, coneT, coneS(fresh), fresh)
      .as[(Long, Long)].collect().toSet
    assert(got === Set((9L, 1L), (8L, 1L)))
  }

  test("property: revalidateDelta ≡ full revalidation on random edge splits") {
    // The b5 contract, randomized like componentsDelta's pin: for any
    // split of a DAG edge set into OLD (folded into a closure +
    // verdicts) and NEW (today's taxonomy growth), old verdicts
    // updated by the flips equal validateReachable against the full
    // closure. Random members cover the cases: already valid, flips
    // through a delta pair, stays invalid, valid by equality.
    val rnd = new scala.util.Random(417)
    var ran = 0
    for (trial <- 1 to 5) {
      val n = 24
      // k -> k/2-ish forest plus random shortcuts kept acyclic
      // (src > dst), so the closure terminates without uniquePaths.
      val all = ((2 to n).map(k => (k.toLong, (k / 2).toLong)) ++
        (1 to 10).map { _ =>
          val a = rnd.nextInt(n - 1) + 2; (a.toLong, rnd.nextInt(a - 1).toLong + 1)
        }).distinct.filter { case (a, b) => a > b }
      val (oldE, newE) = all.partition(_ => rnd.nextInt(4) != 0)
      if (oldE.nonEmpty && newE.nonEmpty) {
        val members = (1 to 40).map { i =>
          (i.toLong, rnd.nextInt(n).toLong + 1, rnd.nextInt(n).toLong + 1)
        }.toDF("id", "typ", "target")
        val oldC = Graph.transitiveClosure(oldE.toDF("src", "dst"))
        val v = Graph.validateReachable(members, oldC, "typ", "target")
        val delta = Graph.transitiveClosureDelta(oldC, newE.toDF("src", "dst"))
        val flips = Graph.revalidateDelta(v, delta, "typ", "target")
          .select("id", "valid").as[(Long, Boolean)].collect().toMap
        val updated = v.select("id", "valid").as[(Long, Boolean)]
          .collect().toMap ++ flips
        val full = Graph.validateReachable(members,
            Graph.transitiveClosure(all.toDF("src", "dst")), "typ", "target")
          .select("id", "valid").as[(Long, Boolean)].collect().toMap
        assert(updated === full, s"trial $trial old=$oldE new=$newE")
        // Flips are genuine: every one was invalid before.
        val before = v.select("id", "valid").as[(Long, Boolean)].collect().toMap
        flips.keys.foreach { id =>
          assert(!before(id), s"trial $trial: flip of already-valid $id") }
        ran += 1
      }
    }
    // The empty-split guard must not be able to skip EVERY trial — a
    // seed/count edit that vacuously greens this test fails here.
    assert(ran > 0, "all randomized trials were skipped")
  }

  test("revalidateDelta flips exactly the delta-covered invalid rows; upsert ≡ full revalidation") {
    val oldE = Seq((3L, 2L)).toDF("src", "dst")
    val newE = Seq((4L, 3L)).toDF("src", "dst")
    val oldC = Graph.transitiveClosure(oldE)
    val members = Seq((1L, 3L, 2L), (2L, 3L, 1L), (3L, 4L, 2L), (4L, 2L, 2L))
      .toDF("id", "typ", "target")
    val v = Graph.validateReachable(members, oldC, "typ", "target")
    val delta = Graph.transitiveClosureDelta(oldC, newE)
    val flips = Graph.revalidateDelta(v, delta, "typ", "target")
      .select("id", "valid").as[(Long, Boolean)].collect().toMap
    // Member 3 (type 4 now reaches 2 through the new edge) flips;
    // member 2 stays invalid (1 is still unreachable); members 1 and
    // 4 were already valid and must NOT reappear in the delta.
    assert(flips === Map(3L -> true))
    // Upsert(old verdicts, flips) ≡ validateReachable against the
    // full closure — the monotonicity the operator rests on.
    val updated = v.select("id", "valid").as[(Long, Boolean)].collect().toMap ++ flips
    val full = Graph.validateReachable(members,
        Graph.transitiveClosure(oldE.union(newE)), "typ", "target")
      .select("id", "valid").as[(Long, Boolean)].collect().toMap
    assert(updated === full)
  }

  test("validateReachable marks reachable, equal, and unreachable") {
    val closure = Graph.transitiveClosure(Seq((1L, 2L), (2L, 3L)).toDF("src", "dst"))
    val members = Seq((10L, 1L, 3L), (11L, 1L, 1L), (12L, 3L, 1L))
      .toDF("id", "typ", "target")
    val got = Graph.validateReachable(members, closure, "typ", "target")
      .select("id", "valid").as[(Long, Boolean)].collect().toMap
    assert(got === Map(10L -> true, 11L -> true, 12L -> false))
  }

  test("validateReachable: null type/target is FALSE, never a null boolean") {
    // r12 review: false || null = NULL escaped both valid and !valid
    // filters downstream. Unvalidatable is invalid; the column is
    // total.
    val closure = Graph.transitiveClosure(Seq((1L, 2L)).toDF("src", "dst"))
    val members = Seq(
      (10L, java.lang.Long.valueOf(1L), null.asInstanceOf[java.lang.Long]),
      (11L, null.asInstanceOf[java.lang.Long], java.lang.Long.valueOf(2L)))
      .toDF("id", "typ", "target")
    val got = Graph.validateReachable(members, closure, "typ", "target")
    assert(got.filter($"valid".isNull).count() == 0, "valid must be total")
    assert(got.filter(!$"valid").count() == 2, "unvalidatable rows are invalid")
  }

  test("transitiveClosureDoubling: non-convergence warns (and throws under strict)") {
    // r12 review: the doubling variant silently returned a truncated
    // closure at maxIter where every sibling warns or throws.
    val chain = (1L until 40L).map(i => (i, i + 1)).toDF("src", "dst")
    intercept[IllegalStateException] {
      Graph.transitiveClosureDoubling(chain, maxIter = 2, strict = true)
    }
    // Non-strict still returns the (incomplete) closure.
    val c = Graph.transitiveClosureDoubling(chain, maxIter = 2)
    assert(c.count() > 0)
    // And a converging input under strict is untouched.
    val full = Graph.transitiveClosureDoubling(chain, maxIter = 10, strict = true)
    assert(full.count() == 39L * 40L / 2L)
  }

  test("ntriples parse handles uri objects, literals, language tags, junk") {
    val lines = Seq(
      "<http://ex/e/Q1> <http://ex/p/instance_of> <http://ex/e/Q5> .",
      "<http://ex/e/Q2> <http://ex/p/label> \"Ada Lovelace\"@en .",
      "<http://ex/e/Q3> <http://ex/p/qrank> \"42\" .",
      "not a triple at all").toDF("value")
    val got = NTriples.parse(lines)
      .as[(String, String, String, Boolean)].collect().toSet
    assert(got.contains(("Q1", "instance_of", "Q5", true)))
    assert(got.contains(("Q2", "label", "Ada Lovelace", false)))
    assert(got.contains(("Q3", "qrank", "42", false)))
    assert(got.exists(_._1 == ""), "malformed line should yield empty subject")
  }
}
