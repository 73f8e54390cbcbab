package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class GraphSpec extends SparkSpec {
  import spark.implicits._

  private def ranks(df: org.apache.spark.sql.DataFrame): Map[String, Long] =
    df.collect().map(r => r.getString(0) -> r.getLong(1)).toMap

  test("pageRank: one iteration matches the hand-computed scaled-integer step") {
    // A fans out to B and C; both point back — A is the hub.
    val edges = Seq(("A", "B"), ("A", "C"), ("B", "A"), ("C", "A")).toDF("src", "dst")
    val r = ranks(Graph.pageRank(edges, "src", "dst", iters = 1, scale = 1000L))
    // base = 1000*15/100 = 150; A's contribs: 1000 div 2 = 500 each;
    // inflow(A) = 1000+1000, inflow(B) = inflow(C) = 500
    assert(r == Map(
      "A" -> (150L + 85L * 2000L / 100L), // 1850
      "B" -> (150L + 85L * 500L / 100L),  // 575
      "C" -> (150L + 85L * 500L / 100L)))
    graft.core.CacheRegistry.unpersistAll()
  }

  test("pageRank: truncating division and dangling/no-inlink nodes") {
    // A has 3 outlinks: each contrib is 1000 div 3 = 333 (trunc, not
    // round); D is dangling (no outlinks — its mass drops), A has no
    // inlinks and settles at base.
    val edges = Seq(("A", "B"), ("A", "C"), ("A", "D")).toDF("src", "dst")
    val r = ranks(Graph.pageRank(edges, "src", "dst", iters = 1, scale = 1000L))
    assert(r("A") == 150L)
    assert(r("B") == 150L + 85L * 333L / 100L) // 433 — trunc twice
    assert(r == Map("A" -> 150L, "B" -> 433L, "C" -> 433L, "D" -> 433L))
    graft.core.CacheRegistry.unpersistAll()
  }

  test("pageRank: ring is a fixed point; deep runs checkpoint without changing values") {
    val ring = Seq(("A", "B"), ("B", "C"), ("C", "A")).toDF("src", "dst")
    // every node: inflow = scale div 1, next = base + 85%*scale... the
    // symmetric ring keeps all nodes equal at every iteration
    val one = ranks(Graph.pageRank(ring, "src", "dst", iters = 1))
    val deep = ranks(Graph.pageRank(ring, "src", "dst", iters = 12, checkpointIters = 4))
    assert(one.values.toSet.size == 1 && deep.values.toSet.size == 1)
    // duplicate edges collapse: doubling the edge list changes nothing
    val dup = ranks(Graph.pageRank(ring.unionAll(ring), "src", "dst", iters = 1))
    assert(dup == one)
    graft.core.CacheRegistry.unpersistAll()
  }

  test("trustRank: teleport lands only on seeds; untrusted components decay to zero") {
    // hub graph + a disconnected X→Y component; A is the only seed
    val edges = Seq(("A", "B"), ("A", "C"), ("B", "A"), ("C", "A"), ("X", "Y"))
      .toDF("src", "dst")
    val seeds = Seq("A").toDF("seed")
    val r1 = ranks(Graph.trustRank(edges, "src", "dst", seeds, "seed", iters = 1, scale = 1000L))
    // init: A=1000, rest 0. A's contribs 1000 div 2 = 500 to B and C;
    // B,C,X contribute 0. next: A = 150 (its inflow is all zeros),
    // B = C = 85*500 div 100 = 425; X, Y stay 0.
    assert(r1 == Map("A" -> 150L, "B" -> 425L, "C" -> 425L, "X" -> 0L, "Y" -> 0L))
    val r2 = ranks(Graph.trustRank(edges, "src", "dst", seeds, "seed", iters = 2, scale = 1000L))
    // iter2: A's contribs 150 div 2 = 75; inflow(A) = 425+425 = 850 →
    // A = 150 + 85*850 div 100 = 872; B = C = 85*75 div 100 = 63
    assert(r2 == Map("A" -> 872L, "B" -> 63L, "C" -> 63L, "X" -> 0L, "Y" -> 0L))
    // plain PageRank IS trustRank with every vertex seeded
    val allSeeds = Seq("A", "B", "C", "X", "Y").toDF("seed")
    val pr = ranks(Graph.pageRank(edges, "src", "dst", iters = 2, scale = 1000L))
    val tr = ranks(Graph.trustRank(edges, "src", "dst", allSeeds, "seed", iters = 2, scale = 1000L))
    assert(pr == tr)
    // isolated seeds (not in the edge list) are ignored
    val ghost = ranks(Graph.trustRank(edges, "src", "dst",
      Seq("A", "GHOST").toDF("seed"), "seed", iters = 1, scale = 1000L))
    assert(ghost == r1)
    graft.core.CacheRegistry.unpersistAll()
  }

  test("hopDistance: multi-source BFS takes the minimum hop, respects maxHops") {
    //   A → B → C → D → E,  F → C  (F and A both seeds)
    val edges = Seq(("A", "B"), ("B", "C"), ("C", "D"), ("D", "E"), ("F", "C"))
      .toDF("src", "dst")
    val seeds = Seq("A", "F", "A").toDF("seed") // duplicate seed collapses
    val out = Graph.hopDistance(edges, "src", "dst", seeds, "seed", maxHops = 2)
      .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    // C is 2 hops from A but 1 from F — min wins; E (3 hops via
    // F→C→D→E) is beyond the cap; unreached nodes are absent, not null
    assert(out == Map("A" -> 0, "F" -> 0, "B" -> 1, "C" -> 1, "D" -> 2))
    // maxHops = 0 returns exactly the seed set
    val justSeeds = Graph.hopDistance(edges, "src", "dst", seeds, "seed", maxHops = 0)
      .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    assert(justSeeds == Map("A" -> 0, "F" -> 0))
    // early exit: a frontier that dies before maxHops terminates the loop
    val far = Graph.hopDistance(edges, "src", "dst", seeds, "seed", maxHops = 50)
      .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    assert(far == Map("A" -> 0, "F" -> 0, "B" -> 1, "C" -> 1, "D" -> 2, "E" -> 3))
    graft.core.CacheRegistry.unpersistAll()
  }

  test("pageRank: hub ranking is stable across partitioning (integer arithmetic)") {
    val rnd = new scala.util.Random(7)
    val edges = (0 until 400)
      .map(_ => (s"n${rnd.nextInt(40)}", s"n${rnd.nextInt(40)}"))
      .filter { case (a, b) => a != b }
      .toDF("src", "dst")
    val a = ranks(Graph.pageRank(edges.repartition(1), "src", "dst", iters = 3))
    val b = ranks(Graph.pageRank(edges.repartition(7), "src", "dst", iters = 3))
    assert(a == b) // bit-exact, not approximately equal
    graft.core.CacheRegistry.unpersistAll()
  }

  test("kCore: peels pendant chains to the true core, handles total collapse") {
    // triangle {1,2,3} + chain 3-4-5: the 2-core is exactly the
    // triangle (4,5 peel off in two rounds — a one-round peel would
    // wrongly keep node 4, degree 2 before 5 vanishes)
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L), (4L, 5L)).toDF("s", "d")
    val core = Graph.kCore(edges, col("s"), col("d"), k = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(core == Map(1L -> 2L, 2L -> 2L, 3L -> 2L))
    // k above the densest subgraph: everything peels away, empty result
    assert(Graph.kCore(edges, col("s"), col("d"), k = 3).count() == 0L)
    // maxRounds bound: one round keeps the partially-peeled superset
    val partial = Graph.kCore(edges, col("s"), col("d"), k = 2, maxRounds = 1)
      .select("node").as[Long].collect().toSet
    assert(partial == Set(1L, 2L, 3L, 4L))
  }

  test("kCore laws on a random graph: min-degree holds, result is a fixpoint") {
    val rnd = new scala.util.Random(23)
    val edges = (0 until 600)
      .map(_ => (rnd.nextInt(80).toLong, rnd.nextInt(80).toLong))
      .filter { case (a, b) => a != b }
      .toDF("s", "d")
    val core = Graph.kCore(edges, col("s"), col("d"), k = 4)
    val degs = core.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(degs.nonEmpty && degs.values.forall(_ >= 4L)) // min-degree invariant
    // fixpoint: peeling the core's own edge set again changes nothing
    val coreEdges = edges
      .join(core.select(col("node").as("s")), Seq("s"), "left_semi")
      .join(core.select(col("node").as("d")), Seq("d"), "left_semi")
    val again = Graph.kCore(coreEdges, col("s"), col("d"), k = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(again == degs)
  }

  test("labelPropagation: two cliques joined by a bridge separate; ties go min") {
    // K3 {1,2,3} and K3 {10,11,12} with bridge 3-10. Round 1: clique
    // nodes see two clique labels + maybe the bridge; min tie-break
    // pulls each clique to its min id, and the communities stabilize.
    val edges = Seq(
      (1L, 2L), (2L, 3L), (1L, 3L),
      (10L, 11L), (11L, 12L), (10L, 12L), (3L, 10L)).toDF("s", "d")
    val out = Graph.labelPropagation(edges, col("s"), col("d"), rounds = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out(1L) == 1L && out(2L) == 1L && out(3L) == 1L)
    // the bridge leaks 3's early label into the right clique, which
    // then keeps it — the cliques still end as two distinct communities
    assert(out(10L) == out(11L) && out(11L) == out(12L))
    assert(out(10L) != out(1L))
    // round-pinned determinism: same rounds, different partitioning
    val again = Graph.labelPropagation(
        edges.repartition(7), col("s"), col("d"), rounds = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(again == out)
  }

  test("labelPropagation round 1 is the exact neighbor-min on a star") {
    // star center 5 with leaves 1,2,3: every leaf sees only {5}; the
    // center sees {1,2,3} each once -> tie -> min = 1
    val edges = Seq((5L, 1L), (5L, 2L), (5L, 3L)).toDF("s", "d")
    val out = Graph.labelPropagation(edges, col("s"), col("d"), rounds = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(5L -> 1L, 1L -> 5L, 2L -> 5L, 3L -> 5L))
  }

  test("shortestPaths: hand-checked relaxation horizon and weight minimum") {
    //   1 --4--> 2 --1--> 3          1 --10--> 3 (direct, longer)
    val edges = Seq((1L, 2L, 4L), (2L, 3L, 1L), (1L, 3L, 10L)).toDF("s", "d", "w")
    val srcs = Seq(1L).toDF("n")
    def run(r: Int) = Graph.shortestPaths(
        edges, col("s"), col("d"), col("w"), srcs, col("n"), rounds = r)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    // one round: only direct edges relaxed — 3 is reached at 10
    assert(run(1) == Map(1L -> 0L, 2L -> 4L, 3L -> 10L))
    // two rounds: the 2-hop path 1->2->3 = 5 beats the direct 10
    assert(run(2) == Map(1L -> 0L, 2L -> 4L, 3L -> 5L))
    // sources are never displaced from 0 (self-min holds)
    val back = Seq((3L, 1L, 1L)).toDF("s", "d", "w")
    val out = Graph.shortestPaths(edges.unionAll(back),
        col("s"), col("d"), col("w"), srcs, col("n"), rounds = 5)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(out(1L) == 0L)
  }

  test("degreeCentralization: star 1, cycle 0, hand density") {
    // star K1,3: centralization exactly 1, density 3/6
    val star = Seq(("h", "a"), ("h", "b"), ("h", "c")).toDF("s", "d")
    val r = Graph.degreeCentralization(star, col("s"), col("d"))
      .collect().head
    assert(r.getAs[Long]("n_nodes") == 4L && r.getAs[Long]("n_edges") == 3L &&
      r.getAs[Long]("dmax") == 3L)
    assert(r.getAs[Long]("density_ppm") == 500000L)
    assert(r.getAs[Long]("centralization_ppm") == 1000000L)
    // 4-cycle: regular -> centralization 0; density 4/6; duplicate
    // and reversed edges collapse
    val cyc = Seq(("a", "b"), ("b", "a"), ("b", "c"), ("c", "d"), ("d", "a"),
      ("a", "d")).toDF("s", "d")
    val rc = Graph.degreeCentralization(cyc, col("s"), col("d"))
      .collect().head
    assert(rc.getAs[Long]("n_edges") == 4L)
    assert(rc.getAs[Long]("density_ppm") == 666666L)
    assert(rc.getAs[Long]("centralization_ppm") == 0L)
    // a single edge: density defined, centralization not (n < 3)
    val pair = Seq(("a", "b")).toDF("s", "d")
    val rp = Graph.degreeCentralization(pair, col("s"), col("d"))
      .collect().head
    assert(rp.getAs[Long]("density_ppm") == 1000000L &&
      rp.isNullAt(rp.fieldIndex("centralization_ppm")))
  }

  test("reciprocity: hand dyad/weight shares, DAG zero, symmetric one") {
    // a->b x2, b->a x1, a->c x1: 3 distinct edges, 2 reciprocal;
    // weighted: min-flow 2 of 4 total
    val e = Seq(("a", "b"), ("a", "b"), ("b", "a"), ("a", "c")).toDF("s", "d")
    val r = Graph.reciprocity(e, col("s"), col("d")).collect().head
    assert(r.getAs[Long]("n_edges") == 3L && r.getAs[Long]("w_total") == 4L)
    assert(r.getAs[Long]("recip_edges") == 2L)
    assert(r.getAs[Long]("recip_ppm") == 666666L)
    assert(r.getAs[Long]("recip_w_ppm") == 500000L)
    // DAG: zero both ways; self-loops excluded from all counts
    val dag = Seq(("a", "b"), ("b", "c"), ("x", "x")).toDF("s", "d")
    val rd = Graph.reciprocity(dag, col("s"), col("d")).collect().head
    assert(rd.getAs[Long]("n_edges") == 2L &&
      rd.getAs[Long]("recip_ppm") == 0L && rd.getAs[Long]("recip_w_ppm") == 0L)
    // fully symmetric: 1e6 exactly
    val sym = Seq(("a", "b"), ("b", "a"), ("b", "c"), ("c", "b")).toDF("s", "d")
    val rs = Graph.reciprocity(sym, col("s"), col("d")).collect().head
    assert(rs.getAs[Long]("recip_ppm") == 1000000L &&
      rs.getAs[Long]("recip_w_ppm") == 1000000L)
  }

  test("triangleCounts: hand-checked census, dirty edge list tolerated") {
    // triangle {1,2,3}, pendant 3-4, square 4-5-6-7 (no closure),
    // plus a self-loop, a duplicate, and a reversed duplicate
    val edges = Seq(
      (1L, 2L), (2L, 3L), (3L, 1L),
      (3L, 4L),
      (4L, 5L), (5L, 6L), (6L, 7L), (7L, 4L),
      (2L, 2L),          // self-loop: dropped
      (1L, 2L),          // duplicate: collapsed
      (3L, 2L))          // reversed duplicate: collapsed
      .toDF("s", "d")
    val out = Graph.triangleCounts(edges, col("s"), col("d"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    // degrees: 1->2, 2->2, 3->3; clustering 2*1/(d*(d-1))
    assert(out == Map(
      1L -> ((2L, 1L, 1.0)),
      2L -> ((2L, 1L, 1.0)),
      3L -> ((3L, 1L, 1.0 / 3.0))))
    graft.core.CacheRegistry.unpersistAll()
  }

  test("hits: one round matches the hand-computed scaled-integer step, long keys") {
    // Bipartite: hubs 2,4 (even), authorities 1,3 (odd). h0 = 1000 each.
    //   edges: 2→1, 2→3, 4→3
    // a-step raw: a(1)=1000, a(3)=2000; max=2000 → a(1)=500, a(3)=1000
    // h-step raw: h(2)=500+1000=1500, h(4)=1000; max=1500
    //   → h(2)=1000, h(4)=1000*1000 div 1500 = 666
    val edges = Seq((2L, 1L), (2L, 3L), (4L, 3L)).toDF("src", "dst")
    val out = Graph.hits(edges, col("src"), col("dst"), rounds = 1, scale = 1000L)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(out == Map(
      2L -> ((1000L, 0L)),
      4L -> ((666L, 0L)),
      1L -> ((0L, 500L)),
      3L -> ((0L, 1000L))))
    // node keys keep the caller's integral type through the supersteps
    val schema = Graph.hits(edges, col("src"), col("dst"), rounds = 1)
      .schema("node").dataType
    assert(schema == org.apache.spark.sql.types.LongType)
    graft.core.CacheRegistry.unpersistAll()
  }

  test("triangleCounts: K4 counts every face once, partitioning-invariant") {
    // K4 has 4 triangles; every vertex sits in 3 of them, clustering 1
    val k4 = (for { a <- 1 to 4; b <- 1 to 4 if a < b } yield (a.toLong, b.toLong))
      .toDF("s", "d")
    def census(df: org.apache.spark.sql.DataFrame) =
      Graph.triangleCounts(df, col("s"), col("d"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    val expected = (1 to 4).map(n => (n.toLong, 3L, 3L, 1.0)).toSet
    assert(census(k4) == expected)
    assert(census(k4.repartition(5)) == expected)
    graft.core.CacheRegistry.unpersistAll()
  }

  test("modularity: closed-form check on two triangles joined by one edge") {
    // Communities {1,2,3} and {4,5,6}: two triangles + bridge 3-4.
    // m=7, intra L_c=3 each, D_A=D_B=7:
    // Q = 2*(3/7 - (7/14)^2) = 6/7 - 1/2 = 5/14 ~ 0.357143
    val und = Seq((1L, 2L), (2L, 3L), (1L, 3L), (4L, 5L), (5L, 6L), (4L, 6L), (3L, 4L))
    val edges = (und ++ und.map(_.swap)).toDF("src", "dst")
    val labels = Seq((1L, "A"), (2L, "A"), (3L, "A"), (4L, "B"), (5L, "B"), (6L, "B"))
      .toDF("node", "comm")
    val r = Graph.modularity(edges, col("src"), col("dst"),
      labels, col("node"), col("comm")).collect().head
    assert(r.getAs[Long]("communities") == 2L)
    assert(r.getAs[Long]("m_edges") == 7L)
    // Q*E^2 with E=14: 2*(14*6 - 49) = 70; denom 196; 70/196 = 5/14
    assert(r.getAs[Double]("q_num") == 70.0)
    assert(r.getAs[Double]("q_denom") == 196.0)
    assert(r.getAs[Double]("modularity") == math.rint(5.0 / 14.0 * 1e6) / 1e6 ||
      math.abs(r.getAs[Double]("modularity") - 5.0 / 14.0) < 1e-6)
  }

  test("modularity of a single all-in-one community is exactly zero") {
    val und = Seq((1L, 2L), (2L, 3L))
    val edges = (und ++ und.map(_.swap)).toDF("src", "dst")
    val labels = Seq(1L, 2L, 3L).map(_ -> "all").toDF("node", "comm")
    val r = Graph.modularity(edges, col("src"), col("dst"),
      labels, col("node"), col("comm")).collect().head
    // L=m and D=2m: Q = m/m - (2m/2m)^2 = 0 exactly
    assert(r.getAs[Double]("q_num") == 0.0 && r.getAs[Double]("modularity") == 0.0)
  }

  test("hashWalks: deterministic, correct length, dead ends stay in place") {
    // path graph 1 -> 2 -> 3 (directed): from 1 the only walk is 1>2>3>3
    val chain = Seq((1L, 2L), (2L, 3L)).toDF("src", "dst")
    val starts = Seq(1L).toDF("n")
    val w = Graph.hashWalks(chain, col("src"), col("dst"),
      starts, col("n"), steps = 3).collect().head
    assert(w.getLong(0) == 1L && w.getLong(1) == 3L)
    assert(w.getString(2) == "1>2>3>3")
    // branching: the pick is a pure hash function — two runs agree
    val fan = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 1L), (3L, 1L), (4L, 1L))
      .toDF("src", "dst")
    val p1 = Graph.hashWalks(fan, col("src"), col("dst"), starts, col("n"), 4)
      .collect().head.getString(2)
    val p2 = Graph.hashWalks(fan, col("src"), col("dst"), starts, col("n"), 4)
      .collect().head.getString(2)
    assert(p1 == p2 && p1.split(">").length == 5)
  }

  test("degreeDistribution: star graph — hub degree n, leaves degree 1") {
    // undirected star on 5 nodes: symmetrize 4 hub-leaf edges
    val e = (1L to 4L).map(l => (0L, l)).toDF("src", "dst")
    val sym = e.unionAll(e.select(col("dst").as("src"), col("src").as("dst")))
    val out = Graph.degreeDistribution(sym, col("src"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // total degree 8: hub bucket 4/8 = 500000 ppm, leaf bucket 4·1/8
    assert(out == Map(4L -> ((1L, 500000L)), 1L -> ((4L, 500000L))))
  }

  test("commonNeighborPairs: shared-destination counts, Jaccard ppm, hub cap") {
    // sources 1,2 share dests {10,11}; 3 shares only 10 with them;
    // dest 99 is a hub pointed at by everyone but capped out (maxDeg=2
    // keeps 10[in=3]? no: in-degree of 10 is 3 -> dropped; use 11)
    val e = Seq(
      (1L, 10L), (1L, 11L), (2L, 10L), (2L, 11L), (3L, 10L)
    ).toDF("s", "d")
    val out = Graph.commonNeighborPairs(e, col("s"), col("d"), maxDeg = 3, k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    // (1,2): common 2, degs 2/2 -> jaccard 2/2 = 1000000 ppm
    // (1,3),(2,3): common 1, degs 2/1 -> 1/2 = 500000 ppm
    assert(out == Map(
      (1L, 2L) -> ((2L, 2L, 2L, 1000000L)),
      (1L, 3L) -> ((1L, 2L, 1L, 500000L)),
      (2L, 3L) -> ((1L, 2L, 1L, 500000L))))
    // with maxDeg=2 destination 10 (in-degree 3) is dropped: only (1,2) via 11
    val capped = Graph.commonNeighborPairs(e, col("s"), col("d"), maxDeg = 2, k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(capped == Set((1L, 2L, 1L)))
  }

  test("harmonicCentrality: path-graph closed form with full seed coverage") {
    // a—b—c—d (symmetric): with every node a seed, H(a) = 1 + 1/2 +
    // 1/3 -> 1833333 ppm floors; H(b) = H(c) = 1 + 1 + 1/2 -> 2500000
    val e = Seq(("a", "b"), ("b", "a"), ("b", "c"), ("c", "b"),
      ("c", "d"), ("d", "c")).toDF("s", "d")
    val out = Graph.harmonicCentrality(e, col("s"), col("d"),
      nSeeds = 4, maxHops = 3, k = 10)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2))))
    // ordering: the two centre nodes first (tie broken by node asc)
    assert(out.take(2).map(_._1).toSeq == Seq("b", "c"))
    val m = out.toMap
    assert(m("a") == ((3L, 1833333L)) && m("d") == ((3L, 1833333L)))
    assert(m("b") == ((3L, 2500000L)) && m("c") == ((3L, 2500000L)))
    // one seed: every other node reached by exactly that seed
    val one = Graph.harmonicCentrality(e, col("s"), col("d"),
      nSeeds = 1, maxHops = 3, k = 10).collect()
    assert(one.length == 3 && one.forall(_.getLong(1) == 1L))
    // hop cap: with maxHops = 1 only direct neighbours score
    val capped = Graph.harmonicCentrality(e, col("s"), col("d"),
      nSeeds = 4, maxHops = 1, k = 10)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(capped("b") == 2000000L && capped("a") == 1000000L)
  }

  test("distanceSummary: path-graph closed form") {
    // a—b—c—d, all 4 seeded, hops 3: 12 reached pairs, dist histogram
    // {1: 6, 2: 4, 3: 2} -> diameter 3, d50 = 1 (6/12), d90 = 3
    // (10/12 < 90% at d=2), mean = 20·10⁶ div 12
    val e = Seq(("a", "b"), ("b", "a"), ("b", "c"), ("c", "b"),
      ("c", "d"), ("d", "c")).toDF("s", "d")
    val r = Graph.distanceSummary(e, col("s"), col("d"),
      nSeeds = 4, maxHops = 3).collect().head
    assert((r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(4), r.getLong(5)) == ((4, 12L, 3L, 1L, 3L, 1666666L)))
    // hop cap: maxHops = 1 sees only the 6 adjacent pairs
    val capped = Graph.distanceSummary(e, col("s"), col("d"),
      nSeeds = 4, maxHops = 1).collect().head
    assert(capped.getLong(1) == 6L && capped.getLong(2) == 1L)
  }

  test("betweennessSampled: path closed form; diamond splits σ; hop cap pins pairs") {
    // path a—b—c—d, all 4 nodes seeded: middles are b {(a,c),(a,d)} and
    // c {(a,d),(b,d)} — 2 pairs × 10⁶ each; endpoints never middle.
    val path = Seq(("a", "b"), ("b", "a"), ("b", "c"), ("c", "b"),
      ("c", "d"), ("d", "c")).toDF("s", "d")
    val out = Graph.betweennessSampled(path, col("s"), col("d"),
      nSeeds = 4, maxHops = 3, k = 10)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2))))
    assert(out.toSeq == Seq("b" -> ((2L, 2000000L)), "c" -> ((2L, 2000000L))))
    // diamond a—b—d—c—a: every opposite pair has σ = 2 through two
    // 1-path middles -> each node scores (10⁶·1·1) div 2 from exactly
    // one pair; ties broken by node asc
    val diamond = Seq(("a", "b"), ("b", "a"), ("a", "c"), ("c", "a"),
      ("b", "d"), ("d", "b"), ("c", "d"), ("d", "c")).toDF("s", "d")
    val dm = Graph.betweennessSampled(diamond, col("s"), col("d"),
      nSeeds = 4, maxHops = 2, k = 10)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2))))
    assert(dm.toSeq == Seq("a" -> ((1L, 500000L)), "b" -> ((1L, 500000L)),
      "c" -> ((1L, 500000L)), "d" -> ((1L, 500000L))))
    // maxHops = 1 on the path: no pair at distance 1 has a middle
    assert(Graph.betweennessSampled(path, col("s"), col("d"),
      nSeeds = 4, maxHops = 1, k = 10).isEmpty)
  }

  test("adamicAdarPairs: rare shared neighbors outweigh hubs; exact terms") {
    // sources {1,2,3} all share dest 10 (in=3); {1,2} also share the
    // RARER dest 11 (in=2). RA terms: 10 -> 10^6 div 3 = 333333,
    // 11 -> 500000. AA terms: 1/ln3 = 0.910239, 1/ln2 = 1.442695 (6dp)
    val e = Seq(
      (1L, 10L), (1L, 11L), (2L, 10L), (2L, 11L), (3L, 10L)
    ).toDF("s", "d")
    val out = Graph.adamicAdarPairs(e, col("s"), col("d"), maxDeg = 3, k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getDouble(3), r.getLong(4)))).toMap
    assert(out == Map(
      (1L, 2L) -> ((2L, 2.352934d, 833333L)),
      (1L, 3L) -> ((1L, 0.910239d, 333333L)),
      (2L, 3L) -> ((1L, 0.910239d, 333333L))))
    // a destination with in-degree 1 cannot be shared: unaffected
    val e1 = e.union(Seq((1L, 12L)).toDF("s", "d"))
    assert(Graph.adamicAdarPairs(e1, col("s"), col("d"), maxDeg = 3, k = 10)
      .collect().length == 3)
    // ordering: the pair sharing the rare dest ranks first by ra_ppm
    val first = Graph.adamicAdarPairs(e, col("s"), col("d"), maxDeg = 3, k = 1)
      .collect().head
    assert(first.getLong(0) == 1L && first.getLong(1) == 2L)
  }

  test("pageRankWeighted: scatter follows weight; uniform weights = plain PR") {
    // 1 -> {2 (w=3), 3 (w=1)}: node 2 receives 3x node 3's inflow
    val e = Seq((1L, 2L, 3L), (1L, 3L, 1L), (2L, 1L, 1L), (3L, 1L, 1L))
      .toDF("src", "dst", "w")
    val out = Graph.pageRankWeighted(e, "src", "dst", "w", iters = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // from 1: 1e9*3 div 4 = 75e7 to node 2, 25e7 to node 3
    assert(out(2L) == 150000000L + 85L * 750000000L / 100L)
    assert(out(3L) == 150000000L + 85L * 250000000L / 100L)
    // all-equal weights reproduce plain pageRank exactly
    val uni = Seq((1L, 2L, 5L), (2L, 3L, 5L), (3L, 1L, 5L)).toDF("src", "dst", "w")
    val pw = Graph.pageRankWeighted(uni, "src", "dst", "w", iters = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val pr = Graph.pageRank(uni.select(col("src"), col("dst")), "src", "dst", iters = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(pw == pr)
    // duplicate edges merge by SUMMING weight
    val dup = Seq((1L, 2L, 1L), (1L, 2L, 2L), (1L, 3L, 3L), (2L, 1L, 1L), (3L, 1L, 1L))
      .toDF("src", "dst", "w")
    val d = Graph.pageRankWeighted(dup, "src", "dst", "w", iters = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(d(2L) == d(3L)) // merged 1->2 weight 3 equals 1->3 weight 3
  }

  test("degreeAssortativity: perfect star is exactly r = -1") {
    val e = (1L to 4L).map(l => (0L, l)).toDF("src", "dst")
    val sym = e.unionAll(e.select(col("dst").as("src"), col("src").as("dst")))
    val r = Graph.degreeAssortativity(sym, col("src"), col("dst"))
      .collect().head
    assert(r.getLong(0) == 8L)
    assert(r.getDouble(1) == -1.0)
  }

  test("moranI: homophilous components hit 1; hand path value") {
    // two equal-value pairs, edges within pairs only: perfect homophily
    val e1 = Seq((1L, 2L), (3L, 4L)).toDF("src", "dst")
    val v1 = Seq((1L, 4L), (2L, 4L), (3L, 0L), (4L, 0L)).toDF("n", "x")
    val r1 = Graph.moranI(e1, col("src"), col("dst"), v1, col("n"), col("x"))
      .collect().head
    assert(r1.getAs[Long]("n") == 4L && r1.getAs[Long]("e") == 2L)
    assert(r1.getAs[Double]("moran_i") == 1.0d)
    assert(r1.getAs[Double]("geary_c") == 0.0d) // zero neighbor gaps
    assert(r1.getAs[Long]("ei_micros") == -333333L)
    // path 1-2-3 with values 1,1,5: Z = (−4,−4,8), ΣZuZv = 16 − 32,
    // I = 3·(−16)/(2·96) = −0.25
    val e2 = Seq((1L, 2L), (2L, 3L)).toDF("src", "dst")
    val v2 = Seq((1L, 1L), (2L, 1L), (3L, 5L)).toDF("n", "x")
    val r2 = Graph.moranI(e2, col("src"), col("dst"), v2, col("n"), col("x"))
      .collect().head
    assert(r2.getAs[Double]("moran_i") == -0.25d)
    // C = 2·9·16/(2·2·96) = 0.75
    assert(r2.getAs[Double]("geary_c") == 0.75d)
    // constant attribute: denominator 0 -> null
    val v3 = Seq((1L, 7L), (2L, 7L), (3L, 7L)).toDF("n", "x")
    val r3 = Graph.moranI(e2, col("src"), col("dst"), v3, col("n"), col("x"))
      .collect().head
    assert(r3.isNullAt(r3.fieldIndex("moran_i")))
  }

  test("richClub: star has no club; clique is a perfect one") {
    // star 0-{1..4}: above r=0 everyone, density 2·4/(5·4) = 400000 ppm;
    // above r=1 only the hub -> club of 1, null
    val star = (1L to 4L).map(l => (0L, l)).toDF("src", "dst")
    val rs = Graph.richClub(star, col("src"), col("dst"), Seq(0L, 1L))
      .collect().map(r => r.getAs[Long]("r") -> r).toMap
    assert(rs(0L).getAs[Long]("club_nodes") == 5L &&
      rs(0L).getAs[Long]("club_edges") == 4L &&
      rs(0L).getAs[Long]("phi_ppm") == 400000L)
    assert(rs(1L).getAs[Long]("club_nodes") == 1L &&
      rs(1L).isNullAt(rs(1L).fieldIndex("phi_ppm")))
    // K4: every degree 3, the r=2 club is the whole clique at 1.0
    val k4 = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L))
      .toDF("src", "dst")
    val rk = Graph.richClub(k4, col("src"), col("dst"), Seq(2L))
      .collect().head
    assert(rk.getAs[Long]("club_nodes") == 4L &&
      rk.getAs[Long]("club_edges") == 6L &&
      rk.getAs[Long]("phi_ppm") == 1000000L)
  }

  test("clusteringSummary: triangle+pendant hand values; cycle is 0/0") {
    // triangle 1-2-3 plus pendant 3-4: T = 1, doubled wedges = 10,
    // local cc ppm = 1e6, 1e6, 333333 over the three d>=2 nodes
    val e = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L)).toDF("src", "dst")
    val r = Graph.clusteringSummary(e, col("src"), col("dst"))
      .collect().head
    assert(r.getAs[Long]("n_nodes") == 4L && r.getAs[Long]("n_nodes_d2") == 3L)
    assert(r.getAs[Long]("n_triangles") == 1L)
    assert(r.getAs[Long]("transitivity_ppm") == 600000L) // 3T/W = 3/5
    assert(r.getAs[Long]("avg_cc_ppm") == 777777L) // (1e6+1e6+333333) div 3
    // 4-cycle: wedges but no triangles -> both zero, nothing null
    val c = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L)).toDF("src", "dst")
    val rc = Graph.clusteringSummary(c, col("src"), col("dst"))
      .collect().head
    assert(rc.getAs[Long]("n_triangles") == 0L)
    assert(rc.getAs[Long]("transitivity_ppm") == 0L)
    assert(rc.getAs[Long]("avg_cc_ppm") == 0L)
  }
}
