package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK

/** Link-analysis operators for corpus quality scoring. Web-scale
  * training-data pipelines rank pages by link structure before
  * content-level filtering (the CommonCrawl lineage: a host-graph
  * centrality prunes spam farms that pass every text heuristic), so
  * PageRank belongs next to dedup/quality as a first-class corpus
  * operator.
  */
object Graph {

  /** PageRank over a directed edge list — in SCALED-INTEGER arithmetic
    * so the result is bit-exact on any engine and any partitioning.
    * Scores start at `scale` (1.0 ≙ `scale`); each iteration a node
    * keeps `base = scale·(dampDen−dampNum)/dampDen` and receives
    * `dampNum/dampDen` of its truncating-integer-divided inflow:
    *
    * {{{ next(v) = base + (dampNum · Σ_{u→v} score(u) div outdeg(u)) div dampDen }}}
    *
    * Every operation is bigint add / multiply / truncating divide —
    * associative-commutative sums, no floats — so shuffle order,
    * partition count, and engine (Spark vs the DuckDB oracle's chained
    * CTEs) cannot perturb a single bit. The classic float formulation
    * converges to the same ranking; the integer form trades ~1e-9
    * relative precision per step for cross-engine reproducibility.
    * Dangling mass (nodes with no outlinks) is dropped, as in the
    * original formulation's simplest variant; callers who need
    * stochasticity can add self-loops.
    *
    * Scale shape: edges are deduplicated, pre-joined with out-degrees
    * ONCE, and persisted partitioned on `src`, so each iteration is
    * exactly two shuffles of |E| rows — the score join on `src`
    * (co-partitioned with the persisted edge layout) and the inflow
    * aggregation on `dst` (map-side partial sums). Driver state is
    * zero; scores stay a |V|-row frame, eagerly `localCheckpoint`ed
    * every `checkpointIters` iterations. The default of 1 is the
    * Pregel/GraphX superstep discipline — materializing each
    * iteration's |V|-row frame both truncates lineage AND hands AQE
    * real sizes, so the score join broadcasts whenever |V| is small
    * enough and degrades to a co-partitioned shuffle join when it
    * isn't (measured 1.6× faster than a fused 3-iteration plan even on
    * a 16k-node graph). Raise it only for tiny graphs where per-round
    * job overhead dominates.
    */
  def pageRank(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      iters: Int,
      scale: Long = 1000000000L,
      dampNum: Long = 85L,
      dampDen: Long = 100L,
      checkpointIters: Int = 1): DataFrame =
    prLoop(edges, srcCol, dstCol, None, None, iters, scale, dampNum, dampDen, checkpointIters)

  /** Edge-weighted PageRank: each node scatters its score
    * PROPORTIONALLY to edge weight — contrib(v→u) =
    * (score·w_vu) div Σ_x w_vx — so a supplier trading 100 orders
    * with a customer endorses it 100× harder than a one-off. Same
    * scaled-integer superstep discipline as [[pageRank]] (one score
    * join + one aggregate per iteration over the persisted
    * weight-decorated edges), bit-exact under any shuffle order.
    * Duplicate (src, dst) edges merge by SUMMING weights. Keep
    * `scale·max(w)` comfortably under 2⁶³ (the per-edge product is
    * the widest intermediate — at the 1e9 default scale that allows
    * weights to ~1e9).
    */
  def pageRankWeighted(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      weightCol: String,
      iters: Int,
      scale: Long = 1000000000L,
      dampNum: Long = 85L,
      dampDen: Long = 100L,
      checkpointIters: Int = 1): DataFrame =
    prLoop(edges, srcCol, dstCol, None, Some(weightCol), iters, scale,
      dampNum, dampDen, checkpointIters)

  /** Personalized PageRank (TrustRank, Gyöngyi et al. VLDB'04): the
    * teleport term lands ONLY on a trusted seed set, so score measures
    * endorsement reachable from the seeds — pages no trust path
    * reaches decay toward 0, which is exactly the spam-demotion signal
    * crawl pipelines combine with [[hopDistance]]. Identical
    * scaled-integer step as [[pageRank]] with `base` masked by seed
    * membership:
    *
    * {{{ next(v) = [v ∈ seeds]·base + (dampNum · inflow(v)) div dampDen }}}
    *
    * (plain PageRank is the special case where every vertex is a
    * seed). Same loop, same bit-exactness, same superstep scale shape.
    * Seeds absent from the edge list are ignored — an isolated seed
    * has no edges to propagate trust over.
    */
  def trustRank(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      seeds: DataFrame,
      seedCol: String,
      iters: Int,
      scale: Long = 1000000000L,
      dampNum: Long = 85L,
      dampDen: Long = 100L,
      checkpointIters: Int = 1): DataFrame =
    prLoop(edges, srcCol, dstCol, Some(seeds.select(col(seedCol).as("node"))),
      None, iters, scale, dampNum, dampDen, checkpointIters)

  /** Establish the iterative loops' src-hash edge layout from a
    * `(src, dst)` projection. Default: ONE exchange — hash-partition
    * by src, then dedup on the layout (hash-partitioning by src alone
    * already clusters every (src, dst) duplicate into one partition,
    * so the dedup aggregate, the degree aggregate, and the contrib
    * self-join all plan with no further shuffle; the old
    * distinct-then-repartition paid two full-|E| exchanges).
    *
    * Skew insurance (`spark.graft.graph.prededupEdges=true`, default
    * off): for RAW heavily-duplicated edge lists at scale, the
    * one-exchange form ships a hub source's entire duplicated
    * adjacency into one partition with no map-side reduction. The
    * guarded form dedups FIRST — partial aggregation shrinks
    * duplication before any network hop and the dedup exchange
    * spreads over the full (src, dst) key space — then repartitions
    * by src: two exchanges of the already-deduped list. Identical
    * output either way (dedup is set semantics); flip the conf when
    * the input's duplication ratio, not the exchange count, is the
    * scale risk. [[GraphEdgeSkewSpec]] pins both properties.
    */
  private def srcEdgeLayout(edges: DataFrame): DataFrame =
    if (prededupEdges(edges)) edges.dropDuplicates("src", "dst").repartition(col("src"))
    else edges.repartition(col("src")).dropDuplicates("src", "dst")

  /** Weighted sibling of [[srcEdgeLayout]] over `(src, dst, w)`:
    * duplicate edges merge by summing weight; same conf, same
    * identical-output contract (sum is order-free).
    */
  private def srcWeightLayout(edges: DataFrame): DataFrame =
    if (prededupEdges(edges))
      edges.groupBy(col("src"), col("dst")).agg(sum(col("w")).as("w"))
        .repartition(col("src"))
    else
      edges.repartition(col("src"))
        .groupBy(col("src"), col("dst")).agg(sum(col("w")).as("w"))

  private def prededupEdges(df: DataFrame): Boolean =
    df.sparkSession.conf.getOption("spark.graft.graph.prededupEdges")
      .exists(_.trim.equalsIgnoreCase("true"))

  private def prLoop(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      seeds: Option[DataFrame],
      weightCol: Option[String],
      iters: Int,
      scale: Long,
      dampNum: Long,
      dampDen: Long,
      checkpointIters: Int): DataFrame = {
    require(iters >= 1, s"pageRank: iters must be >= 1, got $iters")
    require(scale > 0L, s"pageRank: scale must be positive, got $scale")
    require(dampDen > 0L && dampNum >= 0L && dampNum <= dampDen,
      s"pageRank: need 0 <= dampNum <= dampDen, got $dampNum/$dampDen")
    require(checkpointIters >= 1,
      s"pageRank: checkpointIters must be >= 1, got $checkpointIters")
    // The deduplicated edge list feeds four readers (degree count, the
    // contrib self-join, both vertex legs) — persist it once or each
    // derived cache's materialization recomputes the upstream dedup.
    // ONE exchange establishes the loop's src layout: hash-partitioning
    // by src alone clusters every (src, dst) duplicate into one
    // partition, so the dedup / weight-merge aggregate AND the degree
    // aggregate AND the contrib self-join all plan onto the same
    // partitioning with no further shuffle (the old shape paid a
    // distinct exchange on (src, dst) plus an explicit repartition).
    val e = graft.core.CacheRegistry.persist(
      weightCol match {
        case None =>
          srcEdgeLayout(edges
            .select(col(srcCol).as("src"), col(dstCol).as("dst"))
            .where(col("src").isNotNull && col("dst").isNotNull))
        case Some(wc) =>
          // duplicate edges merge by summing weight; non-positive
          // weights carry no endorsement and are dropped
          srcWeightLayout(edges
            .select(col(srcCol).as("src"), col(dstCol).as("dst"),
              col(wc).cast("long").as("w"))
            .where(col("src").isNotNull && col("dst").isNotNull && col("w") > 0))
      },
      MEMORY_AND_DISK)
    // (src, dst, deg|wsum) is loop-invariant: compute the out-degree /
    // out-weight totals once; e's cached src layout serves the degree
    // aggregate and the self-join directly, and the join output keeps
    // it, so every iteration's score join lands on the cached layout
    // without a fresh edge shuffle.
    val contrib = graft.core.CacheRegistry.persist(
      weightCol match {
        case None =>
          e.join(e.groupBy("src").agg(count(lit(1)).as("deg")), "src")
        case Some(_) =>
          e.join(e.groupBy("src").agg(sum(col("w")).as("wsum")), "src")
      },
      MEMORY_AND_DISK)
    // verts carries the teleport mask: is_seed ∈ {0, 1}, all-1 for
    // plain PageRank — one loop body serves both variants exactly.
    val vertBase = e.select(col("src").as("node")).union(e.select(col("dst").as("node"))).distinct()
    val verts = graft.core.CacheRegistry.persist(
      seeds match {
        case None => vertBase.select(col("node"), lit(1L).as("is_seed"))
        case Some(sd) =>
          val s = sd.where(col("node").isNotNull).distinct().select(col("node"), lit(1L).as("_s"))
          vertBase.join(s, Seq("node"), "left")
            .select(col("node"), coalesce(col("_s"), lit(0L)).as("is_seed"))
      },
      MEMORY_AND_DISK)
    // materialize both loop-invariant caches (e fills on the first,
    // the second reuses it), then drop the now-redundant edge cache —
    // the loop must not hold THREE copies of the edge list
    contrib.count()
    verts.count()
    e.unpersist()
    val base = scale * (dampDen - dampNum) / dampDen
    var scores = verts.select(col("node"), (lit(scale) * col("is_seed")).as("score"))
    val contribExpr =
      if (weightCol.isDefined) "(score * w) div wsum" else "score div deg"
    for (i <- 1 to iters) {
      val inflow = contrib
        .join(scores, col("src") === col("node"))
        .select(col("dst"), expr(contribExpr).as("c"))
        .groupBy("dst").agg(sum(col("c")).as("inflow"))
      scores = verts
        .join(inflow, col("node") === col("dst"), "left")
        .select(
          col("node"),
          (lit(base) * col("is_seed") +
            expr(s"($dampNum * coalesce(inflow, 0L)) div $dampDen"))
            .as("score"))
      if (i % checkpointIters == 0 && i < iters) scores = scores.localCheckpoint(true)
    }
    scores
  }

  /** Multi-source BFS hop distance: for every node reachable from
    * `seeds` within `maxHops` directed hops, the MINIMUM hop count.
    * The "distance from trusted seeds" corpus-quality measure — crawl
    * pipelines score pages by graph distance from a curated seed set
    * (link spam lives far from every seed), the same shape as
    * personalized-PageRank's support. Exact integers, so the result is
    * partitioning-independent and byte-comparable against a recursive
    * CTE.
    *
    * Scale shape: textbook frontier expansion — per round one join of
    * the (shrinking) frontier against edges persisted partitioned on
    * `src`, one anti-join against the visited set, one distinct on the
    * new frontier. One materializing action per round (the new
    * frontier's eager `localCheckpoint`; the empty probe then reads a
    * cached block), the visited set accumulates as a union of
    * checkpointed per-hop deltas (shallow O(hops) lineage, never
    * re-materialized), and rounds are capped by `maxHops` — the
    * connected-components loop discipline
    * ([[Dedup.connectedComponents]]).
    */
  def hopDistance(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      seeds: DataFrame,
      seedCol: String,
      maxHops: Int): DataFrame = {
    require(maxHops >= 0, s"hopDistance: maxHops must be >= 0, got $maxHops")
    val e = graft.core.CacheRegistry.persist(
      edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
        .where(col("src").isNotNull && col("dst").isNotNull)
        // srcEdgeLayout: one exchange establishes the loop layout
        // (dedup clusters on the src hash); the conf-gated prededup
        // form is the skew insurance for raw duplicated edge lists
        .transform(srcEdgeLayout),
      MEMORY_AND_DISK)
    var visited = seeds.select(col(seedCol).as("node")).where(col("node").isNotNull)
      .distinct().select(col("node"), lit(0).as("dist"))
      .localCheckpoint(true)
    var frontier = visited
    var hop = 0
    while (hop < maxHops && !frontier.isEmpty) {
      hop += 1
      val next = e.join(frontier, col("src") === col("node"))
        .select(col("dst").as("node")).distinct()
        .join(visited.select("node"), Seq("node"), "left_anti")
        .select(col("node"), lit(hop).as("dist"))
        .localCheckpoint(true) // the round's one materializing action
      // visited stays a union chain of checkpointed deltas: lineage is
      // O(hops) and SHALLOW (each leg a cached-block scan), so no
      // re-materialization of the full visited set per round
      visited = visited.union(next)
      frontier = next
    }
    visited
  }

  /** Sampled harmonic centrality — the "which nodes are CLOSE to
    * everything" readout ([[pageRank]] rewards being pointed at;
    * harmonic rewards being reachable fast, the metric of choice for
    * disconnected graphs since unreachable pairs contribute 0, not
    * ∞): H(v) = Σ_u 1/d(u,v), estimated over a deterministic seed
    * sample. Seeds are the `nSeeds` smallest nodes in (md5(node),
    * node) order — a reproducible uniform draw with no RNG, the
    * [[graft.operators.TrainingData]] hash discipline.
    *
    * One TAGGED multi-source BFS: the frontier is (seed, node) keyed,
    * so all seeds advance in the SAME superstep joins — s seeds cost
    * s× edge traffic per round, not s sequential BFS loops. Per
    * round: one hash join frontier⋈edges, one distinct, one anti-join
    * against visited, one materializing localCheckpoint (the
    * [[hopDistance]] discipline — lineage stays O(rounds) and
    * shallow). The score is the exact integer floor sum
    * Σ 10⁶ div d over reached (seed ≠ node) pairs; output is the
    * global top-`k` by (score, node) via TakeOrdered. Output:
    * (node, n_reached, harmonic_ppm).
    */
  def harmonicCentrality(edges: DataFrame, srcCol: Column, dstCol: Column,
      nSeeds: Int = 8, maxHops: Int = 3, k: Int = 50): DataFrame = {
    require(nSeeds >= 1 && maxHops >= 1 && k >= 1,
      s"harmonicCentrality: nSeeds/maxHops/k must be >= 1")
    val e = graft.core.CacheRegistry.persist(
      edges.select(srcCol.as("src"), dstCol.as("dst"))
        .where(col("src").isNotNull && col("dst").isNotNull)
        // srcEdgeLayout: one exchange establishes the loop layout
        // (dedup clusters on the src hash); the conf-gated prededup
        // form is the skew insurance for raw duplicated edge lists
        .transform(srcEdgeLayout),
      MEMORY_AND_DISK)
    val verts = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()
    val seeds = verts
      .orderBy(md5(col("node").cast("string")), col("node"))
      .limit(nSeeds)
    var dist = seeds
      .select(col("node").as("seed"), col("node"), lit(0).as("dist"))
      .localCheckpoint(true)
    var frontier = dist
    // maxHops is small and FIXED, so no per-round isEmpty probe — an
    // exhausted frontier makes the remaining rounds cheap no-op joins,
    // while the probe costs one extra job per round (measured ~30% of
    // the whole operator at 3 hops)
    for (hop <- 1 to maxHops) {
      val next = e.join(frontier, col("src") === col("node"))
        .select(col("seed"), col("dst").as("node")).distinct()
        .join(dist.select("seed", "node"), Seq("seed", "node"), "left_anti")
        .select(col("seed"), col("node"), lit(hop).as("dist"))
        .localCheckpoint(true) // the round's one materializing action
      dist = dist.union(next)
      frontier = next
    }
    dist.where(col("dist") > 0)
      .groupBy(col("node"))
      .agg(count(lit(1)).as("n_reached"),
        sum(expr("1000000 div dist")).as("harmonic_ppm"))
      .orderBy(col("harmonic_ppm").desc, col("node").asc)
      .limit(k)
  }

  /** Per-node triangle counts and local clustering coefficient over an
    * undirected edge list (duplicates, reversed duplicates, and
    * self-loops tolerated — edges canonicalize to distinct u<v pairs).
    * Triangle density separates organic link neighborhoods from link
    * farms (spam rings are near-bipartite: high degree, no closure),
    * so it sits next to [[pageRank]] in the corpus-quality toolbox.
    *
    * Algorithm: degree-ordered edge orientation (Schank–Wagner /
    * compact-forward) — orient each edge from its (degree, id)-smaller
    * endpoint to the larger, which caps every node's out-degree at
    * O(√m) on ANY graph, then count closed wedges with two equi-joins:
    * (s→b)⋈(b→c) forms the wedge, a semi-check against (s→c) closes
    * it. Each triangle is found exactly once (its (deg,id)-minimum
    * vertex is the unique pivot). Without the orientation a hub with
    * degree d contributes d² wedges; with it, the worst case is m^1.5
    * total wedge rows — the difference between a feasible and an
    * impossible plan on a power-law co-purchase graph.
    *
    * Scale shape: the canonical and oriented edge frames are each
    * materialized ONCE via eager `localCheckpoint` — e feeds three
    * consumers and ori three self-join legs, so without it the
    * (possibly expensive) upstream edge pipeline replays per consumer;
    * checkpointing also hands AQE the true |E| so the tiny deg/count
    * joins broadcast (measured ~2× over a columnar persist of the same
    * frames — the same superstep discipline as [[pageRank]]). Every
    * join is an equi-join on node keys shuffling (s, t) pairs only.
    * Output: `node, degree, n_tri, clustering` for every node in >= 1
    * triangle, where clustering = 2·n_tri / (degree·(degree−1)) as one
    * IEEE division of exact bigints (cross-engine exact).
    */
  /** k-core of an undirected graph: the maximal subgraph where every
    * node keeps degree >= k, found by iterated peeling (remove
    * under-degree nodes, recompute, repeat to fixpoint). Coreness
    * separates densely-embedded pages from pendant spam tendrils the
    * same way triangle closure does, one notch more global — the
    * third lens of the [[pageRank]] / [[triangleCounts]] quality
    * family.
    *
    * Runs peel rounds until the edge set stops shrinking or
    * `maxRounds` is hit (each round is one degree aggregate + two
    * semi-joins on node keys over the checkpointed edge frame — the
    * [[hopDistance]] superstep discipline: one materializing action
    * per round, lineage truncated, AQE sees real sizes). Peeling is
    * monotone, so the fixpoint IS the k-core regardless of round
    * order; a `maxRounds` exit returns the (deterministic)
    * partially-peeled bound instead — callers wanting certainty check
    * `degree >= k` holds on the output. Output: `node, degree` over
    * the surviving subgraph.
    */
  def kCore(
      edges: DataFrame,
      srcCol: Column,
      dstCol: Column,
      k: Int,
      maxRounds: Int = 20): DataFrame = {
    require(k >= 1, s"kCore: k must be >= 1, got $k")
    require(maxRounds >= 1, s"kCore: maxRounds must be >= 1, got $maxRounds")
    var e = edges
      .select(least(srcCol, dstCol).as("_u"), greatest(srcCol, dstCol).as("_v"))
      .where(col("_u") < col("_v"))
      .distinct()
      .localCheckpoint(true)
    var n = e.count()
    var round = 0
    var converged = false
    // (r17 measured-and-rejected, twice: (a) batching 2 peel rounds
    // per checkpoint+count cut only 4 of 56 jobs and regressed seconds
    // ~35% — the lazy intermediate edge frame is consumed 3× by the
    // next round's plan (degree union twice + the join left side) and
    // the recompute outweighs the saved round-trips; (b) anti-joining
    // the tiny below-k set instead of semi-joining keep was seconds-
    // flat-to-worse at identical job counts. The 1-round-per-action
    // peel is this operator's scheduling floor.)
    while (round < maxRounds && !converged && n > 0) {
      val deg = e.select(col("_u").as("_n")).unionAll(e.select(col("_v").as("_n")))
        .groupBy(col("_n")).agg(count(lit(1)).as("_d"))
      val keep = deg.where(col("_d") >= k).select(col("_n"))
      val next = e
        .join(keep, col("_u") === col("_n"), "left_semi")
        .join(keep, col("_v") === col("_n"), "left_semi")
        .localCheckpoint(true)
      val n2 = next.count()
      converged = n2 == n
      e = next; n = n2; round += 1
    }
    e.select(col("_u").as("node")).unionAll(e.select(col("_v").as("node")))
      .groupBy(col("node")).agg(count(lit(1)).as("degree"))
  }

  /** HITS hubs & authorities (Kleinberg, JACM'99) in SCALED-INTEGER
    * arithmetic: per round, authority(v) = Σ_{u→v} hub(u) then
    * hub(u) = Σ_{u→v} authority(v) (the classic a-then-h order, each
    * using the CURRENT round's counterpart), each re-normalized so
    * the maximum score equals `scale` — max is order-free and the
    * rescale is one bigint multiply + truncating divide, so (like
    * [[pageRank]]) the result is bit-exact under any partitioning /
    * shuffle order / engine, where the textbook L2 normalization
    * would be an order-dependent float sum. Runs a pinned `rounds`
    * (an oracle unrolls the same); scores of the max hub/authority
    * are exactly `scale` each round.
    *
    * Overflow bound: raw sums satisfy Σ ≤ maxInDegree·scale, and the
    * rescale computes raw·scale, so maxDegree·scale² must stay below
    * 2^63 — the default scale 10^6 tolerates degree ≤ ~9·10^6; lower
    * `scale` for denser graphs.
    *
    * Scale shape: deduped edges persisted once; each half-round is
    * ONE materializing job — a shuffle join of edges against a
    * |V|-row score frame with a map-side-partial sum, checkpointed —
    * followed by a 1-row max over the checkpointed aggregate (driver
    * scalar, bounded) that feeds the rescale as a lazy projection.
    * Node keys keep the caller's type: pass integral ids (tag sides
    * into disjoint ranges) so shuffles move fixed-width longs, not
    * decorated strings. Output: `node, hub, authority` (0 for a side
    * the node never plays).
    */
  def hits(
      edges: DataFrame,
      srcCol: Column,
      dstCol: Column,
      rounds: Int,
      scale: Long = 1000000L): DataFrame = {
    require(rounds >= 1, s"hits: rounds must be >= 1, got $rounds")
    require(scale > 0L, s"hits: scale must be positive, got $scale")
    // Node keys keep the caller's column type: a (long-encoded) key
    // shuffles as 8 fixed bytes where a decorated string would carry
    // 10-20 variable bytes through every join of every round.
    val e = graft.core.CacheRegistry.persist(
      edges.select(srcCol.as("_s"), dstCol.as("_d"))
        .where(col("_s").isNotNull && col("_d").isNotNull)
        .distinct(),
      MEMORY_AND_DISK)
    // Per half-round: ONE materializing job — the edge⋈score join +
    // partial-sum agg, checkpointed eagerly (superstep discipline).
    // The max needed for the exact floor-division rescale is then a
    // 1-row scan of that |V|-row checkpointed frame (driver scalar,
    // bounded), and the rescale itself stays a lazy narrow projection
    // the next half-round's join consumes in place. The previous shape
    // (crossJoin over a broadcast max of the UNcheckpointed aggregate)
    // recomputed the heavy join twice per half-round.
    def step(scores: DataFrame, joinKey: String, outKey: String,
             valIn: String, valOut: String): DataFrame = {
      val raw = e.join(scores, e(joinKey) === scores("node"))
        .groupBy(col(outKey)).agg(sum(col(valIn)).as("_raw"))
        .localCheckpoint(true)
      val mx = raw.agg(max(col("_raw"))).head().getLong(0)
      raw.select(col(outKey).as("node"),
        expr(s"(_raw * ${scale}L) div ${mx}L").as(valOut))
    }
    var hubs = e.select(col("_s").as("node")).distinct()
      .select(col("node"), lit(scale).as("h")).localCheckpoint(true)
    var auths: DataFrame = null
    for (_ <- 1 to rounds) {
      auths = step(hubs, "_s", "_d", "h", "a")
      hubs = step(auths, "_d", "_s", "a", "h")
    }
    hubs.select(col("node"), col("h").as("hub"))
      .join(auths.select(col("node"), col("a").as("authority")), Seq("node"), "full")
      .select(col("node"), coalesce(col("hub"), lit(0L)).as("hub"),
        coalesce(col("authority"), lit(0L)).as("authority"))
  }

  /** Synchronous label propagation (Raghavan et al. 2007): every node
    * starts in its own community (label = node id); each round every
    * node adopts the most frequent label among its neighbors,
    * breaking count ties toward the SMALLEST label. Runs a FIXED
    * number of rounds — async LPA's convergence is order-dependent
    * and sync LPA can oscillate on bipartite structures, so a pinned
    * round count is the only form that is deterministic across
    * engines and partitionings (an oracle unrolls the same rounds).
    * Integer counts + integer tie-break mean no float enters the
    * computation at all.
    *
    * Scale shape: each round is one shuffle join of the (checkpointed,
    * both-direction) edge frame against the |V|-row label frame on the
    * neighbor key, one (node, label) hash-agg with map-side partials,
    * and one arg-max agg per node — O(|E|) rows in motion per round,
    * no driver state. Labels are `localCheckpoint`ed per round
    * (superstep discipline: truncate lineage, give AQE real sizes —
    * the label join broadcasts when |V| allows). Isolated nodes never
    * appear (the graph is the edge set). Output: `node, community`.
    */
  def labelPropagation(
      edges: DataFrame,
      srcCol: Column,
      dstCol: Column,
      rounds: Int): DataFrame = {
    require(rounds >= 1, s"labelPropagation: rounds must be >= 1, got $rounds")
    val e = edges
      .select(least(srcCol, dstCol).cast("long").as("_u"),
        greatest(srcCol, dstCol).cast("long").as("_v"))
      .where(col("_u") < col("_v"))
      .distinct()
    // (r17 measured-and-rejected: pre-partitioning und by _v — the
    // shortestPaths trick — added its exchange without removing any:
    // the per-round join broadcasts the |V|-row label side, so the
    // big side never shuffled to begin with. +1 job, seconds flat.)
    val und = e.unionAll(e.select(col("_v").as("_u"), col("_u").as("_v")))
      .localCheckpoint(true)
    var labels = und.select(col("_u").as("node"))
      .distinct()
      .select(col("node"), col("node").as("lbl"))
      .localCheckpoint(true)
    for (_ <- 1 to rounds) {
      val counts = und.join(labels, und("_v") === labels("node"))
        .groupBy(col("_u"), col("lbl")).agg(count(lit(1)).as("_c"))
      // arg-max with min-label tie-break in one agg: max of
      // (count, -label) lexicographic struct order, then un-negate
      labels = counts.groupBy(col("_u"))
        .agg(max(struct(col("_c"), (-col("lbl")).as("_nl"))).as("_m"))
        .select(col("_u").as("node"), (-col("_m._nl")).as("lbl"))
        .localCheckpoint(true)
    }
    labels.select(col("node"), col("lbl").as("community"))
  }

  /** Multi-source weighted shortest paths by Bellman-Ford supersteps:
    * sources start at distance 0; each round relaxes every directed
    * edge once (`dist'(v) = min(dist(v), min over u→v of dist(u)+w)`).
    * After `rounds` rounds the frame holds exact shortest distances
    * over paths of ≤ `rounds` edges — a pinned-horizon result that is
    * deterministic and engine-exact (all-integer arithmetic, min is
    * order-free), which is what an oracle can check; run more rounds
    * for a wider horizon. Weights must be non-negative longs (negative
    * weights would make the pinned-horizon result order-sensitive to
    * relaxation count, and negative cycles never converge). Nodes not
    * yet reached are simply absent.
    *
    * Scale shape: the [[hopDistance]] discipline with weights — each
    * round is one shuffle join of the checkpointed edge frame against
    * the frontier-inclusive distance frame on the edge source key,
    * then one min-agg on the node key (map-side partials); O(|E|)
    * rows in motion per round, zero driver state, distances
    * `localCheckpoint`ed per round so lineage stays flat and AQE
    * broadcasts the |V|-row side when it can.
    */
  def shortestPaths(
      edges: DataFrame,
      srcCol: Column,
      dstCol: Column,
      weightCol: Column,
      sources: DataFrame,
      sourceCol: Column,
      rounds: Int): DataFrame = {
    require(rounds >= 1, s"shortestPaths: rounds must be >= 1, got $rounds")
    // hash-partition by the join key BEFORE the eager checkpoint: the
    // LogicalRDD a localCheckpoint leaves behind preserves the
    // physical output partitioning, so every round's relax join reads
    // the edge side with NO exchange instead of re-shuffling |E| rows
    // per round.
    val e = edges
      .select(srcCol.cast("long").as("_s"), dstCol.cast("long").as("_d"),
        weightCol.cast("long").as("_w"))
      .where(col("_s").isNotNull && col("_d").isNotNull && col("_w") >= 0)
      .repartition(col("_s"))
      .localCheckpoint(true)
    var dist = sources.select(sourceCol.cast("long").as("node"))
      .where(col("node").isNotNull).distinct()
      .select(col("node"), lit(0L).as("dist"))
      .localCheckpoint(true)
    // TWO relaxations per materializing action: under AQE every query
    // stage is a job submission, so the per-round checkpoint made the
    // scheduling floor (not the data) the cost at small frontiers. The
    // intermediate round's min-agg stays LAZY inside the fused plan —
    // its two consumers (the next relax join's probe side and the
    // union branch of the next min-agg) canonicalize to the same
    // exchange, so the subtree runs once (ReusedExchange; at small
    // sizes AQE may instead broadcast the join probe, re-running only
    // the cheap |V|-row aggregate, never the |E|-row join below it).
    // min is associative/idempotent, so relax∘relax with a single
    // trailing checkpoint computes the identical pinned-horizon
    // distances — the min over candidate paths of ≤ r edges does not
    // care where the lineage was cut.
    // TWO relaxations per materializing action: under AQE every query
    // stage is a job submission, so a checkpoint per round made the
    // scheduling floor (not the data) the dominant cost at small
    // frontiers. The intermediate round's min-agg stays LAZY inside
    // the fused plan; the SHUFFLE_HASH hint keeps BOTH of its
    // consumers (the next relax join's probe side and the next
    // min-agg's union branch) on the SAME canonical shuffle exchange,
    // so the subtree executes once (ReusedExchange) — an AQE broadcast
    // conversion would split them into broadcast + shuffle exchanges
    // that share nothing and re-run the |E|-row relax join (measured:
    // 4.0 s -> 6.3 s without the hint). min is associative and
    // idempotent, so relax∘relax with one trailing checkpoint computes
    // the identical pinned-horizon distances.
    var done = 0
    while (done < rounds) {
      val step = math.min(2, rounds - done)
      var cur = dist
      var i = 0
      while (i < step) {
        // the checkpointed round-boundary frame is cheap to broadcast;
        // only the LAZY intermediate needs the shuffle pin for reuse
        val probe = if (i == 0) cur else cur.hint("shuffle_hash")
        val relaxed = e.join(probe, e("_s") === probe("node"))
          .select(col("_d").as("node"), (col("dist") + col("_w")).as("dist"))
        cur = cur.unionAll(relaxed)
          .groupBy(col("node")).agg(min(col("dist")).as("dist"))
        i += 1
      }
      dist = cur.localCheckpoint(true)
      done += step
    }
    dist
  }

  /** Graph density + Freeman degree centralization — the two
    * one-number shape summaries read FIRST on any graph snapshot:
    * density (2E/n(n−1), how saturated) and Freeman's centralization
    * (Σ(d_max − d_i)/((n−1)(n−2)), how star-like: 1 on a star, 0 on
    * any regular graph). Together they separate "dense because
    * everything connects" from "dense because one hub dominates" —
    * the spam/botnet-shape screen before the per-node centralities.
    *
    * Exact integers end-to-end: canonical undirected distinct edges
    * (the [[triangleCounts]] normalization), a degree aggregate, and
    * the identity Σ(d_max − d_i) = n·d_max − 2E — so no second pass
    * over the degree frame; two non-negative ppm floors close it.
    * Output one row: (n_nodes, n_edges, dmax, density_ppm,
    * centralization_ppm); density null below 2 nodes,
    * centralization null below 3 (undefined denominators).
    *
    * Shape: one distinct + one degree aggregate + a 1-row summary.
    */
  def degreeCentralization(edges: DataFrame, srcCol: Column,
      dstCol: Column): DataFrame = {
    val e = edges
      .select(least(srcCol, dstCol).as("_u"), greatest(srcCol, dstCol).as("_v"))
      .where(col("_u") < col("_v"))
      .distinct()
    val deg = e.select(col("_u").as("_n")).unionAll(e.select(col("_v").as("_n")))
      .groupBy(col("_n")).agg(count(lit(1)).as("_d"))
    deg.agg(
        count(lit(1)).as("n_nodes"),
        coalesce(sum(col("_d")), lit(0L)).as("_sumd"),
        coalesce(max(col("_d")), lit(0L)).as("dmax"))
      .select(col("n_nodes"), expr("_sumd div 2").as("n_edges"), col("dmax"),
        when(col("n_nodes") >= 2L,
          expr("""CAST(CAST(_sumd AS DECIMAL(38,0)) * 1000000
                 |  div (CAST(n_nodes AS DECIMAL(38,0)) * (n_nodes - 1))
                 |  AS BIGINT)""".stripMargin)).as("density_ppm"),
        when(col("n_nodes") >= 3L,
          expr("""CAST((CAST(n_nodes AS DECIMAL(38,0)) * dmax - _sumd)
                 |  * 1000000
                 |  div (CAST(n_nodes - 1 AS DECIMAL(38,0)) * (n_nodes - 2))
                 |  AS BIGINT)""".stripMargin)).as("centralization_ppm"))
  }

  /** Directed-graph reciprocity — how mutual are the edges: the
    * dyadic form (share of distinct directed edges whose REVERSE also
    * exists) and the Garlaschelli-Loffredo weighted form
    * (Σ min(w_ij, w_ji) / Σ w_ij — what fraction of flow is
    * returned), both in one row. The interaction-symmetry probe for
    * transition graphs, reply networks, link exchanges — 1 on a
    * symmetric graph, 0 on a DAG.
    *
    * Exact integers: one (src, dst) weight aggregate, one hash
    * self-join against its own reversal, two non-negative ppm floors.
    * Self-loops are excluded (they are trivially reciprocal and
    * poison both denominators). Output one row: (n_edges, w_total,
    * recip_edges, recip_ppm, recip_w_ppm).
    *
    * Scale contract: both shuffles are on the (src, dst) pair key at
    * distinct-edge cardinality — no per-node fan-out, no windows.
    */
  def reciprocity(edges: DataFrame, srcCol: Column, dstCol: Column): DataFrame = {
    val w = edges
      .select(srcCol.as("_s"), dstCol.as("_d"))
      .where(col("_s").isNotNull && col("_d").isNotNull &&
        col("_s") =!= col("_d"))
      .groupBy(col("_s"), col("_d")).agg(count(lit(1)).as("_w"))
    val rev = w.select(col("_d").as("_s"), col("_s").as("_d"),
      col("_w").as("_wr"))
    w.join(rev, Seq("_s", "_d"), "left")
      .agg(
        count(lit(1)).as("n_edges"),
        coalesce(sum(col("_w")), lit(0L)).as("w_total"),
        coalesce(sum(when(col("_wr").isNotNull, 1L).otherwise(0L)), lit(0L))
          .as("recip_edges"),
        coalesce(sum(least(col("_w"), coalesce(col("_wr"), lit(0L)))), lit(0L))
          .as("_wmin"))
      .select(col("n_edges"), col("w_total"), col("recip_edges"),
        when(col("n_edges") > 0L,
          expr("recip_edges * 1000000 div n_edges")).as("recip_ppm"),
        when(col("w_total") > 0L,
          expr("_wmin * 1000000 div w_total")).as("recip_w_ppm"))
  }

  def triangleCounts(edges: DataFrame, srcCol: Column, dstCol: Column): DataFrame = {
    // least/greatest skip nulls: a null endpoint collapses to u==v and
    // the strict < drops it, like a self-loop
    val e = edges
      .select(least(srcCol, dstCol).as("_u"), greatest(srcCol, dstCol).as("_v"))
      .where(col("_u") < col("_v"))
      .distinct()
      .localCheckpoint(true)
    val deg = e.select(col("_u").as("_n")).unionAll(e.select(col("_v").as("_n")))
      .groupBy(col("_n")).agg(count(lit(1)).as("_d"))
    val withDeg = e
      .join(deg.select(col("_n").as("_u"), col("_d").as("_du")), Seq("_u"))
      .join(deg.select(col("_n").as("_v"), col("_d").as("_dv")), Seq("_v"))
    val uFirst = col("_du") < col("_dv") ||
      (col("_du") === col("_dv") && col("_u") < col("_v"))
    val ori = withDeg.select(
        when(uFirst, col("_u")).otherwise(col("_v")).as("_s"),
        when(uFirst, col("_v")).otherwise(col("_u")).as("_t"))
      .localCheckpoint(true)
    val tri = ori.as("e1")
      .join(ori.as("e2"), col("e1._t") === col("e2._s"))
      .join(ori.as("e3"),
        col("e3._s") === col("e1._s") && col("e3._t") === col("e2._t"), "left_semi")
      .select(col("e1._s").as("_a"), col("e1._t").as("_b"), col("e2._t").as("_c"))
    tri.select(explode(array(col("_a"), col("_b"), col("_c"))).as("node"))
      .groupBy(col("node")).agg(count(lit(1)).as("n_tri"))
      .join(deg.select(col("_n").as("node"), col("_d").as("degree")), Seq("node"))
      .select(col("node"), col("degree"), col("n_tri"),
        ((col("n_tri") * 2).cast("double") /
          (col("degree") * (col("degree") - 1)).cast("double")).as("clustering"))
  }

  /** Whole-graph clustering summary — the one-row readout over
    * [[triangleCounts]]'s per-node frame: global transitivity
    * 3T/wedges (closed-wedge fraction — one hub cannot inflate it)
    * and the average LOCAL clustering coefficient over nodes with
    * degree ≥ 2 (Watts-Strogatz — where hubby graphs and clumpy
    * graphs diverge from each other). Reported together because the
    * two disagree exactly when the graph has degree-correlated
    * clumping, which is the interesting case.
    *
    * Exact integers end to end: Σn_tri = 3T, doubled wedges
    * Σd(d−1), transitivity_ppm = 2·Σn_tri·10⁶ div Σd(d−1); per-node
    * cc_ppm = 2t·10⁶ div d(d−1) floors, avg_cc_ppm their floored
    * mean (floor-of-mean-of-floors — deterministic on every engine,
    * bias < 1 ppm + 1). Nodes the triangle pass never emits (t = 0)
    * are zero-filled from the degree frame, not dropped.
    *
    * Shape: the [[triangleCounts]] oriented join (pair work bounded
    * by Σ out-wedges of the degree orientation — the standard bound)
    * plus one left join back to the |V|-row degree frame and one
    * closing aggregate. Output one row: (n_nodes, n_nodes_d2,
    * n_triangles, transitivity_ppm, avg_cc_ppm).
    */
  def clusteringSummary(edges: DataFrame, srcCol: Column,
      dstCol: Column): DataFrame = {
    // the triangleCounts core inlined so the edge/degree frames are
    // built ONCE and shared between the triangle pass and the
    // zero-fill (calling triangleCounts would rescan the pair input)
    val e = edges
      .select(least(srcCol, dstCol).as("_u"), greatest(srcCol, dstCol).as("_v"))
      .where(col("_u") < col("_v"))
      .distinct()
      .localCheckpoint(true)
    val deg = graft.core.CacheRegistry.persist(
      e.select(col("_u").as("node")).unionAll(
          e.select(col("_v").as("node")))
        .groupBy(col("node")).agg(count(lit(1)).as("_d")),
      org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val withDeg = e
      .join(deg.select(col("node").as("_u"), col("_d").as("_du")), Seq("_u"))
      .join(deg.select(col("node").as("_v"), col("_d").as("_dv")), Seq("_v"))
    val uFirst = col("_du") < col("_dv") ||
      (col("_du") === col("_dv") && col("_u") < col("_v"))
    val ori = withDeg.select(
        when(uFirst, col("_u")).otherwise(col("_v")).as("_s"),
        when(uFirst, col("_v")).otherwise(col("_u")).as("_t"))
      .localCheckpoint(true)
    val tri = ori.as("e1")
      .join(ori.as("e2"), col("e1._t") === col("e2._s"))
      .join(ori.as("e3"),
        col("e3._s") === col("e1._s") && col("e3._t") === col("e2._t"),
        "left_semi")
      .select(col("e1._s").as("_a"), col("e1._t").as("_b"),
        col("e2._t").as("_c"))
    val perNode = tri
      .select(explode(array(col("_a"), col("_b"), col("_c"))).as("node"))
      .groupBy(col("node")).agg(count(lit(1)).as("n_tri"))
    deg.join(perNode, Seq("node"), "left")
      .select(col("_d"), coalesce(col("n_tri"), lit(0L)).as("_t"))
      .agg(count(lit(1)).as("n_nodes"),
        sum(when(col("_d") >= 2L, 1L).otherwise(0L)).as("n_nodes_d2"),
        sum(col("_t")).as("_t3"),
        sum(col("_d") * (col("_d") - 1L)).as("_w2"),
        sum(when(col("_d") >= 2L,
          expr("_t * 2 * 1000000 div (_d * (_d - 1))"))).as("_ccsum"))
      .select(col("n_nodes"), col("n_nodes_d2"),
        expr("_t3 div 3").as("n_triangles"),
        when(col("_w2") > 0L,
          expr("_t3 * 2 * 1000000 div _w2")).as("transitivity_ppm"),
        when(col("n_nodes_d2") > 0L,
          expr("_ccsum div n_nodes_d2")).as("avg_cc_ppm"))
  }

  /** Moran's I — autocorrelation of a NUMERIC node attribute over the
    * graph: do connected nodes carry similar values (homophily: price
    * tiers cluster in the co-purchase graph, spam scores cluster in
    * the link graph) or dissimilar ones (bipartite-ish repulsion)?
    * I > E[I] = −1/(n−1) says neighbors co-vary; the graph-native
    * sibling of [[degreeAssortativity]] (which correlates DEGREES,
    * not an external attribute).
    *
    * Exact integers via the cleared mean Z = n·x − Σx (never a
    * rounded x̄): with 0/1 weights over the undirected edge set,
    *
    * {{{ I = n · Σ_edges Z_u·Z_v / (E · Σ Z²) }}}
    *
    * — decimal(38,0) sums into ONE IEEE division, rounded 6dp, null
    * when the attribute is constant or the edge set empty. The node
    * universe is the VALUES frame (one value per node — duplicate
    * readings collapse by max); isolated nodes count in n and the
    * denominator (the standard convention), edges to unvalued nodes
    * drop. Shape: two |E|-row hash joins against the |V| z-frame and
    * two closing aggregates — no pair structure beyond the edges
    * themselves. Geary's C rides the SAME joins off the raw value
    * gaps — the local-difference complement (Moran is global
    * covariance; C < 1 similar neighbors, C > 1 dissimilar):
    * C = (n−1)·n²·Σ_e(Δx)² / (2E·ΣZ²), also one exact division.
    * Output one row: (n, e, ei_micros, moran_i, geary_c).
    */
  def moranI(edges: DataFrame, srcCol: Column, dstCol: Column,
      values: DataFrame, nodeCol: Column, valueCol: Column): DataFrame = {
    val dec = (c: Column) => c.cast("decimal(38,0)")
    val e = edges
      .select(least(srcCol, dstCol).as("_u"), greatest(srcCol, dstCol).as("_v"))
      .where(col("_u") < col("_v"))
      .distinct()
    val vals = values.where(nodeCol.isNotNull && valueCol.isNotNull)
      .groupBy(nodeCol.as("_n")).agg(max(valueCol.cast("long")).as("_x"))
    val tot = vals.agg(count(lit(1)).as("n"), sum(dec(col("_x"))).as("_s"))
    val z = graft.core.CacheRegistry.persist(
      vals.crossJoin(broadcast(tot))
        .select(col("_n"), col("n"), col("_x"),
          (dec(col("n")) * col("_x") - col("_s")).cast("decimal(38,0)")
            .as("_z")),
      org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val den = z.agg(first(col("n")).as("n"),
      coalesce(sum(col("_z") * col("_z")), dec(lit(0L))).as("_q"))
    val num = e
      .join(z.select(col("_n").as("_u"), col("_z").as("_zu"),
        col("_x").as("_xu")), Seq("_u"))
      .join(z.select(col("_n").as("_v"), col("_z").as("_zv"),
        col("_x").as("_xv")), Seq("_v"))
      .agg(count(lit(1)).as("e"),
        coalesce(sum(col("_zu") * col("_zv")), dec(lit(0L))).as("_p"),
        coalesce(sum(dec(col("_xu") - col("_xv")) *
          (col("_xu") - col("_xv"))), dec(lit(0L))).as("_g"))
    den.crossJoin(broadcast(num))
      .select(col("n"), col("e"),
        when(col("n") >= 2L, expr("-(1000000 div (n - 1))")).as("ei_micros"),
        when(col("e") > 0L && col("_q") > 0,
          round((dec(col("n")) * col("_p")).cast("double") /
            (dec(col("e")) * col("_q")).cast("double"), 6)).as("moran_i"),
        when(col("e") > 0L && col("_q") > 0,
          round(((dec(col("n")) - 1L) * dec(col("n")) * col("n") * col("_g"))
              .cast("double") /
            (lit(2L) * dec(col("e")) * col("_q")).cast("double"), 6))
          .as("geary_c"))
  }

  /** Rich-club coefficient ladder — do the high-degree nodes form
    * their own densely-wired club? For each degree threshold r:
    * φ(r) = 2·E_r / (N_r(N_r−1)) with N_r = nodes of degree > r and
    * E_r = edges with BOTH endpoints above — the interconnection
    * density of the club relative to a complete graph. Rising φ
    * along the ladder is the "rich club" signature (core routers,
    * citation elites, hub domains); flat/falling means hubs reach
    * out, not across.
    *
    * Exact integers: one degree frame, one degree-joined edge pass
    * computing min(dᵤ,dᵥ) per edge, then EVERY threshold resolves as
    * conditional counts in ONE aggregate over each frame (the ladder
    * is a literal list — no per-threshold rescan), closed by a ppm
    * floor. Null where the club has < 2 members. Output one row per
    * threshold: (r, club_nodes, club_edges, phi_ppm).
    */
  def richClub(edges: DataFrame, srcCol: Column, dstCol: Column,
      thresholds: Seq[Long]): DataFrame = {
    require(thresholds.nonEmpty, "richClub: thresholds must be non-empty")
    val e = edges
      .select(least(srcCol, dstCol).as("_u"), greatest(srcCol, dstCol).as("_v"))
      .where(col("_u") < col("_v"))
      .distinct()
      .localCheckpoint(true)
    // consumed three times (node ladder + both endpoint joins)
    val deg = graft.core.CacheRegistry.persist(
      e.select(col("_u").as("_n")).unionAll(e.select(col("_v").as("_n")))
        .groupBy(col("_n")).agg(count(lit(1)).as("_d")),
      org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nAgg = deg.agg(
      thresholds.zipWithIndex.map { case (r, i) =>
        sum(when(col("_d") > r, 1L).otherwise(0L)).as(s"_n$i")
      }.head,
      thresholds.zipWithIndex.map { case (r, i) =>
        sum(when(col("_d") > r, 1L).otherwise(0L)).as(s"_n$i")
      }.tail: _*)
    val dmin = least(col("_du"), col("_dv"))
    val eAgg = e
      .join(deg.select(col("_n").as("_u"), col("_d").as("_du")), Seq("_u"))
      .join(deg.select(col("_n").as("_v"), col("_d").as("_dv")), Seq("_v"))
      .agg(
        thresholds.zipWithIndex.map { case (r, i) =>
          sum(when(dmin > r, 1L).otherwise(0L)).as(s"_e$i")
        }.head,
        thresholds.zipWithIndex.map { case (r, i) =>
          sum(when(dmin > r, 1L).otherwise(0L)).as(s"_e$i")
        }.tail: _*)
    val rows = thresholds.zipWithIndex.map { case (r, i) =>
      struct(lit(r).as("r"), col(s"_n$i").as("club_nodes"),
        col(s"_e$i").as("club_edges"))
    }
    nAgg.crossJoin(broadcast(eAgg))
      .select(explode(array(rows: _*)).as("_t"))
      .select(col("_t.r").as("r"), col("_t.club_nodes").as("club_nodes"),
        col("_t.club_edges").as("club_edges"))
      .withColumn("phi_ppm",
        when(col("club_nodes") >= 2L,
          expr("""club_edges * 2 * 1000000 div
            (club_nodes * (club_nodes - 1))""")))
      .orderBy(col("r"))
  }

  /** Newman modularity Q of a community assignment over an undirected
    * graph given as a SYMMETRIC directed edge list (both directions
    * present, the [[pageRank]]/[[labelPropagation]] convention).
    *
    * With E = |symmetric edges| = 2m, L'_c = symmetric intra-community
    * edge count (= 2·undirected intra edges) and D_c = Σ degrees in c:
    *
    *   Q = Σ_c [ L_c/m − (D_c/2m)² ]  ⇒  Q·E² = Σ_c (E·L'_c − D_c²)
    *
    * so the whole statistic is INTEGER arithmetic until one final IEEE
    * division — bit-identical across engines and shuffle orders. The
    * per-community sums are exact DECIMAL(38,0) (E·L'_c can pass 2^63
    * on big graphs); the plan is two narrow |E|-row joins against the
    * broadcast-able labels frame plus two tiny aggregations — no
    * materialized per-pair structure, safe at any |E|.
    *
    * `labels`: (node, community) one row per node. Edges whose
    * endpoint has no label are dropped (documented: modularity of the
    * labeled subgraph). Returns one row:
    * (communities, m_edges, q_num, q_denom, modularity).
    */
  def modularity(edges: DataFrame, srcCol: Column, dstCol: Column,
      labels: DataFrame, nodeCol: Column, communityCol: Column): DataFrame = {
    val lab = labels.select(nodeCol.as("_n"), communityCol.as("_c"))
    val e = edges.select(srcCol.as("_s"), dstCol.as("_d"))
      .join(lab.select(col("_n").as("_s"), col("_c").as("_sc")), Seq("_s"))
      .join(lab.select(col("_n").as("_d"), col("_c").as("_dc")), Seq("_d"))
    // one pass over labeled symmetric edges: per source-community degree
    // sums and intra-community symmetric counts
    val byC = e.groupBy(col("_sc").as("_comm")).agg(
      count(lit(1)).as("_deg_sum"), // Σ out-degree in c == D_c (symmetric list)
      sum(when(col("_sc") === col("_dc"), 1L).otherwise(0L)).as("_intra_sym"))
    val tot = byC.agg(sum(col("_deg_sum")).as("_e")) // E = 2m, one row
    byC.crossJoin(broadcast(tot))
      .select(
        col("_comm"),
        (col("_e").cast("decimal(38,0)") * col("_intra_sym") -
          col("_deg_sum").cast("decimal(38,0)") * col("_deg_sum")).as("_qc"),
        col("_e"))
      .groupBy(col("_e"))
      .agg(count(lit(1)).as("communities"), sum(col("_qc")).as("_qn"))
      .select(
        col("communities"),
        expr("_e div 2L").as("m_edges"), // `/` on longs would widen to double
        col("_qn").cast("double").as("q_num"),
        (col("_e").cast("decimal(38,0)") * col("_e")).cast("double").as("q_denom"),
        round(col("_qn").cast("double") /
          (col("_e").cast("decimal(38,0)") * col("_e")).cast("double"), 6)
          .as("modularity"))
  }

  /** Degree distribution — the first thing to look at on any graph
    * (hub structure, power-law tail, skew that will break a
    * superstep's shuffle): per-degree node counts plus each bucket's
    * share of total degree (ppm), so "the top-degree bucket carries
    * X% of the edges" reads straight off the result.
    *
    * Two hash-aggs on narrow longs: node → degree (|E| rows in,
    * map-side combined), then degree → node count (|V| rows in). The
    * totals row is a 1-row broadcast. Degree is OUT-degree of the
    * edge list as given — pass a symmetrized list (both directions)
    * for undirected total degree. Output: (degree, n_nodes,
    * degree_share_ppm) — exact integers only.
    */
  /** Deterministic hash-guided walks — the DeepWalk/node2vec corpus
    * generator with the RNG replaced by a hash argmin so the walks
    * are reproducible and oracle-checkable: at step i from node cur,
    * the walk moves to the neighbor minimizing md5(salt:i:cur:dst)
    * (a different pseudo-random neighbor each step, the same one on
    * every engine and every rerun). Dead-end nodes stay in place.
    *
    * Scale shape: one hash-join + min-struct aggregate per step —
    * each step shuffles |walks|·avg-degree narrow rows keyed by the
    * walk; the edge list is persisted once and reused across steps.
    * `steps` is small by construction (walk corpora use 3–80);
    * nothing here depends on |V|. Output: (start, final, path) with
    * the '>'-joined node path.
    */
  def hashWalks(edges: DataFrame, srcCol: Column, dstCol: Column,
      starts: DataFrame, startCol: Column, steps: Int,
      salt: String = "w"): DataFrame = {
    require(steps >= 1 && steps <= 128,
      s"hashWalks: steps must be in [1,128], got $steps")
    val e = graft.core.CacheRegistry.persist(
      edges.select(srcCol.as("_src"), dstCol.as("_dst")),
      org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    var walk = starts.select(startCol.as("start")).distinct()
      .select(col("start"), col("start").as("cur"),
        col("start").cast("string").as("path"))
    for (i <- 1 to steps) {
      val step = walk.join(e, col("cur") === col("_src"), "left")
        .withColumn("_h",
          md5(concat_ws(":", lit(salt), lit(i), col("cur"), col("_dst"))))
        .groupBy(col("start"), col("cur"), col("path"))
        .agg(min(struct(col("_h"), col("_dst"))).as("_pick"))
      walk = step.select(col("start"),
        coalesce(col("_pick._dst"), col("cur")).as("cur"),
        concat(col("path"), lit(">"),
          coalesce(col("_pick._dst"), col("cur")).cast("string")).as("path"))
    }
    walk.select(col("start"), col("cur").as("final"), col("path"))
  }

  def degreeDistribution(edges: DataFrame, srcCol: Column): DataFrame = {
    val deg = edges.where(srcCol.isNotNull)
      .groupBy(srcCol.as("_n")).agg(count(lit(1)).as("degree"))
    val dist = deg.groupBy(col("degree")).agg(count(lit(1)).as("n_nodes"))
    val tot = dist.agg(sum(col("degree") * col("n_nodes")).as("_te"))
    dist.crossJoin(broadcast(tot))
      .select(col("degree"), col("n_nodes"),
        expr("degree * n_nodes * 1000000L div _te").as("degree_share_ppm"))
  }

  /** Common-neighbor link prediction over a directed adjacency list:
    * pairs of SOURCE nodes sharing a destination, scored by shared-
    * neighbor count and Jaccard overlap (ppm, floor-div — exact
    * integers end-to-end). The classic "customers who buy from the
    * same suppliers" candidate generator.
    *
    * Scale: candidate pairs explode quadratically in HUB destinations,
    * so destinations with in-degree > `maxDeg` are dropped before the
    * self-join (the standard df-cap; a node half the graph points at
    * predicts nothing anyway). What shuffles is the capped (dst, src)
    * postings list and then (pair, count) rows — never full neighbor
    * sets. Output is the global top-`k` by (jaccard, pair) via
    * TakeOrdered, so the driver sees k rows regardless of graph size.
    * Returns (a, b, common, deg_a, deg_b, jaccard_ppm).
    */
  def commonNeighborPairs(edges: DataFrame, srcCol: Column, dstCol: Column,
      maxDeg: Int = 1000, k: Int = 100): DataFrame = {
    require(maxDeg >= 2, s"commonNeighborPairs: maxDeg must be >= 2, got $maxDeg")
    require(k >= 1, s"commonNeighborPairs: k must be >= 1, got $k")
    val adj = edges.select(srcCol.as("_s"), dstCol.as("_d"))
      .where(col("_s").isNotNull && col("_d").isNotNull).distinct()
      .localCheckpoint(true)
    val deg = adj.groupBy(col("_s")).agg(count(lit(1)).as("_deg"))
    val keep = adj.join(
      adj.groupBy(col("_d")).agg(count(lit(1)).as("_in"))
        .where(col("_in") <= maxDeg).select(col("_d")),
      Seq("_d"), "left_semi")
    val pairs = keep.as("l").join(keep.as("r"), col("l._d") === col("r._d"))
      .where(col("l._s") < col("r._s"))
      .groupBy(col("l._s").as("a"), col("r._s").as("b"))
      .agg(count(lit(1)).as("common"))
    pairs
      .join(deg.select(col("_s").as("a"), col("_deg").as("deg_a")), Seq("a"))
      .join(deg.select(col("_s").as("b"), col("_deg").as("deg_b")), Seq("b"))
      .select(col("a"), col("b"), col("common"), col("deg_a"), col("deg_b"),
        expr("common * 1000000L div (deg_a + deg_b - common)").as("jaccard_ppm"))
      .orderBy(col("jaccard_ppm").desc, col("common").desc,
        col("a").asc, col("b").asc)
      .limit(k)
  }

  /** Adamic–Adar / resource-allocation link prediction — the
    * degree-weighted upgrade of [[commonNeighborPairs]]: a shared
    * neighbor that EVERYONE shares (a hub destination) is weak
    * evidence two sources are related; one that only they share is
    * strong. Each shared destination z contributes 1/ln(in(z))
    * (Adamic–Adar) and 1/in(z) (resource allocation) instead of 1.
    *
    * Determinism discipline: the RA leg is exact integers end-to-end —
    * per-destination weight 10⁶ div in(z), summed as longs; the AA leg
    * rounds each 1/ln(in(z)) term to 6dp DECIMAL once and sums exactly
    * (the [[Analytics]] entropy discipline), so neither leg depends on
    * float summation order. Destinations with in-degree 1 cannot be
    * shared and are excluded before the weight (also keeping ln ≥
    * ln 2 > 0).
    *
    * Scale: identical to [[commonNeighborPairs]] — hub destinations
    * above `maxDeg` are dropped before the postings self-join (the
    * standard df-cap), pair work is Σ_dst in(z)², and the output is
    * the global top-`k` via TakeOrdered, so the driver sees k rows at
    * any graph size. Output:
    * (a, b, common, aa_score, ra_ppm).
    */
  def adamicAdarPairs(edges: DataFrame, srcCol: Column, dstCol: Column,
      maxDeg: Int = 1000, k: Int = 100): DataFrame = {
    require(maxDeg >= 2, s"adamicAdarPairs: maxDeg must be >= 2, got $maxDeg")
    require(k >= 1, s"adamicAdarPairs: k must be >= 1, got $k")
    val adj = edges.select(srcCol.as("_s"), dstCol.as("_d"))
      .where(col("_s").isNotNull && col("_d").isNotNull).distinct()
      .localCheckpoint(true)
    val inDeg = adj.groupBy(col("_d")).agg(count(lit(1)).as("_in"))
      .where(col("_in") >= 2 && col("_in") <= maxDeg)
      .select(col("_d"),
        expr("1000000L div _in").as("_wra"),
        round(lit(1.0d) / log(col("_in").cast("double")), 6)
          .cast("decimal(18,6)").as("_waa"))
    val keep = adj.join(inDeg, Seq("_d"))
    keep.as("l").join(keep.as("r"), col("l._d") === col("r._d"))
      .where(col("l._s") < col("r._s"))
      .groupBy(col("l._s").as("a"), col("r._s").as("b"))
      .agg(count(lit(1)).as("common"),
        sum(col("l._waa")).as("_aa"), sum(col("l._wra")).as("ra_ppm"))
      .select(col("a"), col("b"), col("common"),
        col("_aa").cast("double").as("aa_score"), col("ra_ppm"))
      .orderBy(col("ra_ppm").desc, col("common").desc,
        col("a").asc, col("b").asc)
      .limit(k)
  }

  /** Degree assortativity: the Pearson correlation of endpoint degrees
    * over a SYMMETRIC directed edge list — do high-degree nodes attach
    * to high-degree nodes (r > 0, social) or to leaves (r < 0,
    * hub-and-spoke/Internet)?
    *
    * One degree agg + two narrow joins decorate each edge with
    * (deg_src, deg_dst); the correlation reduces to six DECIMAL(38,0)
    * sums (deg² · |E| passes 2^63 long before the graph is large), one
    * map-side-combinable aggregate, one final IEEE expression — the
    * same shuffle-order-proof discipline as [[modularity]]. Returns
    * one row (n_edges, r).
    */
  def degreeAssortativity(edges: DataFrame, srcCol: Column, dstCol: Column): DataFrame = {
    val e = edges.select(srcCol.as("_s"), dstCol.as("_d"))
      .where(col("_s").isNotNull && col("_d").isNotNull)
    val deg = e.groupBy(col("_s").as("_n")).agg(count(lit(1)).as("_deg"))
    val dec = (c: Column) => c.cast("decimal(38,0)")
    e.join(deg.select(col("_n").as("_s"), col("_deg").as("_x")), Seq("_s"))
      .join(deg.select(col("_n").as("_d"), col("_deg").as("_y")), Seq("_d"))
      .agg(
        count(lit(1)).as("n_edges"),
        sum(dec(col("_x"))).as("_sx"), sum(dec(col("_y"))).as("_sy"),
        sum(dec(col("_x")) * col("_y")).as("_sxy"),
        sum(dec(col("_x")) * col("_x")).as("_sxx"),
        sum(dec(col("_y")) * col("_y")).as("_syy"))
      .select(col("n_edges"),
        round(
          (col("n_edges") * col("_sxy") - col("_sx") * col("_sy")).cast("double") /
            (sqrt((col("n_edges") * col("_sxx") - col("_sx") * col("_sx")).cast("double")) *
             sqrt((col("n_edges") * col("_syy") - col("_sy") * col("_sy")).cast("double"))),
          6).as("r"))
  }

  /** Sampled distance profile of a graph — the small-world audit
    * beside the per-node centralities: how far apart IS this corpus
    * graph? From the same `nSeeds`-source tagged BFS as
    * [[harmonicCentrality]], one summary row:
    *
    *  - `n_pairs` — (seed, node) pairs reached within `maxHops`
    *  - `diameter_lb` — max observed distance (a LOWER bound: sampled
    *    sources + hop horizon; the standard estimator's caveat)
    *  - `eff_d50` / `eff_d90` — effective diameter readouts: the
    *    smallest d with ≥ 50% / 90% of reached pairs within d (the
    *    "six degrees" statistic; integer CDF compare `10·cum ≥
    *    9·total`, no percentile float)
    *  - `mean_dist_ppm` — exact `10⁶·Σd div pairs`
    *
    * Scale shape: the BFS is the [[harmonicCentrality]] superstep
    * loop verbatim; the readout aggregates a ≤`maxHops`-row
    * distance histogram with a tiny self-join CDF (NO global-order
    * window — the histogram is the shuffle, hops rows total).
    */
  def distanceSummary(edges: DataFrame, srcCol: Column, dstCol: Column,
      nSeeds: Int = 8, maxHops: Int = 3): DataFrame = {
    require(nSeeds >= 1 && maxHops >= 1,
      s"distanceSummary: nSeeds/maxHops must be >= 1, got $nSeeds/$maxHops")
    val e = graft.core.CacheRegistry.persist(
      edges.select(srcCol.as("src"), dstCol.as("dst"))
        .where(col("src").isNotNull && col("dst").isNotNull)
        // srcEdgeLayout: one exchange establishes the loop layout
        // (dedup clusters on the src hash); the conf-gated prededup
        // form is the skew insurance for raw duplicated edge lists
        .transform(srcEdgeLayout),
      MEMORY_AND_DISK)
    val verts = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()
    val seeds = verts
      .orderBy(md5(col("node").cast("string")), col("node"))
      .limit(nSeeds)
    var dist = seeds
      .select(col("node").as("seed"), col("node"), lit(0).as("dist"))
      .localCheckpoint(true)
    var frontier = dist
    for (hop <- 1 to maxHops) {
      val next = e.join(frontier, col("src") === col("node"))
        .select(col("seed"), col("dst").as("node")).distinct()
        .join(dist.select("seed", "node"), Seq("seed", "node"), "left_anti")
        .select(col("seed"), col("node"), lit(hop).as("dist"))
        .localCheckpoint(true) // the round's one materializing action
      dist = dist.union(next)
      frontier = next
    }
    // ONE scan of the BFS output: the ≤maxHops-row distance histogram
    // is checkpointed and every readout (totals, CDF, quantile
    // compares) derives from it — totals as Σc / max / Σ dist·c, not
    // as separate full-frame aggregates
    val byd = dist.where(col("dist") > 0)
      .groupBy(col("dist")).agg(count(lit(1)).as("_c"))
      .localCheckpoint(true)
    val tot = byd.agg(
      sum(col("_c")).as("n_pairs"),
      max(col("dist")).cast("long").as("diameter_lb"),
      sum(col("dist") * col("_c")).as("_sumd"))
    val cdf = byd.select(col("dist").as("_da"))
      .join(byd.select(col("dist").as("_db"), col("_c")),
        col("_db") <= col("_da"))
      .groupBy(col("_da")).agg(sum(col("_c")).as("_cum"))
    val e50 = cdf.crossJoin(tot.select(col("n_pairs").as("_t1")))
      .where(col("_cum") * 2 >= col("_t1"))
      .agg(min(col("_da")).cast("long").as("eff_d50"))
    val e90 = cdf.crossJoin(tot.select(col("n_pairs").as("_t2")))
      .where(col("_cum") * 10 >= col("_t2") * 9)
      .agg(min(col("_da")).cast("long").as("eff_d90"))
    tot.crossJoin(e50).crossJoin(e90)
      .select(lit(nSeeds).as("n_seeds"), col("n_pairs"),
        col("diameter_lb"), col("eff_d50"), col("eff_d90"),
        expr("_sumd * 1000000 div n_pairs").as("mean_dist_ppm"))
  }

  /** Pair-sampled betweenness centrality — the "which nodes sit ON the
    * traffic" readout completing the centrality family ([[pageRank]]
    * rewards being pointed at, [[harmonicCentrality]] being close;
    * betweenness rewards being UNAVOIDABLE — the broker/bridge metric
    * that flags single points of failure and gateway hubs). Exact
    * Brandes is O(V·E) and needs every source; the standard scalable
    * estimator restricts both endpoints to a sampled seed set S and
    * scores each middle node v by the shortest-path-through fraction,
    * summed over seed pairs s<t reachable within `maxHops`:
    *
    * {{{ B(v) = Σ_{s<t ∈ S, v∉{s,t}, d(s,v)+d(v,t)=d(s,t)} σ_sv·σ_tv / σ_st }}}
    *
    * (σ = number of shortest paths; on an undirected graph σ_vt = σ_tv,
    * so ONE |S|-source forward BFS with path counts serves both legs —
    * no backward Brandes accumulation pass needed for the pair-sampled
    * form.) Seeds are the `nSeeds` smallest nodes in (md5(node), node)
    * order — the reproducible no-RNG uniform draw every sampled graph
    * operator here uses.
    *
    * Arithmetic is exact end-to-end: path counts are decimal(38,0)
    * sums (the DuckDB oracle mirrors in HUGEINT), and each pair
    * contribution is the integer floor `(10⁶·σ_sv·σ_tv) div σ_st` —
    * numerators are non-negative so Spark's truncating `div` and the
    * oracle's `//` agree, and σ_sv·σ_tv ≤ σ_st bounds every term at
    * 10⁶ (long-safe sums). No float touches the statistic.
    *
    * Scale shape: the [[harmonicCentrality]] tagged multi-source BFS —
    * all seeds advance in the same superstep joins against the
    * persisted src-partitioned edge frame, one materializing
    * `localCheckpoint` per hop (O(hops) shallow lineage, AQE sees real
    * frontier sizes), fixed `maxHops` with no per-round isEmpty probe.
    * The accumulation stage never touches edges again: it joins the
    * |S|·|V|-row BFS table to its |S|²-pair slice — both tiny next to
    * |E| — and aggregates by node. Horizon note: only seed pairs with
    * d(s,t) ≤ maxHops contribute, and middle nodes must satisfy
    * d(s,v)+d(v,t) = d(s,t) ≤ maxHops, so the hop cap pins the pair
    * universe deterministically (same pinning as [[shortestPaths]]'
    * Bellman-Ford horizon). Output: (node, n_pairs, between_ppm) for
    * the global top-`k` by (between_ppm desc, node).
    */
  def betweennessSampled(edges: DataFrame, srcCol: Column, dstCol: Column,
      nSeeds: Int = 8, maxHops: Int = 4, k: Int = 50): DataFrame = {
    require(nSeeds >= 2 && maxHops >= 1 && k >= 1,
      s"betweennessSampled: need nSeeds >= 2, maxHops >= 1, k >= 1; " +
        s"got $nSeeds/$maxHops/$k")
    val e = graft.core.CacheRegistry.persist(
      edges.select(srcCol.as("src"), dstCol.as("dst"))
        .where(col("src").isNotNull && col("dst").isNotNull)
        // srcEdgeLayout: one exchange establishes the loop layout
        // (dedup clusters on the src hash); the conf-gated prededup
        // form is the skew insurance for raw duplicated edge lists
        .transform(srcEdgeLayout),
      MEMORY_AND_DISK)
    val verts = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()
    val seeds = verts
      .orderBy(md5(col("node").cast("string")), col("node"))
      .limit(nSeeds)
    var bfs = seeds
      .select(col("node").as("seed"), col("node"), lit(0).as("dist"),
        lit(1L).cast("decimal(38,0)").as("cnt"))
      .localCheckpoint(true)
    var frontier = bfs
    for (hop <- 1 to maxHops) {
      // σ recurrence: every shortest path to a dist-`hop` node extends
      // a shortest path to a dist-(hop−1) predecessor, so summing the
      // FRONTIER's counts into not-yet-visited neighbours is exact
      // Brandes forward counting (the anti-join keeps later, longer
      // arrivals from polluting σ).
      val next = e.join(frontier, col("src") === col("node"))
        .groupBy(col("seed"), col("dst"))
        .agg(sum(col("cnt")).as("cnt"))
        .select(col("seed"), col("dst").as("node"), lit(hop).as("dist"),
          col("cnt"))
        .join(bfs.select("seed", "node"), Seq("seed", "node"), "left_anti")
        .localCheckpoint(true) // the round's one materializing action
      bfs = bfs.union(next)
      frontier = next
    }
    // the checkpointed dist-0 rows ARE the seed set — reusing them
    // avoids re-deriving seeds (a second |E| scan + global sort)
    val st = bfs
      .join(bfs.where(col("dist") === 0)
        .select(col("node").as("_t")), col("node") === col("_t"))
      .where(col("seed") < col("node"))
      .select(col("seed").as("s"), col("node").as("t"),
        col("dist").as("d_st"), col("cnt").as("c_st"))
    // (r17 measured-and-rejected: folding the accumulation into ONE
    // groupBy(node) building a seed→(dist,cnt) map + a broadcast |S|²
    // pair array, with the pair sum as a higher-order filter/aggregate,
    // removed the (t,v) shuffle join from the plan (34→32 jobs) but
    // regressed seconds 40% — collect_list/map_from_entries plan as
    // ObjectHashAggregate, which falls back to SORT-based aggregation
    // past 128 distinct keys per partition, so the |S|·|V| BFS table
    // paid a sort that costs more than the codegen joins it replaced.
    // The triple join below is bounded by |S|²/2·|V| intermediate rows
    // (|S| is a pinned small constant), all hash-join codegen.)
    val a = bfs.select(col("seed").as("s"), col("node").as("v"),
      col("dist").as("d_sv"), col("cnt").as("c_sv"))
    val b = bfs.select(col("seed").as("t"), col("node").as("v"),
      col("dist").as("d_tv"), col("cnt").as("c_tv"))
    st.join(a, Seq("s")).join(b, Seq("t", "v"))
      .where(col("d_sv") + col("d_tv") === col("d_st") &&
        col("v") =!= col("s") && col("v") =!= col("t"))
      .select(col("v").as("node"),
        expr("(CAST(1000000 AS DECIMAL(38,0)) * c_sv * c_tv) div c_st")
          .as("term"))
      .groupBy(col("node"))
      .agg(count(lit(1)).as("n_pairs"), sum(col("term")).as("between_ppm"))
      .orderBy(col("between_ppm").desc, col("node").asc)
      .limit(k)
  }
}
