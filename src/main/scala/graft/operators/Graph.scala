package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables.{events, t}

/** Iterative graph dataflow (PageRank) — the fixed-point computation
  * pattern the reference category has no answer for and a training-data
  * pipeline meets as soon as it ranks sources by link structure (the
  * original PageRank use: which pages/domains to crawl and keep).
  *
  * Graph: the part–supplier bipartite graph from lineitem (edge iff some
  * order ships part p from supplier s), symmetrized. Nodes are encoded in
  * one id space (2·partkey for parts, 2·suppkey+1 for suppliers) so the
  * rank vector is a single (node, r) frame.
  *
  * The iteration is a DRIVER LOOP THAT ONLY BUILDS PLAN — no action, no
  * collect inside: each of the 5 steps composes one equi-join
  * (ranks ⋈ edges on the source key) and one map-side-combinable sum
  * onto the logical plan, and the whole 5-step pipeline executes as one
  * job when the result materializes. Scale shape: per iteration exactly
  * one shuffle of O(E) contribution rows hash-partitioned on dst (at
  * 100 TB you bucket `edges` once on src so the per-iteration join
  * reuses its partitioning and only the O(V) rank vector moves);
  * `edges`/`deg` are persisted because every iteration references them.
  * Unbounded iteration would checkpoint every ~10 steps to truncate
  * lineage (q69's localCheckpoint pattern); 5 fixed steps keep the plan
  * small enough that lineage is free — and fixed iterations are what
  * makes the result DuckDB-oracle-checkable (the oracle unrolls the same
  * 5 steps as CTEs).
  *
  * Arithmetic parity (Tables.scala rules): all mass is integer units of
  * 1e-12 of the graph (`Base`), every division is integer `div` with
  * positive operands (= DuckDB `//`), so each iteration is bit-exact in
  * any partitioning and across engines — no floating-point rank drift.
  * r_{t+1}(v) = (15·Base) div (100·N) + (85·Σ_{u∼v} (r_t(u) div deg u)) div 100.
  */
object Graph {

  val Iters = 5
  val Base = 1000000000000L // total rank mass, 1e-12 units
  val TopK = 20

  /** q203: hot-bucket cap on the co-occurrence projection — a bucket of
    * m users contributes m²/2 edges, so one hot (type, hour) would
    * dominate the pair space (the shingle-DfCap discipline applied to
    * graph building). Not binding at test SFs (hourly buckets run
    * ~15-25 users); the 100 TB contract is gated at scale by
    * [[TriScale]]: a planted 60-user bucket must be dropped whole on a
    * ~1M-edge graph (exact edge-count assert). */
  val TriBucketCap = 40L

  /** q203: deterministic edge-sampling rate 1/32 — DOULION's estimator:
    * count triangles on a p-sampled edge set, scale by 1/p³. Sampling by
    * salted md5 of the edge (the q75/q76 idiom), never rand(): the
    * sampled set — and therefore the ESTIMATE itself — is identical
    * across engines, runs and cluster layouts, which is what lets a
    * sampling-based estimate be oracle-hash-exact. Accuracy is gated at
    * scale by [[TriScale]]: within 3σ (≈15%) of a planted ~12.7M-triangle
    * truth; measured 0.12%. */
  val TriSampleDenom = 32 // keep edge iff first 2 md5 hex chars < '08'

  /** q257: BFS hop depth — fixed unroll so both engines run the identical
    * frontier algebra (unbounded BFS is the q128 driver-loop shape with a
    * checkpoint every ~10 hops; fixed hops are what make the reachable
    * sets oracle-hash-exact). */
  val BfsHops = 4

  /** q257's frontier algebra over any symmetric (src, dst) edge frame —
    * exposed so GraphSpec can prove the hop census on engineered graphs
    * (a path graph pins one node per hop; a disconnected component must
    * land at hop −1) through the IDENTICAL pipeline. Seed = min node.
    * Scale/lineage notes at the q257 use site. */
  private[operators] def bfsCensus(edges: DataFrame): DataFrame = {
    val nodes = edges.select(col("src").as("node")).distinct()
    var frontier = edges.agg(min(col("src")).as("node"))
      .localCheckpoint()
    var visited = frontier
    val hops = scala.collection.mutable.ArrayBuffer((0, frontier))
    for (h <- 1 to BfsHops) {
      frontier = frontier.join(edges, frontier("node") === edges("src"))
        .select(col("dst").as("node")).distinct()
        .join(visited, Seq("node"), "left_anti")
        .localCheckpoint()
      visited = visited.union(frontier)
      hops += ((h, frontier))
    }
    val unreached = nodes.join(visited, Seq("node"), "left_anti")
    (hops.toSeq :+ ((-1, unreached)))
      .map { case (h, f) =>
        f.select(lit(h).cast("bigint").as("hop"), col("node")) }
      .reduce(_.union(_))
      .groupBy(col("hop"))
      .agg(count(lit(1)).as("n_nodes"),
        min(col("node")).as("min_node"),
        max(col("node")).as("max_node"),
        sum(col("node")).cast("bigint").as("sum_node"))
      .orderBy(col("hop"))
  }

  /** q292: synchronous label-propagation iterations — fixed unroll for
    * the same reason as [[BfsHops]]: both engines must run the identical
    * update algebra for the final labeling to be oracle-hash-exact. */
  val LpaIters = 3

  /** q292's LPA over any symmetric (src, dst) edge frame — exposed so
    * GraphSpec can prove convergence identities on engineered graphs
    * (two disjoint cliques collapse to their min-node labels after ONE
    * iteration: every neighborhood's labels are initially distinct, so
    * the min-label tie-break IS the update). Update rule: each node
    * adopts the most frequent label among neighbors-plus-self, ties to
    * the SMALLEST label (deterministic — the argmax rides a (cnt,
    * -label) struct max, q211's lexicographic discipline). Each
    * iteration localCheckpoints (the q257 lineage lesson: the label
    * frame is ≤|V| rows of two BIGINTs, never payloads). */
  private[operators] def lpaCommunities(edges: DataFrame): DataFrame = {
    val nodes = edges.select(col("src").as("node")).distinct()
    // r13 optimization (guide §2.4/§3.1): the neighbor frame is read by
    // every iteration's join, so persist it PRE-PARTITIONED on the join
    // key (one exchange at build, reused 3×) — the q128 edges layout
    // applied to LPA. The shuffle_hash hint on the O(V) label side stops
    // the planner broadcasting the O(E+V) neighbor frame per iteration
    // (it was the estimate-cheap side; rebuilt broadcasts don't reuse).
    val nb = graft.CacheRegistry.cached(
      edges.select(col("dst").as("node"), col("src").as("nbr"))
        .union(nodes.select(col("node"), col("node").as("nbr")))
        .repartition(col("nbr")))
    var labels = nodes.select(col("node"), col("node").as("label"))
      .localCheckpoint()
    for (_ <- 1 to LpaIters) {
      labels = nb
        .join(labels.select(col("node").as("ln"), col("label"))
            .hint("shuffle_hash"),
          col("nbr") === col("ln"))
        .groupBy(col("node"), col("label"))
        .agg(count(lit(1)).as("cnt"))
        .groupBy(col("node"))
        .agg(max(struct(col("cnt").as("c"), (-col("label")).as("nl")))
          .as("mx"))
        .select(col("node"), (-col("mx.nl")).as("label"))
        .localCheckpoint()
    }
    labels.groupBy(col("label"))
      .agg(count(lit(1)).as("n_nodes"), min(col("node")).as("min_node"),
        sum(col("node")).cast("bigint").as("sum_node"))
      .orderBy(col("n_nodes").desc, col("label"))
  }

  /** The q203/q257 DOULION-sampled symmetric edge frame, factored so
    * q292 runs communities over the IDENTICAL graph (CacheRegistry
    * dedupes by plan identity, so all three queries share one pairs
    * materialization). */
  private[operators] def sampledEdges(s: SparkSession, d: String): DataFrame = {
    val ev = events(s, d)
      .select(col("user_id"), col("event_type"),
        date_trunc("hour", col("ts")).as("h"))
      .distinct()
    val buckets = ev.groupBy(col("event_type"), col("h"))
      .agg(count(lit(1)).as("m"))
      .where(col("m") <= TriBucketCap)
    val members = ev.join(buckets.select(col("event_type"), col("h")),
      Seq("event_type", "h"))
    val pairs = graft.CacheRegistry.cached(members.as("x")
      .join(members.as("y"), Seq("event_type", "h"))
      .where(col("x.user_id") < col("y.user_id"))
      .select(col("x.user_id").as("a"), col("y.user_id").as("b"))
      .distinct())
    val sampled = pairs.where(
      substring(md5(concat(lit("tri_"), col("a"), lit("_"), col("b"))),
        1, 2) < lit("08"))
    graft.CacheRegistry.cached(
      sampled.select(col("a").as("src"), col("b").as("dst"))
        .union(sampled.select(col("b").as("src"), col("a").as("dst"))))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    "q292_label_prop" -> ((s, d) => {
      // Label-propagation community detection (Raghavan et al.) — the
      // graph family's clustering leg after ranking (q128), structure
      // (q203/q251) and reachability (q257), on the IDENTICAL 1/32-
      // sampled co-occurrence graph q257 walks (deterministic md5
      // sampling is what lets a community assignment be hash-exact).
      // Synchronous updates, LpaIters fixed, most-frequent-neighbor
      // label with self-inclusion (the standard anti-oscillation form)
      // and min-label ties. Each iteration is the scalable shape: one
      // edges⋈labels equi-join (at 100 TB edges bucket on src — q128's
      // layout — so only the O(V) label frame moves), two stacked
      // aggregates ((node, label) counts → per-node struct argmax),
      // and a localCheckpoint to keep the plan constant-size (the q257
      // lineage lesson). Output: per-community census rows — exact
      // order-independent integers, communities by size then label.
      lpaCommunities(sampledEdges(s, d)).limit(30)
    }),

    "q257_bfs_hops" -> ((s, d) => {
      // BFS reachability over the DOULION-sampled co-occurrence graph —
      // the graph family's missing third leg after ranking (q128) and
      // structure metrics (q203/q251): hop-distance from a seed, the
      // primitive behind crawl-frontier scheduling and "how many hops
      // until the component is exhausted". The UNSAMPLED graph is
      // near-complete (q251's verdict: degrees 85–123), where BFS is a
      // trivial 1–2 hops; the 1/32 md5-sampled edge set (q203's
      // DOULION subset — deterministic, layout-independent, so the
      // reachable SETS are oracle-exact) thins mean degree to ~3 and
      // gives the frontier a real multi-hop expansion plus a
      // disconnected remainder. Each hop is the scalable shape: one
      // equi-join frontier⋈edges (at 100 TB edges are bucketed on src —
      // q128's layout — so only the O(frontier) side moves), one
      // distinct, one LEFT ANTI against the visited set; per-hop frames
      // go through CacheRegistry so hop k isn't recomputed by every
      // later visited reference (linear, not quadratic, plan). Output:
      // per-hop exact census rows (count, min/max, sum of node ids —
      // order-independent integers) with the unreached remainder as
      // hop −1; seed = min node id, deterministic.
      // edge build factored as sampledEdges — cached at the PAIRS level
      // with q203's exact plan: Spark's CacheManager dedupes by plan
      // identity, so q203/q257/q292 share one materialization AND the
      // symmetric union doesn't evaluate the member self-join twice
      // (uncached, edges paid 2× the pair build — the round-10 bench
      // flagged it at sf0.1)
      val edges = sampledEdges(s, d)
      // hop loop in bfsCensus; each frontier is localCheckpoint'ed (the
      // q69 lineage-truncation idiom) rather than CacheRegistry-cached:
      // caching truncates physical re-execution but the LOGICAL plan
      // keeps full lineage, and BFS's visited accumulation makes that
      // lineage grow exponentially with hops (frontier_h embeds
      // frontier_{h-1} twice: once via the expansion join, once via the
      // anti-join's visited union) — at sf0.1 the optimizer+codegen
      // walk alone grew to ~17 s of the query's 22 s before this.
      // Checkpointing collapses each ≤|V|-row frontier to a leaf, so
      // every hop's plan — and the census over all of them — stays
      // constant-size; the checkpointed frames are node-id lists,
      // never payloads.
      bfsCensus(edges)
    }),

    "q251_degree_powerlaw" -> ((s, d) => {
      // Degree-distribution POWER-LAW diagnostics — the structural
      // report read before choosing a skew strategy (q231 profiles one
      // join key; THIS asks whether the whole graph is heavy-tailed,
      // which decides between q161-style salting and degree-ordered
      // algorithms like q203's orientation): the SAME capped
      // co-occurrence pairs as q203 (unsampled), per-user degree, the
      // degree histogram, and the log-log least-squares slope — a
      // power law is a straight line in ln/ln, slope ≈ −α. Each ln
      // quantizes to nanounits per histogram row (q154), the five
      // regression moments accumulate as exact DECIMAL(38,0) integers
      // (the q140 discipline — order-independent at any layout), and
      // the one division sign-splits because the slope of a decaying
      // tail is NEGATIVE (Spark div truncates toward zero, DuckDB //
      // floors). Histogram rows carry the shared slope column so the
      // whole diagnostic hashes. On the fixture the verdict is the
      // honest one: degrees 85–123, slope +0.47 — this co-occurrence
      // graph is dense and near-uniform, NOT heavy-tailed, i.e. "don't
      // salt" — exactly the decision the report exists to make.
      val ev = events(s, d)
        .select(col("user_id"), col("event_type"),
          date_trunc("hour", col("ts")).as("h"))
        .distinct()
      val buckets = ev.groupBy(col("event_type"), col("h"))
        .agg(count(lit(1)).as("m"))
        .where(col("m") <= TriBucketCap)
      val members = ev.join(buckets.select(col("event_type"), col("h")),
        Seq("event_type", "h"))
      val pairs = members.as("x")
        .join(members.as("y"), Seq("event_type", "h"))
        .where(col("x.user_id") < col("y.user_id"))
        .select(col("x.user_id").as("a"), col("y.user_id").as("b"))
        .distinct()
      val deg = pairs.select(col("a").as("node"))
        .union(pairs.select(col("b").as("node")))
        .groupBy(col("node")).agg(count(lit(1)).as("deg"))
      val hist = graft.CacheRegistry.cached(deg
        .groupBy(col("deg").as("degree"))
        .agg(count(lit(1)).as("n_users"))
        .withColumn("x_nano", expr(
          "CAST(round(ln(CAST(degree AS DOUBLE)) * 1e9) AS BIGINT)"))
        .withColumn("y_nano", expr(
          "CAST(round(ln(CAST(n_users AS DOUBLE)) * 1e9) AS BIGINT)")))
      val dec = "decimal(38,0)"
      val slope = hist.agg(
          count(lit(1)).cast(dec).as("n"),
          sum(col("x_nano").cast(dec)).as("sx"),
          sum(col("y_nano").cast(dec)).as("sy"),
          sum(col("x_nano").cast(dec) * col("x_nano").cast(dec)).as("sxx"),
          sum(col("x_nano").cast(dec) * col("y_nano").cast(dec)).as("sxy"))
        .select(expr("n * sxy - sx * sy").as("num"),
          expr("n * sxx - sx * sx").as("den"))
        .select(expr(
          "CAST(CASE WHEN num >= 0 THEN (num * 1000000000) div den " +
            "ELSE -(((-num) * 1000000000) div den) END AS BIGINT)")
          .as("slope_nano"))
      hist.crossJoin(broadcast(slope))
        .select(col("degree"), col("n_users"), col("x_nano"),
          col("y_nano"), col("slope_nano"))
        .orderBy("degree")
    }),

    "q203_triangles" -> ((s, d) => {
      // Triangle counting — the graph-structure metric next to q128's
      // ranking (clustering/transitivity of the user co-occurrence
      // graph), with all three of the technique's scale moves executed:
      // (1) the PROJECTION (users sharing a (event_type, hour) bucket)
      // caps hot buckets before generating pairs — quadratic blowup is
      // bounded by TriBucketCap²/2 per bucket; (2) DOULION edge
      // sampling by content hash (deterministic ⇒ exact oracle on the
      // estimate, layout-independent on a cluster); (3) DEGREE
      // ORIENTATION — each sampled edge points low→high (degree, id),
      // turning the graph into a DAG where every triangle appears as
      // exactly one (u→v, v→w, u→w) triple and wedge generation is
      // bounded by Σ d_out² = O(E^1.5), the classic bound — never the
      // naive all-wedges join a hub node would explode. One output row:
      // exact sampled count + the 1/p³-scaled estimate, all BIGINTs.
      val ev = events(s, d)
        .select(col("user_id"), col("event_type"),
          date_trunc("hour", col("ts")).as("h"))
        .distinct()
      val buckets = ev.groupBy(col("event_type"), col("h"))
        .agg(count(lit(1)).as("m"))
        .where(col("m") <= TriBucketCap)
      val members = ev.join(buckets.select(col("event_type"), col("h")),
        Seq("event_type", "h"))
      // cached at the PAIRS level: both the edge count and the sampled
      // subset read it, and the sample is a cheap filter over the cache
      val pairs = graft.CacheRegistry.cached(members.as("x")
        .join(members.as("y"), Seq("event_type", "h"))
        .where(col("x.user_id") < col("y.user_id"))
        .select(col("x.user_id").as("a"), col("y.user_id").as("b"))
        .distinct())
      val sampled = pairs.where(
        substring(md5(concat(lit("tri_"), col("a"), lit("_"), col("b"))),
          1, 2) < lit("08"))
      val deg = sampled.select(col("a").as("node"))
        .union(sampled.select(col("b").as("node")))
        .groupBy(col("node")).agg(count(lit(1)).as("deg"))
      val withDeg = sampled
        .join(deg.select(col("node").as("a"), col("deg").as("da")), "a")
        .join(deg.select(col("node").as("b"), col("deg").as("db")), "b")
      val or = graft.CacheRegistry.cached(withDeg.select(
        when(col("da") < col("db") ||
            (col("da") === col("db") && col("a") < col("b")),
          struct(col("a").as("src"), col("b").as("dst")))
          .otherwise(struct(col("b").as("src"), col("a").as("dst")))
          .as("e")).select(col("e.src").as("src"), col("e.dst").as("dst")))
      val tri = or.select(col("src").as("u"), col("dst").as("v"))
        .join(or.select(col("src").as("v"), col("dst").as("w")), "v")
        .join(or.select(col("src").as("u"), col("dst").as("w")),
          Seq("u", "w"))
      val p3 = TriSampleDenom.toLong * TriSampleDenom * TriSampleDenom
      sampled.agg(count(lit(1)).as("n_sampled_edges"))
        .crossJoin(pairs.agg(count(lit(1)).as("n_edges")))
        .crossJoin(tri.agg(count(lit(1)).as("n_triangles_sampled")))
        .select(col("n_edges"), col("n_sampled_edges"),
          col("n_triangles_sampled"),
          (col("n_triangles_sampled") * p3).as("est_triangles"))
    }),

    "q299_ppr" -> ((s, d) => {
      // PERSONALIZED PageRank — q128's global ranking re-rooted at a
      // seed, the form recommendation/retrieval actually serves
      // ("important near THIS node", not globally): all teleport mass
      // returns to the seed (min node, deterministic) instead of
      // spreading 1/n, same exact-integer 1e-12-unit arithmetic, same
      // five iterations over the SAME cached pre-partitioned edges
      // (plan-identity cache sharing with q128 — one exchange serves
      // both rankings). After 5 iterations mass reaches ≤ 5 hops, so
      // the r > 0 filter makes the locality visible: the result IS the
      // seed's neighborhood, ranked. Top-20 on a unique order.
      val li = t(s, d, "lineitem")
        .select((col("l_partkey") * 2).as("a"),
          (col("l_suppkey") * 2 + 1).as("b"))
        .distinct()
      val edges = graft.CacheRegistry.cached(
        li.select(col("a").as("src"), col("b").as("dst"))
          .union(li.select(col("b").as("src"), col("a").as("dst")))
          .repartition(col("src")))
      val deg = graft.CacheRegistry.cached(
        edges.groupBy(col("src").as("node"))
          .agg(count(lit(1)).as("deg")))
      val sd = deg.agg(min(col("node")).as("seed"))
      var ranks = deg.crossJoin(broadcast(sd))
        .select(col("node"), col("deg"),
          when(col("node") === col("seed"), lit(Base)).otherwise(lit(0L))
            .as("r"))
      for (_ <- 1 to Iters) {
        // r13 optimization (guide §2.3/§2.4): (1) rows with r = 0 emit
        // c = 0 div deg = 0, and a dst whose contributions are all zero
        // gets sc = 0 — identical to the LEFT-join miss after coalesce —
        // so filtering them BEFORE the join is result-identical (the
        // unfiltered DuckDB oracle hash-certifies this) while shrinking
        // the join's stream side to the seed's k-hop neighborhood
        // (iteration 1: ONE row instead of |V|). (2) shuffle_hash on the
        // rank side: the planner's estimate-driven choice was to
        // BROADCAST the O(E) edge relation — rebuilt per iteration, 5
        // collects of the biggest frame in the query — where the scalable
        // shape moves only the O(V) rank vector (one small exchange per
        // step) and keeps the cached edges where they lie.
        val sums = ranks.where(col("r") > 0).hint("shuffle_hash")
          .join(edges, col("node") === col("src"))
          .select(col("dst"), expr("r div deg").as("c"))
          .groupBy("dst").agg(sum(col("c")).as("sc"))
        // r14: same SortMergeJoin→shuffle_hash flip as q128's rank
        // update (rationale there)
        ranks = deg.join(sums.hint("shuffle_hash"),
            col("node") === col("dst"), "left")
          .crossJoin(broadcast(sd))
          .select(col("node"), col("deg"),
            (when(col("node") === col("seed"),
              expr(s"(15 * $Base) div 100")).otherwise(lit(0L)) +
              expr("(85 * coalesce(sc, 0)) div 100")).as("r"))
      }
      ranks.where(col("r") > 0)
        .select(col("node"),
          when(pmod(col("node"), lit(2)) === 0, lit("part"))
            .otherwise(lit("supplier")).as("kind"),
          col("deg"), col("r").as("ppr_mass"))
        .orderBy(col("ppr_mass").desc, col("node"))
        .limit(TopK)
    }),

    "q128_pagerank" -> ((s, d) => {
      val li = t(s, d, "lineitem")
        .select((col("l_partkey") * 2).as("a"),
          (col("l_suppkey") * 2 + 1).as("b"))
        .distinct()
      // symmetric edge list; a is even, b odd, so the union can't collide.
      // Persisted PRE-PARTITIONED on the join key: InMemoryRelation keeps
      // its child's outputPartitioning, so all five per-iteration
      // ranks⋈edges joins reuse this one exchange instead of re-shuffling
      // the O(E) side every step (measured 7.0 → 3.1 s at sf0.1) — the
      // cached-bucketing move that at cluster scale is `edges` bucketed
      // on src once at write time (q132's layout applied to iteration).
      // persists route through the session-keyed CacheRegistry (shared
      // with Dedup) so Dedup.invalidateClusters / CacheRegistry.release
      // drains them — a long-lived driver must not accumulate one
      // MEMORY_AND_DISK entry per corpus per bench rep.
      val edges = graft.CacheRegistry.cached(
        li.select(col("a").as("src"), col("b").as("dst"))
          .union(li.select(col("b").as("src"), col("a").as("dst")))
          .repartition(col("src")))
      val deg = graft.CacheRegistry.cached(
        edges.groupBy(col("src").as("node"))
          .agg(count(lit(1)).as("deg")))
      // graph size as a lazy 1-row frame (the q85 idiom), not an eager
      // driver-side count — the plan stays fully declarative
      val n1 = deg.agg(count(lit(1)).as("n"))
      var ranks = deg.crossJoin(n1)
        .select(col("node"), col("deg"), expr(s"$Base div n").as("r"))
      for (_ <- 1 to Iters) {
        // r13 optimization (guide §3.1): without the hint the planner
        // BROADCASTS the cached O(E) edge relation into this join — and
        // rebuilds that broadcast every iteration (5 driver collects of
        // the largest frame in the query; zero ReusedExchange, see
        // plans/r13/q128_pagerank_before.txt). shuffle_hash on the rank
        // side flips it to the scale shape the scaladoc above promises:
        // edges stay put, only the O(V) rank vector moves per step.
        val sums = ranks.hint("shuffle_hash")
          .join(edges, col("node") === col("src"))
          .select(col("dst"), expr("r div deg").as("c"))
          .groupBy("dst").agg(sum(col("c")).as("sc"))
        // r14 (guide §3.1): the rank-update left join planned as
        // SortMergeJoin ×5 — two sorts of an O(V) frame per iteration
        // for a join whose build side (the freshly aggregated sums)
        // arrives ALREADY hash-partitioned on dst from its own partial
        // agg. shuffle_hash builds sums in place (no sort either side);
        // at scale sums ≤ deg rows per partition, the §3.1 SHJ condition.
        ranks = deg.join(sums.hint("shuffle_hash"),
            col("node") === col("dst"), "left")
          .crossJoin(n1)
          .select(col("node"), col("deg"),
            (expr(s"(15 * $Base) div (100 * n)") +
              expr("(85 * coalesce(sc, 0)) div 100")).as("r"))
      }
      ranks
        .select(col("node"),
          when(pmod(col("node"), lit(2)) === 0, lit("part"))
            .otherwise(lit("supplier")).as("kind"),
          col("deg"), col("r").as("rank_mass"))
        .orderBy(col("rank_mass").desc, col("node"))
        .limit(TopK)
    })
  )

  /** The same 5 steps unrolled as CTEs — one integer formula, two engines.
    * Every step's sum() is CAST back to BIGINT: DuckDB promotes integer
    * sum() to HUGEINT, which would propagate through all five CTEs and
    * make the driver's canonical-value hash diverge from Spark's BIGINT
    * even though every value is identical (the round-5 red row). Same
    * discipline as q140's oracle: every computed output column carries an
    * explicit CAST to the Spark-side type. */
  val oracle: Map[String, String] = Map(
    "q292_label_prop" -> {
      val step = (i: Int) =>
        s"""c$i AS (
           |  SELECT nb.node, l.label, CAST(count(*) AS BIGINT) AS cnt
           |  FROM nb JOIN l${i - 1} l ON l.node = nb.nbr
           |  GROUP BY 1, 2),
           |l$i AS (
           |  SELECT node, CAST(-struct_extract(mx, 'nl') AS BIGINT)
           |    AS label
           |  FROM (SELECT node,
           |          max(struct_pack(c := cnt, nl := -label)) AS mx
           |        FROM c$i GROUP BY node))""".stripMargin
      s"""WITH ev AS (
         |  SELECT DISTINCT user_id, event_type, date_trunc('hour', ts) AS h
         |  FROM events),
         |buckets AS (
         |  SELECT event_type, h FROM (
         |    SELECT event_type, h, count(*) AS m FROM ev GROUP BY 1, 2)
         |  WHERE m <= $TriBucketCap),
         |members AS (SELECT ev.* FROM ev JOIN buckets USING (event_type, h)),
         |pairs AS (
         |  SELECT DISTINCT x.user_id AS a, y.user_id AS b
         |  FROM members x JOIN members y USING (event_type, h)
         |  WHERE x.user_id < y.user_id),
         |sampled AS (
         |  SELECT a, b FROM pairs
         |  WHERE substr(md5('tri_' || CAST(a AS VARCHAR) || '_'
         |    || CAST(b AS VARCHAR)), 1, 2) < '08'),
         |edges AS (
         |  SELECT a AS src, b AS dst FROM sampled
         |  UNION ALL SELECT b, a FROM sampled),
         |nodes AS (SELECT DISTINCT src AS node FROM edges),
         |nb AS (
         |  SELECT dst AS node, src AS nbr FROM edges
         |  UNION ALL SELECT node, node FROM nodes),
         |l0 AS (SELECT node, node AS label FROM nodes),
         |${(1 to LpaIters).map(step).mkString(",\n")}
         |SELECT CAST(label AS BIGINT) AS label,
         |  CAST(count(*) AS BIGINT) AS n_nodes,
         |  CAST(min(node) AS BIGINT) AS min_node,
         |  CAST(sum(node) AS BIGINT) AS sum_node
         |FROM l$LpaIters GROUP BY label
         |ORDER BY n_nodes DESC, label LIMIT 30""".stripMargin
    },
    "q257_bfs_hops" -> {
      val step = (i: Int) =>
        s"""h$i AS (
           |  SELECT DISTINCT e.dst AS node FROM edges e
           |  JOIN h${i - 1} ON e.src = h${i - 1}.node
           |  EXCEPT SELECT node FROM v${i - 1}),
           |v$i AS (SELECT node FROM v${i - 1}
           |  UNION SELECT node FROM h$i)""".stripMargin
      s"""WITH ev AS (
         |  SELECT DISTINCT user_id, event_type, date_trunc('hour', ts) AS h
         |  FROM events),
         |buckets AS (
         |  SELECT event_type, h FROM (
         |    SELECT event_type, h, count(*) AS m FROM ev GROUP BY 1, 2)
         |  WHERE m <= $TriBucketCap),
         |members AS (SELECT ev.* FROM ev JOIN buckets USING (event_type, h)),
         |pairs AS (
         |  SELECT DISTINCT x.user_id AS a, y.user_id AS b
         |  FROM members x JOIN members y USING (event_type, h)
         |  WHERE x.user_id < y.user_id),
         |sampled AS (
         |  SELECT a, b FROM pairs
         |  WHERE substr(md5('tri_' || CAST(a AS VARCHAR) || '_'
         |    || CAST(b AS VARCHAR)), 1, 2) < '08'),
         |edges AS (
         |  SELECT a AS src, b AS dst FROM sampled
         |  UNION ALL SELECT b, a FROM sampled),
         |nodes AS (SELECT DISTINCT src AS node FROM edges),
         |h0 AS (SELECT min(src) AS node FROM edges),
         |v0 AS (SELECT node FROM h0),
         |${(1 to BfsHops).map(step).mkString(",\n")},
         |unreached AS (
         |  SELECT node FROM nodes EXCEPT SELECT node FROM v$BfsHops),
         |tagged AS (
         |  SELECT 0 AS hop, node FROM h0
         |${(1 to BfsHops).map(i =>
            s"  UNION ALL SELECT $i, node FROM h$i").mkString("\n")}
         |  UNION ALL SELECT -1, node FROM unreached)
         |SELECT CAST(hop AS BIGINT) AS hop,
         |  CAST(count(*) AS BIGINT) AS n_nodes,
         |  CAST(min(node) AS BIGINT) AS min_node,
         |  CAST(max(node) AS BIGINT) AS max_node,
         |  CAST(sum(node) AS BIGINT) AS sum_node
         |FROM tagged GROUP BY hop ORDER BY hop""".stripMargin
    },
    "q251_degree_powerlaw" ->
      s"""WITH ev AS (
         |  SELECT DISTINCT user_id, event_type, date_trunc('hour', ts) AS h
         |  FROM events),
         |buckets AS (
         |  SELECT event_type, h FROM (
         |    SELECT event_type, h, count(*) AS m FROM ev GROUP BY 1, 2)
         |  WHERE m <= $TriBucketCap),
         |members AS (SELECT ev.* FROM ev JOIN buckets USING (event_type, h)),
         |pairs AS (
         |  SELECT DISTINCT x.user_id AS a, y.user_id AS b
         |  FROM members x JOIN members y USING (event_type, h)
         |  WHERE x.user_id < y.user_id),
         |deg AS (
         |  SELECT node, count(*) AS deg FROM (
         |    SELECT a AS node FROM pairs
         |    UNION ALL SELECT b FROM pairs) GROUP BY 1),
         |hist AS (
         |  SELECT deg AS degree, CAST(count(*) AS BIGINT) AS n_users,
         |    CAST(round(ln(CAST(deg AS DOUBLE)) * 1e9) AS BIGINT)
         |      AS x_nano,
         |    CAST(round(ln(CAST(count(*) AS DOUBLE)) * 1e9) AS BIGINT)
         |      AS y_nano
         |  FROM deg GROUP BY deg),
         |mom AS (
         |  SELECT CAST(count(*) AS HUGEINT) AS n,
         |    sum(CAST(x_nano AS HUGEINT)) AS sx,
         |    sum(CAST(y_nano AS HUGEINT)) AS sy,
         |    sum(CAST(x_nano AS HUGEINT) * CAST(x_nano AS HUGEINT)) AS sxx,
         |    sum(CAST(x_nano AS HUGEINT) * CAST(y_nano AS HUGEINT)) AS sxy
         |  FROM hist),
         |sl AS (
         |  SELECT CAST(CASE WHEN n * sxy - sx * sy >= 0
         |    THEN ((n * sxy - sx * sy) * 1000000000)
         |      // (n * sxx - sx * sx)
         |    ELSE -(((-(n * sxy - sx * sy)) * 1000000000)
         |      // (n * sxx - sx * sx)) END AS BIGINT) AS slope_nano
         |  FROM mom)
         |SELECT CAST(degree AS BIGINT) AS degree, n_users, x_nano, y_nano,
         |  slope_nano
         |FROM hist CROSS JOIN sl ORDER BY degree""".stripMargin,
    "q203_triangles" ->
      s"""WITH ev AS (
         |  SELECT DISTINCT user_id, event_type, date_trunc('hour', ts) AS h
         |  FROM events),
         |buckets AS (
         |  SELECT event_type, h FROM (
         |    SELECT event_type, h, count(*) AS m FROM ev GROUP BY 1, 2)
         |  WHERE m <= $TriBucketCap),
         |members AS (SELECT ev.* FROM ev JOIN buckets USING (event_type, h)),
         |pairs AS (
         |  SELECT DISTINCT x.user_id AS a, y.user_id AS b
         |  FROM members x JOIN members y USING (event_type, h)
         |  WHERE x.user_id < y.user_id),
         |sampled AS (
         |  SELECT a, b FROM pairs
         |  WHERE substr(md5('tri_' || CAST(a AS VARCHAR) || '_'
         |    || CAST(b AS VARCHAR)), 1, 2) < '08'),
         |deg AS (
         |  SELECT node, count(*) AS deg FROM (
         |    SELECT a AS node FROM sampled
         |    UNION ALL SELECT b FROM sampled) GROUP BY 1),
         |orient AS (
         |  SELECT CASE WHEN da < db OR (da = db AND a < b)
         |           THEN a ELSE b END AS src,
         |         CASE WHEN da < db OR (da = db AND a < b)
         |           THEN b ELSE a END AS dst
         |  FROM (SELECT s.a, s.b, d1.deg AS da, d2.deg AS db
         |        FROM sampled s
         |        JOIN deg d1 ON s.a = d1.node
         |        JOIN deg d2 ON s.b = d2.node)),
         |tri AS (
         |  SELECT count(*) AS n FROM orient e1
         |  JOIN orient e2 ON e1.dst = e2.src
         |  JOIN orient e3 ON e3.src = e1.src AND e3.dst = e2.dst)
         |SELECT
         |  CAST((SELECT count(*) FROM pairs) AS BIGINT) AS n_edges,
         |  CAST((SELECT count(*) FROM sampled) AS BIGINT)
         |    AS n_sampled_edges,
         |  CAST(tri.n AS BIGINT) AS n_triangles_sampled,
         |  CAST(tri.n * ${TriSampleDenom.toLong * TriSampleDenom *
            TriSampleDenom} AS BIGINT) AS est_triangles
         |FROM tri""".stripMargin,
    "q299_ppr" -> {
      val step = (i: Int, prev: String) =>
        s"""s$i AS (
           |  SELECT e.dst, CAST(sum(r.r // r.deg) AS BIGINT) AS sc
           |  FROM $prev r JOIN edges e ON r.node = e.src GROUP BY 1),
           |p$i AS (
           |  SELECT d.node, d.deg,
           |    CAST(CASE WHEN d.node = seed THEN (15 * $Base) // 100
           |      ELSE 0 END
           |      + (85 * coalesce(sc, 0)) // 100 AS BIGINT) AS r
           |  FROM deg d CROSS JOIN sd LEFT JOIN s$i ON d.node = s$i.dst)"""
          .stripMargin
      s"""WITH li AS (
         |  SELECT DISTINCT l_partkey*2 AS a, l_suppkey*2+1 AS b FROM lineitem),
         |edges AS (
         |  SELECT a AS src, b AS dst FROM li
         |  UNION ALL SELECT b, a FROM li),
         |deg AS (SELECT src AS node, count(*) AS deg FROM edges GROUP BY 1),
         |sd AS (SELECT min(node) AS seed FROM deg),
         |p0 AS (
         |  SELECT node, deg, CAST(CASE WHEN node = seed THEN $Base
         |    ELSE 0 END AS BIGINT) AS r
         |  FROM deg CROSS JOIN sd),
         |${(1 to Iters).map(i => step(i, s"p${i - 1}")).mkString(",\n")}
         |SELECT node,
         |  CASE WHEN node % 2 = 0 THEN 'part' ELSE 'supplier' END AS kind,
         |  deg, CAST(r AS BIGINT) AS ppr_mass
         |FROM p$Iters WHERE r > 0
         |ORDER BY ppr_mass DESC, node LIMIT $TopK""".stripMargin
    },
    "q128_pagerank" -> {
      val step = (i: Int, prev: String) =>
        s"""s$i AS (
           |  SELECT e.dst, CAST(sum(r.r // r.deg) AS BIGINT) AS sc
           |  FROM $prev r JOIN edges e ON r.node = e.src GROUP BY 1),
           |r$i AS (
           |  SELECT d.node, d.deg,
           |    CAST((15 * $Base) // (100 * n)
           |      + (85 * coalesce(sc, 0)) // 100 AS BIGINT) AS r
           |  FROM deg d CROSS JOIN nn LEFT JOIN s$i ON d.node = s$i.dst)"""
          .stripMargin
      s"""WITH li AS (
         |  SELECT DISTINCT l_partkey*2 AS a, l_suppkey*2+1 AS b FROM lineitem),
         |edges AS (
         |  SELECT a AS src, b AS dst FROM li
         |  UNION ALL SELECT b, a FROM li),
         |deg AS (SELECT src AS node, count(*) AS deg FROM edges GROUP BY 1),
         |nn AS (SELECT count(*) AS n FROM deg),
         |r0 AS (SELECT node, deg, $Base // n AS r FROM deg CROSS JOIN nn),
         |${(1 to Iters).map(i => step(i, s"r${i - 1}")).mkString(",\n")}
         |SELECT node,
         |  CASE WHEN node % 2 = 0 THEN 'part' ELSE 'supplier' END AS kind,
         |  deg, CAST(r AS BIGINT) AS rank_mass
         |FROM r$Iters
         |ORDER BY rank_mass DESC, node LIMIT $TopK""".stripMargin
    }
  )
}
