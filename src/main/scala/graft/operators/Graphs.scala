package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed graph primitives over edge lists (the near-dup pair
  * graph, co-occurrence graphs). Connected components live in
  * [[graft.pipeline.Dedup]] (label propagation + the large-star/
  * small-star fallback); this module adds the counting primitives.
  */
object Graphs {

  /** The symmetric degree-annotated edge frame all three graph
    * operators consume: both directions of every canonical pair,
    * with both endpoint degrees attached — `(src, dst, deg_src,
    * deg_dst)`. Triangles, PageRank and k-core each used to rebuild
    * this from the raw pair list (an edge union + a degree aggregate
    * + joins, ×3); computing it once and spooling it (the
    * [[graft.queries.Pipeline]] cluster-artifact precedent) makes
    * the family share one pass. Scale shape: one aggregate + two
    * hash equi-joins on vertex keys, all shuffle-partitioned by
    * vertex — the same partitioning every consumer joins on.
    */
  def degreeFrame(pairs: DataFrame): DataFrame = {
    val edges = pairs.select(col("id_a").as("src"), col("id_b").as("dst"))
      .unionAll(pairs.select(col("id_b").as("src"), col("id_a").as("dst")))
    val deg = edges.groupBy("src").agg(count(lit(1)).as("deg"))
    edges
      .join(deg.select(col("src"), col("deg").as("deg_src")), "src")
      .join(deg.select(col("src").as("dst"), col("deg").as("deg_dst")), "dst")
      .select(col("src"), col("dst"), col("deg_src"), col("deg_dst"))
  }

  /** Triangle enumeration by DEGREE-ORDERED orientation — the
    * node-iterator++ algorithm (Schank & Wagner 2005; the same
    * orientation powers every distributed triangle system since):
    * orient each undirected edge from its (degree, id)-smaller
    * endpoint to the larger, so the oriented graph is acyclic and
    * every triangle has exactly ONE source vertex; wedges are then
    * the self-join of out-edges on that source, and a wedge is a
    * triangle iff its two tips are themselves an oriented edge.
    *
    * Why the orientation matters at 100 TB: wedge volume is
    * Σ out-deg(v)², and the degree ordering caps every out-degree at
    * O(√m) — a star graph's hub (the adversarial case: deg n ⇒ n²
    * naive wedges) becomes a SINK with out-degree ~1, generating no
    * wedges at all. Both joins are plain hash equi-joins on vertex
    * keys; no vertex ever needs its full neighborhood in memory.
    *
    * Input: canonical undirected edges `(id_a < id_b)`, no
    * duplicates. Output: one row per triangle as the sorted id
    * triple `(a < b < c)`.
    */
  def triangles(pairs: DataFrame): DataFrame =
    trianglesFromDegrees(degreeFrame(pairs))

  /** [[triangles]] over a prebuilt [[degreeFrame]] — the canonical
    * direction of each edge carries both endpoint degrees, so the
    * orientation needs zero joins and zero aggregates of its own.
    */
  def trianglesFromDegrees(g: DataFrame): DataFrame = {
    val withDeg = g.filter(col("src") < col("dst")).select(
      col("src").as("u"), col("dst").as("v"),
      col("deg_src").as("du"), col("deg_dst").as("dv"))
    // total order (degree, id): src strictly precedes dst
    val srcFirst = col("du") < col("dv") || (col("du") === col("dv") && col("u") < col("v"))
    val oriented = withDeg.select(
      when(srcFirst, col("u")).otherwise(col("v")).as("src"),
      when(srcFirst, col("du")).otherwise(col("dv")).as("ds"),
      when(srcFirst, col("v")).otherwise(col("u")).as("dst"),
      when(srcFirst, col("dv")).otherwise(col("du")).as("dd"))
    // wedges at a common source, tips ordered by the SAME total order
    val wedges = oriented.as("e1")
      .join(oriented.as("e2"), col("e1.src") === col("e2.src")
        && (col("e1.dd") < col("e2.dd")
          || (col("e1.dd") === col("e2.dd") && col("e1.dst") < col("e2.dst"))))
      .select(col("e1.src").as("x"), col("e1.dst").as("y"), col("e2.dst").as("z"))
    // a wedge closes iff (y, z) is itself an oriented edge
    wedges
      .join(oriented.select(col("src").as("y"), col("dst").as("z")), Seq("y", "z"), "left_semi")
      .select(
        least(col("x"), col("y"), col("z")).as("a"),
        (col("x") + col("y") + col("z")
          - least(col("x"), col("y"), col("z"))
          - greatest(col("x"), col("y"), col("z"))).as("b"),
        greatest(col("x"), col("y"), col("z")).as("c"))
  }

  /** Iteration count and fixed-point denominator shared with the
    * generated oracle ([[graft.queries.Analytics]] interpolates both
    * into the unrolled CTE text) — one constant, so loop and oracle
    * cannot drift.
    */
  val PageRankIters = 5
  val PageRankScale = 1000000000000L

  /** k-core parameters shared with the generated oracle (the
    * [[PageRankIters]] device: one constant on both sides).
    */
  val KCoreK = 2
  val KCoreRounds = 4

  /** k-core peeling (Seidman 1983): repeatedly remove nodes whose
    * degree WITHIN THE SURVIVORS falls below `k`; what remains after
    * convergence is the k-core — the density skeleton of the
    * near-dup graph (template farms and mirror families are cores;
    * incidental chains peel away). `rounds` FIXED peel rounds, no
    * convergence test — the [[pageRank]] contract: a data pipeline
    * wants a deterministic artifact, and the oracle unrolls the same
    * rounds as generated CTE stages. Full-core users loop until the
    * drop count hits zero (the spec proves small graphs reach their
    * fixpoint inside [[KCoreRounds]]).
    *
    * Scale shape: per round ONE shuffle — the survivor-degree count,
    * a dst-semi-filtered edge aggregate with map-side combine; the
    * symmetric edge frame is persisted once across rounds and the
    * survivor set only ever shrinks. Peeling is the textbook
    * distributed formulation (each round is a join-aggregate, no
    * vertex ever needs its neighborhood in memory).
    *
    * Input: canonical undirected pairs `(id_a < id_b)`. Output: one
    * row per node — `(doc_id, deg, dropped_round, in_core)` with
    * `dropped_round` = the 1-based round that removed the node, 0 if
    * it survived all `rounds`.
    */
  def kCore(pairs: DataFrame, k: Int = KCoreK, rounds: Int = KCoreRounds): DataFrame =
    kCoreFromDegrees(degreeFrame(pairs), k, rounds)

  /** [[kCore]] over a prebuilt [[degreeFrame]] (degrees read off the
    * artifact instead of recomputed from the pair list).
    */
  def kCoreFromDegrees(g: DataFrame, k: Int = KCoreK, rounds: Int = KCoreRounds): DataFrame = {
    require(k >= 1 && rounds >= 1 && rounds <= 50,
      s"need k >= 1 and rounds in [1, 50], got k=$k rounds=$rounds")
    val edges = g.select(col("src"), col("dst")).persist()
    // each round's survivor set feeds THREE consumers (the degree
    // count, the fell anti-join, the next round). r20 persist()ed per
    // round, which stops re-EXECUTION but not re-PLANNING: the
    // analyzed tree still deepens every round, so Catalyst + codegen
    // re-chew an exponentially duplicated lineage inside the one final
    // job (measured: 10–97 s of CPU at sf0.1 on a TINY graph, wall
    // 3.4–30 s across identical-code runs). The house pattern for
    // iterative frames (alternatingStarRounds) is a per-round
    // checkpoint: each survivor set becomes a flat scan, plans stay
    // constant-depth, and each round is one small job. Survivor sets
    // only shrink, so the per-round write is bounded by the node set.
    try {
      val deg = g.groupBy("src").agg(max(col("deg_src")).as("deg"))
      var alive = graft.engine.Scratch.checkpoint(
        deg.select(col("src").as("id")), "kcore-alive0")
      var dropped = alive.limit(0).select(col("id"), lit(0L).as("dropped_round"))
      for (r <- 1 to rounds) {
        // survivor-degree: count only edges whose BOTH endpoints are
        // alive (dst via this semi join, src because the count is
        // then intersected with the alive set itself)
        val cnt = edges
          .join(alive.select(col("id").as("dst")), Seq("dst"), "left_semi")
          .groupBy("src").agg(count(lit(1)).as("c"))
        val keep = cnt.filter(col("c") >= k).select(col("src").as("id"))
        val next = graft.engine.Scratch.checkpoint(
          alive.join(keep, Seq("id"), "left_semi"), s"kcore-alive$r")
        val fell = alive.join(next, Seq("id"), "left_anti")
          .select(col("id"), lit(r.toLong).as("dropped_round"))
        dropped = dropped.unionAll(fell)
        alive = next
      }
      val out = deg
        .join(dropped, deg("src") === dropped("id"), "left")
        .select(deg("src").as("doc_id"), col("deg"),
          coalesce(col("dropped_round"), lit(0L)).as("dropped_round"),
          col("dropped_round").isNull.as("in_core"))
      graft.engine.Scratch.checkpoint(out, "kcore")
    } finally {
      edges.unpersist(blocking = true)
      ()
    }
  }

  /** Fixed-point PageRank (Page et al. 1999) over the undirected
    * pair graph, in EXACT integer arithmetic: ranks live in
    * `scale`-denominated units (default 10¹² "picorank"), every
    * division is a floor DIV, and the damping step is `(85·Σ) DIV
    * 100` — so the iteration replays digit-for-digit on any engine
    * (the repo's no-libm contract; floor division leaks a little
    * rank mass per step, which is fine — the ORDERING is the
    * product, and it is exact). `iters` fixed rounds, no convergence
    * test: a data pipeline wants a deterministic artifact, not an
    * adaptive one.
    *
    * Scale shape: per iteration ONE shuffle — the contribution
    * aggregate keyed on `dst` (map-side combining); the edge×rank
    * join stays on the edge partitioning, and the `(src, dst, deg)`
    * frame is computed once and persisted across rounds. In a
    * symmetric graph every node has in-degree ≥ 1, so the dst-keyed
    * aggregate covers every node — no dangling-mass pass needed.
    * The one driver scalar is the node count (the `mixDrift` /
    * `annCells` precedent).
    *
    * Use: centrality-ranked survivor election inside near-dup
    * families — the most-central member of a template cluster is the
    * canonical copy; degree ties break by what the neighborhood
    * links to, which plain degree can't see.
    *
    * Input: canonical undirected pairs `(id_a < id_b)`. Output:
    * one row per node — `(doc_id, deg, pr)` with `pr` in scale
    * units.
    */
  def pageRank(pairs: DataFrame, iters: Int = PageRankIters,
      scale: Long = PageRankScale): DataFrame =
    pageRankFromDegrees(degreeFrame(pairs), iters, scale)

  /** [[pageRank]] over a prebuilt [[degreeFrame]] — the artifact
    * already carries `deg_src`, so the per-run edge×degree join
    * disappears entirely.
    */
  def pageRankFromDegrees(g: DataFrame, iters: Int = PageRankIters,
      scale: Long = PageRankScale): DataFrame = {
    require(iters >= 1 && iters <= 50, s"iters must be in [1, 50], got $iters")
    // deg feeds the rank init AND the final join — persist it
    // alongside ed or the artifact scan replays three times
    val deg = g.groupBy("src").agg(max(col("deg_src")).as("deg")).persist()
    val ed = g.select(col("src"), col("dst"), col("deg_src").as("deg")).persist()
    try {
      val n = deg.count()
      if (n == 0)
        return deg.select(col("src").as("doc_id"), col("deg"), col("deg").as("pr"))
      val r0 = scale / n
      val tele = 15L * r0 / 100L
      var ranks = deg.select(col("src").as("id"), lit(r0).as("pr"))
      for (_ <- 1 to iters)
        ranks = ed.join(ranks, ed("src") === ranks("id"))
          .select(col("dst"), expr("pr DIV deg").as("c"))
          .groupBy(col("dst"))
          .agg((lit(tele) + expr("(85 * sum(c)) DIV 100")).as("pr"))
          .select(col("dst").as("id"), col("pr"))
      val out = deg.join(ranks, deg("src") === ranks("id"))
        .select(col("src").as("doc_id"), col("deg"), col("pr"))
      graft.engine.Scratch.checkpoint(out, "pagerank")
    } finally {
      ed.unpersist(blocking = true)
      deg.unpersist(blocking = true)
      ()
    }
  }
}
