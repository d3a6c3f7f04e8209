package graft.operators

import graft.SparkSpec

class GraphsSpec extends SparkSpec {
  import spark.implicits._

  private def edges(es: (Long, Long)*) = es.toSeq.toDF("id_a", "id_b")

  private def bruteTriangles(es: Seq[(Long, Long)]): Set[(Long, Long, Long)] = {
    val set = es.toSet
    def has(x: Long, y: Long) = set.contains((math.min(x, y), math.max(x, y)))
    val nodes = es.flatMap(e => Seq(e._1, e._2)).distinct.sorted
    (for {
      a <- nodes; b <- nodes if a < b && has(a, b)
      c <- nodes if b < c && has(a, c) && has(b, c)
    } yield (a, b, c)).toSet
  }

  private def got(es: (Long, Long)*): Set[(Long, Long, Long)] =
    Graphs.triangles(edges(es: _*)).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

  test("triangles: K4 has four, sorted triples, each exactly once") {
    val k4 = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L))
    val t = Graphs.triangles(edges(k4: _*)).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(t.length === 4) // no double counting
    assert(t.toSet === bruteTriangles(k4))
  }

  test("triangles: a star graph has none — the hub orientation generates no wedges") {
    val star = (2L to 40L).map(i => (1L, i))
    assert(got(star: _*) === Set.empty)
  }

  test("triangles match brute force on a random graph") {
    val rnd = new scala.util.Random(42)
    val es = (for {
      a <- 1L to 25L; b <- (a + 1) to 25L if rnd.nextDouble() < 0.25
    } yield (a, b)).toSeq
    assert(got(es: _*) === bruteTriangles(es))
    assert(bruteTriangles(es).nonEmpty) // the case is non-trivial
  }

  test("triangles: disconnected cliques count independently") {
    val twoTriangles = Seq((1L, 2L), (1L, 3L), (2L, 3L), (10L, 11L), (10L, 12L), (11L, 12L))
    assert(got(twoTriangles: _*) === Set((1L, 2L, 3L), (10L, 11L, 12L)))
  }

  /** Driver-side replay of the exact integer recurrence — the same
    * floor-division arithmetic the operator defines.
    */
  private def brutePageRank(es: Seq[(Long, Long)], iters: Int,
      scale: Long): Map[Long, (Long, Long)] = {
    val dir = es.flatMap { case (a, b) => Seq(a -> b, b -> a) }
    val deg = dir.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val n = deg.size
    val r0 = scale / n
    val tele = 15L * r0 / 100L
    var r = deg.keys.map(_ -> r0).toMap
    for (_ <- 1 to iters) {
      val in = dir.groupBy(_._2).view
        .mapValues(_.map { case (src, _) => r(src) / deg(src) }.sum).toMap
      r = deg.keys.map(k => k -> (tele + 85L * in(k) / 100L)).toMap
    }
    deg.keys.map(k => k -> ((deg(k), r(k)))).toMap
  }

  test("pageRank matches the integer recurrence replay; hubs outrank leaves") {
    // star (1 center, 3 leaves) + a separate chain 5-6-7
    val es = Seq((1L, 2L), (1L, 3L), (1L, 4L), (5L, 6L), (6L, 7L))
    val out = Graphs.pageRank(edges(es: _*)).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(out === brutePageRank(es, 5, 1000000000000L))
    // structure: the star center dominates its leaves, the chain middle its ends
    assert(out(1L)._2 > out(2L)._2)
    assert(out(6L)._2 > out(5L)._2)
    // symmetric positions tie exactly
    assert(out(2L) === out(3L) && out(3L) === out(4L))
    assert(out(5L) === out(7L))
    // floor division only leaks mass downward: total never exceeds scale
    assert(out.values.map(_._2).sum <= 1000000000000L)
    // a second evaluation is identical (determinism)
    val again = Graphs.pageRank(edges(es: _*)).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(again === out)
    intercept[IllegalArgumentException](Graphs.pageRank(edges(es: _*), iters = 0))
  }

  private def bruteKCore(es: Seq[(Long, Long)], k: Int, rounds: Int)
      : Map[Long, (Long, Long, Boolean)] = {
    val nodes = es.flatMap(e => Seq(e._1, e._2)).distinct
    val deg0 = nodes.map(n => n -> es.count(e => e._1 == n || e._2 == n).toLong).toMap
    var alive = nodes.toSet
    var droppedAt = Map.empty[Long, Long]
    for (r <- 1 to rounds) {
      val fell = alive.filter(n =>
        es.count(e => (e._1 == n && alive(e._2)) || (e._2 == n && alive(e._1))) < k)
      droppedAt ++= fell.map(_ -> r.toLong)
      alive --= fell
    }
    nodes.map(n => n -> ((deg0(n), droppedAt.getOrElse(n, 0L), alive(n)))).toMap
  }

  test("kCore: clique survives, pendant chain peels inward one round per hop") {
    // triangle 1-2-3 (2-core) with a pendant chain 3-4-5-6 that peels
    // from the free end: 6 falls round 1, then 5, then 4; 3 stays (clique)
    val es = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 6L))
    val out = Graphs.kCore(edges(es: _*)).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getBoolean(3)))).toMap
    assert(out === bruteKCore(es, 2, 4))
    assert(out(6L)._2 === 1L && out(5L)._2 === 2L && out(4L)._2 === 3L)
    assert(Seq(1L, 2L, 3L).forall(out(_)._3))
    // the fixpoint was reached inside the fixed rounds: re-peeling the
    // survivors drops nobody (every core member keeps >= k core neighbors)
    val core = out.filter(_._2._3).keySet
    assert(core.forall(n =>
      es.count(e => (e._1 == n && core(e._2)) || (e._2 == n && core(e._1))) >= 2))
  }

  test("kCore matches brute-force peeling on random graphs") {
    val rnd = new scala.util.Random(77)
    for (_ <- 1 to 5) {
      val n = 14
      val es = (for {
        a <- 0L until n; b <- (a + 1) until n
        if rnd.nextDouble() < 0.18
      } yield (a, b)).toSeq
      if (es.nonEmpty) {
        val out = Graphs.kCore(edges(es: _*)).collect()
          .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getBoolean(3)))).toMap
        assert(out === bruteKCore(es, 2, 4))
      }
    }
  }

  test("degreeFrame carries both directions with both endpoint degrees; " +
      "a spooled frame reproduces all three operators exactly") {
    val es = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 4L))
    val g = Graphs.degreeFrame(edges(es: _*))
    val rows = g.collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(rows === Set(
      (1L, 2L, 2L, 2L), (2L, 1L, 2L, 2L),
      (1L, 3L, 2L, 3L), (3L, 1L, 3L, 2L),
      (2L, 3L, 2L, 3L), (3L, 2L, 3L, 2L),
      (3L, 4L, 3L, 1L), (4L, 3L, 1L, 3L)))
    // the compute-once artifact path: write/re-read the frame, then
    // every FromDegrees operator must equal its pair-based form
    val t = java.nio.file.Files.createTempDirectory("graft-test-graphart")
    g.write.mode("overwrite").parquet(t.toString + "/g")
    val spooled = spark.read.parquet(t.toString + "/g")
    assert(Graphs.trianglesFromDegrees(spooled).collect().toSet
      === Graphs.triangles(edges(es: _*)).collect().toSet)
    assert(Graphs.pageRankFromDegrees(spooled).collect().map(_.toSeq).toSet
      === Graphs.pageRank(edges(es: _*)).collect().map(_.toSeq).toSet)
    assert(Graphs.kCoreFromDegrees(spooled).collect().map(_.toSeq).toSet
      === Graphs.kCore(edges(es: _*)).collect().map(_.toSeq).toSet)
  }
}
