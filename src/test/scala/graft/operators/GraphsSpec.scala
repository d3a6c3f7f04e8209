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
}
