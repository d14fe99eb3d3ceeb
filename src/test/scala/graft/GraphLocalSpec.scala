package graft

import graft.ops.GraphLocal
import org.scalatest.funsuite.AnyFunSuite

/** Value-level pins for the single-task graph algorithms behind
  * q_graph_betweenness / q_graph_eccentricity / q_graph_bridges —
  * handcrafted graphs with known answers (the oracle for those ops
  * anchors censuses and invariants; the true numbers live here). */
class GraphLocalSpec extends AnyFunSuite {

  private def path(n: Int): Seq[(Long, Long)] =
    (1 until n).map(i => (i.toLong, (i + 1).toLong))

  test("betweenness: path graph interior nodes") {
    // path 1-2-3-4-5: bc(k) = (k-1)(n-k) pairs routed through k
    val bc = GraphLocal.betweenness(path(5))
    assert(math.abs(bc(1L)) < 1e-12 && math.abs(bc(5L)) < 1e-12)
    assert(math.abs(bc(2L) - 3.0) < 1e-12) // (1)(3)
    assert(math.abs(bc(3L) - 4.0) < 1e-12) // (2)(2)
    assert(math.abs(bc(4L) - 3.0) < 1e-12)
  }

  test("betweenness: star center carries all pairs") {
    val star = Seq((10L, 1L), (10L, 2L), (10L, 3L), (10L, 4L))
    val bc = GraphLocal.betweenness(star)
    assert(math.abs(bc(10L) - 6.0) < 1e-12) // C(4,2)
    Seq(1L, 2L, 3L, 4L).foreach(l => assert(math.abs(bc(l)) < 1e-12))
  }

  test("betweenness: cycle splits shortest paths evenly") {
    // C4: opposite corners have two equal shortest paths — each
    // midpoint gets 1/2 from the one pair it can mediate
    val c4 = Seq((1L, 2L), (2L, 3L), (3L, 4L), (1L, 4L))
    val bc = GraphLocal.betweenness(c4)
    c4.flatMap(e => Seq(e._1, e._2)).distinct.foreach { v =>
      assert(math.abs(bc(v) - 0.5) < 1e-12, s"node $v: ${bc(v)}")
    }
  }

  test("eccentricity: path endpoints vs center, component label") {
    val ecc = GraphLocal.eccentricity(path(5)).map(t => t._1 -> t).toMap
    assert(ecc(1L)._3 == 4 && ecc(5L)._3 == 4)
    assert(ecc(3L)._3 == 2)
    assert(ecc.values.forall(_._2 == 1L)) // one component, min label
  }

  test("eccentricity: two components labeled independently") {
    val g = path(3) ++ Seq((10L, 11L))
    val ecc = GraphLocal.eccentricity(g).map(t => t._1 -> t).toMap
    assert(ecc(10L)._2 == 10L && ecc(11L)._2 == 10L)
    assert(ecc(10L)._3 == 1)
    assert(ecc(1L)._2 == 1L && ecc(1L)._3 == 2)
  }

  test("bridges/articulation: path is all bridges, interior artic") {
    val (b, a) = GraphLocal.bridgesAndArticulation(path(4))
    assert(b == Set((1L, 2L), (2L, 3L), (3L, 4L)))
    assert(a == Set(2L, 3L))
  }

  test("bridges/articulation: cycle has none") {
    val c4 = Seq((1L, 2L), (2L, 3L), (3L, 4L), (1L, 4L))
    val (b, a) = GraphLocal.bridgesAndArticulation(c4)
    assert(b.isEmpty && a.isEmpty)
  }

  test("bridges/articulation: barbell — the connecting edge and its " +
      "endpoints") {
    // triangle 1-2-3 + edge 3-4 + triangle 4-5-6
    val g = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L),
      (4L, 5L), (5L, 6L), (4L, 6L))
    val (b, a) = GraphLocal.bridgesAndArticulation(g)
    assert(b == Set((3L, 4L)))
    assert(a == Set(3L, 4L))
  }

  test("bridges/articulation: star center is the only articulation") {
    val star = Seq((10L, 1L), (10L, 2L), (10L, 3L))
    val (b, a) = GraphLocal.bridgesAndArticulation(star)
    assert(b == star.map(e => (e._2 min e._1, e._2 max e._1)).toSet)
    assert(a == Set(10L))
  }

  test("components: labels are component minima") {
    val g = path(3) ++ Seq((10L, 11L), (11L, 12L))
    val c = GraphLocal.components(g)
    assert(c(1L) == 1L && c(2L) == 1L && c(3L) == 1L)
    assert(c(10L) == 10L && c(12L) == 10L)
  }
}
