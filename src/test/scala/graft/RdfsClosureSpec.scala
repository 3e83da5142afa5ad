package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.queries.KgQueries.ancestorClosure

/** Driver-side rdfs:subClassOf closure (kg_rdfs_closure's helper): must
  * match recursive-CTE semantics on the shapes the live query's fixed
  * hierarchy cannot exercise — multi-parent classes and cycles. */
class RdfsClosureSpec extends AnyFunSuite {

  test("chain: transitive ancestors in discovery order") {
    val h = Seq("a" -> "b", "b" -> "c", "c" -> "d")
    assert(ancestorClosure(h, "a") == Seq("b", "c", "d"))
    assert(ancestorClosure(h, "c") == Seq("d"))
    assert(ancestorClosure(h, "d") == Seq.empty)
    assert(ancestorClosure(h, "unknown") == Seq.empty)
  }

  test("multi-parent: every ancestor path survives (diamond)") {
    // a -> b, a -> c, b -> d, c -> d : closure of a is {b, c, d}, d once
    val h = Seq("a" -> "b", "a" -> "c", "b" -> "d", "c" -> "d")
    assert(ancestorClosure(h, "a").sorted == Seq("b", "c", "d"))
    // the second parent is NOT dropped (the toMap failure mode)
    val h2 = Seq("stream" -> "software", "stream" -> "artifact",
      "software" -> "thing", "artifact" -> "thing")
    assert(ancestorClosure(h2, "stream").sorted == Seq("artifact", "software", "thing"))
  }

  test("cycle: terminates with each class once (UNION-dedup analogue)") {
    val h = Seq("a" -> "b", "b" -> "a")
    assert(ancestorClosure(h, "a").sorted == Seq("a", "b"))
    val self = Seq("x" -> "x")
    assert(ancestorClosure(self, "x") == Seq("x"))
  }
}
