package graft.operators

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** Connected components vs an independent in-memory union-find. */
class ComponentsSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private def cc(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    import spark.implicits._
    Components.connectedComponents(edges.toDF("a", "b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  /** Reference union-find with min-id canonicalization. */
  private def unionFind(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    parent.keys.map(v => v -> find(v)).toMap
  }

  test("chain, clique, and singleton-free graph match union-find") {
    // chain 1-2-3-4-5, clique {10,11,12}, isolated pair (20,21)
    val edges = Seq[(Long, Long)](
      (1, 2), (2, 3), (3, 4), (4, 5),
      (10, 11), (11, 12), (10, 12),
      (20, 21))
    assert(cc(edges) === unionFind(edges))
  }

  test("long path converges within the round cap (pointer jumping)") {
    // a 64-vertex path needs O(log n) rounds with jumping; naive
    // propagation would need 63 and trip the default cap of 25
    val edges = (0L until 63L).map(i => (i, i + 1))
    val got = cc(edges)
    assert(got.values.toSet === Set(0L))
    assert(got.size === 64)
  }

  test("edge direction and duplicates do not matter") {
    val e1 = Seq[(Long, Long)]((1, 2), (3, 2), (3, 4))
    val e2 = Seq[(Long, Long)]((2, 1), (2, 3), (4, 3), (1, 2), (3, 4))
    assert(cc(e1) === cc(e2))
  }

  test("random graphs match union-find (property)") {
    val rnd = new scala.util.Random(42)
    (1 to 5).foreach { _ =>
      val n = 40
      val edges = Seq.fill(30)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter { case (a, b) => a != b }
      assert(cc(edges) === unionFind(edges))
    }
  }

  test("keepCanonical: min-id survives, singletons kept, sizes exact") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a"), (2L, "b"), (3L, "c"), (4L, "d"), (5L, "e"), (9L, "z"))
      .toDF("doc_id", "body")
    // pairs 2-3 and 3-5 chain into one cluster {2,3,5}; 1,4,9 singletons
    val pairs = Seq((2L, 3L), (3L, 5L)).toDF("d1", "d2")
    val kept = Components.keepCanonical(docs, "doc_id", pairs)
      .select("doc_id", "body", "cluster_size")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .sortBy(_._1)
    assert(kept.toSeq === Seq(
      (1L, "a", 1L), (2L, "b", 3L), (4L, "d", 1L), (9L, "z", 1L)))
  }
}
