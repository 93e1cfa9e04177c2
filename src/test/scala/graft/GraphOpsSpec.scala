package graft

import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Relational}

/** recursiveFixpoint (WITH RECURSIVE semantics) + connectedComponents. */
class GraphOpsSpec extends SparkSpec {
  import spark.implicits._

  test("recursiveFixpoint UNION ALL: hierarchy walk terminates at leaves") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L)).toDF("src", "dst")
    val base = Seq((1L, 0), (10L, 0)).toDF("node", "depth")
    val out = Relational.recursiveFixpoint(
      base,
      f => f.join(edges, f("node") === edges("src"))
        .select(edges("dst").as("node"), (f("depth") + 1).as("depth")),
      maxIter = 10, distinctUnion = false)
      .as[(Long, Int)].collect().toSet
    assert(out === Set((1L, 0), (2L, 1), (3L, 2), (4L, 3), (10L, 0), (11L, 1)))
  }

  test("recursiveFixpoint UNION: cyclic graph reaches a fixpoint") {
    // 1 -> 2 -> 3 -> 1 cycle: UNION ALL would never terminate; the
    // distinct variant must converge to the reachable-node set.
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L)).toDF("src", "dst")
    val base = Seq(Tuple1(1L)).toDF("node")
    val out = Relational.recursiveFixpoint(
      base,
      f => f.join(edges, f("node") === edges("src"))
        .select(edges("dst").as("node")),
      maxIter = 10)
      .as[Long].collect().toSet
    assert(out === Set(1L, 2L, 3L))
  }

  test("recursiveFixpoint UNION ALL without natural termination throws") {
    val edges = Seq((1L, 2L), (2L, 1L)).toDF("src", "dst")
    val base = Seq(Tuple1(1L)).toDF("node")
    intercept[IllegalStateException] {
      Relational.recursiveFixpoint(
        base,
        f => f.join(edges, f("node") === edges("src"))
          .select(edges("dst").as("node")),
        maxIter = 5, distinctUnion = false)
    }
  }

  test("connectedComponents: chain, triangle, isolated pair") {
    // components: {1,2,3,4} (chain), {7,8,9} (triangle), {20,21}
    val pairs = Seq(
      (1L, 2L), (2L, 3L), (3L, 4L),
      (7L, 8L), (8L, 9L), (9L, 7L),
      (20L, 21L)).toDF("id1", "id2")
    val comp = Dedup.connectedComponents(pairs, "id1", "id2")
      .as[(Long, Long)].collect().toMap
    assert(comp === Map(
      1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      7L -> 7L, 8L -> 7L, 9L -> 7L,
      20L -> 20L, 21L -> 20L))
  }

  // r18 (r17 verdict #1): the edge list's one exchange is SIZE-AWARE —
  // toy graphs must not pay sessParts tasks of scheduler overhead per
  // fixpoint round, at-scale edge lists keep the full session width.
  test("connectedComponents: edge exchange width is size-aware") {
    assert(Dedup.edgeWidth(0L, 32) === 1)
    assert(Dedup.edgeWidth(520L, 32) === 1) // d07 at sf0.1
    assert(Dedup.edgeWidth(131072L * 3 + 5, 32) === 4)
    assert(Dedup.edgeWidth(Long.MaxValue / 4, 32) === 32) // cap
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("id1", "id2")
    val labels = Dedup.connectedComponents(pairs, "id1", "id2")
    assert(labels.rdd.getNumPartitions <= 2,
      "toy-graph fixpoint rounds must run at ~1-task width, not session width")
  }

  test("connectedComponents: long chain needs multiple rounds") {
    val pairs = (1L until 12L).map(i => (i, i + 1)).toDF("id1", "id2")
    val comp = Dedup.connectedComponents(pairs, "id1", "id2")
      .as[(Long, Long)].collect().toMap
    assert(comp.size === 12 && comp.values.forall(_ == 1L))
  }

  test("recursiveFixpoint: step returning columns in a different order is re-aligned") {
    val edges = Seq((1L, 2L), (2L, 3L)).toDF("src", "dst")
    val base = Seq((1L, 0)).toDF("node", "depth")
    def walk(reorder: Boolean) = Relational.recursiveFixpoint(
      base,
      f => {
        val s = f.join(edges, f("node") === edges("src"))
        if (reorder) s.select((f("depth") + 1).as("depth"), edges("dst").as("node"))
        else s.select(edges("dst").as("node"), (f("depth") + 1).as("depth"))
      },
      maxIter = 10, distinctUnion = true)
      .as[(Long, Int)].collect().toSet
    assert(walk(reorder = false) == Set((1L, 0), (2L, 1), (3L, 2)))
    assert(walk(reorder = true) == walk(reorder = false))
  }

  test("connectedComponents: random graphs match a brute-force union-find") {
    val rnd = new scala.util.Random(2024)
    for (trial <- 1 to 3) {
      val n = 40 + trial * 20
      val edges = Seq.fill(n)((rnd.nextInt(50).toLong, rnd.nextInt(50).toLong))
        .filter { case (a, b) => a != b }
      // driver-side union-find oracle
      val parent = scala.collection.mutable.Map[Long, Long]()
      def find(x: Long): Long = {
        val p = parent.getOrElseUpdate(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      edges.foreach { case (a, b) => val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb) }
      val want = parent.keys.map(x => x -> find(x)).toMap
      val got = Dedup.connectedComponents(
          edges.toDF("id1", "id2"), "id1", "id2")
        .as[(Long, Long)].collect().toMap
      assert(got === want, s"trial $trial (n=$n)")
    }
  }
}
