package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Link-graph operators: degree profiles and the deterministic
  * fixed-point PageRank (exact-integer update rule — the library-wide
  * bit-reproducibility discipline). */
class GraphSpec extends SparkSpec {
  import spark.implicits._

  // a -> b (x2, parallel), a -> c, b -> c; d is isolated-but-linked: c -> d
  private def edges = Seq(
    (1L, 2L, 3L), (1L, 2L, 1L), (1L, 3L, 2L), (2L, 3L, 4L), (3L, 4L, 5L))
    .toDF("src", "dst", "w")

  test("degrees: parallel edges count individually, weights sum, missing sides zero") {
    val d = Graph.degrees(edges, "src", "dst", Some("w"))
      .orderBy("node").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(d === Array(
      (1L, 3L, 0L, 6L, 0L),  // three out-edges (parallel pair counts twice)
      (2L, 1L, 2L, 4L, 4L),
      (3L, 1L, 2L, 5L, 6L),
      (4L, 0L, 1L, 0L, 5L)))
  }

  test("pageRank: mass bounded by scale, dangling node holds base + dshare") {
    val scale = 1L << 20
    val r = Graph.pageRank(edges, "src", "dst", iters = 4, Some("w"),
      scale = scale)
    val rows = r.orderBy("node").collect()
    val total = rows.map(_.getLong(1)).sum
    assert(total <= scale, s"floor division only leaks mass: $total")
    // node 4 is the only dangling node and the only sink past 3 — it
    // must out-rank node 1 (pure source: teleport share only)
    val byNode = rows.map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(byNode(4L) > byNode(1L))
    // the float rank is exactly rank_fp / scale (power-of-two division)
    rows.foreach { x =>
      assert(x.getDouble(2) === x.getLong(1).toDouble / scale.toDouble)
    }
  }

  test("pageRank is bit-identical across input partitionings") {
    val a = Graph.pageRank(edges.repartition(7), "src", "dst", 3, Some("w"))
      .orderBy("node").collect().map(r => (r.getLong(0), r.getLong(1)))
    val b = Graph.pageRank(edges.coalesce(1), "src", "dst", 3, Some("w"))
      .orderBy("node").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(a.sameElements(b))
  }

  test("pageRank: parallel edges collapse by weight sum (pre-collapsed input is identical)") {
    val collapsed = edges.groupBy("src", "dst")
      .agg(sum(col("w")).as("w"))
    val a = Graph.pageRank(edges, "src", "dst", 3, Some("w"))
      .orderBy("node").collect().map(r => (r.getLong(0), r.getLong(1)))
    val b = Graph.pageRank(collapsed, "src", "dst", 3, Some("w"))
      .orderBy("node").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(a.sameElements(b))
  }

  test("pageRank guards: negative weights, too-small scale, bad damping all fail fast") {
    intercept[Exception] {
      Graph.pageRank(Seq((1L, 2L, -1L)).toDF("src", "dst", "w"),
        "src", "dst", 1, Some("w")).collect()
    }
    // n > scale would floor initR to 0 and silently zero every rank
    val e = intercept[IllegalArgumentException] {
      Graph.pageRank(edges, "src", "dst", 1, Some("w"), scale = 2L)
    }
    assert(e.getMessage.contains("exceeds fixed-point scale"))
    intercept[IllegalArgumentException] {
      Graph.pageRank(edges, "src", "dst", 1, Some("w"),
        dampNum = 101L, dampDen = 100L)
    }
  }

  test("authorityGate keeps rows whose key out-ranks the uniform prior") {
    val ranks = Graph.pageRank(edges, "src", "dst", 4, Some("w"))
    val n = ranks.count()
    val minFp = (1L << 30) / n
    val docs = Seq((2L, "kept?"), (1L, "source"), (4L, "sink"))
      .toDF("host", "text")
    val kept = Graph.authorityGate(docs, "host", ranks, minFp)
      .select("host").collect().map(_.getLong(0)).toSet
    // sinks accumulate rank above the prior; the pure source does not
    assert(kept.contains(4L) && !kept.contains(1L))
  }
}
