package graft

import org.scalacheck.Gen

import graft.operators.{AsOf, Graph}

class GraphSpec extends SparkSpec {
  import spark.implicits._

  private def forAll[A](gen: Gen[A], n: Int = 30)(check: A => Unit): Unit =
    Iterator.continually(gen.sample).flatten.take(n).foreach(check)

  test("local and distributed connected components agree on random graphs") {
    val genEdges = for {
      n <- Gen.chooseNum(2, 40)
      m <- Gen.chooseNum(1, 60)
      es <- Gen.listOfN(m, Gen.zip(Gen.chooseNum(0L, n.toLong), Gen.chooseNum(0L, n.toLong)))
    } yield es.filter { case (a, b) => a != b }
    forAll(genEdges, n = 10) { es =>
      if (es.nonEmpty) {
        val df = es.toDF("src", "dst")
        val local = Graph.connectedComponents(df) // small → union-find
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        val dist = Graph.connectedComponents(df, smallGraphEdges = 0) // force distributed
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        assert(local == dist, s"edges=$es")
      }
    }
  }

  test("CC branch probe is bounded by the threshold — no full pre-count of the edge set") {
    // a "tripwire" edge source: each partition serves rows normally up
    // to 500 pulls, then explodes. The bounded probe (limit threshold+1)
    // pulls ≤ 101 rows per partition and must survive; anything doing a
    // full count would detonate — which the sanity check proves.
    val bomb = spark.sparkContext
      .parallelize(0 until 2, 2)
      .mapPartitions { _ =>
        new Iterator[Long] {
          private var i = 0L
          def hasNext: Boolean = i < 10000
          def next(): Long = {
            i += 1
            if (i > 500) throw new IllegalStateException("probe scanned past its bound")
            i
          }
        }
      }
      .toDF("src").withColumn("dst", $"src" + 1)
    assert(Graph.edgeCountExceeds(bomb, 100), "2×500-capped source exceeds 100")
    intercept[org.apache.spark.SparkException](bomb.count()) // tripwire armed
    // and the distributed path engages off the bounded probe alone
    // (star graph: diameter 2, converges well inside maxIters)
    val edges = (1L to 50L).map(i => (0L, i)).toDF("src", "dst")
    val viaDistributed = Graph.connectedComponents(edges, smallGraphEdges = 10)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viaDistributed.values.toSet == Set(0L), "one star, one component")
  }

  // Spark round() on doubles = BigDecimal.valueOf (Double.toString)
  // HALF_UP — the local references must quantize identically
  private def grains(x: Double): Long =
    BigDecimal.valueOf(x).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong

  test("pageRank is bit-identical under repartitioning and matches a local reference") {
    import graft.operators.Graph
    // small fixed digraph, symmetrized
    val raw = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 4L), (4L, 1L), (2L, 4L))
    val sym = (raw ++ raw.map(_.swap)).distinct
    val edges = sym.toDF("src", "dst")
    val got = Graph.pageRank(edges, iters = 3).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val gotShuffled = Graph.pageRank(edges.repartition(7), iters = 3).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got == gotShuffled,
      "integer-grain contribution sums must make ranks partition-invariant, bit-exact")
    // local reference replaying the quantized recurrence
    val nodes = sym.flatMap(e => Seq(e._1, e._2)).distinct.sorted
    val n = nodes.size
    val out = sym.groupBy(_._1).map { case (s, es) => s -> es.size }
    var r = nodes.map(_ -> 1.0 / n).toMap
    for (_ <- 1 to 3) {
      val s = sym.groupBy(_._2).map { case (d, es) =>
        d -> es.map(_._1).map(src => grains(r(src) / out(src) * 1e15)).sum
      }
      r = nodes.map(v => v -> (0.15 / n + 0.85 * (s.getOrElse(v, 0L).toDouble / 1e15))).toMap
    }
    assert(got == r, s"got=$got want=$r")
  }

  test("pageRank skew: celebrity in-degree node, partition-invariant, quantized reference") {
    import org.apache.spark.sql.functions.col
    // star: 200 sources hit node 0 (in-degree 200 vs 1 everywhere
    // else) — the shape whose per-dst sum order varies most across
    // partitionings; integer grains make every order give one answer
    val hub = (1L to 200L).map(s => (s, 0L))
    val sym = (hub :+ ((0L, 1L))).distinct
    val edges = sym.toDF("src", "dst")
    def run(df: org.apache.spark.sql.DataFrame) =
      Graph.pageRank(df, iters = 2).collect()
        .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val got = run(edges)
    for (e <- Seq(edges.repartition(1), edges.repartition(13, col("dst")),
                  edges.repartition(31, col("src"))))
      assert(run(e) == got, "quantized sums must be partition-invariant, bit-exact")
    // local reference: grain-quantized contributions, any sum order
    val nodes = sym.flatMap(e => Seq(e._1, e._2)).distinct.sorted
    val n = nodes.size
    val out = sym.groupBy(_._1).map { case (s, es) => s -> es.size }
    var r = nodes.map(_ -> 1.0 / n).toMap
    for (_ <- 1 to 2) {
      val s = sym.groupBy(_._2).map { case (d, es) =>
        d -> es.map(_._1).map(src => grains(r(src) / out(src) * 1e15)).sum
      }
      r = nodes.map(v => v -> (0.15 / n + 0.85 * (s.getOrElse(v, 0L).toDouble / 1e15))).toMap
    }
    assert(got == r, "must replay the documented integer-grain recurrence bit-exactly")
  }

  test("personalizedPageRank fails fast on an empty or graph-disjoint seed set") {
    import graft.operators.Graph
    val raw = Seq((1L, 2L), (2L, 3L), (3L, 1L))
    val edges = (raw ++ raw.map(_.swap)).toDF("src", "dst")
    // empty seeds: would otherwise put scnt = 0 under every teleport
    // division and silently rank everything NaN/Infinity
    val empty = Seq.empty[Long].toDF("id")
    val e1 = intercept[IllegalArgumentException] {
      Graph.personalizedPageRank(edges, empty, iters = 1).collect()
    }
    assert(e1.getMessage.contains("seed set is empty"), e1.getMessage)
    // seeds disjoint from the graph's node set are the same failure
    val disjoint = Seq(99L, 100L).toDF("id")
    val e2 = intercept[IllegalArgumentException] {
      Graph.personalizedPageRank(edges, disjoint, iters = 1).collect()
    }
    assert(e2.getMessage.contains("seed set is empty"), e2.getMessage)
    // sanity: a valid seed still ranks
    val ok = Graph.personalizedPageRank(edges, Seq(1L).toDF("id"), iters = 1)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(ok.values.forall(v => !v.isNaN && !v.isInfinite) && ok(1L) > 0)
  }

  test("as-of join agrees with a naive per-row reference on random series") {
    val genCase = for {
      keys <- Gen.chooseNum(1, 4)
      nl <- Gen.chooseNum(1, 25)
      nr <- Gen.chooseNum(0, 25)
      left <- Gen.listOfN(nl, Gen.zip(Gen.chooseNum(1L, keys.toLong), Gen.chooseNum(0L, 1000L)))
      right <- Gen.listOfN(nr, Gen.zip(Gen.chooseNum(1L, keys.toLong), Gen.chooseNum(0L, 1000L)))
    } yield (left.distinct, right.distinct)
    forAll(genCase, n = 15) { case (left, right) =>
      val l = left.zipWithIndex
        .map { case ((k, t), i) => (k, new java.sql.Timestamp(t * 1000), i.toLong) }
        .toDF("key", "lts", "row_id")
      val r = right
        .map { case (k, t) => (k, new java.sql.Timestamp(t * 1000), s"p$k-$t") }
        .toDF("key", "rts", "payload")
      val got = AsOf.joinBackward(l, r, Seq("key"), "lts", "rts")
        .collect()
        .map(x => (x.getLong(0), x.getTimestamp(1), Option(x.getString(4))))
        .toSet
      val want = left.zipWithIndex.map { case ((k, t), _) =>
        val best = right.filter(p => p._1 == k && p._2 <= t).sortBy(_._2).lastOption
        (k, new java.sql.Timestamp(t * 1000), best.map(p => s"p${p._1}-${p._2}"))
      }.toSet
      assert(got == want, s"left=$left right=$right")
    }
  }
}
