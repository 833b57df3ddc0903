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
