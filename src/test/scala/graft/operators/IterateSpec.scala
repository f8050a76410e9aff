package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** [[GraphOps.iterate]] — the named `DataStream#iterate` equivalent:
  * fixpoint loops terminate on the convergence predicate, fixed-round
  * loops count via maxRounds, and hitting the guard with
  * requireConvergence set is an explicit error.
  */
class IterateSpec extends SparkSpec {

  test("fixpoint: halving converges, rounds bounded by the contraction depth") {
    import spark.implicits._
    var steps = 0
    val init = Seq(8L, 5L, 1L).toDF("x")
    val out = GraphOps.iterate(init, maxRounds = 10,
        requireConvergence = true) { (cur, _) =>
      steps += 1
      cur.select(greatest(col("x") / 2, lit(1L)).cast("long").as("x"),
        col("x").as("prev"))
    } { (_, next) => next.filter(col("x") < col("prev")).count() == 0 }
    assert(out.select("x").collect().map(_.getLong(0)).toSeq == Seq(1L, 1L, 1L))
    // 8→4→2→1 plus the confirming round
    assert(steps == 4, s"took $steps rounds")
  }

  test("fixed-round mode: step runs exactly maxRounds times") {
    import spark.implicits._
    var steps = 0
    val out = GraphOps.iterate(Seq(0L).toDF("x"), maxRounds = 4) { (cur, _) =>
      steps += 1
      cur.select((col("x") + 1).as("x"))
    } { (_, _) => false }
    assert(out.collect().head.getLong(0) == 4L)
    assert(steps == 4)
  }

  test("requireConvergence: hitting the round guard is an explicit error") {
    import spark.implicits._
    val e = intercept[IllegalStateException] {
      GraphOps.iterate(Seq(0L).toDF("x"), maxRounds = 3,
          requireConvergence = true) { (cur, _) =>
        cur.select((col("x") + 1).as("x"))
      } { (_, _) => false }
    }
    assert(e.getMessage.contains("did not converge"))
  }

  test("round index is passed through to step") {
    import spark.implicits._
    val seen = scala.collection.mutable.ArrayBuffer.empty[Int]
    GraphOps.iterate(Seq(0L).toDF("x"), maxRounds = 3) { (cur, i) =>
      seen += i; cur
    } { (_, _) => false }
    assert(seen.toSeq == Seq(0, 1, 2))
  }

  test("label propagation: two cliques joined by a bridge keep their labels") {
    import spark.implicits._
    // K3 {a,b,c} — bridge c–d — K3 {d,e,f}: within each triangle the
    // majority neighbor label wins, so communities converge to the
    // lexical minimum of each clique, undisturbed by the single bridge
    val edges = Seq(
      ("a", "b"), ("b", "c"), ("a", "c"),
      ("c", "d"),
      ("d", "e"), ("e", "f"), ("d", "f")).toDF("src", "dst")
    val got = GraphOps.labelPropagation(edges, iters = 3)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(got("a") == "a" && got("b") == "a" && got("c") == "a",
      s"left clique: $got")
    assert(got("d") == "a" || Set("d", "e", "f").forall(n => got(n) == got("d")),
      s"right clique must be one community: $got")
    assert(got("e") == got("f"), s"e/f split: $got")
  }

  test("label propagation ignores self-loops and duplicate/reversed edges") {
    import spark.implicits._
    val edges = Seq(
      ("a", "a"), ("a", "b"), ("b", "a"), ("a", "b")).toDF("src", "dst")
    val got = GraphOps.labelPropagation(edges, iters = 2)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    // the only structure left is the single a–b edge: round 1 swaps
    // the two labels, round 2 swaps them back (the classic 2-cycle on
    // bipartite structures the fixed-round contract embraces)
    assert(got == Map("a" -> "a", "b" -> "b"), s"got $got")
  }
}
