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
}
