package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class LogRegSpec extends SparkSpec {
  import spark.implicits._

  // separable planted data: y = 1 iff x1 > 0 (x2 is noise)
  private def planted = {
    val rng = new scala.util.Random(42)
    (1 to 400).map { _ =>
      val x1 = rng.nextGaussian(); val x2 = rng.nextGaussian()
      (x1, x2, if (x1 > 0) 1.0 else 0.0)
    }.toDF("x1", "x2", "y")
  }

  test("fitFixedPoint learns a separable rule (high accuracy, right sign)") {
    val w = LogReg.fitFixedPoint(planted, Seq("x1", "x2"), "y", iters = 20, lr = 1.0)
    w(1) should be > 0.5 // strong positive weight on the separating dim
    math.abs(w(2)) should be < math.abs(w(1)) // noise dim stays smaller
    val scored = LogReg.score(planted, Seq("x1", "x2"), w)
    val acc = scored.where(col("pred") === col("y")).count().toDouble / 400.0
    acc should be > 0.9
  }

  test("fitFixedPoint is bit-identical across partitionings") {
    val d = planted
    val w1 = LogReg.fitFixedPoint(d.repartition(1), Seq("x1", "x2"), "y", 5, 0.5)
    val w8 = LogReg.fitFixedPoint(d.repartition(8), Seq("x1", "x2"), "y", 5, 0.5)
    w1.toSeq shouldBe w8.toSeq // exact, not approximate: integerized sums
  }

  test("zero iterations returns the zero model; score then predicts 1 (p=0.5)") {
    val w = LogReg.fitFixedPoint(planted, Seq("x1", "x2"), "y", iters = 0, lr = 0.5)
    w.toSeq shouldBe Seq(0.0, 0.0, 0.0)
    val preds = LogReg.score(planted, Seq("x1", "x2"), w)
      .select("pred").distinct().as[Double].collect().toSet
    preds shouldBe Set(1.0) // p = 0.5 exactly -> >= 0.5 boundary
  }
}
