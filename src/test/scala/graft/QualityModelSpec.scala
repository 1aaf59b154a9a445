package graft

import graft.operators.TextAnalysis
import org.apache.spark.sql.functions._

/** t_quality_model — the model-based quality scorer (FineWeb-Edu
  * pattern): logistic regression over hashed unigram features, weak
  * labels from the Gopher battery, 3 unrolled full-batch GD steps.
  * Pins monotonicity vs the labels, that training actually reduces
  * the log-loss below the w=0 starting point, determinism, and the
  * score range. The cross-engine arithmetic is the driver gate's job.
  */
class QualityModelSpec extends SparkSpec {

  private lazy val docs = Tables(spark, sfDir).documents
  private lazy val out = TextAnalysis.qualityModel(docs)
    .collect().map(r => (r.getLong(0), r.getBoolean(1), r.getDouble(2)))

  test("the gate corpus carries both classes and scores stay in (0, 1)") {
    val (pass, fail) = out.partition(_._2)
    assert(pass.nonEmpty && fail.nonEmpty, "weak labels degenerate on this corpus")
    assert(out.forall { case (_, _, s) => s > 0.0 && s < 1.0 })
    assert(out.length == docs.count())
  }

  test("scores are monotone vs the weak labels: pass docs score higher on average") {
    val (pass, fail) = out.partition(_._2)
    val meanPass = pass.map(_._3).sum / pass.length
    val meanFail = fail.map(_._3).sum / fail.length
    assert(meanPass > meanFail,
      s"classifier learned nothing: pass=$meanPass fail=$meanFail")
    // and the separation is real, not a rounding artifact
    assert(meanPass - meanFail > 0.01)
  }

  test("training reduced the log-loss below the all-zero-weights start") {
    // w = 0 scores every doc 0.5 -> loss = ln 2; 3 GD steps must beat it
    val loss = out.map { case (_, y, s) =>
      if (y) -math.log(s) else -math.log(1.0 - s)
    }.sum / out.length
    assert(loss < math.log(2.0), s"loss $loss did not improve on ln2")
  }

  test("deterministic: a second training run reproduces every score") {
    val again = TextAnalysis.qualityModel(docs)
      .collect().map(r => (r.getLong(0), r.getBoolean(1), r.getDouble(2)))
    assert(again.sortBy(_._1).sameElements(out.sortBy(_._1)))
  }

  test("a crafted separable corpus is separated, not just ranked") {
    val s = spark
    import s.implicits._
    // 30 docs passing every gopher rule (60 varied alpha words + 'the')
    // vs 30 symbol-spam docs failing the symbol ratio; the classifier
    // must order every pass doc above every fail doc after 3 steps
    val good = (0L until 30L).map { i =>
      val words = (0 until 60).map(j => s"w${(i * 7 + j * 13) % 97}ord")
      (i, (words :+ "the").mkString(" "))
    }
    val bad = (100L until 130L).map { i =>
      val words = (0 until 60).map(j => s"#w${(i + j) % 11}#")
      (i, (words :+ "the").mkString(" "))
    }
    val crafted = (good ++ bad).toDF("doc_id", "text")
    val scored = TextAnalysis.qualityModel(crafted)
      .collect().map(r => (r.getBoolean(1), r.getDouble(2)))
    val (pass, fail) = scored.partition(_._1)
    assert(pass.length == 30 && fail.length == 30)
    assert(pass.map(_._2).min > fail.map(_._2).max,
      "crafted classes overlap after training")
  }
}
