package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSuite

class ActiveLearnSpec extends AnyFunSuite with SparkSuite {

  private val sfDir = "/root/testdata/sf0.001"

  test("active-learning loop grows the labeled set and does not degrade F1") {
    val rounds = ActiveLearn.run(spark, sfDir,
      rounds = 3, batch = 10, seedLabels = 6)
    info(rounds.map(r => s"round ${r.round}: n=${r.nLabeled} f1=${r.f1}")
      .mkString("; "))
    assert(rounds.size == 3)
    // each round adds `batch` annotations (uncertainty top-k → oracle)
    assert(rounds.map(_.nLabeled) == Seq(6L, 16L, 26L))
    // retraining on more labels never degrades the end metric here
    assert(rounds.last.f1 >= rounds.head.f1)
    assert(rounds.last.f1 >= 0.99)
  }
}
