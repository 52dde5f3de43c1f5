package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkSuite

class RecordLinkageSpec extends AnyFunSuite with SparkSuite {

  private val sfDir = "/root/testdata/sf0.001"

  test("record-linkage mode links the planted cross-table truth at F1 >= 0.99") {
    val result = RecordLinkage.run(spark, sfDir)
    val (f1, tp, fp, fn) = RecordLinkage.f1(spark, sfDir, result.scored)
    info(s"RL f1=$f1 tp=$tp fp=$fp fn=$fn")
    assert(f1 >= 0.99, s"record-linkage F1 $f1 (tp=$tp fp=$fp fn=$fn)")
    // pairs must cross tables: id_l always from the c-corpus, id_r from d
    val bad = result.pairs.filter(!col("id_l").startsWith("c") ||
      !col("id_r").startsWith("d")).count()
    assert(bad == 0)
  }
}
