package graft.block

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkSuite
import graft.normalize.Normalize
import graft.synth.Transcripts

class LabelsSpec extends AnyFunSuite with SparkSuite {

  private val sfDir = "/root/testdata/sf0.001"

  test("referenceStyle: 4x replication -> C(4,2) pos + C(nNeg,2) neg") {
    val recs = Normalize.normalize(Transcripts.transcripts(spark, sfDir))
    val (augmented, labels) = Labels.referenceStyle(recs, nNeg = 10)
    assert(labels.filter(col("label") === 1).count() == 6)  // C(4,2)
    assert(labels.filter(col("label") === 0).count() == 45) // C(10,2)
    assert(augmented.count() == recs.count() + 4)
    // the 4 replicas carry IDENTICAL attribute values — guaranteed
    // matches, the reference's repeat-4x intent (initialize.py:67-76)
    val replicas = augmented.filter(col("conv_id").contains("#"))
    assert(replicas.count() == 4)
    assert(replicas.select("head_text", "full_text", "role_seq", "tool_set")
      .distinct().count() == 1)
    // every pos pair joins two replicas of the sampled record
    val posIds = labels.filter(col("label") === 1)
      .select(explode(array(col("id_l"), col("id_r"))).as("id"))
      .distinct().count()
    assert(posIds == 4)
  }
}
