package graft.ops

import graft.olist.SparkTestBase

/** Round-6 batch A: the clustered-embedding fixture and the recall
  * signal it unlocks (the isotropic testdata embeddings pin every
  * recall contract at the chance floor — these ops prove the contracts
  * move when the data actually clusters). */
class Round6aOpsSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"
  private def run(name: String) = graft.SparkEntry.queries(name)(spark, sf)

  test("emb-clustered-separation: all 8 labels separate positively from foreign centroids") {
    val rows = run("emb-clustered-separation").collect()
    assert(rows.map(_.getLong(0)).toSeq == (0L to 7L), "one row per label, ordered")
    rows.foreach { r =>
      val (label, n, own, other, sep) =
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      assert(n == 64, s"label $label must have 512/8 members, got $n")
      assert(sep == own - other, s"sep_micro must be the exact difference for label $label")
      assert(sep > 0, s"label $label must sit closer to its own centroid (sep=$sep)")
      assert(own > 500000, s"intra-cluster cosine must be strong for label $label (own=$own)")
    }
  }

  test("ann-clustered-recall: recall rises with nprobe, well above the 1/8 chance floor") {
    val rows = run("ann-clustered-recall").collect()
    assert(rows.map(_.getInt(0)).toSeq == Seq(1, 2, 4), "nprobe sweep rows")
    val recalls = rows.map(_.getLong(2)).toSeq
    // strictly increasing on this fixture: 0.90 -> 0.933 -> 0.967
    assert(recalls.zip(recalls.tail).forall { case (a, b) => a < b },
      s"recall must MOVE with nprobe on clustered data, got $recalls")
    rows.foreach { r =>
      assert(r.getLong(3) == 125000L, "chance floor column is 1/8 in micro")
      assert(r.getLong(2) > 4 * r.getLong(3),
        s"recall ${r.getLong(2)} must clear the chance floor by a wide margin")
      assert(r.getLong(2) == r.getLong(1) * 1000000L / 30L,
        "recall_micro is the exact integer ratio of hits to 3*|queries|")
    }
    assert(recalls.head >= 800000, s"nprobe=1 recall should already be high, got ${recalls.head}")
  }
}
