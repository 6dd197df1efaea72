package graft.ops

import graft.olist.SparkTestBase

/** Structural invariants for round-10 batch C (density analysis +
  * Louvain round). */
class Round10cOpsSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"
  private def run(name: String) = graft.SparkEntry.queries(name)(spark, sf)

  test("emb-dbscan-core: roles partition the corpus") {
    val rows = run("emb-dbscan-core").collect()
    assert(rows.nonEmpty && rows.length <= 3)
    val n = rows.map(_.getAs[Long]("n_points")).sum
    assert(n == 500, s"roles must partition all 500 vectors, got $n")
    rows.foreach(r => assert(r.getAs[Long]("n_points") > 0))
  }

  test("emb-kdist-elbow: decile curve is monotone nondecreasing") {
    val rows = run("emb-kdist-elbow").collect()
    assert(rows.length == 10)
    val ks = rows.map(_.getAs[Long]("kdist_milli"))
    assert(ks.zip(ks.tail).forall { case (a, b) => a <= b })
    assert(ks.head > 0)
  }

  test("emb-lof: top scores positive and sorted descending") {
    val rows = run("emb-lof").collect()
    assert(rows.length == 10)
    val ls = rows.map(_.getAs[Double]("lof"))
    assert(ls.zip(ls.tail).forall { case (a, b) => a >= b })
    assert(ls.forall(_ > 0.0))
    // the top outlier should exceed the inlier reference value 1
    assert(ls.head > 1.0)
  }

  test("graph-louvain-round: one local round beats singletons") {
    val r = run("graph-louvain-round").head()
    assert(r.getAs[Long]("n_communities") <= r.getAs[Long]("n_nodes"))
    assert(r.getAs[Long]("n_moved") >= 0)
    assert(r.getAs[Long]("modularity_ppm_before") < 0,
      "singleton modularity is always negative")
    assert(r.getAs[Long]("modularity_ppm_after") >
      r.getAs[Long]("modularity_ppm_before"),
      "a gain-gated local move cannot lower modularity vs singletons")
  }
}
