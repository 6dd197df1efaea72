package graft.ops

import graft.olist.SparkTestBase

/** Round-6 batch O: deletion vectors, Mann-Whitney, Poisson/HT sampling. */
class Round6oOpsSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"
  private def run(name: String) = graft.SparkEntry.queries(name)(spark, sf)

  test("sink-deletion-vectors: MOR drops exactly the DV rows, compaction preserves values") {
    val rows = run("sink-deletion-vectors").collect()
    assert(rows.length == 3)
    val byStage = rows.map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    val (bn, bp, bc) = byStage("1_base")
    val (mn, mp, mc) = byStage("2_mor_read")
    val (cn, cp, cc) = byStage("3_compacted")
    assert(mn < bn, "the DV deleted something")
    assert(cn == mn && cc == mc, "compaction rewrites losslessly")
    assert(mc < bc, "deleted rows carried value")
    assert(cp < mp, "compaction re-densifies positions (sum must drop)")
    assert(bp > 0 && mp > 0)
  }

  test("dq-mann-whitney: doubled U is within its exact bounds and z is finite") {
    val r = run("dq-mann-whitney").collect()
    assert(r.length == 1)
    val (m, n, u2) = (r.head.getLong(0), r.head.getLong(1), r.head.getLong(2))
    assert(m > 0 && n > 0)
    assert(u2 >= 0 && u2 <= 2 * m * n, "0 <= U <= mn")
    val z = r.head.getLong(3)
    assert(math.abs(z) < 100000, "z_milli is a sane magnitude")
    assert(Set("shifted", "no_shift").contains(r.head.getString(4)))
  }

  test("sample-poisson-ht: sample size tracks E[n] and HT lands near the true total") {
    val r = run("sample-poisson-ht").collect().head
    val nPop = r.getLong(0); val nSample = r.getLong(1)
    val expMilli = r.getLong(2); val trueTotal = r.getLong(4)
    val htTotal = r.getLong(5); val relErrPpm = r.getLong(6)
    assert(nSample > 0 && nSample < nPop, "a real subsample")
    // binomial concentration: n within 5 sigma of expectation
    val expN = expMilli / 1000.0
    assert(math.abs(nSample - expN) < 5 * math.sqrt(expN) + 5,
      s"n_sample=$nSample vs E[n]=$expN")
    assert(htTotal > 0 && trueTotal > 0)
    assert(relErrPpm < 200000, s"HT within 20% of truth (got $relErrPpm ppm)")
  }
}
