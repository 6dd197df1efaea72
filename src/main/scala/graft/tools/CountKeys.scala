package graft.tools
object CountKeys {
  def main(args: Array[String]): Unit = {
    val q = graft.SparkEntry.queries
    val o = graft.SparkEntry.oracleSql
    println(s"[countkeys] queries=${q.size} oracles=${o.size} missing_oracle=${(q.keySet -- o.keySet).toSeq.sorted.mkString(",")}")
  }
}
