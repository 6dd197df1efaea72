package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.expressions.Window
import Tables._

/** Round-5 batch F: the k-means M-step (completing the EM pair), node
  * Jaccard similarity for link prediction, and AQE's runtime join
  * re-plan demonstrated as a graded contract.
  */
object RelMore32 {

  /** emb-kmeans-update — the M-step emb-kmeans-assign stops short of:
    * re-assign every vector to its nearest label-seeded centroid (the
    * E-step), then recompute each cluster's centroid from its NEW
    * members and report how far every centroid moved plus how many
    * vectors it gained/lost — the per-iteration convergence telemetry
    * of Lloyd's algorithm (training stops when shifts flatline). Both
    * halves are the same two physical shapes at any scale: a map-side-
    * combined aggregate whose shuffle is |clusters|·|dims| rows, and a
    * broadcast of the tiny centroid table against the partitioned
    * corpus — iterate 100× and the plan never changes. Determinism is
    * emb-kmeans-assign's discipline end-to-end: floor-quantized micro-
    * unit components, exact long sums (order-free), one double
    * division per centroid component, the shift distance floored at
    * output. */
  val embKmeansUpdate: Q = (s, d) => {
    graft.functions.DotProduct.register(s)
    val base = embeddings(s, d).select(col("vec_id"), col("label"),
      expr("quantize_lattice_long(embedding, 1000000.0D)").as("xi"))
    def centroids(df: DataFrame, key: String): DataFrame =
      df.select(col(key).as("ck"), posexplode(col("xi")).as(Seq("pos", "x")))
        .groupBy(col("ck"), col("pos"))
        .agg(sum(col("x")).as("sd"), count(lit(1)).as("n"))
        .groupBy(col("ck"))
        .agg(expr("transform(array_sort(collect_list(struct(pos, sd))), s -> CAST(s.sd AS DOUBLE))").as("sv"),
          max(col("n")).as("n"))
        .select(col("ck"), expr("transform(sv, x -> x / CAST(n AS DOUBLE))").as("cv"),
          col("n"))
    val oldCent = centroids(base, "label")
      .select(col("ck").as("clabel"), col("cv").as("ocv"), col("n").as("n_old"))
    val v = base.withColumn("v", expr("transform(xi, x -> CAST(x AS DOUBLE))"))
    val w = Window.partitionBy(col("vec_id")).orderBy(col("dist2").asc, col("clabel").asc)
    val assigned = v.crossJoin(broadcast(oldCent.select(col("clabel"), col("ocv"))))
      .select(col("vec_id"), col("xi"), col("clabel"),
        expr("dot_product(v, v) - 2 * dot_product(v, ocv) + dot_product(ocv, ocv)").as("dist2"))
      .withColumn("rk", row_number().over(w)).filter(col("rk") === 1)
      .select(col("vec_id"), col("xi"), col("clabel").as("cluster"))
    val newCent = centroids(assigned, "cluster")
      .select(col("ck").as("cluster"), col("cv").as("ncv"), col("n").as("n_new"))
    newCent.join(broadcast(oldCent.withColumnRenamed("clabel", "cluster")), Seq("cluster"))
      .select(col("cluster"), col("n_old"), col("n_new"),
        expr("CAST(floor((dot_product(ncv, ncv) - 2 * dot_product(ncv, ocv) + dot_product(ocv, ocv)) / 1000000) AS BIGINT)").as("shift2_q"))
      .orderBy("cluster")
  }

  val embKmeansUpdateSql: String =
    """WITH base AS (
      |  SELECT vec_id, label,
      |         list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 1000000) AS BIGINT)) AS xi
      |  FROM embeddings),
      |ocomp AS (
      |  SELECT label AS ck, CAST(pos - 1 AS INT) AS pos, x
      |  FROM (SELECT label, unnest(xi) AS x, unnest(range(1, len(xi) + 1)) AS pos FROM base)),
      |ocent AS (
      |  SELECT ck AS clabel,
      |         list(CAST(sd AS DOUBLE) / CAST(n AS DOUBLE) ORDER BY pos) AS ocv,
      |         max(n) AS n_old
      |  FROM (SELECT ck, pos, CAST(sum(x) AS BIGINT) AS sd, count(*) AS n
      |        FROM ocomp GROUP BY 1, 2)
      |  GROUP BY ck),
      |vv AS (SELECT vec_id, xi, list_transform(xi, x -> CAST(x AS DOUBLE)) AS v FROM base),
      |assigned AS (
      |  SELECT vec_id, xi, clabel AS cluster FROM (
      |    SELECT vv.vec_id, vv.xi, o.clabel,
      |           row_number() OVER (PARTITION BY vv.vec_id ORDER BY
      |             list_inner_product(v, v) - 2 * list_inner_product(v, ocv)
      |               + list_inner_product(ocv, ocv), o.clabel) AS rk
      |    FROM vv, ocent o) WHERE rk = 1),
      |ncomp AS (
      |  SELECT cluster AS ck, CAST(pos - 1 AS INT) AS pos, x
      |  FROM (SELECT cluster, unnest(xi) AS x, unnest(range(1, len(xi) + 1)) AS pos FROM assigned)),
      |ncent AS (
      |  SELECT ck AS cluster,
      |         list(CAST(sd AS DOUBLE) / CAST(n AS DOUBLE) ORDER BY pos) AS ncv,
      |         max(n) AS n_new
      |  FROM (SELECT ck, pos, CAST(sum(x) AS BIGINT) AS sd, count(*) AS n
      |        FROM ncomp GROUP BY 1, 2)
      |  GROUP BY ck)
      |SELECT n.cluster, o.n_old, n.n_new,
      |       CAST(floor((list_inner_product(ncv, ncv) - 2 * list_inner_product(ncv, ocv)
      |         + list_inner_product(ocv, ocv)) / 1000000) AS BIGINT) AS shift2_q
      |FROM ncent n JOIN ocent o ON o.clabel = n.cluster
      |ORDER BY cluster""".stripMargin

  /** graph-jaccard-similarity — neighbor-set Jaccard between node pairs
    * of the part co-purchase graph: the classic link-prediction /
    * related-items feature (|N(u)∩N(v)| / |N(u)∪N(v)|). The quadratic
    * never materializes: candidate pairs are generated ONLY through a
    * shared neighbor (self-join of the edge list on the neighbor
    * column — Σ deg(w)² candidate rows, the wedge bound that
    * graph-triangle-count already lives with; production caps hub
    * degrees first, same as the df-cap in dedup-containment), the
    * intersection size falls out of a count per pair, degrees join in
    * from a |nodes| aggregate, and union = deg(u)+deg(v)−|∩| needs no
    * second pass. Exact integer ppm, top-20 with full tiebreak. */
  val graphJaccardSimilarity: Q = (s, d) => {
    val li = lineitem(s, d).filter(col("l_orderkey") % 29 === 0)
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
      .distinct()
    val pairs = li.as("a").join(li.as("b"), Seq("ok"))
      .filter(col("a.pk") < col("b.pk"))
      .select(col("a.pk").as("u"), col("b.pk").as("v"))
      .distinct()
    val edges = pairs.union(pairs.select(col("v"), col("u"))).toDF("n", "w")
    val deg = edges.groupBy("n").agg(count(lit(1)).as("deg"))
    val common = edges.toDF("n1", "w").join(edges.toDF("n2", "w"), Seq("w"))
      .filter(col("n1") < col("n2"))
      .groupBy("n1", "n2").agg(count(lit(1)).as("c"))
    common
      .join(deg.select(col("n").as("n1"), col("deg").as("d1")), Seq("n1"))
      .join(deg.select(col("n").as("n2"), col("deg").as("d2")), Seq("n2"))
      .select(col("n1"), col("n2"), col("c"),
        floor(col("c") * lit(1000000L) / (col("d1") + col("d2") - col("c")))
          .cast(LongType).as("jaccard_ppm"))
      .orderBy(desc("jaccard_ppm"), col("n1"), col("n2"))
      .limit(20)
  }

  val graphJaccardSimilaritySql: String =
    """WITH li AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk
      |            FROM lineitem WHERE l_orderkey % 29 = 0),
      |pairs AS (SELECT DISTINCT a.pk AS u, b.pk AS v
      |          FROM li a JOIN li b ON a.ok = b.ok AND a.pk < b.pk),
      |edges AS (SELECT u AS n, v AS w FROM pairs UNION ALL SELECT v, u FROM pairs),
      |deg AS (SELECT n, count(*) AS deg FROM edges GROUP BY 1),
      |common AS (
      |  SELECT e1.n AS n1, e2.n AS n2, count(*) AS c
      |  FROM edges e1 JOIN edges e2 ON e1.w = e2.w AND e1.n < e2.n
      |  GROUP BY 1, 2)
      |SELECT n1, n2, c,
      |       CAST(floor(c * 1000000 / (d1.deg + d2.deg - c)) AS BIGINT) AS jaccard_ppm
      |FROM common
      |JOIN deg d1 ON d1.n = n1
      |JOIN deg d2 ON d2.n = n2
      |ORDER BY jaccard_ppm DESC, n1, n2
      |LIMIT 20""".stripMargin

  /** join-aqe-replan — adaptive execution's runtime join re-plan as a
    * graded contract: static stats see the full customer table (the
    * pre-filter size is all a size-only estimator propagates through a
    * filter), so the initial plan is a sort-merge join; at runtime the
    * filtered side's shuffle materializes at a few KB and AQE rewrites
    * the running query to a broadcast join — the spec asserts
    * SortMergeJoin in the initial plan AND BroadcastHashJoin in the
    * final one. This is THE 100 TB insurance policy: selectivities are
    * unknowable statically at that scale, and the difference between
    * the two strategies on a fact table is hours. Static broadcast is
    * disabled for just this query (conf restored in finally) so the
    * demonstration can't silently degrade into a statically-planned
    * broadcast. */
  val joinAqeReplan: Q = (s, d) => {
    val prev = s.conf.getOption("spark.sql.autoBroadcastJoinThreshold")
    val prevAqe = s.conf.getOption("spark.sql.adaptive.autoBroadcastJoinThreshold")
    try {
      s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      // the adaptive threshold DEFAULTS to the static one — pin it
      // independently or -1 disables the runtime rewrite too
      s.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "10MB")
      val smallCust = customer(s, d).filter(col("c_custkey") % 1009 === 0)
        .select(col("c_custkey"), col("c_name"))
      val out = orders(s, d).join(smallCust, col("o_custkey") === col("c_custkey"))
        .groupBy("c_custkey", "c_name")
        .agg(count(lit(1)).as("n_orders"),
          outNum(sum(dec2(col("o_totalprice")))).as("revenue"))
        .orderBy("c_custkey")
      out.count() // materialize under the modified conf so AQE re-plans NOW
      out
    } finally {
      prev match {
        case Some(v) => s.conf.set("spark.sql.autoBroadcastJoinThreshold", v)
        case None => s.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      }
      prevAqe match {
        case Some(v) => s.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", v)
        case None => s.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
      }
    }
  }

  val joinAqeReplanSql: String =
    """SELECT c.c_custkey, c.c_name, count(*) AS n_orders,
      |       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
      |FROM orders o
      |JOIN customer c ON c.c_custkey = o.o_custkey
      |WHERE c.c_custkey % 1009 = 0
      |GROUP BY c.c_custkey, c.c_name
      |ORDER BY c.c_custkey""".stripMargin

  val queries: Map[String, Q] = Map(
    "emb-kmeans-update" -> embKmeansUpdate,
    "graph-jaccard-similarity" -> graphJaccardSimilarity,
    "join-aqe-replan" -> joinAqeReplan)

  val oracles: Map[String, String] = Map(
    "emb-kmeans-update" -> embKmeansUpdateSql,
    "graph-jaccard-similarity" -> graphJaccardSimilaritySql,
    "join-aqe-replan" -> joinAqeReplanSql)
}
