package graft.olist

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The property that justifies row_number surrogate keys over IDENTITY:
  * gold outputs must be identical regardless of input ordering or
  * partitioning (IDENTITY assigns by nondeterministic insert order; our
  * SKs are a pure function of the natural key). */
class GoldDeterminismSpec extends SparkTestBase {

  private lazy val silverCustomers: DataFrame = {
    val dir = tempDir("gold-det-csv")
    Fixtures.writeAll(dir)
    val wh = tempDir("gold-det-wh")
    val audit = new Audit(spark, wh)
    val bronze = new Bronze(spark, wh, audit)
    bronze.loadAll(dir)
    Silver.customers(bronze.table("olist_customers"))
  }

  test("dim SKs are invariant under input reordering and repartitioning") {
    val base = Gold.dimCustomer(silverCustomers)
    val shuffled = Gold.dimCustomer(
      silverCustomers.repartition(7, col("customer_city")).orderBy(desc("customer_id")))
    assert(base.exceptAll(shuffled).count() == 0)
    assert(shuffled.exceptAll(base).count() == 0)
  }

  test("fact SKs are a pure function of the natural key across rebuilds") {
    val dim = Gold.dimCustomer(silverCustomers)
    val dir = tempDir("gold-det-csv2")
    Fixtures.writeAll(dir)
    val wh = tempDir("gold-det-wh2")
    val audit = new Audit(spark, wh)
    val bronze = new Bronze(spark, wh, audit)
    bronze.loadAll(dir)
    val silverOrders = Silver.orders(bronze.table("olist_orders"))
    val f1 = Gold.factOrders(silverOrders, dim)
    val f2 = Gold.factOrders(silverOrders.repartition(5), dim)
    val k1 = f1.select("order_id", "order_sk", "customer_sk").collect().map(_.toString).sorted
    val k2 = f2.select("order_id", "order_sk", "customer_sk").collect().map(_.toString).sorted
    assert(k1.sameElements(k2))
  }
}
