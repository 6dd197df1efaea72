package graft.olist

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Per-transform unit tests over the dirty-data fixture CSVs (FIXTURES.md
  * §A): each test exercises a transformation rule cited in SURVEY §2. */
class SilverSpec extends SparkTestBase {

  private lazy val fixtureDir: String = {
    val d = tempDir("olist-fixtures")
    Fixtures.writeAll(d)
    d
  }

  private lazy val warehouse = tempDir("olist-wh")
  private lazy val audit = new Audit(spark, warehouse)
  private lazy val bronze = new Bronze(spark, warehouse, audit)

  private def bronzeDf(table: String): DataFrame = {
    val (name, schema, pipe) = Schemas.bronzeTables.find(_._1 == table).get
    bronze.readCsv(s"$fixtureDir/$name.csv", schema, if (pipe) "|" else ",")
  }

  test("customers: trim, zip LEFT(10), UPPER(LEFT(state,2)); NULL ids dropped") {
    val out = Silver.customers(bronzeDf("olist_customers")).cache()
    assert(out.count() == 4) // NULL customer_id row dropped
    val c2 = out.filter(col("customer_id") === "c2").head()
    assert(c2.getAs[String]("customer_zip_code_prefix") == "22041-001x")
    assert(c2.getAs[String]("customer_state") == "RJ") // "  rjx" → RJ
    val c3 = out.filter(col("customer_id") === "c3").head()
    assert(c3.getAs[String]("customer_state") == "MG")
  }

  test("sellers: empty seller_id dropped") {
    val out = Silver.sellers(bronzeDf("olist_sellers"))
    assert(out.count() == 2)
  }

  test("geolocation: accent/case-fold dedup to one row per (zip,city,state)") {
    val out = Silver.geolocation(bronzeDf("olist_geolocation")).cache()
    // 3 São Paulo variants → 1 row; NULL-city row dropped; Rio stays
    assert(out.count() == 2)
    val sp = out.filter(col("geolocation_zip_code_prefix") === "01310").collect()
    assert(sp.length == 1)
    assert(sp.head.getAs[String]("geolocation_city") == "sao paulo")
    assert(sp.head.getAs[String]("geolocation_state") == "SP")
  }

  test("geolocation: dedup is idempotent (f(f(x)) == f(x))") {
    val once = Silver.geolocation(bronzeDf("olist_geolocation"))
    // re-applying the distinct-by-key semantics must be a fixpoint
    assert(once.distinct().count() == once.count())
  }

  test("orders: lower(status), try-timestamp NULL on garbage, computed cols") {
    val out = Silver.orders(bronzeDf("olist_orders")).cache()
    assert(out.count() == 4)
    val o1 = out.filter(col("order_id") === "o1").head()
    assert(o1.getAs[String]("order_status") == "delivered") // DELIVERED → lower
    assert(o1.getAs[Int]("delivery_days") == 8)   // 10-02 → 10-10
    assert(o1.getAs[Int]("delay_days") == -8)     // delivered before estimate
    assert(o1.getAs[Int]("is_delivered") == 1)
    val o2 = out.filter(col("order_id") === "o2").head()
    assert(o2.getAs[Int]("delay_days") == 3)      // late: est 11-29, delivered 12-02
    val o3 = out.filter(col("order_id") === "o3").head()
    assert(o3.isNullAt(o3.fieldIndex("order_approved_at")))  // "bad-date" → NULL
    assert(o3.isNullAt(o3.fieldIndex("delivery_days")))      // undelivered → NULL metric
    assert(o3.getAs[Int]("is_delivered") == 0)
  }

  test("order_items: decimal-comma repair, non-castable item id dropped, empty order id dropped") {
    val out = Silver.orderItems(bronzeDf("olist_order_items")).cache()
    assert(out.count() == 3) // "abc" item and empty order_id dropped
    val i1 = out.filter(col("order_id") === "o1" && col("order_item_id") === 1).head()
    assert(i1.getAs[java.math.BigDecimal]("price").compareTo(new java.math.BigDecimal("58.90")) == 0)
    assert(i1.getAs[java.math.BigDecimal]("total_item_value").compareTo(new java.math.BigDecimal("72.19")) == 0)
  }

  test("order_payments: lower(type), NULL type dropped") {
    val out = Silver.orderPayments(bronzeDf("olist_order_payments")).cache()
    assert(out.count() == 3)
    assert(out.filter(col("payment_type") === "credit_card").count() == 1)
    assert(out.filter(col("payment_type") === "boleto").count() == 1)
  }

  test("order_reviews: keep-latest dedup, score domain, empty→NULL, newline scrub") {
    val out = Silver.orderReviews(bronzeDf("olist_order_reviews")).cache()
    assert(out.count() == 3) // r1 deduped, r3 (score 6) dropped
    val r1 = out.filter(col("review_id") === "r1").head()
    assert(r1.getAs[Int]("review_score") == 5) // later answer (score 5) wins
    assert(r1.getAs[String]("review_comment_message") == "great fast delivery") // \n → space
    assert(r1.getAs[Int]("has_comment") == 1)
    assert(r1.getAs[Int]("is_promoter") == 1)
    val r4 = out.filter(col("review_id") === "r4").head()
    assert(r4.isNullAt(r4.fieldIndex("review_comment_message"))) // whitespace-only → NULL
    assert(r4.getAs[Int]("has_comment") == 0)
    val r2 = out.filter(col("review_id") === "r2").head()
    assert(r2.getAs[Int]("is_detractor") == 1)
  }

  test("products: translation left join (broadcast), missing translation → NULL, volume computed") {
    val trans = Silver.categoryTranslation(bronzeDf("product_category_name_translation"))
    val out = Silver.products(bronzeDf("olist_products"), trans).cache()
    val p1 = out.filter(col("product_id") === "p1").head()
    assert(p1.getAs[String]("product_category_name_english") == "health_beauty") // padded key trimmed
    assert(p1.getAs[java.math.BigDecimal]("product_volume_cm3")
      .compareTo(new java.math.BigDecimal("2240.00")) == 0) // 16*10*14
    val p2 = out.filter(col("product_id") === "p2").head()
    assert(p2.isNullAt(p2.fieldIndex("product_category_name_english")))
    assert(p2.isNullAt(p2.fieldIndex("product_volume_cm3"))) // NULL height → NULL volume
  }
}
