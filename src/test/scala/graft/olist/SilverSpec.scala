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

  test("accentFoldLower: CI_AI collation parity over the full Portuguese diacritic set") {
    // The reference groups city names under SQL_Latin1_General_CP1_CI_AI
    // (`sp_load_silver_geolocation.sql:32,42`) — case- AND
    // accent-insensitive. Parity oracle: Unicode NFD decomposition with
    // combining marks stripped, lowercased (java.text.Normalizer) — an
    // independent implementation of the same fold classes for the
    // Latin-1 range the collation covers.
    def ciAiRef(s: String): String =
      java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFD)
        .replaceAll("\\p{M}", "").toLowerCase
    val fixture = Seq(
      // every mapped diacritic, lowercase and uppercase, incl. the
      // ü/ñ/ý edge chars (Latin-1 letters rare-but-legal in pt-BR text)
      "áàâãä", "ÁÀÂÃÄ", "éèêë", "ÉÈÊË", "íìîï", "ÍÌÎÏ",
      "óòôõö", "ÓÒÔÕÖ", "úùûü", "ÚÙÛÜ", "ç", "Ç", "ñ", "Ñ", "ý", "Ý",
      // real city-name variants the Olist geolocation table carries
      "São Paulo", "SAO PAULO", "sao paulo", "sÃo paulo",
      "Brasília", "BRASILIA", "brasilia",
      "Paraná", "parana", "PARANÁ",
      "Goiânia", "goiania", "Maceió", "maceio",
      "Vitória", "vitoria", "São Luís", "sao luis",
      "Cuiabá", "cuiaba", "Florianópolis", "florianopolis",
      "Belém", "belem", "Itaúna", "itauna",
      "mogi-guaçu", "MOGI-GUAÇU", "Canindé de São Francisco")
    import spark.implicits._
    val folded = fixture.toDF("city")
      .select(col("city"), Functions.accentFoldLower(col("city")).as("folded"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    // per-string parity with the independent fold
    fixture.foreach { s =>
      assert(folded(s) == ciAiRef(s), s"fold('$s'): got '${folded(s)}', want '${ciAiRef(s)}'")
    }
    // grouping parity: two variants land in the same group exactly when
    // the reference's CI_AI GROUP BY would merge them
    fixture.combinations(2).foreach { case Seq(a, b) =>
      assert((folded(a) == folded(b)) == (ciAiRef(a) == ciAiRef(b)),
        s"group parity broken for '$a' vs '$b'")
    }
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
