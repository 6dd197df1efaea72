package graft.olist

/** Hand-written Olist bronze CSV fixtures seeded with the dirty-data
  * cases each transform must handle (FIXTURES.md §A; each case cites the
  * reference rule it exercises). */
object Fixtures {

  val customers: String =
    """customer_id,customer_unique_id,customer_zip_code_prefix,customer_city,customer_state
      |c1,u1,01310,Sao Paulo,SP
      |  c2  ,u2,  22041-001x ,Rio de Janeiro,  rjx
      |c3,u3,30130,Belo Horizonte,mg
      |,u4,99999,Ghost Town,XX
      |c5,u5,70070,Brasilia,DF
      |""".stripMargin

  val geolocation: String =
    """geolocation_zip_code_prefix,geolocation_lat,geolocation_lng,geolocation_city,geolocation_state
      |01310,-23.56,-46.65,São Paulo,SP
      |01310,-23.57,-46.66,sao paulo,sp
      |01310,-23.58,-46.67,SAO PAULO,SP
      |22041,-22.98,-43.19,Rio de Janeiro,RJ
      |30130,-19.92,-43.94,,MG
      |""".stripMargin

  val orders: String =
    """order_id,customer_id,order_status,order_purchase_timestamp,order_approved_at,order_delivered_carrier_date,order_delivered_customer_date,order_estimated_delivery_date
      |o1,c1,DELIVERED,2017-10-02 10:56:33,2017-10-02 11:07:15,2017-10-04 19:55:00,2017-10-10 21:25:13,2017-10-18 00:00:00
      |o2,c2,delivered,2017-11-18 19:28:06,2017-11-18 19:45:59,2017-11-22 13:39:59,2017-12-02 00:28:42,2017-11-29 00:00:00
      |o3,c3,shipped,2018-01-14 14:33:31,bad-date,2018-01-16 12:36:48,,2018-02-05 00:00:00
      |o4,c5,canceled,2018-02-19 20:31:10,,,,2018-03-17 00:00:00
      |""".stripMargin

  val orderItems: String =
    """order_id,order_item_id,product_id,seller_id,shipping_limit_date,price,freight_value
      |o1,1,p1,s1,2017-10-06 11:07:15,"58,90","13,29"
      |o1,2,p2,s1,2017-10-06 11:07:15,239.90,19.93
      |o2,1,p2,s2,2017-11-23 19:45:59,199.00,17.87
      |o2,abc,p1,s1,2017-11-23 19:45:59,10.00,1.00
      |,1,p1,s1,2017-11-23 19:45:59,10.00,1.00
      |""".stripMargin

  val orderPayments: String =
    """order_id,payment_sequential,payment_type,payment_installments,payment_value
      |o1,1,Credit_Card,8,"72,19"
      |o2,1,BOLETO,1,216.87
      |o2,2,voucher,1,20.00
      |o4,1,,1,5.00
      |""".stripMargin

  /** Pipe-separated (post-preclean shape, `03:110-115`); one duplicated
    * review_id keeping the later answer, one out-of-domain score, one
    * empty comment → NULL, one embedded newline in a quoted message. */
  val orderReviews: String =
    "review_id|order_id|review_score|review_comment_title|review_comment_message|review_creation_date|review_answer_timestamp\n" +
    "r1|o1|5||\"great\nfast delivery\"|2017-10-11 00:00:00|2017-10-12 03:43:48\n" +
    "r1|o1|4||old answer|2017-10-11 00:00:00|2017-10-11 10:00:00\n" +
    "r2|o2|1|Atrasado||2017-12-03 00:00:00|2017-12-04 09:10:00\n" +
    "r3|o3|6|bad score|should be dropped|2018-01-20 00:00:00|2018-01-21 00:00:00\n" +
    "r4|o4|3|  |   |2018-02-25 00:00:00|2018-02-26 00:00:00\n"

  val products: String =
    """product_id,product_category_name,product_name_lenght,product_description_lenght,product_photos_qty,product_weight_g,product_length_cm,product_height_cm,product_width_cm
      |p1,beleza_saude,40,287,1,"225,00",16.00,10.00,14.00
      |p2,categoria_sem_traducao,29,178,1,1000.00,30.00,,20.00
      |""".stripMargin

  val sellers: String =
    """seller_id,seller_zip_code_prefix,seller_city,seller_state
      |s1,13023,campinas,SP
      |s2,87900,loanda,PR
      |,00000,nowhere,XX
      |""".stripMargin

  val translation: String =
    """product_category_name,product_category_name_english
      |  beleza_saude  ,health_beauty
      |informatica_acessorios,computers_accessories
      |""".stripMargin

  /** Write all 9 fixture CSVs into dir using the bronze file naming the
    * loader expects. */
  def writeAll(dir: String): Unit = {
    def w(name: String, content: String): Unit =
      java.nio.file.Files.writeString(java.nio.file.Paths.get(dir, name), content)
    w("olist_customers.csv", customers)
    w("olist_geolocation.csv", geolocation)
    w("olist_orders.csv", orders)
    w("olist_order_items.csv", orderItems)
    w("olist_order_payments.csv", orderPayments)
    w("olist_order_reviews.csv", orderReviews)
    w("olist_products.csv", products)
    w("olist_sellers.csv", sellers)
    w("product_category_name_translation.csv", translation)
  }
}
