package graft.core

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoders, SparkSession}

/** Deterministic transaction-domain data generator — a Scala, distributed
  * port of the reference's seeder distributions
  * (scripts/delta_lake_seeder.py:76-220,304-328 and
  * kafka_stream_generator.py:46-188; weights documented in FIXTURES.md §1).
  *
  * Generation is per-row seeded (`seed ^ f(id)`) inside `spark.range.map`,
  * so it scales horizontally: 10^9 rows is just `range(1e9)` across
  * executors — no driver-side materialization, no sequential RNG. The same
  * (seed, id) always yields the same row on any partitioning, which makes
  * fixtures reproducible cluster-wide.
  */
object TransactionGen {

  final case class Tx(
      transaction_id: String, event_timestamp: Timestamp, customer_id: String,
      customer_tier: String, product_id: String, product_name: String,
      category: String, sub_category: Option[String], brand: Option[String],
      quantity: Int, unit_price: Double, discount_percent: Option[Double],
      total_amount: Double, tax_amount: Option[Double], currency: String,
      payment_method: String, card_network: Option[String],
      transaction_status: String, channel: String, store_id: Option[String],
      region: String, city: String, is_fraudulent: Option[Boolean],
      fraud_score: Option[Double])

  // Distributions from kafka_stream_generator.py:46-188 (weights sum to 1).
  private val categories = Seq( // (name, weight, priceLo, priceHi)
    ("electronics", 0.20, 29.99, 2499.99), ("clothing", 0.18, 9.99, 299.99),
    ("grocery", 0.22, 1.99, 89.99), ("home_garden", 0.10, 14.99, 899.99),
    ("sports", 0.08, 12.99, 499.99), ("beauty", 0.07, 4.99, 149.99),
    ("automotive", 0.04, 19.99, 1299.99), ("books", 0.05, 5.99, 79.99),
    ("toys", 0.03, 7.99, 199.99), ("pharmacy", 0.03, 2.99, 99.99))
  private val subCats = Map(
    "electronics" -> Seq("phones", "laptops", "audio", "cameras", "wearables"),
    "clothing" -> Seq("mens", "womens", "kids", "shoes", "accessories"),
    "grocery" -> Seq("produce", "dairy", "snacks", "beverages", "frozen"),
    "home_garden" -> Seq("furniture", "kitchen", "garden", "decor", "tools"),
    "sports" -> Seq("fitness", "outdoor", "team_sports", "cycling", "swimming"),
    "beauty" -> Seq("skincare", "makeup", "haircare", "fragrance", "wellness"),
    "automotive" -> Seq("parts", "accessories", "tools", "care", "electronics"),
    "books" -> Seq("fiction", "nonfiction", "academic", "children", "comics"),
    "toys" -> Seq("educational", "action", "dolls", "games", "outdoor"),
    "pharmacy" -> Seq("otc", "vitamins", "personal_care", "first_aid", "baby"))
  private val regions = Seq( // (region, weight, cities)
    ("north", 0.22, Seq("Delhi", "Chandigarh", "Lucknow", "Jaipur")),
    ("south", 0.25, Seq("Bangalore", "Chennai", "Hyderabad", "Kochi")),
    ("east", 0.12, Seq("Kolkata", "Bhubaneswar", "Patna", "Guwahati")),
    ("west", 0.28, Seq("Mumbai", "Pune", "Ahmedabad", "Goa")),
    ("central", 0.08, Seq("Nagpur", "Bhopal", "Indore", "Raipur")),
    ("northeast", 0.05, Seq("Shillong", "Imphal", "Agartala", "Aizawl")))
  private val payments = Seq(
    ("credit_card", 0.30), ("debit_card", 0.20), ("upi", 0.25), ("wallet", 0.10),
    ("bank_transfer", 0.05), ("cod", 0.08), ("gift_card", 0.02))
  private val channels = Seq(
    ("pos_in_store", 0.25), ("web", 0.20), ("mobile_app", 0.35),
    ("marketplace", 0.15), ("call_center", 0.05))
  private val tiers = Seq(
    ("bronze", 0.50), ("silver", 0.30), ("gold", 0.15), ("platinum", 0.05))
  private val networks = Seq(
    ("visa", 0.35), ("mastercard", 0.30), ("amex", 0.15), ("rupay", 0.15),
    ("discover", 0.05))
  private val statuses = Seq(
    ("completed", 0.92), ("pending", 0.04), ("failed", 0.02),
    ("refunded", 0.015), ("chargeback", 0.005))

  private def pick[A](weighted: Seq[(A, Double)], u: Double): A = {
    var acc = 0.0
    weighted.foreach { case (a, w) => acc += w; if (u < acc) return a }
    weighted.last._1
  }

  private def round2(x: Double): Double = math.round(x * 100.0) / 100.0

  /** Generate `n` rows over `days` days ending 2026-01-30, deterministic in
    * (seed, id). Runs distributed via `spark.range`. */
  def generate(
      spark: SparkSession, n: Long, days: Int = 30, seed: Long = 42L,
      nCustomers: Int = 5000, nStores: Int = 50): Dataset[Tx] = {
    implicit val enc = Encoders.product[Tx]
    val endDay = java.time.LocalDate.of(2026, 1, 30)
    spark.range(n).map { id =>
      val rng = new java.util.Random(seed ^ (id * 0x9E3779B97F4A7C15L))
      val catIdx = pick(categories.zipWithIndex.map { case (c, i) => (i, c._2) }, rng.nextDouble())
      val (cat, _, lo, hi) = categories(catIdx)
      val custId = rng.nextInt(nCustomers)
      val tier = pick(tiers, rng.nextDouble())
      // 70% sticky preferred channel derived from customer id
      val preferred = channels(math.abs(custId * 2654435761L % 5).toInt)._1
      val channel =
        if (rng.nextDouble() < 0.70) preferred else pick(channels, rng.nextDouble())
      val digital = channel != "pos_in_store"
      val payment = pick(payments, rng.nextDouble())
      val network =
        if (payment == "credit_card" || payment == "debit_card")
          Some(pick(networks, rng.nextDouble()))
        else None
      val quantity = rng.nextDouble() match {
        case u if u < 0.70 => 1
        case u if u < 0.90 => 2
        case _ => 3 + rng.nextInt(3)
      }
      val price = round2(lo + rng.nextDouble() * (hi - lo))
      val disc = round2(rng.nextDouble() match {
        case u if u < 0.60 => 0.0
        case u if u < 0.90 => 5.0 + rng.nextDouble() * 10.0
        case _ => 20.0 + rng.nextDouble() * 30.0
      })
      // total derives from the ROUNDED discount (as stored), like the seeder
      val total = round2(quantity * price * (1 - disc / 100.0))
      val (region, _, cities) = {
        val r = pick(regions.zipWithIndex.map { case (x, i) => (i, x._2) }, rng.nextDouble())
        regions(r)
      }
      val city = cities(rng.nextInt(cities.length))
      // 80% of events in business hours 08:00-22:00
      val day = endDay.minusDays(rng.nextInt(days).toLong)
      val hour =
        if (rng.nextDouble() < 0.80) 8 + rng.nextInt(14) else rng.nextInt(24)
      val ts = Timestamp.valueOf(java.time.LocalDateTime.of(
        day, java.time.LocalTime.of(hour, rng.nextInt(60), rng.nextInt(60))))
      val isFraud = rng.nextDouble() < 0.02
      val score =
        if (isFraud) 0.7 + rng.nextDouble() * 0.3 else rng.nextDouble() * 0.15
      val status = pick(statuses, rng.nextDouble())
      Tx(
        transaction_id = s"txn-$id",
        event_timestamp = ts,
        customer_id = f"CUST-$custId%08d",
        customer_tier = tier,
        product_id = f"SKU-${cat.take(3).toUpperCase}-${rng.nextInt(500)}%05d",
        product_name = s"${subCats(cat)(rng.nextInt(5))} #${rng.nextInt(500)}",
        category = cat,
        sub_category = Some(subCats(cat)(rng.nextInt(5))),
        brand = Some(s"brand_${cat}_${rng.nextInt(6)}"),
        quantity = quantity,
        unit_price = price,
        discount_percent = Some(disc),
        total_amount = total,
        tax_amount = Some(round2(total * 0.09)),
        currency = "USD",
        payment_method = payment,
        card_network = network,
        transaction_status = status,
        channel = channel,
        store_id = if (digital) None else Some(f"STORE-${city.take(3).toUpperCase}-${rng.nextInt(nStores)}%03d"),
        region = region,
        city = city,
        is_fraudulent = Some(isFraud),
        fraud_score = Some(math.round(score * 10000.0) / 10000.0))
    }
  }
}
