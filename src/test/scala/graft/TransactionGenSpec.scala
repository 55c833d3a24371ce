package graft

import org.apache.spark.sql.functions._

import graft.core.TransactionGen

/** Statistical self-check over the generator — the reference's de-facto
  * validation strategy (README.md:466-484 expected-volume table,
  * delta_lake_seeder.py:619-650 seeder stats): generated distributions
  * must land on the documented weights, and the derived-field invariants
  * must hold exactly. */
class TransactionGenSpec extends SparkSpec {

  private lazy val tx = TransactionGen.generate(spark, 50000L).toDF().cache()

  private def frac(cond: org.apache.spark.sql.Column): Double =
    tx.agg(avg(when(cond, 1.0).otherwise(0.0))).head().getDouble(0)

  test("category / region / status weights within tolerance") {
    assert(math.abs(frac(col("category") === "grocery") - 0.22) < 0.015)
    assert(math.abs(frac(col("category") === "electronics") - 0.20) < 0.015)
    assert(math.abs(frac(col("region") === "west") - 0.28) < 0.015)
    assert(math.abs(frac(col("transaction_status") === "completed") - 0.92) < 0.01)
    assert(math.abs(frac(col("is_fraudulent") === true) - 0.02) < 0.005)
    assert(math.abs(frac(col("quantity") === 1) - 0.70) < 0.015)
    // 80% forced into 08-22 + uniform fallback overlap: 0.8 + 0.2*(14/24) ≈ 0.917
    assert(math.abs(frac(hour(col("event_timestamp")).between(8, 21)) - 0.917) < 0.02)
  }

  test("nullability encodes semantics: card vs non-card, POS vs digital") {
    val cardNullMismatch = tx.filter(
      (col("payment_method").isin("credit_card", "debit_card") && col("card_network").isNull) ||
        (!col("payment_method").isin("credit_card", "debit_card") && col("card_network").isNotNull))
    assert(cardNullMismatch.count() == 0)
    val storeMismatch = tx.filter(
      (col("channel") === "pos_in_store" && col("store_id").isNull) ||
        (col("channel") =!= "pos_in_store" && col("store_id").isNotNull))
    assert(storeMismatch.count() == 0)
  }

  test("arithmetic invariants: total = round(qty*price*(1-disc/100)), tax = 9%") {
    val bad = tx.filter(
      abs(col("total_amount") -
        round(col("quantity") * col("unit_price") * (lit(1) - col("discount_percent") / 100), 2)) > 0.011 ||
        abs(col("tax_amount") - round(col("total_amount") * 0.09, 2)) > 0.011)
    assert(bad.count() == 0)
  }

  test("fraud scores separate: fraud in [0.7,1.0], non-fraud in [0,0.15]") {
    assert(tx.filter(col("is_fraudulent") === true &&
      (col("fraud_score") < 0.7 || col("fraud_score") > 1.0)).count() == 0)
    assert(tx.filter(col("is_fraudulent") === false &&
      col("fraud_score") > 0.15).count() == 0)
  }

  test("deterministic: same (seed,id) yields identical rows under any partitioning") {
    val a = TransactionGen.generate(spark, 500L).collect().sortBy(_.transaction_id)
    val b = TransactionGen.generate(spark, 500L).repartition(13).collect().sortBy(_.transaction_id)
    assert(a.toSeq == b.toSeq)
  }

  test("generated data flows through the full analytics dispatcher") {
    val byCat = graft.operators.Analytics.revenueByCategory(tx)
    assert(byCat.count() == 10)
    val seg = graft.operators.Analytics.customerSegmentation(tx)
    assert(seg.select("segment").distinct().count() >= 2)
  }
}
