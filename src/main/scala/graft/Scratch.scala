package graft

import org.apache.spark.sql.SparkSession

/** Temporary probe for environment behaviors; removed before final round. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val dir = "/root/testdata/sf0.001"
    for (t <- Seq("lineitem", "orders", "events")) {
      println(s"=== $t ===")
      try {
        val df = spark.read.parquet(s"$dir/$t.parquet")
        df.printSchema()
        df.show(3, truncate = false)
      } catch { case e: Throwable => println(s"READ FAILED: ${e.getMessage.take(500)}") }
    }
    spark.stop()
  }
}
