package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.batch._

/** Table-feature protocol gating (the Delta protocol-versioning analog):
  * every feature-introducing verb auto-declares its feature at the right
  * level, and a table carrying a feature this build does not know is
  * refused — loudly, naming the feature — at the right surface (reads
  * for reader-level, writes for every level). */
class FeatureGateSpec extends SparkSpec {

  private def tmp(p: String): String =
    Files.createTempDirectory(p).toString + "/t"

  private def mkTable(): String = {
    val t = tmp("fg")
    import spark.implicits._
    Upsert.mergeByKey(spark, t,
      Seq(("d1", 1L, 10L, "n1", "x"), ("d1", 2L, 20L, "n2", "y"),
        ("d2", 3L, 30L, "n3", "z"))
        .toDF("day", "k", "v", "note", "extra"),
      "day", Seq("k"))
    t
  }

  test("verbs auto-declare the features they introduce, at the right level") {
    import spark.implicits._
    val t = mkTable()
    val base = TableFeatures.features(spark, t)
    assert(base.get(TableFeatures.InCommitTimestamps).contains("writer"),
      s"every managed table's commits carry ICT: $base")
    assert(base.get(TableFeatures.ChangeDataFeed).contains("writer"),
      s"the feed rides the merge by default: $base")
    Constraints.add(spark, t, "pos", "v >= 0")
    GeneratedColumns.add(spark, t, "note", "concat('n', k)")
    ColumnMapping.rename(spark, t, "extra", "extra2")
    RowTracking.enable(spark, t, "day", Seq("k"))
    DeletionVectors.deleteVectored(spark, t,
      Seq(("d2", 3L)).toDF("day", "k"), "day", Seq("k"))
    LiquidClustering.setClusterBy(spark, t, Seq("v"))
    TypeWidening.widen(spark, t, "day", "v",
      org.apache.spark.sql.types.DecimalType(19, 0))
    val f = TableFeatures.features(spark, t)
    val want = Map(
      TableFeatures.CheckConstraints -> "writer",
      TableFeatures.GeneratedColumns -> "writer",
      TableFeatures.ColumnMapping -> "reader",
      TableFeatures.RowTracking -> "writer",
      TableFeatures.Identity -> "writer", // row tracking rides identity
      TableFeatures.DeletionVectors -> "reader",
      TableFeatures.Clustering -> "writer",
      // reader: mixed-width partitions need the registry's per-dir
      // upcast legs — an unaware single read fails the footer merge
      TableFeatures.TypeWideningFeature -> "reader")
    want.foreach { case (feat, level) =>
      assert(f.get(feat).contains(level), s"$feat should be $level in $f")
    }
    // and this build reads/writes its own tables, obviously
    TableFeatures.checkRead(spark, t)
    TableFeatures.checkWrite(spark, t)
  }

  test("a refused DDL declares nothing") {
    val t = mkTable()
    intercept[IllegalArgumentException] {
      Constraints.add(spark, t, "bad", "v >= 1000") // existing rows violate
    }
    assert(!TableFeatures.features(spark, t)
      .contains(TableFeatures.CheckConstraints),
      "validate-before-declare: a refused constraint must not gate anyone")
  }

  test("an unknown READER-level feature refuses reads and writes, naming it") {
    import spark.implicits._
    val t = mkTable()
    TableFeaturesTestHook.declareRaw(spark, t, "vector-clock-v9", "reader")
    val eR = intercept[IllegalStateException] {
      Upsert.readCommitted(spark, t, "day").count()
    }
    assert(eR.getMessage.contains("vector-clock-v9") &&
      eR.getMessage.contains("READ"), eR.getMessage)
    val eT = intercept[IllegalStateException] {
      Upsert.readAsOf(spark, t, 1L, "day").count()
    }
    assert(eT.getMessage.contains("vector-clock-v9"), eT.getMessage)
    val eW = intercept[IllegalStateException] {
      Upsert.mergeByKey(spark, t,
        Seq(("d1", 9L, 90L, "n9", "q")).toDF("day", "k", "v", "note", "extra"),
        "day", Seq("k"))
    }
    assert(eW.getMessage.contains("vector-clock-v9") &&
      eW.getMessage.contains("WRITE"), eW.getMessage)
  }

  test("an unknown WRITER-level feature allows reads but refuses every write verb") {
    import spark.implicits._
    val t = mkTable()
    TableFeaturesTestHook.declareRaw(spark, t, "future-codec", "writer")
    assert(Upsert.readCommitted(spark, t, "day").count() == 3L,
      "writer-level gates must not block reads")
    val e1 = intercept[IllegalStateException] {
      Upsert.mergeByKey(spark, t,
        Seq(("d1", 9L, 90L, "n9", "q")).toDF("day", "k", "v", "note", "extra"),
        "day", Seq("k"))
    }
    assert(e1.getMessage.contains("future-codec"), e1.getMessage)
    val e2 = intercept[IllegalStateException] {
      DeletionVectors.deleteVectored(spark, t,
        Seq(("d1", 1L)).toDF("day", "k"), "day", Seq("k"))
    }
    assert(e2.getMessage.contains("future-codec"), e2.getMessage)
    val e3 = intercept[IllegalStateException] {
      Upsert.deleteByKey(spark, t,
        Seq(("d1", 1L)).toDF("day", "k"), "day", Seq("k"))
    }
    assert(e3.getMessage.contains("future-codec"), e3.getMessage)
  }

  test("an unknown LEVEL string is conservative: it gates reads too") {
    val t = mkTable()
    TableFeaturesTestHook.declareRaw(spark, t, "strange-thing", "quantum")
    val e = intercept[IllegalStateException] {
      Upsert.readCommitted(spark, t, "day").count()
    }
    assert(e.getMessage.contains("strange-thing"), e.getMessage)
  }

  test("CLONE carries the feature declarations (the gate travels with the bytes)") {
    val t = mkTable()
    Constraints.add(spark, t, "pos", "v >= 0")
    LiquidClustering.setClusterBy(spark, t, Seq("v"))
    val dst = tmp("fgclone")
    Upsert.cloneTo(spark, t, dst, "day")
    val f = TableFeatures.features(spark, dst)
    assert(f.contains(TableFeatures.CheckConstraints) &&
      f.contains(TableFeatures.Clustering) &&
      f.contains(TableFeatures.InCommitTimestamps),
      s"clone must carry the registry: $f")
  }

  test("declare refuses names this build does not support") {
    val t = mkTable()
    val e = intercept[IllegalArgumentException] {
      TableFeatures.declare(spark, t, "made-up-feature")
    }
    assert(e.getMessage.contains("made-up-feature"), e.getMessage)
  }

  test("DROP FEATURE: refused while residue remains, legal once cleared") {
    val t = mkTable()
    Constraints.add(spark, t, "pos", "v >= 0")
    val e = intercept[IllegalStateException] {
      TableFeatures.dropFeature(spark, t, TableFeatures.CheckConstraints)
    }
    assert(e.getMessage.contains("pos"),
      s"the refusal must NAME the remaining constraint: ${e.getMessage}")
    Constraints.drop(spark, t, "pos")
    TableFeatures.dropFeature(spark, t, TableFeatures.CheckConstraints)
    assert(!TableFeatures.features(spark, t)
      .contains(TableFeatures.CheckConstraints),
      "dropped feature must leave the declaration")
    // re-introduction re-declares — accumulation is always safe
    Constraints.add(spark, t, "pos2", "v >= 0")
    assert(TableFeatures.features(spark, t)
      .contains(TableFeatures.CheckConstraints),
      "a later ADD CONSTRAINT must re-declare the feature")
  }

  test("DROP FEATURE clustering: CLUSTER BY NONE is the clearing verb") {
    val t = mkTable()
    LiquidClustering.setClusterBy(spark, t, Seq("v"))
    val e = intercept[IllegalStateException] {
      TableFeatures.dropFeature(spark, t, TableFeatures.Clustering)
    }
    assert(e.getMessage.contains("clusterByNone"), e.getMessage)
    LiquidClustering.clusterByNone(spark, t)
    assert(LiquidClustering.clusterSpec(spark, t).isEmpty)
    TableFeatures.dropFeature(spark, t, TableFeatures.Clustering)
    assert(!TableFeatures.features(spark, t)
      .contains(TableFeatures.Clustering))
  }

  test("DROP FEATURE deletion-vectors: REORG + vacuum clears the residue") {
    import spark.implicits._
    val t = mkTable()
    DeletionVectors.deleteVectored(spark, t,
      Seq(("d1", 1L)).toDF("day", "k"), "day", Seq("k"))
    val e = intercept[IllegalStateException] {
      TableFeatures.dropFeature(spark, t, TableFeatures.DeletionVectors)
    }
    assert(e.getMessage.contains("deletion-vector") &&
      e.getMessage.contains("reorgPurge"), e.getMessage)
    assert(Upsert.reorgPurge(spark, t, "day") == Seq("d1"))
    Upsert.vacuumHistory(spark, t, minAgeMs = 0L)
    TableFeatures.dropFeature(spark, t, TableFeatures.DeletionVectors)
    assert(!TableFeatures.features(spark, t)
      .contains(TableFeatures.DeletionVectors))
    // and the table still reads exactly right after the downgrade
    assert(Upsert.readCommitted(spark, t, "day")
      .select("k").as[Long].collect().sorted.toSeq == Seq(2L, 3L))
  }

  test("DROP FEATURE refusals: ICT is structural; CDF names its sweep; " +
      "row tracking is permanent; undeclared drops are loud") {
    val t = mkTable()
    val eIct = intercept[IllegalStateException] {
      TableFeatures.dropFeature(spark, t, TableFeatures.InCommitTimestamps)
    }
    assert(eIct.getMessage.contains("structural"), eIct.getMessage)
    val eCdf = intercept[IllegalStateException] {
      TableFeatures.dropFeature(spark, t, TableFeatures.ChangeDataFeed)
    }
    assert(eCdf.getMessage.contains("vacuumHistory"), eCdf.getMessage)
    RowTracking.enable(spark, t, "day", Seq("k"))
    val eRt = intercept[IllegalStateException] {
      TableFeatures.dropFeature(spark, t, TableFeatures.RowTracking)
    }
    assert(eRt.getMessage.contains("permanent"), eRt.getMessage)
    val eUndeclared = intercept[IllegalArgumentException] {
      TableFeatures.dropFeature(spark, t, TableFeatures.ColumnMapping)
    }
    assert(eUndeclared.getMessage.contains("nothing to drop"),
      eUndeclared.getMessage)
    val eUnknown = intercept[IllegalArgumentException] {
      TableFeatures.dropFeature(spark, t, "made-up-feature")
    }
    assert(eUnknown.getMessage.contains("made-up-feature"), eUnknown.getMessage)
  }
}
