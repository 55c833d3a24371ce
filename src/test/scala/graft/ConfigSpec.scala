package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.core.GraftConfig

/** The HOCON-subset config loader: defaults, block nesting, substitution +
  * concatenation, optional env overrides, user-file overlay — the
  * reference's AppConfig tree semantics without the typesafe-config jar. */
class ConfigSpec extends AnyFunSuite {

  test("defaults load with reference values and resolved substitutions") {
    val cfg = GraftConfig.load(env = Map.empty)
    assert(cfg.appName == "GraftAnalyticsEngine")
    assert(cfg.http.host == "127.0.0.1" && cfg.http.port == 0) // loopback + ephemeral
    assert(GraftConfig.load(env = Map("GRAFT_HTTP_PORT" -> "8080")).http.port == 8080)
    assert(cfg.batch.threadPoolSize == 8)
    assert(cfg.batch.defaultPageSize == 100 && cfg.batch.maxPageSize == 10000)
    // ${graft.data.base-path}"/…" concatenation chains
    assert(cfg.data.basePath == "data/graft")
    assert(cfg.data.batchBasePath == "data/graft/batches")
    assert(cfg.spark.checkpointDir == "data/graft/checkpoints")
    // batch.source-path = ${graft.stream.table-dir} = ${base}/stream/transactions
    assert(cfg.batch.sourcePath == "data/graft/stream/transactions")
    // maintenance knobs: 128 MiB compaction target, 24 h vacuum horizon,
    // log compact interval matching Spark's fileSink default
    assert(cfg.maintenance.targetBytes == 128L * 1024 * 1024)
    assert(cfg.maintenance.minAgeMs == 24L * 3600 * 1000)
    assert(cfg.maintenance.compactInterval == 10)
    assert(cfg.maintenance.minFilesToCompact == 2)
  }

  test("optional env reference overrides only when the variable is set") {
    val unset = GraftConfig.load(env = Map.empty)
    assert(unset.data.basePath == "data/graft")
    val set = GraftConfig.load(env = Map("GRAFT_DATA_BASE" -> "/mnt/x"))
    assert(set.data.basePath == "/mnt/x")
    // substitutions chase the override
    assert(set.batch.sourcePath == "/mnt/x/stream/transactions")
    assert(set.data.seedPath == "/mnt/x/seed/transactions")
  }

  test("user overlay wins over defaults and can add substitutions") {
    val cfg = GraftConfig.load(
      overrides = Some("""
        graft {
          batch { thread-pool-size = 4 }   # fewer cores in this deployment
          data { base-path = "/srv/graft" }
        }
      """),
      env = Map.empty)
    assert(cfg.batch.threadPoolSize == 4)
    assert(cfg.data.batchBasePath == "/srv/graft/batches")
    assert(cfg.batch.defaultPageSize == 100) // untouched default survives
  }

  test("unset env ref inside a concatenation drops out (HOCON semantics)") {
    val cfg = GraftConfig.load(
      Some("""graft { data { base-path = ${?GRAFT_DEFINITELY_UNSET}"x/y" } }"""),
      env = Map.empty)
    assert(cfg.data.basePath == "x/y")
    // and a set one concatenates
    val set = GraftConfig.load(
      Some("""graft { data { base-path = ${?GRAFT_PFX}"/y" } }"""),
      env = Map("GRAFT_PFX" -> "/mnt"))
    assert(set.data.basePath == "/mnt/y")
  }

  test("substitution cycles are detected, not stack-overflowed") {
    // base-path -> batch.source-path -> stream.table-dir -> base-path
    val cyclic = """graft { data { base-path = ${graft.batch.source-path} } }"""
    val e = intercept[IllegalArgumentException](
      GraftConfig.load(Some(cyclic), env = Map.empty))
    assert(e.getMessage.contains("cycle"), e.getMessage)
  }

  test("malformed input fails loudly") {
    assertThrows[IllegalArgumentException](
      GraftConfig.load(Some("graft { no-equals-here }"), env = Map.empty))
    assertThrows[IllegalArgumentException](
      GraftConfig.load(Some("graft { http { port = not-a-number } }"), env = Map.empty))
  }
}
