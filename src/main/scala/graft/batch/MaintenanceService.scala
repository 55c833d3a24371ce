package graft.batch

import java.util.UUID
import java.util.concurrent.{ConcurrentHashMap, Executors}

import org.apache.spark.sql.SparkSession

import graft.core.GraftConfig

/** Maintenance runs as first-class registry jobs — the API form of the
  * reference's "scheduled ops" story (ref AGENTS.md:1162-1171): the same
  * OPTIMIZE/VACUUM/index-sync ops `graft.Maintain` runs from cron become
  * drivable over `POST /maintenance/run`, tracked through the SAME
  * [[BatchRegistry]] lifecycle (PENDING → RUNNING → COMPLETED/FAILED,
  * crash-persisted terminal records, `/batch/list` visibility, retention
  * pruning) as batch analytics jobs — one job surface, not a parallel one.
  *
  * The record reuses the batch shape: `analysisType` is
  * `maintenance:<mode>`, `filters` carries the mode options verbatim,
  * `rawPath` points at the ops report (one JSON object per op, the same
  * lines the CLI prints, published atomically), `rowCount` is the op
  * count. Ops execute [[graft.Maintain.runMode]] + [[graft.Maintain
  * .runSweeps]] against the LIVE registry, so an API-triggered sweep
  * prunes exactly what a restart would reload.
  *
  * Single-flight PER TABLE: maintenance rewrites files under OCC claims,
  * and two concurrent runs on one table would just abort each other
  * mid-claim — so a second submit while one is active is refused loudly
  * (409 at the route) instead of queueing a guaranteed conflict. Distinct
  * tables maintain concurrently on the pool. Ops run on daemon threads
  * tagged into the `batch` FAIR scheduler pool so streaming queries keep
  * their share while a compaction rewrites.
  */
final class MaintenanceService(
    spark: SparkSession,
    registry: BatchRegistry,
    m: GraftConfig.Maintenance,
    outputRoot: String,
    registryDir: String = "",
    poolSize: Int = 2) {

  private val executor = Executors.newFixedThreadPool(poolSize, r => {
    val t = new Thread(r, "maintenance-worker")
    t.setDaemon(true)
    t
  })
  /** table → active maintenance id (single-flight guard). */
  private val active = new ConcurrentHashMap[String, String]()

  /** Validate and launch. `opts` are the mode's named options
    * (`partCol`, `cols`, `column`, `indexDir`); they map onto
    * [[graft.Maintain.runMode]]'s positional args. Left = client error
    * (unknown mode / missing option → 400), Right(Left(activeId)) =
    * single-flight refusal (409), Right(Right(id)) = accepted. */
  def submit(
      table: String,
      mode: String,
      opts: Map[String, String]): Either[String, Either[String, String]] = {
    if (!graft.Maintain.modes.contains(mode))
      return Left(s"Unknown mode: $mode; valid: " +
        graft.Maintain.modes.toSeq.sorted.mkString(", "))
    if (table.trim.isEmpty) return Left("Missing required field: table")
    def need(k: String): Either[String, String] =
      opts.get(k).filter(_.nonEmpty).toRight(s"Mode '$mode' requires option: $k")
    val modeArgs: Either[String, Seq[String]] = mode match {
      case "stream" => Right(Seq.empty)
      case "bloom" | "stats" => need("column").map(Seq(_))
      case "zorder" =>
        for { p <- need("partCol"); c <- need("cols") }
          yield Seq(p, c) ++ opts.get("partitions").filter(_.nonEmpty)
      case "upsert" => need("partCol").map { p =>
        // positional contract is <partCol> [layoutCols] [partValues]; a
        // scoped run without layout columns ships the '-' sentinel in the
        // cols slot (= "config default"), so the scope can never silently
        // land in the wrong slot
        val cols = opts.get("cols").filter(_.nonEmpty)
        val scope = opts.get("partitions").filter(_.nonEmpty)
        Seq(p) ++ (scope match {
          case Some(s) => Seq(cols.getOrElse("-"), s)
          case None => cols.toSeq
        })
      }
      case "ivf" | "pq" | "ivfpq" | "dedup" =>
        for { p <- need("partCol"); d <- need("indexDir") } yield Seq(p, d)
      case "restore" =>
        for { p <- need("partCol"); v <- need("version"); k <- need("keys") }
          yield Seq(p, v, k)
      case "clone" | "shallow" =>
        for { p <- need("partCol"); d <- need("dstDir") }
          yield Seq(p, d) ++ opts.get("version").filter(_.nonEmpty)
      case "convert" | "reorg" | "materialize" => need("partCol").map(Seq(_))
      case "pack" => need("docsDir").map(Seq(_))
      case "packsync" =>
        for { p <- need("partCol"); d <- need("docsTable") } yield Seq(p, d)
      case "cluster" =>
        // optional cols registers/changes the CLUSTER BY spec in the same
        // call; without it the table must already be registered
        need("partCol").map(p =>
          Seq(p) ++ opts.get("cols").filter(_.nonEmpty))
      case "view" => Right(Seq.empty) // the view's registration has the rest
      case "scd2" =>
        for { p <- need("partCol"); k <- need("keys"); d <- need("dimDir") }
          yield Seq(p, k, d)
    }
    modeArgs match {
      case Left(msg) => Left(msg)
      case Right(args) =>
        val id = s"maint-${java.time.LocalDate.now()}-${UUID.randomUUID().toString.take(8)}"
        val prior = active.putIfAbsent(table, id)
        if (prior != null) return Right(Left(prior))
        // if the record write or submission itself fails (registry IO,
        // executor rejected during shutdown), release the single-flight
        // claim — otherwise every later submit for this table 409s until
        // process restart
        // direct execute, not Future(...): a rejected submission (executor
        // shut down) must throw HERE synchronously — Future.apply would
        // swallow the rejection into a failed future nobody observes,
        // leaking the claim past even this catch
        try {
          registry.put(BatchJobRecord(id,
            BatchRequest("", "", s"maintenance:$mode", opts + ("table" -> table)),
            BatchStatus.Pending, System.currentTimeMillis()))
          executor.execute(() => run(id, table, mode, args))
        } catch {
          case e: Throwable =>
            active.remove(table, id)
            throw e
        }
        Right(Right(id))
    }
  }

  private def run(id: String, table: String, mode: String, modeArgs: Seq[String]): Unit =
    try {
      spark.sparkContext.setLocalProperty("spark.scheduler.pool", "batch")
      registry.update(id)(_.copy(
        status = BatchStatus.Running, startedAt = Some(System.currentTimeMillis())))
      val ops = graft.Maintain.runMode(spark, table, mode, modeArgs, m) ++
        graft.Maintain.runSweeps(spark, table, m, registry, registryDir)
      val report = publishReport(id, ops)
      registry.update(id)(_.copy(
        status = BatchStatus.Completed, completedAt = Some(System.currentTimeMillis()),
        rowCount = Some(ops.size.toLong), rawPath = Some(report)))
    } catch {
      case e: Throwable =>
        registry.update(id)(_.copy(
          status = BatchStatus.Failed, completedAt = Some(System.currentTimeMillis()),
          error = Some(Option(e.getMessage).getOrElse(e.toString))))
    } finally {
      // release only our own claim (a Failed submit never inserted one)
      active.remove(table, id)
      ()
    }

  /** Ops report on local disk, published atomically (tmp + ATOMIC_MOVE) so
    * a status poller racing the final transition reads a complete JSON
    * array or nothing, never a torn file. */
  private def publishReport(id: String, ops: Seq[String]): String = {
    val dir = java.nio.file.Paths.get(outputRoot)
    java.nio.file.Files.createDirectories(dir)
    val tmp = java.nio.file.Files.createTempFile(dir, s".$id", ".tmp")
    java.nio.file.Files.writeString(tmp, ops.mkString("[", ",", "]"))
    val out = dir.resolve(s"$id.ops.json")
    java.nio.file.Files.move(tmp, out,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    out.toString
  }

  def shutdown(): Unit = executor.shutdown()
}
