package graft.core

import scala.collection.mutable

/** Typed configuration tree + a HOCON-subset loader (zero dependencies).
  *
  * Parity: config/AppConfig.scala:12-81 and conf/application.conf in the
  * reference — same shape (app-name / http / spark / stream / data /
  * batch blocks, kebab-case keys), same override semantics for the three
  * HOCON features the reference's conf actually uses:
  *
  *   - nested blocks (`batch { thread-pool-size = 8 }`),
  *   - substitution + string concatenation
  *     (`seed-path = ${graft.data.base-path}"/seed"`),
  *   - optional env override (`base-path = ${?GRAFT_DATA_BASE}` — applied
  *     only when the variable is set; later assignments win otherwise).
  *
  * The Kafka block is replaced by a `stream` block (JSON drop-dir file
  * source — the environment has no Kafka jars; SURVEY-sanctioned
  * substitution with identical checkpoint semantics).
  */
final case class GraftConfig(
    appName: String,
    http: GraftConfig.Http,
    spark: GraftConfig.Spark,
    stream: GraftConfig.Stream,
    data: GraftConfig.Data,
    batch: GraftConfig.Batch,
    maintenance: GraftConfig.Maintenance)

object GraftConfig {

  final case class Http(host: String, port: Int)
  final case class Spark(
      master: String, checkpointDir: String, shufflePartitions: Int,
      fairSchedulerFile: String)
  final case class Stream(dropDir: String, tableDir: String, aggDir: String, triggerSeconds: Int)
  final case class Data(
      basePath: String, batchBasePath: String, seedPath: String,
      registryDir: String)
  final case class Batch(threadPoolSize: Int, defaultPageSize: Int, maxPageSize: Int, sourcePath: String)
  /** Scheduled sink-maintenance knobs (the reference specs OPTIMIZE/VACUUM
    * as scheduled ops over its Delta sink, AGENTS.md:1162-1171): compaction
    * output-file size target, vacuum retention horizon, and the writer's
    * fileSink log compact interval the log surgery must agree with. */
  final case class Maintenance(
      targetBytes: Long, minAgeMs: Long, compactInterval: Int,
      minFilesToCompact: Int, registryRetentionMs: Long,
      layoutCols: Seq[String], layoutMode: String)

  /** The engine's defaults — the analog of the reference's
    * conf/application.conf (same numbers where the semantics carried over:
    * pool 8, page 100/10000). */
  val defaultConf: String = """
    graft {
      app-name = "GraftAnalyticsEngine"

      http {
        # Loopback by default: the facade serves unauthenticated control
        # routes (POST /stop) — widen to 0.0.0.0 only behind a gateway.
        host = "127.0.0.1"
        host = ${?GRAFT_HTTP_HOST}
        # 0 = ephemeral bind (parallel-safe for tests/e2e); set a fixed port
        # for deployments.
        port = 0
        port = ${?GRAFT_HTTP_PORT}
      }

      spark {
        master = "local[*]"
        master = ${?GRAFT_SPARK_MASTER}
        checkpoint-dir = ${graft.data.base-path}"/checkpoints"
        shuffle-partitions = 32
        fair-scheduler-file = "conf/fairscheduler.xml"
      }

      data {
        base-path = "data/graft"
        base-path = ${?GRAFT_DATA_BASE}
        batch-base-path = ${graft.data.base-path}"/batches"
        seed-path = ${graft.data.base-path}"/seed/transactions"
        # terminal batch-job records are mirrored here for crash recovery
        registry-dir = ${graft.data.base-path}"/registry"
      }

      stream {
        drop-dir = ${graft.data.base-path}"/stream/drop"
        table-dir = ${graft.data.base-path}"/stream/transactions"
        agg-dir = ${graft.data.base-path}"/stream/aggregations"
        trigger-seconds = 5
      }

      batch {
        thread-pool-size = 8
        default-page-size = 100
        max-page-size = 10000
        source-path = ${graft.stream.table-dir}
      }

      maintenance {
        # compaction rewrites a partition's visible files toward this size
        target-bytes = 134217728
        # vacuum keeps unreferenced files younger than this (an ACTIVE
        # micro-batch writes data before committing it to the log)
        min-age-ms = 86400000
        # must equal spark.sql.streaming.fileSink.log.compactInterval
        compact-interval = 10
        min-files-to-compact = 2
        # registry sweep: terminal job records older than this are pruned
        # from the recovery mirror (30 days)
        registry-retention-ms = 2592000000
        # comma-separated columns the compaction rewrite clusters each
        # partition's rows by (empty = plain coalesce, no layout shuffle);
        # layout-mode 'cluster' sorts on a key prefix, 'zorder'
        # bit-interleaves 2-4 numeric keys
        layout-cols = ""
        layout-mode = "cluster"
      }
    }
  """

  /** Load defaults, optionally overlaid with a user conf text (file
    * entries win over defaults, as HOCON's `ConfigFactory.load()` chain
    * does), resolved against `env`. */
  def load(overrides: Option[String] = None,
           env: Map[String, String] = sys.env): GraftConfig = {
    val resolver = new Resolver(
      parse(defaultConf) ++ overrides.map(parse).getOrElse(Nil), env)
    GraftConfig(
      appName = resolver.string("graft.app-name"),
      http = Http(
        host = resolver.string("graft.http.host"),
        port = resolver.int("graft.http.port")),
      spark = Spark(
        master = resolver.string("graft.spark.master"),
        checkpointDir = resolver.string("graft.spark.checkpoint-dir"),
        shufflePartitions = resolver.int("graft.spark.shuffle-partitions"),
        fairSchedulerFile = resolver.string("graft.spark.fair-scheduler-file")),
      stream = Stream(
        dropDir = resolver.string("graft.stream.drop-dir"),
        tableDir = resolver.string("graft.stream.table-dir"),
        aggDir = resolver.string("graft.stream.agg-dir"),
        triggerSeconds = resolver.int("graft.stream.trigger-seconds")),
      data = Data(
        basePath = resolver.string("graft.data.base-path"),
        batchBasePath = resolver.string("graft.data.batch-base-path"),
        seedPath = resolver.string("graft.data.seed-path"),
        registryDir = resolver.string("graft.data.registry-dir")),
      batch = Batch(
        threadPoolSize = resolver.int("graft.batch.thread-pool-size"),
        defaultPageSize = resolver.int("graft.batch.default-page-size"),
        maxPageSize = resolver.int("graft.batch.max-page-size"),
        sourcePath = resolver.string("graft.batch.source-path")),
      maintenance = Maintenance(
        targetBytes = resolver.long("graft.maintenance.target-bytes"),
        minAgeMs = resolver.long("graft.maintenance.min-age-ms"),
        compactInterval = resolver.int("graft.maintenance.compact-interval"),
        minFilesToCompact = resolver.int("graft.maintenance.min-files-to-compact"),
        registryRetentionMs = resolver.long("graft.maintenance.registry-retention-ms"),
        layoutCols = resolver.string("graft.maintenance.layout-cols")
          .split(",").map(_.trim).filter(_.nonEmpty).toSeq,
        layoutMode = resolver.string("graft.maintenance.layout-mode")))
  }

  // ------------------------------------------------------------- parsing

  /** One value segment: literal text, a `${path}` substitution, or a
    * `${?ENV}` optional env reference. A value is their concatenation. */
  private sealed trait Seg
  private final case class Lit(s: String) extends Seg
  private final case class Ref(path: String) extends Seg
  private final case class EnvRef(name: String) extends Seg

  /** Put every block brace on its own line so inline blocks
    * (`batch { size = 4 }`) parse like multi-line ones. Quote- and
    * substitution-aware: braces inside `"…"` or `${…}` are copied
    * verbatim. Runs after comment stripping. */
  private def explodeBraces(text: String): String = {
    val sb = new StringBuilder
    var i = 0
    var inQ = false
    while (i < text.length) {
      val c = text.charAt(i)
      if (c == '"') { inQ = !inQ; sb.append(c); i += 1 }
      else if (!inQ && c == '$' && i + 1 < text.length && text.charAt(i + 1) == '{') {
        val end = text.indexOf('}', i)
        val stop = if (end < 0) text.length else end + 1
        sb.append(text.substring(i, stop)); i = stop
      }
      else if (!inQ && c == '{') { sb.append("{\n"); i += 1 }
      else if (!inQ && c == '}') { sb.append("\n}\n"); i += 1 }
      else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  /** Assignments in file order (same key may repeat — later wins, except
    * unset `${?ENV}` which is skipped). */
  private def parse(text: String): List[(String, List[Seg])] = {
    val out = mutable.ListBuffer.empty[(String, List[Seg])]
    val path = mutable.Stack.empty[String]
    explodeBraces(text.linesIterator.map(stripComment).mkString("\n"))
      .linesIterator.map(_.trim).filter(_.nonEmpty).foreach {
      case line if line.endsWith("{") =>
        path.push(line.dropRight(1).trim)
      case "}" =>
        require(path.nonEmpty, "unbalanced '}' in config")
        path.pop()
      case line if line.contains("=") =>
        val Array(k, v) = line.split("=", 2)
        val key = (path.toSeq.reverse :+ k.trim).mkString(".")
        out += key -> parseValue(v.trim)
      case line =>
        throw new IllegalArgumentException(s"unparseable config line: '$line'")
    }
    require(path.isEmpty, s"unclosed block(s): ${path.mkString(".")}")
    out.toList
  }

  /** Truncate at the first '#' that is outside double quotes. */
  private def stripComment(line: String): String = {
    var inQ = false
    val i = line.indexWhere {
      case '"' => inQ = !inQ; false
      case '#' => !inQ
      case _   => false
    }
    if (i < 0) line else line.take(i)
  }

  private def parseValue(v: String): List[Seg] = {
    val segs = mutable.ListBuffer.empty[Seg]
    var i = 0
    while (i < v.length) {
      if (v.charAt(i).isWhitespace) i += 1
      else if (v.startsWith("${?", i)) {
        val end = v.indexOf('}', i)
        require(end > 0, s"unterminated substitution in '$v'")
        segs += EnvRef(v.substring(i + 3, end)); i = end + 1
      } else if (v.startsWith("${", i)) {
        val end = v.indexOf('}', i)
        require(end > 0, s"unterminated substitution in '$v'")
        segs += Ref(v.substring(i + 2, end)); i = end + 1
      } else if (v.charAt(i) == '"') {
        val end = v.indexOf('"', i + 1)
        require(end > 0, s"unterminated quote in '$v'")
        segs += Lit(v.substring(i + 1, end)); i = end + 1
      } else {
        var j = i
        while (j < v.length && !v.charAt(j).isWhitespace &&
          v.charAt(j) != '$' && v.charAt(j) != '"') j += 1
        segs += Lit(v.substring(i, j)); i = j
      }
    }
    segs.toList
  }

  private final class Resolver(
      entries: List[(String, List[Seg])], env: Map[String, String]) {
    private val byKey: Map[String, List[List[Seg]]] =
      entries.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    private val memo = mutable.Map.empty[String, String]
    private val resolving = mutable.Set.empty[String]

    def string(key: String): String = resolve(key)

    def int(key: String): Int = {
      val s = resolve(key)
      s.toIntOption.getOrElse(
        throw new IllegalArgumentException(s"config $key: '$s' is not an int"))
    }

    def long(key: String): Long = {
      val s = resolve(key)
      s.toLongOption.getOrElse(
        throw new IllegalArgumentException(s"config $key: '$s' is not a long"))
    }

    private def resolve(key: String): String = memo.getOrElseUpdate(key, {
      require(!resolving.contains(key), s"config cycle at $key")
      resolving += key
      try {
        val assignments = byKey.getOrElse(key,
          throw new IllegalArgumentException(s"missing config key: $key"))
        // last effective assignment wins; ${?ENV} is effective only when set
        val effective = assignments.reverse.find {
          case EnvRef(name) :: Nil => env.contains(name)
          case _                   => true
        }.getOrElse(throw new IllegalArgumentException(
          s"config $key: only unset env references"))
        effective.map {
          case Lit(s)       => s
          case Ref(path)    => resolve(path)
          // HOCON drops an unset ${?ENV} from a concatenation (renders as
          // ""); only a whole-value unset ref voids the assignment (handled
          // by the `effective` selection above).
          case EnvRef(name) => env.getOrElse(name, "")
        }.mkString
      } finally resolving -= key
    })
  }
}
