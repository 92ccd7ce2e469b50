package graft.connector

import org.apache.spark.sql.SparkSession

/** Processor registry + app assembly — the reference's plugin surface.
  *
  * `etlp.core/init` folds `{:component ::processors :ctx {...}}`
  * definitions into an app atom via the `etlp-component` multimethod,
  * then returns `(partial exec-processor app)`: callers invoke a
  * processor BY NAME with a COMMAND, routed through `invoke-connector`
  * (`::start` runs the flow, `::check` inspects the source; unknown
  * commands throw) — /root/reference/src/etlp/core.clj:16-30,111-146.
  *
  * Spark-first: the registry is immutable data (no atoms — an app is
  * assembled once and shared), a processor is a function from options to
  * a [[Connection]] (the `process-fn` closure analogue: it may close
  * over config and compiled mapping templates), and commands map to
  * Connection verbs. Nothing here touches the data path — `start` is
  * the only action, and it runs one distributed job per flow.
  */
final case class ProcessorDef(
    name: String,
    build: Map[String, String] => Connection)

/** Outcome of one command dispatch (the reference logs these;
  * a library returns them). `records` is meaningful for `start` only. */
final case class ExecResult(
    processor: String, command: String, ok: Boolean,
    detail: String, records: Long)

final class EtlpApp private (defs: Map[String, ProcessorDef]) {
  def processors: Set[String] = defs.keySet

  /** `exec-processor` analogue: look the processor up by name, build its
    * connection from the per-invocation options, dispatch the command. */
  def exec(spark: SparkSession, processor: String, command: String,
      options: Map[String, String] = Map.empty): ExecResult = {
    val pd = defs.getOrElse(processor,
      // etlp-component :default / invoke-connector :default analogues:
      // unknown names are errors, not silent no-ops
      throw new IllegalArgumentException(s"unknown processor: $processor"))
    val conn = pd.build(options)
    command match {
      case "start" =>
        val n = conn.start(spark)
        ExecResult(processor, command, ok = true, "completed", n)
      case "check" =>
        val r = conn.check(spark)
        ExecResult(processor, command, r.valid, r.message, 0L)
      case "discover" =>
        ExecResult(processor, command, ok = true,
          conn.source.discover(spark).catalogString, 0L)
      case other =>
        throw new IllegalArgumentException(s"Operation $other not supported")
    }
  }
}

object EtlpApp {
  /** `etlp.core/init` analogue: assemble an app from component defs.
    * Duplicate names are a config bug — fail at assembly, not dispatch. */
  def init(components: Seq[ProcessorDef]): EtlpApp = {
    val dup = components.groupBy(_.name).collect { case (n, ds) if ds.size > 1 => n }
    require(dup.isEmpty, s"duplicate processor names: ${dup.mkString(",")}")
    new EtlpApp(components.map(p => p.name -> p).toMap)
  }
}
