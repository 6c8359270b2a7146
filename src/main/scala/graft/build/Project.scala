package graft.build

import java.util.concurrent.Executors

import scala.concurrent.{Await, ExecutionContext, Future}
import scala.concurrent.duration.Duration

import org.apache.spark.sql.DataFrame

import graft.config.Config

/** Project layer (SURVEY §3.2): a project config declares N machines +
  * globals; "workflow generate" becomes emitting a build plan (JSON)
  * instead of Argo k8s YAML, and the Argo DAG of builder pods becomes
  * parallel driver threads sharing one SparkSession (fair-scheduler
  * pools). The ≤30-machines-per-workflow split of
  * `gordo/cli/workflow_generator.py:187-196` is kept as plan chunking.
  */
object Project {

  case class ProjectSpec(projectName: String,
                         globals: Map[String, Any],
                         machines: Seq[Config.MachineSpec])

  def parse(yaml: String, projectName: String): ProjectSpec = {
    val root = Config.parseYaml(yaml)
    // explicit null (`globals:`) means none; a scalar globals block or a
    // non-mapping machine entry is a config ERROR — the raw asInstanceOf
    // was an anonymous NPE/ClassCastException on user YAML
    val globals = root.get("globals") match {
      case None | Some(null) => Map.empty[String, Any]
      case Some(m: Map[_, _]) => m.asInstanceOf[Map[String, Any]]
      case Some(other) => throw new Config.ConfigException(
        s"globals must be a mapping, got: $other")
    }
    val machines = root.getOrElse("machines",
      throw new Config.ConfigException("project has no machines")) match {
      case l: List[_] => l.map {
        case m: Map[_, _] => Config.machineFromConfig(
          m.asInstanceOf[Map[String, Any]], Some(projectName), globals)
        case other => throw new Config.ConfigException(
          s"each machine must be a mapping, got: $other")
      }
      case other => throw new Config.ConfigException(s"machines must be a list: $other")
    }
    val dup = machines.groupBy(_.name).collect { case (n, ms) if ms.size > 1 => n }
    if (dup.nonEmpty)
      throw new Config.ConfigException(s"duplicate machine names: $dup")
    ProjectSpec(projectName, globals, machines)
  }

  /** The build plan: machine list with cache keys, chunked into
    * workflows of ≤ `maxPerWorkflow`. `closedForm` must match the
    * intended [[buildAll]] run — the two modes key the registry
    * differently (a closed-form build never aliases a full build), and
    * a plan emitted with the wrong mode would misreport every key any
    * registry tooling pre-checks against. */
  def plan(spec: ProjectSpec, maxPerWorkflow: Int = 30,
           closedForm: Boolean = false): String = {
    val chunks = spec.machines.grouped(maxPerWorkflow).toSeq
    Persistence.toJson(Map(
      "project_name" -> spec.projectName,
      "n_machines" -> spec.machines.size,
      "closed_form" -> closedForm,
      "workflows" -> chunks.zipWithIndex.map { case (ms, i) =>
        Map("workflow" -> i,
          "machines" -> ms.map(m => Map(
            "name" -> m.name,
            "cache_key" -> Persistence.cacheKey(m, closedForm))))
      }))
  }

  /** Build every machine of the project in parallel driver threads over
    * a shared long frame. Spark schedules the concurrent jobs across the
    * cluster; per-machine state (fit aggregations) is tiny. */
  def buildAll(spec: ProjectSpec, long: DataFrame, keyCol: String,
               tsCol: String, valueCol: String, outputRoot: String,
               registryDir: Option[String] = None,
               parallelism: Int = 4,
               closedForm: Boolean = false): Seq[ModelBuilder.BuildResult] = {
    val pool = Executors.newFixedThreadPool(math.max(1, parallelism))
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    try {
      val futures = spec.machines.map { m =>
        Future {
          ModelBuilder.buildSpec(m, long, keyCol, tsCol, valueCol,
            outputDir = s"$outputRoot/${m.name}",
            registryDir = registryDir, closedForm = closedForm)
        }
      }
      Await.result(Future.sequence(futures), Duration.Inf)
    } catch { case e: Throwable =>
      // fail-fast must not return while sibling builds are still
      // WRITING: plain shutdown() runs every queued build and lets
      // in-flight ones finish in the background, so a caller that
      // retries or cleans outputRoot/registry after catching would race
      // half-written model dirs. Drop the QUEUED builds (never started,
      // nothing torn), let the in-flight ones COMPLETE their writes
      // (shutdownNow's interrupt could tear a dir mid-save), and only
      // then rethrow.
      pool match {
        case tp: java.util.concurrent.ThreadPoolExecutor =>
          tp.getQueue.clear()
        case _ => ()
      }
      pool.shutdown()
      pool.awaitTermination(1, java.util.concurrent.TimeUnit.HOURS): Unit
      throw e
    } finally pool.shutdown()
  }
}
