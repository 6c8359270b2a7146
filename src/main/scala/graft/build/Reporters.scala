package graft.build

import java.nio.file.{Files, Paths}

import graft.config.Config

/** Build reporters (SURVEY K4/K5 analog; ref: Postgres upsert keyed by
  * machine name `gordo/reporters/postgres.py:62-109`, MLflow metric
  * batches `gordo/reporters/mlflow.py:194-260`).
  *
  * The engine ships a file-backed registry reporter with the same
  * contract — upsert of `{machine-name → config+metadata JSON}` — which
  * is what the reference's Postgres table stores. A JDBC-backed
  * implementation is a drop-in [[Reporter]] (`df.write.format("jdbc")`
  * or driver-side upserts); this environment has no database to test one
  * against, so none is shipped half-tested.
  */
object Reporters {

  trait Reporter {
    /** Upsert one machine's config + build metadata, keyed by name. */
    def report(name: String, machine: Map[String, Any],
               metadata: Map[String, Any]): Unit
  }

  /** Directory-of-JSON reporter: one file per machine, overwritten on
    * re-report (the upsert semantics of the reference's JSONB row). */
  class JsonDirReporter(dir: String) extends Reporter {
    def report(name: String, machine: Map[String, Any],
               metadata: Map[String, Any]): Unit = {
      Files.createDirectories(Paths.get(dir))
      Files.writeString(Paths.get(dir, s"$name.json"), Persistence.toJson(Map(
        "machine" -> machine, "metadata" -> metadata)))
    }
    def read(name: String): Map[String, Any] =
      Config.parseYaml(Files.readString(Paths.get(dir, s"$name.json")))
  }
}
