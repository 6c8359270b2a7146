package graft.build

import java.nio.file.{Files, Paths}

import graft.config.Config

/** Build reporters (SURVEY K4/K5; ref: Postgres upsert keyed by
  * machine name `gordo/reporters/postgres.py:62-109`, MLflow metric
  * batches `gordo/reporters/mlflow.py:194-260`).
  *
  * Two implementations of the same contract — upsert of one machine's
  * config + build metadata keyed by name: a directory-of-JSON registry
  * and a real JDBC reporter mirroring the reference's `machine` table
  * (name unique, dataset/model/metadata as JSON columns). The JDBC
  * reporter is database-agnostic driver-side SQL; tests run it against
  * embedded Derby (on Spark's classpath), production points the URL at
  * Postgres or anything else with a JDBC driver.
  */
object Reporters {

  class ReporterException(msg: String, cause: Throwable)
      extends RuntimeException(msg, cause)

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

  /** K4: JDBC reporter — the reference's `machine` table
    * (`postgres.py:96-109`: name indexed unique; dataset, model, metadata
    * JSON) with its select-then-update-or-insert upsert inside one
    * transaction (`postgres.py:75-95` `db.atomic()` + peewee
    * get/DoesNotExist). Plain JDBC so the URL picks the engine; JSON
    * rides in CLOB/TEXT columns (the portable spelling of JSONB).
    *
    * Driver-side by design, like the reference: one row per machine
    * build, written by the build orchestrator — not a Spark sink. */
  class JdbcReporter(url: String) extends Reporter with AutoCloseable {
    private val conn =
      try java.sql.DriverManager.getConnection(url)
      catch { case e: Exception =>
        throw new ReporterException(s"cannot connect to $url", e) }
    locally {
      // Machine.create_table(safe=True): create if missing. Table lookup
      // is case-normalized per engine (Derby upper-cases identifiers).
      val tables = conn.getMetaData.getTables(null, null, "%", null)
      var exists = false
      try while (tables.next())
        exists ||= tables.getString("TABLE_NAME").equalsIgnoreCase("machine")
      finally tables.close()
      if (!exists) {
        val st = conn.createStatement()
        try st.executeUpdate(
          "CREATE TABLE machine (name VARCHAR(63) NOT NULL UNIQUE, " +
            "dataset CLOB, model CLOB, metadata CLOB)")
        finally st.close()
      }
    }

    def report(name: String, machine: Map[String, Any],
               metadata: Map[String, Any]): Unit = synchronized {
      val dataset = Persistence.toJson(machine.getOrElse("dataset", Map.empty))
      val model = Persistence.toJson(machine.getOrElse("model", Map.empty))
      val meta = Persistence.toJson(metadata)
      conn.setAutoCommit(false)
      try {
        val sel = conn.prepareStatement(
          "SELECT 1 FROM machine WHERE name = ?")
        val found =
          try { sel.setString(1, name); val rs = sel.executeQuery()
            try rs.next() finally rs.close() }
          finally sel.close()
        val up =
          if (found) conn.prepareStatement(
            "UPDATE machine SET dataset = ?, model = ?, metadata = ? WHERE name = ?")
          else conn.prepareStatement(
            "INSERT INTO machine (dataset, model, metadata, name) VALUES (?, ?, ?, ?)")
        try {
          up.setString(1, dataset); up.setString(2, model)
          up.setString(3, meta); up.setString(4, name)
          up.executeUpdate()
        } finally up.close()
        conn.commit()
      } catch { case e: Exception =>
        conn.rollback()
        throw new ReporterException(s"report of '$name' failed", e)
      } finally conn.setAutoCommit(true)
    }

    /** Read one machine row back as (dataset, model, metadata) maps. */
    def read(name: String): Map[String, Any] = synchronized {
      val st = conn.prepareStatement(
        "SELECT dataset, model, metadata FROM machine WHERE name = ?")
      try {
        st.setString(1, name)
        val rs = st.executeQuery()
        try {
          if (!rs.next())
            throw new ReporterException(s"no machine row: $name", null)
          Map("dataset" -> Config.parseYaml(rs.getString(1)),
            "model" -> Config.parseYaml(rs.getString(2)),
            "metadata" -> Config.parseYaml(rs.getString(3)))
        } finally rs.close()
      } finally st.close()
    }

    def close(): Unit = conn.close()
  }
}
