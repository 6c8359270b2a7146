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

  // ---- K5: MLflow-shaped metric batches (`gordo/reporters/mlflow.py`) ----

  /** One logged metric point (`mlflow.entities.Metric`): step indexes
    * fold or epoch series; summary stats log at step 0. */
  case class Metric(key: String, value: Double, timestamp: Long, step: Int)

  /** One logged parameter (`mlflow.entities.Param`): always a string. */
  case class Param(key: String, value: String)

  /** `get_machine_log_items(machine)` (`mlflow.py:194-260`): flatten the
    * builder's nested metadata into flat Metric/Param lists.
    *
    * Same walk as the reference: project/name params; the five dataset
    * params; model provenance params; CV split metadata as params; per
    * CV metric the four fold summary stats (step 0) then one point per
    * fold (step = fold − 1); training-history series one point per epoch
    * plus the history params and the training-duration metric. Per-tag
    * score keys are skipped like the reference ("too many params for
    * MLflow"). `timestamp` is caller-provided (the reference stamps
    * `epoch_now()`) so tests and re-reports are deterministic.
    */
  def machineLogItems(metadata: Map[String, Any],
                      timestamp: Long): (Seq[Metric], Seq[Param]) = {
    def sub(m: Map[String, Any], k: String): Map[String, Any] =
      m.getOrElse(k, Map.empty) match {
        case mm: Map[_, _] => mm.asInstanceOf[Map[String, Any]]
        case _ => Map.empty
      }
    val dataset = sub(metadata, "dataset")
    val model = sub(metadata, "model")
    val cv = sub(model, "cross_validation")

    val params = Seq.newBuilder[Param]
    for (k <- Seq("project_name", "name"); v <- metadata.get(k))
      params += Param(k, String.valueOf(v))
    for (k <- Seq("train_start_date", "train_end_date", "resolution",
        "row_filter", "row_filter_buffer_size"); v <- dataset.get(k))
      params += Param(k, String.valueOf(v))
    for (k <- Seq("model_creation_date", "model_builder_version",
        "model_offset"); v <- model.get(k))
      params += Param(k, String.valueOf(v))
    for ((k, v) <- sub(cv, "splits").toSeq.sortBy(_._1))
      params += Param(k, String.valueOf(v))

    val metrics = Seq.newBuilder[Metric]
    // tag names whose per-tag score keys are skipped (mlflow.py:236-238;
    // substring match like the reference's `extract_tag_name(t) in k`).
    // Normalized to hyphens because the builder emits score keys through
    // name.replace("_", "-") — a raw underscore tag would never match
    // its own per-tag key
    val tagNames = (dataset.get("tag_list") match {
      case Some(l: List[_]) => l.map(_.toString)
      case _ => Nil
    }).map(_.replace("_", "-"))
    val scores = sub(cv, "scores")
    val subkeys = Seq("mean", "max", "min", "std")
    for (k <- scores.keys.toSeq.sorted if !tagNames.exists(k.contains)) {
      val perKey = scores(k).asInstanceOf[Map[String, Any]]
        .map { case (kk, v) => kk -> String.valueOf(v).toDouble }
      for (sk <- subkeys; v <- perKey.get(s"fold-$sk"))
        metrics += Metric(s"$k-$sk", v, timestamp, 0)
      val nFolds = perKey.size - subkeys.count(sk => perKey.contains(s"fold-$sk"))
      for (i <- 0 until nFolds; v <- perKey.get(s"fold-${i + 1}"))
        metrics += Metric(k, v, timestamp, i)
    }
    // fit history (mlflow.py:258-277): guarded exactly like the reference
    // — no history key, no fit metrics
    val history = sub(model, "history")
    if (history.contains("params")) {
      for (v <- model.get("model_training_duration_sec"))
        metrics += Metric("model_training_duration_sec",
          String.valueOf(v).toDouble, timestamp, 0)
      for ((m, vs) <- history.toSeq.sortBy(_._1) if m != "params") vs match {
        case l: List[_] => l.zipWithIndex.foreach { case (v, i) =>
          metrics += Metric(m, String.valueOf(v).toDouble, timestamp, i) }
        case _ => ()
      }
      for ((k, v) <- sub(history, "params").toSeq.sortBy(_._1))
        params += Param(k, String.valueOf(v))
    }
    (metrics.result(), params.result())
  }

  /** `batch_log_items` (`mlflow.py:282-345`): split to batches under the
    * per-request limits (AzureML's 200 metrics / MLflow's 100 params per
    * batch). Returns (metrics, params) slices, at least one batch. */
  def batchLogItems(metrics: Seq[Metric], params: Seq[Param],
                    nMaxMetrics: Int = 200, nMaxParams: Int = 100)
      : Seq[(Seq[Metric], Seq[Param])] = {
    def nBatches(n: Int, nMax: Int) = n / nMax + (if (n % nMax != 0) 1 else 0)
    val n = math.max(1,
      math.max(nBatches(metrics.size, nMaxMetrics), nBatches(params.size, nMaxParams)))
    (0 until n).map { i =>
      (metrics.slice(i * nMaxMetrics, (i + 1) * nMaxMetrics),
        params.slice(i * nMaxParams, (i + 1) * nMaxParams))
    }
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
    locally {
      // embedded Derby writes derby.log into derby.system.home (the
      // process CWD when unset — polluting the caller's directory on
      // every gated-query run); pin it to scratch unless the caller
      // already chose a home
      if (url.startsWith("jdbc:derby:") &&
          System.getProperty("derby.system.home") == null)
        System.setProperty("derby.system.home", graft.Scratch.dir("graft-derby"))
    }
    private val conn =
      try java.sql.DriverManager.getConnection(url)
      catch { case e: Exception =>
        throw new ReporterException(s"cannot connect to $url", e) }
    /** Case-normalized existence probe RESTRICTED to the connection's
      * own schema (Derby upper-cases identifiers; getSchema gives e.g.
      * "APP"): an unrestricted getTables(null, null, ...) would see a
      * same-named table owned by another application in another schema,
      * skip creation, and every later statement — which resolves in the
      * CURRENT schema — would fail "table does not exist" forever. A
      * driver that cannot report its schema falls back to the
      * all-schemas scan. The catch is NARROW — SQLException (driver
      * reports it can't) and AbstractMethodError (pre-JDBC-4.1 driver
      * without getSchema) are the realistic failures; fatal JVM errors
      * (OOM, linkage) must propagate, not degrade into a scan. */
    private def tableExists(table: String): Boolean = {
      val schema =
        try conn.getSchema
        catch {
          case _: java.sql.SQLException => null
          case _: AbstractMethodError => null
        }
      val tables = conn.getMetaData.getTables(null, schema, "%", null)
      try {
        var exists = false
        while (tables.next())
          exists ||= tables.getString("TABLE_NAME").equalsIgnoreCase(table)
        exists
      } finally tables.close()
    }

    locally {
      // Machine.create_table(safe=True): create if missing.
      if (!tableExists("machine")) {
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
      } catch {
        case e: java.sql.SQLIntegrityConstraintViolationException =>
          // lost the select-then-insert race to ANOTHER reporter
          // instance/process (the per-instance lock cannot cover those):
          // the row exists now, so the upsert contract says overwrite —
          // retry once as UPDATE instead of failing the report
          conn.rollback()
          try {
            val up2 = conn.prepareStatement(
              "UPDATE machine SET dataset = ?, model = ?, metadata = ? WHERE name = ?")
            val updated =
              try {
                up2.setString(1, dataset); up2.setString(2, model)
                up2.setString(3, meta); up2.setString(4, name)
                up2.executeUpdate()
              } finally up2.close()
            // 0 rows means the racing inserter's row is GONE (its
            // transaction rolled back after raising our violation, or a
            // third party deleted it) — committing here would silently
            // drop this report and a later read(name) would throw.
            // Re-insert; a second violation (yet another racer) is a
            // genuine repeated race and fails loudly below.
            if (updated == 0) {
              val ins2 = conn.prepareStatement(
                "INSERT INTO machine (dataset, model, metadata, name) VALUES (?, ?, ?, ?)")
              try {
                ins2.setString(1, dataset); ins2.setString(2, model)
                ins2.setString(3, meta); ins2.setString(4, name)
                ins2.executeUpdate(): Unit
              } finally ins2.close()
            }
            conn.commit()
          } catch { case e2: Exception =>
            conn.rollback()
            throw new ReporterException(
              s"report of '$name' failed after insert-race retry", e2)
          }
        case e: Exception =>
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

    /** K5: upsert one machine's flattened metric batch. One row per
      * Metric (kind='metric': value + step) or Param (kind='param':
      * text value, step 0), `batch` recording which log request the row
      * rode in (`batch_log_items` slicing). Re-report replaces the
      * machine's rows in the same transaction — the run-scoped upsert of
      * a re-logged MLflow run. */
    def reportMetrics(name: String, metrics: Seq[Metric], params: Seq[Param],
                      nMaxMetrics: Int = 200, nMaxParams: Int = 100): Unit =
      synchronized {
        ensureMetricTable()
        conn.setAutoCommit(false)
        try {
          val del = conn.prepareStatement(
            "DELETE FROM metric_batch WHERE name = ?")
          try { del.setString(1, name); del.executeUpdate() } finally del.close()
          val ins = conn.prepareStatement(
            "INSERT INTO metric_batch (name, batch, kind, item_key, " +
              "num_value, text_value, step, ts) VALUES (?, ?, ?, ?, ?, ?, ?, ?)")
          try {
            val batches = batchLogItems(metrics, params, nMaxMetrics, nMaxParams)
            for (((ms, ps), b) <- batches.zipWithIndex) {
              for (m <- ms) {
                ins.setString(1, name); ins.setInt(2, b)
                ins.setString(3, "metric"); ins.setString(4, m.key)
                ins.setDouble(5, m.value)
                ins.setNull(6, java.sql.Types.VARCHAR)
                ins.setInt(7, m.step); ins.setLong(8, m.timestamp)
                ins.addBatch()
              }
              for (p <- ps) {
                ins.setString(1, name); ins.setInt(2, b)
                ins.setString(3, "param"); ins.setString(4, p.key)
                ins.setNull(5, java.sql.Types.DOUBLE)
                ins.setString(6, p.value)
                ins.setInt(7, 0); ins.setLong(8, 0L)
                ins.addBatch()
              }
            }
            ins.executeBatch()
          } finally ins.close()
          conn.commit()
        } catch { case e: Exception =>
          conn.rollback()
          throw new ReporterException(s"metric report of '$name' failed", e)
        } finally conn.setAutoCommit(true)
      }

    /** Read one machine's metric batch back:
      * (batch, kind, key, numValue, textValue, step). */
    def readMetrics(name: String): Seq[(Int, String, String, Option[Double], Option[String], Int)] =
      synchronized {
        ensureMetricTable()
        val st = conn.prepareStatement(
          "SELECT batch, kind, item_key, num_value, text_value, step " +
            "FROM metric_batch WHERE name = ? ORDER BY batch, kind, item_key, step")
        try {
          st.setString(1, name)
          val rs = st.executeQuery()
          val out = Seq.newBuilder[(Int, String, String, Option[Double], Option[String], Int)]
          try while (rs.next()) {
            val num = rs.getDouble(4)
            val numOpt = if (rs.wasNull()) None else Some(num)
            out += ((rs.getInt(1), rs.getString(2), rs.getString(3),
              numOpt, Option(rs.getString(5)), rs.getInt(6)))
          } finally rs.close()
          out.result()
        } finally st.close()
      }

    private def ensureMetricTable(): Unit = {
      if (!tableExists("metric_batch")) {
        val st = conn.createStatement()
        try st.executeUpdate(
          "CREATE TABLE metric_batch (name VARCHAR(63) NOT NULL, " +
            "batch INT NOT NULL, kind VARCHAR(6) NOT NULL, " +
            "item_key VARCHAR(255) NOT NULL, num_value DOUBLE, " +
            "text_value VARCHAR(4000), step INT NOT NULL, ts BIGINT NOT NULL)")
        finally st.close()
      }
    }

    def close(): Unit = conn.close()
  }
}
