package graft.build

import org.apache.spark.sql.DataFrame

/** Response encodings (SURVEY K2/K3): the anomaly frame serialized for
  * clients. Parquet is just `df.write.parquet` (K3, native); JSON is the
  * reference's nested dict `{group: {tag: {ts: value}}}` flattening of
  * the two-level column namespace (`gordo/server/utils.py:86-142`).
  *
  * JSON assembly collects to the driver — by design: serving responses
  * are bounded request windows, not datasets (the reference serves the
  * same shape from a Flask worker).
  */
object Responses {

  /** Split a flat `"group.tag"` column name back into (group, tag);
    * single-level columns (start/end/total-*) become (name, ""). */
  def splitName(c: String): (String, String) = c.indexOf('.') match {
    case -1 => (c, "")
    case i  => (c.substring(0, i), c.substring(i + 1))
  }

  /** Nested-dict JSON of the frame keyed by the `start` column (the
    * DatetimeIndex analog — which, like a DatetimeIndex, cannot hold a
    * null: a null start would otherwise NPE here or silently collide
    * rows under one "null" key). */
  def toNestedJson(frame: DataFrame): String = {
    val cols = frame.columns.filterNot(c => c == "start" || c == "end")
    val rows = frame.select(
      org.apache.spark.sql.functions.col("start") +:
        cols.toSeq.map(graft.Cols.q): _*)
      .collect()
    require(rows.forall(!_.isNullAt(0)),
      "toNestedJson: the start column is the response index and may not " +
        "contain nulls — drop or repair null-start rows before encoding")
    // duplicate start values would silently collapse under toMap below
    // (last row wins, one point lost per tag with no error) — a
    // DatetimeIndex response has unique timestamps; reject like nulls
    require(rows.map(_.get(0)).distinct.length == rows.length,
      "toNestedJson: duplicate start values — the start column is the " +
        "response index and must be unique; de-duplicate upstream")
    val byGroup: Map[String, Map[String, Map[String, Any]]] =
      cols.toSeq.map { c =>
        val (group, tag) = splitName(c)
        (c, group, if (tag.isEmpty) "value" else tag)
      }.groupBy(_._2).map { case (group, gcols) =>
        group -> gcols.map { case (c, _, tag) =>
          tag -> rows.map(r =>
            r.get(0).toString -> r.getAs[Any](c)).toMap.asInstanceOf[Map[String, Any]]
        }.toMap
      }
    Persistence.toJson(byGroup)
  }
}
