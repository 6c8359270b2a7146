package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.col

/** Column references for free-form tag names. gordo tags contain spaces
  * AND dots (`GRA-YE  -23-0751X.PV`, SURVEY §7.4) — a bare `col(name)`
  * parses the dot as struct-field access and fails. Every reference to a
  * tag-named data column must go through [[q]]. */
object Cols {
  def q(name: String): Column = {
    require(!name.contains("`"), s"column name may not contain backticks: $name")
    col("`" + name + "`")
  }
}
