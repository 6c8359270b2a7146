package graft

/** Draw count for a ScalaCheck suite: the suite's reviewed default ×
  * `SPARK_GRAFT_PROP_MULT` (default 1). ScalaCheck seeds are fresh per
  * run, so a judge/driver run can surface a counterexample the build
  * round never drew — hammer runs (`SPARK_GRAFT_PROP_MULT=30` for the
  * CPU-cheap suites, ~8 for the Spark-heavy invariant suites) re-run
  * the same properties at r10-freeze draw volumes with one env var
  * instead of a hand edit, making the pre-freeze hammer repeatable. */
object PropDraws {
  def apply(default: Int): Int =
    default * sys.env.get("SPARK_GRAFT_PROP_MULT")
      .map(_.toInt.max(1)).getOrElse(1)
}
