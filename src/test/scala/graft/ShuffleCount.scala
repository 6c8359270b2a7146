package graft

/** Dev-only helper: print each registered query's pre-execution Exchange
  * count at sf0.001 — the raw material for reviewing and extending
  * PlanGuardSpec's pinned shuffle budgets.
  * Run: `sbt "Test/runMain graft.ShuffleCount [query...]"`. */
object ShuffleCount {
  def main(args: Array[String]): Unit = {
    val spark = SparkTestSession.spark
    val sf = "/root/testdata/sf0.001"
    val names =
      if (args.nonEmpty) args.toSeq else SparkEntry.queries.keys.toSeq.sorted
    names.foreach { name =>
      val r =
        try {
          val df = SparkEntry.queries(name)(spark, sf)
          val plan = df.queryExecution.executedPlan.toString
          val n = "Exchange (hash|range)partitioning".r
            .findAllMatchIn(plan).size.toString
          // free any checkpoint-backed storage (q87) — leak-free sweep
          graft.llm.Components.releaseQuietly(df)
          n
        } catch { case e: Throwable =>
          s"ERR ${Option(e.getMessage).getOrElse(e.getClass.getName).take(60)}"
        }
      println(s"SHUFFLES $name $r")
    }
    spark.stop()
  }
}
