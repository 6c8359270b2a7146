package graft

import org.scalacheck.{Properties, Test => SCTest}
import org.scalacheck.util.Pretty

/** Dev-only flake hunter: runs the three Spark-heavy invariant suites
  * CONCURRENTLY in one JVM (sbt's default parallel suite execution —
  * the exact context of the one-off r11 hammer failure) for N
  * iterations, printing every non-passing property with its
  * counterexample. ScalaCheck seeds are fresh per run, so each
  * iteration is a new draw volume; `SPARK_GRAFT_PROP_MULT` scales the
  * per-suite draw counts as usual.
  *
  * Run: `SPARK_GRAFT_PROP_MULT=8 sbt "Test/runMain graft.PropHammer 5"`
  * (or via java -cp on the exported test classpath for parallel JVMs).
  */
object PropHammer {
  def main(args: Array[String]): Unit = {
    val iters = args.headOption.map(_.toInt).getOrElse(5)
    val suites: Seq[Properties] =
      Seq(InvariantProps, MlInvariantProps, LlmInvariantProps)
    SparkTestSession.spark.sparkContext.setLogLevel("ERROR")
    @volatile var failed = false
    for (i <- 1 to iters if !failed) {
      val t0 = System.nanoTime()
      val threads = suites.map { s =>
        new Thread(() => {
          try
            SCTest.checkProperties(
              s.overrideParameters(SCTest.Parameters.default), s)
              .foreach { case (name, res) =>
                if (!res.passed) {
                  failed = true
                  println(s"[hammer] FAILED $name: " +
                    Pretty.pretty(res, Pretty.Params(2)))
                }
              }
          catch { case e: Throwable =>
            failed = true
            println(s"[hammer] SUITE ${s.name} THREW: $e")
            e.printStackTrace()
          }
        }, s.name)
      }
      threads.foreach(_.start())
      threads.foreach(_.join())
      println(f"[hammer] iteration $i done in " +
        f"${(System.nanoTime() - t0) / 1e9}%.0fs failed=$failed")
    }
    println(if (failed) "[hammer] FAILURE CAPTURED" else "[hammer] ALL PASSED")
    SparkTestSession.spark.stop()
    sys.exit(if (failed) 1 else 0)
  }
}
