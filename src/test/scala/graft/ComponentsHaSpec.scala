package graft

import java.util.concurrent.TimeUnit

import org.scalatest.funsuite.AnyFunSuite

/** Opt-in mechanical gate for the executor-loss recovery contract
  * (r11 verdict item 4 — promoted from the hand-run probe after 4/4
  * stable both-mode runs: reliable mode RECOVERED and localCheckpoint
  * mode FAILED_LOUDLY every time).
  *
  * Runs ONLY when `SPARK_GRAFT_HA_SPEC=1` (registered `ignore`
  * otherwise): the probe SIGKILLs a real `local-cluster` executor,
  * which is too heavy — two standalone clusters, four executor OS
  * processes — for the default `sbt test` loop, and the whole point of
  * the opt-in is to never add a gate that could flake the suite.
  *
  * The probe runs in a FORKED JVM, not in-process: a `local-cluster`
  * SparkContext cannot coexist with the suite's shared `local[*]`
  * context in one JVM, and suite ordering must not depend on which
  * starts first. The fork reuses this test JVM's own classpath and
  * --add-opens flags, and sets SPARK_SCALA_VERSION=2.13 — the worker's
  * executor-command builder needs it in a dist install (no
  * launcher/target build dirs to sniff the version from).
  *
  * Run: `SPARK_GRAFT_HA_SPEC=1 sbt "testOnly graft.ComponentsHaSpec"`.
  */
class ComponentsHaSpec extends AnyFunSuite {

  private val optedIn = sys.env.get("SPARK_GRAFT_HA_SPEC").contains("1")

  private def runProbe(): (Int, String) = {
    val javaBin = s"${System.getProperty("java.home")}/bin/java"
    val addOpens = java.lang.management.ManagementFactory.getRuntimeMXBean
      .getInputArguments.toArray.map(_.toString)
      .sliding(2).collect { case Array("--add-opens", p) =>
        Seq("--add-opens", p) }.flatten.toSeq
    val cmd = Seq(javaBin) ++ addOpens ++ Seq(
      "-Xmx4g", "-Dspark.ui.enabled=false",
      "-Dspark.sql.session.timeZone=UTC",
      "-cp", System.getProperty("java.class.path"),
      "graft.ComponentsHaProbe")
    val pb = new ProcessBuilder(cmd: _*)
    pb.environment().put("SPARK_GRAFT_HA_MODE", "both")
    pb.environment().put("SPARK_SCALA_VERSION", "2.13")
    pb.redirectErrorStream(false)
    val p = pb.start()
    val out = new StringBuilder
    val reader = new Thread(() => {
      val src = scala.io.Source.fromInputStream(p.getInputStream, "UTF-8")
      try src.getLines().foreach(l => out.synchronized { out ++= l += '\n' })
      finally src.close()
    })
    reader.setDaemon(true)
    reader.start()
    // drain stderr too (Spark logs land there) or the pipe buffer
    // fills and wedges the probe mid-run
    val drain = new Thread(() => {
      val src = scala.io.Source.fromInputStream(p.getErrorStream, "UTF-8")
      try src.getLines().foreach(_ => ()) finally src.close()
    })
    drain.setDaemon(true)
    drain.start()
    if (!p.waitFor(8, TimeUnit.MINUTES)) {
      p.destroyForcibly()
      // synchronized read: the reader thread may still be appending
      fail("HA probe did not finish within 8 minutes; stdout so far:\n" +
        out.synchronized(out.toString))
    }
    reader.join(10000)
    (p.exitValue(), out.synchronized(out.toString))
  }

  private def body(): Unit = {
    val (exit, out) = runProbe()
    assert(exit == 0, s"probe JVM exited $exit; stdout:\n$out")
    val reliable = out.linesIterator
      .find(_.startsWith("HA_PROBE reliable:"))
      .getOrElse(fail(s"no reliable-mode verdict line in:\n$out"))
    val local = out.linesIterator
      .find(_.startsWith("HA_PROBE local:"))
      .getOrElse(fail(s"no local-mode verdict line in:\n$out"))
    // the contract: reliable checkpoints RECOVER the identical labels
    // from files after a real executor loss ...
    assert(reliable.contains("verdict=RECOVERED"), reliable)
    assert(reliable.contains("rows_pre=512") &&
      reliable.contains("rows_post=512") && reliable.contains("label_sum=0"),
      reliable)
    // ... and localCheckpoint mode fails LOUDLY (never a silent wrong
    // answer). INCONCLUSIVE — every block happened to live on the
    // survivor — is accepted as the one benign alternative; 4/4
    // promotion runs hit the loud failure.
    assert(local.contains("FAILED_LOUDLY_AS_DESIGNED") ||
      local.contains("INCONCLUSIVE"), local)
    assert(!local.contains("WRONG"), local)
  }

  if (optedIn)
    test("executor loss: reliable checkpoint recovers, localCheckpoint fails loudly")(body())
  else
    ignore("executor loss: reliable checkpoint recovers, localCheckpoint fails loudly (set SPARK_GRAFT_HA_SPEC=1)")(body())
}
