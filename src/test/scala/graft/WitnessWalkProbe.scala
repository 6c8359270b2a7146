package graft

import java.nio.file.{Files, Path}

/** Dev-only probe backing the opt-in `graft.witness.ttlMs` knob
  * (r12 verdict carried item): measures what `Scratch.cachedDir`'s
  * directory-witness identity walk costs per call as the lake's file
  * count grows, and what a TTL memo hit costs instead. No Spark — the
  * walk is pure java.nio against a synthetic directory-per-table tree.
  *
  * Run: `sbt "Test/runMain graft.WitnessWalkProbe 20000"`
  * Prints one line per phase; readings recorded in COVERAGE.md.
  */
object WitnessWalkProbe {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(20000)
    val dirs = 100
    val root = Files.createTempDirectory("graft-wwalk-lake")
    try {
      val subs = (0 until dirs).map { i =>
        val d = root.resolve(f"part=$i%03d")
        Files.createDirectory(d)
        d
      }
      (0 until n).foreach { i =>
        Files.writeString(subs(i % dirs).resolve(f"f$i%06d.parquet"),
          i.toString)
      }
      def timeCalls(reps: Int): Double = {
        // fresh prefix per phase so the throttled /tmp sweep fires at
        // most once and never skews the per-call walk readings
        var last = ""
        val t0 = System.nanoTime()
        (1 to reps).foreach { _ =>
          last = Scratch.cachedDir("graft-wwalk-probe", root.toString)
        }
        require(last.nonEmpty)
        (System.nanoTime() - t0) / 1e6 / reps
      }
      timeCalls(1) // warm the dentry/inode cache once, untimed share
      val coldish = timeCalls(5)
      System.setProperty("graft.witness.ttlMs", "600000")
      Scratch.witnessMemo.clear()
      timeCalls(1) // first TTL call computes and stores
      val memoHit = timeCalls(20)
      System.clearProperty("graft.witness.ttlMs")
      println(f"WITNESS_WALK_PROBE files=$n dirs=$dirs " +
        f"walk_ms_per_call=$coldish%.2f ttl_memo_ms_per_call=$memoHit%.4f " +
        f"ratio=${coldish / memoHit}%.0f")
    } finally {
      Scratch.witnessMemo.clear()
      Scratch.deleteTree(root)
    }
  }
}
