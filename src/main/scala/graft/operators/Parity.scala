package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Oracle-parity helpers shared by every operator/oracle module. */
object Parity {

  /** Bit-identical 4-decimal rounding for oracle parity: `floor(x*1e4 +
    * 0.5)/1e4` computed in IEEE doubles gives the same bits in Spark and
    * DuckDB, unlike `round(x, 4)` — Spark rounds the shortest decimal
    * repr (HALF_UP on "22.04875") while DuckDB rounds the binary value
    * (22.048749999…) and the two disagree on exact-half boundaries,
    * which linear interpolation produces systematically (frac=¼ over
    * terminating-decimal anchors). SQL twin: `floor(x*10000 + 0.5)/10000`.
    *
    * ONE definition on purpose: a per-module copy "simplified" to
    * `round(x, 4)` would reintroduce the exact-half parity mismatch in
    * that module alone, and the rationale would not travel with it. */
  def r4(c: Column): Column =
    floor(c * lit(10000.0) + lit(0.5)) / lit(10000.0)
}
