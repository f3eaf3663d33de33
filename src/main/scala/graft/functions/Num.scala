package graft.functions

import org.apache.spark.sql.Column

/** Shared numeric-determinism helpers. */
object Num {

  /** Cast to decimal(38,0) — the repo-wide contract for order-independent
    * exact integer accumulation (== DuckDB HUGEINT in every oracle; see
    * COVERAGE.md's determinism audit). All fixed-point sums that can pass
    * a long MUST go through this one definition so the precision contract
    * has a single owner.
    */
  def dec(c: Column): Column = c.cast("decimal(38,0)")
}
