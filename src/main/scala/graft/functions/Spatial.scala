package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.{shiftleft, shiftright, lit}

/** Morton (Z-order) bit interleaving over bounded non-negative integer
  * dimension columns — the multi-dimensional clustering key behind
  * lakehouse OPTIMIZE ZORDER: sorting by the interleaved key gives every
  * contiguous slice a compact hyper-rectangle footprint in ALL dimensions
  * at once, so per-file min/max statistics prune multi-dimensional
  * predicates (the q329 layout audit measures exactly this; reference has
  * no layout management — beyond-parity).
  *
  * Pure codegen'd builtins (shiftright/and/shiftleft/sum), no UDF; the
  * caller buckets each dimension into [0, 2^bits) first (see q329's
  * day/price binning — `least(255, greatest(0, …))`).
  */
object Spatial {

  /** Interleave the low `bits` bits of each dimension column. Dimension
    * order is significance order: bit i of `dims(0)` lands ABOVE bit i of
    * `dims(1)`, matching q329's `db`-over-`pb` layout (for d dims, bit i
    * of dim j goes to position d·i + (d−1−j)). Result fits a LONG for
    * d·bits ≤ 63.
    *
    * Each dimension is widened to LONG before shifting: with INT inputs
    * Spark's shiftleft stays 32-bit (shift amount taken mod 32), so any
    * target bit position ≥ 31 — reachable at 3+ dims × 8 bits — would
    * silently wrap and corrupt the key.
    */
  def morton(dims: Seq[Column], bits: Int = 8): Column = {
    require(dims.nonEmpty && dims.size * bits <= 63,
      s"morton: ${dims.size} dims x $bits bits exceeds a signed long")
    val d = dims.size
    val terms = for {
      i <- 0 until bits
      (c, j) <- dims.zipWithIndex
    } yield shiftleft(shiftright(c.cast("long"), i).bitwiseAND(lit(1L)),
      d * i + (d - 1 - j))
    terms.reduce(_ + _)
  }
}
