package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, LongType}

/** First `nibbles` hex characters of md5(input) as an unsigned long — the
  * exact value of the engine-portable composition
  * `conv(substring(md5(c), 1, nibbles), 16, 10)` (DuckDB mirror:
  * `CAST(('0x' || substr(md5(x), 1, nibbles)) AS BIGINT)`), computed
  * directly from the digest bytes as a native codegen'd expression.
  *
  * Why not the built-in composition: Spark's `Md5` calls
  * `DigestUtils.md5Hex`, which performs a `MessageDigest.getInstance`
  * provider lookup PER ROW and allocates a 32-char hex `UTF8String`; the
  * `substring` then copies it and `conv` re-parses the hex digits through
  * `NumberConverter`. This expression reuses a thread-local digest and
  * emits the long with shift/mask arithmetic — same value, none of the
  * per-row allocation (measured ~3× on the shingle-hash pipelines, which
  * sit under every minhash/winnow/gram operator; optimization guide §1.2
  * step 2 "per-task work"). Round16OpsSpec pins value-equality against the
  * built-in composition on randomized inputs.
  *
  * Input is BINARY (callers cast their string column, which is the same
  * UTF-8-bytes cast the analyzer inserted for `md5`); null in → null out,
  * exactly like the md5 chain. Supported prefix widths: 8 (32-bit base
  * hash) and 15 (60-bit — 16 would overflow a signed BIGINT in DuckDB).
  */
case class Md5PrefixLong(child: Expression, nibbles: Int)
    extends UnaryExpression {
  require(nibbles == 8 || nibbles == 15,
    s"Md5PrefixLong: unsupported prefix width $nibbles")

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_md5_prefix"

  override def nullSafeEval(b: Any): Any =
    Md5PrefixLong.prefix(b.asInstanceOf[Array[Byte]], nibbles)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      b => s"graft.functions.Md5PrefixLong$$.MODULE$$.prefix($b, $nibbles)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object Md5PrefixLong {
  private val local = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest =
      MessageDigest.getInstance("MD5")
  }

  /** First `nibbles` hex chars of md5(bytes) as an unsigned long.
    * nibbles=8 → digest bytes 0..3 big-endian; nibbles=15 → bytes 0..7
    * big-endian shifted right 4 (the 16th hex char is the low nibble of
    * byte 7, which the 15-char prefix excludes).
    */
  def prefix(bytes: Array[Byte], nibbles: Int): Long = {
    val d = local.get()
    val h = d.digest(bytes) // digest() resets the instance
    if (nibbles == 8)
      ((h(0) & 0xffL) << 24) | ((h(1) & 0xffL) << 16) |
        ((h(2) & 0xffL) << 8) | (h(3) & 0xffL)
    else {
      var v = 0L
      var i = 0
      while (i < 8) { v = (v << 8) | (h(i) & 0xffL); i += 1 }
      v >>> 4
    }
  }
}
