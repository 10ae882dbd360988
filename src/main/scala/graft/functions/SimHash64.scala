package graft.functions

import java.nio.charset.StandardCharsets
import java.security.MessageDigest
import java.util.regex.Pattern

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native codegen 64-bit SimHash of a document: tokenize, hash every
  * token occurrence, accumulate the 64 per-bit ±1 counters, pack the
  * positive lanes — ONE pass per document, no explode, no 64-aggregate
  * groupBy, no shuffle (the declarative form shuffled every exploded
  * token row through a 64-column aggregation).
  *
  * Bit-identical to the declarative pipeline it replaces, which is what
  * keeps d04's DuckDB oracle replayable:
  *   - tokens: Spark `split(trim(text), "\\s+")` — trim strips ' '
  *     (0x20) ONLY, and Java-regex split with limit -1 keeps leading
  *     empty tokens (a doc starting with '\t' contributes the hash of
  *     "" — preserved, not "fixed").
  *   - token hash: [[TextOps.tokenHash64]] = the first 8 bytes of the
  *     token's MD5 as a big-endian long.
  *   - every token OCCURRENCE votes ±1 per bit; bit b of the result is
  *     set iff its counter is strictly positive (ties → 0), matching
  *     `when(sum > 0, 1L << b)`.
  */
case class SimHash64(child: Expression) extends UnaryExpression {

  override val nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects a string, got $other")
  }

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_simhash64"

  override protected def nullSafeEval(input: Any): Any =
    SimHash64.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val cls = SimHash64.getClass.getName.stripSuffix("$") + "$"
      s"${ev.value} = $cls.MODULE$$.compute($a);"
    })

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

object SimHash64 {

  private val Ws = Pattern.compile("\\s+")

  private val Md5 = ThreadLocal.withInitial[MessageDigest](() =>
    MessageDigest.getInstance("MD5"))

  /** Spark's default `trim`: strip leading/trailing ' ' (0x20) only —
    * NOT Java's String.trim, which also strips tabs/newlines. */
  private def sparkTrim(s: String): String = {
    var lo = 0
    var hi = s.length
    while (lo < hi && s.charAt(lo) == ' ') lo += 1
    while (hi > lo && s.charAt(hi - 1) == ' ') hi -= 1
    s.substring(lo, hi)
  }

  /** Shared kernel for interpreted and generated paths. */
  def compute(text: UTF8String): Long = {
    val toks = Ws.split(sparkTrim(text.toString), -1)
    val counts = new Array[Int](64)
    val md = Md5.get()
    var i = 0
    while (i < toks.length) {
      md.reset()
      val digest = md.digest(toks(i).getBytes(StandardCharsets.UTF_8))
      // first 8 digest bytes, big-endian — exactly tokenHash64's
      // conv(substring(md5_hex, 1, 8)) << 32 + conv(substring(hex, 9, 8))
      var h = 0L
      var k = 0
      while (k < 8) { h = (h << 8) | (digest(k) & 0xffL); k += 1 }
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
        b += 1
      }
      i += 1
    }
    var packed = 0L
    var b = 0
    while (b < 64) {
      if (counts(b) > 0) packed |= (1L << b)
      b += 1
    }
    packed
  }

  private val ident = new FunctionIdentifier("graft_simhash64")

  def ensureRegistered(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    if (!registry.functionExists(ident)) {
      registry.registerFunction(
        ident,
        new ExpressionInfo(classOf[SimHash64].getName, "graft_simhash64"),
        (children: Seq[Expression]) => SimHash64(children.head))
    }
  }

  def column(spark: SparkSession, text: Column): Column = {
    ensureRegistered(spark)
    org.apache.spark.sql.functions.call_function("graft_simhash64", text)
  }
}
