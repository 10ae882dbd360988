package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native codegen FastSS deletion signatures: for a string of n chars,
  * the 64-bit polynomial hash of the FULL string plus the hash of each
  * of the n single-character-deletion variants — n+1 longs, computed in
  * O(n) with rolling prefix/suffix hashes instead of the O(n²)
  * substring materialization the declarative form pays
  * (`transform(sequence(...), i -> concat(substr(...), substr(...)))`
  * builds every deletion STRING just to hash and discard it).
  *
  * Hash identity: H(prefix-deletion-suffix) combines as
  * `p[i] * B^(n-1-i) + sufPoly[i+1]` where `p` is the seeded prefix
  * polynomial and `sufPoly` the positional suffix polynomial — equal
  * strings (any origin, any length) get equal hashes, distinct strings
  * collide with probability ~2^-64 and are verified away by the exact
  * `levenshtein` downstream, so recall is unaffected (the same
  * one-sided contract as every hash join in the dedup family). */
case class DeletionSigs(child: Expression) extends UnaryExpression {

  override val nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects a string, got $other")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_deletion_sigs"

  override protected def nullSafeEval(input: Any): Any =
    new GenericArrayData(
      DeletionSigs.compute(input.asInstanceOf[UTF8String]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val cls = DeletionSigs.getClass.getName.stripSuffix("$") + "$"
      // freshName, NOT a fixed local: with a non-nullable child two of
      // these in one generated method would redefine the name and
      // janino would reject the stage (found on HyperplaneSig in r16)
      val sigs = ctx.freshName("deletionSigs")
      s"""
        long[] $sigs = $cls.MODULE$$.compute($a);
        ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($sigs);
      """
    })

  override protected def withNewChildInternal(newChild: Expression): DeletionSigs =
    copy(child = newChild)
}

object DeletionSigs {

  private final val Seed = Hashing.PolySeed
  private final val B = Hashing.FnvPrime // odd polynomial base

  /** Shared kernel for interpreted and generated paths: [full, del_0,
    * ..., del_{n-1}] over the string's CODEPOINTS — matching the
    * codepoint semantics of the `substr`/`length` form this replaces
    * and of the downstream `levenshtein` verify (UTF-16-unit deletions
    * would miss codepoint-ed=1 pairs that substitute across non-BMP
    * characters). */
  def compute(s: UTF8String): Array[Long] = {
    val cp = s.toString.codePoints().toArray
    val n = cp.length
    // prefix polynomial: p(i) = seed*B^i + sum_{k<i} c_k B^{i-1-k}
    val p = new Array[Long](n + 1)
    p(0) = Seed
    var i = 0
    while (i < n) { p(i + 1) = p(i) * B + cp(i); i += 1 }
    // B^j for j in [0, n)
    val pow = new Array[Long](math.max(n, 1))
    pow(0) = 1L
    var j = 1
    while (j < n) { pow(j) = pow(j - 1) * B; j += 1 }
    // positional suffix polynomial: suf(i) = sum_{j>=i} c_j B^{n-1-j}
    val suf = new Array[Long](n + 1)
    var k = n - 1
    while (k >= 0) { suf(k) = suf(k + 1) + cp(k) * pow(n - 1 - k); k -= 1 }
    val out = new Array[Long](n + 1)
    out(0) = p(n) // the full string
    var d = 0
    while (d < n) {
      // delete char d: seeded prefix shifted over the remaining chars,
      // plus the already-positioned suffix
      out(d + 1) = p(d) * pow(n - 1 - d) + suf(d + 1)
      d += 1
    }
    out
  }

  private val ident = new FunctionIdentifier("graft_deletion_sigs")

  def ensureRegistered(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    if (!registry.functionExists(ident)) {
      registry.registerFunction(
        ident,
        new ExpressionInfo(classOf[DeletionSigs].getName, "graft_deletion_sigs"),
        (children: Seq[Expression]) => DeletionSigs(children.head))
    }
  }

  def column(spark: SparkSession, str: Column): Column = {
    ensureRegistered(spark)
    org.apache.spark.sql.functions.call_function("graft_deletion_sigs", str)
  }
}
