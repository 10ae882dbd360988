package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native codegen hashed word-n-gram shingle set: sorted distinct 64-bit
  * hashes of every n-token window, straight from the token array.
  *
  * The declarative chain this replaces
  * (`array_sort(array_distinct(transform(shingle_strings, xxhash64)))`
  * over [[NGramShingles]] output) materialized every shingle STRING —
  * re-copying each token's bytes into n window strings just to hash and
  * discard them — and then paid three boxed array passes. Here each
  * token's bytes are hashed ONCE (FNV-1a, splitmix-finalized), windows
  * combine the per-token hashes with a seeded polynomial, and
  * sort+dedup run over a primitive long[]: O(tokens·(len+n)) instead of
  * O(tokens·n·len), with no string allocation.
  *
  * Equality structure is IDENTICAL to the string form w.h.p.: tokens
  * come from a whitespace split so they contain no spaces, making the
  * space-joined shingle string injective in the token sequence — two
  * windows are string-equal iff they are token-sequence-equal, and the
  * polynomial-of-token-hashes collides for unequal sequences with
  * probability ~2⁻⁶⁴ (same one-sided contract as every hashed join in
  * the dedup family; Jaccard VALUES over the hashed sets shift by at
  * most ~1/|S| with vanishing probability, as documented on
  * [[TextOps.hashedShingleSets]]).
  */
case class ShingleHashes(child: Expression, n: Int) extends UnaryExpression {

  override val nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) if n >= 1 => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<string> and n >= 1, got ${child.dataType}, n=$n")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_shingle_hashes"

  override protected def nullSafeEval(input: Any): Any =
    ShingleHashes.compute(input.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val cls = ShingleHashes.getClass.getName.stripSuffix("$") + "$"
      s"${ev.value} = $cls.MODULE$$.compute($a, $n);"
    })

  override protected def withNewChildInternal(newChild: Expression): ShingleHashes =
    copy(child = newChild)
}

object ShingleHashes {

  private final val Seed = Hashing.PolySeed
  private final val B = Hashing.FnvPrime

  /** FNV-1a over the token's UTF-8 bytes, splitmix-finalized ([[Hashing]]
    * is the single source of the constants). Null tokens hash like the
    * empty token (the whitespace tokenizer never produces null;
    * [[NGramShingles]] makes the same substitution). */
  def tokenHash(t: UTF8String): Long = Hashing.fnv1a(t)

  /** Shared kernel for interpreted and generated paths: sorted distinct
    * window hashes; empty when the array holds fewer than n tokens. */
  def compute(toks: ArrayData, n: Int): GenericArrayData = {
    val total = toks.numElements()
    val count = total - n + 1
    if (count <= 0) return new GenericArrayData(Array.emptyLongArray)
    val th = new Array[Long](total)
    var i = 0
    while (i < total) { th(i) = tokenHash(toks.getUTF8String(i)); i += 1 }
    val out = new Array[Long](count)
    var w = 0
    while (w < count) {
      var h = Seed
      var j = 0
      while (j < n) { h = h * B + th(w + j); j += 1 }
      out(w) = Hashing.mix(h)
      w += 1
    }
    java.util.Arrays.sort(out)
    var m = 0
    var k = 1
    while (k < count) {
      if (out(k) != out(m)) { m += 1; out(m) = out(k) }
      k += 1
    }
    val len = m + 1
    new GenericArrayData(
      if (len == count) out else java.util.Arrays.copyOf(out, len))
  }

  private val ident = new FunctionIdentifier("graft_shingle_hashes")

  def ensureRegistered(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    if (!registry.functionExists(ident)) {
      registry.registerFunction(
        ident,
        new ExpressionInfo(classOf[ShingleHashes].getName, "graft_shingle_hashes"),
        (children: Seq[Expression]) => {
          val n = children(1) match {
            case Literal(v: Int, _) => v
            case other => throw new IllegalArgumentException(
              s"graft_shingle_hashes(arr, n): n must be an integer literal, got $other")
          }
          ShingleHashes(children(0), n)
        })
    }
  }

  def column(spark: SparkSession, toks: Column, n: Int): Column = {
    ensureRegistered(spark)
    org.apache.spark.sql.functions.call_function(
      "graft_shingle_hashes", toks, org.apache.spark.sql.functions.lit(n))
  }
}
