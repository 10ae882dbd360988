package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native distinct word-n-gram shingles: one pass over the token array
  * building "w1 w2 w3" strings with first-seen dedup.
  *
  * The declarative form — `array_distinct(transform(sequence(...), i =>
  * concat_ws(" ", slice(toks, i, n))))` — runs interpreted and
  * re-evaluates slice/concat per sequence element; this kernel is a
  * single loop with a hash-set dedup, and it preserves the exact output
  * of the declarative form (same strings, first-occurrence order —
  * array_distinct keeps first occurrences too), so oracle parity is
  * unchanged.
  */
case class NGramShingles(child: Expression, n: Int) extends UnaryExpression {

  override val nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) if n > 0 => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<string> and a positive n")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_shingles"

  override protected def nullSafeEval(input: Any): Any =
    NGramShingles.compute(input.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val cls = NGramShingles.getClass.getName.stripSuffix("$") + "$"
      s"${ev.value} = $cls.MODULE$$.compute($a, $n);"
    })

  override protected def withNewChildInternal(newChild: Expression): NGramShingles =
    copy(child = newChild)
}

object NGramShingles {

  private val Space = UTF8String.fromString(" ")

  /** Shared kernel for interpreted and generated paths. */
  def compute(toks: ArrayData, n: Int): GenericArrayData = {
    val total = toks.numElements()
    val count = math.max(0, total - n + 1)
    val seen = new java.util.LinkedHashSet[UTF8String](math.max(4, count))
    var i = 0
    while (i < count) {
      val parts = new Array[UTF8String](n)
      var j = 0
      while (j < n) {
        val t = toks.getUTF8String(i + j)
        parts(j) = if (t == null) UTF8String.EMPTY_UTF8 else t
        j += 1
      }
      seen.add(UTF8String.concatWs(Space, parts: _*))
      i += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var k = 0
    while (it.hasNext) { out(k) = it.next(); k += 1 }
    new GenericArrayData(out)
  }

  private val ident = new FunctionIdentifier("graft_shingles")

  def ensureRegistered(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    if (!registry.functionExists(ident)) {
      registry.registerFunction(
        ident,
        new ExpressionInfo(classOf[NGramShingles].getName, "graft_shingles"),
        (children: Seq[Expression]) => {
          val n = children(1) match {
            case Literal(v: Int, _) => v
            case other => throw new IllegalArgumentException(
              s"graft_shingles(arr, n): n must be an integer literal, got $other")
          }
          NGramShingles(children(0), n)
        })
    }
  }

  def column(spark: SparkSession, toks: Column, n: Int): Column = {
    ensureRegistered(spark)
    org.apache.spark.sql.functions.call_function(
      "graft_shingles", toks, org.apache.spark.sql.functions.lit(n))
  }
}
