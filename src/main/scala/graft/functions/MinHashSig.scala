package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native codegen MinHash signature: element `i` of the output is
  * `min over shingles of mix(base(shingle), i)`, where `base` is
  * xxhash64 for `array<string>` input and the identity for
  * `array<long>` input (the [[ShingleHashes]] kernel's output — already
  * splitmix-finalized, so it is itself a uniform base hash).
  *
  * The declarative formulation — 128 × `array_min(transform(sh, s =>
  * xxhash64(s, i)))` — re-hashes every string once per hash function in
  * the interpreted higher-order evaluator: ~38M string hashes for 5k
  * docs, measured at 40 s. This expression hashes each shingle ONCE and
  * derives the per-function values with a splitmix64 finalizer (an
  * equally uniform hash family), all inside one generated loop:
  * O(shingles + numHashes) allocations-free work per row, ~50x faster.
  * The `array<long>` form goes further: fed by [[ShingleHashes]], the
  * signature never materializes a shingle string at all. Any uniform
  * base family gives the same per-pair collision probabilities, so the
  * candidate-recall analysis callers rely on is unchanged.
  */
case class MinHashSig(child: Expression, numHashes: Int)
    extends UnaryExpression {

  override val nullIntolerant: Boolean = true

  private def fromHashes: Boolean =
    child.dataType match { case ArrayType(LongType, _) => true; case _ => false }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) | ArrayType(LongType, _) if numHashes > 0 =>
      TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<string> or array<long> and a positive hash count")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_minhash"

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val out =
      if (fromHashes) MinHashSig.computeHashed(arr, numHashes)
      else MinHashSig.compute(arr, numHashes)
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val cls = MinHashSig.getClass.getName.stripSuffix("$") + "$"
      val m = if (fromHashes) "computeHashed" else "compute"
      // freshName, NOT a fixed local: with a non-nullable child two of
      // these in one generated method would redefine the name and
      // janino would reject the stage (found on HyperplaneSig in r16)
      val mins = ctx.freshName("minhashMins")
      s"""
        long[] $mins = $cls.MODULE$$.$m($a, $numHashes);
        ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($mins);
      """
    })

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

object MinHashSig {

  /** splitmix64 finalizer of (base hash, salt) — shared [[Hashing]]
    * definition, so the per-function hash family can never drift from
    * the kernels whose output feeds it. */
  @inline private def mix(x0: Long): Long = Hashing.mix(x0)

  /** Shared kernel for interpreted and generated paths. */
  def compute(arr: ArrayData, numHashes: Int): Array[Long] = {
    val mins = Array.fill(numHashes)(Long.MaxValue)
    val n = arr.numElements()
    var j = 0
    while (j < n) {
      val s = arr.getUTF8String(j)
      if (s != null) {
        val base = hashUtf8(s)
        var i = 0
        while (i < numHashes) {
          val h = mix(base ^ (i.toLong * 0xc2b2ae3d27d4eb4fL))
          if (h < mins(i)) mins(i) = h
          i += 1
        }
      }
      j += 1
    }
    mins
  }

  /** Kernel for the `array<long>` form: elements are already uniform
    * 64-bit hashes ([[ShingleHashes]] output), so they serve as the base
    * hash directly — no per-element rehash. */
  def computeHashed(arr: ArrayData, numHashes: Int): Array[Long] = {
    val mins = Array.fill(numHashes)(Long.MaxValue)
    val n = arr.numElements()
    var j = 0
    while (j < n) {
      if (!arr.isNullAt(j)) { // skip nulls, matching the string path
        val base = arr.getLong(j)
        var i = 0
        while (i < numHashes) {
          val h = mix(base ^ (i.toLong * 0xc2b2ae3d27d4eb4fL))
          if (h < mins(i)) mins(i) = h
          i += 1
        }
      }
      j += 1
    }
    mins
  }

  private def hashUtf8(s: UTF8String): Long =
    org.apache.spark.sql.catalyst.expressions.XXH64.hashUnsafeBytes(
      s.getBaseObject, s.getBaseOffset, s.numBytes(), 42L)

  private val ident = new FunctionIdentifier("graft_minhash")

  /** Idempotent session registration (see [[DotProduct.ensureRegistered]]). */
  def ensureRegistered(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    if (!registry.functionExists(ident)) {
      registry.registerFunction(
        ident,
        new ExpressionInfo(classOf[MinHashSig].getName, "graft_minhash"),
        (children: Seq[Expression]) => {
          val n = children(1) match {
            case Literal(v: Int, _) => v
            case other => throw new IllegalArgumentException(
              s"graft_minhash(arr, n): n must be an integer literal, got $other")
          }
          MinHashSig(children(0), n)
        })
    }
  }

  def column(spark: SparkSession, shingles: Column, numHashes: Int): Column = {
    ensureRegistered(spark)
    org.apache.spark.sql.functions.call_function(
      "graft_minhash", shingles, org.apache.spark.sql.functions.lit(numHashes))
  }
}
