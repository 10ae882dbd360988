package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, BooleanType, DataType, IntegerType, LongType}

/** Runtime bloom-filter semi-join reduction — the 100 TB shuffle-killer
  * for fact ⋈ selective-dim joins (the pattern AQE's runtime row-level
  * filters automate; here it is a first-class, testable operator):
  *
  *   1. [[BloomAgg]] folds the dim side's join keys into ONE bitmap —
  *      a partial-aggregable OR, so each map task ships `nbits/8` bytes
  *      regardless of row count;
  *   2. the driver collects that single bitmap (16 KiB at the default
  *      2^17 bits — a bounded, size-documented collect, exactly the
  *      runtime-filter broadcast) and embeds it as a literal;
  *   3. [[BloomMightContain]] prefilters the fact side IN THE SCAN
  *      STAGE — no false negatives, tunable false positives — so only
  *      surviving rows (|dim-matched| + fp) ever shuffle for the exact
  *      join.
  *
  * Hashing is double-hashing over the splitmix64 finalizer (public
  * domain; Steele et al., "Fast Splittable Pseudorandom Number
  * Generators", OOPSLA'14): position_i = (h1 + i*h2) mod nbits —
  * deterministic, so the bitmap is identical under any partitioning and
  * merge order. The JOIN RESULT is bloom-independent (no false
  * negatives), which is what the DuckDB oracle checks; the reduction
  * itself is pinned in ScalaTest.
  */
object BloomFilterOps {

  /** splitmix64 finalizer — the bit-mixing step only (stateless). */
  @inline def mix64(z0: Long): Long = {
    var z = z0
    z ^= (z >>> 30); z *= 0xbf58476d1ce4e9b5L
    z ^= (z >>> 27); z *= 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** Set the k positions of `key` in `bits` (len*64 = nbits). */
  def add(bits: Array[Long], key: Long, numHashes: Int): Unit = {
    val nbits = bits.length.toLong * 64L
    val h1 = mix64(key)
    val h2 = mix64(key + 0x9e3779b97f4a7c15L) | 1L
    var i = 0
    while (i < numHashes) {
      val pos = java.lang.Long.remainderUnsigned(h1 + i.toLong * h2, nbits)
      bits((pos >>> 6).toInt) |= (1L << (pos & 63L))
      i += 1
    }
  }

  /** Membership test against an ArrayData bitmap (called from both the
    * interpreted eval and the generated code — one implementation, no
    * drift). */
  def mightContain(bits: ArrayData, key: Long, numHashes: Int): Boolean = {
    val nbits = bits.numElements().toLong * 64L
    if (nbits == 0L) return false
    val h1 = mix64(key)
    val h2 = mix64(key + 0x9e3779b97f4a7c15L) | 1L
    var i = 0
    while (i < numHashes) {
      val pos = java.lang.Long.remainderUnsigned(h1 + i.toLong * h2, nbits)
      if ((bits.getLong((pos >>> 6).toInt) & (1L << (pos & 63L))) == 0L)
        return false
      i += 1
    }
    true
  }

  /** md5-derived double-hash pair for a shingle string, matching the
    * oracle-expressible bridge [[TextOps.tokenHash64]] documents: h1 =
    * first 16 md5 hex chars as unsigned-64 masked to 63 bits, h2 = the
    * last 16. DuckDB replays both as
    * `('0x' || substr(md5(s), 1|17, 16))::UBIGINT & 9223372036854775807`,
    * so a bloom built on these positions is reproducible bit-for-bit —
    * FALSE POSITIVES INCLUDED — in the oracle. */
  // per-thread digest (the SimHash64 pattern): getInstance per shingle
  // would be a JCA provider lookup + allocation inside the per-row loop
  private val Md5 = ThreadLocal.withInitial[java.security.MessageDigest](() =>
    java.security.MessageDigest.getInstance("MD5"))

  @inline private def md5Pair(s: org.apache.spark.unsafe.types.UTF8String): (Long, Long) = {
    val md = Md5.get(); md.reset()
    val d = md.digest(s.getBytes)
    @inline def be(off: Int): Long = {
      var h = 0L; var i = off
      while (i < off + 8) { h = (h << 8) | (d(i) & 0xffL); i += 1 }
      h & Long.MaxValue
    }
    (be(0), be(8))
  }

  /** Set the k md5-positions of shingle `s` in `bits`. Position j =
    * (h1 % m + j * (h2 % m)) % m — the mod-before-combine keeps every
    * intermediate non-negative and below 2*m, so the identical integer
    * arithmetic runs in DuckDB BIGINTs without overflow. */
  def md5Add(bits: Array[Long], s: org.apache.spark.unsafe.types.UTF8String,
      numHashes: Int): Unit = {
    val m = bits.length.toLong * 64L
    val (h1, h2) = md5Pair(s)
    val h1m = h1 % m; val h2m = h2 % m
    var j = 0
    while (j < numHashes) {
      val pos = (h1m + j.toLong * h2m) % m
      bits((pos >>> 6).toInt) |= (1L << (pos & 63L))
      j += 1
    }
  }

  /** Count the elements of the string array `arr` whose k md5-positions
    * are ALL set in `bits` — the per-document contamination hit count,
    * one static call per row from the generated code. */
  def md5HitCount(bits: ArrayData, arr: ArrayData, numHashes: Int): Int = {
    // k < 1 would make the all-positions-set loop vacuous and count
    // EVERY shingle as a hit — a silently wrong scorecard, so reject it
    // here too (the aggregate side already does; this kernel is also
    // reachable through the registered SQL function with any k)
    require(numHashes >= 1, s"numHashes must be >= 1, got $numHashes")
    val m = bits.numElements().toLong * 64L
    if (m == 0L) return 0
    var hits = 0
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      val s = arr.getUTF8String(i)
      if (s != null) {
        val (h1, h2) = md5Pair(s)
        val h1m = h1 % m; val h2m = h2 % m
        var j = 0
        var all = true
        while (all && j < numHashes) {
          val pos = (h1m + j.toLong * h2m) % m
          all = (bits.getLong((pos >>> 6).toInt) & (1L << (pos & 63L))) != 0L
          j += 1
        }
        if (all) hits += 1
      }
      i += 1
    }
    hits
  }

  /** [[md5HitCount]] over a plain `long[]` bitmap — the broadcast-read
    * variant ([[BloomBroadcastTextHits]]): the bitmap lives once per
    * executor in the broadcast block, never in the plan or the row. */
  def md5HitCountWords(bits: Array[Long], arr: ArrayData, numHashes: Int): Int = {
    require(numHashes >= 1, s"numHashes must be >= 1, got $numHashes")
    val m = bits.length.toLong * 64L
    if (m == 0L) return 0
    var hits = 0
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      val s = arr.getUTF8String(i)
      if (s != null) {
        val (h1, h2) = md5Pair(s)
        val h1m = h1 % m; val h2m = h2 % m
        var j = 0
        var all = true
        while (all && j < numHashes) {
          val pos = (h1m + j.toLong * h2m) % m
          all = (bits((pos >>> 6).toInt) & (1L << (pos & 63L))) != 0L
          j += 1
        }
        if (all) hits += 1
      }
      i += 1
    }
    hits
  }

  /** Build the dim-side bitmap and return the PREFILTERED fact frame:
    * fact rows whose key cannot be in `dim` are dropped before any
    * shuffle. `dim` should already carry its selective predicate. The
    * single-row collect is the runtime-filter broadcast (nbits/8 bytes,
    * data-size independent). */
  def bloomPrefilter(fact: DataFrame, factKey: String,
      dim: DataFrame, dimKey: String,
      nbits: Int = 1 << 17, numHashes: Int = 3): DataFrame = {
    val spark = fact.sparkSession
    val bitmap = dim
      .select(BloomAgg.column(spark, org.apache.spark.sql.functions.col(dimKey),
        nbits, numHashes).as("bm"))
      .head().getSeq[Long](0)
    fact.where(BloomMightContain.column(spark,
      org.apache.spark.sql.functions.typedlit(bitmap),
      org.apache.spark.sql.functions.col(factKey), numHashes))
  }
}

/** Partial-aggregable bloom bitmap over bigint keys: buffer = the bit
  * words, update = set k positions, merge = OR. Returns array<bigint>
  * (nbits/64 words). */
case class BloomAgg(
    child: Expression, nbits: Int, numHashes: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  override def children: Seq[Expression] = Seq(child)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != LongType)
      TypeCheckResult.TypeCheckFailure(s"$prettyName expects a bigint key")
    else if (nbits < 64 || nbits % 64 != 0)
      TypeCheckResult.TypeCheckFailure(s"$prettyName nbits must be a positive multiple of 64")
    else if (numHashes < 1)
      TypeCheckResult.TypeCheckFailure(s"$prettyName numHashes must be >= 1")
    else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "graft_bloom_agg"

  override def createAggregationBuffer(): Array[Long] = new Array[Long](nbits / 64)

  override def update(b: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) BloomFilterOps.add(b, v.asInstanceOf[Long], numHashes)
    b
  }

  override def merge(b: Array[Long], o: Array[Long]): Array[Long] = {
    var i = 0
    while (i < b.length) { b(i) |= o(i); i += 1 }
    b
  }

  override def eval(b: Array[Long]): Any = new GenericArrayData(b)

  override def serialize(b: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(b.length * 8)
    var i = 0
    while (i < b.length) { bb.putLong(b(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val out = new Array[Long](bytes.length / 8)
    var i = 0
    while (i < out.length) { out(i) = bb.getLong(); i += 1 }
    out
  }

  override def withNewMutableAggBufferOffset(o: Int): BloomAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): BloomAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): BloomAgg =
    copy(child = newChildren(0))
}

object BloomAgg {
  private val ident = new FunctionIdentifier("graft_bloom_agg")

  def ensureRegistered(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    if (!registry.functionExists(ident)) {
      registry.registerFunction(
        ident,
        new ExpressionInfo(classOf[BloomAgg].getName, "graft_bloom_agg"),
        (children: Seq[Expression]) => {
          def intLit(e: Expression, what: String): Int = e match {
            case Literal(v: Int, _) => v
            case other => throw new IllegalArgumentException(
              s"graft_bloom_agg(key, nbits, numHashes): $what must be an " +
                s"integer literal, got $other")
          }
          BloomAgg(children(0), intLit(children(1), "nbits"),
            intLit(children(2), "numHashes"))
        })
    }
  }

  def column(spark: SparkSession, key: Column, nbits: Int, numHashes: Int): Column = {
    ensureRegistered(spark)
    org.apache.spark.sql.functions.call_function("graft_bloom_agg",
      key, org.apache.spark.sql.functions.lit(nbits),
      org.apache.spark.sql.functions.lit(numHashes))
  }
}

/** Partial-aggregable bloom bitmap over shingle STRINGS with the
  * md5-position scheme of [[BloomFilterOps.md5Add]] — the
  * benchmark-side half of bloom decontamination. Identical merge/ship
  * shape to [[BloomAgg]] (each map task emits nbits/8 bytes, merge =
  * OR), but hashes are oracle-expressible, so DuckDB can rebuild the
  * exact bitmap and replay membership — false positives and all. */
case class Md5BloomAgg(
    child: Expression, nbits: Int, numHashes: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  override def children: Seq[Expression] = Seq(child)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != org.apache.spark.sql.types.StringType)
      TypeCheckResult.TypeCheckFailure(s"$prettyName expects a string key")
    else if (nbits < 64 || nbits % 64 != 0)
      TypeCheckResult.TypeCheckFailure(s"$prettyName nbits must be a positive multiple of 64")
    else if (numHashes < 1)
      TypeCheckResult.TypeCheckFailure(s"$prettyName numHashes must be >= 1")
    else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "graft_md5_bloom_agg"

  override def createAggregationBuffer(): Array[Long] = new Array[Long](nbits / 64)

  override def update(b: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null)
      BloomFilterOps.md5Add(b,
        v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], numHashes)
    b
  }

  override def merge(b: Array[Long], o: Array[Long]): Array[Long] = {
    var i = 0
    while (i < b.length) { b(i) |= o(i); i += 1 }
    b
  }

  override def eval(b: Array[Long]): Any = new GenericArrayData(b)

  override def serialize(b: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(b.length * 8)
    var i = 0
    while (i < b.length) { bb.putLong(b(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val out = new Array[Long](bytes.length / 8)
    var i = 0
    while (i < out.length) { out(i) = bb.getLong(); i += 1 }
    out
  }

  override def withNewMutableAggBufferOffset(o: Int): Md5BloomAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): Md5BloomAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Md5BloomAgg =
    copy(child = newChildren(0))
}

object Md5BloomAgg {
  private val ident = new FunctionIdentifier("graft_md5_bloom_agg")

  def ensureRegistered(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    if (!registry.functionExists(ident)) {
      registry.registerFunction(
        ident,
        new ExpressionInfo(classOf[Md5BloomAgg].getName, "graft_md5_bloom_agg"),
        (children: Seq[Expression]) => {
          def intLit(e: Expression, what: String): Int = e match {
            case Literal(v: Int, _) => v
            case other => throw new IllegalArgumentException(
              s"graft_md5_bloom_agg(key, nbits, numHashes): $what must be " +
                s"an integer literal, got $other")
          }
          Md5BloomAgg(children(0), intLit(children(1), "nbits"),
            intLit(children(2), "numHashes"))
        })
    }
  }

  def column(spark: SparkSession, key: Column, nbits: Int, numHashes: Int): Column = {
    ensureRegistered(spark)
    org.apache.spark.sql.functions.call_function("graft_md5_bloom_agg",
      key, org.apache.spark.sql.functions.lit(nbits),
      org.apache.spark.sql.functions.lit(numHashes))
  }
}

/** Codegen per-document hit count: `bloomTextHits(bitmap, shingles, k)`
  * = how many of the row's shingles have all k md5-positions set in the
  * bitmap. Array in, scalar out, one static kernel call per row (the
  * [[SimHash64]] shape) — the whole training-side decontamination scan
  * is a shuffle-free projection. */
case class BloomTextHits(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {

  override val nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (ArrayType(LongType, _),
            ArrayType(org.apache.spark.sql.types.StringType, _), IntegerType) =>
        third match {
          // a k < 1 makes the all-positions-set loop vacuous — every
          // shingle would count as a hit, silently: reject at analysis
          // when k is a literal (the kernel's require() backstops the
          // non-literal case at runtime)
          case Literal(k: Int, _) if k < 1 => TypeCheckResult.TypeCheckFailure(
            s"$prettyName numHashes must be >= 1, got $k")
          case _ => TypeCheckResult.TypeCheckSuccess
        }
      case _ => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects (array<bigint>, array<string>, int)")
    }

  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_bloom_text_hits"

  override protected def nullSafeEval(bm: Any, arr: Any, k: Any): Any =
    BloomFilterOps.md5HitCount(bm.asInstanceOf[ArrayData],
      arr.asInstanceOf[ArrayData], k.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (bm, arr, k) => {
      s"${ev.value} = graft.functions.BloomFilterOps.md5HitCount($bm, $arr, $k);"
    })

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): BloomTextHits =
    copy(first = f, second = s, third = t)
}

object BloomTextHits {
  private val ident = new FunctionIdentifier("graft_bloom_text_hits")

  def ensureRegistered(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    if (!registry.functionExists(ident)) {
      registry.registerFunction(
        ident,
        new ExpressionInfo(classOf[BloomTextHits].getName, "graft_bloom_text_hits"),
        (children: Seq[Expression]) =>
          BloomTextHits(children(0), children(1), children(2)))
    }
  }

  def column(spark: SparkSession, bitmap: Column, shingles: Column,
      numHashes: Int): Column = {
    ensureRegistered(spark)
    org.apache.spark.sql.functions.call_function("graft_bloom_text_hits",
      bitmap, shingles, org.apache.spark.sql.functions.lit(numHashes))
  }
}

/** [[BloomTextHits]] reading its bitmap from a REAL Spark broadcast
  * instead of a plan literal: at production sizing (2^27 bits = 16 MiB)
  * a `typedlit` bitmap embeds 2M longs in every LogicalPlan copy,
  * explain string and canonicalization pass — the DRIVER pays the
  * literal on every plan operation even though executors receive the
  * task binary only once. Here the plan carries an O(1) node; the
  * bitmap crosses the wire once per executor as a broadcast block and
  * the generated code reads it through a captured reference
  * (`ctx.addReferenceObj`). Scoring arithmetic is [[BloomFilterOps
  * .md5HitCountWords]] — the identical double-hash kernel, so the
  * scorecard is bit-for-bit the literal path's (d22's oracle replays
  * it unchanged). Not SQL-registrable (a broadcast handle cannot ride
  * a function argument); the SQL surface keeps [[BloomTextHits]]. */
case class BloomBroadcastTextHits(child: Expression,
    bitmapBc: org.apache.spark.broadcast.Broadcast[Array[Long]],
    numHashes: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  require(numHashes >= 1, s"$prettyName numHashes must be >= 1, got $numHashes")

  override val nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(org.apache.spark.sql.types.StringType, _) =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects array<string> shingles")
    }

  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_bloom_text_hits_bc"

  override protected def nullSafeEval(arr: Any): Any =
    BloomFilterOps.md5HitCountWords(bitmapBc.value,
      arr.asInstanceOf[ArrayData], numHashes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr => {
      val bcRef = ctx.addReferenceObj("bloomBitmapBc", bitmapBc,
        classOf[org.apache.spark.broadcast.Broadcast[Array[Long]]].getName)
      s"${ev.value} = graft.functions.BloomFilterOps.md5HitCountWords(" +
        s"(long[]) $bcRef.value(), $arr, $numHashes);"
    })

  override protected def withNewChildInternal(
      newChild: Expression): BloomBroadcastTextHits =
    copy(child = newChild)
}

/** Codegen membership test: `mightContain(bitmap, key, numHashes)`.
  * The bitmap rides as a foldable array literal, so whole-stage codegen
  * hoists it; per row the generated code is one static call on the
  * shared kernel. */
case class BloomMightContain(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {

  override val nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (ArrayType(LongType, _), LongType, IntegerType) =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects (array<bigint>, bigint, int)")
    }

  override def dataType: DataType = BooleanType
  override def prettyName: String = "graft_bloom_contains"

  override protected def nullSafeEval(bm: Any, key: Any, k: Any): Any =
    BloomFilterOps.mightContain(bm.asInstanceOf[ArrayData],
      key.asInstanceOf[Long], k.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (bm, key, k) => {
      s"${ev.value} = graft.functions.BloomFilterOps.mightContain($bm, $key, $k);"
    })

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): BloomMightContain =
    copy(first = f, second = s, third = t)
}

object BloomMightContain {
  private val ident = new FunctionIdentifier("graft_bloom_contains")

  def ensureRegistered(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    if (!registry.functionExists(ident)) {
      registry.registerFunction(
        ident,
        new ExpressionInfo(classOf[BloomMightContain].getName, "graft_bloom_contains"),
        (children: Seq[Expression]) =>
          BloomMightContain(children(0), children(1), children(2)))
    }
  }

  def column(spark: SparkSession, bitmap: Column, key: Column, numHashes: Int): Column = {
    ensureRegistered(spark)
    org.apache.spark.sql.functions.call_function("graft_bloom_contains",
      bitmap, key, org.apache.spark.sql.functions.lit(numHashes))
  }
}
