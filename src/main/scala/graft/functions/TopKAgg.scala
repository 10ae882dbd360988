package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** Exact per-group top-k as a PARTIAL-aggregable custom aggregate: each
  * map task keeps at most k (value, id) pairs per group, so only
  * `k * partitions` rows per group ever shuffle — the window-function
  * formulation (`row_number over (partition by g order by v)`) shuffles
  * EVERY row of every group and sorts them. Identical result by
  * construction: ordering is (value desc, id asc), a total order, so
  * top-k is unique and merge-order-independent.
  *
  * Buffer = bounded insertion-sorted array (k is small by definition;
  * O(k) insert beats heap constant factors and serializes trivially).
  * `eval` returns the ids in rank order (`array<bigint>`) — callers
  * posexplode to (rank, id) rows.
  */
case class TopKAgg(
    valueChild: Expression, idChild: Expression, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKAgg.Buffer] {

  override def children: Seq[Expression] = Seq(valueChild, idChild)

  override def checkInputDataTypes(): TypeCheckResult =
    (valueChild.dataType, idChild.dataType) match {
      case (DoubleType, LongType) if k >= 1 => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects (double, bigint) and k >= 1")
    }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "graft_top_k"

  override def createAggregationBuffer(): TopKAgg.Buffer = new TopKAgg.Buffer(k)

  override def update(b: TopKAgg.Buffer, input: InternalRow): TopKAgg.Buffer = {
    val v = valueChild.eval(input)
    val id = idChild.eval(input)
    if (v != null && id != null)
      b.offer(v.asInstanceOf[Double], id.asInstanceOf[Long])
    b
  }

  override def merge(b: TopKAgg.Buffer, o: TopKAgg.Buffer): TopKAgg.Buffer = {
    var i = 0
    while (i < o.size) { b.offer(o.values(i), o.ids(i)); i += 1 }
    b
  }

  override def eval(b: TopKAgg.Buffer): Any = {
    val out = new Array[Long](b.size)
    var i = 0
    while (i < b.size) { out(i) = b.ids(i); i += 1 }
    new GenericArrayData(out)
  }

  override def serialize(b: TopKAgg.Buffer): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + b.size * 16)
    bb.putInt(b.size)
    var i = 0
    while (i < b.size) { bb.putDouble(b.values(i)); bb.putLong(b.ids(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKAgg.Buffer = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt()
    val b = new TopKAgg.Buffer(k)
    var i = 0
    while (i < n) { b.offer(bb.getDouble(), bb.getLong()); i += 1 }
    b
  }

  override def withNewMutableAggBufferOffset(o: Int): TopKAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): TopKAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKAgg =
    copy(valueChild = newChildren(0), idChild = newChildren(1))
}

object TopKAgg {

  /** Rank-ordered bounded buffer: slot 0 is the best (value desc, id
    * asc). Insertion keeps order, so merge and eval never sort. */
  final class Buffer(val k: Int) {
    val values = new Array[Double](k)
    val ids = new Array[Long](k)
    var size = 0

    /** True iff (v1, id1) ranks strictly better than (v2, id2).
      * SQL double-ordering semantics (Spark's SQLOrderingUtil /
      * DuckDB): NaN orders as the LARGEST double and equal to itself,
      * while -0.0 TIES 0.0 (primitive ==) — `Double.compare` would
      * split the zeros and skip the id tie-break, diverging from the
      * window formulation; a raw `>` is not a total order under NaN at
      * all (a NaN would poison the buffer tail). */
    @inline private def beats(v1: Double, id1: Long, v2: Double, id2: Long) = {
      val gt = v1 > v2 || (v1.isNaN && !v2.isNaN)
      val eq = v1 == v2 || (v1.isNaN && v2.isNaN)
      gt || (eq && id1 < id2)
    }

    def offer(v: Double, id: Long): Unit = {
      if (size < k || beats(v, id, values(size - 1), ids(size - 1))) {
        var i = if (size < k) size else k - 1
        while (i > 0 && beats(v, id, values(i - 1), ids(i - 1))) {
          values(i) = values(i - 1); ids(i) = ids(i - 1); i -= 1
        }
        values(i) = v; ids(i) = id
        if (size < k) size += 1
      }
    }
  }

  private val ident = new FunctionIdentifier("graft_top_k")

  def ensureRegistered(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    if (!registry.functionExists(ident)) {
      registry.registerFunction(
        ident,
        new ExpressionInfo(classOf[TopKAgg].getName, "graft_top_k"),
        (children: Seq[Expression]) => {
          val k = children(2) match {
            case Literal(v: Int, _) => v
            case other => throw new IllegalArgumentException(
              s"graft_top_k(value, id, k): k must be an integer literal, got $other")
          }
          TopKAgg(children(0), children(1), k)
        })
    }
  }

  def column(spark: SparkSession, value: Column, id: Column, k: Int): Column = {
    ensureRegistered(spark)
    org.apache.spark.sql.functions.call_function(
      "graft_top_k", value, id, org.apache.spark.sql.functions.lit(k))
  }
}
