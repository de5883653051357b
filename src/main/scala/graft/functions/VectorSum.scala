package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

import java.nio.ByteBuffer

/** Elementwise sum of `array<double>` vectors — the aggregation primitive
  * behind centroid/mean-embedding computation (Lloyd's k-means rounds,
  * per-cluster mean vectors).
  *
  * Why not `posexplode` + `groupBy(key, dim)` + re-assemble? That shape
  * multiplies the row count by the dimension (64-1024x), shuffles twice
  * (once on (key, dim), once on key), and rebuilds each vector from sorted
  * struct lists. As a partial-aggregating imperative aggregate the vectors
  * are summed in place map-side and ONE row per key crosses the exchange —
  * at 100 TB a mean-embedding-per-cluster job moves k * dim doubles through
  * the shuffle instead of rows * dim.
  *
  * Null/empty semantics: null AND zero-length inputs are skipped (a
  * zero-length array carries no elements to sum, and skipping it keeps the
  * result independent of row order — it must not be conflated with the
  * internal "nothing seen" sentinel, which is also the empty array); a
  * group with no non-empty vectors yields null. Non-empty vectors in a
  * group must share their length (mismatch throws).
  */
case class VectorSum(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Double]]
  with UnaryLike[Expression] {

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true

  // fail loudly on a non-double array: getDouble over e.g. array<bigint>
  // storage would silently reinterpret the raw bits
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"vector_sum requires array<double>, got ${other.catalogString}")
    }

  /** Zero-length array = "nothing seen yet" sentinel (a real zero-dim
    * vector cannot occur: update would keep it empty and eval yields null,
    * which is the sane answer for dimensionless input anyway).
    */
  override def createAggregationBuffer(): Array[Double] = Array.emptyDoubleArray

  private def add(buf: Array[Double], v: ArrayData): Array[Double] = {
    val n = v.numElements()
    if (n == 0) buf // skip empties like nulls, regardless of arrival order
    else if (buf.isEmpty) {
      val out = new Array[Double](n)
      var i = 0
      while (i < n) { out(i) = v.getDouble(i); i += 1 }
      out
    } else {
      require(buf.length == n,
        s"vector_sum: mismatched lengths ${buf.length} vs $n")
      var i = 0
      while (i < n) { buf(i) += v.getDouble(i); i += 1 }
      buf
    }
  }

  override def update(buf: Array[Double], input: InternalRow): Array[Double] = {
    val v = child.eval(input)
    if (v == null) buf else add(buf, v.asInstanceOf[ArrayData])
  }

  override def merge(a: Array[Double], b: Array[Double]): Array[Double] =
    if (b.isEmpty) a
    else if (a.isEmpty) b
    else {
      require(a.length == b.length,
        s"vector_sum: mismatched lengths ${a.length} vs ${b.length}")
      var i = 0
      while (i < a.length) { a(i) += b(i); i += 1 }
      a
    }

  override def eval(buf: Array[Double]): Any =
    if (buf.isEmpty) null else new GenericArrayData(buf)

  override def serialize(buf: Array[Double]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + buf.length * 8)
    bb.putInt(buf.length)
    var i = 0
    while (i < buf.length) { bb.putDouble(buf(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Double] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val out = new Array[Double](n)
    var i = 0
    while (i < n) { out(i) = bb.getDouble; i += 1 }
    out
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): VectorSum =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): VectorSum =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): VectorSum =
    copy(child = newChild)
}
