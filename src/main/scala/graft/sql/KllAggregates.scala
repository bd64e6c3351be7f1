package graft.sql

import graft.operators.Kll
import graft.operators.Kll.KllBuf

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._

/** Shared output schema of the KLL aggregates:
  * struct<k int, comps bigint, levels array<array<bigint>>>. */
object KllSchema {
  val sketchType: StructType = StructType(Seq(
    StructField("k", IntegerType, nullable = false),
    StructField("comps", LongType, nullable = false),
    StructField("levels", ArrayType(ArrayType(LongType, containsNull = false),
      containsNull = false), nullable = false)))

  def toRow(b: KllBuf): GenericInternalRow =
    new GenericInternalRow(Array[Any](b.k, b.comps,
      new GenericArrayData(b.levels.map(l =>
        new GenericArrayData(l.toArray)).toArray[Any])))

  def fromRow(r: InternalRow): KllBuf = {
    val b = new KllBuf(r.getInt(0))
    b.comps = r.getLong(1)
    val levels = r.getArray(2)
    var h = 0
    while (h < levels.numElements()) {
      while (b.levels.length <= h) b.levels += scala.collection.mutable.ArrayBuffer.empty[Long]
      val l = levels.getArray(h)
      var i = 0
      while (i < l.numElements()) { b.levels(h) += l.getLong(i); i += 1 }
      h += 1
    }
    b.recount()
    b
  }
}

/** `kll_sketch(value, k)` — native Catalyst KLL sketch aggregate
  * (TypedImperativeAggregate: the buffer is a real JVM object, binary-
  * serialized only across the partial-aggregation shuffle — per-row
  * updates never touch serialization, which is what keeps the 10M-row
  * gate map-side cheap). `k` must be a foldable integer ≥ 8; null values
  * are skipped, as SQL aggregates do.
  */
case class KllSketchAgg(child: Expression, kExpr: Expression,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KllBuf] {

  private lazy val k: Int = kExpr.eval(null) match {
    case i: Int => i
    case other => throw new IllegalArgumentException(
      s"kll_sketch: k must be a foldable INT literal, got $other")
  }

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == LongType && kExpr.dataType == IntegerType && kExpr.foldable)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"kll_sketch expects (BIGINT value, foldable INT k), got " +
        s"(${child.dataType}, ${kExpr.dataType})")
  override def children: Seq[Expression] = Seq(child, kExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = KllSchema.sketchType

  override def createAggregationBuffer(): KllBuf = new KllBuf(k)

  override def update(b: KllBuf, input: InternalRow): KllBuf = {
    val v = child.eval(input)
    if (v != null) b.update(v.asInstanceOf[Long])
    b
  }

  override def merge(b: KllBuf, o: KllBuf): KllBuf = { b.mergeIn(o); b }

  override def eval(b: KllBuf): Any = KllSchema.toRow(b)

  override def serialize(b: KllBuf): Array[Byte] = Kll.serialize(b)
  override def deserialize(bytes: Array[Byte]): KllBuf = Kll.deserialize(bytes)

  override def withNewMutableAggBufferOffset(n: Int): KllSketchAgg =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): KllSketchAgg =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): KllSketchAgg =
    copy(child = newChildren(0), kExpr = newChildren(1))
  override def prettyName: String = "kll_sketch"
}

/** `kll_sketch_w(value, weight, k)` — weighted KLL sketch over
  * PRE-AGGREGATED (value, count) rows: each row inserts its value once
  * per set bit of the count (level h carries weight 2^h), so a
  * vocabulary-sized frequency table sketches in O(rows·popcount) without
  * ever re-expanding to corpus size. Null values or weights skip; zero
  * weights add nothing. */
case class KllWeightedAgg(child: Expression, weight: Expression,
    kExpr: Expression,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KllBuf] {

  private lazy val k: Int = kExpr.eval(null) match {
    case i: Int => i
    case other => throw new IllegalArgumentException(
      s"kll_sketch_w: k must be a foldable INT literal, got $other")
  }

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == LongType && weight.dataType == LongType &&
        kExpr.dataType == IntegerType && kExpr.foldable)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"kll_sketch_w expects (BIGINT value, BIGINT weight, foldable INT k), got " +
        s"(${child.dataType}, ${weight.dataType}, ${kExpr.dataType})")
  override def children: Seq[Expression] = Seq(child, weight, kExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = KllSchema.sketchType

  override def createAggregationBuffer(): KllBuf = new KllBuf(k)

  override def update(b: KllBuf, input: InternalRow): KllBuf = {
    val v = child.eval(input)
    val w = weight.eval(input)
    if (v != null && w != null)
      b.updateWeighted(v.asInstanceOf[Long], w.asInstanceOf[Long])
    b
  }

  override def merge(b: KllBuf, o: KllBuf): KllBuf = { b.mergeIn(o); b }
  override def eval(b: KllBuf): Any = KllSchema.toRow(b)
  override def serialize(b: KllBuf): Array[Byte] = Kll.serialize(b)
  override def deserialize(bytes: Array[Byte]): KllBuf = Kll.deserialize(bytes)

  override def withNewMutableAggBufferOffset(n: Int): KllWeightedAgg =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): KllWeightedAgg =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): KllWeightedAgg =
    copy(child = newChildren(0), weight = newChildren(1), kExpr = newChildren(2))
  override def prettyName: String = "kll_sketch_w"
}

/** `kll_merge(sketch)` — re-aggregates KLL sketch structs (per-day →
  * per-month rollup without re-touching the data). Merging concatenates
  * level-wise then re-compacts to capacity, so space stays O(k·log) no
  * matter how many shards roll up. */
case class KllMergeAgg(child: Expression,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KllBuf] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = KllSchema.sketchType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case s: StructType if s.length == 3 &&
        s(0).dataType == IntegerType && s(1).dataType == LongType &&
        s(2).dataType.isInstanceOf[ArrayType] =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"kll_merge expects a kll_sketch struct, got $other")
    }

  // the buffer starts empty and adopts the first NON-EMPTY input's k; an
  // all-null/all-empty group evals to an empty k=8 sketch (extraction
  // yields no rows). Empty sketches merge as no-ops regardless of their
  // k label (they carry no mass); NON-empty inputs must agree on k —
  // KllBuf.mergeIn rejects a mismatch rather than silently keeping the
  // first shard's k while inheriting the other's weaker error bound.
  override def createAggregationBuffer(): KllBuf = new KllBuf(8)
  private def isEmpty(b: KllBuf): Boolean =
    b.comps == 0L && b.levels.forall(_.isEmpty)

  override def update(b: KllBuf, input: InternalRow): KllBuf = {
    val v = child.eval(input)
    if (v == null) b
    else {
      val o = KllSchema.fromRow(v.asInstanceOf[InternalRow])
      if (isEmpty(o)) b
      else if (isEmpty(b)) o
      else { b.mergeIn(o); b }
    }
  }

  override def merge(b: KllBuf, o: KllBuf): KllBuf =
    if (isEmpty(o)) b
    else if (isEmpty(b)) o
    else { b.mergeIn(o); b }

  override def eval(b: KllBuf): Any = KllSchema.toRow(b)
  override def serialize(b: KllBuf): Array[Byte] = Kll.serialize(b)
  override def deserialize(bytes: Array[Byte]): KllBuf = Kll.deserialize(bytes)

  override def withNewMutableAggBufferOffset(n: Int): KllMergeAgg =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): KllMergeAgg =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): KllMergeAgg =
    copy(child = newChildren(0))
  override def prettyName: String = "kll_merge"
}
