package graft.plans

import org.apache.datasketches.memory.Memory
import org.apache.datasketches.theta.{CompactSketch, SetOperation, Sketch, Sketches, Union}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.trees.{BinaryLike, UnaryLike}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * Mergeable Theta sketches for SET-OPERATION cardinality — the
 * intersect/difference member of the persisted-sketch-log family
 * (Misra–Gries = frequent items, CMS = point counts, HLL =
 * cardinality, KLL = quantiles). HLL unions but cannot intersect:
 * "how many training docs also appear in the eval set" at 100 TB
 * needs sketch INTERSECTION, which is exactly what the Theta family
 * provides (Dasgupta et al., "Theta-Sketch Framework" — public;
 * `org.apache.datasketches.theta`, already on the Spark 4 classpath
 * next to the KLL library that [[KllDoublesAgg]] wraps).
 *
 *  - [[ThetaSketchAgg]] builds one compact sketch binary per group
 *    from a long/string key column — the WRITE shape: persist one
 *    row per (corpus, day, shard);
 *  - [[ThetaUnionAgg]] merges sketch binaries — the READ combiner:
 *    any later union over any subset is a valid sketch of the union;
 *  - [[ThetaSetOpExpr]] intersects/differences/unions TWO sketch
 *    binaries into a result sketch binary (scalar, composable);
 *  - [[ThetaEstimateExpr]] probes a sketch binary →
 *    `array(lower, estimate, upper)` at a chosen #std-devs.
 *
 * Error contract: a theta sketch is EXACT (theta == 1, estimate ==
 * true distinct count) until its retained-entry budget (nominal
 * entries = 2^lgK) fills; past that it is a fixed-size uniform
 * sample of the hashed key space with relative standard error
 * ≈ 1/sqrt(2^lgK), and getLowerBound/getUpperBound(n) bound the
 * true cardinality at n std-devs. Set operations propagate theta
 * (min over inputs), so intersection/difference estimates carry
 * their own bounds — the contract `q_theta_overlap` gates. Hashing
 * uses the library's fixed default seed: results are DETERMINISTIC
 * functions of the data, so exact-mode pins are exact compares.
 *
 * Scale shape: identical to every sketch aggregate here — map-side
 * partial unions, final merge; the exchange carries numPartitions ×
 * ≤(2^lgK · 8 B + header) per group, independent of data volume.
 */
case class ThetaSketchAgg(
    child: Expression,
    lgK: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Union]
  with UnaryLike[Expression] {

  override def createAggregationBuffer(): Union =
    SetOperation.builder().setLogNominalEntries(lgK).buildUnion()

  override def update(buf: Union, input: InternalRow): Union = {
    val v = child.eval(input)
    if (v != null) child.dataType match {
      case LongType => buf.update(v.asInstanceOf[Long])
      case IntegerType => buf.update(v.asInstanceOf[Int].toLong)
      case StringType => buf.update(v.asInstanceOf[UTF8String].toString)
      case other => throw new IllegalStateException(
        s"unreachable: $other passed checkInputDataTypes")
    }
    buf
  }

  override def merge(buf: Union, other: Union): Union = {
    buf.union(other.getResult)
    buf
  }

  override def eval(buf: Union): Any = buf.getResult.toByteArray

  override def serialize(buf: Union): Array[Byte] = buf.toByteArray

  override def deserialize(bytes: Array[Byte]): Union =
    Sketches.heapifySetOperation(Memory.wrap(bytes)).asInstanceOf[Union]

  override def checkInputDataTypes(): TypeCheckResult =
    if (!Seq(LongType, IntegerType, StringType).contains(child.dataType))
      TypeCheckResult.TypeCheckFailure(
        s"key column must be bigint/int/string, got ${child.dataType.catalogString}")
    else if (lgK < 4 || lgK > 26)
      TypeCheckResult.TypeCheckFailure(s"lgK must be in [4, 26], got $lgK")
    else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false

  override def withNewMutableAggBufferOffset(n: Int): ThetaSketchAgg =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): ThetaSketchAgg =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildInternal(c: Expression): ThetaSketchAgg =
    copy(child = c)
  override def prettyName: String = "graft_theta_agg"
}

/**
 * Union of persisted theta sketch binaries (see [[ThetaSketchAgg]])
 * — the read-time combiner; a union of valid sketches is a valid
 * sketch of the set union (theta = min over inputs). Null sketches
 * are skipped. `lgK` sizes the union gadget; pass the lgK the logs
 * were built with (a smaller one only coarsens, never corrupts).
 */
case class ThetaUnionAgg(
    child: Expression,
    lgK: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Union]
  with UnaryLike[Expression] {

  override def createAggregationBuffer(): Union =
    SetOperation.builder().setLogNominalEntries(lgK).buildUnion()

  override def update(buf: Union, input: InternalRow): Union = {
    val v = child.eval(input)
    if (v != null)
      buf.union(Sketches.heapifySketch(
        Memory.wrap(v.asInstanceOf[Array[Byte]])))
    buf
  }

  override def merge(buf: Union, other: Union): Union = {
    buf.union(other.getResult)
    buf
  }

  override def eval(buf: Union): Any = buf.getResult.toByteArray

  override def serialize(buf: Union): Array[Byte] = buf.toByteArray

  override def deserialize(bytes: Array[Byte]): Union =
    Sketches.heapifySetOperation(Memory.wrap(bytes)).asInstanceOf[Union]

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != BinaryType)
      TypeCheckResult.TypeCheckFailure(
        s"sketch column must be binary, got ${child.dataType.catalogString}")
    else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false

  override def withNewMutableAggBufferOffset(n: Int): ThetaUnionAgg =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): ThetaUnionAgg =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildInternal(c: Expression): ThetaUnionAgg =
    copy(child = c)
  override def prettyName: String = "graft_theta_union"
}

/**
 * Set operation over TWO theta sketch binaries → the RESULT sketch
 * binary (compact form): op ∈ {"intersect", "anotb", "union"}.
 * Composable — feed the output to [[ThetaEstimateExpr]] or another
 * set op; the theta framework keeps every intermediate a valid
 * sketch with propagated error bounds. Null if either input is
 * null. Eval-only: set-op probes run once per GROUP/pair row (a
 * groups-sized frame), never per datum, so codegen buys nothing.
 */
case class ThetaSetOpExpr(a: Expression, b: Expression, op: String)
  extends Expression with CodegenFallback
  with BinaryLike[Expression] {

  require(Seq("intersect", "anotb", "union").contains(op),
    s"op must be intersect/anotb/union, got $op")

  override def left: Expression = a
  override def right: Expression = b

  override def checkInputDataTypes(): TypeCheckResult =
    if (a.dataType != BinaryType || b.dataType != BinaryType)
      TypeCheckResult.TypeCheckFailure(
        s"sketches must be binary, got ${a.dataType.catalogString}, " +
          b.dataType.catalogString)
    else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true

  override def eval(input: InternalRow): Any = {
    val av = a.eval(input)
    val bv = b.eval(input)
    if (av == null || bv == null) return null
    val sa = Sketches.heapifySketch(
      Memory.wrap(av.asInstanceOf[Array[Byte]]))
    val sb = Sketches.heapifySketch(
      Memory.wrap(bv.asInstanceOf[Array[Byte]]))
    val out: CompactSketch = op match {
      case "intersect" =>
        SetOperation.builder().buildIntersection().intersect(sa, sb)
      case "anotb" =>
        SetOperation.builder().buildANotB().aNotB(sa, sb)
      case "union" =>
        // max lgK: the pair-union must never downsample below its
        // inputs (the default 4096-entry gadget would cap an exact
        // 10k-key union into estimation mode); allocation is lazy,
        // so the gadget only grows to the inputs' retained entries
        val u = SetOperation.builder().setLogNominalEntries(26)
          .buildUnion()
        u.union(sa); u.union(sb); u.getResult
    }
    out.toByteArray
  }

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): ThetaSetOpExpr =
    copy(a = l, b = r)

  override def prettyName: String = s"graft_theta_$op"
}

/**
 * Probe a theta sketch binary → `array(lower, estimate, upper)` at
 * `numStdDev` standard deviations (1..3; 3 ≈ 99.7% per probe). In
 * exact mode (theta == 1) all three equal the true distinct count —
 * the deterministic pin gates use; in estimation mode the bounds
 * bracket the truth with the advertised confidence. Null for a null
 * sketch. Eval-only for the same once-per-group-row reason as the
 * set ops.
 */
case class ThetaEstimateExpr(sketch: Expression, numStdDev: Int)
  extends Expression with CodegenFallback
  with UnaryLike[Expression] {

  require(numStdDev >= 1 && numStdDev <= 3,
    s"numStdDev must be 1..3, got $numStdDev")

  override def child: Expression = sketch

  override def checkInputDataTypes(): TypeCheckResult =
    if (sketch.dataType != BinaryType)
      TypeCheckResult.TypeCheckFailure(
        s"sketch must be binary, got ${sketch.dataType.catalogString}")
    else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType =
    ArrayType(DoubleType, containsNull = false)

  override def nullable: Boolean = true

  override def eval(input: InternalRow): Any = {
    val b = sketch.eval(input)
    if (b == null) return null
    val sk: Sketch = Sketches.heapifySketch(
      Memory.wrap(b.asInstanceOf[Array[Byte]]))
    new GenericArrayData(Array(
      sk.getLowerBound(numStdDev), sk.getEstimate,
      sk.getUpperBound(numStdDev)))
  }

  override protected def withNewChildInternal(c: Expression): ThetaEstimateExpr =
    copy(sketch = c)

  override def prettyName: String = "graft_theta_estimate"
}
