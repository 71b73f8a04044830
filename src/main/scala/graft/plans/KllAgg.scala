package graft.plans

import org.apache.datasketches.kll.KllDoublesSketch
import org.apache.datasketches.memory.Memory
import org.apache.datasketches.quantilescommon.QuantileSearchCriteria

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.trees.{BinaryLike, UnaryLike}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/**
 * Mergeable KLL quantile sketches as native Catalyst aggregates — the
 * quantile member of the persisted-sketch-log family (Misra–Gries for
 * frequent items in [[MisraGriesAgg]], Count-Min for point counts,
 * Datasketches HLL for cardinality via Spark's own `hll_sketch_agg`).
 * Spark ships NO persistable quantile sketch: `percentile_approx`'s
 * KLL-like internal state cannot be stored or unioned across frames,
 * so an incremental pipeline would re-scan all history to answer "p95
 * over the last N days". These aggregates close that gap with
 * `org.apache.datasketches.kll` (already on the Spark 4 classpath —
 * it is what backs `hll_sketch_agg`'s sibling family):
 *
 *  - [[KllDoublesAgg]] builds one compact sketch binary per group
 *    from a double column — the WRITE shape: persist one row per
 *    (source, day, shard);
 *  - [[KllUnionAgg]] merges sketch binaries — the READ shape: any
 *    later union over any subset answers any percentile without
 *    touching the data again;
 *  - [[KllQuantilesExpr]] probes a sketch binary for a rank vector.
 *
 * Error contract (Karnin–Lang–Liberty, FOCS'16 — public): a sketch
 * with parameter k answers any rank within ε = getNormalizedRankError
 * (≈1.65% at the library-default k=200) with 99% confidence, and the
 * guarantee SURVIVES merging — the merged sketch of parts is a valid
 * sketch of the whole (mergeability, Agarwal et al. PODS'12). N is
 * tracked exactly through merges, so `union.getN == total rows` is a
 * deterministic pin even though quantile estimates are randomized
 * (compaction offsets), which is why gates on estimates must be
 * bounded-error verdicts, not exact compares.
 *
 * Scale shape: identical to every Spark sketch aggregate — map-side
 * partial sketches (≤ ~3 KB at k=200 for millions of rows) merge at
 * the final task; the exchange carries numPartitions × sketch bytes,
 * independent of data volume. Works per-group (real
 * AggregateFunction), so the 100 TB shape is "groupBy(day, source)
 * → one small binary row each", appended to a parquet log.
 */
case class KllDoublesAgg(
    child: Expression,
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KllDoublesSketch]
  with UnaryLike[Expression] {

  override def createAggregationBuffer(): KllDoublesSketch =
    KllDoublesSketch.newHeapInstance(k)

  override def update(buf: KllDoublesSketch,
                      input: InternalRow): KllDoublesSketch = {
    val v = child.eval(input)
    if (v != null) buf.update(v.asInstanceOf[Double])
    buf
  }

  override def merge(buf: KllDoublesSketch,
                     other: KllDoublesSketch): KllDoublesSketch = {
    buf.merge(other)
    buf
  }

  override def eval(buf: KllDoublesSketch): Any = buf.toByteArray

  override def serialize(buf: KllDoublesSketch): Array[Byte] =
    buf.toByteArray

  override def deserialize(bytes: Array[Byte]): KllDoublesSketch =
    KllDoublesSketch.heapify(Memory.wrap(bytes))

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != DoubleType)
      TypeCheckResult.TypeCheckFailure(
        s"value column must be double, got ${child.dataType.catalogString}")
    else if (k < 8 || k > 65535)
      TypeCheckResult.TypeCheckFailure(s"k must be in [8, 65535], got $k")
    else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false

  override def withNewMutableAggBufferOffset(n: Int): KllDoublesAgg =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): KllDoublesAgg =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildInternal(c: Expression): KllDoublesAgg =
    copy(child = c)
  override def prettyName: String = "graft_kll_agg"
}

/**
 * Union of persisted KLL sketch binaries (see [[KllDoublesAgg]]) —
 * merge-order-insensitive up to the sketch's own randomized
 * compaction; N is summed exactly. Null sketches are skipped.
 * Datasketches downgrades the merged sketch to the SMALLEST k seen
 * (the KLL merge contract — accuracy can only be as good as the
 * coarsest input), so `k` here just sizes the empty start buffer;
 * pass the same k the logs were built with.
 */
case class KllUnionAgg(
    child: Expression,
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KllDoublesSketch]
  with UnaryLike[Expression] {

  override def createAggregationBuffer(): KllDoublesSketch =
    KllDoublesSketch.newHeapInstance(k)

  override def update(buf: KllDoublesSketch,
                      input: InternalRow): KllDoublesSketch = {
    val v = child.eval(input)
    if (v != null)
      buf.merge(KllDoublesSketch.heapify(
        Memory.wrap(v.asInstanceOf[Array[Byte]])))
    buf
  }

  override def merge(buf: KllDoublesSketch,
                     other: KllDoublesSketch): KllDoublesSketch = {
    buf.merge(other)
    buf
  }

  override def eval(buf: KllDoublesSketch): Any = buf.toByteArray

  override def serialize(buf: KllDoublesSketch): Array[Byte] =
    buf.toByteArray

  override def deserialize(bytes: Array[Byte]): KllDoublesSketch =
    KllDoublesSketch.heapify(Memory.wrap(bytes))

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != BinaryType)
      TypeCheckResult.TypeCheckFailure(
        s"sketch column must be binary, got ${child.dataType.catalogString}")
    else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false

  override def withNewMutableAggBufferOffset(n: Int): KllUnionAgg =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): KllUnionAgg =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildInternal(c: Expression): KllUnionAgg =
    copy(child = c)
  override def prettyName: String = "graft_kll_union"
}

/**
 * Probe a KLL sketch binary for a vector of normalized ranks →
 * `array<double>` of quantile estimates (INCLUSIVE search criterion,
 * the datasketches default: smallest item whose inclusive rank ≥ r).
 * Null for a null/empty sketch (rank of nothing is undefined), null
 * elements are not allowed in `ranks`. Also exposes `getN` via rank
 * `-1.0` — a deterministic probe (N is exact through merges) used by
 * gates to pin mergeability without depending on randomized
 * estimates. Eval-only: sketch probes run once per GROUP row (a
 * groups-sized frame), never in a per-datum hot loop, so codegen
 * would buy nothing.
 */
case class KllQuantilesExpr(sketch: Expression, ranks: Expression)
  extends Expression with CodegenFallback
  with BinaryLike[Expression] {

  override def left: Expression = sketch
  override def right: Expression = ranks

  override def checkInputDataTypes(): TypeCheckResult =
    if (sketch.dataType != BinaryType)
      TypeCheckResult.TypeCheckFailure(
        s"sketch must be binary, got ${sketch.dataType.catalogString}")
    else ranks.dataType match {
      case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"ranks must be array<double>, got ${other.catalogString}")
    }

  override def dataType: DataType =
    ArrayType(DoubleType, containsNull = false)

  override def nullable: Boolean = true

  override def eval(input: InternalRow): Any = {
    val b = sketch.eval(input)
    val r = ranks.eval(input)
    if (b == null || r == null) return null
    val sk = KllDoublesSketch.heapify(
      Memory.wrap(b.asInstanceOf[Array[Byte]]))
    if (sk.isEmpty) return null
    val rs = r.asInstanceOf[ArrayData].toDoubleArray()
    val out = new Array[Double](rs.length)
    var i = 0
    while (i < rs.length) {
      out(i) =
        if (rs(i) == -1.0) sk.getN.toDouble
        else sk.getQuantile(rs(i), QuantileSearchCriteria.INCLUSIVE)
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): KllQuantilesExpr =
    copy(sketch = l, ranks = r)

  override def prettyName: String = "graft_kll_quantiles"
}

/**
 * The inverse probe of [[KllQuantilesExpr]]: normalized-rank (CDF)
 * estimates for a vector of VALUES against a KLL sketch binary →
 * `array<double>` of ranks in [0, 1] (INCLUSIVE criterion: fraction
 * of the stream ≤ the value), same ε guarantee as the quantile
 * direction. Null for a null/empty sketch. This is the monitoring
 * question "what fraction of docs are shorter than X tokens" asked
 * directly of a persisted sketch log. Eval-only for the same reason
 * as the quantile probe: one call per GROUP row.
 */
case class KllRanksExpr(sketch: Expression, values: Expression)
  extends Expression with CodegenFallback
  with BinaryLike[Expression] {

  override def left: Expression = sketch
  override def right: Expression = values

  override def checkInputDataTypes(): TypeCheckResult =
    if (sketch.dataType != BinaryType)
      TypeCheckResult.TypeCheckFailure(
        s"sketch must be binary, got ${sketch.dataType.catalogString}")
    else values.dataType match {
      case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"values must be array<double>, got ${other.catalogString}")
    }

  override def dataType: DataType =
    ArrayType(DoubleType, containsNull = false)

  override def nullable: Boolean = true

  override def eval(input: InternalRow): Any = {
    val b = sketch.eval(input)
    val v = values.eval(input)
    if (b == null || v == null) return null
    val sk = KllDoublesSketch.heapify(
      Memory.wrap(b.asInstanceOf[Array[Byte]]))
    if (sk.isEmpty) return null
    val vs = v.asInstanceOf[ArrayData].toDoubleArray()
    val out = new Array[Double](vs.length)
    var i = 0
    while (i < vs.length) {
      out(i) = sk.getRank(vs(i), QuantileSearchCriteria.INCLUSIVE)
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): KllRanksExpr =
    copy(sketch = l, values = r)

  override def prettyName: String = "graft_kll_ranks"
}
