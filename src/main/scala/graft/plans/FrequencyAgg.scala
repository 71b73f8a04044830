package graft.plans

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * Misra–Gries frequent-items summary as a native Catalyst aggregate
 * (`TypedImperativeAggregate`, the machinery behind Spark's own
 * `percentile_approx` / `count_min_sketch`) — bounded-memory heavy
 * hitters over a column whose cardinality is unbounded.
 *
 * Why not `groupBy(col).count.orderBy.limit`? That plan is exact and
 * fine when the vocabulary fits: partial aggregation holds ONE COUNTER
 * PER DISTINCT VALUE per task. Over 100 TB of URLs, user ids or
 * shingles the per-task hash map IS the cardinality problem. This
 * summary holds at most `capacity` counters regardless of input
 * cardinality — the classic Misra–Gries guarantee (Misra & Gries 1982;
 * merge rule from Agarwal et al., "Mergeable summaries", PODS'12 —
 * both public):
 *
 *  - every item with true count > n / (capacity + 1) is present;
 *  - each reported count underestimates by at most n / (capacity + 1)
 *    (n = total rows seen; after merges, the bound is the sum of the
 *    inputs' bounds — still n_total / (capacity + 1)).
 *
 * Update: seen key → increment; unseen with room → insert; unseen and
 * full → decrement ALL counters by 1, dropping zeros (the arriving
 * item's virtual counter hits 0 too, so it is not inserted). Merge:
 * sum counters keywise, then if over capacity subtract the
 * (capacity+1)-th largest count from every counter and drop the
 * non-positive — the summary-vs-summary form of the same decrement.
 *
 * Scale shape: map-side partial summaries (≤ capacity entries each)
 * merge at ONE final task — numPartitions × capacity entries through
 * the exchange, independent of data volume; the same two-level shape
 * as every Spark sketch aggregate. It also works per-group
 * (`groupBy(g).agg(...)`) since it is a real AggregateFunction.
 *
 * eval returns `array<struct<item, cnt>>` sorted (cnt desc, item asc)
 * — deterministic given a deterministic input multiset, because
 * update/merge order only affects WHICH sub-threshold items linger,
 * never the counts of above-threshold ones... with one caveat: items
 * near the error bound may or may not appear depending on partition
 * order. Callers wanting exact, order-independent output re-count the
 * survivors exactly (`Frequency.heavyHitters(recount = true)`).
 */
case class MisraGriesAgg(
    child: Expression,
    capacity: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[UTF8String, Long]]
  with UnaryLike[Expression] {

  override def createAggregationBuffer(): mutable.HashMap[UTF8String, Long] =
    mutable.HashMap.empty

  override def update(buf: mutable.HashMap[UTF8String, Long],
                      input: InternalRow): mutable.HashMap[UTF8String, Long] = {
    val v = child.eval(input)
    if (v != null) {
      val s = v.asInstanceOf[UTF8String]
      buf.get(s) match {
        case Some(c) => buf.update(s, c + 1L)
        case None if buf.size < capacity =>
          // the input UTF8String may point into a reused row buffer —
          // copy before it becomes a map key
          buf.update(s.clone(), 1L)
        case None =>
          buf.mapValuesInPlace((_, c) => c - 1L)
          buf.filterInPlace((_, c) => c > 0L)
      }
    }
    buf
  }

  override def merge(buf: mutable.HashMap[UTF8String, Long],
                     other: mutable.HashMap[UTF8String, Long])
      : mutable.HashMap[UTF8String, Long] = {
    other.foreach { case (k, c) =>
      buf.update(k, buf.getOrElse(k, 0L) + c)
    }
    if (buf.size > capacity) {
      val counts = buf.values.toArray
      java.util.Arrays.sort(counts)
      val cut = counts(counts.length - capacity - 1)
      buf.mapValuesInPlace((_, c) => c - cut)
      buf.filterInPlace((_, c) => c > 0L)
    }
    buf
  }

  override def eval(buf: mutable.HashMap[UTF8String, Long]): Any = {
    val entries = buf.toArray
    java.util.Arrays.sort(entries,
      (a: (UTF8String, Long), b: (UTF8String, Long)) => {
        val byCnt = java.lang.Long.compare(b._2, a._2)
        if (byCnt != 0) byCnt else a._1.compareTo(b._1)
      })
    new GenericArrayData(entries.map { case (k, c) =>
      InternalRow(k, c)
    })
  }

  override def serialize(buf: mutable.HashMap[UTF8String, Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (k, c) =>
      val b = k.getBytes
      out.writeInt(b.length)
      out.write(b)
      out.writeLong(c)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[UTF8String, Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = mutable.HashMap.empty[UTF8String, Long]
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val b = new Array[Byte](len)
      in.readFully(b)
      buf.update(UTF8String.fromBytes(b), in.readLong())
      i += 1
    }
    buf
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) {
      if (capacity >= 1) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"capacity must be >= 1, got $capacity")
    } else TypeCheckResult.TypeCheckFailure(
      s"item column must be string, got ${child.dataType.catalogString}")

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("item", StringType, nullable = false),
    StructField("cnt", LongType, nullable = false))),
    containsNull = false)

  override def nullable: Boolean = false

  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGriesAgg =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int): MisraGriesAgg =
    copy(inputAggBufferOffset = newOffset)

  override protected def withNewChildInternal(newChild: Expression): MisraGriesAgg =
    copy(child = newChild)

  override def prettyName: String = "graft_mg_summary"
}
