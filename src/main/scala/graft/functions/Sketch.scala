package graft.functions

import java.io.{ByteArrayOutputStream, DataOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftShim
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Mergeable frequency-sketch aggregates (SURVEY.md §2, q109).
  *
  * [[MisraGriesAgg]] is the Misra–Gries heavy-hitters summary (Misra &
  * Gries 1982; merge rule from Agarwal et al., "Mergeable Summaries",
  * PODS 2012 — both public literature) as a native
  * `TypedImperativeAggregate`: the same mergeable-sketch machinery
  * Spark's own `approx_percentile`/HLL aggregates use, so it rides the
  * standard two-phase aggregation — per-partition `update` (map-side
  * partial), `merge` at the reduce — and never shuffles token rows.
  *
  * Guarantees (independent of partitioning and merge order, which is
  * what makes the q109 certification DETERMINISTIC even though the
  * summary's exact contents are not):
  *   - estimates never overestimate: `est(x) ≤ count(x)`;
  *   - with `counters = c`, the underestimate is bounded:
  *     `count(x) − est(x) ≤ N/(c+1)` (update AND merge preserve it);
  *   - every item with `count(x) > N/(c+1)` is present in the summary.
  * q109 certifies against the WEAKER `N/c` bound, leaving a margin.
  */
object Sketch {

  /** Misra–Gries summary over a string column: at most `counters`
    * (token → lower-bound count) entries, emitted as a
    * `map<string,bigint>` sorted by token (deterministic rendering of
    * a partition-order-dependent summary — callers should treat the
    * CONTENTS as approximate and certify, q109-style, never hash the
    * raw map across runs). */
  case class MisraGriesAgg(child: Expression, counters: Int,
                           mutableAggBufferOffset: Int = 0,
                           inputAggBufferOffset: Int = 0)
      extends TypedImperativeAggregate[java.util.HashMap[UTF8String, java.lang.Long]]
      with UnaryLike[Expression] {
    require(counters >= 1, s"counters must be >= 1, got $counters")

    override def prettyName: String = "graft_misra_gries"
    override def nullable: Boolean = false
    override def dataType: DataType =
      MapType(StringType, LongType, valueContainsNull = false)

    override def checkInputDataTypes(): TypeCheckResult =
      if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"$prettyName needs a string column, got ${child.dataType.sql}")

    override def createAggregationBuffer(): java.util.HashMap[UTF8String, java.lang.Long] =
      new java.util.HashMap[UTF8String, java.lang.Long]()

    override def update(buf: java.util.HashMap[UTF8String, java.lang.Long],
                        input: InternalRow): java.util.HashMap[UTF8String, java.lang.Long] = {
      val v = child.eval(input)
      if (v != null) {
        val tok = v.asInstanceOf[UTF8String]
        val cur = buf.get(tok)
        if (cur != null) buf.put(tok, cur + 1L)
        else if (buf.size < counters) buf.put(tok.clone(), java.lang.Long.valueOf(1L))
        else {
          // classic MG step: a full summary meets a new item → every
          // counter pays one; zeros evict (the new item is "absorbed")
          val it = buf.entrySet().iterator()
          while (it.hasNext) {
            val e = it.next()
            if (e.getValue == 1L) it.remove()
            else e.setValue(e.getValue - 1L)
          }
        }
      }
      buf
    }

    override def merge(buf: java.util.HashMap[UTF8String, java.lang.Long],
                       other: java.util.HashMap[UTF8String, java.lang.Long])
        : java.util.HashMap[UTF8String, java.lang.Long] = {
      val it = other.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        val cur = buf.get(e.getKey)
        if (cur != null) buf.put(e.getKey, cur + e.getValue)
        else buf.put(e.getKey, e.getValue) // keys from `other` are already owned copies
      }
      if (buf.size > counters) {
        // Agarwal et al. merge reduction: subtract the (counters+1)-th
        // largest counter from all, keep positives — size back ≤ c and
        // the N/(c+1) error bound is preserved through any merge tree
        val vals = new Array[Long](buf.size)
        var i = 0
        val vit = buf.values().iterator()
        while (vit.hasNext) { vals(i) = vit.next(); i += 1 }
        java.util.Arrays.sort(vals)
        val sub = vals(buf.size - counters - 1) // (c+1)-th largest
        val eit = buf.entrySet().iterator()
        while (eit.hasNext) {
          val e = eit.next()
          if (e.getValue <= sub) eit.remove()
          else e.setValue(e.getValue - sub)
        }
      }
      buf
    }

    override def eval(buf: java.util.HashMap[UTF8String, java.lang.Long]): Any = {
      val ks = new Array[UTF8String](buf.size)
      buf.keySet().toArray(ks)
      // deterministic rendering (binary UTF8 order)
      java.util.Arrays.sort(ks, new java.util.Comparator[UTF8String] {
        override def compare(a: UTF8String, b: UTF8String): Int = a.compareTo(b)
      })
      val vs = new Array[Any](ks.length)
      val keys = new Array[Any](ks.length)
      var i = 0
      while (i < ks.length) {
        keys(i) = ks(i); vs(i) = buf.get(ks(i)).longValue(); i += 1
      }
      new ArrayBasedMapData(new GenericArrayData(keys), new GenericArrayData(vs))
    }

    override def serialize(buf: java.util.HashMap[UTF8String, java.lang.Long]): Array[Byte] = {
      val bos = new ByteArrayOutputStream()
      val out = new DataOutputStream(bos)
      out.writeInt(buf.size)
      val it = buf.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        val b = e.getKey.getBytes
        out.writeInt(b.length); out.write(b); out.writeLong(e.getValue)
      }
      out.flush()
      bos.toByteArray
    }

    override def deserialize(bytes: Array[Byte]): java.util.HashMap[UTF8String, java.lang.Long] = {
      val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
      val n = in.readInt()
      val buf = new java.util.HashMap[UTF8String, java.lang.Long](n * 2)
      var i = 0
      while (i < n) {
        val len = in.readInt()
        val b = new Array[Byte](len)
        in.readFully(b)
        buf.put(UTF8String.fromBytes(b), java.lang.Long.valueOf(in.readLong()))
        i += 1
      }
      buf
    }

    override def withNewMutableAggBufferOffset(newOffset: Int): MisraGriesAgg =
      copy(mutableAggBufferOffset = newOffset)
    override def withNewInputAggBufferOffset(newOffset: Int): MisraGriesAgg =
      copy(inputAggBufferOffset = newOffset)
    override protected def withNewChildInternal(newChild: Expression): MisraGriesAgg =
      copy(child = newChild)
  }

  def misraGries(tok: Column, counters: Int): Column =
    GraftShim.column(
      MisraGriesAgg(GraftShim.expression(tok), counters).toAggregateExpression())
}
