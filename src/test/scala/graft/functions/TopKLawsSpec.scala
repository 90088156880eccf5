package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BoundReference, Literal}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.{Gen, Prop, Properties}

/** topk_rows must behave like a distributive aggregate: any partition of
  * the input into partial buffers, merged in any order, must equal the
  * single-pass buffer — the law the map-side combine relies on — and the
  * buffer must hold exactly the k best rows under (score desc, tiebreak
  * asc), matching an independent sort-based model. All laws exercise the
  * PRODUCTION methods (update/merge/serialize/deserialize/eval).
  */
object TopKLawsSpec extends Properties("TopKRowsAgg") {

  private val st = new StructType()
    .add("score", DoubleType).add("tb", StringType).add("p", LongType)
  private val agg = TopKRowsAgg(
    BoundReference(0, st, nullable = true), Literal(3))
  private val K = 3

  private def row(x: (Double, String, Long)): InternalRow =
    InternalRow(InternalRow(x._1, UTF8String.fromString(x._2), x._3))

  private def bufOf(xs: Seq[(Double, String, Long)]): TopKRowsAgg.Buf =
    xs.foldLeft(agg.createAggregationBuffer()) { (b, x) => agg.update(b, row(x)) }

  private def freeze(b: TopKRowsAgg.Buf): List[(Double, String, Long)] = {
    import scala.jdk.CollectionConverters._
    b.set.iterator().asScala
      .map(r => (r.getDouble(0), r.getUTF8String(1).toString, r.getLong(2)))
      .toList
  }

  /** independent model: sort by (score desc, tb asc), take k */
  private def model(xs: Seq[(Double, String, Long)]): List[(Double, String, Long)] =
    xs.distinctBy(x => (x._1, x._2))
      .sortBy { case (s, tb, _) => (-s, tb) }.take(K).toList

  // unique (score, tb) pairs by construction — the aggregate's documented
  // contract (full-key duplicates collapse, tested separately below)
  private val rows: Gen[List[(Double, String, Long)]] =
    Gen.listOf(Gen.zip(Gen.chooseNum(0, 9), Gen.chooseNum(0, 1000), Gen.long))
      .map(_.map { case (s, t, p) => (s.toDouble, f"t$t%04d", p) }
        .distinctBy(x => (x._1, x._2)))

  property("buffer == independent sort-based top-k model") =
    Prop.forAll(rows) { xs => freeze(bufOf(xs)) == model(xs) }

  property("any split+merge equals the single-pass buffer") =
    Prop.forAll(rows, Gen.chooseNum(0, 100)) { (xs, cut0) =>
      val cut = if (xs.isEmpty) 0 else cut0 % (xs.size + 1)
      val (l, r) = xs.splitAt(cut)
      freeze(agg.merge(bufOf(l), bufOf(r))) == freeze(bufOf(xs))
    }

  property("merge is commutative") =
    Prop.forAll(rows, rows) { (xs0, ys0) =>
      // cross-list (score, tb) collisions with different payloads would be
      // genuinely order-dependent (documented contract) — drop them
      val ks = xs0.map(x => (x._1, x._2)).toSet
      val ys = ys0.filterNot(y => ks((y._1, y._2)))
      freeze(agg.merge(bufOf(xs0), bufOf(ys))) ==
        freeze(agg.merge(bufOf(ys), bufOf(xs0)))
    }

  property("exact full-key duplicates collapse; nulls are ignored") =
    Prop.forAll(rows) { xs =>
      val b = agg.update(bufOf(xs ++ xs), InternalRow(null))
      freeze(b) == freeze(bufOf(xs))
    }

  property("serialize/deserialize roundtrips the buffer") =
    Prop.forAll(rows) { xs =>
      val b = bufOf(xs)
      freeze(agg.deserialize(agg.serialize(b))) == freeze(b)
    }

  property("eval returns best-first; index i is rank i+1") =
    Prop.forAll(rows) { xs =>
      val arr = agg.eval(bufOf(xs))
        .asInstanceOf[org.apache.spark.sql.catalyst.util.GenericArrayData]
      val got = (0 until arr.numElements()).map { i =>
        val r = arr.get(i, st).asInstanceOf[InternalRow]
        (r.getDouble(0), r.getUTF8String(1).toString, r.getLong(2))
      }.toList
      got == model(xs)
    }
}
