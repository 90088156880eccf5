package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.BoundReference
import org.apache.spark.sql.types.StringType
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.{Gen, Prop, Properties}
import KmvSketchAgg.{Buf, K}

/** The KMV aggregate must behave like a distributive sketch: any partition
  * of the input into partial buffers, merged in any order, must equal the
  * single-buffer result — the law the partial→final exchange relies on.
  * All laws exercise the PRODUCTION methods (update/merge/eval/serialize),
  * not a local re-implementation, so a regression in the aggregate itself
  * fails here and not just in the slow end-to-end oracle run.
  */
object KmvLawsSpec extends Properties("KmvSketchAgg") {

  private val agg = KmvSketchAgg(BoundReference(0, StringType, nullable = true))

  private def bufOf(keys: Seq[String]): Buf =
    keys.foldLeft(agg.createAggregationBuffer()) { (b, k) =>
      agg.update(b, InternalRow(UTF8String.fromString(k)))
    }

  private def freeze(b: Buf): Seq[Long] = {
    import scala.jdk.CollectionConverters._
    // iterate, don't map the Set adapter: mapping a Set builds a HashSet
    // and loses the TreeSet's ascending order
    b.set.iterator().asScala.map(_.longValue()).toList
  }

  // agg.merge mutates its left argument, so every law re-derives fresh
  // buffers from the raw keys before merging (same note as MergeLawsSpec)

  private val keys: Gen[List[String]] =
    Gen.listOf(Gen.chooseNum(0, 500).map(i => s"key_$i"))

  property("any split+merge equals the single-pass buffer") =
    Prop.forAll(keys, Gen.chooseNum(0, 100)) { (ks, cut0) =>
      val cut = if (ks.isEmpty) 0 else cut0 % (ks.size + 1)
      val (l, r) = ks.splitAt(cut)
      freeze(agg.merge(bufOf(l), bufOf(r))) == freeze(bufOf(ks))
    }

  property("merge is commutative") =
    Prop.forAll(keys, keys) { (xs, ys) =>
      freeze(agg.merge(bufOf(xs), bufOf(ys))) ==
        freeze(agg.merge(bufOf(ys), bufOf(xs)))
    }

  property("duplicates and nulls never change the buffer") =
    Prop.forAll(keys) { ks =>
      val withNulls = agg.update(bufOf(ks ++ ks ++ ks.reverse),
        InternalRow(null))
      freeze(withNulls) == freeze(bufOf(ks))
    }

  property("buffer holds the k smallest distinct hashes, capped at K") =
    Prop.forAll(keys) { ks =>
      val expect = ks.map(KmvSketchAgg.hash48).distinct.sorted.take(K)
      freeze(bufOf(ks)) == expect
    }

  property("eval: exact below K, (k-1)/U at or above K") =
    Prop.forAll(keys) { ks =>
      val hs = ks.map(KmvSketchAgg.hash48).distinct.sorted
      val expect =
        if (hs.size < K) hs.size.toDouble
        else (K - 1).toDouble / (hs(K - 1).toDouble / 281474976710656.0)
      agg.eval(bufOf(ks)) == expect
    }

  property("serialize/deserialize round-trips") =
    Prop.forAll(keys) { ks =>
      freeze(agg.deserialize(agg.serialize(bufOf(ks)))) == freeze(bufOf(ks))
    }
}
