package graft.functions

import org.scalacheck.{Gen, Prop, Properties}
import KmvSketchAgg.{Buf, K}

/** The KMV buffer must behave like a distributive sketch: any partition of
  * the input into partial buffers, merged in any order, must equal the
  * single-buffer result — the law the partial→final exchange relies on.
  * Plus: dedup (re-adding a seen key is a no-op), the k-smallest bound,
  * serialization round-trip, and agreement with a brute-force reference.
  */
object KmvLawsSpec extends Properties("KmvSketchAgg") {

  private def bufOf(keys: Seq[String]): Buf = {
    val b = new Buf
    keys.foreach(k => b.add(KmvSketchAgg.hash48(k)))
    b
  }

  private def merged(a: Buf, b: Buf): Buf = {
    val m = new Buf
    a.set.forEach(h => m.add(h))
    b.set.forEach(h => m.add(h))
    m
  }

  private def freeze(b: Buf): Seq[Long] = {
    import scala.jdk.CollectionConverters._
    // iterate, don't map the Set adapter: mapping a Set builds a HashSet
    // and loses the TreeSet's ascending order
    b.set.iterator().asScala.map(_.longValue()).toList
  }

  private val keys: Gen[List[String]] =
    Gen.listOf(Gen.chooseNum(0, 500).map(i => s"key_$i"))

  property("any split+merge equals the single-pass buffer") =
    Prop.forAll(keys, Gen.chooseNum(0, 100)) { (ks, cut0) =>
      val cut = if (ks.isEmpty) 0 else cut0 % (ks.size + 1)
      val (l, r) = ks.splitAt(cut)
      freeze(merged(bufOf(l), bufOf(r))) == freeze(bufOf(ks))
    }

  property("merge is commutative") =
    Prop.forAll(keys, keys) { (xs, ys) =>
      freeze(merged(bufOf(xs), bufOf(ys))) ==
        freeze(merged(bufOf(ys), bufOf(xs)))
    }

  property("duplicates never change the buffer") =
    Prop.forAll(keys) { ks =>
      freeze(bufOf(ks ++ ks ++ ks.reverse)) == freeze(bufOf(ks))
    }

  property("buffer holds the k smallest distinct hashes, capped at K") =
    Prop.forAll(keys) { ks =>
      val expect = ks.map(KmvSketchAgg.hash48).distinct.sorted.take(K)
      freeze(bufOf(ks)) == expect
    }

  property("serialize/deserialize round-trips") =
    Prop.forAll(keys) { ks =>
      val agg = KmvSketchAgg(org.apache.spark.sql.catalyst.expressions.Literal("x"))
      freeze(agg.deserialize(agg.serialize(bufOf(ks)))) == freeze(bufOf(ks))
    }
}
