package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.BoundReference
import org.apache.spark.sql.types.StringType
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.{Gen, Prop, Properties}
import FreqSketchAgg.{Buf, K}

/** Misra-Gries guarantees, checked on the PRODUCTION update/merge/
  * serialize methods against brute-force exact counts. Unlike KMV, the
  * sketch's estimates are NOT split-invariant (each merge tree yields
  * different counters) — what IS invariant, and what q106's contract
  * asserts, is the error envelope: estimates never overcount, undercount
  * by at most n/(K+1), and every item above that threshold stays in the
  * sketch. The generators draw Zipf-ish streams from an alphabet larger
  * than K so eviction and the merge-shrink path genuinely fire.
  */
object FreqSketchLawsSpec extends Properties("FreqSketchAgg") {

  private val agg = FreqSketchAgg(BoundReference(0, StringType, nullable = true))

  private def bufOf(keys: Seq[String]): Buf =
    keys.foldLeft(agg.createAggregationBuffer()) { (b, k) =>
      agg.update(b, InternalRow(UTF8String.fromString(k)))
    }

  // Zipf-ish: key i drawn with weight ~ 1/(i+1), alphabet 3*K > K so the
  // buffer overflows and decrement/evict paths are exercised
  private val zipfKey: Gen[String] =
    Gen.chooseNum(0.0, 1.0).map { u =>
      val n = 3 * K
      val harmonic = (1 to n).map(1.0 / _).sum
      var acc = 0.0
      var i = 1
      while (i < n && acc + 1.0 / (i * harmonic) < u) {
        acc += 1.0 / (i * harmonic); i += 1
      }
      s"key_$i"
    }
  private val streams: Gen[List[String]] = Gen.listOf(zipfKey)

  private def envelopeHolds(b: Buf, ks: Seq[String]): Prop = {
    val exact = ks.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val n = ks.size.toLong
    val overcounts = b.counters.filter { case (k, est) =>
      est > exact.getOrElse(k, 0L)
    }
    val misses = exact.filter { case (k, cnt) =>
      cnt - b.counters.getOrElse(k, 0L) > n / (K + 1)
    }
    Prop(overcounts.isEmpty && misses.isEmpty && b.counters.size <= K) :|
      s"overcounts=$overcounts misses=$misses size=${b.counters.size}"
  }

  property("single-pass: error envelope holds, state capped at K") =
    Prop.forAll(streams) { ks => envelopeHolds(bufOf(ks), ks) }

  property("any split + merge keeps the envelope over the COMBINED stream") =
    Prop.forAll(streams, streams, streams) { (xs, ys, zs) =>
      // two merge shapes over three partials — associativity of the
      // guarantee (not of the counter values, which may differ)
      val lr = agg.merge(agg.merge(bufOf(xs), bufOf(ys)), bufOf(zs))
      val rl = agg.merge(bufOf(xs), agg.merge(bufOf(ys), bufOf(zs)))
      envelopeHolds(lr, xs ++ ys ++ zs) && envelopeHolds(rl, xs ++ ys ++ zs)
    }

  property("nulls never change the buffer") =
    Prop.forAll(streams) { ks =>
      val b = agg.update(bufOf(ks), InternalRow(null))
      b.counters == bufOf(ks).counters
    }

  property("serialize/deserialize round-trips") =
    Prop.forAll(streams) { ks =>
      agg.deserialize(agg.serialize(bufOf(ks))).counters == bufOf(ks).counters
    }

  property("below K distinct keys the sketch is exact") =
    Prop.forAll(Gen.listOf(Gen.chooseNum(0, K - 1).map(i => s"k$i"))) { ks =>
      val exact = ks.groupBy(identity).view.mapValues(_.size.toLong).toMap
      bufOf(ks).counters.toMap == exact
    }
}
