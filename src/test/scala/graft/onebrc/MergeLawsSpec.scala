package graft.onebrc

import org.scalacheck.{Gen, Prop, Properties}
import OneBrc.{BrcAggregator, BrcBuf, Measurement}

/** SURVEY §5.2: the partial-agg merge must be a commutative monoid — the
  * law every reference engine silently relies on when it folds per-chunk
  * maps in arbitrary thread-completion order (rust_1brc/src/main.rs:159-169
  * merges under a mutex in whichever order threads finish; purple_mist.rs
  * try_reduce is explicitly order-free). Identities per purple_mist.rs:16-25.
  */
object MergeLawsSpec extends Properties("BrcAggregator") {

  private val measurement: Gen[Measurement] = for {
    st <- Gen.oneOf("Abha", "Zürich", "St. John's", "A")
    tenths <- Gen.chooseNum(-999, 999)
  } yield Measurement(st, tenths / 10.0)

  private def bufOf(ms: Seq[Measurement]): BrcBuf =
    ms.foldLeft(BrcAggregator.zero)(BrcAggregator.reduce)

  private def freeze(b: BrcBuf): (Long, Long, Long, Long) =
    (b.count, b.minC, b.maxC, b.sumC)

  // note: reduce/merge mutate their left argument, so every law re-derives
  // fresh buffers from the raw measurements before merging

  property("merge is commutative") =
    Prop.forAll(Gen.listOf(measurement), Gen.listOf(measurement)) { (xs, ys) =>
      freeze(BrcAggregator.merge(bufOf(xs), bufOf(ys))) ==
        freeze(BrcAggregator.merge(bufOf(ys), bufOf(xs)))
    }

  property("merge is associative") =
    Prop.forAll(Gen.listOf(measurement), Gen.listOf(measurement),
      Gen.listOf(measurement)) { (xs, ys, zs) =>
      val l = BrcAggregator.merge(BrcAggregator.merge(bufOf(xs), bufOf(ys)), bufOf(zs))
      val r = BrcAggregator.merge(bufOf(xs), BrcAggregator.merge(bufOf(ys), bufOf(zs)))
      freeze(l) == freeze(r)
    }

  property("zero is the merge identity") =
    Prop.forAll(Gen.listOf(measurement)) { xs =>
      freeze(BrcAggregator.merge(bufOf(xs), BrcAggregator.zero)) == freeze(bufOf(xs)) &&
        freeze(BrcAggregator.merge(BrcAggregator.zero, bufOf(xs))) == freeze(bufOf(xs))
    }

  property("any split of the input merges to the same state") =
    Prop.forAll(Gen.listOf(measurement), Gen.chooseNum(0, 100)) { (xs, cut) =>
      val k = if (xs.isEmpty) 0 else cut % (xs.length + 1)
      val (a, b) = xs.splitAt(k)
      freeze(BrcAggregator.merge(bufOf(a), bufOf(b))) == freeze(bufOf(xs))
    }

  property("finish: min <= mean <= max (1dp rounding respected)") =
    Prop.forAll(Gen.nonEmptyListOf(measurement)) { xs =>
      val out = BrcAggregator.finish(bufOf(xs))
      out.min_measure - 0.05 <= out.mean_measure &&
        out.mean_measure <= out.max_measure + 0.05
    }
}
