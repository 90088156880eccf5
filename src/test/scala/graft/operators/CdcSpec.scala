package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** q215's whole claim is SHIFT ROBUSTNESS: an edit near the front of a
  * document must not re-fingerprint every downstream chunk. Measured
  * here on an engineered near-dup pair fed through the IDENTICAL
  * pipeline the query runs (cdcChunks), side by side with the q214
  * fixed-window scheme on the same pair. */
class CdcSpec extends SparkSpec {

  test("one prepended token: CDC keeps almost all fingerprints, " +
      "fixed windows keep none") {
    import spark.implicits._
    // a long deterministic "document" (400 pseudo-words) and a near-dup
    // with ONE token prepended — the front-edit case
    val words = (1 to 400).map(i =>
      java.lang.Long.toHexString(
        new java.math.BigInteger(1, java.security.MessageDigest
          .getInstance("MD5").digest(s"w$i".getBytes)).longValue().abs))
    val base = words.mkString(" ")
    val shifted = "INSERTED " + base
    val docs = Seq((1L, base), (2L, shifted)).toDF("doc_id", "text")

    // CDC chunks through the exact query pipeline
    val cdc = TextAnalysis.cdcChunks(docs).collect()
    val cdcA = cdc.filter(_.getLong(0) == 1L).map(_.getString(4)).toSet
    val cdcB = cdc.filter(_.getLong(0) == 2L).map(_.getString(4)).toSet
    assert(cdcA.size >= 5, s"need a multi-chunk doc, got ${cdcA.size} chunks")
    val cdcShared = (cdcA & cdcB).size
    // only the first chunk's gram context sees the edit: everything
    // after the first surviving boundary must keep its fingerprint
    assert(cdcShared >= cdcA.size - 2,
      s"CDC lost ${cdcA.size - cdcShared} of ${cdcA.size} chunks to a " +
        "single front edit — boundaries are not content-defined")

    // q214's fixed 64/48 windows on the same pair: every boundary
    // shifts by one token, so NO chunk fingerprint survives
    def fixedChunks(text: String): Set[String] = {
      val toks = text.split(" ")
      (0 to (toks.length - 1) / 48).map(k =>
        toks.slice(k * 48, k * 48 + 64).mkString(" ")).toSet
    }
    val fixShared = (fixedChunks(base) & fixedChunks(shifted)).size
    assert(fixShared == 0,
      s"fixed windows unexpectedly aligned ($fixShared shared) — the " +
        "contrast this spec demonstrates would be void")
  }

  test("boundaries are local: chunking a suffix reproduces its chunks") {
    import spark.implicits._
    // the deeper CDC property behind the robustness: chunk boundaries
    // depend only on a 3-token neighborhood, so the chunk sequence of a
    // shared suffix converges regardless of what precedes it
    val words = (1 to 300).map(i =>
      Integer.toHexString(("s" + i).hashCode.abs))
    val tail = words.mkString(" ")
    val docs = Seq((1L, tail), (2L, "x y z " + tail)).toDF("doc_id", "text")
    val ch = TextAnalysis.cdcChunks(docs).collect()
    val a = ch.filter(_.getLong(0) == 1L).map(_.getString(4)).toSet
    val b = ch.filter(_.getLong(0) == 2L).map(_.getString(4)).toSet
    assert((a & b).size >= a.size - 2,
      s"suffix chunks did not converge: ${(a & b).size} of ${a.size}")
  }
}
