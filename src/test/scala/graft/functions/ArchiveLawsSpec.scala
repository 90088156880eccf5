package graft.functions

import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.propBoolean

/** Round-trip laws for the archive decoders (q284/q286) against the
  * JDK's OWN writers — a third independent implementation beside the
  * Python generator and the committed fixtures: whatever
  * ZipOutputStream / GZIPOutputStream write, ZipWalk / GzipWalk must
  * read back with the exact entry metadata, payload hashes, and clean
  * CRC verdicts, for ARBITRARY generated entry sets. */
object ArchiveLawsSpec extends Properties("ArchiveBytes") {

  private def md5hex(b: Array[Byte]): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(b).map("%02x".format(_)).mkString

  private val nameGen: Gen[String] = for {
    depth <- Gen.choose(1, 3)
    parts <- Gen.listOfN(depth, Gen.nonEmptyListOf(Gen.alphaLowerChar)
      .map(_.take(8).mkString))
  } yield parts.mkString("/")

  private val entryGen: Gen[(String, Array[Byte], Boolean)] = for {
    name <- nameGen
    n <- Gen.choose(0, 4096)
    // mix compressible runs and raw bytes so deflate sees both regimes
    mode <- Gen.oneOf(true, false)
    bytes <- if (mode) Gen.choose(33, 126).map(c => Array.fill(n)(c.toByte))
             else Gen.containerOfN[Array, Byte](n, Gen.choose(-128, 127)
               .map(_.toByte))
    deflated <- Gen.oneOf(true, false)
  } yield (name, bytes, deflated)

  private val entriesGen: Gen[List[(String, Array[Byte], Boolean)]] =
    Gen.choose(1, 8).flatMap(k => Gen.listOfN(k, entryGen))
      // zip central directories key on name; keep them unique
      .map(_.distinctBy(_._1))

  property("zip: JDK ZipOutputStream round-trips through zipEntries") =
    Prop.forAll(entriesGen) { entries =>
      val bos = new java.io.ByteArrayOutputStream()
      val zos = new java.util.zip.ZipOutputStream(bos)
      entries.foreach { case (name, data, deflated) =>
        val ze = new java.util.zip.ZipEntry(name)
        if (!deflated) {
          zos.setMethod(java.util.zip.ZipOutputStream.STORED)
          ze.setMethod(java.util.zip.ZipEntry.STORED)
          ze.setSize(data.length.toLong)
          val c = new java.util.zip.CRC32
          c.update(data)
          ze.setCrc(c.getValue)
        } else {
          zos.setMethod(java.util.zip.ZipOutputStream.DEFLATED)
          ze.setMethod(java.util.zip.ZipEntry.DEFLATED)
        }
        zos.putNextEntry(ze)
        zos.write(data)
        zos.closeEntry()
      }
      zos.close()
      val got = ArchiveBytes.zipEntries(bos.toByteArray)
      (got != null) :| "decodes" &&
        (got.numElements() == entries.size) :| "entry count" &&
        Prop.all(entries.zipWithIndex.map { case ((name, data, deflated), i) =>
          val e = got.getStruct(i, 7)
          (e.getUTF8String(1).toString == name) :| s"name $i" &&
            (e.getLong(2) == (if (deflated) 8L else 0L)) :| s"method $i" &&
            (e.getLong(4) == data.length.toLong) :| s"usize $i" &&
            e.getBoolean(5) :| s"crc_ok $i" &&
            (e.getUTF8String(6).toString == md5hex(data)) :| s"md5 $i"
        }: _*)
    }

  private val payloadGen: Gen[Array[Byte]] = for {
    n <- Gen.choose(0, 4096)
    mode <- Gen.oneOf(true, false)
    bytes <- if (mode) Gen.choose(33, 126).map(c => Array.fill(n)(c.toByte))
             else Gen.containerOfN[Array, Byte](n, Gen.choose(-128, 127)
               .map(_.toByte))
  } yield bytes

  property("gzip: concatenated JDK members round-trip through gzipMembers") =
    Prop.forAll(Gen.choose(1, 6).flatMap(k =>
        Gen.listOfN(k, payloadGen))) { payloads =>
      val members = payloads.map { p =>
        val bos = new java.io.ByteArrayOutputStream()
        val gz = new java.util.zip.GZIPOutputStream(bos)
        gz.write(p)
        gz.close()
        bos.toByteArray
      }
      val whole = members.flatten.toArray
      val got = ArchiveBytes.gzipMembers(whole)
      (got != null) :| "decodes" &&
        (got.numElements() == payloads.size) :| "member count" &&
        Prop.all(payloads.zipWithIndex.map { case (p, i) =>
          val m = got.getStruct(i, 5)
          (m.getLong(0) == i + 1L) :| s"seq $i" &&
            (m.getLong(3) == p.length.toLong) :| s"usize $i" &&
            (m.getUTF8String(4).toString == md5hex(p)) :| s"md5 $i"
        }: _*) &&
        // offsets + csizes tile the file exactly
        ((0 until got.numElements()).map(i =>
          got.getStruct(i, 5).getLong(2)).sum == whole.length.toLong) :|
          "csizes partition the file"
    }
}
