package graft.functions

import graft.SparkSpec

/** pdf_text (q209) — the decoder is pinned three ways: against the
  * generation manifest (declared text, itself re-validated by the
  * generator's INDEPENDENT Python mini-parser), against a second
  * independent extraction implemented right here for the uncompressed
  * fixture, and against inline adversarial bytes for the
  * malformed-to-null contract. */
class PdfSpec extends SparkSpec {

  private def readBytes(p: String): Array[Byte] =
    java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(p))

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      .map("%02x".format(_)).mkString

  test("q209: extraction matches the generation manifest on every fixture") {
    val dir = graft.Fixtures.path("pdf")
    val rows = scala.io.Source.fromFile(s"$dir/manifest.csv")
      .getLines().drop(1).map(_.split(",", -1)).toSeq
    assert(rows.size == 5)
    rows.foreach { f =>
      val (name, nStreams, nBlocks, nChars, md5, head40) =
        (f(0), f(1).toLong, f(2).toLong, f(3).toLong, f(4), f(5))
      val r = PdfText.extract(readBytes(s"$dir/$name"))
      assert(r != null, s"$name must decode")
      assert(r.getLong(0) == nStreams, s"$name n_streams")
      assert(r.getLong(1) == nBlocks, s"$name n_text_blocks")
      val text = r.getUTF8String(2).toString
      assert(text.length.toLong == nChars, s"$name n_chars")
      assert(md5hex(text) == md5, s"$name text_md5")
      assert(text.take(40) == head40, s"$name head40")
    }
  }

  test("q209: second independent extraction agrees on the plain fixture") {
    // doc_plain.pdf is uncompressed and escape-free by construction, so
    // a from-scratch naive pull (stream body between the keywords, all
    // `(..) Tj` literals, '\n' at each Td/T*/ET) is a genuinely
    // independent second implementation to cross-check the real parser
    val b = readBytes(graft.Fixtures.path("pdf") + "/doc_plain.pdf")
    val s = new String(b, java.nio.charset.StandardCharsets.ISO_8859_1)
    val body = s.substring(s.indexOf("stream\n") + 7, s.indexOf("\nendstream"))
    val sb = new StringBuilder
    body.linesIterator.foreach { line =>
      val t = line.trim
      if (t.endsWith(" Tj") && t.startsWith("("))
        sb.append(t.stripSuffix(" Tj").stripPrefix("(").stripSuffix(")"))
      else if ((t.endsWith(" Td") || t.endsWith(" TD") || t == "T*" ||
        t == "ET") && sb.nonEmpty && sb.last != '\n') sb.append('\n')
    }
    val expected = sb.toString
    val r = PdfText.extract(b)
    assert(r != null)
    assert(r.getUTF8String(2).toString == expected,
      "pdf_text and the naive independent extraction diverge on doc_plain")
  }

  test("q209: escape semantics pinned on inline bytes") {
    def pdf(content: String): Array[Byte] = {
      val c = content.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
      ("%PDF-1.4\n1 0 obj\n<< /Length " + c.length + " >>\nstream\n")
        .getBytes(java.nio.charset.StandardCharsets.ISO_8859_1) ++
        c ++ "\nendstream\nendobj\n"
        .getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
    }
    def text(content: String): String = {
      val r = PdfText.extract(pdf(content))
      assert(r != null, s"must decode: $content")
      r.getUTF8String(2).toString
    }
    // octal (3, 2 and 1 digits; \\7 is BEL), named escapes, specials
    assert(text("BT (\\101\\61\\7x) Tj ET") == "A1\u0007x\n")
    assert(text("BT (a\\nb\\tc\\(d\\)e\\\\f) Tj ET") == "a\nb\tc(d)e\\f\n")
    // unknown escape drops the backslash; continuation drops the EOL
    assert(text("BT (x\\qy) Tj ET") == "xqy\n")
    assert(text("BT (ab\\\ncd) Tj ET") == "abcd\n")
    // raw CR, CRLF, LF in a string all normalize to \n
    assert(text("BT (a\rb\r\nc\nd) Tj ET") == "a\nb\nc\nd\n")
    // nested unescaped parens survive; TJ ignores kern numbers
    assert(text("BT ((x(y)z)) Tj ET") == "(x(y)z)\n")
    assert(text("BT [(a) -120 (b) 33 (c)] TJ ET") == "abc\n")
    // Tj outside BT shows nothing; ET newline only after emitted text
    assert(text("(loose) Tj BT (in) Tj ET") == "in\n")
  }

  test("q209: malformed bytes decode to null, never garbage") {
    val dir = graft.Fixtures.path("pdf")
    // the planted truncated fixture: /Length overruns the file
    assert(PdfText.extract(readBytes(s"$dir/doc_broken.pdf")) == null,
      "doc_broken.pdf must decode to null")
    def pdfB(s: String): Array[Byte] =
      s.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
    for ((bad, why) <- Seq[(Array[Byte], String)](
        (Array.empty[Byte], "empty"),
        (pdfB("not a pdf at all"), "no signature"),
        (pdfB("%PDF-1.4\n<< /Length 4"), "unterminated dict"),
        (pdfB("%PDF-1.4\n<< /Length 99 >>\nstream\nhi\nendstream"),
          "length overruns"),
        (pdfB("%PDF-1.4\n<< /Foo 1 >>\nstream\nhi\nendstream"),
          "missing /Length"),
        (pdfB("%PDF-1.4\n<< /Length 2 0 R >>\nstream\nhi\nendstream"),
          "indirect /Length out of scope"),
        (pdfB("%PDF-1.4\n<< /Length 2 >>\nstream\nhixendstream"),
          "no endstream at the /Length boundary"),
        (pdfB("%PDF-1.4\n<< /Length 11 >>\nstream\nBT (open Tj\nendstream"),
          "unterminated string"),
        (pdfB("%PDF-1.4\n<< /Length 7 >>\nstream\nBT (x)v\nendstream"),
          "unterminated BT"),
        (pdfB("%PDF-1.4\n<< /Length 5 >>\nstream\n(x)ET\nendstream"),
          "ET outside BT"),
        (pdfB("%PDF-1.4\n<< /Length 8 /Filter /FlateDecode >>\n" +
          "stream\nnotzlib!\nendstream"), "inflate failure")))
      assert(PdfText.extract(bad) == null, s"must be null: $why")
    // a PDF with NO streams is valid-but-empty, not malformed
    val r = PdfText.extract(pdfB("%PDF-1.4\n1 0 obj\n<< /Type /Catalog >>\nendobj\n"))
    assert(r != null && r.getLong(0) == 0L && r.getLong(1) == 0L &&
      r.getUTF8String(2).toString == "")
  }
}
