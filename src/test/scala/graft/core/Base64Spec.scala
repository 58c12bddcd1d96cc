package graft.core

import java.util.Base64
import org.scalatest.funsuite.AnyFunSuite

/** Differential test of Extractor.decodeBase64 (the allocation-free
  * charAt decoder) against java.util.Base64's basic decoder — byte-exact
  * on valid input, IllegalArgumentException-for-IllegalArgumentException
  * on malformed input, so decodePayload's raw-text fallback fires in
  * exactly the same cases.
  */
class Base64Spec extends AnyFunSuite {

  private def jdk(s: String): Either[String, Seq[Byte]] =
    try Right(Base64.getDecoder.decode(s).toSeq)
    catch { case _: IllegalArgumentException => Left("IAE") }

  private def ours(s: String): Either[String, Seq[Byte]] =
    try Right(Extractor.decodeBase64(s).toSeq)
    catch { case _: IllegalArgumentException => Left("IAE") }

  private def same(s: String): Unit =
    assert(ours(s) == jdk(s), s"input=${s.take(80)} (len ${s.length})")

  test("valid payloads of every length mod 4, padded and unpadded") {
    val rnd = new scala.util.Random(7)
    (0 until 200).foreach { i =>
      val raw = new Array[Byte](i)
      rnd.nextBytes(raw)
      val padded = Base64.getEncoder.encodeToString(raw)
      same(padded)
      same(Base64.getEncoder.withoutPadding.encodeToString(raw))
      assert(ours(padded) == Right(raw.toSeq))
    }
    // large payload (the hot-path shape: ~50 KB binary span)
    val big = new Array[Byte](56700)
    rnd.nextBytes(big)
    same(Base64.getEncoder.encodeToString(big))
  }

  test("malformed endings match the JDK exception-for-exception") {
    val cases = Seq(
      "", "Q", "=", "==", "===", "====", "QQ=", "Q=", "Q==", "Q===",
      "QQ==", "QQQ=", "QQQQ=", "QQQQ==", "QQ==x", "QQ==QQQQ", "QQ=x",
      "QQQQQ", "QQQQQQ", "QQQQQQQ", "QQ =", "QQ\n==", "QQ==\n",
      "AB*D", "AB?D", "ABCD*", "ab-d", "ab_d")
    cases.foreach(same)
  }

  test("non-latin1 and high-latin1 chars are illegal like the JDK pre-copy") {
    // JDK decode(String) maps the input through ISO-8859-1 first; both
    // paths must throw IAE so decodePayload falls back to raw bytes
    Seq("QQé=", "QQÿ=", "QQ中=", "中QQQ").foreach(same)
  }

  test("random mutation fuzz: splice arbitrary chars into valid base64") {
    val rnd = new scala.util.Random(13)
    val raw = new Array[Byte](61)
    rnd.nextBytes(raw)
    val base = Base64.getEncoder.encodeToString(raw)
    (0 until 500).foreach { _ =>
      val pos = rnd.nextInt(base.length)
      val ch = rnd.nextInt(300).toChar
      same(base.substring(0, pos) + ch + base.substring(pos + 1))
      same(base.substring(0, pos) + ch + base.substring(pos)) // insert
      same(base.substring(0, pos) + base.substring(pos + 1)) // delete
    }
  }

  test("decodePayload falls back to ISO-8859-1 bytes on malformed input") {
    val r = Extractor.decodePayload("not valid base64 at all!")
    assert(r.toSeq == "not valid base64 at all!".getBytes("ISO-8859-1").toSeq)
    assert(Extractor.decodePayload("aGVsbG8=").toSeq == "hello".getBytes.toSeq)
  }
}
