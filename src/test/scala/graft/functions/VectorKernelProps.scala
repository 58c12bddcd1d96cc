package graft.functions

import graft.functions.VectorExpressions
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.{Gen, Prop, Properties}

/** ScalaCheck parity for the native dedup kernels against straightforward
  * Scala reference implementations of the oracle formulas, over arbitrary
  * unicode (the Spark-side HOF comparison lives in VectorExpressionsSpec;
  * this pins the kernels' own semantics without a SparkSession).
  */
class VectorKernelProps extends Properties("VectorKernels") {

  private val wordGen: Gen[String] = Gen.oneOf(
    Gen.alphaNumStr.suchThat(_.nonEmpty),
    Gen.oneOf("Straße", "über", "日本語", "éé", "--", "\t", "a\nb", "𝔘𝔫𝔦"),
    Gen.listOfN(3, Gen.choose(33.toChar, 0x2FFF.toChar)).map(_.mkString))
  private val textGen: Gen[String] = for {
    words <- Gen.listOf(wordGen)
    seps <- Gen.listOfN(math.max(words.length - 1, 0), Gen.oneOf(" ", "  ", "   "))
    lead <- Gen.oneOf("", " ", "  ")
    trail <- Gen.oneOf("", " ")
  } yield lead + (words.zipAll(seps, "", "").map { case (w, s) => w + s }.mkString) + trail

  private def refWords(text: String): Seq[String] =
    text.split(" ", -1).toSeq.filter(_.nonEmpty)

  private def refShingles(text: String): Seq[String] = {
    val w = refWords(text)
    (0 until math.max(w.length - 2, 0)).map(i => w.slice(i, i + 3).mkString(" "))
  }

  private def refH60(s: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s.getBytes("UTF-8")).map(b => f"$b%02x").mkString
    java.lang.Long.parseLong(hex.take(15), 16)
  }

  private def arr(a: org.apache.spark.sql.catalyst.util.ArrayData): Seq[String] =
    (0 until a.numElements()).map(i => a.getUTF8String(i).toString)
  private def arrL(a: org.apache.spark.sql.catalyst.util.ArrayData): Seq[Long] =
    (0 until a.numElements()).map(a.getLong)

  property("shingles3 == split/filter/slice reference on arbitrary unicode") =
    Prop.forAll(textGen) { text =>
      arr(VectorExpressions.shingles3(UTF8String.fromString(text))) == refShingles(text)
    }

  property("h31 == md5-hex-prefix reference") =
    Prop.forAll(Gen.listOf(wordGen)) { words =>
      val in = new org.apache.spark.sql.catalyst.util.GenericArrayData(
        words.map(w => UTF8String.fromString(w): Any).toArray)
      arrL(VectorExpressions.h31(in)) == words.map(w => refH60(w) % 2147483647L)
    }

  property("minhash_sigs == 8 affine min-folds") =
    Prop.forAll(Gen.listOf(Gen.chooseNum(0L, 2147483646L))) { hs =>
      val in = new org.apache.spark.sql.catalyst.util.GenericArrayData(hs.toArray)
      val expect = (0 until 8).map { i =>
        val a = 387421L * (i + 1)
        val b = 98765L * (i + 1) + 12345L
        hs.foldLeft(2147483647L)((m, x) => math.min(m, (a * x + b) % 2147483647L))
      }
      arrL(VectorExpressions.minhashSigs(in)) == expect
    }

  property("simhash32 == per-bit majority reference") =
    Prop.forAll(textGen) { text =>
      val hs = refWords(text).map(refH60)
      val expect = (0 until 32).foldLeft(0L) { (acc, b) =>
        val vote = hs.map(h => if (((h >> b) & 1L) == 1L) 1 else -1).sum
        if (vote > 0) acc | (1L << b) else acc
      }
      VectorExpressions.simhash32(UTF8String.fromString(text)) == expect
    }

  property("fingerprint64 == rolling-hash fold reference") =
    Prop.forAll(textGen) { text =>
      val expect = refWords(text).map(refH60)
        .foldLeft(0L)((acc, h) => (acc * 131 + h) % 9007199254740881L)
      VectorExpressions.fingerprint64(UTF8String.fromString(text)) == expect
    }

  property("dotI64 == zip-multiply-sum") =
    Prop.forAll(Gen.listOf(Gen.chooseNum(-1000000L, 1000000L)),
      Gen.listOf(Gen.chooseNum(-1000000L, 1000000L))) { (a, b) =>
      val ga = new org.apache.spark.sql.catalyst.util.GenericArrayData(a.toArray)
      val gb = new org.apache.spark.sql.catalyst.util.GenericArrayData(b.toArray)
      VectorExpressions.dotI64(ga, gb) ==
        a.zip(b).map { case (x, y) => x * y }.sum
    }
}
