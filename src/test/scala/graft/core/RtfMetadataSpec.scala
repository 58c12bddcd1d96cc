package graft.core

import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.{Files, Paths}

/** Spec for the \info metadata parser (metadata.go:61-453). The fixture
  * title assertion is the reference's own (rtf1_test.go:25-27).
  */
class RtfMetadataSpec extends AnyFunSuite {

  test("readme.rtf title matches reference golden (rtf1_test.go:25-27)") {
    val data = Files.readAllBytes(Paths.get("/root/reference/pkg/rtfparser/testdata/readme.rtf"))
    val m = RtfMetadata.extract(data)
    assert(m.title == "README of github.com/johbar/text-extraction-service")
  }

  test("text destinations populate fields and trim whitespace") {
    val rtf = """{\rtf1\ansi{\info{\title  My Title }{\author Jane}{\company ACME}{\subject S}{\keywords k1 k2}{\doccomm note}}body}"""
    val m = RtfMetadata.extract(rtf.getBytes("ISO-8859-1"))
    assert(m.title == "My Title")
    assert(m.author == "Jane")
    assert(m.company == "ACME")
    assert(m.subject == "S")
    assert(m.keywords == "k1 k2")
    assert(m.docComm == "note")
  }

  test("creatim/revtim yr-mo-dy-hr-min-sec to RFC3339 (metadata.go:54-59, 317-333)") {
    val rtf = """{\rtf1\ansi{\info{\creatim\yr2024\mo2\dy29\hr13\min5\sec9}{\revtim\yr2025\mo12\dy31}}x}"""
    val m = RtfMetadata.extract(rtf.getBytes("ISO-8859-1"))
    assert(m.created.contains("2024-02-29T13:05:09Z"))
    assert(m.modified.contains("2025-12-31T00:00:00Z"))
  }

  test("missing year yields Go zero time (metadata.go:110-115)") {
    val rtf = """{\rtf1\ansi{\info{\creatim\mo2}}x}"""
    val m = RtfMetadata.extract(rtf.getBytes("ISO-8859-1"))
    assert(m.created.contains("0001-01-01T00:00:00Z"))
  }

  test("version number (metadata.go:336-339)") {
    val rtf = """{\rtf1\ansi{\info{\title T}\version7}x}"""
    val m = RtfMetadata.extract(rtf.getBytes("ISO-8859-1"))
    assert(m.version == 7)
    assert(m.title == "T")
  }

  test("hex escapes and unicode in info text") {
    val rtf = "{\\rtf1\\ansi\\ansicpg1252{\\info{\\title caf\\'e9 \\u8364?}}x}"
    val m = RtfMetadata.extract(rtf.getBytes("ISO-8859-1"))
    assert(m.title == "café €")
  }

  test("no info group yields empty metadata map") {
    val m = RtfMetadata.extract("""{\rtf1\ansi just text}""".getBytes("ISO-8859-1"))
    assert(m.toMap.isEmpty)
    assert(m.created.isEmpty)
  }

  test("toMap maps to x-document-* keys (rich_text_document.go:76-110)") {
    val rtf = """{\rtf1\ansi{\info{\title T}{\author A}{\operator Op}{\creatim\yr2020\mo1\dy2}}x}"""
    val m = RtfMetadata.extract(rtf.getBytes("ISO-8859-1")).toMap
    assert(m("x-document-title") == "T")
    assert(m("x-document-author") == "A")
    assert(m("x-document-operator") == "Op")
    assert(m("x-document-created") == "2020-01-02T00:00:00Z")
  }
}
