package graft.core

import org.scalatest.funsuite.AnyFunSuite

class BoilerplateSpec extends AnyFunSuite {

  private val page =
    """<html><head><title>t</title><script>var x = 1;</script>
      |<style>.a { color: red }</style></head>
      |<body>
      |<nav><a href="/">Home</a> <a href="/about">About</a> <a href="/contact">Contact</a></nav>
      |<header><h1>Site Name</h1></header>
      |<div class="menu"><a href="1">One</a> <a href="2">Two</a> <a href="3">Three</a> <a href="4">Four</a></div>
      |<article>
      |<h2>Die eigentliche Überschrift des Artikels</h2>
      |<p>Dies ist der erste Absatz des Hauptinhalts mit ausreichend vielen
      |Wörtern um als Inhalt klassifiziert zu werden und noch mehr Text.</p>
      |<p>Ein zweiter Absatz mit einem <a href="x">eingebetteten Link</a> und
      |weiterem Fließtext der deutlich länger ist als die Navigation.</p>
      |</article>
      |<footer>Copyright 2026 <a href="/imprint">Imprint</a></footer>
      |</body></html>""".stripMargin

  test("content paragraphs kept, nav/header/footer/script dropped") {
    val out = Boilerplate.extractContent(page)
    assert(out.contains("erste Absatz des Hauptinhalts"))
    assert(out.contains("zweiter Absatz"))
    assert(out.contains("eingebetteten Link")) // embedded link text stays
    assert(!out.contains("Home"))
    assert(!out.contains("Copyright"))
    assert(!out.contains("var x"))
    assert(!out.contains("color: red"))
  }

  test("heading adjacent to content survives (neighbor smoothing)") {
    val out = Boilerplate.extractContent(page)
    assert(out.contains("Die eigentliche Überschrift des Artikels"))
  }

  test("link-density classification: link lists are boilerplate") {
    val html =
      """<body><div><a href="1">Eins</a> <a href="2">Zwei</a> <a href="3">Drei</a></div>
        |<p>Ein langer Absatz ohne Links der eindeutig Inhalt ist und viele Wörter hat damit er zählt.</p></body>""".stripMargin
    val blocks = Boilerplate.segment(html)
    val linkBlock = blocks.find(_.text.contains("Eins")).get
    assert(linkBlock.linkDensity > 0.9)
    assert(!linkBlock.isContent)
    assert(blocks.find(_.text.contains("langer Absatz")).exists(_.isContent))
  }

  test("entities decode") {
    assert(Boilerplate.decodeEntities("K&auml;se &amp; Wurst &#8364; &#x20AC;") == "Käse & Wurst € €")
  }

  test("empty and tagless input") {
    assert(Boilerplate.extractContent("") == "")
    val plain = "Nur Text ohne Tags aber mit genug Wörtern um als Inhalt zu gelten ja wirklich."
    assert(Boilerplate.extractContent(plain) == plain)
  }
}
