package graft.core

/** HTML boilerplate stripping with DOM-heuristic content scoring — the
  * north-star additive capability (BASELINE.json north_star). The reference
  * does NOT support HTML (README.md:40), so this is built from the public
  * block-scoring heuristics of boilerpipe (Kohlschütter et al., WSDM 2010)
  * and Readability: segment the DOM into text blocks, score each by link
  * density and text density, and keep content-classified blocks.
  *
  * The in-reference analog is the PDF /Artifact suppression (SURVEY §2.3
  * L4): block-level suppression by role. Role-bearing tags (nav, header,
  * footer, aside, script, style, form) are dropped outright — the DOM
  * equivalent of /Artifact runs.
  */
object Boilerplate {

  final case class Block(
      text: String,
      words: Int,
      linkWords: Int,
      isContent: Boolean) {
    def linkDensity: Double = if (words == 0) 0 else linkWords.toDouble / words
  }

  private val DropTags = Set("script", "style", "noscript", "template", "svg",
    "nav", "header", "footer", "aside", "form", "button", "iframe")
  private val BlockTags = Set("p", "div", "section", "article", "main", "li",
    "h1", "h2", "h3", "h4", "h5", "h6", "td", "blockquote", "pre", "tr",
    "ul", "ol", "table", "body")

  /** `s.trim.replaceAll("[ \\t\\u00A0]+", " ")` as one pass (the per-block
    * regex was the hottest allocation in the HTML kernel class).
    */
  private def normalizeBlock(s0: String): String = {
    val s = s0.trim
    val len = s.length
    if (len == 0) return s
    val sb = new java.lang.StringBuilder(len)
    var i = 0
    var inRun = false
    while (i < len) {
      val c = s.charAt(i)
      if (c == ' ' || c == '\t' || c == '\u00A0') {
        if (!inRun) { sb.append(' '); inRun = true }
      } else { sb.append(c); inRun = false }
      i += 1
    }
    sb.toString
  }

  /** `s.split("[ \\t\\r\\n\\u00A0]+").count(_.nonEmpty)` without the array. */
  private def countWords(s: String): Int = {
    var n = 0
    var i = 0
    var inWord = false
    while (i < s.length) {
      val c = s.charAt(i)
      val sep = c == ' ' || c == '\t' || c == '\r' || c == '\n' || c == '\u00A0'
      if (!sep && !inWord) { n += 1; inWord = true }
      else if (sep) inWord = false
      i += 1
    }
    n
  }

  /** Lightweight tolerant HTML tokenizer → text blocks with link-word
    * accounting. No external parser: tags split blocks, anchor runs count
    * their words as link words, drop-tag subtrees are suppressed entirely.
    */
  def segment(html: String): Vector[Block] = {
    val blocks = Vector.newBuilder[Block]
    val cur = new java.lang.StringBuilder
    var curWords = 0
    var curLinkWords = 0
    var inAnchor = 0
    var dropDepth = 0
    var i = 0
    val n = html.length

    def flush(): Unit = {
      val t = normalizeBlock(cur.toString)
      if (t.nonEmpty) blocks += Block(t, curWords, curLinkWords, isContent = false)
      cur.setLength(0); curWords = 0; curLinkWords = 0
    }

    def appendText(t: String): Unit = {
      if (dropDepth > 0) return
      val decoded = decodeEntities(t)
      val words = countWords(decoded)
      val trimmed = decoded.trim
      if (words > 0 || trimmed.nonEmpty) {
        if (cur.length > 0 && cur.charAt(cur.length - 1) != ' ') cur.append(' ')
        cur.append(trimmed)
        curWords += words
        if (inAnchor > 0) curLinkWords += words
      }
    }

    while (i < n) {
      val lt = html.indexOf('<', i)
      if (lt < 0) { appendText(html.substring(i)); i = n }
      else {
        if (lt > i) appendText(html.substring(i, lt))
        // comments
        if (html.startsWith("<!--", lt)) {
          val end = html.indexOf("-->", lt)
          i = if (end < 0) n else end + 3
        } else {
          val gt = html.indexOf('>', lt)
          if (gt < 0) i = n
          else {
            // tag-name scan in place — equivalent of
            // substring(lt+1, gt).trim then startsWith("/") /
            // dropWhile('/') / takeWhile(isLetterOrDigit) / endsWith("/")
            var p = lt + 1
            while (p < gt && html.charAt(p) <= ' ') p += 1
            val closing = p < gt && html.charAt(p) == '/'
            var q = p
            while (q < gt && html.charAt(q) == '/') q += 1
            val nameStart = q
            while (q < gt && Character.isLetterOrDigit(html.charAt(q))) q += 1
            val name = html.substring(nameStart, q).toLowerCase
            var e = gt - 1
            while (e > lt && html.charAt(e) <= ' ') e -= 1
            val selfClosing = e > lt && html.charAt(e) == '/'
            if (DropTags.contains(name)) {
              if (!closing && !selfClosing) dropDepth += 1
              else if (closing && dropDepth > 0) dropDepth -= 1
              flush()
            } else if (name == "a") {
              if (!closing) inAnchor += 1
              else if (inAnchor > 0) inAnchor -= 1
            } else if (BlockTags.contains(name) || name == "br") {
              flush()
            }
            i = gt + 1
          }
        }
      }
    }
    flush()
    classify(blocks.result())
  }

  /** boilerpipe NumWordsRules-style classifier: a block is content when its
    * link density is low and it (or a content neighbor) carries enough
    * words. Short low-link blocks between content blocks are kept
    * (continuation headings).
    */
  private def classify(bs: Vector[Block]): Vector[Block] = {
    val base = bs.map { b =>
      val content =
        b.linkDensity <= 0.33 &&
          (b.words >= 10 ||
            (b.words >= 4 && b.linkWords == 0))
      b.copy(isContent = content)
    }
    // neighbor smoothing: short clean blocks adjacent to content are content
    base.zipWithIndex.map { case (b, i) =>
      if (!b.isContent && b.linkDensity == 0 && b.words >= 2 &&
        ((i > 0 && base(i - 1).isContent) || (i + 1 < base.length && base(i + 1).isContent)))
        b.copy(isContent = true)
      else b
    }
  }

  /** Main-content extraction: content blocks joined with '\n'. */
  def extractContent(html: String): String =
    segment(html).filter(_.isContent).map(_.text).mkString("\n")

  private val Entities = Map("amp" -> "&", "lt" -> "<", "gt" -> ">",
    "quot" -> "\"", "apos" -> "'", "nbsp" -> " ", "auml" -> "ä",
    "ouml" -> "ö", "uuml" -> "ü", "szlig" -> "ß", "mdash" -> "—",
    "ndash" -> "–", "hellip" -> "…", "copy" -> "©")

  def decodeEntities(s: String): String = {
    if (s.indexOf('&') < 0) return s
    val sb = new java.lang.StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '&') {
        val semi = s.indexOf(';', i)
        if (semi > i && semi - i <= 8) {
          val ent = s.substring(i + 1, semi)
          if (ent.startsWith("#x") || ent.startsWith("#X")) {
            try { sb.appendCodePoint(Integer.parseInt(ent.substring(2), 16)); i = semi + 1 }
            catch { case _: Exception => sb.append(c); i += 1 }
          } else if (ent.startsWith("#")) {
            try { sb.appendCodePoint(ent.substring(1).toInt); i = semi + 1 }
            catch { case _: Exception => sb.append(c); i += 1 }
          } else Entities.get(ent) match {
            case Some(rep) => sb.append(rep); i = semi + 1
            case None => sb.append(c); i += 1
          }
        } else { sb.append(c); i += 1 }
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }
}
