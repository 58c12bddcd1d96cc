package graft.core

import java.io.ByteArrayInputStream
import java.util.zip.ZipInputStream

/** Minimal in-memory zip reader for office containers (reference:
  * pkg/officexmlparser/office_parser.go:60-131). Uses the JDK inflater;
  * enforces the reference's 50 MiB per-entry cap (office_parser.go:125-127).
  */
object ZipArchive {

  final case class Entry(name: String, data: Array[Byte])

  val MaxEntryBytes: Int = 50 * 1024 * 1024

  final class EntryTooBigException(name: String)
    extends RuntimeException(s"zip entry '$name' exceeds 50 MiB")

  /** Lists entries in stream (local header) order. `select` gates which
    * entries get their bytes materialized — everything else is skipped
    * cheaply (the inflater never runs for unselected entries' payloads).
    */
  def entries(data: Array[Byte], select: String => Boolean): Vector[Entry] = {
    val zin = new ZipInputStream(new ByteArrayInputStream(data))
    val out = Vector.newBuilder[Entry]
    try {
      var e = zin.getNextEntry
      while (e != null) {
        if (!e.isDirectory && select(e.getName)) {
          out += Entry(e.getName, readCapped(zin, e.getName))
        }
        zin.closeEntry()
        e = zin.getNextEntry
      }
    } finally zin.close()
    out.result()
  }

  private def readCapped(zin: ZipInputStream, name: String): Array[Byte] = {
    val buf = new java.io.ByteArrayOutputStream(8192)
    val chunk = new Array[Byte](8192)
    var n = zin.read(chunk)
    while (n >= 0) {
      buf.write(chunk, 0, n)
      if (buf.size > MaxEntryBytes) throw new EntryTooBigException(name)
      n = zin.read(chunk)
    }
    buf.toByteArray
  }
}
