package graft.core

/** Minimal Compound File Binary (CFB/OLE2) reader — the JVM stand-in for the
  * reference's mscfb dependency (pkg/docparser/open.go:84-174). Self-written
  * from the public [MS-CFB] layout: header → DIFAT → FAT → directory chain →
  * stream reads via FAT or mini-FAT (4096-byte cutoff).
  *
  * Only what the doc/ppt extractors need: enumerate stream entries (name +
  * bytes). Storage hierarchy is ignored (the reference matches on bare
  * stream names too).
  */
object Cfb {

  final case class Stream(name: String, data: Array[Byte])

  final class CfbException(msg: String) extends RuntimeException(msg)

  private val EndOfChain = 0xFFFFFFFEL
  private val MaxSectors = 1 << 20 // chain-walk guard on crafted files

  def streams(data: Array[Byte]): Vector[Stream] = {
    if (data.length < 512) throw new CfbException("file too short for CFB header")
    if (le64(data, 0) != 0xE11AB1A1E011CFD0L)
      throw new CfbException("not a CFB file (bad magic)")

    val sectorShift = le16(data, 30)
    val miniShift = le16(data, 32)
    if (sectorShift < 7 || sectorShift > 12 || miniShift > sectorShift)
      throw new CfbException(s"implausible sector shifts ($sectorShift/$miniShift)")
    val secSize = 1 << sectorShift
    val miniSize = 1 << miniShift
    val firstDirSector = le32(data, 48)
    val miniCutoff = le32(data, 56)
    val firstMiniFat = le32(data, 60)
    val numMiniFat = le32(data, 64)
    val firstDifat = le32(data, 68)
    val numDifat = le32(data, 72)

    def sectorOff(sec: Long): Int = (512 + sec * secSize).toInt

    // DIFAT: 109 header entries + chained DIFAT sectors
    val fatSectors = Vector.newBuilder[Long]
    var i = 0
    while (i < 109) {
      val v = le32(data, 76 + i * 4)
      if (v <= 0xFFFFFFF9L) fatSectors += v
      i += 1
    }
    var dif = firstDifat
    var difCount = 0L
    while (dif != EndOfChain && dif != 0xFFFFFFFFL && difCount < numDifat + 1) {
      val off = sectorOff(dif)
      if (off + secSize > data.length) throw new CfbException("DIFAT sector out of range")
      var j = 0
      while (j < secSize / 4 - 1) {
        val v = le32(data, off + j * 4)
        if (v <= 0xFFFFFFF9L) fatSectors += v
        j += 1
      }
      dif = le32(data, off + secSize - 4)
      difCount += 1
    }

    // FAT as a flat array
    val fatSecs = fatSectors.result()
    val fat = new Array[Long](fatSecs.length * (secSize / 4))
    fatSecs.zipWithIndex.foreach { case (sec, k) =>
      val off = sectorOff(sec)
      if (off + secSize > data.length) throw new CfbException("FAT sector out of range")
      var j = 0
      while (j < secSize / 4) {
        fat(k * (secSize / 4) + j) = le32(data, off + j * 4)
        j += 1
      }
    }

    def readChain(start: Long, size: Long): Array[Byte] = {
      val out = new Array[Byte](size.toInt)
      var pos = 0
      var sec = start
      var guard = 0
      while (sec != EndOfChain && sec != 0xFFFFFFFFL && pos < size) {
        if (guard > MaxSectors) throw new CfbException("FAT chain too long")
        val off = sectorOff(sec)
        if (off < 0 || off + secSize > data.length)
          throw new CfbException("stream sector out of range")
        val n = math.min(secSize.toLong, size - pos).toInt
        System.arraycopy(data, off, out, pos, n)
        pos += n
        if (sec >= fat.length) throw new CfbException("FAT index out of range")
        sec = fat(sec.toInt)
        guard += 1
      }
      out
    }

    // directory entries (128 bytes each) via the directory FAT chain
    val dirBytes = {
      // directory stream size unknown up-front: walk the chain collecting whole sectors
      val out = new java.io.ByteArrayOutputStream()
      var sec = firstDirSector
      var guard = 0
      while (sec != EndOfChain && sec != 0xFFFFFFFFL) {
        if (guard > MaxSectors) throw new CfbException("directory chain too long")
        val off = sectorOff(sec)
        if (off < 0 || off + secSize > data.length)
          throw new CfbException("directory sector out of range")
        out.write(data, off, secSize)
        if (sec >= fat.length) throw new CfbException("FAT index out of range")
        sec = fat(sec.toInt)
        guard += 1
      }
      out.toByteArray
    }

    final case class DirEntry(name: String, objType: Int, startSector: Long, size: Long)
    val entries = (0 until dirBytes.length / 128).map { k =>
      val base = k * 128
      val nameLen = le16(dirBytes, base + 64) // bytes incl. terminator
      val nChars = math.max(0, math.min(nameLen / 2 - 1, 32))
      val sb = new java.lang.StringBuilder(nChars)
      var c = 0
      while (c < nChars) {
        sb.append(((dirBytes(base + c * 2) & 0xFF) | ((dirBytes(base + c * 2 + 1) & 0xFF) << 8)).toChar)
        c += 1
      }
      DirEntry(sb.toString, dirBytes(base + 66) & 0xFF, le32(dirBytes, base + 116),
        le64(dirBytes, base + 120) & 0xFFFFFFFFL) // v3: only low 32 bits meaningful
    }

    val root = entries.find(_.objType == 5)
      .getOrElse(throw new CfbException("no root entry"))
    lazy val miniStream = readChain(root.startSector, root.size)

    // mini-FAT
    lazy val miniFat: Array[Long] = {
      val raw = readChain(firstMiniFat, numMiniFat * secSize)
      val arr = new Array[Long](raw.length / 4)
      var j = 0
      while (j < arr.length) { arr(j) = le32(raw, j * 4); j += 1 }
      arr
    }

    def readMiniChain(start: Long, size: Long): Array[Byte] = {
      val out = new Array[Byte](size.toInt)
      var pos = 0
      var sec = start
      var guard = 0
      while (sec != EndOfChain && sec != 0xFFFFFFFFL && pos < size) {
        if (guard > MaxSectors) throw new CfbException("mini chain too long")
        val off = (sec * miniSize).toInt
        if (off < 0 || off + miniSize > miniStream.length)
          throw new CfbException("mini sector out of range")
        val n = math.min(miniSize.toLong, size - pos).toInt
        System.arraycopy(miniStream, off, out, pos, n)
        pos += n
        if (sec >= miniFat.length) throw new CfbException("mini-FAT index out of range")
        sec = miniFat(sec.toInt)
        guard += 1
      }
      out
    }

    entries.collect {
      case e if e.objType == 2 && e.size >= 0 =>
        val bytes =
          if (e.size < miniCutoff) readMiniChain(e.startSector, e.size)
          else readChain(e.startSector, e.size)
        Stream(e.name, bytes)
    }.toVector
  }

  @inline private def le16(b: Array[Byte], off: Int): Int =
    (b(off) & 0xFF) | ((b(off + 1) & 0xFF) << 8)
  @inline private def le32(b: Array[Byte], off: Int): Long =
    ((b(off) & 0xFFL) | ((b(off + 1) & 0xFFL) << 8) |
      ((b(off + 2) & 0xFFL) << 16) | ((b(off + 3) & 0xFFL) << 24))
  @inline private def le64(b: Array[Byte], off: Int): Long = {
    var v = 0L
    var i = 7
    while (i >= 0) { v = (v << 8) | (b(off + i) & 0xFFL); i -= 1 }
    v
  }
}
