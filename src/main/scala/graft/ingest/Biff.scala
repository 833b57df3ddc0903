package graft.ingest

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path}

import scala.collection.mutable
import scala.collection.mutable.ArrayBuffer

/** Compound File Binary (OLE2) container reader — the outer layer of a
  * legacy `.xls`. JDK-only, from the published MS-CFB layout: a 512-byte
  * header, a FAT whose sector numbers arrive via the header DIFAT (plus
  * chained DIFAT sectors), a directory stream of 128-byte entries, and
  * a mini-FAT for streams below the mini cutoff (4096), which live in
  * 64-byte mini sectors inside the root entry's "mini stream".
  *
  * Only what reading one stream needs is implemented: no write path, no
  * red-black ordering of the directory (a linear scan finds the
  * `Workbook` stream), no storage hierarchy walk.
  */
object Cfb {

  private val Magic = Array(0xD0, 0xCF, 0x11, 0xE0, 0xA1, 0xB1, 0x1A, 0xE1).map(_.toByte)
  private val EndOfChain = 0xFFFFFFFE
  private val MaxChain = 1 << 24 // cycle guard: no real file has 16M sectors

  def isCfb(bytes: Array[Byte]): Boolean =
    bytes.length >= 512 && Magic.indices.forall(i => bytes(i) == Magic(i))

  private def u16(b: Array[Byte], o: Int): Int =
    (b(o) & 0xFF) | ((b(o + 1) & 0xFF) << 8)
  private def i32(b: Array[Byte], o: Int): Int =
    (b(o) & 0xFF) | ((b(o + 1) & 0xFF) << 8) | ((b(o + 2) & 0xFF) << 16) | ((b(o + 3) & 0xFF) << 24)

  /** The named stream's bytes, if the container parses and the stream
    * exists. `names` matches case-sensitively against directory-entry
    * names ("Workbook" for BIFF8, "Book" for BIFF5/7).
    */
  def stream(bytes: Array[Byte], names: Set[String]): Option[Array[Byte]] = {
    if (!isCfb(bytes)) return None
    val sectorShift = u16(bytes, 30)
    val miniShift = u16(bytes, 32)
    if (sectorShift < 7 || sectorShift > 12 || miniShift != 6) return None
    val sectorSize = 1 << sectorShift
    val firstDir = i32(bytes, 48)
    val miniCutoff = i32(bytes, 56)
    val firstMiniFat = i32(bytes, 60)
    val firstDifat = i32(bytes, 68)

    // offsets in Long: a corrupt sector id near 2^31/sectorSize would
    // wrap Int arithmetic into a small "valid" offset and silently read
    // the wrong bytes
    def sectorOffset(sid: Int): Long = (sid + 1L) * sectorSize
    def validSid(sid: Int): Boolean =
      sid >= 0 && sectorOffset(sid) + sectorSize <= bytes.length

    // FAT sector ids: 109 header DIFAT slots, then chained DIFAT sectors
    val fatSids = ArrayBuffer.empty[Int]
    var o = 76
    while (o < 512) { val v = i32(bytes, o); if (v >= 0) fatSids += v; o += 4 }
    var difat = firstDifat
    var difatGuard = 0
    // bounded by the file size (a DIFAT cycle cannot name more sectors
    // than the file holds), not just the iteration guard
    val maxDifat = bytes.length / sectorSize + 1
    while (validSid(difat) && difatGuard < maxDifat) {
      val base = sectorOffset(difat).toInt
      var i = 0
      while (i < sectorSize - 4) { val v = i32(bytes, base + i); if (v >= 0) fatSids += v; i += 4 }
      difat = i32(bytes, base + sectorSize - 4)
      difatGuard += 1
    }
    val entriesPerSector = sectorSize / 4
    val fat = new Array[Int](fatSids.length * entriesPerSector)
    var fi = 0
    fatSids.foreach { sid =>
      if (!validSid(sid)) return None
      val base = sectorOffset(sid).toInt
      var i = 0
      while (i < entriesPerSector) { fat(fi) = i32(bytes, base + i * 4); fi += 1; i += 1 }
    }

    /** Concatenated bytes of a regular-sector chain, truncated to
      * `size`. The accumulated length is additionally capped at the
      * FILE length: a cyclic FAT chain in a corrupt/hostile file must
      * produce a bounded buffer (and fall through to the fallback
      * converter), not an OutOfMemoryError — no legitimate stream is
      * larger than its container.
      */
    def chainBytes(start: Int, size: Long): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      val cap = math.min(size, bytes.length.toLong)
      var sid = start
      var guard = 0
      while (sid != EndOfChain && validSid(sid) && guard < MaxChain && out.size < cap) {
        out.write(bytes, sectorOffset(sid).toInt, sectorSize)
        sid = if (sid < fat.length) fat(sid) else EndOfChain
        guard += 1
      }
      val all = out.toByteArray
      if (size >= 0 && size < all.length) java.util.Arrays.copyOfRange(all, 0, size.toInt) else all
    }

    // directory: 128-byte entries; entry 0 is the root (owns the mini stream)
    val dir = chainBytes(firstDir, Long.MaxValue)
    final case class Entry(name: String, objType: Int, startSector: Int, size: Long)
    val entries = (0 until dir.length / 128).map { i =>
      val base = i * 128
      val nameLen = u16(dir, base + 64) // bytes incl. UTF-16 terminator
      val name =
        if (nameLen >= 2 && nameLen <= 64)
          new String(dir, base, nameLen - 2, StandardCharsets.UTF_16LE)
        else ""
      // stream size: low 4 bytes suffice for v3 (v4 huge streams are out
      // of scope for .xls, which predates them)
      Entry(name, dir(base + 66) & 0xFF, i32(dir, base + 116), i32(dir, base + 120).toLong & 0xFFFFFFFFL)
    }
    val root = entries.headOption.filter(_.objType == 5).getOrElse(return None)
    val target = entries.find(e => e.objType == 2 && names.contains(e.name)).getOrElse(return None)

    if (target.size >= miniCutoff) Some(chainBytes(target.startSector, target.size))
    else {
      // mini-stream read: miniFAT chain over 64-byte sectors carved out
      // of the root entry's regular-sector chain
      val miniStream = chainBytes(root.startSector, root.size)
      val miniFatBytes = chainBytes(firstMiniFat, Long.MaxValue)
      val out = new java.io.ByteArrayOutputStream()
      var msid = target.startSector
      var guard = 0
      while (msid != EndOfChain && msid >= 0 && guard < MaxChain && out.size < target.size) {
        // Long offsets: a corrupt mini-sector id near 2^31/64 wraps
        // `msid * 64` negative and sails past the bounds check into an
        // IndexOutOfBounds (found by the directory-entry fuzzer)
        val off = msid.toLong * 64
        if (off + 64 > miniStream.length) return None
        out.write(miniStream, off.toInt, 64)
        msid =
          if ((msid.toLong + 1) * 4 <= miniFatBytes.length) i32(miniFatBytes, msid * 4)
          else EndOfChain
        guard += 1
      }
      val all = out.toByteArray
      Some(if (target.size < all.length) java.util.Arrays.copyOfRange(all, 0, target.size.toInt) else all)
    }
  }
}

/** BIFF8 Workbook-stream reader — the inner layer of a legacy `.xls`
  * (reference parity: pandas' xlrd engine fallback,
  * `systemscripts/xls_to_csv.py:62-78`). Record-level, from the
  * published MS-XLS layout; reads the FIRST sheet like the reference
  * (`pd.read_excel` default).
  *
  * Globals substream: SST (shared strings, with the CONTINUE-record
  * re-grbit rule: a string's character data split across a CONTINUE
  * boundary restarts with a fresh encoding-flags byte) and BOUNDSHEET
  * (absolute stream offset of each sheet's BOF — the first one wins).
  * Sheet substream: LABELSST, NUMBER, RK, MULRK, BOOLERR, LABEL /
  * RSTRING, and FORMULA cached results (with the trailing STRING
  * record for string-valued formulas). BLANK/MULBLANK stay gaps, like
  * the XLSX reader's missing cells.
  */
object Biff {

  private val RecBof = 0x0809
  private val RecEof = 0x000A
  private val RecSst = 0x00FC
  private val RecContinue = 0x003C
  private val RecBoundSheet = 0x0085
  private val RecLabelSst = 0x00FD
  private val RecNumber = 0x0203
  private val RecRk = 0x027E
  private val RecMulRk = 0x00BD
  private val RecBoolErr = 0x0205
  private val RecLabel = 0x0204
  private val RecRString = 0x00D6
  private val RecFormula = 0x0006
  private val RecString = 0x0207

  private def u16(b: Array[Byte], o: Int): Int =
    (b(o) & 0xFF) | ((b(o + 1) & 0xFF) << 8)
  private def i32(b: Array[Byte], o: Int): Int =
    (b(o) & 0xFF) | ((b(o + 1) & 0xFF) << 8) | ((b(o + 2) & 0xFF) << 16) | ((b(o + 3) & 0xFF) << 24)
  private def f64(b: Array[Byte], o: Int): Double = {
    var bits = 0L
    var i = 7
    while (i >= 0) { bits = (bits << 8) | (b(o + i) & 0xFFL); i -= 1 }
    java.lang.Double.longBitsToDouble(bits)
  }

  /** Render a cached/stored numeric like the CSV layer expects: whole
    * doubles as integers (cell 119179 must not surface as 119179.0).
    */
  private def fmtNum(d: Double): String =
    if (d == math.rint(d) && math.abs(d) < 1e15 && !d.isInfinite) d.toLong.toString
    else d.toString

  /** RK: the 4-byte packed numeric — bit0 = ×0.01, bit1 = 30-bit int
    * (else the top 30 bits of an IEEE double's high word).
    */
  private def rkValue(rk: Int): Double = {
    val base =
      if ((rk & 0x02) != 0) (rk >> 2).toDouble
      else java.lang.Double.longBitsToDouble((rk & 0xFFFFFFFCL) << 32)
    if ((rk & 0x01) != 0) base / 100.0 else base
  }

  /** Cursor over SST payload + its CONTINUE payloads, implementing the
    * cross-boundary header reads and the per-continuation grbit rule.
    */
  private final class SstCursor(chunks: IndexedSeq[Array[Byte]]) {
    private var ci = 0
    private var off = 0
    private def ensure(): Unit =
      while (ci < chunks.length && off >= chunks(ci).length) { ci += 1; off = 0 }
    def atBoundary: Boolean = { ensure(); off == 0 && ci > 0 }
    def hasMore: Boolean = { ensure(); ci < chunks.length }
    def readU8(): Int = { ensure(); val v = chunks(ci)(off) & 0xFF; off += 1; v }
    def readU16(): Int = readU8() | (readU8() << 8)
    def readI32(): Int = readU16() | (readU16() << 16)
    def skip(n: Int): Unit = { var i = 0; while (i < n) { readU8(); i += 1 } }
    /** One XLUnicodeRichExtendedString. */
    def readString(): String = {
      val cch = readU16()
      var flags = readU8()
      val cRun = if ((flags & 0x08) != 0) readU16() else 0
      val cbExt = if ((flags & 0x04) != 0) readI32() else 0
      val sb = new StringBuilder(cch)
      var remaining = cch
      while (remaining > 0) {
        ensure()
        // CONTINUE boundary inside character data: a fresh grbit byte
        // (only the fHighByte bit) precedes the rest of the characters
        if (atBoundary) flags = readU8()
        if ((flags & 0x01) != 0) sb += readU16().toChar
        else sb += readU8().toChar
        remaining -= 1
      }
      skip(4 * cRun)
      skip(cbExt)
      sb.toString
    }
  }

  /** Shared-string table + first-sheet offset from the globals
    * substream; then the first sheet's cells.
    *
    * BIFF5/7 (pre-97 `.xls`, the `Book` stream) differs only in string
    * encoding: inline strings are byte strings (cch + raw bytes, no
    * flags byte) and there is no SST/LABELSST — handled by the
    * `biff5` branch below, so xlrd's whole legacy surface decodes.
    *
    * @return rows in ascending row order; gaps inside a row are "".
    */
  def firstSheetRows(wb: Array[Byte]): Vector[Vector[String]] = {
    require(wb.length >= 8 && u16(wb, 0) == RecBof, "not a BIFF stream")
    val vers = u16(wb, 4)
    val biff5 = vers == 0x0500
    require(biff5 || vers == 0x0600, "not BIFF5/BIFF8") // older → caller falls back

    // ---- pass 1: globals — SST chunks and the first BOUNDSHEET offset
    val sstChunks = ArrayBuffer.empty[Array[Byte]]
    var collectingSst = false
    var firstSheetPos = -1
    var p = 0
    var depth = 0
    var done = false
    while (!done && p + 4 <= wb.length) {
      val id = u16(wb, p)
      val len = u16(wb, p + 2)
      val body = p + 4
      id match {
        case RecBof => depth += 1; collectingSst = false
        case RecEof => depth -= 1; collectingSst = false; if (depth <= 0) done = true
        case RecSst =>
          sstChunks += java.util.Arrays.copyOfRange(wb, body, body + len)
          collectingSst = true
        case RecContinue if collectingSst =>
          sstChunks += java.util.Arrays.copyOfRange(wb, body, body + len)
        case RecBoundSheet =>
          // first WORKSHEET (dt byte 0x00) — chart/macro sheets are
          // skipped, like pd.read_excel resolving sheet index 0
          if (firstSheetPos < 0 && len >= 6 && (wb(body + 5) & 0xFF) == 0)
            firstSheetPos = i32(wb, body)
          collectingSst = false
        case _ => collectingSst = false
      }
      p = body + len
    }
    val sst: IndexedSeq[String] =
      if (sstChunks.isEmpty) IndexedSeq.empty
      else {
        val cur = new SstCursor(sstChunks.toIndexedSeq)
        cur.skip(4) // cstTotal
        val unique = cur.readI32()
        (0 until unique).map(_ => cur.readString())
      }
    require(firstSheetPos >= 0 && firstSheetPos + 4 <= wb.length, "no sheet in workbook")

    // ---- pass 2: the first sheet's cell records
    val rows = mutable.TreeMap.empty[Int, ArrayBuffer[String]]
    def place(row: Int, col: Int, v: String): Unit = {
      val r = rows.getOrElseUpdate(row, ArrayBuffer.empty[String])
      while (r.size <= col) r += ""
      r(col) = v
    }
    /** BIFF8: XLUnicodeString (cch16 + flags + chars). BIFF5: byte
      * string (cch16 + raw bytes, Latin-1 — codepage records are out
      * of scope, like a style-less xlrd read).
      */
    def inlineString(o: Int): String = {
      val cch = u16(wb, o)
      val wide = !biff5 && (wb(o + 2) & 0x01) != 0
      val base = if (biff5) o + 2 else o + 3
      val sb = new StringBuilder(cch)
      var i = 0
      while (i < cch) {
        if (wide) sb += u16(wb, base + 2 * i).toChar else sb += (wb(base + i) & 0xFF).toChar
        i += 1
      }
      sb.toString
    }
    p = firstSheetPos
    require(u16(wb, p) == RecBof, "BOUNDSHEET offset does not land on BOF")
    var sheetDone = false
    var lastFormulaCell: Option[(Int, Int)] = None // STRING record target
    depth = 0
    while (!sheetDone && p + 4 <= wb.length) {
      val id = u16(wb, p)
      val len = u16(wb, p + 2)
      val b = p + 4
      id match {
        case RecBof => depth += 1
        case RecEof => depth -= 1; if (depth <= 0) sheetDone = true
        case RecLabelSst =>
          place(u16(wb, b), u16(wb, b + 2), sst.lift(i32(wb, b + 6)).getOrElse(""))
        case RecNumber =>
          place(u16(wb, b), u16(wb, b + 2), fmtNum(f64(wb, b + 6)))
        case RecRk =>
          place(u16(wb, b), u16(wb, b + 2), fmtNum(rkValue(i32(wb, b + 6))))
        case RecMulRk =>
          val row = u16(wb, b)
          val colFirst = u16(wb, b + 2)
          val n = (len - 6) / 6
          var i = 0
          while (i < n) {
            place(row, colFirst + i, fmtNum(rkValue(i32(wb, b + 4 + 6 * i + 2))))
            i += 1
          }
        case RecBoolErr =>
          val isErr = (wb(b + 7) & 0xFF) != 0
          // error cells surface as gaps (pandas: NaN); booleans as the
          // same True/False the XLSX path emits
          if (!isErr) place(u16(wb, b), u16(wb, b + 2), if ((wb(b + 6) & 0xFF) != 0) "True" else "False")
        case RecLabel | RecRString =>
          place(u16(wb, b), u16(wb, b + 2), inlineString(b + 6))
        case RecFormula =>
          val row = u16(wb, b)
          val col = u16(wb, b + 2)
          if (u16(wb, b + 12) == 0xFFFF) {
            (wb(b + 6) & 0xFF) match {
              case 0 => lastFormulaCell = Some((row, col)) // STRING follows
              case 1 => place(row, col, if ((wb(b + 8) & 0xFF) != 0) "True" else "False")
              case _ => () // error / empty-string results stay gaps
            }
          } else place(row, col, fmtNum(f64(wb, b + 6)))
        case RecString =>
          lastFormulaCell.foreach { case (r, c) => place(r, c, inlineString(b)) }
          lastFormulaCell = None
        case _ => ()
      }
      p = b + len
    }
    rows.valuesIterator.map(_.toVector).toVector
  }

  /** First-sheet rows of a legacy `.xls` file, or None when the file is
    * not a CFB container or not BIFF8 inside.
    */
  def firstSheetRowsOfFile(path: Path): Option[Vector[Vector[String]]] = {
    val bytes = Files.readAllBytes(path)
    Cfb.stream(bytes, Set("Workbook", "Book")).flatMap { wb =>
      try Some(firstSheetRows(wb))
      catch { case _: Exception => None }
    }
  }
}

/** S2 legacy branch: decode BIFF8 and BIFF5/7 `.xls` (the reference's
  * xlrd engine, `xls_to_csv.py:62-78`); anything that is not a
  * CFB/BIFF file (CSV payloads under an .xls name, truncated
  * downloads) falls through — default [[PassthroughConverter]],
  * mirroring how the reference's engine chain gives up.
  */
final class BiffConverter(
    fallback: XlsConverter = new PassthroughConverter,
    maxBytes: Long = XlsConverter.DefaultMaxBytes
) extends XlsConverter {
  def toCsv(xls: Path): Path = {
    val size = Files.size(xls)
    if (size > maxBytes) throw new OversizedSpreadsheetException(size, maxBytes)
    (try Biff.firstSheetRowsOfFile(xls)
     catch { case _: Exception => None }) match {
      case Some(rows) if rows.nonEmpty => SheetCsv.write(xls, rows)
      case _ => fallback.toCsv(xls)
    }
  }
}
