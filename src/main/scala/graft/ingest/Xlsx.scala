package graft.ingest

import java.io.InputStream
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths}
import java.util.zip.ZipFile

import javax.xml.stream.{XMLInputFactory, XMLStreamConstants, XMLStreamReader}

import scala.collection.mutable.ArrayBuffer

/** Real XLSX decode for the S2 conversion seam — no spreadsheet
  * library exists in the container, but XLSX is just a zip of XML
  * parts, so the decode is JDK-only: `ZipFile` + StAX.
  *
  * Reference behavior (`systemscripts/xls_to_csv.py:53-78`): read the
  * FIRST sheet, first row is the header, write CSV next to the input
  * with QUOTE_NONNUMERIC quoting (`:80`). Parts read:
  *  - `xl/workbook.xml` — sheet order; the first `<sheet>`'s
  *    relationship id picks the part;
  *  - `xl/_rels/workbook.xml.rels` — relationship id → worksheet path;
  *  - `xl/sharedStrings.xml` — the shared-string table (`t="s"` cells
  *    store an index into it); rich-text runs concatenate;
  *  - `xl/worksheets/sheetN.xml` — rows/cells; cell refs (`r="B2"`)
  *    place values, so sparse rows keep their gaps as empty fields.
  *
  * Out of scope (documented, not silently wrong): number-format
  * styles — date-styled numeric cells surface as their raw serial
  * value, the same as pandas with a style-less reader.
  */
object Xlsx {

  private val RelNs = "http://schemas.openxmlformats.org/officeDocument/2006/relationships"

  private def xmlReader(in: InputStream): XMLStreamReader = {
    val f = XMLInputFactory.newInstance()
    // spreadsheet parts never need DTDs; closing the door is free
    f.setProperty(XMLInputFactory.SUPPORT_DTD, java.lang.Boolean.FALSE)
    f.setProperty(XMLInputFactory.IS_SUPPORTING_EXTERNAL_ENTITIES, java.lang.Boolean.FALSE)
    f.createXMLStreamReader(in)
  }

  private def withPart[A](zip: ZipFile, name: String)(f: XMLStreamReader => A): Option[A] =
    Option(zip.getEntry(name)).map { e =>
      val in = zip.getInputStream(e)
      val r = xmlReader(in)
      try f(r)
      finally { r.close(); in.close() }
    }

  /** The worksheet part of the workbook's first sheet. */
  private def firstSheetPart(zip: ZipFile): String = {
    val rid = withPart(zip, "xl/workbook.xml") { r =>
      var found: Option[String] = None
      while (found.isEmpty && r.hasNext) {
        if (r.next() == XMLStreamConstants.START_ELEMENT && r.getLocalName == "sheet")
          found = Option(r.getAttributeValue(RelNs, "id"))
      }
      found
    }.flatten
    val target = rid.flatMap { id =>
      withPart(zip, "xl/_rels/workbook.xml.rels") { r =>
        var found: Option[String] = None
        while (found.isEmpty && r.hasNext) {
          if (r.next() == XMLStreamConstants.START_ELEMENT &&
              r.getLocalName == "Relationship" &&
              r.getAttributeValue(null, "Id") == id)
            found = Option(r.getAttributeValue(null, "Target"))
        }
        found
      }.flatten
    }
    target match {
      case Some(t) if t.startsWith("/") => t.drop(1)
      case Some(t) => s"xl/$t"
      case None => "xl/worksheets/sheet1.xml" // minimal producers skip rels
    }
  }

  /** Shared-string table in order; a rich-text `<si>` concatenates
    * every `<t>` run it contains.
    */
  private def sharedStrings(zip: ZipFile): IndexedSeq[String] =
    withPart(zip, "xl/sharedStrings.xml") { r =>
      val out = ArrayBuffer.empty[String]
      val cur = new StringBuilder
      var inT = false
      while (r.hasNext) r.next() match {
        case XMLStreamConstants.START_ELEMENT if r.getLocalName == "si" => cur.clear()
        case XMLStreamConstants.START_ELEMENT if r.getLocalName == "t" => inT = true
        case XMLStreamConstants.CHARACTERS if inT => cur ++= r.getText
        case XMLStreamConstants.END_ELEMENT if r.getLocalName == "t" => inT = false
        case XMLStreamConstants.END_ELEMENT if r.getLocalName == "si" => out += cur.toString
        case _ => ()
      }
      out.toIndexedSeq
    }.getOrElse(IndexedSeq.empty)

  /** "BC12" → zero-based column 54; cells without a ref land after the
    * previous cell (the spec's sequential default).
    */
  private def colOf(ref: String): Int = {
    var c = 0
    var i = 0
    while (i < ref.length && ref.charAt(i).isLetter) {
      c = c * 26 + (ref.charAt(i).toUpper - 'A' + 1); i += 1
    }
    c - 1
  }

  /** Rows of the first sheet as strings, gaps preserved as "". */
  def firstSheetRows(path: Path): Vector[Vector[String]] = {
    val zip = new ZipFile(path.toFile)
    try {
      val shared = sharedStrings(zip)
      withPart(zip, firstSheetPart(zip)) { r =>
        val rows = ArrayBuffer.empty[Vector[String]]
        var row: ArrayBuffer[String] = null
        var cellType = ""
        var cellCol = -1
        var nextCol = 0
        val cell = new StringBuilder // value runs of the OPEN cell
        var sawValue = false
        val text = new StringBuilder
        var capture = false
        def place(v: String): Unit = {
          val at = if (cellCol >= 0) cellCol else nextCol
          while (row.size <= at) row += ""
          row(at) = v
          nextCol = at + 1
        }
        while (r.hasNext) r.next() match {
          case XMLStreamConstants.START_ELEMENT => r.getLocalName match {
            case "row" => row = ArrayBuffer.empty[String]; nextCol = 0
            case "c" =>
              cellType = Option(r.getAttributeValue(null, "t")).getOrElse("")
              cellCol = Option(r.getAttributeValue(null, "r")).map(colOf).getOrElse(-1)
              cell.clear(); sawValue = false
            case "v" | "t" => capture = true; text.clear()
            case _ => ()
          }
          case XMLStreamConstants.CHARACTERS if capture => text ++= r.getText
          case XMLStreamConstants.END_ELEMENT => r.getLocalName match {
            case "v" | "t" =>
              capture = false
              cell ++= text; sawValue = true // rich inline strings append runs
            case "c" =>
              if (row != null && sawValue) place(cellType match {
                case "s" => shared.lift(cell.toString.trim.toInt).getOrElse("")
                case "b" => if (cell.toString.trim == "1") "True" else "False"
                case _ => cell.toString // n / str / inlineStr
              })
              else if (row != null) nextCol = (if (cellCol >= 0) cellCol else nextCol) + 1
            case "row" => rows += row.toVector; row = null
            case _ => ()
          }
          case _ => ()
        }
        rows.toVector
      }.getOrElse(Vector.empty)
    } finally zip.close()
  }
}

/** Shared CSV emission for the spreadsheet decoders, mirroring pandas'
  * `QUOTE_NONNUMERIC` (`xls_to_csv.py:80`): numeric fields bare,
  * everything else quoted; header cells beyond a row's width surface
  * as pandas' `Unnamed: i`. Written next to the input, `.csv` suffix.
  */
private[ingest] object SheetCsv {

  private val NumericRe = """-?\d+(\.\d+)?([eE][+-]?\d+)?""".r

  private def field(v: String): String =
    if (v.nonEmpty && NumericRe.matches(v)) v
    else "\"" + v.replace("\"", "\"\"") + "\""

  def write(src: Path, rows: Vector[Vector[String]]): Path = {
    val csv = Paths.get(src.toString.replaceAll("\\.[^.]*$", "") + ".csv")
    val nCols = rows.iterator.map(_.length).max
    val header = rows.head.padTo(nCols, "").zipWithIndex
      .map { case (h, i) => if (h.isEmpty) s"Unnamed: $i" else h }
    val sb = new StringBuilder
    sb ++= header.map(field).mkString(",") += '\n'
    rows.tail.foreach { r =>
      sb ++= r.padTo(nCols, "").map(v => if (v.isEmpty) "" else field(v)).mkString(",") += '\n'
    }
    Files.write(csv, sb.toString.getBytes(StandardCharsets.UTF_8))
    csv
  }
}

/** S2 converter with a REAL decode: XLSX through [[Xlsx]], and the
  * same engine-fallback chain as the reference (`xls_to_csv.py:53-78`
  * tries openpyxl, then xlrd) — anything the zip/XML reader rejects
  * goes to `legacyFallback`, by default [[BiffConverter]] (real BIFF8
  * `.xls` decode), whose own fallback passes CSV-shaped payloads
  * through untouched.
  */
final class XlsxConverter(
    legacyFallback: XlsConverter = new BiffConverter,
    maxBytes: Long = XlsConverter.DefaultMaxBytes
) extends XlsConverter {

  def toCsv(xls: Path): Path = {
    val size = Files.size(xls)
    if (size > maxBytes) throw new OversizedSpreadsheetException(size, maxBytes)
    val rows =
      try Xlsx.firstSheetRows(xls)
      catch { case _: Exception => Vector.empty }
    if (rows.isEmpty) legacyFallback.toCsv(xls)
    else SheetCsv.write(xls, rows)
  }
}
