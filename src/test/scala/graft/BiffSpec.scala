package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import scala.collection.mutable.ArrayBuffer

/** Hand-built CFB + BIFF8 fixtures, byte-for-byte from the published
  * MS-CFB / MS-XLS layouts — the container and record formats are
  * written here independently of the reader so the two sides
  * cross-check each other. Covers both container paths (mini-stream
  * for streams < 4096 bytes, regular FAT chain above) and the
  * cell-record surface the reader claims.
  */
object BiffFixtures {

  final class W {
    val b = ArrayBuffer.empty[Byte]
    def u8(v: Int): W = { b += (v & 0xFF).toByte; this }
    def u16(v: Int): W = { u8(v); u8(v >> 8); this }
    def i32(v: Int): W = { u16(v & 0xFFFF); u16((v >>> 16) & 0xFFFF); this }
    def f64(v: Double): W = {
      val bits = java.lang.Double.doubleToLongBits(v)
      (0 until 8).foreach(i => u8((bits >>> (8 * i)).toInt)); this
    }
    def raw(a: Array[Byte]): W = { b ++= a; this }
    def ascii(s: String): W = raw(s.getBytes("ISO-8859-1"))
    def result: Array[Byte] = b.toArray
  }

  def rec(id: Int, payload: Array[Byte]): Array[Byte] =
    new W().u16(id).u16(payload.length).raw(payload).result

  def bof(dt: Int): Array[Byte] =
    rec(0x0809, new W().u16(0x0600).u16(dt).u16(0x0DBB).u16(0x07CC).i32(0).i32(0).result)
  val eof: Array[Byte] = rec(0x000A, Array.empty)

  def sstPayload(strings: Seq[String]): Array[Byte] = {
    val w = new W().i32(strings.length).i32(strings.length)
    strings.foreach { s =>
      val wide = s.exists(_ > 0xFF)
      w.u16(s.length).u8(if (wide) 1 else 0)
      if (wide) s.foreach(c => w.u16(c.toInt)) else w.ascii(s)
    }
    w.result
  }

  def boundSheet(pos: Int, name: String, dt: Int = 0): Array[Byte] =
    rec(0x0085, new W().i32(pos).u8(0).u8(dt).u8(name.length).u8(0).ascii(name).result)

  def labelSst(row: Int, col: Int, isst: Int): Array[Byte] =
    rec(0x00FD, new W().u16(row).u16(col).u16(0).i32(isst).result)
  def number(row: Int, col: Int, v: Double): Array[Byte] =
    rec(0x0203, new W().u16(row).u16(col).u16(0).f64(v).result)
  def rkInt(row: Int, col: Int, v: Int): Array[Byte] =
    rec(0x027E, new W().u16(row).u16(col).u16(0).i32((v << 2) | 0x02).result)
  def rkF100(row: Int, col: Int, centi: Int): Array[Byte] =
    rec(0x027E, new W().u16(row).u16(col).u16(0).i32((centi << 2) | 0x03).result)
  def mulRkInts(row: Int, colFirst: Int, vs: Seq[Int]): Array[Byte] = {
    val w = new W().u16(row).u16(colFirst)
    vs.foreach(v => w.u16(0).i32((v << 2) | 0x02))
    w.u16(colFirst + vs.length - 1)
    rec(0x00BD, w.result)
  }
  def boolErr(row: Int, col: Int, v: Boolean): Array[Byte] =
    rec(0x0205, new W().u16(row).u16(col).u16(0).u8(if (v) 1 else 0).u8(0).result)
  def label(row: Int, col: Int, s: String): Array[Byte] = {
    val wide = s.exists(_ > 0xFF)
    val w = new W().u16(row).u16(col).u16(0).u16(s.length).u8(if (wide) 1 else 0)
    if (wide) s.foreach(c => w.u16(c.toInt)) else w.ascii(s)
    rec(0x0204, w.result)
  }
  def formulaNum(row: Int, col: Int, v: Double): Array[Byte] =
    rec(0x0006, new W().u16(row).u16(col).u16(0).f64(v).u16(0).i32(0).u16(0).result)
  def formulaStr(row: Int, col: Int): Array[Byte] =
    rec(0x0006, new W().u16(row).u16(col).u16(0)
      .u8(0).u8(0).i32(0).u16(0xFFFF) // cached value: "string follows"
      .u16(0).i32(0).u16(0).result)
  def stringRec(s: String): Array[Byte] =
    rec(0x0207, new W().u16(s.length).u8(0).ascii(s).result)

  def sheet(cells: Array[Byte]*): Array[Byte] =
    new W().raw(bof(0x0010)).raw(cells.flatten.toArray).raw(eof).result

  /** Globals (BOF + SST [+ extra records] + BOUNDSHEETs + EOF) followed
    * by the sheet substreams, BOUNDSHEET offsets patched to the real
    * positions. `sstRecords` defaults to one SST record; tests may pass
    * a hand-split SST + CONTINUE pair instead.
    */
  def workbook(
      sstRecords: Seq[Array[Byte]],
      sheets: Seq[(String, Array[Byte])]
  ): Array[Byte] = {
    def globals(positions: Seq[Int]): Array[Byte] = {
      val w = new W().raw(bof(0x0005))
      sstRecords.foreach(w.raw)
      positions.zip(sheets.map(_._1)).foreach { case (p, n) => w.raw(boundSheet(p, n)) }
      w.raw(eof).result
    }
    val gLen = globals(Seq.fill(sheets.length)(0)).length
    val positions = sheets.map(_._2).scanLeft(gLen)((acc, s) => acc + s.length).init
    val w = new W().raw(globals(positions))
    sheets.foreach { case (_, s) => w.raw(s) }
    w.result
  }

  def workbook(sstStrings: Seq[String], sheets: Seq[(String, Array[Byte])])(
      implicit d: DummyImplicit): Array[Byte] =
    workbook(Seq(rec(0x00FC, sstPayload(sstStrings))), sheets)

  // ---- BIFF5/7 variants (pre-97 .xls, "Book" stream): byte strings,
  // no flags byte, no SST ----

  def bof5(dt: Int): Array[Byte] =
    rec(0x0809, new W().u16(0x0500).u16(dt).u16(0x0DBB).u16(0x07CC).result)
  def boundSheet5(pos: Int, name: String): Array[Byte] =
    rec(0x0085, new W().i32(pos).u8(0).u8(0).u8(name.length).ascii(name).result)
  def label5(row: Int, col: Int, s: String): Array[Byte] =
    rec(0x0204, new W().u16(row).u16(col).u16(0).u16(s.length).ascii(s).result)
  def sheet5(cells: Array[Byte]*): Array[Byte] =
    new W().raw(bof5(0x0010)).raw(cells.flatten.toArray).raw(eof).result

  def workbook5(sheets: Seq[(String, Array[Byte])]): Array[Byte] = {
    def globals(positions: Seq[Int]): Array[Byte] = {
      val w = new W().raw(bof5(0x0005))
      positions.zip(sheets.map(_._1)).foreach { case (p, n) => w.raw(boundSheet5(p, n)) }
      w.raw(eof).result
    }
    val gLen = globals(Seq.fill(sheets.length)(0)).length
    val positions = sheets.map(_._2).scanLeft(gLen)((acc, s) => acc + s.length).init
    val w = new W().raw(globals(positions))
    sheets.foreach { case (_, s) => w.raw(s) }
    w.result
  }

  // ---- CFB container ----

  private val Free = 0xFFFFFFFF
  private val End = 0xFFFFFFFE
  private val FatSect = 0xFFFFFFFD

  private def pad(a: Array[Byte], m: Int): Array[Byte] =
    if (a.length % m == 0) a else a ++ new Array[Byte](m - a.length % m)

  private def dirEntry(name: String, typ: Int, start: Int, size: Long, child: Int): Array[Byte] = {
    val w = new W()
    name.foreach(c => w.u16(c.toInt))
    while (w.b.length < 64) w.u8(0)
    w.u16(if (name.isEmpty) 0 else (name.length + 1) * 2)
    w.u8(typ).u8(1)
    w.i32(Free).i32(Free).i32(child)
    (0 until 36).foreach(_ => w.u8(0)) // CLSID + state + timestamps
    w.i32(start).i32(size.toInt).i32(0)
    w.result
  }

  private def header(numFat: Int, firstDir: Int, firstMiniFat: Int, numMiniFat: Int): Array[Byte] = {
    val w = new W()
    w.raw(Array(0xD0, 0xCF, 0x11, 0xE0, 0xA1, 0xB1, 0x1A, 0xE1).map(_.toByte))
    (0 until 16).foreach(_ => w.u8(0)) // CLSID
    w.u16(0x003E).u16(0x0003).u16(0xFFFE).u16(9).u16(6)
    (0 until 6).foreach(_ => w.u8(0))
    w.i32(0).i32(numFat).i32(firstDir).i32(0).i32(4096)
    w.i32(firstMiniFat).i32(numMiniFat).i32(End).i32(0)
    w.i32(0) // DIFAT[0]: the FAT lives at sector 0
    (1 until 109).foreach(_ => w.i32(Free))
    w.result
  }

  private def ints(a: Array[Int]): Array[Byte] = {
    val w = new W(); a.foreach(w.i32); w.result
  }

  /** Wrap `stream` as the workbook stream of a CFB file ("Workbook"
    * for BIFF8; BIFF5 files name it "Book"). Streams under 4096 bytes
    * go through the mini-stream path (mini-FAT + 64-byte sectors
    * inside the root entry), like real small .xls files; larger
    * streams use a regular FAT chain.
    */
  def cfb(stream: Array[Byte], streamName: String = "Workbook"): Array[Byte] =
    if (stream.length < 4096) {
      val mini = pad(stream, 64)
      val nMini = mini.length / 64
      val container = pad(mini, 512)
      val nCont = container.length / 512
      // sectors: 0 FAT, 1 directory, 2 miniFAT, 3.. mini-stream container
      val fat = Array.fill(128)(Free)
      fat(0) = FatSect; fat(1) = End; fat(2) = End
      (0 until nCont).foreach(i => fat(3 + i) = if (i == nCont - 1) End else 4 + i)
      val miniFat = Array.fill(128)(Free)
      (0 until nMini).foreach(i => miniFat(i) = if (i == nMini - 1) End else i + 1)
      val dir = dirEntry("Root Entry", 5, 3, mini.length, child = 1) ++
        dirEntry(streamName, 2, 0, stream.length, child = Free) ++
        new Array[Byte](256)
      header(1, 1, 2, 1) ++ ints(fat) ++ dir ++ ints(miniFat) ++ container
    } else {
      val data = pad(stream, 512)
      val nd = data.length / 512
      require(nd <= 126, "fixture too large for a single FAT sector")
      // sectors: 0 FAT, 1 directory, 2.. stream data
      val fat = Array.fill(128)(Free)
      fat(0) = FatSect; fat(1) = End
      (0 until nd).foreach(i => fat(2 + i) = if (i == nd - 1) End else 3 + i)
      val dir = dirEntry("Root Entry", 5, End, 0, child = 1) ++
        dirEntry(streamName, 2, 2, stream.length, child = Free) ++
        new Array[Byte](256)
      header(1, 1, End, 0) ++ ints(fat) ++ dir ++ data
    }

  /** The E2E import fixture: same logical grid as ImporterSpec's XLSX
    * one — headers, a NUMBER + shared string + TRUE row, and an RK +
    * gap + FALSE row; a second sheet holds a sentinel that must never
    * surface.
    */
  def importXls: Array[Byte] = cfb(workbook(
    Seq("EventID", "Company Name", "Flag", "Acme Corp"),
    Seq(
      "Data" -> sheet(
        labelSst(0, 0, 0), labelSst(0, 1, 1), labelSst(0, 2, 2),
        number(1, 0, 119179.0), labelSst(1, 1, 3), boolErr(1, 2, v = true),
        rkInt(2, 0, 119180), boolErr(2, 2, v = false)),
      "Second" -> sheet(label(0, 0, "WRONG SHEET")))))

  /** Invalid-marker fixture (T9 through the real decoder). */
  def invalidXls: Array[Byte] = cfb(workbook(
    Seq("Company Name"),
    Seq("Data" -> sheet(labelSst(0, 0, 0), label(1, 0, "Invalid Event ID")))))
}

class BiffSpec extends AnyFunSuite {
  import BiffFixtures._

  private def rows(bytes: Array[Byte]): Vector[Vector[String]] = {
    val dir = Files.createTempDirectory("graft-biff")
    val p = dir.resolve("f.xls")
    Files.write(p, bytes)
    graft.ingest.Biff.firstSheetRowsOfFile(p).getOrElse(fail("decode failed"))
  }

  test("mini-stream .xls decodes: SST/NUMBER/RK/MULRK/BOOLERR/LABEL/FORMULA cells, first sheet only") {
    val wb = workbook(
      Seq("Head", "Zürich"),
      Seq(
        "Data" -> sheet(
          labelSst(0, 0, 0), labelSst(0, 1, 1),
          number(1, 0, 119179.0), rkInt(1, 1, -7), rkF100(1, 2, 150), // 1.5
          mulRkInts(2, 0, Seq(5, 6, 7)),
          boolErr(3, 0, v = true), boolErr(3, 2, v = false), // col 1 gap
          label(4, 0, "inline"), label(4, 1, "w→de"), // > 0xFF: wide branch
          formulaNum(5, 0, 42.0), formulaStr(5, 1), stringRec("fstr")),
        "Second" -> sheet(label(0, 0, "WRONG SHEET"))))
    val r = rows(cfb(wb))
    assert(r == Vector(
      Vector("Head", "Zürich"),
      Vector("119179", "-7", "1.5"),
      Vector("5", "6", "7"),
      Vector("True", "", "False"),
      Vector("inline", "w→de"),
      Vector("42", "fstr")))
  }

  test("SST string split across a CONTINUE record restarts with a fresh grbit") {
    // "HELLOWORLD": 5 compressed chars in the SST record, the rest as
    // WIDE chars in the CONTINUE (grbit flips to 1 at the boundary)
    val sstRec = rec(0x00FC, new W().i32(1).i32(1).u16(10).u8(0).ascii("HELLO").result)
    val cont = rec(0x003C, { val w = new W().u8(1); "WORLD".foreach(c => w.u16(c.toInt)); w.result })
    val wb = workbook(Seq(sstRec, cont), Seq("Data" -> sheet(labelSst(0, 0, 0))))
    assert(rows(cfb(wb)) == Vector(Vector("HELLOWORLD")))
  }

  test("large workbook stream (>= 4096 bytes) reads through the regular FAT chain") {
    val cells = (0 until 400).map(i => number(i, 0, i * 10.0))
    val wb = workbook(Seq.empty[String], Seq("Data" -> sheet(cells: _*)))
    assert(wb.length >= 4096, "fixture must exercise the non-mini path")
    val r = rows(cfb(wb))
    assert(r.length == 400 && r(0) == Vector("0") && r(399) == Vector("3990"))
  }

  test("a leading chart sheet is skipped: the first WORKSHEET boundsheet wins") {
    // build globals by hand: boundsheet[0] is a chart (dt=2), [1] the
    // real worksheet — pd.read_excel's sheet 0 is the worksheet
    val chart = sheet(label(0, 0, "CHART SUBSTREAM"))
    val data = sheet(label(0, 0, "real"))
    def globals(p1: Int, p2: Int): Array[Byte] = {
      val w = new W().raw(bof(0x0005)).raw(rec(0x00FC, sstPayload(Seq())))
      w.raw(boundSheet(p1, "Chart1", dt = 2)).raw(boundSheet(p2, "Data"))
      w.raw(eof).result
    }
    val gLen = globals(0, 0).length
    val wb = new W().raw(globals(gLen, gLen + chart.length)).raw(chart).raw(data).result
    assert(rows(cfb(wb)) == Vector(Vector("real")))
  }

  test("BIFF5 .xls ('Book' stream, byte strings, no SST) decodes through the same reader") {
    val wb = workbook5(Seq(
      "Data" -> sheet5(
        label5(0, 0, "Name"), label5(0, 1, "Qty"),
        label5(1, 0, "Acmé"), number(1, 1, 12.0), // 0xE9 byte: Latin-1 branch
        label5(2, 0, "Bolt"), rkInt(2, 1, -3)),
      "Second" -> sheet5(label5(0, 0, "WRONG SHEET"))))
    val r = rows(cfb(wb, streamName = "Book"))
    assert(r == Vector(
      Vector("Name", "Qty"),
      Vector("Acmé", "12"),
      Vector("Bolt", "-3")))
  }

  test("default converter chain: XlsxConverter routes BIFF bytes through the real decoder") {
    val dir = Files.createTempDirectory("graft-chain")
    val xls = dir.resolve("f.xls")
    Files.write(xls, importXls)
    // the importer's default converter must decode legacy .xls, not
    // pass the binary through
    val csv = new graft.ingest.XlsxConverter().toCsv(xls)
    val text = new String(Files.readAllBytes(csv), "UTF-8")
    assert(text.startsWith("\"EventID\",\"Company Name\",\"Flag\"\n"), text.take(80))
  }

  test("property: random typed grids round-trip through the CFB+BIFF writer and reader") {
    import org.scalacheck.Gen
    import scala.collection.mutable
    val gen = for {
      nRows <- Gen.chooseNum(1, 12)
      nCols <- Gen.chooseNum(1, 6)
      kinds <- Gen.listOfN(nRows * nCols,
        Gen.oneOf("gap", "num", "int", "bool", "str", "label"))
    } yield (nRows, nCols, kinds)
    Iterator.continually(gen.sample).flatten.take(25).foreach { case (nRows, nCols, kinds) =>
      val sst = ArrayBuffer.empty[String]
      val cellRecs = ArrayBuffer.empty[Array[Byte]]
      val expected = mutable.TreeMap.empty[Int, ArrayBuffer[String]]
      def place(r: Int, c: Int, v: String): Unit = {
        val row = expected.getOrElseUpdate(r, ArrayBuffer.empty[String])
        while (row.size <= c) row += ""
        row(c) = v
      }
      for (r <- 0 until nRows; c <- 0 until nCols) kinds(r * nCols + c) match {
        case "gap" => ()
        case "num" =>
          val v = (r * 31 + c) + 0.5
          cellRecs += number(r, c, v); place(r, c, v.toString)
        case "int" =>
          val v = r * 100 - c * 7
          cellRecs += rkInt(r, c, v); place(r, c, v.toString)
        case "bool" =>
          val v = (r + c) % 2 == 0
          cellRecs += boolErr(r, c, v); place(r, c, if (v) "True" else "False")
        case "str" =>
          val s = s"s$r-$c"
          sst += s; cellRecs += labelSst(r, c, sst.size - 1); place(r, c, s)
        case "label" =>
          val s = s"L$r→$c" // wide char: exercises the UTF-16 branch
          cellRecs += label(r, c, s); place(r, c, s)
      }
      if (cellRecs.nonEmpty) {
        val wb = workbook(sst.toSeq, Seq("Data" -> sheet(cellRecs.toSeq: _*)))
        val got = rows(cfb(wb))
        val exp = expected.values.map(_.toVector).toVector
        assert(got == exp, s"grid ${nRows}x$nCols kinds=$kinds")
      }
    }
  }

  test("BiffConverter writes QUOTE_NONNUMERIC CSV; non-CFB bytes fall through to passthrough") {
    val dir = Files.createTempDirectory("graft-biff-conv")
    val xls = dir.resolve("f.xls")
    Files.write(xls, importXls)
    val csv = new graft.ingest.BiffConverter().toCsv(xls)
    val text = new String(Files.readAllBytes(csv), "UTF-8")
    assert(text ==
      "\"EventID\",\"Company Name\",\"Flag\"\n" +
      "119179,\"Acme Corp\",\"True\"\n" +
      "119180,,\"False\"\n")
    assert(!text.contains("WRONG SHEET"))
    // CSV payload under an .xls name: the chain must pass it through
    val fake = dir.resolve("g.xls")
    Files.write(fake, "A,B\n1,2\n".getBytes("UTF-8"))
    val out = new graft.ingest.BiffConverter().toCsv(fake)
    assert(new String(Files.readAllBytes(out), "UTF-8") == "A,B\n1,2\n")
  }

  test("fuzz: corrupt CFB containers decode, fall through, or raise Exception — never hang, Error, or explode") {
    // Truncations, bit flips, and zeroed spans of valid fixtures. The
    // reader's contract under corruption: return a (bounded) grid, or
    // None → passthrough, or throw an Exception the converter seam
    // catches. StackOverflowError/OutOfMemoryError (unbounded recursion
    // or allocation from corrupt counts/chains) fails the suite
    // directly; a chain cycle would hang the suite past its timeout.
    val dir = Files.createTempDirectory("graft-biff-fuzz")
    val bases = Seq(
      cfb(workbook(
        Seq("EventID", "Company Name", "Flag", "Acme Corp"),
        Seq("Data" -> sheet(
          labelSst(0, 0, 0), labelSst(0, 1, 1), labelSst(0, 2, 2),
          number(1, 0, 119179.0), labelSst(1, 1, 3), boolErr(1, 2, v = true)),
          "Second" -> sheet(label(0, 0, "X"))))),
      // big-SST variant: corruption lands in CONTINUE-adjacent territory
      cfb(workbook(
        (0 until 40).map(i => s"s$i-" + "x" * 50),
        Seq("Data" -> sheet((0 until 40).map(i => labelSst(i, 0, i)): _*)))),
      cfb(workbook5(Seq("Data" -> sheet5(label5(0, 0, "biff5")))), streamName = "Book")
    )
    val rnd = new scala.util.Random(20260813L)
    var decoded = 0
    var fellThrough = 0
    for (iter <- 0 until 400) {
      val base = bases(iter % bases.length)
      val bytes = base.clone()
      val corrupted = rnd.nextInt(3) match {
        case 0 => // truncate anywhere, including mid-header
          bytes.take(rnd.nextInt(bytes.length))
        case 1 => // flip 1..8 random bits
          (0 until 1 + rnd.nextInt(8)).foreach { _ =>
            val i = rnd.nextInt(bytes.length)
            bytes(i) = (bytes(i) ^ (1 << rnd.nextInt(8))).toByte
          }
          bytes
        case 2 => // zero a random 16-byte span (kills sector ids/counts)
          val at = rnd.nextInt(math.max(1, bytes.length - 16))
          java.util.Arrays.fill(bytes, at, math.min(bytes.length, at + 16), 0.toByte)
          bytes
      }
      val p = dir.resolve(s"fuzz$iter.xls")
      Files.write(p, corrupted)
      val res =
        try graft.ingest.Biff.firstSheetRowsOfFile(p)
        catch { case _: Exception => None } // the converter seam's catch
      res match {
        case Some(grid) =>
          decoded += 1
          val cells = grid.iterator.map(_.length.toLong).sum
          assert(cells <= 100000L, s"iter $iter: corrupt container yielded $cells cells")
          assert(grid.iterator.flatten.map(_.length.toLong).sum <= 10000000L,
            s"iter $iter: corrupt container yielded oversized cell content")
        case None => fellThrough += 1
      }
      // determinism: the same corrupt bytes resolve the same way
      val res2 =
        try graft.ingest.Biff.firstSheetRowsOfFile(p)
        catch { case _: Exception => None }
      assert(res == res2, s"iter $iter: nondeterministic under corruption")
      Files.delete(p)
    }
    // the fuzzer must exercise BOTH outcomes to mean anything
    assert(decoded > 0, "no corrupted container decoded — corruption too destructive to test the reader")
    assert(fellThrough > 0, "every corrupted container decoded — corruption never reached the reader")
  }

  /** Scalacheck driver (the FunctionsSpec pattern — the scalatest
    * bridge artifact isn't on the offline classpath, so sample
    * directly).
    */
  private def forAllish[A](gen: org.scalacheck.Gen[A], n: Int)(check: A => Unit): Unit =
    Iterator.continually(gen.sample).flatten.take(n).foreach(check)

  test("property: adversarial DIFAT chains never hang, loop, or escape the converter seam") {
    import org.scalacheck.Gen
    // The parser walks header DIFAT slots then CHAINED DIFAT sectors —
    // the one CFB structure the generic fuzz rarely reaches (the
    // fixture builder leaves firstDifat = ENDOFCHAIN). Target it:
    // point firstDifat and the 109 header slots at adversarial sector
    // ids — self-cycles, mutual cycles, the FAT/directory sectors,
    // one-past-the-end, huge, negative — so the DIFAT walk, FAT build,
    // and every downstream chain read run over hostile sector maps.
    val base = cfb(workbook(
      Seq("A", "B"),
      Seq("Data" -> sheet(labelSst(0, 0, 0), labelSst(1, 0, 1), number(2, 0, 7.5)))))
    val nSectors = base.length / 512 - 1
    val adversarial = Gen.oneOf(
      Gen.chooseNum(0, math.max(0, nSectors - 1)),      // real sectors (incl. FAT/dir)
      Gen.const(nSectors),                              // one past the end
      Gen.oneOf(0xFFFFFFFE, 0xFFFFFFFF, 0xFFFFFFFD),    // chain terminators / markers
      Gen.chooseNum(Int.MinValue, Int.MaxValue))        // arbitrary, incl. wrap hazards
    val gen = for {
      firstDifat <- adversarial
      nSlots <- Gen.chooseNum(1, 30)
      slots <- Gen.listOfN(nSlots, Gen.zip(Gen.chooseNum(0, 108), adversarial))
      alsoFlip <- Gen.chooseNum(0, 4)
      seed <- Gen.chooseNum(0L, Long.MaxValue)
    } yield (firstDifat, slots, alsoFlip, seed)
    val dir = Files.createTempDirectory("graft-difat-fuzz")
    var parsed = 0
    var refused = 0
    forAllish(gen, 200) { case (firstDifat, slots, alsoFlip, seed) =>
      val bytes = base.clone()
      def i32(o: Int, v: Int): Unit = {
        bytes(o) = (v & 0xFF).toByte; bytes(o + 1) = ((v >> 8) & 0xFF).toByte
        bytes(o + 2) = ((v >> 16) & 0xFF).toByte; bytes(o + 3) = ((v >> 24) & 0xFF).toByte
      }
      i32(68, firstDifat)
      slots.foreach { case (slot, sid) => i32(76 + 4 * slot, sid) }
      val rnd = new scala.util.Random(seed)
      (0 until alsoFlip).foreach { _ =>
        val i = rnd.nextInt(bytes.length)
        bytes(i) = (bytes(i) ^ (1 << rnd.nextInt(8))).toByte
      }
      // Cfb.stream is called OUTSIDE firstSheetRowsOfFile's try — it
      // must contain its own hostility: None or a bounded stream, no
      // throw, no unbounded allocation
      val s = graft.ingest.Cfb.stream(bytes, Set("Workbook", "Book"))
      s.foreach(wb => assert(wb.length <= bytes.length,
        s"chain read produced ${wb.length} bytes from a ${bytes.length}-byte file"))
      if (s.isDefined) parsed += 1 else refused += 1
      val p = dir.resolve("f.xls")
      Files.write(p, bytes)
      val csv = new graft.ingest.BiffConverter().toCsv(p) // must not throw
      assert(Files.size(csv) <= bytes.length.toLong + (1 << 20),
        "converter output unbounded under DIFAT corruption")
      Files.deleteIfExists(csv); Files.delete(p)
    }
    assert(parsed > 0 && refused > 0,
      s"DIFAT fuzz must hit both outcomes (parsed=$parsed refused=$refused)")
  }

  test("property: truncated/corrupted directory entries quarantine with bounded output") {
    import org.scalacheck.Gen
    val base = cfb(workbook(
      Seq("A", "B"),
      Seq("Data" -> sheet(labelSst(0, 0, 0), labelSst(1, 0, 1)))))
    val dirOff = 1024 // fixture layout: header, FAT sector, then the directory sector
    val gen = for {
      entry <- Gen.chooseNum(0, 2)
      field <- Gen.oneOf("nameLen", "objType", "start", "size", "nameBytes", "truncate")
      v <- Gen.chooseNum(Int.MinValue, Int.MaxValue)
    } yield (entry, field, v)
    val dir = Files.createTempDirectory("graft-dir-fuzz")
    forAllish(gen, 200) { case (entry, field, v) =>
      val base128 = dirOff + entry * 128
      val bytes0 = base.clone()
      def w16(o: Int, x: Int): Unit = {
        bytes0(o) = (x & 0xFF).toByte; bytes0(o + 1) = ((x >> 8) & 0xFF).toByte
      }
      def w32(o: Int, x: Int): Unit = { w16(o, x & 0xFFFF); w16(o + 2, (x >>> 16) & 0xFFFF) }
      val bytes = field match {
        case "nameLen" => w16(base128 + 64, v & 0xFFFF); bytes0
        case "objType" => bytes0(base128 + 66) = (v & 0xFF).toByte; bytes0
        case "start" => w32(base128 + 116, v); bytes0
        case "size" => w32(base128 + 120, v); bytes0
        case "nameBytes" =>
          (0 until 8).foreach(i => bytes0(base128 + i) = ((v >> (i % 4) * 8) & 0xFF).toByte)
          bytes0
        case "truncate" =>
          // cut INSIDE the directory sector: entries end mid-record
          bytes0.take(dirOff + math.floorMod(v, 512))
      }
      val s = graft.ingest.Cfb.stream(bytes, Set("Workbook", "Book")) // must not throw
      s.foreach(wb => assert(wb.length <= bytes.length + 512,
        "directory corruption produced an oversized stream"))
      val p = dir.resolve("f.xls")
      Files.write(p, bytes)
      val res =
        try graft.ingest.Biff.firstSheetRowsOfFile(p)
        catch { case _: Exception => None } // the converter seam's catch
      res.foreach(grid => assert(grid.iterator.map(_.length.toLong).sum <= 100000L))
      Files.delete(p)
    }
  }

  test("property: malformed SST CONTINUE splits quarantine — counts, flags, and boundaries lie") {
    import org.scalacheck.Gen
    val strings = (0 until 12).map(i => s"string-$i-" + ("padding" * 8))
    val payload = sstPayload(strings)
    val gen = for {
      split <- Gen.chooseNum(9, payload.length - 1) // always inside character data
      mutation <- Gen.oneOf("cstUnique", "cch", "flags", "dropContinue",
        "dupContinue", "shortContinue", "splitOnly")
      v <- Gen.chooseNum(Int.MinValue, Int.MaxValue)
    } yield (split, mutation, v)
    val dir = Files.createTempDirectory("graft-sst-fuzz")
    var decoded = 0
    forAllish(gen, 200) { case (split, mutation, v) =>
      val part1 = payload.take(split)
      val part2 = payload.drop(split)
      def w16(a: Array[Byte], o: Int, x: Int): Unit = {
        a(o) = (x & 0xFF).toByte; a(o + 1) = ((x >> 8) & 0xFF).toByte
      }
      val sstRecs: Seq[Array[Byte]] = mutation match {
        case "cstUnique" => // inflate the unique-string count past the data
          val a = part1.clone(); w16(a, 4, v & 0xFFFF); w16(a, 6, 0)
          Seq(rec(0x00FC, a), rec(0x003C, part2))
        case "cch" => // first string claims up to 65535 chars
          val a = part1.clone(); if (a.length >= 10) w16(a, 8, v & 0xFFFF)
          Seq(rec(0x00FC, a), rec(0x003C, part2))
        case "flags" => // corrupt grbit: rich-text/ext bits demand runs that aren't there
          val a = part1.clone(); if (a.length >= 11) a(10) = (v & 0xFF).toByte
          Seq(rec(0x00FC, a), rec(0x003C, part2))
        case "dropContinue" => Seq(rec(0x00FC, part1))
        case "dupContinue" => Seq(rec(0x00FC, part1), rec(0x003C, part2), rec(0x003C, part2))
        case "shortContinue" =>
          Seq(rec(0x00FC, part1), rec(0x003C, part2.take(math.floorMod(v, part2.length + 1))))
        case "splitOnly" => Seq(rec(0x00FC, part1), rec(0x003C, part2))
      }
      val wb = workbook(sstRecs,
        Seq("Data" -> sheet((0 until strings.length).map(i => labelSst(i, 0, i)): _*)))
      val p = dir.resolve("f.xls")
      Files.write(p, cfb(wb))
      val res =
        try graft.ingest.Biff.firstSheetRowsOfFile(p)
        catch { case _: Exception => None } // the converter seam's catch
      res.foreach { grid =>
        decoded += 1
        assert(grid.iterator.flatten.map(_.length.toLong).sum <= 10000000L,
          "SST corruption inflated decoded content unboundedly")
      }
      Files.delete(p)
    }
    // the unmutated split must decode exactly — the property run must
    // include working splits, or the mutations tested nothing
    assert(decoded > 0, "every SST mutation fell through — splits never decoded")
  }
}
