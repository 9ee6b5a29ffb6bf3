package graft.sinks

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types.{DoubleType, StringType, StructField, StructType}

import graft.functions.IbmFloat

/** Parsed XPT member: dataset name, label, columns, row values. */
case class XptMember(name: String, label: String, columns: Seq[XptColumn],
    rows: Seq[Seq[Any]])

/**
 * SAS Transport V5 reader (TS-140) — the inverse of [[XptWriter]], used for
 * round-trip verification and as an ingest source for submission archives.
 */
object XptReader {

  private def ascii(b: Array[Byte], off: Int, len: Int): String =
    new String(b, off, len, StandardCharsets.US_ASCII)

  /** Parsed member layout shared by [[read]] and [[countRows]]. */
  private case class Layout(dsName: String, dsLabel: String,
      columns: Seq[XptColumn], dataStart: Int, rowLen: Int, totalRows: Int)

  private def layout(bytes: Array[Byte], path: String): Layout = {
    require(ascii(bytes, 0, 20) == "HEADER RECORD*******", s"not an XPT file: $path")

    // locate NAMESTR header
    def findHeader(kind: String, from: Int): Int = {
      var off = from
      while (off + 80 <= bytes.length) {
        if (ascii(bytes, off, 20) == "HEADER RECORD*******" &&
            ascii(bytes, off + 20, 8).trim == kind) return off
        off += 80
      }
      -1
    }

    val memberOff = findHeader("MEMBER", 0)
    require(memberOff >= 0, "no MEMBER header")
    // member header(80) + DSCRPTR header(80) → descriptor record 1 at +160
    // (dsname at byte 8), descriptor record 2 at +240 (label at byte 32)
    val dsName = ascii(bytes, memberOff + 160 + 8, 8).trim
    val dsLabel = ascii(bytes, memberOff + 240 + 32, 40).trim

    val nsOff = findHeader("NAMESTR", memberOff)
    require(nsOff >= 0, "no NAMESTR header")
    val nVars = ascii(bytes, nsOff + 54, 4).trim.toInt

    def short(off: Int): Int = ((bytes(off) & 0xFF) << 8) | (bytes(off + 1) & 0xFF)

    val columns = (0 until nVars).map { i =>
      val off = nsOff + 80 + i * 140
      XptColumn(
        name = ascii(bytes, off + 8, 8).trim,
        label = ascii(bytes, off + 16, 40).trim,
        isNumeric = short(off) == 1,
        length = short(off + 4))
    }

    val obsOff = findHeader("OBS", nsOff)
    require(obsOff >= 0, "no OBS header")
    val dataStart = obsOff + 80
    val rowLen = columns.map(_.length).sum
    Layout(dsName, dsLabel, columns, dataStart, rowLen,
      (bytes.length - dataStart) / rowLen)
  }

  /** Trailing pad region: a row that is entirely blanks inside the final
    * 80-byte record is treated as padding. This is THE inherent V5
    * ambiguity — a final record whose char columns are all genuinely
    * blank is indistinguishable from pad bytes; SAS and other readers
    * apply the same heuristic. (Num columns make rows unambiguous: a
    * missing value is 0x2E, not blank.) */
  private def isPadRow(bytes: Array[Byte], base: Int, rowLen: Int): Boolean =
    base + rowLen > bytes.length - 80 &&
      (base until base + rowLen).forall(bytes(_) == ' '.toByte)

  /** Row count only — the same pad heuristic as [[read]], but no value
    * decode and no row materialization: cardinality checks over large
    * members cost one header parse plus a blank scan of the final record. */
  def countRows(path: String): Long = {
    val bytes = Files.readAllBytes(Paths.get(path))
    val l = layout(bytes, path)
    var n = 0L
    var r = 0
    while (r < l.totalRows) {
      if (!isPadRow(bytes, l.dataStart + r * l.rowLen, l.rowLen)) n += 1
      r += 1
    }
    n
  }

  def read(path: String): XptMember = {
    val bytes = Files.readAllBytes(Paths.get(path))
    val l = layout(bytes, path)
    val Layout(dsName, dsLabel, columns, dataStart, rowLen, totalRows) = l

    val rows = (0 until totalRows).flatMap { r =>
      val base = dataStart + r * rowLen
      if (isPadRow(bytes, base, rowLen)) None
      else {
        var off = base
        Some(columns.map { c =>
          val v: Any =
            if (c.isNumeric) {
              val d = IbmFloat.fromIbmBytes(bytes, off)
              if (d.isNaN) null else d
            } else ascii(bytes, off, c.length).replaceAll("\\s+$", "")
          off += c.length
          v
        })
      }
    }
    XptMember(dsName, dsLabel, columns, rows)
  }

  /** Read an XPT member into a DataFrame (Num → double, Char → string). */
  def toDataFrame(spark: SparkSession, path: String): DataFrame = {
    val m = read(path)
    val schema = StructType(m.columns.map(c =>
      StructField(c.name, if (c.isNumeric) DoubleType else StringType, nullable = true)))
    val rows = m.rows.map(vs => Row.fromSeq(vs))
    spark.createDataFrame(spark.sparkContext.parallelize(rows.toList), schema)
  }
}
