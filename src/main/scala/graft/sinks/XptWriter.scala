package graft.sinks

import java.io.{BufferedOutputStream, FileOutputStream, OutputStream}
import java.nio.charset.StandardCharsets
import java.time.LocalDateTime
import java.time.format.DateTimeFormatter
import java.util.Locale

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, FloatType, NumericType}

import graft.functions.{IbmFloat, Numerics}

/** One XPT variable: SAS name (≤8), label (≤40), numeric flag, byte length
  * (8 for Num; declared-or-observed for Char). */
case class XptColumn(name: String, label: String, isNumeric: Boolean, length: Int)

/**
 * K1 — SAS Transport (XPORT) Version 5 writer, from the public TS-140 spec.
 * The reference delegates to the `xportrs` crate (`crates/tss-submit/src/
 * export/xpt.rs:16-152`); this is a clean-room implementation of the same
 * container: 80-byte header records, 140-byte big-endian NAMESTRs, IBM
 * hex-float numerics, space-padded fixed-width rows.
 *
 * Scale note: submission datasets are driver-sized (the FDA caps XPT files
 * at 5 GB), so rows stream through `toLocalIterator` after the distributed
 * length aggregation — the one deliberate driver-side sink (SURVEY §7.4).
 */
object XptWriter {

  private val SasVersion = "9.4     "
  private val SasOs = "LIN     "

  private def pad(s: String, len: Int): String =
    if (s.length >= len) s.substring(0, len) else s + " " * (len - s.length)

  private def sasDate(dt: LocalDateTime): String =
    dt.format(DateTimeFormatter.ofPattern("ddMMMyy:HH:mm:ss", Locale.ENGLISH))
      .toUpperCase(Locale.ENGLISH)

  private def headerRecord(kind: String, middle: String = "0" * 30): Array[Byte] =
    pad(s"HEADER RECORD*******${pad(kind, 8)}HEADER RECORD!!!!!!!$middle", 80)
      .getBytes(StandardCharsets.US_ASCII)

  private def writeShort(out: Array[Byte], off: Int, v: Int): Unit = {
    out(off) = ((v >> 8) & 0xFF).toByte
    out(off + 1) = (v & 0xFF).toByte
  }

  private def writeInt(out: Array[Byte], off: Int, v: Int): Unit = {
    out(off) = ((v >> 24) & 0xFF).toByte
    out(off + 1) = ((v >> 16) & 0xFF).toByte
    out(off + 2) = ((v >> 8) & 0xFF).toByte
    out(off + 3) = (v & 0xFF).toByte
  }

  private def writeAscii(out: Array[Byte], off: Int, s: String, len: Int): Unit = {
    val b = pad(s, len).getBytes(StandardCharsets.US_ASCII)
    System.arraycopy(b, 0, out, off, len)
  }

  /** 140-byte NAMESTR record (TS-140 layout, big-endian). */
  private def namestr(c: XptColumn, varNum: Int, pos: Int): Array[Byte] = {
    val out = new Array[Byte](140)
    java.util.Arrays.fill(out, ' '.toByte)
    writeShort(out, 0, if (c.isNumeric) 1 else 2) // ntype
    writeShort(out, 2, 0)                         // nhfun
    writeShort(out, 4, c.length)                  // nlng
    writeShort(out, 6, varNum)                    // nvar0
    writeAscii(out, 8, c.name.toUpperCase, 8)     // nname
    writeAscii(out, 16, c.label, 40)              // nlabel
    writeAscii(out, 56, "", 8)                    // nform
    writeShort(out, 64, 0); writeShort(out, 66, 0); writeShort(out, 68, 0)
    writeAscii(out, 70, "", 2)                    // nfill
    writeAscii(out, 72, "", 8)                    // niform
    writeShort(out, 80, 0); writeShort(out, 82, 0)
    writeInt(out, 84, pos)                        // npos
    java.util.Arrays.fill(out, 88, 140, ' '.toByte)
    out
  }

  /** Library + member + NAMESTR + OBS header records — everything before
    * the row bytes. Shared by the iterator and distributed write paths so
    * the two emit identical containers. */
  private def writeHeaders(out: OutputStream, dsName: String, dsLabel: String,
      columns: Seq[XptColumn], created: LocalDateTime): Unit = {
    val date = sasDate(created)

    out.write(headerRecord("LIBRARY "))
    val lib1 = new Array[Byte](80)
    java.util.Arrays.fill(lib1, ' '.toByte)
    writeAscii(lib1, 0, "SAS", 8); writeAscii(lib1, 8, "SAS", 8)
    writeAscii(lib1, 16, "SASLIB", 8)
    writeAscii(lib1, 24, SasVersion, 8); writeAscii(lib1, 32, SasOs, 8)
    writeAscii(lib1, 64, date, 16)
    out.write(lib1)
    val lib2 = new Array[Byte](80)
    java.util.Arrays.fill(lib2, ' '.toByte)
    writeAscii(lib2, 0, date, 16)
    out.write(lib2)

    // TS-140 member header: 17 zeros, "16", 8 zeros, "140", 2 spaces —
    // exactly 32 chars (one stray zero here shifts the namestr-size field
    // and strict readers reject the file)
    out.write(headerRecord("MEMBER  ", "0" * 17 + "16" + "0" * 8 + "140  "))
    out.write(headerRecord("DSCRPTR "))
    val mem1 = new Array[Byte](80)
    java.util.Arrays.fill(mem1, ' '.toByte)
    writeAscii(mem1, 0, "SAS", 8)
    writeAscii(mem1, 8, dsName.toUpperCase, 8)
    writeAscii(mem1, 16, "SASDATA", 8)
    writeAscii(mem1, 24, SasVersion, 8); writeAscii(mem1, 32, SasOs, 8)
    writeAscii(mem1, 64, date, 16)
    out.write(mem1)
    val mem2 = new Array[Byte](80)
    java.util.Arrays.fill(mem2, ' '.toByte)
    writeAscii(mem2, 0, date, 16)
    writeAscii(mem2, 32, dsLabel, 40)
    out.write(mem2)

    out.write(headerRecord("NAMESTR ", "0" * 6 + f"${columns.size}%04d" + "0" * 20))
    var pos = 0
    columns.zipWithIndex.foreach { case (c, i) =>
      out.write(namestr(c, i + 1, pos))
      pos += c.length
    }
    val namestrBytes = columns.size * 140
    val namestrPad = (80 - namestrBytes % 80) % 80
    if (namestrPad > 0) out.write((" " * namestrPad).getBytes(StandardCharsets.US_ASCII))

    out.write(headerRecord("OBS     "))
  }

  /** Space-pad the data section to an 80-byte record boundary (TS-140). */
  private def writeTailPad(out: OutputStream, dataBytes: Long): Unit = {
    val tailPad = ((80 - dataBytes % 80) % 80).toInt
    if (tailPad > 0) out.write((" " * tailPad).getBytes(StandardCharsets.US_ASCII))
  }

  /**
   * Stream rows into an XPT member. `rows` yields one `Seq[Any]` per row
   * aligned with `columns`: numerics as Double (null/None/NaN → missing),
   * chars as String (null → blank).
   */
  def write(out: OutputStream, dsName: String, dsLabel: String,
      columns: Seq[XptColumn], rows: Iterator[Seq[Any]],
      created: LocalDateTime = LocalDateTime.of(2020, 1, 1, 0, 0, 0)): Unit = {
    writeHeaders(out, dsName, dsLabel, columns, created)
    val rowLen = columns.map(_.length).sum
    // hot loop over rows×columns: index arrays, one reused row buffer, and
    // in-place IBM encode — the per-value allocations (zip pairs, fresh
    // 8-byte arrays) dominated large members before
    val nCols = columns.size
    val colArr = columns.toArray
    val buf = new Array[Byte](rowLen)
    var written = 0L
    var rowIdx = 0L
    rows.foreach { row =>
      var off = 0
      var i = 0
      while (i < nCols) {
        val c = colArr(i)
        val v = row(i)
        if (c.isNumeric) {
          val d = v match {
            case null => Double.NaN
            case None => Double.NaN
            case Some(x: Double) => x
            case x: Double => x
            case x: Number => x.doubleValue()
            case s: String => Numerics.parse(s).getOrElse(Double.NaN)
          }
          // annotate range failures with the offending variable and row so
          // the user can locate the datum (the kernel only knows the value)
          try IbmFloat.toIbmBytesInto(d, buf, off)
          catch {
            case e: IllegalArgumentException =>
              throw new IllegalArgumentException(
                s"XPT write failed at variable ${c.name}, data row $rowIdx: ${e.getMessage}", e)
          }
        } else {
          val s = v match {
            case null => ""
            case None => ""
            case Some(x) => x.toString
            case x => x.toString
          }
          val b = s.getBytes(StandardCharsets.US_ASCII)
          java.util.Arrays.fill(buf, off, off + c.length, ' '.toByte)
          System.arraycopy(b, 0, buf, off, math.min(b.length, c.length))
        }
        off += c.length
        i += 1
      }
      out.write(buf)
      written += rowLen
      rowIdx += 1
    }
    writeTailPad(out, written)
    out.flush()
  }

  /** Encode one Spark Row (schema aligned with `colArr`) into `buf` —
    * identical bytes to the iterator path's loop above. Runs in EXECUTORS
    * for the distributed write; range failures carry the variable name and
    * offending value (the global row number isn't known partition-side). */
  private def encodeRowInto(r: Row, colArr: Array[XptColumn], buf: Array[Byte]): Unit = {
    var off = 0
    var i = 0
    while (i < colArr.length) {
      val c = colArr(i)
      if (c.isNumeric) {
        val d =
          if (r.isNullAt(i)) Double.NaN
          else r.get(i) match {
            case x: Double => x
            case x: Number => x.doubleValue()
            case s: String => Numerics.parse(s).getOrElse(Double.NaN)
            case _ => Double.NaN
          }
        try IbmFloat.toIbmBytesInto(d, buf, off)
        catch {
          case e: IllegalArgumentException =>
            throw new IllegalArgumentException(
              s"XPT write failed at variable ${c.name}, value $d: ${e.getMessage}", e)
        }
      } else {
        val s = if (r.isNullAt(i)) "" else String.valueOf(r.get(i))
        val b = s.getBytes(StandardCharsets.US_ASCII)
        java.util.Arrays.fill(buf, off, off + c.length, ' '.toByte)
        System.arraycopy(b, 0, buf, off, math.min(b.length, c.length))
      }
      off += c.length
      i += 1
    }
  }

  /** Open partition `idx`'s part file for writing via an attempt-unique
    * temp name; `commit()` atomically renames it into place. Speculative
    * or zombie duplicate attempts of the same partition then race only on
    * the rename — last COMPLETE file wins, a half-written attempt is never
    * visible under the final name (the FileOutputCommitter pattern). */
  private[sinks] final class PartFile(partsDir: String, idx: Int) {
    private val attempt =
      Option(org.apache.spark.TaskContext.get()).map(_.taskAttemptId()).getOrElse(0L)
    private val finalPath = java.nio.file.Paths.get(partsDir, f"part-$idx%05d")
    private val tmpPath = java.nio.file.Paths.get(partsDir, f"part-$idx%05d.a$attempt")
    val stream = new BufferedOutputStream(
      new FileOutputStream(tmpPath.toFile), 1 << 20)
    def commit(): Unit = {
      stream.close()
      java.nio.file.Files.move(tmpPath, finalPath,
        java.nio.file.StandardCopyOption.ATOMIC_MOVE,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    }
    def abort(): Unit = {
      scala.util.Try(stream.close())
      scala.util.Try(java.nio.file.Files.deleteIfExists(tmpPath))
    }
  }

  /** Concatenate `src` onto `dst` with zero-copy kernel transfers. */
  private[sinks] def transferFile(src: java.nio.file.Path,
      dst: java.nio.channels.FileChannel): Unit = {
    val in = java.nio.channels.FileChannel.open(src)
    try {
      val size = in.size()
      var pos = 0L
      while (pos < size) pos += in.transferTo(pos, size - pos, dst)
    } finally in.close()
  }

  private[sinks] def deleteRecursively(dir: java.nio.file.Path): Unit =
    if (java.nio.file.Files.exists(dir)) {
      java.nio.file.Files.walk(dir).sorted(java.util.Comparator.reverseOrder())
        .forEach(p => java.nio.file.Files.deleteIfExists(p))
    }

  /**
   * Column metadata for a DataFrame: numeric Spark types → Num(8); strings →
   * Char with declared length or max observed trimmed byte length, min 1
   * (`export/common.rs:83-119`). One fused aggregation computes every
   * observed length — the only cluster job in the sink.
   */
  def columnsFor(df: DataFrame, labels: Map[String, String] = Map.empty,
      declaredLengths: Map[String, Int] = Map.empty): Seq[XptColumn] = {
    val charCols = df.schema.fields.filter {
      f => !f.dataType.isInstanceOf[NumericType] && !declaredLengths.contains(f.name)
    }.map(_.name)
    val observed: Map[String, Int] =
      if (charCols.isEmpty) Map.empty
      else {
        val row = df.agg(
          max(length(rtrim(coalesce(col(charCols.head).cast("string"), lit(""))))).as(charCols.head),
          charCols.tail.toIndexedSeq.map(c =>
            max(length(rtrim(coalesce(col(c).cast("string"), lit(""))))).as(c)): _*).head()
        charCols.map(c => c -> Option(row.getAs[Integer](c)).map(_.toInt).getOrElse(0)).toMap
      }
    df.schema.fields.map { f =>
      val numeric = f.dataType.isInstanceOf[NumericType]
      val len =
        if (numeric) 8
        else declaredLengths.getOrElse(f.name, math.max(observed.getOrElse(f.name, 1), 1))
      XptColumn(f.name, labels.getOrElse(f.name, f.name), numeric, len)
    }.toSeq
  }

  /** Write a DataFrame as one XPT member file. Numeric parity: integral
    * doubles and longs share the same IBM encoding; `--SEQ` longs become
    * doubles exactly as the reference casts at write (`xpt.rs:100-120`).
    *
    * Row encoding runs in the EXECUTORS: each partition encodes and writes
    * its rows to a part file beside the destination in ONE parallel job
    * (`toLocalIterator` alone runs one single-partition job at a time,
    * which would serialize the encode on one core; a persisted chunk RDD
    * would hold the whole encoded dataset in the block store), then the
    * driver assembles headers + parts + tail pad with zero-copy
    * `FileChannel.transferTo` — pure kernel IO, no re-heap of the bytes.
    * The destination's parent must be storage both executors and driver
    * can reach (true in local mode and for the shared mounts a
    * single-file regulatory artifact lands on in cluster mode). */
  def writeDataFrame(df: DataFrame, path: String, dsName: String, dsLabel: String,
      labels: Map[String, String] = Map.empty,
      declaredLengths: Map[String, Int] = Map.empty): Seq[XptColumn] = {
    val cols = columnsFor(df, labels, declaredLengths)
    val colArr = cols.toArray
    val rowLen = colArr.map(_.length).sum
    val partsDir = java.nio.file.Paths.get(path + ".parts")
    deleteRecursively(partsDir)
    java.nio.file.Files.createDirectories(partsDir)
    try {
      val partsDirStr = partsDir.toString
      val manifest = df.rdd.mapPartitionsWithIndex { (idx, rows) =>
        val part = new PartFile(partsDirStr, idx)
        val buf = new Array[Byte](rowLen)
        var n = 0L
        try {
          while (rows.hasNext) {
            encodeRowInto(rows.next(), colArr, buf)
            part.stream.write(buf)
            n += 1
          }
          part.commit()
        } catch { case e: Throwable => part.abort(); throw e }
        Iterator.single((idx, n))
      }.collect().sortBy(_._1)
      val fos = new FileOutputStream(path)
      try {
        val bos = new BufferedOutputStream(fos, 1 << 16)
        writeHeaders(bos, dsName, dsLabel, cols, LocalDateTime.of(2020, 1, 1, 0, 0, 0))
        bos.flush() // channel writes below share the stream's file position
        val ch = fos.getChannel
        manifest.foreach { case (idx, n) =>
          if (n > 0) transferFile(partsDir.resolve(f"part-$idx%05d"), ch)
        }
        writeTailPad(bos, manifest.map(_._2).sum * rowLen)
        bos.flush()
      } finally fos.close()
    } finally deleteRecursively(partsDir)
    cols
  }
}
