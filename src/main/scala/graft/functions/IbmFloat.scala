package graft.functions

/**
 * IEEE 754 double ↔ IBM System/360 hexadecimal floating point, the on-disk
 * numeric representation of SAS XPORT (TS-140 public spec; the reference
 * writes XPT through the `xportrs` crate — `crates/tss-submit/src/export/
 * xpt.rs:16-59`).
 *
 * IBM layout (8 bytes, big-endian): sign bit, 7-bit base-16 exponent biased
 * by 64, 56-bit fraction; value = ±0.F16 × 16^(E-64).
 */
object IbmFloat {

  /** Encode an IEEE double as 8 IBM bytes. NaN encodes as the SAS missing
    * value (0x2E '.', then zeros). Always returns a fresh array — callers
    * may patch bytes in place without corrupting shared state. */
  def toIbmBytes(d: Double): Array[Byte] = {
    val out = new Array[Byte](8)
    toIbmBytesInto(d, out, 0)
    out
  }

  /** Allocation-free variant of [[toIbmBytes]]: encode into `dest` at
    * `off` (8 bytes overwritten). The XPT row writer encodes millions of
    * values per member — one fresh array each was the hot allocation. */
  def toIbmBytesInto(d: Double, dest: Array[Byte], off: Int): Unit = {
    if (d.isNaN) { System.arraycopy(missingBytes, 0, dest, off, 8); return }
    java.util.Arrays.fill(dest, off, off + 8, 0.toByte)
    if (d == 0.0) return
    val sign = if (d < 0) 1L else 0L
    val abs = math.abs(d)
    val bits = java.lang.Double.doubleToLongBits(abs)
    var e = ((bits >> 52) & 0x7FF).toInt - 1023
    var mant = bits & 0xFFFFFFFFFFFFFL
    if (e == -1023) { // subnormal: normalize so the top set bit lands at 52
      // (every subnormal still underflows to IBM zero below — 16^-65 is far
      // above 2^-1022 — but keep the algebra exact in case this is reused)
      val lead = java.lang.Long.numberOfLeadingZeros(mant) - 11
      mant = (mant << lead) & 0xFFFFFFFFFFFFFL
      e = -1022 - lead
    }
    mant |= 1L << 52
    // value = mant * 2^(e-52); want frac56 * 16^(E-64) * 2^-56
    val s = Math.floorMod(e + 260, 4)
    val ibmExp = (e + 260 - s) / 4
    if (ibmExp < 0) return // underflow → 0 (dest already zeroed)
    if (ibmExp > 127) // overflow: never silently alter submission data
      throw new IllegalArgumentException(
        s"value $d exceeds IBM hex-float range (|x| <= ~7.23e75) and cannot " +
          "be written to XPT")
    val frac = mant << s // < 2^56
    dest(off) = ((sign << 7) | ibmExp).toByte
    var i = 0
    while (i < 7) {
      dest(off + 7 - i) = ((frac >> (8 * i)) & 0xFF).toByte
      i += 1
    }
  }

  /** SAS missing numeric: '.' then seven zero bytes. */
  val missingBytes: Array[Byte] = {
    val a = new Array[Byte](8)
    a(0) = 0x2E
    a
  }

  def isMissing(bytes: Array[Byte], off: Int = 0): Boolean = {
    if (bytes(off) != 0x2E && bytes(off) != ' '.toByte && bytes(off) != 0x5F &&
        !(bytes(off) >= 'A' && bytes(off) <= 'Z')) return false
    var i = 1
    while (i < 8) { if (bytes(off + i) != 0) return false; i += 1 }
    true
  }

  /** Decode 8 IBM bytes to an IEEE double; SAS missing → NaN. */
  def fromIbmBytes(bytes: Array[Byte], off: Int = 0): Double = {
    if (isMissing(bytes, off)) return Double.NaN
    var frac = 0L
    var i = 1
    while (i < 8) { frac = (frac << 8) | (bytes(off + i) & 0xFFL); i += 1 }
    if (frac == 0L) return 0.0
    val sign = (bytes(off) & 0x80) != 0
    val ibmExp = bytes(off) & 0x7F
    val v = frac.toDouble * math.pow(16.0, ibmExp - 64) / math.pow(2.0, 56)
    if (sign) -v else v
  }
}
