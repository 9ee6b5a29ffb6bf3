package graft.tools

/** Throwaway micro-bench for the ISO parse kernels (Test/runMain). */
object IsoMicroBench {
  def main(args: Array[String]): Unit = {
    val inputs = Array("15/01/2024", "15.01.2024", "15 Jan 2024", "20240115",
      "01/2024", "15-Jan-2024 10:30", "2024/01/15 10:30:45", "not a date at all",
      "Jan 15, 2024", "garbage-value-xyz")
    var i = 0; var sink = 0
    while (i < 200000) { sink += graft.functions.Iso8601.toIso8601(inputs(i % inputs.length)).length; i += 1 }
    val n = 2000000
    val t0 = System.nanoTime()
    i = 0
    while (i < n) { sink += graft.functions.Iso8601.toIso8601(inputs(i % inputs.length)).length; i += 1 }
    val el = (System.nanoTime() - t0) / 1e9
    println(f"iso: $n calls in $el%.3fs = ${el / n * 1e9}%.0f ns/call (sink=$sink)")
    val durs = Array("3", "3.5", "3 days 12 hours", "2 hours 30 minutes", "soon")
    i = 0
    while (i < 200000) { sink += graft.functions.IsoDuration.normalize(durs(i % durs.length)).length; i += 1 }
    val t1 = System.nanoTime(); i = 0
    while (i < n) { sink += graft.functions.IsoDuration.normalize(durs(i % durs.length)).length; i += 1 }
    val e1 = (System.nanoTime() - t1) / 1e9
    println(f"dur: $n calls in $e1%.3fs = ${e1 / n * 1e9}%.0f ns/call (sink=$sink)")
  }
}
