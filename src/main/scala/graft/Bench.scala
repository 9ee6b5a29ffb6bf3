package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val runs = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "3").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val names = SparkEntry.queries.keys.toVector.sorted
    val failed = scala.collection.mutable.Set[String]()
    // Ambient-load sentinel: a fixed, data-independent CPU-bound job whose
    // cost is a property of the MACHINE, not the code under test. Timed
    // once before the warmup and once after the last timed round; the pair
    // rides in the summary JSON. Historical steady-state is ~constant, so
    // a sentinel far above its usual cost (or a large gap between the two)
    // marks the whole window as polluted by competing load — BENCH_r04/r06
    // both published phantom regressions that this self-identifies.
    def sentinel(): Double = {
      val t0 = System.nanoTime()
      spark.range(0L, 400000000L, 1, cpus.toInt)
        .selectExpr("sum(id % 1000007) as s")
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    // noop sink (not count()) so Catalyst can't prune the projected
    // expressions out from under the timer — every query runs its full work.
    def runOne(name: String): Double = {
      val t0 = System.nanoTime()
      val ok = try {
        SparkEntry.queries(name)(spark, sfDir).write.format("noop").mode("overwrite").save(); true
      } catch { case e: Throwable =>
        System.err.println(s"[bench] $name failed: ${e.getMessage}"); failed += name; false }
      val elapsed = (System.nanoTime() - t0) / 1e9
      // drop anything the query cached so the next one re-does its full work,
      // and collect the garbage it left so its GC debt isn't billed to the
      // next query's timer
      spark.catalog.clearCache()
      System.gc()
      if (ok) elapsed else -1.0
    }
    // Samples are taken in interleaved rounds (q1..qN, q1..qN, ...) rather
    // than back-to-back per query: a transient noise window (competing load,
    // page-cache eviction, JIT deopt storm) then corrupts at most ONE sample
    // of each query instead of all of them, and the median discards it.
    // BENCH_r04's 44% phantom regression came from exactly that failure mode.
    // Round 0 is an untimed warmup of every query — JIT, codegen cache,
    // parquet footers — so timed rounds measure steady state.
    sentinel() // untimed: JIT/codegen for the sentinel job itself
    val sentinelBefore = sentinel()
    names.foreach(runOne)
    // a transient warmup-only failure must not erase the query from the
    // totals — that would publish a phantom speedup; only timed-round
    // failures count (and then only the failed samples are discarded)
    failed.clear()
    val samples = Vector.fill(runs) {
      Thread.sleep(200) // settle after the GC burst before the next round
      names.map(n => n -> runOne(n)).toMap
    }
    val sentinelAfter = sentinel()
    val results = names.map { n =>
      val good = samples.map(_(n)).filter(_ >= 0)
      if (good.isEmpty) n -> (-1.0, -1.0)
      else n -> (good.sorted.apply(good.length / 2), good.min)
    }
    // 3-decimal (millisecond) values: full double precision tripled the
    // line length and BENCH_r05's tail capture clipped the median block
    // mid-JSON — precision below 1ms is noise anyway
    def r3(v: Double) = math.rint(v * 1000) / 1000
    def jmap(f: ((Double, Double)) => Double) =
      results.map { case (k, v) => "\"" + k + "\":" + r3(f(v)) }.mkString("{", ",", "}")
    // a query with ZERO good samples must poison the totals, not silently
    // deflate them — a persistently broken query would otherwise read as a
    // faster run (the same phantom class the warmup-failure rule guards)
    val broken = results.collect { case (n, (med, _)) if med < 0 => n }
    val total = if (broken.nonEmpty) -1.0 else r3(results.map(_._2._1).sum)
    val totalMin = if (broken.nonEmpty) -1.0 else r3(results.map(_._2._2).sum)
    val brokenJson = broken.map("\"" + _ + "\"").mkString("[", ",", "]")
    // median is the headline (robust to one bad round); min is the noise
    // floor — a large median/min gap flags ambient load, not a regression
    val sentinelJson = s"[${r3(sentinelBefore)},${r3(sentinelAfter)}]"
    val summary = s"""{"metric":"total","value":$total,"unit":"sec","queries":${jmap(_._1)},"queries_min":${jmap(_._2)},"total_min":$totalMin,"failed":${broken.length},"failed_queries":$brokenJson,"sentinel":$sentinelJson,"sf":"$sfDir"}"""
    // belt and braces vs output-tail truncation: the same line also lands
    // in a file the driver (or a human) can always read whole
    scala.util.Try(java.nio.file.Files.write(
      java.nio.file.Paths.get("bench_summary.json"),
      (summary + "\n").getBytes("UTF-8")))
    println(summary)
    spark.stop()
    // the driver keeps only the LAST 2000 bytes of output and parses the
    // JSON it finds there — the full summary above is ~3.2KB and got
    // clipped mid-line two rounds running (BENCH_r05/r06 `parsed: null`).
    // So the very last line is a compact contract-only summary: medians at
    // CENTISECOND precision (10ms — the query count crossed the point where
    // millisecond medians alone overflow the window; full 1ms values live
    // in the line above and bench_summary.json), no queries_min/
    // failed_queries. If growth ever pushes even that past the window, the
    // per-query map is dropped entirely rather than shipping JSON that
    // parses as a clipped prefix.
    def r2(v: Double) = math.rint(v * 100) / 100
    val qmap2 = results.map { case (k, v) => "\"" + k + "\":" + r2(v._1) }
      .mkString("{", ",", "}")
    val contract =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qmap2,"total_min":$totalMin,"failed":${broken.length},"sentinel":$sentinelJson,"sf":"$sfDir"}"""
    val slim =
      s"""{"metric":"total","value":$total,"unit":"sec","total_min":$totalMin,"failed":${broken.length},"sentinel":$sentinelJson,"queries_in":"bench_summary.json","sf":"$sfDir"}"""
    println(if (contract.length <= 1900) contract else slim)
  }
}
