package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main. Prints ONE JSON line (driver contract) and writes the
  * full-precision copy to bench_summary.json.
  *
  * At 226 queries/round a single JVM accumulates real memory pressure —
  * r9s4 adjudicated pipe2 at 61s in-bench vs 25s standalone on identical
  * code (block store + heap fragmentation, not a regression). So the
  * default mode FORKS two child JVMs, each benching an interleaved half
  * of the query list (modulo split, so the expensive families spread
  * across both), and merges their results: every query runs in a JVM
  * that is at most half-a-suite old. Children replicate this JVM's args
  * (classpath, add-opens, -Xmx) verbatim. GRAFT_BENCH_NO_FORK=1 or any
  * fork failure falls back to the r9 single-JVM path, same output
  * contract either way.
  *
  * The child COUNT scales with the suite: ceil(n/125) children (min 2),
  * so each JVM benches ≤125 queries — the load the r10 two-way split
  * was sized for at 244 queries. At 376 queries the fixed two-way split
  * re-inflated the hot floors (pipe2 68s vs its 25s standalone floor,
  * d16 37s vs 17 — the same block-store/heap-fragmentation class, now
  * at 188 queries/child), which is exactly what this knob exists to
  * prevent. */
object Bench {

  private case class QueryStat(name: String, med: Double, min: Double)
  private case class ShardResult(sentinelBefore: Double, sentinelAfter: Double,
      stats: Vector[QueryStat])

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sys.env.get("GRAFT_BENCH_SHARD") match {
      case Some(spec) =>
        // child mode: bench my modulo shard, dump TSV for the parent
        val res = runShard(spec, sfDir)
        val out = sys.env("GRAFT_BENCH_OUT")
        val lines =
          (s"sentinel\t${res.sentinelBefore}\t${res.sentinelAfter}" +:
            res.stats.map(s => s"q\t${s.name}\t${s.med}\t${s.min}"))
            .mkString("", "\n", "\n")
        java.nio.file.Files.write(java.nio.file.Paths.get(out),
          lines.getBytes("UTF-8"))
      case None =>
        val merged =
          if (sys.env.contains("GRAFT_BENCH_NO_FORK")) None
          else forkHalves(sfDir)
        val res = merged.getOrElse(runShard("1/1", sfDir))
        emit(res, sfDir)
    }
  }

  /** Spawn one child JVM per half, sequentially; None on any failure
    * (missing classpath, child crash, unparseable output) → the caller
    * falls back to the in-process path. No non-local returns: a `return`
    * inside a loop closure would throw NonLocalReturnControl straight
    * into the catch below; NonFatal keeps OOM/interrupt propagating. */
  private def forkHalves(sfDir: String): Option[ShardResult] = {
    try {
      val sep = java.io.File.pathSeparator
      val cp = System.getProperty("java.class.path")
      // a forked `run` JVM has the real classpath; under an in-process
      // launcher (classloader-based) it degenerates to the sbt jar —
      // detect that and bail to the fallback
      if (!cp.split(sep).exists(_.contains("spark-sql"))) None
      else {
        val nShards =
          math.max(2, math.ceil(SparkEntry.queries.size / 125.0).toInt)
        val javaBin = java.nio.file.Paths
          .get(System.getProperty("java.home"), "bin", "java").toString
        val jvmArgs = java.lang.management.ManagementFactory
          .getRuntimeMXBean.getInputArguments
        def runChild(i: Int): Option[ShardResult] = {
          val out = java.io.File.createTempFile(s"graft_bench_h$i", ".tsv")
          val log = new java.io.File(
            System.getProperty("java.io.tmpdir"), s"graft_bench_half$i.log")
          val cmd = new java.util.ArrayList[String]()
          cmd.add(javaBin)
          jvmArgs.forEach(a => cmd.add(a))
          cmd.add("-cp"); cmd.add(cp); cmd.add("graft.Bench")
          val pb = new ProcessBuilder(cmd)
          pb.environment().put("GRAFT_BENCH_SHARD", s"$i/$nShards")
          pb.environment().put("GRAFT_BENCH_OUT", out.getAbsolutePath)
          // children must never print to the parent's stdout: the driver
          // parses the LAST 2000 bytes of it for the contract JSON
          pb.redirectOutput(log)
          pb.redirectErrorStream(true)
          System.err.println(s"[bench] forking shard $i/$nShards (log: $log)")
          val code = pb.start().waitFor()
          if (code != 0) {
            System.err.println(s"[bench] shard $i exited $code, falling back")
            None
          } else {
            val res = parseShardTsv(out)
            out.delete()
            Some(res)
          }
        }
        // per-query order is restored by the emit sort; the sentinel pair
        // spans the whole window: first shard's opening, last's closing
        (1 to nShards).foldLeft(Option(Vector.empty[ShardResult])) {
          (acc, i) => acc.flatMap(v => runChild(i).map(v :+ _))
        }.map(v => ShardResult(v.head.sentinelBefore, v.last.sentinelAfter,
          v.flatMap(_.stats)))
      }
    } catch {
      case scala.util.control.NonFatal(e) =>
        System.err.println(s"[bench] fork mode failed ($e), falling back")
        None
    }
  }

  private def parseShardTsv(f: java.io.File): ShardResult = {
    val src = scala.io.Source.fromFile(f, "UTF-8")
    val lines =
      try src.getLines().toVector
      finally src.close()
    val sent = lines.filter(_.startsWith("sentinel\t")).head.split("\t")
    val stats = lines.filter(_.startsWith("q\t")).map { l =>
      val p = l.split("\t")
      QueryStat(p(1), p(2).toDouble, p(3).toDouble)
    }
    ShardResult(sent(1).toDouble, sent(2).toDouble, stats)
  }

  /** The r9 bench core, over the `i/n` modulo shard of the sorted query
    * list: untimed warmup round, interleaved timed rounds, clearCache +
    * gc between queries, ambient-load sentinel before and after. */
  private def runShard(spec: String, sfDir: String): ShardResult = {
    val Array(iStr, nStr) = spec.split("/")
    val (shard, nShards) = (iStr.toInt - 1, nStr.toInt)
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
      .zipWithIndex.collect { case (n, ix) if ix % nShards == shard => n }
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
    val stats = names.map { n =>
      val good = samples.map(_(n)).filter(_ >= 0)
      if (good.isEmpty) QueryStat(n, -1.0, -1.0)
      else QueryStat(n, good.sorted.apply(good.length / 2), good.min)
    }
    spark.stop()
    ShardResult(sentinelBefore, sentinelAfter, stats)
  }

  /** Render the driver-contract JSON lines + bench_summary.json. */
  private def emit(res: ShardResult, sfDir: String): Unit = {
    val results = res.stats.sortBy(_.name)
    // 3-decimal (millisecond) values: full double precision tripled the
    // line length and BENCH_r05's tail capture clipped the median block
    // mid-JSON — precision below 1ms is noise anyway
    def r3(v: Double) = math.rint(v * 1000) / 1000
    def jmap(f: QueryStat => Double) =
      results.map(s => "\"" + s.name + "\":" + r3(f(s))).mkString("{", ",", "}")
    // a query with ZERO good samples must poison the totals, not silently
    // deflate them — a persistently broken query would otherwise read as a
    // faster run (the same phantom class the warmup-failure rule guards)
    val broken = results.collect { case s if s.med < 0 => s.name }
    val total = if (broken.nonEmpty) -1.0 else r3(results.map(_.med).sum)
    val totalMin = if (broken.nonEmpty) -1.0 else r3(results.map(_.min).sum)
    val brokenJson = broken.map("\"" + _ + "\"").mkString("[", ",", "]")
    // median is the headline (robust to one bad round); min is the noise
    // floor — a large median/min gap flags ambient load, not a regression
    val sentinelJson =
      s"[${r3(res.sentinelBefore)},${r3(res.sentinelAfter)}]"
    val summary = s"""{"metric":"total","value":$total,"unit":"sec","queries":${jmap(_.med)},"queries_min":${jmap(_.min)},"total_min":$totalMin,"failed":${broken.length},"failed_queries":$brokenJson,"sentinel":$sentinelJson,"sf":"$sfDir"}"""
    // belt and braces vs output-tail truncation: the same line also lands
    // in a file the driver (or a human) can always read whole
    scala.util.Try(java.nio.file.Files.write(
      java.nio.file.Paths.get("bench_summary.json"),
      (summary + "\n").getBytes("UTF-8")))
    println(summary)
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
    val qmap2 = results.map(s => "\"" + s.name + "\":" + r2(s.med))
      .mkString("{", ",", "}")
    val contract =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qmap2,"total_min":$totalMin,"failed":${broken.length},"sentinel":$sentinelJson,"sf":"$sfDir"}"""
    val slim =
      s"""{"metric":"total","value":$total,"unit":"sec","total_min":$totalMin,"failed":${broken.length},"sentinel":$sentinelJson,"queries_in":"bench_summary.json","sf":"$sfDir"}"""
    println(if (contract.length <= 1900) contract else slim)
  }
}
