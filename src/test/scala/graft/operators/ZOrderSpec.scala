package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Morton z-value correctness against a bit-twiddling reference model,
  * quantization edge cases, and the range-partitioned layout contract. */
class ZOrderSpec extends SparkSpec {

  import spark.implicits._

  /** Reference interleave: bit j of column i lands at position j·k+i. */
  private def zRef(bits: Int, xs: Seq[Long]): Long = {
    val k = xs.size
    var out = 0L
    for (i <- xs.indices; j <- 0 until bits)
      out |= (((xs(i) >> j) & 1L) << (j * k + i))
    out
  }

  test("zValue matches the reference interleave for 2 and 3 columns") {
    val rnd = new scala.util.Random(7)
    val rows2 = Seq.fill(200)((rnd.nextInt(1 << 16).toLong, rnd.nextInt(1 << 16).toLong))
    val got2 = rows2.toDF("x", "y")
      .select(ZOrder.zValue(16, col("x"), col("y")).as("z"))
      .collect().map(_.getLong(0)).toSeq
    assert(got2 == rows2.map { case (x, y) => zRef(16, Seq(x, y)) })

    val rows3 = Seq.fill(100)(
      (rnd.nextInt(1 << 10).toLong, rnd.nextInt(1 << 10).toLong, rnd.nextInt(1 << 10).toLong))
    val got3 = rows3.toDF("x", "y", "w")
      .select(ZOrder.zValue(10, col("x"), col("y"), col("w")).as("z"))
      .collect().map(_.getLong(0)).toSeq
    assert(got3 == rows3.map { case (x, y, w) => zRef(10, Seq(x, y, w)) })
  }

  test("zValue grows monotonically in each dimension holding the other fixed") {
    val df = (0L until 64L).map(x => (x, 7L)).toDF("x", "y")
      .select(col("x"), ZOrder.zValue(6, col("x"), col("y")).as("z"))
    val zs = df.orderBy("x").collect().map(_.getLong(1)).toSeq
    assert(zs == zs.sorted, "z must be monotonic in x for fixed y")
  }

  test("quantize clamps out-of-range values and maps null to bucket 0") {
    val df = Seq(Some(-5.0), Some(0.0), Some(50.0), Some(100.0), Some(250.0), None)
      .toDF("v")
      .select(ZOrder.quantize(col("v"), 0.0, 100.0, 8).as("q"))
    val qs = df.collect().map(_.getLong(0)).toSeq
    assert(qs == Seq(0L, 0L, 128L, 255L, 255L, 0L))
  }

  test("zValue rejects a bit budget past 62 and quantize bad bounds") {
    intercept[IllegalArgumentException](ZOrder.zValue(32, col("a"), col("b")))
    intercept[IllegalArgumentException](ZOrder.quantize(col("a"), 5.0, 5.0, 8))
  }

  test("clusterByZOrder keeps every row and yields disjoint z-ranges per partition") {
    val rnd = new scala.util.Random(11)
    val rows = Seq.fill(2000)((rnd.nextInt(1024).toLong, rnd.nextInt(1024).toLong))
    val df = rows.toDF("x", "y")
    val z = ZOrder.zValue(10, col("x"), col("y"))
    val clustered = ZOrder.clusterByZOrder(df, z, numPartitions = 8)
    assert(clustered.count() == 2000)
    assert(clustered.columns.toSeq == Seq("x", "y"), "layout key must not leak")
    // each output partition must hold one contiguous z-range (this is what
    // makes per-file min/max stats selective): ranges may not overlap
    val ranges = clustered
      .select(ZOrder.zValue(10, col("x"), col("y")).as("z"),
        spark_partition_id().as("pid"))
      .groupBy("pid").agg(min("z").as("lo"), max("z").as("hi"))
      .orderBy("lo").collect().map(r => (r.getLong(1), r.getLong(2)))
    ranges.sliding(2).foreach {
      case Array((_, hi1), (lo2, _)) =>
        assert(hi1 <= lo2, s"partition z-ranges overlap: $ranges")
      case _ =>
    }
  }

  test("hilbertValue: known cells, bijectivity, and step-1 adjacency") {
    import graft.expressions.LayoutEval
    // the canonical 2x2 walk
    assert(LayoutEval.xy2d(1, 0, 0) == 0L)
    assert(LayoutEval.xy2d(1, 0, 1) == 1L)
    assert(LayoutEval.xy2d(1, 1, 1) == 2L)
    assert(LayoutEval.xy2d(1, 1, 0) == 3L)
    // bits = 3: the 64-cell curve is a bijection AND every consecutive
    // pair of indices is a Manhattan-distance-1 grid step — the locality
    // property Morton lacks (its quadrant jumps are distance > 1)
    val cells = for (x <- 0L until 8L; y <- 0L until 8L)
      yield (LayoutEval.xy2d(3, x, y), x, y)
    assert(cells.map(_._1).sorted == (0L until 64L))
    val byD = cells.map(t => t._1 -> ((t._2, t._3))).toMap
    for (d <- 0L until 63L) {
      val (x1, y1) = byD(d); val (x2, y2) = byD(d + 1)
      assert(math.abs(x1 - x2) + math.abs(y1 - y2) == 1,
        s"non-adjacent step at d=$d")
    }
    // the Column kernel (codegen path) agrees with the direct walk
    val df = (for (x <- 0L until 8L; y <- 0L until 8L) yield (x, y))
      .toDF("x", "y")
    val viaCol = df.select(col("x"), col("y"),
        ZOrder.hilbertValue(3, col("x"), col("y")).as("h"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    for ((d, x, y) <- cells) assert(viaCol((x, y)) == d)
    intercept[IllegalArgumentException](
      ZOrder.hilbertValue(32, col("x"), col("y")))
  }

  test("hilbertRanges cover exactly the box cells at full depth") {
    import graft.expressions.LayoutEval
    // at maxDepth ≥ bits the descent reaches single cells, so the
    // merged ranges must equal the box's index set EXACTLY
    val bits = 4
    val (xLo, xHi, yLo, yHi) = (3L, 9L, 2L, 12L)
    val ranges = ZOrder.hilbertRanges(bits, xLo, xHi, yLo, yHi,
      maxDepth = bits + 1)
    val boxIdx = (for {
      x <- xLo to xHi; y <- yLo to yHi
    } yield LayoutEval.xy2d(bits, x, y)).toSet
    val rangeIdx = ranges.flatMap { case (lo, hi) => lo to hi }.toSet
    assert(rangeIdx == boxIdx)
    // merged: strictly increasing, non-adjacent
    ranges.sliding(2).foreach {
      case Seq((_, h1), (l2, _)) => assert(l2 > h1 + 1)
      case _ =>
    }
    // a depth-limited descent yields a SUPERSET with fewer ranges
    val coarse = ZOrder.hilbertRanges(bits, xLo, xHi, yLo, yHi, maxDepth = 2)
    val coarseIdx = coarse.flatMap { case (lo, hi) => lo to hi }.toSet
    assert(boxIdx.subsetOf(coarseIdx) && coarse.size <= ranges.size)
    // the whole grid collapses to one full-domain range
    val all = ZOrder.hilbertRanges(bits, 0, 15, 0, 15, maxDepth = 8)
    assert(all == Seq((0L, 255L)))
    intercept[IllegalArgumentException](
      ZOrder.hilbertRanges(bits, -1, 3, 0, 3))
    intercept[IllegalArgumentException](
      ZOrder.hilbertRanges(32, 0, 1, 0, 1))
  }

  test("hilbertRangePredicate filters the same rows as the box predicate") {
    import spark.implicits._
    val bits = 4
    val pts = (for (x <- 0L to 15L; y <- 0L to 15L) yield (x, y))
      .toDF("x", "y")
      .withColumn("h", ZOrder.hilbertValue(4, col("x"), col("y")))
    val ranges = ZOrder.hilbertRanges(bits, 5, 11, 1, 7, maxDepth = 3)
    // pre-filter ∧ exact box ≡ exact box (superset pruning is sound)
    val pruned = pts.where(
      ZOrder.hilbertRangePredicate(col("h"), ranges) &&
        col("x").between(5, 11) && col("y").between(1, 7)).count()
    val direct = pts.where(
      col("x").between(5, 11) && col("y").between(1, 7)).count()
    assert(pruned == direct && direct == 7L * 7L)
    intercept[IllegalArgumentException](
      ZOrder.hilbertRangePredicate(col("h"), Nil))
  }

  test("rangeBalance: uniform data splits evenly, ties pile into one bucket") {
    import spark.implicits._
    val uniform = (1 to 400).map(_.toDouble).toDF("v")
    val rows = ZOrder.rangeBalance(uniform, "v", partitions = 4)
      .orderBy("bucket").collect()
    assert(rows.map(_.getLong(0)).toSeq == Seq(0L, 1L, 2L, 3L))
    assert(rows.map(_.getLong(1)).sum == 400L)
    // even split: every ratio ≈ 1 (quantile cut points land on .25 ranks)
    assert(rows.forall(r => math.abs(r.getDouble(3) - 1.0) < 0.02))
    // 90% identical values: one bucket swallows the tie mass
    val ties = ((1 to 360).map(_ => 7.0) ++ (1 to 40).map(_.toDouble))
      .toDF("v")
    val t = ZOrder.rangeBalance(ties, "v", partitions = 4)
      .orderBy("bucket").collect()
    assert(t.map(_.getLong(1)).max >= 360L)
    assert(t.map(_.getLong(1)).sum == 400L)
    intercept[IllegalArgumentException](ZOrder.rangeBalance(uniform, "v", 1))
  }

  test("deltaStats: value-sorted deltas beat shuffled-order deltas") {
    import spark.implicits._
    // value = a permuted walk: sorted-by-value deltas are tiny and
    // uniform; id-order deltas jump all over
    val df = (1 to 400)
      .map(i => (i.toLong, ((i * 193) % 400).toDouble)).toDF("id", "v")
    val sorted = ZOrder.deltaStats(df, "id", "v", "v", shards = 2,
      tag = "sorted")
    val arrival = ZOrder.deltaStats(df, "id", "v", "id", shards = 2,
      tag = "arrival")
    val s = sorted.collect(); val a = arrival.collect()
    assert(s.forall(_.getString(0) == "sorted") && s.length == 2)
    val meanSorted = s.map(_.getDouble(3)).max
    val meanArrival = a.map(_.getDouble(3)).min
    assert(meanSorted < meanArrival,
      s"sorted $meanSorted should beat arrival $meanArrival")
    // per shard: n_rows = shard size − 1 (the first row has no lag)
    assert(s.map(_.getLong(2)).sum == 400L - 2L)
    intercept[IllegalArgumentException](
      ZOrder.deltaStats(df, "id", "v", "v", 0, "x"))
  }

  test("runLengthAudit: bucket-spanning runs stitch to the true count") {
    import spark.implicits._
    // keys 1..6 bucket as {1,2} {3,4,5} {6} at bucketSize 3; a,a,a,a,b,b
    // is TWO true runs though three buckets see (1, 2, 1)
    val df = Seq((1L, "a"), (2L, "a"), (3L, "a"), (4L, "a"), (5L, "b"),
      (6L, "b")).toDF("k", "c")
    val r = ZOrder.runLengthAudit(df, "k", Seq("c"), bucketSize = 3).head
    assert(r.getLong(1) == 6L && r.getLong(2) == 2L &&
      r.getDouble(3) == 3.0 && r.getLong(4) == 2L)
    // alternating values never merge: 6 runs, avg 1
    val alt = Seq((1L, "a"), (2L, "b"), (3L, "a"), (4L, "b"), (5L, "a"),
      (6L, "b")).toDF("k", "c")
    val a = ZOrder.runLengthAudit(alt, "k", Seq("c"), bucketSize = 3).head
    assert(a.getLong(2) == 6L && a.getDouble(3) == 1.0)
    // sparse keys: adjacent NON-EMPTY buckets stitch (gap between 2 and
    // 4000 spans empty buckets, same value → still one run)
    val sparse = Seq((1L, "a"), (2L, "a"), (4000L, "a")).toDF("k", "c")
    val sp = ZOrder.runLengthAudit(sparse, "k", Seq("c"), 3).head
    assert(sp.getLong(2) == 1L)
    // multiple columns come back as one frame, ordered by column name
    val two = ZOrder.runLengthAudit(df.withColumn("d", lit(7)), "k",
      Seq("d", "c"), 3).collect()
    assert(two.map(_.getString(0)).toSeq == Seq("c", "d"))
    assert(two(1).getLong(2) == 1L) // constant column: one run
    intercept[IllegalArgumentException](
      ZOrder.runLengthAudit(df, "k", Seq(), 3))
    intercept[IllegalArgumentException](
      ZOrder.runLengthAudit(df, "k", Seq("c"), 1))
  }
}
