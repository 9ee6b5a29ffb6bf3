package graft.operators

import org.apache.spark.sql.functions.{col, lit}

import graft.SparkSpec

/** Column profiling + snapshot drift semantics. */
class ProfilingSpec extends SparkSpec {

  import spark.implicits._

  test("profileStats: one row per column, numeric stats only for numerics") {
    val df = Seq(
      (Some(1.0), Some("x")), (Some(2.0), Some("x")), (Some(3.0), None),
      (None, Some("y"))
    ).toDF("v", "s")
    val got = Profiling.profileStats(df, Seq("v", "s")).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3),
          Option(r.get(4)), Option(r.get(5)), Option(r.get(6))))).toMap
    assert(got("v") == ((4L, 1L, 3L, Some(1.0), Some(3.0), Some(2.0))))
    assert(got("s") == ((4L, 1L, 2L, None, None, None)))
    intercept[IllegalArgumentException](Profiling.profileStats(df, Nil))
    intercept[IllegalArgumentException](Profiling.profileStats(df, Seq("zz")))
  }

  test("driftReport: null-rate delta, cardinality ratio, mean shift") {
    val a = Seq(Some(1.0), Some(2.0), Some(3.0), None).toDF("v")
    val b = Seq(Some(5.0), Some(5.0)).toDF("v")
    val r = Profiling.driftReport(a, b, Seq("v")).collect().head
    // columns: column, 6 a-stats, 6 b-stats, d_null_rate, r_distinct, d_mean
    assert(r.getString(0) == "v")
    assert(r.getDouble(13) == 0.25)        // |1/4 - 0/2|
    assert(r.getDouble(14) == 0.333333)    // 1 distinct / 3 distinct
    assert(r.getDouble(15) == 3.0)         // |2 - 5|
  }

  test("keySkew: shares, Gini and entropy from the frequency frame") {
    val df = Seq("a", "a", "a", "b", "b", "c").toDF("k")
    val r = Profiling.keySkew(df, Seq("k"), topK = 1).collect().head
    // columns: column, n_rows, n_keys, max_share, top_share, gini, entropy
    assert(r.getString(0) == "k" && r.getLong(1) == 6L && r.getLong(2) == 3L)
    assert(r.getDouble(3) == 0.5)          // a = 3/6
    assert(r.getDouble(4) == 0.5)          // top-1 share = heaviest key
    // freqs asc (1,2,3): G = 2·(1+4+9)/(3·6) − 4/3 = 0.222222
    assert(r.getDouble(5) == 0.222222)
    // −Σ p·ln p with 9-rounded terms: .346573590+.366204096+.298626578
    assert(r.getDouble(6) == 1.011404)
    // uniform distribution: gini → (n−1)/(3n)-free zero-skew baseline
    val uni = Seq("a", "b", "c").toDF("k")
    val u = Profiling.keySkew(uni, Seq("k")).collect().head
    assert(u.getDouble(5) == 0.0 && u.getDouble(3) == 0.333333)
    // null keys coalesce to '' and count as a key
    val n = Profiling.keySkew(Seq(Some("x"), None).toDF("k"), Seq("k"))
      .collect().head
    assert(n.getLong(2) == 2L)
    intercept[IllegalArgumentException](Profiling.keySkew(df, Nil))
    intercept[IllegalArgumentException](Profiling.keySkew(df, Seq("zz")))
    intercept[IllegalArgumentException](Profiling.keySkew(df, Seq("k"), 0))
  }

  test("expectRows: fused counts, null predicates violate, pass flags") {
    val df = Seq(
      (Some(1L), Some(10.0)), (Some(2L), Some(-3.0)),
      (Some(3L), None), (Option.empty[Long], Some(5.0)))
      .toDF("id", "x")
    val got = Profiling.expectRows(df, Seq(
        "id_not_null" -> col("id").isNotNull,
        "x_positive" -> (col("x") > 0),     // null x → null pred → violation
        "always" -> lit(true)))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getBoolean(3)))).toMap
    assert(got == Map(
      "id_not_null" -> ((4L, 1L, false)),
      "x_positive" -> ((4L, 2L, false)),   // the −3 and the null
      "always" -> ((4L, 0L, true))))
    intercept[IllegalArgumentException](Profiling.expectRows(df, Nil))
    intercept[IllegalArgumentException](Profiling.expectRows(df,
      Seq("a" -> lit(true), "a" -> lit(false))))
  }

  test("cdcDiff: added/removed/changed with null-safe column lists") {
    val prev = Seq(
      (1L, Some("v1"), "s1"), (2L, Some("same"), "s2"),
      (3L, Some("old"), "s3"), (4L, Some("old"), "oldS"),
      (6L, Option.empty[String], "s6"))
      .toDF("id", "c1", "c2")
    val next = Seq(
      (2L, Some("same"), "s2"), (3L, Some("new"), "s3"),
      (4L, Some("new"), "newS"), (5L, Some("v5"), "s5"),
      (6L, Some("filled"), "s6"))
      .toDF("id", "c1", "c2")
    val got = Profiling.cdcDiff(prev, next, "id", Seq("c1", "c2"))
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getString(2))))
      .toMap
    assert(got == Map(
      1L -> (("removed", "")),
      3L -> (("changed", "c1")),
      4L -> (("changed", "c1,c2")),
      5L -> (("added", "")),
      6L -> (("changed", "c1"))))          // null → value IS a change
    intercept[IllegalArgumentException](Profiling.cdcDiff(prev, next, "id", Nil))
  }

  test("fkAudit counts orphans per relation; null FKs are not orphans") {
    import spark.implicits._
    val parent = Seq(1L, 2L, 3L).toDF("pk")
    val child = Seq(Some(1L), Some(2L), Some(9L), Some(9L),
      Option.empty[Long]).toDF("fk")
    val got = Profiling.fkAudit(Seq(
        ("ok", parent.toDF("fk"), "fk", parent, "pk"),
        ("broken", child, "fk", parent, "pk")))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    assert(got("ok") == ((3L, 3L, 0L, 0.0)))
    // 5 child rows, 4 non-null, 2 orphans (both 9s), rate 0.5
    assert(got("broken") == ((5L, 4L, 2L, 0.5)))
    intercept[IllegalArgumentException](Profiling.fkAudit(Nil))
  }

  test("columnTests: null/dup counts per column in one pass") {
    import spark.implicits._
    val df = Seq((Some(1L), "a"), (Some(2L), "a"), (Option.empty[Long], "b"))
      .toDF("id", "grp")
    val got = Profiling.columnTests(df, Seq("id", "grp"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getBoolean(5)))).toMap
    // id: 3 rows, 1 null, 2 distinct, 0 dups — NOT unique (null present)
    assert(got("id") == ((3L, 1L, 2L, 0L, false)))
    // grp: 0 nulls, 2 distinct, 1 dup
    assert(got("grp") == ((3L, 0L, 2L, 1L, false)))
    val key = Profiling.columnTests(df.where($"id".isNotNull), Seq("id"))
      .head
    assert(key.getBoolean(5)) // non-null + distinct ⇒ key candidate
    intercept[IllegalArgumentException](Profiling.columnTests(df, Nil))
  }

  test("freshness: staleness vs the global high-water mark, in seconds") {
    import spark.implicits._
    import org.apache.spark.sql.functions.to_timestamp
    val ev = Seq(
      ("a", "2024-01-01 00:00:00"), ("a", "2024-01-01 12:00:00"),
      ("b", "2024-01-01 11:59:30"),
      ("c", "2023-12-30 12:00:00"))
      .toDF("src", "t")
      .select($"src", to_timestamp($"t").as("t"))
    val got = Profiling.freshness(ev, "src", "t")
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(3))))
      .toMap
    assert(got("a") == ((2L, 0L)))       // a owns the high-water mark
    assert(got("b") == ((1L, 30L)))      // 30 s stale
    assert(got("c") == ((1L, 2L * 86400L))) // two days stale
  }

  test("acceptedValues: offenders counted and sampled; nulls separate") {
    import spark.implicits._
    val df = Seq(Some("O"), Some("F"), Some("P"), Some("X"), Some("P"),
      Option.empty[String]).toDF("st")
    val r = Profiling.acceptedValues(df, "st", Seq("O", "F")).head
    assert(r.getLong(0) == 6L && r.getLong(1) == 1L && r.getLong(2) == 3L)
    // rate over non-null rows: 3/5
    assert(r.getDouble(3) == 0.6)
    assert(r.getString(4) == "P,X")
    // a fully clean column reports an empty sample
    val clean = Seq("O", "F").toDF("st")
    val c = Profiling.acceptedValues(clean, "st", Seq("O", "F")).head
    assert(c.getLong(2) == 0L && c.getString(4) == "")
    intercept[IllegalArgumentException](
      Profiling.acceptedValues(df, "st", Nil))
  }

  test("candidateKeys: key-ness, dup rates, nulls in one pass") {
    val df = Seq(
      (Some(1L), "a"), (Some(2L), "a"), (Some(3L), "b"), (None, "b"))
      .toDF("id", "grp")
    val got = Profiling.candidateKeys(df, Seq("id", "grp"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4),
          r.getBoolean(5)))).toMap
    // id: 3 non-null all distinct — but a null row blocks key-ness
    assert(got("id") == ((4L, 3L, 3L, 0.0, false)))
    // grp: full but only 2 distinct over 4 → dup_rate 0.5
    assert(got("grp") == ((4L, 4L, 2L, 0.5, false)))
    val clean = Seq(1L, 2L, 3L).toDF("id")
    assert(Profiling.candidateKeys(clean, Seq("id")).head.getBoolean(5))
    intercept[IllegalArgumentException](Profiling.candidateKeys(df, Nil))
    intercept[IllegalArgumentException](
      Profiling.candidateKeys(df, Seq("nope")))
  }

  test("volumeAnomaly: a volume spike z-scores against the trailing week") {
    import java.sql.Timestamp
    // days 1..14 alternate 99/101 rows, day 15 explodes to 1000
    val rows = (1 to 15).flatMap { d =>
      val n = if (d == 15) 1000 else if (d % 2 == 1) 99 else 101
      Seq.fill(n)(Tuple1(Timestamp.valueOf(f"2024-01-$d%02d 12:00:00")))
    }
    val got = Profiling.volumeAnomaly(rows.toDF("ts"), "ts")
      .orderBy("day").collect()
    assert(got.length == 15)
    val day1 = got(0); val day3 = got(2); val day15 = got(14)
    assert(day1.getLong(2) == 0L && day1.isNullAt(3))  // no baseline yet
    assert(day3.getLong(2) == 2L && !day3.isNullAt(3) && day3.isNullAt(5))
    assert(day15.getLong(2) == 7L && day15.getDouble(5) > 100.0)
    assert(day15.getBoolean(6))
    // normal days inside a full window are not anomalous
    assert(!got(13).getBoolean(6))
    // a FULLY-MISSING day must appear on the calendar spine with
    // n_rows = 0 and flag as the (negative) anomaly it is
    val gapped = rows.filterNot(
      _._1.toString.startsWith("2024-01-12"))
    val g = Profiling.volumeAnomaly(gapped.toDF("ts"), "ts")
      .orderBy("day").collect()
    assert(g.length == 15)
    val day12 = g(11)
    assert(day12.getLong(1) == 0L)          // spine row for the gap
    assert(day12.getDouble(5) < -3.0 && day12.getBoolean(6))
    intercept[IllegalArgumentException](
      Profiling.volumeAnomaly(rows.toDF("ts"), "ts", trailing = 1))
  }

  test("populationStability: identical shares are stable, a flip is shifted") {
    // same per-band counts on both segments → every contrib 0, psi 0
    val same = Seq.tabulate(40) { i =>
      (i % 2 == 0, if (i % 4 < 2) 10.0 else 30.0) }.toDF("cur", "v")
    val s = Profiling.populationStability(same, "cur", "v", bandWidth = 25.0)
      .orderBy("band").collect()
    assert(s.map(_.getLong(0)).toSeq == Seq(0L, 1L))
    assert(s.forall(r => r.getDouble(6) == 0.0 && r.getString(7) == "stable"))
    assert(s.forall(r => r.getDouble(3) == r.getDouble(4)))
    // total distribution flip: ref all band 0, cur all band 1 → far
    // past the 0.25 industry bar
    val flip = (Seq.fill(20)((false, 10.0)) ++ Seq.fill(20)((true, 40.0)))
      .toDF("cur", "v")
    val f = Profiling.populationStability(flip, "cur", "v", bandWidth = 25.0)
      .collect()
    assert(f.forall(r => r.getString(7) == "shifted" && r.getDouble(6) > 0.25))
    intercept[IllegalArgumentException](
      Profiling.populationStability(same, "cur", "v", bandWidth = 0.0))
  }

  test("reconcileTotals: missing children, tolerance band, diff shape") {
    import spark.implicits._
    val parents = Seq((1L, 10.0, "A"), (2L, 5.0, "A"), (3L, 7.0, "B"))
      .toDF("pk", "amt", "grp")
    val children = Seq((1L, "4.00"), (1L, "6.00"), (2L, "4.98"))
      .toDF("ck", "raw")
      .select(col("ck"), col("raw").cast("decimal(18,6)").as("camt"))
    val r = Profiling.reconcileTotals(parents, "pk", "amt", "grp",
        children, "ck", "camt")
      .orderBy("grp").collect()
    assert(r.length == 2)
    val a = r(0)
    assert(a.getString(0) == "A" && a.getLong(1) == 2L && a.getLong(2) == 0L)
    assert(a.getLong(3) == 1L)                 // order 1 exact, order 2 off by 0.02
    assert(a.getDouble(4) == 0.01)             // median of (0.00, 0.02)
    assert(a.getDouble(5) == 0.02)
    val b = r(1)
    assert(b.getString(0) == "B" && b.getLong(1) == 1L && b.getLong(2) == 1L)
    assert(b.getLong(3) == 0L && b.isNullAt(4) && b.isNullAt(5))
    intercept[IllegalArgumentException](
      Profiling.reconcileTotals(parents, "pk", "amt", "grp",
        children, "ck", "camt", tol = -1.0))
  }

  test("joinFanout: orphans, clean 1:1 and multipliers land in their bands") {
    import spark.implicits._
    val parents = (1L to 10L).toDF("pk")
    // parent 1: 0 children; 2: 1; 3: 4; 4: 8; 5: 12; 6-10: 1 each
    val children = (Seq.fill(1)(2L) ++ Seq.fill(4)(3L) ++ Seq.fill(8)(4L) ++
      Seq.fill(12)(5L) ++ (6L to 10L)).toDF("ck")
    val got = Profiling.joinFanout(parents, "pk", children, "ck")
      .orderBy("band_id").collect()
      .map(r => r.getString(1) -> (r.getLong(2), r.getLong(3))).toMap
    assert(got("0") == ((1L, 0L)))
    assert(got("1") == ((6L, 6L)))
    assert(got("2-5") == ((1L, 4L)))
    assert(got("6-10") == ((1L, 8L)))
    assert(got("11+") == ((1L, 12L)))
    // shares sum to 1 over the 10 parents
    val shares = Profiling.joinFanout(parents, "pk", children, "ck")
      .collect().map(_.getDouble(4)).sum
    assert(math.abs(shares - 1.0) < 1e-9)
  }

  test("fdViolations: g3 repair counts; held FDs read zero; nulls drop") {
    import spark.implicits._
    val df = Seq((Some(1L), Some("x")), (Some(1L), Some("x")),
      (Some(1L), Some("y")), (Some(2L), Some("z")), (Some(2L), Some("z")),
      (Some(3L), Some("w")), (None, Some("q")), (Some(4L), None))
      .toDF("a", "b")
    val got = Profiling.fdViolations(df, Seq(("a", "b"), ("b", "a")))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getBoolean(6))).toMap
    // a→b: group 1 keeps max(2 of 'x') of 3 rows → 1 violation
    assert(got("a->b") == ((6L, 3L, 1L, 1L, false)))
    // b→a holds: every b value maps to exactly one a
    assert(got("b->a") == ((6L, 4L, 0L, 0L, true)))
    val rate = Profiling.fdViolations(df, Seq(("a", "b")))
      .head.getDouble(5)
    assert(rate == 0.166667)
    // degenerate and empty pair lists are rejected loudly
    intercept[IllegalArgumentException](Profiling.fdViolations(df, Seq()))
    intercept[IllegalArgumentException](
      Profiling.fdViolations(df, Seq(("a", "a"))))
    // an empty input frame still emits one all-zero row per FD
    val empty = Profiling.fdViolations(df.where(col("a") > 100L),
      Seq(("a", "b"))).head
    assert(empty.getLong(1) == 0L && empty.getLong(2) == 0L &&
      empty.getLong(4) == 0L && empty.getBoolean(6))
  }

  test("hellingerDrift: identical mixes read 0, disjoint mixes read 1") {
    import spark.implicits._
    val a = Seq("x", "x", "y", "y").toDF("c")
    val b = Seq("x", "y").toDF("c")
    val same = Profiling.hellingerDrift(a, b, "c").head
    assert(same.getLong(0) == 2L && same.getLong(1) == 4L &&
      same.getLong(2) == 2L)
    assert(same.getDouble(3) == 1.0 && same.getDouble(4) == 0.0)
    // disjoint supports: BC = 0, H = 1; absent categories carry their
    // full mass (no epsilon flooring)
    val da = Seq.fill(4)("x").toDF("c")
    val db = Seq.fill(5)("y").toDF("c")
    val dis = Profiling.hellingerDrift(da, db, "c").head
    assert(dis.getLong(0) == 2L)
    assert(dis.getDouble(3) == 0.0 && dis.getDouble(4) == 1.0)
    // nulls drop from both sides
    val an = a.union(Seq.fill(3)(null.asInstanceOf[String]).toDF("c"))
    val n = Profiling.hellingerDrift(an, b, "c").head
    assert(n.getLong(1) == 4L && n.getDouble(4) == 0.0)
  }

  test("nullPatternProfile: bitmask groups with shares; column order " +
      "is the mask order") {
    import spark.implicits._
    val df = Seq((Some(1), Some("a")), (Some(2), None),
      (Some(3), None), (None, None)).toDF("x", "y")
    val got = Profiling.nullPatternProfile(df, Seq("x", "y"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(2)))).toMap
    assert(got == Map("11" -> ((1L, 0.25)), "10" -> ((2L, 0.5)),
      "00" -> ((1L, 0.25))))
    // mask order follows the argument order, not the schema
    val rev = Profiling.nullPatternProfile(df, Seq("y", "x"))
      .collect().map(_.getString(0)).toSet
    assert(rev == Set("11", "01", "00"))
    intercept[IllegalArgumentException](
      Profiling.nullPatternProfile(df, Seq.fill(17)("x")))
  }

  test("categoryChurn: per-column set differences and Jaccard") {
    import spark.implicits._
    val a = Seq((1, "x"), (2, "x"), (3, "y")).toDF("k", "c")
    val b = Seq((2, "x"), (4, "z"), (5, "z")).toDF("k", "c")
    val got = Profiling.categoryChurn(a, b, Seq("k", "c"))
      .collect().map(r => r.getString(0) -> r).toMap
    // k: A {1,2,3}, B {2,4,5} → new 2, vanished 2, J = 1/5
    val k = got("k")
    assert(k.getLong(1) == 3L && k.getLong(2) == 3L &&
      k.getLong(3) == 2L && k.getLong(4) == 2L && k.getDouble(5) == 0.2)
    // c: A {x,y}, B {x,z} → J = 1/3
    val c = got("c")
    assert(c.getLong(3) == 1L && c.getLong(4) == 1L &&
      c.getDouble(5) == 0.333333)
    intercept[IllegalArgumentException](Profiling.categoryChurn(a, b, Nil))
    intercept[IllegalArgumentException](
      Profiling.categoryChurn(a, b, Seq("k", "k")))
  }

  test("dateOrderAudit: negative spans counted, span stats exact, " +
      "null fields drop") {
    import spark.implicits._
    import java.sql.Date
    def d(s: String) = Date.valueOf(s)
    val df = Seq(
      ("g1", d("2024-01-10"), d("2024-01-12")),  // +2
      ("g1", d("2024-01-10"), d("2024-01-08")),  // −2 violation
      ("g1", d("2024-01-10"), d("2024-01-16")),  // +6
      ("g2", d("2024-01-01"), d("2024-01-01")))  // 0 — NOT a violation
      .toDF("g", "start", "end")
      .union(Seq(("g1", null.asInstanceOf[Date], d("2024-01-01")))
        .toDF("g", "start", "end"))
    val got = Profiling.dateOrderAudit(df, "g", "start", "end")
      .collect().map(r => r.getString(0) -> r).toMap
    val g1 = got("g1")
    assert(g1.getLong(1) == 3L && g1.getLong(2) == 1L)
    assert(g1.getDouble(3) == 0.333333)
    assert(g1.getLong(4) == -2L && g1.getDouble(5) == 2.0 &&
      g1.getLong(6) == 6L)
    val g2 = got("g2")
    assert(g2.getLong(2) == 0L && g2.getDouble(3) == 0.0)
  }
}
