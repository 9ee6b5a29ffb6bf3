package graft.expressions

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.scalatest.funsuite.AnyFunSuite

/**
 * Property-based equivalence of the matvec kernel (the sim6 random-
 * projection hot path) against a straightforward Scala model of its
 * contract: per row, the ascending-index sequential fold over the
 * overlapping prefix of (row, vector), then one scale multiply — the
 * exact IEEE op sequence the DuckDB oracle replays. Random dims exercise
 * the ragged cases (row shorter/longer than the vector, empty either
 * side) that the fixed spec vectors don't. Spark-free: the kernel is a
 * pure function of an ArrayData and a reference-object matrix.
 */
class VectorExpressionsPropertySpec extends AnyFunSuite {

  private def model(v: Array[Double], m: Array[Array[Double]],
      scale: Double): Seq[Double] =
    m.toSeq.map { row =>
      val n = math.min(row.length, v.length)
      var s = 0.0
      var i = 0
      while (i < n) { s += row(i) * v(i); i += 1 }
      s * scale
    }

  private def kernel(v: Array[Double], m: Array[Array[Double]],
      scale: Double): Seq[Double] =
    VecEval.matvec(UnsafeArrayData.fromPrimitiveArray(v), m, scale)
      .toDoubleArray().toSeq

  private val genDouble: Gen[Double] = Gen.oneOf(
    Gen.chooseNum(-1e6, 1e6),
    Gen.oneOf(0.0, -0.0, 1.0, -1.0, 1e-300, -1e308, Double.MinPositiveValue))

  test("matvec kernel ≡ sequential-fold model on 2000 random (v, m) shapes") {
    val gen = for {
      dv <- Gen.chooseNum(0, 9)
      dr <- Gen.chooseNum(0, 9) // row length independent of v: ragged
      rows <- Gen.chooseNum(0, 5)
      v <- Gen.listOfN(dv, genDouble)
      m <- Gen.listOfN(rows, Gen.listOfN(dr, genDouble))
      scale <- Gen.oneOf(Gen.const(1.0), Gen.const(0.25), genDouble)
    } yield (v.toArray, m.map(_.toArray).toArray, scale)
    val params = Gen.Parameters.default
    var seed = Seed(4321L)
    var i = 0
    var evaluated = 0
    while (i < 2000) {
      gen.apply(params, seed).foreach { case (v, m, scale) =>
        val got = kernel(v, m, scale)
        val want = model(v, m, scale)
        // bit-level equality, not tolerance: the kernel's claim is the
        // exact IEEE sequence (NaN/negative-zero included)
        assert(got.length == want.length &&
          got.zip(want).forall { case (a, b) =>
            java.lang.Double.doubleToLongBits(a) ==
              java.lang.Double.doubleToLongBits(b)
          },
          s"divergence: v=${v.mkString(",")} rows=${m.length} scale=$scale " +
            s"got=$got want=$want")
        evaluated += 1
      }
      seed = seed.next
      i += 1
    }
    assert(evaluated == 2000, s"only $evaluated of 2000 draws evaluated")
  }

  test("sqEncode kernel ≡ quantization model on 2000 random (v, mins, maxs)") {
    def model(v: Array[Double], mins: Array[Double],
        maxs: Array[Double]): Seq[Int] = {
      val n = math.min(v.length, mins.length)
      (0 until n).map { d =>
        val range = maxs(d) - mins(d)
        if (range == 0.0) 0
        else {
          val c = math.floor((v(d) - mins(d)) * 255.0 / range + 0.5)
          math.min(math.max(c, 0.0), 255.0).toInt
        }
      }
    }
    val gen = for {
      dv <- Gen.chooseNum(0, 9)
      ds <- Gen.chooseNum(0, 9) // stats length independent: overlap-prefix
      v <- Gen.listOfN(dv, genDouble)
      mins <- Gen.listOfN(ds, genDouble)
      // maxs ≥, = or < mins: out-of-order stats must still clamp, equal
      // stats must hit the zero-range branch
      deltas <- Gen.listOfN(ds, Gen.oneOf(Gen.const(0.0), Gen.chooseNum(0.0, 1e6)))
    } yield (v.toArray, mins.toArray,
      mins.zip(deltas).map { case (mn, d) => mn + d }.toArray)
    val params = Gen.Parameters.default
    var seed = Seed(8765L)
    var i = 0
    var evaluated = 0
    while (i < 2000) {
      gen.apply(params, seed).foreach { case (v, mins, maxs) =>
        val got = VecEval.sqEncode(
          UnsafeArrayData.fromPrimitiveArray(v), mins, maxs).toIntArray().toSeq
        assert(got == model(v, mins, maxs),
          s"divergence: v=${v.mkString(",")} mins=${mins.mkString(",")}")
        evaluated += 1
      }
      seed = seed.next
      i += 1
    }
    assert(evaluated == 2000, s"only $evaluated of 2000 draws evaluated")
  }
}
