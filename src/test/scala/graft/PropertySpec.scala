package graft

import org.scalacheck.{Gen, Prop, Test => ScTest}
import org.scalacheck.Prop.propBoolean
import org.scalatest.funsuite.AnyFunSuite

import graft.model.{PersistenceModel, RidgeForecaster}
import graft.schema.ScalerParams

/** SURVEY §5.4 — ScalaCheck properties over the pure (driver/executor-
  * local) algebra: the scaler round trip, the local ridge fit, the
  * persistence baseline, and the LSH plane derivation. Spark-side
  * counterparts of these laws are asserted in the operator suites; here
  * the generators explore the numeric envelope. */
class PropertySpec extends AnyFunSuite {

  private def check(name: String, p: Prop, minTests: Int = 100): Unit = {
    val r = ScTest.check(
      ScTest.Parameters.default.withMinSuccessfulTests(minTests), p)
    assert(r.passed, s"$name: ${r.status}")
  }

  private val finite = Gen.choose(-1e6, 1e6)

  test("ScalerParams: invert(scale(x)) == x for non-degenerate params; degenerate maps to min") {
    check("roundtrip", Prop.forAll(finite, finite, finite) { (a, b, x) =>
      (math.abs(a - b) > 1e-6) ==> {
        val s = ScalerParams(math.min(a, b), math.max(a, b))
        math.abs(s.invert(s.scale(x)) - x) <= 1e-6 * math.max(1.0, math.abs(x))
      }
    })
    check("degenerate", Prop.forAll(finite, finite) { (m, y) =>
      val s = ScalerParams(m, m)
      s.scale(y) == 0.0 && s.invert(y) == m
    })
  }

  test("fitLocal recovers a noiseless linear recurrence within tolerance") {
    val coefGen = Gen.listOfN(3, Gen.choose(-0.4, 0.4))
    check("recovery", Prop.forAll(coefGen, Gen.choose(0.1, 10.0)) { (coefs, start) =>
      val seqLen = 3; val horizon = 1
      // generate a series obeying x_t = 0.1 + sum(c_i * x_{t-i})
      var hist = Vector(start, start * 0.9, start * 1.1)
      (0 until 40).foreach { _ =>
        val window = hist.takeRight(seqLen).reverse
        val nxt = 0.1 + coefs.zip(window).map { case (c, v) => c * v }.sum
        hist = hist :+ nxt
      }
      hist.forall(v => math.abs(v) < 1e4) ==> {
        val samples = (0 to hist.length - seqLen - horizon).map { i =>
          (hist.slice(i, i + seqLen).toArray,
            hist.slice(i + seqLen, i + seqLen + horizon).toArray)
        }
        val model = new RidgeForecaster(seqLen, horizon).fitLocal(samples)
        val window = hist.takeRight(seqLen).toArray
        val expected = 0.1 + coefs.zip(window.reverse.toList).map { case (c, v) => c * v }.sum
        val got = model.predict(window)(0)
        math.abs(got - expected) <= 1e-3 * math.max(1.0, math.abs(expected))
      }
    }, minTests = 50)
  }

  test("PersistenceModel repeats the last value for every horizon step") {
    check("persistence", Prop.forAll(Gen.nonEmptyListOf(finite), Gen.choose(1, 10)) { (w, h) =>
      val out = new PersistenceModel(h).predict(w.toArray)
      out.length == h && out.forall(_ == w.last)
    })
  }

  test("hyperplane components are deterministic and in [-1, 1)") {
    check("planes", Prop.forAll(Gen.choose(0, 63), Gen.choose(0, 127)) { (p, d) =>
      val v = graft.functions.HyperplaneSig.planeComponent(p, d)
      v >= -1.0 && v < 1.0 && v == graft.functions.HyperplaneSig.planeComponent(p, d)
    })
  }

  test("MediaCodec: build-parse round trip holds for ALL payload byte arrays") {
    import graft.analytics.MediaCodec
    val bytesGen = Gen.choose(0, 4096).flatMap(n =>
      Gen.containerOfN[Array, Byte](n, Gen.choose(Byte.MinValue, Byte.MaxValue)))
    check("bmp", Prop.forAll(bytesGen) { data =>
      val m = MediaCodec.probe(MediaCodec.toBmp(data))
      val pixels = (data.length + 2) / 3
      m.exists(i => i.fmt == "bmp" && i.width == MediaCodec.BmpWidth &&
        i.height == math.max(1, (pixels + MediaCodec.BmpWidth - 1) / MediaCodec.BmpWidth))
    }, minTests = 200)
    check("wav", Prop.forAll(bytesGen) { data =>
      val m = MediaCodec.probe(MediaCodec.toWav(data))
      m.exists(i => i.fmt == "wav" && i.sampleRate == 8000 && i.channels == 1 &&
        i.nSamples == (data.length + 1) / 2)
    }, minTests = 200)
    // cross-probe: a BMP never parses as WAV and vice versa (validated
    // magic + size fields), and random bytes essentially never probe
    check("disjoint", Prop.forAll(bytesGen) { data =>
      MediaCodec.probe(MediaCodec.toBmp(data)).forall(_.fmt == "bmp") &&
        MediaCodec.probe(MediaCodec.toWav(data)).forall(_.fmt == "wav")
    })
  }

  test("CmsSketch bucket: always in range, deterministic, seed-independent streams differ") {
    val sGen = Gen.asciiPrintableStr
    check("range", Prop.forAll(sGen, Gen.choose(0, 15)) { (s, j) =>
      val b = graft.functions.CmsSketch.bucket(j, s, 256)
      b >= 0 && b < 256 && b == graft.functions.CmsSketch.bucket(j, s, 256)
    }, minTests = 200)
  }
}
