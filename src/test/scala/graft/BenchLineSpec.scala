package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench artifact's shed rung (VERDICT r10 #8): shedding must drop
  * REPORTING of the cheapest entries only — never a measurement, never a
  * failure marker — and the guard's threshold logic is independent of
  * what gets reported. Pure-JVM (no Spark session): [[Bench.renderLine]]
  * is the extracted renderer the main flow calls after all measuring and
  * guard-retrying is done. */
class BenchLineSpec extends AnyFunSuite {

  private def results(n: Int): Seq[(String, Double)] =
    (1 to n).map(i => (f"query_with_a_long_name_$i%03d", i * 0.1))

  private def parseQueries(line: String): Map[String, Double] = {
    // minimal extraction of the "queries" object — names are [a-z_0-9]
    val m = """"queries":\{([^}]*)\}""".r.findFirstMatchIn(line).get.group(1)
    if (m.isEmpty) Map.empty
    else m.split(",").map { kv =>
      val Array(k, v) = kv.split(":")
      k.drop(1).dropRight(1) -> v.toDouble
    }.toMap
  }

  test("wide budget: every measured entry is reported, full precision") {
    val all = results(50)
    val line = Bench.renderLine(all, Map.empty, Map.empty, "/sf", Int.MaxValue)
    val qs = parseQueries(line)
    assert(qs.size == 50)
    assert(line.contains(""""value":"""))
    assert(!line.contains("qshed"))
  }

  test("tight budget sheds ONLY the cheapest entries' reporting; total still covers all") {
    val all = results(120)
    val line = Bench.renderLine(all, Map.empty, Map.empty, "/sf", 1850)
    assert(line.length <= 1850)
    val shed = """"qshed":(\d+)""".r.findFirstMatchIn(line).map(_.group(1).toInt)
    assert(shed.nonEmpty, s"expected the shed rung to engage: $line")
    val qs = parseQueries(line)
    assert(qs.size == 120 - shed.get)
    // the kept set is exactly the MOST expensive entries — reporting cut
    // from the cheap end only
    val keptExpected = all.sortBy(-_._2).take(qs.size).map(_._1).toSet
    assert(qs.keySet == keptExpected, "shed did not cut from the cheap end")
    // the total is computed over ALL measurements, shed or not
    val total = """"value":([0-9.]+)""".r.findFirstMatchIn(line).get.group(1).toDouble
    val expectTotal = all.map(_._2).sum
    assert(math.abs(total - expectTotal) < 0.2, s"total $total != measured-sum $expectTotal")
  }

  test("a failed query (-1) is never shed, whatever its position") {
    val all = results(120) :+ ("the_broken_one", -1.0)
    val line = Bench.renderLine(all, Map("the_broken_one" -> "boom"), Map.empty, "/sf", 1850)
    assert(line.contains(""""the_broken_one":-1"""), s"failure marker shed from: $line")
  }

  test("guard threshold is a pure function of the reference map — reported or shed alike") {
    // the contract behind "a shed query still trips the guard": the flag
    // condition compares MEASUREMENTS against the reference minima before
    // any rendering happens; renderLine cannot influence it. Pin the
    // threshold shape here so a refactor routing rendering into the guard
    // would have to break this spec.
    val ref = Bench.refSf01
    assert(ref.contains("sample_weighted") && ref.contains("mm_decode_features"),
      "explicitly-skipped queries must still carry reference minima (they are " +
        "guard-covered whenever measured, e.g. under SPARK_GRAFT_BENCH_ALL)")
    // retry provenance for a shed-cheap query still surfaces in nretry
    val all = results(120)
    val attempts = Map(all.head._1 -> Vector(9.9, all.head._2))
    val line = Bench.renderLine(all, Map.empty, attempts, "/sf", 1850)
    assert(line.contains(""""nretry":1"""),
      "guard provenance lost when the retried query's entry is shed")
  }

  test("full artifact: every entry, every attempt, untruncated errors — valid JSON") {
    // the file-side artifact (VERDICT r11 #2) must carry what the tail
    // line sheds: parse with Jackson (strict) and compare field-for-field
    val all = results(150) :+ ("broken_query", -1.0)
    val errors = Map("broken_query" -> "AnalysisException: line 1\n\t\"quoted\" detail")
    val attempts = Map(
      all.head._1 -> Vector(9.9, 0.1),
      all(1)._1 -> Vector(5.0, 4.0, 0.2))
    val doc = Bench.renderFull(all, errors, attempts, "/sf0.1")
    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    val root = om.readTree(doc)
    assert(root.get("nq").asInt == 151)
    assert(root.get("nretry").asInt == 2)
    assert(root.get("queries").size == 151, "no shedding in the full artifact")
    assert(root.get("queries").get("broken_query").asDouble == -1.0)
    val a0 = root.get("retry").get(all.head._1)
    assert(a0.get("attempts").size == 2 &&
      math.abs(a0.get("attempts").get(0).asDouble - 9.9) < 1e-9)
    assert(a0.get("ref").isNumber, "flag threshold reference rides along")
    assert(root.get("errors").get("broken_query").asText.contains("\"quoted\" detail"),
      "error text must be untruncated and escape-safe")
    // empty maps stay valid JSON
    assert(om.readTree(Bench.renderFull(Seq(("a", 1.0)), Map.empty, Map.empty, "/sf"))
      .get("retry").size == 0)
  }

  test("full artifact carries host-load + job provenance and the COMPLETE regr list") {
    // VERDICT r13 #1: the artifact must be self-defending — per-attempt
    // load samples, per-query job counts, and every over-threshold query
    // with its threshold, uncapped
    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    val all = Seq(("cheap_one", 0.2), ("slow_one", 99.0), ("other_slow", 98.0))
    val prov = Map(
      "cheap_one" -> Vector(Bench.Prov(1.5, 12L, 7)),
      "slow_one" -> Vector(Bench.Prov(30.0, 940L, 41, 3L, 12L, 0L, 14L, 2L),
        Bench.Prov(2.0, 5L, 41, 880L, 951L, 7L, 903L, 412L)))
    val root = om.readTree(Bench.renderFull(all, Map.empty,
      Map("slow_one" -> Vector(99.0, 99.5)), "/sf0.1", prov))
    // detail: one entry per measured query in prov, attempt-aligned arrays
    val d = root.get("detail").get("slow_one")
    assert(d.get("xcpu_pm").size == 2 && d.get("xcpu_pm").get(0).asLong == 940L)
    assert(d.get("load1").get(0).asDouble == 30.0)
    assert(d.get("jobs").asInt == 41)
    // r15: the I/O/memory provenance rides in the same attempt-aligned form
    assert(d.get("iow_pm").get(1).asLong == 880L)
    assert(d.get("psi_io").get(1).asLong == 951L)
    assert(d.get("psi_mem").get(1).asLong == 7L)
    // r16: the CPU-starvation channels (VERDICT r15 #2) ride attempt-aligned
    assert(d.get("psi_cpu").get(1).asLong == 903L)
    assert(d.get("sched_pm").get(1).asLong == 412L)
    // regr: EVERY query above threshold (99 and 98 both exceed any warm
    // ref in the resource, or the 1.5 s fallback), with its threshold
    assert(root.get("nregr").asInt >= 2)
    assert(root.get("regr").get("slow_one").get("thr").isNumber)
    assert(root.get("regr").get("other_slow") != null, "regr list must be uncapped in the file")
    // r15: a regr entry must be adjudicable ALONE — it carries the full
    // per-attempt provenance arrays, not just value/threshold
    val rg = root.get("regr").get("slow_one")
    assert(rg.get("xcpu_pm").size == 2 && rg.get("iow_pm").get(1).asLong == 880L &&
      rg.get("psi_io").get(1).asLong == 951L && rg.get("psi_mem").size == 2 &&
      rg.get("psi_cpu").get(1).asLong == 903L && rg.get("sched_pm").get(1).asLong == 412L &&
      rg.get("load1").get(0).asDouble == 30.0,
      s"regr entry must carry attempt provenance: $rg")
    // sweep-level load summary: CPU avg/max plus the I/O-class maxima
    assert(root.get("load").get("xcpu_pm_max").asLong == 940L)
    assert(root.get("load").get("iow_pm_max").asLong == 880L)
    assert(root.get("load").get("psi_io_max").asLong == 951L)
    assert(root.get("load").get("psi_mem_max").asLong == 7L)
    assert(root.get("load").get("psi_cpu_max").asLong == 903L)
    assert(root.get("load").get("sched_pm_max").asLong == 412L)
  }

  test("tail line carries the sweep-level xload summary at every rung") {
    val all = results(120)
    val prov = all.map { case (k, _) =>
      k -> Vector(Bench.Prov(1.0, 37L, 3, 5L, 9L, 0L, 11L, 2L)) }.toMap
    val tight = Bench.renderLine(all, Map.empty, Map.empty, "/sf", 1850, prov)
    assert(tight.contains(
      """"xload":{"avg":37,"max":37,"iow":5,"psio":9,"psim":0,"psic":11,"sched":2}"""),
      s"xload summary missing from the shed/aliased rung: $tight")
    val wide = Bench.renderLine(all, Map.empty, Map.empty, "/sf", Int.MaxValue, prov)
    assert(wide.contains(""""xload":"""))
  }

  test("PSI stall per-mille arithmetic and sentinels") {
    // 1 s wall window with 0.4 s some-stalled => 400 pm; clamped at 1000;
    // -1 sentinels when the counter is unreadable or the window is empty
    assert(Bench.HostLoad.psiPm(1000000L, 1400000L, 0L, 1000000000L) == 400L)
    assert(Bench.HostLoad.psiPm(0L, 5000000L, 0L, 1000000000L) == 1000L)
    assert(Bench.HostLoad.psiPm(-1L, 100L, 0L, 1000000000L) == -1L)
    assert(Bench.HostLoad.psiPm(0L, 100L, 5L, 5L) == -1L)
  }
}
