package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins Bench's graded-output contract: the driver keeps only the LAST
  * ~2000 chars of stdout (BENCH_r04's tail starts mid-number — the r4 line
  * outgrew the window and the metric/total header was lost). The final
  * line must survive that window intact even after sbt's own
  * `[success] Total time: …` trailer (~75 chars) lands after it.
  */
class BenchSpec extends AnyFunSuite {

  test("graded bench line fits the driver's tail window for every key") {
    // TRUE worst case: every key at 4-digit seconds. The ladder's
    // guaranteed floor (drop cheapest keys, "omitted":N) means even a
    // catastrophic run produces an artifact that survives the tail window
    // — the r8 lesson: the PRE-r9 ladder's last step only tightened
    // saturated values, so a healthy 96-key line (nothing to saturate)
    // shipped at 1939 chars and the driver recorded `"parsed": null`.
    val worst = SparkEntry.queries.keys.toSeq.sorted.map(k => k -> 8888.0)
    val line = Bench.renderLine(worst.map(_._2).sum, worst, failed = 0,
      "/root/testdata/sf0.1")
    assert(line.length <= Bench.MaxGradedLen,
      s"graded line is ${line.length} chars")
    // values render bounded (no scientific notation, no 17-digit doubles —
    // those are what blew the r4 line past the window)
    assert(line.contains("\":999"), line.take(200))
    // the failed field appears only when nonzero (slimming lever): absent
    // on a healthy line, present — and within budget — on a failing one
    assert(!line.contains("\"failed\""))
    val failing = Bench.renderLine(worst.map(_._2).sum, worst, failed = 3,
      "/root/testdata/sf0.1")
    assert(failing.contains("\"failed\":3"))
    assert(failing.length <= Bench.MaxGradedLen,
      s"failing line is ${failing.length} chars")
    // a realistic healthy run (every key at its steady-state hint): the
    // line must fit; past ~97 keys the ladder may shed sf and the
    // cheapest few entries ("omitted":N) but every graded header field
    // and the full-registry TOTAL survive
    val real = SparkEntry.queries.keys.toSeq.sorted
      .map(k => k -> Bench.costHint.getOrElse(k, 1.0))
    val healthy = Bench.renderLine(real.map(_._2).sum, real, failed = 0,
      "/root/testdata/sf0.1")
    assert(healthy.length <= Bench.MaxGradedLen)
    assert(healthy.contains("\"metric\":\"total\"") &&
      healthy.contains("\"unit\":\"sec\"") &&
      healthy.contains("\"queries\":{"), healthy)
    // the expensive keys — the ones perf grading reads — are never the
    // ones dropped
    val costly = real.sortBy { case (k, v) => (-v, k) }.take(10).map(_._1)
    costly.foreach(k => assert(healthy.contains("\"" + k + "\":"),
      s"expensive key $k missing from healthy graded line"))
  }

  test("drop-keys floor: line always fits and declares what it dropped") {
    // synthetic 200-key registry — far past anything the window can hold
    // in full — must still render a parseable, within-budget line that
    // keeps the most expensive keys and declares the omission count
    val many = (1 to 200).map(i => f"synthetic_key_$i%03d" -> i / 10.0)
    val line = Bench.renderLine(many.map(_._2).sum, many, failed = 0, "sfX")
    assert(line.length <= Bench.MaxGradedLen, s"${line.length} chars")
    assert(line.contains("\"omitted\":"), line.take(120))
    // most expensive key survives; cheapest is dropped
    assert(line.contains("\"synthetic_key_200\":"))
    assert(!line.contains("\"synthetic_key_001\":"))
    // the total still covers EVERY key, dropped ones included
    val t = BigDecimal(many.map(_._2).sum)
      .setScale(1, BigDecimal.RoundingMode.HALF_UP)
    assert(line.contains(s""""value":$t"""))
  }

  test("graded values render in at most 3 chars at EVERY magnitude") {
    assert(Bench.fmtGraded(0.0) == "0.0")
    assert(Bench.fmtGraded(1.234) == "1.2")
    assert(Bench.fmtGraded(9.96) == "10") // rounds across the 1dp→0dp edge
    assert(Bench.fmtGraded(67.44) == "67")
    assert(Bench.fmtGraded(888.0) == "888")
    // saturation: ≥999.5 would round to 4 digits — renders as the capped
    // "999" instead, so per-key width is bounded at 3 chars by construction
    assert(Bench.fmtGraded(999.4) == "999")
    assert(Bench.fmtGraded(999.6) == "999")
    assert(Bench.fmtGraded(123456.7) == "999")
    val sweep = (0 to 100000).map(_ / 10.0) // 0.0 – 10000.0 at 0.1 steps
    assert(sweep.forall(v => Bench.fmtGraded(v).length <= 3))
  }

  test("the recorded hint artifact covers every query key (staleness gate)") {
    // hints load from bench_hints.json (the recorded baseline artifact) —
    // a renamed or newly added key that nobody re-recorded fails HERE, at
    // suite time, in addition to being listed under default_hint_keys on
    // the bench diagnostics line
    assert(Bench.costHint.nonEmpty, s"hint artifact missing or empty " +
      s"at ${Bench.hintsPath} (cwd ${sys.props("user.dir")})")
    val missing = SparkEntry.queries.keys.toSet -- Bench.costHint.keySet
    assert(missing.isEmpty,
      s"keys absent from bench_hints.json (re-record the baseline): $missing")
    // and the artifact names only real keys — a rename can't leave a
    // zombie hint steering the pass order
    val zombie = Bench.costHint.keySet -- SparkEntry.queries.keys.toSet
    assert(zombie.isEmpty, s"hints for nonexistent keys: $zombie")
  }

  test("hint-artifact parser round-trips the flat JSON grammar") {
    val f = java.nio.file.Files.createTempFile("graft_hints", ".json")
    java.nio.file.Files.writeString(f,
      """{"a_key": 0.25,"b2": 12,"c_c": 3.5}""")
    try {
      assert(Bench.loadHints(f.toString) ==
        Map("a_key" -> 0.25, "b2" -> 12.0, "c_c" -> 3.5))
      assert(Bench.loadHints("/nonexistent/graft_hints.json") == Map.empty)
    } finally java.nio.file.Files.delete(f)
  }

  test("median is the order-statistics middle, not a biased best-of") {
    assert(Bench.median(Seq(5.0)) == 5.0)
    assert(Bench.median(Seq(9.0, 1.0, 2.0)) == 2.0) // spike rejected
    assert(Bench.median(Seq(4.0, 2.0)) == 3.0)
    assert(Bench.median(Seq(0.3, 0.3, 50.0)) == 0.3) // clamp-rep rejected
  }

  test("failed counts all-rep failures; flaky surfaces mixed-rep instability") {
    // stable, mixed (fails rep2), dead (fails all), mixed (only rep3 ok)
    val ordered = Seq("stable", "mixed_a", "dead", "mixed_b")
    val okByRep = Seq(
      Map("stable" -> true, "mixed_a" -> true, "dead" -> false, "mixed_b" -> false),
      Map("stable" -> true, "mixed_a" -> false, "dead" -> false, "mixed_b" -> false),
      Map("stable" -> true, "mixed_a" -> true, "dead" -> false, "mixed_b" -> true))
    assert(Bench.failedKeys(ordered, okByRep) == Seq("dead"))
    assert(Bench.flakyKeys(ordered, okByRep) == Seq("mixed_a", "mixed_b"))
    // disjoint by construction: a key is failed XOR flaky XOR stable
    assert(Bench.failedKeys(ordered, okByRep)
      .intersect(Bench.flakyKeys(ordered, okByRep)).isEmpty)
  }
}
