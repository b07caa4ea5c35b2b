package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the driver-tail bench summary line (Bench.compactTailLine).
  *
  * The harness records only the LAST 2000 chars of Bench's stdout; rounds
  * 1–7 all archived a head-truncated, unparseable per-entry JSON
  * (BENCH_r0*.json `parsed: null`). The compact line exists so the driver
  * finally captures a parseable record: it must (a) stay under the window
  * with room for sbt's `[success]` trailer, (b) carry EVERY entry via the
  * columnar arrays, (c) refuse to emit positional arrays for subset runs
  * where the 1-based indexing would lie.
  */
class BenchTailSpec extends AnyFunSuite {

  private val keyOf: String => String = _.takeWhile(_ != '_')

  /** Full-registry-shaped results: p01..p74, q01..q106, s01..s35. */
  private def fullRegistry(sec: Int => Double): Seq[(String, Double)] = {
    def fam(f: String, n: Int) =
      (1 to n).map(i => f"$f$i%02d_entry_name_of_plausible_length" -> sec(i))
    fam("p", 74) ++ fam("q", 106) ++ fam("s", 35)
  }

  test("full registry fits the tail window with every entry present") {
    // adversarially slow values: every entry 99.34 s (5 chars each at 2dp)
    val results = fullRegistry(_ => 99.34)
    val line = Bench.compactTailLine(results, keyOf, total = 21358.1,
      failed = 0, passes = 2, wall = 42716.2, sfDir = "/root/testdata/sf0.1")
      .getOrElse(fail("expected a compact line for a contiguous registry"))
    assert(line.length <= 1880, s"line is ${line.length} chars")
    // parseable standalone JSON with the headline fields the driver needs
    val parsed = ujsonLite(line)
    assert(parsed.contains("\"metric\":\"total\""))
    assert(parsed.contains("\"value\":21358.100"))
    // all three family arrays at full cardinality
    assert(occurrences(line, "99.34") >= 215)
    assert(line.contains("p=1..74,q=1..106,s=1..35"))
  }

  test("typical sf0.1 magnitudes leave room for the 30-slowest dict") {
    val results = fullRegistry(i => 0.2 + (i % 40) * 0.1)
    val line = Bench.compactTailLine(results, keyOf, 183.0, 0, 2, 493.8,
      "/root/testdata/sf0.1").get
    assert(line.length <= 1880)
    assert(line.contains("\"note\":\"queries=30 slowest"))
  }

  test("a subset run (non-contiguous families) emits nothing") {
    val subset = Seq("p41_dedup_containment" -> 9.1, "p34_editdistance_join" -> 2.1)
    assert(Bench.compactTailLine(subset, keyOf, 11.2, 0, 2, 30.0, "x").isEmpty)
  }

  test("a family-complete BENCH_ONLY subset emits nothing either") {
    // BENCH_ONLY=p yields contiguous p01..p74 — positionally valid arrays,
    // but the total is family-only and must not masquerade as a registry
    // total in the driver's archive
    val pOnly = (1 to 74).map(i => f"p$i%02d_entry_name" -> 1.0)
    assert(Bench.compactTailLine(pOnly, keyOf, 74.0, 0, 2, 150.0, "x",
      subset = true).isEmpty)
    // same shape without the subset flag (hypothetical 74-entry registry)
    // still emits — the flag, not the shape, is what gates it
    assert(Bench.compactTailLine(pOnly, keyOf, 74.0, 0, 2, 150.0, "x",
      subset = false).nonEmpty)
  }

  test("pathological per-entry times fall back to a cols-free headline line") {
    // every entry ~9876.54 s: the cols block alone overflows the window
    val results = fullRegistry(_ => 9876.54)
    val line = Bench.compactTailLine(results, keyOf, total = 2123456.1,
      failed = 0, passes = 2, wall = 4246912.2, sfDir = "/root/testdata/sf0.1")
      .getOrElse(fail("expected a headline fallback line"))
    assert(line.length <= 1880, s"line is ${line.length} chars")
    ujsonLite(line)
    assert(line.contains("\"value\":2123456.100"))
    assert(!line.contains("\"cols\""))
  }

  test("failed entries survive as -1 in the arrays") {
    val results = fullRegistry(i => if (i == 7) -1.0 else 1.0)
    val line = Bench.compactTailLine(results, keyOf, 212.0, 3, 2, 400.0, "x").get
    assert(line.contains("-1"))
    assert(line.contains("-1=failed"))
  }

  /** Minimal structural JSON sanity: balanced braces/brackets, no raw
    * newline, single object. (No JSON lib on the unmanaged classpath worth
    * pulling in for this — the gate is structural, the driver does the
    * real parse.)
    */
  private def ujsonLite(s: String): String = {
    assert(s.head == '{' && s.last == '}', "must be a single JSON object line")
    assert(!s.contains('\n'))
    assert(s.count(_ == '{') == s.count(_ == '}'))
    assert(s.count(_ == '[') == s.count(_ == ']'))
    s
  }

  private def occurrences(s: String, sub: String): Int =
    s.sliding(sub.length).count(_ == sub)
}
