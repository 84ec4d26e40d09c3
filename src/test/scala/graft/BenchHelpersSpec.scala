package graft

/** [[Bench]]'s contention instrumentation — the suspect flag's inputs
  * must be sane on a live Linux JVM and the share arithmetic must
  * behave at the edges (the flag adjudicates judge-facing numbers; a
  * silently-broken parser would report "all queries ran alone"). */
class BenchHelpersSpec extends TestBase {

  test("cpuSnap returns sane live values: busy and self counters " +
      "positive and monotonic, cpu count matches /proc/stat's view") {
    val a = Bench.cpuSnap()
    assert(a._1 > 0, s"box busy jiffies must be positive: $a")
    assert(a._2 >= 0, s"self jiffies must be non-negative: $a")
    assert(a._3 >= 1, s"cpu count must be >= 1: $a")
    // burn a little CPU so both counters provably advance
    var x = 0L
    (0 until 20000000).foreach(i => x += i * 31)
    assert(x != 0)
    val b = Bench.cpuSnap()
    assert(b._1 >= a._1 && b._2 >= a._2,
      s"jiffy counters must be monotonic: $a -> $b")
    assert(b._3 == a._3)
  }

  test("externalCpuShare edges: unavailable /proc and sub-jiffy " +
      "windows report 0, self-usage subtracts out, capacity uses the " +
      "snapshot's own cpu count") {
    import Bench.externalCpuShare
    // hz pinned to 100 so the expected shares are box-independent
    // (production callers take the probed Bench.userHz default)
    // /proc unavailable -> 0, never a crash or a flag
    assert(externalCpuShare((-1L, -1L, 0), (100L, 10L, 4), 1.0, 100.0)
      == 0.0)
    assert(externalCpuShare((100L, 10L, 4), (-1L, -1L, 0), 1.0, 100.0)
      == 0.0)
    // window too short for jiffy resolution -> 0
    assert(externalCpuShare((0L, 0L, 4), (400L, 0L, 4), 0.01, 100.0)
      == 0.0)
    // 4 cpus, 1 s window = 400 jiffies capacity; box burned 300, we
    // burned 200 -> external = 100/400 = 0.25
    assert(externalCpuShare((1000L, 500L, 4), (1300L, 700L, 4), 1.0,
      100.0) == 0.25)
    // everything external to us: 400/400 = 1.0
    assert(externalCpuShare((0L, 0L, 4), (400L, 0L, 4), 1.0, 100.0)
      == 1.0)
    // self-only load: external clamps at 0 (never negative from
    // rounding skew)
    assert(externalCpuShare((0L, 0L, 4), (400L, 410L, 4), 1.0, 100.0)
      == 0.0)
    // a non-default tick rescales capacity: 4 cpus at 250 Hz for 1 s
    // = 1000 jiffies; 250 external -> 0.25
    assert(externalCpuShare((0L, 0L, 4), (250L, 0L, 4), 1.0, 250.0)
      == 0.25)
  }

  test("userHz probes the live kernel tick: positive, sane, and " +
      "agreeing with getconf when getconf is available (never pinned " +
      "to 100 — a non-100-tick box is exactly what the probe is for)") {
    val hz = Bench.userHz
    assert(hz > 0 && hz <= 10000, s"implausible USER_HZ: $hz")
    // independent probe of the same fact; only compare when it works
    // (if getconf is absent the production path fell back to 100,
    // which the range check above already covers)
    val probed = try {
      val p = new ProcessBuilder("getconf", "CLK_TCK").start()
      val out = new String(p.getInputStream.readAllBytes()).trim
      p.waitFor()
      Some(out.toDouble)
    } catch { case _: Throwable => None }
    probed.foreach(expect =>
      assert(hz == expect, s"userHz $hz != getconf CLK_TCK $expect"))
  }
}
