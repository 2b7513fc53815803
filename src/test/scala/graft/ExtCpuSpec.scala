package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench's external-CPU meter must never silently mis-read: a
  * broken meter either disables the watchdog (foreignCores = -1, no
  * parking — visible in the artifact) or, worse, mis-attributes the
  * bench's own work as foreign and parks forever. These pin the two
  * properties the watchdog depends on. */
class ExtCpuSpec extends AnyFunSuite {

  test("meter is available on this platform and self-consistent") {
    val a = Bench.ExtCpu.snap()
    assert(a.busySec >= 0, "/proc/stat must parse on Linux")
    assert(a.ownSec >= 0, "process CPU must be readable")
    Thread.sleep(50)
    val b = Bench.ExtCpu.snap()
    // counters are monotone and wall time advanced
    assert(b.busySec >= a.busySec && b.ownSec >= a.ownSec)
    assert(b.wallNanos > a.wallNanos)
    assert(Bench.ExtCpu.foreignCores(a, b) >= 0.0)
  }

  test("own busy-spinning is NOT counted as foreign cores") {
    // AMBIENT baseline first: this box can carry genuine foreign load
    // while the suite runs (a co-tenant burning >1.5 cores made the
    // fixed absolute bar flake in round 15) — the property under test
    // is that OWN work subtracts out, so measure the no-own-work
    // ambient level and assert the with-own-work reading doesn't
    // exceed it by more than measurement slack.
    val a0 = Bench.ExtCpu.snap()
    Thread.sleep(500)
    val ambient = Bench.ExtCpu.foreignCores(a0, Bench.ExtCpu.snap())
    val a = Bench.ExtCpu.snap()
    // burn ~0.5 s of CPU on 4 threads IN THIS PROCESS
    val threads = (1 to 4).map { _ =>
      new Thread(() => {
        val t0 = System.nanoTime()
        var x = 0L
        while (System.nanoTime() - t0 < 500L * 1000 * 1000) x += 1
        if (x == -1) println(x) // defeat dead-code elimination
      })
    }
    threads.foreach(_.start()); threads.foreach(_.join())
    val fc = Bench.ExtCpu.foreignCores(a, Bench.ExtCpu.snap())
    // 4 cores of own work must subtract out: the reading may move with
    // ambient noise between the two windows, but never by the ~4 cores
    // the own spin would add if the meter mis-attributed it
    assert(fc < ambient + 2.0,
      s"own work leaked into the foreign meter: $fc cores vs ambient $ambient")
  }

  test("degenerate snaps disable rather than mislead") {
    val good = Bench.ExtCpu.snap()
    val bad = Bench.ExtCpu.Snap(-1.0, good.ownSec, good.wallNanos + 1)
    assert(Bench.ExtCpu.foreignCores(bad, good) == -1.0)
    assert(Bench.ExtCpu.foreignCores(good, good) == -1.0) // zero wall
  }
}
