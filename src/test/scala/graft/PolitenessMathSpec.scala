package graft

import org.scalatest.funsuite.AnyFunSuite

/**
 * Pure-math property behind the superstep's LAZY token refill
 * (sched/Superstep.scala A7): refilling a token bucket once over the total
 * elapsed time gives the same token count as refilling eagerly every tick,
 * because linear refill commutes with the burst cap — min(B, t + r·d1 + r·d2)
 * equals min(B, min(B, t + r·d1) + r·d2) whenever consumption only happens
 * at observation points. This is what lets the superstep skip state writes
 * for hosts that merely had demand (reference semantics: token_bucket.py
 * refills on every get()).
 */
class PolitenessMathSpec extends AnyFunSuite {

  private def eager(t0: Double, rate: Double, burst: Double, dts: Seq[Double]): Double =
    dts.foldLeft(t0)((t, dt) => math.min(burst, t + rate * dt))

  private def lazyRefill(t0: Double, rate: Double, burst: Double, dts: Seq[Double]): Double =
    math.min(burst, t0 + rate * dts.sum)

  test("lazy refill ≡ eager per-tick refill (no consumption between observations)") {
    val rnd = new scala.util.Random(42)
    (1 to 2000).foreach { _ =>
      val rate = 0.01 + rnd.nextDouble() * 100
      val burst = 0.5 + rnd.nextDouble() * 50
      val t0 = math.min(rnd.nextDouble() * 50, burst)
      val dts = Seq.fill(8)(rnd.nextDouble() * 10)
      val e = eager(t0, rate, burst, dts)
      val l = lazyRefill(t0, rate, burst, dts)
      assert(math.abs(e - l) < 1e-9, s"eager=$e lazy=$l rate=$rate burst=$burst t0=$t0 dts=$dts")
    }
  }

  test("consumption points see identical tokens under both schedules") {
    // interleave refill windows with consumptions; eager refills every tick,
    // lazy refills only at consumption points — the granted amounts and the
    // post-consumption states must coincide at every consumption
    val rnd = new scala.util.Random(7)
    (1 to 2000).foreach { _ =>
      val rate = 0.1 + rnd.nextDouble() * 10
      val burst = 1.0 + rnd.nextDouble() * 20
      var te = burst; var tl = burst // both start full (token_bucket.py:32)
      (1 to 5).foreach { _ =>
        val dts = Seq.fill(3)(rnd.nextDouble() * 5)
        val want = rnd.nextInt(11)
        te = eager(te, rate, burst, dts)
        tl = lazyRefill(tl, rate, burst, dts)
        assert(math.abs(te - tl) < 1e-9)
        val grant = math.min(math.floor(te).toLong, want.toLong)
        te -= grant; tl -= grant
      }
    }
  }
}
