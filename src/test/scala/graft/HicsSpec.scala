package graft

import graft.dsl.{Hics, Interpreter}
import graft.dsl.Hics._
import org.scalatest.funsuite.AnyFunSuite

/** The hics measure-on-demand control loop (reference examples/hics.rs,
  * P5's second half): epsilon-convergence of a single episode and the
  * run-counting generator over repeated episodes. Pure DSL — no Spark
  * session needed. */
class HicsSpec extends AnyFunSuite {

  test("measure-on-demand episode converges to the setpoint within epsilon") {
    val sim = new Sim()
    // initial (87F, 72%) has heat index ~98.5 — well above the day
    // setpoint 91.0, so the controller must dehumidify its way down
    assert(sim.quantity(HeatIndexSpace(87.0, 72.0)) > ReferenceHeatIndexDay + Epsilon)
    new MeasureOnDemand().execute(sim, Epsilon)
    assert(math.abs(sim.quantity(sim.space) - sim.reference) < Epsilon,
      s"not converged: space=${sim.space} hi=${sim.quantity(sim.space)}")
    // above-setpoint with humidity > 50%: every actuation is Dehumidify
    // (hics.rs:224-229), each preceded by its Show status report
    val acts = sim.signals.collect { case Dehumidify => 1; case Cool => 1 }
    assert(acts.nonEmpty)
    assert(sim.signals.collect { case s: Show => s }.size >= acts.size)
    assert(!sim.signals.contains(Cool), "humidity stayed above the minimum")
    // status reports decrease monotonically toward the setpoint
    val shows = sim.signals.collect { case Show(_, hi) => hi }
    assert(shows.zip(shows.tail).forall { case (a, b) => b < a })
  }

  test("run-counting generator executes one episode per demanded element") {
    val sim = new Sim()
    val runs = Interpreter.evalN(Hics.control(sim, 0), Seq.fill(3)(()), max = 3)
    assert(runs === Vector(1, 2, 3))
    // each episode ends converged; natural increase between reads pushes
    // the heat index back up, so later episodes do real work too
    assert(math.abs(sim.quantity(sim.space) - sim.reference) < Epsilon)
    assert(sim.signals.nonEmpty)
  }
}
