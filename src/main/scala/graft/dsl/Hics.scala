package graft.dsl

import scala.collection.mutable.ArrayBuffer

/** Port of the reference's demand-driven control-loop example — a Heat
  * Index Control System (reference `examples/hics.rs`, the second half of
  * design pattern P5 in SURVEY.md §2.1: the `MeasureOnDemand`
  * epsilon-convergence strategy, `hics.rs:69-98`, plus the run-counting
  * generator `hics.rs:238-247`).
  *
  * The reference simulates the environment with threads, a mutex-guarded
  * thermohygrometer, and an atomic clock (`hics.rs:310-340`); this port
  * folds those effects into a deterministic [[Hics.Sim]] (each meter read
  * advances the clock and applies one natural-increase step; actuator
  * signals apply their decrease immediately, `hics.rs:323-328`) so the
  * control trace is reproducible and assertable. The loop structure is a
  * transliteration: measurements come from evaluating the `meter` stream
  * processor on a constant-unit stream, and each iteration advances the
  * tail first (`hics.rs:80-96`).
  */
object Hics {

  // hics.rs:116-145
  val Epsilon = 0.5
  val ReferenceHeatIndexDay = 91.0
  val ReferenceHeatIndexNight = 83.0
  val MinimalTemperature = 80.0
  val MinimalHumidity = 50.0
  val Day: Long = 8640L
  final case class HeatIndexSpace(temperature: Double, humidity: Double) // hics.rs:152-156
  val ActuatorDecrease = HeatIndexSpace(0.25, 1.5)
  val NaturalIncrease = HeatIndexSpace(0.02, 0.1)

  // hics.rs:160-164
  sealed trait Signal
  final case class Show(time: Long, heatIndex: Double) extends Signal
  case object Dehumidify extends Signal
  case object Cool extends Signal

  /** Control-system interface (reference `control::System`, hics.rs:58-63):
    * the meter is a stream processor generating measurements on demand. */
  trait System[Space] {
    def meter: SP[Unit, Space]
    def reference: Double
    def quantity(position: Space): Double
    def controller(deviation: Double, status: Double, position: Space): System[Space]
  }

  /** The measure-on-demand strategy (hics.rs:69-98): lazily evaluate the
    * meter, pull one measurement per iteration (tail first, then head,
    * hics.rs:82-83), and loop until |status - setpoint| < epsilon. The
    * reference's `thread::sleep(dwell_time)` is a real-time pacing concern
    * with no semantic content and is omitted. */
  final class MeasureOnDemand {
    def execute[Space](cs0: System[Space], epsilon: Double): System[Space] = {
      var cs = cs0
      // measurements generated lazily (hics.rs:78)
      var positions = Interpreter.eval(cs.meter, Iterator.continually(()))
      var done = false
      while (!done) {
        positions = positions.tail // the actual measurement (hics.rs:82-83)
        val position = positions.head
        val status = cs.quantity(position)
        val setpoint = cs.reference
        val deviation = status - setpoint
        if (math.abs(deviation) < epsilon) done = true
        else cs = cs.controller(deviation, status, position)
      }
      cs
    }
  }

  /** Deterministic hics: clock, thermohygrometer, and actuator folded into
    * one mutable simulation (see scaladoc above). */
  final class Sim(
      initial: HeatIndexSpace = HeatIndexSpace(87.0, 72.0)) extends System[HeatIndexSpace] {
    var space: HeatIndexSpace = initial
    var clock: Long = 0L
    val signals: ArrayBuffer[Signal] = ArrayBuffer.empty

    /** `read_out` (hics.rs:176-183): a Put-loop re-reading the sensor on
      * every forced tail. Reading advances simulated time one tick and
      * applies one natural-increase step (hics.rs:333-339). */
    def meter: SP[Unit, HeatIndexSpace] = SP.Put(read(), () => meter)

    private def read(): HeatIndexSpace = {
      clock += 1
      space = HeatIndexSpace(
        space.temperature + NaturalIncrease.temperature,
        space.humidity + NaturalIncrease.humidity)
      space
    }

    // hics.rs:185-193
    def reference: Double =
      if (clock % Day < Day / 2) ReferenceHeatIndexDay else ReferenceHeatIndexNight

    /** The NWS heat-index regression (hics.rs:194-217). */
    def quantity(p: HeatIndexSpace): Double = {
      val t = p.temperature
      val r = p.humidity
      -42.379 + 2.04901523 * t + 10.14333127 * r +
        -0.22475541 * t * r + -0.00683783 * t * t + -0.05481717 * r * r +
        0.00122874 * t * t * r + 0.00085282 * t * r * r + -0.00000199 * t * t * r * r
    }

    // hics.rs:218-233 + the actuator's immediate effect (hics.rs:323-328)
    def controller(
        deviation: Double, status: Double, position: HeatIndexSpace): System[HeatIndexSpace] = {
      signals += Show(clock, status)
      if (deviation > 0.0) {
        if (position.humidity > MinimalHumidity) {
          signals += Dehumidify
          space = space.copy(humidity = space.humidity - ActuatorDecrease.humidity)
        } else if (position.temperature > MinimalTemperature) {
          signals += Cool
          space = space.copy(temperature = space.temperature - ActuatorDecrease.temperature)
        }
      }
      this
    }
  }

  /** The run-counting generator (hics.rs:238-247): each demanded element
    * executes one full control episode, then `Put`s the episode count. */
  def control(cs: Sim, counter: Int, epsilon: Double = Epsilon): SP[Unit, Int] = {
    new MeasureOnDemand().execute(cs, epsilon)
    val c = counter + 1
    SP.Put(c, () => control(cs, c, epsilon))
  }
}
