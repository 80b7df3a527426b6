package graft

import graft.dsl.{Interpreter, Keyed, Pelican, PelicanMealy}
import graft.dsl.Pelican.{Capability, Color, Event, Lengths}
import graft.streaming.StreamFsm
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** The reference's hierarchical-FSM example (examples/pelican.rs, pattern
  * P2) ported end-to-end: exact capability traces from the SP state tree,
  * trace equivalence of the serializable Mealy form, and a full
  * timer-driven crossing cycle on transformWithState. */
class PelicanSpec extends SparkSpec {

  import Capability._
  import Color._

  private val len = Lengths() // reference constants (pelican.rs:57-60)

  test("state tree reproduces the reference capability sequence for a full crossing") {
    val script = Seq(Event.Timeout, Event.Push, Event.Timeout, Event.Timeout,
      Event.Timeout, Event.Timeout, Event.Exit)
    val got = Interpreter.evalN(Pelican.on(len), script)
    val expected = Vector(
      // on() entry (pelican.rs:134-138) + vehicles() entry (pelican.rs:220-224)
      SetPedestrianLights(Red), SetVehicleLights(Red),
      SetPedestrianLights(Red), EmitTimeoutAfter(len.bothRed),
      // guard --Timeout--> vehicles_green (pelican.rs:173-177)
      SetVehicleLights(Green), EmitTimeoutAfter(len.vehiclesGreenMin),
      // --Push--> vehicles_green_pushed (no entry actions)
      // --Timeout--> vehicles_yellow (pelican.rs:213-217)
      SetVehicleLights(Yellow), EmitTimeoutAfter(len.vehiclesYellow),
      // --Timeout--> pedestrians (pelican.rs:254-258)
      SetVehicleLights(Red), EmitTimeoutAfter(len.bothRed),
      // guard --Timeout--> pedestrians_green (pelican.rs:247-251)
      SetPedestrianLights(Green), EmitTimeoutAfter(len.pedestriansGreen),
      // --Timeout--> vehicles (back to the top of the cycle)
      SetPedestrianLights(Red), EmitTimeoutAfter(len.bothRed),
      // --Exit--> off() via the exit shared by ALL operational descendants
      SetPedestrianLights(Black), SetVehicleLights(Black), Break)
    assert(got === expected)
  }

  test("unexpected timeout in vehicles_green_timedout reaches the error state") {
    val script = Seq(Event.Timeout, Event.Timeout, Event.Timeout, Event.Push)
    val got = Interpreter.evalN(Pelican.on(len), script)
    val expected = Vector(
      SetPedestrianLights(Red), SetVehicleLights(Red),
      SetPedestrianLights(Red), EmitTimeoutAfter(len.bothRed),
      SetVehicleLights(Green), EmitTimeoutAfter(len.vehiclesGreenMin),
      // green --Timeout--> timedout (silent), timedout --Timeout--> error
      // with the pre-capability (pelican.rs:195-200)
      UnexpectedTimeout("state: vehicles_green_timedout"),
      SetPedestrianLights(Red), SetVehicleLights(Red), CallForHelp,
      // absorbing: map(|_| CallForHelp) echoes per event (pelican.rs:269)
      CallForHelp)
    assert(got === expected)
  }

  test("Mealy form is trace-equivalent to the state tree on random scripts") {
    val rnd = new scala.util.Random(7)
    val alphabet = Vector(Event.Push, Event.Timeout, Event.Exit)
    (1 to 50).foreach { _ =>
      val script = Vector.fill(rnd.nextInt(20))(alphabet(rnd.nextInt(3)))
      val tree = Interpreter.evalN(Pelican.on(len), script)
      val mealy = PelicanMealy.run(len)(script)
      assert(mealy === tree, s"script: $script")
    }
  }

  test("streaming pelican crosses on re-armed native timers (P2+P3+P4 end-to-end)") {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      import spark.implicits._
      implicit val sq = spark.sqlContext
      val fast = Lengths(vehiclesGreenMin = 200L, vehiclesYellow = 100L,
        pedestriansGreen = 200L, bothRed = 100L)
      val ms = MemoryStream[(Long, Long, String)]
      val keyed = ms.toDS().map { case (k, seq, v) => Keyed(k, seq, v) }
      def armOf(caps: Seq[Capability]): Option[Long] =
        caps.collectFirst { case EmitTimeoutAfter(t) => t }
      def visible(caps: Seq[Capability]): Seq[String] =
        caps.collect { case c if !c.isInstanceOf[EmitTimeoutAfter] => c.toString }
      // capability-driven runner: EmitTimeoutAfter becomes a native timer
      // (the reference's feedback thread, pelican.rs:346-367); Timeout is
      // the timer-expiry transition; everything else streams to the sink
      val out = StreamFsm.fsmStreamWithTimersTws(keyed, "__boot") {
        (s: String, e: Option[String]) =>
          if (s == "__boot") {
            val (caps, leaf) = PelicanMealy.boot(fast)
            (leaf, visible(caps), armOf(caps))
          } else {
            val ev = e match {
              case Some("exit") => Event.Exit
              case Some(_) => Event.Push
              case None => Event.Timeout
            }
            val (s2, caps) = PelicanMealy.step(fast)(s, ev)
            (s2, visible(caps), armOf(caps))
          }
      }
      val q = out.writeStream.format("memory").queryName("pelican_out")
        .outputMode("append")
        .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime(50))
        .start()
      def caps(): Vector[String] =
        spark.table("pelican_out").as[Keyed[String]]
          .collect().sortBy(_.seq).map(_.value).toVector
      def awaitCount(n: Int): Vector[String] = {
        val deadline = System.currentTimeMillis() + 60000
        var c = caps()
        while (c.length < n && System.currentTimeMillis() < deadline) {
          Thread.sleep(100); c = caps()
        }
        c
      }
      try {
        ms.addData((1L, 0L, "boot"))
        // boot(3 caps) + timers walk green -> timedout, where the machine
        // waits for a Push (timedout arms no timer)
        assert(awaitCount(4).length >= 4)
        ms.addData((1L, 1L, "push"))
        // push -> yellow, then timers alone cross to pedestrians and back
        val seen = awaitCount(9)
        ms.addData((1L, 2L, "exit"))
        val all = awaitCount(seen.length + 3)
        val expectedPrefix = Vector(
          SetPedestrianLights(Red), SetVehicleLights(Red),     // on()
          SetPedestrianLights(Red),                            // vehicles()
          SetVehicleLights(Green),                             // timer
          SetVehicleLights(Yellow),                            // our push
          SetVehicleLights(Red),                               // timer: pedestrians
          SetPedestrianLights(Green),                          // timer
          SetPedestrianLights(Red),                            // timer: vehicles again
          SetVehicleLights(Green)                              // timer: full cycle
        ).map(_.toString)
        assert(all.take(9) === expectedPrefix, s"got: $all")
        // off() entry; a still-pending timer may then expire inside the
        // absorbing state, which faithfully echoes Break (pelican.rs:278
        // map(|_| Break)) — so check the entry slice, not the tail
        assert(all.slice(9, 12) ===
          Vector(SetPedestrianLights(Black), SetVehicleLights(Black), Break).map(_.toString),
          s"got: $all")
      } finally q.stop()
    } finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }
}
