package graft.dsl

/** Port of the reference's hierarchical-state-machine example — a
  * PEdestrians-LIght-CONtrolled crossing (reference `examples/pelican.rs`,
  * design pattern P2 in SURVEY.md §2.1).
  *
  * Two equivalent encodings are provided, mirroring the two halves of the
  * reference's technique:
  *
  *  1. [[Pelican.on]] — the *state tree* as an [[SP]] term built from nested
  *     local defs with lexical scoping (reference `pelican.rs:141-262`):
  *     a state is a no-arg function returning `SP.get(transition)`; shared
  *     transitions (the `exit` case, reference `pelican.rs:144-146`) are
  *     defined once at the parent node and captured lexically by all
  *     descendants — Scala's nested defs shadow exactly like the reference's
  *     `case_capture_transition!` macro resolves the lexically closest
  *     definition. Multi-`Put` entry actions (`mealy!`,
  *     `pelican.rs:117-125`) are the [[Pelican.mealy]] fold of `SP.put`.
  *
  *  2. [[PelicanMealy]] — the same machine flattened to a serializable
  *     Mealy form (state = string name, transitions = partial functions
  *     composed with `orElse` for behavioral inheritance). This is the form
  *     that runs on Spark's state store: batch via `Compiler.compile`'s
  *     per-key fallback, streaming via
  *     `StreamFsm.fsmStreamWithTimersTws`, where the machine's
  *     `EmitTimeoutAfter` capability (reference `pelican.rs:323-325`)
  *     becomes a native state-store timer instead of a driver feedback
  *     thread (`pelican.rs:346-367`).
  *
  * PelicanSpec asserts: (a) the SP term reproduces the reference's exact
  * capability sequence for scripted event sequences, (b) both encodings are
  * trace-equivalent on random scripts, (c) the streaming form crosses a
  * full vehicle->pedestrian->vehicle cycle driven by re-armed native
  * timers with only two external events.
  */
object Pelican {

  /** Light lengths in ms (reference `pelican.rs:57-60`); parameterized so
    * tests can run the timer loop in milliseconds, not tens of seconds. */
  final case class Lengths(
      vehiclesGreenMin: Long = 10000L,
      vehiclesYellow: Long = 1000L,
      pedestriansGreen: Long = 10000L,
      bothRed: Long = 2000L)

  // reference pelican.rs:62-68
  sealed trait Color extends Serializable
  object Color {
    case object Red extends Color
    case object Yellow extends Color
    case object Green extends Color
    case object Black extends Color
  }

  // reference pelican.rs:74-79
  sealed trait Event extends Serializable
  object Event {
    case object Push extends Event
    case object Timeout extends Event
    case object Exit extends Event
  }

  // reference pelican.rs:84-91
  sealed trait Capability extends Serializable
  object Capability {
    final case class SetVehicleLights(c: Color) extends Capability
    final case class SetPedestrianLights(c: Color) extends Capability
    final case class EmitTimeoutAfter(ms: Long) extends Capability
    final case class UnexpectedTimeout(state: String) extends Capability
    case object CallForHelp extends Capability
    case object Break extends Capability
  }

  import Capability._
  import Color._

  type State = SP[Event, Capability]

  /** `mealy!` (reference pelican.rs:117-125): sequence capabilities as
    * `Put`s ending in a transition. */
  def mealy(caps: Capability*)(transition: => State): State =
    caps.foldRight(() => transition)((c, rest) => () => SP.put(c, rest()))()

  /** The state tree (reference pelican.rs:131-262), node for node. Each
    * state's `capture()` is `case_capture_transition!`; `push`/`timeout`
    * resolve to the lexically closest def, `exit` is inherited from
    * `operational` by every descendant. */
  def on(len: Lengths = Lengths()): State = {

    def off(): State = // pelican.rs:273-280
      mealy(SetPedestrianLights(Black), SetVehicleLights(Black), Break)(
        SP.map(_ => Break))

    def error(): State = // pelican.rs:264-271
      mealy(SetPedestrianLights(Red), SetVehicleLights(Red), CallForHelp)(
        SP.map(_ => CallForHelp))

    def operational(): State = { // pelican.rs:141-262
      def exit(): State = off() // shared by every descendant (pelican.rs:144-146)

      def vehicles(): State = { // pelican.rs:148-225
        def vehiclesGreenGuard(): State = { // pelican.rs:149-163
          def push(): State = capture() // ignore! (pelican.rs:151-154)
          def timeout(): State = vehiclesGreen()
          def capture(): State = SP.get {
            case Event.Push => push()
            case Event.Timeout => timeout()
            case Event.Exit => exit()
          }
          capture()
        }

        def vehiclesGreen(): State = { // pelican.rs:165-178
          def push(): State = vehiclesGreenPushed()
          def timeout(): State = vehiclesGreenTimedout()
          def capture(): State = SP.get {
            case Event.Push => push()
            case Event.Timeout => timeout()
            case Event.Exit => exit()
          }
          mealy(SetVehicleLights(Green), EmitTimeoutAfter(len.vehiclesGreenMin))(
            capture())
        }

        def vehiclesGreenPushed(): State = { // pelican.rs:180-189
          def push(): State = capture()
          def timeout(): State = vehiclesYellow()
          def capture(): State = SP.get {
            case Event.Push => push()
            case Event.Timeout => timeout()
            case Event.Exit => exit()
          }
          capture()
        }

        def vehiclesGreenTimedout(): State = { // pelican.rs:191-203
          def push(): State = vehiclesYellow()
          def timeout(): State =
            mealy(UnexpectedTimeout("state: vehicles_green_timedout"))(error())
          def capture(): State = SP.get {
            case Event.Push => push()
            case Event.Timeout => timeout()
            case Event.Exit => exit()
          }
          capture()
        }

        def vehiclesYellow(): State = { // pelican.rs:205-218
          def push(): State = capture()
          def timeout(): State = pedestrians()
          def capture(): State = SP.get {
            case Event.Push => push()
            case Event.Timeout => timeout()
            case Event.Exit => exit()
          }
          mealy(SetVehicleLights(Yellow), EmitTimeoutAfter(len.vehiclesYellow))(
            capture())
        }

        mealy(SetPedestrianLights(Red), EmitTimeoutAfter(len.bothRed))( // pelican.rs:220-224
          vehiclesGreenGuard())
      }

      def pedestrians(): State = { // pelican.rs:227-259
        def pedestriansGreenGuard(): State = { // pelican.rs:228-237
          def push(): State = capture()
          def timeout(): State = pedestriansGreen()
          def capture(): State = SP.get {
            case Event.Push => push()
            case Event.Timeout => timeout()
            case Event.Exit => exit()
          }
          capture()
        }

        def pedestriansGreen(): State = { // pelican.rs:239-252
          def push(): State = capture()
          def timeout(): State = vehicles()
          def capture(): State = SP.get {
            case Event.Push => push()
            case Event.Timeout => timeout()
            case Event.Exit => exit()
          }
          mealy(SetPedestrianLights(Green), EmitTimeoutAfter(len.pedestriansGreen))(
            capture())
        }

        mealy(SetVehicleLights(Red), EmitTimeoutAfter(len.bothRed))( // pelican.rs:254-258
          pedestriansGreenGuard())
      }

      vehicles() // pelican.rs:261
    }

    mealy(SetPedestrianLights(Red), SetVehicleLights(Red))( // pelican.rs:131-139
      operational())
  }
}

/** The same machine flattened to a serializable Mealy form — state is a
  * string name, so it checkpoints in Spark's state store. Behavioral
  * inheritance is `orElse` over partial functions: each state's own
  * transitions fall back to the `operational` node's shared `exit`
  * handling, exactly the hierarchy of the reference's state tree. */
object PelicanMealy {
  import Pelican._
  import Pelican.Capability._
  import Pelican.Color._

  /** Transition result: where to go and what to emit before entry. */
  private sealed trait Target
  private case object Stay extends Target
  private final case class Goto(state: String, pre: Seq[Capability] = Nil) extends Target
  private final case class Emit(c: Capability) extends Target // absorbing-state output

  /** Entry actions per state (the `mealy!` blocks); composite states chain
    * to their initial child, so entering "vehicles" lands in the guard. */
  private def entry(len: Lengths): Map[String, (Seq[Capability], String)] = Map(
    "on" -> (Seq(SetPedestrianLights(Red), SetVehicleLights(Red)) -> "vehicles"),
    "vehicles" -> (Seq(SetPedestrianLights(Red), EmitTimeoutAfter(len.bothRed))
      -> "vehicles_green_guard"),
    "vehicles_green" -> (Seq(SetVehicleLights(Green), EmitTimeoutAfter(len.vehiclesGreenMin))
      -> "vehicles_green"),
    "vehicles_yellow" -> (Seq(SetVehicleLights(Yellow), EmitTimeoutAfter(len.vehiclesYellow))
      -> "vehicles_yellow"),
    "pedestrians" -> (Seq(SetVehicleLights(Red), EmitTimeoutAfter(len.bothRed))
      -> "pedestrians_green_guard"),
    "pedestrians_green" -> (Seq(SetPedestrianLights(Green), EmitTimeoutAfter(len.pedestriansGreen))
      -> "pedestrians_green"),
    "error" -> (Seq(SetPedestrianLights(Red), SetVehicleLights(Red), CallForHelp) -> "error"),
    "off" -> (Seq(SetPedestrianLights(Black), SetVehicleLights(Black), Break) -> "off"))

  /** Resolve a state through its entry chain: collected entry capabilities
    * plus the leaf state actually waiting for input. */
  private def resolve(len: Lengths, state: String): (Seq[Capability], String) = {
    val e = entry(len)
    var caps = Vector.empty[Capability]
    var s = state
    var continue = true
    while (continue) e.get(s) match {
      case Some((cs, next)) =>
        caps ++= cs
        if (next == s) continue = false else s = next
      case None => continue = false
    }
    (caps, s)
  }

  // shared ancestor behavior (operational's exit), inherited via orElse
  private val exitShared: PartialFunction[Event, Target] = {
    case Event.Exit => Goto("off")
  }
  private def inherit(own: PartialFunction[Event, Target]): PartialFunction[Event, Target] =
    own.orElse(exitShared)

  private val transitions: Map[String, PartialFunction[Event, Target]] = Map(
    "vehicles_green_guard" -> inherit {
      case Event.Push => Stay
      case Event.Timeout => Goto("vehicles_green")
    },
    "vehicles_green" -> inherit {
      case Event.Push => Goto("vehicles_green_pushed")
      case Event.Timeout => Goto("vehicles_green_timedout")
    },
    "vehicles_green_pushed" -> inherit {
      case Event.Push => Stay
      case Event.Timeout => Goto("vehicles_yellow")
    },
    "vehicles_green_timedout" -> inherit {
      case Event.Push => Goto("vehicles_yellow")
      case Event.Timeout =>
        Goto("error", pre = Seq(UnexpectedTimeout("state: vehicles_green_timedout")))
    },
    "vehicles_yellow" -> inherit {
      case Event.Push => Stay
      case Event.Timeout => Goto("pedestrians")
    },
    "pedestrians_green_guard" -> inherit {
      case Event.Push => Stay
      case Event.Timeout => Goto("pedestrians_green")
    },
    "pedestrians_green" -> inherit {
      case Event.Push => Stay
      case Event.Timeout => Goto("vehicles")
    },
    // absorbing states: every event echoes the final capability
    // (reference pelican.rs:269,278 `map(|_| ...)`)
    "error" -> { case _ => Emit(CallForHelp) },
    "off" -> { case _ => Emit(Break) })

  /** Initial (pre-input) capabilities and leaf state — what the SP term
    * `Put`s before its first `Get`. */
  def boot(len: Lengths = Lengths()): (Seq[Capability], String) = resolve(len, "on")

  /** One Mealy step: `(state, event) => (state', outputs)`. */
  def step(len: Lengths = Lengths())(state: String, e: Event): (String, Seq[Capability]) =
    transitions(state)(e) match {
      case Stay => (state, Nil)
      case Emit(c) => (state, Seq(c))
      case Goto(next, pre) =>
        val (caps, leaf) = resolve(len, next)
        (leaf, pre ++ caps)
    }

  /** Run a finite script from boot — trace-equivalent to
    * `Interpreter.eval(Pelican.on(len), script)` prefixed with boot caps. */
  def run(len: Lengths = Lengths())(script: Seq[Event]): Vector[Capability] = {
    val (caps0, s0) = boot(len)
    val out = Vector.newBuilder[Capability]
    out ++= caps0
    var s = s0
    script.foreach { e =>
      val (s2, caps) = step(len)(s, e)
      s = s2
      out ++= caps
    }
    out.result()
  }
}
