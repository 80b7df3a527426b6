package graft.dsl

import org.apache.spark.sql.Column

/** The rspl stream-processor term language, re-expressed as a Scala ADT.
  *
  * Semantics mirror the reference exactly (shtsoft/rspl):
  *  - `Get`/`Put` core type: reference `src/lib.rs:188-199`
  *  - combinators `map`/`filter`/`compose`/`alternate`/`bind`/`generate`:
  *    reference `src/combinators.rs:205-212,143-154,97-121,31-41,65-73,177-183`
  *
  * Unlike the reference (where combinators immediately build Get/Put closure
  * trees), combinator applications stay as AST nodes — the defunctionalized
  * form the reference's own heapless study arrives at
  * (`examples/rspl_heapless.rs:30-156`). That lets [[Compiler]] classify
  * stateless pipelines and emit native Spark plans instead of interpreting
  * element-at-a-time; [[SP.step]] recovers the reference's operational
  * semantics when interpretation is actually wanted.
  *
  * `Map`/`Filter` optionally carry a Column-expression witness: when every
  * node of a pipeline has one, the compiler emits native Catalyst
  * expressions (whole-stage codegen, predicate pushdown) instead of opaque
  * Scala closures.
  */
sealed trait SP[A, B]

object SP {
  final case class Get[A, B](f: A => SP[A, B]) extends SP[A, B]
  final case class Put[A, B](b: B, next: () => SP[A, B]) extends SP[A, B]
  final case class Map[A, B](f: A => B, expr: Option[Column => Column] = None) extends SP[A, B]
  final case class Filter[A, B](p: A => Boolean, expr: Option[Column => Column] = None) extends SP[A, B] {
    // B =:= A by construction (smart ctor); stored loosely for GADT-free matching
  }
  final case class Compose[A, B, C](sp1: SP[A, B], sp2: SP[B, C]) extends SP[A, C]
  final case class Alternate[A, B](sp1: SP[A, B], sp2: SP[A, B]) extends SP[A, B]
  final case class Generate[A, B, S](body: S => (B, S), init: S) extends SP[A, B]
  final case class Bind[X, A, B](sp: SP[X, A], f: A => SP[X, B]) extends SP[X, B]

  // smart constructors (reference src/lib.rs:204-219)
  def get[A, B](f: A => SP[A, B]): SP[A, B] = Get(f)
  def put[A, B](b: B, next: => SP[A, B]): SP[A, B] = Put(b, () => next)

  def map[A, B](f: A => B): SP[A, B] = Map(f)
  def mapExpr[A, B](f: A => B, e: Column => Column): SP[A, B] = Map(f, Some(e))
  def filter[A](p: A => Boolean): SP[A, A] = Filter(p)
  def filterExpr[A](p: A => Boolean, e: Column => Column): SP[A, A] = Filter(p, Some(e))
  def compose[A, B, C](sp1: SP[A, B], sp2: SP[B, C]): SP[A, C] = Compose(sp1, sp2)
  def alternate[A, B](sp1: SP[A, B], sp2: SP[A, B]): SP[A, B] = Alternate(sp1, sp2)
  def generate[A, B, S](body: S => (B, S), init: S): SP[A, B] = Generate(body, init)
  def bind[X, A, B](sp: SP[X, A], f: A => SP[X, B]): SP[X, B] = Bind(sp, f)

  /** Event-driven FSM sugar (reference design pattern P1, `src/lib.rs:81-129`,
    * `tests/events.rs:32-55`): Mealy transition emitting 0..n outputs per
    * input.
    *
    * Example (run verbatim by DocExamplesSpec): count consecutive 'x'
    * presses, emitting the run length at each 'end':
    * {{{
    * val counter = SP.fsm(0) { (n: Int, e: Char) =>
    *   if (e == 'x') (n + 1, Nil) else (0, Seq(n))
    * }
    * Interpreter.evalN(counter, "xx.x.".toSeq) == Vector(2, 1)
    * }}}
    */
  def fsm[S, A, B](state: S)(t: (S, A) => (S, Seq[B])): SP[A, B] =
    Get[A, B] { a =>
      val (s2, outs) = t(state, a)
      outs.foldRight(fsm(s2)(t))((b, rest) => Put(b, () => rest))
    }

  /** Rewrite the head of a term to `Get`/`Put` form, reproducing each
    * reference combinator's unfolding exactly. Loops until the head is
    * normal (Get/Put). */
  def step[A, B](sp: SP[A, B]): SP[A, B] = sp match {
    case g @ Get(_) => g
    case p @ Put(_, _) => p

    // combinators.rs:205-212
    case m @ Map(f, _) => Get((a: A) => Put(f(a), () => m))
    // combinators.rs:143-154
    case fl @ Filter(p, _) =>
      Get((a: A) =>
        if (p(a)) Put(a.asInstanceOf[B], () => fl) else fl)
    // combinators.rs:177-183: immediate body application, Put-loop
    case Generate(body, s) =>
      val (b, s2) = body(s)
      Put(b, () => Generate(body, s2))
    // combinators.rs:31-41
    case Alternate(sp1, sp2) =>
      step(sp1) match {
        case Get(f) => Get((a: A) => Alternate(f(a), sp2))
        case Put(b, l) => Put(b, () => Alternate(sp2, l()))
        case _ => throw new IllegalStateException("step returned non-normal form")
      }
    // combinators.rs:65-73: Put's value selects the continuation; lazy rest dropped
    case bi: Bind[_, _, _] =>
      val bind = bi.asInstanceOf[Bind[A, Any, B]]
      step(bind.sp) match {
        case Get(g) => Get((x: A) => Bind(g(x), bind.f))
        case Put(b, _) => step(bind.f(b))
        case _ => throw new IllegalStateException("step returned non-normal form")
      }
    // combinators.rs:97-121: construction-time Put/Get cancellation loop
    case co: Compose[_, _, _] =>
      val c = co.asInstanceOf[Compose[A, Any, B]]
      stepCompose(step(c.sp1), c.sp2)
  }

  /** Construction-time Put/Get cancellation, with one deliberate deviation
    * from the reference: sp2's pending `Put` is emitted *before* sp1 is
    * consulted (the reference checks sp1 first, `combinators.rs:102-106`, so
    * a ready output can hide behind a `Get` — indistinguishable over the
    * reference's infinite streams, but it would drop trailing outputs over
    * finite batch input). Eager emission yields the identical output
    * sequence on infinite streams and is lossless on finite ones — the same
    * "put is never blocked by input" principle the reference's own eval loop
    * documents (`src/lib.rs:256-260`). */
  private def stepCompose[A, M, C](sp1h: SP[A, M], sp2c: SP[M, C]): SP[A, C] = {
    var s1 = sp1h
    var s2 = step(sp2c)
    var out: SP[A, C] = null
    while (out == null) {
      (s1, s2) match {
        case (_, Put(c, l2)) =>
          val s1f = s1
          out = Put(c, () => Compose(s1f, l2()))
        case (Get(f), _) =>
          val s2f = s2
          out = Get((a: A) => Compose(f(a), s2f))
        case (Put(b, l1), Get(g)) =>
          s1 = step(l1())
          s2 = step(g(b))
        case _ => throw new IllegalStateException("step returned non-normal form")
      }
    }
    out
  }
}
