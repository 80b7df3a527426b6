package graft.dsl

/** Reference interpreter — the executable oracle for REF-parity tests and
  * the per-key execution engine of [[Compiler]]'s stateful fallback.
  *
  * Port of `StreamProcessor::eval` (reference `src/lib.rs:249-285`).
  * The reference's loop is about *when the input tail is forced* (so `Put`
  * output never blocks on a blocking `tail()`); observationally each `Get`
  * consumes the next input element in order, so over finite batch input the
  * iterator-pull formulation below is behaviorally identical. Output is a
  * LazyList: `Put`-only loops (generators) still produce — callers take
  * finite prefixes, exactly like the reference's lazy `InfiniteList`.
  * Input exhaustion while `Get`ting ends the output stream (the batch
  * analogue of "nobody sends more elements").
  */
object Interpreter {

  def eval[A, B](sp0: SP[A, B], in: Iterator[A]): LazyList[B] = {
    // trampoline consecutive Gets (reference src/lib.rs:253-256)
    var sp = SP.step(sp0)
    while (sp.isInstanceOf[SP.Get[A, B]]) {
      if (!in.hasNext) return LazyList.empty
      sp = SP.step(sp.asInstanceOf[SP.Get[A, B]].f(in.next()))
    }
    val SP.Put(b, next) = sp: @unchecked
    b #:: eval(next(), in)
  }

  /** Convenience: evaluate over a finite input, taking at most `max`
    * outputs (guards Put-only loops).
    *
    * Example (run verbatim by DocExamplesSpec): a fused map∘filter pipeline
    * and a Put-only generator:
    * {{{
    * val evens = SP.compose(SP.filter((n: Int) => n % 2 == 0), SP.map((n: Int) => n * 10))
    * Interpreter.evalN(evens, Seq(1, 2, 3, 4)) == Vector(20, 40)
    *
    * val fib = SP.generate[Unit, Long, (Long, Long)](s => (s._1, (s._2, s._1 + s._2)), (0L, 1L))
    * Interpreter.evalN(fib, Seq.empty[Unit], max = 6) == Vector(0L, 1L, 1L, 2L, 3L, 5L)
    * }}}
    */
  def evalN[A, B](sp: SP[A, B], input: Seq[A], max: Int = Int.MaxValue): Vector[B] =
    eval(sp, input.iterator).take(max).toVector
}
