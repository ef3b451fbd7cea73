package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Expression-level LET BINDING: evaluate `bound` ONCE and reference it
  * many times inside `body`.
  *
  * Spark has no let construct, and referencing a Column twice inlines
  * its whole tree per reference — catastrophic inside array lambdas,
  * which are interpreted and re-evaluate the copied tree PER ELEMENT
  * (measured 20–40× on langId / quantizeStats before this idiom). The
  * trick: a single-element `transform` binds the value as a lambda
  * variable, which Catalyst evaluates exactly once:
  *
  * {{{
  *   Let.bind(expensive) { v => f(v) + g(v) }   // expensive evals once
  * }}}
  *
  * Bind several values at once by passing a `struct(...)` and reading
  * fields off the bound variable. CollapseProject also refuses to
  * duplicate the resulting non-cheap tree across projection fields, so
  * a bound struct column can be unpacked in a later select safely.
  *
  * WHEN NOT TO USE: the binding itself is a higher-order function, and
  * Spark evaluates HOFs INTERPRETED — so wrapping a cheap tree in a
  * plain row-level (codegen'd) context pulls the whole body out of
  * whole-stage codegen. Measured: the bloom probe paid ~0.9 s over 6M
  * rows for let-binding one xxhash64; inlining it twice was ~free.
  * Bind only when the body ALREADY lives in interpreted HOF land
  * (array lambdas) or the bound tree is expensive enough (a parse, a
  * scan over an array) that one interpreted evaluation beats N
  * codegen'd ones.
  */
object Let {
  def bind(bound: Column)(body: Column => Column): Column =
    element_at(transform(array(bound), body), 1)
}
