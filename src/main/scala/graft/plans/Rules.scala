package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{ArrayFilter, EqualTo, Expression, GreaterThan, GreaterThanOrEqual, LambdaFunction, LessThan, LessThanOrEqual, Levenshtein, Literal, NamedLambdaVariable, Not, StringSplit}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, Join, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Catalyst optimizer rule: rewrite threshold comparisons on the
  * UNBOUNDED Levenshtein into Spark's bounded three-argument form.
  *
  * `levenshtein(a, b) <= t` computes the full O(|a|·|b|) dynamic
  * program and then throws most of it away. Spark ships a banded
  * variant — `levenshtein(a, b, t)` walks only the 2t+1 diagonal band
  * (O(t·min(|a|,|b|))), early-exits on a length gap > t, and returns
  * -1 the moment the distance provably exceeds the bound — but only
  * callers who KNOW the idiom reach it ([[graft.dedup.FuzzyJoin]]
  * writes it by hand). This rule makes the fast form the PLAN for
  * everyone who writes the natural predicate:
  *
  *   lev(a,b) <= t   →  lev(a,b,t)   >= 0      (t >= 0)
  *   lev(a,b) <  t   →  lev(a,b,t-1) >= 0      (t >= 1)
  *   lev(a,b) >  t   →  lev(a,b,t)   == -1     (t >= 0)
  *   lev(a,b) >= t   →  lev(a,b,t-1) == -1     (t >= 1)
  *
  * (mirrored literal-first spellings too). Exact equivalences: the
  * bounded form returns the true distance when it is within the
  * bound, -1 strictly above it, and null exactly when the unbounded
  * form does — so null/three-valued filter semantics are untouched.
  * The rewrite only fires on a bare `Levenshtein` with NO threshold
  * and a non-negative integer literal bound, which also makes it
  * idempotent (the produced expression carries a threshold and can
  * never match again). Applied to Filter conditions and Join
  * conditions — the two places a distance predicate prunes rows.
  */
object BoundedLevenshtein extends Rule[LogicalPlan] {
  private def bounded(l: Levenshtein, t: Int): Expression =
    l.copy(threshold = Some(Literal(t)))

  private def rewrite(e: Expression): Expression = e match {
    // distance within bound: bounded form says "not exceeded"
    case LessThanOrEqual(l @ Levenshtein(_, _, None), Literal(t: Int, IntegerType))
        if t >= 0 => GreaterThanOrEqual(bounded(l, t), Literal(0))
    case GreaterThanOrEqual(Literal(t: Int, IntegerType), l @ Levenshtein(_, _, None))
        if t >= 0 => GreaterThanOrEqual(bounded(l, t), Literal(0))
    case LessThan(l @ Levenshtein(_, _, None), Literal(t: Int, IntegerType))
        if t >= 1 => GreaterThanOrEqual(bounded(l, t - 1), Literal(0))
    case GreaterThan(Literal(t: Int, IntegerType), l @ Levenshtein(_, _, None))
        if t >= 1 => GreaterThanOrEqual(bounded(l, t - 1), Literal(0))
    // distance beyond bound: bounded form's -1 sentinel
    case GreaterThan(l @ Levenshtein(_, _, None), Literal(t: Int, IntegerType))
        if t >= 0 => EqualTo(bounded(l, t), Literal(-1))
    case LessThan(Literal(t: Int, IntegerType), l @ Levenshtein(_, _, None))
        if t >= 0 => EqualTo(bounded(l, t), Literal(-1))
    case GreaterThanOrEqual(l @ Levenshtein(_, _, None), Literal(t: Int, IntegerType))
        if t >= 1 => EqualTo(bounded(l, t - 1), Literal(-1))
    case LessThanOrEqual(Literal(t: Int, IntegerType), l @ Levenshtein(_, _, None))
        if t >= 1 => EqualTo(bounded(l, t - 1), Literal(-1))
    case other => other.mapChildren(rewrite)
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case f @ Filter(cond, _) =>
      val r = rewrite(cond)
      if (r fastEquals cond) f else f.copy(condition = r)
    case j: Join if j.condition.isDefined =>
      val r = j.condition.map(rewrite)
      if (r.get fastEquals j.condition.get) j else j.copy(condition = r)
  }
}

/** Catalyst optimizer rule: substitute the canonical whitespace
  * tokenize HOF chain with the codegen'd kernel.
  *
  * The natural declarative spelling —
  * `filter(split(text, '\\s+'), t -> t <> '')` — runs INTERPRETED:
  * `ArrayFilter`/`ArrayTransform` have no codegen and re-enter the
  * expression interpreter per element, which measured seconds per
  * query in the similarity pipelines (see [[graft.functions.exprs]]).
  * [[graft.functions.WhitespaceTokens]] is the proven byte-level twin
  * (`ExprOps.wsTokens` documents the semantics proof: Java regex
  * `\s` = ASCII 0x09-0x0D + 0x20 exactly, leading/trailing empties
  * dropped by the filter) — one kernel call per row inside
  * whole-stage codegen. This rule performs the substitution in the
  * PLAN, so SQL users and DataFrame code that never heard of the
  * kernel get it anyway; graft's own operators call the kernel
  * directly and are untouched. Matches only the exact published
  * pattern (that regex literal, limit -1, `<> ''` lambda in either
  * operand order) — anything else is left alone. */
object WsTokensSubstitution extends Rule[LogicalPlan] {
  private def isEmptyLit(e: Expression): Boolean = e match {
    case Literal(s: UTF8String, StringType) => s.numChars() == 0
    case _ => false
  }

  private def dropsEmpties(lf: LambdaFunction): Boolean = lf match {
    case LambdaFunction(Not(EqualTo(v: NamedLambdaVariable, lit)),
        Seq(a: NamedLambdaVariable), _) =>
      v.exprId == a.exprId && isEmptyLit(lit)
    case LambdaFunction(Not(EqualTo(lit, v: NamedLambdaVariable)),
        Seq(a: NamedLambdaVariable), _) =>
      v.exprId == a.exprId && isEmptyLit(lit)
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case ArrayFilter(
          StringSplit(c, Literal(re: UTF8String, StringType),
            Literal(-1, IntegerType)),
          lf: LambdaFunction)
          if re.toString == "\\s+" && dropsEmpties(lf) =>
        graft.functions.WhitespaceTokens(c)
    }
}

/** Live-session installation for the graft optimizer rules (builder
  * `withExtensions` only applies at session CREATION; operators that
  * want their rewrite guaranteed call [[ensureRegistered]] instead —
  * idempotent, so every operator entry point can call it). */
object Rules {
  val all: Seq[Rule[LogicalPlan]] =
    Seq(BoundedLevenshtein, WsTokensSubstitution)

  def ensureRegistered(spark: SparkSession): Unit = synchronized {
    val missing = all.filterNot(spark.experimental.extraOptimizations.contains)
    if (missing.nonEmpty)
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations ++ missing
  }
}
