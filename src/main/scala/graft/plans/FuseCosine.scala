package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType, FloatType}

/** Optimizer rule: rewrite the PORTABLE composed-cosine recipe
  *
  *   aggregate(zip_with(a, b, (x,y) -> double(x)*double(y)), 0.0, +)
  *     / sqrt(«same fold»(a,a) * «same fold»(b,b))
  *
  * into the fused codegen'd [[CosineSimilarity]] — one array walk
  * instead of three and no intermediate product arrays. The numerics
  * are bit-identical by construction (PlansSpec pins it), so on the
  * engine's embedding contract the rewrite is invisible in results.
  *
  * OPT-IN via `spark.graft.fuseCosine=true` (default off), because on
  * RAGGED inputs the two forms differ deliberately: zip_with pads the
  * shorter array with nulls, so the composed fold returns NULL for a
  * length mismatch, while CosineSimilarity folds the common prefix.
  * Fixed-dimension embedding columns — the precondition every
  * SimSearch/ProductQuant operator already states — make the forms
  * equivalent; the flag is the user asserting that precondition.
  * FuseCosineSpec pins BOTH the rewrite firing and the ragged-input
  * divergence that justifies the flag.
  *
  * This completes the engine's extension-hook portfolio alongside the
  * custom expressions (cosine_sim, minhash_sig) and the whole-operator
  * as-of plan: expression → rule → strategy, each earned by a concrete
  * measured or structural gap.
  *
  * WHEN IT PAYS (measured, tools/FuseProbe, BASELINE.md round-11
  * rows): 21× on a 5M-pair pure scoring product and 55× at 20M pairs
  * — the gap WIDENS with the product size — and ~10× through the q19
  * top-k window shape at both scales. Arm the flag whenever a
  * composed cosine sits in a pair-product hot path and the fixed-dim
  * precondition holds; the rewrite is never a regression there, since
  * the fused expression does strictly less work per pair (one array
  * walk, no intermediate arrays).
  */
object FuseCosine extends Rule[LogicalPlan] {

  /** aggregate(zip_with(x, y, (p,q) -> double(p)*double(q)), 0.0, +, id) */
  private object DotFold {
    def unapply(e: Expression): Option[(Expression, Expression)] = e match {
      case ArrayAggregate(
          ZipWith(x, y, LambdaFunction(
            Multiply(Cast(p: NamedLambdaVariable, DoubleType, _, _),
              Cast(q: NamedLambdaVariable, DoubleType, _, _), _), Seq(p1, q1), _)),
          Literal(zero, DoubleType),
          LambdaFunction(Add(l: NamedLambdaVariable, r: NamedLambdaVariable, _), Seq(l1, r1), _),
          LambdaFunction(fin: NamedLambdaVariable, Seq(fin1), _))
        if zero == 0.0d &&
          p.exprId == named(p1).exprId && q.exprId == named(q1).exprId &&
          l.exprId == named(l1).exprId && r.exprId == named(r1).exprId &&
          fin.exprId == named(fin1).exprId =>
        Some((x, y))
      case _ => None
    }
    private def named(n: NamedExpression): NamedExpression = n
  }

  private def isFloatArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!conf.getConfString("spark.graft.fuseCosine", "false").toBoolean) return plan
    plan.transformAllExpressions {
      case Divide(DotFold(a, b),
          Sqrt(Multiply(DotFold(a1, a2), DotFold(b1, b2), _)), _)
        if a.semanticEquals(a1) && a1.semanticEquals(a2) &&
          b.semanticEquals(b1) && b1.semanticEquals(b2) &&
          isFloatArray(a) && isFloatArray(b) =>
        CosineSimilarity(a, b)
    }
  }

  /** Idempotently install on an existing session (the configured path
    * is GraftExtensions via spark.sql.extensions).
    */
  def install(spark: SparkSession): Unit = synchronized {
    if (!spark.experimental.extraOptimizations.contains(FuseCosine))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ FuseCosine
  }
}
