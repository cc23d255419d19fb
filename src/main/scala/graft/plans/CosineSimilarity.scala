package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Codegen'd cosine similarity over two float-array columns.
  *
  * One fused loop computes dot product and both norms (the composed
  * zip_with/aggregate formulation walks the arrays three times and
  * materializes an intermediate array). Numerics are IDENTICAL to the
  * portable fold recipe (SimSearch.dotD): each product in double
  * (float->double is exact), sequential left-to-right accumulation into
  * separate accumulators, cosine = dot / sqrt(na*nb) — so swapping one
  * for the other cannot change a single output bit (asserted in
  * PlansSpec).
  *
  * The engine carries exactly TWO custom Catalyst expressions — this
  * and [[MinhashSignature]] — each earned by a measured failure of the
  * composed-builtin form (three array walks here; multiplicative
  * re-hashing there). Everything else uses built-ins, which get
  * Catalyst's own optimizations for free. The preference order
  * (compose built-ins > custom Expression > custom operator >
  * mapPartitions) is applied, not just cited.
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(FloatType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two array<float> arguments, " +
          s"got ${left.dataType.simpleString} and ${right.dataType.simpleString}")
    }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "cosine_sim"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val (x, y) = (a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val xv = x.getFloat(i).toDouble
      val yv = y.getFloat(i).toDouble
      dot += xv * yv; na += xv * xv; nb += yv * yv
      i += 1
    }
    dot / math.sqrt(na * nb)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val (n, i, dot, na, nb, xv, yv) = (
        ctx.freshName("n"), ctx.freshName("i"), ctx.freshName("dot"),
        ctx.freshName("na"), ctx.freshName("nb"), ctx.freshName("xv"), ctx.freshName("yv"))
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $xv = (double) $a.getFloat($i);
         |  double $yv = (double) $b.getFloat($i);
         |  $dot += $xv * $yv; $na += $xv * $xv; $nb += $yv * $yv;
         |}
         |${ev.value} = $dot / java.lang.Math.sqrt($na * $nb);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object CosineSimilarity {
  val fnName = "cosine_sim"

  private def builder(children: Seq[Expression]): Expression = {
    require(children.length == 2, s"$fnName expects 2 arguments")
    CosineSimilarity(children.head, children(1))
  }

  private def info: ExpressionInfo = new ExpressionInfo(
    classOf[CosineSimilarity].getName, fnName)

  /** Session-local registration (tests, ad-hoc sessions). */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier(fnName), info, builder _)
}

/** `--conf spark.sql.extensions=graft.plans.GraftExtensions` installs the
  * engine's SQL surface additions into every session.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier(CosineSimilarity.fnName),
      new ExpressionInfo(classOf[CosineSimilarity].getName, CosineSimilarity.fnName),
      (children: Seq[Expression]) => CosineSimilarity(children.head, children(1))))
    ext.injectFunction((
      FunctionIdentifier(MinhashSignature.fnName),
      new ExpressionInfo(classOf[MinhashSignature].getName, MinhashSignature.fnName),
      MinhashSignature.sqlBuilder))
    ext.injectPlannerStrategy(_ => AsofJoinStrategy)
    ext.injectOptimizerRule(_ => FuseCosine)
  }
}
