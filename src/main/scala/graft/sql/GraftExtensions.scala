package graft.sql

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, ExpressionInfo, Literal, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType}

import graft.functions.Gmf

/** Primitive-signature GMF evaluator referenced from generated code —
  * avoids Function3 boxing so the call JIT-inlines inside the codegen'd
  * projection loop.
  */
abstract class ScalarGmf extends Serializable {
  def eval(inc: Double, wspd: Double, phi: Double): Double
}

/** Native Catalyst expression for a GMF: participates in whole-stage
  * codegen via doGenCode (SURVEY.md §7.3 "stretch: Catalyst Expression
  * w/ codegen" — the numba-`@vectorize` analogue, gmfs.py:209-214).
  */
case class GmfExpression(fn: ScalarGmf, fnName: String,
    first: Expression, second: Expression, third: Expression)
  extends TernaryExpression {

  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = fnName

  override protected def nullSafeEval(i: Any, w: Any, p: Any): Any =
    fn.eval(i.asInstanceOf[Double], w.asInstanceOf[Double], p.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("gmfFn", fn, classOf[ScalarGmf].getName)
    defineCodeGen(ctx, ev, (i, w, p) => s"$ref.eval($i, $w, $p)")
  }

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): Expression =
    copy(first = newFirst, second = newSecond, third = newThird)
}

/** Session extensions: every registered model becomes a SQL-callable scalar
  * (`SELECT gmf_cmod5n(inc, wspd, phi) FROM scene`) backed by the codegen
  * expression — the sql/ surface of SURVEY.md §7.1. Two-argument crosspol
  * GMFs accept and ignore phi like the reference (gmfs.py:137-158).
  *
  * Activate via `spark.sql.extensions=graft.sql.GraftExtensions` (set by
  * GraftSession) or `builder.withExtensions(new GraftExtensions)`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private val scalarFns: Seq[(String, ScalarGmf)] = Seq(
    "gmf_cmod5" -> fn3(Gmf.cmod5),
    "gmf_cmod5n" -> fn3(Gmf.cmod5n),
    "gmf_cmod5n_pr_zhangA" -> fn3(Gmf.cmod5nPrZhangA),
    "gmf_cmod5n_pr_mouche1" -> fn3(Gmf.cmod5nPrMouche1),
    "gmf_cmodifr2" -> fn3(Gmf.cmodifr2),
    "gmf_rs2_v2" -> fn2(Gmf.rs2V2),
    "gmf_s1_v2" -> fn2(Gmf.s1V2),
    "gmf_rcm_noaa" -> fn2(Gmf.rcmNoaa),
    "gmf_s1_v3_ew_rec" -> fn2(Gmf.s1V3EwRec),
    "gmf_rs2_v3" -> fn2(Gmf.rs2V3),
    "gmf_rcm_v3" -> fn2(Gmf.rcmV3),
    "gmf_rcm_v4" -> fn2(Gmf.rcmV4),
    "gmf_rs2_v4" -> fn2(Gmf.rs2V4),
    "gmf_dummy" -> fn2(Gmf.dummy))

  private def fn3(f: (Double, Double, Double) => Double): ScalarGmf = new ScalarGmf {
    def eval(i: Double, w: Double, p: Double): Double = f(i, w, p)
  }
  private def fn2(f: (Double, Double) => Double): ScalarGmf = new ScalarGmf {
    def eval(i: Double, w: Double, p: Double): Double = f(i, w)
  }

  override def apply(ext: SparkSessionExtensions): Unit = {
    scalarFns.foreach { case (name, fn) =>
      ext.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo("graft.sql.GmfExpression", name),
        (args: Seq[Expression]) => {
          def d(e: Expression) = Cast(e, DoubleType)
          args match {
            case Seq(i, w) => GmfExpression(fn, name, d(i), d(w), Literal(0.0))
            case Seq(i, w, p) => GmfExpression(fn, name, d(i), d(w), d(p))
            case other =>
              throw new IllegalArgumentException(
                s"$name expects (inc, wspd[, phi]), got ${other.length} args")
          }
        }))
    }
  }
}
