package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.kg.expr.{functions, DotProduct, JaroWinkler, L2Norm}

/** `spark.sql.extensions` entry point (SURVEY.md §4: custom surface
  * registered via SparkSessionExtensions): a spark-submit user passes
  * `--conf spark.sql.extensions=graft.GraftExtensions` and gets the custom
  * scalar expressions in SQL on every session without calling
  * [[graft.kg.expr.functions.register]] by hand. Injects the SAME builders
  * as the FunctionRegistry path — one source of truth for each expression.
  * (`sign_bands` and `aho_matches` stay Column-API-only: their automaton /
  * plane-matrix arguments are constructor state, not expressions.)
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(clazz: Class[_], name: String) =
    new ExpressionInfo(clazz.getCanonicalName, name)

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((FunctionIdentifier("jaro_winkler"),
      info(classOf[JaroWinkler], "jaro_winkler"),
      (es: Seq[Expression]) => { functions.requireArity("jaro_winkler", es, 2)
        JaroWinkler(es.head, es(1)) }))
    ext.injectFunction((FunctionIdentifier("dot_product"),
      info(classOf[DotProduct], "dot_product"),
      (es: Seq[Expression]) => { functions.requireArity("dot_product", es, 2)
        DotProduct(es.head, es(1)) }))
    ext.injectFunction((FunctionIdentifier("l2_norm"),
      info(classOf[L2Norm], "l2_norm"),
      (es: Seq[Expression]) => { functions.requireArity("l2_norm", es, 1)
        L2Norm(es.head) }))
  }
}
