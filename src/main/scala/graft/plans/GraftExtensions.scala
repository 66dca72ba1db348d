package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Session extension registering the library's native expressions, enabled
  * with `spark.sql.extensions=graft.plans.GraftExtensions` (wired by
  * [[graft.Sessions.builder]]). After registration the expressions are
  * callable from SQL and via `functions.call_function`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.functions.foreach(ext.injectFunction)
}

object GraftExtensions {
  type Builder = Seq[Expression] => Expression

  /** Whether the graft functions are registered in THIS session's registry.
    * Dispatch must key on the session that will analyze the plan (the
    * DataFrame's own), not `getActiveSession` — with two sessions in one
    * JVM the thread-active one can differ from the one resolving the query.
    */
  def available(spark: org.apache.spark.sql.SparkSession): Boolean =
    spark.sessionState.functionRegistry.functionExists(FunctionIdentifier("graft_qdot"))

  val functions: Seq[(FunctionIdentifier, ExpressionInfo, Builder)] = Seq(
    (FunctionIdentifier("graft_qdot"),
      new ExpressionInfo(classOf[LongDotProduct].getName, "graft_qdot"),
      (children: Seq[Expression]) => LongDotProduct(children.head, children(1))),
    (FunctionIdentifier("graft_simhash"),
      new ExpressionInfo(classOf[SimHash64].getName, "graft_simhash"),
      (children: Seq[Expression]) => SimHash64(children.head)),
    (FunctionIdentifier("graft_minhash"),
      new ExpressionInfo(classOf[MinHashSig].getName, "graft_minhash"),
      (children: Seq[Expression]) => {
        val k = children(1) match {
          case e if e.foldable => e.eval(null) match {
            case i: Int  => i
            case l: Long => l.toInt
            case other   => sys.error(s"graft_minhash k must be an int literal, got $other")
          }
          case _ => sys.error("graft_minhash k must be a literal")
        }
        MinHashSig(children.head, k)
      }),
    (FunctionIdentifier("graft_rhp_sig"),
      new ExpressionInfo(classOf[RhpSig].getName, "graft_rhp_sig"),
      (children: Seq[Expression]) => {
        val planes = children(1) match {
          case e if e.foldable => e.eval(null) match {
            case i: Int  => i
            case l: Long => l.toInt
            case other   => sys.error(s"graft_rhp_sig planes must be an int literal, got $other")
          }
          case _ => sys.error("graft_rhp_sig planes must be a literal")
        }
        RhpSig(children.head, planes)
      }))
}
