package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SparkSessionExtensions registering graft's custom expressions for SQL
  * use: `SparkSession.builder().withExtensions(new GraftExtensions)` or
  * `spark.sql.extensions=graft.plans.GraftExtensions`. The DataFrame API
  * (graft.plans.ArrayOps) does not require registration.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  import GraftExtensions._

  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectOptimizerRule(_ => WindowTopKRewrite)
    e.injectPlannerStrategy(_ => TopKPerKeyStrategy)
    e.injectPlannerStrategy(_ => AsOfJoinStrategy)
    e.injectFunction((FunctionIdentifier("graft_dot_f"),
      info("graft_dot_f", "dot product of two float arrays (double accumulation)"),
      (args: Seq[Expression]) => FloatArrayDot(args(0), args(1))))
    e.injectFunction((FunctionIdentifier("graft_dot_d"),
      info("graft_dot_d", "dot product of two double arrays"),
      (args: Seq[Expression]) => DoubleArrayDot(args(0), args(1))))
    e.injectFunction((FunctionIdentifier("graft_simhash64"),
      info("graft_simhash64", "64-bit simhash of a long-array of token hashes " +
        "(SQL form uses the default remix constants)"),
      (args: Seq[Expression]) => SimHash64(args(0),
        graft.operators.Dedup.SimhashA2, graft.operators.Dedup.SimhashB2,
        graft.operators.Dedup.SimhashA3, graft.operators.Dedup.SimhashB3,
        graft.functions.TextFunctions.HashP)))
  }
}

object GraftExtensions {
  private def info(name: String, usage: String): ExpressionInfo =
    new ExpressionInfo("graft", null, name, usage, "")
}
