package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/**
 * Installable Catalyst extension point: build a session with
 *
 * {{{
 *   spark-submit --conf spark.sql.extensions=graft.plans.GraftExtensions …
 * }}}
 *
 * and every graft native function (`graft_cosine`, `graft_minhash`,
 * `graft_simhash`, `graft_shingles`, `graft_hyperplane_bucket`) is
 * available in SQL and `call_function` on EVERY session of the
 * application — no per-session [[NativeFunctions.register]] call. This
 * is the standard packaging path for a Spark-native library (the same
 * mechanism Delta/Iceberg use to install their functions and rules), and
 * the right deployment story for a 1000-executor cluster where sessions
 * are created by platform tooling, not user code.
 *
 * NOTE: `spark.sql.extensions` is a STATIC conf — it must be set before
 * the application's first SparkContext is created (spark-submit --conf /
 * spark-defaults); setting it on a later builder is silently ignored.
 * In-JVM callers that already hold a session use
 * [[NativeFunctions.register]] instead.
 */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    NativeFunctions.builders.foreach { case (name, builder) =>
      ext.injectFunction((FunctionIdentifier(name),
        new ExpressionInfo(classOf[GraftExtensions].getName, name),
        builder))
    }
}
