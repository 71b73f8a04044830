package org.apache.spark.sql

import org.apache.spark.sql.catalyst.analysis.SimpleFunctionRegistry

/**
 * Test-only bridge: `SparkSessionExtensions.registerFunctions` is
 * `private[sql]`, and `spark.sql.extensions` is a STATIC conf that only
 * applies to the first SparkContext of the JVM — so an in-suite session
 * can never exercise the config path. This probe applies an extensions
 * object to a fresh registry exactly the way session building does.
 */
object GraftExtensionsProbe {
  def injectedFunctionNames(f: SparkSessionExtensions => Unit)
      : Seq[String] = {
    val ext = new SparkSessionExtensions
    f(ext)
    val reg = new SimpleFunctionRegistry
    ext.registerFunctions(reg)
    reg.listFunction().map(_.funcName)
  }
}
