package graft.plans

import org.apache.spark.sql.SparkSessionExtensions

/** Builder-time registration of the graft Catalyst surface — the
  * `SparkSessionExtensions` injection point, so a deployment enables the
  * whole-operator extension with configuration instead of code:
  *
  * {{{
  * spark-submit --conf spark.sql.extensions=graft.plans.GraftExtensions ...
  * // or in code, before the session exists:
  * SparkSession.builder().withExtensions(new GraftExtensions) ...
  * }}}
  *
  * Injects the [[TopKPerKeyStrategy]] planner strategy and the
  * [[PushFilterThroughTopK]] optimizer rule (filter pushdown + column
  * pruning through [[TopKPerKeyNode]]). Sessions created without it still
  * work: `TopKPerKey.apply` falls back to the runtime
  * `experimental.extraStrategies` path idempotently.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(extensions: SparkSessionExtensions): Unit = {
    extensions.injectPlannerStrategy(_ => TopKPerKeyStrategy)
    extensions.injectOptimizerRule(_ => PushFilterThroughTopK)
  }
}
