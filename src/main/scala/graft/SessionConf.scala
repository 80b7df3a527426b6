package graft

import org.apache.spark.sql.SparkSession

/** The ONE session configuration every graft entry point shares (Bench,
  * Verify, Profile, PlanDump, the probes). Factored so a config that
  * changes how plans execute — notably the AQE cached-plan output
  * partitioning rule — can never drift between the bench and the other
  * harnesses: round 9 added it to Bench only, so Profile/PlanDump captured
  * plans the bench did not actually run (the round-9 advisory).
  *
  * Master and shuffle-partition width stay caller-owned ([[Bench]] wires
  * `SPARK_GRAFT_CPUS` into both per the driver contract). */
object SessionConf {
  def common(b: SparkSession.Builder): SparkSession.Builder = b
    .config("spark.sql.adaptive.enabled", "true")
    // Cached/checkpointed frames otherwise keep the configured shuffle
    // width forever: every per-iteration scan of a small cached support
    // table pays one task per configured partition regardless of size.
    // Letting AQE re-plan the cached plan's output partitioning sizes
    // those scans by bytes — size-adaptive at ANY scale (guide §2).
    // Measured round 9 at sf0.1: q48 884->47 tasks, full suite
    // 186.2->137.9 s on the same host.
    .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true") // events.ts
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
}
