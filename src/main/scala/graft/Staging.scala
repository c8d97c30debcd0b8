package graft

import org.apache.spark.sql.DataFrame

/** Uniform lineage-truncation gate for lazily-returned, reused frames.
  *
  * Operators that return a frame the caller will read several times
  * (shingle tables, signature tables, IRLS working sets, compressed
  * cells) truncate lineage so re-reads don't re-run the upstream plan.
  * HOW they truncate is a deployment decision, not an operator decision:
  *
  *   - single-node / ephemeral runs: `localCheckpoint(eager = false)` —
  *     blocks persist executor-locally during the first materialization,
  *     zero extra jobs;
  *   - long multi-executor jobs: a RELIABLE `checkpoint(eager = false)`
  *     into the configured checkpoint dir — localCheckpoint blocks die
  *     with their executor and have no lineage to recompute from, so
  *     executor loss (routine preemption at 1000-executor scale) would
  *     otherwise kill the job.
  *
  * `spark.graft.checkpointMode` selects the policy for EVERY staged frame
  * in the library (the same gate `Dedup.duplicateClusters` applies to its
  * eager truncations):
  *
  *   - `auto` (default): reliable when `sc.setCheckpointDir` has been
  *     called, local otherwise — configuring a checkpoint dir IS the
  *     opt-in to cluster-safe staging;
  *   - `local` / `reliable`: force one policy (reliable requires the dir);
  *   - `off`: no truncation — callers re-run upstream plans on re-read
  *     (debugging aid; also avoids all checkpoint-block lifecycle, e.g.
  *     the context-cleaner/stage-metrics accumulator race on teardown).
  */
object Staging {

  def stage(df: DataFrame): DataFrame = {
    val session = df.sparkSession
    val mode = session.conf.get("spark.graft.checkpointMode", "auto")
    val hasDir = session.sparkContext.getCheckpointDir.isDefined
    mode match {
      case "off" => df
      case "local" => df.localCheckpoint(eager = false)
      case "reliable" =>
        require(hasDir,
          "spark.graft.checkpointMode=reliable requires sc.setCheckpointDir(...)")
        df.checkpoint(eager = false)
      case "auto" =>
        if (hasDir) df.checkpoint(eager = false)
        else df.localCheckpoint(eager = false)
      case other =>
        throw new IllegalArgumentException(
          s"unknown spark.graft.checkpointMode '$other' " +
            "(expected auto | local | reliable | off)")
    }
  }

  /** `df.staged` — drop-in for `df.localCheckpoint(false)` call sites. */
  implicit class StagedFrame(private val df: DataFrame) extends AnyVal {
    def staged: DataFrame = stage(df)
  }
}
