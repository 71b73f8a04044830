package graft.streaming

/**
 * Shared replay-safe partition-key scheme for foreachBatch monitors
 * ([[FrequencyMonitor]], [[QualityMonitor]]): `md5(checkpointDir)_epoch`.
 * Deterministic under replay (an epoch re-run overwrites its own
 * partition as an idempotent re-do), and the checkpoint-identity
 * prefix keeps a DIFFERENT checkpoint lineage sharing the output
 * directory from clobbering this one's partitions. The `_` pins
 * partition-column inference to string (an all-digit hex prefix would
 * otherwise read back as a number). One scheme, one place — monitors
 * must agree on partition identity.
 *
 * What it does NOT protect: resetting the SAME checkpoint path keeps
 * the same prefix while epochs restart at 0, so stale higher-epoch
 * partitions from the old lineage survive beside the new epoch 0 —
 * use a fresh output directory with a fresh checkpoint (the
 * one-log-per-lineage contract both monitors document).
 */
private[streaming] object BatchKeys {

  /** Checkpoint-lineage prefix: lowercase md5 hex of the path. */
  def lineageKey(checkpointDir: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(checkpointDir.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  /** Full partition value for one micro-batch. */
  def batchKey(lineage: String, epoch: Long): String =
    s"${lineage}_$epoch"
}
