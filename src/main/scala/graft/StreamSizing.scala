package graft

import org.apache.spark.sql.SparkSession

/** Scale-adaptive sizing for micro-batch state shards (r20, optimization
  * guide §2: derive partitioning from input size rather than a constant
  * tuned for one scale).
  *
  * Stateful streaming operators shard their state store by the
  * shuffle-partition count in effect when the query STARTS, and every
  * shard pays per-batch state-checkpoint I/O whether or not it holds rows
  * (a stream-stream join carries 4 stores per shard). A constant shard
  * count is therefore wrong at both ends: too many shards and a
  * fixture-scale replay spends its time checkpointing empty stores
  * (measured at sf0.1/32 cores: the q143 semi-join replay runs 7.7 s at
  * 32 shards, 2.7 s at 8, 2.0 s at 2 — same result), too few and a
  * production stream serializes its per-batch compute. Deriving the count
  * from the source's BYTES gives one knob that lands right at every
  * scale: one shard per ~32 MB of source, floor 2 (never serial), capped
  * at the session's parallelism (state shards beyond the core count buy
  * nothing locally). At 100 TB the byte term saturates the cap and the
  * cap itself (cluster parallelism) is the real sizing knob — exactly the
  * production discipline.
  */
object StreamSizing {

  /** One state shard per this many source bytes. */
  private val BytesPerShard: Long = 32L << 20

  /** Total bytes under `path` (file or directory, any Hadoop FS). */
  def pathBytes(s: SparkSession, path: String): Long = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(s.sessionState.newHadoopConf())
    if (!fs.exists(p)) 0L
    else fs.getContentSummary(p).getLength
  }

  /** State-shard count for a streaming query whose source is `paths`. */
  def shards(s: SparkSession, paths: String*): Int = {
    val bytes = paths.map(pathBytes(s, _)).sum
    val byBytes = math.max(2L, (bytes + BytesPerShard - 1L) / BytesPerShard)
    math.min(byBytes, math.max(2, s.sparkContext.defaultParallelism).toLong)
      .toInt
  }
}
