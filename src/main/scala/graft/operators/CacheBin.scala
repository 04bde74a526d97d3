package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/**
 * Registry for RETURN-PATH persisted frames — caches that are part of
 * a returned lazy plan and therefore cannot be unpersisted inside the
 * operator that created them (the consuming action happens at the
 * caller, after the operator returns).
 *
 * Operators whose cached frame is consumed INSIDE the operator
 * (tokenizer fit loops, winnowing) keep their local
 * try/finally-unpersist; everything else routes its persist through
 * [[track]] so a long-lived session (the 237-query bench sweep, or a
 * service embedding these operators) can reclaim cached AND
 * disk-spilled blocks between jobs with [[releaseAll]] — memory
 * blocks evict LRU on pressure, but disk-spilled blocks otherwise
 * accumulate until the SparkContext stops.
 *
 * Call [[releaseAll]] AFTER the consuming action (collect/write) of
 * the frame that embeds the cache, never between plan construction
 * and the action. For most frames an early release is merely a
 * performance loss (the plan recomputes), but for frames whose plan
 * embeds NONDETERMINISTIC partitioning — [[Prefix.running]]'s
 * range-sampled `_pid` — it is a correctness hazard: once released,
 * each downstream branch of a self-join re-samples `_pid`
 * independently, which is exactly the branch-divergent-sampling bug
 * the persist exists to pin (see Prefix.running's scaladoc). Drain
 * only at quiescent points where no returned plan is still pending
 * an action. `graft.Verify` and `graft.Bench` drain the bin after
 * each query's consuming action.
 */
object CacheBin {

  private val bin =
    new java.util.concurrent.ConcurrentLinkedQueue[DataFrame]()

  /** Persist `df` at `level` and register it for a later
    * [[releaseAll]]. Returns the persisted frame. */
  def track(df: DataFrame,
      level: StorageLevel = StorageLevel.MEMORY_AND_DISK): DataFrame = {
    val p = df.persist(level)
    bin.add(p)
    p
  }

  /** Chain-suffix form of [[track]]:
    * `df.transform(...).tracked()` ≡ `CacheBin.track(df.transform(...))`. */
  implicit class TrackOps(private val df: DataFrame) extends AnyVal {
    def tracked(
        level: StorageLevel = StorageLevel.MEMORY_AND_DISK): DataFrame =
      track(df, level)
  }

  /** True if any frame is currently tracked — i.e. the last query
    * built return-path pins. Bench uses this to decide whether a
    * warm re-run is meaningful (see Bench.timeOnce). */
  def nonEmpty: Boolean = !bin.isEmpty

  /** Unpersist (non-blocking) every tracked frame and empty the bin.
    * Safe to call at any quiescent point; idempotent. */
  def releaseAll(): Unit = {
    var df = bin.poll()
    while (df != null) {
      df.unpersist(blocking = false)
      df = bin.poll()
    }
  }
}
