package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** Idempotent session-scoped persist for the memoized shared frames
  * (shingle pipeline, LM frame, NB counts, curation postings, ...).
  *
  * The memoization helpers rebuild their plan on every call and rely on
  * CacheManager plan-equality to resolve to the one cached copy — but a
  * bare `.persist()` on an already-registered plan logs
  * `CacheManager: Asked to cache already cached data` per call, and a
  * full Verify/Bench loop emits dozens of them, drowning real warnings
  * in the driver tail. `Dataset.storageLevel` performs the same
  * plan-equality CacheManager lookup, so checking it first makes the
  * re-persist a silent no-op while keeping the memoization contract
  * (first caller registers, everyone else resolves).
  */
object Memo {
  /** Check-then-persist under one lock: two threads warming the same
    * shared frame concurrently could both observe StorageLevel.NONE and
    * both persist — reintroducing the very warning this helper
    * silences. Verify/Bench drive queries single-threaded today, but
    * the idempotence contract shouldn't depend on that; the lock is a
    * driver-side metadata operation (CacheManager lookup + register),
    * never held across a job.
    */
  def cached(df: DataFrame): DataFrame = synchronized {
    if (df.storageLevel == StorageLevel.NONE)
      df.persist(StorageLevel.MEMORY_AND_DISK)
    else df
  }
}
