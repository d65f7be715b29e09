package graft

import org.apache.spark.sql.DataFrame
import scala.collection.mutable

/** Tracks persisted intermediate relations so callers can release them once
  * the terminal action has run. Operators that must persist shared
  * sub-relations (e.g. the exploded shingle index consumed by both sides of
  * a self-join) register them here instead of leaking cached partitions in
  * long-lived sessions.
  *
  * Contract: the DataFrame an operator returns references the cached
  * blocks — call `close()` only AFTER consuming the result (write/collect).
  * The default scope passed by convenience overloads is never closed, which
  * reproduces plain `.persist()` semantics (GC-based cleanup).
  */
final class PersistScope {
  private val dfs = mutable.Buffer[DataFrame]()

  /** Persist `df` and register it for [[close]]. If the plan is ALREADY
    * cached (CacheManager matches by logical plan, so a different
    * DataFrame over the same plan counts — e.g. two operators in one
    * query sharing a sub-relation, or a bench pass re-running a query),
    * this scope does NOT claim it: re-persisting would only log
    * CacheManager's "already cached" warning, and unpersisting it at
    * close() would pull the cache out from under the first owner.
    *
    * Hazard under CONCURRENT scopes (correctness-safe, perf cliff): the
    * guard makes ownership first-persist-wins, so if the owning scope
    * closes while a non-owning caller's job is mid-flight, the cache
    * vanishes and that job recomputes the plan. Callers chaining
    * prefix-sum passes over one relation (e.g. interleaveBySource)
    * should share a single scope for the chain rather than nest one
    * scope per pass. */
  def cache(df: DataFrame): DataFrame =
    if (df.storageLevel != org.apache.spark.storage.StorageLevel.NONE) df
    else { dfs += df; df.persist() }

  def close(): Unit = { dfs.foreach(_.unpersist(blocking = false)); dfs.clear() }
}

object PersistScope {
  def apply(): PersistScope = new PersistScope
}
