package graft

import org.apache.spark.storage.StorageLevel

/** PersistScope ownership: a scope only claims plans it actually
  * persisted, so closing scope B never evicts a plan scope A still owns
  * (CacheManager matches by logical plan, not DataFrame identity). */
class PersistScopeSpec extends SparkSpec {
  import spark.implicits._

  test("cache persists fresh plans and close releases them") {
    val scope = PersistScope()
    val df = scope.cache(Seq(1, 2, 3).toDF("x").filter($"x" > 1))
    assert(df.storageLevel != StorageLevel.NONE)
    scope.close()
    assert(df.storageLevel == StorageLevel.NONE)
  }

  test("a second scope over an already-cached plan does not steal ownership") {
    val a = PersistScope()
    val base = Seq(1, 2, 3, 4).toDF("x").filter($"x" % 2 === 0)
    val owned = a.cache(base)
    owned.count()
    // same PLAN, different DataFrame: CacheManager would warn + no-op on
    // re-persist; the scope must not register it either
    val twin = Seq(1, 2, 3, 4).toDF("x").filter($"x" % 2 === 0)
    val b = PersistScope()
    b.cache(twin)
    b.close() // must NOT evict a's cache
    assert(owned.storageLevel != StorageLevel.NONE,
      "closing the non-owner scope evicted the first owner's cache")
    a.close()
    assert(owned.storageLevel == StorageLevel.NONE)
  }
}
