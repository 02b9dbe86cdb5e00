package graft.queries

import org.apache.spark.sql.SparkSession

/** Per-SparkSession memoization for query builders that cache
  * session-owned state (Catalogs holding localCheckpoint-pinned relations,
  * temp views).
  *
  * Keying such caches by `System.identityHashCode(spark)` is wrong twice
  * (ADVICE r8): identity hashes can collide after the original session is
  * GC'd — a NEW session landing on a reused hash would be served a Catalog
  * whose pinned relations belong to a dead session and fail at query time —
  * and the entries never evict. A WeakHashMap keyed by the session object
  * itself is identity-correct by construction (reference equality, no
  * collision possible) and drops each per-session cache when the session
  * is collected.
  *
  * The map access is synchronized; `build` runs INSIDE the lock, so two
  * threads asking for the same key build once. Builders must not block on
  * another thread's memo call (none do — each builds a self-contained
  * Catalog); same-thread nesting is safe (JVM monitors are reentrant).
  */
private[queries] object SessionScoped {
  private val perSession =
    new java.util.WeakHashMap[SparkSession,
      scala.collection.mutable.HashMap[String, Any]]()

  def memo[A](spark: SparkSession, key: String)(build: => A): A =
    perSession.synchronized {
      val m = Option(perSession.get(spark)).getOrElse {
        val m0 = scala.collection.mutable.HashMap.empty[String, Any]
        perSession.put(spark, m0)
        m0
      }
      m.getOrElseUpdate(key, build).asInstanceOf[A]
    }
}
