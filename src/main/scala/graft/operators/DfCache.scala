package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Session-scoped get-or-build cache for persisted DataFrames shared
  * by operators that never see their consumers' action boundary (and
  * so can never own an unpersist). Weak session keys + SOFT value
  * refs: the DataFrame strong-references the session (the weak key),
  * so a strongly-held value would pin the entry forever (WeakHashMap
  * value→key caveat); softly held, memory pressure clears the ref,
  * the dead session becomes collectable, and the ContextCleaner then
  * reaps the unreachable persisted blocks. The cache bounds the leak
  * shape to AT MOST ONE pinned copy per distinct (session, key) —
  * repeat invocations reuse the same persisted DataFrame instead of
  * pinning fresh orphans. */
private[graft] object DfCache {

  private val cache = java.util.Collections.synchronizedMap(
    new java.util.WeakHashMap[SparkSession,
      scala.collection.concurrent.TrieMap[String,
        java.lang.ref.SoftReference[DataFrame]]]())

  def persisted(sp: SparkSession, key: String)(
      build: => DataFrame): DataFrame = {
    val perSession = cache.synchronized {
      var m = cache.get(sp)
      if (m == null) {
        m = scala.collection.concurrent.TrieMap.empty
        cache.put(sp, m)
      }
      m
    }
    perSession.get(key).flatMap(r => Option(r.get())) match {
      case Some(df) => df
      case None =>
        val df = build
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        perSession.put(key, new java.lang.ref.SoftReference(df))
        df
    }
  }
}
