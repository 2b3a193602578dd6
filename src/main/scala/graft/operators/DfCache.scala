package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Session-scoped get-or-build cache for DataFrames shared by
  * operators that never see their consumers' action boundary (and so
  * can never own an unpersist).
  *
  * What the references actually buy (and what they don't): `persist`
  * registers the plan in the context-wide CacheManager, which STRONGLY
  * references the InMemoryRelation — a cleared SoftReference here (or
  * a GC'd session) does NOT make the persisted blocks unreachable;
  * they stay pinned until an explicit unpersist or context stop. The
  * one-copy bound still holds because CacheManager dedups a re-persist
  * of a semantically-equal plan: a rebuild after a cleared ref reuses
  * the SAME cached representation instead of pinning a second copy.
  * The weak session keys only keep dead sessions' per-session maps
  * from accumulating in this process-wide object; the soft value refs
  * only let the cheap local handle go under memory pressure (the
  * DataFrame strong-references the session — its weak key — so a
  * strong value would pin the entry forever, the WeakHashMap
  * value→key caveat).
  *
  * Insertion is atomic per (session, key): concurrent callers of the
  * same key share ONE build instead of racing two persist
  * registrations. Different keys build concurrently.
  *
  * Plan-derived keys are GUARDED: [[persistedForSource]] buckets on a
  * digest of the canonicalized analyzed plan's string form, then
  * verifies the stored canonical plan equals the caller's (Spark's
  * `sameResult` contract) before serving a hit — the string form alone
  * is not injective (e.g. `LocalRelation` prints its schema, not its
  * data), and a 32-bit `semanticHash` bucket can birthday-collide
  * between corpora in one session; either alone could silently serve
  * the wrong cached table. Guard-mismatched entries coexist under one
  * bucket key.
  */
private[graft] object DfCache {

  private final case class Entry(guard: Option[LogicalPlan], df: DataFrame)

  private final class PerSession {
    val entries = scala.collection.concurrent.TrieMap
      .empty[String, java.lang.ref.SoftReference[List[Entry]]]
    val locks = scala.collection.concurrent.TrieMap.empty[String, Object]
  }

  private val cache = java.util.Collections.synchronizedMap(
    new java.util.WeakHashMap[SparkSession, PerSession]())

  /** Get-or-build a PERSISTED (MEMORY_AND_DISK) DataFrame keyed on the
    * SOURCE DataFrame's canonicalized analyzed plan plus a caller
    * suffix (operator name + params). The canonical plan is stored
    * with the entry and verified on every hit — see the class doc. */
  def persistedForSource(source: DataFrame, suffix: String)(
      build: => DataFrame): DataFrame = {
    val canon = source.queryExecution.analyzed.canonicalized
    val md = java.security.MessageDigest.getInstance("SHA-256")
    val digest = md.digest(canon.toString.getBytes("UTF-8")).take(12)
      .map(b => f"$b%02x").mkString
    getOrBuild(source.sparkSession, s"src:$digest:$suffix", pin = true,
      guard = Some(canon))(build)
  }

  /** Get-or-build a PERSISTED (MEMORY_AND_DISK) DataFrame under a
    * caller-owned string key (keys built from stable identifiers like
    * data directories — no plan involved, no guard needed). */
  def persisted(sp: SparkSession, key: String)(
      build: => DataFrame): DataFrame =
    getOrBuild(sp, key, pin = true, guard = None)(build)

  /** Get-or-build an UNPINNED DataFrame — plan reuse only (e.g. the
    * per-(dir, table) parquet reads, where re-listing files and
    * re-reading footers is the cost being avoided, not recompute). */
  def unpinned(sp: SparkSession, key: String)(
      build: => DataFrame): DataFrame =
    getOrBuild(sp, key, pin = false, guard = None)(build)

  private def getOrBuild(sp: SparkSession, key: String, pin: Boolean,
      guard: Option[LogicalPlan])(build: => DataFrame): DataFrame = {
    val ps = cache.synchronized {
      var m = cache.get(sp)
      if (m == null) { m = new PerSession; cache.put(sp, m) }
      m
    }
    // per-key monitor: same-key callers share one build (nested builds
    // of DIFFERENT keys re-enter freely; no build path acquires two
    // keys in opposite orders)
    ps.locks.getOrElseUpdate(key, new Object).synchronized {
      val live = ps.entries.get(key).flatMap(r => Option(r.get()))
        .getOrElse(Nil)
      live.find(e => e.guard == guard) match {
        case Some(e) => e.df
        case None =>
          val built = build
          val df =
            if (pin) built.persist(
              org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
            else built
          ps.entries.put(key,
            new java.lang.ref.SoftReference(Entry(guard, df) :: live))
          df
      }
    }
  }
}
