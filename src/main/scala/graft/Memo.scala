package graft

/** Bounded JVM-wide memo maps (ADVICE r8).
  *
  * The snapshot-keyed caches (replica-mass estimates, broadcast-gate row
  * counts, fragment-probe verdicts, trained IVF/PQ models) key on a
  * corpus's leaf-file listing, so a long-lived gateway JVM that repeatedly
  * rebuilds corpora accumulates one entry per (rebuild, estimator) without
  * bound. Each entry is small, but "small × forever" is still a leak — so
  * every such cache is an access-ordered LRU with a hard size cap. Eviction
  * only costs a recompute of the one linear job the memo amortizes.
  */
object Memo {

  /** Access-ordered LRU capped at `max` entries, wrapped for thread safety
    * (`Collections.synchronizedMap` synchronizes the Java-8 default methods
    * — `computeIfAbsent`/`putIfAbsent` — on the same mutex). */
  def lru[K, V](max: Int): java.util.Map[K, V] =
    java.util.Collections.synchronizedMap(
      new java.util.LinkedHashMap[K, V](16, 0.75f, true) {
        override def removeEldestEntry(e: java.util.Map.Entry[K, V]): Boolean =
          size() > max
      })
}
