package graft.build

import org.apache.spark.sql.DataFrame

import graft.ml.DiffAnomaly.FittedDetector

/** Serving-side input handling (SURVEY P1/S5; ref: column verification
  * `gordo/server/utils.py:208-253`, LRU model cache `:334-401`).
  */
object Serving {

  class BadInputException(msg: String) extends RuntimeException(msg)

  /** P1: align an input frame to the model's expected columns —
    * selected/reordered by name (extras dropped) whenever the expected
    * names are all present, else positionally relabeled when the input
    * carries EXACTLY the default unlabeled wire shape (pandas RangeIndex
    * `0..n-1` or Spark CSV `_c0.._cn`, in order — arbitrary digit-like
    * names are labels, never silently re-labeled to different tags);
    * anything else is rejected. The labeled check runs FIRST, so models
    * whose tags are themselves digit-named stay addressable by name. */
  def verifyColumns(df: DataFrame, expected: Seq[String],
                    orderCol: Option[String] = None): DataFrame = {
    import graft.Cols.q
    val keep = orderCol.toSeq
    val present = df.columns.toSeq
    // a missing order column is malformed INPUT like a missing tag —
    // it must surface as BadInputException (HTTP 400 in a server), not
    // as the AnalysisException df.select would throw below (a 500 with
    // a Spark-internal message)
    keep.filterNot(present.contains).foreach(c =>
      throw new BadInputException(s"missing expected order column: $c"))
    val dataCols = present.filterNot(keep.contains)
    if (expected.forall(present.contains)) {
      df.select((keep ++ expected).map(q): _*)
    } else {
      val unlabeled =
        dataCols == dataCols.indices.map(_.toString) ||
          dataCols == dataCols.indices.map(i => s"_c$i")
      if (!unlabeled)
        throw new BadInputException(
          s"missing expected columns: ${expected.filterNot(present.contains)}")
      if (dataCols.size != expected.size)
        throw new BadInputException(
          s"unlabeled input has ${dataCols.size} columns, expected ${expected.size}")
      // ONE projection (no intermediate-rename collision hazard)
      df.select((keep.map(q) ++
        dataCols.zip(expected).map { case (f, t) => q(f).as(t) }): _*)
    }
  }

  /** The S5 cache discipline extracted: a bounded access-ordered map —
    * every get (hit or miss) makes the key most-recently-used; inserting
    * past capacity evicts the least-recently-used. Invariant (what q79
    * gates): the cache holds exactly the `capacity` most recently
    * accessed distinct keys. Thread-safe with per-key load memoization:
    * the map lock covers only the lookup/insert of a lazy holder, the
    * load itself runs under that holder's own lock — so a cold load on
    * one key never blocks hits on other keys, and concurrent gets of a
    * CACHED key invoke `load` exactly once. If an in-flight load's
    * holder is evicted before the load completes (capacity pressure
    * from other keys), the finished value is re-inserted — at most one
    * extra load can race in that window, and the loaded value is never
    * silently dropped. A load that THROWS is not cached (Scala
    * lazy-val failed-init semantics): the next get of that key
    * retries. */
  final class LruCache[K, V](capacity: Int)(load: K => V) {
    private final class Holder(k: K, val born: Long) {
      lazy val value: V = load(k)
    }
    // bumped by remove(); a holder born before the latest removal is
    // never RE-inserted by get's eviction-race repair — without the
    // guard, an in-flight get could resurrect an invalidated entry into
    // the slot remove() just emptied. The epoch is deliberately GLOBAL:
    // a remove() of key B also vetoes the repair of key A's in-flight
    // load, costing one extra re-load in that (eviction-during-load ×
    // concurrent-remove) corner — the conservative direction, since a
    // per-key removal generation would have to be remembered for every
    // key ever removed (unbounded) to stay safe against late repairs
    private var epoch = 0L
    private val map = new java.util.LinkedHashMap[K, Holder](16, 0.75f, true) {
      override def removeEldestEntry(e: java.util.Map.Entry[K, Holder]): Boolean =
        this.size() > capacity // `this.` disambiguates from LruCache.size
    }
    def get(k: K): V = {
      val h = map.synchronized {
        Option(map.get(k)).getOrElse {
          val nh = new Holder(k, epoch); map.put(k, nh); nh
        }
      }
      val v = h.value
      // eviction raced the load: this get must still leave k cached as
      // the most-recently-used key, holding the value just computed.
      // Re-insert ONLY into an empty slot — if a concurrent get already
      // installed a NEWER holder for k, overwriting it would let an
      // older value replace a newer one (visible if `load` reads
      // mutable state, e.g. a rewritten model dir) — and only when no
      // remove() has happened since the holder was created
      map.synchronized {
        if ((map.get(k) eq null) && h.born == epoch) map.put(k, h)
      }
      v
    }
    /** Containment WITHOUT touching recency (LinkedHashMap.containsKey
      * does not record an access). */
    def contains(k: K): Boolean = map.synchronized(map.containsKey(k))
    /** Drop k; the next get re-loads. An in-flight get that already
      * picked up the removed holder still returns its value once, but
      * the epoch guard keeps it from re-installing that holder. */
    def remove(k: K): Unit = map.synchronized {
      epoch += 1; map.remove(k): Unit
    }
    def size: Int = map.synchronized(map.size())
  }

  /** S5: bounded LRU cache of loaded models keyed by model dir (the
    * reference caches 2 models per worker). Thread-safe for parallel
    * scoring threads on one driver.
    *
    * Entries carry the model's recorded windowing (M6): a windowed
    * sequence model scored on a raw frame without re-applying its lag
    * surgery would silently mis-resolve — scorers must use [[getFull]]
    * (or `ModelBuilder.score`, which does) rather than assembling
    * `anomaly` calls from [[get]] alone. */
  class ModelCache(capacity: Int = 2) {
    private type Entry = (FittedDetector, Option[(Seq[String], Int, Int)])
    private val loadCount = new java.util.concurrent.atomic.AtomicLong
    private val cache = new LruCache[String, Entry](capacity)(dir => {
      loadCount.incrementAndGet(); Persistence.loadFull(dir)
    })
    /** Detector plus its windowing spec (base tags, lookback, lookahead). */
    def getFull(dir: String): Entry = cache.get(dir)
    def get(dir: String): FittedDetector = getFull(dir)._1
    /** Drop a cached entry so the next access re-reads the dir. Model
      * dirs are REBUILT IN PLACE (buildSpec overwrites, cache-hit
      * materialization clears-and-copies), and the cache keys only on
      * the path — without an explicit invalidate a hot entry would keep
      * serving the pre-rebuild weights for the process lifetime. */
    def invalidate(dir: String): Unit = cache.remove(dir)
    def size: Int = cache.size
    /** Disk loads performed so far — `1 - loads/accesses` is the hit
      * rate a serving deployment sizes its capacity by. */
    def loads: Long = loadCount.get
  }
}
