package graft.storage

import org.apache.spark.sql.{DataFrame, SparkSession}
import scala.collection.mutable

/** LRU registry of cached metrics tables — the engine-level analog of the
  * reference's block LRU cache (`storage/cache/block_cache.rs:13-51`,
  * `ZDB_BLOCK_CACHE_SIZE` default 1000). Spark's block manager holds the
  * actual bytes; this tracks which metrics are pinned and evicts
  * least-recently-used ones.
  *
  * `use_cache = false` in a query bypasses (and does not populate) the
  * registry, matching `CacheSetting::only_write` semantics
  * (`query/lexer/with.rs:96-99`).
  */
object CacheRegistry {
  private val maxEntries: Int =
    sys.env.get("GRAFT_TABLE_CACHE_SIZE").map(_.toInt).getOrElse(64)
  private val cached = mutable.LinkedHashMap.empty[String, DataFrame]

  def get(spark: SparkSession, dbDir: String, metrics: String): DataFrame =
    synchronized {
      val key = Tables.metricsPath(dbDir, metrics)
      cached.remove(key) match {
        case Some(df) => // LRU touch: move to tail
          cached.put(key, df); df
        case None =>
          val df = Tables.read(spark, dbDir, metrics).cache()
          cached.put(key, df)
          while (cached.size > maxEntries) {
            val (_, old) = cached.head
            old.unpersist(blocking = false)
            cached.remove(cached.head._1)
          }
          df
      }
    }

  /** Drop + refresh a metrics (the `force_sync_cloud` analog: re-list files
    * and invalidate cached data — ≈ REFRESH TABLE). */
  def invalidate(spark: SparkSession, dbDir: String, metrics: String): Unit =
    synchronized {
      val key = Tables.metricsPath(dbDir, metrics)
      cached.remove(key).foreach(_.unpersist(blocking = false))
      spark.catalog.refreshByPath(key)
    }

  def clear(): Unit = synchronized {
    cached.values.foreach(_.unpersist(blocking = false))
    cached.clear()
  }

  def size: Int = synchronized(cached.size)
}
