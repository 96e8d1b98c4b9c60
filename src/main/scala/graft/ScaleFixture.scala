package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev harness: materialize a COMPLETE scaled sf-dir (all ten tables, same
  * names/layout contract as `/root/testdata/sf*`) so `graft.Bench` can run
  * the WHOLE headline suite at a larger scale unchanged — just point
  * `SPARK_GRAFT_SF_DIR` at the output. ScaleProbe measures each operator's
  * scaling in isolation; this fixture exists to measure the COMPOSITION
  * (the round-13 verdict's top ask): memory pressure, AQE threshold flips,
  * broadcast spills, and store-build costs only appear when the full
  * 35-row suite runs against the larger inputs.
  *
  * Scaling design (same construction as ScaleProbe, extended to the whole
  * star schema; every copy is a deterministic transform of the source so
  * the fixture needs no RNG and regenerates byte-identically):
  *
  *  - `events` ×K (default 10): copies shifted by 40 days (disjoint time
  *    ranges — the source spans 30), disjoint user/event id spaces. The
  *    output is written as K ts-range-partitioned, ts-sorted files: the
  *    engine's sorted-block storage invariant, which is what a 10×-bigger
  *    store would actually look like (NOT one giant unsorted file).
  *  - `documents` ×M (default 4): per-copy case-preserving caesar cipher
  *    on the text — token-length/shingle statistics, case profile, and the
  *    true-dup density are preserved inside each copy, but vocabularies
  *    across copies are disjoint, so the M× corpus carries M× the near-dup
  *    structure instead of k² cross-copy duplicates. Copy 0 is the source
  *    verbatim. `n_chars` stays consistent (translation preserves length).
  *  - `embeddings` ×M: id-shifted copies, vectors/labels untouched — the
  *    query sets (low vec_ids) stay fixed while the corpus grows, which is
  *    the scan-side shape ANN scaling claims are about.
  *  - `orders`/`lineitem` ×K: order-key-shifted copies (join keys to the
  *    dimensions stay in-domain; dates UNshifted so fixed-literal TPC-H
  *    predicates keep their selectivity and grouped cardinalities — the
  *    aggregation work grows K×, which is the claim under test). Each
  *    copy's `l_partkey` is rotated by a per-copy prime offset within the
  *    part-key domain, so the part co-purchase graph (`graph_triangles`)
  *    grows ~K× in edges instead of collapsing to K identical copies
  *    under `distinct`.
  *  - dimensions (`customer supplier part nation region`): copied as-is.
  *    Fact tables grow; dimensions staying broadcast-sized is exactly the
  *    100 TB story (and TPC-H's own dims grow far slower than facts).
  *
  * Output defaults to /tmp/graft_sf10x; ~150 MB at the default factors.
  * Not part of the driver contract.
  */
object ScaleFixture {
  def main(args: Array[String]): Unit = {
    val src = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val out = args.headOption.getOrElse("/tmp/graft_sf10x")
    val evK = sys.env.getOrElse("SPARK_GRAFT_SCALE_EVENTS", "10").toInt
    val docK = sys.env.getOrElse("SPARK_GRAFT_SCALE_DOCS", "4").toInt

    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      // keep the driver-table timestamp physical type on the way out so
      // the scaled tables read EXACTLY like the source ones (timestamp[us])
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def read(name: String): DataFrame =
      spark.read.parquet(s"$src/$name.parquet")
    def copies(k: Int)(f: Int => DataFrame): DataFrame =
      (0 until k).map(f).reduce(_.unionByName(_))
    def write(name: String, df: DataFrame): Unit = {
      df.write.mode("overwrite").parquet(s"$out/$name.parquet")
      val n = spark.read.parquet(s"$out/$name.parquet").count()
      println(s"[fixture] $name: $n rows")
    }

    // ---- events ×evK: disjoint 40-day time shifts + disjoint id spaces
    val events = read("events")
    write("events", copies(evK) { i =>
      events
        .withColumn("ts", col("ts") + expr(s"INTERVAL ${i * 40} DAYS"))
        .withColumn("user_id", col("user_id") + lit(i * 1000000L))
        .withColumn("event_id", col("event_id") + lit(i * 100000000L))
    }.repartitionByRange(evK, col("ts")).sortWithinPartitions("ts"))

    // ---- documents ×docK: case-preserving caesar per copy (copy 0 = src)
    val docs = read("documents")
    val lower = "abcdefghijklmnopqrstuvwxyz"
    val upper = lower.toUpperCase
    write("documents", copies(docK) { i =>
      val shl = lower.drop(i % 26) + lower.take(i % 26)
      val shu = shl.toUpperCase
      docs
        .withColumn("doc_id", col("doc_id") + lit(i * 10000000L))
        .withColumn("text", translate(col("text"), lower + upper, shl + shu))
    }.repartition(docK))

    // ---- embeddings ×docK: fixed query ids, corpus grows
    val emb = read("embeddings")
    write("embeddings", copies(docK) { i =>
      emb.withColumn("vec_id", col("vec_id") + lit(i * 10000000L))
    }.repartition(docK))

    // ---- orders/lineitem ×evK: shifted order keys, rotated part keys
    val orders = read("orders")
    write("orders", copies(evK) { i =>
      orders.withColumn("o_orderkey", col("o_orderkey") + lit(i * 1000000L))
    }.repartition(math.max(evK * 2 / 3, 1)))

    val part = read("part")
    val Array(pMin, pMax) = part
      .agg(min("p_partkey"), max("p_partkey")).head()
      .toSeq.map(_.asInstanceOf[Long]).toArray
    val pSpan = pMax - pMin + 1
    val lineitem = read("lineitem")
    write("lineitem", copies(evK) { i =>
      lineitem
        .withColumn("l_orderkey", col("l_orderkey") + lit(i * 1000000L))
        .withColumn("l_partkey",
          pmod(col("l_partkey") - lit(pMin) + lit(i * 7919L), lit(pSpan))
            + lit(pMin))
    }.repartition(evK))

    // ---- dimensions: verbatim
    Seq("customer", "supplier", "part", "nation", "region")
      .foreach(n => write(n, read(n)))

    println(s"[fixture] done: $out (events x$evK, documents x$docK)")
    spark.stop()
  }
}
