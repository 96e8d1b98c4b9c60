package graft

import org.apache.spark.sql.SparkSession
import graft.pipeline.Dedup

/** Dev profiling harness: times pipeline sub-stages on SPARK_GRAFT_SF_DIR.
  * Not part of the driver contract. */
object Prof {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus  = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"$name%-28s ${(System.nanoTime() - t0) / 1e9}%7.2fs  rows=$n")
    }
    import org.apache.spark.sql.functions._
    import graft.pipeline.Text
    if (args.contains("triangles")) { profTriangles(spark, sfDir); return }
    if (args.contains("trainprep")) { profTrainPrep(spark, sfDir); return }
    if (args.contains("cascade")) { profCascade(spark, sfDir); return }
    if (args.contains("jaccard")) { profJaccard(spark, sfDir); return }
    time("warmup count")(docs.count())
    val sets = docs
      .select(col("doc_id"), Text.tokens(col("text")).as("__toks"))
      .select(col("doc_id"), Text.shinglesOfTokens(col("__toks"), 3).as("__set"))
    time("tokenize only")(
      docs.select(Text.tokens(col("text")).as("t")).select(size(col("t"))).count())
    time("shingle sets")(sets.select(size(col("__set"))).count())
    time("exploded shingles")(sets.select(explode(col("__set"))).count())
    time("exploded shingles x2")(sets.select(explode(col("__set"))).count())
    time("explode cheap child")(docs.select(explode(
      split(lower(col("text")), "[^a-z0-9]+")).as("t")).count())
    time("explode after shuffle")(sets.repartition(32)
      .select(explode(col("__set"))).count())
    time("explode after cache")({
      val c = sets.cache(); c.count()
      val n = c.select(explode(col("__set"))).count(); c.unpersist(); n
    })
    time("exploded+hash")(sets.select(col("doc_id"), explode(col("__set")).as("s"))
      .select(col("doc_id"), xxhash64(col("s")).as("h")).count())
    time("signatures")(
      Dedup.minhashSignatures(docs, "doc_id", "text", 64, 3).count())
    time("lshBuckets")(Dedup.lshBuckets(docs, "doc_id", "text", 16, 4, 3).count())
    val cands = Dedup.minhashCandidates(docs, "doc_id", "text", 16, 4, 3)
    time("candidates")(cands.count())
    time("jaccardVerify")(
      Dedup.jaccardVerify(docs, cands, "doc_id", "text", 3).count())
    time("jaccardPairs(all)")(
      Dedup.jaccardPairs(docs, "doc_id", "text", 0.3, 3).count())
    time("nearDuplicates")(
      Dedup.nearDuplicates(docs, "doc_id", "text", 0.3, 16, 4, 3).count())
    spark.stop()
  }

  /** Stage split of the dedup_jaccard_pairs bench row: shingling vs the
    * stop-shingle df-cap vs the capped sets vs the inverted-index
    * self-join — attributing the ~1.9s quiesced total (the baseline row
    * is 1.93s, zero headroom). */
  private def profJaccard(spark: SparkSession, sfDir: String): Unit = {
    import org.apache.spark.sql.functions._
    import graft.pipeline.{Dedup, Text}
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"$name%-28s ${(System.nanoTime() - t0) / 1e9}%7.2fs  rows=$n")
    }
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    time("warmup count")(docs.count())
    val sets = Text.fanOut(docs).select(col("doc_id"),
      Text.shingleSetUdf(3)(col("text")).as("__set"))
    time("shingle sets")(sets.select(size(col("__set"))).count())
    time("shingle sets x2")(sets.select(size(col("__set"))).count())
    time("stopShingles")(
      Dedup.stopShingles(docs, "doc_id", "text", 3, 20).count())
    time("cappedSets")(
      Dedup.cappedSets(docs, "doc_id", "text", 3, 20)
        .select(col("__n")).count())
    time("cappedExploded")(
      Dedup.cappedSets(docs, "doc_id", "text", 3, 20)
        .select(col("__id"), explode(col("__kept"))).count())
    // A/B: current vs shared-shingling variants, interleaved (this box
    // is noisy — the MIN over reps is the stable signal)
    def pinned(pin: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame)(): Long = {
      val sets1 = pin(Text.fanOut(docs).select(col("doc_id").as("__id"),
        Text.shingleSetUdf(3)(col("text")).as("__set")))
      try {
        val nDocs = sets1.agg(count(lit(1)).as("__ndocs"))
        val stop = sets1.select(explode(col("__set")).as("__tok"))
          .groupBy("__tok").agg(count(lit(1)).as("__df"))
          .crossJoin(broadcast(nDocs))
          .filter(col("__df") > greatest(lit(20L),
            expr("(__ndocs * 5) div 1000")))
          .agg(collect_list(col("__tok")).as("__stop"))
        val kept = sets1.crossJoin(broadcast(stop))
          .withColumn("__kept", array_except(col("__set"), col("__stop")))
          .select(col("__id"), size(col("__kept")).as("__n"),
            explode(col("__kept")).as("__tok"))
        val joined = kept.alias("l").join(kept.alias("r"),
            col("l.__tok") === col("r.__tok"))
          .filter(col("l.__id") < col("r.__id"))
          .select(col("l.__id").as("id1"), col("l.__n").as("n1"),
            col("r.__id").as("id2"), col("r.__n").as("n2"))
          .groupBy("id1", "id2", "n1", "n2")
          .agg(count(lit(1)).as("shared"))
          .withColumn("jaccard", col("shared").cast("double") /
            (col("n1") + col("n2") - col("shared")))
          .filter(col("jaccard") >= 0.3)
        joined.count()
      } finally { sets1.unpersist(); () }
    }
    def timed(f: () => Long): Double = {
      val t0 = System.nanoTime(); f(); (System.nanoTime() - t0) / 1e9
    }
    val variants: Seq[(String, () => Long)] = Seq(
      "current " -> (() =>
        Dedup.jaccardPairs(docs, "doc_id", "text", 0.3, 3).count()),
      "persist " -> pinned(_.persist()) _,
      "localckp" -> pinned(_.localCheckpoint()) _)
    val samples = scala.collection.mutable.Map[String,
      List[Double]]().withDefaultValue(Nil)
    (1 to 6).foreach { _ =>
      variants.foreach { case (n, f) => samples(n) ::= timed(f) }
    }
    variants.foreach { case (n, _) =>
      val xs = samples(n)
      println(f"$n min=${xs.min}%5.2f med=${xs.sorted.apply(xs.size / 2)}%5.2f all=[${xs.reverse.map(x => f"$x%4.2f").mkString(" ")}]")
    }
    spark.stop()
  }

  /** Stage split of the pipeline_train_prep bench row: curate vs the
    * contamination/mix/pack tail — same fixture as the bench query. */
  private def profTrainPrep(spark: SparkSession, sfDir: String): Unit = {
    import org.apache.spark.sql.functions._
    import graft.pipeline.{Dedup, Pipelines, Text}
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"$name%-28s ${(System.nanoTime() - t0) / 1e9}%7.2fs  rows=$n")
    }
    val docsAll = spark.read.parquet(s"$sfDir/documents.parquet")
    val train = docsAll.filter(pmod(col("doc_id"), lit(97L)) =!= 0)
    val eval_ = docsAll.filter(pmod(col("doc_id"), lit(97L)) === 0)
    val budgets = Map("en" -> 2000L, "de" -> 600L, "es" -> 600L,
      "fr" -> 500L)
    def scrub(f: org.apache.spark.sql.DataFrame) =
      f.withColumn("text", Text.scrubPii(col("text")))
    time("warmup count")(docsAll.count())
    time("scrub only")(scrub(train).select(length(col("text"))).count())
    val curated = Pipelines.curate(scrub(train), "doc_id", "text", 20, 70,
      0.3, 3)
    time("curate")(curated.count())
    spark.catalog.clearCache()
    val curated2 = Pipelines.curate(scrub(train), "doc_id", "text", 20, 70,
      0.3, 3)
    time("curate+contam")({
      val contam = Dedup.contamination(curated2, scrub(eval_), "doc_id",
        "text", 3).select(col("doc_id"))
      curated2.join(contam, Seq("doc_id"), "left_anti").count()
    })
    spark.catalog.clearCache()
    time("full trainPrep")(Pipelines.trainPrep(train, "doc_id", "text",
      eval_, budgets, contextLen = 128, numBuckets = 4).count())
    spark.catalog.clearCache()
    time("full trainPrep again")(Pipelines.trainPrep(train, "doc_id",
      "text", eval_, budgets, contextLen = 128, numBuckets = 4).count())
    // step-by-step replica of trainPrep's pinned chain. NOTE: the
    // eager localCheckpoints materialize at CONSTRUCTION (the val
    // definitions), so each time() below measures only the residual —
    // read these as "the stage is cheap once its inputs are pinned",
    // not as a wall-time split of the composed call
    spark.catalog.clearCache()
    val curatedM = Pipelines.curate(scrub(train), "doc_id", "text", 20, 70,
      0.3, 3, materialize = true)
    time("curate(mat) step")(curatedM.count())
    val contamIds = Dedup.contamination(curatedM, scrub(eval_), "doc_id",
      "text", 3).select(col("doc_id"))
    val cleanStep = curatedM.join(contamIds, Seq("doc_id"), "left_anti")
      .localCheckpoint()
    time("contam+anti pin step")(cleanStep.count())
    val mixedStep = Text.mixSample(cleanStep, "doc_id", "text",
      "lang_pred", budgets)
    val docsStep = cleanStep.select(col("doc_id"), col("text"),
        col("lang_pred"))
      .join(mixedStep.select(col("doc_id"), col("cum_tokens")),
        Seq("doc_id")).localCheckpoint()
    time("mix+join pin step")(docsStep.count())
    time("pack+final join step")(
      Text.packSequences(docsStep, "doc_id", "text", 128, 4)
        .join(docsStep.drop("text"), Seq("doc_id")).count())
    spark.stop()
  }

  /** Stage split of the rollup_cascade_daily bench row (the round-10
    * +0.35s min question): raw-side re-aggregation vs store-side scoped
    * reads vs the full stitched serve, then the same serve over a
    * NON-aligned store layout (32 files per day directory instead of
    * one) — attributing the aligned-write layout's serve-side cost, if
    * any, separately from host variance. */
  private def profCascade(spark: SparkSession, sfDir: String): Unit = {
    import org.apache.spark.sql.functions._
    import graft.storage.RollupStore
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"$name%-28s ${(System.nanoTime() - t0) / 1e9}%7.2fs  rows=$n")
    }
    val day = 86400L * 1000000000L
    val hour = 3600L * 1000000000L
    val bounds = Seq(100L, 500L, 1000L, 5000L, 10000L, 50000L)
    def ns(s: String): Long = graft.model.TimeNano.toNanos(
      graft.model.TimeNano.parseNaive(s), java.time.ZoneOffset.UTC)
    val base = new java.io.File(sys.props("java.io.tmpdir"),
      s"graft-prof-cascade-${ProcessHandle.current().pid()}")
    org.apache.commons.io.FileUtils.deleteQuietly(base)
    val rawP = new java.io.File(base, "raw").getPath
    val stH = new java.io.File(base, "st-1h").getPath
    val stD = new java.io.File(base, "st-1d").getPath
    val ev = graft.storage.Tables.read(spark, sfDir, "events")
    ev.write.mode("overwrite").parquet(rawP)
    time("fixture tierOff 1h") {
      RollupStore.tierOff(spark, rawP, stH, cutoff = ns("2024-01-20"),
        bucketNanos = hour, distinctCol = Some("user_id"),
        histBoundsCents = bounds); 0L
    }
    time("fixture tierOff 1d + compact") {
      RollupStore.tierOffStore(spark, stH, stD, cutoff = ns("2024-01-10"),
        coarseBucketNanos = day)
      RollupStore.compact(spark, stH); 0L
    }
    def serve(h: String, d: String): Long =
      RollupStore.cascadeRollup(spark, rawP, Seq(h, d), day,
        distinctCol = Some("user_id"), histBoundsCents = bounds).count()
    (1 to 2).foreach(_ => serve(stH, stD)) // warm
    (1 to 5).foreach(i => time(s"cascade serve #$i")(serve(stH, stD)))
    // stage split: the raw remnant's re-aggregation vs the store scans
    val raw = spark.read.parquet(rawP)
    time("raw-side agg only")(
      graft.operators.TsOps.rangeFilter(raw, Some(ns("2024-01-20")), None)
        .groupBy(expr(graft.operators.TsOps.floorBucketSql("ts", day))
          .as("b"))
        .agg(count(lit(1)), sum(col("value").cast("decimal(18,2)")),
          expr("hll_sketch_agg(user_id, 12)"))
        .count())
    time("store scans only")(
      spark.read.parquet(stH).count() + spark.read.parquet(stD).count())
    time("store fold 1h->1d")(
      RollupStore.rollup(spark, stD, day).count())
    // layout A/B: copy both stores MULTI-file-per-day (the pre-aligned
    // write shape) and serve the same stitched read over the copies
    val stH2 = new java.io.File(base, "st-1h-multi").getPath
    val stD2 = new java.io.File(base, "st-1d-multi").getPath
    spark.read.parquet(stH).repartition(32)
      .write.partitionBy("__day").parquet(stH2)
    spark.read.parquet(stD).repartition(32)
      .write.partitionBy("__day").parquet(stD2)
    (1 to 2).foreach(_ => serve(stH2, stD2)) // warm
    (1 to 5).foreach(i =>
      time(s"serve multi-file/day #$i")(serve(stH2, stD2)))
    org.apache.commons.io.FileUtils.deleteQuietly(base)
    spark.stop()
  }

  /** Stage split of the graph_triangles bench row: fixture pair-build vs
    * the triangles normalize/orient/count stages. */
  private def profTriangles(spark: SparkSession, sfDir: String): Unit = {
    import org.apache.spark.sql.functions._
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"$name%-28s ${(System.nanoTime() - t0) / 1e9}%7.2fs  rows=$n")
    }
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select("l_orderkey", "l_partkey")
    def pairs = li.as("a").join(li.as("b"),
        col("a.l_orderkey") === col("b.l_orderkey") &&
          col("a.l_partkey") < col("b.l_partkey"))
      .select(col("a.l_partkey").as("src"), col("b.l_partkey").as("dst"))
    time("warmup lineitem count")(li.count())
    time("pair fan-out")(pairs.count())
    val norm = pairs.select(least(col("src"), col("dst")).as("src"),
        greatest(col("src"), col("dst")).as("dst"))
      .filter(col("src") =!= col("dst")).distinct()
    time("normalize+distinct")(norm.count())
    time("full triangles")(
      graft.operators.GraphOps.triangles(pairs).count())
    time("full triangles again")(
      graft.operators.GraphOps.triangles(pairs).count())
    // alternative fixture: per-order sorted part array, pairs by index —
    // ONE groupBy shuffle instead of the self-join's two-sided shuffle
    def pairsArr = li.groupBy("l_orderkey")
      .agg(array_sort(collect_set("l_partkey")).as("ps"))
      .select(explode(expr(
        "flatten(transform(ps, (x, i) -> transform(" +
          "slice(ps, i + 2, greatest(size(ps) - i - 1, 0)), " +
          "y -> struct(x as src, y as dst))))")).as("e"))
      .select(col("e.src"), col("e.dst"))
    time("pairsArr fan-out")(pairsArr.count())
    time("triangles over pairsArr")(
      graft.operators.GraphOps.triangles(pairsArr).count())
    time("triangles over pairsArr 2")(
      graft.operators.GraphOps.triangles(pairsArr).count())
    // finer split of the operator's own stages over a PRE-normalized
    // cached edge frame, isolating orient vs adjacency vs intersect
    val p = norm.cache(); p.count()
    val deg = p.select(col("src").as("node"))
      .unionAll(p.select(col("dst").as("node")))
      .groupBy("node").agg(count(lit(1)).as("deg")).cache()
    time("degree agg")(deg.count())
    val oriented = p
      .join(deg.withColumnRenamed("node", "src")
        .withColumnRenamed("deg", "sdeg"), "src")
      .join(deg.withColumnRenamed("node", "dst")
        .withColumnRenamed("deg", "ddeg"), "dst")
      .select(
        when(col("sdeg") < col("ddeg") ||
            (col("sdeg") === col("ddeg") && col("src") < col("dst")),
          struct(col("src").as("lo"), col("dst").as("hi")))
          .otherwise(struct(col("dst").as("lo"), col("src").as("hi")))
          .as("e"))
      .select(col("e.lo").as("u"), col("e.hi").as("v")).cache()
    time("orient (2 joins)")(oriented.count())
    val adj = oriented.groupBy("u")
      .agg(collect_list("v").as("nbrs")).cache()
    time("adjacency build")(adj.count())
    time("intersect count pass")(oriented
      .join(broadcast(adj), Seq("u"))
      .join(broadcast(adj.select(col("u").as("v"),
        col("nbrs").as("__vn"))), Seq("v"), "left")
      .select(size(array_intersect(col("nbrs"),
        coalesce(col("__vn"), array().cast("array<long>"))))
        .cast("long").as("__c"))
      .agg(coalesce(sum("__c"), lit(0L))).count())
    Seq(p, deg, oriented, adj).foreach(_.unpersist())
    spark.stop()
  }
}
