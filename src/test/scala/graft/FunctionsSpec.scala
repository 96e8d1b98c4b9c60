package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.functions.FormatNanos.format_ns
import graft.model.TimeNano

class FunctionsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  test("format_ns renders RFC3339 with nanos, matches TimeNano reference") {
    val ts = Seq(1650931200000000010L, 1650931260123456789L, 0L, -1L)
    val df = ts.toDF("ts")
    val utc = df.select(format_ns($"ts").as("s")).collect().map(_.getString(0))
    assert(utc(0) == "2022-04-26T00:00:00.000000010+00:00")
    assert(utc(1) == "2022-04-26T00:01:00.123456789+00:00")
    assert(utc(2) == "1970-01-01T00:00:00.000000000+00:00")
    assert(utc(3) == "1969-12-31T23:59:59.999999999+00:00")
    val jst = df.select(format_ns($"ts", "+9").as("s")).collect().map(_.getString(0))
    assert(jst(0) == "2022-04-26T09:00:00.000000010+09:00")
    // agrees with the driver-side renderer on every value
    val zone = TimeNano.resolveZone("+9")
    assert(jst.toSeq == ts.map(TimeNano.formatNanos(_, zone)))
  }

  test("cosine_sim: codegen participation, null propagation, HOF parity") {
    import graft.functions.CosineSim.cosine_sim
    import graft.pipeline.Similarity
    val emb = graft.storage.Tables.read(spark, "/root/testdata/sf0.001",
      "embeddings")
    val pairs = emb.select($"vec_id".as("id1"), $"embedding".as("v1"))
      .join(emb.select($"vec_id".as("id2"), $"embedding".as("v2")),
        $"id1" === $"id2" - 1)
    val out = pairs.select(cosine_sim($"v1", $"v2").as("c"))
    out.collect() // materialize so AQE finalizes the physical plan
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("cosine_sim"), plan)
    // the starred prefix marks whole-stage-codegen participation
    assert(plan.contains("*(") && plan.contains("Project [cosine_sim"), plan)
    // bitwise parity with the interpreted HOF reference form
    val mism = pairs.select(cosine_sim($"v1", $"v2").as("u"),
        Similarity.cosineHof($"v1", $"v2").as("h"))
      .filter($"u" =!= $"h").count()
    assert(mism == 0)
    // null propagation
    val withNull = pairs.limit(1)
      .select(cosine_sim(lit(null).cast("array<float>"), $"v2").as("c"))
      .collect()
    assert(withNull(0).isNullAt(0))
    // mismatched lengths → null, like the HOF form (never a truncated score)
    val mismatch = pairs.limit(1)
      .select(cosine_sim(slice($"v1", 1, 63), $"v2").as("c")).collect()
    assert(mismatch(0).isNullAt(0))
  }

  test("cosine_sim: zero-norm vector yields null, never NaN") {
    import graft.functions.CosineSim.cosine_sim
    // a zero embedding must not rank as everyone's top neighbor (Spark
    // orders NaN above every double) — the score is null instead
    val zeroDf = Seq((Array.fill(4)(0.0f), Array(1.0f, 2.0f, 3.0f, 4.0f)))
      .toDF("z", "v")
    // parquet-free literal path exercises the interpreted eval; the
    // projection over a read exercises codegen — assert both
    val interp = zeroDf.select(
      cosine_sim($"z", $"v").as("zv"),
      cosine_sim($"v", $"z").as("vz"),
      cosine_sim($"z", $"z").as("zz"),
      cosine_sim($"v", $"v").as("vv")).collect()(0)
    assert(interp.isNullAt(0) && interp.isNullAt(1) && interp.isNullAt(2))
    assert(math.abs(interp.getDouble(3) - 1.0) < 1e-12)
    val emb = graft.storage.Tables.read(spark, "/root/testdata/sf0.001",
      "embeddings").limit(3)
    val gen = emb.select(
      cosine_sim($"embedding",
        expr("cast(array_repeat(cast(0.0 as float), 64) as array<float>)")).as("c"))
      .collect()
    assert(gen.forall(_.isNullAt(0)))
  }

  test("cosine_sim_i8: codegen, exact integer math, null contract") {
    import graft.functions.CosineSim.cosine_sim_i8
    import graft.pipeline.Similarity
    // hand-computable case: dot=11, |a|²=5, |b|²=25 → 11/(√5·√25)
    val hand = Seq((Seq(1.toByte, 2.toByte), Seq(3.toByte, 4.toByte)))
      .toDF("a", "b").select(cosine_sim_i8($"a", $"b").as("c")).collect()(0)
    assert(math.abs(hand.getDouble(0) - 11.0 / (math.sqrt(5) * 5)) < 1e-15)
    // over the real embeddings: quantized-int8 cosine stays close to the
    // float cosine of the same quantized values (same ranking signal), and
    // the expression participates in whole-stage codegen on a parquet scan
    val emb = graft.storage.Tables.read(spark, "/root/testdata/sf0.001",
      "embeddings")
    val qq = emb.select($"vec_id",
        Similarity.quantizeInt8($"embedding").as("qs"))
      .select($"vec_id", $"qs.q".as("q"), $"qs.max_abs".as("ma"))
    val pairs = qq.select($"vec_id".as("id1"), $"q".as("q1"), $"ma".as("ma1"))
      .join(qq.select($"vec_id".as("id2"), $"q".as("q2"), $"ma".as("ma2")),
        $"id1" === $"id2" - 1)
    val both = pairs.select(
      cosine_sim_i8($"q1", $"q2").as("i8"),
      Similarity.cosine(
        Similarity.dequantizeInt8($"q1", $"ma1"),
        Similarity.dequantizeInt8($"q2", $"ma2")).as("deq"))
    both.collect().foreach { r =>
      assert(math.abs(r.getDouble(0) - r.getDouble(1)) < 1e-6,
        s"${r.getDouble(0)} vs ${r.getDouble(1)}")
    }
    val plan = both.queryExecution.executedPlan.toString
    assert(plan.contains("cosine_sim_i8"), plan)
    // null contract: length mismatch and zero vector → null
    val edge = Seq((Seq(1.toByte, 2.toByte), Seq(3.toByte),
        Seq(0.toByte, 0.toByte)))
      .toDF("a", "short", "zero")
      .select(cosine_sim_i8($"a", $"short").as("m"),
        cosine_sim_i8($"a", $"zero").as("z")).collect()(0)
    assert(edge.isNullAt(0) && edge.isNullAt(1))
  }

  test("SQL-registered functions reject wrong arity with a clear error") {
    val eng = new graft.ql.Engine(spark, "/root/testdata/sf0.001")
    val e1 = intercept[Exception] {
      eng.sql("SELECT cosine_sim(CAST(array(1.0) AS array<float>))").collect()
    }
    assert(e1.getMessage.contains("cosine_sim requires exactly 2 arguments"),
      e1.getMessage)
    val e2 = intercept[Exception] {
      eng.sql("SELECT format_ns(1, 2, 3)").collect()
    }
    assert(e2.getMessage.contains("format_ns requires exactly 1 argument"),
      e2.getMessage)
  }

  test("GraftExtensions injects the native functions at session build") {
    import org.apache.spark.sql.SparkSession
    val orig = spark
    // getOrCreate returns the default session, so extensions would be
    // skipped — clear it, build a sibling session on the SAME context with
    // the extensions config, restore after
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      // .withExtensions rather than the spark.sql.extensions conf: the
      // conf is static and only read when the CONTEXT is created, and this
      // test reuses the shared test context
      val s2 = SparkSession.builder()
        .withExtensions(new graft.GraftExtensions())
        .getOrCreate()
      val r = s2.sql(
        "SELECT cosine_sim(CAST(array(3.0, 4.0) AS array<float>), " +
          "CAST(array(3.0, 4.0) AS array<float>)) AS c, " +
          "format_ns(CAST(0 AS BIGINT)) AS f, " +
          "cosine_sim_i8(CAST(array(1, 2) AS array<tinyint>), " +
          "CAST(array(1, 2) AS array<tinyint>)) AS i").collect()(0)
      assert(math.abs(r.getDouble(0) - 1.0) < 1e-12)
      assert(r.getString(1) == "1970-01-01T00:00:00.000000000+00:00")
      assert(math.abs(r.getDouble(2) - 1.0) < 1e-12)
      val e = intercept[Exception] { s2.sql("SELECT format_ns(1, 2)").collect() }
      assert(e.getMessage.contains("format_ns requires exactly 1 argument"),
        e.getMessage)
    } finally {
      SparkSession.setDefaultSession(orig)
      SparkSession.setActiveSession(orig)
    }
  }

  test("format_ns stays inside whole-stage codegen and handles nulls") {
    // parquet-backed so the projection isn't constant-folded away
    val ev = graft.storage.Tables.read(spark, "/root/testdata/sf0.001", "events")
    val out = ev.select(format_ns($"ts").as("s"))
    // the starred node prefix marks whole-stage-codegen participation
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project [format_ns"), plan)
    assert(out.count() == 1000)
    assert(out.collect().forall(_.getString(0).matches(
      """\d{4}-\d{2}-\d{2}T\d{2}:\d{2}:\d{2}\.\d{9}\+00:00""")))
    // null propagation
    val rows = Seq(Some(1650931200000000010L), None).toDF("ts")
      .select(format_ns($"ts").as("s")).collect()
    assert(rows(0).getString(0).startsWith("2022-04-26"))
    assert(rows(1).isNullAt(0))
  }

  test("graft_route TVF: budget routing in plain SQL equals the " +
      "programmatic router, key predicate included; bad args loud") {
    import spark.implicits._
    val H = 3600L * 1000000000L
    val Day = 86400L * 1000000000L
    val base = SparkTestBase.tempDir("graft-tvf")
    val rawP = base + "/raw"
    val stP = base + "/store"
    Seq((1L * H, 10.25, "web"), (25L * H, 7.77, "db"),
      (26L * H, 100.01, "web"), (49L * H, 0.02, "db"))
      .toDF("ts", "value", "host").write.parquet(rawP)
    graft.storage.RollupStore.tierOff(spark, rawP, stP, cutoff = Day,
      bucketNanos = H, keyCols = Seq("host"))
    GraftExtensions.registerRouteTvf(spark)
    def viaSql(extra: String) = spark.sql(
      s"SELECT host, bucket_ts, n, sum_c, grain_ns, source FROM " +
        s"graft_route('$stP', '$rawP', 0, ${3 * Day}, 3$extra) " +
        "ORDER BY host, bucket_ts").collect().toSeq
    val direct = graft.storage.RollupStore.route(spark, stP,
        spark.read.parquet(rawP), 0L, 3 * Day, 3)
      .select("host", "bucket_ts", "n", "sum_c", "grain_ns", "source")
      .orderBy("host", "bucket_ts").collect().toSeq
    assert(viaSql("") == direct)
    assert(viaSql(", \"host = 'db'\"") ==
      direct.filter(_.getString(0) == "db"))
    // a stock-SQL-only surface still fails loudly on a non-key predicate
    val ex = intercept[Exception] {
      spark.sql(s"SELECT * FROM graft_route('$stP', '$rawP', 0, " +
        s"${3 * Day}, 3, 'sum_c > 5')").collect()
    }
    assert(ex.getMessage.contains("non-key column"), ex.getMessage)
    // raw-less single store: rejected with the dispatch contract
    val ex2 = intercept[Exception] {
      spark.sql(s"SELECT * FROM graft_route('$stP', '', 0, " +
        s"${3 * Day}, 3)").collect()
    }
    assert(ex2.getMessage.contains("cannot route"), ex2.getMessage)
  }

  test("graft_aqp TVF: estimates in plain SQL equal the programmatic " +
      "handle, windowed variant scopes; bad args loud") {
    import spark.implicits._
    val Day = 86400L * 1000000000L
    val p = SparkTestBase.tempDir("graft-aqp-tvf") + "/store"
    val ev = (0L until 400L).map(i =>
      (i, (i % 2) * Day, if (i % 3 == 0) "x" else "y",
        (i % 5).toDouble)).toDF("event_id", "ts", "etype", "value")
    graft.storage.SampleStore.build(ev, p, idCol = "event_id")
    GraftExtensions.registerAqpTvf(spark)
    def cols(df: org.apache.spark.sql.DataFrame) = df
      .select("etype", "n_sample", "est_count", "est_sum_cents")
      .orderBy("etype").collect().toSeq
    val direct = cols(graft.storage.SampleStore.open(spark, p)
      .estimate(Seq("etype"), "value"))
    assert(cols(spark.sql(
      s"SELECT * FROM graft_aqp('$p', 'etype', 'value')")) == direct)
    val windowed = cols(graft.storage.SampleStore.open(spark, p)
      .estimate(Seq("etype"), "value", since = Some(Day)))
    assert(cols(spark.sql(s"SELECT * FROM graft_aqp('$p', 'etype', " +
      s"'value', ${Day}L, ${2 * Day}L)")) == windowed)
    assert(windowed != direct) // the scope really bites
    val ex = intercept[Exception] {
      spark.sql(s"SELECT * FROM graft_aqp('$p', 'etype')").collect()
    }
    assert(ex.getMessage.contains("got 2 arguments"), ex.getMessage)
    val ex2 = intercept[Exception] {
      spark.sql("SELECT * FROM graft_aqp('/nope-absent', 'a', 'v')")
        .collect()
    }
    assert(ex2.getMessage.contains("absent or empty"), ex2.getMessage)
  }
}
