package graft

import graft.pipeline.Retrieval
import org.scalatest.funsuite.AnyFunSuite

class RetrievalSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private val docs = Seq(
    (1L, "apple apple apple pie"),      // rare term, high tf
    (2L, "apple banana cherry pie"),    // rare term, tf 1
    (3L, "banana banana cherry cherry banana cherry pie pie"), // long, no apple
    (4L, "the the the the the the the the the the the the")    // stopword soup
  ).toDF("doc_id", "text")

  private def q(s: String) = Seq((1L, s)).toDF("query_id", "qtext")

  test("tf dominance: more occurrences of the query term rank higher") {
    val out = Retrieval.bm25(docs, q("apple"), topK = 10).orderBy("rank")
      .collect()
    assert(out.map(_.getAs[Long]("doc_id")).toSeq == Seq(1L, 2L))
    assert(out(0).getAs[Long]("score") > out(1).getAs[Long]("score"))
  }

  test("idf: rare terms outweigh common ones across query terms") {
    // 'pie' is in 3 docs, 'banana' in 2: doc 3 (banana-heavy) must beat
    // doc 2 (one banana) and both beat doc 1 (pie only)
    val out = Retrieval.bm25(docs, q("banana pie"), topK = 10)
      .orderBy("rank").collect()
    val ids = out.map(_.getAs[Long]("doc_id")).toSeq
    assert(ids.indexOf(3L) < ids.indexOf(2L))
    assert(ids.contains(1L)) // pie-only doc still matches via one term
    assert(out.find(_.getAs[Long]("doc_id") == 3L).get
      .getAs[Long]("n_terms") == 2L)
  }

  test("maxDf drops stopword-grade terms from candidate generation") {
    // 'the' appears in 1 doc here but set maxDf=0 to force the drop path
    val out = Retrieval.bm25(docs, q("the apple"), topK = 10, maxDf = 2)
      .collect()
    // 'the' (df 1 <= 2) kept, 'apple' kept: doc 4 matches only via 'the'
    assert(out.map(_.getAs[Long]("doc_id")).toSet == Set(1L, 2L, 4L))
    val none = Retrieval.bm25(docs, q("the"), topK = 10, maxDf = 0)
    assert(none.count() == 0) // every term capped away -> empty result
  }

  test("topK bounds per-query output; ranks are 1..k dense") {
    val out = Retrieval.bm25(docs, q("pie"), topK = 2).orderBy("rank")
      .collect()
    assert(out.length == 2)
    assert(out.map(_.getAs[Long]("rank")).toSeq == Seq(1L, 2L))
  }

  test("stored index: bm25Stored and openBm25Index equal the direct path") {
    val path = SparkTestBase.tempDir("bm25idx") + "/idx"
    Retrieval.writeBm25Index(docs, path, buckets = 8)
    val queries = Seq((1L, "apple pie"), (2L, "banana cherry"))
      .toDF("query_id", "qtext")
    val direct = Retrieval.bm25(docs, queries, topK = 10)
      .orderBy("query_id", "rank").collect().toSeq
    // the term-pruned stored probe: row-identical, score-identical
    val stored = Retrieval.bm25Stored(spark, path, queries, topK = 10)
      .orderBy("query_id", "rank").collect().toSeq
    assert(stored == direct)
    // the whole-index open: same Bm25Index contract as buildIndex
    val opened = Retrieval.bm25With(Retrieval.openBm25Index(spark, path),
      queries, topK = 10).orderBy("query_id", "rank").collect().toSeq
    assert(opened == direct)
  }

  test("rrfFuse: exact integer fusion, missing side contributes zero") {
    // doc 10 ranks 1st in both lists; doc 20 only sparse (rank 2);
    // doc 30 only dense (rank 1). Scores are exact floors of 2^20/(60+r)
    val sparse = Seq((1L, 10L, 1L), (1L, 20L, 2L))
      .toDF("query_id", "doc_id", "rank")
    val dense = Seq((1L, 10L, 2L), (1L, 30L, 1L))
      .toDF("query_id", "doc_id", "rank")
    val out = Retrieval.rrfFuse(sparse, dense, topK = 10)
      .orderBy("rrf_rank").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("rrf_score"),
        r.getAs[Long]("rrf_rank"))).toSeq
    val c = (r: Long) => 1048576L / (60L + r)
    // both-lists doc first (two contributions), then the single-list docs
    assert(out == Seq((10L, c(1) + c(2), 1L), (30L, c(1), 2L),
      (20L, c(2), 3L)))
  }

  test("rrfFuse: ties break on doc id; topK bounds the fused list") {
    val sparse = Seq((1L, 5L, 1L), (1L, 7L, 2L), (1L, 9L, 3L))
      .toDF("query_id", "doc_id", "rank")
    val dense = Seq((1L, 7L, 1L), (1L, 5L, 2L), (1L, 11L, 3L))
      .toDF("query_id", "doc_id", "rank")
    // docs 5 and 7 both score c(1)+c(2) — the tie must break on doc id
    val out = Retrieval.rrfFuse(sparse, dense, topK = 2)
      .orderBy("rrf_rank").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("rrf_rank"))).toSeq
    assert(out == Seq((5L, 1L), (7L, 2L)))
  }

  test("stored index: a crash between the publish renames self-heals") {
    val path = SparkTestBase.tempDir("bm25rec") + "/idx"
    Retrieval.writeBm25Index(docs, path, buckets = 8)
    // simulate the kill window: live moved aside, tmp never promoted
    val live = new java.io.File(path)
    val old = new java.io.File(path + ".build-old")
    assert(live.renameTo(old))
    val out = Retrieval.bm25Stored(spark, path, q("apple"), topK = 10)
      .collect()
    assert(out.nonEmpty) // recovered from .build-old transparently
    assert(live.exists() && !old.exists())
  }
}
