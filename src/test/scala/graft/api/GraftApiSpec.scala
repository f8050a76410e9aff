package graft.api

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** The facade must work with USER column names — the fixture keys only
  * ever exercise doc_id/text/vec_id/embedding, so this spec renames the
  * columns and asserts the parameterized path produces the same results
  * as the fixture-bound oracle keys.
  */
class GraftApiSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.01"

  test("dedup + text ops accept custom column names") {
    val docs = Tables.documents(spark, sf)
      .withColumnRenamed("doc_id", "id").withColumnRenamed("text", "body")
    val viaApi = Graft.dedup.minhashNearDups(docs, idCol = "id", textCol = "body",
      minJaccard = 0.8).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val viaKey = graft.SparkEntry.queries("llm_dedup_fuzzy")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(viaApi == viaKey && viaApi.nonEmpty)

    val q = Graft.text.quality(docs, idCol = "id", textCol = "body")
    assert(q.columns.toSeq == Seq("doc_id", "n_tok", "ttr_u", "score_u"))
    assert(q.count() == docs.count())
  }

  test("boilerplate ops accept custom column names") {
    val docs = Tables.documents(spark, sf)
      .withColumnRenamed("doc_id", "id").withColumnRenamed("text", "body")
    val viaApi = Graft.text.hotNgrams(docs, n = 5, minDocs = 3,
        idCol = "id", textCol = "body")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val viaKey = graft.SparkEntry.queries("llm_boilerplate_ngrams")(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(viaApi == viaKey && viaApi.nonEmpty)
    val ratios = Graft.text.boilerplateRatio(docs, idCol = "id", textCol = "body")
    assert(ratios.columns.toSeq == Seq("doc_id", "n_grams", "n_hot", "hot_ratio"))
    assert(ratios.filter(col("hot_ratio") > 0).count() > 0,
      "fixture must contain shared spans")
  }

  test("per-key lateness is surfaced on the streams facade") {
    // in-batch (ts, event_id) order is pinned, so a single batch can
    // never self-mark late — full passthrough; the cross-batch drop
    // semantics are pinned by PerKeyWatermarkSpec
    val ev = Tables.events(spark, sf).limit(100)
    val out = Graft.streams.perKeyLateness(ev).toDF()
    assert(out.count() == 100)
    assert(out.columns.toSeq == Seq("user_id", "ts_us", "event_id", "value"))
  }

  test("similarity ops accept custom column names") {
    val emb = Tables.embeddings(spark, sf)
      .withColumnRenamed("vec_id", "id").withColumnRenamed("embedding", "vec")
    val viaApi = Graft.similarity.knnCosine(emb, col("vec_id") < 5, k = 10,
      idCol = "id", vecCol = "vec")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val viaKey = graft.SparkEntry.queries("llm_knn_cosine")(spark, sf)
      .select("qid", "nbr")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(viaApi == viaKey && viaApi.size == 50)
  }

  test("cep skip strategies accept custom column names via the facade") {
    val ev = Tables.events(spark, sf)
      .withColumnRenamed("user_id", "uid").withColumnRenamed("ts", "at")
      .withColumnRenamed("event_id", "eid")
    val viaApi = Graft.cep.cepSkipPastLast(ev, "uid", "at", "eid",
        col("event_type") === "view", col("event_type") === "purchase",
        withinUs = 2L * 3600L * 1000000L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val viaKey = graft.SparkEntry.queries("cep_skip_past_last")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(viaApi == viaKey && viaApi.nonEmpty)
  }

  test("sketch facade exposes the portable UDAF family") {
    val sp = spark
    import sp.implicits._
    val xs = Tables.orders(spark, sf).select(col("o_custkey")).as[Long]
    val n = xs.count()
    val cms = new Graft.sketch.CountMin(4, 512)
    val cells = xs.select(cms.toColumn.name("sk")).head()
    assert(cells.size == 4 * 512)
    // every sketch row receives one increment per input row
    assert(cells.slice(0, 512).sum == n)
    val bk = new Graft.sketch.BottomK(64)
    val sk = xs.select(bk.toColumn.name("sk")).head()
    assert(sk.size == 64 && sk == sk.sorted)
  }

  test("complete joins and the det ANN tier are reachable via the facade") {
    val docs = Tables.documents(spark, sf)
      .withColumnRenamed("doc_id", "id").withColumnRenamed("text", "body")
    val viaApi = Graft.dedup.jaccardPairsComplete(docs, tNum = 4, tDen = 5,
        idCol = "id", textCol = "body")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val viaKey = graft.SparkEntry.queries("llm_dedup_ngram_complete")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(viaApi == viaKey && viaApi.nonEmpty)

    val emb = Tables.embeddings(spark, sf)
      .withColumnRenamed("vec_id", "id").withColumnRenamed("embedding", "vec")
    val viaApi2 = Graft.similarity.knnIvfDet(emb, isQuery = col("vec_id") < 5,
        k = 10, idCol = "id", vecCol = "vec")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(3))).toSet
    val viaKey2 = graft.SparkEntry.queries("llm_knn_ivf_det")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(3))).toSet
    assert(viaApi2 == viaKey2 && viaApi2.size == 50)
  }

  test("bpe training and domain mix accept custom column names") {
    val docs = Tables.documents(spark, sf)
      .withColumnRenamed("doc_id", "id").withColumnRenamed("text", "body")
      .withColumnRenamed("source", "domain")
    val viaApi = Graft.text.bpeTrain(docs, nMerges = 3,
        idCol = "id", textCol = "body")
      .collect().map(r => (r.getInt(0), r.getString(3))).toSet
    val viaKey = graft.SparkEntry.queries("llm_bpe_train")(spark, sf)
      .filter(col("rank") <= 3)
      .collect().map(r => (r.getInt(0), r.getString(3))).toSet
    assert(viaApi == viaKey && viaApi.size == 3)

    val mix = Graft.sample.domainMixPlan(docs,
      wRaw = (regexp_extract(col("stratum"), "([0-9]+)", 1).cast("int") % 4) + 1,
      stratumCol = "domain", textCol = "body")
    assert(mix.columns.contains("domain") && mix.count() == 20)
  }

  test("view maintenance accepts custom key/group names via the facade") {
    val sp = spark
    import sp.implicits._
    val oldS = Seq((1L, "a", 2L), (2L, "a", 4L), (3L, "b", 6L))
      .toDF("rk", "g", "v")
    val newS = Seq((1L, "a", 2L), (2L, "b", 5L), (4L, "a", 8L))
      .toDF("rk", "g", "v")
    val deltas = Graft.views.rowDeltas(oldS, newS, Seq("rk"), Seq("g", "v"))
    val view0 = oldS.groupBy("g").agg(count(lit(1)).as("cnt"),
      sum("v").as("sum_v"), min("v").as("min_v"), max("v").as("max_v"))
    val got = Graft.views.maintainAggView(view0, deltas, newS,
        Seq("g"), Seq("v"), Seq("v"))
      .collect().map(_.toSeq).toSet
    val want = newS.groupBy("g").agg(count(lit(1)).as("cnt"),
      sum("v").as("sum_v"), min("v").as("min_v"), max("v").as("max_v"))
      .collect().map(_.toSeq).toSet
    assert(got == want && got.size == 2)
  }
}
