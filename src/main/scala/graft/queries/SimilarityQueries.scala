package graft.queries

import graft.{Q, Tables}
import graft.functions.Hashes
import graft.operators.MultimodalOps
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Embedding similarity search + multimodal columns (SURVEY.md §2.10
  * L3/L5). Cosine math rides codegen'd higher-order functions
  * (`zip_with` dot product, `aggregate` fold) — a left-to-right double
  * fold in both engines, so `round(...,6)` outputs hash-match DuckDB.
  *
  * DuckDB's own `list_cosine_similarity` computes in float32 (≈3e-8 off
  * the double formula — verified), so every oracle spells out the same
  * explicit double formula instead.
  *
  * @note scale: brute-force kNN broadcast-joins the (small) query set
  *   against a partitioned corpus — linear scan per query, no shuffle of
  *   the corpus. At 100 TB the scale path is the LSH/IVF variant
  *   ([[knnIvf]]): a cheap clustering pass prunes the scan to nearby
  *   cells; the brute-force form stays as the in-cell kernel. The
  *   all-pairs `embCos` is oracle-bound small here; production near-dup
  *   at scale goes through the same banding as MinHash.
  */
object SimilarityQueries {

  /** vec_id, v (double array), nrm (L2 norm). */
  private def normed(emb: DataFrame): DataFrame =
    emb.select(col("vec_id"),
        expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("v"))
      .withColumn("nrm", sqrt(expr("vec_dot(v, v)")))

  private val oNormed =
    """n AS (SELECT vec_id, v, sqrt(list_sum(list_transform(v, x -> x*x))) AS nrm
      |      FROM (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      |            FROM embeddings))""".stripMargin

  // ------------------------------------------------------------ L3 brute-force kNN
  /** Top-10 cosine neighbors for query vectors vec_id < 5. */
  private val knnCosine = Q(
    "llm_knn_cosine",
    s"""WITH $oNormed,
       |q AS (SELECT vec_id AS qid, v AS qv, nrm AS qn FROM n WHERE vec_id < 5),
       |x AS (SELECT q.qid, n.vec_id AS nbr,
       |        round(list_sum(list_transform(list_zip(n.v, q.qv), p -> p[1]*p[2]))
       |              / (n.nrm * q.qn), 6) AS cos
       |      FROM n CROSS JOIN q WHERE n.vec_id != q.qid),
       |r AS (SELECT *, row_number() OVER (PARTITION BY qid ORDER BY cos DESC, nbr) AS rk FROM x)
       |SELECT qid, nbr, cos, CAST(rk AS INT) AS rk FROM r WHERE rk <= 10
       |ORDER BY qid, rk""".stripMargin) { (s, d) =>
    val n = normed(Tables.embeddings(s, d))
    val q = n.filter(col("vec_id") < 5)
      .select(col("vec_id").as("qid"), col("v").as("qv"), col("nrm").as("qn"))
    val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("vec_id"))
    n.crossJoin(broadcast(q)).filter(col("vec_id") =!= col("qid"))
      .withColumn("cos", round(expr("vec_dot(v, qv)") / (col("nrm") * col("qn")), 6))
      .withColumn("rk", row_number().over(w)).filter(col("rk") <= 10)
      .select(col("qid"), col("vec_id").as("nbr"), col("cos"), col("rk").cast("int").as("rk"))
      .orderBy("qid", "rk")
  }

  // ------------------------------------------------------------ embedding near-dup
  /** All vector pairs with cosine > 0.45 (threshold chosen from the
    * verified corpus distribution: 14 pairs at sf0.01, max 0.513). */
  private val embCos = Q(
    "llm_dedup_embcos",
    s"""WITH $oNormed,
       |p AS (SELECT a.vec_id AS ai, b.vec_id AS bi,
       |        round(list_sum(list_transform(list_zip(a.v, b.v), x -> x[1]*x[2]))
       |              / (a.nrm * b.nrm), 6) AS cos
       |      FROM n a JOIN n b ON a.vec_id < b.vec_id)
       |SELECT ai, bi, cos FROM p WHERE cos > 0.45 ORDER BY ai, bi""".stripMargin) { (s, d) =>
    val n = normed(Tables.embeddings(s, d))
    n.as("a").join(n.as("b"), col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("ai"), col("b.vec_id").as("bi"),
        round(expr("vec_dot(a.v, b.v)") / (col("a.nrm") * col("b.nrm")), 6).as("cos"))
      .filter(col("cos") > 0.45)
      .orderBy("ai", "bi")
  }

  // ------------------------------------------------------------ IVF-style ANN (scale path)
  /** Approximate kNN: IVF-style coarse quantization. Vectors vec_id < 16
    * act as fixed coarse centroids; every vector is assigned to its
    * nearest centroid cell, and each query scans only its 4 nearest
    * cells. Engine-specific by construction (no SQL oracle — the driver
    * applies the rows-only check); `SimilaritySpec` asserts recall vs
    * the exact brute force.
    *
    * @note scale: this is the 100 TB path — the scan per query drops
    *   from N to N·(nprobe/ncells) with one extra broadcast join; cells
    *   are the partitioning key, so each query's probe is a pruned
    *   partition scan, not a full shuffle. */
  private val knnIvf = Q.noOracle("llm_knn_ivf") { (s, d) =>
    val n = normed(Tables.embeddings(s, d))
    val cents = n.filter(col("vec_id") < 16)
      .select(col("vec_id").as("cid"), col("v").as("cv"), col("nrm").as("cn"))
    def cosTo(v: String, nrm: String, cv: String, cn: String) =
      expr(s"vec_dot($v, $cv)") / (col(nrm) * col(cn))
    // assign every vector to its nearest centroid cell
    val wAssign = Window.partitionBy(col("vec_id")).orderBy(col("ccos").desc, col("cid"))
    val assigned = n.crossJoin(broadcast(cents))
      .withColumn("ccos", cosTo("v", "nrm", "cv", "cn"))
      .withColumn("crk", row_number().over(wAssign)).filter(col("crk") === 1)
      .select(col("vec_id"), col("v"), col("nrm"), col("cid"))
    // queries probe their 4 nearest cells
    val q = n.filter(col("vec_id") < 5)
      .select(col("vec_id").as("qid"), col("v").as("qv"), col("nrm").as("qn"))
    val wProbe = Window.partitionBy(col("qid")).orderBy(col("qcos").desc, col("cid"))
    val probes = q.crossJoin(broadcast(cents))
      .withColumn("qcos", cosTo("qv", "qn", "cv", "cn"))
      .withColumn("prk", row_number().over(wProbe)).filter(col("prk") <= 4)
      .select(col("qid"), col("qv"), col("qn"), col("cid"))
    // in-cell brute force
    val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("vec_id"))
    assigned.join(broadcast(probes), "cid").filter(col("vec_id") =!= col("qid"))
      .withColumn("cos", round(cosTo("v", "nrm", "qv", "qn"), 6))
      .withColumn("rk", row_number().over(w)).filter(col("rk") <= 10)
      .select(col("qid"), col("vec_id").as("nbr"), col("cos"), col("rk").cast("int").as("rk"))
      .orderBy("qid", "rk")
  }

  // ------------------------------------------------------------ L5 multimodal join
  /** One record carrying text + vector + scalars: documents ⋈ embeddings
    * projected through a nested struct (proving the StructType path),
    * then flattened for the oracle. */
  private val multimodalJoin = Q(
    "llm_multimodal_join",
    """SELECT d.doc_id, e.vec_id, d.lang,
      |  CAST(length(d.text) AS INT) AS n_chars2,
      |  CAST(len(e.embedding) AS INT) AS dim,
      |  round(sqrt(list_sum(list_transform(e.embedding, x -> CAST(x AS DOUBLE)*CAST(x AS DOUBLE)))), 6) AS l2
      |FROM documents d JOIN embeddings e ON d.doc_id = e.vec_id
      |ORDER BY d.doc_id""".stripMargin) { (s, d) =>
    val docs = Tables.documents(s, d)
    val emb = Tables.embeddings(s, d)
    docs.join(emb, docs("doc_id") === emb("vec_id"))
      .select(col("doc_id"), col("vec_id"),
        struct(col("text"), col("lang"), col("embedding")).as("rec"))
      .select(col("doc_id"), col("vec_id"), col("rec.lang").as("lang"),
        length(col("rec.text")).as("n_chars2"),
        size(col("rec.embedding")).as("dim"),
        round(sqrt(aggregate(col("rec.embedding"), lit(0.0),
          (a, x) => a + x.cast("double") * x.cast("double"))), 6).as("l2"))
      .orderBy("doc_id")
  }

  // ------------------------------------------------------------ multimodal features
  /** Binary-column feature extraction through the typed mapPartitions
    * pipeline ([[MultimodalOps]]): payload bytes → (byte length, rolling
    * hash over the bytes). The oracle recomputes both from the text
    * column: `octet_length(encode(text))` is byte-exact; the hash fold
    * agrees because the corpus is ASCII (byte == codepoint) — the same
    * documented domain bound as [[Hashes.polyHash]]. */
  private val multimodalFeatures = Q(
    "llm_multimodal_features",
    s"""SELECT doc_id, CAST(octet_length(encode(text)) AS INT) AS n_bytes,
       |  ${Hashes.oPolyHash("text")} AS content_hash
       |FROM documents ORDER BY doc_id""".stripMargin) { (s, d) =>
    MultimodalOps.extractFeatures(MultimodalOps.toMedia(Tables.documents(s, d)))
      .toDF().orderBy("doc_id")
  }

  val all: Seq[Q] = Seq(knnCosine, embCos, knnIvf, multimodalJoin, multimodalFeatures)
}
