package graft.operators

import graft.T
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Similarity search over the `embeddings` table (array<float> x 64) — the
  * ANN plane of an LLM-data pipeline.
  *
  * Scale design: the brute-force path broadcasts the (small) query set and
  * streams the candidate corpus — a BroadcastNestedLoopJoin whose cost is
  * |corpus| x |queries| map-side work with NO shuffle of the corpus; the LSH
  * path reduces that to a shuffle on (table, bucket) keys, which is how the
  * same plan runs on 10^11 vectors. Cosine is the native codegen'd
  * graft.functions.CosineSim (double accumulation in index order — the oracle
  * replicates the identical IEEE sequence with explicit list arithmetic;
  * DuckDB's builtin list_cosine_similarity accumulates float32 and does NOT
  * match bit-for-bit).
  */
object Similarity {

  /** DuckDB fragment: cosine over 64-dim float lists in index order. */
  private def duckCos(a: String, b: String): String =
    s"""list_sum(list_transform(range(1, 65), i -> $a.embedding[i]::DOUBLE * $b.embedding[i]::DOUBLE))
        / sqrt(list_sum(list_transform(range(1, 65), i -> $a.embedding[i]::DOUBLE * $a.embedding[i]::DOUBLE))
             * list_sum(list_transform(range(1, 65), i -> $b.embedding[i]::DOUBLE * $b.embedding[i]::DOUBLE)))"""

  /** Brute-force cosine top-5: query set = vec_id % 25 == 0 broadcast against
    * the full corpus; rank on rounded cosine with id tie-break. */
  def s01CosineTopK(t: T): DataFrame = {
    import t.spark.implicits._
    graft.functions.Registry.ensure(t.spark)
    val q = t.embeddings.filter($"vec_id" % 25 === 0)
      .select($"vec_id".as("query_id"), $"embedding".as("q_emb"))
    val c = t.embeddings.select($"vec_id".as("neighbor_id"), $"embedding".as("c_emb"))
    val w = Window.partitionBy($"query_id").orderBy($"cosine".desc, $"neighbor_id")
    c.join(broadcast(q), $"query_id" =!= $"neighbor_id")
      .select($"query_id", $"neighbor_id",
        (round(expr("cosine_sim(q_emb, c_emb)"), 4) + lit(0.0)).as("cosine"))
      .withColumn("rk", row_number().over(w))
      .filter($"rk" <= 5)
      .select($"query_id", $"rk".cast("long").as("rk"), $"neighbor_id", $"cosine")
      .orderBy($"query_id", $"rk")
  }

  val s01Oracle: String =
    s"""WITH sims AS (
         SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
                ROUND(${duckCos("a", "b")}, 4) + 0.0 AS cosine
         FROM embeddings a JOIN embeddings b ON a.vec_id % 25 = 0 AND a.vec_id <> b.vec_id),
       ranked AS (
         SELECT query_id, neighbor_id, cosine,
                ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rk
         FROM sims)
       SELECT query_id, CAST(rk AS BIGINT) AS rk, neighbor_id, cosine
       FROM ranked WHERE rk <= 5 ORDER BY query_id, rk"""

  /** LSH-bucketed ANN: 32-bit random-hyperplane signature split into 4 tables
    * of 8 bits; candidates = same-bucket pairs in any table (shuffle on
    * (table, bucket) — the 100 TB path), then exact cosine on candidates. */
  def s02HyperplaneLsh(t: T): DataFrame = {
    import t.spark.implicits._
    graft.functions.Registry.ensure(t.spark)
    val sigs = t.embeddings
      .select($"vec_id", $"embedding", expr("hyperplane_sig(embedding, 32)").as("sig"))
    val bands = sigs.select($"vec_id", $"embedding", expr(
      "explode(transform(sequence(0, 3), t -> struct(t AS tbl, shiftright(sig, t * 8) & 255 AS bucket)))").as("bk"))
      .select($"vec_id", $"embedding", $"bk.tbl".as("tbl"), $"bk.bucket".as("bucket"))
    val qb = bands.filter($"vec_id" % 25 === 0)
      .select($"tbl".as("qt"), $"bucket".as("qb"), $"vec_id".as("query_id"), $"embedding".as("q_emb"))
    val cand = bands.join(qb,
        $"tbl" === $"qt" && $"bucket" === $"qb" && $"query_id" =!= $"vec_id")
      .select($"query_id", $"vec_id".as("neighbor_id"), $"q_emb", $"embedding".as("c_emb"))
      .dropDuplicates("query_id", "neighbor_id")
    cand
      .select($"query_id", $"neighbor_id",
        (round(expr("cosine_sim(q_emb, c_emb)"), 4) + lit(0.0)).as("cosine"))
      .orderBy($"query_id", $"neighbor_id")
  }

  val s02Oracle: String =
    s"""WITH sigs AS (
         SELECT vec_id, embedding,
           list_sum(list_transform(range(0, 32), m ->
             CASE WHEN list_sum(list_transform(range(1, 65), i ->
               embedding[i]::DOUBLE * ((((m + 1) * 37 + i * 101) % 97 % 2) * 2 - 1))) > 0
             THEN 1::BIGINT << m::INT ELSE 0::BIGINT END)) AS sig
         FROM embeddings),
       bands AS (
         SELECT vec_id, embedding, t AS tbl, (sig >> (t * 8)::INT) & 255 AS bucket
         FROM sigs, range(0, 4) r(t)),
       cand AS (
         SELECT DISTINCT q.vec_id AS query_id, c.vec_id AS neighbor_id
         FROM bands q JOIN bands c
           ON q.tbl = c.tbl AND q.bucket = c.bucket
          AND q.vec_id % 25 = 0 AND q.vec_id <> c.vec_id)
       SELECT query_id, neighbor_id, ROUND(${duckCos("a", "b")}, 4) + 0.0 AS cosine
       FROM cand JOIN embeddings a ON a.vec_id = query_id
                 JOIN embeddings b ON b.vec_id = neighbor_id
       ORDER BY query_id, neighbor_id"""

  /** Embedding near-dup: top-20 closest pairs corpus-wide (the exact
    * all-pairs baseline the LSH path approximates). */
  def s03EmbeddingNeardup(t: T): DataFrame = {
    import t.spark.implicits._
    graft.functions.Registry.ensure(t.spark)
    val a = t.embeddings.select($"vec_id".as("vec_a"), $"embedding".as("ea"))
    val b = t.embeddings.select($"vec_id".as("vec_b"), $"embedding".as("eb"))
    a.join(b, $"vec_a" < $"vec_b")
      .select($"vec_a", $"vec_b", (round(expr("cosine_sim(ea, eb)"), 4) + lit(0.0)).as("cosine"))
      .orderBy($"cosine".desc, $"vec_a", $"vec_b")
      .limit(20)
  }

  val s03Oracle: String =
    s"""SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
              ROUND(${duckCos("a", "b")}, 4) + 0.0 AS cosine
       FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
       ORDER BY cosine DESC, vec_a, vec_b LIMIT 20"""

  /** IVF-style ANN: assign every vector to its nearest of 8 fixed centroids
    * (the embeddings with vec_id 0..7 — a real deployment would k-means
    * train these; fixed centroids keep the oracle deterministic), then
    * search only the query's own cluster. Shuffle key = cluster id: the
    * 10^11-vector layout is "partition by cluster, broadcast the probe set".
    * Top-3 per query by rounded cosine. */
  def s04IvfAnn(t: T): DataFrame = {
    import t.spark.implicits._
    graft.functions.Registry.ensure(t.spark)
    val cents = t.embeddings.filter($"vec_id" < 8)
      .select($"vec_id".as("k"), $"embedding".as("c_emb"))
    // nearest centroid per vector: min over (dist, k) — k breaks dist ties
    val assigned = t.embeddings
      .crossJoin(broadcast(cents))
      .select($"vec_id", $"embedding",
        struct(expr("l2_sq(embedding, c_emb)").as("dist"), $"k").as("dk"))
      .groupBy($"vec_id", $"embedding")
      .agg(min($"dk").as("dk"))
      .select($"vec_id", $"embedding", $"dk.k".as("cluster"))
    val q = assigned.filter($"vec_id" % 25 === 0)
      .select($"cluster".as("qc"), $"vec_id".as("query_id"), $"embedding".as("q_emb"))
    val w = Window.partitionBy($"query_id").orderBy($"cosine".desc, $"neighbor_id")
    assigned.join(broadcast(q), $"cluster" === $"qc" && $"query_id" =!= $"vec_id")
      .select($"query_id", $"vec_id".as("neighbor_id"),
        (round(expr("cosine_sim(q_emb, embedding)"), 4) + lit(0.0)).as("cosine"))
      .withColumn("rk", row_number().over(w))
      .filter($"rk" <= 3)
      .select($"query_id", $"rk".cast("long").as("rk"), $"neighbor_id", $"cosine")
      .orderBy($"query_id", $"rk")
  }

  val s04Oracle: String =
    s"""WITH cents AS (SELECT vec_id AS k, embedding AS c_emb FROM embeddings WHERE vec_id < 8),
       assigned AS (
         SELECT vec_id, embedding, k AS cluster FROM (
           SELECT e.vec_id, e.embedding, c.k,
                  ROW_NUMBER() OVER (PARTITION BY e.vec_id ORDER BY
                    list_sum(list_transform(range(1, 65), i ->
                      (e.embedding[i]::DOUBLE - c.c_emb[i]::DOUBLE)
                      * (e.embedding[i]::DOUBLE - c.c_emb[i]::DOUBLE))) ASC, c.k ASC) AS rn
           FROM embeddings e CROSS JOIN cents c)
         WHERE rn = 1),
       pairs AS (
         SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
                ROUND(${duckCos("a", "b")}, 4) + 0.0 AS cosine
         FROM assigned q JOIN assigned c
           ON q.cluster = c.cluster AND q.vec_id % 25 = 0 AND q.vec_id <> c.vec_id
         JOIN embeddings a ON a.vec_id = q.vec_id
         JOIN embeddings b ON b.vec_id = c.vec_id),
       ranked AS (
         SELECT query_id, neighbor_id, cosine,
                ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rk
         FROM pairs)
       SELECT query_id, CAST(rk AS BIGINT) AS rk, neighbor_id, cosine
       FROM ranked WHERE rk <= 3 ORDER BY query_id, rk"""

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "s01_cosine_topk"       -> ((s, d) => s01CosineTopK(T(s, d))),
    "s02_hyperplane_lsh"    -> ((s, d) => s02HyperplaneLsh(T(s, d))),
    "s03_embedding_neardup" -> ((s, d) => s03EmbeddingNeardup(T(s, d))),
    "s04_ivf_ann"           -> ((s, d) => s04IvfAnn(T(s, d))),
  )

  val oracles: Map[String, String] = Map(
    "s01_cosine_topk"       -> s01Oracle,
    "s02_hyperplane_lsh"    -> s02Oracle,
    "s03_embedding_neardup" -> s03Oracle,
    "s04_ivf_ann"           -> s04Oracle,
  )
}
