package graft.queries

import graft.functions.VectorFunctions
import graft.operators.Similarity
import graft.queries.QuerySpec.read
import org.apache.spark.sql.functions._

/** Embedding similarity-search coverage over `embeddings`
  * (vec_id, embedding: array<float>, label). Cosines computed in double on
  * both engines; rounded before compare.
  */
object VectorQueries {

  /** DuckDB double-precision cosine over float lists. */
  private def duckCosine(a: String, b: String): String =
    s"""(list_dot_product(list_transform($a, x -> CAST(x AS DOUBLE)),
                          list_transform($b, x -> CAST(x AS DOUBLE))) /
        (sqrt(list_dot_product(list_transform($a, x -> CAST(x AS DOUBLE)),
                               list_transform($a, x -> CAST(x AS DOUBLE)))) *
         sqrt(list_dot_product(list_transform($b, x -> CAST(x AS DOUBLE)),
                               list_transform($b, x -> CAST(x AS DOUBLE))))))"""

  val all: Seq[QuerySpec] = Seq(

    // Brute-force cosine top-3 for 10 query vectors (the exact baseline)
    QuerySpec("q36_ann_brute",
      (s, dir) => {
        val emb = read(s, dir, "embeddings")
        Similarity.bruteForceTopK(
          emb, emb.filter(col("vec_id") < 10), "vec_id", "embedding", 3)
          .select(col("query_id"), col("corpus_id"),
            round(col("cosine"), 6).as("cosine"), col("rank"))
          .orderBy("query_id", "rank")
      },
      Some(s"""WITH q AS (SELECT vec_id AS query_id, embedding AS qvec
                 FROM embeddings WHERE vec_id < 10),
             c AS (SELECT vec_id AS corpus_id, embedding AS cvec FROM embeddings),
             s AS (SELECT query_id, corpus_id,
                 ${duckCosine("cvec", "qvec")} AS cos_raw
               FROM c CROSS JOIN q WHERE corpus_id <> query_id),
             r AS (SELECT query_id, corpus_id, cos_raw,
                 row_number() OVER (PARTITION BY query_id
                   ORDER BY cos_raw DESC, corpus_id) AS rank
               FROM s)
             SELECT query_id, corpus_id, round(cos_raw, 6) AS cosine, rank
             FROM r WHERE rank <= 3 ORDER BY query_id, rank""")),

    // IVF/LSH-bucketed ANN: sign-pattern cell on the first 8 dims,
    // candidates restricted to the query's cell (the scale path)
    QuerySpec("q37_ann_bucketed",
      (s, dir) => {
        val emb = read(s, dir, "embeddings")
        Similarity.bucketedTopK(
          emb, emb.filter(col("vec_id") < 10), "vec_id", "embedding", 3, bits = 8)
          .select(col("query_id"), col("corpus_id"),
            round(col("cosine"), 6).as("cosine"), col("rank"))
          .orderBy("query_id", "rank")
      },
      Some(s"""WITH cells AS (SELECT vec_id, embedding,
                 list_sum(list_transform(range(1, 9),
                   i -> CASE WHEN embedding[i] > 0 THEN CAST(pow(2, i - 1) AS BIGINT) ELSE 0 END)) AS cell
               FROM embeddings),
             q AS (SELECT vec_id AS query_id, embedding AS qvec, cell
               FROM cells WHERE vec_id < 10),
             c AS (SELECT vec_id AS corpus_id, embedding AS cvec, cell FROM cells),
             s AS (SELECT query_id, corpus_id,
                 ${duckCosine("cvec", "qvec")} AS cos_raw
               FROM c JOIN q USING (cell) WHERE corpus_id <> query_id),
             r AS (SELECT query_id, corpus_id, cos_raw,
                 row_number() OVER (PARTITION BY query_id
                   ORDER BY cos_raw DESC, corpus_id) AS rank
               FROM s)
             SELECT query_id, corpus_id, round(cos_raw, 6) AS cosine, rank
             FROM r WHERE rank <= 3 ORDER BY query_id, rank""")),

    // Multi-probe bucketed ANN: query probes its cell + all Hamming-1
    // neighbor cells — recovers neighbors lost to one borderline sign flip
    QuerySpec("q58_ann_multiprobe",
      (s, dir) => {
        val emb = read(s, dir, "embeddings")
        Similarity.bucketedTopK(
          emb, emb.filter(col("vec_id") < 10), "vec_id", "embedding", 3,
          bits = 8, probeHamming = 1)
          .select(col("query_id"), col("corpus_id"),
            round(col("cosine"), 6).as("cosine"), col("rank"))
          .orderBy("query_id", "rank")
      },
      Some(s"""WITH cells AS (SELECT vec_id, embedding,
                 list_sum(list_transform(range(1, 9),
                   i -> CASE WHEN embedding[i] > 0 THEN CAST(pow(2, i - 1) AS BIGINT) ELSE 0 END)) AS cell
               FROM embeddings),
             q AS (SELECT vec_id AS query_id, embedding AS qvec, cell
               FROM cells WHERE vec_id < 10),
             c AS (SELECT vec_id AS corpus_id, embedding AS cvec, cell FROM cells),
             s AS (SELECT query_id, corpus_id,
                 ${duckCosine("cvec", "qvec")} AS cos_raw
               FROM c JOIN q ON bit_count(xor(c.cell, q.cell)) <= 1
               WHERE corpus_id <> query_id),
             r AS (SELECT query_id, corpus_id, cos_raw,
                 row_number() OVER (PARTITION BY query_id
                   ORDER BY cos_raw DESC, corpus_id) AS rank
               FROM s)
             SELECT query_id, corpus_id, round(cos_raw, 6) AS cosine, rank
             FROM r WHERE rank <= 3 ORDER BY query_id, rank""")),

    // Embedding-cosine near-duplicate pairs within a cell above threshold
    QuerySpec("q38_cosine_neardup",
      (s, dir) => Similarity.cosineNearDups(
        read(s, dir, "embeddings").filter(col("vec_id") < 300),
        "vec_id", "embedding", threshold = 0.4, bits = 8)
        .select(col("id_a"), col("id_b"), round(col("cosine"), 6).as("cosine"))
        .orderBy("id_a", "id_b"),
      Some(s"""WITH cells AS (SELECT vec_id, embedding,
                 list_sum(list_transform(range(1, 9),
                   i -> CASE WHEN embedding[i] > 0 THEN CAST(pow(2, i - 1) AS BIGINT) ELSE 0 END)) AS cell
               FROM embeddings WHERE vec_id < 300),
             p AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b,
                 ${duckCosine("a.embedding", "b.embedding")} AS cos_raw
               FROM cells a JOIN cells b ON a.cell = b.cell AND a.vec_id < b.vec_id)
             SELECT id_a, id_b, round(cos_raw, 6) AS cosine FROM p
             WHERE cos_raw >= 0.4 ORDER BY id_a, id_b"""))
  )
}
