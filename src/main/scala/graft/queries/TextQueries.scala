package graft.queries

import graft.functions.{SimHash64, TextFunctions => TF}
import graft.queries.QuerySpec.read
import org.apache.spark.sql.functions._

/** Training-data-pipeline text operators over `documents`: exact dedup,
  * MinHash+LSH near-dup, n-gram Jaccard, SimHash, language-ID, quality
  * scoring, token counting, fingerprinting. Hashing is md5-based so the
  * DuckDB oracle computes identical values. Near-dup fixtures are built
  * in-query (doc ∪ doc-minus-first-word) — deterministic in both engines.
  */
object TextQueries {

  /** Portable DuckDB 3-gram shingle expression over column `text`. */
  private val duckShingles =
    """CASE WHEN len(words) < 3 THEN [array_to_string(words, ' ')]
       ELSE list_transform(range(1, len(words) - 1),
         i -> words[i] || ' ' || words[i+1] || ' ' || words[i+2]) END"""

  val all: Seq[QuerySpec] = Seq(

    // Exact dedup groups: corpus unioned with itself (shifted ids) so every
    // fingerprint has a known duplicate — md5 group-by at any scale
    QuerySpec("q27_exact_dedup",
      (s, dir) => {
        val d = read(s, dir, "documents").filter(col("doc_id") < 200)
          .select("doc_id", "text")
        val dup = d.select((col("doc_id") + 1000000).as("doc_id"), col("text"))
        d.unionByName(dup)
          .withColumn("fp", TF.fingerprint(col("text")))
          .groupBy("fp")
          .agg(count(lit(1)).as("n_docs"), min("doc_id").as("keep_id"))
          .filter(col("n_docs") > 1)
          .orderBy("keep_id")
      },
      Some("""WITH c AS (
               SELECT doc_id, text FROM documents WHERE doc_id < 200
               UNION ALL
               SELECT doc_id + 1000000, text FROM documents WHERE doc_id < 200)
             SELECT md5(regexp_replace(lower(trim(text)), ' +', ' ', 'g')) AS fp,
               count(*) AS n_docs, min(doc_id) AS keep_id
             FROM c GROUP BY 1 HAVING count(*) > 1 ORDER BY keep_id""")),

    // MinHash signatures (2 of the k hashes shown) — per-row, no shuffle
    QuerySpec("q28_minhash_sig",
      (s, dir) => {
        val sh = TF.shingles(col("text"), 3)
        read(s, dir, "documents").filter(col("doc_id") < 50)
          .select(col("doc_id"),
            TF.minhash(sh, 0).as("mh0"),
            TF.minhash(sh, 1).as("mh1"))
          .orderBy("doc_id")
      },
      Some(s"""WITH w AS (SELECT doc_id, regexp_split_to_array(trim(text), ' +') AS words
               FROM documents WHERE doc_id < 50),
             sh AS (SELECT doc_id, $duckShingles AS shingles FROM w)
             SELECT doc_id,
               list_min(list_transform(shingles, x -> md5('0|' || x))) AS mh0,
               list_min(list_transform(shingles, x -> md5('1|' || x))) AS mh1
             FROM sh ORDER BY doc_id""")),

    // MinHash+LSH near-dup candidate pairs: corpus ∪ near-copies (first
    // word dropped); band-bucket join, signature-agreement estimate
    QuerySpec("q29_lsh_pairs",
      (s, dir) => {
        val base = read(s, dir, "documents").filter(col("doc_id") < 200)
          .select("doc_id", "text")
        val near = base.select((col("doc_id") + 10000).as("doc_id"),
          expr("substring(text, instr(text, ' ') + 1)").as("text"))
        val corpus = base.unionByName(near)
        graft.operators.Dedup.minhashCandidates(corpus, "doc_id", "text",
          shingleN = 3, bands = 4, rowsPerBand = 3,
          minEstJaccard = 0.5, verifyExact = false)
          .select(col("id_a"), col("id_b"), round(col("est_jaccard"), 6).as("est_jaccard"))
          .orderBy("id_a", "id_b")
      },
      Some(s"""WITH c AS (
               SELECT doc_id, text FROM documents WHERE doc_id < 200
               UNION ALL
               SELECT doc_id + 10000, substring(text, strpos(text, ' ') + 1)
               FROM documents WHERE doc_id < 200),
             w AS (SELECT doc_id, regexp_split_to_array(trim(text), ' +') AS words FROM c),
             sh AS (SELECT doc_id, $duckShingles AS shingles FROM w),
             sg AS (SELECT doc_id, list_transform(range(0, 12),
                 s -> list_min(list_transform(shingles, x -> md5(CAST(s AS VARCHAR) || '|' || x)))) AS sig
               FROM sh),
             bd AS (SELECT doc_id, sig, unnest(list_transform(range(0, 4),
                 b -> 'b' || CAST(b AS VARCHAR) || ':' || sig[b*3+1] || sig[b*3+2] || sig[b*3+3])) AS band
               FROM sg),
             pr AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
                 a.sig AS sig_a, b.sig AS sig_b
               FROM bd a JOIN bd b ON a.band = b.band AND a.doc_id < b.doc_id)
             SELECT id_a, id_b,
               round(len(list_filter(range(1, 13), i -> sig_a[i] = sig_b[i])) / 12.0, 6) AS est_jaccard
             FROM pr
             WHERE len(list_filter(range(1, 13), i -> sig_a[i] = sig_b[i])) / 12.0 >= 0.5
             ORDER BY id_a, id_b""")),

    // Exact n-gram Jaccard: doc vs its first-word-dropped copy.
    // repartition before the per-row work: the fixture parquet is ONE row
    // group → a single scan task, and the interpreted higher-order shingle/
    // intersect expressions cost ~20 ms/row — serial, that was ~2 s of
    // wall for 100 rows (measured, round 6). The round-robin exchange of
    // 100 tiny rows is microseconds and the trailing orderBy fixes output
    // order, so the result is unchanged.
    QuerySpec("q30_ngram_jaccard",
      (s, dir) => read(s, dir, "documents").filter(col("doc_id") < 100)
        .repartition(s.sparkContext.defaultParallelism)
        .select(col("doc_id"),
          round(TF.ngramJaccard(col("text"),
            expr("substring(text, instr(text, ' ') + 1)"), 3), 6).as("jaccard"))
        .orderBy("doc_id"),
      Some(s"""WITH p AS (SELECT doc_id,
                 regexp_split_to_array(trim(text), ' +') AS words,
                 regexp_split_to_array(trim(substring(text, strpos(text, ' ') + 1)), ' +') AS words2
               FROM documents WHERE doc_id < 100),
             sh AS (SELECT doc_id,
                 list_distinct($duckShingles) AS sa,
                 list_distinct(CASE WHEN len(words2) < 3 THEN [array_to_string(words2, ' ')]
                   ELSE list_transform(range(1, len(words2) - 1),
                     i -> words2[i] || ' ' || words2[i+1] || ' ' || words2[i+2]) END) AS sb
               FROM p)
             SELECT doc_id, round(
               len(list_filter(sa, x -> list_contains(sb, x))) * 1.0 /
               len(list_distinct(list_concat(sa, sb))), 6) AS jaccard
             FROM sh ORDER BY doc_id""")),

    // SimHash (custom Catalyst expression) + Hamming distance to the
    // near-copy — no SQL oracle (custom expression); rows-only check
    QuerySpec("q31_simhash",
      (s, dir) => read(s, dir, "documents").filter(col("doc_id") < 100)
        .select(col("doc_id"),
          SimHash64.ofText(col("text")).as("simhash"),
          SimHash64.hamming(
            SimHash64.ofText(col("text")),
            SimHash64.ofText(expr("substring(text, instr(text, ' ') + 1)")))
            .as("hamming_to_neardup"))
        .orderBy("doc_id"),
      // DuckDB CAN express simhash: md5 per whitespace token (same digest
      // as SimHash64's per-token hash), first 16 hex chars = the 8
      // big-endian bytes, bit b of the 64-bit hash = bit (b%4) of hex
      // digit (16 - b/4), ±1 majority vote per bit, reassemble with
      // BIGINT shifts (bit 63 via the min-long constant; sum() is
      // HUGEINT — cast back before adding, a double would lose low bits)
      Some("""WITH docs AS (
          SELECT doc_id, text FROM documents WHERE doc_id < 100
        ),
        variants AS (
          SELECT doc_id, 0 AS v, text FROM docs
          UNION ALL
          SELECT doc_id, 1 AS v, substr(text, strpos(text, ' ') + 1) AS text
          FROM docs
        ),
        toks AS (
          SELECT doc_id, v,
                 unnest(regexp_split_to_array(trim(text), ' +')) AS tok
          FROM variants WHERE length(trim(text)) > 0
        ),
        tokhash AS (
          SELECT doc_id, v, substr(md5(tok), 1, 16) AS h16 FROM toks
        ),
        bitsgn AS (
          SELECT doc_id, v, b.bit,
            CASE WHEN ((strpos('0123456789abcdef',
                               substr(h16, 16 - b.bit // 4, 1)) - 1)
                       // (1 << (b.bit % 4))) % 2 = 1
                 THEN 1 ELSE -1 END AS sgn
          FROM tokhash CROSS JOIN (SELECT unnest(range(0, 64)) AS bit) b
        ),
        counts AS (
          SELECT doc_id, v, bit, sum(sgn) AS c FROM bitsgn GROUP BY 1, 2, 3
        ),
        sh AS (
          SELECT doc_id, v,
            (sum(CASE WHEN c > 0 AND bit < 63
                      THEN 1::BIGINT << bit ELSE 0 END)::BIGINT
             + sum(CASE WHEN c > 0 AND bit = 63
                        THEN -9223372036854775807 - 1 ELSE 0 END)::BIGINT)
              AS simhash
          FROM counts GROUP BY 1, 2
        )
        SELECT d.doc_id,
               coalesce(s0.simhash, 0) AS simhash,
               bit_count(xor(coalesce(s0.simhash, 0),
                             coalesce(s1.simhash, 0)))::INT
                 AS hamming_to_neardup
        FROM docs d
        LEFT JOIN sh s0 ON s0.doc_id = d.doc_id AND s0.v = 0
        LEFT JOIN sh s1 ON s1.doc_id = d.doc_id AND s1.v = 1
        ORDER BY d.doc_id""")),

    // Language-ID: marker-word heuristic, deterministic argmax
    QuerySpec("q32_langid",
      (s, dir) => read(s, dir, "documents")
        .withColumn("pred", TF.langId(col("text")))
        .groupBy("lang", "pred").agg(count(lit(1)).as("cnt"))
        .orderBy("lang", "pred"),
      Some({
        val scores = TF.langMarkers.map { case (l, ws) =>
          val terms = ws.map { w =>
            s"((length(p2) - length(replace(p2, ' $w ', ''))) / ${w.length + 2})"
          }.mkString(" + ")
          l -> s"CAST($terms AS BIGINT)"
        }
        val best = scores.map(_._2).mkString("greatest(", ", ", ")")
        val caseExpr = scores.map { case (l, e) =>
          s"WHEN $e = best THEN '$l'"
        }.mkString(" ")
        s"""WITH p AS (SELECT lang,
               replace(' ' || lower(text) || ' ', ' ', '  ') AS p2
             FROM documents),
           sc AS (SELECT lang, $best AS best,
               ${scores.map { case (l, e) => s"$e AS s_$l" }.mkString(", ")}
             FROM p),
           pr AS (SELECT lang, CASE WHEN best = 0 THEN 'und'
               ${scores.map { case (l, _) => s"WHEN s_$l = best THEN '$l'" }.mkString(" ")}
               ELSE 'und' END AS pred
             FROM sc)
           SELECT lang, pred, count(*) AS cnt FROM pr GROUP BY 1, 2 ORDER BY 1, 2"""
      })),

    // Quality score per document — portable column arithmetic
    QuerySpec("q33_quality",
      (s, dir) => read(s, dir, "documents").filter(col("doc_id") < 100)
        .select(col("doc_id"), TF.qualityScore(col("text")).as("quality"))
        .orderBy("doc_id"),
      Some("""WITH p AS (SELECT doc_id, trim(text) AS t,
                 replace(' ' || lower(trim(text)) || ' ', ' ', '  ') AS p2
               FROM documents WHERE doc_id < 100),
             m AS (SELECT doc_id,
                 CAST(length(t) AS DOUBLE) AS n_chars,
                 CAST(CASE WHEN length(t) = 0 THEN 0
                   ELSE length(regexp_replace(t, ' +', ' ', 'g'))
                      - length(regexp_replace(t, ' +', '', 'g')) + 1 END AS DOUBLE) AS n_tok,
                 CAST(length(t) - length(regexp_replace(t, '[^a-z0-9 ]', '', 'g')) AS DOUBLE) AS punct,
                 CAST((length(p2) - length(replace(p2, ' the ', ''))) / 5
                    + (length(p2) - length(replace(p2, ' and ', ''))) / 5
                    + (length(p2) - length(replace(p2, ' of ', ''))) / 4 AS BIGINT) AS stop_hits
               FROM p)
             SELECT doc_id, round(
               least(n_chars / 500.0, 1.0) * 0.3 +
               (CASE WHEN n_tok > 0 AND n_chars / n_tok BETWEEN 3.0 AND 10.0
                     THEN 1.0 ELSE 0.5 END) * 0.2 +
               (1.0 - least((CASE WHEN n_chars > 0 THEN punct / n_chars ELSE 1.0 END) * 5.0, 1.0)) * 0.3 +
               least((CASE WHEN n_tok > 0 THEN stop_hits / n_tok ELSE 0.0 END) * 10.0, 1.0) * 0.2, 6) AS quality
             FROM m ORDER BY doc_id""")),

    // Token counting: whitespace + BPE-ish subword, summed per lang
    // repartition before the regex-heavy per-row token counters (same
    // single-row-group serial-scan rationale as q30; the groupBy output
    // is partition-order independent)
    QuerySpec("q34_token_counts",
      (s, dir) => read(s, dir, "documents")
        .repartition(s.sparkContext.defaultParallelism)
        .groupBy("lang")
        .agg(sum(TF.tokenCount(col("text"))).as("ws_tokens"),
          sum(TF.subwordTokenCount(col("text"))).as("subword_tokens"))
        .orderBy("lang"),
      Some("""SELECT lang,
               CAST(sum(CASE WHEN length(trim(text)) = 0 THEN 0
                 ELSE length(regexp_replace(trim(text), ' +', ' ', 'g'))
                    - length(regexp_replace(trim(text), ' +', '', 'g')) + 1 END) AS BIGINT) AS ws_tokens,
               CAST(sum(len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9 ]', 0))) AS BIGINT) AS subword_tokens
             FROM documents GROUP BY 1 ORDER BY 1""")),

    // Document fingerprints: exact md5 + winnowing-style bottom-k of char
    // 5-gram hashes (joined to one string for portable comparison)
    QuerySpec("q35_fingerprint",
      (s, dir) => read(s, dir, "documents").filter(col("doc_id") < 100)
        .select(col("doc_id"),
          TF.fingerprint(col("text")).as("fp"),
          array_join(TF.bottomK(col("text"), 5, 3), ",").as("bottom3"))
        .orderBy("doc_id"),
      Some("""WITH p AS (SELECT doc_id,
                 regexp_replace(lower(trim(text)), ' +', ' ', 'g') AS t
               FROM documents WHERE doc_id < 100)
             SELECT doc_id, md5(t) AS fp,
               array_to_string(
                 list_sort(list_transform(range(1, greatest(length(t) - 4, 1) + 1),
                   i -> md5(substring(t, i, 5))))[1:3], ',') AS bottom3
             FROM p ORDER BY doc_id"""))
  )
}
