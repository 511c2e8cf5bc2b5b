package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic synthetic Common-Crawl-style pages table (FIXTURES.md §1,
  * BASELINE.json input_hint): (url, warc_ts, html binary, text, lang).
  *
  * Generated distributed from `spark.range` — every field is a pure
  * function of the row id via md5 arithmetic, so any scale regenerates
  * byte-identically on any partition count (no rand(), no
  * monotonically_increasing_id — determinism rule SURVEY.md §7.6(5)).
  *
  * Planted anomalies (drive every check family):
  *  - ~0.1% of rows are exact duplicates of their predecessor (url+text)
  *    → Uniqueness / exact-dedup violations;
  *  - hosts Zipf-skewed (u³ law) → hot-key path for the uniqueness agg;
  *  - host-id overflow on ~0.5% of rows → hosts absent from the dim table
  *    → Referential violations;
  *  - one (quarter, host-bucket) panel gets a shifted lang distribution
  *    → CategoricalConsistency / Drift violations;
  *  - ~1/5000 rows get a 10× longer text → n_chars regression outliers;
  *  - host 3's `score` is 30% terminal-zero at the tenths place
  *    → DigitPreference GOF flag;
  *  - text = short dictionary skeleton + a DOMINANT doc-unique word block
  *    (long-tail vocabulary, like real web text — without it every doc is
  *    simhash-near every other and near-dup bucketing goes quadratic);
  *    ~1/2000 rows clone their predecessor's text plus one extra token →
  *    planted NEAR-duplicates (small simhash Hamming, distinct urls) for
  *    the NearDupCheck.
  */
object Pages {

  val Dict: Seq[String] = Seq(
    "data", "web", "page", "crawl", "text", "index", "link", "host", "word",
    "news", "shop", "wiki", "blog", "forum", "image", "video", "query", "tag")

  val Langs: Seq[String] = Seq("en", "de", "fr", "es", "zh")
  val NumHosts = 100

  /** Constant word corpus for text slicing (long enough for the planted
    * 3000-char outliers starting anywhere in the first half). */
  val Corpus: String = {
    val cycle = Dict ++ Dict.reverse ++ Dict.sorted ++ Dict.sortBy(_.length)
    Iterator.continually(cycle).flatten.take(1600).mkString(" ")
  }
  val CorpusLen: Int = Corpus.length
  private def corpusSql: String = "'" + Corpus + "'"
  val PlantedQuarter = "2023 Q3"
  val PlantedHostBucket = 1

  /** Uniform-ish [0,1) doubles derived from md5(id | salt). */
  private def u(salt: Int, idCol: String = "base_id") =
    conv(substring(md5(concat_ws("|", col(idCol), lit(salt))), 1, 6), 16, 10)
      .cast("double") / lit(16777216.0)

  def generate(spark: SparkSession, nRows: Long, numPartitions: Int = 32): DataFrame = {
    val ids = spark.range(0, nRows, 1, numPartitions)
    ids
      // duplicate planting: row 1000k+999 clones row 1000k+998
      .withColumn("base_id",
        when(col("id") % 1000 === 999, col("id") - 1).otherwise(col("id")))
      .withColumn("u_host", u(1))
      .withColumn("u_ts", u(2))
      .withColumn("u_lang", u(3))
      .withColumn("u_score", u(4))
      // Zipf-ish skew: u³ piles mass onto low host ids (host 0 hottest);
      // ~0.5% overflow into ids >= NumHosts (absent from the dim table)
      .withColumn("host_id",
        when(u(6) < 0.005, (floor(col("u_host") * 50) + NumHosts).cast("int"))
          .otherwise(floor(pow(col("u_host"), 3.0) * NumHosts).cast("int")))
      .withColumn("host_bucket", pmod(col("host_id"), lit(4)))
      .withColumn("warc_ts",
        timestamp_seconds(lit(1672531200L) + (col("u_ts") * lit(86400L * 728)).cast("long")))
      .withColumn("quarter", concat(year(col("warc_ts")), lit(" Q"),
        ceil(month(col("warc_ts")) / 3.0).cast("int")))
      // lang: baseline multinomial; planted panel shifts mass to "zh"
      .withColumn("lang",
        when(col("quarter") === PlantedQuarter && col("host_bucket") === PlantedHostBucket,
          when(col("u_lang") < 0.55, "zh").when(col("u_lang") < 0.70, "en")
            .when(col("u_lang") < 0.82, "de").when(col("u_lang") < 0.92, "fr").otherwise("es"))
          .otherwise(
            when(col("u_lang") < 0.45, "en").when(col("u_lang") < 0.65, "de")
              .when(col("u_lang") < 0.80, "fr").when(col("u_lang") < 0.92, "es").otherwise("zh")))
      // text: substring of a constant word corpus at an id-derived offset —
      // stays inside whole-stage codegen (a per-word higher-order transform
      // would be interpreted per element: ~10× slower generation);
      // ~1/5000 rows get a 10× longer text (planted n_chars outlier).
      // All text inputs derive from src_id: the near-dup rows (~1/2000)
      // clone their predecessor's text and append one token, so they are
      // near (not exact) duplicates with their own url/score/ts.
      .withColumn("src_id",
        when(pmod(col("base_id"), lit(2000)) === 7, col("base_id") - 1)
          .otherwise(col("base_id")))
      .withColumn("u_len", u(5, "src_id"))
      .withColumn("n_chars_target",
        when(pmod(col("src_id"), lit(4999)) === 17, lit(3000))
          .otherwise((lit(100) + col("u_len") * 200).cast("int")))
      // Doc-unique pseudo-words must DOMINATE the token mass: real web text
      // has a long-tail vocabulary, and simhash NEEDS it. With the 18-word
      // dictionary dominating, every doc's token-frequency vector points
      // the same way (pairwise cos ≈ 0.8 → E[Hamming] ≈ 13), sims cluster,
      // and near-dup bucketing degenerates to quadratic pair volume
      // (measured: 2×10¹⁰ capped candidate pairs and >1M spurious "near"
      // drops at 2M rows). A short fixed dictionary skeleton (~8 words)
      // plus a doc-unique block sized to the length target keeps pairwise
      // cos ≤ ~0.4 → E[Hamming] ≥ ~20 while planted near-clones (one extra
      // token) stay at E[Hamming] ≈ 2. The unique block comes from 12
      // xxhash64 calls (cheap, codegen'd) split into 4-char words; the
      // 10×-long outlier texts pad by repeating the doc's own block
      // (repeats change multiplicities, not the direction of the vector).
      .withColumn("uid_base",
        trim(regexp_replace(
          concat((1 to 12).map(k => hex(xxhash64(col("src_id"), lit(k)))): _*),
          "(.{4})", "$1 ")))
      .withColumn("text",
        concat(
          trim(expr(s"substring(${corpusSql}, " +
            s"cast(pmod(src_id * 37 + 11, ${CorpusLen / 2}) as int) + 1, 40)")),
          lit(" "),
          repeat(concat(col("uid_base"), lit(" ")), 16)
            .substr(lit(1), greatest(col("n_chars_target") - lit(40), lit(60))),
          when(pmod(col("base_id"), lit(2000)) === 7, lit(" nearpad"))
            .otherwise(lit(""))))
      .withColumn("n_chars", length(col("text")))
      // score: 2-decimal values; planted terminal-digit anomalies —
      // host 3: 30% of values snapped to tenths digit 5 (GOF flag);
      // host 7: 40% integer-recorded → sentinel "None" share flag
      .withColumn("score_raw", round(col("u_score") * 100, 2))
      .withColumn("score",
        when(col("host_id") === 3 && u(7) < 0.3, floor(col("score_raw")) + 0.5)
          .when(col("host_id") === 7 && u(7) < 0.4, round(col("score_raw")).cast("double"))
          .otherwise(col("score_raw")))
      .withColumn("url",
        concat(lit("https://host"), col("host_id"), lit(".example/p/"), col("base_id")))
      .withColumn("html",
        to_binary(md5(concat(lit("html|"), col("url"))), lit("hex")))
      .select("url", "warc_ts", "html", "text", "n_chars", "lang", "host_id", "host_bucket", "score")
  }

  /** Referential dimension: registry of allowed hosts (FIXTURES.md §2). */
  def hosts(spark: SparkSession): DataFrame = {
    import spark.implicits._
    (0 until NumHosts).map(h => (s"host$h.example", h, if (h % 3 == 0) "tier1" else "tier2"))
      .toDF("host", "host_id", "crawl_tier")
  }
}
