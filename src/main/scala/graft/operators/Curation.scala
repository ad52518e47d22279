package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Corpus-curation operators — the steps a large-scale training-data
  * pipeline runs AFTER detection/scoring: applying a dedup keep-policy,
  * stratified sampling, PII redaction, and embedding aggregation. All are
  * declarative DataFrame plans (joins + aggs, no UDFs); each is oracled in
  * DuckDB end-to-end.
  */
object Curation {
  private type Q = (SparkSession, String) => DataFrame

  /** Apply the near-dup cluster keep-policy to the corpus: every doc whose
    * cluster label is not itself (a non-keeper) is removed; output is the
    * per-language survival summary. The non-keeper set is tiny relative to
    * the corpus (only docs that appear in verified near-dup pairs), so at
    * 100 TB both the semi- and anti-join broadcast it — one corpus scan,
    * no corpus shuffle.
    */
  val dedupApply: Q = (s, d) => {
    val nonKeepers = Llm.dedupCluster(s, d)
      .filter(!col("is_keeper")).select(col("doc_id"))
    val docs = Tables.documents(s, d)
    val kept = docs.join(broadcast(nonKeepers), Seq("doc_id"), "left_anti")
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_kept"), sum(col("n_chars")).as("chars_kept"))
    val removed = docs.join(broadcast(nonKeepers), Seq("doc_id"), "left_semi")
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_removed"))
    kept.join(removed, Seq("lang"), "left")
      .select(col("lang"), col("n_kept"),
        coalesce(col("n_removed"), lit(0L)).as("n_removed"), col("chars_kept"))
      .orderBy(col("lang"))
  }

  /** Deterministic stratified sampling: each language stratum keeps the
    * docs whose multiplicative hash of doc_id lands under the stratum's
    * per-mille threshold. The hash (Knuth multiplicative constant, mod
    * 1000) is pure integer arithmetic — identical in every engine and
    * stable across reruns, which is what makes a 100 TB sample
    * reproducible; sampling is a narrow map + filter, no shuffle until
    * the summary agg.
    */
  val sampleStratified: Q = (s, d) => {
    val rates = Seq(("en", 250), ("de", 500), ("es", 500), ("fr", 750), ("zh", 100))
    import s.implicits._
    val dim = rates.toDF("lang", "keep_permille")
    val docs = Tables.documents(s, d)
      .withColumn("h", pmod(col("doc_id") * lit(2654435761L), lit(1000)))
    docs.join(broadcast(dim), Seq("lang"))
      .groupBy(col("lang"), col("keep_permille"))
      .agg(
        count(lit(1)).as("n_total"),
        count(when(col("h") < col("keep_permille"), 1)).as("n_sampled"),
        sum(when(col("h") < col("keep_permille"), col("n_chars"))).as("chars_sampled"))
      .orderBy(col("lang"))
  }

  /** PII redaction: emails and phone-like tokens are replaced with typed
    * placeholders and counted. The PII-bearing text is synthesized per-row
    * from customer (the corpus text fixture has none, deliberately), so the
    * oracle reproduces both the redacted text md5 and the counts from the
    * same source columns. regexp_replace/regexp_count are codegen'd — the
    * scan-speed transform shape a 100 TB scrub needs.
    */
  val piiRedact: Q = (s, d) => {
    val emailRe = "[A-Za-z0-9._]+@[A-Za-z0-9.]+"
    val phoneRe = "555-[0-9]{4}"
    val made = Tables.customer(s, d)
      .withColumn("text", concat(
        lit("Contact "), col("c_name"),
        lit(" at user"), col("c_custkey"), lit("@example.com or call 555-"),
        lpad(pmod(col("c_custkey"), lit(10000)).cast("string"), 4, "0"),
        lit(" now")))
    made
      .withColumn("redacted",
        regexp_replace(regexp_replace(col("text"), emailRe, "<EMAIL>"),
          phoneRe, "<PHONE>"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(regexp_count(col("text"), lit(emailRe))).as("n_emails"),
        sum(regexp_count(col("text"), lit(phoneRe))).as("n_phones"),
        count(when(col("redacted").rlike(emailRe) ||
          col("redacted").rlike(phoneRe), 1)).as("n_leaks"),
        md5(concat_ws("|", sort_array(collect_list(col("redacted")))))
          .as("corpus_md5"))
  }

  /** Per-LSH-bucket embedding centroid — the aggregation behind IVF index
    * maintenance and cluster summarization: posexplode to (bucket, dim,
    * value), one hash agg per (bucket, dim), then fold the per-dim means
    * into count/norm summaries. Scales as a single shuffle keyed by
    * (bucket, dim) — 256×64 cells regardless of corpus size, with map-side
    * partial aggregation doing almost all the work.
    */
  val embedAgg: Q = (s, d) => {
    val base = Tables.embeddings(s, d)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .withColumn("bucket", Llm.rpBucket(col("v")))
    // Per-dim means are snapped to integer micro-units BEFORE the cross-dim
    // fold: summing 64 rounded doubles is order-dependent at the 4th
    // decimal (Spark's partition order vs the oracle's sequential order),
    // while integer sums are exact in both engines — the snap point is the
    // only remaining rounding and it is per-cell, not per-fold.
    val cells = base
      .select(col("bucket"), posexplode(col("v")).as(Seq("pos", "x")))
      .groupBy(col("bucket"), col("pos"))
      .agg(round(avg(col("x")) * 1000000, 0).cast("long").as("mi"))
    val counts = base.groupBy(col("bucket")).agg(count(lit(1)).as("n_vecs"))
    cells.groupBy(col("bucket"))
      .agg(
        round(sqrt(sum(col("mi") * col("mi"))) / 1000000, 4).as("centroid_norm"),
        round(sum(abs(col("mi"))) / lit(1000000.0), 4).as("centroid_l1"))
      .join(counts, Seq("bucket"))
      .select(col("bucket"), col("n_vecs"), col("centroid_norm"), col("centroid_l1"))
      .orderBy(col("bucket"))
  }

  /** Int8 embedding quantization — the storage transform that makes a
    * 100 TB embedding store 4× smaller: per-dimension global min/max →
    * 8-bit codes → reconstruction-error audit. Two shuffles total
    * regardless of corpus size: a 64-row min/max agg (broadcast back) and
    * the per-dim audit agg, with map-side partials doing the work. All
    * error sums are snapped to integer nano-units BEFORE aggregation so
    * double fold order cannot break hash parity (same rule as embedAgg);
    * the quantized-code checksum `sum_q` is pure integer math.
    */
  val embedQuantize: Q = (s, d) => {
    val ex = Tables.embeddings(s, d)
      .select(col("vec_id"),
        posexplode(col("embedding").cast("array<double>")).as(Seq("dim", "x")))
    val stats = ex.groupBy(col("dim"))
      .agg(min(col("x")).as("vmin"), max(col("x")).as("vmax"))
    // A constant dimension (vmax == vmin) has no scale: 0/0 would be NaN in
    // Spark but NULL-ish in DuckDB — both sides define it as code 0 with
    // zero reconstruction error instead.
    ex.join(broadcast(stats), Seq("dim"))
      .withColumn("q",
        when(col("vmax") === col("vmin"), lit(0L))
          .otherwise(round((col("x") - col("vmin")) /
            (col("vmax") - col("vmin")) * 255, 0).cast("long")))
      .withColumn("err_nanos",
        when(col("vmax") === col("vmin"), lit(0L))
          .otherwise(round(abs(col("x") - (col("vmin") + col("q") / lit(255.0) *
            (col("vmax") - col("vmin")))) * 1e9, 0).cast("long")))
      .groupBy(col("dim"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("q")).as("sum_q"),
        max(col("err_nanos")).as("max_err_nanos"),
        sum(col("err_nanos")).as("sum_err_nanos"),
        round(min(col("vmin")), 4).as("vmin_r"),
        round(max(col("vmax")), 4).as("vmax_r"))
      .orderBy(col("dim"))
  }

  /** The composed curation pipeline as ONE funnel: exact-dedup keep →
    * quality gate → deterministic sample, evaluated as per-doc cumulative
    * flags so the whole funnel is a SINGLE corpus scan + one window (dedup
    * keeper) + one aggregation — the shape that survives 100 TB, vs. the
    * naive four-pass one-aggregate-per-stage variant that scans the corpus
    * once per stage. Output is the per-language stage survival funnel.
    */
  val curateFunnel: Q = (s, d) => {
    val flags = Tables.documents(s, d)
      .withColumn("h", sha2(lower(trim(col("text"))), 256))
      .withColumn("keeper",
        min(col("doc_id")).over(
          org.apache.spark.sql.expressions.Window.partitionBy(col("h")))
          === col("doc_id"))
      .withColumn("quality_ok",
        col("keeper") && size(split(col("text"), " ")) >= 20)
      .withColumn("sampled",
        col("quality_ok") &&
          pmod(col("doc_id") * lit(2654435761L), lit(1000)) < 500)
    flags.groupBy(col("lang"))
      .agg(
        count(lit(1)).as("n_raw"),
        count(when(col("keeper"), 1)).as("n_dedup"),
        count(when(col("quality_ok"), 1)).as("n_quality"),
        count(when(col("sampled"), 1)).as("n_sampled"),
        sum(when(col("sampled"), col("n_chars"))).as("chars_sampled"))
      .orderBy(col("lang"))
  }

  /** HTML/boilerplate stripping — the first cleaning step of every web
    * corpus (C4/CCNet): remove chrome blocks (head, nav, ad divs, footer),
    * strip remaining tags, collapse whitespace. The fixture page is
    * CONSTRUCTED deterministically around each document's text (the corpus
    * has no raw HTML), which buys a sharp invariant: cleaning must recover
    * exactly the original text (`recovered_ok`), byte-for-byte under md5.
    * Pure codegen regexp scan — narrow, no shuffle, trivially
    * data-parallel at 100 TB. Patterns are non-greedy and live in the
    * RE2 ∩ java.regex common subset so the oracle runs the same language.
    */
  val htmlStrip: Q = (s, d) => {
    val raw = concat(
      lit("<html><head><title>skip me</title></head><body>" +
        "<nav>home | about | contact</nav><p>"),
      col("text"),
      lit("</p><div class=\"ad\">BUY NOW!!</div><footer>(c) corp</footer>" +
        "</body></html>"))
    Tables.documents(s, d)
      .withColumn("raw", raw)
      .withColumn("noblocks", regexp_replace(col("raw"),
        "<head>.*?</head>|<nav>.*?</nav>|<div class=\"ad\">.*?</div>|<footer>.*?</footer>",
        " "))
      .withColumn("clean",
        trim(regexp_replace(regexp_replace(col("noblocks"), "<[^>]*>", " "),
          "\\s+", " ")))
      .select(
        col("doc_id"),
        length(col("raw")).cast("long").as("raw_len"),
        length(col("clean")).cast("long").as("clean_len"),
        regexp_count(col("raw"), lit("<[^>]*>")).cast("long").as("n_tags"),
        md5(col("clean")).as("clean_md5"),
        (col("clean") === col("text")).as("recovered_ok"))
      .orderBy(col("doc_id"))
  }

  val queries: Map[String, Q] = Map(
    "llm_html_strip" -> htmlStrip,
    "llm_dedup_apply" -> dedupApply,
    "llm_sample_stratified" -> sampleStratified,
    "llm_pii_redact" -> piiRedact,
    "llm_embed_agg" -> embedAgg,
    "llm_embed_quantize" -> embedQuantize,
    "llm_curate_funnel" -> curateFunnel)

  val oracles: Map[String, String] = Map(
    "llm_html_strip" ->
      """WITH pages AS (
        |  SELECT doc_id, text,
        |   '<html><head><title>skip me</title></head><body>'
        |   || '<nav>home | about | contact</nav><p>' || text
        |   || '</p><div class="ad">BUY NOW!!</div><footer>(c) corp</footer>'
        |   || '</body></html>' AS raw
        |  FROM documents),
        |cleaned AS (
        |  SELECT doc_id, text, raw,
        |   trim(regexp_replace(regexp_replace(regexp_replace(raw,
        |     '<head>.*?</head>|<nav>.*?</nav>|<div class="ad">.*?</div>|<footer>.*?</footer>',
        |     ' ', 'g'), '<[^>]*>', ' ', 'g'), '\s+', ' ', 'g')) AS clean
        |  FROM pages)
        |SELECT doc_id, length(raw) AS raw_len, length(clean) AS clean_len,
        | CAST(len(regexp_extract_all(raw, '<[^>]*>')) AS BIGINT) AS n_tags,
        | md5(clean) AS clean_md5,
        | (clean = text) AS recovered_ok
        |FROM cleaned ORDER BY doc_id""".stripMargin,

    "llm_dedup_apply" ->
      s"""WITH RECURSIVE ${Llm.fuzzyPairsCtes},
         |edges AS (
         |  SELECT id1 AS u, id2 AS v FROM verified
         |  UNION SELECT id2, id1 FROM verified),
         |nodes AS (SELECT DISTINCT u FROM edges),
         |reach(u, label) AS (
         |  SELECT u, u FROM nodes
         |  UNION
         |  SELECT e.u, r.label FROM edges e JOIN reach r ON e.v = r.u),
         |labels AS (
         |  SELECT u AS doc_id, min(label) AS cluster_id FROM reach GROUP BY u),
         |non_keepers AS (
         |  SELECT doc_id FROM labels WHERE doc_id <> cluster_id),
         |kept AS (
         |  SELECT lang, count(*) AS n_kept,
         |         CAST(sum(n_chars) AS BIGINT) AS chars_kept
         |  FROM documents
         |  WHERE doc_id NOT IN (SELECT doc_id FROM non_keepers)
         |  GROUP BY lang),
         |removed AS (
         |  SELECT lang, count(*) AS n_removed FROM documents
         |  WHERE doc_id IN (SELECT doc_id FROM non_keepers)
         |  GROUP BY lang)
         |SELECT lang, n_kept, coalesce(n_removed, 0) AS n_removed, chars_kept
         |FROM kept LEFT JOIN removed USING (lang)
         |ORDER BY lang""".stripMargin,
    "llm_sample_stratified" ->
      """WITH rates AS (
        |  SELECT * FROM (VALUES ('en', 250), ('de', 500), ('es', 500),
        |    ('fr', 750), ('zh', 100)) AS r(lang, keep_permille)),
        |h AS (
        |  SELECT d.*, keep_permille,
        |   (doc_id * 2654435761) % 1000 AS hh
        |  FROM documents d JOIN rates USING (lang))
        |SELECT lang, keep_permille, count(*) AS n_total,
        | count(CASE WHEN hh < keep_permille THEN 1 END) AS n_sampled,
        | CAST(sum(CASE WHEN hh < keep_permille THEN n_chars END) AS BIGINT)
        |   AS chars_sampled
        |FROM h GROUP BY lang, keep_permille ORDER BY lang""".stripMargin,
    "llm_pii_redact" ->
      """WITH made AS (
        |  SELECT 'Contact ' || c_name || ' at user' || c_custkey ||
        |         '@example.com or call 555-' ||
        |         lpad(CAST(c_custkey % 10000 AS VARCHAR), 4, '0') || ' now'
        |    AS text
        |  FROM customer),
        |red AS (
        |  SELECT text,
        |   regexp_replace(
        |     regexp_replace(text, '[A-Za-z0-9._]+@[A-Za-z0-9.]+', '<EMAIL>', 'g'),
        |     '555-[0-9]{4}', '<PHONE>', 'g') AS redacted
        |  FROM made)
        |SELECT count(*) AS n_docs,
        | CAST(sum(len(regexp_extract_all(text, '[A-Za-z0-9._]+@[A-Za-z0-9.]+')))
        |   AS BIGINT) AS n_emails,
        | CAST(sum(len(regexp_extract_all(text, '555-[0-9]{4}'))) AS BIGINT)
        |   AS n_phones,
        | count(CASE WHEN regexp_matches(redacted, '[A-Za-z0-9._]+@[A-Za-z0-9.]+')
        |         OR regexp_matches(redacted, '555-[0-9]{4}') THEN 1 END)
        |   AS n_leaks,
        | md5(string_agg(redacted, '|' ORDER BY redacted)) AS corpus_md5
        |FROM red""".stripMargin,
    "llm_embed_agg" ->
      s"""WITH ${Llm.ivfBaseCtes},
         |ex AS (
         |  SELECT bucket, unnest(range(0, len(v))) AS pos, unnest(v) AS x
         |  FROM base),
         |cells AS (
         |  SELECT bucket, pos, CAST(round(avg(x) * 1000000, 0) AS BIGINT) AS mi
         |  FROM ex GROUP BY bucket, pos),
         |counts AS (SELECT bucket, count(*) AS n_vecs FROM base GROUP BY bucket)
         |SELECT bucket, n_vecs,
         | round(sqrt(sum(mi * mi)) / 1000000, 4) AS centroid_norm,
         | round(sum(abs(mi)) / 1000000.0, 4) AS centroid_l1
         |FROM cells JOIN counts USING (bucket)
         |GROUP BY bucket, n_vecs ORDER BY bucket""".stripMargin,
    "llm_embed_quantize" ->
      """WITH ex AS (
        |  SELECT vec_id, unnest(range(0, len(v))) AS dim, unnest(v) AS x
        |  FROM (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
        |        FROM embeddings)),
        |st AS (SELECT dim, min(x) AS vmin, max(x) AS vmax FROM ex GROUP BY dim),
        |qz AS (
        |  SELECT ex.dim, x, vmin, vmax,
        |   CASE WHEN vmax = vmin THEN 0 ELSE
        |     CAST(round((x - vmin) / (vmax - vmin) * 255, 0) AS BIGINT)
        |   END AS q
        |  FROM ex JOIN st ON ex.dim = st.dim),
        |e AS (
        |  SELECT dim, q, vmin, vmax,
        |   CASE WHEN vmax = vmin THEN 0 ELSE
        |     CAST(round(abs(x - (vmin + q / 255.0 * (vmax - vmin))) *
        |       1000000000, 0) AS BIGINT)
        |   END AS err
        |  FROM qz)
        |SELECT dim, count(*) AS n, CAST(sum(q) AS BIGINT) AS sum_q,
        |       max(err) AS max_err_nanos,
        |       CAST(sum(err) AS BIGINT) AS sum_err_nanos,
        |       round(min(vmin), 4) AS vmin_r, round(max(vmax), 4) AS vmax_r
        |FROM e GROUP BY dim ORDER BY dim""".stripMargin,
    "llm_curate_funnel" ->
      """WITH flags AS (
        |  SELECT lang, n_chars, doc_id,
        |   min(doc_id) OVER (PARTITION BY sha256(lower(trim(text))))
        |     = doc_id AS keeper,
        |   len(string_split(text, ' ')) >= 20 AS quality,
        |   (doc_id * 2654435761) % 1000 < 500 AS samp
        |  FROM documents)
        |SELECT lang, count(*) AS n_raw,
        | count(CASE WHEN keeper THEN 1 END) AS n_dedup,
        | count(CASE WHEN keeper AND quality THEN 1 END) AS n_quality,
        | count(CASE WHEN keeper AND quality AND samp THEN 1 END) AS n_sampled,
        | CAST(sum(CASE WHEN keeper AND quality AND samp THEN n_chars END)
        |   AS BIGINT) AS chars_sampled
        |FROM flags GROUP BY lang ORDER BY lang""".stripMargin)
}
