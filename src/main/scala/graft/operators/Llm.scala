package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** LLM-training-data pipeline operators — SURVEY.md §2.9 plus the extended
  * dedup/similarity/text-analysis suite the north star mandates.
  *
  * Design for 100 TB is explicit in each operator:
  *  - dedup never compares all pairs globally — candidate generation is
  *    always a *blocked* or *bucketed* equi-join (hash of normalized text,
  *    (lang, length-band) blocks, LSH buckets), so the shuffle key space
  *    bounds pair explosion;
  *  - similarity search broadcasts the (small) query side and keeps the
  *    corpus side partition-local;
  *  - all token math is builtin HOFs (codegen), no UDFs anywhere.
  */
object Llm {
  private type Q = (SparkSession, String) => DataFrame

  /** Library-surface cache release, called by Bench/Verify teardown (and
    * available to an embedding caller): persisted memo tables are
    * unpersisted eagerly, and the `localCheckpoint(true)` tables have
    * their backing RDD blocks dropped eagerly too — the checkpointed data
    * lives in the block manager under the LogicalRDD's RDD, so waiting
    * for the ContextCleaner (a GC-triggered path) would leave the blocks
    * pinned indefinitely in a long-lived service. Release is IRREVERSIBLE
    * for checkpointed tables (lineage was truncated), so the caller
    * contract is: no DataFrames derived from the memoized pipelines may
    * be consumed after this returns — true at harness teardown by
    * construction.
    */
  def clearCaches(): Unit =
    Seq(shingleCache, ngramCache, pairsCache, clusterCache)
      .foreach(_.releaseAll())

  /** Bounded (session, dir) → materialized-pipeline memo. The harness
    * touches at most 3 sf dirs plus a probe fixture per session, so 4
    * entries cover it with no eviction; a long-lived service looping over
    * MANY dirs evicts the oldest entry at insert time and releases its
    * blocks eagerly, keeping the block-manager footprint flat
    * (Round5Spec drives >4 dirs through one memo and asserts the cap).
    * Same irreversibility contract as clearCaches: an evicted
    * (session, dir) pipeline must no longer be referenced.
    */
  private final class DfMemo(release: DataFrame => Unit) {
    private val MaxEntries = 4
    private val m =
      new java.util.LinkedHashMap[(SparkSession, String), DataFrame]
    def getOrElseUpdate(k: (SparkSession, String), build: => DataFrame): DataFrame =
      m.synchronized(Option(m.get(k))) match {
        case Some(df) => df
        case None =>
          // Build OUTSIDE the lock: pipeline builds call other memos
          // (ngramPairs reads shingledDocs) and run Spark jobs.
          val built = build
          m.synchronized {
            Option(m.get(k)) match {
              case Some(winner) => // lost a rare race: free OUR copy
                scala.util.Try(release(built)); winner
              case None =>
                m.put(k, built)
                if (m.size > MaxEntries) {
                  val it = m.entrySet.iterator
                  val eldest = it.next()
                  it.remove()
                  scala.util.Try(release(eldest.getValue))
                }
                built
            }
          }
      }
    def size: Int = m.synchronized(m.size)
    def releaseAll(): Unit = m.synchronized {
      m.values.forEach(df => { scala.util.Try(release(df)); () })
      m.clear()
    }
  }

  /** Entry counts of the four memos — Round5Spec's bounded-memory probe. */
  private[graft] def memoSizes: Seq[Int] =
    Seq(shingleCache, ngramCache, pairsCache, clusterCache).map(_.size)

  private def releasePersisted(df: DataFrame): Unit = df.unpersist(false)

  private def releaseCheckpointed(df: DataFrame): Unit =
    df.queryExecution.analyzed.foreach {
      case lr: org.apache.spark.sql.execution.LogicalRDD =>
        lr.rdd.unpersist(false)
      case _ => ()
    }

  /** Word 3-gram shingle set of the `text` column — shared by the Jaccard
    * dedup operators. Backed by the custom codegen'd WordShingles
    * expression (graft.functions.ShingleExpressions — see there for the
    * HOF-equivalence argument and why the builtin HOFs are too slow here).
    */
  private def shingles(text: Column): Column =
    graft.functions.ShingleFunctions.wordShingles3(text)

  // =====================================================================
  // Deduplication suite
  // =====================================================================

  /** Exact dedup: normalize → sha256 → keep min(doc_id) per hash.
    * One hash-partitioned aggregation; at 100 TB the shuffle carries only
    * (64-byte hash, id) pairs, never the documents.
    */
  val dedupExact: Q = (s, d) =>
    Tables.documents(s, d)
      .withColumn("h", sha2(lower(trim(col("text"))), 256))
      .groupBy(col("h"))
      .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_copies"))
      .select(col("keep_id"), col("n_copies"), col("h"))
      .orderBy(col("keep_id"))

  /** Exact-SUBSTRING duplication profile — the "deduplicating training
    * data" exact-match family (Lee et al., ACL 2022: suffix-array ExactSubstr
    * dedup), re-expressed for Spark: every 40-char window of every
    * document is hashed (stride 1, codegen md5), windows are thinned by a
    * CONTENT-DEFINED anchor rule (hash mod 4 == 0 — the same substring
    * anchors identically in every document, so cross-doc duplicates stay
    * aligned regardless of their byte offsets; a positional stride could
    * not give that guarantee), and an anchor seen in more than one
    * document marks a cross-doc duplicated span. Output: per-document
    * anchor counts + duplicated-anchor ppm — the coverage statistic the
    * Lee et al. pipeline thresholds on.
    *
    * Scale shape (round 20 — ONE corpus pass): explode → hash-agg on
    * (anchor, doc) with map-side partials, the cross-doc duplicate
    * verdict is a count over the anchor's partition (the grouped frame
    * holds one row per distinct (anchor, doc) by construction), and the
    * per-doc profile re-aggregates the counted rows. No pair join ever
    * materializes, and — unlike the previous hash-agg + left-semi shape,
    * which re-ran the explode + md5 window scan THREE times (duplicate
    * set, membership probe, per-doc totals; the scan was 2.2 s of the
    * row's 2.9 s at sf0.1 and is ~3 corpus reads at 100 TB) — the
    * documents are scanned and hashed exactly once. The anchor rule
    * still cuts the shuffled volume 4× before the exchange; the window
    * hashing itself is whole-stage-codegen'd string arithmetic.
    */
  val dedupSubstring: Q = (s, d) => {
    val L = 40
    val anchors = Tables.documents(s, d)
      .filter(length(col("text")) >= L)
      .select(col("doc_id"),
        explode(sequence(lit(1), length(col("text")) - (L - 1))).as("pos"),
        col("text"))
      .select(col("doc_id"), md5(expr(s"substring(text, pos, $L)")).as("h"))
      .filter(conv(substring(col("h"), 1, 1), 16, 10).cast("int") % 4 === 0)
    val perAnchorDoc = anchors.groupBy(col("h"), col("doc_id"))
      .agg(count(lit(1)).as("c"))
    // distinct docs per anchor == row count of its partition here
    val nd = count(lit(1)).over(Window.partitionBy(col("h")))
    perAnchorDoc
      .withColumn("nd", nd)
      .groupBy(col("doc_id"))
      .agg(sum(col("c")).as("n_anchors"),
        sum(when(col("nd") > 1, col("c")).otherwise(0L)).as("n_dup_anchors"))
      .select(col("doc_id"), col("n_anchors"), col("n_dup_anchors"),
        expr("n_dup_anchors * 1000000 div n_anchors").as("dup_ppm"))
      .orderBy(col("doc_id"))
  }

  /** Near-dup detection by exact word-3-gram Jaccard via an inverted index:
    * explode each document's distinct shingles and equi-join on
    * (lang, length-band, shingle), so the only pairs that ever materialize
    * are those *sharing at least one shingle* — the candidate definition.
    * Common-shingle counts come from one hash aggregation; Jaccard is then
    * |∩| / (|A|+|B|−|∩|). Contrast with the naive blocked pair join
    * (315 k pairs × array_intersect at sf0.1, quadratic in block size):
    * this formulation's cost is Σ_shingle (docs-per-shingle)², which stays
    * linear-ish when shingles are discriminative — the property that makes
    * it the 100 TB-safe exact-scoring stage. Everything is codegen'd
    * (explode/join/agg); both join inputs share one exchange (ReuseExchange).
    */
  val dedupNgram: Q = (s, d) =>
    ngramPairs(s, d)
      .orderBy(col("jaccard").desc, col("id1"), col("id2"))
      .limit(20)

  /** The full inverted-index pair-scoring pipeline (all (lang, band)-block
    * pairs sharing ≥1 shingle, exact Jaccard) — shared by dedupNgram
    * (top-20 view) and lshRecall (the exact truth set). Memoized like
    * `pairsCache` (and with the same ContextCleaner-released checkpoint
    * semantics): whichever consumer runs first pays the inverted-index
    * join once; the few-hundred-row scored pair set is then served from
    * the materialized checkpoint, so the bench record is no longer
    * run-order sensitive.
    */
  private val ngramCache = new DfMemo(releaseCheckpointed)

  private def ngramPairs(s: SparkSession, d: String): DataFrame =
    ngramCache.getOrElseUpdate((s, d), buildNgramPairs(s, d).localCheckpoint(true))

  /** The ONE per-(session, dir) shingle materialization every Jaccard-dedup
    * path reads: (doc_id, lang, length-band, shingle-set), persisted after
    * a single corpus scan + interpreted-HOF shingle build. ngramPairs
    * explodes it for the inverted index; nearDupPairsPlan minhashes and
    * verifies from it — previously each pipeline re-scanned the corpus and
    * re-shingled. At 100 TB this is the checkpoint of (id, shingle-set) a
    * production dedup job writes once and fans out from; lifetime is the
    * session, same documented trade as pairsCache.
    */
  private val shingleCache = new DfMemo(releasePersisted)

  private[graft] def shingledDocs(s: SparkSession, d: String): DataFrame =
    shingleCache.getOrElseUpdate((s, d),
      Tables.documents(s, d)
        .repartition(s.sparkContext.defaultParallelism)
        .select(col("doc_id"), col("lang"),
          floor(col("n_chars") / 50).as("band"), shingles(col("text")).as("sh"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))

  private def buildNgramPairs(s: SparkSession, d: String): DataFrame = {
    // The a/b sides of the self-join re-read the persisted shingle table,
    // so the explode is recomputed from materialized arrays — never the
    // interpreted shingle build itself.
    val ex = shingledDocs(s, d)
      .select(col("doc_id"), col("lang"), col("band"),
        size(col("sh")).as("sz"), explode(col("sh")).as("g"))
    val a = ex.select(col("doc_id").as("id1"), col("lang").as("lang1"),
      col("band").as("band1"), col("sz").as("sz1"), col("g").as("g1"))
    val b = ex.select(col("doc_id").as("id2"), col("lang").as("lang2"),
      col("band").as("band2"), col("sz").as("sz2"), col("g").as("g2"))
    a.join(b, col("g1") === col("g2") && col("lang1") === col("lang2") &&
        col("band1") === col("band2") && col("id1") < col("id2"))
      .groupBy(col("id1"), col("id2"), col("sz1"), col("sz2"))
      .agg(count(lit(1)).cast("double").as("inter"))
      .withColumn("jaccard",
        round(col("inter") / (col("sz1") + col("sz2") - col("inter")), 4))
      .select(col("id1"), col("id2"), col("jaccard"))
  }

  /** WITHIN-document repetition filter — the Gopher/MassiveText quality
    * rule family: a document whose own n-grams repeat heavily is
    * boilerplate/spam regardless of corpus-level uniqueness (distinct from
    * cross-corpus dedup). Per doc: duplicate word-bigram fraction and
    * duplicate full-line(sentence) fraction, with the standard flag at the
    * Gopher-style threshold. One explode + per-doc aggs — narrow, no join;
    * at 100 TB this is a pure map-side scan transform.
    */
  val repetitionFilter: Q = (s, d) => {
    val toks = split(col("text"), " ")
    val bigrams = expr(
      "transform(sequence(1, greatest(size(split(text, ' ')) - 1, 1)), " +
        "i -> concat(split(text, ' ')[i - 1], ' ', split(text, ' ')[i]))")
    val sents = split(col("text"), "\\. ")
    Tables.documents(s, d)
      .filter(size(toks) >= 2)
      .select(col("doc_id"),
        size(bigrams).cast("long").as("n_bigrams"),
        size(array_distinct(bigrams)).cast("long").as("n_distinct_bigrams"),
        size(sents).cast("long").as("n_sents"),
        size(array_distinct(sents)).cast("long").as("n_distinct_sents"))
      .withColumn("dup_bigram_frac",
        round(lit(1.0) - col("n_distinct_bigrams") / col("n_bigrams").cast("double"), 4))
      .withColumn("dup_sent_frac",
        round(lit(1.0) - col("n_distinct_sents") / col("n_sents").cast("double"), 4))
      .withColumn("repetitious",
        col("dup_bigram_frac") > 0.2 || col("dup_sent_frac") > 0.3)
      .select(col("doc_id"), col("n_bigrams"), col("dup_bigram_frac"),
        col("dup_sent_frac"), col("repetitious"))
      .orderBy(col("doc_id"))
  }

  /** PARAGRAPH-level dedup — the sub-document granularity C4/RefinedWeb
    * pipelines remove boilerplate at: documents split into sentences
    * (fixed '. ' rule), each normalized sentence keeps only its first
    * (min doc_id, min position) occurrence corpus-wide, and the report is
    * each document's surviving-content ratio. One explode + one window
    * over the sentence hash — the shuffle carries (hash, doc, pos), never
    * text twice. Exact-duplicate documents show survival 0 for all but
    * the keeper; boilerplate sentences vanish everywhere.
    */
  val dedupParagraph: Q = (s, d) => {
    val w = Window.partitionBy(col("h"))
      .orderBy(col("doc_id"), col("pos"))
    Tables.documents(s, d)
      .select(col("doc_id"),
        posexplode(split(col("text"), "\\. ")).as(Seq("pos", "sent")))
      .filter(length(trim(col("sent"))) > 0)
      .withColumn("h", sha2(lower(trim(col("sent"))), 256))
      .withColumn("rn", row_number().over(w))
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_sents"),
        count(when(col("rn") === 1, 1)).as("n_kept"),
        round(count(when(col("rn") === 1, 1)) /
          count(lit(1)).cast("double"), 4).as("survival"))
      .orderBy(col("doc_id"))
  }

  /** Unigram LM log-prob scoring — the statistical quality filter behind
    * CCNet-style corpus curation: each document scored by the mean log
    * probability of its tokens under the corpus's own unigram model
    * (rare-token-heavy → low score → filter candidate). Two hash aggs
    * (token counts, per-doc fold) and one equi-join on the token — all
    * corpus-shaped shuffles, no broadcast of anything data-sized. Each
    * token's log-prob is snapped to integer micro-units BEFORE the per-doc
    * sum so double fold order cannot break hash parity; only the
    * 4-decimal-rounded mean travels.
    */
  /** Character-level entropy per document — the encoding-junk / gibberish
    * detector quality signal (low entropy = repeated filler, very high =
    * random bytes). Per-doc char histogram → Shannon entropy in nats,
    * with each ln(p) term snapped to integer µ-units before the weighted
    * sum (the llm_unigram_logprob fold-order-exact technique). Explode +
    * two hash aggs, map-side partials absorb the char explosion — same
    * scale shape as the token suite.
    */
  val charEntropy: Q = (s, d) => {
    val chars = Tables.documents(s, d)
      .select(col("doc_id"), explode(split(col("text"), "")).as("ch"))
      .filter(col("ch") =!= "")
    val perDoc = chars.groupBy(col("doc_id"), col("ch"))
      .agg(count(lit(1)).as("cnt"))
    val totals = perDoc.groupBy(col("doc_id"))
      .agg(sum(col("cnt")).cast("double").as("n"))
    perDoc.join(totals, Seq("doc_id"))
      .withColumn("term_u",
        round(log(col("cnt") / col("n")) * 1e6, 0).cast("long"))
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_distinct_chars"),
        sum(lit(-1L) * col("cnt") * col("term_u")).as("ent_units"),
        max(col("n")).as("n_chars_d"))
      .select(col("doc_id"), col("n_distinct_chars"),
        round(col("ent_units") / (col("n_chars_d") * 1e6), 4).as("entropy_nats"))
      .orderBy(col("doc_id"))
  }

  val unigramLogprob: Q = (s, d) => {
    val toks = Tables.documents(s, d)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
    val counts = toks.groupBy(col("tok")).agg(count(lit(1)).as("cnt"))
    val n = counts.agg(sum(col("cnt")).cast("double").as("n_total"))
    toks.join(counts, Seq("tok"))
      .crossJoin(broadcast(n))
      .withColumn("lp_units",
        round(log(col("cnt") / col("n_total")) * 1e6, 0).cast("long"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tokens"), sum(col("lp_units")).as("units"))
      .select(col("doc_id"), col("n_tokens"),
        round(col("units") / (col("n_tokens") * 1e6), 4).as("avg_logprob"))
      .orderBy(col("doc_id"))
  }

  /** Overlapping text CHUNKING — the RAG/embedding preprocessing shape:
    * each document splits into fixed-size character windows with overlap
    * (500 chars, 100 overlap → stride 400). The chunk count is integer
    * arithmetic, offsets explode narrowly (chunks stay in the document's
    * partition), and each chunk carries a content fingerprint — at 100 TB
    * only (doc_id, idx, md5) rows ever shuffle, never chunk text.
    * Char-based substring + md5-of-substring are identical in both
    * engines (md5 hashes the substring's UTF-8 bytes), so the row is
    * byte-exact even for non-ASCII corpora.
    */
  val chunkText: Q = (s, d) => {
    val size = 500; val overlap = 100; val stride = size - overlap
    Tables.documents(s, d)
      .withColumn("n", length(col("text")).cast("long"))
      .filter(col("n") >= 1)
      .withColumn("chunk_idx", explode(expr(
        s"sequence(0L, greatest((n - $overlap + ${stride - 1}) div $stride, 1L) - 1)")))
      .withColumn("off", (col("chunk_idx") * stride).cast("long"))
      .select(
        col("doc_id"), col("chunk_idx").cast("long").as("chunk_idx"), col("off"),
        length(expr(s"substring(text, off + 1, $size)")).cast("long")
          .as("chunk_chars"),
        md5(expr(s"substring(text, off + 1, $size)")).as("chunk_md5"))
      .orderBy(col("doc_id"), col("chunk_idx"))
  }

  /** Greedy sequence PACKING into fixed context windows — the step that
    * turns a curated corpus into training batches: documents fill 4096-token
    * bins in deterministic (lang, doc_id) order via a window cumulative sum;
    * a document that crosses a boundary overflows into the next bin
    * (streaming packing, the behavior of a sequential packer). One window +
    * one aggregation — a single shuffle on the partition key at any scale.
    * Token counts use the corpus chars/4 BPE estimate (llm_token_count's
    * convention).
    */
  val packSequences: Q = (s, d) => {
    val ctx = 4096
    val w = Window.partitionBy(col("lang")).orderBy(col("doc_id"))
    Tables.documents(s, d)
      .withColumn("tokens", ceil(col("n_chars") / 4.0).cast("long"))
      .withColumn("cum", sum(col("tokens")).over(w))
      .withColumn("bin", ((col("cum") - col("tokens")) / ctx).cast("long"))
      .groupBy(col("lang"), col("bin"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("tokens")).as("bin_tokens"),
        round(sum(col("tokens")) / lit(ctx.toDouble), 4).as("fill_ratio"))
      .orderBy(col("lang"), col("bin"))
  }

  /** Benchmark DECONTAMINATION screen — the training-data step that keeps
    * eval sets honest: find corpus documents whose word-3-gram shingle set
    * overlaps a benchmark document's by ≥ 50%. The benchmark side is tiny
    * by construction, so candidate generation is a BROADCAST equi-join on
    * the shingle key against one pass over the shared shingle
    * materialization — at 100 TB the corpus is never shuffled, and the
    * per-pair overlap count is one hash aggregation. Output is the
    * contamination report (doc, benchmark doc, overlap fraction).
    */
  val decontaminate: Q = (s, d) => {
    val sd = shingledDocs(s, d).filter(size(col("sh")) > 0)
    val bench = sd.filter(pmod(col("doc_id"), lit(100)) === 7)
      .select(col("doc_id").as("bench_id"), explode(col("sh")).as("g"))
    val corpus = sd.filter(pmod(col("doc_id"), lit(100)) =!= 7)
      .select(col("doc_id"), size(col("sh")).as("sz"), explode(col("sh")).as("g"))
    corpus.join(broadcast(bench), Seq("g"))
      .groupBy(col("doc_id"), col("bench_id"), col("sz"))
      .agg(count(lit(1)).cast("double").as("inter"))
      .withColumn("overlap", round(col("inter") / col("sz"), 4))
      .filter(col("overlap") >= 0.5)
      .select(col("doc_id"), col("bench_id"), col("overlap"))
      .orderBy(col("doc_id"), col("bench_id"))
  }

  /** LSH QUALITY MEASUREMENT: recall of the banded-MinHash pipeline
    * against the exact truth set (inverted-index pairs with Jaccard ≥ 0.5
    * inside the same (lang, band) block). Both pair sets are deterministic
    * in both engines, so the recall VALUE itself hash-matches — this row
    * continuously validates the probabilistic dedup path's quality, the
    * check a production 100 TB dedup pipeline runs on samples.
    */
  val lshRecall: Q = (s, d) => {
    val truth = ngramPairs(s, d).filter(col("jaccard") >= 0.5)
      .select(col("id1"), col("id2"))
    val lsh = verifiedNearDupPairs(s, d).select(col("id1"), col("id2"))
    val nTruth = truth.agg(count(lit(1)).as("n_truth"))
    val nLsh = lsh.agg(count(lit(1)).as("n_lsh"))
    val nCommon = truth.join(lsh, Seq("id1", "id2"), "left_semi")
      .agg(count(lit(1)).as("n_common"))
    nTruth.crossJoin(nLsh).crossJoin(nCommon)
      .withColumn("recall",
        round(col("n_common") / col("n_truth"), 4))
      // The OPERATING-POINT ASSERTION, oracled as a value: 8 bands × 2 rows
      // gives P(candidate) = 1−(1−j²)⁸ ≈ 0.8999 for a pair exactly AT the
      // τ=0.5 boundary and sharply higher above it (0.995 at j=0.7, ~1 at
      // j≥0.85, where planted near-dups live) — so EMPIRICAL corpus recall
      // ≥ 0.9 is the contract this row enforces (measured 1.0 at every sf);
      // a band-shape regression flips the boolean and fails the hash gate.
      // A corpus whose truth pairs all sit exactly at j=0.5 would sit at
      // the floor's edge by design — the floor grades the corpus operating
      // point, not the per-pair formula.
      .withColumn("recall_floor_ok", col("recall") >= 0.9)
  }

  /** Embedding-cosine near-dup: top-20 closest candidate pairs. Candidate
    * generation is the SAME 8-bit random-projection sign bucket used by
    * llm_simsearch_ivf — pairs materialize only inside a bucket (equi-join
    * on the bucket key, hash-partitionable), never as an all-pairs product.
    * Near-identical vectors land in the same bucket with overwhelming
    * probability (a sign flip needs a plane inside the tiny angle between
    * them), so near-dup recall is effectively 1; the oracle computes the
    * identical bucketing, so results hash-match exactly. Float vectors are
    * cast to double *before* any arithmetic so Spark and DuckDB fold
    * identically. At 100 TB this is one shuffle keyed by bucket with
    * per-bucket pair expansion — the quadratic term is bounded by the
    * largest bucket, which more projection bits subdivide further.
    */
  val dedupEmbed: Q = (s, d) => {
    // The small parquet file arrives as 1 split, so the pair-expansion side
    // is explicitly repartitioned to use every core — at cluster scale the
    // scan is naturally multi-split and this is a no-op-sized shuffle.
    val base = Tables.embeddings(s, d)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .withColumn("bucket", rpBucket(col("v")))
    val a = base.repartition(s.sparkContext.defaultParallelism)
      .select(col("vec_id").as("id1"), col("v").as("v1"), col("bucket").as("b1"))
    val b = base.select(col("vec_id").as("id2"), col("v").as("v2"), col("bucket").as("b2"))
    a.join(b, col("b1") === col("b2") && col("id1") < col("id2"))
      .withColumn("cos", round(cosine(col("v1"), col("v2")), 4))
      .select(col("id1"), col("id2"), col("cos"))
      .orderBy(col("cos").desc, col("id1"), col("id2"))
      .limit(20)
  }

  /** Semantic dedup via cluster-then-pairwise (SemDeDup, Abbas et al.
    * 2023): embeddings are assigned to their nearest of K centroids, then
    * near-duplicate pairs are scored ONLY within a cluster — the
    * clustering exists precisely to keep the pairwise stage
    * cluster-size-bounded instead of corpus-quadratic. Round-7 scaling
    * (closes the round-6 verdict's K=16-first-vectors caveat):
    *
    *  - K ≈ √n (floor 16), so the per-cluster pair stage stays ~n·√n
    *    total as the corpus grows instead of n²/16; K rows broadcast.
    *  - seeds = the K vectors with the smallest `md5(vec_id)` — an
    *    order-free deterministic pseudo-random sample (a distributed
    *    top-K, not a scan-order artifact like "first 16").
    *  - ONE k-means refinement step: assign the corpus to the seeds,
    *    then per cluster take the element-wise µ-unit-quantized SUM as
    *    the refined centroid. Cosine is scale-invariant, so the sum
    *    stands in for the mean with NO division — integer sums are
    *    bit-exact cross-engine (the house integer-units rule), where a
    *    double mean's summation-order ulps could flip a boundary argmax.
    *
    * A vector is removed when a lower-id cluster-mate matches at
    * cos ≥ 0.95 (keep-first, the house dedup rule). The corpus carries no
    * natural semantic dups (max pairwise cos ≈ 0.48), so the fixture
    * plants exact clones of every 20th vector — clones share their
    * source's centroid assignment by construction, so the planted
    * removals are exactly what the operator must find, per cluster.
    * Ranking/threshold compares use round(cos, 4) so both engines argmax
    * identically. Round7Spec pins that K(n)+refinement shrinks the max
    * cluster vs the fixed-16 baseline on a ×10 corpus.
    */
  val semDedup: Q = (s, d) => {
    val base0 = Tables.embeddings(s, d)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val head = base0.agg(max("vec_id"), count(lit(1))).head
    val (mx, n) = (head.getLong(0), head.getLong(1))
    val clones = base0.filter(col("vec_id") % 20 === 0)
      .select((col("vec_id") + mx + 1).as("vec_id"), col("v"))
    val base = base0.unionByName(clones)
    val k = math.max(16L, math.sqrt(n.toDouble).toLong)
    val cents = refinedCentroids(base0, k)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("vec_id")
      .orderBy(round(col("cos_c"), 4).desc, col("cid"))
    val assigned = base.crossJoin(broadcast(cents))
      .withColumn("cos_c", cosine(col("v"), col("cv")))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("vec_id"), col("v"), col("cid"))
    val a = assigned.select(col("cid"), col("vec_id").as("id1"), col("v").as("v1"))
    val b = assigned.select(col("cid"), col("vec_id").as("id2"), col("v").as("v2"))
    val removed = a.join(b, Seq("cid"))
      .filter(col("id1") < col("id2"))
      .filter(round(cosine(col("v1"), col("v2")), 4) >= 0.95)
      .select(col("cid"), col("id2").as("rm")).distinct()
    assigned.groupBy(col("cid")).agg(count(lit(1)).as("n_vecs"))
      .join(removed.groupBy(col("cid")).agg(countDistinct(col("rm")).as("nr")),
        Seq("cid"), "left_outer")
      .select(col("cid").as("cluster_id"), col("n_vecs"),
        coalesce(col("nr"), lit(0L)).as("n_removed"))
      .orderBy(col("cluster_id"))
  }

  /** Seeded one-step k-means centroids for semDedup (also driven directly
    * by Round7Spec's cluster-balance pin). `base` must be (vec_id, v).
    * Seeds are a distributed top-K by md5(vec_id) (TakeOrdered — no global
    * sort); the refinement assignment broadcasts the K seeds; refined
    * centroids are element-wise µ-unit integer SUMS (cosine is
    * scale-invariant — see semDedup's scaladoc for why not a double
    * mean). Returns (cid, cv).
    */
  private[graft] def refinedCentroids(base: DataFrame, k: Long): DataFrame = {
    // The frame below the window is ≤ K (=16) rows post-limit, so a
    // single-partition window is correct and bounded; the constant
    // partition key keeps Spark's unbounded-window WARN (which assumes a
    // data-sized frame) out of the logs without changing the plan.
    val wSeed = org.apache.spark.sql.expressions.Window
      .partitionBy(lit(0))
      .orderBy(col("h"), col("vec_id"))
    val seeds = base
      .withColumn("h", expr("md5(cast(vec_id as string))"))
      .orderBy(col("h"), col("vec_id")).limit(k.toInt)
      .withColumn("cid", row_number().over(wSeed).cast("long") - 1)
      .select(col("cid"), col("v").as("cv"))
    val wA = org.apache.spark.sql.expressions.Window
      .partitionBy("vec_id")
      .orderBy(round(col("cos_c"), 4).desc, col("cid"))
    val a0 = base.crossJoin(broadcast(seeds))
      .withColumn("cos_c", cosine(col("v"), col("cv")))
      .withColumn("rn", row_number().over(wA))
      .filter(col("rn") === 1)
      .select(col("vec_id"), col("v"), col("cid"))
    a0.select(col("cid"), posexplode(col("v")).as(Seq("idx", "el")))
      .groupBy(col("cid"), col("idx"))
      .agg(sum(round(col("el") * 1e6).cast("long")).as("mu"))
      .groupBy(col("cid"))
      .agg(expr("transform(array_sort(collect_list(struct(idx, mu)))," +
        " x -> CAST(x.mu AS DOUBLE))").as("cv"))
  }

  /** Cluster sizes of `base` against explicit centroids — the Round7Spec
    * balance probe (fixed-16 baseline vs K(n)+refinement). */
  private[graft] def assignSizes(base: DataFrame, cents: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("vec_id")
      .orderBy(round(col("cos_c"), 4).desc, col("cid"))
    base.crossJoin(broadcast(cents))
      .withColumn("cos_c", cosine(col("v"), col("cv")))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .groupBy(col("cid")).agg(count(lit(1)).as("n_vecs"))
  }

  /** Vector kernel: the custom codegen'd DotProduct expression
    * (graft.functions.VectorExpressions) — ascending-index fold, identical
    * rounding behavior to DuckDB's list functions. See that file for why
    * the builtin HOFs (CodegenFallback, ~200µs/pair) don't survive a
    * 2M-pair join.
    */
  private def dot(a: Column, b: Column): Column =
    graft.functions.VectorFunctions.vecDot(a, b)

  private def norm2(a: Column): Column =
    graft.functions.VectorFunctions.vecNorm(a)

  private def cosine(a: Column, b: Column): Column =
    graft.functions.VectorFunctions.vecCosine(a, b)

  // =====================================================================
  // Similarity search
  // =====================================================================

  /** Brute-force cosine top-k: 5 query vectors against the whole table.
    * The query side is broadcast (tiny), the corpus side never shuffles
    * until the final per-query top-k — at 100 TB this is one scan +
    * a 5×k-row shuffle.
    */
  val simsearchTopk: Q = (s, d) => {
    val base = Tables.embeddings(s, d)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val queries = base.filter(col("vec_id") < 5)
      .select(col("vec_id").as("query_id"), col("v").as("qv"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("vec_id"))
    base.join(broadcast(queries), col("vec_id") =!= col("query_id"))
      .withColumn("cos", round(cosine(col("qv"), col("v")), 4))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= 10)
      .select(col("query_id"), col("rank"), col("vec_id"), col("cos"))
      .orderBy(col("query_id"), col("rank"))
  }

  // =====================================================================
  // Text analysis
  // =====================================================================

  /** Corpus statistics per language: doc/token/distinct-token counts and
    * the modal token (ties broken lexicographically). Exploded token
    * stream → two hash aggregations + a top-1 window — no data ever
    * collects to the driver.
    */
  val textStats: Q = (s, d) => {
    val toks = Tables.documents(s, d)
      .select(col("lang"), col("doc_id"),
        explode(split(col("text"), " ")).as("tok"))
    val stats = toks.groupBy(col("lang")).agg(
      countDistinct(col("doc_id")).as("n_docs"),
      count(lit(1)).as("total_tokens"),
      countDistinct(col("tok")).as("n_distinct_tokens"))
    val wTop = Window.partitionBy(col("lang"))
      .orderBy(col("cnt").desc, col("tok"))
    val top = toks.groupBy(col("lang"), col("tok")).agg(count(lit(1)).as("cnt"))
      .withColumn("rn", row_number().over(wTop))
      .filter(col("rn") === 1)
      .select(col("lang"), col("tok").as("top_token"), col("cnt").as("top_token_cnt"))
    stats.join(top, "lang")
      .withColumn("avg_tokens_per_doc",
        round(col("total_tokens") / col("n_docs"), 2))
      .select(col("lang"), col("n_docs"), col("total_tokens"),
        col("avg_tokens_per_doc"), col("n_distinct_tokens"),
        col("top_token"), col("top_token_cnt"))
      .orderBy(col("lang"))
  }

  /** Token counting three ways: whitespace, BPE-ish regex word/number/
    * punctuation classes, and the chars/4 length heuristic.
    */
  val tokenCount: Q = (s, d) =>
    Tables.documents(s, d)
      .select(
        col("doc_id"),
        size(split(col("text"), "\\s+")).cast("long").as("ws_tokens"),
        size(regexp_extract_all(col("text"),
          lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"), lit(0))).cast("long")
          .as("re_tokens"),
        ceil(length(col("text")) / 4.0).as("bpe_est"),
        length(col("text")).cast("long").as("n_chars_live"))
      .orderBy(col("doc_id"))

  /** Quality scoring: token-length / stopword / whitespace ratios folded
    * into one deterministic score per document.
    */
  val qualityScore: Q = (s, d) => {
    val toks = split(col("text"), " ")
    Tables.documents(s, d)
      .withColumn("n_tokens", size(toks).cast("double"))
      .withColumn("n_stop",
        size(filter(toks, t => t.isin("the", "a", "of", "and", "to")))
          .cast("double"))
      .withColumn("chars_no_ws",
        length(regexp_replace(col("text"), "\\s", "")).cast("double"))
      .select(
        col("doc_id"),
        col("n_tokens").cast("long").as("n_tokens"),
        round(col("chars_no_ws") / col("n_tokens"), 4).as("avg_token_len"),
        round(col("n_stop") / col("n_tokens"), 4).as("stopword_ratio"),
        round(
          lit(0.5) * (col("n_stop") / col("n_tokens")) +
          lit(0.5) * least(col("n_tokens") / 100.0, lit(1.0)), 4)
          .as("quality"))
      .orderBy(col("doc_id"))
  }

  /** Classifier-based quality filtering — the fasttext-shaped LINEAR
    * model over hashed token features that public corpus pipelines
    * (CCNet, DCLM, FineWeb-Edu family) use as their quality gate, as an
    * execution shape: tokens hash into a 4096-bucket feature space, each
    * bucket carries a weight, a document's score is the integer mean
    * bucket weight (µ-units), and the corpus bands into keep/mid/drop.
    * Weights here are md5-derived pseudo-weights so the DuckDB oracle
    * reproduces them bit-exactly; a trained deployment broadcasts a
    * weight Map into the same plan. Execution: explode → codegen
    * md5/conv arithmetic → per-doc hash agg with map-side partials — the
    * shuffle carries (doc_id) partials, never the corpus text.
    */
  val classifierScore: Q = (s, d) =>
    Tables.documents(s, d)
      .select(col("doc_id"),
        explode(split(lower(col("text")), "[^a-z0-9]+")).as("t"))
      .filter(col("t") =!= "")
      .withColumn("w",
        conv(substring(md5(col("t")), 1, 8), 16, 10).cast("long") % 4096 % 2001)
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_toks"),
        expr("sum(w) div count(w)").as("score_mu"))
      .withColumn("band", when(col("score_mu") < lit(900L), "drop")
        .when(col("score_mu") > lit(1100L), "keep").otherwise("mid"))
      .orderBy(col("doc_id"))

  /** Adjacent-token-pair counts — the inner statistic of one BPE merge
    * round (tokenizer training): explode consecutive pairs, one global
    * hash aggregation, top-20. Map-side partial aggregation absorbs the
    * pair explosion; the shuffle carries only distinct pairs.
    */
  val bpePairs: Q = (s, d) =>
    Tables.documents(s, d)
      .select(split(col("text"), " ").as("t"))
      .filter(size(col("t")) >= 2)
      .select(explode(expr(
        "transform(sequence(1, size(t) - 1), i -> concat(t[i-1], ' ', t[i]))"))
        .as("pair"))
      .groupBy(col("pair"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("pair"))
      .limit(20)

  /** Per-(lang, source) corpus curation stats — the aggregation that backs
    * a `write.partitionBy("lang")` layout (the write itself is the
    * snk_partitioned_write row).
    */
  val langPartition: Q = (s, d) =>
    Tables.documents(s, d)
      .groupBy(col("lang"), col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("total_chars"))
      .orderBy(col("lang"), col("source"))

  // =====================================================================
  // Advanced dedup: MinHash-LSH, SimHash, fingerprinting
  // =====================================================================

  /** MinHash-LSH near-dup pipeline, Spark-first: shingle → 16 minhash
    * signatures → 8 bands × 2 rows (AND×OR amplification) → band-key
    * equi-join for candidates → exact-Jaccard verification ≥ 0.5.
    *
    * This is THE 100 TB dedup path: candidate generation is an equi-join on
    * the band key, never an all-pairs product, and the banding controls the
    * candidate count analytically — P(candidate) = 1−(1−j²)⁸: 0.90 at the
    * τ=0.5 verify boundary (the recall floor llm_lsh_recall asserts),
    * ≈1.3% of random pairs (j≈0.04), ≈100% of planted near-dups (j≥0.95).
    * (MLlib's MinHashLSH can only OR its hash tables — 1−(1−j)¹⁶ admits
    * ~half of *random* pairs as candidates, which measured 20-30 s at
    * sf0.1 even with 8 tables; AND-amplification is why this version is
    * both faster and scale-safe.)
    *
    * The 16 minhash functions are the 16 disjoint 4-hex-char slots of two
    * md5s per shingle, min'd lexicographically — deterministic and
    * engine-portable, so unlike the MLlib version this query is fully
    * DuckDB-oracled end-to-end. Every stage is codegen'd (md5/substring/
    * min/explode/join); the only HOF is the per-doc shingle build.
    */
  val dedupFuzzy: Q = (s, d) =>
    verifiedNearDupPairs(s, d)
      .orderBy(col("jaccard").desc, col("id1"), col("id2"))
      .limit(50)

  /** The full banded-MinHash pipeline: all verified near-dup pairs
    * (exact Jaccard ≥ 0.5) — shared by dedupFuzzy (top-50 view) and
    * dedupCluster (connected components over the pair graph).
    */
  /** The verified pair set is deterministic per (session, sf-dir) and is
    * consumed by BOTH llm_dedup_fuzzy and llm_dedup_cluster — memoize the
    * materialized (localCheckpoint'ed, few-hundred-row) result so the
    * expensive shingle/minhash pipeline runs once per session, not once per
    * consumer. Checkpoint blocks are released by the ContextCleaner when the
    * plan is GC'd, unlike a leaked persist.
    */
  private val pairsCache = new DfMemo(releaseCheckpointed)

  private def verifiedNearDupPairs(s: SparkSession, d: String): DataFrame =
    pairsCache.getOrElseUpdate((s, d),
      nearDupPairsPlan(s, d)._2.localCheckpoint(true))

  /** The lazy (docs, verified-pairs) pipeline plan, un-materialized —
    * also exposed to PlanSpec so the no-cartesian property is asserted on
    * the real candidate-generation plan, not the post-checkpoint LogicalRDD.
    */
  private[graft] def nearDupPairsPlan(s: SparkSession, d: String): (DataFrame, DataFrame) = {
    // The shingle table is consumed by THREE branches here (minhash path +
    // both verification joins) and by the inverted-index pipeline; exchange
    // reuse does not dedup them (measured), so all read the ONE persisted
    // shingledDocs materialization — the interpreted-HOF shingle build runs
    // once per session, not once per branch or per pipeline.
    val docs = shingledDocs(s, d)
      .filter(size(col("sh")) > 0)
      .select(col("doc_id"), col("sh"))
    // 16 minhash functions = the 16 disjoint 4-hex-char slots of TWO md5s
    // per shingle (64 hex chars), arranged as 8 bands × 2 rows:
    // P(candidate | j) = 1−(1−j²)⁸ — 0.90 at the τ=0.5 verify threshold
    // (the recall floor llm_lsh_recall asserts), ≈1.3% for random pairs.
    // Slots must stay 4 hex chars (32-bit): the min of ~hundreds of hashes
    // concentrates near E[min] ≈ space/k, so 16-bit slots collide across
    // unrelated docs and the measured candidate set exploded 966 k at
    // sf0.1 (vs ~1 k with 32-bit keys) — the second md5 buys band-key
    // entropy for one extra codegen'd hash per exploded shingle.
    val mh = docs
      .select(col("doc_id"), explode(col("sh")).as("g"))
      .withColumn("md", concat(md5(col("g")), md5(concat(col("g"), lit("#2")))))
      .groupBy(col("doc_id"))
      .agg(
        min(substring(col("md"), 1, 4)).as("m0"),
        (1 until 16).map(i =>
          min(substring(col("md"), 4 * i + 1, 4)).as(s"m$i")): _*)
    val bands = mh.select(col("doc_id"), explode(array(
        (0 until 8).map(i => struct(
          lit(i).as("band_id"),
          concat(col(s"m${2 * i}"), col(s"m${2 * i + 1}")).as("key"))): _*)).as("bk"))
      .select(col("doc_id"), col("bk.band_id").as("band_id"), col("bk.key").as("key"))
    val cand = bands.as("x").join(bands.as("y"),
        col("x.band_id") === col("y.band_id") && col("x.key") === col("y.key") &&
        col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("id1"), col("y.doc_id").as("id2"))
      .distinct()
    val verified = cand
      .join(docs.select(col("doc_id").as("id1"), col("sh").as("sh1")), "id1")
      .join(docs.select(col("doc_id").as("id2"), col("sh").as("sh2")), "id2")
      .withColumn("inter", size(array_intersect(col("sh1"), col("sh2"))).cast("double"))
      .withColumn("jaccard", round(
        col("inter") / (size(col("sh1")) + size(col("sh2")) - col("inter")), 4))
      .filter(col("jaccard") >= 0.5)
      .select(col("id1"), col("id2"), col("jaccard"))
    (docs, verified)
  }

  /** Near-dup CLUSTER assignment — the step after pair detection that an
    * actual corpus-dedup job needs: connected components over the verified
    * near-dup pair graph, each doc labeled with the min doc_id of its
    * component (the canonical keeper). Algorithm: alternating
    * LARGE-STAR / SMALL-STAR (Kiveris et al., "Connected Components in
    * MapReduce and Beyond", SoCC'14 — public algorithm), the formulation
    * that converges in O(log n) rounds independent of component DIAMETER,
    * unlike plain min-label propagation whose round count is the longest
    * path — the property that matters when a 100 TB near-dup graph chains
    * (doc A ~ B ~ C ~ …). Each round is two (groupBy-min + equi-join)
    * stages over the edge set only — the corpus is never touched.
    *
    * Loop mechanics: every round's edge set is localCheckpoint'ed, so the
    * per-iteration plan shape is constant (LogicalRDD → agg → join) —
    * whole-stage codegen compiles once and is served from cache; checkpoint
    * blocks are freed by the ContextCleaner; no session-global conf is
    * touched (AQE coalesces the tiny loop shuffles at harness scale, and at
    * a 100 TB pair graph the same loop runs at full parallelism).
    * Convergence = the star edge set reaches its fixed point (count equal +
    * empty except — exact, not probabilistic). Fully deterministic, oracled
    * by a recursive CTE over the identical (hash-verified) pair set.
    */
  private val clusterCache = new DfMemo(releaseCheckpointed)

  val dedupCluster: Q = (s, d) =>
    clusterCache.getOrElseUpdate((s, d), buildDedupCluster(s, d).localCheckpoint(true))

  private def buildDedupCluster(s: SparkSession, d: String): DataFrame = {
    val pairs = verifiedNearDupPairs(s, d).select(col("id1"), col("id2"))
    val nodes = pairs.select(col("id1").as("node"))
      .union(pairs.select(col("id2").as("node")))
      .distinct()
      .localCheckpoint(true)

    /** Large-star: every node connects its LARGER neighbors to the min of
      * its closed neighborhood. Keeps inter-component edges intact while
      * halving long chains.
      */
    def largeStar(e: DataFrame): DataFrame = {
      val sym = e.select(col("u").as("a"), col("v").as("b"))
        .union(e.select(col("v").as("a"), col("u").as("b")))
      val m = sym.groupBy(col("a")).agg(min(col("b")).as("mb"))
        .select(col("a"), least(col("a"), col("mb")).as("m"))
      // No distinct here: small-star's final distinct absorbs duplicates,
      // and dropping it removes one exchange per round.
      sym.join(m, "a")
        .filter(col("b") > col("a"))
        .select(col("b").as("u"), col("m").as("v"))
    }

    /** Small-star: every node connects its SMALLER-or-equal neighbors (and
      * itself) to the min of its closed neighborhood — flattens toward the
      * min-rooted star.
      */
    def smallStar(e: DataFrame): DataFrame = {
      val dir = e.select(greatest(col("u"), col("v")).as("a"),
        least(col("u"), col("v")).as("b"))
      val withM = dir.groupBy(col("a")).agg(min(col("b")).as("m"))
      // Explode emits both (b, m) and (a, m) in ONE pass over the join —
      // a union of two selects would execute the join twice (no subplan
      // reuse across union branches).
      dir.join(withM, "a")
        .select(explode(array(
          struct(col("b").as("u"), col("m").as("v")),
          struct(col("a").as("u"), col("m").as("v")))).as("e"))
        .select(col("e.u").as("u"), col("e.v").as("v"))
        .filter(col("u") =!= col("v"))
        .distinct()
    }

    var star = pairs
      .select(greatest(col("id1"), col("id2")).as("u"),
        least(col("id1"), col("id2")).as("v"))
      .distinct()
      .localCheckpoint(true)
    // Fixed-point detection without a confirmation round: the edge set is
    // converged iff it is a min-rooted star forest — every child node
    // appears exactly once (count == countDistinct(u)) and no root also
    // appears as a child. Both checks are small jobs over the materialized
    // (tiny) edge set; L*/S* preserve components, so a star forest IS the
    // component decomposition.
    def isStarForest(e: DataFrame): Boolean = {
      val t = e.agg(count(lit(1)).as("n"), countDistinct(col("u")).as("nu")).first()
      t.getLong(0) == t.getLong(1) &&
        e.select(col("v"))
          .join(e.select(col("u").as("v")), Seq("v"), "left_semi").isEmpty
    }
    val dbg = sys.env.contains("GRAFT_CC_DEBUG")
    var iter = 0
    var converged = star.isEmpty
    while (!converged && iter < 30) {
      val t0 = System.nanoTime()
      star = smallStar(largeStar(star)).localCheckpoint(true)
      converged = isStarForest(star)
      iter += 1
      if (dbg) println(f"[cc] iter=$iter " +
        f"t=${(System.nanoTime() - t0) / 1e9}%.2fs converged=$converged")
    }
    // At the fixed point `star` is (node, component-min) for every non-root
    // node; roots label themselves.
    val labels = nodes.join(star, nodes("node") === star("u"), "left")
      .select(col("node"), coalesce(col("v"), col("node")).as("label"))
    val sizes = labels.groupBy(col("label")).agg(count(lit(1)).as("cluster_size"))
    labels.join(sizes, "label")
      .select(col("node").as("doc_id"), col("label").as("cluster_id"),
        col("cluster_size"), (col("node") === col("label")).as("is_keeper"))
      .orderBy(col("doc_id"))
  }

  /** Top-3 TF-IDF terms per document: tf × ln(N/df) over whitespace tokens.
    * Three hash aggregations + one join + one window — the inverted-index
    * shape that scales (term df is a broadcastable aggregate; no
    * per-document vocabulary ever materializes).
    */
  val tfidf: Q = (s, d) => {
    val docs = Tables.documents(s, d)
    val nDocs = docs.select(count(lit(1)).as("n_docs"))
    val tf = docs
      .select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
      .groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
    val df_ = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("score").desc, col("term"))
    tf.join(df_, "term").crossJoin(broadcast(nDocs))
      .withColumn("score",
        round(col("tf") * log(col("n_docs") / col("df")), 4))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= 3)
      .select(col("doc_id"), col("rank"), col("term"), col("score"))
      .orderBy(col("doc_id"), col("rank"))
  }

  /** 64-bit SimHash over the distinct-token set, emitted as 16 hex chars.
    * The per-token hash is md5 — the one hash both engines compute
    * identically — and each hex nibble contributes 4 sign-vote bits, so the
    * whole signature is integer arithmetic: bit-exact across engines, fully
    * oracled. Two hash aggregations; explodes tokens ×16 positions.
    */
  val dedupSimhash: Q = (s, d) => {
    val toks = Tables.documents(s, d)
      .select(col("doc_id"), explode(array_distinct(split(col("text"), " "))).as("tok"))
      .withColumn("md", md5(col("tok")))
      .select(col("doc_id"), col("md"), explode(sequence(lit(1), lit(16))).as("i"))
      .withColumn("v", expr("instr('0123456789abcdef', substring(md, i, 1)) - 1"))
    def bitSum(j: Int) =
      sum(shiftright(col("v"), j).bitwiseAND(lit(1)) * 2 - 1).as(s"s$j")
    val votes = toks.groupBy(col("doc_id"), col("i"))
      .agg(bitSum(0), bitSum(1), bitSum(2), bitSum(3))
      .withColumn("nib",
        when(col("s3") > 0, 8).otherwise(0) + when(col("s2") > 0, 4).otherwise(0) +
        when(col("s1") > 0, 2).otherwise(0) + when(col("s0") > 0, 1).otherwise(0))
      .withColumn("hc", expr("substring('0123456789abcdef', nib + 1, 1)"))
    votes.groupBy(col("doc_id"))
      .agg(array_join(
        transform(sort_array(collect_list(struct(col("i"), col("hc")))),
          e => e.getField("hc")), "").as("simhash"))
      .orderBy(col("doc_id"))
  }

  /** Document fingerprint: min-md5 over the word-3-gram shingle window —
    * single-permutation MinHash. Docs sharing a fingerprint are dedup
    * candidates; `n_same` counts the cluster.
    */
  val fingerprint: Q = (s, d) => {
    val fp = Tables.documents(s, d)
      .withColumn("fp",
        array_min(transform(shingles(col("text")), sh => md5(sh))))
      .select(col("doc_id"), col("fp"))
    fp.withColumn("n_same",
        count(lit(1)).over(Window.partitionBy(col("fp"))))
      .orderBy(col("doc_id"))
  }

  // =====================================================================
  // Language ID and LSH-bucketed similarity (scale path)
  // =====================================================================

  /** N-gram-profile language ID: the per-language top-20 token profile is
    * derived from the corpus itself (deterministic ties), each document is
    * scored by profile overlap of its distinct tokens, argmax wins. Both
    * profile build and scoring are joins + window top-1 — no driver loops.
    */
  val langId: Q = (s, d) => {
    val docs = Tables.documents(s, d)
    val toks = docs.select(col("doc_id"), col("lang"),
      explode(split(col("text"), " ")).as("tok"))
    val profile = toks.groupBy(col("lang"), col("tok"))
      .agg(count(lit(1)).as("cnt"))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("lang")).orderBy(col("cnt").desc, col("tok"))))
      .filter(col("rn") <= 20)
      .select(col("lang").as("p_lang"), col("tok").as("p_tok"))
    val docToks = toks.select(col("doc_id"), col("tok")).distinct()
    val scored = docToks.join(broadcast(profile), col("tok") === col("p_tok"))
      .groupBy(col("doc_id"), col("p_lang"))
      .agg(count(lit(1)).as("score"))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("doc_id"))
          .orderBy(col("score").desc, col("p_lang"))))
      .filter(col("rn") === 1)
      .select(col("doc_id").as("s_doc"), col("p_lang").as("predicted"), col("score"))
    docs.join(scored, col("doc_id") === col("s_doc"), "left")
      .select(col("doc_id"), col("lang").as("actual"),
        coalesce(col("predicted"), lit("unknown")).as("predicted"),
        coalesce(col("score"), lit(0L)).as("score"),
        (col("lang") === coalesce(col("predicted"), lit("unknown"))).as("correct"))
      .orderBy(col("doc_id"))
  }

  /** The SQL literal for Planes.planes — renders the oracle from the same
    * array the Spark side uses, one source of truth for both engines.
    */
  private def planesSqlLiteral: String =
    Planes.planes.map(_.mkString("[", ",", "]")).mkString("[", ",", "]")

  /** Shared DuckDB CTE computing the 8-bit random-projection bucket per
    * vector — mirrors rpBucket exactly (same planes, double arithmetic).
    * One source of truth for the llm_simsearch_ivf and llm_dedup_embed
    * oracles.
    */
  private[operators] lazy val ivfBaseCtes: String = {
    val planes = planesSqlLiteral
    s"""planes AS (SELECT CAST($planes AS DOUBLE[][]) AS p),
       |base AS (
       |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
       |   (CASE WHEN list_dot_product(CAST(embedding AS DOUBLE[]), p[1]) > 0 THEN 1 ELSE 0 END
       |  + CASE WHEN list_dot_product(CAST(embedding AS DOUBLE[]), p[2]) > 0 THEN 2 ELSE 0 END
       |  + CASE WHEN list_dot_product(CAST(embedding AS DOUBLE[]), p[3]) > 0 THEN 4 ELSE 0 END
       |  + CASE WHEN list_dot_product(CAST(embedding AS DOUBLE[]), p[4]) > 0 THEN 8 ELSE 0 END
       |  + CASE WHEN list_dot_product(CAST(embedding AS DOUBLE[]), p[5]) > 0 THEN 16 ELSE 0 END
       |  + CASE WHEN list_dot_product(CAST(embedding AS DOUBLE[]), p[6]) > 0 THEN 32 ELSE 0 END
       |  + CASE WHEN list_dot_product(CAST(embedding AS DOUBLE[]), p[7]) > 0 THEN 64 ELSE 0 END
       |  + CASE WHEN list_dot_product(CAST(embedding AS DOUBLE[]), p[8]) > 0 THEN 128 ELSE 0 END)
       |   AS bucket
       |  FROM embeddings CROSS JOIN planes)""".stripMargin
  }

  /** Random-projection sign bucket (0..255) of a double vector — the
    * LSH partitioning key for llm_simsearch_ivf.
    */
  private[operators] def rpBucket(v: Column): Column =
    Planes.planes.zipWithIndex.map { case (p, j) =>
      when(dot(v, typedLit(p.toSeq)) > 0, lit(1 << j)).otherwise(lit(0))
    }.reduce(_ + _)

  /** LSH-bucketed ANN — the 100 TB similarity-search path: every vector is
    * assigned an 8-bit random-projection sign bucket; queries only join
    * their own bucket (equi-join on the bucket key → hash-partitionable,
    * no all-pairs). Recall < 1 by construction, but both engines compute
    * the identical bucketing (fixed ±1 planes, double arithmetic, 2e-4
    * minimum sign margin), so results hash-match exactly.
    */
  val simsearchIvf: Q = (s, d) => {
    val base = Tables.embeddings(s, d)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .withColumn("bucket", rpBucket(col("v")))
    val queries = base.filter(col("vec_id") < 5)
      .select(col("vec_id").as("query_id"), col("v").as("qv"),
        col("bucket").as("qbucket"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("vec_id"))
    base.join(broadcast(queries),
        col("bucket") === col("qbucket") && col("vec_id") =!= col("query_id"))
      // + 0.0: negative-zero fold, same rationale as knnGraph.
      .withColumn("cos", round(cosine(col("qv"), col("v")), 4) + lit(0.0))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= 5)
      .select(col("query_id"), col("rank"), col("vec_id"), col("cos"))
      .orderBy(col("query_id"), col("rank"))
  }

  /** k-NN GRAPH over the whole embedding corpus — the neighbor-edge list
    * that similarity clustering, diversity sampling, and near-dup audits
    * consume. Same LSH partitioning as llm_simsearch_ivf but with EVERY
    * vector as a query: a bucket self-equi-join bounds the candidate set
    * per node to its bucket's population (corpus² / 256 expected pairs,
    * never all-pairs), then a per-node top-3 window over the codegen'd
    * cosine kernel. At 100 TB the bucket join is a plain shuffle
    * equi-join on the bucket key; recall is traded via the probe count
    * exactly as in the IVF row.
    */
  val knnGraph: Q = (s, d) => {
    val base = Tables.embeddings(s, d)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .withColumn("bucket", rpBucket(col("v")))
    val nbrs = base.select(col("vec_id").as("nbr_id"), col("v").as("nv"),
      col("bucket").as("nbucket"))
    val w = Window.partitionBy(col("vec_id"))
      .orderBy(col("cos").desc, col("nbr_id"))
    base.join(nbrs,
        col("bucket") === col("nbucket") && col("vec_id") =!= col("nbr_id"))
      // + 0.0 folds IEEE negative zero (a tiny negative cosine rounded to
      // -0.0) into +0.0 — engines disagree on the sign bit's string form.
      .withColumn("cos", round(cosine(col("v"), col("nv")), 4) + lit(0.0))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= 3)
      .select(col("vec_id"), col("rank"), col("nbr_id"), col("cos"))
      .orderBy(col("vec_id"), col("rank"))
  }

  // =====================================================================
  // Multimodal columns
  // =====================================================================

  /** Opaque binary payload + typed metadata struct traveling through
    * relational ops: byte length, md5, hex prefix, struct field access.
    * The imperative decode path lives in Multimodal.pipeline (mapPartitions
    * with a stubbed codec); this query is the declarative plumbing.
    * Text is ASCII in the testdata, so DuckDB's char-based substring
    * equals Spark's byte-based one.
    */
  val multimodalCols: Q = (s, d) =>
    Tables.documents(s, d)
      .withColumn("payload", col("text").cast("binary"))
      .withColumn("meta", struct(col("lang"), col("n_chars")))
      .select(
        col("doc_id"),
        length(col("payload")).cast("long").as("n_bytes"),
        md5(col("payload")).as("payload_md5"),
        hex(substring(col("payload"), 1, 4)).as("prefix_hex"),
        col("meta").getField("lang").as("meta_lang"),
        col("meta").getField("n_chars").as("meta_chars"))
      .orderBy(col("doc_id"))

  /** Domain mixing weights (the Pile/DoReMi training-mixture step): given a
    * target distribution over sources (uniform here — the rebalancing case),
    * compute each domain's actual share, the up/down-sampling weight that
    * hits the target, and the expected per-domain document count under the
    * corpus budget. One k-row aggregate + a 1-row broadcast back; all ratios
    * in integer ppm (exact at any scale, fold-order-free). At 100 TB the
    * weights drive llm_sample_stratified-style deterministic sampling.
    */
  val domainMix: Q = (s, d) => {
    val docs = Tables.documents(s, d)
    val counts = docs.groupBy(col("source")).agg(count(lit(1)).as("n_docs"))
    val totals = docs.agg(count(lit(1)).as("total"),
      countDistinct(col("source")).as("k"))
    counts.crossJoin(broadcast(totals))
      .select(
        col("source"), col("n_docs"),
        // `div`, not `/`: Spark's Column `/` is double division even on
        // longs, and these ratios must stay exact integers for hash parity
        expr("n_docs * 1000000 div total").as("actual_ppm"),
        expr("1000000 div k").as("target_ppm"),
        expr("total * 1000000 div (k * n_docs)").as("weight_ppm"),
        expr("total div k").as("expected_n"))
      .orderBy(col("source"))
  }

  /** Winnowing document fingerprints (Schleimer et al., SIGMOD'03 — the
    * MOSS algorithm): 8-char gram rolling hashes, and a gram is SELECTED
    * when it is the minimum of the w=4 window it opens — guaranteeing every
    * w-run contributes a fingerprint (density → 2/(w+1)) while staying
    * position-robust under insertion, which plain min-sampling is not. The
    * explode is narrow ((doc, pos, hash32) rows only), one window shuffle on
    * doc_id — the llm_chunk_text cost shape; hashes are 32-bit ints from
    * md5 so both engines agree bit-exactly.
    */
  val winnowFingerprint: Q = (s, d) => {
    val grams = Tables.documents(s, d)
      .filter(length(col("text")) >= 8)
      .select(col("doc_id"),
        explode(sequence(lit(1), length(col("text")) - 7)).as("p"),
        col("text"))
      .select(col("doc_id"), col("p"),
        conv(substring(md5(col("text").substr(col("p"), lit(8)).cast("binary")), 1, 8),
          16, 10).cast("long").as("h"))
    val w = Window.partitionBy(col("doc_id")).orderBy(col("p"))
      .rowsBetween(Window.currentRow, 3)
    grams.withColumn("hmin", min(col("h")).over(w))
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_grams"),
        sum(when(col("h") === col("hmin"), 1L).otherwise(0L)).as("n_selected"),
        countDistinct(when(col("h") === col("hmin"), col("h"))).as("n_fp"),
        min(when(col("h") === col("hmin"), col("h"))).as("min_fp"))
      .withColumn("density_ppm", expr("n_selected * 1000000 div n_grams"))
      .orderBy(col("doc_id"))
  }

  /** URL canonicalization + dedup — the first dedup a web-crawl corpus
    * runs (the same page arrives as http/HTTPS, mixed-case hosts, with
    * tracking params and fragments): lowercase scheme+host, drop the
    * default :443 port, strip `utm_*`/`ref` tracking params and the
    * fragment, then dedup on the canonical form (keeper = min key, count
    * of raw variants per page). URLs are synthesized from orders with
    * deliberate variation (host case by key parity, three utm sources) so
    * raw-distinct strictly exceeds canonical-distinct. All codegen string
    * builtins in the backref-free regex subset both engines share; one
    * hash agg on the canonical key — shuffle carries (canon, key) only.
    */
  val dedupUrl: Q = (s, d) => {
    val raw = Tables.orders(s, d).select(col("o_orderkey").as("k"),
      expr(
        """concat(
          |  CASE WHEN o_orderkey % 2 = 0 THEN 'HTTPS://Shop-' ELSE 'https://shop-' END,
          |  CAST(o_custkey % 5 AS STRING), '.Example.COM:443/item/',
          |  CAST(o_orderkey % 100 AS STRING),
          |  '?utm_source=', CASE CAST(o_orderkey % 3 AS INT)
          |     WHEN 0 THEN 'mail' WHEN 1 THEN 'ads' ELSE 'feed' END,
          |  '&ref=', CAST(o_orderkey % 7 AS STRING),
          |  '&id=', CAST(o_orderkey % 100 AS STRING),
          |  '#sec-', CAST(o_orderkey % 4 AS STRING))""".stripMargin).as("url"))
    val canon = raw.withColumn("canonical_url", expr(
      """replace(
        |  regexp_replace(
        |    regexp_replace(
        |      concat(lower(regexp_extract(url, '^[^/]+//[^/]+', 0)),
        |             substring(url, length(regexp_extract(url, '^[^/]+//[^/]+', 0)) + 1)),
        |      '#.*$', ''),
        |    '(utm_[a-z]+|ref)=[^&#]*&', ''),
        |  ':443/', '/')""".stripMargin))
    canon.groupBy(col("canonical_url"))
      .agg(count(lit(1)).as("n_raw"),
        countDistinct(col("url")).as("n_raw_distinct"),
        min(col("k")).as("keeper_key"))
      .orderBy(col("canonical_url"))
  }

  /** Gopher-style heuristic quality RULES (Rae et al. 2021 §A1.1 / the
    * C4 filter family, re-derived as an execution shape): per-document
    * word count, mean word length, alphabetic-word ratio, and
    * distinct-stopword presence each gate independently; `keep` is the
    * conjunction. All codegen'd string/array builtins — ONE narrow map
    * over the corpus with no shuffle before the output order: the first
    * filter a 100 TB raw crawl passes, at scan speed.
    */
  val gopherRules: Q = (s, d) => {
    val toks = split(col("text"), " ")
    Tables.documents(s, d)
      .withColumn("n_words", size(toks).cast("long"))
      .withColumn("mean_wlen", round(
        length(regexp_replace(col("text"), "\\s", "")).cast("double") /
          col("n_words"), 4))
      .withColumn("alpha_words",
        size(filter(toks, t => t.rlike("[A-Za-z]"))).cast("long"))
      .withColumn("n_stop", size(array_intersect(array_distinct(toks),
        array(lit("the"), lit("a"), lit("of"), lit("and"), lit("to"))))
        .cast("long"))
      .select(col("doc_id"), col("n_words"), col("mean_wlen"),
        col("n_words").between(10L, 100000L).as("r_words"),
        col("mean_wlen").between(2.0, 12.0).as("r_wlen"),
        (col("alpha_words") * 10 >= col("n_words") * 8).as("r_alpha"),
        (col("n_stop") >= 2).as("r_stop"))
      .withColumn("keep",
        col("r_words") && col("r_wlen") && col("r_alpha") && col("r_stop"))
      .orderBy(col("doc_id"))
  }

  /** Corpus-vs-benchmark dedup with a BLOOM pre-filter (the two-phase
    * shape a 100 TB decontamination actually runs): the benchmark
    * side's keys fold into ONE `bloom_filter_agg` sketch (constant
    * size, inlined as a literal — a broadcast in cluster terms), the
    * corpus pre-filters through the codegen'd `might_contain` with NO
    * join and NO shuffle — the non-matching bulk drops at scan speed —
    * and only the surviving candidates pay the exact semi-join. Bloom
    * false positives cannot leak: phase 2 is exact, so the OUTPUT is
    * deterministic and DuckDB-oracled even though the filter is
    * probabilistic. Match key = the first-5-word prefix (the
    * contamination signature exact-hash matching misses).
    */
  val dedupBloom: Q = (s, d) => {
    Tables.documents(s, d)
      .select(col("doc_id"),
        array_join(slice(split(col("text"), " "), 1, 5), " ").as("pre"))
      .createOrReplaceTempView("g_dbloom_docs")
    s.sql(
      """WITH bench AS (
        |  SELECT pre FROM g_dbloom_docs WHERE doc_id % 5 = 0),
        |corpus AS (
        |  SELECT doc_id, pre FROM g_dbloom_docs WHERE doc_id % 5 <> 0),
        |cand AS (
        |  SELECT doc_id, pre FROM corpus
        |  WHERE bloom_might_contain(
        |    (SELECT bloom_agg(xxhash64(pre), 1000L, 16384L) FROM bench),
        |    xxhash64(pre))),
        |hits AS (
        |  SELECT doc_id, pre FROM cand WHERE pre IN (SELECT pre FROM bench))
        |SELECT doc_id, pre,
        |  (SELECT count(*) FROM cand) >= (SELECT count(*) FROM hits)
        |    AND (SELECT count(*) FROM hits) > 0 AS prefilter_sound
        |FROM hits ORDER BY doc_id""".stripMargin)
  }

  /** Exact dedup over an opaque BINARY payload column (image/audio/video
    * bytes): group by the payload's md5 — computed on the BYTES, not a
    * string rendition — keep the min doc_id per digest, count copies,
    * bucketed by mime type. The binary column is synthesized from text
    * (this container ships no codecs) but the plan is the production
    * one: binary digest + hash agg, shuffle keyed on digests — uniform
    * and skew-free at any corpus size.
    */
  val multimodalDedup: Q = (s, d) =>
    Tables.documents(s, d)
      .withColumn("payload", col("text").cast("binary"))
      .withColumn("mime", when(pmod(col("doc_id"), lit(3)) === 0, "image/png")
        .when(pmod(col("doc_id"), lit(3)) === 1, "audio/wav")
        .otherwise("video/mp4"))
      .groupBy(col("mime"), md5(col("payload")).as("payload_md5"))
      .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_copies"))
      .select(col("mime"), col("payload_md5"), col("keep_id"), col("n_copies"))
      .orderBy(col("mime"), col("keep_id"))

  // =====================================================================

  def queries: Map[String, Q] = Map(
    "llm_gopher_rules" -> gopherRules,
    "llm_dedup_bloom" -> dedupBloom,
    "llm_multimodal_dedup" -> multimodalDedup,
    "llm_dedup_substring" -> dedupSubstring,
    "llm_semdedup" -> semDedup,
    "llm_dedup_exact" -> dedupExact,
    "llm_dedup_ngram" -> dedupNgram,
    "llm_decontaminate" -> decontaminate,
    "llm_chunk_text" -> chunkText,
    "llm_char_entropy" -> charEntropy,
    "llm_unigram_logprob" -> unigramLogprob,
    "llm_dedup_paragraph" -> dedupParagraph,
    "llm_repetition_filter" -> repetitionFilter,
    "llm_pack_sequences" -> packSequences,
    "llm_dedup_embed" -> dedupEmbed,
    "llm_simsearch_topk" -> simsearchTopk,
    "llm_text_stats" -> textStats,
    "llm_token_count" -> tokenCount,
    "llm_quality_score" -> qualityScore,
    "llm_classifier_score" -> classifierScore,
    "llm_lang_partition" -> langPartition,
    "llm_bpe_pairs" -> bpePairs,
    "llm_lsh_recall" -> lshRecall,
    "llm_dedup_fuzzy" -> dedupFuzzy,
    "llm_dedup_cluster" -> dedupCluster,
    "llm_tfidf" -> tfidf,
    "llm_dedup_simhash" -> dedupSimhash,
    "llm_fingerprint" -> fingerprint,
    "llm_lang_id" -> langId,
    "llm_simsearch_ivf" -> simsearchIvf,
    "llm_knn_graph" -> knnGraph,
    "llm_multimodal_cols" -> multimodalCols,
    "llm_domain_mix" -> domainMix,
    "llm_winnow_fingerprint" -> winnowFingerprint,
    "llm_dedup_url" -> dedupUrl
  )

  /** The banded-MinHash candidate + verification pipeline as DuckDB CTEs —
    * one source of truth for the llm_dedup_fuzzy and llm_dedup_cluster
    * oracles, mirroring verifiedNearDupPairs stage for stage.
    */
  private[operators] val fuzzyPairsCtes: String =
    """docs AS (
      |  SELECT doc_id,
      |   list_distinct(list_transform(
      |     range(1, greatest(len(string_split(text,' ')) - 1, 1)),
      |     i -> string_split(text,' ')[i] || ' ' ||
      |          string_split(text,' ')[i+1] || ' ' ||
      |          string_split(text,' ')[i+2])) AS sh
      |  FROM documents),
      |nonempty AS (SELECT * FROM docs WHERE len(sh) > 0),
      |ex AS (
      |  SELECT doc_id, md5(g) || md5(g || '#2') AS md
      |  FROM (SELECT doc_id, unnest(sh) AS g FROM nonempty)),
      |mh AS (
      |  SELECT doc_id,
      |   min(substring(md, 1, 4)) AS m0, min(substring(md, 5, 4)) AS m1,
      |   min(substring(md, 9, 4)) AS m2, min(substring(md, 13, 4)) AS m3,
      |   min(substring(md, 17, 4)) AS m4, min(substring(md, 21, 4)) AS m5,
      |   min(substring(md, 25, 4)) AS m6, min(substring(md, 29, 4)) AS m7,
      |   min(substring(md, 33, 4)) AS m8, min(substring(md, 37, 4)) AS m9,
      |   min(substring(md, 41, 4)) AS m10, min(substring(md, 45, 4)) AS m11,
      |   min(substring(md, 49, 4)) AS m12, min(substring(md, 53, 4)) AS m13,
      |   min(substring(md, 57, 4)) AS m14, min(substring(md, 61, 4)) AS m15
      |  FROM ex GROUP BY doc_id),
      |bands AS (
      |  SELECT doc_id, i AS band_id,
      |   CASE i WHEN 0 THEN m0 || m1 WHEN 1 THEN m2 || m3
      |          WHEN 2 THEN m4 || m5 WHEN 3 THEN m6 || m7
      |          WHEN 4 THEN m8 || m9 WHEN 5 THEN m10 || m11
      |          WHEN 6 THEN m12 || m13 ELSE m14 || m15 END AS key
      |  FROM mh CROSS JOIN (SELECT unnest(range(0, 8)) AS i)),
      |cand AS (
      |  SELECT DISTINCT x.doc_id AS id1, y.doc_id AS id2
      |  FROM bands x JOIN bands y
      |    ON x.band_id = y.band_id AND x.key = y.key AND x.doc_id < y.doc_id),
      |verified AS (
      |  SELECT id1, id2, jaccard FROM (
      |    SELECT id1, id2,
      |     round(len(list_intersect(a.sh, b.sh)) /
      |           (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))),
      |       4) AS jaccard
      |    FROM cand
      |      JOIN nonempty a ON a.doc_id = cand.id1
      |      JOIN nonempty b ON b.doc_id = cand.id2)
      |  WHERE jaccard >= 0.5)""".stripMargin

  def oracles: Map[String, String] = Map(
    "llm_gopher_rules" ->
      """WITH base AS (
        |  SELECT doc_id,
        |   CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words,
        |   CAST(length(regexp_replace(text, '\s', '', 'g')) AS DOUBLE)
        |     AS chars_no_ws,
        |   CAST(len(list_filter(string_split(text, ' '),
        |     t -> regexp_matches(t, '[A-Za-z]'))) AS BIGINT) AS alpha_words,
        |   CAST(len(list_intersect(list_distinct(string_split(text, ' ')),
        |     ['the','a','of','and','to'])) AS BIGINT) AS n_stop
        |  FROM documents),
        |r AS (
        |  SELECT doc_id, n_words,
        |   round(chars_no_ws / n_words, 4) AS mean_wlen,
        |   n_words BETWEEN 10 AND 100000 AS r_words,
        |   round(chars_no_ws / n_words, 4) BETWEEN 2.0 AND 12.0 AS r_wlen,
        |   alpha_words * 10 >= n_words * 8 AS r_alpha,
        |   n_stop >= 2 AS r_stop
        |  FROM base)
        |SELECT doc_id, n_words, mean_wlen, r_words, r_wlen, r_alpha, r_stop,
        |       r_words AND r_wlen AND r_alpha AND r_stop AS keep
        |FROM r ORDER BY doc_id""".stripMargin,
    "llm_dedup_bloom" ->
      """WITH k AS (
        |  SELECT doc_id,
        |         array_to_string(string_split(text, ' ')[1:5], ' ') AS pre
        |  FROM documents)
        |SELECT doc_id, pre, TRUE AS prefilter_sound
        |FROM k WHERE doc_id % 5 <> 0
        |  AND pre IN (SELECT pre FROM k WHERE doc_id % 5 = 0)
        |ORDER BY doc_id""".stripMargin,
    "llm_multimodal_dedup" ->
      """SELECT CASE WHEN doc_id % 3 = 0 THEN 'image/png'
        |            WHEN doc_id % 3 = 1 THEN 'audio/wav'
        |            ELSE 'video/mp4' END AS mime,
        |       md5(text) AS payload_md5,
        |       min(doc_id) AS keep_id, count(*) AS n_copies
        |FROM documents GROUP BY 1, 2
        |ORDER BY mime, keep_id""".stripMargin,
    "llm_semdedup" ->
      """WITH b0 AS (
        |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |mx AS (SELECT max(vec_id) AS m FROM b0),
        |kk AS (SELECT GREATEST(16, CAST(floor(sqrt(count(*))) AS BIGINT)) AS k FROM b0),
        |base AS (
        |  SELECT vec_id, v FROM b0
        |  UNION ALL
        |  SELECT vec_id + (SELECT m FROM mx) + 1, v FROM b0 WHERE vec_id % 20 = 0),
        |seeds AS (
        |  SELECT cid, sv FROM (
        |    SELECT row_number() OVER (
        |        ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) - 1 AS cid,
        |      v AS sv FROM b0)
        |  WHERE cid < (SELECT k FROM kk)),
        |a0 AS (
        |  SELECT vec_id, v, cid FROM (
        |    SELECT b0.vec_id, b0.v, seeds.cid,
        |      row_number() OVER (PARTITION BY b0.vec_id
        |        ORDER BY round(list_cosine_similarity(b0.v, seeds.sv), 4) DESC,
        |                 seeds.cid) AS rn
        |    FROM b0, seeds)
        |  WHERE rn = 1),
        |ref AS (
        |  SELECT cid, idx, SUM(CAST(round(el * 1000000) AS BIGINT)) AS mu
        |  FROM (SELECT cid, unnest(range(1, len(v) + 1)) AS idx,
        |               unnest(v) AS el FROM a0)
        |  GROUP BY cid, idx),
        |cents AS (
        |  SELECT cid, list(CAST(mu AS DOUBLE) ORDER BY idx) AS cv
        |  FROM ref GROUP BY cid),
        |assigned AS (
        |  SELECT vec_id, v, cid FROM (
        |    SELECT base.vec_id, base.v, cents.cid,
        |      row_number() OVER (PARTITION BY base.vec_id
        |        ORDER BY round(list_cosine_similarity(base.v, cents.cv), 4) DESC,
        |                 cents.cid) AS rn
        |    FROM base, cents)
        |  WHERE rn = 1),
        |removed AS (
        |  SELECT DISTINCT a2.cid, a2.vec_id AS rm
        |  FROM assigned a1 JOIN assigned a2
        |    ON a1.cid = a2.cid AND a1.vec_id < a2.vec_id
        |  WHERE round(list_cosine_similarity(a1.v, a2.v), 4) >= 0.95)
        |SELECT a.cid AS cluster_id, CAST(a.n AS BIGINT) AS n_vecs,
        |       CAST(coalesce(r.n, 0) AS BIGINT) AS n_removed
        |FROM (SELECT cid, count(*) AS n FROM assigned GROUP BY cid) a
        |LEFT JOIN (SELECT cid, count(DISTINCT rm) AS n FROM removed GROUP BY cid) r
        |  USING (cid)
        |ORDER BY cluster_id""".stripMargin,
    "llm_dedup_substring" ->
      """WITH docs AS (
        |  SELECT doc_id, text FROM documents WHERE length(text) >= 40),
        |pos AS (
        |  SELECT doc_id, text,
        |         unnest(range(1, length(text) - 38)) AS pos
        |  FROM docs),
        |wins AS (
        |  SELECT doc_id, md5(substr(text, CAST(pos AS INT), 40)) AS h
        |  FROM pos),
        |anch AS (
        |  SELECT * FROM wins
        |  WHERE CAST('0x' || substring(h, 1, 1) AS INT) % 4 = 0),
        |dup AS (
        |  SELECT h FROM anch GROUP BY h HAVING count(DISTINCT doc_id) > 1)
        |SELECT a.doc_id, count(*) AS n_anchors,
        |  CAST(sum(CASE WHEN a.h IN (SELECT h FROM dup) THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_dup_anchors,
        |  CAST(sum(CASE WHEN a.h IN (SELECT h FROM dup) THEN 1 ELSE 0 END)
        |    * 1000000 // count(*) AS BIGINT) AS dup_ppm
        |FROM anch a GROUP BY a.doc_id ORDER BY a.doc_id""".stripMargin,
    "llm_dedup_exact" ->
      """SELECT min(doc_id) AS keep_id, count(*) AS n_copies,
        | sha256(lower(trim(text))) AS h
        |FROM documents GROUP BY 3 ORDER BY keep_id""".stripMargin,

    "llm_repetition_filter" ->
      """WITH b AS (
        |  SELECT doc_id,
        |   list_transform(range(1, len(string_split(text, ' '))),
        |     i -> string_split(text, ' ')[i] || ' ' ||
        |          string_split(text, ' ')[i + 1]) AS bg,
        |   string_split(text, '. ') AS sents
        |  FROM documents WHERE len(string_split(text, ' ')) >= 2)
        |SELECT doc_id, CAST(len(bg) AS BIGINT) AS n_bigrams,
        | round(1.0 - len(list_distinct(bg)) / len(bg), 4) AS dup_bigram_frac,
        | round(1.0 - len(list_distinct(sents)) / len(sents), 4) AS dup_sent_frac,
        | (round(1.0 - len(list_distinct(bg)) / len(bg), 4) > 0.2 OR
        |  round(1.0 - len(list_distinct(sents)) / len(sents), 4) > 0.3)
        |   AS repetitious
        |FROM b ORDER BY doc_id""".stripMargin,
    "llm_dedup_paragraph" ->
      """WITH p AS (
        |  SELECT doc_id, string_split(text, '. ') AS parts FROM documents),
        |e AS (
        |  SELECT doc_id, unnest(range(len(parts))) AS pos,
        |         unnest(parts) AS sent
        |  FROM p),
        |f AS (SELECT doc_id, pos, sent FROM e WHERE length(trim(sent)) > 0),
        |r AS (
        |  SELECT doc_id, pos,
        |   row_number() OVER (PARTITION BY sha256(lower(trim(sent)))
        |     ORDER BY doc_id, pos) AS rn
        |  FROM f)
        |SELECT doc_id, count(*) AS n_sents,
        | count(CASE WHEN rn = 1 THEN 1 END) AS n_kept,
        | round(count(CASE WHEN rn = 1 THEN 1 END) / count(*), 4) AS survival
        |FROM r GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "llm_char_entropy" ->
      """WITH chars AS (
        |  SELECT doc_id, unnest(regexp_extract_all(text, '(?s).')) AS ch
        |  FROM documents),
        |pc AS (SELECT doc_id, ch, count(*) AS cnt FROM chars GROUP BY 1, 2),
        |tot AS (SELECT doc_id, CAST(sum(cnt) AS DOUBLE) AS n FROM pc GROUP BY 1)
        |SELECT p.doc_id, count(*) AS n_distinct_chars,
        | round(sum(-1 * cnt * CAST(round(ln(cnt / n) * 1e6) AS BIGINT))
        |   / (max(n) * 1e6), 4) AS entropy_nats
        |FROM pc p JOIN tot t USING (doc_id)
        |GROUP BY p.doc_id ORDER BY p.doc_id""".stripMargin,

    "llm_unigram_logprob" ->
      """WITH toks AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS tok
        |  FROM documents),
        |counts AS (SELECT tok, count(*) AS cnt FROM toks GROUP BY tok),
        |n AS (SELECT CAST(sum(cnt) AS DOUBLE) AS n_total FROM counts),
        |sc AS (
        |  SELECT doc_id, count(*) AS n_tokens,
        |   CAST(sum(CAST(round(ln(cnt / n_total) * 1000000, 0) AS BIGINT))
        |     AS BIGINT) AS units
        |  FROM toks JOIN counts USING (tok) CROSS JOIN n
        |  GROUP BY doc_id)
        |SELECT doc_id, n_tokens,
        |       round(units / (n_tokens * 1000000.0), 4) AS avg_logprob
        |FROM sc ORDER BY doc_id""".stripMargin,
    "llm_chunk_text" ->
      """WITH f AS (
        |  SELECT doc_id, text,
        |   unnest(range(0, greatest((length(text) - 100 + 399) // 400, 1)))
        |     AS chunk_idx
        |  FROM documents WHERE length(text) >= 1)
        |SELECT doc_id, chunk_idx, chunk_idx * 400 AS off,
        |       length(substring(text, CAST(chunk_idx * 400 + 1 AS INTEGER), 500))
        |         AS chunk_chars,
        |       md5(substring(text, CAST(chunk_idx * 400 + 1 AS INTEGER), 500))
        |         AS chunk_md5
        |FROM f ORDER BY doc_id, chunk_idx""".stripMargin,
    "llm_pack_sequences" ->
      """WITH t AS (
        |  SELECT lang, doc_id,
        |   CAST(ceil(n_chars / 4.0) AS BIGINT) AS tokens
        |  FROM documents),
        |c AS (
        |  SELECT lang, tokens,
        |   sum(tokens) OVER (PARTITION BY lang ORDER BY doc_id
        |     ROWS UNBOUNDED PRECEDING) AS cum
        |  FROM t)
        |SELECT lang, CAST((cum - tokens) // 4096 AS BIGINT) AS bin,
        |       count(*) AS n_docs,
        |       CAST(sum(tokens) AS BIGINT) AS bin_tokens,
        |       round(sum(tokens) / 4096.0, 4) AS fill_ratio
        |FROM c GROUP BY lang, bin ORDER BY lang, bin""".stripMargin,
    "llm_decontaminate" ->
      """WITH sh AS (
        |  SELECT doc_id,
        |   list_distinct(list_transform(
        |     range(1, greatest(len(string_split(text,' ')) - 1, 1)),
        |     i -> string_split(text,' ')[i] || ' ' ||
        |          string_split(text,' ')[i+1] || ' ' ||
        |          string_split(text,' ')[i+2])) AS sh
        |  FROM documents),
        |ne AS (SELECT * FROM sh WHERE len(sh) > 0),
        |bench AS (
        |  SELECT doc_id AS bench_id, unnest(sh) AS g FROM ne
        |  WHERE doc_id % 100 = 7),
        |corpus AS (
        |  SELECT doc_id, len(sh) AS sz, unnest(sh) AS g FROM ne
        |  WHERE doc_id % 100 <> 7)
        |SELECT doc_id, bench_id, round(count(*) / sz, 4) AS overlap
        |FROM corpus JOIN bench USING (g)
        |GROUP BY doc_id, bench_id, sz
        |HAVING round(count(*) / sz, 4) >= 0.5
        |ORDER BY doc_id, bench_id""".stripMargin,
    "llm_dedup_ngram" ->
      """WITH base AS (
        |  SELECT doc_id, lang, n_chars // 50 AS band,
        |   list_distinct(list_transform(
        |     range(1, greatest(len(string_split(text,' ')) - 1, 1)),
        |     i -> string_split(text,' ')[i] || ' ' ||
        |          string_split(text,' ')[i+1] || ' ' ||
        |          string_split(text,' ')[i+2])) AS sh
        |  FROM documents)
        |SELECT id1, id2, jaccard FROM (
        |  SELECT a.doc_id AS id1, b.doc_id AS id2,
        |   len(list_intersect(a.sh, b.sh)) AS inter,
        |   round(len(list_intersect(a.sh, b.sh)) /
        |         (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))),
        |     4) AS jaccard
        |  FROM base a JOIN base b
        |    ON a.lang = b.lang AND a.band = b.band AND a.doc_id < b.doc_id)
        |WHERE inter >= 1
        |ORDER BY jaccard DESC, id1, id2 LIMIT 20""".stripMargin,

    "llm_dedup_embed" ->
      s"""WITH $ivfBaseCtes
         |SELECT a.vec_id AS id1, b.vec_id AS id2,
         | round(list_cosine_similarity(a.v, b.v), 4) AS cos
         |FROM base a JOIN base b
         |  ON a.bucket = b.bucket AND a.vec_id < b.vec_id
         |ORDER BY cos DESC, id1, id2 LIMIT 20""".stripMargin,

    "llm_simsearch_topk" ->
      """WITH q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
        |           FROM embeddings WHERE vec_id < 5)
        |SELECT query_id, rank, vec_id, cos FROM (
        |  SELECT q.query_id,
        |   row_number() OVER (PARTITION BY q.query_id
        |     ORDER BY round(list_cosine_similarity(qv, CAST(e.embedding AS DOUBLE[])), 4) DESC,
        |              e.vec_id) AS rank,
        |   e.vec_id,
        |   round(list_cosine_similarity(qv, CAST(e.embedding AS DOUBLE[])), 4) AS cos
        |  FROM embeddings e JOIN q ON e.vec_id <> q.query_id)
        |WHERE rank <= 10 ORDER BY query_id, rank""".stripMargin,

    "llm_text_stats" ->
      """WITH toks AS (
        |  SELECT lang, doc_id, unnest(string_split(text, ' ')) AS tok
        |  FROM documents),
        |stats AS (
        |  SELECT lang, count(DISTINCT doc_id) AS n_docs, count(*) AS total_tokens,
        |   count(DISTINCT tok) AS n_distinct_tokens
        |  FROM toks GROUP BY lang),
        |top AS (
        |  SELECT lang, tok AS top_token, cnt AS top_token_cnt FROM (
        |    SELECT lang, tok, count(*) AS cnt,
        |     row_number() OVER (PARTITION BY lang ORDER BY count(*) DESC, tok) AS rn
        |    FROM toks GROUP BY lang, tok)
        |  WHERE rn = 1)
        |SELECT stats.lang, n_docs, total_tokens,
        | round(total_tokens / n_docs, 2) AS avg_tokens_per_doc,
        | n_distinct_tokens, top_token, top_token_cnt
        |FROM stats JOIN top ON stats.lang = top.lang
        |ORDER BY stats.lang""".stripMargin,

    "llm_token_count" ->
      """SELECT doc_id,
        | len(regexp_split_to_array(text, '\s+')) AS ws_tokens,
        | len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS re_tokens,
        | CAST(ceil(length(text) / 4.0) AS BIGINT) AS bpe_est,
        | length(text) AS n_chars_live
        |FROM documents ORDER BY doc_id""".stripMargin,

    "llm_quality_score" ->
      """WITH base AS (
        |  SELECT doc_id,
        |   CAST(len(string_split(text, ' ')) AS DOUBLE) AS n_tokens,
        |   CAST(len(list_filter(string_split(text, ' '),
        |     t -> t IN ('the','a','of','and','to'))) AS DOUBLE) AS n_stop,
        |   CAST(length(regexp_replace(text, '\s', '', 'g')) AS DOUBLE) AS chars_no_ws
        |  FROM documents)
        |SELECT doc_id,
        | CAST(n_tokens AS BIGINT) AS n_tokens,
        | round(chars_no_ws / n_tokens, 4) AS avg_token_len,
        | round(n_stop / n_tokens, 4) AS stopword_ratio,
        | round(0.5 * (n_stop / n_tokens) +
        |       0.5 * least(n_tokens / 100.0, 1.0), 4) AS quality
        |FROM base ORDER BY doc_id""".stripMargin,

    "llm_classifier_score" ->
      """WITH tok AS (
        |  SELECT doc_id, t FROM (
        |    SELECT doc_id,
        |           unnest(regexp_split_to_array(lower(text), '[^a-z0-9]+')) AS t
        |    FROM documents) WHERE t <> ''),
        |w AS (
        |  SELECT doc_id,
        |         CAST('0x' || substring(md5(t), 1, 8) AS BIGINT) % 4096 % 2001 AS w
        |  FROM tok),
        |sc AS (
        |  SELECT doc_id, count(*) AS n_toks,
        |         CAST(CAST(sum(w) AS BIGINT) // count(*) AS BIGINT) AS score_mu
        |  FROM w GROUP BY doc_id)
        |SELECT doc_id, n_toks, score_mu,
        |       CASE WHEN score_mu < 900 THEN 'drop'
        |            WHEN score_mu > 1100 THEN 'keep'
        |            ELSE 'mid' END AS band
        |FROM sc ORDER BY doc_id""".stripMargin,

    "llm_lang_partition" ->
      """SELECT lang, source, count(*) AS n_docs,
        | CAST(sum(n_chars) AS BIGINT) AS total_chars
        |FROM documents GROUP BY lang, source ORDER BY lang, source""".stripMargin,

    "llm_bpe_pairs" ->
      """WITH t AS (
        |  SELECT string_split(text, ' ') AS t FROM documents
        |  WHERE len(string_split(text, ' ')) >= 2),
        |p AS (
        |  SELECT unnest(list_transform(range(1, len(t)),
        |    i -> t[i] || ' ' || t[i + 1])) AS pair
        |  FROM t)
        |SELECT pair, count(*) AS cnt FROM p
        |GROUP BY pair ORDER BY cnt DESC, pair LIMIT 20""".stripMargin,

    "llm_dedup_fuzzy" ->
      s"""WITH $fuzzyPairsCtes
         |SELECT id1, id2, jaccard FROM verified
         |ORDER BY jaccard DESC, id1, id2 LIMIT 50""".stripMargin,

    "llm_dedup_cluster" ->
      s"""WITH RECURSIVE $fuzzyPairsCtes,
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
         |sizes AS (
         |  SELECT cluster_id, count(*) AS cluster_size FROM labels
         |  GROUP BY cluster_id)
         |SELECT doc_id, cluster_id, cluster_size,
         |       doc_id = cluster_id AS is_keeper
         |FROM labels JOIN sizes USING (cluster_id)
         |ORDER BY doc_id""".stripMargin,

    "llm_lsh_recall" ->
      s"""WITH $fuzzyPairsCtes,
         |nb AS (
         |  SELECT doc_id, lang, n_chars // 50 AS band,
         |   list_distinct(list_transform(
         |     range(1, greatest(len(string_split(text,' ')) - 1, 1)),
         |     i -> string_split(text,' ')[i] || ' ' ||
         |          string_split(text,' ')[i+1] || ' ' ||
         |          string_split(text,' ')[i+2])) AS sh
         |  FROM documents),
         |truth AS (
         |  SELECT id1, id2 FROM (
         |    SELECT a.doc_id AS id1, b.doc_id AS id2,
         |     len(list_intersect(a.sh, b.sh)) AS inter,
         |     round(len(list_intersect(a.sh, b.sh)) /
         |           (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))),
         |       4) AS jaccard
         |    FROM nb a JOIN nb b
         |      ON a.lang = b.lang AND a.band = b.band AND a.doc_id < b.doc_id)
         |  WHERE inter >= 1 AND jaccard >= 0.5),
         |lsh AS (SELECT id1, id2 FROM verified),
         |common AS (
         |  SELECT count(*) AS n_common
         |  FROM truth t JOIN lsh l ON t.id1 = l.id1 AND t.id2 = l.id2)
         |SELECT (SELECT count(*) FROM truth) AS n_truth,
         |       (SELECT count(*) FROM lsh) AS n_lsh,
         |       n_common,
         |       round(n_common / (SELECT count(*) FROM truth), 4) AS recall,
         |       round(n_common / (SELECT count(*) FROM truth), 4) >= 0.9
         |         AS recall_floor_ok
         |FROM common""".stripMargin,

    "llm_tfidf" ->
      """WITH tfc AS (
        |  SELECT doc_id, term, count(*) AS tf FROM (
        |    SELECT doc_id, unnest(string_split(text, ' ')) AS term
        |    FROM documents)
        |  GROUP BY doc_id, term),
        |dfc AS (SELECT term, count(*) AS df FROM tfc GROUP BY term),
        |n AS (SELECT count(*) AS n_docs FROM documents)
        |SELECT doc_id, rank, term, score FROM (
        |  SELECT doc_id, term,
        |   round(tf * ln(n_docs / df), 4) AS score,
        |   row_number() OVER (PARTITION BY doc_id
        |     ORDER BY round(tf * ln(n_docs / df), 4) DESC, term) AS rank
        |  FROM tfc JOIN dfc USING (term) CROSS JOIN n)
        |WHERE rank <= 3 ORDER BY doc_id, rank""".stripMargin,

    "llm_dedup_simhash" ->
      """WITH toks AS (
        |  SELECT DISTINCT doc_id, tok FROM (
        |    SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents)),
        |ex AS (
        |  SELECT doc_id, md5(tok) AS md, i
        |  FROM toks CROSS JOIN (SELECT unnest(range(1, 17)) AS i)),
        |nib AS (
        |  SELECT doc_id, i,
        |   strpos('0123456789abcdef', substring(md, i, 1)) - 1 AS v FROM ex),
        |bits AS (
        |  SELECT doc_id, i,
        |   sum(((v >> 0) & 1) * 2 - 1) AS s0, sum(((v >> 1) & 1) * 2 - 1) AS s1,
        |   sum(((v >> 2) & 1) * 2 - 1) AS s2, sum(((v >> 3) & 1) * 2 - 1) AS s3
        |  FROM nib GROUP BY doc_id, i),
        |hexn AS (
        |  SELECT doc_id, i, substring('0123456789abcdef',
        |    (CASE WHEN s3 > 0 THEN 8 ELSE 0 END + CASE WHEN s2 > 0 THEN 4 ELSE 0 END
        |   + CASE WHEN s1 > 0 THEN 2 ELSE 0 END + CASE WHEN s0 > 0 THEN 1 ELSE 0 END)
        |    + 1, 1) AS hc
        |  FROM bits)
        |SELECT doc_id, string_agg(hc, '' ORDER BY i) AS simhash
        |FROM hexn GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "llm_fingerprint" ->
      """WITH fp AS (
        |  SELECT doc_id,
        |   list_min(list_transform(
        |     list_distinct(list_transform(
        |       range(1, greatest(len(string_split(text, ' ')) - 1, 1)),
        |       i -> string_split(text, ' ')[i] || ' ' ||
        |            string_split(text, ' ')[i+1] || ' ' ||
        |            string_split(text, ' ')[i+2])),
        |     s -> md5(s))) AS fp
        |  FROM documents)
        |SELECT doc_id, fp, count(*) OVER (PARTITION BY fp) AS n_same
        |FROM fp ORDER BY doc_id""".stripMargin,

    "llm_lang_id" ->
      """WITH toks AS (
        |  SELECT doc_id, lang, unnest(string_split(text, ' ')) AS tok
        |  FROM documents),
        |profile AS (
        |  SELECT lang AS p_lang, tok AS p_tok FROM (
        |    SELECT lang, tok, count(*) AS cnt,
        |     row_number() OVER (PARTITION BY lang ORDER BY count(*) DESC, tok) AS rn
        |    FROM toks GROUP BY lang, tok)
        |  WHERE rn <= 20),
        |doctoks AS (SELECT DISTINCT doc_id, tok FROM toks),
        |pred AS (
        |  SELECT doc_id AS s_doc, p_lang AS predicted, score FROM (
        |    SELECT doc_id, p_lang, count(*) AS score,
        |     row_number() OVER (PARTITION BY doc_id
        |       ORDER BY count(*) DESC, p_lang) AS rn
        |    FROM doctoks JOIN profile ON tok = p_tok
        |    GROUP BY doc_id, p_lang)
        |  WHERE rn = 1)
        |SELECT doc_id, lang AS actual,
        | coalesce(predicted, 'unknown') AS predicted,
        | coalesce(score, 0) AS score,
        | lang = coalesce(predicted, 'unknown') AS correct
        |FROM documents LEFT JOIN pred ON doc_id = s_doc
        |ORDER BY doc_id""".stripMargin,

    "llm_knn_graph" ->
      s"""WITH $ivfBaseCtes
         |SELECT vec_id, rank, nbr_id, cos FROM (
         |  SELECT a.vec_id,
         |   row_number() OVER (PARTITION BY a.vec_id
         |     ORDER BY round(list_cosine_similarity(a.v, b.v), 4) + 0.0 DESC,
         |       b.vec_id) AS rank,
         |   b.vec_id AS nbr_id,
         |   round(list_cosine_similarity(a.v, b.v), 4) + 0.0 AS cos
         |  FROM base a JOIN base b
         |    ON a.bucket = b.bucket AND a.vec_id <> b.vec_id)
         |WHERE rank <= 3 ORDER BY vec_id, rank""".stripMargin,

    "llm_simsearch_ivf" ->
      s"""WITH $ivfBaseCtes,
         |q AS (SELECT vec_id AS query_id, v AS qv, bucket AS qbucket
         |      FROM base WHERE vec_id < 5)
         |SELECT query_id, rank, vec_id, cos FROM (
         |  SELECT q.query_id,
         |   row_number() OVER (PARTITION BY q.query_id
         |     ORDER BY round(list_cosine_similarity(qv, b.v), 4) + 0.0 DESC,
         |       b.vec_id) AS rank,
         |   b.vec_id, round(list_cosine_similarity(qv, b.v), 4) + 0.0 AS cos
         |  FROM base b JOIN q ON b.bucket = q.qbucket AND b.vec_id <> q.query_id)
         |WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin,

    "llm_multimodal_cols" ->
      """SELECT doc_id,
        | octet_length(encode(text)) AS n_bytes,
        | md5(text) AS payload_md5,
        | hex(encode(substring(text, 1, 4))) AS prefix_hex,
        | lang AS meta_lang,
        | n_chars AS meta_chars
        |FROM documents ORDER BY doc_id""".stripMargin,

    "llm_domain_mix" ->
      """WITH counts AS (
        |  SELECT source, count(*) AS n_docs FROM documents GROUP BY source),
        |tot AS (
        |  SELECT count(*) AS total, count(DISTINCT source) AS k FROM documents)
        |SELECT source, n_docs,
        | n_docs * 1000000 // total AS actual_ppm,
        | 1000000 // k AS target_ppm,
        | total * 1000000 // (k * n_docs) AS weight_ppm,
        | total // k AS expected_n
        |FROM counts CROSS JOIN tot ORDER BY source""".stripMargin,

    "llm_winnow_fingerprint" ->
      """WITH grams AS (
        |  SELECT doc_id, i AS p,
        |   CAST(('0x' || substring(md5(substring(text, i, 8)), 1, 8)) AS BIGINT) AS h
        |  FROM documents, LATERAL (SELECT unnest(range(1, length(text) - 6)) AS i)
        |  WHERE length(text) >= 8),
        |win AS (
        |  SELECT doc_id, p, h,
        |   min(h) OVER (PARTITION BY doc_id ORDER BY p
        |                ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS hmin
        |  FROM grams)
        |SELECT doc_id, count(*) AS n_grams,
        | CAST(sum(CASE WHEN h = hmin THEN 1 ELSE 0 END) AS BIGINT) AS n_selected,
        | CAST(count(DISTINCT CASE WHEN h = hmin THEN h END) AS BIGINT) AS n_fp,
        | min(CASE WHEN h = hmin THEN h END) AS min_fp,
        | CAST(sum(CASE WHEN h = hmin THEN 1 ELSE 0 END) AS BIGINT) * 1000000
        |   // count(*) AS density_ppm
        |FROM win GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "llm_dedup_url" ->
      """WITH raw AS (
        |  SELECT o_orderkey AS k,
        |    (CASE WHEN o_orderkey % 2 = 0 THEN 'HTTPS://Shop-' ELSE 'https://shop-' END)
        |    || CAST(o_custkey % 5 AS VARCHAR) || '.Example.COM:443/item/'
        |    || CAST(o_orderkey % 100 AS VARCHAR)
        |    || '?utm_source=' || (CASE CAST(o_orderkey % 3 AS INT)
        |         WHEN 0 THEN 'mail' WHEN 1 THEN 'ads' ELSE 'feed' END)
        |    || '&ref=' || CAST(o_orderkey % 7 AS VARCHAR)
        |    || '&id=' || CAST(o_orderkey % 100 AS VARCHAR)
        |    || '#sec-' || CAST(o_orderkey % 4 AS VARCHAR) AS url
        |  FROM orders),
        |canon AS (
        |  SELECT k, url,
        |    replace(
        |      regexp_replace(
        |        regexp_replace(
        |          lower(regexp_extract(url, '^[^/]+//[^/]+', 0)) ||
        |            substring(url, length(regexp_extract(url, '^[^/]+//[^/]+', 0)) + 1),
        |          '#.*$', ''),
        |        '(utm_[a-z]+|ref)=[^&#]*&', '', 'g'),
        |      ':443/', '/') AS canonical_url
        |  FROM raw)
        |SELECT canonical_url, count(*) AS n_raw,
        |       count(DISTINCT url) AS n_raw_distinct,
        |       min(k) AS keeper_key
        |FROM canon GROUP BY canonical_url ORDER BY canonical_url""".stripMargin
  )
}
