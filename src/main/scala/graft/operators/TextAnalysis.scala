package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Text-analysis operators for training-data pipelines (SURVEY §7.5):
  * quality metrics, token counting, language ID, fingerprinting. All but
  * winnowing are narrow per-row projections of codegen'd builtins — no
  * shuffle, scales linearly with the corpus.
  */
object TextAnalysis {

  /** Per-document quality metrics: char count, token count, average token
    * length. Matches the DuckDB oracle expression-for-expression;
    * zero-token (empty/null) documents get a NULL average instead of an
    * ANSI divide-by-zero error (nullif guard).
    */
  def quality(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      length(col("text")).cast("long").as("n_chars_m"),
      expr("CAST(size(regexp_extract_all(text, '[a-z0-9]+', 0)) AS BIGINT)")
        .as("n_tokens"),
      (length(regexp_replace(col("text"), " ", "")).cast("double") /
        expr("nullif(CAST(size(regexp_extract_all(text, '[a-z0-9]+', 0)) AS DOUBLE), 0.0)"))
        .cast("double").as("avg_token_len"))

  /** GPT-2-style pre-tokenizer regex (contractions | words | numbers |
    * punctuation runs | whitespace runs) — no lookaround, so Java and RE2
    * agree. */
  val BpeTokenRe: String =
    "'(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\\s]+|\\s+"

  /** BPE-ish token count per document (the pre-tokenization pass of a GPT
    * tokenizer; actual merges are vocabulary-dependent and out of scope). */
  def tokenCountBpe(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs.withColumn("n_bpe_tokens",
      size(regexp_extract_all(col(textCol), lit(BpeTokenRe), lit(0))).cast("long"))

  /** Marker words per language, checked in fixed order (deterministic
    * argmax tiebreak: first language with the max marker count wins).
    * Source of truth lives beside the fused kernel
    * ([[graft.functions.LangMixtureCounts.Markers]]) so the regex
    * formulation, the oracle builders, and the kernel cannot drift. */
  val LangMarkers: Seq[(String, Seq[String])] =
    graft.functions.LangMixtureCounts.Markers

  private def markerCount(text: Column, words: Seq[String]): Column =
    words.map(w => size(regexp_extract_all(text,
      lit("(?:^| )" + java.util.regex.Pattern.quote(w) + "(?: |$)"), lit(0))))
      .reduce(_ + _)

  /** Heuristic language ID: count language marker words, pick the argmax
    * ('und' — undetermined — when no marker matches at all). A real
    * deployment swaps in char-n-gram profiles; the operator shape (pure
    * projection, no shuffle) is the point at 100 TB. */
  def langId(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val text = lower(col(textCol))
    val scored = LangMarkers.map { case (lang, words) => (lang, markerCount(text, words)) }
    val best = scored.map(_._2).reduce((a, b) => greatest(a, b))
    val pick = scored.reverse.foldLeft(lit("und")) { case (acc, (lang, cnt)) =>
      when(cnt === best && best > 0, lit(lang)).otherwise(acc)
    }
    docs.withColumn("lang_pred", pick)
  }

  /** Segment-level language mixture (code-switching detection): documents
    * that mix languages mid-text poison monolingual training slices, and
    * a DOC-level language id ([[langId]]) cannot see it — the standard
    * fix (CCNet §4 / multilingual curation practice) is to classify at
    * sentence granularity and aggregate. Splits on sentence punctuation,
    * applies the same marker-word argmax per segment, and reduces to:
    * segment count, modal (primary) language with deterministic
    * first-marker tie-break, its share, number of distinct languages
    * seen, and the code-switching verdict (≥2 languages).
    *
    * Entirely higher-order builtins over one row (split → transform →
    * filter → size) — zero shuffles, scan pruned to (id, text); the
    * 100 TB shape is identical to [[langId]]. */
  def langMixture(docs: DataFrame, idCol: String = "doc_id",
                  textCol: String = "text"): DataFrame = {
    // round 6: the per-segment marker counting runs as ONE fused kernel
    // call per document ([[graft.functions.LangMixtureCounts]] — the
    // regex-in-lambda form re-traversed every segment once per marker
    // word on the interpreted HOF path; exact parity incl. the
    // consumed-boundary adjacency rule is fuzz-pinned in
    // LangMixtureSpec). The struct assembly below touches only the
    // 6-int count array; `__lmc` is a materialized column reference so
    // the kernel evaluates once per row (CollapseProject never inlines
    // a non-cheap expression referenced more than once).
    graft.functions.GraftFunctions.register(docs.sparkSession)
    val counted = docs.select(col(idCol),
      call_function("lang_mixture_counts", col(textCol)).as("__lmc"))
    val n = element_at(col("__lmc"), 1)
    val counts = LangMarkers.map(_._1).zipWithIndex.map { case (lang, i) =>
      (lang, element_at(col("__lmc"), i + 2))
    }
    val bestCnt = counts.map(_._2).reduce((a, b) => greatest(a, b))
    val primary = counts.reverse.foldLeft(lit("und")) { case (acc, (lang, c)) =>
      when(c === bestCnt && bestCnt > 0, lit(lang)).otherwise(acc)
    }
    val nLangs = counts.map { case (_, c) => when(c > 0, 1).otherwise(0) }
      .reduce(_ + _)
    counted.select(col(idCol),
      n.cast("long").as("n_segments"),
      primary.as("primary_lang"),
      round(when(bestCnt > 0,
        bestCnt.cast("double") / n).otherwise(lit(0.0)), 6)
        .as("primary_share"),
      nLangs.cast("long").as("n_langs"),
      (nLangs >= 2).as("code_switched"))
  }

  /** The pre-round-6 regex-in-lambda formulation of [[langMixture]] —
    * kept as the differential twin LangMixtureSpec fuzzes the fused
    * kernel against (it IS the oracle semantics, stated with builtins). */
  private[graft] def langMixtureRegex(docs: DataFrame, idCol: String = "doc_id",
                                      textCol: String = "text"): DataFrame = {
    def segLang(seg: Column): Column = {
      val scored = LangMarkers.map { case (lang, ws) =>
        (lang, markerCount(seg, ws))
      }
      val best = scored.map(_._2).reduce((a, b) => greatest(a, b))
      scored.reverse.foldLeft(lit("und")) { case (acc, (lang, cnt)) =>
        when(cnt === best && best > 0, lit(lang)).otherwise(acc)
      }
    }
    val segs = filter(
      transform(split(col(textCol), "[.!?]"), s => trim(lower(s))),
      s => length(s) > 0)
    val langs = transform(segs, s => segLang(s))
    val n = size(segs)
    val counts = LangMarkers.map { case (lang, _) =>
      (lang, size(filter(langs, x => x === lang)))
    }
    val bestCnt = counts.map(_._2).reduce((a, b) => greatest(a, b))
    val primary = counts.reverse.foldLeft(lit("und")) { case (acc, (lang, c)) =>
      when(c === bestCnt && bestCnt > 0, lit(lang)).otherwise(acc)
    }
    val nLangs = counts.map { case (_, c) => when(c > 0, 1).otherwise(0) }
      .reduce(_ + _)
    docs.select(col(idCol),
      n.cast("long").as("n_segments"),
      primary.as("primary_lang"),
      round(when(bestCnt > 0,
        bestCnt.cast("double") / n).otherwise(lit(0.0)), 6)
        .as("primary_share"),
      nLangs.cast("long").as("n_langs"),
      (nLangs >= 2).as("code_switched"))
  }

  /** Classifier calibration profile (the reliability-diagram table): bin
    * the corpus into score quantiles and report, per bin, the document
    * count, positive-label count and rate, and the token-weighted mean
    * score — the standard check that a filtering classifier's scores
    * MEAN something before they gate terabytes (a miscalibrated
    * threshold silently shifts the kept distribution).
    *
    * Scale shape: quantile binning goes through the bucketed exact
    * global rank + integer NTILE ([[Ranks.globalRowNumber]] /
    * [[Ranks.ntileFromRank]]) — never a single-partition `ntile() OVER
    * (ORDER BY …)` — with bounds and the exact N from ONE
    * [[Ranks.rangeProbe]] scan; the profile itself is a `bins`-row
    * aggregate. Mean scores divide EXACT micro-unit sums once at the
    * end (`exactNumCol` / `exactDenCol`), so no float summation order
    * can perturb the result.
    */
  def calibrationProfile(scored: DataFrame, scoreCol: String,
                         labelCol: String, idCol: String,
                         exactNumCol: String, exactDenCol: String,
                         bins: Int = 10): DataFrame = {
    val (bounds, n) = Ranks.rangeProbe(scored, Seq(scoreCol))
    val ranked = Ranks.globalRowNumber(scored, scoreCol, idCol,
      outCol = "__graft_crk", bounds = Some(bounds(scoreCol)))
    ranked
      .withColumn("bin",
        Ranks.ntileFromRank(col("__graft_crk"), lit(n), bins).cast("long"))
      .groupBy("bin")
      .agg(
        count(lit(1)).cast("long").as("n_docs"),
        sum(when(col(labelCol), 1L).otherwise(0L)).cast("long").as("n_pos"),
        sum(col(exactNumCol)).cast("long").as("sum_score_micro"),
        sum(col(exactDenCol)).cast("long").as("sum_tokens"))
      .withColumn("pos_rate",
        round(col("n_pos").cast("double") / col("n_docs"), 6))
      .withColumn("mean_score",
        col("sum_score_micro").cast("double") /
          (col("sum_tokens").cast("double") * 1000000.0))
      .orderBy("bin")
  }

  /** Winnowing document fingerprints (Schleimer/Wilkerson/Aiken's local
    * algorithm, re-derived from the published description): k-gram rolling
    * hashes, keep the minimum of each sliding window of `w` hashes
    * (rightmost-min rule), dedupe. Per-row Scala UDF — the per-document
    * state machine doesn't decompose into relational ops, but it stays
    * fully distributed (no shuffle, no driver state).
    */
  def winnowFingerprints(k: Int = 5, w: Int = 4): Column = {
    val f = udf { (text: String) =>
      if (text == null) null
      else {
        val s = text.toLowerCase.replaceAll("[^a-z0-9]+", " ").trim
        if (s.length < k) Array.empty[Long]
        else {
          val B = 31L
          val Bk = (1 until k).foldLeft(1L)((acc, _) => acc * B)
          val hashes = new Array[Long](s.length - k + 1)
          var h = 0L
          var i = 0
          while (i < k) { h = h * B + s.charAt(i); i += 1 }
          hashes(0) = h
          while (i < s.length) {
            h = (h - s.charAt(i - k) * Bk) * B + s.charAt(i)
            hashes(i - k + 1) = h
            i += 1
          }
          if (hashes.length <= w) Array(hashes.min)
          else {
            val out = scala.collection.mutable.LinkedHashSet[Long]()
            var j = 0
            while (j + w <= hashes.length) {
              var minIdx = j
              var m = j
              while (m < j + w) { if (hashes(m) <= hashes(minIdx)) minIdx = m; m += 1 }
              out += hashes(minIdx)
              j += 1
            }
            out.toArray
          }
        }
      }
    }
    f(col("text"))
  }

  /** Fingerprint summary per document (count + min fingerprint), for the
    * rows-only driver check. */
  def winnowSummary(docs: DataFrame, k: Int = 5, w: Int = 4): DataFrame =
    docs.withColumn("fp", winnowFingerprints(k, w))
      .select(col("doc_id"),
        size(col("fp")).cast("long").as("n_fingerprints"),
        array_min(col("fp")).as("min_fp"))

  /** Memorization / training-copy probe — the audit companion of
    * [[winnowFingerprints]]: given the corpus's standing winnowing
    * index and a BOUNDED batch of probe strings (model generations,
    * eval items, takedown texts), measure how much of each probe
    * already exists verbatim in the corpus and attribute it to the
    * single document sharing the most fingerprints (the
    * fingerprint-overlap methodology of the public dedup/memorization
    * literature — Lee et al. ACL'22, Carlini et al. USENIX'21 — over
    * Schleimer et al.'s winnowing).
    *
    * Guarantee the in-plan gates lean on: winnowing selects the min of
    * every w-window of k-gram hashes, and every window of a CONTIGUOUS
    * SUBSTRING's hash sequence is a window of the full text's — so a
    * verbatim excerpt's fingerprint set is a SUBSET of its source
    * document's, and an exact copy probes at hit_frac = 1.0 with
    * top_share = n_fp. (Normalization is prefix-monotone, so this
    * survives the lowercase/collapse step.)
    *
    * Boilerplate prune — the scale guard: a fingerprint present in more
    * than `maxDfFrac` of the corpus (headers, licenses, " the " grams)
    * carries no attribution signal but multiplies the probe join by
    * its posting length × the probe count — the first sf1 run of this
    * operator OOM'd exactly there. Such fps are dropped from index AND
    * probes symmetrically (the df-prune of the dedup literature), so
    * coverage is defined over INFORMATIVE fingerprints and the subset
    * guarantee above survives: a verbatim excerpt's surviving fps are
    * still all in its source. Probes whose every fp is boilerplate are
    * omitted (nothing attributable remains).
    *
    * Scale shape: the index is the corpus's exploded (fp, doc) posting
    * table — ONE keyed shuffle to build, persistable as a standing
    * stream (the phrase-index pattern); after the df-prune every
    * posting list is ≤ maxDfFrac·N docs; the probe batch is
    * audit-sized by contract, so it BROADCASTS to the postings and the
    * join is shuffle-free. The index (df aggregate + probe join) and
    * the hit frame (coverage + attribution) are each consumed twice —
    * persisted, released via [[OperatorCache]].
    *
    * @param probes (probe_id, text)
    * @return (probe_id, n_fp, n_hit, hit_frac, top_doc, top_share) —
    *         probes with no informative fingerprints are omitted;
    *         zero-hit probes keep null top_doc/top_share */
  def memorizationProbe(corpus: DataFrame, probes: DataFrame,
                        k: Int = 5, w: Int = 4,
                        idCol: String = "doc_id",
                        probeIdCol: String = "probe_id",
                        maxDfFrac: Double = 0.05): DataFrame = {
    val disk = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val live = corpus.filter(col("text").isNotNull)
    val index = live
      .withColumn("fp", winnowFingerprints(k, w))
      .select(col(idCol).as("src_doc"), explode(col("fp")).as("fp"))
      .persist(disk)
    // df cap from a broadcast 1-row corpus count — no driver action.
    // The prune is an ANTI-join against the too-common set: a probe fp
    // ABSENT from the corpus must survive as a miss (that's what
    // coverage measures), so filtering to corpus-present fps would be
    // wrong — only ubiquity disqualifies.
    val nDocs = live.agg(count(lit(1)).as("__n"))
    val boilerplate = index.groupBy("fp").agg(count(lit(1)).as("__df"))
      .crossJoin(broadcast(nDocs))
      .filter(col("__df") > ceil(lit(maxDfFrac) * col("__n")))
      .select("fp")
    val prunedIndex = index.join(boilerplate, Seq("fp"), "left_anti")
    val pf = probes.filter(col("text").isNotNull)
      .withColumn("fp", winnowFingerprints(k, w))
      .select(col(probeIdCol), explode(col("fp")).as("fp"))
      .join(boilerplate, Seq("fp"), "left_anti")
      .persist(disk)
    val base = pf.groupBy(probeIdCol).agg(count(lit(1)).as("n_fp"))
    // fps are per-row distinct sets on BOTH sides, so (probe, doc, fp)
    // rows are unique and plain counts below are distinct counts
    val hits = prunedIndex.join(broadcast(pf), Seq("fp")).persist(disk)
    val coverage = hits.groupBy(probeIdCol)
      .agg(count_distinct(col("fp")).as("n_hit"))
    val attribution = hits.groupBy(probeIdCol, "src_doc")
      .agg(count(lit(1)).as("shared"))
      .groupBy(probeIdCol)
      .agg(max(struct(col("shared"), negate(col("src_doc")).as("nd"))).as("m"))
      .select(col(probeIdCol), (-col("m.nd")).as("top_doc"),
        col("m.shared").as("top_share"))
    base
      .join(coverage, Seq(probeIdCol), "left")
      .na.fill(0L, Seq("n_hit"))
      .join(attribution, Seq(probeIdCol), "left")
      .withColumn("hit_frac",
        round(col("n_hit").cast("double") / col("n_fp"), 6))
      .select(col(probeIdCol), col("n_fp"), col("n_hit"), col("hit_frac"),
        col("top_doc"), col("top_share"))
  }

  /** Overlapping token-window chunking — the segmentation step before
    * embedding/RAG indexing or fixed-context pretraining: document
    * tokens (whitespace granularity here; swap the splitter for a real
    * tokenizer) become windows of `chunkTokens` advancing by `stride`.
    * The last window starts at the final stride position that still
    * covers unseen tokens, so every token lands in ≥1 chunk and short
    * docs yield exactly one. Pure per-row explode — no shuffle; output
    * order is (doc, chunk_no), so downstream repartitioning decides
    * placement. */
  def chunk(docs: DataFrame, chunkTokens: Int, stride: Int,
            idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(chunkTokens > 0 && stride > 0 && stride <= chunkTokens,
      "need 0 < stride <= chunkTokens")
    val words = split(col(textCol), " ")
    val n = size(words)
    // number of stride steps: ceil(max(0, n - chunkTokens) / stride) + 1
    val steps = (greatest(n - chunkTokens, lit(0)) + stride - 1) / stride + 1
    docs
      // null-text rows are dropped, not chunked: greatest/least skip
      // NULLs, so a null doc would otherwise fabricate one full-size
      // phantom chunk (empty text, n_tokens = chunkTokens)
      .filter(col(textCol).isNotNull)
      .withColumn("__w", words)
      .withColumn("chunk_no", explode(sequence(lit(0), steps.cast("int") - 1)))
      .select(col(idCol), col("chunk_no").cast("long").as("chunk_no"),
        concat_ws(" ",
          slice(col("__w"), col("chunk_no") * stride + 1, lit(chunkTokens)))
          .as("chunk_text"),
        least(size(col("__w")) - col("chunk_no") * stride, lit(chunkTokens))
          .cast("long").as("n_tokens"))
  }

  /** Canonical text normalization (the pre-tokenization cleanup pass):
    * lowercase → strip every char outside `[a-z0-9 ]` → collapse runs of
    * spaces → trim. Pure codegen'd projection, no shuffle; the regexes
    * stay in the Java-regex ∩ RE2 common subset (the [[PiiPatterns]]
    * convention) so the DuckDB oracle matches byte-for-byte.
    *
    * @return (doc_id, norm_text, n_tok_before, n_tok_after)
    */
  def normalizeText(docs: DataFrame, idCol: String = "doc_id",
                    textCol: String = "text"): DataFrame = {
    // one codegen'd byte pass instead of the lower+regex+regex+trim
    // builtin chain — same bytes out (AsciiNormalize's scaladoc carries
    // the parity argument; NormalizeSpec fuzzes it against the chain),
    // ~50× cheaper, and cheap enough that Catalyst re-evaluating it
    // under a pushed-down filter stops mattering (round 6)
    graft.functions.GraftFunctions.register(docs.sparkSession)
    val norm = call_function("ascii_normalize", col(textCol))
    docs.select(col(idCol),
      norm.as("norm_text"),
      size(split(col(textCol), " ")).cast("long").as("n_tok_before"),
      when(length(norm) === 0, 0L)
        .otherwise(size(split(norm, " ")).cast("long")).as("n_tok_after"))
  }

  /** CCNet-style boilerplate removal (Wenzek et al. 2020 deduplicate at
    * paragraph granularity; this corpus has no newlines, so the segment
    * unit is a fixed non-overlapping window of `windowWords` words):
    * segments whose exact text occurs in more than `dfLimit` distinct
    * documents are corpus boilerplate (headers, licence blurbs, copied
    * spans) and are cut; the survivors re-concatenate in order.
    *
    * Scale shape (round 5): per-doc segmentation is a row-local explode;
    * the segment-frequency table is one count-distinct aggregate keyed
    * on `md5(seg)` (16-byte keys — the segment TEXT never shuffles);
    * the verdict is a left join against only the df>limit KILL LIST,
    * left unhinted so size-based planning broadcasts it when it fits
    * (boilerplate is a tiny fraction of distinct segments) and degrades
    * to a hash join keyed by `h` when it doesn't; reassembly is the one
    * remaining corpus-sized shuffle, the per-doc aggregate whose
    * collect_list holds only that document's segments. Nothing
    * driver-side.
    *
    * @return (doc_id, n_segments, n_kept, clean_text) for every input doc
    *         (docs that are 100% boilerplate keep an empty clean_text)
    */
  def removeBoilerplate(docs: DataFrame, idCol: String = "doc_id",
                        textCol: String = "text", windowWords: Int = 8,
                        dfLimit: Long = 1L): DataFrame = {
    val segs = segments(docs, idCol, textCol, windowWords)
      .withColumn("h", md5(col("seg")))
    // df counts DISTINCT docs per segment, keyed by md5(seg) so the
    // dedup + count shuffles move 16-byte keys, never the segment text
    // (the [[sentenceDedup]] rationale: a 128-bit collision over 10¹²
    // segments ≈ 10⁻¹⁴ merges one pair of counts). Only the KILL LIST
    // (df > limit) joins back — on a boilerplate-light corpus that's a
    // tiny fraction of distinct segments, so the join stays unhinted
    // and size-based planning broadcasts it (the sf0.1→sf1 record
    // measured the old seg-text-keyed join-everything shape at 6× per
    // 10× data; the kill-list shape moves corpus text through ZERO
    // shuffles — only `h` travels, and the single remaining corpus
    // shuffle is the per-doc reassembly aggregate).
    val kills = segs.select("h", "did").distinct()
      .groupBy("h").agg(count(lit(1)).as("df"))
      .filter(col("df") > dfLimit)
      .select(col("h"), lit(true).as("kill"))
    val judged = segs.join(kills, Seq("h"), "left")
    judged.groupBy(col("did").as(idCol))
      .agg(
        count(lit(1)).as("n_segments"),
        sum(when(col("kill").isNull, 1L).otherwise(0L)).as("n_kept"),
        concat_ws(" ", expr(
          "transform(filter(sort_array(collect_list(struct(seg_id, seg, kill))), s -> s.kill IS NULL), s -> s.seg)"))
          .as("clean_text"))
      .select(idCol, "n_segments", "n_kept", "clean_text")
  }

  /** Shared segmenter for the segment-level rewrite operators: fixed
    * non-overlapping `windowWords`-word windows (this corpus has no
    * newline/sentence punctuation — see [[removeBoilerplate]]'s note),
    * exploded to one row per (doc, position, segment text). Row-local. */
  private def segments(docs: DataFrame, idCol: String, textCol: String,
                       windowWords: Int): DataFrame = {
    require(windowWords > 0, "windowWords must be positive")
    // split bound once per row (optimization round 11) — the former
    // lambda body re-split the text per window; see Dedup.shingles
    docs.filter(col(textCol).isNotNull)
      .select(col(idCol).as("did"),
        posexplode(expr(
          s"""transform(array(split($textCol, ' ')), ws ->
             |  transform(sequence(0, CAST((size(ws) - 1) / $windowWords AS INT)),
             |    i -> concat_ws(' ', slice(ws, i * $windowWords + 1, $windowWords))))[0]"""
            .stripMargin)).as(Seq("seg_id", "seg")))
  }

  /** Cross-document first-occurrence segment dedup (the MassiveText /
    * RefinedWeb "line dedup" rewrite, at the same fixed word-window
    * granularity as [[removeBoilerplate]]): every repeated segment keeps
    * ONLY its first occurrence in corpus order (`(doc_id, position)`
    * ascending) and is cut everywhere else; survivors re-concatenate in
    * document order. Differs from [[removeBoilerplate]] (which cuts ALL
    * copies of any segment over the df limit, first included): here
    * exactly one copy of every segment survives, so no corpus content is
    * lost — the canonical dedup-rewrite, vs boilerplate's kill-list.
    *
    * Scale shape: segmentation is a row-local explode; first-occurrence
    * ranking is ONE window shuffle keyed by `md5(seg)` (16 bytes of key
    * vs the segment text — same rationale as [[Dedup.exactByHash]]; a
    * 128-bit collision over 10¹² segments ≈ 10⁻¹⁴ mis-ranks one pair);
    * reassembly is one per-doc aggregate. Nothing driver-side; both
    * shuffles are corpus-linear.
    *
    * @return (doc_id, n_segments, n_kept, clean_text) for every doc with
    *         non-null text (fully-duplicate docs keep an empty clean_text)
    */
  def sentenceDedup(docs: DataFrame, idCol: String = "doc_id",
                    textCol: String = "text",
                    windowWords: Int = 8): DataFrame = {
    val segs = segments(docs, idCol, textCol, windowWords)
    val firstWin = org.apache.spark.sql.expressions.Window
      .partitionBy(md5(col("seg"))).orderBy(col("did").asc, col("seg_id").asc)
    val ranked = segs.withColumn("rk", row_number().over(firstWin))
    ranked.groupBy(col("did").as(idCol))
      .agg(
        count(lit(1)).as("n_segments"),
        sum(when(col("rk") === 1, 1L).otherwise(0L)).as("n_kept"),
        concat_ws(" ", expr(
          "transform(filter(sort_array(collect_list(struct(seg_id, seg, rk))), s -> s.rk = 1), s -> s.seg)"))
          .as("clean_text"))
      .select(idCol, "n_segments", "n_kept", "clean_text")
  }

  /** Per-document token-distribution statistics: Shannon entropy of the
    * document's own unigram distribution (low entropy = repetitive /
    * templated text; a standard gibberish-vs-natural signal next to
    * [[repetitionSignals]]) and type-token ratio.
    *
    * Determinism: H = −(1/n)·Σ tf·ln(tf/n) with each ln converted to
    * integer micro-units before the (exact, integer) per-doc sum — the
    * same recipe as the perplexity operators, so summation order cannot
    * perturb the result. One explode → per-(doc,word) count → per-doc
    * aggregate; every shuffle is corpus-linear with map-side combine. */
  def tokenEntropy(docs: DataFrame, idCol: String = "doc_id",
                   textCol: String = "text"): DataFrame = {
    val tf = docs.select(col(idCol).as("did"),
      explode(split(col(textCol), " ")).as("word"))
      .groupBy("did", "word").agg(count(lit(1)).as("tf"))
    // per-doc total via a window over the (already doc-keyed) tf frame —
    // the explode output never shuffles twice
    val byDoc = org.apache.spark.sql.expressions.Window.partitionBy("did")
    tf.withColumn("n", sum("tf").over(byDoc))
      .withColumn("lp_micro",
        round(log(col("tf").cast("double") / col("n")) * 1000000L).cast("long"))
      .groupBy(col("did").as(idCol))
      .agg(max("n").as("n_tokens"), count(lit(1)).as("n_types"),
        sum(col("tf") * col("lp_micro")).as("s"))
      .withColumn("ttr",
        round(col("n_types").cast("double") / col("n_tokens"), 6))
      .withColumn("entropy",
        -col("s").cast("double") / (col("n_tokens") * 1000000L))
      .select(idCol, "n_tokens", "n_types", "ttr", "entropy")
  }

  /** Dataset "data card" profile: per (source, lang) corpus statistics —
    * doc/token totals, length spread, short-doc share. One hash-aggregate
    * over group keys whose cardinality is tiny (sources × languages), so
    * partial aggregation reduces everything map-side; the scan is pruned
    * to the three columns used. Averages/shares divide exact integer
    * sums in double (deterministic, oracle-stable after round-6). */
  def datasetCard(docs: DataFrame, shortDocTokens: Int = 20): DataFrame = {
    val tokens = size(split(col("text"), " ")).cast("long")
    docs.select(col("source"), col("lang"), tokens.as("n_tok"))
      .groupBy("source", "lang")
      .agg(
        count(lit(1)).cast("long").as("n_docs"),
        sum(col("n_tok")).cast("long").as("total_tokens"),
        min(col("n_tok")).cast("long").as("min_tokens"),
        max(col("n_tok")).cast("long").as("max_tokens"),
        round(sum(col("n_tok")).cast("double") / count(lit(1)), 6)
          .as("avg_tokens"),
        round(sum(when(col("n_tok") < shortDocTokens, 1L).otherwise(0L))
          .cast("double") / count(lit(1)), 6).as("short_doc_frac"))
  }

  /** PII patterns, ordered: specific shapes before general ones (an SSN
    * is also phone-shaped). Every pattern stays in the Java-regex ∩ RE2
    * common subset so the DuckDB oracle matches byte-for-byte. */
  val PiiPatterns: Seq[(String, String)] = Seq(
    "email" -> """[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}""",
    "ipv4" -> """\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b""",
    "ssn" -> """\b\d{3}-\d{2}-\d{4}\b""",
    "phone" -> """\b\d{3}[-. ]\d{3}[-. ]\d{4}\b""")

  /** Payment-card candidate shapes: 4×4 digit groups with `-`/space
    * separators, or a bare 16-digit run. Java-regex ∩ RE2 subset. */
  val CardCandidateRe = """\b(?:\d{4}[- ]){3}\d{4}\b|\b\d{16}\b"""

  /** Luhn-validated card-number redaction: digit runs that merely LOOK
    * like card numbers are everywhere in web text (order ids, serials,
    * timestamps), so regex-only redaction destroys data — production PII
    * pipelines validate the mod-10 check digit (Luhn, ISO/IEC 7812)
    * before redacting. Candidates come from one `regexp_extract_all`,
    * validation is Spark's own `luhn_check` builtin applied inside a
    * higher-order `filter` (separators stripped first), and redaction
    * folds the VALID list over the text with exact-string `replace` —
    * the whole operator is one row-local codegen'd projection: no
    * shuffle, no UDF, scan pruned to (id, text). Emits the rejected
    * count too — the false-positive volume is the evidence for why the
    * validation step exists.
    */
  def redactCardNumbers(docs: DataFrame, idCol: String = "doc_id",
                        textCol: String = "text"): DataFrame = {
    val cands = expr(
      s"regexp_extract_all($textCol, '${CardCandidateRe.replace("\\", "\\\\")}', 0)")
    val valid = filter(cands,
      c => call_function("luhn_check", translate(c, "- ", "")))
    val redacted = aggregate(valid, col(textCol),
      (acc, c) => call_function("replace", acc, c, lit("<CARD>")))
    docs.select(col(idCol),
      size(valid).cast("long").as("n_card_valid"),
      (size(cands) - size(valid)).cast("long").as("n_card_rejected"),
      redacted.as("redacted"))
  }

  /** PII redaction: replace emails / IPv4s / SSNs / US-phone shapes with
    * `<KIND>` placeholders and count each kind. Pure per-row projection of
    * codegen'd regexp builtins — no shuffle, no UDF; the scan stays
    * column-pruned to (id, text). Each kind is counted on the text AFTER
    * earlier kinds were masked — exactly the matches its own replacement
    * pass consumes — so a phone number inside an already-redacted email
    * is neither double-counted nor reported without being redacted. */
  def redactPii(docs: DataFrame, idCol: String = "doc_id",
                textCol: String = "text"): DataFrame = {
    // steps(k) = text with patterns 0..k-1 already replaced
    val steps = PiiPatterns.scanLeft(col(textCol)) {
      case (c, (kind, pat)) => regexp_replace(c, pat, s"<${kind.toUpperCase}>")
    }
    val counts = PiiPatterns.zip(steps).map { case ((kind, pat), pre) =>
      regexp_count(pre, lit(pat)).cast("long").as(s"n_$kind")
    }
    docs.select(col(idCol) +: counts :+ steps.last.as("redacted"): _*)
  }

  /** Stop words for the Gopher "contains ≥2 stop words" rule (Rae et al.
    * 2021 §A1.1 uses a similar small English function-word set). */
  val StopWords: Seq[String] = Seq("the", "be", "to", "of", "and", "that", "have", "with")

  /** Gopher-style quality filter DECISION (Rae et al. 2021 §A1.1, adapted
    * to the word-granular corpus): per document, the rule signals and the
    * keep verdict —
    *   - word count within [minWords, maxWords]
    *   - mean word length within [3, 10] characters
    *   - at least `minStopWords` stop-word occurrences
    * Pure per-row projection (split + codegen'd regexp counts): no
    * shuffle, the scan prunes to (id, text). `mean_word_len` is one
    * int/int double division — bit-identical across engines. This is the
    * decision operator on top of the [[quality]] signal extractor. */
  def gopherFilter(docs: DataFrame, idCol: String = "doc_id",
                   textCol: String = "text",
                   minWords: Int = 10, maxWords: Int = 100000,
                   minStopWords: Int = 2): DataFrame = {
    val words = split(col(textCol), " ")
    val nWords = size(words).cast("long")
    val meanLen = (length(col(textCol)) - (size(words) - 1)).cast("double") /
      nWords.cast("double")
    // exact occurrence count (incl. adjacent repeats, which consuming
    // regexes undercount); one interpreted HOF pass per row is fine here
    val nStop = size(filter(words, w => w.isin(StopWords: _*))).cast("long")
    docs.select(col(idCol), nWords.as("n_words"),
      meanLen.as("mean_word_len"), nStop.as("n_stop"))
      .withColumn("keep",
        col("n_words").between(minWords, maxWords) &&
          col("mean_word_len").between(3.0, 10.0) &&
          col("n_stop") >= minStopWords)
  }

  /** Repetition signals (the Gopher-rules shape, word-granular because
    * the corpus is single-line): per document —
    *   - `n_words`, `dup_word_frac`: fraction of tokens that are repeats
    *     of an earlier token (array ops, zero shuffle);
    *   - `top_bigram_share`: the most frequent bigram's share of all
    *     bigrams — high values flag boilerplate/spam. Needs a per-(doc,
    *     bigram) count: explode → two hash-aggregates keyed by doc, the
    *     minimal shuffle for a per-doc mode; partial aggregation
    *     (map-side combine) keeps shuffle volume at distinct-bigram
    *     cardinality, not token count.
    * Fractions are int/int divisions in DOUBLE rounded to 6dp — the
    * bit-exact oracle recipe used by jaccard. */
  def repetitionSignals(docs: DataFrame, idCol: String = "doc_id",
                        textCol: String = "text"): DataFrame = {
    val words = split(col(textCol), " ")
    val base = docs.select(col(idCol), words.as("w"))
      .withColumn("n_words", size(col("w")).cast("long"))
      .withColumn("dup_word_frac",
        round(lit(1.0) - size(array_distinct(col("w"))).cast("double")
          / col("n_words"), 6))
    val bigrams = base.select(col(idCol), col("w"),
      posexplode(slice(col("w"), lit(1), greatest(size(col("w")) - 1, lit(0)))))
      .withColumn("bigram",
        concat_ws(" ", col("col"), element_at(col("w"), col("pos") + 2)))
    // `w` rides into the explode only to index the successor token; drop
    // it before the aggregate so the shuffle carries (id, bigram) alone
    val counts = bigrams.select(col(idCol), col("bigram"))
      .groupBy(idCol, "bigram").count()
      .groupBy(idCol).agg(max("count").as("top_bigram"))
    base.select(col(idCol), col("n_words"), col("dup_word_frac"))
      .join(counts, Seq(idCol), "left")
      .withColumn("top_bigram_share",
        round(coalesce(col("top_bigram"), lit(0L)).cast("double")
          / greatest(col("n_words") - 1, lit(1L)), 6))
      .drop("top_bigram")
  }

  /** Source-level (domain) curation — the RefinedWeb/C4-shaped rule
    * "judge the DOMAIN, not just the page": per-document type-token
    * ratio (distinct words / words — template spam repeats itself and
    * scores low) aggregated to a per-source mean, and only documents
    * from sources clearing BOTH bars (mean TTR ≥ `minMeanTtr` over at
    * least `minDocs` documents) survive. The whole-source drop is the
    * point: a domain whose average page is boilerplate loses its
    * occasional good-looking page too, which document-level filters
    * cannot express.
    *
    * Determinism: per-doc TTR rounds to integer micro-units, the
    * source mean is an exact integer sum over one double division.
    * Scale shape: the per-doc score is a shuffle-free row expression;
    * the only aggregate is source-keyed (domain cardinality ≪ corpus);
    * the verdict rejoins by source with no hint — size-based planning
    * broadcasts the post-filter source stats when they fit. The corpus
    * itself never shuffles.
    *
    * @return (idCol, srcCol, ttr_micro, src_mean_ttr, src_docs)
    */
  def sourceQualityFilter(docs: DataFrame, idCol: String = "doc_id",
                          srcCol: String = "source",
                          textCol: String = "text",
                          minMeanTtr: Double = 0.5,
                          minDocs: Long = 10L): DataFrame = {
    val w = split(col(textCol), " ")
    // null text would score -1/-1 = a PERFECT ttr (size(null) = -1) and
    // silently inflate its source's mean — drop such rows up front, the
    // same guard weightedSample carries for degenerate weights
    val scored = docs.filter(col(textCol).isNotNull)
      .select(col(idCol), col(srcCol),
        round(size(array_distinct(w)).cast("double") / size(w) * 1000000L)
          .cast("long").as("ttr_micro"))
    val keep = scored.groupBy(col(srcCol))
      .agg(sum("ttr_micro").as("s"), count(lit(1)).as("n_docs"))
      .withColumn("src_mean_ttr",
        col("s").cast("double") / (col("n_docs") * 1000000L))
      .filter(col("src_mean_ttr") >= minMeanTtr && col("n_docs") >= minDocs)
      .select(col(srcCol), col("src_mean_ttr"), col("n_docs").as("src_docs"))
    scored.join(keep, Seq(srcCol))
      .select(col(idCol), col(srcCol), col("ttr_micro"),
        col("src_mean_ttr"), col("src_docs"))
  }

  /** Hashing-trick linear quality classifier — the fastText-shaped
    * scorer behind DCLM/CCNet-style model-based filtering, reduced to
    * its deployable inference core: each token hashes into one of `dim`
    * feature buckets, each bucket carries a fixed pseudo-random weight
    * in [-1, 1) derived from [[CrossHash]] (standing in for trained
    * coefficients — the serving plan is identical, only the weight
    * table changes), and a document's score is the mean bucket weight
    * of its tokens. `keep` = score > 0, the usual threshold gate.
    *
    * Determinism: per-token weights round to integer micro-units, the
    * per-doc sum is exact, and the mean is one double division — the
    * same recipe as [[tokenEntropy]]. Scale shape: the entire operator
    * is ONE shuffle-free projection (`transform` + `aggregate` over the
    * token array, no explode, no groupBy) — at 100 TB it runs
    * embarrassingly parallel with zero exchange, the cheapest possible
    * plan for a corpus-wide filter.
    *
    * @return (idCol, n_tokens, score_sum_micro, score, keep)
    */
  def hashedLinearScore(docs: DataFrame, idCol: String = "doc_id",
                        textCol: String = "text",
                        dim: Int = 1024, salt: String = "qc"): DataFrame = {
    val toks = split(col(textCol), " ")
    val weightMicro = transform(toks, t => {
      val bucket = pmod(CrossHash.hash56(t), lit(dim.toLong))
      val h = CrossHash.hash56(concat(lit(salt + ":"), bucket.cast("string")))
      // h/2^55 ∈ [0, 2) → [-1, 1); micro-rounded so the doc sum is exact
      round((h.cast("double") / lit(3.6028797018963968e16) - lit(1.0))
        * lit(1000000.0)).cast("long")
    })
    docs.filter(col(textCol).isNotNull)
      .select(col(idCol), size(toks).cast("long").as("n_tokens"),
        aggregate(weightMicro, lit(0L), (acc, x) => acc + x)
          .as("score_sum_micro"))
      .withColumn("score", col("score_sum_micro").cast("double")
        / (col("n_tokens").cast("double") * lit(1000000.0)))
      .withColumn("keep", col("score_sum_micro") > lit(0L))
  }

  /** BM25 relevance scoring (Robertson/Spärck Jones, the
    * Okapi-at-TREC-3 form) of every document against a fixed query-term
    * set, returning the top `k`. Standard retrieval-corpus curation
    * step ("rank the corpus by relevance to my seed queries").
    *
    * Scale shape: the corpus NEVER shuffles — per-term tf and doclen
    * are row-local array expressions (`filter`/`size`, no explode), the
    * corpus-wide stats (N, Σdl, per-term df) reduce to ONE row that
    * broadcast-joins back, and the only exchange in the plan is the
    * final top-k (TakeOrdered, k rows per partition). Per-term scores
    * round to integer micro-units before the cross-term sum so the
    * ranking is exact and engine-independent.
    *
    * @return (idCol, score_micro) the k highest-scoring docs,
    *         score-desc then id-asc
    */
  def bm25TopK(docs: DataFrame, terms: Seq[String],
               idCol: String = "doc_id", textCol: String = "text",
               k: Int = 20, k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(terms.nonEmpty, "bm25TopK needs at least one query term")
    val toks = split(col(textCol), " ")
    val tfCols = terms.indices.map(i =>
      size(filter(toks, t => t === lit(terms(i)))).cast("long").as(s"tf_$i"))
    val base = docs.filter(col(textCol).isNotNull)
      .select(col(idCol) +: size(toks).cast("long").as("dl") +: tfCols: _*)
    val statAggs = count(lit(1)).cast("double").as("n") +:
      sum("dl").cast("double").as("sdl") +:
      terms.indices.map(i =>
        sum((col(s"tf_$i") > 0).cast("long")).cast("double").as(s"df_$i"))
    val stats = base.agg(statAggs.head, statAggs.tail: _*)
    val perTerm = terms.indices.map { i =>
      val tf = col(s"tf_$i").cast("double")
      val idf = log((col("n") - col(s"df_$i") + lit(0.5))
        / (col(s"df_$i") + lit(0.5)) + lit(1.0))
      val den = tf + lit(k1) * (lit(1.0) - lit(b)
        + lit(b) * col("dl").cast("double") / (col("sdl") / col("n")))
      round(idf * (tf * lit(k1 + 1.0)) / den * lit(1000000.0)).cast("long")
    }
    base.crossJoin(broadcast(stats))
      .select(col(idCol), perTerm.reduce(_ + _).as("score_micro"))
      .orderBy(col("score_micro").desc, col(idCol).asc)
      .limit(k)
  }

  /** Adaptive per-group outlier window: keep rows whose `valCol` lies
    * between the group's pLo-th and pHi-th percentile ORDER STATISTICS —
    * the data-derived length filter real curation pipelines use instead
    * of one global cutoff (a 50-char doc is an outlier in English prose
    * and median in a code-identifier corpus).
    *
    * Thresholds are exact k-th order statistics, NOT interpolated
    * percentiles: k = ⌈p·n/100⌉ computed in integer arithmetic
    * (`(p·n + 99) div 100`), so both engines pick the identical corpus
    * value and the keep verdict can never flip on a floating-point ulp —
    * the same determinism recipe as the round-6 cosine gates, applied to
    * rank selection.
    *
    * Scale shape: one tiny per-group count aggregate, one window shuffle
    * keyed by group to rank values, and the threshold frame (|groups|
    * rows) size-based-broadcasts back. Exact order statistics need the
    * per-group sort by contract; when exactness isn't contractual, swap
    * the rank window for `approx_percentile` and the shuffle disappears.
    *
    * @param pLoPct lower percentile in whole percent (e.g. 5)
    * @param pHiPct upper percentile in whole percent (e.g. 95)
    */
  def adaptiveRangeFilter(df: DataFrame, groupCol: String, valCol: String,
                          pLoPct: Int, pHiPct: Int): DataFrame = {
    require(0 < pLoPct && pLoPct <= pHiPct && pHiPct <= 100,
      s"need 0 < pLo <= pHi <= 100, got ($pLoPct, $pHiPct)")
    val counts = df.groupBy(groupCol).agg(count(lit(1)).as("__n"))
    val w = Window.partitionBy(groupCol).orderBy(col(valCol))
    val ranked = df.select(col(groupCol), col(valCol))
      .withColumn("__r", row_number().over(w))
      .join(counts, groupCol)
    // the value at a given rank is deterministic even with duplicate
    // values (row_number tie order only permutes equal values)
    val bounds = ranked
      .filter(col("__r") === expr(s"($pLoPct * __n + 99) div 100")
        || col("__r") === expr(s"($pHiPct * __n + 99) div 100"))
      .groupBy(groupCol)
      .agg(min(valCol).as("__lo"), max(valCol).as("__hi"))
    df.join(bounds, groupCol)
      .filter(col(valCol) >= col("__lo") && col(valCol) <= col("__hi"))
      .drop("__lo", "__hi")
  }

  /** Distinct-n diversity ratios per corpus slice (the distinct-1/-2
    * metric of Li et al. 2016 "A Diversity-Promoting Objective", applied
    * corpus-wide): `distinct n-grams / total n-grams` for n = 1, 2 —
    * near-0 flags template/boilerplate-dominated sources; near-1 flags
    * high-entropy soup. The per-source complement to the per-document
    * [[repetitionSignals]] and [[tokenEntropy]].
    *
    * Determinism: each ratio is ONE double division of two exact bigint
    * counts scaled to micro-units and rounded to an integer (the repo's
    * `*_micro` convention — half-up and half-away-from-zero agree for
    * positives, so the value replays exactly cross-engine). Scale shape:
    * one corpus explode per n feeds a two-level aggregate — (source,
    * gram) partial-combined counts, then a per-source rollup — so the
    * shuffle is keyed by (source, gram) and bounded by slice vocabulary,
    * not corpus size; the two n-frames join on the |sources| key set.
    *
    * @return (source, total_1, distinct_1, ratio1_micro, total_2,
    *         distinct_2, ratio2_micro)
    */
  def ngramDiversity(docs: DataFrame, groupCol: String = "source",
                     textCol: String = "text"): DataFrame = {
    val toks = docs.filter(col(textCol).isNotNull)
      .select(col(groupCol).as("src"), split(col(textCol), " ").as("w"))
    def stats(grams: DataFrame, n: Int): DataFrame =
      grams.groupBy("src", "g").agg(count(lit(1)).as("c"))
        .groupBy("src").agg(
          sum("c").cast("long").as(s"total_$n"),
          count(lit(1)).cast("long").as(s"distinct_$n"))
        .withColumn(s"ratio${n}_micro",
          round(col(s"distinct_$n") * lit(1000000.0) / col(s"total_$n"))
            .cast("long"))
    val uni = stats(toks.select(col("src"), explode(col("w")).as("g")), 1)
    val bi = stats(toks.filter(size(col("w")) >= 2)
      .select(col("src"), explode(zip_with(
        slice(col("w"), lit(1), size(col("w")) - 1),
        slice(col("w"), lit(2), size(col("w")) - 1),
        (a, b) => concat_ws(" ", a, b))).as("g")), 2)
    uni.join(bi, "src").withColumnRenamed("src", groupCol)
  }

  /** Blocklist scan via the fused Aho–Corasick kernel
    * ([[graft.functions.MultiMatch]]): per document, the sorted distinct
    * ids of every blocklist pattern occurring in the text — P patterns
    * in ONE text pass instead of P `contains()` scans, the shape of
    * every PII/NSFW term-list filter. Row-local, zero shuffle; the
    * automaton rides the plan as a reference object exactly like the PQ
    * codebooks.
    *
    * @return (idCol, hits: array<int> of matched pattern ids) */
  def blocklistHits(docs: DataFrame, idCol: String, textCol: String,
                    patterns: Seq[String]): DataFrame = {
    graft.functions.GraftFunctions.register(docs.sparkSession)
    docs.filter(col(textCol).isNotNull)
      .select(col(idCol), call_function("multi_match",
        col(textCol), lit(patterns.mkString("\u0001"))).as("hits"))
  }

  /** The SEVERITY variant of [[blocklistHits]]: per document, the
    * occurrence count of every pattern (dense array<long>, ALL
    * occurrences incl. overlapping — one automaton pass via
    * [[graft.functions.MultiMatchCounts]]). A PII scorer thresholds on
    * counts, not presence.
    *
    * @return (idCol, counts: array<long>, index-aligned to `patterns`) */
  def blocklistCounts(docs: DataFrame, idCol: String, textCol: String,
                      patterns: Seq[String]): DataFrame = {
    graft.functions.GraftFunctions.register(docs.sparkSession)
    docs.filter(col(textCol).isNotNull)
      .select(col(idCol), call_function("multi_match_counts",
        col(textCol), lit(patterns.mkString("\u0001"))).as("counts"))
  }
}
