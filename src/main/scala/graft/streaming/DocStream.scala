package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}

import graft.functions.MisraGries
import graft.operators.{Curation, TextOps}

/** Structured-Streaming shapes for a `documents` stream: near-dup
  * candidate detection while the corpus is still arriving (the
  * ingest-time half of the dedup pipeline — batch Dedup.minhashPairs
  * is the at-rest half).
  *
  * Input contract: a streaming DataFrame with (doc_id long, text
  * string, ts long nanoseconds) — `readStream` over a documents
  * feed, or a MemoryStream in tests.
  */
object DocStream {

  /** Streaming MinHash/LSH near-dup candidate pairs: each arriving doc
    * is signed ROW-LOCALLY (signature + band keys as per-row
    * expressions — stateless, unlike the batch explode→groupBy build,
    * so the only streaming state is the band join's and the pair
    * dedup's, both bounded by the watermark), then band-bucket
    * candidates form through a watermarked stream-stream SELF-join on
    * (band, band-hash) with a ±`horizonMinutes` event-time bound, and
    * the signature-estimated Jaccard filters candidates exactly as in
    * batch.
    *
    * Hash parity with the batch path is deliberate and tested: j is
    * hashed as INT (batch `lit(j)`), the band ordinal as BIGINT
    * (batch `${b}L`), so `(stream pairs within one horizon) =
    * (batch Dedup.minhashPairs)` — the StreamingSpec parity case.
    *
    * Scale shape: state is per-band-bucket rows inside the horizon —
    * at 100 TB/day the horizon bounds state to a day-ish of signatures
    * (perms longs per doc), and docs pair only within their bucket;
    * pairs across horizons are the batch job's business, not the
    * stream's (the standard lambda split for dedup).
    *
    * The per-row HOF signature evaluation is interpreted (~10× the
    * codegen'd batch build per doc) — acceptable at ingest rates,
    * wrong for backfill: backfills go through the batch path.
    */
  def minhashCandidates(docs: DataFrame, horizonMinutes: Int = 60,
      perms: Int = 64, bands: Int = 8, shingleK: Int = 7,
      minEst: Double = 0.5): DataFrame =
    bandCandidates(docs, horizonMinutes, perms, bands, shingleK)
      .where(col("est_jaccard") >= minEst)
      .select(col("a_id"), col("b_id"), col("a_ets"), col("est_jaccard"))
      .dropDuplicatesWithinWatermark("a_id", "b_id")
      .select(col("a_id"), col("b_id"), col("est_jaccard"))

  /** Streaming CONTAINMENT candidates — the ingest-time half of the
    * batch d18 path: same signatures, same band-bucket join as
    * [[minhashCandidates]], but the final predicate is Broder's
    * containment c(A,B) = |A∩B| / min(|A|,|B|) estimated from the
    * signature Jaccard plus the exact (row-local) distinct-shingle
    * sizes, via the identity |A∩B| = J·(|A|+|B|)/(1+J):
    *
    *   ĉ = Ĵ·(a_sz + b_sz) / ((1 + Ĵ)·min(a_sz, b_sz))
    *
    * This flags the subset-duplication pairs a symmetric Jaccard cut
    * drops — e.g. A ⊂ B with |A| = 0.8·|B| has J = 0.8 (below a 0.9
    * cut) but c = 1.0. Recall envelope, stated honestly: candidates
    * still come from signature banding, whose per-pair recall decays
    * as J^r — so EXTREME asymmetry (a tiny doc quoted inside a huge
    * one, J ≈ 0) is structurally invisible here and belongs to the
    * batch inverted-index path (`Dedup.containmentPairs`, d18). The
    * stream covers the moderate-asymmetry regime (J ≳ 0.7) the
    * moment it arrives; the batch job owns the long tail — the same
    * lambda split as the Jaccard path. Batch parity:
    * `Dedup.minhashContainmentPairs` (StreamingSpec pins stream ==
    * batch within one horizon).
    */
  def containmentCandidates(docs: DataFrame, horizonMinutes: Int = 60,
      perms: Int = 64, bands: Int = 8, shingleK: Int = 7,
      minEst: Double = 0.9, minSize: Int = 16): DataFrame =
    bandCandidates(docs, horizonMinutes, perms, bands, shingleK)
      .withColumn("est_containment", least(lit(1.0),
        col("est_jaccard") * (col("a_sz") + col("b_sz")) /
          ((lit(1.0) + col("est_jaccard")) * least(col("a_sz"), col("b_sz")))))
      .where(col("est_containment") >= minEst &&
        least(col("a_sz"), col("b_sz")) >= minSize)
      .select(col("a_id"), col("b_id"), col("a_ets"),
        col("a_sz"), col("b_sz"), col("est_containment"))
      .dropDuplicatesWithinWatermark("a_id", "b_id")
      .select(col("a_id"), col("b_id"), col("a_sz"), col("b_sz"),
        col("est_containment"))

  /** Shared signed-band self-join: signs each arriving doc ROW-LOCALLY
    * (signature, distinct-shingle size, band keys — all per-row
    * expressions, hash-identical to the batch groupBy build), then
    * forms band-bucket candidates through the watermarked ±horizon
    * stream-stream self-join. Emits one row per (pair, colliding
    * band) with both signatures' est_jaccard and both sizes; callers
    * apply their ratio predicate and the pair-level
    * dropDuplicatesWithinWatermark.
    */
  private def bandCandidates(docs: DataFrame, horizonMinutes: Int,
      perms: Int, bands: Int, shingleK: Int): DataFrame = {
    val rows = perms / bands
    val signed = docs
      .withColumn("ets", timestamp_micros(expr("ts div 1000")))
      .withWatermark("ets", s"$horizonMinutes minutes")
      .withColumn("gs", TextOps.shingles("text", shingleK))
      // gs is distinct-by-construction (TextOps.shingles array_distincts),
      // so size(gs) IS the distinct-shingle count; BIGINT to match the
      // batch groupBy count in Dedup.minhashContainmentPairs exactly.
      .withColumn("sz", expr("CAST(size(gs) AS BIGINT)"))
      .withColumn("sig", expr(
        s"transform(sequence(0, ${perms - 1}), j -> array_min(transform(gs, g -> xxhash64(g, j))))"))
      .select(col("doc_id"), col("ets"), col("sig"), col("sz"),
        explode(expr(
          s"""transform(sequence(CAST(0 AS BIGINT), CAST(${bands - 1} AS BIGINT)),
             |  b -> named_struct('band', b,
             |    'bh', xxhash64(slice(sig, CAST(b * $rows + 1 AS INT), $rows), b)))""".stripMargin))
          .as("bk"))
      .select(col("doc_id"), col("ets"), col("sig"), col("sz"),
        col("bk.band").as("band"), col("bk.bh").as("bh"))
    val a = signed.select(col("doc_id").as("a_id"), col("ets").as("a_ets"),
      col("sig").as("a_sig"), col("sz").as("a_sz"),
      col("band").as("a_band"), col("bh").as("a_bh"))
    val b = signed.select(col("doc_id").as("b_id"), col("ets").as("b_ets"),
      col("sig").as("b_sig"), col("sz").as("b_sz"),
      col("band").as("b_band"), col("bh").as("b_bh"))
    a.join(b,
        expr(s"""a_band = b_band AND a_bh = b_bh AND a_id < b_id AND
                 |b_ets >= a_ets - interval $horizonMinutes minutes AND
                 |b_ets <= a_ets + interval $horizonMinutes minutes""".stripMargin))
      .withColumn("est_jaccard", TextOps.estJaccard("a_sig", "b_sig", perms))
  }

  /** Ingest-time quality gate + chunking: the streaming half of the
    * p11 → p12 batch pipeline. Every statistic is computed ROW-
    * LOCALLY with higher-order functions (array_distinct / filter /
    * transform over the token array), so the operator is completely
    * STATELESS — no watermark, no state store, any output mode; a
    * restart loses nothing. The gate thresholds are p11's exactly
    * (length bounds, max-word-frequency < 2000 bp, type-token ratio
    * > 300 bp) and chunking is p12's expression verbatim, which the
    * StreamingSpec parity case pins down: stream output == batch
    * explode→groupBy stats → filter → chunk.
    *
    * The HOF max-word-count is O(per-doc vocab²) where the batch
    * explode→groupBy is linear — the usual ingest-vs-backfill trade
    * (same note as minhashCandidates): fine per arriving doc, wrong
    * for a 100 TB backfill, which goes through the batch path.
    */
  def qualityChunks(docs: DataFrame, minWords: Int = 30): DataFrame =
    docs
      .withColumn("words", expr("regexp_extract_all(lower(text), '[a-z0-9]+', 0)"))
      .withColumn("n_words", size(col("words")).cast("long"))
      .withColumn("n_distinct_words", size(array_distinct(col("words"))).cast("long"))
      .withColumn("max_word_cnt", expr(
        "array_max(transform(array_distinct(words), w -> size(filter(words, x -> x = w))))")
        .cast("long"))
      .withColumn("top_word_bp",
        floor(lit(10000.0) * col("max_word_cnt") / col("n_words")).cast("long"))
      .withColumn("ttr_bp",
        floor(lit(10000.0) * col("n_distinct_words") / col("n_words")).cast("long"))
      .where(col("n_words").between(minWords, 100000) &&
        col("top_word_bp") < 2000 && col("ttr_bp") > 300)
      .select(col("doc_id"), posexplode(expr(
        "transform(sequence(0, greatest(size(words) - 1, 0), 24)," +
          " st -> slice(words, st + 1, 32))")))
      .select(col("doc_id"), col("pos").cast("long").as("chunk_idx"),
        size(col("col")).cast("long").as("chunk_tokens"),
        array_join(col("col"), " ").as("chunk_text"))

  /** Ingest-time curation gate: drop documents contaminated by the
    * (static, pre-built) benchmark gram set, then scrub PII — the
    * streaming half of d14 + d15. Completely STATELESS: the
    * decontamination is a stream-static LEFT ANTI join (the static
    * side re-broadcasts per microbatch; eval suites are tiny), the
    * gram array is a row-local expression, and the scrub is pure
    * regexp projection — no watermark, no state store, restart-safe.
    *
    * Same gate as batch: a doc passes iff d14 reports
    * contaminated = false, and `text` leaves redacted exactly as
    * Curation.redact — the StreamingSpec parity case pins both.
    */
  def cleanFeed(docs: DataFrame, benchGrams: DataFrame, n: Int = 4): DataFrame =
    docs
      .withColumn("__grams",
        array_distinct(Curation.wordGrams(Curation.tokens(col("text")), n)))
      .join(benchGrams, expr("array_contains(__grams, g)"), "left_anti")
      .withColumn("text", Curation.redact(col("text")))
      .drop("__grams")

  /** Ingest-time blocklist gate — the streaming twin of p34: each
    * arriving doc is matched against the phrase blocklist with the
    * same space-boundary semantics and the same anchor-token candidate
    * pruning (explode the doc's DISTINCT tokens, stream-static
    * broadcast equi-join on each phrase's first token, then the
    * locate() verify runs only on anchor-hit candidates). Completely
    * STATELESS — the pattern dim re-broadcasts per microbatch, every
    * other expression is row-local; no watermark, no state store,
    * restart-safe. Emits one append row per (doc, matched phrase);
    * the admission feed is the input's left_anti against these
    * doc_ids, exactly as d16/cleanFeed.
    */
  def blocklistMatches(docs: DataFrame,
      phrases: Seq[(Long, String)]): DataFrame = {
    val s = docs.sparkSession
    import s.implicits._
    val bl = phrases.map { case (pid, p) => (pid, p, p.split(' ').head) }
      .toDF("pid", "phrase", "anchor")
    docs
      .select(col("doc_id"), col("text"),
        explode(array_distinct(split(col("text"), " "))).as("tok"))
      .join(broadcast(bl), col("tok") === col("anchor"))
      .where(expr("instr(concat(' ', text, ' '), concat(' ', phrase, ' ')) > 0"))
      .select(col("doc_id"), col("pid"), col("phrase"))
  }

  /** Streaming PPJoin admission gate: each ARRIVING doc is tested for
    * exact Jaccard ≥ `minJaccardBp`/10000 similarity against a STATIC
    * at-rest corpus, emitting one append-mode row per (arriving doc,
    * corpus dup) pair — the ingest-time half of d24's exact-similarity
    * dedup (the lossless analogue of d16's estimated admission).
    *
    * Why the HASH-ORDER prefix (Dedup.ppjoinPairs round-11 design)
    * matters here: the global order is a pure function of the gram
    * bytes, so the stream side needs NO frequency statistics — its
    * prefix is a row-local slice of its sorted hashed-gram array,
    * fully stateless. A df-ordered prefix would need a corpus
    * frequency snapshot that staled as the stream ran.
    *
    * Shape: row-local gram/hash/prefix projections (interpreted HOFs —
    * fine at ingest rates, wrong for backfill, same caveat as
    * [[minhashCandidates]]); STREAM-STATIC equi-join on the corpus's
    * prefix index (stateless — no watermark state, the static side is
    * a broadcast-or-bucketed table); PPJoin length+positional filters;
    * hashed phase-1 verify against the corpus's compact hash arrays;
    * exact phase-2 verify on the true gram strings. Multi-gram
    * duplicate pairs collapse via dropDuplicatesWithinWatermark.
    * Output: (doc_id, dup_of, jaccard_bp); an admission feed is the
    * left_anti of the input against these doc_ids, exactly as d16.
    */
  def ppjoinAdmission(docs: DataFrame, corpus: DataFrame,
      minJaccardBp: Long = 6000, gramN: Int = 3,
      horizonMinutes: Int = 60): DataFrame = {
    val t = minJaccardBp
    // static side, built once through the batch (codegen) path
    val grams = array_distinct(
      Curation.wordGrams(Curation.tokens(col("text")), gramN))
    val cArrs = corpus
      .where(size(Curation.tokens(col("text"))) >= gramN)
      .select(col("doc_id").as("dup_of"), grams.as("c_arr"))
      .localCheckpoint()
    val cSorted = cArrs
      .select(col("dup_of"), explode(col("c_arr")).as("g0"))
      .select(col("dup_of"), xxhash64(col("g0")).as("h"))
      .groupBy("dup_of")
      .agg(sort_array(collect_list(col("h"))).as("c_h"),
        count(lit(1)).cast("long").as("cn"))
      .localCheckpoint()
    val cPrefix = cSorted.select(col("dup_of"), col("cn"),
        posexplode(slice(col("c_h"), lit(1),
          expr(s"CAST(cn - ($t * cn + 9999) div 10000 + 1 AS INT)"))))
      .select(col("dup_of"), col("cn"), col("col").as("g"),
        (col("pos") + 1).as("pb"))
      .localCheckpoint()
    // stream side: all row-local
    val sPrefixed = docs
      .withColumn("ets", timestamp_micros(expr("ts div 1000")))
      .withWatermark("ets", s"$horizonMinutes minutes")
      .where(size(Curation.tokens(col("text"))) >= gramN)
      .withColumn("arr", grams)
      .withColumn("harr", array_sort(expr("transform(arr, x -> xxhash64(x))")))
      .withColumn("n", size(col("arr")).cast("long"))
      .select(col("doc_id"), col("ets"), col("arr"), col("harr"), col("n"),
        posexplode(slice(col("harr"), lit(1),
          expr(s"CAST(n - ($t * n + 9999) div 10000 + 1 AS INT)"))))
      .select(col("doc_id"), col("ets"), col("arr"), col("harr"), col("n"),
        col("col").as("g"), (col("pos") + 1).as("pa"))
    sPrefixed
      .join(cPrefix, Seq("g")) // stream-static: stateless
      .where(expr(s"10000 * cn >= $t * n") && expr(s"10000 * n >= $t * cn"))
      .where(expr(s"least(n - pa, cn - pb) + 1 >= " +
        s"($t * (n + cn) + ${10000 + t} - 1) div ${10000 + t}"))
      .join(cSorted.drop("cn"), Seq("dup_of"))
      .withColumn("hc", size(array_intersect(col("harr"), col("c_h"))).cast("long"))
      .where(expr(s"10000 * hc >= $t * (n + cn - hc)"))
      .join(cArrs, Seq("dup_of"))
      .withColumn("common",
        size(array_intersect(col("arr"), col("c_arr"))).cast("long"))
      .where(expr(s"10000 * common >= $t * (n + cn - common)"))
      .select(col("doc_id"), col("dup_of"), col("ets"),
        expr(s"(10000 * common) div (n + cn - common)").as("jaccard_bp"))
      .dropDuplicatesWithinWatermark("doc_id", "dup_of")
      .select("doc_id", "dup_of", "jaccard_bp")
  }

  /** Ingest-time SEMANTIC near-dup admission — the streaming twin of
    * the s17/d17 cell discipline (batch `Similarity.cellTopKNeighbors`
    * / `semanticDedup` are the at-rest half): each arriving vector is
    * scored against the broadcast centroid pack ROW-LOCALLY (a HOF
    * over the one-row centroid array — same integer skey and
    * lowest-ordinal tiebreak as `ivfProbeAssignments`, so the probe
    * sets match the batch assignment bit-for-bit), explodes to its
    * `nprobe` probe cells, and equi-joins the STATIC corpus's probe
    * memberships on cell_id — a stream-static join, STATELESS by
    * construction. Survivors of the exact quantized-cosine threshold
    * emit (vec_id, dup_of, cos_bp) admission verdicts; the only state
    * anywhere is the watermark-bounded pair dedup (a pair can arrive
    * via up to nprobe shared cells).
    *
    * Candidate COMPLETENESS equals the batch operator's by
    * construction: identical probe sets ⇒ identical probe-intersect
    * candidate pairs ⇒ every `cellTopKNeighbors` edge at or above the
    * threshold appears here with a bit-identical cos_bp (the
    * StreamingSpec parity case pins both directions on one horizon).
    *
    * Scale shape: the static side is s17's build side verbatim —
    * probe memberships sized n·nprobe, broadcast under the counted
    * [[graft.operators.Similarity.MaxBroadcastBlockBytes]] gate,
    * cell-keyed shuffle past it; per-arriving-vector work is
    * K-centroid scoring + ~nprobe·cellsize candidates, input-rate
    * bound, state O(pairs inside the horizon). Backfills go through
    * the batch path (the minhashCandidates lambda split verbatim).
    */
  def semanticAdmission(vecs: DataFrame, corpus: DataFrame,
      centroidIds: Seq[Long], nprobe: Int = 4, minCosBp: Int = 2500,
      horizonMinutes: Int = 60): DataFrame = {
    import graft.operators.Similarity
    val sess = corpus.sparkSession
    graft.functions.QuantizedDot.register(sess)
    // ---- static side (built once through the batch codegen path) ----
    val sortedIds = centroidIds.sorted
    val ordArr = array(sortedIds.map(lit(_)): _*)
    val withNorm = corpus.select(col("vec_id").as("dup_of"),
      col("embedding").as("c_vec"), expr("qdot(embedding, embedding)").as("c_n2"))
    val mem0 = Similarity.ivfProbeAssignments(corpus, centroidIds, nprobe)
      .select(col("vec_id").as("dup_of"), col("cell_id"))
      .join(withNorm, Seq("dup_of"))
      .repartition(sess.sessionState.conf.numShufflePartitions)
      .localCheckpoint(true)
    // counted-rows broadcast gate (checkpointed stats are dead — the
    // cellTopKNeighbors lesson verbatim)
    val (nMem, dim) = {
      val r = mem0.agg(count(lit(1)), max(size(col("c_vec")))).first()
      (r.getLong(0), if (r.isNullAt(1)) 0 else r.getInt(1))
    }
    val mem =
      if (nMem * (80L + 4L * dim) <= Similarity.MaxBroadcastBlockBytes)
        broadcast(mem0)
      else mem0
    // one-row centroid pack: ord-sorted array<struct(ord, cv, cn2)>
    val centPack = corpus.filter(col("vec_id").isin(centroidIds: _*))
      .select(
        (array_position(ordArr, col("vec_id")) - 1).cast("long").as("ord"),
        col("embedding").as("cv"),
        expr("qdot(embedding, embedding)").as("cn2"))
      .agg(sort_array(collect_list(struct(col("ord"), col("cv"),
        col("cn2")))).as("cents"))
      .localCheckpoint(true)
    // ---- stream side: all row-local until the membership join ----
    val scored = vecs
      .withColumn("ets", timestamp_micros(expr("ts div 1000")))
      .withWatermark("ets", s"$horizonMinutes minutes")
      .crossJoin(broadcast(centPack)) // 1 static row: stateless attach
      .withColumn("n2", expr("qdot(embedding, embedding)"))
      // ivfProbeAssignments' integer skey, evaluated per row: sign-
      // preserved (qd²·100) div cn2, ties to the lowest cell ordinal
      .withColumn("probes", expr(
        s"""slice(array_sort(
           |  transform(
           |    transform(cents, c -> named_struct(
           |      'qd', CAST(qdot(embedding, c.cv) AS BIGINT),
           |      'cn2', c.cn2, 'ord', c.ord)),
           |    s -> named_struct(
           |      'skey', CASE WHEN s.qd >= 0
           |        THEN (s.qd * s.qd * 100) DIV s.cn2
           |        ELSE -((s.qd * s.qd * 100) DIV s.cn2) END,
           |      'ord', s.ord)),
           |  (l, r) -> CASE WHEN l.skey > r.skey THEN -1
           |                 WHEN l.skey < r.skey THEN 1
           |                 WHEN l.ord < r.ord THEN -1
           |                 WHEN l.ord > r.ord THEN 1 ELSE 0 END),
           |  1, $nprobe)""".stripMargin))
      .select(col("vec_id"), col("ets"), col("embedding"), col("n2"),
        explode(col("probes")).as("p"))
      .withColumn("cell_id",
        element_at(ordArr, (col("p.ord") + 1).cast("int")))
    scored
      .join(mem, Seq("cell_id")) // stream-static equi-join: stateless
      .where(col("vec_id") =!= col("dup_of"))
      .withColumn("dot", expr("qdot(embedding, c_vec)"))
      .withColumn("cos_bp", expr(
        "CAST(floor(10000.0 * CAST(dot AS DOUBLE) / " +
          "(sqrt(CAST(n2 AS DOUBLE)) * sqrt(CAST(c_n2 AS DOUBLE)))) AS BIGINT)"))
      .where(col("cos_bp") >= minCosBp)
      .select(col("vec_id"), col("dup_of"), col("cos_bp"), col("ets"))
      .dropDuplicatesWithinWatermark("vec_id", "dup_of")
      .select("vec_id", "dup_of", "cos_bp")
  }

  case class DocRec(lang: String, doc_id: Long, text: String)
  case class TokenSketch(lang: String, tokens: Seq[String], counts: Seq[Long])

  /** Trending tokens per language, maintained INCREMENTALLY: the
    * Misra-Gries summary (functions/MisraGries — the same sketch p9
    * aggregates in batch) lives in the state store, each micro-batch
    * folds its new documents' tokens into it via mapGroupsWithState,
    * and the group emits its updated O(k) snapshot. The MG guarantee
    * survives streaming verbatim — any token with true frequency
    * > N/(k+1) over EVERYTHING ingested so far is in the snapshot —
    * because the state transition IS the batch reduce.
    *
    * State is O(k) per language forever (no watermark needed: the
    * sketch never grows), so this is the rare stateful operator that
    * is safe WITHOUT timeout-based GC. Determinism contract for the
    * parity spec: docs fold in (doc_id) order within a batch, tokens
    * in document order.
    */
  def trendingTokens(docs: Dataset[DocRec], k: Int = 8): Dataset[TokenSketch] = {
    import docs.sparkSession.implicits._
    val tokenRe = "[a-z0-9]+".r
    docs.groupByKey(_.lang)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout) {
        (lang: String, rows: Iterator[DocRec],
         state: GroupState[MisraGries.MGBuf]) =>
          val agg = new MisraGries.MG(k)
          val buf = rows.toSeq.sortBy(_.doc_id).foldLeft(
            state.getOption.getOrElse(agg.zero)) { (b, d) =>
              tokenRe.findAllIn(d.text.toLowerCase).foldLeft(b)(agg.reduce)
            }
          state.update(buf)
          TokenSketch(lang, buf.tokens, buf.counts)
      }
  }
}
