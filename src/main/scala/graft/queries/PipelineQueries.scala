package graft.queries

import org.apache.spark.sql.functions._

import org.apache.spark.sql.types.DecimalType

import graft.operators.{Curation, Overlap, TextOps}
import graft.sources.{Constraints, Tables, Warehouse}

/** Composed pipelines: constraint-validation suite (SURVEY §1.3) and
  * an end-to-end training-corpus filter chaining dedup + language ID +
  * quality thresholds — the shape an LLM data pipeline actually runs.
  */
object PipelineQueries {

  /** One relational BPE training round as DuckDB CTEs — the exact
    * window arithmetic of `Bpe.applyMerge` (weighted pair count,
    * n-DESC-then-lexicographic argmax, gaps-and-islands greedy
    * non-overlapping application). Shared by the p26 and p29 oracles.
    */
  private def bpeSqlRound(prev: String, k: Int): String =
    s""", pairs_$k AS (
       |  SELECT a, b, SUM(c) AS n FROM (
       |    SELECT c, sym AS a, lead(sym) OVER (PARTITION BY w ORDER BY pos) AS b
       |    FROM $prev)
       |  WHERE b IS NOT NULL GROUP BY a, b
       |), best_$k AS MATERIALIZED (
       |  SELECT a, b FROM pairs_$k ORDER BY n DESC, a, b LIMIT 1
       |), cand_$k AS (
       |  SELECT w, pos, pos - ROW_NUMBER() OVER (PARTITION BY w ORDER BY pos) AS grp
       |  FROM (SELECT w, pos, sym,
       |          lead(sym) OVER (PARTITION BY w ORDER BY pos) AS nxt FROM $prev)
       |  WHERE sym = (SELECT a FROM best_$k) AND nxt = (SELECT b FROM best_$k)
       |), chosen_$k AS MATERIALIZED (
       |  SELECT w, pos FROM (
       |    SELECT w, pos, pos - MIN(pos) OVER (PARTITION BY w, grp) AS off
       |    FROM cand_$k)
       |  WHERE off % 2 = 0
       |), s$k AS MATERIALIZED (
       |  SELECT s.w, s.c, ROW_NUMBER() OVER (PARTITION BY s.w ORDER BY s.pos) AS pos,
       |    CASE WHEN ch.pos IS NOT NULL THEN s.sym || (SELECT b FROM best_$k)
       |         ELSE s.sym END AS sym
       |  FROM $prev s
       |  LEFT JOIN chosen_$k ch ON ch.w = s.w AND ch.pos = s.pos
       |  LEFT JOIN chosen_$k sw ON sw.w = s.w AND sw.pos = s.pos - 1
       |  WHERE sw.pos IS NULL
       |)""".stripMargin

  /** Shared oracle prefix: corpus words (with stratum keys), weighted
    * vocabulary, character-level state, 16 replayed training rounds,
    * and the final per-word subword count `enc(w, n_sub)`.
    */
  private val bpeOracleCtes: String =
    """WITH docw AS MATERIALIZED (
      |  SELECT doc_id, lang, source,
      |    unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS w
      |  FROM documents
      |), vocab AS MATERIALIZED (
      |  SELECT w, CAST(COUNT(*) AS BIGINT) AS c FROM docw GROUP BY w
      |), s0 AS MATERIALIZED (
      |  SELECT v.w, v.c, i AS pos, v.cs[i] AS sym FROM (
      |    SELECT w, c, regexp_extract_all(w, '[a-z0-9]') AS cs FROM vocab) v,
      |    unnest(range(1, len(v.cs) + 1)) AS u(i)
      |)""".stripMargin +
      (1 to 16).map(k => bpeSqlRound(if (k == 1) "s0" else s"s${k - 1}", k)).mkString +
      """, enc AS (
        |  SELECT w, CAST(COUNT(*) AS BIGINT) AS n_sub FROM s16 GROUP BY w, c
        |)""".stripMargin

  /** The trained BPE segmentation (w, n_sub), memoized per (session,
    * sf dir) like every shared CTAS artifact: the merge loop runs on
    * the collected vocab (control-plane state — see Bpe.trainDriver's
    * scale rationale), and every consumer (p26 encode, p29 packing)
    * broadcasts the same materialized vocab-sized table instead of
    * re-training. `Bpe.train` (the relational twin the oracle
    * mirrors) is spec-pinned equal and stays for engine-replayable
    * verification.
    */
  private def bpeEnc(s: org.apache.spark.sql.SparkSession,
      dir: String): org.apache.spark.sql.DataFrame =
    graft.sources.SessionCache.getOrElseUpdate(s, s"bpe_enc:$dir") {
      val vocab = Tables.documents(s, dir)
        .select(explode(expr("regexp_extract_all(lower(text), '[a-z0-9]+', 0)")).as("w"))
        .groupBy("w").agg(count(lit(1)).as("c"))
      graft.operators.Bpe.trainDriver(vocab, rounds = 16).vocabSeg
        .select(col("w"), col("n_sub")).localCheckpoint()
    }

  val all: Seq[QueryDef] = Seq(

    // ---- declarative constraint suite over the star schema ----
    // One row per constraint with its violation count; the oracle
    // recomputes each count relationally. All zeros on sane data, but
    // the *counts* are compared, so broken data would also match.
    QueryDef("v1_constraint_checks",
      """SELECT * FROM (
        |  SELECT 'customer_pk' AS constraint_name,
        |         (SELECT COUNT(*) FROM (SELECT c_custkey FROM customer GROUP BY c_custkey HAVING COUNT(*) > 1) t) AS violations
        |  UNION ALL
        |  SELECT 'orders_fk_customer',
        |         (SELECT COUNT(*) FROM orders o WHERE o.o_custkey IS NOT NULL
        |            AND NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey))
        |  UNION ALL
        |  SELECT 'nation_fk_region',
        |         (SELECT COUNT(*) FROM nation n WHERE n.n_regionkey IS NOT NULL
        |            AND NOT EXISTS (SELECT 1 FROM region r WHERE r.r_regionkey = n.n_regionkey))
        |  UNION ALL
        |  SELECT 'lineitem_notnull',
        |         (SELECT COUNT(*) FROM lineitem WHERE l_orderkey IS NULL OR l_quantity IS NULL)
        |) ORDER BY constraint_name""".stripMargin) { (s, dir) =>
      import s.implicits._
      val checks = Seq(
        ("customer_pk",
          Constraints.primaryKeyViolations(Tables.customer(s, dir), "c_custkey")),
        ("orders_fk_customer",
          Constraints.foreignKeyOrphans(Tables.orders(s, dir), "o_custkey",
            Tables.customer(s, dir), "c_custkey")),
        ("nation_fk_region",
          Constraints.foreignKeyOrphans(Tables.nation(s, dir), "n_regionkey",
            Tables.region(s, dir), "r_regionkey")),
        ("lineitem_notnull",
          Constraints.notNullViolations(Tables.lineitem(s, dir),
            "l_orderkey", "l_quantity")))
      checks.toDF("constraint_name", "violations").orderBy("constraint_name")
    },

    // ---- end-to-end corpus filter: dedup ∘ lang-ID ∘ quality gates ----
    QueryDef("p1_corpus_filter",
      """WITH dedup AS (
        |  SELECT MIN(doc_id) AS doc_id FROM documents GROUP BY md5(text)
        |), scored AS (
        |  SELECT d.doc_id, d.lang,
        |    CAST(len(regexp_extract_all(d.text, '[A-Za-z0-9]+')) AS BIGINT) AS n_tokens,
        |    CAST(floor(10000.0 * (length(d.text) - length(regexp_replace(d.text, '[^A-Za-z0-9 ]', '', 'g'))) / greatest(length(d.text), 1)) AS BIGINT) AS punct_bp,
        |    CAST((length(d.text) - length(replace(d.text, ' the ', ''))) / 5 AS BIGINT) AS cnt_en
        |  FROM documents d JOIN dedup k ON d.doc_id = k.doc_id
        |)
        |SELECT doc_id, lang, n_tokens, punct_bp
        |FROM scored
        |WHERE n_tokens BETWEEN 20 AND 100000 AND punct_bp < 1500 AND cnt_en >= 1
        |ORDER BY doc_id""".stripMargin) { (s, dir) =>
      val docs = Tables.documents(s, dir)
      val survivors = docs.groupBy(md5(col("text")))
        .agg(min(col("doc_id")).as("doc_id"))
        .select("doc_id")
      docs.join(survivors, Seq("doc_id"))
        .select(
          col("doc_id"), col("lang"),
          TextOps.tokenCount("text").as("n_tokens"),
          TextOps.punctBp("text").as("punct_bp"),
          TextOps.occurrences("text", " the ").as("cnt_en"))
        .where(col("n_tokens").between(20, 100000) &&
          col("punct_bp") < 1500 && col("cnt_en") >= 1)
        .select("doc_id", "lang", "n_tokens", "punct_bp")
        .orderBy("doc_id")
    },

    // ---- deterministic content-hash sampling (~16%) ----
    // Reproducible corpus sampling: keep a doc iff the first md5(text)
    // hex byte is below 0x29 (41/256 ≈ 16%). Content-hash sampling is
    // THE scalable sampling primitive — no RNG state, stable across
    // reruns/engines/partitionings, pushes down as a cheap per-row
    // predicate, and samples duplicate texts identically (so dedup
    // before/after sampling commutes). Both engines emit lowercase
    // hex, so the string compare is portable.
    QueryDef("p2_hash_sample",
      """SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |  CAST(SUM(n_chars) AS BIGINT) AS sum_chars
        |FROM documents WHERE substr(md5(text), 1, 2) < '29'
        |GROUP BY lang ORDER BY lang""".stripMargin) { (s, dir) =>
      Tables.documents(s, dir)
        .where(substring(md5(col("text")), 1, 2) < "29")
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_chars")).cast("bigint").as("sum_chars"))
        .orderBy("lang")
    },

    // ---- stratified top-k: best documents per language stratum ----
    // Per-stratum ranking is one hash shuffle on the stratum key +
    // per-partition sort — the balanced-sampling shape for building
    // language-proportional training mixes.
    QueryDef("p3_stratified_topk",
      """SELECT lang, doc_id, n_chars, CAST(rk AS BIGINT) AS rk FROM (
        |  SELECT lang, doc_id, n_chars,
        |    ROW_NUMBER() OVER (PARTITION BY lang ORDER BY n_chars DESC, doc_id) AS rk
        |  FROM documents)
        |WHERE rk <= 3 ORDER BY lang, rk""".stripMargin) { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("lang").orderBy(col("n_chars").desc, col("doc_id"))
      Tables.documents(s, dir)
        .select(col("lang"), col("doc_id"), col("n_chars"),
          row_number().over(w).cast("bigint").as("rk"))
        .where(col("rk") <= 3)
        .orderBy("lang", "rk")
    },

    // ---- corpus vocabulary: token frequency top-k ----
    // explode → partial-aggregated groupBy: the per-partition hash map
    // collapses each partition's token stream before the shuffle, so
    // shuffle volume is O(distinct tokens per partition), not O(corpus
    // tokens); final top-k is TakeOrderedAndProject (per-partition
    // heads, no global sort).
    QueryDef("p4_vocab_topk",
      """SELECT token, CAST(COUNT(*) AS BIGINT) AS cnt FROM (
        |  SELECT unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS token
        |  FROM documents)
        |GROUP BY token ORDER BY cnt DESC, token LIMIT 50""".stripMargin) { (s, dir) =>
      Tables.documents(s, dir)
        .select(explode(expr("regexp_extract_all(lower(text), '[a-z0-9]+', 0)")).as("token"))
        .groupBy("token")
        .agg(count(lit(1)).as("cnt"))
        .orderBy(col("cnt").desc, col("token"))
        .limit(50)
    },

    // ---- stratified top-k via partial-aggregating TopK Aggregator ----
    // Same result family as p3 (k=5 here) but computed with the
    // map-side top-k buffer: the shuffle carries ≤ k rows per group per
    // map task instead of every row — see functions/TopKAgg scaladoc
    // for the cost model. Oracle identical in form to p3's.
    QueryDef("p5_topk_agg",
      """SELECT lang, doc_id, n_chars, CAST(rk AS BIGINT) AS rk FROM (
        |  SELECT lang, doc_id, n_chars,
        |    ROW_NUMBER() OVER (PARTITION BY lang ORDER BY n_chars DESC, doc_id) AS rk
        |  FROM documents)
        |WHERE rk <= 5 ORDER BY lang, rk""".stripMargin) { (s, dir) =>
      Tables.documents(s, dir)
        .groupBy("lang")
        .agg(graft.functions.TopKAgg.topK(5)(col("n_chars"), col("doc_id")).as("top"))
        .select(col("lang"), posexplode(col("top.rows")))
        .select(col("lang"), col("col.id").as("doc_id"),
          col("col.score").as("n_chars"),
          (col("pos") + 1).cast("bigint").as("rk"))
        .orderBy("lang", "rk")
    },

    // ---- near-dup-deduplicated corpus (the pipeline's end product) ----
    // d6 pairs → d10 clusters → keep only each cluster's canonical
    // member (min doc id) plus all pairless docs: the corpus a
    // training run would actually consume. One anti-join against the
    // non-canonical members — at 100 TB the cluster table is tiny
    // relative to the corpus (only docs WITH duplicates appear), so
    // the anti-join broadcasts.
    QueryDef("p6_dedup_corpus",
      """WITH RECURSIVE sh AS (
        |  SELECT doc_id, unnest(list_distinct(list_transform(range(1, greatest(length(text) - 4, 1) + 1), i -> substr(text, CAST(i AS INTEGER), 5)))) AS g
        |  FROM documents
        |), kept AS (
        |  SELECT doc_id, g FROM (
        |    SELECT doc_id, g, COUNT(*) OVER (PARTITION BY g) AS df FROM sh) t WHERE df <= 50
        |), sizes AS (
        |  SELECT doc_id, COUNT(*) AS sz FROM kept GROUP BY doc_id
        |), cand AS (
        |  SELECT a.doc_id AS a_id, b.doc_id AS b_id, COUNT(*) AS common
        |  FROM kept a JOIN kept b ON a.g = b.g AND a.doc_id < b.doc_id
        |  GROUP BY a.doc_id, b.doc_id
        |), pairs AS (
        |  SELECT p.a_id, p.b_id
        |  FROM cand p JOIN sizes sa ON p.a_id = sa.doc_id JOIN sizes sb ON p.b_id = sb.doc_id
        |  WHERE CAST(p.common AS DOUBLE) / (sa.sz + sb.sz - p.common) >= 0.6
        |), edges AS (
        |  SELECT a_id AS src, b_id AS dst FROM pairs
        |  UNION
        |  SELECT b_id, a_id FROM pairs
        |), reach(src, dst) AS (
        |  SELECT src, src FROM edges
        |  UNION
        |  SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src
        |), losers AS (
        |  SELECT src AS doc_id FROM reach GROUP BY src HAVING MIN(dst) != src
        |)
        |SELECT d.lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |  CAST(SUM(d.n_chars) AS BIGINT) AS sum_chars
        |FROM documents d
        |WHERE d.doc_id NOT IN (SELECT doc_id FROM losers)
        |GROUP BY d.lang ORDER BY d.lang""".stripMargin) { (s, dir) =>
      val docs = Tables.documents(s, dir)
      val losers = graft.operators.Dedup.duplicateClusters(
        TextQueries.jaccardPairs(s, dir))
        .where(col("doc_id") =!= col("cluster_id"))
        .select("doc_id")
      docs.join(broadcast(losers), Seq("doc_id"), "left_anti")
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_chars")).cast("bigint").as("sum_chars"))
        .orderBy("lang")
    },

    // ---- deterministic per-stratum sampling (training-mix rebalance) ----
    // Different keep-rates per language via an md5 threshold on the
    // KEY (p2 hashes content; keys survive text edits): 4 hex chars =
    // 65536 buckets, 0x1999/65536 ≈ 10% for the over-represented
    // stratum, 0x4ccc ≈ 30% for the rest. Scan-local — no shuffle, no
    // RNG state, reproducible across engines/runs/retries, and the
    // sample COMPOSES (a 5% re-sample of the 10% sample is the hash
    // prefix < 0x0ccc subset). This is the only sampling shape that is
    // auditable at 100 TB: membership is a pure function of the key.
    QueryDef("p7_stratified_sample",
      """SELECT doc_id, lang, n_chars FROM documents
        |WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) <
        |  CASE WHEN lang = 'en' THEN '1999' ELSE '4ccc' END
        |ORDER BY doc_id""".stripMargin) { (s, dir) =>
      Tables.documents(s, dir)
        .where(substring(md5(col("doc_id").cast("string")), 1, 4) <
          when(col("lang") === "en", "1999").otherwise("4ccc"))
        .select("doc_id", "lang", "n_chars")
        .orderBy("doc_id")
    },

    // ---- bigram language-model counts (n-gram LM table build) ----
    // Token bigrams via posexplode over the regex token array, counts
    // grouped on (w1, w2), conditional probability from a w1-
    // partitioned window over the GROUPED table (vocab² rows, not
    // token rows — the window input is already aggregate-sized). The
    // n ≥ 20 support cut is applied AFTER the window so P(w2|w1)
    // denominators stay exact. p_cond is one bigint/bigint division
    // in double — bit-exact on both engines.
    QueryDef("p8_bigram_lm",
      """WITH toks AS (
        |  SELECT regexp_extract_all(lower(text), '[a-z0-9]+') AS ts FROM documents
        |), big AS (
        |  SELECT ts[i] AS w1, ts[i + 1] AS w2
        |  FROM toks, unnest(range(1, len(ts))) AS u(i)
        |), grouped AS (
        |  SELECT w1, w2, COUNT(*) AS n,
        |    CAST(COUNT(*) AS DOUBLE) / SUM(COUNT(*)) OVER (PARTITION BY w1) AS p_cond
        |  FROM big GROUP BY w1, w2
        |)
        |SELECT w1, w2, n, p_cond FROM grouped
        |WHERE n >= 20 ORDER BY w1, w2""".stripMargin) { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val toks = Tables.documents(s, dir)
        .select(expr("regexp_extract_all(lower(text), '[a-z0-9]+', 0)").as("ts"))
      val bigrams = toks
        .select(col("ts"), posexplode(col("ts")))
        .where(col("pos") < size(col("ts")) - 1)
        .select(col("col").as("w1"),
          element_at(col("ts"), col("pos") + 2).as("w2"))
      bigrams
        .groupBy("w1", "w2")
        .agg(count(lit(1)).as("n"))
        .withColumn("p_cond", col("n").cast("double") /
          sum("n").over(Window.partitionBy("w1")).cast("double"))
        .where(col("n") >= 20)
        .select("w1", "w2", "n", "p_cond")
        .orderBy("w1", "w2")
    },

    // ---- one-pass column profiling (data-quality audit) ----
    // Row count, null count, exact distinct count and min/max for
    // five orders columns in a SINGLE scan: Catalyst plans the five
    // COUNT(DISTINCT)s as one Expand (×5 row multiplier) + partial
    // aggregation — still one pass over the fact table, which is the
    // profiling shape for 100 TB (the oracle's five UNION ALL scans
    // is what NOT to do at scale). Values render as strings so one
    // stack() unpivots heterogeneous column types into rows; doubles
    // go through DECIMAL(12,2) so both engines print identically.
    QueryDef("v2_profile",
      """SELECT 'o_custkey' AS col_name, COUNT(*) AS n_rows,
        |    COUNT(*) - COUNT(o_custkey) AS n_nulls, COUNT(DISTINCT o_custkey) AS n_distinct,
        |    CAST(MIN(o_custkey) AS VARCHAR) AS min_v, CAST(MAX(o_custkey) AS VARCHAR) AS max_v
        |  FROM orders
        |UNION ALL
        |SELECT 'o_orderdate', COUNT(*), COUNT(*) - COUNT(o_orderdate), COUNT(DISTINCT o_orderdate),
        |    CAST(CAST(MIN(o_orderdate) AS DATE) AS VARCHAR), CAST(CAST(MAX(o_orderdate) AS DATE) AS VARCHAR)
        |  FROM orders
        |UNION ALL
        |SELECT 'o_orderpriority', COUNT(*), COUNT(*) - COUNT(o_orderpriority), COUNT(DISTINCT o_orderpriority),
        |    MIN(o_orderpriority), MAX(o_orderpriority)
        |  FROM orders
        |UNION ALL
        |SELECT 'o_orderstatus', COUNT(*), COUNT(*) - COUNT(o_orderstatus), COUNT(DISTINCT o_orderstatus),
        |    MIN(o_orderstatus), MAX(o_orderstatus)
        |  FROM orders
        |UNION ALL
        |SELECT 'o_totalprice', COUNT(*), COUNT(*) - COUNT(o_totalprice), COUNT(DISTINCT o_totalprice),
        |    CAST(CAST(MIN(o_totalprice) AS DECIMAL(12,2)) AS VARCHAR),
        |    CAST(CAST(MAX(o_totalprice) AS DECIMAL(12,2)) AS VARCHAR)
        |  FROM orders
        |ORDER BY col_name""".stripMargin) { (s, dir) =>
      // AGGREGATE-STRATEGY SPLIT: a min/max over a STRING column has an
      // immutable agg buffer, which demotes the WHOLE aggregate — the
      // multi-distinct Expand pipeline included — to SortAggregate,
      // i.e. a full sort of the ×6-expanded fact table on 6 keys
      // (measured 2.8 s at sf0.1; string group KEYS are fine, string
      // BUFFERS are not). So the string min/maxes move to their own
      // global aggregate: empty grouping keys need no sort, it's one
      // map-side-combined pass, and its 1-row result cross-joins back.
      // Both branches prune to disjoint parquet columns, so total bytes
      // read stay those of the single 5-column scan.
      val hashFriendly = Tables.orders(s, dir).agg(
        count(lit(1)).as("n_rows"),
        count(col("o_custkey")).as("nn_custkey"),
        countDistinct(col("o_custkey")).as("nd_custkey"),
        min(col("o_custkey")).cast("string").as("mn_custkey"),
        max(col("o_custkey")).cast("string").as("mx_custkey"),
        count(col("o_orderdate")).as("nn_orderdate"),
        countDistinct(col("o_orderdate")).as("nd_orderdate"),
        date_format(min(col("o_orderdate")), "yyyy-MM-dd").as("mn_orderdate"),
        date_format(max(col("o_orderdate")), "yyyy-MM-dd").as("mx_orderdate"),
        count(col("o_orderpriority")).as("nn_orderpriority"),
        countDistinct(col("o_orderpriority")).as("nd_orderpriority"),
        count(col("o_orderstatus")).as("nn_orderstatus"),
        countDistinct(col("o_orderstatus")).as("nd_orderstatus"),
        count(col("o_totalprice")).as("nn_totalprice"),
        countDistinct(col("o_totalprice")).as("nd_totalprice"),
        min(col("o_totalprice")).cast(DecimalType(12, 2)).cast("string").as("mn_totalprice"),
        max(col("o_totalprice")).cast(DecimalType(12, 2)).cast("string").as("mx_totalprice"))
      val stringMinMax = Tables.orders(s, dir).agg(
        min(col("o_orderpriority")).as("mn_orderpriority"),
        max(col("o_orderpriority")).as("mx_orderpriority"),
        min(col("o_orderstatus")).as("mn_orderstatus"),
        max(col("o_orderstatus")).as("mx_orderstatus"))
      val wide = hashFriendly.crossJoin(broadcast(stringMinMax))
      wide.select(expr(
        """stack(5,
          |  'o_custkey', nn_custkey, nd_custkey, mn_custkey, mx_custkey,
          |  'o_orderdate', nn_orderdate, nd_orderdate, mn_orderdate, mx_orderdate,
          |  'o_orderpriority', nn_orderpriority, nd_orderpriority, mn_orderpriority, mx_orderpriority,
          |  'o_orderstatus', nn_orderstatus, nd_orderstatus, mn_orderstatus, mx_orderstatus,
          |  'o_totalprice', nn_totalprice, nd_totalprice, mn_totalprice, mx_totalprice
          |) AS (col_name, nn, n_distinct, min_v, max_v)""".stripMargin),
        col("n_rows"))
        .select(col("col_name"), col("n_rows"),
          (col("n_rows") - col("nn")).as("n_nulls"), col("n_distinct"),
          col("min_v"), col("max_v"))
        .orderBy("col_name")
    },

    // ---- Misra-Gries heavy hitters (mergeable counter sketch) ----
    // The sketch path for "most frequent tokens" when even the exact
    // groupBy(token) shuffle is too big: MG with k=64 counters ships
    // O(k) state per map task, and its deterministic guarantee — any
    // token with true count > N/(k+1) IS in the summary, under any
    // partitioning/merge order (Mergeable Summaries, PODS'12) — is the
    // oracle CONTRACT. DuckDB computes the exact heavy-hitter set;
    // Spark re-derives the same exact set (that part hash-matches by
    // construction) and flags membership in the MG sketch: any FALSE
    // in in_sketch is a violated guarantee, i.e. a broken reduce/merge.
    // The counter VALUES are partitioning-dependent, so they are
    // deliberately NOT exposed. Exact top-k stays p4's shape; the
    // property spec covers the estimate-error bound on random splits.
    QueryDef("p9_heavy_hitters",
      """WITH t AS (
        |  SELECT unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS token
        |  FROM documents
        |), c AS (
        |  SELECT token, CAST(COUNT(*) AS BIGINT) AS cnt FROM t GROUP BY token
        |), n AS (SELECT SUM(cnt) AS total FROM c)
        |SELECT token, cnt, TRUE AS in_sketch FROM c
        |WHERE cnt * 65 > (SELECT total FROM n)
        |ORDER BY token""".stripMargin) { (s, dir) =>
      val k = 64
      val tokens = Tables.documents(s, dir)
        .select(explode(expr("regexp_extract_all(lower(text), '[a-z0-9]+', 0)")).as("token"))
      val exact = tokens.groupBy("token").agg(count(lit(1)).as("cnt"))
      val total = exact.agg(sum("cnt").as("total"))
      val sketched = tokens
        .agg(graft.functions.MisraGries.sketch(k)(col("token")).as("mg"))
        .select(explode(col("mg.tokens")).as("token"))
        .withColumn("tracked", lit(true))
      exact.crossJoin(broadcast(total))
        .where(col("cnt") * (k + 1) > col("total"))
        .join(broadcast(sketched), Seq("token"), "left")
        .select(col("token"), col("cnt"),
          coalesce(col("tracked"), lit(false)).as("in_sketch"))
        .orderBy("token")
    },

    // ---- TF-IDF keyword extraction (top-3 terms per document) ----
    // The classic corpus-statistics op: term frequency per (doc,
    // token), document frequency per token, score = tf × idf, top-k
    // keywords per doc. Distributed shape: two partial-aggregated
    // shuffles build tf and df; df (vocab-sized) joins tf on token;
    // the per-doc top-3 window partitions by doc — no global sort,
    // nothing driver-side. CROSS-ENGINE FLOAT DISCIPLINE: idf is the
    // only transcendental (ln(N/df)); libm implementations may differ
    // in the last ULP, so idf is QUANTIZED to integer micro-units
    // (floor(1e6·ln)) and the score stays exact bigint arithmetic —
    // ranking can never be flipped by a ULP. A boundary hit would
    // need ln to land within 2^-52 of a 1e-6 grid line (~1e-10 per
    // distinct df; df takes a few hundred values here).
    QueryDef("p10_tfidf_keywords",
      """WITH t AS (
        |  SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS token
        |  FROM documents
        |), tf AS (
        |  SELECT doc_id, token, CAST(COUNT(*) AS BIGINT) AS tf
        |  FROM t GROUP BY doc_id, token
        |), df AS (
        |  SELECT token, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df
        |  FROM t GROUP BY token
        |), n AS (SELECT COUNT(*) AS n_docs FROM documents
        |), scored AS (
        |  SELECT tf.doc_id, tf.token, tf.tf, df.df,
        |    tf.tf * CAST(floor(1000000.0 * ln(CAST((SELECT n_docs FROM n) AS DOUBLE) / df.df)) AS BIGINT) AS score
        |  FROM tf JOIN df ON tf.token = df.token
        |)
        |SELECT doc_id, token, tf, df, score FROM (
        |  SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
        |    ORDER BY score DESC, token) AS rk FROM scored)
        |WHERE rk <= 3 ORDER BY doc_id, score DESC, token""".stripMargin) { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val toks = Tables.documents(s, dir)
        .select(col("doc_id"),
          explode(expr("regexp_extract_all(lower(text), '[a-z0-9]+', 0)")).as("token"))
      val tf = toks.groupBy("doc_id", "token").agg(count(lit(1)).as("tf"))
      // df DERIVED from tf (r18, guide §2.3 "aggregate before you
      // shuffle"): tf already holds one row per (doc, token), so a
      // plain count per token over tf equals countDistinct(doc_id)
      // over the raw token stream — and the raw stream's second
      // explode + two-phase distinct aggregate disappear. The tf
      // subtree appears on both sides of the diamond; ReuseExchange
      // dedups the scan+explode+partial-agg, so the corpus is exploded
      // ONCE (taskSum was 19.8 s at sf0.1/32c, almost all in the twin
      // explodes).
      val df = tf.groupBy("token").agg(count(lit(1)).as("df"))
      val nDocs = Tables.documents(s, dir).agg(count(lit(1)).as("n_docs"))
      val scored = tf.join(df, Seq("token"))
        .crossJoin(broadcast(nDocs))
        .withColumn("score", col("tf") *
          floor(lit(1000000.0) * log(col("n_docs").cast("double") / col("df")))
            .cast("bigint"))
      val w = Window.partitionBy("doc_id").orderBy(col("score").desc, col("token"))
      scored.withColumn("rk", row_number().over(w))
        .where(col("rk") <= 3)
        .select("doc_id", "token", "tf", "df", "score")
        .orderBy(col("doc_id"), col("score").desc, col("token"))
    },

    // ---- Gopher-style document quality gates ----
    // Per-document repetition/diversity statistics and a keep flag —
    // the filter step every pretraining pipeline runs (cf. Gopher /
    // MassiveText rules: max-word-frequency ratio, type-token ratio,
    // length bounds). Distributed shape: token rows partial-aggregate
    // map-side into per-(doc, word) counts (shuffle carries vocab-
    // sized groups, not token rows), then one doc-keyed aggregation.
    // A per-row HOF version (no shuffle) exists but is O(vocab²) per
    // document — the explode+groupBy form is linear and its shuffle
    // is bounded by per-doc vocabulary, which is the scalable trade.
    // Ratios in basis points via floor() — integer on both engines.
    QueryDef("p11_quality_filter",
      """WITH words AS (
        |  SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS w
        |  FROM documents
        |), wc AS (
        |  SELECT doc_id, w, COUNT(*) AS cnt FROM words GROUP BY doc_id, w
        |)
        |SELECT doc_id,
        |  CAST(SUM(cnt) AS BIGINT) AS n_words,
        |  CAST(COUNT(*) AS BIGINT) AS n_distinct_words,
        |  CAST(MAX(cnt) AS BIGINT) AS max_word_cnt,
        |  CAST(floor(10000.0 * MAX(cnt) / SUM(cnt)) AS BIGINT) AS top_word_bp,
        |  CAST(floor(10000.0 * COUNT(*) / SUM(cnt)) AS BIGINT) AS ttr_bp,
        |  (SUM(cnt) BETWEEN 30 AND 100000
        |    AND floor(10000.0 * MAX(cnt) / SUM(cnt)) < 2000
        |    AND floor(10000.0 * COUNT(*) / SUM(cnt)) > 300) AS keep
        |FROM wc GROUP BY doc_id ORDER BY doc_id""".stripMargin) { (s, dir) =>
      val words = Tables.documents(s, dir).select(col("doc_id"),
        explode(expr("regexp_extract_all(lower(text), '[a-z0-9]+', 0)")).as("w"))
      val wc = words.groupBy("doc_id", "w").agg(count(lit(1)).as("cnt"))
      wc.groupBy("doc_id")
        .agg(sum("cnt").as("n_words"),
          count(lit(1)).as("n_distinct_words"),
          max("cnt").as("max_word_cnt"))
        .withColumn("top_word_bp",
          floor(lit(10000.0) * col("max_word_cnt") / col("n_words")).cast("long"))
        .withColumn("ttr_bp",
          floor(lit(10000.0) * col("n_distinct_words") / col("n_words")).cast("long"))
        .withColumn("keep",
          col("n_words").between(30, 100000) &&
            col("top_word_bp") < 2000 && col("ttr_bp") > 300)
        .orderBy("doc_id")
    },

    // ---- overlapping token-window chunking (context packing prep) ----
    // Splits each document into fixed-size token windows with overlap
    // (size 32, stride 24) — the step that turns documents into
    // training sequences. Pure per-row narrow transform: tokenize,
    // generate window starts with sequence(), slice per start, then
    // posexplode. ZERO shuffles besides the final presentation sort —
    // at 100 TB this runs scan-speed and preserves the input
    // partitioning for any downstream packer.
    QueryDef("p12_chunk_windows",
      """WITH d AS (
        |  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS words
        |  FROM documents
        |), starts AS (
        |  SELECT doc_id, words, unnest(range(0, greatest(len(words), 1), 24)) AS s FROM d
        |)
        |SELECT doc_id, CAST(s // 24 AS BIGINT) AS chunk_idx,
        |  CAST(len(list_slice(words, s + 1, s + 32)) AS BIGINT) AS chunk_tokens,
        |  array_to_string(list_slice(words, s + 1, s + 32), ' ') AS chunk_text
        |FROM starts ORDER BY doc_id, chunk_idx""".stripMargin) { (s, dir) =>
      Tables.documents(s, dir)
        .select(col("doc_id"),
          expr("regexp_extract_all(lower(text), '[a-z0-9]+', 0)").as("words"))
        .select(col("doc_id"), posexplode(expr(
          "transform(sequence(0, greatest(size(words) - 1, 0), 24)," +
            " st -> slice(words, st + 1, 32))")))
        .select(col("doc_id"), col("pos").cast("long").as("chunk_idx"),
          size(col("col")).cast("long").as("chunk_tokens"),
          array_join(col("col"), " ").as("chunk_text"))
        .orderBy("doc_id", "chunk_idx")
    },

    // ---- fixed-budget sequence packing (bin assignment) ----
    // Assigns documents to contiguous token-budget bins (budget 2048)
    // within (lang, source) partitions: bin = exclusive-prefix-sum of
    // token counts div budget. This is the deterministic "contiguous
    // packing" used in practice when strict bin packing isn't worth a
    // stateful pass; a doc whose tokens straddle a boundary belongs to
    // the bin its first token falls in. Distributed shape: the window
    // partitions by (lang, source), so packing parallelizes across
    // strata and no global sort exists; at 100 TB the stratum key
    // would also carry a date bucket to bound partition size.
    QueryDef("p13_pack_bins",
      """WITH t AS (
        |  SELECT doc_id, lang, source,
        |    CAST(len(regexp_extract_all(lower(text), '[a-z0-9]+')) AS BIGINT) AS n_tokens
        |  FROM documents
        |), c AS (
        |  SELECT doc_id, lang, source, n_tokens,
        |    CAST(COALESCE(SUM(n_tokens) OVER (PARTITION BY lang, source ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS cum_prev
        |  FROM t
        |)
        |SELECT lang, source, CAST(cum_prev // 2048 AS BIGINT) AS bin_id,
        |  CAST(COUNT(*) AS BIGINT) AS n_docs,
        |  CAST(SUM(n_tokens) AS BIGINT) AS bin_tokens,
        |  MIN(doc_id) AS first_doc, MAX(doc_id) AS last_doc
        |FROM c GROUP BY lang, source, bin_id
        |ORDER BY lang, source, bin_id""".stripMargin) { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val t = Tables.documents(s, dir).select(col("doc_id"), col("lang"), col("source"),
        size(expr("regexp_extract_all(lower(text), '[a-z0-9]+', 0)"))
          .cast("long").as("n_tokens"))
      val w = Window.partitionBy("lang", "source").orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
      t.withColumn("cum_prev", coalesce(sum("n_tokens").over(w), lit(0L)))
        .withColumn("bin_id", floor(col("cum_prev") / lit(2048)).cast("long"))
        .groupBy("lang", "source", "bin_id")
        .agg(count(lit(1)).as("n_docs"), sum("n_tokens").as("bin_tokens"),
          min("doc_id").as("first_doc"), max("doc_id").as("last_doc"))
        .orderBy("lang", "source", "bin_id")
    },

    // ---- KMV bottom-k distinct sketch vs exact (contract oracle) ----
    // Per-language distinct-token estimate from the mergeable KMV
    // sketch (functions/KmvSketch.scala — O(k) shuffle state, exactly
    // associative merge) checked against the exact count. The sketch
    // state is a pure function of the input SET, so the estimate is
    // partitioning-independent; when the stratum vocabulary is below
    // k the sketch is provably exact, beyond k the (k-1)/u_k estimator
    // applies (accuracy property-tested in KmvPropertySpec). DuckDB
    // cannot compute xxhash64, so the oracle is the CONTRACT pattern:
    // exact count + the tolerance flag recomputed as literal TRUE.
    QueryDef("p14_kmv_distinct",
      """WITH t AS (
        |  SELECT lang, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS token
        |  FROM documents
        |)
        |SELECT lang, CAST(COUNT(DISTINCT token) AS BIGINT) AS exact_distinct,
        |  TRUE AS within_tol
        |FROM t GROUP BY lang ORDER BY lang""".stripMargin) { (s, dir) =>
      val toks = Tables.documents(s, dir).select(col("lang"),
        explode(expr("regexp_extract_all(lower(text), '[a-z0-9]+', 0)")).as("token"))
      val est = toks
        .select(col("lang"), xxhash64(col("token")).as("h"))
        .groupBy("lang")
        .agg(graft.functions.KmvSketch.estimate(256)(col("h")).as("est"))
      val exact = toks.groupBy("lang")
        .agg(countDistinct(col("token")).as("exact_distinct"))
      exact.join(est, Seq("lang"))
        .select(col("lang"), col("exact_distinct"),
          (abs(col("est") - col("exact_distinct")) <=
            lit(0.15) * col("exact_distinct")).as("within_tol"))
        .orderBy("lang")
    },

    // ---- BM25 top-k retrieval over the corpus ----
    // Okapi BM25 (k1 = 1.2, b = 0.75) for a fixed query set, top-3
    // docs per query. Distributed shape: the query-term table and the
    // vocab-sized df table broadcast; the doc-sized tf/dl tables stay
    // partitioned; one groupBy(query, doc) sums term scores and a
    // query-partitioned window takes the top 3 — no global sort, no
    // driver data. CROSS-ENGINE FLOAT DISCIPLINE (same as p10's
    // TF-IDF): idf = ln((N-df+0.5)/(df+0.5)+1) is the only
    // transcendental and is quantized to integer micro-units; every
    // other operation is IEEE-identical in declared order, and the
    // per-term score is floor'd to bigint so the (query, doc) sum is
    // exact integer arithmetic — partial-aggregation order can never
    // flip a ranking.
    QueryDef("p15_bm25_topdocs",
      """WITH q(query_id, token) AS (
        |  VALUES (0, 'table'), (0, 'scan'), (1, 'window'), (1, 'agg'),
        |         (2, 'hash'), (2, 'join')
        |), t AS (
        |  SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS token
        |  FROM documents
        |), tf AS (
        |  SELECT doc_id, token, CAST(COUNT(*) AS BIGINT) AS tf FROM t GROUP BY doc_id, token
        |), dl AS (
        |  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS dl FROM t GROUP BY doc_id
        |), stats AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
        |    CAST(SUM(dl) AS DOUBLE) / COUNT(*) AS avgdl FROM dl
        |), df AS (
        |  SELECT token, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df FROM t GROUP BY token
        |), idf AS (
        |  SELECT token, CAST(floor(1000000.0 * ln(
        |    (CAST((SELECT n_docs FROM stats) - df AS DOUBLE) + 0.5)
        |      / (CAST(df AS DOUBLE) + 0.5) + 1.0)) AS BIGINT) AS idf_micro
        |  FROM df
        |), term AS (
        |  SELECT q.query_id, tf.doc_id,
        |    CAST(floor(CAST(idf.idf_micro AS DOUBLE)
        |      * (CAST(tf.tf AS DOUBLE) * 2.2)
        |      / (CAST(tf.tf AS DOUBLE) + 1.2 * (0.25 + 0.75
        |          * (CAST(dl.dl AS DOUBLE) / (SELECT avgdl FROM stats))))) AS BIGINT)
        |      AS term_micro
        |  FROM q JOIN tf ON q.token = tf.token
        |  JOIN idf ON q.token = idf.token
        |  JOIN dl ON tf.doc_id = dl.doc_id
        |), scored AS (
        |  SELECT query_id, doc_id, CAST(SUM(term_micro) AS BIGINT) AS score_micro
        |  FROM term GROUP BY query_id, doc_id
        |)
        |SELECT query_id, doc_id, score_micro FROM (
        |  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
        |    ORDER BY score_micro DESC, doc_id) AS rk FROM scored)
        |WHERE rk <= 3 ORDER BY query_id, score_micro DESC, doc_id""".stripMargin) { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      import s.implicits._
      val queries = Seq((0, "table"), (0, "scan"), (1, "window"), (1, "agg"),
        (2, "hash"), (2, "join")).toDF("query_id", "token")
      // tf is the single token-exploding scan; df, dl and the corpus
      // stats all DERIVE from it (df = rows per token, dl = Σtf per
      // doc). r15: tf is MATERIALIZED once (localCheckpoint) — its
      // four consumers (dl, stats via dl, df→idf, the term join) sit
      // on different shuffle keys, so ReuseExchange cannot serve them
      // from one exchange and the tokenize+explode scan was running
      // twice (the sf1 floor the r14 verdict flagged). The checkpoint
      // is doc×distinct-token sized — the same order as the shuffle it
      // replaces; on a cluster this is a cached/checkpointed stage,
      // identical shape.
      val toks = Tables.documents(s, dir).select(col("doc_id"),
        explode(expr("regexp_extract_all(lower(text), '[a-z0-9]+', 0)")).as("token"))
      val tf = toks.groupBy("doc_id", "token").agg(count(lit(1)).as("tf"))
        .localCheckpoint(true)
      val dl = tf.groupBy("doc_id").agg(sum("tf").as("dl"))
      val stats = dl.agg(count(lit(1)).as("n_docs"),
        (sum("dl").cast("double") / count(lit(1))).as("avgdl"))
      val df = tf.groupBy("token").agg(count(lit(1)).as("df"))
      val idf = df.crossJoin(broadcast(stats))
        .select(col("token"), floor(lit(1000000.0) * log(
          ((col("n_docs") - col("df")).cast("double") + lit(0.5))
            / (col("df").cast("double") + lit(0.5)) + lit(1.0)))
          .cast("long").as("idf_micro"))
      // NOTE: the SAME broadcast(stats) subplan as idf's — canonicalized
      // equality lets ReuseExchange serve both from one broadcast job
      // (a .select("avgdl") variant here was a second, different
      // subplan and paid a second job for the same one-row table)
      val term = broadcast(queries).join(tf, Seq("token"))
        .join(broadcast(idf), Seq("token"))
        .join(dl, Seq("doc_id"))
        .crossJoin(broadcast(stats))
        .select(col("query_id"), col("doc_id"),
          floor(col("idf_micro").cast("double")
            * (col("tf").cast("double") * lit(2.2))
            / (col("tf").cast("double") + lit(1.2) * (lit(0.25) + lit(0.75)
                * (col("dl").cast("double") / col("avgdl")))))
            .cast("long").as("term_micro"))
      val scored = term.groupBy("query_id", "doc_id")
        .agg(sum("term_micro").as("score_micro"))
      val w = Window.partitionBy("query_id")
        .orderBy(col("score_micro").desc, col("doc_id"))
      scored.withColumn("rk", row_number().over(w))
        .where(col("rk") <= 3)
        .select("query_id", "doc_id", "score_micro")
        .orderBy(col("query_id"), col("score_micro").desc, col("doc_id"))
    },

    // ---- temperature-weighted mixture sampling (domain rebalancing) ----
    // The multilingual/domain-mixing primitive: stratum weights w_i =
    // c_i^0.7 / Σ c_j^0.7 (temperature α = 0.7 upweights small
    // strata), target 300 docs total, per-stratum keep rate
    // min(1, 300·w_i / c_i), membership decided by a deterministic
    // md5 threshold — the same composable hash-sampling contract as
    // p7, but with DATA-DEPENDENT rates. Distributed shape: stratum
    // counts are one tiny aggregate broadcast back onto the scan; the
    // filter is per-row, so the sample never shuffles. pow() is
    // quantized to micro-units before use (p10's ULP argument); the
    // hex threshold is clamped to 0xffff so the string compare stays
    // fixed-width on both engines.
    QueryDef("p16_mixture_sample",
      """WITH c AS (
        |  SELECT lang, CAST(COUNT(*) AS BIGINT) AS n FROM documents GROUP BY lang
        |), w AS (
        |  SELECT lang, n,
        |    CAST(floor(1000000.0 * pow(CAST(n AS DOUBLE), 0.7)) AS BIGINT) AS pw
        |  FROM c
        |), tot AS (SELECT CAST(SUM(pw) AS BIGINT) AS s FROM w
        |), r AS (
        |  SELECT lang, n,
        |    CAST(least(floor(least(
        |      300.0 * (CAST(pw AS DOUBLE) / CAST((SELECT s FROM tot) AS DOUBLE))
        |        / CAST(n AS DOUBLE), 1.0) * 65536.0), 65535.0) AS BIGINT) AS thr
        |  FROM w
        |)
        |SELECT d.doc_id, d.lang, r.thr FROM documents d JOIN r ON d.lang = r.lang
        |WHERE substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 4) < printf('%04x', r.thr)
        |ORDER BY d.doc_id""".stripMargin) { (s, dir) =>
      val docs = Tables.documents(s, dir)
      val c = docs.groupBy("lang").agg(count(lit(1)).as("n"))
      val w = c.withColumn("pw",
        floor(lit(1000000.0) * pow(col("n").cast("double"), lit(0.7))).cast("long"))
      val tot = w.agg(sum("pw").cast("long").as("s"))
      val r = w.crossJoin(broadcast(tot))
        .select(col("lang"),
          least(floor(least(
            lit(300.0) * (col("pw").cast("double") / col("s").cast("double"))
              / col("n").cast("double"), lit(1.0)) * lit(65536.0)), lit(65535.0))
            .cast("long").as("thr"))
      docs.join(broadcast(r), Seq("lang"))
        .where(substring(md5(col("doc_id").cast("string")), 1, 4) <
          format_string("%04x", col("thr")))
        .select(col("doc_id"), col("lang"), col("thr"))
        .orderBy("doc_id")
    },

    // ---- C4/Gopher repetition gate (dup-n-gram mass) ----
    // Per-document duplicated-bigram/-trigram mass and top-bigram
    // share in basis points; boilerplate-heavy docs fail the gate.
    // Both gram sizes ride ONE explode (gram size is a payload column)
    // → the corpus is scanned once; shuffle is bounded by per-doc
    // distinct grams, the same scalable trade as p11.
    QueryDef("p17_repetition_gate",
      """WITH toks AS (
        |  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS t
        |  FROM documents
        |), grams AS (
        |  SELECT doc_id, 2 AS n,
        |    unnest(list_transform(range(1, greatest(len(t) - 1, 0) + 1),
        |      i -> array_to_string(t[i:i+1], ' '))) AS g
        |  FROM toks
        |  UNION ALL
        |  SELECT doc_id, 3 AS n,
        |    unnest(list_transform(range(1, greatest(len(t) - 2, 0) + 1),
        |      i -> array_to_string(t[i:i+2], ' '))) AS g
        |  FROM toks
        |), cnt AS (
        |  SELECT doc_id, n, g, COUNT(*) AS cnt FROM grams GROUP BY doc_id, n, g
        |)
        |, agg AS (
        |  SELECT doc_id,
        |    SUM(CASE WHEN n = 2 AND cnt >= 2 THEN cnt ELSE 0 END) AS dup2,
        |    SUM(CASE WHEN n = 2 THEN cnt ELSE 0 END) AS tot2,
        |    MAX(CASE WHEN n = 2 THEN cnt END) AS top2,
        |    SUM(CASE WHEN n = 3 AND cnt >= 2 THEN cnt ELSE 0 END) AS dup3,
        |    SUM(CASE WHEN n = 3 THEN cnt ELSE 0 END) AS tot3
        |  FROM cnt GROUP BY doc_id
        |)
        |SELECT doc_id, dup2_bp, top2_bp, dup3_bp,
        |  (dup2_bp < 1000 AND dup3_bp < 500) AS keep
        |FROM (
        |  SELECT doc_id,
        |    CASE WHEN tot2 > 0 THEN CAST(floor(10000.0 * dup2 / tot2) AS BIGINT) ELSE 0 END AS dup2_bp,
        |    CASE WHEN tot2 > 0 THEN CAST(floor(10000.0 * top2 / tot2) AS BIGINT) ELSE 0 END AS top2_bp,
        |    CASE WHEN tot3 > 0 THEN CAST(floor(10000.0 * dup3 / tot3) AS BIGINT) ELSE 0 END AS dup3_bp
        |  FROM agg)
        |ORDER BY doc_id""".stripMargin) { (s, dir) =>
      Curation.repetitionStats(Tables.documents(s, dir),
        dup2Max = 1000, dup3Max = 500).orderBy("doc_id")
    },

    // ---- deterministic shard assignment + partitioned read-back ----
    // Documents land in 8 content-hash shards via partitionBy("shard")
    // (Warehouse.documentsByShard); the manifest aggregates the READ-
    // BACK layout while the oracle recomputes shard ids from the raw
    // table — equality proves the round trip preserved the assignment
    // exactly. This is the dataloader contract: shard k always holds
    // the same docs, and a reader opens only its own directory
    // (partition pruning; proven in SourcesSpec).
    QueryDef("p18_shard_manifest",
      """SELECT
        |  CAST((strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1) % 8 AS BIGINT) AS shard,
        |  CAST(COUNT(*) AS BIGINT) AS n_docs,
        |  CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
        |  MIN(doc_id) AS min_doc, MAX(doc_id) AS max_doc
        |FROM documents
        |GROUP BY 1 ORDER BY shard""".stripMargin) { (s, dir) =>
      Warehouse.documentsByShard(s, dir)
        .groupBy(col("shard").cast("long").as("shard"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_chars")).cast("bigint").as("sum_chars"),
          min(col("doc_id")).as("min_doc"),
          max(col("doc_id")).as("max_doc"))
        .orderBy("shard")
    },

    // ---- cross-source set-overlap estimation (KMV sketch algebra) ----
    // How much does source A's shingle set overlap source B's? The
    // scalable answer: ONE scan builds a bottom-k signature per source
    // (20×k longs), then all O(|sources|²) pair overlaps come from
    // signature merges alone — union by sketch merge, intersection by
    // inclusion-exclusion. The exact columns exist to AUDIT the
    // estimate (e7/p14 contract pattern: DuckDB recomputes the exact
    // values and expects within_tol = TRUE; xxhash64 sketches are not
    // oracle-reproducible).
    QueryDef("p20_source_overlap",
      """WITH sh AS (
        |  SELECT DISTINCT source,
        |    unnest(list_distinct(list_transform(range(1, greatest(length(text) - 4, 1) + 1),
        |      i -> substr(text, CAST(i AS INTEGER), 5)))) AS g
        |  FROM documents
        |), sizes AS (
        |  SELECT source, CAST(COUNT(*) AS BIGINT) AS sz FROM sh GROUP BY source
        |), pairs AS (
        |  SELECT a.source AS src_a, b.source AS src_b,
        |    CAST(COUNT(DISTINCT CASE WHEN x.source = a.source THEN x.g END)
        |      + COUNT(DISTINCT CASE WHEN x.source = b.source THEN x.g END)
        |      - COUNT(DISTINCT x.g) AS BIGINT) AS exact_inter,
        |    CAST(COUNT(DISTINCT x.g) AS BIGINT) AS exact_union
        |  FROM sizes a JOIN sizes b ON a.source < b.source
        |  JOIN sh x ON x.source IN (a.source, b.source)
        |  GROUP BY a.source, b.source
        |)
        |SELECT p.src_a, p.src_b, sa.sz AS exact_a, sb.sz AS exact_b,
        |  p.exact_union, p.exact_inter, TRUE AS within_tol
        |FROM pairs p
        |JOIN sizes sa ON p.src_a = sa.source
        |JOIN sizes sb ON p.src_b = sb.source
        |ORDER BY src_a, src_b""".stripMargin) { (s, dir) =>
      // exact audit via BITMASK aggregation (operators/Overlap): one
      // data-proportional bit_or shuffle; the S² pair fan-out happens
      // on the tiny distinct-mask table, never on the shingle rows —
      // see the Overlap scaladoc (the self-join formulation this
      // replaced lives in git history). The oracle still computes via
      // COUNT(DISTINCT CASE ...), so the two derivations are
      // cross-checked on every run.
      Overlap.sourceOverlapExact(Tables.documents(s, dir),
        TextOps.shingles("text"), k = 512)
    },

    // ---- corpus report card (the pipeline's summary artifact) ----
    // One scan answers the dataset-card questions per language: volume,
    // exact-dup mass (docs minus distinct fingerprints), quality-gate
    // pass rate (p11's thresholds, evaluated ROW-LOCALLY with HOFs so
    // no second explode+groupBy pass is needed), and token volume.
    // Rates in basis points (floor → integer, engine-portable).
    QueryDef("p23_corpus_report",
      """WITH d AS (
        |  SELECT lang, md5(text) AS fp, n_chars,
        |    len(regexp_extract_all(lower(text), '[a-z0-9]+')) AS n_words,
        |    len(list_distinct(regexp_extract_all(lower(text), '[a-z0-9]+'))) AS n_distinct,
        |    list_max(list_transform(list_distinct(regexp_extract_all(lower(text), '[a-z0-9]+')),
        |      w -> len(list_filter(regexp_extract_all(lower(text), '[a-z0-9]+'), x -> x = w)))) AS max_cnt
        |  FROM documents
        |)
        |SELECT lang,
        |  CAST(COUNT(*) AS BIGINT) AS n_docs,
        |  CAST(COUNT(DISTINCT fp) AS BIGINT) AS n_unique,
        |  CAST(floor(10000.0 * (COUNT(*) - COUNT(DISTINCT fp)) / COUNT(*)) AS BIGINT) AS dup_bp,
        |  CAST(floor(10000.0 * SUM(CASE WHEN n_words BETWEEN 30 AND 100000
        |    AND floor(10000.0 * max_cnt / n_words) < 2000
        |    AND floor(10000.0 * n_distinct / n_words) > 300 THEN 1 ELSE 0 END) / COUNT(*)) AS BIGINT) AS keep_bp,
        |  CAST(SUM(n_words) AS BIGINT) AS total_tokens,
        |  CAST(SUM(n_chars) AS BIGINT) AS total_chars
        |FROM d GROUP BY lang ORDER BY lang""".stripMargin) { (s, dir) =>
      val d = Tables.documents(s, dir).select(col("lang"),
        md5(col("text")).as("fp"), col("n_chars"),
        expr("size(regexp_extract_all(lower(text), '[a-z0-9]+', 0))").as("n_words"),
        expr("size(array_distinct(regexp_extract_all(lower(text), '[a-z0-9]+', 0)))").as("n_distinct"),
        expr("""array_max(transform(array_distinct(regexp_extract_all(lower(text), '[a-z0-9]+', 0)),
          w -> size(filter(regexp_extract_all(lower(text), '[a-z0-9]+', 0), x -> x = w))))""").as("max_cnt"))
      val keep = col("n_words").between(30, 100000) &&
        floor(lit(10000.0) * col("max_cnt") / col("n_words")) < 2000 &&
        floor(lit(10000.0) * col("n_distinct") / col("n_words")) > 300
      d.groupBy("lang")
        .agg(count(lit(1)).as("n_docs"),
          countDistinct(col("fp")).as("n_unique"),
          floor(lit(10000.0) * (count(lit(1)) - countDistinct(col("fp"))) /
            count(lit(1))).cast("long").as("dup_bp"),
          floor(lit(10000.0) * sum(when(keep, 1).otherwise(0)) /
            count(lit(1))).cast("long").as("keep_bp"),
          sum(col("n_words")).cast("long").as("total_tokens"),
          sum(col("n_chars")).cast("long").as("total_chars"))
        .orderBy("lang")
    },

    // ---- T5-style span corruption (masked-LM training prep) ----
    // Deterministic span masking: every 8th position starts a 3-token
    // masked span; the corrupted input keeps one sentinel per span and
    // the target string carries sentinel→span pairs (the seq2seq
    // denoising objective's input/label pair). Positions, not hashes,
    // drive the mask so both engines (and reruns) corrupt identically.
    // Pure row-local HOF work — zero shuffles, scan-speed at 100 TB,
    // the same narrow-transform shape as chunking (p12).
    QueryDef("p22_span_corruption",
      """WITH toks AS (
        |  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS t FROM documents
        |)
        |SELECT doc_id, CAST(len(t) AS BIGINT) AS n_tokens,
        |  array_to_string(list_filter(list_transform(list_zip(t, range(0, len(t))),
        |    p -> CASE WHEN (p[2] % 8) = 0 THEN '<X' || CAST(p[2] // 8 AS VARCHAR) || '>'
        |              WHEN (p[2] % 8) < 3 THEN ''
        |              ELSE p[1] END), x -> x != ''), ' ') AS corrupted,
        |  array_to_string(list_transform(range(0, (len(t) + 7) // 8),
        |    k -> '<X' || CAST(k AS VARCHAR) || '>'
        |      || array_to_string(t[k*8+1:least(k*8+3, len(t))], ' ')), '|') AS targets
        |FROM toks ORDER BY doc_id""".stripMargin) { (s, dir) =>
      Tables.documents(s, dir)
        .select(col("doc_id"),
          expr("regexp_extract_all(lower(text), '[a-z0-9]+', 0)").as("t"))
        .select(col("doc_id"),
          size(col("t")).cast("long").as("n_tokens"),
          expr("""array_join(filter(transform(t, (x, i) ->
            CASE WHEN i % 8 = 0 THEN concat('<X', CAST(i div 8 AS STRING), '>')
                 WHEN i % 8 < 3 THEN ''
                 ELSE x END), x -> x != ''), ' ')""").as("corrupted"),
          expr("""CASE WHEN size(t) > 0 THEN
              array_join(transform(sequence(0, (size(t) + 7) div 8 - 1),
                k -> concat('<X', CAST(k AS STRING), '>',
                  array_join(slice(t, k*8+1, 3), ' '))), '|')
            ELSE '' END""").as("targets"))
        .orderBy("doc_id")
    },

    // ---- deterministic systematic PPS sampling (weighted, per lang) ----
    // Probability-proportional-to-size selection without randomness:
    // per-lang cumulative weight intervals, one pick per k-th of the
    // total mass — a doc is selected iff its interval crosses a step
    // boundary. ALL-INTEGER arithmetic ((cum·k) div total strictly
    // increases across the row), so the pick set is bit-identical on
    // both engines — no pow/ln whose libm rounding could flip a
    // selection (the reason this is systematic PPS rather than
    // Efraimidis–Spirakis exponential keys). One window pass + one
    // broadcast of per-lang totals; ordering by doc_id makes the
    // sample reproducible run-over-run — the eval-set construction
    // contract.
    QueryDef("p21_pps_sample",
      """WITH w AS (
        |  SELECT doc_id, lang, n_chars AS wt,
        |    SUM(n_chars) OVER (PARTITION BY lang ORDER BY doc_id
        |      ROWS UNBOUNDED PRECEDING) AS cum,
        |    SUM(n_chars) OVER (PARTITION BY lang) AS total
        |  FROM documents
        |)
        |SELECT doc_id, lang, CAST(wt AS BIGINT) AS wt
        |FROM w
        |WHERE (cum * 10) // total > ((cum - wt) * 10) // total
        |ORDER BY doc_id""".stripMargin) { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val byDoc = Window.partitionBy("lang").orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val whole = Window.partitionBy("lang")
      Tables.documents(s, dir)
        .select(col("doc_id"), col("lang"), col("n_chars").as("wt"),
          sum(col("n_chars")).over(byDoc).as("cum"),
          sum(col("n_chars")).over(whole).as("total"))
        // `div`, not `/`+floor: long division stays exact at any scale
        // (double division is only floor-safe below 2^53)
        .where(expr("(cum * 10) div total > ((cum - wt) * 10) div total"))
        .select(col("doc_id"), col("lang"), col("wt").cast("long").as("wt"))
        .orderBy("doc_id")
    },

    // ---- per-stratum quantile normalization of a quality score ----
    // Raw quality scores aren't comparable across languages (length
    // distributions differ); training mixes threshold on the PER-LANG
    // percentile instead. percent_rank is (rank-1)/(n-1) in both
    // engines — tie-stable and bit-identical in double — floored to
    // basis points. Deliberately NO global percentile column: an
    // unpartitioned window is a single-reducer sort at 100 TB; global
    // calibration belongs to a sampled sketch (e11's approx_percentile
    // contract), not an exact window.
    QueryDef("p19_quantile_norm",
      """SELECT doc_id, lang, n_chars,
        |  CAST(floor(10000.0 * percent_rank() OVER (PARTITION BY lang ORDER BY n_chars)) AS BIGINT) AS lang_pctl_bp,
        |  percent_rank() OVER (PARTITION BY lang ORDER BY n_chars) >= 0.9 AS top_decile
        |FROM documents ORDER BY doc_id""".stripMargin) { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("lang").orderBy("n_chars")
      Tables.documents(s, dir)
        .select(col("doc_id"), col("lang"), col("n_chars"),
          floor(lit(10000.0) * percent_rank().over(w)).cast("long")
            .as("lang_pctl_bp"),
          (percent_rank().over(w) >= 0.9).as("top_decile"))
        .orderBy("doc_id")
    },

    // ---- LM-based document quality scoring (CCNet-style filter) ----
    // The standard web-corpus quality gate (Wenzek et al., "CCNet:
    // Extracting High Quality Monolingual Datasets from Web Crawl
    // Data", LREC 2020) scores each document under an n-gram language
    // model and keeps the fluent tail. Here the p8 bigram LM (support
    // cut n ≥ 20) scores its own corpus: per document, the bigram
    // count, how many hit the LM, and the summed/mean LM probability.
    // Scores are integer-quantized per bigram (floor(P(w2|w1)·10⁶);
    // P itself is ONE bigint/bigint double division) BEFORE the
    // per-document sum, so aggregation is exact bigint arithmetic and
    // the only double in the output, avg_q = sum_q/n_big, is a single
    // correctly-rounded IEEE division — cross-engine deterministic,
    // with log/exp (engine-varying transcendentals) deliberately kept
    // out of the checked surface.
    //
    // Shape: the exploded-bigram table is scanned twice (once to fit
    // the LM, once as the probe side) — at 100 TB the LM is fitted
    // once on a sample/reference corpus and PERSISTED, so the scoring
    // pass is the only full scan. The fitted LM after the support cut
    // is frequent-bigram-bounded (≪ corpus), hence broadcast; a
    // vocab-explosive LM would swap to a shuffle join on (w1, w2)
    // with no other change.
    //
    // Two measured Generate traps shape the Spark side (r11/r12):
    //  - the original posexplode carried the WHOLE token array through
    //    the Generate so `element_at(ts, pos+2)` could read it — every
    //    bigram row serialized a copy of its doc's full array, O(n²)
    //    bytes per doc (r12 profile: 2.9 s of the 3.2 s total);
    //  - a zip_with bigram array INLINED into Generate re-evaluates
    //    the HOF per OUTPUT row (the d24 trap). So the bigram-struct
    //    array is built in one projection and localCheckpoint'd, and
    //    both consumers (LM fit + probe) explode the materialized
    //    column — one regexp pass, one HOF eval, linear bytes.
    QueryDef("p24_lm_doc_quality",
      """WITH toks AS (
        |  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS ts FROM documents
        |), big AS (
        |  SELECT doc_id, ts[i] AS w1, ts[i + 1] AS w2
        |  FROM toks, unnest(range(1, len(ts))) AS u(i)
        |), grouped AS (
        |  SELECT w1, w2, COUNT(*) AS n,
        |    CAST(COUNT(*) AS DOUBLE) / SUM(COUNT(*)) OVER (PARTITION BY w1) AS p_cond
        |  FROM big GROUP BY w1, w2
        |), lm AS (
        |  SELECT w1, w2, CAST(floor(p_cond * 1000000) AS BIGINT) AS pq
        |  FROM grouped WHERE n >= 20
        |), scored AS (
        |  SELECT b.doc_id, COUNT(*) AS n_big, COUNT(lm.pq) AS n_hit,
        |    COALESCE(SUM(lm.pq), 0) AS sum_q
        |  FROM big b LEFT JOIN lm ON b.w1 = lm.w1 AND b.w2 = lm.w2
        |  GROUP BY b.doc_id
        |)
        |SELECT d.doc_id,
        |  CAST(COALESCE(s.n_big, 0) AS BIGINT) AS n_big,
        |  CAST(COALESCE(s.n_hit, 0) AS BIGINT) AS n_hit,
        |  CAST(COALESCE(s.sum_q, 0) AS BIGINT) AS sum_q,
        |  CASE WHEN s.n_big > 0 THEN CAST(s.sum_q AS DOUBLE) / s.n_big END AS avg_q
        |FROM documents d LEFT JOIN scored s ON d.doc_id = s.doc_id
        |ORDER BY d.doc_id""".stripMargin) { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val docs = Tables.documents(s, dir)
      val cpBig = docs
        .select(col("doc_id"),
          expr("regexp_extract_all(lower(text), '[a-z0-9]+', 0)").as("ts"))
        .select(col("doc_id"), expr(
          """zip_with(slice(ts, 1, greatest(size(ts) - 1, 0)),
            |         slice(ts, 2, greatest(size(ts) - 1, 0)),
            |         (a, b) -> struct(a AS w1, b AS w2))""".stripMargin)
          .as("bgs"))
        .localCheckpoint()
      val big = cpBig
        .select(col("doc_id"), explode(col("bgs")).as("bg"))
        .select(col("doc_id"), col("bg.w1").as("w1"), col("bg.w2").as("w2"))
      val lm = big.groupBy("w1", "w2").agg(count(lit(1)).as("n"))
        .withColumn("p_cond", col("n").cast("double") /
          sum("n").over(Window.partitionBy("w1")).cast("double"))
        .where(col("n") >= 20)
        .select(col("w1"), col("w2"),
          floor(col("p_cond") * lit(1000000.0)).cast("long").as("pq"))
      val scored = big.join(broadcast(lm), Seq("w1", "w2"), "left")
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_big"), count(col("pq")).as("n_hit"),
          coalesce(sum(col("pq")), lit(0L)).as("sum_q"))
      docs.select(col("doc_id"))
        .join(scored, Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("n_big"), lit(0L)).cast("long").as("n_big"),
          coalesce(col("n_hit"), lit(0L)).cast("long").as("n_hit"),
          coalesce(col("sum_q"), lit(0L)).cast("long").as("sum_q"),
          when(col("n_big") > 0,
            col("sum_q").cast("double") / col("n_big")).as("avg_q"))
        .orderBy("doc_id")
    },

    // ---- referential-integrity audit (FK orphan sweep) ----
    // Completes the data-quality trio (v1 value constraints, v2
    // column profile): every declared FK edge of the star schema gets
    // an orphan count. Scale discipline (the r12 fix — the per-edge
    // form scanned lineitem once per outgoing edge, 34x DuckDB at
    // sf1): every table is scanned EXACTLY ONCE per side. A child
    // table with k outgoing edges emits its k FK columns through one
    // stack() Expand — partial aggregation collapses the expanded
    // rows to distinct (edge, key) pairs BEFORE the single exchange,
    // so the shuffle is bounded by distinct keys, not fact rows.
    // Parents contribute (edge, key) sets the same way (nation backs
    // two edges through one stack), and ONE left join on (fk, k)
    // resolves all six edges at once; the per-key counts carried
    // through the join recover exact row/orphan totals in a final
    // edge-count-sized aggregate. At 100 TB this is one pass over
    // each fact, one key-bounded shuffle, one join — adding an FK
    // edge to an already-scanned table costs an Expand row, not a
    // scan. NULL child keys count as orphans on both engines (LEFT
    // JOIN semantics, deliberately NOT the NOT-IN formulation whose
    // NULL behavior silently drops rows).
    QueryDef("v3_fk_orphans", {
      def edge(fk: String, child: String, ck: String,
          parent: String, pk: String): String =
        s"""SELECT '$fk' AS fk, CAST(SUM(c.cnt) AS BIGINT) AS n_rows,
           |  CAST(COALESCE(SUM(CASE WHEN p.k IS NULL THEN c.cnt END), 0) AS BIGINT) AS n_orphans
           |FROM (SELECT $ck AS k, COUNT(*) AS cnt FROM $child GROUP BY 1) c
           |LEFT JOIN (SELECT DISTINCT $pk AS k FROM $parent) p ON c.k = p.k""".stripMargin
      Seq(
        edge("customer.c_nationkey->nation", "customer", "c_nationkey", "nation", "n_nationkey"),
        edge("lineitem.l_orderkey->orders", "lineitem", "l_orderkey", "orders", "o_orderkey"),
        edge("lineitem.l_suppkey->supplier", "lineitem", "l_suppkey", "supplier", "s_suppkey"),
        edge("nation.n_regionkey->region", "nation", "n_regionkey", "region", "r_regionkey"),
        edge("orders.o_custkey->customer", "orders", "o_custkey", "customer", "c_custkey"),
        edge("supplier.s_nationkey->nation", "supplier", "s_nationkey", "nation", "n_nationkey"))
        .mkString("", "\nUNION ALL\n", "\nORDER BY fk")
    }) { (s, dir) =>
      import org.apache.spark.sql.DataFrame
      // One scan per child table; k edges ride one stack() Expand.
      def childSide(df: DataFrame, edges: Seq[(String, String)]): DataFrame = {
        val stackArgs = edges
          .map { case (fk, ck) => s"'$fk', CAST($ck AS BIGINT)" }
          .mkString(", ")
        df.selectExpr(s"stack(${edges.size}, $stackArgs) AS (fk, k)")
      }
      def parentSide(df: DataFrame, edges: Seq[(String, String)]): DataFrame = {
        val stackArgs = edges
          .map { case (fk, pk) => s"'$fk', CAST($pk AS BIGINT)" }
          .mkString(", ")
        df.selectExpr(s"stack(${edges.size}, $stackArgs) AS (fk, k)")
      }
      val childKeys = Seq(
        childSide(Tables.lineitem(s, dir), Seq(
          "lineitem.l_orderkey->orders" -> "l_orderkey",
          "lineitem.l_suppkey->supplier" -> "l_suppkey")),
        childSide(Tables.customer(s, dir),
          Seq("customer.c_nationkey->nation" -> "c_nationkey")),
        childSide(Tables.nation(s, dir),
          Seq("nation.n_regionkey->region" -> "n_regionkey")),
        childSide(Tables.orders(s, dir),
          Seq("orders.o_custkey->customer" -> "o_custkey")),
        childSide(Tables.supplier(s, dir),
          Seq("supplier.s_nationkey->nation" -> "s_nationkey")))
        .reduce(_ unionAll _)
        .groupBy("fk", "k").agg(count(lit(1)).as("cnt"))
      val parentKeys = Seq(
        parentSide(Tables.orders(s, dir),
          Seq("lineitem.l_orderkey->orders" -> "o_orderkey")),
        parentSide(Tables.supplier(s, dir),
          Seq("lineitem.l_suppkey->supplier" -> "s_suppkey")),
        parentSide(Tables.nation(s, dir), Seq(
          "customer.c_nationkey->nation" -> "n_nationkey",
          "supplier.s_nationkey->nation" -> "n_nationkey")),
        parentSide(Tables.region(s, dir),
          Seq("nation.n_regionkey->region" -> "r_regionkey")),
        parentSide(Tables.customer(s, dir),
          Seq("orders.o_custkey->customer" -> "c_custkey")))
        .reduce(_ unionAll _)
        .distinct()
        .withColumn("hit", lit(1))
      val agg = childKeys.join(parentKeys, Seq("fk", "k"), "left")
        .groupBy("fk")
        .agg(sum(col("cnt")).cast("long").as("n_rows"),
          coalesce(sum(when(col("hit").isNull, col("cnt"))), lit(0L))
            .cast("long").as("n_orphans"))
      // Edge-complete output: the oracle's per-edge UNGROUPED aggregate
      // emits a row even when the child table is empty (n_rows NULL,
      // n_orphans 0), but a bare groupBy("fk") would drop the edge —
      // so anchor the aggregate on the declared 6-edge frame. Control-
      // plane sized (6 literal rows), no extra exchange at any scale.
      import s.implicits._
      Seq("customer.c_nationkey->nation", "lineitem.l_orderkey->orders",
        "lineitem.l_suppkey->supplier", "nation.n_regionkey->region",
        "orders.o_custkey->customer", "supplier.s_nationkey->nation")
        .toDF("fk")
        .join(agg, Seq("fk"), "left")
        .select(col("fk"), col("n_rows"),
          coalesce(col("n_orphans"), lit(0L)).as("n_orphans"))
        .orderBy("fk")
    },

    // ---- leakage-controlled train/validation split ----
    // The classic eval-contamination trap: hash-splitting DOCUMENTS
    // puts exact duplicates on both sides of the split, leaking
    // training content into validation. The fix is to split by
    // DUPLICATE GROUP — every doc inherits its group representative
    // (min doc_id of its md5(text) class), and the 90/10 assignment
    // hashes the REP, so a whole duplicate class always lands on one
    // side. Same auditable-membership discipline as p2/p7 (split is a
    // pure function of content, composable, reproducible); one
    // content-hash-keyed window is the only exchange. The scale-up
    // for NEAR-dup leakage control swaps the md5 class for the
    // d10/d11 connected-component cluster_id — already declared ops.
    QueryDef("p25_leakage_split",
      """WITH groups AS (
        |  SELECT doc_id, MIN(doc_id) OVER (PARTITION BY md5(text)) AS rep
        |  FROM documents
        |)
        |SELECT doc_id, CAST(rep AS BIGINT) AS rep,
        |  CASE WHEN substr(md5(CAST(rep AS VARCHAR)), 1, 4) < 'e666'
        |       THEN 'train' ELSE 'val' END AS split
        |FROM groups ORDER BY doc_id""".stripMargin) { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      Tables.documents(s, dir)
        .select(col("doc_id"),
          min(col("doc_id")).over(Window.partitionBy(md5(col("text"))))
            .as("rep"))
        .select(col("doc_id"), col("rep").cast("long").as("rep"),
          when(substring(md5(col("rep").cast("string")), 1, 4) < "e666",
            "train").otherwise("val").as("split"))
        .orderBy("doc_id")
    },

    // ---- relational BPE: train 8 merges, encode the corpus ----
    // Subword tokenization with NO imperative merge loop hidden in a
    // UDF: vocabulary-level character state, per round one weighted
    // pair count + deterministic argmax (count DESC, then
    // lexicographic pair) + greedy left-to-right application as
    // gaps-and-islands window arithmetic (operators/Bpe.scala). The
    // oracle replays all 8 rounds as chained CTEs with the IDENTICAL
    // window expressions (bpeOracleCtes, shared with p29), then both
    // sides encode the corpus by joining doc words onto the trained
    // segmentation (vocab-sized → broadcast; the corpus scan never
    // reshuffles). Output: per-doc whitespace-word vs subword counts
    // and the compression ratio in basis points — the honest units
    // p13's packing and p23's token reporting would use at scale.
    QueryDef("p26_bpe_encode",
      bpeOracleCtes +
        """, perdoc AS (
          |  SELECT dw.doc_id, CAST(COUNT(*) AS BIGINT) AS n_words,
          |    CAST(SUM(e.n_sub) AS BIGINT) AS n_subwords
          |  FROM docw dw JOIN enc e ON dw.w = e.w GROUP BY dw.doc_id
          |)
          |SELECT d.doc_id,
          |  CAST(COALESCE(p.n_words, 0) AS BIGINT) AS n_words,
          |  CAST(COALESCE(p.n_subwords, 0) AS BIGINT) AS n_subwords,
          |  CAST(CASE WHEN COALESCE(p.n_words, 0) > 0
          |    THEN floor(10000.0 * p.n_subwords / p.n_words) ELSE 0 END AS BIGINT) AS ratio_bp
          |FROM documents d LEFT JOIN perdoc p ON d.doc_id = p.doc_id
          |ORDER BY d.doc_id""".stripMargin) { (s, dir) =>
      val docw = Tables.documents(s, dir).select(col("doc_id"),
        explode(expr("regexp_extract_all(lower(text), '[a-z0-9]+', 0)")).as("w"))
      val perdoc = docw
        .join(broadcast(bpeEnc(s, dir)), Seq("w"))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_words"), sum("n_sub").as("n_subwords"))
      Tables.documents(s, dir).select(col("doc_id"))
        .join(perdoc, Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("n_words"), lit(0L)).as("n_words"),
          coalesce(col("n_subwords"), lit(0L)).as("n_subwords"),
          when(coalesce(col("n_words"), lit(0L)) > 0,
            floor(lit(10000.0) * col("n_subwords") / col("n_words")).cast("long"))
            .otherwise(lit(0L)).as("ratio_bp"))
        .orderBy("doc_id")
    },

    // ---- tokenizer fertility audit (per-language tokenizer QA) ----
    // The acceptance gate a training pipeline runs on a tokenizer
    // before committing a corpus to it: per language, words seen,
    // subword tokens the trained BPE vocab produces for them
    // (fertility = tokens/word, the standard multilingual-tokenizer
    // quality number), and characters per token (compression). A
    // fertility spike on one language is how under-trained vocabs
    // are caught; byte-budget planning (tokens ≈ chars /
    // chars_per_token) comes straight off this table. Reuses p26's
    // memoized trained segmentation (one vocab-level train per sf,
    // broadcast everywhere): the per-language rollup adds ONE
    // fact-side groupBy over the word stream — map-combined to
    // |langs| rows, nothing new materializes. Integer basis points
    // (floor of a double ratio, the p26 idiom) keep it engine-exact.
    QueryDef("p38_token_fertility",
      bpeOracleCtes +
        """, per AS (
          |  SELECT dw.lang, CAST(COUNT(*) AS BIGINT) AS n_words,
          |    CAST(SUM(e.n_sub) AS BIGINT) AS n_subwords,
          |    CAST(SUM(len(dw.w)) AS BIGINT) AS n_chars
          |  FROM docw dw JOIN enc e ON dw.w = e.w GROUP BY dw.lang
          |)
          |SELECT lang, n_words, n_subwords, n_chars,
          |  CAST(floor(10000.0 * n_subwords / n_words) AS BIGINT) AS fertility_bp,
          |  CAST(floor(100.0 * n_chars / n_subwords) AS BIGINT) AS chars_per_token_c
          |FROM per ORDER BY lang""".stripMargin) { (s, dir) =>
      Tables.documents(s, dir)
        .select(col("lang"),
          explode(expr("regexp_extract_all(lower(text), '[a-z0-9]+', 0)")).as("w"))
        .join(broadcast(bpeEnc(s, dir)), Seq("w"))
        .groupBy("lang")
        .agg(count(lit(1)).as("n_words"), sum("n_sub").as("n_subwords"),
          sum(length(col("w"))).as("n_chars"))
        .select(col("lang"), col("n_words"), col("n_subwords"), col("n_chars"),
          floor(lit(10000.0) * col("n_subwords") / col("n_words"))
            .cast("long").as("fertility_bp"),
          floor(lit(100.0) * col("n_chars") / col("n_subwords"))
            .cast("long").as("chars_per_token_c"))
        .orderBy("lang")
    },

    // ---- sequence packing in SUBWORD units (p13 × p26) ----
    // p13 packs training sequences by whitespace-token budget; real
    // LLM context budgets are subword budgets, so this packs the same
    // greedy cumulative bins over the BPE-encoded length from the
    // shared trained segmentation (bpeEnc — one broadcast join puts
    // n_sub on every corpus word, one aggregate gives per-doc subword
    // counts). Stratified by (lang, source) exactly like p13: the
    // running-sum window partitions by stratum, so packing
    // parallelizes across strata and no global sort exists — at
    // 100 TB the stratum key would also carry a date bucket. Docs
    // with no [a-z0-9] words have zero budget cost and are excluded
    // (inner join), matching the oracle's join semantics.
    QueryDef("p29_pack_bpe_budget",
      bpeOracleCtes +
        """, perdoc AS (
          |  SELECT dw.doc_id, dw.lang, dw.source,
          |    CAST(SUM(e.n_sub) AS BIGINT) AS n_btok
          |  FROM docw dw JOIN enc e ON dw.w = e.w
          |  GROUP BY dw.doc_id, dw.lang, dw.source
          |), c AS (
          |  SELECT doc_id, lang, source, n_btok,
          |    CAST(COALESCE(SUM(n_btok) OVER (PARTITION BY lang, source ORDER BY doc_id
          |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS cum_prev
          |  FROM perdoc
          |)
          |SELECT lang, source, CAST(cum_prev // 4096 AS BIGINT) AS bin_id,
          |  CAST(COUNT(*) AS BIGINT) AS n_docs,
          |  CAST(SUM(n_btok) AS BIGINT) AS bin_tokens,
          |  MIN(doc_id) AS first_doc, MAX(doc_id) AS last_doc
          |FROM c GROUP BY lang, source, bin_id
          |ORDER BY lang, source, bin_id""".stripMargin) { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val docw = Tables.documents(s, dir).select(
        col("doc_id"), col("lang"), col("source"),
        explode(expr("regexp_extract_all(lower(text), '[a-z0-9]+', 0)")).as("w"))
      val perdoc = docw
        .join(broadcast(bpeEnc(s, dir)), Seq("w"))
        .groupBy("doc_id", "lang", "source")
        .agg(sum("n_sub").as("n_btok"))
      val w = Window.partitionBy("lang", "source").orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
      perdoc.withColumn("cum_prev", coalesce(sum("n_btok").over(w), lit(0L)))
        .withColumn("bin_id", floor(col("cum_prev") / lit(4096)).cast("long"))
        .groupBy("lang", "source", "bin_id")
        .agg(count(lit(1)).as("n_docs"), sum("n_btok").as("bin_tokens"),
          min("doc_id").as("first_doc"), max("doc_id").as("last_doc"))
        .orderBy("lang", "source", "bin_id")
    },

    // ---- corpus snapshot diff (dataset versioning audit) ----
    // The between-releases report every curated dataset needs: which
    // docs were added, removed, or edited from snapshot v1 to v2, by
    // content hash, rolled up per source. Snapshots are derived
    // deterministically from the one corpus so the oracle replays
    // them byte-identically: v1 drops doc_id % 11 = 0 (later
    // additions) and carries an old revision for doc_id % 13 = 0
    // (later edits, simulated by a prefix marker); v2 is the corpus
    // as shipped. Shape: two filter-partitioned scans, ONE key-hash
    // FULL OUTER join (q43's merge skeleton read-only), md5
    // comparison, source × status rollup — dim-sized output, no
    // funnel. At 100 TB the snapshots are two manifests/tables
    // bucketed by doc_id and the join is exchange-free.
    QueryDef("p30_snapshot_diff",
      """WITH v1 AS (
        |  SELECT doc_id, source,
        |    md5(CASE WHEN doc_id % 13 = 0 THEN 'rev0 ' || text ELSE text END) AS h
        |  FROM documents WHERE doc_id % 11 != 0
        |), v2 AS (
        |  SELECT doc_id, source, md5(text) AS h FROM documents
        |), d AS (
        |  SELECT COALESCE(v2.source, v1.source) AS source,
        |    CASE WHEN v1.doc_id IS NULL THEN 'added'
        |         WHEN v2.doc_id IS NULL THEN 'removed'
        |         WHEN v1.h != v2.h THEN 'changed'
        |         ELSE 'unchanged' END AS status
        |  FROM v1 FULL OUTER JOIN v2 ON v2.doc_id = v1.doc_id
        |)
        |SELECT source, status, CAST(COUNT(*) AS BIGINT) AS n_docs
        |FROM d GROUP BY source, status
        |ORDER BY source, status""".stripMargin) { (s, dir) =>
      val docs = Tables.documents(s, dir)
      val v1 = docs.where(col("doc_id") % 11 =!= 0)
        .select(col("doc_id"), col("source"),
          md5(when(col("doc_id") % 13 === 0, concat(lit("rev0 "), col("text")))
            .otherwise(col("text"))).as("h"))
      val v2 = docs.select(col("doc_id").as("d2_id"), col("source").as("d2_src"),
        md5(col("text")).as("h2"))
      v1.join(v2, col("d2_id") === col("doc_id"), "full_outer")
        .select(coalesce(col("d2_src"), col("source")).as("source"),
          when(col("doc_id").isNull, "added")
            .when(col("d2_id").isNull, "removed")
            .when(col("h") =!= col("h2"), "changed")
            .otherwise("unchanged").as("status"))
        .groupBy("source", "status").agg(count(lit(1)).as("n_docs"))
        .orderBy("source", "status")
    },

    // ---- DSIR-style importance-weighted data selection ----
    // Data Selection via Importance Resampling (Xie et al. 2023):
    // score every candidate document by how target-like its token
    // distribution is, then keep the top slice. Target here = the
    // English stratum; candidates = everything else. Per token w the
    // weight is the add-1-smoothed likelihood ratio (tc+1)/(rc+1),
    // UNNORMALIZED — the ttot/rtot normalization constants are the
    // same for every gram, so they drop out of the per-doc ranking,
    // which removes both the 1-row scalar broadcasts AND the bigint
    // overflow a (tc+1)·rtot product would hit at real corpus sizes.
    // Quantized ×1e6 into integer `div` arithmetic (the repo's
    // engine-reproducible-numerics discipline — DSIR's float
    // log-ratio sum is not bit-stable across engines); per-doc score
    // = mean quantized ratio over the doc's tokens. Scale shape: two
    // vocab-keyed groupBys with map-side combine, a vocab-sized
    // LEFT join (shuffle, NOT broadcast — vocab grows with the
    // corpus), the candidate token stream joining on w then
    // aggregating on doc_id, and a TakeOrdered top-k — no all-pairs,
    // no driver state, no scalar subqueries.
    QueryDef("p27_dsir_select",
      """WITH toks AS (
        |  SELECT doc_id, lang, source,
        |    unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS w
        |  FROM documents
        |), tcnt AS (
        |  SELECT w, COUNT(*) AS tc FROM toks WHERE lang = 'en' GROUP BY w
        |), rcnt AS (
        |  SELECT w, COUNT(*) AS rc FROM toks WHERE lang != 'en' GROUP BY w
        |), score AS (
        |  SELECT r.w,
        |    (1000000 * (COALESCE(t.tc, 0) + 1)) // (r.rc + 1) AS q
        |  FROM rcnt r LEFT JOIN tcnt t ON r.w = t.w
        |), perdoc AS (
        |  SELECT tk.doc_id, CAST(COUNT(*) AS BIGINT) AS n_toks,
        |    CAST(SUM(sc.q) // COUNT(*) AS BIGINT) AS imp_q
        |  FROM toks tk JOIN score sc ON tk.w = sc.w
        |  WHERE tk.lang != 'en' GROUP BY tk.doc_id
        |)
        |SELECT p.doc_id, d.lang, d.source, p.n_toks, p.imp_q
        |FROM perdoc p JOIN documents d ON p.doc_id = d.doc_id
        |ORDER BY p.imp_q DESC, p.doc_id LIMIT 100""".stripMargin) { (s, dir) =>
      val docs = Tables.documents(s, dir)
      val toks = docs.select(col("doc_id"), col("lang"),
        explode(Curation.tokens(col("text"))).as("w"))
      val tcnt = toks.where(col("lang") === "en")
        .groupBy("w").agg(count(lit(1)).as("tc"))
      val rcnt = toks.where(col("lang") =!= "en")
        .groupBy("w").agg(count(lit(1)).as("rc"))
      val score = rcnt.join(tcnt, Seq("w"), "left")
        .select(col("w"),
          expr("(1000000 * (COALESCE(tc, 0) + 1)) div (rc + 1)").as("q"))
      val perdoc = toks.where(col("lang") =!= "en").select("doc_id", "w")
        .join(score, Seq("w"))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_toks"), sum("q").as("sq"))
        .select(col("doc_id"), col("n_toks"), expr("sq div n_toks").as("imp_q"))
      perdoc.join(docs.select("doc_id", "lang", "source"), Seq("doc_id"))
        .select("doc_id", "lang", "source", "n_toks", "imp_q")
        .orderBy(col("imp_q").desc, col("doc_id")).limit(100)
    },

    // ---- n-gram novelty scoring (ingest-order content contribution) ----
    // How much NEW content does each document contribute, in arrival
    // (doc_id) order? A doc's distinct 8-token grams are "novel" iff
    // no earlier doc (lower doc_id) contains them — i.e. the gram's
    // corpus-wide MIN(doc_id) is this doc. The per-doc novel share is
    // the curriculum/dedup-aware complement of d20: d20 finds the
    // copied REGIONS, this ranks docs by marginal contribution (the
    // signal behind "process high-novelty sources first" scheduling
    // and diminishing-returns curves). Scale shape: distinct (doc,
    // gram) pairs → one groupBy(g) keeping (min_doc, per-gram use) —
    // map-side combined — then the doc rollup needs NO second join:
    // novel count = count of grams where min_doc = doc_id, total =
    // the doc's distinct grams, both from one (g → min_doc) pass
    // re-joined on g. Integer basis points (div) — engine-portable.
    QueryDef("p28_novelty_score",
      """WITH dg AS (
        |  SELECT DISTINCT doc_id, g FROM (
        |    SELECT tk.doc_id, array_to_string(list_slice(tk.t, CAST(i AS INTEGER), CAST(i + 7 AS INTEGER)), ' ') AS g
        |    FROM (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS t FROM documents) tk,
        |      unnest(range(1, greatest(len(tk.t) - 7, 0) + 1)) AS u(i))
        |), fg AS (
        |  SELECT g, MIN(doc_id) AS first_doc FROM dg GROUP BY g
        |)
        |SELECT dg.doc_id,
        |  CAST(COUNT(*) AS BIGINT) AS n_grams,
        |  CAST(SUM(CASE WHEN fg.first_doc = dg.doc_id THEN 1 ELSE 0 END) AS BIGINT) AS n_novel,
        |  CAST((10000 * SUM(CASE WHEN fg.first_doc = dg.doc_id THEN 1 ELSE 0 END)) // COUNT(*) AS BIGINT) AS novel_bp
        |FROM dg JOIN fg ON dg.g = fg.g
        |GROUP BY dg.doc_id ORDER BY dg.doc_id""".stripMargin) { (s, dir) =>
      // No dg ⋈ fg join back on g: a gram contributes to exactly one
      // doc's novel count (its min_doc), so the novel tally is a
      // second aggregate OF the min-doc table — per-doc totals and
      // per-doc novel counts are both doc-keyed dim-sized frames and
      // join on doc_id. Saves the gram-keyed join that would carry
      // the full (doc, gram) stream a second time (measured 3.7 s →
      // ~1 s at sf0.1). r16 (the r14 verdict's one-pass idea,
      // landed, 3.30 → 2.90 s at sf1): the dedup exchange is keyed
      // by g ALONE — HashPartitioning(g) satisfies the (g, doc_id)
      // clustering the dedup aggregate requires (same g ⇒ same
      // partition ⇒ same pair co-located), so the dedup runs IN
      // PLACE and the novel path's groupBy(g) needs no further
      // exchange; the totals path's per-doc partials collapse
      // map-side. No checkpoint, no distinct exchange, no pair
      // re-exchange on g. Plan reality (executed-plan audited):
      // Catalyst drops the dedup under the duplicate-insensitive
      // min(), so the two branches differ and each plans its own
      // explode + Exchange(g) — exchange reuse does NOT fire; that
      // is still cheaper than materializing (r15's checkpoint form
      // 3.30 s; a countDistinct no-sharing variant measured 3.74 s —
      // the explode is cheap, materialization and extra pair
      // exchanges are not).
      val dg = Tables.documents(s, dir)
        .select(col("doc_id"),
          explode(Curation.wordGrams(Curation.tokens(col("text")), 8)).as("g"))
        .repartition(col("g"))
        .dropDuplicates("g", "doc_id")
      val totals = dg.groupBy("doc_id").agg(count(lit(1)).as("n_grams"))
      val novel = dg.groupBy("g").agg(min("doc_id").as("doc_id"))
        .groupBy("doc_id").agg(count(lit(1)).as("n_novel"))
      totals.join(novel, Seq("doc_id"), "left")
        .select(col("doc_id"), col("n_grams"),
          coalesce(col("n_novel"), lit(0L)).as("n_novel"),
          expr("(10000 * coalesce(n_novel, 0L)) div n_grams").as("novel_bp"))
        .orderBy("doc_id")
    },

    // ---- domain mixture weights (DoReMi-lite largest-remainder) ----
    // The source-level sampling-weight assignment a mixture trainer
    // consumes: each source's weight grows with its EXCESS quality
    // signal over the corpus mean (proxy here: mean tokens per doc,
    // millitoken-quantized — swap in any per-doc score), then the
    // 10000 basis points are apportioned by LARGEST-REMAINDER rounding
    // so the weights sum to exactly 10000 — integer-exact in both
    // engines (no float softmax). Scale shape: one fact-side groupBy
    // to |sources| rows; everything after (1-row totals, the rounding
    // window) is control-plane over the bounded source dim — the
    // single-partition window covers ~20 rows at any corpus size.
    QueryDef("p31_domain_weights",
      """WITH per AS (
        |  SELECT source, COUNT(*) AS n_docs,
        |    SUM(len(regexp_extract_all(text, '[A-Za-z0-9]+'))) AS sum_toks
        |  FROM documents GROUP BY source
        |), tot AS (
        |  SELECT SUM(n_docs) AS tn, SUM(sum_toks) AS ts FROM per
        |), scored AS (
        |  SELECT p.source, p.n_docs,
        |    (1000 * p.sum_toks) // p.n_docs AS mean_q,
        |    GREATEST((1000 * p.sum_toks) // p.n_docs - (1000 * t.ts) // t.tn, 0) AS excess_q
        |  FROM per p, tot t
        |), w AS (
        |  SELECT *, excess_q + 1000 AS wr FROM scored
        |), wt AS (
        |  SELECT SUM(wr) AS wt FROM w
        |), based AS (
        |  SELECT w.*, (10000 * w.wr) // wt.wt AS base_bp,
        |         (10000 * w.wr) % wt.wt AS rem
        |  FROM w, wt
        |), lo AS (
        |  SELECT 10000 - SUM(base_bp) AS leftover FROM based
        |)
        |SELECT b.source, CAST(b.n_docs AS BIGINT) AS n_docs,
        |  CAST(b.mean_q AS BIGINT) AS mean_q,
        |  CAST(b.excess_q AS BIGINT) AS excess_q,
        |  CAST(b.base_bp + CASE WHEN ROW_NUMBER() OVER (ORDER BY b.rem DESC, b.source) <= l.leftover
        |       THEN 1 ELSE 0 END AS BIGINT) AS weight_bp
        |FROM based b, lo l ORDER BY b.source""".stripMargin) { (s, dir) =>
      val per = Tables.documents(s, dir).groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          sum(TextOps.tokenCount("text")).as("sum_toks"))
      val tot = per.agg(sum("n_docs").as("tn"), sum("sum_toks").as("ts"))
      val scored = per.crossJoin(broadcast(tot))
        .withColumn("mean_q", expr("(1000 * sum_toks) div n_docs"))
        .withColumn("excess_q",
          greatest(col("mean_q") - expr("(1000 * ts) div tn"), lit(0L)))
        .withColumn("wr", col("excess_q") + lit(1000L))
      val wt = scored.agg(sum("wr").as("wt"))
      val based = scored.crossJoin(broadcast(wt))
        .withColumn("base_bp", expr("(10000 * wr) div wt"))
        .withColumn("rem", expr("(10000 * wr) % wt"))
      val lo = based.agg((lit(10000L) - sum("base_bp")).as("leftover"))
      val rkWin = org.apache.spark.sql.expressions.Window
        .orderBy(col("rem").desc, col("source")) // |sources| rows only
      based.crossJoin(broadcast(lo))
        .withColumn("rk", row_number().over(rkWin))
        .select(col("source"), col("n_docs"), col("mean_q"), col("excess_q"),
          (col("base_bp")
            + when(col("rk") <= col("leftover"), lit(1L)).otherwise(lit(0L)))
            .as("weight_bp"))
        .orderBy("source")
    },

    // ---- curriculum ordering (difficulty-stratified interleave) ----
    // Deterministic training-order assignment: docs stratify into
    // difficulty buckets (token count div 25, CLAMPED to 0..4 so the
    // 5-way stride below can never collide — an unclamped bucket ≥ 5
    // would alias into another bucket's slot), shuffle WITHIN
    // the bucket by a seeded md5 key, and interleave round-robin via
    // the CLOSED FORM pos = (rank_in_bucket − 1)·5 + bucket — every
    // batch window sees every difficulty stratum, no global sort ever
    // materializes the order. The within-bucket rank is the only
    // ranked stage; at 100 TB it runs as a range-partitioned sort per
    // bucket (Spark's native parallel sort shape) — the interleave
    // stays arithmetic either way. Slots are unique by construction;
    // short buckets leave gaps (a round-robin slot grid, not a dense
    // index — the consumer contract is ORDER BY pos).
    QueryDef("p32_curriculum_order",
      """WITH d AS (
        |  SELECT doc_id,
        |    LEAST(len(regexp_extract_all(text, '[A-Za-z0-9]+')) // 25, 4) AS bucket,
        |    md5('cur7' || CAST(doc_id AS VARCHAR)) AS hkey
        |  FROM documents
        |)
        |SELECT doc_id, CAST(bucket AS BIGINT) AS bucket,
        |  CAST((ROW_NUMBER() OVER (PARTITION BY bucket ORDER BY hkey, doc_id) - 1)
        |       * 5 + bucket AS BIGINT) AS curriculum_pos
        |FROM d ORDER BY curriculum_pos""".stripMargin) { (s, dir) =>
      val d = Tables.documents(s, dir)
        .withColumn("ntk", TextOps.tokenCount("text"))
        .select(
          col("doc_id"),
          least(expr("ntk div 25"), lit(4)).as("bucket"),
          md5(concat(lit("cur7"), col("doc_id").cast("string"))).as("hkey"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("bucket").orderBy("hkey", "doc_id")
      d.select(col("doc_id"), col("bucket").cast("long").as("bucket"),
          ((row_number().over(w) - 1) * lit(5) + col("bucket"))
            .cast("long").as("curriculum_pos"))
        .orderBy("curriculum_pos")
    },

    // ---- winsorized per-source profile (robust stats, exact quantiles) ----
    // Outlier-robust source statistics: exact p10/p90 of doc length per
    // source by VALUE-DOMAIN cumulation — per-(source, n_chars) counts,
    // a cumsum over the bounded length domain (≤ a few hundred distinct
    // values, NOT a row-rank over the corpus), rank-target pick — then
    // the winsorized mean clips every doc into [p10, p90] via a
    // broadcast of the 20-row quantile dim. All integer; the quantile
    // is the deterministic "value at 1-based rank (n−1)·q/100 + 1"
    // contract, identical in both engines. This is the exact-quantile
    // shape that scales: the only per-row work is two scans and a
    // groupBy; ranking happens on the value histogram.
    QueryDef("v4_robust_stats",
      """WITH per AS (
        |  SELECT source, n_chars, COUNT(*) AS cnt FROM documents GROUP BY 1, 2
        |), tot AS (
        |  SELECT source, SUM(cnt) AS n FROM per GROUP BY source
        |), cum AS (
        |  SELECT p.source, p.n_chars,
        |    SUM(p.cnt) OVER (PARTITION BY p.source ORDER BY p.n_chars) AS cm
        |  FROM per p
        |), q AS (
        |  SELECT c.source,
        |    MIN(CASE WHEN c.cm >= (t.n - 1) // 10 + 1 THEN c.n_chars END) AS p10,
        |    MIN(CASE WHEN c.cm >= ((t.n - 1) * 9) // 10 + 1 THEN c.n_chars END) AS p90
        |  FROM cum c JOIN tot t ON c.source = t.source GROUP BY c.source
        |)
        |SELECT d.source, CAST(t.n AS BIGINT) AS n_docs,
        |  CAST(q.p10 AS BIGINT) AS p10, CAST(q.p90 AS BIGINT) AS p90,
        |  CAST(SUM(LEAST(GREATEST(d.n_chars, q.p10), q.p90)) // t.n AS BIGINT) AS wmean
        |FROM documents d JOIN q ON d.source = q.source JOIN tot t ON d.source = t.source
        |GROUP BY d.source, t.n, q.p10, q.p90
        |ORDER BY d.source""".stripMargin) { (s, dir) =>
      val docs = Tables.documents(s, dir)
      val per = docs.groupBy("source", "n_chars").agg(count(lit(1)).as("cnt"))
      val tot = per.groupBy("source").agg(sum("cnt").as("n"))
      val cumW = org.apache.spark.sql.expressions.Window
        .partitionBy("source").orderBy("n_chars") // bounded value domain
      val cum = per.withColumn("cm", sum("cnt").over(cumW))
      val q = cum.join(tot, Seq("source"))
        .groupBy("source")
        .agg(
          min(when(col("cm") >= expr("(n - 1) div 10 + 1"), col("n_chars")))
            .as("p10"),
          min(when(col("cm") >= expr("((n - 1) * 9) div 10 + 1"), col("n_chars")))
            .as("p90"))
      docs.join(broadcast(q), Seq("source"))
        .join(broadcast(tot), Seq("source"))
        .withColumn("clipped",
          least(greatest(col("n_chars"), col("p10")), col("p90")))
        .groupBy("source")
        .agg(min("n").as("n_docs"), min("p10").as("p10"),
          min("p90").as("p90"), sum("clipped").as("sclip"))
        .select(col("source"), col("n_docs"), col("p10"), col("p90"),
          expr("sclip div n_docs").as("wmean"))
        .orderBy("source")
    },

    // ---- v5: MAD robust outlier gate (median absolute deviation) ----
    // The outlier detector that survives the outliers it hunts: per
    // source, med = exact lower median of doc length, mad = exact
    // lower median of |len − med|, outliers = docs beyond med ± 3·mad.
    // Unlike v4's winsorized mean this is fully median-based, so a
    // single pathological shard can't drag the gate. Exactness: both
    // medians use v4's VALUE-DOMAIN cumulation — per-(source, value)
    // counts, a cumsum window over the bounded value domain (hundreds
    // of distinct lengths, never corpus rows), the 1-based
    // rank-((n−1)//2+1) pick — all integer, hash-identical across
    // engines. Scale shape: two scans, two bounded-domain histograms,
    // one broadcast of the per-source (med, mad) dim; no row-rank
    // window ever touches corpus-sized data.
    QueryDef("v5_mad_outliers",
      """WITH per AS (
        |  SELECT source, n_chars AS v, COUNT(*) AS cnt FROM documents GROUP BY 1, 2
        |), tot AS (
        |  SELECT source, SUM(cnt) AS n FROM per GROUP BY source
        |), med AS (
        |  SELECT c.source, MIN(CASE WHEN c.cm >= (t.n - 1) // 2 + 1 THEN c.v END) AS med
        |  FROM (SELECT source, v,
        |          SUM(cnt) OVER (PARTITION BY source ORDER BY v) AS cm
        |        FROM per) c
        |  JOIN tot t ON c.source = t.source GROUP BY c.source
        |), dev AS (
        |  SELECT d.source, ABS(d.n_chars - m.med) AS v, COUNT(*) AS cnt
        |  FROM documents d JOIN med m ON d.source = m.source GROUP BY 1, 2
        |), mad AS (
        |  SELECT c.source, MIN(CASE WHEN c.cm >= (t.n - 1) // 2 + 1 THEN c.v END) AS mad
        |  FROM (SELECT source, v,
        |          SUM(cnt) OVER (PARTITION BY source ORDER BY v) AS cm
        |        FROM dev) c
        |  JOIN tot t ON c.source = t.source GROUP BY c.source
        |)
        |SELECT d.source, CAST(t.n AS BIGINT) AS n_docs,
        |  CAST(m.med AS BIGINT) AS med, CAST(a.mad AS BIGINT) AS mad,
        |  CAST(SUM(CASE WHEN ABS(d.n_chars - m.med) > 3 * a.mad THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
        |FROM documents d
        |JOIN med m ON d.source = m.source
        |JOIN mad a ON d.source = a.source
        |JOIN tot t ON d.source = t.source
        |GROUP BY d.source, t.n, m.med, a.mad
        |ORDER BY d.source""".stripMargin) { (s, dir) =>
      val docs = Tables.documents(s, dir)
      val cumW = org.apache.spark.sql.expressions.Window
        .partitionBy("source").orderBy("v") // bounded value domain
      // exact lower median by value-domain cumulation (v4's contract)
      def medianOf(vals: org.apache.spark.sql.DataFrame, out: String) = {
        val per = vals.groupBy("source", "v").agg(count(lit(1)).as("cnt"))
        val tot = per.groupBy("source").agg(sum("cnt").as("n"))
        per.withColumn("cm", sum("cnt").over(cumW))
          .join(broadcast(tot), Seq("source"))
          .groupBy("source")
          .agg(min(when(col("cm") >= expr("(n - 1) div 2 + 1"), col("v")))
            .as(out), min("n").as(s"${out}_n"))
      }
      val med = medianOf(docs.select(col("source"), col("n_chars").as("v")), "med")
      val dev = docs.join(broadcast(med), Seq("source"))
        .select(col("source"), abs(col("n_chars") - col("med")).as("v"))
      val mad = medianOf(dev, "mad")
      docs
        .join(broadcast(med), Seq("source"))
        .join(broadcast(mad), Seq("source"))
        .groupBy(col("source"), col("med_n").as("n_docs"), col("med"), col("mad"))
        .agg(sum(when(abs(col("n_chars") - col("med")) > lit(3) * col("mad"), 1L)
          .otherwise(0L)).as("n_outliers"))
        .select(col("source"), col("n_docs"), col("med"), col("mad"),
          col("n_outliers"))
        .orderBy("source")
    },

    // ---- isotonic calibration of a quality signal (PAV closed form) ----
    // Calibrates the cheap English-stopword signal (d4's ' the '
    // density, in bp of doc length) into a monotone P(lang='en')
    // estimate — the model-calibration step a filtering pipeline runs
    // before thresholding a learned quality score. Implementation is
    // the MINIMAX CLOSED FORM of isotonic regression (Barlow et al.
    // 1972): fitted(i) = max_{j<=i} min_{k>=i} avg(label | bucket in
    // [j,k]) — not the sequential pool-adjacent-violators loop, which
    // is inherently serial. Distributed shape: one scan buckets every
    // doc (16 buckets via LEAST(score_bp/12, 15)); everything after
    // the 16-row aggregate is control-plane arithmetic (a B² range
    // join + B³ minimax, B = 16 — the range joins are
    // broadcast-nested-loop over <=256-row inputs by construction).
    // Rates are in exact ppm (floor over doubles < 2^53 — IEEE-
    // identical in both engines); fitted_ppm is non-decreasing in
    // bucket BY CONSTRUCTION, which the spec asserts.
    QueryDef("p33_isotonic_calibration",
      """WITH d AS (
        |  SELECT CAST(floor(10000.0 * ((length(text) - length(replace(text, ' the ', ''))) / 5)
        |                / greatest(length(text), 1)) AS BIGINT) AS score_bp,
        |    CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS label
        |  FROM documents
        |), agg AS (
        |  SELECT least(CAST(floor(score_bp / 12.0) AS BIGINT), 15) AS bucket,
        |    CAST(COUNT(*) AS BIGINT) AS w, CAST(SUM(label) AS BIGINT) AS pos
        |  FROM d GROUP BY 1
        |), pre AS (
        |  SELECT bucket, w, pos,
        |    CAST(SUM(w) OVER (ORDER BY bucket) AS BIGINT) AS cw,
        |    CAST(SUM(pos) OVER (ORDER BY bucket) AS BIGINT) AS cp
        |  FROM agg
        |), pairs AS (
        |  SELECT j.bucket AS bj, k.bucket AS bk,
        |    CAST(floor(1000000.0 * (k.cp - (j.cp - j.pos))
        |         / (k.cw - (j.cw - j.w))) AS BIGINT) AS avg_ppm
        |  FROM pre j JOIN pre k ON j.bucket <= k.bucket
        |), tri AS (
        |  SELECT i.bucket AS b, p.bj, MIN(p.avg_ppm) AS mn
        |  FROM pre i JOIN pairs p ON p.bj <= i.bucket AND p.bk >= i.bucket
        |  GROUP BY i.bucket, p.bj
        |), fit AS (
        |  SELECT b AS bucket, CAST(MAX(mn) AS BIGINT) AS fitted_ppm
        |  FROM tri GROUP BY b
        |)
        |SELECT a.bucket, a.w AS n_docs, a.pos AS n_pos,
        |  CAST(floor(1000000.0 * a.pos / a.w) AS BIGINT) AS raw_ppm,
        |  f.fitted_ppm
        |FROM agg a JOIN fit f ON a.bucket = f.bucket
        |ORDER BY a.bucket""".stripMargin) { (s, dir) =>
      val d = Tables.documents(s, dir).select(
        floor(lit(10000.0)
          * ((length(col("text"))
              - length(expr("replace(text, ' the ', '')"))) / lit(5))
          / greatest(length(col("text")), lit(1))).cast("long").as("score_bp"),
        when(col("lang") === "en", lit(1)).otherwise(lit(0)).as("label"))
      val agg = d
        .groupBy(least(floor(col("score_bp") / lit(12.0)).cast("long"), lit(15L))
          .as("bucket"))
        .agg(count(lit(1)).as("w"), sum("label").cast("long").as("pos"))
      val preW = org.apache.spark.sql.expressions.Window
        .orderBy("bucket") // 16 rows: control-plane single partition
      val pre = agg
        .withColumn("cw", sum("w").over(preW).cast("long"))
        .withColumn("cp", sum("pos").over(preW).cast("long"))
        .localCheckpoint() // B rows; cut the scan off the B^2/B^3 joins
      val j = pre.select(col("bucket").as("bj"), col("w").as("jw"),
        col("pos").as("jpos"), col("cw").as("jcw"), col("cp").as("jcp"))
      val k = pre.select(col("bucket").as("bk"), col("cw").as("kcw"),
        col("cp").as("kcp"))
      val pairs = j.join(k, col("bj") <= col("bk"))
        .select(col("bj"), col("bk"),
          floor(lit(1000000.0) * (col("kcp") - (col("jcp") - col("jpos")))
            / (col("kcw") - (col("jcw") - col("jw"))))
            .cast("long").as("avg_ppm"))
      val tri = pre.select(col("bucket").as("b"))
        .join(pairs, col("bj") <= col("b") && col("bk") >= col("b"))
        .groupBy("b", "bj").agg(min("avg_ppm").as("mn"))
      val fit = tri.groupBy(col("b").as("bucket"))
        .agg(max("mn").cast("long").as("fitted_ppm"))
      agg.join(fit, Seq("bucket"))
        .select(col("bucket"), col("w").as("n_docs"), col("pos").as("n_pos"),
          floor(lit(1000000.0) * col("pos") / col("w")).cast("long")
            .as("raw_ppm"),
          col("fitted_ppm"))
        .orderBy("bucket")
    },

    // ---- p35: temperature-scaled mixture weights (T = 2) ----
    // The mT5/PaLM mixing policy next to p31's DoReMi-lite: sampling
    // weight ∝ n^(1/T), flattening the source distribution so
    // low-resource sources are over-sampled relative to their share.
    // T = 2 keeps everything EXACT: floor(sqrt(n)) is integer-correct
    // in IEEE double for n < 2^52 (perfect squares are exactly
    // representable), and normalization to parts-per-million uses
    // p31's largest-remainder allocation, so the ppm column sums to
    // exactly 1,000,000 by construction. One source-keyed aggregate;
    // everything after is source-dim-sized.
    QueryDef("p35_temperature_mix",
      """WITH per AS (
        |  SELECT source, COUNT(*) AS n FROM documents GROUP BY source
        |), w AS (
        |  SELECT source, n, CAST(floor(sqrt(n)) AS BIGINT) AS wr FROM per
        |), wt AS (
        |  SELECT SUM(wr) AS tw FROM w
        |), based AS (
        |  SELECT w.*, (1000000 * w.wr) // wt.tw AS base_ppm,
        |         (1000000 * w.wr) % wt.tw AS rem
        |  FROM w, wt
        |), lo AS (
        |  SELECT 1000000 - SUM(base_ppm) AS leftover FROM based
        |)
        |SELECT b.source, CAST(b.n AS BIGINT) AS n_docs,
        |  CAST(b.wr AS BIGINT) AS w_sqrt,
        |  CAST(b.base_ppm + CASE WHEN ROW_NUMBER() OVER (ORDER BY b.rem DESC, b.source) <= l.leftover
        |       THEN 1 ELSE 0 END AS BIGINT) AS weight_ppm
        |FROM based b, lo l ORDER BY b.source""".stripMargin) { (s, dir) =>
      val w = Tables.documents(s, dir).groupBy("source")
        .agg(count(lit(1)).as("n"))
        .withColumn("wr", expr("CAST(floor(sqrt(n)) AS BIGINT)"))
      val wt = w.agg(sum("wr").as("tw"))
      val based = w.crossJoin(broadcast(wt))
        .withColumn("base_ppm", expr("(1000000 * wr) div tw"))
        .withColumn("rem", expr("(1000000 * wr) % tw"))
      val lo = based.agg((lit(1000000L) - sum("base_ppm")).as("leftover"))
      val rw = org.apache.spark.sql.expressions.Window
        .orderBy(col("rem").desc, col("source")) // source-dim-sized
      based.crossJoin(broadcast(lo))
        .select(col("source"), col("n").as("n_docs"), col("wr").as("w_sqrt"),
          (col("base_ppm") + when(row_number().over(rw) <= col("leftover"), 1L)
            .otherwise(0L)).as("weight_ppm"))
        .orderBy("source")
    },

    // ---- v7: snapshot distribution drift (exact total variation) ----
    // The monitoring question p30's row-diff can't answer: the two
    // snapshots may share almost no rows and still be DISTRIBUTIONALLY
    // identical (fine) — or share most rows while the tail shifts
    // (drift). Per source: 16-bin doc-length histograms of the old
    // snapshot (p30's convention: doc_id % 11 != 0) vs the new (all
    // docs), total-variation distance in EXACT basis points via
    // cross-multiplication — tv_bp = 10000·Σ|cA·nB − cB·nA| //
    // (2·nA·nB), no float division anywhere. The cross-products are
    // 128-bit on both engines (Spark DECIMAL(38,0), DuckDB HUGEINT):
    // in BIGINT the claimed exactness silently breaks past ~3e9 rows
    // per source (cA·nB > 2⁶³), i.e. exactly the scale this targets.
    // With 38-digit intermediates the math is exact up to ~9.2e16
    // rows per source (10000·Σ must fit 38 digits) — beyond any
    // single-source corpus this engine will meet. ONE corpus scan
    // computes both histograms (the old-snapshot membership is a
    // flag, not a second read); everything after is bin-domain-sized
    // (16 rows per source) plus a source-dim broadcast.
    QueryDef("v7_snapshot_drift",
      """WITH per AS (
        |  SELECT source, LEAST(n_chars // 40, 15) AS b,
        |    SUM(CASE WHEN doc_id % 11 != 0 THEN 1 ELSE 0 END) AS ca,
        |    COUNT(*) AS cb
        |  FROM documents GROUP BY 1, 2
        |), tot AS (
        |  SELECT source, SUM(ca) AS na, SUM(cb) AS nb FROM per GROUP BY source
        |)
        |SELECT p.source, CAST(t.na AS BIGINT) AS n_old,
        |  CAST(t.nb AS BIGINT) AS n_new,
        |  CAST((10000 * SUM(ABS(CAST(p.ca AS HUGEINT) * t.nb - CAST(p.cb AS HUGEINT) * t.na))) // (2 * CAST(t.na AS HUGEINT) * t.nb) AS BIGINT) AS tv_bp
        |FROM per p JOIN tot t ON p.source = t.source
        |GROUP BY p.source, t.na, t.nb ORDER BY p.source""".stripMargin) { (s, dir) =>
      val d19 = org.apache.spark.sql.types.DecimalType(19, 0)
      val per = Tables.documents(s, dir)
        .groupBy(col("source"), least(expr("n_chars div 40"), lit(15)).as("b"))
        .agg(sum(when(col("doc_id") % 11 =!= 0, 1L).otherwise(0L)).as("ca"),
          count(lit(1)).as("cb"))
      val tot = per.groupBy("source").agg(sum("ca").as("na"), sum("cb").as("nb"))
      per.join(broadcast(tot), Seq("source"))
        .groupBy(col("source"), col("na"), col("nb"))
        // (19,0)x(19,0) products promote to DECIMAL(38,0): exact to
        // 10^38, vs the 2^63 ceiling the BIGINT form silently hit
        .agg(sum(abs(col("ca").cast(d19) * col("nb").cast(d19) -
          col("cb").cast(d19) * col("na").cast(d19))).as("l1"))
        .select(col("source"), col("na").as("n_old"), col("nb").as("n_new"),
          expr("(CAST(10000 AS DECIMAL(5,0)) * l1) div (2 * CAST(na AS DECIMAL(19,0)) * CAST(nb AS DECIMAL(19,0)))")
            .cast("long").as("tv_bp"))
        .orderBy("source")
    },

    // ---- v6: functional-dependency discovery (schema profiling) ----
    // The data-quality check that finds MODELING errors, not row
    // errors: for each declared candidate FD lhs → rhs over the
    // denormalized order view, count lhs groups, groups where the
    // dependency is VIOLATED (more than one distinct rhs), and the
    // worst group's rhs cardinality. nation→region and
    // custkey→mktsegment must hold (join-derived); priority→segment is
    // the deliberately-violated control — a profiler that can't find
    // violations proves nothing. Scale shape: one broadcast-dim join
    // builds the view, then per-FD one hash aggregate keyed by lhs
    // with a COUNT(DISTINCT rhs) (Expand-based, partial-aggregated);
    // nothing wider than the lhs key set ever shuffles.
    QueryDef("v6_fd_discovery",
      """WITH denorm AS (
        |  SELECT o.o_orderpriority, c.c_custkey, c.c_mktsegment, n.n_name, r.r_name
        |  FROM orders o
        |  JOIN customer c ON o.o_custkey = c.c_custkey
        |  JOIN nation n ON c.c_nationkey = n.n_nationkey
        |  JOIN region r ON n.n_regionkey = r.r_regionkey
        |), fd AS (
        |  SELECT 'n_name->r_name' AS fd, n_name AS lhs, r_name AS rhs FROM denorm
        |  UNION ALL
        |  SELECT 'c_custkey->c_mktsegment', CAST(c_custkey AS VARCHAR), c_mktsegment FROM denorm
        |  UNION ALL
        |  SELECT 'o_orderpriority->c_mktsegment', o_orderpriority, c_mktsegment FROM denorm
        |), per AS (
        |  SELECT fd, lhs, COUNT(DISTINCT rhs) AS n_rhs FROM fd GROUP BY fd, lhs
        |)
        |SELECT fd, CAST(COUNT(*) AS BIGINT) AS n_lhs_groups,
        |  CAST(SUM(CASE WHEN n_rhs > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_violating,
        |  CAST(MAX(n_rhs) AS BIGINT) AS max_rhs
        |FROM per GROUP BY fd ORDER BY fd""".stripMargin) { (s, dir) =>
      val denorm = Tables.orders(s, dir)
        .join(broadcast(Tables.customer(s, dir)),
          col("o_custkey") === col("c_custkey"))
        .join(broadcast(Tables.nation(s, dir)),
          col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(Tables.region(s, dir)),
          col("n_regionkey") === col("r_regionkey"))
        .select("o_orderpriority", "c_custkey", "c_mktsegment", "n_name", "r_name")
      val fd = denorm.select(lit("n_name->r_name").as("fd"),
          col("n_name").as("lhs"), col("r_name").as("rhs"))
        .unionByName(denorm.select(lit("c_custkey->c_mktsegment").as("fd"),
          col("c_custkey").cast("string").as("lhs"), col("c_mktsegment").as("rhs")))
        .unionByName(denorm.select(lit("o_orderpriority->c_mktsegment").as("fd"),
          col("o_orderpriority").as("lhs"), col("c_mktsegment").as("rhs")))
      fd.groupBy("fd", "lhs").agg(countDistinct("rhs").as("n_rhs"))
        .groupBy("fd")
        .agg(count(lit(1)).as("n_lhs_groups"),
          sum(when(col("n_rhs") > 1, 1L).otherwise(0L)).as("n_violating"),
          max("n_rhs").as("max_rhs"))
        .orderBy("fd")
    },

    // ---- p34: multi-phrase blocklist filter (relational Aho-Corasick) ----
    // The curation gate every production corpus runs: N banned phrases
    // matched against every document, with space-boundary substring
    // semantics (' phrase ' within ' text ' — no mid-word hits). The
    // naive plan evaluates contains() N×M times across the full
    // corpus scan; here candidate generation is an ANCHOR-TOKEN
    // inverted join — explode each doc's DISTINCT tokens, equi-join
    // the broadcast (anchor → phrase) dim on the phrase's first token
    // — so the per-candidate locate() verify only ever runs on docs
    // that contain the anchor token at all (complete by construction:
    // a space-bounded phrase occurrence makes each of its words a
    // token of the doc). At 100 TB this is one corpus scan + a
    // pattern-dim broadcast; candidates scale with anchor-token df,
    // not corpus × patterns. Zero-hit phrases stay in the report as
    // explicit zeros (a silently-vanishing pattern row reads as
    // "clean corpus" when it means "broken pattern").
    QueryDef("p34_blocklist_filter",
      """WITH bl(pid, phrase) AS (VALUES
        |  (1, 'hash join'), (2, 'slow scan'), (3, 'fast merge'),
        |  (4, 'window agg'), (5, 'stream filter'), (6, 'key value'),
        |  (7, 'big data'), (8, 'sort merge'), (9, 'the query'),
        |  (10, 'vector scan nonexistent'))
        |SELECT CAST(pid AS BIGINT) AS pid, phrase,
        |  CAST(COUNT(d.doc_id) AS BIGINT) AS n_docs
        |FROM bl LEFT JOIN documents d
        |  ON instr(' ' || d.text || ' ', ' ' || phrase || ' ') > 0
        |GROUP BY pid, phrase ORDER BY pid""".stripMargin) { (s, dir) =>
      import s.implicits._
      val phrases = Seq((1L, "hash join"), (2L, "slow scan"),
        (3L, "fast merge"), (4L, "window agg"), (5L, "stream filter"),
        (6L, "key value"), (7L, "big data"), (8L, "sort merge"),
        (9L, "the query"), (10L, "vector scan nonexistent"))
      val bl = phrases.map { case (pid, p) =>
        (pid, p, p.split(' ').head) // anchor = first token
      }.toDF("pid", "phrase", "anchor")
      val cands = Tables.documents(s, dir)
        .select(col("doc_id"), col("text"),
          explode(array_distinct(split(col("text"), " "))).as("tok"))
        .join(broadcast(bl), col("tok") === col("anchor"))
      val hits = cands
        // space-boundary phrase containment: ' phrase ' in ' text '
        .where(expr("instr(concat(' ', text, ' '), concat(' ', phrase, ' ')) > 0"))
        .groupBy("pid").agg(count(lit(1)).as("n"))
      bl.select("pid", "phrase")
        .join(hits, Seq("pid"), "left")
        .select(col("pid"), col("phrase"),
          coalesce(col("n"), lit(0L)).as("n_docs"))
        .orderBy("pid")
    },

    // ---- weighted sampling without replacement (Efraimidis–Spirakis) ----
    // Per-language top-5 draw where P(doc) ∝ n_chars — the A-ES
    // one-pass reservoir reformulated relationally: key = u^(1/w)
    // with u a DETERMINISTIC uniform from md5(text) (the p2 trick, so
    // both engines draw the identical sample), ranked via the
    // monotone-equivalent ln(u)/w and QUANTIZED to integer micro-units
    // (p10's ULP discipline: floor(1e6·ln(u)/w) as BIGINT, doc_id
    // tiebreak) so cross-engine libm drift cannot flip a rank. Scale
    // shape: one scan + one per-stratum top-k — the same partial
    // TopK/window shape as p3, state O(strata·k), shuffle O(survivors);
    // this is THE sampler for quality-weighted training mixes (weight
    // = quality score instead of n_chars, zero plan change).
    QueryDef("p36_weighted_sample",
      """SELECT lang, doc_id, n_chars, key_q, CAST(rk AS BIGINT) AS rk FROM (
        |  SELECT lang, doc_id, n_chars, key_q,
        |    ROW_NUMBER() OVER (PARTITION BY lang ORDER BY key_q DESC, doc_id) AS rk
        |  FROM (
        |    SELECT lang, doc_id, n_chars,
        |      CAST(floor(1e6 * ln((CAST('0x' || substr(md5(text), 1, 6) AS BIGINT) + 1)
        |        / 16777217.0) / n_chars) AS BIGINT) AS key_q
        |    FROM documents))
        |WHERE rk <= 5 ORDER BY lang, rk""".stripMargin) { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val keyQ = floor(lit(1e6) *
        log((conv(substring(md5(col("text")), 1, 6), 16, 10)
          .cast("double") + lit(1.0)) / lit(16777217.0)) /
        col("n_chars")).cast("long")
      val w = Window.partitionBy("lang")
        .orderBy(col("key_q").desc, col("doc_id"))
      Tables.documents(s, dir)
        .select(col("lang"), col("doc_id"), col("n_chars"),
          keyQ.as("key_q"))
        .withColumn("rk", row_number().over(w).cast("long"))
        .where(col("rk") <= 5)
        .orderBy("lang", "rk")
    },

    // ---- overlapping passage chunking (RAG / context-window prep) ----
    // The chunker every retrieval or packing pipeline runs first:
    // each document's token stream is cut into 64-token chunks at
    // stride 48 (16-token overlap so no boundary-straddling phrase is
    // lost), with per-chunk provenance (doc_id, chunk_id, 1-based
    // start_tok, n_ctoks) and the chunk's md5 — the identity the
    // downstream dedup/packing stages key on. Chunk-start law, exact
    // in integers on both engines: starts = 1 + k·48 for
    // k = 0..(n ≤ 64 ? 0 : (n-64+47) div 48) — every token covered,
    // the last chunk ends AT the document end, and no fully-contained
    // trailing sliver is emitted (the k-bound is the production rule,
    // property-spec'd: coverage + overlap + containment). This is NOT
    // p12: p12_chunk_windows emits feature windows on a raw range law
    // (trailing slivers included — window STATS want them); this is
    // the retrieval-unit chunker whose chunks carry a stable md5
    // identity and whose count law downstream packing budgets against.
    // Shape: pure
    // scan-side HOFs (tokenize, sequence, posexplode, slice, md5) —
    // per-doc work, ZERO shuffles before the final order; at 100 TB
    // this is a map-only stage that scales with the scan.
    QueryDef("p37_chunk_passages",
      """WITH tk AS (
        |  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS t
        |  FROM documents
        |), d AS (
        |  SELECT doc_id, t, len(t) AS n FROM tk WHERE len(t) > 0
        |), st AS (
        |  SELECT doc_id, t, n, CAST(k AS BIGINT) AS chunk_id,
        |    CAST(1 + k * 48 AS BIGINT) AS start_tok
        |  FROM d, unnest(range(0,
        |    (CASE WHEN n <= 64 THEN 0 ELSE (n - 64 + 47) // 48 END) + 1)) AS u(k)
        |)
        |SELECT doc_id, chunk_id, start_tok,
        |  CAST(LEAST(64, n - start_tok + 1) AS BIGINT) AS n_ctoks,
        |  md5(array_to_string(list_slice(t, CAST(start_tok AS INT),
        |    CAST(start_tok + LEAST(64, n - start_tok + 1) - 1 AS INT)), ' ')) AS chunk_md5
        |FROM st ORDER BY doc_id, chunk_id""".stripMargin) { (s, dir) =>
      Tables.documents(s, dir)
        .select(col("doc_id"),
          graft.operators.Curation.tokens(col("text")).as("t"))
        .withColumn("n", size(col("t")))
        .where(col("n") > 0)
        .select(col("doc_id"), col("t"), col("n"),
          explode(expr(
            "sequence(0L, CASE WHEN n <= 64 THEN 0L ELSE CAST((n - 64 + 47) DIV 48 AS LONG) END)"))
            .as("chunk_id"))
        .withColumn("start_tok", lit(1L) + col("chunk_id") * lit(48L))
        .withColumn("n_ctoks",
          least(lit(64L), col("n") - col("start_tok") + lit(1L)))
        .withColumn("chunk_md5", md5(
          expr("array_join(slice(t, CAST(start_tok AS INT), CAST(n_ctoks AS INT)), ' ')")))
        .select("doc_id", "chunk_id", "start_tok", "n_ctoks", "chunk_md5")
        .orderBy("doc_id", "chunk_id")
    })
}
