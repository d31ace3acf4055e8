package graft.queries

import org.apache.spark.sql.functions._
import graft.core.{GQuery, Tables}
import graft.operators.{Dedup, TextOps}

/** Text-analysis + dedup capabilities over the `documents` table, exposed
  * through the driver gate. SQL-expressible ops carry DuckDB oracles
  * (token stats, quality, fingerprints, exact dedup, all-pairs Jaccard);
  * the sketch-based scale paths (MinHash-LSH, SimHash) are rows-only and
  * cross-verified against the exact variants in OperatorsSpec. */
object TextDedup {

  private def t(s: org.apache.spark.sql.SparkSession, dir: String, n: String) =
    Tables(s, dir, n)

  private val stopwords = Seq("the", "a")

  val defs: Seq[GQuery] = Seq(

    // ---- Token counting + quality scoring (length/stopword/punct ratios).
    GQuery(
      "txt_quality",
      """SELECT doc_id,
        |  CAST(length(text) AS BIGINT) AS n_chars,
        |  CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS n_tokens,
        |  round((CAST(length(text) AS DOUBLE)
        |    - (len(string_split_regex(trim(text), '\s+')) - 1))
        |    / len(string_split_regex(trim(text), '\s+')), 4) AS avg_token_len,
        |  round(CAST(len(list_filter(string_split_regex(trim(text), '\s+'),
        |      tok -> tok IN ('the', 'a'))) AS DOUBLE)
        |    / len(string_split_regex(trim(text), '\s+')), 4) AS stopword_ratio,
        |  round((CAST(length(text) AS DOUBLE)
        |    - length(regexp_replace(text, '[^A-Za-z0-9 ]', '', 'g')))
        |    / CAST(length(text) AS DOUBLE), 4) AS punct_ratio
        |FROM documents
        |ORDER BY doc_id""".stripMargin) { (s, dir) =>
      t(s, dir, "documents")
        .select(Seq(col("doc_id")) ++
          TextOps.qualityColumns(col("text"), stopwords): _*)
        .orderBy("doc_id")
    },

    // ---- Document fingerprinting: content md5 (cross-engine stable).
    GQuery(
      "txt_fingerprint",
      """SELECT doc_id, md5(text) AS content_md5,
        |  CAST(length(text) AS BIGINT) AS n_chars
        |FROM documents
        |ORDER BY doc_id""".stripMargin) { (s, dir) =>
      t(s, dir, "documents")
        .select(col("doc_id"), TextOps.fingerprint(col("text")).as("content_md5"),
          length(col("text")).cast("long").as("n_chars"))
        .orderBy("doc_id")
    },

    // ---- Language profile aggregation over the labeled lang column.
    GQuery(
      "txt_lang_profile",
      """SELECT lang, count(*) AS n_docs,
        |  round(avg(n_chars), 2) AS avg_chars,
        |  CAST(min(doc_id) AS BIGINT) AS first_doc
        |FROM documents
        |GROUP BY lang
        |ORDER BY lang""".stripMargin) { (s, dir) =>
      t(s, dir, "documents")
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"),
          round(avg(col("n_chars")), 2).as("avg_chars"),
          min(col("doc_id")).cast("long").as("first_doc"))
        .orderBy("lang")
    },

    // ---- Heuristic n-gram/stopword language ID (not SQL-expressible;
    // deterministic, always 500 rows).
    GQuery.noOracle("txt_langid") { (s, dir) =>
      t(s, dir, "documents")
        .select(col("doc_id"), col("lang").as("labeled_lang"),
          TextOps.langId(col("text")).as("predicted_lang"),
          TextOps.bpeishTokenCount(col("text")).as("n_bpeish_tokens"),
          TextOps.rollingHash(col("text")).as("rolling_hash"))
        .orderBy("doc_id")
    },

    // ---- Exact dedup: group by content, keep min id.
    GQuery(
      "dedup_exact",
      """SELECT CAST(min(doc_id) AS BIGINT) AS keep_id,
        |  count(*) AS n_copies,
        |  md5(text) AS content_md5
        |FROM documents
        |GROUP BY text
        |ORDER BY keep_id""".stripMargin) { (s, dir) =>
      Dedup.exactGroups(t(s, dir, "documents"), "text", "doc_id")
        .select(col("keep_id").cast("long").as("keep_id"), col("n_copies"),
          md5(col("text")).as("content_md5"))
        .orderBy("keep_id")
    },

    // ---- All-pairs word-set Jaccard (the exact verifier; scoped input —
    // the scale path is dedup_minhash_lsh below).
    GQuery(
      "dedup_jaccard_pairs",
      """WITH w AS (
        |  SELECT DISTINCT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS w
        |  FROM documents WHERE doc_id < 200),
        |sz AS (SELECT doc_id, count(*) AS n FROM w GROUP BY doc_id),
        |inter AS (
        |  SELECT a.doc_id AS id1, b.doc_id AS id2, count(*) AS c
        |  FROM w a JOIN w b ON a.w = b.w AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2)
        |SELECT id1, id2,
        |  round(CAST(c AS DOUBLE) / (s1.n + s2.n - c), 4) AS jaccard
        |FROM inter
        |JOIN sz s1 ON s1.doc_id = id1
        |JOIN sz s2 ON s2.doc_id = id2
        |WHERE CAST(c AS DOUBLE) / (s1.n + s2.n - c) >= 0.8
        |ORDER BY id1, id2""".stripMargin) { (s, dir) =>
      val docs = t(s, dir, "documents").filter(col("doc_id") < 200)
      Dedup.jaccardPairs(Dedup.tokenSet(docs, "doc_id", "text"), 0.8)
        .orderBy("id1", "id2")
    },

    // ---- Bigram (2-shingle) Jaccard: stricter notion of near-dup.
    GQuery(
      "dedup_bigram_jaccard",
      """WITH toks AS (
        |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS t
        |  FROM documents WHERE doc_id < 100),
        |w AS (
        |  SELECT DISTINCT doc_id, t[i] || ' ' || t[i+1] AS w
        |  FROM (SELECT doc_id, t,
        |          unnest(generate_series(1, len(t) - 1)) AS i
        |        FROM toks) x),
        |sz AS (SELECT doc_id, count(*) AS n FROM w GROUP BY doc_id),
        |inter AS (
        |  SELECT a.doc_id AS id1, b.doc_id AS id2, count(*) AS c
        |  FROM w a JOIN w b ON a.w = b.w AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2)
        |SELECT id1, id2,
        |  round(CAST(c AS DOUBLE) / (s1.n + s2.n - c), 4) AS jaccard
        |FROM inter
        |JOIN sz s1 ON s1.doc_id = id1
        |JOIN sz s2 ON s2.doc_id = id2
        |WHERE CAST(c AS DOUBLE) / (s1.n + s2.n - c) >= 0.2
        |ORDER BY id1, id2""".stripMargin) { (s, dir) =>
      val docs = t(s, dir, "documents").filter(col("doc_id") < 100)
      Dedup.jaccardPairs(Dedup.shingleSet(docs, "doc_id", "text", 2), 0.2)
        .orderBy("id1", "id2")
    },

    // ---- MinHash + LSH banding near-dup (the O(n) scale path; candidates
    // verified with exact Jaccard — OperatorsSpec asserts recall vs the
    // all-pairs verifier).
    GQuery.noOracle("dedup_minhash_lsh") { (s, dir) =>
      Dedup.minhashNearDups(t(s, dir, "documents"), "doc_id", "text",
          numHashes = 64, bands = 16, threshold = 0.8)
        .orderBy("id1", "id2")
    },

    // ---- Shingle-mode MinHash: the shingle→minhash→band→bucket-join
    // pipeline over 2-word shingles (stricter near-dup notion).
    GQuery.noOracle("dedup_minhash_shingle") { (s, dir) =>
      Dedup.minhashNearDups(t(s, dir, "documents"), "doc_id", "text",
          numHashes = 64, bands = 16, threshold = 0.25, shingleN = 2)
        .orderBy("id1", "id2")
    },

    // ---- Keep-list resolution: which docs survive near-dup removal
    // (greedy min-id representative over word-set Jaccard >= 0.8 pairs).
    GQuery(
      "dedup_keep_list",
      """WITH w AS (
        |  SELECT DISTINCT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS w
        |  FROM documents WHERE doc_id < 200),
        |sz AS (SELECT doc_id, count(*) AS n FROM w GROUP BY doc_id),
        |inter AS (
        |  SELECT a.doc_id AS id1, b.doc_id AS id2, count(*) AS c
        |  FROM w a JOIN w b ON a.w = b.w AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2),
        |dropped AS (
        |  SELECT DISTINCT id2 FROM inter
        |  JOIN sz s1 ON s1.doc_id = id1
        |  JOIN sz s2 ON s2.doc_id = id2
        |  WHERE CAST(c AS DOUBLE) / (s1.n + s2.n - c) >= 0.8)
        |SELECT doc_id, lang FROM documents
        |WHERE doc_id < 200 AND doc_id NOT IN (SELECT id2 FROM dropped)
        |ORDER BY doc_id""".stripMargin) { (s, dir) =>
      val docs = t(s, dir, "documents").filter(col("doc_id") < 200)
      val pairs = Dedup.jaccardPairs(Dedup.tokenSet(docs, "doc_id", "text"), 0.8)
      Dedup.keepList(docs, "doc_id", pairs)
        .select("doc_id", "lang")
        .orderBy("doc_id")
    },

    // ---- SimHash signatures + pigeonhole near-dup candidates.
    GQuery.noOracle("dedup_simhash") { (s, dir) =>
      Dedup.simhash64(t(s, dir, "documents"), "doc_id", "text")
        .orderBy("doc_id")
    }
  )
}
