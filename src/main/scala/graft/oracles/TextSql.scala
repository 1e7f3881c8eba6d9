package graft.oracles

import graft.operators

/** DuckDB oracle SQL for the text-analysis / tokenization / dedup-adjacent tier — split out of SparkEntry
  * verbatim (round-11 registry hygiene). SparkEntry.oracleSql concatenates
  * the per-domain maps; keys stay globally unique and strings unchanged, so
  * the driver's hash gate sees an identical contract.
  */
object TextSql {
  val sql: Map[String, String] = Map(
    "q_collocations" ->
      """WITH toks AS (
        |  SELECT doc_id,
        |         unnest(string_split(lower(text), ' ')) AS word,
        |         generate_subscripts(string_split(lower(text), ' '), 1) AS pos
        |  FROM documents),
        |pairs AS (
        |  SELECT w1, w2 FROM (
        |    SELECT word AS w1,
        |           lead(word) OVER (PARTITION BY doc_id ORDER BY pos) AS w2
        |    FROM toks)
        |  WHERE length(w1) > 0 AND length(w2) > 0),
        |uni AS (SELECT word, count(*) AS c FROM toks
        |        WHERE length(word) > 0 GROUP BY word),
        |tw AS (SELECT sum(c) AS w_total FROM uni),
        |tb AS (SELECT count(*) AS b_total FROM pairs),
        |big AS (SELECT w1, w2, count(*) AS c_xy FROM pairs
        |        GROUP BY w1, w2 HAVING count(*) >= 5)
        |SELECT b.w1, b.w2, b.c_xy,
        | floor(ln((CAST(b.c_xy AS DOUBLE) * w_total * w_total)
        |          / (CAST(b_total AS DOUBLE) * u1.c * u2.c)) * 10000.0 + 0.5) / 10000.0 AS pmi
        |FROM big b
        |JOIN uni u1 ON b.w1 = u1.word
        |JOIN uni u2 ON b.w2 = u2.word, tw, tb
        |ORDER BY w1, w2""".stripMargin,

    "q_text_stats" ->
      """SELECT lang, count(*) AS n_docs,
        | CAST(sum(length(text)) AS BIGINT) AS total_chars,
        | floor(CAST(sum(len(string_split(text, ' '))) AS DOUBLE) / count(*) * 10000.0 + 0.5) / 10000.0 AS avg_words
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin,

    "q_token_count" ->
      """SELECT doc_id,
        | CAST(len(string_split(text, ' ')) AS BIGINT) AS ws_tokens,
        | CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]')) AS BIGINT) AS bpe_ish_tokens
        |FROM documents ORDER BY doc_id""".stripMargin,

    "q_seq_pack" ->
      """WITH d AS (
        |  SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
        |  FROM documents),
        |c AS (
        |  SELECT doc_id, n_tokens,
        |         CAST(coalesce(sum(n_tokens) OVER (ORDER BY doc_id
        |              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS tok_start
        |  FROM d)
        |SELECT doc_id, n_tokens, tok_start,
        |       tok_start // 2048 AS seq_id,
        |       tok_start % 2048 AS seq_offset
        |FROM c ORDER BY doc_id""".stripMargin,

    "q_corpus_mix" ->
      """WITH rates(lang, rate_m) AS (
        |  VALUES ('en', 500), ('fr', 800), ('es', 900), ('de', 1000), ('zh', 1000))
        |SELECT d.doc_id, d.lang, d.source
        |FROM documents d JOIN rates r ON d.lang = r.lang
        |WHERE (d.doc_id * 48271 + 11) % 1000 < r.rate_m
        |ORDER BY d.doc_id""".stripMargin,

    // round-12b/13: temperature-scaled mix weights — p_i ∝ share_i^0.5,
    // the power as ONE IEEE sqrt over an integer-scaled share, floored
    // back to BIGINT; all sums/divisions exact integers. r13: shares over
    // PRE-REDUCED counts (tk = tokens div red, tr = total div red < 2e6)
    // so tk*1e12 < 2e18 < 2^63 at any corpus, and boost divides by
    // greatest(share_bp, 1) so sub-1-bp tail languages don't div-by-zero
    "q_mix_temperature" ->
      """WITH c AS (SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
        |    CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS tokens
        |  FROM documents GROUP BY 1),
        |t AS (SELECT CAST(sum(tokens) AS BIGINT) AS total,
        |             greatest(1, CAST(sum(tokens) AS BIGINT) // 1000000)
        |               AS red FROM c),
        |s AS (SELECT lang, n_docs, tokens,
        |    greatest(tokens // red, 1) * 10000 // (total // red) AS share_bp,
        |    CAST(floor(sqrt(CAST(greatest(tokens // red, 1) * 1000000000000
        |                         // (total // red) AS DOUBLE)))
        |         AS BIGINT) AS s
        |  FROM c, t),
        |st AS (SELECT CAST(sum(s) AS BIGINT) AS s_total FROM s)
        |SELECT lang, n_docs, tokens, share_bp,
        |       s * 10000 // s_total AS weight_bp,
        |       (s * 10000 // s_total) * 10000 // greatest(share_bp, 1)
        |         AS boost_bp
        |FROM s, st ORDER BY lang""".stripMargin,

    // round-13: length-grouped batch packing — per 16-wide length bucket,
    // docs ranked (n desc, doc_id), batches of 8, pad waste vs the naive
    // doc_id-order batching; oracle uses plain windows so the hash gate
    // proves the Spark side's two-phase scan ≡ windowed
    "q_length_bucketing" ->
      """WITH t AS (SELECT doc_id,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n FROM documents),
        |b AS (SELECT doc_id, n, ((n + 15) // 16) * 16 AS bucket FROM t),
        |r AS (SELECT bucket, n,
        |    row_number() OVER (PARTITION BY bucket ORDER BY n DESC, doc_id) - 1 AS rb
        |    FROM b),
        |ba AS (SELECT bucket, rb // 8 AS batch_id,
        |    CAST(count(*) AS BIGINT) AS bdocs,
        |    CAST(max(n) * count(*) - sum(n) AS BIGINT) AS waste
        |    FROM r GROUP BY 1, 2),
        |pb AS (SELECT bucket, CAST(sum(bdocs) AS BIGINT) AS n_docs,
        |    CAST(count(*) AS BIGINT) AS n_batches,
        |    CAST(sum(waste) AS BIGINT) AS pad_tokens
        |    FROM ba GROUP BY 1),
        |nv AS (SELECT (row_number() OVER (ORDER BY doc_id) - 1) // 8 AS batch_id, n
        |    FROM t),
        |nw AS (SELECT CAST(sum(w) AS BIGINT) AS naive_pad_total FROM (
        |    SELECT max(n) * count(*) - sum(n) AS w FROM nv GROUP BY batch_id)),
        |bt AS (SELECT CAST(sum(pad_tokens) AS BIGINT) AS bucketed_pad_total FROM pb)
        |SELECT bucket, n_docs, n_batches, pad_tokens,
        |       naive_pad_total, bucketed_pad_total,
        |       (naive_pad_total - bucketed_pad_total) * 10000
        |         // greatest(naive_pad_total, 1) AS savings_bp
        |FROM pb, nw, bt ORDER BY bucket""".stripMargin,

    "q_quality_score" ->
      """WITH f AS (
        |  SELECT doc_id, n_chars,
        |    CAST(length(text) AS DOUBLE) AS n,
        |    CAST(length(text) - length(regexp_replace(text, '[A-Za-z]', '', 'g')) AS DOUBLE) AS alpha,
        |    CAST(length(text) - length(regexp_replace(text, ' ', '', 'g')) AS DOUBLE) AS spaces,
        |    CAST(len(regexp_extract_all(text, '\bthe\b|\ba\b|\bof\b')) AS DOUBLE) AS stops
        |  FROM documents)
        |SELECT doc_id, n_chars,
        | floor(alpha / n * 10000.0 + 0.5) / 10000.0 AS alpha_ratio,
        | floor((n - spaces) / (spaces + 1.0) * 10000.0 + 0.5) / 10000.0 AS avg_word_len,
        | CAST(stops AS BIGINT) AS stopword_hits,
        | floor((0.5 * (alpha / n) + 0.3 * least(1.0, ((n - spaces) / (spaces + 1.0)) / 8.0)
        |        + 0.2 * least(1.0, stops / 10.0)) * 10000.0 + 0.5) / 10000.0 AS quality_score
        |FROM f ORDER BY doc_id""".stripMargin,

    "q_lang_id" ->
      """WITH f AS (
        |  SELECT doc_id, lang,
        |    CAST((length(text) - length(replace(text, 'th', ''))) // 2 AS BIGINT) AS th_bigrams,
        |    CAST(len(regexp_extract_all(text, '\bthe\b|\band\b|\bis\b')) AS BIGINT) AS en_stopwords,
        |    CAST(length(text) AS DOUBLE) AS n
        |  FROM documents)
        |SELECT doc_id, lang, th_bigrams, en_stopwords,
        | floor(CAST(th_bigrams + en_stopwords AS DOUBLE) * 100.0 / n * 10000.0 + 0.5) / 10000.0 AS evidence_per_100,
        | CASE WHEN CAST(th_bigrams + en_stopwords AS DOUBLE) * 100.0 / n >= 3.0
        |      THEN 'en' ELSE 'other' END AS lang_pred
        |FROM f ORDER BY doc_id""".stripMargin,

    "q_doc_fingerprint" ->
      """SELECT doc_id,
        | md5(lower(trim(regexp_replace(text, '\s+', ' ', 'g')))) AS fingerprint,
        | substr(md5(lower(trim(regexp_replace(text, '\s+', ' ', 'g')))), 1, 8) AS fp_bucket
        |FROM documents ORDER BY doc_id""".stripMargin,

    "q_split_assign" ->
      """SELECT doc_id, lang, doc_id % 10 AS bucket,
        | CASE WHEN doc_id % 10 < 8 THEN 'train'
        |      WHEN doc_id % 10 = 8 THEN 'val'
        |      ELSE 'test' END AS split
        |FROM documents ORDER BY doc_id""".stripMargin,

    "q_incr_dedup" ->
      """WITH f AS (SELECT doc_id, doc_id % 5 AS m,
        |  md5(lower(trim(regexp_replace(text, '\s+', ' ', 'g')))) AS fingerprint
        | FROM documents)
        |SELECT b.doc_id, b.fingerprint FROM f b
        |WHERE b.m = 4 AND NOT EXISTS
        |  (SELECT 1 FROM f s WHERE s.m <> 4 AND s.fingerprint = b.fingerprint)
        |ORDER BY b.doc_id""".stripMargin,

    "q_doc_dedup_exact" ->
      """SELECT md5(lower(trim(regexp_replace(text, '\s+', ' ', 'g')))) AS content_key,
        | min(doc_id) AS canonical_id, count(*) AS n_copies
        |FROM documents GROUP BY 1 ORDER BY canonical_id""".stripMargin,

    "q_doc_chunk" ->
      """WITH d AS (SELECT doc_id, string_split(text, ' ') AS w,
        |             len(string_split(text, ' ')) AS n FROM documents),
        |c AS (SELECT doc_id, w, n,
        |        unnest(generate_series(0, n - 1, 80)) AS start
        |      FROM d)
        |SELECT doc_id, start // 80 AS chunk_id,
        | array_to_string(w[start + 1 : start + 100], ' ') AS chunk_text,
        | CAST(least(100, n - start) AS BIGINT) AS n_words
        |FROM c ORDER BY doc_id, chunk_id""".stripMargin,

    "q_vocab_topk" ->
      """SELECT word, count(*) AS n
        |FROM (SELECT unnest(string_split(lower(text), ' ')) AS word FROM documents)
        |WHERE length(word) > 0
        |GROUP BY word ORDER BY n DESC, word ASC LIMIT 100""".stripMargin,

    "q_pii_scrub" ->
      """SELECT doc_id,
        | CAST(len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT) AS n_emails,
        | CAST(len(regexp_extract_all(text, '[0-9]+')) AS BIGINT) AS n_numbers,
        | regexp_replace(regexp_replace(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |                '[0-9]+', '<NUM>', 'g') AS scrubbed
        |FROM documents ORDER BY doc_id""".stripMargin,

    "q_contamination" ->
      """WITH d AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        |sh AS (SELECT doc_id, list_distinct(list_transform(range(1, len(w) - 1),
        |                      i -> array_to_string(w[i:i+2], ' '))) AS s
        |       FROM d),
        |e AS (SELECT doc_id, unnest(s) AS g FROM sh),
        |bench AS (SELECT DISTINCT g FROM e WHERE doc_id % 97 = 0),
        |sz AS (SELECT doc_id, len(s) AS nsh FROM sh),
        |ov AS (SELECT e.doc_id, count(*) AS overlap FROM e JOIN bench USING (g) GROUP BY 1)
        |SELECT sz.doc_id, CAST(nsh AS BIGINT) AS n_shingles,
        | CAST(coalesce(overlap, 0) AS BIGINT) AS overlap,
        | floor(CAST(coalesce(overlap, 0) AS DOUBLE) / CAST(nsh AS DOUBLE) * 10000.0 + 0.5) / 10000.0 AS overlap_ratio,
        | CAST(coalesce(overlap, 0) AS DOUBLE) >= 0.5 * CAST(nsh AS DOUBLE) AS is_contaminated
        |FROM sz LEFT JOIN ov ON sz.doc_id = ov.doc_id
        |WHERE nsh > 0
        |ORDER BY sz.doc_id""".stripMargin,

    "q_repetition" ->
      """WITH d AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        |s AS (SELECT doc_id, len(w) AS n_words,
        |        len(list_distinct(list_transform(range(1, len(w) - 1),
        |             i -> array_to_string(w[i:i+2], ' ')))) AS n_distinct_sh
        |      FROM d)
        |SELECT doc_id, CAST(n_words AS BIGINT) AS n_words,
        | CAST(n_distinct_sh AS BIGINT) AS n_distinct_sh,
        | floor((1.0 - CAST(n_distinct_sh AS DOUBLE) / CAST(n_words - 2 AS DOUBLE))
        |       * 10000.0 + 0.5) / 10000.0 AS repetition_ratio
        |FROM s WHERE n_words >= 3 ORDER BY doc_id""".stripMargin,

    "q_sample_weighted" ->
      """WITH s AS (
        |  SELECT lang, doc_id, n_chars,
        |    ln(CAST((doc_id * 2654435761) % 1000003 + 1 AS DOUBLE) / 1000004.0)
        |      / CAST(n_chars AS DOUBLE) AS skey
        |  FROM documents),
        |r AS (SELECT lang, doc_id, n_chars,
        |        CAST(row_number() OVER (PARTITION BY lang
        |             ORDER BY skey DESC, doc_id ASC) AS BIGINT) AS rn
        |      FROM s)
        |SELECT lang, doc_id, n_chars, rn FROM r WHERE rn <= 3
        |ORDER BY lang, rn""".stripMargin,

    "q_ngram_jaccard" ->
      """WITH d AS (SELECT doc_id, n_chars // 200 AS blk, string_split(text, ' ') AS w
        |           FROM documents WHERE lang = 'fr'),
        |sarr AS (SELECT doc_id, blk,
        |           list_distinct(list_transform(range(1, len(w) - 1),
        |                         i -> array_to_string(w[i:i+2], ' '))) AS sh
        |         FROM d),
        |sz AS (SELECT doc_id, len(sh) AS nsh FROM sarr),
        |e AS (SELECT doc_id, blk, unnest(sh) AS s FROM sarr),
        |p AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS c
        |      FROM e a JOIN e b ON a.blk = b.blk AND a.s = b.s AND a.doc_id < b.doc_id
        |      GROUP BY 1, 2)
        |SELECT doc_a, doc_b,
        | floor(CAST(c AS DOUBLE) / CAST(za.nsh + zb.nsh - c AS DOUBLE)
        |       * 10000.0 + 0.5) / 10000.0 AS jaccard
        |FROM p JOIN sz za ON za.doc_id = doc_a JOIN sz zb ON zb.doc_id = doc_b
        |ORDER BY jaccard DESC, doc_a, doc_b LIMIT 50""".stripMargin,

    "q_tfidf" ->
      """WITH toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
        |tf AS (SELECT doc_id, term, count(*) AS tf FROM toks WHERE term <> '' GROUP BY 1, 2),
        |dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
        |n AS (SELECT count(*) AS n_docs FROM documents),
        |scored AS (SELECT doc_id, term, tf, df,
        |             CAST(tf AS DOUBLE) * ln(CAST(n_docs AS DOUBLE) / CAST(df AS DOUBLE)) AS tfidf
        |           FROM tf JOIN dfreq USING (term) CROSS JOIN n),
        |ranked AS (SELECT doc_id, term, tf, df, tfidf,
        |             row_number() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, term ASC) AS rn
        |           FROM scored)
        |SELECT doc_id, CAST(rn AS BIGINT) AS rn, term, tf, df,
        | floor(tfidf * 10000.0 + 0.5) / 10000.0 AS tfidf
        |FROM ranked WHERE rn <= 3
        |ORDER BY doc_id, rn""".stripMargin,

    "q_token_entropy" ->
      """WITH toks AS (SELECT lang, unnest(string_split(text, ' ')) AS term FROM documents),
        |cnt AS (SELECT lang, term, count(*) AS c FROM toks WHERE term <> '' GROUP BY 1, 2),
        |agg AS (SELECT lang, CAST(sum(c) AS BIGINT) AS n_tokens, count(*) AS n_terms,
        |          sum(CAST(CAST(c AS DOUBLE) * ln(CAST(c AS DOUBLE)) AS DECIMAL(28,8))) AS sclogc
        |        FROM cnt GROUP BY 1)
        |SELECT lang, n_tokens, n_terms,
        | floor((ln(CAST(n_tokens AS DOUBLE)) - CAST(sclogc AS DOUBLE) / CAST(n_tokens AS DOUBLE))
        |       * 10000.0 + 0.5) / 10000.0 AS entropy_nats
        |FROM agg ORDER BY lang""".stripMargin,

    "q_quality_band" ->
      """WITH f AS (
        |  SELECT doc_id, lang,
        |    CAST(length(text) AS DOUBLE) AS n,
        |    CAST(length(text) - length(regexp_replace(text, '[A-Za-z]', '', 'g')) AS DOUBLE) AS alpha,
        |    CAST(length(text) - length(regexp_replace(text, ' ', '', 'g')) AS DOUBLE) AS spaces,
        |    CAST(len(regexp_extract_all(text, '\bthe\b|\ba\b|\bof\b')) AS DOUBLE) AS stops
        |  FROM documents),
        |s AS (SELECT doc_id, lang,
        |        0.5 * (alpha / n) + 0.3 * least(1.0, ((n - spaces) / (spaces + 1.0)) / 8.0)
        |          + 0.2 * least(1.0, stops / 10.0) AS q
        |      FROM f),
        |th AS (SELECT quantile_cont(q, 0.1) AS p_lo, quantile_cont(q, 0.9) AS p_hi FROM s)
        |SELECT doc_id, lang, floor(q * 10000.0 + 0.5) / 10000.0 AS quality_score
        |FROM s CROSS JOIN th
        |WHERE q >= p_lo AND q <= p_hi
        |ORDER BY doc_id""".stripMargin,

    "q_hll_gated" ->
      """WITH tw AS (
        |  SELECT CAST(l_orderkey AS VARCHAR) AS word FROM lineitem),
        |hw AS (
        |  SELECT DISTINCT word FROM tw),
        |hh AS (
        |  SELECT word,
        |         CAST(('0x' || substr(md5(word), 1, 12)) AS BIGINT) AS h
        |  FROM hw),
        |regs AS (
        |  SELECT h % 1024 AS idx,
        |         max(CASE WHEN h // 1024 > 0 THEN 39 - length(bin(h // 1024))
        |                  ELSE 39 END) AS mj
        |  FROM hh GROUP BY 1),
        |agg AS (
        |  SELECT CAST(count(*) AS BIGINT) AS occ,
        |         sum(1.0 / (CAST(1 AS BIGINT) << mj)) AS hsum
        |  FROM regs),
        |ex AS (SELECT CAST(count(DISTINCT word) AS BIGINT) AS exact_distinct FROM tw)
        |SELECT exact_distinct,
        |       1024 - occ AS empty_registers,
        |       floor((0.7213 / (1.0 + 1.079 / 1024.0)) * 1024.0 * 1024.0 /
        |             (hsum + CAST(1024 - occ AS DOUBLE)) * 10000.0 + 0.5) / 10000.0
        |         AS hll_est
        |FROM ex, agg""".stripMargin,

    "q_cms_gated" -> {
      val P = 2147483647L
      def slotSql(h: String): String = {
        val aCase = (0 until 4).map(d =>
          s"WHEN $d THEN ${operators.Dedup.cwCoef("cmsa", d, P - 1, 1L)}").mkString(" ")
        val bCase = (0 until 4).map(d =>
          s"WHEN $d THEN ${operators.Dedup.cwCoef("cmsb", d, P, 0L)}").mkString(" ")
        s"((CASE d $aCase END) * $h + (CASE d $bCase END)) % $P % 1024"
      }
      s"""WITH toks AS (
        |  SELECT unnest(string_split(lower(text), ' ')) AS word FROM documents),
        |tw AS (SELECT word FROM toks WHERE word <> ''),
        |hw AS (
        |  SELECT word,
        |         CAST(('0x' || substr(md5(word), 1, 12)) AS BIGINT) % $P AS h
        |  FROM tw),
        |cells AS (
        |  SELECT d, ${slotSql("h")} AS slot, CAST(count(*) AS BIGINT) AS cell
        |  FROM hw, (SELECT unnest([0, 1, 2, 3]) AS d)
        |  GROUP BY 1, 2),
        |exact AS (
        |  SELECT word, CAST(count(*) AS BIGINT) AS exact_n
        |  FROM tw GROUP BY word ORDER BY exact_n DESC, word LIMIT 20),
        |eh AS (
        |  SELECT word, exact_n,
        |         CAST(('0x' || substr(md5(word), 1, 12)) AS BIGINT) % $P AS h
        |  FROM exact),
        |es AS (
        |  SELECT word, exact_n, d, ${slotSql("h")} AS slot
        |  FROM eh, (SELECT unnest([0, 1, 2, 3]) AS d))
        |SELECT word, exact_n, min(cell) AS cms_est
        |FROM es JOIN cells USING (d, slot)
        |GROUP BY word, exact_n ORDER BY word""".stripMargin
    },

    "q_ngram_lm" ->
      """WITH toks AS (
        |  SELECT doc_id,
        |         unnest(string_split(lower(text), ' ')) AS word,
        |         generate_subscripts(string_split(lower(text), ' '), 1) AS pos
        |  FROM documents),
        |pairs AS (
        |  SELECT w1, w2 FROM (
        |    SELECT word AS w1,
        |           lead(word) OVER (PARTITION BY doc_id ORDER BY pos) AS w2
        |    FROM toks)
        |  WHERE length(w1) > 0 AND length(w2) > 0),
        |uni AS (SELECT word, count(*) AS c FROM toks
        |        WHERE length(word) > 0 GROUP BY word),
        |v AS (SELECT count(*) AS v FROM uni),
        |big AS (SELECT w1, w2, count(*) AS c_xy FROM pairs
        |        GROUP BY w1, w2 HAVING count(*) >= 5),
        |scored AS (
        |  SELECT b.w1, b.w2, b.c_xy,
        |         CAST(b.c_xy + 1 AS DOUBLE) / CAST(u.c + v.v AS DOUBLE) AS p_smooth
        |  FROM big b JOIN uni u ON b.w1 = u.word, v),
        |ranked AS (
        |  SELECT w1, w2, c_xy, p_smooth,
        |         row_number() OVER (PARTITION BY w1
        |                            ORDER BY p_smooth DESC, w2) AS rk
        |  FROM scored)
        |SELECT w1, CAST(rk AS BIGINT) AS rk, w2, c_xy,
        | floor(p_smooth * 10000.0 + 0.5) / 10000.0 AS p_smooth
        |FROM ranked WHERE rk <= 3 ORDER BY w1, rk""".stripMargin,

    "q_domain_cap" ->
      """WITH r AS (SELECT source, doc_id, n_chars,
        |  row_number() OVER (PARTITION BY source
        |                     ORDER BY n_chars DESC, doc_id) AS rk
        | FROM documents)
        |SELECT source, CAST(rk AS BIGINT) AS rk, doc_id, n_chars
        |FROM r WHERE rk <= 10 ORDER BY source, rk""".stripMargin,

    "q_perplexity_filter" ->
      """WITH toks AS (
        |  SELECT doc_id,
        |         unnest(string_split(lower(text), ' ')) AS word,
        |         generate_subscripts(string_split(lower(text), ' '), 1) AS pos
        |  FROM documents),
        |pairs AS (
        |  SELECT doc_id, w1, w2 FROM (
        |    SELECT doc_id, word AS w1,
        |           lead(word) OVER (PARTITION BY doc_id ORDER BY pos) AS w2
        |    FROM toks)
        |  WHERE length(w1) > 0 AND length(w2) > 0),
        |uni AS (SELECT word, count(*) AS c FROM toks
        |        WHERE length(word) > 0 GROUP BY word),
        |v AS (SELECT count(*) AS v FROM uni),
        |big AS (SELECT w1, w2, count(*) AS c_xy FROM pairs GROUP BY w1, w2),
        |scored AS (
        |  SELECT p.doc_id,
        |         CAST(floor(-ln(CAST(b.c_xy + 1 AS DOUBLE)
        |                        / CAST(u.c + v.v AS DOUBLE)) * 1000000.0 + 0.5)
        |              AS BIGINT) AS nll_q
        |  FROM pairs p
        |  JOIN big b ON p.w1 = b.w1 AND p.w2 = b.w2
        |  JOIN uni u ON p.w1 = u.word, v)
        |SELECT doc_id, count(*) AS n_bigrams,
        | floor(CAST(sum(nll_q) AS DOUBLE) / 1000000.0 / count(*) * 10000.0 + 0.5) / 10000.0 AS avg_nll,
        | sum(nll_q) < 8000000 * count(*) AS is_kept
        |FROM scored GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "q_bpe_apply" ->
      """WITH w0 AS (
        |  SELECT count(*) AS wc, regexp_replace(word, '(.)', '(\1)', 'g') AS repr
        |  FROM (SELECT unnest(string_split(lower(text), ' ')) AS word FROM documents)
        |  WHERE regexp_matches(word, '^[a-z]{2,}$')
        |  GROUP BY word),
        |c1 AS (SELECT sym[i] AS a, sym[i+1] AS b, CAST(sum(wc) AS BIGINT) AS n
        |       FROM (SELECT wc, string_split(repr[2:-2], ')(') AS sym FROM w0),
        |            LATERAL unnest(generate_series(1, len(sym)-1)) t(i)
        |       GROUP BY 1, 2),
        |b1 AS (SELECT a, b, n FROM c1 ORDER BY n DESC, a, b LIMIT 1),
        |w1 AS (SELECT wc, replace(repr, '(' || b1.a || ')(' || b1.b || ')',
        |                          '(' || b1.a || b1.b || ')') AS repr FROM w0, b1),
        |c2 AS (SELECT sym[i] AS a, sym[i+1] AS b, CAST(sum(wc) AS BIGINT) AS n
        |       FROM (SELECT wc, string_split(repr[2:-2], ')(') AS sym FROM w1),
        |            LATERAL unnest(generate_series(1, len(sym)-1)) t(i)
        |       GROUP BY 1, 2),
        |b2 AS (SELECT a, b, n FROM c2 ORDER BY n DESC, a, b LIMIT 1),
        |w2 AS (SELECT wc, replace(repr, '(' || b2.a || ')(' || b2.b || ')',
        |                          '(' || b2.a || b2.b || ')') AS repr FROM w1, b2),
        |c3 AS (SELECT sym[i] AS a, sym[i+1] AS b, CAST(sum(wc) AS BIGINT) AS n
        |       FROM (SELECT wc, string_split(repr[2:-2], ')(') AS sym FROM w2),
        |            LATERAL unnest(generate_series(1, len(sym)-1)) t(i)
        |       GROUP BY 1, 2),
        |b3 AS (SELECT a, b, n FROM c3 ORDER BY n DESC, a, b LIMIT 1),
        |w3 AS (SELECT wc, replace(repr, '(' || b3.a || ')(' || b3.b || ')',
        |                          '(' || b3.a || b3.b || ')') AS repr FROM w2, b3),
        |c4 AS (SELECT sym[i] AS a, sym[i+1] AS b, CAST(sum(wc) AS BIGINT) AS n
        |       FROM (SELECT wc, string_split(repr[2:-2], ')(') AS sym FROM w3),
        |            LATERAL unnest(generate_series(1, len(sym)-1)) t(i)
        |       GROUP BY 1, 2),
        |b4 AS (SELECT a, b, n FROM c4 ORDER BY n DESC, a, b LIMIT 1),
        |w4 AS (SELECT wc, replace(repr, '(' || b4.a || ')(' || b4.b || ')',
        |                          '(' || b4.a || b4.b || ')') AS repr FROM w3, b4),
        |c5 AS (SELECT sym[i] AS a, sym[i+1] AS b, CAST(sum(wc) AS BIGINT) AS n
        |       FROM (SELECT wc, string_split(repr[2:-2], ')(') AS sym FROM w4),
        |            LATERAL unnest(generate_series(1, len(sym)-1)) t(i)
        |       GROUP BY 1, 2),
        |b5 AS (SELECT a, b, n FROM c5 ORDER BY n DESC, a, b LIMIT 1),
        |rules AS (SELECT max(CASE WHEN r = 1 THEN a END) AS a1, max(CASE WHEN r = 1 THEN b END) AS b1, max(CASE WHEN r = 2 THEN a END) AS a2, max(CASE WHEN r = 2 THEN b END) AS b2, max(CASE WHEN r = 3 THEN a END) AS a3, max(CASE WHEN r = 3 THEN b END) AS b3, max(CASE WHEN r = 4 THEN a END) AS a4, max(CASE WHEN r = 4 THEN b END) AS b4, max(CASE WHEN r = 5 THEN a END) AS a5, max(CASE WHEN r = 5 THEN b END) AS b5
        |          FROM (SELECT 1 AS r, a, b FROM b1 UNION ALL SELECT 2 AS r, a, b FROM b2 UNION ALL SELECT 3 AS r, a, b FROM b3 UNION ALL SELECT 4 AS r, a, b FROM b4 UNION ALL SELECT 5 AS r, a, b FROM b5)),
        |tok AS (SELECT doc_id, word FROM (
        |          SELECT doc_id, unnest(string_split(lower(text), ' ')) AS word
        |          FROM documents)
        |        WHERE regexp_matches(word, '^[a-z]{2,}$')),
        |ap AS (SELECT doc_id, CAST(length(word) AS BIGINT) AS n_chars,
        |         CAST(len(regexp_extract_all(
        |           replace(replace(replace(replace(replace(regexp_replace(word, '(.)', '(\1)', 'g'), '(' || a1 || ')(' || b1 || ')', '(' || a1 || b1 || ')'), '(' || a2 || ')(' || b2 || ')', '(' || a2 || b2 || ')'), '(' || a3 || ')(' || b3 || ')', '(' || a3 || b3 || ')'), '(' || a4 || ')(' || b4 || ')', '(' || a4 || b4 || ')'), '(' || a5 || ')(' || b5 || ')', '(' || a5 || b5 || ')'),
        |           '\(')) AS BIGINT) AS n_sym
        |       FROM tok CROSS JOIN rules)
        |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_alpha_words,
        |       CAST(sum(n_chars) AS BIGINT) AS n_chars_tokens,
        |       CAST(sum(n_sym) AS BIGINT) AS n_bpe_tokens,
        |       floor(CAST(sum(n_sym) AS DOUBLE) / CAST(sum(n_chars) AS DOUBLE)
        |             * 10000.0 + 0.5) / 10000.0 AS compression
        |FROM ap GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "q_bpe_train" ->
      """WITH w0 AS (
        |  SELECT count(*) AS wc, regexp_replace(word, '(.)', '(\1)', 'g') AS repr
        |  FROM (SELECT unnest(string_split(lower(text), ' ')) AS word FROM documents)
        |  WHERE regexp_matches(word, '^[a-z]{2,}$')
        |  GROUP BY word),
        |c1 AS (SELECT sym[i] AS a, sym[i+1] AS b, CAST(sum(wc) AS BIGINT) AS n
        |       FROM (SELECT wc, string_split(repr[2:-2], ')(') AS sym FROM w0),
        |            LATERAL unnest(generate_series(1, len(sym)-1)) t(i)
        |       GROUP BY 1, 2),
        |b1 AS (SELECT a, b, n FROM c1 ORDER BY n DESC, a, b LIMIT 1),
        |w1 AS (SELECT wc, replace(repr, '(' || b1.a || ')(' || b1.b || ')',
        |                          '(' || b1.a || b1.b || ')') AS repr FROM w0, b1),
        |c2 AS (SELECT sym[i] AS a, sym[i+1] AS b, CAST(sum(wc) AS BIGINT) AS n
        |       FROM (SELECT wc, string_split(repr[2:-2], ')(') AS sym FROM w1),
        |            LATERAL unnest(generate_series(1, len(sym)-1)) t(i)
        |       GROUP BY 1, 2),
        |b2 AS (SELECT a, b, n FROM c2 ORDER BY n DESC, a, b LIMIT 1),
        |w2 AS (SELECT wc, replace(repr, '(' || b2.a || ')(' || b2.b || ')',
        |                          '(' || b2.a || b2.b || ')') AS repr FROM w1, b2),
        |c3 AS (SELECT sym[i] AS a, sym[i+1] AS b, CAST(sum(wc) AS BIGINT) AS n
        |       FROM (SELECT wc, string_split(repr[2:-2], ')(') AS sym FROM w2),
        |            LATERAL unnest(generate_series(1, len(sym)-1)) t(i)
        |       GROUP BY 1, 2),
        |b3 AS (SELECT a, b, n FROM c3 ORDER BY n DESC, a, b LIMIT 1),
        |w3 AS (SELECT wc, replace(repr, '(' || b3.a || ')(' || b3.b || ')',
        |                          '(' || b3.a || b3.b || ')') AS repr FROM w2, b3),
        |c4 AS (SELECT sym[i] AS a, sym[i+1] AS b, CAST(sum(wc) AS BIGINT) AS n
        |       FROM (SELECT wc, string_split(repr[2:-2], ')(') AS sym FROM w3),
        |            LATERAL unnest(generate_series(1, len(sym)-1)) t(i)
        |       GROUP BY 1, 2),
        |b4 AS (SELECT a, b, n FROM c4 ORDER BY n DESC, a, b LIMIT 1),
        |w4 AS (SELECT wc, replace(repr, '(' || b4.a || ')(' || b4.b || ')',
        |                          '(' || b4.a || b4.b || ')') AS repr FROM w3, b4),
        |c5 AS (SELECT sym[i] AS a, sym[i+1] AS b, CAST(sum(wc) AS BIGINT) AS n
        |       FROM (SELECT wc, string_split(repr[2:-2], ')(') AS sym FROM w4),
        |            LATERAL unnest(generate_series(1, len(sym)-1)) t(i)
        |       GROUP BY 1, 2),
        |b5 AS (SELECT a, b, n FROM c5 ORDER BY n DESC, a, b LIMIT 1)
        |SELECT CAST(r AS BIGINT) AS merge_round, a, b, a || b AS merged, n
        |FROM (SELECT 1 AS r, * FROM b1 UNION ALL SELECT 2, * FROM b2
        |      UNION ALL SELECT 3, * FROM b3 UNION ALL SELECT 4, * FROM b4
        |      UNION ALL SELECT 5, * FROM b5)
        |ORDER BY merge_round""".stripMargin,

    "q_bpe_merges" ->
      """WITH words AS (
        |  SELECT word, count(*) AS wc FROM (
        |    SELECT unnest(string_split(lower(text), ' ')) AS word FROM documents)
        |  WHERE length(word) >= 2 GROUP BY word),
        |pairs AS (
        |  SELECT substr(word, CAST(i AS INT), 2) AS pair, wc
        |  FROM words, LATERAL unnest(generate_series(1, length(word) - 1)) t(i))
        |SELECT pair, CAST(sum(wc) AS BIGINT) AS n
        |FROM pairs GROUP BY pair
        |ORDER BY n DESC, pair ASC LIMIT 20""".stripMargin,

    "q_seqlen_percentiles" ->
      """WITH d AS (
        |  SELECT lang,
        |         CAST(len(list_filter(string_split(text, ' '), x -> x <> '')) AS BIGINT) AS n_tokens
        |  FROM documents)
        |SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
        | floor(quantile_cont(n_tokens, 0.5) * 10000.0 + 0.5) / 10000.0 AS p50,
        | floor(quantile_cont(n_tokens, 0.9) * 10000.0 + 0.5) / 10000.0 AS p90,
        | floor(quantile_cont(n_tokens, 0.99) * 10000.0 + 0.5) / 10000.0 AS p99,
        | max(n_tokens) AS max_tokens
        |FROM d GROUP BY lang ORDER BY lang""".stripMargin,

    "q_dedup_savings" ->
      """WITH c AS (
        |  SELECT md5(lower(trim(regexp_replace(text, '\s+', ' ', 'g')))) AS content_key,
        |         count(*) AS sz
        |  FROM documents GROUP BY 1)
        |SELECT sz AS cluster_size, CAST(count(*) AS BIGINT) AS n_clusters,
        |       CAST(sum(sz - 1) AS BIGINT) AS docs_removed
        |FROM c GROUP BY sz ORDER BY sz""".stripMargin,

    "q_oov_rate" ->
      """WITH toks AS (
        |  SELECT doc_id, word FROM (
        |    SELECT doc_id, unnest(string_split(lower(text), ' ')) AS word
        |    FROM documents) u
        |  WHERE word <> ''),
        |vocab AS (
        |  SELECT word, 1 AS in_vocab FROM (
        |    SELECT word, count(*) AS n FROM toks GROUP BY word
        |    ORDER BY n DESC, word ASC LIMIT 200) v)
        |SELECT t.doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
        |       CAST(count(vocab.in_vocab) AS BIGINT) AS n_in_vocab,
        | floor((1.0 - CAST(count(vocab.in_vocab) AS DOUBLE)
        |             / CAST(count(*) AS DOUBLE)) * 10000.0 + 0.5) / 10000.0 AS oov_rate
        |FROM toks t LEFT JOIN vocab ON t.word = vocab.word
        |GROUP BY t.doc_id ORDER BY t.doc_id""".stripMargin,

    "q_posting_stats" ->
      """WITH tw AS (SELECT doc_id,
        |    unnest(list_distinct(string_split(lower(text), ' '))) AS w
        |  FROM documents),
        |dfq AS (SELECT w, CAST(count(*) AS BIGINT) AS df
        |        FROM tw WHERE w <> '' GROUP BY 1)
        |SELECT CAST(length(bin(df)) AS BIGINT) AS df_bucket,
        |       CAST(count(*) AS BIGINT) AS n_terms,
        |       CAST(sum(df) AS BIGINT) AS postings,
        |       min(df) AS min_df, max(df) AS max_df
        |FROM dfq GROUP BY 1 ORDER BY df_bucket""".stripMargin,

    "q_bm25" ->
      """WITH dl AS (
        |  SELECT doc_id, text,
        |         CAST(len(list_filter(string_split(text, ' '), x -> x <> '')) AS BIGINT) AS len
        |  FROM documents),
        |st AS (SELECT count(*) AS n_docs, CAST(sum(len) AS BIGINT) AS sum_len FROM dl),
        |tf AS (
        |  SELECT doc_id, len, term, count(*) AS tf FROM (
        |    SELECT doc_id, len, unnest(string_split(lower(text), ' ')) AS term FROM dl) u
        |  WHERE term IN ('join', 'hash', 'scan') GROUP BY doc_id, len, term),
        |dfq AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
        |s AS (
        |  SELECT tf.doc_id,
        |    ln(1.0 + (CAST(st.n_docs AS DOUBLE) - CAST(dfq.df AS DOUBLE) + 0.5)
        |              / (CAST(dfq.df AS DOUBLE) + 0.5))
        |    * (CAST(tf.tf AS DOUBLE) * (1.2 + 1.0))
        |    / (CAST(tf.tf AS DOUBLE) + 1.2 * (1.0 - 0.75 + 0.75 * CAST(tf.len AS DOUBLE)
        |         / (CAST(st.sum_len AS DOUBLE) / CAST(st.n_docs AS DOUBLE)))) AS sc
        |  FROM tf JOIN dfq ON tf.term = dfq.term CROSS JOIN st)
        |SELECT doc_id,
        | floor(CAST(sum(CAST(sc AS DECIMAL(28,8))) AS DOUBLE) * 10000.0 + 0.5) / 10000.0 AS bm25
        |FROM s GROUP BY doc_id
        |ORDER BY bm25 DESC, doc_id ASC LIMIT 20""".stripMargin,

    "q_par_dedup" ->
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
        |st AS (SELECT doc_id, ws,
        |              unnest(generate_series(0, len(ws) - 1, 20)) AS i
        |       FROM w),
        |par AS (SELECT doc_id, CAST(i // 20 AS BIGINT) AS par_idx,
        |               array_to_string(ws[(i + 1):(i + 20)], ' ') AS pt
        |        FROM st),
        |keep AS (SELECT doc_id, par_idx,
        |         row_number() OVER (PARTITION BY pt
        |                            ORDER BY doc_id, par_idx) AS rn
        |         FROM par),
        |kept AS (SELECT p.doc_id, CAST(count(*) AS BIGINT) AS n_kept,
        |                string_agg(p.pt, ' ' ORDER BY p.par_idx) AS kt
        |         FROM par p JOIN keep k USING (doc_id, par_idx)
        |         WHERE k.rn = 1 GROUP BY p.doc_id),
        |tot AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_pars
        |        FROM par GROUP BY 1)
        |SELECT t.doc_id, t.n_pars,
        | CAST(t.n_pars - COALESCE(kept.n_kept, 0) AS BIGINT) AS n_removed,
        | COALESCE(kept.kt, '') AS kept_text
        |FROM tot t LEFT JOIN kept USING (doc_id) ORDER BY doc_id""".stripMargin,

    "q_boilerplate" ->
      """WITH w AS (SELECT doc_id, source, string_split(text, ' ') AS ws
        |           FROM documents),
        |st AS (SELECT doc_id, source, ws,
        |              unnest(generate_series(0, len(ws) - 1, 20)) AS i
        |       FROM w),
        |par AS (SELECT doc_id, source,
        |               array_to_string(ws[(i + 1):(i + 20)], ' ') AS pt
        |        FROM st),
        |pp AS (SELECT source, pt, CAST(count(*) AS BIGINT) AS n_inst,
        |              CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs
        |       FROM par GROUP BY 1, 2)
        |SELECT source,
        | CAST(sum(n_inst) AS BIGINT) AS n_par_instances,
        | CAST(count(*) AS BIGINT) AS n_distinct_pars,
        | CAST(sum(CASE WHEN n_docs >= 2 THEN 1 ELSE 0 END) AS BIGINT)
        |   AS n_boilerplate,
        | floor(CAST(sum(CASE WHEN n_docs >= 2 THEN 1 ELSE 0 END) AS DOUBLE)
        |       / CAST(count(*) AS DOUBLE) * 10000.0 + 0.5) / 10000.0
        |   AS boilerplate_ratio
        |FROM pp GROUP BY source ORDER BY source""".stripMargin,

    "q_token_budget_mix" ->
      """WITH per AS (SELECT source,
        |  CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS toks,
        |  CAST(sum(len(list_distinct(string_split(text, ' ')))) AS BIGINT) AS dtoks
        | FROM documents GROUP BY 1),
        |u AS (SELECT source, toks, dtoks,
        |        CAST(dtoks AS DOUBLE) / CAST(toks AS DOUBLE) AS util
        |      FROM per),
        |rk AS (SELECT *,
        |  CAST(row_number() OVER (ORDER BY util DESC, source ASC) AS BIGINT) AS rank,
        |  COALESCE(sum(toks) OVER (ORDER BY util DESC, source ASC
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_before
        | FROM u),
        |al AS (SELECT *,
        |  greatest(0, least(toks, 50000 - cum_before)) AS alloc FROM rk)
        |SELECT source, rank, toks AS tokens_available,
        | floor(util * 10000.0 + 0.5) / 10000.0 AS utility,
        | CAST(alloc AS BIGINT) AS tokens_allocated,
        | floor(CAST(alloc AS DOUBLE) / CAST(toks AS DOUBLE) * 10000.0 + 0.5)
        |   / 10000.0 AS fill_frac
        |FROM al ORDER BY source""".stripMargin,

    "q_split_leakage" ->
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
        |st AS (SELECT doc_id, ws,
        |              unnest(generate_series(0, len(ws) - 1, 20)) AS i
        |       FROM w),
        |fp AS (SELECT doc_id,
        |  array_to_string(ws[(i + 1):(i + 20)], ' ') AS fp,
        |  CASE WHEN doc_id % 10 < 8 THEN 'train'
        |       WHEN doc_id % 10 = 8 THEN 'val' ELSE 'test' END AS split,
        |  CASE WHEN doc_id % 10 < 8 THEN 0
        |       WHEN doc_id % 10 = 8 THEN 1 ELSE 2 END AS rk
        | FROM st),
        |sets AS (SELECT DISTINCT fp, split, rk FROM fp),
        |pairs AS (SELECT a.fp, a.split AS split_a, b.split AS split_b
        |          FROM sets a JOIN sets b ON a.fp = b.fp AND a.rk < b.rk),
        |shared AS (SELECT split_a, split_b,
        |                  CAST(count(DISTINCT fp) AS BIGINT) AS n_shared_fps
        |           FROM pairs GROUP BY 1, 2),
        |leaked AS (SELECT a.split AS split_a, d.split AS split_b,
        |                  CAST(count(DISTINCT d.doc_id) AS BIGINT) AS n_leaked_docs
        |           FROM fp d JOIN sets a ON a.fp = d.fp AND a.rk < d.rk
        |           GROUP BY 1, 2)
        |SELECT split_a, split_b,
        | COALESCE(n_shared_fps, 0) AS n_shared_fps,
        | COALESCE(n_leaked_docs, 0) AS n_leaked_docs
        |FROM shared FULL OUTER JOIN leaked USING (split_a, split_b)
        |ORDER BY split_a, split_b""".stripMargin,

    "q_ndcg" ->
      """WITH wl AS (SELECT doc_id, text,
        |  CAST(len(list_filter(string_split(text, ' '), x -> x <> '')) AS BIGINT) AS len
        | FROM documents),
        |st AS (SELECT CAST(count(*) AS BIGINT) AS n_docs,
        |              CAST(sum(len) AS BIGINT) AS sum_len FROM wl),
        |tf AS (SELECT doc_id, len, t AS term, CAST(count(*) AS BIGINT) AS tf
        |       FROM (SELECT doc_id, len, unnest(string_split(lower(text), ' ')) AS t
        |             FROM wl)
        |       WHERE t IN ('join', 'hash', 'scan') GROUP BY 1, 2, 3),
        |dfreq AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY 1),
        |sc AS (SELECT doc_id,
        |  floor(CAST(sum(CAST(
        |    ln(1.0 + (CAST(n_docs AS DOUBLE) - CAST(df AS DOUBLE) + 0.5)
        |             / (CAST(df AS DOUBLE) + 0.5))
        |    * (CAST(tf AS DOUBLE) * 2.2)
        |    / (CAST(tf AS DOUBLE) + 1.2 * (1.0 - 0.75 + 0.75 * CAST(len AS DOUBLE)
        |         / (CAST(sum_len AS DOUBLE) / CAST(n_docs AS DOUBLE))))
        |    AS DECIMAL(28,8))) AS DOUBLE) * 10000.0 + 0.5) / 10000.0 AS bm25
        | FROM tf JOIN dfreq USING (term) CROSS JOIN st GROUP BY doc_id),
        |topk AS (SELECT doc_id, bm25,
        |           row_number() OVER (ORDER BY bm25 DESC, doc_id ASC) AS i
        |         FROM sc ORDER BY bm25 DESC, doc_id ASC LIMIT 20),
        |rel AS (SELECT doc_id,
        |  (len(list_filter(string_split(lower(text), ' '), x -> x = 'join')) >= 3
        |   AND len(list_filter(string_split(lower(text), ' '), x -> x = 'hash')) >= 3
        |   AND len(list_filter(string_split(lower(text), ' '), x -> x = 'scan')) >= 3)
        |    AS relevant
        | FROM documents),
        |tot AS (SELECT CAST(sum(CASE WHEN relevant THEN 1 ELSE 0 END) AS BIGINT) AS r
        |        FROM rel),
        |scored AS (SELECT
        |  sum(CASE WHEN relevant
        |       THEN CAST(1.0 / log2(CAST(i AS DOUBLE) + 1.0) AS DECIMAL(28,8))
        |       ELSE CAST(0 AS DECIMAL(28,8)) END) AS dcg,
        |  CAST(sum(CASE WHEN relevant THEN 1 ELSE 0 END) AS BIGINT) AS hits
        | FROM topk JOIN rel USING (doc_id)),
        |ig AS (SELECT r, unnest(generate_series(1, least(20, CAST(r AS INT)))) AS i
        |       FROM tot),
        |idcg AS (SELECT r,
        |  sum(CAST(1.0 / log2(CAST(i AS DOUBLE) + 1.0) AS DECIMAL(28,8))) AS idcg
        | FROM ig GROUP BY r)
        |SELECT CAST(20 AS BIGINT) AS k, r AS n_relevant_total,
        | hits AS n_relevant_topk,
        | floor(CAST(dcg AS DOUBLE) * 10000.0 + 0.5) / 10000.0 AS dcg,
        | floor(CAST(idcg AS DOUBLE) * 10000.0 + 0.5) / 10000.0 AS idcg,
        | floor(CAST(dcg AS DOUBLE) / CAST(idcg AS DOUBLE) * 10000.0 + 0.5)
        |   / 10000.0 AS ndcg,
        | floor(CAST(hits AS DOUBLE) / 20.0 * 10000.0 + 0.5) / 10000.0
        |   AS precision_k,
        | floor(CAST(hits AS DOUBLE) / CAST(r AS DOUBLE) * 10000.0 + 0.5)
        |   / 10000.0 AS recall_k
        |FROM scored CROSS JOIN idcg""".stripMargin,

    "q_distinctive_terms" ->
      """WITH cells AS (SELECT source, t AS term, CAST(count(*) AS BIGINT) AS tf
        |  FROM (SELECT source, unnest(string_split(lower(text), ' ')) AS t
        |        FROM documents)
        |  WHERE length(t) > 0 GROUP BY 1, 2),
        |totals AS (SELECT source, CAST(sum(tf) AS BIGINT) AS total
        |           FROM cells GROUP BY 1),
        |tfc AS (SELECT term, CAST(sum(tf) AS BIGINT) AS ctf FROM cells GROUP BY 1),
        |grand AS (SELECT CAST(sum(tf) AS BIGINT) AS g FROM cells),
        |scored AS (SELECT source, term, tf,
        |  floor((CAST(tf AS DOUBLE) / CAST(total AS DOUBLE))
        |        / (CAST(ctf AS DOUBLE) / CAST(g AS DOUBLE)) * 10000.0 + 0.5)
        |    / 10000.0 AS lift
        | FROM cells JOIN totals USING (source) JOIN tfc USING (term)
        |      CROSS JOIN grand),
        |rk AS (SELECT *, CAST(row_number() OVER (PARTITION BY source
        |         ORDER BY lift DESC, term ASC) AS BIGINT) AS rank
        |       FROM scored)
        |SELECT source, rank, term, tf, lift FROM rk
        |WHERE rank <= 3 ORDER BY source, rank""".stripMargin,

    "q_calibration_bins" ->
      """WITH f AS (
        |  SELECT (lang = 'en') AS truth_en,
        |    least(1.0,
        |      CAST((length(text) - length(replace(text, 'th', ''))) // 2
        |           + len(regexp_extract_all(text, '\bthe\b|\band\b|\bis\b'))
        |           AS DOUBLE)
        |      * 100.0 / CAST(length(text) AS DOUBLE) / 6.0) AS p_hat
        |  FROM documents),
        |b AS (SELECT least(9, CAST(floor(p_hat * 10.0) AS BIGINT)) AS bin,
        |             p_hat, truth_en
        |      FROM f)
        |SELECT bin, CAST(count(*) AS BIGINT) AS n,
        | floor(CAST(sum(CAST(p_hat AS DECIMAL(38,18))) AS DOUBLE)
        |       / CAST(count(*) AS DOUBLE) * 10000.0 + 0.5) / 10000.0 AS avg_score,
        | floor(CAST(sum(CASE WHEN truth_en THEN 1 ELSE 0 END) AS DOUBLE)
        |       / CAST(count(*) AS DOUBLE) * 10000.0 + 0.5) / 10000.0 AS obs_rate,
        | floor(abs(CAST(sum(CAST(p_hat AS DECIMAL(38,18))) AS DOUBLE)
        |           / CAST(count(*) AS DOUBLE)
        |           - CAST(sum(CASE WHEN truth_en THEN 1 ELSE 0 END) AS DOUBLE)
        |             / CAST(count(*) AS DOUBLE)) * 10000.0 + 0.5) / 10000.0 AS gap
        |FROM b GROUP BY bin ORDER BY bin""".stripMargin,

    "q_llr_collocations" ->
      """WITH toks AS (
        |  SELECT doc_id, t.w AS word, t.pos
        |  FROM (SELECT doc_id,
        |          unnest(string_split(lower(text), ' ')) AS w,
        |          generate_subscripts(string_split(lower(text), ' '), 1) AS pos
        |        FROM documents) t(doc_id, w, pos)),
        |pairs AS (
        |  SELECT word AS w1,
        |         lead(word, 1) OVER (PARTITION BY doc_id ORDER BY pos) AS w2
        |  FROM toks),
        |pp AS (SELECT w1, w2 FROM pairs
        |       WHERE length(w1) > 0 AND w2 IS NOT NULL AND length(w2) > 0),
        |big AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS k11
        |        FROM pp GROUP BY 1, 2),
        |lft AS (SELECT w1, CAST(count(*) AS BIGINT) AS r1 FROM pp GROUP BY 1),
        |rgt AS (SELECT w2, CAST(count(*) AS BIGINT) AS c1 FROM pp GROUP BY 1),
        |tot AS (SELECT CAST(count(*) AS BIGINT) AS nn FROM pp),
        |cells AS (SELECT w1, w2, k11, r1, c1, nn,
        |            r1 - k11 AS k12, c1 - k11 AS k21,
        |            nn - r1 - c1 + k11 AS k22
        |          FROM big JOIN lft USING (w1) JOIN rgt USING (w2)
        |          CROSS JOIN tot),
        |scored AS (SELECT w1, w2, k11,
        |  (CASE WHEN k11 > 0 THEN CAST(k11 AS DOUBLE)
        |     * ln(CAST(k11 AS DOUBLE) * CAST(nn AS DOUBLE)
        |          / (CAST(r1 AS DOUBLE) * CAST(c1 AS DOUBLE))) ELSE 0.0 END
        |   + CASE WHEN k12 > 0 THEN CAST(k12 AS DOUBLE)
        |     * ln(CAST(k12 AS DOUBLE) * CAST(nn AS DOUBLE)
        |          / (CAST(r1 AS DOUBLE) * CAST(nn - c1 AS DOUBLE))) ELSE 0.0 END
        |   + CASE WHEN k21 > 0 THEN CAST(k21 AS DOUBLE)
        |     * ln(CAST(k21 AS DOUBLE) * CAST(nn AS DOUBLE)
        |          / (CAST(nn - r1 AS DOUBLE) * CAST(c1 AS DOUBLE))) ELSE 0.0 END
        |   + CASE WHEN k22 > 0 THEN CAST(k22 AS DOUBLE)
        |     * ln(CAST(k22 AS DOUBLE) * CAST(nn AS DOUBLE)
        |          / (CAST(nn - r1 AS DOUBLE) * CAST(nn - c1 AS DOUBLE))) ELSE 0.0 END)
        |  * 2.0 AS llr
        | FROM cells)
        |SELECT w1, w2, k11 AS n_pair,
        | floor(llr * 10000.0 + 0.5) / 10000.0 AS llr
        |FROM scored
        |ORDER BY floor(llr * 10000.0 + 0.5) / 10000.0 DESC, w1 ASC, w2 ASC
        |LIMIT 20""".stripMargin,

    "q_cohens_kappa" ->
      """WITH f AS (
        |  SELECT (lang = 'en') AS truth_en,
        |    (CAST((length(text) - length(replace(text, 'th', ''))) // 2
        |          + len(regexp_extract_all(text, '\bthe\b|\band\b|\bis\b')) AS DOUBLE)
        |     * 100.0 / CAST(length(text) AS DOUBLE) >= 3.0) AS pred_en
        |  FROM documents),
        |c AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(CASE WHEN truth_en AND pred_en THEN 1 ELSE 0 END) AS BIGINT) AS n11,
        |  CAST(sum(CASE WHEN NOT truth_en AND pred_en THEN 1 ELSE 0 END) AS BIGINT) AS n01,
        |  CAST(sum(CASE WHEN truth_en AND NOT pred_en THEN 1 ELSE 0 END) AS BIGINT) AS n10,
        |  CAST(sum(CASE WHEN NOT truth_en AND NOT pred_en THEN 1 ELSE 0 END) AS BIGINT) AS n00
        | FROM f)
        |SELECT n AS n_docs, n11 AS both_en, n01 AS pred_only,
        | n10 AS truth_only, n00 AS both_other,
        | floor(CAST(n11 + n00 AS DOUBLE) / CAST(n AS DOUBLE) * 10000.0 + 0.5)
        |   / 10000.0 AS p_observed,
        | floor((CAST(n11 + n10 AS DOUBLE) * CAST(n11 + n01 AS DOUBLE)
        |        + CAST(n00 + n01 AS DOUBLE) * CAST(n00 + n10 AS DOUBLE))
        |       / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)) * 10000.0 + 0.5)
        |   / 10000.0 AS p_expected,
        | floor((CAST(n11 + n00 AS DOUBLE) / CAST(n AS DOUBLE)
        |        - (CAST(n11 + n10 AS DOUBLE) * CAST(n11 + n01 AS DOUBLE)
        |           + CAST(n00 + n01 AS DOUBLE) * CAST(n00 + n10 AS DOUBLE))
        |          / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)))
        |       / (1.0 - (CAST(n11 + n10 AS DOUBLE) * CAST(n11 + n01 AS DOUBLE)
        |                 + CAST(n00 + n01 AS DOUBLE) * CAST(n00 + n10 AS DOUBLE))
        |                / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)))
        |       * 10000.0 + 0.5) / 10000.0 AS kappa
        |FROM c""".stripMargin,

    "q_readability" ->
      """WITH d AS (
        |  SELECT doc_id,
        |         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words,
        |         greatest(CAST(1 AS BIGINT),
        |                  CAST(len(regexp_extract_all(text, '[.!?]+')) AS BIGINT))
        |           AS n_sentences,
        |         CAST(len(regexp_extract_all(lower(text), '[aeiouy]+')) AS BIGINT)
        |           AS n_syllables
        |  FROM documents)
        |SELECT doc_id, n_words, n_sentences, n_syllables,
        | floor((206.835
        |        - 1.015 * (CAST(n_words AS DOUBLE) / CAST(n_sentences AS DOUBLE))
        |        - 84.6 * (CAST(n_syllables AS DOUBLE) / CAST(n_words AS DOUBLE)))
        |       * 10000.0 + 0.5) / 10000.0 AS flesch
        |FROM d ORDER BY doc_id""".stripMargin,

    "q_jaccard_prefix_join" ->
      """WITH d AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        |sarr AS (SELECT doc_id,
        |           list_distinct(list_transform(range(1, len(w) - 1),
        |                         i -> array_to_string(w[i:i+2], ' '))) AS sh
        |         FROM d),
        |sz AS (SELECT doc_id, len(sh) AS nsh FROM sarr),
        |e AS (SELECT doc_id, unnest(sh) AS s FROM sarr),
        |p AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS c
        |      FROM e a JOIN e b ON a.s = b.s AND a.doc_id < b.doc_id
        |      GROUP BY 1, 2)
        |SELECT doc_a, doc_b,
        | floor(CAST(c AS DOUBLE) / CAST(za.nsh + zb.nsh - c AS DOUBLE)
        |       * 10000.0 + 0.5) / 10000.0 AS jaccard
        |FROM p JOIN sz za ON za.doc_id = doc_a JOIN sz zb ON zb.doc_id = doc_b
        |WHERE c * 3 >= za.nsh + zb.nsh
        |ORDER BY doc_a, doc_b""".stripMargin,

    // NAIVE formulation on purpose (as for q_jaccard_prefix_join): the gate
    // proves the containment prefix prune lossless,

    "q_containment_join" ->
      """WITH d AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        |sarr AS (SELECT doc_id,
        |           list_distinct(list_transform(range(1, len(w) - 1),
        |                         i -> array_to_string(w[i:i+2], ' '))) AS sh
        |         FROM d),
        |sz AS (SELECT doc_id, len(sh) AS nsh FROM sarr),
        |e AS (SELECT doc_id, unnest(sh) AS s FROM sarr),
        |p AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS c
        |      FROM e a JOIN e b ON a.s = b.s AND a.doc_id <> b.doc_id
        |      GROUP BY 1, 2)
        |SELECT doc_a, doc_b,
        | floor(CAST(c AS DOUBLE) / CAST(za.nsh AS DOUBLE)
        |       * 10000.0 + 0.5) / 10000.0 AS containment
        |FROM p JOIN sz za ON za.doc_id = doc_a
        |WHERE c * 5 >= za.nsh * 4
        |ORDER BY doc_a, doc_b""".stripMargin,

    "q_dedup_exact_substr" ->
      """WITH d AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        |tok AS (SELECT doc_id, unnest(generate_series(1, len(w))) AS pos, w
        |        FROM d),
        |toks AS (SELECT doc_id, pos, w[pos] AS word FROM tok),
        |sp AS (SELECT doc_id, pos, array_to_string(w[pos:pos+2], ' ') AS s
        |       FROM tok WHERE pos + 2 <= len(w)),
        |dup AS (SELECT s FROM sp GROUP BY s HAVING count(DISTINCT doc_id) >= 2),
        |cov AS (SELECT DISTINCT sp.doc_id, sp.pos + k.k AS cpos
        |        FROM sp JOIN dup USING (s),
        |             LATERAL unnest(generate_series(0, 2)) k(k)),
        |kept AS (SELECT t.doc_id, t.pos, t.word
        |         FROM toks t LEFT JOIN cov c
        |           ON c.doc_id = t.doc_id AND c.cpos = t.pos
        |         WHERE c.doc_id IS NULL),
        |ka AS (SELECT doc_id, count(*) AS n_kept,
        |              string_agg(word, ' ' ORDER BY pos) AS kept_text
        |       FROM kept GROUP BY doc_id)
        |SELECT d.doc_id, CAST(len(d.w) AS BIGINT) AS n_words,
        |       CAST(len(d.w) - coalesce(ka.n_kept, 0) AS BIGINT) AS n_removed,
        |       coalesce(ka.kept_text, '') AS kept_text
        |FROM d LEFT JOIN ka USING (doc_id)
        |ORDER BY doc_id""".stripMargin,

    "q_dup_spans" ->
      """WITH d AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        |sh AS (SELECT doc_id, unnest(list_distinct(list_transform(range(1, len(w) - 1),
        |                      i -> array_to_string(w[i:i+2], ' ')))) AS s
        |       FROM d)
        |SELECT s, count(*) AS n_docs,
        | min(doc_id) AS first_doc, max(doc_id) AS last_doc
        |FROM sh GROUP BY s HAVING count(*) >= 2
        |ORDER BY n_docs DESC, s ASC LIMIT 100""".stripMargin,

    "q_ngram_novelty" ->
      """WITH d AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        |sh AS (SELECT doc_id, unnest(list_distinct(list_transform(range(1, len(w) - 1),
        |                      i -> array_to_string(w[i:i+2], ' ')))) AS s
        |       FROM d),
        |f AS (SELECT s, min(doc_id) AS fd FROM sh GROUP BY s)
        |SELECT sh.doc_id, count(*) AS n_shingles,
        | CAST(sum(CASE WHEN f.fd = sh.doc_id THEN 1 ELSE 0 END) AS BIGINT) AS novel,
        | floor(CAST(sum(CASE WHEN f.fd = sh.doc_id THEN 1 ELSE 0 END) AS DOUBLE)
        |       / CAST(count(*) AS DOUBLE) * 10000.0 + 0.5) / 10000.0 AS novelty_ratio
        |FROM sh JOIN f USING (s)
        |GROUP BY sh.doc_id ORDER BY sh.doc_id""".stripMargin,

    "q_gopher_rules" ->
      """WITH d AS (
        |  SELECT doc_id, text,
        |         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words,
        |         CAST(len(list_filter(string_split(text, ' '),
        |                              w -> regexp_matches(w, '[A-Za-z]'))) AS BIGINT) AS n_alpha,
        |         CAST(list_contains(string_split(text, ' '), 'the') AS INT)
        |         + CAST(list_contains(string_split(text, ' '), 'a') AS INT)
        |         + CAST(list_contains(string_split(text, ' '), 'of') AS INT)
        |         + CAST(list_contains(string_split(text, ' '), 'and') AS INT)
        |         + CAST(list_contains(string_split(text, ' '), 'to') AS INT)
        |         + CAST(list_contains(string_split(text, ' '), 'with') AS INT) AS n_stops
        |  FROM documents),
        |m AS (
        |  SELECT doc_id, n_words, n_alpha, CAST(n_stops AS BIGINT) AS n_stopwords,
        |         CAST(length(text) - (n_words - 1) AS DOUBLE) / CAST(n_words AS DOUBLE) AS mwl
        |  FROM d)
        |SELECT doc_id, n_words,
        | floor(mwl * 10000.0 + 0.5) / 10000.0 AS mean_word_len,
        | n_alpha AS n_alpha_words, n_stopwords,
        | (n_words >= 20 AND n_words <= 1000) AS r_word_count,
        | (mwl >= 3.0 AND mwl <= 10.0) AS r_mean_word_len,
        | (n_alpha * 5 >= n_words * 4) AS r_alpha_ratio,
        | (n_stopwords >= 2) AS r_stopwords,
        | ((n_words >= 20 AND n_words <= 1000) AND (mwl >= 3.0 AND mwl <= 10.0)
        |  AND (n_alpha * 5 >= n_words * 4) AND (n_stopwords >= 2)) AS keep
        |FROM m ORDER BY doc_id""".stripMargin,

    "q_heaps_law" ->
      """WITH d AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        |sh AS (SELECT doc_id, unnest(list_distinct(list_transform(range(1, len(w) - 1),
        |                      i -> array_to_string(w[i:i+2], ' ')))) AS s
        |       FROM d),
        |f AS (SELECT s, min(doc_id) AS fd FROM sh GROUP BY s),
        |novel AS (
        |  SELECT sh.doc_id, count(*) AS n_shingles,
        |         CAST(sum(CASE WHEN f.fd = sh.doc_id THEN 1 ELSE 0 END) AS BIGINT) AS novel
        |  FROM sh JOIN f USING (s) GROUP BY sh.doc_id)
        |SELECT doc_id, n_shingles, novel,
        | CAST(sum(novel) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_vocab
        |FROM novel ORDER BY doc_id""".stripMargin,

    "q_js_divergence" ->
      """WITH tok AS (
        |  SELECT source, unnest(string_split(text, ' ')) AS term FROM documents),
        |cs AS (SELECT source, term, CAST(count(*) AS BIGINT) AS cs
        |       FROM tok WHERE term <> '' GROUP BY 1, 2),
        |vocab AS (SELECT term, CAST(sum(cs) AS BIGINT) AS cg FROM cs GROUP BY term),
        |st AS (SELECT source, CAST(sum(cs) AS BIGINT) AS ns FROM cs GROUP BY source),
        |ngt AS (SELECT CAST(sum(cg) AS BIGINT) AS ng FROM vocab),
        |grid AS (
        |  SELECT st.source, st.ns,
        |         CAST(COALESCE(c2.cs, 0) AS DOUBLE) AS csd,
        |         CAST(v.cg AS DOUBLE) AS cgd,
        |         CAST(ngt.ng AS DOUBLE) AS ngd
        |  FROM st CROSS JOIN vocab v CROSS JOIN ngt
        |  LEFT JOIN cs c2 ON c2.source = st.source AND c2.term = v.term),
        |terms AS (
        |  SELECT source, ns,
        |    CAST(CASE WHEN csd > 0 THEN (csd / CAST(ns AS DOUBLE))
        |         * ln((csd / CAST(ns AS DOUBLE))
        |              / (((csd / CAST(ns AS DOUBLE)) + (cgd / ngd)) / 2.0))
        |         ELSE 0.0 END AS DECIMAL(28,8)) AS tp,
        |    CAST((cgd / ngd)
        |         * ln((cgd / ngd)
        |              / (((csd / CAST(ns AS DOUBLE)) + (cgd / ngd)) / 2.0))
        |         AS DECIMAL(28,8)) AS tq
        |  FROM grid)
        |SELECT source, max(ns) AS n_tokens,
        | floor(0.5 * (CAST(sum(tp) AS DOUBLE) + CAST(sum(tq) AS DOUBLE))
        |       * 10000.0 + 0.5) / 10000.0 AS js_nats
        |FROM terms GROUP BY source ORDER BY source""".stripMargin,

    "q_zipf_slope" ->
      """WITH tok AS (SELECT unnest(string_split(text, ' ')) AS term FROM documents),
        |freq AS (SELECT term, CAST(count(*) AS BIGINT) AS c
        |         FROM tok WHERE term <> '' GROUP BY term),
        |ranked AS (SELECT c, row_number() OVER (ORDER BY c DESC, term) AS r FROM freq),
        |agg AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n_terms,
        |         sum(CAST(ln(CAST(r AS DOUBLE)) AS DECIMAL(28,8))) AS sx,
        |         sum(CAST(ln(CAST(c AS DOUBLE)) AS DECIMAL(28,8))) AS sy,
        |         sum(CAST(ln(CAST(r AS DOUBLE)) * ln(CAST(c AS DOUBLE)) AS DECIMAL(28,8))) AS sxy,
        |         sum(CAST(ln(CAST(r AS DOUBLE)) * ln(CAST(r AS DOUBLE)) AS DECIMAL(28,8))) AS sxx
        |  FROM ranked),
        |sl AS (
        |  SELECT n_terms,
        |         CAST(n_terms AS DOUBLE) AS nd, CAST(sx AS DOUBLE) AS sxd,
        |         CAST(sy AS DOUBLE) AS syd,
        |         (CAST(n_terms AS DOUBLE) * CAST(sxy AS DOUBLE)
        |          - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
        |         / (CAST(n_terms AS DOUBLE) * CAST(sxx AS DOUBLE)
        |            - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) AS slope
        |  FROM agg)
        |SELECT n_terms,
        | floor(slope * 10000.0 + 0.5) / 10000.0 AS zipf_slope,
        | floor(((syd - slope * sxd) / nd) * 10000.0 + 0.5) / 10000.0 AS intercept
        |FROM sl""".stripMargin,

    "q_tokenizer_fertility" ->
      """WITH d AS (
        |  SELECT lang, CAST(strlen(text) AS BIGINT) AS nb,
        |         CAST(len(string_split(text, ' ')) AS BIGINT) AS ws,
        |         CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]')) AS BIGINT) AS bpe
        |  FROM documents)
        |SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
        | CAST(sum(nb) AS BIGINT) AS total_bytes,
        | CAST(sum(ws) AS BIGINT) AS ws_tokens,
        | CAST(sum(bpe) AS BIGINT) AS bpe_tokens,
        | floor((CAST(sum(bpe) AS DOUBLE) / CAST(sum(ws) AS DOUBLE)) * 10000.0 + 0.5) / 10000.0 AS fertility,
        | floor((CAST(sum(nb) AS DOUBLE) / CAST(sum(bpe) AS DOUBLE)) * 10000.0 + 0.5) / 10000.0 AS bytes_per_token
        |FROM d GROUP BY lang ORDER BY lang""".stripMargin,

    "q_langid_confusion" ->
      """WITH f AS (
        |  SELECT lang,
        |    CASE WHEN CAST((length(text) - length(replace(text, 'th', ''))) // 2
        |              + len(regexp_extract_all(text, '\bthe\b|\band\b|\bis\b')) AS DOUBLE)
        |              * 100.0 / CAST(length(text) AS DOUBLE) >= 3.0
        |         THEN 'en' ELSE 'other' END AS lang_pred
        |  FROM documents),
        |cells AS (SELECT lang, lang_pred, CAST(count(*) AS BIGINT) AS n
        |          FROM f GROUP BY 1, 2),
        |tot AS (SELECT lang, sum(n) AS n_lang FROM cells GROUP BY lang)
        |SELECT c.lang, c.lang_pred, c.n,
        | floor((CAST(c.n AS DOUBLE) / CAST(t.n_lang AS DOUBLE)) * 10000.0 + 0.5) / 10000.0 AS share
        |FROM cells c JOIN tot t ON c.lang = t.lang
        |ORDER BY c.lang, c.lang_pred""".stripMargin,

    "q_emerging_terms" ->
      """WITH mid AS (SELECT quantile_cont(doc_id, 0.5) AS mid FROM documents),
        |tok AS (
        |  SELECT unnest(string_split(text, ' ')) AS term, doc_id <= mid.mid AS early
        |  FROM documents CROSS JOIN mid),
        |counts AS (
        |  SELECT term,
        |         CAST(sum(CASE WHEN early THEN 1 ELSE 0 END) AS BIGINT) AS early_n,
        |         CAST(sum(CASE WHEN NOT early THEN 1 ELSE 0 END) AS BIGINT) AS late_n
        |  FROM tok WHERE term <> '' GROUP BY term)
        |SELECT term, early_n, late_n,
        | floor((CAST(late_n + 1 AS DOUBLE) / CAST(early_n + 1 AS DOUBLE)) * 10000.0 + 0.5) / 10000.0 AS growth
        |FROM counts
        |ORDER BY CAST(late_n + 1 AS DOUBLE) / CAST(early_n + 1 AS DOUBLE) DESC, term
        |LIMIT 50""".stripMargin,

    "q_filter_budget" ->
      """WITH d AS (
        |  SELECT CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words,
        |         CAST(len(list_filter(string_split(text, ' '),
        |                              w -> regexp_matches(w, '[A-Za-z]'))) AS BIGINT) AS n_alpha,
        |         CAST(list_contains(string_split(text, ' '), 'the') AS INT)
        |         + CAST(list_contains(string_split(text, ' '), 'a') AS INT)
        |         + CAST(list_contains(string_split(text, ' '), 'of') AS INT)
        |         + CAST(list_contains(string_split(text, ' '), 'and') AS INT)
        |         + CAST(list_contains(string_split(text, ' '), 'to') AS INT)
        |         + CAST(list_contains(string_split(text, ' '), 'with') AS INT) AS n_stops,
        |         CAST(length(text) - (len(string_split(text, ' ')) - 1) AS DOUBLE)
        |           / CAST(len(string_split(text, ' ')) AS DOUBLE) AS mwl
        |  FROM documents),
        |f AS (
        |  SELECT n_words,
        |         (n_words >= 20 AND n_words <= 1000) AS r_wc,
        |         (mwl >= 3.0 AND mwl <= 10.0) AS r_mwl,
        |         (n_alpha * 5 >= n_words * 4) AS r_ar,
        |         (n_stops >= 2) AS r_sw
        |  FROM d),
        |agg AS (
        |  SELECT CAST(sum(n_words) AS BIGINT) AS total_tokens,
        |         CAST(sum(CASE WHEN NOT r_wc THEN 1 ELSE 0 END) AS BIGINT) AS d_wc,
        |         CAST(sum(CASE WHEN NOT r_wc THEN n_words ELSE 0 END) AS BIGINT) AS t_wc,
        |         CAST(sum(CASE WHEN NOT r_mwl THEN 1 ELSE 0 END) AS BIGINT) AS d_mwl,
        |         CAST(sum(CASE WHEN NOT r_mwl THEN n_words ELSE 0 END) AS BIGINT) AS t_mwl,
        |         CAST(sum(CASE WHEN NOT r_ar THEN 1 ELSE 0 END) AS BIGINT) AS d_ar,
        |         CAST(sum(CASE WHEN NOT r_ar THEN n_words ELSE 0 END) AS BIGINT) AS t_ar,
        |         CAST(sum(CASE WHEN NOT r_sw THEN 1 ELSE 0 END) AS BIGINT) AS d_sw,
        |         CAST(sum(CASE WHEN NOT r_sw THEN n_words ELSE 0 END) AS BIGINT) AS t_sw,
        |         CAST(sum(CASE WHEN NOT (r_wc AND r_mwl AND r_ar AND r_sw) THEN 1 ELSE 0 END) AS BIGINT) AS d_all,
        |         CAST(sum(CASE WHEN NOT (r_wc AND r_mwl AND r_ar AND r_sw) THEN n_words ELSE 0 END) AS BIGINT) AS t_all
        |  FROM f),
        |rows_ AS (
        |  SELECT 'alpha_ratio' AS rule, d_ar AS n_docs_failing, t_ar AS tokens_removed, total_tokens FROM agg
        |  UNION ALL SELECT 'composite', d_all, t_all, total_tokens FROM agg
        |  UNION ALL SELECT 'mean_word_len', d_mwl, t_mwl, total_tokens FROM agg
        |  UNION ALL SELECT 'stopwords', d_sw, t_sw, total_tokens FROM agg
        |  UNION ALL SELECT 'word_count', d_wc, t_wc, total_tokens FROM agg)
        |SELECT rule, n_docs_failing, tokens_removed, total_tokens,
        | floor((CAST(tokens_removed AS DOUBLE) / CAST(total_tokens AS DOUBLE)) * 10000.0 + 0.5) / 10000.0 AS pct_tokens
        |FROM rows_ ORDER BY rule""".stripMargin,

    "q_vocab_coverage" ->
      """WITH tok AS (SELECT unnest(string_split(text, ' ')) AS term FROM documents),
        |freq AS (SELECT term, CAST(count(*) AS BIGINT) AS c
        |         FROM tok WHERE term <> '' GROUP BY term),
        |r AS (
        |  SELECT c, row_number() OVER (ORDER BY c DESC, term) AS r,
        |         sum(c) OVER (ORDER BY c DESC, term ROWS UNBOUNDED PRECEDING) AS cum,
        |         sum(c) OVER () AS total
        |  FROM freq),
        |n AS (SELECT CAST(max(r) AS BIGINT) AS n_terms FROM r),
        |kk AS (
        |  SELECT k, least(CAST(k AS BIGINT), n_terms) AS r
        |  FROM (SELECT unnest([5, 10, 20, 50]) AS k) CROSS JOIN n)
        |SELECT CAST(kk.k AS INTEGER) AS k, kk.r AS vocab_used,
        | floor((CAST(cum AS DOUBLE) / CAST(total AS DOUBLE)) * 10000.0 + 0.5) / 10000.0 AS coverage
        |FROM r JOIN kk ON r.r = kk.r ORDER BY k""".stripMargin,

    "q_dedup_threshold_curve" ->
      """WITH d AS (SELECT doc_id, lang, n_chars // 200 AS blk, string_split(text, ' ') AS w
        |           FROM documents),
        |sarr AS (SELECT doc_id, lang, blk,
        |           list_distinct(list_transform(range(1, len(w) - 1),
        |                         i -> array_to_string(w[i:i+2], ' '))) AS sh
        |         FROM d),
        |sz AS (SELECT doc_id, len(sh) AS nsh FROM sarr),
        |e AS (SELECT doc_id, lang, blk, unnest(sh) AS s FROM sarr),
        |p AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, CAST(count(*) AS BIGINT) AS c
        |      FROM e a JOIN e b ON a.lang = b.lang AND a.blk = b.blk AND a.s = b.s
        |                        AND a.doc_id < b.doc_id
        |      GROUP BY 1, 2),
        |pairs AS (
        |  SELECT doc_a, doc_b, c, CAST(za.nsh + zb.nsh - c AS BIGINT) AS u
        |  FROM p JOIN sz za ON za.doc_id = doc_a JOIN sz zb ON zb.doc_id = doc_b),
        |th AS (SELECT unnest([50, 60, 70, 80, 90]) AS threshold_pct)
        |SELECT CAST(th.threshold_pct AS INTEGER) AS threshold_pct,
        | CAST(count(*) AS BIGINT) AS n_pairs,
        | CAST(count(DISTINCT doc_b) AS BIGINT) AS n_droppable
        |FROM pairs CROSS JOIN th
        |WHERE c * 100 >= th.threshold_pct * u
        |GROUP BY th.threshold_pct ORDER BY threshold_pct""".stripMargin,

    "q_entropy_rate" ->
      """WITH toks AS (
        |  SELECT doc_id,
        |         unnest(string_split(lower(text), ' ')) AS word,
        |         generate_subscripts(string_split(lower(text), ' '), 1) AS pos
        |  FROM documents),
        |pairs AS (
        |  SELECT w1, w2, CAST(count(*) AS BIGINT) AS c FROM (
        |    SELECT word AS w1,
        |           lead(word) OVER (PARTITION BY doc_id ORDER BY pos) AS w2
        |    FROM toks)
        |  WHERE length(w1) > 0 AND length(w2) > 0 GROUP BY 1, 2),
        |joint AS (SELECT CAST(sum(c) AS BIGINT) AS b,
        |                 CAST(count(*) AS BIGINT) AS n_distinct_bigrams,
        |                 sum(CAST(CAST(c AS DOUBLE) * ln(CAST(c AS DOUBLE))
        |                          AS DECIMAL(28,8))) AS slj
        |          FROM pairs),
        |first_ AS (SELECT sum(CAST(CAST(cf AS DOUBLE) * ln(CAST(cf AS DOUBLE))
        |                          AS DECIMAL(28,8))) AS slf
        |           FROM (SELECT sum(c) AS cf FROM pairs GROUP BY w1)),
        |h AS (SELECT b, n_distinct_bigrams,
        |             ln(CAST(b AS DOUBLE)) - CAST(slj AS DOUBLE) / CAST(b AS DOUBLE) AS hj,
        |             ln(CAST(b AS DOUBLE)) - CAST(slf AS DOUBLE) / CAST(b AS DOUBLE) AS hf
        |      FROM joint CROSS JOIN first_)
        |SELECT b AS n_bigrams, n_distinct_bigrams,
        | floor(hj * 10000.0 + 0.5) / 10000.0 AS h_joint,
        | floor(hf * 10000.0 + 0.5) / 10000.0 AS h_first,
        | floor((hj - hf) * 10000.0 + 0.5) / 10000.0 AS h_cond
        |FROM h""".stripMargin,

    "q_good_turing" ->
      """WITH d AS (SELECT lang, string_split(lower(text), ' ') AS wd
        |           FROM documents),
        |tok AS (SELECT lang,
        |          unnest(list_transform(range(1, len(wd) - 3),
        |                 i -> array_to_string(wd[i:i+4], ' '))) AS w
        |        FROM d WHERE len(wd) >= 5),
        |ty AS (SELECT lang, w, CAST(count(*) AS BIGINT) AS c
        |       FROM tok GROUP BY 1, 2),
        |agg AS (SELECT lang, CAST(count(*) AS BIGINT) AS v_types,
        |          CAST(sum(c) AS BIGINT) AS n_tokens,
        |          CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
        |          CAST(sum(CASE WHEN c = 2 THEN 1 ELSE 0 END) AS BIGINT) AS n2
        |        FROM ty GROUP BY 1)
        |SELECT lang, v_types, n_tokens, n1, n2,
        | floor(CAST(n1 AS DOUBLE) / CAST(n_tokens AS DOUBLE) * 10000.0 + 0.5)
        |   / 10000.0 AS p_unseen,
        | floor((1.0 - CAST(n1 AS DOUBLE) / CAST(n_tokens AS DOUBLE))
        |       * 10000.0 + 0.5) / 10000.0 AS coverage,
        | floor((CAST(v_types AS DOUBLE)
        |        + CAST(n1 * (n1 - 1) AS DOUBLE) / (2.0 * CAST(n2 + 1 AS DOUBLE)))
        |       * 10000.0 + 0.5) / 10000.0 AS chao1
        |FROM agg ORDER BY lang""".stripMargin,

    "q_capture_recapture" ->
      """WITH d AS (SELECT lang,
        |    CASE WHEN CAST(('0x' || substr(md5('cr1_' || CAST(doc_id AS VARCHAR)),
        |                                   1, 12)) AS BIGINT) % 8 = 0
        |         THEN 1 ELSE 0 END AS s1,
        |    CASE WHEN CAST(('0x' || substr(md5('cr2_' || CAST(doc_id AS VARCHAR)),
        |                                   1, 12)) AS BIGINT) % 8 = 0
        |         THEN 1 ELSE 0 END AS s2
        |  FROM documents)
        |SELECT lang, CAST(count(*) AS BIGINT) AS true_n,
        | CAST(sum(s1) AS BIGINT) AS n1, CAST(sum(s2) AS BIGINT) AS n2,
        | CAST(sum(s1 * s2) AS BIGINT) AS m,
        | floor((CAST(sum(s1) + 1 AS DOUBLE) * CAST(sum(s2) + 1 AS DOUBLE)
        |        / CAST(sum(s1 * s2) + 1 AS DOUBLE) - 1.0) * 10000.0 + 0.5)
        |   / 10000.0 AS n_hat
        |FROM d GROUP BY lang ORDER BY lang""".stripMargin,

    "q_dsir_weights" ->
      """WITH tok AS (SELECT doc_id, lang, w
        |  FROM (SELECT doc_id, lang,
        |          unnest(string_split(lower(text), ' ')) AS w
        |        FROM documents)
        |  WHERE length(w) > 0),
        |src AS (SELECT w, CAST(count(*) AS BIGINT) AS cs FROM tok GROUP BY 1),
        |tgt AS (SELECT w, CAST(count(*) AS BIGINT) AS ct
        |        FROM tok WHERE lang = 'en' GROUP BY 1),
        |tot AS (SELECT (SELECT CAST(sum(cs) AS BIGINT) FROM src) AS ns,
        |               (SELECT CAST(count(*) AS BIGINT) FROM src) AS v,
        |               (SELECT CAST(count(*) AS BIGINT) FROM tok
        |                WHERE lang = 'en') AS nt),
        |lm AS (SELECT w,
        |    CAST(floor((ln(CAST(COALESCE(ct, 0) + 1 AS DOUBLE)
        |                   / CAST(nt + v AS DOUBLE))
        |                - ln(CAST(cs + 1 AS DOUBLE) / CAST(ns + v AS DOUBLE)))
        |               * 1000000.0 + 0.5) AS BIGINT) AS lr_q
        |  FROM src LEFT JOIN tgt USING (w) CROSS JOIN tot),
        |sc AS (SELECT doc_id, lang, CAST(count(*) AS BIGINT) AS n_tokens,
        |         CAST(sum(lr_q) AS BIGINT) AS slr
        |       FROM tok JOIN lm USING (w) GROUP BY 1, 2),
        |rk AS (SELECT doc_id, lang, n_tokens,
        |    floor(CAST(slr AS DOUBLE) / 1000000.0 * 10000.0 + 0.5) / 10000.0 AS logw
        |  FROM sc)
        |SELECT CAST(row_number() OVER (ORDER BY logw DESC, doc_id ASC) AS BIGINT)
        |         AS rank,
        |       doc_id, lang, n_tokens, logw
        |FROM rk ORDER BY logw DESC, doc_id ASC LIMIT 20""".stripMargin
  )
}
