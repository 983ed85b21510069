"""DuckDB oracle SQL twins for the catalog queries.

Dialect notes (hash-match hazards, see tools/check_oracle.py):
- DuckDB ``regexp_replace`` needs the 'g' flag to match Spark's replace-all.
- ``date_trunc('day'|'hour')`` returns DATE/TIMESTAMP — CAST explicitly.
- aggregated doubles are round()-ed identically on both sides.
- Spark whitespace split == ``regexp_split_to_array(trim(x), '\\s+')``.
"""

from __future__ import annotations

from ..functions.text import BPE_TOKEN_RE, LANG_MARKERS

# word-boundary marker patterns, shared with functions/text.py
_MARKER_PATTERNS = {
    lang: r"\b(" + "|".join(ws) + r")\b" for lang, ws in LANG_MARKERS.items()
}

_NORM_TEXT = "trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))"
_TOKENS = "regexp_split_to_array(trim(text), '\\s+')"

PARITY_ORACLES: dict[str, str] = {
    "pricing_summary": """
        SELECT l_returnflag, l_linestatus,
               round(sum(l_quantity), 2) AS sum_qty,
               round(sum(l_extendedprice), 2) AS sum_base_price,
               round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
               round(avg(l_quantity), 4) AS avg_qty,
               round(avg(l_discount), 6) AS avg_disc,
               count(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '2000-12-01'
        GROUP BY l_returnflag, l_linestatus
    """,
    "watermark_filter": """
        SELECT l_returnflag,
               count(*) AS n_rows,
               round(sum(l_extendedprice), 2) AS sum_price
        FROM lineitem
        WHERE l_shipdate >= (SELECT max(l_shipdate) - INTERVAL 90 DAY FROM lineitem)
        GROUP BY l_returnflag
    """,
    "scalar_functions": """
        SELECT o_orderkey,
               concat_ws('#', o_orderkey, o_orderstatus) AS syn_key,
               coalesce(nullif(o_orderstatus, 'O'), 'OPEN') AS status_or_open,
               round(o_totalprice / nullif(CAST(o_orderkey % 3 AS DOUBLE), 0), 4) AS price_div,
               CAST(o_orderkey AS VARCHAR) AS key_str,
               strftime(o_orderdate, '%Y-%m-%d') AS date_str,
               CAST(strftime(o_orderdate, '%y') AS BIGINT) AS yy,
               month(o_orderdate) AS order_month,
               upper(o_orderpriority) AS prio_upper,
               upper(regexp_replace(regexp_replace(o_orderpriority, '[0-9]', '', 'g'),
                                    '[\\(\\)\\d]+', '', 'g')) AS prio_norm,
               strftime(CAST(date_trunc('day', o_orderdate) AS TIMESTAMP),
                        '%Y-%m-%d %H:%M:%S') AS day_floor
        FROM orders WHERE o_orderkey < 100
    """,
    "regex_key_join": """
        SELECT prio_id,
               count(*) AS n_orders,
               round(sum(o_totalprice), 2) AS sum_price
        FROM orders
        LEFT JOIN (VALUES ('-URGENT',1),('-HIGH',2),('-MEDIUM',3),
                          ('-NOT SPECIFIED',4),('-LOW',5)) AS dim(prio_code, prio_id)
          ON upper(regexp_replace(regexp_replace(o_orderpriority, '[0-9]', '', 'g'),
                                  '[\\(\\)\\d]+', '', 'g')) = upper(dim.prio_code)
        GROUP BY prio_id
    """,
    "topk_orders_per_nation": """
        SELECT n_name, o_orderkey, o_totalprice, rk FROM (
            SELECT n_name, o_orderkey, o_totalprice,
                   row_number() OVER (PARTITION BY n_nationkey
                                      ORDER BY o_totalprice DESC, o_orderkey ASC) AS rk
            FROM orders
            JOIN customer ON o_custkey = c_custkey
            JOIN nation ON c_nationkey = n_nationkey
        ) WHERE rk <= 3
    """,
    "pivot_returnflag": """
        SELECT l_returnflag,
               round(sum(CASE WHEN l_linestatus = 'O' THEN l_quantity END), 2) AS "O",
               round(sum(CASE WHEN l_linestatus = 'F' THEN l_quantity END), 2) AS "F"
        FROM lineitem GROUP BY l_returnflag
    """,
    "cube_agg": """
        SELECT l_returnflag, l_linestatus,
               round(sum(l_quantity), 2) AS sum_qty,
               count(*) AS n_rows
        FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
    "anti_join_customers": """
        SELECT c_custkey, c_mktsegment FROM customer
        WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    """,
    "semi_join_customers": """
        SELECT c_mktsegment, count(*) AS n_customers FROM customer
        WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        GROUP BY c_mktsegment
    """,
    "dup_count_docs": """
        SELECT count(*) - count(DISTINCT text) AS dup_rows,
               count(*) AS total_rows
        FROM documents
    """,
    "events_json": """
        SELECT event_type,
               count(*) AS n_events,
               round(avg(k), 4) AS avg_k,
               max(k) AS max_k,
               round(sum(value), 4) AS sum_value
        FROM (SELECT event_type, value,
                     CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
              FROM events)
        GROUP BY event_type
    """,
    "tumbling_events": """
        SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS window_start,
               event_type,
               count(*) AS n_events,
               round(sum(value), 4) AS sum_value
        FROM events
        GROUP BY 1, 2
    """,
}

EXTENSION_ORACLES: dict[str, str] = {
    "contamination_docs": f"""
        WITH sh AS (
          SELECT doc_id,
                 list_distinct([array_to_string(toks[i : i + 7], ' ')
                                for i in range(1, greatest(len(toks) - 7, 1) + 1)]) AS shingles
          FROM (SELECT doc_id, {_TOKENS} AS toks FROM documents)
        ), bench AS (
          SELECT list_distinct(flatten(list(shingles))) AS bset
          FROM sh WHERE doc_id < 50
        )
        SELECT s.doc_id,
               len(s.shingles) AS n_shingles,
               CAST(len(list_intersect(s.shingles, b.bset)) AS BIGINT) AS n_hits,
               round(CAST(len(list_intersect(s.shingles, b.bset)) AS DOUBLE)
                     / len(s.shingles), 6) AS contamination,
               round(CAST(len(list_intersect(s.shingles, b.bset)) AS DOUBLE)
                     / len(s.shingles), 6) >= 0.1 AS contaminated
        FROM sh s, bench b
        WHERE s.doc_id >= 50
    """,
    "exact_dedup_groups": f"""
        SELECT sha256({_NORM_TEXT}) AS fp,
               count(*) AS n_copies,
               min(doc_id) AS keeper_id
        FROM documents GROUP BY 1
    """,
    "embedding_near_dups": """
        SELECT a.vec_id AS id_a, b.vec_id AS id_b
        FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
        WHERE a.vec_id < 250 AND b.vec_id < 250
          AND round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                           CAST(b.embedding AS DOUBLE[])), 6) >= 0.4
    """,
    "ann_bruteforce": """
        SELECT query_id, neighbor_id, rank FROM (
            SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
                   row_number() OVER (
                       PARTITION BY q.vec_id
                       ORDER BY list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
                                                       CAST(c.embedding AS DOUBLE[])) DESC,
                                c.vec_id ASC) AS rank
            FROM embeddings q JOIN embeddings c ON q.vec_id <> c.vec_id
            WHERE q.vec_id < 10
        ) WHERE rank <= 5
    """,
    "text_stats": f"""
        SELECT doc_id,
               length(text) AS n_chars_calc,
               len({_TOKENS}) AS n_tokens,
               len(regexp_extract_all(text, '{BPE_TOKEN_RE}')) AS n_bpe_tokens,
               round(CASE WHEN length(text) > 0
                          THEN len(regexp_extract_all(text, '[^\\s\\p{{L}}\\p{{N}}]')) / length(text)
                          ELSE 0.0 END, 6) AS punct_ratio
        FROM documents
    """,
    "lang_id": f"""
        SELECT doc_id, lang,
               CASE WHEN s_en = 0 AND s_de = 0 AND s_fr = 0 AND s_es = 0 THEN 'und'
                    WHEN s_en >= s_de AND s_en >= s_fr AND s_en >= s_es THEN 'en'
                    WHEN s_de >= s_fr AND s_de >= s_es THEN 'de'
                    WHEN s_fr >= s_es THEN 'fr'
                    ELSE 'es' END AS lang_pred
        FROM (
            SELECT doc_id, lang,
                   len(regexp_extract_all(lower(text), '{_MARKER_PATTERNS["en"]}')) AS s_en,
                   len(regexp_extract_all(lower(text), '{_MARKER_PATTERNS["de"]}')) AS s_de,
                   len(regexp_extract_all(lower(text), '{_MARKER_PATTERNS["fr"]}')) AS s_fr,
                   len(regexp_extract_all(lower(text), '{_MARKER_PATTERNS["es"]}')) AS s_es
            FROM documents
        )
    """,
    "quality_scores": f"""
        SELECT source,
               count(*) AS n_docs,
               round(avg(q), 4) AS avg_quality,
               round(min(q), 6) AS min_quality,
               round(max(q), 6) AS max_quality
        FROM (
            SELECT source,
                   CASE WHEN length(regexp_replace(text, '\\s', '', 'g')) = 0 THEN 0.0 ELSE
                   round(0.5 * least(1.0, len({_TOKENS}) / 100.0)
                       + 0.3 * coalesce(len(list_distinct({_TOKENS}))
                                        / nullif(len({_TOKENS}), 0), 0.0)
                       + 0.2 * (1.0 - round(CASE WHEN length(text) > 0
                                    THEN len(regexp_extract_all(text, '[^\\s\\p{{L}}\\p{{N}}]')) / length(text)
                                    ELSE 0.0 END, 6)), 6) END AS q
            FROM documents
        )
        GROUP BY source
    """,
    "quantize_embeddings": """
        WITH q AS (
          SELECT vec_id,
                 list_max([abs(x) for x in CAST(embedding AS DOUBLE[])]) / 127.0 AS s,
                 CAST(embedding AS DOUBLE[]) AS emb
          FROM embeddings WHERE vec_id < 100
        )
        SELECT vec_id, round(s, 6) AS scale,
               array_to_string([CAST(round(x / s, 0) AS BIGINT) for x in emb][1:3], ',') AS q_head,
               round(sqrt(list_sum([pow(x - round(x / s, 0) * s, 2) for x in emb])
                          / len(emb)), 6) AS rmse
        FROM q WHERE s > 0
    """,
    "dedup_clusters": """
        WITH RECURSIVE g AS (
          SELECT doc_id,
                 list_distinct([substring(text, i, 3)
                                for i in range(1, greatest(length(text) - 2, 0) + 1)]) AS grams
          FROM documents WHERE doc_id < 100 AND length(text) >= 3
        ), pairs AS (
          SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                 round(CAST(len(list_intersect(a.grams, b.grams)) AS DOUBLE)
                       / len(list_distinct(list_concat(a.grams, b.grams))), 4) AS j
          FROM g a JOIN g b ON a.doc_id < b.doc_id
        ), edges AS (
          SELECT id_a AS src, id_b AS dst FROM pairs WHERE j >= 0.6
          UNION ALL
          SELECT id_b, id_a FROM pairs WHERE j >= 0.6
        ), reach(node, lbl) AS (
          SELECT doc_id, doc_id FROM g
          UNION
          SELECT e.dst, r.lbl FROM reach r JOIN edges e ON e.src = r.node
        )
        SELECT node AS doc_id, min(lbl) AS cluster_id FROM reach GROUP BY node
    """,
    "simhash_recall": """
        WITH g AS (
          SELECT doc_id,
                 list_distinct([substring(text, i, 3)
                                for i in range(1, greatest(length(text) - 2, 0) + 1)]) AS grams
          FROM documents WHERE doc_id < 100 AND length(text) >= 3
        ), pairs AS (
          SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                 round(CAST(len(list_intersect(a.grams, b.grams)) AS DOUBLE)
                       / len(list_distinct(list_concat(a.grams, b.grams))), 4) AS j
          FROM g a JOIN g b ON a.doc_id < b.doc_id
        )
        SELECT id_a, id_b, true AS sim_found FROM pairs WHERE j >= 0.6
    """,
    "train_test_split": """
        SELECT split, source, count(*) AS n FROM (
            SELECT source,
                   CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'cd'
                        THEN 'train' ELSE 'test' END AS split
            FROM documents
        ) GROUP BY split, source
    """,
    "curation_pipeline": f"""
        WITH scored AS (
            SELECT doc_id, lang,
                   CASE WHEN length(regexp_replace(text, '\\s', '', 'g')) = 0 THEN 0.0 ELSE
                   round(0.5 * least(1.0, len({_TOKENS}) / 100.0)
                       + 0.3 * coalesce(len(list_distinct({_TOKENS}))
                                        / nullif(len({_TOKENS}), 0), 0.0)
                       + 0.2 * (1.0 - round(CASE WHEN length(text) > 0
                                    THEN len(regexp_extract_all(text, '[^\\s\\p{{L}}\\p{{N}}]')) / length(text)
                                    ELSE 0.0 END, 6)), 6) END AS q,
                   sha256({_NORM_TEXT}) AS fp,
                   len({_TOKENS}) AS n_toks
            FROM documents WHERE lang IN ('en', 'de', 'fr')
        ), kept AS (
            SELECT * FROM scored WHERE q >= 0.5
        ), survivors AS (
            SELECT * FROM (
                SELECT *, row_number() OVER (PARTITION BY fp ORDER BY doc_id) AS rn
                FROM kept
            ) WHERE rn = 1
        )
        SELECT lang, count(*) AS n_docs,
               CAST(sum(n_toks) AS BIGINT) AS total_tokens,
               CAST(round(sum(q) * 1000000, 0) AS BIGINT) AS q_sum_micros
        FROM survivors GROUP BY lang
    """,
    "chunk_documents": f"""
        WITH t AS (
          SELECT doc_id, {_TOKENS} AS toks FROM documents
        ), c AS (
          SELECT doc_id,
                 unnest([{{'idx': i,
                           'txt': array_to_string(toks[1 + i*40 : i*40 + 50], ' ')}}
                         for i in range(0, CAST(ceil(greatest(len(toks) - 10, 1) / 40.0) AS INT))],
                        recursive := true)
          FROM t
        )
        SELECT doc_id, idx AS chunk_idx,
               len(regexp_split_to_array(trim(txt), '\\s+')) AS n_tokens,
               txt AS chunk_text
        FROM c
    """,
    "tfidf_top_terms": """
        WITH tok AS (
          SELECT doc_id, unnest(regexp_split_to_array(trim(lower(text)), '\\s+')) AS term
          FROM documents
        ), tf AS (
          SELECT doc_id, term, count(*) AS tc FROM tok GROUP BY 1, 2
        ), dl AS (
          SELECT doc_id, sum(tc) AS n_toks FROM tf GROUP BY 1
        ), df AS (
          SELECT term, count(*) AS docs_with FROM tf GROUP BY 1
        ), n AS (SELECT count(*) AS n_docs FROM dl)
        SELECT doc_id, term, rnk FROM (
          SELECT tf.doc_id, tf.term,
                 row_number() OVER (PARTITION BY tf.doc_id
                   ORDER BY round((tc / CAST(n_toks AS DOUBLE))
                                  * ln(CAST(n_docs AS DOUBLE) / docs_with), 8) DESC,
                            tf.term ASC) AS rnk
          FROM tf JOIN dl USING (doc_id) JOIN df USING (term) CROSS JOIN n
        ) WHERE rnk <= 3
    """,
    # blocked == unblocked equivalence over EVERY pair of the capped corpus:
    # the pigeonhole band join is exact by construction, so the oracle is the
    # constant-true expectation on the full pair universe (same pattern as
    # the ann_*_recall gates). Any missed or spurious pair flips a boolean
    # and fails the value hash.
    "simhash_blocked_recall": """
        SELECT a.doc_id AS id_a, b.doc_id AS id_b, true AS blocked_eq_unblocked
        FROM documents a JOIN documents b ON a.doc_id < b.doc_id
        WHERE a.doc_id < 100 AND b.doc_id < 100
    """,
    "hyperplane_blocked_recall": """
        SELECT a.vec_id AS id_a, b.vec_id AS id_b, true AS blocked_eq_unblocked
        FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
        WHERE a.vec_id < 150 AND b.vec_id < 150
    """,
    "stratified_cap_docs": """
        SELECT doc_id, source, n_chars_calc FROM (
            SELECT doc_id, source, length(text) AS n_chars_calc,
                   row_number() OVER (PARTITION BY source
                       ORDER BY length(text) DESC NULLS LAST, doc_id ASC) AS rn
            FROM documents
        ) WHERE rn <= 15
    """,
    # per-token log-prob is a pure function of integer counts (c, N, V), so
    # both engines round the SAME double to micro-nats per vocabulary entry;
    # the per-doc score is then an order-independent integer sum.
    "unigram_logprob": """
        WITH tok AS (
            SELECT doc_id, t FROM (
                SELECT doc_id,
                       unnest(regexp_split_to_array(trim(lower(text)), '\\s+')) AS t
                FROM documents
            ) WHERE length(t) > 0
        ), vocab AS (
            SELECT t, count(*) AS c FROM tok GROUP BY t
        ), tot AS (
            SELECT sum(c) AS n_total, count(*) AS n_vocab FROM vocab
        ), lp AS (
            SELECT t, CAST(round(1000000 * ln((c + 1) / CAST(n_total + n_vocab AS DOUBLE)), 0) AS BIGINT) AS lp_micros
            FROM vocab CROSS JOIN tot
        )
        SELECT doc_id, count(*) AS n_tokens,
               CAST(sum(lp_micros) AS BIGINT) AS logprob_micros
        FROM tok JOIN lp USING (t)
        GROUP BY doc_id
    """,
    # pytest-oracle row (tests/test_rotated_oracle.py — not in the 50-slot
    # driver contract): conditional bigram LM in engine-exact micro-nats.
    # V = distinct tokens appearing in any bigram (either position), matching
    # the Spark scorer's vocabulary definition.
    "bigram_logprob": """
        WITH toks AS (
            SELECT doc_id,
                   [t for t in regexp_split_to_array(trim(lower(text)), '\\s+')
                    if length(t) > 0] AS ts
            FROM documents
        ), big AS (
            SELECT doc_id,
                   unnest([{'w1': ts[i], 'bg': ts[i] || ' ' || ts[i + 1]}
                           for i in range(1, len(ts))], recursive := true)
            FROM toks WHERE len(ts) >= 2
        ), bgc AS (
            SELECT bg, count(*) AS c_bg FROM big GROUP BY bg
        ), w1c AS (
            SELECT w1, count(*) AS c_w1 FROM big GROUP BY w1
        ), vocab AS (
            SELECT count(DISTINCT t) AS v FROM (
                SELECT w1 AS t FROM big
                UNION ALL
                SELECT split_part(bg, ' ', 2) FROM big
            )
        )
        SELECT doc_id, count(*) AS n_bigrams,
               CAST(sum(CAST(round(1000000 * ln((c_bg + 1) / CAST(c_w1 + v AS DOUBLE)), 0) AS BIGINT)) AS BIGINT) AS logprob_micros
        FROM big JOIN bgc USING (bg) JOIN w1c USING (w1) CROSS JOIN vocab
        GROUP BY doc_id
    """,
    # chained regexp_replace mirrors curation._PII_PATTERNS order exactly
    # (EMAIL, IP, CARD, PHONE — innermost applied first); DuckDB needs the
    # 'g' flag to match Spark's replace-all.
    "redact_pii_docs": r"""
        WITH s AS (
            SELECT doc_id,
                   concat_ws(' ', 'contact',
                             'user' || CAST(doc_id AS VARCHAR) || '@example.com',
                             'ip 10.0.0.1 card 4111 1111 1111 1111 tel +1 555-123-4567 end',
                             substring(text, 1, 40)) AS raw
            FROM documents WHERE doc_id < 200
        )
        SELECT doc_id,
               regexp_replace(
                 regexp_replace(
                   regexp_replace(
                     regexp_replace(raw,
                       '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
                     '\b(?:\d{1,3}\.){3}\d{1,3}\b', '<IP>', 'g'),
                   '\b\d(?:[ -]?\d){12,15}\b', '<CARD>', 'g'),
                 '\+?\d{1,3}[ .-]?\(?\d{2,4}\)?[ .-]?\d{3,4}[ .-]?\d{3,4}\b', '<PHONE>', 'g')
               AS redacted
        FROM s
    """,
    "multimodal_features": """
        SELECT doc_id AS media_id,
               CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
               CAST(octet_length(encode(text)) AS DOUBLE) AS f_len,
               CAST(ascii(text) AS DOUBLE) AS f_first,
               CAST(ascii(right(text, 1)) AS DOUBLE) AS f_last,
               CAST(octet_length(encode(text)) % 997 AS DOUBLE) AS f_mod
        FROM documents
    """,
}

PARITY_ORACLES["cleanse_report"] = """
    SELECT count(*) + 10 AS input_rows,
           CAST(10 AS BIGINT) AS duplicate_rows,
           count(*) AS output_rows
    FROM customer
"""

PARITY_ORACLES["running_totals"] = """
    SELECT o_custkey, o_orderkey,
           row_number() OVER w AS order_seq,
           round(sum(o_totalprice) OVER (PARTITION BY o_custkey
                 ORDER BY o_orderdate, o_orderkey ROWS UNBOUNDED PRECEDING), 2) AS running_total,
           round(first_value(o_totalprice) OVER (PARTITION BY o_custkey
                 ORDER BY o_orderdate, o_orderkey ROWS UNBOUNDED PRECEDING), 2) AS first_total,
           ntile(4) OVER w AS quartile
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
"""

PARITY_ORACLES["set_ops_customers"] = """
    SELECT custkey FROM (
        SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F'
        INTERSECT
        SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
    )
    EXCEPT ALL
    SELECT DISTINCT o_custkey FROM orders WHERE o_orderstatus = 'P'
"""

PARITY_ORACLES["explode_part_types"] = """
    SELECT word, count(*) AS n FROM (
        SELECT unnest(string_split(p_type, ' ')) AS word FROM part
    ) GROUP BY word
"""

PARITY_ORACLES["full_outer_region_stats"] = """
    SELECT coalesce(ck, sk) AS nationkey,
           coalesce(n_customers, 0) AS n_customers,
           coalesce(n_suppliers, 0) AS n_suppliers
    FROM (SELECT n_nationkey AS ck, count(*) AS n_customers
          FROM customer JOIN nation ON c_nationkey = n_nationkey GROUP BY 1) c
    FULL OUTER JOIN
         (SELECT n_nationkey AS sk, count(*) AS n_suppliers
          FROM supplier JOIN nation ON s_nationkey = n_nationkey GROUP BY 1) s
      ON c.ck = s.sk
"""

PARITY_ORACLES["price_histogram"] = """
    WITH b AS (SELECT min(l_extendedprice) AS lo, max(l_extendedprice) AS hi FROM lineitem)
    SELECT CAST(least(floor((l_extendedprice - lo) / ((hi - lo) / 10.0)), 9) AS INT) AS bucket,
           count(*) AS n,
           round(min(l_extendedprice), 2) AS bin_min,
           round(max(l_extendedprice), 2) AS bin_max
    FROM lineitem CROSS JOIN b GROUP BY 1
"""

PARITY_ORACLES["percentile_prices"] = """
    SELECT l_returnflag,
           round(quantile_cont(l_extendedprice, 0.5), 4) AS p50_price,
           round(quantile_cont(l_extendedprice, 0.9), 4) AS p90_price,
           round(quantile_cont(l_quantity, 0.25), 4) AS p25_qty
    FROM lineitem GROUP BY l_returnflag
"""

PARITY_ORACLES["approx_percentile_prices"] = """
    SELECT l_returnflag, true AS p50_rank_ok, true AS p95_rank_ok
    FROM lineitem GROUP BY l_returnflag
"""

PARITY_ORACLES["string_agg_nations"] = """
    SELECT r_name,
           string_agg(n_name, ',' ORDER BY n_name) AS nations,
           count(*) AS n_nations
    FROM nation JOIN region ON n_regionkey = r_regionkey
    GROUP BY r_name
"""

TEMPORAL_ORACLES: dict[str, str] = {
    # DuckDB has native ASOF JOIN (inclusive >=) — the ideal oracle for the
    # union+carry-forward implementation in operators/temporal.py.
    "asof_rate_orders": """
        WITH o AS (
            SELECT o_orderkey, o_orderdate, o_totalprice,
                   c_nationkey AS nationkey
            FROM orders JOIN customer ON o_custkey = c_custkey
        ), rates AS (
            SELECT c_nationkey AS nationkey,
                   date_trunc('month', o_orderdate) AS rate_month,
                   round(max(o_totalprice), 0) / 100.0 AS conversion_rate
            FROM orders JOIN customer ON o_custkey = c_custkey
            GROUP BY 1, 2
        )
        SELECT o_orderkey, o.nationkey, conversion_rate,
               round(o_totalprice / conversion_rate, 4) AS dollar_amt
        FROM o ASOF JOIN rates
          ON o.nationkey = rates.nationkey AND o.o_orderdate >= rates.rate_month
    """,
    "range_join_events": """
        SELECT a.event_id AS id_a, b.event_id AS id_b,
               CAST(date_diff('second', a.ts, b.ts) AS BIGINT) AS gap_s
        FROM events a JOIN events b
          ON a.user_id = b.user_id
         AND b.ts > a.ts AND b.ts <= a.ts + INTERVAL 300 SECOND
    """,
    "session_agg_events": """
        WITH flagged AS (
            SELECT user_id, event_id, ts, value,
                   CASE WHEN lag(ts) OVER w IS NULL
                             OR ts > lag(ts) OVER w + INTERVAL 30 MINUTE
                        THEN 1 ELSE 0 END AS new_sess
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ), sess AS (
            SELECT user_id, ts, value,
                   CAST(sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                            ROWS UNBOUNDED PRECEDING) AS BIGINT) AS sess_id
            FROM flagged
        )
        SELECT user_id, sess_id,
               min(ts) AS sess_start, max(ts) AS sess_end,
               count(*) AS n_events, round(sum(value), 4) AS sum_value
        FROM sess GROUP BY user_id, sess_id
    """,
    # ordered funnel: per-step conditional-min CTE chain
    "funnel_events": """
        WITH s1 AS (
          SELECT user_id, min(ts) AS step_1_ts FROM events
          WHERE event_type = 'view' GROUP BY user_id
        ), s2 AS (
          SELECT e.user_id, min(e.ts) AS step_2_ts FROM events e
          JOIN s1 ON e.user_id = s1.user_id
          WHERE e.event_type = 'click' AND e.ts > s1.step_1_ts
          GROUP BY e.user_id
        ), s3 AS (
          SELECT e.user_id, min(e.ts) AS step_3_ts FROM events e
          JOIN s2 ON e.user_id = s2.user_id
          WHERE e.event_type = 'purchase' AND e.ts > s2.step_2_ts
          GROUP BY e.user_id
        )
        SELECT s1.user_id, s1.step_1_ts, s2.step_2_ts, s3.step_3_ts,
               CAST(1 + CAST(s2.step_2_ts IS NOT NULL AS INT)
                      + CAST(s3.step_3_ts IS NOT NULL AS INT) AS INT)
                 AS steps_completed
        FROM s1
        LEFT JOIN s2 ON s1.user_id = s2.user_id
        LEFT JOIN s3 ON s1.user_id = s3.user_id
    """,
    # resample + forward fill: generate_series grid + IGNORE NULLS window
    "resample_events": """
        WITH b AS (
          SELECT user_id, CAST(date_trunc('hour', ts) AS TIMESTAMP) AS bucket,
                 value
          FROM events
        ), span AS (
          SELECT user_id, min(bucket) AS lo, max(bucket) AS hi
          FROM b GROUP BY user_id
        ), grid AS (
          SELECT user_id,
                 unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS bucket
          FROM span
        ), agg AS (
          SELECT user_id, bucket, CAST(count(*) AS BIGINT) AS n_events,
                 round(sum(value), 4) AS sum_value
          FROM b GROUP BY user_id, bucket
        )
        SELECT g.user_id, g.bucket,
               CAST(coalesce(a.n_events, 0) AS BIGINT) AS n_events,
               a.sum_value,
               last_value(a.sum_value IGNORE NULLS) OVER (
                 PARTITION BY g.user_id ORDER BY g.bucket
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS filled_sum_value
        FROM grid g LEFT JOIN agg a
          ON g.user_id = a.user_id AND g.bucket = a.bucket
    """,
    "rolling_user_stats": """
        SELECT user_id, event_id, ts, value,
               lag(value)  OVER w AS prev_value,
               lead(value) OVER w AS next_value,
               round(avg(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                      ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 4) AS ma3_value
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
    "rollup_nation_status": """
        SELECT coalesce(n_name, 'ALL') AS nation,
               coalesce(o_orderstatus, 'ALL') AS status,
               count(*) AS n_orders,
               round(sum(o_totalprice), 2) AS total
        FROM orders
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        GROUP BY ROLLUP(n_name, o_orderstatus)
    """,
    "profile_orders": """
        SELECT count(*) AS n_rows,
               count(DISTINCT o_custkey) AS n_custkeys,
               count(DISTINCT o_orderkey) AS n_orderkeys,
               count(DISTINCT o_orderstatus) AS n_statuses,
               count(DISTINCT o_orderpriority) AS n_priorities,
               -- HLL sketch values are engine-specific; the Spark side
               -- asserts |approx - exact| <= 5% and exports the verdict
               true AS hll_custkeys_ok,
               true AS hll_orderkeys_ok
        FROM orders
    """,
    # minhash_pairs: exact all-pairs word-3-gram-shingle Jaccard. Equals the
    # Spark LSH+verify output because (a) the verify step filters candidates
    # by exact shingle-hash Jaccard and (b) on the fixtures every true pair
    # sits at J >= 0.9 (nothing in [0.2, 0.9)), where the seeded banding's
    # recall is 1.0 (verified empirically at sf0.001/sf0.01).
    "minhash_pairs": """
        WITH t AS (
          SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS toks FROM documents
        ), g AS (
          SELECT doc_id,
                 list_distinct([array_to_string(toks[i : least(i + 2, len(toks))], ' ')
                                for i in range(1, greatest(len(toks) - 2, 1) + 1)]) AS sh
          FROM t WHERE len(toks) > 0
        ), p AS (
          SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                 round(CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
                       / len(list_distinct(list_concat(a.sh, b.sh))), 6) AS jaccard_sim
          FROM g a JOIN g b ON a.doc_id < b.doc_id
        )
        SELECT * FROM p WHERE jaccard_sim >= 0.3
    """,
    # ANN recall assertions: the oracle is the constant expectation that
    # every query vector's approximate top-k recalls >= min_hits of the
    # exact top-k (the Spark side computes both and compares).
    "ann_lsh_recall": """
        SELECT vec_id AS query_id, 5 AS k, true AS recall_ok
        FROM embeddings WHERE vec_id < 10
    """,
    "ann_ivf_recall": """
        SELECT vec_id AS query_id, 5 AS k, true AS recall_ok
        FROM embeddings WHERE vec_id < 10
    """,
    "ann_ivf_quantized_match": """
        SELECT vec_id AS query_id, rank, true AS match
        FROM embeddings, (SELECT unnest([1, 2, 3, 4, 5]) AS rank)
        WHERE vec_id < 10
    """,
    # top-2-gram repetition fraction: same count-the-mode list expressions
    "top_ngram_docs": """
        WITH t AS (
          SELECT doc_id,
                 list_filter(regexp_split_to_array(trim(text), '\\s+'),
                             x -> length(x) > 0) AS toks
          FROM documents WHERE doc_id < 200
        ), g AS (
          SELECT doc_id,
                 [array_to_string(toks[CAST(i AS INT):CAST(i AS INT) + 1], ' ')
                  for i in range(1, greatest(len(toks) - 1, 0) + 1)] AS grams
          FROM t
        )
        SELECT doc_id,
               round(CASE WHEN len(grams) >= 1 THEN
                 CAST(list_max([len(list_filter(grams, x -> x = gd))
                                for gd in list_distinct(grams)]) AS DOUBLE)
                 / len(grams) ELSE 0.0 END, 6) AS top2_frac
        FROM g
    """,
    # intra-doc repeated-line removal: identical indexed list_filter +
    # first-occurrence-position predicate in DuckDB
    # ExactSubstr passage dedup: windows classified by raw token string
    # (the Spark side hashes them — identical outcomes absent a 64-bit
    # collision); a token is removed iff covered by any >=2-count window;
    # kept tokens re-join with single spaces (canonical whitespace)
    "decontaminate_passages_docs": """
    WITH toks AS (
        SELECT doc_id,
               list_filter(string_split_regex(text, '\\s+'), x -> x <> '') AS t
        FROM documents WHERE doc_id < 200
    ), etoks AS (
        SELECT doc_id,
               list_filter(string_split_regex(text, '\\s+'), x -> x <> '') AS t
        FROM documents WHERE doc_id >= 200 AND doc_id < 300
    ), idx AS (
        SELECT doc_id, t, unnest(generate_series(1, len(t))) AS i FROM toks
    ), win AS (
        SELECT doc_id, i AS pos, array_to_string(t[i:i+9], ' ') AS w
        FROM idx WHERE i <= len(t) - 9
    ), eidx AS (
        SELECT doc_id, t, unnest(generate_series(1, len(t))) AS i FROM etoks
    ), dup AS (
        SELECT DISTINCT array_to_string(t[i:i+9], ' ') AS w
        FROM eidx WHERE i <= len(t) - 9
    ), removed AS (
        SELECT DISTINCT v.doc_id, v.pos + o.off AS p
        FROM (SELECT win.* FROM win SEMI JOIN dup USING (w)) v,
             (SELECT unnest(generate_series(0, 9)) AS off) o
    ), kept AS (
        SELECT idx.doc_id, idx.i, idx.t[idx.i] AS tok
        FROM idx ANTI JOIN removed
          ON idx.doc_id = removed.doc_id AND idx.i = removed.p
    ), rebuilt AS (
        SELECT doc_id, string_agg(tok, ' ' ORDER BY i) AS clean_text,
               count(*) AS kept_n
        FROM kept GROUP BY doc_id
    )
    SELECT toks.doc_id,
           COALESCE(rebuilt.clean_text, '') AS clean_text,
           CAST(len(toks.t) AS BIGINT) AS n_tokens,
           CAST(len(toks.t) - COALESCE(rebuilt.kept_n, 0) AS BIGINT) AS n_removed
    FROM toks LEFT JOIN rebuilt USING (doc_id)
    """,
    "dedup_passages_docs": """
    WITH toks AS (
        SELECT doc_id,
               list_filter(string_split_regex(text, '\\s+'), x -> x <> '') AS t
        FROM documents WHERE doc_id < 200
    ), idx AS (
        SELECT doc_id, t, unnest(generate_series(1, len(t))) AS i FROM toks
    ), win AS (
        SELECT doc_id, i AS pos, array_to_string(t[i:i+9], ' ') AS w
        FROM idx WHERE i <= len(t) - 9
    ), dup AS (
        SELECT w FROM win GROUP BY w HAVING count(*) >= 2
    ), removed AS (
        SELECT DISTINCT v.doc_id, v.pos + o.off AS p
        FROM (SELECT win.* FROM win SEMI JOIN dup USING (w)) v,
             (SELECT unnest(generate_series(0, 9)) AS off) o
    ), kept AS (
        SELECT idx.doc_id, idx.i, idx.t[idx.i] AS tok
        FROM idx ANTI JOIN removed
          ON idx.doc_id = removed.doc_id AND idx.i = removed.p
    ), rebuilt AS (
        SELECT doc_id, string_agg(tok, ' ' ORDER BY i) AS clean_text,
               count(*) AS kept_n
        FROM kept GROUP BY doc_id
    )
    SELECT toks.doc_id,
           COALESCE(rebuilt.clean_text, '') AS clean_text,
           CAST(len(toks.t) AS BIGINT) AS n_tokens,
           CAST(len(toks.t) - COALESCE(rebuilt.kept_n, 0) AS BIGINT) AS n_removed
    FROM toks LEFT JOIN rebuilt USING (doc_id)
    """,
    "dedup_lines_docs": """
        WITH s AS (
          SELECT doc_id,
                 concat_ws(chr(10), substr(text, 1, 30), 'boilerplate footer',
                           substr(text, 1, 30), 'boilerplate footer',
                           substr(text, 31, 30)) AS synth
          FROM documents WHERE doc_id < 200
        ), l AS (
          SELECT doc_id, synth, string_split(synth, chr(10)) AS lines FROM s
        )
        SELECT doc_id,
               array_to_string(
                 list_filter(lines, (x, i) -> list_position(lines, x) = i),
                 chr(10)) AS cleaned,
               CAST(len(lines) AS INT) AS n_lines_in,
               CAST(len(list_filter(lines, (x, i) -> list_position(lines, x) = i))
                    AS INT) AS n_lines_out
        FROM l
    """,
    # tokenizer table: dense ids in (count DESC, token ASC) order are a
    # pure window function in SQL; the Spark side assigns the same ids
    # distributed (range partitions + per-partition row_number + offsets)
    "encode_docs_ids": """
        WITH arr AS (
          SELECT doc_id,
                 list_filter(regexp_split_to_array(trim(lower(text)), '\\s+'),
                             t -> length(t) > 0) AS ts
          FROM documents WHERE doc_id < 200
        ), tok AS (
          SELECT doc_id, i - 1 AS pos, ts[i] AS token
          FROM arr, LATERAL (SELECT unnest(generate_series(1, len(ts))) AS i) g
        ), counts AS (
          SELECT token, count(*) AS cnt FROM tok GROUP BY token
          HAVING count(*) >= 300
        ), vocab AS (
          SELECT token,
                 CAST(row_number() OVER (ORDER BY cnt DESC, token ASC) - 1
                      AS BIGINT) AS token_id
          FROM counts
        )
        SELECT t.doc_id, CAST(t.pos AS INT) AS pos,
               CAST(coalesce(v.token_id, -1) AS BIGINT) AS token_id
        FROM tok t LEFT JOIN vocab v USING (token)
    """,
    # heavy hitters: the two-phase sketch+verify operator is EXACT, so the
    # oracle is the plain GROUP BY ... HAVING it must equal
    "heavy_hitter_terms": """
        WITH tok AS (
          SELECT unnest(regexp_split_to_array(trim(lower(text)), '\\s+')) AS term
          FROM documents
        ), f AS (
          SELECT term FROM tok WHERE length(term) > 0
        ), n AS (SELECT count(*) AS c FROM f)
        SELECT term, CAST(count(*) AS BIGINT) AS cnt,
               round(count(*) / (SELECT c FROM n), 6) AS frequency
        FROM f GROUP BY term
        HAVING count(*) > 0.02 * (SELECT c FROM n)
    """,
    # winnowing fingerprints: the identical Karp-Rabin fold + window-min
    # selection in DuckDB list comprehensions (ord == Spark ascii ==
    # codepoint; both folds start from accumulator 0 ≡ first codepoint).
    "winnow_overlap_docs": f"""
        WITH d AS (
          SELECT doc_id, {_NORM_TEXT} AS t FROM documents
        ), kg AS (
          SELECT doc_id, [
              list_reduce(
                [CAST(ord(substr(t, CAST(i AS INT) + j, 1)) AS BIGINT)
                 for j in range(0, 20)],
                (a, b) -> (a * 31 + b) % 1000000007
              ) for i in range(1, greatest(length(t) - 19, 0) + 1)] AS kg
          FROM d
        ), wf AS (
          SELECT doc_id, list_distinct([
              list_min(kg[CAST(i AS INT):CAST(i AS INT) + 7])
              for i in range(1, greatest(len(kg) - 7, 0) + 1)]) AS fps
          FROM kg
        ), ex AS (
          SELECT doc_id, len(fps) AS nf, unnest(fps) AS fp FROM wf
        )
        SELECT a.doc_id AS id_a, b.doc_id AS id_b,
               CAST(count(*) AS BIGINT) AS shared,
               round(CAST(count(*) AS DOUBLE) / least(min(a.nf), min(b.nf)), 6)
                 AS containment
        FROM ex a JOIN ex b ON a.fp = b.fp AND a.doc_id < b.doc_id
        GROUP BY a.doc_id, b.doc_id
        HAVING count(*) >= 3
    """,
    "semantic_dedup_gate": """
        SELECT CAST(0 AS BIGINT) AS n_survivor_violations, true AS drops_justified
    """,
    "leakage_safe_split_gate": """
        SELECT CAST(0 AS BIGINT) AS n_straddling_pairs,
               true AS all_assigned_once,
               true AS both_sides_nonempty
    """,
    "semantic_incremental_gate": """
        SELECT true AS matches_combined_batch_dedup,
               true AS batch_drops_nonvacuous,
               true AS survivors_nonempty
    """,
    # packing invariants recomputed from the RAW documents table: doc count
    # conservation (every doc in exactly one pack), token-mass conservation,
    # and the oversize-quarantine count; only the no-overfull-multi-doc-pack
    # term is a constant expectation
    "sequence_packing_gate": """
        WITH t AS (
          SELECT len(regexp_split_to_array(trim(text), '\\s+')) AS n_tok
          FROM documents
        )
        SELECT CAST(count(*) AS BIGINT) AS n_docs_assigned,
               CAST(sum(n_tok) AS BIGINT) AS total_tokens_packed,
               CAST(0 AS BIGINT) AS n_multi_doc_over_budget,
               CAST(count(*) FILTER (WHERE n_tok > 64) AS BIGINT) AS n_oversize_bins,
               CAST(count(*) AS BIGINT) AS n_docs_distinct
        FROM t
    """,
}


# Deterministic mixture sample: same md5-order greedy fill as
# curation.sample_token_mixture (weights src0:3/src1:1/src2:1, budget 2000
# → targets 1200/400/400; "tokens strictly before < target" keeps the
# boundary doc). The window formulation here is the REFERENCE the two-phase
# bucketed Spark path is equivalence-pinned against.
TEMPORAL_ORACLES["mixture_sample_docs"] = """
    WITH t AS (
        SELECT doc_id, source,
               CAST(coalesce(len(regexp_split_to_array(trim(text), '\\s+')), 0) AS BIGINT) AS n_toks,
               md5(CAST(doc_id AS VARCHAR)) AS h
        FROM documents WHERE source IN ('src0', 'src1', 'src2')
    ), c AS (
        SELECT doc_id, source, n_toks,
               sum(n_toks) OVER (
                   PARTITION BY source ORDER BY h, doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) - n_toks AS tok_before
        FROM t
    )
    SELECT doc_id, source, n_toks FROM c
    WHERE tok_before < CASE source WHEN 'src0' THEN 1200 ELSE 400 END
"""


# Quality-ordered mixture twin: longest-docs-first per domain (ORDER BY
# -n_chars, md5 tie-break, NULLS LAST), same "tokens strictly before <
# target" rule. ALL_ORACLES is rebuilt below after this late addition.
TEMPORAL_ORACLES["mixture_quality_docs"] = """
    WITH t AS (
        SELECT doc_id, source,
               CAST(coalesce(len(regexp_split_to_array(trim(text), '\\s+')), 0) AS BIGINT) AS n_toks,
               CAST(-n_chars AS DOUBLE) AS ok,
               md5(CAST(doc_id AS VARCHAR)) AS h
        FROM documents WHERE source IN ('src0', 'src1', 'src2')
    ), c AS (
        SELECT doc_id, source, n_toks,
               sum(n_toks) OVER (
                   PARTITION BY source ORDER BY ok ASC NULLS LAST, h, doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) - n_toks AS tok_before
        FROM t
    )
    SELECT doc_id, source, n_toks FROM c
    WHERE tok_before < CASE source WHEN 'src0' THEN 1200 ELSE 400 END
"""


# Cross-doc boilerplate line removal: the footer planted in every synth doc
# crosses min_docs=10 and is removed everywhere; substr/unique lines stay
# (duplicate fixture texts share substr lines in far fewer than 10 docs).
# ALL_ORACLES is rebuilt below after this late addition.
TEMPORAL_ORACLES["boilerplate_lines_docs"] = """
    WITH s AS (
        SELECT doc_id,
               concat_ws(chr(10), substr(text, 1, 30),
                         'standard legal footer all rights reserved',
                         substr(text, 31, 30),
                         'unique line of doc ' || CAST(doc_id AS VARCHAR)) AS synth
        FROM documents WHERE doc_id < 200
    ), l AS (
        SELECT doc_id,
               unnest(string_split(synth, chr(10))) AS line,
               generate_subscripts(string_split(synth, chr(10)), 1) AS pos
        FROM s
    ), bp AS (
        SELECT line FROM (
            SELECT line, count(DISTINCT doc_id) AS nd FROM l
            WHERE length(trim(line)) >= 4 GROUP BY line
        ) WHERE nd >= 10
    ), k AS (
        SELECT doc_id, pos, line FROM l
        WHERE line NOT IN (SELECT line FROM bp)
    ), a AS (
        SELECT doc_id,
               array_to_string(list(line ORDER BY pos), chr(10)) AS clean_text,
               count(*) AS n_out
        FROM k GROUP BY doc_id
    )
    SELECT s.doc_id,
           coalesce(a.clean_text, '') AS clean_text,
           CAST(len(string_split(s.synth, chr(10))) AS INT) AS n_lines_in,
           CAST(coalesce(a.n_out, 0) AS INT) AS n_lines_out
    FROM s LEFT JOIN a USING (doc_id)
"""

# ------------------------------------------------------------ warehouse ----
# Round-7 warehouse-lifecycle rows (catalog/warehouse_queries.py): SCD2
# history build, snapshot CDC diff, declarative data-quality gate. Every
# aggregate is CAST to BIGINT because DuckDB's SUM(int) yields HUGEINT,
# which pandas coerces to float64 and the value hash would see "123.0".
WAREHOUSE_ORACLES: dict[str, str] = {
    # scd2_history semantics verbatim: per user ordered by (ts, event_id),
    # keep rows whose event_type differs (IS DISTINCT FROM — null-safe,
    # matching Spark's eqNullSafe) from the previous observation, then
    # interval-ize with lead/row_number over the SAME ordering (change
    # rows can share a timestamp).
    "scd2_user_state": """
    WITH ordered AS (
        SELECT user_id, event_type, ts, event_id,
               LAG(event_type) OVER w AS prev_type,
               ROW_NUMBER() OVER w AS rn
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), runs AS (
        SELECT user_id, event_type, ts, event_id
        FROM ordered
        WHERE rn = 1 OR event_type IS DISTINCT FROM prev_type
    )
    SELECT user_id, event_type,
           ts AS valid_from,
           LEAD(ts) OVER w2 AS valid_to,
           CAST(ROW_NUMBER() OVER w2 AS INT) AS version,
           (LEAD(ts) OVER w2 IS NULL) AS is_current
    FROM runs
    WINDOW w2 AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
    # snapshot-driven SCD2 over the same deterministic snapshot pair as
    # snapshot_diff_orders: with exactly two snapshots the expected version
    # rows can be written DIRECTLY — v1 for every old key (closed at t2
    # iff the key was deleted or updated), v2 at t2 for updated keys, v1
    # at t2 for inserted keys. Deleted keys keep their single closed
    # version with no successor — the transition a change feed can't say.
    "scd2_snapshot_orders": """
    WITH old AS (
        SELECT o_orderkey, o_orderstatus,
               CASE WHEN o_orderkey % 10 = 0 THEN ROUND(o_totalprice + 1.0, 2)
                    ELSE o_totalprice END AS o_totalprice
        FROM orders WHERE o_orderkey % 2 = 0
    ), new AS (
        SELECT o_orderkey, o_orderstatus, o_totalprice
        FROM orders WHERE o_orderkey % 3 <> 0
    ), j AS (
        SELECT o.o_orderkey AS ok, n.o_orderkey AS nk,
               o.o_orderstatus AS os, o.o_totalprice AS op,
               n.o_orderstatus AS ns, n.o_totalprice AS np,
               ((o.o_orderstatus IS DISTINCT FROM n.o_orderstatus)
                OR (o.o_totalprice IS DISTINCT FROM n.o_totalprice)) AS differ
        FROM old o FULL OUTER JOIN new n ON o.o_orderkey = n.o_orderkey
    )
    SELECT ok AS o_orderkey, os AS o_orderstatus, op AS o_totalprice,
           TIMESTAMP '2024-01-01 00:00:00' AS valid_from,
           CASE WHEN nk IS NULL OR differ
                THEN TIMESTAMP '2024-02-01 00:00:00' END AS valid_to,
           CAST(1 AS INT) AS version,
           (nk IS NOT NULL AND NOT differ) AS is_current
    FROM j WHERE ok IS NOT NULL
    UNION ALL
    SELECT ok, ns, np,
           TIMESTAMP '2024-02-01 00:00:00', CAST(NULL AS TIMESTAMP),
           CAST(2 AS INT), TRUE
    FROM j WHERE ok IS NOT NULL AND nk IS NOT NULL AND differ
    UNION ALL
    SELECT nk, ns, np,
           TIMESTAMP '2024-02-01 00:00:00', CAST(NULL AS TIMESTAMP),
           CAST(1 AS INT), TRUE
    FROM j WHERE ok IS NULL
    """,
    # both snapshots rebuilt bit-exact from the fixture, diffed with a
    # full outer join; comparison is column-wise IS DISTINCT FROM (the
    # SQL spelling of the struct <=> the Spark side uses)
    "snapshot_diff_orders": """
    WITH old AS (
        SELECT o_orderkey, o_orderstatus,
               CASE WHEN o_orderkey % 10 = 0 THEN ROUND(o_totalprice + 1.0, 2)
                    ELSE o_totalprice END AS o_totalprice
        FROM orders WHERE o_orderkey % 2 = 0
    ), new AS (
        SELECT o_orderkey, o_orderstatus, o_totalprice
        FROM orders WHERE o_orderkey % 3 <> 0
    )
    SELECT COALESCE(o.o_orderkey, n.o_orderkey) AS o_orderkey,
           CASE WHEN o.o_orderkey IS NULL THEN 'inserted'
                WHEN n.o_orderkey IS NULL THEN 'deleted'
                WHEN (o.o_orderstatus IS DISTINCT FROM n.o_orderstatus)
                  OR (o.o_totalprice IS DISTINCT FROM n.o_totalprice)
                THEN 'updated' END AS change_type
    FROM old o FULL OUTER JOIN new n USING (o_orderkey)
    WHERE CASE WHEN o.o_orderkey IS NULL THEN 'inserted'
               WHEN n.o_orderkey IS NULL THEN 'deleted'
               WHEN (o.o_orderstatus IS DISTINCT FROM n.o_orderstatus)
                 OR (o.o_totalprice IS DISTINCT FROM n.o_totalprice)
               THEN 'updated' END IS NOT NULL
    """,
    # one SELECT per rule; row-level rules count "condition IS FALSE"
    # (NULL passes everywhere except not_null), unique counts duplicate
    # KEYS, references counts orphaned non-null foreign keys — the exact
    # NULL contract documented in plans/quality.py
    "validate_orders": """
    WITH r AS (
        SELECT 'o_orderkey_not_null' AS rule, 'not_null' AS kind,
               CAST(COUNT_IF(o_orderkey IS NULL) AS BIGINT) AS violations
        FROM orders
        UNION ALL
        SELECT 'o_orderkey_unique', 'unique',
               CAST(COUNT(*) AS BIGINT)
        FROM (SELECT o_orderkey FROM orders WHERE o_orderkey IS NOT NULL
              GROUP BY o_orderkey HAVING COUNT(*) > 1)
        UNION ALL
        SELECT 'o_custkey_unique', 'unique',
               CAST(COUNT(*) AS BIGINT)
        FROM (SELECT o_custkey FROM orders WHERE o_custkey IS NOT NULL
              GROUP BY o_custkey HAVING COUNT(*) > 1)
        UNION ALL
        SELECT 'status_open_finished', 'accepted_values',
               CAST(COUNT_IF((o_orderstatus IN ('O','F')) IS FALSE) AS BIGINT)
        FROM orders
        UNION ALL
        SELECT 'price_under_400k', 'in_range',
               CAST(COUNT_IF((o_totalprice BETWEEN 0.0 AND 400000.0) IS FALSE) AS BIGINT)
        FROM orders
        UNION ALL
        SELECT 'priority_1_to_4', 'matches',
               CAST(COUNT_IF(regexp_matches(o_orderpriority, '^[1-4]-') IS FALSE) AS BIGINT)
        FROM orders
        UNION ALL
        SELECT 'price_positive', 'expression',
               CAST(COUNT_IF((o_totalprice > 0) IS FALSE) AS BIGINT)
        FROM orders
        UNION ALL
        SELECT 'custkey_fk', 'references',
               CAST(COUNT(*) AS BIGINT)
        FROM orders o
        WHERE o.o_custkey IS NOT NULL
          AND NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)
        UNION ALL
        SELECT 'custkey_fk_truncated', 'references',
               CAST(COUNT(*) AS BIGINT)
        FROM orders o
        WHERE o.o_custkey IS NOT NULL
          AND NOT EXISTS (SELECT 1 FROM customer c
                          WHERE c.c_custkey = o.o_custkey AND c.c_custkey < 50)
    )
    SELECT rule, kind, violations, (violations = 0) AS passed FROM r
    """,
}

# scd2_apply's contract IS full-feed equivalence: the oracle for the
# split-build-then-apply query is scd2_history's SQL over the whole feed —
# the SAME string object, so the two can never drift apart (round-8
# review: a byte-identical copy invited exactly that)
WAREHOUSE_ORACLES["scd2_apply_user_state"] = WAREHOUSE_ORACLES["scd2_user_state"]

# Round-9 binary Naive Bayes (train + score over the same corpus, label =
# lang = 'en'). Mirrors functions/text.nb_train exactly: add-one smoothing,
# V = distinct tokens across BOTH classes, per-token weight quantized to
# integer micro-nats BEFORE the per-doc sum (order-independent), bias =
# ln(doc-count prior odds). Every scored token is in-vocabulary here (same
# corpus), so the unseen-token default never fires — pytest covers it.
EXTENSION_ORACLES["nb_lang_classifier"] = """
    WITH docs AS (
        SELECT doc_id, text,
               CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
        FROM documents
    ), prior AS (
        SELECT sum(y) AS np, sum(1 - y) AS nn FROM docs
    ), tok AS (
        SELECT doc_id, y, t FROM (
            SELECT doc_id, y,
                   unnest(regexp_split_to_array(trim(lower(text)), '\\s+')) AS t
            FROM docs
        ) WHERE length(t) > 0
    ), counts AS (
        SELECT t, sum(y) AS cp, sum(1 - y) AS cn FROM tok GROUP BY t
    ), tot AS (
        SELECT sum(cp) AS tp, sum(cn) AS tn, count(*) AS v FROM counts
    ), w AS (
        SELECT t,
               CAST(round(1000000 * (
                   ln((cp + 1) / CAST(tp + v AS DOUBLE))
                 - ln((cn + 1) / CAST(tn + v AS DOUBLE))), 0) AS BIGINT) AS w_micros
        FROM counts CROSS JOIN tot
    ), bias AS (
        SELECT CAST(round(1000000 * ln(CAST(np AS DOUBLE) / nn), 0) AS BIGINT) AS b
        FROM prior
    )
    SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
           CAST(sum(w_micros) + any_value(b) AS BIGINT) AS score_micros
    FROM tok JOIN w USING (t) CROSS JOIN bias
    GROUP BY doc_id
"""

# Round-9 multiclass Naive Bayes language-ID (train + argmax classify over
# the same corpus). Mirrors functions/text.nb_train_multiclass exactly:
# add-one smoothing, V = global distinct tokens, the COMPLETE V x K grid
# (smoothed zeros included) quantized per cell to integer micro-nats, doc
# priors over total docs, unseen default per label; ties break by
# ascending label. Every scored token is in-vocabulary here, so the
# default never fires in this query — pytest covers it.
EXTENSION_ORACLES["nb_lang_multiclass"] = """
    WITH docs AS (
        SELECT doc_id, text, lang AS l FROM documents
    ), tok AS (
        SELECT doc_id, l, t FROM (
            SELECT doc_id, l,
                   unnest(regexp_split_to_array(trim(lower(text)), '\\s+')) AS t
            FROM docs
        ) WHERE length(t) > 0
    ), counts AS (
        SELECT l, t, count(*) AS c FROM tok GROUP BY l, t
    ), vocab AS (
        SELECT DISTINCT t FROM counts
    ), vsize AS (
        SELECT count(*) AS v FROM vocab
    ), labels AS (
        SELECT l,
               CAST(round(1000000 * ln(CAST(nd AS DOUBLE) / sum(nd) OVER ()), 0) AS BIGINT) AS prior_micros
        FROM (SELECT l, count(*) AS nd FROM docs GROUP BY l)
    ), totals AS (
        -- from DOC labels, not token counts: a label whose documents are
        -- all zero-token still gets its prior/default/grid rows, exactly
        -- as the Spark trainer's labels frame does (round-9 review)
        SELECT d.l,
               CAST(coalesce(tc.s, 0) + (SELECT v FROM vsize) AS DOUBLE) AS denom
        FROM (SELECT DISTINCT l FROM docs) d
        LEFT JOIN (SELECT l, sum(c) AS s FROM counts GROUP BY l) tc USING (l)
    ), grid AS (
        SELECT tt.l, vocab.t,
               CAST(round(1000000 * ln((coalesce(counts.c, 0) + 1) / tt.denom), 0) AS BIGINT) AS lp_micros
        FROM vocab CROSS JOIN totals tt
        LEFT JOIN counts ON counts.l = tt.l AND counts.t = vocab.t
    ), doc_tok AS (
        SELECT doc_id, t FROM tok
    ), scored AS (
        SELECT doc_id, grid.l,
               count(*) AS n_tokens,
               CAST(sum(lp_micros) + any_value(labels.prior_micros) AS BIGINT) AS score_micros
        FROM doc_tok JOIN grid USING (t) JOIN labels ON labels.l = grid.l
        GROUP BY doc_id, grid.l
    ), ranked AS (
        SELECT doc_id, n_tokens, l, score_micros,
               row_number() OVER (PARTITION BY doc_id ORDER BY score_micros DESC, l ASC) AS rk
        FROM scored
    )
    SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
           l AS pred_label, score_micros
    FROM ranked WHERE rk = 1
"""

# Round-9 exact top-fraction pruning (keep top 25% per lang by token
# count; ceil(n*frac) rows per group, ties broken score DESC then doc_id
# ASC — identical rank semantics to curation.top_fraction_per_group).
EXTENSION_ORACLES["top_fraction_docs"] = """
    WITH scored AS (
        SELECT doc_id, lang,
               CAST(len([t for t in regexp_split_to_array(trim(text), '\\s+')
                         if length(t) > 0]) AS BIGINT) AS n_tokens
        FROM documents
    ), ranked AS (
        SELECT doc_id, lang, n_tokens,
               row_number() OVER (
                   PARTITION BY lang ORDER BY n_tokens DESC, doc_id ASC
               ) AS rn,
               count(*) OVER (PARTITION BY lang) AS n
        FROM scored
    )
    SELECT doc_id, lang, n_tokens FROM ranked WHERE rn <= ceil(n * 0.25)
"""

# Round-9 hopping (sliding) window aggregation: 1-hour windows every 30
# minutes — each event expands to its TWO covering windows (duration/slide
# = 2), starts epoch-aligned on the slide grid exactly as Spark's
# three-arg F.window assigns them. make_timestamp(micros) yields a NAIVE
# timestamp — to_timestamp would return TIMESTAMPTZ whose cast shifts by
# the host zone on non-UTC machines (round-9 review), while Spark stays
# pinned to UTC.
EXTENSION_ORACLES["hopping_events"] = """
    WITH cand AS (
        SELECT ts, event_type, value, unnest([0, 1]) AS i FROM events
    )
    SELECT make_timestamp(
               (CAST(floor(epoch(ts) / 1800) AS BIGINT) * 1800 - i * 1800)
               * 1000000
           ) AS window_start,
           event_type,
           CAST(count(*) AS BIGINT) AS n_events,
           round(sum(value), 4) AS sum_value
    FROM cand
    GROUP BY 1, 2
"""

# Round-9 text canonicalization: NFC + control/format strip. The control
# class matches functions/text._CONTROL_CHAR_RE exactly — explicit ranges
# plus the CURATED format-char subset (ZWJ/ZWNJ kept: orthographically
# meaningful; RE2 has no [\p{Cc}&&[^\n\t]] intersection, and \x{...}
# escapes compile identically under java.util.regex and RE2).
EXTENSION_ORACLES["normalize_docs"] = """
    SELECT doc_id,
           nfc_normalize(
               regexp_replace(
                   text,
                   '[\\x00-\\x08\\x0B-\\x1F\\x7F\\x{00AD}\\x{200B}\\x{200E}\\x{200F}\\x{202A}-\\x{202E}\\x{2060}-\\x{2064}\\x{2066}-\\x{2069}\\x{FEFF}]',
                   '', 'g'
               )
           ) AS text
    FROM documents
"""

# Round-9 character-entropy quality signal. Engine-exact integer
# micro-bits: each -p*log2(p) term is rounded to a BIGINT before summing
# (the NB/logprob micro-nat pattern), and '(?s).' extracts one CODEPOINT
# in both RE2 and java.util.regex (surrogate-pair safe). Map-only on both
# sides — no shuffle, no unnest.
EXTENSION_ORACLES["entropy_docs"] = """
    WITH base AS (
        SELECT doc_id, coalesce(text, '') AS t FROM documents
    )
    SELECT doc_id,
           CAST(length(t) AS BIGINT) AS n_chars_calc,
           CAST(len(list_distinct(regexp_extract_all(t, '(?s).'))) AS BIGINT)
               AS distinct_chars,
           CAST(coalesce(list_sum(list_transform(
               list_distinct(regexp_extract_all(t, '(?s).')),
               ch -> CAST(round(
                   -1000000.0
                   * ((length(t) - length(replace(t, ch, '')))
                      / CAST(length(t) AS DOUBLE))
                   * log2((length(t) - length(replace(t, ch, '')))
                          / CAST(length(t) AS DOUBLE)),
               0) AS BIGINT)
           )), 0) AS BIGINT) AS entropy_microbits
    FROM base
"""

# Round-9 deterministic shard export contract. The md5-hex fold to BIGINT
# is spelled with list_reduce + ascii arithmetic so both engines compute
# the identical value without engine-specific hex-parse builtins; Spark
# mirrors it with aggregate() over the same 8 chars.
EXTENSION_ORACLES["shard_docs"] = """
    WITH h AS (
        SELECT doc_id,
               md5(CAST(doc_id AS VARCHAR)) AS shuffle_key,
               list_reduce(
                 list_prepend(CAST(0 AS BIGINT),
                   list_transform(
                     string_split(substr(md5(CAST(doc_id AS VARCHAR)), 1, 8), ''),
                     ch -> CAST(CASE WHEN ascii(ch) <= 57 THEN ascii(ch) - 48
                                     ELSE ascii(ch) - 87 END AS BIGINT))),
                 (acc, x) -> acc * 16 + x) AS h64
        FROM documents
    )
    SELECT doc_id,
           CAST(h64 % 8 AS BIGINT) AS shard,
           CAST(row_number() OVER (
               PARTITION BY h64 % 8 ORDER BY shuffle_key, doc_id
           ) AS BIGINT) AS pos_in_shard
    FROM h
"""

# Round-9 sparse cosine top-k. Mirrors sparse_cosine_topk exactly: the
# same whitespace tokenization as tfidf_top_terms/unigram_logprob, IDF
# quantized to integer milli-nats (+1000 smooth), BIGINT weights/dots/
# norms, and a final dot/(sqrt*sqrt) of identical integers — IEEE-exact
# on both engines. The df<=100 stop-term cap is part of the contract.
EXTENSION_ORACLES["sparse_topk_docs"] = """
    WITH tok AS (
        SELECT doc_id, t AS term FROM (
            SELECT doc_id,
                   unnest(regexp_split_to_array(trim(lower(text)), '\\s+')) AS t
            FROM documents
        ) WHERE length(t) > 0
    ), tf AS (
        SELECT doc_id, term, count(*) AS tc FROM tok GROUP BY 1, 2
    ), dfr AS (
        SELECT term, count(*) AS docs_with FROM tf GROUP BY 1
        HAVING count(*) <= 100
    ), n AS (SELECT count(*) AS n_docs FROM documents),
    w AS (
        SELECT doc_id, term,
               tc * CAST(round(
                   1000.0 * ln((n_docs + 1.0) / (docs_with + 1.0)) + 1000.0,
               0) AS BIGINT) AS wq
        FROM tf JOIN dfr USING (term) CROSS JOIN n
    ), nrm AS (
        SELECT doc_id, CAST(sum(wq * wq) AS BIGINT) AS nq FROM w GROUP BY 1
    ), dots AS (
        SELECT a.doc_id AS doc_id, b.doc_id AS neighbor_id,
               CAST(sum(a.wq * b.wq) AS BIGINT) AS dot
        FROM w a JOIN w b USING (term)
        WHERE a.doc_id != b.doc_id
        GROUP BY 1, 2
    ), cosr AS (
        SELECT dots.doc_id, neighbor_id,
               dot / (sqrt(CAST(na.nq AS DOUBLE)) * sqrt(CAST(nb.nq AS DOUBLE))) AS cos
        FROM dots
        JOIN nrm na ON dots.doc_id = na.doc_id
        JOIN nrm nb ON dots.neighbor_id = nb.doc_id
    )
    SELECT doc_id, neighbor_id, CAST(rnk AS BIGINT) AS rnk,
           round(cos, 6) AS cos_sim
    FROM (
        SELECT doc_id, neighbor_id, cos,
               row_number() OVER (
                   PARTITION BY doc_id ORDER BY cos DESC, neighbor_id ASC
               ) AS rnk
        FROM cosr
    ) WHERE rnk <= 5
"""

# Round-9 persisted sparse search: idf frozen over the CORPUS slice only
# (doc_id >= 100, df <= 100), queries weighted under that frozen table —
# terms unseen in the corpus contribute nothing, exactly the
# frozen-vocabulary rule the index bakes in.
EXTENSION_ORACLES["sparse_search_docs"] = """
    WITH tok AS (
        SELECT doc_id, t AS term FROM (
            SELECT doc_id,
                   unnest(regexp_split_to_array(trim(lower(text)), '\\s+')) AS t
            FROM documents
        ) WHERE length(t) > 0
    ), tf AS (
        SELECT doc_id, term, count(*) AS tc FROM tok GROUP BY 1, 2
    ), corpus_df AS (
        SELECT term, count(*) AS docs_with FROM tf WHERE doc_id >= 100
        GROUP BY 1 HAVING count(*) <= 100
    ), n AS (SELECT count(*) AS n_docs FROM documents WHERE doc_id >= 100),
    idf AS (
        SELECT term,
               CAST(round(
                   1000.0 * ln((n_docs + 1.0) / (docs_with + 1.0)) + 1000.0,
               0) AS BIGINT) AS idf_milli
        FROM corpus_df CROSS JOIN n
    ), w AS (
        SELECT doc_id, term, tc * idf_milli AS wq FROM tf JOIN idf USING (term)
    ), nrm AS (
        SELECT doc_id, CAST(sum(wq * wq) AS BIGINT) AS nq FROM w GROUP BY 1
    ), dots AS (
        SELECT q.doc_id AS doc_id, c.doc_id AS neighbor_id,
               CAST(sum(q.wq * c.wq) AS BIGINT) AS dot
        FROM w q JOIN w c USING (term)
        WHERE q.doc_id < 100 AND c.doc_id >= 100
        GROUP BY 1, 2
    ), cosr AS (
        SELECT dots.doc_id, neighbor_id,
               dot / (sqrt(CAST(na.nq AS DOUBLE)) * sqrt(CAST(nb.nq AS DOUBLE))) AS cos
        FROM dots
        JOIN nrm na ON dots.doc_id = na.doc_id
        JOIN nrm nb ON dots.neighbor_id = nb.doc_id
    )
    SELECT doc_id, neighbor_id, CAST(rnk AS BIGINT) AS rnk,
           round(cos, 6) AS cos_sim
    FROM (
        SELECT doc_id, neighbor_id, cos,
               row_number() OVER (
                   PARTITION BY doc_id ORDER BY cos DESC, neighbor_id ASC
               ) AS rnk
        FROM cosr
    ) WHERE rnk <= 5
"""

# Round-9 BM25 over the frozen index. Constants are written as ARITHMETIC
# over explicit DOUBLE casts ((1.2 + 1.0), (1.0 - 0.75)) so both engines
# compute the identical doubles Spark's Python-side k1+1.0 produces (a
# bare DuckDB 1.2 literal would be DECIMAL); avgdl derives from the same
# exact integer (sum_dl, count) pair; every contribution rounds to BIGINT
# before the sum, so no float crosses the hash.
EXTENSION_ORACLES["bm25_search_docs"] = """
    WITH tok AS (
        SELECT doc_id, t AS term FROM (
            SELECT doc_id,
                   unnest(regexp_split_to_array(trim(lower(text)), '\\s+')) AS t
            FROM documents
        ) WHERE length(t) > 0
    ), tf AS (
        SELECT doc_id, term, count(*) AS tc FROM tok GROUP BY 1, 2
    ), corpus_df AS (
        SELECT term, count(*) AS docs_with FROM tf WHERE doc_id >= 100
        GROUP BY 1 HAVING count(*) <= 100
    ), n AS (SELECT count(*) AS n_docs FROM documents WHERE doc_id >= 100),
    idf AS (
        SELECT term,
               CAST(round(
                   1000.0 * ln((n_docs + 1.0) / (docs_with + 1.0)) + 1000.0,
               0) AS BIGINT) AS idf_milli
        FROM corpus_df CROSS JOIN n
    ), posts AS (
        SELECT doc_id, term, tc FROM tf JOIN idf USING (term)
        WHERE doc_id >= 100
    ), dl AS (
        SELECT doc_id, CAST(sum(tc) AS BIGINT) AS dl FROM tf
        WHERE doc_id >= 100 GROUP BY 1
    ), nrm AS (
        SELECT d.doc_id, d.dl
        FROM dl d JOIN (SELECT DISTINCT doc_id FROM posts) p USING (doc_id)
    ), avg AS (
        SELECT CAST(sum(dl) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS avgdl
        FROM nrm
    ), qtf AS (
        SELECT doc_id AS q, term, tc AS qtf, idf_milli
        FROM tf JOIN idf USING (term) WHERE doc_id < 100
    ), contrib AS (
        SELECT q, posts.doc_id AS neighbor_id,
               CAST(round(
                   (qtf * idf_milli)
                   * (posts.tc * (CAST(1.2 AS DOUBLE) + CAST(1.0 AS DOUBLE)))
                   / (posts.tc
                      + CAST(1.2 AS DOUBLE)
                        * ((CAST(1.0 AS DOUBLE) - CAST(0.75 AS DOUBLE))
                           + (CAST(0.75 AS DOUBLE) * nrm.dl) / avgdl)),
               0) AS BIGINT) AS sc
        FROM qtf
        JOIN posts USING (term)
        JOIN nrm ON posts.doc_id = nrm.doc_id
        CROSS JOIN avg
    ), scored AS (
        SELECT q AS doc_id, neighbor_id, CAST(sum(sc) AS BIGINT) AS score_milli
        FROM contrib GROUP BY 1, 2
    )
    SELECT doc_id, neighbor_id, CAST(rnk AS BIGINT) AS rnk, score_milli
    FROM (
        SELECT doc_id, neighbor_id, score_milli,
               row_number() OVER (
                   PARTITION BY doc_id
                   ORDER BY score_milli DESC, neighbor_id ASC
               ) AS rnk
        FROM scored
    ) WHERE rnk <= 5
"""

ALL_ORACLES: dict[str, str] = {
    **PARITY_ORACLES,
    **EXTENSION_ORACLES,
    **TEMPORAL_ORACLES,
    **WAREHOUSE_ORACLES,
}

# Round-10 prefix-filtered exact Jaccard join: the oracle is the UNPRUNED
# all-pairs form — identical distinct word-3-shingle sets, identical integer
# threshold arithmetic (i*den >= num*(na+nb-i), 0.6 = 3/5) — so the hash
# compare proves the AllPairs prefix filter's candidate completeness.
EXTENSION_ORACLES["jaccard_join_docs"] = f"""
    WITH g AS (
        SELECT doc_id, g FROM (
            SELECT doc_id,
                   unnest(list_distinct([array_to_string(toks[i : i + 2], ' ')
                          for i in range(1, greatest(len(toks) - 2, 1) + 1)])) AS g
            FROM (SELECT doc_id, {_TOKENS} AS toks FROM documents)
        ) WHERE length(g) > 0
    ), sz AS (
        SELECT doc_id, count(*) AS n FROM g GROUP BY doc_id
    ), inter AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS i
        FROM g a JOIN g b ON a.g = b.g AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    )
    SELECT id_a, id_b,
           CAST(i AS BIGINT) AS n_inter,
           CAST(sa.n AS BIGINT) AS n_a,
           CAST(sb.n AS BIGINT) AS n_b
    FROM inter
    JOIN sz sa ON sa.doc_id = id_a
    JOIN sz sb ON sb.doc_id = id_b
    WHERE i * 5 >= 3 * (sa.n + sb.n - i)
"""

# Round-10 dataset-card profile: exact integer corpus summary per
# (lang, source) — same whitespace token counting as top_fraction_docs.
EXTENSION_ORACLES["corpus_stats_docs"] = """
    WITH t AS (
        SELECT lang, source,
               CAST(len([x for x in regexp_split_to_array(trim(text), '\\s+')
                         if length(x) > 0]) AS BIGINT) AS toks,
               CAST(length(coalesce(text, '')) AS BIGINT) AS chars
        FROM documents
    )
    SELECT lang, source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(toks) AS BIGINT) AS tok_sum,
           CAST(sum(chars) AS BIGINT) AS char_sum,
           CAST(max(toks) AS BIGINT) AS max_tokens
    FROM t GROUP BY 1, 2
"""

# rebuild after the round-10 late additions (the file's established
# late-addition pattern)
ALL_ORACLES = {
    **PARITY_ORACLES,
    **EXTENSION_ORACLES,
    **TEMPORAL_ORACLES,
    **WAREHOUSE_ORACLES,
}

# Round-10 PMI collocations: identical pair construction (1-based token
# positions i, partners j in i+1..min(i+window, len)), canonical
# (least, greatest) pair keys, per-slot marginals summed from the SAME
# counted pairs, and the one transcendental computed on the identical
# (N*c_ab)/(c_a*c_b) double then milli-quantized.
EXTENSION_ORACLES["pmi_docs"] = """
    WITH toks AS (
        SELECT [x for x in regexp_split_to_array(trim(lower(text)), '\\s+')
                if length(x) > 0] AS tk
        FROM documents
    ), pos AS (
        SELECT tk, unnest(range(1, len(tk))) AS i FROM toks
    ), pairs AS (
        SELECT least(tk[i], tk[j]) AS t1, greatest(tk[i], tk[j]) AS t2
        FROM (SELECT tk, i, unnest(range(i + 1, least(i + 5, len(tk)) + 1)) AS j
              FROM pos)
    ), counts AS (
        SELECT t1, t2, CAST(count(*) AS BIGINT) AS n_pair FROM pairs GROUP BY 1, 2
    ), slots AS (
        SELECT t, CAST(sum(n_pair) AS BIGINT) AS n_t
        FROM (SELECT unnest([t1, t2]) AS t, n_pair FROM counts)
        GROUP BY t
    ), tot AS (
        SELECT CAST(sum(n_pair) AS DOUBLE) AS n FROM counts
    )
    SELECT t1, t2, n_pair,
           s1.n_t AS n_t1, s2.n_t AS n_t2,
           CAST(round(1000 * ln(((SELECT n FROM tot) * n_pair)
                                / (CAST(s1.n_t AS DOUBLE) * CAST(s2.n_t AS DOUBLE))),
                      0) AS BIGINT) AS pmi_milli
    FROM counts
    JOIN slots s1 ON s1.t = t1
    JOIN slots s2 ON s2.t = t2
    WHERE n_pair >= 5
"""

ALL_ORACLES = {
    **PARITY_ORACLES,
    **EXTENSION_ORACLES,
    **TEMPORAL_ORACLES,
    **WAREHOUSE_ORACLES,
}

# Round-10 corpus-wide scored cut (top_fraction_approx, by=None): exact
# global rank semantics — DuckDB re-ranks the whole corpus and keeps
# ceil(n * 0.1) under the same (score DESC, id ASC) tie-break.
EXTENSION_ORACLES["top_fraction_corpus_docs"] = """
    WITH scored AS (
        SELECT doc_id,
               CAST(len([t for t in regexp_split_to_array(trim(text), '\\s+')
                         if length(t) > 0]) AS BIGINT) AS n_tokens
        FROM documents
    ), ranked AS (
        SELECT doc_id, n_tokens,
               row_number() OVER (ORDER BY n_tokens DESC, doc_id ASC) AS rn,
               count(*) OVER () AS n
        FROM scored
    )
    SELECT doc_id, n_tokens FROM ranked WHERE rn <= ceil(n * 0.1)
"""

ALL_ORACLES = {
    **PARITY_ORACLES,
    **EXTENSION_ORACLES,
    **TEMPORAL_ORACLES,
    **WAREHOUSE_ORACLES,
}

# Round-11 BPE encode under the frozen merge fixture: the oracle REPLAYS
# the merge table rank-by-rank in a recursive CTE (see
# fixtures_bpe.bpe_encode_oracle_sql for the left-fold <-> left-to-right
# scan equivalence argument), recomputing the word->pieces dictionary from
# the raw text inside DuckDB — a full end-to-end check of the engine's
# merge replay, closing the last catalog family with no DuckDB hash.
from .fixtures_bpe import bpe_encode_oracle_sql as _bpe_oracle  # noqa: E402

EXTENSION_ORACLES["bpe_encode_docs"] = _bpe_oracle()


# ONE SQL copy of the synthetic URL derivation and of the canonical-form
# suffix, shared by the domain-tier oracles (the Spark twin lives in
# extensions._synthetic_url / functions.urls.canonicalize_url — the two
# sides must stay in lockstep or the hash rows diverge).
# the path/id key modulus is CORPUS-SCALED (round-14, verdict r13 item 4):
# ~n/4 rounded down to a multiple of 140 = lcm(source cycle 20, suffix
# arm 7), floored at 140 — extensions._url_mod's twin. Distinct
# canonicals grow ~n/4 with the corpus instead of saturating at the old
# doc_id % 50's ~200, every key class (ids i, i+m, i+2m, i+3m) shares
# source AND suffix arm so it collapses to ONE canonical across the six
# canonicalization-stripped arm variants, and the scalar count(*)
# subquery keeps the twin derivable inside one SQL string.
_URL_MOD_SQL = (
    "(SELECT 140 * (CASE WHEN (count(*) // 4) // 140 < 1 THEN 1 "
    "ELSE (count(*) // 4) // 140 END) FROM documents)"
)

_URL_DERIVE_SQL = f"""'HTTPS://'
               || CASE WHEN doc_id % 11 = 0 THEN 'www.' ELSE '' END
               || CASE WHEN doc_id % 2 = 0 THEN upper(source) ELSE source END
               || CASE WHEN doc_id % 7 = 0 THEN '.Example.CO.UK' ELSE '.Example.COM' END
               || CASE WHEN doc_id % 3 = 0 THEN ':443' ELSE '' END
               || '/d/' || (doc_id % {_URL_MOD_SQL})
               || CASE WHEN doc_id % 4 = 0 THEN '/' ELSE '' END
               || '?utm_source=feed&z=9&id=' || (doc_id % {_URL_MOD_SQL}) || '&a=1'
               || CASE WHEN doc_id % 5 = 0 THEN '#sec2' ELSE '' END AS url"""

_URL_CANON_SQL = """scheme || '://' || host
               || CASE WHEN port = ''
                         OR (scheme = 'https' AND port = '443')
                         OR (scheme = 'http' AND port = '80')
                       THEN '' ELSE ':' || port END
               || regexp_replace(regexp_extract(nofrag,
                      '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)', 1), '/+$', '')
               || CASE WHEN qs = '' THEN '' ELSE '?' || qs END"""

# Round-11 domain-tier profile: the oracle re-derives the SAME synthetic
# URL from (source, doc_id), then replays the functions/urls.py spec
# step-for-step (fragment strip, scheme/host lowering, www./default-port
# strip, trailing-slash strip, tracking-param drop + param sort) and —
# round 12 — the FULL PSL algorithm, with the CASE expression GENERATED
# from the same loaded rule data the Spark expression compiles from
# (psl_slen_sql / psl_registered_sql), before the per-host rollup; the
# hash therefore checks the whole canonicalization + PSL spec.
from ..functions.urls import TRACKING_RE as _URL_TRACKING_RE  # noqa: E402
from ..functions.urls import psl_registered_sql, psl_slen_sql  # noqa: E402

_PSL_SLEN = psl_slen_sql("labels")
_PSL_REG = psl_registered_sql("host", "labels", "__slen")

EXTENSION_ORACLES["domain_stats_docs"] = f"""
    WITH u AS (
        SELECT text,
               {_URL_DERIVE_SQL}
        FROM documents
    ), parsed AS (
        SELECT text,
               regexp_replace(url, '#.*$', '') AS nofrag,
               lower(regexp_extract(url, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1)) AS scheme,
               regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)', 1) AS hostport
        FROM u
    ), hp AS (
        SELECT text, nofrag, scheme,
               regexp_replace(lower(regexp_replace(hostport, ':[0-9]+$', '')),
                              '^www\\.', '') AS host,
               regexp_extract(hostport, ':([0-9]+)$', 1) AS port
        FROM parsed
    ), qsplit AS (
        SELECT *, string_split(host, '.') AS labels,
               array_to_string(list_sort(list_filter(
                   string_split(regexp_extract(nofrag, '\\?([^#]*)', 1), '&'),
                   p -> p <> '' AND NOT regexp_matches(p, '{_URL_TRACKING_RE}'))),
                   '&') AS qs
        FROM hp
    ), slenned AS (
        SELECT *, {_PSL_SLEN} AS __slen FROM qsplit
    ), canon AS (
        SELECT text, host,
               {_PSL_REG} AS reg_domain,
               {_URL_CANON_SQL} AS canonical
        FROM slenned
    )
    SELECT host, reg_domain,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(count(DISTINCT canonical) AS BIGINT) AS n_urls,
           CAST(sum(len([t for t in regexp_split_to_array(trim(text), '\\s+')
                         if length(t) > 0])) AS BIGINT) AS tok_sum,
           CAST(sum(length(coalesce(text, ''))) AS BIGINT) AS char_sum
    FROM canon GROUP BY host, reg_domain
"""


# Round-11 URL-canonical dedup groups (rotated): same URL derivation and
# canonicalization replay as domain_stats_docs, grouped by the canonical
# string — the hash checks that every alias class collapses identically.
EXTENSION_ORACLES["url_dedup_docs"] = f"""
    WITH u AS (
        SELECT doc_id,
               {_URL_DERIVE_SQL}
        FROM documents
    ), parsed AS (
        SELECT doc_id,
               regexp_replace(url, '#.*$', '') AS nofrag,
               lower(regexp_extract(url, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1)) AS scheme,
               regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)', 1) AS hostport
        FROM u
    ), hp AS (
        SELECT doc_id, nofrag, scheme,
               regexp_replace(lower(regexp_replace(hostport, ':[0-9]+$', '')),
                              '^www\\.', '') AS host,
               regexp_extract(hostport, ':([0-9]+)$', 1) AS port
        FROM parsed
    ), canon AS (
        SELECT doc_id,
               {_URL_CANON_SQL} AS canonical_url
        FROM (SELECT *,
                     array_to_string(list_sort(list_filter(
                         string_split(regexp_extract(nofrag, '\\?([^#]*)', 1), '&'),
                         p -> p <> '' AND NOT regexp_matches(p, '{_URL_TRACKING_RE}'))),
                         '&') AS qs
              FROM hp)
    )
    SELECT canonical_url,
           CAST(count(*) AS BIGINT) AS n_copies,
           min(doc_id) AS keeper_id
    FROM canon GROUP BY canonical_url
"""

# Round-12 canonical-URL keeper store merge view (rotated): two sequential
# ingest batches split at the median doc_id; the merged contract is
# keeper_id = the FIRST batch holding the canonical's lowest id (stable
# across later re-crawls), fp = the LATEST batch's representative content
# fingerprint (CDC advancement). The twin replays URL derivation +
# canonicalization + per-batch representative selection + the
# first-wins/latest-fp merge relationally.
EXTENSION_ORACLES["url_keeper_merge_docs"] = f"""
    WITH u AS (
        SELECT doc_id, text,
               {_URL_DERIVE_SQL}
        FROM documents
    ), parsed AS (
        SELECT doc_id, text,
               regexp_replace(url, '#.*$', '') AS nofrag,
               lower(regexp_extract(url, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1)) AS scheme,
               regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)', 1) AS hostport
        FROM u
    ), hp AS (
        SELECT doc_id, text, nofrag, scheme,
               regexp_replace(lower(regexp_replace(hostport, ':[0-9]+$', '')),
                              '^www\\.', '') AS host,
               regexp_extract(hostport, ':([0-9]+)$', 1) AS port
        FROM parsed
    ), canon AS (
        SELECT doc_id, text,
               CASE WHEN doc_id < (SELECT count(*) // 2 FROM documents)
                    THEN 1 ELSE 2 END AS b,
               {_URL_CANON_SQL} AS canonical_url
        FROM (SELECT *,
                     array_to_string(list_sort(list_filter(
                         string_split(regexp_extract(nofrag, '\\?([^#]*)', 1), '&'),
                         p -> p <> '' AND NOT regexp_matches(p, '{_URL_TRACKING_RE}'))),
                         '&') AS qs
              FROM hp)
    ), rep AS (
        SELECT canonical_url, b, min(doc_id) AS rid
        FROM canon GROUP BY 1, 2
    ), repfp AS (
        SELECT r.canonical_url, r.b, r.rid,
               sha256({_NORM_TEXT}) AS fp
        FROM rep r JOIN canon c ON c.doc_id = r.rid AND c.b = r.b
                                AND c.canonical_url = r.canonical_url
    )
    SELECT coalesce(b1.canonical_url, b2.canonical_url) AS canonical_url,
           coalesce(b1.rid, b2.rid) AS keeper_id,
           coalesce(b2.fp, b1.fp) AS fp
    FROM (SELECT * FROM repfp WHERE b = 1) b1
    FULL OUTER JOIN (SELECT * FROM repfp WHERE b = 2) b2
      ON b1.canonical_url = b2.canonical_url
"""

ALL_ORACLES = {
    **PARITY_ORACLES,
    **EXTENSION_ORACLES,
    **TEMPORAL_ORACLES,
    **WAREHOUSE_ORACLES,
}
