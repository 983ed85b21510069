"""Round-11 pins for the frozen BPE merge fixture (verdict item 1).

The driver-strength row (``bpe_encode_docs``) hash-compares the engine's
merge replay against the DuckDB recursive-CTE replay; these tests pin the
two assumptions that row stands on:

1. the fixture IS what ``bpe_train`` produces on its recorded corpus
   (training determinism — rerun must be bit-identical), and
2. the SQL left-fold replay equals the Python left-to-right scan on
   adversarial symbol streams (repeated symbols, merges whose output
   re-participates in later merges), not just on fixture words.
"""

from __future__ import annotations

import duckdb

from etl_data_transformer_spark.catalog.fixtures_bpe import (
    BPE_FIXTURE_PARAMS,
    BPE_MERGES,
    bpe_encode_oracle_sql,
)
from etl_data_transformer_spark.functions import text as TX


def test_fixture_matches_retraining(spark):
    d = spark.read.parquet(BPE_FIXTURE_PARAMS["sf_dir"] + "/documents.parquet")
    merges = TX.bpe_train(
        d,
        num_merges=BPE_FIXTURE_PARAMS["num_merges"],
        max_words=BPE_FIXTURE_PARAMS["max_words"],
        min_word_count=BPE_FIXTURE_PARAMS["min_word_count"],
    )
    assert merges == BPE_MERGES


def _py_replay(word: str, merges: list[tuple[str, str]]) -> list[str]:
    # the reference left-to-right non-overlapping scan (bpe_encode's enc)
    sym = list(word) + ["</w>"]
    for a, b in merges:
        if len(sym) == 1:
            break
        out = []
        i = 0
        while i < len(sym):
            if i < len(sym) - 1 and sym[i] == a and sym[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(sym[i])
                i += 1
        sym = out
    return sym


def test_sql_fold_equals_scan_on_adversarial_words():
    # repeated symbols (xx runs), merges that chain (e->er->erg), and a
    # merge whose left side reappears as the previous merge's output
    merges = [("x", "x"), ("xx", "x"), ("e", "r"), ("er", "g"), ("a", "</w>")]
    words = ["xxxx", "xxx", "xx", "x", "ergo", "era", "aaa", "ga", "gerg"]
    con = duckdb.connect()
    values = ", ".join(f"({i}, '{w}')" for i, w in enumerate(words, start=1))
    con.execute(
        f"CREATE VIEW documents AS FROM (VALUES {values}) t(doc_id, text)"
    )
    got = {
        r[0]: r[1]
        for r in con.execute(
            "SELECT doc_id, pieces_str FROM (" + bpe_encode_oracle_sql(merges) + ")"
        ).fetchall()
    }
    for i, w in enumerate(words, start=1):
        assert got[i] == " ".join(_py_replay(w, merges)), w


def test_oracle_handles_empty_and_null_text():
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM (VALUES "
        "(1, 'key scan'), (2, ''), (3, NULL), (4, '   ')) t(doc_id, text)"
    )
    rows = dict(
        con.execute(
            "SELECT doc_id, n_pieces FROM (" + bpe_encode_oracle_sql(BPE_MERGES) + ")"
        ).fetchall()
    )
    assert rows[2] == 0 and rows[3] == 0 and rows[4] == 0
    assert rows[1] > 0
