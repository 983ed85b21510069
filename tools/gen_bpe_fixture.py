"""Regenerate catalog/fixtures_bpe.py's frozen merge table.

Run when the sf0.001 training corpus changes (TESTDATA.md regeneration):
``python tools/gen_bpe_fixture.py`` retrains with the recorded params and
prints the ``BPE_MERGES`` literal to paste into the fixture module;
``tests/test_bpe_oracle.py::test_fixture_matches_retraining`` then pins
the new table.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    from etl_data_transformer_spark.catalog.fixtures_bpe import BPE_FIXTURE_PARAMS
    from etl_data_transformer_spark.functions import text as TX
    from etl_data_transformer_spark.session import get_spark

    spark = get_spark("gen-bpe-fixture", master="local[8]", shuffle_partitions=8)
    d = spark.read.parquet(BPE_FIXTURE_PARAMS["sf_dir"] + "/documents.parquet")
    merges = TX.bpe_train(
        d,
        num_merges=BPE_FIXTURE_PARAMS["num_merges"],
        max_words=BPE_FIXTURE_PARAMS["max_words"],
        min_word_count=BPE_FIXTURE_PARAMS["min_word_count"],
    )
    print("BPE_MERGES: list[tuple[str, str]] = [")
    for a, b in merges:
        print(f"    ({a!r}, {b!r}),")
    print("]")
    spark.stop()


if __name__ == "__main__":
    main()
