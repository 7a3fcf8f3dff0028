"""Regenerate the committed BPE merge-table fixture.

Trains ``bpe_train`` (deterministic: weighted pair counts with a
(count DESC, pair ASC) argmax) on the sf0.001 documents corpus and
writes the result in the published ``merges.txt`` wire format to
``dataingestionframework_spark/fixtures/bpe_merges.txt``.

The fixture stands in for a production tokenizer's merges file (this
container has no network to fetch a published vocabulary); the
mechanism under test — external merges file → ``load_merges`` →
``bpe_encode`` mapInPandas → SQL-oracled token counts — is byte-format
compatible with real tokenizer releases.

Usage: python -m tools.regen_bpe_fixture [n_merges]
"""

from __future__ import annotations

import sys

N_MERGES = 32


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else N_MERGES
    from dataingestionframework_spark.operators.text import (
        bpe_train,
        default_merges_path,
        save_merges,
    )
    from dataingestionframework_spark.plans.tables import load
    from dataingestionframework_spark.session import get_spark

    spark = get_spark("regen-bpe-fixture")
    docs = load(spark, "/root/testdata/sf0.001", "documents")
    merges = bpe_train(docs, n_merges=n)
    save_merges(merges, default_merges_path())
    print(f"wrote {len(merges)} merges to {default_merges_path()}")


if __name__ == "__main__":
    main()
