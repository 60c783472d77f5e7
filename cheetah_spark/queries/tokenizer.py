"""Tokenizer training: distributed BPE over the documents corpus
(operators/bpe.py — see there for the 100 TB shape: one corpus
shuffle, then vocabulary-bounded iteration).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cheetah_spark.catalog import load_table
from cheetah_spark.operators.bpe import train_bpe
from cheetah_spark.registry import register

_BPE_MERGES = 6


@register(
    "q_llm_bpe_train",
    oracle=f"""
        WITH words AS (
            SELECT w AS word, COUNT(*)::BIGINT AS freq FROM (
                SELECT unnest(string_split_regex(lower(text), '\\s+')) AS w
                FROM documents
            ) WHERE w <> '' GROUP BY w
        ), pairs AS (
            SELECT substr(word, i, 1) AS l, substr(word, i + 1, 1) AS r,
                   CAST(SUM(freq) AS BIGINT) AS pf
            FROM words, UNNEST(range(1, length(word))) AS t(i)
            GROUP BY 1, 2
        ), first_merge AS (
            SELECT l, r, pf FROM pairs ORDER BY pf DESC, l ASC, r ASC LIMIT 1
        )
        SELECT {_BPE_MERGES} AS n_merges,
               l AS first_left, r AS first_right, pf AS first_pair_freq,
               (SELECT CAST(SUM(length(word) * freq) AS BIGINT) FROM words)
                   AS initial_symbols,
               TRUE AS freqs_nonincreasing,
               TRUE AS merges_distinct,
               TRUE AS final_le_initial
        FROM first_merge
    """,
    tags=("llm", "tokenizer", "iterative"),
)
def q_llm_bpe_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train a BPE merge list on the corpus (Sennrich et al. 2016) —
    the "train the tokenizer" step of an LLM data pipeline, run as the
    distributed iteration documented in operators/bpe.py.

    Contract row (the k-means pattern — an iterative result can't
    hash-match a flat SQL query, so the oracle pins what SQL CAN
    compute plus structural invariants the training must satisfy):

    - the FIRST merge (pair + weighted frequency) is recomputed
      exactly by the oracle from the initial character-split word
      table under the identical total order (freq desc, pair asc);
    - ``initial_symbols`` (character count of the tokenized corpus,
      the starting sequence length) is SQL-exact;
    - selection frequencies are provably non-increasing across ranks
      (a merge can only create pairs at most as frequent as the pair
      it fused), merges are distinct, and the final symbol count
      cannot exceed the initial one — each pinned TRUE and computed
      for real from the learned merge list, so a broken trainer flips
      the flag and fails the driver row.

    The full merge list itself is exposed via
    :func:`cheetah_spark.operators.bpe.train_bpe` and equivalence-
    tested against an independent single-node reference implementation
    in tests/test_tokenizer.py."""
    d = load_table(spark, sf_dir, "documents")
    merges, final_words, initial = train_bpe(spark, d, _BPE_MERGES)
    freqs = [m[3] for m in merges]
    tokens = [m[1] + m[2] for m in merges]
    nonincreasing = all(a >= b for a, b in zip(freqs, freqs[1:]))

    final = (
        final_words.agg(F.sum(F.size("symbols") * F.col("freq")).cast("long").alias("n"))
        .collect()[0]["n"]
    )

    return spark.createDataFrame(
        [
            (
                _BPE_MERGES,
                merges[0][1],
                merges[0][2],
                merges[0][3],
                initial,
                bool(nonincreasing),
                len(set(tokens)) == len(tokens),
                bool(final <= initial),
            )
        ],
        "n_merges int, first_left string, first_right string, first_pair_freq long, "
        "initial_symbols long, freqs_nonincreasing boolean, merges_distinct boolean, "
        "final_le_initial boolean",
    )
