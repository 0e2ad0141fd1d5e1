"""Distributed byte-pair-encoding trainer (Sennrich et al., ACL 2016).

Classic corpus-level BPE: start from character symbols inside each word,
repeatedly (a) count adjacent symbol pairs across the corpus and (b) merge
the most frequent pair into one symbol, recording the merge table that a
tokenizer later replays.

Spark-first shape:

- The corpus collapses to the **word-frequency table** first (one shuffle);
  every subsequent round works on distinct words weighted by frequency —
  the standard trick that makes BPE training corpus-size-independent
  (|distinct words| ≪ |tokens|).
- Pair counting is a scan-side ``zip_with`` over shifted slices of the
  symbol array (O(word length) per word), then one map-side-combinable
  groupBy.
- The winning pair (max count, ties broken by pair text so runs are
  deterministic) is a 1-row ``collect`` per round — the same bounded
  driver-loop pattern as ``connected_components`` / k-means.
- The merge itself is a **left-to-right non-overlapping fold** inside
  Catalyst: ``F.aggregate`` carries (emitted-array, pending-symbol) through
  each word's symbols, fusing ``pending+current`` when they equal the
  winning pair — no Python UDF anywhere.
- ``localCheckpoint`` truncates the lineage each round (R rounds would
  otherwise stack R plan copies), mirroring the iterative-algorithm
  hygiene used by connected_components.

At 100 TB the word-frequency table still fits comfortably in a few
executors (natural-language vocabulary growth is sub-linear — Heaps' law),
and each round is one tiny shuffle over it.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def word_freq_table(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, freq) over whitespace tokens — the BPE working set."""
    return (
        docs.select(F.explode(F.split(F.col(text_col), " ")).alias("word"))
        .filter(F.length("word") > 0)
        .groupBy("word")
        .agg(F.count("*").alias("freq"))
    )


def _init_symbols(words: DataFrame) -> DataFrame:
    return words.select(
        "word", "freq", F.split(F.col("word"), "").alias("syms")
    )


def _pair_counts(syms: DataFrame) -> DataFrame:
    n = F.size("syms")
    pairs = F.zip_with(
        F.slice("syms", 1, n - 1),
        F.slice("syms", 2, n - 1),
        lambda a, b: F.concat(a, F.lit(""), b),
    )
    return (
        syms.filter(n >= 2)
        .select(F.explode(pairs).alias("pair"), "freq")
        .groupBy("pair")
        .agg(F.sum("freq").alias("cnt"))
    )


def _merge_fold(left: str, right: str) -> Column:
    """Left-to-right non-overlapping merge of (left, right) -> left+right
    as a Catalyst fold: acc = (emitted array, pending symbol)."""
    fused = left + right

    def step(acc, s):
        pending = acc["p"]
        hit = pending.eqNullSafe(F.lit(left)) & (s == F.lit(right))
        return F.struct(
            F.when(hit, F.concat(acc["a"], F.array(F.lit(fused))))
            .otherwise(
                F.when(
                    pending.isNull(), acc["a"]
                ).otherwise(F.concat(acc["a"], F.array(pending)))
            ).alias("a"),
            F.when(hit, F.lit(None).cast("string")).otherwise(s).alias("p"),
        )

    init = F.struct(
        F.array().cast("array<string>").alias("a"),
        F.lit(None).cast("string").alias("p"),
    )
    return F.aggregate(
        "syms",
        init,
        step,
        lambda acc: F.when(
            acc["p"].isNull(), acc["a"]
        ).otherwise(F.concat(acc["a"], F.array(acc["p"]))),
    )


def train_bpe(
    spark: SparkSession, docs: DataFrame, n_merges: int = 10,
    text_col: str = "text",
) -> tuple[list[tuple[int, str, str, int]], DataFrame]:
    """Run ``n_merges`` BPE rounds; returns (merge table rows
    [(rank, left, right, count)], final symbolized word table
    (word, freq, syms) — i.e. the trained tokenizer already applied to
    the training vocabulary)."""
    syms = _init_symbols(word_freq_table(docs, text_col)).localCheckpoint()
    merges: list[tuple[int, str, str, int]] = []
    for rank in range(n_merges):
        top = (
            _pair_counts(syms)
            .orderBy(F.desc("cnt"), "pair")
            .limit(1)
            .collect()
        )
        if not top:
            break
        pair, cnt = top[0]["pair"], int(top[0]["cnt"])
        left, right = pair.split("")
        merges.append((rank, left, right, cnt))
        syms = syms.select(
            "word", "freq", _merge_fold(left, right).alias("syms")
        ).localCheckpoint()
    return merges, syms
