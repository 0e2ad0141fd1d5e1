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
  symbol array (O(word length) per word) producing ``struct<l,r>`` pairs —
  no in-band delimiter, so arbitrary corpus text (including control
  characters) round-trips exactly — then one map-side-combinable groupBy.
- The winning pair (max count, ties broken by (left, right)
  tuple-lexicographic struct order so runs are deterministic) is a 1-row
  ``collect`` per round — the same bounded driver-loop pattern as
  ``connected_components`` / k-means.
- The merge itself is a **left-to-right non-overlapping fold** inside
  Catalyst: ``F.aggregate`` carries (emitted-array, pending-symbol) through
  each word's symbols, fusing ``pending+current`` when they equal the
  winning pair — no Python UDF anywhere.
- ``localCheckpoint`` truncates the lineage each round (R rounds would
  otherwise stack R plan copies), mirroring the iterative-algorithm
  hygiene used by connected_components.

Driver-side finish (the canonical scale escape hatch): a real tokenizer
run is 32k–64k merges = one Spark job per merge over a table whose size
never changes (|distinct words|, Heaps'-law small — a few million rows at
100 TB of text).  When that table fits on the driver
(``driver_finish_rows``), we collect it ONCE and run every merge locally
with the exact same max-count/tie-break/merge-fold algorithm — identical
output (pinned by tests/test_queries_r4.py's python-replay equality and a
both-paths-agree test), and the job count drops from O(n_merges) to O(1).
Job-count math is recorded in SCALE.md.  Distributed rounds remain the
path for vocabularies above the threshold.
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
        lambda a, b: F.struct(a.alias("l"), b.alias("r")),
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


def _local_merge_word(s: list[str], left: str, right: str) -> list[str]:
    """Exact local twin of _merge_fold: left-to-right non-overlapping."""
    acc: list[str] = []
    pend: str | None = None
    for ch in s:
        if pend is not None and pend == left and ch == right:
            acc.append(left + right)
            pend = None
        else:
            if pend is not None:
                acc.append(pend)
            pend = ch
    if pend is not None:
        acc.append(pend)
    return acc


def _local_train(
    table: list[tuple[str, int, list[str]]], n_merges: int, start_rank: int
) -> list[tuple[int, str, str, int]]:
    """Run the remaining merges driver-side over the collected type table,
    mutating ``table`` in place.  Same selection rule as the distributed
    round: max count, ties by (left, right) ascending."""
    merges: list[tuple[int, str, str, int]] = []
    for rank in range(start_rank, start_rank + n_merges):
        counts: dict[tuple[str, str], int] = {}
        for _w, freq, s in table:
            for a, b in zip(s, s[1:]):
                counts[(a, b)] = counts.get((a, b), 0) + freq
        if not counts:
            break
        (left, right), cnt = min(
            counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        merges.append((rank, left, right, cnt))
        for i, (w, freq, s) in enumerate(table):
            table[i] = (w, freq, _local_merge_word(s, left, right))
    return merges


def _safe_merge_batch(
    cands: list[tuple[str, str, int]], window: int, alphabet: set[str],
) -> list[tuple[str, str, int]]:
    """Largest prefix of the (cnt desc, pair asc)-sorted candidate list
    that can be applied in ONE pass with output byte-identical to applying
    the merges one sequential round at a time.

    Safety argument (each clause kills one divergence mode):

    1. **No-skip prefix, pairwise symbol-disjoint.**  Disjoint merges
       commute and cannot change each other's pair counts, so every
       prefix member's count is still exact when the sequential algorithm
       reaches it.  No-skip matters: a *skipped* conflicting pair keeps a
       sort key better than later prefix members and its count need not
       drop after the earlier merge — sequential could pick it first.
    2. **Fused strings stay out of the symbol alphabet** (and off other
       candidates' symbols).  If the fused symbol already existed, an old
       pair containing it could GAIN occurrences from the merge and
       overtake the prefix.  The alphabet is tracked exactly driver-side:
       initial distinct characters + every fused string ever created.
    3. **Strict count gap to every conflict.**  A merge can only create
       new pairs adjacent to its fused symbol, and each occurrence of
       such a pair consumes an occurrence of an ORIGINAL pair sharing a
       symbol with the merged one — so new-pair counts are bounded by
       C* = max count over non-prefix candidates that share a symbol
       with (or collide with the fused string of) the prefix.  When the
       collected window may be incomplete, unseen pairs are bounded by
       the window's last count, folded into C*.  Requiring
       cnt(last accepted) > C* makes every new/conflicting pair a STRICT
       loser at every intermediate sequential step — no tie-break
       ambiguity.
    """
    if not cands:
        return []
    # the first candidate alone IS the sequential step — always safe,
    # even when its fused string collides with an existing symbol; but
    # in that collision case pairs containing the pre-existing symbol
    # can GAIN occurrences (clause-3's bound assumes counts never grow),
    # so no further batching on top of it
    if cands[0][0] + cands[0][1] in alphabet:
        return cands[:1]
    accepted: list[tuple[str, str, int]] = [cands[0]]
    used: set[str] = {cands[0][0], cands[0][1], cands[0][0] + cands[0][1]}
    stop = len(cands)
    for i, (left, right, cnt) in enumerate(cands[1:], start=1):
        fused = left + right
        if (
            left in used or right in used or fused in used
            or fused in alphabet
        ):
            stop = i
            break
        accepted.append((left, right, cnt))
        used.update((left, right, fused))
    if len(accepted) <= 1:
        return accepted[:1]
    # C*: best count among conflicting or unseen candidates
    c_star = 0
    for left, right, cnt in cands[stop:]:
        if left in used or right in used:
            c_star = max(c_star, cnt)
    if len(cands) >= window:        # window may have truncated the list
        c_star = max(c_star, cands[-1][2])
    while len(accepted) > 1 and accepted[-1][2] <= c_star:
        accepted.pop()
    return accepted


def train_bpe(
    spark: SparkSession, docs: DataFrame, n_merges: int = 10,
    text_col: str = "text",
    driver_finish_rows: int = 100_000,
    batch_window: int = 64,
) -> tuple[list[tuple[int, str, str, int]], DataFrame]:
    """Run ``n_merges`` BPE rounds; returns (merge table rows
    [(rank, left, right, count)], final symbolized word table
    (word, freq, syms) — i.e. the trained tokenizer already applied to
    the training vocabulary).

    If the distinct-word table has at most ``driver_finish_rows`` rows
    (its size is fixed up front — merging never adds or removes words),
    it is collected once and all merges run locally: byte-identical
    result, O(1) Spark jobs instead of one per merge.  Pass 0 to force
    the distributed path.

    The distributed path BATCHES merges (r5 verdict item 5): each round
    collects the top ``batch_window`` pair candidates and applies the
    largest provably-independent prefix (``_safe_merge_batch`` — output
    byte-identical to one-merge-per-round, pinned by the batched-vs-local
    equality test) in a single chained-projection job, cutting the job
    count from O(n_merges) to O(n_merges / batch_size).  Set
    ``batch_window=1`` to force the classic one-merge-per-job loop.
    """
    syms = _init_symbols(word_freq_table(docs, text_col)).localCheckpoint()
    if driver_finish_rows:
        # limit() bounds the probe: we never pull more than threshold+1
        # rows to decide, and the table row count is invariant across
        # merges so one upfront decision is exact.
        probe = syms.select("word").limit(driver_finish_rows + 1).count()
        if probe <= driver_finish_rows:
            table = [
                (r["word"], int(r["freq"]), list(r["syms"]))
                for r in syms.collect()
            ]
            merges = _local_train(table, n_merges, start_rank=0)
            out = spark.createDataFrame(
                table, "word string, freq long, syms array<string>"
            )
            return merges, out
    # exact driver-side symbol alphabet: initial distinct characters
    # (one tiny job — charset-sized) + every fused string created below
    alphabet = {
        r["s"]
        for r in syms.select(
            F.explode("syms").alias("s")
        ).distinct().collect()
    }
    merges: list[tuple[int, str, str, int]] = []
    while len(merges) < n_merges:
        top = (
            _pair_counts(syms)
            .orderBy(F.desc("cnt"), "pair")
            .limit(batch_window)
            .collect()
        )
        if not top:
            break
        cands = [
            (r["pair"]["l"], r["pair"]["r"], int(r["cnt"])) for r in top
        ]
        batch = _safe_merge_batch(
            cands, batch_window, alphabet
        )[: n_merges - len(merges)]
        for left, right, cnt in batch:
            merges.append((len(merges), left, right, cnt))
            alphabet.add(left + right)
            syms = syms.select(
                "word", "freq", _merge_fold(left, right).alias("syms")
            )
        syms = syms.localCheckpoint()
    return merges, syms
