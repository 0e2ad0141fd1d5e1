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

    Safety argument.  Merging (l, r) -> lr changes pair counts in exactly
    three ways (absent alphabet collisions): (x, l) and (r, y) DECREASE
    (their middle symbol gets fused away), (l, r) itself goes to zero, and
    new pairs (x, lr) / (lr, y) appear with counts bounded by the ORIGINAL
    counts of (x, l) / (r, y).  Every other pair — including pairs sharing
    a left-left or right-right symbol — is untouched.  Hence each clause:

    1. **No-skip prefix.**  A *skipped* candidate keeps a sort key better
       than later prefix members and its count need not drop after the
       earlier merges — sequential could pick it first.
    2. **No positional interaction inside the prefix**: accept p_j only if
       r_j is no earlier accepted LEFT and l_j is no earlier accepted
       RIGHT — then p_j's own count is exactly what sequential sees.
       (Sharing lefts with lefts or rights with rights is fine.)
    3. **Fused strings stay out of the symbol alphabet** (and distinct
       from each other).  If the fused symbol already existed, an old
       pair containing it could GAIN occurrences and overtake the prefix.
       The alphabet is tracked exactly driver-side: initial distinct
       characters + every fused string ever created.
    4. **A self-pair (l == r) ends the batch.**  Merging (d, d) over a
       run "d d d" creates (dd, d) whose occurrences consume the merged
       pair ITSELF — its count is bounded only by cnt(p_i), which no
       later candidate can strictly beat, so nothing may follow a
       self-pair (found by the hypothesis property sweep: corpus
       {"aa", "ddd"x2} diverged under the earlier rule).
    5. **Strict count gap to every conflict.**  All other new-pair
       counts are bounded by C* = max original count over non-accepted
       candidates of the decreasing forms (x, accepted-left) /
       (accepted-right, y); when the collected window may be incomplete,
       unseen pairs are bounded by the window's last count, folded into
       C*.  Requiring cnt(last accepted) > C* makes every new pair a
       STRICT loser at every intermediate sequential step — no tie-break
       ambiguity.  (Decreased pairs can't overtake either; untouched
       pairs keep their original, worse sort key.)

    The chained per-batch projection applies the accepted merges in rank
    order, so within-word application is literally sequential — only the
    *selection* order needs the proof above.
    """
    if not cands:
        return []
    # the first candidate alone IS the sequential step — always safe,
    # even when its fused string collides with an existing symbol; but
    # in that collision case pairs containing the pre-existing symbol
    # can GAIN occurrences (clause-4's bound assumes counts never grow),
    # so no further batching on top of it
    if cands[0][0] + cands[0][1] in alphabet:
        return cands[:1]

    def shrink(accepted: list[tuple[str, str, int]], rest):
        """Clause 4: drop tail members until the last accepted count is
        strictly above every conflict bound (recomputed after each drop,
        since dropping shrinks the conflict set)."""
        while len(accepted) > 1:
            lefts = {a[0] for a in accepted}
            rights = {a[1] for a in accepted}
            c_star = 0
            for left, right, cnt in rest:
                if right in lefts or left in rights:
                    c_star = max(c_star, cnt)
            if len(cands) >= window:    # truncated: unseen tail bound
                c_star = max(c_star, cands[-1][2])
            if accepted[-1][2] > c_star:
                break
            rest = [accepted.pop()] + rest
        return accepted

    accepted = [cands[0]]
    lefts = {cands[0][0]}
    rights = {cands[0][1]}
    fused_seen = {cands[0][0] + cands[0][1]}
    stop = len(cands)
    if cands[0][0] == cands[0][1]:        # clause 4: self-pair ends batch
        return cands[:1]
    for i, (left, right, cnt) in enumerate(cands[1:], start=1):
        fused = left + right
        if (
            right in lefts or left in rights      # clause 2
            or fused in alphabet or fused in fused_seen   # clause 3
        ):
            stop = i
            break
        accepted.append((left, right, cnt))
        lefts.add(left)
        rights.add(right)
        fused_seen.add(fused)
        if left == right:                 # clause 4: self-pair ends batch
            stop = i + 1
            break
    return shrink(accepted, list(cands[stop:]))


def train_bpe(
    spark: SparkSession, docs: DataFrame | None, n_merges: int = 10,
    text_col: str = "text",
    driver_finish_rows: int = 100_000,
    batch_window: int = 64,
    words: DataFrame | None = None,
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

    ``words``: optional pre-built (word, freq) table that REPLACES the
    corpus scan — the hook for training on a curated/bounded vocabulary
    (e.g. the hash-oracled fixed-vocab twin) while exercising the exact
    same merge machinery; ``docs`` is ignored (may be None) when given.
    """
    wf = words if words is not None else word_freq_table(docs, text_col)
    syms = _init_symbols(wf).localCheckpoint()
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


def apply_bpe(
    words: DataFrame, merges: list[tuple[int, str, str, int]],
    word_col: str = "word", ckpt_every: int = 6,
) -> DataFrame:
    """Tokenize a distinct-word relation by replaying a trained merge
    table: the APPLY half of the BPE workflow (the trainer's final symbol
    table covers only the training vocabulary; this runs the same greedy
    left-to-right non-overlapping ``_merge_fold`` over ANY word set, in
    merge-rank order — exactly what a tokenizer does at inference).
    Returns (word, syms). Registered query ``bpe_tokenize_fertility_fixed``
    hash-checks this path against a DuckDB recursive-CTE replay.

    Scale shape: pure chained Catalyst projections over the distinct-word
    relation — no shuffle, no UDF, no driver data. ``ckpt_every`` bounds
    expression-tree growth: CollapseProject would otherwise inline all
    n_merges folds into one expression and blow janino's 64 KB method
    limit into silent interpreted fallback (SCALE.md); a localCheckpoint
    every few merges keeps each compiled stage small. For production-size
    merge tables (32k+), batch the independent prefixes exactly as the
    trainer does (_safe_merge_batch)."""
    df = words.select(
        F.col(word_col).alias("word"), F.split(word_col, "").alias("syms")
    )
    for i, (rank, left, right, _cnt) in enumerate(sorted(merges)):
        df = df.select("word", _merge_fold(left, right).alias("syms"))
        if (i + 1) % ckpt_every == 0:
            df = df.localCheckpoint(eager=True)
    return df
