"""Distributed unigram-LM tokenizer training (Kudo 2018, *Subword
Regularization* — the SentencePiece unigram model; public method).

The OTHER major tokenizer family next to BPE (operators/bpe.py): start
from a large seed vocabulary of frequent substrings, fit piece
probabilities with EM over each word's segmentation lattice, prune the
lowest-probability pieces, and tokenize by Viterbi. This module is the
Spark-first shape of that loop:

- **Word-level, not corpus-level.** Everything runs over the DISTINCT
  word table weighted by frequency — the corpus pays ONE
  tokenize+count shuffle ever; at 100 TB the distinct-word table is
  bounded by the language's vocabulary, not the corpus size (the same
  collapse BPE and the unigram/bigram LM operators already ride).
- **Seed selection is relational.** Substring explosion (all pieces of
  length 1..max_len at every position, weighted by word freq) is pure
  JVM ``sequence``/``substring`` expressions + one hash aggregate, so
  the seed vocabulary — and therefore the contract row's top-piece
  column — is SQL-exact and recomputable by the DuckDB oracle.
- **E-step is an Arrow stage with broadcast state.** The piece-prob
  table is tiny (≤ seed size) and broadcasts inside a ``mapInPandas``
  closure; each word runs an O(len × max_len) forward-backward over
  its lattice and emits SNAPPED expected counts + its snapped
  negative-log-likelihood contribution. Per-word work is independent
  (embarrassingly parallel); cross-word aggregation uses exact
  DECIMAL sums of the snapped contributions, so the fit is
  deterministic at any partitioning (the _util determinism rules).
- **M-step/prune on the driver over vocab-sized state** (≤ seed-size
  floats — the k-means/BPE bounded-driver-state class).

EM guarantee carried as a tested invariant: the corpus marginal NLL is
non-increasing across iterations (within the snap tolerance); pruning
keeps every single character so coverage never breaks.
"""

from __future__ import annotations

from typing import Iterable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_SNAP = 9  # decimal places for per-word contributions (determinism)


def word_table(d: DataFrame) -> DataFrame:
    """(word, freq) — lowercase whitespace words, the corpus's one
    shuffle."""
    w = F.explode(F.split(F.lower(F.col("text")), r"\s+")).alias("w")
    return (
        d.select(w)
        .where(F.col("w") != "")
        .groupBy("w")
        .agg(F.count("*").cast("bigint").alias("freq"))
        .select(F.col("w").alias("word"), "freq")
    )


def seed_candidates(words: DataFrame, max_len: int) -> DataFrame:
    """(piece, wfreq): every substring of length 1..max_len at every
    position of every distinct word, weighted by word frequency —
    pure JVM expressions, mirrored exactly by the oracle SQL."""
    ln = F.length("word")
    pos = F.explode(F.sequence(F.lit(1), ln)).alias("i")
    sub = words.select("word", "freq", pos)
    piece_len = F.explode(
        F.sequence(F.lit(1), F.least(F.lit(max_len), ln - F.col("i") + 1))
    ).alias("l")
    return (
        sub.select("word", "freq", "i", piece_len)
        .select(F.substring("word", F.col("i"), F.col("l")).alias("piece"), "freq")
        .groupBy("piece")
        .agg(F.sum("freq").cast("bigint").alias("wfreq"))
    )


def select_seed(cands: DataFrame, seed_size: int) -> list[tuple[str, int]]:
    """Top seed_size candidates by (wfreq desc, piece asc) UNION all
    single characters (coverage guarantee). Returns a vocab-sized
    driver list."""
    top = (
        cands.orderBy(F.col("wfreq").desc(), F.col("piece").asc())
        .limit(seed_size)
        .collect()
    )
    chars = cands.where(F.length("piece") == 1).collect()
    seen: dict[str, int] = {}
    for r in list(top) + list(chars):
        seen.setdefault(r["piece"], int(r["wfreq"]))
    return sorted(seen.items())


def _estep_rows(words_iter: Iterable, probs: dict[str, float], max_len: int):
    """Forward-backward over one word's segmentation lattice; yields
    (piece, snapped expected count × freq) plus a ('', loss) sentinel
    per word. Pure python over the broadcast prob dict — called from
    the mapInPandas closure below."""
    for word, freq in words_iter:
        n = len(word)
        alpha = [0.0] * (n + 1)
        alpha[0] = 1.0
        for i in range(1, n + 1):
            s = 0.0
            for j in range(max(0, i - max_len), i):
                p = probs.get(word[j:i])
                if p:
                    s += alpha[j] * p
            alpha[i] = s
        if alpha[n] <= 0.0:  # uncoverable word (never: chars are kept)
            continue
        beta = [0.0] * (n + 1)
        beta[n] = 1.0
        for i in range(n - 1, -1, -1):
            s = 0.0
            for j in range(i + 1, min(n, i + max_len) + 1):
                p = probs.get(word[i:j])
                if p:
                    s += p * beta[j]
            beta[i] = s
        z = alpha[n]
        for i in range(n):
            for j in range(i + 1, min(n, i + max_len) + 1):
                p = probs.get(word[i:j])
                if p:
                    c = alpha[i] * p * beta[j] / z
                    if c > 0.0:
                        yield word[i:j], round(c * freq, _SNAP)
        import math

        yield "", round(-math.log(z) * freq, _SNAP)


def _estep(words: DataFrame, probs: dict[str, float], max_len: int):
    """One distributed E-step: returns (counts dict piece→expected
    count, corpus NLL) — both from exact DECIMAL sums of the snapped
    per-word contributions."""
    spark = words.sparkSession
    probs_b = spark.sparkContext.broadcast(probs)

    def run(batches):
        import pandas as pd

        pr = probs_b.value
        for pdf in batches:
            rows = list(
                _estep_rows(zip(pdf["word"], pdf["freq"]), pr, max_len)
            )
            if rows:
                yield pd.DataFrame(rows, columns=["piece", "c"])

    contrib = words.mapInPandas(run, "piece string, c double")
    agg = (
        contrib.groupBy("piece")
        .agg(F.sum(F.col("c").cast("decimal(38,12)")).alias("c"))
        .collect()
    )
    counts: dict[str, float] = {}
    loss = 0.0
    for r in agg:
        if r["piece"] == "":
            loss = float(r["c"])
        else:
            counts[r["piece"]] = float(r["c"])
    return counts, loss


def viterbi_stats(words: DataFrame, probs: dict[str, float], max_len: int):
    """(corpus_tokens, corpus_chars, uncovered_words): Viterbi-tokenize
    every distinct word (max product of piece probs; ties → fewer
    pieces, then the DP's deterministic scan order) and weight by
    frequency. ``uncovered_words`` counts DISTINCT words whose lattice
    has no path (best[n] stays -inf) — the full-coverage invariant
    ("every word segments"; single chars are never pruned, so this must
    be 0) is measured here FOR REAL rather than inferred (r8 advice:
    the contract flag was only corpus_tokens > 0)."""
    spark = words.sparkSession
    probs_b = spark.sparkContext.broadcast(probs)

    def run(batches):
        import math

        import pandas as pd

        pr = {k: math.log(v) for k, v in probs_b.value.items() if v > 0}
        for pdf in batches:
            toks = 0
            chars = 0
            uncovered = 0
            for word, freq in zip(pdf["word"], pdf["freq"]):
                n = len(word)
                best = [(-float("inf"), 0)] * (n + 1)
                best[0] = (0.0, 0)
                for i in range(1, n + 1):
                    for j in range(max(0, i - max_len), i):
                        lp = pr.get(word[j:i])
                        if lp is not None and best[j][0] > -float("inf"):
                            cand = (best[j][0] + lp, best[j][1] + 1)
                            # maximize score; tie → fewer pieces
                            if cand[0] > best[i][0] or (
                                cand[0] == best[i][0] and cand[1] < best[i][1]
                            ):
                                best[i] = cand
                if n > 0 and best[n][0] == -float("inf"):
                    uncovered += 1
                toks += best[n][1] * int(freq)
                chars += n * int(freq)
            yield pd.DataFrame(
                [(toks, chars, uncovered)], columns=["toks", "chars", "unc"]
            )

    out = (
        words.mapInPandas(run, "toks long, chars long, unc long")
        .agg(F.sum("toks").alias("t"), F.sum("chars").alias("c"), F.sum("unc").alias("u"))
        .collect()[0]
    )
    return int(out["t"]), int(out["c"]), int(out["u"])


def word_table_by_lang(d: DataFrame) -> DataFrame:
    """(lang, word, freq) — the keyed variant of :func:`word_table`
    for per-lang encode rollups."""
    w = F.explode(F.split(F.lower(F.col("text")), r"\s+")).alias("w")
    return (
        d.select("lang", w)
        .where(F.col("w") != "")
        .groupBy("lang", "w")
        .agg(F.count("*").cast("bigint").alias("freq"))
        .select("lang", F.col("w").alias("word"), "freq")
    )


def viterbi_stats_by_lang(words: DataFrame, probs: dict[str, float], max_len: int) -> DataFrame:
    """(lang, toks, chars, occurrences): Viterbi-tokenize per distinct
    (lang, word), weighted by frequency — one Arrow stage + one tiny
    per-lang aggregate."""
    spark = words.sparkSession
    probs_b = spark.sparkContext.broadcast(probs)

    def run(batches):
        import math

        import pandas as pd

        pr = {k: math.log(v) for k, v in probs_b.value.items() if v > 0}
        for pdf in batches:
            acc: dict[str, list[int]] = {}
            for lang, word, freq in zip(pdf["lang"], pdf["word"], pdf["freq"]):
                n = len(word)
                best = [(-float("inf"), 0)] * (n + 1)
                best[0] = (0.0, 0)
                for i in range(1, n + 1):
                    for j in range(max(0, i - max_len), i):
                        lp = pr.get(word[j:i])
                        if lp is not None and best[j][0] > -float("inf"):
                            cand = (best[j][0] + lp, best[j][1] + 1)
                            if cand[0] > best[i][0] or (
                                cand[0] == best[i][0] and cand[1] < best[i][1]
                            ):
                                best[i] = cand
                a = acc.setdefault(lang, [0, 0, 0])
                a[0] += best[n][1] * int(freq)
                a[1] += n * int(freq)
                a[2] += int(freq)
            if acc:
                yield pd.DataFrame(
                    [(lg, v[0], v[1], v[2]) for lg, v in acc.items()],
                    columns=["lang", "toks", "chars", "occ"],
                )

    return (
        words.mapInPandas(run, "lang string, toks long, chars long, occ long")
        .groupBy("lang")
        .agg(
            F.sum("toks").cast("bigint").alias("toks"),
            F.sum("chars").cast("bigint").alias("chars"),
            F.sum("occ").cast("bigint").alias("occ"),
        )
    )


def train_unigram(
    spark: SparkSession,
    d: DataFrame,
    seed_size: int = 96,
    max_len: int = 4,
    iters: int = 2,
    prune_to: int = 64,
):
    """Full training loop. Returns (probs, stats) where probs is the
    final piece→probability dict (vocab-bounded driver state) and
    stats carries the contract-row facts: seed list head, loss
    trajectory, coverage and size invariants."""
    words = word_table(d).persist()
    cands = seed_candidates(words, max_len)
    seed = select_seed(cands, seed_size)
    total_w = sum(f for _, f in seed)
    probs = {p: f / total_w for p, f in seed}

    losses: list[float] = []
    for _ in range(iters):
        counts, loss = _estep(words, probs, max_len)
        losses.append(loss)
        total = sum(counts.values())
        if total <= 0:
            break
        # keep every single char (coverage floor) even at zero count
        probs = {
            p: (counts.get(p, 0.0) / total)
            if (len(p) > 1 or counts.get(p, 0.0) > 0)
            else 1e-12
            for p in probs
        }
        # renormalize after the char floor
        z = sum(probs.values())
        probs = {p: v / z for p, v in probs.items()}

    # prune: keep all single chars + the top multi-char pieces by prob
    chars = {p: v for p, v in probs.items() if len(p) == 1}
    multis = sorted(
        ((p, v) for p, v in probs.items() if len(p) > 1),
        key=lambda kv: (-kv[1], kv[0]),
    )
    keep = dict(multis[: max(0, prune_to - len(chars))])
    keep.update(chars)
    z = sum(keep.values())
    probs = {p: v / z for p, v in keep.items()}

    # one post-prune EM pass: refit + final loss (EM: non-increasing
    # from its own previous iterate; the pre/post-prune comparison is
    # NOT monotone, so the invariant tracks within-phase trajectories)
    counts, loss_post = _estep(words, probs, max_len)
    total = sum(counts.values())
    if total > 0:
        probs = {p: max(counts.get(p, 0.0) / total, 1e-12 if len(p) == 1 else 0.0) for p in probs}
        probs = {p: v for p, v in probs.items() if v > 0}
        z = sum(probs.values())
        probs = {p: v / z for p, v in probs.items()}
    _, loss_final = _estep(words, probs, max_len)

    toks, chars_n, uncovered = viterbi_stats(words, probs, max_len)
    n_words = words.count()
    # total word OCCURRENCES = sum of the grouped freqs — the same
    # number as count(explode(split(...)) != '') over the corpus, read
    # off the persisted word table instead of a second corpus pass
    wocc = int(words.agg(F.sum("freq").alias("s")).collect()[0]["s"] or 0)
    words.unpersist()
    stats = {
        "seed": seed,
        "losses": losses,
        "loss_post_prune": loss_post,
        "loss_final": loss_final,
        "corpus_tokens": toks,
        "corpus_chars": chars_n,
        "uncovered_words": uncovered,
        "n_words": n_words,
        "word_occurrences": wocc,
        "vocab_final": len(probs),
    }
    return probs, stats
