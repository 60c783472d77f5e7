"""Distributed BPE training (operators/bpe.py) vs an independent
single-node reference implementation of the same algorithm (Sennrich
et al. 2016) — merge-for-merge equivalence, plus the structural
invariants the q_llm_bpe_train contract pins."""

from __future__ import annotations

from collections import Counter

from cheetah_spark.operators.bpe import train_bpe, word_freq_table


def _reference_bpe(word_freqs: dict[str, int], n_merges: int):
    """Textbook in-memory BPE with the identical total order
    (freq desc, then pair lexicographic)."""
    words = {w: list(w) for w in word_freqs}
    merges = []
    for rank in range(1, n_merges + 1):
        counts: Counter = Counter()
        for w, syms in words.items():
            f = word_freqs[w]
            for a, b in zip(syms, syms[1:]):
                counts[(a, b)] += f
        if not counts:
            break
        (left, right), freq = min(
            counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        merges.append((rank, left, right, freq))
        for w, syms in words.items():
            res, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == left and syms[i + 1] == right:
                    res.append(left + right)
                    i += 2
                else:
                    res.append(syms[i])
                    i += 1
            words[w] = res
    return merges, words


def test_bpe_matches_reference_implementation(spark, sf_dir):
    from cheetah_spark.catalog import load_table

    docs = load_table(spark, sf_dir, "documents").limit(120)
    wf = {r.word: r.freq for r in word_freq_table(docs).collect()}
    expected, ref_words = _reference_bpe(wf, 8)

    merges, final_words, initial = train_bpe(spark, docs, 8)
    assert merges == expected, f"\nspark: {merges}\nref:   {expected}"
    assert initial == sum(len(w) * f for w, f in wf.items())

    got = {"".join(r.symbols): None for r in final_words.collect()}
    # every final segmentation reassembles its word, and the symbol
    # multiset matches the reference's final segmentation per word
    ref_final = {"".join(s): s for s in ref_words.values()}
    spark_final = {tuple(r.symbols) for r in final_words.collect()}
    assert spark_final == {tuple(s) for s in ref_words.values()}
    assert set(got) == set(ref_final)


def test_bpe_overlapping_pairs_merge_left_to_right(spark):
    """'aaaa' under merge (a,a) → [aa, aa], not three overlapping
    merges — the sequential-scan semantics both implementations use."""
    docs = spark.createDataFrame([("aaaa bb",)], "text string")
    merges, final_words, _ = train_bpe(spark, docs, 1)
    assert merges[0][1:3] == ("a", "a")
    segs = {tuple(r.symbols) for r in final_words.collect()}
    assert ("aa", "aa") in segs
    assert ("b", "b") in segs


def test_bpe_encode_matches_reference(spark, sf_dir):
    """encode_docs applies the trained merges exactly as the reference
    implementation does — per-word token sequences identical, and the
    q_llm_bpe_encode accounting (chars / first-merge tokens / full
    tokens / roundtrip) is consistent with them."""
    from pyspark.sql import functions as F

    from cheetah_spark.catalog import load_table
    from cheetah_spark.operators.bpe import encode_docs, encode_expr, train_bpe

    d = load_table(spark, sf_dir, "documents").limit(60)
    merges, _fw, _init = train_bpe(spark, d, 6)

    # reference encode of every distinct word in the sample
    rows = d.select(
        F.explode(F.filter(F.split(F.lower("text"), r"\s+"), lambda w: w != F.lit(""))).alias("w")
    ).distinct().collect()
    wf = {r.w: 1 for r in rows}
    _ref_merges, ref_words = _reference_bpe_apply(wf, merges)

    got = {
        r.w: tuple(r.toks)
        for r in spark.createDataFrame([(w,) for w in wf], "w string")
        .select("w", encode_expr(F.col("w"), merges).alias("toks"))
        .collect()
    }
    assert got == {w: tuple(s) for w, s in ref_words.items()}

    enc = encode_docs(d, merges).collect()
    for r in enc:
        assert r.roundtrip_ok
        assert r.n_tokens <= r.n_tokens_first <= r.n_chars


def _reference_bpe_apply(word_freqs, merges):
    """Apply a GIVEN merge list (rank order) with the reference's
    left-to-right non-overlapping scan."""
    words = {w: list(w) for w in word_freqs}
    for _rank, left, right, _freq in merges:
        for w, syms in words.items():
            res, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == left and syms[i + 1] == right:
                    res.append(left + right)
                    i += 2
                else:
                    res.append(syms[i])
                    i += 1
            words[w] = res
    return merges, words


def _ref_unigram_estep(word_freqs, probs, max_len):
    """Independent single-process forward-backward reference for the
    unigram E-step (snapped the same way)."""
    import math

    counts, loss = {}, 0.0
    for word, freq in word_freqs.items():
        n = len(word)
        alpha = [0.0] * (n + 1)
        alpha[0] = 1.0
        for i in range(1, n + 1):
            alpha[i] = sum(
                alpha[j] * probs.get(word[j:i], 0.0)
                for j in range(max(0, i - max_len), i)
            )
        if alpha[n] <= 0:
            continue
        beta = [0.0] * (n + 1)
        beta[n] = 1.0
        for i in range(n - 1, -1, -1):
            beta[i] = sum(
                probs.get(word[i:j], 0.0) * beta[j]
                for j in range(i + 1, min(n, i + max_len) + 1)
            )
        for i in range(n):
            for j in range(i + 1, min(n, i + max_len) + 1):
                p = probs.get(word[i:j], 0.0)
                if p:
                    c = alpha[i] * p * beta[j] / alpha[n]
                    if c > 0:
                        counts[word[i:j]] = counts.get(word[i:j], 0.0) + round(
                            c * freq, 9
                        )
        loss += round(-math.log(alpha[n]) * freq, 9)
    return counts, loss


def test_unigram_estep_matches_reference(spark):
    """The distributed Arrow E-step equals the single-process
    forward-backward on the same word table and prob dict."""
    from cheetah_spark.operators.unigram import _estep, word_table

    d = spark.createDataFrame(
        [("the cat sat on the mat",), ("the cat ran",), ("a mat",)],
        "text string",
    )
    words = word_table(d)
    wf = {r["word"]: r["freq"] for r in words.collect()}
    probs = {}
    for w in wf:
        for i in range(len(w)):
            for l in (1, 2):
                if i + l <= len(w):
                    probs[w[i : i + l]] = 1.0
    z = sum(probs.values())
    probs = {k: v / z for k, v in probs.items()}
    got_counts, got_loss = _estep(words, probs, 2)
    ref_counts, ref_loss = _ref_unigram_estep(wf, probs, 2)
    assert abs(got_loss - ref_loss) < 1e-6
    assert set(got_counts) == set(ref_counts)
    for k in ref_counts:
        assert abs(got_counts[k] - ref_counts[k]) < 1e-6, k


def test_unigram_training_invariants(spark):
    """EM loss non-increasing, full coverage, frequent bigram learned,
    deterministic across reruns."""
    from cheetah_spark.operators.unigram import train_unigram, viterbi_stats, word_table

    d = spark.createDataFrame(
        [("ababab ababab abab",), ("ababab cd",), ("abab cd cd",)],
        "text string",
    )
    probs1, st1 = train_unigram(spark, d, seed_size=24, max_len=3, iters=2, prune_to=16)
    probs2, st2 = train_unigram(spark, d, seed_size=24, max_len=3, iters=2, prune_to=16)
    assert probs1 == probs2 and st1["corpus_tokens"] == st2["corpus_tokens"]
    losses = st1["losses"]
    assert all(a >= b - 1e-6 for a, b in zip(losses, losses[1:]))
    assert st1["loss_post_prune"] >= st1["loss_final"] - 1e-6
    # the dominant repeated bigram must survive pruning with real mass
    assert "ab" in probs1 and probs1["ab"] > probs1.get("cd", 0) / 10
    # compression: Viterbi tokens strictly fewer than characters
    assert 0 < st1["corpus_tokens"] < st1["corpus_chars"]
    # coverage measured for real: zero lattice-unreachable words on the
    # training corpus (r8 advice), and an unseen-at-training word of
    # seen chars still segments
    assert st1["uncovered_words"] == 0
    extra = spark.createDataFrame([("ba dc",)], "text string")
    toks, chars, uncovered = viterbi_stats(word_table(extra), probs1, 3)
    assert toks > 0 and uncovered == 0
    # a word with a NEVER-seen character has no lattice path and must
    # be counted uncovered, not silently contribute zero tokens
    alien = spark.createDataFrame([("zzz",)], "text string")
    _, _, unc_alien = viterbi_stats(word_table(alien), probs1, 3)
    assert unc_alien == 1


def test_unigram_encode_by_lang_consistent_with_global(spark):
    """Per-lang Viterbi totals must sum to the unkeyed totals on a
    shared-word-free corpus, and the keyed stats carry exact
    occurrence counts."""
    from cheetah_spark.operators.unigram import (
        train_unigram,
        viterbi_stats,
        viterbi_stats_by_lang,
        word_table,
        word_table_by_lang,
    )

    d = spark.createDataFrame(
        [("aaa bbb aaa", "en"), ("ccc ddd", "fr"), ("aaa", "en")],
        "text string, lang string",
    )
    probs, _ = train_unigram(spark, d, seed_size=16, max_len=3, iters=1, prune_to=12)
    toks, chars, _ = viterbi_stats(word_table(d), probs, 3)
    rows = {r.lang: r for r in viterbi_stats_by_lang(word_table_by_lang(d), probs, 3).collect()}
    assert sum(r.toks for r in rows.values()) == toks
    assert sum(r.chars for r in rows.values()) == chars
    assert rows["en"].occ == 4 and rows["fr"].occ == 2
