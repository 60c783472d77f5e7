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
