"""Text-analysis column expressions for the training-data pipeline.

Everything here is a pure Column expression (JVM-side, whole-stage
codegen) — no Python executes per row. The reference's only text
operation is byte-level line splitting (reference x/scanner/scanner.go:90-105)
and JSON/XML normalization (reference types.go:163-167,
x/windows/windows_event.go:57-139); the tokenize / shingle / hash /
quality surface below is the LLM-data-pipeline extension the north star
requires, designed so every helper has an exact DuckDB SQL counterpart
(used by the oracle gate).

Cross-engine determinism: the only hash function both engines share
bit-for-bit is MD5, so every hash here is a 56-bit integer derived from
an MD5 hex prefix (:func:`hash56`) — deterministic across engines,
partitionings, and cluster sizes. 56 bits keeps the value inside a
signed 64-bit long (no overflow in either engine).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# BPE-ish pretokenizer: letter runs, digit runs, single non-space symbol.
# Same regex runs in DuckDB's regexp_extract_all (RE2) and Spark (Java
# util.regex) — only constructs valid in both are used.
TOKEN_RE = "[a-z]+|[0-9]+|[^a-z0-9\\s]"
# Plain word tokens (letters/digits runs) — the default for shingling.
WORD_RE = "[a-z0-9]+"


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def norm_text(col: Column | str) -> Column:
    """Canonical form for fingerprinting: lowercase, collapse whitespace."""
    return F.trim(F.regexp_replace(F.lower(_c(col)), "\\s+", " "))


def tokens(col: Column | str, pattern: str = WORD_RE) -> Column:
    """Lowercased token array via regexp scan (array<string>)."""
    return F.regexp_extract_all(F.lower(_c(col)), F.lit(pattern), 0)


def oracle_tokens(expr: str, pattern: str = WORD_RE) -> str:
    return f"regexp_extract_all(lower({expr}), '{pattern}')"


def shingles(toks: Column, k: int = 3) -> Column:
    """Word k-gram shingles of a token array (array<string>).

    Guarded so docs shorter than k yield an empty array (Spark's
    ``sequence(1, n)`` would otherwise count *down* for n < 1).
    """
    n = F.size(toks)
    return F.when(n < k, F.array().cast("array<string>")).otherwise(
        F.transform(
            F.sequence(F.lit(1), n - (k - 1)),
            lambda i: F.array_join(F.slice(toks, i, k), " "),
        )
    )


def oracle_shingles(toks_expr: str, k: int = 3) -> str:
    # COALESCE guard: generate_series(1, 0) is [] but (1, <0) is NULL in
    # DuckDB — texts with fewer than k tokens must yield [] to match
    # Spark (caught by tests/test_text_fuzz.py).
    return (
        f"coalesce(list_transform(generate_series(1, len({toks_expr}) - {k - 1}), "
        f"i -> array_to_string(({toks_expr})[i:i+{k - 1}], ' ')), []::VARCHAR[])"
    )


def hash56(col: Column, seed: Column | int | None = None) -> Column:
    """Deterministic 56-bit hash shared bit-for-bit with DuckDB.

    ``bigint(md5(seed || ':' || s)[:14 hex])`` — MD5 is the one hash both
    engines implement identically; 14 hex chars = 56 bits < 2^63.
    """
    s = _c(col)
    if seed is not None:
        seedc = F.lit(seed) if isinstance(seed, int) else seed
        s = F.concat(seedc.cast("string"), F.lit(":"), s)
    return F.conv(F.substring(F.md5(s), 1, 14), 16, 10).cast("bigint")


def oracle_hash56(expr: str, seed: str | int | None = None) -> str:
    s = expr if seed is None else f"CAST({seed} AS VARCHAR) || ':' || ({expr})"
    return f"CAST('0x' || substr(md5({s}), 1, 14) AS BIGINT)"


# MinHash permutation family: h_i(x) = (A[i] * h31(x) + B[i]) mod P over
# a 31-bit md5-derived base hash — ONE md5 per shingle total, then cheap
# integer ops per permutation. A[i]*h31 < 2^31 * 2^31 = 2^62, so no
# signed-64 overflow in either engine. Constants come from a fixed seed
# so Spark and the DuckDB oracle embed identical literals.
MINHASH_P = 2147483659  # prime > 2^31
_MINHASH_MOD = 1 << 31


def minhash_params(num_hashes: int = 32) -> list[tuple[int, int]]:
    import random

    rng = random.Random(42)
    return [
        (rng.randrange(1, _MINHASH_MOD), rng.randrange(0, _MINHASH_MOD))
        for _ in range(num_hashes)
    ]


def minhash_base(col: Column) -> Column:
    """31-bit base hash of a shingle (one md5, shared with DuckDB)."""
    return hash56(col) % _MINHASH_MOD


def oracle_minhash_base(expr: str) -> str:
    return f"({oracle_hash56(expr)} % {_MINHASH_MOD})"


def minhash_perm(h31: Column, a: int, b: int) -> Column:
    return (F.lit(a).cast("bigint") * h31 + F.lit(b)) % F.lit(MINHASH_P)


def oracle_minhash_perm(h31_expr: str, a: int, b: int) -> str:
    return f"(({a}::BIGINT * {h31_expr} + {b}) % {MINHASH_P})"


# SimHash (Charikar) over the distinct token set: each token votes
# +1/-1 per bit position of its hash56; the fingerprint sets bits with
# positive tally. Computed as explode → 56 partial-agg SUMs → bit
# reassembly: one md5 per distinct token TOTAL, map-side combine, one
# doc_id shuffle. (A nested higher-order-function formulation recomputes
# the token hashes once per bit — 56× the md5 work — and was the top
# bench hotspot before this shape.)

SIMHASH_BITS = 56  # md5-prefix hash width; keeps values in signed 64-bit


def simhash_tally_aggs(h: str = "h", bits: int = SIMHASH_BITS) -> list[Column]:
    """One SUM aggregate per bit over exploded (doc, token-hash) rows."""
    return [
        F.sum(
            F.when(F.shiftright(F.col(h), b).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"sh_t{b}")
        for b in range(bits)
    ]


def simhash_from_tallies(bits: int = SIMHASH_BITS) -> Column:
    """Reassemble the fingerprint long from the per-bit tally columns."""
    expr: Column | None = None
    for b in range(bits):
        term = F.when(F.col(f"sh_t{b}") > 0, F.lit(1 << b).cast("bigint")).otherwise(
            F.lit(0).cast("bigint")
        )
        expr = term if expr is None else expr + term
    assert expr is not None
    return expr


def simhash_df(docs, text_col: str = "text", id_col: str = "doc_id", bits: int = SIMHASH_BITS):
    """(id, simh) DataFrame via the explode + tally-agg plan."""
    ex = docs.select(
        id_col, F.explode(F.array_distinct(tokens(F.col(text_col)))).alias("t")
    ).select(id_col, hash56(F.col("t")).alias("h"))
    return (
        ex.groupBy(id_col)
        .agg(*simhash_tally_aggs("h", bits))
        .select(id_col, simhash_from_tallies(bits).alias("simh"))
    )


def oracle_simhash_per_doc(bits: int = SIMHASH_BITS, table: str = "documents") -> str:
    """DuckDB mirror of :func:`simhash_df`: SELECT doc_id, simh."""
    h = oracle_hash56("t")
    terms = " + ".join(
        f"(CASE WHEN SUM(CASE WHEN (h >> {b}) & 1 = 1 THEN 1 ELSE -1 END) > 0"
        f" THEN (1::BIGINT << {b}) ELSE 0::BIGINT END)"
        for b in range(bits)
    )
    return f"""SELECT doc_id, {terms} AS simh
        FROM (SELECT doc_id, {h} AS h
              FROM (SELECT doc_id, unnest(list_distinct({oracle_tokens("text")})) AS t
                    FROM {table}))
        GROUP BY doc_id"""


def hamming56(a: Column, b: Column) -> Column:
    """Hamming distance between two 56-bit fingerprints (bit_count of XOR)."""
    return F.bit_count(a.bitwiseXOR(b))


# Wide (128-bit) SimHash: the production-scale variant of the 56-bit
# fingerprint above. MD5 is 128 bits — exactly one md5 per distinct
# token still supplies every bit. The fingerprint is REPRESENTED as
# its 4 pigeonhole blocks of 32 bits (each a small bigint), because
# that is the only shape the blocking join ever needs and it avoids
# any 128-bit integer type neither engine has. Bit g of a token's
# hash comes from the three md5-prefix longs: h0 = hex[1:14]
# (56 bits), h1 = hex[15:28] (56 bits), h2 = hex[29:32] (16 bits).

SIMHASH_WIDE_BITS = 128
SIMHASH_WIDE_BLOCKS = 4  # k+1 for the hamming-3 pigeonhole
SIMHASH_WIDE_BLOCK_BITS = SIMHASH_WIDE_BITS // SIMHASH_WIDE_BLOCKS  # 32


def _wide_hash_cols(t: Column) -> list[Column]:
    m = F.md5(t)
    return [
        F.conv(F.substring(m, 1, 14), 16, 10).cast("bigint").alias("wh0"),
        F.conv(F.substring(m, 15, 14), 16, 10).cast("bigint").alias("wh1"),
        F.conv(F.substring(m, 29, 4), 16, 10).cast("bigint").alias("wh2"),
    ]


def _wide_bit(g: int) -> Column:
    """Bit g (0..127) of the per-token 128-bit md5 hash."""
    if g < 56:
        return F.shiftright(F.col("wh0"), g).bitwiseAND(F.lit(1))
    if g < 112:
        return F.shiftright(F.col("wh1"), g - 56).bitwiseAND(F.lit(1))
    return F.shiftright(F.col("wh2"), g - 112).bitwiseAND(F.lit(1))


def simhash_wide_df(docs, text_col: str = "text", id_col: str = "doc_id"):
    """(id, blk0..blk3) 128-bit fingerprint via explode + 128 tally aggs.

    Same plan shape as :func:`simhash_df` (one md5 per distinct token,
    map-side partial aggregation, one id shuffle) — just 128 SUM
    columns instead of 56, reassembled directly into the four 32-bit
    block values.
    """
    ex = docs.select(
        id_col, F.explode(F.array_distinct(tokens(F.col(text_col)))).alias("t")
    ).select(id_col, *_wide_hash_cols(F.col("t")))
    tallies = [
        F.sum(F.when(_wide_bit(g) == 1, 1).otherwise(-1)).alias(f"wt{g}")
        for g in range(SIMHASH_WIDE_BITS)
    ]
    agg = ex.groupBy(id_col).agg(*tallies)
    blks: list[Column] = []
    for b in range(SIMHASH_WIDE_BLOCKS):
        expr: Column | None = None
        for j in range(SIMHASH_WIDE_BLOCK_BITS):
            g = b * SIMHASH_WIDE_BLOCK_BITS + j
            term = F.when(
                F.col(f"wt{g}") > 0, F.lit(1 << j).cast("bigint")
            ).otherwise(F.lit(0).cast("bigint"))
            expr = term if expr is None else expr + term
        assert expr is not None
        blks.append(expr.alias(f"blk{b}"))
    return agg.select(id_col, *blks)


def oracle_simhash_wide_per_doc(table: str = "documents") -> str:
    """DuckDB mirror of :func:`simhash_wide_df`: doc_id, blk0..blk3.

    Relational formulation — unnest (block, bit) indices and GROUP BY
    instead of 128 literal aggregate terms; bit-identical to the Spark
    tally columns because both reduce to the same per-bit ±1 SUM.
    """
    bb = SIMHASH_WIDE_BLOCK_BITS
    return f"""SELECT doc_id,
               MAX(CASE WHEN b = 0 THEN bval END) AS blk0,
               MAX(CASE WHEN b = 1 THEN bval END) AS blk1,
               MAX(CASE WHEN b = 2 THEN bval END) AS blk2,
               MAX(CASE WHEN b = 3 THEN bval END) AS blk3
        FROM (
          SELECT doc_id, b,
                 SUM(CASE WHEN tly > 0 THEN (1::BIGINT << j) ELSE 0::BIGINT END) AS bval
          FROM (
            SELECT doc_id, b, j,
                   SUM(CASE WHEN (CASE WHEN b*{bb}+j < 56 THEN (wh0 >> (b*{bb}+j)) & 1
                                  WHEN b*{bb}+j < 112 THEN (wh1 >> (b*{bb}+j-56)) & 1
                                  ELSE (wh2 >> (b*{bb}+j-112)) & 1 END) = 1
                       THEN 1 ELSE -1 END) AS tly
            FROM (
              SELECT doc_id,
                     CAST('0x' || substr(m, 1, 14) AS BIGINT) AS wh0,
                     CAST('0x' || substr(m, 15, 14) AS BIGINT) AS wh1,
                     CAST('0x' || substr(m, 29, 4) AS BIGINT) AS wh2
              FROM (SELECT doc_id, md5(t) AS m
                    FROM (SELECT doc_id, unnest(list_distinct({oracle_tokens("text")})) AS t
                          FROM {table}))
            ),
            (SELECT unnest(generate_series(0, {SIMHASH_WIDE_BLOCKS - 1})) AS b),
            (SELECT unnest(generate_series(0, {bb - 1})) AS j)
            GROUP BY doc_id, b, j
          ) GROUP BY doc_id, b
        ) GROUP BY doc_id"""


def hamming_wide(a_blks: list[Column], b_blks: list[Column]) -> Column:
    """Hamming distance between two block-decomposed 128-bit fingerprints."""
    expr: Column | None = None
    for a, b in zip(a_blks, b_blks):
        term = F.bit_count(a.bitwiseXOR(b))
        expr = term if expr is None else expr + term
    assert expr is not None
    return expr


STOPWORDS = {
    "en": ("the", "a", "and", "of", "to", "in", "is", "it", "for", "on"),
    "de": ("der", "die", "das", "und", "ist", "von", "zu", "mit", "den", "ein"),
    "fr": ("le", "la", "les", "et", "est", "de", "un", "une", "pour", "dans"),
    "es": ("el", "la", "los", "y", "es", "de", "un", "una", "para", "en"),
    "zh": ("de", "shi", "zai", "he", "le", "wo", "ni", "ta", "men", "zhe"),
}


def stopword_overlap(toks: Column, lang: str) -> Column:
    """Count of tokens that are stopwords of ``lang`` (with multiplicity)."""
    sw = F.array(*[F.lit(w) for w in STOPWORDS[lang]])
    return F.size(F.filter(toks, lambda t: F.array_contains(sw, t)))


def oracle_stopword_overlap(toks_expr: str, lang: str) -> str:
    lst = ", ".join(f"'{w}'" for w in STOPWORDS[lang])
    return f"len(list_filter({toks_expr}, t -> list_contains([{lst}], t)))"


def quality_features(text_col: Column | str) -> dict[str, Column]:
    """Quality-scoring feature set (all exact-integer or exact-ratio).

    Ratios are single IEEE divisions of identical integer operands in
    both engines → bit-identical, no rounding needed.
    """
    t = _c(text_col)
    toks = tokens(t)
    n_char = F.length(t)
    n_tok = F.size(toks)
    return {
        "n_char": n_char.cast("bigint"),
        "n_tok": n_tok.cast("bigint"),
        "n_uniq_tok": F.size(F.array_distinct(toks)).cast("bigint"),
        "mean_tok_len": F.aggregate(toks, F.lit(0).cast("bigint"), lambda a, x: a + F.length(x))
        / F.greatest(n_tok, F.lit(1)),
        "digit_ratio": F.length(F.regexp_replace(t, "[^0-9]", "")) / F.greatest(n_char, F.lit(1)),
        "punct_ratio": F.length(F.regexp_replace(t, "[a-zA-Z0-9\\s]", ""))
        / F.greatest(n_char, F.lit(1)),
        "uniq_ratio": F.size(F.array_distinct(toks)) / F.greatest(n_tok, F.lit(1)),
    }
