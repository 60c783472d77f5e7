"""Generate scale-probe fixtures (sfN ~ N x sf0.1) for SCALE.md.

The driver testdata stops at sf0.1; the 100 TB claims for the dedup /
ANN family are plan-shape arguments until measured against a bigger
input (round-4 verdict item #4). This generator draws documents and
embeddings from the EMPIRICAL distributions of the sf0.1 fixture
(unigram token frequencies, token-count / lang / source marginals,
per-label embedding mean+std), so the candidate-set growth measured on
the output reflects the same data shape, not a new synthetic regime.
Duplicate structure is injected at the same RATE as sf0.1 (exact-dup
fraction ~0.16%, plus 1% near-dup mutations), keeping per-doc
collision probabilities constant so sub-quadratic growth is
attributable to the banding, not to vanishing duplicates.

Writes /tmp/cheetah_scale/sf{mult}/documents.parquet and
embeddings.parquet (single files, same schema as testdata). Seeded —
reruns are byte-stable. Usage:

    python tools/gen_scale_fixture.py 5    # sf0.5  (5 x sf0.1)
    python tools/gen_scale_fixture.py 10   # sf1    (10 x sf0.1)
"""

from __future__ import annotations

import os
import sys

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

BASE = "/root/testdata/sf0.1"
OUT_ROOT = "/tmp/cheetah_scale"
SEED = 20260814


def gen_documents(mult: int, rng: np.random.Generator) -> pa.Table:
    rows = duckdb.sql(f"SELECT text, lang, source FROM '{BASE}/documents.parquet'").fetchall()
    texts = [r[0] for r in rows]
    langs = [r[1] for r in rows]
    sources = [r[2] for r in rows]
    tok_lists = [t.split() for t in texts]
    vocab: dict[str, int] = {}
    for toks in tok_lists:
        for t in toks:
            vocab[t] = vocab.get(t, 0) + 1
    words = np.array(list(vocab))
    probs = np.array(list(vocab.values()), dtype=np.float64)
    probs /= probs.sum()
    lens = np.array([len(t) for t in tok_lists])
    lang_vals, lang_cnt = np.unique(langs, return_counts=True)
    src_vals, src_cnt = np.unique(sources, return_counts=True)

    n = len(texts) * mult
    n_exact = round(n * 8 / 5000)  # sf0.1's exact-dup rate
    n_near = round(n * 0.01)
    out_texts: list[str] = []
    for i in range(n):
        ln = int(rng.choice(lens))
        out_texts.append(" ".join(rng.choice(words, size=max(ln, 1), p=probs)))
    # exact dups: copy an earlier doc verbatim
    for j in rng.choice(np.arange(1, n), size=n_exact, replace=False):
        out_texts[j] = out_texts[int(rng.integers(0, j))]
    # near dups: mutate ~10% of an earlier doc's tokens
    for j in rng.choice(np.arange(1, n), size=n_near, replace=False):
        src_toks = out_texts[int(rng.integers(0, j))].split()
        toks = list(src_toks)
        for k in rng.choice(len(toks), size=max(1, len(toks) // 10), replace=False):
            toks[k] = str(rng.choice(words))
        out_texts[j] = " ".join(toks)
    return pa.table(
        {
            "doc_id": pa.array(range(n), pa.int64()),
            "text": pa.array(out_texts, pa.string()),
            "lang": pa.array(rng.choice(lang_vals, size=n, p=lang_cnt / lang_cnt.sum())),
            "source": pa.array(rng.choice(src_vals, size=n, p=src_cnt / src_cnt.sum())),
            "n_chars": pa.array([len(t) for t in out_texts], pa.int64()),
        }
    )


def gen_embeddings(mult: int, rng: np.random.Generator) -> pa.Table:
    rows = duckdb.sql(f"SELECT embedding, label FROM '{BASE}/embeddings.parquet'").fetchall()
    E = np.array([r[0] for r in rows], dtype=np.float64)
    labels = np.array([r[1] for r in rows])
    lab_vals, lab_cnt = np.unique(labels, return_counts=True)
    means = {l: E[labels == l].mean(axis=0) for l in lab_vals}
    stds = {l: E[labels == l].std(axis=0) for l in lab_vals}
    n = len(rows) * mult
    new_labels = rng.choice(lab_vals, size=n, p=lab_cnt / lab_cnt.sum())
    vecs = np.stack(
        [means[l] + rng.standard_normal(E.shape[1]) * stds[l] for l in new_labels]
    ).astype(np.float32)
    return pa.table(
        {
            "vec_id": pa.array(range(n), pa.int64()),
            "embedding": pa.array(list(vecs), pa.list_(pa.float32())),
            "label": pa.array(new_labels.astype(np.int32), pa.int32()),
        }
    )


def gen_events(mult: int, rng: np.random.Generator) -> pa.Table:
    """Events scaled the way real telemetry scales: the TIME SPAN grows
    mult× while the per-hour event density and the per-hour ACTIVE-user
    density stay at sf0.1's empirical values (users are drawn per hour
    from the observed distinct-users-per-hour distribution over a
    user population that also grows mult×). This keeps the (type,
    hour) co-presence blocks of q_graph_triangles at constant size —
    so the probe measures how block-local pair work aggregates across
    mult× more blocks, not an unrealistic density blow-up — and gives
    the window/rollup operators mult× more groups of the same depth."""
    con = duckdb.connect()
    base = con.sql(
        f"SELECT event_id, ts, user_id, event_type, value, props "
        f"FROM '{BASE}/events.parquet'"
    ).fetchall()
    types = np.array([r[3] for r in base])
    type_vals, type_cnt = np.unique(types, return_counts=True)
    values = np.array([r[4] for r in base], dtype=np.float64)
    props = np.array([r[5] for r in base])
    ts0 = min(r[1] for r in base)
    span_s = int((max(r[1] for r in base) - ts0).total_seconds()) + 60
    per_hour = duckdb.sql(
        f"SELECT COUNT(*) AS c FROM '{BASE}/events.parquet' GROUP BY date_trunc('hour', ts)"
    ).fetchnumpy()["c"]
    n_users = duckdb.sql(
        f"SELECT COUNT(DISTINCT user_id) FROM '{BASE}/events.parquet'"
    ).fetchone()[0]

    n_hours = (span_s // 3600 + 1) * mult
    counts = rng.choice(per_hour, size=n_hours)
    n = int(counts.sum())
    hour_idx = np.repeat(np.arange(n_hours), counts)
    offsets = rng.integers(0, 3600, size=n)
    epoch0 = int(ts0.timestamp())
    ts_s = epoch0 + hour_idx * 3600 + offsets
    order = np.argsort(ts_s, kind="stable")
    ts_s = ts_s[order]
    user_pool = n_users * mult
    return pa.table(
        {
            "event_id": pa.array(range(n), pa.int64()),
            "ts": pa.array(
                (ts_s * 1_000_000_000).astype("int64"), pa.timestamp("ns")
            ),
            "user_id": pa.array(rng.integers(0, user_pool, size=n), pa.int64()),
            "event_type": pa.array(
                rng.choice(type_vals, size=n, p=type_cnt / type_cnt.sum())
            ),
            "value": pa.array(rng.choice(values, size=n), pa.float64()),
            "props": pa.array(rng.choice(props, size=n), pa.string()),
        }
    )


def main() -> None:
    mult = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    out = f"{OUT_ROOT}/sfx{mult}"
    os.makedirs(out, exist_ok=True)
    rng = np.random.default_rng(SEED + mult)
    pq.write_table(gen_documents(mult, rng), f"{out}/documents.parquet")
    pq.write_table(gen_embeddings(mult, rng), f"{out}/embeddings.parquet")
    pq.write_table(gen_events(mult, rng), f"{out}/events.parquet")
    print(out)


if __name__ == "__main__":
    main()
