"""Independent-reference semantics for the r10 analytics operators —
the oracle gate proves Spark == DuckDB; these prove the shared formula
is the RIGHT formula, against references that share no code with
either engine."""

from __future__ import annotations

from itertools import combinations

import pandas as pd

from cheetah_spark.registry import REGISTRY, _ensure_loaded

_ensure_loaded()


def test_ewma_matches_pandas_within_truncation_bound(spark, sf_dir):
    """The 8-tap truncated EWMA must agree with pandas' full-history
    ewm(alpha=1/2, adjust=True).mean() to within the truncation tail:
    dropped weights sum to < 2^-8 of the total, so the error bound is
    2^-7 × max|value| (weight tail × value range, conservatively)."""
    out = (
        REGISTRY["q_timeseries_ewma"].fn(spark, sf_dir).toPandas()
    )
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")[
        ["event_id", "user_id", "ts", "value"]
    ].sort_values(["user_id", "ts", "event_id"])
    ref = (
        ev.groupby("user_id")["value"]
        .transform(lambda s: s.ewm(alpha=0.5, adjust=True).mean())
    )
    ev = ev.assign(ref=ref)
    m = out.merge(ev[["event_id", "ref"]], on="event_id")
    bound = 2.0**-7 * ev["value"].abs().max()
    assert len(m) == len(ev)
    assert (m["ewma"] - m["ref"]).abs().max() <= bound


def test_triangles_match_bruteforce_reference(spark, sf_dir):
    """The oriented enumeration must count exactly the triangles a
    brute-force O(n³)-ish reference finds on the same thresholded
    co-presence graph (sf0.001: tiny graph, exhaustive check)."""
    row = REGISTRY["q_graph_triangles"].fn(spark, sf_dir).collect()[0]
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")[
        ["event_type", "ts", "user_id"]
    ]
    ev["h"] = ev["ts"].dt.floor("h")
    pres = ev.drop_duplicates(["event_type", "h", "user_id"])
    from collections import Counter

    cnt: Counter = Counter()
    for _, blk in pres.groupby(["event_type", "h"]):
        us = sorted(blk["user_id"].unique())
        for a, b in combinations(us, 2):
            cnt[(a, b)] += 1
    edges = {p for p, c in cnt.items() if c >= 3}
    adj: dict = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    tri = 0
    for a, b in edges:
        tri += len(adj[a] & adj[b])
    tri //= 3  # each triangle counted once per edge
    n_wedges = sum(len(v) * (len(v) - 1) // 2 for v in adj.values())
    assert row.n_triangles == tri
    assert row.n_edges == len(edges)
    assert row.n_nodes == len(adj)
    assert row.n_wedges == n_wedges


def test_linreg_matches_numpy_polyfit(spark, sf_dir):
    """The exact-decimal two-pass OLS must agree with numpy's
    independent least-squares fit to float tolerance per event type."""
    import numpy as np

    out = {r.event_type: r for r in REGISTRY["q_stats_linreg"].fn(spark, sf_dir).collect()}
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    # unit-safe epoch seconds (parquet may read as datetime64[ms] or
    # [ns]; a raw int64 view silently changes the slope's unit 1000x)
    ev["x"] = ev["ts"].astype("datetime64[ns]").dt.floor("s").astype("int64") // 10**9
    for et, g in ev.groupby("event_type"):
        slope, intercept = np.polyfit(g["x"].to_numpy(float), g["value"].to_numpy(float), 1)
        r = out[et]
        assert abs(r.slope_per_sec - slope) <= 1e-6 + 1e-6 * abs(slope), (et, r.slope_per_sec, slope)
        assert abs(r.intercept - intercept) <= 1e-4 + 1e-6 * abs(intercept), (et, r.intercept, intercept)


def test_knn_classify_matches_numpy_reference(spark, sf_dir):
    """Prediction-for-prediction equality with an independent numpy
    kNN (cosine, k=5, majority vote, (count desc, label asc) ties)."""
    import numpy as np

    out = {r.vec_id: r for r in REGISTRY["q_llm_knn_classify"].fn(spark, sf_dir).collect()}
    emb = pd.read_parquet(f"{sf_dir}/embeddings.parquet")
    V = np.array(emb["embedding"].tolist(), dtype=np.float64)
    V /= np.linalg.norm(V, axis=1, keepdims=True)
    ids = emb["vec_id"].to_numpy()
    labels = emb["label"].to_numpy()
    is_q = ids % 10 == 0
    qi, ti = np.where(is_q)[0], np.where(~is_q)[0]
    sims = V[qi] @ V[ti].T
    for row, qrow in zip(sims, qi):
        order = np.lexsort((ids[ti], -row))  # cos desc, id asc
        top = order[:5]
        votes = {}
        for lab in labels[ti][top]:
            votes[lab] = votes.get(lab, 0) + 1
        pred = sorted(votes.items(), key=lambda kv: (-kv[1], kv[0]))[0][0]
        r = out[ids[qrow]]
        assert r.pred_label == pred, (ids[qrow], r.pred_label, pred)
        assert r.true_label == labels[qrow]


def test_knn_vote_exact_duplicate_tie_break(spark):
    """With EXACT-duplicate train embeddings (all cos_sim ties), the
    top-k must be the k LOWEST neighbor_ids — the oracle's
    (cos_sim DESC, neighbor_id ASC) total order. An argpartition-style
    local top-k breaks ties arbitrarily and can evict the oracle-chosen
    low id at the partition boundary; the lexsort selection cannot.
    Row order is shuffled so positional luck can't mask a regression."""
    import random

    from cheetah_spark.queries.llm import _knn_vote

    v = [1.0, 0.0, 0.0, 0.0]
    rows = [(i, v, "a" if i <= 5 else "b") for i in range(1, 21)]
    random.Random(7).shuffle(rows)
    schema = "vec_id long, embedding array<double>, label string"
    train = spark.createDataFrame(rows, schema).repartition(3)
    qdf = spark.createDataFrame([(0, v, "a")], schema)
    out = _knn_vote(qdf, train).collect()
    assert len(out) == 1
    r = out[0]
    # correct k=5 panel is ids 1..5 (all label 'a'): unanimous vote
    assert (r.pred_label, r.n_votes, bool(r.correct)) == ("a", 5, True)


def test_audio_fingerprint_rate_invariant(spark):
    """Two WAVs with the same constant amplitude and ~equal duration at
    DIFFERENT sample rates must share a fingerprint; a clip one
    amplitude bin away must not."""
    import io
    import struct
    import wave

    from cheetah_spark import multimodal as M

    def wav(fr, n, amp):
        buf = io.BytesIO()
        w = wave.open(buf, "wb")
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(fr)
        w.writeframes(struct.pack("<%dh" % n, *([amp] * n)))
        w.close()
        return buf.getvalue()

    media = spark.createDataFrame(
        [
            (1, bytearray(wav(8000, 800, 1000))),   # 100 ms
            (2, bytearray(wav(16000, 1600, 1000))),  # 100 ms, 2x rate
            (3, bytearray(wav(8000, 800, 1100))),   # next 32-unit bin
        ],
        "doc_id long, payload binary",
    )
    rows = {r.doc_id: r for r in M.audio_fingerprint_features(media).collect()}
    assert rows[1].afp == rows[2].afp  # rate-invariant collision
    assert rows[1].afp != rows[3].afp  # amplitude bins separate
    assert all(rows[i].parse_ok for i in (1, 2, 3))
