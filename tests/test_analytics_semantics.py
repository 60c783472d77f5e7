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
