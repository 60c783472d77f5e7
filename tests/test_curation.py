"""Curation-operator tests: connected-components semantics on
hand-built graphs, and physical-plan audits for the new decontamination
/ TF-IDF operators (scale posture: broadcast where intended, never a
cross join)."""

from __future__ import annotations

import contextlib
import io

from pyspark.sql import functions as F

from cheetah_spark.operators.graph import connected_components
from cheetah_spark.registry import REGISTRY, _ensure_loaded

_ensure_loaded()


def _plan(df, mode: str = "formatted") -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode)
    return buf.getvalue()


def _sym(spark, pairs):
    df = spark.createDataFrame(pairs, "s long, t long")
    return df.unionByName(df.select(F.col("t").alias("s"), F.col("s").alias("t")))


def test_cc_transitive_chain_is_one_component(spark):
    # path graph 1-2-3-4 (diameter 3) plus isolated pair 10-11:
    # transitivity must collapse the chain into ONE component labeled
    # by its minimum node id
    edges = _sym(spark, [(1, 2), (2, 3), (3, 4), (10, 11)])
    got = {(r.node_id, r.comp_id) for r in connected_components(spark, edges).collect()}
    assert got == {(1, 1), (2, 1), (3, 1), (4, 1), (10, 10), (11, 10)}


def test_cc_excludes_isolated_nodes(spark):
    # nodes appear in the output iff they appear in the edge set
    edges = _sym(spark, [(5, 7)])
    got = {(r.node_id, r.comp_id) for r in connected_components(spark, edges).collect()}
    assert got == {(5, 5), (7, 5)}


def test_cc_clique_converges_fast(spark):
    # a 4-clique converges in 2 rounds (1 propagate + 1 confirm);
    # max_iters=3 both proves convergence speed and bounds the test
    pairs = [(a, b) for a in range(20, 24) for b in range(20, 24) if a < b]
    edges = _sym(spark, pairs)
    got = {(r.node_id, r.comp_id) for r in connected_components(spark, edges, max_iters=3).collect()}
    assert got == {(n, 20) for n in range(20, 24)}


def test_cc_star_chain_converges_logarithmically(spark):
    # the adversarial case for label propagation: a 100-node path has
    # diameter 99, but the alternating large-star/small-star algorithm
    # (Kiveris et al.) must converge in O(log n) rounds
    n = 100
    edges = _sym(spark, [(i, i + 1) for i in range(n - 1)])
    got = {
        (r.node_id, r.comp_id)
        for r in connected_components(spark, edges, algorithm="star").collect()
    }
    assert got == {(i, 0) for i in range(n)}
    import math

    assert connected_components.last_rounds <= math.ceil(math.log2(n)) + 3, (
        connected_components.last_rounds
    )


def test_cc_auto_falls_back_to_star_on_deep_chain(spark):
    # auto must label-propagate a few rounds, then contract and hand a
    # ~star_after-times-smaller chain to the star rounds — total far
    # below the diameter (99) that pure label propagation would need
    n = 100
    edges = _sym(spark, [(i, i + 1) for i in range(n - 1)])
    got = {
        (r.node_id, r.comp_id)
        for r in connected_components(spark, edges, algorithm="auto", star_after=4).collect()
    }
    assert got == {(i, 0) for i in range(n)}
    assert connected_components.last_rounds <= 4 + 8, connected_components.last_rounds


def test_cc_star_matches_label_on_random_graph(spark):
    # both algorithms must produce identical (node_id, comp_id) sets
    # on an arbitrary multi-component graph (seeded, not wall-clock)
    import random

    rng = random.Random(42)
    pairs = [(rng.randrange(60), rng.randrange(60)) for _ in range(45)]
    pairs = [(a, b) for a, b in pairs if a != b]
    edges = _sym(spark, pairs)
    star = {(r.node_id, r.comp_id) for r in connected_components(spark, edges, algorithm="star").collect()}
    label = {(r.node_id, r.comp_id) for r in connected_components(spark, edges, algorithm="label").collect()}
    assert star == label


def test_cc_restores_shuffle_partitions(spark):
    before = spark.conf.get("spark.sql.shuffle.partitions")
    connected_components(spark, _sym(spark, [(1, 2)])).collect()
    assert spark.conf.get("spark.sql.shuffle.partitions") == before


def test_decontaminate_broadcasts_eval_set(spark, sf_dir):
    p = _plan(REGISTRY["q_llm_decontaminate"].fn(spark, sf_dir))
    # the eval-shingle side must be a broadcast probe, and the corpus
    # must never be cross-joined
    assert "BroadcastHashJoin" in p, p
    assert "CartesianProduct" not in p and "BroadcastNestedLoopJoin" not in p


def test_tfidf_no_cross_join_and_partial_agg(spark, sf_dir):
    p = _plan(REGISTRY["q_llm_tfidf_topterms"].fn(spark, sf_dir))
    assert "CartesianProduct" not in p and "BroadcastNestedLoopJoin" not in p
    # tf/df aggregations must partial-aggregate map-side
    assert "partial_count" in p or "HashAggregate" in p, p


def test_domain_mix_weights_are_a_distribution(spark, sf_dir):
    """Mixture invariants: weights form a distribution, temperature
    flattens (head domains downweighted, tail upweighted)."""
    from cheetah_spark.registry import REGISTRY

    rows = REGISTRY["q_llm_domain_mix"].fn(spark, sf_dir).collect()
    assert abs(sum(r.mix_weight for r in rows) - 1.0) < 1e-9
    assert abs(sum(r.token_share for r in rows) - 1.0) < 1e-9
    mean_share = 1.0 / len(rows)
    for r in rows:
        if r.token_share > mean_share * 1.05:
            assert r.mix_weight < r.token_share  # head flattened
        if r.token_share < mean_share * 0.95:
            assert r.mix_weight > r.token_share  # tail upsampled
        assert abs(r.upsample * r.token_share - r.mix_weight) < 1e-12


def test_dedup_keep_counts_tokenless_docs(spark, tmp_path):
    """A punctuation-only/empty document has no fingerprint row, but it
    is its own singleton component and must be KEPT — the Spark plan
    must agree with the oracle's all-documents closure (r8 self-review
    finding: the inner fingerprint join silently deleted such docs)."""
    import duckdb

    from cheetah_spark.registry import REGISTRY
    from conftest import assert_matches_oracle

    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta", "en", "s0", 36),
            (2, "alpha beta gamma delta epsilon zeta", "en", "s0", 36),
            (3, "!!! ...", "en", "s0", 7),  # token-less: no [a-z0-9] run
            (4, "totally different words here now", "fr", "s0", 32),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    sf = str(tmp_path / "sf")
    (tmp_path / "sf").mkdir()
    docs.coalesce(1).write.mode("overwrite").parquet(f"{sf}/documents.parquet")
    out = REGISTRY["q_llm_dedup_keep"].fn(spark, sf)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{sf}/documents.parquet/*.parquet'")
    assert_matches_oracle(out, con.sql(REGISTRY["q_llm_dedup_keep"].oracle))
    row = {r.lang: r for r in out.collect()}
    # doc 3 (token-less) is a kept singleton; doc 2 is the dropped dup
    assert row["en"].n_docs == 3 and row["en"].n_kept == 2 and row["en"].n_dropped == 1
    con.close()


def test_url_canonicalization_spec(spark):
    """The canonicalization spec point-checked: case, www., utm_*
    stripping, param sorting, fragment removal."""
    from pyspark.sql import functions as F

    from cheetah_spark.queries.curation import _canonical_url_expr

    cases = [
        ("HTTP://WWW.SrC1.example.com/p/7?b=7&utm_campaign=x&a=1#sec3",
         "http://src1.example.com/p/7?a=1&b=7"),
        ("https://src2.example.com/p/0?a=1&utm_source=feed&b=0#sec0",
         "https://src2.example.com/p/0?a=1&b=0"),
        ("https://www.Host.example.com/p/1?utm_source=x&utm_campaign=y#f",
         "https://host.example.com/p/1"),
        ("https://h.example.com/p/2", "https://h.example.com/p/2"),
    ]
    df = spark.createDataFrame([(u,) for u, _ in cases], "url string")
    got = [r.c for r in df.select(_canonical_url_expr(F.col("url")).alias("c")).collect()]
    assert got == [want for _, want in cases]


def test_url_dedup_keeps_one_doc_per_page(spark, sf_dir):
    """Exactly one kept fetch per canonical page: n_docs - n_dropped
    must equal n_pages in every source stratum. Per-stratum form holds
    ONLY because the fixture's curl embeds its source (curl → source
    functional dependency); with cross-source URLs the law is
    corpus-wide — see _url_pages_report's semantics note and
    test_url_dedup_report_global_keeper_cross_source."""
    from cheetah_spark.registry import REGISTRY

    rows = REGISTRY["q_llm_url_dedup"].fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.n_docs - r.n_dropped == r.n_pages, r


def test_url_dedup_report_global_keeper_cross_source(spark):
    """_url_pages_report must implement the batch operator's GLOBAL
    keep-min even when one canonical URL is fetched from several
    sources (the fixture's curl embeds the source, so the registered
    oracle can't see this axis — pin it directly): the keeper is the
    corpus-wide MIN doc_id, dup-group membership uses the corpus-wide
    fetch total, and per-source drop mass follows."""
    from cheetah_spark.queries.curation import _url_pages_report

    fetches = spark.createDataFrame(
        # curl X spans sources A and B; global keeper is doc 2 (in B)
        [(5, "A", "X"), (7, "A", "X"), (9, "A", "X"),
         (2, "B", "X"), (4, "B", "X"),
         (10, "A", "Y"),            # singleton page
         (20, "B", "Z"), (21, "B", "Z")],
        "doc_id long, source string, curl string",
    )
    pages = fetches.groupBy("source", "curl").agg(
        F.min("doc_id").alias("keep_id"), F.count("*").alias("n_fetches")
    )
    got = {r.source: r.asDict() for r in _url_pages_report(pages).collect()}
    # the fetch-level truth, computed the batch operator's way
    keep = fetches.groupBy("curl").agg(
        F.min("doc_id").alias("gk"), F.count("*").alias("gf")
    )
    truth = {
        r.source: r.asDict()
        for r in fetches.join(keep, "curl")
        .groupBy("source")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.count_distinct("curl").cast("bigint").alias("n_pages"),
            F.sum((F.col("doc_id") != F.col("gk")).cast("int"))
            .cast("bigint").alias("n_dropped"),
            F.sum(F.when(F.col("gf") >= 2, 1).otherwise(0))
            .cast("bigint").alias("n_in_dup_groups"),
        )
        .collect()
    }
    assert got == truth
    # spot-pin one hand-computed row: source A keeps only its singleton
    # (all three X fetches lose to B's doc 2)
    assert got["A"] == {
        "source": "A", "n_docs": 4, "n_pages": 2,
        "n_dropped": 3, "n_in_dup_groups": 3,
    }


def test_url_dedup_stream_ttl_large_matches_batch(spark, sf_dir):
    """With a TTL at least the corpus's event span, the TTL-aged state
    path must drain to exactly the un-aged report — i.e. the batch
    operator's answer (the verdict-r11 conformance gate for the aging
    engine)."""
    from cheetah_spark.queries.curation import q_llm_url_dedup, s_llm_url_dedup

    batch = {r.source: r.asDict() for r in q_llm_url_dedup(spark, sf_dir).collect()}
    aged = {
        r.source: r.asDict()
        for r in s_llm_url_dedup(spark, sf_dir, ttl_seconds=10**7).collect()
    }
    assert aged == batch


def test_url_dedup_ttl_evicts_cold_keys(spark, tmp_path):
    """A canonical URL not re-fetched within the TTL must leave the
    state store: replay 400 doc-seconds in 4 ordered files, a 'cold'
    page fetched only at t=0..2 and a 'hot' page fetched throughout,
    TTL 50 s — the watermark passes cold's timeout during file 2, so
    the drained LIVE state holds only the hot page (with exact
    keep-min/fetch-count), while the large-TTL test above proves
    absence here is eviction, not loss."""
    import os

    import pandas as pd

    from cheetah_spark.queries.curation import url_dedup_live_state

    out = tmp_path / "canon_stream"
    out.mkdir()
    base_t = 1_700_000_000
    for i in range(4):
        ids = list(range(i * 100, (i + 1) * 100))
        pdf = pd.DataFrame(
            {
                "doc_id": ids,
                "source": "A",
                "curl": ["cold" if d <= 2 else "hot" for d in ids],
            }
        )
        p = str(out / f"data-{i:04d}.parquet")
        pdf.to_parquet(p)
        os.utime(p, (base_t + i, base_t + i))
    stream = (
        spark.readStream.schema("doc_id long, source string, curl string")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(out))
    )
    live = {
        (r.source, r.curl): r.asDict()
        for r in url_dedup_live_state(stream, ttl_seconds=50).collect()
    }
    assert set(live) == {("A", "hot")}
    assert live[("A", "hot")]["keep_id"] == 3
    assert live[("A", "hot")]["n_fetches"] == 397


def test_c4_filter_stream_equals_batch(spark, sf_dir):
    """s_llm_c4_filter must reproduce q_llm_c4_rules exactly: the
    judged projection is stateless, so micro-batch admission cannot
    change any verdict — streaming output == batch output row for row."""
    from cheetah_spark.queries.curation import q_llm_c4_rules, s_llm_c4_filter

    batch = {r["lang"]: r.asDict() for r in q_llm_c4_rules(spark, sf_dir).collect()}
    stream = {r["lang"]: r.asDict() for r in s_llm_c4_filter(spark, sf_dir).collect()}
    assert stream == batch


def test_gopher_filter_stream_equals_batch(spark, sf_dir):
    """s_llm_gopher_filter must reproduce q_llm_gopher_rules exactly:
    the seven-rule battery is stateless, so micro-batch admission
    cannot change any verdict — streaming output == batch output row
    for row across every (lang, genre) stratum."""
    from cheetah_spark.queries.curation import q_llm_gopher_rules, s_llm_gopher_filter

    batch = {
        (r["lang"], r["genre"]): r.asDict()
        for r in q_llm_gopher_rules(spark, sf_dir).collect()
    }
    stream = {
        (r["lang"], r["genre"]): r.asDict()
        for r in s_llm_gopher_filter(spark, sf_dir).collect()
    }
    assert stream == batch


def test_stateful_url_dedup_checkpoint_recovery(spark, sf_dir, tmp_path):
    """Kill the keyed-state stream MID-REPLAY and resume from the same
    checkpoint: the recovered run must continue from the committed
    offsets (not restart from scratch) and the drained state must
    equal the batch operator bit-for-bit — the state-store recovery
    contract every production deployment of the at-ingest dedup relies
    on (the reference's ack-on-commit maps to exactly this replay)."""
    import time

    from cheetah_spark.queries.curation import (
        _canonical_url_expr,
        _messy_url_expr,
        _url_pages_report,
        q_llm_url_dedup,
    )
    from cheetah_spark.queries.streams import scoped_state_partitions
    from cheetah_spark.sources import ParquetSource
    from cheetah_spark.streaming import documents_stream_dir

    src = documents_stream_dir(spark, sf_dir)
    ckpt = str(tmp_path / "rec_ckpt")

    def start(name):
        stream = ParquetSource(src, streaming=True, max_files_per_trigger=1).read(spark)
        urls = stream.select("doc_id", "source", _messy_url_expr().alias("url"))
        canon = urls.select(
            "doc_id", "source", _canonical_url_expr(F.col("url")).alias("curl")
        )
        agg = canon.groupBy("source", "curl").agg(
            F.min("doc_id").alias("keep_id"), F.count("*").alias("n_fetches")
        )
        return (
            agg.writeStream.format("memory")
            .queryName(name)
            .outputMode("complete")
            .option("checkpointLocation", ckpt)
            .start()
        )

    with scoped_state_partitions(spark):
        q1 = start("rec_phase1")
        try:
            deadline = time.time() + 120
            while time.time() < deadline and not q1.recentProgress:
                time.sleep(0.2)
            assert q1.recentProgress, "no batch committed before the kill"
        finally:
            q1.stop()  # the crash
        q2 = start("rec_phase2")
        try:
            q2.processAllAvailable()
            # recovery, not a from-scratch rerun: the resumed query's
            # batch ids continue past the pre-crash commits
            batch_ids = [p["batchId"] for p in q2.recentProgress]
            assert batch_ids and min(batch_ids) >= 1, batch_ids
        finally:
            q2.stop()
    pages = spark.table("rec_phase2").localCheckpoint(eager=False)
    got = {r.source: r.asDict() for r in _url_pages_report(pages).collect()}
    want = {r.source: r.asDict() for r in q_llm_url_dedup(spark, sf_dir).collect()}
    assert got == want


def test_url_dedup_ttl_rebirth_starts_fresh_window(spark, tmp_path):
    """A URL re-fetched AFTER its state was evicted starts a NEW
    keep-window (the documented TTL semantics): replay a page fetched
    at t=0..2, silent through the TTL horizon, then re-fetched at
    t=300..301 — the drained live state must show ONLY the reborn
    window (keep-min and fetch count of the new fetches, not the
    pre-eviction ones)."""
    import os

    import pandas as pd

    from cheetah_spark.queries.curation import url_dedup_live_state

    out = tmp_path / "canon_stream_rebirth"
    out.mkdir()
    base_t = 1_700_000_000
    for i in range(4):
        ids = list(range(i * 100, (i + 1) * 100))
        pdf = pd.DataFrame(
            {
                "doc_id": ids,
                "source": "A",
                "curl": [
                    "page" if (d <= 2 or d in (380, 381)) else "noise"
                    for d in ids
                ],
            }
        )
        p = str(out / f"data-{i:04d}.parquet")
        pdf.to_parquet(p)
        os.utime(p, (base_t + i, base_t + i))
    stream = (
        spark.readStream.schema("doc_id long, source string, curl string")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(out))
    )
    live = {
        (r.source, r.curl): r.asDict()
        for r in url_dedup_live_state(stream, ttl_seconds=50).collect()
    }
    # 'page' was evicted (last seen t=2, TTL 50, watermark passed 52
    # during file 1) and reborn at t=380: the live entry is the NEW
    # window — keep_id 380, n_fetches 2 — not the pre-eviction (0, 3)
    assert ("A", "page") in live
    assert live[("A", "page")]["keep_id"] == 380
    assert live[("A", "page")]["n_fetches"] == 2


def test_url_dedup_resolver_rebirth_wins_watermark_tie(spark):
    """The spool resolver must not let an eviction tombstone outrank a
    REBIRTH that lands before the watermark advances (ADVICE r12): the
    watermark is monotone but not strictly increasing, so the two can
    tie on wm, and the tombstone carries the LARGER n_fetches — under
    the old (wm DESC, n_fetches DESC, evicted DESC) order the live
    reborn window was wrongly dropped. Pin the synthetic spool the
    streaming engine cannot be forced to produce deterministically."""
    from cheetah_spark.queries.curation import resolve_latest_url_state

    spool = spark.createDataFrame(
        [
            # key 1: update(wm=10) → evict(wm=60) → rebirth at wm=60
            # (watermark did not advance between the batches); the
            # tombstone's n_fetches=5 > the reborn window's 1
            ("A", "page", 0, 5, 10, False),
            ("A", "page", 0, 5, 60, True),
            ("A", "page", 300, 1, 60, False),
            # key 2: two rebirth updates tie on wm — n_fetches DESC
            # must still pick the newest among live rows
            ("A", "other", 0, 3, 20, False),
            ("A", "other", 0, 3, 70, True),
            ("A", "other", 400, 1, 70, False),
            ("A", "other", 400, 2, 70, False),
            # key 3: evicted with no rebirth — must NOT appear
            ("A", "gone", 0, 2, 40, False),
            ("A", "gone", 0, 2, 90, True),
        ],
        "source string, curl string, keep_id long, n_fetches long, "
        "wm long, evicted boolean",
    )
    got = {
        (r.source, r.curl): (r.keep_id, r.n_fetches)
        for r in resolve_latest_url_state(spool).collect()
    }
    assert got == {("A", "page"): (300, 1), ("A", "other"): (400, 2)}


def test_gopher_fail_sql_per_rule_parity_with_spark(spark, sf_dir):
    """gopher_fail_sql (the raw-column DuckDB mirror the declarative
    chain's oracle uses) must agree with gopher_rule_exprs PER RULE PER
    DOCUMENT — not just through the chain's aggregate: run each single
    rule both ways over the raw corpus text and compare the failing
    doc_id sets."""
    import duckdb

    from cheetah_spark.queries.curation import (
        gopher_fail_sql,
        gopher_feat_exprs,
        gopher_rule_exprs,
    )

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    rules = gopher_rule_exprs(gopher_feat_exprs(F.col("text")))
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet'"
    )
    try:
        for name, expr in rules.items():
            got = {r.doc_id for r in d.where(expr).select("doc_id").collect()}
            want = {
                r[0]
                for r in con.sql(
                    f"SELECT doc_id FROM documents WHERE {gopher_fail_sql('text', (name,))}"
                ).fetchall()
            }
            assert got == want, (name, len(got), len(want))
    finally:
        con.close()
