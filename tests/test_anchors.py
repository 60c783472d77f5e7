"""Anchor persistence: build-once semantics, cross-process parquet
reuse, bit-exact doubles, and mtime-keyed invalidation."""

from __future__ import annotations

import os
import shutil

from pyspark.sql import functions as F

from cheetah_spark import anchors


def _fixture_dir(tmp_path, spark, sf_dir):
    """A private sf_dir whose files the test may touch (the real
    testdata is read-only)."""
    d = tmp_path / "sf_anchor"
    d.mkdir()
    shutil.copy(f"{sf_dir}/nation.parquet", d / "nation.parquet")
    return str(d)


def test_anchor_builds_once_and_survives_process_restart(tmp_path, spark, sf_dir):
    sfd = _fixture_dir(tmp_path, spark, sf_dir)
    calls = {"n": 0}

    def build(spark_, sf_):
        calls["n"] += 1
        n = spark_.read.parquet(f"{sf_}/nation.parquet")
        return n.groupBy("n_regionkey").agg(
            F.count("*").alias("n"),
            (F.sum("n_nationkey") / 7.0).alias("frac"),  # non-trivial double
        )

    a1 = anchors.anchor_df(spark, sfd, "t_anchor", ("nation",), build).collect()
    a2 = anchors.anchor_df(spark, sfd, "t_anchor", ("nation",), build).collect()
    assert calls["n"] == 1  # memoized within the process
    assert sorted(map(str, a1)) == sorted(map(str, a2))

    # simulate a fresh process: drop the memo, keep the parquet
    anchors._memo.clear()
    a3 = anchors.anchor_df(spark, sfd, "t_anchor", ("nation",), build).collect()
    assert calls["n"] == 1, "persisted anchor must be read, not rebuilt"
    # bit-exact doubles through the parquet round trip
    assert {r.n_regionkey: r.frac.hex() for r in a1} == {
        r.n_regionkey: r.frac.hex() for r in a3
    }


def test_anchor_invalidated_when_source_changes(tmp_path, spark, sf_dir):
    sfd = _fixture_dir(tmp_path, spark, sf_dir)
    calls = {"n": 0}

    def build(spark_, sf_):
        calls["n"] += 1
        return spark_.read.parquet(f"{sf_}/nation.parquet").agg(
            F.count("*").alias("n")
        )

    anchors.anchor_df(spark, sfd, "t_stale", ("nation",), build)
    anchors._memo.clear()
    os.utime(f"{sfd}/nation.parquet")  # regenerated fixture → new mtime
    anchors.anchor_df(spark, sfd, "t_stale", ("nation",), build)
    assert calls["n"] == 2, "mtime change must invalidate the persisted anchor"


def test_anchor_invalidated_when_builder_params_change(tmp_path, spark, sf_dir):
    """Round-5 advice: the staleness key must encode the BUILDER's
    definition, so a code revision cannot be served a stale anchor
    computed by the old builder."""
    sfd = _fixture_dir(tmp_path, spark, sf_dir)
    calls = {"n": 0}

    def build(spark_, sf_):
        calls["n"] += 1
        return spark_.read.parquet(f"{sf_}/nation.parquet").agg(F.count("*").alias("n"))

    anchors.anchor_df(spark, sfd, "t_params", ("nation",), build, params="v1")
    anchors._memo.clear()
    anchors.anchor_df(spark, sfd, "t_params", ("nation",), build, params="v1")
    assert calls["n"] == 1, "same params: persisted anchor served"
    anchors._memo.clear()
    anchors.anchor_df(spark, sfd, "t_params", ("nation",), build, params="v2")
    assert calls["n"] == 2, "params change must invalidate the persisted anchor"


def test_anchor_invalidated_when_builder_code_changes(tmp_path, spark, sf_dir):
    """Round-6 verdict item #1: the key must encode the builder's CODE
    identity, not just hand-bumped params — editing the builder (here:
    a different aggregate) with identical params must miss the cache,
    so a stale anchor can never fake a green correctness row."""
    sfd = _fixture_dir(tmp_path, spark, sf_dir)
    calls = {"n": 0}

    def build(spark_, sf_):
        calls["n"] += 1
        return spark_.read.parquet(f"{sf_}/nation.parquet").agg(
            F.count("*").alias("n")
        )

    anchors.anchor_df(spark, sfd, "t_code", ("nation",), build, params="v1")
    assert calls["n"] == 1

    def build(spark_, sf_):  # noqa: F811 — the "edited" revision
        calls["n"] += 1
        return spark_.read.parquet(f"{sf_}/nation.parquet").agg(
            F.sum("n_nationkey").alias("n")
        )

    got = anchors.anchor_df(
        spark, sfd, "t_code", ("nation",), build, params="v1"
    ).collect()
    assert calls["n"] == 2, "builder source change must invalidate the anchor"
    assert got[0].n != 25, "values must come from the NEW builder, not the cache"

    # and the new revision persists under its own identity
    anchors._memo.clear()
    anchors.anchor_df(spark, sfd, "t_code", ("nation",), build, params="v1")
    assert calls["n"] == 2, "re-load after memo clear must hit the new parquet"


def test_anchor_invalidated_when_declared_helper_changes(tmp_path, spark, sf_dir):
    """r8 verdict item #9 (promoting the r7 advice nit): a builder's
    DECLARED helpers are part of the identity key — editing a helper's
    source with an unchanged builder body and params must miss the
    cache, so helper edits can't serve stale persisted anchors."""
    sfd = _fixture_dir(tmp_path, spark, sf_dir)
    calls = {"n": 0}

    def helper(c):
        return F.count(c)

    def build(spark_, sf_):
        calls["n"] += 1
        return spark_.read.parquet(f"{sf_}/nation.parquet").agg(
            helper(F.col("n_nationkey")).alias("n")
        )

    anchors.anchor_df(spark, sfd, "t_helper", ("nation",), build, params="v1", helpers=(helper,))
    assert calls["n"] == 1
    # same helper object → cache hit across memo clear
    anchors._memo.clear()
    anchors.anchor_df(spark, sfd, "t_helper", ("nation",), build, params="v1", helpers=(helper,))
    assert calls["n"] == 1

    def helper(c):  # noqa: F811 — the "edited" helper revision
        return F.sum(c)

    anchors._memo.clear()
    got = anchors.anchor_df(
        spark, sfd, "t_helper", ("nation",), build, params="v1", helpers=(helper,)
    ).collect()
    assert calls["n"] == 2, "declared helper source change must invalidate the anchor"
    assert got[0].n != 25, "values must come from the NEW helper, not the cache"


def test_media_fixture_invalidated_when_documents_change(tmp_path, spark, sf_dir):
    """media_fixture_dir mirrors the anchor staleness policy: a
    regenerated documents fixture must rebuild the synthesized media
    parquet, not serve payloads from the old corpus."""
    from cheetah_spark.multimodal import media_fixture_dir

    d = tmp_path / "sf_media"
    d.mkdir()
    shutil.copy(f"{sf_dir}/documents.parquet", d / "documents.parquet")
    sfd = str(d)
    out = media_fixture_dir(spark, sfd, "real")
    key1 = open(f"{out}/_FIXTURE_READY").read()
    assert media_fixture_dir(spark, sfd, "real") == out
    assert open(f"{out}/_FIXTURE_READY").read() == key1, "fresh fixture reused"
    os.utime(f"{sfd}/documents.parquet")  # regenerated corpus
    media_fixture_dir(spark, sfd, "real")
    key2 = open(f"{out}/_FIXTURE_READY").read()
    assert key2 != key1, "source mtime change must rebuild the media fixture"
