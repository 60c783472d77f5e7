"""journald source conformance: export-format framing, the replay
transport end-to-end through the streaming engine, the journalctl
availability gate, and the daemon config type."""

from __future__ import annotations

import shutil
import time
import uuid

import pytest
from pyspark.sql import functions as F

from cheetah_spark.functions import journald as JD
from cheetah_spark.queries.journald import journald_capture_dir
from cheetah_spark.sources.journald_live import (
    JournaldSource,
    JournalctlFactory,
    _frame_entries,
)


def test_frame_entries_blank_line_separated():
    stream = iter(
        [
            "__CURSOR=s=a\n",
            "MESSAGE=one\n",
            "\n",
            "__CURSOR=s=b\n",
            "MESSAGE=two\n",
            "\n",
            "\n",  # double blank: no empty entry
            "__CURSOR=s=c\n",
            "MESSAGE=three",  # EOF without trailing blank line
        ]
    )
    assert list(_frame_entries(stream)) == [
        "__CURSOR=s=a\nMESSAGE=one",
        "__CURSOR=s=b\nMESSAGE=two",
        "__CURSOR=s=c\nMESSAGE=three",
    ]


def test_journald_replay_end_to_end(spark, sf_dir):
    """Replay the derived capture through the streaming source: every
    entry arrives exactly once with its cursor lifted into the
    envelope, and the parsed struct matches the relational parse."""
    cap = journald_capture_dir(spark, sf_dir)
    src = JournaldSource(transport="replay", capture_path=cap, content_type="auto")
    from cheetah_spark.streaming import run_stream_to_completion

    out = run_stream_to_completion(src.read(spark), lambda df: df)
    import duckdb

    expect = duckdb.sql(f"SELECT count(*) FROM '{sf_dir}/events.parquet'").fetchone()[0]
    assert out.count() == expect
    # cursor envelope column == the entry's own __CURSOR field
    bad = out.where(F.col("cursor") != JD.field(F.col("entry"), "__CURSOR")).count()
    assert bad == 0
    # typed projection sanity on one row
    r = out.orderBy("cursor").first()
    assert r.journal.priority is not None and 0 <= r.journal.priority <= 7
    assert r.journal.unit.endswith(".service")
    assert r.journal.message.startswith("evt=")


def test_journalctl_gate_names_binary(monkeypatch):
    """On a host without journalctl the production transport must fail
    with a clear error naming the binary and the replay fallback."""
    monkeypatch.setattr(shutil, "which", lambda _: None)
    with pytest.raises(RuntimeError, match="journalctl"):
        JournalctlFactory()(lambda e: None, lambda e: None)


def test_journald_config_type(tmp_path):
    from cheetah_spark.config import build_source

    src = build_source({"type": "journald"})
    assert isinstance(src, JournaldSource)
    assert src.transport == "journalctl" and src.follow  # zero-config default
    src2 = build_source(
        {"type": "journald", "transport": "replay", "capture_path": str(tmp_path)}
    )
    assert src2.transport == "replay"


def test_journalctl_extra_args_reach_the_factory():
    """extra_args (unit/priority filters — server-side filtering beats
    shipping everything) must flow from the config/dataclass surface
    through the option channel into the factory (r8 self-review: the
    field existed but nothing ever passed it)."""
    from cheetah_spark.sources.journald_live import JournaldSource, _make_factory

    f = _make_factory({"extra_args": "--unit=sshd.service,--priority=4"})
    assert f.extra_args == ("--unit=sshd.service", "--priority=4")
    src = JournaldSource(extra_args=("--unit=sshd.service",))
    assert ",".join(src.extra_args) == "--unit=sshd.service"
