"""Shared seq-window stream-reader base for push/pump transports.

The cheetah-mqtt / cheetah-syslog / cheetah-journald sources all run
the same driver-side reader machinery on the PySpark Python Data
Source API (``SimpleDataSourceStreamReader``):

- a background transport pushes items into a locked buffer;
- offsets are admitted-item counts ``{"seq": n}``;
- ``read(start)`` drains the buffer into seq-numbered rows and keeps a
  short in-memory window of recent slices;
- ``readBetweenOffsets`` replays a windowed slice after a restart, and
  applies a per-source policy when the window is gone (broker
  redelivery / unrecoverable / cursor-resume);
- ``commit(end)`` fires per-item acks for everything below the
  committed offset (at-least-once, ack-after-checkpoint — reference
  kawa T4 ackFn semantics);
- Spark pickles the reader into the data-source runner process before
  first use, so only declarative config travels; runtime state (lock,
  buffers, transport handle) is rebuilt on unpickle.

Round-8 self-declared debt (sources/syslog_live.py): this core was
triplicated, so an offset-machinery fix had to land three times — the
exact place a silent at-least-once bug would creep in. It now lives
once here; subclasses supply only the transport factory and the
envelope/ack/lost-window hooks.

Subclass contract:

- set ``_PICKLE_FIELDS`` to the attribute names that must survive
  pickling (the declarative config — at minimum ``_factory``);
- implement ``_make_listener()`` (construct + start the transport,
  wiring ``self._on_item`` / ``self._on_error``);
- implement ``_row_of(item)`` → the output tuple;
- optionally override ``_ack_of(item, seq, listener)`` → an object
  with ``.ack()`` (or None for ack-less transports);
- implement ``_lost_window_error(start_seq, end_seq)`` → the
  exception for an unrecoverable lost replay window, or override
  ``_on_lost_window`` entirely for softer policies (mqtt QoS≥1 warns
  and relies on broker redelivery).
"""

from __future__ import annotations

import threading
from typing import Iterator, Optional, Tuple

from pyspark.sql.datasource import SimpleDataSourceStreamReader

# slices of recent read() results kept for readBetweenOffsets replay;
# Spark's own simple-reader prefetch cache normally serves this — the
# local window is a second line of defense
_WINDOW_KEEP = 8


class SeqWindowStreamReader(SimpleDataSourceStreamReader):
    """Seq-offset buffering reader core (see module docstring)."""

    _PICKLE_FIELDS: tuple = ("_factory",)

    def _init_runtime(self) -> None:
        self._lock = threading.Lock()
        self._buffer: list = []  # admitted, not yet read
        self._pending: dict[int, object] = {}  # seq -> read, unacked
        self._window: dict[int, list[tuple]] = {}  # start_seq -> rows
        self._fatal: Optional[Exception] = None
        self._listener = None

    def __getstate__(self):
        return {k: getattr(self, k) for k in self._PICKLE_FIELDS}

    def __setstate__(self, state):
        self.__dict__.update(state)
        self._init_runtime()

    # -- transport callbacks ------------------------------------------------
    def _on_item(self, item) -> None:
        with self._lock:
            self._buffer.append(item)

    def _on_error(self, exc: Exception) -> None:
        self._fatal = exc

    # -- subclass hooks -----------------------------------------------------
    def _make_listener(self):
        raise NotImplementedError

    def _row_of(self, item) -> tuple:
        raise NotImplementedError

    def _ack_of(self, item, seq: int, listener):
        """Return an object with ``.ack()`` to fire on commit, or None
        for transports with nothing to ack (e.g. journald cursors ride
        in the rows)."""
        return None

    def _lost_window_error(self, start_seq: int, end_seq: int) -> Exception:
        raise NotImplementedError

    def _on_lost_window(self, start_seq: int, end_seq: int) -> None:
        """Policy when a non-empty replay range is requested after the
        local window was lost (reader-process restart). Default: the
        range is unrecoverable — fail the query rather than silently
        committing an empty slice."""
        raise self._lost_window_error(start_seq, end_seq)

    # -- SimpleDataSourceStreamReader contract ------------------------------
    def _ensure_listener(self):
        if self._listener is None:
            self._listener = self._make_listener()
        return self._listener

    def initialOffset(self) -> dict:
        self._ensure_listener()
        return {"seq": 0}

    def read(self, start: dict) -> Tuple[Iterator[tuple], dict]:
        listener = self._ensure_listener()
        pump = getattr(listener, "pump", None)
        if pump is not None:  # replay transports deliver per-batch chunks
            pump()
        if self._fatal is not None:
            # fatal contract: surface the lost transport as a query
            # error — offsets stay uncommitted
            raise RuntimeError(str(self._fatal))
        with self._lock:
            drained, self._buffer = self._buffer, []
        rows = []
        start_seq = start["seq"]
        seq = start_seq
        for item in drained:
            ack = self._ack_of(item, seq, listener)
            if ack is not None:
                self._pending[seq] = ack
            rows.append(self._row_of(item))
            seq += 1
        self._window[start_seq] = rows
        for k in sorted(self._window)[:-_WINDOW_KEEP]:
            del self._window[k]
        return iter(rows), {"seq": seq}

    def readBetweenOffsets(self, start: dict, end: dict) -> Iterator[tuple]:
        rows = self._window.get(start["seq"])
        if rows is not None:
            return iter(rows[: end["seq"] - start["seq"]])
        if end["seq"] - start["seq"] > 0:
            self._on_lost_window(start["seq"], end["seq"])
        return iter(())

    def commit(self, end: dict) -> None:
        for seq in sorted(self._pending):
            if seq >= end["seq"]:
                break
            self._pending.pop(seq).ack()
