"""Merge a partial scale-probe output into SCALE_PROBE.json.

`python tools/scale_probe.py q_a q_b` prints one JSON blob with only
the named queries' timings; this tool folds that blob into the
committed SCALE_PROBE.json without disturbing other queries' rows
(per-query replace, not deep-merge: a re-probe supersedes the old
tiers for that query).

Usage:
    python tools/scale_probe.py q_new | tee /tmp/probe.log
    python tools/merge_probe.py /tmp/probe.log         # or the blob file
    python tools/merge_probe.py < /tmp/probe.log       # stdin works too

The input may be a raw probe log: the LAST line that parses as a JSON
object with a "timings" key is used.
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

PROBE_PATH = Path(__file__).resolve().parent.parent / "SCALE_PROBE.json"


def extract_blob(text: str) -> dict:
    blob = None
    for ln in text.replace("\r", "\n").splitlines():
        ln = ln.strip()
        if ln.startswith("{") and '"timings"' in ln:
            try:
                blob = json.loads(ln)
            except json.JSONDecodeError:
                continue
    if blob is None:
        raise SystemExit("no probe JSON blob (object with 'timings') found in input")
    return blob


def main() -> None:
    text = Path(sys.argv[1]).read_text() if len(sys.argv) > 1 else sys.stdin.read()
    new = extract_blob(text)
    cur = json.loads(PROBE_PATH.read_text()) if PROBE_PATH.exists() else {}
    cur.setdefault("timings", {}).update(new.get("timings", {}))
    cur.setdefault("scales", {}).update(new.get("scales", {}))
    for section in ("candidates", "driver_state"):
        if new.get(section):
            cur.setdefault(section, {}).update(new[section])
    PROBE_PATH.write_text(json.dumps(cur, indent=1) + "\n")
    print(f"merged {sorted(new.get('timings', {}))} into {PROBE_PATH}")


if __name__ == "__main__":
    main()
