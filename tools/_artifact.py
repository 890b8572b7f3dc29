"""Shared measurement-artifact writer (VERDICT r4 directive #9).

Measurement JSON must land in the repo's ``artifacts/`` directory the
moment it is produced — round 4 lost a /tmp log wipe's worth of
attribution data and had to mark `fwd_split_r4.json` "recovered from
session transcript". Every tools/*_split.py now writes its result here by
default (stdout printing stays for eyeballing); curated round artifacts
are copies/renames of these files, so provenance is a file, not a memory.
"""

from __future__ import annotations

import json
import os
import sys
import time

ARTIFACTS = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "artifacts")


def write_artifact(payload: dict, tool: str, out: str | None = None) -> str:
    """Write ``payload`` (+ provenance: tool, argv, timestamp) as JSON.

    Default path: ``artifacts/<tool>_latest.json`` — the live record of
    the most recent run; promote to a round-stamped name when citing it.
    Returns the path written.
    """
    path = out or os.path.join(ARTIFACTS, f"{tool}_latest.json")
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    rec = {"tool": tool, "argv": sys.argv[1:],
           "measured": time.strftime("%Y-%m-%d %H:%M:%S")}
    rec.update(payload)
    with open(path, "w") as f:
        json.dump(rec, f, indent=1)
        f.write("\n")
    print(f"[artifact] {path}", file=sys.stderr)
    return path
