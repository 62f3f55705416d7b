"""Suggest the next round's DRIVER_SAMPLE_PRIORITY rotation.

Reads every CORRECTNESS_r*.json in the repo root and classifies each
registered query:

- covering: the pinned SURVEY §2 covering set (kept at the top);
- never: never appeared in any CORRECTNESS file (highest priority for
  the next 50-query sample);
- stale: has a green row, but not from the LATEST round (eventually
  re-confirmed by rotation);
- fresh: green in the latest round (rotates to the back).

Prints the suggested ordering as a Python tuple body ready to paste
into plans/registry.py. Intentionally does NOT edit the file: the
covering set and any hand-tuned priorities deserve review.

Usage: python tools/rotate_registry.py [--stale]
"""

from __future__ import annotations

import json
import re
import sys
from pathlib import Path

REPO_ROOT = Path(__file__).resolve().parent.parent
if str(REPO_ROOT) not in sys.path:
    sys.path.insert(0, str(REPO_ROOT))


def main() -> None:
    from dynamodb_stream_processor_2_0_spark.plans import registry

    registry._load()
    ordered = list(registry.all_queries())
    prio = registry.DRIVER_SAMPLE_PRIORITY
    # the pinned covering set = everything before the rotation marker
    # (first entry after the '§2 covering set' block, detected as the
    # prefix of DRIVER_SAMPLE_PRIORITY up to the first never-checked
    # marker comment; structurally: the first 21 entries)
    covering = list(prio[:21])

    rounds: dict[int, set[str]] = {}
    for f in sorted(REPO_ROOT.glob("CORRECTNESS_r*.json")):
        m = re.search(r"_r(\d+)", f.name)
        if not m:
            continue
        data = json.loads(f.read_text())
        rounds[int(m.group(1))] = {
            name
            for name, row in data.items()
            if isinstance(row, dict)
            and row.get("rows_match")
            and row.get("schema_match")
            and row.get("hash_match", True)
        }
    if not rounds:
        print("no CORRECTNESS_r*.json files found")
        return
    latest = max(rounds)
    ever_green: dict[str, int] = {}
    for r in sorted(rounds):
        for name in rounds[r]:
            ever_green[name] = r

    never = [n for n in ordered if n not in ever_green and n not in covering]
    stale = [
        n
        for n in ordered
        if n in ever_green and ever_green[n] < latest and n not in covering
    ]
    fresh = [
        n
        for n in ordered
        if ever_green.get(n) == latest and n not in covering
    ]
    # oldest green first within stale, so rotation eventually re-checks
    stale.sort(key=lambda n: (ever_green[n], n))

    print(f"# latest CORRECTNESS round: r{latest}")
    print(
        f"# covering={len(covering)} never={len(never)} "
        f"stale={len(stale)} fresh={len(fresh)}"
    )
    print("# suggested DRIVER_SAMPLE_PRIORITY body:")
    # --stale: stale-refresh round (the r7 verdict's alternation —
    # "no query's newest driver row older than r5 by r9"): the oldest
    # stale greens fill positions 22-50 ahead of the never-checked
    # block. Default: never-checked first (backlog-burn rounds).
    if "--stale" in sys.argv:
        sections = (
            ("SURVEY §2 covering set (pinned)", covering),
            ("stale green, oldest first (fill the sample)", stale),
            ("never driver-checked (next rotations)", never),
            ("fresh green (rotate to back)", fresh),
        )
    else:
        sections = (
            ("SURVEY §2 covering set (pinned)", covering),
            ("never driver-checked (fill the sample)", never),
            ("stale green (oldest first)", stale),
            ("fresh green (rotate to back)", fresh),
        )
    for section, names in sections:
        print(f"    # --- {section} ---")
        for n in names:
            print(f'    "{n}",')


if __name__ == "__main__":
    main()
