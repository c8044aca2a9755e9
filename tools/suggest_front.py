"""Print a recommended `_FRONT` (driver correctness window head) for the
next round, computed from the CORRECTNESS_r*.json history.

Policy (enforced by tests/test_registry_window.py):
  1. entries whose LATEST driver row is red — first, they block the gate
  2. entries with NO driver row at all (new this round) — next
  3. rotation: green entries, stalest latest-round first, then registry
     order, filling the 50-slot window

Run from the repo root:  python tools/suggest_front.py
The output is a starting point — curation (grouping related new entries,
keeping a risky fix adjacent to its sibling) stays manual.
"""

from __future__ import annotations

import glob
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from data_engineer_development_spark.queries import all_queries  # noqa: E402

WINDOW = 50


def latest_rows() -> dict[str, tuple[int, bool]]:
    latest: dict[str, tuple[int, bool]] = {}
    for path in glob.glob("CORRECTNESS_r*.json"):
        rnd = int(path.rsplit("_r", 1)[1].split(".")[0])
        rows = json.load(open(path))
        rows = rows.get("queries", rows)
        for name, row in rows.items():
            if not isinstance(row, dict):
                continue
            green = row.get("hash_match")
            if green is None:
                green = row.get("rows_match")
            if name not in latest or rnd > latest[name][0]:
                latest[name] = (rnd, bool(green))
    return latest


def main() -> None:
    keys = list(all_queries())
    hist = latest_rows()
    red = [k for k in keys if k in hist and not hist[k][1]]
    unseen = [k for k in keys if k not in hist]
    green_stale = sorted(
        (k for k in keys if k in hist and hist[k][1]),
        key=lambda k: (hist[k][0], keys.index(k)),
    )
    head = red + unseen
    rotation = [k for k in green_stale if k not in head][: WINDOW - len(head)]
    print(f"# {len(red)} red, {len(unseen)} never-checked, "
          f"{len(rotation)} rotation slots")
    print("_FRONT = [")
    for group, label in ((red, "latest driver row RED"),
                         (unseen, "never driver-checked"),
                         (rotation, "rotation (stalest green first)")):
        if group:
            print(f"    # {label}")
            for k in group:
                rnd = hist[k][0] if k in hist else "-"
                print(f'    "{k}",  # r{rnd}')
    print("]")


if __name__ == "__main__":
    main()
