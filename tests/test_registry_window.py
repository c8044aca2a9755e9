"""Guard the driver's 50-slot correctness window (SURVEY.md §5).

The driver checks only the FIRST 50 registry keys per round, so any
registry entry whose latest driver row is red — or that has never been
driver-checked at all — must sit inside that head or it silently never
earns evidence. Round 6 proved this can slip by hand-maintained lists:
``dedup_incremental`` and ``emb_centroid_by_label`` were omitted from
``_FRONT`` while its comment claimed only 3 deliberate overflows. This
test recomputes the priority set mechanically from the CORRECTNESS_r*.json
history committed at the repo root, so the list can't drift from the
evidence again.
"""

from __future__ import annotations

import glob
import json
import pathlib

from data_engineer_development_spark import queries as qreg

REPO_ROOT = pathlib.Path(__file__).resolve().parent.parent
WINDOW = 50


def _driver_history() -> dict[str, bool]:
    """Map query name -> latest driver verdict (True = green)."""
    latest: dict[str, tuple[int, bool]] = {}
    for path in glob.glob(str(REPO_ROOT / "CORRECTNESS_r*.json")):
        rnd = int(path.rsplit("_r", 1)[1].split(".")[0])
        data = json.loads(pathlib.Path(path).read_text())
        rows = data.get("queries", data)
        for name, row in rows.items():
            if not isinstance(row, dict):
                continue
            green = row.get("hash_match")
            if green is None:  # rows-only (no-oracle) entries
                green = row.get("rows_match")
            if name not in latest or rnd > latest[name][0]:
                latest[name] = (rnd, bool(green))
    return {k: v[1] for k, v in latest.items()}


def test_front_is_window_sized_and_duplicate_free():
    assert len(qreg._FRONT) == WINDOW
    assert len(set(qreg._FRONT)) == len(qreg._FRONT)


def test_every_unproven_entry_is_inside_the_driver_window():
    history = _driver_history()
    if not history:  # fresh clone without driver artifacts
        return
    head = list(qreg.all_queries().keys())[:WINDOW]
    needs_evidence = [
        name
        for name in qreg.all_queries()
        if name not in history or not history[name]
    ]
    outside = [n for n in needs_evidence if n not in head]
    assert not outside, (
        "registry entries with no green driver row are outside the "
        f"50-slot window head and will never be checked: {outside}"
    )


def test_queries_and_oracles_share_ordering():
    q = list(qreg.all_queries().keys())
    o = list(qreg.all_oracles().keys())
    # oracles may be a subset (rows-only entries), but the shared prefix
    # ordering must agree — the driver pairs them positionally by key.
    assert [k for k in q if k in set(o)] == o
