"""Registry-vs-ledger invariant (r7 verdict task #3): every registered
query must carry driver signal — either a row in some committed
CORRECTNESS_r*/SELFCHECK_r*.json artifact, or a slot inside the
driver's first-50 window so the CURRENT round will produce one.

This is how `silhouette_score` slipped in round 7: registered late,
never rotated into `_DRIVER_PRIORITY`, zero driver rows for a full
round. A late registration now fails this test until it is either
rotated into the window or swept into a committed SELFCHECK artifact.

Pure-ledger test: reads the registry and the JSON artifacts, starts
no SparkSession.
"""

from __future__ import annotations

import glob
import json
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DRIVER_WINDOW = 50


def _ledger_names() -> set[str]:
    names: set[str] = set()
    for path in glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json")) + glob.glob(
        os.path.join(REPO, "SELFCHECK_r*.json")
    ):
        with open(path) as f:
            data = json.load(f)
        # CORRECTNESS files map name -> row dict; SELFCHECK files nest
        # the same mapping under "results".
        rows = data.get("results", data)
        names.update(k for k in rows if isinstance(rows[k], (dict, str)))
    return names


def test_every_registered_query_has_driver_signal():
    from resume_jd_matcher_spark import queries as Q

    registered = list(Q.queries().keys())
    window = set(registered[:DRIVER_WINDOW])
    ledger = _ledger_names()

    orphans = [n for n in registered if n not in ledger and n not in window]
    assert not orphans, (
        f"{len(orphans)} registered queries have no committed driver "
        f"signal AND sit outside the first-{DRIVER_WINDOW} window — "
        f"rotate them into _DRIVER_PRIORITY or run the SELFCHECK sweep: "
        f"{orphans}"
    )


def test_driver_priority_covers_the_window():
    """The explicit rotation list must fully determine the window —
    if it is shorter than 50, registry order silently decides the
    tail and the rotation policy stops being authoritative."""
    from resume_jd_matcher_spark import queries as Q

    assert len(Q._DRIVER_PRIORITY) >= min(DRIVER_WINDOW, len(Q.queries())), (
        "_DRIVER_PRIORITY no longer fills the driver's window; "
        "extend it so rotation stays explicit"
    )
