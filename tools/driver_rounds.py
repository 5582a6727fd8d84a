"""Per-entry driver-verification provenance.

The driver's CORRECTNESS_r{N}.json checks only the FIRST 50 registry
entries each round, so most of the 270+ entries rely on the committed
local replica between driver visits.  This tool derives, for every
current ``queries()`` entry, the most recent round in which the DRIVER
itself recorded a green row (rows+schema+hash match, no err; 0 = never
driver-checked), and writes the map to ``DRIVER_ROUNDS.json``.  The
round-5 window rotation in ``_build_registry`` front-loads the stalest
entries from this map.

Usage: python tools/driver_rounds.py   (writes DRIVER_ROUNDS.json)
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def last_driver_rounds() -> dict[str, int]:
    import __spark_entry__ as entrymod

    last: dict[str, int] = {}
    for path in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if not m:
            continue
        rnd = int(m.group(1))
        with open(path) as f:
            rows = json.load(f)
        for name, v in rows.items():
            ok = (v.get("rows_match") and v.get("schema_match")
                  and v.get("hash_match") in (True, None)
                  and not v.get("err"))
            if ok:
                last[name] = max(last.get(name, 0), rnd)
    return {k: last.get(k, 0) for k in entrymod.queries()}


def main() -> None:
    rounds = last_driver_rounds()
    out = os.path.join(REPO, "DRIVER_ROUNDS.json")
    with open(out, "w") as f:
        json.dump(rounds, f, indent=0, sort_keys=True)
    by = {}
    for v in rounds.values():
        by[v] = by.get(v, 0) + 1
    print(f"{len(rounds)} entries -> {out}; last-driver-round histogram: "
          f"{dict(sorted(by.items()))} (0 = never driver-checked)")


if __name__ == "__main__":
    main()
