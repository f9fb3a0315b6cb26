"""Regenerate ``_DRIVER_VERIFIED`` in plans/registry.py.

Run after each driver round writes ``CORRECTNESS_r{N}.json``:

    python scripts/regen_driver_verified.py > /tmp/dv.py

then paste the emitted block over the ``_DRIVER_VERIFIED_AS_OF = N``
and ``_DRIVER_VERIFIED = {...}`` literals.  A row is *clean* when
``err`` is None (strict hash row) or
``'no_oracle'`` (rows-only-by-design row); genuine harness errors do
not count as verification.  The value is the most recent clean round,
which drives the oldest-verified-first re-check rotation.

Policy (see registry.py): whenever a query's *plan* is rewritten, add
its name to ``_EVICTED`` by hand — its external row verified the old
plan, so it must rotate back to the front of the driver window until a
fresh CORRECTNESS row lands (then remove it from ``_EVICTED``; this
script will have picked up the new round number).
"""

from __future__ import annotations

import glob
import json
import os

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def last_clean_rounds(root: str = ROOT,
                      max_round: int | None = None) -> dict[str, int]:
    last: dict[str, int] = {}
    for path in sorted(glob.glob(os.path.join(root, "CORRECTNESS_r*.json"))):
        rnd = int(os.path.basename(path).split("_r")[1].split(".")[0])
        if max_round is not None and rnd > max_round:
            continue
        for name, row in json.load(open(path)).items():
            if row.get("err") in (None, "no_oracle"):
                last[name] = max(last.get(name, 0), rnd)
    return last


def latest_round(root: str = ROOT) -> int:
    rounds = [int(os.path.basename(p).split("_r")[1].split(".")[0])
              for p in glob.glob(os.path.join(root, "CORRECTNESS_r*.json"))]
    return max(rounds) if rounds else 0


if __name__ == "__main__":
    last = last_clean_rounds()
    print(f"_DRIVER_VERIFIED_AS_OF = {latest_round()}")
    print("_DRIVER_VERIFIED = {")
    for name in sorted(last):
        print(f'    "{name}": {last[name]},')
    print("}")
