"""Refresh tools/pin_manifest.json — REFUSING unpinned dirty queries.

Workflow (the mechanical form of the re-pin policy):

1. Edit engine code.
2. Run ``python tools/update_pin_manifest.py``. Any query whose
   fingerprint changed (or that is new) and is NOT in
   ``__spark_entry__._FRONT_PINS`` is listed and the manifest is NOT
   written — add those names to ``_FRONT_PINS`` first.
3. Re-run; the manifest is rewritten at the state the driver will check
   at round end.

``--force`` bypasses the pin check (bootstrap / post-driver-round
rotation when pins are being cleared for queries whose green rows just
landed).
"""

from __future__ import annotations

import json
import os
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
MANIFEST = os.path.join(HERE, "pin_manifest.json")

sys.path.insert(0, os.path.dirname(HERE))

from tools.pinfp import all_fingerprints  # noqa: E402


def main() -> int:
    force = "--force" in sys.argv
    current = all_fingerprints()
    old = {}
    if os.path.exists(MANIFEST):
        old = json.load(open(MANIFEST))

    from __spark_entry__ import _FRONT_PINS

    dirty = [n for n, fp in current.items() if old.get(n) != fp]
    unpinned = [n for n in dirty if n not in _FRONT_PINS]
    if unpinned and not force:
        print("REFUSED: fingerprint changed (or new) but not in _FRONT_PINS:")
        for n in unpinned:
            print(f"  - {n}" + ("  (new)" if n not in old else ""))
        print("Add them to __spark_entry__._FRONT_PINS, then re-run.")
        return 1

    with open(MANIFEST, "w") as f:
        json.dump(current, f, indent=0, sort_keys=True)
        f.write("\n")
    print(f"wrote {MANIFEST}: {len(current)} queries, {len(dirty)} updated")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
