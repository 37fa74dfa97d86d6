"""Machine-readable sweep outputs: summary.csv + summary.json.

Byte-level behavior mirrors the reference's save_results
(step03 run_layered_sweep.py:1161-1177): union of keys across rows for the
CSV header, and a JSON encoder mapping NaN -> null (:1174-1176).
"""

from __future__ import annotations

import csv
import json
import math
from pathlib import Path


class _NanToNullEncoder(json.JSONEncoder):
    def iterencode(self, o, _one_shot=False):
        return super().iterencode(_sanitize(o), _one_shot)


def _sanitize(o):
    if isinstance(o, float) and not math.isfinite(o):
        return None
    if isinstance(o, dict):
        return {k: _sanitize(v) for k, v in o.items()}
    if isinstance(o, (list, tuple)):
        return [_sanitize(v) for v in o]
    return o


def save_results(rows, out_dir, *, stem="summary"):
    """Write rows (list of dicts) to out_dir/{stem}.csv and .json."""
    out_dir = Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    if not rows:
        return
    keys: list[str] = []
    for r in rows:
        for k in r:
            if k not in keys:
                keys.append(k)
    with open(out_dir / f"{stem}.csv", "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=keys)
        w.writeheader()
        for r in rows:
            w.writerow(r)
    with open(out_dir / f"{stem}.json", "w") as f:
        json.dump(rows, f, indent=2, cls=_NanToNullEncoder)
    print(f"  results -> {out_dir / (stem + '.csv')}")
