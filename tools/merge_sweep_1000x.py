"""Merge the accumulated 1000×-rung records into one standing artifact.

r10 verdict ask 4: SWEEP_1000x_r09 (39 queries) + the r10 delta (9) + the
CS checksum record (5) + the billion-edge PageRank gate describe the rung
across four files, with "nothing regressed" left for the reader to
assemble. This tool folds every ``SWEEP_1000x_r*.json`` /
``SWEEP_1000x_CS_r*.json`` (newest round wins per query) plus the
``PAGERANK_GATE_1000x_r*.json`` self-consistency verdict into
``SWEEP_1000x_CURRENT.json``: per query — status, seconds, rows where
recorded, and the record-of-origin — so the ladder stays auditable as
deltas accumulate. Rerun after any new 1000× sweep; the output is
regenerated, never hand-edited.

Usage: python tools/merge_sweep_1000x.py
"""

from __future__ import annotations

import json
import re
from pathlib import Path

ROOT = Path(__file__).resolve().parents[1]


def merge() -> dict:
    merged: dict[str, dict] = {}
    sources: list[str] = []
    records: list[tuple[int, int, Path]] = []  # (round, cs_flag, path)
    for path in ROOT.glob("SWEEP_1000x_*.json"):
        m = re.fullmatch(r"SWEEP_1000x_(CS_)?r(\d+)\.json", path.name)
        if not m:
            continue  # skips CURRENT itself and foreign names
        # CS records re-verify the same round's battery with the checksum
        # fold; within a round they sort after the plain sweep (duals are
        # the stronger full-population verdict for their five queries).
        records.append((int(m.group(2)), 1 if m.group(1) else 0, path))
    for rnd, cs, path in sorted(records):
        data = json.loads(path.read_text())
        sources.append(path.name)
        for name, res in data.get("results", {}).items():
            merged[name] = {
                "status": res.get("status"),
                "sec": res.get("sec"),
                **({"rows": res["rows"]} if "rows" in res else {}),
                **({"note": res["note"]} if "note" in res else {}),
                "record": path.name,
            }
    # the billion-edge gate is r3_pagerank's 1000×+ verdict (no DuckDB —
    # exact replica-equivariance self-consistency, 8 checks)
    gates = sorted(ROOT.glob("PAGERANK_GATE_1000x_r*.json"))
    if gates:
        gate = json.loads(gates[-1].read_text())
        checks = gate.get("checks", {})
        merged["r3_pagerank"] = {
            "status": "PASS" if checks and all(checks.values()) else "FAIL",
            "sec": gate.get("wall_sec", {}).get("scaled"),
            "note": (
                f"billion-edge self-consistency gate, {len(checks)} checks, "
                f"{gate.get('scaled', {}).get('n_edges', '?')} edges"
            ),
            "record": gates[-1].name,
        }
        sources.append(gates[-1].name)
    statuses = [v["status"] for v in merged.values()]
    return {
        "rung": "1000x (key-shifted replication of sf0.1; tools/make_scaled_sf.py)",
        "what": (
            "latest 1000x verdict per query, merged from every committed "
            "1000x record — regenerate with tools/merge_sweep_1000x.py"
        ),
        "sources": sources,
        "queries": dict(sorted(merged.items())),
        "n": len(merged),
        "pass": statuses.count("PASS"),
        "fail": len(statuses) - statuses.count("PASS"),
    }


def main() -> int:
    out = merge()
    path = ROOT / "SWEEP_1000x_CURRENT.json"
    path.write_text(json.dumps(out, indent=1) + "\n")
    print(f"wrote {path.name}: {out['n']} queries, {out['pass']} PASS, "
          f"{out['fail']} FAIL (sources: {', '.join(out['sources'])})")
    return 0 if out["fail"] == 0 else 1


if __name__ == "__main__":
    raise SystemExit(main())
