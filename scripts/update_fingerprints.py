"""Maintain FINGERPRINTS.json: each query's source fingerprint AS OF
its latest driver-green round (VERDICT r7 #1).

Run at ROUND START, right after the driver's new CORRECTNESS_r{N}.json
lands (the tree at round start IS round N's freeze tree, so current
fingerprints are exact for round-N greens; older rounds are recovered
from git worktrees at their `round N:` commits). __spark_entry__'s
audit rotation compares these recorded fingerprints against the
current tree and ranks CHANGED queries first, so a query rewritten in
round N gets fresh driver evidence in round N+1 instead of shipping
on a stale green row.

Idempotent and incremental: a name is recomputed only when its
last-green round moved or it has no record yet.

Usage: python scripts/update_fingerprints.py
"""

from __future__ import annotations

import glob
import json
import os
import re
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(REPO, "FINGERPRINTS.json")


def last_green_rounds() -> dict[str, int]:
    last: dict[str, int] = {}
    for path in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        rnd = int(m.group(1)) if m else 0
        try:
            data = json.load(open(path))
        except (OSError, ValueError):
            continue
        for name, row in data.items():
            base = re.sub(r"^(zz_|a0_)", "", name)
            if isinstance(row, dict) and row.get("hash_match") is True:
                last[base] = max(last.get(base, 0), rnd)
    return last


def round_commits() -> dict[int, str]:
    out = subprocess.run(
        ["git", "log", "--format=%H %s"], cwd=REPO, capture_output=True, text=True
    ).stdout
    commits: dict[int, str] = {}
    for line in out.splitlines():
        sha, _, subject = line.partition(" ")
        m = re.match(r"round (\d+): verdict", subject)
        if m:
            commits.setdefault(int(m.group(1)), sha)
    return commits


def dump_tree(tree: str) -> dict[str, str]:
    """Fingerprints of a tree, via a fresh interpreter (so the tree's
    own package is the one imported, never the current repo's)."""
    res = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "dump_fingerprints.py"), tree],
        capture_output=True,
        text=True,
        cwd=tempfile.gettempdir(),
    )
    if res.returncode != 0:
        raise RuntimeError(f"dump failed for {tree}:\n{res.stderr[-2000:]}")
    try:
        return json.loads(res.stdout)
    except ValueError as exc:
        # a historical tree whose import writes to stdout corrupts the
        # JSON — tolerate per-round like any other dump failure
        raise RuntimeError(
            f"dump for {tree} wrote non-JSON stdout ({exc}): "
            f"{res.stdout[:200]!r}"
        ) from None


def main() -> None:
    last = last_green_rounds()
    commits = round_commits()
    try:
        existing = json.load(open(OUT))
    except (OSError, ValueError):
        existing = {"meta": {}, "queries": {}}
    records: dict[str, dict] = dict(existing.get("queries", {}))

    need_by_round: dict[int, list[str]] = {}
    for name, rnd in last.items():
        rec = records.get(name)
        if rec and rec.get("round") == rnd and rec.get("fp"):
            continue
        need_by_round.setdefault(rnd, []).append(name)

    for rnd, names in sorted(need_by_round.items()):
        sha = commits.get(rnd)
        if sha is None:
            print(f"round {rnd}: no `round {rnd}: verdict` commit; "
                  f"skipping {len(names)} names", file=sys.stderr)
            continue
        wt = os.path.join(tempfile.gettempdir(), f"fp_worktree_r{rnd}")
        subprocess.run(
            ["git", "worktree", "remove", "--force", wt],
            cwd=REPO, capture_output=True,
        )
        add = subprocess.run(
            ["git", "worktree", "add", "--force", "--detach", wt, sha],
            cwd=REPO, capture_output=True, text=True,
        )
        if add.returncode != 0:
            print(f"round {rnd}: worktree failed: {add.stderr}", file=sys.stderr)
            continue
        try:
            fps = dump_tree(wt)
        except RuntimeError as exc:
            # tolerated: the name stays unrecorded (fp null) and the
            # rotation falls back to pure staleness ranking for it
            print(exc, file=sys.stderr)
            fps = {}
        finally:
            subprocess.run(
                ["git", "worktree", "remove", "--force", wt],
                cwd=REPO, capture_output=True,
            )
        for name in names:
            records[name] = {"round": rnd, "fp": fps.get(name)}
        hit = sum(1 for n in names if fps.get(n))
        print(f"round {rnd} ({sha[:8]}): {hit}/{len(names)} fingerprinted")

    payload = {
        "meta": {
            "through_round": max(last.values(), default=0),
            "algo": "closure-v1",
            "note": "source fingerprint of each query at its latest "
                    "driver-green round; maintained by "
                    "scripts/update_fingerprints.py (run at round start)",
        },
        "queries": {n: records[n] for n in sorted(records)},
    }
    with open(OUT, "w") as f:
        json.dump(payload, f, indent=1, sort_keys=True)
        f.write("\n")
    print(f"wrote {OUT}: {len(records)} names through round "
          f"{payload['meta']['through_round']}")


if __name__ == "__main__":
    main()
