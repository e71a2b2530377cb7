"""Rebuild ``tools/sweep_stamps.json`` — per-query digests AT THE LAST
DRIVER CHECK — deterministically from git history.

The driver's round-N commit ("round N: verdict/advice/correctness/bench")
contains exactly the code the round-N correctness sweep ran against, so
the digest-at-check of a query last checked in round N is computable by
extracting ``etl_marketeye_airflow_spark/`` at that commit and applying
the CURRENT digest logic (``sweep_digest.py``) to it.  No "run before
editing" contract: this tool is idempotent and reproducible from the
repo state at any time — run it once per round (any time after the
driver drops CORRECTNESS_r{N}.json, before the final commit).

Output: tools/sweep_stamps.json  {name: {"round": N, "digest": "…"}}
Queries absent from the round-N registry (renamed since) get digest
"UNKNOWN", which the sweep order treats as changed.

Usage:
    python tools/stamp_digests.py            # rebuild stamps + summary
    python tools/stamp_digests.py --extract DIR   # internal: print
        {name: digest} JSON for the package tree under DIR
"""

from __future__ import annotations

import glob
import json
import os
import re
import subprocess
import sys
import tempfile
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
PKG = "etl_marketeye_airflow_spark"


def _load_digest_module():
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "_sweep_digest_current", str(ROOT / PKG / "sweep_digest.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def extract_digests(tree_root: str) -> dict:
    """Import the queries registry under ``tree_root`` and digest every
    entry with the CURRENT digest logic."""
    import importlib
    import inspect

    sys.path.insert(0, tree_root)
    try:
        q = importlib.import_module(PKG + ".queries")
    finally:
        sys.path.pop(0)
    dig = _load_digest_module()
    pkg_dir = os.path.join(tree_root, PKG)
    cache: dict = {}
    out = {}
    for name, fn in q.QUERIES.items():
        try:
            src = inspect.getsource(fn)
        except OSError:
            out[name] = {"digest": "UNKNOWN", "narrow": "UNKNOWN"}
            continue
        orc = q.ORACLES.get(name, "")
        out[name] = {
            "digest": dig.query_digest(src, orc, pkg_dir, cache),
            "narrow": dig.query_digest(src, orc, pkg_dir, cache, include_deps=False),
        }
    return out


def last_check_rounds() -> dict:
    """{query: newest round whose CORRECTNESS file contains it}."""
    rounds: dict = {}
    for path in sorted(glob.glob(str(ROOT / "CORRECTNESS_r*.json"))):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if not m:
            continue
        n = int(m.group(1))
        try:
            with open(path) as f:
                data = json.load(f)
        except (OSError, ValueError):
            continue
        for k in data:
            rounds[k] = max(rounds.get(k, 0), n)
    return rounds


def round_commit(n: int) -> str | None:
    """The commit that added CORRECTNESS_r{n}.json (the driver's round-n
    commit — its tree is what the round-n sweep checked)."""
    for fname in (f"CORRECTNESS_r{n:02d}.json", f"CORRECTNESS_r{n}.json"):
        out = subprocess.run(
            ["git", "log", "--diff-filter=A", "--format=%H", "--", fname],
            cwd=ROOT, capture_output=True, text=True,
        ).stdout.strip()
        if out:
            return out.splitlines()[0]
    return None


def digests_at_round(n: int) -> dict:
    commit = round_commit(n)
    if commit is None:
        return {}
    with tempfile.TemporaryDirectory() as tmp:
        # Archive only the package (old commits may track huge probe
        # parquet elsewhere in the tree).
        tar = subprocess.run(
            ["git", "archive", commit, PKG], cwd=ROOT, capture_output=True,
        )
        if tar.returncode != 0:
            return {}
        subprocess.run(["tar", "-x", "-C", tmp], input=tar.stdout, check=True)
        env = dict(os.environ, PYTHONPATH="")
        proc = subprocess.run(
            [sys.executable, __file__, "--extract", tmp],
            capture_output=True, text=True, env=env, cwd=str(ROOT),
        )
        if proc.returncode != 0:
            print(f"  round {n} ({commit[:10]}): extract FAILED\n{proc.stderr[-2000:]}",
                  file=sys.stderr)
            return {}
        return json.loads(proc.stdout)


def main() -> int:
    if len(sys.argv) == 3 and sys.argv[1] == "--extract":
        print(json.dumps(extract_digests(sys.argv[2])))
        return 0

    rounds = last_check_rounds()
    if not rounds:
        print("no CORRECTNESS files — nothing to stamp")
        return 1
    by_round: dict = {}
    for name, n in rounds.items():
        by_round.setdefault(n, []).append(name)

    stamps = {}
    for n in sorted(by_round):
        digs = digests_at_round(n)
        hit = sum(1 for q in by_round[n] if q in digs)
        print(f"round {n}: {len(by_round[n])} queries last checked; "
              f"{hit} digests from the round-{n} tree")
        for q in by_round[n]:
            d = digs.get(q, {"digest": "UNKNOWN", "narrow": "UNKNOWN"})
            stamps[q] = {"round": n, "digest": d["digest"], "narrow": d["narrow"]}

    out_path = ROOT / "tools" / "sweep_stamps.json"
    with open(out_path, "w") as f:
        json.dump({k: stamps[k] for k in sorted(stamps)}, f, indent=1, sort_keys=True)
        f.write("\n")
    print(f"wrote {out_path} ({len(stamps)} stamps)")

    # Summary: compare against CURRENT digests → the changed set.
    cur = extract_digests(str(ROOT))

    def _key(s):
        m = re.match(r"q(\d+)", s)
        return int(m.group(1)) if m else 999

    narrow = sorted(
        (q for q in stamps
         if q not in cur or stamps[q]["narrow"] != cur[q]["narrow"]),
        key=_key,
    )
    dep_only = sorted(
        (q for q in stamps
         if q in cur and stamps[q]["narrow"] == cur[q]["narrow"]
         and stamps[q]["digest"] != cur[q]["digest"]),
        key=_key,
    )
    print(f"narrow-changed (fn/oracle) since last driver check: {len(narrow)}")
    for q in narrow:
        print(f"  {q} (last checked r{stamps[q]['round']})")
    print(f"dep-only-changed (referenced module): {len(dep_only)}")
    for q in dep_only:
        print(f"  {q} (last checked r{stamps[q]['round']})")
    return 0


if __name__ == "__main__":
    sys.exit(main())
