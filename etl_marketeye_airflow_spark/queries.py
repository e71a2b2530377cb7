"""Query registry — the driver-facing catalog of implemented operators.

Thin aggregator (r11): shared helpers + oracle-parity conventions live
in ``_registry_base`` (see its header docstring for the float/decimal
discipline), and the 205 queries live in per-band modules
(queries_etl, queries_dedup_text, ...).  Importing THIS module imports
them all, so ``QUERIES``/``ORACLES`` are complete here and every
pre-split attribute (helpers, query functions, sweep machinery) is
still reachable as ``queries.<name>``.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from . import _registry_base as _B

globals().update({k: v for k, v in vars(_B).items() if not k.startswith("__")})

from . import (  # noqa: E402,F401  (registration imports, band order)
    queries_etl,
    queries_dedup_text,
    queries_streaming_ann,
    queries_sampling_corpus,
    queries_tpch_suite,
    queries_temporal_selection,
    queries_sketches_graph,
    queries_reports,
    queries_graph_drift,
    queries_stats_quality,
    queries_assembly,
)

# re-export every registered query function (external code references
# e.g. ``registry.q01_brand_price_summary`` directly)
globals().update({fn.__name__: fn for fn in QUERIES.values()})  # noqa: F821

# Driver-sweep ordering — EXPLICIT ROTATION CONTRACT (documented, not a
# hidden re-sort): the external driver records at most ~50 correctness rows
# per round against a 200+-entry registry, so a fixed numeric order would
# leave the tail permanently unverified.  The registry therefore emits
# queries in RISK order (r9 change-aware upgrade; the r8 verdict's top
# item — a staleness-only order is blind to "edited since last check"):
#
#   tier 0  red at its last driver check (a claimed fix must be confirmed
#           before anything else gets budget — the q87 case)
#   tier 1  never driver-checked (brand-new queries)
#   tier 2  NARROW-changed: the query function's source or its oracle SQL
#           text changed since the code state the driver last checked
#   tier 3  DEP-changed: only a package module the function references
#           (operators/… etc.) changed since that check
#   tier 4  unchanged since its last check
#
# within each tier: oldest last-checked round first, then numeric.
# "Since the driver last checked" is exact, not heuristic: the digest of
# each query AT its last check is rebuilt from git history by
# `tools/stamp_digests.py` (the driver's round-N commit contains exactly
# the code the round-N sweep ran against) into `tools/sweep_stamps.json`,
# and compared here against the digest of the CURRENT tree
# (`sweep_digest.query_digest`).  A missing/stale/unparseable stamp file
# degrades that query (or all of them) to tier 2 — the fail direction is
# over-re-checking, never letting an edited query ride a green verdict.
# If no correctness file is readable the order is plain numeric —
# deterministic either way given the repo state.  Local tooling
# (bench.py, check_correctness) iterates in numeric order regardless, so
# this affects ONLY the capped external sweep's budget allocation.
def _sweep_key_sets() -> tuple[frozenset, frozenset, dict]:
    """(keys in ANY CORRECTNESS_r*.json, keys whose MOST RECENT
    appearance was a failure, {key: newest round containing it})."""
    import glob
    import json
    import os
    import re

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    files = sorted(glob.glob(os.path.join(root, "CORRECTNESS_r*.json")))
    ever: set = set()
    last_row: dict = {}  # key -> its row in the newest file containing it
    last_round: dict = {}
    for path in files:
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        try:
            with open(path) as f:
                data = json.load(f)
        except (OSError, ValueError):
            continue
        ever |= set(data)
        last_row.update(data)
        if m:
            n = int(m.group(1))
            for k in data:
                last_round[k] = max(last_round.get(k, 0), n)

    def _failed(row) -> bool:
        if not isinstance(row, dict):
            return False
        return bool(row.get("err")) or not (
            row.get("rows_match", True)
            and row.get("schema_match", True)
            and row.get("hash_match", True)
        )

    red = frozenset(k for k, r in last_row.items() if _failed(r))
    return frozenset(ever), red, last_round


_EVER_SWEPT, _LAST_RED, _LAST_ROUND = _sweep_key_sets()


def _load_stamps() -> dict:
    import json
    import os

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    try:
        with open(os.path.join(root, "tools", "sweep_stamps.json")) as f:
            data = json.load(f)
        return data if isinstance(data, dict) else {}
    except (OSError, ValueError):
        return {}


def _current_digests() -> tuple[dict, dict]:
    """{name: full digest}, {name: narrow digest} for the CURRENT tree.
    Any failure yields empty maps → every checked query sorts tier 2
    (over-re-check, the safe direction)."""
    import inspect
    import os

    try:
        from . import sweep_digest
    except ImportError:
        return {}, {}
    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    cache: dict = {}
    full: dict = {}
    narrow: dict = {}
    for name, fn in QUERIES.items():
        try:
            src = inspect.getsource(fn)
        except (OSError, TypeError):
            continue
        orc = ORACLES.get(name, "")
        try:
            full[name] = sweep_digest.query_digest(src, orc, pkg_dir, cache)
            narrow[name] = sweep_digest.query_digest(
                src, orc, pkg_dir, cache, include_deps=False
            )
        except Exception:
            continue
    return full, narrow


_STAMPS = _load_stamps()
_CUR_FULL, _CUR_NARROW = _current_digests()


def _qnum(name: str) -> int:
    import re

    m = re.match(r"q(\d+)", name)
    return int(m.group(1)) if m else 999


def _sweep_order(name: str) -> tuple[int, int, int]:
    import os

    if os.environ.get("SPARK_GRAFT_SWEEP_ORDER") == "numeric":
        return (0, 0, _qnum(name))
    last_round = _LAST_ROUND.get(name, -1)
    if name in _LAST_RED:
        tier = 0
    elif name not in _EVER_SWEPT:
        tier = 1
    else:
        stamp = _STAMPS.get(name)
        cur_n = _CUR_NARROW.get(name)
        cur_f = _CUR_FULL.get(name)
        # A stamp OLDER than the newest green correctness round is fine:
        # the artifact itself proves the check happened, and the digest
        # comparison below detects any code drift since the stamp round
        # (r10 verdict task 1 — the driver drops CORRECTNESS_r{N}.json
        # AFTER the final commit, so requiring equality forced a manual
        # re-stamp every round that could structurally never keep up).
        # A stamp NEWER than every correctness round means an artifact
        # disappeared — over-re-check (tier 2), the safe direction.
        if (
            not isinstance(stamp, dict)
            or not isinstance(stamp.get("round"), int)
            or stamp.get("round") > last_round
            or cur_n is None
            or stamp.get("narrow") in (None, "UNKNOWN")
            or stamp.get("narrow") != cur_n
        ):
            tier = 2
        elif stamp.get("digest") != cur_f:
            tier = 3
        else:
            tier = 4
    return (tier, last_round, _qnum(name))


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {k: QUERIES[k] for k in sorted(QUERIES, key=_sweep_order)}


def oracle_sql() -> dict[str, str]:
    return {k: ORACLES[k] for k in sorted(ORACLES, key=_sweep_order)}
