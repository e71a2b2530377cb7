"""Per-query change digests for the driver-sweep rotation (stdlib only).

The external driver records ~50 correctness rows per round against a
200+-entry registry, so emission order decides which queries get
re-verified.  A query edited AFTER its last driver check must re-enter
the sweep before merely-stale ones — the r8 verdict's one residual risk
was exactly this blind spot (26 queries changed in r8 whose last driver
check predated the change).

The digest of a query is sha256 over:

  * the query function's source text (``inspect.getsource`` — includes
    the decorator call, so inline oracle literals are covered), plus
  * the EVALUATED oracle SQL string (so edits to oracle-building helpers
    like ``_sql_str_out`` propagate even though the helper's source is
    not part of the function), plus
  * the raw file text of every package module the function references
    by a ``from .<pkg>.<mod> import`` / ``from .<pkg> import <mod>``
    statement inside its body (queries import operators locally, so an
    edit to e.g. ``operators/ranking.py`` flags its consumers).

KNOWN GAP (documented, fail-direction noted): a change to a shared
helper defined inside the registry itself (``_registry_base.py``, e.g.
``_str_decimals``) or
to the universal ``sources/tables.py`` loaders does NOT change its
consumers' digests — those edits are rare and reviewed; when they
happen, delete the affected entries from ``tools/sweep_stamps.json`` so
the queries sort as changed.  The failure direction of digest-logic
drift between the stamp file and sort time is over-flagging (queries
sort as changed and get re-checked), never under-flagging a real red.

This module must stay importable with NOTHING but the stdlib: the stamp
tool loads it standalone (``importlib`` by file path) and applies it to
historical git trees.
"""

from __future__ import annotations

import hashlib
import os
import re

# Sub-packages whose modules count as query dependencies when imported
# inside a query function's body.
_DEP_PKGS = ("operators", "streaming", "functions", "sources", "adapters", "sinks")

_FROM_SUBMOD = re.compile(
    r"from \.(%s)\.(\w+) import" % "|".join(_DEP_PKGS)
)
_FROM_PKG = re.compile(
    r"from \.(%s) import ([\w ,]+)" % "|".join(_DEP_PKGS)
)

# Names imported at queries.py module level that still pin a dependency
# worth fingerprinting when they appear in a function body.  (load_table
# / _t are deliberately excluded: every query uses them, and flagging
# the whole registry on a tables.py touch would blow the ~50-row sweep
# budget; see the KNOWN GAP note above.)
_NAME_DEPS = {
    "load_events": ("sources", "tables"),
    "load_events_stream": ("sources", "tables"),
    "drain_available_now": ("streaming", "ingest"),
}


def referenced_modules(fn_source: str, pkg_dir: str) -> list[str]:
    """Package-relative module paths the function source references."""
    mods: set = set()
    for pkg, mod in _FROM_SUBMOD.findall(fn_source):
        mods.add((pkg, mod))
    for pkg, names in _FROM_PKG.findall(fn_source):
        for name in (n.strip() for n in names.split(",")):
            # `from .operators import text as tx` → names == "text as tx"
            name = name.split(" as ")[0].strip()
            if name and os.path.isfile(os.path.join(pkg_dir, pkg, name + ".py")):
                mods.add((pkg, name))
    for name, dep in _NAME_DEPS.items():
        if re.search(r"\b%s\b" % re.escape(name), fn_source):
            mods.add(dep)
    return sorted("%s/%s.py" % m for m in mods)


def query_digest(
    fn_source: str,
    oracle: str,
    pkg_dir: str,
    _file_cache: dict | None = None,
    include_deps: bool = True,
) -> str:
    """16-hex-char digest of (function source, oracle SQL, referenced
    module file texts).  ``pkg_dir`` is the package directory holding
    ``operators/`` etc.; pass ``_file_cache`` (a dict) when digesting
    many queries to read each module file once.

    ``include_deps=False`` gives the NARROW digest (function source +
    oracle only) — a narrow mismatch means the query's own plan or
    oracle text changed since its last driver check (highest re-check
    priority); a full-only mismatch means just a referenced operator
    module changed (re-check, but after the narrow set when the sweep
    budget is tight)."""
    h = hashlib.sha256()
    h.update(fn_source.encode("utf-8", "replace"))
    h.update(b"\x00")
    h.update((oracle or "").encode("utf-8", "replace"))
    cache = _file_cache if _file_cache is not None else {}
    for rel in referenced_modules(fn_source, pkg_dir) if include_deps else ():
        if rel not in cache:
            try:
                with open(os.path.join(pkg_dir, rel), "rb") as f:
                    cache[rel] = f.read()
            except OSError:
                cache[rel] = b"<missing>"
        h.update(b"\x00")
        h.update(rel.encode())
        h.update(b"\x00")
        h.update(cache[rel])
    return h.hexdigest()[:16]
