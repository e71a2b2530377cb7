"""Incremental view maintenance: the join-delta identity.

q116 (operators used inline, queries.py) proves ALGEBRAIC-aggregate
maintenance: merge per-batch partials instead of rescanning history.
This module supplies the missing half for JOIN views — the classic IVM
delta rule (Blakeley et al. SIGMOD'86; every streaming/materialized-
view engine's core): for append-only deltas ΔA, ΔB,

    (A ∪ ΔA) ⋈ (B ∪ ΔB)  =  A ⋈ B  ∪  Δ(A ⋈ B)
    Δ(A ⋈ B)             =  ΔA ⋈ B  ∪  A ⋈ ΔB  ∪  ΔA ⋈ ΔB

so a stored view of A⋈B (or any algebraic aggregate over it) is
updated by joining only the DELTAS against the bases — never
re-executing the old⋈old join.  At the 100 TB posture that is the
difference between a daily batch touching 1% of the data and a daily
full recompute.

Exactness: the identity is a multiset equality — no floats involved.
Downstream aggregates stay exact under the repo's decimal-sum
discipline (CLAUDE.md conv 1), so the gate can prove maintained ≡
recomputed bit-for-bit (q148).

Reference scope: the reference recomputes its products table from all
scraped files every run (dags/marketeye_etl_dag.py daily batch); this
operator is the engine extension that makes that daily run incremental.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def delta_join(
    a_old: DataFrame,
    a_delta: DataFrame,
    b_old: DataFrame,
    b_delta: DataFrame,
    on: list[str] | str,
    broadcast_deltas: bool = True,
) -> DataFrame:
    """The inner-join DELTA frame Δ(A⋈B) = ΔA⋈B ∪ A⋈ΔB ∪ ΔA⋈ΔB for
    append-only deltas (no updates/deletes — those need the
    counting/Z-relation extension; fail-fast contract documented).

    Aggregating this frame with mergeable partials and combining with
    the stored view's partials (q116's merge) yields EXACTLY the
    recomputed view — the oracle-checked claim of q148.

    ``broadcast_deltas=True`` hints both delta sides as broadcast: the
    point of IVM is |Δ| ≪ |base|, so the two big-side joins (ΔA⋈B,
    A⋈ΔB) become map-side hash joins with NO shuffle of the base —
    each base is scanned once, shuffled never.  Set False when deltas
    are large (AQE then picks the strategy).

    Scale shape: three joins whose cost is |Δ|·selectivity, not |A|·|B|;
    the union is lazy (no materialization barrier) so a downstream
    map-side-combined aggregate consumes all three branches in one
    stage wave.
    """
    keys = [on] if isinstance(on, str) else list(on)
    da = F.broadcast(a_delta) if broadcast_deltas else a_delta
    db = F.broadcast(b_delta) if broadcast_deltas else b_delta
    part1 = da.join(b_old, on=keys, how="inner")
    part2 = a_old.join(db, on=keys, how="inner")
    part3 = da.join(b_delta, on=keys, how="inner")
    return part1.unionByName(part2).unionByName(part3)
