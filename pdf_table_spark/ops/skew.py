"""Explicit skew mitigation for joins — salting (SURVEY §4: AQE's
skew-join split handles sort-merge joins it can see; salting is the
explicit fallback when a handful of hot keys would pin single tasks,
e.g. joining span fragments against a per-domain metadata table where
one domain owns half the corpus).

``salted_join``: the big (skewed) side gets a deterministic salt in
[0, salt); the small side is replicated salt times; the join key
becomes (key, salt), splitting each hot key's rows across ``salt``
tasks. Semantics identical to the plain inner join (tested); cost is
replicating the small side, which is what broadcast would do anyway —
use this when the small side is too big to broadcast but small enough
to replicate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(big: DataFrame, small: DataFrame, key: str,
                salt: int = 16, how: str = "inner") -> DataFrame:
    """Inner/left join ``big ⋈ small`` on ``key`` with hot keys split
    ``salt`` ways. Deterministic (hash salt, not random) so retries and
    resumed runs produce identical partitioning.

    Only 'inner' and 'left' are supported: the replicate-small scheme
    would emit unmatched small-side rows ``salt`` times under right /
    full outer joins."""
    if salt < 1:
        raise ValueError(f"salt must be >= 1, got {salt}")
    if how not in ("inner", "left", "left_outer", "leftouter"):
        raise ValueError(
            f"salted_join supports inner/left joins only, got {how!r}")
    salted_big = big.withColumn(
        "__salt", F.pmod(F.xxhash64(*big.columns), F.lit(salt)))
    # replicate via explode — narrow, whole-stage-codegen'd; the
    # crossJoin(range(salt)) alternative plans a (cheap but alarming)
    # BroadcastNestedLoopJoin node for the same rows.
    # SHUFFLE_HASH hint: salting presupposes the SHUFFLED join regime
    # (the whole point is spreading a hot key over `salt` reduce
    # tasks); left to its own devices the planner happily BROADCASTS
    # the replicated small side, which builds `salt` copies of it
    # into one hash relation on every executor — the skew splitting
    # becomes a no-op and the broadcast build dominates (measured 2x
    # the whole query at sf0.1). The hint pins the per-partition hash
    # build salting is designed around; each build is 1/salt-th of
    # the replicated side, strictly smaller than the broadcast the
    # planner would have built.
    replicated_small = small.withColumn(
        "__salt", F.explode(F.expr(
            f"sequence(0L, {int(salt) - 1}L)"))).hint("shuffle_hash")
    out = salted_big.join(replicated_small, [key, "__salt"], how)
    return out.drop("__salt")
