"""Explicit hot-key salting for equi-joins (the north rule's "salted
broadcast hash joins to absorb hot-ASN skew").

The engine's first line of defense against skew is structural: entity
linking computes deterministic ids instead of joining
(framework.py:113-143), and AQE skew-join splitting is on for every
session (session.py:40). But AQE only splits what it can SEE — a
sort-merge join whose hot partition is detected at runtime — and cannot
help when the hot key must stay co-resident for a later stage, or when
the join is already broadcast and the skew lands on the post-join
aggregation's shuffle. For those, the classic explicit fix is key
salting:

- every LEFT (fact) row gets a deterministic salt in [0, n_salts) hashed
  from its own column values (never a random() or a
  monotonically_increasing_id — task retries must re-derive the same
  salt, or a lost executor silently duplicates/loses rows at scale);
- the RIGHT (dimension) side is replicated n_salts times, one copy per
  salt value;
- the join key becomes (key, salt): a key with 10^8 hot rows now spreads
  over n_salts shuffle partitions instead of one straggler task.

The replicated dimension is still a dimension: at n_salts=8 a 100 MB
node dictionary becomes 800 MB spread across the same executors — small
enough that Catalyst usually still broadcasts it, which is literally the
"salted broadcast hash join" the north star names (zero shuffle on the
fact side, and the salt then spreads the POST-join groupBy shuffle).
With broadcast disabled (or a too-big dimension) the same plan degrades
to a sort-merge join on (key, salt), which is exactly the skew-split
shape AQE would have tried to discover — guaranteed here by
construction.

Reference behavior this maps to: the reference absorbs hot-ASN fan-in
(a handful of ASes carry a large share of all RIS/IHR/PeeringDB links,
modeled by fixtures_spark._zipf_asn) inside Neo4j's batched UNWIND
writes (iyp/__init__.py:326-446) — single-node, so skew only costs it
memory. A 1000-executor shuffle has no such luxury; the salt is how the
same workload stays balanced.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SALT = "_salt"


def salted_equi_join(
    left: DataFrame,
    right: DataFrame,
    left_on: str,
    right_on: str,
    n_salts: int = 8,
    how: str = "inner",
    salt_src: list[str] | None = None,
) -> DataFrame:
    """Equi-join ``left`` (large, possibly hot-keyed) with ``right``
    (dimension) on ``left_on = right_on``, salted ``n_salts`` ways.

    Result equals ``left.join(right, left[left_on] == right[right_on],
    how)`` row-for-row — salting is a physical rebalance, never a
    semantic change. ``how`` is limited to inner/left/left_semi/
    left_anti: each left row carries exactly one salt so left-side
    semantics survive replication, while right/full joins would emit
    unmatched RIGHT rows once per replica (n_salts duplicates) and are
    refused.

    ``salt_src`` names the left columns hashed into the salt (default:
    all of them). Determinism matters: the salt must be a pure function
    of row VALUES so a retried task re-derives identical salts.
    """
    allowed = {"inner", "left", "leftouter", "left_outer", "semi",
               "leftsemi", "left_semi", "anti", "leftanti", "left_anti"}
    if how.lower() not in allowed:
        raise ValueError(
            f"salted_equi_join supports left-sided joins only, got {how!r}: "
            "unmatched right rows would appear once per salt replica")
    if n_salts < 1:
        raise ValueError(f"n_salts must be >= 1, got {n_salts}")
    for c in (left.columns, right.columns):
        if _SALT in c:
            raise ValueError(f"column {_SALT!r} already exists")

    src = salt_src if salt_src is not None else left.columns
    l_salted = left.withColumn(
        _SALT,
        F.pmod(F.xxhash64(*[F.col(c) for c in src]), F.lit(n_salts))
        .cast("int"),
    )
    # one dimension copy per salt value; sequence+explode stays in codegen
    r_salted = right.withColumn(
        _SALT,
        F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1))),
    )
    cond = (l_salted[left_on] == r_salted[right_on]) & (
        l_salted[_SALT] == r_salted[_SALT]
    )
    out = l_salted.join(r_salted, cond, how)
    # semi/anti joins return left columns only — _SALT remains on those
    return out.drop(_SALT)
