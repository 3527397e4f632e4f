"""CoinJoin detection as a native column expression.

The reference calls `blocksci.heuristics.is_coinjoin(tx)` (reference:
blocksci_export.py:365; schema.cql:32). The underlying algorithm is
BlockSci's published `isCoinjoin` heuristic (BlockSci C++ source,
src/heuristics/tx_identification.cpp; Kalodner et al., USENIX Security
2020) — a Meiklejohn-style participant-count test:

1. fewer than 2 inputs or fewer than 3 outputs  -> False
2. participantCount = (no_outputs + 1) // 2
3. participantCount > no_inputs                 -> False
4. participantCount > #distinct input addresses -> False
5. the most frequent output value must occur exactly participantCount
   times, and must not be one of the dust constants 546 / 2730 satoshi.

Implemented as pure array expressions (`size`/`transform`/`filter`/
`array_distinct`/`aggregate`) — no UDF, no shuffle; the per-row cost is
O(n_outputs * n_distinct_values), fine for real transaction fan-outs.

Divergence notes (both documented, both deterministic):
- when several values tie for the max count, BlockSci picks an
  unspecified one (unordered_map iteration order). We define the tie
  deterministically: condition 5 holds iff the max count equals
  participantCount AND no max-count value is dust.
- BlockSci counts one Address object per input regardless of type; we
  count distinct rendered identities `struct(address_type, address)`
  per input — multisig inputs stay ONE identity (not flattened into
  constituents) and NULL-rendered inputs (nonstandard/witness_unknown)
  still count, though several NULL-rendered inputs of the same type
  collapse to one identity (BlockSci would keep them distinct; the
  rendered row carries no further identity to distinguish them).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

DUST_VALUES = (546, 2730)


def is_coinjoin(inputs: Column | str, outputs: Column | str) -> Column:
    ins = F.col(inputs) if isinstance(inputs, str) else inputs
    outs = F.col(outputs) if isinstance(outputs, str) else outputs

    n_in = F.coalesce(F.size(ins), F.lit(0))
    n_out = F.coalesce(F.size(outs), F.lit(0))
    participants = F.floor((n_out + F.lit(1)) / F.lit(2)).cast("int")

    # Distinct input identities: one per input, keyed by the rendered
    # (address_type, address) pair — multisig is one identity, not its
    # flattened constituents; NULL-rendered inputs count too.
    input_identities = F.array_distinct(
        F.transform(
            F.coalesce(ins, F.array()),
            lambda x: F.struct(
                x["address_type"].alias("address_type"),
                x["address"].alias("address"),
            ),
        )
    )
    n_distinct_in_addrs = F.size(input_identities)

    out_values = F.transform(F.coalesce(outs, F.array()), lambda x: x["value"])
    distinct_values = F.array_distinct(out_values)
    # (value, frequency) pairs; O(n^2) over a per-tx array — cheap.
    value_counts = F.transform(
        distinct_values,
        lambda v: F.struct(
            v.alias("value"),
            F.size(F.filter(out_values, lambda x: x == v)).alias("cnt"),
        ),
    )
    max_count = F.array_max(F.transform(value_counts, lambda s: s["cnt"]))
    max_is_dust = F.exists(
        value_counts,
        lambda s: (s["cnt"] == max_count) & s["value"].isin(*DUST_VALUES),
    )

    return (
        (n_in >= 2)
        & (n_out >= 3)
        & (participants <= n_in)
        & (participants <= n_distinct_in_addrs)
        & (max_count == participants)
        & ~max_is_dust
    )
