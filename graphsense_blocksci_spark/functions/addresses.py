"""Address rendering and type dictionary encoding.

Reproduces `addr_str` (reference: blocksci_export.py:318-329) and the
`address_type` enum map (reference: blocksci_export.py:22-33) as native
column expressions — a CASE over the 10 script types:

- multisig (6)                      -> the list of constituent addresses
- nonstandard / nulldata /
  witness_unknown (1, 7, 10)        -> NULL
- everything else                   -> singleton list [address_string]
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from graphsense_blocksci_spark.schemas import (
    ADDRESS_TYPES,
    MULTISIG_TYPE_CODE,
    NULL_ADDRESS_TYPE_CODES,
)


def address_type_code(type_name: Column | str) -> Column:
    """Dictionary-encode a script-type name to its smallint code.

    A literal CASE expression (10 branches) — stays in codegen; no join,
    no UDF. Equivalent to a broadcast join against a 10-row dim table but
    cheaper (reference: blocksci_export.py:22-33).
    """
    c = F.col(type_name) if isinstance(type_name, str) else type_name
    items = list(ADDRESS_TYPES.items())
    expr = F.when(c == items[0][0], F.lit(items[0][1]))
    for name, code in items[1:]:
        expr = expr.when(c == name, F.lit(code))
    return expr.otherwise(F.lit(None)).cast("smallint")


def render_address(
    address_type: Column, address_string: Column, multisig_addresses: Column
) -> Column:
    """CASE over address type producing the `address` array column
    (reference: blocksci_export.py:318-329)."""
    return (
        F.when(address_type == MULTISIG_TYPE_CODE, multisig_addresses)
        .when(address_type.isin(*NULL_ADDRESS_TYPE_CODES), F.lit(None))
        .otherwise(F.array(address_string))
    )
