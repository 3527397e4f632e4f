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


def build_io_struct(
    type_name: Column | str,
    address_string: Column | str,
    multisig_addresses: Column | str,
    value: Column | str,
) -> Column:
    """Derive the `tx_input_output` struct from FLAT columns — the
    engine-side equivalent of `tx_io_summary` (reference:
    blocksci_export.py:348-349): dictionary-encode the script-type name
    (A10), render the address per the type CASE (A9), carry the satoshi
    value as bigint. All codegen'd column expressions, no UDF."""
    tn = F.col(type_name) if isinstance(type_name, str) else type_name
    a = F.col(address_string) if isinstance(address_string, str) else address_string
    m = (
        F.col(multisig_addresses)
        if isinstance(multisig_addresses, str)
        else multisig_addresses
    )
    v = F.col(value) if isinstance(value, str) else value
    code = address_type_code(tn)
    return F.struct(
        render_address(code, a, m).alias("address"),
        v.cast("long").alias("value"),
        code.alias("address_type"),
    )
