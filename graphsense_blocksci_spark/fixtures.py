"""Deterministic synthetic mini-chain fixtures (FIXTURES.md §A).

Generates the three input tables the engine ingests — `raw_blocks`,
`raw_txs`, `raw_exchange_rates` — as parquet, with every edge case the
reference's behavior depends on:

- >=1 coinbase tx per block (empty inputs; blocksci_export.py coinbase flag)
- multisig outputs (multi-element address array, type 6)
- nulldata outputs (NULL address, type 7)
- duplicate tx_hash pairs with distinct tx_id (BIP30 last-write-wins test,
  reference: blocksci_export.py:466-473)
- coinjoin-shaped transactions (participant-count heuristic, SURVEY §2.B5)
- block timestamps straddling UTC day boundaries (previous-day cutoff test,
  reference: blocksci_export.py:540-553)
- non-coinbase inputs spend earlier outputs (UTXO join, SURVEY §2.B1) and
  sum(outputs) <= sum(inputs) with the difference as implied fee.

Pure Python + pyarrow (no Spark) so generation is fast and byte-stable:
seed 42, sha256-derived hashes, no hash-order dependence.
"""

from __future__ import annotations

import hashlib
import random
from pathlib import Path

import pyarrow as pa
import pyarrow.parquet as pq

SEED = 42
N_BLOCKS = 1_000
GENESIS_TS = 1_230_768_000  # 2009-01-01T00:00:00Z
BLOCK_SPACING_S = 600  # 144 blocks/day -> day boundaries inside the range
COINBASE_REWARD = 50 * 100_000_000

DEFAULT_DIR = Path(__file__).resolve().parent.parent / "fixtures"

_IO_TYPE = pa.struct(
    [
        pa.field("address", pa.list_(pa.string())),
        pa.field("value", pa.int64(), nullable=False),
        pa.field("address_type", pa.int16(), nullable=False),
        # UTXO back-reference: which (tx, output slot) this input spends
        # (NULL on outputs; BlockSci resolves this linkage in C++ —
        # SURVEY §2.B1). Lets tests/oracles verify the linkage join.
        pa.field("spent_tx_id", pa.int64(), nullable=True),
        pa.field("spent_index", pa.int32(), nullable=True),
    ]
)

BLOCKS_SCHEMA = pa.schema(
    [
        pa.field("block_id", pa.int32(), nullable=False),
        pa.field("block_hash", pa.binary(), nullable=True),
        pa.field("timestamp", pa.int32(), nullable=False),
        pa.field("no_transactions", pa.int32(), nullable=False),
    ]
)

TXS_SCHEMA = pa.schema(
    [
        pa.field("tx_id", pa.int64(), nullable=False),
        pa.field("tx_hash", pa.binary(), nullable=True),
        pa.field("block_id", pa.int32(), nullable=False),
        pa.field("timestamp", pa.int32(), nullable=False),
        pa.field("coinbase", pa.bool_(), nullable=False),
        pa.field("inputs", pa.list_(_IO_TYPE)),
        pa.field("outputs", pa.list_(_IO_TYPE)),
    ]
)

RATES_SCHEMA = pa.schema(
    [
        pa.field("date", pa.string(), nullable=False),
        pa.field("fiat_values", pa.map_(pa.string(), pa.float32())),
    ]
)


def _h(tag: str) -> bytes:
    return hashlib.sha256(tag.encode()).digest()


def _addr(i: int) -> str:
    return f"addr_{i}"


def generate(out_dir: str | Path = DEFAULT_DIR, n_blocks: int = N_BLOCKS) -> Path:
    """Generate the fixture parquet files; returns the directory.

    Idempotent and deterministic: same seed -> byte-identical logical
    content (re-generation overwrites with equal data).
    """
    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    rng = random.Random(SEED)

    blocks: list[dict] = []
    txs: list[dict] = []
    # UTXO pool entries: (value, address_list, address_type, src_tx, src_idx)
    utxo_pool: list[tuple[int, list[str] | None, int, int, int]] = []
    tx_id = 0

    for height in range(n_blocks):
        ts = GENESIS_TS + height * BLOCK_SPACING_S
        n_tx = 1 + rng.randint(0, 6)
        block_tx_ids: list[int] = []

        for slot in range(n_tx):
            is_coinbase = slot == 0
            inputs: list[dict] = []
            outputs: list[dict] = []

            if is_coinbase:
                in_total = COINBASE_REWARD
            else:
                k = min(len(utxo_pool), rng.randint(1, 3))
                if k == 0:
                    continue
                in_total = 0
                for _ in range(k):
                    value, addr, atype, src_tx, src_idx = utxo_pool.pop(
                        rng.randrange(len(utxo_pool))
                    )
                    inputs.append(
                        {
                            "address": addr,
                            "value": value,
                            "address_type": atype,
                            "spent_tx_id": src_tx,
                            "spent_index": src_idx,
                        }
                    )
                    in_total += value

            fee = 0 if is_coinbase else max(1_000, in_total // 1_000)
            spendable = in_total - fee

            if not is_coinbase and tx_id % 101 == 0 and len(inputs) >= 2:
                # coinjoin-shaped: 2 participants -> 3 outputs, two equal.
                eq = max(10_000, spendable // 3)
                change = spendable - 2 * eq
                for v in (eq, eq, max(change, 1)):
                    a = _addr(rng.randint(0, 4999))
                    outputs.append({"address": [a], "value": v, "address_type": 3})
            else:
                n_out = rng.randint(1, 4)
                cut_points = sorted(rng.randint(1, max(spendable - 1, 1)) for _ in range(n_out - 1))
                bounds = [0, *cut_points, spendable]
                for j in range(n_out):
                    v = max(bounds[j + 1] - bounds[j], 1)
                    if tx_id % 97 == 0 and j == 0:
                        addrs = [_addr(rng.randint(0, 4999)) for _ in range(rng.randint(2, 3))]
                        outputs.append({"address": addrs, "value": v, "address_type": 6})
                    elif tx_id % 89 == 0 and j == 0:
                        outputs.append({"address": None, "value": 0, "address_type": 7})
                    else:
                        atype = rng.choice((2, 3, 3, 3, 5, 8, 9))
                        outputs.append(
                            {"address": [_addr(rng.randint(0, 4999))], "value": v, "address_type": atype}
                        )

            for j, o in enumerate(outputs):
                if o["address"] is not None and o["value"] > 0:
                    utxo_pool.append(
                        (o["value"], o["address"], o["address_type"], tx_id, j)
                    )

            txs.append(
                {
                    "tx_id": tx_id,
                    "tx_hash": _h(f"tx{tx_id}"),
                    "block_id": height,
                    "timestamp": ts,
                    "coinbase": is_coinbase,
                    "inputs": inputs,
                    "outputs": outputs,
                }
            )
            block_tx_ids.append(tx_id)
            tx_id += 1

        blocks.append(
            {
                "block_id": height,
                "block_hash": _h(f"block{height}"),
                "timestamp": ts,
                "no_transactions": len(block_tx_ids),
            }
        )

    # BIP30 duplicate hashes: two pairs, later tx re-uses an earlier hash.
    n = len(txs)
    for a, b in ((n // 4, n // 4 + n // 2), (n // 3, n // 3 + n // 2)):
        txs[b]["tx_hash"] = txs[a]["tx_hash"]

    pq.write_table(pa.Table.from_pylist(blocks, schema=BLOCKS_SCHEMA), out / "raw_blocks.parquet")
    pq.write_table(pa.Table.from_pylist(txs, schema=TXS_SCHEMA), out / "raw_txs.parquet")

    # Exchange rates: one row per day covered by the chain.
    import datetime as dt

    first = dt.datetime.fromtimestamp(GENESIS_TS, dt.timezone.utc).date()
    last = dt.datetime.fromtimestamp(
        GENESIS_TS + (n_blocks - 1) * BLOCK_SPACING_S, dt.timezone.utc
    ).date()
    rates = []
    d = first
    i = 0
    while d <= last:
        rates.append(
            {
                "date": d.isoformat(),
                "fiat_values": [("USD", round(100 + 10 * ((i * 7919) % 100) / 100, 2)),
                                 ("EUR", round(90 + 10 * ((i * 104729) % 100) / 100, 2))],
            }
        )
        d += dt.timedelta(days=1)
        i += 1
    pq.write_table(pa.Table.from_pylist(rates, schema=RATES_SCHEMA), out / "raw_exchange_rates.parquet")
    return out


def ensure_fixtures(out_dir: str | Path = DEFAULT_DIR) -> Path:
    """Generate only if the parquet files are not already present."""
    out = Path(out_dir)
    needed = ["raw_blocks.parquet", "raw_txs.parquet", "raw_exchange_rates.parquet"]
    if all((out / f).exists() for f in needed):
        return out
    return generate(out)


if __name__ == "__main__":
    print(generate())
