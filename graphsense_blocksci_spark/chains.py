"""Per-chain configuration — the engine-relevant subset of the
reference's parser configs (conf/btc.cfg, bch.cfg, ltc.cfg, zec.cfg).

Only public chain constants are mirrored: coin name, the reorg safety
lag (`maxBlockNum: -6` in every config — conf/btc.cfg:20), segwit
activation (which governs whether witness address types 8/9/10 can
appear below a height). Parser-infrastructure settings (data
directories, RPC endpoints/credentials, block magics) are deployment
concerns with no analog here and are deliberately NOT reproduced.
"""

from __future__ import annotations

from dataclasses import dataclass

NO_SEGWIT = 2_147_483_647  # sentinel the reference uses for "never"


@dataclass(frozen=True)
class ChainConfig:
    keyspace: str
    coin_name: str
    reorg_safety_lag: int
    segwit_activation_height: int

    @property
    def has_segwit(self) -> bool:
        return self.segwit_activation_height < NO_SEGWIT


CHAINS: dict[str, ChainConfig] = {
    "btc": ChainConfig("btc", "bitcoin", 6, 481_824),
    "bch": ChainConfig("bch", "bitcoin_cash", 6, NO_SEGWIT),
    "ltc": ChainConfig("ltc", "litecoin", 6, 1_201_536),
    "zec": ChainConfig("zec", "zcash", 6, NO_SEGWIT),
}


def for_chain(keyspace: str) -> ChainConfig:
    try:
        return CHAINS[keyspace]
    except KeyError:
        raise ValueError(
            f"unknown chain {keyspace!r}; known: {sorted(CHAINS)}"
        ) from None
