"""Table-driven unit tests for the coinjoin heuristic (SURVEY §2.B5).

Cases derived from the published BlockSci `isCoinjoin` semantics
(src/heuristics/tx_identification.cpp in the public BlockSci repo).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from graphsense_blocksci_spark.functions import is_coinjoin
from graphsense_blocksci_spark.schemas import RAW_TXS


def _io(addr, value, atype=3):
    return {"address": addr, "value": value, "address_type": atype}


CASES = [
    # (name, inputs, outputs, expected)
    (
        "classic_2_participants",
        [_io(["a1"], 100), _io(["a2"], 100)],
        [_io(["b1"], 50), _io(["b2"], 50), _io(["c1"], 90)],
        True,
    ),
    ("too_few_inputs", [_io(["a1"], 100)], [_io(["b1"], 50), _io(["b2"], 50), _io(["c1"], 40)], False),
    ("too_few_outputs", [_io(["a1"], 100), _io(["a2"], 100)], [_io(["b1"], 50), _io(["b2"], 50)], False),
    (
        "participants_exceed_inputs",
        [_io(["a1"], 100), _io(["a2"], 100)],
        # 5 outputs -> 3 participants > 2 inputs
        [_io(["b1"], 50), _io(["b2"], 50), _io(["b3"], 50), _io(["c1"], 20), _io(["c2"], 20)],
        False,
    ),
    (
        "same_input_address",
        # distinct input addresses (1) < participants (2)
        [_io(["a1"], 100), _io(["a1"], 100)],
        [_io(["b1"], 50), _io(["b2"], 50), _io(["c1"], 90)],
        False,
    ),
    (
        "wrong_equal_count",
        # max value frequency is 3, participants = 2
        [_io(["a1"], 100), _io(["a2"], 100)],
        [_io(["b1"], 50), _io(["b2"], 50), _io(["b3"], 50)],
        False,
    ),
    (
        "dust_equal_value",
        [_io(["a1"], 100), _io(["a2"], 100)],
        [_io(["b1"], 546), _io(["b2"], 546), _io(["c1"], 90)],
        False,
    ),
    (
        "three_participants",
        [_io(["a1"], 100), _io(["a2"], 100), _io(["a3"], 100)],
        # 6 outputs -> participants 3; value 40 appears exactly 3x
        [_io(["b1"], 40), _io(["b2"], 40), _io(["b3"], 40), _io(["c1"], 10), _io(["c2"], 12), _io(["c3"], 13)],
        True,
    ),
    ("coinbase_empty_inputs", [], [_io(["b1"], 50), _io(["b2"], 50), _io(["c1"], 90)], False),
]


@pytest.mark.parametrize("name,inputs,outputs,expected", CASES, ids=[c[0] for c in CASES])
def test_coinjoin_cases(spark, name, inputs, outputs, expected):
    rows = [
        {
            "tx_id": 0,
            "tx_hash": b"\x00" * 32,
            "block_id": 0,
            "timestamp": 0,
            "coinbase": False,
            "inputs": inputs,
            "outputs": outputs,
        }
    ]
    df = spark.createDataFrame(rows, RAW_TXS)
    got = df.select(is_coinjoin("inputs", "outputs").alias("cj")).first()["cj"]
    assert bool(got) is expected
