"""Coefficient order decoding (reference ``lib/jxl/coeff_order.cc``)."""

from __future__ import annotations

import numpy as np

from libjxl_tpu.core.fields import Bits, BitsOffset, U32Enc, Val, read_u32
from libjxl_tpu.entropy.ans import ANSSymbolReader, decode_histograms
from libjxl_tpu.entropy.permutation import (
    K_PERMUTATION_CONTEXTS, read_permutation_tokens,
)
from libjxl_tpu.utils.bits import BitReader
from libjxl_tpu.vardct.ac_strategy import (
    COVERED_X, COVERED_Y, NUM_STRATEGIES, STRATEGY_ORDER, natural_order,
)

NUM_ORDERS = 13
K_ORDER_ENC = U32Enc(Val(0x5F), Val(0x13), Val(0), Bits(13))


def read_used_orders(r: BitReader) -> int:
    return read_u32(r, K_ORDER_ENC)


def decode_coeff_orders(r: BitReader, used_orders: int, used_acs: int):
    """Returns dict: (order_bucket, channel) -> order array
    (coeff_order.cc:110-170)."""
    orders = {}
    reader = None
    code = None
    if used_orders != 0:
        code = decode_histograms(r, K_PERMUTATION_CONTEXTS)
        reader = ANSSymbolReader(code, r)
    acs_mask = 0
    for o in range(NUM_STRATEGIES):
        if used_acs & (1 << o):
            acs_mask |= 1 << STRATEGY_ORDER[o]
    computed = 0
    for o in range(NUM_STRATEGIES):
        ord_ = STRATEGY_ORDER[o]
        if computed & (1 << ord_):
            continue
        computed |= 1 << ord_
        used = (acs_mask & (1 << ord_)) != 0
        llf = COVERED_X[o] * COVERED_Y[o]
        size = 64 * llf
        nat = natural_order(o)
        if (used_orders & (1 << ord_)) == 0:
            if used:
                for c in range(3):
                    orders[(ord_, c)] = nat.copy()
        else:
            for c in range(3):
                perm = read_permutation_tokens(r, reader, size, skip=llf)
                if used:
                    orders[(ord_, c)] = nat[perm]
    if reader is not None and not reader.check_final_state():
        from libjxl_tpu.core.fields import FormatError
        raise FormatError("invalid coeff order ANS state")
    return orders
