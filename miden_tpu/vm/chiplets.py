"""Chiplets trace: stacked memory + bitwise chiplet regions (22 columns).

Mirrors the reference chiplets module structure (docs chiplets/index.md):
regions are stacked top-down, identified by a monotone selector prefix,
padded with all-ones selectors; `chip_clk` counts rows from 1. The hasher
controller / ACE / kernel-ROM regions are not populated yet (their
selector slots are reserved), so the stack order here is:

    bitwise (s0=1, s1=0) | memory (s0=1, s1=1, s2=0) | padding (1,1,1,..)

with an empty hasher region (s0 jumps straight to 1 — the selector
monotonicity constraints allow any region to be empty).

Column layout (width 22):
  0..4   s0..s4 top-level selectors (overlaying payload per region)
  bitwise payload (cols 2..14):  s, a, b, a0..a3, b0..b3, zp, z
  memory payload  (cols 3..17):  rw, ew, ctx, word_addr, idx0, idx1,
                                 clk, v0..v3, d0, d1, t, f_scw
  21     chip_clk (row index + 1)

Specs: docs/src/design/chiplets/{memory,bitwise}.md; operation labels
from chiplets/index.md (§operation labels).
"""

from __future__ import annotations

import numpy as np

from ..field import gl

P = gl.P

CHIPLETS_WIDTH = 22

S0, S1, S2, S3, S4 = 0, 1, 2, 3, 4

# bitwise payload (valid when s0=1, s1=0)
BW_S = 2
BW_A = 3
BW_B = 4
BW_A_BITS = (5, 6, 7, 8)
BW_B_BITS = (9, 10, 11, 12)
BW_ZP = 13
BW_Z = 14

# memory payload (valid when s0=1, s1=1, s2=0)
M_RW = 3  # 1 = read, 0 = write
M_EW = 4  # 1 = word access, 0 = element access
M_CTX = 5
M_ADDR = 6  # word address (multiple of 4)
M_IDX0 = 7
M_IDX1 = 8
M_CLK = 9
M_V = (10, 11, 12, 13)
M_D0 = 14
M_D1 = 15
M_T = 16
M_FSCW = 17

CHIP_CLK = 21

# operation labels (chiplets/index.md §operation labels)
OP_BITWISE_AND = 2
OP_BITWISE_XOR = 6
OP_MEM_WRITE_ELEMENT = 4
OP_MEM_READ_ELEMENT = 12
OP_MEM_WRITE_WORD = 20
OP_MEM_READ_WORD = 28


def build_bitwise_rows(bitwise_log: list) -> np.ndarray:
    """8 rows per operation: 4-bit limbs of a and b injected MSB-first,
    result aggregated in z (docs bitwise.md)."""
    rows = np.zeros((8 * len(bitwise_log), CHIPLETS_WIDTH), dtype=np.uint64)
    for k, (is_xor, a, b, z) in enumerate(bitwise_log):
        zacc = 0
        for r in range(8):
            shift = 4 * (7 - r)
            a_hi = a >> shift
            b_hi = b >> shift
            a_bits = [(a_hi >> i) & 1 for i in range(4)]
            b_bits = [(b_hi >> i) & 1 for i in range(4)]
            nib = (
                sum(
                    (1 << i)
                    * (
                        a_bits[i] ^ b_bits[i]
                        if is_xor
                        else a_bits[i] & b_bits[i]
                    )
                    for i in range(4)
                )
            )
            row = rows[8 * k + r]
            row[S0] = 1
            row[S1] = 0
            row[BW_S] = is_xor
            row[BW_A] = a_hi
            row[BW_B] = b_hi
            for i in range(4):
                row[BW_A_BITS[i]] = a_bits[i]
                row[BW_B_BITS[i]] = b_bits[i]
            row[BW_ZP] = zacc
            zacc = zacc * 16 + nib
            row[BW_Z] = zacc
        assert zacc == z
    return rows


def build_memory_rows(mem_log: list) -> tuple[np.ndarray, list[int]]:
    """Memory chiplet rows sorted by (ctx, word_addr, clk) with the word
    state carried forward; returns (rows, d-limb range-check requests)."""
    # normalize: (ctx, word_addr, clk, rw, ew, idx, values)
    accesses = []
    for kind, ctx, addr, clk, values in mem_log:
        word_addr = addr - addr % 4
        idx = addr % 4
        rw = 1 if kind in ("re", "rw") else 0
        ew = 1 if kind in ("rw", "ww") else 0
        accesses.append((ctx, word_addr, clk, rw, ew, 0 if ew else idx, values))
    accesses.sort(key=lambda x: (x[0], x[1], x[2], x[3]))

    rows = np.zeros((len(accesses), CHIPLETS_WIDTH), dtype=np.uint64)
    range_requests: list[int] = []
    word = [0, 0, 0, 0]
    prev = None
    for r, (ctx, wa, clk, rw, ew, idx, values) in enumerate(accesses):
        same = prev is not None and prev[0] == ctx and prev[1] == wa
        if not same:
            word = [0, 0, 0, 0]
        if ew:
            if rw:
                assert values == word, (
                    f"memory read-word mismatch at ctx={ctx} addr={wa}: "
                    f"{values} vs {word}"
                )
            else:
                word = list(v % P for v in values)
        else:
            if rw:
                assert values[0] == word[idx], (
                    f"memory read mismatch at ctx={ctx} addr={wa + idx}"
                )
            else:
                word[idx] = values[0] % P
        row = rows[r]
        row[S0] = 1
        row[S1] = 1
        row[S2] = 0
        row[M_RW] = rw
        row[M_EW] = ew
        row[M_CTX] = ctx
        row[M_ADDR] = wa
        row[M_IDX0] = idx & 1
        row[M_IDX1] = idx >> 1
        row[M_CLK] = clk
        for i in range(4):
            row[M_V[i]] = word[i]
        if prev is not None:
            pctx, pwa, pclk = prev
            if ctx != pctx:
                delta = ctx - pctx
                t = gl.inv(delta)
            elif wa != pwa:
                delta = wa - pwa
                t = gl.inv(delta)
            else:
                delta = clk - pclk
                t = gl.inv(delta) if delta else 0
            assert 0 <= delta < (1 << 32), "memory delta out of u32"
            row[M_D0] = delta & 0xFFFF
            row[M_D1] = delta >> 16
            row[M_T] = t
            row[M_FSCW] = 1 if same else 0
            range_requests.extend((delta & 0xFFFF, delta >> 16))
        prev = (ctx, wa, clk)
    return rows, range_requests


def build_chiplets_trace(
    bitwise_log: list, mem_log: list, height: int
) -> tuple[np.ndarray, list[int]]:
    """Stack the chiplet regions into a (height, 22) matrix; returns the
    matrix and the memory d-limb range-check requests."""
    bw = build_bitwise_rows(bitwise_log)
    mem, range_requests = build_memory_rows(mem_log)
    used = bw.shape[0] + mem.shape[0]
    assert used < height, (
        f"chiplets trace overflow: {used} rows in height {height} "
        "(the last row must be padding so memory transition constraints "
        "and bus responses stay off it)"
    )
    m = np.zeros((height, CHIPLETS_WIDTH), dtype=np.uint64)
    m[: bw.shape[0]] = bw
    m[bw.shape[0] : used] = mem
    # padding region: all selectors 1
    m[used:, S0:S4 + 1] = 1
    m[:, CHIP_CLK] = np.arange(1, height + 1, dtype=np.uint64)
    return m, range_requests


def chiplets_height(bitwise_log: list, mem_log: list) -> int:
    """Power-of-two height with at least one padding row."""
    used = 8 * len(bitwise_log) + len(mem_log)
    return 1 << max(3, used.bit_length())
