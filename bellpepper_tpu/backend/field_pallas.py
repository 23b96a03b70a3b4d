"""Pallas TPU kernels for the field-arithmetic hot path.

The jnp backend (field_jnp) is batch-major (``[N, 16]``) and keeps every
intermediate in HBM — each limb op is an HBM round trip, which caps the
satisfiability pipeline around ~1M constraint-evals/s/chip. These kernels
flip the layout to **limb-major** ``[16, N]`` and tile the batch dimension
as ``[limb, 8 sublanes, 128 lanes]`` so that:

  * one limb-row op == one full (8, 128) VPU tile — 100% lane utilization;
  * the entire multiply pipeline (8-bit split → 32×32 convolution →
    carry → table fold → shift-subtract) runs on VMEM-resident values:
    HBM traffic is exactly read a, read b, write out.

All constants (modulus limbs, fold table, shifted moduli) are baked into
the kernel as Python ints, so the compiled program is pure straight-line
VPU code. The math pipeline is identical to field_jnp (same oracle tests
cover both)."""

from __future__ import annotations

from functools import partial
from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..fields import PrimeField

L16 = 16
L8 = 32
TILE = 1024  # batch elements per grid step: 8 sublanes × 128 lanes
SUB = 8
LANES = 128


def _digits(v: int, width: int, count: int) -> List[int]:
    mask = (1 << width) - 1
    return [(v >> (width * i)) & mask for i in range(count)]


class _Consts:
    """Host-side integer constants baked into kernels for one field."""

    def __init__(self, field: PrimeField):
        p = field.p
        self.p16 = _digits(p, 16, L16)
        # Fold rows: limbs8(2^(8*(32+i)) mod p), i = 0..33.
        self.fold = [_digits(pow(2, 8 * (L8 + i), p), 8, L8) for i in range(34)]
        # 16-bit-basis fold rows: limbs16(2^(16*(16+i)) mod p), i = 0..17
        # (18 rows: the 34-position product of two 17-limb semi-reduced
        # values folds positions 16..33).
        self.fold16 = [
            _digits(pow(2, 16 * (L16 + i), p), 16, L16) for i in range(18)
        ]
        # Split-multiplier fold rows (v2 tails): the high-byte companion
        # limbs16(2^(16·(16+i)+8) mod p). Folding position 16+i with its
        # multiplier split as m0 + 2^8·m1 (each < 2^8) makes every
        # product m·entry < 2^24, so partial sums accumulate in uint32
        # WITHOUT the lo/hi split — 2 ops per (row, entry) instead of 5.
        self.fold16_hi = [
            _digits(pow(2, 16 * (L16 + i) + 8, p), 16, L16) for i in range(18)
        ]
        # p·2^11 as 17 limbs: a multiple of p exceeding any 17-limb
        # semi-reduced value (< 2^266), for borrow-free negation.
        self.p2_17 = _digits(p << 11, 16, 17)
        # Final-fold rows at 8-bit multiplier granularity (see _mul16):
        # limbs16(2^(256 + 8i) mod p), i = 0..2.
        self.fold16b = [
            _digits(pow(2, 256 + 8 * i, p), 16, L16) for i in range(3)
        ]
        # Shift-subtract chain: p << k as 17 16-bit limbs, high k first.
        n_steps = 266 - field.NUM_BITS
        self.ps = [_digits(p << k, 16, 17) for k in range(n_steps - 1, -1, -1)]
        # p^{-1} mod 2^16 (p odd): the Montgomery zero-test constant.
        # For x < 2^266 ≡ 0 (mod p) the quotient m = x/p fits 16 bits
        # (NUM_BITS ≥ 250), so x is a multiple of p iff
        # x == ((x₀·p0inv) mod 2^16)·p — one const multiply + compare
        # instead of the 11-step shift-subtract chain.
        self.p0inv = pow(p, -1, 1 << 16) if p % 2 else None
        # Quotient-estimate canonicalization (v2 of the chain) for
        # 253..256-bit fields: q̂ = floor(T·r / 2^28) with
        # T = floor(x/2^240) (≤ 2^26) and r = floor(2^28 / ceil(p/2^240))
        # underestimates q = floor(x/p) by at most _QE_ERR, so
        # x − q̂·p < (_QE_ERR+1)·p finishes with 3 conditional subtracts.
        # All truncations round DOWN and the denominator rounds UP, so
        # q̂ ≤ q always (no underflow). Error budget: 2 floor
        # truncations + T·(r truncation)/2^28 ≤ 0.25 + q·(ceil slack)/D
        # ≤ q·2^(240-NUM_BITS) ≤ 2^13·2^-13 = 1 (NUM_BITS ≥ 253) + r
        # relative error ≤ 2^-13·q — bounded ≤ 5 and verified
        # exhaustively over multiples of p below.
        self.qe = None
        if 253 <= field.NUM_BITS <= 256:
            D = -(-p // (1 << 240))
            r = (1 << 28) // D
            q_max = ((1 << 266) - 1) // p
            worst = 0
            for k in range(0, q_max + 1):
                for x in (k * p, k * p + p - 1, min((k + 1) * p - 1, (1 << 266) - 1)):
                    if x >= (1 << 266):
                        continue
                    t0 = (x >> 240) & 0xFFFF
                    t1 = x >> 256
                    qh = ((t0 * r) >> 28) + ((t1 * r) >> 12)
                    q = x // p
                    assert 0 <= q - qh, (k, x)
                    worst = max(worst, q - qh)
            assert worst <= _QE_ERR, f"quotient estimate error {worst}"
            self.qe = r


_QE_ERR = 6  # cond-subtract coverage: x' < 7p < 8p → sub 4p, 2p, p


# ---------------------------------------------------------------------------
# Row-list pipeline stages. Each "row" is an (8, 128) uint32 array (one
# VPU tile holding TILE batch elements for one limb/digit position).
# ---------------------------------------------------------------------------
def _split8_rows(rows16: List[jnp.ndarray]) -> List[jnp.ndarray]:
    out = []
    for r in rows16:
        out.append(r & 0xFF)
        out.append((r >> 8) & 0xFF)
    return out


def _conv_rows(a8: List[jnp.ndarray], b8: List[jnp.ndarray]) -> List[jnp.ndarray]:
    """conv[k] = Σ_{i+j=k} a8[i]·b8[j]; partials ≤ 32·255² < 2²² in uint32."""
    conv: List = [None] * (2 * L8 - 1)
    for i in range(L8):
        ai = a8[i]
        for j in range(L8):
            t = ai * b8[j]
            k = i + j
            conv[k] = t if conv[k] is None else conv[k] + t
    return conv


def _carry8_rows(rows: List[jnp.ndarray], n_out: int) -> List[jnp.ndarray]:
    out = []
    carry = None
    for i in range(n_out):
        limb = rows[i] if i < len(rows) else None
        if limb is None and carry is None:
            out.append(jnp.zeros_like(rows[0]))
            continue
        tot = limb if carry is None else (carry if limb is None else limb + carry)
        out.append(tot & 0xFF)
        carry = tot >> 8
    return out


def _fold_rows(d: List[jnp.ndarray], consts: _Consts) -> List[jnp.ndarray]:
    """low(32 digits) + Σ_i d[32+i]·fold[i] — scalar-constant MACs.
    Zero-coefficient terms are skipped at trace time (the fold rows are
    sparse for structured moduli like the pasta fields)."""
    out: List = list(d[:32])
    for i in range(len(d) - 32):
        hi = d[32 + i]
        row = consts.fold[i]
        for l in range(32):
            c = row[l]
            if c == 0:
                continue
            t = hi * jnp.uint32(c)
            out[l] = t if out[l] is None else out[l] + t
    return out


def _join16_rows(d8: List[jnp.ndarray]) -> List[jnp.ndarray]:
    return [d8[2 * i] | (d8[2 * i + 1] << 8) for i in range(len(d8) // 2)]


def _chain_rows(x: List[jnp.ndarray], consts: _Consts) -> List[jnp.ndarray]:
    """Branch-free long division: for each shifted modulus (high first),
    subtract with borrow and keep the difference when it doesn't borrow.
    x: 17 rows of 16-bit limbs."""
    for ps in consts.ps:
        borrow = None
        diff = []
        for i in range(17):
            d = x[i] - jnp.uint32(ps[i]) if borrow is None else x[i] - jnp.uint32(ps[i]) - borrow
            borrow = d >> 31
            diff.append(d & 0xFFFF)
        keep = borrow == 0  # [8,128] bool
        x = [jnp.where(keep, diff[i], x[i]) for i in range(17)]
    return x


def _reduce_rows(digit_rows: List[jnp.ndarray], consts: _Consts) -> List[jnp.ndarray]:
    """Wide 8-bit-basis digits (< 2²⁴ each, ≤ 66 positions) → 16 canonical
    16-bit limb rows. Carry → fold → carry → fold → chain."""
    d = _carry8_rows(digit_rows, 66)
    f1 = _fold_rows(d, consts)
    f1 = _carry8_rows(f1, 34)
    f2 = _fold_rows(f1, consts)
    f2 = _carry8_rows(f2, 34)
    x16 = _join16_rows(f2[:32])  # 16 rows
    x16.append(f2[32] | (f2[33] << 8))  # 17th row (bits 256..271)
    x16 = _chain_rows(x16, consts)
    return x16[:L16]


# ---------------------------------------------------------------------------
# 16-bit-limb multiply pipeline. The 8-bit pipeline above does a 32×32
# digit convolution (1024 VPU multiplies); working directly on the 16
# canonical 16-bit limbs needs only 16×16 = 256 multiplies. Each product
# a16·b16 fills the full uint32, so partial sums are accumulated as
# split lo/hi halves (each half < 2^16, ≤ 32 terms per position → < 2^21,
# exact in uint32). Measured ~1.6× the 8-bit kernel on v5e.
# ---------------------------------------------------------------------------
def _conv16_rows(a16: List[jnp.ndarray], b16: List[jnp.ndarray]) -> List[jnp.ndarray]:
    """32 positions of 16-bit-basis digits (< 2²¹ each) of a·b."""
    acc: List = [None] * (2 * L16)
    for i in range(L16):
        ai = a16[i]
        for j in range(L16):
            t = ai * b16[j]  # full 32-bit product, exact
            k = i + j
            lo = t & 0xFFFF
            hi = t >> 16
            acc[k] = lo if acc[k] is None else acc[k] + lo
            acc[k + 1] = hi if acc[k + 1] is None else acc[k + 1] + hi
    return acc


def _carry16_rows(rows: List[jnp.ndarray], n_out: int) -> List[jnp.ndarray]:
    out = []
    carry = None
    for i in range(n_out):
        limb = rows[i] if i < len(rows) else None
        if limb is None and carry is None:
            out.append(jnp.zeros_like(rows[0]))
            continue
        tot = limb if carry is None else (carry if limb is None else limb + carry)
        out.append(tot & 0xFFFF)
        carry = tot >> 16
    return out


def _fold1_split(d: List[jnp.ndarray], consts: _Consts, n_rows: int) -> List[jnp.ndarray]:
    """Fold 16-bit-basis positions 16..16+n_rows−1 into positions 0..15
    with SPLIT multipliers: d[16+i] = m0 + 2^8·m1 (each < 2^8), so every
    product m·entry < 2^24 and partial sums accumulate directly in
    uint32 (≤ 2·n_rows ≤ 36 terms × 2^24 < 2^29.2) — no lo/hi split.
    Returns 16 accumulated positions (NOT carried)."""
    acc: List = list(d[:L16])
    for i in range(n_rows):
        hi_d = d[L16 + i]
        m0 = hi_d & 0xFF
        m1 = hi_d >> 8
        for m, row in ((m0, consts.fold16[i]), (m1, consts.fold16_hi[i])):
            for l in range(L16):
                c = row[l]
                if c == 0:
                    continue
                acc[l] = acc[l] + m * jnp.uint32(c)
    return acc


def _canon_tail_v2(x: List[jnp.ndarray], consts: _Consts) -> List[jnp.ndarray]:
    """17-limb x < 2^266 → 16 canonical limbs, via quotient-estimate
    subtraction (see _Consts.qe) + 3 conditional subtracts — replaces
    the 11-step shift-subtract chain (~350 ops vs ~935)."""
    r = consts.qe
    p = sum(v << (16 * j) for j, v in enumerate(consts.p16))
    qh = ((x[15] * jnp.uint32(r)) >> 28) + ((x[16] * jnp.uint32(r)) >> 12)
    # y = q̂·p as 17 16-bit limbs (carry-normalized first, so the
    # subtraction below is a standard borrow ∈ {0, 1} chain — a fused
    # lo+hi subtrahend can exceed 0xFFFF and need a 2-borrow).
    y = []
    carry = None
    for i in range(17):
        if i < L16 and consts.p16[i]:
            t = qh * jnp.uint32(consts.p16[i])
            lo = t & 0xFFFF
            hi = t >> 16
        else:
            lo = hi = None
        tot = lo
        if carry is not None:
            tot = carry if tot is None else tot + carry
        y.append(jnp.zeros_like(x[0]) if tot is None else tot & 0xFFFF)
        next_carry = None if tot is None else tot >> 16
        if hi is not None:
            next_carry = hi if next_carry is None else next_carry + hi
        carry = next_carry
    out = []
    borrow = None
    for i in range(17):
        d = x[i] - y[i]
        if borrow is not None:
            d = d - borrow
        borrow = d >> 31
        out.append(d & 0xFFFF)
    # x' < (_QE_ERR + 1)·p ≤ 7p < 8p: conditional subtracts 4p, 2p, p.
    for k in (2, 1, 0):
        ps = _digits(p << k, 16, 17)
        borrow = None
        diff = []
        for i in range(17):
            d = out[i] - jnp.uint32(ps[i])
            if borrow is not None:
                d = d - borrow
            borrow = d >> 31
            diff.append(d & 0xFFFF)
        keep = borrow == 0
        out = [jnp.where(keep, diff[i], out[i]) for i in range(17)]
    return out[:L16]


def _mont_zero_rows(x: List[jnp.ndarray], consts: _Consts) -> jnp.ndarray:
    """17-limb x < 2^266 → uint32 mask (0 iff x ≡ 0 mod p). The
    Montgomery zero-test: if p | x then m = x/p < 2^16 (NUM_BITS ≥ 250)
    and m ≡ x₀·p^{-1} (mod 2^16), so x is a multiple of p iff
    x == m̂·p for m̂ = (x₀·p0inv) & 0xFFFF (if p ∤ x, every m̂·p is a
    multiple of p ≠ x, and the compare fails on some limb). One const
    multiply + a 17-limb compare replaces the canonicalization chain."""
    mh = (x[0] * jnp.uint32(consts.p0inv)) & 0xFFFF
    bad = None
    carry = None
    for i in range(17):
        if i < L16 and consts.p16[i]:
            t = mh * jnp.uint32(consts.p16[i])
            lo = t & 0xFFFF
            hi = t >> 16
        else:
            lo = hi = None
        tot = lo
        if carry is not None:
            tot = carry if tot is None else tot + carry
        limb = jnp.zeros_like(x[0]) if tot is None else tot & 0xFFFF
        next_carry = None if tot is None else tot >> 16
        if hi is not None:
            next_carry = hi if next_carry is None else next_carry + hi
        carry = next_carry
        diff = limb ^ x[i]
        bad = diff if bad is None else bad | diff
    return bad


def _reduce16_rows(digit_rows: List[jnp.ndarray], consts: _Consts) -> List[jnp.ndarray]:
    """32 16-bit-basis positions (each < 2²¹) → 16 canonical limb rows.

    carry → fold(16 rows, split multipliers) → carry → final fold at
    8-bit multiplier granularity (products < 2²⁴, no split needed) →
    carry → quotient-estimate canonicalization (or the shift-subtract
    chain for fields outside the 253-256-bit window)."""
    d = _carry16_rows(digit_rows, 2 * L16)  # value < 2^512
    acc = _fold1_split(d, consts, L16)
    d2 = _carry16_rows(acc, 18)  # value < 2^276 → d2[17] < 2^4
    # fold2 at 8-bit multiplier granularity: multipliers m < 2^8 so
    # m·row16 < 2^24; base + 3 products < 2^26 — no split accumulation.
    m0 = d2[L16] & 0xFF
    m1 = d2[L16] >> 8
    m2 = d2[17]
    out: List = list(d2[:L16])
    for m, row in zip((m0, m1, m2), consts.fold16b):
        for l in range(L16):
            c = row[l]
            if c == 0:
                continue
            out[l] = out[l] + m * jnp.uint32(c)
    x16 = _carry16_rows(out, 17)  # value < 2^256 + 3·2^8·p < 2^266
    if consts.qe is not None:
        return _canon_tail_v2(x16, consts)
    x16 = _chain_rows(x16, consts)
    return x16[:L16]


def _add_canon_rows(
    a16: List[jnp.ndarray], b16: List[jnp.ndarray], consts: _Consts
) -> List[jnp.ndarray]:
    """canonical + canonical → canonical: carry to 17 limbs (< 2p < 2^256)
    then ONE conditional subtract of p (branch-free, like _chain_rows)."""
    s = _carry16_rows([a16[i] + b16[i] for i in range(L16)], 17)
    ps = consts.ps[-1]  # p << 0 as 17 16-bit limbs
    borrow = None
    diff = []
    for i in range(17):
        d = s[i] - jnp.uint32(ps[i])
        if borrow is not None:
            d = d - borrow
        borrow = d >> 31
        diff.append(d & 0xFFFF)
    keep = borrow == 0  # s >= p
    return [jnp.where(keep, diff[i], s[i]) for i in range(L16)]


# ---------------------------------------------------------------------------
# Sequential field-chain kernel. Deep witness chains (x = (x·b + a)², 30+
# reps — BASELINE config 1's shape, and the shape of any Horner/EC-ladder
# style gadget) execute as one scan STEP PER OP in the generic witness
# program: each step pays a kernel launch, two limb-major relayouts and a
# row gather/scatter on [B, F, 16] HBM buffers, which dominates at small
# per-step widths. When every chain-internal operand is the IMMEDIATELY
# preceding op's output and all other operands are rep-invariant rows,
# the whole chain runs in ONE kernel: the running value stays in VPU
# registers, externals load once, and the only HBM traffic is streaming
# the per-step outputs out (they are witness values and must be written).
# ---------------------------------------------------------------------------
_CHAIN_CACHE: Dict[tuple, object] = {}


def make_chain_kernel(
    field: PrimeField,
    descs: Tuple[Tuple[str, object, object], ...],
    n_reps: int,
    n_ext: int,
    interpret: bool = False,
):
    """Fused periodic field chain.

    descs: d per-pattern-position ops ``(opcode, a_src, b_src)`` with
    opcode in {"fmul", "fadd"} and src either "prev" (the previous op's
    output; for the first op of the first rep, the x0 input) or an int k
    (external operand k). Executes n_reps repetitions.

    Returns run(x0, ext) with x0 uint32[16, N] and ext
    uint32[max(n_ext,1)·16, N] (canonical limb-major, N a TILE multiple)
    → uint32[n_reps·d·16, N]: every op's canonical output, in chain order.
    """
    key = (field.p, descs, n_reps, n_ext, interpret)
    cached = _CHAIN_CACHE.get(key)
    if cached is not None:
        return cached
    consts = _Consts(field)
    d = len(descs)
    n_steps = n_reps * d

    def kernel(x0_ref, ext_ref, o_ref):
        ext = [
            tuple(ext_ref[k * L16 + l] for l in range(L16))
            for k in range(n_ext)
        ]

        def body(r, x):
            cur = x
            for j, (op, asrc, bsrc) in enumerate(descs):
                a = cur if asrc == "prev" else ext[asrc]
                b = cur if bsrc == "prev" else ext[bsrc]
                if op == "fmul":
                    res = _reduce16_rows(_conv16_rows(list(a), list(b)), consts)
                else:
                    res = _add_canon_rows(list(a), list(b), consts)
                o_ref[pl.ds((r * d + j) * L16, L16)] = jnp.stack(res)
                cur = tuple(res)
            return cur

        jax.lax.fori_loop(0, n_reps, body, tuple(x0_ref[l] for l in range(L16)))

    @jax.jit
    def run(x0, ext):
        n = x0.shape[1]
        assert n % TILE == 0, "pad batch to TILE"
        grid = (n // TILE,)

        def blk(rows):
            return pl.BlockSpec(
                (rows, SUB, LANES),
                lambda i: (0, i, 0),
                memory_space=pltpu.VMEM,
            )

        out = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[blk(L16), blk(max(n_ext, 1) * L16)],
            out_specs=blk(n_steps * L16),
            out_shape=jax.ShapeDtypeStruct(
                (n_steps * L16, n // LANES, LANES), jnp.uint32
            ),
            interpret=interpret,
        )(
            x0.reshape(L16, n // LANES, LANES),
            ext.reshape(max(n_ext, 1) * L16, n // LANES, LANES),
        )
        return out.reshape(n_steps * L16, n)

    _CHAIN_CACHE[key] = run
    return run


_BITPLANE_CACHE: Dict[tuple, object] = {}


def make_bitplane_eq_kernel(
    n_pos: int, m_a: int, m_c: int, interpret: bool = False,
    tile_w: int = 256,
):
    """Bit-sliced integer-equality over exponent planes — the VMEM form
    of the MultiEq capacity-packed row check (multieq.rs:25-58 at the
    packed level; see matvec._classify_pow2_eq_rows).

    Inputs ``A u32[m_a·P, W]`` and ``C u32[m_c·P, W]`` (P = n_pos rounded
    up to a power of two): addend k's plane for exponent e is row
    ``k·P + e``; each column carries 32 independent instances, one per
    bit. Returns ``bad u32[W]`` — bit j of column t is set iff
    Σ 2^e·A-bits ≠ Σ 2^e·C-bits for that instance.

    The whole computation per column tile runs on VMEM-resident planes:
    HBM traffic is exactly read A + read C + write bad. Instead of
    propagating carries (Kogge-Stone, log2(P) dependent steps), the
    kernel carry-save-reduces the addends to two vectors x, y and then
    verifies x + y == z POSITION-LOCALLY: the carry-in vector of a
    correct addition is forced to k = x^y^z, and carries obey
    c[e+1] = maj(x[e], y[e], c[e]), so equality holds iff
    k == sh(maj(x, y, k)) at every position (headroom positions give
    the top carry-out == 0 for free). When the c side has more than one
    addend it is folded in by two's complement (x + y ≡ 0 mod 2^P, whose
    local rule is k == sh(x|y)); soundness needs only |lhs − rhs| < 2^P,
    guaranteed by the classifier's n_pos headroom. The XLA lowering of
    the same check (matvec._pow2_eq_bad_words) is an independent
    implementation — full CSA + Kogge-Stone — which the parity tests
    compare bit-for-bit."""
    key = (n_pos, m_a, m_c, interpret, tile_w)
    cached = _BITPLANE_CACHE.get(key)
    if cached is not None:
        return cached
    P = 8
    while P < n_pos:
        P *= 2

    def shpos(x, d=1):
        # shift toward the MSB along the (sublane-major) position axis:
        # row e of the result is x[e - d]; carries past row P-1 drop,
        # sound because n_pos includes overflow headroom (classifier).
        z = jnp.zeros((d, x.shape[1]), jnp.uint32)
        return jnp.concatenate([z, x[: P - d]], axis=0)

    def csa2(addends):
        while len(addends) > 2:
            nxt = []
            for i in range(0, len(addends) - 2, 3):
                a1, b1, c1 = addends[i : i + 3]
                nxt.append(a1 ^ b1 ^ c1)
                nxt.append(shpos((a1 & b1) | (c1 & (a1 ^ b1))))
            rem = len(addends) % 3
            if rem:
                nxt.extend(addends[-rem:])
            addends = nxt
        if len(addends) == 1:
            addends.append(jnp.zeros_like(addends[0]))
        return addends

    def kernel(a_ref, c_ref, o_ref):
        a = a_ref[...]
        addends = [a[k * P : (k + 1) * P, :] for k in range(m_a)]
        if m_c == 1:
            z = c_ref[...]
            x, y = csa2(addends)
            k = (x ^ y) ^ z
            bad = k ^ shpos((x & y) | (k & (x | y)))
        else:
            c = c_ref[...]
            addends += [~c[k * P : (k + 1) * P, :] for k in range(m_c)]
            # two's-complement correction: +m_c, as all-ones planes at
            # the set bits of m_c (constant per column). m_c and P are
            # compile-time ints: select the set-bit rows by comparing the
            # position iota against each static exponent — a runtime
            # `m_c >> e_row` is implementation-defined once P > 32 (shift
            # amount ≥ the 32-bit width).
            e_row = jax.lax.broadcasted_iota(jnp.uint32, (P, tile_w), 0)
            sel = None
            for e in range(m_c.bit_length()):
                if (m_c >> e) & 1:
                    eq = e_row == jnp.uint32(e)
                    sel = eq if sel is None else sel | eq
            mc_plane = jnp.where(
                sel, jnp.uint32(0xFFFFFFFF), jnp.uint32(0)
            )
            addends.append(mc_plane)
            x, y = csa2(addends)
            k = x ^ y
            bad = k ^ shpos(x | y)
        r, kk = bad, P
        while kk > 1:
            kk //= 2
            r = r[:kk] | r[kk : 2 * kk]
        o_ref[...] = r  # [1, tw]

    @jax.jit
    def run(A, C):
        W = A.shape[1]
        assert W % tile_w == 0, "pad W to the tile width"
        assert A.shape[0] == m_a * P and C.shape[0] == m_c * P
        grid = (W // tile_w,)

        def blk(rows):
            return pl.BlockSpec(
                (rows, tile_w), lambda i: (0, i), memory_space=pltpu.VMEM
            )

        out = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[blk(m_a * P), blk(m_c * P)],
            out_specs=blk(1),
            out_shape=jax.ShapeDtypeStruct((1, W), jnp.uint32),
            interpret=interpret,
        )(A, C)
        return out[0]

    run.n_pos_padded = P
    _BITPLANE_CACHE[key] = run
    return run


SEMI = 17  # limbs of the semi-reduced form (< p·2^11 < 2^266)


def _semi_reduce_rows(digit_rows: List[jnp.ndarray], consts: _Consts) -> List[jnp.ndarray]:
    """Wide 8-bit-basis digits (32 positions, each < 2^32 — matvec
    accumulators) → SEMI-reduced 17 16-bit limb rows: a value < 2^265
    congruent mod p, NOT canonical. Skips the expensive shift-subtract
    chain; the fused compare kernel (_mulcmp_kernel) consumes this form
    directly, so per-matvec canonicalization is wasted work.

    carry(36: value < 2^280) → fold positions 32..35 (4 rows) → carry →
    join to 16-bit limbs. Result < 2^256 + 4·255·p < 2^265."""
    d = _carry8_rows(digit_rows, 36)
    out: List = list(d[:32])
    for i in range(4):
        hi = d[32 + i]
        row = consts.fold[i]
        for l in range(32):
            c = row[l]
            if c == 0:
                continue
            t = hi * jnp.uint32(c)
            out[l] = out[l] + t
    d2 = _carry8_rows(out, 34)
    x16 = _join16_rows(d2[:32])  # 16 rows
    x16.append(d2[32] | (d2[33] << 8))  # bits 256..271 (top < 2^9)
    return x16  # 17 rows


def _mulcmp_rows(
    a17: List[jnp.ndarray],
    b17: List[jnp.ndarray],
    c17: List[jnp.ndarray],
    consts: _Consts,
) -> jnp.ndarray:
    """a·b ≢ c (mod p) mask for 17-limb semi-reduced operands: one wide
    convolution + ONE canonical reduction per element, replacing
    (canonicalize a, canonicalize b, canonicalize c, full modmul,
    compare). Returns uint32 (0 = equal, nonzero = violation)."""
    # neg ≡ −c (mod p): borrow-free because p·2^11 > any semi value.
    neg = []
    borrow = None
    for i in range(SEMI):
        d = (
            jnp.uint32(consts.p2_17[i]) - c17[i]
            if borrow is None
            else jnp.uint32(consts.p2_17[i]) - c17[i] - borrow
        )
        borrow = d >> 31
        neg.append(d & 0xFFFF)
    # 17×17 convolution with lo/hi split accumulation (≤ 34 terms of
    # < 2^16 per position → < 2^21.1) plus the neg digits (< 2^16).
    acc: List = [None] * (2 * SEMI)
    for i in range(SEMI):
        ai = a17[i]
        for j in range(SEMI):
            t = ai * b17[j]
            k = i + j
            lo = t & 0xFFFF
            hi = t >> 16
            acc[k] = lo if acc[k] is None else acc[k] + lo
            acc[k + 1] = hi if acc[k + 1] is None else acc[k + 1] + hi
    for i in range(SEMI):
        acc[i] = acc[i] + neg[i]
    # reduce to < 2^266: carry → fold(18 rows, split multipliers) →
    # carry → 8-bit-granularity fold → carry; then the Montgomery
    # zero-test replaces canonicalize-and-compare-to-zero entirely.
    d = _carry16_rows(acc, 2 * SEMI)  # value < 2^544 → 34 positions
    out = _fold1_split(d, consts, 18)
    d2 = _carry16_rows(out, 18)  # value < 2^276 → d2[17] < 2^4
    m0 = d2[L16] & 0xFF
    m1 = d2[L16] >> 8
    m2 = d2[17]
    fin: List = list(d2[:L16])
    for m, row in zip((m0, m1, m2), consts.fold16b):
        for l in range(L16):
            c = row[l]
            if c == 0:
                continue
            fin[l] = fin[l] + m * jnp.uint32(c)
    x17 = _carry16_rows(fin, SEMI)  # < 2^256 + 3·2^8·p < 2^266
    if consts.p0inv is not None:
        return _mont_zero_rows(x17, consts)
    x16 = _chain_rows(x17, consts)  # canonical: 0 iff a·b ≡ c
    bad = x16[0]
    for l in range(1, L16):
        bad = bad | x16[l]
    return bad


# ---------------------------------------------------------------------------
# Kernels
# ---------------------------------------------------------------------------
def _mul_kernel(consts: _Consts, a_ref, b_ref, o_ref):
    a_rows = [a_ref[i] for i in range(L16)]
    b_rows = [b_ref[i] for i in range(L16)]
    out = _reduce16_rows(_conv16_rows(a_rows, b_rows), consts)
    o_ref[...] = jnp.stack(out)


def _mul_digits_kernel(consts: _Consts, a_ref, b_ref, o_ref):
    """Multiply and emit canonical 8-bit digits [32, ...] (for the matvec
    segment-sum, which accumulates digits)."""
    a_rows = [a_ref[i] for i in range(L16)]
    b_rows = [b_ref[i] for i in range(L16)]
    out16 = _reduce16_rows(_conv16_rows(a_rows, b_rows), consts)
    o_ref[...] = jnp.stack(_split8_rows(out16))


def _reduce_kernel(consts: _Consts, d_ref, o_ref):
    """Reduce [32, ...] digits (each < 2²⁴, e.g. segment sums) to canonical
    16-limb rows."""
    rows = [d_ref[i] for i in range(L8)]
    o_ref[...] = jnp.stack(_reduce_rows(rows, consts))


class PallasFieldOps:
    """Limb-major field ops backed by Pallas kernels.

    Array convention: ``[L, N]`` uint32 with N a multiple of TILE (wrappers
    pad). Use `to_limb_major` / `from_limb_major` at the boundary."""

    def __init__(self, field: PrimeField, interpret: bool = False):
        self.field = field
        self.consts = _Consts(field)
        self.interpret = interpret

        def call(kernel, in_rows: int, out_rows: int):
            k = partial(kernel, self.consts)

            @jax.jit
            def run(*args):
                n = args[0].shape[1]
                assert n % TILE == 0, "pad batch to TILE"
                grid = (n // TILE,)
                # index_map returns block-unit indices: grid step i maps to
                # element offset (0, i·SUB, 0) of the [rows, n/128, 128] array.
                blk = lambda rows: pl.BlockSpec(
                    (rows, SUB, LANES),
                    lambda i: (0, i, 0),
                    memory_space=pltpu.VMEM,
                )
                reshaped = [
                    x.reshape(r, n // LANES, LANES)
                    for x, r in zip(args, [in_rows] * len(args))
                ]
                out = pl.pallas_call(
                    k,
                    grid=grid,
                    in_specs=[blk(in_rows)] * len(args),
                    out_specs=blk(out_rows),
                    out_shape=jax.ShapeDtypeStruct(
                        (out_rows, n // LANES, LANES), jnp.uint32
                    ),
                    interpret=self.interpret,
                )(*reshaped)
                return out.reshape(out_rows, n)

            return run

        self._mul = call(_mul_kernel, L16, L16)
        self._mul_digits = call(_mul_digits_kernel, L16, L8)
        self._reduce = call(_reduce_kernel, L8, L16)

    # -- boundary helpers -------------------------------------------------
    @staticmethod
    def pad_n(n: int) -> int:
        return -(-n // TILE) * TILE

    @staticmethod
    def to_limb_major(x_bm: jnp.ndarray, pad_to: int | None = None) -> jnp.ndarray:
        """[N, L] → [L, N'] with zero padding."""
        n = x_bm.shape[0]
        target = pad_to or PallasFieldOps.pad_n(n)
        x = x_bm.T
        if target != n:
            x = jnp.pad(x, ((0, 0), (0, target - n)))
        return x

    @staticmethod
    def from_limb_major(x_lm: jnp.ndarray, n: int) -> jnp.ndarray:
        return x_lm[:, :n].T

    # -- ops ----------------------------------------------------------------
    def mul(self, a_lm: jnp.ndarray, b_lm: jnp.ndarray) -> jnp.ndarray:
        return self._mul(a_lm, b_lm)

    def mul_digits(self, a_lm: jnp.ndarray, b_lm: jnp.ndarray) -> jnp.ndarray:
        return self._mul_digits(a_lm, b_lm)

    def reduce_digits(self, d_lm: jnp.ndarray) -> jnp.ndarray:
        return self._reduce(d_lm)


_OPS: Dict[Tuple[int, bool], PallasFieldOps] = {}


def get_pallas_ops(field: PrimeField, interpret: bool = False) -> PallasFieldOps:
    key = (field.p, interpret)
    ops = _OPS.get(key)
    if ops is None:
        ops = PallasFieldOps(field, interpret=interpret)
        _OPS[key] = ops
    return ops


# ---------------------------------------------------------------------------
# Fused bits-matvec kernel: mask + bucket row-sum + digit reduce, one pass.
#
# For a bit-valued witness, the ELL bucket row-sum
#     acc[d, r, b] = Σ_k cd[d, r, k] · bv[r, k, b]
# is, per row, a [32, K] × [K, B] matmul with all values exact in fp32
# (digits ≤ 255, row sums ≤ 255·K < 2^24) — so it runs on the MXU, and the
# canonical digit reduction happens in-kernel on the [TR, 128] accumulator
# tiles. HBM traffic collapses to: read bv rows + cd once, write [16, ...]
# canonical limbs once.
# ---------------------------------------------------------------------------
def make_fold_matvec_bucket(field: PrimeField, C: int, n_rows: int, B: int,
                            chunk_cap: int = 512, interpret: bool = False,
                            out_form: str = "canonical"):
    """Fused bucket matvec: for each of n_rows rows,

        acc[d, r, :] = Σ_c F[d, r, c] · x[r, c, :]       (exact integers)

    followed by the in-kernel canonical digit reduction. F is a STATIC
    per-row fold matrix with 8-bit entries (< 256); x carries dynamic
    values < 256 per lane. The per-row contraction is a [32, C] × [C, B]
    matmul — exact in fp32 as long as each accumulated chunk stays below
    2²⁴, hence `chunk_cap` (512 for 0/1·digit products, 256 for
    digit·digit products); chunks accumulate in uint32.

    Inputs x [n_rows, C, B] uint32 and F [32, n_rows, C] uint32; output
    [16, n_rows, B] canonical limbs, or — with out_form="semi" —
    [17, n_rows, B] semi-reduced limbs for the fused compare kernel
    (make_mulcmp), skipping the per-matvec shift-subtract chain.
    B must be a multiple of 128."""
    assert B % LANES == 0
    assert out_form in ("canonical", "semi")
    out_rows = L16 if out_form == "canonical" else SEMI
    # uint32 accumulator bound: C · 255² must not wrap.
    assert C * 255 * 255 < (1 << 32), f"contraction width {C} overflows"
    consts = _Consts(field)
    # Row-tile: largest power of two dividing n_rows, capped so the
    # x block (TR·KC·512B) and accumulator (TR·16KB) stay VMEM-friendly;
    # C==1 buckets (no accumulation) take bigger tiles.
    import math

    cap = 256 if C == 1 else max(1, 512 // min(C, 512)) * 8
    cap = min(cap, 256)
    TR = math.gcd(n_rows, cap if (cap & (cap - 1)) == 0 else 8)
    TR = max(TR, math.gcd(n_rows, 8), 1)
    KC = min(C, chunk_cap)
    while C % KC != 0:
        KC //= 2
    ksteps = C // KC
    nb = B // LANES
    grid = (nb, n_rows // TR, ksteps)

    def kernel(bv_ref, cd_ref, o_ref, acc_ref):
        j = pl.program_id(2)

        @pl.when(j == 0)
        def _():
            acc_ref[...] = jnp.zeros_like(acc_ref)

        bv = bv_ref[...]  # [TR, KC, 128] uint32 (< 256)
        cd = cd_ref[...]  # [32, TR, KC] uint32 (< 256)
        if C == 1:
            # No accumulation: plain broadcast mask on the VPU.
            acc_ref[...] = (cd[:, :, 0][:, :, None] * bv[:, 0, :][None]).astype(
                jnp.uint32
            )
        elif C <= 16:
            # Short contractions stay on the VPU: a [32,K]×[K,128] MXU dot
            # costs one full systolic pass at 32/128 M-utilization, so K≤16
            # buckets (the bulk of gadget rows: xor/and/packing rows) are
            # ~10× cheaper as K broadcast-MACs over the [32, TR, 128] tile.
            # Exact in uint32: 255·255·16 < 2^20.
            acc = cd[:, :, 0][:, :, None] * bv[:, 0, :][None]
            for c in range(1, C):
                acc = acc + cd[:, :, c][:, :, None] * bv[:, c, :][None]
            acc_ref[...] = acc.astype(jnp.uint32)
        else:
            # Mosaic lacks direct uint32↔float32 casts; route via int32.
            # Inputs are < 256, exact in bfloat16 (8-bit mantissa covers
            # integers to 256); the MXU multiplies bf16 pairs exactly
            # (≤ 16 significant bits) and accumulates in fp32, so the
            # chunk bound is identical to fp32 inputs — at ~4× the fp32
            # matmul throughput on v5e.
            bv_f = bv.astype(jnp.int32).astype(jnp.float32).astype(jnp.bfloat16)
            cd_f = cd.astype(jnp.int32).astype(jnp.float32).astype(jnp.bfloat16)
            add = jnp.stack(
                [
                    jnp.dot(
                        cd_f[:, t, :],
                        bv_f[t],
                        preferred_element_type=jnp.float32,
                    )
                    for t in range(TR)
                ],
                axis=1,
            )  # [32, TR, 128] exact integers < 2^24
            acc_ref[...] = acc_ref[...] + add.astype(jnp.int32).astype(jnp.uint32)

        @pl.when(j == ksteps - 1)
        def _():
            acc = acc_ref[...]
            rows = [acc[d] for d in range(L8)]  # each [TR, 128]
            if out_form == "canonical":
                out = _reduce_rows(rows, consts)
            else:
                out = _semi_reduce_rows(rows, consts)
            o_ref[...] = jnp.stack(out)

    @jax.jit
    def run(bv, cd):
        assert bv.shape == (n_rows, C, B)
        assert cd.shape == (L8, n_rows, C)
        out = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[
                pl.BlockSpec(
                    (TR, KC, LANES),
                    lambda ib, ir, jk: (ir, jk, ib),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (L8, TR, KC),
                    lambda ib, ir, jk: (0, ir, jk),
                    memory_space=pltpu.VMEM,
                ),
            ],
            out_specs=pl.BlockSpec(
                (out_rows, TR, LANES),
                lambda ib, ir, jk: (0, ir, ib),
                memory_space=pltpu.VMEM,
            ),
            out_shape=jax.ShapeDtypeStruct((out_rows, n_rows, B), jnp.uint32),
            scratch_shapes=[pltpu.VMEM((L8, TR, LANES), jnp.uint32)],
            interpret=interpret,
        )(bv, cd)
        return out

    return run


def make_bits_matvec_bucket(field: PrimeField, K: int, n_rows: int, B: int,
                            interpret: bool = False,
                            out_form: str = "canonical"):
    """Fused bucket matvec for BIT witnesses: x entries are 0/1, F is the
    coefficient digit planes (product digit = coeff digit · bit), so
    chunks of 512 stay exact in fp32 (512·255 < 2²⁴)."""
    return make_fold_matvec_bucket(
        field, K, n_rows, B, chunk_cap=512, interpret=interpret,
        out_form=out_form,
    )


# Maximum ELL row width supported by the fused limbs path: the uint32
# digit accumulator holds Σ over 32K digit pairs of products < 255².
MAX_FUSED_LIMBS_K = ((1 << 32) // (255 * 255)) // 32  # = 2064


def make_limbs_matvec_bucket(field: PrimeField, K: int, n_rows: int, B: int,
                             interpret: bool = False,
                             out_form: str = "canonical"):
    """Fused bucket matvec for FIELD-VALUED witnesses.

    The modmul disappears into a static linear map: with a static
    coefficient c and witness digits zd[j] (8-bit, little-endian),

        c·z ≡ Σ_j zd[j] · (c·2^{8j} mod p)      (mod p, unreduced digits)

    so each ELL entry contributes F_{c}[d, j]·zd[j] where
    F_c[d, j] = digit d of (c·2^{8j} mod p) is HOST-precomputed. Per
    bucket the row sum over K entries and 32 digit positions is one
    [32, 32K] × [32K, B] MXU matmul per row — the same kernel as the bits
    path with contraction width 32K and digit·digit chunks of 256
    (256·255² < 2²⁴, exact in fp32). Replaces the reference's per-entry
    `eval` loop (test_cs.rs:239-253) for field-valued circuits.

    Inputs: zd [n_rows, 32K, B] witness digits (k-major, j-minor) and
    F [32, n_rows, 32K]; output [16, n_rows, B] canonical limbs."""
    assert K <= MAX_FUSED_LIMBS_K, f"row width {K} exceeds fused-limbs bound"
    return make_fold_matvec_bucket(
        field, 32 * K, n_rows, B, chunk_cap=256, interpret=interpret,
        out_form=out_form,
    )


def _mulcmp_kernel(consts: _Consts, a_ref, b_ref, c_ref, o_ref):
    a17 = [a_ref[i] for i in range(SEMI)]
    b17 = [b_ref[i] for i in range(SEMI)]
    c17 = [c_ref[i] for i in range(SEMI)]
    o_ref[...] = _mulcmp_rows(a17, b17, c17, consts)[None]


def make_mulcmp(field: PrimeField, interpret: bool = False):
    """Fused satisfiability compare: semi-reduced az, bz, cz
    (uint32[17, N] each, N a multiple of TILE) → uint32[N] violation mask
    (0 = az·bz ≡ cz mod p). One 17×17 convolution + one canonical
    reduction per element — replaces canonicalizing all three matvec
    outputs and running a separate full modmul + compare.

    Requires field.NUM_BITS ≥ 250 (the borrow-free −c trick needs
    p·2^11 to dominate any semi-reduced value)."""
    assert field.NUM_BITS >= 250, "mulcmp needs p ≥ 2^249"
    consts = _Consts(field)
    k = partial(_mulcmp_kernel, consts)

    @jax.jit
    def run(a, b, c):
        n = a.shape[1]
        assert a.shape == b.shape == c.shape == (SEMI, n)
        assert n % TILE == 0, "pad batch to TILE"
        grid = (n // TILE,)
        blk_in = pl.BlockSpec(
            (SEMI, SUB, LANES), lambda i: (0, i, 0), memory_space=pltpu.VMEM
        )
        out = pl.pallas_call(
            k,
            grid=grid,
            in_specs=[blk_in] * 3,
            out_specs=pl.BlockSpec(
                (1, SUB, LANES), lambda i: (0, i, 0), memory_space=pltpu.VMEM
            ),
            out_shape=jax.ShapeDtypeStruct((1, n // LANES, LANES), jnp.uint32),
            interpret=interpret,
        )(
            a.reshape(SEMI, n // LANES, LANES),
            b.reshape(SEMI, n // LANES, LANES),
            c.reshape(SEMI, n // LANES, LANES),
        )
        return out.reshape(n)

    return run


def fold_digit_table(field: PrimeField, coeff_table) -> np.ndarray:
    """uint32[n_coeff, 32, 32]: entry [t, j, d] = digit d of
    (coeff_table[t] · 2^{8j} mod p) — the per-coefficient fold matrices
    for `make_limbs_matvec_bucket`."""
    p = field.p
    out = np.zeros((len(coeff_table), L8, L8), np.uint32)
    for t, c in enumerate(coeff_table):
        c = int(c) % p
        for j in range(L8):
            out[t, j] = _digits((c << (8 * j)) % p, 8, L8)
    return out
