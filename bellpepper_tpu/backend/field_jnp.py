"""Vectorized prime-field arithmetic on limb-decomposed JAX arrays.

The device representation of a field element is **16 little-endian limbs of
16 bits** stored as ``uint32[..., 16]`` (canonical form, no Montgomery —
values map 1:1 to the reference's `to_repr` bytes, which keeps every
digest/shape-hash oracle bit-exact).

Multiplication strategy (TPU-friendly, exact, no 64-bit ints and no
data-dependent control flow):

  1. split 16-bit limbs into 32 × 8-bit limbs — 8×8-bit products fit
     comfortably in 32-bit accumulators even after summing 32 of them
     (≤ 32·255² < 2²¹);
  2. schoolbook polynomial multiply (static unrolled shifts; the Pallas
     kernel tiles the same computation onto the MXU);
  3. carry-normalize to 8-bit digits;
  4. fold the >2²⁵⁶ part with a precomputed table T[i] = 2^(8·(32+i)) mod p:
     value = low + high · T — an integer matmul (MXU-shaped), repeated
     three times until the value fits 2²⁵⁶ + ε;
  5. a few branch-free conditional subtractions of p.

Everything here is shape-static and jit-compatible; ops broadcast over any
leading batch shape. The per-op oracles are the Python-int fields in
bellpepper_tpu.fields (tested against each other in
tests/test_field_backend.py)."""

from __future__ import annotations

from functools import partial
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from ..fields import PrimeField

L16 = 16  # storage limbs (16-bit each) → 256 bits
L8 = 32  # multiplication limbs (8-bit each)
MASK16 = np.uint32(0xFFFF)
MASK8 = np.uint32(0xFF)


def _int_to_limbs16(v: int) -> np.ndarray:
    return np.array([(v >> (16 * i)) & 0xFFFF for i in range(L16)], dtype=np.uint32)


def _int_to_limbs8(v: int, n: int = L8) -> np.ndarray:
    return np.array([(v >> (8 * i)) & 0xFF for i in range(n)], dtype=np.uint32)


class FieldBackend:
    """Device arithmetic for one prime field. Get instances via
    :func:`get_backend` (cached per modulus)."""

    def __init__(self, field: PrimeField):
        # 255-bit bound: add/sub/_carry16 drop the carry out of limb 15, so
        # a full 256-bit modulus would wrap silently (a+b can reach 2p-2).
        assert field.NUM_BITS <= 255, "backend supports fields up to 255 bits"
        self.field = field
        p = field.p
        # Build every constant in numpy and ship them in ONE device_put:
        # eager jnp ops here (asarray converts, .at[].set) each compile a
        # tiny executable on first use — ~0.4 s apiece, ~3 s of pure
        # warmup per fresh process, all avoidable host→device transfers.
        # Fold table: T[i, :] = 8-bit limbs of (2^(8*(32+i)) mod p), with
        # rows for every digit position a 512-bit product can reach.
        T = np.stack([_int_to_limbs8(pow(2, 8 * (L8 + i), p)) for i in range(34)])
        # Shifted moduli for the final branch-free shift-subtract chain:
        # after the folds the value is < 2²⁶⁵, so the quotient is
        # < 2^(265 - (NUM_BITS-1)); one conditional subtract per
        # quotient bit. p·2^k as 17 × 16-bit limbs, high k first.
        self._n_sub_steps = 266 - field.NUM_BITS
        PS = np.stack(
            [
                np.array(
                    [((p << k) >> (16 * i)) & 0xFFFF for i in range(17)],
                    dtype=np.uint32,
                )
                for k in range(self._n_sub_steps - 1, -1, -1)
            ]
        )
        one = np.zeros(L16, np.uint32)
        one[0] = 1
        # Exponent bits for Fermat inversion: p - 2, MSB first (device
        # array so the square-and-multiply loop is a single fori_loop).
        nbits = (p - 2).bit_length()
        consts = jax.device_put(
            {
                "p_limbs16": _int_to_limbs16(p),
                "p_limbs8": _int_to_limbs8(p),
                "fold_T": T,  # [34, 32] uint32, entries < 256
                "p_shifted16": PS,  # [n_steps, 17]
                "zero": np.zeros(L16, np.uint32),
                "one": one,
                "_inv_exp_bits": np.asarray(
                    [(p - 2) >> (nbits - 1 - i) & 1 for i in range(nbits)],
                    dtype=np.uint32,
                ),
            }
        )
        for k, v in consts.items():
            setattr(self, k, v)

    # ------------------------------------------------------------------
    # host conversions (numpy)
    # ------------------------------------------------------------------
    def to_limbs(self, values) -> np.ndarray:
        """List/array of python ints → uint32[N, 16]."""
        out = np.empty((len(values), L16), dtype=np.uint32)
        for j, v in enumerate(values):
            v = int(v)
            for i in range(L16):
                out[j, i] = (v >> (16 * i)) & 0xFFFF
        return out

    def from_limbs(self, arr) -> list:
        """uint32[..., 16] → python ints (flattened leading dims)."""
        a = np.asarray(arr, dtype=np.uint64).reshape(-1, L16)
        return [int(sum(int(x) << (16 * i) for i, x in enumerate(row))) for row in a]

    # ------------------------------------------------------------------
    # small helpers (jnp)
    # ------------------------------------------------------------------
    @staticmethod
    def _carry16(x: jnp.ndarray) -> jnp.ndarray:
        """Propagate carries so every limb < 2^16. x: uint32[..., L] with
        limbs possibly exceeding 16 bits. A lax.scan over the limb axis —
        sequential in limbs, vectorized over the batch, constant-size HLO."""
        xT = jnp.moveaxis(x, -1, 0)

        def step(carry, limb):
            tot = limb + carry
            return tot >> 16, tot & MASK16

        # Derive the carry init from x so its sharding/varying-axes type
        # matches the loop body under shard_map.
        _, outT = jax.lax.scan(step, x[..., 0] * jnp.uint32(0), xT)
        return jnp.moveaxis(outT, 0, -1)

    @staticmethod
    def _carry8(x: jnp.ndarray, out_limbs: int) -> jnp.ndarray:
        """Carry-normalize 8-bit digits; pads/truncates to out_limbs
        (truncation only discards provably-zero digits at call sites)."""
        L = x.shape[-1]
        if L < out_limbs:
            pad = [(0, 0)] * (x.ndim - 1) + [(0, out_limbs - L)]
            x = jnp.pad(x, pad)
        xT = jnp.moveaxis(x, -1, 0)

        def step(carry, limb):
            tot = limb + carry
            return tot >> 8, tot & MASK8

        _, outT = jax.lax.scan(step, x[..., 0] * jnp.uint32(0), xT)
        return jnp.moveaxis(outT, 0, -1)[..., :out_limbs]

    @staticmethod
    def _borrow_sub(x: jnp.ndarray, y: jnp.ndarray):
        """(x - y) limbwise with borrow; returns (diff, final_borrow).
        y broadcasts against x; limbs are 16-bit in uint32 lanes."""
        xT = jnp.moveaxis(x, -1, 0)
        yT = jnp.moveaxis(jnp.broadcast_to(y, x.shape), -1, 0)

        def step(borrow, limbs):
            xi, yi = limbs
            d = xi - yi - borrow
            return d >> 31, d & MASK16

        borrow, outT = jax.lax.scan(
            step, x[..., 0] * jnp.uint32(0), (xT, yT)
        )
        return jnp.moveaxis(outT, 0, -1), borrow

    def _cond_sub_p16(self, x: jnp.ndarray) -> jnp.ndarray:
        """x - p if x >= p else x, for x < 2p, 16-bit limbs."""
        diff, borrow = self._borrow_sub(x, self.p_limbs16)
        return jnp.where((borrow == 0)[..., None], diff, x)

    @staticmethod
    def _split8(a16: jnp.ndarray) -> jnp.ndarray:
        """uint32[..., 16] (16-bit limbs) → uint32[..., 32] (8-bit limbs)."""
        lo = a16 & MASK8
        hi = (a16 >> 8) & MASK8
        return jnp.stack([lo, hi], axis=-1).reshape(a16.shape[:-1] + (L8,))

    @staticmethod
    def _join16(a8: jnp.ndarray) -> jnp.ndarray:
        """uint32[..., 32] (8-bit limbs, already < 256) → uint32[..., 16]."""
        r = a8.reshape(a8.shape[:-1] + (L16, 2))
        return r[..., 0] | (r[..., 1] << 8)

    # ------------------------------------------------------------------
    # field ops (jnp; jit-compatible, broadcast over leading dims)
    # ------------------------------------------------------------------
    def add(self, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
        s = self._carry16(a + b)
        return self._cond_sub_p16(s)

    def sub(self, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
        # (a + p) - b via borrow chain, then one conditional subtract
        # (result always < 2p).
        ap = self._carry16(a + self.p_limbs16)
        s, _ = self._borrow_sub(ap, b)
        return self._cond_sub_p16(s)

    def neg(self, a: jnp.ndarray) -> jnp.ndarray:
        # p - a, with a == 0 mapping to 0.
        res, _ = self._borrow_sub(jnp.broadcast_to(self.p_limbs16, a.shape), a)
        is_zero = jnp.all(a == 0, axis=-1, keepdims=True)
        return jnp.where(is_zero, jnp.zeros_like(a), res)

    def mul(self, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
        """Full modular multiply; see module docstring for the pipeline."""
        a8 = self._split8(a)
        b8 = self._split8(b)
        # Schoolbook convolution: conv[k] = Σ_{i+j=k} a8[i]·b8[j], as a
        # fori_loop of 32 shifted multiply-accumulates; each partial fits
        # uint32 (≤ 32·255² < 2²¹). The Pallas kernel replaces this with
        # an MXU-tiled formulation.
        # conv0 derives from a8/b8 so its sharding type matches the body
        # under shard_map.
        conv0 = jnp.pad(
            a8 * jnp.uint32(0), [(0, 0)] * (a8.ndim - 1) + [(0, L8 - 1)]
        )

        def body(i, conv):
            ai = jax.lax.dynamic_slice_in_dim(a8, i, 1, axis=-1)
            seg = jax.lax.dynamic_slice_in_dim(conv, i, L8, axis=-1)
            return jax.lax.dynamic_update_slice_in_dim(
                conv, seg + ai * b8, i, axis=-1
            )

        conv = jax.lax.fori_loop(0, L8, body, conv0)
        return self._reduce_wide8(conv)

    def square(self, a: jnp.ndarray) -> jnp.ndarray:
        return self.mul(a, a)

    def _reduce_wide8(self, wide: jnp.ndarray) -> jnp.ndarray:
        """Reduce a wide value given as 8-bit-basis digits (each < 2²⁴)
        to canonical 16-limb form. Works for any digit count ≤ 64.

        Pipeline: carry-normalize → table fold (integer matmul on the
        high 34 digits) → second small fold → branch-free shift-subtract
        chain for the remaining quotient (< 2¹²)."""
        # Normalize to 66 digits (512-bit product + 2 carry digits).
        d = self._carry8(wide, 66)
        # Fold 1: value = low(32 digits) + Σ_i d[32+i]·T[i].
        # Accumulators ≤ 255 + 34·255² < 2²², so uint32 is safe; result
        # value < (1 + 34·255)·2²⁵⁶ < 2²⁷⁰ → 34 digits after carry.
        folded = d[..., :32] + jnp.matmul(
            d[..., 32:66], self.fold_T, preferred_element_type=jnp.uint32
        )
        folded = self._carry8(folded, 34)
        # Fold 2: two high digits remain; value < (1 + 2·255)·2²⁵⁶ < 2²⁶⁵.
        folded2 = folded[..., :32] + jnp.matmul(
            folded[..., 32:34], self.fold_T[:2], preferred_element_type=jnp.uint32
        )
        folded2 = self._carry8(folded2, 34)  # value < 2²⁶⁵ → ≤ 34 digits
        # To 17 × 16-bit limbs (272 bits).
        x = jnp.concatenate(
            [
                self._join16(folded2[..., :32]),
                (folded2[..., 32] | (folded2[..., 33] << 8))[..., None],
            ],
            axis=-1,
        )
        # Subtract p·2^k for each quotient bit (high first), keeping the
        # difference when it doesn't borrow. Exact long division,
        # data-independent. Outer scan over shift steps, inner scan over
        # limbs (via _borrow_sub).
        def step(xc, ps):
            diff, borrow = self._borrow_sub(xc, ps)
            return jnp.where((borrow == 0)[..., None], diff, xc), None

        x, _ = jax.lax.scan(step, x, self.p_shifted16)
        return x[..., :L16]

    def mul_pow2(self, a: jnp.ndarray, k: int) -> jnp.ndarray:
        """a · 2^k mod p with a constant k (coefficient fast path)."""
        c = jnp.broadcast_to(
            jnp.asarray(_int_to_limbs16(pow(2, k, self.field.p))), a.shape
        )
        return self.mul(a, c)

    def inv(self, a: jnp.ndarray) -> jnp.ndarray:
        """Batch inversion via Fermat: a^(p-2). Zero maps to zero.
        MSB-first square-and-multiply as one fori_loop (compiles the
        multiply kernel once, not once per exponent bit)."""
        bits = self._inv_exp_bits
        init = (a * jnp.uint32(0)).at[..., 0].set(1)

        def body(i, r):
            r = self.square(r)
            rm = self.mul(r, a)
            return jnp.where(bits[i] == 1, rm, r)

        return jax.lax.fori_loop(0, bits.shape[0], body, init)

    def pow_const(self, a: jnp.ndarray, e: int) -> jnp.ndarray:
        """a^e for a host-known exponent (same loop shape as inv)."""
        assert e >= 0
        if e == 0:
            return jnp.broadcast_to(self.one, a.shape).astype(jnp.uint32)
        nbits = e.bit_length()
        bits = jnp.asarray(
            [e >> (nbits - 1 - i) & 1 for i in range(nbits)], dtype=jnp.uint32
        )
        init = (a * jnp.uint32(0)).at[..., 0].set(1)

        def body(i, r):
            r = self.square(r)
            rm = self.mul(r, a)
            return jnp.where(bits[i] == 1, rm, r)

        return jax.lax.fori_loop(0, nbits, body, init)

    def eq(self, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
        """Elementwise equality over the limb axis → bool[...]."""
        return jnp.all(a == b, axis=-1)

    def is_zero(self, a: jnp.ndarray) -> jnp.ndarray:
        return jnp.all(a == 0, axis=-1)


_BACKENDS: Dict[int, FieldBackend] = {}


def get_backend(field: PrimeField) -> FieldBackend:
    be = _BACKENDS.get(field.p)
    if be is None:
        be = FieldBackend(field)
        _BACKENDS[field.p] = be
    return be
