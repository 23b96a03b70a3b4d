"""Python bindings for the native (C++) synthesis core.

`NativeBuilder` is the fast graph-builder: it synthesizes circuits from
the bit-oriented gadget family (boolean algebra with constant folding,
MultiEq-batched addmany, full sha256/blake2s compressions) at native
speed and emits the same artifacts as the Python path — a compiled
R1CS and a witness tape consumable by WitnessProgram. Parity with the
Python gadgets is enforced in tests/test_native_synthesis.py.

The shared object builds with:  make -C bellpepper_tpu/native
(or is built on demand by `load_library`)."""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
from typing import List, Optional, Sequence

import numpy as np

from ..compile.tape import V_CONST, V_VAR, Op
from ..fields import SCALAR, PrimeField
from ..r1cs import COOMatrix, R1CS

_HERE = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_HERE, "_synthesis.so")
_SRC = os.path.join(_HERE, "synthesis.cpp")

_OPCODE_NAMES = [
    "xor", "and", "and_not", "nor", "ch", "maj", "addmany",
    "fadd", "fmul", "finv", "copy", "pack",
    "fbits_le", "select", "lookup", "num_iszero", "num_inv_or_one",
]

_lib = None


def _src_hash() -> str:
    with open(_SRC, "rb") as f:
        return hashlib.sha256(f.read()).hexdigest()


def load_library():
    global _lib
    if _lib is not None:
        return _lib
    # Rebuild when the .so is missing or was built from different source.
    # A content hash (sidecar file) is the check — mtimes are not preserved
    # by git checkout, so they can't distinguish stale from fresh builds.
    stamp = _SO + ".srchash"
    want = _src_hash()
    have = None
    if os.path.exists(_SO) and os.path.exists(stamp):
        with open(stamp) as f:
            have = f.read().strip()
    if have != want:
        subprocess.run(
            ["g++", "-O2", "-shared", "-fPIC", "-std=c++17", "-o", _SO, _SRC],
            check=True,
        )
        with open(stamp, "w") as f:
            f.write(want)
    lib = ctypes.CDLL(_SO)
    lib.bp_builder_new.restype = ctypes.c_void_p
    lib.bp_builder_new.argtypes = [ctypes.POINTER(ctypes.c_uint64)]
    lib.bp_builder_free.argtypes = [ctypes.c_void_p]
    for name, res, args in [
        ("bp_alloc_bit", ctypes.c_int64, [ctypes.c_void_p]),
        ("bp_const_view", ctypes.c_int64, [ctypes.c_int]),
        ("bp_not", ctypes.c_int64, [ctypes.c_int64]),
        ("bp_xor", ctypes.c_int64, [ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64]),
        ("bp_and", ctypes.c_int64, [ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64]),
        ("bp_ch", ctypes.c_int64, [ctypes.c_void_p] + [ctypes.c_int64] * 3),
        ("bp_maj", ctypes.c_int64, [ctypes.c_void_p] + [ctypes.c_int64] * 3),
        ("bp_alloc_num", ctypes.c_int64, [ctypes.c_void_p]),
        ("bp_num_add", ctypes.c_int64, [ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64]),
        ("bp_num_mul", ctypes.c_int64, [ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64]),
        ("bp_num_square", ctypes.c_int64, [ctypes.c_void_p, ctypes.c_int64]),
        ("bp_num_assert_nonzero", None, [ctypes.c_void_p, ctypes.c_int64]),
        ("bp_num_is_zero", ctypes.c_int64, [ctypes.c_void_p, ctypes.c_int64]),
        ("bp_multieq_begin", None, [ctypes.c_void_p]),
        ("bp_multieq_end", None, [ctypes.c_void_p]),
        ("bp_num_inputs", ctypes.c_int64, [ctypes.c_void_p]),
        ("bp_num_aux", ctypes.c_int64, [ctypes.c_void_p]),
        ("bp_num_constraints", ctypes.c_int64, [ctypes.c_void_p]),
        ("bp_nnz", ctypes.c_int64, [ctypes.c_void_p, ctypes.c_int]),
        ("bp_coeff_count", ctypes.c_int64, [ctypes.c_void_p]),
        ("bp_tape_len", ctypes.c_int64, [ctypes.c_void_p]),
        ("bp_tape_resolved_len", ctypes.c_int64, [ctypes.c_void_p]),
        ("bp_tape_op_count", ctypes.c_int64, [ctypes.c_void_p]),
    ]:
        fn = getattr(lib, name)
        fn.restype = res
        fn.argtypes = args
    i64p = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
    i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
    u64p = np.ctypeslib.ndpointer(np.uint64, flags="C_CONTIGUOUS")
    lib.bp_addmany.restype = None
    lib.bp_addmany.argtypes = [ctypes.c_void_p, i64p, ctypes.c_int, i64p]
    lib.bp_pack_bits.restype = ctypes.c_int64
    lib.bp_pack_bits.argtypes = [ctypes.c_void_p, i64p, ctypes.c_int]
    lib.bp_num_to_bits_strict.restype = None
    lib.bp_num_to_bits_strict.argtypes = [ctypes.c_void_p, ctypes.c_int64, i64p]
    lib.bp_num_cond_reverse.restype = None
    lib.bp_num_cond_reverse.argtypes = [
        ctypes.c_void_p,
        ctypes.c_int64,
        ctypes.c_int64,
        ctypes.c_int64,
        i64p,
    ]
    lib.bp_lookup3_xy.restype = None
    lib.bp_lookup3_xy.argtypes = [ctypes.c_void_p, i64p, u64p, i64p]
    lib.bp_lookup3_xy_cn.restype = ctypes.c_int64
    lib.bp_lookup3_xy_cn.argtypes = [ctypes.c_void_p, i64p, u64p]
    lib.bp_sha256_compression.restype = None
    lib.bp_sha256_compression.argtypes = [ctypes.c_void_p, i64p, i64p, i64p]
    lib.bp_sha256_iv.restype = None
    lib.bp_sha256_iv.argtypes = [i64p]
    lib.bp_blake2s_compression.restype = None
    lib.bp_blake2s_compression.argtypes = [
        ctypes.c_void_p,
        i64p,
        i64p,
        ctypes.c_uint64,
        ctypes.c_int,
    ]
    lib.bp_get_coo.restype = None
    lib.bp_get_coo.argtypes = [ctypes.c_void_p, ctypes.c_int, i32p, i32p, i32p]
    lib.bp_get_coeffs.restype = None
    lib.bp_get_coeffs.argtypes = [ctypes.c_void_p, u64p]
    lib.bp_get_tape.restype = None
    lib.bp_get_tape.argtypes = [ctypes.c_void_p, i64p]
    lib.bp_get_tape_resolved.restype = None
    lib.bp_get_tape_resolved.argtypes = [ctypes.c_void_p, i64p, i64p]
    _lib = lib
    return lib


class _NativeTape:
    """Duck-typed tape handing the native op stream to WitnessProgram."""

    def __init__(self, field, num_inputs, num_aux, ops, free_slots):
        self.field = field
        self._snapshot = (num_inputs, num_aux, ops, free_slots)

    def snapshot(self):
        return self._snapshot


class NativeBuilder:
    """Native circuit builder. Views are opaque ints (Boolean encodings
    shared with the C++ side); slot numbering matches the Python path."""

    def __init__(self, field: PrimeField = SCALAR):
        self.field = field
        lib = load_library()
        pw = (ctypes.c_uint64 * 4)(
            *[(field.p >> (64 * i)) & 0xFFFFFFFFFFFFFFFF for i in range(4)]
        )
        self._lib = lib
        self._b = lib.bp_builder_new(pw)
        self._free_order: List[int] = []  # aux indices of free bits, in order

    def __del__(self):
        if getattr(self, "_b", None):
            self._lib.bp_builder_free(self._b)
            self._b = None

    # -- gadget API ---------------------------------------------------------
    def alloc_bit(self) -> int:
        v = self._lib.bp_alloc_bit(self._b)
        self._free_order.append(v >> 2)  # slotcode
        return v

    @staticmethod
    def constant(b: bool) -> int:
        return 2 if b else 0

    def not_(self, v: int) -> int:
        return self._lib.bp_not(v)

    def xor(self, a: int, b: int) -> int:
        return self._lib.bp_xor(self._b, a, b)

    def and_(self, a: int, b: int) -> int:
        return self._lib.bp_and(self._b, a, b)

    def ch(self, a: int, b: int, c: int) -> int:
        return self._lib.bp_ch(self._b, a, b, c)

    def maj(self, a: int, b: int, c: int) -> int:
        return self._lib.bp_maj(self._b, a, b, c)

    # -- field gadget API (AllocatedNum family) ------------------------------
    def alloc_num(self) -> int:
        """Free field-valued slot; returns its SLOTCODE (not a view)."""
        sc = self._lib.bp_alloc_num(self._b)
        self._free_order.append(sc)
        return sc

    def num_add(self, sa: int, sb: int) -> int:
        return self._lib.bp_num_add(self._b, sa, sb)

    def num_mul(self, sa: int, sb: int) -> int:
        return self._lib.bp_num_mul(self._b, sa, sb)

    def num_square(self, sa: int) -> int:
        return self._lib.bp_num_square(self._b, sa)

    def num_assert_nonzero(self, sa: int) -> None:
        self._lib.bp_num_assert_nonzero(self._b, sa)

    def num_to_bits_le_strict(self, sa: int) -> List[int]:
        """Strict in-field LE decomposition (num.rs:128-251); returns
        NUM_BITS Boolean views, LSB first."""
        out = np.empty(self.field.NUM_BITS, np.int64)
        self._lib.bp_num_to_bits_strict(self._b, sa, out)
        return list(out)

    def num_conditionally_reverse(self, sa: int, sb: int, cond: int):
        """(b, a) if cond else (a, b) (num.rs:408-454); cond is a Boolean
        view, returns two num slotcodes."""
        out = np.empty(2, np.int64)
        self._lib.bp_num_cond_reverse(self._b, sa, sb, cond, out)
        return int(out[0]), int(out[1])

    def num_is_zero(self, sa: int) -> int:
        """3-constraint is-zero (boolean_utils.rs:52-98) over a num slot;
        returns a Boolean view."""
        return self._lib.bp_num_is_zero(self._b, sa)

    def _coords_u64(self, values, n) -> np.ndarray:
        flat = np.empty(n * 4, np.uint64)
        for i, v in enumerate(values):
            v = self.field.normalize(v)
            for j in range(4):
                flat[i * 4 + j] = (v >> (64 * j)) & 0xFFFFFFFFFFFFFFFF
        return flat

    def lookup3_xy(self, bits, coords):
        """3-bit window lookup (lookup.rs:32-118): bits = 3 Boolean views
        LSB-first, coords = 8 (x, y) int pairs; returns (x, y) slotcodes."""
        assert len(bits) == 3 and len(coords) == 8
        flat = np.concatenate(
            [
                self._coords_u64([c[0] for c in coords], 8),
                self._coords_u64([c[1] for c in coords], 8),
            ]
        )
        out = np.empty(2, np.int64)
        self._lib.bp_lookup3_xy(
            self._b, np.asarray(bits, np.int64), flat, out
        )
        return int(out[0]), int(out[1])

    def lookup3_xy_with_conditional_negation(self, bits, coords):
        """2-bit lookup + sign bit (lookup.rs:122-187): bits = 3 views,
        coords = 4 (x, y) pairs; returns the y slotcode (x is a
        constraint-free LC, matching the Python gadget's Num)."""
        assert len(bits) == 3 and len(coords) == 4
        flat = self._coords_u64([c[1] for c in coords], 4)
        return int(
            self._lib.bp_lookup3_xy_cn(self._b, np.asarray(bits, np.int64), flat)
        )

    def pack_bits(self, views: Sequence[int]) -> int:
        """Pack Boolean views (up to field CAPACITY) into one num slot."""
        vs = np.asarray(list(views)[: self.field.CAPACITY], np.int64)
        return self._lib.bp_pack_bits(self._b, vs, len(vs))

    def multieq_begin(self):
        self._lib.bp_multieq_begin(self._b)

    def multieq_end(self):
        self._lib.bp_multieq_end(self._b)

    def addmany(self, words: Sequence[Sequence[int]]) -> List[int]:
        n = len(words)
        flat = np.asarray([v for w in words for v in w], np.int64)
        assert flat.shape[0] == 32 * n
        out = np.empty(32, np.int64)
        self._lib.bp_addmany(self._b, flat, n, out)
        return list(out)

    def alloc_u32(self, n_bits: int = 32) -> List[int]:
        return [self.alloc_bit() for _ in range(n_bits)]

    def sha256_iv(self) -> List[int]:
        out = np.empty(256, np.int64)
        self._lib.bp_sha256_iv(out)
        return list(out)

    def sha256_compression(self, in_bits: Sequence[int], state: Sequence[int]) -> List[int]:
        """in_bits: 512 views (big-endian bit order, like the gadget);
        state: 256 views = 8 words × 32 LSB-first bits."""
        assert len(in_bits) == 512 and len(state) == 256
        inp = np.asarray(in_bits, np.int64)
        st = np.asarray(state, np.int64)
        out = np.empty(256, np.int64)
        self._lib.bp_sha256_compression(self._b, inp, st, out)
        return list(out)

    def blake2s_compression(self, h: Sequence[int], m: Sequence[int], t: int, f: bool) -> List[int]:
        assert len(h) == 256 and len(m) == 512
        hb = np.asarray(h, np.int64).copy()
        mb = np.asarray(m, np.int64)
        self._lib.bp_blake2s_compression(self._b, hb, mb, t, 1 if f else 0)
        return list(hb)

    # -- extraction -----------------------------------------------------------
    def _slot(self, slotcode: int) -> int:
        """slotcode (idx<<1 | is_aux) → global slot (inputs first)."""
        idx = slotcode >> 1
        if slotcode & 1:
            return int(self._lib.bp_num_inputs(self._b)) + idx
        return idx

    def _view(self, v: int):
        if (v & 1) == 0:
            return (V_CONST, 1 if v & 2 else 0, 0)
        return (V_VAR, self._slot(v >> 2), 1 if v & 2 else 0)

    def view(self, v: int):
        """Decode an opaque Boolean view into a tape-view triple
        (V_CONST, value, 0) | (V_VAR, slot, negated) — the format
        pipeline.build_chained_witness takes as carry_views."""
        return self._view(v)

    def finish(self):
        """Extract (R1CS, tape) — identical artifacts to
        ShapeCS.finish() + TapeCS for the same circuit."""
        lib, b = self._lib, self._b
        num_inputs = int(lib.bp_num_inputs(b))
        num_aux = int(lib.bp_num_aux(b))
        num_constraints = int(lib.bp_num_constraints(b))

        mats = {}
        for mi, name in enumerate("abc"):
            nnz = int(lib.bp_nnz(b, mi))
            rows = np.empty(nnz, np.int32)
            cols = np.empty(nnz, np.int32)
            cids = np.empty(nnz, np.int32)
            if nnz:
                lib.bp_get_coo(b, mi, rows, cols, cids)
            mats[name] = COOMatrix(rows=rows, cols=cols, coeff_ids=cids)

        n_coeff = int(lib.bp_coeff_count(b))
        raw = np.empty(n_coeff * 4, np.uint64)
        lib.bp_get_coeffs(b, raw)
        coeff_table = [
            int(raw[i * 4])
            | (int(raw[i * 4 + 1]) << 64)
            | (int(raw[i * 4 + 2]) << 128)
            | (int(raw[i * 4 + 3]) << 192)
            for i in range(n_coeff)
        ]

        r1cs = R1CS(
            field=self.field,
            num_inputs=num_inputs,
            num_aux=num_aux,
            num_constraints=num_constraints,
            a=mats["a"],
            b=mats["b"],
            c=mats["c"],
            coeff_table=coeff_table,
            names=None,
        )

        # Decode the RESOLVED tape into WitnessProgram ops. The C++ side
        # already resolved slotcodes against the final input count and
        # expanded Boolean views to (kind, slot_or_value, negated)
        # triples; it exports an operand stream plus an op table whose
        # rows (opcode, n_outs, marker, outs_off, args_off) fix every
        # arg width statically, so ops decode GROUP-wise with numpy
        # fancy indexing (the per-element Python walk was the hot loop
        # of finish at sha256 scale: ~80 ms/block → ~15 ms).
        tl = int(lib.bp_tape_resolved_len(b))
        n_ops = int(lib.bp_tape_op_count(b))
        flat = np.empty(max(tl, 1), np.int64)
        opt = np.empty(max(n_ops * 5, 1), np.int64)
        if n_ops:
            lib.bp_get_tape_resolved(b, flat, opt)
        opt = opt[: n_ops * 5].reshape(-1, 5)
        M = 0xFFFFFFFFFFFFFFFF
        names = _OPCODE_NAMES
        ops: List[Optional[Op]] = [None] * n_ops

        def take(off: np.ndarray, width: int) -> np.ndarray:
            if width == 0:
                return np.empty((len(off), 0), np.int64)
            return flat[off[:, None] + np.arange(width)]

        uniq, inv = (
            np.unique(opt[:, :3], axis=0, return_inverse=True)
            if n_ops
            else (np.empty((0, 3), np.int64), np.empty(0, np.int64))
        )
        for g in range(len(uniq)):
            code, n_outs, marker = (int(v) for v in uniq[g])
            name = names[code]
            sel = np.nonzero(inv == g)[0]
            outs_m = take(opt[sel, 3], n_outs).tolist()
            aoff = opt[sel, 4]
            sel_l = sel.tolist()
            if name == "addmany":
                n_words = -marker
                am = take(aoff, n_words * 96).reshape(-1, n_words, 32, 3)
                for oi, o_, a_ in zip(sel_l, outs_m, am.tolist()):
                    ops[oi] = Op(name, o_, a_)
            elif name in ("ch", "maj", "pack"):
                am = take(aoff, 3 * marker).reshape(-1, marker, 3)
                for oi, o_, a_ in zip(sel_l, outs_m, am.tolist()):
                    ops[oi] = Op(name, o_, a_)
            elif name == "select":
                am = take(aoff, 5).tolist()
                for oi, o_, row in zip(sel_l, outs_m, am):
                    ops[oi] = Op(name, o_, [tuple(row[:3]), row[3], row[4]])
            elif name == "lookup":
                nbits = marker  # index bit count; table has 2^nbits U256s
                nt = 4 << nbits
                am = take(aoff, 3 * nbits + nt).tolist()
                for oi, o_, row in zip(sel_l, outs_m, am):
                    views = [tuple(row[3 * k : 3 * k + 3]) for k in range(nbits)]
                    tw = row[3 * nbits :]
                    table = tuple(
                        (tw[4 * e] & M)
                        | ((tw[4 * e + 1] & M) << 64)
                        | ((tw[4 * e + 2] & M) << 128)
                        | ((tw[4 * e + 3] & M) << 192)
                        for e in range(1 << nbits)
                    )
                    ops[oi] = Op(name, o_, (views, table))
            elif name in ("num_iszero", "num_inv_or_one"):
                am = take(aoff, 2 * marker).reshape(-1, marker, 2)
                for oi, o_, a_ in zip(sel_l, outs_m, am.tolist()):
                    ops[oi] = Op(name, o_, [tuple(p) for p in a_])
            else:  # bit ops + field ops + fbits_le: plain slots
                am = take(aoff, marker).tolist()
                for oi, o_, a_ in zip(sel_l, outs_m, am):
                    ops[oi] = Op(name, o_, a_)

        produced = {o for op in ops for o in op.outs}
        free = [
            self._slot(sc)
            for sc in self._free_order
            if self._slot(sc) not in produced
        ]
        tape = _NativeTape(self.field, num_inputs, num_aux, ops, free)
        return r1cs, tape
