"""WitnessProgram — compile a witness tape into a vectorized device program.

The tape (TapeCS) gives one op per witness slot. Compilation:

  1. assign each op a dependency level (free slots = level 0);
  2. group ops by (level, opcode[, arity]) into *stages* whose operand and
     output indices become static int32 arrays;
  3. evaluation executes stages in level order as gather → vector op →
     scatter over a values buffer, **batched over B independent circuit
     instances** (shape [B, num_slots]).

Value domains: bit/u32 ops live in a uint32 buffer; field ops in a limb
buffer [B, n_field_rows, 16] (only field-valued slots get limb rows).
Field operands are resolved at use time from one of three sources: a limb
row (field-op output), a u32 lift from the bit buffer (bit-domain slots,
ONE), or a caller-provided free-field input. For hash circuits the field
buffer is empty and witness generation is pure u32 vector code — the
TPU-native equivalent of the reference's SizedWitness straight-line
generators (witness_cs.rs:7-41)."""

from __future__ import annotations

from collections import defaultdict, deque
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..backend.field_jnp import get_backend
from ..fields import PrimeField
from .tape import V_CONST, V_VAR, Op, TapeCS

BIT_OUT_OPS = {"xor", "and", "and_not", "nor", "ch", "maj", "addmany",
               "num_iszero", "fbits_le"}
FIELD_OUT_OPS = {"fadd", "fmul", "finv", "copy", "pack", "num_inv_or_one",
                 "select", "lookup"}

# field-operand source kinds
SRC_ROW = 0  # flimbs row
SRC_LIFT = 1  # lift u32 value from the bit buffer
SRC_FREE = 2  # caller-provided free-field limb input

# Field stages foldable into one lax.scan step (see _build_scan_tables):
# uniform (a, b, cond) operand signature, field-row + slot outputs.
SCAN_OPS = {"fadd": 0, "fmul": 1, "finv": 2, "copy": 3, "select": 4}
MIN_SCAN_RUN = 4
MAX_PATTERN = 8  # longest static op pattern folded without a switch


def _find_period(opcodes, max_d: int = MAX_PATTERN):
    """Smallest d ≤ max_d with opcodes[i] == opcodes[i % d] for all i (and
    d | len) — sequential gadget chains are usually periodic (e.g. config
    1's mul/add/square ⇒ fmul,fadd,fmul). A periodic run scans over
    pattern REPETITIONS with d statically-typed ops per body step, which
    drops the 5-way lax.switch and its per-step dispatch overhead.
    finv is excluded for d > 1 (its Fermat ladder would inline d times)."""
    L = len(opcodes)
    for d in range(1, min(max_d, L) + 1):
        if L % d:
            continue
        if d > 1 and "finv" in set(opcodes[:d]):
            continue
        if all(opcodes[i] == opcodes[i % d] for i in range(L)):
            return d
    return None


# Per-kernel-call step cap: 96·16 rows ≈ 6 MB VMEM out block. 96 lets
# config-1-shaped chains (30 reps × 3 ops) run in ONE kernel call per
# chunk — the extra inter-segment HBM round trip at cap 64 measured
# ~4% of the whole production step (523 → 542M c/s A/B on v5e).
_CHAIN_MAX_STEPS = 96


def _detect_linear_chain(run):
    """If a scan run is a *linear periodic field chain* — every stage has
    width 1, opcode in {fmul, fadd}, and SRC_ROW operands that are either
    the IMMEDIATELY preceding stage's output row or rep-invariant external
    rows — return a spec for field_pallas.make_chain_kernel, else None.

    This is the shape of sequential gadget chains (x = (x·b + a)²,
    Horner evaluation, hash-chain threading): the generic scan pays a
    kernel launch + limb relayouts + a [B, F, 16] gather/scatter per op;
    the fused kernel keeps the running value in VPU registers for the
    whole chain (BASELINE config 1's witness side)."""
    n = len(run)
    if n < 2 * MIN_SCAN_RUN:
        return None
    raw = []
    out_rows = []
    out_slots = []
    prev_out = None
    for st in run:
        if st.opcode not in ("fmul", "fadd"):
            return None
        slots = np.asarray(st.arrs["out_slots"])
        if slots.shape != (1,):
            return None
        cls = []
        for pfx in ("a", "b"):
            if int(np.asarray(st.arrs[pfx + "_kind"])[0]) != SRC_ROW:
                return None
            idx = int(np.asarray(st.arrs[pfx + "_idx"])[0])
            cls.append(
                "prev" if prev_out is not None and idx == prev_out else ("row", idx)
            )
        prev_out = int(np.asarray(st.outs)[0])
        out_rows.append(prev_out)
        out_slots.append(int(slots[0]))
        raw.append((st.opcode, cls[0], cls[1]))

    produced = set(out_rows)
    for d in range(1, MAX_PATTERN + 1):
        if n % d or n // d < 2:
            continue
        # Canonical per-position descs come from rep 1 (rep 0's first
        # stage reads the chain INIT as an external row where later reps
        # read 'prev' — the only allowed anomaly).
        descs = raw[d : 2 * d]
        init_row = None
        ok = True
        for i, got in enumerate(raw):
            exp = descs[i % d]
            if got == exp:
                continue
            if i == 0 and got[0] == exp[0]:
                rows0 = set()
                anomaly = False
                for slot in (1, 2):
                    if got[slot] == exp[slot]:
                        continue
                    if exp[slot] == "prev" and isinstance(got[slot], tuple):
                        rows0.add(got[slot][1])
                        anomaly = True
                    else:
                        anomaly = False
                        break
                if anomaly and len(rows0) == 1:
                    init_row = rows0.pop()
                    continue
            ok = False
            break
        if not ok:
            continue
        if any(c == "prev" for c in (descs[0][1], descs[0][2])):
            if init_row is None:
                continue  # no usable chain entry
        else:
            continue  # reps don't actually chain; generic scan handles it
        ext_rows = []
        seen = {}
        final = []
        for op, a, b in descs:
            enc = []
            for c in (a, b):
                if c == "prev":
                    enc.append("prev")
                else:
                    row = c[1]
                    if row in produced:
                        enc = None
                        break
                    if row not in seen:
                        seen[row] = len(ext_rows)
                        ext_rows.append(row)
                    enc.append(seen[row])
            if enc is None:
                break
            final.append((op, enc[0], enc[1]))
        if len(final) != d or init_row in produced:
            continue
        return {
            "descs": tuple(final),
            "init_row": init_row,
            "ext_rows": tuple(ext_rows),
            "n_reps": n // d,
            "out_rows": np.asarray(out_rows, np.int32),
            "out_slots": np.asarray(out_slots, np.int32),
        }
    return None


def _build_scan_tables(run, F_scratch: int, S_scratch: int):
    """Stack a run of field stages into per-step arrays for a lax.scan.

    Deep sequential field chains (e.g. 90 mul/add/square levels) would
    otherwise inline their HLO per stage — minutes of remote compile. The
    scan compiles ONE body with a 5-way lax.switch; each step's operand
    and output indices become scanned xs. Entries padded to the run's max
    width write to scratch row/slot (F_scratch/S_scratch), which nothing
    reads."""
    W = max(len(np.asarray(st.arrs["out_slots"])) for st in run)
    L = len(run)
    t = {
        "op": np.zeros(L, np.int32),
        "a_kind": np.full((L, W), SRC_LIFT, np.int32),
        "a_idx": np.zeros((L, W), np.int32),
        "b_kind": np.full((L, W), SRC_LIFT, np.int32),
        "b_idx": np.zeros((L, W), np.int32),
        "c_isc": np.ones((L, W), np.uint32),
        "c_cv": np.zeros((L, W), np.uint32),
        "c_idx": np.zeros((L, W), np.int32),
        "c_neg": np.zeros((L, W), np.uint32),
        "out_row": np.full((L, W), F_scratch, np.int32),
        "out_slot": np.full((L, W), S_scratch, np.int32),
    }
    for i, st in enumerate(run):
        oc = st.opcode
        w = len(np.asarray(st.arrs["out_slots"]))
        t["op"][i] = SCAN_OPS[oc]
        t["out_row"][i, :w] = np.asarray(st.outs)
        t["out_slot"][i, :w] = np.asarray(st.arrs["out_slots"])
        if oc == "select":
            t["a_kind"][i, :w] = np.asarray(st.arrs["x_kind"])
            t["a_idx"][i, :w] = np.asarray(st.arrs["x_idx"])
            t["b_kind"][i, :w] = np.asarray(st.arrs["y_kind"])
            t["b_idx"][i, :w] = np.asarray(st.arrs["y_idx"])
            t["c_isc"][i, :w] = np.asarray(st.arrs["c_isc"])
            t["c_cv"][i, :w] = np.asarray(st.arrs["c_cv"])
            t["c_idx"][i, :w] = np.asarray(st.arrs["c_idx"])
            t["c_neg"][i, :w] = np.asarray(st.arrs["c_neg"])
        else:
            t["a_kind"][i, :w] = np.asarray(st.arrs["a_kind"])
            t["a_idx"][i, :w] = np.asarray(st.arrs["a_idx"])
            if oc in ("fadd", "fmul"):
                t["b_kind"][i, :w] = np.asarray(st.arrs["b_kind"])
                t["b_idx"][i, :w] = np.asarray(st.arrs["b_idx"])
    # Host numpy on purpose: the tables embed as jit constants; device
    # arrays would be fetched BACK through the tunnel during MLIR
    # lowering (~70 s/buffer on the remote backend — see _ConstPool).
    return t


class _Stage:
    __slots__ = ("opcode", "outs", "arrs", "meta")

    def __init__(self, opcode, outs, arrs, meta=None):
        # Arrays stay numpy for the program's whole host life: build()
        # pools every stage array into ONE flat device buffer per dtype
        # (_ConstPool) and reads static slices at trace time. Shipping the
        # ~3000 individual arrays instead (even as one batched device_put)
        # paid per-array tunnel latency — 4.3 s of the flagship's 4.4 s
        # host prep on the remote TPU backend; the pool is 2 transfers.
        self.opcode = opcode
        self.outs = np.asarray(outs)
        self.arrs = {k: np.asarray(v) for k, v in arrs.items()}
        self.meta = meta


class _DevStage:
    """Trace-time view of a _Stage whose arrays are pool slices."""

    __slots__ = ("opcode", "outs", "arrs", "meta")

    def __init__(self, st: "_Stage", dev):
        self.opcode = st.opcode
        self.outs = dev(st.outs)
        self.arrs = {k: dev(v) for k, v in st.arrs.items()}
        self.meta = st.meta


class _PackedStage:
    """Trace-time stage view for the packed evaluator (remapped arrs;
    outputs addressed by contiguous row block, not by `outs`)."""

    __slots__ = ("opcode", "meta", "arrs")

    def __init__(self, opcode, meta, arrs):
        self.opcode = opcode
        self.meta = meta
        self.arrs = arrs


class _ConstPool:
    """Flat per-dtype constant pool. register() during planning; seal()
    concatenates each dtype's arrays into ONE flat numpy buffer; dev()
    returns the static slice (reshaped) at trace time.

    The flat buffers stay NUMPY on purpose: captured as jit constants
    they embed into the program from host memory. A device-resident
    constant instead forces MLIR lowering to FETCH the array back
    through the axon tunnel (`_array_mlir_constant_handler` → `_value`)
    at ~70 s per buffer — 213 s of a 215 s `lower()` measured on the
    remote TPU backend. Two big host literals upload once with the
    executable and cost nothing at trace time."""

    def __init__(self):
        self._parts: Dict[str, List[np.ndarray]] = defaultdict(list)
        self._index: Dict[int, Tuple[str, int, Tuple[int, ...]]] = {}
        self._keep: List[np.ndarray] = []  # pin ids against GC reuse
        self._flat: Dict[str, np.ndarray] = {}

    def register(self, arr: np.ndarray) -> None:
        if id(arr) in self._index:
            return
        key = str(arr.dtype)
        parts = self._parts[key]
        off = sum(p.size for p in parts)
        parts.append(arr.reshape(-1))
        self._index[id(arr)] = (key, off, arr.shape)
        self._keep.append(arr)

    def seal(self) -> None:
        self._flat = {
            k: np.concatenate(v) if v else np.zeros(0, k)
            for k, v in self._parts.items()
        }

    def dev(self, arr: np.ndarray):
        key, off, shape = self._index[id(arr)]
        n = int(np.prod(shape)) if shape else 1
        return jax.lax.slice(self._flat[key], (off,), (off + n,)).reshape(shape)


# Opcodes the bit-sliced (packed) evaluator supports. Everything here is
# a pure boolean function per bit — packing 32 instances into one uint32
# word turns each into a full-word op (negation = ^0xFFFFFFFF); addmany
# becomes a carry-save adder tree over bit planes.
PACKED_OPS = {"xor", "and", "and_not", "nor", "ch", "maj", "addmany",
              "num_iszero"}
# Opcodes the MIXED packed evaluator additionally supports: field-valued
# outputs land in an unpacked limb sidecar (see build_packed_mixed).
PACKED_MIXED_OPS = PACKED_OPS | {"pack"}

_FULL = 0xFFFFFFFF


def pack_bits(bits):
    """uint32[B, n] of 0/1 values → packed uint32[B//32, n]: bit j of
    word w = instance 32·w + j. B must be a multiple of 32."""
    B = bits.shape[0]
    assert B % 32 == 0, "packed batch must be a multiple of 32"
    r = jnp.asarray(bits, jnp.uint32).reshape(B // 32, 32, -1)
    sh = jnp.arange(32, dtype=jnp.uint32)[None, :, None]
    return jnp.sum(r << sh, axis=1, dtype=jnp.uint32)


def unpack_bits(packed):
    """packed uint32[Bw, n] → uint32[Bw·32, n] of 0/1 values."""
    sh = jnp.arange(32, dtype=jnp.uint32)[None, :, None]
    b = (jnp.asarray(packed, jnp.uint32)[:, None, :] >> sh) & jnp.uint32(1)
    return b.reshape(packed.shape[0] * 32, -1)


class WitnessProgram:
    def __init__(self, tape: TapeCS):
        self.field: PrimeField = tape.field
        self.backend = get_backend(self.field)
        self.num_inputs, self.num_aux, ops, self.free_slots = tape.snapshot()
        self.num_slots = self.num_inputs + self.num_aux
        self._compile(ops)
        self._eval = None

    # ------------------------------------------------------------------
    # compilation
    # ------------------------------------------------------------------
    def _compile(self, op_list: List[Op]) -> None:
        free_set = set(self.free_slots)
        field_out = {
            o
            for op in op_list
            if op.opcode in FIELD_OUT_OPS
            for o in op.outs
        }
        self._field_out = field_out

        # Field rows for field-op outputs.
        field_rows: Dict[int, int] = {}
        for s in sorted(field_out):
            field_rows[s] = len(field_rows)
        self.field_rows = field_rows

        # Free field slots: free slots consumed as field operands.
        field_consumed = set()

        def note_field_operand(slot: int):
            if slot in free_set:
                field_consumed.add(slot)

        # Levels. Free slots (and ONE) are level 0. Recording order
        # usually respects dependencies, but a gadget may record a
        # producing op after consumers of its outputs (to_bits_le_strict
        # records fbits_le after the run-of-ones ANDs that consume its
        # bits), so levels resolve topologically (Kahn), not in order.
        produced = {o for op in op_list for o in op.outs}
        level = {s: 0 for s in range(self.num_slots) if s not in produced}

        def operand_slots(op: Op) -> List[int]:
            oc = op.opcode
            if oc in ("xor", "and", "and_not", "nor", "fadd", "fmul", "finv",
                      "copy", "fbits_le"):
                return list(op.args)
            if oc in ("ch", "maj", "pack"):
                return [s for (k, s, _n) in op.args if k == V_VAR]
            if oc == "addmany":
                return [s for word in op.args for (k, s, _n) in word if k == V_VAR]
            if oc == "select":
                (ck, cs_, _cn), x, y = op.args
                out = [x, y]
                if ck == V_VAR:
                    out.append(cs_)
                return out
            if oc in ("num_iszero", "num_inv_or_one"):
                return [s for (_c, s) in op.args]
            if oc == "lookup":
                return [s for (k, s, _n) in op.args[0] if k == V_VAR]
            raise AssertionError(oc)

        unique_ops: List[Op] = op_list
        op_operands = [operand_slots(op) for op in unique_ops]
        unresolved = [0] * len(unique_ops)
        consumers: Dict[int, List[int]] = defaultdict(list)
        for i, opnds in enumerate(op_operands):
            for s in opnds:
                if s not in level:
                    unresolved[i] += 1
                    consumers[s].append(i)
        ready = deque(i for i, n in enumerate(unresolved) if n == 0)
        n_processed = 0
        while ready:
            i = ready.popleft()
            op = unique_ops[i]
            n_processed += 1
            lv = 1 + max((level[s] for s in op_operands[i]), default=0)
            for o in op.outs:
                level[o] = lv
                for j in consumers.pop(o, ()):
                    unresolved[j] -= 1
                    if unresolved[j] == 0:
                        ready.append(j)
            if op.opcode in ("fadd", "fmul", "finv", "copy", "select", "fbits_le"):
                srcs = (
                    op.args
                    if op.opcode != "select"
                    else [op.args[1], op.args[2]]
                )
                for s in srcs:
                    if isinstance(s, int):
                        note_field_operand(s)
        assert n_processed == len(unique_ops), (
            "witness tape has an unresolvable dependency cycle"
        )

        self.free_field_slots = sorted(field_consumed)
        free_field_idx = {s: i for i, s in enumerate(self.free_field_slots)}

        def fsrc(slot: int) -> Tuple[int, int]:
            if slot in field_rows:
                return (SRC_ROW, field_rows[slot])
            if slot in free_field_idx:
                return (SRC_FREE, free_field_idx[slot])
            return (SRC_LIFT, slot)  # ONE, bit-domain outputs, free bits

        # Group into stages.
        groups = defaultdict(list)
        for op in unique_ops:
            lv = level[op.outs[0]]
            oc = op.opcode
            if oc == "addmany":
                key = (lv, oc, len(op.args), len(op.outs))
            elif oc == "fbits_le":
                key = (lv, oc, len(op.outs))
            elif oc in ("pack", "num_iszero", "num_inv_or_one"):
                key = (lv, oc, len(op.args))
            elif oc == "lookup":
                key = (lv, oc, len(op.args[0]))
            else:
                key = (lv, oc)
            groups[key].append(op)

        def views_to_arrays(view_lists):
            """[W][...] of (kind, slot/const, neg) → dict of arrays."""
            arr = np.asarray(view_lists, dtype=np.int64)  # [..., 3]
            kind = arr[..., 0]
            sv = arr[..., 1]
            neg = arr[..., 2]
            return {
                "idx": np.where(kind == V_VAR, sv, 0).astype(np.int32),
                "neg": np.where(kind == V_VAR, neg, 0).astype(np.uint32),
                "isc": (kind == V_CONST).astype(np.uint32),
                "cv": np.where(kind == V_CONST, sv, 0).astype(np.uint32),
            }

        def fop_arrays(slots: List[int], prefix: str):
            srcs = [fsrc(s) for s in slots]
            return {
                prefix + "_kind": np.asarray([k for k, _ in srcs], np.int32),
                prefix + "_idx": np.asarray([i for _, i in srcs], np.int32),
            }

        stages: List[_Stage] = []
        for key in sorted(groups.keys(), key=lambda k: (k[0], str(k[1:]))):
            batch = groups[key]
            oc = batch[0].opcode
            if oc in ("xor", "and", "and_not", "nor"):
                stages.append(
                    _Stage(
                        oc,
                        np.asarray([op.outs[0] for op in batch], np.int32),
                        {
                            "a": np.asarray([op.args[0] for op in batch], np.int32),
                            "b": np.asarray([op.args[1] for op in batch], np.int32),
                        },
                    )
                )
            elif oc in ("ch", "maj"):
                arrs = {}
                for nm, i in (("a", 0), ("b", 1), ("c", 2)):
                    sub = views_to_arrays([op.args[i] for op in batch])
                    arrs.update({nm + "_" + k: v for k, v in sub.items()})
                stages.append(
                    _Stage(
                        oc,
                        np.asarray([op.outs[0] for op in batch], np.int32),
                        arrs,
                    )
                )
            elif oc == "addmany":
                n_words, n_out = len(batch[0].args), len(batch[0].outs)
                arrs = views_to_arrays([op.args for op in batch])
                stages.append(
                    _Stage(
                        oc,
                        np.asarray([op.outs for op in batch], np.int32),
                        arrs,
                        meta=(n_words, n_out),
                    )
                )
            elif oc in ("fadd", "fmul"):
                arrs = fop_arrays([op.args[0] for op in batch], "a")
                arrs.update(fop_arrays([op.args[1] for op in batch], "b"))
                arrs["out_slots"] = np.asarray([op.outs[0] for op in batch], np.int32)
                stages.append(
                    _Stage(
                        oc,
                        np.asarray(
                            [field_rows[op.outs[0]] for op in batch], np.int32
                        ),
                        arrs,
                    )
                )
            elif oc in ("finv", "copy"):
                arrs = fop_arrays([op.args[0] for op in batch], "a")
                arrs["out_slots"] = np.asarray([op.outs[0] for op in batch], np.int32)
                stages.append(
                    _Stage(
                        oc,
                        np.asarray(
                            [field_rows[op.outs[0]] for op in batch], np.int32
                        ),
                        arrs,
                    )
                )
            elif oc == "select":
                arrs = views_to_arrays([[op.args[0]] for op in batch])
                arrs = {"c_" + k: v[:, 0] for k, v in arrs.items()}
                arrs.update(fop_arrays([op.args[1] for op in batch], "x"))
                arrs.update(fop_arrays([op.args[2] for op in batch], "y"))
                arrs["out_slots"] = np.asarray([op.outs[0] for op in batch], np.int32)
                stages.append(
                    _Stage(
                        oc,
                        np.asarray(
                            [field_rows[op.outs[0]] for op in batch], np.int32
                        ),
                        arrs,
                    )
                )
            elif oc == "pack":
                arrs = views_to_arrays([op.args for op in batch])
                arrs["out_slots"] = np.asarray([op.outs[0] for op in batch], np.int32)
                stages.append(
                    _Stage(
                        oc,
                        np.asarray(
                            [field_rows[op.outs[0]] for op in batch], np.int32
                        ),
                        arrs,
                        meta=len(batch[0].args),
                    )
                )
            elif oc == "fbits_le":
                arrs = fop_arrays([op.args[0] for op in batch], "a")
                stages.append(
                    _Stage(
                        oc,
                        np.asarray([op.outs for op in batch], np.int32),
                        arrs,
                        meta=len(batch[0].outs),
                    )
                )
            elif oc == "lookup":
                # views [W, nb] index bits + per-op constant tables
                # [W, 2^nb, 16] (already limb-decomposed on host).
                arrs = views_to_arrays([op.args[0] for op in batch])
                arrs["table"] = np.stack(
                    [
                        self.backend.to_limbs(list(op.args[1]))
                        for op in batch
                    ]
                )
                arrs["out_slots"] = np.asarray(
                    [op.outs[0] for op in batch], np.int32
                )
                stages.append(
                    _Stage(
                        oc,
                        np.asarray(
                            [field_rows[op.outs[0]] for op in batch], np.int32
                        ),
                        arrs,
                        meta=len(batch[0].args[0]),
                    )
                )
            elif oc in ("num_iszero", "num_inv_or_one"):
                n_terms = len(batch[0].args)
                idx = np.zeros((len(batch), n_terms), np.int32)
                cf = np.zeros((len(batch), n_terms), np.uint32)
                for w, op in enumerate(batch):
                    for i, (coeff, s) in enumerate(op.args):
                        assert coeff < (1 << 20), (
                            "num_iszero supports small-coefficient LCs"
                        )
                        idx[w, i] = s
                        cf[w, i] = coeff
                arrs = {"idx": idx, "cf": cf}
                if oc == "num_iszero":
                    outs = np.asarray([op.outs[0] for op in batch], np.int32)
                else:
                    arrs["out_slots"] = np.asarray(
                        [op.outs[0] for op in batch], np.int32
                    )
                    outs = np.asarray(
                        [field_rows[op.outs[0]] for op in batch], np.int32
                    )
                stages.append(_Stage(oc, outs, arrs))
            else:  # pragma: no cover
                raise AssertionError(oc)

        self.stages = stages
        self.n_field_rows = len(field_rows)

    # ------------------------------------------------------------------
    # evaluation
    # ------------------------------------------------------------------
    def build(self, use_pallas: bool | None = None, _interpret: bool = False):
        """Jitted evaluator: (free_bits[B, n_free], free_field[B, nf, 16]?)
        → (vals u32[B, S], flimbs u32[B, F, 16]).

        On TPU, field multiplies route through the Pallas kernel — the jnp
        multiply inlines ~1.5k HLO ops per stage, which makes programs with
        many field stages take minutes to compile remotely.
        `_interpret` runs the Pallas kernels in interpret mode (tests)."""
        import jax as _jax

        if use_pallas is None:
            use_pallas = _jax.default_backend() == "tpu"
        be = self.backend
        if use_pallas:
            from ..backend.field_pallas import TILE, get_pallas_ops

            _ops = get_pallas_ops(self.field, interpret=_interpret)

            def fmul(a, b):
                # a, b: [B, W, 16] → flat limb-major, padded to TILE.
                B, W, _ = a.shape
                n = B * W
                tp = -(-n // TILE) * TILE
                al = _ops.to_limb_major(a.reshape(n, 16), tp)
                bl = _ops.to_limb_major(b.reshape(n, 16), tp)
                return _ops.mul(al, bl)[:, :n].T.reshape(B, W, 16)
        else:
            fmul = be.mul
        stages = self.stages
        S = self.num_slots
        F = max(self.n_field_rows, 1)
        free_slots = np.asarray(self.free_slots, np.int32)
        n_free_field = len(self.free_field_slots)

        # Fold maximal runs of >= MIN_SCAN_RUN consecutive field stages
        # into lax.scan groups (compile the body once instead of inlining
        # every stage's HLO — deep field chains go from minutes of remote
        # compile to seconds). Scratch row F / slot S absorb pad writes.
        exec_plan = []
        run = []

        def flush_run():
            nonlocal run
            if len(run) >= MIN_SCAN_RUN:
                if use_pallas:
                    chain = _detect_linear_chain(run)
                    if chain is not None:
                        exec_plan.append(("chain", chain))
                        run = []
                        return
                pattern = _find_period([st.opcode for st in run])
                tables = _build_scan_tables(run, F, S)
                if pattern is not None:
                    d = pattern
                    pat_ops = [run[j].opcode for j in range(d)]
                    tables = {
                        k: v.reshape((len(run) // d, d) + v.shape[1:])
                        for k, v in tables.items()
                    }
                    exec_plan.append(("scan", (tables, pat_ops)))
                else:
                    exec_plan.append(("scan", (tables, None)))
            else:
                exec_plan.extend(("stage", st) for st in run)
            run = []

        for st in stages:
            if st.opcode in SCAN_OPS:
                run.append(st)
            else:
                flush_run()
                exec_plan.append(("stage", st))
        flush_run()
        use_scratch = any(kind == "scan" for kind, _ in exec_plan)

        # One flat device buffer per dtype for ALL per-stage arrays; the
        # evaluator reads static slices at trace time (see _ConstPool).
        pool = _ConstPool()
        for kind, item in exec_plan:
            if kind == "stage":
                pool.register(item.outs)
                for a in item.arrs.values():
                    pool.register(a)
        pool.seal()

        def lift(u32_vals):
            z = jnp.zeros(u32_vals.shape + (16,), jnp.uint32)
            z = z.at[..., 0].set(u32_vals & 0xFFFF)
            return z.at[..., 1].set(u32_vals >> 16)

        S_buf = S + 1 if use_scratch else S
        F_buf = F + 1 if use_scratch else F

        def evaluate(free_bits, free_field):
            B = free_bits.shape[0]
            vals = jnp.zeros((B, S_buf), jnp.uint32)
            vals = vals.at[:, 0].set(1)  # ONE
            if self.free_slots:
                vals = vals.at[:, free_slots].set(free_bits)
            flimbs = jnp.zeros((B, F_buf, 16), jnp.uint32)

            def fget_arrays(kind, idx, vals, flimbs):
                # `idx` mixes three index spaces (field row / free-field row /
                # slot id) selected by `kind`; each gather clamps explicitly
                # so an index from another kind can never read OOB — the
                # clamped garbage value is discarded by the `where` below.
                from_rows = flimbs[:, jnp.minimum(idx, F_buf - 1)]  # [B, W, 16]
                lifted = lift(vals[:, jnp.minimum(idx, S_buf - 1)])
                if n_free_field:
                    from_free = free_field[:, jnp.minimum(idx, n_free_field - 1)]
                else:
                    from_free = lifted
                k = kind[None, :, None]
                return jnp.where(
                    k == SRC_ROW,
                    from_rows,
                    jnp.where(k == SRC_FREE, from_free, lifted),
                )

            def fget(st, prefix, vals, flimbs):
                return fget_arrays(
                    st.arrs[prefix + "_kind"],
                    st.arrs[prefix + "_idx"],
                    vals,
                    flimbs,
                )

            def bview(st, prefix, vals):
                v = vals[:, st.arrs[prefix + "_idx"]] ^ st.arrs[prefix + "_neg"]
                return jnp.where(
                    st.arrs[prefix + "_isc"] == 1, st.arrs[prefix + "_cv"], v
                )

            def _apply_op(opcode, a, b, cond):
                if opcode == "fadd":
                    return be.add(a, b)
                if opcode == "fmul":
                    return fmul(a, b)
                if opcode == "finv":
                    return be.inv(a)
                if opcode == "copy":
                    return a
                return jnp.where(cond[..., None] == 1, a, b)  # select

            def _write(xs, r, vals, flimbs):
                flimbs = flimbs.at[:, xs["out_row"]].set(r)
                vals = vals.at[:, xs["out_slot"]].set(
                    r[..., 0] | (r[..., 1] << 16)
                )
                return vals, flimbs

            def scan_run(tables, pattern, vals, flimbs):
                def get_operands(xs, vals, flimbs):
                    a = fget_arrays(xs["a_kind"], xs["a_idx"], vals, flimbs)
                    b = fget_arrays(xs["b_kind"], xs["b_idx"], vals, flimbs)
                    cond = jnp.where(
                        xs["c_isc"] == 1,
                        xs["c_cv"],
                        vals[:, xs["c_idx"]] ^ xs["c_neg"],
                    )
                    return a, b, cond

                if pattern is not None:
                    # Statically-typed body: d ops per step, no switch.
                    def body(carry, xs):
                        vals, flimbs = carry
                        for j, opc in enumerate(pattern):
                            xj = {k: v[j] for k, v in xs.items()}
                            a, b, cond = get_operands(xj, vals, flimbs)
                            r = _apply_op(opc, a, b, cond)
                            vals, flimbs = _write(xj, r, vals, flimbs)
                        return (vals, flimbs), None

                else:
                    def body(carry, xs):
                        vals, flimbs = carry
                        a, b, cond = get_operands(xs, vals, flimbs)
                        r = jax.lax.switch(
                            xs["op"],
                            [
                                lambda a, b, c: be.add(a, b),
                                lambda a, b, c: fmul(a, b),
                                lambda a, b, c: be.inv(a),
                                lambda a, b, c: a,
                                lambda a, b, c: jnp.where(c[..., None] == 1, a, b),
                            ],
                            a,
                            b,
                            cond,
                        )
                        vals, flimbs = _write(xs, r, vals, flimbs)
                        return (vals, flimbs), None

                (vals, flimbs), _ = jax.lax.scan(body, (vals, flimbs), tables)
                return vals, flimbs

            def chain_run(spec, vals, flimbs):
                # Fused sequential field chain: the running value stays in
                # VPU registers across the whole run (see
                # field_pallas.make_chain_kernel); split into ≤
                # _CHAIN_MAX_STEPS-step kernel calls, threading the chain
                # value between segments in limb-major form.
                from ..backend.field_pallas import L16, make_chain_kernel

                npad = -(-B // TILE) * TILE

                def lm(x_bm):  # [B, k·16] → [k·16, npad]
                    x = x_bm.T
                    if npad != B:
                        x = jnp.pad(x, ((0, 0), (0, npad - B)))
                    return x

                x0 = lm(flimbs[:, spec["init_row"]])
                n_ext = len(spec["ext_rows"])
                if n_ext:
                    ext = jnp.transpose(
                        flimbs[:, np.asarray(spec["ext_rows"], np.int32)],
                        (1, 2, 0),
                    ).reshape(n_ext * L16, B)
                    if npad != B:
                        ext = jnp.pad(ext, ((0, 0), (0, npad - B)))
                else:
                    ext = jnp.zeros((L16, npad), jnp.uint32)
                d = len(spec["descs"])
                n_reps = spec["n_reps"]
                reps_per_seg = max(1, _CHAIN_MAX_STEPS // d)
                outs = []
                r = 0
                while r < n_reps:
                    seg = min(reps_per_seg, n_reps - r)
                    runk = make_chain_kernel(
                        self.field, spec["descs"], seg, n_ext,
                        interpret=_interpret,
                    )
                    o = runk(x0, ext)  # [seg·d·16, npad]
                    outs.append(o)
                    x0 = o[-L16:]
                    r += seg
                out = jnp.concatenate(outs) if len(outs) > 1 else outs[0]
                obm = (
                    out[:, :B]
                    .reshape(n_reps * d, L16, B)
                    .transpose(2, 0, 1)
                )  # [B, n_steps, 16]
                flimbs = flimbs.at[:, spec["out_rows"]].set(obm)
                vals = vals.at[:, spec["out_slots"]].set(
                    obm[..., 0] | (obm[..., 1] << 16)
                )
                return vals, flimbs

            for plan_kind, item in exec_plan:
                if plan_kind == "scan":
                    vals, flimbs = scan_run(item[0], item[1], vals, flimbs)
                    continue
                if plan_kind == "chain":
                    vals, flimbs = chain_run(item, vals, flimbs)
                    continue
                st = _DevStage(item, pool.dev)
                oc = st.opcode
                if oc in ("xor", "and", "and_not", "nor"):
                    a = vals[:, st.arrs["a"]]
                    b = vals[:, st.arrs["b"]]
                    r = (
                        a ^ b
                        if oc == "xor"
                        else a & b
                        if oc == "and"
                        else a & (b ^ 1)
                        if oc == "and_not"
                        else (a ^ 1) & (b ^ 1)
                    )
                    vals = vals.at[:, st.outs].set(r)
                elif oc in ("ch", "maj"):
                    a, b, c = bview(st, "a", vals), bview(st, "b", vals), bview(st, "c", vals)
                    r = (
                        (a & b) ^ ((a ^ 1) & c)
                        if oc == "ch"
                        else (a & b) ^ (a & c) ^ (b & c)
                    )
                    vals = vals.at[:, st.outs].set(r)
                elif oc == "addmany":
                    n_words, n_out = st.meta
                    bv = vals[:, st.arrs["idx"]] ^ st.arrs["neg"]  # [B,W,nw,32]
                    bv = jnp.where(st.arrs["isc"] == 1, st.arrs["cv"], bv)
                    w_lo = jnp.asarray(
                        [1 << i for i in range(16)] + [0] * 16, jnp.uint32
                    )
                    w_hi = jnp.asarray(
                        [0] * 16 + [1 << (i - 16) for i in range(16, 32)],
                        jnp.uint32,
                    )
                    lo = jnp.sum(bv * w_lo, axis=(-2, -1), dtype=jnp.uint32)
                    hi = jnp.sum(bv * w_hi, axis=(-2, -1), dtype=jnp.uint32)
                    hi = hi + (lo >> 16)
                    lo = lo & 0xFFFF
                    outs = [
                        ((lo >> k) & 1) if k < 16 else ((hi >> (k - 16)) & 1)
                        for k in range(n_out)
                    ]
                    vals = vals.at[:, st.outs].set(jnp.stack(outs, axis=-1))
                elif oc in ("fadd", "fmul"):
                    a = fget(st, "a", vals, flimbs)
                    b = fget(st, "b", vals, flimbs)
                    r = be.add(a, b) if oc == "fadd" else fmul(a, b)
                    flimbs = flimbs.at[:, st.outs].set(r)
                    vals = vals.at[:, st.arrs["out_slots"]].set(
                        r[..., 0] | (r[..., 1] << 16)
                    )
                elif oc == "finv":
                    a = fget(st, "a", vals, flimbs)
                    r = be.inv(a)
                    flimbs = flimbs.at[:, st.outs].set(r)
                    vals = vals.at[:, st.arrs["out_slots"]].set(
                        r[..., 0] | (r[..., 1] << 16)
                    )
                elif oc == "copy":
                    r = fget(st, "a", vals, flimbs)
                    flimbs = flimbs.at[:, st.outs].set(r)
                    vals = vals.at[:, st.arrs["out_slots"]].set(
                        r[..., 0] | (r[..., 1] << 16)
                    )
                elif oc == "select":
                    cond = bview(st, "c", vals)  # [B, W]
                    x = fget(st, "x", vals, flimbs)
                    y = fget(st, "y", vals, flimbs)
                    r = jnp.where(cond[..., None] == 1, x, y)
                    flimbs = flimbs.at[:, st.outs].set(r)
                    vals = vals.at[:, st.arrs["out_slots"]].set(
                        r[..., 0] | (r[..., 1] << 16)
                    )
                elif oc == "pack":
                    bv = vals[:, st.arrs["idx"]] ^ st.arrs["neg"]
                    bv = jnp.where(st.arrs["isc"] == 1, st.arrs["cv"], bv)
                    n_bits = st.meta
                    limbs = []
                    for j in range(16):
                        lo_bit = 16 * j
                        if lo_bit >= n_bits:
                            limbs.append(jnp.zeros(bv.shape[:2], jnp.uint32))
                            continue
                        width = min(16, n_bits - lo_bit)
                        w = jnp.asarray([1 << i for i in range(width)], jnp.uint32)
                        limbs.append(
                            jnp.sum(
                                bv[..., lo_bit : lo_bit + width] * w,
                                axis=-1,
                                dtype=jnp.uint32,
                            )
                        )
                    r = jnp.stack(limbs, axis=-1)
                    flimbs = flimbs.at[:, st.outs].set(r)
                    vals = vals.at[:, st.arrs["out_slots"]].set(
                        r[..., 0] | (r[..., 1] << 16)
                    )
                elif oc == "lookup":
                    bv = vals[:, st.arrs["idx"]] ^ st.arrs["neg"]  # [B, W, nb]
                    bv = jnp.where(st.arrs["isc"] == 1, st.arrs["cv"], bv)
                    nb = st.meta
                    w = jnp.asarray([1 << i for i in range(nb)], jnp.uint32)
                    sel = jnp.sum(bv * w, axis=-1).astype(jnp.int32)  # [B, W]
                    table = st.arrs["table"]  # [W, 2^nb, 16]
                    r = table[jnp.arange(table.shape[0])[None, :], sel]
                    flimbs = flimbs.at[:, st.outs].set(r)
                    vals = vals.at[:, st.arrs["out_slots"]].set(
                        r[..., 0] | (r[..., 1] << 16)
                    )
                elif oc == "fbits_le":
                    a = fget(st, "a", vals, flimbs)  # [B, W, 16]
                    n_out = st.meta
                    bits = []
                    for k in range(n_out):
                        limb, off = divmod(k, 16)
                        bits.append((a[..., limb] >> off) & 1)
                    vals = vals.at[:, st.outs].set(jnp.stack(bits, axis=-1))
                elif oc == "num_iszero":
                    s = jnp.sum(
                        vals[:, st.arrs["idx"]] * st.arrs["cf"],
                        axis=-1,
                        dtype=jnp.uint32,
                    )
                    vals = vals.at[:, st.outs].set((s == 0).astype(jnp.uint32))
                elif oc == "num_inv_or_one":
                    s = jnp.sum(
                        vals[:, st.arrs["idx"]] * st.arrs["cf"],
                        axis=-1,
                        dtype=jnp.uint32,
                    )
                    inv = be.inv(lift(s))
                    one = jnp.zeros_like(inv).at[..., 0].set(1)
                    r = jnp.where((s == 0)[..., None], one, inv)
                    flimbs = flimbs.at[:, st.outs].set(r)
                    vals = vals.at[:, st.arrs["out_slots"]].set(
                        r[..., 0] | (r[..., 1] << 16)
                    )
                else:  # pragma: no cover
                    raise AssertionError(oc)
            if use_scratch:
                return vals[:, :S], flimbs[:, :F]
            return vals, flimbs

        return jax.jit(evaluate)

    @property
    def is_packable(self) -> bool:
        """True when the program can run on the bit-sliced (packed)
        evaluator: pure-bit witness AND every stage opcode has a packed
        implementation (see PACKED_OPS)."""
        return self.is_pure_bits and all(
            st.opcode in PACKED_OPS for st in self.stages
        )

    @property
    def is_packable_mixed(self) -> bool:
        """True when the program can run on the MIXED packed evaluator
        (build_packed_mixed): bit stages packed 32/word + field-valued
        `pack` outputs in an unpacked limb sidecar. Requires every
        opcode in PACKED_MIXED_OPS, no free field inputs, and no stage
        consuming a field-valued slot as a bit operand (a packed word
        cannot hold a field value)."""
        if self.free_field_slots:
            return False
        if not all(st.opcode in PACKED_MIXED_OPS for st in self.stages):
            return False
        field_out = self._field_out
        for st in self.stages:
            for k, v in st.arrs.items():
                if k in ("a", "b", "a_idx", "b_idx", "c_idx", "idx"):
                    if np.isin(np.asarray(v).reshape(-1), list(field_out)).any():
                        return False
        return True

    def build_packed_mixed(self):
        """Bit-sliced evaluator WITH a field-limb sidecar: 32 instances
        per uint32 word for every bit slot, field-valued `pack` outputs
        (multipack.rs:76-105) as unpacked canonical limbs.

        free_packed uint32[Bw, n_free] → (vals uint32[Bw, S] packed
        words — field-out slots hold 0 — , flimbs uint32[Bw·32, F, 16]
        instance-major limb rows, F = n_field_rows). The packed check
        with a field sidecar (bits_packed + field_slots) consumes this
        pair directly."""
        assert self.is_packable_mixed
        return self._build_packed_impl(mixed=True)

    def build_packed(self):
        """Bit-sliced jitted evaluator: 32 instances per uint32 word.

        free_packed uint32[Bw, n_free] (bit j of word w = instance
        32·w + j, free slots in allocation order) → vals uint32[Bw, S]
        (batch-major, same packing; unpack with `unpack_bits(vals)`).

        Rationale: the plain evaluator stores one BIT per uint32
        ([B, S] — 32× the necessary HBM traffic on witness-bound steps).
        Packed, every gather/scatter moves 32 instances per word, the
        bitwise stages (xor/and/ch/maj, boolean.rs:101-272 formulas) are
        full-word ops, and addmany (uint32.rs:304-406) runs as a
        carry-save full-adder reduction over bit planes — ~5 vector ops
        per input bit for 32 instances at once, instead of a weighted
        sum per instance. Batch-major [Bw, S] layout mirrors build()'s
        proven [B, S] access patterns exactly (minor-axis gathers,
        contiguous column-block writes): a slot-major [S, Bw] variant
        hit an XLA:TPU codegen fault at Bw >= 128 (wrong adder outputs
        flipping with unrelated program edits, worker crashes with
        multi-dim scatter indices)."""
        assert self.is_packable, (
            "program has stages outside PACKED_OPS; use build()"
        )
        return self._build_packed_impl(mixed=False)

    def _build_packed_impl(self, mixed: bool):
        stages = self.stages
        S = self.num_slots
        free_slots = np.asarray(self.free_slots, np.int64)

        # SCATTER-FREE layout: permute slots so every stage's outputs
        # occupy one contiguous row block. The seed block (ONE, free
        # slots, any unproduced slots) assembles by CONCATENATION and
        # each stage writes with ONE dynamic_update_slice; all operand
        # indices are remapped host-side. Rationale: XLA:TPU miscompiles
        # scatter→gather chains on a [S, Bw] uint32 buffer at Bw >= 128
        # (silently wrong rows read by downstream gathers; worker
        # "kernel fault" crashes with multi-dim scatter indices) — and
        # contiguous block writes are faster than row scatters anyway.
        # One inverse-permutation gather at the end restores slot order.
        row_of_slot = np.full(S, -1, np.int64)
        row_of_slot[0] = 0
        cursor = 1
        for s in free_slots:
            if row_of_slot[s] < 0:
                row_of_slot[s] = cursor
                cursor += 1
        # For field-output stages (pack, mixed mode) `outs` holds FIELD
        # ROWS; the produced slots are in arrs["out_slots"].
        produced = [
            np.asarray(
                st.arrs["out_slots"]
                if st.opcode in FIELD_OUT_OPS
                else st.outs
            ).reshape(-1)
            for st in stages
        ]
        prod_mask = np.zeros(S, bool)
        for outs_flat in produced:
            prod_mask[outs_flat] = True
        rest = np.nonzero((row_of_slot < 0) & ~prod_mask)[0]
        for s in rest:
            row_of_slot[s] = cursor
            cursor += 1
        n_seed = cursor  # rows [0, n_seed) = concat-assembled seed block
        stage_base = []
        for outs_flat in produced:
            stage_base.append(cursor)
            row_of_slot[outs_flat] = cursor + np.arange(len(outs_flat))
            cursor += len(outs_flat)
        assert cursor == S and (row_of_slot >= 0).all()

        # Remapped per-stage index arrays (copies — the _Stage arrays
        # are shared with build()), pooled like build()'s.
        _IDX_KEYS = {"a", "b", "a_idx", "b_idx", "c_idx", "idx"}
        pool = _ConstPool()
        remapped: List[Dict[str, np.ndarray]] = []
        for st in stages:
            arrs = {}
            for k, v in st.arrs.items():
                if k in _IDX_KEYS:
                    v = row_of_slot[v].astype(np.int32)
                arrs[k] = v
                pool.register(v)
            remapped.append(arrs)
        unperm = row_of_slot.astype(np.int32)  # out[slot] = vals[unperm[slot]]
        pool.register(unperm)
        pool.seal()
        # numpy scalar on purpose: an eager jnp constant is a DEVICE
        # array; captured in the trace it must be fetched back through
        # the tunnel during MLIR lowering (~70 s/array — see _ConstPool).
        FULL = np.uint32(_FULL)
        n_free = len(free_slots)
        F = max(self.n_field_rows, 1)

        def evaluate(free_packed):
            Bw = free_packed.shape[0]
            parts = [jnp.full((Bw, 1), FULL, jnp.uint32)]  # ONE
            if n_free:
                parts.append(free_packed)
            if n_seed > 1 + n_free:
                parts.append(
                    jnp.zeros((Bw, n_seed - 1 - n_free), jnp.uint32)
                )
            parts.append(jnp.zeros((Bw, S - n_seed), jnp.uint32))
            vals = jnp.concatenate(parts, axis=1)  # [Bw, S] permuted
            flimbs = (
                jnp.zeros((Bw * 32, F, 16), jnp.uint32) if mixed else None
            )

            def cols(idx):
                return vals[:, idx]  # [Bw] + idx.shape

            def put(base, r2d):
                return jax.lax.dynamic_update_slice(vals, r2d, (0, base))

            def bview(st, prefix):
                v = cols(st.arrs[prefix + "_idx"])  # [Bw, W]
                v = v ^ (st.arrs[prefix + "_neg"] * FULL)[None, :]
                return jnp.where(
                    (st.arrs[prefix + "_isc"] == 1)[None, :],
                    (st.arrs[prefix + "_cv"] * FULL)[None, :],
                    v,
                )

            for si, item in enumerate(stages):
                st = _PackedStage(
                    item.opcode,
                    item.meta,
                    {k: pool.dev(v) for k, v in remapped[si].items()},
                )
                base = stage_base[si]
                oc = st.opcode
                if oc in ("xor", "and", "and_not", "nor"):
                    a = cols(st.arrs["a"])
                    b = cols(st.arrs["b"])
                    r = (
                        a ^ b
                        if oc == "xor"
                        else a & b
                        if oc == "and"
                        else a & ~b
                        if oc == "and_not"
                        else ~a & ~b
                    )
                    vals = put(base, r)
                elif oc in ("ch", "maj"):
                    a, b, c = bview(st, "a"), bview(st, "b"), bview(st, "c")
                    r = (
                        (a & b) ^ (~a & c)
                        if oc == "ch"
                        else (a & b) ^ (a & c) ^ (b & c)
                    )
                    vals = put(base, r)
                elif oc == "addmany":
                    n_words, n_out = st.meta
                    bv = cols(st.arrs["idx"])  # [Bw, W, nw, 32]
                    bv = bv ^ (st.arrs["neg"] * FULL)[None]
                    bv = jnp.where(
                        (st.arrs["isc"] == 1)[None],
                        (st.arrs["cv"] * FULL)[None],
                        bv,
                    )
                    if n_out > 32:
                        bv = jnp.pad(
                            bv, ((0, 0), (0, 0), (0, 0), (0, n_out - 32))
                        )
                    # Vectorized over bit positions (a per-position FA
                    # loop emits ~2k HLO ops per stage — minutes of
                    # remote compile): CSA 3:2 layers reduce the addend
                    # list to two whole words, then one Kogge-Stone
                    # prefix add resolves carries in log2(n_out) levels.
                    # Carries past n_out-1 are dead (mod-2^n_out).
                    addends = [bv[:, :, w] for w in range(n_words)]

                    def sh(x, d=1):  # shift toward MSB along positions
                        return jnp.pad(x, ((0, 0), (0, 0), (d, 0)))[
                            :, :, :n_out
                        ]

                    while len(addends) > 2:
                        nxt = []
                        for i in range(0, len(addends) - 2, 3):
                            a1, b1, c1 = addends[i : i + 3]
                            nxt.append(a1 ^ b1 ^ c1)
                            nxt.append(sh((a1 & b1) | (c1 & (a1 ^ b1))))
                        rem = len(addends) % 3
                        if rem:
                            nxt.extend(addends[-rem:])
                        addends = nxt
                    if len(addends) == 1:
                        r = addends[0]
                    else:
                        a1, b1 = addends
                        g = a1 & b1
                        p = a1 ^ b1
                        gk, pk, d = g, p, 1
                        while d < n_out:
                            gk = gk | (pk & sh(gk, d))
                            pk = pk & sh(pk, d)
                            d *= 2
                        r = p ^ sh(gk)  # sum = p xor carry-in
                    vals = put(base, r.reshape(Bw, -1))
                elif oc == "num_iszero":
                    v = cols(st.arrs["idx"])  # [Bw, W, T]
                    sh32_t = jnp.arange(32, dtype=jnp.uint32)
                    b32 = (v[..., None] >> sh32_t) & jnp.uint32(1)
                    s = jnp.sum(
                        b32 * st.arrs["cf"][None, :, :, None],
                        axis=2,
                        dtype=jnp.uint32,
                    )  # [Bw, W, 32]
                    isz = (s == 0).astype(jnp.uint32)
                    vals = put(
                        base, jnp.sum(isz << sh32_t, axis=-1, dtype=jnp.uint32)
                    )
                elif oc == "pack":
                    # field-valued output → the unpacked limb sidecar;
                    # the packed vals block stays zero (a word cannot
                    # hold a field value — the check reads flimbs).
                    assert mixed, "pack stage needs build_packed_mixed"
                    bv = cols(st.arrs["idx"])  # [Bw, W, nb] packed words
                    bv = bv ^ (st.arrs["neg"] * FULL)[None]
                    bv = jnp.where(
                        (st.arrs["isc"] == 1)[None],
                        (st.arrs["cv"] * FULL)[None],
                        bv,
                    )
                    n_bits = st.meta
                    W = bv.shape[1]
                    sh32_t = jnp.arange(32, dtype=jnp.uint32)
                    b32 = (bv[..., None] >> sh32_t) & jnp.uint32(1)
                    # [Bw, W, nb, 32] → per-limb weighted window sums
                    limbs = []
                    for j in range(16):
                        lo_bit = 16 * j
                        if lo_bit >= n_bits:
                            limbs.append(
                                jnp.zeros((Bw, W, 32), jnp.uint32)
                            )
                            continue
                        width = min(16, n_bits - lo_bit)
                        w = jnp.asarray(
                            [1 << i for i in range(width)], jnp.uint32
                        )
                        limbs.append(
                            jnp.sum(
                                b32[:, :, lo_bit : lo_bit + width]
                                * w[None, None, :, None],
                                axis=2,
                                dtype=jnp.uint32,
                            )
                        )
                    r = jnp.stack(limbs, axis=-1)  # [Bw, W, 32, 16]
                    r_bm = jnp.transpose(r, (0, 2, 1, 3)).reshape(
                        Bw * 32, W, 16
                    )
                    # item.outs holds the FIELD ROWS for pack stages
                    flimbs = flimbs.at[
                        :, np.asarray(item.outs, np.int32)
                    ].set(r_bm)
                    vals = put(base, jnp.zeros((Bw, W), jnp.uint32))
                else:  # pragma: no cover — guarded by is_packable
                    raise AssertionError(oc)
            # Undo the contiguous-block permutation: out[:, slot] =
            # vals[:, row_of_slot[slot]] — one column gather at the end.
            u = pool.dev(unperm)
            if mixed:
                return vals[:, u], flimbs
            return vals[:, u]

        return jax.jit(evaluate)

    @property
    def is_pure_bits(self) -> bool:
        """True when every witness slot holds a 0/1 value (hash/uint32
        circuits): satisfiability can use the bits fast path and `vals`
        can be consumed directly, skipping limb materialization."""
        return self.n_field_rows == 0 and not self.free_field_slots

    def run(self, free_bits, free_field=None):
        """Evaluate for B instances. free_bits: uint32[B, n_free] values for
        free slots (allocation order); free_field: uint32[B, n_free_field, 16]
        limbs for the free slots listed in self.free_field_slots."""
        if self._eval is None:
            self._eval = self.build()
        free_bits = jnp.asarray(free_bits, jnp.uint32)
        if free_field is None:
            free_field = jnp.zeros(
                (free_bits.shape[0], max(len(self.free_field_slots), 1), 16),
                jnp.uint32,
            )
        return self._eval(free_bits, free_field)

    # ------------------------------------------------------------------
    # output assembly
    # ------------------------------------------------------------------
    def z_template_limbs(self, vals, flimbs, free_field=None):
        """Per-instance witness limbs [B, num_slots, 16]: u32-domain slots
        from the bit buffer (limbs 0-1), field rows from the limb buffer,
        free-field inputs passed through."""
        B = vals.shape[0]
        z = jnp.zeros((B, self.num_slots, 16), jnp.uint32)
        z = z.at[:, :, 0].set(vals & 0xFFFF)
        z = z.at[:, :, 1].set(vals >> 16)
        if self.n_field_rows:
            rows_slots = jnp.asarray(
                sorted(self.field_rows, key=self.field_rows.get),
                jnp.int32,
            )
            z = z.at[:, rows_slots].set(flimbs[:, : self.n_field_rows])
        if free_field is not None and self.free_field_slots:
            z = z.at[:, jnp.asarray(self.free_field_slots, jnp.int32)].set(
                free_field[:, : len(self.free_field_slots)]
            )
        return z
