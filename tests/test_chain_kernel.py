"""Fused sequential field-chain kernel (field_pallas.make_chain_kernel +
witness_program._detect_linear_chain): the BASELINE config-1 witness shape
x = (x·b + a)² executes as ONE Pallas kernel per ≤64-step segment instead
of one scan step per op.

CPU coverage strategy: interpret-mode compiles of fmul kernel bodies are
pathologically slow on the CPU backend (~1 min per conv16 body), so the
cheap tests here cover the kernel PLUMBING (fori_loop, dynamic stores,
external loads, segment threading, detection, witness-program
integration) with fadd-only chains, and the in-kernel multiply math rides
on test_mul16_kernel's existing interpret coverage of the identical
_conv16_rows/_reduce16_rows pipeline. The full mul-chain parity test runs
on the real chip (BP_TPU_TESTS=1)."""

import random

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bellpepper_tpu import SCALAR
from bellpepper_tpu.backend.field_jnp import get_backend
from bellpepper_tpu.backend.field_pallas import TILE, make_chain_kernel
from bellpepper_tpu.compile import witness_program as wp_mod
from bellpepper_tpu.compile.tape import TapeCS
from bellpepper_tpu.compile.witness_program import (
    SCAN_OPS,
    WitnessProgram,
    _detect_linear_chain,
)
from bellpepper_tpu.gadgets.boolean import AllocatedBit, Boolean
from bellpepper_tpu.gadgets.multipack import pack_bits

RNG = np.random.default_rng(0xC4A1)
_PR = random.Random(0xC4A1)
P = SCALAR.p

ON_TPU = jax.default_backend() not in ("cpu",)


def _to_lm(values):
    """list of ints → [16, TILE] canonical limb-major (batch padded)."""
    be = get_backend(SCALAR)
    arr = np.asarray(be.to_limbs(list(values)))
    out = np.zeros((16, TILE), np.uint32)
    out[:, : arr.shape[0]] = arr.T
    return jnp.asarray(out)


def _from_lm(lm, i):
    return sum(int(np.asarray(lm)[l, i]) << (16 * l) for l in range(16))


def test_chain_kernel_add_chain_plumbing():
    """fadd-only chain: exercises fori_loop, the dynamic output store,
    external row loads and the x0 priming — cheap to compile on CPU."""
    descs = (("fadd", "prev", 0),)
    a, x0 = _PR.randrange(P), _PR.randrange(P)
    run = make_chain_kernel(
        SCALAR, descs, 4, 1, interpret=not ON_TPU
    )
    out = run(_to_lm([x0, 1]), _to_lm([a, 2]))
    x, x2 = x0, 1
    for r in range(4):
        x = (x + a) % P
        x2 = (x2 + 2) % P
        assert _from_lm(out[16 * r : 16 * (r + 1)], 0) == x
        assert _from_lm(out[16 * r : 16 * (r + 1)], 1) == x2


def test_chain_kernel_two_externals_add():
    """d=2 pattern with two distinct externals: per-position desc
    selection inside the rep loop."""
    descs = (("fadd", "prev", 0), ("fadd", "prev", 1))
    a, b, x0 = _PR.randrange(P), _PR.randrange(P), _PR.randrange(P)
    run = make_chain_kernel(SCALAR, descs, 3, 2, interpret=not ON_TPU)
    ext = jnp.concatenate([_to_lm([a]), _to_lm([b])])
    out = run(_to_lm([x0]), ext)
    x = x0
    for r in range(3):
        x = (x + a) % P
        assert _from_lm(out[(2 * r) * 16 : (2 * r + 1) * 16], 0) == x
        x = (x + b) % P
        assert _from_lm(out[(2 * r + 1) * 16 : (2 * r + 2) * 16], 0) == x


@pytest.mark.skipif(not ON_TPU, reason="fmul kernel compile too slow on CPU")
def test_chain_kernel_parity_config1_shape_tpu():
    # x = (x·b + a)² for 5 reps: descs (mul x·ext1, add ·+ext0, square)
    descs = (("fmul", "prev", 1), ("fadd", "prev", 0), ("fmul", "prev", "prev"))
    n_reps = 5
    a, b = _PR.randrange(P), _PR.randrange(P)
    x0 = _PR.randrange(P)
    run = make_chain_kernel(SCALAR, descs, n_reps, 2)
    ext = jnp.concatenate([_to_lm([a] * 2), _to_lm([b] * 2)])
    out = run(_to_lm([x0] * 2), ext)
    assert out.shape == (n_reps * 3 * 16, TILE)
    x = x0
    for r in range(n_reps):
        m = x * b % P
        s = (m + a) % P
        x = s * s % P
        assert _from_lm(out[(3 * r) * 16 : (3 * r + 1) * 16], 0) == m
        assert _from_lm(out[(3 * r + 1) * 16 : (3 * r + 2) * 16], 1) == s
        assert _from_lm(out[(3 * r + 2) * 16 : (3 * r + 3) * 16], 0) == x


def _config1_program(n_iters=6):
    def circuit(cs):
        bs = [
            Boolean.from_bit(AllocatedBit.alloc(cs.namespace(f"b{i}"), None))
            for i in range(128)
        ]
        a = pack_bits(cs.namespace("pa"), bs[:64])
        b = pack_bits(cs.namespace("pb"), bs[64:])
        x = a
        for i in range(n_iters):
            x = x.mul(cs.namespace(f"m{i}"), b)
            x = x.add(cs.namespace(f"a{i}"), a)
            x = x.square(cs.namespace(f"s{i}"))

    tape = TapeCS()
    circuit(tape)
    return WitnessProgram(tape)


def test_detect_linear_chain_on_config1():
    prog = _config1_program()
    run = [st for st in prog.stages if st.opcode in SCAN_OPS]
    assert len(run) == 18
    spec = _detect_linear_chain(run)
    assert spec is not None
    assert spec["n_reps"] == 6
    assert [op for op, *_ in spec["descs"]] == ["fmul", "fadd", "fmul"]
    assert len(spec["ext_rows"]) == 2
    # init = the 'pa' pack output row, also external operand of the adds
    assert spec["init_row"] in spec["ext_rows"]
    assert len(spec["out_rows"]) == 18


def _add_chain_program(n_iters):
    """x = x + a, n_iters times — a d=1 fadd chain (cheap on CPU)."""

    def circuit(cs):
        bs = [
            Boolean.from_bit(AllocatedBit.alloc(cs.namespace(f"b{i}"), None))
            for i in range(64)
        ]
        a = pack_bits(cs.namespace("pa"), bs)
        x = a
        for i in range(n_iters):
            x = x.add(cs.namespace(f"a{i}"), a)

    tape = TapeCS()
    circuit(tape)
    return WitnessProgram(tape)


def test_chain_path_matches_generic_backend(monkeypatch):
    """Full witness program through the fused-chain evaluator must produce
    bit-identical buffers to the generic jnp path — including segment
    threading (x0 of segment k = last output of segment k-1), forced here
    by shrinking the per-kernel step cap."""
    monkeypatch.setattr(wp_mod, "_CHAIN_MAX_STEPS", 5)
    prog = _add_chain_program(12)
    run = [st for st in prog.stages if st.opcode in SCAN_OPS]
    assert _detect_linear_chain(run) is not None
    B = 3
    free = jnp.asarray(RNG.integers(0, 2, size=(B, 64)).astype(np.uint32))
    ff = jnp.zeros((B, 1, 16), jnp.uint32)
    vals_ref, fl_ref = prog.build(False)(free, ff)
    vals_ch, fl_ch = prog.build(True, _interpret=not ON_TPU)(free, ff)
    np.testing.assert_array_equal(np.asarray(vals_ref), np.asarray(vals_ch))
    np.testing.assert_array_equal(np.asarray(fl_ref), np.asarray(fl_ch))


@pytest.mark.skipif(not ON_TPU, reason="fmul kernel compile too slow on CPU")
def test_config1_chain_path_matches_generic_tpu():
    prog = _config1_program()
    B = 3
    free = jnp.asarray(RNG.integers(0, 2, size=(B, 128)).astype(np.uint32))
    ff = jnp.zeros((B, 1, 16), jnp.uint32)
    vals_ref, fl_ref = prog.build(False)(free, ff)
    vals_ch, fl_ch = prog.build(True)(free, ff)
    np.testing.assert_array_equal(np.asarray(vals_ref), np.asarray(vals_ch))
    np.testing.assert_array_equal(np.asarray(fl_ref), np.asarray(fl_ch))


def test_non_chain_runs_fall_back():
    """A run whose operand reaches FURTHER back than the previous op must
    not fuse (the chain kernel only holds one live value)."""
    tape = TapeCS()
    bs = [
        Boolean.from_bit(AllocatedBit.alloc(tape.namespace(f"b{i}"), None))
        for i in range(64)
    ]
    a = pack_bits(tape.namespace("pa"), bs)
    x, y = a, a
    for i in range(8):
        x = x.mul(tape.namespace(f"m{i}"), a)
        y = y.add(tape.namespace(f"y{i}"), x)  # reads x AND previous y
    prog = WitnessProgram(tape)
    run = [st for st in prog.stages if st.opcode in SCAN_OPS]
    assert _detect_linear_chain(run) is None
