"""Chained-circuit pipeline tests: device-side state threading between
template instances (digest of block t = IV of block t+1), the TPU answer
to the reference's monolithic multi-block synthesis (sha256.rs:54-76).

Oracle: the Python gadget path synthesised step-by-step on the host with
explicit state threading (WitnessCS values are the ground truth)."""

import numpy as np
import jax.numpy as jnp

from bellpepper_tpu import WitnessCS
from bellpepper_tpu.compile.pipeline import (
    build_chained_production_step,
    build_chained_witness,
    build_chunked_check,
)
from bellpepper_tpu.compile.witness_program import WitnessProgram
from bellpepper_tpu.gadgets.boolean import AllocatedBit, Boolean
from bellpepper_tpu.gadgets.sha256 import sha256_compression_function
from bellpepper_tpu.gadgets.uint32 import UInt32
from bellpepper_tpu.native import NativeBuilder
from bellpepper_tpu.compile.tape import V_CONST


def _free_state_template():
    """One sha256 compression whose IV is 256 FREE bits (allocated before
    the 512 message bits) — the chain-step template."""
    nb = NativeBuilder()
    state = [nb.alloc_bit() for _ in range(256)]
    msg = [nb.alloc_bit() for _ in range(512)]
    out = nb.sha256_compression(msg, state)
    template, tape = nb.finish()
    carry_views = [nb.view(v) for v in out]
    return template, WitnessProgram(tape), carry_views


def _iv_bits():
    nb = NativeBuilder()
    views = [nb.view(v) for v in nb.sha256_iv()]
    assert all(k == V_CONST for (k, _v, _n) in views)
    return np.asarray([v for (_k, v, _n) in views], np.uint32)


def _host_chain(msgs_bits):
    """Host oracle: python gadgets, one WitnessCS synthesis per step,
    state threaded between steps. Returns (witness_per_step, states)."""
    from bellpepper_tpu.gadgets.sha256 import get_sha256_iv

    state_vals = [w.value for w in get_sha256_iv()]
    wits, states = [], []
    for mbits in msgs_bits:
        w = WitnessCS()
        state_u32 = []
        for word in range(8):
            bits = [
                Boolean.from_bit(
                    AllocatedBit.alloc(
                        w, bool((state_vals[word] >> i) & 1)
                    )
                )
                for i in range(32)
            ]
            state_u32.append(UInt32.from_bits(bits))
        mb = [Boolean.from_bit(AllocatedBit.alloc(w, bool(b))) for b in mbits]
        out = sha256_compression_function(w, mb, state_u32)
        state_vals = [u.value for u in out]
        wits.append(w.inputs_slice() + w.aux_slice())
        states.append(list(state_vals))
    return wits, states


def test_chained_witness_matches_host_oracle():
    template, prog, carry_views = _free_state_template()
    assert prog.is_pure_bits
    assert len(prog.free_slots) == 256 + 512

    T, B = 3, 2
    rng = np.random.default_rng(23)
    msgs = rng.integers(0, 2, size=(T, B, 512)).astype(np.uint32)
    iv = np.tile(_iv_bits(), (B, 1))

    gen = build_chained_witness(prog, carry_views, use_pallas=False)
    vals_all, final = gen(jnp.asarray(iv), jnp.asarray(msgs))
    assert vals_all.shape == (T, B, prog.num_slots)

    for b in range(B):
        wits, states = _host_chain([msgs[t, b] for t in range(T)])
        for t in range(T):
            got = [int(v) for v in np.asarray(vals_all[t, b])]
            assert got == wits[t], f"witness mismatch chain {b} step {t}"
        # final carry = digest bits of the last step (LSB-first words)
        want_bits = [
            (states[-1][word] >> i) & 1 for word in range(8) for i in range(32)
        ]
        assert [int(v) for v in np.asarray(final[b])] == want_bits


def test_chained_digest_matches_hashlib():
    """Merkle–Damgård by chaining: sha256(m) for a 64-byte m is two
    chained compressions (message block, then the padding block) — the
    final carry state must equal hashlib's digest bit-for-bit."""
    import hashlib

    template, prog, carry_views = _free_state_template()
    m = bytes(range(64))
    padded = m + b"\x80" + b"\x00" * 61 + (512).to_bytes(2, "big")

    def block_bits(blk):  # big-endian bit order (gadget convention)
        return [(byte >> (7 - i)) & 1 for byte in blk for i in range(8)]

    iv = _iv_bits()[None, :]
    msgs = np.asarray(
        [[block_bits(padded[:64])], [block_bits(padded[64:])]], np.uint32
    )
    step = build_chained_production_step(
        prog, template, carry_views, check_batch=2, use_pallas=False
    )
    total, _first, final = step(jnp.asarray(iv), jnp.asarray(msgs))
    assert int(total) == 0
    fb = np.asarray(final[0])
    words = [
        sum(int(fb[w * 32 + i]) << i for i in range(32)) for w in range(8)
    ]
    digest = b"".join(int(w).to_bytes(4, "big") for w in words)
    assert digest == hashlib.sha256(m).digest()


def test_chained_production_step_verdict():
    template, prog, carry_views = _free_state_template()
    T, B, cb = 4, 2, 4  # T*B = 8 instances, checked in chunks of 4
    rng = np.random.default_rng(29)
    msgs = rng.integers(0, 2, size=(T, B, 512)).astype(np.uint32)
    iv = np.tile(_iv_bits(), (B, 1))

    step = build_chained_production_step(
        prog, template, carry_views, check_batch=cb, use_pallas=False
    )
    total, first, final = step(jnp.asarray(iv), jnp.asarray(msgs))
    assert int(total) == 0
    assert final.shape == (B, 256)

    # Corrupt one witness value (check-only path: a corrupted WITNESS
    # must be rejected; corrupting an input just yields a different
    # valid chain).
    gen = build_chained_witness(prog, carry_views, use_pallas=False)
    vals_all, _ = gen(jnp.asarray(iv), jnp.asarray(msgs))
    z4 = vals_all.reshape(T * B // cb, cb, prog.num_slots)
    check = build_chunked_check(
        template, cb, T * B // cb, use_pallas=False, witness_form="bits"
    )
    t0, _ = check(z4)
    assert int(t0) == 0
    zbad = z4.at[1, 2, prog.num_slots - 5].set(
        z4[1, 2, prog.num_slots - 5] ^ 1
    )
    tbad, firstbad = check(zbad)
    assert int(tbad) > 0
    span = cb * template.num_constraints
    assert span <= int(firstbad) < 2 * span  # chunk 1
