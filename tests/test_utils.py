"""Serialization (checkpoint/resume) and profiling utilities."""

import numpy as np
import pytest

from bellpepper_tpu import TestConstraintSystem
from bellpepper_tpu.gadgets.num import AllocatedNum
from bellpepper_tpu.r1cs import R1CS
from bellpepper_tpu.utils import (
    load_r1cs,
    load_witness,
    phase,
    phase_report,
    save_r1cs,
    save_witness,
    shape_fingerprint,
)


def _circuit(cs):
    a = AllocatedNum.alloc(cs.namespace("a"), 3)
    b = AllocatedNum.alloc(cs.namespace("b"), 4)
    c = a.mul(cs.namespace("c"), b)
    c.inputize(cs.namespace("out"))


def test_r1cs_roundtrip(tmp_path):
    cs = TestConstraintSystem()
    _circuit(cs)
    r = R1CS.from_test_cs(cs)
    p = str(tmp_path / "ckpt.npz")
    fp = save_r1cs(p, r)
    r2 = load_r1cs(p, expect_fingerprint=fp)
    assert shape_fingerprint(r2) == fp
    assert r2.names == r.names
    assert r2.coeff_table == r.coeff_table
    for m in ("a", "b", "c"):
        assert (getattr(r2, m).rows == getattr(r, m).rows).all()
        assert (getattr(r2, m).cols == getattr(r, m).cols).all()

    # satisfiability still works after resume
    ok, row = r2.eval_host(cs.scalar_inputs(), cs.scalar_aux())
    assert ok


def test_witness_roundtrip_and_provenance(tmp_path):
    cs = TestConstraintSystem()
    _circuit(cs)
    r = R1CS.from_test_cs(cs)
    fp = save_r1cs(str(tmp_path / "r.npz"), r)

    from bellpepper_tpu.backend.field_jnp import get_backend

    be = get_backend(r.field)
    z = be.to_limbs(cs.scalar_inputs() + cs.scalar_aux())
    wp = str(tmp_path / "w.npz")
    save_witness(wp, z, fp, shard=(2, 8))
    z2, meta = load_witness(wp, expect_fingerprint=fp)
    assert (z2 == z).all()
    assert meta["shard_index"] == 2 and meta["shard_count"] == 8

    with pytest.raises(AssertionError):
        load_witness(wp, expect_fingerprint="deadbeef")


def test_fingerprint_detects_shape_change(tmp_path):
    cs = TestConstraintSystem()
    _circuit(cs)
    r = R1CS.from_test_cs(cs)
    cs2 = TestConstraintSystem()
    _circuit(cs2)
    cs2.enforce("extra", lambda lc: lc, lambda lc: lc, lambda lc: lc)
    r2 = R1CS.from_test_cs(cs2)
    assert shape_fingerprint(r) != shape_fingerprint(r2)


def test_phase_profiling():
    with phase("synthesize"):
        sum(range(1000))
    with phase("synthesize"):
        sum(range(1000))
    with phase("check", trace=True):
        sum(range(10))
    rep = phase_report(reset=True)
    assert rep["synthesize"]["count"] == 2
    assert rep["check"]["count"] == 1
    assert phase_report() == {}
