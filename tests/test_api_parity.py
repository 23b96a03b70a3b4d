"""Small API-parity checks: version export, pretty_print formats, Delta
ignore_counts, WitnessCS assignment round-trips."""

from bellpepper_tpu import (
    BELLPEPPER_TPU_VERSION,
    Delta,
    MetricCS,
    TestConstraintSystem,
    WitnessCS,
)
from bellpepper_tpu.gadgets.num import AllocatedNum


def test_version_export():
    assert isinstance(BELLPEPPER_TPU_VERSION, str)
    import bellpepper_tpu

    assert bellpepper_tpu.__version__ == BELLPEPPER_TPU_VERSION


def test_pretty_print_list_format():
    cs = TestConstraintSystem()
    a = AllocatedNum.alloc(cs.namespace("x"), 2)
    a.square(cs.namespace("y"))
    items = cs.pretty_print_list()
    # INPUT lines first (ONE), then AUX paths, then constraint names
    # (test_cs.rs:191-206).
    assert items[0] == "INPUT ONE"
    assert "AUX x/num" in items
    assert "y/squaring constraint" in items
    assert cs.pretty_print() == "\n".join(items)


def test_metric_pretty_print_renders_constraints():
    cs = MetricCS()
    a = AllocatedNum.alloc(cs.namespace("x"), None)
    a.square(cs.namespace("y"))
    out = cs.pretty_print()
    # (A) * (B) = (C) rendering with backticked variable names
    # (metric_cs.rs:130-195).
    assert "y/squaring constraint: (`Ax/num`) * (`Ax/num`) = (`Ay/squared num`)" in out


def test_delta_ignore_counts():
    """ignore_counts skips the count checks and pinpoints the first
    differing constraint (util_cs/mod.rs:24-26, 52-70)."""

    def build(variant):
        cs = TestConstraintSystem()
        a = AllocatedNum.alloc(cs.namespace("x"), 3)
        b = a.square(cs.namespace("y"))
        if variant:
            b.mul(cs.namespace("z"), b)  # differs at constraint index 1
            cs.alloc_input("extra", 1)  # and input count differs
        else:
            b.mul(cs.namespace("z"), a)
        return cs

    a = build(False)
    b = build(True)
    # Without ignore_counts the input-count mismatch masks the real diff...
    d = a.delta(b, False)
    assert d.kind == Delta.INPUT_COUNT_MISMATCH
    # ...with ignore_counts the differing constraint is pinpointed.
    d2 = a.delta(b, True)
    assert d2.kind == Delta.CONSTRAINT_MISMATCH
    assert d2.info[0] == 1


def test_witness_cs_assignment_roundtrip():
    w = WitnessCS()
    w.alloc("a", 5)
    w.alloc_input("b", 6)
    inputs, aux = w.to_assignments()
    w2 = WitnessCS.from_assignments(inputs, aux)
    assert w2 == w
    assert w2.inputs_slice() == [1, 6]
    assert w2.aux_slice() == [5]


def test_namespace_push_pop_panics():
    # constraint_system.rs:289-299 — push/pop on a Namespace is a
    # deliberate panic; only the root manages the namespace stack.
    import pytest

    cs = TestConstraintSystem()
    ns = cs.namespace("a")
    with pytest.raises(RuntimeError, match="root's push_namespace"):
        ns.push_namespace("b")
    with pytest.raises(RuntimeError, match="root's pop_namespace"):
        ns.pop_namespace()


def test_empty_r1cs_ell_layout():
    # Zero-constraint systems must build an (empty) ELL layout rather
    # than crash in the bucket loop.
    from bellpepper_tpu.backend.matvec import _build_shared_ell
    from bellpepper_tpu.r1cs import ShapeCS

    shape = ShapeCS()
    shape.alloc("x", None)
    r = shape.finish()
    assert r.num_constraints == 0
    layouts, pos, padded = _build_shared_ell(r, 0)
    assert padded == 0 and len(pos) == 0
    assert all(len(m.buckets) == 0 for m in layouts.values())


def test_row_density_guard():
    import numpy as np
    import pytest

    from bellpepper_tpu.backend.matvec import MAX_ROW_NNZ, _assert_row_density

    rows = np.zeros(MAX_ROW_NNZ + 1, np.int32)  # all entries in row 0
    with pytest.raises(AssertionError, match="entries per row"):
        _assert_row_density(rows, 1, "matrix a")
    _assert_row_density(rows[:MAX_ROW_NNZ], 1, "matrix a")
