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
