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
    with pytest.raises(ValueError, match="entries per row"):
        _assert_row_density(rows, 1, "matrix a")
    _assert_row_density(rows[:MAX_ROW_NNZ], 1, "matrix a")


def test_variable_allocated_num_serde():
    # lc.rs:7,26 + num.rs:10-14 derive Serialize/Deserialize; the JSON
    # encoding mirrors serde's externally-tagged enums.
    import json

    from bellpepper_tpu import SCALAR
    from bellpepper_tpu.gadgets.num import AllocatedNum
    from bellpepper_tpu.lc import Index, Variable

    v = Variable(Index.aux(7))
    j = json.loads(json.dumps(v.to_json()))
    assert j == {"Aux": 7}
    assert Variable.from_json(j) == v
    assert Variable.from_json({"Input": 0}).index.is_input()

    cs = TestConstraintSystem()
    n = AllocatedNum.alloc(cs.namespace("x"), SCALAR.p - 2)
    j = json.loads(json.dumps(n.to_json()))
    n2 = AllocatedNum.from_json(j)
    assert n2.get_value() == n.get_value()
    assert n2.get_variable() == n.get_variable()
    n3 = AllocatedNum(None, Variable(Index.aux(3)))
    assert AllocatedNum.from_json(n3.to_json()).get_value() is None


def test_config_object():
    from bellpepper_tpu.backend.matvec import TemplatedSatisfier
    from bellpepper_tpu.config import Config, default_config
    from bellpepper_tpu.r1cs import ShapeCS
    from bellpepper_tpu.gadgets.num import AllocatedNum

    import pytest

    assert default_config().witness_form == "limbs"
    with pytest.raises(ValueError):
        Config(witness_form="nope")
    with pytest.raises(ValueError):
        Config(limb_bits=32)

    cfg = Config(batch=2, use_pallas=False)
    shape = ShapeCS()
    a = AllocatedNum.alloc(shape.namespace("a"), None)
    a.square(shape.namespace("b"))
    template = shape.finish()
    sat = TemplatedSatisfier(template, config=cfg)
    assert sat.batch == 2 and sat.witness_form == "limbs"

    import numpy as np

    be = sat.backend
    z = np.zeros((2, template.num_inputs + template.num_aux, 16), np.uint32)
    z[:, 0, 0] = 1  # ONE
    z[:, 1, 0] = 3  # a
    z[:, 2, 0] = 9  # a^2
    assert sat.is_satisfied(sat.z_from_instances(z))
    z[1, 2, 0] = 8
    assert not sat.is_satisfied(sat.z_from_instances(z))
