"""Core constraint-system tests, mirroring the reference's in-file unit
tests for lc.rs and test_cs.rs (indexer state machine, LC merging,
compute_path, namespace get/set round-trips, satisfiability + mutation)."""

import pytest

from bellpepper_tpu import (
    SCALAR,
    BenchCS,
    Delta,
    LinearCombination,
    MetricCS,
    TestConstraintSystem,
    WitnessCS,
)
from bellpepper_tpu.constraint_system import ConstraintSystem, compute_path
from bellpepper_tpu.lc import Index, Indexer, Variable


def test_indexer_insert_or_update():
    # Mirrors lc.rs:412-433.
    ix = Indexer()
    p = SCALAR.p
    ix.add(2, 1, p)
    assert list(ix.iter()) == [(2, 1)]
    assert ix.last_inserted == (0, 2)
    ix.add(3, 1, p)
    assert list(ix.iter()) == [(2, 1), (3, 1)]
    assert ix.last_inserted == (1, 3)
    ix.add(1, 1, p)
    assert list(ix.iter()) == [(1, 1), (2, 1), (3, 1)]
    assert ix.last_inserted == (0, 1)
    ix.add(2, 1, p)
    assert list(ix.iter()) == [(1, 1), (2, 2), (3, 1)]
    assert ix.last_inserted == (0, 1)


def test_lc_add_simplify():
    # Mirrors lc.rs:384-409: repeated additions merge by variable index.
    n = 5
    lc = LinearCombination.zero(SCALAR)
    expected_sums = [0] * n
    total_additions = 0
    for i in range(n):
        for _ in range(i + 1):
            lc = lc + (1, Variable(Index.aux(i)))
            expected_sums[i] += 1
            total_additions += 1
    assert len(lc) == n
    assert len(lc) != total_additions
    for (var, coeff), i in zip(lc.iter(), range(n)):
        assert var.index.idx == i
        assert coeff == expected_sums[i]


def test_compute_path():
    assert (
        compute_path(("hello", "world", "things"), "thing")
        == "hello/world/things/thing"
    )
    with pytest.raises(ValueError):
        compute_path((), "has/slash")


def test_cs():
    # Mirrors test_cs.rs:472-510.
    cs = TestConstraintSystem()
    assert cs.is_satisfied()
    assert cs.num_constraints() == 0
    a = cs.namespace("a").alloc("var", 10)
    b = cs.namespace("b").alloc("var", 4)
    c = cs.alloc("product", 40)

    cs.enforce("mult", lambda lc: lc + a, lambda lc: lc + b, lambda lc: lc + c)
    assert cs.is_satisfied()
    assert cs.num_constraints() == 1

    cs.set("a/var", 4)
    one = TestConstraintSystem.one()
    cs.enforce("eq", lambda lc: lc + a, lambda lc: lc + one, lambda lc: lc + b)

    assert not cs.is_satisfied()
    assert cs.which_is_unsatisfied() == "mult"

    assert cs.get("product") == 40
    cs.set("product", 16)
    assert cs.is_satisfied()

    ns1 = cs.namespace("test1")
    ns2 = ns1.namespace("test2")
    ns2.alloc("hehe", 1)
    assert cs.get("test1/test2/hehe") == 1


def test_duplicate_path_panics():
    cs = TestConstraintSystem()
    cs.alloc("x", 1)
    with pytest.raises(AssertionError):
        cs.alloc("x", 2)


def test_namespace_nesting_paths():
    cs = TestConstraintSystem()
    ns = cs.namespace("outer")
    inner = ns.namespace("inner")
    v = inner.alloc("v", 7)
    assert cs.get("outer/inner/v") == 7
    assert v.index.is_aux()


def test_hash_stable_and_shape_sensitive():
    def build(val):
        cs = TestConstraintSystem()
        a = cs.alloc("a", val)
        b = cs.alloc("b", 3)
        c = cs.alloc("c", (val * 3) % SCALAR.p)
        cs.enforce("mul", lambda lc: lc + a, lambda lc: lc + b, lambda lc: lc + c)
        return cs

    h1 = build(2).hash()
    h2 = build(9)  # different values, same shape
    assert h1 == h2.hash()
    assert len(h1) == 64

    cs3 = build(2)
    cs3.enforce(
        "extra",
        lambda lc: lc,
        lambda lc: lc,
        lambda lc: lc,
    )
    assert cs3.hash() != h1


def test_hash_known_vector():
    """Pin the empty-CS fingerprint so any layout change is caught.

    Layout (test_cs.rs:214-237): blake2s over u64-BE (1 input, 0 aux,
    0 constraints)."""
    import hashlib
    import struct

    cs = TestConstraintSystem()
    expected = hashlib.blake2s(struct.pack(">QQQ", 1, 0, 0)).hexdigest()
    assert cs.hash() == expected


def test_metric_cs_delta_equal():
    def synth(cs):
        a = cs.alloc("a", 3)
        b = cs.alloc("b", 4)
        c = cs.alloc("c", 12)
        cs.enforce("mul", lambda lc: lc + a, lambda lc: lc + b, lambda lc: lc + c)

    test_cs = TestConstraintSystem()
    synth(test_cs)
    metric_cs = MetricCS()
    synth(metric_cs)

    assert test_cs.delta(metric_cs, False) == Delta.Equal
    assert "mul" in metric_cs.pretty_print()


def test_metric_cs_delta_mismatch():
    test_cs = TestConstraintSystem()
    a = test_cs.alloc("a", 3)
    test_cs.enforce("c0", lambda lc: lc + a, lambda lc: lc + a, lambda lc: lc + a)

    metric = MetricCS()
    b = metric.alloc("a", None)
    metric.enforce("c0", lambda lc: lc + b + b, lambda lc: lc + b, lambda lc: lc + b)

    d = test_cs.delta(metric, False)
    assert d.kind == Delta.CONSTRAINT_MISMATCH
    assert d.info[0] == 0


def test_bench_cs_counts():
    cs = BenchCS()
    a = cs.alloc("a", None)  # value closures never evaluated
    b = cs.alloc_input("b", None)
    cs.enforce("c", lambda lc: lc, lambda lc: lc, lambda lc: lc)
    assert cs.num_constraints() == 1
    assert cs.num_inputs() == 2
    assert cs.num_aux() == 1
    assert a.index.is_aux() and b.index.is_input()


def test_witness_cs_basic_and_extend():
    cs = WitnessCS()
    assert cs.is_witness_generator()
    cs.alloc("x", 5)
    cs.alloc_input("y", 6)
    cs.enforce("noop", lambda lc: lc, lambda lc: lc, lambda lc: lc)
    assert cs.input_assignment == [1, 6]
    assert cs.aux_assignment == [5]

    other = WitnessCS()
    other.alloc_input("z", 9)
    other.alloc("w", 11)
    cs.extend(other)
    # Skips other's ONE input (witness_cs.rs:158-163).
    assert cs.input_assignment == [1, 6, 9]
    assert cs.aux_assignment == [5, 11]


def test_witness_cs_allocate_empty_slices():
    cs = WitnessCS()
    aux, inputs = cs.allocate_empty(3, 2)
    assert len(aux) == 3 and len(inputs) == 2
    aux[0] = 7
    inputs[1] = 8
    assert cs.aux_assignment == [7, 0, 0]
    assert cs.input_assignment == [1, 0, 8]


def test_extend_matches_sequential():
    """The parallel-synthesis associativity property (§3.3 of the survey):
    extending independently synthesized parts equals sequential synthesis."""

    def part1(cs):
        cs.alloc("a", 5)
        cs.alloc_input("pub1", 10)

    def part2(cs):
        cs.alloc("b", 6)
        cs.alloc_input("pub2", 20)

    seq = WitnessCS()
    part1(seq)
    part2(seq)

    cs1 = WitnessCS()
    part1(cs1)
    cs2 = WitnessCS()
    part2(cs2)
    merged = WitnessCS()
    merged.extend(cs1)
    merged.extend(cs2)

    assert merged == seq


def test_verify_inputs():
    cs = TestConstraintSystem()
    cs.alloc_input("x", 3)
    cs.alloc_input("y", 4)
    assert cs.verify([3, 4])
    assert not cs.verify([3, 5])
    assert cs.get_input(1, "x") == 3
