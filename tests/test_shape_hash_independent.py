"""Independent reconstruction of the reference CS shape hash.

tests/test_core_cs.py pins digests that this repo's own hash_lc produced —
a self-pin. Here the byte stream is re-encoded FROM SCRATCH, following the
Rust source (test_cs.rs:64-115 hash_lc/proc_lc, 214-237 hash):

  header:      u64-BE n_inputs ++ u64-BE n_aux ++ u64-BE n_constraints
  per LC:      u64-BE term_count, then per term (Inputs before Aux, each
               sorted by index, zero coefficients dropped after summing
               duplicates): b'I'/b'A' ++ u64-BE index ++ 32 coeff bytes
               (to_repr = LE bytes of the canonical value, then reversed
               → big-endian)
  digest:      blake2s (default 32-byte), hex

If this ever disagrees with TestConstraintSystem.hash(), one of the two
encoders drifted from the reference layout."""

import hashlib

from bellpepper_tpu import SCALAR, TestConstraintSystem
from bellpepper_tpu.gadgets.boolean import AllocatedBit
from bellpepper_tpu.gadgets.num import AllocatedNum
from bellpepper_tpu.lc import Index


def independent_hash(cs) -> str:
    h = hashlib.blake2s()
    h.update(len(cs.inputs()).to_bytes(8, "big"))
    h.update(len(cs.aux()).to_bytes(8, "big"))
    h.update(len(cs.constraints()).to_bytes(8, "big"))
    p = cs.field.p
    for con in cs.constraints():
        for lc in (con.a, con.b, con.c):
            # proc_lc: sum duplicate terms, drop zeros, order Input(i) then
            # Aux(i) (OrderedVariable Ord, test_cs.rs:53-60).
            acc = {}
            for var, coeff in lc.iter():
                key = (0 if var.index.is_input() else 1, var.index.idx)
                acc[key] = (acc.get(key, 0) + coeff) % p
            items = sorted((k, v) for k, v in acc.items() if v != 0)
            h.update(len(items).to_bytes(8, "big"))
            for (kind, idx), coeff in items:
                h.update(b"I" if kind == 0 else b"A")
                h.update(idx.to_bytes(8, "big"))
                # to_repr is little-endian; the reference reverses it.
                h.update(coeff.to_bytes(32, "little")[::-1])
    return h.hexdigest()


def test_hash_matches_independent_encoding_bit_circuit():
    cs = TestConstraintSystem()
    a = AllocatedBit.alloc(cs.namespace("a"), True)
    b = AllocatedBit.alloc(cs.namespace("b"), False)
    AllocatedBit.xor(cs.namespace("x"), a, b)
    assert cs.hash() == independent_hash(cs)


def test_hash_matches_independent_encoding_num_circuit():
    cs = TestConstraintSystem()
    x = AllocatedNum.alloc(cs.namespace("x"), 7)
    y = AllocatedNum.alloc(cs.namespace("y"), SCALAR.p - 3)  # negative value
    z = x.mul(cs.namespace("m"), y)
    z.add(cs.namespace("s"), x).assert_nonzero(cs.namespace("nz"))
    assert cs.hash() == independent_hash(cs)


def test_hash_matches_independent_encoding_duplicate_terms():
    # Exercise proc_lc's duplicate-sum + zero-drop normalization: build an
    # enforce whose LC mentions the same variable twice with cancelling
    # coefficients.
    from bellpepper_tpu.lc import LinearCombination

    cs = TestConstraintSystem()
    x = AllocatedNum.alloc(cs.namespace("x"), 5)
    lc = LinearCombination.zero(SCALAR)
    lc = lc + (3, x.get_variable()) + (SCALAR.p - 3, x.get_variable())
    lc = lc + (2, x.get_variable())  # net coefficient 2
    cs.enforce(
        "dup",
        lambda l: l + lc,
        lambda l: l + cs.one(),
        lambda l: l + (10, cs.one()),
    )
    assert cs.is_satisfied()
    assert cs.hash() == independent_hash(cs)


# Frozen golden vector for the x*x=y circuit (1 input ONE, aux {x, y},
# one constraint A=x, B=x, C=y, all coefficients 1). The 171-byte
# pre-image below is written out LITERALLY from the Rust layout
# (test_cs.rs:64-115: u64-BE header triple; per LC a u64-BE term count
# then b'I'/b'A' ++ u64-BE index ++ 32 big-endian coeff bytes). The Rust
# toolchain is absent from this image and there is no network egress, so
# the digest cannot be produced by the reference binary here; this
# constant freezes the layout so (a) any drift in either Python encoder
# fails loudly and (b) anyone with the Rust reference can check parity
# offline with:
#   let mut cs = TestConstraintSystem::<blstrs::Scalar>::new();
#   let x = AllocatedNum::alloc(cs.namespace(|| "x"), || Ok(3u64.into()))?;
#   x.square(cs.namespace(|| "sq"))?;
#   assert_eq!(cs.hash(), GOLDEN_SQUARE_HASH);
GOLDEN_SQUARE_HASH = (
    "ad7ad3ff72a37be8bafe33ff9ac897f3a8fe43c246b06f032209c0c04994f06a"
)


def test_golden_square_circuit_hash():
    stream = b""
    stream += (1).to_bytes(8, "big")  # n_inputs (ONE)
    stream += (2).to_bytes(8, "big")  # n_aux (x, y)
    stream += (1).to_bytes(8, "big")  # n_constraints
    one_coeff = (1).to_bytes(32, "big")
    for aux_idx in (0, 0, 1):  # A = x, B = x, C = y
        stream += (1).to_bytes(8, "big")  # term count
        stream += b"A" + aux_idx.to_bytes(8, "big") + one_coeff
    assert len(stream) == 171
    assert hashlib.blake2s(stream).hexdigest() == GOLDEN_SQUARE_HASH

    cs = TestConstraintSystem()
    x = AllocatedNum.alloc(cs.namespace("x"), 3)
    x.square(cs.namespace("sq"))
    assert cs.hash() == GOLDEN_SQUARE_HASH
    assert independent_hash(cs) == GOLDEN_SQUARE_HASH


def test_hash_value_independence():
    # Same shape, different witness values → same hash (it is a SHAPE
    # fingerprint); different shape → different hash.
    def build(v):
        cs = TestConstraintSystem()
        x = AllocatedNum.alloc(cs.namespace("x"), v)
        x.square(cs.namespace("sq"))
        return cs

    assert build(3).hash() == build(9).hash()
    cs2 = build(3)
    AllocatedNum.alloc(cs2.namespace("extra"), 1).square(cs2.namespace("sq2"))
    assert cs2.hash() != build(3).hash()
    assert cs2.hash() == independent_hash(cs2)
