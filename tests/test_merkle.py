"""Merkle-tree device pipeline: pairs of digests hashed level by level
with digest→message rewiring on device. Oracle: the Python gadget path
computing each node on the host."""

import numpy as np
import jax.numpy as jnp

from bellpepper_tpu import WitnessCS
from bellpepper_tpu.compile.pipeline import build_merkle_tree_step
from bellpepper_tpu.compile.witness_program import WitnessProgram
from bellpepper_tpu.gadgets.boolean import AllocatedBit, Boolean
from bellpepper_tpu.gadgets.sha256 import (
    get_sha256_iv,
    sha256_compression_function,
)
from bellpepper_tpu.native import NativeBuilder


def _const_iv_template():
    nb = NativeBuilder()
    msg = [nb.alloc_bit() for _ in range(512)]
    out = nb.sha256_compression(msg, nb.sha256_iv())
    template, tape = nb.finish()
    return template, WitnessProgram(tape), [nb.view(v) for v in out]


def _host_node(left_state, right_state):
    """One parent digest via the Python gadget path. States are 8 words
    of int; message = left||right with big-endian bits per word."""
    msg_bits = []
    for state in (left_state, right_state):
        for w in state:
            msg_bits.extend((w >> (31 - t)) & 1 for t in range(32))
    cs = WitnessCS()
    mb = [Boolean.from_bit(AllocatedBit.alloc(cs, bool(b))) for b in msg_bits]
    out = sha256_compression_function(cs, mb, get_sha256_iv())
    return [u.value for u in out]


def _state_bits(words):
    return [(w >> i) & 1 for w in words for i in range(32)]


def test_merkle_tree_matches_host_oracle():
    template, prog, digest_views = _const_iv_template()
    n_leaves = 8
    rng = np.random.default_rng(41)
    leaf_words = rng.integers(0, 1 << 32, size=(n_leaves, 8), dtype=np.uint64)

    # host oracle tree
    level = [list(map(int, row)) for row in leaf_words]
    while len(level) > 1:
        level = [
            _host_node(level[i], level[i + 1]) for i in range(0, len(level), 2)
        ]
    want_root_bits = _state_bits(level[0])

    # device tree
    leaves = np.asarray(
        [_state_bits(list(map(int, row))) for row in leaf_words], np.uint32
    )
    step = build_merkle_tree_step(
        prog, template, digest_views, n_leaves, use_pallas=False
    )
    root, total = step(jnp.asarray(leaves))
    assert int(total) == 0
    assert [int(b) for b in np.asarray(root)] == want_root_bits
