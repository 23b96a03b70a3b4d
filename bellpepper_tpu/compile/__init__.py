"""Circuit compilation: witness tapes and device witness programs.

The reference generates witnesses by running per-variable Rust closures
(WitnessCS, witness_cs.rs:103-123). The TPU-native replacement captures the
*semantic op* behind every allocation once (TapeCS), then compiles the tape
into a vectorized device program that evaluates whole witness vectors —
batched over independent circuit instances — with jnp/XLA ops
(WitnessProgram). This is the traced-batched-gadget-graph half of the
north-star design."""

from .tape import TapeCS
from .witness_program import WitnessProgram

__all__ = ["TapeCS", "WitnessProgram"]
