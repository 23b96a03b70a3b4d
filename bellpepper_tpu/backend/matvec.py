"""Sparse R1CS evaluation on device: gather → modmul → segment-sum →
reduce.

This replaces the reference's sequential `eval_lc` loops
(test_cs.rs:137-155, lc.rs:245-267) with a data-parallel pipeline over the
COO entries of each matrix:

    zv    = z[cols]                  # gather witness limbs     [E, 16]
    prod  = coeff[coeff_ids] ∘ zv    # batched modmul            [E, 16]
    digits= split8(prod)             # 8-bit planes              [E, 32]
    rowsum= segment_sum(digits, rows)# per-row accumulation      [R, 32]
    Az    = reduce(rowsum)           # wide→canonical            [R, 16]

The segment-sum accumulates 8-bit digits in 32-bit lanes, which is exact
for up to 2^24/255 ≈ 65k entries per row — far beyond any gadget-built
row (MultiEq packs at most CAPACITY bits ≈ a few hundred terms)."""

from __future__ import annotations

from collections import defaultdict
from dataclasses import dataclass
from functools import partial
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..r1cs import R1CS
from .field_jnp import FieldBackend, get_backend


class DeviceMatrix(NamedTuple):
    rows: jnp.ndarray  # int32[E]
    cols: jnp.ndarray  # int32[E]
    coeff_ids: jnp.ndarray  # int32[E]


@partial(
    jax.tree_util.register_dataclass,
    data_fields=("a", "b", "c", "coeff_limbs"),
    meta_fields=("num_constraints", "num_inputs", "num_aux"),
)
@dataclass(frozen=True)
class DeviceR1CS:
    """R1CS resident on device: three COO matrices + the coefficient table
    as limb planes.

    Registered as a pytree with the sizes as STATIC metadata, so it can be
    passed as a `jit` ARGUMENT — closing over multi-hundred-MB index
    arrays embeds them as HLO literals, which overflows the remote-compile
    transport for 2^24-row systems (and bloats the executable anywhere)."""

    a: DeviceMatrix
    b: DeviceMatrix
    c: DeviceMatrix
    coeff_limbs: jnp.ndarray  # uint32[K, 16]
    num_constraints: int
    num_inputs: int
    num_aux: int

    @staticmethod
    def from_r1cs(r: R1CS) -> "DeviceR1CS":
        be = get_backend(r.field)
        for name in ("a", "b", "c"):
            _assert_row_density(
                getattr(r, name).rows, r.num_constraints, f"matrix {name}"
            )
        return DeviceR1CS(
            a=DeviceMatrix(
                jnp.asarray(r.a.rows), jnp.asarray(r.a.cols), jnp.asarray(r.a.coeff_ids)
            ),
            b=DeviceMatrix(
                jnp.asarray(r.b.rows), jnp.asarray(r.b.cols), jnp.asarray(r.b.coeff_ids)
            ),
            c=DeviceMatrix(
                jnp.asarray(r.c.rows), jnp.asarray(r.c.cols), jnp.asarray(r.c.coeff_ids)
            ),
            coeff_limbs=jnp.asarray(be.to_limbs(r.coeff_table)),
            num_constraints=r.num_constraints,
            num_inputs=r.num_inputs,
            num_aux=r.num_aux,
        )


def sparse_matvec(
    be: FieldBackend,
    mat: DeviceMatrix,
    coeff_limbs: jnp.ndarray,
    z: jnp.ndarray,
    num_rows: int,
) -> jnp.ndarray:
    """M·z over 𝔽_p: returns uint32[num_rows, 16]."""
    zv = z[mat.cols]  # [E, 16]
    coeffs = coeff_limbs[mat.coeff_ids]  # [E, 16]
    prod = be.mul(zv, coeffs)  # [E, 16]
    digits = be._split8(prod)  # [E, 32], each < 256
    rowsum = jax.ops.segment_sum(digits, mat.rows, num_segments=num_rows)
    return be._reduce_wide8(rowsum)  # [R, 16]


def r1cs_eval(
    be: FieldBackend, d: DeviceR1CS, z: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """(A·z, B·z, C·z), each uint32[R, 16]."""
    az = sparse_matvec(be, d.a, d.coeff_limbs, z, d.num_constraints)
    bz = sparse_matvec(be, d.b, d.coeff_limbs, z, d.num_constraints)
    cz = sparse_matvec(be, d.c, d.coeff_limbs, z, d.num_constraints)
    return az, bz, cz


# Premultiplying the coefficient table against z turns per-entry modmuls
# in the scan body into plain gathers — the jnp schoolbook modmul is
# VPU-compute-bound at a few M muls/s, so at 2^24 rows the per-entry
# modmuls dominate everything else by ~10×. The premul is SPAN-BOUNDED:
# identity/zero coefficients gather straight from z (no multiply at
# all), and each non-trivial coefficient k premultiplies only
# z[:max_col_k+1] — the column span its entries actually touch. Entry
# indices are remapped host-side into the concatenated source buffer.
# Auto-enabled while the extra premul rows stay small (the dense modmul
# materializes padded [span, 32] temps — unbounded spans OOM'd 2^24).
_PREMUL_MAX_TABLE = 16
_PREMUL_MAX_ROWS = 1 << 22


def build_row_chunked_eval(
    r: R1CS,
    n_chunks: int,
    names=("a", "b", "c"),
    premul_table: Optional[bool] = None,
    reuse=None,
):
    """Row-chunked A·z/B·z/C·z for HUGE single systems: a `lax.scan` over
    contiguous row blocks so only ONE block's per-entry modmul
    intermediates are live at a time (the monolithic `r1cs_eval` keeps
    ~63 digit planes per entry alive — tens of GB at 2^24 rows; chunked,
    peak HLO temp is E/n_chunks·digits).

    With `premul_table` (auto when the non-trivial coefficient spans are
    small), the scan body does NO per-entry modmuls: tz[k] =
    coeff_k·z[:span_k] is computed once per call (identity/zero
    coefficients fold away entirely), and each entry becomes one gather
    from concat([z] + tz).

    Returns (eval_fn, prep) where eval_fn(z, prep) → (az, bz, cz), each
    uint32[R, 16]. `prep` is a pytree of device buffers — pass it as a
    jit ARGUMENT (closures embed HLO literals; see DeviceR1CS). ELL-mode
    entries are stored FLAT ([R·deg]) and reshaped to the chunk grid at
    trace time, so ONE prep serves any chunk count.

    `reuse=(meta, prep)` — from another call's `eval_fn._layout_meta`
    and prep — skips the whole host layout build AND the device uploads
    (hundreds of MB at 2^24 rows): the witness-completion product and
    the checker share one layout at their own chunk sizes. Requires the
    reused names to be in ELL or slice mode (segment-sum layouts are
    chunk-count-specific).

    Reference hot loop: test_cs.rs:239-253 (eval per constraint row)."""
    be = get_backend(r.field)
    R_ = r.num_constraints
    if R_ == 0:
        # No constraints: empty eval, vacuous check/product.
        def eval_fn(z, prep):
            e = jnp.zeros((0, 16), jnp.uint32)
            return tuple(e for _ in names)

        eval_fn._rpc = 0
        eval_fn._semi_ok = False
        eval_fn._zsrc = lambda z, cl: z
        eval_fn._blocks = None
        eval_fn._blocks_semi = None
        eval_fn._layout_meta = {"modes": {}, "premul": False}
        return eval_fn, {}
    if n_chunks <= 0 or R_ % n_chunks:
        raise ValueError(
            f"n_chunks ({n_chunks}) must evenly divide num_constraints ({R_})"
        )
    rpc = R_ // n_chunks
    N = r.num_inputs + r.num_aux  # == len(z) rows (input 0 is ONE)
    coeff_vals = [c % r.field.p for c in r.coeff_table]

    if reuse is not None:
        meta, shared = reuse
        missing = [n for n in names if n not in meta["modes"]]
        assert not missing, f"reused layout lacks matrices {missing}"
        assert all(
            meta["modes"][n][0] in ("ell", "slice") for n in names
        ), "segment-sum layouts are chunk-count-specific; cannot reuse"
        premul_table = meta["premul"]
        span = meta["span"]
        offset = meta["offset"]
        ell_deg = {
            n: meta["modes"][n][1]
            for n in names
            if meta["modes"][n][0] == "ell"
        }
        slice_names = {n for n in names if meta["modes"][n][0] == "slice"}
        full_names = {
            n
            for n in names
            if meta["modes"][n][0] == "ell" and meta["modes"][n][2]
        }
        prep = {"coeff_limbs": shared["coeff_limbs"]}
        for n in names:
            if n in slice_names:
                prep[n] = {
                    "start": jax.device_put(
                        (
                            meta["modes"][n][1] + rpc * np.arange(n_chunks)
                        ).astype(np.int32)
                    )
                }
            else:
                prep[n] = shared[n]
        return _finish_row_chunked_eval(
            r, be, R_, rpc, n_chunks, names, prep, meta, ell_deg,
            slice_names, full_names, span, offset, premul_table,
        )

    # Column span touched by each non-trivial coefficient, across all
    # requested matrices — premul only covers z[:span_k]. One pass per
    # matrix (np.maximum.at), not one pass per table entry.
    span = {}
    n_table = len(coeff_vals)
    nontrivial = np.asarray([cv not in (0, 1) for cv in coeff_vals])
    if premul_table is None or premul_table:
        for name in names:
            m = getattr(r, name)
            cids = np.asarray(m.coeff_ids)
            cols = np.asarray(m.cols)
            # per-coefficient max column: one masked max per nontrivial
            # table entry (the table is tiny; np.maximum.at on tens of
            # millions of entries was the slow alternative)
            for k in np.nonzero(nontrivial)[0]:
                sel_k = cids == k
                if not sel_k.any():
                    continue
                mx_k = int(cols[sel_k].max())
                span[int(k)] = max(span.get(int(k), 0), mx_k + 1)
    sum_span = sum(span.values())
    if premul_table is None:
        premul_table = (
            len(span) <= _PREMUL_MAX_TABLE and sum_span <= _PREMUL_MAX_ROWS
        )
    # offset of each coefficient's premul slice in the gather source
    offset, cursor = {}, N
    for k in sorted(span):
        offset[k] = cursor
        cursor += span[k]

    prep = {}
    ell_deg = {}
    slice_names = set()
    full_names = set()  # mask all-ones: the pad-zeroing multiply is a no-op
    modes = {}
    for name in names:
        m = getattr(r, name)
        rows_np = np.asarray(m.rows)
        degrees = (
            np.bincount(rows_np, minlength=R_)
            if len(rows_np)
            else np.zeros(R_, np.int64)
        )
        deg = max(int(degrees.max()) if R_ else 0, 1)
        if deg > MAX_ROW_NNZ:
            raise ValueError(
                f"matrix {name}: a row has {deg} entries; the digit "
                f"accumulation is exact only up to {MAX_ROW_NNZ} per row"
            )
        n_entries = len(rows_np)
        # ELL mode: entries laid out [row, slot] so the per-row sum is a
        # dense reshape-sum — XLA's scatter-add (segment_sum) is ~70×
        # slower on TPU. Falls back to segment_sum when one dense row
        # would blow the padding up.
        use_ell = deg * R_ <= max(2 * n_entries, R_ * 4)
        if use_ell:
            ell_deg[name] = deg
            e_max = rpc * deg
            # Uniform-degree row-sorted entries (the common shape from
            # gadget and synthetic builders) ARE the dense ELL layout
            # already — skip the lexsort + position scatter entirely
            # (several seconds of 33M-entry passes at 2^24 rows).
            sorted_rows = n_entries == 0 or bool(
                (rows_np[1:] >= rows_np[:-1]).all()
            )
            uniform = sorted_rows and n_entries == R_ * deg
            if uniform:
                flat_cols = np.ascontiguousarray(m.cols, np.int32)
                flat_cids = np.ascontiguousarray(m.coeff_ids, np.int32)
                flat_mask = np.ones(R_ * deg, np.uint32)
            else:
                if sorted_rows:
                    order = None
                    rows_s = rows_np
                else:
                    order = np.lexsort((np.arange(n_entries), rows_np))
                    rows_s = rows_np[order]
                ptr = np.zeros(R_ + 1, np.int64)
                np.cumsum(degrees, out=ptr[1:])
                slot = np.arange(n_entries) - ptr[rows_s]
                pos = rows_s * deg + slot  # dense ELL position per entry
                flat_cols = np.zeros(R_ * deg, np.int32)
                flat_cids = np.zeros(R_ * deg, np.int32)
                flat_mask = np.zeros(R_ * deg, np.uint32)
                if order is None:
                    flat_cols[pos] = np.asarray(m.cols)
                    flat_cids[pos] = np.asarray(m.coeff_ids)
                else:
                    flat_cols[pos] = np.asarray(m.cols)[order]
                    flat_cids[pos] = np.asarray(m.coeff_ids)[order]
                flat_mask[pos] = 1
            # Contiguous identity matrix (e.g. C rows selecting a dense
            # aux segment, cols = base + row): the per-entry gather — the
            # dominant cost at ~30 ns/index — collapses to one
            # dynamic_slice per chunk.
            if (
                R_ > 0
                and deg == 1
                and bool(flat_mask.all())
                and all(
                    coeff_vals[int(k)] == 1 for k in np.unique(flat_cids)
                )
                and bool(
                    np.array_equal(
                        flat_cols,
                        flat_cols[:1] + np.arange(R_, dtype=flat_cols.dtype),
                    )
                )
            ):
                slice_names.add(name)
                del ell_deg[name]
                modes[name] = ("slice", int(flat_cols[0]))
                prep[name] = {
                    "start": jax.device_put(
                        (int(flat_cols[0]) + rpc * np.arange(n_chunks)).astype(
                            np.int32
                        )
                    )
                }
                continue
            cols_p, cids_p, mask_p = flat_cols, flat_cids, flat_mask
            lrow_p = None  # unused in ELL mode
        else:
            order = np.argsort(rows_np, kind="stable")
            rows_s = rows_np[order]
            cols_s = np.asarray(m.cols)[order]
            cids_s = np.asarray(m.coeff_ids)[order]
            bounds = np.searchsorted(rows_s, np.arange(0, R_ + 1, rpc))
            counts = np.diff(bounds)
            e_max = int(counts.max()) if counts.size else 0
            e_max = max(e_max, 1)
            cols_p = np.zeros((n_chunks, e_max), np.int32)
            cids_p = np.zeros((n_chunks, e_max), np.int32)
            lrow_p = np.zeros((n_chunks, e_max), np.int32)
            mask_p = np.zeros((n_chunks, e_max), np.uint32)
            for k in range(n_chunks):
                s, e = int(bounds[k]), int(bounds[k + 1])
                n = e - s
                cols_p[k, :n] = cols_s[s:e]
                cids_p[k, :n] = cids_s[s:e]
                lrow_p[k, :n] = rows_s[s:e] - k * rpc
                mask_p[k, :n] = 1
        entry = {} if lrow_p is None else {"lrow": jax.device_put(lrow_p)}
        if premul_table:
            # host-side remap: identity → col, zero → masked out,
            # non-trivial → its premul slice. One lookup-table pass; the
            # raw cols/cids are never read on device in premul mode, so
            # they are not uploaded (at 2^24 entries they would pin
            # ~130 MB of dead HBM per matrix). int32 throughout (the
            # source buffer is < 2^31 rows — asserted below); int64
            # temporaries double the memory passes at 33M entries.
            assert cursor < (1 << 31)
            off_lut = np.zeros(n_table, np.int32)
            for k in span:
                off_lut[k] = offset[k]
            src_p = cols_p + off_lut[cids_p]
            zero_ids = [k for k, cv in enumerate(coeff_vals) if cv == 0]
            full = bool(mask_p.all())
            has_zero = bool(
                np.isin(np.asarray(zero_ids, np.int32), cids_p).any()
            ) if zero_ids else False
            if has_zero:
                is_zero = np.asarray([cv == 0 for cv in coeff_vals])
                mask_p = mask_p.copy()
                mask_p[is_zero[cids_p]] = 0
                full = False
            if not full:
                src_p[mask_p == 0] = 0
            entry["src"] = jax.device_put(src_p)
            if not full:
                # full masks are a device no-op — skip the (hundreds of
                # MB at 2^24 rows) upload entirely
                entry["mask"] = jax.device_put(mask_p)
        else:
            full = bool(mask_p.all())
            entry["cols"] = jax.device_put(cols_p)
            entry["cids"] = jax.device_put(cids_p)
            if not full:
                entry["mask"] = jax.device_put(mask_p)
        prep[name] = entry
        if full:
            full_names.add(name)
        if name in ell_deg:
            modes[name] = ("ell", ell_deg[name], full)
        else:
            modes[name] = ("seg",)
    prep["coeff_limbs"] = jax.device_put(
        jnp.asarray(be.to_limbs(r.coeff_table))
    )
    meta = {
        "premul": premul_table,
        "span": span,
        "offset": offset,
        "modes": modes,
    }
    return _finish_row_chunked_eval(
        r, be, R_, rpc, n_chunks, names, prep, meta, ell_deg, slice_names,
        full_names, span, offset, premul_table,
    )


def _finish_row_chunked_eval(
    r, be, R_, rpc, n_chunks, names, prep, meta, ell_deg, slice_names,
    full_names, span, offset, premul_table,
):
    """Closure construction for build_row_chunked_eval (shared by the
    fresh-build and layout-reuse paths)."""
    N = r.num_inputs + r.num_aux

    # Premul multiplies run per check/eval CALL: on TPU route them through
    # the Pallas kernel (570M muls/s) — the jnp schoolbook modmul is
    # VPU-bound at a few M muls/s and would dominate the whole check.
    if premul_table and span and jax.default_backend() == "tpu":
        from .field_pallas import get_pallas_ops

        _pops = get_pallas_ops(r.field)

        def _pm_mul(zk, ck):
            n = zk.shape[0]
            al = _pops.to_limb_major(zk)
            bl = _pops.to_limb_major(jnp.broadcast_to(ck, zk.shape))
            return _pops.from_limb_major(_pops.mul(al, bl), n)

    else:

        def _pm_mul(zk, ck):
            return be.mul(zk, jnp.broadcast_to(ck, zk.shape))

    def _zsrc(z, cl):
        """Per-call source buffer the scan body gathers from."""
        if z.shape[0] != N:
            raise ValueError(
                f"z has {z.shape[0]} rows; expected num_inputs + num_aux "
                f"= {N} (a padded z would silently shift every premul "
                f"gather offset)"
            )
        if not premul_table:
            return z
        rows = [z]
        for k in sorted(span):
            zk = z[: span[k]]
            rows.append(_pm_mul(zk, cl[k]))
        return jnp.concatenate(rows, axis=0) if len(rows) > 1 else z

    def _gathered(zsrc, cl, mx, name):
        """One chunk's per-entry values for matrix `name`, canonical
        uint32[rpc·deg, 16] (or [rpc, 16] for slice mode). Slice-mode
        matrices read one contiguous block instead of gathering — the
        per-entry gather costs ~30 ns/index on v5e and dominates the
        monolithic check."""
        if name in slice_names:
            return jax.lax.dynamic_slice(zsrc, (mx["start"], 0), (rpc, 16))
        if premul_table:
            v = zsrc[mx["src"]]  # pre-multiplied
        else:
            v = be.mul(zsrc[mx["cols"]], cl[mx["cids"]])
        if name in full_names:
            return v  # no padded entries — skip the mask multiply
        return v * mx["mask"][:, None]  # zero padded entries

    def _ell_rowsum(v, deg, acc_dtype=None):
        """Sum the ELL slot axis of v[rpc·deg, K] → [rpc, K] via strided
        slices, NOT reshape(rpc, deg, K).sum(1): the 3-D reshape makes the
        tiny deg axis a minor tiled dim, which XLA pads deg→128 — at
        2^21-row chunks that turns a 512 MB temp into 32 GB (observed
        compile-time OOM on v5e). deg-1 strided adds fuse cleanly."""
        if deg == 1:
            return v if acc_dtype is None else v.astype(acc_dtype)
        if deg <= 16:
            acc = v[0::deg] if acc_dtype is None else v[0::deg].astype(acc_dtype)
            for i in range(1, deg):
                acc = acc + v[i::deg]
            return acc
        out = v.reshape(v.shape[0] // deg, deg, v.shape[-1])
        return out.sum(axis=1) if acc_dtype is None else out.sum(
            axis=1, dtype=acc_dtype
        )

    def _block(zsrc, cl, mx, name):
        v = _gathered(zsrc, cl, mx, name)
        if name in slice_names:
            # deg == 1, identity coeffs — but the canonical contract must
            # hold even for non-canonical (≥ p) witness values, so keep
            # the reduction (the gather was the dominant cost, not this).
            return be._reduce_wide8(be._split8(v))
        deg = ell_deg.get(name)
        digits = be._split8(v)
        if deg is not None:  # dense ELL slot-sum
            rowsum = _ell_rowsum(digits, deg)
        else:
            rowsum = jax.ops.segment_sum(
                digits, mx["lrow"], num_segments=rpc
            )
        return be._reduce_wide8(rowsum)  # [rpc, 16]

    def _blocks(zsrc, cl, xs, nm):
        return tuple(_block(zsrc, cl, x, n) for n, x in zip(nm, xs))

    def _carry16_semi(x):
        """uint32[rpc, 16] (limbs possibly > 16 bits from row sums) →
        limb-major semi-reduced uint32[17, rpc]: one carry pass, with the
        final carry as limb 17. Unrolled (16 limbs) so XLA fuses it with
        the producing gather/sum instead of materializing scan state."""
        outs = []
        carry = None
        for i in range(16):
            tot = x[..., i] if carry is None else x[..., i] + carry
            outs.append(tot & jnp.uint32(0xFFFF))
            carry = tot >> 16
        outs.append(carry)
        return jnp.stack(outs, axis=0)

    # Semi-reduced blocks for the fused mul-compare kernel: plain 16-bit
    # limb sums + one carry pass replace the 8-bit digit-plane reduction
    # AND the output canonicalization entirely. Identity-coefficient
    # entries gather RAW witness values, which the API does not require
    # to be canonical — bound deg by the worst case (entries < 2^256), so
    # a row sum stays under the kernel's semi bound p·2^11.
    _SEMI_MAX_DEG = max(1, (r.field.p << 11) >> 256)

    def _blocks_semi(zsrc, cl, xs, nm):
        outs = []
        for n, x in zip(nm, xs):
            v = _gathered(zsrc, cl, x, n)
            deg = ell_deg.get(n)
            if deg is not None and deg > 1:
                v = _ell_rowsum(v, deg, acc_dtype=jnp.uint32)
            outs.append(_carry16_semi(v))
        return tuple(outs)

    semi_ok = all(
        n in ell_deg or n in slice_names for n in names
    ) and (
        max((ell_deg[n] for n in names if n in ell_deg), default=1)
        <= _SEMI_MAX_DEG
    )

    def _xs(prep, nm):
        """Per-chunk scan inputs: ELL entries are stored FLAT (so one
        prep serves any chunk count) — reshape to the chunk grid here
        (metadata-only on device arrays)."""
        out = []
        for name in nm:
            e = prep[name]
            if name in ell_deg:
                e = {k: v.reshape(n_chunks, -1) for k, v in e.items()}
            out.append(e)
        return tuple(out)

    def eval_fn(z, prep):
        cl = prep["coeff_limbs"]
        zsrc = _zsrc(z, cl)

        def body(carry, xs):
            return carry, _blocks(zsrc, cl, xs, names)

        _, outs = jax.lax.scan(body, 0, _xs(prep, names))
        return tuple(o.reshape(R_, 16) for o in outs)

    eval_fn._zsrc = _zsrc
    eval_fn._blocks = _blocks
    eval_fn._blocks_semi = _blocks_semi
    eval_fn._semi_ok = semi_ok
    eval_fn._rpc = rpc
    eval_fn._xs = _xs
    eval_fn._layout_meta = meta
    return eval_fn, prep


def _row_block_mul(r: R1CS, rpc: int, use_pallas: Optional[bool]):
    """Per-row modmul for [rpc, 16] scan blocks. The Pallas kernel is
    ~100× the jnp schoolbook on TPU (VPU-compute-bound); route through
    it whenever the block size tiles."""
    from .field_pallas import TILE, get_pallas_ops

    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu" and rpc % TILE == 0
    if not use_pallas:
        return get_backend(r.field).mul
    ops = get_pallas_ops(r.field)

    def mul(x, y):
        xl = ops.to_limb_major(x)
        yl = ops.to_limb_major(y)
        return ops.from_limb_major(ops.mul(xl, yl), x.shape[0])

    return mul


def build_row_chunked_product(
    r: R1CS,
    n_chunks: int,
    premul_table: Optional[bool] = None,
    use_pallas: Optional[bool] = None,
    reuse=None,
):
    """(A·z) ∘ (B·z) row-chunked: the witness-completion primitive for
    product-form systems (aux segment = per-row products). Fusing the
    modmul into the scan body keeps ONLY the product array materialized
    — separate az/bz outputs double the O(R·16) footprint, which is the
    difference between fitting and OOM at 2^24 rows.

    Returns (prod_fn, prep); prod_fn(z, prep) → uint32[R, 16].
    `reuse=(check_fn._layout_meta, prep)` shares another call's layout
    and device buffers (the product and the checker read the same A/B
    index arrays — a second build costs seconds of numpy and hundreds
    of MB of transfers at 2^24 rows)."""
    if r.num_constraints == 0:
        return (lambda z, prep: jnp.zeros((0, 16), jnp.uint32)), {}
    eval_fn, prep = build_row_chunked_eval(
        r, n_chunks, names=("a", "b"), premul_table=premul_table,
        reuse=reuse,
    )
    R_ = r.num_constraints
    _zsrc, _blocks = eval_fn._zsrc, eval_fn._blocks
    _mul = _row_block_mul(r, eval_fn._rpc, use_pallas)

    def prod_fn(z, prep):
        cl = prep["coeff_limbs"]
        zsrc = _zsrc(z, cl)

        def body(carry, xs):
            az, bz = _blocks(zsrc, cl, xs, ("a", "b"))
            return carry, _mul(az, bz)

        _, prod = jax.lax.scan(body, 0, eval_fn._xs(prep, ("a", "b")))
        return prod.reshape(R_, 16)

    prod_fn._layout_meta = eval_fn._layout_meta
    return prod_fn, prep


def build_row_chunked_check(
    r: R1CS,
    n_chunks: int,
    premul_table: Optional[bool] = None,
    use_pallas: Optional[bool] = None,
    reuse=None,
):
    """Row-chunked satisfiability for one HUGE system on ONE device:
    scan row blocks, keep only (n_bad, first) — nothing O(R) is ever
    materialized beyond the scan's per-block temporaries.

    Returns (check_fn, prep); check_fn(z, prep) → (n_bad, first_row).
    check_fn._layout_meta + prep can be passed as `reuse` to
    build_row_chunked_product to share the layout and device buffers."""
    if r.num_constraints == 0:
        return (
            lambda z, prep: (jnp.uint32(0), jnp.uint32(0xFFFFFFFF))
        ), {}
    eval_fn, prep = build_row_chunked_eval(
        r, n_chunks, premul_table=premul_table, reuse=reuse
    )
    rpc = eval_fn._rpc
    _zsrc, _blocks = eval_fn._zsrc, eval_fn._blocks
    want_pallas = (
        use_pallas
        if use_pallas is not None
        else jax.default_backend() == "tpu"
    )
    sentinel = jnp.uint32(0xFFFFFFFF)

    from .field_pallas import TILE

    if (
        want_pallas
        and eval_fn._semi_ok
        and rpc % TILE == 0
        and r.field.NUM_BITS >= 250
    ):
        # Fast path: semi-reduced 16-bit limb sums feed the fused
        # mul-compare kernel — no 8-bit digit planes, no per-matvec
        # canonicalization, no separate modmul.
        from .field_pallas import make_mulcmp

        mulcmp = make_mulcmp(r.field)
        _sblocks = eval_fn._blocks_semi

        def check_fn(z, prep):
            cl = prep["coeff_limbs"]
            zsrc = _zsrc(z, cl)

            def body(k, xs):
                az, bz, cz = _sblocks(zsrc, cl, xs, ("a", "b", "c"))
                bad = mulcmp(az, bz, cz) != 0  # [rpc]
                nb = jnp.sum(bad.astype(jnp.uint32))
                first = jnp.where(
                    nb > 0,
                    jnp.argmax(bad).astype(jnp.uint32)
                    + k.astype(jnp.uint32) * jnp.uint32(rpc),
                    sentinel,
                )
                return k + 1, (nb, first)

            _, (nbs, firsts) = jax.lax.scan(
                body, jnp.int32(0), eval_fn._xs(prep, ("a", "b", "c"))
            )
            return jnp.sum(nbs), jnp.min(firsts)

        check_fn._layout_meta = eval_fn._layout_meta
        return check_fn, prep

    _mul = _row_block_mul(r, rpc, use_pallas)

    def check_fn(z, prep):
        cl = prep["coeff_limbs"]
        zsrc = _zsrc(z, cl)

        def body(k, xs):
            az, bz, cz = _blocks(zsrc, cl, xs, ("a", "b", "c"))
            bad = jnp.any(_mul(az, bz) != cz, axis=1)  # [rpc]
            nb = jnp.sum(bad.astype(jnp.uint32))
            first = jnp.where(
                nb > 0,
                jnp.argmax(bad).astype(jnp.uint32)
                + k.astype(jnp.uint32) * jnp.uint32(rpc),
                sentinel,
            )
            return k + 1, (nb, first)

        _, (nbs, firsts) = jax.lax.scan(
            body, jnp.int32(0), eval_fn._xs(prep, ("a", "b", "c"))
        )
        return jnp.sum(nbs), jnp.min(firsts)

    check_fn._layout_meta = eval_fn._layout_meta
    return check_fn, prep


def violation_mask(be: FieldBackend, d: DeviceR1CS, z: jnp.ndarray) -> jnp.ndarray:
    """bool[R]: True where A·z ∘ B·z ≠ C·z."""
    az, bz, cz = r1cs_eval(be, d, z)
    return ~be.eq(be.mul(az, bz), cz)


def assemble_z(be: FieldBackend, inputs, aux) -> jnp.ndarray:
    """Host witness → device z = inputs ++ aux as uint32[N, 16]."""
    return jnp.asarray(be.to_limbs(list(inputs) + list(aux)))


# The 8-bit digit row sums accumulate in uint32 lanes; they are exact only
# while 255·nnz plus the running carry fits 32 bits. Layout builders assert
# this so an externally-built R1CS with a denser row fails loudly at build
# time instead of corrupting row sums.
MAX_ROW_NNZ = (1 << 24) // 255


def _assert_row_density(rows: np.ndarray, num_rows: int, what: str) -> None:
    if len(rows) == 0:
        return
    max_nnz = int(np.bincount(rows, minlength=num_rows).max())
    # A real exception, not `assert`: this guards numerical EXACTNESS (a
    # denser row silently overflows the uint32 digit accumulation and
    # corrupts the satisfiability verdict) and must survive `python -O`.
    if max_nnz > MAX_ROW_NNZ:
        raise ValueError(
            f"{what}: a row has {max_nnz} entries; the digit accumulation "
            f"is exact only up to {MAX_ROW_NNZ} entries per row"
        )


class EllMatrix(NamedTuple):
    """Scatter-free sparse layout for TPU row reduction.

    Rows are permuted into buckets of uniform padded width K (next power
    of two of the row's nnz); entries are stored bucket-major so each
    bucket's row sums are a dense ``reshape([Rk, K, 32]).sum(1)``, and the
    global row order is restored with one gather (``inv_pos``). No
    scatter-add anywhere — XLA scatter was measured 70× slower than the
    dense pipeline on v5e."""

    cols: jnp.ndarray  # int32[total_slots] (bucket-major, padded)
    coeff_ids: jnp.ndarray  # int32[total_slots]
    buckets: tuple  # ((K, start_slot, n_rows), ...) static
    inv_pos: jnp.ndarray  # int32[R]: global row -> position in bucket order


def build_row_sharded_parts(r1cs: R1CS, n_shards: int,
                            with_coeff_digits: bool = True):
    """Partition an R1CS along the CONSTRAINT axis into n_shards row
    ranges with a SHARED ELL bucket signature, so a single SPMD program
    (shard_map) can evaluate every shard.

    Returns (parts, meta): parts is a dict of numpy arrays stacked on a
    leading shard axis — cols/coeff_digits (per entry slot) and
    row_origin (bucket position → local row id) — meta carries the
    static bucket signature and padded sizes."""
    R = r1cs.num_constraints
    rs = -(-R // n_shards)  # rows per shard (last padded with empty rows)
    for name in ("a", "b", "c"):
        _assert_row_density(getattr(r1cs, name).rows, R, f"matrix {name}")

    table = list(r1cs.coeff_table)
    try:
        zero_id = table.index(0)
    except ValueError:
        zero_id = len(table)
        table.append(0)
    be = get_backend(r1cs.field)
    coeff_limbs = be.to_limbs(table)
    lo = coeff_limbs & np.uint32(0xFF)
    hi = (coeff_limbs >> 8) & np.uint32(0xFF)
    coeff_digits = np.stack([lo, hi], axis=-1).reshape(len(table), 32)  # [K,32]

    # Per (shard, matrix): row nnz and sorted entries.
    shards = []
    for d in range(n_shards):
        lo_r, hi_r = d * rs, min((d + 1) * rs, R)
        shard = {}
        for name in ("a", "b", "c"):
            m = getattr(r1cs, name)
            sel = (m.rows >= lo_r) & (m.rows < hi_r)
            rows_l = m.rows[sel] - lo_r
            order = np.argsort(rows_l, kind="stable")
            nnz = np.bincount(rows_l, minlength=rs).astype(np.int64)
            K = np.maximum(
                1, 2 ** np.ceil(np.log2(np.maximum(nnz, 1))).astype(np.int64)
            )
            shard[name] = (
                rows_l[order],
                m.cols[sel][order],
                m.coeff_ids[sel][order],
                nnz,
                K,
            )
        shards.append(shard)

    # Shared signature: rows bucketed by the (Ka, Kb, Kc) triple; the
    # per-triple row count is padded to the max across shards. Triples
    # pack into one int64 key (K ≤ 2^20 always: nnz/row < 2^20) so bucket
    # assignment is a vectorized searchsorted.
    keys = []
    for shard in shards:
        ka, kb, kc = (shard[n][4] for n in ("a", "b", "c"))
        keys.append((ka << 40) | (kb << 20) | kc)
    uniq_keys = np.unique(np.concatenate(keys))
    uniq = np.stack(
        [(uniq_keys >> 40) & 0xFFFFF, (uniq_keys >> 20) & 0xFFFFF, uniq_keys & 0xFFFFF],
        axis=1,
    )
    counts = np.zeros((n_shards, len(uniq)), np.int64)
    assign = []
    for d, k in enumerate(keys):
        idx = np.searchsorted(uniq_keys, k)
        assign.append(idx)
        counts[d] = np.bincount(idx, minlength=len(uniq))
    max_counts = counts.max(axis=0)  # rows per bucket, shared

    rs_padded = int(max_counts.sum())
    # Static bucket table per matrix: (K, start_slot, n_rows).
    buckets = {n: [] for n in "abc"}
    slot_off = {n: 0 for n in "abc"}
    for bi, trip in enumerate(uniq):
        for mi, n in enumerate("abc"):
            buckets[n].append((int(trip[mi]), slot_off[n], int(max_counts[bi])))
            slot_off[n] += int(trip[mi]) * int(max_counts[bi])
    totals = {n: slot_off[n] for n in "abc"}

    # The per-slot coefficient-digit planes (cd) cost 128 B/slot — only
    # the bits fast path reads them; the limbs path gathers from the
    # (tiny) coefficient table via cids instead.
    parts = {
        n: {
            "cols": np.zeros((n_shards, totals[n]), np.int32),
            "cids": np.full((n_shards, totals[n]), zero_id, np.int32),
            **(
                {"cd": np.zeros((n_shards, totals[n], 32), np.uint32)}
                if with_coeff_digits
                else {}
            ),
        }
        for n in "abc"
    }
    # bucket position -> local row id (for mapping violations back).
    row_origin = np.full((n_shards, rs_padded), -1, np.int32)

    row_base = np.concatenate([[0], np.cumsum(max_counts)[:-1]])
    for d, shard in enumerate(shards):
        idx = assign[d]
        n_rows_local = len(idx)
        # Order rows by (bucket, local id); position within bucket is the
        # running index minus the bucket's start in that ordering.
        order = np.lexsort((np.arange(n_rows_local), idx))
        cnt_d = np.bincount(idx, minlength=len(uniq))
        starts_sorted = np.concatenate([[0], np.cumsum(cnt_d)[:-1]])
        pos_sorted = np.arange(n_rows_local) - np.repeat(starts_sorted, cnt_d)
        pos_in_bucket = np.empty(n_rows_local, np.int64)
        pos_in_bucket[order] = pos_sorted
        row_origin[d, row_base[idx[order]] + pos_sorted] = order
        for mi, n in enumerate("abc"):
            rows_s, cols_s, cids_s, nnz, K = shard[n]
            if len(rows_s) == 0:
                continue
            ptr = np.zeros(rs + 1, np.int64)
            np.cumsum(nnz, out=ptr[1:])
            bucket_k = np.array([b[0] for b in buckets[n]], np.int64)
            bucket_start = np.array([b[1] for b in buckets[n]], np.int64)
            # Per-row start slot, then per-entry target slot.
            row_slot0 = bucket_start[idx] + pos_in_bucket * bucket_k[idx]
            within = np.arange(len(rows_s)) - ptr[rows_s]
            target = row_slot0[rows_s] + within
            parts[n]["cols"][d, target] = cols_s
            if with_coeff_digits:
                parts[n]["cd"][d, target] = coeff_digits[cids_s]
            parts[n]["cids"][d, target] = cids_s
    meta = {
        "buckets": {n: tuple(buckets[n]) for n in "abc"},
        "rows_per_shard": rs,
        "rows_padded": rs_padded,
        "row_origin": row_origin,
        "coeff_table": table,
        "zero_id": zero_id,
    }
    return parts, meta


class Satisfier:
    """Compiled satisfiability checker for one R1CS.

    Two execution paths:
      * jnp (batch-major) — runs anywhere, used on CPU;
      * Pallas (limb-major VMEM kernels) — the TPU production path,
        selected automatically on TPU backends.

    The jitted core returns (all_ok, first_bad_row); `which_is_unsatisfied`
    maps the row back to the constraint path on the host, mirroring
    TestConstraintSystem::which_is_unsatisfied (test_cs.rs:239-253)."""

    def __init__(self, r1cs: R1CS, use_pallas: bool | None = None,
                 config=None):
        if config is not None and use_pallas is None:
            use_pallas = config.use_pallas
        self.r1cs = r1cs
        self.backend = get_backend(r1cs.field)
        if use_pallas is None:
            use_pallas = jax.default_backend() == "tpu"
        self.use_pallas = use_pallas

        if r1cs.num_constraints == 0:
            # Vacuously satisfied; the dense pipelines cannot produce
            # empty masks (argmax/concatenate on zero-length arrays).
            self._check = lambda z: (jnp.asarray(False), jnp.asarray(0))
            return

        if use_pallas:
            # Route through the shared-perm templated machinery with a
            # trivial batch of one "instance" covering the whole system.
            violations = build_templated_check(
                r1cs, 1, use_pallas=True, witness_form="limbs"
            )

            @jax.jit
            def check(z):
                bad = violations(z[None])
                return jnp.any(bad), jnp.argmax(bad)

            self._check = check
        else:
            self.device = DeviceR1CS.from_r1cs(r1cs)
            be = self.backend

            @jax.jit
            def check(z, d):
                bad = violation_mask(be, d, z)
                any_bad = jnp.any(bad)
                first = jnp.argmax(bad)  # 0 when none; gated by any_bad
                return any_bad, first

            # The R1CS rides as an ARGUMENT (device buffers), not a
            # closure (HLO literals) — see DeviceR1CS docstring.
            self._check = lambda z: check(z, self.device)

    def z_from_assignments(self, inputs, aux) -> jnp.ndarray:
        return assemble_z(self.backend, inputs, aux)

    def is_satisfied(self, z: jnp.ndarray) -> bool:
        any_bad, _ = self._check(z)
        return not bool(any_bad)

    def which_is_unsatisfied(self, z: jnp.ndarray) -> Optional[str]:
        any_bad, first = self._check(z)
        if not bool(any_bad):
            return None
        row = int(first)
        if self.r1cs.names is not None:
            return self.r1cs.names[row]
        return f"constraint #{row}"


class _PallasAdapter:
    """Batch-major facade over the limb-major Pallas kernels."""

    def __init__(self, field):
        from .field_pallas import TILE, get_pallas_ops

        self.ops = get_pallas_ops(field)
        self.tile = TILE

    def mul_to_digits(self, a_bm, b_bm):
        n = a_bm.shape[0]
        tp = -(-n // self.tile) * self.tile
        a = self.ops.to_limb_major(a_bm, tp)
        b = self.ops.to_limb_major(b_bm, tp)
        return self.ops.mul_digits(a, b)[:, :n].T  # [n, 32]

    def reduce_digits(self, d_bm):
        n = d_bm.shape[0]
        tp = -(-n // self.tile) * self.tile
        d = d_bm.T
        if tp != n:
            d = jnp.pad(d, ((0, 0), (0, tp - n)))
        return self.ops.reduce_digits(d)[:, :n].T  # [n, 16]

    def mul(self, a_bm, b_bm):
        n = a_bm.shape[0]
        tp = -(-n // self.tile) * self.tile
        a = self.ops.to_limb_major(a_bm, tp)
        b = self.ops.to_limb_major(b_bm, tp)
        return self.ops.mul(a, b)[:, :n].T

    # limb-major variants (no boundary transposes)
    def reduce_digits_lm(self, d_lm):
        n = d_lm.shape[1]
        tp = -(-n // self.tile) * self.tile
        if tp != n:
            d_lm = jnp.pad(d_lm, ((0, 0), (0, tp - n)))
        return self.ops.reduce_digits(d_lm)[:, :n]

    def mul_lm(self, a_lm, b_lm):
        n = a_lm.shape[1]
        tp = -(-n // self.tile) * self.tile
        if tp != n:
            a_lm = jnp.pad(a_lm, ((0, 0), (0, tp - n)))
            b_lm = jnp.pad(b_lm, ((0, 0), (0, tp - n)))
        return self.ops.mul(a_lm, b_lm)[:, :n]


class _JnpAdapter:
    """Same facade over the pure-jnp backend (CPU / virtual meshes)."""

    def __init__(self, field):
        self.be = get_backend(field)

    def mul_to_digits(self, a_bm, b_bm):
        return self.be._split8(self.be.mul(a_bm, b_bm))

    def reduce_digits(self, d_bm):
        return self.be._reduce_wide8(d_bm)

    def mul(self, a_bm, b_bm):
        return self.be.mul(a_bm, b_bm)

    def reduce_digits_lm(self, d_lm):
        return self.be._reduce_wide8(d_lm.T).T

    def mul_lm(self, a_lm, b_lm):
        return self.be.mul(a_lm.T, b_lm.T).T


def _build_shared_ell(template: R1CS, zero_id: int):
    """ELL layouts for A, B, C with ONE shared row permutation (rows sorted
    by the (K_a, K_b, K_c) bucket-width triple), every segment padded to a
    multiple of 8 rows (Mosaic block alignment for the fused kernels).
    All three matvecs produce rows in the same padded bucket order.

    Returns (layouts, pos_of_row, padded_rows): pos_of_row[r] is the
    padded-bucket-order position of original row r."""
    R = template.num_constraints
    if R == 0:
        empty = EllMatrix(
            cols=np.zeros(0, np.int32),
            coeff_ids=np.zeros(0, np.int32),
            buckets=(),
            inv_pos=np.empty(0, np.int32),
        )
        return (
            {n: empty for n in ("a", "b", "c")},
            np.empty(0, np.int32),
            0,
        )
    Ks = {}
    per = {}
    for name in ("a", "b", "c"):
        m = getattr(template, name)
        _assert_row_density(m.rows, R, f"matrix {name}")
        order = np.argsort(m.rows, kind="stable")
        nnz = np.bincount(m.rows, minlength=R).astype(np.int64)
        ptr = np.zeros(R + 1, np.int64)
        np.cumsum(nnz, out=ptr[1:])
        K = np.maximum(1, 2 ** np.ceil(np.log2(np.maximum(nnz, 1))).astype(np.int64))
        Ks[name] = K
        per[name] = (m.cols[order], m.coeff_ids[order], nnz, ptr)

    perm = np.lexsort((np.arange(R), Ks["c"], Ks["b"], Ks["a"]))
    key = np.stack([Ks[n][perm] for n in ("a", "b", "c")], axis=1)
    change = np.any(key[1:] != key[:-1], axis=1)
    seg_starts = (
        np.concatenate([[0], np.nonzero(change)[0] + 1]) if R else np.array([0])
    )
    seg_ends = np.concatenate([seg_starts[1:], [R]])
    seg_counts = seg_ends - seg_starts
    seg_padded = -(-seg_counts // 8) * 8
    seg_base = np.zeros(len(seg_starts) + 1, np.int64)
    np.cumsum(seg_padded, out=seg_base[1:])
    padded_rows = int(seg_base[-1])

    # Padded position of each original row.
    seg_of = np.repeat(np.arange(len(seg_starts)), seg_counts)
    off_in_seg = np.arange(R) - seg_starts[seg_of]
    pos_perm = seg_base[seg_of] + off_in_seg  # position of perm[j]
    pos_of_row = np.empty(R, np.int64)
    pos_of_row[perm] = pos_perm

    layouts = {}
    for name in ("a", "b", "c"):
        cols_s, cids_s, nnz, ptr = per[name]
        Kp = Ks[name][perm]
        nnz_p = nnz[perm]
        seg_K = Kp[seg_starts] if R else np.array([], np.int64)
        # Slot base per segment (padded rows included).
        seg_slots = seg_padded * seg_K
        slot_base = np.zeros(len(seg_starts) + 1, np.int64)
        np.cumsum(seg_slots, out=slot_base[1:])
        total = int(slot_base[-1])
        cols_arr = np.zeros(total, np.int32)
        cids_arr = np.full(total, zero_id, np.int32)
        # Per original (permuted) row: its slot range.
        row_slot0 = slot_base[seg_of] + off_in_seg * seg_K[seg_of]
        # Per entry placement.
        if len(cols_s):
            e_rows = np.repeat(np.arange(R), nnz_p)  # perm-order row per entry
            within = np.arange(len(cols_s)) - np.repeat(
                np.cumsum(np.concatenate([[0], nnz_p[:-1]])), nnz_p
            )
            src = ptr[perm[e_rows]] + within
            target = row_slot0[e_rows] + within
            cols_arr[target] = cols_s[src]
            cids_arr[target] = cids_s[src]
        buckets = []
        for si in range(len(seg_starts)):
            k = int(seg_K[si])
            n_rows = int(seg_padded[si])
            if buckets and buckets[-1][0] == k:
                pk, poff, pn = buckets[-1]
                buckets[-1] = (pk, poff, pn + n_rows)
            else:
                buckets.append((k, int(slot_base[si]), n_rows))
        layouts[name] = EllMatrix(
            cols=cols_arr,
            coeff_ids=cids_arr,
            buckets=tuple(buckets),
            inv_pos=np.empty(0, np.int32),  # unused (shared perm)
        )
    return layouts, pos_of_row.astype(np.int32), padded_rows


# Small-row fast path for the bits witness form: with z values in {0, 1}
# (the bits contract), a row whose SIGNED coefficient magnitudes satisfy
# (Σ|a_i|)·(Σ|b_i|) < 2^31 and Σ|c_i| < 2^31 can be checked EXACTLY over
# the integers in int32 — no value can reach the modulus, so a·b = c over
# ℤ iff over 𝔽_p. One i32 multiply per row-instance replaces a 17-limb
# modmul-compare (~289 VPU multiplies). In sha256/blake2s templates 99.9%
# of rows qualify (booleanity, xor, ch, maj); only the capacity-packed
# MultiEq rows need the full kernel. This is the TPU shape of the
# reference's coeff==1 skip-mul optimization (lc.rs:245-267).
_SMALL_ROW_BOUND = 1 << 31


def _classify_small_rows(template: R1CS):
    """(small_idx, big_idx, layouts) for the bits-form row partition, or
    None when fewer than half the rows qualify (not worth two pipelines).
    layouts[name] = (cols [n_small, K], signed_coeffs [n_small, K])."""
    p = template.field.p
    R = template.num_constraints
    sv = []
    for c in template.coeff_table:
        v = int(c) % p
        sv.append(v if v <= p // 2 else v - p)
    # |sv| clipped to 2^40 — only the < 2^31 comparison matters, and the
    # clip keeps int64 row sums overflow-free for any row density.
    absw = np.asarray([min(abs(s), 1 << 40) for s in sv], np.int64)
    bound = {}
    for name in ("a", "b", "c"):
        m = getattr(template, name)
        b = np.zeros(R, np.int64)
        np.add.at(b, np.asarray(m.rows), absw[np.asarray(m.coeff_ids)])
        bound[name] = b
    small = (
        bound["a"].astype(np.float64) * bound["b"].astype(np.float64)
        < _SMALL_ROW_BOUND
    ) & (bound["c"] < _SMALL_ROW_BOUND)
    n_small = int(small.sum())
    if n_small <= R // 2:
        return None
    small_idx = np.nonzero(small)[0].astype(np.int32)
    big_idx = np.nonzero(~small)[0].astype(np.int32)
    small_pos = np.full(R, -1, np.int64)
    small_pos[small_idx] = np.arange(n_small)
    sv32 = np.asarray([int(s) if abs(s) < (1 << 31) else 0 for s in sv],
                      np.int32)
    layouts = {}
    for name in ("a", "b", "c"):
        m = getattr(template, name)
        rows = np.asarray(m.rows)
        sel = small[rows]
        r_s = small_pos[rows[sel]]
        c_s = np.asarray(m.cols)[sel]
        s_s = sv32[np.asarray(m.coeff_ids)[sel]]
        deg = np.bincount(r_s, minlength=n_small)
        K = max(int(deg.max()) if n_small else 0, 1)
        order = np.lexsort((np.arange(len(r_s)), r_s))
        slot = np.arange(len(r_s)) - np.repeat(
            np.concatenate(([0], np.cumsum(deg)[:-1])), deg
        )
        colp = np.zeros((n_small, K), np.int32)
        scop = np.zeros((n_small, K), np.int32)
        colp[r_s[order], slot] = c_s[order]
        scop[r_s[order], slot] = s_s[order]
        layouts[name] = (colp, scop)
    return small_idx, big_idx, layouts


def _sub_rows_r1cs(template: R1CS, keep_idx: np.ndarray) -> R1CS:
    """The sub-system containing only rows `keep_idx` (renumbered)."""
    from ..r1cs import COOMatrix

    R = template.num_constraints
    pos = np.full(R, -1, np.int64)
    pos[keep_idx] = np.arange(len(keep_idx))

    def f(m):
        rows = np.asarray(m.rows)
        sel = pos[rows] >= 0
        return COOMatrix(
            rows=pos[rows[sel]].astype(np.int64),
            cols=np.asarray(m.cols)[sel],
            coeff_ids=np.asarray(m.coeff_ids)[sel],
        )

    return R1CS(
        field=template.field,
        num_inputs=template.num_inputs,
        num_aux=template.num_aux,
        num_constraints=len(keep_idx),
        a=f(template.a),
        b=f(template.b),
        c=f(template.c),
        coeff_table=list(template.coeff_table),
        names=None,
    )


# Trivial-row fast path for the LIMBS witness form. Contract (the limb
# encoding of the reference's type-level guarantee — Rust `ff` field
# elements are always canonical): each z limb vector encodes a canonical
# value (< p) and slot 0 holds ONE == 1 (TemplatedSatisfier docstring).
# Under this contract:
#   * a booleanity row (1-x)·x = 0 (boolean.rs:90-96) holds iff
#     z[x] ∈ {0, 1} — 𝔽_p is an integral domain — so the row is a limb
#     compare instead of a 17-limb modmul;
#   * a row whose three LCs each carry ≤ 2 variable terms with
#     coefficients in {1, p−1} (plus any constant, via ONE) feeds the
#     fused mul-compare kernel directly: operands assemble by row gather
#     + borrow-free negation + one carry pass — no digit relayout, no
#     fold matvec. The limbs-form shape of the reference's coeff==1
#     skip-mul (lc.rs:245-267).
# Gadget circuits (AllocatedNum mul/add/square, booleanity, select) are
# dominated by such rows; only genuinely wide rows (pack/MultiEq) keep
# the fold-matvec pipeline.
def _classify_trivial_limb_rows(template: R1CS):
    """(bit_rows, triv_rows, fold_idx) or None when fewer than half the
    rows qualify. bit_rows: [(row, col)]; triv_rows: [(row, spec_a,
    spec_b, spec_c)] with spec = (const, [(col, neg)] of ≤ 2 terms)."""
    p = template.field.p
    R = template.num_constraints
    table = [int(c) % p for c in template.coeff_table]
    terms = {}
    for name in ("a", "b", "c"):
        m = getattr(template, name)
        rows = np.asarray(m.rows)
        cols = np.asarray(m.cols)
        cids = np.asarray(m.coeff_ids)
        lst = [[] for _ in range(R)]
        for e in np.argsort(rows, kind="stable"):
            lst[rows[e]].append((table[cids[e]], int(cols[e])))
        terms[name] = lst

    def triv(ts):
        const = 0
        vars_ = []
        for coeff, col in ts:
            if col == 0:
                const = (const + coeff) % p
            elif coeff == 1:
                vars_.append((col, 0))
            elif coeff == p - 1:
                vars_.append((col, 1))
            else:
                return None
        if len(vars_) > 2:
            return None
        return (const, vars_)

    bit_rows = []
    triv_rows = []
    fold_rows = []
    for r in range(R):
        sa = triv(terms["a"][r])
        sb = triv(terms["b"][r]) if sa is not None else None
        sc = triv(terms["c"][r]) if sb is not None else None
        if sc is None:
            fold_rows.append(r)
            continue
        if (
            sa[0] == 1
            and len(sa[1]) == 1
            and sa[1][0][1] == 1
            and sb == (0, [(sa[1][0][0], 0)])
            and sc == (0, [])
        ):
            bit_rows.append((r, sa[1][0][0]))
            continue
        triv_rows.append((r, sa, sb, sc))
    if len(fold_rows) > R // 2:
        return None
    return bit_rows, triv_rows, np.asarray(fold_rows, np.int32)


def _build_trivial_limbs_check(
    template: R1CS, batch: int, use_pallas: bool, bit_rows, triv_rows, fold_idx
):
    """Split limbs-form check: bit rows by limb compare, trivial rows by
    direct operand assembly into the fused mul-compare (or the jnp modmul
    off-TPU), remaining rows through the fold-matvec sub-template."""
    field = template.field
    p = field.p
    R = template.num_constraints
    be = get_backend(field)
    nb, nt, nf = len(bit_rows), len(triv_rows), len(fold_idx)

    p17 = [(p >> (16 * i)) & 0xFFFF for i in range(17)]

    bit_idx = np.asarray([r for r, _c in bit_rows], np.int32)
    bit_cols = jax.device_put(np.asarray([c for _r, c in bit_rows], np.int32))
    triv_idx = np.asarray([r for r, *_ in triv_rows], np.int32)

    # Per-operand static spec arrays.
    spec = {}
    for oi, name in enumerate(("a", "b", "c")):
        const = np.zeros((nt, 17), np.uint32)
        cols = np.zeros((nt, 2), np.int32)
        on = np.zeros((nt, 2), np.uint32)
        neg = np.zeros((nt, 2), np.uint32)
        for w, (_r, *specs) in enumerate(triv_rows):
            cv, vars_ = specs[oi]
            for i in range(17):
                const[w, i] = (cv >> (16 * i)) & 0xFFFF
            for t, (col, ng) in enumerate(vars_):
                cols[w, t] = col
                on[w, t] = 1
                neg[w, t] = ng
        max_terms = int(on.sum(axis=0).astype(bool).sum()) if nt else 0
        spec[name] = {
            "const": jax.device_put(const),
            "cols": jax.device_put(cols),
            "on": jax.device_put(on),
            "neg": jax.device_put(neg),
            "max_terms": max_terms,
        }

    fold_viol = (
        build_templated_check(
            _sub_rows_r1cs(template, fold_idx),
            batch,
            use_pallas,
            "limbs",
            _partition=False,
        )
        if nf
        else None
    )

    inv = np.empty(R, np.int32)
    inv[np.concatenate([bit_idx, triv_idx, fold_idx])] = np.arange(
        R, dtype=np.int32
    )
    inv_d = jax.device_put(inv)

    mulcmp = None
    if use_pallas and field.NUM_BITS >= 250 and nt:
        from .field_pallas import TILE, make_mulcmp

        mulcmp = make_mulcmp(field)

    def _neg17(x):
        """p − x for canonical x (maps 0 → p; fine: semi < p·2^11)."""
        outs = []
        borrow = None
        for i in range(17):
            d = jnp.uint32(p17[i]) - x[..., i]
            if borrow is not None:
                d = d - borrow
            borrow = d >> 31
            outs.append(d & 0xFFFF)
        return jnp.stack(outs, axis=-1)

    def _carry17(x):
        """Renormalize limbs (< 3·2^16 each; value < 3p) to 16-bit limbs."""
        outs = []
        carry = None
        for i in range(17):
            tot = x[..., i] if carry is None else x[..., i] + carry
            outs.append(tot & 0xFFFF)
            carry = tot >> 16
        return jnp.stack(outs, axis=-1)

    def _cond_sub_p17(x):
        outs = []
        borrow = None
        for i in range(17):
            d = x[..., i] - jnp.uint32(p17[i])
            if borrow is not None:
                d = d - borrow
            borrow = d >> 31
            outs.append(d & 0xFFFF)
        diff = jnp.stack(outs, axis=-1)
        return jnp.where((borrow == 0)[..., None], diff, x)

    def _assemble(name, zt, B):
        """[nt, B, 17] semi-reduced operand limbs (< 3p, 16-bit limbs)."""
        s = spec[name]
        acc = jnp.broadcast_to(s["const"][:, None, :], (nt, B, 17)).astype(
            jnp.uint32
        )
        for t in range(s["max_terms"]):
            x16 = zt[s["cols"][:, t]]  # [nt, B, 16] row gather
            x = jnp.concatenate(
                [x16, jnp.zeros(x16.shape[:-1] + (1,), jnp.uint32)], axis=-1
            )
            term = jnp.where(s["neg"][:, t, None, None] == 1, _neg17(x), x)
            acc = acc + jnp.where(
                s["on"][:, t, None, None] == 1, term, jnp.uint32(0)
            )
        return _carry17(acc)

    def violations(z3):
        B = z3.shape[0]
        zt = jnp.transpose(z3, (1, 0, 2))  # [S_t, B, 16]
        parts = []
        if nb:
            xb = zt[bit_cols]  # [nb, B, 16]
            hi_zero = jnp.all(xb[..., 1:] == 0, axis=-1)
            bad_bit = ~(hi_zero & (xb[..., 0] <= 1))
            parts.append(bad_bit.T)  # [B, nb]
        if nt:
            a_s = _assemble("a", zt, B)
            b_s = _assemble("b", zt, B)
            c_s = _assemble("c", zt, B)
            if mulcmp is not None:
                n = nt * B
                npad = -(-n // TILE) * TILE

                def lm(x):
                    flat = x.transpose(2, 0, 1).reshape(17, n)
                    if npad != n:
                        flat = jnp.pad(flat, ((0, 0), (0, npad - n)))
                    return flat

                bad_t = (mulcmp(lm(a_s), lm(b_s), lm(c_s))[:n] != 0).reshape(
                    nt, B
                )
            else:
                def canon(x):
                    return _cond_sub_p17(_cond_sub_p17(x))[..., :16]

                lhs = be.mul(canon(a_s), canon(b_s))
                bad_t = jnp.any(lhs != canon(c_s), axis=-1)
            parts.append(bad_t.T)  # [B, nt]
        if fold_viol is not None:
            parts.append(fold_viol(z3).reshape(B, nf))
        comb = jnp.concatenate(parts, axis=1) if len(parts) > 1 else parts[0]
        return jnp.take(comb, inv_d, axis=1).reshape(B * R)

    return violations


# ---------------------------------------------------------------------------
# MIXED witness form: u32-domain slots in a [B, S_t] uint32 buffer, field
# slots in a [B, F, 16] limb sidecar — exactly what WitnessProgram.build()
# produces. The limbs form forces EVERY slot into 64-byte limb rows (plus a
# [S_t, B, 16] transpose and, for any fold row, a [S_t, 32, B] digit
# relayout); measured on config 1 those relayouts cost 5-10× the actual
# mul-compare kernel time. Mixed keeps bit/u32 slots at 4 bytes, so:
#   * booleanity rows are one u32 compare (vals[:, x] <= 1);
#   * linear rows (B side = ONE — AllocatedNum.add, num.rs:279-309) skip
#     the 17-limb mul entirely: a − c + 4p must be a small multiple of p,
#     verified by a single-limb Montgomery zero-test;
#   * trivial product rows (mul/square/select/nonzero, num.rs:311-403)
#     assemble ≤2-term operands from either buffer and ride the fused
#     mul-compare kernel;
#   * power-of-two integer rows (pack_into_inputs / pack_bits
#     multipack.rs:12-38, MultiEq flushes multieq.rs:25-58) evaluate as
#     exact integer window sums of the u32 operands, compared to the
#     field side by a multi-limb Montgomery zero-test — no field
#     arithmetic at all;
#   * anything else falls back to the limbs pipeline on a sub-template
#     remapped to its USED slots only.
#
# Domain contract (mirrors the limbs form): field rows canonical (< p),
# u32 slots any value < 2^32. All checks are exact field semantics over
# that domain.
# ---------------------------------------------------------------------------
U32_SRC = 0
FIELD_SRC = 1


def _classify_mixed_rows(template: R1CS, field_slots):
    """Partition rows for the mixed check. Returns a dict:
      bool_u32: [(row, col)] booleanity rows on u32 slots
      lin:      [(row, spec_a, spec_c)] rows with B = ONE, both sides
                ≤2-term trivial — spec = (const, [(src, idx, neg)])
      mul:      [(row, spec_a, spec_b, spec_c)] trivial product rows
      pow2:     [(row, side_a, side_c)] — side = (const,
                [("u32", col, exp)], [(fs_idx, neg)]) integer rows
      rest:     [row] fallback rows
    """
    p = template.field.p
    R = template.num_constraints
    fs_row = {int(s): i for i, s in enumerate(field_slots)}
    table = [int(c) % p for c in template.coeff_table]
    terms = {}
    for name in ("a", "b", "c"):
        m = getattr(template, name)
        rows = np.asarray(m.rows)
        cols = np.asarray(m.cols)
        cids = np.asarray(m.coeff_ids)
        lst = [dict() for _ in range(R)]
        for e in np.argsort(rows, kind="stable"):
            r = int(rows[e])
            c = int(cols[e])
            v = (lst[r].get(c, 0) + table[cids[e]]) % p
            if v:
                lst[r][c] = v
            elif c in lst[r]:
                del lst[r][c]
        terms[name] = lst

    def triv(d):
        const = d.get(0, 0)
        vars_ = []
        for col, cf in d.items():
            if col == 0:
                continue
            if cf == 1:
                vars_.append((col, 0))
            elif cf == p - 1:
                vars_.append((col, 1))
            else:
                return None
        if len(vars_) > 2:
            return None
        src_vars = [
            (
                (FIELD_SRC, fs_row[col], ng)
                if col in fs_row
                else (U32_SRC, col, ng)
            )
            for col, ng in vars_
        ]
        return (const, src_vars)

    def pow2_side(d):
        """(const, u32_terms [(col, exp)], field_terms [(fs_idx, neg)])
        or None. u32 slots need positive power-of-two coefficients (the
        multipack/MultiEq shape); field slots coeff ±1."""
        const = 0
        u32_terms = []
        f_terms = []
        for col, cf in d.items():
            if col == 0:
                const = cf
            elif col in fs_row:
                if cf == 1:
                    f_terms.append((fs_row[col], 0))
                elif cf == p - 1:
                    f_terms.append((fs_row[col], 1))
                else:
                    return None
            else:
                if cf & (cf - 1):
                    return None  # not a power of two
                e = cf.bit_length() - 1
                if e > 256:
                    return None
                u32_terms.append((col, e))
        return (const, u32_terms, f_terms)

    out = {"bool_u32": [], "lin": [], "mul": [], "pow2": [], "rest": []}
    for r in range(R):
        A, B, C = terms["a"][r], terms["b"][r], terms["c"][r]
        sa, sb, sc = triv(A), triv(B), triv(C)
        if sa is not None and sb is not None and sc is not None:
            if (
                sc == (0, [])
                and sa[0] == 1
                and len(sa[1]) == 1
                and sa[1][0][2] == 1
                and sa[1][0][0] == U32_SRC
                and sb == (0, [(U32_SRC, sa[1][0][1], 0)])
            ):
                out["bool_u32"].append((r, sa[1][0][1]))
            elif sb == (1, []):
                out["lin"].append((r, sa, sc))
            else:
                out["mul"].append((r, sa, sb, sc))
            continue
        if B == {0: 1}:
            pa = pow2_side(A)
            pc = pow2_side(C)
            if pa is not None and pc is not None:
                # window-accumulation exactness: ≤ 64 overlapping
                # contributions per 16-bit window per side (u32 window
                # sums stay < 2^22)
                ok = True
                for side in (pa, pc):
                    cnt = defaultdict(int)
                    for _col, e in side[1]:
                        for w in range(e // 16, e // 16 + 3):
                            cnt[w] += 1
                    if cnt and max(cnt.values()) > 64:
                        ok = False
                if ok:
                    out["pow2"].append((r, pa, pc))
                    continue
        out["rest"].append(r)
    return out


def _build_mixed_check(template: R1CS, batch: int, use_pallas: bool,
                       field_slots):
    """violations(vals u32[B, S_t], flimbs u32[B, F, 16]) → bool[B·R]
    in original row order (instances major). field_slots[i] = the slot
    whose field value lives in flimbs[:, i]."""
    field = template.field
    p = field.p
    R = template.num_constraints
    be = get_backend(field)
    F = max(len(field_slots), 1)
    cls = _classify_mixed_rows(template, field_slots)
    n_bool = len(cls["bool_u32"])
    n_lin = len(cls["lin"])
    n_mul = len(cls["mul"])
    n_pow2 = len(cls["pow2"])
    rest_rows = np.asarray(cls["rest"], np.int64)
    n_rest = len(rest_rows)

    p17 = [(p >> (16 * i)) & 0xFFFF for i in range(17)]
    p4_17 = [((p << 2) >> (16 * i)) & 0xFFFF for i in range(17)]
    off_lin = [((p << 3) >> (16 * i)) & 0xFFFF for i in range(17)]
    p0inv = pow(p, -1, 1 << 16) & 0xFFFF

    bool_cols = jax.device_put(
        np.asarray([c for _r, c in cls["bool_u32"]], np.int32)
    )

    def _operand_spec(rows_specs, oi):
        """Static arrays for operand oi of a list of (row, *specs):
        const limbs + up to 2 field-source terms + up to 2 u32 terms."""
        n = len(rows_specs)
        const = np.zeros((n, 17), np.uint32)
        f_idx = np.zeros((n, 2), np.int32)
        f_on = np.zeros((n, 2), np.uint32)
        f_neg = np.zeros((n, 2), np.uint32)
        u_col = np.zeros((n, 2), np.int32)
        u_on = np.zeros((n, 2), np.uint32)
        u_neg = np.zeros((n, 2), np.uint32)
        for w, (_r, *specs) in enumerate(rows_specs):
            cv, vars_ = specs[oi]
            for i in range(17):
                const[w, i] = (cv >> (16 * i)) & 0xFFFF
            nf = nu = 0
            for src, idx, ng in vars_:
                if src == FIELD_SRC:
                    f_idx[w, nf] = idx
                    f_on[w, nf] = 1
                    f_neg[w, nf] = ng
                    nf += 1
                else:
                    u_col[w, nu] = idx
                    u_on[w, nu] = 1
                    u_neg[w, nu] = ng
                    nu += 1
        max_f = int(f_on.sum(axis=0).astype(bool).sum()) if n else 0
        max_u = int(u_on.sum(axis=0).astype(bool).sum()) if n else 0
        any_const = bool(const.any())
        fast_single_field = bool(
            n
            and max_f == 1
            and max_u == 0
            and not any_const
            and not f_neg.any()
            and f_on[:, 0].all()
        )
        return {
            "fast_single_field": fast_single_field,
            "const": jax.device_put(const),
            "any_const": any_const,
            "f_idx": jax.device_put(f_idx),
            "f_on": jax.device_put(f_on[:, :, None]),
            "f_neg": jax.device_put(f_neg[:, :, None]),
            "max_f": max_f,
            "u_col": jax.device_put(u_col),
            "u_on": jax.device_put(u_on[:, :, None]),
            "u_neg": jax.device_put(u_neg[:, :, None]),
            "max_u": max_u,
        }

    lin_spec = [_operand_spec(cls["lin"], oi) for oi in range(2)]
    mul_spec = [_operand_spec(cls["mul"], oi) for oi in range(3)]

    def _neg17_const(x, const_limbs):
        """const − x with borrow (x ≤ const value; 17-limb planes)."""
        outs = []
        borrow = None
        for i in range(17):
            d = jnp.uint32(const_limbs[i]) - x[..., i]
            if borrow is not None:
                d = d - borrow
            borrow = d >> 31
            outs.append(d & 0xFFFF)
        return jnp.stack(outs, axis=-1)

    def _carry17(x):
        outs = []
        carry = None
        for i in range(17):
            tot = x[..., i] if carry is None else x[..., i] + carry
            outs.append(tot & 0xFFFF)
            carry = tot >> 16
        return jnp.stack(outs, axis=-1)

    def _assemble(spec, vals, flimbs):
        """[B, n, 17] semi-reduced operand (< 4p; 16-bit limbs)."""
        n = spec["const"].shape[0]
        B = vals.shape[0]
        # Fast path: every row is ONE positive field term with no
        # constant (the shape of every mul/square operand in gadget
        # circuits, num.rs:311-373) — the gathered canonical limbs ARE
        # the assembled operand; the const broadcast + where-mask +
        # carry chain below would cost ~50 no-op passes over the
        # [B, n, 17] planes.
        if spec["fast_single_field"]:
            x16 = flimbs[:, spec["f_idx"][:, 0]]  # [B, n, 16]
            return jnp.concatenate(
                [x16, jnp.zeros(x16.shape[:-1] + (1,), jnp.uint32)],
                axis=-1,
            )
        acc = jnp.broadcast_to(
            spec["const"][None], (B, n, 17)
        ).astype(jnp.uint32)
        for t in range(spec["max_f"]):
            x16 = flimbs[:, spec["f_idx"][:, t]]  # [B, n, 16]
            x = jnp.concatenate(
                [x16, jnp.zeros(x16.shape[:-1] + (1,), jnp.uint32)],
                axis=-1,
            )
            term = jnp.where(
                spec["f_neg"][None, :, t] == 1, _neg17_const(x, p17), x
            )
            acc = acc + jnp.where(
                spec["f_on"][None, :, t] == 1, term, jnp.uint32(0)
            )
        for t in range(spec["max_u"]):
            v = vals[:, spec["u_col"][:, t]]  # [B, n]
            x = jnp.zeros(v.shape + (17,), jnp.uint32)
            x = x.at[..., 0].set(v & 0xFFFF)
            x = x.at[..., 1].set(v >> 16)
            term = jnp.where(
                spec["u_neg"][None, :, t] == 1, _neg17_const(x, p17), x
            )
            acc = acc + jnp.where(
                spec["u_on"][None, :, t] == 1, term, jnp.uint32(0)
            )
        return _carry17(acc)

    def _mont_zero_test(d, m_limbs, max_limbs, pinv_limbs):
        """d [..., L] (16-bit limbs, value a multiple of p iff the row
        holds, quotient < 2^(16·m_limbs)) → bad mask [...]. Computes
        m̂ = d·p^{-1} mod 2^(16·m_limbs) and checks d == m̂·p exactly —
        replaces the shift-subtract canonicalization chain."""
        # m̂ via lower-triangular limb multiply
        mh = []
        for i in range(m_limbs):
            acc = None
            for j in range(i + 1):
                t = d[..., j] * jnp.uint32(pinv_limbs[i - j])
                acc = t if acc is None else acc + t
            mh.append(acc)
        # carry-normalize m̂ to 16-bit limbs
        m16 = []
        carry = None
        for i in range(m_limbs):
            tot = mh[i] if carry is None else mh[i] + carry
            m16.append(tot & 0xFFFF)
            carry = tot >> 16
        # m̂·p over max_limbs, with lo/hi split accumulation
        pl16 = [(p >> (16 * i)) & 0xFFFF for i in range(max_limbs)]
        acc = [None] * (max_limbs + 1)
        for j in range(m_limbs):
            mj = m16[j]
            for i in range(max_limbs - j):
                c = pl16[i]
                if c == 0:
                    continue
                t = mj * jnp.uint32(c)
                k = i + j
                lo = t & 0xFFFF
                hi = t >> 16
                acc[k] = lo if acc[k] is None else acc[k] + lo
                acc[k + 1] = hi if acc[k + 1] is None else acc[k + 1] + hi
        bad = None
        carry = None
        for i in range(max_limbs):
            tot = acc[i] if acc[i] is not None else None
            if carry is not None:
                tot = carry if tot is None else tot + carry
            if tot is None:
                limb = jnp.zeros_like(d[..., 0])
                carry = None
            else:
                limb = tot & 0xFFFF
                carry = tot >> 16
            diff = limb != d[..., i]
            bad = diff if bad is None else bad | diff
        return bad

    def _lin_bad(vals, flimbs):
        """[B, n_lin] violation mask: a ≡ c (mod p) via d = a + 8p − c,
        quotient ≤ 11 → single-limb Montgomery test."""
        a = _assemble(lin_spec[0], vals, flimbs)  # < 4p
        c = _assemble(lin_spec[1], vals, flimbs)
        d = _carry17(a + _neg17_const(c, off_lin))  # a + (8p − c) < 12p
        return _mont_zero_test(d, 1, 17, [p0inv])

    mulcmp = None
    if use_pallas and field.NUM_BITS >= 250 and n_mul:
        from .field_pallas import TILE, make_mulcmp

        mulcmp = make_mulcmp(field)

    def _cond_sub(x, shift):
        ps = [((p << shift) >> (16 * i)) & 0xFFFF for i in range(17)]
        outs = []
        borrow = None
        for i in range(17):
            d = x[..., i] - jnp.uint32(ps[i])
            if borrow is not None:
                d = d - borrow
            borrow = d >> 31
            outs.append(d & 0xFFFF)
        diff = jnp.stack(outs, axis=-1)
        return jnp.where((borrow == 0)[..., None], diff, x)

    def _mul_bad(vals, flimbs):
        """[B, n_mul] violation mask via the fused mul-compare kernel
        (or canonicalize + jnp modmul off-TPU)."""
        a = _assemble(mul_spec[0], vals, flimbs)
        b = _assemble(mul_spec[1], vals, flimbs)
        c = _assemble(mul_spec[2], vals, flimbs)
        B = vals.shape[0]
        if mulcmp is not None:
            n = n_mul * B
            npad = -(-n // TILE) * TILE

            def lm(x):
                flat = jnp.transpose(x, (2, 0, 1)).reshape(17, n)
                if npad != n:
                    flat = jnp.pad(flat, ((0, 0), (0, npad - n)))
                return flat

            return (mulcmp(lm(a), lm(b), lm(c))[:n] != 0).reshape(B, n_mul)

        def canon(x):  # semi < 4p → canonical
            x = _cond_sub(x, 1)
            x = _cond_sub(x, 0)
            x = _cond_sub(x, 0)
            return x[..., :16]

        lhs = be.mul(canon(a), canon(b))
        return jnp.any(lhs != canon(c), axis=-1)

    # --- pow2 integer rows ------------------------------------------------
    pow2_rows = np.asarray([r for r, *_ in cls["pow2"]], np.int64)
    if n_pow2:
        # windows: enough for max coefficient·2^32 + headroom
        e_max = max(
            (e for _r, pa, pc in cls["pow2"] for _c, e in pa[1] + pc[1]),
            default=0,
        )
        n_win = min(20, (e_max + 32 + 16) // 16 + 2)
        # quotient bound: D < POS + OFF with OFF = p·2^34 → m < 2^36
        off_mult = 34
        m_limbs = 3
        L = max(n_win, 17 + (off_mult + 15) // 16) + 1
        off_limbs = [((p << off_mult) >> (16 * i)) & 0xFFFF for i in range(L)]
        pinv_L = pow(p, -1, 1 << (16 * m_limbs))
        pinv_limbs = [(pinv_L >> (16 * i)) & 0xFFFF for i in range(m_limbs)]

        def _side_tables(which):
            """Static tables for one side over all pow2 rows."""
            u_cols, u_shift, u_win, u_row = [], [], [], []
            f_idx, f_neg, f_row = [], [], []
            const_limbs = np.zeros((n_pow2, L), np.uint32)
            for w, (_r, pa, pc) in enumerate(cls["pow2"]):
                side = pa if which == 0 else pc
                cv, u32_terms, f_terms = side
                for i in range(L):
                    const_limbs[w, i] = (cv >> (16 * i)) & 0xFFFF
                for col, e in u32_terms:
                    u_cols.append(col)
                    u_shift.append(e % 16)
                    u_win.append(e // 16)
                    u_row.append(w)
                for fi, ng in f_terms:
                    f_idx.append(fi)
                    f_neg.append(ng)
                    f_row.append(w)
            return {
                "const": const_limbs,
                "u": (
                    np.asarray(u_cols, np.int32),
                    np.asarray(u_shift, np.int32),
                    np.asarray(u_win, np.int32),
                    np.asarray(u_row, np.int32),
                ),
                "f": (
                    np.asarray(f_idx, np.int32),
                    np.asarray(f_neg, np.uint32),
                    np.asarray(f_row, np.int32),
                ),
            }

        side_a = _side_tables(0)
        side_c = _side_tables(1)

        def _side_sum(tab, vals, flimbs, B):
            """Exact integer Σ const + Σ 2^e·u32 + Σ field as
            [B, n_pow2, L] window sums (unnormalized u32 windows)."""
            acc = jnp.broadcast_to(
                jnp.asarray(tab["const"])[None], (B, n_pow2, L)
            ).astype(jnp.uint32)
            u_cols, u_shift, u_win, u_row = tab["u"]
            if len(u_cols):
                v = vals[:, u_cols]  # [B, T]
                sh = jnp.asarray(u_shift, jnp.uint32)
                pieces = [
                    (v << sh) & jnp.uint32(0xFFFF),
                    jnp.where(
                        sh > 0, v >> (16 - sh), v >> 16
                    )
                    & jnp.uint32(0xFFFF),
                    jnp.where(sh > 0, v >> (32 - sh), jnp.uint32(0)),
                ]
                flat = jnp.stack(pieces, axis=-1)  # [B, T, 3]
                tgt = (
                    np.asarray(u_row)[:, None] * L
                    + np.asarray(u_win)[:, None]
                    + np.arange(3)[None, :]
                ).reshape(-1)
                acc = acc.reshape(B, n_pow2 * L).at[:, tgt].add(
                    flat.reshape(B, -1)
                ).reshape(B, n_pow2, L)
            f_idx, f_neg, f_row = tab["f"]
            for t in range(len(f_idx)):
                x16 = flimbs[:, f_idx[t]]  # [B, 16]
                x = jnp.pad(x16, ((0, 0), (0, L - 16)))
                if f_neg[t]:
                    x = _neg17_const(
                        jnp.pad(x16, ((0, 0), (0, 1))), p17
                    )
                    x = jnp.pad(x, ((0, 0), (0, L - 17)))
                acc = acc.at[:, f_row[t]].add(x)
            return acc

        def _carryL(x):
            outs = []
            carry = None
            for i in range(L):
                tot = x[..., i] if carry is None else x[..., i] + carry
                outs.append(tot & 0xFFFF)
                carry = tot >> 16
            return jnp.stack(outs, axis=-1)

        def _pow2_bad(vals, flimbs):
            B = vals.shape[0]
            pos = _side_sum(side_a, vals, flimbs, B)
            neg = _carryL(_side_sum(side_c, vals, flimbs, B))
            # d = pos + (p·2^34 − neg): borrow-free constant subtract
            outs = []
            borrow = None
            for i in range(L):
                d = jnp.uint32(off_limbs[i]) - neg[..., i]
                if borrow is not None:
                    d = d - borrow
                borrow = d >> 31
                outs.append(d & 0xFFFF)
            d = _carryL(pos + jnp.stack(outs, axis=-1))
            return _mont_zero_test(d, m_limbs, L, pinv_limbs)

    # --- fallback rows ----------------------------------------------------
    rest_viol = None
    if n_rest:
        sub = _sub_rows_r1cs(template, rest_rows)
        used = np.unique(
            np.concatenate(
                [np.asarray(getattr(sub, n).cols) for n in ("a", "b", "c")]
                + [np.zeros(1, np.int64)]
            )
        )
        lut = np.zeros(template.num_inputs + template.num_aux, np.int64)
        lut[used] = np.arange(len(used))
        from ..r1cs import COOMatrix

        def _remap(m):
            return COOMatrix(
                rows=np.asarray(m.rows),
                cols=lut[np.asarray(m.cols)].astype(np.int32),
                coeff_ids=np.asarray(m.coeff_ids),
            )

        sub_r = R1CS(
            field=sub.field,
            num_inputs=1,
            num_aux=len(used) - 1,
            num_constraints=sub.num_constraints,
            a=_remap(sub.a),
            b=_remap(sub.b),
            c=_remap(sub.c),
            coeff_table=list(sub.coeff_table),
            names=None,
        )
        rest_viol = build_templated_check(sub_r, batch, use_pallas, "limbs")
        fs_arr = np.full(template.num_inputs + template.num_aux, -1, np.int64)
        for i, s in enumerate(field_slots):
            fs_arr[int(s)] = i
        used_fs = fs_arr[used]  # -1 → u32 source
        used_np = used.astype(np.int32)
        used_fidx = jax.device_put(
            np.where(used_fs >= 0, used_fs, 0).astype(np.int32)
        )
        used_isf = jax.device_put((used_fs >= 0).astype(np.uint32)[:, None])

        def _rest_bad(vals, flimbs):
            B = vals.shape[0]
            fl = flimbs[:, used_fidx]  # [B, n_used, 16]
            v = vals[:, used_np]
            lift = jnp.zeros(v.shape + (16,), jnp.uint32)
            lift = lift.at[..., 0].set(v & 0xFFFF)
            lift = lift.at[..., 1].set(v >> 16)
            z3u = jnp.where(used_isf[None] == 1, fl, lift)
            return rest_viol(z3u).reshape(B, n_rest)

    order_rows = np.concatenate(
        [
            np.asarray([r for r, _c in cls["bool_u32"]], np.int64),
            np.asarray([r for r, *_ in cls["lin"]], np.int64),
            np.asarray([r for r, *_ in cls["mul"]], np.int64),
            pow2_rows,
            rest_rows,
        ]
    )
    inv = np.empty(R, np.int32)
    inv[order_rows] = np.arange(R, dtype=np.int32)
    inv_d = jax.device_put(inv)

    def violations(vals, flimbs):
        B = vals.shape[0]
        assert flimbs.shape[1] >= F or not field_slots
        parts = []
        if n_bool:
            parts.append(vals[:, bool_cols] > 1)  # [B, n_bool]
        if n_lin:
            parts.append(_lin_bad(vals, flimbs))
        if n_mul:
            parts.append(_mul_bad(vals, flimbs))
        if n_pow2:
            parts.append(_pow2_bad(vals, flimbs))
        if rest_viol is not None:
            parts.append(_rest_bad(vals, flimbs))
        comb = jnp.concatenate(parts, axis=1) if len(parts) > 1 else parts[0]
        return jnp.take(comb, inv_d, axis=1).reshape(B * R)

    return violations


_PACKED_BLK_W = 16  # unpack/compute block: 16 words = 512 instances


def _classify_bit_row_families(template: R1CS, small_idx: np.ndarray):
    """Match small rows against the reference gadget row shapes so the
    packed check can evaluate them with 2-6 full-word boolean ops
    instead of the generic unpack + int sums (~100 ops/row-word):

      booleanity  (1-x)·x = 0            boolean.rs:90-96   → statically
                                            satisfied by the bit-sliced
                                            representation (words ARE bits)
      condalloc   (1-m-x)·x = 0          boolean.rs:48-63   → bad = X∧M
      xor         (2x)·y = x+y-z         boolean.rs:143-150 → bad = (X⊕Y)⊕Z
      and         x·y = z                boolean.rs:184-191 → bad = (X∧Y)⊕Z
      and_not     x·(1-y) = z            boolean.rs:224-231 → bad = (X∧¬Y)⊕Z
      nor         (1-x)·(1-y) = z        boolean.rs:264-271 → bad = (¬X∧¬Y)⊕Z
      ch          (b-c)·a = ch-c         boolean.rs:627-639 → bad = ((A∧B)∨(¬A∧C))⊕CH
      maj (row 2) (2bc-b-c)·a = bc-maj   boolean.rs:741-751 → for bits the
          field equation reduces to: a ? (maj == b|c) : (maj == bc), so
          bad = (A∧(MAJ⊕(B∨C))) ∨ (¬A∧(MAJ⊕BC))
          (maj row 1, b·c = bc, matches the `and` family)

    Every match is verified against the ACTUAL R1CS coefficients — the
    families are sound rewrites of the row equation for bit-valued
    witnesses, which the packed representation guarantees. Returns
    (families, leftover_pos): families = {kind: int32[n_kind, n_operands]
    column array + rows_orig}, leftover_pos = positions (into small_idx
    order) of rows no family matched (checked generically)."""
    p_ = template.field.p
    R = template.num_constraints
    M1 = p_ - 1
    tb = [int(c) % p_ for c in template.coeff_table]
    small_set = set(int(r) for r in small_idx)
    terms = {}
    for name in ("a", "b", "c"):
        m = getattr(template, name)
        rows = np.asarray(m.rows)
        cols = np.asarray(m.cols)
        cids = np.asarray(m.coeff_ids)
        lst = {int(r): {} for r in small_idx}
        for e in range(len(rows)):
            r = int(rows[e])
            if r not in lst:
                continue
            d = lst[r]
            col = int(cols[e])
            d[col] = (d.get(col, 0) + tb[cids[e]]) % p_
        terms[name] = {
            r: {c: v for c, v in d.items() if v != 0} for r, d in lst.items()
        }

    def match(r):
        A, B, C = terms["a"][r], terms["b"][r], terms["c"][r]
        if C == {} and len(B) == 1 and list(B.values())[0] == 1:
            x = next(iter(B))
            if A == {0: 1, x: M1}:
                return ("bool",)
            if len(A) == 3 and A.get(0) == 1 and A.get(x) == M1:
                others = [c for c in A if c not in (0, x)]
                if len(others) == 1 and A[others[0]] == M1:
                    return ("condalloc", x, others[0])
        if (
            len(A) == 1
            and list(A.values())[0] == 2
            and len(B) == 1
            and list(B.values())[0] == 1
            and len(C) == 3
        ):
            x = next(iter(A))
            y = next(iter(B))
            if C.get(x) == 1 and C.get(y) == 1:
                z = [c for c in C if c not in (x, y)]
                if len(z) == 1 and C[z[0]] == M1:
                    return ("xor", x, y, z[0])
        if (
            len(A) == 1
            and list(A.values())[0] == 1
            and len(B) == 1
            and list(B.values())[0] == 1
            and len(C) == 1
            and list(C.values())[0] == 1
        ):
            return ("and", next(iter(A)), next(iter(B)), next(iter(C)))
        if (
            len(A) == 1
            and list(A.values())[0] == 1
            and len(B) == 2
            and B.get(0) == 1
            and len(C) == 1
            and list(C.values())[0] == 1
        ):
            ys = [c for c in B if c != 0]
            if len(ys) == 1 and B[ys[0]] == M1:
                return ("and_not", next(iter(A)), ys[0], next(iter(C)))
        if (
            len(A) == 2
            and A.get(0) == 1
            and len(B) == 2
            and B.get(0) == 1
            and len(C) == 1
            and list(C.values())[0] == 1
        ):
            xs = [c for c in A if c != 0]
            ys = [c for c in B if c != 0]
            if (
                len(xs) == 1
                and A[xs[0]] == M1
                and len(ys) == 1
                and B[ys[0]] == M1
            ):
                return ("nor", xs[0], ys[0], next(iter(C)))
        if (
            len(B) == 1
            and list(B.values())[0] == 1
            and len(A) == 2
            and len(C) == 2
        ):
            a_ = next(iter(B))
            shared = [x for x in A if A[x] == M1 and C.get(x) == M1]
            if len(shared) == 1:
                c_ = shared[0]
                bs = [x for x in A if x != c_]
                chs = [x for x in C if x != c_]
                if (
                    len(bs) == 1
                    and A[bs[0]] == 1
                    and len(chs) == 1
                    and C[chs[0]] == 1
                ):
                    return ("ch", a_, bs[0], c_, chs[0])
        if (
            len(A) == 3
            and len(B) == 1
            and list(B.values())[0] == 1
            and len(C) == 2
        ):
            bcs = [x for x in A if A[x] == 2]
            if len(bcs) == 1 and C.get(bcs[0]) == 1:
                bc = bcs[0]
                rest = [x for x in A if x != bc]
                if len(rest) == 2 and all(A[x] == M1 for x in rest):
                    majs = [x for x in C if x != bc]
                    if len(majs) == 1 and C[majs[0]] == M1:
                        b_, c_ = rest
                        return ("maj2", next(iter(B)), b_, c_, bc, majs[0])
        return None

    fams: Dict[str, list] = {}
    fam_rows: Dict[str, list] = {}
    leftover_pos = []
    for pos, r in enumerate(small_idx):
        m = match(int(r))
        if m is None:
            leftover_pos.append(pos)
            continue
        kind = m[0]
        fams.setdefault(kind, []).append(m[1:])
        fam_rows.setdefault(kind, []).append(int(r))
    families = {
        kind: (
            np.asarray(ops, np.int32).reshape(len(ops), -1),
            np.asarray(fam_rows[kind], np.int64),
        )
        for kind, ops in fams.items()
    }
    return families, np.asarray(leftover_pos, np.int64)


def _classify_pow2_eq_rows(template: R1CS, big_idx: np.ndarray):
    """Match big rows of the MultiEq shape (multieq.rs:25-58): B = ONE
    and both A and C are sums of power-of-two-scaled bit variables with
    each side's coefficient total < p (the capacity-packing invariant).
    For bit-valued witnesses such a row holds iff the two sides are
    equal as INTEGERS — checkable bit-sliced: per side, a carry-save
    reduction over same-exponent planes + one Kogge-Stone prefix add
    yields the side's binary representation; equality is a word compare.
    No field arithmetic, no unpacking.

    Returns (spec, rest_pos): spec = per-side ELL arrays
    {cols uint32[n, n_pos, M], mask uint32[n, n_pos, M]} + rows_orig,
    or None if no row qualifies; rest_pos = positions (into big_idx
    order) of non-matching rows (checked by the fused-kernel path)."""
    p_ = template.field.p
    R = template.num_constraints
    tb = [int(c) % p_ for c in template.coeff_table]
    big_set = {int(r) for r in big_idx}
    terms = {}
    for name in ("a", "b", "c"):
        m = getattr(template, name)
        rows = np.asarray(m.rows)
        cols = np.asarray(m.cols)
        cids = np.asarray(m.coeff_ids)
        lst = {r: [] for r in big_set}
        for e in range(len(rows)):
            r = int(rows[e])
            if r in lst:
                lst[r].append((tb[cids[e]], int(cols[e])))
        terms[name] = lst

    def side(ts):
        """[(exponent, col)] with every coefficient DECOMPOSED into its
        set bits (a shared operand bit appearing in two packed
        equalities gets coeff 2^a + 2^b → two entries; a folded
        constant rides col 0, whose packed word is all-ones), or None
        when the coefficient total reaches p — the sum could then wrap
        mod p and integer equality would be unsound."""
        out = []
        total = 0
        for cf, col in ts:
            total += cf
            e = 0
            while cf:
                if cf & 1:
                    out.append((e, col))
                cf >>= 1
                e += 1
        if total >= p_:
            return None
        return out

    matched = []
    rest_pos = []
    for pos, r in enumerate(big_idx):
        r = int(r)
        B_ = [(cf, col) for cf, col in terms["b"][r] if cf != 0]
        if B_ != [(1, 0)]:
            rest_pos.append(pos)
            continue
        sa = side(terms["a"][r])
        sc = side(terms["c"][r])
        if sa is None or sc is None:
            rest_pos.append(pos)
            continue
        matched.append((r, sa, sc))
    if not matched:
        return None, np.asarray(rest_pos, np.int64)

    n = len(matched)
    e_max = max(
        (e for _r, sa, sc in matched for e, _c in sa + sc), default=0
    )
    # Per-side addend width: the c side of a MultiEq row (the packed
    # result bits) is typically 1-2 addends/position while the a side
    # (addmany sums) can be many — sizing each side's ELL independently
    # shrinks the gathered plane volume several-fold.
    m_side = {}
    for key, idx in (("a", 1), ("c", 2)):
        m_ = 1
        for row in matched:
            cnt = defaultdict(int)
            for e, _c in row[idx]:
                cnt[e] += 1
            m_ = max(m_, max(cnt.values(), default=1))
        m_side[key] = m_
    m_max = max(m_side.values())
    # Positions padded so the final carry cannot overflow: each side's
    # value < p < 2^255, so 256 positions always suffice; smaller
    # templates use e_max + headroom.
    n_pos = min(256, e_max + 1 + (m_max + 1).bit_length() + 1)
    spec = {"rows_orig": np.asarray([r for r, _a, _c in matched], np.int64),
            "n_pos": n_pos, "m": m_max}
    for key, idx in (("a", 1), ("c", 2)):
        cols = np.zeros((n, n_pos, m_side[key]), np.int32)
        mask = np.zeros((n, n_pos, m_side[key]), np.uint32)
        for i, row in enumerate(matched):
            cnt = defaultdict(int)
            for e, col in row[idx]:
                k = cnt[e]
                cnt[e] += 1
                cols[i, e, k] = col
                mask[i, e, k] = 0xFFFFFFFF
        spec[key + "_cols"] = cols
        spec[key + "_mask"] = mask
    return spec, np.asarray(rest_pos, np.int64)


def _pow2_eq_bad_words(vals_p, spec):
    """Packed bad words [n, Bw] for the pow2-equality rows: bit-sliced
    integer evaluation of both sides, then a word compare. The position
    axis is kept MAJOR so the carry shifts are cheap major-axis pads,
    not second-minor relayouts."""
    n_pos = spec["n_pos"]

    def sh(x, d=1):  # shift toward MSB along the (major) position axis
        return jnp.pad(x, ((d, 0), (0, 0), (0, 0)))[:n_pos]

    def side(cols, mask):
        m = cols.shape[2]
        g = vals_p[cols.reshape(-1)].reshape(cols.shape + (-1,))
        g = g & mask[..., None]  # [n, n_pos, M, Bw]
        g = jnp.transpose(g, (1, 0, 2, 3))  # [n_pos, n, M, Bw]
        addends = [g[:, :, k] for k in range(m)]
        while len(addends) > 2:
            nxt = []
            for i in range(0, len(addends) - 2, 3):
                a1, b1, c1 = addends[i : i + 3]
                nxt.append(a1 ^ b1 ^ c1)
                nxt.append(sh((a1 & b1) | (c1 & (a1 ^ b1))))
            rem = len(addends) % 3
            if rem:
                nxt.extend(addends[-rem:])
            addends = nxt
        if len(addends) == 1:
            return addends[0]
        a1, b1 = addends
        g_ = a1 & b1
        p_ = a1 ^ b1
        gk, pk, d = g_, p_, 1
        while d < n_pos:
            gk = gk | (pk & sh(gk, d))
            pk = pk & sh(pk, d)
            d *= 2
        return p_ ^ sh(gk)

    lhs = side(spec["a_cols"], spec["a_mask"])
    rhs = side(spec["c_cols"], spec["c_mask"])
    diff = lhs ^ rhs  # [n_pos, n, Bw]
    return jax.lax.reduce(diff, np.uint32(0), jax.lax.bitwise_or, (0,))


_POW2_TILE_W = 512


def _pow2_eq_bad_words_pallas(vals_p, spec, interpret=False):
    """Pallas form of _pow2_eq_bad_words: ONE fused gather of all addend
    planes (empty ELL slots index a dedicated zero row, so no mask pass
    and no pad pass), then the carry-free VMEM equality kernel
    (field_pallas.make_bitplane_eq_kernel). Bit-identical to the XLA
    lowering — the parity tests compare the two, which use different
    adder algorithms (CSA+Kogge-Stone vs the local carry rule)."""
    from .field_pallas import make_bitplane_eq_kernel

    n_pos = spec["n_pos"]
    n = spec["a_cols"].shape[0]
    m_a = spec["a_cols"].shape[2]
    m_c = spec["c_cols"].shape[2]
    S_t, Bw = vals_p.shape
    kern = make_bitplane_eq_kernel(
        n_pos, m_a, m_c, interpret=interpret, tile_w=_POW2_TILE_W
    )
    P = kern.n_pos_padded
    W = n * Bw
    W_p = -(-W // _POW2_TILE_W) * _POW2_TILE_W

    # Host-numpy index tables on purpose (see the _ConstPool note):
    # [m, P, n], empty/padded slots pointing at the appended zero row.
    tabs = []
    for key_, m in (("a", m_a), ("c", m_c)):
        cols_t = spec[key_ + "_cols"].transpose(2, 1, 0)  # [m, n_pos, n]
        mask_t = spec[key_ + "_mask"].transpose(2, 1, 0)
        cols_p = np.full((m, P, n), S_t, np.int32)
        cols_p[:, :n_pos] = np.where(mask_t != 0, cols_t, S_t)
        tabs.append(cols_p)
    idx_all = np.concatenate([t.reshape(-1) for t in tabs])

    vz = jnp.concatenate(
        [vals_p, jnp.zeros((1, Bw), jnp.uint32)], axis=0
    )
    g = vz[idx_all]  # [(m_a + m_c)·P·n, Bw] — one fused gather
    A = g[: m_a * P * n].reshape(m_a * P, W)
    C = g[m_a * P * n :].reshape(m_c * P, W)
    if W_p != W:
        # zero columns are vacuously equal in both kernel forms
        A = jnp.pad(A, ((0, 0), (0, W_p - W)))
        C = jnp.pad(C, ((0, 0), (0, W_p - W)))
    return kern(A, C)[:W].reshape(n, Bw)


# bad-word formulas per family kind: X = packed word columns in the
# order stored by _classify_bit_row_families. A nonzero bit = violation.
def _family_bad(kind, X):
    if kind == "condalloc":
        return X[0] & X[1]
    if kind == "xor":
        return (X[0] ^ X[1]) ^ X[2]
    if kind == "and":
        return (X[0] & X[1]) ^ X[2]
    if kind == "and_not":
        return (X[0] & ~X[1]) ^ X[2]
    if kind == "nor":
        return (~X[0] & ~X[1]) ^ X[2]
    if kind == "ch":
        a, b, c, ch = X
        return ((a & b) | (~a & c)) ^ ch
    if kind == "maj2":
        # Exact for ALL bit assignments including inconsistent bc (the
        # product slot may be corrupted): with a=1 the field equation
        # reads maj == b + c - bc over ℤ, where b + c - bc can be -1
        # (bc=1, b=c=0) or 2 (b=c=1, bc=0) — never equal to a bit — and
        # otherwise equals (b∧c∧bc) ∨ ((b⊕c)∧¬bc).
        a, b, c, bc, maj = X
        over = b & c & ~bc
        under = ~b & ~c & bc
        s = (b & c & bc) | ((b ^ c) & ~bc)
        bad_a1 = over | under | (maj ^ s)
        return (a & bad_a1) | (~a & (maj ^ bc))
    raise AssertionError(kind)


def _build_packed_field_check(template: R1CS, batch: int, use_pallas: bool,
                              _partition: bool, field_slots):
    """bits_packed check WITH a field-limb sidecar (the mixed packed
    layout): bit slots ride the packed-word machinery; rows binding a
    field slot must be of the multipack shape (multipack.rs:76-105)
    `Σ 2^i·b_i · ONE = field_out` and are checked as bit-sliced integer
    equality between the bit side's CSA/Kogge-Stone sum and the field
    value's bit planes. All other rows recurse into the pure packed
    check on the field-row-free sub-template.

    Returns violations(vals_bm [Bw, S_t], flimbs [B, F, 16]) with a
    .verdict(vals_bm, flimbs) → (n_bad, first_flat) companion."""
    p_ = template.field.p
    R = template.num_constraints
    Bw = batch // 32
    fs_row = {int(s): i for i, s in enumerate(field_slots)}
    tb = [int(c) % p_ for c in template.coeff_table]
    terms = {}
    for name in ("a", "b", "c"):
        m = getattr(template, name)
        rows = np.asarray(m.rows)
        cols = np.asarray(m.cols)
        cids = np.asarray(m.coeff_ids)
        lst = [[] for _ in range(R)]
        for e in range(len(rows)):
            lst[int(rows[e])].append((tb[int(cids[e])], int(cols[e])))
        terms[name] = lst

    def bit_side(ts):
        out = []
        total = 0
        for cf, col in ts:
            if col in fs_row or cf == 0:
                return None
            total += cf
            e = 0
            while cf:
                if cf & 1:
                    out.append((e, col))
                cf >>= 1
                e += 1
        if total >= p_:
            return None
        return out

    packfield = []  # (row, [(e, col)], fs_idx)
    remaining = []
    for r in range(R):
        touches = any(
            col in fs_row for nm in ("a", "b", "c") for _cf, col in terms[nm][r]
        )
        if not touches:
            remaining.append(r)
            continue
        B_ = [(cf, col) for cf, col in terms["b"][r] if cf != 0]
        C_ = [(cf, col) for cf, col in terms["c"][r] if cf != 0]
        sa = bit_side(terms["a"][r])
        if (
            B_ == [(1, 0)]
            and len(C_) == 1
            and C_[0][0] == 1
            and C_[0][1] in fs_row
            and sa is not None
        ):
            packfield.append((r, sa, fs_row[C_[0][1]]))
            continue
        raise NotImplementedError(
            f"packed field sidecar: row {r} binds a field slot but is "
            "not of the multipack shape; use the mixed or limbs form"
        )
    n_pf = len(packfield)
    remaining = np.asarray(remaining, np.int64)
    Rt_sub = len(remaining)
    inner = _build_packed_bits_check(
        _sub_rows_r1cs(template, remaining), batch, use_pallas, _partition
    )
    inner_verdict = getattr(inner, "verdict", None)
    remaining_d = jax.device_put(remaining.astype(np.uint32))

    # Static ELL planes for the bit sides (shared with the pow2 code).
    e_max = max((e for _r, sa, _f in packfield for e, _c in sa), default=0)
    cnts = []
    for _r, sa, _f in packfield:
        cnt = defaultdict(int)
        for e, _c in sa:
            cnt[e] += 1
        cnts.append(max(cnt.values(), default=1))
    m_a = max(cnts, default=1)
    # the compare must cover EVERY bit of the field value (< 2^NUM_BITS)
    n_pos = min(
        256,
        max(
            e_max + 1 + (m_a + 1).bit_length() + 1,
            template.field.NUM_BITS,
        ),
    )
    a_cols = np.zeros((n_pf, n_pos, m_a), np.int32)
    a_mask = np.zeros((n_pf, n_pos, m_a), np.uint32)
    for i, (_r, sa, _f) in enumerate(packfield):
        cnt = defaultdict(int)
        for e, col in sa:
            k = cnt[e]
            cnt[e] += 1
            a_cols[i, e, k] = col
            a_mask[i, e, k] = 0xFFFFFFFF
    pf_rows = np.asarray([r for r, _sa, _f in packfield], np.int64)
    pf_fidx = np.asarray([f for _r, _sa, f in packfield], np.int32)
    spec_a = {"n_pos": n_pos, "a_cols": a_cols, "a_mask": a_mask}

    sh32 = np.arange(32, dtype=np.uint32)

    def _field_bit_planes(flimbs):
        """[n_pf, n_pos, Bw]: bit e of each instance's field value,
        packed 32 instances/word (pack_bits layout)."""
        fl = flimbs[:, pf_fidx]  # [B, n_pf, 16]
        planes = []
        for e in range(n_pos):
            limb, off = divmod(e, 16)
            if limb >= 16:
                planes.append(jnp.zeros((n_pf, Bw), jnp.uint32))
                continue
            bits = (fl[:, :, limb] >> off) & jnp.uint32(1)  # [B, n_pf]
            words = jnp.sum(
                bits.T.reshape(n_pf, Bw, 32) << sh32,
                axis=-1,
                dtype=jnp.uint32,
            )
            planes.append(words)
        return jnp.stack(planes, axis=1)  # [n_pf, n_pos, Bw]

    def _pf_bad_words(vals_p, flimbs):
        """[n_pf, Bw] bad words: bit-side integer sum != field bits."""
        # resolved bit planes of the A side (CSA + Kogge-Stone), via the
        # pow2 machinery's side() on a single-side spec
        lhs = _pow2_side_sum_bits(vals_p, spec_a)  # [n_pos, n_pf, Bw]
        rhs = jnp.transpose(_field_bit_planes(flimbs), (1, 0, 2))
        diff = lhs ^ rhs
        return jax.lax.reduce(
            diff, np.uint32(0), jax.lax.bitwise_or, (0,)
        )

    inv = np.empty(R, np.int32)
    inv[np.concatenate([remaining, pf_rows])] = np.arange(R, dtype=np.int32)
    inv_d = jax.device_put(inv)
    _SENT = np.uint32(0xFFFFFFFF)

    def _ctz32(w):
        neg = jnp.uint32(0) - w
        return jax.lax.population_count((w & neg) - jnp.uint32(1))

    def violations(vals_bm, flimbs):
        B = batch
        m_in = inner(vals_bm).reshape(B, Rt_sub)
        parts = [m_in]
        if n_pf:
            words = _pf_bad_words(vals_bm.T, flimbs)  # [n_pf, Bw]
            bits = ((words[:, :, None] >> sh32) & np.uint32(1)).reshape(
                n_pf, B
            )
            parts.append((bits != 0).T)
        comb = jnp.concatenate(parts, axis=1) if len(parts) > 1 else parts[0]
        return jnp.take(comb, inv_d, axis=1).reshape(B * R)

    def verdict(vals_bm, flimbs):
        if inner_verdict is not None:
            nb, first = inner_verdict(vals_bm)
            # remap the sub-template row back to the original index;
            # min-by-(instance, row) is preserved because `remaining`
            # is ascending
            inst = first // np.uint32(max(Rt_sub, 1))
            row = first % np.uint32(max(Rt_sub, 1))
            first = jnp.where(
                first == _SENT,
                _SENT,
                inst * np.uint32(R) + remaining_d[jnp.minimum(row, Rt_sub - 1)],
            )
        else:
            bad = inner(vals_bm)  # [B·Rt_sub] instance-major, sub rows
            nb = jnp.sum(bad.astype(jnp.uint32))
            flat_sub = jnp.argmax(bad).astype(jnp.uint32)
            inst = flat_sub // np.uint32(max(Rt_sub, 1))
            row = flat_sub % np.uint32(max(Rt_sub, 1))
            first = jnp.where(
                nb > 0,
                inst * np.uint32(R)
                + remaining_d[jnp.minimum(row, max(Rt_sub - 1, 0))],
                _SENT,
            )
        if n_pf:
            words = _pf_bad_words(vals_bm.T, flimbs)
            nb = nb + jnp.sum(
                jax.lax.population_count(words), dtype=jnp.uint32
            )
            winst = jnp.arange(Bw, dtype=jnp.uint32)[None, :] * jnp.uint32(32)
            cand = jnp.where(
                words != 0,
                (winst + _ctz32(words)) * np.uint32(R)
                + pf_rows.astype(np.uint32)[:, None],
                _SENT,
            )
            first = jnp.minimum(first, jnp.min(cand))
        return nb, first

    violations.verdict = verdict
    return violations


def _pow2_side_sum_bits(vals_p, spec):
    """Resolved bit planes [n_pos, n, Bw] of Σ 2^e·bit for one ELL side
    (the CSA + Kogge-Stone sum from _pow2_eq_bad_words, single side)."""
    n_pos = spec["n_pos"]

    def sh(x, d=1):
        return jnp.pad(x, ((d, 0), (0, 0), (0, 0)))[:n_pos]

    cols = spec["a_cols"]
    mask = spec["a_mask"]
    m = cols.shape[2]
    g = vals_p[cols.reshape(-1)].reshape(cols.shape + (-1,))
    g = g & mask[..., None]
    g = jnp.transpose(g, (1, 0, 2, 3))  # [n_pos, n, M, Bw]
    addends = [g[:, :, k] for k in range(m)]
    while len(addends) > 2:
        nxt = []
        for i in range(0, len(addends) - 2, 3):
            a1, b1, c1 = addends[i : i + 3]
            nxt.append(a1 ^ b1 ^ c1)
            nxt.append(sh((a1 & b1) | (c1 & (a1 ^ b1))))
        rem = len(addends) % 3
        if rem:
            nxt.extend(addends[-rem:])
        addends = nxt
    if len(addends) == 1:
        return addends[0]
    a1, b1 = addends
    g_ = a1 & b1
    p_ = a1 ^ b1
    gk, pk, d = g_, p_, 1
    while d < n_pos:
        gk = gk | (pk & sh(gk, d))
        pk = pk & sh(pk, d)
        d *= 2
    return p_ ^ sh(gk)


def _build_packed_bits_check(template: R1CS, batch: int, use_pallas: bool,
                             _partition: bool):
    """bits_packed templated check: z as uint32[batch/32, S_t] bit-sliced
    packed words (WitnessProgram.build_packed's batch-major layout;
    transposed to slot-major once on entry, like the bits form's vals.T).

    The check's dominant cost is gather descriptors; here every gather
    runs at the PACKED level — one descriptor per 32 instances — hoisted
    out of the per-block loop. Unpack and the int32 small-row compare run
    per 512-instance block inside a lax.map (bounds live int32 temps);
    big rows unpack only their (remapped) used slots per block and ride
    the existing fused bucket kernels at block batch."""
    Rt0 = template.num_constraints
    S_t = template.num_inputs + template.num_aux
    blk_B = 32 * _PACKED_BLK_W
    if batch % blk_B:
        raise ValueError(f"bits_packed batch must be a multiple of {blk_B}")
    n_blocks = batch // blk_B
    Bw = batch // 32
    if Rt0 == 0:
        return lambda vals_p: jnp.zeros((0,), bool)
    # numpy (not jnp) on purpose: an eager jnp array is device-resident
    # and, captured as a jit constant, is fetched back through the axon
    # tunnel during MLIR lowering (~70 s/array — see _ConstPool).
    sh32 = np.arange(32, dtype=np.uint32)

    def _unpack_block(seg):
        """[n, BLK_W] packed words → [n, blk_B] 0/1 uint32."""
        b = (seg[:, :, None] >> sh32) & jnp.uint32(1)
        return b.reshape(seg.shape[0], blk_B)

    part = _classify_small_rows(template) if _partition else None
    if part is None:
        inner = build_templated_check(
            template, blk_B, use_pallas, "bits",
            _partition=_partition, _slot_major=True,
        )

        def violations_packed_fb(vals_bm):
            vals_p = vals_bm.T  # [S_t, Bw] slot-major
            def blk(w):
                seg = jax.lax.dynamic_slice(
                    vals_p, (0, w * _PACKED_BLK_W), (S_t, _PACKED_BLK_W)
                )
                return inner(_unpack_block(seg))

            if n_blocks == 1:
                return blk(jnp.int32(0))
            masks = jax.lax.map(blk, jnp.arange(n_blocks))
            return masks.reshape(batch * Rt0)

        return violations_packed_fb

    small_idx, big_idx, layouts = part
    n_small, n_big = len(small_idx), len(big_idx)
    # All index/coefficient tables stay HOST numpy: captured device
    # arrays are fetched back through the tunnel at MLIR-lowering time
    # (~70 s per buffer — see witness_program._ConstPool).
    small_np = {
        name: (np.asarray(colp), np.asarray(scop, np.int32))
        for name, (colp, scop) in layouts.items()
    }

    # Structured gadget rows evaluate as 2-6 full-word boolean ops per
    # 32 instances; booleanity rows are statically satisfied by the
    # bit-sliced representation. Only the (usually tiny) leftover runs
    # the generic unpack + int-sum path.
    families, leftover_pos = _classify_bit_row_families(template, small_idx)
    bool_rows = families.pop("bool", (None, np.zeros(0, np.int64)))[1]
    n_bool = len(bool_rows)
    fam_order = sorted(families)
    n_left = len(leftover_pos)
    left_np = {
        name: (colp[leftover_pos], scop[leftover_pos].astype(np.int32))
        for name, (colp, scop) in small_np.items()
    }
    rows_left = small_idx[leftover_pos].astype(np.uint32)

    # Big rows of the MultiEq power-of-two-equality shape evaluate as
    # bit-sliced integer comparisons on packed words (no unpacking, no
    # field arithmetic); only the rest ride the fused-kernel blocks.
    pow2_spec, rest_big_pos = (
        _classify_pow2_eq_rows(template, big_idx)
        if n_big
        else (None, np.zeros(0, np.int64))
    )
    pow2_rows = (
        pow2_spec["rows_orig"] if pow2_spec is not None
        else np.zeros(0, np.int64)
    )
    _pow2_bad = (
        _pow2_eq_bad_words_pallas if use_pallas else _pow2_eq_bad_words
    )
    rest_big_idx = big_idx[rest_big_pos].astype(np.int64)
    n_rest_big = len(rest_big_idx)

    # Row order of the assembled mask parts (before the inverse map).
    order_rows = np.concatenate(
        [bool_rows.astype(np.int64)]
        + [families[k][1] for k in fam_order]
        + [
            small_idx[leftover_pos].astype(np.int64),
            pow2_rows.astype(np.int64),
            rest_big_idx,
        ]
    )
    inv = np.empty(Rt0, np.int32)
    inv[order_rows] = np.arange(Rt0, dtype=np.int32)

    # The materialized ev buffers of the generic path are its dominant
    # HBM traffic; accumulate in int16 when every row's |coefficient|
    # sum fits (products still compare in int32).
    _ev16 = all(
        int(np.abs(scop.astype(np.int64)).sum(axis=1).max(initial=0))
        < (1 << 15)
        for _c, scop in left_np.values()
    )
    _acc_dt = jnp.int16 if _ev16 else jnp.int32

    def _left_evs(vals_p):
        """Generic leftover rows: bool[n_left, Bw, 32] violation mask."""
        evs = []
        for name in ("a", "b", "c"):
            colp, scop = left_np[name]
            sc = scop.astype(np.int16) if _ev16 else scop
            ev = None
            for k in range(colp.shape[1]):
                vk = vals_p[colp[:, k]]  # [n_left, Bw] packed words
                b32 = ((vk[:, :, None] >> sh32) & np.uint32(1)).astype(
                    _acc_dt
                )
                term = b32 * sc[:, k][:, None, None]
                ev = term if ev is None else ev + term
            evs.append(ev)
        a32 = evs[0].astype(jnp.int32)
        b32_ = evs[1].astype(jnp.int32)
        c32 = evs[2].astype(jnp.int32)
        return (a32 * b32_) != c32  # [n_left, Bw, 32]

    def _fam_bad_words(vals_p):
        """[(kind, bad_words[n_f, Bw], rows_orig)] for runtime families."""
        out = []
        for kind in fam_order:
            opcols, rows_orig = families[kind]
            X = [vals_p[opcols[:, i]] for i in range(opcols.shape[1])]
            out.append((kind, _family_bad(kind, X), rows_orig))
        return out

    big_viol = None
    if n_rest_big:
        # Remap the remaining big-row subsystem to its used slots only,
        # so the per-block unpack materializes [n_used, blk_B], not the
        # full slot space. ONE (slot 0) stays slot 0.
        sub = _sub_rows_r1cs(template, rest_big_idx)
        used = np.unique(
            np.concatenate(
                [np.asarray(getattr(sub, n).cols) for n in ("a", "b", "c")]
                + [np.zeros(1, np.int64)]
            )
        )
        lut = np.zeros(S_t, np.int64)
        lut[used] = np.arange(len(used))
        from ..r1cs import COOMatrix

        def _remap(m):
            return COOMatrix(
                rows=np.asarray(m.rows),
                cols=lut[np.asarray(m.cols)].astype(np.int32),
                coeff_ids=np.asarray(m.coeff_ids),
            )

        sub_r = R1CS(
            field=sub.field,
            num_inputs=1,
            num_aux=len(used) - 1,
            num_constraints=sub.num_constraints,
            a=_remap(sub.a),
            b=_remap(sub.b),
            c=_remap(sub.c),
            coeff_table=list(sub.coeff_table),
            names=None,
        )
        used_np = used.astype(np.int32)
        big_viol = build_templated_check(
            sub_r, blk_B, use_pallas, "bits",
            _partition=False, _slot_major=True,
        )

    def _big_bad(vals_p):
        gb = jax.lax.optimization_barrier(vals_p[used_np])  # [n_used, Bw]

        def blk(w):
            seg = jax.lax.dynamic_slice(
                gb, (0, w * _PACKED_BLK_W), (gb.shape[0], _PACKED_BLK_W)
            )
            return big_viol(_unpack_block(seg))  # [blk_B · n_big]

        if n_blocks == 1:
            bad_big = blk(jnp.int32(0))
        else:
            bad_big = jax.lax.map(blk, jnp.arange(n_blocks))
        return bad_big.reshape(batch, n_rest_big)

    def violations_packed(vals_bm):
        assert vals_bm.shape == (Bw, S_t), (
            f"bits_packed z must be [batch/32={Bw}, S_t={S_t}], got "
            f"{vals_bm.shape}"
        )
        vals_p = vals_bm.T  # [S_t, Bw] slot-major for the row gathers
        parts = []
        if n_bool:
            parts.append(jnp.zeros((batch, n_bool), bool))
        for _kind, words, _rows in _fam_bad_words(vals_p):
            bits = ((words[:, :, None] >> sh32) & np.uint32(1)).reshape(
                words.shape[0], batch
            )
            parts.append((bits != 0).T)  # [batch, n_f]
        if n_left:
            parts.append(_left_evs(vals_p).reshape(n_left, batch).T)
        if pow2_spec is not None:
            words = _pow2_bad(vals_p, pow2_spec)  # [n_p2, Bw]
            bits = ((words[:, :, None] >> sh32) & np.uint32(1)).reshape(
                words.shape[0], batch
            )
            parts.append((bits != 0).T)
        if big_viol is not None:
            parts.append(_big_bad(vals_p))
        comb = jnp.concatenate(parts, axis=1) if len(parts) > 1 else parts[0]
        return jnp.take(comb, inv, axis=1).reshape(batch * Rt0)

    # Reduced verdict: (n_bad, first_flat) without materializing the
    # instance-major mask. n_bad sums popcounts of the family bad words
    # directly; first_flat = min over instance-major flat indices
    # (b·Rt0 + original_row), with each word contributing its lowest
    # set bit via count-trailing-zeros.
    assert batch * Rt0 < (1 << 32), "flat index must fit uint32"
    _SENT = np.uint32(0xFFFFFFFF)

    def _ctz32(w):
        neg = jnp.uint32(0) - w
        return jax.lax.population_count((w & neg) - jnp.uint32(1))

    def verdict_packed(vals_bm):
        vals_p = vals_bm.T
        nb = jnp.uint32(0)
        first = jnp.uint32(_SENT)
        winst = jnp.arange(Bw, dtype=jnp.uint32)[None, :] * jnp.uint32(32)
        for _kind, words, rows_orig in _fam_bad_words(vals_p):
            nb = nb + jnp.sum(
                jax.lax.population_count(words), dtype=jnp.uint32
            )
            cand = jnp.where(
                words != 0,
                (winst + _ctz32(words)) * np.uint32(Rt0)
                + rows_orig.astype(np.uint32)[:, None],
                _SENT,
            )
            first = jnp.minimum(first, jnp.min(cand))
        if n_left:
            bad_left = _left_evs(vals_p).reshape(n_left, batch)
            nb = nb + jnp.sum(bad_left.astype(jnp.uint32))
            binst = jnp.arange(batch, dtype=jnp.uint32)
            first = jnp.minimum(
                first,
                jnp.min(
                    jnp.where(
                        bad_left,
                        binst[None, :] * np.uint32(Rt0)
                        + rows_left[:, None],
                        _SENT,
                    )
                ),
            )
        if pow2_spec is not None:
            words = _pow2_bad(vals_p, pow2_spec)  # [n_p2, Bw]
            nb = nb + jnp.sum(
                jax.lax.population_count(words), dtype=jnp.uint32
            )
            cand = jnp.where(
                words != 0,
                (winst + _ctz32(words)) * np.uint32(Rt0)
                + pow2_rows.astype(np.uint32)[:, None],
                _SENT,
            )
            first = jnp.minimum(first, jnp.min(cand))
        if big_viol is not None:
            bad_big = _big_bad(vals_p)
            nb = nb + jnp.sum(bad_big.astype(jnp.uint32))
            binst = jnp.arange(batch, dtype=jnp.uint32)
            first = jnp.minimum(
                first,
                jnp.min(
                    jnp.where(
                        bad_big,
                        binst[:, None] * np.uint32(Rt0)
                        + rest_big_idx.astype(np.uint32)[None, :],
                        _SENT,
                    )
                ),
            )
        return nb, first

    violations_packed.verdict = verdict_packed
    return violations_packed


def build_templated_check(
    template: R1CS,
    batch: int,
    use_pallas: bool,
    witness_form: str = "limbs",
    _partition: bool = True,
    _slot_major: bool = False,
    field_slots=None,
):
    """Core of the templated satisfiability check (see TemplatedSatisfier).

    witness_form:
      * "limbs" — z given as uint32[B, S_t, 16] limb planes (general);
      * "bits"  — z given as uint32[B, S_t] with every value 0 or 1
        (pure-bit circuits like the hash gadgets): entry products reduce
        to coefficient-digit masking, skipping the modmul entirely, and
        the whole pipeline stays limb-major with no transposes. Rows with
        small signed-coefficient bounds are checked exactly in int32 (see
        _classify_small_rows); only the rest (e.g. MultiEq packed rows)
        run the full limb pipeline.
      * "bits_packed" — z given as uint32[S_t, batch/32] bit-sliced
        packed words (slot-major; bit j of word w = instance 32·w + j,
        the layout WitnessProgram.build_packed produces): all gathers
        move packed words (32× less traffic per instance than "bits"),
        small rows unpack in-register inside the int32 compare, and big
        rows unpack per 512-instance block into the fused kernels.
      * "mixed" — z given as (vals uint32[B, S_t], flimbs
        uint32[B, F, 16]): u32-domain slots stay 4-byte values, field
        slots live in the limb sidecar (requires `field_slots`, mapping
        flimbs row i → slot). The check form for field-bearing circuits:
        booleanity → u32 compare, additions → Montgomery zero-test,
        products → fused mul-compare, multipack/MultiEq rows → exact
        integer window sums (see _build_mixed_check).

    DOMAIN CONTRACT (bits / bits_packed): these forms verify a
    BIT-VALUED witness domain — every z slot must be 0 or 1. "bits"
    assumes it (values ≥ 2 make the int32 small-row compare and the
    digit-masking products meaningless); "bits_packed" enforces it by
    representation (a slot IS one bit per instance), which is also why
    booleanity rows (1−x)·x = 0 are statically satisfied there. Exact
    field semantics are guaranteed for every 0/1 assignment, including
    inconsistent intermediate slots (see the exhaustive truth-table and
    every-slot corruption tests in tests/test_packed.py) — but a non-bit
    FIELD value planted in a bit slot (the reference's set-to-random
    mutation probes, num.rs:707-713) is representable only on the
    "limbs" form or the host TestConstraintSystem oracle, where
    booleanity rows are checked as field equations. Callers whose
    witness values are not structurally guaranteed bits must use
    witness_form="limbs".

    `_slot_major` (bits form only): the returned function takes
    bits_T uint32[S_t, B] instead of [B, S_t] (skips the transpose —
    used by the packed path, whose blocks are already slot-major).

    Returns an UNJITTED function z → bool[B·Rt] violation mask in the
    ORIGINAL row order (instances major), suitable for jit or shard_map."""
    # Multi-instance batching requires input-free templates (each
    # instance's slot 0 is its ONE); a trivial batch of 1 covers any
    # R1CS, inputs included.
    if not (template.num_inputs == 1 or batch == 1):
        raise ValueError("multi-instance templates must be input-free")

    if template.num_constraints == 0:
        # Vacuously satisfied — return an empty mask of static length 0.
        def violations_empty(vals):
            return jnp.zeros((0,), bool)

        return violations_empty

    Rt0 = template.num_constraints
    if witness_form == "mixed":
        # u32 buffer + field-limb sidecar (WitnessProgram.build output):
        # violations(vals [B, S_t], flimbs [B, F, 16]). Same canonical
        # domain contract as "limbs" for field rows; u32 slots < 2^32.
        if field_slots is None:
            raise ValueError(
                "witness_form='mixed' needs field_slots (flimbs row → slot)"
            )
        return _build_mixed_check(template, batch, use_pallas, field_slots)
    if witness_form == "bits_packed":
        if field_slots:
            return _build_packed_field_check(
                template, batch, use_pallas, _partition, field_slots
            )
        return _build_packed_bits_check(template, batch, use_pallas, _partition)
    if witness_form == "bits" and Rt0 and _partition:
        part = _classify_small_rows(template)
        if part is not None:
            small_idx, big_idx, layouts = part
            n_small, n_big = len(small_idx), len(big_idx)
            big_viol = (
                build_templated_check(
                    _sub_rows_r1cs(template, big_idx),
                    batch,
                    use_pallas,
                    "bits",
                    _partition=False,
                    _slot_major=_slot_major,
                )
                if n_big
                else None
            )
            dev_small = {
                name: (jax.device_put(colp), jax.device_put(scop))
                for name, (colp, scop) in layouts.items()
            }
            inv = np.empty(Rt0, np.int32)
            inv[np.concatenate([small_idx, big_idx])] = np.arange(
                Rt0, dtype=np.int32
            )
            inv_d = jax.device_put(inv)

            def violations_split(vals):
                if _slot_major:
                    B = vals.shape[1]
                    bits_T = vals.astype(jnp.int32)  # [S_t, B], values 0/1
                else:
                    B = vals.shape[0]
                    bits_T = vals.T.astype(jnp.int32)
                evs = []
                for name in ("a", "b", "c"):
                    colp, scop = dev_small[name]
                    ns, K = colp.shape
                    v = bits_T[colp.reshape(-1)].reshape(ns, K, B)
                    evs.append(jnp.sum(v * scop[:, :, None], axis=1))
                bad_small = (evs[0] * evs[1]) != evs[2]  # [n_small, B]
                if big_viol is not None:
                    bad_big = big_viol(vals).reshape(B, n_big)
                    comb = jnp.concatenate([bad_small.T, bad_big], axis=1)
                else:
                    comb = bad_small.T
                # back to original row order, instances major
                return jnp.take(comb, inv_d, axis=1).reshape(B * Rt0)

            return violations_split
    if witness_form == "limbs" and Rt0 and _partition:
        part = _classify_trivial_limb_rows(template)
        if part is not None:
            return _build_trivial_limbs_check(template, batch, use_pallas, *part)
    be = get_backend(template.field)
    impl = _PallasAdapter(template.field) if use_pallas else _JnpAdapter(template.field)

    table = list(template.coeff_table)
    try:
        zero_id = table.index(0)
    except ValueError:
        zero_id = len(table)
        table.append(0)
    coeff_limbs_np = be.to_limbs(table)
    # 8-bit digit planes of the coefficient table, limb-major [32, K].
    lo = coeff_limbs_np & np.uint32(0xFF)
    hi = (coeff_limbs_np >> 8) & np.uint32(0xFF)
    coeff_digits_lm = np.stack([lo, hi], axis=-1).reshape(len(table), 32).T.copy()

    mats, pos_of_row, Rtp = _build_shared_ell(template, zero_id)
    Rt = template.num_constraints
    pos_d = jax.device_put(pos_of_row)
    # Per-matrix device-resident index data + precomputed coefficient-digit
    # planes (static gathers folded on host). Only the buffers the chosen
    # path reads are uploaded: the fused paths build their own per-bucket
    # tables and read just "cols"; "cd" feeds the non-fused bits path and
    # "coeffs" the non-fused limbs path (~192 B/slot of dead HBM
    # otherwise).
    _fused_bits = use_pallas and witness_form == "bits" and batch % 128 == 0
    dev = {}
    for name, m in mats.items():
        dev[name] = {"cols": jax.device_put(np.asarray(m.cols))}
        if witness_form == "bits" and not _fused_bits:
            dev[name]["cd"] = jax.device_put(
                coeff_digits_lm[:, np.asarray(m.coeff_ids)].copy()
            )
        elif witness_form == "limbs":
            # the fused-limbs decision needs the ELL layouts and is made
            # below; upload lazily there if the jnp path is taken
            dev[name]["_cids"] = np.asarray(m.coeff_ids)

    def bucket_rowsums_bm(mat: EllMatrix, digits, B):
        """Batch-minor bucket sums: digits [32, total, B] → [32, Rt, B]."""
        parts = []
        for k, start, n_rows in mat.buckets:
            seg = digits[:, start : start + n_rows * k]
            parts.append(
                jnp.sum(seg.reshape(32, n_rows, k, B), axis=2, dtype=jnp.uint32)
            )
        return jnp.concatenate(parts, axis=1)

    # Fused-kernel bits path (TPU): per bucket, mask + row-sum (MXU matmul)
    # + digit reduce run in one Pallas kernel; only the witness gather and
    # the final concat/compare remain in XLA.
    fused = use_pallas and witness_form == "bits" and batch % 128 == 0
    # The semi-reduced + fused-compare pipeline needs p·2^11 to dominate
    # any semi value (see make_mulcmp); all shipped fields qualify.
    semi = template.field.NUM_BITS >= 250
    if fused:
        from .field_pallas import SEMI, make_bits_matvec_bucket, make_mulcmp

        out_form = "semi" if semi else "canonical"
        out_rows = SEMI if semi else 16
        mulcmp = make_mulcmp(template.field) if semi else None

        lo8 = coeff_limbs_np & np.uint32(0xFF)
        hi8 = (coeff_limbs_np >> 8) & np.uint32(0xFF)
        cd_all = np.stack([lo8, hi8], axis=-1).reshape(len(table), 32)
        fused_mats = {}
        for name, m in mats.items():
            entries = []
            for k, start, n_rows in m.buckets:
                cd_b = (
                    cd_all[np.asarray(m.coeff_ids[start : start + n_rows * k])]
                    .reshape(n_rows, k, 32)
                    .transpose(2, 0, 1)
                    .copy()
                )
                entries.append(
                    (
                        k,
                        start,
                        n_rows,
                        make_bits_matvec_bucket(
                            template.field, k, n_rows, batch, out_form=out_form
                        ),
                        jax.device_put(cd_b),
                    )
                )
            fused_mats[name] = entries

        def matvec_bits_fused(name: str, bits_T):
            az_parts = []
            # Barrier: keep XLA from fusing the shared gather into every
            # kernel operand (compile-time blowup on the remote compiler).
            bv_all = jax.lax.optimization_barrier(
                bits_T[dev[name]["cols"]]
            )  # [total, B]
            for k, start, n_rows, kern, cd_b in fused_mats[name]:
                bv = bv_all[start : start + n_rows * k].reshape(n_rows, k, batch)
                az_parts.append(kern(bv, cd_b))  # [out_rows, n_rows, B]
            return jnp.concatenate(az_parts, axis=1)  # [out_rows, Rtp, B]

        def violations_bits_fused(vals):
            if _slot_major:
                B = vals.shape[1]
                bits_T = vals
            else:
                B = vals.shape[0]
                bits_T = vals.T
            az = matvec_bits_fused("a", bits_T).reshape(out_rows, Rtp * B)
            bz = matvec_bits_fused("b", bits_T).reshape(out_rows, Rtp * B)
            cz = matvec_bits_fused("c", bits_T).reshape(out_rows, Rtp * B)
            if semi:
                bad = (mulcmp(az, bz, cz) != 0).reshape(Rtp, B)
            else:
                lhs = impl.mul_lm(az, bz)
                bad = jnp.any(lhs != cz, axis=0).reshape(Rtp, B)
            bad = jnp.take(bad, pos_d, axis=0)
            return bad.T.reshape(B * Rt)

    # Fused-kernel limbs path (TPU): the modmul is folded into static
    # per-entry fold matrices (see make_limbs_matvec_bucket) so the whole
    # gather → modmul → row-sum → reduce runs as MXU matmuls + in-kernel
    # digit reduction. One row of F costs 4 KB per ELL slot — guard total
    # HBM footprint and the per-row-width accumulator bound.
    from .field_pallas import MAX_FUSED_LIMBS_K

    total_slots = sum(int(m.cols.shape[0]) for m in mats.values())
    fused_limbs = (
        use_pallas
        and witness_form == "limbs"
        and batch % 128 == 0
        and Rt > 0
        and all(
            k <= MAX_FUSED_LIMBS_K
            for m in mats.values()
            for (k, _s, _n) in m.buckets
        )
        and total_slots * 4096 < 1.5e9
    )
    if witness_form == "limbs" and not fused_limbs:
        for name in dev:
            dev[name]["coeffs"] = jax.device_put(
                coeff_limbs_np[dev[name].pop("_cids")]
            )
    else:
        for name in dev:
            dev[name].pop("_cids", None)
    if fused_limbs:
        from .field_pallas import (
            SEMI,
            fold_digit_table,
            make_limbs_matvec_bucket,
            make_mulcmp,
        )

        fl_out_form = "semi" if semi else "canonical"
        fl_out_rows = SEMI if semi else 16
        fl_mulcmp = make_mulcmp(template.field) if semi else None

        fd = fold_digit_table(template.field, table)  # [T, 32(j), 32(d)]
        fl_mats = {}
        for name, m in mats.items():
            entries = []
            cids_np = np.asarray(m.coeff_ids)
            for k, start, n_rows in m.buckets:
                cid_b = cids_np[start : start + n_rows * k].reshape(n_rows, k)
                # F[d, r, k·32 + j] = fd[cid[r, k], j, d]
                F = (
                    fd[cid_b]
                    .transpose(3, 0, 1, 2)
                    .reshape(32, n_rows, k * 32)
                    .copy()
                )
                entries.append(
                    (
                        k,
                        start,
                        n_rows,
                        make_limbs_matvec_bucket(
                            template.field, k, n_rows, batch,
                            out_form=fl_out_form,
                        ),
                        jax.device_put(F),
                    )
                )
            fl_mats[name] = entries

        def matvec_limbs_fused(name: str, zd_all):
            # zd_all: [S_t, 32, B] witness digits (batch-minor).
            parts = []
            # Barrier: see matvec_bits_fused.
            zv = jax.lax.optimization_barrier(
                zd_all[dev[name]["cols"]]
            )  # [total, B] row gather
            for k, start, n_rows, kern, F in fl_mats[name]:
                x = zv[start : start + n_rows * k].reshape(
                    n_rows, k * 32, batch
                )
                parts.append(kern(x, F))  # [fl_out_rows, n_rows, B]
            return jnp.concatenate(parts, axis=1)  # [fl_out_rows, Rtp, B]

        def violations_limbs_fused(z3):
            B = z3.shape[0]
            zt = jnp.transpose(z3, (1, 2, 0))  # [S_t, 16, B]
            zd_all = jax.lax.optimization_barrier(
                jnp.stack([zt & 0xFF, (zt >> 8) & 0xFF], axis=2).reshape(
                    zt.shape[0], 32, B
                )
            )
            az = matvec_limbs_fused("a", zd_all).reshape(fl_out_rows, Rtp * B)
            bz = matvec_limbs_fused("b", zd_all).reshape(fl_out_rows, Rtp * B)
            cz = matvec_limbs_fused("c", zd_all).reshape(fl_out_rows, Rtp * B)
            if semi:
                bad = (fl_mulcmp(az, bz, cz) != 0).reshape(Rtp, B)
            else:
                lhs = impl.mul_lm(az, bz)
                bad = jnp.any(lhs != cz, axis=0).reshape(Rtp, B)
            bad = jnp.take(bad, pos_d, axis=0)
            return bad.T.reshape(B * Rt)

    def matvec_bits_raw(name: str, mat: EllMatrix, bits_T):
        # bits_T: [S_t, B] batch-minor, values in {0, 1}. Gathers fetch
        # contiguous B-wide rows with TEMPLATE-level (shared) indices —
        # the per-index gather cost does not multiply by the batch.
        # Product digits are masked coefficient digits (no modmul).
        B = bits_T.shape[1]
        bv = bits_T[dev[name]["cols"]]  # [total, B] row gather
        cd = dev[name]["cd"]  # [32, total] (precomputed on host)
        digits = cd[:, :, None] * bv[None]  # [32, total, B] (fused w/ sums)
        return bucket_rowsums_bm(mat, digits, B)  # [32, Rtp, B] (unreduced)

    def bucket_rowsums_lm(mat: EllMatrix, digits_lm):
        parts = []
        B = digits_lm.shape[1]
        for k, start, n_rows in mat.buckets:
            seg = digits_lm[:, :, start : start + n_rows * k]
            parts.append(
                jnp.sum(seg.reshape(32, B, n_rows, k), axis=3, dtype=jnp.uint32)
            )
        return jnp.concatenate(parts, axis=2)

    def matvec_limbs(name: str, mat: EllMatrix, z3):
        B = z3.shape[0]
        total = mat.cols.shape[0]
        zv = z3[:, dev[name]["cols"]]  # [B, total, 16]
        cv = jnp.broadcast_to(dev[name]["coeffs"][None], (B, total, 16))
        digits = impl.mul_to_digits(
            zv.reshape(B * total, 16), cv.reshape(B * total, 16)
        )  # [B·total, 32]
        digits_lm = digits.T.reshape(32, B, total)
        rs = bucket_rowsums_lm(mat, digits_lm)
        return impl.reduce_digits_lm(rs.reshape(32, B * Rtp))

    def violations_bits(vals):
        if _slot_major:
            B = vals.shape[1]
            bits_T = vals
        else:
            B = vals.shape[0]
            bits_T = vals.T  # [S_t, B] — one relayout, then everything
            # is batch-minor with shared-index row gathers.
        az, bz, cz = (
            impl.reduce_digits_lm(
                matvec_bits_raw(n, mats[n], bits_T).reshape(32, Rtp * B)
            )
            for n in ("a", "b", "c")
        )
        lhs = impl.mul_lm(az, bz)
        bad = jnp.any(lhs != cz, axis=0).reshape(Rtp, B)  # padded bucket order
        bad = jnp.take(bad, pos_d, axis=0)  # original row order [Rt, B]
        return bad.T.reshape(B * Rt)  # instance-major

    def violations_limbs(z3):
        B = z3.shape[0]
        az = matvec_limbs("a", mats["a"], z3)  # [16, B·Rt] bucket order
        bz = matvec_limbs("b", mats["b"], z3)
        cz = matvec_limbs("c", mats["c"], z3)
        lhs = impl.mul_lm(az, bz)
        bad2 = jnp.any(lhs != cz, axis=0).reshape(B, Rtp)
        return jnp.take(bad2, pos_d, axis=1).reshape(B * Rt)

    if witness_form == "bits":
        return violations_bits_fused if fused else violations_bits
    return violations_limbs_fused if fused_limbs else violations_limbs


class TemplatedSatisfier:
    """Satisfiability checker for B independent copies of one template
    R1CS — the compiled form of the reference's parallel-synthesis seam
    (constraint_system.rs:138-148): the global system is block-diagonal,
    so every gather uses only the template's (tiny) index sets, shared
    across the batch. This sidesteps the TPU's per-index gather cost
    (~30 ns/index measured on v5e), which dominates the generic path.

    z layout: [B, S_t, 16] where S_t = template num_slots and slot 0 of
    every instance is ONE (templates are input-free beyond ONE, like
    WitnessCS children before an extend, witness_cs.rs:159-161).

    witness_form "bits"/"bits_packed" check a BIT-VALUED witness domain
    only (see build_templated_check's domain contract): non-bit field
    values in bit slots — the reference's set-to-random mutation kills
    (num.rs:707-713) — need witness_form="limbs" or the host oracle."""

    def __init__(
        self,
        template: R1CS,
        batch: int | None = None,
        use_pallas: bool | None = None,
        witness_form: str | None = None,
        config=None,
        field_slots=None,
    ):
        if config is not None:
            batch = config.batch if batch is None else batch
            use_pallas = config.use_pallas if use_pallas is None else use_pallas
            witness_form = (
                config.witness_form if witness_form is None else witness_form
            )
        assert batch is not None, "batch required (directly or via config)"
        witness_form = witness_form or "limbs"
        if use_pallas is None:
            use_pallas = jax.default_backend() == "tpu"
        self.r1cs = template
        self.batch = batch
        self.witness_form = witness_form
        self.backend = get_backend(template.field)
        violations = build_templated_check(
            template, batch, use_pallas, witness_form,
            field_slots=field_slots,
        )
        # mixed form takes the (vals, flimbs) pair the witness program
        # produces; every other form takes one z array.
        self._n_args = 2 if witness_form == "mixed" else 1

        @jax.jit
        def check(*z):
            bad = violations(*z)
            return jnp.any(bad), jnp.argmax(bad)

        self._check = check
        self.num_constraints_total = batch * template.num_constraints

    def z_from_instances(self, z3: jnp.ndarray) -> jnp.ndarray:
        return jnp.asarray(z3, jnp.uint32)

    def _args(self, z):
        if self._n_args == 2:
            assert isinstance(z, tuple) and len(z) == 2, (
                "mixed form takes z = (vals, flimbs)"
            )
            return z
        return (z,)

    def is_satisfied(self, z3) -> bool:
        any_bad, _ = self._check(*self._args(z3))
        return not bool(any_bad)

    def which_is_unsatisfied(self, z3) -> Optional[str]:
        any_bad, first = self._check(*self._args(z3))
        if not bool(any_bad):
            return None
        flat = int(first)
        inst, row = divmod(flat, self.r1cs.num_constraints)
        name = (
            self.r1cs.names[row]
            if self.r1cs.names is not None
            else f"constraint #{row}"
        )
        return f"instance {inst}: {name}"
