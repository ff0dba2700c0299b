"""Pallas TPU kernels for the ADC hot loop.

Why not gathers: XLA lowers ``LUT[code]`` lookups to serialized gathers —
measured ~417 ms for one full 3M×12 ADC scan on v5e. The TPU-native shape is
to *matmul the gather away*: a LUT lookup over k entries is a one-hot row
times the (k, B) LUT matrix, so each code tile becomes

    onehot(codes_j) : (k, T) int/bf16   (VPU compare against an iota)
    acc (B, T)     += LUT_j (B, k) @ onehot : MXU

Codes are stored transposed ``(m, N)`` so each subspace's row is contiguous
in lanes, the one-hot builds as a (k, T) tile (k on sublanes, rows on
lanes), and the accumulator comes out directly in ``(B, N)`` layout for the
downstream ``approx_min_k``. 36 MB of codes is the only HBM read; the whole
scan is VPU/MXU-bound instead of gather-bound.

Parity: this computes exactly ``Σ_j luts[b, j, codes[i, j]]`` — the ADC sum
of ``pq_search`` (freddy.c:117-132) / ``computePQDistanceInt16``
(index_utils.c:1126-1133) — validated bit-close against the XLA gather path
in tests.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array


def _group_size(m: int, k: int) -> int:
    """Subspaces fused per one-hot matmul: small-k codebooks (k < 128,
    e.g. the 4-bit Quick-ADC regime or IVPQ's k=32 fine codebook) leave the
    MXU's 128-deep contraction mostly idle, so ``g = 128 // k`` subspaces
    stack into one (g·k, block_n) one-hot with g ones per column — the ADC
    sum over the group in a single full-depth matmul (g× fewer, g× deeper
    matmuls; the compare count is unchanged)."""
    if k >= 128 or 128 % k != 0:
        return 1
    return min(128 // k, m)


def _group_onehot(codes, jg: int, g: int, k: int, block_n: int,
                  dtype=jnp.bfloat16):
    """One-hot for subspace group ``jg``: rows ``j·k + codes[j]`` are 1 for
    each of the group's g subspaces → (g·k, block_n) in ``dtype``.

    ``codes`` is the already-loaded, int32-widened (m, block_n) tile —
    codes stream from HBM in their narrow storage dtype (uint8/int16) and
    widen once in VMEM, so the scan's HBM traffic is the true code bytes,
    not a 4×-inflated int32 copy."""
    cj = codes[jg * g:(jg + 1) * g, :]                        # (g, block_n)
    off = lax.broadcasted_iota(jnp.int32, (g, block_n), 0) * k
    target = cj + off                                         # (g, block_n)
    # row r of the fused one-hot compares against target[r // k]: a
    # lane-preserving broadcast-reshape expands the targets k-fold.
    expanded = jnp.broadcast_to(target[:, None, :],
                                (g, k, block_n)).reshape(g * k, block_n)
    iota = lax.broadcasted_iota(jnp.int32, (g * k, block_n), 0)
    return (iota == expanded).astype(dtype)


def _quantize_luts_int8(luts: Array) -> tuple[Array, Array]:
    """Per-query symmetric int8 quantization of ADC LUTs.

    The scale is GLOBAL per query (max over all m·k entries / 127): every
    subspace's int32 partial sums then share one scale, so the kernel can
    accumulate the whole ADC sum in int32 across subspace matmuls on the
    MXU's int8 path (measured 1.22x the bf16 ceiling on this chip,
    reports/ROOFLINE.md) and apply ONE f32 fixup at the end.
    In-row ordering is exactly preserved up to the quantization step
    (≤ max/254 per lookup, ~0.3% of a typical distance at m=12) — far
    below PQ quantization error (recall parity asserted in tests).

    Returns (int8 luts in [-127, 127], per-query scale (B,) f32 such that
    ``dist ≈ int_sum * scale``). ADC LUTs are nonnegative squared
    distances so the effective range is [0, 127]; the symmetric max-abs
    scale keeps the transform correct for any signed caller too.
    """
    lf = luts.astype(jnp.float32)
    s = jnp.maximum(jnp.max(jnp.abs(lf), axis=(1, 2)), 1e-20)  # (B,)
    q = jnp.clip(jnp.rint(lf * (127.0 / s)[:, None, None]), -127, 127)
    return q.astype(jnp.int8), s / 127.0


def _adc_kernel(codes_ref, luts_ref, out_ref, *, m: int, k: int, g: int,
                block_n: int):
    """One grid step: distances for a ``(B, block_n)`` output tile.

    codes_ref: (m, block_n) integer codes (narrow storage dtype, transposed
               layout; m padded to a multiple of g with zero-LUT subspaces)
    luts_ref:  (m//g, B, g·k) bf16 (group-fused layout)
    out_ref:   (B, block_n) f32
    """
    codes = codes_ref[:].astype(jnp.int32)
    acc = jnp.zeros(out_ref.shape, jnp.float32)
    for jg in range(m // g):
        onehot = _group_onehot(codes, jg, g, k, block_n)
        acc += jnp.dot(luts_ref[jg], onehot,
                       preferred_element_type=jnp.float32)    # (B, block_n)
    out_ref[:] = acc


def _adc_kernel_i8(codes_ref, luts_ref, scale_ref, out_ref, *, m: int,
                   k: int, g: int, block_n: int):
    """int8 twin of :func:`_adc_kernel`: int8 one-hot × int8 LUT on the
    MXU's int8 path, int32 accumulation across all subspace
    groups (exact — max sum is m·127, far below int32), ONE f32 scale
    fixup at the end.

    luts_ref:  (m//g, B, g·k) int8 in [0, 127] (see _quantize_luts_int8)
    scale_ref: (B, 1) f32 per-query dequantization scale
    """
    codes = codes_ref[:].astype(jnp.int32)
    acc = jnp.zeros(out_ref.shape, jnp.int32)
    for jg in range(m // g):
        onehot = _group_onehot(codes, jg, g, k, block_n, dtype=jnp.int8)
        acc += jnp.dot(luts_ref[jg], onehot,
                       preferred_element_type=jnp.int32)      # (B, block_n)
    out_ref[:] = acc.astype(jnp.float32) * scale_ref[:]


def _prep_adc_inputs(luts: Array, codes_t: Array, pad_b: int,
                     g: int, pad_m: int, lut_dtype: str):
    """Shared input prep for the dense/binned ADC wrappers: quantize or
    downcast LUTs, zero-pad subspaces to the group multiple, pad the query
    batch, and fold to the group-fused (m/g, B, g·k) layout. Returns
    (luts_in, codes_in, scale (B+pad_b, 1) f32 or None)."""
    B, m, k = luts.shape
    scale = None
    if lut_dtype == "int8":
        luts_in, s = _quantize_luts_int8(luts)
        scale = jnp.pad(s, (0, pad_b))[:, None] if pad_b else s[:, None]
    else:
        # bf16 LUT halves MXU cost; distances are ~unit scale so the
        # mantissa loss is far below PQ quantization error.
        luts_in = luts.astype(jnp.bfloat16)
    # keep the storage dtype (uint8/int16) — the kernel widens in VMEM,
    # so HBM streams the true code bytes.
    codes_in = (codes_t if jnp.issubdtype(codes_t.dtype, jnp.integer)
                else codes_t.astype(jnp.int32))
    if pad_m:
        # zero-LUT padding subspaces contribute nothing to the ADC sum.
        luts_in = jnp.pad(luts_in, ((0, 0), (0, pad_m), (0, 0)))
        codes_in = jnp.pad(codes_in, ((0, pad_m), (0, 0)))
    mp = m + pad_m
    if pad_b:
        luts_in = jnp.pad(luts_in, ((0, pad_b), (0, 0), (0, 0)))
    # group-fused LUT layout: (B, m, k) → (m/g, B, g·k).
    luts_in = jnp.moveaxis(
        luts_in.reshape(B + pad_b, mp // g, g * k), 0, 1)
    return luts_in, codes_in, scale


@functools.partial(jax.jit, static_argnames=("block_n", "block_b",
                                             "lut_dtype", "interpret"))
def adc_scan_pallas(luts: Array, codes_t: Array, *, block_n: int = 2048,
                    block_b: int = 128, lut_dtype: str = "bf16",
                    interpret: bool = False) -> Array:
    """Dense ADC distances ``(B, m, k) × (m, N) → (B, N)`` float32.

    ``codes_t`` is the transposed code table (subspace-major). N must be a
    multiple of ``block_n`` (pad with any code value; mask downstream). The
    query batch is tiled by ``block_b`` on a second grid axis so VMEM stays
    bounded at any B (the accumulator is block_b × block_n f32).

    ``lut_dtype``: "bf16" (default) or "int8" — the int8 path quantizes
    LUTs per query and runs the matmuls on the MXU's int8 path
    (ordering error ≤ max/254 per lookup; see _quantize_luts_int8).
    """
    B, m, k = luts.shape
    n = codes_t.shape[1]
    if n % block_n != 0:
        raise ValueError(f"N={n} not a multiple of block_n={block_n}")
    bb = min(block_b, _round_up(B, 8))
    pad_b = (-B) % bb
    g = _group_size(m, k)
    pad_m = (-m) % g
    mp = m + pad_m
    luts_in, codes_in, scale = _prep_adc_inputs(luts, codes_t, pad_b,
                                                g, pad_m, lut_dtype)

    grid = ((B + pad_b) // bb, n // block_n)
    in_specs = [
        pl.BlockSpec((mp, block_n), lambda b, i: (0, i),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((mp // g, bb, g * k), lambda b, i: (0, b, 0),
                     memory_space=pltpu.VMEM),
    ]
    out_spec = pl.BlockSpec((bb, block_n), lambda b, i: (b, i),
                            memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((B + pad_b, n), jnp.float32)
    if lut_dtype == "int8":
        in_specs.append(pl.BlockSpec((bb, 1), lambda b, i: (b, 0),
                                     memory_space=pltpu.VMEM))
        out = pl.pallas_call(
            functools.partial(_adc_kernel_i8, m=mp, k=k, g=g,
                              block_n=block_n),
            grid=grid, in_specs=in_specs, out_specs=out_spec,
            out_shape=out_shape, interpret=interpret,
        )(codes_in, luts_in, scale)
    else:
        out = pl.pallas_call(
            functools.partial(_adc_kernel, m=mp, k=k, g=g, block_n=block_n),
            grid=grid, in_specs=in_specs, out_specs=out_spec,
            out_shape=out_shape, interpret=interpret,
        )(codes_in, luts_in)
    return out[:B] if pad_b else out


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _adc_binned_kernel(codes_ref, luts_ref, mins_ref, args_ref, *, m: int,
                       k: int, g: int, block_n: int, bins: int):
    """ADC + fused binned min-reduction: per (B, block_n) tile emit only the
    per-bin minimum and its argmin — (B, bins) instead of (B, block_n).

    Writing the full (B, N) distance matrix to HBM and re-reading it for
    top-k costs ~0.47 ms/query at 256×3M (6 GB of f32 round-trip at the
    52 GB/s stream ceiling); reducing in VMEM cuts the kernel output
    ``block_n/bins``-fold and makes the scan MXU-bound.

    The argmin rides FREE inside the min: ADC distances are ≥ 0, and IEEE
    f32 bit patterns of non-negative floats order monotonically as int32 —
    so the sub-bin index packs into the low mantissa bits (value floor-
    perturbed by ≤ 2⁻¹⁸ relative, far below PQ quantization error) and ONE
    integer min reduction yields both the bin minimum and its position
    (round 2 measured the separate in-kernel argmin at ~2× the whole
    kernel's remaining cost — it was why the dense variant won then).
    """
    codes = codes_ref[:].astype(jnp.int32)
    acc = jnp.zeros((luts_ref.shape[1], block_n), jnp.float32)
    for jg in range(m // g):
        onehot = _group_onehot(codes, jg, g, k, block_n)
        acc += jnp.dot(luts_ref[jg], onehot,
                       preferred_element_type=jnp.float32)
    bb = acc.shape[0]
    # Lane-preserving reshape (last dim stays the 128-lane tile): bins are
    # STRIDED — bin j holds rows {j, j+bins, j+2·bins, …} of the tile.
    # Mosaic rejects a lane-splitting reshape, and strided bins are just as
    # valid for an approximate top-k partition.
    sub = block_n // bins
    sub_pow = 1 << (sub - 1).bit_length()        # index field width (pow2)
    d = jnp.maximum(acc, 0.0)                    # kill any -0.0
    bits = lax.bitcast_convert_type(d, jnp.int32).reshape(bb, sub, bins)
    sub_idx = lax.broadcasted_iota(jnp.int32, (bb, sub, bins), 1)
    packed = jnp.bitwise_or(
        jnp.bitwise_and(bits, ~(sub_pow - 1)), sub_idx)
    best = jnp.min(packed, axis=1)               # (bb, bins)
    mins_ref[:] = lax.bitcast_convert_type(
        jnp.bitwise_and(best, ~(sub_pow - 1)), jnp.float32)
    args_ref[:] = jnp.bitwise_and(best, sub_pow - 1)


def _adc_binned_kernel_i8(codes_ref, luts_ref, mins_ref, args_ref, *,
                          m: int, k: int, g: int, block_n: int, bins: int):
    """int8 twin of :func:`_adc_binned_kernel`.

    The int32 ADC sums are small (≤ m·127 ≈ 2¹⁴), so the sub-bin argmin
    packs EXACTLY: key = sum·sub_pow + idx loses no distance bits (the f32
    variant floor-perturbs the low mantissa). mins_ref is emitted as the
    raw int32 sum — the wrapper applies the per-query scale on the tiny
    (B, n_tiles·bins) output rather than threading scale into the kernel.
    """
    codes = codes_ref[:].astype(jnp.int32)
    acc = jnp.zeros((luts_ref.shape[1], block_n), jnp.int32)
    for jg in range(m // g):
        onehot = _group_onehot(codes, jg, g, k, block_n, dtype=jnp.int8)
        acc += jnp.dot(luts_ref[jg], onehot,
                       preferred_element_type=jnp.int32)
    bb = acc.shape[0]
    sub = block_n // bins
    sub_pow = 1 << (sub - 1).bit_length()
    shift = sub_pow.bit_length() - 1             # sub_pow is a power of 2
    packed = (lax.shift_left(acc.reshape(bb, sub, bins), shift)
              + lax.broadcasted_iota(jnp.int32, (bb, sub, bins), 1))
    best = jnp.min(packed, axis=1)               # (bb, bins)
    # arithmetic right shift == floor division by the pow2 field width
    mins_ref[:] = lax.shift_right_arithmetic(best, shift)
    args_ref[:] = jnp.bitwise_and(best, sub_pow - 1)


@functools.partial(jax.jit, static_argnames=("block_n", "block_b", "bins",
                                             "lut_dtype", "interpret"))
def adc_scan_binned_pallas(luts: Array, codes_t: Array, *,
                           block_n: int = 2048, block_b: int = 128,
                           bins: int = 128, lut_dtype: str = "bf16",
                           interpret: bool = False
                           ) -> tuple[Array, Array]:
    """Binned ADC scan → (mins (B, n_tiles·bins), global ids).

    One candidate survives per strided bin of ``block_n/bins`` rows — the
    same partial-reduce shape as ``approx_min_k`` but fused into the ADC
    kernel, so the full (B, N) distance matrix never touches HBM.
    ``lut_dtype="int8"`` selects the int8 MXU path (per-query
    quantized LUTs, int32 sums, f32 scale applied to the tiny binned
    output).
    """
    B, m, k = luts.shape
    n = codes_t.shape[1]
    if n % block_n != 0:
        raise ValueError(f"N={n} not a multiple of block_n={block_n}")
    bb = min(block_b, _round_up(B, 8))
    pad_b = (-B) % bb
    g = _group_size(m, k)
    pad_m = (-m) % g
    mp = m + pad_m
    luts_in, codes_in, scale = _prep_adc_inputs(luts, codes_t, pad_b,
                                                g, pad_m, lut_dtype)
    n_tiles = n // block_n

    if bins % 128 != 0:
        raise ValueError("bins must be a multiple of 128 (output lane tile)")
    grid = ((B + pad_b) // bb, n_tiles)
    int8 = lut_dtype == "int8"
    kern = _adc_binned_kernel_i8 if int8 else _adc_binned_kernel
    mins, args = pl.pallas_call(
        functools.partial(kern, m=mp, k=k, g=g,
                          block_n=block_n, bins=bins),
        grid=grid,
        in_specs=[
            pl.BlockSpec((mp, block_n), lambda b, i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((mp // g, bb, g * k), lambda b, i: (0, b, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((bb, bins), lambda b, i: (b, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bb, bins), lambda b, i: (b, i),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B + pad_b, n_tiles * bins),
                                 jnp.int32 if int8 else jnp.float32),
            jax.ShapeDtypeStruct((B + pad_b, n_tiles * bins), jnp.int32),
        ),
        interpret=interpret,
    )(codes_in, luts_in)
    if int8:
        mins = mins[:B].astype(jnp.float32) * scale[:B]
    else:
        mins = mins[:B]
    # strided bins: global id = tile·block_n + arg·bins + bin_index.
    base = (jnp.arange(n_tiles, dtype=jnp.int32)[:, None] * block_n
            + jnp.arange(bins, dtype=jnp.int32)[None, :]
            ).reshape(1, n_tiles * bins)
    return mins, args[:B] * bins + base


def _fused_exact_kernel(q_ref, tab_ref, norm_ref, mins_ref, args_ref, *,
                        bb: int, block_n: int, bins: int):
    """Fused brute-force scan tile: matmul + strided-bin min/argmin.

    q_ref:    (B, d) bf16 — full query batch resident in VMEM
    tab_ref:  (1, d, block_n) bf16 — one contiguous pre-tiled table block
    norm_ref: (1, block_n) f32 — row norms tile
    mins_ref: (B, bins) f32 — per-bin min of (norm − 2·q·v)
    args_ref: (B, bins) int32 — position of the min within its bin

    The query batch loops in bb-row chunks inside the kernel so each table
    tile is read from HBM exactly once regardless of B — the (B, N)
    distance matrix never exists outside VMEM. Scores are ``norm − 2·q·v``
    (the per-query ‖q‖² shifts every bin equally; callers add it back).
    """
    B = q_ref.shape[0]
    sub = block_n // bins

    def body(i, _):
        qs = q_ref[pl.ds(i * bb, bb), :]
        s = jnp.dot(qs, tab_ref[0], preferred_element_type=jnp.float32)
        dist = norm_ref[0, :][None, :] - 2.0 * s              # (bb, block_n)
        binned = dist.reshape(bb, sub, bins)                  # strided bins
        mins_ref[pl.ds(i * bb, bb), :] = jnp.min(binned, axis=1)
        args_ref[pl.ds(i * bb, bb), :] = jnp.argmin(
            binned, axis=1).astype(jnp.int32)
        return 0

    lax.fori_loop(0, B // bb, body, 0)


@functools.partial(jax.jit, static_argnames=("block_b", "bins",
                                             "interpret"))
def fused_exact_scan_pallas(queries: Array, table_tiled: Array,
                            norms: Array, *,
                            block_b: int = 128,
                            bins: int = 128, interpret: bool = False
                            ) -> tuple[Array, Array]:
    """Brute-force binned scan over a pre-tiled table
    ``(B, d) × (n_tiles, d, block_n) → (B, n_tiles·bins)``
    (shifted scores ``norm − 2·q·v`` and global argmin ids per bin).

    The production exact path: one HBM pass over the bf16 table, matmul on
    the MXU, reduction in VMEM. The table is PRE-TILED into contiguous
    (d, block_n) blocks (see :func:`tile_table`) — a flat transposed layout
    makes every tile 300 small strided DMAs and caps streaming at ~45 GB/s.
    Callers top-k the small binned output and add ‖q‖² back to recover true
    squared distances.
    """
    B, d = queries.shape
    n_tiles, d2, block_n = table_tiled.shape
    if d2 != d:
        raise ValueError(f"query dim {d} != table dim {d2}")
    n = n_tiles * block_n
    bb = min(block_b, _round_up(B, 8))
    pad_b = (-B) % bb
    q_in = queries.astype(table_tiled.dtype)
    if pad_b:
        q_in = jnp.pad(q_in, ((0, pad_b), (0, 0)))

    mins, args = pl.pallas_call(
        functools.partial(_fused_exact_kernel, bb=bb, block_n=block_n,
                          bins=bins),
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((B + pad_b, d), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d, block_n), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_n), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((B + pad_b, bins), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B + pad_b, bins), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B + pad_b, n_tiles * bins), jnp.float32),
            jax.ShapeDtypeStruct((B + pad_b, n_tiles * bins), jnp.int32),
        ),
        interpret=interpret,
    )(q_in, table_tiled, norms.reshape(1, n).astype(jnp.float32))
    base = (jnp.arange(n_tiles, dtype=jnp.int32)[:, None] * block_n
            + jnp.arange(bins, dtype=jnp.int32)[None, :]
            ).reshape(1, n_tiles * bins)
    return mins[:B], args[:B] * bins + base


def tile_table(vectors: Array, *, block_n: int = 8192,
               dtype=jnp.bfloat16) -> tuple[Array, Array, int]:
    """Pre-tile an ``(N, d)`` table for the fused scan: returns
    ``(table_tiled (n_tiles, d, block_n), norms (N_pad,), valid_n)``.
    Pad rows get +inf norms so their shifted scores can never win a bin."""
    n, d = vectors.shape
    pad = (-n) % block_n
    v = vectors.astype(jnp.float32)
    norms = jnp.sum(v * v, axis=-1)
    if pad:
        vpad = jnp.pad(vectors, ((0, pad), (0, 0)))
        norms = jnp.pad(norms, (0, pad), constant_values=jnp.inf)
    else:
        vpad = vectors
    tiled = jnp.moveaxis(
        vpad.astype(dtype).T.reshape(d, (n + pad) // block_n, block_n),
        1, 0)
    return tiled, norms, n


@functools.partial(jax.jit, static_argnames=("k", "valid_n", "bins",
                                             "interpret"))
def fused_exact_top_k(queries: Array, table_t: Array, norms: Array, k: int,
                      *, valid_n: int | None = None, bins: int = 128,
                      interpret: bool = False) -> tuple[Array, Array]:
    """Fused brute-force approximate top-k → (squared dists, ids).

    One survivor per strided bin of ``block_n/bins`` rows (same reduction
    density as ``approx_max_k``), but the distance matrix never leaves
    VMEM.
    """
    mins, ids = fused_exact_scan_pallas(queries, table_t, norms,
                                        bins=bins, interpret=interpret)
    if valid_n is not None and valid_n < (table_t.shape[0]
                                          * table_t.shape[2]):
        mins = jnp.where(ids < valid_n, mins, jnp.inf)
    neg, pos = lax.top_k(-mins, k)
    sel_ids = jnp.take_along_axis(ids, pos, axis=-1)
    qf = queries.astype(jnp.float32)
    qq = jnp.sum(qf * qf, axis=-1, keepdims=True)
    dists = jnp.maximum(-neg + qq, 0.0)
    return dists, sel_ids


def _budget_adc_kernel(tiles_ref, codes_ref, rt_ref, luts_ref, out_ref, *,
                       m: int, k: int, g: int, block_t: int):
    """One grid step: ADC distances for one (query, tile-slot) pair.

    The grid is (B/8, P, 8): eight queries share one (8, block_t) output
    block (Mosaic requires sublane-divisible output blocks); the inner
    axis walks the 8 queries, each writing its own row.

    codes_ref: (m, block_t) integer codes — the tile selected by this slot's tile id
    rt_ref:    (1, block_t) f32 — query-independent row term (+inf padding)
    luts_ref:  (1, m//g, g·k) bf16 — this query's group-fused LUT
    out_ref:   (8, block_t) f32 — lut-sum + rowterm, one row per query
    """
    qs = pl.program_id(2)
    codes = codes_ref[:].astype(jnp.int32)
    acc = jnp.zeros((1, block_t), jnp.float32)
    for jg in range(m // g):
        onehot = _group_onehot(codes, jg, g, k, block_t)
        acc += jnp.dot(luts_ref[0, jg][None, :], onehot,
                       preferred_element_type=jnp.float32)
    out_ref[pl.ds(qs, 1), :] = acc + rt_ref[:]


@functools.partial(jax.jit, static_argnames=("block_t", "interpret"))
def budget_adc_pallas(luts: Array, codes_t: Array, rowterm: Array,
                      tiles: Array, *, block_t: int,
                      interpret: bool = False) -> Array:
    """Budgeted tile-gather ADC: each query scans exactly P tiles of
    ``block_t`` code rows, chosen per query → ``(B, P·block_t)`` float32.

    This is the selectivity-proportional probe primitive behind IVFADC and
    the IVPQ join: DMA + compute cost is ``B·P`` tiles — the actual probed
    rows — instead of ``w × max_cell`` padding (the reference achieves the
    same effect by fetching only probed cells' rows through SPI,
    freddy.c:325-338 / ivpq_search_in.c:355-401).

    luts:    (B, m, k) per-query LUTs (cell-independent)
    codes_t: (m, NA) integer codes (narrow storage dtype streams
             narrow), NA a multiple of block_t, CELL-ALIGNED: each
             cell's rows padded to whole tiles; one trailing all-padding
             "inf tile" absorbs unused slots
    rowterm: (NA,) f32 additive per-row term, +inf on padding rows (this is
             what masks both pad rows and unused slots)
    tiles:   (B, P) int32 tile ids (scalar-prefetched; unused slots point
             at the inf tile)
    """
    B, m, k = luts.shape
    na = codes_t.shape[1]
    if na % block_t != 0:
        raise ValueError(f"NA={na} not a multiple of block_t={block_t}")
    P = tiles.shape[1]
    inf_tile = na // block_t - 1
    pad_b = (-B) % 8
    grp = _group_size(m, k)
    pad_m = (-m) % grp
    luts_in = luts.astype(jnp.bfloat16)
    # keep the storage dtype (uint8/int16) — the kernel widens in VMEM,
    # so HBM streams the true code bytes.
    codes_in = (codes_t if jnp.issubdtype(codes_t.dtype, jnp.integer)
                else codes_t.astype(jnp.int32))
    if pad_m:
        luts_in = jnp.pad(luts_in, ((0, 0), (0, pad_m), (0, 0)))
        codes_in = jnp.pad(codes_in, ((0, pad_m), (0, 0)))
    mp = m + pad_m
    tiles_in = tiles.astype(jnp.int32)
    if pad_b:
        luts_in = jnp.pad(luts_in, ((0, pad_b), (0, 0), (0, 0)))
        tiles_in = jnp.pad(tiles_in, ((0, pad_b), (0, 0)),
                           constant_values=inf_tile)
    luts_in = luts_in.reshape(B + pad_b, mp // grp, grp * k)
    b8 = (B + pad_b) // 8
    rt = rowterm.reshape(1, na).astype(jnp.float32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b8, P, 8),
        in_specs=[
            pl.BlockSpec((mp, block_t),
                         lambda g, p, q, t: (0, t[g * 8 + q, p])),
            pl.BlockSpec((1, block_t),
                         lambda g, p, q, t: (0, t[g * 8 + q, p])),
            pl.BlockSpec((1, mp // grp, grp * k),
                         lambda g, p, q, t: (g * 8 + q, 0, 0)),
        ],
        out_specs=pl.BlockSpec((8, block_t), lambda g, p, q, t: (g, p)),
    )
    out = pl.pallas_call(
        functools.partial(_budget_adc_kernel, m=mp, k=k, g=grp,
                          block_t=block_t),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B + pad_b, P * block_t),
                                       jnp.float32),
        interpret=interpret,
    )(tiles_in, codes_in, rt, luts_in)
    return out[:B] if pad_b else out


def _budget_exact_kernel(tiles_ref, vecs_ref, norm_ref, q_ref, out_ref, *,
                         block_t: int):
    """One grid step: shifted exact scores ``norm − 2·q·v`` for one
    (query, tile-slot) pair (same grid layout as ``_budget_adc_kernel``).

    vecs_ref: (d_pad, block_t) bf16 — raw vector tile (transposed)
    norm_ref: (1, block_t) f32 — ‖v‖² (+inf padding)
    q_ref:    (8, d_pad) bf16 — this query group (row qs is current)
    out_ref:  (8, block_t) f32
    """
    qs = pl.program_id(2)
    # dynamic sublane loads are not provably aligned for Mosaic — select
    # the current query row with a masked reduction instead.
    rows = q_ref[:]                                          # (8, d_pad)
    sel = (lax.broadcasted_iota(jnp.int32, rows.shape, 0) == qs)
    q = jnp.sum(jnp.where(sel, rows, 0), axis=0,
                keepdims=True).astype(rows.dtype)            # (1, d_pad)
    s = jnp.dot(q, vecs_ref[:], preferred_element_type=jnp.float32)
    out_ref[pl.ds(qs, 1), :] = norm_ref[:] - 2.0 * s


@functools.partial(jax.jit, static_argnames=("block_t", "interpret"))
def budget_exact_pallas(queries: Array, vecs_t: Array, rownorm: Array,
                        tiles: Array, *, block_t: int,
                        interpret: bool = False) -> Array:
    """Budgeted tile-gather EXACT distances: each query scans its P
    selected tiles of raw vectors → ``(B, P·block_t)`` shifted scores
    ``‖v‖² − 2·q·v`` (add ‖q‖² back for squared L2; +inf marks padding).

    The selectivity-proportional twin of the IVPQ join's EXACT_CALC method
    (the reference fetches raw vectors only for rows of probed cells,
    ivpq_search_in.c:381-395 method 1).
    """
    B, d = queries.shape
    na = vecs_t.shape[1]
    if na % block_t != 0:
        raise ValueError(f"NA={na} not a multiple of block_t={block_t}")
    P = tiles.shape[1]
    inf_tile = na // block_t - 1
    pad_b = (-B) % 8
    pad_d = (-d) % 128                      # lane-align the contraction dim
    q_in = queries.astype(jnp.bfloat16)
    tiles_in = tiles.astype(jnp.int32)
    vecs_in = vecs_t.astype(jnp.bfloat16)
    if pad_b or pad_d:
        q_in = jnp.pad(q_in, ((0, pad_b), (0, pad_d)))
        tiles_in = jnp.pad(tiles_in, ((0, pad_b), (0, 0)),
                           constant_values=inf_tile)
        vecs_in = jnp.pad(vecs_in, ((0, pad_d), (0, 0)))
    b8 = (B + pad_b) // 8
    d_pad = d + pad_d
    nrm = rownorm.reshape(1, na).astype(jnp.float32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b8, P, 8),
        in_specs=[
            pl.BlockSpec((d_pad, block_t),
                         lambda g, p, q, t: (0, t[g * 8 + q, p])),
            pl.BlockSpec((1, block_t),
                         lambda g, p, q, t: (0, t[g * 8 + q, p])),
            pl.BlockSpec((8, d_pad), lambda g, p, q, t: (g, 0)),
        ],
        out_specs=pl.BlockSpec((8, block_t), lambda g, p, q, t: (g, p)),
    )
    out = pl.pallas_call(
        functools.partial(_budget_exact_kernel, block_t=block_t),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B + pad_b, P * block_t),
                                       jnp.float32),
        interpret=interpret,
    )(tiles_in, vecs_in, nrm, q_in)
    return out[:B] if pad_b else out


def _group_probe_layout(tiles: Array, n_queries: int, p: int,
                        groups: int, inf_tile: int, rows: int = 8):
    """Regroup (query, tile-slot) pairs BY TILE into 8-query blocks.

    The per-query budget kernels run ONE query row per program: the
    one-hot is rebuilt for every (query, tile) pair and the matmul fills
    1/8 sublanes. Queries probing the SAME tile can share both — this
    computes, with static shapes, the sorted-run grouping:

      qidx  (groups, rows) int32 — query index per slot (n_queries = dummy)
      tog   (groups,)   int32 — tile id per group (inf_tile for padding)
      row   (B·P,)      int32 — grouped-row index of each original flat
                                (query-major) pair, for reassembly

    ``groups`` must be ≥ ceil(B·P/rows) + number of distinct tile values
    (each run of equal tiles wastes at most one partial block); callers
    bound distinct tiles by the table's total tile count. ``rows`` is the
    queries-per-group block height (8 = min sublane tile; larger groups
    fill the MXU further when probe runs are long).
    """
    bp = tiles.size
    flat = tiles.reshape(bp).astype(jnp.int32)
    order = jnp.argsort(flat, stable=True)
    s = jnp.take(flat, order)
    idx = jnp.arange(bp, dtype=jnp.int32)
    head = jnp.concatenate([jnp.ones((1,), bool), s[1:] != s[:-1]])
    run_start = lax.associative_scan(jnp.maximum,
                                     jnp.where(head, idx, 0))
    j = idx - run_start
    gid = jnp.cumsum((j % rows == 0).astype(jnp.int32)) - 1  # (bp,)
    row_sorted = gid * rows + (j % rows)
    qidx = jnp.full((groups * rows,), n_queries, jnp.int32)
    qidx = qidx.at[row_sorted].set(order // p)
    tog = jnp.full((groups,), inf_tile, jnp.int32).at[gid].set(s)
    row = jnp.zeros((bp,), jnp.int32).at[order].set(row_sorted)
    return qidx.reshape(groups, rows), tog, row


def _budget_adc_grouped_kernel(tog_ref, codes_ref, rt_ref, lutx_ref,
                               out_ref, *, m: int, k: int, g: int,
                               block_t: int, rows: int):
    """One grid step: ADC distances for ``rows`` queries sharing one tile.

    codes_ref: (m, block_t) codes of this group's tile
    rt_ref:    (1, block_t) f32 row term (+inf padding)
    lutx_ref:  (rows, m//g, g·k) bf16 — the group's gathered per-query LUTs
    out_ref:   (rows, block_t) f32
    """
    codes = codes_ref[:].astype(jnp.int32)
    acc = jnp.zeros((rows, block_t), jnp.float32)
    for jg in range(m // g):
        onehot = _group_onehot(codes, jg, g, k, block_t)
        acc += jnp.dot(lutx_ref[:, jg, :], onehot,
                       preferred_element_type=jnp.float32)
    out_ref[:] = acc + rt_ref[:]


def _budget_adc_grouped_kernel_i8(tog_ref, codes_ref, rt_ref, lutx_ref,
                                  scalex_ref, out_ref, *, m: int, k: int,
                                  g: int, block_t: int, rows: int):
    """int8 twin of :func:`_budget_adc_grouped_kernel`: int8 gathered LUTs
    (half the expanded-LUT HBM traffic — the grouped path's largest
    stream) × int8 one-hot on the MXU's int8 path, exact int32
    accumulation, per-slot f32 scale fixup before the rowterm add.

    lutx_ref:   (rows, m//g, g·k) int8
    scalex_ref: (rows, 1) f32 per-slot dequantization scale
    """
    codes = codes_ref[:].astype(jnp.int32)
    acc = jnp.zeros((rows, block_t), jnp.int32)
    for jg in range(m // g):
        onehot = _group_onehot(codes, jg, g, k, block_t, dtype=jnp.int8)
        acc += jnp.dot(lutx_ref[:, jg, :], onehot,
                       preferred_element_type=jnp.int32)
    out_ref[:] = (acc.astype(jnp.float32) * scalex_ref[:]) + rt_ref[:]


@functools.partial(jax.jit, static_argnames=("block_t", "rows", "lut_dtype",
                                             "interpret"))
def budget_adc_grouped_pallas(luts: Array, codes_t: Array, rowterm: Array,
                              tiles: Array, *, block_t: int, rows: int = 8,
                              lut_dtype: str = "bf16",
                              interpret: bool = False) -> Array:
    """Tile-grouped twin of :func:`budget_adc_pallas` → same
    ``(B, P·block_t)`` float32 contract.

    Sorts the (query, tile) pairs by tile and runs ``rows`` queries per
    program sharing one code tile: the one-hot build amortizes rows× and
    the ADC matmul fills the sublane rows. Program count is
    ``⌈B·P/rows⌉ + NA/block_t`` (vs ``B·P``) — a win whenever queries share
    probed tiles, which is the IVPQ join's regime (few hundred target
    tiles, thousands of probes). Results are bit-identical to the
    per-query kernel (same bf16 LUT matmul, f32 accumulation).
    """
    B, m, k = luts.shape
    na = codes_t.shape[1]
    if na % block_t != 0:
        raise ValueError(f"NA={na} not a multiple of block_t={block_t}")
    n_tiles = na // block_t
    inf_tile = n_tiles - 1
    P = tiles.shape[1]
    grp = _group_size(m, k)
    pad_m = (-m) % grp
    int8 = lut_dtype == "int8"
    if int8:
        luts_in, scale = _quantize_luts_int8(luts)
        scale = jnp.pad(scale, (0, 1), constant_values=1.0)   # dummy slot
    else:
        luts_in = luts.astype(jnp.bfloat16)
    codes_in = (codes_t if jnp.issubdtype(codes_t.dtype, jnp.integer)
                else codes_t.astype(jnp.int32))
    if pad_m:
        luts_in = jnp.pad(luts_in, ((0, 0), (0, pad_m), (0, 0)))
        codes_in = jnp.pad(codes_in, ((0, pad_m), (0, 0)))
    mp = m + pad_m
    # one zero-LUT dummy row for unfilled group slots.
    luts_in = jnp.pad(luts_in, ((0, 1), (0, 0), (0, 0)))
    luts_in = luts_in.reshape(B + 1, mp // grp, grp * k)

    groups = -(-B * P // rows) + n_tiles
    qidx, tog, row = _group_probe_layout(tiles, B, P, groups, inf_tile,
                                         rows)
    lutx = jnp.take(luts_in, qidx.reshape(-1), axis=0)  # (G·r, m/g, g·k)
    rt = rowterm.reshape(1, na).astype(jnp.float32)

    in_specs = [
        pl.BlockSpec((mp, block_t), lambda i, t: (0, t[i])),
        pl.BlockSpec((1, block_t), lambda i, t: (0, t[i])),
        pl.BlockSpec((rows, mp // grp, grp * k),
                     lambda i, t: (i, 0, 0)),
    ]
    out_spec = pl.BlockSpec((rows, block_t), lambda i, t: (i, 0))
    out_shape = jax.ShapeDtypeStruct((groups * rows, block_t), jnp.float32)
    if int8:
        in_specs.append(pl.BlockSpec((rows, 1), lambda i, t: (i, 0)))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1, grid=(groups,), in_specs=in_specs,
        out_specs=out_spec)
    if int8:
        scalex = jnp.take(scale, qidx.reshape(-1))[:, None]   # (G·r, 1)
        out = pl.pallas_call(
            functools.partial(_budget_adc_grouped_kernel_i8, m=mp, k=k,
                              g=grp, block_t=block_t, rows=rows),
            grid_spec=grid_spec, out_shape=out_shape, interpret=interpret,
        )(tog, codes_in, rt, lutx, scalex)
    else:
        out = pl.pallas_call(
            functools.partial(_budget_adc_grouped_kernel, m=mp, k=k,
                              g=grp, block_t=block_t, rows=rows),
            grid_spec=grid_spec, out_shape=out_shape, interpret=interpret,
        )(tog, codes_in, rt, lutx)
    return jnp.take(out, row, axis=0).reshape(B, P * block_t)


def _budget_exact_grouped_kernel(tog_ref, vecs_ref, norm_ref, qx_ref,
                                 out_ref, *, block_t: int):
    """A query group sharing one raw-vector tile: (rows, d)@(d, block_t)."""
    s = jnp.dot(qx_ref[:], vecs_ref[:], preferred_element_type=jnp.float32)
    out_ref[:] = norm_ref[:] - 2.0 * s


@functools.partial(jax.jit, static_argnames=("block_t", "rows",
                                             "interpret"))
def budget_exact_grouped_pallas(queries: Array, vecs_t: Array,
                                rownorm: Array, tiles: Array, *,
                                block_t: int, rows: int = 8,
                                interpret: bool = False) -> Array:
    """Tile-grouped twin of :func:`budget_exact_pallas` (same
    ``(B, P·block_t)`` shifted-score contract): ``rows`` queries per
    program share one raw-vector tile, filling the matmul's sublanes."""
    B, d = queries.shape
    na = vecs_t.shape[1]
    if na % block_t != 0:
        raise ValueError(f"NA={na} not a multiple of block_t={block_t}")
    n_tiles = na // block_t
    inf_tile = n_tiles - 1
    P = tiles.shape[1]
    pad_d = (-d) % 128
    q_in = queries.astype(jnp.bfloat16)
    vecs_in = vecs_t.astype(jnp.bfloat16)
    if pad_d:
        q_in = jnp.pad(q_in, ((0, 0), (0, pad_d)))
        vecs_in = jnp.pad(vecs_in, ((0, pad_d), (0, 0)))
    # zero dummy row: dummy slots produce finite garbage that reassembly
    # never reads (no flat pair maps to them).
    q_in = jnp.pad(q_in, ((0, 1), (0, 0)))

    groups = -(-B * P // rows) + n_tiles
    qidx, tog, row = _group_probe_layout(tiles, B, P, groups, inf_tile,
                                         rows)
    qx = jnp.take(q_in, qidx.reshape(-1), axis=0)       # (G·r, d_pad)
    nrm = rownorm.reshape(1, na).astype(jnp.float32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(groups,),
        in_specs=[
            pl.BlockSpec((d + pad_d, block_t), lambda i, t: (0, t[i])),
            pl.BlockSpec((1, block_t), lambda i, t: (0, t[i])),
            pl.BlockSpec((rows, d + pad_d), lambda i, t: (i, 0)),
        ],
        out_specs=pl.BlockSpec((rows, block_t), lambda i, t: (i, 0)),
    )
    out = pl.pallas_call(
        functools.partial(_budget_exact_grouped_kernel, block_t=block_t),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((groups * rows, block_t),
                                       jnp.float32),
        interpret=interpret,
    )(tog, vecs_in, nrm, qx)
    return jnp.take(out, row, axis=0).reshape(B, P * block_t)


#: queries per grouped-kernel program. Set from the on-chip sweep
#: (evaluation/budget_kernel_sweep.py → reports/budget_kernel_sweep.json,
#: join shape B=1024 P=16 over 400 tiles, m=30 k=32): rows=32 runs the
#: probe in 6.27 ms vs 8.83 per-query (1.41×) and 7.93 at the old rows=8
#: (1.11×); rows=64 is within noise of 32, rows=16 loses to its own
#: layout padding. int8 gathered-LUT ties bf16 here (6.35 ms).
GROUPED_ROWS_DEFAULT = 32


def _grouped_wins(bp: int, n_tiles: int, rows: int,
                  slot_bytes: int) -> bool:
    """True when the grouped layout's program bound ``⌈bp/rows⌉ + n_tiles``
    beats the per-query ``bp`` by ≥2× AND its expanded per-slot copy
    (gathered LUTs / query rows) stays small — huge probe batches (IVFADC
    at B≈10k, k=256) must not trade program count for hundreds of MB of
    HBM."""
    groups = -(-bp // rows) + n_tiles
    return groups * 2 < bp and groups * rows * slot_bytes <= 128 * 2**20


def budget_adc_auto(luts: Array, codes_t: Array, rowterm: Array,
                    tiles: Array, *, block_t: int,
                    rows: int | None = None, lut_dtype: str = "bf16",
                    interpret: bool = False) -> Array:
    """Static dispatch between the tile-grouped and per-query budget ADC
    kernels: grouped for probe sets over few tiles (the join regime),
    per-query otherwise (wide tables, sparse probes). ``lut_dtype="int8"``
    applies on the grouped path only (the per-query kernel stays bf16)."""
    if lut_dtype not in ("bf16", "int8"):
        raise ValueError(f"lut_dtype must be 'bf16' or 'int8', "
                         f"got {lut_dtype!r}")
    rows = GROUPED_ROWS_DEFAULT if rows is None else rows
    bp = tiles.shape[0] * tiles.shape[1]
    n_tiles = codes_t.shape[1] // block_t
    slot_bytes = luts.shape[1] * luts.shape[2] * (1 if lut_dtype == "int8"
                                                  else 2)
    if _grouped_wins(bp, n_tiles, rows, slot_bytes):
        return budget_adc_grouped_pallas(luts, codes_t, rowterm, tiles,
                                         block_t=block_t, rows=rows,
                                         lut_dtype=lut_dtype,
                                         interpret=interpret)
    if lut_dtype == "int8":
        import warnings
        warnings.warn(
            "budget_adc_auto: probe shape selects the per-query kernel, "
            "which has no int8 variant — running bf16. (Sparse probes or "
            "an expanded-LUT copy past the memory guard.)", stacklevel=2)
    return budget_adc_pallas(luts, codes_t, rowterm, tiles,
                             block_t=block_t, interpret=interpret)


def budget_exact_auto(queries: Array, vecs_t: Array, rownorm: Array,
                      tiles: Array, *, block_t: int,
                      rows: int | None = None,
                      interpret: bool = False) -> Array:
    """Grouped/per-query dispatch for the exact budget kernel (same bound
    as :func:`budget_adc_auto`)."""
    rows = GROUPED_ROWS_DEFAULT if rows is None else rows
    bp = tiles.shape[0] * tiles.shape[1]
    n_tiles = vecs_t.shape[1] // block_t
    if _grouped_wins(bp, n_tiles, rows, queries.shape[1] * 2):
        return budget_exact_grouped_pallas(queries, vecs_t, rownorm, tiles,
                                           block_t=block_t, rows=rows,
                                           interpret=interpret)
    return budget_exact_pallas(queries, vecs_t, rownorm, tiles,
                               block_t=block_t, interpret=interpret)


def supports_pallas() -> bool:
    """True when running on a TPU backend (incl. tunneled platforms)."""
    try:
        plat = jax.devices()[0].platform
    except Exception:
        return False
    return plat in ("tpu", "axon")


@functools.partial(jax.jit,
                   static_argnames=("k", "valid_n", "block_n", "approx",
                                    "lut_dtype", "interpret"))
def adc_top_k_pallas(luts: Array, codes_t: Array, k: int, *,
                     valid_n: int | None = None, block_n: int = 2048,
                     approx: bool = True, lut_dtype: str = "bf16",
                     interpret: bool = False) -> tuple[Array, Array]:
    """Exhaustive ADC top-k via the matmul-scan kernel → (dists, ids).

    ``valid_n`` masks padding columns appended to reach a block multiple.
    """
    from postgres_word2vec_tpu.ops import topk as topk_ops

    n = codes_t.shape[1]
    dists = adc_scan_pallas(luts, codes_t, block_n=block_n,
                            lut_dtype=lut_dtype, interpret=interpret)
    if valid_n is not None and valid_n < n:
        col = jnp.arange(n)
        dists = jnp.where(col[None, :] < valid_n, dists, jnp.inf)
    if approx:
        return lax.approx_min_k(dists, k=k)
    # exact top-k: per-backend — native wide-row lax.top_k on TPU, the
    # blockwise reduction on CPU (the round-3 blockwise-everywhere switch
    # was the PQ scan family's 2-4x regression; measured numbers in
    # reports/R4_REGRESSION_NOTE.md).
    return topk_ops.top_k_smallest(dists, k)


@functools.partial(jax.jit, static_argnames=("k", "valid_n", "block_n",
                                             "bins", "approx", "lut_dtype",
                                             "interpret"))
def adc_top_k_binned_pallas(luts: Array, codes_t: Array, k: int, *,
                            valid_n: int | None = None, block_n: int = 2048,
                            bins: int = 128, approx: bool = True,
                            lut_dtype: str = "bf16",
                            interpret: bool = False) -> tuple[Array, Array]:
    """Memory-lean exhaustive ADC top-k via the fused binned scan.

    The dense wrapper materializes a ``(B, N)`` float32 distance matrix —
    2.6 GiB at 64×10M, which does not fit beside a large resident table.
    This variant keeps only the per-bin minima (``block_n/bins``× smaller,
    16× at the defaults) and top-ks those. Candidates are per-strided-bin
    minima, so results are approximate in the same sense as
    ``lax.approx_min_k`` (one survivor per bin); the global minimum always
    survives. ``valid_n`` masking is post-hoc: a final-tile bin whose
    minimum lands on a padding row is dropped rather than re-examined —
    at most ``bins`` candidates of one partial tile, negligible at the
    scales where this path is selected.
    """
    mins, ids = adc_scan_binned_pallas(luts, codes_t, block_n=block_n,
                                       bins=bins, lut_dtype=lut_dtype,
                                       interpret=interpret)
    if valid_n is not None and valid_n < codes_t.shape[1]:
        mins = jnp.where(ids < valid_n, mins, jnp.inf)
    if approx:
        vals, pos = lax.approx_min_k(mins, k=k)
    else:
        neg, pos = lax.top_k(-mins, k)
        vals = -neg
    sel = jnp.take_along_axis(ids, pos, axis=-1)
    # fewer than k finite survivors → +inf slots carry padding-row ids
    # (>= valid_n); emit -1 there, matching the join paths' convention.
    return vals, jnp.where(jnp.isinf(vals), -1, sel)
