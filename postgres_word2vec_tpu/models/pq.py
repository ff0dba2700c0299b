"""Product-quantization index: training, encoding, ADC search, online update.

Parity targets:
- build driver pq_index.py (codebook k-means + faiss encode + counts →
  ``pq_codebook`` / ``pq_quantization`` tables),
- search kernels ``pq_search`` (freddy.c:26-170), ``pq_search_in``
  (freddy.c:1026-1174), ``pq_search_in_batch`` (freddy.c:412-675),
- post-verified wrappers ``k_nearest_neighbour_pq_pv`` (sql:625-662),
- online codebook maintenance ``updateCodebook`` (index_utils.c:908-957,
  reimplemented without the reference's ``pos + code`` indexing bug —
  SURVEY §"quirks not to replicate").

Defaults follow the shipped configs (m=12, k=256 → uint8 codes,
pq_config.json) rather than the README's 1024-centroid claim; both noted in
BASELINE.md.
"""

from __future__ import annotations

import dataclasses
import functools
from pathlib import Path
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from postgres_word2vec_tpu.ops import adc, kmeans, lut

Array = jax.Array


class PQCodebook(NamedTuple):
    """``(m, k, dsub)`` centroids + ``(m, k)`` assignment counts.

    The counts back the running-mean online update (parity:
    ``getCodebookWithCounts``, index_utils.c:684-736; counts computed at
    build by ``determine_counts``, pq_index.py:141-151).
    """
    centroids: Array  # (m, k, dsub) float32
    counts: Array     # (m, k) int32


def train_codebook(key: Array, vectors: Array, m: int, k: int, *,
                   train_size: int | None = None, iters: int = 10,
                   restarts: int = 1, init: str = "sample") -> PQCodebook:
    """Train an m×k product codebook on a (sampled) training set.

    ``restarts``/``init`` select quantizer quality: the reference's scipy
    ``kmeans(iter=10)`` is 10 restarts of converged Lloyd
    (quantizer_creation.py:25); ``init="kmeans++"`` with one restart
    reaches comparable distortion at a fraction of the cost.
    """
    n = vectors.shape[0]
    if train_size is not None and train_size < n:
        sel_key, key = jax.random.split(key)
        idx = jax.random.choice(sel_key, n, shape=(train_size,),
                                replace=False)
        train = jnp.take(vectors, idx, axis=0)
    else:
        train = vectors
    sub = kmeans.split_subspaces(train, m)
    res = kmeans.kmeans_subspaces(key, sub, k=k, iters=iters,
                                  restarts=restarts, init=init)
    return PQCodebook(res.centroids, res.counts)


def recount(codebook: PQCodebook, codes: Array) -> PQCodebook:
    """Recompute counts from a full code table (determine_counts parity)."""
    m, k, _ = codebook.centroids.shape
    one = jnp.ones((codes.shape[0],), jnp.int32)
    counts = jax.vmap(
        lambda cj: jax.ops.segment_sum(one, cj.astype(jnp.int32),
                                       num_segments=k))(codes.T)
    return PQCodebook(codebook.centroids, counts)


@jax.jit
def online_codebook_update(codebook: PQCodebook,
                           new_vectors: Array) -> tuple[PQCodebook, Array]:
    """Sequential running-mean update for a batch of inserted vectors.

    For each vector, per subspace: assign nearest centroid, ``count += 1``,
    ``c += (x − c)/count`` — the reference's incremental k-means semantics
    (index_utils.c:908-957), scanned over the batch so later vectors see
    earlier updates, exactly like the reference's per-row loop.

    Returns the updated codebook and the ``(n_new, m)`` assigned codes.
    """
    m, k, dsub = codebook.centroids.shape
    x_sub = new_vectors.astype(jnp.float32).reshape(-1, m, dsub)

    def step(carry, x):
        cents, counts = carry          # (m,k,dsub), (m,k)
        d = jnp.sum((x[:, None, :] - cents) ** 2, axis=-1)   # (m, k)
        code = jnp.argmin(d, axis=-1)                        # (m,)
        sel = jax.nn.one_hot(code, k, dtype=jnp.float32)     # (m, k)
        new_counts = counts + sel.astype(jnp.int32)
        inv = sel / jnp.maximum(new_counts.astype(jnp.float32), 1.0)
        cents = cents + inv[:, :, None] * (x[:, None, :] - cents)
        return (cents, new_counts), code.astype(jnp.int32)

    (cents, counts), codes = lax.scan(
        step, (codebook.centroids.astype(jnp.float32),
               codebook.counts.astype(jnp.int32)), x_sub)
    return PQCodebook(cents, counts), codes


def train_opq_rotation(key: Array, train: Array, m: int, k: int, *,
                       opq_iters: int = 8, kmeans_iters: int = 5
                       ) -> tuple[Array, PQCodebook]:
    """OPQ (non-parametric): alternate subspace k-means with the orthogonal
    Procrustes solve ``R = UVᵀ, USVᵀ = SVD(XᵀX̂)`` minimizing
    ``‖X·R − reconstruction‖²``. Rotations preserve L2, so search semantics
    are unchanged — only quantization error drops.

    (An optimization the reference does not have; its scipy pipeline quantizes
    in the raw basis, quantizer_creation.py:13-29. This is this framework's
    quantizer-quality edge: one extra 300×300 matmul per query.)

    Returns ``(rotation (d, d), codebook trained in the rotated basis)``.
    """
    n, d = train.shape
    x = train.astype(jnp.float32)
    rot = jnp.eye(d, dtype=jnp.float32)
    cb = None
    for it in range(opq_iters):
        y = jnp.dot(x, rot, preferred_element_type=jnp.float32)
        sub = kmeans.split_subspaces(y, m)
        if cb is None:
            res = kmeans.kmeans_subspaces(key, sub, k=k, iters=kmeans_iters,
                                          init="kmeans++")
        else:
            # warm-start Lloyd from the previous rotation's codebook.
            res = jax.vmap(
                lambda xs, c0: _warm_lloyd(xs, c0, kmeans_iters))(sub, cb)
        cb = res.centroids
        codes = kmeans.encode_subspaces(y, cb)
        recon = reconstruct(codes, cb)
        u, _, vt = jnp.linalg.svd(
            jnp.dot(x.T, recon, preferred_element_type=jnp.float32),
            full_matrices=False)
        rot = jnp.dot(u, vt, preferred_element_type=jnp.float32)
    y = jnp.dot(x, rot, preferred_element_type=jnp.float32)
    codes = kmeans.encode_subspaces(y, cb)
    counts = jax.vmap(lambda cj: jnp.bincount(
        cj.astype(jnp.int32), length=k))(codes.T)
    return rot, PQCodebook(cb, counts.astype(jnp.int32))


def _warm_lloyd(x: Array, c0: Array, iters: int) -> "kmeans.KMeansResult":
    def body(c, _):
        new_c, counts, dist = kmeans._lloyd_step_repair(x, c)
        return new_c, (counts, dist)
    c, (counts, dist) = lax.scan(body, c0.astype(jnp.float32), None,
                                 length=iters)
    return kmeans.KMeansResult(c, counts[-1], dist[-1])


def reconstruct(codes: Array, codebooks: Array) -> Array:
    """Decode PQ codes back to vectors: ``(n, m) × (m, k, dsub) → (n, d)``."""
    m, k, dsub = codebooks.shape
    parts = jax.vmap(lambda cb_j, cj: jnp.take(cb_j, cj, axis=0),
                     in_axes=(0, 1))(codebooks, codes.astype(jnp.int32))
    return jnp.moveaxis(parts, 0, 1).reshape(codes.shape[0], m * dsub)


@functools.partial(jax.jit, static_argnames=("pad",))
def _pad_transpose(codes: Array, pad: int) -> Array:
    """(n, m) → (m, n+pad) in ONE compiled program (single output buffer)."""
    return jnp.pad(codes, ((0, pad), (0, 0))).T


@functools.partial(jax.jit, static_argnames=("k", "valid_n", "block_n",
                                             "mode", "rotate", "approx"))
def _pq_search_program(queries: Array, rotation: Array, centroids: Array,
                       codes_t: Array, *, k: int, valid_n: int,
                       block_n: int, mode: str, rotate: bool,
                       approx: bool) -> tuple[Array, Array]:
    """The WHOLE exhaustive PQ search as one compiled program: optional OPQ
    rotation → LUT build → scan kernel → top-k. One dispatch per call —
    the round-2 path issued rotate/LUT/scan as separate dispatches, each a
    full transport round trip on a tunneled chip (~30 ms apiece, which
    dominated the measured per-query latency at small batches)."""
    from postgres_word2vec_tpu.ops import pallas_kernels as pk

    q = (jnp.dot(queries.astype(jnp.float32), rotation,
                 preferred_element_type=jnp.float32) if rotate else queries)
    luts = lut.build_luts(q, centroids)
    lut_dtype = "int8" if mode.endswith("_i8") else "bf16"
    if mode.startswith("binned"):
        return pk.adc_top_k_binned_pallas(luts, codes_t, k, valid_n=valid_n,
                                          block_n=block_n, approx=approx,
                                          lut_dtype=lut_dtype)
    if mode.startswith("dense"):
        return pk.adc_top_k_pallas(luts, codes_t, k, valid_n=valid_n,
                                   block_n=block_n, approx=approx,
                                   lut_dtype=lut_dtype)
    # XLA gather backend (codes_t here is the UNtransposed (n, m) table).
    return adc.adc_top_k(luts, codes_t, k, approx=approx)


@functools.partial(jax.jit, static_argnames=("k", "pvf", "valid_n",
                                             "block_n", "mode", "rotate",
                                             "approx"))
def _pq_search_pv_program(queries: Array, rotation: Array, centroids: Array,
                          codes_t: Array, vectors: Array, *, k: int,
                          pvf: int, valid_n: int, block_n: int, mode: str,
                          rotate: bool, approx: bool) -> tuple[Array, Array]:
    """Fused ADC shortlist (k·pvf) + exact re-rank in one compiled program
    (one dispatch for the whole PV path). ``approx`` selects the
    partial-reduce shortlist (see :meth:`PQIndex.search_pv`)."""
    cd, ci = _pq_search_program(queries, rotation, centroids, codes_t,
                                k=k * pvf, valid_n=valid_n, block_n=block_n,
                                mode=mode, rotate=rotate, approx=approx)
    return adc.post_verify(queries, ci, cd, vectors, k)


#: Below this shortlist width the exact wide-row top-k is cheap (native
#: ``lax.top_k`` wins at k ≤ 50 on the measured grid, scratch/topk_grid.json)
#: and the analogy path's tiny pvf+3 shortlists must stay exact.
_APPROX_SHORTLIST_MIN = 100


def _resolve_shortlist(shortlist: str, k: int, pvf: int,
                       impl: str | None = None) -> str:
    """Resolve the PV shortlist policy: "auto" → "approx" on TPU for wide
    shortlists (k·pvf ≥ 100), "exact" otherwise.

    ``impl`` is the caller's kernel request: an explicit non-pallas impl
    (e.g. ``"xla"`` — the documented exact reference backend) keeps the
    exact shortlist even on a TPU backend; auto-approx only applies when
    the pallas path is actually selected."""
    if shortlist not in ("auto", "exact", "approx"):
        raise ValueError(f"shortlist must be auto|exact|approx, "
                         f"got {shortlist!r}")
    if shortlist != "auto":
        return shortlist
    from postgres_word2vec_tpu.ops import pallas_kernels as pk
    pallas_path = (impl.startswith("pallas") if impl is not None
                   else pk.supports_pallas())
    if pallas_path and k * pvf >= _APPROX_SHORTLIST_MIN:
        return "approx"
    return "exact"


@dataclasses.dataclass
class PQIndex:
    """Exhaustive-scan PQ index: packed codes + codebook, all HBM-resident.

    On TPU the exhaustive scan runs through the Pallas matmul-scan kernel
    (ops/pallas_kernels.py) over a cached transposed ``(m, N_pad)`` code
    layout; the XLA gather path remains the CPU/reference backend.

    ``rotation``: optional OPQ orthogonal basis (codes live in the rotated
    space; queries are rotated before LUT construction — L2 distances are
    invariant, recall improves).
    """

    codebook: PQCodebook
    codes: Array          # (n, m) uint8 (k ≤ 256) or int16
    rotation: Array | None = None   # (d, d) OPQ rotation or None

    _codes_t: Array | None = dataclasses.field(default=None, repr=False,
                                               compare=False)

    _BLOCK_N = 2048
    _DENSE_SCAN_BYTES = 6_442_450_944  # 6 GiB — no-go anywhere

    def transposed_codes(self) -> Array:
        """Cached subspace-major codes (storage dtype), kernel-block padded."""
        if self._codes_t is None:
            n = self.codes.shape[0]
            pad = (-n) % self._BLOCK_N
            # storage dtype preserved: the ADC kernels stream codes narrow
            # (uint8/int16) and widen per-tile in VMEM. One jitted
            # pad+transpose: two sequential EAGER ops each materialize a
            # full copy (~0.6 GiB apiece at 10M×60), which tipped the
            # capacity regime over HBM.
            try:
                ct = _pad_transpose(self.codes, pad)
            except jax.errors.JaxRuntimeError as e:
                # narrow: only the runtime's own OOM signal takes the slow
                # host detour; anything else (even if its message mentions
                # RESOURCE_EXHAUSTED) surfaces.
                if "RESOURCE_EXHAUSTED" not in str(e):
                    raise
                # Capacity regimes: the on-device transpose needs source +
                # destination simultaneously (2 x 586 MiB at 10M x 60) and
                # a fragmented allocator can refuse it with the table
                # resident (observed in the 10M quality run,
                # reports/scale_10M_quality.json). Detour through the
                # host: one contiguous device_put of the destination only.
                import warnings
                warnings.warn(
                    "transposed_codes: on-device transpose hit "
                    "RESOURCE_EXHAUSTED; building via host copy "
                    "(slower, halves the device transient).",
                    stacklevel=2)
                ct = jnp.asarray(np.ascontiguousarray(
                    np.pad(self._codes_to_host(), ((0, pad), (0, 0))).T))
            object.__setattr__(self, "_codes_t", ct)
        return self._codes_t

    def _codes_to_host(self) -> np.ndarray:
        """Pull the code table to host in 1M-row slices: a whole-array
        device_get can itself RESOURCE_EXHAUST a nearly-full chip (the
        transfer stages through a device buffer), observed in the 10M
        quality regime; 1M × m uint8 slices (~60 MB) always fit."""
        if isinstance(self.codes, np.ndarray):
            return self.codes
        n, m = self.codes.shape
        out = np.empty((n, m), dtype=np.dtype(self.codes.dtype))
        step = 1_048_576
        for s in range(0, n, step):
            e = min(s + step, n)
            out[s:e] = np.asarray(
                jax.lax.slice(self.codes, (s, 0), (e, m)))
        return out

    @property
    def size(self) -> int:
        return int(self.codes.shape[0])

    @property
    def m(self) -> int:
        return int(self.codebook.centroids.shape[0])

    @property
    def k(self) -> int:
        return int(self.codebook.centroids.shape[1])

    # ------------------------------------------------------------ building
    @classmethod
    def build(cls, key: Array, vectors: Array, *, m: int = 12, k: int = 256,
              train_size: int | None = 100_000, iters: int = 10,
              restarts: int = 1, init: str = "sample",
              opq_iters: int = 0, aniso_eta: float | None = None,
              aniso_iters: int = 4) -> "PQIndex":
        """Train + encode (pq_index.py ``main`` parity; defaults from
        pq_config.json: m=12, k=256, train_size=100k).

        ``opq_iters > 0`` enables OPQ: a learned orthogonal rotation that
        decorrelates subspaces before quantization (off by default for
        reference parity).

        ``aniso_eta`` (e.g. 2–4) enables anisotropic (score-aware)
        refinement: trained codebooks get ``aniso_iters`` rounds of
        weighted Lloyd that penalize the ranking-relevant PARALLEL
        residual η× (ops/kmeans.anisotropic_refine), and the table is
        encoded under the same metric. Stacks with OPQ. Training-time
        only — LUTs/search are unchanged; later ``add()`` rows encode
        plain-L2 (documented drift, same as the reference's incremental
        codebooks)."""
        if opq_iters > 0:
            n = vectors.shape[0]
            if train_size is not None and train_size < n:
                sk, key = jax.random.split(key)
                sel = jax.random.choice(sk, n, shape=(train_size,),
                                        replace=False)
                train = jnp.take(vectors, sel, axis=0)
            else:
                train = vectors
            rot, cb = train_opq_rotation(key, train, m, k,
                                         opq_iters=opq_iters,
                                         kmeans_iters=max(iters // 4, 3))
            cents = cb.centroids
            if aniso_eta is not None:
                # cap the refinement sample: the (n, dsub²) outer-product
                # table inside anisotropic_refine must never scale with the
                # full table (HBM rule, CLAUDE.md) — 100k rows bound it at
                # ~250 MB transient even with train_size=None.
                ref_tr = train
                if ref_tr.shape[0] > 100_000:
                    rsel = jax.random.choice(jax.random.fold_in(key, 11),
                                             ref_tr.shape[0],
                                             shape=(100_000,),
                                             replace=False)
                    ref_tr = jnp.take(ref_tr, rsel, axis=0)
                y = jnp.dot(ref_tr.astype(jnp.float32), rot,
                            preferred_element_type=jnp.float32)
                cents = kmeans.anisotropic_refine(
                    kmeans.split_subspaces(y, m), cents, aniso_eta,
                    aniso_iters)
                cb = PQCodebook(cents, cb.counts)
            codes = kmeans.encode_subspaces(vectors, cents, rotation=rot,
                                            aniso_eta=aniso_eta)
            return cls(recount(cb, codes), codes, rotation=rot)
        cb = train_codebook(key, vectors, m, k, train_size=train_size,
                            iters=iters, restarts=restarts, init=init)
        if aniso_eta is not None:
            n = vectors.shape[0]
            # same HBM cap as the OPQ branch: bound the refinement sample.
            cap = min(train_size or 100_000, 100_000)
            if cap < n:
                sel = jax.random.choice(jax.random.fold_in(key, 7), n,
                                        shape=(cap,), replace=False)
                train = jnp.take(vectors, sel, axis=0)
            else:
                train = vectors
            cents = kmeans.anisotropic_refine(
                kmeans.split_subspaces(train, m), cb.centroids, aniso_eta,
                aniso_iters)
            cb = PQCodebook(cents, cb.counts)
        codes = kmeans.encode_subspaces(vectors, cb.centroids,
                                        aniso_eta=aniso_eta)
        return cls(recount(cb, codes), codes)

    def _rotate(self, x: Array) -> Array:
        if self.rotation is None:
            return x
        return jnp.dot(x.astype(jnp.float32), self.rotation,
                       preferred_element_type=jnp.float32)

    def encode(self, vectors: Array) -> Array:
        # rotation fused into the chunked encode — never materializes a
        # full rotated copy of the table (3.6 GB at 3M×300).
        return kmeans.encode_subspaces(vectors, self.codebook.centroids,
                                       rotation=self.rotation)

    # ------------------------------------------------------------- search
    def _search_plan(self, n_queries: int, approx: bool,
                     impl: str | None) -> tuple[str, Array, int]:
        """Resolve (mode, codes-arg, valid_n) for the fused search program.

        Mode selection: "binned" for approx requests on TPU (measured
        faster than dense+approx_min_k at every probed regime since the
        packed-argmin rewrite, and its intermediates are block_n/bins×
        smaller) and for memory-constrained dense buffers; "dense" for
        exact TPU requests; "xla" off-TPU.
        """
        from postgres_word2vec_tpu.ops import pallas_kernels as pk

        impl_requested = impl
        if impl is None:
            impl = "pallas" if pk.supports_pallas() else "xla"
        if not impl.startswith("pallas"):
            return "xla", self.codes, self.size
        # "_int8" suffix selects the int8-LUT MXU path (measured ~1.16x
        # at B=256 + half LUT bytes, reports/ROOFLINE.md)
        # (per-query quantized LUTs; ordering error far below PQ error).
        sfx = "_i8" if impl.endswith("_int8") else ""
        base = impl[:-5] if sfx else impl
        ct = self.transposed_codes()
        dense_bytes = n_queries * ct.shape[1] * 4
        if base == "pallas_binned" or approx:
            return "binned" + sfx, ct, self.size
        if dense_bytes > self._DENSE_SCAN_BYTES:
            # The dense scan materializes a (B, N) f32 distance matrix;
            # past the no-go bar only the binned kernel can run — but its
            # results are bin-survivor approximations even with
            # approx=False, so never degrade an EXPLICIT exact-kernel
            # request silently. "pallas_int8" is a DTYPE preference (the
            # engine's pq_lut_dtype knob resolves to it), not an exactness
            # demand — it degrades to the binned int8 kernel with the
            # warning below rather than raising.
            if impl_requested == "pallas":
                raise ValueError(
                    f"impl='pallas' dense distance buffer would be "
                    f"{dense_bytes / 2**30:.1f} GiB (> "
                    f"{self._DENSE_SCAN_BYTES / 2**30:.0f} GiB bar); "
                    "pass impl='pallas_binned' (approximate) explicitly "
                    "or reduce the query batch.")
            import warnings
            warnings.warn(
                "PQIndex.search: dense (B, N) buffer exceeds the "
                f"{self._DENSE_SCAN_BYTES / 2**30:.0f} GiB bar; "
                "auto-selecting the approximate binned kernel. Pass "
                "impl='pallas_binned' to silence, or chunk queries "
                "for exact results.", stacklevel=3)
            return "binned" + sfx, ct, self.size
        return "dense" + sfx, ct, self.size

    def _rot_args(self) -> tuple[Array, bool]:
        if self.rotation is None:
            # static `rotate=False` drops the dummy from the traced graph.
            return jnp.zeros((1, 1), jnp.float32), False
        return self.rotation, True

    def search(self, queries: Array, k: int, *, approx: bool = False,
               impl: str | None = None) -> tuple[Array, Array]:
        """Exhaustive ADC top-k (``pq_search`` parity) → (sqdists, ids).

        ``impl``: "pallas" (TPU matmul-scan kernel), "pallas_binned"
        (memory-lean fused binned kernel — approximate, for tables whose
        dense (B, N) distance buffer cannot sit beside resident state),
        "xla" (gather path), or None to auto-select by backend. The whole
        pipeline (rotation, LUTs, scan, top-k) runs as ONE compiled
        program (:func:`_pq_search_program`).
        """
        mode, codes_arg, valid_n = self._search_plan(queries.shape[0],
                                                     approx, impl)
        rot, rotate = self._rot_args()
        return _pq_search_program(queries, rot, self.codebook.centroids,
                                  codes_arg, k=k, valid_n=valid_n,
                                  block_n=self._BLOCK_N, mode=mode,
                                  rotate=rotate, approx=approx)

    def search_pv(self, queries: Array, k: int, pvf: int,
                  vectors: Array, *, impl: str | None = None,
                  shortlist: str = "auto") -> tuple[Array, Array]:
        """ADC shortlist of k·pvf then exact re-rank, fused into one
        program (``k_nearest_neighbour_pq_pv`` parity, sql:625-662).

        ``shortlist``: how the k·pvf ADC shortlist is selected before the
        exact re-rank —

        - ``"exact"``: exact wide-row top-k over the scan. At the bench
          shape (256 × 3M, k·pvf=200) the exact top-k alone costs ~540 ms,
          ~6× the scan itself (reports/R4_REGRESSION_NOTE.md).
        - ``"approx"``: the TPU partial-reduce shortlist (binned-scan
          survivors + ``approx_min_k``, ~31 ms at the same shape). The
          final re-rank is still exact L2 over raw vectors, so the only
          effect is a ~0.2% chance per true neighbor of missing the
          shortlist (measured fidelity ≥ 0.997 random, 1.0 strided —
          scratch/approx_topk_probe.json). On CPU ``approx_min_k``
          falls back to exact.
        - ``"auto"`` (default): "approx" on TPU when k·pvf ≥ 100,
          "exact" otherwise (tiny shortlists — e.g. the analogy path's
          pvf+3 — stay exact, where native top-k is already cheap).
        """
        approx_sl = _resolve_shortlist(shortlist, k, pvf, impl) == "approx"
        mode, codes_arg, valid_n = self._search_plan(queries.shape[0],
                                                     approx_sl, impl)
        rot, rotate = self._rot_args()
        return _pq_search_pv_program(queries, rot, self.codebook.centroids,
                                     codes_arg, vectors, k=k, pvf=pvf,
                                     valid_n=valid_n, block_n=self._BLOCK_N,
                                     mode=mode, rotate=rotate,
                                     approx=approx_sl)

    def search_in(self, queries: Array, k: int, target_ids: Array,
                  target_mask: Array | None = None) -> tuple[Array, Array]:
        """Target-restricted ADC (``pq_search_in``/``pq_search_in_batch``
        parity — the kNN-join baseline)."""
        if target_mask is None:
            target_mask = jnp.ones(target_ids.shape, dtype=bool)
        luts = lut.build_luts(self._rotate(queries), self.codebook.centroids)
        return adc.adc_top_k_in(luts, self.codes, target_ids, target_mask, k)

    # ------------------------------------------------------------ mutation
    def add(self, new_vectors: Array) -> "PQIndex":
        """Online insert: running-mean codebook update + append codes
        (``insert_batch``'s PQ leg, freddy.c:1616-1629)."""
        cb, new_codes = online_codebook_update(self.codebook,
                                               self._rotate(new_vectors))
        codes = jnp.concatenate(
            [self.codes, new_codes.astype(self.codes.dtype)], axis=0)
        return PQIndex(cb, codes, rotation=self.rotation)

    # --------------------------------------------------------- persistence
    def save(self, path: str | Path) -> None:
        extra = {}
        if self.rotation is not None:
            extra["rotation"] = np.asarray(self.rotation)
        np.savez_compressed(path, centroids=np.asarray(self.codebook.centroids),
                            counts=np.asarray(self.codebook.counts),
                            codes=np.asarray(self.codes), **extra)

    @classmethod
    def load(cls, path: str | Path) -> "PQIndex":
        with np.load(path) as f:
            rot = jnp.asarray(f["rotation"]) if "rotation" in f else None
            return cls(PQCodebook(jnp.asarray(f["centroids"]),
                                  jnp.asarray(f["counts"])),
                       jnp.asarray(f["codes"]), rotation=rot)
