"""FREDDY-compatible API surface — the framework's L2.

Replaces the reference's plpgsql layer (freddy_extension/freddy--0.0.1.sql,
1538 LoC): the generic façades ``knn`` / ``knn_in`` / ``knn_batch`` /
``knn_join`` / ``analogy`` / ``analogy_in`` / ``groups`` / ``cluster`` /
``tokenize`` (sql:204-332), the pluggable implementation registry
(``set_knn_function`` … ``set_cluster_function``, sql:78-132), the runtime
parameter store (``set_pvf`` / ``set_w`` / ``set_alpha`` /
``set_method_flag`` / ``set_use_targetlist`` / ``set_confidence_value`` /
``set_long_codes_threshold`` / ``set_statistics_table``, sql:21-75 with
defaults sql:188-202), statistics creation (sql:150-171), and online
insertion (``insert_batch``, freddy.c:1403-1658).

The SQL catalog-function config trick becomes a plain dataclass; dynamic
``EXECUTE format(…)`` dispatch becomes a dict of bound methods. Results are
returned as Python lists of tuples shaped like the reference's result sets:
``(word, similarity)`` rows for kNN, ``(query, target, similarity)`` for
batch/join, ``(token, grouptoken)`` for grouping, ``(word, cluster)`` for
clustering. Similarities are cosine (= 1 − d²/2 on normalized vectors,
sql:511).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Callable, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from postgres_word2vec_tpu.models.exact import ExactIndex
from postgres_word2vec_tpu.models.ivfadc import IVFADCIndex
from postgres_word2vec_tpu.models.ivpq import (IVPQIndex, PQ_CALC,
                                               PreparedJoin,
                                               build_statistics)
from postgres_word2vec_tpu.models.pq import PQIndex
from postgres_word2vec_tpu.ops import vector_ops as vo
from postgres_word2vec_tpu.store import VectorStore
from postgres_word2vec_tpu.utils.tracker import GLOBAL_TRACKER

Array = jax.Array


@jax.jit
def _jitted_luts(queries: Array, centroids: Array) -> Array:
    """Per-query LUT build as ONE jitted program — used by the mesh cores
    (rotation-free engines) and for stage instrumentation. The
    single-device kernels fuse LUT construction into the scan instead."""
    from postgres_word2vec_tpu.ops import lut

    return lut.build_luts(queries, centroids)


@jax.jit
def _jitted_gather_codes(codes: Array, target_ids: Array) -> Array:
    """Target-code gather as ONE jitted program — instrumentation twin of
    the fetch the fused in-set kernels perform (the reference's SPI
    ``WHERE id IN`` stage, freddy.c:527-651)."""
    return jnp.take(codes, jnp.maximum(target_ids, 0), axis=0)


@jax.jit
def _jitted_rotate_luts(queries: Array, rotation: Array,
                        centroids: Array) -> Array:
    """OPQ rotate + LUT build fused into one jitted dispatch. The mesh
    cores previously ran ``pq._rotate`` and ``build_luts`` EAGERLY per
    call — 2 extra ~30 ms transport round trips plus per-call jaxpr
    rebuilds on a tunneled chip (CLAUDE.md: hot paths must be one fused
    jitted program)."""
    from postgres_word2vec_tpu.ops import lut

    q = jnp.dot(queries.astype(jnp.float32), rotation,
                preferred_element_type=jnp.float32)
    return lut.build_luts(q, centroids)


class NoMatrixCore(LookupError):
    """The dispatched impl has no fixed-shape batched matrix core (e.g.
    IVPQ for ``knn_in``, whose round count is data-dependent). A precise
    sentinel so callers' fallback handling cannot swallow unrelated
    KeyErrors from inside a core (misconfigured ``_shard`` state etc.)."""


@dataclasses.dataclass
class RuntimeParams:
    """Runtime-settable parameters with the reference defaults (sql:188-202)."""

    pvf: int = 20                       # post-verification factor
    w: int = 3                          # IVFADC probe width (PARAM_W)
    alpha: int = 3                      # IVPQ selectivity
    method: int = PQ_CALC               # IVPQ distance method flag
    use_targetlist: bool = True
    confidence: float = 0.8
    long_codes_threshold: float = 1e7
    statistics_table: str | None = None
    pq_lut_dtype: str = "bf16"          # "bf16" | "int8" (~1.2x at B>=256)
    pv_shortlist: str = "auto"          # "auto" | "exact" | "approx"


#: Default dispatch registry (sql:188-202).
DEFAULT_DISPATCH = {
    "knn": "k_nearest_neighbour",
    "knn_in": "knn_in_exact",
    "knn_batch": "k_nearest_neighbour_ivfadc_batch",
    "knn_join": "knn_search_in_batch",
    "analogy": "analogy_3cosadd",
    "analogy_in": "analogy_3cosadd_in",
    "groups": "grouping_func",
    "cluster": "cluster_exact",
}


class Freddy:
    """The engine: vocabulary + vector store + index family + config.

    Equivalent of ``CREATE EXTENSION freddy`` + ``init(…)`` (sql:5-19): all
    "tables" are constructor arguments; indexes may be omitted and built
    later (methods raise a clear error when a required index is missing).
    """

    def __init__(self, store: VectorStore, *, pq: PQIndex | None = None,
                 ivfadc: IVFADCIndex | None = None,
                 ivpq: IVPQIndex | None = None,
                 params: RuntimeParams | None = None,
                 exact_dtype: str = "float32",
                 exact_approx: bool = False) -> None:
        self.store = store
        self.pq = pq
        self.ivfadc = ivfadc
        self.ivpq = ivpq
        self.params = params or RuntimeParams()
        self.dispatch = dict(DEFAULT_DISPATCH)
        self.statistics: dict[str, Array] = {}
        #: named PreparedJoin handles (see :meth:`prepare_targets`)
        self.prepared_targets: dict[str, PreparedJoin] = {}
        self.tracker = GLOBAL_TRACKER
        # track_stages: emit the full 5-stage TRACK breakdown
        # (precomputation / query_construction / data_retrieval /
        # computation / total — freddy.c:527-651, ivpq_search_in.c:233-697).
        # The LUT-build stage is measured by an extra instrumentation-only
        # jitted build (the production kernels keep it fused), so it's off
        # by default; step_wise_time_measurement.py turns it on.
        self.track_stages = False
        # exact_dtype/exact_approx: the engine's exact family defaults to
        # the bit-faithful reference configuration (f32 table, lossless
        # top-k). Serving deployments should pass "bfloat16"/approx=True —
        # the bench-measured production scan (~10x faster at 3M, recall
        # ~0.99); "int8" halves HBM again.
        self.exact = ExactIndex(store.vectors_norm, exact_dtype,
                                approx=exact_approx)
        self.mesh = None          # set by enable_sharding()
        self._shard: dict = {}

    # ------------------------------------------------------------ sharding
    def enable_sharding(self, mesh) -> None:
        """Multi-chip mode: shard the vector table, PQ code table, and
        IVFADC inverted lists across the mesh's "rows" axis and route the
        query families through the collective search paths
        (parallel/sharding.py). The reference has no distributed story
        (SURVEY §2.5) — this is the TPU framework's scale-out axis.
        """
        from postgres_word2vec_tpu.parallel import sharding

        rows = mesh.shape[sharding.ROWS_AXIS]
        vpad, n_valid = sharding.pad_rows(self.store.vectors_norm, rows)
        self._shard = {
            "vectors": sharding.shard_rows(vpad, mesh),
            "valid": n_valid,
        }
        if self.pq is not None:
            cpad, _ = sharding.pad_rows(self.pq.codes, rows)
            self._shard["pq_codes"] = sharding.shard_rows(cpad, mesh)
        if self.ivfadc is not None:
            self._shard["ivf_bundle"] = sharding.shard_ivfadc(self.ivfadc,
                                                              mesh)
        self.mesh = mesh

    # ------------------------------------------------------------- builders
    #: ``build(preset=...)`` bundles. The DEFAULT build applies the OPQ
    #: rotation to the PQ family (measured at 3M×300, 12×256:
    #: recall@5 0.57 vs 0.446 raw at the same scan latency — the rotation
    #: is invisible at the API level: same m/k/code shapes, L2 distances
    #: invariant). "reference" pins the reference's own quantizer (no
    #: rotation, sampled init) for apples-to-apples parity measurements;
    #: "quality" is this framework's best measured operating regime at 3M
    #: (reports/opq4bit_3M.json, reports/ivfadc4bit_3M.json): OPQ + 4-bit
    #: 60×16 codes for PQ, 4-bit residuals for IVFADC, kmeans++ Lloyd —
    #: requires d divisible by 60.
    PRESETS = {
        "reference": dict(opq_iters=0),
        "quality": dict(pq_m=60, pq_k=16, opq_iters=10, ivfadc_m=60,
                        ivfadc_k=16, ivpq_m=60, ivpq_k=16, iters=25,
                        init="kmeans++"),
    }

    @classmethod
    def build(cls, store: VectorStore, *, seed: int = 0,
              preset: str | None = None,
              with_pq: bool = True, with_ivfadc: bool = True,
              with_ivpq: bool = True, pq_m: int | None = None,
              pq_k: int | None = None, ivfadc_m: int | None = None,
              ivfadc_k: int | None = None, k_coarse: int = 1000,
              ivpq_m: int | None = None, ivpq_k: int | None = None,
              ivpq_k_coarse: int = 32,
              ivpq_coarse_positions: int = 2,
              train_size: int | None = 100_000, iters: int | None = None,
              init: str | None = None, restarts: int = 1,
              opq_iters: int | None = None,
              aniso_eta: float | None = None, mesh=None,
              exact_dtype: str = "float32",
              exact_approx: bool = False) -> "Freddy":
        """Train every requested index family on the store's normalized
        vectors (build drivers pq_index.py / ivfadc.py / ivpq.py parity;
        hyperparameter defaults from index_creation/config/*.json).

        ``preset`` selects a parameter bundle (:attr:`PRESETS`) — explicit
        keyword arguments always win over the preset. Quality knobs beyond
        the reference: ``init``/``restarts`` (k-means quality),
        ``opq_iters`` (OPQ rotation for the PQ family), ``aniso_eta``
        (anisotropic codebook refinement, ops/kmeans.anisotropic_refine),
        ``ivpq_coarse_positions=1`` (flat coarse quantizer — the
        reference's non-USE_MULTI_COARSE variant, far better cell locality
        on TPU). ``mesh``: optional jax Mesh — the engine comes up in
        multi-chip mode (see :meth:`enable_sharding`)."""
        base = dict(pq_m=12, pq_k=256, ivfadc_m=12, ivfadc_k=256,
                    ivpq_m=30, ivpq_k=32, iters=10, init="sample",
                    opq_iters=10)
        if preset is not None:
            if preset not in cls.PRESETS:
                raise ValueError(f"unknown preset {preset!r}; "
                                 f"one of {sorted(cls.PRESETS)}")
            base.update(cls.PRESETS[preset])
        pq_m = base["pq_m"] if pq_m is None else pq_m
        pq_k = base["pq_k"] if pq_k is None else pq_k
        ivfadc_m = base["ivfadc_m"] if ivfadc_m is None else ivfadc_m
        ivfadc_k = base["ivfadc_k"] if ivfadc_k is None else ivfadc_k
        ivpq_m = base["ivpq_m"] if ivpq_m is None else ivpq_m
        ivpq_k = base["ivpq_k"] if ivpq_k is None else ivpq_k
        iters = base["iters"] if iters is None else iters
        init = base["init"] if init is None else init
        opq_iters = base["opq_iters"] if opq_iters is None else opq_iters
        key = jax.random.PRNGKey(seed)
        kp, ki, kv = jax.random.split(key, 3)
        vecs = store.vectors_norm
        n = vecs.shape[0]
        eff_train = None if train_size is None else min(train_size, n)
        pq = PQIndex.build(kp, vecs, m=pq_m, k=pq_k, train_size=eff_train,
                           iters=iters, init=init, restarts=restarts,
                           opq_iters=opq_iters,
                           aniso_eta=aniso_eta) if with_pq else None
        ivf = IVFADCIndex.build(
            ki, vecs, m=ivfadc_m, k=ivfadc_k,
            k_coarse=min(k_coarse, max(n // 2, 1)), train_size=eff_train,
            iters=iters, init=init,
            restarts=restarts) if with_ivfadc else None
        ivpq = IVPQIndex.build(
            kv, vecs, m=ivpq_m, k=ivpq_k, k_coarse=ivpq_k_coarse,
            coarse_positions=ivpq_coarse_positions,
            train_size=eff_train, iters=iters, init=init,
            restarts=restarts) if with_ivpq else None
        eng = cls(store, pq=pq, ivfadc=ivf, ivpq=ivpq,
                  exact_dtype=exact_dtype, exact_approx=exact_approx)
        if mesh is not None:
            eng.enable_sharding(mesh)
        return eng

    # ----------------------------------------------------- config setters
    # (sql:21-75 — each one-liner regenerated a SQL getter; here they are
    # plain attribute writes kept as methods for API parity.)
    def set_pvf(self, pvf: int) -> None:
        self.params.pvf = int(pvf)

    def set_w(self, w: int) -> None:
        self.params.w = int(w)

    def set_alpha(self, alpha: int) -> None:
        self.params.alpha = int(alpha)

    def set_method_flag(self, method: int) -> None:
        self.params.method = int(method)

    def set_use_targetlist(self, flag: bool) -> None:
        self.params.use_targetlist = bool(flag)

    def set_confidence_value(self, confidence: float) -> None:
        self.params.confidence = float(confidence)

    def set_long_codes_threshold(self, threshold: float) -> None:
        self.params.long_codes_threshold = float(threshold)

    def set_pq_lut_dtype(self, dtype: str) -> None:
        """Select the PQ scan's LUT arithmetic: "bf16" (default) or "int8"
        (per-query quantized LUTs on the MXU int8 path — measured ~1.16×
        at B=256 plus half the LUT bytes, reports/ROOFLINE.md;
        beyond-reference perf knob, no reference counterpart).

        Applies on the TPU backend to both the single-device scan paths
        and the mesh-sharded ADC programs (per-shard kernels); the XLA
        gather backend has no quantized variant and ignores it."""
        if dtype not in ("bf16", "int8"):
            raise ValueError(f"pq_lut_dtype must be 'bf16' or 'int8', "
                             f"got {dtype!r}")
        self.params.pq_lut_dtype = dtype

    def set_pv_shortlist(self, policy: str) -> None:
        """Select the post-verification shortlist policy for the PQ PV
        path: "auto" (default — approx partial-reduce shortlist on TPU
        when k·pvf ≥ 100, exact otherwise), "exact", or "approx". The
        final re-rank is exact either way; see
        :meth:`models.pq.PQIndex.search_pv` (beyond-reference perf knob,
        no reference counterpart)."""
        if policy not in ("auto", "exact", "approx"):
            raise ValueError(f"pv_shortlist must be auto|exact|approx, "
                             f"got {policy!r}")
        if policy != "auto" and self.mesh is not None:
            import warnings
            warnings.warn(
                "pv_shortlist has no effect on mesh-sharded PQ paths "
                "(the sharded PV program always uses the per-shard exact "
                "shortlist); it applies when sharding is disabled.",
                stacklevel=2)
        self.params.pv_shortlist = policy

    def set_statistics_table(self, name: str | None) -> None:
        if name is not None and name not in self.statistics:
            raise KeyError(f"no statistics table {name!r}; call "
                           "create_statistics first")
        self.params.statistics_table = name

    def set_track_stages(self, flag: bool) -> None:
        """Enable the full 5-stage TRACK breakdown (see __init__)."""
        self.track_stages = bool(flag)

    def _track_precompute(self, queries: Array, centroids: Array) -> None:
        """Instrumentation-only LUT-build timing (TRACK
        ``precomputation_time``, freddy.c:519-527 / ivpq_search_in.c:
        261-291): runs the same per-query LUT construction the fused kernel
        performs, separately jitted and materialized so its true cost is
        observable. Only called when ``track_stages`` is on."""
        import time as _time

        t0 = _time.perf_counter()
        luts = _jitted_luts(queries, centroids)
        np.asarray(luts[0, 0, 0])
        self.tracker.track("precomputation_time",
                           _time.perf_counter() - t0)

    def _track_data_retrieval(self, codes: Array, tids: Array) -> None:
        """Instrumentation-only target-code gather timing (TRACK
        ``data_retrieval_time``): the reference measures the SPI fetch of
        target codes as its own stage (freddy.c:527-651); the TPU analog —
        the (T, m) gather the fused in-set kernel performs — is re-run
        separately jitted and materialized so the stage breakdown in
        step_wise_time_measurement reproduces faithfully. Only called when
        ``track_stages`` is on."""
        import time as _time

        t0 = _time.perf_counter()
        rows = _jitted_gather_codes(codes, tids)
        np.asarray(rows[0, 0])
        self.tracker.track("data_retrieval_time",
                           _time.perf_counter() - t0)

    # -------------------------------------------------- dispatch setters
    # (sql:78-132)
    def _set_dispatch(self, op: str, impl_name: str) -> None:
        if not hasattr(self, impl_name):
            raise KeyError(f"unknown implementation {impl_name!r}")
        self.dispatch[op] = impl_name

    def set_knn_function(self, name: str) -> None:
        self._set_dispatch("knn", name)

    def set_knn_in_function(self, name: str) -> None:
        self._set_dispatch("knn_in", name)

    def set_knn_batch_function(self, name: str) -> None:
        self._set_dispatch("knn_batch", name)

    def set_knn_join_function(self, name: str) -> None:
        self._set_dispatch("knn_join", name)

    def set_analogy_function(self, name: str) -> None:
        self._set_dispatch("analogy", name)

    def set_analogy_in_function(self, name: str) -> None:
        self._set_dispatch("analogy_in", name)

    def set_groups_function(self, name: str) -> None:
        self._set_dispatch("groups", name)

    def set_cluster_function(self, name: str) -> None:
        self._set_dispatch("cluster", name)

    # ------------------------------------------------------------ helpers
    def _query_matrix(self, query) -> Array:
        """Token / vector / batch → normalized (B, d) query matrix."""
        if isinstance(query, str):
            return self.store.vector_for(query)[None, :]
        if isinstance(query, (list, tuple)) and query and isinstance(
                query[0], str):
            return self.store.vectors_for(list(query))
        q = jnp.asarray(np.asarray(query, np.float32))
        if q.ndim == 1:
            q = q[None, :]
        return vo.vec_normalize(q)

    def _target_ids(self, targets) -> tuple[Array, Array]:
        """Word set / id set → padded (ids, mask)."""
        if len(targets) == 0:
            raise ValueError("empty target set")
        if isinstance(targets[0], str):
            ids = self.store.get_ids(targets, strict=False)
        else:
            ids = [int(t) for t in targets]
        arr = jnp.asarray(ids, jnp.int32)
        return arr, jnp.ones((len(ids),), bool)

    def _format_knn(self, dists: Array, ids: Array) -> list[list[tuple]]:
        """(B, k) device results → per-query [(word, similarity), …].

        The sim map runs on HOST numpy: an eager device op here costs a
        full dispatch round trip per call (~0.8 s on the tunneled chip —
        measured; it was the serving path's bottleneck), vs one small
        (B, k) transfer plus microseconds of host math.
        """
        sims = vo.sim_from_sqdist(np.asarray(dists))  # host numpy math
        ids_np = np.asarray(ids)
        out = []
        for b in range(ids_np.shape[0]):
            rows = [(self.store.words[i], float(s))
                    for i, s in zip(ids_np[b], sims[b]) if i >= 0]
            out.append(rows)
        return out

    def _format_join(self, queries: Sequence[str], dists: Array,
                     ids: Array) -> list[tuple]:
        per_query = self._format_knn(dists, ids)
        return [(q, w, s) for q, rows in zip(queries, per_query)
                for (w, s) in rows]

    def _pad_q(self, q: Array) -> tuple[Array, int]:
        """Pad the query batch to a multiple of the mesh's q axis."""
        from postgres_word2vec_tpu.parallel import sharding
        qx = self.mesh.shape[sharding.Q_AXIS]
        b = q.shape[0]
        pad = (-b) % qx
        if pad:
            q = jnp.pad(q, ((0, pad), (0, 0)))
        return q, b

    def _require(self, index, name: str):
        if index is None:
            raise RuntimeError(f"{name} index not built — pass it to the "
                               f"constructor or use Freddy.build()")
        return index

    def _active_statistics(self) -> Array | None:
        if self.params.statistics_table is None:
            return None
        return self.statistics[self.params.statistics_table]

    # ========================================================== kNN family
    def knn(self, query, k: int) -> list[tuple]:
        """Generic kNN façade (sql:204-214) → [(word, similarity), …]."""
        return getattr(self, self.dispatch["knn"])(query, k)

    # Per-family batched cores: (B, d) query matrix → (dists, ids), with
    # mesh-sharded routing where a collective path exists. The single-query
    # façades and the server's /knn micro-batcher (which coalesces many
    # clients into one matrix) both run through these.
    def _exact_knn_core(self, q: Array, k: int) -> tuple[Array, Array]:
        if self.mesh is not None:
            from postgres_word2vec_tpu.parallel import sharding
            qp, b = self._pad_q(q)
            d, i = sharding.sharded_exact_top_k(
                self.mesh, qp, self._shard["vectors"], k,
                valid_rows=self._shard["valid"])
            return d[:b], i[:b]
        return self.exact.search(q, k)

    def _mesh_luts(self, pq, qp: Array) -> Array:
        """LUTs for the mesh cores as a single jitted dispatch (rotation
        fused in when the codebook is OPQ-rotated)."""
        if pq.rotation is None:
            return _jitted_luts(qp, pq.codebook.centroids)
        return _jitted_rotate_luts(qp, pq.rotation, pq.codebook.centroids)

    def _pq_impl(self) -> str | None:
        """Scan-impl override from ``pq_lut_dtype``: the int8 path applies
        only on the TPU backend (the XLA gather path has no quantized
        variant); None keeps PQIndex's backend auto-select."""
        if self.params.pq_lut_dtype == "int8":
            from postgres_word2vec_tpu.ops import pallas_kernels as pk
            if pk.supports_pallas():
                return "pallas_int8"
        return None

    def _mesh_lut_dtype(self) -> str:
        """LUT arithmetic for the mesh-sharded ADC programs: the int8 knob
        applies per shard when the Pallas kernels run (TPU); the XLA twin
        has no quantized variant and ignores it."""
        if self.params.pq_lut_dtype == "int8":
            from postgres_word2vec_tpu.ops import pallas_kernels as pk
            if pk.supports_pallas():
                return "int8"
        return "bf16"

    def _pq_knn_core(self, q: Array, k: int) -> tuple[Array, Array]:
        pq = self._require(self.pq, "PQ")
        if self.mesh is not None:
            from postgres_word2vec_tpu.parallel import sharding
            qp, b = self._pad_q(q)
            luts = self._mesh_luts(pq, qp)
            d, i = sharding.sharded_adc_top_k(
                self.mesh, luts, self._shard["pq_codes"], k,
                valid_rows=pq.size, lut_dtype=self._mesh_lut_dtype())
            return d[:b], i[:b]
        return pq.search(q, k, impl=self._pq_impl())

    def _pq_pv_knn_core(self, q: Array, k: int) -> tuple[Array, Array]:
        pq = self._require(self.pq, "PQ")
        if self.mesh is not None:
            from postgres_word2vec_tpu.parallel import sharding
            qp, b = self._pad_q(q)
            luts = self._mesh_luts(pq, qp)
            cd, ci = sharding.sharded_adc_top_k(
                self.mesh, luts, self._shard["pq_codes"],
                k * self.params.pvf, valid_rows=pq.size,
                lut_dtype=self._mesh_lut_dtype())
            d, i = sharding.sharded_post_verify(
                self.mesh, qp, cd, ci, self._shard["vectors"], k)
            return d[:b], i[:b]
        return pq.search_pv(q, k, self.params.pvf, self.store.vectors_norm,
                            impl=self._pq_impl(),
                            shortlist=self.params.pv_shortlist)

    def _ivfadc_knn_core(self, q: Array, k: int) -> tuple[Array, Array]:
        ivf = self._require(self.ivfadc, "IVFADC")
        if self.mesh is not None:
            from postgres_word2vec_tpu.parallel import sharding
            qp, b = self._pad_q(q)
            d, i = sharding.sharded_ivfadc_adaptive(
                self.mesh, qp, self._shard["ivf_bundle"], k=k,
                w=self.params.w)
            return d[:b], i[:b]
        return ivf.search_adaptive(q, k, w=self.params.w)

    def _ivfadc_pv_knn_core(self, q: Array, k: int) -> tuple[Array, Array]:
        ivf = self._require(self.ivfadc, "IVFADC")
        if self.mesh is not None:
            from postgres_word2vec_tpu.parallel import sharding
            qp, b = self._pad_q(q)
            cd, ci = sharding.sharded_ivfadc_adaptive(
                self.mesh, qp, self._shard["ivf_bundle"],
                k=k * self.params.pvf, w=self.params.w)
            d, i = sharding.sharded_post_verify(
                self.mesh, qp, cd, ci, self._shard["vectors"], k)
            return d[:b], i[:b]
        return ivf.search_pv(q, k, self.params.pvf,
                             self.store.vectors_norm, w=self.params.w)

    _KNN_CORES = {
        "k_nearest_neighbour": "_exact_knn_core",
        "k_nearest_neighbour_pq": "_pq_knn_core",
        "k_nearest_neighbour_pq_pv": "_pq_pv_knn_core",
        "k_nearest_neighbour_ivfadc": "_ivfadc_knn_core",
        "k_nearest_neighbour_ivfadc_pv": "_ivfadc_pv_knn_core",
    }

    def knn_matrix(self, q: Array, k: int) -> tuple[Array, Array]:
        """Batched kNN over a prepared (B, d) matrix, honoring the
        ``dispatch['knn']`` family (incl. mesh-sharded routing)."""
        impl = self.dispatch["knn"]
        return getattr(self, self._KNN_CORES[impl])(q, k)

    def k_nearest_neighbour(self, query, k: int) -> list[tuple]:
        """Exact full-scan kNN (sql:426-454)."""
        q = self._query_matrix(query)
        with self.tracker.stage("total_time"):
            d, i = self._exact_knn_core(q, k)
        return self._format_knn(d, i)[0]

    def k_nearest_neighbour_pq(self, query, k: int) -> list[tuple]:
        """PQ ADC kNN (sql:593-622 → pq_search)."""
        q = self._query_matrix(query)
        with self.tracker.stage("total_time"):
            d, i = self._pq_knn_core(q, k)
        return self._format_knn(d, i)[0]

    def k_nearest_neighbour_pq_pv(self, query, k: int) -> list[tuple]:
        """PQ + post-verification (sql:625-662)."""
        q = self._query_matrix(query)
        with self.tracker.stage("total_time"):
            d, i = self._pq_pv_knn_core(q, k)
        return self._format_knn(d, i)[0]

    def k_nearest_neighbour_ivfadc(self, query, k: int) -> list[tuple]:
        """IVFADC kNN with widening semantics (sql:503-532 → ivfadc_search)."""
        q = self._query_matrix(query)
        with self.tracker.stage("total_time"):
            d, i = self._ivfadc_knn_core(q, k)
        return self._format_knn(d, i)[0]

    def k_nearest_neighbour_ivfadc_pv(self, query, k: int) -> list[tuple]:
        """IVFADC + post-verification (sql:556-591)."""
        q = self._query_matrix(query)
        with self.tracker.stage("total_time"):
            d, i = self._ivfadc_pv_knn_core(q, k)
        return self._format_knn(d, i)[0]

    # ------------------------------------------------------------- batches
    def knn_batch(self, queries: Sequence[str], k: int) -> list[tuple]:
        """Generic batch façade (sql:216-230) → [(query, word, sim), …]."""
        return getattr(self, self.dispatch["knn_batch"])(queries, k)

    def k_nearest_neighbour_ivfadc_batch(self, queries: Sequence[str],
                                         k: int) -> list[tuple]:
        """Batched IVFADC (sql:535-554 → ivfadc_batch_search)."""
        ivf = self._require(self.ivfadc, "IVFADC")
        q = self._query_matrix(list(queries))
        with self.tracker.stage("total_time"):
            if self.mesh is not None:
                from postgres_word2vec_tpu.parallel import sharding
                qp, b = self._pad_q(q)
                d, i = sharding.sharded_ivfadc_adaptive(
                    self.mesh, qp, self._shard["ivf_bundle"],
                    w=self.params.w, k=k)
                d, i = d[:b], i[:b]
            else:
                d, i = ivf.search_adaptive(q, k, w=self.params.w)
        return self._format_join(list(queries), d, i)

    def knn_batch_exact(self, queries: Sequence[str], k: int) -> list[tuple]:
        """Exact batch (the plpgsql loop of knn_search_in_batch over the full
        table, done as one matmul)."""
        q = self._query_matrix(list(queries))
        with self.tracker.stage("total_time"):
            d, i = self.exact.search(q, k)
        return self._format_join(list(queries), d, i)

    # -------------------------------------------------------------- in-set
    def knn_in(self, query, k: int, targets) -> list[tuple]:
        """Generic restricted façade (sql:232-246)."""
        return getattr(self, self.dispatch["knn_in"])(query, k, targets)

    def _exact_in_core(self, q: Array, k: int, tids: Array,
                       tmask: Array) -> tuple[Array, Array]:
        if self.mesh is not None:
            from postgres_word2vec_tpu.parallel import sharding
            qp, b = self._pad_q(q)
            d, i = sharding.sharded_exact_in(self.mesh, qp,
                                             self._shard["vectors"],
                                             tids, tmask, k)
            return d[:b], i[:b]
        return self.exact.search_in(q, k, tids, tmask)

    def _pq_in_core(self, q: Array, k: int, tids: Array,
                    tmask: Array) -> tuple[Array, Array]:
        pq = self._require(self.pq, "PQ")
        if self.mesh is not None:
            from postgres_word2vec_tpu.parallel import sharding
            qp, b = self._pad_q(q)
            luts = self._mesh_luts(pq, qp)
            d, i = sharding.sharded_adc_in(self.mesh, luts,
                                           self._shard["pq_codes"],
                                           tids, tmask, k,
                                           lut_dtype=self._mesh_lut_dtype())
            return d[:b], i[:b]
        return pq.search_in(q, k, tids, tmask)

    #: dispatch impl → batched matrix core for the in-set family (used by
    #: the server's /knn_in micro-batcher; IVPQ has no fixed-shape matrix
    #: core — its round count is data-dependent — so it is absent and the
    #: server falls back to per-item calls).
    _KNN_IN_CORES = {
        "knn_in_exact": "_exact_in_core",
        "knn_in_pq": "_pq_in_core",
    }

    def knn_in_matrix(self, q: Array, k: int, tids: Array,
                      tmask: Array) -> tuple[Array, Array]:
        """Batched in-set kNN over a prepared (B, d) matrix + target id/mask
        arrays, honoring ``dispatch['knn_in']`` (incl. mesh routing).
        Raises :class:`NoMatrixCore` for dispatch impls without one."""
        impl = self.dispatch["knn_in"]
        core = self._KNN_IN_CORES.get(impl)
        if core is None:
            raise NoMatrixCore(f"no matrix core for knn_in impl {impl!r}")
        return getattr(self, core)(q, k, tids, tmask)

    def knn_in_exact(self, query, k: int, targets) -> list[tuple]:
        """Exact in-set kNN — all 4 reference overloads (token|vector ×
        words|ids), sql:991-1084."""
        q = self._query_matrix(query)
        tids, tmask = self._target_ids(targets)
        with self.tracker.stage("total_time"):
            d, i = self._exact_in_core(q, k, tids, tmask)
        return self._format_knn(d, i)[0]

    def knn_in_pq(self, query, k: int, targets) -> list[tuple]:
        """PQ in-set kNN (sql:664-680 → pq_search_in)."""
        q = self._query_matrix(query)
        tids, tmask = self._target_ids(targets)
        with self.tracker.stage("total_time"):
            d, i = self._pq_in_core(q, k, tids, tmask)
        return self._format_knn(d, i)[0]

    def knn_in_ivpq(self, query, k: int, targets) -> list[tuple]:
        """IVPQ in-set kNN (sql:682-718 → ivpq_search_in, B=1)."""
        rows = self.knn_in_ivpq_batch([query] if isinstance(query, str)
                                      else query, k, targets)
        return [(w, s) for (_q, w, s) in rows]

    # --------------------------------------------------------------- joins
    def knn_join(self, queries: Sequence[str], k: int,
                 targets) -> list[tuple]:
        """Generic kNN-join façade (sql:248-266) → [(query, target, sim)]."""
        return getattr(self, self.dispatch["knn_join"])(queries, k, targets)

    def _chunked_q(self, q: Array, fn, chunk: int = 1024):
        """Run a (B, d)-batched search in fixed-size query chunks (padded,
        so every chunk reuses one compiled program) — bounds the (B, T)
        intermediates at large join shapes. Chunks slice on HOST: each
        distinct eager device slice start compiles its own jaxpr (~0.4 s
        apiece on the tunnel — the round-2 first-join pathology)."""
        B = q.shape[0]
        if B <= chunk:
            return fn(q)
        q_host = np.asarray(q)
        outs_d, outs_i = [], []
        last_pad = 0
        for s in range(0, B, chunk):
            qc = q_host[s:s + chunk]
            last_pad = chunk - qc.shape[0] if s > 0 else 0
            if last_pad:
                qc = np.pad(qc, ((0, last_pad), (0, 0)))
            d, i = fn(qc)
            outs_d.append(d)
            outs_i.append(i)
        # Merge on HOST after ONE batched transfer: an eager
        # jnp.concatenate / pad-slice is traced+compiled on first call
        # (seconds on the tunnel) and would serialize behind the chunk
        # pipeline anyway; outputs are (chunk, k)-small.
        outs_d, outs_i = jax.device_get((outs_d, outs_i))
        if last_pad:
            outs_d[-1] = outs_d[-1][:-last_pad]
            outs_i[-1] = outs_i[-1][:-last_pad]
        return np.concatenate(outs_d, 0), np.concatenate(outs_i, 0)

    def knn_search_in_batch(self, queries: Sequence[str], k: int,
                            targets) -> list[tuple]:
        """Exact kNN-join (sql:456-501) — one batched masked matmul instead
        of a plpgsql loop over knn_in_exact."""
        q = self._query_matrix(list(queries))
        ph = self._resolve_prepared(targets)
        if ph is not None:   # id reuse only — exact has no tile layout
            tids, tmask = ph.target_ids, ph.target_mask
        else:
            tids, tmask = self._target_ids(targets)
        with self.tracker.stage("total_time"):
            d, i = self._chunked_q(
                q, lambda qc: self._exact_in_core(qc, k, tids, tmask))
        return self._format_join(list(queries), d, i)

    def knn_in_pq_batch(self, queries: Sequence[str], k: int,
                        targets) -> list[tuple]:
        """PQ kNN-join baseline (sql:846-901 → pq_search_in_batch).

        TRACK stages (freddy.c:519-651): query construction = query/target
        resolution; precomputation = per-query LUT build; data retrieval =
        the target-code gather (the reference's SPI ``WHERE id IN`` fetch,
        freddy.c:527-651) — both instrumented separately under
        ``track_stages`` (the production kernel fuses them into the scan);
        computation = the fused gather + ADC scan + top-k.
        """
        pq = self._require(self.pq, "PQ")
        with self.tracker.stage("total_time"):
            with self.tracker.stage("query_construction_time"):
                q = self._query_matrix(list(queries))
                ph = self._resolve_prepared(targets)
                if ph is not None:   # id reuse (PQ path has no tiling)
                    tids, tmask = ph.target_ids, ph.target_mask
                else:
                    tids, tmask = self._target_ids(targets)
            if self.track_stages:
                self._track_precompute(pq._rotate(q),
                                       pq.codebook.centroids)
                self._track_data_retrieval(pq.codes, tids)
            else:
                self.tracker.track("data_retrieval_time", 0.0)
            with self.tracker.stage("computation_time"):
                d, i = self._chunked_q(
                    q, lambda qc: self._pq_in_core(qc, k, tids, tmask),
                    chunk=512)
        return self._format_join(list(queries), d, i)

    def prepare_targets(self, targets, *, name: str | None = None
                        ) -> PreparedJoin:
        """Build a reusable join-target handle (words or ids) — the
        repeated-target-set fast path of :meth:`knn_in_ivpq_batch`.

        The reference's serving pattern joins against the same restricted
        domain over and over (the statistics-table workload,
        freddy--0.0.1.sql:150-171); this hoists the per-call target
        gathers + cell tiling into one upfront build (see
        :meth:`models.ivpq.IVPQIndex.prepare_join`). Pass the returned
        handle — or, if ``name`` was given, the name — as the ``targets``
        argument of ``knn_in_ivpq_batch`` / ``knn_join``.
        """
        ivpq = self._require(self.ivpq, "IVPQ")
        tids, tmask = self._target_ids(targets)
        ph = ivpq.prepare_join(tids, target_mask=tmask,
                               vectors=self.store.vectors_norm)
        if name is not None:
            self.prepared_targets[name] = ph
        return ph

    def _resolve_prepared(self, targets) -> PreparedJoin | None:
        if isinstance(targets, PreparedJoin):
            return targets
        if isinstance(targets, str):
            if targets not in self.prepared_targets:
                raise KeyError(f"no prepared target set {targets!r}; call "
                               "prepare_targets(..., name=...) first")
            return self.prepared_targets[targets]
        return None

    def knn_in_ivpq_batch(self, queries, k: int, targets) -> list[tuple]:
        """IVPQ kNN-join (sql:797-828 → ivpq_search_in) — the flagship batch
        path, honoring alpha/pvf/method/confidence/targetlist params.

        ``targets``: words/ids, a :class:`PreparedJoin` handle, or the
        name of a registered one (:meth:`prepare_targets`)."""
        ivpq = self._require(self.ivpq, "IVPQ")
        if isinstance(queries, (list, tuple)) and queries and isinstance(
                queries[0], str):
            names = list(queries)
        else:
            names = [f"q{i}" for i in range(np.asarray(queries).shape[0]
                                            if np.asarray(queries).ndim > 1
                                            else 1)]
        p = self.params
        with self.tracker.stage("total_time"):
            # stage names mirror the reference's TRACK metrics
            # (ivpq_search_in.c:233-697). "data retrieval" on TPU is the
            # target tiling build (moving target rows into scan layout —
            # the SPI-fetch analog), reported by search_join; it is ~0 on
            # a JoinTiles cache hit, exactly when no data moved.
            ph = self._resolve_prepared(targets)
            with self.tracker.stage("query_construction_time"):
                q = self._query_matrix(queries)
                if ph is not None:
                    tids, tmask = ph.target_ids, ph.target_mask
                else:
                    tids, tmask = self._target_ids(targets)
            if self.track_stages:
                self._track_precompute(q, ivpq.codebook.centroids)
            import time as _time
            t0 = _time.perf_counter()
            if self.mesh is not None:
                from postgres_word2vec_tpu.parallel import sharding
                qp, b = self._pad_q(q)
                d, i = sharding.sharded_ivpq_join(
                    self.mesh, ivpq, qp, k, tids, target_mask=tmask,
                    vectors=self.store.vectors_norm,
                    statistics=self._active_statistics(),
                    alpha=p.alpha, pvf=p.pvf, method=p.method,
                    confidence=p.confidence)
                d, i = d[:b], i[:b]
                info = None
            else:
                d, i, info = ivpq.search_join(
                    q, k, None if ph is not None else tids, prepared=ph,
                    target_mask=None if ph is not None else tmask,
                    vectors=(None if ph is not None
                             else self.store.vectors_norm),
                    statistics=self._active_statistics(),
                    alpha=p.alpha, pvf=p.pvf, method=p.method,
                    confidence=p.confidence,
                    long_codes_threshold=p.long_codes_threshold,
                    use_targetlists=p.use_targetlist,
                    lut_dtype=p.pq_lut_dtype, return_info=True)
            # materialize the (small) id block BEFORE reading the clock:
            # jax dispatch is async, and on mesh the search above returns
            # unmaterialized device arrays — timing the dispatch alone
            # under-reports computation_time (CLAUDE.md: block_until_ready
            # is not even sufficient; materialize to host).
            np.asarray(i)
            elapsed = _time.perf_counter() - t0
            dr = (info or {}).get("data_retrieval_s", 0.0)
            self.tracker.track("data_retrieval_time", dr)
            self.tracker.track("computation_time", max(elapsed - dr, 0.0))
            if info is not None:
                for r in np.asarray(info["retrieved"]):
                    self.tracker.track("retrieved", float(r))
                for t in np.asarray(info["target_count"]):
                    self.tracker.track("target_count", float(t))
        return self._format_join(names, d, i)

    # ============================================================= analogy
    def analogy(self, w1: str, w2: str, w3: str) -> str:
        """Generic analogy façade (sql:268-280)."""
        return getattr(self, self.dispatch["analogy"])(w1, w2, w3)

    def analogy_in(self, w1: str, w2: str, w3: str, targets) -> str:
        """Generic in-set analogy façade (sql:282-296)."""
        return getattr(self, self.dispatch["analogy_in"])(w1, w2, w3, targets)

    def _exclude(self, scores: Array, words: Sequence[str]) -> Array:
        ids = self.store.get_ids(words, strict=False)
        return scores.at[jnp.asarray(ids, jnp.int32)].set(-jnp.inf) \
            if ids else scores

    def _analogy_vec(self, w1: str, w2: str, w3: str) -> Array:
        """3CosAdd query vector v3 − v1 + v2 on normalized vectors
        (sql:1270-1288, comment "w3 - w1 + w2")."""
        v1, v2, v3 = (self.store.vector_for(w) for w in (w1, w2, w3))
        return (v3 - v1 + v2)

    def analogy_3cosadd(self, w1: str, w2: str, w3: str) -> str:
        """Default analogy: argmax cos(v3−v1+v2, v), inputs excluded
        (sql:1270-1288)."""
        q = self._analogy_vec(w1, w2, w3)
        scores = jnp.dot(self.store.vectors_norm, q,
                         preferred_element_type=jnp.float32)
        scores = self._exclude(scores, (w1, w2, w3))
        return self.store.words[int(jnp.argmax(scores))]

    def analogy_3cosadd_in(self, w1: str, w2: str, w3: str, targets) -> str:
        """In-set 3CosAdd (sql:1290-1314)."""
        q = self._analogy_vec(w1, w2, w3)
        tids, _ = self._target_ids(targets)
        tv = jnp.take(self.store.vectors_norm, tids, axis=0)
        scores = jnp.dot(tv, q, preferred_element_type=jnp.float32)
        words = self.store.get_words(np.asarray(tids))
        banned = {w1, w2, w3}
        order = np.argsort(-np.asarray(scores))
        for j in order:
            if words[j] not in banned:
                return words[j]
        raise ValueError("no admissible analogy result in target set")

    def analogy_3cosmul(self, w1: str, w2: str, w3: str) -> str:
        """3CosMul with the reference's shifted-cosine form
        ((cos+1)/2 ratios, ε=0.001; sql:1231-1248)."""
        v = self.store.vectors_norm
        c1, c2, c3 = (jnp.dot(v, self.store.vector_for(w),
                              preferred_element_type=jnp.float32)
                      for w in (w1, w2, w3))
        scores = (((c3 + 1.0) / 2.0) * ((c2 + 1.0) / 2.0)) / (
            ((c1 + 1.0) / 2.0) + 0.001)
        scores = self._exclude(scores, (w1, w2, w3))
        return self.store.words[int(jnp.argmax(scores))]

    def analogy_pair_direction(self, w1: str, w2: str, w3: str) -> str:
        """argmax cos(norm(v1−v2), norm(v3−v4)) over v4, on RAW vectors
        (sql:1212-1229)."""
        raw = self.store.vectors
        v1, v2, v3 = (self.store.vector_for(w, normalized=False)
                      for w in (w1, w2, w3))
        dir_q = vo.vec_normalize(v1 - v2)
        diffs = vo.vec_normalize(v3[None, :] - raw)
        scores = jnp.dot(diffs, dir_q, preferred_element_type=jnp.float32)
        scores = self._exclude(scores, (w1, w2, w3))
        return self.store.words[int(jnp.argmax(scores))]

    def analogy_3cosadd_pq(self, w1: str, w2: str, w3: str) -> str:
        """PQ-accelerated 3CosAdd: ADC shortlist of pvf+3 then exact re-rank
        (sql:1317-1346)."""
        pq = self._require(self.pq, "PQ")
        q = vo.vec_normalize(self._analogy_vec(w1, w2, w3))[None, :]
        # shortlist="exact": the analogy pick takes ONE candidate from a
        # pvf+3-wide shortlist; set_pvf(97+) would otherwise cross the
        # auto-approx width threshold and silently flip this documented
        # exact path to the approximate shortlist.
        d, i = pq.search_pv(q, self.params.pvf + 3, 1,
                            self.store.vectors_norm, shortlist="exact")
        return self._pick_not_banned(i[0], (w1, w2, w3))

    def analogy_3cosadd_ivfadc(self, w1: str, w2: str, w3: str) -> str:
        """IVFADC-accelerated 3CosAdd (sql:1428-1459)."""
        ivf = self._require(self.ivfadc, "IVFADC")
        q = vo.vec_normalize(self._analogy_vec(w1, w2, w3))[None, :]
        d, i = ivf.search_pv(q, self.params.pvf + 3, 1,
                             self.store.vectors_norm, w=self.params.w)
        return self._pick_not_banned(i[0], (w1, w2, w3))

    def analogy_3cosadd_in_pq(self, w1: str, w2: str, w3: str,
                              targets) -> str:
        """In-set PQ-accelerated 3CosAdd (sql:1348-1381)."""
        pq = self._require(self.pq, "PQ")
        q = vo.vec_normalize(self._analogy_vec(w1, w2, w3))[None, :]
        tids, tmask = self._target_ids(targets)
        d, i = pq.search_in(q, min(self.params.pvf + 3, tids.shape[0]),
                            tids, tmask)
        return self._pick_not_banned(i[0], (w1, w2, w3))

    def analogy_3cosadd_in_ivpq(self, w1: str, w2: str, w3: str,
                                targets) -> str:
        """In-set IVPQ-accelerated 3CosAdd (sql:1383-1425)."""
        ivpq = self._require(self.ivpq, "IVPQ")
        q = vo.vec_normalize(self._analogy_vec(w1, w2, w3))[None, :]
        tids, tmask = self._target_ids(targets)
        p = self.params
        d, i = ivpq.search_join(
            q, min(p.pvf + 3, tids.shape[0]), tids, target_mask=tmask,
            vectors=self.store.vectors_norm,
            statistics=self._active_statistics(), alpha=p.alpha, pvf=p.pvf,
            method=p.method, confidence=p.confidence,
            long_codes_threshold=p.long_codes_threshold,
            lut_dtype=p.pq_lut_dtype)
        return self._pick_not_banned(i[0], (w1, w2, w3))

    def _pick_not_banned(self, ids: Array, banned_words) -> str:
        banned = set(banned_words)
        for i in np.asarray(ids):
            if i >= 0 and self.store.words[int(i)] not in banned:
                return self.store.words[int(i)]
        raise ValueError("analogy shortlist exhausted — raise pvf")

    # ============================================================ grouping
    def groups(self, tokens: Sequence[str],
               group_tokens: Sequence[str]) -> list[tuple]:
        """Generic grouping façade (sql:298-312)."""
        return getattr(self, self.dispatch["groups"])(tokens, group_tokens)

    def grouping_func(self, tokens: Sequence[str],
                      group_tokens: Sequence[str]) -> list[tuple]:
        """Exact grouping: each token → nearest group token (sql:1462-1484,
        a loop of knn_in(token, 1, groups); one batched matmul here)."""
        toks = [t for t in tokens if t in self.store]
        q = self.store.vectors_for(toks)
        tids, tmask = self._target_ids(list(group_tokens))
        d, i = self.exact.search_in(q, 1, tids, tmask)
        ids = np.asarray(i)[:, 0]
        return [(t, self.store.words[int(g)]) for t, g in zip(toks, ids)
                if g >= 0]

    def grouping_func_pq(self, tokens: Sequence[str],
                         group_tokens: Sequence[str]) -> list[tuple]:
        """PQ-code grouping (sql:1487-1509 → grouping_pq, freddy.c:1176-1401):
        distances computed on the tokens' PQ codes against per-group LUTs."""
        pq = self._require(self.pq, "PQ")
        toks = [t for t in tokens if t in self.store]
        token_ids = jnp.asarray(self.store.get_ids(toks), jnp.int32)
        gids, gmask = self._target_ids(list(group_tokens))
        gq = jnp.take(self.store.vectors_norm, gids, axis=0)
        # LUTs for each group vector; ADC over token code rows; argmin group.
        from postgres_word2vec_tpu.ops import adc, lut
        luts = lut.build_luts(gq, pq.codebook.centroids)       # (G, m, k)
        token_codes = jnp.take(pq.codes, token_ids, axis=0)    # (T, m)
        dists = adc.adc_distances(luts, token_codes)           # (G, T)
        dists = jnp.where(gmask[:, None], dists, jnp.inf)
        best = np.asarray(jnp.argmin(dists, axis=0))
        gids_np = np.asarray(gids)
        return [(t, self.store.words[int(gids_np[g])])
                for t, g in zip(toks, best)]

    # ========================================================== clustering
    def cluster(self, tokens: Sequence[str], k: int) -> list[tuple]:
        """Generic clustering façade (sql:314-332) → [(word, cluster), …]."""
        return getattr(self, self.dispatch["cluster"])(tokens, k)

    def _generic_cluster(self, tokens: Sequence[str], k: int,
                         join_fn: Callable, *, seed: int = 0,
                         iters: int = 10) -> list[tuple]:
        """k-means over a token set (``generic_cluster``, sql:1086-1170):
        k random token vectors as initial centroids, 10 rounds of
        assign-via-kNN-join + centroid-of-≤10-sampled-members; empty
        clusters keep their centroid; cluster ids are 1-based."""
        toks = [t for t in tokens if t in self.store]
        vecs = np.asarray(self.store.vectors_for(toks))
        rng = np.random.default_rng(seed)
        centroids = vecs[rng.integers(0, len(toks), size=k)]
        assign = np.zeros(len(toks), np.int64)
        for it in range(iters):
            d, i = join_fn(jnp.asarray(centroids), len(toks))
            # token → its best (most similar) centroid. One device
            # scatter-min over a (k, T) table replaces the round-1 host
            # k×T python loop.
            assign_new = np.asarray(_cluster_assign(d, i, len(toks)))
            assign = np.where(assign_new >= 0, assign_new, assign)
            if it < iters - 1:
                for c in range(k):
                    members = np.flatnonzero(assign == c)
                    if len(members) == 0:
                        continue
                    # ≤10 sampled members, with replacement (sql:1131-1151)
                    sample = members[rng.integers(0, len(members), size=10)]
                    centroids[c] = vecs[sample].mean(0)
        return [(t, int(c) + 1) for t, c in zip(toks, assign)]

    def _make_join_fn(self, impl: str, toks: list[str]):
        local_ids = jnp.arange(len(toks), dtype=jnp.int32)
        tvecs = self.store.vectors_for(toks)

        def exact_join(centroids: Array, kk: int):
            idx = ExactIndex(tvecs, self.exact.compute_dtype)
            return idx.search(vo.vec_normalize(centroids), kk)

        def pq_join(centroids: Array, kk: int):
            pq = self._require(self.pq, "PQ")
            tids = jnp.asarray(self.store.get_ids(toks), jnp.int32)
            d, i = pq.search_in(vo.vec_normalize(centroids), kk, tids)
            return d, _globals_to_locals(i, tids)

        def ivpq_join(centroids: Array, kk: int):
            ivpq = self._require(self.ivpq, "IVPQ")
            tids = jnp.asarray(self.store.get_ids(toks), jnp.int32)
            p = self.params
            d, i = ivpq.search_join(
                vo.vec_normalize(centroids), kk, tids,
                vectors=self.store.vectors_norm,
                statistics=self._active_statistics(), alpha=p.alpha,
                pvf=p.pvf, method=p.method, confidence=p.confidence,
                long_codes_threshold=p.long_codes_threshold,
                lut_dtype=p.pq_lut_dtype)
            return d, _globals_to_locals(i, tids)

        return {"exact": exact_join, "pq": pq_join, "ivpq": ivpq_join}[impl]

    def cluster_exact(self, tokens: Sequence[str], k: int) -> list[tuple]:
        """(sql:1172-1182)"""
        toks = [t for t in tokens if t in self.store]
        return self._generic_cluster(toks, k, self._make_join_fn("exact",
                                                                 toks))

    def cluster_pq(self, tokens: Sequence[str], k: int) -> list[tuple]:
        """(sql:1198-1209)"""
        toks = [t for t in tokens if t in self.store]
        return self._generic_cluster(toks, k, self._make_join_fn("pq", toks))

    def cluster_ivpq(self, tokens: Sequence[str], k: int) -> list[tuple]:
        """(sql:1185-1196)"""
        toks = [t for t in tokens if t in self.store]
        return self._generic_cluster(toks, k, self._make_join_fn("ivpq",
                                                                 toks))

    # ============================================================ tokenize
    def tokenize(self, text: str) -> np.ndarray | None:
        """Normalized centroid of the known words' normalized vectors
        (sql:1513-1524). None when no word is known (SQL returns NULL)."""
        words = [w for w in text.split(" ") if w in self.store]
        if not words:
            return None
        c = vo.centroid(self.store.vectors_for(words))
        return np.asarray(vo.vec_normalize(c))

    def tokenize_raw(self, text: str) -> np.ndarray | None:
        """Unnormalized centroid of RAW vectors (sql:1527-1536)."""
        words = [w for w in text.split(" ") if w in self.store]
        if not words:
            return None
        return np.asarray(vo.centroid(
            self.store.vectors_for(words, normalized=False)))

    # ========================================================== statistics
    def create_statistics(self, name: str, domain_words: Sequence[str]
                          ) -> None:
        """Build a named per-cell frequency table for a word domain
        (sql:150-171 ``create_statistics``; consumed by IVPQ probing).
        Also activates it (the reference's auto-set DO block, sql:173-186).
        """
        ivpq = self._require(self.ivpq, "IVPQ")
        ids = jnp.asarray(self.store.get_ids(domain_words, strict=False),
                          jnp.int32)
        self.statistics[name] = build_statistics(ivpq.cell_of, ids,
                                                 ivpq.num_cells)
        self.params.statistics_table = name

    def autotune(self, *, target_recall: float = 0.9, k: int = 10,
                 sample: int = 256, seed: int = 0,
                 apply: bool = True) -> list[dict]:
        """Measure every built kNN family on a sampled workload and select
        the fastest configuration meeting ``target_recall`` (recall@k vs
        this engine's exact ground truth on ``sample`` random store rows).

        Beyond-reference feature (faiss-autotune-style): the reference
        requires choosing pvf/w and the dispatch function by hand from its
        published tables. Candidates: exact, PQ scan, PQ+PV (pvf sweep),
        IVFADC (w sweep), IVFADC+PV. Measurement uses the batched matrix
        cores, so results transfer directly to knn/knn_batch serving at
        the same batch shape.

        ``apply=True`` installs the winner: ``dispatch["knn"]`` plus the
        winner's pvf/w — which are GLOBAL runtime params (reference
        semantics: ``set_pvf``/``set_w`` are engine-wide), so other
        families invoked explicitly afterwards also see them. Returns the
        per-candidate report sorted fastest-first; entries carry ``name``,
        ``params``, ``recall``, ``seconds``, ``meets_target``, and
        ``chosen`` on the installed winner.
        """
        from postgres_word2vec_tpu.evaluation.benchutil import (recall_at_k,
                                                                timeit)

        n = self.store.size
        rng = np.random.default_rng(seed)
        sel = jnp.asarray(rng.choice(n, size=min(sample, n), replace=False))
        q = jnp.take(self.store.vectors_norm, sel, axis=0)
        # approx=False: the engine's exact index may itself be configured
        # approximate (exact_approx=True) — ground truth must not be.
        _, gt = self.exact.search(q, k, approx=False)
        gt_h = np.asarray(gt)

        def measure(impl: str, **param_over):
            saved = {p: getattr(self.params, p) for p in param_over}
            for p, v in param_over.items():
                setattr(self.params, p, v)
            core = getattr(self, self._KNN_CORES[impl])
            try:
                # benchutil.timeit: warm-up call MATERIALIZED before the
                # timed window (async dispatch otherwise leaks the warm
                # execution into it), median of 5 reps.
                dt, (_, ids) = timeit(lambda qq: core(qq, k), q)
            finally:
                for p, v in saved.items():
                    setattr(self.params, p, v)
            rec = float(recall_at_k(np.asarray(ids), gt_h))
            return {"name": impl, "params": dict(param_over),
                    "recall": rec, "seconds": dt,
                    "meets_target": rec >= target_recall}

        report = [measure("k_nearest_neighbour")]
        if self.pq is not None:
            report.append(measure("k_nearest_neighbour_pq"))
            for pvf in (10, 20, 50, 100):
                report.append(measure("k_nearest_neighbour_pq_pv",
                                      pvf=pvf))
        if self.ivfadc is not None:
            for w in (1, 3, 5, 10):
                report.append(measure("k_nearest_neighbour_ivfadc", w=w))
            report.append(measure("k_nearest_neighbour_ivfadc_pv",
                                  w=self.params.w, pvf=self.params.pvf))
        report.sort(key=lambda r: r["seconds"])
        if apply:
            ok = [r for r in report if r["meets_target"]]
            best = ok[0] if ok else max(report, key=lambda r: r["recall"])
            best["chosen"] = True
            self.set_knn_function(best["name"])
            for p, v in best["params"].items():
                setattr(self.params, p, v)
        return report

    def autotune_join(self, *, target_recall: float = 0.9, k: int = 5,
                      sample: int = 256, targets=None,
                      target_sample: int = 10_000, seed: int = 0,
                      alphas: Sequence[int] = (50, 100, 200, 400),
                      pvfs: Sequence[int] = (10, 20),
                      apply: bool = True) -> list[dict]:
        """Autotune the kNN-join surface: sweep the IVPQ join's
        alpha/pvf/method grid (the exact knobs the reference's users
        hand-tune from its time-precision figure,
        evaluation/time_precision_eval.py:49) against in-set exact ground
        truth, and install the fastest configuration meeting
        ``target_recall``.

        ``targets``: the target set to tune on (words or ids) — pass the
        set you will actually join against. The sweep runs against a
        :meth:`prepare_targets`-style persistent-tile handle, so its QPS
        numbers match production steady state on a repeated target set.
        None samples ``target_sample`` random store rows.

        Candidates: IVPQ method 0 (ADC) and method 2 (ADC + post-verify,
        × ``pvfs``) over ``alphas``, IVPQ method 1 (exact distances) at
        the largest alpha, and the exact masked-matmul baseline
        (``knn_search_in_batch``). ``apply=True`` sets
        alpha/pvf/method via the reference's global runtime params and
        points ``dispatch["knn_join"]`` at the winner's family.
        """
        from postgres_word2vec_tpu.evaluation.benchutil import (recall_at_k,
                                                                timeit)

        n = self.store.size
        rng = np.random.default_rng(seed)
        sel = jnp.asarray(rng.choice(n, size=min(sample, n), replace=False))
        q = jnp.take(self.store.vectors_norm, sel, axis=0)
        if targets is None:
            tids = jnp.asarray(
                np.sort(rng.choice(n, size=min(target_sample, n),
                                   replace=False)).astype(np.int32))
            tmask = jnp.ones(tids.shape, bool)
        else:
            tids, tmask = self._target_ids(targets)
        _, gt = self._exact_in_core(q, k, tids, tmask)
        gt_h = np.asarray(gt)

        report = []

        def measure(name, fn, **params):
            dt, (_, ids) = timeit(fn, q)
            rec = float(recall_at_k(np.asarray(ids), gt_h))
            report.append({"name": name, "params": params, "recall": rec,
                           "seconds": dt,
                           "meets_target": rec >= target_recall})

        measure("knn_search_in_batch",
                lambda qq: self._exact_in_core(qq, k, tids, tmask))
        if self.ivpq is not None:
            stats = self._active_statistics()
            v = self.store.vectors_norm
            # sweep against the persistent-tile path (prepare_join): tile
            # layouts are reused across production calls on a fixed target
            # set, so measuring the ad-hoc path would overstate per-call
            # cost and mistune the winner.
            ph = self.ivpq.prepare_join(tids, target_mask=tmask, vectors=v)

            def join(qq, **kw):
                kw.pop("vectors", None)   # the handle carries the rows
                return self.ivpq.search_join(
                    qq, k, prepared=ph, statistics=stats,
                    confidence=self.params.confidence,
                    long_codes_threshold=self.params.long_codes_threshold,
                    lut_dtype=self.params.pq_lut_dtype, **kw)

            for alpha in alphas:
                measure("knn_in_ivpq_batch",
                        lambda qq, a=alpha: join(qq, alpha=a, method=0),
                        alpha=alpha, method=0)
                for pvf in pvfs:
                    measure("knn_in_ivpq_batch",
                            lambda qq, a=alpha, p=pvf: join(
                                qq, alpha=a, method=2, pvf=p, vectors=v),
                            alpha=alpha, method=2, pvf=pvf)
            measure("knn_in_ivpq_batch",
                    lambda qq, a=max(alphas): join(qq, alpha=a, method=1,
                                                   vectors=v),
                    alpha=max(alphas), method=1)
        report.sort(key=lambda r: r["seconds"])
        if apply:
            ok = [r for r in report if r["meets_target"]]
            best = ok[0] if ok else max(report, key=lambda r: r["recall"])
            best["chosen"] = True
            self.set_knn_join_function(best["name"])
            for p, v in best["params"].items():
                setattr(self.params, p, v)
        return report

    def warmup(self, *, k: int = 5, join_targets: int = 1024,
               query_chunk: int = 1024) -> None:
        """Precompile the hot query paths (serving cold-start hygiene).

        Runs one tiny query through each built index family so first user
        requests don't pay XLA compilation. Compiled programs are cached by
        shape; use the same ``query_chunk`` you will serve with.
        """
        q = self.store.vectors_norm[:1]
        self.exact.search(q, k)
        targets = list(range(min(join_targets, self.store.size)))
        tids = jnp.asarray(targets, jnp.int32)
        self.exact.search_in(q, k, tids)
        if self.pq is not None:
            # honor the LUT dtype knob: int8 serving compiles a distinct
            # static mode ("dense_i8"/"binned_i8") the bf16 warmup would
            # never touch.
            self.pq.search(q, k, impl=self._pq_impl())
            self.pq.search_pv(q, k, self.params.pvf, self.store.vectors_norm,
                              impl=self._pq_impl(),
                              shortlist=self.params.pv_shortlist)
            self.pq.search_in(q, k, tids)
        if self.ivfadc is not None:
            self.ivfadc.search(q, k, w=self.params.w)
            self.ivfadc.search_pv(q, k, self.params.pvf,
                                  self.store.vectors_norm, w=self.params.w)
        if self.ivpq is not None:
            self.ivpq.search_join(
                q, k, tids, vectors=self.store.vectors_norm,
                statistics=self._active_statistics(),
                alpha=self.params.alpha, pvf=self.params.pvf,
                method=self.params.method, confidence=self.params.confidence,
                long_codes_threshold=self.params.long_codes_threshold,
                query_chunk=query_chunk,
                lut_dtype=self.params.pq_lut_dtype)

    # ========================================================= persistence
    def save(self, directory) -> None:
        """Persist the whole engine — store, every built index, runtime
        params, dispatch registry, statistics tables — to a directory.

        Engine-granularity analog of the reference's index pickling
        (index_manager.py:save_index / load_index + quantizer pickles,
        quantizer_creation.py:72-79); the durable "database" the reference
        gets from Postgres.
        """
        import json
        from pathlib import Path

        d = Path(directory)
        d.mkdir(parents=True, exist_ok=True)
        self.store.save(d / "store.npz")
        for name, idx in (("pq", self.pq), ("ivfadc", self.ivfadc),
                          ("ivpq", self.ivpq)):
            if idx is not None:
                idx.save(d / f"{name}.npz")
        np.savez(d / "statistics.npz",
                 **{k: np.asarray(v) for k, v in self.statistics.items()})
        meta = {"params": dataclasses.asdict(self.params),
                "dispatch": self.dispatch,
                "exact_dtype": self.exact.compute_dtype,
                "exact_approx": self.exact.approx}
        (d / "engine.json").write_text(json.dumps(meta, indent=2))

    @classmethod
    def load(cls, directory, *, mesh=None) -> "Freddy":
        import json
        from pathlib import Path

        d = Path(directory)
        store = VectorStore.load(d / "store.npz")
        kw = {}
        for name, loader in (("pq", PQIndex.load),
                             ("ivfadc", IVFADCIndex.load),
                             ("ivpq", IVPQIndex.load)):
            p = d / f"{name}.npz"
            if p.exists():
                kw[name] = loader(p)
        meta = json.loads((d / "engine.json").read_text())
        eng = cls(store, params=RuntimeParams(**meta["params"]),
                  exact_dtype=meta.get("exact_dtype", "float32"),
                  exact_approx=meta.get("exact_approx", False), **kw)
        eng.dispatch = dict(meta["dispatch"])
        stats_path = d / "statistics.npz"
        if stats_path.exists():
            with np.load(stats_path) as f:
                eng.statistics = {k: jnp.asarray(f[k]) for k in f.files}
        if mesh is not None:
            eng.enable_sharding(mesh)
        return eng

    # ============================================================== insert
    def insert_batch(self, terms: Sequence[str]) -> int:
        """Online insertion (freddy.c:1403-1658): tokenize unseen terms,
        skip existing words and all-OOV terms, append vectors, update every
        built index's codebooks incrementally (running-mean k-means step).
        Returns the number of inserted terms.

        The whole batch's term vectors (normalized + raw centroids)
        resolve in ONE device program — per-term ``tokenize()`` calls are
        several eager dispatches plus a host sync each (~tens of ms apiece
        on the tunneled chip), which made a 256-term insert scale O(terms ×
        RTT) instead of O(batch)."""
        new_words: list[str] = []
        id_lists: list[list[int]] = []
        seen: set[str] = set()
        for term in terms:
            if term in self.store or term in seen:
                continue  # freddy.c:1498-1514 skips existing words
            seen.add(term)
            ids = [self.store.word_to_id[w] for w in term.split(" ")
                   if w in self.store]
            if not ids:
                continue  # every word OOV → NULL vector in the reference
            new_words.append(term)
            id_lists.append(ids)
        if not new_words:
            return 0
        norm_rows, raw_rows = _tokenize_terms_batch(
            self.store.vectors, self.store.vectors_norm, id_lists)
        norm_new = jnp.asarray(norm_rows)
        # extend_inplace: O(batch) host append + one fused device concat —
        # extend()'s copy semantics duplicate the 3M-entry vocab dict per
        # insert on a 1-core host.
        self.store = self.store.extend_inplace(new_words, raw_rows)
        # O(batch) device work: append-quantize only the new rows into the
        # exact index's capacity buffers (freddy.c:1631-1655 — the
        # reference's insert appends, never rebuilds). Fused-scan engines
        # keep the rebuild (tiled layouts don't extend incrementally).
        if self.exact.fused:
            self.exact = ExactIndex(self.store.vectors_norm,
                                    self.exact.compute_dtype,
                                    approx=self.exact.approx, fused=True)
        else:
            self.exact = self.exact.extended(self.store.vectors_norm,
                                             norm_new)
        if self.pq is not None:
            self.pq = self.pq.add(norm_new)
        if self.ivfadc is not None:
            self.ivfadc = self.ivfadc.add(norm_new)
        if self.ivpq is not None:
            self.ivpq = self.ivpq.add(norm_new)
        if self.mesh is not None:
            # refresh the sharded snapshots — otherwise mesh-mode searches
            # serve the pre-insert tables (and the PQ path's valid_rows,
            # which tracks pq.size, would unmask padding rows).
            self.enable_sharding(self.mesh)
        return len(new_words)


@functools.partial(jax.jit, static_argnames=("n_seg",))
def _tokenize_segments(vectors: Array, vectors_norm: Array, flat_ids: Array,
                       seg_ids: Array, n_seg: int) -> tuple[Array, Array]:
    """Per-term centroids (normalized + raw) for a whole insert batch in
    one program: gather member rows, segment-mean per term, re-normalize
    the normalized-space centroid (tokenize semantics, sql:1513-1536)."""
    w = (flat_ids >= 0).astype(jnp.float32)
    safe = jnp.maximum(flat_ids, 0)
    vn = jnp.take(vectors_norm, safe, axis=0) * w[:, None]
    vr = jnp.take(vectors, safe, axis=0) * w[:, None]
    sum_n = jax.ops.segment_sum(vn, seg_ids, num_segments=n_seg)
    sum_r = jax.ops.segment_sum(vr, seg_ids, num_segments=n_seg)
    cnt = jnp.maximum(jax.ops.segment_sum(w, seg_ids, num_segments=n_seg),
                      1.0)
    return (vo.vec_normalize(sum_n / cnt[:, None]),
            sum_r / cnt[:, None])


def _tokenize_terms_batch(vectors: Array, vectors_norm: Array,
                          id_lists: Sequence[Sequence[int]]
                          ) -> tuple[np.ndarray, np.ndarray]:
    """Host wrapper: flatten the per-term word-id lists (pow2-padded so
    the program compiles once per size class) and run ONE
    :func:`_tokenize_segments` dispatch for the whole batch."""
    n = len(id_lists)
    total = sum(len(ids) for ids in id_lists)
    np2 = 1 << max(0, (n - 1)).bit_length()
    tp2 = 1 << max(0, (total - 1)).bit_length()
    flat = np.full((tp2,), -1, np.int32)
    seg = np.full((tp2,), np2 - 1, np.int32)   # padding → last segment
    pos = 0
    for i, ids in enumerate(id_lists):
        flat[pos:pos + len(ids)] = ids
        seg[pos:pos + len(ids)] = i
        pos += len(ids)
    norm_c, raw_c = _tokenize_segments(vectors, vectors_norm,
                                       jnp.asarray(flat), jnp.asarray(seg),
                                       n_seg=np2)
    return np.asarray(norm_c)[:n], np.asarray(raw_c)[:n]


@functools.partial(jax.jit, static_argnames=("n_tokens",))
def _cluster_assign(dists: Array, ids: Array, n_tokens: int) -> Array:
    """From per-centroid join results (k, kk) pick each token's nearest
    centroid: scatter-min into a dense (k, T) table, argmin over k.
    Tokens never returned by any centroid's join get −1 (keep previous)."""
    k = dists.shape[0]
    safe_ids = jnp.maximum(ids, 0)
    vals = jnp.where(ids >= 0, dists, jnp.inf)
    table = jnp.full((k, n_tokens), jnp.inf, jnp.float32)
    table = jax.vmap(lambda row, idx, v: row.at[idx].min(v))(
        table, safe_ids, vals.astype(jnp.float32))
    best = jnp.argmin(table, axis=0)
    seen = jnp.isfinite(jnp.min(table, axis=0))
    return jnp.where(seen, best, -1).astype(jnp.int32)


@jax.jit
def _globals_to_locals(ids: Array, tids: Array) -> Array:
    """Map global row ids back to positions within ``tids`` (−1 passthrough).

    Device-side binary search over the sorted target ids (the round-1
    version was a host dict + ``np.ndenumerate`` over B×k — quadratic pain
    at production batch sizes)."""
    order = jnp.argsort(tids)
    sorted_t = jnp.take(tids, order)
    pos = jnp.searchsorted(sorted_t, jnp.maximum(ids, 0))
    pos = jnp.minimum(pos, sorted_t.shape[0] - 1)
    hit = jnp.take(sorted_t, pos) == ids
    loc = jnp.take(order, pos)
    return jnp.where((ids >= 0) & hit, loc, -1).astype(jnp.int32)
