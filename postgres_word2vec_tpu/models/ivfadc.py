"""IVFADC — inverted file with asymmetric distance on PQ-coded residuals.

Parity targets:
- build driver ivfadc.py (coarse k-means + residual codebook + per-vector
  codes → ``coarse_quantization`` / ``fine_quantization`` /
  ``residual_codebook`` tables; defaults from ivfadc_config.json: m=12,
  k=256, k_coarse=1000, train 100k),
- search kernels ``ivfadc_search`` (freddy.c:172-410) and
  ``ivfadc_batch_search`` (freddy.c:677-1024),
- post-verified wrapper ``k_nearest_neighbour_ivfadc_pv`` (sql:556-591).

TPU layout: the SQL ``WHERE coarse_id IN (…)`` becomes a CSR inverted file —
codes sorted by coarse cell with prefix offsets, so probing a cell is a
contiguous gather window (DMA-friendly), padded to a static per-index cap.
The reference's data-dependent "widen until ≥k found" loop (freddy.c:262-378,
blacklist + next-best cells) is reproduced as a host-side nprobe-doubling
escalation over a fixed ladder — recall semantics preserved, loop structure
compiler-friendly (SURVEY §7 "hard parts").
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

from postgres_word2vec_tpu.models.pq import PQCodebook, online_codebook_update
from postgres_word2vec_tpu.ops import adc, kmeans, lut
from postgres_word2vec_tpu.ops import topk as topk_ops

Array = jax.Array


class CoarseQuantizer(NamedTuple):
    """Flat coarse quantizer (parity: ``coarse_quantization`` table +
    ``getCoarseQuantizer``, index_utils.c:531-575)."""
    centroids: Array  # (C, d) float32
    counts: Array     # (C,) int32


def grouped_adc_distances(luts: Array, codes: Array) -> Array:
    """ADC with per-group LUTs: ``(..., m, k) × (..., L, m) → (..., L)``.

    Each leading-dim group (query × probed cell) has its own LUT — the
    residual-ADC pattern of ``ivfadc_search`` (freddy.c:347-373).

    Formulated as a vmapped 1-D gather into each group's flattened
    ``(m·k,)`` table (a broadcast-then-take_along_axis formulation makes
    XLA materialize a (groups, L, m, k) intermediate and explodes compile
    time at probe sizes).
    """
    m, k = luts.shape[-2:]
    lead = codes.shape[:-2]
    L = codes.shape[-2]
    flat_luts = luts.astype(jnp.float32).reshape(-1, m * k)
    idx = (codes.astype(jnp.int32)
           + (jnp.arange(m, dtype=jnp.int32) * k)[None, :])
    idx = idx.reshape(-1, L * m)
    gathered = jax.vmap(lambda t, i: jnp.take(t, i, axis=0))(flat_luts, idx)
    return gathered.reshape(*lead, L, m).sum(-1)


@functools.partial(jax.jit, static_argnames=("w", "k", "list_cap"))
def _ivfadc_probe(queries: Array, coarse: Array, centroids: Array,
                  cell_offsets: Array, codes_sorted: Array, row_ids: Array,
                  w: int, k: int, list_cap: int) -> tuple[Array, Array, Array]:
    """Probe the w nearest cells per query, ADC-scan their lists, top-k.

    Returns (sqdists, global ids, found) where ``found[b]`` is the number of
    real (non-padding) candidates seen — the signal for escalation, mirroring
    the reference's ``foundInstances`` counter (freddy.c:262).
    """
    B, d = queries.shape
    m = codes_sorted.shape[1]

    # 1. coarse assignment: one matmul + top-w (freddy.c:272-283's scan).
    cd = kmeans.pairwise_sqdist(queries, coarse)            # (B, C)
    _, cells = topk_ops.top_k_smallest(cd, w)               # (B, w)

    # 2. residuals + per-(query, cell) LUTs (freddy.c:296-314).
    resid = queries[:, None, :] - jnp.take(coarse, cells, axis=0)  # (B, w, d)
    luts = lut.build_luts(resid.reshape(B * w, d), centroids)
    luts = luts.reshape(B, w, *luts.shape[1:])              # (B, w, m, k)

    # 3. contiguous gather windows per probed cell.
    starts = jnp.take(cell_offsets, cells)                  # (B, w)
    ends = jnp.take(cell_offsets, cells + 1)                # (B, w)
    lane = jnp.arange(list_cap)
    pos = starts[..., None] + lane                          # (B, w, L)
    valid = pos < ends[..., None]
    pos_c = jnp.minimum(pos, codes_sorted.shape[0] - 1)
    cand_codes = jnp.take(codes_sorted, pos_c, axis=0)      # (B, w, L, m)

    # 4. ADC + masked top-k over all probed candidates.
    dists = grouped_adc_distances(luts, cand_codes)         # (B, w, L)
    dists = jnp.where(valid, dists, jnp.inf)
    flat = dists.reshape(B, w * list_cap)
    vals, flat_pos = topk_ops.top_k_smallest(flat, min(k, w * list_cap))
    gpos = jnp.take_along_axis(pos_c.reshape(B, w * list_cap), flat_pos,
                               axis=-1)
    ids = jnp.where(jnp.isfinite(vals), jnp.take(row_ids, gpos), -1)
    found = jnp.sum(valid.reshape(B, -1), axis=-1)
    return vals, ids.astype(jnp.int32), found


@dataclasses.dataclass
class IVFADCIndex:
    """CSR inverted file over PQ-coded residuals, all HBM-resident."""

    coarse: CoarseQuantizer
    codebook: PQCodebook          # residual codebook (m, k, dsub)
    cell_offsets: Array           # (C+1,) int32 prefix offsets into sorted
    codes_sorted: Array           # (n, m) codes sorted by coarse cell
    row_ids: Array                # (n,) sorted position → original row id
    assignments: Array            # (n,) original row id → coarse cell
    list_cap: int                 # static max cell length (gather window)

    @property
    def size(self) -> int:
        return int(self.codes_sorted.shape[0])

    @property
    def num_cells(self) -> int:
        return int(self.coarse.centroids.shape[0])

    # ------------------------------------------------------------ building
    @classmethod
    def build(cls, key: Array, vectors: Array, *, m: int = 12, k: int = 256,
              k_coarse: int = 1000, train_size: int | None = 100_000,
              iters: int = 10, restarts: int = 1,
              init: str = "sample") -> "IVFADCIndex":
        """Coarse k-means → residuals → residual codebook → CSR lists
        (``create_index_data`` parity, ivfadc.py:36-96)."""
        n = vectors.shape[0]
        ck, rk, sk = jax.random.split(key, 3)
        if train_size is not None and train_size < n:
            idx = jax.random.choice(sk, n, shape=(train_size,), replace=False)
            train = jnp.take(vectors, idx, axis=0)
        else:
            train = vectors
        coarse_res = kmeans.kmeans(ck, train, k=k_coarse, iters=iters,
                                   restarts=restarts, init=init)
        assign = kmeans.assign(vectors, coarse_res.centroids)
        # residual codebook trains on the sample only; the full residual
        # table is never materialized (fused subtract+encode below).
        train_assign = kmeans.assign(train, coarse_res.centroids)
        train_resid = train - jnp.take(coarse_res.centroids, train_assign,
                                       axis=0)
        sub = kmeans.split_subspaces(train_resid, m)
        cb_res = kmeans.kmeans_subspaces(rk, sub, k=k, iters=iters,
                                         restarts=restarts, init=init)
        codes = kmeans.encode_residual_subspaces(
            vectors, coarse_res.centroids, assign, cb_res.centroids)

        return cls._assemble(
            CoarseQuantizer(coarse_res.centroids,
                            jnp.bincount(assign, length=k_coarse
                                         ).astype(jnp.int32)),
            PQCodebook(cb_res.centroids, cb_res.counts), codes, assign)

    @classmethod
    def _assemble(cls, coarse: CoarseQuantizer, codebook: PQCodebook,
                  codes: Array, assign: Array) -> "IVFADCIndex":
        k_coarse = coarse.centroids.shape[0]
        assign_np = np.asarray(assign)
        order = np.argsort(assign_np, kind="stable")
        sizes = np.bincount(assign_np, minlength=k_coarse)
        offsets = np.zeros(k_coarse + 1, np.int32)
        np.cumsum(sizes, out=offsets[1:])
        list_cap = int(sizes.max()) if sizes.size and sizes.max() > 0 else 1
        return cls(
            coarse=coarse, codebook=codebook,
            cell_offsets=jnp.asarray(offsets),
            codes_sorted=jnp.asarray(np.asarray(codes)[order]),
            row_ids=jnp.asarray(order.astype(np.int32)),
            assignments=jnp.asarray(assign_np.astype(np.int32)),
            list_cap=list_cap)

    # ------------------------------------------------------------- search
    def search(self, queries: Array, k: int, *, w: int = 3,
               list_cap: int | None = None) -> tuple[Array, Array]:
        """Fixed-nprobe batched IVFADC (``ivfadc_search`` with PARAM_W
        default 3, sql:189; batch parity: ``ivfadc_batch_search``)."""
        cap = self.list_cap if list_cap is None else list_cap
        vals, ids, _ = _ivfadc_probe(
            queries, self.coarse.centroids, self.codebook.centroids,
            self.cell_offsets, self.codes_sorted, self.row_ids,
            w=min(w, self.num_cells), k=k, list_cap=cap)
        return vals, ids

    def search_adaptive(self, queries: Array, k: int, *, w: int = 3,
                        max_rounds: int = 4) -> tuple[Array, Array]:
        """Reproduces the reference's widening semantics: if a query's probed
        cells held fewer than k entries, double w and retry (host-side
        ladder instead of the blacklist loop, freddy.c:262-378)."""
        w_cur = min(w, self.num_cells)
        vals, ids, found = _ivfadc_probe(
            queries, self.coarse.centroids, self.codebook.centroids,
            self.cell_offsets, self.codes_sorted, self.row_ids,
            w=w_cur, k=k, list_cap=self.list_cap)
        for _ in range(max_rounds - 1):
            if bool(jnp.all(found >= k)) or w_cur >= self.num_cells:
                break
            w_cur = min(w_cur * 2, self.num_cells)
            vals, ids, found = _ivfadc_probe(
                queries, self.coarse.centroids, self.codebook.centroids,
                self.cell_offsets, self.codes_sorted, self.row_ids,
                w=w_cur, k=k, list_cap=self.list_cap)
        return vals, ids

    def search_pv(self, queries: Array, k: int, pvf: int, vectors: Array, *,
                  w: int = 3) -> tuple[Array, Array]:
        """IVFADC shortlist + exact re-rank
        (``k_nearest_neighbour_ivfadc_pv`` parity, sql:556-591)."""
        cd, ci = self.search(queries, k * pvf, w=w)
        return adc.post_verify(queries, ci, cd, vectors, k)

    # ------------------------------------------------------------ mutation
    def add(self, new_vectors: Array) -> "IVFADCIndex":
        """Online insert (``insert_batch``'s IVFADC leg, freddy.c:1573-1587):
        flat coarse assignment, residual encode with running-mean residual
        codebook update, CSR rebuild."""
        assign_new = kmeans.assign(new_vectors, self.coarse.centroids)
        resid = new_vectors - jnp.take(self.coarse.centroids, assign_new,
                                       axis=0)
        cb, new_codes = online_codebook_update(self.codebook, resid)
        all_codes_unsorted = jnp.concatenate(
            [jnp.take(self.codes_sorted,
                      jnp.argsort(self.row_ids), axis=0),
             new_codes.astype(self.codes_sorted.dtype)], axis=0)
        all_assign = jnp.concatenate([self.assignments,
                                      assign_new.astype(jnp.int32)])
        counts = jnp.bincount(all_assign,
                              length=self.num_cells).astype(jnp.int32)
        return IVFADCIndex._assemble(
            CoarseQuantizer(self.coarse.centroids, counts), cb,
            all_codes_unsorted, all_assign)

    # --------------------------------------------------------- persistence
    def save(self, path: str | Path) -> None:
        np.savez_compressed(
            path,
            coarse_centroids=np.asarray(self.coarse.centroids),
            coarse_counts=np.asarray(self.coarse.counts),
            centroids=np.asarray(self.codebook.centroids),
            counts=np.asarray(self.codebook.counts),
            cell_offsets=np.asarray(self.cell_offsets),
            codes_sorted=np.asarray(self.codes_sorted),
            row_ids=np.asarray(self.row_ids),
            assignments=np.asarray(self.assignments),
            list_cap=np.asarray(self.list_cap))

    @classmethod
    def load(cls, path: str | Path) -> "IVFADCIndex":
        with np.load(path) as f:
            return cls(
                CoarseQuantizer(jnp.asarray(f["coarse_centroids"]),
                                jnp.asarray(f["coarse_counts"])),
                PQCodebook(jnp.asarray(f["centroids"]),
                           jnp.asarray(f["counts"])),
                jnp.asarray(f["cell_offsets"]),
                jnp.asarray(f["codes_sorted"]),
                jnp.asarray(f["row_ids"]),
                jnp.asarray(f["assignments"]),
                int(f["list_cap"]))
