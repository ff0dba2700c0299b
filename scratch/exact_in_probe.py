"""On-chip probe: join_exact_in bench regression (0.87s -> 5.9s r4).

The standalone top-k grid (scratch/topk_grid.json) says native lax.top_k
WINS at (512, 102400, k=5) 2x, yet the bench's fused
gather+matmul+top_k program got 6.8x slower when the blockwise top-k was
gated off TPU. This probe times the actual fused program
(models/exact.exact_top_k_in shape: 3M f32 table, 100k targets) with
(a) native top_k, (b) blockwise, (c) split into scan + separate top_k,
at both bench chunk shapes (512 and the 392 tail).
"""
import functools
import json
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

sys.path.insert(0, "/root/repo")
from postgres_word2vec_tpu.ops import topk as topk_ops  # noqa: E402

N, D, T, K = 3_072_000, 300, 100_000, 5


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def _sqdist(q, tv):
    qf = q.astype(jnp.float32)
    qq = jnp.sum(qf * qf, axis=-1, keepdims=True)
    qv = jnp.dot(q, tv.T, preferred_element_type=jnp.float32,
                 precision=lax.Precision.HIGHEST)
    nn = jnp.sum(tv.astype(jnp.float32) ** 2, axis=-1)
    return jnp.maximum(qq - 2.0 * qv + nn[None, :], 0.0)


def make(fused_topk):
    @functools.partial(jax.jit, static_argnames=("k",))
    def f(q, vectors, tids, tmask, k):
        tv = jnp.take(vectors, jnp.maximum(tids, 0), axis=0)
        d = _sqdist(q, tv)
        d = jnp.where(tmask[None, :], d, jnp.inf)
        vals, pos = fused_topk(d, k)
        return vals, jnp.take(tids, pos)
    return f


def native_tk(d, k):
    neg, idx = lax.top_k(-d, k)
    return -neg, idx


f_native = make(native_tk)
f_block = make(lambda d, k: topk_ops._blockwise_top_k_smallest(d, k))


@jax.jit
def scan_only(q, vectors, tids, tmask):
    tv = jnp.take(vectors, jnp.maximum(tids, 0), axis=0)
    d = _sqdist(q, tv)
    return jnp.where(tmask[None, :], d, jnp.inf)


@functools.partial(jax.jit, static_argnames=("k",))
def tk_only(d, k):
    return native_tk(d, k)


def main():
    rng = np.random.default_rng(0)
    log(f"platform={jax.devices()[0].platform}")
    V = jnp.asarray(rng.standard_normal((N, D), dtype=np.float32))
    tgt = jnp.arange(T, dtype=jnp.int32)
    mask = jnp.ones((T,), bool)
    q512 = jnp.asarray(rng.standard_normal((512, D), dtype=np.float32))
    q392 = jnp.asarray(rng.standard_normal((392, D), dtype=np.float32))
    jax.block_until_ready(V)
    res = {}

    def timeit(name, fn, q, reps=5):
        out = fn(q)
        np.asarray(jax.tree_util.tree_leaves(out)[0][:1, :1])  # warm+compile
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn(q)
        np.asarray(jax.tree_util.tree_leaves(out)[0][:1, :1])
        ms = (time.perf_counter() - t0) / reps * 1e3
        res[name] = ms
        log(f"{name}: {ms:.1f} ms")

    for b, q in (("512", q512), ("392", q392)):
        timeit(f"fused_native_B{b}", lambda qq: f_native(qq, V, tgt, mask, K), q)
        timeit(f"fused_block_B{b}", lambda qq: f_block(qq, V, tgt, mask, K), q)
        timeit(f"split_scan_B{b}", lambda qq: scan_only(qq, V, tgt, mask), q)
        timeit(f"split_tk_B{b}",
               lambda qq: tk_only(scan_only(qq, V, tgt, mask), K), q)

    # compile-time check: fresh shape (393) for each variant
    for name, f in (("native", f_native), ("block", f_block)):
        q = jnp.asarray(rng.standard_normal((393, D), dtype=np.float32))
        t0 = time.perf_counter()
        out = f(q, V, tgt, mask, K)
        np.asarray(out[0][:1, :1])
        res[f"compile+run_{name}_B393"] = (time.perf_counter() - t0) * 1e3
        log(f"compile+run_{name}_B393: {res[f'compile+run_{name}_B393']:.0f} ms")

    with open("/root/repo/scratch/exact_in_probe.json", "w") as fh:
        json.dump(res, fh, indent=1)
    print(json.dumps(res))


if __name__ == "__main__":
    main()
