"""On-chip microbenchmarks: candidate formulations for the BA assembly
reductions and the Schur panel build.  Data decides the refactor."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
from slam_plus_plus_tpu.utils.cache import enable_compilation_cache
enable_compilation_cache()
import jax.numpy as jnp
import numpy as np

E, Np, Nl, Bp, Bl = 457543, 100, 8000, 6, 3
rng = np.random.default_rng(0)
cam_of = rng.integers(0, Np, E).astype(np.int32)
lm_of = np.sort(rng.integers(0, Nl, E)).astype(np.int32)  # landmark-sorted
vals36 = jnp.asarray(rng.standard_normal((E, 36)), dtype=jnp.float32)
vals18 = jnp.asarray(rng.standard_normal((E, 18)), dtype=jnp.float32)
vals9 = jnp.asarray(rng.standard_normal((E, 9)), dtype=jnp.float32)
vals6 = jnp.asarray(rng.standard_normal((E, 6)), dtype=jnp.float32)
cam_d = jnp.asarray(cam_of)
lm_d = jnp.asarray(lm_of)
cinv = jnp.asarray(rng.standard_normal((Nl, 9)), dtype=jnp.float32)
eta_l = jnp.asarray(rng.standard_normal((Nl, Bl)), dtype=jnp.float32)

counts = np.bincount(lm_of, minlength=Nl)
M = int(counts.max())
tbl = np.zeros((Nl, M), dtype=np.int32)
valid = np.zeros((Nl, M), dtype=np.float32)
fill = np.zeros(Nl, dtype=np.int64)
for k, c in enumerate(lm_of):
    tbl[c, fill[c]] = k
    valid[c, fill[c]] = 1.0
    fill[c] += 1
tbl_d, valid_d = jnp.asarray(tbl), jnp.asarray(valid)
rows_tbl = jnp.asarray(cam_of[tbl])  # [Nl, M] cam of each obs

# pair table [Nl, Np] -> block id (or 0) + validity
pair_tbl = np.zeros((Nl, Np), dtype=np.int32)
pair_valid = np.zeros((Nl, Np), dtype=np.float32)
pair_tbl[lm_of, cam_of] = np.arange(E, dtype=np.int32)
pair_valid[lm_of, cam_of] = 1.0
pair_tbl_d, pair_valid_d = jnp.asarray(pair_tbl), jnp.asarray(pair_valid)

nred = Np * Bp


def timeit(name, fn, *args, n=20):
    f = jax.jit(fn)
    out = f(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = f(*args)
    jax.block_until_ready(out)
    print(f"  {name:44s} {(time.perf_counter()-t0)/n*1e3:8.2f} ms", flush=True)
    return out


print("== few-target reductions (E->Np) ==", flush=True)
timeit("segment_sum 36->Np", lambda v: jax.ops.segment_sum(v, cam_d, num_segments=Np), vals36)
timeit("onehot GEMM 36->Np",
       lambda v: ((cam_d[:, None] == jnp.arange(Np, dtype=cam_d.dtype))
                  .astype(v.dtype).T @ v), vals36)
timeit("onehot GEMM 6->Np",
       lambda v: ((cam_d[:, None] == jnp.arange(Np, dtype=cam_d.dtype))
                  .astype(v.dtype).T @ v), vals6)
timeit("onehot GEMM 42->Np (fused pp+eta)",
       lambda a, b: ((cam_d[:, None] == jnp.arange(Np, dtype=cam_d.dtype))
                     .astype(a.dtype).T @ jnp.concatenate([a, b], axis=1)),
       vals36, vals6)

print("== many-target reductions (E->Nl) ==", flush=True)
timeit("segment_sum 9->Nl", lambda v: jax.ops.segment_sum(v, lm_d, num_segments=Nl), vals9)
timeit("obs-tbl gather-sum 9->Nl",
       lambda v: (v[tbl_d] * valid_d[:, :, None]).sum(axis=1), vals9)
timeit("obs-tbl gather-sum 12->Nl (fused ll+eta)",
       lambda a, b: (jnp.concatenate([a, b], axis=1)[tbl_d]
                     * valid_d[:, :, None]).sum(axis=1), vals9, vals36[:, :3])

print("== permutation gather (E rows of 18) ==", flush=True)
perm = jnp.asarray(rng.permutation(E).astype(np.int32))
timeit("random perm gather", lambda v: v[perm], vals18)
timeit("identity gather", lambda v: v[jnp.arange(E, dtype=jnp.int32)], vals18)

print("== panel builds ==", flush=True)


def panels_onehot(u):
    u_pad = u[tbl_d] * valid_d[:, :, None]
    onehot = (rows_tbl[:, :, None] ==
              jnp.arange(Np, dtype=rows_tbl.dtype)[None, None, :]
              ).astype(u.dtype) * valid_d[:, :, None]
    U3 = jnp.einsum("cmn,cmk->cnk", onehot, u_pad)
    Ut = (U3.reshape(Nl, Np, Bp, Bl).transpose(0, 3, 1, 2)
          .reshape(Nl * Bl, nred))
    return Ut


def panels_pairtbl(u):
    u3 = u[pair_tbl_d] * pair_valid_d[:, :, None]          # [Nl, Np, 18]
    Ut = (u3.reshape(Nl, Np, Bp, Bl).transpose(0, 3, 1, 2)
          .reshape(Nl * Bl, nred))
    return Ut


def panels_scatter(u):
    # u sorted by landmark; scatter into [Nl*Bl, nred]
    ridx = (lm_d[:, None] * Bl + jnp.arange(Bl)[None, :])   # [E, 3]
    cidx = (cam_d[:, None] * Bp + jnp.arange(Bp)[None, :])  # [E, 6]
    flat = (ridx[:, :, None] * nred + cidx[:, None, :])     # [E, 3, 6]
    panel = jnp.zeros((Nl * Bl * nred,), dtype=u.dtype)
    vals = u.reshape(E, Bp, Bl).transpose(0, 2, 1)          # [E, 3, 6]
    return panel.at[flat.reshape(-1)].add(vals.reshape(-1)).reshape(Nl * Bl, nred)


Ut1 = timeit("one-hot einsum panel", panels_onehot, vals18)
Ut2 = timeit("pair-table gather panel", panels_pairtbl, vals18)
Ut3 = timeit("scatter panel (sorted)", panels_scatter, vals18)
print("   parity onehot vs pairtbl:", float(jnp.abs(Ut1 - Ut2).max()),
      " vs scatter:", float(jnp.abs(Ut1 - Ut3).max()), flush=True)


def full_solve_pairtbl(u, pp_dense_rhs):
    """u3 gather once; w3 elementwise; panels; SC gemm; rhs+backsub einsums."""
    u3 = (u[pair_tbl_d] * pair_valid_d[:, :, None]).reshape(Nl, Np, Bp, Bl)
    ci = cinv.reshape(Nl, Bl, Bl)
    w3 = jnp.einsum("cnik,ckl->cnil", u3, ci)
    Ut = u3.transpose(0, 3, 1, 2).reshape(Nl * Bl, nred)
    Wt = w3.transpose(0, 3, 1, 2).reshape(Nl * Bl, nred)
    sc = Wt.T @ Ut
    rhs = jnp.einsum("cnil,cl->ni", w3, eta_l)
    return sc, rhs


timeit("full pair-tbl: gather+w3+panels+SCgemm+rhs", full_solve_pairtbl,
       vals18, None)

print("== panel einsum variants (no gather: uniform [Nl, M] layout) ==", flush=True)
Mp = M
u_pad0 = jnp.asarray(rng.standard_normal((Nl, Mp, 18)), dtype=jnp.float32)
valid3 = valid_d[:, :, None]
oh_pre = jnp.asarray((cam_of[tbl][:, :, None] ==
                      np.arange(Np)[None, None, :]).astype(np.float32) *
                     valid[:, :, None])

def einsum_gen_onehot(u_pad):
    onehot = (rows_tbl[:, :, None] ==
              jnp.arange(Np, dtype=rows_tbl.dtype)[None, None, :]
              ).astype(u_pad.dtype) * valid3
    U3 = jnp.einsum("cmn,cmk->cnk", onehot, u_pad)
    return (U3.reshape(Nl, Np, Bp, Bl).transpose(0, 3, 1, 2)
            .reshape(Nl * Bl, nred))

def einsum_pre_onehot(u_pad, oh):
    U3 = jnp.einsum("cmn,cmk->cnk", oh, u_pad)
    return (U3.reshape(Nl, Np, Bp, Bl).transpose(0, 3, 1, 2)
            .reshape(Nl * Bl, nred))

def einsum_bf16(u_pad, oh):
    U3 = jax.lax.dot_general(
        oh.astype(jnp.bfloat16), u_pad.astype(jnp.bfloat16),
        (((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)
    return (U3.reshape(Nl, Np, Bp, Bl).transpose(0, 3, 1, 2)
            .reshape(Nl * Bl, nred))

def einsum_no_transpose(u_pad):
    # produce the TRANSPOSED panel directly: [c, k, n*i] via pre-permuted rhs
    up = u_pad.reshape(Nl, Mp, Bp, Bl).transpose(0, 3, 1, 2).reshape(Nl, Bl * Mp, Bp)
    oh = jnp.repeat(oh_pre, 1, axis=0)
    # [c, k*m, n] x [c, k*m ... ] mismatched; skip
    return up

U4 = timeit("einsum gen-onehot (no gather)", einsum_gen_onehot, u_pad0)
U5 = timeit("einsum pre-onehot (no gather)", einsum_pre_onehot, u_pad0, oh_pre)
U6 = timeit("einsum bf16 in / f32 acc", einsum_bf16, u_pad0, oh_pre)
print("   bf16 max rel err:",
      float((jnp.abs(U5 - U6).max() / (jnp.abs(U5).max() + 1e-30))), flush=True)

def sc_end_to_end(u_pad, oh):
    ci = cinv.reshape(Nl, Bl, Bl)
    u4 = u_pad.reshape(Nl, Mp, Bp, Bl)
    w4 = jnp.einsum("cmik,ckl->cmil", u4, ci).reshape(Nl, Mp, 18)
    U3 = jnp.einsum("cmn,cmk->cnk", oh, u_pad)
    W3 = jnp.einsum("cmn,cmk->cnk", oh, w4)
    Ut = (U3.reshape(Nl, Np, Bp, Bl).transpose(0, 3, 1, 2).reshape(Nl * Bl, nred))
    Wt = (W3.reshape(Nl, Np, Bp, Bl).transpose(0, 3, 1, 2).reshape(Nl * Bl, nred))
    sc = Wt.T @ Ut
    rhs = jnp.einsum("cnik,ck->ni", W3.reshape(Nl, Np, Bp, Bl), eta_l)
    return sc, rhs

timeit("full SC: w4+2 einsums+gemm+rhs (no gather)", sc_end_to_end, u_pad0, oh_pre)
