"""Decompose one table's Gram build into its pipeline pieces on
hardware: cross gathers, aux packing, the Pallas kernel, and the
finalize gather/update — each timed in isolation with pre-staged
device operands (passed as jit ARGS, never closed over: closures bake
10M-row constants into the HLO and the remote-compile tunnel rejects
the request).

Usage: python scripts/microbench_gram_phases.py [n_rows] [rank] [table]
"""

import functools
import os
import sys
import time

_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _root)

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR", "/tmp/myfm_tpu_xla_cache"
)

import numpy as np

import jax
import jax.numpy as jnp


def _sync(out):
    """block_until_ready through the axon tunnel returns early on
    in-flight buffers (see bench.py); fetching a scalar element forces
    real completion."""
    leaf = jax.tree_util.tree_leaves(out)[0]
    return float(jnp.asarray(leaf).ravel()[0])


def timed(fn, *args, reps=5):
    out = fn(*args)
    _sync(out)
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
        _sync(out)
    return (time.time() - t0) / reps


def main():
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
    rank = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    ti = int(sys.argv[3]) if len(sys.argv) > 3 else 1

    from bench import build_problem
    from myfm_tpu.design_categorical import try_compile_categorical
    from myfm_tpu.ops import categorical as C
    from myfm_tpu.ops.pallas_gram import fused_tile_gram_cross

    print(f"devices: {jax.devices()}", flush=True)
    X, blocks, y, grouping = build_problem(n_rows, rank)
    plan = try_compile_categorical(
        X, blocks, np.asarray(grouping, dtype=np.int32), None,
        np.float32, rank=rank,
    )
    t = plan.tables[ti]
    K, T, S = t.n_tiles, t.tile_rows, t.tile_entities
    NT = K * T
    R = rank
    print(f"table {ti}: B={t.n_cols} K={K} T={T} S={S} NT={NT}",
          flush=True)

    rng = np.random.RandomState(0)
    w = jnp.asarray(rng.normal(size=(plan.n_features,)).astype(np.float32) * 0.1)
    V = jnp.asarray(
        rng.normal(size=(plan.n_features, rank)).astype(np.float32) * 0.1
    )

    others = [t2 for t2i, t2 in enumerate(plan.tables) if t2i != ti]
    cross_idx = [
        m for t2i, m in enumerate(plan.cross_ent[ti]) if t2i != ti
    ]

    # ---- (a) one cross gather at [NT] scale --------------------------
    def one_gather(wv_pad, idx):
        return wv_pad[idx]

    gj = jax.jit(one_gather)
    for t2, idx in zip(others, cross_idx):
        V2 = C._table_slice(V, t2)
        wv = jnp.concatenate(
            [C._table_slice(w, t2)[:, None], V2,
             jnp.sum(V2 * V2, axis=1)[:, None]],
            axis=1,
        )
        wv_pad = C._pad_zero_row(wv)
        dt = timed(gj, wv_pad, idx)
        print(
            f"  gather from B={t2.n_cols:6d}: {dt*1e3:7.1f} ms "
            f"({dt/NT*1e9:.2f} ns/row)",
            flush=True,
        )

    # ---- (b) tau tile gather -----------------------------------------
    y_dev = jnp.asarray(np.asarray(y).astype(np.float32))
    tau_tile = C._pad_zero_row(y_dev[:, None])[t.src][:, 0]

    # ---- (c) kernel + finalize on PRE-GATHERED inputs ----------------
    # chunked exactly like _build_table_gram's scan (full-K single
    # pallas_call OOMs HBM at this scale), but with the cross gathers
    # and aux packing done once up front — isolating kernel+finalize
    # from the gather cost
    D = R + 2
    Kc = t.chunk_tiles
    n_chunks = -(-K // Kc)
    Kp = n_chunks * Kc
    max_fin = t.max_fin
    B = t.n_cols

    def pad_k(arr, fill, tile_shape):
        flat = arr.reshape((K,) + tile_shape)
        if Kp != K:
            pad = jnp.full(((Kp - K),) + tile_shape, fill, flat.dtype)
            flat = jnp.concatenate([flat, pad])
        return flat.reshape((n_chunks, Kc) + tile_shape)

    gths = []
    for t2, idx in zip(others, cross_idx):
        V2 = C._table_slice(V, t2)
        wv = jnp.concatenate(
            [C._table_slice(w, t2)[:, None], V2,
             jnp.sum(V2 * V2, axis=1)[:, None]],
            axis=1,
        )
        gths.append(pad_k(C._pad_zero_row(wv)[idx], 0.0, (T, 2 + R)))
    V_own = C._table_slice(V, t)
    wv_own = C._pad_zero_row(
        jnp.concatenate(
            [C._table_slice(w, t)[:, None], V_own,
             jnp.sum(V_own * V_own, axis=1)[:, None]],
            axis=1,
        )
    )
    staged = dict(
        slot_f=pad_k(t.slot_f, float(S), (T,)),
        tau=pad_k(tau_tile, 0.0, (T,)),
        g0=gths[0],
        g1=gths[1],
        wvsl=pad_k(wv_own[t.ent_slots].reshape(K * S, 2 + R), 0.0,
                   (S, 2 + R)),
        cont_in=pad_k(t.cont_in, 0, ()),
        cont_out=pad_k(t.cont_out, 0, ()),
        last_slot=pad_k(t.last_slot, 0, ()),
        fin_win=t.fin_win,
        fin_idx=t.fin_idx,
        fin_mask=t.fin_mask,
    )

    def kernel_scan(xs):
        def body(carry, xc):
            gram_carry, G = carry
            aux2 = jnp.stack([xc["slot_f"], xc["tau"]], axis=1)
            flat_c, gram_carry = fused_tile_gram_cross(
                aux2, (xc["g0"], xc["g1"]),
                xc["wvsl"],
                xc["cont_in"], xc["cont_out"], xc["last_slot"], S=S,
                carry_in=gram_carry, fast_matmul="split",
            )
            vals = flat_c[xc["fin_idx"]][:, :D, :]
            win = xc["fin_win"]
            zero = jnp.zeros((), win.dtype)
            old = jax.lax.dynamic_slice(
                G, (win, zero, zero), (max_fin, D, D)
            )
            msk = (xc["fin_mask"] > 0)[:, None, None]
            G = jax.lax.dynamic_update_slice(
                G, jnp.where(msk, vals, old), (win, zero, zero)
            )
            return (gram_carry, G), None

        carry0 = (
            jnp.zeros((D, D), jnp.float32),
            jnp.zeros((B, D, D), jnp.float32),
        )
        (_, G), _ = jax.lax.scan(body, carry0, xs)
        return G

    ksj = jax.jit(kernel_scan)
    dt_k = timed(ksj, staged)
    print(
        f"  kernel+finalize scan (pre-gathered): {dt_k*1e3:7.1f} ms "
        f"({dt_k/NT*1e9:.2f} ns/row)",
        flush=True,
    )

    # ---- (e) full _build_table_gram ----------------------------------
    from myfm_tpu.ops.gibbs import GibbsConfig

    cfg = GibbsConfig(task="regression", gram_fast_matmul="split")
    eff = C.eff_tables(plan, w, V)
    V_t = C._table_slice(V, t)
    wv = jnp.concatenate(
        [C._table_slice(w, t)[:, None], V_t,
         jnp.sum(V_t * V_t, axis=1)[:, None]], axis=1
    )

    def gram_only(plan, w, V, eff, wv, tau_tile):
        return C._build_table_gram(
            plan, ti, w, V, jnp.asarray(0.1, jnp.float32), eff, wv,
            tau_tile, cfg, False,
        )

    gr = jax.jit(gram_only)
    dt_g = timed(gr, plan, w, V, eff, wv, tau_tile)
    print(
        f"  full gram build: {dt_g*1e3:7.1f} ms "
        f"({dt_g/NT*1e9:.2f} ns/row)",
        flush=True,
    )


if __name__ == "__main__":
    main()
