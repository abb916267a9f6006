import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time, numpy as np, jax, jax.numpy as jnp

jax.config.update("jax_enable_x64", True)
nb, R, N, d = 254, 10, 17, 255
rng = np.random.default_rng(0)
cores = jnp.asarray(rng.standard_normal((d, R, N, R)))
acol = jnp.asarray(rng.standard_normal((nb, R, N)))
s_arr = jnp.asarray(rng.integers(0, R, size=(nb,)), jnp.int32)
upd = jnp.asarray(rng.random(nb) < 0.8)
ps = jnp.arange(nb)
iR = jnp.arange(R)
iN = jnp.arange(N)


def timeit(name, f, *args, k=7):
    r = jax.block_until_ready(f(*args))
    ts = []
    for _ in range(k):
        t0 = time.perf_counter()
        r = jax.block_until_ready(f(*args))
        ts.append(time.perf_counter() - t0)
    ts.sort()
    print(f"{name:28s} med {1e3*ts[k//2]:8.2f} ms  min {1e3*ts[0]:8.2f}")
    return r


@jax.jit
def scatter_way(cores, acol, s_arr, upd):
    iA = (ps[:, None, None], iR[None, :, None], iN[None, None, :])
    new = jnp.where(upd[:, None, None], acol,
                    cores[iA[0], iA[1], iA[2], s_arr[:, None, None]])
    return cores.at[iA[0], iA[1], iA[2], s_arr[:, None, None]].set(new)


@jax.jit
def onehot_way(cores, acol, s_arr, upd):
    oh = (iR[None, :] == s_arr[:, None]) & upd[:, None]      # (nb, R) slot mask
    m = oh[:, None, None, :]                                  # (nb,1,1,R)
    body = jnp.where(m, acol[:, :, :, None], cores[:nb])
    return jax.lax.dynamic_update_slice_in_dim(cores, body, 0, axis=0)


r1 = timeit("scatter .at[].set", scatter_way, cores, acol, s_arr, upd)
r2 = timeit("one-hot where", onehot_way, cores, acol, s_arr, upd)
print("match:", bool(jnp.allclose(r1, r2)))

# gather read of the slot (used by wsel old-value reads)
@jax.jit
def gather_read(cores, s_arr):
    return cores[ps[:, None, None], iR[None, :, None], iN[None, None, :],
                 s_arr[:, None, None]]


@jax.jit
def onehot_read(cores, s_arr):
    oh = (iR[None, :] == s_arr[:, None]).astype(cores.dtype)  # (nb, R)
    return jnp.einsum("pins,ps->pin", cores[:nb], oh)


g1 = timeit("gather read", gather_read, cores, s_arr)
g2 = timeit("one-hot read", onehot_read, cores, s_arr)
print("match:", bool(jnp.allclose(g1, g2)))
