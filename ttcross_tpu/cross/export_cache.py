"""On-disk export cache for the fused cross executable.

On the axon TPU stack, jax LOWERING of the fused whole-cross program costs
~35-90 s per process (47x the CPU backend's lowering of the identical
jaxpr), dwarfing both tracing (~1 s) and the persistent-compile-cache hit
(~14 s).  jax.export solves it: the lowered StableHLO artifact serializes
to ~70 KB and deserializes in milliseconds, so every process after the
first skips straight to the compile-cache hit.

Safety: a stale or mismatched artifact must never be used silently.  The
cache key binds
  * the TRACED PROGRAM: a hash of the canonical jaxpr of the function
    being exported (text + captured constants).  Refactors, comment
    edits, and docstring changes that leave the traced program identical
    keep every warm artifact (source-file hashing — the previous scheme —
    invalidated the whole cache on any engine edit, costing minutes of
    axon lowering per round); any change that alters the traced program
    still invalidates exactly the artifacts it affects,
  * the full CrossConfig + run parameters,
  * jax version and device platform/kind,
  * a VALUE FINGERPRINT of the integrand: its outputs on 64 fixed
    pseudo-random probe indices, hashed.  Two integrands that agree on the
    probe batch but differ elsewhere would collide, but the probe covers
    the full index domain with 64 x d samples; combined with the program
    hash this is far stronger than any name-based key.

Every failure path falls back to the uncached function.
"""

from __future__ import annotations

import hashlib
import os
import warnings

import numpy as np

__all__ = ["cached_full_fn", "enabled"]


def enabled() -> bool:
    return os.environ.get("TTCROSS_EXPORT_CACHE", "1") not in ("0", "", "false")


def _cache_dir() -> str:
    d = os.environ.get(
        "TTCROSS_EXPORT_CACHE_DIR",
        os.path.join(os.path.expanduser("~"), ".cache", "ttcross_tpu_export"))
    os.makedirs(d, exist_ok=True)
    return d


def _program_hash(trace_fn, example_args) -> str:
    """Hash of the canonical jaxpr (text + captured constants) of the
    function about to be exported — the artifact's TRUE identity.  Tracing
    costs ~1 s; axon lowering (what the cache skips) costs 35-90 s, so an
    extra trace on cache hits is a fine price for keys that survive
    source refactors.  Constants are hashed by value because the jaxpr
    printer elides large arrays (two engines differing only in a captured
    node table would collide on text alone)."""
    import jax

    closed = jax.make_jaxpr(trace_fn)(*example_args)
    h = hashlib.sha256(str(closed).encode())
    for c in closed.consts:
        h.update(np.asarray(c).tobytes())
    return h.hexdigest()[:16]


def _fingerprint(fun, cfg) -> str:
    """Hash of the integrand's values on a fixed probe batch.  Recomputed
    on every call — memoizing by object id would serve a stale fingerprint
    for an integrand closure whose captured data was mutated in place (the
    64 CPU evals are negligible next to a cross run)."""
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(0x7C5)
    ind = np.stack([rng.integers(0, nj, size=64) for nj in cfg.n],
                   axis=1).astype(np.int32)
    # evaluate on the CPU backend: eager ops through the TPU tunnel
    # cost ~26 ms each, and CPU values are platform-independent
    try:
        with jax.default_device(jax.local_devices(backend="cpu")[0]):
            vals = np.asarray(fun(jnp.asarray(ind)), dtype=np.float64)
    except Exception:
        vals = np.asarray(fun(jnp.asarray(ind)), dtype=np.float64)
    return hashlib.sha256(vals.tobytes()).hexdigest()[:16]


def _code_fingerprint(fun2, cfg, params) -> str:
    """Fingerprint of a PARAMETERIZED integrand `fun2(ind, par)` by its
    traced jaxpr + captured constants + parameter shapes — NOT by values
    at the concrete params (a user sweeping parameter values must hit the
    same artifact: the params are runtime INPUTS of the exported program,
    so only the integrand's code shapes the artifact)."""
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(0x7C5)
    ind = np.stack([rng.integers(0, nj, size=64) for nj in cfg.n],
                   axis=1).astype(np.int32)
    par0 = jax.tree_util.tree_map(lambda a: jnp.asarray(a)[0], params)
    closed = jax.make_jaxpr(fun2)(jnp.asarray(ind), par0)
    h = hashlib.sha256(str(closed).encode())
    for c in closed.consts:
        # jaxpr printing elides large constants (two integrands differing
        # only in a captured node table would collide on text alone)
        h.update(np.asarray(c).tobytes())
    for leaf in jax.tree_util.tree_leaves(params):
        h.update(str((tuple(np.shape(leaf)), str(jnp.result_type(leaf)))).encode())
    return h.hexdigest()[:16]


def _serve(key: str, trace_fn, example_args, mesh=None):
    """Common disk machinery: deserialize the artifact at the hashed key,
    or export trace_fn on example_args and persist it.

    mesh: required for MULTI-DEVICE programs (shard_map'd runs).  An
    exported N-device module refuses to run "in a context with 1
    devices" — the call context is established by handing it inputs that
    live on the N-device mesh, so the returned callable device_puts every
    argument replicated over `mesh` first (replication matches the
    unspecified in_shardings these runs export with; verified on jax 0.9,
    8-device virtual mesh)."""
    import jax
    from jax import export

    path = os.path.join(
        _cache_dir(), hashlib.sha256(key.encode()).hexdigest()[:24] + ".bin")
    if os.path.exists(path):
        with open(path, "rb") as f:
            exp = export.deserialize(f.read())
    else:
        exp = export.export(trace_fn)(*example_args)
        blob = exp.serialize()
        tmp = path + f".tmp{os.getpid()}"
        with open(tmp, "wb") as f:
            f.write(blob)
        os.replace(tmp, path)
    call = jax.jit(exp.call)
    if mesh is None or mesh.devices.size == 1:
        return call
    from jax.sharding import NamedSharding, PartitionSpec

    replicated = NamedSharding(mesh, PartitionSpec())

    def call_on_mesh(*args):
        return call(*jax.device_put(args, replicated))

    return call_on_mesh


def cached_batch_fn(batch_fn, fun2, cfg, max_sweeps: int, with_quad: bool,
                    accuracy, example_args, params):
    """Export-cache wrapper for the cross_batch runner (batch.py): the
    vmapped whole-family executable, keyed by integrand CODE (jaxpr +
    consts), config, lane count and parameter shapes — parameter VALUES
    are runtime inputs, so a family sweep reuses one artifact."""
    import jax

    try:
        L = int(np.shape(jax.tree_util.tree_leaves(params)[0])[0])
        dev = jax.devices()[0]
        key = "|".join([
            _program_hash(batch_fn, example_args),
            _code_fingerprint(fun2, cfg, params), repr(cfg),
            f"batch:{max_sweeps}:{with_quad}:{accuracy}:L{L}",
            jax.__version__, dev.platform, getattr(dev, "device_kind", "?"),
        ])
        return _serve(key, batch_fn, example_args)
    except Exception as e:  # pragma: no cover - fallback must never fail
        warnings.warn(f"ttcross export cache disabled for this call: {e!r}")
        return batch_fn


def cached_full_fn(full_fn, fun, cfg, max_sweeps: int, with_quad: bool,
                   accuracy, example_args, kind: str = "full",
                   extra_src_modules=(), mesh=None):
    """Return a callable equivalent to full_fn, backed by the on-disk
    export cache.  example_args: concrete arguments used for export
    tracing on a miss.  kind distinguishes executables that share the same
    config (the fused full run vs a chunk's run_fn).

    extra_src_modules: accepted for backward compatibility and ignored —
    the program hash covers EVERY module traced into the artifact (the
    jaxpr is the artifact's identity), so source-set bookkeeping is no
    longer part of the key."""
    import jax
    from jax import export

    try:
        # the distributed run_fn carries CrossState through the exported
        # signature; namedtuples must be registered for serialization
        from .state import CrossState

        export.register_namedtuple_serialization(
            CrossState, serialized_name="ttcross_tpu.CrossState")
    except ValueError:
        pass   # already registered
    except Exception:
        pass
    try:
        dev = jax.devices()[0]
        key = "|".join([
            _program_hash(full_fn, example_args), _fingerprint(fun, cfg),
            repr(cfg),
            f"{kind}:{max_sweeps}:{with_quad}:{accuracy}",
            jax.__version__, dev.platform, getattr(dev, "device_kind", "?"),
        ] + ([f"mesh:{mesh.devices.size}"] if mesh is not None else []))
        return _serve(key, full_fn, example_args, mesh=mesh)
    except Exception as e:  # pragma: no cover - fallback must never fail
        warnings.warn(f"ttcross export cache disabled for this call: {e!r}")
        return full_fn
