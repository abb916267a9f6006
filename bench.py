#!/usr/bin/env python
"""Benchmark driver: the five BASELINE.md configs + the C_6 north-star
headline (test_crs_ising.exe C 6 64 24 1).

Prints one JSON line per config, and the HEADLINE line LAST (the round
driver parses the tail):
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...extras}

The reference publishes no throughput numbers (BASELINE.md: "published":
{}); vs_baseline is therefore measured against NOMINAL_REF_EVALS_PER_SEC,
a stated nominal for the reference Fortran MPI+OpenMP build on a 64-core
node (O(0.1-1 us) per integrand eval across 64 threads, derated for MPI
sync).

Warmup protocol (tail-robust): time-to-first-result is measured in K
FRESH subprocesses (default 3) run SEQUENTIALLY before this process
touches the TPU (one-TPU-process rule), so a single degraded tunnel
sample cannot define the artifact: warmup_time_s is the MEDIAN and the
worst sample is reported separately as warmup_tail_s.  Set
TTCROSS_BENCH_WARMUP_K=0 to skip probes (falls back to this process's
own first-call time).
"""

import json
import os
import statistics
import subprocess
import sys
import time

import numpy as np

NOMINAL_REF_EVALS_PER_SEC = 1.0e6
PROBE_TIMEOUT_S = 1500
TPU_ALIVE_TIMEOUT_S = 300


def tpu_alive():
    """Probe TPU device enumeration in a KILLABLE subprocess.

    The axon tunnel can wedge so that `jax.devices()` blocks forever (no
    error, no timeout) — observed live 2026-08-17.  A hung parent means NO
    bench artifact at all, so enumeration is probed out-of-process with a
    hard timeout, twice (the second attempt gives a transiently-degraded
    tunnel ~10 min total to come back).  Returns False only if both probes
    fail; the caller then forces the CPU backend and flags every emitted
    line with tpu_fallback=true rather than producing nothing."""
    code = "import jax; print(jax.devices()[0].platform, flush=True)"
    tmo = float(os.environ.get("TTCROSS_TPU_ALIVE_TIMEOUT", TPU_ALIVE_TIMEOUT_S))
    for attempt in range(2):
        try:
            proc = subprocess.run([sys.executable, "-c", code],
                                  capture_output=True, text=True,
                                  timeout=tmo)
            plat = proc.stdout.strip().lower()
            # a fast tunnel failure can make jax silently fall back to CPU
            # devices with exit 0 — accept only a non-CPU platform, else
            # the suite would emit CPU numbers WITHOUT the honesty flag
            if proc.returncode == 0 and plat and plat != "cpu":
                return True
        except subprocess.TimeoutExpired:
            pass
        _emit({"metric": "tpu_alive_probe", "attempt": attempt, "ok": False})
    return False


def _force_cpu_backend():
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + " --xla_force_host_platform_device_count=1")
    import jax

    jax.config.update("jax_platforms", "cpu")
    try:
        from jax._src import xla_bridge

        if xla_bridge.backends_are_initialized():
            xla_bridge._clear_backends()
    except Exception:
        pass


def _emit(obj):
    print(json.dumps(obj), flush=True)


class _SkipConfig(Exception):
    """Internal marker: config intentionally skipped (headline-only mode)."""


def warmup_probe():
    """Child mode: fresh-process time-to-first-result on the north star."""
    t0 = time.time()
    import ttcross_tpu  # noqa: F401
    from ttcross_tpu.apps import make_ising
    from ttcross_tpu.cross import cross

    prob = make_ising("C", m=6, n=64)
    res = cross(prob.fun, [prob.n] * prob.d, max_rank=24,
                accuracy=500 * 2.2e-16, pivoting=1,
                quad=[prob.quad_weights] * prob.d, truth=prob.truth)
    _emit({"probe_warmup_s": round(time.time() - t0, 3),
           "digits": round(float(-np.log10(res.errors[-1])), 2)})
    return 0


def run_warmup_probes():
    """Sequential fresh-process probes, BEFORE the parent touches the TPU."""
    k = int(os.environ.get("TTCROSS_BENCH_WARMUP_K", "3"))
    times, failures = [], 0
    for i in range(k):
        t0 = time.time()
        try:
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--warmup-probe"],
                capture_output=True, text=True, timeout=PROBE_TIMEOUT_S)
            ok = proc.returncode == 0
            samp = None
            if ok:
                for line in reversed(proc.stdout.splitlines()):
                    try:
                        samp = json.loads(line).get("probe_warmup_s")
                        break
                    except Exception:
                        continue
            if samp is None:
                failures += 1
                times.append(time.time() - t0)
            else:
                times.append(float(samp))
        except subprocess.TimeoutExpired:
            failures += 1
            times.append(float(PROBE_TIMEOUT_S))
        _emit({"metric": "warmup_probe", "sample": i, "seconds": round(times[-1], 2)})
    if not times:
        return None, None, failures
    return (round(statistics.median(times), 2), round(max(times), 2), failures)


def _timed(fn):
    """(warm, timed) pair: first call pays compile, second is steady."""
    t0 = time.time()
    fn()
    warm = time.time() - t0
    t0 = time.time()
    res = fn()
    return res, time.time() - t0, warm


def main():
    # 0) watchdog: is the TPU tunnel answering device enumeration at all?
    #    (a wedged tunnel hangs jax.devices() forever — fall back to CPU
    #    with an honest flag instead of hanging the whole bench).
    #    TTCROSS_BENCH_FORCE_FALLBACK=1 skips the probe and forces CPU —
    #    set by the parent's headline-retry subprocess (below).
    forced = os.environ.get("TTCROSS_BENCH_FORCE_FALLBACK") == "1"
    fallback = forced or not tpu_alive()
    if fallback:
        _force_cpu_backend()
    headline_only = os.environ.get("TTCROSS_BENCH_HEADLINE_ONLY") == "1"

    # 1) fresh-process warmup probes FIRST (this process must not have
    #    dispatched to the TPU yet — one TPU process at a time); pointless
    #    on a dead tunnel (each child would burn its full 1500 s timeout)
    warm_med = warm_tail = None
    probe_failures = 0
    if not fallback and int(os.environ.get("TTCROSS_BENCH_WARMUP_K", "3")) > 0:
        warm_med, warm_tail, probe_failures = run_warmup_probes()

    import ttcross_tpu  # noqa: F401  (x64)
    import jax
    import ttcross_tpu.tt as tt
    from ttcross_tpu.apps import (make_cos_coefficients, make_ising,
                                  make_mvn, make_mvn_density, make_stdnorm)
    from ttcross_tpu.cross import cross
    from ttcross_tpu.cross.accchk import accchk

    device = str(jax.devices()[0])
    acc = 500 * 2.2e-16

    def line(metric, res, elapsed, extras=None):
        digits = (-np.log10(res.errors[-1])) if res.errors else None
        out = {
            "metric": metric,
            "evals_per_sec": round(res.neval / elapsed, 1),
            "correct_digits": (round(float(digits), 2)
                               if digits is not None else None),
            "n_evals": int(res.neval),
            "wall_time_s": round(elapsed, 3),
            "sweeps": res.sweeps,
            "max_rank": max(res.ranks),
        }
        if res.padded_evals:
            out["padded_ratio"] = round(res.padded_evals / res.neval, 2)
        if fallback:
            out["tpu_fallback"] = True
        out.update(extras or {})
        _emit(out)
        return out

    def guarded(name, body):
        """Run one config block; any failure (e.g. a mid-run tunnel drop —
        JaxRuntimeError UNAVAILABLE killed the whole artifact live on
        2026-08-18) emits a skipped line and the suite continues: the
        HEADLINE line at the end must always be attempted."""
        try:
            return body()
        except Exception as e:
            _emit({"metric": name, "skipped": repr(e)[:160]})
            return None

    # ---- config 1: stdnorm d=10 N=33 RANK=8 (test_crs_stdnorm.exe 10 32 8 1)
    def config_stdnorm():
        p1 = make_stdnorm(d=10, n=32)
        q1 = dict(max_rank=8, accuracy=5 * 2.2e-16, pivoting=1,
                  quad=[p1.quad_weights] * p1.d, truth=p1.truth)
        res, el, _ = _timed(lambda: cross(p1.fun, [p1.n] * p1.d, **q1))
        base_evals = int(res.neval)
        line("stdnorm_d10", res, el)

        # adaptive hunt gating companion: converged bonds skip their fiber
        # evaluations — FEWER integrand calls than the reference performs
        # on the identical run, at identical digits (cross(adaptive=True))
        res, el, _ = _timed(lambda: cross(p1.fun, [p1.n] * p1.d,
                                          adaptive=True, **q1))
        line("stdnorm_d10_adaptive", res, el,
             {"evals_saved_vs_greedy": round(1.0 - res.neval / base_evals, 3)})

    # ---- config 2: MVN probability d=6 N=65 RANK=20 (test_crs_mvn.exe)
    def config_mvn():
        p2 = make_mvn(d=6, n=65)
        q2 = dict(max_rank=20, accuracy=acc, pivoting=1,
                  quad=[p2.quad_weights] * p2.d, truth=p2.truth)
        res, el, _ = _timed(lambda: cross(p2.fun, [p2.n] * p2.d, **q2))
        line("mvn_d6", res, el)
        return p2, res, el

    # ---- config 3: COS coefficient tensor (test_crs_coscoeff.exe 6 65 20 1)
    def config_coscoeff():
        dens = make_mvn_density(6, corr=0.5)
        cc = make_cos_coefficients(6, dens.mu, dens.cov, 0.52517, 8.52517)
        res, el, _ = _timed(lambda: cross(cc.fun, [65] * 6, max_rank=20,
                                          accuracy=acc, pivoting=1))
        chk = accchk(res.tt, cc.fun, nlot=2**14)
        line("coscoeff_d6", res, el,
             {"accchk_einf": float(f"{chk['einf']:.3e}"),
              "accchk_rel": float(f"{chk['einf'] / max(chk['ainf'], 1e-300):.3e}")})

    # ---- config 5a: mvn_complex — complex contraction path over config
    # 2's train (the cross is byte-identical to config 2's; only the
    # complex-weights contraction differs, so re-running it would just pay
    # two redundant device crosses)
    def config_mvn_complex(p2, res2, el2):
        w_c = [p2.quad_weights.astype(np.complex128)] * p2.d
        val = complex(tt.contract(res2.tt, w_c))
        dig_c = -np.log10(abs(1 - val / p2.truth)) if val != 0 else float("nan")
        line("mvn_complex_d6", res2, el2,
             {"complex_digits": round(float(dig_c), 2)})

    # ---- quality companion: maxvol pivot replacement past the greedy
    # fixed-rank ceiling on the MVN config (cross(refine_sweeps=2):
    # ~5.9 greedy -> ~7 digits at rank 20 without rank inflation)
    def config_mvn_refined(p2):
        q2 = dict(max_rank=20, accuracy=acc, pivoting=1,
                  quad=[p2.quad_weights] * p2.d, truth=p2.truth)
        res, el, _ = _timed(lambda: cross(p2.fun, [p2.n] * p2.d,
                                          refine_sweeps=2, **q2))
        line("mvn_d6_refined", res, el, {"refine_sweeps": 2})

    if not headline_only:
        guarded("stdnorm_d10", config_stdnorm)
        mvn_out = guarded("mvn_d6", config_mvn)
        guarded("coscoeff_d6", config_coscoeff)
        if mvn_out is not None:
            guarded("mvn_complex_d6", lambda: config_mvn_complex(*mvn_out))
            guarded("mvn_d6_refined", lambda: config_mvn_refined(mvn_out[0]))

    # ---- config 5b: beyond-f64 tier — dd cross of Ising C_4
    try:
        if headline_only:
            raise _SkipConfig()
        from ttcross_tpu.apps.ising import make_ising_dd
        from ttcross_tpu.apps.truths import ISING_C_STR
        from ttcross_tpu.cross.engine_dd import cross_dd
        from decimal import Decimal, localcontext

        prob_dd, fun_dd, wh, wl = make_ising_dd(m=4, n=33)
        t0 = time.time()
        rdd = cross_dd(fun_dd, [prob_dd.n] * prob_dd.d, wh, wl,
                       max_rank=16, pivoting=1)
        el = time.time() - t0
        with localcontext() as ctx:
            ctx.prec = 60
            got = Decimal(rdd.value[0]) + Decimal(rdd.value[1])
            rel = abs(1 - got / Decimal(ISING_C_STR[4]))
            dd_digits = float(-rel.log10()) if rel != 0 else 60.0
        _emit({"metric": "ising_c4_dd_tier", "correct_digits": round(dd_digits, 2),
               "n_evals": int(rdd.neval), "wall_time_s": round(el, 3),
               "evals_per_sec": round(rdd.neval / el, 1)})
    except _SkipConfig:
        pass
    except Exception as e:  # the dd tier needs the native toolchain
        _emit({"metric": "ising_c4_dd_tier", "skipped": repr(e)[:120]})

    # ---- config 5c: quad-double ENGINE tier — stdnorm to ~62 digits
    # (cross/engine_qd.py; pure host numpy, no device work: the ~60-digit
    # point on the multiprecision ladder, between dd ~31 and mpmath 120)
    try:
        if headline_only:
            raise _SkipConfig()
        from mpmath import mp as _mp, mpf as _mpf, workdps as _workdps

        from ttcross_tpu.apps.stdnorm import make_stdnorm_qd
        from ttcross_tpu.cross.engine_qd import cross_qd
        from ttcross_tpu.ops.qd import qd_to_mp

        prob_qd, fun_qd, wq = make_stdnorm_qd(d=4, n=201)
        t0 = time.time()
        rqd = cross_qd(fun_qd, [prob_qd.n] * prob_qd.d, max_rank=4, quad=wq)
        el = time.time() - t0
        with _workdps(80):
            got = qd_to_mp(*(np.asarray(e) for e in rqd.value))
            rel = abs(1 - got / _mp.pi ** _mpf(2))     # truth pi^(d/2), d=4
            qd_digits = float(-_mp.log10(rel)) if rel != 0 else 80.0
        _emit({"metric": "stdnorm_d4_qd_engine",
               "correct_digits": round(qd_digits, 2),
               "n_evals": int(rqd.neval), "wall_time_s": round(el, 3),
               "evals_per_sec": round(rqd.neval / el, 1)})
    except _SkipConfig:
        pass
    except Exception as e:
        _emit({"metric": "stdnorm_d4_qd_engine", "skipped": repr(e)[:120]})

    # ---- config 4: the north star, greedy (reference CLI C 6 64 24 1)
    prob = make_ising("C", m=6, n=64)
    args = dict(max_rank=24, accuracy=acc, pivoting=1,
                quad=[prob.quad_weights] * prob.d, truth=prob.truth)

    def config_greedy():
        res_g, el_g, warm_self = _timed(
            lambda: cross(prob.fun, [prob.n] * prob.d, **args))
        line("ising_c6_greedy", res_g, el_g)
        return (-np.log10(res_g.errors[-1]), warm_self,
                round(res_g.neval / el_g, 1))

    greedy_out = guarded("ising_c6_greedy", config_greedy)
    dig_g, warm_self, eps_g = greedy_out if greedy_out else (None,) * 3

    # ---- n_evals parity line: chunked growth + per-bond rank caps (the
    # C_6 rank profile, a FIXED constant so the export-cache key is
    # stable across bench runs) -> counted padded_ratio ~ 1.15 (the
    # reference's exact dynamic shapes are ratio 1.0).  Compile-heavy on
    # a cold cache (6 unrolled executables); skippable via env.
    def config_capped():
        caps = [16, 24, 24, 16]
        res, el, _ = _timed(lambda: cross(
            prob.fun, [prob.n] * prob.d, rank_chunks=[4, 8, 12, 16, 20, 24],
            rank_caps=caps, **args))
        line("ising_c6_chunked_capped", res, el, {"rank_caps": caps})

    if (os.environ.get("TTCROSS_BENCH_CAPPED", "1") not in ("0", "false")
            and not headline_only):
        guarded("ising_c6_chunked_capped", config_capped)

    # ---- batch family line: L parameterized crosses fused into ONE
    # device program (cross_batch) vs L single runs, steady state.  The
    # speedup shows on the latency-bound TPU path (L small-op lanes cost
    # close to one); on the CPU fallback lanes cost ~linearly, so the
    # line is TPU-only unless forced (TTCROSS_BENCH_BATCH=1).
    def config_family():
        from ttcross_tpu.apps.mvn import make_mvn_family
        from ttcross_tpu.cross import cross_batch

        lanes = 4
        fam = make_mvn_family(d=6, n=65,
                              corrs=np.linspace(0.2, 0.6, lanes))
        bargs = dict(max_rank=14, accuracy=acc, pivoting=1,
                     quad=[fam.quad_weights] * 6, truth=1.0)
        resb, elb, _ = _timed(lambda: cross_batch(
            fam.fun, [fam.n] * 6, fam.params, **bargs))
        resb, elb, _ = _timed(lambda: cross_batch(      # steady (compiled)
            fam.fun, [fam.n] * 6, fam.params, **bargs))
        singles = 0.0
        for lk in range(lanes):
            par = {k: v[lk] for k, v in fam.params.items()}
            fun1 = (lambda p: lambda ind: fam.fun(ind, p))(par)
            _, el1, _ = _timed(lambda: cross(fun1, [fam.n] * 6, **bargs))
            _, el1, _ = _timed(lambda: cross(fun1, [fam.n] * 6, **bargs))
            singles += el1
        worst = min(-np.log10(r.errors[-1]) for r in resb if r.errors)
        out = {"metric": "mvn_family_batch", "lanes": lanes,
               "batch_wall_s": round(elb, 3),
               "singles_wall_s": round(singles, 3),
               "family_speedup": round(singles / elb, 2),
               "worst_lane_digits": round(float(worst), 2),
               "n_evals": int(resb.neval)}
        if fallback:
            out["tpu_fallback"] = True
        _emit(out)

    if (((not fallback) or os.environ.get("TTCROSS_BENCH_BATCH") == "1")
            and not headline_only):
        guarded("mvn_family_batch", config_family)

    # ---- HEADLINE (LAST LINE): C_6 crossed at rank 30 on the device,
    # then the oversample cure with the refine-tier accuracy split: the
    # skeleton DATA is re-evaluated by the host-numpy integrand and the
    # rank-30 -> 24 rounding + value run all-host.  On this TPU the
    # emulated f64 multiply gives ~7e-15 integrand noise that caps a
    # device-valued train at ~12.7 digits; host re-evaluation at the
    # device-chosen pivots restores 14.0+ (diagnosis in BENCH_NOTES,
    # 2026-08-18).  n_evals/padded include the skeleton re-samples.
    def headline():
        res, el, _ = _timed(lambda: cross(
            prob.fun, [prob.n] * prob.d, oversample=6,
            host_reeval=prob.fun_np, **args))
        digits = -np.log10(res.errors[-1])
        n_evals = int(res.neval)
        evals_per_sec = n_evals / el
        t_hit = next((i for i, e in enumerate(res.errors) if e <= 1e-10), None)
        out = {
            "metric": "ising_c6_evals_per_sec",
            "value": round(evals_per_sec, 1),
            "unit": "evals/sec",
            "vs_baseline": round(evals_per_sec / NOMINAL_REF_EVALS_PER_SEC, 3),
            "device": device,
            "correct_digits": round(float(digits), 2),
            "greedy_digits": (round(float(dig_g), 2)
                              if dig_g is not None else None),
            "greedy_evals_per_sec": eps_g,
            "n_evals": n_evals,
            "wall_time_s": round(el, 3),
            "warmup_time_s": (warm_med if warm_med is not None
                              else (round(warm_self, 3)
                                    if warm_self is not None else None)),
            "warmup_tail_s": warm_tail,
            "warmup_probe_failures": probe_failures,
            "sweeps": res.sweeps,
            "first_sweep_below_1e-10": t_hit,
            "max_rank": 24,
            "oversample": 6,
            "host_reeval": True,
            # honesty metrics: n_evals counts ACTIVE entries (the
            # reference's bookkeeping, dmrgg.f90:372,465,...) PLUS the
            # host skeleton re-samples; padded_evals COUNTS (in
            # CrossState, not estimates) every integrand call incl.
            # masked padding slots, plus the same re-samples
            "padded_evals": int(res.padded_evals),
            "padded_ratio": round(res.padded_evals / n_evals, 2),
        }
        if fallback:
            # honest flag: the tunnel was down at bench time; these are
            # CPU numbers, NOT the TPU headline (see BENCH_NOTES for TPU
            # envelopes)
            out["tpu_fallback"] = True
        _emit(out)

    try:
        headline()
    except Exception as e:
        _emit({"metric": "ising_c6_evals_per_sec_tpu_attempt",
               "failed": repr(e)[:160]})
        if fallback:
            return 1   # already on CPU; nothing left to fall back to
        # the tunnel answered the watchdog but died mid-run (observed
        # live 2026-08-18: UNAVAILABLE at a device_put after 4 configs).
        # Re-run headline-only in a FRESH CPU subprocess so the artifact
        # still ends with an honestly-flagged headline line.
        env = dict(os.environ,
                   TTCROSS_BENCH_FORCE_FALLBACK="1",
                   TTCROSS_BENCH_HEADLINE_ONLY="1",
                   TTCROSS_BENCH_WARMUP_K="0")
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            capture_output=True, text=True, timeout=3600, env=env)
        sys.stdout.write(proc.stdout)
        sys.stdout.flush()
        return proc.returncode
    return 0


def main_parallel(ndevs):
    """`bench.py --parallel [ndev ...]`: distributed-engine scaling on the
    virtual CPU mesh (the `mpirun -np N` benchmark channel; real multi-chip
    hardware is not available in this image — virtual devices share the
    host's cores, so this measures collective/sharding overhead and
    correctness at scale, not true speedup).  Default ndevs: 1 2 4 8."""
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + " --xla_force_host_platform_device_count=8")
    import jax

    jax.config.update("jax_platforms", "cpu")
    try:
        from jax._src import xla_bridge

        if xla_bridge.backends_are_initialized():
            xla_bridge._clear_backends()
    except Exception:
        pass
    import ttcross_tpu  # noqa: F401
    from ttcross_tpu.apps import make_ising
    from ttcross_tpu.cross import cross
    from ttcross_tpu.parallel import cross_parallel
    from ttcross_tpu.parallel.mesh import bond_mesh

    prob = make_ising("C", m=32, n=16)   # d=31: 30 bonds, divisible slabs
    args = dict(max_rank=8, accuracy=500 * 2.2e-16, pivoting=1,
                quad=[prob.quad_weights] * prob.d, truth=prob.truth)
    rows = []
    for ndev in ndevs:
        for rep in range(2):             # second call = steady (cached compile)
            t0 = time.time()
            if ndev == 1:
                res = cross(prob.fun, [prob.n] * prob.d, **args)
            else:
                res = cross_parallel(prob.fun, [prob.n] * prob.d,
                                     mesh=bond_mesh(jax.devices()[:ndev]), **args)
            wall = time.time() - t0
        digits = -np.log10(res.errors[-1]) if res.errors else float("nan")
        rows.append({"ndev": ndev, "wall_s": round(wall, 3),
                     "sweep_ms": round(1e3 * wall / max(res.sweeps, 1), 1),
                     "digits": round(float(digits), 2),
                     "n_evals": int(res.neval), "sweeps": res.sweeps})
        print(json.dumps({"metric": "ising_c32_parallel_scaling", **rows[-1]}))
    return 0


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--warmup-probe":
        sys.exit(warmup_probe())
    if len(sys.argv) > 1 and sys.argv[1] == "--parallel":
        nd = [int(x) for x in sys.argv[2:]] or [1, 2, 4, 8]
        sys.exit(main_parallel(nd))
    sys.exit(main())
