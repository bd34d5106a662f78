"""Stage-by-stage ablation of stacked_loglik_terms at large N (TPU)."""
import json, os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
jax.config.update("jax_compilation_cache_dir", os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np
M = 2

def make(n, seed=0):
    rng = np.random.default_rng(seed)
    d = jnp.asarray(rng.uniform(1.0, 2.0, n), jnp.float32)
    p = jnp.asarray(0.3 * rng.normal(size=(M, n)), jnp.float32)
    q = jnp.asarray(0.3 * rng.normal(size=(M, n)), jnp.float32)
    a = jnp.asarray(0.1 * rng.normal(size=(M*M, n)) + 0.9*np.eye(M).reshape(M*M,1), jnp.float32)
    y = jnp.asarray(rng.normal(size=n), jnp.float32)
    return d, p, q, a, y

def timed(fn, args, iters=20):
    def mk(k):
        @jax.jit
        def run(args):
            def body(i, carry):
                d, p, q, a, y = args
                return carry + 1e-6*jnp.tanh(fn(d*(1.0+1e-6*jnp.tanh(carry)), p, q, a, y))
            return jax.lax.fori_loop(0, k, body, jnp.float32(0.0))
        return run
    r1, r2 = mk(iters), mk(2*iters)
    def best(run):
        float(run(args)); b = float("inf")
        for _ in range(3):
            t0 = time.perf_counter(); float(run(args)); b = min(b, time.perf_counter()-t0)
        return b
    return max((best(r2)-best(r1))/iters, 1e-9)

def main():
    n = int(float(sys.argv[1])) if len(sys.argv) > 1 else 1_000_000
    from tinygp_tpu.solvers.quasisep import scan as S
    from tinygp_tpu.solvers.quasisep.scan import riccati_scan_stacked, affine_scan_stacked

    def ric(d, p, q, a, y):
        return jnp.sum(riccati_scan_stacked(d, p, q, a))

    def emis(d, p, q, a, y):
        Fs = riccati_scan_stacked(d, p, q, a)
        Fp = S._smv(Fs, p, M, M)
        c2 = d - jnp.sum(p*Fp, axis=0)
        c = jnp.sqrt(c2); inv_c = 1.0/c
        w = (q - S._smv(a, Fp, M, M)) * inv_c
        return jnp.sum(w) + jnp.sum(jnp.log(c))

    def full(d, p, q, a, y):
        Fs = riccati_scan_stacked(d, p, q, a)
        Fp = S._smv(Fs, p, M, M)
        c2 = d - jnp.sum(p*Fp, axis=0)
        c = jnp.sqrt(c2); inv_c = 1.0/c
        w = (q - S._smv(a, Fp, M, M)) * inv_c
        wd = w * inv_c
        A = a - S._souter(wd, p)
        e = affine_scan_stacked(A, wd*y, M, 1)
        alpha = (y - jnp.sum(p*e, axis=0)) * inv_c
        return jnp.sum(jnp.square(alpha)) + jnp.sum(jnp.log(c))

    def aff_only(d, p, q, a, y):
        return jnp.sum(affine_scan_stacked(a, p * y, M, 1))

    args = make(n)
    for flag in ("0", "1"):
        os.environ["TINYGP_TPU_PALLAS_SCAN"] = flag
        jax.clear_caches()
        row = {"n": n, "pallas": flag == "1"}
        for name, fn in (("ric", ric), ("emis", emis), ("aff", aff_only), ("full", full)):
            row[name+"_s"] = timed(fn, args)
        print(json.dumps(row), flush=True)

main()
