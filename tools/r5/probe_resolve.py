import os, sys, time, glob
sys.path.insert(0, "/root/repo")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
import numpy as np, jax, jax.numpy as jnp
from jax import lax

big = sorted(glob.glob("/root/repo/.bench_cache/bigdb_*nt"))[-1]
from centrifuger_tpu.build import load_index
fm, tax, seqlen, meta = load_index(big + "/ouridx")
from centrifuger_tpu.fm.device import DeviceFM
dev = DeviceFM(fm)
print("n=%d sel_rows=%s sample_rate=%d" %
      (fm.n, None if fm.selected_rows is None else len(fm.selected_rows),
       fm.sample_rate), flush=True)

@jax.jit
def _nop(x): return x + 1
float(_nop(jnp.zeros(())))
lat = 1e9
for _ in range(3):
    t0=time.time(); float(_nop(jnp.zeros(()))); lat=min(lat,time.time()-t0)

M = 65536
rng = np.random.default_rng(1)
rows = jnp.asarray(rng.integers(0, fm.n-1, M).astype(np.int32))
va = jnp.ones(M, bool)

def bench(name, traced):
    f = dev._jitted(("abl", name), traced)
    float(f(dev.arrs, rows, va))
    best=1e9
    for _ in range(3):
        t0=time.time(); float(f(dev.arrs, rows, va)); best=min(best,time.time()-t0)
    print("%-28s %.3fs" % (name, best-lat), flush=True)

# (a) full resolve
bench("full resolve", lambda s, r, v: s._resolve_rows_impl(r, v).sum())

# (b) fixed 16 iterations of just LF (no stop checks)
def lf_only(s, r, v):
    def body(i, cur):
        return s.lf(cur) % (s.n - 1)
    return lax.fori_loop(0, 16, body, r).sum()
bench("16x lf only", lf_only)

# (c) 16 iters of LF + arithmetic stop check, NO searchsorted
def lf_arith(s, r, v):
    def body(i, carry):
        cur, pend = carry
        found = (cur == s.first_isa) | (cur % s.sample_rate == 0)
        pend = pend & ~found
        nxt = s.lf(jnp.where(pend, cur, 0))
        return (jnp.where(pend, nxt, cur), pend)
    cur, _ = lax.fori_loop(0, 16, body, (r, v))
    return cur.sum()
bench("16x lf+arith stop", lf_arith)

# (d) 16 iters of LF + searchsorted membership
def lf_sel(s, r, v):
    def body(i, carry):
        cur, pend = carry
        found = (cur == s.first_isa) | (cur % s.sample_rate == 0)
        pos = jnp.searchsorted(s.sel_rows, cur)
        pos_c = jnp.minimum(pos, s.sel_rows.shape[0] - 1)
        found = found | (s.sel_rows[pos_c] == cur)
        pend = pend & ~found
        nxt = s.lf(jnp.where(pend, cur, 0))
        return (jnp.where(pend, nxt, cur), pend)
    cur, _ = lax.fori_loop(0, 16, body, (r, v))
    return cur.sum()
bench("16x lf+searchsorted", lf_sel)

# (e) while_loop with global-any cond (vs fori): cond cost
def wl(s, r, v):
    def cond(c): return s._loop_any(c[1])
    def body(carry):
        cur, pend = carry
        found = (cur == s.first_isa) | (cur % s.sample_rate == 0)
        pend = pend & ~found
        nxt = s.lf(jnp.where(pend, cur, 0))
        return (jnp.where(pend, nxt, cur), pend)
    cur, _ = lax.while_loop(cond, body, (r, v))
    return cur.sum()
bench("while lf+arith", wl)
print("done", flush=True)
