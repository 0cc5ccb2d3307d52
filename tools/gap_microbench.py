"""Where does the engine step spend its non-kernel time?  Scan-differenced
composition: kernel → +slices → +epilogue → +mask/sums (full hit-free step).
Run on the real chip from the repo root."""
import sys, time
import numpy as np

def main():
    import jax, jax.numpy as jnp
    from jax import lax
    from functools import partial
    from cuking_tpu.ops.king_pallas import panel_counts_pallas
    from cuking_tpu.ops.king_math import king_from_counts

    print("backend:", jax.default_backend(), file=sys.stderr)
    PANEL, WORDS = 1024, 3200  # 100k sites @ words_multiple=128
    N = 4 * PANEL
    rng = np.random.default_rng(0)
    planes = jnp.asarray(rng.integers(0, 2**32, (2, N, WORDS), dtype=np.uint32))
    kernel = partial(panel_counts_pallas, site_chunk_words=128)

    def timed(name, body, k_long=12):
        def fn(planes, k):
            def step(acc, t):
                i_off = (t % 3) * PANEL
                j_off = ((t + 1) % 4) * PANEL
                return acc + body(planes, i_off, j_off), None
            acc, _ = lax.scan(step, jnp.float32(0), jnp.arange(k))
            return acc
        f = jax.jit(fn, static_argnums=(1,))
        jax.block_until_ready(f(planes, 1)); jax.block_until_ready(f(planes, k_long))
        t0 = time.perf_counter(); jax.block_until_ready(f(planes, 1))
        t1 = time.perf_counter(); jax.block_until_ready(f(planes, k_long))
        t2 = time.perf_counter()
        dt = ((t2 - t1) - (t1 - t0)) / (k_long - 1)
        rate = PANEL * PANEL / dt / 1e6
        print(f"{name}: {dt*1e3:.2f} ms/step ({rate:.0f} M pairs/s)", file=sys.stderr)
        return dt

    def consume_counts(c):
        return (c.both_het.sum() + c.het_i.sum() + c.het_j.sum()
                + c.opposing_hom.sum() + c.concordant_hom.sum()
                + c.shared_sites.sum()).astype(jnp.float32)

    # (a) kernel on fixed panels (no slicing)
    pi0 = planes[:, :PANEL]; pj0 = planes[:, PANEL:2*PANEL]
    def body_a(planes, i_off, j_off):
        c = kernel(pi0 + jnp.uint32(i_off % 2), pj0, jnp.int32(0))
        return consume_counts(c)
    timed("a kernel only", body_a)

    # (b) + dynamic slices
    def body_b(planes, i_off, j_off):
        pi = lax.dynamic_slice(planes, (0, i_off, 0), (2, PANEL, WORDS))
        pj = lax.dynamic_slice(planes, (0, j_off, 0), (2, PANEL, WORDS))
        return consume_counts(kernel(pi, pj, jnp.int32(0)))
    timed("b +slices", body_b)

    # (c) + fp32 epilogue
    def body_c(planes, i_off, j_off):
        pi = lax.dynamic_slice(planes, (0, i_off, 0), (2, PANEL, WORDS))
        pj = lax.dynamic_slice(planes, (0, j_off, 0), (2, PANEL, WORDS))
        r = king_from_counts(kernel(pi, pj, jnp.int32(0)))
        return (jnp.nansum(r.kin) + r.ibs0.sum() + r.ibs1.sum()
                + r.ibs2.sum()).astype(jnp.float32)
    timed("c +epilogue", body_c)

    # (d) + mask + block sums + gated scatter skip (full hit-free step)
    local = jnp.arange(PANEL, dtype=jnp.int32)
    def body_d(planes, i_off, j_off):
        pi = lax.dynamic_slice(planes, (0, i_off, 0), (2, PANEL, WORDS))
        pj = lax.dynamic_slice(planes, (0, j_off, 0), (2, PANEL, WORDS))
        r = king_from_counts(kernel(pi, pj, jnp.int32(0)))
        gi = i_off + local; gj = j_off + PANEL + local
        mask = ((gi[:, None] < gj[None, :]) & (r.kin > jnp.float32(2.0)))
        m2 = mask.reshape(64, -1)
        bh = jnp.sum(m2, axis=1, dtype=jnp.int32)
        return jnp.sum(bh).astype(jnp.float32)
    timed("d +mask/sums", body_d)

    # (e) kernel with tri=1 on the diagonal (tile-skip rate check)
    def body_e(planes, i_off, j_off):
        pi = lax.dynamic_slice(planes, (0, i_off, 0), (2, PANEL, WORDS))
        return consume_counts(kernel(pi, pi + jnp.uint32(0), jnp.int32(1)))
    timed("e diagonal tri-skip", body_e)

if __name__ == "__main__":
    sys.path.insert(0, ".")
    main()
