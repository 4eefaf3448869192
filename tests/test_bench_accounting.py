"""Pin the cost-analysis assumptions ``bench.py`` builds on.

``bench_ddim`` multiplies the whole-program cost analysis by
``num_inference_steps`` because XLA's HLO cost analysis counts a
``lax.scan``/while body ONCE, regardless of trip count. If a future
jax/XLA version starts folding the trip count into ``cost_analysis()``,
the bench would silently over-count 50x — this test fails loudly instead.

Also covers the honest-bound branch of ``_stats``: when the bytes-accessed
upper bound exceeds what HBM could physically move in the measured time,
the row must say "indeterminate", not claim a memory bound from an
impossible number.
"""

import jax
import jax.numpy as jnp
from jax import lax

import bench


def test_scan_body_counted_once():
    n = 10

    def body(c, _):
        return c @ c, None

    f_scan = jax.jit(lambda x: lax.scan(body, x, None, length=n)[0])
    f_once = jax.jit(lambda x: x @ x)
    x = jnp.ones((128, 128), jnp.float32)
    flops_scan = float(f_scan.lower(x).compile().cost_analysis()["flops"])
    flops_once = float(f_once.lower(x).compile().cost_analysis()["flops"])
    # Body counted once: the scan program's flops match ONE body execution
    # (not n of them), modulo tiny non-matmul overhead.
    assert flops_once > 0
    ratio = flops_scan / flops_once
    assert ratio < 2.0, (
        f"cost_analysis now multiplies scan bodies by trip count "
        f"(ratio {ratio:.1f}) — remove the x num_steps correction in "
        f"bench.bench_ddim or it will over-count"
    )


def test_stats_indeterminate_bound_when_bytes_exceed_physical():
    s = bench._stats(
        [1.0], iters=10, batch=8, flops_per_step=1e9,
        bytes_per_step=200e9, peak_tf=197.0, peak_bw=819.0,
    )
    assert s["hbm_util"] > 1.0
    assert s["bound"].startswith("indeterminate")


def test_stats_memory_and_compute_bounds():
    mem = bench._stats(
        [1.0], iters=10, batch=8, flops_per_step=1e9,
        bytes_per_step=50e9, peak_tf=197.0, peak_bw=819.0,
    )
    assert mem["bound"] == "memory"
    comp = bench._stats(
        [1.0], iters=10, batch=8, flops_per_step=1e13,
        bytes_per_step=1e9, peak_tf=197.0, peak_bw=819.0,
    )
    assert comp["bound"] == "compute"
