"""Micro-benchmark: XLA offset-scan vs fused Pallas gated-CRF loss.

Times, at the headline shape (384^2, bs12, radius 5 -> 120 offsets):
  - compile wall-clock of value+grad for each path (the Pallas kernel's
    round-2 unrolled form exceeded 30 min in the remote Mosaic compiler;
    the round-3 fori_loop+roll form is the thing under test);
  - steady-state wall-clock of value+grad (median of N calls, value-fetch
    synced — block_until_ready returns early through tunneled runtimes).

Decides VERDICT r2 weak #6: the kernel goes default-on if it wins the step
section, or is retired with this measurement as the record.

Prints one JSON line. BENCH_SMALL=1 for a 128^2 bs4 quick run.
"""

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from fedicra_tpu.utils.jit_cache import enable_persistent_cache

enable_persistent_cache()


def main():
    small = os.environ.get("BENCH_SMALL") == "1"
    img = 128 if small else 384
    batch = 4 if small else 12
    n_calls = 5

    from fedicra_tpu.losses.gated_crf import gated_crf_loss
    from fedicra_tpu.ops.gated_crf_pallas import gated_crf_loss_pallas

    rng = np.random.default_rng(0)
    probs = jax.nn.softmax(
        jnp.asarray(rng.normal(size=(batch, img, img, 3)).astype(np.float32)),
        axis=-1,
    )
    image = jnp.asarray(
        rng.uniform(size=(batch, img, img, 3)).astype(np.float32)
    )

    def measure(fn, tag):
        vg = jax.jit(jax.value_and_grad(lambda y: fn(y, image, radius=5)))
        t0 = time.perf_counter()
        v, g = vg(probs)
        v = float(v)  # value fetch == sync
        compile_s = time.perf_counter() - t0
        times = []
        for _ in range(n_calls):
            t0 = time.perf_counter()
            v2, g = vg(probs)
            float(v2)
            float(jnp.sum(g))
            times.append(time.perf_counter() - t0)
        return {
            f"{tag}_value": v,
            f"{tag}_compile_s": round(compile_s, 2),
            f"{tag}_step_s": round(statistics.median(times), 4),
        }

    out = {"img": img, "batch": batch, "backend": jax.default_backend()}
    out.update(measure(gated_crf_loss, "xla"))
    try:
        out.update(measure(gated_crf_loss_pallas, "pallas"))
        out["pallas_speedup"] = round(
            out["xla_step_s"] / out["pallas_step_s"], 2
        )
        out["value_rel_err"] = round(
            abs(out["pallas_value"] - out["xla_value"])
            / max(abs(out["xla_value"]), 1e-9),
            6,
        )
    except Exception as e:  # record the failure mode instead of dying
        out["pallas_error"] = f"{type(e).__name__}: {e}"[:300]
    print(json.dumps(out))


if __name__ == "__main__":
    main()
