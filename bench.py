"""Benchmark: sliding-window BA solve latency on the current backend.

Prints ONE JSON line:
  {"metric": "ba_solve_ms", "value": ..., "unit": "ms", "vs_baseline": ...}

vs_baseline compares against the reference's VIO solve budget of 80 ms
per solve on Jetson Xavier NX (reference config max_solver_time 0.08 s,
README.md:91-93; see BASELINE.md) — values > 1 mean faster than the
reference budget.
"""
import json
import time

import jax
import jax.numpy as jnp


def main():
    from d2slam_tpu.utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()  # TRT-engine-cache equivalent: warm reruns
    from __graft_entry__ import entry

    step, (state, imu, proj) = entry()
    solve = jax.jit(step)

    # compile
    out = solve(state, imu, proj)
    jax.block_until_ready(out)

    # steady-state: enough chained async dispatches to fill the pipe
    # (the production path keeps the device busy frame after frame)
    n = 100
    t0 = time.perf_counter()
    for _ in range(n):
        out = solve(state, imu, proj)
    jax.block_until_ready(out)
    dt_ms = (time.perf_counter() - t0) / n * 1000.0

    baseline_ms = 80.0  # reference max_solver_time on Xavier NX
    print(
        json.dumps(
            {
                "metric": "ba_solve_ms",
                "value": round(dt_ms, 3),
                "unit": "ms",
                "vs_baseline": round(baseline_ms / dt_ms, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
