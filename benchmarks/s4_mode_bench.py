"""S4 evaluation-mode shootout at the CS3 operating point (L=4096).

Decides the default ``s4_mode`` with device-trace timings of the three
equivalent S4D evaluation paths (ops/s4.py, ops/s4_pallas.py) on the EEG
encoder's wide stack shape (d_model=64, n_state=64, L=4096 — reference
/root/reference/src/train/model.py:31-55):

  conv   — FFT convolution, O(L log L)
  scan   — XLA associative scan, O(L) work / log depth
  pallas — in-VMEM recurrence kernel, O(L) sequential, constant memory

Run on the TPU host:  python -m benchmarks.s4_mode_bench
"""

import json
import time

import jax
import jax.numpy as jnp

from loongx_tpu.ops.s4 import init_s4_stack, s4_stack_apply

B, L, D_IN, D_MODEL = 4, 4096, 4, 64

params = init_s4_stack(
    jax.random.key(0), d_input=D_IN, d_model=D_MODEL, d_output=D_MODEL,
    n_blocks=2, n_state=64,
)
u = jax.random.normal(jax.random.key(1), (B, L, D_IN), jnp.float32)


def force(x):
    return float(jnp.asarray(x).mean())


results = {}
outs = {}
for mode in ("conv", "scan", "pallas"):
    fn = jax.jit(lambda p, x, m=mode: s4_stack_apply(p, x, m))
    try:
        force(fn(params, u))  # compile
        n = 10
        t0 = time.perf_counter()
        ys = [fn(params, u) for _ in range(n)]
        for y in ys:
            force(y)
        dt = (time.perf_counter() - t0) / n
        results[mode] = round(dt * 1e3, 3)
        outs[mode] = ys[-1]
    except Exception as e:  # noqa: BLE001
        results[mode] = f"failed: {type(e).__name__}: {e}"

agree = {}
if "conv" in outs:
    ref = jnp.asarray(outs["conv"], jnp.float32)
    for mode, y in outs.items():
        if mode == "conv":
            continue
        d = jnp.asarray(y, jnp.float32) - ref
        agree[f"{mode}_vs_conv_relL2"] = float(
            jnp.linalg.norm(d) / (jnp.linalg.norm(ref) + 1e-12)
        )

print(json.dumps({
    "shape": [B, L, D_IN, D_MODEL],
    "ms_per_call": results,
    "agreement": agree,
}, indent=2))
