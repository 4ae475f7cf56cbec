"""Find usable HBM by allocating 1-GiB int8 chunks until failure."""
import jax, jax.numpy as jnp

held = []
GIB = 1024 ** 3
i = 0
try:
    while i < 20:
        x = jnp.zeros((GIB,), jnp.int8) + jnp.int8(i)
        float(x[0])  # force
        held.append(x)
        i += 1
        print(f"allocated {i} GiB ok", flush=True)
except Exception as e:
    print(f"failed at {i+1} GiB: {type(e).__name__}: {str(e)[:200]}")
print("usable ~", i, "GiB")
