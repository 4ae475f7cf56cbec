"""Kernel-fused RoPE vs XLA rope + attention."""

import jax
import jax.numpy as jnp
import numpy as np

from loongx_tpu.ops.attention import unified_attention
from loongx_tpu.ops.flash_attention import flash_attention
from loongx_tpu.ops.rope import rope_embed, apply_rope


def _setup(s=256, d=64):
    ks = jax.random.split(jax.random.key(0), 4)
    q, k, v = (jax.random.normal(kk, (1, 2, s, d), jnp.float32) for kk in ks[:3])
    ids = jax.random.uniform(ks[3], (s, 3)) * 32
    rope = rope_embed(ids, (d // 4, d // 4 * 2, d // 4))
    assert rope[0].shape == (s, d)
    return q, k, v, rope


def test_fused_rope_matches_xla():
    q, k, v, rope = _setup()
    out_pl = flash_attention(
        q, k, v, cond_start=192, mode="no_union", rope=rope,
        block_q=128, block_k=128,
    )
    q_r, k_r = apply_rope(q, *rope), apply_rope(k, *rope)
    out_ref = unified_attention(q_r, k_r, v, cond_len=64, mode="no_union",
                                backend="xla")
    np.testing.assert_allclose(
        np.asarray(out_pl), np.asarray(out_ref), atol=3e-5, rtol=3e-5
    )


def test_fused_rope_grads():
    q, k, v, rope = _setup(s=128)

    def loss_pl(q, k, v):
        return jnp.sum(
            flash_attention(q, k, v, cond_start=128, rope=rope,
                            block_q=128, block_k=128) ** 2
        )

    def loss_ref(q, k, v):
        return jnp.sum(
            unified_attention(apply_rope(q, *rope), apply_rope(k, *rope), v,
                              cond_len=0, backend="xla") ** 2
        )

    g_pl = jax.grad(loss_pl, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g_pl, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4,
                                   rtol=1e-3)


def test_padded_sequence_with_rope():
    q, k, v, rope = _setup(s=192)  # pads to 256 inside the kernel
    out_pl = flash_attention(q, k, v, cond_start=192, rope=rope,
                             block_q=256, block_k=256)
    out_ref = unified_attention(
        apply_rope(q, *rope), apply_rope(k, *rope), v, cond_len=0,
        backend="xla",
    )
    np.testing.assert_allclose(
        np.asarray(out_pl), np.asarray(out_ref), atol=3e-5, rtol=3e-5
    )
