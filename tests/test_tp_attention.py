"""Tensor-parallel (shard_map) flash attention on the virtual CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from loongx_tpu.ops.attention import unified_attention
from loongx_tpu.ops.rope import rope_embed, apply_rope
from loongx_tpu.parallel import make_mesh
from loongx_tpu.parallel.tp_attention import tp_flash_attention

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 (virtual) devices"
)


def test_tp_matches_single_device():
    mesh = make_mesh(data=1, tensor=8)
    b, h, s, d = 1, 8, 256, 64
    ks = jax.random.split(jax.random.key(0), 3)
    q, k, v = (jax.random.normal(kk, (b, h, s, d), jnp.float32) for kk in ks)
    ref = unified_attention(q, k, v, cond_len=64, mode="no_union",
                            backend="xla")

    shard = NamedSharding(mesh, P(None, "tensor", None, None))
    q_s, k_s, v_s = (jax.device_put(x, shard) for x in (q, k, v))
    out = tp_flash_attention(
        mesh, q_s, k_s, v_s, cond_start=192, mode="no_union", interpret=True,
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5,
                               rtol=2e-5)
    # output must stay head-sharded (no implicit all-gather)
    assert out.sharding.spec == P(None, "tensor", None, None)


def test_tp_with_rope_and_cfactor():
    mesh = make_mesh(data=1, tensor=8)
    b, h, s, d = 1, 8, 128, 64
    ks = jax.random.split(jax.random.key(1), 4)
    q, k, v = (jax.random.normal(kk, (b, h, s, d), jnp.float32) for kk in ks[:3])
    ids = jax.random.uniform(ks[3], (s, 3)) * 16
    rope = rope_embed(ids, (d // 2, d // 4, d // 4))
    cf = jnp.float32(0.5)
    ref = unified_attention(
        apply_rope(q, *rope), apply_rope(k, *rope), v, cond_len=32,
        c_factor=cf, backend="xla",
    )
    shard = NamedSharding(mesh, P(None, "tensor", None, None))
    out = tp_flash_attention(
        mesh, jax.device_put(q, shard), jax.device_put(k, shard),
        jax.device_put(v, shard), cond_start=96, c_factor=cf, rope=rope,
        interpret=True,
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=3e-5,
                               rtol=3e-5)


def test_tp_context_routes_unified_attention():
    """Under tp_context, unified_attention(backend='pallas') must run the
    shard_map path with head-sharded inputs and matching numerics."""
    from loongx_tpu.parallel.mesh import tp_context

    mesh = make_mesh(data=1, tensor=8)
    b, h, s, d = 1, 8, 128, 64
    ks = jax.random.split(jax.random.key(2), 3)
    q, k, v = (jax.random.normal(kk, (b, h, s, d), jnp.float32) for kk in ks)
    ref = unified_attention(q, k, v, cond_len=32, mode="independent",
                            backend="xla")
    shard = NamedSharding(mesh, P(None, "tensor", None, None))
    q_s, k_s, v_s = (jax.device_put(x, shard) for x in (q, k, v))
    with tp_context(mesh):
        out = unified_attention(q_s, k_s, v_s, cond_len=32,
                                mode="independent", backend="pallas")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5,
                               rtol=2e-5)
    assert out.sharding.spec == P(None, "tensor", None, None)
