"""Tests for the unified 3-stream attention (mask/bias modes of
reference block.py:106-131)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from loongx_tpu.ops.attention import unified_attention, attention_xla, _block_bias


def make_qkv(key, b=1, h=2, s=24, d=16):
    ks = jax.random.split(key, 3)
    return tuple(jax.random.normal(k, (b, h, s, d), jnp.float32) for k in ks)


def reference_sdpa(q, k, v, mask_or_bias=None):
    """Independent torch SDPA for cross-checking."""
    torch = pytest.importorskip("torch")
    qt, kt, vt = (torch.tensor(np.asarray(x)) for x in (q, k, v))
    m = None
    if mask_or_bias is not None:
        m = torch.tensor(np.asarray(mask_or_bias))
    out = torch.nn.functional.scaled_dot_product_attention(qt, kt, vt, attn_mask=m)
    return out.numpy()


class TestUnifiedAttention:
    def test_union_matches_torch(self):
        q, k, v = make_qkv(jax.random.key(0))
        out = unified_attention(q, k, v, cond_len=0, backend="xla")
        np.testing.assert_allclose(out, reference_sdpa(q, k, v), atol=2e-5)

    def test_no_union_blocks_cross_attention(self):
        """cond<->non-cond attention must be fully blocked (block.py:106-114)."""
        q, k, v = make_qkv(jax.random.key(1), s=24)
        cond_len = 8
        out = unified_attention(q, k, v, cond_len=cond_len, mode="no_union",
                                backend="xla")
        # Equivalent: separate attention on the two segments.
        out_main = unified_attention(
            q[:, :, :-cond_len], k[:, :, :-cond_len], v[:, :, :-cond_len],
            cond_len=0, backend="xla")
        out_cond = unified_attention(
            q[:, :, -cond_len:], k[:, :, -cond_len:], v[:, :, -cond_len:],
            cond_len=0, backend="xla")
        np.testing.assert_allclose(out[:, :, :-cond_len], out_main, atol=1e-5)
        np.testing.assert_allclose(out[:, :, -cond_len:], out_cond, atol=1e-5)

    def test_independent_condition(self):
        """cond queries see only cond keys; main queries see everything
        (block.py:115-120)."""
        q, k, v = make_qkv(jax.random.key(2), s=24)
        cond_len = 8
        out = unified_attention(q, k, v, cond_len=cond_len, mode="independent",
                                backend="xla")
        # cond rows must equal cond-only self attention
        out_cond = unified_attention(
            q[:, :, -cond_len:], k[:, :, -cond_len:], v[:, :, -cond_len:],
            cond_len=0, backend="xla")
        np.testing.assert_allclose(out[:, :, -cond_len:], out_cond, atol=1e-5)
        # main rows must equal full attention rows (they see all keys)
        out_full = unified_attention(q, k, v, cond_len=0, backend="xla")
        np.testing.assert_allclose(out[:, :, :-cond_len],
                                   out_full[:, :, :-cond_len], atol=1e-5)

    def test_c_factor_one_is_identity(self):
        """log(1) = 0 bias -> same as union attention (block.py:121-128)."""
        q, k, v = make_qkv(jax.random.key(3), s=24)
        out_bias = unified_attention(
            q, k, v, cond_len=8, c_factor=jnp.float32(1.0), backend="xla")
        out_plain = unified_attention(q, k, v, cond_len=8, backend="xla")
        np.testing.assert_allclose(out_bias, out_plain, atol=1e-5)

    def test_c_factor_limit_blocks_cross(self):
        """c_factor -> 0 suppresses cross attention like no_union."""
        q, k, v = make_qkv(jax.random.key(4), s=24)
        out_bias = unified_attention(
            q, k, v, cond_len=8, c_factor=jnp.float32(1e-20), backend="xla")
        out_blocked = unified_attention(q, k, v, cond_len=8, mode="no_union",
                                        backend="xla")
        np.testing.assert_allclose(out_bias, out_blocked, atol=1e-4)

    def test_c_factor_overrides_mode(self):
        """Reference precedence: c_factor replaces the mask entirely."""
        q, k, v = make_qkv(jax.random.key(5), s=24)
        out = unified_attention(q, k, v, cond_len=8, mode="no_union",
                                c_factor=jnp.float32(1.0), backend="xla")
        out_union = unified_attention(q, k, v, cond_len=8, backend="xla")
        np.testing.assert_allclose(out, out_union, atol=1e-5)

    def test_bias_matches_torch_masked_sdpa(self):
        q, k, v = make_qkv(jax.random.key(6), s=16)
        bias = _block_bias(16, 16, 12, "no_union", None)
        out = attention_xla(q, k, v, bias)
        expected = reference_sdpa(q, k, v, np.asarray(bias))
        np.testing.assert_allclose(out, expected, atol=2e-5)
