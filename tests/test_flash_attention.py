"""Pallas flash-attention kernel vs the XLA reference implementation.

On CPU the kernel runs in interpret mode — same kernel logic, slow but exact.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from loongx_tpu.ops.attention import unified_attention
from loongx_tpu.ops.flash_attention import flash_attention


def make_qkv(key, b=1, h=2, s=256, d=64, dtype=jnp.float32):
    ks = jax.random.split(key, 3)
    return tuple(
        jax.random.normal(k, (b, h, s, d), dtype) for k in ks
    )


@pytest.mark.parametrize("mode", ["union", "no_union", "independent"])
def test_modes_match_xla(mode):
    q, k, v = make_qkv(jax.random.key(0), s=256)
    cond_len = 64
    out_ref = unified_attention(q, k, v, cond_len=cond_len, mode=mode,
                                backend="xla")
    out_pl = flash_attention(
        q, k, v, cond_start=256 - cond_len, mode=mode, block_q=128, block_k=128
    )
    np.testing.assert_allclose(
        np.asarray(out_pl), np.asarray(out_ref), atol=2e-5, rtol=2e-5
    )


def test_cfactor_matches_xla():
    q, k, v = make_qkv(jax.random.key(1), s=256)
    cf = jnp.float32(0.5)
    out_ref = unified_attention(q, k, v, cond_len=64, c_factor=cf, backend="xla")
    out_pl = flash_attention(
        q, k, v, cond_start=192, c_factor=cf, block_q=128, block_k=128
    )
    np.testing.assert_allclose(
        np.asarray(out_pl), np.asarray(out_ref), atol=2e-5, rtol=2e-5
    )


def test_unpadded_vs_padded_sequence():
    """S not a multiple of the block: padded keys must not leak."""
    q, k, v = make_qkv(jax.random.key(2), s=192)  # pads to 256
    out_ref = unified_attention(q, k, v, cond_len=0, backend="xla")
    out_pl = flash_attention(q, k, v, cond_start=192, block_q=256, block_k=256)
    assert out_pl.shape == out_ref.shape
    np.testing.assert_allclose(
        np.asarray(out_pl), np.asarray(out_ref), atol=2e-5, rtol=2e-5
    )


def test_multi_qtile():
    q, k, v = make_qkv(jax.random.key(3), s=512)
    out_ref = unified_attention(q, k, v, cond_len=128, mode="no_union",
                                backend="xla")
    out_pl = flash_attention(
        q, k, v, cond_start=384, mode="no_union", block_q=128, block_k=128
    )
    np.testing.assert_allclose(
        np.asarray(out_pl), np.asarray(out_ref), atol=2e-5, rtol=2e-5
    )


def test_bf16_tolerance():
    q, k, v = make_qkv(jax.random.key(4), s=256, dtype=jnp.bfloat16)
    out_ref = unified_attention(q, k, v, cond_len=64, backend="xla")
    out_pl = flash_attention(q, k, v, cond_start=192, block_q=128, block_k=128)
    assert out_pl.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(out_pl, np.float32), np.asarray(out_ref, np.float32),
        atol=2e-2, rtol=2e-2,
    )


def test_grad_matches_xla():
    q, k, v = make_qkv(jax.random.key(5), s=128)
    cf = jnp.float32(0.7)

    def loss_pl(q, k, v):
        return jnp.sum(
            flash_attention(q, k, v, cond_start=96, c_factor=cf,
                            block_q=128, block_k=128) ** 2
        )

    def loss_ref(q, k, v):
        return jnp.sum(
            unified_attention(q, k, v, cond_len=32, c_factor=cf,
                              backend="xla") ** 2
        )

    g_pl = jax.grad(loss_pl, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g_pl, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4,
                                   rtol=1e-3)


def test_padding_only_truncation_fwd_and_grad():
    """Mixed block sizes whose floor grids cover all REAL rows but not the
    full padded length are benign and must pass the coverage guard: the
    backward at long S pairs the forward's block_q with its own smaller
    block_k cap (e.g. (512, 896) over s_pad=8960 at the 1024px point
    S=8704), which a strict divisibility check used to reject.  Small
    analog: S=768, (block_q=384, block_k=512) -> s_pad=1024, q grid covers
    exactly 768."""
    q, k, v = make_qkv(jax.random.key(9), s=768)

    def loss_pl(q, k, v):
        return jnp.sum(
            flash_attention(q, k, v, cond_start=512, mode="union",
                            block_q=384, block_k=512) ** 2
        )

    def loss_ref(q, k, v):
        return jnp.sum(
            unified_attention(q, k, v, cond_len=256, mode="union",
                              backend="xla") ** 2
        )

    out = flash_attention(q, k, v, cond_start=512, mode="union",
                          block_q=384, block_k=512)
    ref = unified_attention(q, k, v, cond_len=256, mode="union",
                            backend="xla")
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), atol=2e-5, rtol=2e-5
    )
    g_pl = jax.grad(loss_pl, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g_pl, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4,
                                   rtol=1e-3)


def test_bwd_blocks_cover_every_length():
    """The backward block pair must cover every real row for EVERY sequence
    length under the default forward policy: mixing the forward's block_q
    with the smaller backward cap used to fail ~10% of lengths past 4352
    (e.g. S=4353 -> (512, 896) grids over s_pad=4480 cover only 4096)."""
    from loongx_tpu.ops.flash_attention import (
        _bwd_blocks, _round_up, auto_blocks,
    )

    # every 128-aligned length (the real operating grid) + the worst-case
    # odd lengths called out by review
    lengths = list(range(128, 20000, 128)) + [4353, 6145, 12289, 14849]
    for s in lengths:
        fbq, fbk = auto_blocks(s)
        bq, bk = _bwd_blocks(s, fbq, fbk)
        s_pad = _round_up(s, max(bq, bk))
        assert (s_pad // bq) * bq >= s, (s, bq, bk, s_pad)
        assert (s_pad // bk) * bk >= s, (s, bq, bk, s_pad)
    # the measured-good 1024px mixed pair is preserved (not over-fallen-back)
    assert _bwd_blocks(8704, 512, 8704) == (512, 896)


def test_real_row_truncation_raises():
    """A block size whose floor grid drops REAL rows must raise (it used to
    silently zero their outputs and make tile-sweep timings look fast)."""
    q, k, v = make_qkv(jax.random.key(10), s=384)
    with pytest.raises(ValueError, match="real"):
        flash_attention(q, k, v, cond_start=256, mode="union",
                        block_q=256, block_k=384)


def test_pallas_backward_mask_modes():
    """The Pallas dKV/dQ kernels (non-cfactor modes) must match XLA grads."""
    q, k, v = make_qkv(jax.random.key(7), s=256)
    for mode in ("union", "no_union", "independent"):
        def loss_pl(q, k, v, mode=mode):
            return jnp.sum(
                flash_attention(q, k, v, cond_start=192, mode=mode,
                                block_q=128, block_k=128) ** 2)

        def loss_ref(q, k, v, mode=mode):
            return jnp.sum(
                unified_attention(q, k, v, cond_len=64, mode=mode,
                                  backend="xla") ** 2)

        g_pl = jax.grad(loss_pl, argnums=(0, 1, 2))(q, k, v)
        g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
        for a, b in zip(g_pl, g_ref):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=1e-4, rtol=1e-3,
                err_msg=f"mode={mode}")


def test_pallas_backward_padded():
    """Backward with sequence padding (S not a block multiple)."""
    q, k, v = make_qkv(jax.random.key(8), s=192)

    def loss_pl(q, k, v):
        return jnp.sum(
            flash_attention(q, k, v, cond_start=160, mode="no_union",
                            block_q=256, block_k=256) ** 2)

    def loss_ref(q, k, v):
        return jnp.sum(
            unified_attention(q, k, v, cond_len=32, mode="no_union",
                              backend="xla") ** 2)

    g_pl = jax.grad(loss_pl, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g_pl, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4,
                                   rtol=1e-3)


def test_auto_blocks_long_seq_divisibility():
    """Long-S policy must always return blocks dividing the padded length
    (num_q truncation would silently drop query rows otherwise)."""
    from loongx_tpu.ops.flash_attention import auto_blocks, _round_up

    from loongx_tpu.ops.flash_attention import FULLROW_SCORES_BYTES

    for s in (2688, 2816, 4096, 5121, 8704, 9000, 16384, 33280):
        bq, bk = auto_blocks(s)
        s_pad = _round_up(_round_up(s, 128), max(bq, bk))
        assert s_pad % bq == 0 and s_pad % bk == 0, (s, bq, bk, s_pad)
        # scores tile stays within the (full-row) VMEM budget
        assert bq * bk * 4 <= FULLROW_SCORES_BYTES, (s, bq, bk)


def test_flash_long_seq_matches_xla():
    """A past-2560 sequence through the new narrow-q/wide-kv tiling equals
    the XLA reference."""
    import numpy as np

    from loongx_tpu.ops.attention import attention_xla
    from loongx_tpu.ops.flash_attention import flash_attention

    rng = np.random.default_rng(0)
    B, H, S, D = 1, 1, 2816, 32
    q, k, v = (
        jnp.asarray(rng.standard_normal((B, H, S, D)), jnp.float32)
        for _ in range(3)
    )
    ref = attention_xla(q, k, v)
    out = flash_attention(q, k, v, cond_start=S, mode="union")
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), atol=2e-3, rtol=2e-3
    )


# ---------------------------------------------------------------------------
# Heads-last ("bshd") layout: the kernel head-slices [B, S, H, D] tiles via
# its BlockSpecs, so the model never pays an HBM transpose around attention.
# Every mode and the backward kernels must agree with the classic layout.
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("mode", ["union", "no_union", "independent"])
def test_bshd_layout_matches_bhsd(mode):
    q, k, v = make_qkv(jax.random.key(7), b=2, h=3, s=256, d=64)
    cond_len = 64
    out_ref = flash_attention(
        q, k, v, cond_start=256 - cond_len, mode=mode, block_q=128,
        block_k=128,
    )
    t = lambda x: jnp.swapaxes(x, 1, 2)  # -> [B, S, H, D]
    out_bshd = flash_attention(
        t(q), t(k), t(v), cond_start=256 - cond_len, mode=mode, block_q=128,
        block_k=128, layout="bshd",
    )
    assert out_bshd.shape == (2, 256, 3, 64)
    np.testing.assert_allclose(
        np.asarray(t(out_bshd)), np.asarray(out_ref), atol=2e-5, rtol=2e-5
    )


def test_bshd_layout_rope_and_padding():
    """bshd + fused RoPE + S not a block multiple (padded path)."""
    from loongx_tpu.ops.rope import rope_embed

    q, k, v = make_qkv(jax.random.key(8), b=1, h=2, s=192, d=32)
    ids = jnp.stack(
        [jnp.zeros((192,)), jnp.arange(192.0), jnp.arange(192.0) * 2], axis=1
    )
    rope = rope_embed(ids, axes_dim=(8, 12, 12))
    out_ref = flash_attention(
        q, k, v, cond_start=128, mode="no_union", rope=rope, block_q=128,
        block_k=128,
    )
    t = lambda x: jnp.swapaxes(x, 1, 2)
    out_bshd = flash_attention(
        t(q), t(k), t(v), cond_start=128, mode="no_union", rope=rope,
        block_q=128, block_k=128, layout="bshd",
    )
    np.testing.assert_allclose(
        np.asarray(t(out_bshd)), np.asarray(out_ref), atol=2e-5, rtol=2e-5
    )


@pytest.mark.parametrize("mode", ["union", "no_union", "independent"])
def test_bshd_backward_matches_bhsd(mode):
    """Pallas dQ/dKV kernels in the bshd layout equal the bhsd ones."""
    q, k, v = make_qkv(jax.random.key(9), b=1, h=2, s=256, d=32)
    t = lambda x: jnp.swapaxes(x, 1, 2)

    def loss_bhsd(q, k, v):
        o = flash_attention(q, k, v, cond_start=192, mode=mode, block_q=128,
                            block_k=128)
        return jnp.sum(jnp.sin(o.astype(jnp.float32)))

    def loss_bshd(q, k, v):
        o = flash_attention(t(q), t(k), t(v), cond_start=192, mode=mode,
                            block_q=128, block_k=128, layout="bshd")
        return jnp.sum(jnp.sin(t(o).astype(jnp.float32)))

    g_ref = jax.grad(loss_bhsd, argnums=(0, 1, 2))(q, k, v)
    g_bshd = jax.grad(loss_bshd, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g_bshd, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4,
                                   rtol=1e-3)


def test_bshd_cfactor_grad():
    """cfactor (XLA-recompute backward) in bshd: grads match bhsd."""
    q, k, v = make_qkv(jax.random.key(10), b=1, h=2, s=128, d=32)
    cf = jnp.float32(0.7)
    t = lambda x: jnp.swapaxes(x, 1, 2)

    def loss_bhsd(q):
        o = flash_attention(q, k, v, cond_start=96, c_factor=cf, block_q=128,
                            block_k=128)
        return jnp.sum(o.astype(jnp.float32) ** 2)

    def loss_bshd(q):
        o = flash_attention(t(q), t(k), t(v), cond_start=96, c_factor=cf,
                            block_q=128, block_k=128, layout="bshd")
        return jnp.sum(t(o).astype(jnp.float32) ** 2)

    np.testing.assert_allclose(
        np.asarray(jax.grad(loss_bshd)(q)), np.asarray(jax.grad(loss_bhsd)(q)),
        atol=1e-4, rtol=1e-3,
    )


def test_unified_attention_bshd_layout():
    """unified_attention round-trips the bshd layout on both backends."""
    q, k, v = make_qkv(jax.random.key(11), b=1, h=2, s=128, d=32)
    t = lambda x: jnp.swapaxes(x, 1, 2)
    ref = unified_attention(q, k, v, cond_len=32, mode="no_union",
                            backend="xla")
    for backend in ("xla", "pallas"):
        out = unified_attention(
            t(q), t(k), t(v), cond_len=32, mode="no_union", backend=backend,
            layout="bshd",
        )
        np.testing.assert_allclose(
            np.asarray(t(out)), np.asarray(ref), atol=2e-5, rtol=2e-5
        )


def test_int8_qk_scores_close_to_exact(monkeypatch):
    """LOONGX_INT8_ATTN=1: int8-MXU QK^T logits must reproduce the exact
    attention output within combined int8 logit noise, for every mask mode
    and with fused RoPE."""
    import numpy as np

    from loongx_tpu.ops.flash_attention import flash_attention
    from loongx_tpu.ops.rope import rope_embed

    b, h, s, d = 1, 2, 256, 64
    cond_start = 192
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((b, h, s, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, h, s, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, h, s, d)), jnp.float32)
    ids = jnp.asarray(rng.integers(0, 32, (s, 3)), jnp.float32)
    rope = rope_embed(ids, (16, 24, 24))

    for mode in ("union", "no_union", "independent"):
        monkeypatch.setenv("LOONGX_INT8_ATTN", "0")
        exact = flash_attention(
            q, k, v, cond_start=cond_start, mode=mode, rope=rope
        )
        monkeypatch.setenv("LOONGX_INT8_ATTN", "1")
        got = flash_attention(
            q, k, v, cond_start=cond_start, mode=mode, rope=rope
        )
        e = np.asarray(exact, np.float32)
        g = np.asarray(got, np.float32)
        # attention outputs are convex combinations of v (O(1) here):
        # int8 logit noise perturbs the softmax weights slightly
        rms = np.sqrt(np.mean((g - e) ** 2)) / np.sqrt(np.mean(e ** 2))
        assert rms < 0.03, (mode, rms)
        corr = np.corrcoef(g.ravel(), e.ravel())[0, 1]
        assert corr > 0.999, (mode, corr)


def test_int8_qk_multitile_cached_close_to_exact(monkeypatch):
    """Round 3: int8 scores on MULTI-TILE grids (long S) via the in-kernel
    quantized q/k scratch caches must match the exact path — every (q, kv)
    tile combination reads back cached int8 tiles instead of re-quantizing.
    """
    import numpy as np

    from loongx_tpu.ops.flash_attention import flash_attention
    from loongx_tpu.ops.rope import rope_embed

    b, h, s, d = 1, 2, 384, 64
    cond_start = 256
    rng = np.random.default_rng(1)
    q = jnp.asarray(rng.standard_normal((b, h, s, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, h, s, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, h, s, d)), jnp.float32)
    ids = jnp.asarray(rng.integers(0, 32, (s, 3)), jnp.float32)
    rope = rope_embed(ids, (16, 24, 24))

    for bq, bk in ((128, 128), (128, 384), (384, 128)):
        monkeypatch.setenv("LOONGX_INT8_ATTN", "0")
        exact = flash_attention(
            q, k, v, cond_start=cond_start, rope=rope, block_q=bq, block_k=bk
        )
        monkeypatch.setenv("LOONGX_INT8_ATTN", "1")
        got = flash_attention(
            q, k, v, cond_start=cond_start, rope=rope, block_q=bq, block_k=bk
        )
        e = np.asarray(exact, np.float32)
        g = np.asarray(got, np.float32)
        rms = np.sqrt(np.mean((g - e) ** 2)) / np.sqrt(np.mean(e ** 2))
        assert 0 < rms < 0.03, ((bq, bk), rms)
        corr = np.corrcoef(g.ravel(), e.ravel())[0, 1]
        assert corr > 0.999, ((bq, bk), corr)


def test_int8_qk_forced_off_under_grad(monkeypatch):
    """Training safety: with LOONGX_INT8_ATTN=1, gradients must be computed
    from the bf16-score forward (the backward kernels rebuild probabilities
    from bf16 scores — int8 (m, l) stats would be inconsistent)."""
    import numpy as np

    from loongx_tpu.ops.flash_attention import flash_attention

    b, h, s, d = 1, 2, 128, 64
    rng = np.random.default_rng(1)
    q = jnp.asarray(rng.standard_normal((b, h, s, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, h, s, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, h, s, d)), jnp.float32)
    cot = jnp.asarray(rng.standard_normal((b, h, s, d)), jnp.float32)

    def loss(q):
        return jnp.sum(
            flash_attention(q, k, v, cond_start=96).astype(jnp.float32) * cot
        )

    monkeypatch.setenv("LOONGX_INT8_ATTN", "0")
    g0 = np.asarray(jax.grad(loss)(q))
    monkeypatch.setenv("LOONGX_INT8_ATTN", "1")
    g1 = np.asarray(jax.grad(loss)(q))
    np.testing.assert_array_equal(g0, g1)


def test_int8_qk_bshd_with_padding(monkeypatch):
    """int8 scores in the PRODUCTION serving layout (bshd) with a
    non-tile-multiple sequence (padded keys masked): must match the exact
    path within int8 logit noise."""
    import numpy as np

    from loongx_tpu.ops.flash_attention import flash_attention

    b, s, h, d = 1, 200, 2, 64  # pads to 256
    rng = np.random.default_rng(3)
    q = jnp.asarray(rng.standard_normal((b, s, h, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, s, h, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, s, h, d)), jnp.float32)

    monkeypatch.setenv("LOONGX_INT8_ATTN", "0")
    exact = flash_attention(q, k, v, cond_start=144, layout="bshd")
    monkeypatch.setenv("LOONGX_INT8_ATTN", "1")
    got = flash_attention(q, k, v, cond_start=144, layout="bshd")
    e = np.asarray(exact, np.float32)
    g = np.asarray(got, np.float32)
    rms = np.sqrt(np.mean((g - e) ** 2)) / np.sqrt(np.mean(e ** 2))
    assert 0 < rms < 0.03, rms  # >0: the int8 path actually ran


def test_int8_qk_stays_active_on_multi_tile(monkeypatch):
    """Round 3 flipped the round-2 auto-disable: multi-tile grids keep int8
    scores ACTIVE via the quantized-tile scratch caches — the output must
    genuinely differ from bf16 scores (the path ran) while staying within
    int8 logit noise."""
    import numpy as np

    from loongx_tpu.ops.flash_attention import flash_attention

    b, h, s, d = 1, 1, 512, 64
    rng = np.random.default_rng(4)
    q = jnp.asarray(rng.standard_normal((b, h, s, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, h, s, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, h, s, d)), jnp.float32)

    monkeypatch.setenv("LOONGX_INT8_ATTN", "0")
    exact = flash_attention(
        q, k, v, cond_start=s, block_q=256, block_k=256
    )
    monkeypatch.setenv("LOONGX_INT8_ATTN", "1")
    got = flash_attention(
        q, k, v, cond_start=s, block_q=256, block_k=256
    )
    e, g = np.asarray(exact, np.float32), np.asarray(got, np.float32)
    rms = np.sqrt(np.mean((g - e) ** 2)) / np.sqrt(np.mean(e ** 2))
    assert 0 < rms < 0.03, rms


def test_non_dividing_blocks_raise():
    """Explicit block sizes whose floor grid drops REAL rows must raise
    instead of silently zeroing the tail (num_q floor truncation)."""
    import pytest

    from loongx_tpu.ops.flash_attention import flash_attention

    q = jnp.ones((1, 2, 1024, 128), jnp.bfloat16)
    with pytest.raises(ValueError, match="real rows would be dropped"):
        flash_attention(
            q, q, q, cond_start=512, mode="union",
            block_q=768, block_k=1024, interpret=True,
        )


def test_pv_chunks_matches_unchunked():
    """The software-pipelined softmax+PV path (pv_chunks > 1) is exact: the
    row max is taken over the full row before any chunk exponentiates, so
    only float reassociation of the l sum differs."""
    import os
    from unittest import mock

    from loongx_tpu.ops.flash_attention import _flash_fwd, _pv_chunk_policy

    q, k, v = make_qkv(jax.random.key(3), s=256, d=128)
    cb = jnp.zeros((1, 1), jnp.float32)
    dummy = jnp.zeros((8, 128), jnp.float32)
    for mode in ("union", "no_union"):
        base = _flash_fwd(q, k, v, cb, dummy, dummy, 192, mode,
                          256, 256, False, True, save_residuals=True)
        out = _flash_fwd(q, k, v, cb, dummy, dummy, 192, mode,
                         256, 256, False, True, save_residuals=True,
                         pv_chunks=2)  # 128-wide chunks (lane-aligned)
        for a, b in zip(base, out):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=1e-5, rtol=1e-5
            )
    # int8-QK scores + chunked PV (the default combination on the long-S
    # serving path): chunking must not change the int8 result beyond the
    # l-sum reassociation
    base8 = _flash_fwd(q, k, v, cb, dummy, dummy, 192, "union",
                       256, 256, False, True, int8_qk=True)
    out8 = _flash_fwd(q, k, v, cb, dummy, dummy, 192, "union",
                      256, 256, False, True, int8_qk=True, pv_chunks=2)
    np.testing.assert_allclose(
        np.asarray(base8), np.asarray(out8), atol=5e-4, rtol=5e-4
    )
    # the public wrapper routes the env knob through the lane/divisor guard
    with mock.patch.dict(os.environ, {"LOONGX_FLASH_PV_CHUNKS": "8"}):
        assert _pv_chunk_policy(256) == 2       # 8,4 chunks not lane-aligned
        # 2560 = 20 lanes: nc=8 gives 320-wide chunks (not lane-aligned),
        # shrink to the next valid divisor
        assert _pv_chunk_policy(2560) == 5
    with mock.patch.dict(os.environ, {"LOONGX_FLASH_PV_CHUNKS": "0"}):
        assert _pv_chunk_policy(2560) == 1
    # measured default (flash_pv_pipeline_sweep on v5e): chunk ONLY the
    # int8-QK long-S full-row-kv path; bf16 and <=2560 tiles stay at 1
    with mock.patch.dict(os.environ, {"LOONGX_FLASH_PV_CHUNKS": ""}):
        assert _pv_chunk_policy(8704, int8_qk=True) == 4   # 2176-wide chunks
        assert _pv_chunk_policy(4352, int8_qk=True) == 2   # 1088 not aligned
        assert _pv_chunk_policy(2560, int8_qk=True) == 1   # single-tile path
        assert _pv_chunk_policy(8704, int8_qk=False) == 1  # bf16 scores
        # env override still beats the default either way
    with mock.patch.dict(os.environ, {"LOONGX_FLASH_PV_CHUNKS": "1"}):
        assert _pv_chunk_policy(8704, int8_qk=True) == 1
